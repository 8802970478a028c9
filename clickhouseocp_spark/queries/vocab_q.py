"""Presentation / navigation scalar vocabulary (SURVEY §2.8 — ClickHouse's
formatReadable* family, ``bar``, ``transform`` lookup, ``runningDifference`` /
``neighbor`` / ``runningAccumulate`` / ``nonNegativeDerivative`` navigation
functions, and date-name helpers).

The navigation functions are CH legacy *block-local* functions; the documented
modern replacements are window functions, and that is exactly how they are
implemented here — ``lag``/cumulative-sum windows PARTITIONED BY the series
key, which is also the only shape that is correct (CH's own docs warn the
block-local originals give arbitrary results across blocks) and the only shape
that scales (each key's timeline is independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from clickhouseocp_spark.catalog import load_table
from clickhouseocp_spark.functions import clickhouse_names as ch
from clickhouseocp_spark.queries import register

#: DuckDB-side eighth-block list literal for bar()'s fractional glyph
_SQL_EIGHTHS = "['', '▏', '▎', '▍', '▌', '▋', '▊', '▉']"


@register(
    "format_readable",
    oracle="""
WITH src AS (
  SELECT DISTINCT n_chars, CAST(n_chars AS DOUBLE) * 12345 AS big
  FROM documents
),
calc AS (
  SELECT n_chars,
         CASE WHEN n_chars < 1024 THEN 0
              ELSE CAST(least(floor(log2(CAST(n_chars AS DOUBLE)) / 10), 8) AS INTEGER)
         END AS ui,
         CASE WHEN big < 1000 THEN 0
              ELSE CAST(least(floor(log10(big) / 3), 4) AS INTEGER)
         END AS qi,
         big
  FROM src
)
SELECT n_chars,
       CAST(CAST(ROUND(n_chars / power(2.0, ui * 10), 2) AS DECIMAL(18,2)) AS VARCHAR)
         || ' ' || ['B','KiB','MiB','GiB','TiB','PiB','EiB','ZiB','YiB'][ui + 1]
         AS readable_size,
       CAST(CAST(ROUND(big / power(10.0, qi * 3), 2) AS DECIMAL(18,2)) AS VARCHAR)
         || ['',' thousand',' million',' billion',' trillion'][qi + 1]
         AS readable_qty
FROM calc
""",
    tags=("scalar", "format"),
)
def format_readable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``formatReadableSize`` / ``formatReadableQuantity``: human-readable
    byte and quantity rendering, numeric part via DECIMAL(18,2)→string so both
    engines print identical trailing zeros.  Pure per-row columnar exprs."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.select(
        "n_chars", (F.col("n_chars").cast("double") * 12345).alias("big")
    ).distinct()
    return src.select(
        "n_chars",
        ch.formatReadableSize(F.col("n_chars")).alias("readable_size"),
        ch.formatReadableQuantity(F.col("big")).alias("readable_qty"),
    )


@register(
    "transform_bar_render",
    oracle="""
WITH per AS (
  SELECT event_type,
         CASE event_type WHEN 'click' THEN 10 WHEN 'view' THEN 20
              WHEN 'purchase' THEN 30 ELSE -1 END AS type_code,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_v
  FROM events GROUP BY event_type
),
bars AS (
  SELECT event_type, type_code,
         CAST(floor(least(greatest(avg_v / 60.0, 0.0), 1.0) * 160) AS INTEGER) AS e8
  FROM per
)
SELECT event_type, type_code,
       repeat('█', CAST(e8 // 8 AS INTEGER)) || """
    + _SQL_EIGHTHS
    + """[(e8 % 8) + 1] AS avg_bar
FROM bars
""",
    tags=("scalar", "format"),
)
def transform_bar_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``transform(x, [from], [to], default)`` lookup + ``bar()`` rendering:
    event types mapped through a static array-pair table (no join — a folded
    map literal) and average values drawn as 20-cell eighth-block unicode
    bars, CH's exact glyph choice."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        (F.sum(F.col("value").cast("decimal(38,6)")).cast("double") / F.count(F.lit(1))).alias("avg_v")
    )
    return per.select(
        "event_type",
        ch.transform(
            F.col("event_type"), ["click", "view", "purchase"], [10, 20, 30], -1
        ).alias("type_code"),
        ch.bar(F.col("avg_v"), 0.0, 60.0, 20).alias("avg_bar"),
    )


@register(
    "running_difference_neighbor",
    oracle="""
SELECT user_id, event_id,
       COALESCE(value - lag(value) OVER w, 0.0) AS running_diff,
       COALESCE(lag(value) OVER w, 0.0) AS neighbor_prev,
       ROUND(greatest(
           COALESCE((value - lag(value) OVER w)
                    / epoch(ts - lag(ts) OVER w), 0.0), 0.0), 6)
         AS nn_derivative_per_sec,
       CAST(SUM(CAST(floor(value) AS BIGINT)) OVER
            (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS running_acc
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("window", "navigation"),
)
def running_difference_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``runningDifference`` / ``neighbor(x, -1)`` / ``nonNegativeDerivative``
    / ``runningAccumulate`` — CH's block-local navigation functions, lowered
    to their documented window-function replacements, partitioned per user so
    every series computes independently (the block-local originals are
    explicitly non-deterministic across blocks; the window form is both the
    correct and the scalable semantics)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dv = F.col("value") - F.lag("value").over(w)
    # cast-to-double keeps sub-second precision (unix_timestamp truncates,
    # DuckDB's epoch() does not)
    ts_s = F.col("ts").cast("timestamp").cast("double")
    dt = ts_s - F.lag(ts_s).over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.coalesce(dv, F.lit(0.0)).alias("running_diff"),
        F.coalesce(F.lag("value").over(w), F.lit(0.0)).alias("neighbor_prev"),
        F.round(
            F.greatest(F.coalesce(dv / dt, F.lit(0.0)), F.lit(0.0)), 6
        ).alias("nn_derivative_per_sec"),
        F.sum(F.floor("value").cast("bigint")).over(cum).cast("bigint").alias("running_acc"),
    )


@register(
    "date_name_vocab",
    oracle="""
SELECT monthname(o_orderdate) AS month_name,
       'Q' || CAST(quarter(o_orderdate) AS VARCHAR) AS quarter_name,
       CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
       last_day(o_orderdate) AS month_end,
       CAST(floor(epoch(TIMESTAMP '1998-12-31 00:00:00' - o_orderdate) / 86400)
            AS BIGINT) AS age_days,
       COUNT(*) AS n
FROM orders
GROUP BY 1, 2, 3, 4, 5
""",
    tags=("scalar", "datetime"),
)
def date_name_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``monthName`` / ``toStartOfWeek`` (Monday mode) / ``toLastDayOfMonth``
    / ``age('day', ...)`` — date-name vocabulary grouped so output stays
    bounded by the calendar, not the fact table."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            ch.monthName("o_orderdate").alias("month_name"),
            F.concat(F.lit("Q"), F.quarter("o_orderdate").cast("string")).alias("quarter_name"),
            ch.toStartOfWeek("o_orderdate").alias("week_start"),
            ch.toLastDayOfMonth("o_orderdate").cast("date").alias("month_end"),
            ch.age("day", F.col("o_orderdate"), F.lit("1998-12-31 00:00:00").cast("timestamp")).alias("age_days"),
        )
        .groupBy("month_name", "quarter_name", "week_start", "month_end", "age_days")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "string_search_vocab",
    oracle="""
SELECT doc_id,
       CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT)
         AS n_the,
       strpos(lower(text), 'lorem') AS pos_lorem_ci,
       CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces
FROM documents
""",
    tags=("scalar", "string"),
)
def string_search_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``countSubstrings`` / ``positionCaseInsensitive`` — substring counting
    via length arithmetic (no regex engine in the hot path) and case-folded
    position.  Pure per-row columnar exprs, pushdown-safe."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        ch.countSubstrings(F.col("text"), "the").alias("n_the"),
        ch.positionCaseInsensitive(F.col("text"), "lorem").alias("pos_lorem_ci"),
        ch.countSubstrings(F.col("text"), " ").alias("n_spaces"),
    )


@register(
    "string_distances2",
    oracle="""
SELECT a.doc_id,
       damerau_levenshtein(substr(a.text, 1, 12), substr(b.text, 1, 12)) AS dl_dist,
       ROUND(jaro_similarity(substr(a.text, 1, 12), substr(b.text, 1, 12)), 6) AS jaro,
       ROUND(jaro_winkler_similarity(substr(a.text, 1, 12), substr(b.text, 1, 12)), 6) AS jw
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
WHERE a.doc_id < 40
ORDER BY a.doc_id
""",
    tags=("scalar", "string"),
)
def string_distances2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-distance family 2 (CH 24.1 scalars:
    ``damerauLevenshteinDistance``, ``jaroSimilarity``,
    ``jaroWinklerSimilarity``) over neighbouring document snippets —
    Arrow-batched pandas UDFs (functions/text.py) whose kernels are pinned
    against the oracle's native implementations (full Lowrance-Wagner DL;
    Jaro-Winkler boost above the 0.7 threshold)."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.catalog import load_table
    from clickhouseocp_spark.functions.text import (
        damerau_levenshtein,
        jaro_similarity,
        jaro_winkler_similarity,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 12).alias("s")
    )
    a = d.filter(F.col("doc_id") < 40).alias("a")
    b = d.alias("b")
    pairs = a.join(
        b, F.col("b.doc_id") == F.col("a.doc_id") + 1
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        F.col("a.s").alias("sa"),
        F.col("b.s").alias("sb"),
    )
    return pairs.select(
        "doc_id",
        damerau_levenshtein("sa", "sb").alias("dl_dist"),
        F.round(jaro_similarity("sa", "sb"), 6).alias("jaro"),
        F.round(jaro_winkler_similarity("sa", "sb"), 6).alias("jw"),
    ).orderBy("doc_id")


@register(
    "non_negative_derivative",
    oracle="""
WITH d AS (
  SELECT user_id % 10 AS bucket,
         value - LAG(value) OVER w AS dv,
         CAST(floor(epoch(ts)) AS BIGINT)
           - LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER w AS dt
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT bucket,
       CAST(SUM(CASE WHEN dv > 0 AND dt > 0
                THEN CAST(ROUND(dv / dt, 8) AS DECIMAL(38,10)) END)
            AS DOUBLE) AS rate_sum,
       CAST(SUM(CASE WHEN dv > 0 AND dt > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_rising
FROM d GROUP BY bucket ORDER BY bucket
""",
    tags=("window", "stats"),
)
def non_negative_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``nonNegativeDerivative(value, ts)`` (CH window function): per-second
    rate of change between consecutive events in each user's stream, clamped
    to rising segments, rolled up per user bucket.  The window partitions by
    user (parallel, no global sort); the rollup is one bounded hash agg with
    decimal-summed rounded rates."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tsec = F.unix_timestamp("ts")
    d = ev.select(
        (F.col("user_id") % 10).alias("bucket"),
        (F.col("value") - F.lag("value").over(w)).alias("dv"),
        (tsec - F.lag(tsec).over(w)).alias("dt"),
    )
    rising = (F.col("dv") > 0) & (F.col("dt") > 0)
    return (
        d.groupBy("bucket")
        .agg(
            F.sum(
                F.when(rising,
                       F.round(F.col("dv") / F.col("dt"), 8)
                       .cast("decimal(38,10)"))
            ).cast("double").alias("rate_sum"),
            F.sum(rising.cast("int")).cast("bigint").alias("n_rising"),
        )
        .orderBy("bucket")
    )


@register(
    "polygon_area_perimeter",
    oracle="""
WITH pts AS (
  SELECT n_regionkey AS region, n_nationkey AS k,
         CAST(n_nationkey % 7 AS DOUBLE) AS x,
         CAST(n_nationkey % 5 AS DOUBLE) AS y
  FROM nation
),
e AS (
  SELECT region, x, y,
         COALESCE(LEAD(x) OVER w, FIRST_VALUE(x) OVER w) AS xn,
         COALESCE(LEAD(y) OVER w, FIRST_VALUE(y) OVER w) AS yn
  FROM pts
  WINDOW w AS (PARTITION BY region ORDER BY k
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT region,
       ROUND(ABS(SUM(x * yn - xn * y)) / 2, 6) AS area,
       ROUND(CAST(SUM(CAST(ROUND(sqrt((xn-x)*(xn-x) + (yn-y)*(yn-y)), 8)
             AS DECIMAL(38,10))) AS DOUBLE), 6) AS perimeter,
       COUNT(*) AS n_vertices
FROM e GROUP BY region ORDER BY region
""",
    tags=("scalar", "geo"),
)
def polygon_area_perimeter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``polygonAreaCartesian`` / ``polygonPerimeterCartesian`` (CH geo
    functions): shoelace signed area and edge-length sum over a closed ring
    — vertices derived deterministically from the nation table, one ring per
    region.  Cross products are exact integer arithmetic; edge lengths go
    through the round(8)+decimal sum discipline."""
    nt = load_table(spark, sf_dir, "nation")
    pts = nt.select(
        F.col("n_regionkey").alias("region"),
        F.col("n_nationkey").alias("k"),
        (F.col("n_nationkey") % 7).cast("double").alias("x"),
        (F.col("n_nationkey") % 5).cast("double").alias("y"),
    )
    wl = Window.partitionBy("region").orderBy("k")
    wf = wl.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    e = pts.select(
        "region",
        "x",
        "y",
        F.coalesce(F.lead("x").over(wl), F.first("x").over(wf)).alias("xn"),
        F.coalesce(F.lead("y").over(wl), F.first("y").over(wf)).alias("yn"),
    )
    edge = F.sqrt(
        (F.col("xn") - F.col("x")) * (F.col("xn") - F.col("x"))
        + (F.col("yn") - F.col("y")) * (F.col("yn") - F.col("y"))
    )
    return (
        e.groupBy("region")
        .agg(
            F.round(
                F.abs(F.sum(F.col("x") * F.col("yn") - F.col("xn") * F.col("y")))
                / 2, 6
            ).alias("area"),
            F.round(
                F.sum(F.round(edge, 8).cast("decimal(38,10)")).cast("double"), 6
            ).alias("perimeter"),
            F.count(F.lit(1)).alias("n_vertices"),
        )
        .orderBy("region")
    )


@register(
    "fuzzy_join_entities",
    oracle="""
WITH lhs AS (
  SELECT n_nationkey AS typo_key,
         lower(substr(n_name, 1, 1) || substr(n_name, 3)) AS typo_name
  FROM nation
),
rhs AS (SELECT n_nationkey, lower(n_name) AS name FROM nation),
cand AS (
  SELECT l.typo_key, l.typo_name, r.n_nationkey, r.name
  FROM lhs l JOIN rhs r ON substr(l.typo_name, 1, 1) = substr(r.name, 1, 1)
  WHERE abs(length(l.typo_name) - length(r.name)) <= 3
)
SELECT typo_key, n_nationkey AS match_key,
       ROUND(jaro_winkler_similarity(typo_name, name), 6) AS match_score
FROM cand
WHERE jaro_winkler_similarity(typo_name, name) >= 0.85
ORDER BY typo_key, match_key
""",
    tags=("join", "fuzzy", "llm"),
)
def fuzzy_join_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity-matching join (operators/ranking.fuzzy_join): nation
    names with a planted second-character deletion matched back to the clean
    list via first-letter blocking + Jaro-Winkler ≥ 0.85.  The distance
    kernel is pinned to the oracle's native jaro_winkler_similarity, so the
    full match set value-matches — blocking, banding, scores and all."""
    from clickhouseocp_spark.operators.ranking import fuzzy_join

    nt = load_table(spark, sf_dir, "nation")
    lhs = nt.select(
        F.col("n_nationkey").alias("typo_key"),
        F.concat(
            F.substring("n_name", 1, 1), F.expr("substr(n_name, 3)")
        ).alias("typo_name"),
    )
    rhs = nt.select(F.col("n_nationkey").alias("match_key"), "n_name")
    out = fuzzy_join(lhs, rhs, "typo_name", "n_name", threshold=0.85)
    return out.select("typo_key", "match_key", "match_score").orderBy(
        "typo_key", "match_key"
    )
