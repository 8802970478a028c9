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
