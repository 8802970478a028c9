"""Statistical-test / information-theory aggregate family (SURVEY §2.4 —
ClickHouse ships these as first-class aggregate functions: ``entropy``,
``cramersV``, ``theilsU``, ``studentTTest``, ``welchTTest``,
``mannWhitneyUTest``, ``exponentialMovingAverage``, ``maxIntersections``,
``groupBitAnd/Or/Xor``, ``rankCorr``).

Each is expressed as a composition of exact integer counting aggregates plus
per-row float math, so the only cross-engine hazards are libm low bits —
handled by the repo-wide discipline: round per-row terms to 8 decimals, sum
them through DECIMAL (exact, associative, partition-order-independent), round
final outputs to 6.  That discipline is also the 100 TB shape: every query
below is a map-side-combinable counting aggregate over a bounded key space
(categories × buckets), never a global sort or an all-rows window.

Determinism note on windows: the only window functions used are partitioned
by a grouping key (user_id, event_type, l_returnflag) — never unpartitioned —
so no query here collapses to a single task at scale.  mann_whitney_u avoids
the classic global-rank pitfall by ranking over the *distinct value domain*
(bounded) instead of all rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from clickhouseocp_spark.catalog import load_table
from clickhouseocp_spark.queries import register

#: decimal type for exact sums of pre-rounded float terms
_DEC = "decimal(38,10)"


def _dsum(term, alias: str):
    """Order-independent sum of a per-row double term: round(8) → decimal sum
    → double.  Matches ``sql_dsum`` on the oracle side bit-for-bit."""
    return (
        F.sum(F.round(term, 8).cast(_DEC)).cast("double").alias(alias)
    )


def _sql_dsum(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(ROUND({expr}, 8) AS DECIMAL(38,10))) AS DOUBLE) AS {alias}"
    )


# ---------------------------------------------------------------------------
# entropy
# ---------------------------------------------------------------------------


@register(
    "entropy_agg",
    oracle="""
WITH cells AS (
  SELECT event_type, user_id % 10 AS bucket, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
agg AS (
  SELECT event_type,
         CAST(SUM(n) AS DOUBLE) AS t,
         CAST(SUM(CAST(ROUND(n * log2(n), 8) AS DECIMAL(38,10))) AS DOUBLE) AS s
  FROM cells GROUP BY event_type
)
SELECT event_type, ROUND(log2(t) - s / t, 6) AS entropy_bits
FROM agg
""",
    tags=("agg", "stats"),
)
def entropy_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``entropy(x)`` (CH information-theory aggregate): Shannon entropy in
    bits of the user-bucket distribution within each event type, via the
    identity H = log2(T) - Σ n·log2(n) / T over exact category counts.

    Scale shape: two chained hash aggregations over a bounded key space
    (|event_type| × 10 cells) — fully map-side combinable, no window."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", (F.col("user_id") % 10).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    agg = cells.groupBy("event_type").agg(
        F.sum("n").cast("double").alias("t"),
        _dsum(F.col("n") * F.log2("n"), "s"),
    )
    return agg.select(
        "event_type",
        F.round(F.log2("t") - F.col("s") / F.col("t"), 6).alias("entropy_bits"),
    )


# ---------------------------------------------------------------------------
# cramersV / theilsU — categorical association over a contingency table
# ---------------------------------------------------------------------------

_CONTINGENCY_SQL = """
cells AS (
  SELECT event_type AS x, user_id % 4 AS y, CAST(COUNT(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT CAST(SUM(n) AS DOUBLE) AS t,
         CAST(COUNT(DISTINCT x) AS DOUBLE) AS r,
         CAST(COUNT(DISTINCT y) AS DOUBLE) AS c
  FROM cells
),
margins AS (
  SELECT cells.x, cells.y, cells.n,
         SUM(n) OVER (PARTITION BY x) AS rt,
         SUM(n) OVER (PARTITION BY y) AS ct
  FROM cells
)
"""


def _contingency(spark: SparkSession, sf_dir: str):
    """Shared contingency-table builder: exact cell counts + row/col margins.

    The margins are tiny (|x|+|y| rows) so they are computed with two extra
    hash aggs and broadcast-joined back — at 100 TB this is two map-side
    combines plus two broadcast joins, never a shuffle of the fact table."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("x"), (F.col("user_id") % 4).alias("y")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    cells = cells.cache()
    rowt = cells.groupBy("x").agg(F.sum("n").alias("rt"))
    colt = cells.groupBy("y").agg(F.sum("n").alias("ct"))
    joined = cells.join(F.broadcast(rowt), "x").join(F.broadcast(colt), "y")
    totals = cells.agg(
        F.sum("n").alias("t"),
        F.countDistinct("x").cast("double").alias("r"),
        F.countDistinct("y").cast("double").alias("c"),
    )
    return joined, totals


@register(
    "cramers_v_assoc",
    oracle="WITH "
    + _CONTINGENCY_SQL
    + """,
chi AS (
  SELECT CAST(SUM(CAST(ROUND(
           (n - rt * ct / (SELECT t FROM tot)) * (n - rt * ct / (SELECT t FROM tot))
           / (rt * ct / (SELECT t FROM tot)), 8) AS DECIMAL(38,10))) AS DOUBLE) AS chi2
  FROM margins
)
SELECT ROUND(sqrt(chi2 / (t * CASE WHEN r - 1 < c - 1 THEN r - 1 ELSE c - 1 END)), 6)
         AS cramers_v
FROM chi, tot
""",
    tags=("agg", "stats"),
)
def cramers_v_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cramersV(x, y)``: Cramér's V association between event type and a
    user bucket — χ² over the contingency table, normalized by
    T·min(r−1, c−1).  Exact counts; per-cell float terms rounded then
    decimal-summed (the table has r×c cells, so the sum is tiny)."""
    joined, totals = _contingency(spark, sf_dir)
    j = joined.crossJoin(F.broadcast(totals))
    e = F.col("rt") * F.col("ct") / F.col("t")
    chi = j.agg(
        _dsum((F.col("n") - e) * (F.col("n") - e) / e, "chi2"),
        F.first("t").alias("t"),
        F.first("r").alias("r"),
        F.first("c").alias("c"),
    )
    return chi.select(
        F.round(
            F.sqrt(F.col("chi2") / (F.col("t") * F.least(F.col("r") - 1, F.col("c") - 1))),
            6,
        ).alias("cramers_v")
    )


@register(
    "theils_u_assoc",
    oracle="WITH "
    + _CONTINGENCY_SQL
    + """,
hx AS (
  SELECT CAST(SUM(CAST(ROUND(rt * log2(rt), 8) AS DECIMAL(38,10))) AS DOUBLE) AS s_rt
  FROM (SELECT DISTINCT x, rt FROM margins)
),
hxy AS (
  SELECT CAST(SUM(CAST(ROUND(n * log2(n / ct), 8) AS DECIMAL(38,10))) AS DOUBLE) AS s_cond
  FROM margins
)
SELECT ROUND(
    ((log2(t) - s_rt / t) - (-s_cond / t)) / (log2(t) - s_rt / t), 6) AS theils_u
FROM hx, hxy, tot
""",
    tags=("agg", "stats"),
)
def theils_u_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``theilsU(x, y)``: uncertainty coefficient U(x|y) = (H(X) − H(X|Y)) / H(X)
    with H(X) = log2 T − Σ rt·log2 rt / T and H(X|Y) = −Σ n·log2(n/ct) / T,
    all from the same exact contingency counts as :func:`cramers_v_assoc`."""
    joined, totals = _contingency(spark, sf_dir)
    s_rt = (
        joined.select("x", "rt")
        .distinct()
        .agg(_dsum(F.col("rt") * F.log2("rt"), "s_rt"))
    )
    s_cond = joined.agg(_dsum(F.col("n") * F.log2(F.col("n") / F.col("ct")), "s_cond"))
    out = totals.crossJoin(F.broadcast(s_rt)).crossJoin(F.broadcast(s_cond))
    hx = F.log2("t") - F.col("s_rt") / F.col("t")
    hxy = -F.col("s_cond") / F.col("t")
    return out.select(F.round((hx - hxy) / hx, 6).alias("theils_u"))


# ---------------------------------------------------------------------------
# studentTTest / welchTTest
# ---------------------------------------------------------------------------


@register(
    "ttest_two_sample",
    oracle="""
WITH g AS (
  SELECT
    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS DOUBLE) AS n2,
    CAST(SUM(CASE WHEN event_type = 'click'
             THEN CAST(value AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE) AS s1,
    CAST(SUM(CASE WHEN event_type = 'view'
             THEN CAST(value AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE) AS s2,
    CAST(SUM(CASE WHEN event_type = 'click'
             THEN CAST(value * value AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE) AS q1,
    CAST(SUM(CASE WHEN event_type = 'view'
             THEN CAST(value * value AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE) AS q2
  FROM events WHERE event_type IN ('click', 'view')
)
SELECT
  ROUND((s1/n1 - s2/n2) / sqrt(
      ((q1 - s1*s1/n1) + (q2 - s2*s2/n2)) / (n1 + n2 - 2) * (1/n1 + 1/n2)), 6)
    AS student_t,
  ROUND((s1/n1 - s2/n2) / sqrt(
      (q1 - s1*s1/n1) / (n1 - 1) / n1 + (q2 - s2*s2/n2) / (n2 - 1) / n2), 6)
    AS welch_t,
  n1 AS n_click, n2 AS n_view
FROM g
""",
    tags=("agg", "stats"),
)
def ttest_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``studentTTest`` / ``welchTTest``: two-sample t statistics between the
    click and view value populations, from exact decimal moment sums (n, Σx,
    Σx²) gathered in ONE conditional-aggregation pass — the same
    partial-moment merge an AggregatingMergeTree would do, so it map-side
    combines at any scale."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view")
    )
    is1 = F.col("event_type") == "click"
    dec6 = "decimal(38,6)"
    g = ev.agg(
        F.sum(F.when(is1, 1).otherwise(0)).cast("double").alias("n1"),
        F.sum(F.when(~is1, 1).otherwise(0)).cast("double").alias("n2"),
        F.sum(F.when(is1, F.col("value").cast(dec6)).otherwise(F.lit(0))).cast("double").alias("s1"),
        F.sum(F.when(~is1, F.col("value").cast(dec6)).otherwise(F.lit(0))).cast("double").alias("s2"),
        F.sum(F.when(is1, (F.col("value") * F.col("value")).cast(dec6)).otherwise(F.lit(0)))
        .cast("double").alias("q1"),
        F.sum(F.when(~is1, (F.col("value") * F.col("value")).cast(dec6)).otherwise(F.lit(0)))
        .cast("double").alias("q2"),
    )
    n1, n2, s1, s2, q1, q2 = (F.col(c) for c in ("n1", "n2", "s1", "s2", "q1", "q2"))
    ss1 = q1 - s1 * s1 / n1  # corrected sum of squares
    ss2 = q2 - s2 * s2 / n2
    mean_diff = s1 / n1 - s2 / n2
    student = mean_diff / F.sqrt((ss1 + ss2) / (n1 + n2 - 2) * (1 / n1 + 1 / n2))
    welch = mean_diff / F.sqrt(ss1 / (n1 - 1) / n1 + ss2 / (n2 - 1) / n2)
    return g.select(
        F.round(student, 6).alias("student_t"),
        F.round(welch, 6).alias("welch_t"),
        n1.alias("n_click"),
        n2.alias("n_view"),
    )


# ---------------------------------------------------------------------------
# mannWhitneyUTest — rank-sum over the distinct value domain
# ---------------------------------------------------------------------------


@register(
    "mann_whitney_u",
    oracle="""
WITH vc AS (
  SELECT value,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE) AS n1v,
         CAST(COUNT(*) AS DOUBLE) AS cnt
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY value
),
ranked AS (
  SELECT n1v, cnt,
         SUM(cnt) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS below
  FROM vc
)
SELECT
  CAST(SUM(CAST(n1v * (COALESCE(below, 0) + (cnt + 1) / 2) AS DECIMAL(38,1))) AS DOUBLE)
    - (SELECT SUM(n1v) FROM vc) * ((SELECT SUM(n1v) FROM vc) + 1) / 2 AS u_statistic,
  CAST((SELECT SUM(n1v) FROM vc) AS DOUBLE) AS n_click,
  CAST((SELECT SUM(cnt - n1v) FROM vc) AS DOUBLE) AS n_view
FROM ranked
""",
    tags=("agg", "stats"),
)
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mannWhitneyUTest``: U statistic for click vs view values with
    tie-averaged ranks.  Instead of ranking all rows (a global sort), rows are
    first collapsed to the DISTINCT VALUE DOMAIN with per-value group counts;
    average ranks come from a prefix sum over that bounded domain — the
    ordered pass touches |distinct values| rows, not |rows|, which is the
    scalable rank-statistic shape (same trick ClickHouse's own rank-test
    implementation uses via sorted per-value buckets).

    Ranks with ties are exact multiples of 0.5, so sums route through
    DECIMAL(38,1) and the U statistic is exact on both engines."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view")
    )
    vc = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("double")
        .alias("n1v"),
        F.count(F.lit(1)).cast("double").alias("cnt"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vc.withColumn("below", F.sum("cnt").over(w))
    totals = vc.agg(
        F.sum("n1v").alias("tn1"), F.sum(F.col("cnt") - F.col("n1v")).alias("tn2")
    )
    r1 = ranked.agg(
        F.sum(
            (
                F.col("n1v")
                * (F.coalesce(F.col("below"), F.lit(0.0)) + (F.col("cnt") + 1) / 2)
            ).cast("decimal(38,1)")
        )
        .cast("double")
        .alias("r1")
    )
    out = r1.crossJoin(F.broadcast(totals))
    return out.select(
        (F.col("r1") - F.col("tn1") * (F.col("tn1") + 1) / 2).alias("u_statistic"),
        F.col("tn1").cast("double").alias("n_click"),
        F.col("tn2").cast("double").alias("n_view"),
    )


# ---------------------------------------------------------------------------
# exponentialMovingAverage — per-key time-ordered smoothing
# ---------------------------------------------------------------------------


@register(
    "exponential_moving_avg",
    oracle="""
WITH seq AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
)
SELECT user_id,
       ROUND(CAST(SUM(CAST(ROUND(
           value * power(0.75, n - i) * CASE WHEN i = 1 THEN 1.0 ELSE 0.25 END,
           8) AS DECIMAL(38,10))) AS DOUBLE), 6) AS ema
FROM seq GROUP BY user_id
""",
    tags=("agg", "window"),
)
def exponential_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``exponentialMovingAverage`` (α = 0.25): the recursive smoothing
    EMA_i = α·x_i + (1−α)·EMA_{i−1} seeded with the first value, unrolled to
    its closed form EMA_N = Σ w_i·x_i with w_i = α(1−α)^{N−i} (w_1 gets the
    seed weight (1−α)^{N−1}).  The closed form turns a sequential fold into a
    partitioned window + one hash agg — embarrassingly parallel across users.
    Weights underflow to 0 identically on both engines for long histories."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
    )
    weight = F.pow(F.lit(0.75), F.col("n") - F.col("i")) * F.when(
        F.col("i") == 1, F.lit(1.0)
    ).otherwise(F.lit(0.25))
    return seq.groupBy("user_id").agg(
        F.round(_dsum(F.col("value") * weight, "ema"), 6).alias("ema")
    )


# ---------------------------------------------------------------------------
# maxIntersections / maxIntersectionsPosition — interval sweep
# ---------------------------------------------------------------------------


@register(
    "max_intersections",
    oracle="""
WITH deltas AS (
  SELECT event_type, ts AS t, 1 AS d FROM events
  UNION ALL
  SELECT event_type, ts + CAST(floor(value) AS INTEGER) * INTERVAL 1 MINUTE, -1
  FROM events
),
swept AS (
  SELECT event_type, t, d,
         SUM(d) OVER (PARTITION BY event_type ORDER BY t, d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM deltas
),
peaks AS (
  SELECT event_type, t, cum,
         MAX(cum) OVER (PARTITION BY event_type) AS peak
  FROM swept
)
SELECT event_type, CAST(MAX(peak) AS BIGINT) AS max_intersections,
       MIN(CASE WHEN cum = peak THEN t END) AS peak_at
FROM peaks GROUP BY event_type
""",
    tags=("agg", "interval"),
)
def max_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``maxIntersections`` + ``maxIntersectionsPosition``: peak number of
    concurrently-open intervals (event start → start + ⌊value⌋ minutes) per
    event type, via the classic ±1 sweep: explode each interval to a +1/−1
    delta, prefix-sum in time order, take the max (and the earliest instant it
    is reached).  Half-open [start, end): the −1 sorts before the +1 at equal
    timestamps (ORDER BY t, d with d = −1 < 1).

    Scale shape: the sweep is PARTITIONED BY the group key — each key's
    timeline prefix-sums independently, so there is no global sort.  The
    peak and its earliest instant fold into ONE aggregation via
    max(struct(cum, -micros)) (r16) — the old second window
    (max(cum) OVER (PARTITION BY event_type)) re-buffered every partition
    just to broadcast the peak back onto each row (guide §2.4)."""
    ev = load_table(spark, sf_dir, "events")
    starts = ev.select("event_type", F.col("ts").alias("t"), F.lit(1).alias("d"))
    ends = ev.select(
        "event_type",
        (
            F.col("ts")
            + F.make_interval(mins=F.floor("value").cast("int"))
        ).alias("t"),
        F.lit(-1).alias("d"),
    )
    deltas = starts.unionAll(ends)
    sweep = Window.partitionBy("event_type").orderBy("t", "d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    swept = deltas.withColumn("cum", F.sum("d").over(sweep))
    # max over (cum, -micros): highest cum, then earliest t — struct
    # comparison reproduces "MIN(t) among peak rows" in one pass (null t
    # sorts below any value, so it is preferred away exactly like MIN)
    best = F.max(
        F.struct(
            F.col("cum").alias("c"),
            # t is TIMESTAMP_NTZ; the session pins UTC, so the cast
            # round-trips micros exactly
            (-F.unix_micros(F.col("t").cast("timestamp"))).alias("nt"),
        )
    )
    return (
        swept.groupBy("event_type")
        .agg(best.alias("__b"))
        .select(
            "event_type",
            F.col("__b.c").cast("bigint").alias("max_intersections"),
            F.timestamp_micros(-F.col("__b.nt"))
            .cast("timestamp_ntz")
            .alias("peak_at"),
        )
    )


# ---------------------------------------------------------------------------
# groupBitAnd / groupBitOr / groupBitXor
# ---------------------------------------------------------------------------


@register(
    "group_bit_agg",
    oracle="""
SELECT event_type,
       bit_and(user_id) AS all_and,
       bit_or(user_id) AS all_or,
       bit_xor(user_id) AS all_xor
FROM events GROUP BY event_type
""",
    tags=("agg", "bit"),
)
def group_bit_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``groupBitAnd/Or/Xor``: bitwise fold of user ids per event type —
    Spark's native bit_and/bit_or/bit_xor aggregates (exact, associative,
    map-side combinable)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("bit_and(user_id)").alias("all_and"),
        F.expr("bit_or(user_id)").alias("all_or"),
        F.expr("bit_xor(user_id)").alias("all_xor"),
    )


# ---------------------------------------------------------------------------
# rankCorr — Spearman rank correlation
# ---------------------------------------------------------------------------


@register(
    "rank_corr_spearman",
    oracle="""
WITH ranked AS (
  SELECT l_returnflag,
         (2.0 * RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
          + COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1) / 2 AS rq,
         (2.0 * RANK() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
          + COUNT(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1) / 2 AS rp
  FROM lineitem
)
SELECT l_returnflag, ROUND(corr(rq, rp), 6) AS rank_corr
FROM ranked GROUP BY l_returnflag
""",
    tags=("agg", "stats"),
)
def rank_corr_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rankCorr(x, y)``: Spearman rank correlation of quantity vs price per
    return flag — Pearson corr of tie-averaged ranks (avg rank of a tie group
    = (2·rank + ties − 1)/2).  Windows are partitioned by the grouping key;
    round(6) absorbs the engines' streaming-corr low-bit differences, exactly
    as agg_stats does."""
    li = load_table(spark, sf_dir, "lineitem")
    wq = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    wp = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    cq = Window.partitionBy("l_returnflag", "l_quantity")
    cp = Window.partitionBy("l_returnflag", "l_extendedprice")
    ranked = li.select(
        "l_returnflag",
        ((2.0 * F.rank().over(wq) + F.count(F.lit(1)).over(cq) - 1) / 2).alias("rq"),
        ((2.0 * F.rank().over(wp) + F.count(F.lit(1)).over(cp) - 1) / 2).alias("rp"),
    )
    return ranked.groupBy("l_returnflag").agg(
        F.round(F.corr("rq", "rp"), 6).alias("rank_corr")
    )


def _lttb_oracle(n_out: int = 12) -> str:
    """DuckDB replay of operators/downsample.lttb: the n-2 greedy bucket
    picks are UNROLLED into chained CTEs (s1..s{n-2}), each an argmax window
    over one bucket given the previous selection; all products in HUGEINT so
    the scores are exact integers, matching the kernel's Python ints."""
    m = n_out - 2
    steps = []
    for k in range(m):
        prev = f"s{k}"
        steps.append(
            f"""s{k + 1} AS (
  SELECT event_type, i, x, y6, event_id, value FROM (
    SELECT c.event_type, c.i, c.x, c.y6, c.event_id, c.value,
           row_number() OVER (PARTITION BY c.event_type ORDER BY
             abs((CAST(p.x AS HUGEINT) * a.cnt - a.sx) * (c.y6 - p.y6)
               - CAST(p.x - c.x AS HUGEINT) * (a.sy - a.cnt * p.y6)) DESC,
             c.i ASC) AS rn
    FROM mid c
    JOIN {prev} p USING (event_type)
    JOIN anch a ON a.event_type = c.event_type AND a.k = {k}
    WHERE c.k = {k}
  ) WHERE rn = 1
)"""
        )
    unions = "\nUNION ALL ".join(
        f"SELECT event_type, CAST({k + 1} AS INTEGER) AS sel_seq, event_id, value FROM s{k + 1}"
        for k in range(m)
    )
    return f"""
WITH base AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1 AS i,
         count(*) OVER (PARTITION BY event_type) AS N,
         epoch_us(ts) AS x,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS y6,
         event_id, value
  FROM events
), mid AS (
  SELECT *, CAST(((i - 1) * {m}) // (N - 2) AS INTEGER) AS k
  FROM base WHERE i >= 1 AND i <= N - 2
), anch AS (
  SELECT event_type, k - 1 AS k, CAST(count(*) AS HUGEINT) AS cnt,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y6) AS HUGEINT) AS sy
  FROM mid WHERE k >= 1 GROUP BY event_type, k
  UNION ALL
  SELECT event_type, {m - 1}, CAST(1 AS HUGEINT), CAST(x AS HUGEINT),
         CAST(y6 AS HUGEINT)
  FROM base WHERE i = N - 1
), s0 AS (
  SELECT event_type, i, x, y6, event_id, value FROM base WHERE i = 0
), {",".join(steps)}
SELECT event_type, CAST(0 AS INTEGER) AS sel_seq, event_id, value FROM s0
UNION ALL {unions}
UNION ALL SELECT event_type, CAST({m + 1} AS INTEGER) AS sel_seq, event_id, value
FROM base WHERE i = N - 1
"""


@register(
    "lttb_downsample",
    oracle=_lttb_oracle(12),
    tags=("agg", "stats", "timeseries"),
)
def lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``largestTriangleThreeBuckets(12)(ts, value)`` per event_type
    (CH 25.x time-series downsampling aggregate): endpoints kept, interior
    split into 10 buckets, each contributing the point with the largest
    triangle against the previous pick and the next bucket's average.  One
    shuffle on the series key; the sequential pick runs inside a per-series
    pandas kernel with exact integer scores (see operators/downsample.py),
    so the oracle's unrolled HUGEINT replay selects the identical points."""
    from clickhouseocp_spark.operators.downsample import lttb

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("x_us"),
        F.floor(F.col("value") * 1e6 + 0.5).cast("long").alias("y6"),
    )
    out = lttb(ev, "x_us", "y6", 12, by=["event_type"], keep=["event_id", "value"])
    return out.select("event_type", "sel_seq", "event_id", "value")


_SPARKBAR_CHARS = "▁▂▃▄▅▆▇█"


@register(
    "sparkbar_daily",
    oracle="""
WITH e AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS d FROM events
), mm AS (
  SELECT event_type, min(d) AS mn, max(d) AS mx FROM e GROUP BY event_type
), bsum AS (
  SELECT e.event_type, ((e.d - mm.mn) * 16) // (mm.mx - mm.mn + 1) AS b,
         count(*) AS s
  FROM e JOIN mm USING (event_type) GROUP BY e.event_type, b
), mxs AS (
  SELECT event_type, max(s) AS mxv FROM bsum GROUP BY event_type
), grid AS (
  SELECT m.event_type, g.b, COALESCE(bsum.s, 0) AS s, m.mxv
  FROM mxs m CROSS JOIN (SELECT unnest(range(16)) AS b) g
  LEFT JOIN bsum ON bsum.event_type = m.event_type AND bsum.b = g.b
)
SELECT event_type,
       string_agg(
         CASE WHEN s = 0 THEN ' '
              ELSE (['▁','▂','▃','▄','▅','▆','▇','█'])[CAST((s * 8 - 1) // mxv AS INTEGER) + 1]
         END, '' ORDER BY b) AS bar
FROM grid GROUP BY event_type
""",
    tags=("agg", "stats", "presentation"),
)
def sparkbar_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sparkbar(16)(toDate(ts), 1)`` analog: per event_type, daily event
    counts folded into 16 x-buckets and rendered as a block-character bar.
    Determinism: day number, bucket id and the 8-level height are all integer
    arithmetic (``floor(a/b)`` over ints < 2^52 equals exact integer division
    in IEEE double, so Spark's double floor-div and DuckDB's ``//`` agree
    bit-for-bit); zero buckets render as a space.  Two map-side-combined
    aggregations plus a 5-row broadcast join — output is |groups| rows."""
    chars = F.array(*[F.lit(c) for c in _SPARKBAR_CHARS])
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86400000000)
        ).alias("d"),
    )
    mm = ev.groupBy("event_type").agg(
        F.min("d").alias("mn"), F.max("d").alias("mx")
    )
    bsum = (
        ev.join(F.broadcast(mm), "event_type")
        .select(
            "event_type",
            F.floor((F.col("d") - F.col("mn")) * 16 / (F.col("mx") - F.col("mn") + 1))
            .alias("b"),
        )
        .groupBy("event_type", "b")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    assembled = bsum.groupBy("event_type").agg(
        F.map_from_entries(F.collect_list(F.struct("b", "s"))).alias("m"),
        F.max("s").alias("mxv"),
    )
    level = lambda s, mxv: F.element_at(  # noqa: E731
        chars, (F.floor((s * 8 - 1) / mxv) + 1).cast("int")
    )
    return assembled.select(
        "event_type",
        F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(0), F.lit(15)),
                lambda b: F.when(
                    F.coalesce(
                        F.element_at("m", b.cast("bigint")), F.lit(0)
                    )
                    == 0,
                    F.lit(" "),
                ).otherwise(
                    level(F.element_at("m", b.cast("bigint")), F.col("mxv"))
                ),
            ),
        ).alias("bar"),
    )


@register(
    "anova_f_test",
    oracle="""
WITH g AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(value, 8) AS DECIMAL(38,10))) AS DOUBLE) AS s,
         CAST(SUM(CAST(ROUND(value * value, 8) AS DECIMAL(38,10))) AS DOUBLE) AS sq
  FROM events GROUP BY event_type
), tot AS (
  SELECT CAST(SUM(n) AS DOUBLE) AS nn, COUNT(*) AS k,
         CAST(SUM(CAST(s AS DECIMAL(38,10))) AS DOUBLE) AS ts
  FROM g
), parts AS (
  SELECT CAST(SUM(CAST(ROUND(s * s / n, 8) AS DECIMAL(38,10))) AS DOUBLE) AS ssb_raw,
         CAST(SUM(CAST(ROUND(sq - s * s / n, 8) AS DECIMAL(38,10))) AS DOUBLE) AS ssw
  FROM g
)
SELECT CAST(k - 1 AS BIGINT) AS df_between, CAST(nn - k AS BIGINT) AS df_within,
       ROUND(((ssb_raw - ts * ts / nn) / (k - 1)) / (ssw / (nn - k)), 6) AS f_stat
FROM parts, tot
""",
    tags=("agg", "stats"),
)
def anova_f_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``analysisOfVariance(x, group)`` (CH 23.x): one-way ANOVA F-statistic
    of `value` across event types.  Everything reduces to per-group
    (n, Σx, Σx²) counting aggregates — one map-side-combined shuffle over a
    5-key space; SSB/SSW are assembled from the 5-row summary via the
    repo-wide round(8)→decimal-sum discipline, so the float path is
    order-independent and oracle-identical."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("value"), "s"),
        _dsum(F.col("value") * F.col("value"), "sq"),
    )
    parts = g.agg(
        F.sum("n").cast("double").alias("nn"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("s").cast(_DEC)).cast("double").alias("ts"),
        _dsum(F.col("s") * F.col("s") / F.col("n"), "ssb_raw"),
        _dsum(F.col("sq") - F.col("s") * F.col("s") / F.col("n"), "ssw"),
    )
    return parts.select(
        (F.col("k") - 1).cast("bigint").alias("df_between"),
        (F.col("nn") - F.col("k")).cast("bigint").alias("df_within"),
        F.round(
            ((F.col("ssb_raw") - F.col("ts") * F.col("ts") / F.col("nn"))
             / (F.col("k") - 1))
            / (F.col("ssw") / (F.col("nn") - F.col("k"))),
            6,
        ).alias("f_stat"),
    )


@register(
    "bounding_ratio",
    oracle="""
WITH o AS (
  SELECT event_type, epoch_us(ts) AS x, value AS y,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS ra,
         row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rd
  FROM events
)
SELECT event_type,
       ROUND((max(CASE WHEN rd = 1 THEN y END) - max(CASE WHEN ra = 1 THEN y END))
             / (max(CASE WHEN rd = 1 THEN x END) - max(CASE WHEN ra = 1 THEN x END))
             * 1000000, 6) AS slope_per_sec
FROM o GROUP BY event_type
""",
    tags=("agg", "stats"),
)
def bounding_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``boundingRatio(x, y)``: slope between the first and last point of
    each series — (y_last − y_first) / (x_last − x_first), scaled to
    per-second.  Ties on the timestamp are broken by event_id on BOTH sides
    (CH's own argMin/argMax tie behavior is 'any'; pinning the tiebreak is
    what makes the value oracle-checkable).  One window + one group agg."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("x"),
        F.col("value").alias("y"),
    )
    wa = Window.partitionBy("event_type").orderBy("x", "event_id")
    wd = Window.partitionBy("event_type").orderBy(
        F.col("x").desc(), F.col("event_id").desc()
    )
    o = ev.select(
        "event_type", "x", "y",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
    )
    return o.groupBy("event_type").agg(
        F.round(
            (F.max(F.when(F.col("rd") == 1, F.col("y")))
             - F.max(F.when(F.col("ra") == 1, F.col("y"))))
            / (F.max(F.when(F.col("rd") == 1, F.col("x")))
               - F.max(F.when(F.col("ra") == 1, F.col("x"))))
            * 1e6,
            6,
        ).alias("slope_per_sec")
    )
