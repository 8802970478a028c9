"""ClickHouse-flavored composite operators (SURVEY.md §2 'composite' rows) —
query entries backed by the reusable implementations in operators/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from clickhouseocp_spark.catalog import load_table
from clickhouseocp_spark.operators.asof import asof_join
from clickhouseocp_spark.operators.dictionary import dict_get
from clickhouseocp_spark.operators.fill import with_fill
from clickhouseocp_spark.operators.groupwise import (
    any_left_join,
    dedup_latest,
    limit_by,
    paste_join,
    top_k,
)
from clickhouseocp_spark.queries import register
from clickhouseocp_spark.queries._util import fsum, sql_fsum

# ---------------------------------------------------------------------------
# ASOF JOIN (SURVEY §2.3 — the hard one)
# ---------------------------------------------------------------------------


@register(
    "asof_join_backward",
    oracle="""
SELECT c.event_id, c.user_id, c.ts,
       p.ts AS purchase_ts, p.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts >= p.ts
""",
    tags=("asof", "join", "bench"),
)
def asof_join_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF LEFT JOIN (backward, >=): each click matched to the latest
    preceding-or-simultaneous purchase of the same user.  Union-tag-window
    implementation: one shuffle, no explosion (operators/asof.py)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    return asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_cols=["ts", "value"]
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_r").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )


@register(
    "asof_join_forward_strict",
    oracle="""
SELECT s.event_id, s.user_id, s.ts,
       (SELECT min(e.ts) FROM events e
         WHERE e.event_type = 'error' AND e.user_id = s.user_id AND e.ts > s.ts
       ) AS next_error_ts
FROM events s WHERE s.event_type = 'signup'
""",
    tags=("asof", "join"),
)
def asof_join_forward_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF forward strict (>): first error event strictly after each signup."""
    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select("event_id", "user_id", "ts")
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts")
    return asof_join(
        signups,
        errors,
        on="user_id",
        left_ts="ts",
        direction="forward",
        strict=True,
        right_cols=["ts"],
    ).select("event_id", "user_id", "ts", F.col("ts_r").alias("next_error_ts"))


# ---------------------------------------------------------------------------
# WITH FILL / INTERPOLATE (SURVEY §2.6)
# ---------------------------------------------------------------------------

_FILL_FILTER = "event_type = 'purchase' AND value > 180"


@register(
    "with_fill_daily",
    oracle=f"""
WITH d AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         COUNT(*) AS n, {sql_fsum('value', 's')}
  FROM events WHERE {_FILL_FILTER} GROUP BY 1
), b AS (SELECT min(day) AS mn, max(day) AS mx FROM d),
axis AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day FROM b)
SELECT axis.day, COALESCE(d.n, 0) AS n, COALESCE(d.s, 0.0) AS s
FROM axis LEFT JOIN d ON axis.day = d.day
""",
    tags=("fill",),
)
def with_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY day WITH FILL STEP 1 DAY: dense daily axis over a sparse
    high-value-purchase series, gaps zero-filled (ClickHouse fills with type
    defaults)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 180))
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"), fsum("value", "s"))
    )
    return with_fill(
        daily,
        order_col="day",
        step="INTERVAL 1 DAY",
        zero_fill={"n": 0, "s": 0.0},
    )


@register(
    "with_fill_interpolate",
    oracle=f"""
WITH d AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         COUNT(*) AS n, {sql_fsum('value', 's')}
  FROM events WHERE {_FILL_FILTER} GROUP BY 1
), b AS (SELECT min(day) AS mn, max(day) AS mx FROM d),
axis AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day FROM b)
SELECT axis.day, COALESCE(d.n, 0) AS n, d2.s AS carried_s
FROM axis
LEFT JOIN d ON axis.day = d.day
ASOF LEFT JOIN d d2 ON axis.day >= d2.day
""",
    tags=("fill",),
)
def with_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH FILL ... INTERPOLATE: generated rows carry the last observed sum
    forward (last_value ignore-nulls composite)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 180))
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"), fsum("value", "s"))
    )
    return with_fill(
        daily,
        order_col="day",
        step="INTERVAL 1 DAY",
        zero_fill={"n": 0},
        interpolate=("s",),
    ).withColumnRenamed("s", "carried_s")


@register(
    "with_fill_linear",
    oracle=f"""
WITH d AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         COUNT(*) AS n, {sql_fsum('value', 's')}
  FROM events WHERE {_FILL_FILTER} GROUP BY 1
), b AS (SELECT min(day) AS mn, max(day) AS mx FROM d),
axis AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day FROM b),
j AS (
  SELECT axis.day, d.s, CAST(floor(epoch(axis.day)) AS BIGINT) AS pos
  FROM axis LEFT JOIN d ON axis.day = d.day
), w AS (
  SELECT day, s, pos,
         last_value(s IGNORE NULLS) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN s IS NOT NULL THEN pos END IGNORE NULLS)
           OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp,
         first_value(s IGNORE NULLS) OVER (ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN s IS NOT NULL THEN pos END IGNORE NULLS)
           OVER (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS np
  FROM j
)
SELECT day,
       ROUND(CASE WHEN s IS NOT NULL THEN s
                  WHEN pp IS NULL THEN nv
                  WHEN np IS NULL THEN pv
                  ELSE pv + (nv - pv) * ((pos - pp) / CAST(np - pp AS DOUBLE)) END,
             6) AS lerp_s
FROM w
""",
    tags=("fill",),
)
def with_fill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH FILL ... INTERPOLATE, linear variant: generated rows take the
    straight line between the surrounding observed sums (carry at the
    boundaries).  Same axis/join machinery as the other fills; the oracle
    replays the identical prev/next-window formula, so every interpolated
    value is hash-checked."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.expr(_FILL_FILTER))
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"), fsum("value", "s"))
    )
    filled = with_fill(
        daily,
        order_col="day",
        step="INTERVAL 1 DAY",
        interpolate_linear=("s",),
    )
    return filled.select("day", F.round("s", 6).alias("lerp_s"))


# ---------------------------------------------------------------------------
# LIMIT BY / topK / ANY JOIN / dedup / PASTE JOIN (SURVEY §2.3/§2.4/§2.6)
# ---------------------------------------------------------------------------


@register(
    "limit_by_group",
    oracle="""
SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber, l_extendedprice
FROM (
  SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (
           PARTITION BY l_returnflag, l_linestatus
           ORDER BY CAST(l_extendedprice AS DECIMAL(18,2)) DESC, l_orderkey, l_linenumber
         ) AS rn
  FROM lineitem
) WHERE rn <= 3
""",
    tags=("limit_by",),
)
def limit_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `LIMIT 3 BY (l_returnflag, l_linestatus)` — top-priced
    lineitems per group (operators/groupwise.limit_by)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return limit_by(
        li,
        3,
        keys=["l_returnflag", "l_linestatus"],
        order=[
            F.col("l_extendedprice").cast("decimal(18,2)").desc(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        ],
    )


@register(
    "top_k_heavy_hitters",
    oracle="""
SELECT user_id, COUNT(*) AS cnt FROM events
GROUP BY user_id ORDER BY cnt DESC, user_id ASC LIMIT 10
""",
    tags=("top_k", "agg"),
)
def top_k_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """topK(10): heaviest users by event count, exact (SURVEY §2.4 topK row);
    deterministic tie-break on the key."""
    ev = load_table(spark, sf_dir, "events")
    return top_k(ev, 10, by="user_id")


@register(
    "any_left_join",
    oracle="""
SELECT o_orderkey, o_totalprice, l_partkey, l_quantity
FROM orders LEFT JOIN (
  SELECT * FROM (
    SELECT l_orderkey, l_partkey, l_quantity,
           row_number() OVER (PARTITION BY l_orderkey
                              ORDER BY l_linenumber, l_partkey, l_suppkey, CAST(l_quantity AS DECIMAL(18,2))) AS rn
    FROM lineitem
  ) WHERE rn = 1
) ON o_orderkey = l_orderkey
""",
    tags=("join",),
)
def any_left_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANY LEFT JOIN (at most one right row per key; SURVEY §2.3).  CH picks
    an arbitrary match — we pin first-by-linenumber for determinism."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_linenumber",
    )
    return any_left_join(
        orders,
        li,
        on=["o_orderkey"],
        order=[
            F.col("l_linenumber"),
            F.col("l_partkey"),
            F.col("l_suppkey"),
            F.col("l_quantity").cast("decimal(18,2)"),
        ],
    ).drop("l_linenumber", "l_suppkey")


@register(
    "dedup_latest_version",
    oracle="""
SELECT user_id, event_id, ts, value
FROM (
  SELECT user_id, event_id, ts, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
    tags=("dedup", "mergetree"),
)
def dedup_latest_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReplacingMergeTree read-time dedup (SURVEY §2.1): latest row per key by
    version (ts, event_id)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    return dedup_latest(
        ev, keys=["user_id"], version=[F.col("ts").desc(), F.col("event_id").desc()]
    )


@register(
    "paste_join_positional",
    oracle="""
WITH c AS (SELECT c_custkey, c_name, row_number() OVER (ORDER BY c_custkey) AS rn FROM customer),
     s AS (SELECT s_suppkey, s_name, row_number() OVER (ORDER BY s_suppkey) AS rn FROM supplier)
SELECT c.rn AS pos, c_custkey, c_name, s_suppkey, s_name
FROM c JOIN s ON c.rn = s.rn
""",
    tags=("join",),
)
def paste_join_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PASTE JOIN (positional zip, SURVEY §2.3) under explicit total orders."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    zipped = paste_join(cust, supp, left_order=["c_custkey"], right_order=["s_suppkey"])
    w = Window.orderBy("c_custkey")
    return zipped.withColumn("pos", F.row_number().over(w)).select(
        "pos", "c_custkey", "c_name", "s_suppkey", "s_name"
    )


# ---------------------------------------------------------------------------
# Aggregate combinators (SURVEY §2.4): -If, pivot-style, WITH TOTALS,
# partial/merge re-aggregation
# ---------------------------------------------------------------------------


@register(
    "sum_if_combinators",
    oracle=f"""
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) FILTER (WHERE l_quantity > 30) AS DOUBLE) AS sum_if_price,
       COUNT(*) FILTER (WHERE l_discount > 0.05) AS count_if_deep,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) FILTER (WHERE l_tax > 0.04) AS DOUBLE)
         / COUNT(l_quantity) FILTER (WHERE l_tax > 0.04) AS avg_if_qty
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg", "combinator"),
)
def sum_if_combinators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse -If combinators (sumIf/countIf/avgIf) → conditional
    aggregation via when()/FILTER (SURVEY §2.4)."""
    li = load_table(spark, sf_dir, "lineitem")
    dec_price = F.col("l_extendedprice").cast("decimal(38,6)")
    dec_qty = F.col("l_quantity").cast("decimal(38,6)")
    qty_cond = F.col("l_tax") > 0.04
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_quantity") > 30, dec_price)).cast("double").alias("sum_if_price"),
        F.count(F.when(F.col("l_discount") > 0.05, F.lit(1))).alias("count_if_deep"),
        (
            F.sum(F.when(qty_cond, dec_qty)).cast("double")
            / F.count(F.when(qty_cond, F.col("l_quantity")))
        ).alias("avg_if_qty"),
    )


@register(
    "pivot_sum_if",
    oracle=f"""
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
       COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase_value
FROM events GROUP BY user_id
""",
    tags=("agg", "combinator"),
)
def pivot_sum_if(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-by-conditional-aggregation — the ClickHouse idiom for wide
    per-category columns (sumIf per category)."""
    ev = load_table(spark, sf_dir, "events")

    def n_of(t: str) -> F.Column:
        return F.count(F.when(F.col("event_type") == t, F.lit(1))).alias(f"n_{t}")

    return ev.groupBy("user_id").agg(
        n_of("click"),
        n_of("view"),
        n_of("error"),
        F.sum(F.when(F.col("event_type") == "purchase", F.col("value").cast("decimal(38,6)")))
        .cast("double")
        .alias("purchase_value"),
    )


@register(
    "with_totals",
    oracle=f"""
SELECT event_type, COUNT(*) AS n, {sql_fsum('value', 'sum_value')}
FROM events GROUP BY event_type
UNION ALL
SELECT '<TOTAL>' AS event_type, COUNT(*) AS n, {sql_fsum('value', 'sum_value')}
FROM events
""",
    tags=("agg",),
)
def with_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... WITH TOTALS (SURVEY §2.4): per-group rows plus a grand
    total row tagged '<TOTAL>'."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), fsum("value", "sum_value")
    )
    total = ev.agg(F.count(F.lit(1)).alias("n"), fsum("value", "sum_value")).select(
        F.lit("<TOTAL>").alias("event_type"), "n", "sum_value"
    )
    return per.unionByName(total)


@register(
    "partial_merge_reagg",
    oracle=f"""
SELECT user_id, COUNT(*) AS n, {sql_fsum('value', 'sum_value')}
FROM events GROUP BY user_id
""",
    tags=("agg", "mergetree"),
)
def partial_merge_reagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """-State/-Merge combinator semantics (SURVEY §2.4, AggregatingMergeTree):
    partial aggregates per (user, day) materialized, then merged to per-user —
    provably equal to direct aggregation because count/decimal-sum states
    merge associatively (the oracle computes the direct form)."""
    ev = load_table(spark, sf_dir, "events")
    partial = ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("ps"),
    )
    return partial.groupBy("user_id").agg(
        F.sum("pn").alias("n"), F.sum("ps").cast("double").alias("sum_value")
    )


# ---------------------------------------------------------------------------
# Dictionary lookups / QUALIFY (SURVEY §2.1 / §2.2)
# ---------------------------------------------------------------------------


@register(
    "dict_get_default",
    oracle="""
SELECT s_suppkey, s_name,
       COALESCE(n_name, 'UNKNOWN') AS n_name
FROM supplier LEFT JOIN (SELECT * FROM nation WHERE n_nationkey < 20)
  ON s_nationkey = n_nationkey
""",
    tags=("dictionary",),
)
def dict_get_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dictGetOrDefault (SURVEY §2.1 dictionaries): broadcast lookup into a
    truncated nation dictionary; missing keys yield the default."""
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    dim = load_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 20)
    return dict_get(
        supp,
        dim,
        key="s_nationkey",
        dict_key="n_nationkey",
        values={"n_name": "UNKNOWN"},
    ).select("s_suppkey", "s_name", "n_name")


@register(
    "qualify_top_per_group",
    oracle="""
SELECT c_nationkey, c_name, c_acctbal
FROM (
  SELECT c_nationkey, c_name, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey) AS rn
  FROM customer
) WHERE rn = 1
""",
    tags=("window",),
)
def qualify_top_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY (post-window filter, SURVEY §2.2): richest customer per nation
    as a DataFrame chain — window column then filter."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").cast("decimal(18,2)").desc(), F.col("c_custkey")
    )
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", "c_name", "c_acctbal")
    )


@register(
    "array_join_parallel",
    oracle="""
SELECT doc_id,
       unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos,
       unnest(string_split(text, ' ')) AS word,
       unnest(list_transform(string_split(text, ' '), x -> length(x))) AS wlen
FROM documents WHERE doc_id < 20
""",
    tags=("array",),
)
def array_join_parallel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY JOIN over parallel arrays (SURVEY §2.3): posexplode of zipped
    arrays — CH unnests parallel arrays in lockstep, Spark zips then explodes."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    words = F.split("text", " ")
    lens = F.transform(words, lambda x: F.length(x))
    return docs.select(
        "doc_id", F.posexplode(F.arrays_zip(words.alias("w"), lens.alias("l")))
    ).select(
        "doc_id",
        (F.col("pos") + 1).alias("pos"),
        F.col("col.w").alias("word"),
        F.col("col.l").alias("wlen"),
    )


@register(
    "asof_join_inner",
    oracle="""
SELECT c.event_id, c.user_id, c.ts, p.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'view') c
ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts >= p.ts
""",
    tags=("asof", "join"),
)
def asof_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF INNER JOIN: views with no preceding purchase are dropped
    (how='inner' in operators/asof.py)."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    return asof_join(
        views, purchases, on="user_id", left_ts="ts", right_cols=["value"], how="inner"
    ).select("event_id", "user_id", "ts", F.col("value").alias("purchase_value"))


@register(
    "with_fill_from_to",
    oracle="""
WITH d AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n
  FROM events WHERE event_type = 'purchase' AND value > 180 GROUP BY 1
),
axis AS (SELECT unnest(generate_series(TIMESTAMP '2023-12-29', TIMESTAMP '2024-02-03', INTERVAL 1 DAY)) AS day)
SELECT axis.day, COALESCE(d.n, 0) AS n
FROM axis LEFT JOIN d ON axis.day = d.day
""",
    tags=("fill",),
)
def with_fill_from_to(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH FILL FROM ... TO ... (SURVEY §2.6): explicit axis bounds extend
    beyond the data range on both sides (leading/trailing zero rows)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 180))
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return with_fill(
        daily,
        order_col="day",
        step="INTERVAL 1 DAY",
        fill_from=F.lit("2023-12-29 00:00:00").cast("timestamp"),
        fill_to=F.lit("2024-02-03 00:00:00").cast("timestamp"),
        zero_fill={"n": 0},
    )


@register(
    "with_fill_staleness",
    oracle="""
WITH base AS (
  SELECT date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS k,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders WHERE o_orderdate < TIMESTAMP '1995-09-01' GROUP BY 1
),
nx AS (SELECT k, n, lead(k) OVER (ORDER BY k) AS nk FROM base),
fills AS (
  SELECT unnest(generate_series(k + 1,
                                LEAST(COALESCE(nk, k + 4) - 1, k + 3))) AS k,
         CAST(0 AS BIGINT) AS n
  FROM nx
)
SELECT k, n FROM base
UNION ALL
SELECT k, n FROM fills
""",
    tags=("fill",),
)
def with_fill_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH FILL ... STALENESS (CH 25.1, SURVEY §2.6 extension): generated
    rows extend at most ``staleness`` past the previous observed row — a
    gap wider than the staleness stays a gap instead of being filled to the
    next observation.  Axis = integer day index; staleness 4 with step 1
    fills at most 3 rows after each observation — INCLUDING trailing rows
    past the last observation (strict ``gap < staleness``, matching CH docs:
    keys 0,5,10,15 STALENESS 3 emit 15,16,17).  The oracle replays per-row:
    generate_series from k+1 to min(next_k - 1, k + 3), with next_k
    defaulting to k + staleness for the last row.  Plan: same as with_fill (bounded axis build +
    one join) plus one window pass for the previous-observation carry."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-09-01").cast("timestamp")
    )
    daily = o.groupBy(
        F.datediff("o_orderdate", F.lit("1995-01-01").cast("timestamp")).alias("k")
    ).agg(F.count(F.lit(1)).alias("n"))
    return with_fill(daily, order_col="k", step="1", staleness="4", zero_fill={"n": 0})


@register(
    "dict_hierarchy_ops",
    oracle="""
WITH rn AS (SELECT n_nationkey, n_regionkey FROM nation)
SELECT s_suppkey,
  CAST(s_nationkey AS VARCHAR) || ','
    || CAST(100 + n_regionkey AS VARCHAR) || ',1000' AS chain_str,
  CAST(n_regionkey = 2 AS INT) AS in_r2,
  (SELECT string_agg(CAST(n2.n_nationkey AS VARCHAR), ','
                     ORDER BY n2.n_nationkey)
   FROM nation n2 WHERE n2.n_regionkey = rn.n_regionkey) AS region_desc,
  '100,101,102,103,104' AS root_children,
  (SELECT string_agg(CAST(k AS VARCHAR), ',' ORDER BY k)
   FROM (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation
         UNION ALL SELECT 100 + r_regionkey FROM region)) AS root_desc
FROM supplier JOIN rn ON s_nationkey = n_nationkey
ORDER BY s_suppkey
""",
    tags=("dictionary", "hierarchy"),
)
def dict_hierarchy_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical dictionary tier (SURVEY §2.1 dictionaries —
    dictGetHierarchy / dictIsIn / dictGetChildren / dictGetDescendants):
    a 3-level tree (root 1000 → region nodes 100+r → nations) built from
    the TPC-H dimension tables, closed by bounded broadcast self-joins
    on the DICTIONARY side only (``operators/dictionary.py``
    dict_hierarchy; no driver collect), then broadcast-joined to the
    supplier fact side once.  ``root_children`` vs ``root_desc``
    exercises the level=1 / level=0 split."""
    from clickhouseocp_spark.operators.dictionary import (
        dict_descendants,
        dict_get_children,
        dict_get_hierarchy,
        dict_is_in,
    )

    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").cast("bigint").alias("s_nationkey")
    )
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    dic = (
        nat.select(
            F.col("n_nationkey").cast("bigint").alias("k"),
            (F.col("n_regionkey").cast("bigint") + 100).alias("p"),
        )
        .union(
            reg.select(
                (F.col("r_regionkey").cast("bigint") + 100).alias("k"),
                F.lit(1000).cast("bigint").alias("p"),
            )
        )
        .union(
            spark.range(1).select(
                F.lit(1000).cast("bigint").alias("k"),
                F.lit(0).cast("bigint").alias("p"),
            )
        )
    )

    def _s(col):
        return F.array_join(
            F.transform(col, lambda x: x.cast("string")), ","
        )

    out = dict_get_hierarchy(
        sup, dic, key="s_nationkey", dict_key="k", parent="p", max_depth=4
    )
    out = dict_is_in(
        out, dic, child="s_nationkey", ancestor=102, dict_key="k",
        parent="p", out="in_r2", max_depth=4,
    )
    # the supplier's region node, then its level-0 descendants (= the
    # nations under it)
    out = out.withColumn(
        "region_node", F.element_at(F.col("hierarchy"), 2)
    )
    desc = dict_descendants(dic, "k", "p", level=0, max_depth=4)
    out = out.join(
        F.broadcast(desc.select(F.col("k").alias("region_node"),
                                F.col("descendants").alias("rdesc"))),
        "region_node", "left",
    )
    # root closure: one broadcast row for children (level 1) and all
    # descendants (level 0)
    root_children = dict_get_children(dic, "k", "p").filter(
        F.col("k") == 1000
    ).select(F.col("descendants").alias("rc"))
    root_desc = desc.filter(F.col("k") == 1000).select(
        F.col("descendants").alias("rd")
    )
    out = out.join(F.broadcast(root_children)).join(F.broadcast(root_desc))
    return out.select(
        "s_suppkey",
        _s(F.col("hierarchy")).alias("chain_str"),
        F.col("in_r2"),
        _s(F.col("rdesc")).alias("region_desc"),
        _s(F.col("rc")).alias("root_children"),
        _s(F.col("rd")).alias("root_desc"),
    ).orderBy("s_suppkey")
