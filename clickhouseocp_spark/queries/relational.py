"""Relational core: scans, filters, projections, joins, aggregations, windows,
sorts, set ops — SURVEY.md §2.2-§2.7 (capabilities shipped by the reference's
engine pin, /root/reference Dockerfile:102-104).

Every query here is declarative DataFrame API: Catalyst provides predicate
pushdown (the PREWHERE analog, SURVEY §2.2), column pruning, partial+final
aggregation, and join-strategy selection (SURVEY §2.3).  Dims bounded by nature
(nation/region) are broadcast explicitly — at 100 TB the fact side never fits,
the 25/5-row dims always do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from clickhouseocp_spark.catalog import load_table, register_tables
from clickhouseocp_spark.queries import register
from clickhouseocp_spark.queries._util import favg, fsum, r6, sql_favg, sql_fsum

# ---------------------------------------------------------------------------
# Phase 0 flagship — TPC-H Q1-style pricing summary (scan→filter→agg→sort)
# ---------------------------------------------------------------------------

_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {sql_fsum('l_quantity', 'sum_qty')},
       {sql_fsum('l_extendedprice', 'sum_base_price')},
       {sql_fsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {sql_fsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       {sql_favg('l_quantity', 'avg_qty')},
       {sql_favg('l_extendedprice', 'avg_price')},
       {sql_favg('l_discount', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE, tags=("flagship", "agg", "bench"))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full-scan filter + hash aggregation with expression arithmetic.

    ClickHouse runs this shape via vectorized blocks + two-level hash agg
    (SURVEY §2.4); Spark's HashAggregateExec with partial/final split is the
    direct analog and the parquet scan receives the shipdate pushdown.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fsum("l_quantity", "sum_qty"),
            fsum("l_extendedprice", "sum_base_price"),
            fsum(disc_price, "sum_disc_price"),
            fsum(charge, "sum_charge"),
            favg("l_quantity", "avg_qty"),
            favg("l_extendedprice", "avg_price"),
            favg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# §2.2 projections / filters / predicates
# ---------------------------------------------------------------------------


@register(
    "filter_project",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS disc_price,
       l_quantity + l_tax AS qty_tax,
       CASE WHEN l_discount > 0.05 THEN 'deep' ELSE 'shallow' END AS disc_band
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
  AND l_returnflag IN ('A', 'R')
  AND (l_quantity >= 25 OR l_discount < 0.02)
""",
    tags=("filter", "project"),
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE with BETWEEN/IN/OR + projected row-level arithmetic (SURVEY §2.2).
    The PREWHERE analog is automatic: only filter columns reach the scan
    predicate, Parquet row-group stats skip non-matching granules."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_shipdate").between(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1996-12-31").cast("timestamp"),
            )
            & F.col("l_returnflag").isin("A", "R")
            & ((F.col("l_quantity") >= 25) | (F.col("l_discount") < 0.02))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
            (F.col("l_quantity") + F.col("l_tax")).alias("qty_tax"),
            F.when(F.col("l_discount") > 0.05, "deep").otherwise("shallow").alias("disc_band"),
        )
    )


@register(
    "select_except_apply",
    oracle="""
SELECT p_partkey, p_size * 2 AS p_size, p_retailprice * 2 AS p_retailprice
FROM part WHERE p_size <= 25
""",
    tags=("project",),
)
def select_except_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`* EXCEPT(...) APPLY(f)` column-set modifiers (SURVEY §2.2) via Python
    comprehension over df.columns — the DataFrame-native equivalent."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 25)
    except_cols = {"p_name", "p_brand", "p_type"}
    numeric = {"p_size", "p_retailprice"}
    cols = [
        ((F.col(c) * 2).alias(c) if c in numeric else F.col(c))
        for c in part.columns
        if c not in except_cols
    ]
    return part.select(*cols)


@register(
    "json_extract_agg",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
""",
    tags=("json",),
)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from events.props (ClickHouse JSONExtract*, SURVEY §2.8)
    via get_json_object → typed cast, aggregated per event_type."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "sample_by_key",
    oracle=f"""
SELECT l_returnflag, COUNT(*) AS n, {sql_fsum('l_extendedprice', 'sum_price')}
FROM lineitem WHERE l_orderkey % 10 = 3
GROUP BY l_returnflag
""",
    tags=("sample",),
)
def sample_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic SAMPLE-by-key (ClickHouse `SAMPLE` hashes the sampling
    key, SURVEY §2.2); modulo on the key is the documented deterministic
    variant so the oracle can reproduce it."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") % 10 == 3)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), fsum("l_extendedprice", "sum_price"))
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@register(
    "join_inner_multi",
    oracle=f"""
SELECT r_name, n_name,
       COUNT(*) AS n_orders,
       {sql_fsum('o_totalprice', 'revenue')}
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderstatus = 'F'
GROUP BY r_name, n_name
""",
    tags=("join", "bench"),
)
def join_inner_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake multi-hop equi-join (orders→customer→nation→region).
    nation/region are geography-bounded → explicit broadcast; customer joins
    shuffle on the key and scale with the fact side (100 TB-safe)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), fsum("o_totalprice", "revenue"))
    )


@register(
    "join_left_agg",
    oracle="""
SELECT c_custkey, c_mktsegment,
       COUNT(o_orderkey) AS n_orders,
       COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 0.0) AS total_spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
""",
    tags=("join",),
)
def join_left_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER JOIN with ANSI NULL semantics (SURVEY §2.3: we adopt NULLs,
    not ClickHouse's default-value fill) — customers with zero orders kept."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double"),
                F.lit(0.0),
            ).alias("total_spend"),
        )
    )


@register(
    "join_full_outer",
    oracle="""
WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
     s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
SELECT COALESCE(c.nk, s.nk) AS nationkey, n_cust, n_supp
FROM c FULL OUTER JOIN s ON c.nk = s.nk
""",
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER JOIN of two aggregated sides; NULL counts survive on
    non-matching nations."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cust.join(supp, cust.nk == supp.nk, "full_outer").select(
        F.coalesce(cust.nk, supp.nk).alias("nationkey"), "n_cust", "n_supp"
    )


@register(
    "join_semi",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
GROUP BY c_mktsegment
""",
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI JOIN (ClickHouse `LEFT SEMI JOIN` / `IN (subquery)`)."""
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "join_anti",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
GROUP BY c_mktsegment
""",
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI JOIN — customers with no high-value orders."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "join_cross",
    oracle="""
SELECT r_name, n_name FROM region CROSS JOIN nation
""",
    tags=("join",),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN (cartesian) of the two bounded dims — 125 pairs."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


@register(
    "join_theta_range",
    oracle=f"""
SELECT p_brand, COUNT(*) AS n, {sql_fsum('l_extendedprice', 'sum_price')}
FROM lineitem JOIN part
  ON l_partkey = p_partkey
 AND l_extendedprice > p_retailprice * 20
 AND l_quantity BETWEEN p_size - 5 AND p_size + 30
GROUP BY p_brand
""",
    tags=("join",),
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed equi + theta (range) join condition — ClickHouse theta joins
    (SURVEY §2.3); Catalyst plans the equi part as the join key and evaluates
    the range residual as a post-join filter."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (li.l_partkey == part.p_partkey)
        & (li.l_extendedprice > part.p_retailprice * 20)
        & (li.l_quantity.between(part.p_size - 5, part.p_size + 30))
    )
    return (
        li.join(part, cond)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), fsum("l_extendedprice", "sum_price"))
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------


@register(
    "agg_basic",
    oracle=f"""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty,
       {sql_fsum('l_quantity', 'sum_qty')},
       {sql_favg('l_quantity', 'avg_qty')}
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg",),
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count / count-distinct-exact / min / max / sum / avg (SURVEY §2.4)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        fsum("l_quantity", "sum_qty"),
        favg("l_quantity", "avg_qty"),
    )


@register(
    "agg_argminmax",
    oracle="""
SELECT c_nationkey,
       arg_max(c_name, c_acctbal) AS richest,
       arg_min(c_name, c_acctbal) AS poorest,
       MAX(c_acctbal) AS max_bal
FROM customer GROUP BY c_nationkey
""",
    tags=("agg",),
)
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse argMax/argMin → Spark max_by/min_by (SURVEY §2.4)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.max_by("c_name", "c_acctbal").alias("richest"),
        F.min_by("c_name", "c_acctbal").alias("poorest"),
        F.max("c_acctbal").alias("max_bal"),
    )


@register(
    "agg_collect_sorted",
    oracle="""
SELECT user_id,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_seen,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
FROM events GROUP BY user_id
""",
    tags=("agg",),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupArray/groupUniqArray (SURVEY §2.4) → collect_set, rendered as a
    sorted joined string so the value-hash is engine-stable."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types_seen"),
        F.countDistinct("event_type").alias("n_types"),
    )


@register(
    "agg_stats",
    oracle="""
SELECT l_returnflag,
       ROUND(var_pop(l_quantity), 6) AS var_pop_qty,
       ROUND(var_samp(l_quantity), 6) AS var_samp_qty,
       ROUND(stddev_pop(l_discount), 6) AS stddev_pop_disc,
       ROUND(stddev_samp(l_discount), 6) AS stddev_samp_disc,
       ROUND(covar_pop(l_quantity, l_discount), 6) AS covar_qd,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qp
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg", "stats"),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (SURVEY §2.4): varPop/varSamp/stddev/covar/corr.
    Normalized/small-magnitude inputs + round(6) keep cross-engine streaming-
    algorithm low-bit drift below the hash granularity."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        r6(F.var_pop("l_quantity"), "var_pop_qty"),
        r6(F.var_samp("l_quantity"), "var_samp_qty"),
        r6(F.stddev_pop("l_discount"), "stddev_pop_disc"),
        r6(F.stddev_samp("l_discount"), "stddev_samp_disc"),
        r6(F.covar_pop("l_quantity", "l_discount"), "covar_qd"),
        r6(F.corr("l_quantity", "l_extendedprice"), "corr_qp"),
    )


@register(
    "agg_quantiles",
    oracle="""
SELECT l_linestatus,
       ROUND(quantile_cont(l_quantity, 0.25), 6) AS q25,
       ROUND(quantile_cont(l_quantity, 0.5), 6) AS q50,
       ROUND(quantile_cont(l_quantity, 0.75), 6) AS q75,
       ROUND(median(l_extendedprice), 6) AS med_price
FROM lineitem GROUP BY l_linestatus
""",
    tags=("agg",),
)
def agg_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quantile/quantileExact/median (SURVEY §2.4) via exact interpolated
    percentile — matches DuckDB quantile_cont bit-for-bit after round(6)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        r6(F.percentile("l_quantity", F.lit(0.25)), "q25"),
        r6(F.percentile("l_quantity", F.lit(0.5)), "q50"),
        r6(F.percentile("l_quantity", F.lit(0.75)), "q75"),
        r6(F.percentile("l_extendedprice", F.lit(0.5)), "med_price"),
    )


@register(
    "agg_approx_distinct",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       TRUE AS hll_ok
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """uniq/uniqExact/uniqCombined (SURVEY §2.4): exact counts via
    count_distinct (oracle-checked) paired with HyperLogLog++ estimates whose
    relative error is asserted IN-QUERY — ``hll_ok`` is true iff both sketch
    estimates land within 5% of the exact companion, so the accuracy property
    itself passes through the driver's value-hash gate (sketch values are
    engine-specific and never leave the query)."""
    li = load_table(spark, sf_dir, "lineitem")
    agged = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("__hll_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("__hll_parts"),
    )

    def rel_err(approx: str, exact: str) -> F.Column:
        return F.abs(F.col(approx).cast("double") / F.col(exact) - 1.0)

    return agged.select(
        "l_returnflag",
        "exact_orders",
        "exact_parts",
        (
            (rel_err("__hll_orders", "exact_orders") <= 0.05)
            & (rel_err("__hll_parts", "exact_parts") <= 0.05)
        ).alias("hll_ok"),
    )


@register(
    "rollup_grouping",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
       COUNT(*) AS n, {sql_fsum('l_extendedprice', 'sum_price')}
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    tags=("agg",),
)
def rollup_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping_id (ClickHouse WITH ROLLUP/WITH TOTALS analog —
    the grand-total row is the gid=3 row, SURVEY §2.4)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        fsum("l_extendedprice", "sum_price"),
    )


@register(
    "cube_agg",
    oracle=f"""
SELECT event_type, CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
       COUNT(*) AS n, {sql_fsum('value', 'sum_value')}
FROM events GROUP BY CUBE (event_type, CAST(date_trunc('month', ts) AS TIMESTAMP))
""",
    tags=("agg",),
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, month)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.cube("event_type", F.date_trunc("month", "ts").alias("month")).agg(
        F.count(F.lit(1)).alias("n"), fsum("value", "sum_value")
    )


@register(
    "grouping_sets",
    oracle=f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {sql_fsum('l_quantity', 'sum_qty')}
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
    tags=("agg",),
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via Spark SQL over the registered fixture views."""
    register_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ---------------------------------------------------------------------------
# §2.5 window functions
# ---------------------------------------------------------------------------


@register(
    "window_rank",
    oracle="""
SELECT event_id, event_type, value,
       row_number() OVER w AS rn,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ROUND(percent_rank() OVER w, 6) AS prnk,
       ROUND(cume_dist() OVER w, 6) AS cdist,
       ntile(4) OVER w AS quartile
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)
""",
    tags=("window",),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window family (SURVEY §2.5) incl. named-WINDOW reuse via a
    shared Window spec; event_id tiebreak keeps every rank deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), "event_id")
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "window_lag_lead",
    oracle="""
SELECT event_id, user_id, ts, value,
       lag(value) OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       value - lag(value) OVER w AS running_diff,
       first_value(event_type) OVER w AS first_type,
       nth_value(event_type, 2) OVER w AS second_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/nth (ClickHouse lagInFrame/leadInFrame/neighbor,
    runningDifference — SURVEY §2.5/§2.8 composites)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("running_diff"),
        F.first("event_type").over(w).alias("first_type"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
    )


@register(
    "window_frames",
    oracle="""
SELECT event_id, user_id, ts, value,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
       COUNT(*) OVER (
            PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
            RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW) AS n_last_day
FROM events
""",
    tags=("window",),
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS / RANGE frames + running accumulation (runningAccumulate analog).
    Frame sums route through DECIMAL: exact under DuckDB's segment-tree vs
    Spark's streaming frame evaluation."""
    ev = load_table(spark, sf_dir, "events")
    wr = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dec = F.col("value").cast("decimal(38,6)")
    range_w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-86400, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.sum(dec).over(wr.rowsBetween(-3, 0)).cast("double").alias("moving_sum"),
        F.sum(dec).over(wr.rowsBetween(Window.unboundedPreceding, 0)).cast("double").alias("running_total"),
        F.count(F.lit(1)).over(range_w).alias("n_last_day"),
    )


# ---------------------------------------------------------------------------
# §2.6 sorts / limits
# ---------------------------------------------------------------------------


@register(
    "sort_nulls_offset",
    oracle="""
SELECT c_custkey, c_name, o_orderkey, o_totalprice
FROM customer LEFT JOIN orders ON c_custkey = o_custkey AND o_totalprice > 350000
ORDER BY o_totalprice DESC NULLS LAST, c_custkey ASC, o_orderkey ASC
LIMIT 50 OFFSET 10
""",
    tags=("sort",),
)
def sort_nulls_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY with explicit NULL placement + LIMIT/OFFSET
    (SURVEY §2.6); unique-key tiebreaks make pagination deterministic."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey) & (orders.o_totalprice > 350000),
        "left",
    )
    return (
        joined.select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .orderBy(
            F.col("o_totalprice").desc_nulls_last(),
            F.col("c_custkey").asc(),
            F.col("o_orderkey").asc(),
        )
        .offset(10)
        .limit(50)
    )


@register(
    "limit_with_ties",
    oracle="""
SELECT * FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         rank() OVER (ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC) AS rnk
  FROM orders
) WHERE rnk <= 20
""",
    tags=("sort",),
)
def limit_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT n WITH TIES (SURVEY §2.6) as rank()<=n — ties at the boundary are
    all kept; decimal sort key avoids cross-engine double-compare ambiguity."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice").cast("decimal(18,2)").desc())
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).alias("rnk"),
        ).filter(F.col("rnk") <= 20)
    )


# ---------------------------------------------------------------------------
# §2.7 set operations + subqueries
# ---------------------------------------------------------------------------


@register(
    "setops_union_intersect_except",
    oracle="""
WITH cn AS (SELECT c_nationkey AS nk FROM customer),
     sn AS (SELECT s_nationkey AS nk FROM supplier)
SELECT 'union_distinct' AS op, COUNT(*) AS n FROM (SELECT DISTINCT nk FROM (SELECT nk FROM cn UNION ALL SELECT nk FROM sn))
UNION ALL
SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
UNION ALL
SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
UNION ALL
SELECT 'intersect_all' AS op, COUNT(*) AS n FROM (SELECT nk FROM cn INTERSECT ALL SELECT nk FROM sn)
UNION ALL
SELECT 'except_all' AS op, COUNT(*) AS n FROM (SELECT nk FROM cn EXCEPT ALL SELECT nk FROM sn)
""",
    tags=("setop",),
)
def setops_union_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION/INTERSECT/EXCEPT with DISTINCT and ALL multiset variants
    (SURVEY §2.7), reduced to counts per op."""
    cn = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    sn = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))

    def cnt(df: DataFrame, op: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(op).alias("op"), "n")

    return (
        cnt(cn.union(sn).distinct(), "union_distinct")
        .unionByName(cnt(cn.intersect(sn), "intersect"))
        .unionByName(cnt(cn.subtract(sn), "except"))
        .unionByName(cnt(cn.intersectAll(sn), "intersect_all"))
        .unionByName(cnt(cn.exceptAll(sn), "except_all"))
    )


@register(
    "subquery_in_exists",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderstatus
""",
    tags=("subquery",),
)
def subquery_in_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery + correlated EXISTS (ClickHouse Analyzer surface, SURVEY
    §2.7) via Spark SQL — Catalyst rewrites both to semi-joins."""
    register_tables(spark, sf_dir, ("orders", "customer", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
          AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        GROUP BY o_orderstatus
        """
    )


@register(
    "json_variant",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) FILTER (WHERE json_extract_string(props, '$.k') IS NOT NULL) AS n_with_k
FROM events GROUP BY event_type
""",
    tags=("json", "variant"),
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON via Spark 4 VariantType (the CH JSON/Object type
    analog, SURVEY §1.2): parse_json once, typed variant_get extraction —
    faster than per-path string parsing when several paths are read."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.withColumn("v", F.parse_json("props"))
    k = F.try_variant_get(F.col("v"), "$.k", "bigint")
    return v.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(k).alias("n_with_k"),
    )


# ---------------------------------------------------------------------------
# TPC-H classics beyond Q1 — the multi-join analytics shapes the reference
# engine's own benchmark suite exercises (SURVEY §2.3/§2.4: hash joins with
# dimension broadcast + partial/final aggregation)
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey,
       {sql_fsum("l_extendedprice * (1 - l_discount)", "revenue")},
       o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
""",
    tags=("join", "agg", "bench"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: segment filter on customer, date-range filters pushed to
    both fact scans, two shuffled hash joins keyed on the fact keys, then a
    grouped revenue rollup with a top-10.  (Fixture deviation: the schema
    carries o_orderpriority instead of o_shippriority.)  l_orderkey joins
    co-partition lineitem↔orders; AQE broadcast-promotes the filtered
    customer side when small."""
    cut = F.lit("1995-03-15 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cut)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cut)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(fsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
SELECT n_name,
       {sql_fsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1996-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    tags=("join", "agg"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: six-table star join — facts shuffle on their join keys,
    the tiny nation/region dimensions broadcast explicitly, and the
    same-nation customer⇄supplier constraint rides the supplier join.
    The final agg is |nations| rows regardless of fact size."""
    # fixture dates span 1995-07..2001-08 → shift TPC-H's 1994 window forward
    cut0 = F.lit("1995-01-01 00:00:00").cast("timestamp")
    cut1 = F.lit("1996-01-01 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= cut0) & (F.col("o_orderdate") < cut1)
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = F.broadcast(
        nat.join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(asia_nations, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(fsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q6_forecast_revenue",
    oracle=f"""
SELECT {sql_fsum("l_extendedprice * l_discount", "revenue")},
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-06-01'
  AND l_shipdate < TIMESTAMP '1996-06-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=("agg", "filter"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate — every predicate reaches the
    parquet scan (PushedFilters), zero joins, one exchange for the global
    agg.  The shape ClickHouse wins with vectorized scans; Spark's analog
    is whole-stage codegen over the pruned column set."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-06-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-06-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            fsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
