"""MergeTree-variant read semantics, mutations, Merge engine, obfuscation,
and the remaining aggregate rows (SURVEY.md §2.1 / §2.4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from clickhouseocp_spark.catalog import load_table
from clickhouseocp_spark.operators.groupwise import graphite_rollup
from clickhouseocp_spark.operators.mutations import (
    collapsing_merge,
    delete_where,
    obfuscate,
    update_where,
)
from clickhouseocp_spark.queries import register
from clickhouseocp_spark.queries._util import r6, sql_fsum


@register(
    "collapsing_merge_read",
    oracle="""
WITH signed AS (
  SELECT user_id, CASE WHEN event_type = 'error' THEN -1 ELSE 1 END AS sign, value
  FROM events WHERE event_type IN ('purchase', 'error')
)
SELECT user_id, CAST(SUM(sign) AS BIGINT) AS net_sign,
       CAST(SUM(CAST(value AS DECIMAL(38,6)) * sign) AS DOUBLE) AS value
FROM signed GROUP BY user_id
HAVING SUM(sign) > 0
""",
    tags=("mergetree",),
)
def collapsing_merge_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollapsingMergeTree read-time fold (SURVEY §2.1): purchases carry
    sign=+1, errors sign=-1 (a cancel-out ledger); collapse keeps users with
    positive net sign and sign-weighted sums (operators/mutations.py)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "error")
    )
    signed = ev.select(
        "user_id",
        F.when(F.col("event_type") == "error", -1).otherwise(1).alias("sign"),
        "value",
    )
    return collapsing_merge(signed, keys=["user_id"], sign_col="sign", value_cols=["value"])


@register(
    "mutation_update_delete",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 1.1 ELSE o_totalprice END AS o_totalprice,
       CASE WHEN o_orderstatus = 'O' THEN '1-URGENT' ELSE o_orderpriority END AS o_orderpriority
FROM orders
WHERE NOT (o_totalprice < 50000)
""",
    tags=("mutation",),
)
def mutation_update_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER UPDATE + DELETE mutations as recompute (SURVEY §2.1 mutability):
    delete small orders, then bump open orders (operators/mutations.py)."""
    o = load_table(spark, sf_dir, "orders")
    survived = delete_where(o, F.col("o_totalprice") < 50000)
    mutated = update_where(
        survived,
        F.col("o_orderstatus") == "O",
        {
            "o_totalprice": F.col("o_totalprice") * 1.1,
            "o_orderpriority": F.lit("1-URGENT"),
        },
    )
    return mutated.select("o_orderkey", "o_totalprice", "o_orderpriority")


@register(
    "merge_engine_union",
    oracle=f"""
SELECT src, COUNT(*) AS n, {sql_fsum('acctbal', 'total_bal')}
FROM (
  SELECT 'customer' AS src, c_acctbal AS acctbal FROM customer
  UNION ALL
  SELECT 'supplier' AS src, s_acctbal AS acctbal FROM supplier
) GROUP BY src
""",
    tags=("mergetree", "setop"),
)
def merge_engine_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge engine (SURVEY §2.1: union-of-tables view) → unionByName over
    schema-aligned projections, aggregated per source table."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("src"), F.col("c_acctbal").alias("acctbal")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("src"), F.col("s_acctbal").alias("acctbal")
    )
    from clickhouseocp_spark.queries._util import fsum

    return (
        cust.unionByName(supp)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"), fsum("acctbal", "total_bal"))
    )


@register(
    "obfuscate_table",
    oracle="""
SELECT c_custkey,
       'anon_' || substring(md5(c_name), 1, 12) AS c_name,
       c_mktsegment
FROM customer WHERE c_custkey <= 200
""",
    tags=("sink", "obfuscate"),
)
def obfuscate_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clickhouse-obfuscator analog (reference Dockerfile:171): stable string
    digests keep join keys consistent while hiding values; the deterministic
    construction lets the oracle reproduce it exactly."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return obfuscate(c, string_cols=["c_name"]).select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "agg_regression",
    oracle="""
SELECT l_returnflag,
       ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
       ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg", "stats"),
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """simpleLinearRegression (SURVEY §2.4) → SQL regression aggregates
    (regr_slope/intercept/r2/count), round(6)-stabilized."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        r6(F.regr_slope("l_extendedprice", "l_quantity"), "slope"),
        r6(F.regr_intercept("l_extendedprice", "l_quantity"), "intercept"),
        r6(F.regr_r2("l_extendedprice", "l_quantity"), "r2"),
        F.regr_count("l_extendedprice", "l_quantity").cast("bigint").alias("n"),
    )


@register(
    "string_distances",
    oracle="""
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.w, b.w) AS INTEGER) AS edit_dist,
       ROUND(1.0 - CAST(len(list_filter(a.g, x -> list_contains(b.g, x))) AS DOUBLE)
             / nullif(len(a.g) + len(b.g) - len(list_filter(a.g, x -> list_contains(b.g, x))), 0),
             6) AS trigram_dist
FROM (SELECT doc_id, string_split(text,' ')[1] AS w,
             list_distinct(list_transform(range(1, greatest(length(string_split(text,' ')[1]) - 1, 1)),
               i -> substring(string_split(text,' ')[1], i, 3))) AS g
      FROM documents WHERE doc_id < 12) a
JOIN (SELECT doc_id, string_split(text,' ')[1] AS w,
             list_distinct(list_transform(range(1, greatest(length(string_split(text,' ')[1]) - 1, 1)),
               i -> substring(string_split(text,' ')[1], i, 3))) AS g
      FROM documents WHERE doc_id < 12) b
  ON a.doc_id < b.doc_id
""",
    tags=("scalar", "text"),
)
def string_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """editDistance/ngramDistance (SURVEY §2.8 regex/search family):
    levenshtein + character-trigram Jaccard distance between first words of
    document pairs."""
    from clickhouseocp_spark.functions.text import char_shingles

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 12)
        .select(
            "doc_id",
            F.element_at(F.split("text", " "), 1).alias("w"),
        )
        .withColumn("g", F.array_distinct(char_shingles(F.col("w"), 3)))
    )
    a, b = d.alias("a"), d.alias("b")
    inter = F.size(F.array_intersect(F.col("a.g"), F.col("b.g"))).cast("double")
    union = F.size(F.col("a.g")) + F.size(F.col("b.g")) - inter
    return a.join(b, F.col("a.doc_id") < F.col("b.doc_id")).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.levenshtein(F.col("a.w"), F.col("b.w")).cast("int").alias("edit_dist"),
        F.round(1.0 - inter / F.nullif(union, F.lit(0.0)), 6).alias("trigram_dist"),
    )


@register(
    "numbers_table_function",
    oracle="""
SELECT CAST(number % 7 AS BIGINT) AS bucket,
       COUNT(*) AS n,
       CAST(SUM(number) AS BIGINT) AS total,
       CAST(SUM(number * number) AS BIGINT) AS sum_sq
FROM (SELECT unnest(range(0, 100000)) AS number)
GROUP BY CAST(number % 7 AS BIGINT)
""",
    tags=("source",),
)
def numbers_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """numbers(N) table function (SURVEY §2.1) → spark.range; aggregated so
    the oracle (generate_series) checks the generated domain exactly."""
    from clickhouseocp_spark.sources.readers import numbers

    n = numbers(spark, 100_000)
    return n.groupBy((F.col("number") % 7).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("number").alias("total"),
        F.sum(F.col("number") * F.col("number")).alias("sum_sq"),
    )


@register(
    "graphite_rollup_tiers",
    oracle="""
WITH e AS (
  SELECT event_type AS path,
         CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
         value
  FROM events
),
p AS (
  SELECT path, value, tsec,
         CASE WHEN 1706659200 - tsec >= 1814400 THEN 604800
              WHEN 1706659200 - tsec >= 604800 THEN 86400
              ELSE 3600 END AS prec
  FROM e
)
SELECT path,
       CAST(to_timestamp((tsec // prec) * prec) AS TIMESTAMP) AS bucket_ts,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS value_sum,
       CAST(COUNT(*) AS BIGINT) AS n
FROM p GROUP BY path, (tsec // prec) * prec
""",
    tags=("mergetree", "rollup"),
)
def graphite_rollup_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphiteMergeTree age-tiered rollup (operators/groupwise.
    graphite_rollup): hourly buckets for the last week before the fixed
    reference time 2024-01-31, daily for 1-3 weeks old, weekly beyond —
    re-mergeable (decimal sum, count) states per (path, bucket)."""
    ev = load_table(spark, sf_dir, "events")
    return graphite_rollup(
        ev.select(F.col("event_type").alias("path"), "ts", "value"),
        retentions=[(0, 3600), (604800, 86400), (1814400, 604800)],
        now="2024-01-31 00:00:00",
    )
