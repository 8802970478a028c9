"""ClickHouse-dialect SQL TEXT queries (SURVEY.md §2.10 / round-1 verdict #2).

The reference's real entry surface is SQL text (`clickhouse-local -q '<SQL>'`,
/root/reference Dockefile-ubuntu:52); each query here is CH-dialect text fed
through ``chsql.transpile`` into ``spark.sql`` — proving a reference user can
paste their queries, not just rebuild them with the DataFrame API.  Every
query hash-matches a DuckDB oracle, the same gate as the rest of the registry.

The CH texts deliberately exercise the transpiler's whole supported surface:
parametric aggregates, -If combinators, PREWHERE, LIMIT BY, ASOF JOIN, array
lambdas, camelCase scalar vocabulary, CH type names in CAST.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clickhouseocp_spark.catalog import register_tables
from clickhouseocp_spark.chsql import transpile
from clickhouseocp_spark.queries import register
from clickhouseocp_spark.queries._util import sql_favg, sql_fsum


def _run(spark: SparkSession, sf_dir: str, ch_sql: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(transpile(ch_sql))


# --- 1. flagship Q1 in CH dialect ------------------------------------------

CH_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(toDecimal64(l_quantity, 6)) AS Float64) AS sum_qty,
       CAST(sum(toDecimal64(l_extendedprice, 6)) AS Float64) AS sum_base_price,
       CAST(sum(toDecimal64(l_extendedprice * (1 - l_discount), 6)) AS Float64) AS sum_disc_price,
       CAST(sum(toDecimal64(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6)) AS Float64) AS sum_charge,
       CAST(sum(toDecimal64(l_quantity, 6)) AS Float64) / count(l_quantity) AS avg_qty,
       CAST(sum(toDecimal64(l_extendedprice, 6)) AS Float64) / count(l_extendedprice) AS avg_price,
       CAST(sum(toDecimal64(l_discount, 6)) AS Float64) / count(l_discount) AS avg_disc,
       count() AS count_order
FROM lineitem
WHERE l_shipdate <= toDateTime('1998-09-02 00:00:00')
GROUP BY l_returnflag, l_linestatus
FORMAT TabSeparated
"""


@register(
    "chsql_q1",
    oracle=f"""
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
""",
    tags=("chsql", "flagship", "bench"),
)
def chsql_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 as CH-dialect TEXT: toDecimal64/Float64 casts, zero-arg
    count(), toDateTime, trailing FORMAT clause — same result as the
    DataFrame-API q1_pricing_summary."""
    return _run(spark, sf_dir, CH_Q1)


# --- 2. PREWHERE ------------------------------------------------------------


@register(
    "chsql_prewhere",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_shipdate > TIMESTAMP '1998-06-01' AND l_quantity > 45
""",
    tags=("chsql", "filter"),
)
def chsql_prewhere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREWHERE + WHERE merged into one conjunction; Spark's scan pushdown IS
    the two-stage PREWHERE read (plan-gated elsewhere)."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        PREWHERE l_shipdate > toDateTime('1998-06-01')
        WHERE l_quantity > 45
        """,
    )


# --- 3. -If combinators -----------------------------------------------------


@register(
    "chsql_combinators",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS deep_rev,
       COUNT(*) FILTER (WHERE l_tax = 0) AS zero_tax,
       MIN(l_quantity) FILTER (WHERE l_linestatus = 'F') AS min_f_qty,
       MAX(l_quantity) FILTER (WHERE l_linestatus = 'O') AS max_o_qty
FROM lineitem GROUP BY l_returnflag
""",
    tags=("chsql", "agg"),
)
def chsql_combinators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sumIf/countIf/minIf/maxIf → ANSI aggregate FILTER clauses (JVM-side;
    the -If combinator family, SURVEY §2.4)."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT l_returnflag,
               CAST(sumIf(toDecimal64(l_extendedprice, 6), l_discount > 0.05) AS Float64) AS deep_rev,
               countIf(l_tax == 0) AS zero_tax,
               minIf(l_quantity, l_linestatus = 'F') AS min_f_qty,
               maxIf(l_quantity, l_linestatus = 'O') AS max_o_qty
        FROM lineitem GROUP BY l_returnflag
        """,
    )


# --- 4. LIMIT BY ------------------------------------------------------------


@register(
    "chsql_limit_by",
    oracle="""
SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 2 ORDER BY o_totalprice DESC, o_orderkey LIMIT 8
""",
    tags=("chsql", "groupwise"),
)
def chsql_limit_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT n BY group → row_number window rewrite (same plan
    operators/groupwise.limit_by builds), with a trailing global LIMIT."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT o_orderpriority, o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2 BY o_orderpriority
        LIMIT 8
        """,
    )


# --- 5. parametric quantiles ------------------------------------------------


@register(
    "chsql_quantiles",
    oracle="""
SELECT l_linestatus,
       ROUND(quantile_cont(l_quantity, 0.5), 6) AS q50,
       ROUND(quantile_cont(l_quantity, 0.25), 6) AS q25,
       ROUND(quantile_cont(l_quantity, 0.75), 6) AS q75
FROM lineitem GROUP BY l_linestatus
""",
    tags=("chsql", "agg"),
)
def chsql_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH parametric aggregate syntax — quantile(p)(x), quantiles(..)(x) with
    an arrayMap lambda rounding the result array and 1-based arrayElement
    extraction (scalar output columns, so driver-side canonicalization never
    sees a list cell)."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT l_linestatus,
               round(quantile(0.5)(l_quantity), 6) AS q50,
               arrayElement(arrayMap(x -> round(x, 6),
                            quantiles(0.25, 0.75)(l_quantity)), 1) AS q25,
               arrayElement(arrayMap(x -> round(x, 6),
                            quantiles(0.25, 0.75)(l_quantity)), 2) AS q75
        FROM lineitem GROUP BY l_linestatus
        """,
    )


# --- 6. datetime vocabulary -------------------------------------------------


@register(
    "chsql_datetime",
    oracle="""
SELECT CAST(strftime(o_orderdate, '%Y%m') AS INT) AS ym,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(date_trunc('month', o_orderdate) AS DATE) + INTERVAL 14 DAY AS mid_month,
       COUNT(*) AS n
FROM orders
GROUP BY 1, 2, 3
""",
    tags=("chsql", "datetime"),
)
def chsql_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """toYYYYMM / toStartOfMonth / addDays — the CH datetime vocabulary over
    a monthly rollup."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT toYYYYMM(o_orderdate) AS ym,
               toStartOfMonth(o_orderdate) AS month_start,
               addDays(toStartOfMonth(o_orderdate), 14) AS mid_month,
               count() AS n
        FROM orders
        GROUP BY 1, 2, 3
        """,
    )


# --- 7. ASOF JOIN -----------------------------------------------------------


@register(
    "chsql_asof",
    oracle="""
SELECT c.event_id, c.user_id, c.ts,
       p.ts AS purchase_ts, p.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts >= p.ts
""",
    tags=("chsql", "asof", "join"),
)
def chsql_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF LEFT JOIN as CH TEXT → LATERAL ORDER-BY-LIMIT-1 rewrite (exactly
    DuckDB's native ASOF semantics; operators/asof.py stays the 1-shuffle
    scale path — the transpiler's job is accepting the dialect)."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT c.event_id, c.user_id, c.ts,
               p.ts AS purchase_ts, p.value AS purchase_value
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
    )


# --- 8. argMin/argMax -------------------------------------------------------


@register(
    "chsql_argminmax",
    oracle="""
SELECT c_nationkey,
       arg_max(c_name, c_acctbal) AS richest,
       arg_min(c_name, c_acctbal) AS poorest,
       MAX(c_acctbal) AS max_bal
FROM customer GROUP BY c_nationkey
""",
    tags=("chsql", "agg"),
)
def chsql_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argMax/argMin → max_by/min_by from CH text."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT c_nationkey,
               argMax(c_name, c_acctbal) AS richest,
               argMin(c_name, c_acctbal) AS poorest,
               max(c_acctbal) AS max_bal
        FROM customer GROUP BY c_nationkey
        """,
    )


# --- 9. uniqExact -----------------------------------------------------------


@register(
    "chsql_uniq",
    oracle="""
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS u_cust,
       COUNT(*) AS n
FROM orders GROUP BY o_orderpriority
""",
    tags=("chsql", "agg"),
)
def chsql_uniq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """uniqExact → COUNT(DISTINCT); zero-arg count() → count(*)."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT o_orderpriority,
               uniqExact(o_custkey) AS u_cust,
               count() AS n
        FROM orders GROUP BY o_orderpriority
        """,
    )


# --- 10. string vocabulary --------------------------------------------------


@register(
    "chsql_strings",
    oracle="""
SELECT c_custkey,
       lower(c_name) AS lname,
       position('er' IN c_name) AS pos_er,
       starts_with(c_mktsegment, 'BUI') AS is_building,
       regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked,
       concat_ws('|', c_mktsegment, c_name) AS tagged
FROM customer
WHERE length(c_name) > 0
""",
    tags=("chsql", "string"),
)
def chsql_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lowerUTF8/position/startsWith/replaceRegexpAll/concatWithSeparator/
    notEmpty — the CH string vocabulary (note CH position(haystack, needle)
    arg order is swapped into Spark's locate)."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT c_custkey,
               lowerUTF8(c_name) AS lname,
               position(c_name, 'er') AS pos_er,
               startsWith(c_mktsegment, 'BUI') AS is_building,
               replaceRegexpAll(c_name, '[0-9]+', '#') AS masked,
               concatWithSeparator('|', c_mktsegment, c_name) AS tagged
        FROM customer
        WHERE notEmpty(c_name)
        """,
    )


# --- 11. multiIf ------------------------------------------------------------


@register(
    "chsql_multiif",
    oracle="""
SELECT CASE WHEN l_quantity > 40 THEN 'big'
            WHEN l_quantity > 20 THEN 'mid'
            ELSE 'small' END AS band,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS rev
FROM lineitem GROUP BY 1
""",
    tags=("chsql", "conditional"),
)
def chsql_multiif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multiIf(c1, v1, c2, v2, else) → CASE chain."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT multiIf(l_quantity > 40, 'big', l_quantity > 20, 'mid', 'small') AS band,
               count() AS n,
               CAST(sum(toDecimal64(l_extendedprice, 6)) AS Float64) AS rev
        FROM lineitem GROUP BY 1
        """,
    )


# --- 12. array higher-order -------------------------------------------------


@register(
    "chsql_array_hof",
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
)
SELECT doc_id,
       len(list_distinct(words)) AS n_uniq,
       len(list_filter(words, x -> len(x) > 6)) AS n_long,
       array_to_string(list_sort(list_distinct(words))[1:3], ',') AS first3
FROM w
""",
    tags=("chsql", "array"),
)
def chsql_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """splitByChar / arrayUniq / arrayFilter / arraySort / arraySlice /
    arrayStringConcat — array higher-order lambdas in CH syntax (CH's
    `x -> e` lambda syntax is Spark's, argument order swapped by the rules);
    the slice is emitted as a ','-joined string so driver-side
    canonicalization never sees a list cell."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT doc_id,
               arrayUniq(splitByChar(' ', text)) AS n_uniq,
               arrayCount(x -> lengthUTF8(x) > 6, splitByChar(' ', text)) AS n_long,
               arrayStringConcat(
                 arraySlice(arraySort(arrayDistinct(splitByChar(' ', text))), 1, 3),
                 ',') AS first3
        FROM documents
        """,
    )


# --- 13. WITH TOTALS --------------------------------------------------------


@register(
    "chsql_totals",
    oracle="""
SELECT o_orderpriority, o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM orders
WHERE o_orderdate >= DATE '1996-01-01'
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), ())
""",
    tags=("chsql", "agg"),
)
def chsql_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... WITH TOTALS → GROUPING SETS ((keys), ()) — the totals
    row arrives with NULL keys (documented ANSI posture; CH would emit
    zero-value defaults)."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT o_orderpriority, o_orderstatus,
               count() AS n,
               CAST(sum(toDecimal64(o_totalprice, 6)) AS Float64) AS total
        FROM orders
        WHERE o_orderdate >= toDate('1996-01-01')
        GROUP BY o_orderpriority, o_orderstatus WITH TOTALS
        """,
    )


# --- 14. ARRAY JOIN ---------------------------------------------------------


@register(
    "chsql_array_join",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
SELECT word, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT doc_id, unnest(words) AS word FROM w)
WHERE length(word) >= 5
GROUP BY word ORDER BY n DESC, word LIMIT 20
""",
    tags=("chsql", "array"),
)
def chsql_array_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY JOIN clause (CH's explode): token frequency top-20 written as
    CH text — `ARRAY JOIN splitByChar(...) AS word` becomes a posexplode
    LATERAL VIEW."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT word, count() AS n
        FROM documents
        ARRAY JOIN splitByChar(' ', text) AS word
        WHERE lengthUTF8(word) >= 5
        GROUP BY word ORDER BY n DESC, word LIMIT 20
        """,
    )


@register(
    "chsql_array_join_parallel",
    oracle="""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents WHERE doc_id % 25 = 0
),
z AS (
  SELECT doc_id,
         unnest(words) AS word,
         unnest(list_transform(range(1, len(words) + 1), i -> i - 1)) AS pos
  FROM base)
SELECT doc_id, pos, word
FROM z WHERE pos < 3
ORDER BY doc_id, pos
""",
    tags=("chsql", "array"),
)
def chsql_array_join_parallel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parallel-array ARRAY JOIN: CH zips the listed arrays positionally;
    the rewrite drives off posexplode of the first and subscripts the
    companions by the shared position."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT doc_id, idx AS pos, word
        FROM documents
        ARRAY JOIN splitByChar(' ', text) AS word,
                   arrayMap(i -> i - 1, arrayEnumerate(splitByChar(' ', text))) AS idx
        WHERE doc_id % 25 = 0 AND idx < 3
        ORDER BY doc_id, idx
        """,
    )


# --- 16. SAMPLE + scalar WITH -----------------------------------------------


@register(
    "chsql_sample",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
FROM lineitem
WHERE (l_orderkey % 1000000) < 100000
GROUP BY l_returnflag
""",
    tags=("chsql", "sample"),
)
def chsql_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE f → deterministic filter on the table's declared sampling key
    (chsql.SAMPLE_KEYS ≈ the CH table DDL's SAMPLE BY clause)."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT l_returnflag,
               count() AS n,
               CAST(sum(toDecimal64(l_extendedprice, 6)) AS Float64) AS sum_price
        FROM lineitem SAMPLE 0.1
        GROUP BY l_returnflag
        """,
    )


@register(
    "chsql_scalar_with",
    oracle="""
WITH b AS (SELECT o_orderpriority AS p, o_totalprice AS tp FROM orders)
SELECT p,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(tp * (1 + 0.07) AS DECIMAL(38,6))) AS DOUBLE) AS taxed,
       CAST(COUNT(*) FILTER (WHERE tp > 150000.0) AS BIGINT) AS big
FROM b GROUP BY p
""",
    tags=("chsql", "scalar"),
)
def chsql_scalar_with(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH scalar WITH aliases (``WITH expr AS name``) inlined, mixed with a
    standard CTE in the same WITH list."""
    return _run(
        spark,
        sf_dir,
        """
        WITH 0.07 AS taxrate,
             150000.0 AS big_cutoff,
             b AS (SELECT o_orderpriority AS p, o_totalprice AS tp FROM orders)
        SELECT p,
               count() AS n,
               CAST(sum(toDecimal64(tp * (1 + taxrate), 6)) AS Float64) AS taxed,
               countIf(tp > big_cutoff) AS big
        FROM b GROUP BY p
        """,
    )


# --- 18. dictGet / numbers / bitmap vocabulary ------------------------------


@register(
    "chsql_dictget",
    oracle="""
SELECT c_custkey,
       (SELECT n_name FROM nation WHERE n_nationkey = c_nationkey) AS nation_name,
       COALESCE((SELECT r_name FROM region
                 WHERE r_regionkey = c_nationkey - 20), 'none') AS maybe_region,
       (SELECT COUNT(1) FROM nation WHERE n_nationkey = c_nationkey) > 0 AS known
FROM customer
WHERE c_custkey <= 200
""",
    tags=("chsql", "dictionary"),
)
def chsql_dictget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dictGet / dictGetOrDefault / dictHas over the catalog's declared
    dictionaries (chsql.CH_DICTS) — correlated scalar subqueries that
    Catalyst rewrites into (broadcastable) left joins."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT c_custkey,
               dictGet('nation_dict', 'n_name', c_nationkey) AS nation_name,
               dictGetOrDefault('region_dict', 'r_name', c_nationkey - 20, 'none') AS maybe_region,
               dictHas('nation_dict', c_nationkey) AS known
        FROM customer
        WHERE c_custkey <= 200
        """,
    )


@register(
    "chsql_numbers",
    oracle="""
SELECT CAST(SUM(i) AS BIGINT) AS s,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN i % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS sevens
FROM generate_series(0, 9999) t(i)
""",
    tags=("chsql", "table_function"),
)
def chsql_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """numbers(N) table function in CH text → range() subquery with the
    CH column name `number`."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT sum(number) AS s,
               count() AS n,
               countIf(number % 7 = 0) AS sevens
        FROM numbers(10000)
        """,
    )


@register(
    "chsql_bitmap",
    oracle="""
WITH s AS (SELECT DISTINCT o_orderpriority AS p, o_custkey % 100 AS b FROM orders),
a AS (SELECT list_sort(list(b)) AS bm FROM s WHERE p = '1-URGENT'),
c AS (SELECT list_sort(list(b)) AS bm FROM s WHERE p = '5-LOW')
SELECT CAST(len(a.bm) AS INTEGER) AS card_a,
       CAST(len(list_intersect(a.bm, c.bm)) AS INTEGER) AS card_and,
       CAST(len(list_distinct(list_concat(a.bm, c.bm))) AS INTEGER) AS card_or,
       CAST(len(list_filter(a.bm, x -> NOT list_contains(c.bm, x))) AS INTEGER) AS card_andnot,
       len(list_intersect(a.bm, c.bm)) > 0 AS any_common,
       list_contains(a.bm, 7) AS has_7
FROM a, c
""",
    tags=("chsql", "bitmap"),
)
def chsql_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bitmap* function vocabulary in CH text over the array-state
    representation (groupBitmapState → sorted distinct array; set algebra
    via Catalyst array functions)."""
    return _run(
        spark,
        sf_dir,
        """
        WITH a AS (SELECT groupBitmapState(o_custkey % 100) AS bm
                   FROM orders WHERE o_orderpriority = '1-URGENT'),
             c AS (SELECT groupBitmapState(o_custkey % 100) AS bm
                   FROM orders WHERE o_orderpriority = '5-LOW')
        SELECT bitmapCardinality(a.bm) AS card_a,
               bitmapCardinality(bitmapAnd(a.bm, c.bm)) AS card_and,
               bitmapCardinality(bitmapOr(a.bm, c.bm)) AS card_or,
               bitmapCardinality(bitmapAndnot(a.bm, c.bm)) AS card_andnot,
               bitmapHasAny(a.bm, c.bm) AS any_common,
               bitmapContains(a.bm, 7) AS has_7
        FROM a CROSS JOIN c
        """,
    )


# --- 23. ORDER BY ... WITH FILL (engine path: needs the result schema) ------

CH_WITH_FILL = """
SELECT toStartOfDay(ts) AS day, count() AS n,
       CAST(sum(toDecimal64(value, 6)) AS Float64) AS s
FROM events
WHERE event_type = 'purchase' AND value > 180
GROUP BY day
ORDER BY day WITH FILL STEP INTERVAL 1 DAY
"""


@register(
    "chsql_with_fill",
    oracle="""
WITH d AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s
  FROM events WHERE event_type = 'purchase' AND value > 180 GROUP BY 1
), b AS (SELECT min(day) AS mn, max(day) AS mx FROM d),
axis AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day FROM b)
SELECT axis.day, COALESCE(d.n, 0) AS n, COALESCE(d.s, 0.0) AS s
FROM axis LEFT JOIN d ON axis.day = d.day
""",
    tags=("chsql", "fill"),
)
def chsql_with_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY day WITH FILL STEP INTERVAL 1 DAY in CH TEXT: the transpiler
    extracts the fill spec and ``ChSparkEngine.sql`` applies
    operators/fill.with_fill on the core result (CH zero-fills generated rows
    with column type defaults — derived from the result schema here)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(CH_WITH_FILL, dialect="clickhouse")


# --- 24. LIMIT n WITH TIES --------------------------------------------------


@register(
    "chsql_limit_ties",
    oracle="""
SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         rank() OVER (ORDER BY o_totalprice DESC) AS __rk
  FROM orders
) WHERE __rk <= 20
""",
    tags=("chsql", "sort"),
)
def chsql_limit_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT 20 WITH TIES in CH TEXT → rank() window subquery (boundary ties
    all kept, SURVEY §2.6); per-row double compares are bitwise-identical
    across engines, so the boundary is deterministic."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT o_orderpriority, o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC
        LIMIT 20 WITH TIES
        """,
    )


# --- 25. window functions in CH text (OVER + lagInFrame vocabulary) ---------


@register(
    "chsql_window",
    oracle="""
SELECT o_custkey, o_orderkey,
       row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
       lag(o_totalprice, 1, 0.0) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
FROM orders WHERE o_custkey % 100 = 0
""",
    tags=("chsql", "window"),
)
def chsql_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions through the CH text surface: the named WINDOW clause
    is inlined into each OVER reference (Spark SQL has no WINDOW clause), and
    the CH-only ``lagInFrame`` vocabulary maps to ``lag`` (SURVEY §2.5).
    (o_orderdate, o_orderkey) is a unique sort key per partition, so every
    rank/lag value is deterministic."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT o_custkey, o_orderkey,
               row_number() OVER w AS rn,
               lagInFrame(o_totalprice, 1, 0.0) OVER w AS prev_price
        FROM orders
        WHERE o_custkey % 100 = 0
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """,
    )


# --- 26. set operations in CH text (pass-through surface) -------------------


@register(
    "chsql_setops",
    oracle="""
SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
INTERSECT
SELECT s_nationkey AS k FROM supplier
UNION
SELECT n_nationkey AS k FROM nation WHERE n_regionkey = 0
EXCEPT
SELECT 99 AS k
""",
    tags=("chsql", "setops"),
)
def chsql_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION/INTERSECT/EXCEPT in CH TEXT (SURVEY §2.7): identical syntax in
    Spark SQL, so the transpiler's job is only the function-name/type layer;
    the pass-through is proven by the oracle hash match."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
        INTERSECT
        SELECT s_nationkey AS k FROM supplier
        UNION
        SELECT n_nationkey AS k FROM nation WHERE n_regionkey = 0
        EXCEPT
        SELECT 99 AS k
        """,
    )


# --- 27. GROUP BY WITH ROLLUP + grouping() in CH text -----------------------


@register(
    "chsql_rollup",
    oracle="""
SELECT COALESCE(o_orderpriority, 'ALL') AS prio,
       COALESCE(o_orderstatus, 'ALL') AS status,
       COUNT(*) AS n
FROM orders
GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
""",
    tags=("chsql", "rollup"),
)
def chsql_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... WITH ROLLUP in CH TEXT — identical Spark syntax
    (SURVEY §2.4); subtotal rows surface as NULL keys, coalesced to 'ALL' so
    the oracle compares label-stable values."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT ifNull(o_orderpriority, 'ALL') AS prio,
               ifNull(o_orderstatus, 'ALL') AS status,
               count() AS n
        FROM orders
        GROUP BY o_orderpriority, o_orderstatus WITH ROLLUP
        """,
    )


# --- 28. datetime porting vocabulary: formatDateTime / toStartOfInterval ----


@register(
    "chsql_datetime_fmt",
    oracle="""
SELECT event_id,
       strftime(ts, '%Y-%m-%d %H:%M') AS fmt,
       CAST(floor(floor(epoch(ts)) / 900) * 900 AS BIGINT) AS bucket15,
       CAST(date_trunc('week', ts) AS DATE) AS monday,
       CAST(CAST(date_trunc('week', ts + INTERVAL 1 DAY) AS DATE) - INTERVAL 1 DAY AS DATE) AS sunday_week,
       CAST(floor(epoch(TIMESTAMP '2024-03-05 10:20:30')) AS BIGINT) AS parsed_sec
FROM events WHERE event_id % 17 = 0
""",
    tags=("chsql", "datetime"),
)
def chsql_datetime_fmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The datetime-porting vocabulary a CH user needs most when moving SQL
    text: formatDateTime (%-codes -> DateTimeFormatter with quoted literal
    runs), toStartOfInterval (epoch floor for sub-day units), toMonday /
    toStartOfWeek (mode 0 = Sunday start), parseDateTimeBestEffort
    (try_to_timestamp cascade) — all value-checked against the oracle."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT event_id,
               formatDateTime(ts, '%Y-%m-%d %H:%i') AS fmt,
               toUnixTimestamp(toStartOfInterval(CAST(ts AS DateTime), INTERVAL 15 MINUTE)) AS bucket15,
               toMonday(ts) AS monday,
               toStartOfWeek(ts) AS sunday_week,
               toUnixTimestamp(parseDateTimeBestEffort('2024-03-05 10:20:30')) AS parsed_sec
        FROM events WHERE event_id % 17 = 0
        """,
    )


# --- 29. CTE + nested clause rewrites ---------------------------------------


@register(
    "chsql_cte_nested",
    oracle="""
WITH flagged AS (
  SELECT l_orderkey, l_returnflag, l_extendedprice
  FROM lineitem WHERE l_quantity > 30 AND l_discount > 0.03
), ranked AS (
  SELECT l_returnflag, l_orderkey, l_extendedprice FROM (
    SELECT l_returnflag, l_orderkey, l_extendedprice,
           row_number() OVER (PARTITION BY l_returnflag
                              ORDER BY CAST(l_extendedprice AS DECIMAL(18,2)) DESC,
                                       l_orderkey) AS rn
    FROM flagged
  ) WHERE rn <= 5
)
SELECT l_returnflag, COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS top_sum
FROM ranked GROUP BY l_returnflag
""",
    tags=("chsql", "cte"),
)
def chsql_cte_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTEs with CH-only clauses INSIDE them: PREWHERE and LIMIT BY are
    rewritten at any nesting depth (the clause pipeline recurses bottom-up
    through parenthesized SELECT scopes), so real ported query texts work
    without manual flattening."""
    return _run(
        spark,
        sf_dir,
        """
        WITH flagged AS (
          SELECT l_orderkey, l_returnflag, l_extendedprice
          FROM lineitem PREWHERE l_quantity > 30 WHERE l_discount > 0.03
        ), ranked AS (
          SELECT l_returnflag, l_orderkey, l_extendedprice
          FROM flagged
          ORDER BY toDecimal64(l_extendedprice, 2) DESC, l_orderkey
          LIMIT 5 BY l_returnflag
        )
        SELECT l_returnflag, count() AS n,
               CAST(sum(toDecimal64(l_extendedprice, 6)) AS Float64) AS top_sum
        FROM ranked GROUP BY l_returnflag
        """,
    )


# --- 30. arrayReduce / set-membership vocabulary ----------------------------


@register(
    "chsql_array_reduce",
    oracle="""
WITH t AS (
  SELECT o_orderpriority,
         list(CAST(o_totalprice AS DOUBLE) ORDER BY o_totalprice) AS prices,
         list(o_custkey % 10 ORDER BY o_custkey % 10) AS buckets
  FROM orders WHERE o_custkey % 500 = 0 GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       ROUND(list_aggregate(prices, 'sum'), 6) AS total,
       list_aggregate(prices, 'max') AS hi,
       CAST(len(prices) AS BIGINT) AS n,
       CAST(len(list_distinct(buckets)) AS BIGINT) AS uniq_buckets,
       list_has_any(buckets, [0, 1]) AS has_low,
       list_has_all(buckets, [0]) AS has_zero
FROM t
""",
    tags=("chsql", "arrays"),
)
def chsql_array_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arrayReduce + hasAny/hasAll in CH TEXT: aggregate-over-array folds map
    to Catalyst array functions (exact folds, so value-checkable); membership
    vocabulary maps to arrays_overlap / array_except emptiness."""
    return _run(
        spark,
        sf_dir,
        """
        WITH t AS (
          SELECT o_orderpriority,
                 groupArraySorted(1000000)(CAST(o_totalprice AS Float64)) AS prices,
                 groupArraySorted(1000000)(o_custkey % 10) AS buckets
          FROM orders WHERE o_custkey % 500 = 0 GROUP BY o_orderpriority
        )
        SELECT o_orderpriority,
               round(arrayReduce('sum', prices), 6) AS total,
               arrayReduce('max', prices) AS hi,
               arrayReduce('count', prices) AS n,
               arrayReduce('uniqExact', buckets) AS uniq_buckets,
               hasAny(buckets, [0, 1]) AS has_low,
               hasAll(buckets, [0]) AS has_zero
        FROM t
        """,
    )


# --- 31. JSON vocabulary in CH text -----------------------------------------


@register(
    "chsql_json",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       json_extract_string(props, '$.k') IS NOT NULL AS has_k,
       json_extract_string(props, '$.missing') AS absent,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
FROM events WHERE event_id % 19 = 0
""",
    tags=("chsql", "json"),
)
def chsql_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONExtract*/JSONHas vocabulary in CH TEXT → get_json_object paths
    (SURVEY §2.8 JSON family through the text surface)."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT event_id,
               JSONExtractInt(props, 'k') AS k,
               JSONHas(props, 'k') AS has_k,
               JSONExtractString(props, 'missing') AS absent,
               modulo(JSONExtractInt(props, 'k'), 10) AS k_mod
        FROM events WHERE event_id % 19 = 0
        """,
    )


# --- array transform vocabulary (difference / cumsum / compact) -------------


@register(
    "chsql_array_transforms",
    oracle="""
WITH g AS (
  SELECT l_orderkey, list_sort(list(l_linenumber)) AS ln,
         list_sort(list(DISTINCT l_returnflag)) AS flags
  FROM lineitem WHERE l_orderkey % 500 = 0 GROUP BY l_orderkey
)
SELECT l_orderkey,
       array_to_string(list_transform(range(1, len(ln) + 1),
         i -> CAST(CASE WHEN i = 1 THEN 0 ELSE ln[i] - ln[i - 1] END AS VARCHAR)), ',') AS diffs,
       array_to_string(list_transform(range(1, len(ln) + 1),
         i -> CAST(list_sum(ln[1:i]) AS VARCHAR)), ',') AS cums,
       array_to_string(flags, ',') AS flags
FROM g
""",
    tags=("chsql", "array"),
)
def chsql_array_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arrayDifference / arrayCumSum / arrayCompact — CH's array-transform
    vocabulary over per-order sorted linenumber arrays (arrayCompact over a
    sorted array ≡ sorted distinct, which the oracle replays).  All results
    ','-joined so no list cell reaches the driver comparator."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT l_orderkey,
               arrayStringConcat(arrayMap(x -> toString(x),
                 arrayDifference(arraySort(groupArray(l_linenumber)))), ',') AS diffs,
               arrayStringConcat(arrayMap(x -> toString(x),
                 arrayCumSum(arraySort(groupArray(l_linenumber)))), ',') AS cums,
               arrayStringConcat(arrayCompact(arraySort(groupUniqArray(l_returnflag))), ',') AS flags
        FROM lineitem WHERE l_orderkey % 500 = 0 GROUP BY l_orderkey
        """,
    )


# --- TPC-H classics as CH TEXT (round 3: the reference's own benchmark -------
# queries pasted as ClickHouse SQL, proving the text surface runs the suite
# the DataFrame API implements in queries/tpch.py) -----------------------


@register(
    "chsql_tpch_q4",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("chsql", "tpch", "semi"),
)
def chsql_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 as CH text: correlated EXISTS passes through the transpiler
    into Catalyst's rewrite-to-semi-join; toDateTime + zero-arg count() are
    dialect translations.  Same adapted 'late' semantics as
    queries/tpch.q4_order_priority (no commit/receipt dates in fixtures)."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT o_orderpriority, count() AS order_count
        FROM orders
        WHERE o_orderdate >= toDateTime('1996-01-01 00:00:00')
          AND o_orderdate < toDateTime('1996-04-01 00:00:00')
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 30 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
    )


@register(
    "chsql_tpch_q12",
    oracle="""
SELECT ship_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM (
  SELECT o_orderpriority,
         CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
              THEN 'FAST' ELSE 'SLOW' END AS ship_class
  FROM orders, lineitem
  WHERE o_orderkey = l_orderkey
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
)
GROUP BY ship_class
ORDER BY ship_class
""",
    tags=("chsql", "tpch", "agg"),
)
def chsql_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (delay-bucket adaptation) as CH text: dateDiff('day',...),
    if(), and sumIf-style conditional counts through the -If combinator."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT if(dateDiff('day', o_orderdate, l_shipdate) <= 30, 'FAST', 'SLOW') AS ship_class,
               sumIf(1, o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
               sumIf(1, o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
        FROM orders, lineitem
        WHERE o_orderkey = l_orderkey
          AND l_shipdate >= toDateTime('1996-01-01 00:00:00')
          AND l_shipdate < toDateTime('1997-01-01 00:00:00')
        GROUP BY ship_class
        ORDER BY ship_class
        """,
    )


@register(
    "chsql_tpch_q14",
    oracle="""
SELECT 100.00
       * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                        THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                  AS DECIMAL(38,6))) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
       AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
""",
    tags=("chsql", "tpch", "agg"),
)
def chsql_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 as CH text: the promo-share ratio via toDecimal64-routed
    sums (exact, order-independent) and an if() inside the numerator sum."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT 100.00
               * CAST(sum(toDecimal64(if(p_type = 'PROMO',
                       l_extendedprice * (1 - l_discount), 0), 6)) AS Float64)
               / CAST(sum(toDecimal64(l_extendedprice * (1 - l_discount), 6)) AS Float64)
               AS promo_revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= toDateTime('1996-09-01 00:00:00')
          AND l_shipdate < toDateTime('1996-10-01 00:00:00')
        """,
    )


@register(
    "chsql_tpch_q18",
    oracle="""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) > 300
  )
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
""",
    tags=("chsql", "tpch", "semi"),
)
def chsql_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 as CH text: HAVING-IN subquery (Catalyst lowers to a semi
    join), toDecimal64 exact quantity sums, multi-key ORDER BY + LIMIT."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(sum(toDecimal64(l_quantity, 6)) AS Float64) AS sum_qty
        FROM customer, orders, lineitem
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING CAST(sum(toDecimal64(l_quantity, 6)) AS Float64) > 300
          )
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        LIMIT 100
        """,
    )


# --- round 3: presentation/date vocabulary through the text path -----------

CH_VOCAB_R3 = """
SELECT monthName(o_orderdate) AS month_name,
       toStartOfWeek(o_orderdate) AS week_start,
       toLastDayOfMonth(o_orderdate) AS month_end,
       countSubstrings(o_orderpriority, '-') AS n_dashes,
       count() AS n
FROM orders
GROUP BY month_name, week_start, month_end, n_dashes
"""


@register(
    "chsql_vocab_r3",
    oracle="""
SELECT monthname(o_orderdate) AS month_name,
       CAST(date_trunc('week', CAST(o_orderdate AS DATE) + 1) AS DATE) - 1 AS week_start,
       last_day(o_orderdate) AS month_end,
       CAST((length(o_orderpriority) - length(replace(o_orderpriority, '-', '')))
            AS BIGINT) AS n_dashes,
       COUNT(*) AS n
FROM orders
GROUP BY 1, 2, 3, 4
""",
    tags=("chsql", "scalar"),
)
def chsql_vocab_r3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-3 vocabulary additions (monthName / toStartOfWeek /
    toLastDayOfMonth / countSubstrings) exercised through the CH TEXT path."""
    df = _run(spark, sf_dir, CH_VOCAB_R3)
    from pyspark.sql import functions as F

    return df.withColumn("month_end", F.col("month_end").cast("date"))


# --- round 3: the hard TPC-H quantifier queries through the TEXT path ------


def _tpch_oracle(name: str) -> str:
    from clickhouseocp_spark.queries import tpch

    return getattr(tpch, name)


@register(
    "chsql_tpch_q21",
    oracle=_tpch_oracle("_Q21_ORACLE"),
    tags=("chsql", "tpch", "window"),
)
def chsql_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 as CH text (same adapted 'late >45 days' semantics as
    queries/tpch.q21_waiting_orders): the EXISTS / NOT EXISTS supplier
    quantifiers are expressed as per-order window counts; the text path
    exercises CH if() + count() + window functions through the transpiler
    in one statement."""
    return _run(
        spark,
        sf_dir,
        """
        WITH lat AS (
          SELECT l_orderkey AS ok, l_suppkey AS sk,
                 max(if(l_shipdate > o_orderdate + INTERVAL 45 DAY, 1, 0)) AS is_late
          FROM lineitem JOIN orders ON o_orderkey = l_orderkey
          WHERE o_orderstatus = 'F'
          GROUP BY l_orderkey, l_suppkey
        ),
        marked AS (
          SELECT ok, sk, is_late,
                 count() OVER (PARTITION BY ok) AS n_supp,
                 sum(is_late) OVER (PARTITION BY ok) AS n_late
          FROM lat
        )
        SELECT s_name, count() AS numwait
        FROM marked JOIN supplier ON s_suppkey = sk
        WHERE is_late = 1 AND n_supp > 1 AND n_late = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
        """,
    )


@register(
    "chsql_tpch_q22",
    oracle=_tpch_oracle("_Q22_ORACLE"),
    tags=("chsql", "tpch", "anti"),
)
def chsql_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 as CH text (same adapted semantics as
    queries/tpch.q22_sales_opportunity): scalar above-average subquery +
    NOT EXISTS anti quantifier + toDecimal64-routed float determinism, all
    through the transpiler."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT cntrycode, count() AS numcust,
               CAST(sum(toDecimal64(c_acctbal, 6)) AS Float64) AS totacctbal
        FROM (
          SELECT c_nationkey % 10 AS cntrycode, c_acctbal, c_custkey
          FROM customer
          WHERE (c_nationkey % 10) IN (1, 3, 5, 7, 9)
            AND c_acctbal > (
              SELECT CAST(sum(toDecimal64(c_acctbal, 6)) AS Float64) / count()
              FROM customer
              WHERE c_acctbal > 0.0 AND (c_nationkey % 10) IN (1, 3, 5, 7, 9)
            )
        ) AS hot
        WHERE NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= toDateTime('1999-01-01 00:00:00')
        )
        GROUP BY cntrycode
        ORDER BY cntrycode
        """,
    )


# --- round 3: PRQL pipeline dialect (reference ships the PRQL parser, A16) --


@register(
    "prql_pipeline",
    oracle="""
SELECT o_orderpriority, n, max_price FROM (
  SELECT o_orderpriority, COUNT(*) AS n, MAX(o_totalprice) AS max_price
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  GROUP BY o_orderpriority
) WHERE n > 10
ORDER BY n DESC, o_orderpriority
LIMIT 5
""",
    tags=("prql",),
)
def prql_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A PRQL pipeline through ``dialect='prql'`` (the reference's Rust
    build compiles the upstream PRQL parser in, Dockerfile:90-94): filter →
    group/aggregate → post-aggregation filter → sort → take, with PRQL
    sugar (@date literal, ==, `count this`, aggregation juxtaposition)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
from orders
filter o_orderdate >= @1996-01-01T00:00:00
group {o_orderpriority} (aggregate {n = count this, max_price = max o_totalprice})
filter n > 10
sort {-n, o_orderpriority}
take 5
""",
        dialect="prql",
    )


@register(
    "chsql_array_vocab2",
    oracle="""
WITH t AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), s -> CAST(length(s) AS BIGINT)) AS arr
  FROM documents WHERE length(text) > 0 AND doc_id < 50
)
SELECT doc_id,
       CAST(list_aggregate(arr, 'sum') AS BIGINT) AS fold_sum,
       list_aggregate(arr, 'min') AS mn,
       list_aggregate(arr, 'max') AS mx,
       ROUND(CAST(list_aggregate(arr, 'sum') AS DOUBLE) / len(arr), 6) AS avg_len,
       list_filter(arr, x -> x > 5)[1] AS first_gt5,
       COALESCE(list_position(list_transform(arr, x -> x > 5), true), 0) AS first_gt5_idx,
       ROUND(list_aggregate(list_transform(arr[1:3], x -> CAST(x AS DOUBLE)), 'product'), 6) AS prod3,
       ROUND(list_dot_product(list_transform(arr, x -> CAST(x AS DOUBLE)),
                              list_transform(arr, x -> CAST(x + 1 AS DOUBLE))), 6) AS dot_next,
       ROUND(sqrt(list_aggregate(list_transform(arr, x -> CAST(x * x AS DOUBLE)), 'sum')), 6) AS l2
FROM t
""",
    tags=("chsql", "array"),
)
def chsql_array_vocab2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-3 array vocabulary through the TEXT path: arrayFold, arrayMin /
    arrayMax / arrayAvg, arrayFirst / arrayFirstIndex (CH 0-on-miss
    semantics), arrayProduct, arrayDotProduct, L2Norm — each lowered to a
    built-in higher-order Spark expression (no UDFs)."""
    return _run(
        spark,
        sf_dir,
        """
        WITH t AS (
          SELECT doc_id,
                 arrayMap(s -> toInt64(length(s)), splitByChar(' ', text)) AS arr
          FROM documents WHERE length(text) > 0 AND doc_id < 50
        )
        SELECT doc_id,
               arrayFold((acc, x) -> acc + x, arr, toInt64(0)) AS fold_sum,
               arrayMin(arr) AS mn,
               arrayMax(arr) AS mx,
               round(arrayAvg(arr), 6) AS avg_len,
               arrayFirst(x -> x > 5, arr) AS first_gt5,
               arrayFirstIndex(x -> x > 5, arr) AS first_gt5_idx,
               round(arrayProduct(arraySlice(arr, 1, 3)), 6) AS prod3,
               round(arrayDotProduct(arr, arrayMap(x -> x + 1, arr)), 6) AS dot_next,
               round(L2Norm(arr), 6) AS l2
        FROM t
        """,
    )


@register(
    "chsql_sum_foreach",
    oracle="""
WITH t AS (
  SELECT lang,
         list_transform(string_split(text, ' '),
                        s -> CAST(length(s) AS BIGINT))[1:3] AS a3
  FROM documents WHERE length(text) > 0
)
SELECT lang, array_to_string(list(s ORDER BY pos), ',') AS elementwise_sums
FROM (
  SELECT lang, pos, CAST(CAST(SUM(v) AS BIGINT) AS VARCHAR) AS s
  FROM (
    SELECT lang, unnest(a3) AS v, generate_subscripts(a3, 1) AS pos FROM t
  ) GROUP BY lang, pos
) GROUP BY lang
""",
    tags=("chsql", "agg", "array"),
)
def chsql_sum_foreach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The -ForEach combinator (sumForEach: element-wise sums across rows of
    arrays) through the TEXT path — lowered to collect_list + a zip_with
    fold, ragged rows padded with zero (CH semantics).  Output stringified
    (driver canonicalizer contract: no array-typed top-level columns)."""
    return _run(
        spark,
        sf_dir,
        """
        WITH t AS (
          SELECT lang,
                 arraySlice(arrayMap(s -> toInt64(length(s)),
                            splitByChar(' ', text)), 1, 3) AS a3
          FROM documents WHERE length(text) > 0
        )
        SELECT lang,
               arrayStringConcat(arrayMap(x -> toString(toInt64(x)),
                                 sumForEach(a3)), ',') AS elementwise_sums
        FROM t GROUP BY lang
        """,
    )


@register(
    "chsql_tpch_q17",
    oracle=_tpch_oracle("_Q17_ORACLE"),
    tags=("chsql", "tpch", "subquery"),
)
def chsql_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 as CH text (same adapted semantics as
    queries/tpch.q17_small_quantity): a correlated scalar AVG subquery —
    Catalyst decorrelates it into the grouped-agg + join plan the DataFrame
    version builds by hand; decimal-routed threshold for engine-independent
    comparison."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT CAST(sum(toDecimal64(l_extendedprice, 6)) AS Float64) / 7.0
               AS avg_yearly
        FROM lineitem, part
        WHERE p_partkey = l_partkey AND p_brand = 'Brand#3' AND p_type = 'MEDIUM'
          AND l_quantity < (
            SELECT 0.2 * (CAST(sum(toDecimal64(l_quantity, 6)) AS Float64) / count())
            FROM lineitem WHERE l_partkey = p_partkey
          )
        """,
    )


@register(
    "chsql_tpch_q15",
    oracle=_tpch_oracle("_Q15_ORACLE"),
    tags=("chsql", "tpch", "subquery"),
)
def chsql_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 as CH text (same adapted semantics as
    queries/tpch.q15_top_supplier): the spec's CREATE VIEW as a CTE, a MAX
    scalar subquery over it, exact-decimal revenue equality."""
    return _run(
        spark,
        sf_dir,
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 CAST(sum(toDecimal64(l_extendedprice * (1 - l_discount), 6))
                      AS Float64) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= toDateTime('1996-01-01 00:00:00')
            AND l_shipdate < toDateTime('1996-04-01 00:00:00')
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier, revenue
        WHERE s_suppkey = supplier_no
          AND total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey
        """,
    )


@register(
    "chsql_topk_text",
    oracle="""
WITH f AS (
  SELECT l_returnflag, l_quantity, l_linenumber FROM lineitem
),
freq AS (
  SELECT l_returnflag, l_linenumber AS v, COUNT(*) AS n, SUM(CAST(l_quantity AS BIGINT)) AS wsum
  FROM f GROUP BY l_returnflag, l_linenumber
),
rk AS (
  SELECT l_returnflag, v,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY n DESC, v) AS r_cnt,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY wsum DESC, v) AS r_w
  FROM freq
)
SELECT a.l_returnflag,
       a.top2 AS top2_frequent,
       b.top2w AS top2_weighted,
       c.nd AS distinct_high_qty,
       ROUND(c.gk, 1) AS gk_med
FROM (SELECT l_returnflag, array_to_string(list(CAST(v AS VARCHAR) ORDER BY r_cnt), ',') AS top2
      FROM rk WHERE r_cnt <= 2 GROUP BY l_returnflag) a
JOIN (SELECT l_returnflag, array_to_string(list(CAST(v AS VARCHAR) ORDER BY r_w), ',') AS top2w
      FROM rk WHERE r_w <= 2 GROUP BY l_returnflag) b USING (l_returnflag)
JOIN (SELECT l_returnflag,
             COUNT(DISTINCT l_linenumber) FILTER (WHERE l_quantity > 40) AS nd,
             ROUND(quantile_disc(l_linenumber, 0.5), 1) AS gk
      FROM f GROUP BY l_returnflag) c USING (l_returnflag)
""",
    tags=("chsql", "agg"),
)
def chsql_topk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """topK(n) / topKWeighted(n) / countDistinctIf / quantileGK through the
    TEXT path.  topK lowers to an exact collect_list fold (correctness tier;
    scale tier = operators/groupwise.top_k) — ties broken by value, matching
    the oracle's (count DESC, value) ranking.  quantileGK maps to Spark's
    approx_percentile (itself the Greenwald-Khanna sketch) with accuracy
    10000 — exact on the fixture's integer domain, ROUND(…,1)-pinned.
    Arrays stringified (driver canonicalizer contract)."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT l_returnflag,
               arrayStringConcat(arrayMap(x -> toString(x), topK(2)(l_linenumber)), ',')
                 AS top2_frequent,
               arrayStringConcat(arrayMap(x -> toString(x),
                 topKWeighted(2)(l_linenumber, toInt64(l_quantity))), ',')
                 AS top2_weighted,
               countDistinctIf(l_linenumber, l_quantity > 40) AS distinct_high_qty,
               round(toFloat64(quantileGK(10000, 0.5)(l_linenumber)), 1) AS gk_med
        FROM lineitem GROUP BY l_returnflag
        """,
    )


@register(
    "chsql_distinct_on",
    oracle="""
SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn = 1 ORDER BY o_orderpriority
""",
    tags=("chsql", "groupwise"),
)
def chsql_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT DISTINCT ON (g)`` — the CH alias for LIMIT 1 BY g — lowered
    through the same row_number rewrite; highest-priced order per
    priority."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT DISTINCT ON (o_orderpriority)
               o_orderpriority, o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        """,
    ).orderBy("o_orderpriority")


@register(
    "chsql_tpch_q8",
    oracle=_tpch_oracle("_Q8_ORACLE"),
    tags=("chsql", "tpch", "agg"),
)
def chsql_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 as CH text (same adapted semantics as
    queries/tpch.q8_market_share): 8-table comma join, self-joined nation
    aliases, toYear + if() through the transpiler, exact-decimal market
    share ratio."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT o_year,
               CAST(sum(toDecimal64(if(supp_nation = 'NATION_3', volume, 0), 6))
                    AS Float64)
               / CAST(sum(toDecimal64(volume, 6)) AS Float64) AS mkt_share
        FROM (
          SELECT toYear(o_orderdate) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS supp_nation
          FROM part, supplier, lineitem, orders, customer,
               nation AS n1, nation AS n2, region
          WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
            AND l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
            AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
            AND o_orderdate >= toDateTime('1996-01-01 00:00:00')
            AND o_orderdate < toDateTime('1998-01-01 00:00:00')
            AND p_type = 'ECONOMY'
        ) AS all_nations
        GROUP BY o_year
        ORDER BY o_year
        """,
    )


@register(
    "chsql_tpch_q13",
    oracle=_tpch_oracle("_Q13_ORACLE"),
    tags=("chsql", "tpch", "join"),
)
def chsql_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 as CH text: LEFT JOIN with a join-residual inequality,
    count(col) null-skipping semantics, double aggregation."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT c_count, count() AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority != '4-NOT SPECIFIED'
          GROUP BY c_custkey
        ) AS per_cust
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
        """,
    )


@register(
    "chsql_tpch_q19",
    oracle=_tpch_oracle("_Q19_ORACLE"),
    tags=("chsql", "tpch", "filter"),
)
def chsql_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 as CH text: the disjunction-of-conjunctions join residual
    (Catalyst extracts the common quantity bounds as a pushable scan
    filter — same plan as the DataFrame version, gated there)."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT CAST(sum(toDecimal64(l_extendedprice * (1 - l_discount), 6))
                    AS Float64) AS revenue,
               count() AS n_lines
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                AND l_quantity >= 1 AND l_quantity <= 11)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                AND l_quantity >= 10 AND l_quantity <= 20)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
                AND l_quantity >= 20 AND l_quantity <= 30))
        """,
    )


@register(
    "chsql_tpch_q20",
    oracle=_tpch_oracle("_Q20_ORACLE"),
    tags=("chsql", "tpch", "semi"),
)
def chsql_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 as CH text (same adapted semantics as
    queries/tpch.q20_dominant_suppliers): nested IN subqueries + CTE chain,
    exact-decimal share threshold."""
    return _run(
        spark,
        sf_dir,
        """
        WITH ship AS (
          SELECT l_partkey, l_suppkey,
                 CAST(sum(toDecimal64(l_quantity, 6)) AS Float64) AS supp_qty
          FROM lineitem
          WHERE l_shipdate >= toDateTime('1996-01-01 00:00:00')
            AND l_shipdate < toDateTime('1997-01-01 00:00:00')
            AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
          GROUP BY l_partkey, l_suppkey
        ),
        tot AS (
          SELECT l_partkey AS t_partkey,
                 CAST(sum(toDecimal64(supp_qty, 6)) AS Float64) AS part_qty
          FROM ship GROUP BY l_partkey
        )
        SELECT s_suppkey, s_name, n_name
        FROM supplier, nation
        WHERE s_nationkey = n_nationkey
          AND s_suppkey IN (
            SELECT l_suppkey FROM ship, tot
            WHERE l_partkey = t_partkey AND supp_qty > 0.5 * part_qty
          )
        ORDER BY s_suppkey
        """,
    )


@register(
    "chsql_tpch_q2",
    oracle=_tpch_oracle("_Q2_ORACLE"),
    tags=("chsql", "tpch", "window"),
)
def chsql_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 as CH text (adapted semantics of tpch.q2_min_cost_supplier):
    CTE chain + per-part MIN window answering the correlated min-cost
    subquery in one pass."""
    return _run(
        spark,
        sf_dir,
        """
        WITH supply AS (
          SELECT l_partkey, l_suppkey,
                 min(l_extendedprice / l_quantity) AS unit_cost
          FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        eu AS (
          SELECT s_suppkey, s_name, s_acctbal, n_name
          FROM supplier, nation, region
          WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
            AND r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
        FROM (
          SELECT eu.*, p_partkey, p_name, unit_cost,
                 min(unit_cost) OVER (PARTITION BY p_partkey) AS best
          FROM part, supply, eu
          WHERE p_partkey = supply.l_partkey AND eu.s_suppkey = supply.l_suppkey
            AND p_size = 15 AND p_type = 'STANDARD'
        ) AS ranked
        WHERE unit_cost = best
        ORDER BY s_acctbal DESC, s_name, p_partkey
        LIMIT 100
        """,
    )


@register(
    "chsql_tpch_q3",
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
    tags=("chsql", "tpch", "agg"),
)
def chsql_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 as CH text: toDate comparisons + decimal-routed revenue."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT l_orderkey,
               CAST(sum(toDecimal64(l_extendedprice * (1 - l_discount), 6))
                    AS Float64) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < toDateTime('1995-03-15 00:00:00')
          AND l_shipdate > toDateTime('1995-03-15 00:00:00')
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
        """,
    )


@register(
    "chsql_tpch_q5",
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
    tags=("chsql", "tpch", "agg"),
)
def chsql_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 as CH text: six-table comma join with the same-nation
    customer⇄supplier constraint."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT n_name,
               CAST(sum(toDecimal64(l_extendedprice * (1 - l_discount), 6))
                    AS Float64) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= toDateTime('1995-01-01 00:00:00')
          AND o_orderdate < toDateTime('1996-01-01 00:00:00')
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
        """,
    )


@register(
    "chsql_tpch_q6",
    oracle=f"""
SELECT {sql_fsum("l_extendedprice * l_discount", "revenue")},
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-06-01'
  AND l_shipdate < TIMESTAMP '1996-06-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=("chsql", "tpch", "filter"),
)
def chsql_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 as CH text: the pure scan-filter-aggregate — every
    predicate reaches the parquet scan through the transpiled text."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT CAST(sum(toDecimal64(l_extendedprice * l_discount, 6))
                    AS Float64) AS revenue,
               count() AS n_lines
        FROM lineitem
        WHERE l_shipdate >= toDateTime('1995-06-01 00:00:00')
          AND l_shipdate < toDateTime('1996-06-01 00:00:00')
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """,
    )


@register(
    "chsql_tpch_q7",
    oracle=_tpch_oracle("_Q7_ORACLE"),
    tags=("chsql", "tpch", "agg"),
)
def chsql_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 as CH text (adapted region-level trading parties): double
    self-join of nation AND region, symmetric disjunction, toYear."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT supp_nation, cust_nation, l_year,
               CAST(sum(toDecimal64(volume, 6)) AS Float64) AS revenue
        FROM (
          SELECT r1.r_name AS supp_nation, r2.r_name AS cust_nation,
                 toYear(l_shipdate) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier, lineitem, orders, customer,
               nation AS n1, nation AS n2, region AS r1, region AS r2
          WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
            AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
            AND c_nationkey = n2.n_nationkey
            AND n1.n_regionkey = r1.r_regionkey AND n2.n_regionkey = r2.r_regionkey
            AND ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
              OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))
            AND l_shipdate >= toDateTime('1996-01-01 00:00:00')
            AND l_shipdate < toDateTime('1998-01-01 00:00:00')
        ) AS shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
        """,
    )


@register(
    "chsql_tpch_q9",
    oracle=_tpch_oracle("_Q9_ORACLE"),
    tags=("chsql", "tpch", "agg"),
)
def chsql_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 as CH text (adapted supply-cost proxy): LIKE filter +
    per-row profit expression + toYear."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT n_name AS nation, o_year,
               CAST(sum(toDecimal64(amount, 6)) AS Float64) AS sum_profit
        FROM (
          SELECT n_name, toYear(o_orderdate) AS o_year,
                 l_extendedprice * (1 - l_discount)
                   - 0.1 * p_retailprice * l_quantity AS amount
          FROM part, supplier, lineitem, orders, nation
          WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
            AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
            AND p_name LIKE '%red%'
        ) AS profit
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
        """,
    )


@register(
    "chsql_tpch_q10",
    oracle=_tpch_oracle("_Q10_ORACLE"),
    tags=("chsql", "tpch", "agg"),
)
def chsql_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 as CH text: quarter + returnflag filters, four-table
    join, top-20."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT c_custkey, c_name,
               CAST(sum(toDecimal64(l_extendedprice * (1 - l_discount), 6))
                    AS Float64) AS revenue,
               c_acctbal, n_name
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= toDateTime('1996-01-01 00:00:00')
          AND o_orderdate < toDateTime('1996-04-01 00:00:00')
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
        """,
    )


@register(
    "chsql_tpch_q11",
    oracle=_tpch_oracle("_Q11_ORACLE"),
    tags=("chsql", "tpch", "subquery"),
)
def chsql_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 as CH text (adapted stock value): CTE reused both as the
    grouped relation AND inside the global-total scalar subquery."""
    return _run(
        spark,
        sf_dir,
        """
        WITH stock AS (
          SELECT l_partkey AS ps_partkey,
                 CAST(sum(toDecimal64(l_extendedprice, 6)) AS Float64) AS part_value
          FROM lineitem, supplier, nation, region
          WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
            AND n_regionkey = r_regionkey AND r_name = 'ASIA'
          GROUP BY l_partkey
        )
        SELECT ps_partkey, part_value
        FROM stock
        WHERE part_value > (
          SELECT 0.001 * CAST(sum(toDecimal64(part_value, 6)) AS Float64) FROM stock
        )
        ORDER BY part_value DESC, ps_partkey
        """,
    )


@register(
    "chsql_tpch_q16",
    oracle=_tpch_oracle("_Q16_ORACLE"),
    tags=("chsql", "tpch", "anti"),
)
def chsql_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 as CH text (adapted exclusions): DISTINCT pair derivation,
    NOT IN anti subquery, IN value list, countDistinct."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT p_brand, p_type, p_size,
               uniqExact(l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) AS pairs, part
        WHERE p_partkey = l_partkey
          AND p_brand != 'Brand#5'
          AND p_type != 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
    )


# --- round 4: stats-aggregate vocabulary through the text path -------------

CH_STATS_VOCAB = """
SELECT l_returnflag,
       sumKahan(l_extendedprice) AS sum_price,
       tupleElement(sumCount(l_quantity), 1) AS qty_sum,
       tupleElement(sumCount(l_quantity), 2) AS qty_cnt,
       uniqExact(l_suppkey) AS n_supp
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register(
    "chsql_stats_vocab",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty_sum,
       COUNT(l_quantity) AS qty_cnt,
       COUNT(DISTINCT l_suppkey) AS n_supp
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    tags=("chsql", "agg", "stats"),
)
def chsql_stats_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 aggregate vocabulary through the CH TEXT path: ``sumKahan``
    (compensated sum → exact decimal), ``sumCount`` (the (sum, count) tuple
    state, unpacked with tupleElement), ``uniqExact``."""
    from pyspark.sql import functions as F

    df = _run(spark, sf_dir, CH_STATS_VOCAB)
    return df.select(
        "l_returnflag",
        "sum_price",
        F.col("qty_sum").cast("double").alias("qty_sum"),
        "qty_cnt",
        "n_supp",
    )


# --- round 4: -Resample combinator through the text path -------------------

CH_RESAMPLE = """
SELECT l_returnflag,
       sumResample(1, 8, 2)(toDecimal64(l_quantity, 2), l_linenumber) AS qsum,
       countResample(1, 8, 2)(l_orderkey, l_linenumber) AS qcnt
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "chsql_resample",
    oracle="""
WITH b(bucket, lo, hi) AS (VALUES (0, 1, 3), (1, 3, 5), (2, 5, 7), (3, 7, 8))
SELECT l.l_returnflag, b.bucket,
       CAST(SUM(CASE WHEN l_linenumber >= b.lo AND l_linenumber < b.hi
                THEN CAST(l_quantity AS DECIMAL(38,2)) END) AS DOUBLE) AS qsum,
       COUNT(CASE WHEN l_linenumber >= b.lo AND l_linenumber < b.hi
             THEN l_orderkey END) AS qcnt
FROM lineitem l CROSS JOIN b
GROUP BY 1, 2 ORDER BY 1, 2
""",
    tags=("chsql", "agg"),
)
def chsql_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``-Resample`` combinator (CH: aggResample(start, end, step)(args, key))
    through the TEXT path: per-linenumber-bucket sum/count arrays, unrolled
    by the transpiler to per-bucket FILTER aggregates.  The arrays are
    exploded to (group, bucket) rows for the driver's hash canonicalizer."""
    from pyspark.sql import functions as F

    df = _run(spark, sf_dir, CH_RESAMPLE)
    return (
        df.select(
            "l_returnflag",
            F.posexplode(F.arrays_zip("qsum", "qcnt")).alias("bucket", "z"),
        )
        .select(
            "l_returnflag",
            "bucket",
            F.col("z.qsum").cast("double").alias("qsum"),
            F.col("z.qcnt").alias("qcnt"),
        )
        .orderBy("l_returnflag", "bucket")
    )


# --- round 4: vocabulary batch (snowflake ids, readable deltas, slots) -----

CH_VOCAB_R4 = """
SELECT o_orderkey % 5 AS grp,
       snowflakeToDateTime(dateTimeToSnowflake(toDateTime(o_orderdate))) AS rt_date,
       formatReadableTimeDelta(o_orderkey % 90061) AS delta_text,
       size(timeSlots(toDateTime(o_orderdate), 3600)) AS n_slots,
       count() AS n
FROM orders
WHERE o_orderkey < 200
GROUP BY grp, rt_date, delta_text, n_slots
ORDER BY grp, rt_date, delta_text
"""


@register(
    "chsql_vocab_r4",
    oracle="""
WITH base AS (
  SELECT o_orderkey % 5 AS grp,
         CAST(o_orderdate AS TIMESTAMP) AS rt_date,
         o_orderkey % 90061 AS secs
  FROM orders WHERE o_orderkey < 200
),
fmt AS (
  SELECT grp, rt_date, secs,
         COALESCE(NULLIF(concat_ws(', ',
           CASE WHEN secs // 86400 > 0 THEN secs // 86400
                || CASE WHEN secs // 86400 = 1 THEN ' day' ELSE ' days' END END,
           CASE WHEN secs % 86400 // 3600 > 0 THEN secs % 86400 // 3600
                || CASE WHEN secs % 86400 // 3600 = 1 THEN ' hour' ELSE ' hours' END END,
           CASE WHEN secs % 3600 // 60 > 0 THEN secs % 3600 // 60
                || CASE WHEN secs % 3600 // 60 = 1 THEN ' minute' ELSE ' minutes' END END,
           CASE WHEN secs % 60 > 0 THEN secs % 60
                || CASE WHEN secs % 60 = 1 THEN ' second' ELSE ' seconds' END END
         ), ''), '0 seconds') AS delta_text
  FROM base
)
SELECT grp, rt_date, delta_text, 3 AS n_slots, COUNT(*) AS n
FROM fmt GROUP BY grp, rt_date, delta_text ORDER BY grp, rt_date, delta_text
""",
    tags=("chsql", "scalar"),
)
def chsql_vocab_r4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 vocabulary through the TEXT path: snowflake-id round trip
    (snowflakeToDateTime ∘ dateTimeToSnowflake = identity on
    millisecond-precision timestamps), formatReadableTimeDelta pluralized
    unit rendering, timeSlots slot covering (midnight + 3600s duration =
    3 half-hour slots)."""
    return _run(spark, sf_dir, CH_VOCAB_R4)


@register(
    "chsql_group_by_all",
    oracle="""
SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust
FROM orders
GROUP BY ALL ORDER BY ALL
""",
    tags=("chsql", "agg"),
)
def chsql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` + ``ORDER BY ALL`` (CH 22.12 sugar: group by every
    non-aggregate select item, order by every select item) — Spark and
    DuckDB both ship the identical ANSI-adopted forms, so the text passes
    through the transpiler unrewritten apart from count() → count(*)."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT o_orderpriority, o_orderstatus, count() AS n,
               uniqExact(o_custkey) AS n_cust
        FROM orders
        GROUP BY ALL ORDER BY ALL
        """,
    )


@register(
    "chsql_vocab_r5",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice < 0.0 THEN 0
            WHEN o_totalprice >= 500000.0 THEN 21
            ELSE CAST(FLOOR(o_totalprice / (500000.0 / 20)) AS BIGINT) + 1
       END AS price_bucket,
       CAST(len(regexp_extract_all(o_orderpriority, '[A-Z]')) AS INTEGER)
         AS n_upper,
       array_to_string(
         list_transform(string_split(lower(o_orderpriority), ' '),
                        w -> CASE WHEN length(w) = 0 THEN w
                                  WHEN regexp_matches(w, '^[0-9]-')
                                  THEN w[1:2] || upper(w[3:3]) || w[4:]
                                  ELSE upper(w[1:1]) || w[2:] END),
         ' ') AS prio_initcap,
       CAST((o_orderkey % 4294967296) % 256 * 16777216
            + (o_orderkey // 256) % 256 * 65536
            + (o_orderkey // 65536) % 256 * 256
            + (o_orderkey // 16777216) % 256 AS BIGINT) AS key_swapped,
       CAST(date_diff('day', DATE '1970-01-01', o_orderdate) + 719528
            AS BIGINT) AS days_y0
FROM orders WHERE o_orderkey < 500
""",
    tags=("chsql", "scalar", "vocab"),
)
def chsql_vocab_r5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 vocabulary through the TEXT path: widthBucket lowered to ANSI
    width_bucket, countMatches → regexp_count, initcap (CH's alnum-run
    word rule since r14 — '2-high' capitalizes to '2-High'; the oracle
    replays the run rule), byteSwap lowered to shift/mask arithmetic,
    toDaysSinceYearZero lowered to epoch-day + 719528."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT o_orderkey,
               widthBucket(o_totalprice, 0.0, 500000.0, 20) AS price_bucket,
               countMatches(o_orderpriority, '[A-Z]') AS n_upper,
               initcap(lower(o_orderpriority)) AS prio_initcap,
               byteSwap(o_orderkey) AS key_swapped,
               toDaysSinceYearZero(o_orderdate) AS days_y0
        FROM orders WHERE o_orderkey < 500
        """,
    )


@register(
    "kql_mv_expand",
    oracle="""
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS words
  FROM documents WHERE doc_id < 60
),
f AS (
  SELECT words, CAST(COUNT(*) AS BIGINT) AS c
  FROM w WHERE length(words) > 5 GROUP BY 1
)
SELECT c, words AS token FROM f ORDER BY c DESC, words ASC LIMIT 5
""",
    tags=("kusto",),
)
def kql_mv_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KQL depth batch: ``mv-expand`` (in-place array explode — LATERAL
    VIEW under the hood), ``project-rename``, plus the existing
    extend/summarize/top stages, all through ``dialect='kusto'``.  The
    pipeline tokenizes documents, explodes, filters, counts, and renames —
    the oracle replays it with unnest + string_split."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
documents
| where doc_id < 60
| extend words = split(text, ' ')
| mv-expand words
| where length(words) > 5
| summarize c = count() by words
| top 5 by c desc, words asc
| project-rename token = words
""",
        dialect="kusto",
    )


@register(
    "kql_pipeline",
    oracle="""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       COUNT(DISTINCT user_id) AS users,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS total
FROM events
WHERE value > 20 AND event_type <> 'view'
GROUP BY event_type
ORDER BY n DESC, event_type
LIMIT 3
""",
    tags=("kusto",),
)
def kql_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A Kusto (KQL) pipeline through ``dialect='kusto'`` — CH ships the
    experimental Kusto dialect behind the same ``SET dialect`` switch as
    PRQL (23.3+): where → summarize by → sort → take, with KQL sugar
    (==/!=, count(), dcount, name=expr aliases).  Ties on n break by
    event_type via a second sort key, and the double sum routes through an
    extend'd decimal cast so both engines sum exactly."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        """
events
| where value > 20 and event_type != 'view'
| extend dv = cast(value as decimal(38,6))
| summarize n = count(), users = dcount(user_id), total = sum(dv) by event_type
| sort by n desc, event_type asc
| take 3
""",
        dialect="kusto",
    )
    return df.select(
        "event_type",
        "n",
        "users",
        F.round(F.col("total").cast("double"), 6).alias("total"),
    )


# --- round-6 vocabulary through the TEXT path --------------------------------


@register(
    "chsql_vocab_r6",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%a %A %b %B') AS dt_names,
       strftime(o_orderdate, '%m/%d/%y %I%p ') || CAST(quarter(o_orderdate)
         AS VARCHAR) AS dt_nums,
       array_to_string(
         CASE WHEN 2 % 4 = 0 THEN [1, 2, 3, CAST(o_orderkey % 5 AS BIGINT)]
              ELSE list_concat(
                     ([1, 2, 3, CAST(o_orderkey % 5 AS BIGINT)])[(2 % 4) + 1 :],
                     ([1, 2, 3, CAST(o_orderkey % 5 AS BIGINT)])[1 : 2 % 4])
         END, ',') AS rot,
       array_to_string(
         [CAST(0 AS BIGINT)] ||
           ([CAST(o_orderkey % 7 AS BIGINT), 4, 5])[1:2], ',') AS shifted
FROM orders WHERE o_orderkey < 400
""",
    tags=("chsql", "scalar", "vocab"),
)
def chsql_vocab_r6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6 vocabulary through the TEXT path: the completed
    ``formatDateTime`` specifier set (weekday/month names, American date,
    12-hour + AM/PM, quarter — the %-codes map to DateTimeFormatter fields;
    week-based codes stay excluded per Spark 3's pattern policy) and the
    CH 23.8 array motion ops lowered to slice/concat with pmod
    normalization.  The oracle replays with strftime + DuckDB list
    slicing."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT o_orderkey,
               formatDateTime(o_orderdate, '%a %W %b %M') AS dt_names,
               formatDateTime(o_orderdate, '%D %l%p %Q') AS dt_nums,
               arrayStringConcat(
                 arrayMap(x -> toString(x),
                          arrayRotateLeft([1, 2, 3, o_orderkey % 5], 2)),
                 ',') AS rot,
               arrayStringConcat(
                 arrayMap(x -> toString(x),
                          arrayShiftRight([o_orderkey % 7, 4, 5], 1, 0)),
                 ',') AS shifted
        FROM orders WHERE o_orderkey < 400
        """,
    )


@register(
    "chsql_uniq64",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(DISTINCT o_custkey % 40) AS BIGINT) AS exact40,
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS u_status,
       TRUE AS u64_ok
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    tags=("chsql", "agg", "vocab"),
)
def chsql_uniq64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``uniqCombined64`` through the TEXT path → approx_count_distinct
    (HLL++): the sketch estimate is engine-specific, so — the
    agg_approx_distinct pattern — the query emits exact counts plus an
    IN-QUERY 5%-relative-error contract (``u64_ok``) that the oracle
    value-checks as TRUE."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT o_orderpriority,
               uniqExact(o_custkey % 40) AS exact40,
               uniqExact(o_orderstatus) AS u_status,
               abs(toFloat64(uniqCombined64(o_custkey % 40))
                   / uniqExact(o_custkey % 40) - 1.0) <= 0.05 AS u64_ok
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
    )


@register(
    "kql_summarize_bin",
    oracle="""
SELECT CAST(to_timestamp(FLOOR(epoch(ts) / 86400) * 86400) AS TIMESTAMP)
         AS day,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(FLOOR(AVG(value) / 10) * 10 AS DOUBLE) AS avg_bucket
FROM events
WHERE value > 150
GROUP BY 1, 2
ORDER BY day, event_type
LIMIT 50
""",
    tags=("kql", "dialect"),
)
def kql_summarize_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``bin()`` (round 6): timespan form buckets a datetime to 1d via
    epoch-floor, numeric form buckets a double — both inside a summarize
    ... by pipeline stage, the single most common KQL idiom
    (render timechart's data shape).  The oracle replays the same floor
    arithmetic."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        """
events
| where value > 150
| summarize n = count(), avg_raw = avg(value) by day = bin(ts, 1d), event_type
| sort by day asc, event_type asc
| take 50
""",
        dialect="kusto",
    )
    return df.select(
        "day",
        "event_type",
        "n",
        (F.floor(F.col("avg_raw") / 10) * 10).cast("double").alias("avg_bucket"),
    )


@register(
    "kql_make_series",
    oracle="""
WITH axis AS (SELECT i, TIMESTAMP '2024-01-01' + CAST(i * 3 AS INTEGER) * INTERVAL 1 DAY AS t
              FROM range(10) r(i)),
binned AS (
  SELECT event_type,
         CAST(FLOOR((epoch(ts) - epoch(TIMESTAMP '2024-01-01')) / 259200)
              AS BIGINT) AS bin_i,
         CAST(COUNT(*) AS DOUBLE) AS n,
         AVG(value) AS avg_v
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'
  GROUP BY 1, 2),
keys AS (SELECT DISTINCT event_type FROM events
         WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31')
SELECT k.event_type,
       string_agg(CAST(CAST(COALESCE(b.n, 0.0) AS BIGINT) AS VARCHAR),
                  ',' ORDER BY a.i) AS n,
       string_agg(printf('%.6f', ROUND(COALESCE(b.avg_v, 0.0), 6)),
                  ',' ORDER BY a.i) AS avg_v,
       string_agg(CAST(CAST(epoch(a.t) AS BIGINT) AS VARCHAR),
                  ',' ORDER BY a.i) AS ts_ep
FROM keys k CROSS JOIN axis a
LEFT JOIN binned b ON b.event_type = k.event_type AND b.bin_i = a.i
GROUP BY k.event_type
ORDER BY k.event_type
""",
    tags=("kql", "dialect", "timeseries"),
)
def kql_make_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``make-series`` (round 6): the signature KQL time-series
    operator — binned aggregation over a dense, default-filled axis, one
    array row per group.  Lowered to a single grouped aggregation plus a
    constant-folded axis ``transform`` (kql.py::_make_series); the gap fill
    is a map lookup, not a join — two map-side-combinable aggregations and
    zero joins (plan-checked: no Join nodes).
    Two series (count with default 0, avg) per event_type over the events
    month at 3d step.  The axis is re-emitted as epoch BIGINTs and the avg
    series rounded in-array so the driver hash is float-stable; series
    values are DOUBLE by the documented lowering contract (Kusto dynamic
    arrays are real-typed).  Every series is emitted comma-joined — the
    repo's driver-output-shape convention (list cells never reach the
    driver hash)."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        """
events
| make-series n = count() default = 0, avg_v = avg(value)
              on ts from datetime(2024-01-01) to datetime(2024-01-31) step 3d
              by event_type
| sort by event_type asc
""",
        dialect="kusto",
    )
    return df.select(
        "event_type",
        F.expr(
            "array_join(transform(n, __x -> CAST(CAST(__x AS BIGINT) AS STRING)), ',')"
        ).alias("n"),
        F.expr(
            "array_join(transform(avg_v,"
            " __x -> format_string('%.6f', round(__x, 6))), ',')"
        ).alias("avg_v"),
        F.expr(
            "array_join(transform(ts,"
            " __t -> CAST(CAST(unix_timestamp(__t) AS BIGINT) AS STRING)), ',')"
        ).alias("ts_ep"),
    )


@register(
    "kql_parse_extract",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(regexp_extract(props, '^\\{"k": (.*?)\\}.*$', 1)
                     AS BIGINT)) AS BIGINT) AS s
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    tags=("kql", "dialect"),
)
def kql_parse_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``parse`` (round 6): simple-mode log extraction — the
    literal/capture pattern compiles to ONE anchored regex evaluated via
    regexp_extract (codegen, no UDF).  Pulls the numeric payload out of the
    events JSON-ish props string, typed long via the ``:long`` capture, then
    aggregates; ``render timechart`` at the end pins the no-op passthrough.
    The oracle replays the identical regex in DuckDB."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
events
| parse props with '{"k": ' kv:long '}'
| summarize n = count(), s = sum(kv) by event_type
| sort by event_type asc
| render timechart
""",
        dialect="kusto",
    )


@register(
    "kql_top_nested",
    oracle="""
WITH l1 AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n1,
         row_number() OVER (ORDER BY COUNT(*) DESC, event_type) AS r1
  FROM events GROUP BY event_type
),
top1 AS (SELECT event_type, n1 FROM l1 WHERE r1 <= 2),
l2 AS (
  SELECT e.event_type, t.n1, e.user_id, CAST(COUNT(*) AS BIGINT) AS n2,
         row_number() OVER (PARTITION BY e.event_type
                            ORDER BY COUNT(*) DESC, e.user_id) AS r2
  FROM events e JOIN top1 t ON e.event_type = t.event_type
  GROUP BY e.event_type, t.n1, e.user_id
)
SELECT event_type, n1, user_id, n2 FROM l2 WHERE r2 <= 3
""",
    tags=("kql", "dialect"),
)
def kql_top_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``top-nested`` (round 6): hierarchical top-k — the top-2 event
    types by count, and within each its top-3 users.  Lowered per level to
    join-back + aggregate + partitioned row_number (kql.py::_top_nested);
    ranks tie-break on the key ascending in both engines.  The oracle
    replays the hierarchy with DuckDB window SQL."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
events
| top-nested 2 of event_type by n1 = count(),
  top-nested 3 of user_id by n2 = count()
""",
        dialect="kusto",
    )


@register(
    "chsql_generate_series",
    oracle="""
SELECT CAST(g AS BIGINT) AS g, CAST(g * g AS BIGINT) AS sq
FROM generate_series(2, 20, 3) t(g)
""",
    tags=("chsql", "dialect", "table-function"),
)
def chsql_generate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH 24.x ``generate_series`` table function (INCLUSIVE upper bound,
    optional step — unlike ``numbers``) plus the ``zeros`` test table,
    both lowered to range() subqueries on the TEXT path.  DuckDB ships
    generate_series natively with the same inclusive contract — a directly
    comparable oracle."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT generate_series AS g, generate_series * generate_series AS sq
        FROM generate_series(2, 20, 3)
        """,
    )


@register(
    "chsql_change_datetime",
    oracle="""
SELECT o_orderkey,
       make_timestamp(2030, month(o_orderdate), day(o_orderdate),
                      hour(o_orderdate), minute(o_orderdate),
                      CAST(second(o_orderdate) AS DOUBLE)) AS cy,
       make_timestamp(year(o_orderdate), 1 + o_orderkey % 12,
                      15, hour(o_orderdate),
                      minute(o_orderdate),
                      CAST(second(o_orderdate) AS DOUBLE)) AS cm,
       make_timestamp(year(o_orderdate), month(o_orderdate),
                      1 + o_orderkey % 28, hour(o_orderdate),
                      minute(o_orderdate),
                      CAST(second(o_orderdate) AS DOUBLE)) AS cd,
       make_timestamp(year(o_orderdate), month(o_orderdate),
                      day(o_orderdate), CAST(o_orderkey % 24 AS BIGINT),
                      CAST(o_orderkey % 60 AS BIGINT), 30.0) AS chms
FROM orders WHERE o_orderkey < 400
""",
    tags=("chsql", "datetime", "vocab"),
)
def chsql_change_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``changeYear/Month/Day/Hour/Minute/Second`` (CH 24.7) through the
    TEXT path — each lowered to make_timestamp with one component replaced;
    the oracle replays with DuckDB make_timestamp.  Day values stay ≤ 28 so
    no month-overflow semantics are exercised (CH clamps differently by
    version; documented scope)."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT o_orderkey,
               changeYear(o_orderdate, 2030) AS cy,
               changeMonth(changeDay(o_orderdate, 15), 1 + o_orderkey % 12) AS cm,
               changeDay(o_orderdate, 1 + o_orderkey % 28) AS cd,
               changeSecond(changeMinute(changeHour(o_orderdate,
                   o_orderkey % 24), o_orderkey % 60), 30) AS chms
        FROM orders WHERE o_orderkey < 400
        """,
    )


@register(
    "chsql_string_sets",
    oracle="""
WITH s AS (
  SELECT p_partkey, p_name, p_brand,
         p_brand || '#' || CAST(p_partkey % 97 AS VARCHAR) AS tag
  FROM part WHERE p_partkey < 300
),
j AS (
  SELECT *,
         list_distinct(string_split(p_name, '')) AS ca,
         list_distinct(string_split(tag, '')) AS cb,
         string_split(p_brand, '') AS ba,
         string_split(tag, '') AS bb
  FROM s
)
SELECT p_partkey,
       ROUND(CAST(len(list_intersect(ca, cb)) AS DOUBLE)
             / len(list_distinct(list_concat(ca, cb))), 6) AS jac,
       CAST(len(list_filter(list_zip(ba, bb),
                x -> x[1] IS NULL OR x[2] IS NULL OR x[1] <> x[2]))
            AS BIGINT) AS ham,
       COALESCE(array_to_string(
           regexp_extract_all(p_name, '([a-z]+)o([a-z]+)', 1), ','), '') AS g1,
       COALESCE(array_to_string(
           regexp_extract_all(p_name, '([a-z]+)o([a-z]+)', 2), ','), '') AS g2
FROM j
""",
    tags=("chsql", "string", "vocab"),
)
def chsql_string_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``stringJaccardIndex`` (character-set Jaccard), ``byteHammingDistance``
    (positionwise mismatches, length difference counted), and
    ``extractAllGroupsHorizontal`` through the TEXT path — all lowered to
    split/zip_with/aggregate/regexp_extract_all expressions; the oracle
    replays with DuckDB list algebra (list_zip null-pads exactly like
    Spark's zip_with)."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT p_partkey,
               round(stringJaccardIndex(p_name,
                     concat(p_brand, '#', toString(p_partkey % 97))), 6) AS jac,
               byteHammingDistance(p_brand,
                     concat(p_brand, '#', toString(p_partkey % 97))) AS ham,
               arrayStringConcat(
                 arrayElement(extractAllGroupsHorizontal(p_name,
                     '([a-z]+)o([a-z]+)'), 1), ',') AS g1,
               arrayStringConcat(
                 arrayElement(extractAllGroupsHorizontal(p_name,
                     '([a-z]+)o([a-z]+)'), 2), ',') AS g2
        FROM part WHERE p_partkey < 300
        """,
    )


@register(
    "chsql_split_normalize",
    oracle="""
SELECT n_nationkey,
       array_to_string(string_split_regex(n_name || '1X2YY3', '[0-9]+'),
                       '|') AS by_regexp,
       TRUE AS nfc_fixes_decomposed,
       TRUE AS nfd_roundtrip_ok,
       'e' || chr(769) AS nfd_pin,  -- e + combining acute (explicit)
       chr(233) AS nfc_pin          -- precomposed e-acute (explicit)
FROM nation
""",
    tags=("chsql", "string", "vocab"),
)
def chsql_split_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``splitByRegexp`` + the Unicode normalization family
    (``normalizeUTF8NFC/NFD/NFKC/NFKD``, stdlib unicodedata kernels
    registered as SQL functions) through the TEXT path.  splitByRegexp
    replays in DuckDB directly; normalization has no DuckDB equivalent, so
    the query pins the RFC-classic vectors (e + combining-acute ↔ é) and
    NFC∘NFD == NFC identity contracts the oracle value-matches."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        """
        SELECT n_nationkey,
               arrayStringConcat(
                 splitByRegexp('[0-9]+', concat(n_name, '1X2YY3')), '|')
                 AS by_regexp,
               normalizeUTF8NFC('e\\u0301') = '\\u00e9'
                 AS nfc_fixes_decomposed,
               normalizeUTF8NFC(normalizeUTF8NFD(n_name)) = n_name
                 AS nfd_roundtrip_ok,
               normalizeUTF8NFD('\\u00e9') AS nfd_pin,
               normalizeUTF8NFC('e\\u0301') AS nfc_pin
        FROM nation
        """
    )
    return df


@register(
    "chsql_math_vocab_r6",
    oracle="""
SELECT o_orderkey,
       CAST(GREATEST(o_totalprice, 100000.0) AS DOUBLE) AS mx,
       CAST(LEAST(o_totalprice, 100000.0) AS DOUBLE) AS mn,
       ROUND(1.0 / (1.0 + exp(-(o_totalprice / 100000.0))), 6) AS sig,
       CAST(CASE WHEN o_orderkey < 1 THEN 0
                 ELSE CAST(power(2, FLOOR(log2(o_orderkey))) AS BIGINT)
            END AS BIGINT) AS exp2,
       CAST(isoyear(o_orderdate) * 100 + weekofyear(o_orderdate)
            AS BIGINT) AS yw,
       ROUND(gamma(1 + o_orderkey % 6), 6) AS tg,
       ROUND(lgamma(1 + o_orderkey % 20), 6) AS lg,
       TRUE AS erf_odd_ok,
       ROUND(0.8427007929497149, 6) AS erf1_pin
FROM orders WHERE o_orderkey < 400
""",
    tags=("chsql", "math", "vocab"),
)
def chsql_math_vocab_r6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math vocabulary through the TEXT path: ``max2``/``min2`` →
    greatest/least, ``sigmoid``, ``roundToExp2`` (largest power of two ≤ x,
    0 below 1), ``toYearWeek(ts, 3)`` (ISO mode — year-of-week × 100 +
    ISO week; other MySQL modes rejected, Spark 3 removed week-based
    patterns), and the libm special functions ``tgamma``/``lgamma``/``erf``
    (stdlib-math pandas kernels registered as SQL functions).  DuckDB
    replays gamma/lgamma natively; it lacks erf, so the query carries the
    odd-symmetry contract erf(-x) == -erf(x) plus the textbook erf(1) pin.
    The ISO year-of-week replays as DuckDB isoyear()*100 + weekofyear()."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        """
        SELECT o_orderkey,
               max2(o_totalprice, 100000.0) AS mx,
               min2(o_totalprice, 100000.0) AS mn,
               round(sigmoid(o_totalprice / 100000.0), 6) AS sig,
               roundToExp2(o_orderkey) AS exp2,
               toYearWeek(o_orderdate, 3) AS yw,
               round(tgamma(1 + o_orderkey % 6), 6) AS tg,
               round(lgamma(1 + o_orderkey % 20), 6) AS lg,
               abs(erf(-(o_totalprice / 100000.0))
                   + erf(o_totalprice / 100000.0)) < 1e-15 AS erf_odd_ok,
               round(erf(1.0), 6) AS erf1_pin
        FROM orders WHERE o_orderkey < 400
        """
    )
    return df


@register(
    "system_settings_probe",
    oracle="""
SELECT * FROM (VALUES
  ('adaptive_execution', 'true', 0),
  ('ansi_mode', 'true', 0),
  ('max_threads', '8', 1),
  ('send_logs_level', 'warning', 1),
  ('session_timezone', 'UTC', 0)
) t(name, value, changed)
""",
    tags=("chsql", "system", "introspection"),
)
def system_settings_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``system.settings`` (round 6): session settings applied via SET show
    changed = 1 (CH's changed-flag semantics), the engine's pinned
    Spark-conf analogs show changed = 0; the view refreshes after every SET
    so text reads always see current state.  The oracle pins the exact
    post-SET rows.  (`SETTINGS k = v` tail clauses still strip — a SETTINGS
    token preceded by '.' is the table name, round-6 tokenizer fix.)"""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    eng.sql("SET max_threads = 8")
    eng.sql("SET send_logs_level = 'warning'")
    out = eng.sql(
        "SELECT name, value, changed FROM system.settings ORDER BY name"
    )
    # the settings view snapshots literal rows — restore the shared
    # session's shuffle conf so the probe leaves no side effect behind
    spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out


@register(
    "chsql_vocab_r6b",
    oracle="""
SELECT s_suppkey,
       isnan(CAST('NaN' AS DOUBLE) * s_acctbal) AS nan_t,
       CASE WHEN s_suppkey % 3 = 0 THEN -5.0
            ELSE CAST(s_acctbal AS DOUBLE) END AS fin,
       ((s_suppkey >> 1) & 1 = 1) AND ((s_suppkey >> 2) & 1 = 1) AS bta,
       ((s_suppkey >> 1) & 1 = 1) OR ((s_suppkey >> 2) & 1 = 1) AS bto,
       (s_suppkey << 5) | (s_suppkey >> 59) AS rot5,
       bit_count(xor(s_suppkey, s_nationkey)) AS hd
FROM supplier
""",
    tags=("chsql", "dialect", "vocab"),
)
def chsql_vocab_r6b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batches 7/8 through the TEXT path: isNaN, ifNotFinite, bitTestAll/
    Any, bitRotateLeft, bitHammingDistance — a CH user's query text runs
    verbatim.  The oracle recomputes everything from shift/mask arithmetic."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT s_suppkey,
               isNaN(CAST('NaN' AS Float64) * s_acctbal) AS nan_t,
               ifNotFinite(
                   if(s_suppkey % 3 == 0, CAST('Infinity' AS Float64),
                      toFloat64(s_acctbal)), -5.0) AS fin,
               bitTestAll(s_suppkey, 1, 2) AS bta,
               bitTestAny(s_suppkey, 1, 2) AS bto,
               bitRotateLeft(s_suppkey, 5) AS rot5,
               bitHammingDistance(s_suppkey, s_nationkey) AS hd
        FROM supplier
        """,
    )


@register(
    "kql_mv_apply",
    oracle="""
SELECT vec_id,
       ROUND(list_sum(list_transform(embedding,
                                     x -> CAST(x AS DOUBLE))), 6) AS s,
       ROUND(list_max(list_transform(embedding,
                                     x -> CAST(x AS DOUBLE) * 2)), 6) AS mx,
       CAST(len(embedding) AS INTEGER) AS n
FROM embeddings WHERE vec_id < 100
""",
    tags=("kql", "dialect"),
)
def kql_mv_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``mv-apply`` (single-summarize subset, round 6): per-row
    subaggregation over the embedding array collapses to array folds — no
    explode, no re-join (kql.py::_mv_apply).  Left-to-right fold order
    matches DuckDB's list_sum, so sums agree after round(6)."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        """
embeddings
| where vec_id < 100
| mv-apply x = embedding on (summarize s = sum(x), mx = max(x * 2), n = count())
""",
        dialect="kusto",
    )
    return df.select(
        "vec_id",
        F.round("s", 6).alias("s"),
        F.round(F.col("mx").cast("double"), 6).alias("mx"),
        "n",
    )


# --- round-7 KQL depth: join kinds / union / range / percentile /
# --- general mv-apply subpipelines / make-series auto-bounds -----------------


@register(
    "kql_join_anti_semi",
    oracle="""
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
       MIN(c_acctbal) AS mn, MAX(c_acctbal) AS mx
FROM customer c
SEMI JOIN (SELECT * FROM nation WHERE n_regionkey < 2) nn
  ON c.c_nationkey = nn.n_nationkey
ANTI JOIN (SELECT * FROM orders WHERE o_totalprice > 100000) o
  ON c.c_custkey = o.o_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    tags=("kql", "dialect"),
)
def kql_join_anti_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``join kind=leftsemi|leftanti`` (round 7): customers in the
    first two regions (semi) with no six-figure order (anti), per segment.
    Both kinds lower to Spark's native LEFT SEMI / LEFT ANTI joins —
    existence checks that never materialize right-side columns, so the
    join build side ships keys only at any scale.  The right operand is a
    full subpipeline (``(orders | where ...)``), transpiled recursively.
    DuckDB replays with its native SEMI/ANTI JOIN."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
customer
| join kind=leftsemi (nation | where n_regionkey < 2)
    on $left.c_nationkey == $right.n_nationkey
| join kind=leftanti (orders | where o_totalprice > 100000)
    on $left.c_custkey == $right.o_custkey
| summarize n = count(), mn = min(c_acctbal), mx = max(c_acctbal)
    by c_mktsegment
| sort by c_mktsegment asc
""",
        dialect="kusto",
    )


@register(
    "kql_union_range",
    oracle="""
WITH lo AS (SELECT CAST(x AS INTEGER) AS x, 'lo' AS src
            FROM generate_series(0, 9, 1) t(x)),
hi AS (SELECT CAST(x AS INTEGER) AS x, 'hi' AS src
       FROM generate_series(100, 140, 5) t(x)),
u AS (SELECT * FROM lo UNION ALL SELECT * FROM hi)
SELECT src, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
FROM u GROUP BY src ORDER BY src
""",
    tags=("kql", "dialect", "table-function"),
)
def kql_union_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``range`` source + ``union`` (round 7): two arithmetic
    progressions (``range`` lowers to ``explode(sequence(...))``, inclusive
    bounds like Kusto) appended with ``union`` (UNION ALL — Kusto unions
    never dedup; the right operand is a subpipeline transpiled
    recursively), then aggregated per source tag."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
range x from 0 to 9 step 1
| extend src = 'lo'
| union (range x from 100 to 140 step 5 | extend src = 'hi')
| summarize n = count(), s = sum(x) by src
| sort by src asc
""",
        dialect="kusto",
    )


@register(
    "kql_percentile_agg",
    oracle="""
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.95), 6) AS p95,
       CAST(COUNT(*) FILTER (WHERE value > 100) AS BIGINT) AS c,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6)))
                  FILTER (WHERE value > 100) AS DOUBLE), 6) AS s,
       MAX(value) FILTER (WHERE value < 50) AS mp
FROM events GROUP BY event_type ORDER BY event_type
""",
    tags=("kql", "dialect"),
)
def kql_percentile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``percentile()`` + conditional aggregates (round 7):
    ``percentile(x, N)`` lowers to Spark's exact interpolated percentile
    (documented deviation: Kusto's own is a T-digest approximation — the
    exact form is deterministic and matches SQL PERCENTILE_CONT /
    DuckDB quantile_cont); ``countif/sumif/maxif`` lower to
    count_if / filtered CASE aggregates.  The double sum routes through an
    extend'd DECIMAL cast so both engines sum exactly; percentiles round
    to 6dp on both sides."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        """
events
| extend dv = cast(value as decimal(38,6))
| summarize p50 = percentile(value, 50), p95 = percentile(value, 95),
            c = countif(value > 100), s = sumif(dv, value > 100),
            mp = maxif(value, value < 50)
    by event_type
| sort by event_type asc
""",
        dialect="kusto",
    )
    return df.select(
        "event_type",
        F.round("p50", 6).alias("p50"),
        F.round("p95", 6).alias("p95"),
        "c",
        F.round(F.col("s").cast("double"), 6).alias("s"),
        "mp",
    )


@register(
    "kql_mv_apply_pipe",
    oracle="""
WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 80),
w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM base),
f AS (SELECT doc_id, length(t) AS l FROM w WHERE length(t) > 4),
per AS (SELECT doc_id, SUM(l) AS s, COUNT(*) AS n, MAX(l) AS mx
        FROM f GROUP BY doc_id)
SELECT b.doc_id, CAST(COALESCE(p.s, 0) AS DOUBLE) AS s,
       CAST(COALESCE(p.n, 0) AS BIGINT) AS n,
       CAST(p.mx AS INTEGER) AS mx
FROM base b LEFT JOIN per p ON b.doc_id = p.doc_id
""",
    tags=("kql", "dialect"),
)
def kql_mv_apply_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``mv-apply`` with a general subpipeline (round 7):
    ``where | extend | summarize`` chained inside the per-record subquery.
    The whole chain lowers to per-row array combinators — filter, a
    named_struct transform (the transpiler tracks element fields through
    struct promotion), then folds — so unlike the textbook lowering
    (posexplode → regroup on a synthetic row key) there is NO shuffle at
    any scale; the operator stays embarrassingly row-parallel.  Per-doc
    token-length stats over a filtered token array; docs whose tokens all
    fail the filter keep s=0 / n=0 / mx=NULL (fold-over-empty semantics),
    which the oracle replays via LEFT JOIN + COALESCE."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        """
documents
| where doc_id < 80
| extend toks = split(text, ' ')
| mv-apply t = toks on (where length(t) > 4
                        | extend l = length(t)
                        | summarize s = sum(l), n = count(), mx = max(l))
""",
        dialect="kusto",
    )
    return df.select(
        "doc_id",
        F.col("s").cast("double").alias("s"),
        F.col("n").cast("bigint").alias("n"),
        F.col("mx").cast("int").alias("mx"),
    )


@register(
    "kql_make_series_auto",
    oracle="""
WITH src AS (SELECT event_type, ts, value FROM events
             WHERE event_type <> 'view' AND ts IS NOT NULL),
binned AS (
  SELECT event_type, CAST(FLOOR(epoch(ts) / 604800) AS BIGINT) AS b,
         CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(CAST(value AS DECIMAL(38,6))) AS s
  FROM src GROUP BY event_type, b),
bounds AS (SELECT MIN(b) AS f, MAX(b) AS t FROM binned),
axis AS (SELECT unnest(generate_series(bo.f, bo.t)) AS b FROM bounds bo),
keys AS (SELECT DISTINCT event_type FROM src)
SELECT k.event_type,
       string_agg(CAST(CAST(COALESCE(bn.n, 0.0) AS BIGINT) AS VARCHAR),
                  ',' ORDER BY a.b) AS n,
       string_agg(printf('%.6f', ROUND(CAST(COALESCE(bn.s, 0) AS DOUBLE), 6)),
                  ',' ORDER BY a.b) AS s,
       string_agg(CAST(CAST(a.b * 604800 AS BIGINT) AS VARCHAR),
                  ',' ORDER BY a.b) AS ts_ep
FROM keys k CROSS JOIN axis a
LEFT JOIN binned bn ON bn.event_type = k.event_type AND bn.b = a.b
GROUP BY k.event_type
ORDER BY k.event_type
""",
    tags=("kql", "dialect", "timeseries"),
)
def kql_make_series_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``make-series`` with auto bounds (round 7): ``from``/``to``
    omitted — the axis snaps to the observed min/max bin.  The bounds ride
    an empty-frame window over the PER-GROUP rows (one row per group after
    the map fold), so the lowering stays join-free and scans the data
    exactly once; the window sorts #groups rows, not the table.  Bins align
    to the Unix-epoch grid when ``from`` is absent (documented deviation:
    Kusto anchors its auto grid at 0001-01-01).  The double sum series
    routes through a DECIMAL cast; both series round/emit as in
    kql_make_series so the driver hash is float-stable."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        """
events
| where event_type != 'view'
| make-series n = count() default = 0,
              s = sum(cast(value as decimal(38,6))) default = 0
              on ts step 7d by event_type
| sort by event_type asc
""",
        dialect="kusto",
    )
    return df.select(
        "event_type",
        F.expr(
            "array_join(transform(n, __x -> CAST(CAST(__x AS BIGINT) AS STRING)), ',')"
        ).alias("n"),
        F.expr(
            "array_join(transform(s,"
            " __x -> format_string('%.6f', round(__x, 6))), ',')"
        ).alias("s"),
        F.expr(
            "array_join(transform(ts,"
            " __t -> CAST(CAST(unix_timestamp(__t) AS BIGINT) AS STRING)), ',')"
        ).alias("ts_ep"),
    )


@register(
    "kql_scalar_vocab",
    oracle="""
SELECT doc_id,
       text[1:12] AS s,
       CAST(strpos(text, 'the') - 1 AS BIGINT) AS i,
       CAST((length(text) - length(replace(text, 'e', '')))
            / length('e') AS BIGINT) AS nl,
       upper(lang) AS lang_up,
       CASE WHEN n_chars > 500 THEN 'long'
            WHEN n_chars > 100 THEN 'mid'
            ELSE 'short' END AS cat,
       lang || ':' || CAST(doc_id AS VARCHAR) AS head,
       (COALESCE(CAST(source AS VARCHAR), '') = '') AS empty_src
FROM documents WHERE doc_id < 200
""",
    tags=("kql", "dialect"),
)
def kql_scalar_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto scalar-function vocabulary (round 7): ``substring`` (0-based),
    ``indexof`` (0-based, -1 missing), ``countof``, ``toupper``, ``case``,
    ``strcat``, ``tostring``, ``isempty``, ``tolong`` — each lowered to the
    equivalent JVM expression (kql.py::_KQL_SCALARS, a paren-aware call
    rewriter, so nested arguments survive).  The oracle replays every
    lowering in DuckDB string SQL."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
documents
| where doc_id < 200
| extend s = substring(text, 0, 12), i = tolong(indexof(text, 'the')),
         nl = countof(text, 'e'), lang_up = toupper(lang),
         cat = case(n_chars > 500, 'long', n_chars > 100, 'mid', 'short'),
         head = strcat(lang, ':', tostring(doc_id)),
         empty_src = isempty(source)
| project doc_id, s, i, nl, lang_up, cat, head, empty_src
""",
        dialect="kusto",
    )


@register(
    "kql_let_datatable",
    oracle="""
WITH dim AS (
  SELECT * FROM (VALUES ('click', 'Click!'), ('purchase', 'Buy'),
                        ('view', 'View')) d(et, label)
)
SELECT d.label, CAST(COUNT(*) AS BIGINT) AS n,
       MIN(e.value) FILTER (WHERE e.value < 200) AS mn
FROM events e JOIN dim d ON e.event_type = d.et
WHERE e.value > 150
GROUP BY d.label ORDER BY d.label
""",
    tags=("kql", "dialect"),
)
def kql_let_datatable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``let`` statements + ``datatable`` literal source (round 7): a
    scalar let substitutes as a macro, a tabular let binds an inline typed
    VALUES relation that the join resolves by name — the Kusto idiom for
    small dimension lookups (and exactly the broadcast-dim join shape at
    scale: the datatable is driver-literal, so Spark broadcasts it)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
let threshold = 150;
let dim = datatable(et:string, label:string)[
  'click', 'Click!', 'purchase', 'Buy', 'view', 'View'];
events
| where value > threshold
| join kind=inner (dim) on $left.event_type == $right.et
| summarize n = count(), mn = minif(value, value < 200) by label
| sort by label asc
""",
        dialect="kusto",
    )


@register(
    "prql_window_case",
    oracle="""
SELECT event_id, event_type,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
             / (COUNT(*) OVER w), 6) AS ma,
       CAST(COUNT(*) OVER w AS BIGINT) AS n3,
       CASE WHEN value > 400 THEN 'hot' ELSE 'warm' END AS heat,
       'e' || CAST(event_id AS VARCHAR) AS tag
FROM events
WHERE value > 100
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
    tags=("prql", "dialect", "window"),
)
def prql_window_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRQL round-7 extensions through ``dialect='prql'``: the PARTITIONED
    window form ``group {keys} (window rolling:n (derive {...}))`` — per-key
    frames over the most recent ``sort`` order, partition-parallel at scale
    (the unpartitioned ``window`` form exists but moves data to one
    partition; this is the shape to use) — plus ``case [cond => val, true =>
    default]`` and f-string sugar.  The rolling mean is emitted as
    decimal-exact frame sum ÷ frame count so both engines divide the same
    exact numerator (frame order irrelevant)."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        """
from events
filter value > 100
derive {dv = cast(value as decimal(38,6)),
        heat = case [value > 400 => 'hot', true => 'warm'],
        tag = f"e{event_id}"}
sort {ts, event_id}
group {event_type} (window rolling:3 (derive {sdv = sum dv, n3 = count this}))
select {event_id, event_type, sdv, n3, heat, tag}
""",
        dialect="prql",
    )
    return df.select(
        "event_id",
        "event_type",
        F.round(F.col("sdv").cast("double") / F.col("n3"), 6).alias("ma"),
        F.col("n3").cast("bigint").alias("n3"),
        "heat",
        "tag",
    )


@register(
    "chsql_parametric_if",
    oracle="""
WITH base AS (
  SELECT l_returnflag, l_linestatus, l_quantity, l_linenumber
  FROM lineitem WHERE l_orderkey < 2000
),
agg AS (
  SELECT l_returnflag,
         ROUND(quantile_cont(l_quantity, 0.5)
               FILTER (WHERE l_linenumber <= 3), 6) AS med_lo,
         ROUND(quantile_cont(l_quantity, 0.5)
               FILTER (WHERE l_linenumber > 3), 6) AS med_hi,
         array_to_string(list_transform(
           [ROUND(quantile_cont(l_quantity, 0.25), 6),
            ROUND(quantile_cont(l_quantity, 0.75), 6)],
           x -> printf('%.6f', x)), ',') AS iqr
  FROM base GROUP BY l_returnflag
),
f AS (
  SELECT l_returnflag, l_linestatus, COUNT(*) AS n
  FROM base WHERE l_quantity > 10 GROUP BY l_returnflag, l_linestatus
),
r AS (
  SELECT l_returnflag, l_linestatus,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY n DESC, l_linestatus) AS rk
  FROM f
),
t AS (
  SELECT l_returnflag, list(l_linestatus ORDER BY rk) AS top_ls
  FROM r WHERE rk <= 2 GROUP BY l_returnflag
)
SELECT a.l_returnflag, a.med_lo, a.med_hi, a.iqr,
       array_to_string(COALESCE(t.top_ls, []), ',') AS top_ls
FROM agg a LEFT JOIN t USING (l_returnflag)
ORDER BY a.l_returnflag
""",
    tags=("chsql", "dialect", "parametric"),
)
def chsql_parametric_if(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parametric aggregates × the -If combinator on the TEXT path (round
    7): ``quantileIf(0.5)(x, cond)`` / ``quantileExactIf`` /
    ``topKIf(k)(x, cond)`` lower to the base parametric rule over
    ``CASE WHEN cond THEN x END`` (aggregates skip NULLs, so the filter is
    exact), plus the ``quantiles(q...)(x)`` list form rounded in-array via
    arrayMap.  The oracle replays with FILTER aggregates and a ranked
    top-k subquery using the same (count desc, value asc) tie-break.
    Array outputs (iqr, top_ls) are emitted comma-joined — list cells
    never reach the driver hash."""
    from pyspark.sql import functions as F

    df = _run(
        spark,
        sf_dir,
        """
        SELECT l_returnflag,
               round(quantileIf(0.5)(l_quantity, l_linenumber <= 3), 6)
                 AS med_lo,
               round(quantileExactIf(0.5)(l_quantity, l_linenumber > 3), 6)
                 AS med_hi,
               arrayMap(x -> round(x, 6),
                        quantiles(0.25, 0.75)(l_quantity)) AS iqr,
               topKIf(2)(l_linestatus, l_quantity > 10) AS top_ls
        FROM lineitem WHERE l_orderkey < 2000
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """,
    )
    return df.select(
        "l_returnflag", "med_lo", "med_hi",
        F.expr(
            "array_join(transform(iqr,"
            " __x -> format_string('%.6f', __x)), ',')"
        ).alias("iqr"),
        F.expr("array_join(top_ls, ',')").alias("top_ls"),
    )


@register(
    "kql_lookup_tophitters",
    oracle="""
WITH j AS (
  SELECT c.c_acctbal, n.n_name
  FROM customer c
  LEFT JOIN (SELECT * FROM nation WHERE n_regionkey < 3) n
    ON c.c_nationkey = n.n_nationkey
),
t AS (
  SELECT n_name, SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS s0
  FROM j GROUP BY n_name
  ORDER BY s0 DESC, n_name LIMIT 5
)
SELECT n_name, ROUND(CAST(s0 AS DOUBLE), 6) AS s,
       CAST(row_number() OVER (ORDER BY s0 DESC, n_name) AS INTEGER) AS rk
FROM t
""",
    tags=("kql", "dialect"),
)
def kql_lookup_tophitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``lookup`` + ``top-hitters`` + ``serialize`` (round 7): the
    dimension-enrich sugar (LEFT JOIN on the key, subpipeline operand),
    weighted top-N with Kusto's ``approximate_sum_<col>`` output name
    (exact aggregation — documented deviation from the streaming
    approximation), and row numbering over the most recent sort.  The
    weighted sum routes through a DECIMAL extend so both engines rank the
    same exact totals."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        """
customer
| lookup (nation | where n_regionkey < 3)
    on $left.c_nationkey == $right.n_nationkey
| extend dv = cast(c_acctbal as decimal(38,6))
| top-hitters 5 of n_name by dv
| sort by approximate_sum_n_name desc, n_name asc
| serialize rk = row_number()
""",
        dialect="kusto",
    )
    return df.select(
        "n_name",
        F.round(F.col("approximate_sum_n_name").cast("double"), 6).alias("s"),
        "rk",
    )


@register(
    "chsql_multisearch",
    oracle=r"""
SELECT doc_id,
       array_to_string(list_transform(
         [CAST(strpos(text, 'the') AS BIGINT),
          CAST(strpos(text, 'data') AS BIGINT),
          CAST(strpos(text, 'xyzq') AS BIGINT)],
         x -> CAST(x AS VARCHAR)), ',') AS pos,
       CAST(strpos(text, 'spark') > 0 OR strpos(text, 'data') > 0
            AS INTEGER) AS any_hit,
       CASE WHEN strpos(text, 'xyzq') > 0 THEN 1
            WHEN strpos(text, 'the') > 0 THEN 2 ELSE 0 END AS fi,
       CAST(regexp_matches(text, '^The') OR regexp_matches(text, '[0-9]{4}')
            AS INTEGER) AS ma,
       array_to_string([regexp_extract(text, '(\w+) (\w+)', 1),
                        regexp_extract(text, '(\w+) (\w+)', 2)], ',')
         AS first_two
FROM documents WHERE doc_id < 120
""",
    tags=("chsql", "dialect", "string-search"),
)
def chsql_multisearch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-needle search family on the TEXT path (round 7):
    ``multiSearchAllPositions`` (1-based positions, 0 when missing),
    ``multiSearchAny``/``multiSearchFirstIndex``, ``multiMatchAny``/
    ``multiMatchAnyIndex`` (regex OR via array exists — the vectorized-scan
    analog of CH's hyperscan tier), and ``extractGroups`` (capture groups
    of the first match; group count derived from the constant pattern at
    transpile time).  All array-combinator JVM exprs; the oracle replays
    with strpos/regexp per needle.  Array outputs (pos, first_two) are
    emitted comma-joined — list cells never reach the driver hash."""
    from pyspark.sql import functions as F

    df = _run(
        spark,
        sf_dir,
        r"""
        SELECT doc_id,
               multiSearchAllPositions(text, ['the', 'data', 'xyzq']) AS pos,
               multiSearchAny(text, ['spark', 'data']) AS any_hit,
               multiSearchFirstIndex(text, ['xyzq', 'the']) AS fi,
               multiMatchAny(text, ['^The', '[0-9]{4}']) AS ma,
               extractGroups(text, '(\\w+) (\\w+)') AS first_two
        FROM documents WHERE doc_id < 120
        """,
    )
    return df.select(
        "doc_id",
        F.expr(
            "array_join(transform(pos, __x -> cast(__x as string)), ',')"
        ).alias("pos"),
        "any_hit", "fi", "ma",
        F.expr("array_join(first_two, ',')").alias("first_two"),
    )


@register(
    "kql_dynamic_vocab",
    oracle="""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents WHERE doc_id < 80
)
SELECT doc_id,
       array_to_string(list_sort(toks[1:3]), '|') AS head3,
       CAST(len(list_distinct(list_cat(toks[1:2],
                                       ['alpha', 'beta']))) AS INTEGER)
         AS union_n,
       CAST(list_position(toks, 'the') AS INTEGER) - 1 AS idx_the,
       array_to_string(toks[2:3], '~') AS mid2
FROM w
""",
    tags=("kql", "dialect"),
)
def kql_dynamic_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto dynamic/array vocabulary (round 7): pack/slice/sort/set-ops/
    index-of lowered to Spark array combinators — ``array_slice`` keeps
    Kusto's 0-based INCLUSIVE bounds, ``array_index_of`` its 0-based/-1
    contract, ``set_union`` dedups like Kusto's set semantics.  The oracle
    replays with DuckDB list functions (1-based slicing re-based)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
documents
| where doc_id < 80
| extend toks = split(tolower(text), ' ')
| project doc_id,
          head3 = strcat_array(array_sort_asc(array_slice(toks, 0, 2)), '|'),
          union_n = toint(array_length(set_union(array_slice(toks, 0, 1),
                                                 pack_array('alpha', 'beta')))),
          idx_the = toint(array_index_of(toks, 'the')),
          mid2 = strcat_array(array_slice(toks, 1, 2), '~')
""",
        dialect="kusto",
    )


@register(
    "kql_serialized_window",
    oracle="""
WITH s AS (
  SELECT event_id, value,
         ROUND(value - lag(value) OVER w, 6) AS delta,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER
               (ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
                CURRENT ROW) AS DOUBLE), 6) AS running,
         CAST(row_number() OVER w AS INTEGER) AS rn
  FROM events WHERE event_type = 'purchase' AND value > 300
  WINDOW w AS (ORDER BY ts, event_id)
)
SELECT event_id, delta, running, rn FROM s WHERE rn <= 400
""",
    tags=("kql", "dialect", "window"),
)
def kql_serialized_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto serialized-window functions (round 7): after ``sort`` pins row
    order, ``prev()``/``next()``/``row_cumsum()``/``row_number()`` lower to
    lag/lead/running-sum/row_number with the sort keys re-stated in the
    OVER clause.  The running sum routes through a DECIMAL extend so both
    engines accumulate exactly; deltas are per-row IEEE (safe) rounded for
    symmetry."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        """
events
| where event_type == 'purchase' and value > 300
| extend dv = cast(value as decimal(38,6))
| sort by ts asc, event_id asc
| extend delta = value - prev(value), running = row_cumsum(dv),
         rn = row_number()
| where rn <= 400
| project event_id, delta, running, rn
""",
        dialect="kusto",
    )
    return df.select(
        "event_id",
        F.round("delta", 6).alias("delta"),
        F.round(F.col("running").cast("double"), 6).alias("running"),
        "rn",
    )


@register(
    "chsql_vocab_r14",
    oracle="""
SELECT s_suppkey,
       translate(regexp_replace(to_base64(encode(s_name)), '=+$', ''),
                 '+/', '-_') AS b64u,
       levenshtein(s_name, reverse(s_name)) AS ed,
       CAST(CAST(s_acctbal AS DECIMAL(38,2)) AS VARCHAR) AS dstr
FROM supplier
""",
    tags=("chsql", "dialect", "vocab"),
)
def chsql_vocab_r14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 14 (TEXT path): ``base64URLEncode`` (RFC 4648 §5
    url-safe alphabet, unpadded — CH 24.6), ``editDistanceUTF8`` (Spark
    strings are UTF-8 already), ``toDecimalString`` (fixed-scale decimal
    text).  DuckDB replays the url-safe transform with translate +
    padding strip."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT s_suppkey,
               base64URLEncode(s_name) AS b64u,
               editDistanceUTF8(s_name, reverse(s_name)) AS ed,
               toDecimalString(s_acctbal, 2) AS dstr
        FROM supplier
        """,
    )


@register(
    "chsql_file_read",
    oracle="""
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n
FROM part GROUP BY p_brand ORDER BY p_brand
""",
    tags=("chsql", "dialect", "table-function"),
)
def chsql_file_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``file(path, Parquet)`` table function on the TEXT path (round 7):
    rewrites to Spark's direct-file read (``FROM parquet.`path```) so the
    scan gets normal pushdown/pruning — aggregated to prove the read is a
    first-class relation, and the oracle reads the same parquet through
    its pre-registered view."""
    return _run(
        spark,
        sf_dir,
        f"""
        SELECT p_brand, count() AS n
        FROM file('{sf_dir}/part.parquet', Parquet)
        GROUP BY p_brand ORDER BY p_brand
        """,
    )


@register(
    "kql_evaluate_pivot",
    oracle="""
SELECT user_id % 10 AS bucket,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
         AS purchase,
       CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
FROM events
GROUP BY bucket ORDER BY bucket
""",
    tags=("kql", "dialect"),
)
def kql_evaluate_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``evaluate pivot`` (round 7): lowered to Spark SQL's native
    PIVOT — the columnar cross-tab stays one hash aggregation (PIVOT is a
    grouped agg with per-value filters, no join, no transpose shuffle).
    Subset: the value list is explicit (Spark's PIVOT requires IN values;
    Kusto derives them from data — documented deviation).  NULL cells from
    absent combinations coalesce to 0 to match the COUNT FILTER oracle."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        """
events
| extend bucket = user_id % 10
| project bucket, event_type
| evaluate pivot(event_type, count(), 'click', 'purchase', 'view')
| sort by bucket asc
""",
        dialect="kusto",
    )
    return df.select(
        "bucket",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
            for c in ("click", "purchase", "view")
        ],
    )


@register(
    "kql_argmax_vocab",
    oracle="""
SELECT event_type,
       max_by(event_id, value) AS top_ev,
       min_by(event_id, value) AS low_ev,
       CAST(COUNT(DISTINCT CASE WHEN value > 100 THEN user_id END)
            AS BIGINT) AS dv
FROM events GROUP BY event_type ORDER BY event_type
""",
    tags=("kql", "dialect"),
)
def kql_argmax_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``arg_max``/``arg_min``/``dcountif`` (round 7): arg_* lower to
    max_by/min_by with the argument order swapped (Kusto: maximize-expr
    first, return-expr second), dcountif to a conditional DISTINCT count.
    Event values are distinct-enough doubles that the argmax winner is
    unique per group (no tie ambiguity in the fixture)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
events
| summarize top_ev = arg_max(value, event_id),
            low_ev = arg_min(value, event_id),
            dv = dcountif(user_id, value > 100)
    by event_type
| sort by event_type asc
""",
        dialect="kusto",
    )


@register(
    "kql_string_ops",
    oracle="""
SELECT CAST(SUM(CASE WHEN list_contains(
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> ''), 'the') THEN 1 ELSE 0 END)
            AS BIGINT) AS has_the,
       CAST(SUM(CASE WHEN lower(text) NOT LIKE '%the%' THEN 1 ELSE 0 END)
            AS BIGINT) AS not_contains,
       CAST(SUM(CASE WHEN lower(lang) = 'en' THEN 1 ELSE 0 END)
            AS BIGINT) AS ci_eq,
       CAST(SUM(CASE WHEN n_chars BETWEEN 100 AND 300 THEN 1 ELSE 0 END)
            AS BIGINT) AS in_range,
       CAST(SUM(CASE WHEN regexp_matches(text, '^[A-Z]') THEN 1 ELSE 0 END)
            AS BIGINT) AS caps,
       CAST(SUM(CASE WHEN lower(lang) IN ('en', 'fr') THEN 1 ELSE 0 END)
            AS BIGINT) AS langs
FROM documents WHERE doc_id < 500
""",
    tags=("kql", "dialect", "string-ops"),
)
def kql_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto string/range operators (round 7): ``has`` (case-insensitive
    WHOLE-TERM match — token membership, not substring), ``!contains``,
    ``=~`` (case-insensitive equality), ``between (a .. b)``,
    ``matches regex``, and ``in~`` — each lowered to the equivalent JVM
    predicate and counted via countif so one row certifies all six."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
documents
| where doc_id < 500
| summarize has_the = countif(text has 'the'),
            not_contains = countif(text !contains 'the'),
            ci_eq = countif(lang =~ 'EN'),
            in_range = countif(n_chars between (100 .. 300)),
            caps = countif(text matches regex '^[A-Z]'),
            langs = countif(lang in~ ('EN', 'fr'))
""",
        dialect="kusto",
    )


@register(
    "prql_let_bindings",
    oracle="""
WITH hi AS (
  SELECT * FROM orders WHERE o_totalprice > 150000
)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 6)
         AS total
FROM hi GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    tags=("prql", "dialect"),
)
def prql_let_bindings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRQL ``let`` statements (round 7): a scalar let substitutes as a
    macro, a tabular let (``let x = (from t | ...)``) binds a named
    relation that ``from``/set-ops resolve — mirroring the KQL statement
    support.  The double sum routes through a DECIMAL derive so both
    engines total exactly."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        """let floor_price = 150000
let hi = (from orders | filter o_totalprice > floor_price)
from hi
derive dv = cast(o_totalprice as decimal(38,6))
group {o_orderpriority} (aggregate {n = count this, total = sum dv})
sort {o_orderpriority}""",
        dialect="prql",
    )
    return df.select(
        "o_orderpriority",
        "n",
        F.round(F.col("total").cast("double"), 6).alias("total"),
    )


@register(
    "kql_getschema",
    oracle="""
SELECT * FROM (VALUES
  ('event_id', 0, 'System.Int64', 'long'),
  ('ts', 1, 'System.DateTime', 'datetime'),
  ('event_type', 2, 'System.String', 'string'),
  ('value', 3, 'System.Double', 'real'),
  ('dv', 4, 'System.Double', 'real'),
  ('tags', 5, 'System.Object', 'dynamic')
) t(ColumnName, ColumnOrdinal, DataType, ColumnType)
""",
    tags=("kql", "dialect", "introspection"),
)
def kql_getschema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``getschema`` (round 7): schema introspection mid-pipeline.
    It needs the resolved schema, so it lives at the ENGINE level — the
    prefix pipeline is transpiled and ANALYZED (never executed; the schema
    comes from the logical plan) and the Kusto introspection shape
    (ColumnName/ColumnOrdinal/DataType/ColumnType) is emitted.  The oracle
    pins the expected rows closed-form, covering the long/datetime/string/
    real/dynamic type mappings."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
events
| project event_id, ts, event_type, value
| extend dv = todouble(value), tags = pack_array('a', 'b')
| getschema
""",
        dialect="kusto",
    )


@register(
    "kql_scan_steps",
    oracle="""
WITH RECURSIVE base AS (
  SELECT user_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
m AS (
  SELECT user_id, 0 AS rn, 0 AS cur, CAST(0 AS BIGINT) AS mid,
         CAST(NULL AS TIMESTAMP) AS ts, CAST(NULL AS VARCHAR) AS event_type,
         FALSE AS emitted, CAST(0 AS BIGINT) AS emit_mid
  FROM (SELECT DISTINCT user_id FROM base)
  UNION ALL
  SELECT b.user_id, b.rn,
    CASE WHEN m.cur = 0 AND b.event_type = 'signup' THEN 1
         WHEN m.cur = 1 AND b.event_type = 'click' THEN 2
         WHEN m.cur = 2 AND b.event_type = 'purchase' THEN 0
         ELSE m.cur END,
    CASE WHEN m.cur = 2 AND b.event_type = 'purchase' THEN m.mid + 1
         ELSE m.mid END,
    b.ts, b.event_type,
    (m.cur = 0 AND b.event_type = 'signup')
      OR (m.cur = 1 AND b.event_type = 'click')
      OR (m.cur = 2 AND b.event_type = 'purchase'),
    m.mid
  FROM m JOIN base b ON b.user_id = m.user_id AND b.rn = m.rn + 1
)
SELECT user_id, ts, event_type, emit_mid AS m
FROM m WHERE emitted ORDER BY user_id, ts
""",
    tags=("kql", "dialect", "scan", "funnel"),
)
def kql_scan_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``scan`` (round 8) — the stateful row machine, linear-pattern
    subset, in its scalable per-key form via ``partition by``: one greedy
    machine per user walks signup→click→purchase; each matched row is
    emitted with its match ordinal (``with_match_id``).  Lowering: the
    subpipeline's sort serializes rows inside a per-key window, the machine
    is ONE JVM ``aggregate`` fold over the sorted row array, and matches
    explode in place — a single exchange total (pytest plan-gated; the
    driver-level alternative would collect per key).  The oracle replays
    the identical machine as a DuckDB recursive CTE stepping one row rank
    at a time, so greedy-advance semantics are pinned exactly, not
    approximated."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
events
| partition by user_id (
    sort by ts asc, event_id asc
    | scan with_match_id=m with (
        step s1: event_type == 'signup';
        step s2: event_type == 'click';
        step s3: event_type == 'purchase'))
| project user_id, ts, event_type, m
""",
        dialect="kusto",
    )


@register(
    "kql_scan_concurrent",
    oracle="""
WITH RECURSIVE base AS (
  SELECT user_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
m AS (
  SELECT user_id, 0 AS rn, CAST(0 AS BIGINT) AS seq,
         CAST(NULL AS BIGINT) AS s1_mid,
         CAST(NULL AS BIGINT) AS s2_mid, CAST(0 AS BIGINT) AS s2_cnt,
         CAST(NULL AS TIMESTAMP) AS ts, CAST(NULL AS VARCHAR) AS event_type,
         CAST(NULL AS VARCHAR) AS estep,
         CAST(0 AS BIGINT) AS emid, CAST(0 AS BIGINT) AS ecnt
  FROM (SELECT DISTINCT user_id FROM base)
  UNION ALL
  SELECT b.user_id, b.rn,
    m.seq + CASE WHEN (m.s1_mid IS NULL
                       OR (m.s1_mid IS NOT NULL
                           AND b.event_type IN ('click', 'purchase')))
                      AND b.event_type = 'signup' THEN 1 ELSE 0 END,
    CASE WHEN m.s1_mid IS NOT NULL
              AND NOT (b.event_type IN ('click', 'purchase'))
         THEN m.s1_mid
         WHEN b.event_type = 'signup' THEN m.seq
         ELSE NULL END,
    CASE WHEN m.s1_mid IS NOT NULL
              AND b.event_type IN ('click', 'purchase') THEN m.s1_mid
         ELSE m.s2_mid END,
    CASE WHEN m.s1_mid IS NOT NULL
              AND b.event_type IN ('click', 'purchase') THEN 1
         WHEN m.s2_mid IS NOT NULL
              AND b.event_type IN ('click', 'purchase') THEN m.s2_cnt + 1
         ELSE m.s2_cnt END,
    b.ts, b.event_type,
    CASE WHEN b.event_type = 'signup' THEN 'start'
         WHEN (m.s1_mid IS NOT NULL OR m.s2_mid IS NOT NULL)
              AND b.event_type IN ('click', 'purchase') THEN 'act'
         ELSE NULL END,
    CASE WHEN b.event_type = 'signup'
              AND m.s1_mid IS NOT NULL THEN m.s1_mid
         WHEN b.event_type = 'signup' THEN m.seq
         WHEN m.s1_mid IS NOT NULL
              AND b.event_type IN ('click', 'purchase') THEN m.s1_mid
         WHEN m.s2_mid IS NOT NULL THEN m.s2_mid
         ELSE 0 END,
    CASE WHEN b.event_type = 'signup' THEN 0
         WHEN m.s1_mid IS NOT NULL
              AND b.event_type IN ('click', 'purchase') THEN 1
         WHEN m.s2_mid IS NOT NULL
              AND b.event_type IN ('click', 'purchase') THEN m.s2_cnt + 1
         ELSE 0 END
  FROM m JOIN base b ON b.user_id = m.user_id AND b.rn = m.rn + 1
)
SELECT user_id, ts, event_type, emid AS m, ecnt AS cnt
FROM m WHERE estep IS NOT NULL ORDER BY user_id, ts
""",
    tags=("kql", "dialect", "scan", "funnel"),
)
def kql_scan_concurrent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``scan kind=concurrent`` (round 9) — the Kusto-FAITHFUL machine set
    (the bare-scan greedy machine remains the documented linear subset):
    at most one active sequence per step; a signup starts a new sequence
    only when slot 1 is free (otherwise it's absorbed); a click/purchase
    PROMOTES the slot-1 sequence — replacing whatever sequence already sat
    at slot 2 — or is absorbed into the slot-2 sequence, accumulating the
    declared counter; sequences never retire, and match_id is unique per
    sequence (assigned at creation).  Same plan shape as the greedy scan:
    ONE exchange (the per-key window; the machine set is a single JVM
    aggregate fold).  The oracle replays the full promotion/absorption/
    replacement rule set as a DuckDB recursive CTE stepping one row rank
    at a time."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
events
| partition by user_id (
    sort by ts asc, event_id asc
    | scan kind=concurrent with_match_id=m declare (cnt: long = 0) with (
        step start: event_type == 'signup';
        step act: event_type == 'click' or event_type == 'purchase'
          => cnt = cnt + 1))
| project user_id, ts, event_type, m, cnt
""",
        dialect="kusto",
    )


@register(
    "kql_parse_kv",
    oracle="""
SELECT event_id, event_type AS type, value AS val, event_id AS id,
       CAST(NULL AS BIGINT) AS missing
FROM events WHERE event_id < 500 ORDER BY event_id
""",
    tags=("kql", "dialect", "parse"),
)
def kql_parse_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``parse-kv`` (round 9) — the log-analytics key-value
    extraction operator in its delimited mode: ONE str_to_map over the
    source string (delimiters regex-escaped), one typed element_at per
    declared key — whole-stage codegen, no per-key rescans, no UDF.  The
    kv string is rendered from the row's own columns, so parsing it back
    is the identity and the oracle pins the source values directly (the
    datetime_best_effort round-trip pattern); a declared key absent from
    the string yields NULL."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
events
| where event_id < 500
| extend kv = strcat('type=', event_type, ' val=', tostring(value),
                     ' id=', tostring(event_id))
| parse-kv kv as (type: string, val: real, id: long, missing: long)
| project event_id, type, val, id, missing
| sort by event_id asc
""",
        dialect="kusto",
    )


@register(
    "kql_series_periods",
    oracle="""
SELECT event_type,
       CAST([4, 8, 16][1 + length(event_type) % 3] AS DOUBLE) AS period,
       CAST([4, 8, 16][1 + length(event_type) % 3] AS DOUBLE) AS detected
FROM (SELECT DISTINCT event_type FROM events)
ORDER BY event_type
""",
    tags=("kql", "dialect", "timeseries", "udf"),
)
def kql_series_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``series_periods_detect`` on the KQL surface (round 9): lowers to
    the same Arrow FFT kernel as CH's seriesPeriodDetectFFT (dominant
    spectral period; subset — Kusto returns (periods, scores) arrays).
    The planted sinusoid's period divides the 64-sample window, so the
    spectral peak is exact and the oracle closed-forms it."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
events
| distinct event_type
| extend period = todouble(element_at(array(4, 8, 16),
                                      1 + strlen(event_type) % 3))
| extend detected = series_periods_detect(
    transform(sequence(0, 63), __i -> sin(2 * pi() * __i / period)))
| project event_type, period, detected
| sort by event_type asc
""",
        dialect="kusto",
    )


@register(
    "kql_scalar_vocab2",
    oracle="""
SELECT event_id,
  CASE WHEN abs(event_id * 1536) >= 1048576
       THEN printf('%.2f', (event_id * 1536) / 1048576.0) || ' MB'
       WHEN abs(event_id * 1536) >= 1024
       THEN printf('%.2f', (event_id * 1536) / 1024.0) || ' KB'
       ELSE printf('%.2f', CAST(event_id * 1536 AS DOUBLE)) || ' Bytes'
       END AS fb,
  '00000001' || lpad(CAST(event_id % 20 AS VARCHAR), 8, '0')
    || '0000000300000000' AS pv,
  'cab' AS ts_res,
  'abc' AS te_res,
  TRUE AS priv, FALSE AS pub, TRUE AS inr, TRUE AS inr2,
  round(2 * 6371000.0 * asin(least(1.0, sqrt(
    pow(sin(radians(10.0 - 48.8) / 2), 2)
    + cos(radians(48.8)) * cos(radians(10.0))
    * pow(sin(radians(CAST(event_id % 90 AS DOUBLE) - 2.3) / 2), 2)
  ))), 3) AS gd,
  'ex' || CAST(event_id % 5 AS VARCHAR) || '.org' AS host,
  '84' || CAST(event_id % 10 AS VARCHAR) AS port,
  'user' AS uname, 'frag' AS frag,
  'file' || CAST(event_id % 7 AS VARCHAR) || '.txt' AS fn,
  'txt' AS ext,
  '/a/b/file' || CAST(event_id % 7 AS VARCHAR) || '.txt' AS upath
FROM events WHERE event_id < 300 ORDER BY event_id
""",
    tags=("kql", "dialect", "vocabulary"),
)
def kql_scalar_vocab2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto scalar batch 2 (round 9, the log-analytics tier):
    ``format_bytes`` (literal precision), ``parse_version`` (zero-padded
    comparable string — documented deviation from Kusto's decimal),
    ``trim_start``/``trim_end`` (anchored regexp_replace),
    ``ipv4_is_private`` (RFC-1918) / ``ipv4_is_in_range`` (prefix shift
    compare), ``geo_distance_2points`` (spherical haversine meters —
    Kusto's WGS84 geodesic deviates ≤0.5%, documented), ``parse_url`` /
    ``parse_path`` (struct subsets over Spark's parse_url / split
    arithmetic).  Every value is re-derived in the oracle from the same
    rendered inputs — closed forms, not replays of the lowering."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
events
| where event_id < 300
| extend url = strcat('https://user:pw@ex', tostring(event_id % 5), '.org:84',
                      tostring(event_id % 10), '/a/b/file',
                      tostring(event_id % 7), '.txt?q=1#frag')
| extend pu = parse_url(url),
         pp = parse_path(strcat('/a/b/file', tostring(event_id % 7), '.txt')),
         ip = strcat('10.', tostring(event_id % 256), '.0.1'),
         ip2 = strcat('11.', tostring(event_id % 256), '.0.1')
| project event_id,
    fb = format_bytes(event_id * 1536, 2),
    pv = parse_version(strcat('1.', tostring(event_id % 20), '.3')),
    ts_res = trim_start('ab+', 'abbbcab'),
    te_res = trim_end('b+c', 'abcbbc'),
    priv = ipv4_is_private(ip),
    pub = ipv4_is_private(ip2),
    inr = ipv4_is_in_range(ip, '10.0.0.0/8'),
    inr2 = ipv4_is_in_range(ip2, strcat('11.', tostring(event_id % 256),
                                        '.0.0/16')),
    gd = round(geo_distance_2points(2.3, 48.8,
                                    todouble(event_id % 90), 10.0), 3),
    host = pu.Host, port = pu.Port, uname = pu.Username, frag = pu.Fragment,
    fn = pp.Filename, ext = pp.Extension, upath = pu.Path
| sort by event_id asc
""",
        dialect="kusto",
    )


@register(
    "kql_sliding_window",
    oracle="""
WITH b0 AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) * 86400 AS b0
  FROM events WHERE ts IS NOT NULL),
mx AS (SELECT max(b0) AS m FROM b0),
e AS (
  SELECT user_id, unnest(generate_series(b0, b0 + 2 * 86400, 86400)) AS b
  FROM b0)
SELECT make_timestamp(b * 1000000) AS ts,
       CAST(COUNT(*) AS BIGINT) AS Count,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS Dcount
FROM e, mx WHERE b <= m GROUP BY b ORDER BY ts
""",
    tags=("kql", "dialect", "timeseries"),
)
def kql_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate sliding_window_counts`` (round 9): rows and distinct
    users per 1d bin over a trailing 3d window — the Kusto activity
    plugin.  Lowered to bounded fan-out (each row explodes into the
    lookback/bin = 3 bins it covers) + ONE hash aggregate, never a range
    join; phantom tail bins cut by a 1-row max subquery.  The oracle
    replays the identical bin cover with generate_series."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
events
| evaluate sliding_window_counts(user_id, ts, 3d, 1d)
| sort by ts asc
""",
        dialect="kusto",
    )


@register(
    "kql_activity_metrics",
    oracle="""
WITH e AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / 604800) AS BIGINT) * 604800 AS b
  FROM events WHERE ts IS NOT NULL),
g AS (SELECT b, user_id, COUNT(*) AS n FROM e GROUP BY b, user_id),
f AS (SELECT *, min(b) OVER (PARTITION BY user_id) AS fb FROM g),
a AS (SELECT b, SUM(n) AS cnt, COUNT(*) AS dc,
             SUM(CASE WHEN fb = b THEN 1 ELSE 0 END) AS nd
      FROM f GROUP BY b)
SELECT make_timestamp(b * 1000000) AS ts,
       CAST(cnt AS BIGINT) AS count,
       CAST(dc AS BIGINT) AS dcount,
       CAST(nd AS BIGINT) AS new_dcount,
       CAST(SUM(nd) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS aggregated_dcount
FROM a ORDER BY ts
""",
    tags=("kql", "dialect", "timeseries"),
)
def kql_activity_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate activity_counts_metrics`` (round 9): per 7d bin — row
    count, distinct users, first-seen users, cumulative distinct users.
    One (bin, id) pre-agg carrying each id's first bin via a window min,
    one bin aggregate, and the cumulative distinct as a running sum of
    new_dcount over the #bins rows (never a rescan — the growth-analytics
    shape at any corpus size).  The oracle replays the identical
    formulation."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
events
| evaluate activity_counts_metrics(user_id, ts, 7d)
| sort by ts asc
""",
        dialect="kusto",
    )


@register(
    "kql_retention_cohort",
    oracle="""
WITH e AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / 604800) AS BIGINT) * 604800 AS b
  FROM events WHERE ts IS NOT NULL),
d AS (SELECT DISTINCT user_id, b FROM e),
c AS (SELECT user_id, min(b) AS c0 FROM d GROUP BY user_id),
cs AS (SELECT c0, COUNT(*) AS n FROM c GROUP BY c0)
SELECT make_timestamp(c.c0 * 1000000) AS from_ts,
       make_timestamp(d.b * 1000000) AS to_ts,
       CAST(cs.n AS BIGINT) AS cohort_size,
       CAST(COUNT(*) AS BIGINT) AS dcount_retained,
       round(COUNT(*) / CAST(cs.n AS DOUBLE), 6) AS retention_rate
FROM d JOIN c USING (user_id) JOIN cs ON c.c0 = cs.c0
GROUP BY c.c0, d.b, cs.n
ORDER BY from_ts, to_ts
""",
    tags=("kql", "dialect", "timeseries"),
)
def kql_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate new_activity_metrics`` subset (round 9): cohort
    retention — per (first-seen bin, activity bin): cohort size, retained
    distinct users, retention rate.  One (bin, id) distinct pre-agg with
    a window-min cohort, one (cohort, bin) aggregate, a #cohorts-row
    cohort-size join — the product-analytics retention matrix at any
    scale.  The oracle replays the identical formulation."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
events
| evaluate new_activity_metrics(user_id, ts, 7d)
| sort by from_ts asc, to_ts asc
""",
        dialect="kusto",
    )


@register(
    "kql_funnel_sequence",
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER w AS prev,
         lead(event_type, 2) OVER w AS next,
         lead(event_type, 1) OVER w AS n1
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT prev, next, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dcount
FROM s WHERE event_type = 'signup' AND n1 = 'click'
GROUP BY prev, next ORDER BY prev, next
""",
    tags=("kql", "dialect", "funnel"),
)
def kql_funnel_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate funnel_sequence`` (round 9): for every consecutive
    signup→click occurrence per user (serialized by ts), the distribution
    of states immediately before and after — ONE per-id window pass (lag
    1 + lead k share the sort) and a (prev, next) hash aggregate; no
    joins, no explode.  The oracle replays the identical window
    formulation."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
events
| where isnotnull(ts)
| sort by ts asc, event_id asc
| evaluate funnel_sequence(user_id, ts, event_type,
                           dynamic(['signup', 'click']))
| sort by prev asc, next asc
""",
        dialect="kusto",
    )


@register(
    "kql_rows_near",
    oracle="""
WITH s AS (
  SELECT event_id, event_type,
         row_number() OVER (ORDER BY event_id) AS rn
  FROM events WHERE event_id < 2000)
SELECT event_id, event_type
FROM s
WHERE EXISTS (SELECT 1 FROM s m
              WHERE m.event_type = 'error'
                AND s.rn BETWEEN m.rn - 2 AND m.rn + 1)
ORDER BY event_id
""",
    tags=("kql", "dialect", "log-analytics"),
)
def kql_rows_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate rows_near`` (round 10, lowered round 9 at kql.py): the
    investigate-around-an-error tier — keep every row within 2 before /
    1 after any ``error`` in serialized order.  Lowers to ONE max window
    over the match flag (no self-join); the oracle is the independent
    correlated-EXISTS formulation over row_number."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
events
| where event_id < 2000
| sort by event_id asc
| evaluate rows_near(event_type == 'error', 2, 1)
| project event_id, event_type
| sort by event_id asc
""",
        dialect="kusto",
    )


@register(
    "kql_scalar_vocab3",
    oracle="""
WITH s AS (
  SELECT event_id,
         TIMESTAMP '2024-03-05 10:20:30'
           + (event_id % 48) * INTERVAL 1 HOUR AS td
  FROM events WHERE event_id < 300)
SELECT event_id,
  'a-' || CAST(event_id % 7 AS VARCHAR) || '-z' AS sd,
  FALSE AS ne1, TRUE AS ne2,
  'bANANa' AS rs,
  'id#x#' AS rr,
  CAST(event_id % 5 AS DOUBLE) + 0.25 AS tr,
  TRUE AS tb, CAST(NULL AS BOOLEAN) AS tbn,
  td,
  make_timestamp(2024, 3, event_id % 27 + 1, 6, 30, 15) AS md,
  TIMESTAMP '2024-01-01 00:00:00' + (event_id % 10) * INTERVAL 1 DAY AS da,
  3.0 + floor((CAST(event_id AS DOUBLE) - 3.0) / 7.0) * 7.0 AS ba,
  CAST(month(td) AS BIGINT) AS my,
  CAST(date_trunc('day', td) AS TIMESTAMP) AS sod,
  CAST(date_trunc('week', td + INTERVAL 1 DAY) AS TIMESTAMP)
    - INTERVAL 1 DAY AS sow,
  CAST(date_trunc('month', td) AS TIMESTAMP) AS som,
  CAST(date_trunc('year', td) AS TIMESTAMP) AS soy,
  CAST(date_trunc('day', td) AS TIMESTAMP) + INTERVAL 1 DAY
    - INTERVAL 1 MICROSECOND AS eod,
  CAST(date_trunc('year', td) AS TIMESTAMP) + INTERVAL 1 YEAR
    - INTERVAL 1 MICROSECOND AS eoy
FROM s ORDER BY event_id
""",
    tags=("kql", "dialect", "vocabulary"),
)
def kql_scalar_vocab3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto scalar batch 3 (round 10 — the lowered-but-unregistered sweep):
    ``strcat_delim``, ``isnotempty``, ``replace_string``/``replace_regex``,
    ``toreal``/``tobool`` (try-cast: malformed → NULL, never an error),
    ``todatetime``/``make_datetime``/``datetime_add``, numeric ``bin_at``
    (origin-anchored binning), ``monthofyear``, and the day/week/month/year
    start-end family (Kusto weeks start SUNDAY — the +1d/−1d trick around
    Spark's Monday truncation).  All whole-stage-codegen scalar exprs, zero
    exchanges beyond the scan; the oracle re-derives every value in closed
    form."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
events
| where event_id < 300
| extend td = datetime_add('hour', event_id % 48,
                           todatetime('2024-03-05 10:20:30'))
| project event_id,
    sd = strcat_delim('-', 'a', tostring(event_id % 7), 'z'),
    ne1 = isnotempty(''), ne2 = isnotempty(tostring(event_id)),
    rs = replace_string('banana', 'an', 'AN'),
    rr = replace_regex(strcat('id', tostring(event_id % 10), 'x9'),
                       '[0-9]+', '#'),
    tr = toreal(strcat(tostring(event_id % 5), '.25')),
    tb = tobool('true'), tbn = tobool('nope'),
    td,
    md = make_datetime(2024, 3, event_id % 27 + 1, 6, 30, 15),
    da = datetime_add('day', event_id % 10,
                      todatetime('2024-01-01 00:00:00')),
    ba = todouble(bin_at(toreal(event_id), 7.0, 3.0)),
    my = tolong(monthofyear(td)),
    sod = startofday(td), sow = startofweek(td), som = startofmonth(td),
    soy = startofyear(td), eod = endofday(td), eoy = endofyear(td)
| sort by event_id asc
""",
        dialect="kusto",
    )


@register(
    "chsql_vocab_r26",
    oracle="""
WITH e AS (
  SELECT event_type, CAST(FLOOR(epoch(ts) / 86400) AS DOUBLE) AS d,
         value, event_id
  FROM events
), mm AS (
  SELECT event_type, min(d) AS mn, max(d) AS mx,
         CAST(SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS p,
         CAST(COUNT(*) % 500 AS DOUBLE) + 100.0 AS s2g
  FROM e GROUP BY event_type
), bsum AS (
  SELECT e.event_type,
         CAST(FLOOR((e.d - mm.mn) * 16 / (mm.mx - mm.mn + 1)) AS INTEGER)
           AS b,
         CAST(COUNT(*) AS DOUBLE) AS s
  FROM e JOIN mm USING (event_type) GROUP BY e.event_type, b
), mxs AS (
  SELECT event_type, max(s) AS mxv FROM bsum GROUP BY event_type
), grid AS (
  SELECT m.event_type, g.b, COALESCE(bsum.s, 0.0) AS s, m.mxv
  FROM mxs m CROSS JOIN (SELECT unnest(range(16)) AS b) g
  LEFT JOIN bsum ON bsum.event_type = m.event_type AND bsum.b = g.b
), bars AS (
  SELECT event_type,
         string_agg(
           CASE WHEN s <= 0 THEN ' '
                ELSE (['▁','▂','▃','▄','▅','▆','▇','█'])[
                  CAST(FLOOR((s * 8 - 1) / mxv) AS INTEGER) + 1]
           END, '' ORDER BY b) AS bar
  FROM grid GROUP BY event_type
)
SELECT mm.event_type, bars.bar,
  CAST(ceil(round(7.848879734349091
       * (p * (1 - p) + (p + 0.02) * (1 - p - 0.02)) / (0.02 * 0.02), 6))
    AS BIGINT) AS cn,
  round(p - 0.02, 6) AS clo, round(p + 0.02, 6) AS chi,
  CAST(ceil(round(2.0 * 7.848879734349091 * s2g
       / (0.05 * 120.0 * 0.05 * 120.0), 6)) AS BIGINT) AS kn,
  round(120.0 * 0.95, 6) AS klo, round(120.0 * 1.05, 6) AS khi
FROM mm JOIN bars ON mm.event_type = bars.event_type
ORDER BY mm.event_type
""",
    tags=("chsql", "dialect", "vocabulary", "aggregate", "presentation"),
)
def chsql_vocab_r26(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 26 (round 10): ``sparkbar(16)(day, 1)`` — the
    presentation aggregate as ONE group-local collect fold (empty bucket →
    space, 8-level blocks — the stats_q.sparkbar_daily arithmetic, so both
    tiers agree bit-for-bit), and the A/B planning scalars
    ``minSampleSizeConversion`` / ``minSampleSizeContinous`` returning
    CH's 3-tuples (accessed with ``tupleElement``).  Deterministic inputs:
    the conversion baseline is an exact rational (count ratio) and the
    continuous variance an exact small double, so ceil can't sit on a
    noise boundary (belt-and-braces round(6) inside the lowering too)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_type,
  sparkbar(16)(toRelativeDayNum(ts), 1) AS bar,
  toInt64(tupleElement(minSampleSizeConversion(
    countIf(value > 50) / toFloat64(count()), 0.02, 0.8, 0.05), 1)) AS cn,
  round(tupleElement(minSampleSizeConversion(
    countIf(value > 50) / toFloat64(count()), 0.02, 0.8, 0.05), 2), 6)
    AS clo,
  round(tupleElement(minSampleSizeConversion(
    countIf(value > 50) / toFloat64(count()), 0.02, 0.8, 0.05), 3), 6)
    AS chi,
  toInt64(tupleElement(minSampleSizeContinous(
    toFloat64(120), toFloat64(count() % 500) + 100.0, 0.05, 0.8, 0.05), 1))
    AS kn,
  round(tupleElement(minSampleSizeContinous(
    toFloat64(120), toFloat64(count() % 500) + 100.0, 0.05, 0.8, 0.05), 2), 6)
    AS klo,
  round(tupleElement(minSampleSizeContinous(
    toFloat64(120), toFloat64(count() % 500) + 100.0, 0.05, 0.8, 0.05), 3), 6)
    AS khi
FROM events GROUP BY event_type ORDER BY event_type
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r27",
    oracle="""
WITH s AS (
  SELECT event_id,
    TIMESTAMP '2024-03-05 10:20:30'
      + (event_id * 977 % 40000) * INTERVAL 1 SECOND AS td,
    TIMESTAMP '2024-03-05 10:20:30'
      + (event_id % 400) * INTERVAL 1 DAY AS td2
  FROM events WHERE event_id < 200)
SELECT event_id,
  CAST(month(td2) AS BIGINT) AS mo,
  CAST(hour(td) AS BIGINT) AS hr,
  CAST(second(td) AS BIGINT) AS se,
  CAST(dayofyear(td2) AS BIGINT) AS dy,
  CAST(date_trunc('year', td2) AS DATE) AS soy,
  CAST(date_trunc('quarter', td2) AS DATE) AS soq,
  CAST(date_trunc('hour', td) AS TIMESTAMP) AS soh,
  CAST(date_trunc('hour', td) AS TIMESTAMP)
    + (minute(td) // 10 * 10) * INTERVAL 1 MINUTE AS stm,
  CAST(date_trunc('minute', td) AS TIMESTAMP) AS smn,
  td2 + (1 + event_id % 3) * INTERVAL 1 YEAR AS ay,
  td2 + (event_id % 7) * INTERVAL 1 WEEK AS aw,
  td + (event_id % 23) * INTERVAL 1 HOUR AS ah,
  td + (event_id % 55) * INTERVAL 1 SECOND AS asx,
  td2 - (event_id % 2) * INTERVAL 1 YEAR AS sy,
  td2 - (event_id % 9) * INTERVAL 1 DAY AS sd,
  td - (event_id % 50) * INTERVAL 1 MINUTE AS sm2,
  CAST(strftime(td, '%Y%m%d%H%M%S') AS BIGINT) AS ymd,
  make_timestamp(2024, 3, event_id % 27 + 1, 5, 6, 7) AS mdt,
  td + (event_id % 3) * INTERVAL 1 DAY
     + (event_id % 5) * INTERVAL 1 HOUR AS iv,
  CAST(event_id % 90 - 45 AS BIGINT) AS i8c,
  CAST(event_id % 200 AS BIGINT) AS u8c,
  CAST(event_id * 3 AS BIGINT) AS u32c,
  round(CAST(event_id AS DOUBLE) / 8, 6) AS f32r,
  CAST(CAST(CAST(event_id AS DOUBLE) + 0.125 AS DECIMAL(9,3)) AS VARCHAR)
    AS dec3,
  CAST(CAST(CAST(event_id AS DOUBLE) / 8 AS DECIMAL(38,4)) AS VARCHAR)
    AS dec4,
  0 AS oz,
  CAST(NULL AS INTEGER) AS onl,
  1.5 AS fz,
  CAST(NULL AS DOUBLE) AS fnl,
  CAST(event_id AS BIGINT) AS an,
  CAST(event_id % 5 AS BIGINT) AS tn
FROM s ORDER BY event_id
""",
    tags=("chsql", "dialect", "vocabulary"),
)
def chsql_vocab_r27(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 27 (round 10 — the FUNC-table coverage sweep):
    datetime extraction (``toMonth/toHour/toSecond/toDayOfYear``), the
    truncation family (``toStartOfYear/Quarter/Hour/Minute/TenMinutes`` —
    Year/Quarter return DATE like CH), add/subtract arithmetic
    (``addYears/Weeks/Hours/Seconds``, ``subtractYears/Days/Minutes``),
    interval constructors (``toIntervalDay/Hour``), ``toYYYYMMDDhhmmss``,
    ``makeDateTime``, and the conversion tier: sized ints (normalized to
    Int64 for the driver hash), ``toFloat32``, ``toDecimal32/128``
    (rendered as strings at binary-exact scales), OrZero/OrNull try-casts,
    ``assumeNotNull``/``toNullable`` (identity lowerings — Spark columns
    are already nullable).  All whole-stage-codegen scalars; oracle in
    closed form."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH addSeconds(toDateTime('2024-03-05 10:20:30'),
                event_id * 977 % 40000) AS td,
     addDays(toDateTime('2024-03-05 10:20:30'), event_id % 400) AS td2
SELECT event_id,
  toInt64(toMonth(td2)) AS mo,
  toInt64(toHour(td)) AS hr,
  toInt64(toSecond(td)) AS se,
  toInt64(toDayOfYear(td2)) AS dy,
  toStartOfYear(td2) AS soy,
  toStartOfQuarter(td2) AS soq,
  toStartOfHour(td) AS soh,
  toStartOfTenMinutes(td) AS stm,
  toStartOfMinute(td) AS smn,
  addYears(td2, 1 + event_id % 3) AS ay,
  addWeeks(td2, event_id % 7) AS aw,
  addHours(td, event_id % 23) AS ah,
  addSeconds(td, event_id % 55) AS asx,
  subtractYears(td2, event_id % 2) AS sy,
  subtractDays(td2, event_id % 9) AS sd,
  subtractMinutes(td, event_id % 50) AS sm2,
  toYYYYMMDDhhmmss(td) AS ymd,
  makeDateTime(2024, 3, event_id % 27 + 1, 5, 6, 7) AS mdt,
  td + toIntervalDay(event_id % 3) + toIntervalHour(event_id % 5) AS iv,
  toInt64(toInt8(event_id % 90 - 45)) AS i8c,
  toInt64(toUInt8(event_id % 200)) AS u8c,
  toInt64(toUInt32(event_id * 3)) AS u32c,
  round(toFloat64(toFloat32(event_id)) / 8, 6) AS f32r,
  toString(toDecimal32(toFloat64(event_id) + 0.125, 3)) AS dec3,
  toString(toDecimal128(toFloat64(event_id) / 8, 4)) AS dec4,
  toInt32OrZero(concat('x', toString(event_id))) AS oz,
  toInt32OrNull('12x') AS onl,
  toFloat64OrZero('1.5') AS fz,
  toFloat64OrNull('abc') AS fnl,
  toInt64(assumeNotNull(nullIf(event_id, -1))) AS an,
  toInt64(toNullable(event_id % 5)) AS tn
FROM events WHERE event_id < 200 ORDER BY event_id
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r28",
    oracle="""
WITH s AS (
  SELECT event_id,
    [CAST(event_id % 5 + 1 AS DOUBLE), 3.0, 7.0] AS a,
    [2.0, 1.0, 5.0] AS b
  FROM events WHERE event_id < 200)
SELECT event_id,
  'bcd' AS sub,
  CAST(7 AS BIGINT) AS pci,
  'a\\.b\\*c\\?' AS rq,
  'pad' AS tb,
  'ab***' AS rp,
  'xbyd' AS tr,
  'Hello Spark World' AS ic,
  'plain' AS tv,
  'a,b,c' AS sbs,
  a[1] > 0 AND a[2] > 0 AND a[3] > 0 AS aa,
  '1,2,3' AS af,
  '1,2,9' AS pb,
  '0,1,2' AS pf,
  '1,2' AS ppb,
  '2,3' AS ppf,
  '3,7' AS ai,
  CAST(2 AS BIGINT) AS io,
  CAST(0 AS BIGINT) AS ea,
  '1,100' AS cc,
  CAST(event_id AS DOUBLE) + CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END
    AS rb,
  CASE WHEN event_id % 5 = 0 THEN 0
       ELSE CAST(event_id // (event_id % 5) AS BIGINT) END AS idz,
  round(pow(10.0, event_id % 3), 6) AS e10,
  CAST(pow(2, event_id % 10) AS BIGINT) AS ie2,
  -(CAST(event_id AS BIGINT) + 1) AS bn,
  round((CAST(event_id AS DOUBLE) + 0.5) / 2.0, 6) AS dd,
  round(abs(a[1] - 2.0) + abs(3.0 - 1.0) + abs(7.0 - 5.0), 6) AS l1,
  round(sqrt(pow(a[1] - 2.0, 2) + pow(3.0 - 1.0, 2) + pow(7.0 - 5.0, 2)),
        6) AS l2,
  round(greatest(abs(a[1] - 2.0), 2.0, 2.0), 6) AS li,
  round(1 - (a[1] * 2.0 + 3.0 * 1.0 + 7.0 * 5.0)
        / (sqrt(a[1] * a[1] + 9.0 + 49.0) * sqrt(4.0 + 1.0 + 25.0)), 6)
    AS cd
FROM s ORDER BY event_id
""",
    tags=("chsql", "dialect", "vocabulary"),
)
def chsql_vocab_r28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 28 (round 10 — FUNC-table sweep, part 2): UTF8
    string tier (``substringUTF8``, ``positionCaseInsensitiveUTF8``,
    ``regexpQuoteMeta``, ``trimBoth``, ``rightPadUTF8``, ``translateUTF8``,
    ``initcapUTF8``, ``toValidUTF8``, ``splitByString``), array editing
    (``arrayAll/Flatten/PushBack/PushFront/PopBack/PopFront/Intersect/
    Concat``, ``indexOf``, ``emptyArrayString`` — arrays rendered
    comma-joined per the driver-shape convention), math (``roundBankers``
    half-even, ``intDivOrZero``, ``exp10``, ``intExp2``, ``bitNot``,
    ``divideDecimal`` compared numerically), and the vector-distance
    family ``L1/L2/Linf/cosineDistance``.  Oracle re-derives every value
    in closed form."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH array(toFloat64(event_id % 5 + 1), 3.0, 7.0) AS a,
     array(2.0, 1.0, 5.0) AS b
SELECT event_id,
  substringUTF8('abcdef', 2, 3) AS sub,
  toInt64(positionCaseInsensitiveUTF8('Hello World', 'WORLD')) AS pci,
  regexpQuoteMeta('a.b*c?') AS rq,
  trimBoth('  pad  ') AS tb,
  rightPadUTF8('ab', 5, '*') AS rp,
  translateUTF8('abcd', 'ac', 'xy') AS tr,
  initcapUTF8('hello spark world') AS ic,
  toValidUTF8('plain') AS tv,
  arrayStringConcat(splitByString('--', 'a--b--c'), ',') AS sbs,
  arrayAll(x -> x > 0, a) AS aa,
  arrayStringConcat(arrayMap(x -> toString(x),
    arrayFlatten([[1, 2], [3]])), ',') AS af,
  arrayStringConcat(arrayMap(x -> toString(x),
    arrayPushBack([1, 2], 9)), ',') AS pb,
  arrayStringConcat(arrayMap(x -> toString(x),
    arrayPushFront([1, 2], 0)), ',') AS pf,
  arrayStringConcat(arrayMap(x -> toString(x),
    arrayPopBack([1, 2, 3])), ',') AS ppb,
  arrayStringConcat(arrayMap(x -> toString(x),
    arrayPopFront([1, 2, 3])), ',') AS ppf,
  arrayStringConcat(arrayMap(x -> toString(x),
    arraySort(arrayIntersect([1, 3, 7], [3, 7, 9]))), ',') AS ai,
  toInt64(indexOf([1, 3, 7], 3)) AS io,
  toInt64(size(emptyArrayString())) AS ea,
  arrayStringConcat(arrayMap(x -> toString(x),
    arrayConcat([1], [100])), ',') AS cc,
  roundBankers(toFloat64(event_id) + 0.5) AS rb,
  intDivOrZero(toInt64(event_id), toInt64(event_id % 5)) AS idz,
  round(exp10(toFloat64(event_id % 3)), 6) AS e10,
  intExp2(event_id % 10) AS ie2,
  bitNot(toInt64(event_id)) AS bn,
  round(toFloat64(divideDecimal(
    toDecimal64(toFloat64(event_id) + 0.5, 1), toDecimal64(2.0, 1))), 6)
    AS dd,
  round(L1Distance(a, b), 6) AS l1,
  round(L2Distance(a, b), 6) AS l2,
  round(LinfDistance(a, b), 6) AS li,
  round(cosineDistance(a, b), 6) AS cd
FROM events WHERE event_id < 200 ORDER BY event_id
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r29",
    oracle="""
WITH src AS (
  SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS q,
         CAST(l_extendedprice AS DOUBLE) AS p, l_linenumber
  FROM lineitem WHERE l_orderkey < 5000),
g AS (SELECT l_returnflag, avg(q) AS mu, COUNT(*) AS n,
             min(l_linenumber) AS mnl, max(l_linenumber) AS mxl
      FROM src GROUP BY l_returnflag)
SELECT s.l_returnflag,
  any_value(s.l_returnflag) AS al,
  min(s.q) AS mn, max(s.q) AS mx,
  round(avg(s.q), 6) AS av,
  any_value(s.l_returnflag) AS ao,
  CAST(sum(DISTINCT CAST(s.q AS BIGINT)) AS BIGINT) AS sdst,
  round(sqrt(sum(pow(s.q - g.mu, 2)) / any_value(g.n)), 6) AS sp,
  round((sum(pow(s.q - g.mu, 3)) / any_value(g.n))
        / pow(sum(pow(s.q - g.mu, 2)) / any_value(g.n), 1.5), 6) AS sk,
  CAST(count(CASE WHEN s.l_linenumber = g.mnl THEN 1 END)
    AS BIGINT) AS cam,
  round(avg(CASE WHEN s.l_linenumber = g.mnl THEN s.p END), 6) AS aam,
  min(CASE WHEN s.l_linenumber = g.mxl THEN s.p END) AS mam,
  any_value(s.l_returnflag) AS anm,
  any_value(s.l_returnflag) AS anx
FROM src s JOIN g USING (l_returnflag)
GROUP BY s.l_returnflag ORDER BY s.l_returnflag
""",
    tags=("chsql", "dialect", "vocabulary", "aggregate"),
)
def chsql_vocab_r29(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 29 (round 10 — FUNC-table sweep, aggregates):
    ``anyLast``/``anyOrNull`` (pinned to the group key so both engines see
    one value), ``minOrNull/maxOrNull/avgOrNull`` (Spark aggregates are
    already NULL-on-empty), ``sumDistinct``, ``stddevPop``, ``skewPop``
    (oracle recomputes the population moments from raw central sums —
    DuckDB's built-in skewness is the differently-biased SAMPLE form),
    and the -ArgMin/-ArgMax combinators ``countArgMin``, ``avgArgMin``,
    ``minArgMax``, ``anyArgMin``, ``anyArgMax`` (aggregate over the rows
    where the key attains its group extreme — replayed in the oracle as
    conditional aggregates against the per-group extreme)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT l_returnflag,
  anyLast(l_returnflag) AS al,
  minOrNull(toFloat64(l_quantity)) AS mn,
  maxOrNull(toFloat64(l_quantity)) AS mx,
  round(avgOrNull(toFloat64(l_quantity)), 6) AS av,
  anyOrNull(l_returnflag) AS ao,
  toInt64(sumDistinct(toInt64(l_quantity))) AS sdst,
  round(stddevPop(toFloat64(l_quantity)), 6) AS sp,
  round(skewPop(toFloat64(l_quantity)), 6) AS sk,
  toInt64(countArgMin(l_quantity, l_linenumber)) AS cam,
  round(avgArgMin(toFloat64(l_extendedprice), l_linenumber), 6) AS aam,
  minArgMax(toFloat64(l_extendedprice), l_linenumber) AS mam,
  anyArgMin(l_returnflag, l_linenumber) AS anm,
  anyArgMax(l_returnflag, l_linenumber) AS anx
FROM lineitem WHERE l_orderkey < 5000
GROUP BY l_returnflag ORDER BY l_returnflag
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r30",
    oracle="""
SELECT event_id,
  CAST(event_id % 9 AS DOUBLE) + 0.25 AS jfv,
  TRUE AS jb,
  CAST(3 AS BIGINT) AS jl,
  'bigint' AS tt,
  CAST(55 AS BIGINT) AS gs,
  '1,4' AS bx,
  CAST(1 AS BIGINT) AS bmn, CAST(7 AS BIGINT) AS bmx,
  '2,5' AS bta,
  TRUE AS htc,
  CAST(3 + event_id % 3 AS BIGINT) AS msv,
  'a:1;b:2' AS eag,
  'SELECT ? + ?  FROM t' AS nq,
  'hello' AS b64u,
  CAST(2 + 120 * CAST(pow(7, event_id % 5) AS BIGINT) AS BIGINT) AS h3n,
  CAST((1709634030000 - 1288834974657) * 4194304 AS BIGINT) AS sfid,
  TIMESTAMP '2024-03-05 10:20:30' AS sfts
FROM events WHERE event_id < 200 ORDER BY event_id
""",
    tags=("chsql", "dialect", "vocabulary"),
)
def chsql_vocab_r30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 30 (round 10 — FUNC-table sweep, part 3): JSON
    extraction (``JSONExtractFloat/Bool``, ``JSONLength``),
    ``toTypeName``, the ``generateSeries`` table function (scalar-subquery
    form), the plain-array bitmap tier (``bitmapXor/Min/Max/ToArray``),
    ``hasTokenCaseInsensitive``, ``mapSubtract`` (element access, no map
    in the output), ``extractAllGroupsVertical``, ``normalizeQuery``
    (comment/string/number fingerprinting), ``base64URLDecode``,
    ``h3GetNumCells``, and the Snowflake-ID pair ``dateTimeToSnowflakeID``
    / ``snowflakeIDToDateTime64`` (closed-form epoch arithmetic both
    ways).  Oracle re-derives every value."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_id,
  JSONExtractFloat(concat('{"v": ', toString(event_id % 9), '.25}'), 'v')
    AS jfv,
  JSONExtractBool('{"b": true}', 'b') AS jb,
  toInt64(JSONLength(concat('[1,2,', toString(event_id % 4), ']'))) AS jl,
  toTypeName(toInt64(event_id)) AS tt,
  toInt64((SELECT sum(generate_series) FROM generateSeries(1, 10))) AS gs,
  arrayStringConcat(arrayMap(x -> toString(x),
    bitmapXor([1, 2, 3], [2, 3, 4])), ',') AS bx,
  toInt64(bitmapMin([3, 1, 7])) AS bmn,
  toInt64(bitmapMax([3, 1, 7])) AS bmx,
  arrayStringConcat(arrayMap(x -> toString(x),
    arraySort(bitmapToArray([5, 2]))), ',') AS bta,
  hasTokenCaseInsensitive('Hello World Foo', 'WORLD') AS htc,
  toInt64(arrayElement(mapSubtract(
    map('a', toInt64(5 + event_id % 3)), map('a', toInt64(2))), 'a'))
    AS msv,
  arrayStringConcat(arrayMap(g -> concat(arrayElement(g, 1), ':', arrayElement(g, 2)),
    extractAllGroupsVertical('a=1, b=2', '(\\\\w)=(\\\\d)')), ';') AS eag,
  normalizeQuery('SELECT 12 + 3 /* note */ FROM t') AS nq,
  toString(base64URLDecode('aGVsbG8')) AS b64u,
  toInt64(h3GetNumCells(event_id % 5)) AS h3n,
  dateTimeToSnowflakeID(toDateTime('2024-03-05 10:20:30')) AS sfid,
  snowflakeIDToDateTime64(
    dateTimeToSnowflakeID(toDateTime('2024-03-05 10:20:30'))) AS sfts
FROM events WHERE event_id < 200 ORDER BY event_id
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r31",
    oracle="""
SELECT TRUE AS rc_ok, TRUE AS rn_ok, TRUE AS ru_ok, TRUE AS re_ok,
       TRUE AS shuf_ok, TRUE AS uuid_ok, TRUE AS today_ok,
       TRUE AS env_ok, TRUE AS hash_ok
""",
    tags=("chsql", "dialect", "vocabulary", "contract"),
)
def chsql_vocab_r31(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 31 (round 10): the NONDETERMINISTIC function tier
    under in-query accuracy contracts (the rows-only-to-contract pattern
    from round 2): ``randCanonical/randNormal/randUniform/randExponential``
    (moment bounds many σ wide at the smallest fixture), ``arrayShuffle``
    (multiset invariance), ``generateUUIDv4`` (v4 format + per-row
    uniqueness), ``today/yesterday/nowInBlock`` (calendar identities
    against now()), the environment constants
    ``currentDatabase/currentUser/hostName/version``, and
    ``sipHash64``/``farmHash64`` determinism + discrimination (values are
    engine-specific by documented deviation — the CONTRACT is checked, so
    the driver hash still gates it)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH s AS (
  SELECT event_id,
         randCanonical() AS rc,
         randNormal(10.0, 2.0) AS rn,
         randUniform(5.0, 9.0) AS ru,
         randExponential(2.0) AS re,
         arrayShuffle([3, 1, 2]) AS sh,
         toString(generateUUIDv4()) AS u
  FROM events)
SELECT
  min(rc) >= 0 AND max(rc) < 1 AND avg(rc) BETWEEN 0.42 AND 0.58 AS rc_ok,
  abs(avg(rn) - 10.0) < 0.5 AND stddevPop(rn) BETWEEN 1.6 AND 2.4 AS rn_ok,
  min(ru) >= 5 AND max(ru) < 9 AND abs(avg(ru) - 7.0) < 0.4 AS ru_ok,
  abs(avg(re) - 0.5) < 0.15 AND min(re) >= 0 AS re_ok,
  min(IF(arraySort(sh) = [1, 2, 3], 1, 0)) = 1 AS shuf_ok,
  count(DISTINCT u) = count()
    AND min(IF(match(u, '^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab]'
                      || '[0-9a-f]{3}-[0-9a-f]{12}$'), 1, 0)) = 1 AS uuid_ok,
  yesterday() = today() - 1 AND today() = toDate(now())
    AND abs(dateDiff('second', nowInBlock(), now())) < 300 AS today_ok,
  currentDatabase() = 'default' AND currentUser() = 'default'
    AND hostName() != '' AND version() LIKE '25.7%' AS env_ok,
  sipHash64('abc') = sipHash64('abc')
    AND sipHash64('abc') != sipHash64('abd')
    AND farmHash64('xy') = farmHash64('xy') AS hash_ok
FROM s
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r32",
    oracle="""
WITH s AS (
  SELECT event_id,
    TIMESTAMP '2024-03-05 10:20:30'
      + (event_id % 100) * INTERVAL 1 MINUTE AS td
  FROM events WHERE event_id < 200)
SELECT event_id,
  td + INTERVAL 1 YEAR AS ty,
  td + 2 * INTERVAL 1 MONTH AS tmo,
  td + (event_id % 3) * INTERVAL 1 WEEK AS tw,
  td + 30 * INTERVAL 1 MINUTE AS tmi,
  td + 45 * INTERVAL 1 SECOND AS tsec,
  CAST(FLOOR(epoch(td) / 3600) AS BIGINT) AS trh,
  round(1.5 * 2.5, 6) AS md2,
  td + 3 * INTERVAL 1 HOUR AS ta,
  TRUE AS uh_ok,
  '25.7.4.11-compat-spark' AS sv
FROM s ORDER BY event_id
""",
    tags=("chsql", "dialect", "vocabulary"),
)
def chsql_vocab_r32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 32 (round 10 — FUNC-table sweep, closing the
    tail): the remaining interval constructors ``toIntervalYear/Month/
    Week/Minute/Second``, ``toRelativeHourNum``, ``multiplyDecimal``
    (numeric compare), ``timestampAdd`` (unit-literal form),
    ``uniqHLL12`` under a ±5% accuracy contract over numbers(), and
    ``serverVersion``.  With this batch every deterministic FUNC-table
    lowering carries an oracle-backed registry query (leftovers are
    intentional: caseWithExpression is unsupported-by-design,
    normalizedQueryHash's value is engine-specific with normalizeQuery
    oracle-covered, minSampleSizeContinuous is a spelling alias)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH addMinutes(toDateTime('2024-03-05 10:20:30'), event_id % 100) AS td
SELECT event_id,
  td + toIntervalYear(1) AS ty,
  td + toIntervalMonth(2) AS tmo,
  td + toIntervalWeek(event_id % 3) AS tw,
  td + toIntervalMinute(30) AS tmi,
  td + toIntervalSecond(45) AS tsec,
  toInt64(toRelativeHourNum(td)) AS trh,
  round(toFloat64(multiplyDecimal(toDecimal64(1.5, 1),
                                  toDecimal64(2.5, 1))), 6) AS md2,
  timestampAdd('HOUR', 3, td) AS ta,
  abs(toInt64((SELECT uniqHLL12(number) FROM numbers(1000)))
      - 1000) <= 50 AS uh_ok,
  serverVersion() AS sv
FROM events WHERE event_id < 200 ORDER BY event_id
""",
        dialect="clickhouse",
    )


@register(
    "chsql_funnel_text",
    oracle="""
WITH b AS (
  SELECT user_id,
    max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS h1,
    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS h2,
    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS h3,
    min(CASE WHEN event_type = 'view' THEN event_id END) AS mv,
    max(CASE WHEN event_type = 'click' THEN event_id END) AS xc,
    min(CASE WHEN event_type = 'signup' THEN event_id END) AS ms,
    max(CASE WHEN event_type = 'purchase' THEN event_id END) AS xp
  FROM events GROUP BY user_id),
t AS (
  SELECT user_id, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
           AS prev_et
  FROM events WHERE event_type IN ('view', 'click')),
sc AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'click' AND prev_et = 'view'
                       THEN 1 ELSE 0 END) AS BIGINT) AS sc
  FROM t GROUP BY user_id)
SELECT b.user_id,
  CAST(h1 AS VARCHAR) || ',' || CAST(h1 * h2 AS VARCHAR) || ','
    || CAST(h1 * h3 AS VARCHAR) AS ret,
  CAST(CASE WHEN mv < xc THEN 1 ELSE 0 END AS BIGINT) AS sm,
  CAST(CASE WHEN EXISTS (SELECT 1 FROM events e
        WHERE e.user_id = b.user_id AND e.event_type = 'click'
          AND e.event_id > b.ms AND e.event_id < b.xp)
    THEN 1 ELSE 0 END AS BIGINT) AS sm3,
  COALESCE(sc.sc, 0) AS sc
FROM b LEFT JOIN sc ON sc.user_id = b.user_id
ORDER BY b.user_id
""",
    tags=("chsql", "dialect", "funnel", "aggregate"),
)
def chsql_funnel_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CH funnel aggregates on the TEXT path (round 10):
    ``retention`` (cohort bits — NOT sequenced, per upstream docs),
    ``sequenceMatch('(?1).*(?2)')`` / 3-step form, and
    ``sequenceCount('(?1).*(?2)')`` (greedy NON-overlapping) — the
    pattern subset is '.*'-separated condition refs; adjacency and time
    constraints stay on the DataFrame tier (operators/funnel.py).  Each
    lowers to ONE sorted-collect fold per group (event_id passed as the
    sequence key: unique, so tie order is deterministic — CH leaves
    equal-timestamp order unspecified).  The oracle is INDEPENDENT per
    aggregate: retention via max-bits, 2-step match via min(view) <
    max(click), 3-step via a click-between-extremes EXISTS, count via the
    run-transition identity (greedy non-overlap count = adjacent
    view→click pairs in the type-filtered sequence)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT user_id,
  arrayStringConcat(arrayMap(x -> toString(x),
    retention(event_type = 'signup', event_type = 'click',
              event_type = 'purchase')), ',') AS ret,
  toInt64(sequenceMatch('(?1).*(?2)')(toInt64(event_id),
    event_type = 'view', event_type = 'click')) AS sm,
  toInt64(sequenceMatch('(?1).*(?2).*(?3)')(toInt64(event_id),
    event_type = 'signup', event_type = 'click',
    event_type = 'purchase')) AS sm3,
  toInt64(sequenceCount('(?1).*(?2)')(toInt64(event_id),
    event_type = 'view', event_type = 'click')) AS sc
FROM events GROUP BY user_id ORDER BY user_id
""",
        dialect="clickhouse",
    )


@register(
    "chsql_window_funnel_text",
    oracle="""
WITH e AS (
  SELECT user_id, event_type,
         CAST(FLOOR(epoch(ts)) AS DOUBLE) * 1000000
           + event_id % 1000000 AS tsk
  FROM events WHERE event_id < 5000),
b AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS h1
  FROM e GROUP BY user_id),
l2 AS (
  SELECT DISTINCT s.user_id
  FROM e s JOIN e c ON c.user_id = s.user_id
  WHERE s.event_type = 'signup' AND c.event_type = 'click'
    AND c.tsk >= s.tsk AND c.tsk - s.tsk <= 604800000000.0),
l3 AS (
  SELECT DISTINCT s.user_id
  FROM e s
  JOIN e c ON c.user_id = s.user_id
  JOIN e p ON p.user_id = s.user_id
  WHERE s.event_type = 'signup' AND c.event_type = 'click'
    AND p.event_type = 'purchase'
    AND c.tsk >= s.tsk AND p.tsk >= c.tsk
    AND p.tsk - s.tsk <= 604800000000.0)
SELECT b.user_id,
  CAST(CASE WHEN l3.user_id IS NOT NULL THEN 3
            WHEN l2.user_id IS NOT NULL THEN 2
            WHEN h1 = 1 THEN 1 ELSE 0 END AS BIGINT) AS lvl
FROM b LEFT JOIN l2 ON l2.user_id = b.user_id
LEFT JOIN l3 ON l3.user_id = b.user_id
ORDER BY b.user_id
""",
    tags=("chsql", "dialect", "funnel", "aggregate"),
)
def chsql_window_funnel_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``windowFunnel(7d)`` on the TEXT path (round 10): max signup→click
    →purchase level within a 7-day window, as ONE sorted-collect fold
    whose state is the LATEST chain-start per level (existence-optimal by
    exchange — see the lowering docstring).  The sequence key is
    epoch-micros + event_id, unique, so tie order is deterministic on
    both engines.  The oracle is the INDEPENDENT existence formulation:
    level-k membership via k-way self-joins with the window predicate —
    parity proves the greedy fold computes exactly 'a chain exists'."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH toFloat64(toUnixTimestamp(ts)) * 1000000 + event_id % 1000000 AS tsk
SELECT user_id,
  toInt64(windowFunnel(604800000000.0)(tsk,
    event_type = 'signup', event_type = 'click',
    event_type = 'purchase')) AS lvl
FROM events WHERE event_id < 5000 GROUP BY user_id ORDER BY user_id
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r33",
    oracle="""
WITH s AS (
  SELECT event_id,
    'https://news.example.com.tr:84/p/q?x=1#frag' AS u,
    TIMESTAMP '2024-03-05 10:20:30.456'
      + (event_id % 40) * INTERVAL 1 DAY AS td
  FROM events WHERE event_id < 200)
SELECT event_id,
  'pad' AS tl, 'pad' AS trr,
  'ab***' AS rp,
  CAST(event_id % 10 AS VARCHAR) AS rex,
  'UP' AS up,
  CAST(date_trunc('week', td + INTERVAL 1 DAY) AS DATE) + 5 AS ldw,
  CAST(456 AS INTEGER) AS ms,
  'a,b' AS jk,
  CAST(3 AS BIGINT) AS jal,
  'frag' AS fr,
  'tr' AS tld,
  'example' AS fsd,
  'example.com.tr' AS cfsd,
  'a b' AS dec_, 'a+b' AS enc,
  0.0 AS nz,
  TRUE AS ip6, FALSE AS ip6n,
  'big' AS cwe,
  CAST(0 AS BIGINT) AS ea8,
  '3,5' AS sb,
  TRUE AS bc, TRUE AS bha, FALSE AS bhall,
  '1' AS ban,
  '1,2|2,3|3,4' AS shg,
  CAST(2 AS BIGINT) AS ars_n,
  round(2 * 6372797.560856 * asin(sqrt(
    pow(sin(radians(48.8 - 10.0) / 2), 2)
    + cos(radians(10.0)) * cos(radians(48.8))
    * pow(sin(radians(CAST(event_id % 90 AS DOUBLE) - 2.3) / 2), 2))), 3)
    AS gd,
  TRUE AS xh_ok
FROM s ORDER BY event_id
""",
    tags=("chsql", "dialect", "vocabulary"),
)
def chsql_vocab_r33(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 33 (round 10 — the sampled-gap sweep):
    ``trimLeft/trimRight/rightPad/regexpExtract/upperUTF8``,
    ``toLastDayOfWeek`` (Saturday, CH mode 0) / ``toMillisecond``,
    ``JSONExtractKeys/JSONArrayLength``, the URL tail (``fragment``,
    ``topLevelDomain``, ``firstSignificantSubdomain`` /
    ``cutToFirstSignificantSubdomain`` — CH's list-free two-label-TLD
    heuristic, ``decodeURLComponent/encodeURLComponent``), ``nanOrZero``,
    ``isIPv6String``, ``caseWithoutExpression``, ``emptyArrayInt8``, the
    plain-array bitmap tail (``subBitmap/bitmapContains/HasAny/HasAll/
    Andnot``), ``arrayShingles``, ``arrayRandomSample`` (size contract —
    the selection is random by definition), ``geoDistance``,
    ``medianExact``/``quantileDeterministic``, and the xxHash64
    determinism contract."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH 'https://news.example.com.tr:84/p/q?x=1#frag' AS u,
     addDays(toDateTime('2024-03-05 10:20:30.456'), event_id % 40) AS td
SELECT event_id,
  trimLeft('  pad') AS tl, trimRight('pad  ') AS trr,
  rightPad('ab', 5, '*') AS rp,
  regexpExtract(concat('id=', toString(event_id % 10), ';'),
                'id=([0-9]+)', 1) AS rex,
  upperUTF8('up') AS up,
  toLastDayOfWeek(td) AS ldw,
  toMillisecond(td) AS ms,
  arrayStringConcat(JSONExtractKeys('{"a": 1, "b": 2}'), ',') AS jk,
  toInt64(JSONArrayLength('[1, 2, 3]')) AS jal,
  fragment(u) AS fr,
  topLevelDomain(u) AS tld,
  firstSignificantSubdomain(u) AS fsd,
  cutToFirstSignificantSubdomain(u) AS cfsd,
  decodeURLComponent('a%20b') AS dec_,
  encodeURLComponent('a b') AS enc,
  nanOrZero(sqrt(toFloat64(-1))) AS nz,
  isIPv6String('2001:db8::1') AS ip6, isIPv6String('10.0.0.1') AS ip6n,
  caseWithoutExpression(event_id < 0, 'neg', 'big') AS cwe,
  toInt64(size(emptyArrayInt8())) AS ea8,
  arrayStringConcat(arrayMap(x -> toString(x),
    subBitmap([5, 1, 3, 7], 1, 2)), ',') AS sb,
  bitmapContains([1, 3, 7], 3) AS bc,
  bitmapHasAny([1, 3], [3, 9]) AS bha,
  bitmapHasAll([1, 3], [3, 9]) AS bhall,
  arrayStringConcat(arrayMap(x -> toString(x),
    bitmapAndnot([1, 3], [3, 9])), ',') AS ban,
  arrayStringConcat(arrayMap(w -> arrayStringConcat(
    arrayMap(x -> toString(x), w), ','),
    arrayShingles([1, 2, 3, 4], 2)), '|') AS shg,
  toInt64(size(arrayRandomSample([4, 5, 6], 2))) AS ars_n,
  round(geoDistance(2.3, 10.0, toFloat64(event_id % 90), 48.8), 3) AS gd,
  xxHash64('abc') = xxHash64('abc')
    AND xxHash64('abc') != xxHash64('abd') AS xh_ok
FROM events WHERE event_id < 200 ORDER BY event_id
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r34",
    oracle="""
WITH s AS (
  SELECT event_id,
    'https://www.ex.org/a/b/c.txt?k=1&j=2#frg' AS u,
    TIMESTAMP '2024-03-05 10:20:30'
      + (event_id % 500) * INTERVAL 1 DAY AS td
  FROM events WHERE event_id < 200)
SELECT event_id,
  7.0 AS nl1, round(sqrt(13.0), 6) AS nl2,
  11.0 AS ip_, round(9.0 / (sqrt(13.0) * sqrt(10.0)), 6) AS cs,
  CAST(date_trunc('week',
    make_date(CAST(strftime(td, '%G') AS INTEGER), 1, 4)) AS DATE) AS isy,
  CAST(radians(180.0) AS DOUBLE) AS dr,
  round(degrees(3.0), 6) AS rd,
  'x' AS sje, CAST(7 AS BIGINT) AS sji, TRUE AS sjh,
  '{"b":1}' AS jraw,
  CAST(event_id % 9 AS VARCHAR) AS jv, TRUE AS je,
  '{"a":1}' AS tjs,
  CAST(1 AS BIGINT) AS msp, CAST(0 AS BIGINT) AS msp0,
  'ab/' AS atc, 'ab' AS atc2, 'ab' AS rtc,
  'c.txt' AS bn,
  'https://www.ex.org/a/b/c.txt?k=1&j=2' AS cf,
  'https://ex.org/a/b/c.txt?k=1&j=2#frg' AS cw,
  'k=1&j=2#frg' AS qsf,
  'k=1,j=2' AS eup, 'k,j' AS eupn,
  '/a/,/a/b/,/a/b/c.txt' AS uph,
  '██▌' AS bar1, '█████' AS bar2,
  '2,16,32' AS bml, '1,4,5' AS bpa,
  td AS pdn, TIMESTAMP '1970-01-01 00:00:00' AS pdz,
  CAST('2024-03-05' AS DATE) AS md32,
  'UTC' AS tzof, CAST(0 AS INTEGER) AS tzoff,
  CAST(4 AS INTEGER) AS cd, CAST(1 AS INTEGER) AS cd0,
  TRUE AS tb,
  '61f0c404-5cb3-11e7-907b-a6006ad3dba0' AS uu,
  '10,0,30' AS mps
FROM s ORDER BY event_id
""",
    tags=("chsql", "dialect", "vocabulary"),
)
def chsql_vocab_r34(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 34 (round 10 — probe-found gaps): vector-name
    aliases (``normL1/normL2/innerProduct/cosineSimilarity``),
    ``toStartOfISOYear`` (the Monday of ISO week 1), ``degToRad/radToDeg``,
    the ``simpleJSON*`` accessors, ``JSONExtractRaw``/``JSON_VALUE``/
    ``JSON_EXISTS``/``toJSONString``, ``multiSearchFirstPosition``,
    trailing-char editors, the URL hierarchy tier (``basename``,
    ``cutFragment``, ``cutWWW``, ``queryStringAndFragment``,
    ``extractURLParameters/Names``, ``URLPathHierarchy``), ``bar``
    (eighth-block terminal rendering), ``bitmaskToList``/
    ``bitPositionsToArray``, ``parseDateTimeBestEffortOrNull/OrZero``,
    ``makeDate32``, ``timezoneOf/timezoneOffset`` (UTC pin),
    ``countDigits``, ``toBool``, ``toUUID``, ``mapPopulateSeries``
    (rendered as gap-filled values).  Oracle in closed form (ISO year via
    DuckDB's %G)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH 'https://www.ex.org/a/b/c.txt?k=1&j=2#frg' AS u,
     addDays(toDateTime('2024-03-05 10:20:30'), event_id % 500) AS td
SELECT event_id,
  normL1([3.0, -4.0]) AS nl1, round(normL2([3.0, 2.0]), 6) AS nl2,
  innerProduct([1.0, 2.0], [3.0, 4.0]) AS ip_,
  round(cosineSimilarity([3.0, 2.0], [1.0, 3.0]), 6) AS cs,
  toStartOfISOYear(td) AS isy,
  degToRad(180.0) AS dr,
  round(radToDeg(3.0), 6) AS rd,
  simpleJSONExtractString('{"a": "x"}', 'a') AS sje,
  simpleJSONExtractInt('{"n": 7}', 'n') AS sji,
  simpleJSONHas('{"a": 1}', 'a') AS sjh,
  JSONExtractRaw('{"a": {"b": 1}}', 'a') AS jraw,
  JSON_VALUE(concat('{"v": ', toString(event_id % 9), '}'), '$.v') AS jv,
  JSON_EXISTS('{"a": 1}', '$.a') AS je,
  toJSONString(map('a', 1)) AS tjs,
  toInt64(multiSearchFirstPosition('hello', ['ll', 'he', 'zz'])) AS msp,
  toInt64(multiSearchFirstPosition('hello', ['zz'])) AS msp0,
  appendTrailingCharIfAbsent('ab', '/') AS atc,
  appendTrailingCharIfAbsent('ab', 'b') AS atc2,
  removeTrailingCharIfExists('ab/', '/') AS rtc,
  basename('/a/b/c.txt') AS bn,
  cutFragment(u) AS cf,
  cutWWW(u) AS cw,
  queryStringAndFragment(u) AS qsf,
  arrayStringConcat(extractURLParameters(u), ',') AS eup,
  arrayStringConcat(extractURLParameterNames(u), ',') AS eupn,
  arrayStringConcat(URLPathHierarchy(u), ',') AS uph,
  bar(2.5, 0, 10, 10) AS bar1, bar(10, 0, 10, 5) AS bar2,
  bitmaskToList(50) AS bml,
  arrayStringConcat(arrayMap(x -> toString(x),
    bitPositionsToArray(50)), ',') AS bpa,
  parseDateTimeBestEffortOrNull(toString(td)) AS pdn,
  parseDateTimeBestEffortOrZero('junk') AS pdz,
  makeDate32(2024, 3, 5) AS md32,
  timezoneOf(now()) AS tzof, timezoneOffset(now()) AS tzoff,
  countDigits(1234) AS cd, countDigits(0) AS cd0,
  toBool(1) AS tb,
  toUUID('61F0C404-5CB3-11E7-907B-A6006AD3DBA0') AS uu,
  arrayStringConcat(arrayMap(x -> toString(x),
    mapValues(mapPopulateSeries(map(1, 10, 3, 30)))), ',') AS mps
FROM events WHERE event_id < 200 ORDER BY event_id
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r35",
    oracle="""
SELECT TRUE AS bin_ok, TRUE AS poi_ok, TRUE AS rs_ok, TRUE AS ra_ok,
       TRUE AS ulid_ok
""",
    tags=("chsql", "dialect", "vocabulary", "contract"),
)
def chsql_vocab_r35(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 35 (round 10): EXACT sampling lowerings under
    moment contracts — ``randBinomial`` (n Bernoulli draws: mean np, all
    draws within [0, n]), ``randPoisson`` (inverse-transform over the
    iterative pmf — a real Poisson sampler, not a normal approximation:
    mean λ, nonnegative, integer), ``randomString``/
    ``randomPrintableASCII`` (exact length; printable subset check), and
    ``generateULID`` (26-char Crockford base32, per-row unique).  Bounds
    are many σ wide at the smallest fixture (n ≥ 1000 rows)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH s AS (
  SELECT event_id,
         randBinomial(20, 0.3) AS b,
         randPoisson(4.0) AS p,
         randomString(12) AS rs,
         randomPrintableASCII(9) AS ra,
         generateULID() AS ul
  FROM events)
SELECT
  min(b) >= 0 AND max(b) <= 20
    AND abs(avg(toFloat64(b)) - 6.0) < 1.0 AS bin_ok,
  min(p) >= 0 AND abs(avg(toFloat64(p)) - 4.0) < 0.8
    AND max(p) <= 44 AS poi_ok,
  min(IF(length(rs) = 12, 1, 0)) = 1 AS rs_ok,
  min(IF(length(ra) = 9 AND ra RLIKE '^[ -~]+$', 1, 0)) = 1 AS ra_ok,
  min(IF(ul RLIKE '^[0-9A-HJKMNP-TV-Z]{26}$', 1, 0)) = 1
    AND count(DISTINCT ul) = count() AS ulid_ok
FROM s
""",
        dialect="clickhouse",
    )


@register(
    "chsql_sequence_next_node",
    oracle="""
WITH f AS (
  SELECT user_id, event_type,
         row_number() OVER w AS rn,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS nxt
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)
), fw AS (
  SELECT user_id,
         CASE WHEN event_type = 'view' AND e2 = 'click' THEN nxt END AS fnx
  FROM f WHERE rn = 1
), b AS (
  SELECT user_id, event_type,
         row_number() OVER w2 AS rn2,
         lead(event_type, 1) OVER w2 AS b2,
         lead(event_type, 2) OVER w2 AS bnxt
  FROM events
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts DESC, event_type DESC)
), bw AS (
  SELECT user_id,
         CASE WHEN event_type = 'click' AND b2 = 'view' THEN bnxt END AS bnx
  FROM b WHERE rn2 = 1
)
SELECT fw.user_id, fnx, bnx
FROM fw JOIN bw ON fw.user_id = bw.user_id
ORDER BY fw.user_id
""",
    tags=("chsql", "dialect", "funnel", "aggregate"),
)
def chsql_sequence_next_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sequenceNextNode`` on the TEXT path (batch 26): forward/head —
    if a user's first two events (ts-ordered, value-tiebroken) are
    view→click, the third event's type; backward/tail — if the LAST event
    is click preceded by view, the one before that.  Each is ONE aggregate
    expression over a sorted group-local collect (no self-joins, one
    shuffle on the group key); the oracle replays both with row_number/
    lead windows in opposite directions."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT user_id,
  sequenceNextNode('forward', 'head')(ts, event_type,
    event_type = 'view', event_type = 'view', event_type = 'click')
    AS fnx,
  sequenceNextNode('backward', 'tail')(ts, event_type,
    event_type = 'click', event_type = 'click', event_type = 'view')
    AS bnx
FROM events GROUP BY user_id ORDER BY user_id
""",
        dialect="clickhouse",
    )


@register(
    "kql_graph_match",
    oracle="""
SELECT c.c_name AS cn, n.n_name AS nn, r.r_name AS rn
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA' AND (100000 + c.c_custkey) % 10 = 0
ORDER BY cn
""",
    tags=("kql", "dialect", "graph"),
)
def kql_graph_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``make-graph`` + ``graph-match`` (round 10 — Kusto's graph
    semantics, ADX 2023+): the customer→nation→region hierarchy as a
    property graph (ids shifted into one node space, node/edge tables
    built with tabular lets + union), then the 2-hop pattern
    ``(c)-[e1]->(n)-[e2]->(r)`` filtered on a far-node property.  Each
    hop lowers to ONE equi-join Catalyst may reorder/broadcast — the
    oracle is the INDEPENDENT flat 3-way join over the original keys, so
    parity proves the graph lowering reconstructs exactly the relational
    answer."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
let edges = customer
  | project s = 100000 + tolong(c_custkey), d = 1000 + tolong(c_nationkey)
  | union (nation
  | project s = 1000 + tolong(n_nationkey), d = tolong(n_regionkey));
let nodes = customer
  | project id = 100000 + tolong(c_custkey), name = c_name
  | union (nation | project id = 1000 + tolong(n_nationkey), name = n_name)
  | union (region | project id = tolong(r_regionkey), name = r_name);
edges
| make-graph s --> d with nodes on id
| graph-match (c)-[e1]->(n)-[e2]->(r)
  where r.name == 'ASIA' and c.id % 10 == 0
  project cn = c.name, nn = n.name, rn = r.name
| sort by cn asc
""",
        dialect="kusto",
    )


@register(
    "kql_graph_shortest_paths",
    oracle="""
WITH RECURSIVE edges AS (
  SELECT i AS s, i + 1 AS d FROM generate_series(1, 29) t(i)
  UNION ALL
  SELECT i, i + 5 FROM generate_series(1, 25, 6) t(i)
), walk AS (
  SELECT s, d, 1 AS len FROM edges
  UNION ALL
  SELECT w.s, e.d, w.len + 1
  FROM walk w JOIN edges e ON e.s = w.d WHERE w.len < 6
), best AS (SELECT s, d, min(len) AS len FROM walk GROUP BY s, d)
SELECT 'n1' AS xn, 'n' || CAST(d AS VARCHAR) AS yn,
       CAST(len AS BIGINT) AS len
FROM best WHERE s = 1 AND d % 4 = 0 AND len BETWEEN 1 AND 6
ORDER BY yn
""",
    tags=("kql", "dialect", "graph"),
)
def kql_graph_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``graph-shortest-paths`` (round 10): bounded shortest path over a
    chain-plus-shortcut graph — the skip edges make the true shortest
    path genuinely shorter than the chain walk, so parity proves the
    min-over-unrolled-lengths logic (not just reachability).  The K
    bounded lengths unroll to K join chains + ONE endpoint aggregate
    (Kusto requires the upper bound upstream too — that bound is what
    makes the operator SQL-expressible).  The oracle is an INDEPENDENT
    DuckDB WITH RECURSIVE breadth walk capped at the same depth."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
let edges = range i from 1 to 29 step 1
  | project s = tolong(i), d = tolong(i + 1)
  | union (range i from 1 to 25 step 6
           | project s = tolong(i), d = tolong(i + 5));
let nodes = range i from 1 to 30 step 1
  | project id = tolong(i), nm = strcat('n', tostring(i));
edges
| make-graph s --> d with nodes on id
| graph-shortest-paths output=any (x)-[p*1..6]->(y)
  where x.id == 1 and y.id % 4 == 0
  project xn = x.nm, yn = y.nm, len = tolong(array_length(p))
| sort by yn asc
""",
        dialect="kusto",
    )


@register(
    "kql_graph_components",
    oracle="""
SELECT i AS id, CAST((i - 1) // 7 * 7 + 1 AS BIGINT) AS cid
FROM generate_series(1, 35) t(i)
ORDER BY id
""",
    tags=("kql", "dialect", "graph"),
)
def kql_graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``graph-mark-components`` (round 10): weak components of a chain
    graph broken into 7-node segments (edges i→i+1 except at multiples of
    7), marked by K=8 unrolled min-label-propagation rounds — chained
    CTEs, one neighbor join + one min aggregate per round; correct for
    diameter ≤ K (this graph's diameter is 6), with the any-diameter
    iterative tier in operators/graph.connected_components.  The oracle
    is the CLOSED FORM: component(i) = ⌊(i−1)/7⌋·7 + 1 — fully
    independent of the propagation."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
let edges = range i from 1 to 34 step 1
  | where i % 7 != 0
  | project s = tolong(i), d = tolong(i + 1);
let nodes = range i from 1 to 35 step 1 | project id = tolong(i);
edges
| make-graph s --> d with nodes on id
| graph-mark-components kind=weak with_component_id=cid
| project id, cid
| sort by id asc
""",
        dialect="kusto",
    )


@register(
    "kql_print_range",
    oracle="""
SELECT k FROM (VALUES
  ('2024-01-01 00:00 x3.5'), ('2024-01-01 12:00 x3.5'),
  ('2024-01-02 00:00 x3.5'), ('2024-01-02 12:00 x3.5'),
  ('2024-01-03 00:00 x3.5'), ('printed xy 3')) t(k)
ORDER BY k
""",
    tags=("kql", "dialect", "source"),
)
def kql_print_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two generator SOURCES of the Kusto pipeline grammar (round 10):
    ``range`` with a TIMESPAN step (inclusive datetime progression →
    explode(sequence)) and ``print`` (FROM-less scalar row), unioned and
    rendered through format_datetime/strcat.  Oracle is the literal
    expected VALUES list — nothing to replay."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
range t from todatetime('2024-01-01 00:00:00')
        to todatetime('2024-01-03 00:00:00') step 12h
| project k = strcat(format_datetime(t, 'yyyy-MM-dd HH:mm'), ' x',
                     tostring(todouble(7) / 2))
| union (print k = strcat('printed ', replace_string('Xy', 'X', 'x'),
                          ' ', tostring(1 + 2)))
| sort by k asc
""",
        dialect="kusto",
    )


@register(
    "kql_scalar_vocab4",
    oracle="""
SELECT event_id,
  to_base64(encode('v' || CAST(event_id % 50 AS VARCHAR))) AS b64,
  'hello' AS bd,
  sha256(CAST(event_id % 30 AS VARCHAR)) AS s256,
  md5(CAST(event_id % 30 AS VARCHAR)) AS m5,
  '11f6ad8ec52a2984abaafd7c3b516503785c2072' AS s1,
  CAST(3 AS BIGINT) AS ir, CAST(-1 AS BIGINT) AS ir2,
  CAST(6 AS BIGINT) AS co, CAST(2 AS BIGINT) AS co2,
  CAST(event_id % 9 AS VARCHAR) AS ej,
  lower(to_hex(event_id)) AS hx,
  CAST(event_id & 12 AS BIGINT) AS ba,
  CAST(event_id | 3 AS BIGINT) AS bo,
  CAST(xor(event_id, 5) AS BIGINT) AS bx,
  -(CAST(event_id AS BIGINT)) - 1 AS bn,
  CAST(event_id << 2 AS BIGINT) AS bsl,
  CAST(event_id >> 1 AS BIGINT) AS bsr,
  CAST(bit_count(CAST(event_id AS BIGINT)) AS BIGINT) AS bco,
  CAST(-1 AS BIGINT) AS sc, CAST(3 AS BIGINT) AS ss,
  'ababab' AS sr,
  CAST(to_timestamp(1700000000 + event_id) AS TIMESTAMP) AS ut,
  CAST(epoch_ms(1700000000123) AS TIMESTAMP) AS um,
  TRUE AS ia, FALSE AS ia2,
  '1,4' AS ai,
  array_to_string(list_transform(range(1, 4 + event_id % 4),
    x -> CAST(x AS VARCHAR)), ',') AS rg,
  round(3.141592653589793, 9) AS ca,
  2000.0 AS cl, round(453.59237, 6) AS cm, round(3.6, 6) AS cs2,
  273.15 AS ct, 1000.0 AS cv, 3600000.0 AS ce
FROM events WHERE event_id < 200 ORDER BY event_id
""",
    tags=("kql", "dialect", "vocabulary"),
)
def kql_scalar_vocab4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto scalar batch 4 (round 10 — probe-found gaps):
    ``base64_encode/decode_tostring``, the STANDARD hash functions
    ``hash_sha256/hash_md5`` (varying inputs, recomputed in the oracle —
    hex digests are engine-agnostic, unlike the 64-bit xx-family) and
    ``hash_sha1`` (pinned test vector — DuckDB lacks sha1),
    ``indexof_regex`` (−1 on no match), 3-arg ``countof(…, 'regex')``,
    ``extract_json``, ``tohex``, the ``binary_*`` bit-math family,
    ``bitset_count_ones``, ``strcmp``, ``string_size`` (bytes),
    ``strrep``, ``unixtime_seconds/milliseconds_todatetime``,
    ``isascii``, ``array_iff``, scalar ``range``, and the 2023
    ``convert_*`` unit-converter family (literal units → transpile-time
    factors; affine temperature)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
events
| where event_id < 200
| project event_id,
    b64 = base64_encode_tostring(strcat('v', tostring(event_id % 50))),
    bd = base64_decode_tostring('aGVsbG8='),
    s256 = hash_sha256(tostring(event_id % 30)),
    m5 = hash_md5(tostring(event_id % 30)),
    s1 = hash_sha1('x'),
    ir = indexof_regex('abc1d', '[0-9]'),
    ir2 = indexof_regex('abc', '[0-9]'),
    co = countof('a1b22c333', '[0-9]', 'regex'),
    co2 = countof('ababa', 'ab'),
    ej = extract_json('$.v', strcat('{"v": ', tostring(event_id % 9), '}')),
    hx = tohex(event_id),
    ba = binary_and(event_id, 12),
    bo = binary_or(event_id, 3),
    bx = binary_xor(event_id, 5),
    bn = binary_not(event_id),
    bsl = binary_shift_left(event_id, 2),
    bsr = binary_shift_right(event_id, 1),
    bco = bitset_count_ones(event_id),
    sc = strcmp('a', 'b'),
    ss = string_size('abc'),
    sr = strrep('ab', 3),
    ut = unixtime_seconds_todatetime(1700000000 + event_id),
    um = unixtime_milliseconds_todatetime(1700000000123),
    ia = isascii('abc'), ia2 = isascii('münchen'),
    ai = strcat_array(array_iff(dynamic([true, false]),
                                dynamic([1, 2]), dynamic([3, 4])), ','),
    rg = strcat_array(range(1, 3 + event_id % 4, 1), ','),
    ca = round(convert_angle(180.0, 'degree', 'radian'), 9),
    cl = convert_length(2.0, 'kilometer', 'meter'),
    cm = round(convert_mass(1.0, 'pound', 'gram'), 6),
    cs2 = round(convert_speed(1.0, 'meter_per_second',
                              'kilometer_per_hour'), 6),
    ct = convert_temperature(0.0, 'degree_celsius', 'kelvin'),
    cv = convert_volume(1.0, 'liter', 'milliliter'),
    ce = convert_energy(1.0, 'kilowatt_hour', 'joule')
| sort by event_id asc
""",
        dialect="kusto",
    )


@register(
    "kql_basket",
    oracle="""
WITH src AS (SELECT lang, source FROM documents)
SELECT CAST(count(*) AS BIGINT) AS Count,
       round(100.0 * count(*) / (SELECT count(*) FROM src), 6) AS Percent,
       lang, source
FROM src
GROUP BY GROUPING SETS ((lang), (source), (lang, source))
HAVING count(*) >= 0.1 * (SELECT count(*) FROM src)
ORDER BY Count DESC, lang, source
""",
    tags=("kql", "dialect", "mining"),
)
def kql_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate basket`` (round 10 — the Kusto data-mining plugin):
    frequent attribute itemsets over (lang, source) at 10% support — ONE
    CUBE aggregate + HAVING on the support count, wildcards as NULLs,
    grand total excluded (upstream behavior).  Text-path deviation:
    columns are named explicitly (Kusto infers the schema).  The oracle
    enumerates the same segments with explicit GROUPING SETS."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
documents
| project lang, source
| evaluate basket(0.1, lang, source)
| sort by Count desc, lang asc, source asc
""",
        dialect="kusto",
    )


@register(
    "kql_series_vector",
    oracle="""
WITH s AS (
  SELECT event_id,
    list_transform(range(1, 5),
      i -> CAST(event_id % (i + 2) + i AS DOUBLE)) AS a,
    list_transform(range(1, 5),
      i -> CAST((event_id + i) % 5 + 1 AS DOUBLE)) AS b,
    list_transform(range(1, 5),
      i -> CAST(event_id % (i + 2) + i AS BIGINT)) AS ai,
    list_transform(range(1, 5),
      i -> CAST((event_id + i) % 5 + 1 AS BIGINT)) AS bi
  FROM events WHERE event_id < 100)
SELECT event_id,
  round(list_sum(list_transform(range(1, 5), i -> a[i] * b[i])), 6) AS d,
  round(sqrt(list_sum(list_transform(a, x -> x * x))), 6) AS m,
  round(list_sum(list_transform(range(1, 5), i -> a[i] * b[i]))
        / (sqrt(list_sum(list_transform(a, x -> x * x)))
           * sqrt(list_sum(list_transform(b, x -> x * x)))), 6) AS cs,
  round(list_sum(a), 6) AS s,
  round(list_sum(b) / 4, 6) AS av,
  round(CAST(len(list_intersect(list_distinct(ai), list_distinct(bi)))
             AS DOUBLE)
        / len(list_distinct(list_concat(ai, bi))), 6) AS j
FROM s ORDER BY event_id
""",
    tags=("kql", "dialect", "timeseries", "vector"),
)
def kql_series_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto series vector math (round 9): ``series_dot_product`` /
    ``series_magnitude`` / ``series_cosine_similarity`` plus
    ``array_sum``/``array_avg``/``jaccard_index`` — all zero-exchange
    array folds over per-row synthetic vectors (elements ≥ 1, so the
    cosine's zero-magnitude branch never masks the math).  The oracle
    replays each fold with DuckDB list functions."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
events
| where event_id < 100
| extend a = transform(sequence(1, 4), __i -> todouble(event_id % (__i + 2) + __i)),
         b = transform(sequence(1, 4), __i -> todouble((event_id + __i) % 5 + 1)),
         ai = transform(sequence(1, 4), __i -> tolong(event_id % (__i + 2) + __i)),
         bi = transform(sequence(1, 4), __i -> tolong((event_id + __i) % 5 + 1))
| project event_id,
    d = round(series_dot_product(a, b), 6),
    m = round(series_magnitude(a), 6),
    cs = round(series_cosine_similarity(a, b), 6),
    s = round(array_sum(a), 6),
    av = round(array_avg(b), 6),
    j = round(jaccard_index(ai, bi), 6)
| sort by event_id asc
""",
        dialect="kusto",
    )


@register(
    "kql_partition_facet",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rn
  FROM events
),
top2 AS (SELECT user_id, event_type, value FROM ranked WHERE rn <= 2),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6)
           AS total_top2
  FROM top2
),
facets AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_facets,
         CAST(SUM(count_) AS BIGINT) AS facet_mass
  FROM (
    SELECT 'event_type' AS facet, CAST(event_type AS VARCHAR) AS value,
           COUNT(*) AS count_ FROM events GROUP BY event_type
    UNION ALL
    SELECT 'user_id', CAST(user_id AS VARCHAR), COUNT(*)
    FROM events GROUP BY user_id
  )
)
SELECT agg.n_rows, agg.total_top2, facets.n_facets, facets.facet_mass
FROM agg, facets
""",
    tags=("kql", "dialect", "partition", "facet"),
)
def kql_partition_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``partition by`` (groupwise apply) + ``facet by`` (round 8).
    ``partition by user_id (top 2 by value desc)`` lowers to a per-key
    row_number window — no shuffle beyond the key; ``facet by a, b``
    returns Kusto's one-table-per-column as a single (facet, value,
    count_) union (documented deviation).  Both sides reduce to one
    certifying row: top-2 row count + decimal total, facet row count +
    mass (= 2x the table).  The top-2 tie on value is broken by event_id
    on both engines."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    top2 = eng.sql(
        "events | partition by user_id (sort by value desc, event_id asc "
        "| take 2)",
        dialect="kusto",
    )
    facets = eng.sql("events | facet by event_type, user_id", dialect="kusto")
    a = top2.agg(
        F.count("*").alias("n_rows"),
        F.round(
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 6
        ).alias("total_top2"),
    )
    b = facets.agg(
        F.count("*").alias("n_facets"),
        F.sum("count_").alias("facet_mass"),
    )
    return a.crossJoin(b)


@register(
    "prql_join_sides",
    oracle="""
WITH l AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_mktsegment
),
f AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS full_n
  FROM customer FULL JOIN orders ON c_custkey = o_custkey
)
SELECT l.c_mktsegment, l.n, l.n_orders, f.full_n
FROM l, f ORDER BY l.c_mktsegment
""",
    tags=("prql", "dialect", "join"),
)
def prql_join_sides(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRQL ``join side:left`` / ``side:full`` (round 8): the sided joins
    compile to LEFT/FULL JOIN subqueries; customers without orders survive
    the left join (n counts them, n_orders does not), and the full-join
    row count rides along as a second certifying figure.  The ``(==col)``
    self-equality shorthand is transpile-tested (TPC-H columns are
    prefix-named, so no cross-table pair shares a name to demo it on)."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    left = eng.sql(
        """from customer
| join side:left orders (c_custkey == o_custkey)
| group {c_mktsegment} (aggregate {n = count this, n_orders = count o_orderkey})""",
        dialect="prql",
    )
    full = eng.sql(
        """from customer
| join side:full orders (c_custkey == o_custkey)
| aggregate {full_n = count this}""",
        dialect="prql",
    )
    return left.crossJoin(full).select(
        "c_mktsegment", "n", "n_orders", "full_n"
    )


@register(
    "prql_group_topn",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice FROM (
  SELECT l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_extendedprice DESC, l_linenumber) AS rn
  FROM lineitem
) t WHERE rn <= 2 ORDER BY l_orderkey, l_linenumber
""",
    tags=("prql", "dialect", "window"),
)
def prql_group_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRQL ``group {keys} (sort {...} | take n)`` (round 8) — top-n per
    group, the most-used PRQL form after aggregate.  Lowers to a per-key
    row_number window (per-partition heaps at scale — never a global
    sort); the descending price tie breaks on l_linenumber so both engines
    select identical rows."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """from lineitem
| group {l_orderkey} (sort {-l_extendedprice, l_linenumber} | take 2)
| select {l_orderkey, l_linenumber, l_extendedprice}""",
        dialect="prql",
    )


CH_VOCAB_R15 = """
SELECT event_id,
       toRelativeMonthNum(ts) AS rel_month,
       toRelativeQuarterNum(ts) AS rel_quarter,
       toRelativeWeekNum(ts) AS rel_week,
       arrayJaccardIndex([toInt64(event_id % 5), 2, 3], [2, 3, 4]) AS jac,
       arrayStringConcat(arrayMap(x -> toString(x),
         arrayCumSumNonNegative([toInt64(value) - 50, 30,
                                 toInt64(value) - 80])), ',') AS cums,
       hasSubsequence(event_type, 'cik') AS subseq,
       hasSubsequenceCaseInsensitive(event_type, 'CIK') AS subseq_ci,
       countSubstringsCaseInsensitive(event_type, 'C') AS n_c,
       positionCaseInsensitive(event_type, 'URCH') AS pos_ci
FROM events WHERE event_id < 200 ORDER BY event_id
"""


@register(
    "chsql_vocab_r15",
    oracle="""
WITH per_row AS (
  SELECT event_id,
         (year(ts) * 12 + month(ts) - 1) AS rel_month,
         (year(ts) * 4 + quarter(ts) - 1) AS rel_quarter,
         CAST(floor((floor(epoch(ts) / 86400) + 4) / 7) AS INT) AS rel_week,
         CAST(len(list_intersect([event_id % 5, 2, 3], [2, 3, 4])) AS DOUBLE)
           / len(list_distinct([event_id % 5, 2, 3] || [2, 3, 4])) AS jac,
         greatest(0, CAST(floor(value) AS BIGINT) - 50) AS s1,
         CAST(floor(value) AS BIGINT) AS v,
         CAST(regexp_matches(event_type, 'c.*i.*k') AS INT) AS subseq,
         CAST(regexp_matches(lower(event_type), 'c.*i.*k') AS INT)
           AS subseq_ci,
         CAST(length(event_type)
              - length(replace(lower(event_type), 'c', '')) AS BIGINT) AS n_c,
         strpos(lower(event_type), 'urch') AS pos_ci
  FROM events WHERE event_id < 200
)
SELECT event_id, rel_month, rel_quarter, rel_week, jac,
       array_to_string(list_transform(
         [s1, greatest(0, s1 + 30),
          greatest(0, greatest(0, s1 + 30) + v - 80)],
         x -> CAST(x AS VARCHAR)), ',') AS cums,
       subseq, subseq_ci, n_c, pos_ci
FROM per_row ORDER BY event_id
""",
    tags=("chsql", "dialect", "vocabulary"),
)
def chsql_vocab_r15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 15 (round 8): relative month/quarter/week ordinals
    (week counts Monday-aligned weeks since epoch), arrayJaccardIndex,
    arrayCumSumNonNegative (running sum clamped at zero — one fold, no
    UDF), hasSubsequence[CaseInsensitive] (a single O(|h|) fold advancing
    a needle pointer — no backtracking regex), case-insensitive substring
    count/position.  The oracle replays the clamped cumsum closed-form
    (the literal array has three elements) and the subsequence test as a
    DuckDB regex."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(CH_VOCAB_R15, dialect="clickhouse")


@register(
    "chsql_uniq_upto",
    oracle="""
SELECT user_id,
       least(COUNT(DISTINCT event_type), 3 + 1) AS u3,
       least(COUNT(DISTINCT event_type), 10 + 1) AS u10,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY user_id ORDER BY user_id
""",
    tags=("chsql", "dialect", "vocabulary", "aggregate"),
)
def chsql_uniq_upto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``uniqUpTo(N)(x)`` (round 8): exact distinct count while <= N, else
    N+1 — CH's bounded-memory cardinality contract.  Exact distinct is
    cheap on Spark, so the cap applies on top of the exact value (a
    dominating implementation; same map-side-combinable hash agg as
    count(DISTINCT))."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT user_id,
       uniqUpTo(3)(event_type) AS u3,
       uniqUpTo(10)(event_type) AS u10,
       count() AS n
FROM events GROUP BY user_id ORDER BY user_id
""",
        dialect="clickhouse",
    )


@register(
    "kql_scan_declare",
    oracle="""
WITH RECURSIVE base AS (
  SELECT user_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
m AS (
  SELECT user_id, 0 AS rn, 0 AS cur, CAST(0 AS BIGINT) AS mid,
         CAST(0 AS DOUBLE) AS tot, CAST(0 AS BIGINT) AS n_acc,
         CAST(NULL AS TIMESTAMP) AS ts, CAST(NULL AS VARCHAR) AS event_type,
         FALSE AS emitted, CAST(0 AS DOUBLE) AS emit_tot,
         CAST(0 AS BIGINT) AS emit_n, CAST(0 AS BIGINT) AS emit_mid
  FROM (SELECT DISTINCT user_id FROM base)
  UNION ALL
  SELECT b.user_id, b.rn,
    CASE WHEN m.cur = 0 AND b.event_type = 'signup' THEN 1
         WHEN m.cur = 1 AND b.event_type = 'purchase' THEN 0
         ELSE m.cur END,
    CASE WHEN m.cur = 1 AND b.event_type = 'purchase' THEN m.mid + 1
         ELSE m.mid END,
    CASE WHEN m.cur = 0 AND b.event_type = 'signup' THEN m.tot + b.value
         WHEN m.cur = 1 AND b.event_type = 'purchase' THEN CAST(0 AS DOUBLE)
         ELSE m.tot END,
    CASE WHEN m.cur = 0 AND b.event_type = 'signup' THEN m.n_acc + 1
         WHEN m.cur = 1 AND b.event_type = 'purchase' THEN CAST(0 AS BIGINT)
         ELSE m.n_acc END,
    b.ts, b.event_type,
    (m.cur = 0 AND b.event_type = 'signup')
      OR (m.cur = 1 AND b.event_type = 'purchase'),
    m.tot + b.value,
    m.n_acc + 1,
    m.mid
  FROM m JOIN base b ON b.user_id = m.user_id AND b.rn = m.rn + 1
)
SELECT user_id, ts, event_type, emit_tot AS tot, emit_n AS n,
       emit_mid AS m
FROM m WHERE emitted ORDER BY user_id, ts
""",
    tags=("kql", "dialect", "scan", "funnel"),
)
def kql_scan_declare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``scan`` with ``declare``d state variables (round 8): per-
    sequence accumulators ride the fold state — each matched row updates
    them via ``=>`` assignments (pre-row values, simultaneous-assignment
    semantics), emits the post-assignment values as output columns, and
    completing the last step resets them for the next sequence.  Here a
    running value total and step count accumulate across each
    signup→purchase pair per user.  Same single-exchange plan as
    kql_scan_steps; the oracle replays the identical machine INCLUDING the
    state algebra as a DuckDB recursive CTE (the two-term float sums are
    order-pinned by the machine, so parity is exact, not rounded)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
events
| partition by user_id (
    sort by ts asc, event_id asc
    | scan with_match_id=m declare (tot: real = 0.0, n: long) with (
        step s1: event_type == 'signup' => tot = tot + value, n = n + 1;
        step s2: event_type == 'purchase' => tot = tot + value, n = n + 1))
| project user_id, ts, event_type, tot, n, m
""",
        dialect="kusto",
    )


@register(
    "kql_search_term",
    oracle="""
SELECT doc_id, lang, source FROM documents
WHERE contains(lower(text), 'vector') OR contains(lower(lang), 'vector')
   OR contains(lower(source), 'vector')
ORDER BY doc_id
""",
    tags=("kql", "dialect", "search"),
)
def kql_search_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``search`` (round 8): case-insensitive term match across ALL
    string columns of the input — it needs the resolved schema, so it
    lives at the ENGINE level (the prefix transpiles, string columns come
    off the logical plan, and the filter is an OR of per-column contains
    predicates — scan-speed JVM expressions, no regex).  At scale this is
    exactly the full-text fallback tier: a single predicate-pushdown scan;
    the indexed path is operators/fulltext."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    hits = eng.sql(
        'documents | project doc_id, lang, source, text | search "VECTOR"',
        dialect="kusto",
    )
    return hits.select("doc_id", "lang", "source").orderBy("doc_id")


@register(
    "kql_parse_where_itemindex",
    oracle="""
WITH en AS (
  SELECT doc_id, lang, source FROM documents
  WHERE doc_id < 300 AND lang = 'en'
)
SELECT doc_id, CAST(doc_id AS BIGINT) AS pid, i,
       CASE WHEN i = 0 THEN lang ELSE source END AS parts
FROM en, (SELECT unnest([0, 1]) AS i) ix
ORDER BY doc_id, i
""",
    tags=("kql", "dialect", "parse"),
)
def kql_parse_where_itemindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``parse-where`` + ``mv-expand with_itemindex`` (round 8):
    parse-where compiles the literal/capture pattern to ONE anchored regex
    and additionally DROPS non-matching rows via a single RLIKE predicate
    (vs parse's empty-value fill) — here the synthesized tag only matches
    for lang=en, so the filter and the extraction certify together;
    with_itemindex lowers to POSEXPLODE (0-based, matching Kusto)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
documents
| where doc_id < 300
| extend tag = strcat('id=', tostring(doc_id), ';lang=', lang)
| parse-where tag with 'id=' pid:long ';lang=en'
| extend parts = pack_array(lang, source)
| mv-expand with_itemindex=i parts
| project doc_id, pid, i, parts
| sort by doc_id asc, i asc
""",
        dialect="kusto",
    )


@register(
    "kql_top_nested_others",
    oracle="""
WITH g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events
  GROUP BY event_type
),
r AS (
  SELECT event_type, n,
         row_number() OVER (ORDER BY n DESC, event_type) AS rnk
  FROM g
)
SELECT event_type, n FROM r WHERE rnk <= 2
UNION ALL
SELECT 'other' AS event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events
WHERE event_type NOT IN (SELECT event_type FROM r WHERE rnk <= 2)
ORDER BY event_type
""",
    tags=("kql", "dialect", "top_k"),
)
def kql_top_nested_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``top-nested N of K by agg with others = 'label'`` (round 8): the
    remainder row RE-AGGREGATES the excluded rows (correct for any
    aggregate, not just subtractable ones) via a NOT IN against the top-N
    keys — a broadcast of N values, never a second wide shuffle."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        "events | top-nested 2 of event_type by n = count() "
        "with others = 'other' | sort by event_type asc",
        dialect="kusto",
    )


CH_VOCAB_R16 = """
SELECT event_id,
       ngramSearch(event_type, 'sign') AS ngs,
       ngramSearchCaseInsensitive(event_type, 'SIGN') AS ngs_ci,
       parseTimeDelta(concat(toString(event_id % 5), 'h ',
                             toString(event_id % 7), 'm')) AS delta_s,
       arrayStringConcat(arrayMap(x -> toString(x),
         arrayEnumerateDense([toInt64(event_id % 3), 7,
                              toInt64(event_id % 3)])), ',') AS dense,
       arrayStringConcat(arrayMap(x -> toString(x),
         arrayEnumerateUniq([toInt64(event_id % 3), 7,
                             toInt64(event_id % 3)])), ',') AS uniq_rank,
       toStartOfSecond(ts) AS sec_ts,
       timeDiff(toStartOfDay(ts), ts) AS day_secs,
       dateTrunc('hour', ts) AS hr_ts,
       fromDaysSinceYearZero(739000 + event_id % 100) AS some_date,
       toUnixTimestamp64Nano(ts) AS ns
FROM events WHERE event_id < 200 ORDER BY event_id
"""


@register(
    "chsql_vocab_r16",
    oracle="""
SELECT event_id,
       CAST(len(list_intersect(
         list_distinct(list_transform(range(1, greatest(length('sign') - 2, 1) + 1),
                       i -> substring('sign', i, 3))),
         list_distinct(list_transform(range(1, greatest(length(event_type) - 2, 1) + 1),
                       i -> substring(event_type, i, 3))))) AS DOUBLE)
         / len(list_distinct(list_transform(range(1, greatest(length('sign') - 2, 1) + 1),
                             i -> substring('sign', i, 3)))) AS ngs,
       CAST(len(list_intersect(
         list_distinct(list_transform(range(1, greatest(length('sign') - 2, 1) + 1),
                       i -> substring('sign', i, 3))),
         list_distinct(list_transform(range(1, greatest(length(event_type) - 2, 1) + 1),
                       i -> substring(event_type, i, 3))))) AS DOUBLE)
         / len(list_distinct(list_transform(range(1, greatest(length('sign') - 2, 1) + 1),
                             i -> substring('sign', i, 3)))) AS ngs_ci,
       (event_id % 5) * CAST(3600 AS DOUBLE)
         + (event_id % 7) * CAST(60 AS DOUBLE) AS delta_s,
       '1,2,1' AS dense,
       '1,1,2' AS uniq_rank,
       date_trunc('second', ts) AS sec_ts,
       CAST(floor(epoch(ts)) AS BIGINT)
         - CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_secs,
       date_trunc('hour', ts) AS hr_ts,
       DATE '1970-01-01' + CAST(739000 + event_id % 100 - 719528 AS INTEGER)
         AS some_date,
       CAST(epoch_us(ts) AS BIGINT) * 1000 AS ns
FROM events WHERE event_id < 200 ORDER BY event_id
""",
    tags=("chsql", "dialect", "vocabulary"),
)
def chsql_vocab_r16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 16 (round 8): ngramSearch[CaseInsensitive]
    (distinct-trigram containment via array combinators — no regex, no
    UDF), parseTimeDelta (unit-pair fold), arrayEnumerateDense /
    arrayEnumerateUniq (first-occurrence rank / running occurrence
    counter), toStartOfSecond, timeDiff, dateTrunc, fromDaysSinceYearZero
    (inverse of the 719528-offset epoch), toUnixTimestamp64Nano.  The
    oracle replays the trigram containment and closed-forms the rest
    (event_type never collides with the literal 7, so the enumerate
    vectors are constants)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(CH_VOCAB_R16, dialect="clickhouse")


@register(
    "kql_datetime_vocab",
    oracle="""
SELECT event_id,
       year(ts) AS y, month(ts) AS mo, day(ts) AS d,
       dayofyear(ts) AS doy, hour(ts) AS hod, weekofyear(ts) AS woy,
       date_trunc('month', ts) + INTERVAL 1 MONTH - INTERVAL 1 MICROSECOND
         AS eom,
       strftime(ts, '%Y-%m-%d %H:%M') AS fmt,
       3600.0 + 2 * 60 + 3 AS span_s,
       extract(hour FROM ts) AS part_h
FROM events WHERE event_id < 200 ORDER BY event_id
""",
    tags=("kql", "dialect", "datetime"),
)
def kql_datetime_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto datetime vocabulary completions (round 8): getyear/getmonth/
    dayofmonth/dayofyear/hourofday/week_of_year, endofmonth (last tick at
    microsecond precision — documented 100 ns deviation), format_datetime
    (glyph-compatible subset onto date_format), totimespan('HH:MM:SS'),
    datetime_part.  DuckDB replays eom via interval arithmetic and fmt via
    strftime; weekofyear is ISO on both engines."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
events
| where event_id < 200
| project event_id, y = getyear(ts), mo = getmonth(ts), d = dayofmonth(ts),
          doy = dayofyear(ts), hod = hourofday(ts), woy = week_of_year(ts),
          eom = endofmonth(ts),
          fmt = format_datetime(ts, 'yyyy-MM-dd HH:mm'),
          span_s = totimespan('01:02:03'),
          part_h = datetime_part('hour', ts)
| sort by event_id asc
""",
        dialect="kusto",
    )


@register(
    "chsql_columns_matcher",
    oracle="""
SELECT MAX(l_extendedprice) AS "max(l_extendedprice)",
       MAX(l_discount) AS "max(l_discount)",
       MAX(l_tax) AS "max(l_tax)"
FROM lineitem
""",
    tags=("chsql", "dialect", "projection"),
)
def chsql_columns_matcher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH's dynamic column selector ``COLUMNS('re') APPLY fn`` (round 8):
    the regex expands against the resolved table schema at the ENGINE
    level (like getschema/search) into an explicit column list, APPLY
    wrapping each match with CH's ``fn(col)`` output naming.  Here the
    three ``l_.*(price|discount|tax)`` measures reduce through one
    selector (max — order-independent, so doubles compare exactly)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        "SELECT COLUMNS('^l_(extendedprice|discount|tax)$') APPLY max "
        "FROM lineitem",
        dialect="clickhouse",
    )


@register(
    "kql_sample_distinct",
    oracle="""
WITH s AS (
  SELECT doc_id FROM (
    SELECT DISTINCT doc_id FROM documents WHERE doc_id < 200
  ) d ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 20
)
SELECT doc_id FROM s ORDER BY doc_id
""",
    tags=("kql", "dialect", "sampling"),
)
def kql_sample_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``sample-distinct N of col`` (round 8): N distinct values
    selected by md5 rank — reproducible across runs/engines/cluster sizes
    (the same portable-hash selection policy as corpus_budget_sample; a
    documented determinism upgrade over Kusto's RNG).  The plain ``sample
    N`` operator uses the same md5-rank over the whole row and lowers to
    TakeOrderedAndProject (per-partition heaps)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        "documents | where doc_id < 200 | sample-distinct 20 of doc_id",
        dialect="kusto",
    )
    return df.orderBy("doc_id")


@register(
    "kql_externaldata",
    oracle="""
SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey
""",
    tags=("kql", "dialect", "source"),
)
def kql_externaldata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``externaldata`` (round 8): the typed external source, local-
    file subset — the declared schema projects+casts by name over a Spark
    direct-file parquet relation (pushdown/pruning apply, same path as the
    CH ``file()`` table function).  Headerless CSV binds positionally per
    Kusto's contract (transpile-tested)."""
    import os

    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    path = os.path.join(sf_dir, "region.parquet")
    return eng.sql(
        f"externaldata (r_regionkey: long, r_name: string) ['{path}'] "
        "with (format='parquet') | sort by r_regionkey asc",
        dialect="kusto",
    )


@register(
    "chsql_argminmax_combinators",
    oracle="""
WITH r AS (
  SELECT l_returnflag, l_quantity, l_linenumber,
         MIN(l_linenumber) OVER (PARTITION BY l_returnflag) AS mn,
         MAX(l_linenumber) OVER (PARTITION BY l_returnflag) AS mx
  FROM lineitem
)
SELECT l_returnflag,
       SUM(CASE WHEN l_linenumber = mn THEN l_quantity END) AS qty_at_min,
       CAST(COUNT(CASE WHEN l_linenumber = mx THEN 1 END) AS INTEGER)
         AS n_at_max,
       MAX(CASE WHEN l_linenumber = mn THEN l_quantity END) AS maxq_at_min,
       ROUND(SUM(CASE WHEN l_linenumber = mx THEN l_quantity END)
             / COUNT(CASE WHEN l_linenumber = mx THEN 1 END), 6)
         AS avgq_at_max
FROM r GROUP BY l_returnflag ORDER BY l_returnflag
""",
    tags=("chsql", "dialect", "combinators"),
)
def chsql_argminmax_combinators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """-ArgMin / -ArgMax combinators (CH 24.x, round 8): f(x) over the rows
    whose y equals the group extreme — ALL extreme rows participate
    (unlike argMin/argMax, which picks one).  l_quantity is an integral
    double, so the sums are exact regardless of accumulation order; avg
    rounds to 6 on both sides.  TEXT-tier collect lowering (the topK
    policy); the scale path is a window rank filter — exactly the
    oracle's own shape."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT l_returnflag,
       sumArgMin(l_quantity, l_linenumber) AS qty_at_min,
       countArgMax(l_quantity, l_linenumber) AS n_at_max,
       maxArgMin(l_quantity, l_linenumber) AS maxq_at_min,
       round(avgArgMax(l_quantity, l_linenumber), 6) AS avgq_at_max
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
        dialect="clickhouse",
    )


CH_RECURSIVE_CTE = """
WITH RECURSIVE days AS (
  SELECT DATE '2024-01-01' AS d
  UNION ALL
  SELECT CAST(d + INTERVAL 1 DAY AS DATE) AS d FROM days
  WHERE d < DATE '2024-01-31'
)
SELECT d, count(e.event_id) AS n
FROM days LEFT JOIN events e ON CAST(e.ts AS DATE) = d
GROUP BY d ORDER BY d
"""


@register(
    "chsql_recursive_cte",
    oracle="""
WITH RECURSIVE days AS (
  SELECT DATE '2024-01-01' AS d
  UNION ALL
  SELECT CAST(d + INTERVAL 1 DAY AS DATE) AS d FROM days
  WHERE d < DATE '2024-01-31'
)
SELECT d, count(e.event_id) AS n
FROM days LEFT JOIN events e ON CAST(e.ts AS DATE) = d
GROUP BY d ORDER BY d
""",
    tags=("chsql", "dialect", "cte"),
)
def chsql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``WITH RECURSIVE`` (CH 24.4+, round 8): the recursive-CTE surface —
    here a 31-day calendar generated by the recursion and left-joined to
    per-day event counts (gap days survive with n=0).  Catalyst executes
    the recursion natively (Spark 4's UnionLoop — iterations stop on the
    empty increment); the axis is tiny, so the join broadcasts it.  The
    oracle runs the IDENTICAL text on DuckDB — the recursive form is ANSI
    on all three engines."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        CH_RECURSIVE_CTE, dialect="clickhouse"
    )


@register(
    "kql_invoke_lambda",
    oracle="""
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events
WHERE value > 10 AND event_type = 'click'
GROUP BY user_id ORDER BY n DESC, user_id LIMIT 3
""",
    tags=("kql", "dialect", "functions"),
)
def kql_invoke_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``invoke`` with a let-bound tabular lambda (round 8):
    ``let f = (T:(*)) { <pipeline> }`` stores the body, and ``| invoke
    f()`` re-transpiles it at the call site with the parameter bound to
    the pipeline-so-far — Kusto's stored-function idiom, zero runtime
    machinery (pure call-site inlining, so Catalyst optimizes the spliced
    plan as one tree)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
let top_clicks = (T:(*)) {
    T | where event_type == 'click'
      | summarize n = count() by user_id
      | sort by n desc, user_id asc | take 3 };
events | where value > 10 | invoke top_clicks()
""",
        dialect="kusto",
    )


CH_VOCAB_R17 = """
SELECT event_id,
       mapContainsKeyLike(map(event_type, 1, 'zz', 2), 's%') AS has_s,
       arrayStringConcat(arrayMap(x -> toString(x),
         mapValues(mapExtractKeyLike(
           map('alpha', event_id % 5, 'beta', event_id % 7,
               'gamma', event_id % 3), 'al%'))), ',') AS sub_vals,
       arrayStringConcat(mapKeys(mapApply((k, v) -> (concat(k, '!'), v * 2),
                        map('x', event_id % 9, 'y', event_id % 4))), ',')
         AS applied_keys,
       arrayStringConcat(arrayMap(x -> toString(x),
         mapValues(mapApply((k, v) -> (concat(k, '!'), v * 2),
                            map('x', event_id % 9, 'y', event_id % 4)))), ',')
         AS applied_vals,
       arrayStringConcat(mapKeys(mapUpdate(map('a', toInt64(1), 'b', toInt64(2)),
                         map('b', event_id % 5, 'c', toInt64(9)))), ',')
         AS upd_keys,
       arrayStringConcat(arrayMap(x -> toString(x),
         mapValues(mapUpdate(map('a', toInt64(1), 'b', toInt64(2)),
                             map('b', event_id % 5, 'c', toInt64(9))))), ',')
         AS upd_vals,
       ngramDistance(event_type, 'signup') AS ngd,
       ngramDistanceCaseInsensitive(event_type, 'SIGNUP') AS ngd_ci
FROM events WHERE event_id < 150 ORDER BY event_id
"""


@register(
    "chsql_vocab_r17",
    oracle="""
WITH tg AS (
  SELECT event_id, event_type,
    list_distinct(list_transform(
      range(1, greatest(length(event_type) - 2, 1) + 1),
      i -> substring(event_type, i, 3))) AS t_et,
    list_distinct(list_transform(
      range(1, greatest(length('signup') - 2, 1) + 1),
      i -> substring('signup', i, 3))) AS t_lit
  FROM events WHERE event_id < 150)
SELECT event_id,
  event_type LIKE 's%' AS has_s,
  CAST(event_id % 5 AS VARCHAR) AS sub_vals,
  'x!,y!' AS applied_keys,
  CAST((event_id % 9) * 2 AS VARCHAR) || ','
    || CAST((event_id % 4) * 2 AS VARCHAR) AS applied_vals,
  'a,b,c' AS upd_keys,
  '1,' || CAST(event_id % 5 AS VARCHAR) || ',9' AS upd_vals,
  1.0 - CAST(len(list_intersect(t_et, t_lit)) AS DOUBLE)
      / greatest(len(list_distinct(list_concat(t_et, t_lit))), 1) AS ngd,
  1.0 - CAST(len(list_intersect(t_et, t_lit)) AS DOUBLE)
      / greatest(len(list_distinct(list_concat(t_et, t_lit))), 1) AS ngd_ci
FROM tg ORDER BY event_id
""",
    tags=("chsql", "dialect", "vocabulary"),
)
def chsql_vocab_r17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 17 (round 8): the CH map-function completions —
    mapApply (tuple-returning lambda via an entries round-trip),
    mapUpdate (second map wins on collision, key union preserved),
    mapContainsKeyLike / mapExtractKeyLike (LIKE over keys), plus
    ngramDistance[CaseInsensitive] (symmetric Jaccard distance over
    distinct trigrams — the distance twin of batch 16's ngramSearch).
    Everything stays in per-row map/array combinators; the oracle
    closed-forms the map results (constant key sets) and replays the
    trigram distance with DuckDB list functions (event_type values are
    all-lowercase, so the CI variant collapses to the same expression)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(CH_VOCAB_R17, dialect="clickhouse")


@register(
    "kql_bag_unpack",
    oracle="""
SELECT event_id,
       CASE WHEN event_type = 'click' THEN value END AS click,
       CASE WHEN event_type = 'error' THEN value END AS error,
       CASE WHEN event_type = 'purchase' THEN value END AS purchase,
       CASE WHEN event_type = 'signup' THEN value END AS signup,
       CASE WHEN event_type = 'view' THEN value END AS view
FROM events WHERE event_id < 500 ORDER BY event_id
""",
    tags=("kql", "dialect"),
)
def kql_bag_unpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``evaluate bag_unpack``: widen a dynamic property bag into one
    column per distinct key FOUND IN THE DATA — the schema is data-driven,
    so the operator lives at the engine level: one distinct-keys aggregate
    (rows = bag width, the output schema itself — bounded by construction,
    never the table), then a pure projection via element_at.  Keys here are
    the event_type values, so the unpacked width is the type vocabulary;
    the oracle replays the widening as CASE pivots."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
events
| where event_id < 500
| extend b = bag_pack(event_type, value)
| project event_id, b
| evaluate bag_unpack(b)
| sort by event_id asc
""",
        dialect="kusto",
    )


#: synthetic-but-valid H3 cell construction from event_id: res 1..3, any of
#: the 122 base cells, digits (event_id + i) % 7, unused digits 7-filled —
#: plain integer arithmetic both engines can replay exactly
_H3_IDX_SRC = """
SELECT event_id,
       576460752303423488
       + (1 + event_id % 3) * 4503599627370496
       + (event_id % 122) * 35184372088832
       + ((event_id + 1) % 7) * 4398046511104
       + (CASE WHEN 1 + event_id % 3 >= 2
               THEN ((event_id + 2) % 7) * 549755813888 ELSE 0 END)
       + (CASE WHEN 1 + event_id % 3 >= 3
               THEN ((event_id + 3) % 7) * 68719476736 ELSE 0 END)
       + (CASE 1 + event_id % 3 WHEN 1 THEN 4398046511103
              WHEN 2 THEN 549755813887 ELSE 68719476735 END) AS idx
FROM events WHERE event_id < 300
"""


@register(
    "h3_index_bits",
    oracle="""
WITH src AS (""" + _H3_IDX_SRC + """),
d AS (
  SELECT event_id, idx,
         CAST(((idx >> 52) & 15) AS BIGINT) AS res,
         CAST(((idx >> 45) & 127) AS BIGINT) AS bc
  FROM src)
SELECT event_id, idx, res, bc,
  (((idx >> 63) & 1) = 0 AND ((idx >> 59) & 15) = 1
   AND ((idx >> 56) & 7) = 0 AND bc < 122
   AND len(list_filter(generate_series(1, 15), i ->
         CASE WHEN i <= res THEN ((idx >> (45 - 3 * i)) & 7) = 7
              ELSE ((idx >> (45 - 3 * i)) & 7) <> 7 END)) = 0
   AND NOT (bc IN (4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117)
            AND COALESCE(list_filter(list_transform(generate_series(1, 15),
                  i -> CASE WHEN i <= res
                            THEN ((idx >> (45 - 3 * i)) & 7) ELSE 0 END),
                  v -> v <> 0)[1], 0) = 1)) AS valid,
  (res % 2 = 1) AS cls3,
  ((idx & ~(CAST(15 AS BIGINT) << 52)) | (CAST(1 AS BIGINT) << 52)
   | ((CAST(1 AS BIGINT) << 42) - 1)) AS parent1,
  ((((idx & ~(CAST(15 AS BIGINT) << 52))
     | (CAST(res + 1 AS BIGINT) << 52))
    & ~((CAST(1 AS BIGINT) << (45 - 3 * CAST(res AS INT))) - 1))
   | ((CAST(1 AS BIGINT) << (42 - 3 * CAST(res AS INT))) - 1)) AS cc,
  array_to_string(list_transform(generate_series(0, 6), k ->
    CAST((((((idx & ~(CAST(15 AS BIGINT) << 52))
        | (CAST(res + 1 AS BIGINT) << 52))
       & ~((CAST(1 AS BIGINT) << (45 - 3 * CAST(res AS INT))) - 1))
      | ((CAST(1 AS BIGINT) << (42 - 3 * CAST(res AS INT))) - 1))
     + (k << (42 - 3 * CAST(res AS INT)))) AS VARCHAR)), ',') AS kids,
  lower(hex(idx)) AS hexs,
  (2 + 120 * CAST(power(7, res) AS BIGINT)) AS ncells
FROM d ORDER BY event_id
""",
    tags=("chsql", "dialect", "geo"),
)
def h3_index_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH H3 index-math family (round 8): h3GetResolution / h3GetBaseCell /
    h3IsValid (incl. the pentagon deleted-K-subsequence rule) /
    h3IsResClassIII / h3ToParent / h3ToCenterChild / h3ToChildren /
    h3ToString / stringToH3 / h3NumHexagons — all closed-form 64-bit
    arithmetic per the public H3 bit layout, zero shuffles, zero Python
    (the geometry tier geoToH3/h3ToGeo needs the H3 planar math library
    and stays behind a documented gate).  Indexes are synthesized from
    event_id across res 1-3 and all 122 base cells (pentagons included,
    so `valid` genuinely varies); the oracle replays every formula with
    DuckDB bit operators."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        "SELECT event_id, idx,"
        " h3GetResolution(idx) AS res,"
        " h3GetBaseCell(idx) AS bc,"
        " h3IsValid(idx) AS valid,"
        " h3IsResClassIII(idx) AS cls3,"
        " h3ToParent(idx, 1) AS parent1,"
        " h3ToCenterChild(idx, h3GetResolution(idx) + 1) AS cc,"
        " arrayStringConcat(arrayMap(x -> toString(x),"
        " h3ToChildren(idx, h3GetResolution(idx) + 1)), ',') AS kids,"
        " h3ToString(idx) AS hexs,"
        " h3NumHexagons(h3GetResolution(idx)) AS ncells"
        " FROM (" + _H3_IDX_SRC + ") ORDER BY event_id",
        dialect="clickhouse",
    )


@register(
    "kql_join_hint_broadcast",
    oracle="""
WITH dim(et, score) AS (VALUES ('click', 1), ('error', 5), ('signup', 3))
SELECT e.event_type, d.score, COUNT(*) AS n,
       CAST(SUM(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE) AS tot
FROM events e JOIN dim d ON e.event_type = d.et
GROUP BY e.event_type, d.score ORDER BY e.event_type
""",
    tags=("kql", "dialect", "join"),
)
def kql_join_hint_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto join execution hints: ``hint.strategy=broadcast`` lowers to a
    Spark BROADCAST hint on the Kusto-left side (the small data source by
    Kusto convention) — at 100 TB this is the dim-enrichment shape: the
    fact table never shuffles, the 3-row dim ships to every executor.
    ``hint.strategy=shuffle``/``hint.shufflekey`` map to SHUFFLE_HASH and
    ``hint.num_partitions`` is accepted-and-ignored (AQE owns partition
    counts); the broadcast plan shape is pytest-gated
    (tests/test_chsql.py::test_kql_join_hints)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
let dim = datatable(et: string, score: long)
  ['click', 1, 'error', 5, 'signup', 3];
dim
| join hint.strategy=broadcast kind=inner (events)
  on $left.et == $right.event_type
| summarize n = count(), tot = sum(cast(value as decimal(38,6)))
  by event_type, score
| project event_type, score, n, tot = round(todouble(tot), 6)
| sort by event_type asc
""",
        dialect="kusto",
    )


@register(
    "prql_loop",
    oracle="""
WITH RECURSIVE l AS (
  SELECT r_regionkey FROM region
  UNION ALL
  SELECT r_regionkey + 5 AS r_regionkey FROM l WHERE r_regionkey + 5 < 20)
SELECT r_regionkey FROM l ORDER BY r_regionkey
""",
    tags=("prql", "dialect"),
)
def prql_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRQL ``loop``: apply a sub-pipeline to the previous iteration until
    it yields no rows, unioning every iteration — lowered to WITH RECURSIVE
    on Spark 4's UnionLoop (the same fixpoint operator behind
    chsql_recursive_cte; iteration depth capped by
    spark.sql.cteRecursionLevelLimit).  The oracle runs DuckDB's own
    recursive CTE on the identical step."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
from region
select {r_regionkey}
loop (
  derive nxt = r_regionkey + 5
  filter nxt < 20
  select {r_regionkey = nxt}
)
sort r_regionkey
""",
        dialect="prql",
    )


@register(
    "series_period_detect_fft",
    oracle="""
SELECT event_type,
       CAST([4, 8, 16][1 + length(event_type) % 3] AS DOUBLE) AS period,
       CAST([4, 8, 16][1 + length(event_type) % 3] AS DOUBLE) AS detected
FROM (SELECT DISTINCT event_type FROM events)
ORDER BY event_type
""",
    tags=("chsql", "timeseries", "udf"),
)
def series_period_detect_fft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """seriesPeriodDetectFFT (CH 25.x time-series tier): dominant period
    via the FFT magnitude argmax — an Arrow pandas_udf kernel
    (functions/series_fft.py), the numpy-where-Catalyst-has-no-primitive
    pattern.  The planted signal is a pure sinusoid whose period divides
    the window (64), so the spectral peak is exact and the detector must
    return the planted period bit-for-bit; the text path calls the
    registered UDF by its ClickHouse name through the transpiler's
    verbatim pass-through."""
    from clickhouseocp_spark.engine import ChSparkEngine
    from clickhouseocp_spark.functions.series_fft import register_series_udfs

    register_series_udfs(spark)
    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
SELECT event_type,
       CAST(element_at(array(4, 8, 16), 1 + length(event_type) % 3)
            AS DOUBLE) AS period,
       seriesPeriodDetectFFT(
         transform(sequence(0, 63), __i -> sin(2 * pi() * __i /
           element_at(array(4, 8, 16), 1 + length(event_type) % 3))))
         AS detected
FROM (SELECT DISTINCT event_type FROM events)
ORDER BY event_type
""",
        dialect="clickhouse",
    )


@register(
    "mergetree_ttl_expiry",
    oracle="""
SELECT event_type, COUNT(*) AS n
FROM events WHERE event_type <> 'error'
GROUP BY event_type ORDER BY event_type
""",
    tags=("chsql", "mergetree", "ddl"),
)
def mergetree_ttl_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MergeTree row TTL (round 8): ``CREATE TABLE ... TTL <expr> AS
    SELECT`` stores the expiry expression; expired rows stay readable
    until a merge applies the TTL — ``OPTIMIZE TABLE t FINAL`` here, CH's
    own lazy contract.  The TTL horizon is data-relative (errors expire at
    their event time, everything else a century later), so the outcome is
    deterministic: after OPTIMIZE the error rows are gone.  The whole
    lifecycle is lineage-only — no data is rewritten until the view is
    read, and at scale the filter is a partition-prunable predicate."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    eng.sql(
        "CREATE TABLE ttl_events ENGINE = MergeTree ORDER BY event_id "
        "TTL if(event_type = 'error', ts, ts + INTERVAL 100 YEAR) "
        "AS SELECT * FROM events",
        dialect="clickhouse",
    )
    eng.sql("OPTIMIZE TABLE ttl_events FINAL", dialect="clickhouse")
    return eng.sql(
        "SELECT event_type, count() AS n FROM ttl_events "
        "GROUP BY event_type ORDER BY event_type",
        dialect="clickhouse",
    )


@register(
    "kql_toscalar_threshold",
    oracle="""
SELECT event_type, COUNT(*) AS n
FROM events
WHERE value > (SELECT SUM(CAST(value AS DECIMAL(38,6))) / COUNT(*)
               FROM events)
GROUP BY event_type ORDER BY event_type
""",
    tags=("kql", "dialect"),
)
def kql_toscalar_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``toscalar()`` (round 8): the inner pipeline transpiles to a
    scalar subquery parked behind a placeholder so its SQL never re-enters
    the scalar-sugar rewrites; ``materialize()`` strips to its argument
    (Catalyst owns subplan reuse).  The threshold routes through DECIMAL
    so the global mean is exact on both engines.  At scale the scalar
    subquery is one reduction Spark broadcasts into the filter — the
    classic above-average-filter shape with zero driver round trips."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
events
| where value > toscalar(materialize(events)
    | summarize t = sum(cast(value as decimal(38,6))) / count())
| summarize n = count() by event_type
| sort by event_type asc
""",
        dialect="kusto",
    )


@register(
    "alter_column_lifecycle",
    oracle="""
SELECT event_id, event_type AS kind, CAST(0.0 AS DOUBLE) AS boosted,
       CAST(CAST(value * 2 AS DECIMAL(12,2)) AS DOUBLE) AS doubled
FROM events WHERE event_id < 200 ORDER BY event_id
""",
    tags=("chsql", "mergetree", "ddl"),
)
def alter_column_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level ALTER lifecycle (round 8 completes the family):
    ADD COLUMN with a DEFAULT expression referencing existing columns,
    RENAME COLUMN, MODIFY COLUMN type cast, CLEAR COLUMN (reset to type
    default), DROP COLUMN, COMMENT COLUMN (metadata no-op) — each a pure
    lineage rewrite over the session view, zero data movement until read
    (CH's own mutations are likewise deferred rewrites)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    eng.sql(
        "CREATE TABLE ev_ddl ENGINE = MergeTree ORDER BY event_id AS "
        "SELECT event_id, event_type, value FROM events WHERE event_id < 200",
        dialect="ch",
    )
    for stmt in (
        "ALTER TABLE ev_ddl ADD COLUMN boosted Float64 DEFAULT value * 10",
        "ALTER TABLE ev_ddl ADD COLUMN doubled Float64 DEFAULT value * 2",
        "ALTER TABLE ev_ddl RENAME COLUMN event_type TO kind",
        "ALTER TABLE ev_ddl MODIFY COLUMN doubled Decimal(12, 2)",
        "ALTER TABLE ev_ddl CLEAR COLUMN boosted",
        "ALTER TABLE ev_ddl COMMENT COLUMN kind 'renamed event_type'",
        "ALTER TABLE ev_ddl DROP COLUMN value",
    ):
        eng.sql(stmt, dialect="ch")
    return eng.sql(
        # the driver's pandas path widens oracle DECIMALs to float64, so
        # the projection casts the decimal back to Float64 for the hash
        "SELECT event_id, kind, boosted, toFloat64(doubled) AS doubled "
        "FROM ev_ddl ORDER BY event_id",
        dialect="ch",
    )


@register(
    "kql_evaluate_narrow",
    oracle="""
WITH src AS (SELECT event_id, event_type FROM events WHERE event_id < 300),
un AS (
  SELECT 'event_id' AS "Column", CAST(event_id AS VARCHAR) AS "Value" FROM src
  UNION ALL
  SELECT 'event_type', event_type FROM src)
SELECT "Column", COUNT(*) AS n, COUNT(DISTINCT "Value") AS nd
FROM un GROUP BY "Column" ORDER BY "Column"
""",
    tags=("kql", "dialect"),
)
def kql_evaluate_narrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``evaluate narrow()``: transpose wide rows into
    (Row, Column, Value) triples — one ``stack()`` inside the scan stage
    (|cols| values per row, zero exchanges).  Row is unique per source
    row but not dense (a dense ordinal would single-partition the world;
    pipe ``serialize`` when it matters), so the query aggregates over
    Column/Value where the result is order-free and exact."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    return eng.sql(
        """
events
| where event_id < 300
| project event_id, event_type
| evaluate narrow()
| summarize n = count(), nd = dcount(Value) by Column
| sort by Column asc
""",
        dialect="kusto",
    )


@register(
    "chsql_vocab_r18",
    oracle="""
SELECT event_id,
       ts + INTERVAL 3 DAY AS d_add,
       ts - INTERVAL 2 HOUR AS d_sub,
       CAST(timezone('America/New_York', ts) AS TIMESTAMP) AS utc_ny,
       CAST(timezone('America/New_York', timezone('UTC', ts)) AS TIMESTAMP) AS ny_local,
       least(greatest(value, 50.0), 200.0) AS clamped
FROM events WHERE event_id < 300 ORDER BY event_id
""",
    tags=("chsql", "dialect", "vocabulary"),
)
def chsql_vocab_r18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 18 (round 8): addDate/subDate (interval forms),
    toUTCTimestamp/fromUTCTimestamp (CH 23.8 timezone conversions —
    Spark's to/from_utc_timestamp carry the identical wall-clock contract,
    and DuckDB's ICU timezone() replays both directions), clamp (24.5).
    All whole-stage-codegen JVM expressions."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_id,
       addDate(ts, INTERVAL 3 DAY) AS d_add,
       subDate(ts, INTERVAL 2 HOUR) AS d_sub,
       toUTCTimestamp(ts, 'America/New_York') AS utc_ny,
       fromUTCTimestamp(ts, 'America/New_York') AS ny_local,
       clamp(value, 50.0, 200.0) AS clamped
FROM events WHERE event_id < 300 ORDER BY event_id
""",
        dialect="clickhouse",
    )


@register(
    "chsql_array_fill_split",
    oracle="""
WITH src AS (
  SELECT event_id,
         CAST(event_id % 3 AS BIGINT) AS a,
         CAST(event_id % 5 AS BIGINT) AS b
  FROM events WHERE event_id < 300)
SELECT event_id,
  array_to_string(list_transform(
    [a, a, CASE WHEN b <> 0 THEN b ELSE a END,
     CASE WHEN b <> 0 THEN b ELSE a END, CAST(7 AS BIGINT)],
    x -> CAST(x AS VARCHAR)), ',') AS filled,
  array_to_string(list_transform(
    CASE WHEN b <> 0
         THEN [[a], [CAST(0 AS BIGINT), b],
               [CAST(0 AS BIGINT), CAST(7 AS BIGINT)]]
         ELSE [[a], [CAST(0 AS BIGINT)], [CAST(0 AS BIGINT)],
               [CAST(0 AS BIGINT), CAST(7 AS BIGINT)]] END,
    g -> array_to_string(list_transform(g, x -> CAST(x AS VARCHAR)), ',')),
    ';') AS groups,
  CAST(NULL AS BIGINT) AS oob,
  CAST(0 AS BIGINT) AS from_end,
  CASE WHEN b >= 4 THEN b ELSE CAST(7 AS BIGINT) END AS first_ge4
FROM src ORDER BY event_id
""",
    tags=("chsql", "dialect", "vocabulary"),
)
def chsql_array_fill_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch 18b (round 8): the conditional fill/split array family —
    arrayFill (carry the nearest previous element where the predicate
    held; first element always stays), arraySplit (cut before predicate
    hits, never an empty leading group), arrayElementOrNull (OOB/negative
    indexing), arrayFirstOrNull — all single linear folds whose init is
    ``slice(arr, 1, 0)`` (an empty array of the INPUT's type, so the
    rules need no schema).  The oracle closed-forms the expected arrays
    from the same residues."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_id,
  arrayStringConcat(arrayMap(x -> toString(x),
    arrayFill(x -> x != 0,
              [toInt64(event_id % 3), toInt64(0), toInt64(event_id % 5),
               toInt64(0), toInt64(7)])), ',') AS filled,
  arrayStringConcat(arrayMap(g -> arrayStringConcat(
      arrayMap(x -> toString(x), g), ','),
    arraySplit(x -> x = 0,
               [toInt64(event_id % 3), toInt64(0), toInt64(event_id % 5),
                toInt64(0), toInt64(7)])), ';') AS groups,
  arrayElementOrNull([toInt64(event_id % 3)], 7) AS oob,
  arrayElementOrNull([toInt64(event_id % 3), toInt64(0), toInt64(1)], -2)
    AS from_end,
  arrayFirstOrNull(x -> x >= 4,
                   [toInt64(event_id % 5), toInt64(7)]) AS first_ge4
FROM events WHERE event_id < 300 ORDER BY event_id
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r19",
    oracle="""
SELECT event_id,
       CAST(event_id % 7 + 3 AS BIGINT) AS tp1,
       CAST((event_id % 7) * 2 AS BIGINT) AS tm2,
       'Object' AS jt_props,
       'Int64' AS jt_num,
       'UInt64' AS jt_big,
       'Array' AS jt_arr,
       'String' AS jt_str,
       'Double' AS jt_flt,
       'k' AS kv_keys,
       CAST(json_extract_string(props, '$.k') AS VARCHAR) AS kv_vals,
       CAST((event_id % 5) * 1.0 + (event_id % 3) * 2.0 AS DOUBLE) AS dp
FROM events WHERE event_id < 300 ORDER BY event_id
""",
    tags=("chsql", "dialect", "vocabulary"),
)
def chsql_vocab_r19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 19 (round 8): tuplePlus/tupleMinus/tupleMultiply
    (literal element-wise vector math → named_struct), dotProduct (array
    form), JSONType (root-type introspection from the first significant
    byte), JSONExtractKeysAndValues (top-level object → Array(Tuple)).
    The oracle closed-forms the tuple fields and replays the key/value
    extraction with DuckDB's json_extract."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_id,
  tupleElement(tuplePlus((toInt64(event_id % 7), toInt64(1)),
                         (toInt64(3), toInt64(4))), 1) AS tp1,
  tupleElement(tupleMultiply((toInt64(event_id % 7), toInt64(5)),
                             (toInt64(2), toInt64(0))), 1) AS tm2,
  JSONType(props) AS jt_props,
  JSONType('42') AS jt_num,
  JSONType('18446744073709551615') AS jt_big,
  JSONType('[1, 2]') AS jt_arr,
  JSONType('"x"') AS jt_str,
  JSONType('-2.5e3') AS jt_flt,
  arrayStringConcat(arrayMap(e -> e.key,
    JSONExtractKeysAndValues(props, 'String')), ',') AS kv_keys,
  arrayStringConcat(arrayMap(e -> e.value,
    JSONExtractKeysAndValues(props, 'String')), ',') AS kv_vals,
  dotProduct([toFloat64(event_id % 5), toFloat64(event_id % 3)],
             [1.0, 2.0]) AS dp
FROM events WHERE event_id < 300 ORDER BY event_id
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r20",
    oracle="""
WITH g AS (
  SELECT event_type,
    string_agg(CAST(event_id % 10 AS VARCHAR), '|'
               ORDER BY CAST(event_id % 10 AS VARCHAR)) AS gc,
    round(quantile_cont(CASE WHEN value = 0 THEN 0.0 ELSE
      sign(value) * pow(2, floor(log2(abs(value))) - 8)
      * floor(abs(value) / pow(2, floor(log2(abs(value))) - 8)) END,
      0.5), 6) AS qbf,
    array_to_string(list_transform(list_sort(list(event_id % 7)),
      x -> CAST(x AS VARCHAR)), ',') AS ps,
    array_to_string(list_transform(list_reverse_sort(list(event_id % 7)),
      x -> CAST(x AS VARCHAR)), ',') AS prs,
    max(event_id) * 61 + 1 AS m,
    make_timestamp(CAST(floor(epoch_us(max(ts)) / 1000) * 1000 AS BIGINT))
      AS ms_ts,
    max(ts) AS us_ts,
    CAST(epoch_us(max(ts)) AS BIGINT) AS ns_us
  FROM events WHERE event_id < 300
  GROUP BY event_type)
SELECT event_type, gc, qbf, ps, prs,
  coalesce(nullif(concat_ws(', ',
    CASE WHEN floor(m / 86400) > 0
         THEN CAST(CAST(floor(m / 86400) AS BIGINT) AS VARCHAR)
              || CASE WHEN floor(m / 86400) = 1
                      THEN ' day' ELSE ' days' END END,
    CASE WHEN floor(m % 86400 / 3600) > 0
         THEN CAST(CAST(floor(m % 86400 / 3600) AS BIGINT) AS VARCHAR)
              || CASE WHEN floor(m % 86400 / 3600) = 1
                      THEN ' hour' ELSE ' hours' END END,
    CASE WHEN floor(m % 3600 / 60) > 0
         THEN CAST(CAST(floor(m % 3600 / 60) AS BIGINT) AS VARCHAR)
              || CASE WHEN floor(m % 3600 / 60) = 1
                      THEN ' minute' ELSE ' minutes' END END,
    CASE WHEN m % 60 > 0
         THEN CAST(CAST(m % 60 AS BIGINT) AS VARCHAR)
              || CASE WHEN m % 60 = 1
                      THEN ' second' ELSE ' seconds' END END
  ), ''), '0 seconds') AS td,
  ms_ts, us_ts, ns_us
FROM g ORDER BY event_type
""",
    tags=("chsql", "dialect", "vocabulary"),
)
def chsql_vocab_r20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 20 (round 9, the r8 verdict's high-traffic list):
    ``groupConcat(sep)(x)`` (24.7 — sorted for determinism, order is
    undefined upstream too), ``quantileBFloat16`` (values truncate to an
    8-bit mantissa via the pure-SQL closed form sign·2^(e-8)·⌊|x|/2^(e-8)⌋
    before the interpolated quantile; CH rounds to nearest even —
    documented ≤1-ulp deviation), ``arrayPartialSort`` /
    ``arrayPartialReverseSort`` (deterministic fully-sorted superset),
    ``formatReadableTimeDelta`` (largest-unit-first rendering, replayed
    textually by the oracle), and the ``toStartOfMillisecond /
    Microsecond / Nanosecond`` family (Spark timestamps carry µs —
    Millisecond truncates, the finer two are the identity, documented).
    Arrays emit comma-joined per the driver-output-shape convention."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_type,
  groupConcat('|')(toString(event_id % 10)) AS gc,
  round(quantileBFloat16(0.5)(value), 6) AS qbf,
  arrayStringConcat(arrayMap(x -> toString(x),
    arrayPartialSort(3, groupArray(toInt64(event_id % 7)))), ',') AS ps,
  arrayStringConcat(arrayMap(x -> toString(x),
    arrayPartialReverseSort(2, groupArray(toInt64(event_id % 7)))), ',')
    AS prs,
  formatReadableTimeDelta(max(event_id) * 61 + 1) AS td,
  max(toStartOfMillisecond(ts)) AS ms_ts,
  max(toStartOfMicrosecond(ts)) AS us_ts,
  toUnixTimestamp64Micro(CAST(max(toStartOfNanosecond(ts)) AS TIMESTAMP))
    AS ns_us
FROM events WHERE event_id < 300
GROUP BY event_type ORDER BY event_type
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r21",
    oracle="""
SELECT event_id,
  CASE WHEN abs(value * ([1.0, 1000.0, 1000000.0, 1000000000.0,
                          1000000000000.0][1 + CAST(event_id % 5 AS INT)]))
            >= 1e12
       THEN printf('%.2f', value * ([1.0, 1000.0, 1000000.0, 1000000000.0,
            1000000000000.0][1 + CAST(event_id % 5 AS INT)]) / 1e12)
            || ' trillion'
       WHEN abs(value * ([1.0, 1000.0, 1000000.0, 1000000000.0,
                          1000000000000.0][1 + CAST(event_id % 5 AS INT)]))
            >= 1e9
       THEN printf('%.2f', value * ([1.0, 1000.0, 1000000.0, 1000000000.0,
            1000000000000.0][1 + CAST(event_id % 5 AS INT)]) / 1e9)
            || ' billion'
       WHEN abs(value * ([1.0, 1000.0, 1000000.0, 1000000000.0,
                          1000000000000.0][1 + CAST(event_id % 5 AS INT)]))
            >= 1e6
       THEN printf('%.2f', value * ([1.0, 1000.0, 1000000.0, 1000000000.0,
            1000000000000.0][1 + CAST(event_id % 5 AS INT)]) / 1e6)
            || ' million'
       WHEN abs(value * ([1.0, 1000.0, 1000000.0, 1000000000.0,
                          1000000000000.0][1 + CAST(event_id % 5 AS INT)]))
            >= 1e3
       THEN printf('%.2f', value * ([1.0, 1000.0, 1000000.0, 1000000000.0,
            1000000000000.0][1 + CAST(event_id % 5 AS INT)]) / 1e3)
            || ' thousand'
       ELSE printf('%.2f', value * ([1.0, 1000.0, 1000000.0, 1000000000.0,
            1000000000000.0][1 + CAST(event_id % 5 AS INT)])) END AS frq,
  make_timestamp(CAST(floor(epoch_us(ts) / 1000) * 1000 AS BIGINT))
    AS snow_rt,
  (CAST(floor(epoch_us(ts) / 1000) AS BIGINT) - 1288834974657) * 4194304
    AS snow_id,
  make_timestamp((1700000000000 + event_id) * 1000) AS ts_ms,
  make_timestamp(1700000000000000 + event_id) AS ts_us,
  make_timestamp(1700000000000000 + event_id) AS ts_ns,
  make_timestamp((1700000000000 + event_id * 7) * 1000) AS ulid_ts,
  damerau_levenshtein(event_type, 'singup') AS dl
FROM events WHERE event_id < 300 ORDER BY event_id
""",
    tags=("chsql", "dialect", "vocabulary"),
)
def chsql_vocab_r21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 21 (round 9): ``formatReadableQuantity``
    (thousand→trillion rendering, '%.2f' floor), the
    ``fromUnixTimestamp64Milli/Micro/Nano`` constructors, the Snowflake-ID
    epoch family (``dateTime64ToSnowflakeID`` / ``snowflakeIDToDateTime``
    round-trips to the millisecond truncation — pure 64-bit shifts),
    ``ULIDStringToDateTime`` (Crockford-base32 positional fold over the
    10 timestamp chars; the ULID is ENCODED in-query from a known
    millisecond value so the decode is oracle-pinned), and
    ``damerauLevenshteinDistance`` (the OSA pandas kernel vs DuckDB's
    native damerau_levenshtein)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_id,
  formatReadableQuantity(value * arrayElement(
    [1.0, 1000.0, 1000000.0, 1000000000.0, 1000000000000.0],
    1 + toInt32(event_id % 5))) AS frq,
  snowflakeIDToDateTime(dateTime64ToSnowflakeID(ts)) AS snow_rt,
  dateTime64ToSnowflakeID(ts) AS snow_id,
  fromUnixTimestamp64Milli(1700000000000 + event_id) AS ts_ms,
  fromUnixTimestamp64Micro(1700000000000000 + event_id) AS ts_us,
  fromUnixTimestamp64Nano((1700000000000000 + event_id) * 1000) AS ts_ns,
  ULIDStringToDateTime(concat_ws('', transform(sequence(9, 0, -1),
    __i -> substring('0123456789ABCDEFGHJKMNPQRSTVWXYZ',
      CAST(CAST(floor((1700000000000 + event_id * 7) / pow(32, __i))
           AS BIGINT) % 32 + 1 AS INT), 1)))) AS ulid_ts,
  damerauLevenshteinDistance(event_type, 'singup') AS dl
FROM events WHERE event_id < 300 ORDER BY event_id
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r22",
    oracle="""
WITH src AS (
  SELECT event_id,
         list_transform(range(1, 7),
           i -> (event_id % (i + 3)) + i / 10.0) AS s,
         list_transform(range(1, 7),
           i -> CAST((event_id + i) % 2 AS INT)) AS l
  FROM events WHERE event_id < 300),
e AS (SELECT event_id, unnest(s) AS sc, unnest(l) AS lb FROM src),
r AS (
  SELECT event_id, lb,
         row_number() OVER (PARTITION BY event_id ORDER BY sc DESC) AS rn,
         SUM(lb) OVER (PARTITION BY event_id ORDER BY sc DESC
                       ROWS UNBOUNDED PRECEDING) AS tp
  FROM e)
SELECT event_id,
       round(CASE WHEN SUM(lb) = 0 THEN 0.0
                  ELSE SUM(CASE WHEN lb = 1
                                THEN CAST(tp AS DOUBLE) / rn END)
                       / SUM(lb) END, 6) AS aucpr,
       CAST(strpos('abcabc', 'bc') AS BIGINT) AS loc1,
       CAST(3 + strpos(substring('abcabc', 4), 'bc') AS BIGINT) AS loc2
FROM r GROUP BY event_id ORDER BY event_id
""",
    tags=("chsql", "dialect", "vocabulary"),
)
def chsql_vocab_r22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 22 (round 9): ``arrayAUCPR`` (average precision —
    one comparator sort + one linear fold per row, per-element steps;
    scores are tie-free by construction, the documented deviation from
    CH's tie grouping) and MySQL-style ``locate(needle, haystack[, pos])``
    (Spark's builtin matches CH 24.x's MySQL-compatible argument order —
    verbatim passthrough).  The oracle replays AP with window cumulative
    true-positive counts over the unnested pairs — an independent
    formulation, not a fold replay."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_id,
  round(arrayAUCPR(
    arrayMap(i -> (event_id % (i + 3)) + i / 10.0, range(1, 7)),
    arrayMap(i -> toInt32((event_id + i) % 2), range(1, 7))), 6) AS aucpr,
  toInt64(locate('bc', 'abcabc')) AS loc1,
  toInt64(locate('bc', 'abcabc', 4)) AS loc2
FROM events WHERE event_id < 300 ORDER BY event_id
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r23",
    oracle="""
SELECT event_id,
  'alpha line' AS fl,
  ((event_id - 7) % 5 + 5) % 5 AS pm,
  CAST(power(10, CAST(event_id % 13 AS INT)) AS BIGINT) AS e10,
  CAST(floor(epoch(ts) / 60) AS BIGINT) AS rel_min,
  CAST(floor(epoch(ts)) AS BIGINT) AS rel_sec,
  make_timestamp((1700000000000 + event_id * 13) * 1000) AS u7
FROM events WHERE event_id < 300 ORDER BY event_id
""",
    tags=("chsql", "dialect", "vocabulary"),
)
def chsql_vocab_r23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 23 (round 9): ``firstLine`` (text before the first
    newline, CRLF-normalized), ``positiveModulo``, ``intExp10`` (exact
    64-bit 10^n via a multiply fold — pow() doubles lose exactness past
    1e15), ``toRelativeMinute/SecondNum``, ``UUIDv7ToDateTime`` (the
    millisecond timestamp in the first 48 UUID bits; the v7 string is
    ENCODED in-query from a known millisecond so the decode is
    oracle-pinned — the ULID test-construction pattern)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_id,
  firstLine(concat('alpha line', '\\n', 'beta')) AS fl,
  positiveModulo(event_id - 7, 5) AS pm,
  intExp10(event_id % 13) AS e10,
  toRelativeMinuteNum(ts) AS rel_min,
  toRelativeSecondNum(ts) AS rel_sec,
  UUIDv7ToDateTime(concat(
    substring(lpad(lower(hex(1700000000000 + event_id * 13)), 12, '0'), 1, 8),
    '-',
    substring(lpad(lower(hex(1700000000000 + event_id * 13)), 12, '0'), 9, 4),
    '-7000-8000-000000000000')) AS u7
FROM events WHERE event_id < 300 ORDER BY event_id
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r24",
    oracle="""
WITH src AS (
  SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS q,
         CAST(l_extendedprice AS DOUBLE) AS p,
         l_orderkey * 8 + l_linenumber AS xk
  FROM lineitem WHERE l_orderkey < 5000),
g AS (SELECT l_returnflag, avg(q) AS mu, COUNT(*) AS n
      FROM src GROUP BY l_returnflag),
m AS (
  SELECT s.l_returnflag, any_value(g.n) AS n,
         sum(pow(s.q - g.mu, 2)) / any_value(g.n) AS m2,
         sum(pow(s.q - g.mu, 3)) / any_value(g.n) AS m3,
         sum(pow(s.q - g.mu, 4)) / any_value(g.n) AS m4,
         round(CAST(sum(CAST(s.p * s.q AS DECIMAL(38,12))) AS DOUBLE)
               / CAST(sum(CAST(s.q AS DECIMAL(38,12))) AS DOUBLE), 6) AS aw
  FROM src s JOIN g USING (l_returnflag) GROUP BY s.l_returnflag),
brq AS (
  SELECT l_returnflag,
         round((arg_max(py, xk) - arg_min(py, xk))
               / CAST(max(xk) - min(xk) AS DOUBLE), 6) AS br
  FROM (SELECT l_returnflag, xk, max(p) AS py
        FROM src GROUP BY l_returnflag, xk) d
  GROUP BY l_returnflag)
SELECT m.l_returnflag, aw,
       round(m3 / pow(m2 * n / (n - 1), 1.5), 6) AS sk,
       round(m4 / pow(m2 * n / (n - 1), 2), 6) AS ku,
       br
FROM m JOIN brq ON m.l_returnflag = brq.l_returnflag
ORDER BY m.l_returnflag
""",
    tags=("chsql", "dialect", "vocabulary", "aggregate"),
)
def chsql_vocab_r24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 24 (round 9): aggregate composites —
    ``avgWeighted`` (DECIMAL-routed sums, the fsum convention),
    ``skewSamp``/``kurtSamp`` (CH's sample moments μ3/σ_samp³ and
    μ4/σ_samp⁴ — Pearson, not excess — recovered from Spark's population
    forms via ((n-1)/n)^k), ``boundingRatio`` (the slope between the
    leftmost and rightmost points by x: (y@argmax(x) − y@argmin(x)) /
    (max(x) − min(x)), lowered to Spark ``max_by``/``min_by``).  The
    oracle recomputes the moments from raw central sums, not from
    DuckDB's differently-biased skewness/kurtosis builtins, and replays
    boundingRatio independently via DuckDB ``arg_max``/``arg_min``."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH brq AS (
  SELECT l_returnflag, round(boundingRatio(xk, py), 6) AS br
  FROM (SELECT l_returnflag, l_orderkey * 8 + l_linenumber AS xk,
               max(toFloat64(l_extendedprice)) AS py
        FROM lineitem WHERE l_orderkey < 5000
        GROUP BY l_returnflag, l_orderkey * 8 + l_linenumber) d
  GROUP BY l_returnflag)
SELECT m.l_returnflag, aw, sk, ku, br
FROM (SELECT l_returnflag,
        round(avgWeighted(toFloat64(l_extendedprice),
                          toFloat64(l_quantity)), 6) AS aw,
        round(skewSamp(toFloat64(l_quantity)), 6) AS sk,
        round(kurtSamp(toFloat64(l_quantity)), 6) AS ku
      FROM lineitem WHERE l_orderkey < 5000
      GROUP BY l_returnflag) m
JOIN brq ON m.l_returnflag = brq.l_returnflag
ORDER BY m.l_returnflag
""",
        dialect="clickhouse",
    )


@register(
    "chsql_ttest_text",
    oracle="""
WITH s AS (
  SELECT CASE WHEN l_orderkey % 2 = 0 THEN CAST(l_quantity AS DOUBLE) END
           AS x0,
         CASE WHEN l_orderkey % 2 = 1 THEN CAST(l_quantity AS DOUBLE) END
           AS x1
  FROM lineitem WHERE l_orderkey < 5000)
SELECT
  round((avg(x0) - avg(x1))
        / sqrt((var_samp(x0) * (count(x0) - 1)
                + var_samp(x1) * (count(x1) - 1))
               / (count(x0) + count(x1) - 2)
               * (1.0 / count(x0) + 1.0 / count(x1))), 6) AS st,
  round((avg(x0) - avg(x1))
        / sqrt(var_samp(x0) / count(x0) + var_samp(x1) / count(x1)), 6)
    AS wt
FROM s
""",
    tags=("chsql", "dialect", "statistics"),
)
def chsql_ttest_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``studentTTest``/``welchTTest`` on the TEXT path (round 9; round 11
    upgraded the lowering to CH's real (t, p) tuple — this recorded query
    keeps its original output shape by unpacking t with tupleElement, so
    its driver record stays valid).  t from conditional aggregates over
    the index split — map-side combinable; the oracle replays the
    identical conditional-aggregate formulation."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT
  round(tupleElement(
    studentTTest(toFloat64(l_quantity), l_orderkey % 2), 1), 6) AS st,
  round(tupleElement(
    welchTTest(toFloat64(l_quantity), l_orderkey % 2), 1), 6) AS wt
FROM lineitem WHERE l_orderkey < 5000
""",
        dialect="clickhouse",
    )


@register(
    "chsql_math_vocab_r9b",
    oracle="""
WITH s AS (SELECT event_id, value / 100.0 AS x,
                  CAST(event_id % 11 - 5 AS DOUBLE) AS y
           FROM events WHERE event_id < 300)
SELECT event_id,
  round((exp(x) - exp(-x)) / 2, 6) AS v_sinh,
  round((exp(x) + exp(-x)) / 2, 6) AS v_cosh,
  round((exp(2 * x) - 1) / (exp(2 * x) + 1), 6) AS v_tanh,
  round(ln(y + sqrt(y * y + 1)), 6) AS v_asinh,
  round(atan2(y, x + 1.0), 6) AS v_atan2,
  round(CASE WHEN x >= 0 THEN pow(x, 1.0 / 3.0)
             ELSE -pow(-x, 1.0 / 3.0) END, 6) AS v_cbrt,
  round(degrees(x), 6) AS v_deg, round(radians(y), 6) AS v_rad,
  CAST(sign(y) AS BIGINT) AS v_sign,
  CAST([1, 1, 2, 6, 24, 120, 720, 5040][1 + CAST(event_id % 8 AS INT)]
       AS BIGINT) AS v_fact,
  round(sqrt(x * x + y * y), 6) AS v_hypot,
  round(ln(1.0 + x), 6) AS v_log1p, round(exp(x) - 1.0, 6) AS v_expm1,
  CASE WHEN event_id % 5 = 0 THEN 0
       ELSE CAST(event_id % 17 - 8 AS BIGINT)
            % CAST(event_id % 5 AS BIGINT) END AS v_modz
FROM s ORDER BY event_id
""",
    tags=("chsql", "dialect", "vocabulary", "math"),
)
def chsql_math_vocab_r9b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math vocabulary pins (round 9): the libm family CH shares with
    Spark VERBATIM — sinh/cosh/tanh/asinh/atan2/cbrt/degrees/radians/
    sign/factorial/hypot/log1p/expm1 — value-pinned against DuckDB
    closed forms (hypot/log1p/expm1 replayed as their defining
    expressions; round(6) absorbs last-ulp libm spread), plus
    ``moduloOrZero`` (C-style %, zero divisor → 0)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_id,
  round(sinh(value / 100.0), 6) AS v_sinh,
  round(cosh(value / 100.0), 6) AS v_cosh,
  round(tanh(value / 100.0), 6) AS v_tanh,
  round(asinh(toFloat64(event_id % 11 - 5)), 6) AS v_asinh,
  round(atan2(toFloat64(event_id % 11 - 5), value / 100.0 + 1.0), 6)
    AS v_atan2,
  round(cbrt(value / 100.0), 6) AS v_cbrt,
  round(degrees(value / 100.0), 6) AS v_deg,
  round(radians(toFloat64(event_id % 11 - 5)), 6) AS v_rad,
  toInt64(sign(toFloat64(event_id % 11 - 5))) AS v_sign,
  factorial(toInt32(event_id % 8)) AS v_fact,
  round(hypot(value / 100.0, toFloat64(event_id % 11 - 5)), 6) AS v_hypot,
  round(log1p(value / 100.0), 6) AS v_log1p,
  round(expm1(value / 100.0), 6) AS v_expm1,
  moduloOrZero(toInt64(event_id % 17 - 8), toInt64(event_id % 5)) AS v_modz
FROM events WHERE event_id < 300 ORDER BY event_id
""",
        dialect="clickhouse",
    )


@register(
    "kql_make_bag",
    oracle="""
SELECT event_type,
       string_agg(CAST(event_id AS VARCHAR),
                  ',' ORDER BY CAST(event_id AS VARCHAR)) AS bag_keys,
       string_agg(printf('%.6f', value),
                  ',' ORDER BY CAST(event_id AS VARCHAR)) AS bag_vals
FROM events WHERE event_id < 60
GROUP BY event_type ORDER BY event_type
""",
    tags=("kql", "dialect", "aggregate"),
)
def kql_make_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``make_bag``: union the group's property bags into one map —
    an entry fold over the collected bags (first occurrence wins on key
    collision; Kusto's pick is likewise arrival-order-dependent, so the
    query uses per-group-unique keys for determinism).  O(bag²) in the
    BAG size, never in rows — the contract is small bags (here ≤60 keys);
    the oracle rebuilds the same bag as parallel key-sorted comma-joined
    key/value strings (MAP, struct-in-array, and plain list cells all
    break the driver's pandas canonicalizer, so the projection emits
    scalars only)."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        """
events
| where event_id < 60
| extend bag = bag_pack(tostring(event_id), value)
| summarize merged = make_bag(bag) by event_type
| project event_type,
          bag_keys = array_sort(map_keys(merged)),
          bag_vals = transform(array_sort(map_entries(merged)), e -> e.value)
| sort by event_type asc
""",
        dialect="kusto",
    )
    return df.select(
        "event_type",
        F.expr("array_join(bag_keys, ',')").alias("bag_keys"),
        F.expr(
            "array_join(transform(bag_vals,"
            " __x -> format_string('%.6f', __x)), ',')"
        ).alias("bag_vals"),
    )


@register(
    "group_bitmap_ops",
    oracle="""
WITH du AS (
  SELECT DISTINCT event_type,
         CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS d,
         user_id % 50 AS u
  FROM events WHERE ts IS NOT NULL),
days AS (SELECT event_type, COUNT(DISTINCT d) AS nd FROM du GROUP BY 1),
per_user AS (
  SELECT event_type, u, COUNT(DISTINCT d) AS cd FROM du GROUP BY 1, 2)
SELECT p.event_type,
  CAST(SUM(CASE WHEN p.cd = dy.nd THEN 1 ELSE 0 END) AS BIGINT) AS ab,
  CAST(COUNT(*) AS BIGINT) AS ob,
  CAST(SUM(CASE WHEN p.cd % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS xb
FROM per_user p JOIN days dy ON p.event_type = dy.event_type
GROUP BY p.event_type ORDER BY p.event_type
""",
    tags=("chsql", "bitmap", "aggregate"),
)
def group_bitmap_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBitmapAnd/Or/Xor (round 8): fold the group's bitmap states
    with the set operation and return the cardinality (CH contract) — one
    JVM fold over the collected per-day states, associative+commutative
    so collect order never matters.  Daily user bitmaps per event type:
    AND = users active EVERY day, OR = distinct users, XOR = users active
    an odd number of days — which the oracle counts directly from the
    (type, day, user) distinct set."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_type,
       groupBitmapAnd(bm) AS ab,
       groupBitmapOr(bm) AS ob,
       groupBitmapXor(bm) AS xb
FROM (
  SELECT event_type,
         toInt64(floor(toUnixTimestamp(ts) / 86400)) AS d,
         bitmapBuild(groupArray(toInt64(user_id % 50))) AS bm
  FROM events WHERE ts IS NOT NULL
  GROUP BY event_type, d)
GROUP BY event_type ORDER BY event_type
""",
        dialect="clickhouse",
    )


@register(
    "kql_hll_binary_agg",
    oracle="""
SELECT event_type,
       bit_and(event_id % 4096) AS band,
       bit_or(event_id % 4096) AS bor,
       bit_xor(event_id % 4096) AS bxor,
       true AS hll_ok
FROM events
GROUP BY event_type ORDER BY event_type
""",
    tags=("kql", "dialect", "aggregate", "sketch"),
)
def kql_hll_binary_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``hll()`` / ``hll_merge()`` / ``dcount_hll()`` (round 10 —
    the re-mergeable distinct-count sketch pair) plus the exact bitwise
    folds ``binary_all_and/or/xor``.  The HLL half lowers to Spark's
    DataSketches aggregates (hll_sketch_agg / hll_union_agg /
    hll_sketch_estimate) — partial-aggregatable JVM sketches, so the
    canonical two-level Kusto pattern here (per-(type, user-class)
    sketches merged per type) is exactly the distributed shape: sketches
    combine map-side, bytes never reach Python.  Sketch bytes are
    engine-specific, so the driver-checked output is the accuracy
    CONTRACT (estimate within 5% of the exact dcount — the user classes
    partition users, so the per-class exact dcounts sum losslessly);
    the bitwise folds are exact and the oracle replays them directly.
    Cites reference Dockerfile:102-104 (uniqHLL12 / groupBitAnd family
    in the pinned engine)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
events
| extend b = event_id % 4096, g = user_id % 4
| summarize h = hll(user_id), band = binary_all_and(b),
            bor = binary_all_or(b), bxor = binary_all_xor(b),
            exact = dcount(user_id) by event_type, g
| summarize hm = hll_merge(h), band = binary_all_and(band),
            bor = binary_all_or(bor), bxor = binary_all_xor(bxor),
            exact = sum(exact) by event_type
| project event_type, band, bor, bxor,
          hll_ok = abs(todouble(dcount_hll(hm)) - todouble(exact)) * 20.0
                   < todouble(exact)
| sort by event_type asc
""",
        dialect="kusto",
    )


@register(
    "kql_scalar_vocab5",
    oracle="""
WITH s AS (
  SELECT event_id, props,
         event_id % 200 AS b2, event_id % 256 AS b3, event_id % 251 AS b4
  FROM events WHERE event_id < 200)
SELECT event_id,
  CAST(10 * 16777216 + b2 * 65536 + b3 * 256 + b4 AS BIGINT) AS p,
  CAST(10 * 16777216 + b2 * 65536 + b3 * 256 AS BIGINT) AS pm,
  '10.' || b2 || '.' || b3 || '.0' AS f24,
  '10.' || b2 || '.' || (b3 // 16) * 16 || '.0/20' AS fm,
  CAST(16 AS INTEGER) AS sfx,
  CAST(CASE WHEN b2 < 100 THEN -1 WHEN b2 = 100 THEN 0 ELSE 1 END
       AS BIGINT) AS cmp,
  true AS inr,
  CAST(CASE WHEN json_extract_string(props, '$.k') = '7'
            THEN 0 ELSE 1 END AS INTEGER) AS idx,
  list_contains([1, 3, 5], CAST(event_id % 6 AS INTEGER)) AS she
FROM s ORDER BY event_id
""",
    tags=("kql", "dialect", "vocabulary", "ip"),
)
def kql_scalar_vocab5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KQL scalar batch 5 (round 10): the IPv4 parse/format family —
    ``parse_ipv4`` / ``parse_ipv4_mask`` / ``format_ipv4`` /
    ``format_ipv4_mask`` / ``ipv4_netmask_suffix`` / ``ipv4_compare``
    (min-effective-prefix masking, Kusto semantics) — plus
    ``has_any_index`` (0-based first-term index, -1 when absent) and
    ``set_has_element``.  All zero-exchange JVM expressions; the oracle
    replays each from the octet closed forms the IPs were synthesized
    from."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
events
| where event_id < 200
| extend ip = strcat('10.', tostring(event_id % 200), '.',
                     tostring(event_id % 256), '.',
                     tostring(event_id % 251)),
         cidr = strcat('10.', tostring(event_id % 200), '.0.0/16'),
         terms = dynamic(['7', 'k', '42'])
| project event_id,
    p = parse_ipv4(ip),
    pm = parse_ipv4_mask(ip, 24),
    f24 = format_ipv4(ip, 24),
    fm = format_ipv4_mask(ip, 20),
    sfx = ipv4_netmask_suffix(cidr),
    cmp = ipv4_compare(ip, '10.100.0.0/16'),
    inr = ipv4_is_in_range(ip, cidr),
    idx = has_any_index(props, terms),
    she = set_has_element(dynamic([1, 3, 5]), toint(event_id % 6))
| sort by event_id asc
""",
        dialect="kusto",
    )


@register(
    "kql_reduce_by",
    oracle="""
WITH s AS (
  SELECT event_type || '#' || (event_id % 1000) || '-' || user_id AS v
  FROM events)
SELECT regexp_replace(v, '[0-9]+', '*', 'g') AS Pattern,
       count(*) AS Count, min(v) AS Representative
FROM s GROUP BY 1 ORDER BY Count DESC, Pattern
""",
    tags=("kql", "dialect", "mining"),
)
def kql_reduce_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``reduce by`` (round 10): group string values by shape —
    (Pattern, Count, Representative).  Deterministic subset of Kusto's
    proprietary clustering heuristic: pattern = digit runs → '*' (the
    dominant log-template case), representative = group MIN.  ONE hash
    aggregate, all JVM — patterns aggregate map-side, so at 100 TB the
    shuffle carries one row per template, not per log line.  The oracle
    replays the same template rule with DuckDB's global regexp_replace."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
events
| extend s = strcat(event_type, '#', tostring(event_id % 1000), '-',
                    tostring(user_id))
| reduce by s
| sort by Count desc, Pattern asc
""",
        dialect="kusto",
    )


@register(
    "kql_diffpatterns",
    oracle="""
WITH d AS (
  SELECT CASE WHEN n_chars > 300 THEN 'big' ELSE 'small' END AS sz,
         lang, source FROM documents),
seg AS (
  SELECT CAST(sum(CASE WHEN sz = 'big' THEN 1 ELSE 0 END) AS BIGINT)
           AS CountA,
         CAST(sum(CASE WHEN sz = 'small' THEN 1 ELSE 0 END) AS BIGINT)
           AS CountB,
         100.0 * sum(CASE WHEN sz = 'big' THEN 1 ELSE 0 END)
           / (SELECT count(*) FROM d WHERE sz = 'big') AS pa,
         100.0 * sum(CASE WHEN sz = 'small' THEN 1 ELSE 0 END)
           / (SELECT count(*) FROM d WHERE sz = 'small') AS pb,
         lang, source
  FROM d GROUP BY GROUPING SETS ((lang), (source), (lang, source)))
SELECT CountA, CountB, round(pa, 6) AS PercentA, round(pb, 6) AS PercentB,
       round(abs(pa - pb), 6) AS PercentDiffAB,
       coalesce(lang, '*') AS lang1, coalesce(source, '*') AS source1
FROM seg WHERE abs(pa - pb) >= 0.002 * 100.0
ORDER BY PercentDiffAB DESC, lang1, source1
""",
    tags=("kql", "dialect", "mining"),
)
def kql_diffpatterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``evaluate diffpatterns`` (round 10): attribute patterns
    whose prevalence differs between two row splits (big vs small
    documents, split at the median length) — ONE CUBE aggregate computing both split counts map-side,
    kept when the percent-point gap ≥ threshold·100.  The oracle
    enumerates the same segments with explicit GROUPING SETS.  Wildcards
    are projected to '*' post-evaluate so the sort is engine-portable
    (NULL ordering differs between Spark and DuckDB)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
documents
| extend sz = iff(n_chars > 300, 'big', 'small')
| evaluate diffpatterns(sz, 'big', 'small', 0.002, lang, source)
| project CountA, CountB, PercentA, PercentB, PercentDiffAB,
          lang1 = coalesce(lang, '*'), source1 = coalesce(source, '*')
| sort by PercentDiffAB desc, lang1 asc, source1 asc
""",
        dialect="kusto",
    )


@register(
    "kql_autocluster",
    oracle="""
WITH d AS (SELECT lang, source FROM documents),
seg AS (
  SELECT count(*) AS cnt, lang, CAST(NULL AS VARCHAR) AS source,
         0 AS gl, 1 AS gs FROM d GROUP BY lang
  UNION ALL
  SELECT count(*), CAST(NULL AS VARCHAR), source, 1, 0 FROM d
  GROUP BY source
  UNION ALL
  SELECT count(*), lang, source, 0, 0 FROM d GROUP BY lang, source),
fseg AS (
  SELECT * FROM seg WHERE cnt >= 0.05 * (SELECT count(*) FROM d))
SELECT s.cnt AS Count,
       round(100.0 * s.cnt / (SELECT count(*) FROM d), 6) AS Percent,
       coalesce(s.lang, '*') AS lang1, coalesce(s.source, '*') AS source1
FROM fseg s
WHERE NOT EXISTS (
  SELECT 1 FROM fseg t
  WHERE (s.gl = 1 OR (t.gl = 0 AND t.lang IS NOT DISTINCT FROM s.lang))
    AND (s.gs = 1 OR (t.gs = 0 AND t.source IS NOT DISTINCT FROM s.source))
    AND t.gl + t.gs < s.gl + s.gs
    AND t.cnt * 2 >= s.cnt)
ORDER BY Count DESC, lang1, source1
""",
    tags=("kql", "dialect", "mining"),
)
def kql_autocluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``evaluate autocluster`` (round 10): maximal informative
    common patterns — CUBE segments covering ≥5% of rows, minus segments
    dominated by a strictly more specific pattern retaining ≥ half their
    rows (the size_weight=0.5 analog; deterministic subset of Kusto's
    heuristic).  The domination anti-join runs over the threshold-bounded
    segment set (≤ 1/thr per grouping set → broadcastable at any scale).
    The oracle enumerates the grouping sets explicitly and replays the
    same NOT EXISTS."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
documents
| evaluate autocluster(0.05, lang, source)
| project Count, Percent,
          lang1 = coalesce(lang, '*'), source1 = coalesce(source, '*')
| sort by Count desc, lang1 asc, source1 asc
""",
        dialect="kusto",
    )


@register(
    "kql_ipv4_lookup",
    oracle="""
SELECT event_id,
       '10.' || (event_id % 2) || '.' || (event_id % 256) || '.1' AS ip,
       CASE WHEN event_id % 2 = 1 THEN '10.1.0.0/16'
            ELSE '10.0.0.0/8' END AS cidr,
       CASE WHEN event_id % 2 = 1 THEN 'ten-one' ELSE 'ten' END AS net
FROM events WHERE event_id < 300 ORDER BY event_id
""",
    tags=("kql", "dialect", "ip", "join"),
)
def kql_ipv4_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``evaluate ipv4_lookup`` (round 10): CIDR containment
    enrichment, longest prefix winning.  Lowering is a pure EQUI-join
    pipeline — source rows fan out over the lookup's distinct prefix
    lengths (broadcast, ≤33), hash-join on (len, ip >> (32-len)), then
    one row_number window elects the longest prefix — so the fact side
    never enters a range/theta join at any scale.  Synthetic IPs land in
    both 10.0.0.0/8 and (odd ids) 10.1.0.0/16; the oracle replays the
    longest-prefix election as a closed form."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
let lk = datatable(cidr:string, net:string)
  ['10.0.0.0/8', 'ten', '10.1.0.0/16', 'ten-one', '192.168.0.0/16', 'priv'];
events
| where event_id < 300
| extend ip = strcat('10.', tostring(event_id % 2), '.',
                     tostring(event_id % 256), '.1')
| evaluate ipv4_lookup(lk, ip, cidr)
| project event_id, ip, cidr, net
| sort by event_id asc
""",
        dialect="kusto",
    )


@register(
    "kql_series_fit_2lines",
    oracle="""
SELECT * FROM (VALUES
 (CAST(1 AS BIGINT), CAST(4 AS INTEGER), CAST(1.0 AS DOUBLE),
  CAST(78.857143 AS DOUBLE), CAST(0.0 AS DOUBLE),
  '0.000000,2.000000,4.000000,6.000000,22.000000,20.000000,18.000000,16.000000'),
 (2, 3, 1.0, 2.75, 0.0,
  '5.000000,5.000000,5.000000,1.000000,2.000000,3.000000,4.000000,5.000000,6.000000'),
 (3, 5, 0.985463, 19.777778, 0.2875,
  '1.200000,4.200000,7.200000,10.200000,13.200000,11.000000,7.500000,4.000000,0.500000'),
 (4, CAST(NULL AS INTEGER), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
  CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR))
) AS t(g, si, rs, va, rv, lf) ORDER BY g
""",
    tags=("kql", "dialect", "timeseries"),
)
def kql_series_fit_2lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``series_fit_2lines`` (round 10): two-segment linear trend —
    every split is fitted closed-form in GLOBAL x, the minimum-RSS split
    wins (first index on exact ties), output (rsquare, split_idx,
    variance, rvariance, line_fit).  O(series²) per ROW, entirely JVM
    higher-order functions — never per table, zero exchanges, zero
    Python.  Planted series: an exact breakpoint (g=1), an exact
    flat-then-ramp (g=2), a noisy two-trend (g=3), and the n<4 NULL
    guard (g=4); the oracle pins the constants from an independent
    least-squares implementation (line_fit comma-joined at 6dp, the
    series convention)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
let t = datatable(g:long, y:dynamic)[
  1, dynamic([0.0, 2.0, 4.0, 6.0, 22.0, 20.0, 18.0, 16.0]),
  2, dynamic([5.0, 5.0, 5.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
  3, dynamic([1.0, 4.0, 8.0, 10.0, 13.0, 11.0, 7.0, 5.0, 0.0]),
  4, dynamic([1.0, 2.0, 3.0])];
t
| extend f = series_fit_2lines(y)
| project g, si = f.split_idx, rs = round(f.rsquare, 6),
          va = round(f.variance, 6), rv = round(f.rvariance, 6),
          lf = array_join(transform(f.line_fit,
                 __x -> format_string('%.6f', __x)), ',')
| sort by g asc
""",
        dialect="kusto",
    )


@register(
    "kql_activity_engagement",
    oracle="""
WITH b0 AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) * 86400 AS b0
  FROM events WHERE ts IS NOT NULL),
mx AS (SELECT max(b0) AS m FROM b0),
e AS (SELECT user_id, b0,
             unnest(generate_series(b0, b0 + 6 * 86400, 86400)) AS b
      FROM b0)
SELECT make_timestamp(b * 1000000) AS ts,
       CAST(COUNT(DISTINCT CASE WHEN b = b0 THEN user_id END) AS BIGINT)
         AS dcount_activities_inner,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dcount_activities_outer,
       round(COUNT(DISTINCT CASE WHEN b = b0 THEN user_id END)
             / CAST(COUNT(DISTINCT user_id) AS DOUBLE), 6) AS activity_ratio
FROM e, mx WHERE b <= m GROUP BY b ORDER BY ts
""",
    tags=("kql", "dialect", "activity"),
)
def kql_activity_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate activity_engagement`` (round 10): the DAU/WAU ratio —
    per 1d bin, distinct users that day vs the trailing 7d window, plus
    the engagement ratio.  Bounded bin fan-out (7 copies of the DISTINCT
    (user, day) pre-agg) + ONE hash aggregate — never a range join; the
    oracle replays the identical cover with generate_series."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
events
| where isnotnull(ts)
| evaluate activity_engagement(user_id, ts, 1d, 7d)
| sort by ts asc
""",
        dialect="kusto",
    )


@register(
    "kql_session_count",
    oracle="""
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
  FROM events WHERE ts IS NOT NULL),
l AS (SELECT user_id, t,
             lag(t) OVER (PARTITION BY user_id ORDER BY t) AS p FROM e)
SELECT make_timestamp((CAST(floor(t / 86400.0) AS BIGINT) * 86400)
                      * 1000000) AS ts,
       CAST(SUM(CASE WHEN p IS NULL OR t - p > 21600 THEN 1 ELSE 0 END)
            AS BIGINT) AS count_sessions
FROM l GROUP BY 1 ORDER BY ts
""",
    tags=("kql", "dialect", "activity"),
)
def kql_session_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate session_count`` (round 10): sessions STARTED per 1d
    bin under the 6h gap rule (a new session when no same-user activity
    within the preceding 6 hours).  ONE per-user lag window + one bin
    aggregate; tie-ordered rows share a timestamp so the gap set — and
    therefore the session count — is order-invariant.  The oracle
    replays the same lag predicate."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
events
| where isnotnull(ts)
| evaluate session_count(user_id, ts, 1d, 6h)
| sort by ts asc
""",
        dialect="kusto",
    )


@register(
    "kql_active_users_count",
    oracle="""
WITH p AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) * 86400 AS p0
  FROM events WHERE ts IS NOT NULL),
mx AS (SELECT max(p0) AS m FROM p),
f AS (SELECT user_id, p0,
             unnest(generate_series(p0, p0 + 6 * 86400, 86400)) AS b
      FROM p),
g AS (SELECT b, user_id FROM f, mx WHERE b <= m
      GROUP BY b, user_id HAVING COUNT(DISTINCT p0) >= 3)
SELECT make_timestamp(b * 1000000) AS ts,
       CAST(COUNT(*) AS BIGINT) AS dcount
FROM g GROUP BY b ORDER BY ts
""",
    tags=("kql", "dialect", "activity"),
)
def kql_active_users_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate active_users_count`` (round 10): rolling stickiness —
    per 1d bin, distinct users active on ≥3 DISTINCT days within the
    trailing 7d window.  DISTINCT (user, day) pre-agg → bounded 7-bin
    fan-out → (bin, user) aggregate with the distinct-period HAVING →
    bin count: two hash aggregates, no range join.  The oracle replays
    the identical cover."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
events
| where isnotnull(ts)
| evaluate active_users_count(user_id, ts, 7d, 1d, 3, 1d)
| sort by ts asc
""",
        dialect="kusto",
    )


@register(
    "kql_dcount_intersect",
    oracle="""
WITH g AS (
  SELECT event_type, user_id,
         SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS e2,
         SUM(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END) AS e3
  FROM events GROUP BY event_type, user_id)
SELECT event_type,
       CAST(SUM(CASE WHEN e2 > 0 AND e3 > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS exact_both,
       true AS intersect_ok
FROM g GROUP BY event_type ORDER BY event_type
""",
    tags=("kql", "dialect", "sketch"),
)
def kql_dcount_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``dcount_intersect`` (round 10): intersection cardinality by
    inclusion-exclusion over hll() sketches — |A∩B| = |A| + |B| − |A∪B|
    with Spark's hll_union.  Sketch estimates are engine-specific, so the
    driver-checked output is the accuracy CONTRACT: the estimated
    intersection of (users with an even event) ∩ (users with a mod-3
    event) per type lands within ±20% (±2 absolute for small sets) of
    the exact overlap the oracle computes."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
events
| summarize e2 = countif(event_id % 2 == 0),
            e3 = countif(event_id % 3 == 0) by event_type, user_id
| summarize h1 = hll(iff(e2 > 0, user_id, long(null))),
            h2 = hll(iff(e3 > 0, user_id, long(null))),
            exact_both = countif(e2 > 0 and e3 > 0) by event_type
| project event_type, exact_both,
          intersect_ok = abs(todouble(dcount_intersect(h1, h2))
                             - todouble(exact_both))
                         <= greatest(2.0, 0.2 * todouble(exact_both))
| sort by event_type asc
""",
        dialect="kusto",
    )


@register(
    "kql_geo_circle",
    oracle="""
WITH s AS (
  SELECT event_id,
         CAST(event_id % 160 - 80 AS DOUBLE) / 2 AS lon,
         CAST(event_id % 120 - 60 AS DOUBLE) / 2 AS lat
  FROM events WHERE event_id < 400)
SELECT event_id,
  2 * 6371000.0 * asin(least(1.0, sqrt(
    pow(sin(radians(lat - 10.0) / 2), 2)
    + cos(radians(10.0)) * cos(radians(lat))
    * pow(sin(radians(lon - 20.0) / 2), 2)))) <= 3000000.0 AS inside,
  round(2 * 6371000.0 * asin(least(1.0, sqrt(
      pow(sin(radians(0.0 - 0.0) / 2), 2)
      + cos(radians(0.0)) * cos(radians(0.0))
      * pow(sin(radians(1.0 - 0.0) / 2), 2))))
  + 2 * 6371000.0 * asin(least(1.0, sqrt(
      pow(sin(radians(1.0 - 0.0) / 2), 2)
      + cos(radians(0.0)) * cos(radians(1.0))
      * pow(sin(radians(1.0 - 1.0) / 2), 2)))), 3) AS seg_len
FROM s ORDER BY event_id
""",
    tags=("kql", "dialect", "geo"),
)
def kql_geo_circle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``geo_point_in_circle`` (round 10): haversine containment on
    the R=6371 km sphere — one boolean JVM expression sharing the
    geo_distance_2points closed form (same documented ≤0.5% WGS84
    deviation).  Synthetic points on a half-degree grid against a
    3000 km circle at (20°E, 10°N); the oracle replays the identical
    spherical formula."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
events
| where event_id < 400
| extend lon = todouble(event_id % 160 - 80) / 2,
         lat = todouble(event_id % 120 - 60) / 2
| project event_id,
          inside = geo_point_in_circle(lon, lat, 20.0, 10.0, 3000000.0),
          seg_len = round(geo_line_length(dynamic({"type": "LineString",
            "coordinates": [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]]})), 3)
| sort by event_id asc
""",
        dialect="kusto",
    )


@register(
    "chsql_geohash_roundtrip",
    oracle="""
SELECT event_id, true AS rt_ok
FROM events WHERE event_id < 300 ORDER BY event_id
""",
    tags=("chsql", "dialect", "geo"),
)
def chsql_geohash_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``geohashEncode`` / ``geohashDecode`` on the text path (round 10):
    pure JVM interval-halving folds (functions/geo.py::geohash_*_sql —
    zero Python, zero exchanges, shared with KQL's geo_point_to_geohash
    pair).  The driver-checked output is the round-trip CONTRACT — the
    decoded cell midpoint lands within half a precision-6 cell of the
    original point for every grid row; the BITWISE encode equality
    against the python reference (published test vectors) is pinned by
    pytest (test_geohash_sql_fold_matches_python_grid)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_id,
  (abs(d.lon - lon) <= 0.0056) AND (abs(d.lat - lat) <= 0.0028) AS rt_ok
FROM (
  SELECT event_id, lon, lat, geohashDecode(geohashEncode(lon, lat, 6)) AS d
  FROM (
    SELECT event_id,
           toFloat64(event_id % 160 - 80) / 2.3 AS lon,
           toFloat64(event_id % 120 - 60) / 2.7 AS lat
    FROM events WHERE event_id < 300) __g0) __g1
ORDER BY event_id
""",
        dialect="clickhouse",
    )


@register(
    "kql_scalar_vocab6",
    oracle=r"""
SELECT event_id,
  'long' AS t1, 'string' AS t2, 'dynamic' AS t3,
  true AS hs, true AS hm_ok,
  round(power(2.0, CAST(event_id % 16 AS DOUBLE)), 6) AS e2,
  round(power(10.0, CAST(event_id % 5 AS DOUBLE)), 6) AS e10,
  CAST(event_id % 5 = 0 OR event_id % 5 = 2 OR event_id % 5 = 4
       AS BOOLEAN) AS fin_chk,
  list_aggr(list_sort([event_id % 5, event_id % 3, event_id % 7]),
            'string_agg', ',') AS sa,
  list_aggr(list_reverse(list_sort(
            [event_id % 5, event_id % 3, event_id % 7])),
            'string_agg', ',') AS sd,
  CAST(event_id % 3 AS VARCHAR) || ',' || CAST(event_id % 7 AS VARCHAR)
    AS sl,
  CAST(1 AS BIGINT) AS bv,
  translate(event_type, 'ceu', 'CEU') AS tr,
  'a+' || event_type AS ue,
  'x ' || event_type AS ud,
  event_type || '\.' || CAST(event_id AS VARCHAR) AS rq
FROM events WHERE event_id < 150 ORDER BY event_id
""",
    tags=("kql", "dialect", "vocabulary"),
)
def kql_scalar_vocab6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KQL scalar batch 6 (round 10): ``gettype`` (runtime type names),
    ``hash``/``hash_combine`` (xxhash64-backed — exact seeds deviate from
    Kusto, so the checks are determinism/range contracts),
    ``isfinite``/``isinf``/``isnan`` (IEEE predicates incl. the
    real(+inf)/real(nan) typed literals), ``exp2``/``exp10``,
    ``array_sort_asc/desc``, ``array_slice`` (inclusive 0-based, negative
    wraps), ``array_split``, ``bag_merge`` (first-wins key union),
    ``bag_remove_keys``, ``translate`` (Kusto arg order),
    ``url_encode[_component]``/``url_decode``, ``regex_quote``.  All
    zero-exchange JVM expressions; the oracle replays every value as a
    closed form (list ops via DuckDB list functions, url/regex outputs
    from the alnum-safe charset of the synthesized inputs)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
events
| where event_id < 150
| extend arr = pack_array(event_id % 5, event_id % 3, event_id % 7)
| project event_id,
    t1 = gettype(event_id), t2 = gettype(props), t3 = gettype(arr),
    hs = hash(tostring(event_id)) == hash(tostring(event_id)),
    hm_ok = hash(tostring(event_id), 10) >= 0
            and hash(tostring(event_id), 10) < 10
            and hash_combine(event_id, 1) == hash_many(event_id, 1),
    e2 = round(exp2(todouble(event_id % 16)), 6),
    e10 = round(exp10(todouble(event_id % 5)), 6),
    fin_chk = isfinite(todouble(event_id % 5))
              and not(isinf(todouble(event_id % 5)))
              and not(isnan(todouble(event_id % 5)))
              and isinf(real(+inf)) and isnan(real(nan))
              and iff(event_id % 5 == 0 or event_id % 5 == 2
                      or event_id % 5 == 4, true, false),
    sa = strcat_array(array_sort_asc(arr), ','),
    sd = strcat_array(array_sort_desc(arr), ','),
    sl = strcat_array(array_slice(arr, 1, 2), ','),
    bv = bag_merge(bag_pack('k', 1), bag_pack('k', 9))['k'],
    tr = translate('ceu', 'CEU', event_type),
    ue = url_encode(strcat('a ', event_type)),
    ud = url_decode(strcat('x%20', event_type)),
    rq = regex_quote(strcat(event_type, '.', tostring(event_id)))
| sort by event_id asc
""",
        dialect="kusto",
    )


@register(
    "kql_agg_vocab7",
    oracle="""
WITH w AS (
  SELECT event_type, CAST(event_id % 100 AS DOUBLE) AS x,
         event_id % 3 + 1 AS wt,
         unnest(generate_series(1, event_id % 3 + 1)) AS rep
  FROM events)
SELECT e.event_type,
  round(covar_samp(value, CAST(event_id % 7 AS DOUBLE)), 6) AS cv,
  round(covar_pop(value, CAST(event_id % 7 AS DOUBLE)), 6) AS cvp,
  round(stddev_samp(CASE WHEN event_id % 2 = 0 THEN value END), 6)
    AS sdif,
  round(var_samp(CASE WHEN event_id % 2 = 0 THEN value END), 6) AS vrif,
  list_aggr(list_sort(list(event_id) FILTER (event_id % 97 = 0)),
            'string_agg', ',') AS mli,
  list_aggr(list_sort(list(DISTINCT event_id % 5)
                      FILTER (event_id % 2 = 1)), 'string_agg', ',')
    AS msi,
  CAST(count(*) AS INTEGER) AS ln_total,
  CAST(count(CASE WHEN event_id % 10 != 0 THEN 1 END) AS INTEGER)
    AS ln_nn,
  round((SELECT quantile_cont(x, 0.5) FROM w
         WHERE w.event_type = e.event_type), 6) AS pw,
  (SELECT printf('%.6f', quantile_cont(x, 0.25)) || ';'
          || printf('%.6f', quantile_cont(x, 0.75))
   FROM w WHERE w.event_type = e.event_type) AS pws,
  round(stddev_samp(value), 6) AS sd,
  round(stddev_pop(value), 6) AS sdp,
  round(var_samp(value), 6) AS vr,
  round(var_pop(value), 6) AS vrp,
  count(DISTINCT event_id % 11) AS cd,
  count(DISTINCT CASE WHEN event_id % 2 = 0 THEN event_id % 11 END) AS cdi,
  list_aggr(list_sort(list(DISTINCT CAST(event_id % 3 AS VARCHAR))
                      FILTER (event_id % 50 = 0)), 'string_agg', ',') AS mb
FROM events e GROUP BY e.event_type ORDER BY e.event_type
""",
    tags=("kql", "dialect", "aggregate", "vocabulary"),
)
def kql_agg_vocab7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KQL aggregate batch 7 (round 10): ``covariance``/``covariancep``
    (sample/population), ``stdevif``/``varianceif`` (conditional
    spreads), ``make_list_if``/``make_set_if`` (conditional collectors,
    sorted for determinism), ``make_list_with_nulls`` (struct-wrapper
    collection so NULLs survive — checked by total vs non-null length),
    bare ``stdev``/``stdevp``/``variance``/``variancep``,
    ``count_distinct[if]`` (exact), ``make_bag_if``,
    and ``percentilew`` (exact interpolated weighted percentile via
    Spark's percentile frequency argument).  The oracle replays the
    weighted percentile by physically expanding each row weight times."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
events
| summarize
    cv = round(covariance(value, todouble(event_id % 7)), 6),
    cvp = round(covariancep(value, todouble(event_id % 7)), 6),
    sdif = round(stdevif(value, event_id % 2 == 0), 6),
    vrif = round(varianceif(value, event_id % 2 == 0), 6),
    mli = strcat_array(array_sort_asc(
            make_list_if(event_id, event_id % 97 == 0)), ','),
    msi = strcat_array(array_sort_asc(
            make_set_if(event_id % 5, event_id % 2 == 1)), ','),
    ln_total = array_length(make_list_with_nulls(
            iff(event_id % 10 == 0, long(null), event_id))),
    ln_nn = array_length(make_list(
            iff(event_id % 10 == 0, long(null), event_id))),
    pw = round(percentilew(todouble(event_id % 100),
                           event_id % 3 + 1, 50), 6),
    pws = strcat_array(transform(array_sort_asc(percentilesw_array(
            todouble(event_id % 100), event_id % 3 + 1, 25, 75)),
            __x -> format_string('%.6f', __x)), ';'),
    sd = round(stdev(value), 6), sdp = round(stdevp(value), 6),
    vr = round(variance(value), 6), vrp = round(variancep(value), 6),
    cd = count_distinct(event_id % 11),
    cdi = count_distinctif(event_id % 11, event_id % 2 == 0),
    mb = strcat_array(array_sort(bag_keys(make_bag_if(
           bag_pack(tostring(event_id % 3), event_id),
           event_id % 50 == 0))), ',')
    by event_type
| sort by event_type asc
""",
        dialect="kusto",
    )


@register(
    "kql_find_source",
    oracle="""
SELECT * FROM (
  SELECT 'docs' AS source_, doc_id AS id, lang AS tag FROM documents
  WHERE doc_id < 40
  UNION ALL
  SELECT 'evts', event_id, event_type FROM events WHERE event_id < 40
) ORDER BY source_, id
""",
    tags=("kql", "dialect", "source"),
)
def kql_find_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``find`` source (round 10): cross-table search — one UNION
    ALL leg per table, each a filtered projection carrying the
    source-table name, so the predicate pushes into every leg's scan
    independently.  Subset: explicit project list shared by all legs
    (Kusto pads from schema knowledge the text path does not have).
    Searching a documents view and an events view for low ids; the
    oracle replays the same union."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
let docs = documents | project id = doc_id, tag = lang;
let evts = events | project id = event_id, tag = event_type;
find in (docs, evts) where id < 40 project id, tag
| sort by source_ asc, id asc
""",
        dialect="kusto",
    )


@register(
    "kql_scalar_vocab7",
    oracle="""
SELECT event_id,
  greatest(event_id % 7, event_id % 5, 3) AS m1,
  least(event_id % 7, event_id % 5, 3) AS m2,
  CAST(event_id AS VARCHAR) AS uq,
  CAST(event_id * 61 // 86400 AS VARCHAR) || '.' ||
    lpad(CAST(event_id * 61 % 86400 // 3600 AS VARCHAR), 2, '0') || ':' ||
    lpad(CAST(event_id * 61 % 3600 // 60 AS VARCHAR), 2, '0') || ':' ||
    lpad(CAST(event_id * 61 % 60 AS VARCHAR), 2, '0') AS ft,
  lpad(CAST(event_id * 61 // 3600 AS VARCHAR), 2, '0') || ':' ||
    lpad(CAST(event_id * 61 % 3600 // 60 AS VARCHAR), 2, '0') || ':' ||
    lpad(CAST(event_id * 61 % 60 AS VARCHAR), 2, '0') AS ft2,
  CAST(event_id AS VARCHAR) || '|a,' || event_type || '|z' AS cs,
  date_trunc('week', ts + INTERVAL 1 DAY) - INTERVAL 1 DAY AS sw,
  date_trunc('week', ts + INTERVAL 1 DAY) + INTERVAL 6 DAY
    - INTERVAL 1 MICROSECOND AS ew,
  CAST(dayofweek(ts) * 86400 AS BIGINT) AS dw,
  CAST((event_id % 3) * 86400 + (event_id % 24) * 3600
       + (event_id % 60) * 60 AS DOUBLE) + (event_id % 60) AS mt
FROM events WHERE event_id < 150 ORDER BY event_id
""",
    tags=("kql", "dialect", "vocabulary"),
)
def kql_scalar_vocab7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KQL scalar batch 7 (round 10): ``max_of``/``min_of`` (variadic
    extrema, NULLs ignored), ``parse_urlquery`` (decoded query-param
    bag), ``format_timespan`` (both canonical patterns), ``parse_csv``
    (quote-aware single-record split as ONE character fold), plus the
    datetime tail ``startofweek``/``endofweek`` (Sunday weeks),
    ``dayofweek`` (timespan since Sunday) and ``make_timespan``.  All
    zero-exchange JVM expressions; the oracle replays each closed form
    (the CSV case round-trips a quoted embedded comma)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
events
| where event_id < 150
| project event_id,
    m1 = max_of(event_id % 7, event_id % 5, 3),
    m2 = min_of(event_id % 7, event_id % 5, 3),
    uq = parse_urlquery(strcat('k=', tostring(event_id), '&t=',
                               event_type))['k'],
    ft = format_timespan(event_id * 61, 'd.hh:mm:ss'),
    ft2 = format_timespan(event_id * 61, 'hh:mm:ss'),
    cs = strcat_array(parse_csv(strcat(tostring(event_id), ',"a,',
                                       event_type, '",z')), '|'),
    sw = startofweek(ts), ew = endofweek(ts),
    dw = dayofweek(ts),
    mt = make_timespan(event_id % 3, event_id % 24, event_id % 60,
                       event_id % 60)
| sort by event_id asc
""",
        dialect="kusto",
    )


@register(
    "kql_row_rank",
    oracle="""
WITH s AS (
  SELECT event_id, event_type,
         CASE WHEN event_type IS NOT DISTINCT FROM
                   lag(event_type) OVER (ORDER BY event_id)
              THEN 0 ELSE 1 END AS chg,
         row_number() OVER (ORDER BY event_id) AS rn
  FROM events WHERE event_id < 400),
m AS (SELECT *, sum(chg) OVER (ORDER BY event_id
                               ROWS UNBOUNDED PRECEDING) AS run FROM s)
SELECT event_id, event_type, CAST(run AS BIGINT) AS rd,
       CAST(min(rn) OVER (PARTITION BY run) AS BIGINT) AS rm
FROM m ORDER BY event_id
""",
    tags=("kql", "dialect", "window"),
)
def kql_row_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``row_rank_dense`` / ``row_rank_min`` (round 10): serialized
    ranks that advance only when the term CHANGES from the previous row —
    a lag change-flag, its running sum, and (min form) a per-run min row
    number: chained windows over ONE serialized sort, one exchange.  The
    oracle replays the identical three-window chain."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
events
| where event_id < 400
| sort by event_id asc
| extend rd = row_rank_dense(event_type)
| sort by event_id asc
| extend rm = row_rank_min(event_type)
| project event_id, event_type, rd = tolong(rd), rm = tolong(rm)
| sort by event_id asc
""",
        dialect="kusto",
    )


@register(
    "kql_pivot_auto",
    oracle="""
SELECT user_id,
  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
    AS click,
  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
    AS error,
  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
    AS purchase,
  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT)
    AS signup,
  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
    AS view
FROM events GROUP BY user_id ORDER BY user_id
""",
    tags=("kql", "dialect", "pivot"),
)
def kql_pivot_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate pivot(col, agg)`` WITHOUT the value list (round 10):
    Kusto's data-derived output columns — one distinct scan of the pivot
    column (rows = output schema width, the bag_unpack bound) feeds the
    text-path PIVOT.  Upgrades the round-7 explicit-values subset to the
    real Kusto contract.  NULL counts coalesce to 0 (Kusto renders absent
    cells as empty longs).  The oracle enumerates the same per-type
    conditional sums."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        """
events
| project user_id, event_type
| evaluate pivot(event_type, count())
| sort by user_id asc
""",
        dialect="kusto",
    )
    return df.select(
        "user_id",
        *[
            F.coalesce(F.col(c), F.lit(0)).alias(c)
            for c in df.columns
            if c != "user_id"
        ],
    )


@register(
    "kql_find_schema_aware",
    oracle="""
SELECT 'documents' AS source_, doc_id, text, lang, source, n_chars,
       CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS TIMESTAMP) AS ts,
       CAST(NULL AS BIGINT) AS user_id, CAST(NULL AS VARCHAR) AS event_type,
       CAST(NULL AS DOUBLE) AS value, CAST(NULL AS VARCHAR) AS props
FROM documents WHERE lang = 'en' AND doc_id < 60 ORDER BY doc_id
""",
    tags=("kql", "dialect", "source"),
)
def kql_find_schema_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-aware ``find`` (round 10, the engine-level form): no project
    clause — the output is the first-seen UNION of every listed table's
    columns with typed-NULL padding, and tables whose schema cannot bind
    the predicate contribute no rows (Kusto: a predicate over a missing
    column never matches — here `lang` exists only in documents, so the
    events leg drops).  The oracle replays the surviving leg with
    explicit typed NULLs."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
find in (documents, events) where lang == 'en' and doc_id < 60
| sort by doc_id asc
""",
        dialect="kusto",
    )


@register(
    "kql_search_database",
    oracle="""
SELECT * FROM (
  SELECT 'customer' AS source_, count(*) AS n FROM customer
  WHERE lower(c_name) LIKE '%urgent%' OR lower(c_mktsegment) LIKE '%urgent%'
  UNION ALL SELECT 'documents', count(*) FROM documents
  WHERE lower(text) LIKE '%urgent%' OR lower(lang) LIKE '%urgent%'
     OR lower(source) LIKE '%urgent%'
  UNION ALL SELECT 'events', count(*) FROM events
  WHERE lower(event_type) LIKE '%urgent%' OR lower(props) LIKE '%urgent%'
  UNION ALL SELECT 'lineitem', count(*) FROM lineitem
  WHERE lower(l_returnflag) LIKE '%urgent%'
     OR lower(l_linestatus) LIKE '%urgent%'
  UNION ALL SELECT 'nation', count(*) FROM nation
  WHERE lower(n_name) LIKE '%urgent%'
  UNION ALL SELECT 'orders', count(*) FROM orders
  WHERE lower(o_orderstatus) LIKE '%urgent%'
     OR lower(o_orderpriority) LIKE '%urgent%'
  UNION ALL SELECT 'part', count(*) FROM part
  WHERE lower(p_name) LIKE '%urgent%' OR lower(p_brand) LIKE '%urgent%'
     OR lower(p_type) LIKE '%urgent%'
  UNION ALL SELECT 'region', count(*) FROM region
  WHERE lower(r_name) LIKE '%urgent%'
  UNION ALL SELECT 'supplier', count(*) FROM supplier
  WHERE lower(s_name) LIKE '%urgent%'
) WHERE n > 0 ORDER BY source_
""",
    tags=("kql", "dialect", "source", "search"),
)
def kql_search_database(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATABASE-WIDE ``search`` (round 10): no table prefix — Kusto scans
    every table in the database; the engine unions per-table
    string-column OR filters with typed-NULL padding (the schema-aware
    find machinery), and the trailing summarize re-enters the engine
    path over the union.  Filters push into every table's scan
    independently.  The oracle replays the per-table match counts with
    the same lowered-substring rule (tables with zero matches produce no
    group, and string-less tables contribute no leg)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
search "urgent"
| summarize n = count() by source_
| sort by source_ asc
""",
        dialect="kusto",
    )


@register(
    "kql_funnel_completion",
    oracle="""
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS DOUBLE) AS t, event_type
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'),
c1 AS (SELECT user_id, min(t) AS t1 FROM e
       WHERE event_type = 'signup' GROUP BY user_id),
c2 AS (SELECT e.user_id, min(e.t) AS t2 FROM e JOIN c1 USING (user_id)
       WHERE event_type = 'click' AND e.t > c1.t1 GROUP BY e.user_id),
c3 AS (SELECT e.user_id, min(e.t) AS t3 FROM e JOIN c2 USING (user_id)
       WHERE event_type = 'purchase' AND e.t >= c2.t2 GROUP BY e.user_id),
ch AS (SELECT c1.user_id, c1.t1, c2.t2, c3.t3
       FROM c1 LEFT JOIN c2 USING (user_id) LEFT JOIN c3 USING (user_id)),
w AS (SELECT unnest([86400, 604800]) AS w)
SELECT CAST(w.w AS BIGINT) AS Period,
  CAST(SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS signup,
  CAST(SUM(CASE WHEN t2 IS NOT NULL AND t2 - t1 <= w.w THEN 1 ELSE 0 END)
       AS BIGINT) AS click,
  CAST(SUM(CASE WHEN t3 IS NOT NULL AND t3 - t1 <= w.w THEN 1 ELSE 0 END)
       AS BIGINT) AS purchase
FROM ch CROSS JOIN w GROUP BY w.w ORDER BY Period
""",
    tags=("kql", "dialect", "activity", "funnel"),
)
def kql_funnel_completion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate funnel_sequence_completion`` (round 10 — the last
    member of the activity-plugin family): per max-window, ids completing
    each funnel prefix within the window of their first step, the
    greedy-earliest chain bound by ONE per-id sorted-collect fold (the
    scan-machine shape) + one window-exploded hash aggregate.  The
    oracle replays the chain as successive min-lookups under the fold's
    (second, state) sort-order tie rule (strict > into a
    lexicographically-earlier state, >= into a later one)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
events
| evaluate funnel_sequence_completion(user_id, ts,
    datetime(2024-01-01), datetime(2024-02-01), event_type,
    dynamic(['signup', 'click', 'purchase']), dynamic([1d, 7d]))
| sort by Period asc
""",
        dialect="kusto",
    )


@register(
    "kql_sequence_detect",
    oracle="""
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS DOUBLE) AS t, event_type
  FROM events WHERE ts IS NOT NULL),
c1 AS (SELECT user_id, min(t) AS t1 FROM e
       WHERE event_type = 'signup' GROUP BY user_id),
c2 AS (SELECT e.user_id, min(e.t) AS t2 FROM e JOIN c1 USING (user_id)
       WHERE event_type = 'click' AND e.t > c1.t1 GROUP BY e.user_id)
SELECT c1.user_id,
       make_timestamp(CAST(t1 AS BIGINT) * 1000000) AS s1,
       make_timestamp(CAST(t2 AS BIGINT) * 1000000) AS s2
FROM c1 JOIN c2 USING (user_id)
WHERE t2 - t1 <= 2 * 86400 ORDER BY c1.user_id
""",
    tags=("kql", "dialect", "activity", "funnel"),
)
def kql_sequence_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate sequence_detect`` (round 10): ids whose event stream
    contains the named predicate sequence within the step/span windows,
    output = the bound step timestamps.  Same greedy-earliest per-id
    fold as funnel_sequence_completion with GENERAL predicates (the bits
    evaluate before the collect, so arbitrary expressions ride the
    scan).  The oracle replays the chain as min-lookups under the
    (second, predicate-bits) sort-order tie rule."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
events
| where isnotnull(ts)
| evaluate sequence_detect(ts, 2d, 2d,
    s1 = event_type == 'signup', s2 = event_type == 'click', user_id)
| sort by user_id asc
""",
        dialect="kusto",
    )


@register(
    "kql_diffpatterns_text",
    oracle="""
WITH d AS (
  SELECT CASE WHEN n_chars > 300 THEN 'big' ELSE 'small' END AS sz,
         list_distinct(list_filter(string_split_regex(lower(text),
                       '[^a-z0-9]+'), x -> x != '')) AS terms
  FROM documents),
t AS (SELECT sz, unnest(terms) AS Term FROM d),
seg AS (
  SELECT Term,
         CAST(SUM(CASE WHEN sz = 'big' THEN 1 ELSE 0 END) AS BIGINT)
           AS CountA,
         CAST(SUM(CASE WHEN sz = 'small' THEN 1 ELSE 0 END) AS BIGINT)
           AS CountB,
         100.0 * SUM(CASE WHEN sz = 'big' THEN 1 ELSE 0 END)
           / (SELECT count(*) FROM d WHERE sz = 'big') AS pa,
         100.0 * SUM(CASE WHEN sz = 'small' THEN 1 ELSE 0 END)
           / (SELECT count(*) FROM d WHERE sz = 'small') AS pb
  FROM t GROUP BY Term)
SELECT Term, CountA, CountB, round(pa, 6) AS PercentA,
       round(pb, 6) AS PercentB, round(abs(pa - pb), 6) AS PercentDiffAB
FROM seg WHERE abs(pa - pb) >= 0.05 * 100.0
ORDER BY PercentDiffAB DESC, Term
""",
    tags=("kql", "dialect", "mining", "text"),
)
def kql_diffpatterns_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate diffpatterns_text`` (round 10): which TERMS differ in
    document-prevalence between the two splits (big vs small documents)
    — one tokenize-explode (per-row DISTINCT terms, Kusto counts a term
    once per record) + one term hash aggregate computing both split
    counts map-side.  The oracle replays the identical term rule with
    DuckDB list functions."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
documents
| extend sz = iff(n_chars > 300, 'big', 'small')
| evaluate diffpatterns_text(text, sz, 'big', 'small', 0.05)
| sort by PercentDiffAB desc, Term asc
""",
        dialect="kusto",
    )


@register(
    "kql_rolling_percentile",
    oracle="""
WITH b0 AS (
  SELECT value,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) * 86400 AS b0
  FROM events WHERE ts IS NOT NULL),
mx AS (SELECT max(b0) AS m FROM b0),
e AS (SELECT value,
             unnest(generate_series(b0, b0 + 6 * 86400, 86400)) AS b
      FROM b0)
SELECT make_timestamp(b * 1000000) AS ts,
       round(quantile_cont(value, 0.9), 6) AS rolling_percentile_90
FROM e, mx WHERE b <= m GROUP BY b ORDER BY ts
""",
    tags=("kql", "dialect", "activity", "timeseries"),
)
def kql_rolling_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``evaluate rolling_percentile`` (round 10): per 1d bin, the p90 of
    the value over the trailing 7 bins — bounded fan-out + ONE
    percentile hash aggregate (never a range join); exact interpolated
    percentile (the dialect-wide deviation from Kusto's T-digest).  The
    oracle replays the identical bin cover with quantile_cont; round(6)
    absorbs interpolation last-ulp spread."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.engine import ChSparkEngine

    df = ChSparkEngine(sf_dir, spark).sql(
        """
events
| where isnotnull(ts)
| evaluate rolling_percentile(value, 90, ts, 1d, 7)
| sort by ts asc
""",
        dialect="kusto",
    )
    return df.select("ts", F.round("rolling_percentile_90", 6).alias(
        "rolling_percentile_90"))


@register(
    "kql_scalar_vocab6b",
    oracle="""
WITH s AS (
  SELECT event_id,
         [event_id % 5, event_id % 3, event_id % 7, event_id % 11] AS arr
  FROM events WHERE event_id < 150)
SELECT event_id,
  coalesce(list_aggr(list_transform(arr[1:CAST(event_id % 4 AS INTEGER)],
            x -> CAST(x AS VARCHAR)), 'string_agg', ','), '') AS sp1,
  coalesce(list_aggr(list_transform(arr[CAST(event_id % 4 AS INTEGER) + 1:4],
            x -> CAST(x AS VARCHAR)), 'string_agg', ','), '') AS sp2,
  CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'a,b' END AS brk,
  'x%20' || CAST(event_id AS VARCHAR) || '%26' AS uc
FROM s ORDER BY event_id
""",
    tags=("kql", "dialect", "vocabulary"),
)
def kql_scalar_vocab6b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KQL scalar batch 6b (round 10 — registry coverage for the three
    batch-6 lowerings that had only smoke tests): ``array_split`` (both
    halves, varying split point incl. 0), ``bag_remove_keys``
    (surviving keys), ``url_encode_component`` (RFC-3986: space → %20,
    & → %26).  The oracle replays halves with DuckDB list slices and
    the encodes as closed-form strings (digits are never escaped)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
events
| where event_id < 150
| extend arr = pack_array(event_id % 5, event_id % 3, event_id % 7,
                          event_id % 11),
         halves = array_split(arr, toint(event_id % 4)),
         bag = bag_pack('a', 1, 'b', event_id, 'kill', 3)
| project event_id,
    sp1 = strcat_array(halves[0], ','),
    sp2 = strcat_array(halves[1], ','),
    brk = iff(event_id % 2 == 0,
              strcat_array(array_sort(bag_keys(bag_remove_keys(bag,
                dynamic(['kill', 'b', 'nope'])))), ','),
              strcat_array(array_sort(bag_keys(bag_remove_keys(
                bag_pack('a', 1, 'b', 2), dynamic(['nope'])))), ',')),
    uc = url_encode_component(strcat('x ', tostring(event_id), '&'))
| sort by event_id asc
""",
        dialect="kusto",
    )


@register(
    "kql_geo_polygon",
    oracle="""
WITH s AS (
  SELECT event_id, CAST(event_id % 41 AS DOUBLE) / 10 - 2 AS x,
         CAST(event_id % 37 AS DOUBLE) / 10 - 1.8 AS y
  FROM events WHERE event_id < 400)
SELECT event_id,
  ((CASE WHEN (0.0 > y) != (1.8 > y)
         AND x < (1.2 + (y - 0.0) * 0.30000000000000004
                  / 1.8) THEN 1 ELSE 0 END)
 + (CASE WHEN (1.8 > y) != (0.9 > y)
         AND x < (1.5 + (y - 1.8) * -1.5
                  / -0.9) THEN 1 ELSE 0 END)
 + (CASE WHEN (0.9 > y) != (-1.1 > y)
         AND x < (0.0 + (y - 0.9) * -1.3
                  / -2.0) THEN 1 ELSE 0 END)
 + (CASE WHEN (-1.1 > y) != (-0.4 > y)
         AND x < (-1.3 + (y - -1.1) * 1.7000000000000002
                  / 0.7000000000000001) THEN 1 ELSE 0 END)
 + (CASE WHEN (-0.4 > y) != (0.0 > y)
         AND x < (0.4 + (y - -0.4) * 0.7999999999999999
                  / 0.4) THEN 1 ELSE 0 END)
  ) % 2 = 1 AS inside
FROM s ORDER BY event_id
""",
    tags=("kql", "dialect", "geo"),
)
def kql_geo_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto ``geo_point_in_polygon`` (round 10): even-odd ray casting
    with the GeoJSON polygon parsed at TRANSPILE time — edge tests
    unroll into plain codegen'd comparisons, no arrays/UDF/shuffle (the
    pointInPolygon discipline).  A synthetic point grid against an
    irregular pentagon; the oracle replays the IDENTICAL unrolled edge
    arithmetic (same IEEE ops, same order → engine-deterministic)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
events
| where event_id < 400
| extend x = todouble(event_id % 41) / 10 - 2,
         y = todouble(event_id % 37) / 10 - 1.8
| project event_id,
    inside = geo_point_in_polygon(x, y, dynamic({"type": "Polygon",
      "coordinates": [[[1.2, 0.0], [1.5, 1.8], [0.0, 0.9],
                       [-1.3, -1.1], [0.4, -0.4], [1.2, 0.0]]]}))
| sort by event_id asc
""",
        dialect="kusto",
    )


@register(
    "chsql_vocab_r36",
    oracle="""
SELECT event_id,
  event_id - 3 AS mn, event_id * 2 AS ml,
  CAST(event_id AS DOUBLE) / 4 AS dv, -event_id AS ng,
  day(ts) AS dom, quarter(ts) AS qt, minute(ts) AS mnt,
  CAST(event_id % 100 AS SMALLINT) AS i16,
  CAST(event_id % 100 AS INTEGER) AS u16,
  CAST(event_id AS BIGINT) AS u64,
  ends_with(event_type, 'w') AS ew,
  substring(event_type, 2, 3) AS md,
  lpad(CAST(event_id AS VARCHAR), 6, '0') AS lp,
  '414243' AS uh,
  md5(event_type) AS md5h,
  levenshtein(event_type, 'click') AS ed,
  CAST(greatest(length(event_type), 5) - least(length(event_type), 5)
    + coalesce(list_sum(list_transform(range(least(length(event_type), 5)),
        i -> CASE WHEN substring(event_type, i + 1, 1)
                  <> substring('click', i + 1, 1) THEN 1 ELSE 0 END)), 0)
    AS INTEGER) AS mm,
  'sub.ex.org' AS dm, 'https' AS pr, 'k=1&j=2' AS qs, '2' AS eup,
  TRUE AS aex, '2,4' AS afl, 2 AS alst, '3,2,1' AS arv,
  '[{"0":1,"1":"a"},{"0":2,"1":"b"}]' AS az,
  TRUE AS mc, '2' AS mf,
  make_timestamp((1700000000 + event_id) * 1000000) AS fut,
  ts + INTERVAL 2 MONTH AS am, ts - INTERVAL 1 MONTH AS sm,
  ts - INTERVAL 3 HOUR AS sh, ts - INTERVAL 30 SECOND AS ss,
  CAST(timezone('America/New_York', timezone('UTC', ts)) AS TIMESTAMP) AS ttz,
  CAST(NULL AS BIGINT) AS acn, event_id AS acn2,
  '' AS eaf, '2,8' AS bta, CAST(11.0 AS DOUBLE) AS sp,
  '{3, 4}' AS tm,
  CAST(to_timestamp(floor(epoch(ts) / 900) * 900) AS TIMESTAMP) AS tus,
  CAST(to_timestamp(floor(epoch(ts) / 900) * 900) AS TIMESTAMP)
    + INTERVAL 15 MINUTE AS tue,
  '{"b":2}' AS jq,
  CASE WHEN regexp_matches(event_type, 'zzzz') THEN 1
       WHEN regexp_matches(event_type, '^c') THEN 2 ELSE 0 END AS mmi,
  TRUE AS nqh_ok, TRUE AS chh_ok, TRUE AS xx_ok, TRUE AS mur_ok,
  TRUE AS now_ok, TRUE AS utc_ok, TRUE AS rand_ok,
  '{1, -40.00, 60.00}' AS mss,
  lead(event_id, 1, 0) OVER (ORDER BY event_id) AS lif
FROM events WHERE event_id < 200 ORDER BY event_id
""",
    tags=("chsql", "dialect", "vocabulary"),
)
def chsql_vocab_r36(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 36 (round 11, the r10 verdict's FUNC-sweep item):
    the lowered-but-never-exercised CH names — arithmetic words
    (``minus``/``multiply``/``divide``/``negate``), date parts
    (``toDayOfMonth``/``toQuarter``/``toMinute``), integer casts
    (``toInt16``/``toUInt16``/``toUInt64``), string tools (``endsWith``/
    ``mid``/``leftPad``/``unhex``/``editDistance``/``mismatches``), URL
    parts (``domain``/``protocol``/``queryString``/
    ``extractURLParameter``), higher-order arrays (``arrayExists``/
    ``arrayFilter``/``arrayLast``/``arrayReverse``/``arrayZip``/
    ``emptyArrayFloat64``/``bitmaskToArray``/``scalarProduct``), maps
    (``mapContains``/``mapFilter``), datetime shifts (``fromUnixTimestamp``/
    ``addMonths``/``subtract*``/``toTimeZone``/``tumbleStart``/
    ``tumbleEnd``), ``accurateCastOrNull``, ``JSON_QUERY``,
    ``multiMatchAnyIndex``, ``tupleMinus``, the window ``leadInFrame``,
    and determinism/semantic contracts for the engine-specific hash tier
    (``MD5`` value-checked; ``cityHash64``/``xxHash32``/
    ``murmurHash3_32``/``normalizedQueryHash`` — the number-normalization
    identity SELECT 1 ≡ SELECT 2 — plus ``now64``/``UTCTimestamp``
    recency).  All whole-stage-codegen JVM expressions; the oracle replays
    closed forms (char-wise mismatch fold via a range transform in
    DuckDB)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_id,
  minus(event_id, 3) AS mn, multiply(event_id, 2) AS ml,
  divide(event_id, 4) AS dv, negate(event_id) AS ng,
  toDayOfMonth(ts) AS dom, toQuarter(ts) AS qt, toMinute(ts) AS mnt,
  toInt16(event_id % 100) AS i16, toUInt16(event_id % 100) AS u16,
  toUInt64(event_id) AS u64,
  endsWith(event_type, 'w') AS ew, mid(event_type, 2, 3) AS md,
  leftPad(toString(event_id), 6, '0') AS lp,
  hex(unhex('414243')) AS uh,
  MD5(event_type) AS md5h,
  editDistance(event_type, 'click') AS ed,
  mismatches(event_type, 'click') AS mm,
  domain('https://sub.ex.org/p?k=1') AS dm,
  protocol('https://sub.ex.org/p?k=1') AS pr,
  queryString('https://ex.org/p?k=1&j=2') AS qs,
  extractURLParameter('https://ex.org/p?k=1&j=2', 'j') AS eup,
  arrayExists(x -> x > 2, [1, 2, 3]) AS aex,
  arrayStringConcat(arrayMap(x -> toString(x),
    arrayFilter(x -> x % 2 = 0, [1, 2, 3, 4])), ',') AS afl,
  arrayLast(x -> x < 3, [1, 2, 5]) AS alst,
  arrayStringConcat(arrayMap(x -> toString(x),
    arrayReverse([1, 2, 3])), ',') AS arv,
  toJSONString(arrayZip([1, 2], ['a', 'b'])) AS az,
  mapContains(map('a', 1), 'a') AS mc,
  arrayStringConcat(arrayMap(x -> toString(x),
    mapValues(mapFilter((k, v) -> v > 1, map('a', 1, 'b', 2)))), ',') AS mf,
  fromUnixTimestamp(toInt64(1700000000) + event_id) AS fut,
  addMonths(ts, 2) AS am, subtractMonths(ts, 1) AS sm,
  subtractHours(ts, 3) AS sh, subtractSeconds(ts, 30) AS ss,
  toTimeZone(ts, 'America/New_York') AS ttz,
  accurateCastOrNull('12x', 'Int64') AS acn,
  accurateCastOrNull(toString(event_id), 'Int64') AS acn2,
  arrayStringConcat(arrayMap(x -> toString(x), emptyArrayFloat64()), ',') AS eaf,
  arrayStringConcat(arrayMap(x -> toString(x), bitmaskToArray(10)), ',') AS bta,
  scalarProduct([1.0, 2.0], [3.0, 4.0]) AS sp,
  toString(tupleMinus((5, 7), (2, 3))) AS tm,
  tumbleStart(ts, INTERVAL 15 MINUTE) AS tus,
  tumbleEnd(ts, INTERVAL 15 MINUTE) AS tue,
  JSON_QUERY('{"a": {"b": 2}}', '$.a') AS jq,
  multiMatchAnyIndex(event_type, ['zzzz', '^c']) AS mmi,
  normalizedQueryHash('SELECT 1') = normalizedQueryHash('SELECT 2') AS nqh_ok,
  cityHash64(event_type) = cityHash64(concat(event_type, '')) AS chh_ok,
  xxHash32(event_type) >= 0 AND xxHash32(event_type) <= 4294967295 AS xx_ok,
  murmurHash3_32(event_type) IS NOT NULL AS mur_ok,
  now64() >= toDateTime('2024-01-01 00:00:00') AS now_ok,
  UTCTimestamp() >= toDateTime('2024-01-01 00:00:00') AS utc_ok,
  rand() >= 0 AND rand() <= 4294967295 AS rand_ok,
  toString(minSampleSizeContinuous(10.0, 2.0, 5.0, 0.8, 0.05)) AS mss,
  leadInFrame(event_id, 1, 0) OVER (ORDER BY event_id) AS lif
FROM events WHERE event_id < 200 ORDER BY event_id
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r37",
    oracle="""
WITH e AS (
  SELECT event_type, value, event_id, user_id, event_id % 2 AS i
  FROM events WHERE event_id < 600 AND value IS NOT NULL
),
st AS (
  SELECT event_type, avg(value) AS mu, var_pop(value) AS vpp,
         count(*) AS n
  FROM e GROUP BY event_type
),
k4 AS (
  SELECT e.event_type,
         sum(pow(e.value - st.mu, 4)) AS s4
  FROM e JOIN st USING (event_type) GROUP BY e.event_type
),
ecdf AS (
  SELECT event_type, value, i,
         CAST(sum(CASE WHEN i = 0 THEN 1 ELSE 0 END)
              OVER (PARTITION BY event_type ORDER BY value) AS DOUBLE) AS c0,
         CAST(sum(CASE WHEN i <> 0 THEN 1 ELSE 0 END)
              OVER (PARTITION BY event_type ORDER BY value) AS DOUBLE) AS c1,
         CAST(sum(CASE WHEN i = 0 THEN 1 ELSE 0 END)
              OVER (PARTITION BY event_type) AS DOUBLE) AS n0,
         CAST(sum(CASE WHEN i <> 0 THEN 1 ELSE 0 END)
              OVER (PARTITION BY event_type) AS DOUBLE) AS n1
  FROM e
),
ks AS (
  SELECT event_type,
         round(max(abs(c0 / n0 - c1 / n1)), 6) AS d,
         max(abs(c0 / n0 - c1 / n1)) AS draw,
         any_value(n0) AS n0, any_value(n1) AS n1
  FROM ecdf GROUP BY event_type
),
ksp AS (
  SELECT event_type, d,
         (sqrt(n0 * n1 / (n0 + n1)) + 0.12
          + 0.11 / sqrt(n0 * n1 / (n0 + n1))) * draw AS lam
  FROM ks
)
SELECT e.event_type,
  round(var_pop(e.value), 6) AS vp,
  round(var_samp(e.value), 6) AS vs,
  round(stddev_samp(e.value), 6) AS sds,
  round(covar_pop(e.value, CAST(e.event_id AS DOUBLE)), 6) AS cvp,
  round(covar_samp(e.value, CAST(e.event_id AS DOUBLE)), 6) AS cvs,
  round(any_value(k4.s4) / any_value(st.n) / pow(any_value(st.vpp), 2)
        - 3, 6) AS kp,
  round(avg(CASE WHEN e.event_id % 3 = 0 THEN e.value END), 6) AS ai,
  round(quantile_cont(e.value, 0.5), 6) AS me,
  round(quantile_cont(e.value, 0.25), 6) AS qe25,
  round(quantile_cont(e.value, 0.75), 6) AS qe75,
  round(quantile_cont(e.value, 0.5), 6) AS qdet,
  count(DISTINCT e.user_id % 64) AS gbm,
  TRUE AS uniq_ok, TRUE AS td_ok, TRUE AS dd_ok, TRUE AS tds_ok,
  TRUE AS gas_len_ok, TRUE AS gas_rng_ok,
  any_value(ksp.d) AS ks_d,
  round(CASE WHEN any_value(ksp.lam) < 0.2 THEN 1.0
    ELSE least(1.0, greatest(0.0, 2 * list_sum(list_transform(
      range(1, 51), k -> (CASE WHEN k % 2 = 1 THEN 1.0 ELSE -1.0 END)
        * exp(-2 * k * k * any_value(ksp.lam) * any_value(ksp.lam))))))
    END, 6) AS ks_p
FROM e
JOIN st USING (event_type)
JOIN k4 USING (event_type)
JOIN ksp ON ksp.event_type = e.event_type
GROUP BY e.event_type
ORDER BY e.event_type
""",
    tags=("chsql", "dialect", "vocabulary", "aggregates"),
)
def chsql_vocab_r37(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 37 (round 11): the never-exercised AGGREGATE tier —
    moments (``varPop``/``varSamp``/``stddevSamp``/``covarPop``/
    ``covarSamp``/``kurtPop``), ``avgIf``, the exact quantile family
    (``medianExact``/``quantileExact``/``quantilesExact`` with
    ``arrayElement`` unpack/``quantileDeterministic``), ``groupBitmap``
    (cardinality = exact distinct), sketch-accuracy contracts
    (``uniq`` vs ``uniqExact``, ``quantileTDigest``/``quantileDD`` vs
    exact within 10% of the group range), ``groupArraySample`` size/range
    contracts, and **``kolmogorovSmirnovTest``** (new this round — the
    two-sample KS D statistic via one sorted-collect fold + the asymptotic
    Numerical-Recipes p-value; both the bare and the
    ``('two-sided', 'asymptotic')`` parametric forms; the oracle replays
    the ECDF with tie-aware RANGE windows and the identical p series).
    All one-shuffle hash aggregates; the KS fold collects per GROUP
    (bounded-group contract, the kql_scan_steps pattern)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_type,
  round(varPop(value), 6) AS vp,
  round(varSamp(value), 6) AS vs,
  round(stddevSamp(value), 6) AS sds,
  round(covarPop(value, toFloat64(event_id)), 6) AS cvp,
  round(covarSamp(value, toFloat64(event_id)), 6) AS cvs,
  round(kurtPop(value), 6) AS kp,
  round(avgIf(value, event_id % 3 = 0), 6) AS ai,
  round(medianExact(value), 6) AS me,
  round(quantileExact(0.25)(value), 6) AS qe25,
  round(arrayElement(quantilesExact(0.25, 0.75)(value), 2), 6) AS qe75,
  round(quantileDeterministic(0.5)(value, user_id), 6) AS qdet,
  groupBitmap(user_id % 64) AS gbm,
  abs(toFloat64(uniq(user_id)) - toFloat64(uniqExact(user_id)))
    / toFloat64(uniqExact(user_id)) <= 0.15 AS uniq_ok,
  abs(quantileTDigest(0.5)(value) - quantileExact(0.5)(value))
    <= 0.1 * (max(value) - min(value)) AS td_ok,
  abs(quantileDD(0.01, 0.5)(value) - quantileExact(0.5)(value))
    <= 0.1 * (max(value) - min(value)) AS dd_ok,
  abs(arrayElement(quantilesTDigest(0.5)(value), 1)
    - quantileExact(0.5)(value))
    <= 0.1 * (max(value) - min(value)) AS tds_ok,
  toInt64(arraySum(arrayMap(x -> 1, groupArraySample(5)(user_id))))
    = least(5, count()) AS gas_len_ok,
  arrayMin(groupArraySample(5)(user_id)) >= min(user_id)
    AND arrayMax(groupArraySample(5)(user_id)) <= max(user_id) AS gas_rng_ok,
  tupleElement(kolmogorovSmirnovTest(value, event_id % 2), 1) AS ks_d,
  tupleElement(kolmogorovSmirnovTest('two-sided', 'asymptotic')
    (value, event_id % 2), 2) AS ks_p
FROM events WHERE event_id < 600
GROUP BY event_type ORDER BY event_type
""",
        dialect="clickhouse",
    )


@register(
    "kql_scalar_vocab8",
    oracle="""
SELECT event_id,
  TRUE AS ago_ok,
  CASE WHEN event_id % 2 = 0 THEN 'even' ELSE 'odd' END AS iif_v,
  '[1, 8, 3]' AS aif,
  '{10.407485961914062, 57.64869689941406}' AS ghc,
  TRUE AS guid_ok,
  '{1.0, 3, 137.6, 0.0, [1.0, 2.0, 3.0, 10.0, 20.0, 30.0]}' AS sf2d,
  '{1.0, 1.0, 1.0, 0.0, 1.0, [1.0, 2.0, 3.0]}' AS sfld,
  '{1.0, 0, 5.0, 1, 3.0, 2.0, 4.0, 9.0, 3}' AS sstat,
  make_timestamp(1700000000000000 + event_id * 1000000) AS umt
FROM events WHERE event_id < 200 ORDER BY event_id
""",
    tags=("kql", "dialect", "vocabulary"),
)
def kql_scalar_vocab8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto scalar batch 8 (round 11, the FUNC-sweep closure): the
    lowered-but-never-exercised KQL names — ``ago`` (now-relative,
    recency/ordering contract), ``iif`` (the documented ``iff`` alias),
    ``array_ifs`` (element-wise conditional select), tostring'd
    ``geo_geohash_to_central_point`` (interval-halving decode, the
    geohash pair's other half), ``new_guid`` (RFC-4122 shape + per-call
    uniqueness contract — nondeterministic value, never compared),
    ``series_fit_line_dynamic``/``series_fit_2lines_dynamic`` (the
    bag-returning twins of the scalar fits — rendered via tostring; fixed
    literal series so the rendering is a known answer), ``series_stats``
    (9-field min/max/avg/variance bag), and
    ``unixtime_microseconds_todatetime`` (µs epoch → datetime,
    data-dependent, oracle via make_timestamp)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
events
| where event_id < 200
| project event_id,
    ago_ok = ago(2h) < now() and ago(1h) > ago(2h),
    iif_v = iif(event_id % 2 == 0, 'even', 'odd'),
    aif = tostring(array_ifs(dynamic([true, false, true]),
                             dynamic([1, 2, 3]), dynamic([9, 8, 7]))),
    ghc = tostring(geo_geohash_to_central_point('u4pruyd')),
    guid_ok = strlen(new_guid()) == 36 and new_guid() != new_guid(),
    sf2d = tostring(series_fit_2lines_dynamic(
        dynamic([1.0, 2.0, 3.0, 10.0, 20.0, 30.0]))),
    sfld = tostring(series_fit_line_dynamic(dynamic([1.0, 2.0, 3.0]))),
    sstat = tostring(series_stats(dynamic([1.0, 5.0, 3.0]))),
    umt = unixtime_microseconds_todatetime(1700000000000000
                                           + event_id * 1000000)
| sort by event_id asc
""",
        dialect="kusto",
    )
