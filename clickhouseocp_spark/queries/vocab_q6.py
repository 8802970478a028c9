"""ClickHouse scalar/aggregate vocabulary — round-6 batch (SURVEY §2.8
continuation; round-5 verdict "next round" #6).

New names this batch: ``topLevelDomain`` / ``cutToFirstSignificantSubdomain``
(completing the URL registrable-domain family), ``arrayRotateLeft/Right`` +
``arrayShiftLeft/Right`` (CH 23.8 array motion ops, pure slice/concat),
``parseDateTimeBestEffort`` (tolerant multi-layout parsing, *OrNull
contract), ``groupArrayMovingAvg`` (window moving average with CH's
divide-by-window-size rule), and — through the TEXT path (chsql_q.py
round-6 batch) — the completed ``formatDateTime`` specifier set plus
``uniqCombined64``.

Oracle policy: everything is replayed structurally in DuckDB (list slicing
for rotations, strftime for format codes, direct expected-timestamp values
for best-effort parsing — the parse is an identity round-trip by
construction, so the oracle pins the input date itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from clickhouseocp_spark.catalog import load_table
from clickhouseocp_spark.functions import clickhouse_names as ch
from clickhouseocp_spark.queries import register


@register(
    "url_vocab_r6",
    oracle="""
WITH u AS (
  SELECT s_suppkey,
         CASE WHEN s_suppkey % 5 = 0 THEN 'http://localhost/x'
              WHEN s_suppkey % 5 = 1 THEN 'no scheme at all'
              ELSE 'https://u@www.sup' || s_suppkey ||
                   CASE WHEN s_suppkey % 2 = 0 THEN '.co.uk' ELSE '.org' END
                   || ':8443/item' || s_suppkey
         END AS url
  FROM supplier
),
n AS (
  SELECT s_suppkey, url,
         regexp_replace(
           regexp_replace(
             regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1),
             '^[^@]*@', ''),
           ':[0-9]*$', '') AS host
  FROM u
),
p AS (SELECT *, string_split(host, '.') AS parts FROM n),
q AS (
  SELECT *,
         CASE WHEN len(parts) >= 2 THEN parts[-2] || '.' || parts[-1]
              ELSE '' END AS last2
  FROM p
)
SELECT s_suppkey,
       CASE WHEN len(parts) >= 2 THEN parts[-1] ELSE '' END AS tld,
       CASE WHEN last2 IN ('co.uk','org.uk','gov.uk','ac.uk','com.cn',
                           'com.au','co.jp','com.br','co.in')
            THEN CASE WHEN len(parts) >= 3
                      THEN parts[-3] || '.' || last2 ELSE '' END
            ELSE last2 END AS cut_fsd,
       CASE WHEN last2 IN ('co.uk','org.uk','gov.uk','ac.uk','com.cn',
                           'com.au','co.jp','com.br','co.in')
            THEN COALESCE(parts[-3], '')
            WHEN len(parts) >= 2 THEN parts[-2]
            ELSE '' END AS fsd
FROM q
""",
    tags=("scalar", "url", "vocab"),
)
def url_vocab_r6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL family batch C (round 6): ``topLevelDomain`` and
    ``cutToFirstSignificantSubdomain`` complete the registrable-domain
    family, with the round-6 ANSI hardening exercised in-query — one row in
    five is a single-label host (localhost) and one is scheme-less, both of
    which must yield '' (plain element_at would raise INVALID_ARRAY_INDEX
    under the session ANSI pin).  Userinfo and :port stripping shared with
    firstSignificantSubdomain.  Pure regexp/array expressions — replayed
    structurally by the oracle."""
    s = load_table(spark, sf_dir, "supplier")
    url = (
        F.when(F.col("s_suppkey") % 5 == 0, F.lit("http://localhost/x"))
        .when(F.col("s_suppkey") % 5 == 1, F.lit("no scheme at all"))
        .otherwise(
            F.concat(
                F.lit("https://u@www.sup"),
                F.col("s_suppkey").cast("string"),
                F.when(F.col("s_suppkey") % 2 == 0, ".co.uk").otherwise(".org"),
                F.lit(":8443/item"),
                F.col("s_suppkey").cast("string"),
            )
        )
    )
    d = s.select("s_suppkey", url.alias("url"))
    return d.select(
        "s_suppkey",
        ch.topLevelDomain(F.col("url")).alias("tld"),
        ch.cutToFirstSignificantSubdomain(F.col("url")).alias("cut_fsd"),
        ch.firstSignificantSubdomain(F.col("url")).alias("fsd"),
    )


@register(
    "array_rotate_shift",
    oracle="""
WITH g AS (
  SELECT l_orderkey, list_sort(list(l_linenumber)) AS l
  FROM lineitem WHERE l_orderkey < 300 GROUP BY l_orderkey
),
k AS (SELECT *, 2 % len(l) AS k2, least(2, len(l)) AS s2 FROM g)
SELECT l_orderkey,
       array_to_string(l, ',') AS arr,
       array_to_string(list_concat(l[k2 + 1 :], l[1 : k2]), ',') AS rot_l2,
       array_to_string(
         list_concat(l[((len(l) - k2) % len(l)) + 1 :],
                     l[1 : (len(l) - k2) % len(l)]), ',') AS rot_r2,
       array_to_string(
         list_concat(l[s2 + 1 :],
                     list_transform(range(s2), x -> 0)), ',') AS shift_l2,
       array_to_string(
         list_concat([99], l[1 : len(l) - 1]), ',') AS shift_r1
FROM k
""",
    tags=("scalar", "array", "vocab"),
)
def array_rotate_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``arrayRotateLeft/Right`` + ``arrayShiftLeft/Right`` (CH 23.8):
    slice/concat compositions, all JVM-side — pmod normalizes the rotation
    for any array length (single-lineitem orders exercise the len < n
    edge, where rotation is the identity and shiftLeft pads fully).  The
    oracle replays with DuckDB list slicing and the same modular
    arithmetic.  Rendered as comma-joined strings (list cells never reach
    the driver hash)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    g = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_linenumber")).alias("l")
    )

    def s(col):
        return F.array_join(F.transform(col, lambda x: x.cast("string")), ",")

    return g.select(
        "l_orderkey",
        s(F.col("l")).alias("arr"),
        s(ch.arrayRotateLeft(F.col("l"), 2)).alias("rot_l2"),
        s(ch.arrayRotateRight(F.col("l"), 2)).alias("rot_r2"),
        s(ch.arrayShiftLeft(F.col("l"), 2, F.lit(0))).alias("shift_l2"),
        s(ch.arrayShiftRight(F.col("l"), 1, F.lit(99))).alias("shift_r1"),
    )


@register(
    "datetime_best_effort",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS from_slash,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS from_dotted,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS from_compact,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS from_epoch,
       'NULL' AS from_garbage
FROM orders WHERE o_orderkey < 300
""",
    tags=("scalar", "datetime", "vocab"),
)
def datetime_best_effort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``parseDateTimeBestEffort``: four real-world layouts (slash,
    European dotted, compact 14-digit, unix epoch seconds) each rendered
    from o_orderdate and parsed back — the round trip is the identity, so
    the oracle pins the source timestamp directly; garbage parses to NULL
    (the *OrNull contract).  All coalesced try_to_timestamp chains —
    JVM-side, no UDF."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)

    def back(rendered):
        return F.date_format(
            ch.parseDateTimeBestEffort(rendered), "yyyy-MM-dd HH:mm:ss"
        )

    ts = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        back(F.date_format(ts, "yyyy/MM/dd HH:mm:ss")).alias("from_slash"),
        back(F.date_format(ts, "dd.MM.yyyy HH:mm:ss")).alias("from_dotted"),
        back(F.date_format(ts, "yyyyMMddHHmmss")).alias("from_compact"),
        back(F.unix_timestamp(ts).cast("string")).alias("from_epoch"),
        F.coalesce(
            back(F.lit("certainly not a timestamp")), F.lit("NULL")
        ).alias("from_garbage"),
    )


@register(
    "group_array_moving_avg",
    oracle="""
WITH m AS (
  SELECT o_orderpriority, o_orderdate, o_orderkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
              OVER (PARTITION BY o_orderpriority
                    ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
              / 3 AS DOUBLE) AS mov
  FROM orders WHERE o_custkey % 200 = 0
)
SELECT o_orderpriority,
       string_agg(printf('%.6f', mov), ',' ORDER BY o_orderdate, o_orderkey)
         AS moving_avgs
FROM m GROUP BY o_orderpriority
""",
    tags=("agg", "window", "vocab"),
)
def group_array_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupArrayMovingAvg(3): CH divides the moving SUM by the window size
    w even for the first w-1 rows (documented CH behavior — not a true
    partial-window mean), so avg_i = movingSum_i / 3 exactly; decimal-routed
    sum keeps the division deterministic.  Same order-preserving collect
    composition as group_array_moving_sum."""
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 200 == 0)
    mov = orders.withColumn(
        "mov",
        (F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(w) / 3).cast(
            "double"
        ),
    )
    return mov.groupBy("o_orderpriority").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("o_orderdate", "o_orderkey", "mov"))
                ),
                lambda s: F.format_string("%.6f", s["mov"]),
            ),
        ).alias("moving_avgs")
    )
