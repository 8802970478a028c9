"""ClickHouse vocabulary — round-6 batch C (SURVEY §2.8 continuation).

New names: ``URLHierarchy`` / ``URLPathHierarchy`` (progressive URL prefix
arrays), ``punycodeEncode/Decode`` + ``idnaEncode/Decode`` (24.1, stdlib
codecs in Arrow-batched pandas UDFs), and ``jumpConsistentHash`` (the
Lamping-Veach jump consistent hash, arXiv:1406.2294 — CH's stable shard
router).

Oracle policy: the hierarchies replay structurally in DuckDB list SQL;
punycode/IDNA have no DuckDB equivalent → pinned known-answer literals +
roundtrip contracts (the base58 pattern); jumpConsistentHash is replayed
EXACTLY — the oracle unrolls the algorithm's LCG + double-multiply
iteration as chained CTEs in HUGEINT mod-2^64 arithmetic, so both engines
walk bitwise-identical trajectories (IEEE double division/truncation is
deterministic), and the n→n+1 minimal-movement property (moved keys land
ONLY in the new bucket) is asserted as a value column on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from clickhouseocp_spark.catalog import load_table
from clickhouseocp_spark.functions import clickhouse_names as ch
from clickhouseocp_spark.queries import register


@register(
    "url_hierarchy",
    oracle="""
WITH u AS (
  SELECT s_suppkey,
         'https://h' || s_suppkey % 7 || '.example.com' ||
         CASE s_suppkey % 4
              WHEN 0 THEN ''
              WHEN 1 THEN '/'
              WHEN 2 THEN '/a' || s_suppkey || '/b'
              ELSE '/a' || s_suppkey || '/b/c?q=' || s_suppkey
         END AS url
  FROM supplier
),
n AS (
  SELECT s_suppkey, url,
         regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)
           AS root
  FROM u
),
p AS (
  SELECT *,
         url[len(root) + 1 :] AS rest,
         string_split(split_part(url[len(root) + 1 :], '?', 1), '/') AS parts
  FROM n
),
built AS (
  SELECT s_suppkey,
         CASE WHEN len(rest) = 0 THEN []
              ELSE list_concat(
                [root || '/'],
                list_concat(
                  CASE WHEN len(parts) >= 3
                       THEN list_transform(
                              range(2, len(parts)),
                              i -> root || array_to_string(parts[1:i], '/')
                                   || '/')
                       ELSE [] END,
                  CASE WHEN len(rest) > 0 AND url[-1:] <> '/'
                       THEN [url] ELSE [] END))
         END AS hier,
         root
  FROM p
)
SELECT s_suppkey,
       COALESCE(array_to_string(hier, ' '), '') AS hierarchy,
       COALESCE(array_to_string(
         list_filter(
           list_transform(hier, x -> x[len(root) + 1 :]),
           x -> x <> '/'),
         ' '), '') AS path_hierarchy
FROM built
""",
    tags=("scalar", "url", "vocab"),
)
def url_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``URLHierarchy`` / ``URLPathHierarchy``: progressive URL prefix
    arrays cut at each path separator (CH docs semantics: intermediates
    keep the trailing '/', the final element is the full URL;
    URLPathHierarchy drops the bare '/').  Four shapes exercised per
    supplier row: bare host, host + '/', two-segment path, three-segment
    path + query string.  Pure split/slice expressions; the oracle replays
    the same construction in DuckDB list SQL."""
    s = load_table(spark, sf_dir, "supplier")
    url = F.concat(
        F.lit("https://h"),
        (F.col("s_suppkey") % 7).cast("string"),
        F.lit(".example.com"),
        F.when(F.col("s_suppkey") % 4 == 0, F.lit(""))
        .when(F.col("s_suppkey") % 4 == 1, F.lit("/"))
        .when(
            F.col("s_suppkey") % 4 == 2,
            F.concat(F.lit("/a"), F.col("s_suppkey").cast("string"), F.lit("/b")),
        )
        .otherwise(
            F.concat(
                F.lit("/a"),
                F.col("s_suppkey").cast("string"),
                F.lit("/b/c?q="),
                F.col("s_suppkey").cast("string"),
            )
        ),
    )
    d = s.select("s_suppkey", url.alias("url"))
    return d.select(
        "s_suppkey",
        F.array_join(ch.URLHierarchy(F.col("url")), " ").alias("hierarchy"),
        F.array_join(ch.URLPathHierarchy(F.col("url")), " ").alias(
            "path_hierarchy"
        ),
    )


@register(
    "punycode_idna",
    oracle="""
SELECT n_nationkey,
       TRUE AS puny_rt_ok,
       TRUE AS idna_rt_ok,
       'mnchen-3ya' AS puny_pin,
       'xn--bcher-kva.de' AS idna_pin
FROM nation
""",
    tags=("scalar", "encoding", "vocab"),
)
def punycode_idna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``punycodeEncode/Decode`` + ``idnaEncode/Decode`` (CH 24.1): RFC
    3492 bootstring via the stdlib codecs in Arrow-batched pandas UDFs.
    No DuckDB equivalent exists, so — the base58 pattern — each row carries
    a decode∘encode == identity contract over a row-varying unicode string
    (nation name + 'ü' + key) and the textbook pinned vectors
    ('münchen' → 'mnchen-3ya', 'bücher.de' → 'xn--bcher-kva.de') the
    oracle value-matches."""
    n = load_table(spark, sf_dir, "nation")
    uni = F.concat(F.lower("n_name"), F.lit("ü"), F.col("n_nationkey").cast("string"))
    host = F.concat(F.lit("ü"), F.lower("n_name"))
    return n.select(
        "n_nationkey",
        (ch.punycodeDecode(ch.punycodeEncode(uni)) == uni).alias("puny_rt_ok"),
        (ch.idnaDecode(ch.idnaEncode(host)) == host).alias("idna_rt_ok"),
        ch.punycodeEncode(F.lit("münchen")).alias("puny_pin"),
        ch.idnaEncode(F.lit("bücher.de")).alias("idna_pin"),
    )


def _jump_oracle(nb: int, key_expr: str, iters: int, out: str) -> str:
    """Chained-CTE replay of the Lamping-Veach loop for ``nb`` buckets:
    state (k HUGEINT, b, j) stepped ``iters`` times with the j<nb guard
    frozen via CASE — identical arithmetic to the numpy kernel."""
    m = "2862933555777941757"
    mod = "18446744073709551616"
    shift = "8589934592"  # 2^33
    ctes = [
        f"{out}0 AS (SELECT *, CAST({key_expr} AS HUGEINT) AS {out}_k, "
        f"CAST(-1 AS BIGINT) AS {out}_b, CAST(0 AS BIGINT) AS {out}_j FROM src)"
    ]
    for i in range(1, iters + 1):
        p = f"{out}{i - 1}"
        ctes.append(
            f"{out}{i} AS (SELECT * REPLACE ("
            f"CASE WHEN {p}.{out}_j < {nb} THEN ({p}.{out}_k * {m} + 1) % {mod} "
            f"ELSE {p}.{out}_k END AS {out}_k, "
            f"CASE WHEN {p}.{out}_j < {nb} THEN {p}.{out}_j ELSE {p}.{out}_b END "
            f"AS {out}_b, "
            f"CASE WHEN {p}.{out}_j < {nb} THEN CAST(TRUNC(({p}.{out}_j + 1) * "
            f"(2147483648.0 / CAST((({p}.{out}_k * {m} + 1) % {mod}) // {shift} "
            f"+ 1 AS DOUBLE))) AS BIGINT) ELSE {p}.{out}_j END AS {out}_j) "
            f"FROM {p})"
        )
    return ",\n".join(ctes)


_JUMP_ORACLE = f"""
WITH src AS (
  SELECT o_orderkey FROM orders WHERE o_orderkey < 2000
),
{_jump_oracle(8, "o_orderkey", 10, "a")},
{_jump_oracle(9, "o_orderkey", 11, "b")}
SELECT a10.o_orderkey AS o_orderkey,
       a10.a_b AS bucket8,
       b11.b_b AS bucket9,
       (a10.a_b = b11.b_b) OR (b11.b_b = 8) AS minimal_move_ok
FROM a10 JOIN b11 USING (o_orderkey)
"""


@register(
    "jump_consistent_hash",
    oracle=_JUMP_ORACLE,
    tags=("scalar", "hash", "vocab"),
)
def jump_consistent_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``jumpConsistentHash`` (Lamping-Veach, arXiv:1406.2294 — CH's stable
    shard router, THE primitive for minimal-movement resharding at 100 TB):
    bucket assignment at n=8 and n=9 for every orderkey, plus the paper's
    defining property as a value column — growing n by one moves a key ONLY
    into the new bucket (``minimal_move_ok``).  The oracle replays the
    algorithm exactly: chained CTEs step the uint64 LCG in HUGEINT mod-2^64
    arithmetic with the same double multiply/truncate per iteration, so
    bucket values (not just the property) are value-matched across engines.
    Spark side: one vectorized numpy kernel (masked iteration, ≤ n passes),
    Arrow-batched — no shuffle beyond the scan."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    out = o.select(
        "o_orderkey",
        ch.jumpConsistentHash(F.col("o_orderkey"), 8).alias("bucket8"),
        ch.jumpConsistentHash(F.col("o_orderkey"), 9).alias("bucket9"),
    )
    return out.select(
        "o_orderkey",
        "bucket8",
        "bucket9",
        ((F.col("bucket8") == F.col("bucket9")) | (F.col("bucket9") == 8)).alias(
            "minimal_move_ok"
        ),
    )
