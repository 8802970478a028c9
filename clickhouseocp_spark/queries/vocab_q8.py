"""ClickHouse vocabulary — round-7 batch (SURVEY §2.8 continuation,
"batch 11").

New names: ``formatReadableDecimalSize`` (the 1000-step SI sibling of
formatReadableSize), the 25.x ``toStartOfInterval(ts, INTERVAL, origin)``
third-argument overload, ``arrayZipUnaligned`` (24.8), ``mapSort`` /
``mapReverseSort``, ``sequenceMatchEvents`` (the timestamps-returning
sequence matcher), and ``quantileInterpolatedWeighted``.

Oracle policy: format/interval/zip/map replay structurally in DuckDB SQL;
sequenceMatchEvents replays the greedy-earliest chain as chained
min-after-previous CTEs; quantileInterpolatedWeighted is defined as the
interpolated quantile of the weight-expanded multiset (PERCENTILE_CONT
semantics over weights-as-repeat-counts), so the oracle is DuckDB's
``quantile_cont`` over an unnest-expanded relation — bitwise-comparable
after round(6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from clickhouseocp_spark.catalog import load_table
from clickhouseocp_spark.functions import clickhouse_names as ch
from clickhouseocp_spark.queries import register


@register(
    "format_readable_decimal_size",
    oracle="""
WITH src AS (
  SELECT DISTINCT n_chars,
         CAST(n_chars AS DOUBLE) * 1000000 + 7 AS big
  FROM documents
),
calc AS (
  SELECT n_chars, big,
         CASE WHEN n_chars < 1000 THEN 0
              ELSE CAST(least(floor(log10(CAST(n_chars AS DOUBLE)) / 3), 8)
                        AS INTEGER)
         END AS ui,
         CASE WHEN big < 1000 THEN 0
              ELSE CAST(least(floor(log10(big) / 3), 8) AS INTEGER)
         END AS bi
  FROM src
)
SELECT n_chars,
       CAST(CAST(ROUND(n_chars / power(10.0, ui * 3), 2) AS DECIMAL(18,2))
            AS VARCHAR)
         || ' ' || ['B','KB','MB','GB','TB','PB','EB','ZB','YB'][ui + 1]
         AS readable_small,
       CAST(CAST(ROUND(big / power(10.0, bi * 3), 2) AS DECIMAL(18,2))
            AS VARCHAR)
         || ' ' || ['B','KB','MB','GB','TB','PB','EB','ZB','YB'][bi + 1]
         AS readable_big
FROM calc
""",
    tags=("scalar", "format"),
)
def format_readable_decimal_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``formatReadableDecimalSize`` (22.x): decimal-SI byte rendering
    ('1.23 MB', 1000-steps) completing the formatReadable* family
    (Size/Quantity/TimeDelta already covered).  Pure per-row columnar
    exprs; DECIMAL(18,2)→string pins trailing zeros on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.select(
        "n_chars",
        (F.col("n_chars").cast("double") * 1_000_000 + 7).alias("big"),
    ).distinct()
    return src.select(
        "n_chars",
        ch.formatReadableDecimalSize(F.col("n_chars")).alias("readable_small"),
        ch.formatReadableDecimalSize(F.col("big")).alias("readable_big"),
    )


@register(
    "to_start_of_interval_origin",
    oracle="""
WITH b AS (
  SELECT CAST(to_timestamp(epoch(TIMESTAMP '2024-01-01 00:17:00')
           + CAST(floor((epoch(ts) - epoch(TIMESTAMP '2024-01-01 00:17:00'))
                        / 2700) AS BIGINT) * 2700) AS TIMESTAMP) AS bucket45,
         CAST(to_timestamp(epoch(TIMESTAMP '2024-01-03 12:00:00')
           + CAST(floor((epoch(ts) - epoch(TIMESTAMP '2024-01-03 12:00:00'))
                        / 172800) AS BIGINT) * 172800) AS TIMESTAMP) AS bucket2d,
         value
  FROM events
)
SELECT bucket2d, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT bucket45) AS BIGINT) AS sub_buckets,
       MIN(value) AS mn
FROM b GROUP BY bucket2d ORDER BY bucket2d
""",
    tags=("scalar", "datetime"),
)
def to_start_of_interval_origin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``toStartOfInterval(ts, INTERVAL n unit, origin)`` — the 25.x
    third-argument overload: buckets align to an arbitrary origin's grid
    instead of the epoch/calendar grid (subset: fixed-width sub-month
    units).  Lowered to pure epoch arithmetic (functions/
    clickhouse_names.py::toStartOfIntervalOrigin) — negative offsets before
    the origin floor correctly on both engines.  45-minute sub-buckets
    counted inside 2-day origin-aligned buckets."""
    ev = load_table(spark, sf_dir, "events")
    o45 = F.lit("2024-01-01 00:17:00").cast("timestamp")
    o2d = F.lit("2024-01-03 12:00:00").cast("timestamp")
    b = ev.select(
        ch.toStartOfIntervalOrigin(F.col("ts"), "45 minute", o45).alias("bucket45"),
        ch.toStartOfIntervalOrigin(F.col("ts"), "2 day", o2d).alias("bucket2d"),
        "value",
    )
    return (
        b.groupBy("bucket2d")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("bucket45").alias("sub_buckets"),
            F.min("value").alias("mn"),
        )
        .orderBy("bucket2d")
    )


@register(
    "array_zip_map_sort",
    oracle="""
WITH src AS (
  SELECT s_suppkey AS k,
         [CAST(s_suppkey AS BIGINT), CAST(s_nationkey AS BIGINT),
          CAST(s_suppkey % 7 AS BIGINT)] AS a1,
         [CAST(s_nationkey * 2 AS BIGINT), CAST(s_suppkey + 1 AS BIGINT)] AS a2,
         ['k' || (s_suppkey % 5), 'k' || ((s_suppkey + 2) % 5),
          'k' || ((s_suppkey + 4) % 5)] AS mkeys
  FROM supplier
),
z AS (
  SELECT k,
         list_transform(range(1, greatest(len(a1), len(a2)) + 1),
           i -> COALESCE(CAST(a1[i] AS VARCHAR), 'null') || ':' ||
                COALESCE(CAST(a2[i] AS VARCHAR), 'null')) AS pairs,
         list_sort(mkeys) AS sorted_keys
  FROM src
)
SELECT k,
       array_to_string(pairs, ',') AS zipped,
       array_to_string(sorted_keys, ',') AS sorted_keys,
       array_to_string(list_transform(sorted_keys,
         x -> CAST(CAST(x[2:] AS BIGINT) * 10 + 1 AS VARCHAR)), ',')
         AS sorted_vals,
       array_to_string(list_reverse_sort(sorted_keys), ',') AS rev_keys
FROM z
""",
    tags=("scalar", "array", "map"),
)
def array_zip_map_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``arrayZipUnaligned`` (24.8: zip arrays of different lengths, short
    ones padded with NULL — Spark's native arrays_zip contract) plus
    ``mapSort`` / ``mapReverseSort`` (entry reorder by key, lowered to
    map_entries → array_sort → map_from_entries).  The zip renders as a
    comma-joined 'a:b' string and the maps as comma-joined key/value
    strings so the driver hash sees plain comparable columns."""
    sup = load_table(spark, sf_dir, "supplier")
    s = F.col("s_suppkey")
    src = sup.select(
        s.alias("k"),
        F.array(
            s.cast("bigint"),
            F.col("s_nationkey").cast("bigint"),
            (s % 7).cast("bigint"),
        ).alias("a1"),
        F.array(
            (F.col("s_nationkey") * 2).cast("bigint"),
            (s + 1).cast("bigint"),
        ).alias("a2"),
        F.array(
            F.concat(F.lit("k"), (s % 5).cast("string")),
            F.concat(F.lit("k"), ((s + 2) % 5).cast("string")),
            F.concat(F.lit("k"), ((s + 4) % 5).cast("string")),
        ).alias("mkeys"),
    )
    m = F.map_from_arrays(
        F.col("mkeys"),
        F.transform(
            F.col("mkeys"),
            lambda x: F.substring(x, 2, 10).cast("bigint") * 10 + 1,
        ),
    )
    zipped = F.array_join(
        F.transform(
            ch.arrayZipUnaligned(F.col("a1"), F.col("a2")),
            lambda p: F.concat(
                F.coalesce(p["a1"].cast("string"), F.lit("null")),
                F.lit(":"),
                F.coalesce(p["a2"].cast("string"), F.lit("null")),
            ),
        ),
        ",",
    )
    return src.select(
        "k",
        zipped.alias("zipped"),
        F.array_join(F.map_keys(ch.mapSort(m)), ",").alias("sorted_keys"),
        F.array_join(
            F.transform(
                F.map_values(ch.mapSort(m)), lambda x: x.cast("string")
            ),
            ",",
        ).alias("sorted_vals"),
        F.array_join(F.map_keys(ch.mapReverseSort(m)), ",").alias("rev_keys"),
    )


def _qiw_expr(arr: str, p: str) -> str:
    """Interpolated weighted quantile over a SORTED array<struct<x,w>> at
    0-indexed expanded position ``p`` (a column name): one JVM aggregate
    fold tracking (cumulative weight, bracketing values) — equivalent by
    construction to PERCENTILE_CONT over the weight-expanded multiset,
    without materializing the expansion."""
    return (
        f"aggregate({arr}, "
        "named_struct('cum', CAST(0 AS DOUBLE), "
        "'lo', CAST(NULL AS DOUBLE), 'hi', CAST(NULL AS DOUBLE)), "
        "(st, e) -> named_struct("
        "'cum', st.cum + e.w, "
        f"'lo', CASE WHEN st.lo IS NULL AND st.cum + e.w > FLOOR({p}) "
        "THEN e.x ELSE st.lo END, "
        f"'hi', CASE WHEN st.hi IS NULL AND st.cum + e.w > CEIL({p}) "
        "THEN e.x ELSE st.hi END), "
        f"st -> st.lo + ({p} - FLOOR({p})) * (st.hi - st.lo))"
    )


@register(
    "quantile_interpolated_weighted",
    oracle="""
WITH e AS (
  SELECT l_returnflag, l_quantity AS x,
         CAST(l_linenumber AS BIGINT) AS w
  FROM lineitem WHERE l_orderkey % 97 = 0
),
expanded AS (
  SELECT l_returnflag, x, unnest(generate_series(1, w)) AS rep FROM e
)
SELECT l_returnflag,
       ROUND(quantile_cont(x, 0.5), 6) AS q50,
       ROUND(quantile_cont(x, 0.9), 6) AS q90,
       CAST(COUNT(*) AS BIGINT) AS expanded_n
FROM expanded GROUP BY l_returnflag ORDER BY l_returnflag
""",
    tags=("aggregate", "quantile"),
)
def quantile_interpolated_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``quantileInterpolatedWeighted(q)(x, w)``: interpolated quantile with
    weights as repeat counts — defined here (documented contract) as
    PERCENTILE_CONT over the weight-expanded multiset, computed WITHOUT the
    expansion via a cumulative-weight fold over the per-group sorted (x, w)
    array (helper ``_qiw_expr``).  The exact-fold tier is for bounded
    groups (state = the group's distinct (x,w) pairs); at 100 TB the
    unbounded path is the expansion + percentile_approx, same shape as the
    existing quantile family.  The oracle IS the expansion, so parity
    proves the fold math."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 97 == 0)
    grouped = li.groupBy("l_returnflag").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("l_quantity").cast("double").alias("x"),
                    F.col("l_linenumber").cast("double").alias("w"),
                )
            )
        ).alias("arr"),
        F.sum(F.col("l_linenumber").cast("bigint")).alias("expanded_n"),
    )
    w_total = F.expr("aggregate(arr, CAST(0 AS DOUBLE), (a, e) -> a + e.w)")
    out = (
        grouped.withColumn("p50", (w_total - 1) * 0.5)
        .withColumn("p90", (w_total - 1) * 0.9)
        .select(
            "l_returnflag",
            F.round(F.expr(_qiw_expr("arr", "p50")), 6).alias("q50"),
            F.round(F.expr(_qiw_expr("arr", "p90")), 6).alias("q90"),
            "expanded_n",
        )
    )
    return out.orderBy("l_returnflag")


@register(
    "sequence_match_events_ts",
    oracle="""
WITH e AS (
  SELECT user_id, ts, event_type FROM events
  WHERE event_type IN ('signup', 'click', 'purchase')
),
u AS (SELECT DISTINCT user_id FROM e),
s1 AS (SELECT user_id, MIN(ts) AS t1 FROM e
       WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM e
       JOIN s1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM e
       JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
SELECT u.user_id,
       CASE WHEN s3.t3 IS NOT NULL THEN 1 ELSE 0 END AS matched,
       CASE WHEN s3.t3 IS NOT NULL
            THEN CAST(floor(epoch(s1.t1)) AS BIGINT) END AS t1,
       CASE WHEN s3.t3 IS NOT NULL
            THEN CAST(floor(epoch(s2.t2)) AS BIGINT) END AS t2,
       CASE WHEN s3.t3 IS NOT NULL
            THEN CAST(floor(epoch(s3.t3)) AS BIGINT) END AS t3
FROM u
LEFT JOIN s1 USING (user_id)
LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)
""",
    tags=("aggregate", "funnel"),
)
def sequence_match_events_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sequenceMatchEvents('(?1)(?2)(?3)')(ts, ...)`` (24.x): the
    timestamps of the matched signup→click→purchase chain per user, not
    just a flag — the greedy-earliest chain (first signup, first click
    strictly after it, first purchase after that), NULL when incomplete
    (operators/funnel.py::sequence_match_events; greedy-earliest is
    complete for subsequence existence, so ``matched`` agrees with
    sequenceMatch).  One shuffle, JVM fold.  The oracle replays the greedy
    chain as chained min-after-previous CTEs."""
    ev = load_table(spark, sf_dir, "events")
    from clickhouseocp_spark.operators.funnel import sequence_match_events

    res = sequence_match_events(
        ev,
        "user_id",
        "ts",
        [
            F.col("event_type") == "signup",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
    )
    ep = lambda i: F.unix_timestamp(F.element_at("events", i)).cast("bigint")  # noqa: E731
    return res.select(
        "user_id",
        F.when(F.col("events").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias(
            "matched"
        ),
        ep(1).alias("t1"),
        ep(2).alias("t2"),
        ep(3).alias("t3"),
    )


@register(
    "ip_uuid_vocab_r12",
    oracle="""
WITH src AS (
  SELECT s_suppkey AS k,
         167772160 + (s_suppkey * 977) % 16777216 AS ip_num,
         md5(CAST(s_suppkey AS VARCHAR)) AS h
  FROM supplier
),
built AS (
  SELECT k, ip_num, h,
         CAST(ip_num // 16777216 AS VARCHAR) || '.' ||
         CAST((ip_num // 65536) % 256 AS VARCHAR) || '.' ||
         CAST((ip_num // 256) % 256 AS VARCHAR) || '.' ||
         CAST(ip_num % 256 AS VARCHAR) AS ip_s,
         (ip_num // 4096) * 4096 AS lo_n,
         (ip_num // 4096) * 4096 + 4095 AS hi_n,
         substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-' ||
         substr(h, 13, 4) || '-' || substr(h, 17, 4) || '-' ||
         substr(h, 21, 12) AS uuid_text
  FROM src
)
SELECT k, ip_s,
       CAST(1 AS INTEGER) AS valid4,
       CAST(lo_n // 16777216 AS VARCHAR) || '.' ||
       CAST((lo_n // 65536) % 256 AS VARCHAR) || '.' ||
       CAST((lo_n // 256) % 256 AS VARCHAR) || '.' ||
       CAST(lo_n % 256 AS VARCHAR) AS lo,
       CAST(hi_n // 16777216 AS VARCHAR) || '.' ||
       CAST((hi_n // 65536) % 256 AS VARCHAR) || '.' ||
       CAST((hi_n // 256) % 256 AS VARCHAR) || '.' ||
       CAST(hi_n % 256 AS VARCHAR) AS hi,
       CAST(CASE k % 3 WHEN 0 THEN 1 WHEN 1 THEN 0 ELSE 1 END
            AS INTEGER) AS is6,
       uuid_text AS uu_rt,
       CASE WHEN k % 2 = 0 THEN uuid_text END AS uu_null,
       CAST(CASE k % 2 WHEN 0 THEN 1465824320894
            ELSE 1508808576371 END AS BIGINT) AS ulid_ms
FROM built
""",
    tags=("scalar", "ip", "uuid"),
)
def ip_uuid_vocab_r12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 12: the IP/UUID/ULID conversion families —
    ``isIPv4String``/``isIPv6String`` (anchored RFC regexes),
    ``IPv4CIDRToRange`` (shift/mask arithmetic → dotted-quad lo/hi),
    ``UUIDStringToNum``/``UUIDNumToString`` (16-byte pack/unpack, proven by
    a text→bytes→text round trip), ``toUUIDOrNull``, and
    ``ULIDStringToDateTime`` (Crockford-base32 timestamp decode via a
    literal-map fold).  All JVM expressions, no UDFs.  The oracle replays
    the arithmetic closed-form and pins the ULID epochs as known-answer
    constants, so any alphabet/shift slip breaks parity."""
    from clickhouseocp_spark.functions import clickhouse_names as ch

    sup = load_table(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    ip_num = (F.lit(167772160) + (k.cast("bigint") * 977) % 16777216).alias(
        "ip_num"
    )
    h = F.md5(k.cast("string"))
    uuid_text = F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
    cand6 = (
        F.when(k % 3 == 0, F.concat(F.lit("2001:db8::"), (k % 100).cast("string")))
        .when(k % 3 == 1, F.concat(F.lit("2001:db8:::"), (k % 100).cast("string")))
        .otherwise(F.concat(F.lit("::ffff:10.0.0."), (k % 256).cast("string")))
    )
    ulid = F.when(
        k % 2 == 0, F.lit("01AN4Z07BY79KA1307SR9X4MV3")
    ).otherwise(F.lit("01BX5ZZKBKACTAV9WEVGEMMVRZ"))
    src = sup.select(k.alias("k"), ip_num, uuid_text.alias("uuid_text"),
                     cand6.alias("cand6"), ulid.alias("ulid"))
    ip_s = ch.IPv4NumToString(F.col("ip_num"))
    rng = ch.IPv4CIDRToRange(F.col("ip_num"), 20)
    return src.select(
        "k",
        ip_s.alias("ip_s"),
        ch.isIPv4String(ip_s).alias("valid4"),
        rng["lo"].alias("lo"),
        rng["hi"].alias("hi"),
        ch.isIPv6String(F.col("cand6")).alias("is6"),
        ch.UUIDNumToString(
            ch.UUIDStringToNum(F.col("uuid_text"))
        ).alias("uu_rt"),
        ch.toUUIDOrNull(
            F.when(F.col("k") % 2 == 0, F.col("uuid_text")).otherwise(
                F.lit("not-a-uuid")
            )
        ).alias("uu_null"),
        F.unix_millis(ch.ULIDStringToDateTime(F.col("ulid"))).alias("ulid_ms"),
    )


@register(
    "text_simhash_vocab",
    oracle="""
WITH src AS (SELECT doc_id, text FROM documents WHERE doc_id < 60),
g AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(text) - 2, 0) + 1),
                        i -> substr(text, CAST(i AS INTEGER), 3)) AS cgrams,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM src
),
w AS (
  SELECT doc_id, cgrams,
         list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                        i -> toks[CAST(i AS INTEGER)] || ' ' ||
                             toks[CAST(i AS INTEGER) + 1]) AS wgrams
  FROM g
),
h AS (
  SELECT doc_id,
         list_transform(cgrams, gg -> list_reduce(
           list_transform(string_split_regex(substr(md5(gg), 1, 16), ''),
                          c -> CAST(strpos('0123456789abcdef', c) - 1
                                    AS HUGEINT)),
           (a, b) -> a * 16 + b)) AS chs,
         list_transform(wgrams, gg -> list_reduce(
           list_transform(string_split_regex(substr(md5(gg), 1, 16), ''),
                          c -> CAST(strpos('0123456789abcdef', c) - 1
                                    AS HUGEINT)),
           (a, b) -> a * 16 + b)) AS whs
  FROM w
),
sim AS (
  SELECT doc_id, whs,
         list_transform(range(64), b -> CASE WHEN list_sum(
           list_transform(chs, x -> CASE WHEN (x >> CAST(b AS INTEGER)) & 1 = 1
                                    THEN 1 ELSE -1 END)) > 0
           THEN 1 ELSE 0 END) AS cbits,
         list_transform(range(64), b -> CASE WHEN list_sum(
           list_transform(whs, x -> CASE WHEN (x >> CAST(b AS INTEGER)) & 1 = 1
                                    THEN 1 ELSE -1 END)) > 0
           THEN 1 ELSE 0 END) AS wbits
  FROM h
),
v AS (
  SELECT doc_id,
         list_reduce(list_transform(list_reverse(cbits),
                                    x -> CAST(x AS HUGEINT)),
                     (a, b) -> a * 2 + b) AS cuv,
         list_reduce(list_transform(list_reverse(wbits),
                                    x -> CAST(x AS HUGEINT)),
                     (a, b) -> a * 2 + b) AS wuv,
         list_min(list_transform(whs, x -> CASE WHEN x >= 9223372036854775808
           THEN x - 18446744073709551616 ELSE x END)) AS smn,
         list_max(list_transform(whs, x -> CASE WHEN x >= 9223372036854775808
           THEN x - 18446744073709551616 ELSE x END)) AS smx
  FROM sim
)
SELECT doc_id,
       CAST(CASE WHEN cuv >= 9223372036854775808
            THEN cuv - 18446744073709551616 ELSE cuv END AS BIGINT) AS ng_sim,
       CAST(CASE WHEN wuv >= 9223372036854775808
            THEN wuv - 18446744073709551616 ELSE wuv END AS BIGINT) AS ws_sim,
       CAST(smn AS BIGINT) AS mn, CAST(smx AS BIGINT) AS mx
FROM v
""",
    tags=("scalar", "text-hash", "dedup"),
)
def text_simhash_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH text-hash near-dup vocabulary (batch 12): ``ngramSimHash`` (char
    3-grams), ``wordShingleSimHash`` (word 2-shingles), and
    ``wordShingleMinHash`` (the (min, max) tuple) — the scalar fingerprints
    CH exposes for near-dup detection, as portable md5-based definitions
    (functions/text.py::simhash64/minhash_pair; documented deviation: CH's
    internal CityHash mix differs, the near-dup SEMANTICS are identical).
    All JVM folds — 64 bit-counters carried through one ``aggregate`` per
    hash, zero shuffle, zero Python.  The oracle recomputes every bit in
    DuckDB HUGEINT arithmetic (hex fold → per-bit ±1 sums → bit repack →
    two's-complement wrap), so the parity check covers the whole bit
    pipeline."""
    from clickhouseocp_spark.functions.text import (
        char_shingles,
        minhash_pair,
        simhash64,
        word_shingles,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != ""
    )
    wgrams = word_shingles(toks, 2)
    mh = minhash_pair(wgrams)
    return docs.select(
        "doc_id",
        simhash64(char_shingles("text", 3)).alias("ng_sim"),
        simhash64(wgrams).alias("ws_sim"),
        mh["mn"].alias("mn"),
        mh["mx"].alias("mx"),
    )
