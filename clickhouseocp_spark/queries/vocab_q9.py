"""ClickHouse vocabulary — round-13 batch ("r40") + the series/EMA tier.

New names (all pure-JVM SQL lowerings, zero Python in the hot path):
``tupleIntDiv``/``tupleIntDivOrZero``/``tupleModulo`` and the ByNumber
trio (24.x tuple-arithmetic closure), ``byteSlice`` (byte-exact slicing
through a BINARY round-trip), ``countMatchesCaseInsensitive``,
``javaHash``/``hiveHash`` (the 31·h+byte fold, pinned against
java.lang.String.hashCode for ASCII), ``UUIDToNum``/``toUUIDOrDefault``,
``ipv4CIDRToRange``, ``seriesOutliersDetectTukey`` (24.2 — both
documented examples pinned in pytest), and the parametric aggregate
``exponentialMovingAverage`` (its (1 − 2^(−1/x)) normalization pinned by
CH's documented ten-ones example = 1 − 2⁻¹⁰).

Oracle policy: every scalar replays element-identically in DuckDB (the
hash folds via seed-prepended ``list_reduce`` — DuckDB has no seeded
reduce; the CIDR bit math via native ``<<``/``&``); the Tukey scores and
EMA replay the identical sorted folds, rounded to 6 on both sides
because the score/weight SUMS are float reductions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clickhouseocp_spark.queries import register

_DUCK_JAVA_FOLD = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(range(1, length(p_name) + 1), "
    "__i -> CAST(ord(substring(p_name, __i, 1)) AS BIGINT))), "
    "(__h, __b) -> (__h * 31 + __b) & 4294967295)"
)

# type-2 quantile (CH's seriesOutliersDetectTukey rule): integer n·p/100
# averages the adjacent order statistics, fractional takes the ceil-th
def _duck_tukey_q(p: str) -> str:
    np_ = f"(CAST(len(sa) AS DOUBLE) * ({p}) / 100.0)"
    i = f"CAST({np_} AS INT)"
    return (
        f"CASE WHEN {np_} = floor({np_}) AND {i} >= 1 THEN "
        f"(list_extract(sa, {i}) + "
        f"list_extract(sa, least({i} + 1, len(sa)))) / 2.0 "
        f"ELSE list_extract(sa, greatest(1, CAST(ceil({np_}) AS INT))) END"
    )


@register(
    "chsql_vocab_r40",
    oracle=f"""
WITH pt AS (
  SELECT p_partkey, p_name, p_size FROM part WHERE p_partkey < 400
)
SELECT p_partkey,
  CAST(floor(p_partkey / 7.0) AS BIGINT) AS tid1,
  CAST(floor(p_size / 3.0) AS BIGINT) AS tid2,
  CAST(p_partkey % 7 AS BIGINT) AS tmod1,
  CAST(p_size * 3 AS BIGINT) AS tmul2,
  round(p_partkey / 4.0, 6) AS tdiv1,
  substring(p_name, 3, 8) AS bsl,
  CAST(len(regexp_extract_all(lower(p_name), 'a')) AS INT) AS cmi,
  CAST(CASE WHEN {_DUCK_JAVA_FOLD} >= 2147483648
       THEN {_DUCK_JAVA_FOLD} - 4294967296
       ELSE {_DUCK_JAVA_FOLD} END AS INT) AS jh,
  CAST({_DUCK_JAVA_FOLD} & 2147483647 AS INT) AS hh,
  upper(md5(p_name)) AS u2n,
  'deadbeef-dead-beef-dead-beefdeadbeef' AS ud,
  (CAST(CAST(168 AS BIGINT) * 16777216 + (p_partkey % 256) * 65536
       + (p_size % 256) * 256 + 7 AS BIGINT)
      & ((4294967295 << (32 - (8 + p_partkey % 25))) & 4294967295))
    AS cidr_lo_num,
  ((CAST(CAST(168 AS BIGINT) * 16777216 + (p_partkey % 256) * 65536
       + (p_size % 256) * 256 + 7 AS BIGINT)
      & ((4294967295 << (32 - (8 + p_partkey % 25))) & 4294967295))
      | (4294967295 >> (8 + p_partkey % 25)))
    AS cidr_hi_num
FROM pt ORDER BY p_partkey
""",
    tags=("chsql", "scalar", "vocab"),
)
def chsql_vocab_r40(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-13 vocabulary batch over ``part``: tuple arithmetic
    closure (IntDiv/Modulo/ByNumber), byteSlice, case-insensitive match
    counting, javaHash/hiveHash (DuckDB replays the identical
    31·h+byte fold), UUIDToNum (byte image == md5 hex re-rendered),
    toUUIDOrDefault, and ipv4CIDRToRange with a DATA-DEPENDENT prefix
    (8..32), value-matched as numeric lo/hi (the dotted render is
    re-parsed so both engines compare integers)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT p_partkey,
  tupleElement(tupleIntDiv((p_partkey, p_size), (7, 3)), 1) AS tid1,
  tupleElement(tupleIntDiv((p_partkey, p_size), (7, 3)), 2) AS tid2,
  CAST(tupleElement(tupleModulo((p_partkey, p_size), (7, 5)), 1)
    AS BIGINT) AS tmod1,
  CAST(tupleElement(tupleMultiplyByNumber((p_partkey, p_size), 3), 2)
    AS BIGINT) AS tmul2,
  round(tupleElement(tupleDivideByNumber((p_partkey, p_size), 4), 1), 6)
    AS tdiv1,
  byteSlice(p_name, 3, 8) AS bsl,
  countMatchesCaseInsensitive(p_name, 'a') AS cmi,
  javaHash(p_name) AS jh,
  hiveHash(p_name) AS hh,
  hex(UUIDToNum(concat(
    substring(md5(p_name), 1, 8), '-', substring(md5(p_name), 9, 4), '-',
    substring(md5(p_name), 13, 4), '-', substring(md5(p_name), 17, 4), '-',
    substring(md5(p_name), 21, 12)))) AS u2n,
  toUUIDOrDefault(p_name, 'deadbeef-dead-beef-dead-beefdeadbeef') AS ud,
  IPv4StringToNum(tupleElement(ipv4CIDRToRange(
    concat('168.', toString(p_partkey % 256), '.',
           toString(p_size % 256), '.7'),
    8 + p_partkey % 25), 1)) AS cidr_lo_num,
  IPv4StringToNum(tupleElement(ipv4CIDRToRange(
    concat('168.', toString(p_partkey % 256), '.',
           toString(p_size % 256), '.7'),
    8 + p_partkey % 25), 2)) AS cidr_hi_num
FROM part WHERE p_partkey < 400
ORDER BY p_partkey
""",
        dialect="clickhouse",
    )


@register(
    "chsql_series_outliers_ema",
    oracle=f"""
WITH s AS (
  SELECT event_type, list_sort(list(value)) AS sa
  FROM events WHERE event_id < 300 AND value IS NOT NULL
  GROUP BY event_type
),
q AS (
  SELECT event_type, sa,
    {_duck_tukey_q('25.0')} AS q1, {_duck_tukey_q('75.0')} AS q3,
    {_duck_tukey_q('10.0')} AS q1w, {_duck_tukey_q('90.0')} AS q3w
  FROM s
),
ema AS (
  SELECT event_type,
    round((1.0 - pow(0.5, 1.0 / 50.0)) * list_sum(list_transform(
      list_sort(list({{'t': CAST(event_id AS DOUBLE),
                       'v': CAST(value AS DOUBLE)}})),
      __e -> __e.v * pow(0.5, (mx - __e.t) / 50.0))), 6) AS ema
  FROM (SELECT event_type, event_id, value,
               MAX(CAST(event_id AS DOUBLE)) OVER
                 (PARTITION BY event_type) AS mx
        FROM events WHERE event_id < 300 AND value IS NOT NULL)
  GROUP BY event_type, mx
)
SELECT q.event_type,
  round(list_sum(list_transform(sa, __v -> CASE
    WHEN __v < q1 - 1.5 * (q3 - q1) THEN (q1 - 1.5 * (q3 - q1)) - __v
    WHEN __v > q3 + 1.5 * (q3 - q1) THEN __v - (q3 + 1.5 * (q3 - q1))
    ELSE 0.0 END)), 6) AS outlier_mass,
  CAST(len(list_filter(sa, __v ->
    __v < q1 - 1.5 * (q3 - q1) OR __v > q3 + 1.5 * (q3 - q1)))
    AS BIGINT) AS n_outliers,
  round(list_sum(list_transform(sa, __v -> CASE
    WHEN __v < q1w - 2.0 * (q3w - q1w) THEN (q1w - 2.0 * (q3w - q1w)) - __v
    WHEN __v > q3w + 2.0 * (q3w - q1w) THEN __v - (q3w + 2.0 * (q3w - q1w))
    ELSE 0.0 END)), 6) AS outlier_mass_wide,
  ema.ema AS ema
FROM q JOIN ema ON q.event_type = ema.event_type
ORDER BY q.event_type
""",
    tags=("chsql", "series", "stats"),
)
def chsql_series_outliers_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``seriesOutliersDetectTukey`` (default 25/75/1.5 fences AND the
    explicit 10/90/2.0 overload) + ``exponentialMovingAverage(50)``
    per event_type.  The input series is array_sort-ed on BOTH engines
    so the float score/weight folds run in the identical element order;
    sums round to 6.  Scores are reduced to order-insensitive
    aggregates (mass + count) because the driver hashes cell values —
    the per-element array itself is pinned in pytest against CH's two
    documented examples."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH s AS (
  SELECT event_type, arraySort(groupArray(value)) AS sa
  FROM events WHERE event_id < 300 AND value IS NOT NULL
  GROUP BY event_type
),
e AS (
  SELECT event_type,
         round(exponentialMovingAverage(50)(value, event_id), 6) AS ema
  FROM events WHERE event_id < 300 AND value IS NOT NULL
  GROUP BY event_type
)
SELECT s.event_type AS event_type,
  round(arraySum(seriesOutliersDetectTukey(sa)), 6)
    AS outlier_mass,
  CAST(arrayCount(x -> x > 0, seriesOutliersDetectTukey(sa))
    AS BIGINT) AS n_outliers,
  round(arraySum(seriesOutliersDetectTukey(sa, 10, 90, 2.0)), 6)
    AS outlier_mass_wide,
  e.ema AS ema
FROM s JOIN e ON s.event_type = e.event_type
ORDER BY s.event_type
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r41",
    oracle="""
WITH src AS (
  SELECT event_id, user_id % 7 AS g,
         ['k' || CAST(event_id % 3 AS VARCHAR),
          'k' || CAST(event_id % 5 AS VARCHAR)] AS ka,
         [CAST(event_id % 97 AS BIGINT), CAST(event_id % 31 AS BIGINT)] AS va,
         CAST(event_id % 50 AS DOUBLE) AS s_i,
         CAST(event_id % 50 + event_id % 13 + 1 AS DOUBLE) AS e_i,
         CAST(event_id % 40 AS DOUBLE) AS t,
         CAST(event_id % 9 AS DOUBLE) AS v,
         CAST(event_id % 6 AS VARCHAR) AS m
  FROM events WHERE event_id < 300
),
pairs AS (
  SELECT g, u.k AS k, u.v AS v
  FROM src, LATERAL (SELECT unnest(ka) AS k, unnest(va) AS v) u
),
maps AS (
  SELECT g, string_agg(k, ',' ORDER BY k) AS sm_keys,
         string_agg(CAST(sv AS VARCHAR), ',' ORDER BY k) AS sm_vals,
         string_agg(CAST(mnv AS VARCHAR), ',' ORDER BY k) AS mn_vals,
         string_agg(CAST(mxv AS VARCHAR), ',' ORDER BY k) AS mx_vals
  FROM (SELECT g, k, SUM(v) AS sv, MIN(v) AS mnv, MAX(v) AS mxv
        FROM pairs GROUP BY g, k)
  GROUP BY g
),
sweep AS (
  SELECT g,
    list_reduce(list_prepend([0.0, 0.0, CAST(NULL AS DOUBLE)],
      list_sort(flatten(list([[s_i, 1.0], [e_i, -1.0]])))),
      (__st, __e) -> [__st[1] + __e[2],
                      greatest(__st[2], __st[1] + __e[2]),
                      CASE WHEN __st[1] + __e[2] > __st[2]
                           THEN __e[1] ELSE __st[3] END]) AS st
  FROM src GROUP BY g
),
decay AS (
  SELECT g, mx,
    round(list_sum(list_transform(list_sort(list([t, 1.0])),
      __e -> __e[2] * exp(-(mx - __e[1]) / 15.0))), 6) AS edc,
    round(list_sum(list_transform(list_sort(list([t, v])),
      __e -> __e[2] * exp(-(mx - __e[1]) / 15.0))), 6) AS eds,
    round(list_max(list_transform(list_sort(list([t, v])),
      __e -> __e[2] * exp(-(mx - __e[1]) / 15.0))), 6) AS edm
  FROM (SELECT g, t, v, MAX(t) OVER (PARTITION BY g) AS mx FROM src)
  GROUP BY g, mx
),
tops AS (
  SELECT g,
         array_to_string((list(m ORDER BY cnt DESC, m ASC))[1:3], ',')
           AS tops,
         array_to_string(list_transform(
           (list(cnt ORDER BY cnt DESC, m ASC))[1:3],
           __c -> CAST(__c AS VARCHAR)), ',') AS top_counts
  FROM (SELECT g, m, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM src GROUP BY g, m)
  GROUP BY g
)
SELECT maps.g AS g, sm_keys, sm_vals, mn_vals, mx_vals,
       CAST(st[2] AS BIGINT) AS mi, st[3] AS mip,
       edc, eds, edm,
       round(acos(greatest(-1.0, least(1.0,
         (2.0 * maps.g) / (1.0 + maps.g * maps.g)))), 6) AS ang,
       tops, top_counts
FROM maps
JOIN sweep ON maps.g = sweep.g
JOIN decay ON maps.g = decay.g
JOIN tops ON maps.g = tops.g
ORDER BY maps.g
""",
    tags=("chsql", "agg", "vocab"),
)
def chsql_vocab_r41(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-13 vocabulary batch 2 (all pure-JVM SQL aggregates over the
    chsql TEXT dialect): ``sumMap``/``minMap``/``maxMap`` on parallel
    key/value arrays (CH's sorted-keys tuple; integer values so the
    per-key sum fold is order-exact), ``maxIntersections``/
    ``maxIntersectionsPosition`` (half-open interval sweep — the DuckDB
    oracle replays the identical (point, ±1) sort with −1-before-+1 tie
    rule and running-sum fold in a LIST-state list_reduce),
    ``exponentialTimeDecayedCount/Sum/Max`` (e-folding decay anchored at
    the group max time, sorted folds, round 6),
    ``angleBetweenVectors`` (clamped acos of cosine similarity), and
    ``approx_top_k`` (CH 24.3 — projected as parallel plain arrays
    because struct-in-array renders differently across pandas paths)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH src AS (
  SELECT event_id, user_id % 7 AS g,
         array(concat('k', toString(event_id % 3)),
               concat('k', toString(event_id % 5))) AS ka,
         array(toInt64(event_id % 97), toInt64(event_id % 31)) AS va,
         toFloat64(event_id % 50) AS s_i,
         toFloat64(event_id % 50 + event_id % 13 + 1) AS e_i,
         toFloat64(event_id % 40) AS t,
         toFloat64(event_id % 9) AS v,
         toString(event_id % 6) AS m
  FROM events WHERE event_id < 300
)
SELECT g,
  arrayStringConcat(tupleElement(sumMap(ka, va), 1), ',') AS sm_keys,
  arrayStringConcat(arrayMap(x -> toString(x),
    tupleElement(sumMap(ka, va), 2)), ',') AS sm_vals,
  arrayStringConcat(arrayMap(x -> toString(x),
    tupleElement(minMap(ka, va), 2)), ',') AS mn_vals,
  arrayStringConcat(arrayMap(x -> toString(x),
    tupleElement(maxMap(ka, va), 2)), ',') AS mx_vals,
  maxIntersections(s_i, e_i) AS mi,
  maxIntersectionsPosition(s_i, e_i) AS mip,
  round(exponentialTimeDecayedCount(15)(t), 6) AS edc,
  round(exponentialTimeDecayedSum(15)(v, t), 6) AS eds,
  round(exponentialTimeDecayedMax(15)(v, t), 6) AS edm,
  round(angleBetweenVectors(array(1.0, toFloat64(g)),
                            array(toFloat64(g), 1.0)), 6) AS ang,
  arrayStringConcat(arrayMap(x -> tupleElement(x, 'item'),
    approx_top_k(3)(m)), ',') AS tops,
  arrayStringConcat(arrayMap(x -> toString(tupleElement(x, 'count')),
    approx_top_k(3)(m)), ',') AS top_counts
FROM src GROUP BY g ORDER BY g
""",
        dialect="clickhouse",
    )


_DUCK_ERF = (
    "(sign(__ex) * (1.0 - 2.0 * (exp(-((abs(__ex) * 1.4142135623730951) "
    "* (abs(__ex) * 1.4142135623730951)) / 2) / sqrt(2 * pi()) * "
    "((1.0 / (1.0 + 0.2316419 * (abs(__ex) * 1.4142135623730951))) * "
    "(0.319381530 + (1.0 / (1.0 + 0.2316419 * (abs(__ex) * "
    "1.4142135623730951))) * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * "
    "(abs(__ex) * 1.4142135623730951))) * (1.781477937 + (1.0 / (1.0 + "
    "0.2316419 * (abs(__ex) * 1.4142135623730951))) * (-1.821255978 + "
    "(1.0 / (1.0 + 0.2316419 * (abs(__ex) * 1.4142135623730951))) * "
    "1.330274429))))))))"
)


@register(
    "kql_scalar_vocab9",
    oracle=f"""
SELECT event_id,
  round(degrees(value), 6) AS d,
  round(radians(value), 6) AS r,
  round({_DUCK_ERF.replace('__ex', '(value / 100.0 - 0.5)')}, 6) AS ef,
  round(1.0 - {_DUCK_ERF.replace('__ex', '(value / 100.0)')}, 6) AS efc,
  round(value * value + 4.0, 6) AS s2,
  to_base64(from_hex(md5(event_type))) AS b64
FROM events WHERE event_id < 200
ORDER BY event_id
""",
    tags=("kql", "scalar", "vocab"),
)
def kql_scalar_vocab9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KQL round-13 scalar closers: ``degrees``/``radians`` (Spark
    builtins), ``erf``/``erfc`` lowered to PURE SQL via the
    Abramowitz-Stegun 26.2.17 rational tail (odd-symmetry identity —
    negative arguments exercised; the oracle replays the identical
    expression), ``series_sum2`` (null-skipping sum of squares), and
    ``base64_encode_fromguid`` (the GUID's 16 raw bytes through
    base64 — replayed as DuckDB to_base64(from_hex(md5)))."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
events | where event_id < 200
| project event_id,
    d = round(degrees(value), 6),
    r = round(radians(value), 6),
    ef = round(erf(value / 100.0 - 0.5), 6),
    efc = round(erfc(value / 100.0), 6),
    s2 = round(series_sum2(pack_array(value, 2.0)), 6),
    b64 = base64_encode_fromguid(strcat(
      substring(hash_md5(event_type), 0, 8), '-',
      substring(hash_md5(event_type), 8, 4), '-',
      substring(hash_md5(event_type), 12, 4), '-',
      substring(hash_md5(event_type), 16, 4), '-',
      substring(hash_md5(event_type), 20, 12)))
| order by event_id asc
""",
        dialect="kusto",
    )


@register(
    "chsql_vocab_r42",
    oracle="""
WITH src AS (
  SELECT event_id,
    CAST(event_id % 65535 + 1 AS BIGINT) AS n,
    CAST(event_id % 256 AS BIGINT) AS a4,
    CAST(user_id % 256 AS BIGINT) AS b4,
    (CAST(event_id % 1000 AS DOUBLE) + 0.25) AS num,
    ['b', 'kb', 'mib', 'gib', 'tb'][(event_id % 5) + 1] AS unit
  FROM events WHERE event_id < 250
)
SELECT event_id,
  '2001:db8::' || lower(to_hex(n)) AS rt6,
  '20010DB8' || repeat('0', 20) || upper(lpad(to_hex(n), 4, '0')) AS hx6,
  '::ffff:' || a4 || '.' || b4 || '.9.1' AS rt4,
  '::ffff:' || a4 || '.' || b4 || '.0.0' AS cut4,
  '2001:db8::' AS cut6,
  CAST(ceil(num * (CASE unit WHEN 'b' THEN 1.0 WHEN 'kb' THEN 1e3
    WHEN 'mib' THEN 1048576.0 WHEN 'gib' THEN 1073741824.0
    WHEN 'tb' THEN 1e12 END)) AS BIGINT) AS bytes,
  CAST(NULL AS BIGINT) AS bad_null,
  CAST(0 AS BIGINT) AS bad_zero
FROM src ORDER BY event_id
""",
    tags=("chsql", "scalar", "vocab"),
)
def chsql_vocab_r42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-13 batch 5: the IPv6 byte/text tier —
    ``IPv6StringToNum``/``IPv6NumToString`` (RFC 5952 render: per-group
    zero stripping, FIRST-longest ≥2 zero-run compression, IPv4-mapped
    mixed notation) and ``cutIPv6`` (mapped addresses cut by the IPv4
    byte count) — plus the ``parseReadableSize`` trio (decimal + binary
    units, ceil to bytes; base form NULLs on invalid input instead of
    CH's runtime throw, documented).  Inputs are CONSTRUCTED so every
    render has a closed-form replay (single nonzero tail group →
    '2001:db8::' || hex); the randomized pytest battery covers the
    general render paths."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH src AS (
  SELECT event_id,
    concat('2001:db8::', lower(hex(event_id % 65535 + 1))) AS ip6,
    concat('::ffff:', toString(event_id % 256), '.',
           toString(user_id % 256), '.9.1') AS ip4m,
    concat(toString(event_id % 1000), '.25 ',
           arrayElement(array('B', 'KB', 'MiB', 'GiB', 'tb'),
                        CAST(event_id % 5 AS INT) + 1)) AS sz
  FROM events WHERE event_id < 250
)
SELECT event_id,
  IPv6NumToString(IPv6StringToNum(ip6)) AS rt6,
  hex(IPv6StringToNum(ip6)) AS hx6,
  IPv6NumToString(IPv6StringToNum(ip4m)) AS rt4,
  cutIPv6(IPv6StringToNum(ip4m), 0, 2) AS cut4,
  cutIPv6(IPv6StringToNum(ip6), 6, 0) AS cut6,
  parseReadableSize(sz) AS bytes,
  parseReadableSizeOrNull(concat('x', sz)) AS bad_null,
  parseReadableSizeOrZero(concat('x', sz)) AS bad_zero
FROM src ORDER BY event_id
""",
        dialect="clickhouse",
    )
