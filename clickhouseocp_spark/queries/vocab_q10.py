"""ClickHouse vocabulary — round-14 births: the Cartesian polygon tier,
the h3 constant tier, string batch r43, simpleJSON closure + moving
aggregates (r44), and the NLP detect tier.

New names (all pure-JVM SQL lowerings, zero Python in the hot path):
``pointInPolygon`` (runtime HOF ray casting, multi-ring holes),
``polygonAreaCartesian`` (Boost's clockwise-positive shoelace),
``polygonPerimeterCartesian``, ``readWKTPoint/LineString/Polygon``;
``h3HexAreaKm2/M2``, ``h3EdgeLengthKm/M`` (the H3 library's published
per-resolution tables), ``h3GetRes0Indexes``/``h3GetPentagonIndexes``
(bit-layout construction: mode 1 << 59 | res << 52 | cell << 45 |
digit bits); ``soundex`` (classic American, H/W-transparent),
``initcap``/``initcapUTF8`` (CH's alnum-run word rule — NOT Spark
initcap's whitespace rule), ``translate[UTF8]``, ``dayName``,
``toUUIDOrZero``, ``multiSearchAnyCaseInsensitive``,
``stringJaccardIndexUTF8``; ``simpleJSONExtractFloat/Bool/UInt/Raw`` +
the ``visitParam*`` legacy aliases, ``groupArrayMovingSum/Avg`` (window
and prefix forms), ``groupArrayInsertAt``; ``detectLanguage[Mixed]``,
``detectCharset``, ``detectProgrammingLanguage``, ``lemmatize`` (the
documented heuristic subsets — CH wraps CLD2 models / user dictionaries
the container cannot ship).

Oracle policy: ray casting replays edge-by-edge with the same IEEE
expression shape (vertical edges reduce to exact constants); h3 tables
replay as literal arrays and the pentagon bit formula re-derives in
DuckDB integer math; soundex pins the 5-value event_type domain
(the general algorithm is pytest-swept); the NLP heuristics replay
their marker counting / rule chains natively in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clickhouseocp_spark.queries import register

# straddle/cross terms for the two axis-aligned square rings (outer
# ±1.5, hole ±0.5): horizontal edges never straddle; each vertical edge
# contributes (x < c) under the shared straddle test, so the oracle
# replays exactly four comparisons
_DUCK_RAYCAST = """
  (CASE WHEN (-1.5 > y) != (1.5 > y) AND x < 1.5 THEN 1 ELSE 0 END
 + CASE WHEN (1.5 > y) != (-1.5 > y) AND x < -1.5 THEN 1 ELSE 0 END
 + CASE WHEN (-0.5 > y) != (0.5 > y) AND x < 0.5 THEN 1 ELSE 0 END
 + CASE WHEN (0.5 > y) != (-0.5 > y) AND x < -0.5 THEN 1 ELSE 0 END
  ) % 2
"""


@register(
    "chsql_geo_vocab2",
    oracle=f"""
WITH s AS (
  SELECT event_id, CAST(event_id % 41 AS DOUBLE) / 10 - 2 AS x,
         CAST(event_id % 37 AS DOUBLE) / 10 - 1.8 AS y
  FROM events WHERE event_id < 400)
SELECT event_id,
  {_DUCK_RAYCAST} AS inside,
  11.5 AS area,
  21.071067811865476 AS perim,
  CAST(event_id % 7 AS DOUBLE) AS wx,
  CAST(event_id % 5 AS DOUBLE) AS wy,
  3 AS ls_n,
  2 AS pg_rings,
  4 AS pg_r2n,
  2.0 AS pg_x
FROM s ORDER BY event_id
""",
    tags=("chsql", "geo", "vocab"),
)
def chsql_geo_vocab2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-14 Cartesian polygon tier: ``pointInPolygon`` with a hole
    ring (even-odd over the combined crossing count — a point inside the
    hole is OUTSIDE), ``polygonAreaCartesian`` (clockwise-positive
    shoelace, hole subtracts: 12.5 − 1 = 11.5), ``polygonPerimeter
    Cartesian`` (all rings), and the ``readWKT*`` parsers (struct
    results projected to plain doubles for driver safety)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH src AS (
  SELECT event_id,
    toFloat64(event_id % 41) / 10 - 2 AS x,
    toFloat64(event_id % 37) / 10 - 1.8 AS y,
    concat('POINT (', toString(event_id % 7), ' ',
           toString(event_id % 5), ')') AS wkt_pt
  FROM events WHERE event_id < 400
)
SELECT event_id,
  pointInPolygon((x, y),
    [(-1.5, -1.5), (1.5, -1.5), (1.5, 1.5), (-1.5, 1.5)],
    [(-0.5, -0.5), (0.5, -0.5), (0.5, 0.5), (-0.5, 0.5)]) AS inside,
  polygonAreaCartesian(
    [[(0., 0.), (0., 5.), (5., 5.)],
     [(1., 1.), (2., 1.), (2., 2.), (1., 2.)]]) AS area,
  polygonPerimeterCartesian(
    [[(0., 0.), (0., 5.), (5., 5.)],
     [(1., 1.), (2., 1.), (2., 2.), (1., 2.)]]) AS perim,
  tupleElement(readWKTPoint(wkt_pt), 1) AS wx,
  tupleElement(readWKTPoint(wkt_pt), 2) AS wy,
  size(readWKTLineString('LINESTRING (1 1, 2 2, 3 3)')) AS ls_n,
  size(readWKTPolygon(
    'POLYGON ((0 0, 0 5, 5 5, 0 0), (1 1, 2 1, 2 2, 1 2))')) AS pg_rings,
  size(arrayElement(readWKTPolygon(
    'POLYGON ((0 0, 0 5, 5 5, 0 0), (1 1, 2 1, 2 2, 1 2))'), 2)) AS pg_r2n,
  tupleElement(arrayElement(arrayElement(readWKTPolygon(
    'POLYGON ((0 0, 0 5, 5 5, 0 0), (1 1, 2 1, 2 2, 1 2))'), 2), 2), 1)
    AS pg_x
FROM src ORDER BY event_id
""",
        dialect="clickhouse",
    )


_H3_KM2 = ("4250546.848, 607220.9782, 86745.85403, 12392.26486, "
           "1770.323552, 252.9033645, 36.1290521, 5.1612932, 0.7373276, "
           "0.1053325, 0.0150475, 0.0021496, 0.0003071, 0.0000439, "
           "0.0000063, 0.0000009")
_H3_M2 = ("4250550000000.0, 607221000000.0, 86745900000.0, 12393200000.0, "
          "1770320000.0, 252903000.0, 36129100.0, 5161290.0, 737327.6, "
          "105332.5, 15047.5, 2149.6, 307.1, 43.9, 6.3, 0.9")
_H3_EKM = ("1107.712591, 418.6760055, 158.2446558, 59.81085794, "
           "22.6063794, 8.544408276, 3.229482772, 1.220629759, "
           "0.461354684, 0.174375668, 0.065907807, 0.024910561, "
           "0.009415526, 0.003559893, 0.001348575, 0.000509713")
_H3_EM = ("1107712.591, 418676.0055, 158244.6558, 59810.85794, "
          "22606.3794, 8544.408276, 3229.482772, 1220.629759, "
          "461.3546837, 174.3756681, 65.90780749, 24.9105614, "
          "9.415526211, 3.559893033, 1.348574562, 0.509713273")


@register(
    "chsql_h3_vocab2",
    oracle=f"""
WITH s AS (
  SELECT event_id, CAST(event_id % 16 AS INT) AS res,
         CAST(event_id % 12 AS INT) AS ci
  FROM events WHERE event_id < 300)
SELECT event_id,
  list_extract([{_H3_KM2}], res + 1) AS ak,
  list_extract([{_H3_M2}], res + 1) AS am,
  list_extract([{_H3_EKM}], res + 1) AS ek,
  list_extract([{_H3_EM}], res + 1) AS em,
  122 AS r0n,
  576495936675512319 AS r0c0,
  CAST(576460752303423488 AS BIGINT)
    + CAST(res AS BIGINT) * 4503599627370496
    + CAST(list_extract([4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117],
                        ci + 1) AS BIGINT) * 35184372088832
    + CAST(pow(8, 15 - res) AS BIGINT) - 1 AS pent,
  12 AS pn
FROM s ORDER BY event_id
""",
    tags=("chsql", "geo", "vocab"),
)
def chsql_h3_vocab2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-14 h3 constant tier: the library's per-resolution average
    area / edge-length tables (``h3HexAreaKm2``, ``h3EdgeLengthKm/M``,
    ``h3HexAreaM2``) and
    the bit-layout index constructors ``h3GetRes0Indexes`` /
    ``h3GetPentagonIndexes`` (res-0 cell 0 = 0x8001fffffffffff), the
    pentagon formula re-derived in DuckDB integer arithmetic."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH src AS (
  SELECT event_id, toInt32(event_id % 16) AS res,
         toInt32(event_id % 12) AS ci
  FROM events WHERE event_id < 300
)
SELECT event_id,
  h3HexAreaKm2(res) AS ak,
  h3HexAreaM2(res) AS am,
  h3EdgeLengthKm(res) AS ek,
  h3EdgeLengthM(res) AS em,
  size(h3GetRes0Indexes()) AS r0n,
  arrayElement(h3GetRes0Indexes(), 1) AS r0c0,
  arrayElement(h3GetPentagonIndexes(res), ci + 1) AS pent,
  size(h3GetPentagonIndexes(res)) AS pn
FROM src ORDER BY event_id
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r43",
    oracle="""
WITH s AS (
  SELECT event_id, event_type, user_id, ts,
         md5(event_type) AS h
  FROM events WHERE event_id < 400)
SELECT event_id,
  CASE event_type WHEN 'click' THEN 'C420' WHEN 'error' THEN 'E660'
    WHEN 'purchase' THEN 'P622' WHEN 'signup' THEN 'S251'
    WHEN 'view' THEN 'V000' END AS sx,
  upper(substring(event_type, 1, 1)) || substring(event_type, 2)
    || '-' || CAST(event_id % 10 AS VARCHAR) || 'x' AS ic,
  'Héllo-' || upper(substring(event_type, 1, 1))
    || substring(event_type, 2) AS icu,
  translate(event_type, 'aeiou', '12345') AS tr,
  dayname(ts) AS dn,
  substring(h, 1, 8) || '-' || substring(h, 9, 4) || '-'
    || substring(h, 13, 4) || '-' || substring(h, 17, 4) || '-'
    || substring(h, 21, 12) AS uok,
  '00000000-0000-0000-0000-000000000000' AS uz,
  CAST((position('ck' IN lower(event_type)) > 0
     OR position('err' IN lower(event_type)) > 0) AS INT) AS msci,
  round(CAST(len(list_intersect(
      list_distinct(regexp_extract_all(event_type, '.')),
      list_distinct(regexp_extract_all('click', '.')))) AS DOUBLE)
    / len(list_distinct(list_concat(
      list_distinct(regexp_extract_all(event_type, '.')),
      list_distinct(regexp_extract_all('click', '.'))))), 6) AS sj
FROM s ORDER BY event_id
""",
    tags=("chsql", "scalar", "vocab"),
)
def chsql_vocab_r43(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-14 string batch: ``soundex`` (pinned over the 5-value
    event_type domain — digits in the input exercise the non-alpha
    ignore rule; the general algorithm incl. H/W transparency is
    pytest-swept), CH-rule ``initcap[UTF8]`` (alnum-run words: the
    digit-led word '3x' keeps its '3'), ``translate``, ``dayName``,
    ``toUUIDOrZero`` (valid md5-derived UUID vs dash-less reject),
    ``multiSearchAnyCaseInsensitive``, ``stringJaccardIndexUTF8``."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH src AS (
  SELECT event_id, event_type, user_id, ts,
         MD5(event_type) AS h
  FROM events WHERE event_id < 400
)
SELECT event_id,
  soundex(concat(event_type, toString(event_id % 10))) AS sx,
  initcap(concat(event_type, '-', toString(event_id % 10), 'x')) AS ic,
  initcapUTF8(concat('héllo-', event_type)) AS icu,
  translate(event_type, 'aeiou', '12345') AS tr,
  dayName(ts) AS dn,
  toUUIDOrZero(concat(substring(h, 1, 8), '-', substring(h, 9, 4), '-',
    substring(h, 13, 4), '-', substring(h, 17, 4), '-',
    substring(h, 21, 12))) AS uok,
  toUUIDOrZero(event_type) AS uz,
  multiSearchAnyCaseInsensitive(event_type, ['CK', 'ERR']) AS msci,
  round(stringJaccardIndexUTF8(event_type, 'click'), 6) AS sj
FROM src ORDER BY event_id
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r44",
    oracle="""
WITH s AS (
  SELECT event_id, user_id, event_type,
         CAST(event_id % 100 AS BIGINT) AS xv,
         event_id % 2 = 0 AS even, CAST(event_id % 5 AS BIGINT) AS ov
  FROM events WHERE event_id < 400),
g AS (
  SELECT user_id, COUNT(*) AS n FROM s GROUP BY user_id)
SELECT s.event_id,
  CAST(s.xv AS DOUBLE) AS f,
  CASE WHEN s.even THEN 1 ELSE 0 END AS b,
  '{"k":' || CAST(s.ov AS VARCHAR) || '}' AS raw,
  TRUE AS h,
  CAST(NULL AS BIGINT) AS u,
  CAST(CASE WHEN g.n >= 3 THEN 3 * g.n - 3
       WHEN g.n = 2 THEN 3 ELSE 1 END AS BIGINT) AS ms_sum,
  CAST(g.n AS INT) AS ms_n,
  1.0 AS ma_first,
  CAST(s.event_id % 3 + 1 AS INT) AS ia_n,
  s.event_type AS ia_last
FROM s JOIN g ON s.user_id = g.user_id
ORDER BY s.event_id
""",
    tags=("chsql", "json", "agg", "vocab"),
)
def chsql_vocab_r44(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-14 simpleJSON closure + moving aggregates:
    ``simpleJSONExtractFloat/Bool/Raw`` + ``visitParamHas`` /
    ``visitParamExtractUInt`` (missing key → NULL, the documented
    strict-parser convention) over constructed JSON, and
    ``groupArrayMovingSum(3)`` / ``groupArrayMovingAvg(2)`` over a
    constant-valued group (order-insensitive by construction: sum of
    the moving array has the closed form 3n−3; the order-sensitive
    general case is pytest-pinned) plus ``groupArrayInsertAt`` on
    single-row groups (gap count = pos, value lands last)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH src AS (
  SELECT event_id, user_id, event_type,
    concat('{"x": ', toString(event_id % 100),
           ', "b": ', if(event_id % 2 = 0, 'true', 'false'),
           ', "o": {"k": ', toString(event_id % 5), '}}') AS j
  FROM events WHERE event_id < 400
),
mv AS (
  SELECT user_id,
    toInt64(arraySum(groupArrayMovingSum(3)(1))) AS ms_sum,
    size(groupArrayMovingSum(3)(1)) AS ms_n,
    arrayElement(groupArrayMovingAvg(2)(2), 1) AS ma_first
  FROM src GROUP BY user_id
),
ia AS (
  SELECT event_id,
    size(groupArrayInsertAt(event_type, toInt32(event_id % 3))) AS ia_n,
    arrayElement(groupArrayInsertAt(event_type, toInt32(event_id % 3)),
                 toInt32(event_id % 3) + 1) AS ia_last
  FROM src GROUP BY event_id, event_type
)
SELECT src.event_id,
  simpleJSONExtractFloat(src.j, 'x') AS f,
  simpleJSONExtractBool(src.j, 'b') AS b,
  simpleJSONExtractRaw(src.j, 'o') AS raw,
  visitParamHas(src.j, 'x') AS h,
  visitParamExtractUInt(src.j, 'nope') AS u,
  mv.ms_sum AS ms_sum, mv.ms_n AS ms_n, mv.ma_first AS ma_first,
  ia.ia_n AS ia_n, ia.ia_last AS ia_last
FROM src
JOIN mv ON src.user_id = mv.user_id
JOIN ia ON src.event_id = ia.event_id
ORDER BY src.event_id
""",
        dialect="clickhouse",
    )


# DuckDB replay of the marker-count LID (same lexicons as chsql.py's
# _NLP_LANGS — a pytest pins the two lists equal)
_DUCK_TOKS = ("list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
              "__t -> __t != '')")
_DUCK_LANG_COUNT = {
    "en": "('the', 'and', 'of', 'to', 'a', 'in', 'value', 'table')",
    "es": "('el', 'la', 'de', 'que', 'y', 'los', 'por')",
    "fr": "('le', 'la', 'les', 'des', 'est', 'une', 'pour')",
    "de": "('der', 'die', 'das', 'und', 'ist', 'nicht', 'mit')",
    "zh": "('de5', 'shi4', 'bu4', 'le5', 'zai4', 'ren2')",
}
_DUCK_COUNTS = ", ".join(
    f"len(list_filter(toks, __t -> __t IN {m})) AS c_{lang}"
    for lang, m in _DUCK_LANG_COUNT.items()
)


@register(
    "chsql_nlp_detect",
    oracle=f"""
WITH s AS (
  SELECT doc_id, text, {_DUCK_TOKS} AS toks
  FROM documents WHERE doc_id < 300),
c AS (
  SELECT doc_id, text, toks, {_DUCK_COUNTS},
         greatest(len(list_filter(toks, __t -> __t IN {_DUCK_LANG_COUNT['en']})),
                  len(list_filter(toks, __t -> __t IN {_DUCK_LANG_COUNT['es']})),
                  len(list_filter(toks, __t -> __t IN {_DUCK_LANG_COUNT['fr']})),
                  len(list_filter(toks, __t -> __t IN {_DUCK_LANG_COUNT['de']})),
                  len(list_filter(toks, __t -> __t IN {_DUCK_LANG_COUNT['zh']}))) AS m
  FROM s)
SELECT doc_id,
  CASE WHEN m = 0 THEN 'un' WHEN c_en = m THEN 'en' WHEN c_es = m THEN 'es'
    WHEN c_fr = m THEN 'fr' WHEN c_de = m THEN 'de' ELSE 'zh' END AS dl,
  round(CASE WHEN m = 0 THEN -1.0
    WHEN c_en = 0 THEN -1.0
    ELSE CAST(c_en AS DOUBLE) / (c_en + c_es + c_fr + c_de + c_zh)
    END, 6) AS en_share,
  CASE WHEN regexp_matches(text, '[^\\x00-\\x7F]') THEN 'UTF-8'
       ELSE 'US-ASCII' END AS cs,
  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'Python' WHEN 1 THEN 'SQL'
       ELSE 'JavaScript' END AS pl,
  CASE WHEN len(toks) = 0 THEN '' ELSE (
    CASE list_extract(toks, 1)
      WHEN 'mice' THEN 'mouse' WHEN 'feet' THEN 'foot'
      WHEN 'geese' THEN 'goose' WHEN 'teeth' THEN 'tooth'
      WHEN 'men' THEN 'man' WHEN 'women' THEN 'woman'
      WHEN 'children' THEN 'child' WHEN 'people' THEN 'person'
      WHEN 'ran' THEN 'run' WHEN 'went' THEN 'go'
      WHEN 'was' THEN 'be' WHEN 'were' THEN 'be'
      WHEN 'better' THEN 'good' WHEN 'worse' THEN 'bad'
      ELSE CASE
        WHEN regexp_matches(list_extract(toks, 1), '^[a-z]{{2,}}ies$')
        THEN substring(list_extract(toks, 1), 1,
                       length(list_extract(toks, 1)) - 3) || 'y'
        WHEN regexp_matches(list_extract(toks, 1), 'sses$')
        THEN substring(list_extract(toks, 1), 1,
                       length(list_extract(toks, 1)) - 2)
        WHEN regexp_matches(list_extract(toks, 1), '(x|ch|sh|z)es$')
        THEN substring(list_extract(toks, 1), 1,
                       length(list_extract(toks, 1)) - 2)
        WHEN regexp_matches(list_extract(toks, 1), '^[a-z]{{2,}}s$')
         AND NOT regexp_matches(list_extract(toks, 1), '(ss|us|is)$')
        THEN substring(list_extract(toks, 1), 1,
                       length(list_extract(toks, 1)) - 1)
        ELSE list_extract(toks, 1) END END) END AS lm
FROM c ORDER BY doc_id
""",
    tags=("chsql", "text", "vocab"),
)
def chsql_nlp_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-14 NLP detect tier: ``detectLanguage`` (marker-count argmax,
    'un' with no evidence), ``detectLanguageMixed`` projected as the
    'en' share (map itself is driver-unsafe; −1 when absent),
    ``detectCharset`` (ASCII/UTF-8 split), ``detectProgrammingLanguage``
    over literal snippets chosen by doc_id (the keyword scoring is
    pytest-swept), and the rule-based ``lemmatize('en', w)`` over each
    document's first token — all documented heuristic stand-ins for
    CH's CLD2/dictionary models, replayed natively in DuckDB."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH src AS (
  SELECT doc_id, text,
    arrayFilter(__t -> __t != '', splitByRegexp('[^a-z0-9]+', lower(text)))
      AS toks,
    multiIf(doc_id % 3 = 0, 'def f(self): import os',
            doc_id % 3 = 1, 'select x from t where y group by z',
            'const f = (x) => { console.log(x); }') AS snippet
  FROM documents WHERE doc_id < 300
)
SELECT doc_id,
  detectLanguage(text) AS dl,
  round(coalesce(detectLanguageMixed(text)['en'], -1.0), 6) AS en_share,
  detectCharset(text) AS cs,
  detectProgrammingLanguage(snippet) AS pl,
  if(size(toks) = 0, '',
     lemmatize('en', arrayElement(toks, 1))) AS lm
FROM src ORDER BY doc_id
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r45",
    oracle="""
WITH src AS (
  SELECT event_id, event_type, date_trunc('second', ts) AS t
  FROM events WHERE event_id < 500)
SELECT event_id,
  'UTC' AS tz,
  'default' AS schemas,
  CAST(206 AS BIGINT) AS maxlen,
  '00000000-0000-0000-0000-000000000000' AS txn_host,
  CAST(0 AS BIGINT) AS up0,
  substr(event_type, 1, 1) || CAST(event_id % 10 AS VARCHAR)
    || substr(event_type, 3) AS ov,
  substr(event_type, 1, length(event_type) - 1) || 'ZZ' AS ovn,
  CAST(nullif(event_id % 3, 0) IS NOT DISTINCT FROM
       nullif(event_id % 5, 0) AS INT) AS ind,
  'k1,k2' AS subk,
  CAST(2 AS BIGINT) AS subsz,
  CAST(t + to_months(CAST(3 * (event_id % 4) AS INT)) AS VARCHAR) AS aq,
  CAST(year(t) AS BIGINT) AS ryn,
  epoch_ms(t + to_milliseconds(250 * (event_id % 4))) AS ems,
  epoch_ms(t + to_microseconds(250000 * (event_id % 4))) AS emu,
  CAST(CASE event_type WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3
       WHEN 'view' THEN 2 ELSE 0 END AS BIGINT) AS mcp,
  CAST(CASE event_type WHEN 'error' THEN 1 WHEN 'purchase' THEN 2
       WHEN 'signup' THEN 3 ELSE 0 END AS BIGINT) AS mci,
  CAST(event_id % 9 AS DOUBLE) + 0.25 AS f32,
  CAST(event_id % 5 IN (3, 4) AS INT) AS mex,
  1 AS mal,
  'a,b,c' AS mps,
  event_type AS ekv,
  CAST(event_id % 11 AS VARCHAR) AS ekv2,
  CAST(event_type = 'view' AS INT) AS hs,
  CAST(event_type = 'error' AS INT) AS hsc,
  CAST(CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
       WHEN 'purchase' THEN 2 WHEN 'signup' THEN 1
       WHEN 'view' THEN 2 END AS BIGINT) AS csc
FROM src ORDER BY event_id
""",
    tags=("chsql", "vocab"),
)
def chsql_vocab_r45(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-14 tranche 2, batch r45: the introspection-constant tier
    (timeZone/serverTimeZone, currentSchemas/currentRoles/profiles,
    transactionID, serverUUID, uptime, getMaxTableNameLengthForDatabase),
    ``overlay[UTF8]`` with CH's negative-offset rule, ``isNotDistinctFrom``,
    ``getSubcolumn`` (keys/values/size0/null pseudo-subcolumns),
    ``addQuarters``, ``toRelativeYearNum``, the sub-second interval
    constructors (``toIntervalMillisecond/Microsecond/Nanosecond``), the
    case-insensitive multiSearch/hasSubsequence/countSubstrings closers,
    ``toFloat32OrZero``, the map quantifiers ``mapExists``/``mapAll``,
    ``mapPartialSort``, and ``extractKeyValuePairs`` with its
    ``str_to_map``/``mapFromString`` aliases (lowered onto Spark's
    regex-delimited str_to_map after delimiter-noise collapse)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH src AS (
  SELECT event_id, event_type, toStartOfSecond(ts) AS t
  FROM events WHERE event_id < 500
)
SELECT event_id,
  timeZone() AS tz,
  arrayStringConcat(currentSchemas(true), ',') AS schemas,
  getMaxTableNameLengthForDatabase(currentDatabase()) AS maxlen,
  tupleElement(transactionID(), 3) AS txn_host,
  uptime() + zookeeperSessionUptime() AS up0,
  overlay(event_type, toString(event_id % 10), 2) AS ov,
  overlay(event_type, 'ZZ', -1) AS ovn,
  CAST(isNotDistinctFrom(nullIf(event_id % 3, 0),
                         nullIf(event_id % 5, 0)) AS INT) AS ind,
  arrayStringConcat(getSubcolumn(map('k1', event_id, 'k2', event_id), 'keys'),
                    ',') AS subk,
  getSubcolumn(array(event_id, event_id), 'size0') AS subsz,
  toString(addQuarters(t, event_id % 4)) AS aq,
  CAST(toRelativeYearNum(t) AS BIGINT) AS ryn,
  toUnixTimestamp64Milli(t + toIntervalMillisecond(250 * (event_id % 4))) AS ems,
  toUnixTimestamp64Milli(t + toIntervalMicrosecond(250000 * (event_id % 4))) AS emu,
  CAST(multiSearchFirstPositionCaseInsensitive(event_type,
       ['UR', 'IEW', 'GNU']) AS BIGINT) AS mcp,
  multiSearchFirstIndexCaseInsensitive(event_type,
       ['ERROR', 'Purchase', 'SIGNUP']) AS mci,
  toFloat64(toFloat32OrZero(concat(toString(event_id % 9), '.25'))) AS f32,
  CAST(mapExists((k, v) -> v > 2, map('a', event_id % 3, 'b', event_id % 5))
       AS INT) AS mex,
  CAST(mapAll((k, v) -> v >= 0, map('a', event_id % 3, 'b', event_id % 5))
       AS INT) AS mal,
  arrayStringConcat(mapKeys(mapPartialSort(2, map('b', 1, 'a', 2, 'c', 3))),
                    ',') AS mps,
  element_at(extractKeyValuePairs(
      concat('id:', toString(event_id), ', type:', event_type)), 'type')
    AS ekv,
  element_at(str_to_map(concat('k=', toString(event_id % 11), '|j=2'),
                        '=', '|'), 'k') AS ekv2,
  CAST(hasSubsequenceUTF8(event_type, 'iw') AS INT) AS hs,
  CAST(hasSubsequenceCaseInsensitiveUTF8(event_type, 'RR') AS INT) AS hsc,
  countSubstringsCaseInsensitiveUTF8(concat(event_type, 'E'), 'e') AS csc
FROM src ORDER BY event_id
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r46",
    oracle="""
WITH src AS (
  SELECT event_id, event_type FROM events WHERE event_id < 400)
SELECT event_id,
  CASE event_type WHEN 'click' THEN 'MNWGSY3L' WHEN 'error' THEN 'MVZHE33S'
    WHEN 'purchase' THEN 'OB2XEY3IMFZWK===' WHEN 'signup' THEN 'ONUWO3TVOA======'
    WHEN 'view' THEN 'OZUWK5Y=' END AS b32,
  event_type || CAST(event_id % 10 AS VARCHAR) AS rt,
  replace(replace(replace(event_type || '<&\"', '&', '&amp;'), '<', '&lt;'),
          '\"', '&quot;') AS xenc,
  'v=' || chr(CAST(65 + event_id % 26 AS INT)) || '+'
       || chr(CAST(913 + event_id % 24 AS INT)) AS xdec,
  CASE event_id % 3 WHEN 0 THEN chr(8364) WHEN 1 THEN chr(160)
    ELSE chr(8212) END || '!' AS hdec,
  'Hello ' || event_type || ' tail' AS htext,
  CAST(ord(substr(event_type, 1, 1))
    + 256 * ord(substr(event_type, 2, 1)) AS BIGINT) AS ru16,
  CAST(ord(substr(event_type, 1, 1)) AS BIGINT)
    + CAST(256 AS BIGINT) * ord(substr(event_type, 2, 1))
    + CAST(65536 AS BIGINT) * ord(substr(event_type, 3, 1))
    + CAST(16777216 AS BIGINT) * ord(substr(event_type, 4, 1)) AS ru32,
  chr(CAST(65 + event_id % 26 AS INT))
    || chr(CAST(66 + event_id % 25 AS INT)) AS rstr,
  CAST(list_reduce(
    list_prepend(CAST(0 AS BIGINT), list_transform(
      range(1, length(event_type || CAST(event_id % 100 AS VARCHAR)) + 1),
      __i -> CAST(ord(substr(event_type || CAST(event_id % 100 AS VARCHAR),
                             CAST(__i AS INT), 1)) AS BIGINT))),
    (__h, __u) -> ((__h * 31 + __u) & 4294967295)) AS BIGINT)
    - CASE WHEN list_reduce(
        list_prepend(CAST(0 AS BIGINT), list_transform(
          range(1, length(event_type || CAST(event_id % 100 AS VARCHAR)) + 1),
          __i -> CAST(ord(substr(event_type || CAST(event_id % 100 AS VARCHAR),
                                 CAST(__i AS INT), 1)) AS BIGINT))),
        (__h, __u) -> ((__h * 31 + __u) & 4294967295)) >= 2147483648
      THEN 4294967296 ELSE 0 END AS jh16
FROM src ORDER BY event_id
""",
    tags=("chsql", "vocab"),
)
def chsql_vocab_r46(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-14 tranche 2, batch r46 — the encoding tier: RFC 4648
    ``base32Encode`` (alphabet pinned over the event_type domain; the
    general algorithm is pytest-pinned against RFC test vectors) and a
    ``base32Decode`` round-trip on data-dependent strings,
    ``encodeXMLComponent``/``decodeXMLComponent`` (named + decimal +
    hex numeric references via the UTF-32 decode route),
    ``decodeHTMLComponent`` (documented named-entity subset),
    ``extractTextFromHTML`` (comments/script/style dropped, CDATA
    unwrapped, tags to whitespace, whitespace collapsed),
    ``reinterpretAsUInt16/32`` little-endian loads,
    ``reinterpretAsString``, and ``javaHashUTF16LE`` — the REAL
    java.lang.String.hashCode over UTF-16 code units (javaHash keeps
    CH's byte-fold quirk), replayed seed-prepended in DuckDB
    ``list_reduce``."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH src AS (
  SELECT event_id, event_type FROM events WHERE event_id < 400
)
SELECT event_id,
  base32Encode(event_type) AS b32,
  base32Decode(base32Encode(concat(event_type, toString(event_id % 10))))
    AS rt,
  encodeXMLComponent(concat(event_type, '<&"')) AS xenc,
  decodeXMLComponent(concat('v=&#', toString(65 + event_id % 26), ';+&#x',
                            hex(913 + event_id % 24), ';')) AS xdec,
  concat(decodeHTMLComponent(multiIf(event_id % 3 = 0, '&euro;',
                                     event_id % 3 = 1, '&nbsp;',
                                     '&mdash;')), '!') AS hdec,
  extractTextFromHTML(concat('<p>Hello <b>', event_type,
      '</b></p><!-- drop --><script a=1>s<x</script> tail')) AS htext,
  reinterpretAsUInt16(event_type) AS ru16,
  reinterpretAsUInt32(event_type) AS ru32,
  reinterpretAsString(65 + event_id % 26 + 256 * (66 + event_id % 25))
    AS rstr,
  CAST(javaHashUTF16LE(concat(event_type, toString(event_id % 100)))
       AS BIGINT) AS jh16
FROM src ORDER BY event_id
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r47",
    oracle="""
WITH src AS (
  SELECT event_id,
    '10.' || CAST(event_id % 256 AS VARCHAR) || '.'
          || CAST(event_id % 200 AS VARCHAR) || '.'
          || CAST((event_id * 7) % 256 AS VARCHAR) AS a4,
    CASE WHEN event_id = 0 THEN '2001:db8::1'
         ELSE '2001:db8:' || format('{:x}', event_id) || '::1' END AS a6,
    CAST(event_id % 21 AS DOUBLE) / 2 - 5 AS x,
    CAST(event_id % 13 AS DOUBLE) / 2 - 3 AS y
  FROM events WHERE event_id < 400)
SELECT event_id,
  CAST(10 AS BIGINT) * 16777216
    + CAST(event_id % 256 AS BIGINT) * 65536
    + CAST(event_id % 200 AS BIGINT) * 256
    + CAST((event_id * 7) % 256 AS BIGINT) AS ip4,
  a4 AS rt4,
  CAST(1 AS INT) AS in8,
  CAST(event_id % 256 >= 128 AS INT) AS in9,
  a6 AS rt6,
  CAST(event_id >= 256 AS INT) AS in40,
  '::ffff:' || a4 AS mapped,
  CAST(0 AS BIGINT) AS zbad,
  CAST((x * x / 4 + y * y <= 1.0) OR
       ((x - 5) * (x - 5) / 9 + (y - 5) * (y - 5) / 4 <= 1.0) AS INT) AS pe,
  'POINT(' || CAST(event_id % 10 AS VARCHAR) || ' ' ||
    CASE event_id % 4 WHEN 0 THEN '0' WHEN 1 THEN '0.5'
                      WHEN 2 THEN '1' ELSE '1.5' END || ')' AS w
FROM src ORDER BY event_id
""",
    tags=("chsql", "vocab", "ip"),
)
def chsql_vocab_r47(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-14 tranche 2, batch r47 — the IP-type closure:
    ``toIPv4[OrNull/OrZero/OrDefault]`` (UInt32 image, shape-validated),
    ``toIPv6`` family (16-byte image via the shared canonicalizer, dotted
    input maps to ::ffff:), ``IPv4ToIPv6``, ``isIPAddressInRange`` for
    BOTH families (UInt32 shift compare / 128-bit nibble-prefix compare
    on the canonical hex form, with a data-dependent /9 and a /40 whose
    match flips inside the scanned id range), plus the geo closers
    ``pointInEllipses`` (any-of, two ellipses) and ``wkt`` Point render
    with CH's integral shortening."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH src AS (
  SELECT event_id,
    concat('10.', toString(event_id % 256), '.',
           toString(event_id % 200), '.',
           toString((event_id * 7) % 256)) AS a4,
    concat('2001:db8:', lower(hex(event_id)), '::1') AS a6,
    toFloat64(event_id % 21) / 2 - 5 AS x,
    toFloat64(event_id % 13) / 2 - 3 AS y
  FROM events WHERE event_id < 400
)
SELECT event_id,
  toIPv4(a4) AS ip4,
  IPv4NumToString(toIPv4OrDefault(a4, toIPv4('0.0.0.0'))) AS rt4,
  isIPAddressInRange(a4, '10.0.0.0/8') AS in8,
  isIPAddressInRange(a4, '10.128.0.0/9') AS in9,
  IPv6NumToString(toIPv6(a6)) AS rt6,
  isIPAddressInRange(a6, '2001:db8:100::/40') AS in40,
  IPv6NumToString(IPv4ToIPv6(toIPv4(a4))) AS mapped,
  toIPv4OrZero(concat('x', a4)) AS zbad,
  pointInEllipses(x, y, 0., 0., 2., 1., 5., 5., 3., 2.) AS pe,
  wkt((toFloat64(event_id % 10), toFloat64(event_id % 4) / 2)) AS w
FROM src ORDER BY event_id
""",
        dialect="clickhouse",
    )


#: the DuckDB replay of the (weighted) Levenshtein DP: list_reduce with
#: list-of-lists elements so the accumulator (a DP row) and the fold
#: elements (1-int index carriers) share a type — DuckDB's list_reduce
#: has no independent seed type
_DUCK_LEV = """
  list_extract(
    list_reduce(
      list_prepend(list_transform(range(0, len(t) + 1),
                                  __j -> CAST(__j AS BIGINT)),
                   list_transform(range(1, len(f) + 1),
                                  __i -> [CAST(__i AS BIGINT)])),
      (__prev, __cur) ->
        list_reduce(
          list_prepend([__prev[1] + 1],
                       list_transform(range(1, len(t) + 1),
                                      __j -> [CAST(__j AS BIGINT)])),
          (__acc, __cj) -> list_append(__acc, least(
             __prev[__cj[1] + 1] + 1,
             __acc[len(__acc)] + 1,
             __prev[__cj[1]] + CASE WHEN f[__cur[1]] = t[__cj[1]]
                               THEN 0 ELSE 1 END)))),
    len(t) + 1)
"""

_DUCK_WLEV = """
  list_extract(
    list_reduce(
      list_prepend(list_transform(range(0, len(t) + 1),
                     __j -> coalesce(list_sum(tw[1:__j]), 0.0)),
                   list_transform(range(1, len(f) + 1),
                                  __i -> [CAST(__i AS DOUBLE)])),
      (__prev, __cur) ->
        list_reduce(
          list_prepend([__prev[1] + fw[CAST(__cur[1] AS INT)]],
                       list_transform(range(1, len(t) + 1),
                                      __j -> [CAST(__j AS DOUBLE)])),
          (__acc, __cj) -> list_append(__acc, least(
             __prev[CAST(__cj[1] AS INT) + 1] + fw[CAST(__cur[1] AS INT)],
             __acc[len(__acc)] + tw[CAST(__cj[1] AS INT)],
             __prev[CAST(__cj[1] AS INT)]
               + CASE WHEN f[CAST(__cur[1] AS INT)] = t[CAST(__cj[1] AS INT)]
                 THEN 0.0
                 ELSE fw[CAST(__cur[1] AS INT)] + tw[CAST(__cj[1] AS INT)]
                 END)))),
    len(t) + 1)
"""


@register(
    "chsql_vocab_r48",
    oracle=f"""
WITH arrs AS (
  SELECT event_id,
    [CAST(event_id % 7 AS BIGINT), event_id % 5, event_id % 3,
     event_id % 11] AS f,
    [CAST(event_id % 5 AS BIGINT), event_id % 7, event_id % 3] AS t,
    [1.5, 2.0, 1.0, 0.5] AS fw,
    [1.0, 2.5, 2.0] AS tw
  FROM events WHERE event_id < 400)
SELECT event_id,
  {_DUCK_LEV} AS lev,
  round({_DUCK_WLEV}, 6) AS wlev,
  round(1.0 - {_DUCK_WLEV} / 10.5, 6) AS sim
FROM arrs ORDER BY event_id
""",
    tags=("chsql", "vocab", "array"),
)
def chsql_vocab_r48(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-14 tranche 2, batch r48 — the array-edit-distance tier as
    PURE-JVM DP folds (supersedes the pandas-UDF arrayLevenshtein form
    for the text path): ``arrayLevenshteinDistance`` (CH 25.4),
    ``arrayLevenshteinDistanceWeighted`` (deletion fw[i], insertion
    tw[j], substitution fw[i]+tw[j] when elements differ), and
    ``arraySimilarity`` = 1 − weightedDistance / (Σfw + Σtw).  The DP
    row is the fold accumulator — the inner aggregate reads its own
    last element for the insertion term.  The DuckDB oracle replays the
    SAME two-level fold with list-of-lists index carriers (list_reduce
    has no independent seed type)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH arrs AS (
  SELECT event_id,
    [toInt64(event_id % 7), toInt64(event_id % 5), toInt64(event_id % 3),
     toInt64(event_id % 11)] AS f,
    [toInt64(event_id % 5), toInt64(event_id % 7), toInt64(event_id % 3)]
      AS t,
    [1.5, 2.0, 1.0, 0.5] AS fw,
    [1.0, 2.5, 2.0] AS tw
  FROM events WHERE event_id < 400
)
SELECT event_id,
  arrayLevenshteinDistance(f, t) AS lev,
  round(arrayLevenshteinDistanceWeighted(f, t, fw, tw), 6) AS wlev,
  round(arraySimilarity(f, t, fw, tw), 6) AS sim
FROM arrs ORDER BY event_id
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r49",
    oracle="""
WITH src AS (
  SELECT event_id, event_type FROM events WHERE event_id < 400)
SELECT event_id,
  repeat(substr(event_type, 1, 2), CAST(event_id % 3 AS INT)) AS rp,
  reverse(event_type) AS rv,
  substr(event_type, 1, length(event_type) - 2) AS lf,
  substr(event_type, 3) AS rt,
  array_to_string((string_split('a.b.c.' || event_type, '.'))[1:2], '.')
    AS si,
  CAST(event_type ILIKE 'V%' AS INT) AS il,
  CAST(event_id % 3 IN (0, 2) AS INT) AS iz,
  '2024-03-0' || CAST(1 + event_id % 9 AS VARCHAR) || ' 10:20:30' AS ts2,
  CAST(make_timestamp((1546300800 + event_id) * 1000000) AS VARCHAR) AS dt64,
  CAST(make_timestamp(2024, CAST(1 + event_id % 12 AS INT),
       CAST(1 + event_id % 28 AS INT), CAST(event_id % 24 AS INT),
       CAST(event_id % 60 AS INT),
       CAST(event_id % 60 AS DOUBLE)
         + CAST(event_id % 1000 AS DOUBLE) / 1000) AS VARCHAR) AS mk,
  CAST(make_timestamp((1700000000 + event_id) * 1000000) AS VARCHAR) AS fu,
  strftime(make_date(2024, 1, CAST(1 + event_id % 28 AS INT)), '%Y-%m-%d')
    AS d32,
  'sub.ex' || CAST(event_id % 10 AS VARCHAR) || '.org' AS dom,
  event_type || CAST(event_id AS VARCHAR) AS rtout,
  CAST(16 AS INT) AS enclen
FROM src ORDER BY event_id
""",
    tags=("chsql", "vocab"),
)
def chsql_vocab_r49(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-14 tranche 2, batch r49 — string/date closers + the AES
    codec pair: ``repeat``/``reverse``/``space``, ``left``/``right``
    with CH's negative-length rule, ``substringIndexUTF8``, ``ilike``,
    ``isZeroOrNull``, 2-arg ``timestamp`` (time-of-day added as a
    day-time interval), ``toDateTime64`` (numeric epoch via cast),
    ``makeDateTime64`` (fraction/10^precision), ``fromUnixTimestamp64
    Second``, ``YYYYMMDDToDate32``, the RFC URL-function aliases, and
    ``encrypt``/``decrypt`` ('aes-128-ecb' round-trip value-checked —
    ciphertext bytes are engine-independent AES, the oracle checks the
    decrypted identity and the one-block CBC length; Spark's prepended
    CBC IV is stripped to CH's raw-ciphertext convention)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH src AS (
  SELECT event_id, event_type FROM events WHERE event_id < 400
)
SELECT event_id,
  repeat(substring(event_type, 1, 2), event_id % 3) AS rp,
  reverse(event_type) AS rv,
  left(event_type, -2) AS lf,
  right(event_type, -2) AS rt,
  substringIndexUTF8(concat('a.b.c.', event_type), '.', 2) AS si,
  CAST(ilike(event_type, 'V%') AS INT) AS il,
  isZeroOrNull(nullIf(event_id % 3, 2)) AS iz,
  toString(timestamp(concat('2024-03-0', toString(1 + event_id % 9)),
                     '10:20:30')) AS ts2,
  toString(toDateTime64(1546300800 + event_id, 0)) AS dt64,
  toString(makeDateTime64(2024, 1 + event_id % 12, 1 + event_id % 28,
                          event_id % 24, event_id % 60, event_id % 60,
                          event_id % 1000, 3)) AS mk,
  toString(fromUnixTimestamp64Second(1700000000 + event_id)) AS fu,
  toString(YYYYMMDDToDate32(20240101 + event_id % 28)) AS d32,
  domainRFC(concat('https://u@sub.ex', toString(event_id % 10),
                   '.org:443/p')) AS dom,
  decrypt('aes-128-ecb',
          encrypt('aes-128-ecb', concat(event_type, toString(event_id)),
                  '1234567890123456'),
          '1234567890123456') AS rtout,
  CAST(length(encrypt('aes-128-cbc', event_type, '1234567890123456',
                      'abcdefghijklmnop')) AS INT) AS enclen
FROM src ORDER BY event_id
""",
        dialect="clickhouse",
    )


def _duck_lttb_fold(n: int) -> str:
    """The DuckDB replay of the LTTB selected-index fold over a grouped
    point list ``p`` (sorted structs x/y) — same bucket bounds and
    triangle-area argmax as the Spark fold in chsql._lttb_select_sql.

    Shape constraint (DuckDB 1.0): a list_reduce nested INSIDE another
    list_reduce whose inner range depends on the outer element leaks
    state ACROSS GROUPED ROWS under vectorized evaluation (verified:
    each group received its neighbor's argmax).  The per-bucket argmax
    is therefore list_position(areas, list_max(areas)) over a plain
    list_transform — first-wins on ties, identical to the Spark fold's
    strict '>' rule — and the bucket/next-bucket reads use list SLICES
    instead of range-folds."""
    sz = f"((len(p) - 2) / {float(n - 2)!r})"
    i = "(__cur[1])"
    bs = f"(CAST(floor({i} * {sz}) AS BIGINT) + 2)"
    be = f"(CAST(floor(({i} + 1) * {sz}) AS BIGINT) + 1)"
    ne = (
        f"least(CASE WHEN {i} < {n - 3} THEN "
        f"CAST(floor(({i} + 2) * {sz}) AS BIGINT) + 1 "
        f"ELSE len(p) END, len(p))"
    )
    px = "p[CAST(__sel[-1] AS INT)].x"
    py = "p[CAST(__sel[-1] AS INT)].y"
    ax = (
        f"(coalesce(list_sum(list_transform(p[{be} + 1 : {ne}], "
        f"__e -> __e.x)), 0.0) / greatest(1, {ne} - {be}))"
    )
    ay = (
        f"(coalesce(list_sum(list_transform(p[{be} + 1 : {ne}], "
        f"__e -> __e.y)), 0.0) / greatest(1, {ne} - {be}))"
    )
    areas = (
        f"list_transform(p[{bs} : {be}], __q -> "
        f"abs(({px} - {ax}) * (__q.y - {py}) "
        f"- ({px} - __q.x) * ({ay} - {py})))"
    )
    pick = (
        f"(CAST({bs} AS DOUBLE) - 1 + "
        f"list_position({areas}, list_max({areas})))"
    )
    return (
        f"CASE WHEN len(p) <= {n} THEN "
        f"list_transform(range(1, len(p) + 1), __i -> CAST(__i AS DOUBLE)) "
        f"ELSE list_concat(list_reduce("
        f"list_prepend([CAST(1 AS DOUBLE)], "
        f"list_transform(range(0, {n - 2}), __i -> [CAST(__i AS DOUBLE)])), "
        f"(__sel, __cur) -> list_append(__sel, {pick})), "
        f"[CAST(len(p) AS DOUBLE)]) END"
    )


@register(
    "chsql_lttb_downsample",
    oracle=f"""
WITH grp AS (
  SELECT event_type,
         list(struct_pack(x := CAST(event_id AS DOUBLE), y := value)
              ORDER BY event_id) AS p
  FROM events WHERE event_id < 300 GROUP BY event_type),
sel AS (
  SELECT event_type, p, {_duck_lttb_fold(12)} AS s FROM grp)
SELECT event_type,
  unnest(list_transform(s, __si -> p[CAST(__si AS INT)].x)) AS x,
  unnest(list_transform(s, __si -> round(p[CAST(__si AS INT)].y, 6))) AS y
FROM sel ORDER BY event_type, x
""",
    tags=("chsql", "vocab", "series"),
)
def chsql_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``largestTriangleThreeBuckets(n)(x, y)`` / ``lttb`` (CH 24.x):
    Steinarsson's largest-triangle-three-buckets downsampling as a
    PURE-JVM fold over the group's sorted series — first/last pinned,
    each interior bucket contributes the point maximizing the triangle
    area with the previous pick and the next bucket's average.  The
    group is collected sorted once (sequential by nature; CH buffers
    the group the same way — bounded-group contract).  The DuckDB
    oracle replays the identical fold (IEEE expression shape preserved,
    so the per-bucket argmax — including '>' first-wins ties — agrees
    bit-for-bit); results explode to plain rows to keep the driver
    comparator on scalar columns."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_type,
  tupleElement(pt, 1) AS x,
  round(tupleElement(pt, 2), 6) AS y
FROM (
  SELECT event_type,
    arrayJoin(largestTriangleThreeBuckets(12)(toFloat64(event_id), value))
      AS pt
  FROM events WHERE event_id < 300 GROUP BY event_type
) ORDER BY event_type, x
""",
        dialect="clickhouse",
    )


#: geohashesInBox pins for the g = event_id % 20 box family (lon0 =
#: g − 9.75, lat0 = 5(g mod 7) − 14.75, 0.8 × 0.6 box, precision 4) —
#: derived from an independent Python geohash implementation
_GEOBOX_PINS = """
    WHEN 0 THEN '7v3h 7v3j 7v3n 7v3p 7v3k 7v3m 7v3q 7v3r 7v3s 7v3t 7v3w 7v3x'
    WHEN 1 THEN '7y3b 7y3c 7y3f 7y3g 7y60 7y61 7y64 7y65 7y62 7y63 7y66 7y67'
    WHEN 2 THEN '7z4k 7z4m 7z4q 7z4r 7z62 7z4s 7z4t 7z4w 7z4x 7z68 7z4u 7z4v 7z4y 7z4z 7z6b 7z5h 7z5j 7z5n 7z5p 7z70'
    WHEN 3 THEN 'eb51 eb54 eb55 eb5h eb53 eb56 eb57 eb5k eb59 eb5d eb5e eb5s eb5c eb5f eb5g eb5u'
    WHEN 4 THEN 'ebgv ebgy ebgz ec5b ec5c ebuj ebun ebup ech0 ech1 ebum ebuq ebur ech2 ech3'
    WHEN 5 THEN 'ecud ecue ecus ecut ecuf ecug ecuu ecuv ecv4 ecv5 ecvh ecvj'
    WHEN 6 THEN 'eftq eftr efv2 efv3 efv6 eftw eftx efv8 efv9 efvd efty eftz efvb efvc efvf'
    WHEN 7 THEN '7vqh 7vqj 7vqn 7vqp 7vqk 7vqm 7vqq 7vqr 7vqs 7vqt 7vqw 7vqx'
    WHEN 8 THEN '7yqb 7yqc 7yqf 7yqg 7yr0 7yr1 7yr4 7yr5 7yr2 7yr3 7yr6 7yr7'
    WHEN 9 THEN '7zpk 7zpm 7zpq 7zpr 7zr2 7zps 7zpt 7zpw 7zpx 7zr8 7zpu 7zpv 7zpy 7zpz 7zrb kp0h kp0j kp0n kp0p kp20'
    WHEN 10 THEN 's001 s004 s005 s00h s003 s006 s007 s00k s009 s00d s00e s00s'
    WHEN 11 THEN 's0bv s0by s0bz s10b s10c s0cj s0cn s0cp s110 s111 s0cm s0cq s0cr s112 s113'
    WHEN 12 THEN 's1cd s1ce s1cs s1ct s1cf s1cg s1cu s1cv s1f4 s1f5 s1fh s1fj'
    WHEN 13 THEN 's4dq s4dr s4f2 s4f3 s4f6 s4dw s4dx s4f8 s4f9 s4fd s4dy s4dz s4fb s4fc s4ff'
    WHEN 14 THEN 'kj7h kj7j kj7n kj7p kj7k kj7m kj7q kj7r kj7s kj7t kj7w kj7x'
    WHEN 15 THEN 'kn78 kn79 kn7d kn7e kn7b kn7c kn7f kn7g knk0 knk1 knk4 knk5 knk2 knk3 knk6 knk7'
    WHEN 16 THEN 'kphk kphm kphq kphr kpk2 kphs kpht kphw kphx kpk8 kphu kphv kphy kphz kpkb kpjh kpjj kpjn kpjp kpm0'
    WHEN 17 THEN 's0j1 s0j4 s0j5 s0jh s0j3 s0j6 s0j7 s0jk s0j9 s0jd s0je s0js'
    WHEN 18 THEN 's0vv s0vy s0vz s1jb s1jc s0yj s0yn s0yp s1n0 s1n1 s0ym s0yq s0yr s1n2 s1n3'
    WHEN 19 THEN 's1yd s1ye s1ys s1yt s1yf s1yg s1yu s1yv s1z4 s1z5 s1zh s1zj'
"""


@register(
    "chsql_vocab_r50",
    oracle=f"""
WITH src AS (
  SELECT event_id % 20 AS g, event_type, event_id
  FROM events WHERE event_id < 400),
pairs AS (
  SELECT g, CAST(event_id % 5 AS BIGINT) AS k, CAST(1 AS BIGINT) AS v
  FROM src
  UNION ALL
  SELECT g, CAST(event_id % 7 AS BIGINT), CAST(2 AS BIGINT) FROM src)
SELECT s.g,
  least(count(DISTINCT s.event_type), 3) AS u2,
  least(count(DISTINCT s.event_type), 11) AS u10,
  (SELECT string_agg(CAST(k AS VARCHAR), ',' ORDER BY k)
   FROM (SELECT k FROM pairs p WHERE p.g = s.g AND p.k IN (0, 2, 4)
         GROUP BY k) fk) AS fk,
  (SELECT string_agg(CAST(sv AS VARCHAR), ',' ORDER BY k)
   FROM (SELECT k, sum(v) AS sv FROM pairs p
         WHERE p.g = s.g AND p.k IN (0, 2, 4) GROUP BY k) fv) AS fv,
  CASE s.g {_GEOBOX_PINS} END AS gb,
  'sx1q sx1r' AS gb_doc
FROM src s GROUP BY s.g ORDER BY s.g
""",
    tags=("chsql", "vocab", "geo"),
)
def chsql_vocab_r50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-14 tranche 2, batch r50: ``uniqUpTo(N)(x)`` (exact under
    the cap, N+1 above — Spark's exact distinct is a valid instance of
    CH's bounded-state contract), ``sumMapFiltered[WithOverflow]``
    (parametric key whitelist position-filtered into the shared
    map-aggregate fold), and ``geohashesInBox`` (grid cells from the
    5p-bit lon/lat split, each encoded at its center by the pure-JVM
    geohash fold; the CH-docs box pins 'sx1q sx1r' and a 20-box family
    pins against an independent Python geohash)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH src AS (
  SELECT event_id % 20 AS g, event_type,
    [toInt64(event_id % 5), toInt64(event_id % 7)] AS karr,
    [toInt64(1), toInt64(2)] AS varr,
    toFloat64(event_id % 20) - 9.75 AS lon0,
    toFloat64((event_id % 20) % 7) * 5 - 14.75 AS lat0
  FROM events WHERE event_id < 400
)
SELECT g,
  uniqUpTo(2)(event_type) AS u2,
  uniqUpTo(10)(event_type) AS u10,
  arrayStringConcat(arrayMap(x -> toString(x),
    tupleElement(sumMapFiltered([toInt64(0), toInt64(2), toInt64(4)])
                 (karr, varr), 1)), ',') AS fk,
  arrayStringConcat(arrayMap(x -> toString(x),
    tupleElement(sumMapFilteredWithOverflow(
      [toInt64(0), toInt64(2), toInt64(4)])(karr, varr), 2)), ',') AS fv,
  min(arrayStringConcat(
    geohashesInBox(lon0, lat0, lon0 + 0.8, lat0 + 0.6, 4), ' ')) AS gb,
  min(arrayStringConcat(
    geohashesInBox(24.48, 40.56, 24.51, 40.61, 4), ' ')) AS gb_doc
FROM src GROUP BY g ORDER BY g
""",
        dialect="clickhouse",
    )


@register(
    "kql_scalar_vocab10",
    oracle="""
WITH src AS (
  SELECT event_id, ts,
    CAST(event_id % 256 AS BIGINT) AS o2,
    CAST(event_id % 200 AS BIGINT) AS o3,
    '10.' || CAST(event_id % 256 AS VARCHAR) || '.'
          || CAST(event_id % 200 AS VARCHAR) || '.1' AS a4,
    CASE WHEN event_id = 0 THEN '2001:db8::1'
         ELSE '2001:db8:' || format('{:x}', event_id) || '::1' END AS a6,
    CAST(32 + event_id % 24 AS INT) AS p6,
    CAST(8 + event_id % 24 AS INT) AS p4
  FROM events WHERE event_id < 400)
SELECT event_id,
  round(sin(CAST(event_id % 7 AS DOUBLE) / 2), 6) AS ssin,
  round(acos(CAST(event_id % 9 AS DOUBLE) / 10), 6) AS sacos,
  CAST(weekofyear(ts) AS BIGINT) AS wk,
  chr(CAST(65 + event_id % 26 AS INT)) || chr(9731) AS ms,
  CAST(event_id % 5 AS VARCHAR) || '-' || CAST(event_id % 3 AS VARCHAR)
    AS ac,
  CAST(true AS BOOLEAN) AS h4,
  CAST(event_id % 2 = 0 AS BOOLEAN) AS hp,
  CAST(floor((256 * 256 * (CAST(10 AS BIGINT) * 256 + o2) + 256 * o3 + 1)
             / power(2, 32 - p4)) =
       floor((256 * 256 * (CAST(10 AS BIGINT) * 256 + o2) + 256 * 77 + 9)
             / power(2, 32 - p4)) AS BOOLEAN) AS m4,
  CAST(o2 >= 128 OR o2 < 64 AS BOOLEAN) AS r4any,
  CAST(event_id >= 256 AS BOOLEAN) AS r6,
  CAST(event_id >= 256 OR event_id < 128 AS BOOLEAN) AS r6any,
  '2001:0db8:'
    || lpad(lower(format('{:x}',
         CAST(floor(event_id / power(2, 16 - least(p6 - 32, 16)))
              * power(2, 16 - least(p6 - 32, 16)) AS BIGINT))), 4, '0')
    || ':0000:0000:0000:0000:0000' AS pm,
  '{"k":' || CAST(event_id % 5 AS VARCHAR) || '}' AS td
FROM src ORDER BY event_id
""",
    tags=("kql", "vocab"),
)
def kql_scalar_vocab10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KQL round-14 scalar batch 10: the ``series_`` trig maps,
    ``weekofyear``, ``make_string``/``unicode_codepoints_to_string``
    (UTF-32 decode route), ``array_strcat``, the IPv4-in-text matchers
    (``has_ipv4``/``has_any_ipv4``/``has_ipv4_prefix`` — look-arounds
    enforce proper delimiting and octet validity), ``ipv4_is_match``
    with Kusto's min-of-suffixes prefix rule, the range families
    (``ipv4_is_in_any_range``/``ipv6_is_in_range``/
    ``ipv6_is_in_any_range``), ``parse_ipv6_mask`` (canonical padded
    form, host bits floor-masked per nibble), and ``todynamic``
    (dynamics carry as JSON text)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
events | where event_id < 400
| extend o2 = event_id % 256, o3 = event_id % 200
| extend a4 = strcat('10.', tostring(o2), '.', tostring(o3), '.1'),
         a6 = strcat('2001:db8:', tohex(event_id), '::1'),
         p6 = toint(32 + event_id % 24), p4 = toint(8 + event_id % 24)
| project event_id,
    ssin = round(series_sin(pack_array(todouble(event_id % 7) / 2))[0], 6),
    sacos = round(series_acos(pack_array(todouble(event_id % 9) / 10))[0], 6),
    wk = weekofyear(ts),
    ms = make_string(65 + event_id % 26, 9731),
    ac = array_strcat(pack_array(event_id % 5, event_id % 3), '-'),
    h4 = has_ipv4(strcat('src ', a4, ' end'), a4),
    hp = iff(event_id % 2 == 0,
             has_ipv4_prefix(strcat('x ', a4, ' y'), '10.'),
             has_any_ipv4(strcat('x ', a4, ' y'), pack_array('9.9.9.9'))),
    m4 = ipv4_is_match(a4, strcat('10.', tostring(o2), '.77.9'), p4),
    r4any = ipv4_is_in_any_range(a4,
              pack_array('10.128.0.0/9', '10.0.0.0/10')),
    r6 = ipv6_is_in_range(a6, '2001:db8:100::/40'),
    r6any = ipv6_is_in_any_range(a6,
              pack_array('2001:db8:100::/40', '2001:db8:0::/41')),
    pm = parse_ipv6_mask(a6, p6),
    td = todynamic(strcat('{"k":', tostring(event_id % 5), '}'))
| order by event_id asc
""",
        dialect="kusto",
    )


@register(
    "chsql_vocab_r51",
    oracle="""
SELECT event_id,
  CAST(CAST(event_id + 1 AS HUGEINT)
    * CAST('100000000000000000000' AS HUGEINT) AS VARCHAR) AS i128,
  CAST(-(CAST(event_id + 7 AS HUGEINT)
    * CAST('10000000000000000000000000' AS HUGEINT)) AS VARCHAR) AS n256,
  '0' AS orz,
  CAST(CASE WHEN event_id % 2 = 0 THEN CAST(event_id AS HUGEINT)
       ELSE NULL END AS VARCHAR) AS orn,
  CAST(CAST(event_id AS HUGEINT) * CAST(99999999999 AS HUGEINT)
       AS VARCHAR) AS mul,
  CAST(1 AS INT) AS uuid7_ok,
  CAST(1 AS INT) AS snow_ok
FROM events WHERE event_id < 400 ORDER BY event_id
""",
    tags=("chsql", "vocab"),
)
def chsql_vocab_r51(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-14 tranche 2, batch r51 — the wide-integer cast family on
    DECIMAL(38,0) (``toInt128/toUInt128/toInt256/toUInt256`` +
    Or-variants; documented range deviation: beyond 38 decimal digits
    the cast rejects instead of wrapping — in-range arithmetic is
    exact, HUGEINT-replayed in DuckDB; both engines surface the digits
    as strings — wide decimals reach pandas as float64 on the DuckDB
    side, so the string render is the exact-compare channel), plus ``generateUUIDv7`` /
    ``generateSnowflakeID`` checked as STRUCTURE CONTRACTS (RFC 9562
    version-7/variant-10 shape; the snowflake's embedded millisecond
    timestamp decodes to the present) — the generators are random by
    design, like CH's."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_id,
  toString(toInt128(concat(toString(event_id + 1),
                           '00000000000000000000'))) AS i128,
  toString(toInt256(concat('-', toString(event_id + 7),
                           '0000000000000000000000000'))) AS n256,
  toString(toUInt256OrZero(concat('x', toString(event_id)))) AS orz,
  toString(toInt128OrNull(IF(event_id % 2 = 0, toString(event_id),
                             'junk'))) AS orn,
  toString(toInt128(event_id) * toInt128(99999999999)) AS mul,
  CAST(generateUUIDv7() RLIKE
    '^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$'
    AS INT) AS uuid7_ok,
  CAST(snowflakeIDToDateTime(generateSnowflakeID())
       > toDateTime('2026-01-01 00:00:00') AS INT) AS snow_ok
FROM events WHERE event_id < 400 ORDER BY event_id
""",
        dialect="clickhouse",
    )
