"""ClickHouse vocabulary — round-15 births: the S2 cell tier.

New names (all pure-JVM SQL lowerings, zero Python in the hot path):
``geoToS2`` / ``s2ToGeo`` (leaf-level-30 cell ids over the public
s2geometry definition — cube face from the |xyz| argmax, quadratic ST
projection, 30-level Hilbert fold with the published kIJtoPos /
kPosToIJ / kPosToOrientation tables), ``s2CellsIntersect`` (lsb range
containment), ``s2GetNeighbors`` (edge neighbors with the published
FromFaceIJWrap cross-face construction).  UInt64 ids surface as their
signed-64 reinterpretation (the repo's hash convention, documented).

Oracle policy: the DuckDB oracle INDEPENDENTLY replays the forward
algorithm — scalar xyz/face/uv/st math plus the 30-level Hilbert fold
as a recursive CTE over the same published tables — so the cell ids are
exact cross-engine comparisons, not pinned literals.  The derived
checks (roundtrip decode, self/parent/sibling intersection, neighbor
shape) are contract booleans the Spark side must genuinely earn; the
pytest battery (tests/test_s2.py) additionally cross-checks randomized
points and cross-face wrap neighbors against an independent Python
transliteration of the same published algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clickhouseocp_spark.queries import register

#: one Hilbert step's curve-position lookup (kIJtoPos flattened by
#: orientation), shared by both UNION-ALL references in the oracle
_DUCK_S2_IDX = (
    "CAST(h.orn*4 + 2*((g.i >> CAST(h.k AS INT)) & 1) + "
    "((g.j >> CAST(h.k AS INT)) & 1) AS INT) + 1"
)
_DUCK_S2_P = (
    "CAST(list_value(0,1,3,2,0,3,1,2,2,3,1,0,2,1,3,0)"
    f"[{_DUCK_S2_IDX}] AS BIGINT)"
)


@register(
    "chsql_s2_vocab",
    oracle=f"""
WITH RECURSIVE pts AS (
  SELECT event_id,
         CAST(event_id % 360 AS DOUBLE) - 179.75 AS lon,
         CAST((event_id * 7) % 160 AS DOUBLE) - 79.7 AS lat
  FROM events WHERE event_id < 60),
g1 AS (
  SELECT event_id, lon, lat,
         cos(radians(lat)) * cos(radians(lon)) AS x,
         cos(radians(lat)) * sin(radians(lon)) AS y,
         sin(radians(lat)) AS z
  FROM pts),
g2 AS (
  SELECT *, CASE WHEN abs(x) > abs(y) AND abs(x) > abs(z)
                 THEN CASE WHEN x < 0 THEN 3 ELSE 0 END
                 WHEN abs(y) > abs(z) THEN CASE WHEN y < 0 THEN 4 ELSE 1 END
                 ELSE CASE WHEN z < 0 THEN 5 ELSE 2 END END AS f
  FROM g1),
g3 AS (
  SELECT *, CASE f WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z
                   WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,
            CASE f WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z
                   WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v
  FROM g2),
g5 AS (
  SELECT event_id, lon, lat, f,
    GREATEST(0, LEAST(1073741823, CAST(floor(1073741824 *
      CASE WHEN u >= 0 THEN 0.5*sqrt(1+3*u)
           ELSE 1-0.5*sqrt(1-3*u) END) AS BIGINT))) AS i,
    GREATEST(0, LEAST(1073741823, CAST(floor(1073741824 *
      CASE WHEN v >= 0 THEN 0.5*sqrt(1+3*v)
           ELSE 1-0.5*sqrt(1-3*v) END) AS BIGINT))) AS j
  FROM g3),
hil AS (
  SELECT event_id, 29 AS k, CAST(0 AS BIGINT) AS pos,
         CAST(f % 2 AS BIGINT) AS orn
  FROM g5
  UNION ALL
  SELECT h.event_id, h.k - 1,
         h.pos * 4 + {_DUCK_S2_P},
         xor(h.orn, CAST(list_value(1,0,0,3)[CAST({_DUCK_S2_P} AS INT) + 1]
                         AS BIGINT))
  FROM hil h JOIN g5 g USING (event_id) WHERE h.k >= 0),
ids AS (
  SELECT g.event_id,
         (CASE WHEN g.f >= 4 THEN g.f - 8 ELSE g.f END)
           * 2305843009213693952 + h.pos * 2 + 1 AS id
  FROM g5 g JOIN hil h ON h.event_id = g.event_id AND h.k = -1)
SELECT event_id, id,
  (id & -8192) | 4096 AS parent,
  TRUE AS rt_ok,
  TRUE AS self_int,
  -- id's low 13 bits lie in [1, 8191], so id is always inside the
  -- level-24 parent's +/-4095 leaf range
  TRUE AS parent_int,
  xor(id, 2) = id AS sib_int,
  4 AS nb_distinct,
  TRUE AS nb_noself
FROM ids ORDER BY event_id
""",
    tags=("chsql", "geo", "vocab"),
)
def chsql_s2_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-15 S2 cell tier: ``geoToS2`` leaf ids exactly matched
    against the oracle's independent recursive-CTE replay of the
    published algorithm; ``s2ToGeo`` roundtrip (cell center within a
    generous 1e-4 degrees — leaf cells are ~1e-8); ``s2CellsIntersect``
    self/parent/sibling contracts; ``s2GetNeighbors`` shape contracts
    (4 distinct neighbors, none the cell itself)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH src AS (
  SELECT event_id,
         toFloat64(event_id % 360) - 179.75 AS lon,
         toFloat64((event_id * 7) % 160) - 79.7 AS lat
  FROM events WHERE event_id < 60
),
ids AS (
  SELECT event_id, lon, lat, geoToS2(lon, lat) AS id FROM src
)
SELECT event_id, id,
  bitOr(bitAnd(id, -8192), 4096) AS parent,
  abs(tupleElement(s2ToGeo(id), 1) - lon) < 0.0001
    AND abs(tupleElement(s2ToGeo(id), 2) - lat) < 0.0001 AS rt_ok,
  s2CellsIntersect(id, id) AS self_int,
  s2CellsIntersect(bitOr(bitAnd(id, -8192), 4096), id) AS parent_int,
  s2CellsIntersect(id, bitXor(id, 2)) AS sib_int,
  size(arrayDistinct(s2GetNeighbors(id))) AS nb_distinct,
  NOT has(s2GetNeighbors(id), id) AS nb_noself
FROM ids ORDER BY event_id
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r52",
    oracle="""
WITH g AS (
  SELECT event_type, min(ts) AS mn, max(ts) AS mx, count(*) AS c
  FROM events GROUP BY event_type),
m AS (
  SELECT *, (year(mn) - 1970) * 12 + month(mn) - 1 AS mo FROM g)
SELECT event_type,
  CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 1 ELSE 0 END AS f_any,
  CAST(CASE event_type WHEN 'error' THEN 2 WHEN 'signup' THEN 1
       ELSE 0 END AS BIGINT) AS f_idx,
  CASE event_type WHEN 'click' THEN '1' WHEN 'purchase' THEN '1,3'
       WHEN 'view' THEN '2' ELSE '' END AS f_all,
  make_timestamp(CAST(1970 + ((mo // 2) * 2 // 12) AS BIGINT),
                 CAST(((mo // 2) * 2 % 12) + 1 AS BIGINT),
                 1, 0, 0, 0.0) AS m2,
  make_timestamp(CAST(1970 + ((mo // 6) * 6 // 12) AS BIGINT),
                 CAST(((mo // 6) * 6 % 12) + 1 AS BIGINT),
                 1, 0, 0, 0.0) AS q2,
  make_timestamp(CAST(1970 + ((mo // 36) * 36 // 12) AS BIGINT),
                 CAST(((mo // 36) * 36 % 12) + 1 AS BIGINT),
                 1, 0, 0, 0.0) AS y3,
  make_timestamp(CAST(floor(floor(epoch(mx)) / 864000) * 864000
                 AS BIGINT) * 1000000) AS d10,
  c
FROM m ORDER BY event_type
""",
    tags=("chsql", "string", "vocab"),
)
def chsql_vocab_r52(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-15 vocab batch r52: the ``multiFuzzyMatch*`` family
    (Sellers approximate-substring DP over literal patterns — the
    oracle pins the 5-value event_type domain, the general algorithm is
    pytest-swept against a Python Sellers reference) and the
    ``toStartOfInterval`` multi-n calendar buckets (2 MONTH /
    2 QUARTER / 3 YEAR via months-since-1970 flooring, 10 DAY fixed
    width), both replayed analytically in DuckDB."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_type,
  multiFuzzyMatchAny(event_type, 1, ['clik', 'vew']) AS f_any,
  multiFuzzyMatchAnyIndex(event_type, 2, ['sign', 'erors']) AS f_idx,
  arrayStringConcat(arrayMap(__x -> toString(__x),
      multiFuzzyMatchAllIndices(event_type, 1, ['ck', 'vw', 'pase'])),
      ',') AS f_all,
  toStartOfInterval(min(ts), INTERVAL 2 MONTH) AS m2,
  toStartOfInterval(min(ts), INTERVAL 2 QUARTER) AS q2,
  toStartOfInterval(min(ts), INTERVAL 3 YEAR) AS y3,
  toStartOfInterval(max(ts), INTERVAL 10 DAY) AS d10,
  count() AS c
FROM events GROUP BY event_type ORDER BY event_type
""",
        dialect="clickhouse",
    )


@register(
    "chsql_s2_vocab2",
    oracle="""
SELECT event_id,
  TRUE AS rc_in, FALSE AS rc_out, TRUE AS ra_ok, TRUE AS ru_ok,
  TRUE AS ri_ok, TRUE AS cc_in, FALSE AS cc_out, TRUE AS cu_ok,
  TRUE AS cu_cov
FROM events WHERE event_id < 30 ORDER BY event_id
""",
    tags=("chsql", "geo", "vocab"),
)
def chsql_s2_vocab2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-15 S2 composites: ``s2RectAdd/Contains/Union/Intersection``
    and ``s2CapContains/CapUnion``.  Contract-boolean oracle over
    margin-robust geometry (every decision boundary is >= 1 degree away
    from the test points, versus the <= 1e-7-degree cell-center
    quantization of the id representation): rect containment both ways,
    the expanded rect containing a point near the added corner, union
    covering the second rect, intersection sitting inside the first
    rect, cap membership at generous/impossible radii, and the cap
    union's radius matching (d + r1 + r2)/2 with both member centers
    covered.  The underlying encode/decode primitives carry the exact
    cross-engine oracle in ``chsql_s2_vocab``."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH pts AS (
  SELECT event_id,
         toFloat64(-30 + (event_id % 60)) AS lonA,
         toFloat64(-20 + ((event_id * 3) % 40)) AS latA,
         toFloat64(-30 + (event_id % 60) + 5 + (event_id % 7)) AS lonB,
         toFloat64(-20 + ((event_id * 3) % 40) + 4) AS latB
  FROM events WHERE event_id < 30
),
ids AS (
  SELECT event_id, lonA, latA, lonB, latB,
    geoToS2(lonA, latA) AS id_lo,
    geoToS2(lonB, latB) AS id_hi,
    geoToS2((lonA + lonB) / 2, (latA + latB) / 2) AS id_in,
    geoToS2(lonB + 30, latB) AS id_out,
    geoToS2(lonB + 29, latB - 1) AS id_b2,
    geoToS2(lonA + 2, latA + 1) AS id_lo2,
    geoToS2(lonB + 8, latB + 3) AS id_hi2,
    geoToS2(lonB + 7.5, latB + 2.5) AS id_u2,
    geoToS2(lonA + 3, latA + 2) AS id_i2,
    geoToS2(lonA + 3, latA) AS id_near,
    geoToS2(lonA + 6, latA) AS id_c
  FROM pts
),
ops AS (
  SELECT *,
    s2RectAdd(id_lo, id_hi, id_out) AS ra,
    s2RectUnion(id_lo, id_hi, id_lo2, id_hi2) AS ru,
    s2RectIntersection(id_lo, id_hi, id_lo2, id_hi2) AS ri,
    s2CapUnion(id_lo, 2.0, id_c, 3.0) AS cu
  FROM ids
)
SELECT event_id,
  s2RectContains(id_lo, id_hi, id_in) AS rc_in,
  s2RectContains(id_lo, id_hi, id_out) AS rc_out,
  s2RectContains(tupleElement(ra, 1), tupleElement(ra, 2), id_b2) AS ra_ok,
  s2RectContains(tupleElement(ru, 1), tupleElement(ru, 2), id_u2) AS ru_ok,
  s2RectContains(tupleElement(ri, 1), tupleElement(ri, 2), id_i2) AS ri_ok,
  s2CapContains(id_lo, 10.0, id_near) AS cc_in,
  s2CapContains(id_lo, 1.0, id_near) AS cc_out,
  abs(tupleElement(cu, 2)
      - (greatCircleAngle(lonA, latA, lonA + 6, latA) + 5.0) / 2) < 0.0001
    AS cu_ok,
  s2CapContains(tupleElement(cu, 1), tupleElement(cu, 2) + 0.000001, id_lo)
    AND s2CapContains(tupleElement(cu, 1), tupleElement(cu, 2) + 0.000001,
                      id_c) AS cu_cov
FROM ops ORDER BY event_id
""",
        dialect="clickhouse",
    )
