"""Geo scalar functions (SURVEY.md §2.8 geo family — upgraded from "skip" to
composite for the distance/containment subset; polygon/h3 index machinery
stays out of scope, documented).

All pure built-in column expressions (libm trig → callers should round
results for cross-engine comparison, queries/_util.r6).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints at runtime
from pyspark.sql import Column, functions as F

#: mean Earth radius, meters (the WGS84 mean; CH's greatCircleDistance uses
#: its own ellipsoidal constant — we pin the simple sphere and document it)
EARTH_RADIUS_M = 6371000.0


def great_circle_distance(
    lon1: Column, lat1: Column, lon2: Column, lat2: Column
) -> Column:
    """greatCircleDistance(lon1, lat1, lon2, lat2) → meters (haversine on a
    mean-radius sphere)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlon / 2)
        * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.least(F.lit(1.0), F.sqrt(a)))


def point_in_box(
    lon: Column, lat: Column, lon_min: Column, lat_min: Column,
    lon_max: Column, lat_max: Column,
) -> Column:
    """pointInBox (the rectangle case of CH's pointInPolygon family)."""
    return (
        (lon >= lon_min) & (lon <= lon_max) & (lat >= lat_min) & (lat <= lat_max)
    )


def point_in_polygon(
    x: Column, y: Column, polygon: "list[tuple[float, float]]"
) -> Column:
    """pointInPolygon((x, y), [(x1,y1), ...]) — even-odd ray casting.

    The polygon is a CONSTANT (the CH calling convention too: the polygon
    argument must be a literal), so the edge tests unroll at plan time into
    a sum of codegen'd comparisons — no arrays, no UDF, no shuffle.  A point
    is inside iff a ray to +inf in x crosses an odd number of edges.  Edge
    arithmetic is plain IEEE double (same ops, same order on any engine), so
    results are engine-deterministic; boundary points follow the strict `<`
    convention.  Closing edge (last→first vertex) is implicit.
    """
    crossings: Column | None = None
    n = len(polygon)
    for i in range(n):
        x1, y1 = polygon[i]
        x2, y2 = polygon[(i + 1) % n]
        straddles = (F.lit(y1) > y) != (F.lit(y2) > y)
        # x-coordinate where the edge crosses the point's horizontal line
        cross_x = F.lit(x1) + (y - F.lit(y1)) * F.lit((x2 - x1)) / F.lit((y2 - y1)) if y2 != y1 else F.lit(float("inf"))
        hit = F.when(straddles & (x < cross_x), 1).otherwise(0)
        crossings = hit if crossings is None else crossings + hit
    return (crossings % 2) == 1


# ---------------------------------------------------------------------------
# geohashEncode / geohashDecode (CH geo functions; public Niemeyer scheme)
# ---------------------------------------------------------------------------

_GH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode_py(lon: float, lat: float, precision: int = 12) -> str:
    """Standard geohash: interleave longitude/latitude interval-halving bits
    (lon first), 5 bits per base32 character."""
    lo_lat, hi_lat = -90.0, 90.0
    lo_lon, hi_lon = -180.0, 180.0
    out = []
    bit = 0
    ch = 0
    even = True  # longitude turn
    while len(out) < precision:
        if even:
            mid = (lo_lon + hi_lon) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lo_lon = mid
            else:
                ch <<= 1
                hi_lon = mid
        else:
            mid = (lo_lat + hi_lat) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lo_lat = mid
            else:
                ch <<= 1
                hi_lat = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(_GH_BASE32[ch])
            bit = 0
            ch = 0
    return "".join(out)


def geohash_decode_py(gh: str) -> tuple[float, float]:
    """Inverse: (lon, lat) cell midpoint of the geohash."""
    lo_lat, hi_lat = -90.0, 90.0
    lo_lon, hi_lon = -180.0, 180.0
    even = True
    for c in gh:
        v = _GH_BASE32.index(c)
        for shift in range(4, -1, -1):
            bit = (v >> shift) & 1
            if even:
                mid = (lo_lon + hi_lon) / 2
                if bit:
                    lo_lon = mid
                else:
                    hi_lon = mid
            else:
                mid = (lo_lat + hi_lat) / 2
                if bit:
                    lo_lat = mid
                else:
                    hi_lat = mid
            even = not even
    return ((lo_lon + hi_lon) / 2, (lo_lat + hi_lat) / 2)


def geohash_encode_sql(lon: str, lat: str, precision: int = 12) -> str:
    """SQL-expression geohash encode (round 10): the same Niemeyer
    interval-halving as :func:`geohash_encode_py`, but as ONE JVM
    ``aggregate`` fold over the 5·precision bit positions — zero Python,
    zero exchanges, usable from both text dialects (CH ``geohashEncode``,
    KQL ``geo_point_to_geohash``).  The bit accumulator is a single
    BIGINT (precision ≤ 12 → ≤ 60 bits), rendered to base32 by a final
    5-bit-group transform.  pytest pins SQL == python over a dense grid."""
    if not 1 <= precision <= 12:
        raise ValueError("geohash precision must be in 1..12")
    nbits = 5 * precision
    fold = (
        f"aggregate(sequence(0, {nbits - 1}), "
        f"named_struct('lo', -180.0D, 'hi', 180.0D, "
        f"'la', -90.0D, 'ha', 90.0D, 'bits', CAST(0 AS BIGINT)), "
        f"(__s, __b) -> IF(__b % 2 = 0, "
        f"IF(CAST({lon} AS DOUBLE) >= (__s.lo + __s.hi) / 2, "
        f"named_struct('lo', (__s.lo + __s.hi) / 2, 'hi', __s.hi, "
        f"'la', __s.la, 'ha', __s.ha, 'bits', __s.bits * 2 + 1), "
        f"named_struct('lo', __s.lo, 'hi', (__s.lo + __s.hi) / 2, "
        f"'la', __s.la, 'ha', __s.ha, 'bits', __s.bits * 2)), "
        f"IF(CAST({lat} AS DOUBLE) >= (__s.la + __s.ha) / 2, "
        f"named_struct('lo', __s.lo, 'hi', __s.hi, "
        f"'la', (__s.la + __s.ha) / 2, 'ha', __s.ha, "
        f"'bits', __s.bits * 2 + 1), "
        f"named_struct('lo', __s.lo, 'hi', __s.hi, 'la', __s.la, "
        f"'ha', (__s.la + __s.ha) / 2, 'bits', __s.bits * 2))), "
        f"__s -> __s.bits)"
    )
    return (
        f"concat_ws('', transform(sequence(0, {precision - 1}), "
        f"__c -> substr('{_GH_BASE32}', "
        f"CAST(shiftright({fold}, ({precision - 1} - __c) * 5) & 31 AS INT) "
        f"+ 1, 1)))"
    )


def geohash_decode_sql(gh: str) -> str:
    """SQL-expression geohash decode → STRUCT(lon, lat) cell midpoint —
    one ``aggregate`` fold over the hash's bit positions, the inverse of
    :func:`geohash_encode_sql` (variable-length input: the bit count is
    5·length(gh), each bit looked up from its character's base32 index).
    NULL/empty input yields the full-globe midpoint per the python twin."""
    bit_of = (
        f"(shiftright(CAST(locate(substr({gh}, CAST(__b / 5 AS INT) + 1, 1), "
        f"'{_GH_BASE32}') - 1 AS BIGINT), 4 - CAST(__b % 5 AS INT)) & 1)"
    )
    fold = (
        f"aggregate(sequence(0, CAST(5 * length({gh}) - 1 AS INT)), "
        f"named_struct('lo', -180.0D, 'hi', 180.0D, "
        f"'la', -90.0D, 'ha', 90.0D), "
        f"(__s, __b) -> IF(__b % 2 = 0, "
        f"IF({bit_of} = 1, "
        f"named_struct('lo', (__s.lo + __s.hi) / 2, 'hi', __s.hi, "
        f"'la', __s.la, 'ha', __s.ha), "
        f"named_struct('lo', __s.lo, 'hi', (__s.lo + __s.hi) / 2, "
        f"'la', __s.la, 'ha', __s.ha)), "
        f"IF({bit_of} = 1, "
        f"named_struct('lo', __s.lo, 'hi', __s.hi, "
        f"'la', (__s.la + __s.ha) / 2, 'ha', __s.ha), "
        f"named_struct('lo', __s.lo, 'hi', __s.hi, 'la', __s.la, "
        f"'ha', (__s.la + __s.ha) / 2))), "
        f"__s -> named_struct('lon', (__s.lo + __s.hi) / 2, "
        f"'lat', (__s.la + __s.ha) / 2))"
    )
    # empty/NULL input: sequence(0, -1) would run DESCENDING — guard to
    # the python twin's full-globe midpoint instead
    return (
        f"CASE WHEN coalesce(length({gh}), 0) < 1 "
        f"THEN named_struct('lon', 0.0D, 'lat', 0.0D) ELSE {fold} END"
    )


def great_circle_angle(
    lon1: Column, lat1: Column, lon2: Column, lat2: Column
) -> Column:
    """greatCircleAngle(lon1, lat1, lon2, lat2) → central angle in DEGREES
    (the haversine central angle, i.e. greatCircleDistance / R expressed
    angularly — CH's own definition).  libm-backed: callers round for
    cross-engine comparison."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlon / 2)
        * F.sin(dlon / 2)
    )
    return F.degrees(F.lit(2.0) * F.asin(F.least(F.lit(1.0), F.sqrt(a))))


def point_in_ellipses(
    x: Column, y: Column, ellipses: "list[tuple[float, float, float, float]]"
) -> Column:
    """pointInEllipses(x, y, x0, y0, a, b, ...) — true iff the point lies in
    at least one of the constant axis-aligned ellipses (CH requires the
    ellipse parameters to be constants too).  Unrolls at plan time into a
    codegen'd OR of quadratic tests — exact IEEE arithmetic, no rounding
    needed for cross-engine parity."""
    hit: Column | None = None
    for x0, y0, a, b in ellipses:
        t = (
            ((x - F.lit(x0)) / F.lit(a)) * ((x - F.lit(x0)) / F.lit(a))
            + ((y - F.lit(y0)) / F.lit(b)) * ((y - F.lit(y0)) / F.lit(b))
        ) <= F.lit(1.0)
        hit = t if hit is None else (hit | t)
    if hit is None:
        return F.lit(False)
    return hit


def geohashes_in_box_py(
    lon_min: float, lat_min: float, lon_max: float, lat_max: float,
    precision: int,
) -> list[str]:
    """All geohash cells of ``precision`` intersecting the closed box
    (CH geohashesInBox).  Cell grid: precision*5 bits split lon-first —
    ceil(5p/2) longitude bits, floor(5p/2) latitude bits; a cell is included
    iff its index interval intersects [min, max].  Mirrors CH's 10M-cell
    safety cap with a (much smaller) guard suited to a per-row kernel."""
    lon_bits = (5 * precision + 1) // 2
    lat_bits = (5 * precision) // 2
    w = 360.0 / (1 << lon_bits)
    h = 180.0 / (1 << lat_bits)
    i0 = max(0, int((lon_min + 180.0) / w))
    i1 = min((1 << lon_bits) - 1, int((lon_max + 180.0) / w))
    j0 = max(0, int((lat_min + 90.0) / h))
    j1 = min((1 << lat_bits) - 1, int((lat_max + 90.0) / h))
    if (i1 - i0 + 1) * (j1 - j0 + 1) > 100_000:
        raise ValueError("geohashesInBox: cell count exceeds 100000 cap")
    out = []
    for i in range(i0, i1 + 1):
        for j in range(j0, j1 + 1):
            lon = -180.0 + (i + 0.5) * w
            lat = -90.0 + (j + 0.5) * h
            out.append(geohash_encode_py(lon, lat, precision))
    return out


def geohashes_in_box(lon_min, lat_min, lon_max, lat_max, precision: int = 4):
    """Column form of geohashesInBox (Arrow-batched pandas kernel, same tier
    as geohash_encode).  Returns array<string>."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _udf(a: pd.Series, b: pd.Series, c: pd.Series, d: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if any(v is None for v in (p, q, r, s))
                else geohashes_in_box_py(float(p), float(q), float(r), float(s),
                                         precision)
                for p, q, r, s in zip(a, b, c, d)
            ]
        )

    cols = [
        F.col(v) if isinstance(v, str) else v
        for v in (lon_min, lat_min, lon_max, lat_max)
    ]
    return _udf(*cols)


def geohash_encode(lon, lat, precision: int = 12):
    """Column form (Arrow-batched pandas kernel; geo bucketing tier)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _udf(lo: pd.Series, la: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if x is None or y is None
                else geohash_encode_py(float(x), float(y), precision)
                for x, y in zip(lo, la)
            ]
        )

    lon_c = F.col(lon) if isinstance(lon, str) else lon
    lat_c = F.col(lat) if isinstance(lat, str) else lat
    return _udf(lon_c, lat_c)


# ---------------------------------------------------------------------------
# hilbertEncode / hilbertDecode (CH 24.x, the locality-preserving sibling of
# mortonEncode; public d2xy/xy2d algorithm — Hilbert 1891 curve, standard
# bit-iteration form)
# ---------------------------------------------------------------------------

def hilbert_encode_py(x: int, y: int, bits: int = 16) -> int:
    """xy → d on the 2^bits × 2^bits Hilbert curve (standard rot/reflect
    iteration).  16-bit coordinates by default so d fits in 32 bits — the
    documented subset (CH accepts full UInt32 pairs into UInt64)."""
    rx = ry = 0
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        # rotate
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def hilbert_decode_py(d: int, bits: int = 16) -> "tuple[int, int]":
    """Inverse: d → (x, y)."""
    x = y = 0
    t = d
    s = 1
    while s < (1 << bits):
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s <<= 1
    return x, y


def hilbert_encode(x, y, bits: int = 16):
    """Column form (Arrow-batched kernel, same tier as geohash_encode)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if p is None or q is None
                else hilbert_encode_py(int(p), int(q), bits)
                for p, q in zip(a, b)
            ]
        )

    return _udf(
        F.col(x) if isinstance(x, str) else x,
        F.col(y) if isinstance(y, str) else y,
    )


def hilbert_decode(d, bits: int = 16):
    """Column form of the inverse: struct(x, y)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("x long, y long")
    def _udf(s: pd.Series) -> pd.DataFrame:
        xs, ys = [], []
        for v in s:
            if v is None:
                xs.append(None)
                ys.append(None)
            else:
                a, b = hilbert_decode_py(int(v), bits)
                xs.append(a)
                ys.append(b)
        return pd.DataFrame({"x": xs, "y": ys})

    return _udf(F.col(d) if isinstance(d, str) else d)
