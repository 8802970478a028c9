"""ClickHouse function-name compatibility layer (SURVEY.md §2.8 — 'full
CH↔Spark name map lives in the future chspark/functions.py': this is it).

Each public callable carries the ClickHouse name (camelCase, as shipped in
the reference's engine pin, /root/reference Dockerfile:102-104) and builds the
equivalent Spark Column expression — zero-overhead aliases, all JVM-side.
A user porting queries from the reference can keep their function vocabulary:

    from clickhouseocp_spark.functions import clickhouse_names as ch
    df.select(ch.toYYYYMM("ts"), ch.multiIf((cond, 'a'), default='b'))

Deliberate ANSI deviations from ClickHouse are documented per function
(SURVEY §7.4): ``intDiv`` truncates toward zero like CH; ``any`` requires an
explicit deterministic ordering upstream; NULL propagation is ANSI.

``MAPPING`` indexes every alias → implementation note for the parity
inventory.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --- arithmetic / rounding --------------------------------------------------

def plus(a, b) -> Column:
    return _c(a) + _c(b)


def minus(a, b) -> Column:
    return _c(a) - _c(b)


def multiply(a, b) -> Column:
    return _c(a) * _c(b)


def divide(a, b) -> Column:
    """Float division (CH divide always returns Float64)."""
    return _c(a).cast("double") / _c(b).cast("double")


def intDiv(a, b) -> Column:
    """Integer division truncating toward zero — CH semantics (float divide
    then truncate-cast; Spark's floor-div `/`+floor would differ on negatives)."""
    return F.try_divide(_c(a), _c(b)).cast("long")


def modulo(a, b) -> Column:
    return _c(a) % _c(b)


def negate(a) -> Column:
    return -_c(a)


def intDivOrZero(a, b) -> Column:
    return F.coalesce(F.try_divide(_c(a), _c(b)).cast("long"), F.lit(0))


def roundBankers(a, n: int = 0) -> Column:
    return F.bround(_c(a), n)


def _sql(col) -> str:
    return col if isinstance(col, str) else str(col)


# --- conditional ------------------------------------------------------------

def if_(cond: Column, then, else_) -> Column:
    return F.when(cond, then).otherwise(else_)


def multiIf(*cond_value_pairs, default=None) -> Column:
    """multiIf(c1, v1, c2, v2, ..., default) — pass (cond, value) tuples."""
    expr = None
    for cond, value in cond_value_pairs:
        expr = F.when(cond, value) if expr is None else expr.when(cond, value)
    return expr.otherwise(default)


def ifNull(a, b) -> Column:
    return F.coalesce(_c(a), _c(b))


def nullIf(a, b) -> Column:
    return F.nullif(_c(a), _c(b))


def assumeNotNull(a) -> Column:
    return F.coalesce(_c(a), F.lit(0))


# --- strings ----------------------------------------------------------------

def lengthUTF8(a) -> Column:
    return F.length(_c(a))


def lowerUTF8(a) -> Column:
    return F.lower(_c(a))


def upperUTF8(a) -> Column:
    return F.upper(_c(a))


def concatWithSeparator(sep: str, *cols) -> Column:
    return F.concat_ws(sep, *[_c(c) for c in cols])


def splitByChar(sep: str, a) -> Column:
    import re

    return F.split(_c(a), re.escape(sep))


def arrayStringConcat(arr, sep: str = "") -> Column:
    return F.array_join(_c(arr), sep)


def position(haystack, needle) -> Column:
    """1-based position, 0 when absent (CH position)."""
    return F.instr(_c(haystack), needle) if isinstance(needle, str) else F.locate(needle, _c(haystack))


def replaceOne(a, needle: str, replacement: str) -> Column:
    """Replace only the FIRST occurrence (Spark's replace/regexp_replace are
    replace-all, so splice via locate)."""
    c = _c(a)
    pos = F.instr(c, needle)
    return F.when(pos == 0, c).otherwise(
        F.concat(
            F.substring(c, 1, pos - 1),
            F.lit(replacement),
            F.substring(c, pos + len(needle), F.length(c)),
        )
    )


def replaceAll(a, pattern: str, replacement: str) -> Column:
    import re

    return F.regexp_replace(_c(a), re.escape(pattern), replacement)


def replaceRegexpAll(a, pattern: str, replacement: str) -> Column:
    return F.regexp_replace(_c(a), pattern, replacement)


def extract(a, pattern: str) -> Column:
    return F.regexp_extract(_c(a), pattern, 1)


def extractAll(a, pattern: str) -> Column:
    return F.regexp_extract_all(_c(a), F.lit(pattern))


def match(a, pattern: str) -> Column:
    return _c(a).rlike(pattern)


def multiSearchAny(a, needles: list[str]) -> Column:
    out = F.lit(False)
    for n in needles:
        out = out | _c(a).contains(n)
    return out


def startsWith(a, prefix: str) -> Column:
    return _c(a).startswith(prefix)


def endsWith(a, suffix: str) -> Column:
    return _c(a).endswith(suffix)


def leftPad(a, length: int, pad: str = " ") -> Column:
    return F.lpad(_c(a), length, pad)


def rightPad(a, length: int, pad: str = " ") -> Column:
    return F.rpad(_c(a), length, pad)


def trimBoth(a) -> Column:
    return F.trim(_c(a))


# --- date / time ------------------------------------------------------------

def toYYYYMM(a) -> Column:
    """CH returns UInt32; we return int (documented cast, SURVEY §7.4)."""
    return F.date_format(_c(a), "yyyyMM").cast("int")


def toYYYYMMDD(a) -> Column:
    return F.date_format(_c(a), "yyyyMMdd").cast("int")


def toStartOfDay(a) -> Column:
    return F.date_trunc("day", _c(a))


def toStartOfHour(a) -> Column:
    return F.date_trunc("hour", _c(a))


def toStartOfMonth(a) -> Column:
    return F.date_trunc("month", _c(a))


def toStartOfQuarter(a) -> Column:
    return F.date_trunc("quarter", _c(a))


def toStartOfYear(a) -> Column:
    return F.date_trunc("year", _c(a))


def toStartOfInterval(a, interval: str) -> Column:
    """toStartOfInterval(ts, INTERVAL n unit) → window bucketing."""
    return F.window(_c(a), interval).getField("start")


#: interval-unit → seconds, for the origin overload's epoch arithmetic
_INTERVAL_SECS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def toStartOfIntervalOrigin(a, interval: str, origin) -> Column:
    """toStartOfInterval(ts, INTERVAL n unit, origin) — the 25.x third-arg
    overload: buckets align to ``origin``'s grid instead of the epoch/
    calendar grid.  Subset: second/minute/hour/day units (the sub-month
    units where a shifted grid is well-defined as fixed-width steps);
    lowered to pure epoch arithmetic — origin + floor((ts-origin)/step)*step
    — all whole-stage-codegen expressions."""
    m = _re.match(r"^\s*(\d+)\s+(second|minute|hour|day)s?\s*$", interval,
                  _re.IGNORECASE)
    if not m:
        raise ValueError(
            "toStartOfIntervalOrigin subset: 'N second|minute|hour|day', "
            f"got {interval!r}"
        )
    secs = int(m.group(1)) * _INTERVAL_SECS[m.group(2).lower()]
    o_ep = F.unix_timestamp(_c(origin))
    t_ep = F.unix_timestamp(_c(a))
    return F.timestamp_seconds(
        o_ep + F.floor((t_ep - o_ep) / secs).cast("bigint") * secs
    )


def toDayOfWeek(a) -> Column:
    """ISO: Monday=1 (CH default mode)."""
    return (F.weekday(_c(a)) + 1).cast("int")


def toHour(a) -> Column:
    return F.hour(_c(a))


def toMinute(a) -> Column:
    return F.minute(_c(a))


def toDate(a) -> Column:
    return F.to_date(_c(a))


def toDateTime(a) -> Column:
    return F.to_timestamp(_c(a))


def toUnixTimestamp(a) -> Column:
    return F.unix_timestamp(_c(a))


def fromUnixTimestamp(a) -> Column:
    return F.timestamp_seconds(_c(a))


def dateDiff(unit: str, start, end) -> Column:
    return F.timestampdiff(unit, _c(start), _c(end))


def dateAdd(unit: str, n: int, a) -> Column:
    return _c(a) + F.expr(f"INTERVAL {n} {unit}")


def addDays(a, n: int) -> Column:
    return dateAdd("DAY", n, a)


def addMonths(a, n: int) -> Column:
    return dateAdd("MONTH", n, a)


def formatDateTime(a, fmt: str) -> Column:
    """CH %-style format → pass a Spark pattern (documented deviation)."""
    return F.date_format(_c(a), fmt)


def now() -> Column:
    return F.current_timestamp()


def today() -> Column:
    return F.current_date()


# --- arrays -----------------------------------------------------------------

def arrayMap(fn, arr) -> Column:
    return F.transform(_c(arr), fn)


def arrayFilter(fn, arr) -> Column:
    return F.filter(_c(arr), fn)


def arrayExists(fn, arr) -> Column:
    return F.exists(_c(arr), fn)


def arrayAll(fn, arr) -> Column:
    return F.forall(_c(arr), fn)


def arraySum(arr) -> Column:
    return F.aggregate(_c(arr), F.lit(0).cast("double"), lambda a, x: a + x.cast("double"))


def arrayAvg(arr) -> Column:
    return arraySum(arr) / F.size(_c(arr))


def arrayMin(arr) -> Column:
    return F.array_min(_c(arr))


def arrayMax(arr) -> Column:
    return F.array_max(_c(arr))


def arrayCount(fn, arr) -> Column:
    return F.size(F.filter(_c(arr), fn))


def arrayCumSum(arr) -> Column:
    """Running-sum array (CH arrayCumSum) via an index-driven prefix fold."""
    a = _c(arr)
    return F.transform(
        F.sequence(F.lit(1), F.size(a)),
        lambda i: F.aggregate(
            F.slice(a, 1, i), F.lit(0).cast("double"), lambda acc, x: acc + x.cast("double")
        ),
    )


def arrayDistinct(arr) -> Column:
    return F.array_distinct(_c(arr))


def arraySort(arr) -> Column:
    return F.array_sort(_c(arr))


def arrayReverseSort(arr) -> Column:
    return F.reverse(F.array_sort(_c(arr)))


def arrayJoin(arr) -> Column:
    """Row-multiplying arrayJoin → use inside select: explode."""
    return F.explode(_c(arr))


def arrayConcat(*arrs) -> Column:
    return F.concat(*[_c(a) for a in arrs])


def arrayElement(arr, idx) -> Column:
    return F.element_at(_c(arr), idx)


def arraySlice(arr, offset: int, length: int) -> Column:
    return F.slice(_c(arr), offset, length)


def arrayZip(*arrs) -> Column:
    return F.arrays_zip(*[_c(a) for a in arrs])


def arrayZipUnaligned(*arrs) -> Column:
    """CH arrayZipUnaligned (24.8): zip arrays of DIFFERENT lengths, padding
    the short ones with NULL — exactly Spark's arrays_zip contract (CH's
    plain arrayZip throws on length mismatch; ours inherits the pad-NULL
    behavior for both, a documented deviation on arrayZip only)."""
    return F.arrays_zip(*[_c(a) for a in arrs])


def mapSort(m) -> Column:
    """CH mapSort(map): entries reordered by ascending key.  Lowered to
    map_entries → array_sort → map_from_entries (array_sort on structs
    orders by the first field = the key)."""
    return F.map_from_entries(F.array_sort(F.map_entries(_c(m))))


def mapReverseSort(m) -> Column:
    """CH mapReverseSort(map): entries by descending key."""
    return F.map_from_entries(F.reverse(F.array_sort(F.map_entries(_c(m)))))


def arrayFlatten(arr) -> Column:
    return F.flatten(_c(arr))


def arrayIntersect(a, b) -> Column:
    return F.array_intersect(_c(a), _c(b))


def arrayDifference(arr) -> Column:
    """Pairwise differences [0, a1-a0, ...] (CH arrayDifference)."""
    a = _c(arr)
    return F.transform(
        F.sequence(F.lit(1), F.size(a)),
        lambda i: F.when(i == 1, F.lit(0.0)).otherwise(
            F.element_at(a, i).cast("double") - F.element_at(a, i - 1).cast("double")
        ),
    )


def has(arr, value) -> Column:
    return F.array_contains(_c(arr), value)


def hasAll(a, b) -> Column:
    return F.forall(_c(b), lambda x: F.array_contains(_c(a), x))


def hasAny(a, b) -> Column:
    return F.arrays_overlap(_c(a), _c(b))


def indexOf(arr, value) -> Column:
    return F.array_position(_c(arr), value)


def range_(n) -> Column:
    return F.sequence(F.lit(0), _c(n) - 1) if not isinstance(n, int) else F.sequence(F.lit(0), F.lit(n - 1))


# --- maps / tuples ----------------------------------------------------------

def map_(*kv) -> Column:
    return F.create_map(*[_c(x) if not isinstance(x, (int, float)) else F.lit(x) for x in kv])


def mapKeys(m) -> Column:
    return F.map_keys(_c(m))


def mapValues(m) -> Column:
    return F.map_values(_c(m))


def mapContains(m, key) -> Column:
    return F.map_contains_key(_c(m), key)


def mapApply(fn, m) -> Column:
    return F.transform_values(_c(m), fn)


def mapFilter(fn, m) -> Column:
    return F.map_filter(_c(m), fn)


def tuple_(*cols) -> Column:
    return F.struct(*[_c(c) for c in cols])


def tupleElement(t, name_or_idx) -> Column:
    return _c(t).getField(name_or_idx) if isinstance(name_or_idx, str) else _c(t).getField(f"col{name_or_idx}")


# --- JSON -------------------------------------------------------------------

def JSONExtractString(j, path: str) -> Column:
    return F.get_json_object(_c(j), f"$.{path}" if not path.startswith("$") else path)


def JSONExtractInt(j, path: str) -> Column:
    return JSONExtractString(j, path).cast("bigint")


def JSONExtractFloat(j, path: str) -> Column:
    return JSONExtractString(j, path).cast("double")


def JSONExtractBool(j, path: str) -> Column:
    return JSONExtractString(j, path).cast("boolean")


def JSONHas(j, path: str) -> Column:
    return JSONExtractString(j, path).isNotNull()


def JSONLength(j) -> Column:
    return F.json_array_length(_c(j))


# --- hash / encoding --------------------------------------------------------

def cityHash64(*cols) -> Column:
    """CH cityHash64 role (fast 64-bit hash) → xxhash64 (different algorithm,
    same contract: deterministic 64-bit; documented deviation)."""
    return F.xxhash64(*[_c(c) for c in cols])


def sipHash64(*cols) -> Column:
    return F.xxhash64(*[_c(c) for c in cols])


def halfMD5(a) -> Column:
    return F.conv(F.substring(F.md5(_c(a)), 1, 15), 16, 10).cast("bigint")


def MD5(a) -> Column:
    return F.md5(_c(a))


def SHA256(a) -> Column:
    return F.sha2(_c(a), 256)


def hex_(a) -> Column:
    return F.hex(_c(a))


def unhex(a) -> Column:
    return F.unhex(_c(a))


def base64Encode(a) -> Column:
    return F.base64(F.encode(_c(a), "utf-8"))


def base64Decode(a) -> Column:
    return F.decode(F.unbase64(_c(a)), "utf-8")


# --- bit --------------------------------------------------------------------

def bitAnd(a, b) -> Column:
    return _c(a).bitwiseAND(_c(b))


def bitOr(a, b) -> Column:
    return _c(a).bitwiseOR(_c(b))


def bitXor(a, b) -> Column:
    return _c(a).bitwiseXOR(_c(b))


def bitNot(a) -> Column:
    return F.bitwise_not(_c(a))


def bitShiftLeft(a, n: int) -> Column:
    return F.shiftleft(_c(a), n)


def bitShiftRight(a, n: int) -> Column:
    return F.shiftright(_c(a), n)


def bitCount(a) -> Column:
    return F.bit_count(_c(a))


# --- IP ---------------------------------------------------------------------

def IPv4NumToString(a) -> Column:
    """uint32 → dotted quad, pure arithmetic (portable)."""
    c = _c(a)
    return F.concat_ws(
        ".",
        ((c / 16777216).cast("long") % 256).cast("string"),
        ((c / 65536).cast("long") % 256).cast("string"),
        ((c / 256).cast("long") % 256).cast("string"),
        (c % 256).cast("string"),
    )


def IPv4StringToNum(a) -> Column:
    parts = F.split(_c(a), r"\.")
    return (
        F.element_at(parts, 1).cast("long") * 16777216
        + F.element_at(parts, 2).cast("long") * 65536
        + F.element_at(parts, 3).cast("long") * 256
        + F.element_at(parts, 4).cast("long")
    )


#: dotted-quad with every octet 0-255 (anchored; no leading-zero rejection —
#: CH accepts them too)
_IPV4_RE = (
    r"^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
    r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"
)
#: RFC-4291 textual IPv6 (full, ::-compressed, and v4-mapped tails)
_IPV6_RE = (
    r"^(([0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}"
    r"|([0-9A-Fa-f]{1,4}:){1,7}:"
    r"|([0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4}"
    r"|([0-9A-Fa-f]{1,4}:){1,5}(:[0-9A-Fa-f]{1,4}){1,2}"
    r"|([0-9A-Fa-f]{1,4}:){1,4}(:[0-9A-Fa-f]{1,4}){1,3}"
    r"|([0-9A-Fa-f]{1,4}:){1,3}(:[0-9A-Fa-f]{1,4}){1,4}"
    r"|([0-9A-Fa-f]{1,4}:){1,2}(:[0-9A-Fa-f]{1,4}){1,5}"
    r"|[0-9A-Fa-f]{1,4}:((:[0-9A-Fa-f]{1,4}){1,6})"
    r"|:((:[0-9A-Fa-f]{1,4}){1,7}|:)"
    r"|([0-9A-Fa-f]{1,4}:){1,4}:((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
    r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    r"|::([fF]{4}:)?((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
    r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9]))$"
)


def isIPv4String(a) -> Column:
    """CH isIPv4String: 1/0 (UInt8 → int here) — anchored dotted-quad."""
    return _c(a).rlike(_IPV4_RE).cast("int")


def isIPv6String(a) -> Column:
    """CH isIPv6String: 1/0 — RFC-4291 textual forms via one anchored
    regex (full / ::-compressed / v4-mapped)."""
    return _c(a).rlike(_IPV6_RE).cast("int")


def toIPv4OrNull(a) -> Column:
    """CH toIPv4OrNull, represented numerically (the engine's IPv4 is a
    UInt32 under the hood): valid dotted quad → uint32 as BIGINT, else
    NULL."""
    c = _c(a)
    return F.when(c.rlike(_IPV4_RE), IPv4StringToNum(c)).otherwise(
        F.lit(None).cast("bigint")
    )


def IPv4CIDRToRange(a, prefix) -> Column:
    """CH IPv4CIDRToRange(ip, prefix) → (lo, hi) of the CIDR block, as a
    struct of dotted quads — pure shift/mask arithmetic."""
    ip = _c(a).cast("long")
    p = _c(prefix) if not isinstance(prefix, int) else F.lit(prefix)
    host_bits = (F.lit(32) - p.cast("int")).cast("int")
    block = F.pow(F.lit(2.0), host_bits.cast("double")).cast("long")
    lo = (ip / block).cast("long") * block
    hi = lo + block - 1
    return F.struct(
        IPv4NumToString(lo).alias("lo"), IPv4NumToString(hi).alias("hi")
    )


def UUIDStringToNum(a) -> Column:
    """CH UUIDStringToNum: canonical UUID text → 16 raw bytes (FixedString
    in CH; BINARY here) — unhex of the dash-stripped hex."""
    return F.unhex(F.replace(_c(a), F.lit("-"), F.lit("")))


def UUIDNumToString(a) -> Column:
    """CH UUIDNumToString: 16 bytes → canonical dashed lowercase text."""
    h = F.lower(F.hex(_c(a)))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


_UUID_RE = (
    r"^[0-9A-Fa-f]{8}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-"
    r"[0-9A-Fa-f]{4}-[0-9A-Fa-f]{12}$"
)


def toUUIDOrNull(a) -> Column:
    """CH toUUIDOrNull: canonical-form text (lowercased) or NULL."""
    c = _c(a)
    return F.when(c.rlike(_UUID_RE), F.lower(c)).otherwise(
        F.lit(None).cast("string")
    )


#: Crockford base32 alphabet (ULID spec)
_CROCKFORD = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"


def ULIDStringToDateTime(a) -> Column:
    """CH ULIDStringToDateTime: the first 10 Crockford-base32 chars of a
    ULID encode milliseconds since epoch — decoded with a literal-map
    alphabet lookup inside one fold, no UDF."""
    lookup = F.create_map(
        *[x for i, c in enumerate(_CROCKFORD) for x in (F.lit(c), F.lit(i))]
    )
    chars = F.filter(
        F.split(F.substring(F.upper(_c(a)), 1, 10), ""), lambda ch: ch != ""
    )
    ms = F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: acc * 32 + F.element_at(lookup, ch).cast("bigint"),
    )
    return F.timestamp_millis(ms)


# --- type conversion --------------------------------------------------------

def toInt64(a) -> Column:
    return _c(a).cast("bigint")


def toInt32(a) -> Column:
    return _c(a).cast("int")


def toFloat64(a) -> Column:
    return _c(a).cast("double")


def toString(a) -> Column:
    return _c(a).cast("string")


def toDecimal(a, precision: int, scale: int) -> Column:
    return _c(a).cast(f"decimal({precision},{scale})")


def accurateCastOrNull(a, t: str) -> Column:
    return _c(a).try_cast(t)


def toTypeName(a) -> Column:
    return F.typeof(_c(a))


# --- aggregate-name aliases (for .agg(...) call sites) ----------------------

def uniq(a) -> Column:
    return F.approx_count_distinct(_c(a))


def uniqExact(a) -> Column:
    return F.countDistinct(_c(a))


def argMax(a, b) -> Column:
    return F.max_by(_c(a), _c(b))


def argMin(a, b) -> Column:
    return F.min_by(_c(a), _c(b))


def groupArray(a) -> Column:
    return F.collect_list(_c(a))


def groupUniqArray(a) -> Column:
    return F.collect_set(_c(a))


def quantile(a, q: float) -> Column:
    return F.percentile_approx(_c(a), q)


def quantileExact(a, q: float) -> Column:
    return F.percentile(_c(a), F.lit(q))


def median(a) -> Column:
    return F.percentile(_c(a), F.lit(0.5))


def anyLast(a) -> Column:
    return F.last(_c(a), ignorenulls=True)


def any_(a) -> Column:
    """CH any() is nondeterministic; we map to first(ignorenulls) and REQUIRE
    a deterministic upstream ordering (SURVEY §7.4)."""
    return F.first(_c(a), ignorenulls=True)


def topK(a, k: int) -> Column:
    """Exact top-k values as array (CH returns approximate; we return exact
    from a full sort of the distinct counts — documented upgrade)."""
    return F.slice(
        F.reverse(F.array_sort(F.collect_list(_c(a)))), 1, k
    )


# --- formatting / presentation vocabulary (round 3) -------------------------

#: eighth-block characters for bar()'s fractional cell, index 0..7
_EIGHTHS = ["", "▏", "▎", "▍", "▌", "▋", "▊", "▉"]


def formatReadableSize(a) -> Column:
    """CH formatReadableSize: bytes → '1.23 KiB' with 1024-steps and two
    decimals.  The numeric part renders via DECIMAL(18,2)→string so both
    engines print identical trailing zeros."""
    x = _c(a).cast("double")
    # floor(log2(x)/10) = power-of-1024 bucket
    unit_idx = F.when(x < 1024, F.lit(0)).otherwise(
        F.least(F.floor(F.log2(x) / 10).cast("int"), F.lit(8))
    )
    units = F.array(
        *[F.lit(u) for u in ("B", "KiB", "MiB", "GiB", "TiB", "PiB", "EiB", "ZiB", "YiB")]
    )
    scaled = x / F.pow(F.lit(2.0), unit_idx.cast("double") * 10)
    num = F.round(scaled, 2).cast("decimal(18,2)").cast("string")
    return F.concat(num, F.lit(" "), F.element_at(units, unit_idx + 1))


def ngramSimHash(a, n: int = 3) -> Column:
    """CH ngramSimHash(s[, n]): char n-gram SimHash fingerprint — portable
    md5-based definition (functions/text.py::simhash64; documented
    deviation: CH's internal hash mix differs, near-dup semantics match)."""
    from clickhouseocp_spark.functions.text import char_shingles, simhash64

    return simhash64(char_shingles(_c(a), n))


def wordShingleSimHash(a, n: int = 3) -> Column:
    """CH wordShingleSimHash(s[, shinglesize]): word-shingle SimHash over
    lowercase alnum tokens (same portable md5 definition)."""
    from clickhouseocp_spark.functions.text import simhash64, word_shingles

    toks = F.filter(F.split(F.lower(_c(a)), "[^a-z0-9]+"), lambda t: t != "")
    return simhash64(word_shingles(toks, n))


def ngramMinHash(a, n: int = 3) -> Column:
    """CH ngramMinHash(s[, n]): the (min, max) tuple over the char n-gram
    hash set (struct here)."""
    from clickhouseocp_spark.functions.text import char_shingles, minhash_pair

    return minhash_pair(char_shingles(_c(a), n))


def wordShingleMinHash(a, n: int = 3) -> Column:
    """CH wordShingleMinHash(s[, shinglesize]): (min, max) over word-shingle
    hashes."""
    from clickhouseocp_spark.functions.text import minhash_pair, word_shingles

    toks = F.filter(F.split(F.lower(_c(a)), "[^a-z0-9]+"), lambda t: t != "")
    return minhash_pair(word_shingles(toks, n))


def formatReadableDecimalSize(a) -> Column:
    """CH formatReadableDecimalSize (22.x): bytes → '1.23 MB' with
    1000-steps (decimal SI units, vs formatReadableSize's 1024/KiB) and two
    decimals; DECIMAL(18,2)→string keeps trailing zeros identical across
    engines."""
    x = _c(a).cast("double")
    unit_idx = F.when(x < 1000, F.lit(0)).otherwise(
        F.least(F.floor(F.log10(x) / 3).cast("int"), F.lit(8))
    )
    units = F.array(
        *[F.lit(u) for u in ("B", "KB", "MB", "GB", "TB", "PB", "EB", "ZB", "YB")]
    )
    scaled = x / F.pow(F.lit(10.0), unit_idx.cast("double") * 3)
    num = F.round(scaled, 2).cast("decimal(18,2)").cast("string")
    return F.concat(num, F.lit(" "), F.element_at(units, unit_idx + 1))


def formatReadableQuantity(a) -> Column:
    """CH formatReadableQuantity: 1234567 → '1.23 million' (thousand/million/
    billion/trillion steps)."""
    x = _c(a).cast("double")
    unit_idx = F.when(x < 1000, F.lit(0)).otherwise(
        F.least(F.floor(F.log10(x) / 3).cast("int"), F.lit(4))
    )
    units = F.array(*[F.lit(u) for u in ("", " thousand", " million", " billion", " trillion")])
    scaled = x / F.pow(F.lit(10.0), unit_idx.cast("double") * 3)
    num = F.round(scaled, 2).cast("decimal(18,2)").cast("string")
    return F.concat(num, F.element_at(units, unit_idx + 1))


def bar(x, min_v: float, max_v: float, width: float = 80) -> Column:
    """CH bar(): unicode bar of ⌊(x-min)/(max-min)·width·8⌋ eighth-blocks —
    full blocks plus one partial eighth-block character, exactly CH's glyph
    choice."""
    frac = (_c(x).cast("double") - F.lit(float(min_v))) / F.lit(float(max_v - min_v))
    clamped = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
    eighths = F.floor(clamped * F.lit(float(width) * 8)).cast("int")
    full = (eighths / 8).cast("int")
    rem = eighths % 8
    partial = F.element_at(F.array(*[F.lit(c) for c in _EIGHTHS]), rem + 1)
    return F.concat(F.repeat(F.lit("█"), full), partial)


def transform(source, from_vals: list, to_vals: list, default) -> Column:
    """CH transform(x, [from...], [to...], default): array-pair lookup with
    fallback — lowered to a map literal + element_at + coalesce (Catalyst
    folds it to a static lookup; no join, no UDF)."""
    pairs = []
    for f_, t_ in zip(from_vals, to_vals):
        pairs.extend([F.lit(f_), F.lit(t_)])
    m = F.create_map(*pairs)
    d = default if isinstance(default, Column) else F.lit(default)
    return F.coalesce(F.element_at(m, _c(source)), d)


def countSubstrings(haystack, needle: str) -> Column:
    """CH countSubstrings: non-overlapping occurrence count via length
    difference."""
    h = _c(haystack)
    return (
        (F.length(h) - F.length(F.replace(h, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("bigint")


def positionCaseInsensitive(haystack, needle: str) -> Column:
    return F.instr(F.lower(_c(haystack)), needle.lower())


def monthName(a) -> Column:
    """CH monthName: full English month name."""
    return F.date_format(_c(a), "MMMM")


def age(unit: str, start, end) -> Column:
    """CH age(unit, s, e): whole elapsed units between two instants (day /
    hour / minute / second lowered to exact integer arithmetic on the epoch
    difference — month/year would need calendar logic; those route through
    months_between upstream)."""
    secs = F.unix_timestamp(_c(end)) - F.unix_timestamp(_c(start))
    per = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[unit]
    return F.floor(secs / F.lit(per)).cast("bigint")


def toStartOfWeek(a) -> Column:
    """Monday-based week start (CH mode 1), DATE-typed."""
    return F.date_trunc("week", _c(a)).cast("date")


def toLastDayOfMonth(a) -> Column:
    return F.last_day(_c(a))


# --- vocabulary sweep batch 5 (round 5) -------------------------------------

def widthBucket(x, lo, hi, n: int) -> Column:
    """CH/ANSI widthBucket(x, lo, hi, n): equi-width histogram bucket 1..n,
    0 below, n+1 above — Spark's width_bucket is the same ANSI function."""
    return F.width_bucket(_c(x), F.lit(lo), F.lit(hi), F.lit(n))


def countMatches(h, pattern: str) -> Column:
    """CH countMatches(h, pat): number of regexp matches (Spark regexp_count)."""
    return F.regexp_count(_c(h), F.lit(pattern))


def translate(a, from_chars: str, to_chars: str) -> Column:
    """CH translate: per-character substitution (identical Spark builtin)."""
    return F.translate(_c(a), from_chars, to_chars)


def initcap(a) -> Column:
    """CH initcap: first letter of each word upper, rest lower."""
    return F.initcap(_c(a))


def soundexCH(a) -> Column:
    """CH soundex (25.x): classic 4-char American Soundex — Spark builtin."""
    return F.soundex(_c(a))


def byteSwap(a, bits: int = 32) -> Column:
    """CH byteSwap: reverse the byte order of an integer (on the unsigned
    32- or 64-bit domain carried in BIGINT).  Composed from shift + mask +
    bitwise OR — never multiply/add, which would ARITHMETIC_OVERFLOW under
    the session's pinned ANSI mode whenever the low byte lands in the sign
    byte (any input with low byte ≥ 0x80 for bits=64); a swapped 64-bit
    value with its top bit set correctly reinterprets as a negative
    BIGINT."""
    if bits not in (32, 64):
        raise ValueError("byteSwap supports bits in (32, 64)")
    x = _c(a).cast("long")
    if bits == 32:
        x = x.bitwiseAND(F.lit(0xFFFFFFFF))
    nbytes = bits // 8
    out: Column | None = None
    for i in range(nbytes):
        # arithmetic shiftright sign-extends; the & 255 mask lands after it
        byte = F.shiftright(x, 8 * i).bitwiseAND(F.lit(0xFF))
        part = F.shiftleft(byte, 8 * (nbytes - 1 - i))
        out = part if out is None else out.bitwiseOR(part)
    assert out is not None
    return out


def tupleHammingDistance(a, b, fields: tuple[str, ...] = ("c0", "c1")) -> Column:
    """CH tupleHammingDistance: count of positions where two same-arity
    tuples (structs) differ — NULL-safe inequality per field, summed.
    ``fields`` names the struct fields to compare (CH tuples are positional;
    Spark structs are named — callers build both with the same aliases)."""
    sa, sb = _c(a), _c(b)
    out: Column | None = None
    for f in fields:
        term = (~sa.getField(f).eqNullSafe(sb.getField(f))).cast("int")
        out = term if out is None else out + term
    assert out is not None
    return out


def toDaysSinceYearZero(d) -> Column:
    """CH toDaysSinceYearZero: days since 0000-01-01 proleptic Gregorian
    (epoch day + 719528, the documented CH offset)."""
    return (F.datediff(_c(d), F.lit("1970-01-01").cast("date")) + F.lit(719528)).cast(
        "long"
    )


_BASE58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def _b58_encode_bytes(raw: bytes) -> str:
    n = int.from_bytes(raw, "big")
    out = []
    while n:
        n, r = divmod(n, 58)
        out.append(_BASE58_ALPHABET[r])
    pad = 0
    for byte in raw:
        if byte == 0:
            pad += 1
        else:
            break
    return "1" * pad + "".join(reversed(out))


def _b58_decode_str(s: str) -> bytes:
    n = 0
    for ch_ in s:
        n = n * 58 + _BASE58_ALPHABET.index(ch_)
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big") if n else b""
    pad = 0
    for ch_ in s:
        if ch_ == "1":
            pad += 1
        else:
            break
    return b"\x00" * pad + raw


def base58Encode(a) -> Column:
    """CH base58Encode: Bitcoin-alphabet base58 of the utf-8 bytes.  Big-int
    radix conversion is inherently per-string → Arrow-batched pandas UDF
    (never row-at-a-time Python)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _enc(s):
        return s.map(lambda v: None if v is None else _b58_encode_bytes(v.encode()))

    _enc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_enc, "string")(_c(a))


def base58Decode(a) -> Column:
    """CH base58Decode: inverse of base58Encode (utf-8 text out)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _dec(s):
        return s.map(
            lambda v: None if v is None else _b58_decode_str(v).decode("utf-8")
        )

    _dec.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_dec, "string")(_c(a))


def base32Encode(a) -> Column:
    """CH base32Encode (24.x): RFC-4648 base32 of the utf-8 bytes —
    stdlib codec in an Arrow-batched pandas UDF."""
    import base64

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _enc(s):
        return s.map(
            lambda v: None if v is None
            else base64.b32encode(v.encode()).decode("ascii")
        )

    _enc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_enc, "string")(_c(a))


def base32Decode(a) -> Column:
    """CH base32Decode: inverse of base32Encode (utf-8 text out; invalid
    input raises, matching CH — use tryBase32Decode semantics upstream if
    NULL-on-error is wanted)."""
    import base64

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _dec(s):
        return s.map(
            lambda v: None if v is None
            else base64.b32decode(v).decode("utf-8")
        )

    _dec.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_dec, "string")(_c(a))


# --- round-6 batch C: hierarchies, punycode/IDNA, consistent hashing --------


def URLHierarchy(url) -> Column:
    """CH URLHierarchy: the URL truncated at each path separator — e.g.
    https://h/a/b?q → ['https://h/', 'https://h/a/', 'https://h/a/b?q'].
    Intermediate elements keep the trailing '/', the final element is the
    full URL.  Fragment-free URLs (the CH example scope); pure split/slice
    expressions, oracle-replayable."""
    u = _c(url)
    root = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    rest = F.substring(u, F.length(root) + 1, F.lit(1 << 30))
    path = F.split(rest, r"\?", 2)[0]
    parts = F.split(path, "/")  # path starts '/' → parts[0] = ''
    n = F.size(parts)
    prefixes = F.transform(
        F.sequence(F.lit(2), F.greatest(n - 1, F.lit(1))),
        lambda i: F.concat(root, F.array_join(F.slice(parts, 1, i), "/"), F.lit("/")),
    )
    mids = F.when(n >= 3, prefixes).otherwise(F.array().cast("array<string>"))
    full = F.when(
        (F.length(rest) > 0) & ~u.endswith("/"), F.array(u)
    ).otherwise(F.array().cast("array<string>"))
    base = F.when(
        F.length(rest) > 0, F.array(F.concat(root, F.lit("/")))
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(F.concat(base, mids, full))


def URLPathHierarchy(url) -> Column:
    """CH URLPathHierarchy: like URLHierarchy but path-relative and WITHOUT
    the bare '/' element (CH docs example) — https://h/a/b?q →
    ['/a/', '/a/b?q']."""
    u = _c(url)
    root = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    stripped = F.transform(
        URLHierarchy(u), lambda p: F.substring(p, F.length(root) + 1, 1 << 30)
    )
    return F.filter(stripped, lambda p: p != "/")


def punycodeEncode(a) -> Column:
    """CH punycodeEncode (24.1): RFC 3492 punycode of the text — stdlib
    ``punycode`` codec in an Arrow-batched pandas UDF (the bootstring
    algorithm is per-string stateful)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _enc(s):
        return s.map(
            lambda v: None if v is None else v.encode("punycode").decode("ascii")
        )

    _enc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_enc, "string")(_c(a))


def punycodeDecode(a) -> Column:
    """CH punycodeDecode: inverse of punycodeEncode."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _dec(s):
        return s.map(
            lambda v: None if v is None else v.encode("ascii").decode("punycode")
        )

    _dec.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_dec, "string")(_c(a))


def idnaEncode(a) -> Column:
    """CH idnaEncode (24.1): IDNA ASCII-compatible encoding of a hostname
    (xn-- labels), stdlib ``idna`` codec; '' stays '' (the codec rejects
    empty labels, CH returns empty)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _enc(s):
        def one(v):
            if v is None:
                return None
            if not v:
                return ""
            return v.encode("idna").decode("ascii")

        return s.map(one)

    _enc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_enc, "string")(_c(a))


def idnaDecode(a) -> Column:
    """CH idnaDecode: inverse of idnaEncode (unicode hostname out)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _dec(s):
        def one(v):
            if v is None:
                return None
            if not v:
                return ""
            return v.encode("ascii").decode("idna")

        return s.map(one)

    _dec.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_dec, "string")(_c(a))


def jumpConsistentHash(key, num_buckets: int) -> Column:
    """CH jumpConsistentHash: the Lamping-Veach jump consistent hash
    (arXiv:1406.2294 — the public algorithm CH wraps): maps a uint64 key to
    a bucket in [0, num_buckets) such that bucket counts changing by one
    moves only ~1/n of keys.  THE primitive for stable shard assignment at
    100 TB (resharding moves the minimum).  Vectorized numpy kernel: the
    loop iterates at most num_buckets times (j strictly grows), each pass
    one LCG step + one double multiply over the still-active lanes.  The
    uint64 LCG wraparound needs numpy (Spark has no unsigned 64-bit), so
    this is an Arrow-batched pandas UDF; the oracle replays the identical
    iteration in SQL with HUGEINT mod-2^64 arithmetic — IEEE doubles make
    the trajectories bitwise-equal across engines."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    nb = int(num_buckets)

    def _jump(s):
        key_arr = s.to_numpy(dtype=np.int64).view(np.uint64).copy()
        b = np.full(key_arr.shape, -1, dtype=np.int64)
        j = np.zeros(key_arr.shape, dtype=np.int64)
        mult = np.uint64(2862933555777941757)
        one = np.uint64(1)
        active = j < nb
        with np.errstate(over="ignore"):
            while active.any():
                b[active] = j[active]
                key_arr[active] = key_arr[active] * mult + one
                rnd = ((key_arr[active] >> np.uint64(33)) + one).astype(np.float64)
                j[active] = ((b[active] + 1) * (float(1 << 31) / rnd)).astype(
                    np.int64
                )
                active = j < nb
        return pd.Series(b)

    _jump.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_jump, "long")(_c(key).cast("long"))


# --- URL / JSON vocabulary (round 5 batch B) --------------------------------

def netloc(url) -> Column:
    """CH netloc: the authority component (user:pass@host:port) — text
    between scheme:// and the first /?#."""
    return F.regexp_extract(_c(url), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)


def cutFragment(url) -> Column:
    """CH cutFragment: URL with #fragment removed."""
    return F.regexp_replace(_c(url), r"#.*$", "")


def cutWWW(url) -> Column:
    """CH cutWWW: URL with the leading www. of the host removed."""
    return F.regexp_replace(_c(url), r"://www\.", "://")


def queryStringAndFragment(url) -> Column:
    """CH queryStringAndFragment: everything after ? (query + #fragment)."""
    return F.regexp_extract(_c(url), r"\?(.*)$", 1)


#: two-level public suffixes recognized by firstSignificantSubdomain.  CH
#: embeds the full Mozilla public-suffix list; this documented subset covers
#: the common ccTLD second-levels (same deviation class as the hash family).
_TWO_LEVEL_TLDS = ("co.uk", "org.uk", "gov.uk", "ac.uk", "com.cn", "com.au",
                   "co.jp", "com.br", "co.in")


def firstSignificantSubdomain(url) -> Column:
    """CH firstSignificantSubdomain: the registrable label of the host —
    'example' for www.example.co.uk (public-suffix subset documented on
    ``_TWO_LEVEL_TLDS``).  userinfo and :port are stripped from the
    authority first, so 'https://u@www.example.co.uk:8443/x' still yields
    'example'.  Hosts with fewer than two labels (localhost, scheme-less
    input where netloc is empty) yield '' like CH, via try_element_at —
    plain element_at would raise INVALID_ARRAY_INDEX under the session's
    pinned ANSI mode."""
    host = F.regexp_replace(
        F.regexp_replace(netloc(url), r"^[^@]*@", ""), r":\d*$", ""
    )
    parts = F.split(host, r"\.")
    last2 = F.concat_ws(
        ".", F.try_element_at(parts, F.lit(-2)), F.try_element_at(parts, F.lit(-1))
    )
    return F.coalesce(
        F.when(
            last2.isin(*_TWO_LEVEL_TLDS), F.try_element_at(parts, F.lit(-3))
        ).otherwise(F.try_element_at(parts, F.lit(-2))),
        F.lit(""),
    )


def topLevelDomain(url) -> Column:
    """CH topLevelDomain: the last label of the host — 'com' for
    svn.www.example.com; '' when the host has no dot (CH returns '' for
    invalid/dotless hosts, e.g. localhost or an IP-free bare word)."""
    host = F.regexp_replace(
        F.regexp_replace(netloc(url), r"^[^@]*@", ""), r":\d*$", ""
    )
    parts = F.split(host, r"\.")
    return F.coalesce(
        F.when(F.size(parts) >= 2, F.try_element_at(parts, F.lit(-1))),
        F.lit(""),
    )


def cutToFirstSignificantSubdomain(url) -> Column:
    """CH cutToFirstSignificantSubdomain: the host truncated to start at the
    first significant subdomain — 'example.co.uk' for
    https://u@www.example.co.uk:8443/x, 'example.org' for www.example.org
    (same ``_TWO_LEVEL_TLDS`` public-suffix subset as
    firstSignificantSubdomain); '' for hosts with fewer than two labels."""
    host = F.regexp_replace(
        F.regexp_replace(netloc(url), r"^[^@]*@", ""), r":\d*$", ""
    )
    parts = F.split(host, r"\.")
    last2 = F.concat_ws(
        ".", F.try_element_at(parts, F.lit(-2)), F.try_element_at(parts, F.lit(-1))
    )
    keep3 = F.concat_ws(".", F.try_element_at(parts, F.lit(-3)), last2)
    return F.coalesce(
        F.when(
            last2.isin(*_TWO_LEVEL_TLDS),
            F.when(F.size(parts) >= 3, keep3),
        ).otherwise(F.when(F.size(parts) >= 2, last2)),
        F.lit(""),
    )


def encodeURLComponent(a) -> Column:
    """CH encodeURLComponent analog via Spark url_encode.  Documented
    deviation (SURVEY §7.4 class): Spark uses form-encoding — space → '+',
    not %20 as CH emits; decodeURLComponent inverts it exactly."""
    return F.url_encode(_c(a))


def decodeURLComponent(a) -> Column:
    """Inverse of :func:`encodeURLComponent` (Spark url_decode)."""
    return F.url_decode(_c(a))


def isValidJSON(a) -> Column:
    """CH isValidJSON: whether the string parses as JSON.  Root extraction
    returns NULL on malformed input — and ALSO on the valid scalar root
    'null', which CH counts as valid JSON, so that case is special-cased."""
    s = _c(a)
    return F.get_json_object(s, "$").isNotNull() | (F.trim(s) == "null")


def JSONArrayLength(a) -> Column:
    """CH JSONArrayLength (25.x name; alias jsonArrayLength)."""
    return F.json_array_length(_c(a))


def toJSONString(a) -> Column:
    """CH toJSONString: serialize a struct/array column to compact JSON —
    Spark to_json emits the same key order / no-spaces layout."""
    return F.to_json(_c(a))


def simpleJSONExtractString(j, field: str) -> Column:
    """CH simpleJSONExtractString (visitParam family): fast-path string
    field extraction — get_json_object on a top-level key."""
    return F.get_json_object(_c(j), f"$.{field}")


def mapPopulateSeries(m, default=None) -> Column:
    """CH mapPopulateSeries: fill integer-key gaps from min(key) to max(key)
    with the zero of the map's VALUE type (CH fills with the value type's
    default and preserves it — a map<K,int> stays map<K,int>, no silent
    widening to double).  ``default`` overrides the fill value; pass a typed
    Column to control the result type exactly.  One sequence + one
    transform, all JVM-side.  An empty input map yields an empty map (CH
    behavior), not NULL (array_min/max of an empty key array are NULL and
    would poison the sequence)."""
    mm = _c(m)
    keys = F.map_keys(mm)
    if default is None:
        # zero of the value type: any present value × 0 (CH restricts the
        # function to numeric value types, so the product is well-defined)
        fill = F.try_element_at(F.map_values(mm), F.lit(1)) * F.lit(0)
    elif isinstance(default, Column):
        fill = default
    else:
        fill = F.lit(default)
    seq = F.sequence(F.array_min(keys), F.array_max(keys))
    filled = F.map_from_entries(
        F.transform(
            seq,
            lambda k: F.struct(
                k.alias("k"),
                F.coalesce(F.try_element_at(mm, k), fill).alias("v"),
            ),
        )
    )
    # map_filter(mm, false) is an empty map of the INPUT's type
    return F.when(F.size(keys) == 0, F.map_filter(mm, lambda _k, _v: F.lit(False))).otherwise(filled)


def arrayShingles(arr, n: int) -> Column:
    """CH arrayShingles (24.1): all contiguous windows of length n —
    [1,2,3,4] with n=2 → [[1,2],[2,3],[3,4]].  The sequence upper bound is
    clamped to ≥1 (Spark sequence(1,0) would run DESCENDING) and short
    tails are filtered by length, same guard as the ngrams rule."""
    a = _c(arr)
    idx = F.sequence(F.lit(1), F.greatest(F.size(a) - (n - 1), F.lit(1)))
    return F.filter(
        F.transform(idx, lambda i: F.slice(a, i, n)),
        lambda s: F.size(s) == n,
    )


def arrayEnumerateDense(arr) -> Column:
    """CH arrayEnumerateDense: per element, the 1-based index of its first
    occurrence among the distinct values ([10,20,10,30] → [1,2,1,3])."""
    a = _c(arr)
    return F.transform(a, lambda x: F.array_position(F.array_distinct(a), x))


def arrayRotateLeft(arr, n) -> Column:
    """CH arrayRotateLeft (23.8): rotate n positions left —
    [1,2,3,4,5] rot 2 → [3,4,5,1,2].  Negative n rotates right (CH
    semantics).  ``pmod`` normalizes n into [0, size) so any magnitude and
    sign works; empty arrays pass through (pmod by 0 is NULL-guarded)."""
    a = _c(arr)
    nn = _c(n) if isinstance(n, Column) else F.lit(n)
    k = F.pmod(nn, F.size(a))
    rotated = F.concat(
        F.slice(a, k + 1, F.size(a) - k), F.slice(a, F.lit(1), k)
    )
    return F.when(F.size(a) <= 1, a).otherwise(rotated)


def arrayRotateRight(arr, n) -> Column:
    """CH arrayRotateRight (23.8): rotate n positions right — the left
    rotation by -n."""
    nn = _c(n) if isinstance(n, Column) else F.lit(n)
    return arrayRotateLeft(arr, -nn)


def arrayShiftLeft(arr, n, fill) -> Column:
    """CH arrayShiftLeft (23.8): drop the first n elements and pad the tail
    with ``fill`` — [1,2,3,4,5] shift 2 fill 0 → [3,4,5,0,0].  Negative n
    shifts right (CH semantics).  The fill literal must be compatible with
    the element type (CH requires the same; Spark's concat enforces it)."""
    a = _c(arr)
    nn = _c(n) if isinstance(n, Column) else F.lit(n)
    fl = _c(fill) if isinstance(fill, Column) else F.lit(fill)
    k = F.least(F.abs(nn), F.size(a))
    pad = F.array_repeat(fl, k.cast("int"))
    left = F.concat(F.slice(a, k + 1, F.size(a) - k), pad)
    right = F.concat(pad, F.slice(a, F.lit(1), F.size(a) - k))
    return F.when(F.size(a) == 0, a).otherwise(
        F.when(nn >= 0, left).otherwise(right)
    )


def arrayShiftRight(arr, n, fill) -> Column:
    """CH arrayShiftRight (23.8): the left shift by -n."""
    nn = _c(n) if isinstance(n, Column) else F.lit(n)
    return arrayShiftLeft(arr, -nn, fill)


def parseDateTimeBestEffort(a) -> Column:
    """CH parseDateTimeBestEffort: tolerant multi-format timestamp parsing —
    tries ISO (native cast), slash/compact/European layouts, bare date, and
    unix-epoch digit strings, first hit wins; NULL when nothing matches
    (the CH *OrNull variant's contract — the throwing variant's error
    channel doesn't compose with columnar evaluation)."""
    s = F.trim(_c(a))
    return F.coalesce(
        F.try_to_timestamp(s),
        F.try_to_timestamp(s, F.lit("yyyy/MM/dd HH:mm:ss")),
        F.try_to_timestamp(s, F.lit("dd/MM/yyyy HH:mm:ss")),
        F.try_to_timestamp(s, F.lit("dd.MM.yyyy HH:mm:ss")),
        F.try_to_timestamp(s, F.lit("yyyyMMddHHmmss")),
        F.try_to_timestamp(s, F.lit("dd MMM yyyy HH:mm:ss")),
        F.try_to_timestamp(s, F.lit("yyyy/MM/dd")),
        F.try_to_timestamp(s, F.lit("dd.MM.yyyy")),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd")),
        # unix epoch seconds (CH treats 9-10 digit integers as epoch)
        F.when(
            s.rlike(r"^\d{9,10}$"),
            F.timestamp_seconds(s.cast("long")),
        ),
    )


# --- vocabulary batch 7 (round 6) -------------------------------------------

def YYYYMMDDToDate(n) -> Column:
    """CH YYYYMMDDToDate(20240131) → Date.  Deviation: invalid encodings
    (e.g. 20240230) yield NULL rather than CH's zero-date — the ANSI/NULL
    channel this engine uses everywhere."""
    return F.try_to_date(_c(n).cast("bigint").cast("string"), "yyyyMMdd")


def YYYYMMDDhhmmssToDateTime(n) -> Column:
    """CH YYYYMMDDhhmmssToDateTime(20240131235959) → DateTime (NULL on
    invalid, same deviation as YYYYMMDDToDate)."""
    return F.try_to_timestamp(
        _c(n).cast("bigint").cast("string"), F.lit("yyyyMMddHHmmss")
    )


#: parseTimeDelta unit → seconds (CH constants: year = 365.25 d, month = 30 d)
_TIMEDELTA_UNITS: list[tuple[tuple[str, ...], float]] = [
    (("years", "year", "yr", "y"), 31557600.0),
    (("months", "month", "mo"), 2592000.0),
    (("weeks", "week", "w"), 604800.0),
    (("days", "day", "d"), 86400.0),
    (("hours", "hour", "hr", "h"), 3600.0),
    (("minutes", "minute", "mins", "min", "m"), 60.0),
    (("seconds", "second", "secs", "sec", "s"), 1.0),
    (("milliseconds", "millisecond", "ms"), 0.001),
    (("microseconds", "microsecond", "us"), 1e-6),
    (("nanoseconds", "nanosecond", "ns"), 1e-9),
]


def parseTimeDelta(a) -> Column:
    """CH parseTimeDelta('1 day 2 hours') → Float64 seconds.  Scans every
    number+unit pair (separators ignored, per CH), maps units with CH's own
    constants (year = 365.25 d, month = 30 d — the docs' 1yr2mo = 36741600
    example), and sums — all JVM expressions (regexp_extract_all +
    aggregate).  Deviation: an unknown unit makes the result NULL rather
    than throwing (columnar error channel)."""
    matches = F.regexp_extract_all(
        _c(a), F.lit(r"([0-9]+(?:\.[0-9]+)?)\s*([a-zA-Z]+)"), F.lit(0)
    )

    def to_secs(m: Column) -> Column:
        num = F.regexp_extract(m, r"([0-9]+(?:\.[0-9]+)?)", 1).cast("double")
        unit = F.lower(F.regexp_extract(m, r"([a-zA-Z]+)\s*$", 1))
        factor = None
        for names, secs in _TIMEDELTA_UNITS:
            cond = unit.isin(*names)
            factor = (
                F.when(cond, F.lit(secs))
                if factor is None
                else factor.when(cond, F.lit(secs))
            )
        return num * factor  # no otherwise → unknown unit = NULL, poisons sum

    return F.aggregate(matches, F.lit(0.0), lambda acc, m: acc + to_secs(m))


def bitTest(n, pos: int) -> Column:
    """CH bitTest(n, pos) → the bit value (0/1, int)."""
    return F.shiftright(_c(n), pos).bitwiseAND(F.lit(1))


def bitTestAll(n, *positions: int) -> Column:
    """CH bitTestAll: true iff every listed bit is set (CH returns UInt8;
    boolean here, same 0/1 value space)."""
    out: Column | None = None
    for p in positions:
        t = bitTest(n, p) == F.lit(1)
        out = t if out is None else (out & t)
    return out if out is not None else F.lit(True)


def bitTestAny(n, *positions: int) -> Column:
    """CH bitTestAny: true iff at least one listed bit is set."""
    out: Column | None = None
    for p in positions:
        t = bitTest(n, p) == F.lit(1)
        out = t if out is None else (out | t)
    return out if out is not None else F.lit(False)


def tupleNames(t) -> Column:
    """CH tupleNames(tuple) → Array(String) of element names.  Lowered via
    to_json → json_object_keys — stays JVM-side; named-tuple (struct) fields
    round-trip their names through the JSON object form."""
    return F.json_object_keys(F.to_json(_c(t)))


def greatCircleAngle(lon1, lat1, lon2, lat2) -> Column:
    """CH greatCircleAngle → central angle in degrees (functions/geo)."""
    from clickhouseocp_spark.functions.geo import great_circle_angle

    return great_circle_angle(_c(lon1), _c(lat1), _c(lon2), _c(lat2))


def pointInEllipses(x, y, ellipses) -> Column:
    """CH pointInEllipses(x, y, x0, y0, a, b, ...) — constant ellipse list
    (functions/geo, unrolled codegen OR of quadratic tests)."""
    from clickhouseocp_spark.functions.geo import point_in_ellipses

    return point_in_ellipses(_c(x), _c(y), ellipses)


def geohashesInBox(lon_min, lat_min, lon_max, lat_max, precision: int = 4) -> Column:
    """CH geohashesInBox → array of geohash cells intersecting the box
    (functions/geo pandas kernel, 100k-cell guard mirroring CH's 10M cap)."""
    from clickhouseocp_spark.functions.geo import geohashes_in_box

    return geohashes_in_box(lon_min, lat_min, lon_max, lat_max, precision)


# --- vocabulary batch 8 (round 6, continued) ---------------------------------

def isNaN(a) -> Column:
    """CH isNaN → UInt8; boolean here (same 0/1 value space)."""
    return F.isnan(_c(a).cast("double"))


def ifNotFinite(x, y) -> Column:
    """CH ifNotFinite(x, y): y when x is NaN/±Inf, else x."""
    cx = _c(x).cast("double")
    finite = ~(F.isnan(cx) | (F.abs(cx) == F.lit(float("inf"))))
    return F.when(finite, cx).otherwise(_c(y).cast("double"))


def emptyArrayToSingle(a) -> Column:
    """CH emptyArrayToSingle: [] → [default]; the default here is typed from
    the array's element (0 for numerics via a NULL-safe coalesce of the
    first element's zero) — documented: supply numeric arrays."""
    c = _c(a)
    return F.when(F.size(c) == 0, F.array(F.lit(0.0))).otherwise(
        F.transform(c, lambda x: x.cast("double"))
    )


def hasSubstr(a, b) -> Column:
    """CH hasSubstr(a, b): true iff array b appears in a as a CONTIGUOUS
    subsequence (unlike hasAll's set test).  Codegen exists-over-offsets +
    slice equality; empty b is a substring of anything (CH rule)."""
    ca, cb = _c(a), _c(b)
    found = F.exists(
        F.sequence(F.lit(1), F.size(ca) - F.size(cb) + 1),
        lambda i: F.slice(ca, i, F.size(cb)) == cb,
    )
    # CASE evaluates lazily, so the exists/sequence never sees a needle
    # longer than the haystack (sequence(1, n<1) would run DESCENDING)
    return (
        F.when(F.size(cb) == 0, F.lit(True))
        .when(F.size(cb) > F.size(ca), F.lit(False))
        .otherwise(F.coalesce(found, F.lit(False)))
    )


def arraySplit(cond_arr, arr) -> Column:
    """CH arraySplit(lambda, arr) with the lambda pre-evaluated to a boolean
    array (this engine's columnar calling convention): split ``arr`` into
    groups, starting a NEW group at every position where the flag is true.
    One aggregate fold building array<array<T>>; CH's rule that a leading
    true produces no empty head group is preserved."""
    c, f = _c(arr), _c(cond_arr)
    pairs = F.zip_with(c, f, lambda x, flag: F.struct(x.alias("x"),
                                                      flag.alias("f")))
    init = F.struct(
        F.array().cast("array<array<double>>").alias("groups"),
        F.array().cast("array<double>").alias("cur"),
        F.lit(True).alias("first"),
    )

    def step(acc, p):
        start = p["f"] & ~acc["first"]
        return F.struct(
            F.when(start, F.concat(acc["groups"], F.array(acc["cur"])))
            .otherwise(acc["groups"]).alias("groups"),
            F.when(start, F.array(p["x"].cast("double")))
            .otherwise(F.concat(acc["cur"],
                                F.array(p["x"].cast("double")))).alias("cur"),
            F.lit(False).alias("first"),
        )

    return F.aggregate(
        pairs, init, step,
        lambda acc: F.when(F.size(acc["cur"]) > 0,
                           F.concat(acc["groups"], F.array(acc["cur"])))
        .otherwise(acc["groups"]),
    )


def bitRotateLeft(n, k: int) -> Column:
    """CH bitRotateLeft on the 64-bit pattern: (n << k) | (n >>> (64-k)) —
    pure bitwise ops, ANSI-safe."""
    c = _c(n)
    k = int(k) % 64
    if k == 0:
        return c
    return F.shiftleft(c, k).bitwiseOR(F.shiftrightunsigned(c, 64 - k))


def bitHammingDistance(a, b) -> Column:
    """CH bitHammingDistance: popcount of XOR."""
    return F.bit_count(_c(a).bitwiseXOR(_c(b)))


def tupleNegate(t, fields: "tuple[str, ...]") -> Column:
    """CH tupleNegate — field-wise negation; the field list is explicit
    (this engine's struct calling convention, documented)."""
    c = _c(t)
    return F.struct(*[(-c[f]).alias(f) for f in fields])


def tupleMultiply(t1, t2, fields: "tuple[str, ...]") -> Column:
    """CH tupleMultiply — field-wise product of two same-shape tuples."""
    c1, c2 = _c(t1), _c(t2)
    return F.struct(*[(c1[f] * c2[f]).alias(f) for f in fields])


def CRC32(a) -> Column:
    """CH CRC32 → UInt32.  Spark's crc32 IS the same CRC-32/ISO-HDLC (zlib)
    polynomial, so this is a zero-cost alias with true cross-implementation
    parity (pytest cross-checks stdlib zlib.crc32; the registry oracle pins
    the published check value crc32('123456789') = 0xCBF43926)."""
    return F.crc32(_c(a).cast("binary"))


def mortonEncode(x, y) -> Column:
    """CH mortonEncode(x, y) (24.x): interleave the low 32 bits of two
    unsigned coordinates (x → even bit positions, y → odd), the Z-order
    curve key.  Unrolls to 64 constant shift/mask terms — whole-stage
    codegen, no UDF."""
    cx, cy = _c(x), _c(y)
    out: Column | None = None
    for i in range(32):
        bx = F.shiftleft(F.shiftright(cx, i).bitwiseAND(F.lit(1)), 2 * i)
        by = F.shiftleft(F.shiftright(cy, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        term = bx.bitwiseOR(by)
        out = term if out is None else out.bitwiseOR(term)
    return out


def mortonDecode(code) -> Column:
    """Inverse of :func:`mortonEncode`: struct(x, y) from a Z-order key."""
    c = _c(code)
    x: Column | None = None
    y: Column | None = None
    for i in range(32):
        bx = F.shiftleft(F.shiftright(c, 2 * i).bitwiseAND(F.lit(1)), i)
        by = F.shiftleft(F.shiftright(c, 2 * i + 1).bitwiseAND(F.lit(1)), i)
        x = bx if x is None else x.bitwiseOR(bx)
        y = by if y is None else y.bitwiseOR(by)
    return F.struct(x.alias("x"), y.alias("y"))


def base32Encode(a) -> Column:
    """CH base32Encode (RFC 4648, padded) — stdlib codec in an Arrow batch
    (base32's 5-bit cross-byte groups don't decompose into per-char JVM
    expressions the way base58's big-integer form did)."""
    import base64 as _b64

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _enc(s):
        return s.map(
            lambda v: None if v is None
            else _b64.b32encode(
                v if isinstance(v, (bytes, bytearray)) else str(v).encode()
            ).decode("ascii")
        )

    _enc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_enc, "string")(_c(a))


def base32Decode(a) -> Column:
    """Inverse of :func:`base32Encode` (NULL on invalid input — the
    tryBase32Decode contract; the throwing variant's error channel doesn't
    compose with columnar evaluation)."""
    import base64 as _b64

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _dec(s):
        out = []
        for v in s:
            if v is None:
                out.append(None)
                continue
            try:
                out.append(_b64.b32decode(str(v)).decode("utf-8"))
            except Exception:  # noqa: BLE001 — invalid encoding → NULL
                out.append(None)
        return pd.Series(out)

    _dec.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_dec, "string")(_c(a))


def arrayJaccardIndex(a, b) -> Column:
    """CH arrayJaccardIndex (23.7): |a ∩ b| / |a ∪ b| on distinct elements,
    Float64.  0/0 (both empty) yields NaN like CH — expressed as a guarded
    division so ANSI mode stays clean."""
    ca, cb = _c(a), _c(b)
    inter = F.size(F.array_intersect(ca, cb)).cast("double")
    union = F.size(F.array_union(ca, cb)).cast("double")
    return F.when(union == 0, F.lit(float("nan"))).otherwise(inter / union)


def L1Norm(a) -> Column:
    """CH L1Norm (functions/vector.l1_norm)."""
    from clickhouseocp_spark.functions.vector import l1_norm

    return l1_norm(_c(a))


def L2Norm(a) -> Column:
    """CH L2Norm (functions/vector.l2_norm)."""
    from clickhouseocp_spark.functions.vector import l2_norm

    return l2_norm(_c(a))


def LinfNorm(a) -> Column:
    """CH LinfNorm (functions/vector.linf_norm)."""
    from clickhouseocp_spark.functions.vector import linf_norm

    return linf_norm(_c(a))


def LpNorm(a, p: float) -> Column:
    """CH LpNorm (functions/vector.lp_norm)."""
    from clickhouseocp_spark.functions.vector import lp_norm

    return lp_norm(_c(a), p)


def LpDistance(a, b, p: float) -> Column:
    """CH LpDistance (functions/vector.lp_distance)."""
    from clickhouseocp_spark.functions.vector import lp_distance

    return lp_distance(_c(a), _c(b), p)


def normalizeL2(a) -> Column:
    """CH normalizeL2 (functions/vector.normalize_l2)."""
    from clickhouseocp_spark.functions.vector import normalize_l2

    return normalize_l2(_c(a))


#: alias → note, for the parity inventory (names that clash with Python
#: keywords/builtins carry a trailing underscore).
MAPPING: dict[str, str] = {
    name: (fn.__doc__ or "direct Spark equivalent").splitlines()[0]
    for name, fn in list(globals().items())
    if callable(fn) and not name.startswith("_") and fn.__module__ == __name__
}
