"""numericIndexedVector family (ClickHouse 25.7 — the release the reference
pins ships this as its headline experimental aggregate; /root/reference
Dockerfile:102-104).

CH stores the vector as a bit-sliced index; the Spark-native representation
is a ``map<long,double>`` column — same sparse semantics (absent index ==
zero), with every operation a built-in map/higher-order expression, fully
JVM-side:

- build: per-index SUM then ``map_from_entries`` over key-sorted entries
  (sorted so downstream folds are order-deterministic across engines)
- pointwiseAdd / pointwiseSubtract: union of indexes (``map_zip_with`` with
  zero-coalesced operands)
- pointwiseMultiply: intersection of indexes (zero results dropped — CH's
  sparse zero==absent convention)
- getValue / cardinality / allValueSum / a stable readable rendering

All value folds run over key-sorted entries, so doubles accumulate in the
same order the SQL oracle folds them — bitwise-reproducible before any
rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def build_entries(idx: Column, val: Column) -> Column:
    """Key-sorted map from (index, value) struct-array aggregation output:
    ``build_entries(F.collect_list(F.struct(idx, val)))`` — callers
    pre-aggregate duplicate indexes (SUM per index, the documented
    duplicate policy)."""
    return F.map_from_entries(F.array_sort(F.collect_list(F.struct(idx.alias("k"), val.alias("v")))))


def _key_sorted(m: Column) -> Column:
    """Re-sort a map's entries by key.  map_zip_with appends b-only keys
    AFTER a's keys, which would break the module's key-ordered-fold
    contract (all_value_sum / to_readable must traverse ascending keys to
    match the SQL oracle's ORDER BY k fold bitwise)."""
    return F.map_from_entries(F.array_sort(F.map_entries(m)))


def pointwise_add(a: Column, b: Column) -> Column:
    """numericIndexedVectorPointwiseAdd: union of indexes, missing = 0."""
    return _key_sorted(
        F.map_zip_with(
            a, b, lambda _k, x, y: F.coalesce(x, F.lit(0.0)) + F.coalesce(y, F.lit(0.0))
        )
    )


def pointwise_subtract(a: Column, b: Column) -> Column:
    """numericIndexedVectorPointwiseSubtract: union of indexes, missing = 0."""
    return _key_sorted(
        F.map_zip_with(
            a, b, lambda _k, x, y: F.coalesce(x, F.lit(0.0)) - F.coalesce(y, F.lit(0.0))
        )
    )


def pointwise_multiply(a: Column, b: Column) -> Column:
    """numericIndexedVectorPointwiseMultiply: intersection of indexes (a
    zero product == absent, CH's sparse convention)."""
    prod = F.map_zip_with(
        a, b, lambda _k, x, y: F.coalesce(x, F.lit(0.0)) * F.coalesce(y, F.lit(0.0))
    )
    return _key_sorted(F.map_filter(prod, lambda _k, v: v != 0.0))


def get_value(m: Column, key) -> Column:
    """numericIndexedVectorGetValue: value at index, 0 when absent."""
    return F.coalesce(F.element_at(m, F.lit(key)), F.lit(0.0))


def cardinality(m: Column) -> Column:
    """numericIndexedVectorCardinality: number of stored indexes."""
    return F.size(m)


def all_value_sum(m: Column) -> Column:
    """numericIndexedVectorAllValueSum: fold of the values in key order
    (the map is key-sorted by construction → deterministic double sum)."""
    return F.aggregate(
        F.map_values(m), F.lit(0.0), lambda acc, x: acc + x
    )


def to_readable(m: Column) -> Column:
    """Stable 'k:v,k:v' rendering (keys ascending, values as DECIMAL(18,2)
    strings so both engines print identical trailing zeros) — the
    numericIndexedVectorToMap / ShortDebugString analog."""
    return F.array_join(
        F.transform(
            F.map_entries(m),
            lambda e: F.concat(
                e.key.cast("string"),
                F.lit(":"),
                F.round(e.value, 2).cast("decimal(18,2)").cast("string"),
            ),
        ),
        ",",
    )
