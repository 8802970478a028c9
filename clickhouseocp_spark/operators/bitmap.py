"""Bitmap aggregates — the groupBitmap / bitmap* function family
(SURVEY.md §2.8 bit-ops row; ClickHouse ships RoaringBitmap-backed
``groupBitmapState``, ``bitmapAnd/Or/Xor/Andnot``, ``bitmapCardinality`` …).

Spark-first translation: a bitmap VALUE is a sorted array of distinct int64s
(``array<long>``), built per group with ``collect_set`` + ``array_sort`` and
manipulated with Catalyst's native set algebra (``array_intersect`` /
``array_union`` / ``array_except`` / ``arrays_overlap`` — all codegen'd,
no UDFs).  Roaring's container compression is a memory-layout detail of the
C++ engine; the *semantics* (an exactly-mergeable distinct-integer set with
fast set ops) carry over 1:1, and Tungsten's UnsafeArrayData is already a
packed off-heap layout.  For cardinality-only uses at 100 TB prefer the HLL
states (operators/sketches.hll_partial) — same merge story, O(1) state.

States merge EXACTLY and associatively (set union), the AggregatingMergeTree
property: any partial split yields the identical final bitmap
(pytest test_bitmap_state_merge_associative).

Shuffle profile: ``bitmap_partial`` is one partial+final hash agg on keys
(collect_set gets map-side partial aggregation); ``bitmap_merge`` one agg on
the coarser keys.  State size is O(true cardinality) — same as Roaring's
worst case; cap cardinality upstream (or use HLL) when keys can be hot.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def bitmap_partial(
    df: DataFrame, keys: Sequence[str], col: str, state_col: str = "bm_state"
) -> DataFrame:
    """groupBitmapState analog: per-key sorted distinct-value array."""
    return df.where(F.col(col).isNotNull()).groupBy(*keys).agg(
        F.array_sort(F.collect_set(F.col(col).cast("long"))).alias(state_col)
    )


def bitmap_merge(
    partials: DataFrame, keys: Sequence[str], state_col: str = "bm_state"
) -> DataFrame:
    """groupBitmapMergeState analog: set-union of states along coarser keys
    (flatten → distinct → sort; exact + associative)."""
    return partials.groupBy(*keys).agg(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list(state_col)))
        ).alias(state_col)
    )


# --- value-level bitmap functions (each maps to one Catalyst expression) ----


def bitmap_cardinality(bm: Column) -> Column:
    return F.size(bm)


def bitmap_and(a: Column, b: Column) -> Column:
    return F.array_sort(F.array_intersect(a, b))


def bitmap_or(a: Column, b: Column) -> Column:
    return F.array_sort(F.array_union(a, b))


def bitmap_andnot(a: Column, b: Column) -> Column:
    return F.array_sort(F.array_except(a, b))


def bitmap_xor(a: Column, b: Column) -> Column:
    return F.array_sort(
        F.array_except(F.array_union(a, b), F.array_intersect(a, b))
    )


def bitmap_has_any(a: Column, b: Column) -> Column:
    return F.arrays_overlap(a, b)


def bitmap_has_all(a: Column, b: Column) -> Column:
    """True iff ``b`` ⊆ ``a`` (CH bitmapHasAll(a, b) argument order)."""
    return F.size(F.array_except(b, a)) == 0


def bitmap_contains(a: Column, value: Column) -> Column:
    return F.array_contains(a, value.cast("long"))


def bitmap_min(bm: Column) -> Column:
    return F.array_min(bm)


def bitmap_max(bm: Column) -> Column:
    return F.array_max(bm)


def bitmap_to_array(bm: Column) -> Column:
    """bitmapToArray: the state IS the sorted array already."""
    return bm
