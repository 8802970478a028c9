"""Re-mergeable aggregate states — the `-State` / `-Merge` combinator +
AggregateFunction column story (SURVEY.md §2.4 / §7.2, the 'hard part').

ClickHouse materializes partial-aggregate states in AggregatingMergeTree
columns and merges them at read time.  Spark equivalents, per state type:

- count/sum states    → plain columns; merging = SUM (exact, associative —
  see queries/composites.partial_merge_reagg)
- uniq state          → HLL sketch binary columns: ``hll_sketch_agg`` to
  materialize, ``hll_union_agg`` to merge, ``hll_sketch_estimate`` to read
  (Spark 3.5+ Apache DataSketches — same role as CH uniqState/uniqMerge)
- quantile states     → two histogram-state families, both with EXACT,
  associative merges (element-wise count sum), so any partial/final split
  yields identical states — the property AggregatingMergeTree rollups rely
  on, which an actual t-digest (order-dependent centroid merge) lacks:
  * ``quantile_timing_*`` — fixed-width bins over a known [lo, hi), the
    public quantileTiming design (absolute-error bound = bin width);
  * ``quantile_dd_*`` — logarithmic bins over an UNBOUNDED positive range,
    the published DDSketch design (relative-error bound alpha) — the
    quantileTDigest use case.

These functions implement the rollup pattern: fine-grained partials persisted
once, then merged along any coarser dimension WITHOUT rescanning the facts —
the 100 TB point of the whole feature.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def hll_partial(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    lg_k: int = 12,
    extra_aggs: Sequence[F.Column] = (),
) -> DataFrame:
    """uniqState analog: per-key HLL sketch of ``col`` (+ optional exact
    partials) — the writable rollup row."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col).cast("string"), F.lit(lg_k)).alias("uniq_state"),
        *extra_aggs,
    )


def hll_merge(
    partials: DataFrame,
    keys: Sequence[str],
    extra_aggs: Sequence[F.Column] = (),
) -> DataFrame:
    """uniqMerge analog: merge sketches along coarser keys and estimate."""
    merged = partials.groupBy(*keys).agg(
        F.hll_union_agg("uniq_state").alias("uniq_state"), *extra_aggs
    )
    return merged.withColumn(
        "uniq_estimate", F.hll_sketch_estimate("uniq_state")
    )


def _bucket_index(col: F.Column, lo: float, width: float, bins: int) -> F.Column:
    """Clamped fixed-width bucket index — identical integer result on any
    engine when ``lo``/``width`` are exactly-representable doubles."""
    raw = F.floor((col - F.lit(lo)) / F.lit(width)).cast("int")
    return F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw))


def quantile_timing_partial(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    bins: int = 256,
    lo: float = 0.0,
    hi: float = 512.0,
) -> DataFrame:
    """quantileTimingState analog: per-key length-``bins`` count array over
    fixed-width buckets of ``col`` (out-of-range values clamp to edge bins).

    The state column ``qt_state`` is re-mergeable by element-wise sum —
    ``quantile_timing_merge``.  Shuffle profile: one partial+final hash agg
    on (keys, bucket) — map-side combine shrinks the shuffle to at most
    |keys|×bins rows regardless of input size — then one narrow agg to
    assemble the array.
    """
    width = (hi - lo) / bins
    per_bucket = (
        df.select(*keys, _bucket_index(F.col(col), lo, width, bins).alias("_b"))
        .groupBy(*keys, "_b")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    # dense array: missing buckets are zero
    entries = F.map_from_entries(F.array_sort(F.collect_list(F.struct("_b", "_n"))))
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(bins - 1)),
        lambda i: F.coalesce(F.element_at(entries, i), F.lit(0).cast("long")),
    )
    return per_bucket.groupBy(*keys).agg(dense.alias("qt_state"))


def quantile_timing_merge(partials: DataFrame, keys: Sequence[str]) -> DataFrame:
    """quantileTimingMerge analog: element-wise sum of state arrays along
    coarser keys.  Exact and associative — merging day-level states to
    month level equals aggregating the raw rows directly."""
    bins = F.size(F.first("qt_state"))
    folded = F.aggregate(
        F.collect_list("qt_state"),
        F.array_repeat(F.lit(0).cast("long"), bins),
        lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
    )
    return partials.groupBy(*keys).agg(folded.alias("qt_state"))


def quantile_timing_estimate(
    q: float, bins: int = 256, lo: float = 0.0, hi: float = 512.0
) -> F.Column:
    """quantileTiming read: midpoint of the first bucket whose cumulative
    count reaches ``ceil(q * total)`` of the ``qt_state`` column.  Error is
    bounded by the bucket width — the quantileTiming contract.  An empty
    state (all-zero counts) yields NULL, matching quantileTiming's NaN on
    empty sets rather than reporting the first bucket's midpoint."""
    width = (hi - lo) / bins
    state = F.col("qt_state")
    total = F.aggregate(state, F.lit(0).cast("long"), lambda a, x: a + x)
    target = F.ceil(F.lit(q) * total)
    # fold: (cum, found_idx, pos); found_idx fixes at the first crossing
    found = F.aggregate(
        state,
        F.struct(
            F.lit(0).cast("long").alias("cum"),
            F.lit(-1).alias("idx"),
            F.lit(0).alias("pos"),
        ),
        lambda acc, x: F.struct(
            (acc["cum"] + x).alias("cum"),
            F.when(acc["idx"] >= 0, acc["idx"])
            .when(acc["cum"] + x >= target, acc["pos"])
            .otherwise(F.lit(-1))
            .alias("idx"),
            (acc["pos"] + 1).alias("pos"),
        ),
    )["idx"]
    return F.when(total > 0, F.lit(lo) + (found + F.lit(0.5)) * F.lit(width))


#: Two-sided DDSketch key layout (one int key space, ascending key ==
#: ascending value so the estimate fold walks ranks in order):
#:   negatives  key = -_DD_NEG_OFF - ceil(log_gamma(-x))   (< _DD_ZERO_KEY)
#:   zero       key = _DD_ZERO_KEY = -2^30
#:   positives  key = ceil(log_gamma(x))                    (|key| ≤ ~75k)
#: log_gamma indexes stay within ±~75k for the whole double range at any
#: alpha ≥ 0.001, so the bands can't collide: negative keys live in
#: [-2^30-2^21-75k, -2^30-2^21+75k], all below -2^30, all above INT32_MIN.
_DD_ZERO_KEY = -(2**30)
_DD_NEG_OFF = 2**30 + 2**21


def _dd_gamma(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def quantile_dd_partial(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    alpha: float = 0.01,
) -> DataFrame:
    """quantileTDigestState analog with the published DDSketch design
    (Masson/Rim/Lee, VLDB'19): logarithmic buckets ``ceil(log_gamma(x))``
    with ``gamma = (1+alpha)/(1-alpha)``, giving a RELATIVE-error guarantee
    ``|est|/|true| ∈ [1-alpha, 1+alpha]`` (same sign) over an UNBOUNDED
    range — the adaptive companion to the fixed-width ``quantile_timing_*``
    state (which is exact-width but needs a known [lo, hi)).  TWO-SIDED:
    negative values get mirrored log buckets below the reserved zero key,
    so the single sorted key space walks ranks in true value order.

    State column ``dd_state``: sparse ``map<int, long>`` of bucket → count
    (zeros under the reserved ``_DD_ZERO_KEY``).  Like the
    fixed-bin state the merge (element-wise count sum) is EXACT and
    associative, so any partial/final split yields identical states — unlike
    an actual t-digest, whose centroid merge is order-dependent.  Occupied
    buckets grow with the LOG of the value range (alpha=0.01 →
    ln(10)/ln(gamma) ≈ 115 buckets per decade), so states stay tiny
    regardless of input size.

    Shuffle profile: partial+final hash agg on (keys, bucket) — map-side
    combine caps shuffle rows at |keys|×occupied-buckets — then one narrow
    agg to assemble the map.
    """
    gamma = _dd_gamma(alpha)
    lg = F.lit(math.log(gamma))
    x = F.col(col).cast("double")
    idx = (
        F.when(x > 0, F.ceil(F.log(x) / lg).cast("int"))
        .when(
            x < 0,
            (F.lit(-_DD_NEG_OFF) - F.ceil(F.log(-x) / lg)).cast("int"),
        )
        .otherwise(F.lit(_DD_ZERO_KEY))
        .alias("_b")
    )
    per_bucket = (
        df.where(F.col(col).isNotNull())  # NULLs are skipped, CH aggregate contract
        .select(*keys, idx)
        .groupBy(*keys, "_b")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    state = F.map_from_entries(F.array_sort(F.collect_list(F.struct("_b", "_n"))))
    return per_bucket.groupBy(*keys).agg(state.alias("dd_state"))


def quantile_dd_merge(partials: DataFrame, keys: Sequence[str]) -> DataFrame:
    """quantileTDigestMerge analog: bucket-wise count sum along coarser keys.
    Exact and associative (same property as ``quantile_timing_merge``)."""
    flat = partials.select(
        *keys, F.explode(F.map_entries("dd_state")).alias("e")
    ).select(*keys, F.col("e.key").alias("_b"), F.col("e.value").alias("_n"))
    summed = flat.groupBy(*keys, "_b").agg(F.sum("_n").alias("_n"))
    state = F.map_from_entries(F.array_sort(F.collect_list(F.struct("_b", "_n"))))
    return summed.groupBy(*keys).agg(state.alias("dd_state"))


def quantile_dd_estimate(q: float, alpha: float = 0.01) -> F.Column:
    """DDSketch read: walk buckets in key order until the cumulative count
    reaches ``max(1, ceil(q * total))``; report the bucket's midpoint
    ``±2·gamma^i/(gamma+1)`` (0.0 for the zero bucket; negative band keys
    decode via the mirror offset).  Relative error vs the true order
    statistic's MAGNITUDE is bounded by alpha, sign exact.  Empty state →
    NULL (quantile-on-empty contract)."""
    gamma = _dd_gamma(alpha)
    entries = F.array_sort(F.map_entries(F.col("dd_state")))
    total = F.aggregate(
        entries, F.lit(0).cast("long"), lambda a, e: a + e["value"]
    )
    target = F.greatest(F.lit(1).cast("long"), F.ceil(F.lit(q) * total))
    found = F.aggregate(
        entries,
        F.struct(
            F.lit(0).cast("long").alias("cum"),
            F.lit(None).cast("int").alias("idx"),
        ),
        lambda acc, e: F.struct(
            (acc["cum"] + e["value"]).alias("cum"),
            F.coalesce(
                acc["idx"],
                F.when(acc["cum"] + e["value"] >= target, e["key"]),
            ).alias("idx"),
        ),
    )["idx"]
    mid = F.lit(2.0 / (gamma + 1.0))
    est = (
        F.when(found == _DD_ZERO_KEY, F.lit(0.0))
        .when(
            found < _DD_ZERO_KEY,
            -mid * F.pow(F.lit(gamma), (-(found + F.lit(_DD_NEG_OFF))).cast("double")),
        )
        .otherwise(mid * F.pow(F.lit(gamma), found.cast("double")))
    )
    return F.when(total > 0, est)


def topk_state_partial(
    df: DataFrame,
    keys: Sequence[str],
    item_col: str,
    m: int,
) -> DataFrame:
    """topKState analog: per-key state = the ``m`` highest-count (item, cnt)
    pairs, sorted (cnt desc, item asc).  With ``m`` >= the key's distinct-item
    cardinality the state is lossless and merging is EXACT; smaller ``m``
    gives the space-saving trade-off: a dropped item's merged count is
    underestimated by at most the truncated tail mass (pytest bounds it).

    Shuffle profile: partial+final hash agg on (keys, item), then a window
    top-m (same shuffle key) — state rows crossing the wire are capped at
    |keys|×m.
    """
    from pyspark.sql import Window

    counted = df.groupBy(*keys, item_col).agg(F.count(F.lit(1)).alias("_cnt"))
    w = Window.partitionBy(*keys).orderBy(F.desc("_cnt"), F.asc(item_col))
    top = counted.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= m)
    entry = F.struct(
        (-F.col("_cnt")).alias("neg_cnt"), F.col(item_col).cast("string").alias("item")
    )
    return top.groupBy(*keys).agg(
        F.array_sort(F.collect_list(entry)).alias("topk_state")
    )


def topk_state_merge(partials: DataFrame, keys: Sequence[str], m: int) -> DataFrame:
    """topKMerge analog: element counts sum across states, re-truncate to m."""
    from pyspark.sql import Window

    flat = partials.select(*keys, F.explode("topk_state").alias("e")).select(
        *keys,
        F.col("e.item").alias("_item"),
        (-F.col("e.neg_cnt")).alias("_cnt"),
    )
    summed = flat.groupBy(*keys, "_item").agg(F.sum("_cnt").alias("_cnt"))
    w = Window.partitionBy(*keys).orderBy(F.desc("_cnt"), F.asc("_item"))
    top = summed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= m)
    entry = F.struct((-F.col("_cnt")).alias("neg_cnt"), F.col("_item").alias("item"))
    return top.groupBy(*keys).agg(
        F.array_sort(F.collect_list(entry)).alias("topk_state")
    )


def topk_state_read(k: int) -> F.Column:
    """Read the top-``k`` as a deterministic "item:cnt,..." CSV (cnt desc,
    item asc — the state's sort order)."""
    return F.array_join(
        F.transform(
            F.slice("topk_state", 1, k),
            lambda e: F.concat(e["item"], F.lit(":"), (-e["neg_cnt"]).cast("string")),
        ),
        ",",
    )
