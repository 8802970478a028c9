"""Re-mergeable aggregate states — the `-State` / `-Merge` combinator +
AggregateFunction column story (SURVEY.md §2.4 / §7.2, the 'hard part').

ClickHouse materializes partial-aggregate states in AggregatingMergeTree
columns and merges them at read time.  Spark equivalents, per state type:

- count/sum states    → plain columns; merging = SUM (exact, associative —
  see queries/composites.partial_merge_reagg)
- uniq state          → HLL sketch binary columns: ``hll_sketch_agg`` to
  materialize, ``hll_union_agg`` to merge, ``hll_sketch_estimate`` to read
  (Spark 3.5+ Apache DataSketches — same role as CH uniqState/uniqMerge)
- quantile states     → fixed-resolution histogram states (the public
  quantileTiming design: bounded bins, exact merge by element-wise sum) —
  ``quantile_timing_partial`` / ``quantile_timing_merge`` /
  ``quantile_timing_estimate`` below.  Unlike t-digest, the merge is
  EXACT and associative, so any partial/final split yields identical
  states — the property AggregatingMergeTree rollups rely on.

These functions implement the rollup pattern: fine-grained partials persisted
once, then merged along any coarser dimension WITHOUT rescanning the facts —
the 100 TB point of the whole feature.
"""

from __future__ import annotations

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
