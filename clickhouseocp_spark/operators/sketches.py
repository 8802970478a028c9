"""Re-mergeable aggregate states — the `-State` / `-Merge` combinator +
AggregateFunction column story (SURVEY.md §2.4 / §7.2, the 'hard part').

ClickHouse materializes partial-aggregate states in AggregatingMergeTree
columns and merges them at read time.  Spark equivalents, per state type:

- count/sum states    → plain columns; merging = SUM (exact, associative —
  see queries/composites.partial_merge_reagg)
- uniq state          → HLL sketch binary columns: ``hll_sketch_agg`` to
  materialize, ``hll_union_agg`` to merge, ``hll_sketch_estimate`` to read
  (Spark 3.5+ Apache DataSketches — same role as CH uniqState/uniqMerge)
- quantile states     → no native re-mergeable sketch; documented gap
  (SURVEY §7.2: expose HLL only)

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
