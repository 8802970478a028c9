"""Group-wise row selectors: LIMIT BY, topK, ANY join, ReplacingMergeTree-style
dedup, PASTE JOIN (SURVEY.md §2.3/§2.4/§2.6 composite rows).

All are window-rank compositions: one shuffle on the grouping keys, rank
filter, no Python.  At 100 TB the shuffle key choice is the whole cost model —
callers pick keys that match the downstream partitioning where possible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def limit_by(
    df: DataFrame, n: int, keys: Sequence[str], order: Sequence[Column | str]
) -> DataFrame:
    """ClickHouse ``LIMIT n BY keys``: first n rows per key group under
    ``order`` (make the order total for deterministic output)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def top_k(
    df: DataFrame,
    k: int,
    by: str | Sequence[str],
    weight: Column | None = None,
) -> DataFrame:
    """ClickHouse ``topK(k)`` / ``topKWeighted`` heavy hitters, exact:
    groupBy + count (or weight sum) + ordered limit with key tiebreak.
    Exact-via-aggregate is the right call even at scale: the groupBy is a
    partial-agg'd shuffle on the key, and k rows reach the driver."""
    keys = [by] if isinstance(by, str) else list(by)
    meas = (
        F.count(F.lit(1)).alias("cnt")
        if weight is None
        else F.sum(weight).alias("cnt")
    )
    return (
        df.groupBy(*keys)
        .agg(meas)
        .orderBy(F.col("cnt").desc(), *[F.col(c).asc() for c in keys])
        .limit(k)
    )


def any_left_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    order: Sequence[Column | str],
) -> DataFrame:
    """ClickHouse ``ANY LEFT JOIN``: at most one right row per key.  CH takes
    an arbitrary first match; we require an explicit ``order`` so the choice
    is deterministic (SURVEY §7 'deviations we do not copy')."""
    keys = list(on)
    w = Window.partitionBy(*keys).orderBy(*order)
    r1 = (
        right.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return left.join(r1, keys, "left")


def dedup_latest(
    df: DataFrame, keys: Sequence[str], version: Sequence[Column | str]
) -> DataFrame:
    """ReplacingMergeTree read-time semantics (SURVEY §2.1): keep the row with
    the greatest ``version`` per key.  Pass descending Columns for the
    version order; append a unique tiebreak for determinism."""
    w = Window.partitionBy(*keys).orderBy(*version)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _global_rank(df: DataFrame, order: Sequence[Column | str]) -> DataFrame:
    """Attach a dense 1-based global rank ``__rn`` under ``order`` without a
    single-partition window: range-partition on the order key, rank locally
    per partition, then add cumulative partition offsets (zipWithIndex's
    two-pass scheme expressed in DataFrames).  The only global window runs
    over one row per partition — bounded by the shuffle parallelism, never by
    the data."""
    parted = df.repartitionByRange(*order).withColumn("__pid", F.spark_partition_id())
    local = parted.withColumn(
        "__pos", F.row_number().over(Window.partitionBy("__pid").orderBy(*order))
    )
    counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    prior = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__n").over(prior), F.lit(0)).alias("__off")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn("__rn", F.col("__off") + F.col("__pos"))
        .drop("__pid", "__pos", "__off")
    )


def paste_join(
    left: DataFrame,
    right: DataFrame,
    left_order: Sequence[Column | str],
    right_order: Sequence[Column | str],
) -> DataFrame:
    """ClickHouse ``PASTE JOIN`` (positional zip).  CH zips by physical row
    position; a distributed engine has no stable physical order, so we require
    explicit total orders and zip by rank — same result, deterministic.
    Scale note: ranks come from range-partitioned local sorts + per-partition
    offsets (``_global_rank``), so neither input funnels through a single
    reducer; the zip itself is one equi-join on ``__rn``."""
    l2 = _global_rank(left, left_order)
    r2 = _global_rank(right, right_order)
    return l2.join(r2, "__rn", "inner").drop("__rn")


def summing_merge(
    df: DataFrame, keys: Sequence[str], sums: Sequence[Column]
) -> DataFrame:
    """SummingMergeTree read-time fold (SURVEY §2.1): rows with equal key
    collapse to one row of sums."""
    return df.groupBy(*keys).agg(*sums)


def graphite_rollup(
    df: DataFrame,
    retentions: Sequence[tuple[int, int]],
    now: str,
    path_col: str = "path",
    ts_col: str = "ts",
    value_col: str = "value",
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """GraphiteMergeTree-style age-tiered rollup (SURVEY §2.1 MergeTree
    family): rows older than a tier's ``min_age`` collapse into coarser time
    buckets — ``retentions`` is [(min_age_sec, precision_sec), ...] ascending
    by age; a row takes the precision of the last tier it has aged past.

    ``now`` is an explicit timestamp literal (determinism: never wall-clock).
    Default aggregates are the re-mergeable pair (decimal-exact value_sum,
    n) — partial states merge exactly at any parallelism, the
    AggregatingMergeTree discipline.  One shuffle on (path, bucket).
    Integer-second semantics: ts truncates to the second before bucketing, so
    tier and bucket edges are engine-independent.
    """
    now_sec = F.unix_timestamp(F.lit(now).cast("timestamp"))
    tsec = F.unix_timestamp(F.col(ts_col))
    age = now_sec - tsec
    tiers = sorted(retentions)
    prec = F.lit(tiers[0][1])
    for min_age, p in tiers[1:]:
        prec = F.when(age >= min_age, F.lit(p)).otherwise(prec)
    bucket = F.timestamp_seconds(F.floor(tsec / prec).cast("long") * prec)
    if aggs is None:
        aggs = [
            F.sum(F.col(value_col).cast("decimal(38,6)")).cast("double").alias("value_sum"),
            F.count(F.lit(1)).alias("n"),
        ]
    return (
        df.select(
            F.col(path_col).alias("path"),
            bucket.alias("bucket_ts"),
            F.col(value_col).alias(value_col),
        )
        .groupBy("path", "bucket_ts")
        .agg(*aggs)
    )
