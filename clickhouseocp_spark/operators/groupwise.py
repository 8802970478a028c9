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


def paste_join(
    left: DataFrame,
    right: DataFrame,
    left_order: Sequence[Column | str],
    right_order: Sequence[Column | str],
) -> DataFrame:
    """ClickHouse ``PASTE JOIN`` (positional zip).  CH zips by physical row
    position; a distributed engine has no stable physical order, so we require
    explicit total orders and zip by rank — same result, deterministic.
    Scale note: two global sorts; suitable for bounded inputs."""
    wl = Window.orderBy(*left_order)
    wr = Window.orderBy(*right_order)
    l2 = left.withColumn("__rn", F.row_number().over(wl))
    r2 = right.withColumn("__rn", F.row_number().over(wr))
    return l2.join(r2, "__rn", "inner").drop("__rn")


def summing_merge(
    df: DataFrame, keys: Sequence[str], sums: Sequence[Column]
) -> DataFrame:
    """SummingMergeTree read-time fold (SURVEY §2.1): rows with equal key
    collapse to one row of sums."""
    return df.groupBy(*keys).agg(*sums)
