"""Sinks + physical layout conventions (SURVEY.md §2.1 sinks, §4 optimizer
work): the MergeTree analog is written-once Parquet with declarative layout.

ClickHouse's MergeTree gets its scan performance from PARTITION BY + the
sparse ORDER BY index over sorted parts (reference Dockerfile:225-230 — the
image's own query_log is `partition_by toYYYYMM(event_date)`).  The Spark
equivalents, all write-time conventions:

- ``PARTITION BY expr``    → directory partitioning (partition pruning)
- ``ORDER BY key``         → ``sortWithinPartitions`` before write → Parquet
  row-group min/max stats give granule-skipping on the sort key
- data-skipping bloom idx  → ``parquet.bloom.filter.enabled#col`` options
- LZ4 part compression     → Parquet compression codec (Dockerfile:232-238)

At 100 TB these conventions ARE the optimizer story: partition pruning and
row-group skipping happen before a single executor core spins up.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_mergetree_style(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    order_by: Sequence[str] = (),
    bloom_cols: Sequence[str] = (),
    compression: str = "snappy",
    mode: str = "overwrite",
) -> None:
    """Write Parquet with MergeTree-equivalent layout: directory partitions,
    sorted row groups on the ORDER BY key, optional bloom filters on join/
    filter keys."""
    out = df
    if order_by:
        out = out.sortWithinPartitions(*order_by)
    writer = out.write.mode(mode)
    for c in bloom_cols:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
    writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_by: Sequence[str],
    num_buckets: int = 16,
    sort_by: Sequence[str] = (),
) -> None:
    """Bucketed+sorted managed table — the co-located-join convention: two
    tables bucketed on the same key join without a shuffle (the Distributed-
    engine sharding analog, SURVEY §2.1)."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table_name)


def write_any(df: DataFrame, path: str, fmt: str, mode: str = "overwrite", **options) -> None:
    """INSERT INTO ... FORMAT <fmt> analog for the supported file formats."""
    writer = df.write.mode(mode)
    if fmt == "csv":
        options = {"header": "true", **options}
    writer.options(**options).format(fmt).save(path)
