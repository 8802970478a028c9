"""Shared determinism helpers for oracle-checked queries.

IEEE-754 per-row arithmetic is bitwise-identical across engines; *reductions*
over doubles are order-dependent (Spark sums per-partition, DuckDB streams).
``fsum``/``favg`` route sums through DECIMAL (exact, associative) and convert
the final value back to double — same result on any engine, any parallelism,
any row order.  This is also the 100 TB-safe pattern: decimal partial
aggregates merge exactly regardless of partition count.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: decimal(38, S) holds |x| < 10^(38-S).  Scale 6 covers the exact decimal
#: width of products of 2-decimal fixture values (price*disc*tax), so both
#: engines round identically despite Spark casting via shortest-string repr
DEC = "decimal(38,6)"


def fsum(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent SUM of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double").alias(alias)


def favg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(38,{scale})")).cast("double") / F.count(c)
    ).alias(alias)


def sql_fsum(expr: str, alias: str, scale: int = 6) -> str:
    """Oracle-side (DuckDB) rendering of :func:`fsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,{scale}))) AS DOUBLE) AS {alias}"


def sql_favg(expr: str, alias: str, scale: int = 6) -> str:
    """Oracle-side (DuckDB) rendering of :func:`favg`."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def r6(col: Column, alias: str) -> Column:
    """round(x, 6): tolerance wrapper for libm-backed scalars / normalized
    statistics whose low bits may differ across engines."""
    return F.round(col, 6).alias(alias)


def fan_out(df, min_parts: int | None = None):
    """Repartition ONLY when the source has fewer partitions than the
    session's parallelism — the guard that makes heavy per-row compute
    (n-gram explode, tokenize, sketch kernels) use every core when the
    input is a small single-row-group file (the test-SF situation: Spark
    cannot split a parquet row group, so a tiny file = one task for the
    whole downstream chain).

    At production scale this is a NO-OP by construction: a 100 TB scan has
    orders of magnitude more row groups than cores, so the condition never
    fires and no shuffle is added.  Round-robin partitioning (no keys) keeps
    rows balanced without assuming any distribution.

    The partition count is ESTIMATED from the scan's file sizes with
    Spark's own split formula (`FilePartition.maxSplitBytes`) instead of
    ``df.rdd.getNumPartitions()``, which planned the physical query a
    second time per call (driver-side, every invocation — r15 verdict #8).
    Non-local / non-file sources fall back to the RDD probe."""
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    est = _scan_partition_estimate(df, spark)
    if est is None:  # can't stat cheaply — fall back to planning the RDD
        est = df.rdd.getNumPartitions()
    if est < target:
        return df.repartition(target)
    return df


def _bytes_conf(spark, key: str, default: int) -> int:
    """A size conf in bytes ('128MB', '134217728b', plain digits)."""
    import re

    raw = str(spark.conf.get(key, str(default))).strip().lower()
    m = re.fullmatch(r"(\d+)\s*([kmgt]?)b?", raw)
    if not m:
        return default
    return int(m.group(1)) * 1024 ** {"": 0, "k": 1, "m": 2, "g": 3, "t": 4}[
        m.group(2)
    ]


def _scan_partition_estimate(df, spark) -> int | None:
    """Scan task count per Spark's file-split packing, from local file
    sizes; None when any input is not a stat-able local file."""
    import os
    from urllib.parse import unquote, urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("file", ""):
            return None
        path = unquote(u.path)
        try:
            total += os.path.getsize(path)
        except OSError:
            return None
    max_split = _bytes_conf(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _bytes_conf(spark, "spark.sql.files.openCostInBytes", 4 << 20)
    padded = total + len(files) * open_cost
    core_parallelism = max(spark.sparkContext.defaultParallelism, 1)
    split = min(max_split, max(open_cost, padded / core_parallelism))
    return max(1, -(-padded // int(max(split, 1))))
