"""SparkSession factory mirroring the reference image's engine configuration.

The reference pins UTC (Dockerfile:220), LZ4 part compression (Dockerfile:232-238),
a 10 GB per-query memory envelope (Dockerfile:246) and relies on the engine's
adaptive execution.  The Spark analogs (BASELINE.md "Derived Spark-side bench
configuration"): session timezone UTC, AQE on, Arrow on for the Python boundary,
and shuffle partitioning sized to the local core count.

Scale note (100 TB design rule): on a real cluster these same configs apply, but
``spark.sql.shuffle.partitions`` should be sized to ~2-3x total executor cores
(or left to AQE coalescing with a high initial value); nothing in this module
assumes local mode beyond the default master.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "clickhouseocp_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    Env overrides: ``SPARK_GRAFT_CPUS`` sets local parallelism (default 32,
    matching the bench harness), ``SPARK_GRAFT_SHUFFLE_PARTITIONS`` the shuffle
    width.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Match the reference's UTC pin (Dockerfile:220) and the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # Runtime re-planning: join-strategy switches, partition coalescing,
        # skew-join splitting (analog of ClickHouse's join_algorithm fallbacks
        # + memory-bounded operators, Dockerfile:246).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE's coalescing floor (default 1MB) assumes a partition's work
        # scales with its BYTES; post-shuffle stages here that run sorted-
        # collect folds / higher-order aggregates are row-CPU-bound, and the
        # 1MB floor serializes them onto 1-3 tasks at small-per-key data
        # sizes (measured: the keyed scan machine ran 1-partition at sf0.1,
        # 2x slower than at 64KB).  64KB only changes behavior when a
        # shuffle's total bytes are below ~2MB/core — at cluster scale
        # partitions are far above either floor, so this is inert there.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "64KB"),
        )
        # Arrow-vectorized JVM<->Python boundary for pandas_udf / applyInPandas.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Columnar scan hygiene: pushdown + pruning are on by default; pin them
        # so a conf drift can't silently turn scans into full reads.
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # ANSI semantics match the DuckDB oracle (SURVEY.md §2.3: we adopt ANSI
        # NULL semantics, not ClickHouse's default-fill deviation).
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # managed tables (bucketed-join conventions) land in /tmp, not the repo
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/chspark_warehouse"),
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
