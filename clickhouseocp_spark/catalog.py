"""Fixture catalog: the ten driver tables (TESTDATA.md / FIXTURES.md) as views.

ClickHouse organizes fixed-schema tables into databases with a ``system``
introspection surface (reference Dockerfile:219, Dockefile-ubuntu:52); the Spark
analog is the session catalog + temp views.  ``register_tables`` is the
equivalent of the server's table setup: each parquet file becomes a named view
the SQL entry point can query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that are always broadcast-join candidates at any
#: scale factor (nation/region are bounded by geography; supplier/customer/part
#: scale with SF and must NOT be assumed broadcastable at 100 TB).
BOUNDED_DIMS = ("region", "nation")


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark has no nanosecond
    timestamp type, so these are read as raw int64 and converted."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Plain columnar parquet scan — Catalyst handles
    column pruning + predicate pushdown from here.

    TIMESTAMP(NANOS) columns (unsupported by Spark's reader) are read as int64
    via ``spark.sql.legacy.parquet.nanosAsLong`` and floor-divided to
    microseconds — the same truncation DuckDB applies, so oracle comparisons
    stay exact.  The conf is runtime-settable, so this works on any session the
    driver hands us.
    """
    # Defensive runtime confs: the driver may hand us a vanilla session.
    # Both are runtime-settable; UTC matches the reference pin
    # (Dockerfile:220) and the DuckDB oracle's naive timestamps.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos = _nanos_timestamp_cols(path)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos:
        df = df.withColumn(c, F.expr(f"timestamp_micros(div(`{c}`, 1000))"))
    return df


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view named after the table.

    Mirrors the DuckDB oracle environment (same view names) so any
    ``spark.sql`` text in queries/*.py reads identically on both engines.
    """
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
