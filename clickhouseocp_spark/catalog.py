"""Fixture catalog: the ten driver tables (TESTDATA.md / FIXTURES.md) as views.

ClickHouse organizes fixed-schema tables into databases with a ``system``
introspection surface (reference Dockerfile:219, Dockefile-ubuntu:52); the Spark
analog is the session catalog + temp views.  ``register_tables`` is the
equivalent of the server's table setup: each parquet file becomes a named view
the SQL entry point can query.
"""

from __future__ import annotations

import functools
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


@functools.lru_cache(maxsize=256)
def _nanos_timestamp_cols(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark has no nanosecond
    timestamp type, so these are read as raw int64 and converted.  Cached per
    path: fixture schemas are immutable for a process lifetime, and the footer
    read is driver-side latency on every query otherwise."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    return tuple(
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    )


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


#: (session id, sf_dir, tables) whose views are already registered — temp
#: views survive for the session, so re-registering is pure driver latency
#: (10 parquet footer reads + schema resolutions per SQL-text query).
_REGISTERED: dict[tuple[str, str, tuple[str, ...]], dict[str, DataFrame]] = {}


def invalidate_cache() -> None:
    """Drop the registration memo — the next ``register_tables`` re-reads the
    parquet fixtures fresh.  Needed after ``ChSparkEngine.execute`` mutations
    (which replace session views in place) when pristine fixtures are wanted
    again, e.g. between tests."""
    _REGISTERED.clear()


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view named after the table.

    Mirrors the DuckDB oracle environment (same view names) so any
    ``spark.sql`` text in queries/*.py reads identically on both engines.
    Idempotent per (session, sf_dir): repeat calls return the cached views —
    the SQL-text entry path calls this once per query, and the setup must not
    dominate the query itself.  A DIFFERENT sf_dir on the same session
    re-registers (last writer wins, same as createOrReplaceTempView).
    """
    # applicationId distinguishes a fresh session that reused a GC'd id().
    sess = f"{id(spark)}:{spark.sparkContext.applicationId}"
    key = (sess, os.path.abspath(sf_dir), tuple(tables))
    # Invalidate stale same-session entries pointing at another sf_dir: their
    # view names were just overwritten.
    cached = _REGISTERED.get(key)
    if cached is not None:
        return cached
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    for k in [k for k in _REGISTERED if k[0] == key[0] and k != key]:
        del _REGISTERED[k]
    _REGISTERED[key] = out
    return out
