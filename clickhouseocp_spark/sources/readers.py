"""Sources (SURVEY.md §2.1): file formats and table functions.

The reference ships format support (Parquet/ORC/Arrow/CSV/JSONEachRow/Avro…
via the engine pin A1, `user_files` staging Dockerfile:215) and ad-hoc table
functions (`file`, `url`, `s3`, `numbers`, `generateRandom`, `mysql`,
`postgresql`, `odbc` — Dockerfile:28 unixODBC).  Spark-native mapping:

- file()/s3()/url() → ``spark.read.<format>(path)`` (any Hadoop-compatible
  URI: s3a://, hdfs://, file:// — identical code path at 100 TB)
- numbers(n)        → ``spark.range`` (:func:`numbers`)
- generateRandom    → ``spark.range`` + deterministic column generators
  (:func:`generate_random`)
- mysql/postgresql/odbc → ``spark.read.jdbc`` (:func:`jdbc_table`) — thin
  wrapper; exercised only when a JDBC URL is reachable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

FORMATS = ("parquet", "orc", "json", "csv", "native")


def read_any(
    spark: SparkSession, path: str, fmt: str, schema=None, **options
) -> DataFrame:
    """file()-style reader for any supported format.  CSV/JSON default to
    header/schema handling that round-trips the fixture tables losslessly.
    ``native`` reads a CH FORMAT Native block file (driver-side decode —
    Native is the interchange surface with clickhouse-local, not a bulk
    scan path; bulk stays on parquet/orc)."""
    if fmt == "native":
        from clickhouseocp_spark.formats import parse_native

        with open(path, "rb") as fh:
            names, types, rows = parse_native(fh.read())
        from clickhouseocp_spark.formats import _rb_ch_to_spark_field

        fields = [_rb_ch_to_spark_field(n, t) for n, t in zip(names, types)]
        from pyspark.sql.types import StructType

        return spark.createDataFrame(rows, StructType(fields))
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options = {"header": "true", **options}
        if schema is None:
            options.setdefault("inferSchema", "true")
    return reader.options(**options).format(fmt).load(path)


def numbers(spark: SparkSession, n: int, start: int = 0) -> DataFrame:
    """ClickHouse numbers(n) table function."""
    return spark.range(start, start + n).withColumnRenamed("id", "number")


def generate_random(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """generateRandom() analog: n rows of typed random columns, fully
    deterministic under the seed and independent of partitioning (per-row
    values derive from the row id via xxhash64, not from RNG state)."""
    df = spark.range(0, n, numPartitions=partitions)
    h1 = F.xxhash64("id", F.lit(seed))
    h2 = F.xxhash64("id", F.lit(seed + 1))
    return df.select(
        F.col("id").alias("row_id"),
        (F.pmod(h1, F.lit(1_000_000)) / 1_000_000.0).alias("rand_double"),
        F.pmod(h2, F.lit(1000)).cast("int").alias("rand_int"),
        F.concat(F.lit("s"), F.pmod(h1, F.lit(100)).cast("string")).alias("rand_str"),
        (F.pmod(h2, F.lit(2)) == 0).alias("rand_bool"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.pmod(h1, F.lit(86_400 * 365))).alias(
            "rand_ts"
        ),
    )


def jdbc_table(
    spark: SparkSession, url: str, table: str, **options
) -> DataFrame:
    """mysql()/postgresql()/odbc() analog via spark.read.jdbc.  Partitioned
    reads (partitionColumn/lowerBound/upperBound/numPartitions in options)
    are the scale path — a single-connection JDBC read does not survive
    100 TB."""
    return spark.read.format("jdbc").option("url", url).option("dbtable", table).options(
        **options
    ).load()
