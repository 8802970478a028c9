"""UDF / UDAF / UDTF surface (SURVEY.md §2.10): SQL lambda UDFs, vectorized
pandas UDFs/UDAFs, Python UDTFs, and the Null-engine sink."""

import math

import pytest
from pyspark.sql import functions as F

from clickhouseocp_spark.catalog import load_table


def test_sql_lambda_udf(spark, sf_dir):
    """CREATE FUNCTION f AS (x) -> expr (CH SQL UDF) → Spark SQL UDF
    (CREATE TEMPORARY FUNCTION ... RETURN expr, Spark 4)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(price DOUBLE, disc DOUBLE) "
        "RETURNS DOUBLE RETURN price * (1 - disc)"
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_udf")
    got = spark.sql(
        "SELECT l_orderkey, disc_price(l_extendedprice, l_discount) AS dp "
        "FROM li_udf LIMIT 5"
    ).collect()
    assert all(r.dp is not None for r in got)
    direct = spark.sql(
        "SELECT sum(CAST(disc_price(l_extendedprice, l_discount) AS DECIMAL(38,6))) AS s FROM li_udf"
    ).collect()[0].s
    expected = spark.sql(
        "SELECT sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS s FROM li_udf"
    ).collect()[0].s
    assert direct == expected


def test_pandas_grouped_agg_udaf(spark, sf_dir):
    """Custom UDAF via GROUPED_AGG pandas_udf (the CH 'executable UDF /
    combinator' gap-filler): geometric mean per group, vectorized."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy()).mean()))

    li = load_table(spark, sf_dir, "lineitem")
    got = {
        r.l_returnflag: r.gm
        for r in li.groupBy("l_returnflag").agg(geo_mean("l_quantity").alias("gm")).collect()
    }
    # independent check: exp(avg(ln)) with Spark built-ins
    ref = {
        r.l_returnflag: r.gm
        for r in li.groupBy("l_returnflag")
        .agg(F.exp(F.avg(F.log("l_quantity"))).alias("gm"))
        .collect()
    }
    for k in ref:
        assert math.isclose(got[k], ref[k], rel_tol=1e-9)


def test_python_udtf(spark):
    """UDTF (CH: fixed table functions + arrayJoin; Spark 3.5+: @udtf)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="x bigint, sq bigint")
    class Squares:
        def eval(self, n: int):
            for i in range(n):
                yield i, i * i

    Squares_ = Squares  # registered use via DataFrame API
    rows = Squares_(F.lit(5)).collect()
    assert [(r.x, r.sq) for r in rows] == [(i, i * i) for i in range(5)]


def test_noop_sink(spark, sf_dir):
    """Null engine (SURVEY §2.1) → write.format('noop'): full execution, no
    output — the benchmarking sink."""
    li = load_table(spark, sf_dir, "lineitem")
    li.write.mode("overwrite").format("noop").save()


def test_avro_availability_gate(spark, sf_dir):
    """Avro is an external Spark module; read/write must either work or fail
    with the documented gate (SURVEY §2.1 formats row)."""
    import tempfile

    df = load_table(spark, sf_dir, "region")
    try:
        with tempfile.TemporaryDirectory() as d:
            df.write.format("avro").mode("overwrite").save(d + "/r")
            back = spark.read.format("avro").load(d + "/r")
            assert back.count() == df.count()
    except Exception as e:  # noqa: BLE001
        assert "AVRO" in str(e).upper() or "avro" in str(e), e
        pytest.skip("spark-avro module not bundled in this container (documented gap)")


def test_kafka_availability_gate(spark):
    """Kafka engine analog (SURVEY §2.1/§2.9): when the spark-sql-kafka jars
    are present the source must build a streaming DataFrame with the CH
    virtual-column surface; when absent, kafka_events_stream raises the
    documented gate error (mirrors the Avro gate)."""
    from clickhouseocp_spark.streaming.pipeline import kafka_available, kafka_events_stream

    if not kafka_available(spark):
        with pytest.raises(RuntimeError, match="spark-sql-kafka"):
            kafka_events_stream(spark, "localhost:9092", "events")
        pytest.skip("spark-sql-kafka connector not bundled in this container (documented gap)")
    stream = kafka_events_stream(spark, "localhost:9092", "events")
    assert stream.isStreaming
    assert {f.name for f in stream.schema.fields} == {
        "_topic", "_partition", "_offset", "_timestamp", "_key", "value",
    }
