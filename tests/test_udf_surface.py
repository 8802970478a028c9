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


def test_avro_container_roundtrip_dependency_free(spark, sf_dir):
    """The dependency-free Avro Object Container implementation (public
    Avro 1.11 spec, sources/avro_io.py — protobuf_io's sibling): executor-
    side per-partition writes, binaryFile+mapInPandas distributed read,
    values round-trip exactly.  Runs in THIS container (no jars)."""
    import json
    import tempfile

    from clickhouseocp_spark.sources.avro_io import (
        avro_schema_json,
        read_avro,
        write_avro,
    )

    df = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .withColumn("o_totalprice", F.col("o_totalprice").cast("double"))
        .limit(500)
        .repartition(4)
    )
    schema = json.loads(avro_schema_json(df))
    assert [f["name"] for f in schema["fields"]] == df.columns
    assert schema["fields"][0]["type"] == ["null", "long"]
    with tempfile.TemporaryDirectory() as d:
        n = write_avro(df, d + "/orders_avro")
        assert n == 500
        back = read_avro(spark, d + "/orders_avro")
        a = {tuple(r) for r in df.collect()}
        b = {tuple(r) for r in back.collect()}
        assert a == b
        # interop: when the native spark-avro module is present, the same
        # files must read back through it unchanged (container format is
        # the contract); gated exactly like the other external jars
        from clickhouseocp_spark.sources.avro_io import avro_available

        if avro_available(spark):
            native = spark.read.format("avro").load(d + "/orders_avro")
            assert {tuple(r) for r in native.collect()} == a


def test_avro_rejects_nested_types(spark, sf_dir):
    from clickhouseocp_spark.sources.avro_io import avro_schema_json

    docs = load_table(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("words")
    )
    with pytest.raises(ValueError, match="flat primitive"):
        avro_schema_json(docs)


def test_engine_kafka_ddl_actionable_error(spark, sf_dir):
    """CREATE TABLE ... ENGINE = Kafka either builds the streaming frame
    (jars present) or raises the enable RECIPE — exact package coordinate +
    session config — never an opaque source-not-found at first read."""
    from clickhouseocp_spark.engine import ChSparkEngine
    from clickhouseocp_spark.streaming.pipeline import kafka_available

    eng = ChSparkEngine(sf_dir, spark)
    ddl = (
        "CREATE TABLE kq (user_id Int64, value Float64) ENGINE = Kafka "
        "SETTINGS kafka_broker_list = 'localhost:9092', "
        "kafka_topic_list = 'events'"
    )
    if not kafka_available(spark):
        with pytest.raises(RuntimeError) as e:
            eng.execute(ddl)
        msg = str(e.value)
        assert "spark-sql-kafka-0-10" in msg and "spark.jars.packages" in msg
        pytest.skip("kafka connector absent; actionable-error path verified")
    stream = eng.execute(ddl)
    assert stream.isStreaming
    assert "user_id" in stream.columns and "_offset" in stream.columns


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
