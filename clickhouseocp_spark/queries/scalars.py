"""Scalar function families (SURVEY.md §2.8) — one oracle-checked query per
family, exercising the representative ClickHouse functions through their Spark
equivalents.  ~1,600 functions ship in the reference's engine pin
(Dockerfile:102-104); the name map lives in functions/clickhouse_names.py.

Cross-engine determinism notes baked into these queries:
- libm-backed functions (exp/ln/pow/trig) → round(,6) both sides;
- `round(x, d)` on 2-decimal doubles is NOT portable (Spark rounds the
  shortest-string repr, DuckDB the exact binary) → avoided;
- hex case differs → lower() both sides; epoch() is DOUBLE in DuckDB → floor
  + cast; Spark weekday() is 0=Monday → +1 == DuckDB isodow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from clickhouseocp_spark.catalog import load_table
from clickhouseocp_spark.queries import register


@register(
    "scalar_string",
    oracle="""
SELECT c_custkey,
       length(c_name) AS name_len,
       upper(c_name) AS name_upper,
       lower(c_mktsegment) AS seg_lower,
       substring(c_name, 2, 6) AS name_sub,
       concat_ws('|', c_mktsegment, c_name) AS joined,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
       trim(rpad(c_mktsegment, 12, ' ')) AS seg_trimmed,
       reverse(c_mktsegment) AS seg_rev,
       repeat(left(c_name, 2), 3) AS prefix_x3,
       starts_with(c_name, 'Customer') AS is_cust,
       CAST(strpos(c_name, '0') AS BIGINT) AS zero_pos,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
       right(c_name, 4) AS name_tail
FROM customer WHERE c_custkey <= 500
""",
    tags=("scalar", "string"),
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family (SURVEY §2.8): length/upper/lower/substring/concatWS/
    pad/trim/reverse/repeat/startsWith/position/translate/left/right."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    return c.select(
        "c_custkey",
        F.length("c_name").alias("name_len"),
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 2, 6).alias("name_sub"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("joined"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.trim(F.rpad("c_mktsegment", 12, " ")).alias("seg_trimmed"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.repeat(F.expr("left(c_name, 2)"), 3).alias("prefix_x3"),
        F.col("c_name").startswith("Customer").alias("is_cust"),
        F.instr("c_name", "0").cast("bigint").alias("zero_pos"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_tr"),
        F.expr("right(c_name, 4)").alias("name_tail"),
    )


@register(
    "scalar_regex",
    oracle="""
SELECT doc_id,
       regexp_matches(text, 'spark') AS mentions_spark,
       regexp_extract(text, '([a-z]{5,})', 1) AS first_long_word,
       CAST(len(regexp_extract_all(text, '\\b[a-z]{4}\\b')) AS INTEGER) AS n_four,
       regexp_replace(text, '[aeiou]', '', 'g') AS devoweled_head
FROM (SELECT doc_id, left(text, 60) AS text FROM documents WHERE doc_id < 100)
""",
    tags=("scalar", "regex"),
)
def scalar_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family (SURVEY §2.8): match/extract/extractAll-count/replaceAll.
    Global replace: Spark regexp_replace is global by default, DuckDB needs
    the 'g' flag."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", F.expr("left(text, 60)").alias("text"))
    )
    return d.select(
        "doc_id",
        F.col("text").rlike("spark").alias("mentions_spark"),
        F.regexp_extract("text", r"([a-z]{5,})", 1).alias("first_long_word"),
        F.size(F.regexp_extract_all("text", F.lit(r"(\b[a-z]{4}\b)"))).alias("n_four"),
        F.regexp_replace("text", "[aeiou]", "").alias("devoweled_head"),
    )


@register(
    "scalar_datetime",
    oracle="""
SELECT event_id,
       year(ts) AS y, month(ts) AS mo, day(ts) AS d,
       hour(ts) AS h, minute(ts) AS mi, CAST(second(ts) AS INTEGER) AS s,
       CAST(strftime(ts, '%Y%m') AS INTEGER) AS yyyymm,
       CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ts_hour,
       CAST(isodow(ts) AS INTEGER) AS iso_dow,
       CAST(floor(epoch(ts)) AS BIGINT) AS unix_sec,
       ts + INTERVAL 7 DAY AS ts_plus_week,
       ts + INTERVAL 1 MONTH AS ts_plus_month,
       CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER) AS days_since,
       last_day(CAST(ts AS DATE)) AS month_end
FROM events WHERE event_id % 7 = 0
""",
    tags=("scalar", "datetime"),
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (SURVEY §2.8): extract fields, toYYYYMM analog,
    date_trunc, ISO weekday, unix seconds, interval arithmetic, dateDiff,
    last_day — all on the UTC session pinned by the reference
    (Dockerfile:220)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.second("ts").cast("int").alias("s"),
        F.date_format("ts", "yyyyMM").cast("int").alias("yyyymm"),
        F.date_trunc("hour", "ts").alias("ts_hour"),
        (F.weekday("ts") + 1).cast("int").alias("iso_dow"),
        F.unix_timestamp("ts").alias("unix_sec"),
        (F.col("ts") + F.expr("INTERVAL 7 DAY")).alias("ts_plus_week"),
        (F.col("ts") + F.expr("INTERVAL 1 MONTH")).alias("ts_plus_month"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("int")
        .alias("days_since"),
        F.last_day(F.to_date("ts")).alias("month_end"),
    )


@register(
    "scalar_math",
    oracle="""
SELECT p_partkey,
       abs(p_retailprice - 1000.0) AS abs_centered,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
       sqrt(p_retailprice) AS price_sqrt,
       ROUND(exp(p_retailprice / 1000.0), 6) AS e_scaled,
       ROUND(ln(p_retailprice), 6) AS price_ln,
       ROUND(log10(p_retailprice), 6) AS price_log10,
       ROUND(pow(p_retailprice, 0.5) / (1 + sqrt(p_retailprice)), 6) AS ratio,
       ROUND(sin(p_size), 6) AS size_sin,
       ROUND(atan2(p_size, 10), 6) AS size_atan2,
       p_size % 5 AS size_mod,
       CAST(sign(p_retailprice - 1000.0) AS DOUBLE) AS centered_sign
FROM part WHERE p_partkey % 3 = 0
""",
    tags=("scalar", "math"),
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (SURVEY §2.8).  abs/floor/ceil/sqrt/sign/mod are exact
    IEEE; exp/ln/log10/pow/sin/atan2 cross libm → round(,6)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 3 == 0)
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000.0).alias("abs_centered"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.sqrt("p_retailprice").alias("price_sqrt"),
        F.round(F.exp(F.col("p_retailprice") / 1000.0), 6).alias("e_scaled"),
        F.round(F.log(F.col("p_retailprice")), 6).alias("price_ln"),
        F.round(F.log10("p_retailprice"), 6).alias("price_log10"),
        F.round(
            F.pow("p_retailprice", F.lit(0.5)) / (1 + F.sqrt("p_retailprice")), 6
        ).alias("ratio"),
        F.round(F.sin("p_size"), 6).alias("size_sin"),
        F.round(F.atan2(F.col("p_size").cast("double"), F.lit(10.0)), 6).alias("size_atan2"),
        (F.col("p_size") % 5).alias("size_mod"),
        F.signum(F.col("p_retailprice") - 1000.0).alias("centered_sign"),
    )


@register(
    "scalar_conditional",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'high'
            WHEN o_totalprice > 150000 THEN 'mid'
            WHEN o_totalprice > 50000 THEN 'low'
            ELSE 'tiny' END AS price_band,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
       greatest(o_totalprice / 1000.0, CAST(o_custkey AS DOUBLE)) AS g,
       least(o_totalprice / 1000.0, CAST(o_custkey AS DOUBLE)) AS l,
       CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS is_urgent
FROM orders WHERE o_orderkey % 5 = 0
""",
    tags=("scalar", "conditional"),
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family (SURVEY §2.8): multiIf → chained when(), coalesce/
    nullIf, greatest/least, if → when().otherwise()."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 5 == 0)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 150000, "mid")
        .when(F.col("o_totalprice") > 50000, "low")
        .otherwise("tiny")
        .alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias("status_label"),
        F.greatest(F.col("o_totalprice") / 1000.0, F.col("o_custkey").cast("double")).alias("g"),
        F.least(F.col("o_totalprice") / 1000.0, F.col("o_custkey").cast("double")).alias("l"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0).alias("is_urgent"),
    )


@register(
    "scalar_hash",
    oracle="""
SELECT s_suppkey,
       md5(s_name) AS name_md5,
       sha256(s_name) AS name_sha256,
       lower(hex(s_name)) AS name_hex,
       to_base64(encode(s_name)) AS name_b64,
       md5(concat(s_name, '|', CAST(s_nationkey AS VARCHAR))) AS composite_md5
FROM supplier
""",
    tags=("scalar", "hash"),
)
def scalar_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/encoding family (SURVEY §2.8): MD5/SHA256/hex/base64 — the
    portable subset (cityHash64/sipHash are CH-internal; our Spark-native
    analogs xxhash64/hash are covered by pytest, not the oracle)."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.md5("s_name").alias("name_md5"),
        F.sha2("s_name", 256).alias("name_sha256"),
        F.lower(F.hex("s_name")).alias("name_hex"),
        F.base64(F.encode("s_name", "utf-8")).alias("name_b64"),
        F.md5(F.concat("s_name", F.lit("|"), F.col("s_nationkey").cast("string"))).alias("composite_md5"),
    )


@register(
    "scalar_cast",
    oracle="""
SELECT p_partkey,
       TRY_CAST(p_brand AS INTEGER) AS brand_as_int,
       TRY_CAST(substring(p_brand, 7, 2) AS INTEGER) AS brand_num,
       CAST(floor(p_retailprice) AS BIGINT) AS price_int,
       CAST(p_size AS DOUBLE) AS size_dbl,
       CAST(p_size AS VARCHAR) AS size_str,
       TRY_CAST('2024-06-15' AS DATE) AS fixed_date,
       CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec
FROM part WHERE p_partkey % 4 = 1
""",
    tags=("scalar", "cast"),
)
def scalar_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion family (SURVEY §2.8): try_cast (accurateCastOrNull analog),
    explicit numeric/string/date casts, decimal cast."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 4 == 1)
    return p.select(
        "p_partkey",
        F.col("p_brand").try_cast("int").alias("brand_as_int"),
        F.substring("p_brand", 7, 2).try_cast("int").alias("brand_num"),
        F.floor("p_retailprice").cast("bigint").alias("price_int"),
        F.col("p_size").cast("double").alias("size_dbl"),
        F.col("p_size").cast("string").alias("size_str"),
        F.lit("2024-06-15").try_cast("date").alias("fixed_date"),
        # DECIMAL stays an intermediate: DuckDB's pandas path renders DECIMAL
        # as float64 while Spark collects Decimal objects → driver hash drift.
        # Emit DOUBLE on both sides (CORRECTNESS_r04 `scalar_cast` root cause).
        F.col("p_retailprice").cast("decimal(12,2)").cast("double").alias("price_dec"),
    )


@register(
    "scalar_array_higher_order",
    oracle="""
SELECT doc_id,
       len(words) AS n_words,
       words[1] AS first_word,
       list_contains(words, 'spark') AS has_spark,
       len(list_distinct(words)) AS n_distinct,
       array_to_string(list_slice(list_sort(list_distinct(words)), 1, 3), ',') AS first3_sorted,
       len(list_filter(words, x -> length(x) > 4)) AS n_long,
       CAST(list_aggregate(list_transform(words, x -> length(x)), 'sum') AS BIGINT) AS total_chars,
       len(list_filter(words, x -> length(x) > 8)) > 0 AS has_very_long,
       array_to_string(list_slice(words, 2, 4), ' ') AS mid_slice
FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents WHERE doc_id < 100)
""",
    tags=("scalar", "array"),
)
def scalar_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order-lambda family (SURVEY §2.8): size/element/has/
    distinct/sort/slice plus transform/filter/aggregate/exists — ClickHouse
    arrayMap/arrayFilter/arraySum/arrayExists as Spark HOFs (JVM-side, no
    UDFs)."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", F.split("text", " ").alias("words"))
    )
    words = F.col("words")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
        F.array_join(F.slice(F.array_sort(F.array_distinct(words)), 1, 3), ",").alias("first3_sorted"),
        F.size(F.filter(words, lambda x: F.length(x) > 4)).alias("n_long"),
        F.aggregate(
            F.transform(words, lambda x: F.length(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.exists(words, lambda x: F.length(x) > 8).alias("has_very_long"),
        F.array_join(F.slice(words, 2, 3), " ").alias("mid_slice"),
    )


@register(
    "scalar_url",
    oracle="""
SELECT doc_id, url,
       regexp_extract(url, '^([a-z]+)://', 1) AS protocol,
       regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '\\?(.*)$', 1) AS query_string,
       regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
FROM (
  SELECT doc_id,
         concat('https://', source, '.example.com/docs/', CAST(doc_id AS VARCHAR),
                '?lang=', lang, '&src=', source) AS url
  FROM documents WHERE doc_id < 50
)
""",
    tags=("scalar", "url"),
)
def scalar_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL family (SURVEY §2.8 protocol/domain/path/queryString/
    extractURLParameter) via parse_url — the oracle reproduces with regex
    (DuckDB has no URL parser)."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.concat(
                F.lit("https://"),
                "source",
                F.lit(".example.com/docs/"),
                F.col("doc_id").cast("string"),
                F.lit("?lang="),
                "lang",
                F.lit("&src="),
                "source",
            ).alias("url"),
        )
    )
    return d.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query_string"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@register(
    "scalar_geo",
    oracle="""
WITH pts AS (
  SELECT c_custkey,
         (c_custkey % 17000) / 100.0 - 85.0 AS lat,
         (c_custkey % 35000) / 100.0 - 175.0 AS lon
  FROM customer
)
SELECT c_custkey,
       ROUND(2.0 * 6371000.0 * asin(least(1.0, sqrt(
         sin(radians(48.8566 - lat) / 2) * sin(radians(48.8566 - lat) / 2)
         + cos(radians(lat)) * cos(radians(48.8566))
           * sin(radians(2.3522 - lon) / 2) * sin(radians(2.3522 - lon) / 2)
       ))) / 1000.0, 6) AS dist_km,
       CAST(lon BETWEEN -10 AND 30 AND lat BETWEEN 35 AND 70 AS INTEGER) AS in_europe_box
FROM pts
""",
    tags=("scalar", "geo"),
)
def scalar_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo family (SURVEY §2.8): greatCircleDistance (haversine, mean-radius
    sphere — functions/geo.py) from synthetic per-customer coordinates to
    Paris, plus a pointInBox containment flag.  r6 on the libm-backed
    distance."""
    from clickhouseocp_spark.functions.geo import great_circle_distance, point_in_box

    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        ((F.col("c_custkey") % 17000) / 100.0 - 85.0).alias("lat"),
        ((F.col("c_custkey") % 35000) / 100.0 - 175.0).alias("lon"),
    )
    dist = great_circle_distance(
        F.col("lon"), F.col("lat"), F.lit(2.3522), F.lit(48.8566)
    )
    box = point_in_box(
        F.col("lon"), F.col("lat"),
        F.lit(-10.0), F.lit(35.0), F.lit(30.0), F.lit(70.0),
    )
    return pts.select(
        "c_custkey",
        F.round(dist / 1000.0, 6).alias("dist_km"),
        box.cast("int").alias("in_europe_box"),
    )


@register(
    "scalar_tuple_map",
    oracle="""
SELECT p_partkey,
       p_brand AS tuple_brand,
       CAST(p_size AS BIGINT) AS tuple_size,
       'brand,type' AS map_keys_csv,
       p_brand AS map_brand_val,
       CAST(0 AS BOOLEAN) AS has_container_key,
       upper(p_type) AS type_upper,
       CAST(1 AS INTEGER) AS brand_only_size
FROM part WHERE p_partkey <= 2000
""",
    tags=("scalar", "tuple", "map"),
)
def scalar_tuple_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tuples/Maps family (SURVEY §2.8): tuple/tupleElement via struct +
    getField; map / mapKeys / mapContains / mapApply (transform_values) /
    mapFilter / element_at.  The oracle states the algebraically-equal scalar
    results — the map round-trips must be lossless to hash-match."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 2000)
    tup = F.struct(F.col("p_brand"), F.col("p_size"))
    m = F.map_from_entries(
        F.array(
            F.struct(F.lit("brand").alias("k"), F.col("p_brand").alias("v")),
            F.struct(F.lit("type").alias("k"), F.col("p_type").alias("v")),
        )
    )
    upper_m = F.transform_values(m, lambda k, v: F.upper(v))
    brand_only = F.map_filter(m, lambda k, v: k == F.lit("brand"))
    return p.select(
        "p_partkey",
        tup.getField("p_brand").alias("tuple_brand"),
        tup.getField("p_size").cast("bigint").alias("tuple_size"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("map_keys_csv"),
        F.element_at(m, F.lit("brand")).alias("map_brand_val"),
        F.map_contains_key(m, F.lit("container")).alias("has_container_key"),
        F.element_at(upper_m, F.lit("type")).alias("type_upper"),
        F.size(F.map_keys(brand_only)).alias("brand_only_size"),
    )


@register(
    "scalar_interval",
    oracle="""
WITH o AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
  FROM orders WHERE o_orderkey <= 4000
)
SELECT o_orderkey,
       CAST(d + INTERVAL 3 MONTH AS DATE) AS plus_3_months,
       d - 45 AS minus_45_days,
       CAST(date_diff('day', d - 45, CAST(d + INTERVAL 3 MONTH AS DATE)) AS INTEGER) AS span_days,
       CAST(date_trunc('quarter', d) AS DATE) AS quarter_start,
       CAST(d AS TIMESTAMP) + INTERVAL 36 HOUR AS ts_plus_36h
FROM o
""",
    tags=("scalar", "datetime", "interval"),
)
def scalar_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval family (SURVEY §1.2 Interval* → ANSI intervals): year-month
    and day-time interval arithmetic on dates/timestamps, datediff spans,
    quarter truncation."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 4000)
        .withColumn("d", F.col("o_orderdate").cast("date"))
    )
    plus3m = F.expr("d + INTERVAL '3' MONTH").cast("date")
    minus45 = F.date_sub("d", 45)
    return o.select(
        "o_orderkey",
        plus3m.alias("plus_3_months"),
        minus45.alias("minus_45_days"),
        F.datediff(plus3m, minus45).alias("span_days"),
        F.date_trunc("quarter", "d").cast("date").alias("quarter_start"),
        F.expr("CAST(d AS TIMESTAMP) + INTERVAL '36' HOUR").alias("ts_plus_36h"),
    )


# --- pointInPolygon ---------------------------------------------------------

#: non-convex "arrow" polygon in the synthetic lon/lat plane (integral
#: vertices → exact doubles, so both engines' edge arithmetic is bitwise
#: identical).  Shared by the Spark expression AND the generated oracle.
_POLY = [(-20.0, 0.0), (0.0, 45.0), (20.0, 0.0), (0.0, 12.0)]


def _poly_oracle_terms() -> str:
    terms = []
    n = len(_POLY)
    for i in range(n):
        x1, y1 = _POLY[i]
        x2, y2 = _POLY[(i + 1) % n]
        terms.append(
            f"CASE WHEN (({y1!r} > lat) != ({y2!r} > lat)) "
            f"AND lon < {x1!r} + (lat - {y1!r}) * {(x2 - x1)!r} / {(y2 - y1)!r} "
            "THEN 1 ELSE 0 END"
        )
    return " + ".join(terms)


@register(
    "geo_point_in_polygon",
    oracle=f"""
WITH pts AS (
  SELECT c_custkey,
         CAST(c_custkey % 97 - 48 AS DOUBLE) + 0.5 AS lat,
         CAST(c_custkey % 113 - 56 AS DOUBLE) + 0.5 AS lon
  FROM customer
)
SELECT c_custkey,
       ({_poly_oracle_terms()}) % 2 = 1 AS inside
FROM pts
""",
    tags=("scalar", "geo"),
)
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pointInPolygon (SURVEY §2.8 geo family): even-odd ray casting against
    a constant non-convex polygon, unrolled at plan time into codegen'd
    comparisons (functions/geo.point_in_polygon).  The oracle runs the SAME
    per-edge arithmetic, generated from the same vertex list — a value-hash
    match proves the crossing test edge by edge."""
    from clickhouseocp_spark.functions.geo import point_in_polygon

    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        ((F.col("c_custkey") % 97 - 48).cast("double") + 0.5).alias("lat"),
        ((F.col("c_custkey") % 113 - 56).cast("double") + 0.5).alias("lon"),
    )
    return pts.select(
        "c_custkey",
        point_in_polygon(F.col("lon"), F.col("lat"), _POLY).alias("inside"),
    )
