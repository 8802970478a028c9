"""Format round-trips, table functions, MergeTree-style layout conventions,
and physical-plan shape gates (pushdown / pruning / broadcast)."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from clickhouseocp_spark.catalog import load_table
from clickhouseocp_spark.plans.inspect import (
    has_broadcast_join,
    pushed_filters,
    scan_read_schemas,
    shuffle_count,
)
from clickhouseocp_spark.sources.readers import generate_random, numbers, read_any
from clickhouseocp_spark.sources.writers import write_any, write_mergetree_style


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_format_round_trip(spark, sf_dir, fmt):
    src = load_table(spark, sf_dir, "customer")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, f"customer_{fmt}")
        write_any(src, path, fmt)
        back = read_any(spark, path, fmt, schema=src.schema)
        assert back.count() == src.count()
        a = {tuple(r) for r in src.collect()}
        b = {tuple(r) for r in back.collect()}
        assert a == b


def test_numbers_table_function(spark):
    df = numbers(spark, 1000, start=5)
    assert df.count() == 1000
    r = df.agg(F.min("number"), F.max("number")).collect()[0]
    assert (r[0], r[1]) == (5, 1004)


def test_generate_random_deterministic(spark):
    a = generate_random(spark, 500, seed=7, partitions=4).collect()
    b = generate_random(spark, 500, seed=7, partitions=13).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # partition-independent
    c = generate_random(spark, 500, seed=8).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))  # seed-sensitive


def test_mergetree_style_write_prunes_partitions(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_month", F.date_format("l_shipdate", "yyyyMM")
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "li")
        write_mergetree_style(
            li,
            path,
            partition_by=("ship_month",),
            order_by=("l_orderkey",),
            bloom_cols=("l_partkey",),
        )
        months = [m for m in os.listdir(path) if m.startswith("ship_month=")]
        assert len(months) > 10  # directory partitioning happened
        back = spark.read.parquet(path).filter(F.col("ship_month") == "199601")
        # partition pruning: only the matching directory is scanned
        assert "PartitionFilters" in __import__(
            "clickhouseocp_spark.plans.inspect", fromlist=["formatted_plan"]
        ).formatted_plan(back)
        expected = li.filter(F.col("ship_month") == "199601").count()
        assert back.count() == expected


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = li.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    pf = pushed_filters(q)
    assert pf and any("l_quantity" in f for f in pf), pf


def test_column_pruning_narrow_read_schema(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = li.select("l_orderkey", "l_quantity")
    schemas = scan_read_schemas(q)
    assert schemas and all(
        "l_extendedprice" not in s and "l_orderkey" in s for s in schemas
    ), schemas


def test_dim_join_broadcasts(spark, sf_dir):
    from clickhouseocp_spark.queries import all_queries

    q = all_queries()["join_inner_multi"].fn(spark, sf_dir)
    assert has_broadcast_join(q)


def test_q1_shuffle_budget(spark, sf_dir):
    """Flagship is scan → partial agg → ONE exchange → final agg (+AQE read);
    more exchanges than that means the plan regressed."""
    from clickhouseocp_spark.queries import all_queries

    q = all_queries()["q1_pricing_summary"].fn(spark, sf_dir)
    assert shuffle_count(q) <= 1, shuffle_count(q)


def test_global_with_fill_no_fact_shuffle(spark, sf_dir):
    """Global (un-partitioned) WITH FILL must not shuffle or sort-merge the
    fact stream: the axis/missing side rides broadcast joins, and the only
    exchanges are the tiny bounds agg + present-keys distinct."""
    from clickhouseocp_spark.operators.fill import with_fill
    from clickhouseocp_spark.plans.inspect import formatted_plan, shuffle_count

    ord_ = load_table(spark, sf_dir, "orders")
    daily = ord_.groupBy(F.col("o_orderdate").alias("d")).agg(F.count("*").alias("n"))
    filled = with_fill(daily, "d", "interval 1 day", zero_fill={"n": 0})
    plan = formatted_plan(filled)
    assert "SortMergeJoin" not in plan, plan
    # bounds agg (2) + present distinct (2) — nothing proportional to the data
    assert shuffle_count(filled) <= shuffle_count(daily) + 4, plan


def test_paste_join_no_single_partition_window(spark, sf_dir):
    """paste_join ranks via range partition + per-partition offsets; the only
    global window runs over one row per partition (the offsets), so no input
    funnels through a single reducer."""
    from clickhouseocp_spark.operators.groupwise import _global_rank

    cust = load_table(spark, sf_dir, "customer").repartition(8)
    ranked = _global_rank(cust, ["c_custkey"])
    rows = ranked.select("c_custkey", "__rn").collect()
    expect = {
        r.c_custkey: i + 1
        for i, r in enumerate(sorted(rows, key=lambda r: r.c_custkey))
    }
    assert all(r["__rn"] == expect[r.c_custkey] for r in rows)


def test_projection_answers_without_fact_scan(spark, sf_dir, tmp_path):
    """plans/projections.py: a routed aggregate scans ONLY the summary
    parquet (the fact table path never appears in the physical plan), and
    its result is identical to the direct fact-table aggregate."""
    from clickhouseocp_spark.plans.inspect import formatted_plan
    from clickhouseocp_spark.plans.projections import (
        ProjectionCatalog,
        build_projection,
    )

    li = load_table(spark, sf_dir, "lineitem")
    measures = {
        "qty_sum": ("sum", "l_quantity"),
        "n": ("count", "l_quantity"),
        "price_avg": ("avg", "l_extendedprice"),
    }
    path = str(tmp_path / "proj_li")
    proj, _ = build_projection(
        li, "li_proj", keys=("l_returnflag", "l_linestatus"), measures=measures, path=path
    )
    cat = ProjectionCatalog(spark)
    cat.register(proj)

    routed = cat.aggregate(li, ("l_returnflag",), measures)
    plan = formatted_plan(routed)
    assert "proj_li" in plan
    assert "lineitem" not in plan  # fact table never scanned

    direct = cat.aggregate(li, ("l_returnflag",), {**measures, "_force": ("count", "l_tax")})
    direct = direct.drop("_force")
    assert sorted(map(tuple, routed.collect())) == sorted(map(tuple, direct.collect()))

    # a grouping not covered by the projection falls back to the fact table
    fallback = cat.aggregate(li, ("l_returnflag", "l_shipdate"), measures)
    assert "lineitem" in formatted_plan(fallback)


def test_contamination_broadcasts_bench_grams(spark, sf_dir):
    """Decontamination plan shape: the benchmark gram set rides a BROADCAST
    join (bounded side by definition); the corpus side never self-joins and
    the whole query stays within a small shuffle budget."""
    from clickhouseocp_spark.plans.inspect import has_broadcast_join, shuffle_count
    from clickhouseocp_spark.queries import all_queries

    q = all_queries()["contamination_ngram_overlap"].fn(spark, sf_dir)
    assert has_broadcast_join(q)
    # budget: the fan_out exchange appears once per union branch (3×: corpus
    # remainder, planted copies, benchmark side) + gram distinct + doc_id agg
    assert shuffle_count(q) <= 5, shuffle_count(q)


def test_pii_scrub_no_shuffle(spark, sf_dir):
    """PII scrubbing is pure map-side column work — zero exchanges."""
    from clickhouseocp_spark.plans.inspect import shuffle_count
    from clickhouseocp_spark.queries import all_queries

    q = all_queries()["text_pii_scrub"].fn(spark, sf_dir)
    assert shuffle_count(q) == 0, shuffle_count(q)


def test_quality_filter_shuffles_keyed_on_doc(spark, sf_dir):
    """Gopher gate: columnar signals + the top-token explode path — the agg
    shuffles are keyed on doc_id and the budget stays small."""
    from clickhouseocp_spark.plans.inspect import shuffle_count
    from clickhouseocp_spark.queries import all_queries

    q = all_queries()["quality_filter_gopher"].fn(spark, sf_dir)
    assert shuffle_count(q) <= 4, shuffle_count(q)


def test_pack_sequences_single_shard_shuffle(spark, sf_dir):
    """Sequence packing = exactly one shuffle (hash-partition on the shard
    key feeding the applyInPandas fold) plus invariants: bins respect the
    budget (except single oversize rows) and positions are contiguous."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.catalog import load_table
    from clickhouseocp_spark.operators.packing import pack_sequences
    from clickhouseocp_spark.plans.inspect import shuffle_count

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    sharded = docs.withColumn("shard", (F.col("doc_id") % 4).cast("int"))
    packed = pack_sequences(
        sharded, weight_col="n_chars", budget=4096,
        shard_cols=["shard"], order_cols=["doc_id"],
    )
    assert shuffle_count(packed) == 1, shuffle_count(packed)
    sums = (
        packed.groupBy("shard", "bin")
        .agg(F.sum("n_chars").alias("tot"), F.count("*").alias("n"))
        .collect()
    )
    for r in sums:
        assert r.tot <= 4096 or r.n == 1, (r.shard, r.bin, r.tot, r.n)
    # every doc appears exactly once
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()


def test_pack_sequences_requires_shard(spark, sf_dir):
    import pytest as _pytest

    from clickhouseocp_spark.catalog import load_table
    from clickhouseocp_spark.operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    with _pytest.raises(ValueError, match="shard_cols"):
        pack_sequences(docs, "n_chars", 4096, [], ["doc_id"])


def test_mix_corpus_no_shuffle(spark, sf_dir):
    """Corpus mixing is a pure columnar map+explode: zero shuffles, and the
    copy counts follow the weight contract (floor(w) or floor(w)+1 copies)."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.catalog import load_table
    from clickhouseocp_spark.operators.packing import mix_corpus
    from clickhouseocp_spark.plans.inspect import shuffle_count

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    mixed = mix_corpus(docs, {"src0": 0.5, "src1": 2.5}, default_weight=1.0)
    assert shuffle_count(mixed) == 0, shuffle_count(mixed)
    per_doc = mixed.groupBy("doc_id", "source").count().collect()
    for r in per_doc:
        if r.source == "src0":
            assert r["count"] == 1  # kept half get exactly one copy
        elif r.source == "src1":
            assert r["count"] in (2, 3)
        else:
            assert r["count"] == 1


def test_window_chain_queries_single_shuffle(spark, sf_dir):
    """The gaps-and-islands / window-chain queries keep every window and
    aggregate on the same partitioning key, so Catalyst plans exactly ONE
    exchange end-to-end (HashPartitioning(k) satisfies every downstream
    ClusteredDistribution whose keys contain k)."""
    from clickhouseocp_spark.plans.inspect import shuffle_count
    from clickhouseocp_spark.queries import all_queries

    qs = all_queries()
    for name in ("sessionize_events", "interval_length_sum", "agg_delta_sum",
                 "group_array_moving_sum", "corpus_vocabulary"):
        n = shuffle_count(qs[name].fn(spark, sf_dir))
        assert n == 1, (name, n)


def test_protobuf_gate_and_descriptor_bytes(spark):
    """Protobuf format (SURVEY §2.1, reference format_schemas/): descriptor
    sets are built dependency-free from the public wire format; the encode/
    decode round trip runs when spark-protobuf is on the classpath and skips
    cleanly here (jar absent in this container, like Avro/Kafka)."""
    import pytest as _pytest

    from clickhouseocp_spark.sources.protobuf_io import (
        build_descriptor_set,
        protobuf_available,
        protobuf_round_trip,
    )

    blob = build_descriptor_set("Event", {"id": "int64", "s": "string"})
    # FileDescriptorSet.file is field 1 length-delimited; message name inside
    assert blob[0] == 0x0A and b"Event" in blob and b"proto3" in blob
    with _pytest.raises(ValueError, match="unsupported proto type"):
        build_descriptor_set("X", {"m": "map<string,string>"})
    if not protobuf_available(spark):
        _pytest.skip("spark-protobuf jar not bundled in this container (documented gap)")
    df = spark.range(3).selectExpr("id", "concat('v', cast(id as string)) s")
    back = protobuf_round_trip(df, "Event", {"id": "int64", "s": "string"})
    assert [(r.id, r.s) for r in back.collect()] == [(0, "v0"), (1, "v1"), (2, "v2")]


def test_projection_incremental_maintenance(spark, sf_dir):
    """plans/projections.merge_summaries: (old partition summary) merged with
    (delta partition summary) answers every aggregate identically to a full
    rebuild — the AggregatingMergeTree incremental-rollup contract, with no
    fact rescan on update."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.plans.projections import (
        ProjectionCatalog,
        build_projection,
        merge_summaries,
    )

    li = load_table(spark, sf_dir, "lineitem")
    cutoff = "1997-01-01"
    old = li.filter(F.col("l_shipdate") < cutoff)
    delta = li.filter(F.col("l_shipdate") >= cutoff)
    assert old.count() > 0 and delta.count() > 0
    keys = ("l_returnflag", "l_linestatus")
    measures = {
        "qty_sum": ("sum", "l_quantity"),
        "n": ("count", "l_quantity"),
        "price_avg": ("avg", "l_extendedprice"),
        "hi": ("max", "l_extendedprice"),
    }
    proj_full, summary_full = build_projection(li, "p_full", keys, measures)
    proj_old, summary_old = build_projection(old, "p_old", keys, measures)
    _, summary_delta = build_projection(delta, "p_delta", keys, measures)
    merged = merge_summaries(proj_old, summary_old, summary_delta)

    def answers(proj, summary):
        cat = ProjectionCatalog(spark)
        cat.register(proj, summary)
        rows = cat.aggregate(None, ("l_returnflag",), measures).collect()
        return {r.l_returnflag: (r.qty_sum, r.n, r.price_avg, r.hi) for r in rows}

    assert answers(proj_old, merged) == answers(proj_full, summary_full)


def test_native_file_interchange(spark, sf_dir, tmp_path):
    """clickhouse-local interchange loop: INTO OUTFILE '<f>' FORMAT Native
    writes a CH block file that read_any(..., 'native') loads back with the
    schema intact."""
    from clickhouseocp_spark.engine import ChSparkEngine
    from clickhouseocp_spark.sources.readers import read_any

    eng = ChSparkEngine(sf_dir, spark=spark)
    path = str(tmp_path / "regions.native")
    msg = eng.run(
        "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey "
        f"INTO OUTFILE '{path}' FORMAT Native"
    )
    assert msg.startswith("5 rows written")
    back = read_any(spark, path, "native")
    assert back.columns == ["r_regionkey", "r_name"]
    rows = back.orderBy("r_regionkey").collect()
    assert len(rows) == 5 and rows[0].r_name == "AFRICA"
    assert dict(back.dtypes)["r_regionkey"] == "int"


def test_round8_plan_shapes(spark, sf_dir):
    """100 TB gates for the round-8 operators: the keyed scan machine pays
    ONE exchange (window; the groupBy reuses its partitioning, matches
    explode in place); PRQL top-n-per-group is one window exchange; search
    is a single filtered scan plus the presentational sort; the quality
    bundle stays within its budget of 2 token-keyed aggs + 2 doc re-aggs +
    the output sort (join reuses the doc partitioning — no 6th)."""
    from clickhouseocp_spark.plans.inspect import shuffle_count
    from clickhouseocp_spark.queries import all_queries

    reg = all_queries()
    assert shuffle_count(reg["kql_scan_declare"].fn(spark, sf_dir)) == 1
    assert shuffle_count(reg["prql_group_topn"].fn(spark, sf_dir)) == 1
    assert shuffle_count(reg["kql_search_term"].fn(spark, sf_dir)) == 1
    assert shuffle_count(reg["quality_signals_bundle"].fn(spark, sf_dir)) <= 5


def test_round9_plan_shapes(spark, sf_dir):
    """100 TB gate for the round-9 concurrent scan: identical plan to the
    greedy machine — the Kusto-faithful machine set folds inside ONE JVM
    aggregate over the per-key sorted row array, so the extra semantics
    (n nullable slot structs) cost zero additional exchanges."""
    from clickhouseocp_spark.plans.inspect import shuffle_count
    from clickhouseocp_spark.queries import all_queries

    reg = all_queries()
    assert shuffle_count(reg["kql_scan_concurrent"].fn(spark, sf_dir)) == 1


def test_round10_fold_shuffle_budgets(spark, sf_dir):
    """Plan gates (round 10): every sorted-collect fold aggregate —
    sequenceNextNode, the funnel trio, sparkbar — lowers to ONE hash
    aggregate plus the presentation ORDER BY and nothing else (≤2
    exchanges); graph-match stays a broadcastable join chain (≤3)."""
    from clickhouseocp_spark.plans.inspect import shuffle_count
    from clickhouseocp_spark.queries import all_queries

    reg = all_queries()
    for name in (
        "chsql_funnel_text",
        "chsql_window_funnel_text",
        "chsql_sequence_next_node",
        "chsql_vocab_r26",
    ):
        n = shuffle_count(reg[name].fn(spark, sf_dir))
        assert n <= 2, (name, n)
    n = shuffle_count(reg["kql_graph_match"].fn(spark, sf_dir))
    assert n <= 3, ("kql_graph_match", n)


def test_ipv4_lookup_plan_is_equi_join(spark, sf_dir):
    """Plan gate (round 10): ipv4_lookup's fact-side join against the
    CIDR lookup is a hash EQUI join on (prefix_len, ip >> (32-len)) —
    never a SortMergeJoin or a fact-vs-lookup theta join.  The only
    nested-loop allowed is the deliberate cross fan-out against the
    broadcast distinct-mask relation (≤33 rows by construction)."""
    from clickhouseocp_spark.plans.inspect import formatted_plan
    from clickhouseocp_spark.queries import all_queries

    df = all_queries()["kql_ipv4_lookup"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan
    # the cross fan-out must be the broadcast flavor (lookup side tiny)
    assert "CartesianProduct" not in plan


def test_continuation_tier_shuffle_budgets(spark, sf_dir):
    """Plan gates (round-10 continuation): every fan-out/fold query stays
    within its designed exchange budget — the bounded-bin fan-outs and
    sorted-collect folds never degrade into range joins or extra
    shuffles."""
    from clickhouseocp_spark.plans.inspect import formatted_plan, shuffle_count
    from clickhouseocp_spark.queries import all_queries

    reg = all_queries()
    budgets = {
        "kql_reduce_by": 2,           # template agg + presentation sort
        "kql_row_rank": 3,            # one serialized sort chain + order
        "kql_series_fit_2lines": 1,   # per-row combinator tower + sort
        "kql_session_count": 3,       # id window + bin agg + sort
        "kql_rolling_percentile": 4,  # fan-out + bin agg (+1-row max)
        "kql_funnel_completion": 5,   # id fold + window agg
        "kql_sequence_detect": 3,     # id fold + sort
    }
    for name, budget in budgets.items():
        df = reg[name].fn(spark, sf_dir)
        n = shuffle_count(df)
        assert n <= budget, (name, n, budget)
        assert "CartesianProduct" not in formatted_plan(df), name


def test_round11_vocab_shuffle_budgets(spark, sf_dir):
    """Plan gates (round 11): the sweep batches stay scan-shaped —
    chsql_vocab_r36 / kql_scalar_vocab8 are pure projections over one
    scan plus the presentation ORDER BY (≤1 exchange, no join at all);
    chsql_vocab_r37 is ONE hash aggregate (every statistical fold — KS,
    quantiles, moments, contingency-style collects — rides the same
    single grouped exchange) plus the sort (≤2); no CartesianProduct
    anywhere."""
    from clickhouseocp_spark.plans.inspect import formatted_plan, shuffle_count
    from clickhouseocp_spark.queries import all_queries

    reg = all_queries()
    budgets = {
        "chsql_vocab_r36": 2,   # window (leadInFrame) + presentation sort
        # one grouped agg + presentation sort + ONE extra exchange from
        # Spark's count-DISTINCT expand rewrite (groupBitmap = exact
        # distinct mixed with plain aggregates) — the standard plan
        "chsql_vocab_r37": 3,
        "kql_scalar_vocab8": 1, # scan projection + presentation sort
    }
    for name, budget in budgets.items():
        df = reg[name].fn(spark, sf_dir)
        n = shuffle_count(df)
        assert n <= budget, (name, n, budget)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan, name
        assert "SortMergeJoin" not in plan, name
