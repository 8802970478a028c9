"""Operator-level tests for behaviors the DuckDB oracle can't check:
approximate sketches, engine-specific hashes, pandas fallbacks, stubs."""

import pytest
from pyspark.sql import functions as F

from clickhouseocp_spark.catalog import load_table
from clickhouseocp_spark.queries import all_queries

QS = all_queries()


def test_approx_count_distinct_error_bound(spark, sf_dir):
    """agg_approx_distinct pairs exact counts (oracle-checked) with an
    in-query HLL relative-error assertion: hll_ok must hold everywhere, and
    the exact companions must match a direct count_distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag").agg(F.countDistinct("l_orderkey").alias("n")).collect()
    }
    rows = QS["agg_approx_distinct"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.hll_ok, r
        assert r.exact_orders == exact[r.l_returnflag]


def test_asof_pandas_matches_window_impl(spark, sf_dir):
    from clickhouseocp_spark.operators.asof import asof_join, asof_join_pandas

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    a = asof_join(clicks, purchases, on="user_id", left_ts="ts", right_cols=["ts", "value"])
    b = asof_join_pandas(clicks, purchases, on="user_id", left_ts="ts")
    ra = {(r.event_id, r.ts_r, r.value) for r in a.collect()}
    rb = {(r.event_id, r.ts_r, r.value) for r in b.collect()}
    assert ra == rb


def test_minhash_lsh_finds_planted_near_dups(spark, sf_dir):
    from clickhouseocp_spark.queries.llm import dedup_minhash_lsh_pairs

    rows = dedup_minhash_lsh_pairs(spark, sf_dir).collect()
    planted = {r.id_a for r in rows if r.id_b == r.id_a + 1_000_000}
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(planted) / n_docs > 0.8  # ~J>=0.5 pairs through 4x4 banding
    assert all(r.jaccard >= 0.5 for r in rows)
    # the registered query distills the same protocol into driver-checkable booleans
    summary = QS["dedup_minhash_lsh"].fn(spark, sf_dir).collect()[0]
    assert summary.planted_recall_ok and summary.threshold_ok
    assert summary.n_docs == n_docs


def test_simhash_planted_recall_and_threshold(spark, sf_dir):
    from clickhouseocp_spark.queries.llm import dedup_simhash_pairs

    rows = dedup_simhash_pairs(spark, sf_dir).collect()
    assert all(r.hamming <= 8 for r in rows)
    planted = {r.id_a for r in rows if r.id_b == r.id_a + 1_000_000}
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(planted) / n_docs > 0.5
    summary = QS["dedup_simhash"].fn(spark, sf_dir).collect()[0]
    assert summary.planted_recall_ok and summary.hamming_ok


def test_exact_dedup_collapses_planted_copies(spark, sf_dir):
    rows = QS["dedup_exact"].fn(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs  # 2n corpus → n survivors
    assert all(r.dup_count == 2 for r in rows)
    assert all(r.doc_id < 1_000_000 for r in rows)  # min-id survivor


def test_srp_lsh_recall_vs_bruteforce(spark, sf_dir):
    from clickhouseocp_spark.queries.llm import similarity_topk_lsh_pairs

    bf = {(r.query_id, r.neighbor_id) for r in QS["similarity_topk"].fn(spark, sf_dir).collect()}
    lsh = {(r.query_id, r.neighbor_id) for r in similarity_topk_lsh_pairs(spark, sf_dir).collect()}
    assert len(bf & lsh) / len(bf) > 0.3  # approximate tier, tuned 4 bits x 8 tables
    # registered queries emit the same contract as driver-checkable booleans
    for name in ("similarity_topk_lsh", "similarity_topk_ivf"):
        summary = QS[name].fn(spark, sf_dir).collect()[0]
        assert summary.recall_ok and summary.n_queries == 10, (name, summary)


def test_cosine_topk_pandas_matches_hof_impl(spark, sf_dir):
    from clickhouseocp_spark.operators.similarity import cosine_topk, cosine_topk_pandas

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    a = {(r.query_id, r.rank): r.neighbor_id for r in cosine_topk(q, emb, 5).collect()}
    b = {(r.query_id, r.rank): r.neighbor_id for r in cosine_topk_pandas(q, emb, 5).collect()}
    assert a == b


def test_embedding_near_dup_exactly_planted(spark, sf_dir):
    rows = QS["embedding_near_dup"].fn(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n
    assert all(r.id_b == r.id_a + 1_000_000 for r in rows)
    assert all(r.score >= 0.999999 for r in rows)


def test_embedding_near_dup_lsh_planted_recall(spark, sf_dir):
    """SRP-bucket-blocked near-dup: planted x2-scaled copies share the exact
    direction, hence every LSH bucket → recall on them must be 1.0, with no
    all-pairs join anywhere (the operator never builds one by construction)."""
    from clickhouseocp_spark.queries.llm import embedding_near_dup_lsh_raw

    rows = embedding_near_dup_lsh_raw(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    planted = {r.id_a for r in rows if r.id_b == r.id_a + 1_000_000}
    assert len(planted) == n
    assert all(r.score >= 0.95 for r in rows)
    summary = QS["embedding_near_dup_lsh"].fn(spark, sf_dir).collect()[0]
    assert summary.planted_recall_ok and summary.threshold_ok


def test_near_dup_unblocked_defaults_refused(spark, sf_dir):
    """The quadratic all-pairs path must be an explicit opt-in, never a
    default (round-1 verdict 'What's wrong' #2)."""
    from clickhouseocp_spark.operators.dedup_text import ngram_jaccard_pairs
    from clickhouseocp_spark.operators.similarity import embedding_near_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="blocking"):
        embedding_near_dup_pairs(emb)
    with pytest.raises(ValueError, match="blocking"):
        ngram_jaccard_pairs(docs, block_cols=[])
    # bounded inputs can still opt in explicitly
    small = emb.limit(20)
    assert embedding_near_dup_pairs(small, allow_all_pairs=True, threshold=-2.0).count() == 190


def test_quantile_timing_empty_state_is_null(spark):
    """quantileTiming on an empty/all-zero state returns NULL (CH returns
    NaN), not the first bucket's midpoint."""
    from clickhouseocp_spark.operators.sketches import quantile_timing_estimate

    df = spark.createDataFrame(
        [("a", [0] * 256), ("b", [0] * 255 + [4])], "k string, qt_state array<long>"
    )
    rows = {r.k: r.q for r in df.select("k", quantile_timing_estimate(0.5).alias("q")).collect()}
    assert rows["a"] is None
    assert rows["b"] is not None


def test_multimodal_decode_stub_raises_without_fake():
    from clickhouseocp_spark.sources.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_multimodal_meta_deterministic(spark, sf_dir):
    import hashlib

    rows = {r.doc_id: r for r in QS["multimodal_binary_meta"].fn(spark, sf_dir).collect()}
    docs = {r.doc_id: r.text for r in load_table(spark, sf_dir, "documents").collect()}
    assert set(rows) == set(docs)
    for did in list(docs)[:20]:
        payload = docs[did].encode()
        assert rows[did].n_bytes == len(payload)
        assert rows[did].sha256_16 == hashlib.sha256(payload).hexdigest()[:16]
        assert 64 <= rows[did].width <= 255


def test_fingerprint_rolling_deterministic(spark, sf_dir):
    from clickhouseocp_spark.functions.text import fingerprint_rolling

    d = load_table(spark, sf_dir, "documents").limit(50)
    a = d.select("doc_id", fingerprint_rolling(F.col("text")).alias("fp"))
    r1 = {(r.doc_id, r.fp) for r in a.collect()}
    r2 = {(r.doc_id, r.fp) for r in a.collect()}
    assert r1 == r2
    assert len({fp for _, fp in r1}) == len(r1)  # distinct docs → distinct fps


def test_range_dict_get(spark, sf_dir):
    from clickhouseocp_spark.operators.dictionary import range_dict_get

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    tiers = spark.createDataFrame(
        [(0.0, 100.0, "low"), (100.0, 300.0, "mid"), (300.0, 1e9, "high")],
        "lo double, hi double, tier string",
    ).withColumn("k", F.lit(1))
    enriched = range_dict_get(
        ev.withColumn("k", F.lit(1)),
        tiers,
        key="k",
        point="value",
        range_start="lo",
        range_end="hi",
        values={"tier": "unknown"},
    )
    got = enriched.filter(F.col("value") < 100.0).select("tier").distinct().collect()
    assert [r.tier for r in got] == ["low"]


def test_salted_join_matches_plain_join(spark, sf_dir):
    from clickhouseocp_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey").agg(
        F.count(F.lit(1)), F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
    ).collect()
    salted = salted_join(li, orders, on=["l_orderkey"], salt_factor=4).agg(
        F.count(F.lit(1)), F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
    ).collect()
    assert plain == salted


def test_hll_state_merge_accuracy(spark, sf_dir):
    rows = {r.event_type: r for r in QS["hll_state_merge"].fn(spark, sf_dir).collect()}
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for t, n in exact.items():
        assert rows[t].exact_uniq == n
        assert rows[t].hll_ok, (t, rows[t])


def test_bucketed_tables_join_without_shuffle(spark, sf_dir):
    from clickhouseocp_spark.plans.inspect import formatted_plan
    from clickhouseocp_spark.sources.writers import write_bucketed_table

    import uuid

    sfx = uuid.uuid4().hex[:8]
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed_table(li, f"b_li_{sfx}", bucket_by=["l_orderkey"], num_buckets=8, sort_by=["l_orderkey"])
    write_bucketed_table(orders, f"b_orders_{sfx}", bucket_by=["o_orderkey"], num_buckets=8, sort_by=["o_orderkey"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(f"b_li_{sfx}").join(
            spark.table(f"b_orders_{sfx}"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = formatted_plan(j)
        # co-located buckets: the sort-merge join runs with NO shuffle exchange
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


# ---------------------------------------------------------------------------
# Sequence aggregates (sequenceMatch / sequenceCount)
# ---------------------------------------------------------------------------


def _seq_df(spark, rows):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(k, base + dt.timedelta(seconds=s), e) for k, s, e in rows],
        "k long, ts timestamp, ev string",
    )


def test_sequence_match_later_start_beats_greedy_earliest(spark):
    from clickhouseocp_spark.operators.funnel import sequence_match

    # earliest-match greedy would bind A@0 and miss; the A@95 chain fits <=10
    df = _seq_df(spark, [(1, 0, "A"), (1, 95, "A"), (1, 100, "B")])
    conds = [F.col("ev") == "A", F.col("ev") == "B"]
    out = sequence_match(df, "k", "ts", conds, [("<=", 10)]).collect()
    assert out[0].matched == 1


def test_sequence_match_requires_strictly_increasing_ts(spark):
    from clickhouseocp_spark.operators.funnel import sequence_match

    df = _seq_df(spark, [(1, 5, "A"), (1, 5, "B"), (2, 5, "A"), (2, 6, "B")])
    conds = [F.col("ev") == "A", F.col("ev") == "B"]
    out = {r.k: r.matched for r in sequence_match(df, "k", "ts", conds).collect()}
    assert out == {1: 0, 2: 1}


def test_sequence_match_min_gap_constraint(spark):
    from clickhouseocp_spark.operators.funnel import sequence_match

    conds = [F.col("ev") == "A", F.col("ev") == "B"]
    near = _seq_df(spark, [(1, 0, "A"), (1, 5, "B")])
    far = _seq_df(spark, [(2, 0, "A"), (2, 5, "B"), (2, 20, "B")])
    assert sequence_match(near, "k", "ts", conds, [(">=", 10)]).collect()[0].matched == 0
    assert sequence_match(far, "k", "ts", conds, [(">=", 10)]).collect()[0].matched == 1


def test_sequence_count_greedy_restart(spark):
    from clickhouseocp_spark.operators.funnel import sequence_count

    conds = [F.col("ev") == "A", F.col("ev") == "B"]
    # ABAB -> 2 ; AABB -> 1 (second B has no fresh A) ; BBB -> 0
    df = _seq_df(
        spark,
        [(1, 0, "A"), (1, 1, "B"), (1, 2, "A"), (1, 3, "B")]
        + [(2, 0, "A"), (2, 1, "A"), (2, 2, "B"), (2, 3, "B")]
        + [(3, 0, "B"), (3, 1, "B"), (3, 2, "B")],
    )
    out = {r.k: r.n_chains for r in sequence_count(df, "k", "ts", conds).collect()}
    assert out == {1: 2, 2: 1, 3: 0}


def test_ivf_planted_duplicates_recalled_at_rank1(spark, sf_dir):
    from clickhouseocp_spark.operators.similarity import ivf_topk

    # corpus = originals ∪ same-direction scaled copies: cell assignment is
    # scale-invariant, so each query's copy shares its cell → recall = 1
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    scaled = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0).cast("float")).alias("embedding"),
    )
    corpus = emb.unionByName(scaled)
    queries = emb.filter(F.col("vec_id") < 10)
    out = ivf_topk(queries, corpus, k=3, n_centroids=8, n_probe=2)
    top1 = {r.query_id: r.neighbor_id for r in out.collect() if r.rank == 1}
    assert top1 == {q: q + 1_000_000 for q in top1}
    assert len(top1) == queries.count()


def test_ivf_scores_are_exact_cosine(spark, sf_dir):
    from clickhouseocp_spark.operators.similarity import cosine_topk, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id): r.score
        for r in cosine_topk(queries, emb, k=10**6).collect()
    }
    ivf = ivf_topk(queries, emb, k=5, n_centroids=16, n_probe=4).collect()
    assert len(ivf) > 0
    for r in ivf:  # every candidate re-ranked with the exact metric
        assert exact[(r.query_id, r.neighbor_id)] == r.score


def test_funnel_window_impls_match_pandas_folds(spark, sf_dir):
    from clickhouseocp_spark.operators.funnel import (
        sequence_match,
        sequence_match_pandas,
        window_funnel,
        window_funnel_pandas,
    )

    ev = load_table(spark, sf_dir, "events")
    conds = [
        F.col("event_type") == "signup",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    args = dict(key="user_id", ts_col="ts", step_conds=conds)
    wf = {(r.user_id, r.level) for r in window_funnel(ev, window_seconds=86400, **args).collect()}
    wfp = {(r.user_id, r.level) for r in window_funnel_pandas(ev, window_seconds=86400, **args).collect()}
    assert wf == wfp
    tc = [("<=", 3600), (">", 60)]
    sm = {(r.user_id, r.matched) for r in sequence_match(ev, time_constraints=tc, **args).collect()}
    smp = {(r.user_id, r.matched) for r in sequence_match_pandas(ev, time_constraints=tc, **args).collect()}
    assert sm == smp


def test_window_funnel_overlapping_conditions(spark):
    from clickhouseocp_spark.operators.funnel import window_funnel, window_funnel_pandas

    # B@1 matches both cond1 and cond2: it must extend A@0's level-1 chain to
    # level 2 (a first-match-only step assignment would report level 1).
    df = _seq_df(spark, [(1, 0, "A"), (1, 1, "B")])
    conds = [F.col("ev").isin("A", "B"), F.col("ev") == "B"]
    for impl in (window_funnel, window_funnel_pandas):
        out = impl(df, "k", "ts", conds, window_seconds=100).collect()
        assert out[0].level == 2, impl.__name__


def test_quantile_timing_state_merge_properties(spark, sf_dir):
    """Merge associativity: states built at any partial granularity merge to
    the identical state; estimates stay within one bucket width of exact."""
    from clickhouseocp_spark.operators.sketches import (
        quantile_timing_estimate,
        quantile_timing_merge,
        quantile_timing_partial,
    )

    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    direct = quantile_timing_partial(ev, keys=("event_type",), col="value")
    via_day = quantile_timing_merge(
        quantile_timing_partial(ev, keys=("event_type", "day"), col="value"),
        keys=("event_type",),
    )
    via_user = quantile_timing_merge(
        quantile_timing_partial(ev, keys=("event_type", "user_id"), col="value"),
        keys=("event_type",),
    )
    d = {r.event_type: r.qt_state for r in direct.collect()}
    for merged in (via_day, via_user):
        m = {r.event_type: r.qt_state for r in merged.collect()}
        assert m == d  # bit-exact state equality, any split

    width = 512.0 / 256
    est = {
        r.event_type: r.q90
        for r in direct.select(
            "event_type", quantile_timing_estimate(0.90).alias("q90")
        ).collect()
    }
    # the state's rank convention is the ceil(q*n)-th order statistic
    # (discrete), so compare to that — midpoint error is bounded by width/2
    exact = {
        r.event_type: r.q90
        for r in ev.groupBy("event_type")
        .agg(
            F.expr(
                "sort_array(collect_list(value))"
                "[cast(ceil(0.90 * count(value)) as int) - 1]"
            ).alias("q90")
        )
        .collect()
    }
    for t, v in exact.items():
        assert abs(est[t] - v) <= width / 2, (t, est[t], v)


def test_quantile_dd_state_merge_properties(spark, sf_dir):
    """DDSketch log-bucket state: merge associativity (bit-exact states from
    any partial split) and the alpha relative-error bound vs the true order
    statistic, over a 6-decade value range no fixed-bin state could cover."""
    from clickhouseocp_spark.operators.sketches import (
        quantile_dd_estimate,
        quantile_dd_merge,
        quantile_dd_partial,
    )

    alpha = 0.01
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    direct = quantile_dd_partial(ev, keys=("event_type",), col="value", alpha=alpha)
    via_day = quantile_dd_merge(
        quantile_dd_partial(ev, keys=("event_type", "day"), col="value", alpha=alpha),
        keys=("event_type",),
    )
    d = {r.event_type: sorted(r.dd_state.items()) for r in direct.collect()}
    m = {r.event_type: sorted(r.dd_state.items()) for r in via_day.collect()}
    assert m == d

    # wide-range synthetic: exp-spaced values spanning ~1e-3 .. 1e3
    wide = spark.range(6000).select(
        F.lit("g").alias("g"),
        F.exp((F.col("id") / 1000.0 - 3.0) * F.lit(2.302585092994046)).alias("v"),
    )
    st = quantile_dd_partial(wide, keys=("g",), col="v", alpha=alpha)
    for q in (0.01, 0.5, 0.9, 0.99):
        est = st.select(quantile_dd_estimate(q, alpha).alias("e")).collect()[0].e
        exact = (
            wide.agg(
                F.expr(
                    f"sort_array(collect_list(v))[cast(ceil({q} * count(v)) as int) - 1]"
                ).alias("x")
            ).collect()[0].x
        )
        assert abs(est / exact - 1.0) <= alpha, (q, est, exact)


def test_quantile_dd_zero_negative_and_empty(spark):
    """Two-sided layout: negatives decode from the mirrored band (sign exact,
    magnitude within alpha), zero from the reserved bucket between the bands;
    NULLs are skipped, so a NULL-only group yields no state row."""
    from clickhouseocp_spark.operators.sketches import (
        quantile_dd_estimate,
        quantile_dd_partial,
    )

    df = spark.createDataFrame(
        [("z", -5.0), ("z", 0.0), ("z", 10.0), ("e", None)], "k string, v double"
    )
    st = quantile_dd_partial(df, keys=("k",), col="v")
    rows = {
        r.k: (r.lo, r.mid, r.hi)
        for r in st.select(
            "k",
            quantile_dd_estimate(0.30).alias("lo"),
            quantile_dd_estimate(0.50).alias("mid"),
            quantile_dd_estimate(0.99).alias("hi"),
        ).collect()
    }
    assert "e" not in rows
    lo, mid, hi = rows["z"]
    assert abs(lo / -5.0 - 1.0) <= 0.01 and lo < 0
    assert mid == 0.0
    assert abs(hi / 10.0 - 1.0) <= 0.01


def test_quantile_dd_negative_range_bound(spark):
    """alpha relative-magnitude bound holds across a mixed-sign 6-decade
    range: rank walking crosses the negative band, zero bucket, and positive
    band in true value order."""
    from clickhouseocp_spark.operators.sketches import (
        quantile_dd_estimate,
        quantile_dd_partial,
    )

    alpha = 0.01
    mixed = spark.range(4001).select(
        F.lit("g").alias("g"),
        (
            F.when(F.col("id") == 2000, 0.0)
            .when(
                F.col("id") < 2000,
                -F.exp((F.col("id") / 500.0 - 2.0) * F.lit(2.302585092994046)),
            )
            .otherwise(
                F.exp(((F.col("id") - 2001) / 500.0 - 2.0) * F.lit(2.302585092994046))
            )
        ).alias("v"),
    )
    st = quantile_dd_partial(mixed, keys=("g",), col="v", alpha=alpha)
    for q in (0.05, 0.25, 0.5, 0.75, 0.95):
        est = st.select(quantile_dd_estimate(q, alpha).alias("e")).collect()[0].e
        exact = (
            mixed.agg(
                F.expr(
                    f"sort_array(collect_list(v))[cast(ceil({q} * count(v)) as int) - 1]"
                ).alias("x")
            ).collect()[0].x
        )
        if exact == 0.0:
            assert est == 0.0, (q, est)
        else:
            assert est * exact > 0 and abs(abs(est / exact) - 1.0) <= alpha, (
                q, est, exact,
            )


def test_point_in_polygon_nonconvex(spark):
    """Ray casting handles the non-convex notch: a point above the notch
    vertex but inside the arrow's wings is IN, the notch cavity itself is
    OUT, and far-away points are OUT."""
    from clickhouseocp_spark.functions.geo import point_in_polygon

    poly = [(-20.0, 0.0), (0.0, 45.0), (20.0, 0.0), (0.0, 12.0)]
    cases = [
        (-10.0, 10.0, True),   # left wing
        (10.0, 10.0, True),    # right wing
        (0.0, 30.0, True),     # above the notch, inside the arrow head
        (0.0, 5.0, False),     # inside the notch cavity
        (0.0, 50.0, False),    # above the apex
        (-25.0, 10.0, False),  # left of everything
    ]
    df = spark.createDataFrame(
        [(x, y) for x, y, _ in cases], "x double, y double"
    )
    got = [
        r.inside
        for r in df.select(
            point_in_polygon(F.col("x"), F.col("y"), poly).alias("inside")
        ).collect()
    ]
    assert got == [e for _, _, e in cases]


def test_bitmap_state_merge_associative(spark, sf_dir):
    """Bitmap states (sorted distinct arrays) merge exactly: any partial
    split unions to the identical bitmap, and the set-algebra identities
    (|A∪B| = |A|+|B|-|A∩B|; XOR = OR minus AND) hold on real data."""
    from clickhouseocp_spark.operators.bitmap import (
        bitmap_and,
        bitmap_cardinality,
        bitmap_merge,
        bitmap_or,
        bitmap_partial,
        bitmap_xor,
    )

    o = load_table(spark, sf_dir, "orders").withColumn(
        "month", F.trunc("o_orderdate", "month")
    )
    direct = bitmap_partial(o, keys=("o_orderpriority",), col="o_custkey")
    via_month = bitmap_merge(
        bitmap_partial(o, keys=("o_orderpriority", "month"), col="o_custkey"),
        keys=("o_orderpriority",),
    )
    d = {r.o_orderpriority: r.bm_state for r in direct.collect()}
    m = {r.o_orderpriority: r.bm_state for r in via_month.collect()}
    assert m == d
    assert all(v == sorted(set(v)) for v in d.values())

    two = direct.limit(2).agg(F.collect_list("bm_state").alias("bms")).select(
        F.col("bms")[0].alias("a"), F.col("bms")[1].alias("b")
    )
    r = two.select(
        bitmap_cardinality(F.col("a")).alias("ca"),
        bitmap_cardinality(F.col("b")).alias("cb"),
        bitmap_cardinality(bitmap_and(F.col("a"), F.col("b"))).alias("cand"),
        bitmap_cardinality(bitmap_or(F.col("a"), F.col("b"))).alias("cor"),
        bitmap_cardinality(bitmap_xor(F.col("a"), F.col("b"))).alias("cxor"),
    ).collect()[0]
    assert r.cor == r.ca + r.cb - r.cand
    assert r.cxor == r.cor - r.cand


def test_topk_state_truncation_keeps_heavy_hitter(spark):
    """Space-saving path: with state truncated to m, a dominant item survives
    partial→merge and its merged count underestimate is bounded by the
    dropped tail mass per partial."""
    from clickhouseocp_spark.operators.sketches import (
        topk_state_merge,
        topk_state_partial,
        topk_state_read,
    )

    # 4 batches × (60 rows of item "hot" + 40 distinct noise items, 1 row each)
    base = spark.range(400).select(
        (F.col("id") % 4).alias("batch"),
        F.when(F.col("id") % 100 < 60, F.lit("hot"))
        .otherwise(F.concat(F.lit("n"), F.col("id").cast("string")))
        .alias("item"),
        F.lit("g").alias("grp"),
    )
    partials = topk_state_partial(base, keys=("grp", "batch"), item_col="item", m=8)
    merged = topk_state_merge(partials, keys=("grp",), m=8)
    top1 = merged.select(topk_state_read(1).alias("t")).collect()[0].t
    item, cnt = top1.split(":")
    assert item == "hot"
    # exact hot count is 240; each of 4 partials drops only count-1 tail items
    assert 240 - 4 * 1 <= int(cnt) <= 240


def test_connected_components_chain_and_singleton(spark):
    """Label propagation crosses a 4-hop chain (diameter > 1 — the case a
    single pair-join can't solve), leaves singletons self-labeled, and keeps
    disjoint components separate."""
    from clickhouseocp_spark.operators.graph import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(1, 9)], "id long")
    # chain 5-4-3-2-1 (worst propagation direction), separate pair 6-7, singleton 8
    edges = spark.createDataFrame(
        [(5, 4), (4, 3), (3, 2), (2, 1), (6, 7)], "id_a long, id_b long"
    )
    got = {
        r.id: r.component
        for r in connected_components(nodes, edges, id_col="id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 6, 7: 6, 8: 8}


# ---------------------------------------------------------------------------
# statistical aggregate family (stats_q) — plan gates
# ---------------------------------------------------------------------------


def test_stats_family_plan_shapes(spark, sf_dir):
    """The stats aggregates must keep their 100 TB shapes: partitioned
    windows (no all-rows single-task window except the documented
    distinct-domain rank pass), bounded shuffle counts, broadcast margins."""
    from clickhouseocp_spark.plans.inspect import formatted_plan, shuffle_count
    from clickhouseocp_spark.queries import all_queries

    qs = all_queries()

    # EMA: window partitioned by user_id, then one hash agg — ≤ 2 shuffles.
    ema = qs["exponential_moving_avg"].fn(spark, sf_dir)
    assert shuffle_count(ema) <= 2
    # the only window spec must be partitioned (no global window)
    plan = formatted_plan(ema)
    for line in plan.splitlines():
        if "Window" in line and "partition" in line.lower():
            break

    # max_intersections: sweep window is partitioned by event_type.
    mi = qs["max_intersections"].fn(spark, sf_dir)
    assert shuffle_count(mi) <= 3

    # cramers V: margins are broadcast back to the cells — no sort-merge join.
    from clickhouseocp_spark.plans.inspect import has_sort_merge_join

    cv = qs["cramers_v_assoc"].fn(spark, sf_dir)
    assert not has_sort_merge_join(cv)

    # t-test: one conditional-aggregation pass over the scan → single shuffle.
    tt = qs["ttest_two_sample"].fn(spark, sf_dir)
    assert shuffle_count(tt) <= 1


def test_mann_whitney_ranks_over_distinct_domain(spark, sf_dir):
    """The rank pass must consume the collapsed distinct-value aggregate, not
    the raw row stream (the scalable rank-statistic shape)."""
    from clickhouseocp_spark.plans.inspect import formatted_plan
    from clickhouseocp_spark.queries import all_queries

    u = all_queries()["mann_whitney_u"].fn(spark, sf_dir)
    plan = formatted_plan(u)
    # an aggregate (distinct-value collapse) must appear below the window
    assert "HashAggregate" in plan and "Window" in plan


# ---------------------------------------------------------------------------
# SemDeDup semantic dedup
# ---------------------------------------------------------------------------


def test_semantic_dedup_removes_planted_copies(spark, sf_dir):
    """Planted exact-direction copies land in the same KMeans cell and must
    be dominated by their lower-id originals; unrelated vectors survive."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.catalog import load_table
    from clickhouseocp_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").limit(200)
    scaled = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(3.0).cast("float")).alias("embedding"),
    )
    marked = semantic_dedup(emb.unionByName(scaled), threshold=0.999, n_clusters=8)
    rows = {r.vec_id: r.kept for r in marked.collect()}
    n = len(rows) // 2
    copies_kept = sum(1 for vid, kept in rows.items() if vid >= 1_000_000 and kept)
    originals_kept = sum(1 for vid, kept in rows.items() if vid < 1_000_000 and kept)
    assert copies_kept == 0          # every planted copy removed
    assert originals_kept == n       # every original survives at tau=0.999


def test_semantic_dedup_plan_has_no_cross_join(spark, sf_dir):
    """The within-cluster pair join must be an equi-join on __cell — the
    all-pairs cartesian shape must not appear anywhere in the plan."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.catalog import load_table
    from clickhouseocp_spark.operators.similarity import semantic_dedup
    from clickhouseocp_spark.plans.inspect import formatted_plan

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    plan = formatted_plan(semantic_dedup(emb, threshold=0.99, n_clusters=8))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pq_planted_duplicates_recalled_at_rank1(spark, sf_dir):
    from clickhouseocp_spark.operators.similarity import pq_topk

    # PQ codes are computed on L2-normalized vectors → a same-direction
    # scaled copy gets the identical code word in every subspace, so its
    # ADC score ties the query's own and exact rerank puts it at rank 1
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    scaled = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0).cast("float")).alias("embedding"),
    )
    corpus = emb.unionByName(scaled)
    queries = emb.filter(F.col("vec_id") < 10)
    out = pq_topk(queries, corpus, k=3, m_subspaces=8, rerank_factor=8)
    top1 = {r.query_id: r.neighbor_id for r in out.collect() if r.rank == 1}
    assert top1 == {q: q + 1_000_000 for q in top1}
    assert len(top1) == queries.count()


def test_pq_scores_are_exact_cosine_and_recall_bound(spark, sf_dir):
    from clickhouseocp_spark.operators.similarity import cosine_topk, pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id): r.score
        for r in cosine_topk(queries, emb, k=10**6).collect()
    }
    pq = pq_topk(queries, emb, k=5, m_subspaces=8, rerank_factor=8).collect()
    assert len(pq) > 0
    for r in pq:  # survivors are re-ranked with the exact metric
        assert exact[(r.query_id, r.neighbor_id)] == r.score
    bf5 = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(queries, emb, k=5).collect()
    }
    hits = sum((r.query_id, r.neighbor_id) in bf5 for r in pq)
    assert hits / len(bf5) > 0.3


def test_bloom_dedup_no_false_negatives_and_bounded_fp(spark, sf_dir):
    from clickhouseocp_spark.operators.dedup_text import bloom_dedup_incremental

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seen = docs.filter(F.col("doc_id") % 2 == 0)
    # incoming = fresh odd docs ∪ planted re-ingests of seen docs (new ids)
    planted = seen.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 1_000_001).alias("doc_id"), "text"
    )
    incoming = docs.filter(F.col("doc_id") % 2 == 1).unionByName(planted)
    out = bloom_dedup_incremental(incoming, seen).collect()
    n = len(out)
    assert n == incoming.count()
    # every planted re-ingest is recovered, and as an exact (verified) dup
    planted_ids = {r.doc_id for r in planted.collect()}
    assert planted_ids == {r.doc_id for r in out if r.doc_id in planted_ids and r.is_dup}
    # Bloom has no false negatives: every exact dup was flagged probable
    assert all(r.bloom_probable for r in out if r.is_dup)
    # FP rate of the probable tier: with m=1Mi bits, k=7, |seen| ~ hundreds,
    # the theoretical fp is ~0; allow a generous 5% margin
    fps = sum(1 for r in out if r.bloom_probable and not r.is_dup)
    assert fps / n < 0.05
    assert any(r.is_dup for r in out) and any(not r.is_dup for r in out)


def test_bloom_build_handles_bit63_words(spark, sf_dir):
    """Regression: bit_or(shiftleft(1L, 63)) yields a NEGATIVE int64 word;
    converting it with np.uint64(word) deprecation-errors on numpy >= 2.
    A tiny filter (2 words, many docs) saturates both words, so bit 63 is
    guaranteed set — the build must survive with warnings-as-errors."""
    import warnings

    import numpy as np

    from clickhouseocp_spark.operators.dedup_text import bloom_filter_build

    docs = load_table(spark, sf_dir, "documents").select("text").limit(200)
    with warnings.catch_warnings():
        warnings.simplefilter("error", DeprecationWarning)
        bitmap = bloom_filter_build(docs, m_bits=128, k_hashes=7)
    assert bitmap.dtype == np.uint64 and len(bitmap) == 2
    top_bit = np.uint64(1) << np.uint64(63)
    assert any(bool(w & top_bit) for w in bitmap)


def test_resize_images_deterministic_shape(spark, sf_dir):
    from clickhouseocp_spark.sources.multimodal import (
        attach_binary_payload,
        resize_image,
        resize_images,
    )
    import pytest as _pytest

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    payloads = attach_binary_payload(docs, "text", "doc_id")
    out = resize_images(payloads, 32, 16).collect()
    assert len(out) == docs.count()
    assert all(r.n_bytes == 32 * 16 for r in out)
    # deterministic across runs
    again = {r.doc_id: bytes(r.resized) for r in resize_images(payloads, 32, 16).collect()}
    assert all(bytes(r.resized) == again[r.doc_id] for r in out)
    with _pytest.raises(NotImplementedError):
        resize_image(b"xx", 4, 4)


def test_ivfpq_planted_duplicates_recalled_at_rank1(spark, sf_dir):
    from clickhouseocp_spark.operators.similarity import ivfpq_topk

    # same-direction scaled copies: identical cell (scale-invariant coarse
    # quantizer) AND identical PQ codes (built on normalized vectors) → the
    # copy survives both tiers and exact rerank puts it at rank 1
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    scaled = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0).cast("float")).alias("embedding"),
    )
    corpus = emb.unionByName(scaled)
    queries = emb.filter(F.col("vec_id") < 10)
    out = ivfpq_topk(queries, corpus, k=3, n_centroids=8, n_probe=3, rerank_factor=8)
    top1 = {r.query_id: r.neighbor_id for r in out.collect() if r.rank == 1}
    assert top1 == {q: q + 1_000_000 for q in top1}
    assert len(top1) == queries.count()


def test_lttb_hand_computed_and_short_series(spark):
    """LTTB picks the hand-computable max-triangle point; short series pass
    through whole; endpoints always kept."""
    from clickhouseocp_spark.operators.downsample import lttb

    rows = [("a", i, x, y) for i, (x, y) in enumerate(
        [(0, 0), (1, 10), (2, 0), (3, 0), (4, 0), (5, 10), (6, 0)]
    )]
    df = spark.createDataFrame(rows, "k string, id int, x long, y long")
    # n_out=3 -> one interior bucket (i=1..5), prev=(0,0), anchor=last (6,0):
    # score = |-6*y|, max at y=10, tie broken by position -> id=1
    got = lttb(df, "x", "y", 3, by=["k"], keep=["id"]).orderBy("sel_seq").collect()
    assert [(r.sel_seq, r.id) for r in got] == [(0, 0), (1, 1), (2, 6)]
    # N <= n_out: all points kept in order
    short = lttb(df, "x", "y", 12, by=["k"], keep=["id"]).orderBy("sel_seq").collect()
    assert [r.id for r in short] == [0, 1, 2, 3, 4, 5, 6]
    import pytest

    with pytest.raises(ValueError, match="n_out"):
        lttb(df, "x", "y", 2, by=["k"])


# ---------------------------------------------------------------------------
# statistical aggregate family, batch 2 (stats_q2)
# ---------------------------------------------------------------------------


def test_kmv_theta_merge_associativity():
    """The KMV theta state (k smallest normalized hashes) merges by
    union+truncate: merging per-partition states must equal the state built
    from all rows at once — the AggregatingMergeTree contract the
    uniq_theta_kmv query relies on."""
    import random

    rng = random.Random(7)
    values = [rng.random() for _ in range(5000)]
    k = 64

    def state(vals):
        return sorted(set(vals))[:k]

    whole = state(values)
    parts = [values[i::7] for i in range(7)]
    merged = state([u for p in parts for u in state(p)])
    assert merged == whole
    # estimate from the merged state matches the whole-state estimate exactly
    assert (k - 1) / merged[k - 1] == (k - 1) / whole[k - 1]


def test_gd_regression_reduces_loss(spark, sf_dir):
    """Full-batch GD (stochastic_linear_regression analog) must reduce the
    quadratic loss vs the zero-weight start, and the returned slope must be
    finite and reproducible across runs (decimal-summed gradients)."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.queries import all_queries

    q = all_queries()["stochastic_linear_regression"]
    r1 = q.fn(spark, sf_dir).first()
    r2 = q.fn(spark, sf_dir).first()
    assert (r1.w, r1.b) == (r2.w, r2.b)  # bitwise reproducible

    from clickhouseocp_spark.catalog import load_table

    pts = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "click")
        .select(
            ((F.col("user_id") % 10).cast("double") / 10.0).alias("x"),
            (F.col("value") / 100.0).alias("y"),
        )
    )
    loss0, loss1 = pts.agg(
        F.avg(F.col("y") * F.col("y")),
        F.avg(
            (F.lit(r1.w) * F.col("x") + F.lit(r1.b) - F.col("y"))
            * (F.lit(r1.w) * F.col("x") + F.lit(r1.b) - F.col("y"))
        ),
    ).first()
    assert loss1 < loss0


def test_group_array_insert_at_slots(spark, sf_dir):
    """The 7 position-addressed slots must sum to the group's row count and
    slot order must be stable (position-addressed, not arrival-ordered)."""
    from clickhouseocp_spark.catalog import load_table
    from clickhouseocp_spark.queries import all_queries

    rows = all_queries()["group_array_insert_at"].fn(spark, sf_dir).collect()
    counts = {
        r.event_type: c
        for r, c in zip(
            rows,
            [sum(int(x) for x in r.dow_counts.split("|")) for r in rows],
        )
    }
    ev = load_table(spark, sf_dir, "events").groupBy("event_type").count()
    expected = {r.event_type: r["count"] for r in ev.collect()}
    assert counts == expected
    assert all(len(r.dow_counts.split("|")) == 7 for r in rows)


def test_stats2_plan_shapes(spark, sf_dir):
    """100 TB shapes for the batch-2 stats aggregates: sum_kahan_count is one
    hash agg (≤1 shuffle); delta_sum_timestamp's window is partitioned by
    user_id; ks_test collapses to the distinct value domain before its
    cumulative window (HashAggregate below Window)."""
    from clickhouseocp_spark.plans.inspect import formatted_plan, shuffle_count
    from clickhouseocp_spark.queries import all_queries

    qs = all_queries()
    assert shuffle_count(qs["sum_kahan_count"].fn(spark, sf_dir)) <= 2
    plan = formatted_plan(qs["delta_sum_timestamp"].fn(spark, sf_dir))
    assert "Window" in plan
    ks = formatted_plan(qs["ks_test_two_sample"].fn(spark, sf_dir))
    assert "HashAggregate" in ks and "Window" in ks


# ---------------------------------------------------------------------------
# NSW graph ANN (vector-similarity-index analog)
# ---------------------------------------------------------------------------


def test_nsw_recall_planted_and_deterministic(spark, sf_dir):
    """Shard-local NSW graphs must (a) beat the 0.6 recall contract vs exact
    brute force, (b) recall a planted same-direction duplicate at rank 1
    (it lands in the same shard-agnostic candidate merge with cosine 1.0),
    and (c) be bitwise deterministic across runs (no RNG in build/search)."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.catalog import load_table
    from clickhouseocp_spark.operators.similarity import nsw_topk
    from clickhouseocp_spark.queries.llm import similarity_topk_nsw_pairs

    bf = {
        (r.query_id, r.neighbor_id)
        for r in QS["similarity_topk"].fn(spark, sf_dir).collect()
    }
    nsw = {
        (r.query_id, r.neighbor_id)
        for r in similarity_topk_nsw_pairs(spark, sf_dir).collect()
    }
    assert len(bf & nsw) / len(bf) > 0.6

    # determinism: identical result set on a second run
    nsw2 = {
        (r.query_id, r.neighbor_id)
        for r in similarity_topk_nsw_pairs(spark, sf_dir).collect()
    }
    assert nsw == nsw2

    # planted duplicate at rank 1: a x2-scaled copy of query 3 (same
    # direction -> cosine 1.0) must surface as its top neighbor
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copy = emb.filter(F.col("vec_id") == 3).select(
        F.lit(9_000_003).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x * F.lit(2.0).cast("float")
        ).alias("embedding"),
    )
    corpus = emb.unionByName(copy)
    q = emb.filter(F.col("vec_id") == 3)
    top = (
        nsw_topk(q, corpus, k=3, n_shards=4)
        .orderBy("rank")
        .collect()
    )
    assert top[0].neighbor_id == 9_000_003 and top[0].score >= 0.999999


def test_nsw_persisted_index_round_trip(spark, sf_dir, tmp_path):
    """build_nsw_index -> parquet -> nsw_topk_from_index must equal the
    build-and-search-in-one-job nsw_topk (same build params), proving the
    persisted graph is the whole index state (CH 25.x usearch-persistence
    analog)."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.catalog import load_table
    from clickhouseocp_spark.operators.similarity import (
        build_nsw_index,
        nsw_topk,
        nsw_topk_from_index,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "nsw_index")
    build_nsw_index(emb, n_shards=4).write.partitionBy("__shard").parquet(path)
    idx = spark.read.parquet(path)
    got = {
        (r.query_id, r.rank): r.neighbor_id
        for r in nsw_topk_from_index(q, idx, k=5).collect()
    }
    want = {
        (r.query_id, r.rank): r.neighbor_id
        for r in nsw_topk(q, emb, k=5, n_shards=4).collect()
    }
    assert got == want and len(want) == 25


def test_bm25_hand_computed(spark):
    """BM25 on a 3-doc corpus against hand-computed scores: the idf must
    penalize the ubiquitous term, tf saturation must apply, and ranking must
    prefer the document where the rare query term is dense."""
    import math

    from clickhouseocp_spark.operators.ranking import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana banana banana"),
            (3, "apple cherry"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(1, "apple")], "query_id int, query_text string")
    got = {r.doc_id: (r.score, r.rank) for r in bm25_topk(docs, q, k=3).collect()}
    # N=3, df(apple)=2 -> idf = ln(1 + 1.5/2.5); avgdl = 8/3
    idf = math.log(1 + 1.5 / 2.5)

    def s(tf, dl):
        return round(
            round(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (8 / 3))), 8), 6
        )

    assert set(got) == {1, 3}  # doc 2 has no query term
    assert got[1] == (s(2, 3), 1)
    assert got[3] == (s(1, 2), 2)


def test_stream_sketch_rollup_state_equals_batch_state(spark, sf_dir, tmp_path):
    """The streamed DDSketch state table must EQUAL the batch-built state
    (bucket-for-bucket), proving the foreachBatch merge is the exact
    associative -State merge, not an approximation of it."""
    from clickhouseocp_spark.catalog import load_table
    from clickhouseocp_spark.operators.sketches import quantile_dd_partial
    from clickhouseocp_spark.streaming.pipeline import (
        events_stream,
        foreach_batch_sketch_rollup,
    )

    target = str(tmp_path / "state")
    foreach_batch_sketch_rollup(events_stream(spark, sf_dir), target, alpha=0.05)
    streamed = {
        r.event_type: dict(r.dd_state)
        for r in spark.read.parquet(target).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    batch = {
        r.event_type: dict(r.dd_state)
        for r in quantile_dd_partial(
            ev, ["event_type"], "value", alpha=0.05
        ).collect()
    }
    assert streamed == batch


def test_round4_plan_shapes(spark, sf_dir):
    """100 TB gates for the round-4 operators: BM25's query-term and df joins
    broadcast (no sort-merge join anywhere in the plan); the NSW pipeline is
    one shuffle on the shard key before the kernel; exp_time_decayed has no
    global sort."""
    from clickhouseocp_spark.plans.inspect import (
        formatted_plan,
        has_sort_merge_join,
        shuffle_count,
    )
    from clickhouseocp_spark.queries import all_queries

    qs = all_queries()
    bm25 = qs["bm25_retrieve"].fn(spark, sf_dir)
    assert not has_sort_merge_join(bm25)

    from pyspark.sql import functions as F

    from clickhouseocp_spark.catalog import load_table
    from clickhouseocp_spark.operators.similarity import nsw_topk

    emb = load_table(spark, sf_dir, "embeddings")
    nsw = nsw_topk(emb.filter(F.col("vec_id") < 3), emb, k=3, n_shards=4)
    # shard exchange + final top-k window exchange — nothing else
    assert shuffle_count(nsw) <= 2

    etd = formatted_plan(qs["exp_time_decayed_sum"].fn(spark, sf_dir))
    assert "Window" in etd  # partitioned max, no global Sort-only stage


def test_window_funnel_strict_order_semantics(spark):
    """Hand-computed strict_order: A->B->D->C stops at D (level 2), while a
    clean A->B->C run reaches 3; the default mode still finds 3 through the
    interleaved event."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.operators.funnel import (
        window_funnel,
        window_funnel_strict_order,
    )

    rows = [
        # user 1: A B D C  -> strict_order level 2 (D interrupts), default 3
        (1, "2024-01-01 00:00:01", 1, "A"),
        (1, "2024-01-01 00:00:02", 2, "B"),
        (1, "2024-01-01 00:00:03", 3, "D"),
        (1, "2024-01-01 00:00:04", 4, "C"),
        # user 2: A B C -> 3 in both modes
        (2, "2024-01-01 00:00:01", 5, "A"),
        (2, "2024-01-01 00:00:02", 6, "B"),
        (2, "2024-01-01 00:00:03", 7, "C"),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts string, event_id int, et string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    conds = [F.col("et") == "A", F.col("et") == "B", F.col("et") == "C"]
    # D participates in the stream only if it matches a condition — to model
    # interruption, include D as a funnel-relevant event via a 4th condition?
    # No: strict_order interruption applies to rows IN the aggregate's input,
    # so feed all four event types and conds for A/B/C only... D matches no
    # cond and is filtered; interruption needs D to match SOME cond. Use
    # conds where D matches step 2's complement: make step2 = B-or-D? CH
    # feeds every input row; our operator filters to any-cond matches. Model
    # CH exactly by passing a cond that admits D at a wrong position:
    conds_with_d = [
        F.col("et") == "A",
        F.col("et").isin("B"),
        F.col("et").isin("C", "D"),
    ]
    # user 1 stream: A(1) B(2) D(3-matches cond3) C(3): consecutive A,B,D
    # IS a valid 3-chain under conds_with_d -> level 3; under plain conds the
    # D row is filtered out so A,B,C are consecutive -> also 3.
    so = {
        r.user_id: r.level
        for r in window_funnel_strict_order(
            df, "user_id", "ts", conds, 7 * 86400, tiebreak_col="event_id"
        ).collect()
    }
    assert so == {1: 3, 2: 3}  # D filtered (matches no cond) -> consecutive

    # now make D a funnel event that sits INSIDE the stream but matches only
    # step 1 — it breaks user 1's B->C adjacency
    conds2 = [F.col("et").isin("A", "D"), F.col("et") == "B", F.col("et") == "C"]
    so2 = {
        r.user_id: r.level
        for r in window_funnel_strict_order(
            df, "user_id", "ts", conds2, 7 * 86400, tiebreak_col="event_id"
        ).collect()
    }
    default2 = {
        r.user_id: r.level
        for r in window_funnel(df, "user_id", "ts", conds2, 7 * 86400).collect()
    }
    assert so2[1] == 2 and default2[1] == 3  # interruption vs default
    assert so2[2] == 3 and default2[2] == 3


def test_geohash_known_vectors_and_column_form(spark):
    """geohashEncode/Decode against published test vectors, plus the
    Arrow-batched column form and encode->decode round trip."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.functions.geo import (
        geohash_decode_py,
        geohash_encode,
        geohash_encode_py,
    )

    assert geohash_encode_py(10.40744, 57.64911, 11) == "u4pruydqqvj"
    assert geohash_encode_py(-5.6, 42.6, 5) == "ezs42"
    lon, lat = geohash_decode_py("u4pruydqqvj")
    assert abs(lon - 10.40744) < 1e-4 and abs(lat - 57.64911) < 1e-4

    df = spark.createDataFrame(
        [(10.40744, 57.64911), (-5.6, 42.6)], "lon double, lat double"
    )
    got = [r.gh for r in df.select(geohash_encode("lon", "lat", 5).alias("gh")).collect()]
    assert got == ["u4pru", "ezs42"]


def test_geohash_sql_fold_matches_python_grid(spark):
    """The round-10 SQL-expression geohash fold (geohash_encode_sql /
    geohash_decode_sql — zero-Python, shared by both text dialects) is
    BITWISE-identical to the python reference over a dense global grid
    at precisions 1, 5, and 12, and decode inverts encode to the cell
    midpoint."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.functions.geo import (
        geohash_decode_py,
        geohash_decode_sql,
        geohash_encode_py,
        geohash_encode_sql,
    )

    pts = [
        (lon + 0.123, lat + 0.457)
        for lon in range(-180, 180, 37)
        for lat in range(-90, 90, 23)
    ]
    df = spark.createDataFrame(pts, "lon double, lat double")
    cols = [
        F.expr(geohash_encode_sql("lon", "lat", p)).alias(f"g{p}")
        for p in (1, 5, 12)
    ] + [
        F.expr(
            geohash_decode_sql(geohash_encode_sql("lon", "lat", 7))
        ).alias("back")
    ]
    rows = df.select("lon", "lat", *cols).collect()
    assert len(rows) == len(pts)
    for r in rows:
        for p in (1, 5, 12):
            assert r[f"g{p}"] == geohash_encode_py(r.lon, r.lat, p)
        elon, elat = geohash_decode_py(geohash_encode_py(r.lon, r.lat, 7))
        assert abs(r.back.lon - elon) < 1e-12
        assert abs(r.back.lat - elat) < 1e-12
    # NULL/empty guard: full-globe midpoint, not a runtime error
    empty = geohash_decode_sql("''")
    z = spark.sql(f"SELECT {empty} AS z").first()
    assert (z.z.lon, z.z.lat) == (0.0, 0.0)


def test_fulltext_index_persisted_and_pruned(spark, sf_dir, tmp_path):
    """Full-text inverted-index analog (operators/fulltext.py, round 6):
    the persisted postings table partitioned by token_bucket answers
    searches as PARTITION-PRUNED reads — the plan touches only the queried
    tokens' bucket partitions, and results equal both the in-memory index
    path and a hasToken scan of the corpus."""
    import os

    from clickhouseocp_spark.catalog import load_table
    from clickhouseocp_spark.operators.fulltext import (
        build_fulltext_index,
        hasToken,
        search_fulltext,
        tokenize,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    idx = build_fulltext_index(docs, n_buckets=16)
    path = str(tmp_path / "ft_idx")
    idx.write.partitionBy("token_bucket").parquet(path)
    persisted = spark.read.parquet(path)

    got_any = search_fulltext(persisted, ["vector", "stream"], mode="any", n_buckets=16)
    got_all = search_fulltext(persisted, ["vector", "stream"], mode="all", n_buckets=16)

    # ground truth via the scalar scan path the index accelerates
    want_any = {
        r.doc_id
        for r in docs.filter(
            hasToken("text", "vector") | hasToken("text", "stream")
        ).select("doc_id").collect()
    }
    want_all = {
        r.doc_id
        for r in docs.filter(
            hasToken("text", "vector") & hasToken("text", "stream")
        ).select("doc_id").collect()
    }
    assert {r.doc_id for r in got_any.collect()} == want_any and want_any
    assert {r.doc_id for r in got_all.collect()} == want_all and want_all

    # partition pruning: Catalyst constant-folds pmod(xxhash64(lit), n) and
    # the scan plans literal PartitionFilters — at most 2 of the 16 bucket
    # dirs are read (inputFiles() reports pre-pruning, so assert the plan)
    from clickhouseocp_spark.plans.inspect import formatted_plan

    import re as _re

    n_parts = len([d for d in os.listdir(path) if d.startswith("token_bucket=")])
    assert n_parts > 2  # the corpus really spreads across buckets
    plan = formatted_plan(got_any)
    pf = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "token_bucket" in pf.group(1), plan
    assert pf.group(1).count("=") <= 2  # ≤ 2 literal bucket comparisons
    assert "In(token, [stream,vector])" in plan  # token filter pushed too

    # tokenizer semantics: exact token membership, not substring
    row = spark.range(1).select(
        hasToken(F.lit("a bc d"), "b").alias("sub"),
        hasToken(F.lit("a bc d"), "bc").alias("tok"),
        F.size(tokenize(F.lit("x,y;;z 9"))).alias("n"),
    ).first()
    assert row.sub is False and row.tok is True and row.n == 4


def test_pca_fit_project_matches_numpy(spark, sf_dir):
    """pca_fit's distributed partial-Gram path must agree with a direct
    numpy PCA on the collected matrix; pca_project must equal (X - mu) @ W.T
    and satisfy the Eckart-Young residual identity."""
    import numpy as np

    from clickhouseocp_spark.catalog import load_table
    from clickhouseocp_spark.operators.pca import pca_fit, pca_project

    emb = load_table(spark, sf_dir, "embeddings")
    k = 4
    model = pca_fit(emb, "embedding", k)

    rows = emb.select("vec_id", "embedding").collect()
    x = np.asarray([r.embedding for r in rows], dtype=np.float64)
    mu = x.mean(axis=0)
    cov = ((x - mu).T @ (x - mu)) / x.shape[0]
    evals = np.linalg.eigvalsh(cov)[::-1]

    assert np.allclose(model.mean, mu, atol=1e-9)
    assert np.allclose(model.explained_variance, evals[:k], rtol=1e-8, atol=1e-10)
    # orthonormal, descending, ratio bounded
    assert np.allclose(model.components @ model.components.T, np.eye(k), atol=1e-9)
    assert np.all(np.diff(model.explained_variance) <= 1e-12)
    assert 0 < model.explained_variance_ratio.sum() <= 1.0 + 1e-12

    proj_rows = {
        r.vec_id: np.asarray(r.pca)
        for r in pca_project(emb, "embedding", model).select("vec_id", "pca").collect()
    }
    direct = (x - mu) @ model.components.T
    for i, r in enumerate(rows):
        assert np.allclose(proj_rows[r.vec_id], direct[i], atol=1e-9)
    # Eckart-Young: mean residual == tail eigenvalue mass
    resid = x - mu - direct @ model.components
    assert np.isclose(
        (resid * resid).sum(axis=1).mean(), evals[k:].sum(), rtol=1e-8
    )
    # k clamps to d
    assert pca_fit(emb.limit(50), "embedding", 1000).components.shape[0] == 64


def test_dsir_prefers_target_like_docs(spark):
    """Planted signal: raw docs drawn from the target vocabulary must
    outscore docs from a disjoint vocabulary, and Gumbel-top-k keeps the
    target-like tier."""
    from clickhouseocp_spark.operators.dsir import dsir_select, dsir_weights

    rows = []
    for i in range(40):  # target-like: words the target corpus uses
        rows.append((i, "alpha beta gamma delta " * 5))
    for i in range(40, 80):  # off-distribution
        rows.append((i, "zork quux blarg wibble " * 5))
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(1000 + i, "alpha beta gamma delta epsilon " * 4) for i in range(10)],
        "doc_id long, text string",
    )
    w = {r.doc_id: r.logw for r in dsir_weights(raw, target).collect()}
    assert len(w) == 80
    assert min(w[i] for i in range(40)) > max(w[i] for i in range(40, 80))
    picked = {r.doc_id for r in dsir_select(raw, target, k=30).collect()}
    assert picked <= set(range(40))  # Gumbel noise never bridges the gap here
    # determinism: second run selects the identical set
    assert picked == {r.doc_id for r in dsir_select(raw, target, k=30).collect()}


def test_dsir_target_flag_equals_two_frame_fit(spark):
    """r16: when the target is a filtered subset of raw, the target_flag
    path (single tokenization, flag-conditional fit counts) must reproduce
    the two-frame fit row-for-row — weights AND selection."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.operators.dsir import dsir_select, dsir_weights

    rows = []
    for i in range(60):
        lang = "en" if i % 3 == 0 else "de"
        text = ("alpha beta gamma " if i % 3 == 0 else "zork quux blarg ") * 4
        rows.append((i, lang, text + f"tail{i}"))
    rows.append((60, "en", ""))  # zero-token doc drops out either way
    raw = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    flag = F.col("lang") == "en"
    two = dsir_weights(raw, raw.filter(flag))
    one = dsir_weights(raw, None, target_flag=flag)
    assert two.exceptAll(one).count() == 0
    assert one.exceptAll(two).count() == 0
    sel_two = dsir_select(raw, raw.filter(flag), k=10).collect()
    sel_one = dsir_select(raw, None, k=10, target_flag=flag).collect()
    assert [tuple(r) for r in sel_two] == [tuple(r) for r in sel_one]


def test_int8_quantize_roundtrip(spark, sf_dir):
    """Codes in [-127, 127], dequantization error <= scale/2, zero vector
    quantizes to NULL scale."""
    import numpy as np

    from clickhouseocp_spark.catalog import load_table
    from clickhouseocp_spark.functions.vector import int8_dequantize, int8_quantize

    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    out = emb.select(
        "vec_id", "embedding",
        int8_quantize("embedding").alias("qs"),
    ).withColumn("dq", int8_dequantize("qs")).collect()
    for r in out:
        q = np.asarray(r.qs.q)
        assert q.min() >= -127 and q.max() <= 127
        err = np.abs(np.asarray(r.embedding, dtype=np.float64) - np.asarray(r.dq))
        assert err.max() <= r.qs.scale / 2 + 1e-12
    z = (
        spark.createDataFrame([([0.0, 0.0],)], "embedding array<double>")
        .select(int8_quantize("embedding").alias("qs"))
        .first()
    )
    assert z.qs.scale is None


def test_bpe_learn_matches_reference(spark):
    """bpe_learn's distributed merge sequence must equal an independent
    in-memory reference (straightforward dict counting, same tiebreak), and
    bpe_encode must apply merges in learned order."""
    from clickhouseocp_spark.operators.bpe import (
        EOW,
        bpe_encode,
        bpe_learn,
        word_frequency_table,
    )

    vocab = {"low": 5, "lower": 2, "newest": 6, "widest": 3}

    def ref_learn(vocab, n):
        syms = {w: list(w) + [EOW] for w in vocab}
        merges = []
        for _ in range(n):
            counts = {}
            for w, cnt in vocab.items():
                s = syms[w]
                for i in range(len(s) - 1):
                    counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + cnt
            if not counts:
                break
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            merges.append(best)
            a, b = best
            for w in syms:
                s, out, i = syms[w], [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                syms[w] = out
        return merges

    words = spark.createDataFrame(list(vocab.items()), "w string, cnt long")
    got = bpe_learn(words, 6)
    assert got == ref_learn(vocab, 6)

    docs = spark.createDataFrame([(1, "newest low lowest")], "doc_id long, text string")
    toks = bpe_encode(docs, "text", got).first().bpe
    # round trip + one EOW token per word
    assert "".join(t.replace(EOW, "") for t in toks) == "newestlowlowest"
    assert sum(EOW in t for t in toks) == 3
    # the corpus word-frequency path produces the same counts
    wf = {
        r.w: r.cnt
        for r in word_frequency_table(
            spark.createDataFrame(
                [("low low, NEWEST!  widest low",)], "text string"
            ),
            "text",
        ).collect()
    }
    assert wf == {"low": 3, "newest": 1, "widest": 1}


def test_porter_stem_properties(spark):
    """Porter edges beyond the pinned paper vectors: <=2-letter words pass
    through, y-as-vowel handling, NULL propagation, non-English rejected."""
    import pytest

    from clickhouseocp_spark.functions.text import porter_stem_py, stem

    assert porter_stem_py("be") == "be" and porter_stem_py("a") == "a"
    assert porter_stem_py("sky") == "sky"  # y after consonant = vowel, m=0
    assert porter_stem_py("feed") == "feed"  # eed with m=0 keeps the d
    assert porter_stem_py("controll") == "control"  # 5b double-l
    rows = spark.createDataFrame(
        [("running",), (None,)], "w string"
    ).select(stem("w").alias("s")).collect()
    assert rows[0].s == "run" and rows[1].s is None
    with pytest.raises(ValueError, match="en"):
        stem("w", lang="fr")


def test_round6_operator_plan_gates(spark, sf_dir):
    """Plan shapes for the round-6 operators: DSIR must broadcast the
    1024-row ratio table and select via distributed TakeOrdered (no global
    sort, no sort-merge join); make-series must contain no Join at all
    (the gap fill is a map lookup, not a calendar join)."""
    from clickhouseocp_spark.queries import all_queries

    qs = all_queries()
    dsir = qs["dsir_select_topk"].fn(spark, sf_dir)
    plan = dsir._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan

    mk = qs["kql_make_series"].fn(spark, sf_dir)
    p2 = mk._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in p2


def test_hilbert_properties_16bit():
    """Driver-side property check at the DEFAULT 16-bit width on a sampled
    diagonal band (the registry query certifies the full 4-bit grid):
    roundtrip + locality (nearby d ⇒ nearby points is false in general, but
    nearby points share long key prefixes more often than morton — checked
    via the weaker exact roundtrip + known bits=1 curve)."""
    from clickhouseocp_spark.functions.geo import (
        hilbert_decode_py,
        hilbert_encode_py,
    )

    assert [hilbert_encode_py(x, y, 1) for x, y in
            [(0, 0), (0, 1), (1, 1), (1, 0)]] == [0, 1, 2, 3]
    for x, y in [(0, 0), (65535, 65535), (12345, 54321), (65535, 0)]:
        assert hilbert_decode_py(hilbert_encode_py(x, y, 16), 16) == (x, y)


def test_sequence_match_events_greedy_chain(spark):
    """sequenceMatchEvents subset: greedy-earliest chain timestamps, strict
    ts increase between steps, NULL when no full chain."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.operators.funnel import sequence_match_events

    df = spark.createDataFrame(
        [
            # u1: full chain; a second earlier B before A must be skipped
            (1, "2024-01-01 00:00:00", "B"),
            (1, "2024-01-01 00:01:00", "A"),
            (1, "2024-01-01 00:02:00", "B"),
            (1, "2024-01-01 00:03:00", "C"),
            # u2: chain order broken (C before B)
            (2, "2024-01-01 00:00:00", "A"),
            (2, "2024-01-01 00:01:00", "C"),
            # u3: simultaneous A and B → strict increase rejects the pair
            (3, "2024-01-01 00:00:00", "A"),
            (3, "2024-01-01 00:00:00", "B"),
        ],
        "u int, ts_s string, t string",
    ).selectExpr("u", "CAST(ts_s AS TIMESTAMP) AS ts", "t")
    out = {
        r.u: r.events
        for r in sequence_match_events(
            df, "u", "ts",
            [F.col("t") == "A", F.col("t") == "B", F.col("t") == "C"],
        ).collect()
    }
    assert [x.isoformat() for x in out[1]] == [
        "2024-01-01T00:01:00", "2024-01-01T00:02:00", "2024-01-01T00:03:00"
    ]
    assert out[2] is None
    assert out[3] is None


def test_batch11_scalar_functions(spark):
    """formatReadableDecimalSize / toStartOfIntervalOrigin / mapSort /
    arrayZipUnaligned planted-value checks."""
    import pytest
    from pyspark.sql import functions as F

    from clickhouseocp_spark.functions import clickhouse_names as ch

    df = spark.createDataFrame([(1,)], "x int")
    row = df.select(
        ch.formatReadableDecimalSize(F.lit(1)).alias("b"),
        ch.formatReadableDecimalSize(F.lit(1234)).alias("kb"),
        ch.formatReadableDecimalSize(F.lit(1_230_000_000)).alias("gb"),
        ch.toStartOfIntervalOrigin(
            F.lit("2024-01-01 10:00:00").cast("timestamp"),
            "45 minute",
            F.lit("2024-01-01 00:17:00").cast("timestamp"),
        ).alias("bkt"),
        F.map_keys(
            ch.mapSort(F.expr("map('b', 2, 'a', 1, 'c', 3)"))
        ).alias("mk"),
        F.map_keys(
            ch.mapReverseSort(F.expr("map('b', 2, 'a', 1, 'c', 3)"))
        ).alias("mrk"),
        ch.arrayZipUnaligned(
            F.expr("array(1, 2, 3)").alias("p"), F.expr("array(9)").alias("q")
        ).alias("z"),
    ).first()
    assert row.b == "1.00 B"
    assert row.kb == "1.23 KB"
    assert row.gb == "1.23 GB"
    # 00:17 origin grid: bucket containing 10:00 starts 09:17
    assert row.bkt.isoformat() == "2024-01-01T09:17:00"
    assert row.mk == ["a", "b", "c"] and row.mrk == ["c", "b", "a"]
    assert [(p[0], p[1]) for p in row.z] == [(1, 9), (2, None), (3, None)]
    with pytest.raises(ValueError, match="subset"):
        ch.toStartOfIntervalOrigin(F.lit("x"), "1 month", F.lit("y"))


def test_canonicalize_url(spark):
    """URL canonicalization: case, default ports, fragments, tracking
    params, param order, trailing slash."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.functions.text import canonicalize_url

    cases = [
        (0, "https://WWW.Example.COM:443/Posts/7/?utm_source=x&b=2&a=1#f",
         "https://www.example.com/Posts/7?a=1&b=2"),
        (1, "https://www.example.com/Posts/7?a=1&b=2&fbclid=zzz",
         "https://www.example.com/Posts/7?a=1&b=2"),
        (2, "http://example.com:80/", "http://example.com"),
        (3, "http://example.com:8080/x?ref=abc", "http://example.com:8080/x"),
        (4, "HTTPS://h.io/a/b/", "https://h.io/a/b"),
    ]
    df = spark.createDataFrame([(i, u) for i, u, _e in cases], "i int, url string")
    got = {r.i: r.c for r in df.select("i", canonicalize_url("url").alias("c")).collect()}
    for i, _u, expected in cases:
        assert got[i] == expected, (i, got[i], expected)


def test_bpe_learn_tiers_agree(spark):
    """The driver-local tier (vocab fits) and the distributed loop must
    produce the IDENTICAL merge sequence — the tier switch is a cost
    decision, never a semantics change."""
    from clickhouseocp_spark.operators.bpe import bpe_learn

    vocab = {"aaab": 4, "abab": 3, "banana": 5, "bandana": 2, "naan": 7}
    words = spark.createDataFrame(list(vocab.items()), "w string, cnt long")
    local = bpe_learn(words, 7)  # vocab of 5 → driver tier
    dist = bpe_learn(words, 7, driver_max_vocab=0)  # force distributed loop
    assert local == dist and len(local) == 7


def test_ip_uuid_ulid_functions(spark):
    """Batch-12 conversion families: planted-value checks incl. the ULID
    spec example timestamps and CIDR boundary math."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.functions import clickhouse_names as ch

    df = spark.createDataFrame([(1,)], "x int")
    r = df.select(
        ch.isIPv4String(F.lit("192.168.1.300")).alias("bad4"),
        ch.isIPv6String(F.lit("2001:db8::1")).alias("ok6"),
        ch.isIPv6String(F.lit("2001:db8:::1")).alias("bad6"),
        ch.isIPv6String(F.lit("::ffff:192.0.2.1")).alias("v4map"),
        ch.toIPv4OrNull(F.lit("1.2.3.4")).alias("num"),
        ch.toIPv4OrNull(F.lit("1.2.3.400")).alias("numbad"),
        ch.IPv4CIDRToRange(F.lit(3232235877), F.lit(24)).alias("rng"),
        ch.UUIDNumToString(
            ch.UUIDStringToNum(F.lit("01234567-89AB-CDEF-0123-456789abcdef"))
        ).alias("uu"),
        F.unix_millis(
            ch.ULIDStringToDateTime(F.lit("01AN4Z07BY79KA1307SR9X4MV3"))
        ).alias("ulid_ms"),
    ).first()
    assert (r.bad4, r.ok6, r.bad6, r.v4map) == (0, 1, 0, 1)
    assert r.num == 16909060 and r.numbad is None
    assert (r.rng.lo, r.rng.hi) == ("192.168.1.0", "192.168.1.255")
    assert r.uu == "01234567-89ab-cdef-0123-456789abcdef"
    assert r.ulid_ms == 1465824320894  # Crockford decode of the spec example


def test_simhash_minhash_reference(spark):
    """md5-based simhash64/minhash_pair match an independent in-memory
    reference bit-for-bit, and near-identical texts land within a small
    Hamming distance while unrelated texts don't."""
    import hashlib

    from pyspark.sql import functions as F

    from clickhouseocp_spark.functions.text import (
        char_shingles,
        md5_hash64,
        minhash_pair,
        simhash64,
    )

    def py_h64(g):
        v = int(hashlib.md5(g.encode()).hexdigest()[:16], 16)
        return v - (1 << 64) if v >= (1 << 63) else v

    def py_simhash(grams):
        acc = [0] * 64
        for g in grams:
            h = py_h64(g) & ((1 << 64) - 1)
            for b in range(64):
                acc[b] += 1 if (h >> b) & 1 else -1
        v = 0
        for b in range(64):
            if acc[b] > 0:
                v |= 1 << b
        return v - (1 << 64) if v >= (1 << 63) else v

    t1 = "the quick brown fox jumps over the lazy dog again and again"
    t2 = t1.replace("lazy", "hazy")  # near-duplicate
    t3 = "completely different content about databases and spark plans"
    df = spark.createDataFrame([(1, t1), (2, t2), (3, t3)], "i int, t string")
    rows = {
        r.i: r
        for r in df.select(
            "i",
            simhash64(char_shingles("t", 3)).alias("sh"),
            minhash_pair(char_shingles("t", 3)).alias("mh"),
            md5_hash64(F.col("t")).alias("h"),
        ).collect()
    }
    grams1 = [t1[i : i + 3] for i in range(len(t1) - 2)]
    assert rows[1].sh == py_simhash(grams1)
    hs = [py_h64(g) for g in grams1]
    assert (rows[1].mh.mn, rows[1].mh.mx) == (min(hs), max(hs))
    assert rows[1].h == py_h64(t1)

    def ham(a, b):
        return bin((a & (1 << 64) - 1) ^ (b & (1 << 64) - 1)).count("1")

    assert ham(rows[1].sh, rows[2].sh) <= 12  # near-dup: few bits flip
    assert ham(rows[1].sh, rows[3].sh) >= 20  # unrelated: ~32 expected
    # empty gram set → simhash 0, minhash NULLs
    r0 = spark.createDataFrame([("ab",)], "t string").select(
        simhash64(char_shingles("t", 3)).alias("sh"),
        minhash_pair(char_shingles("t", 3)).alias("mh"),
    ).first()
    assert r0.sh == 0 and r0.mh.mn is None and r0.mh.mx is None


def test_cluster_balanced_sample(spark):
    """Temperature balancing: head cluster capped, tail cluster guaranteed
    at least one row; selection deterministic across invocations."""
    from clickhouseocp_spark.operators.packing import cluster_balanced_sample

    rows = [(i, 0) for i in range(90)] + [(100 + i, 1) for i in range(9)] + [(200, 2)]
    df = spark.createDataFrame(rows, "id int, c int")
    out = cluster_balanced_sample(df, "c", "id", total_budget=20, alpha=0.5)
    got = {r.c: r.budget_c for r in out.select("c", "budget_c").distinct().collect()}
    # sqrt weights: 90→9.49, 9→3, 1→1 (S≈13.49); budgets ≈ 14, 4, 1
    assert got[0] > got[1] > 0 and got[2] == 1
    assert got[0] < 90  # head cluster flattened, not proportional
    sel1 = sorted(r.id for r in out.collect())
    sel2 = sorted(
        r.id for r in cluster_balanced_sample(df, "c", "id", 20, 0.5).collect()
    )
    assert sel1 == sel2  # no RNG state — reproducible
    # alpha=1 → proportional: head budget grows
    prop = cluster_balanced_sample(df, "c", "id", 20, alpha=1.0)
    got1 = {r.c: r.budget_c for r in prop.select("c", "budget_c").distinct().collect()}
    assert got1[0] > got[0]


def test_round7_pipeline_plan_shapes(spark, sf_dir):
    """100 TB plan gates for the round-7 pipeline ops: the balanced
    sampler's budget table broadcasts (no shuffle for the dim side), and
    the bigram LM's vocab-size 1-row aggregate broadcasts."""
    from clickhouseocp_spark.plans.inspect import formatted_plan
    from clickhouseocp_spark.queries import all_queries

    qs = all_queries()
    plan = formatted_plan(qs["cluster_balanced_sample"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    plan = formatted_plan(qs["text_bigram_logprob"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    # URL-canonical dedup: one hash-agg exchange, no join at all
    from clickhouseocp_spark.plans.inspect import shuffle_count

    df = qs["url_canonical_dedup"].fn(spark, sf_dir)
    assert shuffle_count(df) == 1, formatted_plan(df)
    assert "Join" not in df._jdf.queryExecution().executedPlan().toString()


def test_round7_edge_cases(spark):
    """Round-7 edges: lowercase ULIDs decode identically (Crockford is
    case-insensitive), canonicalize_url propagates NULL, and the AVI
    decoder handles a single-frame container."""
    import numpy as np
    from pyspark.sql import functions as F

    from clickhouseocp_spark.functions import clickhouse_names as ch
    from clickhouseocp_spark.functions.text import canonicalize_url
    from clickhouseocp_spark.sources.avicodec import decode_avi_mjpeg, encode_avi_mjpeg

    r = spark.createDataFrame([(1,)], "x int").select(
        F.unix_millis(
            ch.ULIDStringToDateTime(F.lit("01an4z07by79ka1307sr9x4mv3"))
        ).alias("lo"),
        F.unix_millis(
            ch.ULIDStringToDateTime(F.lit("01AN4Z07BY79KA1307SR9X4MV3"))
        ).alias("up"),
        canonicalize_url(F.lit(None).cast("string")).alias("cn"),
    ).first()
    assert r.lo == r.up == 1465824320894
    assert r.cn is None
    w, h, fps, frames = decode_avi_mjpeg(
        encode_avi_mjpeg([np.zeros((8, 12, 3), dtype=np.uint8)], fps=1)
    )
    assert (w, h, fps, len(frames)) == (12, 8, 1.0, 1)


def test_stream_scan_machine_two_batches_equals_batch(spark, sf_dir, tmp_path):
    """Cross-micro-batch state of the streaming scan machine: the fixture
    split into two files at the global median ts (per-key order preserved
    across batches), drained with maxFilesPerTrigger=1 → TWO micro-batches.
    The union of emissions must equal the single-batch drain exactly —
    proving (step, match_id) state survives the batch boundary."""
    import os
    import time

    from clickhouseocp_spark.catalog import load_table
    from clickhouseocp_spark.streaming.pipeline import (
        run_available_now,
        streaming_scan_machine,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    mid_ts = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    src = str(tmp_path / "src")
    os.makedirs(src)
    ev.filter(F.col("event_id") <= mid_ts).coalesce(1).write.parquet(
        src + "/part1"
    )
    time.sleep(1.1)  # file-stream orders by modification time
    ev.filter(F.col("event_id") > mid_ts).coalesce(1).write.parquet(
        src + "/part2"
    )
    schema = ev.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(src + "/part*")
    )
    two = run_available_now(
        streaming_scan_machine(stream), output_mode="append"
    )
    one = run_available_now(
        streaming_scan_machine(
            spark.readStream.schema(schema).parquet(src + "/part*")
        ),
        output_mode="append",
    )
    key = lambda r: (r.user_id, r.ts, r.event_type, r.m)  # noqa: E731
    got, want = sorted(map(key, two.collect())), sorted(map(key, one.collect()))
    assert got == want and len(got) > 0


def test_series_period_fft_kernel(spark):
    """FFT period detector: exact on planted sinusoids whose period divides
    the window; NaN on short/flat input (the CH seriesPeriodDetectFFT
    contract); stays an Arrow pandas_udf (UDF-surface gate covers this)."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.functions.series_fft import series_period_fft

    df = spark.range(1).select(
        series_period_fft(
            F.expr("transform(sequence(0, 47), i -> sin(2 * pi() * i / 8))")
        ).alias("p8"),
        series_period_fft(
            F.expr("transform(sequence(0, 63), i -> sin(2 * pi() * i / 16))")
        ).alias("p16"),
        series_period_fft(F.expr("array(1.0D, 2.0D)")).alias("short"),
        series_period_fft(
            F.expr("transform(sequence(0, 31), i -> 5.0D)")
        ).alias("flat"),
    )
    r = df.collect()[0]
    assert r.p8 == 8.0 and r.p16 == 16.0
    # NaN crosses Arrow back as NULL — Spark's rendering of CH's NaN
    assert r.short is None and r.flat is None


def test_dedup_fuzzy_e2e_planted_signal(spark, sf_dir):
    """The end-to-end fuzzy-dedup pipeline (LSH pairs → components →
    survivor election) on the 3-tier planted corpus: every contract bit
    holds and the planted chains genuinely collapse (retention well below
    the no-dedup 3N)."""
    from clickhouseocp_spark.queries import all_queries

    r = all_queries()["dedup_fuzzy_e2e"].fn(spark, sf_dir).collect()[0]
    assert r.chain_recall_ok is True
    assert r.one_survivor_per_component is True
    assert r.survivor_is_min_member is True
    assert r.n_docs % 3 == 0 and r.n_docs > 0


def test_dedup_fuzzy_e2e_cluster_knobs(spark, sf_dir):
    """Cluster-hardening knobs (round-9 verdict): ``persist_pairs`` +
    ``checkpoint_every`` exist for real-cluster shuffle-file loss and must
    not change results — every contract bit matches the default path with
    the pairs frame materialized and the CC lineage truncated each round."""
    from pyspark import StorageLevel

    from clickhouseocp_spark.queries.llm import dedup_fuzzy_e2e

    r = dedup_fuzzy_e2e(
        spark, sf_dir, persist_pairs=StorageLevel.DISK_ONLY, checkpoint_every=1
    ).collect()[0]
    assert r.chain_recall_ok is True
    assert r.one_survivor_per_component is True
    assert r.survivor_is_min_member is True
    assert r.n_docs % 3 == 0 and r.n_docs > 0


def test_fuzzy_dedup_pairs_shuffle_budget(spark, sf_dir):
    """Plan gate (round-9 verdict): the candidate-pair stage — the exact
    stage every CC round would replay after cluster shuffle-file loss when
    ``persist_pairs`` is off — lowers to ONE exchange (band grouping); the
    shingle/MinHash kernel and the exact-Jaccard verify stay shuffle-free
    on top of it.  If this grows, the non-persist default's cost model is
    void — re-measure before shipping."""
    from clickhouseocp_spark.catalog import load_table
    from clickhouseocp_spark.operators.dedup_text import minhash_lsh_pairs
    from clickhouseocp_spark.plans.inspect import shuffle_count

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    pairs = minhash_lsh_pairs(
        d, num_hashes=16, bands=4, shingle_len=3, threshold=0.5
    ).select("id_a", "id_b")
    assert shuffle_count(pairs) == 1, shuffle_count(pairs)


def test_stream_scan_concurrent_two_batches_equals_batch(spark, sf_dir, tmp_path):
    """Cross-micro-batch state of the CONCURRENT streaming machine set: the
    (seq, slot mids) state must survive the batch boundary — same two-file
    split protocol as the greedy machine's test."""
    import os
    import time

    from clickhouseocp_spark.catalog import load_table
    from clickhouseocp_spark.streaming.pipeline import (
        run_available_now,
        streaming_scan_concurrent,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    mid = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    src = str(tmp_path / "src")
    os.makedirs(src)
    ev.filter(F.col("event_id") <= mid).coalesce(1).write.parquet(src + "/p1")
    time.sleep(1.1)
    ev.filter(F.col("event_id") > mid).coalesce(1).write.parquet(src + "/p2")
    schema = ev.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(src + "/p*")
    )
    two = run_available_now(
        streaming_scan_concurrent(stream), output_mode="append"
    )
    one = run_available_now(
        streaming_scan_concurrent(
            spark.readStream.schema(schema).parquet(src + "/p*")
        ),
        output_mode="append",
    )
    key = lambda r: (r.user_id, r.ts, r.event_type, r.m)  # noqa: E731
    got, want = sorted(map(key, two.collect())), sorted(map(key, one.collect()))
    assert got == want and len(got) > 0


def test_nb_classifier_planted_separation(spark):
    """quality_classifier_nb core on a PLANTED corpus: 'en' docs carry
    marker tokens the others never use (and vice versa), so the trained
    log-odds classifier must separate the classes perfectly and rank the
    marker-heavy docs by score sign."""
    from clickhouseocp_spark.queries.llm import nb_classifier_scores

    rows = []
    for i in range(20):
        if i % 2 == 0:
            rows.append((i, "en", "the quick brown fox jumps " + "hello " * 3))
        else:
            rows.append((i, "de", "der schnelle braune fuchs " + "hallo " * 3))
    d = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r.doc_id: (r.pred, r.score) for r in nb_classifier_scores(d).collect()}
    assert len(got) == 20
    for i in range(20):
        pred, score = got[i]
        assert pred is (i % 2 == 0), (i, score)
    # scores are symmetric-ish: every en score positive, every de negative
    assert all(got[i][1] > 0 for i in range(0, 20, 2))
    assert all(got[i][1] < 0 for i in range(1, 20, 2))


def test_stream_lttb_window_equals_batch(spark, sf_dir):
    """Streaming twin of largestTriangleThreeBuckets (round 11, the r10
    verdict's item-5 stretch): per CLOSED event-time window, the stream
    does the stateful part — one grouped sorted-collect of (x, y) points
    per (series, window), state bounded by the time axis — and the
    sequential LTTB pick runs post-drain on the bounded per-window arrays
    (the stream_rolling_percentile decomposition: stateless prep →
    stateful agg → closed-form finish).  Must select the IDENTICAL point
    set as batch LTTB over the same (series, window) grouping."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.catalog import load_table
    from clickhouseocp_spark.operators.downsample import lttb
    from clickhouseocp_spark.streaming.pipeline import (
        events_stream,
        run_available_now,
    )

    def prep(df):
        return df.where(F.col("ts").isNotNull()).select(
            "event_type",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("x_us"),
            F.floor(F.col("value") * 1e6 + 0.5).cast("long").alias("y6"),
            (F.unix_timestamp("ts") / (7 * 86400)).cast("long").alias("w"),
        )

    # streaming: stateful per-(series, week) point collection, drained
    agg = (
        prep(events_stream(spark, sf_dir))
        .groupBy("event_type", "w")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("x_us", "event_id", "y6"))
            ).alias("pts")
        )
    )
    drained = run_available_now(agg)
    exploded = drained.select(
        "event_type",
        "w",
        F.explode("pts").alias("p"),
    ).select("event_type", "w", "p.x_us", "p.y6", "p.event_id")
    stream_sel = lttb(
        exploded, "x_us", "y6", 6, by=["event_type", "w"], keep=["event_id"]
    )

    # batch: identical grouping straight off the table
    batch_sel = lttb(
        prep(load_table(spark, sf_dir, "events")),
        "x_us",
        "y6",
        6,
        by=["event_type", "w"],
        keep=["event_id"],
    )

    a = {
        (r.event_type, r.w, r.sel_seq, r.event_id)
        for r in stream_sel.collect()
    }
    b = {
        (r.event_type, r.w, r.sel_seq, r.event_id)
        for r in batch_sel.collect()
    }
    assert a == b and len(a) > 0


def test_dict_hierarchy_operators(spark):
    """Hierarchical dictionary closure (dictGetHierarchy/dictIsIn/
    dictGetChildren/dictGetDescendants): 3-level tree, unknown keys
    yield empty chains, level=1 vs level=0 split, cycle guard via
    max_depth."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.operators.dictionary import (
        dict_descendants,
        dict_get_children,
        dict_get_hierarchy,
        dict_hierarchy,
        dict_is_in,
    )

    d = spark.createDataFrame(
        [(1000, 0), (100, 1000), (101, 1000), (1, 100), (2, 100), (3, 101)],
        "k INT, p INT",
    )
    h = {r.k: r.ancestors for r in dict_hierarchy(d, "k", "p").collect()}
    assert h[1] == [1, 100, 1000] and h[3] == [3, 101, 1000]
    assert h[100] == [100, 1000] and h[1000] == [1000]

    facts = spark.createDataFrame([(1,), (3,), (99,)], "k INT")
    gh = {r.k: r.hierarchy
          for r in dict_get_hierarchy(facts, d, "k", "k", "p").collect()}
    assert gh[99] == []  # unknown key → empty chain (CH behavior)

    ii = {r.k: r.is_in
          for r in dict_is_in(facts, d, "k", 100, "k", "p").collect()}
    assert ii == {1: 1, 3: 0, 99: 0}

    de = {r.k: r.descendants
          for r in dict_descendants(d, "k", "p").collect()}
    assert de[1000] == [1, 2, 3, 100, 101] and de[100] == [1, 2]
    ch = {r.k: r.descendants
          for r in dict_get_children(d, "k", "p").collect()}
    assert ch[1000] == [100, 101] and ch[101] == [3]

    # a 2-cycle must terminate and cut at max_depth, not hang
    cyc = spark.createDataFrame([(1, 2), (2, 1)], "k INT, p INT")
    hc = {r.k: r.ancestors
          for r in dict_hierarchy(cyc, "k", "p", max_depth=4).collect()}
    assert len(hc[1]) == 5 and hc[1][:3] == [1, 2, 1]
