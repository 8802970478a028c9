"""Plan-shape gates for the TPC-H suite (SURVEY.md §4 discipline: correctness
is the oracle-parity test; THESE tests pin the physical shape that survives a
100× scale-up — shuffle budget, broadcast dims, no accidental nested-loop
joins on fact-sized inputs)."""

import pytest

from clickhouseocp_spark.plans.inspect import (
    formatted_plan,
    has_broadcast_join,
    shuffle_count,
)
from clickhouseocp_spark.queries import all_queries

QS = all_queries()

#: name -> max shuffle exchanges (measured on the intended plan, +0 slack:
#: a regression that adds an exchange should fail loudly)
SHUFFLE_BUDGET = {
    "q2_min_cost_supplier": 2,
    "q4_order_priority": 2,
    "q7_volume_shipping": 2,
    "q8_market_share": 2,
    "q9_product_profit": 2,
    "q10_returned_items": 1,
    "q12_shipping_delay": 2,
    "q13_customer_distribution": 3,
    "q14_promo_revenue": 1,
    "q17_small_quantity": 2,
    "q18_large_volume": 2,
    "q19_disjunctive_filter": 1,
    "q20_dominant_suppliers": 4,
    "q21_waiting_orders": 3,
    # round-3 curation/dedup tier
    "curate_pipeline_e2e": 6,
    "dedup_bloom_incremental": 1,
    "corpus_budget_sample": 1,
}


@pytest.mark.parametrize("name", sorted(SHUFFLE_BUDGET))
def test_shuffle_budget(spark, sf_dir, name):
    df = QS[name].fn(spark, sf_dir)
    assert shuffle_count(df) <= SHUFFLE_BUDGET[name], formatted_plan(df)


@pytest.mark.parametrize(
    "name",
    [
        "q2_min_cost_supplier",
        "q5_local_supplier_volume",
        "q9_product_profit",
        "q10_returned_items",
        "q14_promo_revenue",
        "q19_disjunctive_filter",
    ],
)
def test_dims_broadcast(spark, sf_dir, name):
    """Dimension sides (nation/region/filtered part/supplier) must broadcast —
    at 100 TB the fact side never fits, the dims always do."""
    df = QS[name].fn(spark, sf_dir)
    assert has_broadcast_join(df), formatted_plan(df)


@pytest.mark.parametrize("name", ["q4_order_priority", "q18_large_volume", "q21_waiting_orders"])
def test_quantifiers_are_hash_joins(spark, sf_dir, name):
    """EXISTS / HAVING-IN / only-late-supplier quantifiers must lower to hash
    semi joins or window aggregates — a BroadcastNestedLoopJoin against the
    fact table is the correlated-subquery scale failure this suite guards."""
    plan = formatted_plan(QS[name].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan


@pytest.mark.parametrize("name", ["q11_important_stock", "q15_top_supplier", "q22_sales_opportunity"])
def test_scalar_subquery_stays_distributed(spark, sf_dir, name):
    """Global-threshold scalar subqueries (total stock value, max revenue,
    avg balance) must be one-row broadcasts, not driver collects: the plan
    contains a broadcast join and no LocalTableScan materialization of the
    aggregate input."""
    df = QS[name].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert has_broadcast_join(df), plan


def test_q6_filters_reach_scan(spark, sf_dir):
    """Q6 is the pushdown benchmark: every predicate lands in PushedFilters."""
    from clickhouseocp_spark.plans.inspect import pushed_filters

    df = QS["q6_forecast_revenue"].fn(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, pushed


def test_q18_reuses_orderkey_partitioning(spark, sf_dir):
    """The HAVING-IN threshold agg and the semi-join probe both key on
    l_orderkey — the plan must not shuffle lineitem twice on the same key
    (ReusedExchange or a single exchange feeding both)."""
    df = QS["q18_large_volume"].fn(spark, sf_dir)
    assert shuffle_count(df) <= 2, formatted_plan(df)


# --- round-5 tier: multimodal codec chains + Tukey fences -------------------

@pytest.mark.parametrize(
    ("name", "budget"),
    [
        ("multimodal_audio_meta", 0),   # two chained mapInPandas, scan-local
        ("multimodal_image_decode", 0),  # encode→decode inside the partition
        ("series_outliers_tukey", 3),    # fence agg + final agg + output sort
        ("with_fill_staleness", 6),      # the global-fill branches re-evaluate
        # the base agg (bounds/present/missing have no CTE reuse in the
        # DataFrame API) — at scale callers persist the input; see with_fill doc
    ],
)
def test_round5_shuffle_budget(spark, sf_dir, name, budget):
    df = QS[name].fn(spark, sf_dir)
    assert shuffle_count(df) <= budget, formatted_plan(df)


def test_tukey_fences_broadcast(spark, sf_dir):
    """The per-key fence table is |event_type| rows — it must broadcast;
    shuffling the point stream against it would be a 100 TB regression."""
    df = QS["series_outliers_tukey"].fn(spark, sf_dir)
    assert has_broadcast_join(df), formatted_plan(df)


# --- round-6 tier: codecs, inverted index, shard router ---------------------

@pytest.mark.parametrize(
    ("name", "budget"),
    [
        ("multimodal_png_decode", 0),    # two chained mapInPandas, scan-local
        ("multimodal_jpeg_decode", 0),   # encode→decode inside the partition
        ("jump_consistent_hash", 0),     # one pandas kernel over the scan
        ("url_hierarchy", 0),            # pure expressions
        ("fulltext_index_search", 4),    # postings agg + two search aggs +
                                          # the any⟕all semi-join
        ("group_array_moving_avg", 2),   # window + final collect agg
    ],
)
def test_round6_shuffle_budget(spark, sf_dir, name, budget):
    df = QS[name].fn(spark, sf_dir)
    assert shuffle_count(df) <= budget, formatted_plan(df)


@pytest.mark.parametrize(
    "name,budget",
    [
        # round-13 births: plan-shape gates at birth (the r12 discipline)
        ("chsql_window_view_tumble_hop", 6),  # 3 union branches ×
        # (partial→final agg) + the final sort; hop's 2-per-event Expand
        # is the only fan-out
        ("chsql_vocab_r40", 1),               # scan → project → sort
        ("chsql_series_outliers_ema", 5),     # two grouped collects + join
        ("chsql_vocab_r41", 5),               # one grouped collect + sort
        ("chsql_vocab_r42", 1),               # pure scalar tier
        ("kql_scalar_vocab9", 1),             # pure scalar tier
    ],
)
def test_round13_shuffle_budget(spark, sf_dir, name, budget):
    df = QS[name].fn(spark, sf_dir)
    assert shuffle_count(df) <= budget, formatted_plan(df)


@pytest.mark.parametrize(
    "name,budget",
    [
        # round-14 births: plan-shape gates at birth
        ("chsql_geo_vocab2", 1),    # scalar ray-cast tier + final sort
        ("chsql_h3_vocab2", 1),     # constant-table lookups + sort
        ("chsql_vocab_r43", 1),     # pure scalar tier + sort
        ("chsql_vocab_r44", 3),     # two grouped collects (joins stay
        # broadcast over the shared scan) + the final sort
        ("chsql_nlp_detect", 1),    # scalar heuristics + sort
        ("chsql_vocab_r45", 1),     # pure scalar tier + sort
        ("chsql_vocab_r46", 1),     # pure scalar tier + sort
        ("chsql_vocab_r47", 1),     # pure scalar tier + sort
        ("dict_hierarchy_ops", 5),  # closure groupBys + final sort, all
        # shuffles dimension-sized; fact side joins broadcast only
        ("chsql_vocab_r48", 1),     # scalar DP folds + sort
        ("chsql_vocab_r49", 1),     # pure scalar tier + sort
        ("chsql_lttb_downsample", 3),  # grouped sorted collect + explode
        # + final sort (partial_sort feeds the collect)
        ("chsql_vocab_r50", 4),     # grouped distinct + map-agg + sort
        ("kql_scalar_vocab10", 1),  # pure scalar tier + sort
        ("chsql_vocab_r51", 1),     # pure scalar tier + sort
    ],
)
def test_round14_shuffle_budget(spark, sf_dir, name, budget):
    df = QS[name].fn(spark, sf_dir)
    assert shuffle_count(df) <= budget, formatted_plan(df)


def test_round14_no_python_nodes(spark, sf_dir):
    """Every round-14 birth is pure-JVM: no row-at-a-time or Arrow
    Python eval nodes anywhere in the physical plan."""
    for name in (
        "chsql_geo_vocab2", "chsql_h3_vocab2", "chsql_vocab_r43",
        "chsql_vocab_r44", "chsql_nlp_detect", "chsql_vocab_r45",
        "chsql_vocab_r46", "chsql_vocab_r47", "dict_hierarchy_ops",
        "chsql_vocab_r48", "chsql_vocab_r49", "chsql_lttb_downsample",
        "chsql_vocab_r50", "kql_scalar_vocab10", "chsql_vocab_r51",
    ):
        plan = formatted_plan(QS[name].fn(spark, sf_dir))
        assert "EvalPython" not in plan and "InPandas" not in plan, name


def test_round13_no_python_nodes(spark, sf_dir):
    """Every round-13 birth is pure-JVM: no row-at-a-time or Arrow
    Python eval nodes anywhere in the physical plan."""
    for name in (
        "chsql_window_view_tumble_hop", "chsql_vocab_r40",
        "chsql_series_outliers_ema", "chsql_vocab_r41",
        "chsql_vocab_r42", "kql_scalar_vocab9",
    ):
        plan = formatted_plan(QS[name].fn(spark, sf_dir))
        assert "EvalPython" not in plan and "InPandas" not in plan, name
