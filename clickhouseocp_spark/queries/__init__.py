"""Query registry — the driver-facing inventory of implemented operators.

Every operator row claimed as done in SURVEY.md §2 has a named entry here:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where expressible)
an equivalent ANSI/DuckDB SQL oracle string over the same fixture views.
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin projections of this
registry.

Determinism contract (driver hashes values order-insensitively but exactly):
- alias every computed column identically in Spark and oracle SQL;
- per-row IEEE double arithmetic is bitwise-identical across engines — safe;
- double *reductions* (SUM/AVG) are order-dependent → route through exact
  DECIMAL sums (``fsum`` helper) or round;
- libm-backed scalars and variance-family aggregates get ``round(x, 6)``
  on both sides;
- anything rank/limit-based orders by a unique key as tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable SQL, or None → driver rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or fn.__doc__ or "", tags=tags)
        return fn

    return deco


def _load_all() -> None:
    """Import every query module so registration side effects run."""
    from clickhouseocp_spark.queries import (  # noqa: F401
        llm,
        llm_curate,
        funnel_q,
        extras,
        mergetree_q,
        chsql_q,
        streaming_q,
        relational,
        composites,
        scalars,
        stats_q,
        stats_q2,
        stats_q3,
        vocab_q,
        vocab_q5,
        vocab_q6,
        vocab_q7,
        vocab_q8,
        vocab_q9,
        vocab_q10,
        vocab_q11,
        kql_series_q,
        tpch,
    )


#: Registry ORDER is part of the driver contract: the driver's CORRECTNESS
#: file records only the FIRST 50 registry entries per round.
#:
#: Round 5 (verdict #2): positions 1-12 are every query whose LATEST driver
#: record is red — the 3 round-4 type-drift fails (fixed this round) and the
#: 9 round-2 fails fixed in round 3 that window rotation never re-recorded
#: (CORRECTNESS_r03.json never appeared).  Positions 13-50 burn down the
#: never-recorded backlog: the chsql TPC-H text matrix (21), the remaining 8
#: TPC-H DataFrame queries, the dialect front ends (PRQL/KQL), and the
#: round-4 flagship operators.
#: Round 6 (verdict #1): zero red driver records exist anywhere — for the
#: first time the whole window is free for coverage.  All 50 names below are
#: never-driver-recorded (judge-green in the r5 parity run): the non-TPC-H
#: chsql text batch (40 — the transpiler is the repo's most distinctive
#: artifact and had near-zero driver coverage outside TPC-H), the streaming
#: tier (9), and the KQL front end.  The remaining 55 never-recorded names
#: are staged in _DRIVER_WINDOW_R7 immediately after — full-registry driver
#: coverage lands in round 7.  New round-6 queries stay OUT of both windows.
_DRIVER_WINDOW_R6 = [
    # --- chsql text path: core relational / windows / fills ---
    "chsql_q1",
    "chsql_prewhere",
    "chsql_asof",
    "chsql_argminmax",
    "chsql_window",
    "chsql_with_fill",
    "chsql_limit_by",
    "chsql_limit_ties",
    "chsql_sample",
    "chsql_rollup",
    "chsql_totals",
    "chsql_setops",
    "chsql_cte_nested",
    "chsql_scalar_with",
    "chsql_distinct_on",
    "chsql_group_by_all",
    # --- chsql text path: arrays / maps / json / strings / datetime ---
    "chsql_array_hof",
    "chsql_array_join",
    "chsql_array_join_parallel",
    "chsql_array_reduce",
    "chsql_array_transforms",
    "chsql_array_vocab2",
    "chsql_json",
    "chsql_strings",
    "chsql_datetime",
    "chsql_datetime_fmt",
    "chsql_multiif",
    "chsql_numbers",
    "chsql_dictget",
    # --- chsql text path: aggregate vocabulary / combinators ---
    "chsql_quantiles",
    "chsql_uniq",
    "chsql_bitmap",
    "chsql_combinators",
    "chsql_sum_foreach",
    "chsql_topk_text",
    "chsql_stats_vocab",
    "chsql_resample",
    "chsql_vocab_r3",
    "chsql_vocab_r4",
    "chsql_vocab_r5",
    # --- streaming tier (Structured Streaming analogs) ---
    "stream_materialized_view",
    "stream_tumbling_window",
    "stream_hopping_window",
    "stream_session_window",
    "stream_stateful_totals",
    "stream_windowed_topk",
    "stream_dedup",
    "stream_static_enrich",
    "stream_sketch_rollup",
    # --- dialect front end ---
    "kql_mv_expand",
]

#: Round-7 window, NOW LEADING the registry order (r6 verdict #1): exactly
#: 50 never-driver-recorded names — the driver records only the first 50
#: registry entries per round, so this list must be exactly the recording
#: budget.  The 5 names that overflowed the original 55-name staging
#: (agg_array_vocab_r5, numeric_indexed_vector, array_shingles,
#: map_populate_series, agg_vocab_r5b) moved to the head of
#: _DRIVER_WINDOW_R8 below.
_DRIVER_WINDOW_R7 = [
    "collapsing_merge_read",
    "graphite_rollup_tiers",
    "merge_engine_union",
    "mutation_update_delete",
    "obfuscate_table",
    "multimodal_image_decode",
    "multimodal_audio_meta",
    "sequence_next_node",
    "agg_mode_heavy",
    "group_array_moving_sum",
    "sessionize_events",
    "agg_quantile_weighted",
    "interval_length_sum",
    "system_parts_inventory",
    "system_query_log_audit",
    "window_vocab_extras",
    "setops_all_variants",
    "agg_regression",
    "string_distances",
    "numbers_table_function",
    "with_fill_linear",
    "with_fill_staleness",
    "ks_test_two_sample",
    "mean_z_test",
    "sum_kahan_count",
    "delta_sum_timestamp",
    "group_array_insert_at",
    "categorical_iv",
    "contingency_coef",
    "ab_min_sample_size",
    "stochastic_linear_regression",
    "exp_time_decayed_sum",
    "proportions_z_test",
    "format_readable",
    "transform_bar_render",
    "running_difference_neighbor",
    "date_name_vocab",
    "string_search_vocab",
    "string_distances2",
    "non_negative_derivative",
    "polygon_area_perimeter",
    "scalar_vocab_r5",
    "soundex_base58_codecs",
    "series_outliers_tukey",
    "days_since_year_zero",
    "string_bytes_stats",
    "array_roc_auc",
    "array_levenshtein",
    "url_vocab_r5",
    "json_vocab_r5",
]

#: Round-8 window, committed at round-7 start (r6 verdict top-next): the
#: remaining 48 never-driver-recorded names — 5 overflow from the original
#: R7 staging plus the 43 queries added in round 6 after the r6 window was
#: frozen.  Recording this list in round 8 completes full-registry driver
#: coverage.  Round-7-new queries go to _DRIVER_WINDOW_R9 at birth, never
#: here (keeps the backlog strictly decreasing).
_DRIVER_WINDOW_R8 = [
    # --- overflow from the 55-name R7 staging ---
    "agg_array_vocab_r5",
    "numeric_indexed_vector",
    "array_shingles",
    "map_populate_series",
    "agg_vocab_r5b",
    # --- round-6 flagship operators ---
    "multimodal_png_decode",
    "multimodal_jpeg_decode",
    "multimodal_gif_decode",
    "fulltext_index_search",
    "stream_fulltext_index",
    "embedding_pca_project",
    "embedding_int8_quantize",
    "dsir_select_topk",
    "minhash_lsh_tuning",
    "bpe_encode_tokens",
    # --- round-6 KQL depth ---
    "kql_summarize_bin",
    "kql_make_series",
    "kql_parse_extract",
    "kql_top_nested",
    "kql_mv_apply",
    # --- round-6 chsql text-path batches ---
    "chsql_vocab_r6",
    "chsql_vocab_r6b",
    "chsql_uniq64",
    "chsql_generate_series",
    "chsql_change_datetime",
    "chsql_string_sets",
    "chsql_split_normalize",
    "chsql_math_vocab_r6",
    # --- round-6 vocabulary / scalar batches ---
    "system_settings_probe",
    "url_vocab_r6",
    "url_hierarchy",
    "array_rotate_shift",
    "array_map_vocab_r9",
    "datetime_best_effort",
    "group_array_moving_avg",
    "scalar_vocab_r6b",
    "scalar_vocab_r6c",
    "geo_vocab_r6",
    "geohash_cover_box",
    "vector_norms_vocab",
    "text_stem_porter",
    "stat_moments_vocab",
    "sum_map_filtered",
    "codec_vocab_r10",
    "codec_known_answers",
    "hilbert_curve_index",
    "punycode_idna",
    "jump_consistent_hash",
]

#: Round-9 re-records (r8 verdict #1): the 4 queries whose round-8 driver
#: record went red on the pandas-canonicalizer crash (raw array output
#: columns).  Output shapes fixed (comma-joined) this round; these lead the
#: round-9 window so the red records flip green.
_R9_RERECORDS = [
    "embedding_int8_quantize",
    "kql_make_series",
    "scalar_vocab_r6b",
    "scalar_vocab_r6c",
]

#: Round-9 window: every query ADDED during round 7 is appended here at
#: birth (r6 verdict #2 — registry growth must stay inside a committed
#: window so the never-recorded backlog strictly decreases; a pytest in
#: test_oracle_parity.py enforces staging-at-birth mechanically).  Round-8
#: recorded _DRIVER_WINDOW_R8 (48 names) + the first 2 of this list.
#:
#: ROUND-9 ROTATION (r8 verdict #2, EXECUTED): the round-9 leading 50 =
#: _R9_RERECORDS (4) + this list minus its first 2 (30) +
#: _DRIVER_WINDOW_R10[:16]; _DRIVER_WINDOW_R10[16:] (4) moves to the front
#: of the round-10 line with _DRIVER_WINDOW_R11 (21) — full-registry driver
#: coverage completes in round 10 with a 25-name window.  Round-9-new
#: queries go to _DRIVER_WINDOW_R12 at birth.
_DRIVER_WINDOW_R9: list[str] = [
    # --- round-7 KQL depth ---
    "kql_join_anti_semi",
    "kql_union_range",
    "kql_percentile_agg",
    "kql_mv_apply_pipe",
    "kql_make_series_auto",
    # --- round-7 vocabulary batch 11 ---
    "format_readable_decimal_size",
    "to_start_of_interval_origin",
    "array_zip_map_sort",
    "quantile_interpolated_weighted",
    "sequence_match_events_ts",
    # --- round-7 KQL scalar vocabulary / let / datatable ---
    "kql_scalar_vocab",
    "kql_let_datatable",
    # --- round-7 LLM-pipeline addition ---
    "url_canonical_dedup",
    # --- round-7 vocabulary batch 12 ---
    "ip_uuid_vocab_r12",
    # --- round-7 PRQL extensions ---
    "prql_window_case",
    # --- round-7 text-hash vocabulary ---
    "text_simhash_vocab",
    # --- round-7 corpus-mix operator ---
    "cluster_balanced_sample",
    # --- round-7 parametric -If combinators (text path) ---
    "chsql_parametric_if",
    # --- round-7 KQL batch 2 ---
    "kql_lookup_tophitters",
    # --- round-7 multi-needle search family ---
    "chsql_multisearch",
    # --- round-7 bigram LM quality tier ---
    "text_bigram_logprob",
    # --- round-7 streaming ---
    "stream_url_dedup",
    # --- round-7 video container (MJPEG/AVI real decode) ---
    "multimodal_video_frames",
    # --- round-7 KQL dynamic vocabulary ---
    "kql_dynamic_vocab",
    # --- round-7 KQL serialized-window functions ---
    "kql_serialized_window",
    # --- round-7 vocabulary batch 14 (text path) ---
    "chsql_vocab_r14",
    # --- round-7 file() table function (text path) ---
    "chsql_file_read",
    # --- round-7 KQL evaluate pivot ---
    "kql_evaluate_pivot",
    # --- round-7 KQL arg_max family ---
    "kql_argmax_vocab",
    # --- round-7 KQL string/range operators ---
    "kql_string_ops",
    # --- round-7 PRQL let bindings ---
    "prql_let_bindings",
    # --- round-7 KQL getschema ---
    "kql_getschema",
]

#: Round-10 window: every query ADDED during round 8 is appended here at
#: birth (same staging-at-birth contract as _DRIVER_WINDOW_R9, enforced by
#: the registry-hygiene pytest).  Round-8 records _DRIVER_WINDOW_R8 (48) +
#: the first 2 of _DRIVER_WINDOW_R9; round 9 records the remaining 30 of R9
#: plus the head of this list — keep this list ≤ 20 so full-registry driver
#: coverage completes in round 9.
_DRIVER_WINDOW_R10: list[str] = [
    # --- round-8 KQL scan / partition / facet operators ---
    "kql_scan_steps",
    "kql_partition_facet",
    # --- round-8 PRQL completion: sided joins + top-n per group ---
    "prql_join_sides",
    "prql_group_topn",
    # --- round-8 vocabulary batch 15 ---
    "chsql_vocab_r15",
    "chsql_uniq_upto",
    # --- round-8 scan declare (stateful variables) ---
    "kql_scan_declare",
    # --- round-8 KQL search operator (schema-aware cross-column match) ---
    "kql_search_term",
    # --- round-8 LLM quality tier: lexical-diversity signal bundle ---
    "quality_signals_bundle",
    # --- round-8 KQL conveniences: parse-where / with_itemindex / as ---
    "kql_parse_where_itemindex",
    # --- round-8 streaming scan machine (stateful funnel on a stream) ---
    "stream_scan_machine",
    # --- round-8 top-nested with others ---
    "kql_top_nested_others",
    # --- round-8 vocabulary batch 16 ---
    "chsql_vocab_r16",
    # --- round-8 KQL datetime vocabulary completions ---
    "kql_datetime_vocab",
    # --- round-8 COLUMNS('re') APPLY dynamic selector ---
    "chsql_columns_matcher",
    # --- round-8 KQL sampling operators ---
    "kql_sample_distinct",
    # --- round-8 KQL externaldata source ---
    "kql_externaldata",
    # --- round-8 -ArgMin/-ArgMax combinators ---
    "chsql_argminmax_combinators",
    # --- round-8 recursive CTE (CH 24.4+ / Spark 4 UnionLoop) ---
    "chsql_recursive_cte",
    # --- round-8 KQL invoke (tabular lambda lets) ---
    "kql_invoke_lambda",
]

#: Round-11 window: queries ADDED late in round 8 (after _DRIVER_WINDOW_R10
#: froze at the 20-name round-9 slack) are appended here at birth — same
#: staging-at-birth contract, enforced by the registry-hygiene pytest.
#: Round 9 records the 30 R9-leftovers + the 20 R10 names; round 10 records
#: the rest of R10's slack plus this list.  Keep it ≤ ~30 so full-registry
#: driver coverage completes in round 10.
_DRIVER_WINDOW_R11: list[str] = [
    # --- round-8 KQL series_* time-series vocabulary ---
    "kql_series_arith",
    "kql_series_fill",
    "kql_series_fit",
    # --- round-8 vocabulary batch 17 (map functions + ngramDistance) ---
    "chsql_vocab_r17",
    # --- round-8 KQL evaluate bag_unpack (data-driven widening) ---
    "kql_bag_unpack",
    # --- round-8 H3 index-math family (bit-layout tier) ---
    "h3_index_bits",
    # --- round-8 KQL join execution hints (broadcast/shuffle) ---
    "kql_join_hint_broadcast",
    # --- round-8 PRQL loop (fixpoint iteration via WITH RECURSIVE) ---
    "prql_loop",
    # --- round-8 FFT period detection (Arrow numpy kernel) ---
    "series_period_detect_fft",
    # --- round-8 MergeTree row TTL (lazy expiry at OPTIMIZE) ---
    "mergetree_ttl_expiry",
    # --- round-8 KQL series decomposition + anomaly scoring ---
    "kql_series_decompose",
    # --- round-8 KQL series_outliers (Tukey fences) ---
    "kql_series_outliers",
    # --- round-8 KQL toscalar()/materialize() wrappers ---
    "kql_toscalar_threshold",
    # --- round-8 column-level ALTER completion ---
    "alter_column_lifecycle",
    # --- round-8 KQL evaluate narrow (wide-to-long transpose) ---
    "kql_evaluate_narrow",
    # --- round-8 KQL series_fir / series_iir (the DSP pair) ---
    "kql_series_fir_iir",
    # --- round-8 vocabulary batch 18 (tz conversions, clamp, addDate) ---
    "chsql_vocab_r18",
    # --- round-8 batch 18b: conditional array fill/split family ---
    "chsql_array_fill_split",
    # --- round-8 batch 19: tuple arithmetic + JSON introspection ---
    "chsql_vocab_r19",
    # --- round-8 KQL make_bag (property-bag union aggregate) ---
    "kql_make_bag",
    # --- round-8 groupBitmapAnd/Or/Xor (bitmap reduction aggregates) ---
    "group_bitmap_ops",
]

#: Round-12 window: queries ADDED during round 9 are appended here at birth
#: (same staging-at-birth contract, enforced by the registry-hygiene
#: pytest).
#:
#: ROUND-10 START TASK (the same rotation this round performed — do it
#: FIRST, after CORRECTNESS_r09.json lands): reorder all_queries() to
#:   _DRIVER_WINDOW_R10[16:] (4) + _DRIVER_WINDOW_R11 (21) + this list
#: ahead of everything else.  At this list's final size (19) that is 44
#: names — full-registry driver coverage INCLUDING the round-9 additions
#: completes in round 10 with 6 slots to spare; stage round-10-new
#: queries in a fresh _DRIVER_WINDOW_R13 at birth and pull ≤6 of them
#: into the window only if they exist by recording time.
_DRIVER_WINDOW_R12: list[str] = [
    # --- round-9 KQL scan completion: the Kusto-faithful concurrent
    #     machine set (promotion/absorption/replacement + output modes) ---
    "kql_scan_concurrent",
    # --- round-9 KQL log-analytics completions ---
    "kql_parse_kv",
    "kql_series_periods",
    # --- round-9 LLM tier: fuzzy-dedup pipeline end-to-end ---
    "dedup_fuzzy_e2e",
    # --- round-9 vocabulary batches 20-24 ---
    "chsql_vocab_r20",
    "chsql_vocab_r21",
    "chsql_vocab_r22",
    "chsql_vocab_r23",
    "chsql_vocab_r24",
    # --- round-9 text-path t-test statistics ---
    "chsql_ttest_text",
    # --- round-9 streaming concurrent scan machine set ---
    "stream_scan_concurrent",
    # --- round-9 codec batch 25 + math pins + series vector math ---
    "codec_base32_strings",
    "chsql_math_vocab_r9b",
    "kql_series_vector",
    # --- round-9 Kusto log-analytics scalar batch 2 ---
    "kql_scalar_vocab2",
    # --- round-9 Kusto activity plugins ---
    "kql_sliding_window",
    "kql_activity_metrics",
    "kql_retention_cohort",
    # --- round-9 Kusto sequence-analytics plugin ---
    "kql_funnel_sequence",
]

#: Round-13 window: queries ADDED during round 10 are appended here at
#: birth (same staging-at-birth contract, enforced by the registry-hygiene
#: pytest).  The round-10 recording window is the 44 never-recorded names
#: (_DRIVER_WINDOW_R10[16:] 4 + _DRIVER_WINDOW_R11 21 + _DRIVER_WINDOW_R12
#: 19) + the first 6 of this list — full-registry driver coverage lands in
#: round 10; round 11 records this list's overflow.
_DRIVER_WINDOW_R13: list[str] = [
    # --- round-10 KQL: rows_near oracle registration (r9 verdict #3) ---
    "kql_rows_near",
    # --- round-10 lowered-but-unregistered sweep (r9 verdict #3) ---
    "kql_scalar_vocab3",
    "kql_series_compare",
    # --- round-10 vocabulary batch 26 (r9 verdict #4) ---
    "chsql_vocab_r26",
    "chsql_sequence_next_node",
    # --- round-10 FUNC-table coverage sweep, batches 27-29 (r27 fills the
    #     6th round-10 window slot; r28/r29 record in round 11) ---
    "chsql_vocab_r27",
    "chsql_vocab_r28",
    "chsql_vocab_r29",
    # --- round-10 FUNC-table sweep, part 3 + the nondeterministic-contract
    #     tier (record in round 11) ---
    "chsql_vocab_r30",
    "chsql_vocab_r31",
    "chsql_vocab_r32",
    # --- round-10 Kusto graph semantics (make-graph + graph-match) ---
    "kql_graph_match",
    "kql_graph_shortest_paths",
    "kql_graph_components",
    # --- round-10 Kusto data-mining plugin ---
    "kql_basket",
    # --- round-10 generator sources (print / timespan-step range) ---
    "kql_print_range",
    # --- round-10 KQL scalar batch 4 (codecs/hashes/binary/converters) ---
    "kql_scalar_vocab4",
    # --- round-10 text-path funnel aggregates ---
    "chsql_funnel_text",
    "chsql_window_funnel_text",
    # --- round-10 sampled-gap FUNC sweep batches 33-35 ---
    "chsql_vocab_r33",
    "chsql_vocab_r34",
    "chsql_vocab_r35",
    # --- round-10 continuation: KQL sketch/bitwise aggregates ---
    "kql_hll_binary_agg",
    # --- round-10 continuation: KQL scalar batch 5 (IPv4 family) ---
    "kql_scalar_vocab5",
    # --- round-10 continuation: KQL mining operators ---
    "kql_reduce_by",
    "kql_diffpatterns",
    "kql_autocluster",
    # --- round-10 continuation: CIDR enrichment plugin ---
    "kql_ipv4_lookup",
    # --- round-10 continuation: two-segment trend fit ---
    "kql_series_fit_2lines",
    # --- round-10 continuation: activity-analytics completion ---
    "kql_activity_engagement",
    "kql_session_count",
    "kql_active_users_count",
    "kql_dcount_intersect",
    # --- round-10 continuation: streaming sessionization twin ---
    "stream_session_count",
    # --- round-10 continuation: geo containment ---
    "kql_geo_circle",
    # --- round-10 continuation: SQL geohash folds (both dialects) ---
    "chsql_geohash_roundtrip",
    # --- round-10 continuation: KQL scalar batch 6 ---
    "kql_scalar_vocab6",
    # --- round-10 continuation: KQL aggregate batch 7 ---
    "kql_agg_vocab7",
    # --- round-10 continuation: cross-table find source ---
    "kql_find_source",
    # --- round-10 continuation: KQL scalar batch 7 ---
    "kql_scalar_vocab7",
    # --- round-10 continuation: serialized ranks ---
    "kql_row_rank",
    # --- round-10 continuation: data-derived pivot ---
    "kql_pivot_auto",
    # --- round-10 continuation: schema-aware find ---
    "kql_find_schema_aware",
    # --- round-10 continuation: NB quality classifier (train+apply) ---
    "quality_classifier_nb",
    # --- round-10 continuation: database-wide search ---
    "kql_search_database",
    # --- round-10 continuation: funnel completion windows ---
    "kql_funnel_completion",
    # --- round-10 continuation: predicate sequence detection ---
    "kql_sequence_detect",
    # --- round-10 continuation: term-level diffpatterns ---
    "kql_diffpatterns_text",
    # --- round-10 continuation: rolling percentile windows ---
    "kql_rolling_percentile",
    # --- round-10 continuation: batch-6 registry completion ---
    "kql_scalar_vocab6b",
    # --- round-10 continuation: polygon containment ---
    "kql_geo_polygon",
    # --- round-10 continuation: streaming rolling percentile twin ---
    "stream_rolling_percentile",
]

#: Round-11 births (≤3 — the r10 verdict caps registry growth this round so
#: the 46-name R13 overflow + the chsql_vocab_r18 red re-record fit in one
#: 50-slot window and full-registry driver coverage finally lands).
#:
#: ROUND-12 START TASK: once CORRECTNESS_r11 lands 50/50 green, the
#: never-recorded backlog is ZERO for the first time — every registry
#: query carries a driver record.  Round 12's window is therefore free:
#: lead all_queries() with (a) any r11 reds (fix first), then (b) round-12
#: births staged in a fresh _DRIVER_WINDOW_R15, then (c) re-records of the
#: STALEST green records (CORRECTNESS_r01/r02 names) so old records rotate
#: forward.  Registry growth is unconstrained again, but stage at birth.
_DRIVER_WINDOW_R14: list[str] = [
    # --- round-11 FUNC-sweep closure: every lowered-but-never-exercised
    #     CH/KQL name now carries an oracle-backed query (r10 verdict #4/#5)
    "chsql_vocab_r36",
    "chsql_vocab_r37",
    "kql_scalar_vocab8",
]

#: Round-12 window: CORRECTNESS_r11 landed 50/50 green and the
#: never-recorded backlog is ZERO, so the window carries (a) the 12
#: round-12 births — the statistical/series tier registered per VERDICT
#: r11 "What's missing" #1 (stats_q3.py: MW/meanZ, t-test/ANOVA p-values
#: via the DuckDB Lentz-fold replay, rankCorr/entropy/intervalLengthSum/
#: e-folding decay, corr matrices, STL contracts, series_fit_poly, the
#: KQL beta_cdf/binomial_test/welch_test + round-12 ipv6 fixes, the
#: PromQL timeSeries*ToGrid tier, morton/hilbert curves, the -Resample
#: closure, and vocab batches 38-39) — and (b) re-records of the 38
#: STALEST greens (all CORRECTNESS_r01 names, recorded 11 rounds ago
#: while their lowerings kept evolving — VERDICT r11 missing #2).
#:
#: ROUND-13 START TASK: lead with any r12 reds (there were NONE — r12
#: landed 50/50 green), then round-13 births staged in
#: _DRIVER_WINDOW_R16, then continue the staleness rotation via
#: _ROTATION_R13 — the 11 remaining r01-latest names followed by the 42
#: r02-latest names (53 total; with B births the first 50 of
#: all_queries() record B births + the 50-B stalest, and the overflow
#: leads round 14's rotation).  The r12 note hand-listed only 5 r01
#: names and missed 6 (VERDICT r12 wrong #2); _ROTATION_R13 is now
#: pinned against the CORRECTNESS_r*.json artifacts by
#: tests/test_coverage_ledger.py::test_rotation_tail_is_derived so a
#: hand-written tail can never be wrong again.
_DRIVER_WINDOW_R15: list[str] = [
    # --- round-12 births: the statistical/series tier (stats_q3.py) ---
    "chsql_mann_whitney_meanz",
    "chsql_ttest_anova_pvalues",
    "chsql_rank_entropy_decay",
    "chsql_corr_matrices",
    "chsql_series_stl_contracts",
    "kql_series_fit_poly",
    "kql_stat_scalars",
    # --- round-12 births: the CH 25.6 PromQL timeSeries*ToGrid tier,
    #     space-filling curves, -Resample closure, array/string batch ---
    "chsql_timeseries_grid",
    "chsql_morton_hilbert",
    "chsql_resample_avg_minmax",
    "chsql_vocab_r38",
    "chsql_vocab_r39",
    # --- staleness rotation: 38 oldest green records (all r01; the
    #     remaining 5 r01 + 42 r02 names lead round 13's rotation) ---
    "q1_pricing_summary",
    "filter_project",
    "select_except_apply",
    "json_extract_agg",
    "sample_by_key",
    "join_inner_multi",
    "join_left_agg",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_cross",
    "join_theta_range",
    "agg_basic",
    "agg_argminmax",
    "agg_collect_sorted",
    "agg_stats",
    "agg_quantiles",
    "rollup_grouping",
    "cube_agg",
    "grouping_sets",
    "window_rank",
    "window_lag_lead",
    "window_frames",
    "sort_nulls_offset",
    "limit_with_ties",
    "setops_union_intersect_except",
    "subquery_in_exists",
    "json_variant",
    "asof_join_backward",
    "asof_join_forward_strict",
    "with_fill_daily",
    "with_fill_interpolate",
    "limit_by_group",
    "top_k_heavy_hitters",
    "any_left_join",
    "dedup_latest_version",
    "paste_join_positional",
    "sum_if_combinators",
]

#: Round-13 births — staged at birth per the standing contract
#: (test_every_registry_query_is_recorded_or_staged).
_DRIVER_WINDOW_R16: list[str] = [
    # the WINDOW VIEW tier, oracle-registered (VERDICT r12 missing #2)
    "chsql_window_view_tumble_hop",
    # vocabulary batch r40 + the Tukey-outlier/EMA series tier
    "chsql_vocab_r40",
    "chsql_series_outliers_ema",
    # vocabulary batch r41: sumMap-family dialect aggregates, interval
    # sweeps, exponentialTimeDecayed* closure, approx_top_k
    "chsql_vocab_r41",
    # KQL scalar closers: degrees/radians, pure-SQL erf/erfc,
    # series_sum2, base64_encode_fromguid
    "kql_scalar_vocab9",
    # vocabulary batch r42: the IPv6 byte/text tier (RFC 5952 render)
    # + parseReadableSize trio
    "chsql_vocab_r42",
]

#: Round-14 births — staged at birth per the standing contract
#: (test_every_registry_query_is_recorded_or_staged).
_DRIVER_WINDOW_R17: list[str] = [
    # the Cartesian polygon tier: pointInPolygon/area/perimeter/readWKT*
    "chsql_geo_vocab2",
    # h3 constant tables + bit-layout index constructors
    "chsql_h3_vocab2",
    # string batch r43: soundex, CH-rule initcap, translate, dayName,
    # toUUIDOrZero, multiSearchAnyCaseInsensitive, stringJaccardIndexUTF8
    "chsql_vocab_r43",
    # simpleJSON/visitParam closure + groupArrayMoving*/InsertAt
    "chsql_vocab_r44",
    # NLP detect tier: detectLanguage[Mixed]/Charset/ProgrammingLanguage,
    # lemmatize('en') rule subset
    "chsql_nlp_detect",
    # tranche 2: introspection constants, overlay/getSubcolumn closers,
    # map quantifiers, extractKeyValuePairs/str_to_map/mapFromString
    "chsql_vocab_r45",
    # tranche 2: the encoding tier — base32, XML/HTML entity codecs,
    # extractTextFromHTML, reinterpret LE loads, javaHashUTF16LE
    "chsql_vocab_r46",
    # tranche 2: the IP-type closure (toIPv4/toIPv6 families,
    # IPv4ToIPv6, isIPAddressInRange both families) + pointInEllipses,
    # wkt Point render
    "chsql_vocab_r47",
    # tranche 2: hierarchical dictionaries — dictGetHierarchy/dictIsIn/
    # dictGetChildren/dictGetDescendants as bounded dim-side closures
    "dict_hierarchy_ops",
    # tranche 2: array edit distances as pure-JVM DP folds
    "chsql_vocab_r48",
    # tranche 2: string/date closers + the AES codec pair
    "chsql_vocab_r49",
    # tranche 2: LTTB downsampling aggregate as a pure-JVM fold
    "chsql_lttb_downsample",
    # tranche 2: uniqUpTo, sumMapFiltered, geohashesInBox
    "chsql_vocab_r50",
    # KQL scalar batch 10: series trig, IPv4-in-text matchers, range
    # families, parse_ipv6_mask, make_string/array_strcat/todynamic
    "kql_scalar_vocab10",
    # tranche 2: wide-integer casts + the v7-UUID/snowflake generators
    "chsql_vocab_r51",
]

#: Round-15 births — staged at birth per the standing contract
#: (test_every_registry_query_is_recorded_or_staged).
_DRIVER_WINDOW_R18: list[str] = [
    # the S2 cell tier: geoToS2/s2ToGeo/s2CellsIntersect/s2GetNeighbors
    # with an independent recursive-CTE oracle replay of the fold
    "chsql_s2_vocab",
    # vocab batch r52: multiFuzzyMatch* (Sellers DP over literal
    # patterns) + toStartOfInterval multi-n calendar buckets
    "chsql_vocab_r52",
    # S2 composites: rect add/contains/union/intersection + cap
    # contains/union over the verified encode/decode primitives
    "chsql_s2_vocab2",
]


#: process-wide cache for :func:`_latest_driver_records` (the artifacts
#: are committed files — immutable within a process lifetime)
_LATEST_RECORDS_CACHE: dict[str, tuple[int, bool]] | None = None


def _latest_driver_records() -> dict[str, tuple[int, bool]]:
    """``name -> (round, green)`` from the committed CORRECTNESS_r*.json.

    Ground truth for the staleness rotation: the driver's own per-round
    correctness artifacts, committed at the repo root.  ``green`` is the
    full three-way match (rows + schema + value hash).

    Cached per process (r14 ADVICE: ``all_queries()`` re-globbed and
    re-parsed every artifact on each call), and an empty result — the
    package running outside the repo checkout — warns instead of
    silently degrading the births-then-staleness ordering contract.
    """
    if _LATEST_RECORDS_CACHE is not None:
        return _LATEST_RECORDS_CACHE
    import glob as _glob
    import json as _json
    import os as _os
    import re as _re

    repo = _os.path.dirname(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    )
    latest: dict[str, tuple[int, bool]] = {}
    for f in sorted(
        _glob.glob(_os.path.join(repo, "CORRECTNESS_r*.json")),
        key=lambda p: int(
            _re.search(r"r(\d+)", _os.path.basename(p)).group(1)
        ),
    ):
        r = int(_re.search(r"r(\d+)", _os.path.basename(f)).group(1))
        with open(f) as fh:
            for name, v in _json.load(fh).items():
                green = bool(
                    v.get("rows_match")
                    and v.get("schema_match", True)
                    and v.get("hash_match", True)
                )
                latest[name] = (r, green)
    if not latest:
        import warnings as _warnings

        _warnings.warn(
            "no CORRECTNESS_r*.json artifacts found at "
            f"{repo!r}; the derived staleness rotation is empty — "
            "driver-window ordering degrades to births only",
            stacklevel=2,
        )
    globals()["_LATEST_RECORDS_CACHE"] = latest
    return latest


def _staged_births() -> list[str]:
    """Names staged in a ``_DRIVER_WINDOW_R*`` list with NO driver
    record yet — the births that lead the recording window.

    Derived, like the rotation: once the driver records a birth, it
    drops out of this list automatically and re-enters the window via
    the staleness rotation, so a new round needs exactly one edit —
    appending its ``_DRIVER_WINDOW_R{n}`` list.
    """
    recorded = set(_latest_driver_records())
    births: list[str] = []
    g = globals()
    for attr in sorted(
        (a for a in g if a.startswith("_DRIVER_WINDOW_R")),
        key=lambda a: int(a.rsplit("R", 1)[1]),
    ):
        for name in g[attr]:
            if name not in recorded and name not in births:
                births.append(name)
    return births


def _derived_rotation() -> list[str]:
    """The staleness rotation, derived — not hand-listed — each round.

    Rounds 12 and 13 both tripped on hand-written rotation lists (the r12
    note undercounted the r01 tail; the r13 pin broke the moment the
    rotation it checked succeeded).  This replaces the per-round list with
    the ground truth itself: every driver-recorded name ordered by
    (red-at-latest first, then record round ascending, then name), so the
    window after the births is always "fix reds, then re-record the
    stalest greens" and next round's rotation needs zero editing — the
    driver's own post-close artifact reorders it automatically.
    """
    latest = _latest_driver_records()
    return sorted(latest, key=lambda n: (latest[n][1], latest[n][0], n))


#: Round-13 staleness rotation (historic — superseded by
#: ``_derived_rotation()``): the 11 r01-latest names followed by the 42
#: r02-latest names, as of the round-13 window.
_ROTATION_R13: list[str] = [
    # --- r01-latest (11, verified complete — VERDICT r12 wrong #2) ---
    "array_join_parallel",
    "asof_join_inner",
    "dict_get_default",
    "partial_merge_reagg",
    "pivot_sum_if",
    "qualify_top_per_group",
    "scalar_datetime",
    "scalar_regex",
    "scalar_string",
    "with_fill_from_to",
    "with_totals",
    # --- r02-latest (42) ---
    "agg_delta_sum",
    "agg_vocab_extras",
    "bit_functions",
    "bitmap_agg_operations",
    "ch_function_names",
    "collate_sort",
    "contamination_ngram_overlap",
    "corpus_mix_weighted",
    "corpus_split_stratified",
    "corpus_vocabulary",
    "dedup_cluster_components",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "embedding_near_dup",
    "histogram_buckets",
    "ip_functions",
    "line_dedup_c4",
    "minmax_map_agg",
    "nearest_centroid_assign",
    "pack_sequences_greedy",
    "pack_utilization",
    "projection_rollup_answer",
    "quality_filter_gopher",
    "quantile_dd_state_merge",
    "quantile_timing_state_merge",
    "retention_steps",
    "sequence_count_pairs",
    "sequence_match_chain",
    "similarity_topk",
    "substring_dup_spans",
    "sum_map_agg",
    "system_columns",
    "text_language_id",
    "text_ngram_stats",
    "text_pii_scrub",
    "text_quality_score",
    "text_token_stats",
    "text_unigram_logprob",
    "top_k_weighted",
    "topk_state_merge",
    "window_funnel_depth",
    "window_funnel_overlap",
]

_DRIVER_WINDOW_R5 = [
    # --- latest driver record is red; all fixed — re-record ---
    "scalar_math",
    "scalar_cast",
    "curate_pipeline_e2e",
    "embedding_centroids",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "embedding_near_dup_lsh",
    "multimodal_binary_meta",
    "hll_state_merge",
    "agg_approx_distinct",
    # --- never recorded: chsql TPC-H text-path matrix (q1 = chsql_q1, r3) ---
    "chsql_tpch_q2",
    "chsql_tpch_q3",
    "chsql_tpch_q4",
    "chsql_tpch_q5",
    "chsql_tpch_q6",
    "chsql_tpch_q7",
    "chsql_tpch_q8",
    "chsql_tpch_q9",
    "chsql_tpch_q10",
    "chsql_tpch_q11",
    "chsql_tpch_q12",
    "chsql_tpch_q13",
    "chsql_tpch_q14",
    "chsql_tpch_q15",
    "chsql_tpch_q16",
    "chsql_tpch_q17",
    "chsql_tpch_q18",
    "chsql_tpch_q19",
    "chsql_tpch_q20",
    "chsql_tpch_q21",
    "chsql_tpch_q22",
    # --- never recorded: remaining TPC-H DataFrame path ---
    "q4_order_priority",
    "q8_market_share",
    "q11_important_stock",
    "q12_shipping_delay",
    "q14_promo_revenue",
    "q16_parts_suppliers",
    "q19_disjunctive_filter",
    "q20_dominant_suppliers",
    # --- never recorded: dialect front ends + round-4 flagships ---
    "prql_pipeline",
    "kql_pipeline",
    "similarity_topk_nsw",
    "bm25_retrieve",
    "quality_classifier_linear",
    "bpe_pair_counts",
    "fuzzy_join_entities",
    "window_funnel_strict_order",
    "uniq_theta_kmv",
]

#: round-4 window, kept next in order — this list front-loaded what round 4
#: had to get driver-recorded.  Rounds 1+2 recorded
#: 100 names; round 3's window (kept immediately after this one) covered 50
#: more; the 50 below are drawn from the 105 never-driver-recorded names:
#: the round-3 LLM-curation tier (12), the statistical-test aggregates (13),
#: the scalar families (10), stream-stream join / upsert sink (2), and the
#: TPC-H DataFrame-path suite (13 of 21).  Still unrecorded after this
#: window (leads round 5): the chsql TPC-H text-path matrix (20), the
#: remaining 8 TPC-H DataFrame queries, vocab/format extras, prql_pipeline.
_DRIVER_WINDOW_R4 = [
    # --- round-3 LLM-curation tier ---
    "similarity_topk_pq",
    "similarity_topk_ivfpq",
    "chunk_documents",
    "tfidf_top_terms",
    "dedup_bloom_incremental",
    "multimodal_frame_sample",
    "corpus_budget_sample",
    "semantic_dedup_semdedup",
    "repetition_metrics",
    "rag_retrieve_context",
    "curate_pipeline_e2e",
    "boilerplate_line_filter",
    # --- statistical-test / analytics aggregates ---
    "entropy_agg",
    "cramers_v_assoc",
    "theils_u_assoc",
    "ttest_two_sample",
    "mann_whitney_u",
    "exponential_moving_avg",
    "max_intersections",
    "group_bit_agg",
    "rank_corr_spearman",
    "lttb_downsample",
    "sparkbar_daily",
    "anova_f_test",
    "bounding_ratio",
    # --- scalar function families ---
    "scalar_math",
    "scalar_conditional",
    "scalar_hash",
    "scalar_cast",
    "scalar_array_higher_order",
    "scalar_url",
    "scalar_geo",
    "scalar_tuple_map",
    "scalar_interval",
    "geo_point_in_polygon",
    # --- streaming round-3 additions ---
    "stream_stream_join",
    "stream_upsert_latest",
    # --- TPC-H DataFrame path (13 of 21; the rest + text path lead r5) ---
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q9_product_profit",
    "q10_returned_items",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity",
    "q18_large_volume",
    "q21_waiting_orders",
    "q22_sales_opportunity",
]

#: round-3 window, kept next in order (driver-recorded in round 3 if that
#: round's correctness pass ran; CORRECTNESS_r03.json never appeared in the
#: repo, so these stay ahead of the already-recorded tail as insurance).
_DRIVER_WINDOW_R3 = [
    "embedding_centroids",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "embedding_near_dup_lsh",
    "multimodal_binary_meta",
    "hll_state_merge",
    "chsql_q1",
    "chsql_prewhere",
    "chsql_asof",
    "chsql_argminmax",
    "chsql_array_hof",
    "chsql_array_join",
    "chsql_array_join_parallel",
    "chsql_array_reduce",
    "chsql_bitmap",
    "chsql_combinators",
    "chsql_cte_nested",
    "chsql_datetime",
    "chsql_datetime_fmt",
    "chsql_dictget",
    "chsql_json",
    "chsql_limit_by",
    "chsql_limit_ties",
    "chsql_multiif",
    "chsql_numbers",
    "chsql_quantiles",
    "chsql_rollup",
    "chsql_sample",
    "chsql_scalar_with",
    "chsql_setops",
    "chsql_strings",
    "chsql_totals",
    "chsql_uniq",
    "chsql_window",
    "chsql_with_fill",
    "stream_materialized_view",
    "stream_tumbling_window",
    "stream_hopping_window",
    "stream_session_window",
    "stream_stateful_totals",
    "stream_windowed_topk",
    "stream_dedup",
    "stream_static_enrich",
    "collapsing_merge_read",
    "graphite_rollup_tiers",
    "merge_engine_union",
    "mutation_update_delete",
    "obfuscate_table",
]


def all_queries() -> dict[str, Query]:
    _load_all()
    ordered: dict[str, Query] = {}
    for name in (
        # recording window (first 50): births first, then the staleness
        # rotation — BOTH derived from the committed CORRECTNESS_r*.json
        # artifacts.  Births = staged-but-unrecorded names in staging-
        # list order; rotation = reds-at-latest first, then stalest
        # greens.  The derived tail covers every recorded name, so a
        # new round's only edit is appending its _DRIVER_WINDOW_R{n}.
        _staged_births()
        + _derived_rotation()
    ):
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, q in REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered
