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
        vocab_q,
        tpch,
    )


#: Registry ORDER is part of the driver contract: the driver's CORRECTNESS
#: file records only the FIRST 50 registry entries per round, so this list
#: front-loads what round 3 must get driver-recorded (the 62 names below the
#: cut have a full local CHECKALL + judge re-run, but no driver row yet):
#:   1-8   the round-2 red (embedding_centroids, array output fixed) and the
#:         seven converted rows-only queries, now full oracle contracts;
#:   9-50  never-driver-recorded families: the whole chsql dialect surface
#:         (29), streaming (8), and 5 mergetree/engine queries.
#: Still unrecorded after this window (leads round 4): scalar_* (9),
#: numbers_table_function, geo_point_in_polygon, group_array_moving_sum,
#: interval_length_sum, agg_mode_heavy, agg_quantile_weighted,
#: agg_regression, sessionize_events, string_distances, with_fill_linear,
#: system_parts_inventory.
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
    for name in _DRIVER_WINDOW_R3:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, q in REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered
