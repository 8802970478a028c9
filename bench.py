"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.  The driver records this as
BENCH_r{N}.json and grades against BASELINE.md (within 2x at the same SF).

Each timed run forces full execution via a count over the materialized result
(`df.toLocalIterator` would under-count lazy work; count() executes the whole
plan; noop write would also work but count keeps the driver memory flat).

Protocol: per query, one untimed warmup run then the MEDIAN of 3 timed runs —
the same steady-state convention as the reference's own measurement tool
(`clickhouse-benchmark`, Dockerfile:153, which reports percentiles over
repeated executions).  At sf0.1 a cold first run is dominated by whole-stage
codegen compilation (one-time Janino cost, amortized to noise at real scale),
which would otherwise swamp the signal the bench exists to track.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clickhouseocp_spark import get_spark
from clickhouseocp_spark.queries import all_queries

#: Headline set: one per major operator family (scan+agg, multi-join,
#: window, theta join, rollup, JSON, sort/limit) — extended as coverage grows.
HEADLINE = [
    "q1_pricing_summary",
    "join_inner_multi",
    "join_theta_range",
    "window_rank",
    "window_frames",
    "rollup_grouping",
    "json_extract_agg",
    "sort_nulls_offset",
    "agg_basic",
    "subquery_in_exists",
    "asof_join_backward",
    "window_funnel_depth",
    "sequence_match_chain",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_topk",
    "similarity_topk_ivf",
    "contamination_ngram_overlap",
    # dedup_cluster_components is oracle-gated at sf0.01, not benched: its
    # oracle-reproducible edge tier (exact Jaccard, lang-blocked) is
    # quadratic per block by contract; the scale tier for pair generation
    # is minhash_lsh (benched above) feeding the same CC operator.
    "quality_filter_gopher",
    # distinctive-operator regression tracking (round-2 verdict #9)
    "projection_rollup_answer",
    "graphite_rollup_tiers",
    "topk_state_merge",
    "quantile_dd_state_merge",
    "chsql_q1",
    # round-2 additions: training-batch assembly + sessionization + dialect
    "pack_sequences_greedy",
    "corpus_mix_weighted",
    "sessionize_events",
    "chsql_window",
    # heavyweight corpus passes (explode + global agg + reassembly)
    "line_dedup_c4",
    "substring_dup_spans",
]


def _prev_timings() -> tuple[str, dict[str, float]]:
    """Per-query medians from the newest committed BENCH_r{N}.json (driver
    artifact), so each round's line carries its deltas vs the round before."""
    here = os.path.dirname(os.path.abspath(__file__))
    arts = sorted(f for f in os.listdir(here) if f.startswith("BENCH_r") and f.endswith(".json"))
    for name in reversed(arts):
        try:
            with open(os.path.join(here, name)) as f:
                parsed = json.load(f).get("parsed", {})
            if isinstance(parsed, dict) and parsed.get("queries"):
                return name, parsed["queries"]
        except (OSError, ValueError):
            continue
    return "", {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    registry = all_queries()
    names = [n for n in HEADLINE if n in registry]

    # Warm the JVM + parquet footers + Python worker pool once so timings
    # measure query execution, not first-touch class loading or Arrow-worker
    # startup (the dedup/similarity kernels run in reused python workers).
    registry["q1_pricing_summary"].fn(spark, sf_dir).count()
    spark.range(1000).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    timings: dict[str, float] = {}
    for name in names:
        fn = registry[name].fn
        fn(spark, sf_dir).count()  # per-plan warmup (codegen compile)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[1], 4)

    total = round(sum(timings.values()), 4)
    line = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "protocol": "median of 3 timed runs after 1 warmup run per query",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    prev_name, prev = _prev_timings()
    if prev:
        line["vs_prev"] = {
            "artifact": prev_name,
            "deltas": {
                n: round(t - prev[n], 4) for n, t in timings.items() if n in prev
            },
        }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
