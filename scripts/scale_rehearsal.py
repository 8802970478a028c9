"""Empirical 10x scale rehearsal (r9 verdict #6): run the most expensive
headline queries at sf0.1 AND at the synthesized /tmp/sf1 (scripts/
make_sf1.py) on local[32], print per-query wall ratios, and flag anything
super-linear (> RATIO_FLAG x) — a hidden quadratic / skew / driver-collect
would show up here long before a real cluster does.

The 100x arguments in SCALE.md are plan-shape reasoning; this is the
one-shot measurement that backs them.  Output feeds SCALE_SF1.md.

Usage: python scripts/scale_rehearsal.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

SF01 = "/root/testdata/sf0.1"
SF1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
RATIO_FLAG = 12.0

#: the top-10 most expensive BENCH_FULL_r9 queries + the two heaviest
#: round-9 additions just under the cut
QUERIES = [
    "dedup_fuzzy_e2e",
    "semantic_dedup_semdedup",
    "similarity_topk_nsw",
    "substring_dup_spans",
    "similarity_topk_ivfpq",
    "q18_large_volume",
    "similarity_topk_ivf",
    "dsir_select_topk",
    "quantile_dd_state_merge",
    "q21_waiting_orders",
    "kql_scan_concurrent",
    "dedup_minhash_lsh",
    # round-10 continuation: the train-and-apply classifier corpus pass
    "quality_classifier_nb",
    "stream_session_count",
    # round-11: the remaining ≥1s bench headliner (r10 verdict stretch #8)
    "rag_retrieve_context",
]


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    from clickhouseocp_spark.queries import all_queries

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("scale-rehearsal")
        .getOrCreate()
    )
    reg = all_queries()

    def timed(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        df = reg[name].fn(spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        print(f"    {name} @ {sf_dir}: {dt:.2f}s ({n} rows)", flush=True)
        return dt

    # JVM/codegen warmup outside the measurement
    reg["q1_pricing_summary"].fn(spark, SF01).count()

    results = {}
    for name in QUERIES:
        t_small = timed(name, SF01)
        t_big = timed(name, SF1)
        ratio = t_big / t_small if t_small > 0 else float("inf")
        results[name] = {
            "sf0.1_s": round(t_small, 3),
            "sf1_s": round(t_big, 3),
            "ratio": round(ratio, 2),
            "flag": ratio > RATIO_FLAG,
        }
    print(json.dumps({"queries": results, "flag_threshold": RATIO_FLAG}))


if __name__ == "__main__":
    main()
