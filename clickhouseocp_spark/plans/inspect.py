"""Physical-plan inspection (SURVEY.md §4): assert that the optimizations the
engine is designed around actually fire — pushdown reached the scan, pruning
narrowed the schema, the dim side broadcast, codegen covers the hot path.

ClickHouse exposes this via EXPLAIN PIPELINE / system.query_log (reference
Dockerfile:225-230); the Spark analog is ``df.explain("formatted")`` text.
These helpers parse that text so tests (and the bench harness) can GATE on
plan shape instead of eyeballing it — a correct-but-unpushed scan is a perf
bug at 100 TB even when row counts match.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every scan node (the PREWHERE analog —
    SURVEY §2.2: filters must reach the Parquet reader)."""
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            out.append(line.split(":", 1)[1].strip())
    return out


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — column pruning check: a scan reading all
    columns for a narrow projection is wrong (SURVEY 'Optimize for scale')."""
    return [
        line.strip().split(":", 1)[1].strip()
        for line in formatted_plan(df).splitlines()
        if line.strip().startswith("ReadSchema:")
    ]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in formatted_plan(df)


def simple_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (the `*(n)` markers in the simple
    plan) — wider/fewer is better; zero on a hot path means the plan fell out
    of codegen entirely."""
    import re

    return len(set(re.findall(r"\*\((\d+)\)", simple_plan(df))))


def shuffle_count(df: DataFrame) -> int:
    """SHUFFLE exchanges in the plan — the thing to minimize (every
    groupBy/join/orderBy boundary at 100 TB is this number).  Broadcast
    exchanges are excluded: a broadcast ships the small side, it does not
    repartition the fact stream."""
    plan = formatted_plan(df)
    n = 0
    for raw in plan.splitlines():
        line = raw.strip()
        if "Exchange" not in line:
            continue
        if "BroadcastExchange" in line or "ReusedExchange" in line:
            continue
        if line.startswith("Exchange") or ") Exchange" in line:
            n += 1
    return n
