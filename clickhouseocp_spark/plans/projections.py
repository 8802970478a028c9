"""Projection (stored pre-aggregation) rewrite — the one custom-optimizer
candidate identified in SURVEY.md §4.

ClickHouse MergeTree *projections* store a pre-aggregated copy of a table
inside each part and route matching aggregate queries to it automatically
(reference ships them via the engine pin, Dockerfile:102-104; upstream
`src/Storages/MergeTree/MergeTreeProjection*`).  The Spark-first equivalent
is a **summary table of re-mergeable states** plus a routing step at plan
time: a requested GROUP BY is answerable from a projection whenever its keys
are a subset of the projection's keys and every requested measure derives
from a stored state (operators/sketches.py discipline):

    sum   → SUM of decimal sum-states        (exact, associative)
    count → SUM of count-states
    min   → MIN of min-states
    max   → MAX of max-states
    avg   → sum-state / count-state          (derived, exact)
    uniq  → hll_union_agg of HLL sketch states (approximate, mergeable)

Routing happens before Catalyst sees the plan, so the fact table is never
scanned — at 100 TB this turns a full-table aggregate into a scan of a
|projection-keys| cardinality summary.  The summary itself is maintained by
recompute or incremental append (new partitions' states union in, exactly
like ClickHouse merges projection parts).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

#: state-column suffix per measure kind
_STATE = {
    "sum": "__sum",
    "count": "__cnt",
    "min": "__min",
    "max": "__max",
    "uniq": "__hll",
}


@dataclass(frozen=True)
class Projection:
    """A stored pre-aggregation: ``keys`` → state columns for ``measures``.

    ``measures`` maps output measure name → (kind, source column); ``path``
    is the parquet location of the summary (None = registered DataFrame /
    temp view kept in memory).
    """

    name: str
    keys: tuple[str, ...]
    measures: dict[str, tuple[str, str]]
    path: str | None = None


def build_projection(
    df: DataFrame,
    name: str,
    keys: Sequence[str],
    measures: dict[str, tuple[str, str]],
    path: str | None = None,
) -> tuple[Projection, DataFrame]:
    """Materialize the summary: one row per key combination, states only.

    One shuffle over the fact table, once — every answered query afterwards
    skips the fact scan entirely.  ``avg`` requests need both sum and count
    states; they are added automatically.
    """
    aggs: list[F.Column] = []
    seen: set[str] = set()

    def add(measure: str, kind: str, col: str) -> None:
        state = measure + _STATE[kind]
        if state in seen:
            return
        seen.add(state)
        if kind == "sum":
            aggs.append(F.sum(F.col(col).cast("decimal(38,6)")).alias(state))
        elif kind == "count":
            aggs.append(F.count(col).alias(state))
        elif kind == "min":
            aggs.append(F.min(col).alias(state))
        elif kind == "max":
            aggs.append(F.max(col).alias(state))
        elif kind == "uniq":
            aggs.append(
                F.hll_sketch_agg(F.col(col).cast("string"), F.lit(12)).alias(state)
            )
        else:
            raise ValueError(f"unknown measure kind {kind!r}")

    expanded: dict[str, tuple[str, str]] = {}
    for m, (kind, col) in measures.items():
        if kind == "avg":
            add(m, "sum", col)
            add(m, "count", col)
        else:
            add(m, kind, col)
        expanded[m] = (kind, col)

    summary = df.groupBy(*keys).agg(*aggs)
    proj = Projection(name=name, keys=tuple(keys), measures=expanded, path=path)
    if path is not None:
        summary.write.mode("overwrite").parquet(path)
    return proj, summary


class ProjectionCatalog:
    """Registry + router: ``aggregate()`` answers from the cheapest usable
    projection, else falls back to the fact table (the automatic-choice
    behavior of ClickHouse projections)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._projections: dict[str, tuple[Projection, DataFrame | None]] = {}

    def register(self, proj: Projection, summary: DataFrame | None = None) -> None:
        if proj.path is None and summary is None:
            raise ValueError("in-memory projection needs its summary DataFrame")
        self._projections[proj.name] = (proj, summary)

    def _summary_df(self, proj: Projection, summary: DataFrame | None) -> DataFrame:
        if proj.path is not None:
            return self.spark.read.parquet(proj.path)
        assert summary is not None
        return summary

    def usable(
        self, group_keys: Sequence[str], measures: dict[str, tuple[str, str]]
    ) -> Projection | None:
        """Smallest-key usable projection: keys cover the request, every
        measure's (kind, col) is stored."""
        best: tuple[int, Projection] | None = None
        for proj, _ in self._projections.values():
            if not set(group_keys) <= set(proj.keys):
                continue
            if any(proj.measures.get(m) != spec for m, spec in measures.items()):
                continue
            cand = (len(proj.keys), proj)
            if best is None or cand[0] < best[0]:
                best = cand
        return best[1] if best else None

    def aggregate(
        self,
        fact: DataFrame | None,
        group_keys: Sequence[str],
        measures: dict[str, tuple[str, str]],
    ) -> DataFrame:
        """GROUP BY ``group_keys`` computing ``measures`` — from a projection
        when one matches, else from ``fact`` directly.  Result schema is the
        same either way: keys + one column per measure name."""
        proj = self.usable(group_keys, measures)
        if proj is None:
            if fact is None:
                raise ValueError("no usable projection and no fact table given")
            return fact.groupBy(*group_keys).agg(
                *[_direct_agg(kind, col, m) for m, (kind, col) in measures.items()]
            )
        summary = self._summary_df(proj, self._projections[proj.name][1])
        return summary.groupBy(*group_keys).agg(
            *[_merge_agg(kind, m) for m, (kind, _) in measures.items()]
        )


def _direct_agg(kind: str, col: str, alias: str) -> F.Column:
    """Fact-table fallback, state-discipline arithmetic so projection and
    direct paths are bit-identical."""
    if kind == "sum":
        return F.sum(F.col(col).cast("decimal(38,6)")).cast("double").alias(alias)
    if kind == "count":
        return F.count(col).alias(alias)
    if kind == "min":
        return F.min(col).alias(alias)
    if kind == "max":
        return F.max(col).alias(alias)
    if kind == "avg":
        return (
            F.sum(F.col(col).cast("decimal(38,6)")).cast("double") / F.count(col)
        ).alias(alias)
    if kind == "uniq":
        return F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(col).cast("string"), F.lit(12))
        ).alias(alias)
    raise ValueError(f"unknown measure kind {kind!r}")


def _merge_agg(kind: str, alias: str) -> F.Column:
    """State re-aggregation along coarser keys (the -Merge step)."""
    if kind == "sum":
        return F.sum(alias + _STATE["sum"]).cast("double").alias(alias)
    if kind == "count":
        return F.sum(alias + _STATE["count"]).alias(alias)
    if kind == "min":
        return F.min(alias + _STATE["min"]).alias(alias)
    if kind == "max":
        return F.max(alias + _STATE["max"]).alias(alias)
    if kind == "avg":
        return (
            F.sum(alias + _STATE["sum"]).cast("double")
            / F.sum(alias + _STATE["count"])
        ).alias(alias)
    if kind == "uniq":
        return F.hll_sketch_estimate(
            F.hll_union_agg(alias + _STATE["uniq"])
        ).alias(alias)
    raise ValueError(f"unknown measure kind {kind!r}")


def merge_summaries(proj: Projection, *summaries: DataFrame) -> DataFrame:
    """Incremental maintenance (AggregatingMergeTree's merge-on-compact): new
    partitions contribute their OWN summaries; union + state re-merge at the
    projection's full key grain yields the updated summary with no fact
    rescan.  States merge exactly (decimal sums, count sums, min/max, HLL
    union), so the merged summary answers queries identically to a full
    rebuild — gated by test_projection_incremental_maintenance."""
    base = summaries[0]
    for s in summaries[1:]:
        base = base.unionByName(s)
    aggs: list[F.Column] = []
    seen: set[str] = set()
    for m, (kind, _col) in proj.measures.items():
        for k in ("sum", "count") if kind == "avg" else (kind,):
            state = m + _STATE[k]
            if state in seen:
                continue
            seen.add(state)
            if k in ("sum", "count"):
                aggs.append(F.sum(state).alias(state))
            elif k == "min":
                aggs.append(F.min(state).alias(state))
            elif k == "max":
                aggs.append(F.max(state).alias(state))
            elif k == "uniq":
                aggs.append(F.hll_union_agg(state).alias(state))
            else:
                raise ValueError(f"unknown measure kind {k!r}")
    return base.groupBy(*proj.keys).agg(*aggs)
