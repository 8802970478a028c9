"""Funnel / retention analytics (ClickHouse windowFunnel, retention — the
signature events-analysis aggregates in the pinned engine's
AggregateFunctions family, SURVEY.md §2.4 scope note).

- :func:`retention`: per key, flag array [any(cond1), any(cond1)&any(cond2),
  ...] — pure conditional aggregation, one shuffle.
- :func:`window_funnel`: max funnel depth per key — the longest step chain
  with strictly increasing timestamps whose span from the chain's first event
  fits in ``window``.  Computed with a max-chain-start fold over the key's
  time-sorted events (greedy max-start is exact for exists-chain semantics:
  any chain's start time is ≤ the fold's best start at its level).  Runs per
  key group via applyInPandas — the sanctioned path for custom order-sensitive
  stateful aggregates; each group's state is O(#steps).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def retention(
    df: DataFrame, key: str, conds: Sequence[Column], aliases: Sequence[str]
) -> DataFrame:
    """retention(cond1, ..., condN): r1 = any(cond1); r_i = any(cond1) AND
    any(cond_i) — per key."""
    anys = [F.max(c.cast("int")).alias(f"__a{i}") for i, c in enumerate(conds)]
    agged = df.groupBy(key).agg(*anys)
    out = [F.col("__a0").alias(aliases[0])]
    for i in range(1, len(conds)):
        out.append(
            (F.col("__a0").cast("boolean") & F.col(f"__a{i}").cast("boolean"))
            .cast("int")
            .alias(aliases[i])
        )
    return agged.select(key, *out)


def window_funnel(
    df: DataFrame,
    key: str,
    ts_col: str,
    step_conds: Sequence[Column],
    window_seconds: int,
) -> DataFrame:
    """windowFunnel(window)(ts, cond1, ..., condN): per key, the deepest level
    L such that events e1 < e2 < ... < eL exist with e_i matching cond_i,
    strictly increasing ts, and ts(eL) - ts(e1) <= window."""
    import pandas as pd

    n_steps = len(step_conds)
    # step = CASE WHEN cond1 THEN 1 WHEN cond2 THEN 2 ... END — first
    # matching condition wins, like CH (conditions checked in order)
    expr = None
    for i, c in enumerate(step_conds):
        expr = F.when(c, i + 1) if expr is None else expr.when(c, i + 1)
    events = df.select(
        F.col(key).alias("__k"),
        F.col(ts_col).alias("__ts"),
        expr.alias("__step"),
    ).filter(F.col("__step").isNotNull())

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__ts"], kind="mergesort")
        best_start = [None] * (n_steps + 1)  # best_start[s]: max chain start achieving level s
        ts_ns = pdf["__ts"].astype("int64").to_numpy()  # ns since epoch
        steps = pdf["__step"].to_numpy()
        win_ns = window_seconds * 1_000_000_000
        # Strict increase: events sharing a timestamp must all extend against
        # the state as of the previous distinct timestamp, so buffer updates
        # within a ts group and merge when ts advances.
        pending: list[tuple[int, int]] = []  # (level, chain_start)
        prev_t = None
        for t, s in zip(ts_ns, steps):
            if prev_t is not None and t != prev_t:
                for lv, st in pending:
                    if best_start[lv] is None or st > best_start[lv]:
                        best_start[lv] = st
                pending.clear()
            prev_t = t
            s = int(s)
            if s == 1:
                pending.append((1, t))
            elif best_start[s - 1] is not None and t - best_start[s - 1] <= win_ns:
                pending.append((s, best_start[s - 1]))
        for lv, st in pending:
            if best_start[lv] is None or st > best_start[lv]:
                best_start[lv] = st
        level = max((s for s in range(1, n_steps + 1) if best_start[s] is not None), default=0)
        return pd.DataFrame({"__k": [pdf["__k"].iloc[0]], "level": [level]})

    return (
        events.groupBy("__k")
        .applyInPandas(fold, schema=f"__k {df.schema[key].dataType.simpleString()}, level int")
        .withColumnRenamed("__k", key)
    )
