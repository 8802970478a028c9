"""Funnel / retention / sequence analytics (ClickHouse windowFunnel,
retention, sequenceMatch, sequenceCount — the signature events-analysis
aggregates in the pinned engine's AggregateFunctions family, SURVEY.md §2.4
scope note).

- :func:`retention`: per key, flag array [any(cond1), any(cond1)&any(cond2),
  ...] — pure conditional aggregation, one shuffle.
- :func:`window_funnel`: max funnel depth per key — the longest step chain
  with strictly increasing timestamps whose span from the chain's first event
  fits in ``window``.  The max-chain-start recurrence (greedy max-start is
  exact for exists-chain semantics: any chain's start time is ≤ the best
  start at its level) is evaluated level-by-level with JVM window functions —
  ``max(prev_level_start) OVER (PARTITION BY key ORDER BY ts RANGE BETWEEN
  UNBOUNDED PRECEDING AND 1 PRECEDING)`` — so the whole operator is one
  shuffle + one sort, no Python on the data plane, and the strictly-preceding
  RANGE frame enforces strict ts increase for free.
- :func:`sequence_match`: does a chain matching the pattern exist?  Supports
  the (?N) / .* / single (?t OP n) -per-edge subset of CH's pattern syntax.
  Exact via a min/max achievable-time DP per level (each edge constraint is a
  one-sided predicate on the previous matched time, so the extremes decide
  feasibility; chain state is Markov in the last matched time).  Same
  JVM-window evaluation as :func:`window_funnel`.
- :func:`sequence_count`: greedy count of non-overlapping chains (restart
  after each completion — CH's documented search strategy), no time
  constraints.  Genuinely sequential state → applyInPandas fold, O(#steps)
  state per group.
- :func:`window_funnel_pandas` / :func:`sequence_match_pandas`: independent
  applyInPandas fold implementations of the same recurrences, kept as
  cross-checks (pytest asserts they match the window versions on fixtures).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _ts_ns(series):
    """Timestamp pandas Series → int64 ns since epoch, robust to the Arrow
    batch arriving as datetime64[ns] or datetime64[us]."""
    import pandas as pd

    if pd.api.types.is_datetime64_any_dtype(series):
        return series.dt.as_unit("ns").astype("int64").to_numpy()
    return series.astype("int64").to_numpy()


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


_STRICTLY_BEFORE = (Window.unboundedPreceding, -1)


def window_funnel(
    df: DataFrame,
    key: str,
    ts_col: str,
    step_conds: Sequence[Column],
    window_seconds: int,
) -> DataFrame:
    """windowFunnel(window)(ts, cond1, ..., condN): per key, the deepest level
    L such that events e1 < e2 < ... < eL exist with e_i matching cond_i,
    strictly increasing ts, and ts(eL) - ts(e1) <= window.  An event
    registers **every** condition it matches (CH semantics — one chain slot
    per matching condition), so overlapping conditions are handled exactly;
    an event still cannot fill two adjacent slots itself because ts must
    strictly increase.

    Level-by-level window evaluation of the max-chain-start recurrence:
    ``__s{s}`` at an event holds the best (max) chain start achieving level s
    *through this event*; feasibility at level s needs only the running max
    of ``__s{s-1}`` over strictly-earlier events (RANGE ... AND 1 PRECEDING
    on microsecond ts).  One shuffle on ``key``, one sort, all JVM."""
    n = len(step_conds)
    events = _multi_step_events(df, key, ts_col, step_conds).withColumn(
        "__tus", F.unix_micros(F.col("__ts"))
    )

    w = Window.partitionBy("__k").orderBy("__tus").rangeBetween(*_STRICTLY_BEFORE)
    win_us = int(window_seconds) * 1_000_000
    cur = events.withColumn(
        "__s1", F.when(F.col("__step") == 1, F.col("__tus"))
    )
    for s in range(2, n + 1):
        best_prev = F.max(f"__s{s - 1}").over(w)
        cur = cur.withColumn(
            f"__s{s}",
            F.when(
                (F.col("__step") == s) & (best_prev >= F.col("__tus") - win_us),
                best_prev,
            ),
        )
    level = F.greatest(
        F.lit(0),
        *[
            F.max(F.when(F.col(f"__s{s}").isNotNull(), F.lit(s)))
            for s in range(1, n + 1)
        ],
    )
    return cur.groupBy("__k").agg(level.alias("level")).withColumnRenamed("__k", key)


def window_funnel_pandas(
    df: DataFrame,
    key: str,
    ts_col: str,
    step_conds: Sequence[Column],
    window_seconds: int,
) -> DataFrame:
    """Reference applyInPandas fold for :func:`window_funnel` (same
    max-chain-start recurrence over the same all-matches event expansion,
    evaluated sequentially per key group)."""
    import pandas as pd

    n_steps = len(step_conds)
    events = _multi_step_events(df, key, ts_col, step_conds)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__ts", "__step"], kind="mergesort")
        best_start = [None] * (n_steps + 1)  # best_start[s]: max chain start achieving level s
        ts_ns = _ts_ns(pdf["__ts"])
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


def _multi_step_events(
    df: DataFrame, key: str, ts_col: str, step_conds: Sequence[Column]
) -> DataFrame:
    """One row per (event, matching condition index+1); events matching no
    condition are dropped (CH: non-matching events are invisible to the
    pattern).  An event may match several conditions → several rows."""
    arr = F.array(*[F.when(c, F.lit(i + 1)) for i, c in enumerate(step_conds)])
    return df.select(
        F.col(key).alias("__k"),
        # cast: parquet TIMESTAMP_NTZ columns must become TIMESTAMP for
        # unix_micros; session tz is pinned UTC (session.py) so the map is
        # monotone and identical across the JVM and pandas implementations
        F.col(ts_col).cast("timestamp").alias("__ts"),
        F.explode(F.array_compact(arr)).alias("__step"),
    )


def _check_edges(
    time_constraints: Sequence[tuple[str, int] | None] | None, n: int
) -> list[tuple[str, int] | None]:
    edges = list(time_constraints or [None] * (n - 1))
    if len(edges) != n - 1:
        raise ValueError("need one time constraint slot per adjacent pair")
    for e in edges:
        if e is not None and e[0] not in ("<=", "<", ">=", ">"):
            raise ValueError(f"bad time op {e[0]!r}")
    return edges


def sequence_match(
    df: DataFrame,
    key: str,
    ts_col: str,
    step_conds: Sequence[Column],
    time_constraints: Sequence[tuple[str, int] | None] | None = None,
) -> DataFrame:
    """sequenceMatch('(?1)[(?t OP n)](?2)...')(ts, cond1, ..., condN): per
    key, 1 iff an event chain e1 < e2 < ... < eN (strictly increasing ts)
    exists with e_i matching cond_i and each adjacent pair satisfying its
    optional time constraint ``(op, seconds)`` with op in {<=, <, >=, >}.

    Exact min/max DP: per level keep the min and max achievable matched-event
    time.  Each edge check is one-sided in the previous matched time
    (<=n ⟺ prev >= t-n → check max; >=n ⟺ prev <= t-n → check min), so the
    extremes decide feasibility; chain state is Markov in the last matched
    time.  Evaluated level-by-level with JVM window functions over a
    strictly-preceding RANGE frame (microsecond ts — strict increase for
    free): one shuffle on ``key``, one sort, no Python."""
    n = len(step_conds)
    edges = _check_edges(time_constraints, n)
    events = _multi_step_events(df, key, ts_col, step_conds).withColumn(
        "__tus", F.unix_micros(F.col("__ts"))
    )
    w = Window.partitionBy("__k").orderBy("__tus").rangeBetween(*_STRICTLY_BEFORE)
    cur = events.withColumn("__a1", F.when(F.col("__step") == 1, F.col("__tus")))
    for s in range(2, n + 1):
        edge = edges[s - 2]
        prev_hi = F.max(f"__a{s - 1}").over(w)
        if edge is None:
            feasible = prev_hi.isNotNull()
        else:
            op, sec = edge
            lim = F.col("__tus") - F.lit(int(sec) * 1_000_000)
            if op == "<=":
                feasible = prev_hi >= lim
            elif op == "<":
                feasible = prev_hi > lim
            elif op == ">=":
                feasible = F.min(f"__a{s - 1}").over(w) <= lim
            else:  # ">"
                feasible = F.min(f"__a{s - 1}").over(w) < lim
        cur = cur.withColumn(
            f"__a{s}", F.when((F.col("__step") == s) & feasible, F.col("__tus"))
        )
    matched = F.max(
        F.when(F.col(f"__a{n}").isNotNull(), F.lit(1)).otherwise(F.lit(0))
    )
    return (
        cur.groupBy("__k").agg(matched.alias("matched")).withColumnRenamed("__k", key)
    )


def sequence_match_pandas(
    df: DataFrame,
    key: str,
    ts_col: str,
    step_conds: Sequence[Column],
    time_constraints: Sequence[tuple[str, int] | None] | None = None,
) -> DataFrame:
    """Reference applyInPandas fold for :func:`sequence_match` (same min/max
    achievable-time DP evaluated sequentially per key group)."""
    import pandas as pd

    n = len(step_conds)
    edges = _check_edges(time_constraints, n)
    edges_ns = [
        None if e is None else (e[0], int(e[1]) * 1_000_000_000) for e in edges
    ]
    events = _multi_step_events(df, key, ts_col, step_conds)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__ts", "__step"], kind="mergesort")
        lo = [None] * (n + 1)
        hi = [None] * (n + 1)
        ts_ns = _ts_ns(pdf["__ts"])
        steps = pdf["__step"].to_numpy()
        pending: list[tuple[int, int]] = []
        prev_t = None

        def flush() -> None:
            for lv, t in pending:
                if lo[lv] is None or t < lo[lv]:
                    lo[lv] = t
                if hi[lv] is None or t > hi[lv]:
                    hi[lv] = t
            pending.clear()

        for t, s in zip(ts_ns, steps):
            if prev_t is not None and t != prev_t:
                flush()
            prev_t = t
            s = int(s)
            if s == 1:
                pending.append((1, t))
            elif hi[s - 1] is not None:
                c = edges_ns[s - 2]
                if c is None:
                    ok = True
                else:
                    op, lim = c
                    if op == "<=":
                        ok = hi[s - 1] >= t - lim
                    elif op == "<":
                        ok = hi[s - 1] > t - lim
                    elif op == ">=":
                        ok = lo[s - 1] <= t - lim
                    elif op == ">":
                        ok = lo[s - 1] < t - lim
                    else:
                        raise ValueError(f"bad time op {op!r}")
                if ok:
                    pending.append((s, t))
        flush()
        matched = 1 if hi[n] is not None else 0
        return pd.DataFrame({"__k": [pdf["__k"].iloc[0]], "matched": [matched]})

    return (
        events.groupBy("__k")
        .applyInPandas(
            fold, schema=f"__k {df.schema[key].dataType.simpleString()}, matched int"
        )
        .withColumnRenamed("__k", key)
    )


def sequence_count(
    df: DataFrame, key: str, ts_col: str, step_conds: Sequence[Column]
) -> DataFrame:
    """sequenceCount('(?1)(?2)...')(ts, cond1, ..., condN): per key, greedy
    count of non-overlapping chains — after a chain completes, the search
    restarts at the next event (CH's documented strategy; greedy
    earliest-advance maximizes the count for constraint-free patterns).
    Same-second order is undefined in CH; we pin (ts, step) ascending so
    results are deterministic and oracle-expressible."""
    import pandas as pd

    n = len(step_conds)
    events = _multi_step_events(df, key, ts_col, step_conds)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__ts", "__step"], kind="mergesort")
        level = 0
        cnt = 0
        for s in pdf["__step"].to_numpy():
            if int(s) == level + 1:
                level += 1
                if level == n:
                    cnt += 1
                    level = 0
        return pd.DataFrame({"__k": [pdf["__k"].iloc[0]], "n_chains": [cnt]})

    return (
        events.groupBy("__k")
        .applyInPandas(
            fold, schema=f"__k {df.schema[key].dataType.simpleString()}, n_chains long"
        )
        .withColumnRenamed("__k", key)
    )


def window_funnel_strict_order(
    df: DataFrame,
    key: str,
    ts_col: str,
    step_conds: Sequence[Column],
    window_seconds: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """windowFunnel(window, 'strict_order')(ts, cond1, ..., condN): CH's
    strict_order mode — interleaving funnel events interrupt the chain
    (A→B→D→C finds A→B and stops at D), so a level-L chain is L CONSECUTIVE
    rows of the key's funnel-event stream matching cond1..condL with the
    window bound on the span.

    That consecutiveness makes the windows form simple: one row_number per
    key stream + lead(condition, i) probes — one shuffle, one sort, no
    Python.  ``tiebreak_col`` pins the stream order under equal timestamps
    (pass the event id; required for deterministic results)."""
    n = len(step_conds)
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    matched = df.select(
        F.col(key).alias("__k"),
        F.col(ts_col).alias("__ts"),
        *([F.col(tiebreak_col).alias("__tb")] if tiebreak_col else []),
        *[c.cast("boolean").alias(f"__m{i+1}") for i, c in enumerate(step_conds)],
    ).where(F.greatest(*[F.col(f"__m{i+1}") for i in range(n)]))
    w = Window.partitionBy("__k").orderBy(
        "__ts", *(["__tb"] if tiebreak_col else [])
    )
    cur = matched.withColumn(
        "__tus", F.unix_micros(F.col("__ts").cast("timestamp"))
    )
    win_us = int(window_seconds) * 1_000_000
    per_row = cur.select(
        "__k",
        *[
            (
                F.when(
                    F.col("__m1")
                    & _strict_chain(w, s)
                    & (
                        (F.lead("__tus", s - 1).over(w) - F.col("__tus") <= win_us)
                        if s > 1
                        else F.lit(True)
                    ),
                    F.lit(s),
                )
            ).alias(f"__l{s}")
            for s in range(1, n + 1)
        ],
    )
    level = F.greatest(
        F.lit(0), *[F.max(F.col(f"__l{s}")) for s in range(1, n + 1)]
    )
    return (
        per_row.groupBy("__k").agg(level.alias("level"))
        .withColumnRenamed("__k", key)
    )


def _strict_chain(w, s: int) -> Column:
    """lead-probe conjunction: the (i)th following row matches cond i+1."""
    chain = F.lit(True)
    for i in range(1, s):
        chain = chain & F.coalesce(F.lead(f"__m{i+1}", i).over(w), F.lit(False))
    return chain


def sequence_match_events(
    df: DataFrame,
    key: str,
    ts_col: str,
    step_conds: Sequence[Column],
) -> DataFrame:
    """sequenceMatchEvents('(?1)(?2)...(?N)')(ts, cond1, ..., condN) — the
    CH 24.x aggregate returning the TIMESTAMPS of the matched event chain,
    not just a flag.  Subset: the pure-chain pattern (no ``(?t)`` time
    constraints), returning the greedy-earliest chain — the first cond1
    event, then the first cond2 event strictly after it, and so on.
    Greedy-earliest is complete for subsequence existence (any later chain
    start can be replaced by an earlier one), so ``events`` is non-NULL
    exactly when :func:`sequence_match` matches.

    Lowering: events are pruned to rows matching at least one condition
    (shuffle ships only candidate rows), grouped into one sorted struct
    array per key, then a single JVM ``aggregate`` fold appends an event's
    timestamp when it satisfies the next needed condition strictly after
    the last matched one.  One shuffle, no Python, state is the ≤N-element
    timestamp array."""
    n = len(step_conds)
    if n < 1:
        raise ValueError("sequence_match_events needs at least one condition")
    flags = [c.cast("boolean").alias(f"__c{i + 1}") for i, c in enumerate(step_conds)]
    ev = df.select(F.col(key).alias("__k"), F.col(ts_col).alias("__ts"), *flags)
    any_cond = F.lit(False)
    for i in range(n):
        any_cond = any_cond | F.coalesce(F.col(f"__c{i + 1}"), F.lit(False))
    ev = ev.where(any_cond)
    grouped = ev.groupBy("__k").agg(
        F.array_sort(
            F.collect_list(F.struct("__ts", *[f"__c{i + 1}" for i in range(n)]))
        ).alias("__evs")
    )
    branches = " ".join(
        f"WHEN size(st) = {i} AND e.__c{i + 1} "
        + ("" if i == 0 else "AND e.__ts > element_at(st, -1) ")
        + "THEN array_append(st, e.__ts)"
        for i in range(n)
    )
    fold = F.expr(
        "aggregate(__evs, CAST(array() AS array<timestamp>), "
        f"(st, e) -> CASE {branches} ELSE st END)"
    )
    return grouped.select(
        F.col("__k").alias(key),
        F.when(F.size(fold) == n, fold).alias("events"),
    )
