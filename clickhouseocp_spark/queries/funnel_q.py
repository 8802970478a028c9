"""Funnel / retention queries (ClickHouse windowFunnel & retention — the
events-analytics aggregates, SURVEY.md §2.4 scope)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from clickhouseocp_spark.catalog import load_table
from clickhouseocp_spark.operators.funnel import (
    retention,
    sequence_count,
    sequence_match,
    window_funnel,
)
from clickhouseocp_spark.queries import register

_FUNNEL_WINDOW_S = 7 * 86400  # 7 days


@register(
    "retention_steps",
    oracle="""
SELECT user_id,
       CAST(max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS INTEGER) AS r_signup,
       CAST(max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
            * max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS INTEGER) AS r_click,
       CAST(max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
            * max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS INTEGER) AS r_purchase
FROM events GROUP BY user_id
""",
    tags=("funnel", "agg"),
)
def retention_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """retention(signup, click, purchase): first condition gates the rest
    (operators/funnel.retention)."""
    ev = load_table(spark, sf_dir, "events")
    return retention(
        ev,
        key="user_id",
        conds=[
            F.col("event_type") == "signup",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        aliases=["r_signup", "r_click", "r_purchase"],
    )


@register(
    "window_funnel_depth",
    oracle=f"""
WITH e AS (
  SELECT user_id, ts,
         CASE WHEN event_type = 'signup' THEN 1
              WHEN event_type = 'click' THEN 2
              WHEN event_type = 'purchase' THEN 3 END AS step
  FROM events WHERE event_type IN ('signup', 'click', 'purchase')
)
SELECT u.user_id,
       CAST(CASE
         WHEN EXISTS (SELECT 1 FROM e a JOIN e b ON a.user_id = b.user_id AND b.ts > a.ts
                        JOIN e c ON b.user_id = c.user_id AND c.ts > b.ts
                      WHERE a.user_id = u.user_id AND a.step = 1 AND b.step = 2 AND c.step = 3
                        AND epoch(c.ts) - epoch(a.ts) <= {_FUNNEL_WINDOW_S}) THEN 3
         WHEN EXISTS (SELECT 1 FROM e a JOIN e b ON a.user_id = b.user_id AND b.ts > a.ts
                      WHERE a.user_id = u.user_id AND a.step = 1 AND b.step = 2
                        AND epoch(b.ts) - epoch(a.ts) <= {_FUNNEL_WINDOW_S}) THEN 2
         WHEN EXISTS (SELECT 1 FROM e a WHERE a.user_id = u.user_id AND a.step = 1) THEN 1
         ELSE 0 END AS INTEGER) AS level
FROM (SELECT DISTINCT user_id FROM e) u
""",
    tags=("funnel", "agg"),
)
def window_funnel_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel(7 days)(ts, signup, click, purchase): deepest strictly-
    ordered step chain whose span fits the window (operators/funnel.
    window_funnel, max-chain-start fold via applyInPandas).  The oracle states
    the same semantics declaratively as EXISTS-chains."""
    ev = load_table(spark, sf_dir, "events")
    return window_funnel(
        ev,
        key="user_id",
        ts_col="ts",
        step_conds=[
            F.col("event_type") == "signup",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        window_seconds=_FUNNEL_WINDOW_S,
    )


@register(
    "window_funnel_overlap",
    oracle=f"""
WITH e AS (
  SELECT user_id, ts, event_type FROM events
  WHERE event_type IN ('signup', 'click', 'purchase')
)
SELECT u.user_id,
       CAST(CASE
         WHEN EXISTS (SELECT 1 FROM e a JOIN e b ON a.user_id = b.user_id AND b.ts > a.ts
                        JOIN e c ON b.user_id = c.user_id AND c.ts > b.ts
                      WHERE a.user_id = u.user_id
                        AND a.event_type IN ('signup', 'click')
                        AND b.event_type IN ('click', 'purchase')
                        AND c.event_type = 'purchase'
                        AND epoch(c.ts) - epoch(a.ts) <= {_FUNNEL_WINDOW_S}) THEN 3
         WHEN EXISTS (SELECT 1 FROM e a JOIN e b ON a.user_id = b.user_id AND b.ts > a.ts
                      WHERE a.user_id = u.user_id
                        AND a.event_type IN ('signup', 'click')
                        AND b.event_type IN ('click', 'purchase')
                        AND epoch(b.ts) - epoch(a.ts) <= {_FUNNEL_WINDOW_S}) THEN 2
         WHEN EXISTS (SELECT 1 FROM e a WHERE a.user_id = u.user_id
                        AND a.event_type IN ('signup', 'click')) THEN 1
         ELSE 0 END AS INTEGER) AS level
FROM (SELECT DISTINCT user_id FROM e) u
""",
    tags=("funnel", "agg"),
)
def window_funnel_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel with OVERLAPPING step conditions: an event matching
    several conditions registers every one of them (CH semantics — a 'click'
    here can serve as step 1 or step 2 of the same user's funnel).  Guards the
    all-matches expansion in operators/funnel.window_funnel; the oracle states
    the chains with raw predicates, no per-event step assignment."""
    ev = load_table(spark, sf_dir, "events")
    return window_funnel(
        ev,
        key="user_id",
        ts_col="ts",
        step_conds=[
            F.col("event_type").isin("signup", "click"),
            F.col("event_type").isin("click", "purchase"),
            F.col("event_type") == "purchase",
        ],
        window_seconds=_FUNNEL_WINDOW_S,
    )


@register(
    "sequence_match_chain",
    oracle="""
WITH e AS (
  SELECT user_id, ts, event_type FROM events
  WHERE event_type IN ('signup', 'click', 'purchase')
)
SELECT u.user_id,
       CAST(EXISTS (
         SELECT 1 FROM e a
         JOIN e b ON b.user_id = a.user_id AND b.ts > a.ts
                 AND epoch(b.ts) - epoch(a.ts) <= 86400
         JOIN e c ON c.user_id = b.user_id AND c.ts > b.ts
         WHERE a.user_id = u.user_id AND a.event_type = 'signup'
           AND b.event_type = 'click' AND c.event_type = 'purchase'
       ) AS INTEGER) AS matched
FROM (SELECT DISTINCT user_id FROM e) u
""",
    tags=("funnel", "agg"),
)
def sequence_match_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceMatch('(?1)(?t<=86400)(?2).*(?3)'): signup, click within a day
    of it, then a purchase any time later (operators/funnel.sequence_match,
    min/max achievable-time DP).  Oracle restates it as an EXISTS chain."""
    ev = load_table(spark, sf_dir, "events")
    return sequence_match(
        ev,
        key="user_id",
        ts_col="ts",
        step_conds=[
            F.col("event_type") == "signup",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        time_constraints=[("<=", 86400), None],
    )


@register(
    "sequence_count_pairs",
    oracle="""
WITH m AS (
  SELECT user_id, ts,
         CASE WHEN event_type = 'signup' THEN 1 ELSE 2 END AS step
  FROM events WHERE event_type IN ('signup', 'click')
),
l AS (
  SELECT user_id, step,
         lag(step) OVER (PARTITION BY user_id ORDER BY ts, step) AS prev
  FROM m
)
SELECT user_id, CAST(count(*) FILTER (WHERE step = 2 AND prev = 1) AS BIGINT) AS n_chains
FROM l GROUP BY user_id
""",
    tags=("funnel", "agg"),
)
def sequence_count_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceCount('(?1)(?2)'): greedy non-overlapping signup→click chains
    per user (operators/funnel.sequence_count).  The oracle uses the
    independent run-collapse identity: greedy 2-step chain count = number of
    1→2 transitions in the (ts, step)-ordered matching-event sequence —
    a strong cross-formulation check of the fold."""
    ev = load_table(spark, sf_dir, "events")
    return sequence_count(
        ev,
        key="user_id",
        ts_col="ts",
        step_conds=[
            F.col("event_type") == "signup",
            F.col("event_type") == "click",
        ],
    )


@register(
    "sequence_next_node",
    oracle="""
WITH o AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
)
SELECT user_id,
       CASE WHEN event_type = 'view' AND e2 = 'click' THEN nxt END AS next_node
FROM o WHERE rn = 1
""",
    tags=("funnel", "agg"),
)
def sequence_next_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sequenceNextNode('forward', 'head')(ts, event_type,
    event_type = 'view', event_type = 'click')``: per user, if the FIRST two
    events (by ts, id-tiebroken) match the chain view→click, emit the event
    that follows — the "where do users go next" navigation aggregate.  One
    window over the user partition, head row kept: a single shuffle on the
    user key, no self-joins (the adjacency is expressed with lead())."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("nxt"),
    )
    return o.filter(F.col("rn") == 1).select(
        "user_id",
        F.when(
            (F.col("event_type") == "view") & (F.col("e2") == "click"),
            F.col("nxt"),
        ).alias("next_node"),
    )


@register(
    "window_funnel_strict_order",
    oracle=f"""
WITH e AS (
  SELECT user_id, ts, event_id,
         event_type = 'signup' AS m1,
         event_type = 'click' AS m2,
         event_type = 'purchase' AS m3
  FROM events WHERE event_type IN ('signup', 'click', 'purchase')
),
probes AS (
  SELECT user_id,
         m1,
         COALESCE(LEAD(m2, 1) OVER w, FALSE) AS n2,
         COALESCE(LEAD(m3, 2) OVER w, FALSE) AS n3,
         epoch(ts) AS t0,
         epoch(LEAD(ts, 1) OVER w) AS t1,
         epoch(LEAD(ts, 2) OVER w) AS t2
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(COALESCE(MAX(CASE
         WHEN m1 AND n2 AND n3 AND t2 - t0 <= {{w}} THEN 3
         WHEN m1 AND n2 AND t1 - t0 <= {{w}} THEN 2
         WHEN m1 THEN 1 END), 0) AS INTEGER) AS level
FROM probes GROUP BY user_id
""".format(w=7 * 86400),
    tags=("funnel", "agg"),
)
def window_funnel_strict_order_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel(7 days, 'strict_order')(ts, signup, click, purchase):
    interleaving funnel events interrupt the chain, so a level-L chain is L
    CONSECUTIVE rows of the user's funnel stream
    (operators/funnel.window_funnel_strict_order — lead-probe windows, one
    shuffle).  The oracle states the same consecutive-run semantics with
    DuckDB lead windows; by construction level_strict_order ≤ the default
    mode's level."""
    from clickhouseocp_spark.operators.funnel import window_funnel_strict_order

    ev = load_table(spark, sf_dir, "events")
    return window_funnel_strict_order(
        ev.where(F.col("event_type").isin("signup", "click", "purchase")),
        key="user_id",
        ts_col="ts",
        step_conds=[
            F.col("event_type") == "signup",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        window_seconds=7 * 86400,
        tiebreak_col="event_id",
    )
