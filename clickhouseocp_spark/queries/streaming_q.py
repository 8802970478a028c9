"""Streaming surface queries (SURVEY.md §2.9) — bounded file streams through
real Structured Streaming queries (availableNow trigger, checkpointed state),
checked against batch SQL oracles.  With a single bounded input batch no rows
fall behind the watermark, so streaming output must equal the batch result —
the discipline that makes streaming semantics oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from clickhouseocp_spark.queries import register
from clickhouseocp_spark.queries._util import sql_fsum
from clickhouseocp_spark.streaming.pipeline import (
    events_stream,
    hopping_window_counts,
    materialized_view,
    run_available_now,
    session_window_stats,
    stateful_running_totals,
    streaming_dedup_counts,
    tumbling_window_counts,
)


@register(
    "stream_tumbling_window",
    oracle=f"""
SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS win_start,
       COUNT(*) AS n, {sql_fsum('value', 'sum_value')}
FROM events GROUP BY event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)
""",
    tags=("streaming",),
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WindowView tumble analog: 1-day tumbling windows + watermark over a
    bounded event stream; equals the batch day-bucket aggregation."""
    return run_available_now(
        tumbling_window_counts(events_stream(spark, sf_dir), "1 day", "1 hour")
    )


@register(
    "stream_hopping_window",
    oracle=f"""
SELECT event_type,
       TIMESTAMP '1970-01-01 00:00:00'
         + INTERVAL 1 SECOND * ((CAST(floor(epoch(ts) / 21600) AS BIGINT) - h.i) * 21600)
         AS win_start,
       COUNT(*) AS n, {sql_fsum('value', 'sum_value')}
FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) h
GROUP BY 1, 2
""",
    tags=("streaming",),
)
def stream_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WindowView HOP analog: 1-day windows sliding every 6 hours (each event
    in exactly 4 overlapping windows) + watermark.  Oracle expands each event
    to its 4 epoch-aligned hop starts — floor(ts/slide)*slide - i*slide for
    i in 0..3 — which is precisely ``F.window(ts, size, slide)``'s window set
    when size = 4*slide."""
    return run_available_now(
        hopping_window_counts(events_stream(spark, sf_dir), "1 day", "6 hours", "1 hour")
    )


@register(
    "stream_session_window",
    oracle="""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
)
SELECT user_id, min(ts) AS session_start, COUNT(*) AS n_events
FROM numbered GROUP BY user_id, sid
""",
    tags=("streaming",),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user over the stream — beyond the
    reference's surface (CH has no session windows); oracle is the
    gaps-and-islands batch formulation."""
    return run_available_now(
        session_window_stats(events_stream(spark, sf_dir), "30 minutes")
    )


@register(
    "stream_dedup",
    oracle="""
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_unique_users
FROM events GROUP BY event_type
""",
    tags=("streaming",),
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup on (user_id, event_type) → per-type unique
    user counts; equals batch COUNT(DISTINCT)."""
    return run_available_now(streaming_dedup_counts(events_stream(spark, sf_dir)))


@register(
    "stream_materialized_view",
    oracle=f"""
SELECT event_type, COUNT(*) AS n, {sql_fsum('value', 'sum_value')}
FROM events GROUP BY event_type
""",
    tags=("streaming",),
)
def stream_materialized_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MaterializedView pipeline (the reference image's own query_log shape,
    Dockerfile:225-230): stream → foreachBatch append into a parquet target →
    read back and merge-aggregate; equals direct batch aggregation."""
    stream = events_stream(spark, sf_dir).select("event_type", "value", "ts")
    target, q = materialized_view(stream)
    q.awaitTermination()
    mv = spark.read.parquet(target)
    return mv.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
    )


@register(
    "stream_stateful_totals",
    oracle="""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events GROUP BY event_type
""",
    tags=("streaming", "stateful"),
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): running
    per-type totals in integer-cent state.  Totals are cumulative, so the
    max row per key is the drained-stream total — equal to the batch
    aggregate."""
    out = run_available_now(
        stateful_running_totals(events_stream(spark, sf_dir)),
        output_mode="append",
    )
    return out.groupBy("event_type").agg(
        F.max("n").alias("n"), F.max("total_cents").alias("total_cents")
    )


@register(
    "stream_windowed_topk",
    oracle="""
SELECT win_start, event_type, n FROM (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS win_start,
         event_type, COUNT(*) AS n,
         row_number() OVER (PARTITION BY CAST(date_trunc('day', ts) AS TIMESTAMP)
                            ORDER BY COUNT(*) DESC, event_type) AS rn
  FROM events GROUP BY 1, 2
) WHERE rn <= 3
""",
    tags=("streaming", "top_k"),
)
def stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window streaming top-k: the tumbling-window aggregate runs as a
    real streaming query (watermark + availableNow); the top-3 cut ranks the
    emitted window aggregates — the standard trending-items shape where the
    stream maintains counts and the sink query selects leaders."""
    from pyspark.sql import Window

    agg = run_available_now(
        tumbling_window_counts(events_stream(spark, sf_dir), "1 day", "1 hour")
    )
    w = Window.partitionBy("win_start").orderBy(
        F.col("n").desc(), F.col("event_type")
    )
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("win_start", "event_type", "n")
    )


@register(
    "stream_static_enrich",
    oracle=f"""
SELECT n_name, COUNT(*) AS n, {sql_fsum('value', 'sum_value')}
FROM events JOIN nation ON user_id % 25 = n_nationkey
GROUP BY n_name
""",
    tags=("streaming", "join"),
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment (the Kafka-engine + dictionary JOIN pattern,
    SURVEY §2.9): the event stream joins a static dimension (broadcast — the
    stream side never shuffles for the join) and aggregates per enriched key;
    equals the batch join+agg on a bounded input."""
    from clickhouseocp_spark.catalog import load_table
    from clickhouseocp_spark.queries._util import fsum

    stream = events_stream(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation")
    enriched = stream.join(
        F.broadcast(nation), stream.user_id % 25 == nation.n_nationkey
    )
    agg = enriched.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n"), fsum("value", "sum_value")
    )
    return run_available_now(agg, output_mode="complete")


@register(
    "stream_stream_join",
    oracle="""
SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
""",
    tags=("streaming", "join"),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (purchase within 30 min of a click, same
    user) with watermark-bounded join state on both sides; equals the batch
    interval join on the bounded stream
    (streaming/pipeline.stream_stream_interval_join)."""
    from clickhouseocp_spark.streaming.pipeline import stream_stream_interval_join

    return run_available_now(
        stream_stream_interval_join(events_stream(spark, sf_dir)),
        output_mode="append",
    )


@register(
    "stream_upsert_latest",
    oracle="""
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
    tags=("streaming", "mergetree"),
)
def stream_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ReplacingMergeTree: foreachBatch merges each micro-batch
    into a parquet target keeping the latest (ts, event_id) row per user —
    the upserted table equals the batch latest-per-key query
    (streaming/pipeline.foreach_batch_upsert)."""
    import tempfile

    from clickhouseocp_spark.streaming.pipeline import foreach_batch_upsert

    target = tempfile.mkdtemp(prefix="upsert_tgt_") + "/t"
    foreach_batch_upsert(events_stream(spark, sf_dir), target)
    return spark.read.parquet(target).select("user_id", "event_id", "event_type")


@register(
    "stream_sketch_rollup",
    oracle="""
SELECT event_type,
       ROUND(quantile_cont(value, 0.50), 6) AS exact_q50,
       ROUND(quantile_cont(value, 0.90), 6) AS exact_q90,
       COUNT(*) AS n,
       TRUE AS dd_ok
FROM events GROUP BY event_type ORDER BY event_type
""",
    tags=("streaming", "sketch", "mergetree"),
)
def stream_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming AggregatingMergeTree: the events stream feeds a persistent
    DDSketch STATE table via foreachBatch
    (streaming/pipeline.foreach_batch_sketch_rollup); the query reads the
    states back and pairs exact quantiles with the in-query ``dd_ok``
    relative-error contract — the Kafka → MV → -State pipeline of the
    reference, with estimates computed at read time and no event rescan."""
    import tempfile

    from clickhouseocp_spark.operators.sketches import quantile_dd_estimate
    from clickhouseocp_spark.streaming.pipeline import (
        foreach_batch_sketch_rollup,
    )

    alpha = 0.01
    target = tempfile.mkdtemp(prefix="sketch_tgt_") + "/t"
    foreach_batch_sketch_rollup(
        events_stream(spark, sf_dir), target, alpha=alpha
    )
    ests = spark.read.parquet(target).select(
        "event_type",
        quantile_dd_estimate(0.50, alpha).alias("__e50"),
        quantile_dd_estimate(0.90, alpha).alias("__e90"),
    )
    from clickhouseocp_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.50)"), 6).alias("exact_q50"),
        F.round(F.expr("percentile(value, 0.90)"), 6).alias("exact_q90"),
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "sort_array(collect_list(value))"
            "[cast(ceil(0.50 * count(value)) as int) - 1]"
        ).alias("__o50"),
        F.expr(
            "sort_array(collect_list(value))"
            "[cast(ceil(0.90 * count(value)) as int) - 1]"
        ).alias("__o90"),
    )
    tol = alpha + 1e-12
    return (
        exact.join(F.broadcast(ests), "event_type")
        .select(
            "event_type",
            "exact_q50",
            "exact_q90",
            "n",
            (
                (F.abs(F.col("__e50") / F.col("__o50") - 1.0) <= tol)
                & (F.abs(F.col("__e90") / F.col("__o90") - 1.0) <= tol)
            ).alias("dd_ok"),
        )
        .orderBy("event_type")
    )


@register(
    "stream_fulltext_index",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         unnest(list_distinct(
           list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'),
                       t -> t <> ''))) AS token
  FROM documents
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS df
FROM toks GROUP BY token ORDER BY df DESC, token LIMIT 10
""",
    tags=("streaming", "index", "text"),
)
def stream_fulltext_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained full-text index (round 6): the documents
    stream feeds a persistent postings table via foreachBatch
    (streaming/pipeline.foreach_batch_postings_rollup — exact associative
    set-union state, the CH Kafka → MV → full_text-index pipeline); the
    query reads the postings back and reports the top-10 tokens by document
    frequency.  Postings are EXACT, so the oracle replays directly from the
    batch documents table — streamed == batch with no tolerance."""
    import tempfile

    from clickhouseocp_spark.streaming.pipeline import (
        documents_stream,
        foreach_batch_postings_rollup,
    )

    target = tempfile.mkdtemp(prefix="ft_postings_") + "/t"
    foreach_batch_postings_rollup(documents_stream(spark, sf_dir), target)
    postings = spark.read.parquet(target)
    return (
        postings.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), "token")
        .limit(10)
    )


@register(
    "stream_url_dedup",
    oracle="""
WITH c AS (
  SELECT doc_id,
         'https://'
           || CASE WHEN doc_id % 3 = 2 THEN 'blog.example.com'
                   ELSE 'www.example.com' END
           || '/Posts/' || CAST(doc_id % 40 AS VARCHAR)
           || CASE WHEN doc_id % 5 IN (0, 1, 2) THEN '?a=1&b=2' ELSE '' END
           AS canonical_url
  FROM documents WHERE doc_id < 400
)
SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_dups,
       MIN(doc_id) AS keeper
FROM c GROUP BY canonical_url
""",
    tags=("streaming", "dedup", "url"),
)
def stream_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming URL-canonical dedup rollup — the crawl-ingest shape:
    each micro-batch canonicalizes its URLs (functions/text.py::
    canonicalize_url, pure JVM exprs inside the stream) and a stateful
    grouped aggregation maintains per-canonical counts + min-id keeper.
    Hash-agg state is one row per distinct canonical URL (bounded by the
    deduped corpus, not the stream); the drained stream equals the batch
    url_canonical_dedup closed form."""
    from clickhouseocp_spark.functions.text import canonicalize_url
    from clickhouseocp_spark.queries.llm import synthetic_crawl_url
    from clickhouseocp_spark.streaming.pipeline import (
        documents_stream,
        run_available_now,
    )

    stream = documents_stream(spark, sf_dir).where(F.col("doc_id") < 400)
    canon = stream.select(
        "doc_id",
        canonicalize_url(synthetic_crawl_url(F.col("doc_id"))).alias(
            "canonical_url"
        ),
    )
    agg = canon.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keeper")
    )
    return run_available_now(agg)


@register(
    "stream_scan_machine",
    oracle="""
WITH RECURSIVE base AS (
  SELECT user_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
m AS (
  SELECT user_id, 0 AS rn, 0 AS cur, CAST(0 AS BIGINT) AS mid,
         CAST(NULL AS TIMESTAMP) AS ts, CAST(NULL AS VARCHAR) AS event_type,
         FALSE AS emitted, CAST(0 AS BIGINT) AS emit_mid
  FROM (SELECT DISTINCT user_id FROM base)
  UNION ALL
  SELECT b.user_id, b.rn,
    CASE WHEN m.cur = 0 AND b.event_type = 'signup' THEN 1
         WHEN m.cur = 1 AND b.event_type = 'click' THEN 2
         WHEN m.cur = 2 AND b.event_type = 'purchase' THEN 0
         ELSE m.cur END,
    CASE WHEN m.cur = 2 AND b.event_type = 'purchase' THEN m.mid + 1
         ELSE m.mid END,
    b.ts, b.event_type,
    (m.cur = 0 AND b.event_type = 'signup')
      OR (m.cur = 1 AND b.event_type = 'click')
      OR (m.cur = 2 AND b.event_type = 'purchase'),
    m.mid
  FROM m JOIN base b ON b.user_id = m.user_id AND b.rn = m.rn + 1
)
SELECT user_id, ts, event_type, emit_mid AS m
FROM m WHERE emitted ORDER BY user_id, ts
""",
    tags=("streaming", "stateful", "scan"),
)
def stream_scan_machine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KQL ``scan`` machine on a STREAM (round 8): greedy
    signup→click→purchase matching per user via applyInPandasWithState —
    state = (step, match_id) per key, O(1) regardless of stream length.
    The bounded drain equals the batch scan, so the oracle is the same
    recursive-CTE machine replay as kql_scan_steps; cross-micro-batch
    state is pinned by a two-batch pytest in tests/test_operators.py."""
    from clickhouseocp_spark.streaming.pipeline import (
        events_stream,
        run_available_now,
        streaming_scan_machine,
    )

    return run_available_now(
        streaming_scan_machine(events_stream(spark, sf_dir)),
        output_mode="append",
    )


def _stream_scan_concurrent_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouseocp_spark.streaming.pipeline import (
        events_stream,
        run_available_now,
        streaming_scan_concurrent,
    )

    return run_available_now(
        streaming_scan_concurrent(events_stream(spark, sf_dir)),
        output_mode="append",
    )


@register(
    "stream_scan_concurrent",
    oracle="""
WITH RECURSIVE base AS (
  SELECT user_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
m AS (
  SELECT user_id, 0 AS rn, CAST(0 AS BIGINT) AS seq,
         CAST(NULL AS BIGINT) AS s1_mid, CAST(NULL AS BIGINT) AS s2_mid,
         CAST(NULL AS TIMESTAMP) AS ts, CAST(NULL AS VARCHAR) AS event_type,
         CAST(NULL AS VARCHAR) AS estep, CAST(0 AS BIGINT) AS emid
  FROM (SELECT DISTINCT user_id FROM base)
  UNION ALL
  SELECT b.user_id, b.rn,
    m.seq + CASE WHEN (m.s1_mid IS NULL
                       OR (m.s1_mid IS NOT NULL
                           AND b.event_type IN ('click', 'purchase')))
                      AND b.event_type = 'signup' THEN 1 ELSE 0 END,
    CASE WHEN m.s1_mid IS NOT NULL
              AND NOT (b.event_type IN ('click', 'purchase'))
         THEN m.s1_mid
         WHEN b.event_type = 'signup' THEN m.seq
         ELSE NULL END,
    CASE WHEN m.s1_mid IS NOT NULL
              AND b.event_type IN ('click', 'purchase') THEN m.s1_mid
         ELSE m.s2_mid END,
    b.ts, b.event_type,
    CASE WHEN b.event_type = 'signup' THEN 'start'
         WHEN (m.s1_mid IS NOT NULL OR m.s2_mid IS NOT NULL)
              AND b.event_type IN ('click', 'purchase') THEN 'act'
         ELSE NULL END,
    CASE WHEN b.event_type = 'signup'
              AND m.s1_mid IS NOT NULL THEN m.s1_mid
         WHEN b.event_type = 'signup' THEN m.seq
         WHEN m.s1_mid IS NOT NULL
              AND b.event_type IN ('click', 'purchase') THEN m.s1_mid
         WHEN m.s2_mid IS NOT NULL THEN m.s2_mid
         ELSE 0 END
  FROM m JOIN base b ON b.user_id = m.user_id AND b.rn = m.rn + 1
)
SELECT user_id, ts, event_type, emid AS m
FROM m WHERE estep IS NOT NULL ORDER BY user_id, ts
""",
    tags=("streaming", "kql", "scan", "funnel"),
)
def stream_scan_concurrent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The concurrent scan machine set on a STREAM (round 9): the same
    promotion/absorption/replacement rule set as ``scan kind=concurrent``
    (signup starts/absorbs, click/purchase promotes — replacing any
    slot-2 sequence — or absorbs), carried across micro-batches with
    state = (seq counter, one mid per slot) per key.  The bounded drain
    equals the batch machine exactly, so the oracle is the identical
    recursive-CTE rule-set replay (minus the declared counter, which the
    stream tier omits)."""
    return _stream_scan_concurrent_impl(spark, sf_dir)


@register(
    "stream_session_count",
    oracle="""
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
  FROM events WHERE ts IS NOT NULL),
l AS (SELECT user_id, t,
             lag(t) OVER (PARTITION BY user_id ORDER BY t) AS p FROM e)
SELECT make_timestamp((CAST(floor(t / 86400.0) AS BIGINT) * 86400)
                      * 1000000) AS ts,
       CAST(SUM(CASE WHEN p IS NULL OR t - p > 21600 THEN 1 ELSE 0 END)
            AS BIGINT) AS count_sessions
FROM l GROUP BY 1 ORDER BY ts
""",
    tags=("streaming", "activity"),
)
def stream_session_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``evaluate session_count`` (round 10): the
    micro-batch stream maintains ONE stateful per-user aggregation
    (sorted event-second list — state bounded by per-user activity, the
    stream_scan_machine contract); the drained batch then derives
    session starts (first event or gap > 6h) as a zero-exchange array
    filter and re-bins them per day.  The drained result equals the
    batch lag-window closed form the oracle replays — proving the
    incremental fold and the window form agree."""
    from clickhouseocp_spark.streaming.pipeline import (
        events_stream,
        run_available_now,
    )

    stream = events_stream(spark, sf_dir).where(F.col("ts").isNotNull())
    per_user = (
        stream.select("user_id", F.unix_timestamp("ts").alias("t"))
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("t")).alias("ts_list"))
    )
    drained = run_available_now(per_user)
    starts = drained.select(
        F.explode(
            F.expr(
                "filter(transform(ts_list, (__t, __i) -> "
                "IF(__i = 0 OR __t - element_at(ts_list, __i) > 21600, "
                "__t, NULL)), __x -> __x IS NOT NULL)"
            )
        ).alias("t")
    )
    return (
        starts.groupBy(
            ((F.col("t") / 86400).cast("long") * 86400).alias("__b")
        )
        .agg(F.count(F.lit(1)).alias("count_sessions"))
        .select(F.timestamp_seconds("__b").alias("ts"), "count_sessions")
        .orderBy("ts")
    )


@register(
    "stream_rolling_percentile",
    oracle="""
WITH b0 AS (
  SELECT value,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) * 86400 AS b0
  FROM events WHERE ts IS NOT NULL),
mx AS (SELECT max(b0) AS m FROM b0),
e AS (SELECT value,
             unnest(generate_series(b0, b0 + 6 * 86400, 86400)) AS b
      FROM b0)
SELECT make_timestamp(b * 1000000) AS ts,
       round(quantile_cont(value, 0.9), 6) AS p90
FROM e, mx WHERE b <= m GROUP BY b ORDER BY ts
""",
    tags=("streaming", "timeseries"),
)
def stream_rolling_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``evaluate rolling_percentile`` (round 10): the
    micro-batch stream fans each event into the 7 trailing bins it
    covers BEFORE the stateful aggregation (stateless explode inside the
    stream), and ONE stateful grouped percentile per bin accumulates
    across micro-batches — state is one group per report bin, bounded by
    the time axis, never the stream.  The drained result equals the
    batch fan-out closed form (phantom tail bins cut post-drain, where
    the global max is knowable)."""
    from clickhouseocp_spark.streaming.pipeline import (
        events_stream,
        run_available_now,
    )

    stream = events_stream(spark, sf_dir).where(F.col("ts").isNotNull())
    binned = stream.select(
        "value",
        (
            (F.unix_timestamp("ts") / 86400).cast("long") * 86400
        ).alias("b0"),
    )
    fanned = binned.select(
        "value",
        F.explode(
            F.sequence(
                F.col("b0"), F.col("b0") + 6 * 86400, F.lit(86400)
            )
        ).alias("b"),
    )
    agg = fanned.groupBy("b").agg(
        F.percentile("value", F.lit(0.9)).alias("p90")
    )
    drained = run_available_now(agg)
    # the largest HOME bin is the largest fanned bin minus the window
    # tail (every home fans to itself + 6 successors)
    mx = drained.agg((F.max("b") - 6 * 86400).alias("m"))
    return (
        drained.crossJoin(F.broadcast(mx))
        .where(F.col("b") <= F.col("m"))
        .select(
            F.timestamp_seconds("b").alias("ts"),
            F.round("p90", 6).alias("p90"),
        )
        .orderBy("ts")
    )


@register(
    "chsql_window_view_tumble_hop",
    oracle="""
WITH e AS (SELECT ts FROM events WHERE event_id < 400)
SELECT 'tumble' AS kind,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS ws,
       CAST(date_trunc('day', ts) + INTERVAL 1 DAY AS TIMESTAMP) AS we,
       count(*) AS n
FROM e GROUP BY 2, 3
UNION ALL
SELECT 'hop' AS kind,
       make_timestamp((CAST(floor(epoch(ts) / 43200) AS BIGINT) * 43200
            - 43200 * k.k) * 1000000) AS ws,
       make_timestamp((CAST(floor(epoch(ts) / 43200) AS BIGINT) * 43200
            - 43200 * k.k + 86400) * 1000000) AS we,
       count(*) AS n
FROM e CROSS JOIN (SELECT unnest([0, 1]) AS k) k GROUP BY 2, 3
UNION ALL
SELECT 'direct' AS kind,
       MIN(make_timestamp((
         CAST(floor((floor(epoch(ts)) - 86400) / 43200.0) AS BIGINT) * 43200
         + 43200) * 1000000)) AS ws,
       MAX(make_timestamp((
         CAST(floor((floor(epoch(ts)) - 86400) / 43200.0) AS BIGINT) * 43200
         + 43200 + 86400) * 1000000)) AS we,
       count(*) AS n
FROM e
ORDER BY kind, ws
""",
    tags=("streaming", "chsql", "window-view"),
)
def chsql_window_view_tumble_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CH WINDOW VIEW time-window tier as an oracle-backed registry
    query (VERDICT r12 missing #2 — it was pytest-only): ``tumble``/
    ``tumbleStart``/``tumbleEnd`` daily buckets, ``hop``/``hopStart``/
    ``hopEnd`` 1-day windows sliding 12 h (every event lands in exactly
    TWO windows — the 2-per-event invariant is checked by value: the hop
    branch replays both per-event window starts in DuckDB and the counts
    must match bucket-for-bucket), and the 3-arg DIRECT forms
    ``hopStart(ts, slide, size)``/``hopEnd`` (ADVICE r12 #4) whose
    first-window invariant (he − slide ≤ ts < he, he = hs + size) is
    folded into the `direct` branch row: n stays 400 only when every
    event passes, and min/max first-window bounds replay in DuckDB by
    the same grid arithmetic.  At 100 TB the tumble/hop buckets are
    plain partial-aggregable groupBys — one shuffle each, no window
    explode beyond the documented 2× hop fan-out."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT 'tumble' AS kind,
       tumbleStart(tumble(ts, INTERVAL 1 DAY)) AS ws,
       tumbleEnd(tumble(ts, INTERVAL 1 DAY)) AS we,
       count() AS n
FROM events WHERE event_id < 400
GROUP BY tumble(ts, INTERVAL 1 DAY)
UNION ALL
SELECT 'hop' AS kind,
       hopStart(hop(ts, INTERVAL 12 HOUR, INTERVAL 1 DAY)) AS ws,
       hopEnd(hop(ts, INTERVAL 12 HOUR, INTERVAL 1 DAY)) AS we,
       count() AS n
FROM events WHERE event_id < 400
GROUP BY hop(ts, INTERVAL 12 HOUR, INTERVAL 1 DAY)
UNION ALL
SELECT 'direct' AS kind, min(hs) AS ws, max(he) AS we,
       CAST(sum(IF(he = hs + INTERVAL 1 DAY
                   AND ts >= he - INTERVAL 12 HOUR AND ts < he, 1, 0))
            AS BIGINT) AS n
FROM (SELECT ts,
             hopStart(ts, INTERVAL 12 HOUR, INTERVAL 1 DAY) AS hs,
             hopEnd(ts, INTERVAL 12 HOUR, INTERVAL 1 DAY) AS he
      FROM events WHERE event_id < 400)
ORDER BY kind, ws
""",
        dialect="clickhouse",
    )
