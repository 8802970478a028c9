"""Statistical-test tier, batch 3 (round 12) — oracle-backed registry
entries for the round-11 lowerings that only had pytest pins (VERDICT r11
"What's missing" #1): ``mannWhitneyUTest``, ``meanZTest``,
``studentTTest``/``welchTTest`` p-values, ``studentTTestOneSample``,
``analysisOfVariance``, ``proportionsZTest``, ``rankCorr``, ``entropy``,
``intervalLengthSum``, ``exponentialTimeDecayedAvg``,
``deltaSumTimestamp``, and the corr/covar matrices.

Reference surface: ClickHouse 25.7 as pinned by the reference image
(``/root/reference/Dockerfile:102-104``) ships each of these as a
first-class aggregate; here they lower to pure Spark SQL (chsql.py) and
the oracles REPLAY the identical closed forms in DuckDB —
``_duck_stats`` mirrors the Lanczos lgamma / Lentz incomplete-beta /
A&S Φ-tail expressions so ``round(x, 6)`` on both sides compares exactly
(the registry determinism contract).

100 TB shape: every aggregate is either map-side-combinable conditional
aggregation (t/z tests) or a per-GROUP sorted-collect fold with the
documented bounded-group contract (MW/rank/interval folds — the
kolmogorovSmirnovTest discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clickhouseocp_spark.queries import register
from clickhouseocp_spark.queries._duck_stats import duck_betai, duck_phi_tail

_Z95 = "1.9599639845400545"  # the engine's pinned 0.95 two-sided z quantile


def _mw_p(z: str) -> str:
    """MW two-sided p replay: round(least(1, 2·(1−Φ(max(z, 0)))), 6)."""
    return (
        f"round(least(CAST(1 AS DOUBLE), "
        f"2 * {duck_phi_tail(f'greatest({z}, CAST(0 AS DOUBLE))')}), 6)"
    )


def _t_p(df: str, t: str) -> str:
    """Two-sided t-tail replay: least(1, I_{df/(df+t²)}(df/2, 1/2))."""
    x = f"(({df}) / (({df}) + ({t}) * ({t})))"
    return (
        f"least(CAST(1 AS DOUBLE), "
        f"{duck_betai(f'({df}) / 2', 'CAST(0.5 AS DOUBLE)', x)})"
    )


@register(
    "chsql_mann_whitney_meanz",
    oracle=f"""
WITH e AS (
  SELECT event_type, value, event_id % 2 AS i
  FROM events WHERE event_id < 600 AND value IS NOT NULL
),
r AS (
  SELECT event_type, value, i,
    rank() OVER (PARTITION BY event_type ORDER BY value)
      + (count(*) OVER (PARTITION BY event_type, value) - 1) / 2.0 AS ar
  FROM e
),
ties AS (
  SELECT event_type, sum(pow(t, 3) - t) AS tt FROM (
    SELECT event_type, value, CAST(count(*) AS DOUBLE) AS t
    FROM e GROUP BY event_type, value
  ) GROUP BY event_type
),
mw AS (
  SELECT r.event_type,
    sum(CASE WHEN i = 0 THEN ar ELSE 0 END) AS r1,
    CAST(sum(CASE WHEN i = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n0,
    CAST(sum(CASE WHEN i <> 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n1
  FROM r GROUP BY r.event_type
),
mw2 AS (
  SELECT mw.event_type, r1 - n0 * (n0 + 1) / 2 AS u1, n0, n1,
    sqrt(n0 * n1 / 12 * ((n0 + n1 + 1)
      - tt / ((n0 + n1) * (n0 + n1 - 1)))) AS sig
  FROM mw JOIN ties ON ties.event_type = mw.event_type
),
mz AS (
  SELECT event_type,
    avg(CASE WHEN i = 0 THEN value END) AS m0,
    avg(CASE WHEN i = 1 THEN value END) AS m1,
    CAST(count(CASE WHEN i = 0 THEN value END) AS DOUBLE) AS c0,
    CAST(count(CASE WHEN i = 1 THEN value END) AS DOUBLE) AS c1
  FROM e GROUP BY event_type
)
SELECT mw2.event_type,
  round(u1, 6) AS mw_u,
  {_mw_p("(abs(u1 - n0 * n1 / 2) - 0.5) / sig")} AS mw_p,
  round((m0 - m1) / sqrt(CAST(400.0 AS DOUBLE) / c0
    + CAST(400.0 AS DOUBLE) / c1), 6) AS z_z,
  round(least(CAST(1 AS DOUBLE), 2 * {duck_phi_tail(
    "abs((m0 - m1) / sqrt(CAST(400.0 AS DOUBLE) / c0 "
    "+ CAST(400.0 AS DOUBLE) / c1))")}), 6) AS z_p,
  round((m0 - m1) - {_Z95} * sqrt(CAST(400.0 AS DOUBLE) / c0
    + CAST(400.0 AS DOUBLE) / c1), 6) AS z_cl,
  round((m0 - m1) + {_Z95} * sqrt(CAST(400.0 AS DOUBLE) / c0
    + CAST(400.0 AS DOUBLE) / c1), 6) AS z_cu
FROM mw2 JOIN mz ON mz.event_type = mw2.event_type
ORDER BY mw2.event_type
""",
    tags=("chsql", "statistics", "aggregates"),
)
def chsql_mann_whitney_meanz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mannWhitneyUTest`` (U₁ + tie-corrected continuity-corrected
    normal-approximation p) and ``meanZTest`` (z, p, CI at the pinned
    0.95 level) — round-11 lowerings, first oracle-backed registry
    record.  The oracle replays the identical rank/tie algebra (average
    ranks via rank() + tie-run width) and the A&S Φ tail.  MW is one
    sorted-collect fold per group (bounded-group contract); meanZTest is
    plain conditional aggregation (map-side combinable)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_type,
  tupleElement(mannWhitneyUTest(value, event_id % 2), 1) AS mw_u,
  tupleElement(mannWhitneyUTest(value, event_id % 2), 2) AS mw_p,
  tupleElement(meanZTest(toFloat64(400.0), toFloat64(400.0), 0.95)
    (value, event_id % 2), 1) AS z_z,
  tupleElement(meanZTest(toFloat64(400.0), toFloat64(400.0), 0.95)
    (value, event_id % 2), 2) AS z_p,
  tupleElement(meanZTest(toFloat64(400.0), toFloat64(400.0), 0.95)
    (value, event_id % 2), 3) AS z_cl,
  tupleElement(meanZTest(toFloat64(400.0), toFloat64(400.0), 0.95)
    (value, event_id % 2), 4) AS z_cu
FROM events WHERE event_id < 600 AND value IS NOT NULL
GROUP BY event_type ORDER BY event_type
""",
        dialect="clickhouse",
    )


@register(
    "chsql_ttest_anova_pvalues",
    oracle=f"""
WITH e AS (
  SELECT event_type, value, event_id % 2 AS i,
         CAST(user_id % 4 AS VARCHAR) AS g
  FROM events WHERE event_id < 600 AND value IS NOT NULL
),
tt AS (
  SELECT event_type,
    avg(CASE WHEN i = 0 THEN value END) AS m0,
    avg(CASE WHEN i = 1 THEN value END) AS m1,
    var_samp(CASE WHEN i = 0 THEN value END) AS v0,
    var_samp(CASE WHEN i = 1 THEN value END) AS v1,
    CAST(count(CASE WHEN i = 0 THEN value END) AS DOUBLE) AS c0,
    CAST(count(CASE WHEN i = 1 THEN value END) AS DOUBLE) AS c1,
    avg(value) AS m, stddev_samp(value) AS sd,
    CAST(count(value) AS DOUBLE) AS n
  FROM e GROUP BY event_type
),
tt2 AS (
  SELECT event_type,
    (m0 - m1) / sqrt((v0 * (c0 - 1) + v1 * (c1 - 1)) / (c0 + c1 - 2)
      * (1.0 / c0 + 1.0 / c1)) AS st_t,
    c0 + c1 - 2 AS st_df,
    (m0 - m1) / sqrt(v0 / c0 + v1 / c1) AS wt_t,
    pow(v0 / c0 + v1 / c1, 2)
      / (pow(v0 / c0, 2) / (c0 - 1) + pow(v1 / c1, 2) / (c1 - 1)) AS wt_df,
    (m - CAST(50.0 AS DOUBLE)) / (sd / sqrt(n)) AS os_t,
    n - 1 AS os_df
  FROM tt
),
am AS (
  SELECT event_type, g, CAST(count(*) AS DOUBLE) AS ng, avg(value) AS mg
  FROM e GROUP BY event_type, g
),
ag AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
         avg(value) AS mu,
         CAST(count(DISTINCT g) AS DOUBLE) AS k
  FROM e GROUP BY event_type
),
ssw AS (
  SELECT e.event_type, sum(pow(e.value - am.mg, 2)) AS ssw
  FROM e JOIN am ON am.event_type = e.event_type AND am.g = e.g
  GROUP BY e.event_type
),
ssb AS (
  SELECT am.event_type, sum(am.ng * pow(am.mg - ag.mu, 2)) AS ssb
  FROM am JOIN ag ON ag.event_type = am.event_type
  GROUP BY am.event_type
),
an AS (
  SELECT ag.event_type,
    round((ssb.ssb / (ag.k - 1)) / (ssw.ssw / (ag.n - ag.k)), 6) AS f,
    ag.k - 1 AS d1, ag.n - ag.k AS d2
  FROM ag
  JOIN ssb ON ssb.event_type = ag.event_type
  JOIN ssw ON ssw.event_type = ag.event_type
)
SELECT tt2.event_type,
  round(st_t, 6) AS st_t, round({_t_p("st_df", "st_t")}, 6) AS st_p,
  round(wt_t, 6) AS wt_t, round({_t_p("wt_df", "wt_t")}, 6) AS wt_p,
  round(os_t, 6) AS os_t, round({_t_p("os_df", "os_t")}, 6) AS os_p,
  an.f AS an_f,
  round({duck_betai("an.d2 / 2", "an.d1 / 2",
                    "an.d2 / (an.d2 + an.d1 * an.f)")}, 6) AS an_p
FROM tt2 JOIN an ON an.event_type = tt2.event_type
ORDER BY tt2.event_type
""",
    tags=("chsql", "statistics", "aggregates"),
)
def chsql_ttest_anova_pvalues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incomplete-beta p-value tier — ``studentTTest`` /
    ``welchTTest`` real (t, p) tuples (round-11 upgrade),
    ``studentTTestOneSample``, and ``analysisOfVariance`` (F, p) — first
    oracle-backed registry record.  The oracle replays the IDENTICAL
    Lanczos-lgamma + adaptive-Lentz incomplete-beta fold in DuckDB
    (``_duck_stats``), so round(·, 6) compares exactly.  t/z tests are
    plain conditional aggregates (map-side combinable); ANOVA is one
    collected fold per group (bounded-group contract)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_type,
  round(tupleElement(studentTTest(value, event_id % 2), 1), 6) AS st_t,
  round(tupleElement(studentTTest(value, event_id % 2), 2), 6) AS st_p,
  round(tupleElement(welchTTest(value, event_id % 2), 1), 6) AS wt_t,
  round(tupleElement(welchTTest(value, event_id % 2), 2), 6) AS wt_p,
  round(tupleElement(studentTTestOneSample(value, toFloat64(50.0)), 1), 6)
    AS os_t,
  round(tupleElement(studentTTestOneSample(value, toFloat64(50.0)), 2), 6)
    AS os_p,
  tupleElement(analysisOfVariance(value, user_id % 4), 1) AS an_f,
  round(tupleElement(analysisOfVariance(value, user_id % 4), 2), 6) AS an_p
FROM events WHERE event_id < 600 AND value IS NOT NULL
GROUP BY event_type ORDER BY event_type
""",
        dialect="clickhouse",
    )


@register(
    "chsql_rank_entropy_decay",
    oracle="""
WITH e AS (
  SELECT event_type, value, event_id, user_id, ts,
         CAST(user_id % 97 AS DOUBLE) AS y,
         CAST(user_id % 8 AS VARCHAR) AS h
  FROM events WHERE event_id < 600 AND value IS NOT NULL
),
rk AS (
  SELECT event_type,
    rank() OVER (PARTITION BY event_type ORDER BY value)
      + (count(*) OVER (PARTITION BY event_type, value) - 1) / 2.0 AS rx,
    rank() OVER (PARTITION BY event_type ORDER BY y)
      + (count(*) OVER (PARTITION BY event_type, y) - 1) / 2.0 AS ry
  FROM e
),
rc AS (
  SELECT event_type, round(corr(rx, ry), 6) AS rc FROM rk
  GROUP BY event_type
),
hc AS (
  SELECT event_type, h, CAST(count(*) AS DOUBLE) AS c
  FROM e GROUP BY event_type, h
),
ent AS (
  SELECT event_type,
    round(-sum(c / n * log2(c / n)), 6) AS ent
  FROM (SELECT event_type, c,
          sum(c) OVER (PARTITION BY event_type) AS n FROM hc)
  GROUP BY event_type
),
iv AS (
  SELECT event_type, value AS s, value + 10.0 AS e2,
    max(value + 10.0) OVER (PARTITION BY event_type ORDER BY value
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
  FROM e
),
isl AS (
  SELECT event_type, s, e2,
    sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
      OVER (PARTITION BY event_type ORDER BY s, e2) AS grp
  FROM iv
),
ils AS (
  SELECT event_type, round(sum(len), 6) AS ils FROM (
    SELECT event_type, grp, max(e2) - min(s) AS len
    FROM isl GROUP BY event_type, grp)
  GROUP BY event_type
),
ed AS (
  SELECT event_type, value, floor(epoch(ts)) AS t,
    max(floor(epoch(ts))) OVER (PARTITION BY event_type) AS tmax
  FROM e
),
eda AS (
  SELECT event_type,
    round(sum(value * exp(-(tmax - t) / 3600.0))
      / sum(exp(-(tmax - t) / 3600.0)), 6) AS eda
  FROM ed GROUP BY event_type
),
dl AS (
  SELECT event_type, value,
    lag(value) OVER (PARTITION BY event_type ORDER BY ts, value) AS pv
  FROM e
),
dst AS (
  SELECT event_type,
    round(sum(CASE WHEN pv IS NULL THEN 0
      ELSE greatest(value - pv, 0) END), 6) AS dst
  FROM dl GROUP BY event_type
)
SELECT rc.event_type, rc.rc, ent.ent, ils.ils, eda.eda, dst.dst
FROM rc
JOIN ent ON ent.event_type = rc.event_type
JOIN ils ON ils.event_type = rc.event_type
JOIN eda ON eda.event_type = rc.event_type
JOIN dst ON dst.event_type = rc.event_type
ORDER BY rc.event_type
""",
    tags=("chsql", "statistics", "aggregates"),
)
def chsql_rank_entropy_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rankCorr`` (Spearman ρ, average ranks), ``entropy`` (base-2
    Shannon), ``intervalLengthSum`` (union sweep), the e-folding
    ``exponentialTimeDecayedAvg`` (round-12 ln2 fix pinned HERE in the
    driver record), and ``deltaSumTimestamp`` — first oracle-backed
    registry record for each.  The oracle replays rank-by-counting as
    window average-ranks, the interval sweep as gaps-and-islands, and
    the decay anchored at the per-group max second-truncated epoch."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_type,
  rankCorr(value, toFloat64(user_id % 97)) AS rc,
  round(entropy(user_id % 8), 6) AS ent,
  round(intervalLengthSum(value, value + 10.0), 6) AS ils,
  round(exponentialTimeDecayedAvg(3600.0)(
    value, toFloat64(toUnixTimestamp(ts))), 6) AS eda,
  round(deltaSumTimestamp(value, ts), 6) AS dst
FROM events WHERE event_id < 600 AND value IS NOT NULL
GROUP BY event_type ORDER BY event_type
""",
        dialect="clickhouse",
    )


@register(
    "chsql_corr_matrices",
    oracle="""
SELECT event_type,
  round(corr(value, CAST(event_id AS DOUBLE)), 6) AS c12,
  round(corr(value, CAST(user_id AS DOUBLE)), 6) AS c13,
  round(corr(CAST(event_id AS DOUBLE), CAST(user_id AS DOUBLE)), 6) AS c23,
  CAST(1.0 AS DOUBLE) AS c11,
  round(covar_samp(value, CAST(event_id AS DOUBLE)), 6) AS vs12,
  round(covar_pop(value, CAST(user_id AS DOUBLE)), 6) AS vp13,
  round(covar_pop(CAST(user_id AS DOUBLE), CAST(user_id AS DOUBLE)), 6)
    AS vp33
FROM events WHERE event_id < 600 AND value IS NOT NULL
GROUP BY event_type ORDER BY event_type
""",
    tags=("chsql", "statistics", "aggregates"),
)
def chsql_corr_matrices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``corrMatrix`` / ``covarSampMatrix`` / ``covarPopMatrix``
    (CH 24.x) — first oracle-backed registry record: off-diagonal and
    diagonal cells of the 3-column matrices unpacked via
    ``arrayElement`` and replayed as plain DuckDB corr/covar aggregates.
    The lowering is n² plain JVM aggregates over ONE grouped exchange —
    no fold, no Python."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_type,
  round(arrayElement(arrayElement(corrMatrix(
    value, toFloat64(event_id), toFloat64(user_id)), 1), 2), 6) AS c12,
  round(arrayElement(arrayElement(corrMatrix(
    value, toFloat64(event_id), toFloat64(user_id)), 1), 3), 6) AS c13,
  round(arrayElement(arrayElement(corrMatrix(
    value, toFloat64(event_id), toFloat64(user_id)), 2), 3), 6) AS c23,
  arrayElement(arrayElement(corrMatrix(
    value, toFloat64(event_id), toFloat64(user_id)), 1), 1) AS c11,
  round(arrayElement(arrayElement(covarSampMatrix(
    value, toFloat64(event_id), toFloat64(user_id)), 1), 2), 6) AS vs12,
  round(arrayElement(arrayElement(covarPopMatrix(
    value, toFloat64(event_id), toFloat64(user_id)), 1), 3), 6) AS vp13,
  round(arrayElement(arrayElement(covarPopMatrix(
    value, toFloat64(event_id), toFloat64(user_id)), 3), 3), 6) AS vp33
FROM events WHERE event_id < 600 AND value IS NOT NULL
GROUP BY event_type ORDER BY event_type
""",
        dialect="clickhouse",
    )


@register(
    "chsql_series_stl_contracts",
    oracle="""
SELECT event_type, round(avg(value), 2) AS amp,
  TRUE AS closure_ok, TRUE AS periodic_ok, TRUE AS len_ok,
  TRUE AS short_null_ok
FROM events WHERE event_id < 600 AND value IS NOT NULL
GROUP BY event_type ORDER BY event_type
""",
    tags=("chsql", "timeseries", "statistics"),
)
def chsql_series_stl_contracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``seriesDecomposeSTL`` (CH 24.x) — first registry record: a
    data-dependent planted series per group (period-7 sawtooth scaled by
    the group's avg + linear trend) decomposed, with the STRUCTURAL
    contracts evaluated Spark-side as booleans (the sketch-contract
    discipline — CH wraps the stl-cpp port, so bitwise parity is not
    defined across engines): exact closure seasonal+trend+residue ==
    series, period-7-periodic seasonal component, full-length parts, and
    the short-series NULL analog.  One Arrow batch per group row —
    nothing shuffles beyond the seed aggregate."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
WITH base AS (
  SELECT event_type, round(avg(value), 2) AS amp
  FROM events WHERE event_id < 600 AND value IS NOT NULL
  GROUP BY event_type
),
dec AS (
  SELECT event_type, amp,
    transform(sequence(0, 41), __i ->
      amp * CAST(__i % 7 AS DOUBLE) + 0.5 * __i) AS s,
    seriesDecomposeSTL(transform(sequence(0, 41), __i ->
      amp * CAST(__i % 7 AS DOUBLE) + 0.5 * __i), 7) AS d
  FROM base
)
SELECT event_type, amp,
  aggregate(sequence(1, size(s)), CAST(0 AS DOUBLE), (__m, __i) ->
    greatest(__m, abs(element_at(element_at(d, 1), __i)
      + element_at(element_at(d, 2), __i)
      + element_at(element_at(d, 3), __i)
      - element_at(s, __i)))) < 1e-9 AS closure_ok,
  aggregate(sequence(1, size(s) - 7), CAST(0 AS DOUBLE), (__m, __i) ->
    greatest(__m, abs(element_at(element_at(d, 1), __i)
      - element_at(element_at(d, 1), __i + 7)))) < 1e-9 AS periodic_ok,
  size(element_at(d, 1)) = size(s)
    AND size(element_at(d, 2)) = size(s)
    AND size(element_at(d, 3)) = size(s) AS len_ok,
  seriesDecomposeSTL(array(1.0, 2.0, 3.0), 7) IS NULL AS short_null_ok
FROM dec ORDER BY event_type
""",
        dialect="clickhouse",
    )


@register(
    "kql_series_fit_poly",
    oracle="""
WITH base AS (
  SELECT event_type, round(avg(value), 2) AS amp
  FROM events WHERE event_id < 600 AND value IS NOT NULL
  GROUP BY event_type
),
s AS (
  SELECT event_type, amp,
    list_transform(range(0, 10), k ->
      2.0 * k * k - 3.0 * k + amp) AS ys
  FROM base
),
f AS (
  SELECT event_type, amp,
    CAST(10 AS DOUBLE) AS n,
    list_sum(ys) AS sy,
    list_sum(list_transform(ys, y -> y * y)) AS syy,
    list_sum(list_transform(range(0, 10), k -> ys[k + 1] * CAST(k AS DOUBLE)))
      AS sxy,
    CAST(45 AS DOUBLE) AS sx, CAST(285 AS DOUBLE) AS sxx
  FROM s
),
f2 AS (
  SELECT event_type, amp, n, sy, syy, sxy, sx, sxx,
    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
  FROM f
),
f3 AS (
  SELECT event_type, amp, slope,
    (sy - slope * sx) / n AS icpt,
    syy - sy * sy / n AS sstot,
    syy - 2 * ((sy - slope * sx) / n) * sy - 2 * slope * sxy
      + n * pow((sy - slope * sx) / n, 2)
      + 2 * ((sy - slope * sx) / n) * slope * sx
      + slope * slope * sxx AS ssres
  FROM f2
)
SELECT event_type, amp,
  CAST(2.0 AS DOUBLE) AS c2, CAST(-3.0 AS DOUBLE) AS c1,
  round(amp, 6) AS c0,
  round(slope, 6) AS slope,
  round(icpt, 6) AS icpt,
  round(CASE WHEN sstot = 0 THEN 1.0 ELSE 1.0 - ssres / sstot END, 6)
    AS rsq
FROM f3 ORDER BY event_type
""",
    tags=("kql", "dialect", "timeseries", "statistics"),
)
def kql_series_fit_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``series_fit_poly`` (Kusto; numpy-polyfit Arrow kernel, highest
    degree first) — first registry record: a data-dependent planted
    quadratic y = 2x² − 3x + amp per group (amp = the group's rounded
    avg), explicit x axis, degree 2 — the fitted coefficients recover
    the generators to lstsq precision so round(·, 6) pins them exactly;
    plus ``series_fit_line`` on the same series (slope 15, interception
    amp − 24 in closed form — the oracle replays the identical
    least-squares sums textually, never regr_* built-ins)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
events
| where event_id < 600 and isnotnull(value)
| summarize amp = round(avg(value), 2) by event_type
| extend co = series_fit_poly(
    pack_array(amp + 0.0, amp - 1.0, amp + 2.0, amp + 9.0, amp + 20.0,
               amp + 35.0, amp + 54.0, amp + 77.0, amp + 104.0,
               amp + 135.0),
    pack_array(0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0), 2)
| extend fl = series_fit_line(
    pack_array(amp + 0.0, amp - 1.0, amp + 2.0, amp + 9.0, amp + 20.0,
               amp + 35.0, amp + 54.0, amp + 77.0, amp + 104.0,
               amp + 135.0))
| project event_type, amp,
          c2 = round(co[0], 6), c1 = round(co[1], 6), c0 = round(co[2], 6),
          slope = round(fl.slope, 6), icpt = round(fl.interception, 6),
          rsq = round(fl.rsquare, 6)
| order by event_type asc
""",
        dialect="kusto",
    )


@register(
    "kql_stat_scalars",
    oracle=f"""
SELECT event_id,
  round({duck_betai("CAST(2.5 AS DOUBLE)", "CAST(3.5 AS DOUBLE)",
                    "CAST(event_id % 10 AS DOUBLE) / 10.0")}, 6) AS bc,
  round(CASE WHEN event_id % 20 <= 0 THEN CAST(1 AS DOUBLE)
    ELSE {duck_betai("CAST(event_id % 20 AS DOUBLE)",
                     "CAST(40 - event_id % 20 + 1 AS DOUBLE)",
                     "CAST(0.4 AS DOUBLE)")} END, 6) AS bt,
  round(CASE WHEN event_id % 20 >= 40 THEN CAST(1 AS DOUBLE)
    ELSE {duck_betai("CAST(40 - event_id % 20 AS DOUBLE)",
                     "CAST(event_id % 20 + 1 AS DOUBLE)",
                     "1 - CAST(0.6 AS DOUBLE)")} END, 6) AS btl,
  round(least(CAST(1 AS DOUBLE), {duck_betai(
      "wdf / 2", "CAST(0.5 AS DOUBLE)", "wdf / (wdf + wt2)")}), 6) AS wt,
  event_id % 4 = 1 AS m64,
  TRUE AS mmin,
  CAST(NULL AS VARCHAR) AS bad,
  '0000:0000:0000:0000:0000:ffff:'
    || printf('%04x', (event_id % 256) * 256 + 1) || ':0101' AS ok
FROM (
  SELECT event_id,
    pow(CAST(100.0 AS DOUBLE) / 30 + CAST(90.0 AS DOUBLE) / 25, 2)
      / (pow(CAST(100.0 AS DOUBLE) / 30, 2) / 29
         + pow(CAST(90.0 AS DOUBLE) / 25, 2) / 24) AS wdf,
    pow(CAST(50.0 AS DOUBLE) + event_id % 7 - CAST(48.0 AS DOUBLE), 2)
      / (CAST(100.0 AS DOUBLE) / 30 + CAST(90.0 AS DOUBLE) / 25) AS wt2
  FROM events WHERE event_id < 100
)
ORDER BY event_id
""",
    tags=("kql", "dialect", "statistics", "scalars"),
)
def kql_stat_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KQL statistical-scalar tier — ``beta_cdf``, ``binomial_test``
    (exact one-sided tails via the incomplete-beta identity, both
    'greater' and 'less' kinds), ``welch_test`` (closed-form t² +
    Welch–Satterthwaite df + the beta t-tail) — first oracle-backed
    registry record (the oracle replays the identical Lanczos + adaptive
    Lentz fold via ``_duck_stats``); plus the round-12 ``ipv6_is_match``
    minimum-prefix combination and ``parse_ipv6`` octet-validation fixes
    pinned as driver records.  All pure JVM codegen per row — no
    aggregation, no Python."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
events
| where event_id < 100
| project event_id,
    bc = round(beta_cdf(toreal(event_id % 10) / 10.0, 2.5, 3.5), 6),
    bt = round(binomial_test(event_id % 20, 40, 0.4), 6),
    btl = round(binomial_test(event_id % 20, 40, 0.6, 'less'), 6),
    wt = round(welch_test(50.0 + toreal(event_id % 7), 100.0, 30,
                          48.0, 90.0, 25), 6),
    m64 = ipv6_is_match(
      strcat('fe80:0001:0002:000', tostring(event_id % 4), '::1'),
      'fe80:0001:0002:0001::1/64'),
    mmin = ipv6_is_match(
      strcat('fe80:0001:0002:000', tostring(event_id % 4), '::1/64'),
      'fe80:0001:0002:ffff::1/48'),
    bad = parse_ipv6(strcat('::ffff:',
      tostring(256 + event_id % 10), '.1.1.1')),
    ok = parse_ipv6(strcat('::ffff:',
      tostring(event_id % 256), '.1.1.1'))
| order by event_id asc
""",
        dialect="kusto",
    )


@register(
    "chsql_timeseries_grid",
    oracle="""
WITH e AS (
  SELECT event_type, floor(epoch(ts)) AS t, value AS v
  FROM events WHERE event_id < 600 AND value IS NOT NULL AND ts IS NOT NULL
),
grid AS (
  SELECT DISTINCT e.event_type, gs.gi,
         1704067200.0 + gs.gi * 14400.0 AS g
  FROM e CROSS JOIN (SELECT unnest(range(0, 10)) AS gi) gs
),
cells AS (
  SELECT grid.event_type, grid.gi, grid.g,
         l.t AS t1, l.v AS v1, p.t AS t2, p.v AS v2,
         f.t AS ft, f.v AS fv, c.n AS n, r2.rsum AS rsum
  FROM grid
  LEFT JOIN LATERAL (
    SELECT t, v FROM e
    WHERE e.event_type = grid.event_type
      AND e.t <= grid.g AND e.t > grid.g - 21600.0
    ORDER BY t DESC, v DESC LIMIT 1) l ON true
  LEFT JOIN LATERAL (
    SELECT t, v FROM e
    WHERE e.event_type = grid.event_type
      AND e.t <= grid.g AND e.t > grid.g - 21600.0
    ORDER BY t DESC, v DESC LIMIT 1 OFFSET 1) p ON true
  LEFT JOIN LATERAL (
    SELECT t, v FROM e
    WHERE e.event_type = grid.event_type
      AND e.t <= grid.g AND e.t > grid.g - 21600.0
    ORDER BY t, v LIMIT 1) f ON true
  LEFT JOIN LATERAL (
    SELECT count(*) AS n FROM e
    WHERE e.event_type = grid.event_type
      AND e.t <= grid.g AND e.t > grid.g - 21600.0) c ON true
  LEFT JOIN LATERAL (
    SELECT coalesce(sum(CASE WHEN sub.v < sub.pv THEN sub.pv
      ELSE 0 END), 0) AS rsum
    FROM (SELECT e.v, lag(e.v) OVER (ORDER BY e.t, e.v) AS pv
          FROM e
          WHERE e.event_type = grid.event_type
            AND e.t <= grid.g AND e.t > grid.g - 21600.0) sub) r2 ON true
),
calc AS (
  SELECT event_type, gi, t1, v1, t2, v2,
    CASE WHEN n < 2 OR t1 <= ft THEN NULL ELSE
      (v1 - fv + rsum) * ((
        (t1 - ft)
        + CASE WHEN least(ft - (g - 21600.0),
            CASE WHEN (v1 - fv + rsum) > 0 AND fv >= 0
              THEN (t1 - ft) * fv / (v1 - fv + rsum)
              ELSE ft - (g - 21600.0) END)
            < 1.1 * ((t1 - ft) / (n - 1))
          THEN least(ft - (g - 21600.0),
            CASE WHEN (v1 - fv + rsum) > 0 AND fv >= 0
              THEN (t1 - ft) * fv / (v1 - fv + rsum)
              ELSE ft - (g - 21600.0) END)
          ELSE ((t1 - ft) / (n - 1)) / 2 END
        + CASE WHEN (g - t1) < 1.1 * ((t1 - ft) / (n - 1))
          THEN (g - t1) ELSE ((t1 - ft) / (n - 1)) / 2 END
      ) / (t1 - ft)) / 21600.0 END AS rt,
    CASE WHEN n < 2 OR t1 <= ft THEN NULL ELSE
      (v1 - fv) * ((
        (t1 - ft)
        + CASE WHEN (ft - (g - 21600.0)) < 1.1 * ((t1 - ft) / (n - 1))
          THEN (ft - (g - 21600.0))
          ELSE ((t1 - ft) / (n - 1)) / 2 END
        + CASE WHEN (g - t1) < 1.1 * ((t1 - ft) / (n - 1))
          THEN (g - t1) ELSE ((t1 - ft) / (n - 1)) / 2 END
      ) / (t1 - ft)) END AS dl
  FROM cells
)
SELECT event_type,
  string_agg(CASE WHEN v1 IS NULL THEN 'NULL'
    ELSE printf('%.6f', round(v1, 6)) END, ',' ORDER BY gi) AS rs,
  string_agg(CASE WHEN v2 IS NULL THEN 'NULL'
    ELSE printf('%.6f', round(v1 - v2, 6)) END, ',' ORDER BY gi) AS idl,
  string_agg(CASE WHEN v2 IS NULL OR t1 = t2 THEN 'NULL'
    ELSE printf('%.6f', round(
      CASE WHEN v1 >= v2 THEN v1 - v2 ELSE v1 END / (t1 - t2), 6)) END,
    ',' ORDER BY gi) AS irt,
  string_agg(CASE WHEN rt IS NULL THEN 'NULL'
    ELSE printf('%.6f', round(rt, 6)) END, ',' ORDER BY gi) AS rt,
  string_agg(CASE WHEN dl IS NULL THEN 'NULL'
    ELSE printf('%.6f', round(dl, 6)) END, ',' ORDER BY gi) AS dl
FROM calc GROUP BY event_type ORDER BY event_type
""",
    tags=("chsql", "timeseries", "aggregates"),
)
def chsql_timeseries_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CH 25.6 PromQL-style ``timeSeries*ToGrid`` tier (experimental
    in the pinned 25.7 image): ``timeSeriesResampleToGridWithStaleness``
    (staleness lookback), ``timeSeriesInstantDeltaToGrid`` (idelta),
    ``timeSeriesInstantRateToGrid`` (irate with counter-reset handling),
    and the full ``timeSeriesRateToGrid`` / ``timeSeriesDeltaToGrid``
    (PromQL's extrapolatedRate: reset-corrected increase, 1.1×-average-
    interval edge extrapolation, counter zero-crossing cap) — a fixed
    10-point 4-hour grid with a 6-hour lookback over the events table.
    One sorted-collect fold per group (bounded-group contract); the
    oracle replays every grid cell with LATERAL first/last/count/reset
    lookups and the identical closed-form extrapolation.  Series are
    comma-joined (the kql_series_q discipline — list cells never reach
    the driver hash)."""
    from clickhouseocp_spark.engine import ChSparkEngine

    df = ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_type,
  timeSeriesResampleToGridWithStaleness(1704067200, 1704196800, 14400,
    21600)(toFloat64(toUnixTimestamp(ts)), value) AS rs,
  timeSeriesInstantDeltaToGrid(1704067200, 1704196800, 14400, 21600)
    (toFloat64(toUnixTimestamp(ts)), value) AS idl,
  timeSeriesInstantRateToGrid(1704067200, 1704196800, 14400, 21600)
    (toFloat64(toUnixTimestamp(ts)), value) AS irt,
  timeSeriesRateToGrid(1704067200, 1704196800, 14400, 21600)
    (toFloat64(toUnixTimestamp(ts)), value) AS rt,
  timeSeriesDeltaToGrid(1704067200, 1704196800, 14400, 21600)
    (toFloat64(toUnixTimestamp(ts)), value) AS dl
FROM events WHERE event_id < 600 AND value IS NOT NULL AND ts IS NOT NULL
GROUP BY event_type ORDER BY event_type
""",
        dialect="clickhouse",
    )
    from pyspark.sql import functions as F

    def _sj(col: str) -> F.Column:
        return F.expr(
            f"array_join(transform({col}, __x -> if(isnull(__x), 'NULL', "
            f"format_string('%.6f', round(__x, 6)))), ',')"
        ).alias(col)

    return df.select(
        "event_type", _sj("rs"), _sj("idl"), _sj("irt"), _sj("rt"),
        _sj("dl"),
    )


@register(
    "chsql_resample_avg_minmax",
    oracle="""
WITH b(bucket, lo, hi) AS (VALUES (0, 1, 3), (1, 3, 5), (2, 5, 7), (3, 7, 8))
SELECT l.l_returnflag, b.bucket,
  round(avg(CASE WHEN l_linenumber >= b.lo AND l_linenumber < b.hi
    THEN CAST(l_quantity AS DOUBLE) END), 6) AS qavg,
  min(CASE WHEN l_linenumber >= b.lo AND l_linenumber < b.hi
    THEN CAST(l_quantity AS DOUBLE) END) AS qmin,
  max(CASE WHEN l_linenumber >= b.lo AND l_linenumber < b.hi
    THEN CAST(l_quantity AS DOUBLE) END) AS qmax
FROM lineitem l CROSS JOIN b
GROUP BY 1, 2 ORDER BY 1, 2
""",
    tags=("chsql", "agg"),
)
def chsql_resample_avg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``avgResample`` / ``minResample`` / ``maxResample`` — the remaining
    uncovered ``-Resample`` combinator forms (the automated FUNC-sweep
    gate, tests/test_coverage_ledger.py, flagged them at birth).  Same
    plan shape as ``chsql_resample``: the transpiler unrolls each bucket
    to a FILTER aggregate — ONE hash-aggregate exchange regardless of
    bucket count; arrays exploded to (group, bucket) rows for the
    driver's hash canonicalizer."""
    from pyspark.sql import functions as F

    from clickhouseocp_spark.engine import ChSparkEngine

    df = ChSparkEngine(sf_dir, spark).sql(
        """
SELECT l_returnflag,
       avgResample(1, 8, 2)(toFloat64(l_quantity), l_linenumber) AS qavg,
       minResample(1, 8, 2)(toFloat64(l_quantity), l_linenumber) AS qmin,
       maxResample(1, 8, 2)(toFloat64(l_quantity), l_linenumber) AS qmax
FROM lineitem
GROUP BY l_returnflag
""",
        dialect="clickhouse",
    )
    return (
        df.select(
            "l_returnflag",
            F.posexplode(
                F.arrays_zip("qavg", "qmin", "qmax")
            ).alias("bucket", "z"),
        )
        .select(
            "l_returnflag",
            "bucket",
            F.round(F.col("z.qavg").cast("double"), 6).alias("qavg"),
            F.col("z.qmin").cast("double").alias("qmin"),
            F.col("z.qmax").cast("double").alias("qmax"),
        )
        .orderBy("l_returnflag", "bucket")
    )


_DUCK_MORTON = (
    "CAST(list_sum(list_transform(range(0, 31), __i -> "
    "((a >> __i) & 1) << (2 * __i))) AS BIGINT) "
    "+ CAST(list_sum(list_transform(range(0, 31), __i -> "
    "((b >> __i) & 1) << (2 * __i + 1))) AS BIGINT)"
)

#: the identical Wikipedia xy2d fold as a DuckDB list_reduce — Lentz-style
#: state-in-list trick ([x, y, d] per element, iteration k in slot 1)
_DUCK_HILBERT = (
    "list_reduce(list_concat([[a, b, CAST(0 AS BIGINT)]], "
    "list_transform(range(30, -1, -1), __k -> "
    "[__k, CAST(0 AS BIGINT), CAST(0 AS BIGINT)])), "
    "(__s, __e) -> list_transform([[ (__s[1] >> __e[1]) & 1, "
    "(__s[2] >> __e[1]) & 1 ]], __r -> "
    "list_transform([[ CASE WHEN __r[2] = 0 AND __r[1] = 1 "
    "THEN 2147483647 - __s[1] ELSE __s[1] END, "
    "CASE WHEN __r[2] = 0 AND __r[1] = 1 "
    "THEN 2147483647 - __s[2] ELSE __s[2] END ]], __q -> "
    "[ CASE WHEN __r[2] = 0 THEN __q[2] ELSE __s[1] END, "
    "CASE WHEN __r[2] = 0 THEN __q[1] ELSE __s[2] END, "
    "__s[3] + ((CAST(1 AS BIGINT) << (2 * __e[1])) "
    "* xor(3 * __r[1], __r[2])) ])[1])[1])[3]"
)


@register(
    "chsql_morton_hilbert",
    oracle=f"""
SELECT event_id, a AS x, b AS y,
  {_DUCK_MORTON} AS me,
  {_DUCK_HILBERT} AS he,
  TRUE AS m_rt, TRUE AS h_rt
FROM (
  SELECT event_id, CAST(event_id % 1024 AS BIGINT) AS a,
         CAST(user_id % 1024 AS BIGINT) AS b
  FROM events WHERE event_id < 200
)
ORDER BY event_id
""",
    tags=("chsql", "geo", "scalars"),
)
def chsql_morton_hilbert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 2-D space-filling-curve index tier (CH 24.6):
    ``mortonEncode``/``mortonDecode`` (Z-order interleave, the morton-nd
    first-arg-at-EVEN-positions parity CH wraps — mortonEncode(1,2)=9;
    the r12 swap fixed per ADVICE r12 #1) and
    ``hilbertEncode``/``hilbertDecode`` (the published Wikipedia
    xy2d/d2xy iteration — hilbertEncode(3,4)=31).  Encode values are
    replayed by the IDENTICAL bit folds in DuckDB (list_reduce with
    state-in-list); decode is pinned as roundtrip contracts.  31-step
    pure-JVM folds per row — at 100 TB these are exactly the
    order-preserving keys you'd range-partition a spatial table by."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_id,
  toInt64(event_id % 1024) AS x,
  toInt64(user_id % 1024) AS y,
  mortonEncode(event_id % 1024, user_id % 1024) AS me,
  hilbertEncode(event_id % 1024, user_id % 1024) AS he,
  tupleElement(mortonDecode(2,
    mortonEncode(event_id % 1024, user_id % 1024)), 1) = event_id % 1024
  AND tupleElement(mortonDecode(2,
    mortonEncode(event_id % 1024, user_id % 1024)), 2) = user_id % 1024
    AS m_rt,
  tupleElement(hilbertDecode(2,
    hilbertEncode(event_id % 1024, user_id % 1024)), 1) = event_id % 1024
  AND tupleElement(hilbertDecode(2,
    hilbertEncode(event_id % 1024, user_id % 1024)), 2) = user_id % 1024
    AS h_rt
FROM events WHERE event_id < 200
ORDER BY event_id
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r38",
    oracle="""
WITH pt AS (
  SELECT p_partkey, p_name, p_brand, p_type, p_size,
         [p_partkey % 7, p_size % 7, (p_partkey + p_size) % 7] AS a7,
         [p_partkey % 7, p_size % 7 + 1] AS b7,
         [p_partkey % 5, p_size % 5] AS a5,
         [p_size % 5, (p_partkey + 1) % 5] AS b5,
         list_transform(range(1,
           CAST(length(hex(p_name)) / 2 AS INT) + 1),
           __i -> substring(hex(p_name), CAST(2 * __i - 1 AS INT), 2))
           AS hp
  FROM part WHERE p_partkey < 60
),
qw AS (
  SELECT round(quantile_cont(p_retailprice, 0.5), 6) AS qw FROM (
    SELECT p.p_retailprice
    FROM part p
    JOIN (SELECT unnest(range(1, 8)) AS r) reps ON reps.r <= p_size % 7 + 1
    WHERE p.p_partkey < 200)
)
SELECT p_partkey,
  levenshtein(
    list_aggr(list_transform(a7, __x -> chr(65 + CAST(__x AS INT))),
              'string_agg', ''),
    list_aggr(list_transform(b7, __x -> chr(65 + CAST(__x AS INT))),
              'string_agg', '')) AS lv,
  COALESCE(array_to_string(list_sort(list_filter(
    list_distinct(list_concat(a5, b5)),
    __x -> NOT (list_contains(a5, __x) AND list_contains(b5, __x)))),
    ','), '') AS sd,
  CAST(CASE WHEN p_brand < p_type THEN -1
    WHEN p_brand > p_type THEN 1 ELSE 0 END AS INT) AS sc,
  CAST(CASE WHEN substring(p_brand, 2, 3) < substring(p_type, 2, 3)
    THEN -1 WHEN substring(p_brand, 2, 3) > substring(p_type, 2, 3)
    THEN 1 ELSE 0 END AS INT) AS sc3,
  CAST(len(list_distinct(hp)) AS BIGINT) AS bu,
  round(-list_sum(list_transform(list_distinct(hp), __v ->
    len(list_filter(hp, __o -> __o = __v)) / CAST(len(hp) AS DOUBLE)
    * log2(len(list_filter(hp, __o -> __o = __v))
           / CAST(len(hp) AS DOUBLE)))), 6) AS be,
  CAST(damerau_levenshtein(p_brand, p_type) AS BIGINT) AS dl,
  round(jaro_similarity(p_name, p_type), 6) AS js,
  round(jaro_winkler_similarity(p_name, p_type), 6) AS jw,
  qw.qw AS qw
FROM pt CROSS JOIN qw
ORDER BY p_partkey
""",
    tags=("chsql", "dialect", "vocabulary", "scalars"),
)
def chsql_vocab_r38(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 38 (round 12) — the CH 25.x array/string
    additions: ``arrayLevenshtein`` (rolling-row DP fold; the oracle maps
    small-domain elements to chars injectively and replays via DuckDB's
    ``levenshtein``), ``arraySymmetricDifference`` (union minus
    intersection, sorted), ``stringCompare`` (both the 2-arg and
    offset-slice forms), ``stringBytesUniq`` / ``stringBytesEntropy``
    (UTF-8 byte folds over hex() pairs — replayed verbatim),
    ``damerauLevenshteinDistance`` (FULL 1964 variant, all-rows DP fold)
    / ``jaroSimilarity`` / ``jaroWinklerSimilarity`` (match-window fold,
    0.7 boost threshold) — cross-checked against DuckDB's INDEPENDENT
    implementations rather than replays — and
    ``quantileExactWeightedInterpolated`` (Spark's frequency-percentile
    IS the interpolated weighted quantile; the oracle expands weights).
    All pure JVM codegen, one scan."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT p_partkey,
  arrayLevenshtein(
    array(p_partkey % 7, p_size % 7, (p_partkey + p_size) % 7),
    array(p_partkey % 7, p_size % 7 + 1)) AS lv,
  arrayStringConcat(arrayMap(x -> toString(x),
    arraySymmetricDifference(array(p_partkey % 5, p_size % 5),
                             array(p_size % 5, (p_partkey + 1) % 5))),
    ',') AS sd,
  stringCompare(p_brand, p_type) AS sc,
  stringCompare(p_brand, p_type, 1, 1, 3) AS sc3,
  stringBytesUniq(p_name) AS bu,
  round(stringBytesEntropy(p_name), 6) AS be,
  damerauLevenshteinDistance(p_brand, p_type) AS dl,
  round(jaroSimilarity(p_name, p_type), 6) AS js,
  round(jaroWinklerSimilarity(p_name, p_type), 6) AS jw,
  (SELECT round(quantileExactWeightedInterpolated(0.5)
     (p_retailprice, p_size % 7 + 1), 6)
   FROM part WHERE p_partkey < 200) AS qw
FROM part WHERE p_partkey < 60
ORDER BY p_partkey
""",
        dialect="clickhouse",
    )


@register(
    "chsql_vocab_r39",
    oracle="""
WITH e AS (SELECT event_id FROM events WHERE event_id < 120),
el AS (
  SELECT event_id, g.i,
    CAST((event_id * 7 + g.i * 13) % 97 AS DOUBLE)
      / CAST(97 AS DOUBLE) AS s,
    CASE WHEN (event_id + g.i) % 3 = 0 THEN 1 ELSE 0 END AS l,
    CAST((event_id + g.i) % 7 AS DOUBLE) - CAST(3.0 AS DOUBLE) AS a,
    CAST((event_id + g.i) % 5 AS DOUBLE) * CAST(1.5 AS DOUBLE)
      - CAST(2.0 AS DOUBLE) AS b
  FROM e CROSS JOIN (SELECT unnest(range(0, 12)) AS i) g
),
rk AS (
  SELECT event_id, s, l,
    rank() OVER (PARTITION BY event_id ORDER BY s)
      + (count(*) OVER (PARTITION BY event_id, s) - 1) / 2.0 AS ar,
    row_number() OVER (PARTITION BY event_id ORDER BY s DESC, l) AS rn
  FROM el
),
tp AS (
  SELECT event_id, rn, l,
    sum(l) OVER (PARTITION BY event_id ORDER BY rn) AS tps
  FROM rk
),
m AS (
  SELECT rk.event_id,
    round((sum(CASE WHEN rk.l = 1 THEN rk.ar ELSE 0 END)
      - sum(rk.l) * (sum(rk.l) + 1) / 2.0)
      / (sum(rk.l) * (count(*) - sum(rk.l))), 6) AS auc
  FROM rk GROUP BY rk.event_id
),
p AS (
  SELECT event_id,
    round(sum(CASE WHEN l = 1 THEN tps * CAST(1 AS DOUBLE) / rn END)
      / sum(l), 6) AS pr
  FROM tp GROUP BY event_id
),
n AS (
  SELECT event_id,
    round(pow(sum(pow(abs(a), CAST(3 AS DOUBLE))),
      1 / CAST(3 AS DOUBLE)), 6) AS lp3,
    round(pow(sum(pow(abs(a - b), CAST(2.5 AS DOUBLE))),
      1 / CAST(2.5 AS DOUBLE)), 6) AS lpd,
    round(sum(a * a), 6) AS sq,
    round(sum((a - b) * (a - b)), 6) AS sqd
  FROM el GROUP BY event_id
)
SELECT m.event_id, m.auc, p.pr, n.lp3, n.lpd, n.sq, n.sqd
FROM m
JOIN p ON p.event_id = m.event_id
JOIN n ON n.event_id = m.event_id
ORDER BY m.event_id
""",
    tags=("chsql", "dialect", "vocabulary", "statistics"),
)
def chsql_vocab_r39(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary batch 39 (round 12) — the ML-metric array tier
    (CH 25.x): ``arrayROCAUC`` (tie-averaged rank identity, also under
    the pre-25.x ``arrayAUC`` name), ``arrayPrAUC`` (average precision /
    rectangle rule, CH's documented example pinned in pytest),
    ``LpNorm`` / ``LpDistance`` (general p), ``L2SquaredNorm`` /
    ``L2SquaredDistance`` — per-row planted arrays (deterministic from
    event_id; score values distinct within each row so tie conventions
    don't enter), the oracle replaying AUC via window average-ranks and
    AP via a cumulative-TP window.  All pure JVM folds, one scan."""
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark).sql(
        """
SELECT event_id,
  round(arrayROCAUC(
    arrayMap(i -> toFloat64((event_id * 7 + i * 13) % 97) / toFloat64(97),
             range(12)),
    arrayMap(i -> IF((event_id + i) % 3 = 0, 1, 0), range(12))), 6) AS auc,
  round(arrayPrAUC(
    arrayMap(i -> toFloat64((event_id * 7 + i * 13) % 97) / toFloat64(97),
             range(12)),
    arrayMap(i -> IF((event_id + i) % 3 = 0, 1, 0), range(12))), 6) AS pr,
  round(LpNorm(
    arrayMap(i -> toFloat64((event_id + i) % 7) - toFloat64(3.0),
             range(12)), 3), 6) AS lp3,
  round(LpDistance(
    arrayMap(i -> toFloat64((event_id + i) % 7) - toFloat64(3.0),
             range(12)),
    arrayMap(i -> toFloat64((event_id + i) % 5) * toFloat64(1.5)
             - toFloat64(2.0), range(12)), 2.5), 6) AS lpd,
  round(L2SquaredNorm(
    arrayMap(i -> toFloat64((event_id + i) % 7) - toFloat64(3.0),
             range(12))), 6) AS sq,
  round(L2SquaredDistance(
    arrayMap(i -> toFloat64((event_id + i) % 7) - toFloat64(3.0),
             range(12)),
    arrayMap(i -> toFloat64((event_id + i) % 5) * toFloat64(1.5)
             - toFloat64(2.0), range(12))), 6) AS sqd
FROM events WHERE event_id < 120
ORDER BY event_id
""",
        dialect="clickhouse",
    )
