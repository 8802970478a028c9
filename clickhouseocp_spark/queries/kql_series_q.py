"""KQL ``series_*`` time-series vocabulary — registry queries (round 8).

Kusto pairs ``make-series`` with a family of series scalar functions
(element-wise arithmetic, gap fills, least-squares fit); the reference
exposes the same analytics workflow via its Kusto-dialect surface
(`SET dialect='kusto'`).  Every function lowers to per-row array
combinators (``transform``/``zip_with``/``aggregate``) — ZERO exchanges
beyond the one make-series hash aggregate, so the plan shape is identical
to the plain make-series query no matter how many series functions stack
on top.  Series length = the axis bin count (bounded by range/step), so
per-row work is linear in bins, never in events.

Determinism: bin sums route through DECIMAL(38,6) (exact) and counts are
integer-exact in DOUBLE, so every derived element is the same IEEE double
on both engines; the oracles REPLAY the closed-form formulas textually
(never regr_*/stddev built-ins) so arithmetic matches bitwise, with
round(6) as belt-and-braces.

Output shape (round 9): every series is emitted COMMA-JOINED — the driver
canonicalizes collected frames via pandas.sort_values, which crashes on
unhashable list cells, so list cells never reach the driver hash.  Doubles
render through a fixed printf format on both engines; NULL elements render
as the literal 'NULL'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from clickhouseocp_spark.queries import register


def _sj(col: str, alias: str | None = None) -> F.Column:
    """Comma-join a double series: round(6) + printf('%.6f') per element
    (NULL → 'NULL'), so the rendered digits are deterministic given
    bitwise-equal rounded doubles on both engines."""
    # NB: format_string renders a NULL argument as the literal 'null'
    # (Java Formatter), so the NULL branch must be explicit.
    return F.expr(
        f"array_join(transform({col}, __x -> if(isnull(__x),"
        " 'NULL', format_string('%.6f', round(__x, 6)))), ',')"
    ).alias(alias or col)


def _sj_raw(col: str, alias: str | None = None) -> F.Column:
    """Comma-join an int/bool series via plain CAST AS STRING."""
    return F.expr(
        f"array_join(transform({col}, __x -> if(isnull(__x),"
        " 'NULL', cast(__x as string))), ',')"
    ).alias(alias or col)

#: shared oracle prelude: replay make-series daily binning with auto bounds
#: (epoch-aligned grid, global min/max bin, axis end-exclusive)
_BIN_PRELUDE = """
WITH src AS (SELECT event_type, ts, value FROM events WHERE ts IS NOT NULL{extra_filter}),
binned AS (
  SELECT event_type, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS b,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s
  FROM src GROUP BY event_type, b),
bounds AS (SELECT MIN(b) AS f, MAX(b) AS t FROM binned),
axis AS (SELECT unnest(generate_series(bo.f, bo.t)) AS b FROM bounds bo),
keys AS (SELECT DISTINCT event_type FROM src),
cells AS (
  SELECT k.event_type, a.b,
         bn.n AS n_raw, bn.s AS s_raw,
         ROW_NUMBER() OVER (PARTITION BY k.event_type ORDER BY a.b) - 1 AS i
  FROM keys k CROSS JOIN axis a
  LEFT JOIN binned bn ON bn.event_type = k.event_type AND bn.b = a.b)
"""


@register(
    "kql_series_arith",
    oracle=_BIN_PRELUDE.format(extra_filter="") + """,
ser AS (
  SELECT event_type,
         list(COALESCE(n_raw, 0.0) ORDER BY i) AS n,
         list(COALESCE(s_raw, 0.0) ORDER BY i) AS s
  FROM cells GROUP BY event_type),
st AS (
  SELECT event_type, n, s,
         CAST(len(n) AS DOUBLE) AS cnt,
         list_sum(n) AS nsum,
         list_sum(list_transform(n, x -> x * x)) AS nss
  FROM ser)
SELECT event_type,
  array_to_string(list_transform(list_zip(s, n),
    z -> printf('%.6f', round(z[1] + z[2], 6))), ',') AS ssum,
  array_to_string(list_transform(list_zip(s, n),
    z -> printf('%.6f', round(z[1] - z[2], 6))), ',') AS sdif,
  array_to_string(list_transform(n,
    x -> printf('%.6f', round(x * x, 6))), ',') AS sprod,
  array_to_string(list_transform(list_zip(s, n),
    z -> printf('%.6f', round(z[1] / (z[2] + 1.0), 6))), ',') AS srat,
  array_to_string(list_transform(s,
    x -> CAST(x > 100.0 AS VARCHAR)), ',') AS sgt,
  array_to_string(list_transform(n,
    x -> printf('%.6f', round(abs(x - 70.0), 6))), ',') AS sab,
  round(list_sum(s), 6) AS tot,
  list_max(n) AS mxn,
  list_min(n) AS mnn,
  round(list_sum(s) / CAST(len(s) AS DOUBLE), 6) AS avgs,
  list_min(n) AS st_min,
  list_position(n, list_min(n)) - 1 AS st_min_idx,
  list_max(n) AS st_max,
  list_position(n, list_max(n)) - 1 AS st_max_idx,
  round(nsum / cnt, 6) AS st_avg,
  round(sqrt((nss - nsum * nsum / cnt) / (cnt - 1)), 6) AS st_stdev,
  round(nsum, 6) AS st_sum,
  len(n) AS st_len
FROM st ORDER BY event_type
""",
    tags=("kql", "dialect", "timeseries"),
)
def kql_series_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto series element-wise arithmetic + reductions + stats bundle:
    ``series_add/subtract/multiply/divide`` (scalar broadcast on the
    second operand), ``series_greater``, ``series_abs``, ``series_sum/
    avg/min/max``, ``series_stats_dynamic``.  One hash-agg shuffle (the
    make-series fold); everything above it is per-row array math inside
    the same stage.  Count series are integer-exact doubles and the value
    series routes through DECIMAL, so both engines see bitwise-identical
    elements; the oracle replays each formula textually."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        """
events
| make-series n = count() default = 0,
              s = sum(cast(value as decimal(38,6))) default = 0
              on ts step 1d by event_type
| extend ssum = series_add(s, n), sdif = series_subtract(s, n),
         sprod = series_multiply(n, n),
         srat = series_divide(s, series_add(n, 1)),
         sgt = series_greater(s, 100),
         sab = series_abs(series_subtract(n, 70)),
         tot = series_sum(s), mxn = series_max(n), mnn = series_min(n),
         avgs = series_avg(s), st = series_stats_dynamic(n)
| project event_type, ssum, sdif, sprod, srat, sgt, sab,
          tot = round(tot, 6), mxn, mnn, avgs = round(avgs, 6),
          st_min = st.min, st_min_idx = st.min_idx,
          st_max = st.max, st_max_idx = st.max_idx,
          st_avg = round(st.avg, 6), st_stdev = round(st.stdev, 6),
          st_sum = round(st.sum, 6), st_len = st.len
| sort by event_type asc
""",
        dialect="kusto",
    )
    return df.select(
        "event_type", _sj("ssum"), _sj("sdif"), _sj("sprod"), _sj("srat"),
        _sj_raw("sgt"), _sj("sab"), "tot", "mxn", "mnn", "avgs",
        "st_min", "st_min_idx", "st_max", "st_max_idx",
        "st_avg", "st_stdev", "st_sum", "st_len",
    )


@register(
    "kql_series_fill",
    oracle=_BIN_PRELUDE.format(
        extra_filter=" AND value > 300"
    ) + """,
w AS (
  SELECT event_type, i, s_raw AS v,
    last_value(s_raw IGNORE NULLS)
      OVER (PARTITION BY event_type ORDER BY i) AS pv,
    max(CASE WHEN s_raw IS NOT NULL THEN i END)
      OVER (PARTITION BY event_type ORDER BY i) AS pi,
    first_value(s_raw IGNORE NULLS)
      OVER (PARTITION BY event_type ORDER BY i
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    min(CASE WHEN s_raw IS NOT NULL THEN i END)
      OVER (PARTITION BY event_type ORDER BY i
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ni
  FROM cells)
SELECT event_type,
  string_agg(COALESCE(printf('%.6f', round(v, 6)), 'NULL'),
             ',' ORDER BY i) AS v_r,
  string_agg(COALESCE(printf('%.6f', round(pv, 6)), 'NULL'),
             ',' ORDER BY i) AS ff,
  string_agg(COALESCE(printf('%.6f', round(nv, 6)), 'NULL'),
             ',' ORDER BY i) AS bf,
  string_agg(printf('%.6f', round(COALESCE(v, 0.0), 6)),
             ',' ORDER BY i) AS cf,
  string_agg(printf('%.6f', round(COALESCE(v,
    CASE WHEN pv IS NULL THEN nv
         WHEN nv IS NULL THEN pv
         WHEN ni = pi THEN pv
         ELSE pv + (nv - pv) * CAST(i - pi AS DOUBLE) / CAST(ni - pi AS DOUBLE)
    END), 6)), ',' ORDER BY i) AS lin
FROM w GROUP BY event_type ORDER BY event_type
""",
    tags=("kql", "dialect", "timeseries"),
)
def kql_series_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto gap-fill vocabulary over a sparse series (``default = null``
    leaves real holes): ``series_fill_forward`` / ``_backward`` /
    ``_const`` / ``_linear``.  The fills are single linear ``aggregate``
    scans per row (forward fill carries the last non-null; linear fill
    runs two (value, index) struct scans + one zip — O(bins), never
    O(bins²)); edge nulls take the nearest non-null (Kusto's edge rule).
    The oracle replays the fills with IGNORE-NULLS window functions over
    the unnested axis and re-aggregates with ``list(... ORDER BY i)``."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        """
events
| where value > 300
| make-series v = sum(cast(value as decimal(38,6))) default = null
              on ts step 1d by event_type
| extend ff = series_fill_forward(v), bf = series_fill_backward(v),
         cf = series_fill_const(v, 0), lin = series_fill_linear(v)
| project event_type, v, ff, bf, cf, lin
| sort by event_type asc
""",
        dialect="kusto",
    )
    return df.select(
        "event_type", _sj("v", "v_r"), _sj("ff"), _sj("bf"),
        _sj("cf"), _sj("lin"),
    )


@register(
    "kql_series_fit",
    oracle=_BIN_PRELUDE.format(extra_filter="") + """,
sums AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(COALESCE(n_raw, 0.0)) AS sy,
         SUM(COALESCE(n_raw, 0.0) * COALESCE(n_raw, 0.0)) AS syy,
         SUM(COALESCE(n_raw, 0.0) * CAST(i AS DOUBLE)) AS sxy,
         SUM(COALESCE(n_raw, 0.0) * COALESCE(n_raw, 0.0)
             * COALESCE(n_raw, 0.0)) AS sab,
         SUM(COALESCE(n_raw, 0.0) * COALESCE(n_raw, 0.0)
             * COALESCE(n_raw, 0.0) * COALESCE(n_raw, 0.0)) AS sbb
  FROM cells GROUP BY event_type),
l2 AS (SELECT *, n * (n - 1) / 2 AS sx, (n - 1) * n * (2 * n - 1) / 6 AS sxx
       FROM sums),
l3 AS (SELECT *, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope FROM l2),
l4 AS (SELECT *, (sy - slope * sx) / n AS icpt,
              syy - sy * sy / n AS sstot,
              syy - 2 * ((sy - slope * sx) / n) * sy - 2 * slope * sxy
              + n * pow((sy - slope * sx) / n, 2)
              + 2 * ((sy - slope * sx) / n) * slope * sx
              + slope * slope * sxx AS ssres
       FROM l3)
SELECT event_type,
  round(slope, 6) AS slope,
  round(icpt, 6) AS interception,
  round(CASE WHEN sstot = 0 THEN 1.0 ELSE 1.0 - ssres / sstot END, 6)
    AS rsquare,
  round(sstot / (n - 1), 6) AS variance,
  round(ssres / (n - 1), 6) AS rvariance,
  array_to_string(list_transform(generate_series(0, CAST(n AS INT) - 1),
    k -> printf('%.6f', round(icpt + slope * CAST(k AS DOUBLE), 6))), ',')
    AS line_fit,
  round((n * sab - sy * syy) /
        (sqrt(n * syy - sy * sy) * sqrt(n * sbb - syy * syy)), 6) AS pc
FROM l4 ORDER BY event_type
""",
    tags=("kql", "dialect", "timeseries"),
)
def kql_series_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``series_fit_line`` (closed-form least squares on x = 0..n-1 →
    rsquare/slope/variance/rvariance/interception/line_fit, bound once
    through singleton-array transforms — a let-expression chain, nothing
    recomputed) + ``series_pearson_correlation``.  Sums over integer-exact
    count series stay exact in DOUBLE, and the oracle replays the SAME
    closed-form expressions (never regr_* built-ins), so the division
    operands match bitwise.  Deviation: Kusto returns a tuple for
    multi-assignment; here a STRUCT whose fields the query projects."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        """
events
| make-series n = count() default = 0 on ts step 1d by event_type
| extend fit = series_fit_line(n),
         pc = series_pearson_correlation(n, series_multiply(n, n))
| project event_type,
          slope = round(fit.slope, 6),
          interception = round(fit.interception, 6),
          rsquare = round(fit.rsquare, 6),
          variance = round(fit.variance, 6),
          rvariance = round(fit.rvariance, 6),
          line_fit = transform(fit.line_fit, __x -> round(__x, 6)),
          pc = round(pc, 6)
| sort by event_type asc
""",
        dialect="kusto",
    )
    return df.select(
        "event_type", "slope", "interception", "rsquare", "variance",
        "rvariance", _sj("line_fit"), "pc",
    )


@register(
    "kql_series_decompose",
    oracle=_BIN_PRELUDE.format(extra_filter="") + """,
ph AS (
  SELECT event_type, i, COALESCE(n_raw, 0.0) AS v,
    SUM(COALESCE(n_raw, 0.0)) OVER (PARTITION BY event_type, i % 7)
      / COUNT(*) OVER (PARTITION BY event_type, i % 7)
    - SUM(COALESCE(n_raw, 0.0)) OVER (PARTITION BY event_type)
      / COUNT(*) OVER (PARTITION BY event_type) AS seas
  FROM cells),
ds AS (SELECT event_type, i, v, seas, v - seas AS d FROM ph),
sums AS (
  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS nn,
         SUM(d) AS sy, SUM(d * CAST(i AS DOUBLE)) AS sxy
  FROM ds GROUP BY event_type),
fit AS (
  SELECT event_type, nn, sy,
         (nn * sxy - (nn * (nn - 1) / 2) * sy)
         / (nn * ((nn - 1) * nn * (2 * nn - 1) / 6)
            - (nn * (nn - 1) / 2) * (nn * (nn - 1) / 2)) AS slope
  FROM sums),
tl AS (
  SELECT d.event_type, d.i, d.v, d.seas,
         (f.sy - f.slope * (f.nn * (f.nn - 1) / 2)) / f.nn
           + f.slope * CAST(d.i AS DOUBLE) AS trend
  FROM ds d JOIN fit f ON d.event_type = f.event_type),
rs AS (
  SELECT event_type, i, v, seas, trend,
         v - (seas + trend) AS resid
  FROM tl),
rstat AS (
  SELECT event_type,
         SUM(resid) / CAST(COUNT(*) AS DOUBLE) AS m,
         SUM(resid * resid) AS ss, CAST(COUNT(*) AS DOUBLE) AS nn
  FROM rs GROUP BY event_type)
SELECT r.event_type,
  string_agg(printf('%.6f', round(r.seas, 6)), ',' ORDER BY r.i) AS seas,
  string_agg(printf('%.6f', round(r.trend, 6)), ',' ORDER BY r.i) AS trend,
  string_agg(printf('%.6f', round(r.seas + r.trend, 6)), ',' ORDER BY r.i)
    AS baseline,
  string_agg(printf('%.6f', round(r.resid, 6)), ',' ORDER BY r.i) AS resid,
  string_agg(printf('%.6f', round(
      (r.resid - t.m) / sqrt((t.ss - t.nn * t.m * t.m) / (t.nn - 1)), 6)),
    ',' ORDER BY r.i) AS score,
  string_agg(CAST(CASE WHEN (r.resid - t.m)
                 / sqrt((t.ss - t.nn * t.m * t.m) / (t.nn - 1)) > 1.5 THEN 1
            WHEN (r.resid - t.m)
                 / sqrt((t.ss - t.nn * t.m * t.m) / (t.nn - 1)) < -1.5 THEN -1
            ELSE 0 END AS VARCHAR), ',' ORDER BY r.i) AS flags
FROM rs r JOIN rstat t ON r.event_type = t.event_type
GROUP BY r.event_type ORDER BY r.event_type
""",
    tags=("kql", "dialect", "timeseries"),
)
def kql_series_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``series_decompose`` + ``series_decompose_anomalies`` (round 8):
    additive decomposition with an explicit period — seasonal = zero-sum
    per-phase means, trend = least-squares line on the deseasonalized
    series, residual = the rest; anomaly score = the residual's sample
    z-score, flags at ±threshold.  Documented deviations: Kusto's seasonal
    extractor is median-based and its scorer a Tukey fence; period
    auto-detection lives in seriesPeriodDetectFFT's kernel.  Every stage
    is an array combinator bound once through singleton-array transforms
    (O(bins·period) per row, zero exchanges — the phase-mean vector binds
    ONCE; inlining it would be O(bins²)).  Per-element values are
    bitwise-mirrored (integer-exact phase sums); only the fit reductions
    are order-sensitive, handled by round(6) on both sides."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        """
events
| make-series n = count() default = 0 on ts step 1d by event_type
| extend d = series_decompose(n, 7),
         an = series_decompose_anomalies(n, 1.5, 7)
| project event_type, seas = d.seasonal, trend = d.trend,
          baseline = d.baseline, resid = d.residual,
          score = an.ad_score, flags = an.ad_flag
| sort by event_type asc
""",
        dialect="kusto",
    )
    return df.select(
        "event_type", _sj("seas"), _sj("trend"), _sj("baseline"),
        _sj("resid"), _sj("score"), _sj_raw("flags"),
    )


@register(
    "kql_series_outliers",
    oracle=_BIN_PRELUDE.format(extra_filter="") + """,
ser AS (
  SELECT event_type,
         list(COALESCE(n_raw, 0.0) ORDER BY i) AS v,
         list_sort(list(COALESCE(n_raw, 0.0))) AS s,
         CAST(len(list(n_raw)) AS INT) AS n
  FROM cells GROUP BY event_type),
qs AS (
  SELECT event_type, v,
    s[CAST(floor(0.25 * (n - 1)) AS INT) + 1]
      + (0.25 * (n - 1) - floor(0.25 * (n - 1)))
        * (s[least(CAST(floor(0.25 * (n - 1)) AS INT) + 2, n)]
           - s[CAST(floor(0.25 * (n - 1)) AS INT) + 1]) AS q1,
    s[CAST(floor(0.75 * (n - 1)) AS INT) + 1]
      + (0.75 * (n - 1) - floor(0.75 * (n - 1)))
        * (s[least(CAST(floor(0.75 * (n - 1)) AS INT) + 2, n)]
           - s[CAST(floor(0.75 * (n - 1)) AS INT) + 1]) AS q3
  FROM ser)
SELECT event_type,
  round(q1, 6) AS q1, round(q3, 6) AS q3,
  array_to_string(list_transform(v, e -> printf('%.6f', round(CASE
    WHEN q3 - q1 = 0 THEN 0.0
    WHEN e > q3 + 1.5 * (q3 - q1) THEN (e - q3) / (q3 - q1) - 1.5
    WHEN e < q1 - 1.5 * (q3 - q1) THEN (e - q1) / (q3 - q1) + 1.5
    ELSE 0.0 END, 6))), ',') AS scores
FROM qs ORDER BY event_type
""",
    tags=("kql", "dialect", "timeseries"),
)
def kql_series_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``series_outliers`` (round 8): Tukey-fence anomaly scores — 0
    inside [q25 − k·IQR, q75 + k·IQR], else the signed distance beyond
    the nearest quartile in IQR units minus k.  Quartiles are the
    linearly-interpolated percentiles of the sorted series, bound ONCE
    through a singleton-struct transform (O(bins log bins) per row, zero
    exchanges).  The oracle mirrors the interpolation index arithmetic on
    DuckDB's sorted lists, so the fence comparisons see identical doubles."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        """
events
| make-series n = count() default = 0 on ts step 1d by event_type
| extend o = series_outliers(n)
| project event_type, n
| sort by event_type asc
""",
        dialect="kusto",
    )
    # recompute quartiles visibly so the projection carries them too
    srt = "array_sort(transform(n, __e -> CAST(__e AS DOUBLE)))"

    def q(frac: str) -> str:
        return (
            f"element_at({srt}, CAST(floor({frac} * (size(n) - 1)) AS INT)"
            f" + 1) + ({frac} * (size(n) - 1) - floor({frac} * (size(n) - 1)))"
            f" * (element_at({srt}, least(CAST(floor({frac} * (size(n) - 1))"
            f" AS INT) + 2, size(n)))"
            f" - element_at({srt}, CAST(floor({frac} * (size(n) - 1)) AS INT)"
            f" + 1))"
        )

    from clickhouseocp_spark.kql import _kql_series_outliers

    return df.select(
        "event_type",
        F.expr(f"round({q('0.25D')}, 6)").alias("q1"),
        F.expr(f"round({q('0.75D')}, 6)").alias("q3"),
        F.expr(
            f"array_join(transform({_kql_series_outliers(['n'])},"
            " __x -> if(isnull(__x),"
            " 'NULL', format_string('%.6f', round(__x, 6)))), ',')"
        ).alias("scores"),
    )


@register(
    "kql_series_fir_iir",
    oracle=_BIN_PRELUDE.format(extra_filter="") + """,
w AS (
  SELECT event_type, i, COALESCE(n_raw, 0.0) AS v,
         COALESCE(lag(n_raw, 1) OVER (PARTITION BY event_type ORDER BY i),
                  0.0) AS v1,
         COALESCE(lag(n_raw, 2) OVER (PARTITION BY event_type ORDER BY i),
                  0.0) AS v2
  FROM cells),
fir AS (
  SELECT event_type, i, v,
         ((0.0 + (1.0 / 3.0) * v) + (1.0 / 3.0) * v1) + (1.0 / 3.0) * v2
           AS ma
  FROM w),
iir AS (
  WITH RECURSIVE r(event_type, i, yi) AS (
    SELECT event_type, i, (0.5 * v - (-0.5) * 0.0) / 1.0
    FROM fir WHERE i = 0
    UNION ALL
    SELECT f.event_type, f.i, (0.5 * f.v - (-0.5) * r.yi) / 1.0
    FROM r JOIN fir f ON f.event_type = r.event_type AND f.i = r.i + 1)
  SELECT * FROM r)
SELECT f.event_type,
  string_agg(printf('%.6f', round(f.ma, 6)), ',' ORDER BY f.i) AS ma,
  string_agg(printf('%.6f', round(x.yi, 6)), ',' ORDER BY x.i) AS ema
FROM fir f JOIN iir x ON f.event_type = x.event_type AND f.i = x.i
GROUP BY f.event_type ORDER BY f.event_type
""",
    tags=("kql", "dialect", "timeseries"),
)
def kql_series_fir_iir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``series_fir`` / ``series_iir`` (round 8) — the Kusto DSP pair:
    FIR = zero-padded moving filter (normalized 3-tap average here),
    IIR = recursive filter carried through ONE linear fold
    (y = 0.5·x + 0.5·y₋₁, the EMA idiom).  O(bins·k) per row, zero
    exchanges.  The oracle mirrors the j-ascending FIR accumulation
    textually and replays the IIR recursion with a per-key recursive CTE,
    so every float op matches bitwise before the belt-and-braces round."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        """
events
| make-series n = count() default = 0 on ts step 1d by event_type
| extend ma = series_fir(n, dynamic([1, 1, 1])),
         ema = series_iir(n, dynamic([0.5]), dynamic([1, -0.5]))
| project event_type, ma, ema
| sort by event_type asc
""",
        dialect="kusto",
    )
    return df.select("event_type", _sj("ma"), _sj("ema"))


@register(
    "kql_series_compare",
    oracle="""
WITH s AS (
  SELECT event_id,
    list_transform(range(1, 5),
      i -> CAST(event_id % (i + 2) + i AS DOUBLE)) AS a,
    list_transform(range(1, 5),
      i -> CAST((event_id + i) % 5 + 1 AS DOUBLE)) AS b,
    list_transform(range(1, 5),
      i -> CAST(event_id % (i + 2) AS BIGINT)) AS ai,
    list_transform(range(1, 5),
      i -> CAST((event_id + i) % 4 AS BIGINT)) AS bi
  FROM events WHERE event_id < 100)
SELECT event_id,
  array_to_string(list_transform(list_zip(a, b),
    z -> CAST(z[1] < z[2] AS VARCHAR)), ',') AS lt,
  array_to_string(list_transform(list_zip(a, b),
    z -> CAST(z[1] <= z[2] AS VARCHAR)), ',') AS le,
  array_to_string(list_transform(list_zip(a, b),
    z -> CAST(z[1] = z[2] AS VARCHAR)), ',') AS eq,
  array_to_string(list_transform(list_zip(a, b),
    z -> CAST(z[1] <> z[2] AS VARCHAR)), ',') AS ne,
  array_to_string(list_transform(list_zip(a, b),
    z -> printf('%.6f', round(CAST(sign(z[1] - z[2]) AS DOUBLE), 6))),
    ',') AS sg,
  array_to_string(list_transform(a,
    x -> printf('%.6f', round(exp(x / 10.0), 6))), ',') AS ex,
  array_to_string(list_transform(a,
    x -> printf('%.6f', round(ln(x), 6))), ',') AS lg,
  array_to_string(list_transform(a,
    x -> printf('%.6f', round(sqrt(x), 6))), ',') AS sq,
  array_to_string(list_transform(list_concat(ai, bi),
    x -> CAST(x AS VARCHAR)), ',') AS cc,
  array_to_string(list_transform(list_reverse_sort(a),
    x -> printf('%.6f', round(x, 6))), ',') AS sd,
  coalesce(array_to_string(list_transform(
    list_sort(list_distinct(list_filter(ai, x -> list_contains(bi, x)))),
    x -> CAST(x AS VARCHAR)), ','), '') AS si,
  coalesce(array_to_string(list_transform(
    list_sort(list_distinct(
      list_filter(ai, x -> NOT list_contains(bi, x)))),
    x -> CAST(x AS VARCHAR)), ','), '') AS sdf,
  array_to_string(list_transform(
    list_concat([0.0], a[1:3]),
    x -> printf('%.6f', round(x, 6))), ',') AS shr,
  array_to_string(list_transform(
    list_concat([0.0], a[1:3]),
    x -> printf('%.6f', round(x, 6))), ',') AS shn,
  'NULL,NULL,NULL,NULL' AS sho
FROM s ORDER BY event_id
""",
    tags=("kql", "dialect", "timeseries", "vector"),
)
def kql_series_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kusto series comparison + unary-math + set vocabulary (round 10 —
    the lowered-but-unregistered sweep): ``series_less/less_equals/equals/
    not_equals`` (element-wise boolean series), ``series_sign/exp/log/
    sqrt``, ``array_concat``, ``array_sort_desc``, ``set_intersect``/
    ``set_difference`` (sorted before rendering — Spark and DuckDB differ
    on set-result order), and the Kusto-faithful shifts: ``array_shift_
    right(a, 1, 0)``, the NEGATIVE-count left shift (≡ right shift), and
    the OVER-shift (count > size → full fill, no runtime error — the
    round-9 advice fix).  All zero-exchange per-row array folds; the
    oracle re-derives each element with DuckDB list functions."""
    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark)
    df = eng.sql(
        """
events
| where event_id < 100
| extend a = transform(sequence(1, 4), __i -> todouble(event_id % (__i + 2) + __i)),
         b = transform(sequence(1, 4), __i -> todouble((event_id + __i) % 5 + 1)),
         ai = transform(sequence(1, 4), __i -> tolong(event_id % (__i + 2))),
         bi = transform(sequence(1, 4), __i -> tolong((event_id + __i) % 4))
| extend lt = series_less(a, b), le = series_less_equals(a, b),
         eq = series_equals(a, b), ne = series_not_equals(a, b),
         sg = series_sign(series_subtract(a, b)),
         ex = series_exp(series_divide(a, 10)),
         lg = series_log(a), sq = series_sqrt(a),
         cc = array_concat(ai, bi),
         sd = array_sort_desc(a),
         si = array_sort_asc(set_intersect(ai, bi)),
         sdf = array_sort_asc(set_difference(ai, bi)),
         shr = array_shift_right(a, 1, 0.0),
         shn = array_shift_left(a, -1, 0.0),
         sho = array_shift_left(a, 9)
| project event_id, lt, le, eq, ne, sg, ex, lg, sq, cc, sd, si, sdf,
          shr, shn, sho
| sort by event_id asc
""",
        dialect="kusto",
    )
    return df.select(
        "event_id", _sj_raw("lt"), _sj_raw("le"), _sj_raw("eq"),
        _sj_raw("ne"), _sj("sg"), _sj("ex"), _sj("lg"), _sj("sq"),
        _sj_raw("cc"), _sj("sd"), _sj_raw("si"), _sj_raw("sdf"),
        _sj("shr"), _sj("shn"), _sj("sho"),
    )
