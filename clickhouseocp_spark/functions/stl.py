"""seriesDecomposeSTL — ClickHouse's STL decomposition (24.x time-series
tier, pinned image 25.7 — ``Dockerfile:102``) as an Arrow-vectorized
kernel.

CH signature: ``seriesDecomposeSTL(series, period) ->
Array(Array(Float64))`` — ``[seasonal, trend, residue]``, each the length
of the input.

Implementation: the published STL (Cleveland, Cleveland, McRae & Terpenning,
"STL: A Seasonal-Trend Decomposition Procedure Based on Loess", J. Official
Statistics 6(1), 1990 — public) with the common ``seasonal="periodic"``
simplification (each cycle-subseries smoothed to its mean — the variant
statsmodels exposes as ``period``-robust default for stable seasonality)
and a degree-1 tricube-weighted loess for the trend with the paper's
default span ``next_odd(ceil(1.5·p))``.  CH wraps the C++ stl-cpp port, so
bitwise parity is not defined across engines — the checkable contracts are
structural and hold exactly: ``seasonal + trend + residue == series``
(residue is computed as the closure), the seasonal component is
``period``-periodic by construction, and planted signals are recovered
(pytest).  Decomposition of a series shorter than ``2·period`` is NULL
(CH throws; NULL is this repo's ANSI-safe analog, documented).

Scale shape: a pandas_udf over ``array<double>`` — the batch crosses to
Python once via Arrow, each row is O(n·span) in the series length (a
make-series axis, bounded by range/step), nothing shuffles (the
seriesPeriodDetectFFT discipline).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType


def _loess(y, span):
    """Degree-1 loess with tricube weights over the integer axis 0..n-1,
    evaluated at every point; span = number of neighbors used."""
    import numpy as np

    n = y.size
    span = max(3, min(span if span % 2 == 1 else span + 1, n))
    half = span // 2
    x = np.arange(n, dtype=np.float64)
    out = np.empty(n)
    for i in range(n):
        lo = max(0, min(i - half, n - span))
        hi = lo + span
        xs = x[lo:hi]
        ys = y[lo:hi]
        d = np.abs(xs - i)
        dmax = d.max()
        w = (1 - (d / dmax) ** 3) ** 3 if dmax > 0 else np.ones_like(d)
        sw = w.sum()
        xm = (w * xs).sum() / sw
        ym = (w * ys).sum() / sw
        den = (w * (xs - xm) ** 2).sum()
        b = (w * (xs - xm) * (ys - ym)).sum() / den if den > 1e-12 else 0.0
        out[i] = ym + b * (i - xm)
    return out


def _stl(a, period, n_inner=2):
    """Return (seasonal, trend) arrays; residue is the caller's closure."""
    import numpy as np

    n = a.size
    trend = np.zeros(n)
    trend_span = int(np.ceil(1.5 * period))
    for _ in range(n_inner):
        detr = a - trend
        # periodic cycle-subseries smoothing: each phase -> its mean
        seas = np.empty(n)
        for k in range(period):
            seas[k::period] = detr[k::period].mean()
        # de-mean so the seasonal component carries no trend
        seas -= seas.mean()
        trend = _loess(a - seas, trend_span)
    return seas, trend


# explicit DataType, NOT the DDL string: a nested "array<array<double>>"
# string is parsed lazily (possibly inside the Python worker, where no
# SparkContext exists) — primitives survive that, nested DDL does not
_STL_TYPE = ArrayType(ArrayType(DoubleType()))


@pandas_udf(_STL_TYPE)
def series_decompose_stl(col: pd.Series, period: pd.Series) -> pd.Series:
    import numpy as np

    out = []
    for arr, p in zip(col, period):
        if arr is None or p is None or int(p) < 2:
            out.append(None)
            continue
        p = int(p)
        a = np.asarray(arr, dtype=np.float64)
        if a.size < 2 * p or not np.isfinite(a).all():
            out.append(None)
            continue
        seas, trend = _stl(a, p)
        resid = a - seas - trend
        out.append([
            [float(v) for v in seas],
            [float(v) for v in trend],
            [float(v) for v in resid],
        ])
    return pd.Series(out)


def register_stl_udfs(spark: SparkSession) -> None:
    """Expose the kernel to the TEXT path under the ClickHouse name
    (unknown names pass through the transpiler verbatim).  Idempotent."""
    spark.udf.register("seriesDecomposeSTL", series_decompose_stl)
