"""seriesPeriodDetectFFT — ClickHouse's FFT period detector (25.x
time-series tier) as an Arrow-vectorized kernel.

CH signature: ``seriesPeriodDetectFFT(arr) -> Float64`` — the dominant
period of a numeric series, found as the argmax bin of the FFT magnitude
spectrum (DC excluded); NaN when the series is too short or flat.

Scale shape: a pandas_udf over ``array<double>`` — the whole batch crosses
to Python ONCE via Arrow, each row's rfft is O(n log n) in the series
length (a make-series axis, bounded by range/step), and nothing shuffles:
the kernel runs inside whatever stage produced the series column.  This is
the documented pattern for the numeric-kernel tier (same class as PCA's
partial-Gram mapInPandas): use numpy where Catalyst has no primitive, keep
it per-row/per-partition so the exchange layout is untouched.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType


@pandas_udf("double")
def series_period_fft(col: pd.Series) -> pd.Series:
    import numpy as np

    out = []
    for arr in col:
        if arr is None:
            out.append(float("nan"))
            continue
        a = np.asarray(arr, dtype=np.float64)
        if a.size < 4 or not np.isfinite(a).all():
            out.append(float("nan"))
            continue
        a = a - a.mean()
        mag = np.abs(np.fft.rfft(a))
        mag[0] = 0.0
        k = int(mag.argmax())
        out.append(float(a.size) / k if k > 0 and mag[k] > 1e-9 else math.nan)
    return pd.Series(out)


def register_series_udfs(spark: SparkSession) -> None:
    """Expose the kernel to the TEXT path under the ClickHouse name (the
    transpiler passes unknown function names through verbatim, so a
    registered UDF makes ``seriesPeriodDetectFFT(...)`` valid CH-dialect
    text).  Idempotent."""
    spark.udf.register("seriesPeriodDetectFFT", series_period_fft)
    spark.udf.register("seriesFitPoly", series_fit_poly_k)


@pandas_udf(ArrayType(DoubleType()))
def series_fit_poly_k(
    y: pd.Series, x: pd.Series, degree: pd.Series
) -> pd.Series:
    """series_fit_poly (Kusto): least-squares polynomial fit per row —
    returns the coefficient array HIGHEST degree first (the
    numpy.polyfit convention, matching Kusto's documented order).
    x = NULL → the implicit 0..n−1 axis.  Same Arrow discipline as the
    FFT kernel: self-contained (no module-level helper references, so a
    worker import never executes a DDL-parsing decorator), one crossing
    per batch, O(n·k²) per row."""
    import numpy as np

    out = []
    for ys, xs, k in zip(y, x, degree):
        if ys is None or k is None or int(k) < 1:
            out.append(None)
            continue
        a = np.asarray(ys, dtype=np.float64)
        ax = (
            np.arange(a.size, dtype=np.float64)
            if xs is None
            else np.asarray(xs, dtype=np.float64)
        )
        if a.size <= int(k) or ax.size != a.size or not np.isfinite(a).all():
            out.append(None)
            continue
        out.append([float(c) for c in np.polyfit(ax, a, int(k))])
    return pd.Series(out)
