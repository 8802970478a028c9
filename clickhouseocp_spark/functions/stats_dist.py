"""F-distribution survival function for the ANOVA tier.

``analysisOfVariance`` (ClickHouse 24.x, pinned image 25.7 —
``Dockerfile:102``) returns (f_statistic, p_value); the p-value needs the
regularized incomplete beta function, which neither Spark SQL nor DuckDB
ships.  The kernel implements the Numerical-Recipes ``betai``/``betacf``
continued fraction (public formulas, Press et al. §6.4) over
``math.lgamma`` — exact doubles, deterministic, and replayable in any
oracle by the same Python replay (pytest pins it).

Scale shape: the UDF runs on POST-aggregation scalars (one row per
group), so the Arrow crossing is group-count-bounded — never row-bounded.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf


def _betacf(a: float, b: float, x: float) -> float:
    """NR continued fraction for the incomplete beta (Lentz; iteration
    budget IS ``sqlstats.betacf_sql``'s adaptive envelope —
    clamp(3·sqrt(max(a,b)) + 50, [100, 10000]) — plus the eps early
    break, which the fixed-length SQL fold doesn't need because
    converged tail factors multiply by 1.  The floor was 200 here vs
    100 in betacf_sql/duck_betacf while the docstrings claimed
    identical envelopes — ADVICE r12 #5; now all three share 100."""
    eps, fpmin = 3e-16, 1e-300
    iters = int(min(10000.0, max(100.0, 3.0 * max(a, b) ** 0.5 + 50.0)))
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < fpmin:
        d = fpmin
    d = 1.0 / d
    h = d
    for m in range(1, iters + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < fpmin:
            d = fpmin
        c = 1.0 + aa / c
        if abs(c) < fpmin:
            c = fpmin
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < fpmin:
            d = fpmin
        c = 1.0 + aa / c
        if abs(c) < fpmin:
            c = fpmin
        d = 1.0 / d
        dl = d * c
        h *= dl
        if abs(dl - 1.0) < eps:
            break
    return h


def betai(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b) (NR betai)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    bt = math.exp(
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log(1.0 - x)
    )
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def f_survival(f: float, d1: float, d2: float) -> float:
    """P(F' > f) for F-distribution(d1, d2) = I_{d2/(d2+d1·f)}(d2/2, d1/2)."""
    if f <= 0.0 or d1 <= 0.0 or d2 <= 0.0:
        return 1.0
    return betai(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * f))


def register_dist_udfs(spark: SparkSession) -> None:
    """Expose the F survival kernel to the TEXT path.  Idempotent.

    The pandas_udf objects are created HERE, not at module level: the
    kernels reference the module's plain-Python helpers, so cloudpickle
    imports this module inside the worker — a module-level
    ``@pandas_udf("<ddl string>")`` would then try to parse its return
    type with no SparkContext and crash the worker at import (learned
    empirically; stl.py dodges it with an explicit DataType, this module
    keeps import side-effect-free)."""

    @pandas_udf("double")
    def f_dist_survival(
        f: pd.Series, d1: pd.Series, d2: pd.Series
    ) -> pd.Series:
        return pd.Series(
            [
                None
                if any(
                    v is None or (isinstance(v, float) and math.isnan(v))
                    for v in (a, b, c)
                )
                else f_survival(float(a), float(b), float(c))
                for a, b, c in zip(f, d1, d2)
            ]
        )

    spark.udf.register("fDistSurvival", f_dist_survival)
