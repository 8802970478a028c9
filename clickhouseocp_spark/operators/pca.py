"""PCA over an embedding column — dimensionality reduction for the
LLM-curation tier (whitening / projection ahead of clustering and ANN;
the step a 100 TB embedding pipeline runs between encode and SemDeDup /
IVF so cells are learned in a compact, decorrelated space).

Reference scope: ClickHouse 25.7 (the engine the reference image packages)
has no PCA; this is part of the beyond-reference LLM-data-pipeline tier the
build brief makes first-class.

Spark-first shape (the only shape that survives 100 TB):

1. **Partial Gram pass** — ``mapInPandas`` emits ONE row per Arrow batch:
   ``(n, sum_vec[d], gram[d*d])``.  The data never leaves the scan
   partition; what shuffles to the driver is O(batches * d^2) doubles.
2. **Driver reduce + eigh** — partials fold into mean + covariance
   (``(G - n·μμᵀ)/n``), then ``numpy.linalg.eigh`` (symmetric, O(d^3),
   d = 64 here).  Bounded by contract: d^2 doubles, independent of rows.
   For d beyond a few thousand, swap stage 2 for randomized SVD on the
   same partials — the scan-side contract is unchanged.
3. **Projection pass** — a vectorized pandas UDF computes
   ``(X - μ) @ Wᵀ`` per Arrow batch (one BLAS matmul), streaming; no
   shuffle, no collect of data rows.

Determinism: eigenvector sign is pinned (largest-|coordinate| entry made
positive) so repeated fits agree; eigenvalue order is descending.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, DoubleType


@dataclass
class PcaModel:
    mean: np.ndarray  # (d,)
    components: np.ndarray  # (k, d) rows = principal axes, desc eigenvalue
    explained_variance: np.ndarray  # (k,) eigenvalues, desc
    total_variance: float  # trace of the covariance

    @property
    def explained_variance_ratio(self) -> np.ndarray:
        return self.explained_variance / max(self.total_variance, 1e-300)


def pca_fit(df: DataFrame, vec_col: str, k: int) -> PcaModel:
    """Fit PCA on ``df[vec_col]`` (array<float/double>, fixed length d).

    One distributed pass (partial Gram per Arrow batch), one bounded driver
    reduce, one d×d eigh.  ``k`` is clamped to d.
    """
    schema = "n long, s array<double>, g array<double>"

    def partials(batches):
        for pdf in batches:
            vecs = [v for v in pdf[vec_col] if v is not None]
            if not vecs:
                continue
            x = np.asarray(np.stack(vecs), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "n": [x.shape[0]],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [(x.T @ x).ravel().tolist()],
                }
            )

    rows = df.select(vec_col).mapInPandas(partials, schema).collect()
    if not rows:
        raise ValueError("pca_fit: no non-null vectors")
    n = sum(r.n for r in rows)
    s = np.sum([np.asarray(r.s) for r in rows], axis=0)
    d = s.shape[0]
    g = np.sum([np.asarray(r.g).reshape(d, d) for r in rows], axis=0)
    mu = s / n
    cov = (g - n * np.outer(mu, mu)) / n
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    k = min(k, d)
    comps = evecs[:, order[:k]].T.copy()  # (k, d)
    for row in comps:  # sign convention: dominant coordinate positive
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1.0
    return PcaModel(
        mean=mu,
        components=comps,
        explained_variance=np.maximum(evals[order[:k]], 0.0),
        total_variance=float(max(np.trace(cov), 0.0)),
    )


def pca_project(df: DataFrame, vec_col: str, model: PcaModel,
                out_col: str = "pca") -> DataFrame:
    """Append ``out_col`` = array<double> of length k: ``(x - μ) @ Wᵀ``.

    Vectorized pandas UDF — one BLAS matmul per Arrow batch; streams with
    the scan, no shuffle."""
    mu = model.mean
    w_t = model.components.T  # (d, k)

    @F.pandas_udf(ArrayType(DoubleType()))
    def _proj(v: pd.Series) -> pd.Series:
        out = []
        mask = v.notna()
        if mask.any():
            x = np.asarray(np.stack(v[mask]), dtype=np.float64)
            proj = (x - mu) @ w_t
            it = iter(proj)
        for ok in mask:
            out.append(next(it).tolist() if ok else None)
        return pd.Series(out)

    return df.withColumn(out_col, _proj(F.col(vec_col)))


def reconstruction_residual_sq(model: PcaModel, vec_col, proj_col):
    """Column: squared reconstruction residual ``||(x-μ) - p·W||²`` per row
    (vectorized; used by the registry query's Eckart-Young contract)."""
    mu, w = model.mean, model.components

    @F.pandas_udf(DoubleType())
    def _resid(v: pd.Series, p: pd.Series) -> pd.Series:
        x = np.asarray(np.stack(v), dtype=np.float64) - mu
        r = x - np.asarray(np.stack(p)) @ w
        return pd.Series((r * r).sum(axis=1))

    return _resid(F.col(vec_col) if isinstance(vec_col, str) else vec_col,
                  F.col(proj_col) if isinstance(proj_col, str) else proj_col)
