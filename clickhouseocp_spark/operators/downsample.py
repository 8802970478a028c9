"""Time-series downsampling: ``largestTriangleThreeBuckets`` analog.

ClickHouse 25.x ships ``largestTriangleThreeBuckets(n)(x, y)`` (the reference
image installs 25.7.4.11, Dockerfile:102-104), the Steinarsson LTTB algorithm:
keep both endpoints, split the interior into ``n - 2`` buckets, and from each
bucket keep the point forming the largest triangle with the previously kept
point and the NEXT bucket's average point.  Selection is inherently
sequential per series (each pick depends on the previous one), so the Spark
shape is one ``applyInPandas`` kernel per series key: a single shuffle on the
series key, series-count parallelism, and the per-series state never leaves
its task — the standard 100 TB layout for per-entity sequential passes
(asof/funnel use the same shape).

Determinism contract (what makes the result oracle-checkable): the kernel
scores candidates with EXACT integer arithmetic — x must be an integer
column (epoch micros), y must be pre-quantized to an integer column (e.g.
``floor(value * 1e6 + 0.5)``), bucket assignment is integer division
``((i - 1) * (n - 2)) // (N - 2)``, and the triangle area is compared in the
cnt-scaled integer form ``|(ax·cnt − Σx)(by − ay) − (ax − bx)(Σy − cnt·ay)|``
(Python ints, no overflow).  A SQL replay computes the identical products in
HUGEINT/DECIMAL(38,0), so the selected point SET hash-matches — unlike the
canonical float implementation, where near-tie argmax flips on summation
order.  Deviation from upstream: the anchor for the LAST interior bucket is
the final point itself (the canonical code averages a next "bucket" that may
already include it); documented, and immaterial to the downsampling contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lttb(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_out: int,
    by: list[str],
    keep: list[str] | None = None,
) -> DataFrame:
    """Downsample each ``by``-group of ``df`` to ``n_out`` points.

    ``x_col`` must be integer-typed (epoch micros / any monotone int);
    ``y_col`` must be integer-typed (pre-quantized).  Rows are ordered by
    ``(x_col, *keep)`` inside each group, so pass a unique id in ``keep``
    when x can tie.  Returns ``by + [sel_seq] + [x_col, y_col] + keep``.
    """
    if n_out < 3:
        raise ValueError("lttb needs n_out >= 3 (both endpoints + 1 bucket)")
    keep = list(keep or [])
    cols = list(by) + [x_col, y_col] + keep
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.select(*cols).schema.fields
        if f.name in by
    )
    data_fields = [
        f for f in df.select(*cols).schema.fields if f.name not in by
    ]
    out_schema += ", sel_seq int, " + ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in data_fields
    )
    m = n_out - 2
    data_cols = [x_col, y_col] + keep

    def kernel(pdf):
        import pandas as pd

        pdf = pdf.sort_values([x_col] + keep, kind="mergesort").reset_index(
            drop=True
        )
        N = len(pdf)
        if N <= n_out:
            sel = list(range(N))
        else:
            xs = [int(v) for v in pdf[x_col]]
            ys = [int(v) for v in pdf[y_col]]
            # interior bucket of row i (1..N-2): ((i-1)*m) // (N-2)
            buckets: list[list[int]] = [[] for _ in range(m)]
            for i in range(1, N - 1):
                buckets[((i - 1) * m) // (N - 2)].append(i)
            sel = [0]
            for k in range(m):
                if k < m - 1 and buckets[k + 1]:
                    nxt = buckets[k + 1]
                    cnt = len(nxt)
                    sx = sum(xs[j] for j in nxt)
                    sy = sum(ys[j] for j in nxt)
                else:
                    cnt, sx, sy = 1, xs[N - 1], ys[N - 1]
                a = sel[-1]
                best, best_score = None, -1
                for j in buckets[k]:
                    score = abs(
                        (xs[a] * cnt - sx) * (ys[j] - ys[a])
                        - (xs[a] - xs[j]) * (sy - cnt * ys[a])
                    )
                    if score > best_score:
                        best, best_score = j, score
                if best is not None:
                    sel.append(best)
            sel.append(N - 1)
        out = pdf.iloc[sel][list(by) + data_cols].copy()
        out.insert(len(by), "sel_seq", pd.array(range(len(sel)), dtype="int32"))
        return out

    return df.select(*cols).groupBy(*by).applyInPandas(kernel, out_schema)
