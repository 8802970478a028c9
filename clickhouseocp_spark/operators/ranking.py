"""BM25 full-text ranking (the retrieval-tier companion to tf-idf /
embedding ANN; ClickHouse 25.x ships experimental full-text indexes whose
query side is exactly this scoring — SURVEY §2.8 text-search family).

Okapi BM25:  score(q, d) = Σ_{t ∈ q}  idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

Everything is exact counting (tf, df, dl, N) plus per-row float math, so the
repo's determinism discipline applies directly: per-term score contributions
are rounded to 8 decimals and summed through DECIMAL (order-independent),
final scores rounded to 6 and used as the ranking key (ties on doc id).

Scale shape: the inverted-index build is one explode + two hash aggs (all
map-side combinable); query terms are a broadcast; the score join touches
only postings of query terms (at 100 TB: partition the postings table by
term and the join becomes partition pruning — the inverted-index layout).
No window over raw rows: top-k runs per query over scored docs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: whitespace/punctuation tokenizer shared with the oracle side
_TOKEN_SPLIT = "[^a-z0-9]+"


def tokenize_terms(df: DataFrame, text_col: str, out: str = "term") -> DataFrame:
    """Lowercase split on non-alphanumerics; one row per token occurrence."""
    return df.select(
        "*",
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT),
                lambda t: t != "",
            )
        ).alias(out),
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    doc_id: str = "doc_id",
    text_col: str = "text",
    query_id: str = "query_id",
    query_text: str = "query_text",
) -> DataFrame:
    """Top-``k`` documents per query under Okapi BM25.

    Returns (query_id, doc_id, score, rank).  ``queries`` is the small side
    by contract (broadcast); matching is bag-of-words (a repeated query term
    scores once per distinct term, the standard BM25 query model)."""
    toks = tokenize_terms(
        docs.select(F.col(doc_id).alias("doc_id"), F.col(text_col).alias("__t")),
        "__t",
    )
    doc_terms = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    doc_len = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = doc_len.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.col("dl").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    df_t = doc_terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    q_terms = (
        tokenize_terms(
            queries.select(
                F.col(query_id).alias("query_id"),
                F.col(query_text).alias("__q"),
            ),
            "__q",
        )
        .select("query_id", "term")
        .distinct()
    )

    postings = (
        doc_terms.join(F.broadcast(q_terms), "term")
        .join(F.broadcast(df_t), "term")
        .join(doc_len, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf = F.col("tf").cast("double")
    denom = tf + F.lit(k1) * (
        1.0 - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * tf * F.lit(k1 + 1.0) / denom
    scored = postings.groupBy("query_id", "doc_id").agg(
        F.sum(F.round(contrib, 8).cast("decimal(38,10)"))
        .cast("double")
        .alias("__s")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("__s"), 6).desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "doc_id", F.round("__s", 6).alias("score"), "rank"
        )
    )
