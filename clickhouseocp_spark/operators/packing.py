"""Training-batch assembly operators: sequence packing and corpus mixing.

The two operations every LLM-training data pipeline runs after curation
(beyond the reference's own surface — the reference image, /root/reference
Dockerfile, ships the query engine these pipelines are built on):

- **sequence packing** — documents are concatenated into fixed-token-budget
  training sequences; greedy *contiguous* packing per shard is the standard
  streaming formulation (deterministic, one pass, no global state).
- **corpus mixing** — per-source sampling weights (downsample w<1, integer +
  fractional upsampling w>1) decide how many copies of each document enter
  the training mix.

Scale shape (100 TB): packing folds are sequential *within a shard* only —
shards are hash buckets, so parallelism = shard count and each fold streams
one bounded pandas group (Arrow batches).  Mixing is a pure columnar
expression: no shuffle, no UDF, scan-speed; the explode fans out at most
``ceil(max weight)`` copies.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.types import IntegerType, StructField, StructType


def pack_sequences(
    df: DataFrame,
    weight_col: str,
    budget: int,
    shard_cols: Sequence[str],
    order_cols: Sequence[str],
    bin_col: str = "bin",
    pos_col: str = "pos",
) -> DataFrame:
    """Greedy contiguous packing: within each shard, walk rows in
    ``order_cols`` order accumulating ``weight_col``; when adding a row would
    exceed ``budget``, start a new bin.  A single row heavier than the budget
    gets a bin of its own.  Adds ``bin_col`` (0-based per shard) and
    ``pos_col`` (0-based within bin).

    Deterministic: (shard, order) must be a unique key.  The fold is
    inherently sequential per shard — that's the contract (contiguous
    packing), not an implementation shortcut; shard count bounds parallelism,
    so shard by a hash bucket, not a low-cardinality label.
    """
    import numpy as np
    import pandas as pd

    if not shard_cols:
        raise ValueError(
            "pack_sequences requires shard_cols: a shard is the sequential "
            "unit of packing and the unit of parallelism — pass a hash bucket "
            "(e.g. id % 1024) for unbounded corpora"
        )
    order = list(order_cols)
    schema = StructType(
        df.schema.fields
        + [StructField(bin_col, IntegerType()), StructField(pos_col, IntegerType())]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        w = pdf[weight_col].to_numpy()
        bins = np.zeros(len(w), dtype=np.int32)
        pos = np.zeros(len(w), dtype=np.int32)
        acc = b = p = 0
        for i, x in enumerate(w):
            if i > 0 and acc + x > budget:
                b += 1
                acc = 0
                p = 0
            acc += x
            bins[i] = b
            pos[i] = p
            p += 1
        pdf[bin_col] = bins
        pdf[pos_col] = pos
        return pdf

    return df.groupBy(*shard_cols).applyInPandas(fold, schema)


#: Knuth multiplicative hash constant (2^32 / golden ratio, public domain
#: construction) — the deterministic "uniform" both engines can reproduce
#: with plain integer arithmetic.
MIX_HASH_MULT = 2654435761


def mix_hash_uniform(id_col: Column | str) -> Column:
    """Deterministic pseudo-uniform in [0, 1) from an integer id:
    ``((id mod 2^31) * 2654435761 mod 2^32) / 2^32``.  The pre-mod keeps the
    product inside int64 for any id; identical expression evaluates
    identically in Spark and any SQL oracle (no engine RNG involved)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    prod = (c.cast("bigint") % F.lit(2**31)) * F.lit(MIX_HASH_MULT)
    return (prod % F.lit(2**32)).cast("double") / F.lit(float(2**32))


def mix_corpus(
    df: DataFrame,
    weights: Mapping[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 1.0,
    copy_col: str = "copy_n",
) -> DataFrame:
    """Weighted per-source mixing: a source with weight ``w`` contributes
    ``floor(w)`` copies of every document plus one more for a deterministic
    ``frac(w)``-fraction of documents (hash-selected on ``id_col``); ``w < 1``
    is therefore a plain downsample.  Output repeats rows with ``copy_col``
    = 1..n_copies so downstream shuffles spread copies like ordinary rows.

    Pure columnar plan: CASE over sources, integer hash, ``explode(sequence)``
    — no UDF, no shuffle; weight lookup is a literal expression (sources are
    metadata-scale, never a join).
    """
    w_expr: Column = F.lit(float(default_weight))
    for src, w in weights.items():
        w_expr = F.when(F.col(source_col) == src, F.lit(float(w))).otherwise(w_expr)
    base = F.floor(w_expr).cast("int")
    extra = (mix_hash_uniform(id_col) < (w_expr - F.floor(w_expr))).cast("int")
    copies = (base + extra).alias("__copies")
    return (
        df.withColumn("__copies", copies)
        .filter(F.col("__copies") >= 1)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(1), F.col("__copies"))))
        .drop("__copies")
    )


def budget_sample(
    df: DataFrame,
    budget_tokens: int,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budget sampling per group: keep a deterministic pseudo-random
    prefix of each group's documents until the group's token budget is
    reached (the pretraining-mix primitive "take N tokens of domain X").

    Priority = md5(id) — a portable hash both engines (and any re-run at any
    cluster size) order identically, so the selected set is reproducible
    without RNG state.  One window pass computes the running token total;
    a document is kept iff it STARTS within budget (so the budget overshoots
    by at most one document, the standard contract).  Scale: one shuffle on
    the group key; the window is a running sum, no buffering beyond the
    partition sort."""
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("bigint")
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .withColumn("n_tokens", toks)
        .withColumn("__cum", F.sum("n_tokens").over(w))
        .withColumn("kept", (F.col("__cum") - F.col("n_tokens")) < budget_tokens)
        .select(id_col, group_col, "n_tokens", "kept")
    )


def cluster_balanced_sample(
    df: DataFrame,
    cluster_col: str,
    id_col: str,
    total_budget: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-balanced sampling across clusters — the training-mix op
    that keeps head clusters from swamping the corpus: cluster ``c`` gets
    ``budget_c = min(n_c, max(1, floor(total_budget · n_c^α / Σ n^α)))``
    (α<1 flattens the distribution; α=0 is uniform-per-cluster, α=1
    proportional), and members are chosen as the ``budget_c``
    smallest-md5(id) rows — deterministic, reproducible, no RNG state.

    Scale shape: one count agg over clusters, the α-normalizer Σ n^α
    computed by a SORTED-array fold over the (tiny) per-cluster counts so
    the double sum has ONE canonical order (bitwise-reproducible across
    engines and runs), broadcast back as a 1-row aggregate; selection is a
    per-cluster row_number — one shuffle on the cluster key.  Output: the
    selected rows with ``n_c``/``budget_c``/``rk`` attached."""
    counts = df.groupBy(cluster_col).agg(F.count(F.lit(1)).alias("__n"))
    norm = counts.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col(cluster_col).alias("c"),
                                        F.col("__n").alias("n")))
            ),
            F.lit(0.0),
            lambda acc, e: acc + F.pow(e["n"].cast("double"), F.lit(alpha)),
        ).alias("__s")
    )
    budgets = counts.crossJoin(F.broadcast(norm)).select(
        cluster_col,
        "__n",
        F.least(
            F.col("__n"),
            F.greatest(
                F.lit(1).cast("bigint"),
                F.floor(
                    F.lit(float(total_budget))
                    * F.pow(F.col("__n").cast("double"), F.lit(alpha))
                    / F.col("__s")
                ).cast("bigint"),
            ),
        ).alias("__budget"),
    )
    w = Window.partitionBy(cluster_col).orderBy(F.md5(F.col(id_col).cast("string")))
    ranked = df.join(F.broadcast(budgets), cluster_col).withColumn(
        "rk", F.row_number().over(w)
    )
    return ranked.where(F.col("rk") <= F.col("__budget")).select(
        id_col,
        cluster_col,
        F.col("__n").alias("n_c"),
        F.col("__budget").alias("budget_c"),
        "rk",
    )
