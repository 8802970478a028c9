"""Similarity search over embedding columns (driver north star; the analog of
ClickHouse 25.x's experimental vector-similarity index, SURVEY.md §4 — we
implement brute-force exact as the baseline, LSH/IVF/PQ bucketed variants as
scale paths, and :func:`nsw_topk` as the graph-index (usearch/HNSW) analog:
shard-local navigable-small-world graphs merged with an exact top-k window).

- :func:`cosine_topk` — exact brute force: broadcast the (small) query set
  against the corpus, score JVM-side, per-query top-k via window.  At 100 TB
  the corpus side streams through executors once; cost is O(|Q| * |corpus|)
  multiply-adds, embarrassingly parallel, zero shuffle on the corpus.
- :func:`cosine_topk_pandas` — same plan shape but the scoring crosses into
  an Arrow-batched pandas UDF doing one numpy matmul per batch (~SIMD speed);
  used when |Q| is large enough that HOF-per-pair folding dominates.
- :func:`srp_lsh_topk` — signed-random-projection LSH: deterministic
  pseudo-random hyperplanes (seeded from xxhash64, no RNG state), bucket by
  sign bits, search only colliding buckets across ``num_tables`` tables.
  Approximate: recall < 1, cost ~ |Q| * bucket_size * tables.
- :func:`ivf_topk` — IVF coarse quantizer: nearest-centroid cells, probe the
  query's n_probe cells only.  The partition-by-cell layout is the one that
  scales to 100 TB (probe join = partition pruning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from clickhouseocp_spark.functions.vector import cosine_similarity


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (brute force baseline).
    Returns (query_id, neighbor_id, score, rank)."""
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 6).alias("score"),
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_pandas(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Numpy fast path: queries are collected into a broadcast matrix (bounded
    — the query set is the small side by contract), the corpus streams through
    mapInPandas, each Arrow batch scored with one matmul, per-batch top-k kept,
    global top-k finished with a window.  Scale: corpus never collects; driver
    holds only |Q| x dim floats."""
    import numpy as np
    import pandas as pd

    qrows = queries.select(query_id, query_vec).collect()
    qids = np.array([r[0] for r in qrows])
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    sc = corpus.sparkSession
    bq = sc.sparkContext.broadcast((qids, qnorm))

    c = corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("v"))

    def score(batches):
        ids, qn = bq.value
        for pdf in batches:
            cmat = np.array(pdf["v"].tolist(), dtype=np.float64)
            cn = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
            sims = qn @ cn.T  # |Q| x batch
            n_keep = min(k + 1, sims.shape[1])
            for qi in range(sims.shape[0]):
                idx = np.argpartition(-sims[qi], n_keep - 1)[:n_keep]
                yield pd.DataFrame(
                    {
                        "query_id": ids[qi],
                        "neighbor_id": pdf["neighbor_id"].values[idx],
                        "score": np.round(sims[qi][idx], 6),
                    }
                )

    scored = c.mapInPandas(
        score, schema="query_id long, neighbor_id long, score double"
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _srp_bits(vec: Column, dim: int, n_bits: int, table: int) -> Column:
    """Sign bits of projections onto deterministic pseudo-random hyperplanes.
    Plane component (t, b, j) = xxhash64(t, b, j) scaled to [-1, 1] — no RNG
    state, identical on every executor."""
    def component(b: Column, j: Column) -> Column:
        h = F.xxhash64(F.lit(table), b, j)
        return (h.cast("double") / F.lit(float(2**63))).cast("double")

    bits = F.transform(
        F.sequence(F.lit(0), F.lit(n_bits - 1)),
        lambda b: F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda x, j: x.cast("double") * component(b, j),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    # pack bits → small int bucket id (n_bits <= 16 keeps this in int range)
    return F.aggregate(bits, F.lit(0), lambda acc, b: acc * 2 + b)


def srp_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    n_bits: int = 8,
    num_tables: int = 4,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k via signed-random-projection LSH: candidates =
    corpus vectors sharing a bucket with the query in any of ``num_tables``
    hash tables; exact cosine re-rank on candidates only."""
    def bucketed(df: DataFrame, idc: str, vecc: str, out_id: str, out_vec: str) -> DataFrame:
        tables = F.array(
            *[_srp_bits(F.col(vecc), dim, n_bits, t) for t in range(num_tables)]
        )
        return df.select(
            F.col(idc).alias(out_id), F.col(vecc).alias(out_vec), tables.alias("__bk")
        ).select(
            out_id, out_vec, F.posexplode("__bk").alias("__t", "__b")
        )

    qb = bucketed(queries, query_id, query_vec, "query_id", "__qv")
    cb = bucketed(corpus, corpus_id, corpus_vec, "neighbor_id", "__cv")
    cand = (
        cb.join(F.broadcast(qb), ["__t", "__b"])
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    exclude_self: bool = True,
    refine_iters: int = 1,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer: assign
    every corpus vector to its nearest centroid cell, probe only the query's
    ``n_probe`` closest cells, exact cosine re-rank inside them.

    Centroids start as a deterministic hash-sample of the corpus (smallest
    xxhash64(id) rows — no RNG state, stable across runs/executors) and are
    refined with ``refine_iters`` Lloyd/KMeans rounds: assign cells, recompute
    each cell's mean (decimal-routed per-dimension avg → order-independent,
    so centroids are bitwise-reproducible), renormalize.  Each round is one
    corpus pass + a (cell, dim)-keyed agg that map-side-combines down to
    n_centroids x dim rows.  Scale shape: one streaming numpy pass assigns
    cells (no shuffle of the corpus), the probe list is broadcast, and the
    cell equi-join prunes the candidate set to ~n_probe/n_centroids of the
    corpus.  At 100 TB, write the corpus partitioned by ``cell`` once and the
    probe join becomes partition pruning.  Returns (query_id, neighbor_id,
    score, rank).
    """
    import numpy as np
    import pandas as pd

    assigned, cmat = kmeans_cells(
        corpus,
        n_centroids=n_centroids,
        refine_iters=refine_iters,
        id_col=corpus_id,
        vec_col=corpus_vec,
        id_alias="neighbor_id",
        vec_alias="__cv",
    )
    vec_t = corpus.schema[corpus_vec].dataType.simpleString()

    qrows = queries.select(F.col(query_id).alias("id"), F.col(query_vec).alias("v")).collect()
    qmat = np.array([r.v for r in qrows], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    probe_order = np.argsort(-(qmat @ cmat.T), axis=1)[:, :n_probe]
    probes = pd.DataFrame(
        {
            "query_id": [r.id for r in qrows for _ in range(n_probe)],
            "__qv": [list(r.v) for r in qrows for _ in range(n_probe)],
            "__cell": probe_order.astype("int32").ravel(),
        }
    )
    qdf = queries.sparkSession.createDataFrame(
        probes, schema=f"query_id long, __qv {vec_t}, __cell int"
    )

    cand = assigned.join(F.broadcast(qdf), "__cell")
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    df: DataFrame,
    block_cols: tuple[str, ...] = (),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    allow_all_pairs: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocking keys (exact
    within blocks).

    ``block_cols`` is mandatory unless ``allow_all_pairs=True``: an unblocked
    self-join is all-pairs — quadratic in the corpus — and silently picking it
    by default is the scale-breaking path.  For unbounded corpora use
    :func:`embedding_near_dup_lsh`, which blocks by SRP-LSH bucket instead of
    a data column."""
    if not block_cols and not allow_all_pairs:
        raise ValueError(
            "embedding_near_dup_pairs requires blocking columns; an unblocked "
            "self-join is O(n^2). Use embedding_near_dup_lsh for unbounded "
            "corpora, or pass allow_all_pairs=True for bounded inputs."
        )
    cols = [F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"), *block_cols]
    prepped = df.select(*cols)
    a, b = prepped.alias("a"), prepped.alias("b")
    cond = F.col("a.__id") < F.col("b.__id")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.round(
                cosine_similarity(F.col("a.__v"), F.col("b.__v")), 6
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def embedding_near_dup_lsh(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_bits: int = 8,
    num_tables: int = 4,
) -> DataFrame:
    """Embedding near-dup pairs for UNBOUNDED corpora: block by SRP-LSH bucket
    (``_srp_bits``) instead of a data column, so candidate generation is an
    equi-self-join on (table, bucket) — never an all-pairs cross.

    Plan shape at 100 TB: one narrow pass computes ``num_tables`` bucket ids
    per vector, ``posexplode`` multiplies rows by num_tables (ids + vec only),
    the self-join shuffles on (table, bucket) — expected bucket occupancy is
    n / 2^n_bits per table, tunable — and the exact cosine verify runs only on
    colliding pairs.  ``dropDuplicates`` folds pairs found in several tables.
    Approximate by construction: recall < 1 for pairs whose vectors never share
    a bucket; raise num_tables (union of tables) to raise recall."""
    tables = F.array(*[_srp_bits(F.col(vec_col), dim, n_bits, t) for t in range(num_tables)])
    bucketed = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"), tables.alias("__bk")
    ).select("__id", "__v", F.posexplode("__bk").alias("__t", "__b"))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__t") == F.col("b.__t"))
            & (F.col("a.__b") == F.col("b.__b"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__v").alias("__va"),
            F.col("b.__v").alias("__vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a",
        "id_b",
        F.round(cosine_similarity(F.col("__va"), F.col("__vb")), 6).alias("score"),
    ).filter(F.col("score") >= threshold)


def kmeans_cells(
    corpus: DataFrame,
    n_centroids: int = 16,
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    id_alias: str = "neighbor_id",
    vec_alias: str = "__cv",
):
    """Deterministic KMeans coarse quantizer shared by :func:`ivf_topk` and
    :func:`semantic_dedup`: centroids seed from a hash-sample of the corpus
    (smallest xxhash64(id) rows — no RNG state, stable across runs and
    executors) and refine with Lloyd rounds whose per-dimension means route
    through DECIMAL (order-independent → bitwise-reproducible centroids).

    Returns ``(assigned, cmat)``: the corpus with an ``__cell`` int column
    (one streaming numpy pass, no shuffle of the corpus) and the final
    L2-normalized centroid matrix.  Each refinement round costs one corpus
    pass plus a (cell, dim)-keyed agg that map-side-combines down to
    n_centroids × dim rows.  At 100 TB, persist the corpus partitioned by
    ``__cell`` once and every downstream cell-local operation becomes
    partition pruning."""
    import numpy as np

    cent_rows = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("id")), F.col("id"))
        .limit(n_centroids)
        .collect()
    )
    cmat = np.array([r.v for r in cent_rows], dtype=np.float64)
    cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
    sc = corpus.sparkSession

    c = corpus.select(F.col(id_col).alias(id_alias), F.col(vec_col).alias(vec_alias))
    vec_t = corpus.schema[vec_col].dataType.simpleString()
    schema = f"{id_alias} long, {vec_alias} {vec_t}, __cell int"

    def make_assign(bc_local):
        def assign(batches):
            cm = bc_local.value
            for pdf in batches:
                vm = np.array(pdf[vec_alias].tolist(), dtype=np.float64)
                vn = vm / np.linalg.norm(vm, axis=1, keepdims=True)
                yield pdf.assign(__cell=np.argmax(vn @ cm.T, axis=1).astype("int32"))

        return assign

    bc = sc.sparkContext.broadcast(cmat)
    for _ in range(refine_iters):
        assigned_i = c.mapInPandas(make_assign(bc), schema=schema)
        means = (
            assigned_i.select("__cell", F.posexplode(vec_alias).alias("__pos", "__val"))
            .groupBy("__cell", "__pos")
            .agg(
                F.avg(F.col("__val").cast("decimal(38,12)")).cast("double").alias("m")
            )
            .collect()  # bounded: n_centroids x dim rows
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["__cell"], {})[r["__pos"]] = r["m"]
        new = cmat.copy()
        for cell, d in by_cell.items():  # empty cells keep their seed centroid
            vec = np.array([d[p] for p in sorted(d)], dtype=np.float64)
            n = np.linalg.norm(vec)
            if n > 0:
                new[cell] = vec / n
        cmat = new
        bc = sc.sparkContext.broadcast(cmat)

    assigned = c.mapInPandas(make_assign(bc), schema=schema)
    return assigned, cmat


def _approx_row_count(df: DataFrame) -> int:
    """Corpus-size estimate WITHOUT an extra Spark action where possible.

    If the plan reads parquet files of ONE table (``df.inputFiles()``
    non-empty, all under a single directory) and applies NO row filter, sum
    the footer ``num_rows`` — a bounded driver-side metadata read per file,
    no job.  A filtered plan falls back to ``count()``: footer totals ignore
    selectivity, so a 1% slice of a large table would inflate the cluster
    count by 100× — orders of magnitude more centroids than
    rows/target_cell_size, not a rounding error.  Multi-table plans (joins /
    unions over different tables) also fall back: summing EVERY scanned
    table's footers could inflate the estimate by the size of an unrelated
    join side.  "One table" == a single file, or one directory of
    Spark-written part files.  Non-file plans (in-memory fixtures,
    post-shuffle inputs) also fall back."""
    import os as _os

    try:
        files = [f for f in df.inputFiles() if f.endswith(".parquet")]
    except Exception:  # noqa: BLE001 — e.g. streaming or local-relation plans
        files = []
    if files:
        try:
            # Filter nodes survive into the optimized logical plan even when
            # the predicate is also pushed to the scan — one string render,
            # no job.
            optimized = df._jdf.queryExecution().optimizedPlan().toString()
            if "Filter " in optimized:
                files = []
        except Exception:  # noqa: BLE001 — can't inspect → be conservative
            files = []
    if len(files) > 1 and not (
        len({_os.path.dirname(f) for f in files}) == 1
        and all(_os.path.basename(f).startswith("part-") for f in files)
    ):
        files = []
    if files:
        try:
            import pyarrow.parquet as pq

            total = 0
            for f in files:
                path = f[7:] if f.startswith("file://") else f
                total += pq.ParquetFile(path).metadata.num_rows
            if total > 0:
                return total
        except Exception:  # noqa: BLE001 — unreadable footer → count() instead
            pass
    return df.count()


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_clusters: int | None = None,
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cell_size: int = 64,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic deduplication
    by embedding — KMeans-cluster the corpus, compare pairs only WITHIN each
    cluster, and drop every item that has a lower-id neighbor with cosine ≥
    ``threshold`` (one survivor per epsilon-ball, lowest id wins, matching
    the paper's keep-one policy with a deterministic representative).

    Returns the corpus with ``__cell`` and a boolean ``kept`` column.

    Scale shape: the cluster assignment is a streaming numpy pass (no corpus
    shuffle); the within-cluster comparison is ONE shuffle on ``__cell``
    followed by a vectorized per-cell numpy kernel (sim = M·Mᵀ on the cell's
    member matrix — the paper's own within-cluster step), so the quadratic
    term is bounded per cluster AND runs at BLAS speed instead of a per-pair
    expression join.  The paper's scaling rule (n_clusters ∝ corpus size,
    constant cluster population) is the DEFAULT here: when ``n_clusters`` is
    None it is derived as n / ``target_cell_size`` (floor 16), so per-cell
    work stays ~target_cell_size²·dim regardless of corpus size; a fixed
    small n_clusters over a growing corpus would re-grow the quadratic.  No
    all-pairs path exists in the plan."""
    import numpy as np

    if n_clusters is None:
        # sizing heuristic, not correctness: prefer parquet-footer row counts
        # (driver-side metadata reads, same trick as system_parts) over a
        # full count() action that would add a job to the dedup graph
        n_clusters = max(16, _approx_row_count(corpus) // target_cell_size)
    assigned, _ = kmeans_cells(
        corpus,
        n_centroids=n_clusters,
        refine_iters=refine_iters,
        id_col=id_col,
        vec_col=vec_col,
        id_alias="__id",
        vec_alias="__v",
    )
    # the per-cell kernel already holds every column of the row group, so it
    # emits the kept flag IN PLACE — the old two-branch shape (persist the
    # assignment, emit dominated ids, left-join them back) paid an extra
    # Python pass over the persisted assignment plus a reattach join for
    # data the kernel had in hand (guide §8: audit how decisions get
    # re-attached to the payload)
    vec_t = corpus.schema[vec_col].dataType.simpleString()

    def mark_cell(pdf):
        ids = pdf["__id"].to_numpy()
        order = np.argsort(ids)  # lowest id = survivor; partition order varies
        m = np.array(pdf["__v"].iloc[order].tolist(), dtype=np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sim = m @ m.T
        # dominated = any STRICTLY EARLIER (lower-id) member with sim >= t
        dom = (np.tril(sim >= threshold, -1)).any(axis=1)
        out = pdf.iloc[order]
        return out.assign(kept=~dom)

    return assigned.groupBy("__cell").applyInPandas(
        mark_cell, schema=f"__id long, __v {vec_t}, __cell int, kept boolean"
    ).select(
        F.col("__id").alias(id_col),
        F.col("__v").alias(vec_col),
        "__cell",
        "kept",
    )


def _train_pq_codebooks(
    corpus: DataFrame,
    corpus_id: str,
    corpus_vec: str,
    m_subspaces: int,
    n_codes: int,
    train_sample: int,
    lloyd_iters: int,
):
    """Train per-subspace PQ codebooks on a deterministic hash-sample of the
    corpus (driver-side numpy on <= train_sample vectors — the standard
    bounded-sample PQ training; no RNG state anywhere).  Returns
    (codebooks[m, K, d_sub], d_sub)."""
    import numpy as np

    rows = (
        corpus.select(F.col(corpus_id).alias("id"), F.col(corpus_vec).alias("v"))
        .orderBy(F.xxhash64(F.col("id")), F.col("id"))
        .limit(train_sample)
        .collect()
    )
    X = np.array([r.v for r in rows], dtype=np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    dim = X.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    d_sub = dim // m_subspaces
    codebooks = np.zeros((m_subspaces, n_codes, d_sub))
    for mi in range(m_subspaces):
        sub = X[:, mi * d_sub : (mi + 1) * d_sub]
        cb = sub[: n_codes].copy()  # hash-ordered sample = deterministic init
        for _ in range(lloyd_iters):
            d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for j in range(n_codes):
                pts = sub[assign == j]
                if len(pts):
                    cb[j] = pts.mean(0)
        codebooks[mi] = cb
    return codebooks, d_sub


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    m_subspaces: int = 4,
    n_codes: int = 16,
    train_sample: int = 256,
    lloyd_iters: int = 5,
    rerank_factor: int = 4,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k via product quantization (Jegou/Douze/Schmid 2011,
    the ADC variant; the memory-bound half of FAISS' IVF-PQ and the analog of
    ClickHouse 25.x's vector-index quantization).  The vector dimension is
    split into ``m_subspaces`` blocks, each block k-means-quantized to
    ``n_codes`` codewords, so a D-dim float vector compresses to m bytes
    (m=4, K=16 → 97% smaller than 32 x f32) and approximate scoring is m
    table lookups instead of D multiply-adds.

    Determinism discipline matches :func:`ivf_topk`: codebooks train
    driver-side on a bounded hash-sample (smallest xxhash64(id) rows, no RNG
    state), encoding is one streaming ``mapInPandas`` pass (no shuffle), the
    per-query lookup tables are broadcast, and each Arrow batch emits only
    its per-query top ``k * rerank_factor`` candidates — the shuffle carries
    candidates, never the corpus.  Exact cosine re-rank on the surviving
    candidates restores full precision at the top.  At 100 TB the encoded
    corpus (m bytes/vector) is what sits in cache; raw vectors are read only
    for the rerank join.  Returns (query_id, neighbor_id, score, rank)."""
    import numpy as np
    import pandas as pd

    codebooks, d_sub = _train_pq_codebooks(
        corpus, corpus_id, corpus_vec, m_subspaces, n_codes, train_sample, lloyd_iters
    )

    sc = queries.sparkSession
    bc_cb = sc.sparkContext.broadcast(codebooks)

    qrows = queries.select(
        F.col(query_id).alias("id"), F.col(query_vec).alias("v")
    ).collect()  # bounded: the query set is small by contract (same as ivf_topk)
    qmat = np.array([r.v for r in qrows], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    # ADC lookup tables: luts[q, mi, j] = <q_sub_mi, codebook[mi][j]>
    luts = np.einsum(
        "qmd,mjd->qmj", qmat.reshape(len(qrows), m_subspaces, d_sub), codebooks
    )
    qids = np.array([r.id for r in qrows], dtype=np.int64)
    bc_q = sc.sparkContext.broadcast((qids, luts))

    c = corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cv"))
    vec_t = corpus.schema[corpus_vec].dataType.simpleString()
    keep = k * rerank_factor

    def score(batches):
        cb = bc_cb.value
        ids, lt = bc_q.value
        for pdf in batches:
            vm = np.array(pdf["__cv"].tolist(), dtype=np.float64)
            vm = vm / np.linalg.norm(vm, axis=1, keepdims=True)
            sub = vm.reshape(len(vm), m_subspaces, d_sub)
            # encode: nearest codeword per subspace (B, m)
            codes = np.stack(
                [
                    ((sub[:, mi, None, :] - cb[mi][None, :, :]) ** 2)
                    .sum(-1)
                    .argmin(1)
                    for mi in range(m_subspaces)
                ],
                axis=1,
            )
            # ADC: approx[q, b] = sum_mi lut[q, mi, codes[b, mi]]
            approx = np.stack(
                [lt[:, mi, codes[:, mi]] for mi in range(m_subspaces)]
            ).sum(0)
            out = []
            nb = pdf["neighbor_id"].to_numpy()
            for qi, qid in enumerate(ids):
                order = np.argsort(-approx[qi])[: keep]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": nb[order],
                            "__approx": approx[qi][order],
                            "__cv": pdf["__cv"].iloc[order].to_list(),
                        }
                    )
                )
            yield pd.concat(out) if out else pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "__approx": [], "__cv": []}
            )

    cand = c.mapInPandas(
        score,
        schema=f"query_id long, neighbor_id long, __approx double, __cv {vec_t}",
    )
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    w_a = Window.partitionBy("query_id").orderBy(
        F.col("__approx").desc(), F.col("neighbor_id").asc()
    )
    survivors = (
        cand.withColumn("__ar", F.row_number().over(w_a))
        .filter(F.col("__ar") <= keep)
    )
    qdf = sc.createDataFrame(
        pd.DataFrame({"query_id": qids, "__qv": [list(r.v) for r in qrows]}),
        schema=f"query_id long, __qv {vec_t}",
    )
    scored = survivors.join(F.broadcast(qdf), "query_id").select(
        "query_id",
        "neighbor_id",
        F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
    m_subspaces: int = 8,
    n_codes: int = 16,
    train_sample: int = 256,
    lloyd_iters: int = 5,
    rerank_factor: int = 8,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF-PQ: the full FAISS-style composition — an IVF coarse quantizer
    prunes the corpus to the query's ``n_probe`` cells, a PQ/ADC scan ranks
    the probed candidates with m table lookups per vector, and an exact
    cosine rerank of the top ``k * rerank_factor`` survivors restores full
    precision (Jegou et al. 2011 §IV; deviation: codes are built on the
    normalized vectors, not residuals — documented, inner-product regime).

    Scale shape: cell pruning = partition pruning when the corpus is laid
    out by ``__cell``; the candidate join broadcasts only (query, cell,
    LUT-id) probes; the ADC kernel touches m bytes per candidate; the only
    full-dim dot products are the k * rerank_factor rerank rows per query.
    Returns (query_id, neighbor_id, score, rank)."""
    import numpy as np
    import pandas as pd

    assigned, cmat = kmeans_cells(
        corpus,
        n_centroids=n_centroids,
        refine_iters=1,
        id_col=corpus_id,
        vec_col=corpus_vec,
        id_alias="neighbor_id",
        vec_alias="__cv",
    )
    codebooks, d_sub = _train_pq_codebooks(
        corpus, corpus_id, corpus_vec, m_subspaces, n_codes, train_sample, lloyd_iters
    )
    sc = queries.sparkSession
    bc_cb = sc.sparkContext.broadcast(codebooks)

    qrows = queries.select(
        F.col(query_id).alias("id"), F.col(query_vec).alias("v")
    ).collect()  # bounded by contract (same as ivf_topk / pq_topk)
    qmat = np.array([r.v for r in qrows], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    luts = np.einsum(
        "qmd,mjd->qmj", qmat.reshape(len(qrows), m_subspaces, d_sub), codebooks
    )
    bc_lut = sc.sparkContext.broadcast(luts)
    probe_order = np.argsort(-(qmat @ cmat.T), axis=1)[:, :n_probe]
    vec_t = corpus.schema[corpus_vec].dataType.simpleString()
    probes = pd.DataFrame(
        {
            "query_id": [r.id for r in qrows for _ in range(n_probe)],
            "__qi": [qi for qi in range(len(qrows)) for _ in range(n_probe)],
            "__qv": [list(r.v) for r in qrows for _ in range(n_probe)],
            "__cell": probe_order.astype("int32").ravel(),
        }
    )
    qdf = sc.createDataFrame(
        probes, schema=f"query_id long, __qi int, __qv {vec_t}, __cell int"
    )
    cand = assigned.join(F.broadcast(qdf), "__cell")
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))

    keep = k * rerank_factor
    out_schema = (
        f"query_id long, neighbor_id long, __approx double, __qv {vec_t}, __cv {vec_t}"
    )

    def adc(batches):
        cb = bc_cb.value
        lt = bc_lut.value
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.array(pdf["__cv"].tolist(), dtype=np.float64)
            vm = vm / np.linalg.norm(vm, axis=1, keepdims=True)
            sub = vm.reshape(len(vm), m_subspaces, d_sub)
            codes = np.stack(
                [
                    ((sub[:, mi, None, :] - cb[mi][None, :, :]) ** 2)
                    .sum(-1)
                    .argmin(1)
                    for mi in range(m_subspaces)
                ],
                axis=1,
            )
            qi = pdf["__qi"].to_numpy()
            approx = np.zeros(len(pdf))
            for mi in range(m_subspaces):
                approx += lt[qi, mi, codes[:, mi]]
            pdf = pdf.assign(__approx=approx)
            # per-batch per-query pre-cut bounds what the window shuffle sees
            pdf = (
                pdf.sort_values(["query_id", "__approx"], ascending=[True, False])
                .groupby("query_id", sort=False)
                .head(keep)
            )
            yield pdf[["query_id", "neighbor_id", "__approx", "__qv", "__cv"]]

    scored_cand = cand.mapInPandas(adc, schema=out_schema)
    w_a = Window.partitionBy("query_id").orderBy(
        F.col("__approx").desc(), F.col("neighbor_id").asc()
    )
    survivors = scored_cand.withColumn("__ar", F.row_number().over(w_a)).filter(
        F.col("__ar") <= keep
    )
    scored = survivors.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# NSW graph ANN — the vector-similarity-index (usearch/HNSW, CH 25.x) analog
# ---------------------------------------------------------------------------


def _nsw_search(mat, adj, q, ef):
    """Greedy best-first beam search over an NSW adjacency list: expand the
    closest unexpanded candidate, keep the best ``ef`` results; stop when the
    top candidate can no longer improve the result set.  Deterministic: ties
    break on node index via the heap tuples."""
    import heapq

    start = 0
    s0 = float(mat[start] @ q)
    visited = {start}
    cand = [(-s0, start)]  # max-heap on similarity
    best = [(s0, start)]  # min-heap keeps the ef best
    while cand:
        csim, c = heapq.heappop(cand)
        if -csim < best[0][0] and len(best) >= ef:
            break
        for nb in adj[c]:
            if nb in visited:
                continue
            visited.add(nb)
            s = float(mat[nb] @ q)
            if len(best) < ef or s > best[0][0]:
                heapq.heappush(cand, (-s, nb))
                heapq.heappush(best, (s, nb))
                if len(best) > ef:
                    heapq.heappop(best)
    return sorted(best, key=lambda t: (-t[0], t[1]))


def _nsw_build(mat, m_links: int, ef_construction: int):
    """Deterministic flat-NSW construction: insert nodes in row order, link
    each to its beam-search top-``m_links`` among already-inserted nodes
    (bidirectional).  Returns the adjacency list."""
    n = mat.shape[0]
    adj: list[list[int]] = [[] for _ in range(n)]
    for i in range(1, n):
        found = _nsw_search(mat, adj, mat[i], ef_construction)
        for _, j in found[:m_links]:
            adj[i].append(j)
            adj[j].append(i)
    return adj


def _nsw_query_kernel(ids, mat, adj, bq, k, ef_search):
    """Run every broadcast query through one shard's graph; returns the
    per-shard candidate columns (query_id, neighbor_id, score)."""
    q_ids, q_mat = bq.value
    out_q, out_n, out_s = [], [], []
    keep = min(k + 1, mat.shape[0])
    for qi in range(q_mat.shape[0]):
        res = _nsw_search(mat, adj, q_mat[qi], max(ef_search, keep))
        for s, j in res[:keep]:
            out_q.append(q_ids[qi])
            out_n.append(ids[j])
            out_s.append(round(s, 6))
    return out_q, out_n, out_s


def _broadcast_queries(queries: DataFrame, query_id: str, query_vec: str):
    import numpy as np

    qrows = queries.select(query_id, query_vec).collect()
    qids = np.array([r[0] for r in qrows])
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qmat /= np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-30)
    return queries.sparkSession.sparkContext.broadcast((qids, qmat))


def _merge_topk(scored: DataFrame, k: int, exclude_self: bool) -> DataFrame:
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def nsw_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    m_links: int = 8,
    ef_search: int = 48,
    n_shards: int = 8,
    exclude_self: bool = True,
) -> DataFrame:
    """Graph-index ANN: the Spark-native analog of ClickHouse 25.x's
    experimental vector-similarity index (usearch HNSW) — the one 25.x
    feature previously documented as unreplicated (SURVEY §7.6).

    Architecture = the standard DISTRIBUTED deployment of a graph index
    (shard-local graphs + exact merge, as in Vespa/Milvus): the corpus is
    hash-sharded; each shard builds a navigable-small-world graph (flat NSW —
    Malkov et al. 2014, the single-layer core of HNSW) in ONE pandas kernel
    and answers every query with a greedy beam search; the per-shard
    candidate lists are then merged with an exact global top-k window.

    Determinism: insertion order is ascending id, links are the beam-search
    top-``m_links`` at insert time, no RNG anywhere — identical graphs and
    results on every run and executor.

    Scale shape: one shuffle on the shard key, graph build O(n·ef·deg) per
    shard with the shard in executor memory (bounded: n_shards scales with
    the corpus so shard size stays ~ partition size), queries broadcast, and
    the merge window sees only |Q|·k·n_shards candidate rows.  The graph
    never leaves the executor — only (query_id, neighbor_id, score) rows do."""
    import numpy as np
    import pandas as pd

    bq = _broadcast_queries(queries, query_id, query_vec)
    ef_c = max(ef_search, 2 * m_links)

    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("v"),
        F.pmod(F.xxhash64(F.col(corpus_id)), F.lit(n_shards)).alias("__shard"),
    )

    def shard_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["neighbor_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.array(pdf["v"].iloc[order].tolist(), dtype=np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        adj = _nsw_build(mat, m_links, ef_c)
        out_q, out_n, out_s = _nsw_query_kernel(ids, mat, adj, bq, k, ef_search)
        return pd.DataFrame(
            {"query_id": out_q, "neighbor_id": out_n, "score": out_s}
        )

    scored = c.groupBy("__shard").applyInPandas(
        shard_kernel, schema="query_id long, neighbor_id long, score double"
    )
    return _merge_topk(scored, k, exclude_self)


def build_nsw_index(
    corpus: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    m_links: int = 8,
    ef_construction: int = 48,
    n_shards: int = 8,
) -> DataFrame:
    """Materialize the shard-local NSW graphs as a TABLE — the analog of CH
    25.x persisting its usearch index next to the data part.  One row per
    node: (__shard, id, v, links) where ``links`` holds neighbor IDS (stable
    across re-reads, unlike positions).  Write it with
    ``df.write.partitionBy('__shard').parquet(path)`` and every later
    :func:`nsw_topk_from_index` run skips graph construction entirely —
    searching a 100 TB corpus becomes a scan of the index table with
    partition pruning on ``__shard``."""
    import numpy as np
    import pandas as pd

    vec_t = corpus.schema[corpus_vec].dataType.simpleString()
    ef_c = max(ef_construction, 2 * m_links)
    c = corpus.select(
        F.col(corpus_id).alias("id"),
        F.col(corpus_vec).alias("v"),
        F.pmod(F.xxhash64(F.col(corpus_id)), F.lit(n_shards)).alias("__shard"),
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        vecs = pdf["v"].iloc[order].tolist()
        mat = np.array(vecs, dtype=np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        adj = _nsw_build(mat, m_links, ef_c)
        return pd.DataFrame(
            {
                "__shard": pdf["__shard"].iloc[0],
                "id": ids,
                "v": vecs,
                "links": [[int(ids[j]) for j in nbrs] for nbrs in adj],
            }
        )

    return c.groupBy("__shard").applyInPandas(
        build, schema=f"__shard int, id long, v {vec_t}, links array<bigint>"
    )


def nsw_topk_from_index(
    queries: DataFrame,
    index: DataFrame,
    k: int,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    ef_search: int = 48,
    exclude_self: bool = True,
) -> DataFrame:
    """Search a persisted NSW index (:func:`build_nsw_index` output, read
    back from parquet) without rebuilding the graphs: per shard, the kernel
    rehydrates the adjacency from the stored neighbor ids and beam-searches
    the broadcast queries.  Same results as :func:`nsw_topk` with the same
    build parameters — pinned by pytest."""
    import numpy as np
    import pandas as pd

    bq = _broadcast_queries(queries, query_id, query_vec)

    def search(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.array(pdf["v"].iloc[order].tolist(), dtype=np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        pos = {int(v): i for i, v in enumerate(ids)}
        adj = [
            [pos[int(nb)] for nb in nbrs]
            for nbrs in pdf["links"].iloc[order].tolist()
        ]
        out_q, out_n, out_s = _nsw_query_kernel(ids, mat, adj, bq, k, ef_search)
        return pd.DataFrame(
            {"query_id": out_q, "neighbor_id": out_n, "score": out_s}
        )

    scored = index.groupBy("__shard").applyInPandas(
        search, schema="query_id long, neighbor_id long, score double"
    )
    return _merge_topk(scored, k, exclude_self)
