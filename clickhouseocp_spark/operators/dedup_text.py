"""Deduplication operators for LLM training-data pipelines (driver north
star; complements ReplacingMergeTree-style keyed dedup in groupwise.py).

Four tiers, all shuffle-conscious for 100 TB:

- :func:`exact_dedup` — hash-groupBy on a normalized fingerprint.  One
  shuffle on the fingerprint; survivor = min id.
- :func:`minhash_signatures` + :func:`minhash_lsh_pairs` — MinHash over word
  shingles, banded LSH bucketing, candidate pairs verified with exact Jaccard.
  Candidate generation touches only same-bucket pairs (the whole point of LSH:
  no O(n^2) cross join at scale).
- :func:`simhash64` + :func:`simhash_near_pairs` — 64-bit SimHash with
  Hamming-ball candidate blocking on 16-bit chunks (a pair within distance d
  shares at least one of 4 chunks if d <= 3).
- :func:`ngram_jaccard_pairs` — exact Jaccard within explicit blocking keys
  (for modest blocks / validation of the approximate tiers).

Implementation note on the signature kernels: Spark higher-order-function
lambdas are interpreted per element (no whole-stage codegen), which makes
per-token×per-bit kernels cost milliseconds per document.  The signature
computation therefore runs in an Arrow-batched ``mapInPandas`` numpy kernel
(:func:`minhash_prep_pandas`, :func:`simhash_pandas`) — the sanctioned
vectorized-Python fast path — while ALL joins/bucketing/verification stay
JVM-side.  Pure-HOF reference implementations are kept for parity tests.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

import numpy as np

from pyspark.sql import Column, DataFrame, Window, functions as F

from clickhouseocp_spark.functions.text import (
    normalize_text,
    whitespace_tokens,
    word_shingles,
)

# deterministic universal-hash constants (identical on every executor/run)
_RNG = np.random.RandomState(42)
_PERM_A = (_RNG.randint(1, 2**62, size=64).astype(np.uint64) * 2 + 1)  # odd
_PERM_B = _RNG.randint(0, 2**62, size=64).astype(np.uint64)
_SHINGLE_MIX = (_RNG.randint(1, 2**62, size=8).astype(np.uint64) * 2 + 1)


def _hash64(token: str) -> int:
    """Deterministic 64-bit token hash (blake2b is C-speed in hashlib)."""
    return int.from_bytes(
        hashlib.blake2b(token.encode(), digest_size=8).digest(), "little"
    )


def _token_hashes(text: str) -> np.ndarray:
    toks = text.lower().split()
    return np.fromiter((_hash64(t) for t in toks), dtype=np.uint64, count=len(toks))


def _shingle_hashes(th: np.ndarray, n: int) -> np.ndarray:
    """Distinct uint64 hashes of word n-grams: mix of n consecutive token
    hashes (vectorized shifts+multiplies, no string building)."""
    if len(th) < n:
        return np.empty(0, dtype=np.uint64)
    acc = th[: len(th) - n + 1] * _SHINGLE_MIX[0]
    for j in range(1, n):
        acc = acc ^ (th[j : len(th) - n + 1 + j] * _SHINGLE_MIX[j])
    return np.unique(acc)


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row (min id) per distinct normalized text; adds ``dup_count``.

    Survivor election as a single hash aggregation (min_by over the packed
    row) — one shuffle on the fingerprint, partial-agg'd map-side, no sort
    (the window formulation costs a per-group sort for the same answer)."""
    fp = F.md5(normalize_text(F.col(text_col)))
    cols = df.columns
    agged = (
        df.withColumn("__fp", fp)
        .groupBy("__fp")
        .agg(
            F.min_by(F.struct(*cols), F.col(id_col)).alias("__row"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )
    return agged.select(*[F.col(f"__row.{c}").alias(c) for c in cols], "dup_count")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_len: int = 3,
) -> DataFrame:
    """MinHash signature per document.

    Cost model (the 100 TB concern): each shingle pays ONE string hash
    (xxhash64 of the shingle text → int64); the ``num_hashes`` permutations
    are cheap integer re-mixes of that base hash.  Adds ``__sh`` (distinct
    shingle-hash array, used for exact Jaccard verification) and ``__sig``.
    """
    # Each intermediate array is materialized as a real column: expressions
    # referenced from inside HOF lambdas are re-evaluated per element (no CSE
    # inside lambdas), which turns shingling quadratic if the token array
    # stays an unmaterialized expression.
    toks = whitespace_tokens(normalize_text(F.col(text_col)))
    staged = df.withColumn("__th", F.transform(toks, lambda t: F.xxhash64(t)))
    count = F.size(F.col("__th")) - shingle_len + 1
    # hash each token once; a shingle hash is one integer hash of its n
    # member token-hashes — no per-shingle string building / re-hashing
    shingle_hashes = F.array_distinct(
        F.when(
            count >= 1,
            F.transform(
                F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
                lambda i: F.xxhash64(
                    *[F.element_at(F.col("__th"), i + j) for j in range(shingle_len)]
                ),
            ),
        ).otherwise(F.expr("array()").cast("array<bigint>"))
    )
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    sig = F.transform(
        seeds,
        lambda i: F.array_min(
            F.transform(F.col("__sh"), lambda h: F.xxhash64(i, h))
        ),
    )
    return (
        staged.withColumn("__sh", shingle_hashes)
        .drop("__th")
        .filter(F.size("__sh") > 0)
        .withColumn("__sig", sig)
    )


def minhash_prep_pandas(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_len: int = 3,
) -> DataFrame:
    """Arrow-batched numpy MinHash kernel: (id, __sh, __sig) per document.

    One blake2b per token, vectorized shingle mixing, and the ``num_hashes``
    permutations as one (num_hashes x |shingles|) universal-hash matrix min —
    ~100x the throughput of the interpreted-HOF reference path.  Documents
    with no shingles (shorter than ``shingle_len`` tokens) are dropped, same
    as the reference implementation's size filter.
    """
    import pandas as pd

    if num_hashes > len(_PERM_A):
        raise ValueError(f"num_hashes must be <= {len(_PERM_A)}")
    a = _PERM_A[:num_hashes][:, None]
    b = _PERM_B[:num_hashes][:, None]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, shs, sigs = [], [], []
            for i, text in zip(pdf[id_col].values, pdf[text_col].values):
                sh = _shingle_hashes(_token_hashes(str(text)), shingle_len)
                if len(sh) == 0:
                    continue
                sig = (a * sh[None, :] + b).min(axis=1)
                ids.append(i)
                shs.append(sh.astype(np.int64))
                sigs.append(sig.astype(np.int64))
            yield pd.DataFrame({"__id": ids, "__sh": shs, "__sig": sigs})

    return df.select(id_col, text_col).mapInPandas(
        kernel, schema="__id long, __sh array<long>, __sig array<long>"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_len: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash-LSH, verified with exact
    Jaccard over the shingle-hash sets.

    Pipeline: numpy signature kernel (persisted — the self-join and the
    verify join reuse it without recomputing) → explode into ``bands``
    band-hashes [ids only — no arrays cross the candidate shuffle] →
    self-join per bucket → dedupe candidate pairs → join shingle sets back by
    id → exact Jaccard filter.  Returns (id_a, id_b, jaccard).
    """
    rows = num_hashes // bands
    prepped = minhash_prep_pandas(df, text_col, id_col, num_hashes, shingle_len).persist()
    banded = prepped.select(
        "__id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    b, F.concat_ws(",", F.slice(F.col("__sig"), b * rows + 1, rows))
                ),
            )
        ).alias("__band", "__bh"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__bh") == F.col("b.__bh"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh = prepped.select("__id", "__sh")
    pairs = (
        cand.join(sh.select(F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    return (
        pairs.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash_bits(tokens: Column) -> Column:
    """64-bit SimHash of a token array as an array<int> of bits: per bit
    position, sum +1/-1 votes of each token's xxhash64 bit, then take signs.
    Kept as a bit array (not packed int64) — Spark's shift functions take only
    literal shift amounts, and the array form keeps Hamming distance a simple
    zip_with fold."""
    votes = F.aggregate(
        tokens,
        F.array_repeat(F.lit(0), 64),
        lambda acc, t: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: F.bit_get(F.xxhash64(t), i).cast("int"),
            ),
            lambda a, bit: a + F.when(bit == 1, 1).otherwise(-1),
        ),
    )
    return F.transform(votes, lambda v: F.when(v > 0, 1).otherwise(0))


def hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two equal-length bit arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.when(x != y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def simhash_pandas(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched numpy SimHash kernel: packed 64-bit fingerprint per doc
    (bit votes via one (|tokens| x 64) bit-matrix reduction)."""
    import pandas as pd

    bit_idx = np.arange(64, dtype=np.uint64)
    weights = np.uint64(1) << bit_idx

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for i, text in zip(pdf[id_col].values, pdf[text_col].values):
                th = _token_hashes(str(text))
                if len(th) == 0:
                    continue
                bits = (th[:, None] >> bit_idx[None, :]) & np.uint64(1)
                votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
                packed = weights[votes > 0].sum(dtype=np.uint64)
                ids.append(i)
                hashes.append(np.int64(packed.astype(np.int64)))
            yield pd.DataFrame({"__id": ids, "__sh": hashes})

    return df.select(id_col, text_col).mapInPandas(
        kernel, schema="__id long, __sh long"
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= ``max_hamming``.

    Blocking: split the 64 bits into 4 16-bit chunks; by pigeonhole a pair
    within distance 3 agrees on >=1 chunk → self-join only per (chunk_idx,
    chunk_value) bucket.  For larger ``max_hamming`` the chunk filter is a
    recall<1 approximation (documented LSH-style trade-off).  Returns
    (id_a, id_b, hamming)."""
    hashed = simhash_pandas(df, text_col, id_col).persist()
    chunk_vals = F.array(
        *[
            F.shiftrightunsigned("__sh", i * 16).bitwiseAND(F.lit(0xFFFF))
            for i in range(4)
        ]
    )
    chunks = hashed.select(
        "__id", "__sh", F.posexplode(chunk_vals).alias("__ci", "__cv")
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__ci") == F.col("b.__ci"))
            & (F.col("a.__cv") == F.col("b.__cv"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.bit_count(F.col("a.__sh").bitwiseXOR(F.col("b.__sh"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    block_cols: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_len: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs within blocking keys.  Quadratic
    *per block* — blocks must be bounded (lang, length bucket, LSH bucket…);
    used directly for modest blocks and as the verifier behind LSH.

    ``block_cols`` is mandatory: an unblocked self-join is all-pairs and can
    never finish at the 100 TB design point, so we refuse rather than let the
    default silently pick the quadratic path (use ``minhash_lsh_pairs`` for
    unbounded corpora)."""
    if not block_cols:
        raise ValueError(
            "ngram_jaccard_pairs requires at least one blocking column; an "
            "unblocked self-join is O(n^2). Use minhash_lsh_pairs (band "
            "buckets) for unbounded corpora, or block by lang/length bucket."
        )
    toks = whitespace_tokens(normalize_text(F.col(text_col)))
    prepped = df.select(
        *block_cols,
        F.col(id_col).alias("__id"),
        F.array_distinct(word_shingles(toks, shingle_len)).alias("__sh"),
    ).filter(F.size("__sh") > 0)
    a = prepped.alias("a")
    b = prepped.alias("b")
    cond = F.col("a.__id") < F.col("b.__id")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    inter = F.size(F.array_intersect(F.col("a.__sh"), F.col("b.__sh"))).cast("double")
    union = (F.size(F.col("a.__sh")) + F.size(F.col("b.__sh"))).cast("double") - inter
    return (
        a.join(b, cond)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            (inter / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .withColumn("jaccard", F.round("jaccard", 6))
    )


def _bloom_positions(fp: Column, m_bits: int, k_hashes: int) -> Column:
    """k deterministic bit positions for a fingerprint: pmod(xxhash64(fp, i),
    m).  Seeded JVM-side (no Python in the hot path) and identical on build
    and probe by construction."""
    return F.array(
        *[
            F.pmod(F.xxhash64(fp, F.lit(i)), F.lit(m_bits)).cast("long")
            for i in range(k_hashes)
        ]
    )


def bloom_filter_build(
    seen: DataFrame,
    text_col: str = "text",
    m_bits: int = 1 << 20,
    k_hashes: int = 7,
    fingerprints: DataFrame | None = None,
):
    """Distributed Bloom-filter build over the seen-corpus fingerprints.

    Scale shape: positions are exploded and packed into 64-bit words by a
    (pos/64)-keyed bit_or agg in ONE shuffle — bit_or is idempotent, so
    duplicate positions need no DISTINCT pre-pass (a prior version paid a
    second full shuffle for one), the map-side partial aggregate already
    collapses each partition to ≤ m_bits/64 rows, and the shuffle carries
    at most m_bits/64 rows per partition regardless of corpus size.  The
    driver collects a bounded m_bits/8-byte array (128 KiB at the 1 Mi
    default).  Returns a numpy uint64 word array of length m_bits/64.

    ``fingerprints`` (optional): a pre-computed single-column ``__fp``
    relation — callers that also need the fingerprints for a verify join
    pass it (persisted) so the normalize+md5 pass over the corpus text runs
    once, not once per consumer."""
    import numpy as np

    if fingerprints is not None:
        src, fp = fingerprints, F.col("__fp")
    else:
        src, fp = seen, F.md5(normalize_text(F.col(text_col)))
    words = (
        src.select(
            F.explode(_bloom_positions(fp, m_bits, k_hashes)).alias("pos")
        )
        .groupBy((F.col("pos") / 64).cast("long").alias("word_idx"))
        .agg(F.expr("bit_or(shiftleft(1L, cast(pos % 64 as int)))").alias("word"))
        .collect()
    )
    bitmap = np.zeros(m_bits // 64, dtype=np.uint64)
    for r in words:
        # word arrives as a signed int64 (bit_or of shiftleft(1L, 63) goes
        # negative); np.uint64(negative) is a hard error on numpy >= 2 —
        # reinterpret the bits instead of converting the value.
        bitmap[r.word_idx] = np.int64(r.word).view(np.uint64)
    return bitmap


def bloom_dedup_incremental(
    incoming: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
    k_hashes: int = 7,
) -> DataFrame:
    """Incremental dedup of a new batch against an already-ingested corpus
    via a broadcast Bloom filter (the CCNet/web-pipeline shape: the seen
    corpus is 100 TB, the nightly batch is small — an exact join of batch x
    corpus is the wrong cost).

    Plan: (1) build the Bloom bitmap from the seen fingerprints (bounded
    m_bits/8 bytes, broadcast); (2) one streaming pass flags each incoming
    row probable/clean — no false negatives by Bloom construction, so clean
    rows are exactly-new with NO join; (3) only the probable fraction (true
    dups + ~fp_rate of the batch) is verified with an exact fingerprint
    semi-join against the corpus.  Output = incoming columns + ``is_dup``
    (exact: Bloom false positives are removed by the verify tier) +
    ``bloom_probable`` (the pre-verify flag, for FP-rate accounting).
    """
    import numpy as np
    import pandas as pd

    # fingerprint the corpus ONCE (normalize+md5 is the regex-heavy part of
    # the whole operator): the persisted 16-byte-hash relation feeds both
    # the bitmap build (which materializes it via its collect) and the
    # exact-verify semi join — hashes-only leave the scan, so the cache is
    # bounded at 16 B + overhead per corpus row
    seen_fps = seen.select(
        F.md5(normalize_text(F.col(text_col))).alias("__fp")
    ).persist()
    bitmap = bloom_filter_build(
        seen, text_col, m_bits, k_hashes, fingerprints=seen_fps
    )
    sc = incoming.sparkSession
    bc = sc.sparkContext.broadcast(bitmap)

    from pyspark.sql.functions import pandas_udf

    def _might_contain(positions):
        bm = bc.value
        pos = np.array(positions.tolist(), dtype=np.int64)
        words = bm[pos >> 6]
        bits = (words >> (pos & 63).astype(np.uint64)) & np.uint64(1)
        return pd.Series(bits.all(axis=1))

    # real (non-string) annotations: the module's `from __future__ import
    # annotations` would otherwise defeat pandas_udf signature inference
    _might_contain.__annotations__ = {"positions": pd.Series, "return": pd.Series}
    might_contain = pandas_udf(_might_contain, "boolean")

    # fingerprint + probe the batch ONCE too: flagged is consumed by two
    # branches (the verify join's probable side and the final output join),
    # and without the persist Spark would re-run the regex + the Arrow UDF
    # probe over the batch for each.  Batch-sized cache — bounded by the
    # operator's own contract (the nightly batch ≪ the corpus).
    fp = F.md5(normalize_text(F.col(text_col)))
    flagged = incoming.withColumn("__fp", fp).withColumn(
        "bloom_probable",
        might_contain(_bloom_positions(F.col("__fp"), m_bits, k_hashes)),
    ).persist()
    # no distinct on the semi-join build side: LEFT SEMI is set-semantics
    # already, and the dedup would cost a full extra shuffle of the corpus
    probable = flagged.filter(F.col("bloom_probable"))
    verified = probable.join(seen_fps, "__fp", "left_semi").select(
        F.col(id_col).alias("__dup_id")
    )
    out = flagged.join(
        F.broadcast(verified),
        flagged[id_col] == F.col("__dup_id"),
        "left",
    ).select(
        *incoming.columns,
        "bloom_probable",
        F.col("__dup_id").isNotNull().alias("is_dup"),
    )
    return out
