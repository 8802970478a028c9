"""Full-text (inverted) index — the CH experimental ``full_text``/``gin``
skipping-index analog (25.x; the tokenbf_v1 bloom variant is the older
form), re-expressed Spark-first.

ClickHouse attaches the inverted index to a MergeTree part: token →
posting-list of row ranges, consulted to skip granules before the scan.
The Spark-native shape is *index = a postings TABLE*:

- :func:`build_fulltext_index` tokenizes (the CH ``tokenizer = 'default'``
  rule: split at non-alphanumeric runs), explodes, and distinct-reduces to
  (token_bucket, token, doc_id) rows.  ``token_bucket = pmod(xxhash64
  (token), n_buckets)`` exists so that PERSISTING the postings
  ``partitionBy("token_bucket")`` turns every search into a partition-pruned
  read — at 100 TB the index is itself big data, and pruning on the bucket
  key is what replaces CH's in-part posting lookup.
- :func:`search_fulltext` answers hasToken-style queries from the postings
  alone: ``mode='any'`` is a bucket-pruned filter + distinct, ``mode='all'``
  a filter + groupBy(doc) HAVING count(DISTINCT token) == |query|.  The
  document table is never rescanned — only matched ids come back, to be
  semi-joined with the corpus when the full rows are needed.
- :func:`hasToken` / :func:`hasTokenCaseInsensitive` are the scalar CH
  functions the index accelerates (exact token membership, not substring —
  ``hasToken('a bc', 'b')`` is false), for the scan path and for oracles.

Scale: the build is one explode + map-side-combinable distinct (shuffle
carries (token, doc_id) pairs, already deduplicated per partition); search
shuffles only the postings rows of the queried tokens' buckets.  The whole
module is built-in expressions — no Python on any hot path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

#: CH tokenizer='default': maximal runs of alphanumerics are the tokens
_TOKEN_SPLIT = r"[^a-zA-Z0-9]+"


def tokenize(text, case_insensitive: bool = False) -> Column:
    """Text → array of tokens per the CH default tokenizer (non-alphanumeric
    separators, empties dropped)."""
    c = F.col(text) if isinstance(text, str) else text
    if case_insensitive:
        c = F.lower(c)
    return F.filter(F.split(c, _TOKEN_SPLIT), lambda t: t != "")


def hasToken(text, token: str) -> Column:
    """CH hasToken: exact token membership (case-sensitive)."""
    return F.array_contains(tokenize(text), token)


def hasTokenCaseInsensitive(text, token: str) -> Column:
    """CH hasTokenCaseInsensitive."""
    return F.array_contains(tokenize(text, case_insensitive=True), token.lower())


def build_fulltext_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    case_insensitive: bool = False,
) -> DataFrame:
    """Postings table (token_bucket, token, doc_id), one row per distinct
    (token, doc) pair.  Persist with ``.write.partitionBy("token_bucket")``
    to make searches partition-pruned reads (the pytest pin does exactly
    that and asserts the pruned plan)."""
    postings = (
        docs.select(
            F.col(id_col),
            F.explode(tokenize(text_col, case_insensitive)).alias("token"),
        )
        .distinct()
        .select(
            F.pmod(F.xxhash64("token"), F.lit(n_buckets)).alias("token_bucket"),
            "token",
            id_col,
        )
    )
    return postings


def search_fulltext(
    index: DataFrame,
    tokens: Sequence[str],
    mode: str = "any",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    case_insensitive: bool = False,
) -> DataFrame:
    """Doc ids whose text contains ANY / ALL of ``tokens``, answered from
    the postings alone.  The bucket filter comes FIRST so a partitioned
    index resolves it by partition pruning (driver-side literal list — no
    job); the token filter then narrows within the touched buckets."""
    toks = [t.lower() for t in tokens] if case_insensitive else list(tokens)
    if not toks:
        raise ValueError("search_fulltext needs at least one token")
    # pmod(xxhash64(lit), n) is constant-foldable — Catalyst reduces the OR
    # chain to literal bucket comparisons, which partition-prune on a
    # bucket-partitioned index
    bucket_pred = None
    for t in toks:
        eq = F.col("token_bucket") == F.pmod(F.xxhash64(F.lit(t)), F.lit(n_buckets))
        bucket_pred = eq if bucket_pred is None else (bucket_pred | eq)
    hit = index.filter(bucket_pred & F.col("token").isin(*toks))
    if mode == "any":
        return hit.select(id_col).distinct()
    if mode == "all":
        return (
            hit.groupBy(id_col)
            .agg(F.count_distinct("token").alias("__nt"))
            .filter(F.col("__nt") == len(set(toks)))
            .select(id_col)
        )
    raise ValueError(f"mode must be 'any' or 'all', got {mode!r}")
