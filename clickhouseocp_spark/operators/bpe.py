"""BPE tokenizer training + application (Sennrich et al. 2016, public
algorithm) — completes the tokenizer-prep story started by the
``bpe_pair_counts`` query: pair stats → learned merge table → corpus
encoding.

Spark-first shape:

- **Train on the word-frequency table, not the corpus** (the paper's own
  optimization): one distinct-word aggregation reduces 100 TB of text to a
  vocabulary-sized (word, count) table; every merge iteration then runs
  over that table — explode adjacent symbol pairs weighted by count, one
  hash agg, one 1-row argmax collect.  The corpus is touched exactly once.
- **Merges apply as an all-JVM fold**: replacing adjacent pair (a, b) → ab
  left-to-right non-overlapping is ``aggregate`` with an
  (accumulated array, pending symbol) struct accumulator — no Python in
  the training loop's data path.
- **Encoding is a memoized Arrow kernel**: per batch, each DISTINCT word is
  BPE-merged once (dict cache) and documents stream through; merge rules
  broadcast with the UDF closure.  At 100 TB this is the standard
  tokenizer-worker deployment: CPU-bound, embarrassingly parallel, zero
  shuffle.

Word tokenization matches ``operators/ranking.tokenize_terms`` (lowercase,
non-alphanumeric splits) so round-trip contracts can be oracle-checked.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

#: end-of-word marker (the paper's </w>)
EOW = "▁"


def _merge_adjacent(syms: Column, a: str, b: str) -> Column:
    """Fold replacing every left-to-right non-overlapping adjacent (a, b)
    with the merged symbol a+b — pure ``aggregate`` expressions."""
    merged = a + b

    def step(acc: Column, x: Column) -> Column:
        pend = acc["pend"]
        arr = acc["arr"]
        take_merge = pend.eqNullSafe(F.lit(a)) & (x == F.lit(b))
        return F.struct(
            F.when(pend.isNull(), arr)
            .when(take_merge, F.concat(arr, F.array(F.lit(merged))))
            .otherwise(F.concat(arr, F.array(pend)))
            .alias("arr"),
            F.when(pend.isNull(), x)
            .when(take_merge, F.lit(None).cast("string"))
            .otherwise(x)
            .alias("pend"),
        )

    init = F.struct(
        F.array().cast("array<string>").alias("arr"),
        F.lit(None).cast("string").alias("pend"),
    )
    return F.aggregate(
        syms,
        init,
        step,
        lambda acc: F.when(
            acc["pend"].isNull(), acc["arr"]
        ).otherwise(F.concat(acc["arr"], F.array(acc["pend"]))),
    )


def word_frequency_table(df: DataFrame, text_col: str) -> DataFrame:
    """(w, cnt): the corpus reduced to its vocabulary — the only corpus
    pass BPE training makes."""
    from clickhouseocp_spark.operators.ranking import tokenize_terms

    return (
        tokenize_terms(df.select(text_col), text_col)
        .groupBy(F.col("term").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _bpe_learn_driver(
    rows: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Driver-side merge loop over a collected (w, cnt) table — the EXACT
    same semantics as the distributed loop (overlapping adjacent pairs
    counted at every index, argmax ties break on (a, b) ascending, merges
    apply left-to-right non-overlapping); pytest pins sequence equality.
    ASCII/UTF-8 note: Python code-point ordering equals Spark's binary
    string ordering for the symbols BPE produces (UTF-8 byte order is
    code-point order)."""
    syms: list[tuple[list[str], int]] = [
        (list(w) + [EOW], cnt) for w, cnt in rows
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for s, cnt in syms:
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                counts[p] = counts.get(p, 0) + cnt
        if not counts:
            break
        a, b = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((a, b))
        nxt: list[tuple[list[str], int]] = []
        for s, cnt in syms:
            out: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            nxt.append((out, cnt))
        syms = nxt
    return merges


def bpe_learn(
    words: DataFrame, n_merges: int, driver_max_vocab: int = 200_000
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from a (w, cnt) table.  Deterministic:
    argmax ties break on pair text ascending.

    Two tiers by vocabulary size (the merge SEQUENCE is identical —
    pytest-pinned):

    - ``≤ driver_max_vocab`` distinct words: collect the (w, cnt) table
      once and run the merge loop driver-side — ONE Spark job total
      instead of one per merge.  This is how practical BPE trainers run
      (the word table, not the corpus, is the working set), and even at
      100 TB the distinct-word table usually fits: the collect is bounded
      by the probe ``limit(driver_max_vocab + 1)``, never the corpus.
    - larger: the distributed loop — each iteration one explode + hash agg
      + 1-row argmax collect over the localCheckpointed word table."""
    probe = words.limit(driver_max_vocab + 1).collect()
    if len(probe) <= driver_max_vocab:
        return _bpe_learn_driver([(r.w, r.cnt) for r in probe], n_merges)
    syms = words.select(
        "cnt",
        F.concat(
            F.split(F.col("w"), ""), F.array(F.lit(EOW))
        ).alias("s"),
    ).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = syms.where(F.size("s") >= 2).select(
            "cnt",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("s") - 2),
                    lambda i: F.struct(
                        F.element_at("s", i + 1).alias("a"),
                        F.element_at("s", i + 2).alias("b"),
                    ),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p.a"), F.col("p.b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0].p.a, top[0].p.b
        merges.append((a, b))
        syms = syms.select(
            "cnt", _merge_adjacent(F.col("s"), a, b).alias("s")
        ).localCheckpoint()
    return merges


def bpe_encode(df: DataFrame, text_col: str, merges: list[tuple[str, str]],
               out_col: str = "bpe") -> DataFrame:
    """Append ``out_col`` = array<string> of BPE tokens for the document
    (words end with the EOW marker).  Memoized per-distinct-word Arrow
    kernel; merge rules ride the UDF closure (broadcast-sized by
    construction: |merges| entries)."""
    import re as _re

    rules = list(merges)

    def _apply(word: str) -> list[str]:
        s = list(word) + [EOW]
        for a, b in rules:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return s

    tok_rx = _re.compile(r"[a-z0-9]+")

    @F.pandas_udf("array<string>")
    def _enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            toks: list[str] = []
            for w in tok_rx.findall(t.lower()):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _apply(w)
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, _enc(F.col(text_col)))
