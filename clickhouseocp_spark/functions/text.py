"""Text-analysis functions (SURVEY.md §2.8 'Text analysis' family — ClickHouse
tokens/ngrams/detectLanguage/normalizeQuery — plus the LLM-data-pipeline
scoring ops the driver's north star requires: token counting, quality scoring,
language ID, document fingerprinting).

All JVM-side column expressions (split/HOF/regex) — no Python UDFs; these run
inside whole-stage codegen and scale linearly with the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: BPE-ish word/punct tokenizer: words, numbers, or single punctuation marks.
TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

#: Tiny per-language marker lexicons for the n-gram/stopword LID heuristic.
#: Deterministic and oracle-reproducible; a real system would plug fastText.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "value", "table"),
    "es": ("el", "la", "de", "que", "y", "los", "por"),
    "fr": ("le", "la", "les", "des", "est", "une", "pour"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit"),
    "zh": ("de5", "shi4", "bu4", "le5", "zai4", "ren2"),
}


def whitespace_tokens(text: Column | str) -> Column:
    """tokens(): whitespace tokenization."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, r"\s+")


def regex_tokens(text: Column | str, pattern: str = TOKEN_RE) -> Column:
    """BPE-ish regex tokenization (words / numbers / punct marks)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(f"({pattern})"))


def token_count(text: Column | str) -> Column:
    """Approximate token count — whitespace tokens (cheap, scan-speed)."""
    return F.size(whitespace_tokens(text))


def word_shingles(tokens: Column, n: int, sep: str = " ") -> Column:
    """ngrams(): sliding word n-grams over a token array, as joined strings.
    Empty result if the document has fewer than n tokens.  (Guarded: Spark's
    sequence(1, 0) counts DOWN, so the too-short case must short-circuit.)"""
    count = F.size(tokens) - n + 1
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
        lambda i: F.array_join(F.slice(tokens, i, n), sep),
    )
    return F.when(count >= 1, grams).otherwise(F.expr("array()").cast("array<string>"))


def char_shingles(text: Column | str, n: int) -> Column:
    """Character n-grams (ClickHouse ngrams()); empty if text shorter than n."""
    c = F.col(text) if isinstance(text, str) else text
    count = F.length(c) - n + 1
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
        lambda i: F.substring(c, i, n),
    )
    return F.when(count >= 1, grams).otherwise(F.expr("array()").cast("array<string>"))


def stopword_ratio(tokens: Column, stopwords: tuple[str, ...]) -> Column:
    """Fraction of tokens that are stopwords."""
    hits = F.size(F.filter(tokens, lambda t: t.isin(*stopwords)))
    return hits.cast("double") / F.greatest(F.size(tokens), F.lit(1)).cast("double")


def _isin_pred(markers: tuple[str, ...]):
    # closure factory: a default-arg lambda would have 2 params and PySpark
    # would misread it as an (element, index) higher-order lambda
    return lambda t: t.isin(*markers)


def language_scores(tokens: Column) -> dict[str, Column]:
    """Marker-hit count per language (the LID heuristic's evidence)."""
    return {
        lang: F.size(F.filter(tokens, _isin_pred(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def detect_language(tokens: Column) -> Column:
    """detectLanguage() heuristic: argmax of marker hits, ties broken by the
    fixed language order, 'und' when no marker hits at all."""
    scores = language_scores(tokens)
    best = F.lit("und")
    best_score = F.lit(0)
    # iterate in reverse so earlier languages win ties
    for lang in reversed(list(scores)):
        s = scores[lang]
        cond = s >= best_score
        best = F.when(s > 0, F.when(cond, F.lit(lang)).otherwise(best)).otherwise(best)
        best_score = F.greatest(best_score, s)
    return best


def quality_score(text: Column | str) -> Column:
    """LLM-pipeline quality heuristic in [0, 1]: rewards moderate length,
    penalizes very short docs, extreme mean word length, and digit/punct
    noise.  Pure double arithmetic — identical across engines."""
    c = F.col(text) if isinstance(text, str) else text
    toks = whitespace_tokens(c)
    n_tok = F.size(toks).cast("double")
    n_char = F.length(c).cast("double")
    mean_wlen = n_char / F.greatest(n_tok, F.lit(1.0))
    digit_ratio = (
        F.length(F.regexp_replace(c, "[^0-9]", "")).cast("double")
        / F.greatest(n_char, F.lit(1.0))
    )
    punct_ratio = (
        F.length(F.regexp_replace(c, r"[a-zA-Z0-9\s]", "")).cast("double")
        / F.greatest(n_char, F.lit(1.0))
    )
    len_term = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    wlen_term = F.when((mean_wlen >= 3.0) & (mean_wlen <= 9.0), 1.0).otherwise(0.5)
    return (
        F.lit(0.5) * len_term
        + F.lit(0.3) * wlen_term
        - F.lit(0.4) * digit_ratio
        - F.lit(0.4) * punct_ratio
    )


def normalize_text(text: Column | str) -> Column:
    """normalizeQuery()-style canonicalization: lowercase + collapse runs of
    whitespace + trim."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint_md5(text: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text (portable across
    engines; the rolling-hash variant is :func:`fingerprint_rolling`)."""
    return F.md5(normalize_text(text))


def fingerprint_rolling(text: Column | str) -> Column:
    """64-bit rolling-hash fingerprint over whitespace tokens (Spark-native
    xxhash64 chain; engine-specific, covered by pytest not the oracle)."""
    toks = whitespace_tokens(normalize_text(text))
    return F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: F.xxhash64(acc, t),
    )
