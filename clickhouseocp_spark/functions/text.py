"""Text-analysis functions (SURVEY.md §2.8 'Text analysis' family — ClickHouse
tokens/ngrams/detectLanguage/normalizeQuery — plus the LLM-data-pipeline
scoring ops the driver's north star requires: token counting, quality scoring,
language ID, document fingerprinting).

All JVM-side column expressions (split/HOF/regex) — no Python UDFs; these run
inside whole-stage codegen and scale linearly with the scan.  The one
exception is the string-distance family 2 at the bottom (Damerau-Levenshtein
/ Jaro / Jaro-Winkler): Spark has no built-ins, so those are Arrow-batched
pandas UDFs in the fuzzy-matching tier.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints at runtime
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
    sequence(1, 0) counts DOWN, so the too-short case must short-circuit.)

    The incoming ``tokens`` may be a raw split()/filter() EXPRESSION; the
    per-position lambda would re-evaluate it per gram (O(tokens²) regex
    work).  An expression-level let — transform over a 1-element array —
    binds the evaluated token array to the lambda variable once."""

    def build(t: Column) -> Column:
        count = F.size(t) - n + 1
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
            lambda i: F.array_join(F.slice(t, i, n), sep),
        )
        return F.when(count >= 1, grams).otherwise(
            F.expr("array()").cast("array<string>")
        )

    return F.element_at(F.transform(F.array(tokens), build), 1)


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


# ---------------------------------------------------------------------------
# string-distance family 2: damerauLevenshteinDistance / jaroSimilarity /
# jaroWinklerSimilarity (CH 24.1+ scalar functions).  Spark has levenshtein
# built-in but none of these three — they are Arrow-batched pandas UDFs
# (pure-python per pair; the inputs are short strings by contract, and the
# family sits in the fuzzy-matching tier, not the bulk scan path).
# ---------------------------------------------------------------------------


def _dl_distance_py(a: str, b: str) -> int:
    """Full Damerau-Levenshtein (Lowrance-Wagner, unrestricted adjacent
    transpositions — matches DuckDB's damerau_levenshtein: ('CA','ABC')=2)."""
    da: dict[str, int] = {}
    la, lb = len(a), len(b)
    maxd = la + lb
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxd
    for i in range(la + 1):
        d[i + 1][0] = maxd
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxd
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            lpos = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][lpos] + (i - k - 1) + 1 + (j - lpos - 1),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def _jaro_py(a: str, b: str) -> float:
    """Jaro similarity; 0.0 when either side is empty (DuckDB convention)."""
    la, lb = len(a), len(b)
    if not la or not lb:
        return 0.0
    window = max(la, lb) // 2 - 1
    ma = [False] * la
    mb = [False] * lb
    m = 0
    for i in range(la):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not mb[j] and a[i] == b[j]:
                ma[i] = mb[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if ma[i]:
            while not mb[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def _jaro_winkler_py(a: str, b: str) -> float:
    """Jaro-Winkler: prefix boost (l ≤ 4, p = 0.1) applied only when the
    Jaro similarity exceeds the standard 0.7 threshold (DuckDB convention,
    probed: jw('abcdef','abwxyz') == jaro)."""
    j = _jaro_py(a, b)
    if j <= 0.7:
        return j
    l = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        l += 1
    return j + l * 0.1 * (1.0 - j)


def damerau_levenshtein(a: Column | str, b: Column | str) -> Column:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _udf(sa: pd.Series, sb: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if x is None or y is None else _dl_distance_py(x, y)
                for x, y in zip(sa, sb)
            ],
            dtype="Int32",
        )

    return _udf(F.col(a) if isinstance(a, str) else a,
                F.col(b) if isinstance(b, str) else b)


def jaro_similarity(a: Column | str, b: Column | str) -> Column:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _udf(sa: pd.Series, sb: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if x is None or y is None else _jaro_py(x, y)
                for x, y in zip(sa, sb)
            ]
        )

    return _udf(F.col(a) if isinstance(a, str) else a,
                F.col(b) if isinstance(b, str) else b)


def jaro_winkler_similarity(a: Column | str, b: Column | str) -> Column:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _udf(sa: pd.Series, sb: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if x is None or y is None else _jaro_winkler_py(x, y)
                for x, y in zip(sa, sb)
            ]
        )

    return _udf(F.col(a) if isinstance(a, str) else a,
                F.col(b) if isinstance(b, str) else b)


def register_ch_udfs(spark) -> None:
    """Register the pandas string-distance kernels as SQL functions under
    their ClickHouse names so the TEXT path can call them directly
    (idempotent; annotations resolve here where pandas is module-level)."""
    from pyspark.sql.functions import pandas_udf

    def wrap(fn, dtype):
        @pandas_udf(dtype)
        def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    None if x is None or y is None else fn(x, y)
                    for x, y in zip(a, b)
                ]
            )

        return _udf

    spark.udf.register(
        "damerauLevenshteinDistance", wrap(_dl_distance_py, "int")
    )
    spark.udf.register("jaroSimilarity", wrap(_jaro_py, "double"))
    spark.udf.register("jaroWinklerSimilarity", wrap(_jaro_winkler_py, "double"))

    # Unicode normalization family (CH 21.11+): stdlib unicodedata in a
    # vectorized pandas kernel — no dependency, exact NFC/NFD/NFKC/NFKD
    import unicodedata

    def norm(form):
        @pandas_udf("string")
        def _udf(a: pd.Series) -> pd.Series:
            return a.map(
                lambda v: None if v is None else unicodedata.normalize(form, v)
            )

        return _udf

    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        spark.udf.register(f"normalizeUTF8{form}", norm(form))

    # special-function family (CH math vocabulary): libm via the stdlib —
    # exact IEEE results, vectorized pandas kernels
    import math

    def unary(fn):
        @pandas_udf("double")
        def _udf(a: pd.Series) -> pd.Series:
            return a.map(lambda v: None if v is None else fn(float(v)))

        return _udf

    spark.udf.register("erf", unary(math.erf))
    spark.udf.register("erfc", unary(math.erfc))
    spark.udf.register("tgamma", unary(math.gamma))
    spark.udf.register("lgamma", unary(math.lgamma))

    # punycode / IDNA family (CH 24.1+): RFC 3492 via the stdlib codecs —
    # 'punycode' is the raw bootstring transform, 'idna' the per-label ACE
    # form.  The try* variants return '' on undecodable input (the CH
    # tryBase64Decode convention); the strict forms return NULL (our
    # ANSI-safe analog of CH's thrown exception, documented deviation).
    def _puny_enc(v):
        return v.encode("punycode").decode("ascii")

    def _puny_dec(v):
        return v.encode("ascii").decode("punycode")

    def _idna_enc(v):
        if v == "":
            return ""
        return v.encode("idna").decode("ascii")

    def _idna_dec(v):
        if v == "":
            return ""
        return v.encode("ascii").decode("idna")

    def strfn(fn, on_error):
        @pandas_udf("string")
        def _udf(a: pd.Series) -> pd.Series:
            def one(v):
                if v is None:
                    return None
                try:
                    return fn(v)
                except (UnicodeError, ValueError):
                    return on_error

            return a.map(one)

        return _udf

    spark.udf.register("punycodeEncode", strfn(_puny_enc, None))
    spark.udf.register("punycodeDecode", strfn(_puny_dec, None))
    spark.udf.register("tryPunycodeDecode", strfn(_puny_dec, ""))
    spark.udf.register("idnaEncode", strfn(_idna_enc, None))
    spark.udf.register("idnaDecode", strfn(_idna_dec, None))
    spark.udf.register("tryIdnaEncode", strfn(_idna_enc, ""))


# ---------------------------------------------------------------------------
# stem('en', word) — CH's experimental NLP stemmer for English, implemented
# as the published Porter algorithm (M.F. Porter, "An algorithm for suffix
# stripping", Program 14(3) 1980 — public spec; original-paper variant).
# ---------------------------------------------------------------------------

def _porter_is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in "aeiou":
        return False
    if c == "y":
        return i == 0 or not _porter_is_cons(w, i - 1)
    return True


def _porter_m(stem: str) -> int:
    """The measure m of [C](VC){m}[V]."""
    forms = ""
    for i in range(len(stem)):
        forms += "c" if _porter_is_cons(stem, i) else "v"
    # collapse runs then count "vc" transitions
    import re as _re

    collapsed = _re.sub(r"(.)\1+", r"\1", forms)
    return collapsed.count("vc")


def _porter_has_vowel(stem: str) -> bool:
    return any(not _porter_is_cons(stem, i) for i in range(len(stem)))


def _porter_ends_cvc(stem: str) -> bool:
    if len(stem) < 3:
        return False
    if (
        _porter_is_cons(stem, len(stem) - 3)
        and not _porter_is_cons(stem, len(stem) - 2)
        and _porter_is_cons(stem, len(stem) - 1)
    ):
        return stem[-1] not in "wxy"
    return False


def _porter_double_cons(stem: str) -> bool:
    return (
        len(stem) >= 2
        and stem[-1] == stem[-2]
        and _porter_is_cons(stem, len(stem) - 1)
    )


_PORTER_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]

_PORTER_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_PORTER_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem_py(word: str) -> str:
    """Porter 1980, original-paper rule set.  Lowercase ASCII words; inputs
    of length <= 2 return unchanged (the paper's convention)."""
    w = word.lower()
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]
    # step 1b
    flag = False
    if w.endswith("eed"):
        if _porter_m(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _porter_has_vowel(w[:-2]):
        w = w[:-2]
        flag = True
    elif w.endswith("ing") and _porter_has_vowel(w[:-3]):
        w = w[:-3]
        flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _porter_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _porter_m(w) == 1 and _porter_ends_cvc(w):
            w += "e"
    # step 1c
    if w.endswith("y") and _porter_has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in _PORTER_STEP2:
        if w.endswith(suf):
            if _porter_m(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 3
    for suf, rep in _PORTER_STEP3:
        if w.endswith(suf):
            if _porter_m(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 4
    for suf in _PORTER_STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _porter_m(stem) > 1:
                if suf == "ion" and not stem.endswith(("s", "t")):
                    break
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        m = _porter_m(w[:-1])
        if m > 1 or (m == 1 and not _porter_ends_cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _porter_m(w) > 1 and _porter_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def stem(col, lang: str = "en"):
    """CH ``stem(lang, word)`` analog (experimental NLP family): Porter for
    'en'; other languages raise — the upstream function needs per-language
    Snowball data this engine does not vendor."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    if lang != "en":
        raise ValueError(f"stem: only lang='en' (Porter) is implemented, got {lang!r}")

    @pandas_udf("string")
    def _stem(words: pd.Series) -> pd.Series:
        return pd.Series(
            [None if v is None else porter_stem_py(v) for v in words]
        )

    return _stem(F.col(col) if isinstance(col, str) else col)


#: query parameters dropped by URL canonicalization (tracking noise — the
#: standard web-pipeline strip list)
_TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|ref|mc_cid|mc_eid)(=|$)"


def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL for web-corpus dedup: lowercase scheme+host, strip
    default ports (80/443), drop the fragment, remove tracking query
    params (utm_*, gclid, fbclid, ref, mc_*), sort the surviving params,
    and strip one trailing slash from the path.  All JVM expressions
    (parse_url + array combinators) — no Python, no shuffle; feeding the
    result into the exact-dedup hash agg is the standard first tier of a
    web pipeline (URL-level dedup before any content hashing)."""
    u = F.col(url) if isinstance(url, str) else url
    proto = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    authority = F.parse_url(u, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((proto == "http") & (port == "80"))
        & ~((proto == "https") & (port == "443"))
    )
    path = F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, r"/$", "")
    query = F.coalesce(F.parse_url(u, F.lit("QUERY")), F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
    )
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(
        proto,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def md5_hash64(g: Column) -> Column:
    """Portable 64-bit hash: the first 16 hex chars of md5, as a
    two's-complement BIGINT.  Both halves parse as 32-bit ints and combine
    with an explicit sign fold, so the expression is ANSI-overflow-safe and
    bit-identical on any engine that has md5 — the property the SimHash /
    MinHash vocabulary needs for cross-engine parity (documented deviation:
    ClickHouse's own ngramSimHash uses its internal CityHash-family mix;
    ours is this portable md5 definition with the same near-dup
    semantics)."""
    h = F.md5(g)
    hi = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
    lo = F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint")
    signed_hi = F.when(hi >= 2147483648, hi - 4294967296).otherwise(hi)
    return signed_hi * F.lit(4294967296).cast("bigint") + lo


def simhash64(grams: Column) -> Column:
    """SimHash over a gram array (CH ngramSimHash/wordShingleSimHash
    semantics): per bit, the sign of the ±1-weighted sum over gram hashes —
    one JVM fold carrying 64 counters, zero shuffle.  Empty gram set → 0."""
    def bits_of(h: Column) -> Column:
        # literal bit positions (shift counts must be Python ints)
        return F.array(
            *[
                F.when(
                    F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
                for b in range(64)
            ]
        )

    def finish(a: Column) -> Column:
        # `a` is the fold's bound variable — referencing it 64 times is a
        # variable read, not recomputation.  The bits are disjoint, so the
        # value is a FLAT sum of 64 independent terms (a nested
        # when(...).otherwise(prev) chain would double the expression tree
        # per bit — 2^64 nodes)
        terms = [
            F.when(
                F.element_at(a, b + 1) > 0,
                F.shiftleft(F.lit(1).cast("bigint"), b),
            ).otherwise(F.lit(0).cast("bigint"))
            for b in range(64)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out

    # hash once per gram (transform binds it to a variable) — the 64 shifts
    # inside bits_of then read that variable, not re-run md5
    hashes = F.transform(grams, md5_hash64)
    return F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda a, h: F.zip_with(a, bits_of(h), lambda x, y: x + y),
        finish,
    )


def minhash_pair(grams: Column) -> Column:
    """CH ngramMinHash/wordShingleMinHash shape: the (min, max) of the gram
    hash set as a struct — the two-sided sketch CH tuples up.  Empty gram
    set → (NULL, NULL)."""
    hashes = F.transform(grams, md5_hash64)
    return F.struct(
        F.array_min(hashes).alias("mn"), F.array_max(hashes).alias("mx")
    )
