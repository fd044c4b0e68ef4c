"""Text analysis operators for LLM training-data pipelines: token
counting, quality scoring, language ID, document fingerprinting.

Not present in the reference (its domain stops at DQ/PII); these are
the north-star extensions called for by SURVEY.md §7 step 8, built for
the ``documents`` harness table and any corpus with a text column.

Everything here is a **native Column expression builder** — no Python
UDFs, so the hot path stays inside whole-stage codegen and scales as a
narrow (shuffle-free) projection over arbitrarily many partitions.
Cross-engine determinism (for the DuckDB oracle gate) comes from
md5-based hashing: Spark ``md5`` and DuckDB ``md5`` agree bit-for-bit,
unlike xxhash64 which DuckDB lacks.

At 100 TB: all per-document ops are embarrassingly parallel; the only
caveat is very long documents inflating token arrays — cap with
``F.slice`` before arrayful ops if documents exceed ~1 MB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: BPE-ish pre-tokenizer: alphanumeric runs or single non-space symbols
#: (the classic GPT-2-style split, minus unicode categories).
BPE_TOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"

#: Tiny per-language stopword lists for the n-gram/stopword language
#: heuristic. Deliberately small: the point is the operator shape
#: (argmax over per-language hit counts), not lexicon quality.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "los", "las", "y", "en", "que", "un", "una"],
    "fr": ["le", "la", "les", "des", "et", "en", "une", "est", "du", "dans"],
    "de": ["der", "die", "das", "und", "ein", "eine", "von", "zu", "mit", "ist"],
}

#: Generic stopword set for quality scoring (English-biased, like most
#: pretraining quality heuristics).
QUALITY_STOPWORDS = LANG_STOPWORDS["en"]


def _let(value: Column, body) -> Column:
    """Let-binding for Column expressions: evaluate ``value`` ONCE per
    row and apply ``body`` to the bound variable, via
    ``transform(array(value), v -> body(v))[0]``.

    Why (r11, guide §7.2 duplicated subtrees): Spark performs no
    common-subexpression elimination on lambda-bearing expression
    trees, so a token array referenced k times in one projection is
    re-split k times per row (measured: quality_score alone evaluated
    split() 7×; score+langid entries 22×). Binding through a
    single-element array's lambda variable makes every reference hit
    the one materialized value. Value-identical by construction:
    ``transform(array(x), f)[0] == f(x)`` for any expression x (the
    array is never null, the lambda is applied to exactly that
    element)."""
    return F.transform(F.array(value), body)[0]


def tokens(col: str | Column) -> Column:
    """Whitespace tokens of the lowercased, trimmed text. NULL text is
    treated as empty text everywhere in this module — otherwise NULLs
    propagate through hit-count comparisons and flip downstream
    CASE/when chains to their fallback branches (e.g. a NULL document
    would language-classify as the last language checked)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(F.coalesce(c, F.lit("")))), r"\s+")


def ws_token_count(col: str | Column) -> Column:
    return F.size(tokens(col)).cast("long")


def bpe_token_count(col: str | Column) -> Column:
    """Count of BPE-ish pre-tokens (alnum runs + isolated symbols)."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), F.lit(0))).cast("long")


def punct_ratio(col: str | Column) -> Column:
    """Share of characters that are neither alphanumeric nor whitespace."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    n = F.length(c)
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def _mean_token_length_of(toks: Column) -> Column:
    """Mean token length over an already-bound token array."""
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.when(
        F.size(toks) > 0, total.cast("double") / F.size(toks).cast("double")
    ).otherwise(F.lit(0.0))


def mean_token_length(col: str | Column) -> Column:
    return _let(tokens(col), _mean_token_length_of)


def stopword_hits(col: str | Column, words: list[str] | None = None) -> Column:
    """Distinct stopwords present in the text (set intersection size —
    deterministic and cheap; frequency-weighted variants can use
    explode + join when lexicons outgrow literal arrays)."""
    words = words or QUALITY_STOPWORDS
    return F.size(
        F.array_intersect(tokens(col), F.array(*[F.lit(w) for w in words]))
    ).cast("long")


def _quality_indicators_of(c: Column, toks: Column) -> dict[str, Column]:
    """The four gates over already-bound text + token-array columns."""
    return {
        "len_ok": (F.length(c) >= 50) & (F.length(c) <= 20000),
        "tok_len_ok": _let(
            _mean_token_length_of(toks), lambda m: (m >= 2.0) & (m <= 12.0)
        ),
        "stopword_ok": F.size(
            F.array_intersect(
                toks, F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
            )
        )
        >= 1,
        "punct_ok": punct_ratio(c) <= 0.2,
    }


def quality_indicators(col: str | Column) -> dict[str, Column]:
    """Four pretraining-quality gates as boolean indicators. Indicator
    (not continuous) scoring keeps the result exactly portable across
    engines — no float-rounding edge cases at the pass boundary. Each
    dict entry is an independent Column, so each binds its own token
    array; :func:`quality_score` shares ONE binding across all four."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    return {
        k: _let(tokens(c), lambda toks, k=k: _quality_indicators_of(c, toks)[k])
        if k in ("tok_len_ok", "stopword_ok")
        else v
        for k, v in _quality_indicators_of(c, tokens(c)).items()
    }


def quality_score(col: str | Column) -> Column:
    """Mean of the four indicators, in [0, 1] steps of 0.25. The token
    array is let-bound once for all indicators (r11 — the inlined form
    re-split the text 7× per row)."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))

    def body(toks: Column) -> Column:
        total = None
        for flag in _quality_indicators_of(c, toks).values():
            term = F.when(flag, 1).otherwise(0)
            total = term if total is None else total + term
        return total.cast("double") / F.lit(4.0)

    return _let(tokens(c), body)


def lang_hits(col: str | Column) -> dict[str, Column]:
    return {
        lang: stopword_hits(col, words) for lang, words in LANG_STOPWORDS.items()
    }


def detect_language(col: str | Column) -> Column:
    """Stopword-hit argmax language ID with fixed tie order
    en > es > fr > de; 'und' when nothing matches. The token array is
    let-bound once for all four languages and the four hit counts are
    let-bound once for the whole CASE chain (r11 — fully inlined, the
    chain re-split the text 16× and re-intersected each lexicon up to
    4× per row)."""

    def argmax(s: Column) -> Column:
        h = {lang: s[lang] for lang in LANG_STOPWORDS}
        return (
            F.when(
                (h["en"] == 0) & (h["es"] == 0) & (h["fr"] == 0) & (h["de"] == 0),
                F.lit("und"),
            )
            .when(
                (h["en"] >= h["es"]) & (h["en"] >= h["fr"]) & (h["en"] >= h["de"]),
                F.lit("en"),
            )
            .when((h["es"] >= h["fr"]) & (h["es"] >= h["de"]), F.lit("es"))
            .when(h["fr"] >= h["de"], F.lit("fr"))
            .otherwise(F.lit("de"))
        )

    def body(toks: Column) -> Column:
        hits = F.struct(
            *[
                F.size(
                    F.array_intersect(
                        toks, F.array(*[F.lit(w) for w in words])
                    )
                )
                .cast("long")
                .alias(lang)
                for lang, words in LANG_STOPWORDS.items()
            ]
        )
        return _let(hits, argmax)

    return _let(tokens(col), body)


def fingerprint(col: str | Column) -> Column:
    """Whole-document fingerprint: md5 of the whitespace-normalized,
    lowercased text. Identical logical content → identical hash."""
    return F.md5(F.concat_ws(" ", tokens(col)))


def positional_shingles(col: str | Column, n: int = 3) -> Column:
    """ALL n-token shingles in document order (element ``i`` starts at
    token ``i``; duplicates kept — position matters). Empty array when
    the document has fewer than ``n`` tokens.

    Built by zipping ``n`` shifted slices of the token array — NOT by
    indexing a captured expression inside a transform lambda: Spark
    does no common-subexpression elimination inside lambda bodies, so
    ``slice(tokens(col), i, n)`` per position re-evaluates the whole
    split per token, turning shingling O(L²) per document (measured
    ~10× on the bigram-LM operator before the same fix)."""
    def body(toks: Column) -> Column:
        cnt = F.greatest(F.size(toks) - (n - 1), F.lit(0))
        zipped = F.arrays_zip(
            *[F.slice(toks, i + 1, cnt).alias(f"t{i}") for i in range(n)]
        )
        return F.transform(
            zipped,
            lambda s: F.concat_ws(" ", *[s[f"t{i}"] for i in range(n)]),
        )

    # let-bind the token array: the n slices + the size reference it
    # n+1 times (r11 — same no-CSE-under-lambdas rule as quality_score)
    return _let(tokens(col), body)


def shingles(col: str | Column, n: int = 3) -> Column:
    """Distinct n-token shingles (set semantics — the Jaccard/MinHash
    unit). See :func:`positional_shingles` for the ordered form and
    the O(L) construction note."""
    return F.array_distinct(positional_shingles(col, n))


def min_shingle_fingerprint(col: str | Column, n: int = 3) -> Column:
    """Rolling-hash-style locality fingerprint: minimum md5 over the
    document's n-token shingles (a 1-permutation MinHash). Documents
    sharing their minimal shingle collide — cheap near-dup blocking."""
    return _let(
        shingles(col, n),
        lambda sh: F.when(
            F.size(sh) > 0, F.array_min(F.transform(sh, F.md5))
        ).otherwise(F.md5(F.lit(""))),
    )


def trim_repeated_lines(col: str | Column) -> Column:
    """Intra-document repeated-line removal — the crawl-cleaning
    transform that strips per-page boilerplate (nav bars, cookie
    banners, footers) repeated WITHIN one document: keep each line's
    first occurrence, preserving order. Map-only narrow expression
    (split → array_distinct → join); no Python, no shuffle — pairs
    with the cross-document detectors in operators/dedup.py, which
    never see within-doc repetition."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(F.array_distinct(F.split(c, "\n")), "\n")


#: RE2-safe (Java+DuckDB identical) markup patterns, most-specific first.
MARKUP_PATTERNS: list[str] = [
    r"https?://[^\s]+",                                   # URLs
    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",    # emails
    r"<[^>]+>",                                           # HTML tags
]


def strip_markup(col: str | Column) -> Column:
    """Remove web markup noise (URLs, e-mail addresses, HTML tags) and
    collapse the leftover whitespace — the first transform of every
    crawl-to-training-text pipeline. Pure regexp_replace chain
    (whole-stage codegen); patterns avoid lookarounds and ``\\b`` so
    Java and RE2 engines agree character-for-character."""
    c = F.col(col) if isinstance(col, str) else col
    for pat in MARKUP_PATTERNS:
        c = F.regexp_replace(c, pat, "")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def _nonempty_lines(c: Column) -> Column:
    return F.filter(
        F.transform(F.split(c, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )


def _nonempty_tokens(c: Column) -> Column:
    return F.filter(tokens(c), lambda t: t != "")


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals, one narrow projection:

    * ``dup_line_frac`` — fraction of non-empty lines that are repeats
      of another line (1 - distinct/total).
    * ``dup_line_char_frac`` — fraction of line characters living in
      lines that occur more than once.
    * ``top_bigram_frac`` — fraction of token bigrams taken by the
      most frequent bigram.

    Boilerplate-heavy and template-generated pages score high on all
    three; the standard pretraining filter drops documents above
    thresholds (e.g. dup_line_frac > 0.3, top_bigram_frac > 0.2).

    All signals are per-document array expressions (no shuffle, no
    UDF). The within-document counting is O(L²)/O(B²) in lines/bigrams
    per document — fine for web-page-sized docs; cap pathological
    documents with ``F.slice`` upstream if a corpus has multi-MB texts.

    The line/bigram arrays are BOUND as columns in a first projection
    before any nested lambda references them: Spark performs no
    common-subexpression elimination inside lambda bodies, so the
    nested duplicate-count filters over a captured split expression
    would otherwise re-split the text per comparison (an extra O(L)
    factor on the already-quadratic counting).
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    toks0 = _nonempty_tokens(c)
    n_big = F.greatest(F.size(toks0) - 1, F.lit(0))
    bound = df.select(
        "*",
        _nonempty_lines(c).alias("__lines"),
        F.transform(
            F.arrays_zip(
                F.slice(toks0, 1, n_big).alias("a"),
                F.slice(toks0, 2, n_big).alias("b"),
            ),
            lambda s: F.concat_ws(" ", s["a"], s["b"]),
        ).alias("__bigrams"),
    )
    lines = F.col("__lines")
    bigrams = F.col("__bigrams")

    line_chars = F.aggregate(
        F.transform(lines, lambda l: F.length(l)), F.lit(0), lambda a, x: a + x
    )
    dup_line_chars = F.aggregate(
        F.transform(
            F.filter(
                lines,
                lambda l: F.size(F.filter(lines, lambda x: x == l)) > 1,
            ),
            lambda l: F.length(l),
        ),
        F.lit(0),
        lambda a, x: a + x,
    )
    top_bigram_n = F.array_max(
        F.transform(
            F.array_distinct(bigrams),
            lambda b: F.size(F.filter(bigrams, lambda x: x == b)),
        )
    )
    return bound.select(
        id_col,
        F.size(lines).cast("long").alias("n_lines"),
        F.when(
            F.size(lines) > 0,
            F.round(
                1.0 - F.size(F.array_distinct(lines)).cast("double")
                / F.size(lines).cast("double"),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("dup_line_frac"),
        F.when(
            line_chars > 0,
            F.round(
                F.coalesce(dup_line_chars, F.lit(0)).cast("double")
                / line_chars.cast("double"),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("dup_line_char_frac"),
        F.when(
            F.size(bigrams) > 0,
            F.round(
                top_bigram_n.cast("double") / F.size(bigrams).cast("double"), 6
            ),
        ).otherwise(F.lit(0.0)).alias("top_bigram_frac"),
    )


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass per-document text profile: counts, ratios, quality,
    language, fingerprints — a single narrow projection. NULL text
    profiles as empty text (see :func:`tokens`)."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    return df.select(
        id_col,
        ws_token_count(c).alias("n_tokens_ws"),
        bpe_token_count(c).alias("n_tokens_bpe"),
        F.length(c).cast("long").alias("n_chars"),
        F.round(mean_token_length(c), 4).alias("mean_token_len"),
        F.round(punct_ratio(c), 4).alias("punct_ratio"),
        F.round(quality_score(c), 2).alias("quality_score"),
        detect_language(c).alias("detected_lang"),
        fingerprint(c).alias("fingerprint"),
        min_shingle_fingerprint(c).alias("min_shingle_fp"),
    )
