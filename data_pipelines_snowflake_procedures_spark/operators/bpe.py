"""Distributed BPE tokenizer training (Sennrich et al. 2016, the
public byte-pair-encoding algorithm every modern LLM tokenizer
descends from) — as DataFrame aggregates over a VOCABULARY-sized
state, plus merge application for corpus tokenization.

Why this shape scales: the corpus is read ONCE, collapsing to the
distinct-word frequency table (vocabulary-sized — millions of rows at
100 TB, not trillions); every merge iteration is then an aggregate +
narrow string rewrite over that small persisted state, and the final
model (an ordered merge list) is driver-metadata-sized, exactly like
the k-means centroids.

Representation: each word is its symbols joined by single spaces
(``"lower" → "l o w e r"``), so
* adjacent-pair extraction = zip of the split array with itself,
* merge application = plain ``replace(sym, 'a b', 'ab')`` — whose
  left-to-right non-overlapping semantics equal BPE's greedy
  simultaneous merge (verified cross-engine: ``'a a a' → 'aa a'``),
which keeps every step expressible in BOTH Spark and ANSI SQL — the
registry oracle (queries_llm.py::documents_bpe_merges) restates the
full training loop, merge by merge, hash-exactly.

Determinism: merge selection orders by (freq DESC, a ASC, b ASC) —
byte order on both engines for the ASCII token alphabet. No
end-of-word marker (the no-marker variant; markers would be one
``concat`` away and change nothing structurally).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def _symbolized_words(
    df: DataFrame, text_col: str
) -> DataFrame:
    """One corpus pass → the vocabulary state ``(sym, wfreq)``: every
    distinct word with its total corpus frequency, symbols
    space-joined."""
    return (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("wfreq"))
        .select(
            F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("sym"),
            "wfreq",
        )
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Frequency of each adjacent symbol pair, weighted by word
    frequency — the aggregate each merge iteration ranks."""
    arr = F.split(F.col("sym"), " ")
    pairs = F.expr(
        "transform(sequence(1, size(split(sym, ' ')) - 1), "
        "i -> struct(split(sym, ' ')[i-1] AS a, split(sym, ' ')[i] AS b))"
    )
    return (
        words.filter(F.size(arr) > 1)
        .select(F.explode(pairs).alias("p"), "wfreq")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("wfreq").alias("freq"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges: per iteration, the most frequent
    adjacent symbol pair (ties broken lexicographically) merges across
    the whole vocabulary. Returns the ordered merge list
    ``[(a, b, freq), …]`` — the tokenizer model, driver-sized."""
    words = _symbolized_words(df, text_col).persist()
    words.count()  # materialize the single corpus pass
    merges: list[tuple[str, str, int]] = []
    state = words
    for _ in range(n_merges):
        top = (
            _pair_counts(state)
            .orderBy(F.desc("freq"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break  # vocabulary fully merged
        a, b, freq = top[0]["a"], top[0]["b"], int(top[0]["freq"])
        merges.append((a, b, freq))
        state = state.withColumn(
            "sym",
            F.replace(F.col("sym"), F.lit(f"{a} {b}"), F.lit(a + b)),
        )
        # re-persist the rewritten vocabulary so the next iteration's
        # aggregate reads state-sized data, handing off the old cache
        nxt = state.persist()
        nxt.count()
        words.unpersist()
        words = state = nxt
    words.unpersist()
    return merges


def bpe_apply_expr(col: Column, merges: list[tuple[str, str, int]]) -> Column:
    """Tokenize text with a trained merge list, as a pure Column
    expression: whitespace words → space-joined symbols → each merge
    replayed in training order → per-word symbol arrays. Zero-shuffle
    map over the corpus — the model rides in as string literals."""
    def merge_word(w: Column) -> Column:
        sym = F.trim(F.regexp_replace(w, "(.)", "$1 "))
        for a, b, _ in merges:
            sym = F.replace(sym, F.lit(f"{a} {b}"), F.lit(a + b))
        return F.split(sym, " ")

    return F.transform(tokens(col), merge_word)


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BPE token count under a trained model —
    the budget metric a training-mix pipeline prices documents with."""
    toks = bpe_apply_expr(F.col(text_col), merges)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.aggregate(
            toks, F.lit(0), lambda acc, w: acc + F.size(w)
        ).cast("long").alias("n_bpe_tokens"),
    )
