"""TF-IDF document similarity — text similarity without embeddings,
as a pure inverted-index DataFrame plan.

Complements operators/dedup.py (set-based Jaccard) with the weighted
bag-of-words cosine used for soft near-dup detection and retrieval-ish
ranking when no embedding model is in the loop.

Plan shape (all shuffles on the token key, never a cross join):

1. term frequencies: explode tokens → count per (doc, token);
2. document frequencies: distinct doc count per token (one aggregate
   over the same exploded relation);
3. tf-idf weight w(d,t) = tf · ln(N / df) — raw counts and natural
   log, the classic smooth-free variant, chosen because it is exactly
   reproducible in ANSI SQL for the oracle;
4. pairwise dot products via the inverted-index self-join on token;
5. normalize by per-document vector norms.

Scale: identical skew profile to token Jaccard — high-df tokens
dominate the self-join; ``min_idf`` drops them (a token in most
documents carries ~zero weight anyway, so the cosine loss is bounded
by the weight it would have contributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def tfidf_weights(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_idf: float = 0.0,
) -> DataFrame:
    """(id, tok, w) tf-idf weights; ``min_idf`` drops near-stopword
    tokens (idf below the floor) before any pairing."""
    tf = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("tok"))
        .groupBy("id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    n_docs = df.count()
    idf = tf.groupBy("tok").agg(
        F.log(F.lit(float(n_docs)) / F.countDistinct("id")).alias("idf")
    )
    weighted = tf.join(idf, "tok").select(
        "id", "tok", (F.col("tf") * F.col("idf")).alias("w")
    )
    if min_idf > 0.0:
        weighted = weighted.join(
            idf.filter(F.col("idf") >= min_idf).select("tok"), "tok"
        )
    return weighted


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 ranking of every document against a bag of query terms —
    the standard lexical retrieval scorer (Robertson/Spärck Jones,
    Lucene-smoothed idf) beside the tf-idf cosine and the embedding
    kNN: ``(doc_id, bm25)`` for documents matching ≥1 term.

    score(d) = Σ_t ln((N − df_t + 0.5)/(df_t + 0.5) + 1)
               · tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Plan: one token explode filtered to the query terms (map-side —
    the 100 TB corpus shuffles only matching (doc, term) pairs),
    df per term and avgdl as tiny broadcast aggregates. Per-term
    scores round to integer micro-units BEFORE the per-doc sum (the
    bigram-LM trick), so the sum is order-independent and the oracle
    restates it hash-exactly."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(text_col)).alias("tok"),
        F.size(tokens(text_col)).cast("long").alias("dl"),
    )
    n_docs = df.count()
    hits = toks.filter(F.col("tok").isin([t.lower() for t in query_terms]))
    tf = hits.groupBy("doc_id", "tok").agg(
        F.count("*").alias("tf"), F.any_value("dl").alias("dl")
    )
    dfreq = tf.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    avgdl = df.select(
        (
            F.sum(F.size(tokens(text_col)).cast("long"))
            / F.lit(float(n_docs))
        ).alias("avgdl")
    )
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term_score = idf * (
        (F.col("tf") * (k1 + 1.0))
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(avgdl))
        .select(
            "doc_id",
            F.round(term_score * 1e6).cast("long").alias("micro"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.sum("micro") / 1e6, 6).alias("bm25")
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    min_idf: float = 0.0,
) -> DataFrame:
    """All document pairs with tf-idf cosine ≥ threshold:
    ``(doc_a, doc_b, cosine)``, doc_a < doc_b, cosine rounded to 6.

    Dot products come from the inverted-index join (only co-occurring
    tokens pair up); norms from one aggregate over the weights."""
    w = tfidf_weights(df, text_col, id_col, min_idf)
    norms = w.groupBy("id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    na = norms.select(F.col("id").alias("doc_a"), F.col("nrm").alias("nrm_a"))
    nb = norms.select(F.col("id").alias("doc_b"), F.col("nrm").alias("nrm_b"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("dot") / (F.col("nrm_a") * F.col("nrm_b")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
