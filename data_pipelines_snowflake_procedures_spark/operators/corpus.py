"""End-to-end corpus preparation for LLM pretraining: the C4-style
clean → filter → dedup pipeline and the token-budget report.

Composes the per-document text operators (operators/text.py) and exact
dedup (operators/dedup.py) into the two calls a training-data team
actually runs:

* :func:`clean_corpus` — quality gate + language filter + exact dedup
  in one plan: a single narrow projection computes all signals, the
  filter prunes before the ONLY shuffle (dedup window on the content
  fingerprint). At 100 TB the quality/language filter typically drops
  50-80% of raw web text before the shuffle — filtering first is the
  difference between shuffling 100 TB and shuffling 25 TB.
* :func:`token_budget` — tokens/docs per (language × source) after
  cleaning: the report that decides sampling weights for a training
  mix. One aggregate over the cleaned frame.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import (
    detect_language,
    fingerprint,
    quality_score,
    ws_token_count,
)


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.75,
    languages: Sequence[str] = ("en",),
) -> DataFrame:
    """Quality-gate, language-filter, and exact-dedup a raw corpus.

    Keeps documents with ``quality_score >= min_quality`` whose
    detected language is in ``languages``, then keeps the minimum-id
    representative per content fingerprint. Output: the input columns
    plus (n_tokens_ws, quality_score, detected_lang, fingerprint).

    Plan shape: one narrow projection (all signals, no UDF), one
    filter (pushed before the shuffle), one window shuffle on the
    fingerprint. Nothing else.
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    scored = df.select(
        "*",
        ws_token_count(c).alias("n_tokens_ws"),
        F.round(quality_score(c), 2).alias("quality_score"),
        detect_language(c).alias("detected_lang"),
        fingerprint(c).alias("fingerprint"),
    )
    kept = scored.filter(
        (F.col("quality_score") >= min_quality)
        & F.col("detected_lang").isin(*languages)
    )
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col).asc())
    return (
        kept.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def token_budget(
    cleaned: DataFrame,
    group_cols: Sequence[str] = ("detected_lang",),
    token_col: str = "n_tokens_ws",
) -> DataFrame:
    """Token/document counts per group over a cleaned corpus — the
    sampling-weight input for a training mix. One shuffle on the
    (low-cardinality) group keys; partial aggregation does the heavy
    lifting map-side."""
    return cleaned.groupBy(*group_cols).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_col).cast("long").alias("total_tokens"),
        F.round(F.avg("quality_score"), 4).alias("avg_quality"),
    )
