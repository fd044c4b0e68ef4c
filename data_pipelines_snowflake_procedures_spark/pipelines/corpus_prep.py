"""End-to-end training-corpus preparation orchestrator.

The reference's orchestration idiom (INGESTION_CODE_GENERATORS — chain
procedures, return a status envelope with an audit log,
Ingestion_Pipeline_Agent.sql:19-57) applied to the training-data
extensions: clean → split → chunk → budget as one chained pipeline
with the same SUCCESS/FAILED envelope shape.

Stage order is load-bearing at scale (documented per operator):
filter/dedup FIRST (shrinks the corpus before anything shuffles or
grows), split SECOND (rows, not chunks, get split — chunks of one
document must never straddle train/test: that's a leakage bug), chunk
LAST (the only data-growing stage).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AGENT_NAME = "CorpusPrepAgent"


def prepare_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.75,
    languages: tuple[str, ...] = ("en",),
    split_weights: dict[str, float] | None = None,
    chunk_tokens: int = 256,
    chunk_overlap: int = 32,
    seed: str = "split",
) -> dict[str, Any]:
    """Run clean → split → chunk → budget; return the reference-shaped
    envelope with per-stage row counts and the audit log.

    ``chunks`` and ``budget`` in the result are DataFrames (lazy —
    callers write or aggregate them); the envelope's counts are the
    only actions this function triggers.
    """
    from ..operators.corpus import (
        assign_split,
        chunk_documents,
        clean_corpus,
        token_budget,
    )

    start = _dt.datetime.now(_dt.timezone.utc)
    try:
        n_raw = df.count()
        cleaned = clean_corpus(
            df, text_col=text_col, id_col=id_col,
            min_quality=min_quality, languages=languages,
        )
        split = assign_split(cleaned, id_col=id_col, weights=split_weights, seed=seed)
        chunks = chunk_documents(
            split, text_col=text_col, id_col=id_col,
            chunk_tokens=chunk_tokens, overlap=chunk_overlap,
        )
        budget = token_budget(split, group_cols=("detected_lang", "split"))
        n_clean = split.count()
        n_chunks = chunks.count()
        end = _dt.datetime.now(_dt.timezone.utc)
        return {
            "status": "SUCCESS",
            "stages": {
                "raw_documents": n_raw,
                "cleaned_documents": n_clean,
                "kept_fraction": round(n_clean / max(n_raw, 1), 4),
                "chunks": n_chunks,
            },
            "split_counts": {
                r["split"]: r["n"]
                for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
            },
            "cleaned": split,
            "chunks": chunks,
            "budget": budget,
            "audit_log": {
                "agent_name": AGENT_NAME,
                "start_time": start.isoformat(),
                "end_time": end.isoformat(),
                "duration_seconds": round((end - start).total_seconds(), 4),
            },
        }
    except Exception as exc:  # noqa: BLE001 — error envelope (X7)
        return {"status": "FAILED", "error": str(exc), "agent_name": AGENT_NAME}
