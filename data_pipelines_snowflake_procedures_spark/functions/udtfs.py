"""Python UDTF showcase (PySpark 4 ``pyspark.sql.functions.udtf``).

A user-defined TABLE function: one input row → many output rows, usable
in SQL as a lateral table reference. The demo splits text into
sentences with positions — the per-row expansion shape used for
citation spans, chunk provenance, and alignment tasks.

Hot-path note (same stance as the applyInPandas surfaces): a UDTF
executes row-at-a-time Python, so it is a SURFACE for logic that
cannot be expressed as columns — the repo's chunkers/tokenizers on the
actual corpus paths use native ``posexplode``/``split`` expressions
(operators/corpus.py, operators/text.py). Registered in tests; not in
any registry hot path.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql.functions import udtf

_SENTENCE_END = re.compile(r"(?<=[.!?])\s+")


@udtf(returnType="pos INT, sentence STRING, n_words INT")
class SentenceSplit:
    """``SELECT s.* FROM docs, LATERAL sentence_split(text) s`` —
    yields (position, sentence, word count) per sentence."""

    def eval(self, text: str) -> Iterator[tuple]:
        if not text:
            return
        for pos, sent in enumerate(
            s for s in _SENTENCE_END.split(text.strip()) if s
        ):
            yield pos, sent, len(sent.split())


def register_udtfs(spark) -> None:
    """Idempotently register the demo UDTFs with this session."""
    spark.udtf.register("sentence_split", SentenceSplit)
