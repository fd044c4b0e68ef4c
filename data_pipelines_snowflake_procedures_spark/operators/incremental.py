"""Incremental aggregate maintenance: partial-aggregate build + merge.

The production shape of every "daily rollup" pipeline at 100 TB: you
never re-aggregate history — you keep PARTIAL aggregates per grouping
key (count / sum / min / max, the commutative-associative states) and
fold each new batch's partials in. This module makes that explicit:

* :func:`partial_agg` — one batch → its partial-aggregate state.
* :func:`merge_partials` — any number of partial states → the combined
  state (an associative groupBy-sum/min/max over state-sized rows, not
  raw data).
* :func:`finalize` — state → presentation metrics (avg = sum/count).

The invariant the oracle checks: ``finalize(merge(partial(A),
partial(B))) == finalize(partial(A ∪ B))`` — the same algebra Spark's
own partial/final aggregation uses inside one query, lifted to the
PIPELINE level where the batches arrive days apart.

Non-mergeable metrics (exact distinct, exact percentiles) are exactly
the ones this scheme cannot maintain — use the sketch operators
(operators/sketch.py HLL / CMS) for those; that boundary is the whole
reason sketches exist.

Reference anchor: the generated GROUP BY summaries
(CODE_GENERATOR.sql:75-87) recomputed from scratch per run; this is
the Spark-first incremental form.
"""

from __future__ import annotations

from functools import reduce
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def partial_agg(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str | Column,
) -> DataFrame:
    """One batch → partial state per key: (keys…, n, sum, min, max)."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    return df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(v).alias("sum"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
    )


def merge_partials(partials: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Fold partial states: associative, order-independent, and sized
    by |keys|, never by the raw data the states summarize."""
    unioned = reduce(lambda a, b: a.unionByName(b), partials)
    return unioned.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum").alias("sum"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
    )


def finalize(state: DataFrame, keys: Sequence[str], decimals: int = 4) -> DataFrame:
    """State → presentation metrics; avg derives from (sum, n) so it
    stays exactly mergeable even though avg itself is not."""
    return state.select(
        *keys,
        F.col("n").cast("long").alias("n_rows"),
        F.round("sum", decimals).alias("sum_value"),
        F.round(F.col("sum") / F.col("n"), decimals).alias("avg_value"),
        F.round("min", decimals).alias("min_value"),
        F.round("max", decimals).alias("max_value"),
    )
