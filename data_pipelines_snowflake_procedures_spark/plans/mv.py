"""Materialized-rollup query rewriting (aggregate-subsumption MV match).

The OLAP-engine capability behind every warehouse's "materialized view
rewrite" (public knowledge: Oracle/Calcite aggregate rollup matching,
Snowflake/BigQuery MV smart-tuning): a GROUP BY query whose grouping
keys are a SUBSET of a materialized rollup's keys — and whose measures
are derivable from the rollup's mergeable state — can be answered by
re-aggregating the (tiny) rollup instead of scanning the (huge) fact
table. At 100 TB this is the difference between a key-count-sized scan
and a full-table pass; correctness rests on the same partial/merge
algebra operators/incremental.py already proves (count→sum, sum→sum,
min→min, max→max, avg derived from sum/n at finalize time only).

Design:
- ``RollupView`` wraps a rollup state in ``partial_agg`` shape
  (keys…, n, sum, min, max) plus the fact-table name, key set, and
  measure column it summarizes.
- ``AggQuery`` is a tiny declarative aggregate spec: fact table,
  grouping keys, measures over ONE column (count/sum/avg/min/max), and
  optional equality filters.
- ``try_rewrite`` returns the rewritten DataFrame, or None when no
  registered view subsumes the query (unknown table, keys not a
  subset, filter column not materialized, different measure column,
  or a non-derivable measure like exact distinct).
- ``answer`` falls back to the fact table when no view matches — the
  rewrite must be an optimization, never a semantics change, which is
  what the DuckDB oracle on the registry entry pins.

Filters are restricted to equality on materialized KEY columns: a
predicate on a non-key column would need rows the rollup has already
collapsed — exactly the classic containment condition for aggregate MV
matching.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: measures derivable from partial_agg state, and their finalizers
_DERIVABLE = ("count", "sum", "avg", "min", "max")


@dataclass(frozen=True)
class RollupView:
    """A materialized rollup: ``state`` must be in
    operators/incremental.py ``partial_agg`` shape —
    (keys…, n, sum, min, max) over ``value_col`` of ``table``."""

    name: str
    table: str
    keys: tuple[str, ...]
    value_col: str
    state: DataFrame


@dataclass(frozen=True)
class AggQuery:
    """Declarative single-table aggregate: measures are (fn, alias)
    pairs over ``value_col`` (fn="count" counts rows)."""

    table: str
    group_by: tuple[str, ...]
    value_col: str
    measures: tuple[tuple[str, str], ...]
    eq_filters: tuple[tuple[str, Any], ...] = field(default=())
    decimals: int = 2


def _match(q: AggQuery, v: RollupView) -> bool:
    if q.table != v.table or q.value_col != v.value_col:
        return False
    if not set(q.group_by) <= set(v.keys):
        return False
    if not {c for c, _ in q.eq_filters} <= set(v.keys):
        return False
    return all(fn in _DERIVABLE for fn, _ in q.measures)


def _finalize_exprs(q: AggQuery) -> list:
    out = []
    for fn, alias in q.measures:
        if fn == "count":
            out.append(F.sum("n").cast("long").alias(alias))
        elif fn == "sum":
            out.append(F.round(F.sum("sum"), q.decimals).alias(alias))
        elif fn == "avg":
            out.append(
                F.round(F.sum("sum") / F.sum("n"), q.decimals).alias(alias)
            )
        elif fn == "min":
            out.append(F.round(F.min("min"), q.decimals).alias(alias))
        elif fn == "max":
            out.append(F.round(F.max("max"), q.decimals).alias(alias))
    return out


def try_rewrite(q: AggQuery, views: list[RollupView]) -> DataFrame | None:
    """Rewrite ``q`` against the first subsuming rollup, or None.
    The rewritten plan scans |distinct keys| state rows — never the
    fact table."""
    for v in views:
        if not _match(q, v):
            continue
        df = v.state
        for col, val in q.eq_filters:
            df = df.filter(F.col(col) == F.lit(val))
        return df.groupBy(*q.group_by).agg(*_finalize_exprs(q))
    return None


def answer(
    q: AggQuery, views: list[RollupView], fact: DataFrame
) -> tuple[DataFrame, bool]:
    """(result, used_view): the rewrite when a view subsumes the
    query, else the from-scratch aggregate over ``fact`` — identical
    column names either way, so callers can ignore the flag."""
    rewritten = try_rewrite(q, views)
    if rewritten is not None:
        return rewritten, True
    df = fact
    for col, val in q.eq_filters:
        df = df.filter(F.col(col) == F.lit(val))
    v = F.col(q.value_col)
    exprs = []
    for fn, alias in q.measures:
        if fn == "count":
            exprs.append(F.count("*").cast("long").alias(alias))
        elif fn == "avg":
            exprs.append(
                F.round(F.sum(v) / F.count("*"), q.decimals).alias(alias)
            )
        else:
            exprs.append(
                F.round(getattr(F, fn)(v), q.decimals).alias(alias)
            )
    return df.groupBy(*q.group_by).agg(*exprs), False


@dataclass(frozen=True)
class KmvDistinctView:
    """A sketch-backed rollup for approximate COUNT(DISTINCT …): the
    bottom-k md5 hashes of ``value_col`` per key combination
    (operators/sketch.py::kmv_sketch output — (keys…, h, rk) rows).
    This is the Druid/warehouse pattern of materializing a mergeable
    distinct sketch inside the rollup: exact distincts do NOT roll up
    (they need the raw value set), but bottom-k state re-merges under
    any key-subset regrouping by re-taking the k smallest."""

    name: str
    table: str
    keys: tuple[str, ...]
    value_col: str
    k: int
    state: DataFrame


def try_rewrite_distinct(
    q: AggQuery, views: list[KmvDistinctView]
) -> DataFrame | None:
    """Rewrite a single-measure ``("distinct_approx", alias)`` query
    against a KMV view: union the matching groups' sketch rows,
    re-take the bottom k per output group, and apply the KMV
    estimator ((k-1)·2^60 / h_k, exact below k). Returns None unless
    the view subsumes the query (same containment conditions as
    :func:`try_rewrite`)."""
    from ..operators.sketch import kmv_estimate, kmv_merge

    if len(q.measures) != 1 or q.measures[0][0] != "distinct_approx":
        return None
    alias = q.measures[0][1]
    for v in views:
        if q.table != v.table or q.value_col != v.value_col:
            continue
        if not set(q.group_by) <= set(v.keys):
            continue
        if not {c for c, _ in q.eq_filters} <= set(v.keys):
            continue
        df = v.state
        for col, val in q.eq_filters:
            df = df.filter(F.col(col) == F.lit(val))
        kept = kmv_merge(df, list(q.group_by), k=v.k)
        return kmv_estimate(kept, list(q.group_by), k=v.k).withColumnRenamed(
            "est_distinct", alias
        )
    return None


@dataclass(frozen=True)
class BitmapDistinctView:
    """An EXACT distinct-count rollup: chunked bitmaps of
    ``value_col`` per key combination (operators/bitmap.py). The
    exact counterpart of :class:`KmvDistinctView` — bitmap state
    OR-folds under any key-subset regrouping with NO estimation
    error, at the cost of O(universe/8) bytes per key combo instead
    of O(k) rows. A warehouse keeps both: bitmaps where member-level
    exactness (or erasure) is required, KMV where cardinality alone
    is enough."""

    name: str
    table: str
    keys: tuple[str, ...]
    value_col: str
    chunk_bits: int
    state: DataFrame


def try_rewrite_distinct_exact(
    q: AggQuery, views: "list[BitmapDistinctView]"
) -> DataFrame | None:
    """Rewrite a single-measure ``("distinct_exact", alias)`` query
    against a bitmap view: filter the matching view's chunk rows,
    OR-fold under the query's (coarser) grouping, and sum the
    per-chunk popcounts — the fact table is never rescanned and the
    answer is exact. Same containment conditions as
    :func:`try_rewrite`."""
    from ..operators.bitmap import bitmap_merge

    if len(q.measures) != 1 or q.measures[0][0] != "distinct_exact":
        return None
    alias = q.measures[0][1]
    for v in views:
        if q.table != v.table or q.value_col != v.value_col:
            continue
        if not set(q.group_by) <= set(v.keys):
            continue
        if not {c for c, _ in q.eq_filters} <= set(v.keys):
            continue
        df = v.state
        for col, val in q.eq_filters:
            df = df.filter(F.col(col) == F.lit(val))
        folded = bitmap_merge(
            df.select(*q.group_by, "chunk", "bm", "card"), list(q.group_by)
        )
        return folded.groupBy(*q.group_by).agg(
            F.sum("card").cast("long").alias(alias)
        )
    return None
