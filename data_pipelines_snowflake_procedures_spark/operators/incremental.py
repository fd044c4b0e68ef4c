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

Non-mergeable metrics split two ways: exact distinct goes to the
sketch operators (operators/sketch.py HLL / CMS), while PERCENTILES
become mergeable once values bin to an integer grid —
:func:`partial_hist` / :func:`merge_hists` keep per-key histograms
(O(bins) state) and :func:`quantile_from_hist` finalizes any quantile
with DuckDB ``quantile_disc`` semantics, exactly reproducible from
merged partials: ``quantile(merge(h(A), h(B))) == quantile(h(A ∪ B))``
bit-for-bit, because histograms add.

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


def partial_hist(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str | Column,
    scale: int = 100,
) -> DataFrame:
    """One batch → per-key integer-bin histogram state
    ``(keys…, bin, cnt)``: values round onto a 1/scale grid (exact for
    fixed-decimal columns; the binning resolution is the declared
    approximation otherwise). State is O(keys × bins) — the mergeable
    form percentiles need at 100 TB, where buffering raw values per
    group is the thing that cannot scale."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    return (
        df.withColumn("bin", F.round(v * scale).cast("long"))
        .groupBy(*keys, "bin")
        .agg(F.count("*").alias("cnt"))
    )


def merge_hists(hists: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Fold histogram states: associative bin-wise addition — the
    property that makes binned percentiles incrementally
    maintainable."""
    unioned = reduce(lambda a, b: a.unionByName(b), hists)
    return unioned.groupBy(*keys, "bin").agg(F.sum("cnt").alias("cnt"))


def quantile_from_hist(
    hist: DataFrame,
    keys: Sequence[str],
    q: float,
    scale: int = 100,
    out: str = "quantile",
) -> DataFrame:
    """Finalize one quantile from histogram state with DISCRETE
    semantics (DuckDB ``quantile_disc``: the value at rank
    ``ceil(q·n)`` — the smallest bin whose cumulative count reaches
    it), via a cumulative window over the ≤bins rows per key. Exactly
    reproducible from merged partials; the oracle restates it as
    ``quantile_disc`` over the same integer grid."""
    from pyspark.sql import Window

    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(*keys)
    # rank = ceil(q·n) in EXACT arithmetic (DuckDB's rule; verified
    # empirically across q/n) — double multiply alone gets it wrong at
    # exact multiples (0.95*20 = 19.000000000000004 → ceil 20), so
    # subtract an epsilon far below any honest fractional part.
    rank = F.ceil(F.lit(float(q)) * F.col("n") - F.lit(1e-9))
    return (
        hist.withColumn("cum", F.sum("cnt").over(w_cum))
        .withColumn("n", F.sum("cnt").over(w_tot))
        .filter(F.col("cum") >= rank)
        .groupBy(*keys)
        .agg((F.min("bin") / scale).alias(out))
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


def join_delta(
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """Incremental view maintenance for an INNER equi-join under
    inserts: the delta of ``(A ∪ ΔA) ⋈ (B ∪ ΔB)`` relative to
    ``A ⋈ B`` is exactly

        ``ΔA ⋈ (B ∪ ΔB)  ∪  A ⋈ ΔB``

    (the ΔA⋈ΔB cross term lands in the first leg — the standard
    delta-rule factoring that counts every new pair once).

    Why this is the production shape at 100 TB: maintaining a huge
    join result for a small daily delta costs two delta-sided joins —
    each has one tiny side, so Catalyst/AQE broadcasts the delta and
    neither old relation is ever shuffled (and with the old side
    bucket-pruned on the join key, not even fully scanned). A
    from-scratch re-join shuffles both full inputs every run.

    Append the returned rows to the maintained result; the invariant
    ``old_result ∪ join_delta(...) == (A∪ΔA) ⋈ (B∪ΔB)`` is what the
    registry oracle proves hash-exactly.
    """
    on = list(on)
    b_new = b_old.unionByName(delta_b)
    return delta_a.join(b_new, on, "inner").unionByName(
        a_old.join(delta_b, on, "inner")
    )


def maintain_join(
    result_old: DataFrame,
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """Fold one batch into a maintained inner-join result: the old
    result plus :func:`join_delta`. Associative over successive
    batches — folding (ΔA₁, ΔB₁) then (ΔA₂, ΔB₂) equals the
    from-scratch join of the final relations."""
    return result_old.unionByName(
        join_delta(a_old, delta_a, b_old, delta_b, on)
    )


def consolidate_bag(df: DataFrame, mult: str = "m") -> DataFrame:
    """Canonical bag form: one row per distinct tuple with net
    multiplicity, zero-multiplicity tuples dropped. GroupBy over all
    non-mult columns — state-sized, and the only shuffle the signed
    fold needs after its delta joins."""
    cols = [c for c in df.columns if c != mult]
    return (
        df.groupBy(*cols)
        .agg(F.sum(mult).cast("long").alias(mult))
        .filter(F.col(mult) != 0)
    )


def join_delta_signed(
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str],
    mult: str = "m",
) -> DataFrame:
    """Counting-based IVM for an inner equi-join under INSERTS AND
    DELETES (the classical counting algorithm, Gupta-Mumick-
    Subrahmanian 1993): relations are bags carrying a signed
    multiplicity column ``mult`` (+1 insert, -1 delete); the join is
    bilinear in multiplicities (result m = mₐ·m_b), so the same
    factoring as :func:`join_delta` applies with signs:

        ``Δ(A⋈B) = ΔA ⋈ (B ∪ ΔB)  ∪  A ⋈ ΔB``

    A deletion flows through as a negative term that cancels exactly
    the pairs the deleted tuple once produced; net-zero tuples vanish
    at :func:`consolidate_bag`. Both delta joins are delta-sided
    (broadcast at scale), identical to the insert-only form — deletes
    cost no more than inserts.
    """
    on = list(on)
    ma, mb = f"__{mult}_a", f"__{mult}_b"
    a_cols = [c for c in a_old.columns if c != mult]
    b_cols = [c for c in b_old.columns if c not in on and c != mult]
    prod = (F.col(ma) * F.col(mb)).cast("long").alias(mult)

    def _join(left: DataFrame, right: DataFrame) -> DataFrame:
        return (
            left.withColumnRenamed(mult, ma)
            .join(right.withColumnRenamed(mult, mb), on, "inner")
            .select(*a_cols, *b_cols, prod)
        )

    b_new = b_old.unionByName(delta_b)
    return _join(delta_a, b_new).unionByName(_join(a_old, delta_b))


def maintain_join_signed(
    result_old: DataFrame,
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str],
    mult: str = "m",
) -> DataFrame:
    """Fold one signed batch into a maintained join result and
    re-canonicalize. ``consolidate_bag`` is where delete terms
    annihilate their insert counterparts."""
    return consolidate_bag(
        result_old.unionByName(
            join_delta_signed(a_old, delta_a, b_old, delta_b, on, mult)
        ),
        mult,
    )


def partial_agg_signed(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str | Column,
    sign_col: str = "sign",
) -> DataFrame:
    """One signed batch (rows carry ``sign`` = +1 insert / −1 delete) →
    signed partial state ``(keys…, n, sum)``.

    Only the DISTRIBUTIVE metrics (count, sum — and avg derived from
    them) survive deletes in O(keys) state: subtracting a deleted
    row's contribution is just signed addition. min/max do NOT — the
    deletion of the current minimum cannot be undone from (min) state
    alone (the classic distributive/algebraic/holistic split). Under
    deletes, min/max/percentiles all route through the signed
    HISTOGRAM state (:func:`partial_hist_signed`), where a delete
    decrements its value's bin and every order statistic remains
    recoverable."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    s = F.col(sign_col).cast("long")
    return df.groupBy(*keys).agg(
        F.sum(s).alias("n"),
        F.sum(s.cast("double") * v).alias("sum"),
    )


def merge_partials_signed(
    partials: Sequence[DataFrame], keys: Sequence[str]
) -> DataFrame:
    """Fold signed states (associative sum per key) and CONSOLIDATE:
    keys whose net count reaches zero leave the state entirely, so
    state size tracks the LIVE key set, not insert history."""
    unioned = reduce(lambda a, b: a.unionByName(b), partials)
    return (
        unioned.groupBy(*keys)
        .agg(F.sum("n").alias("n"), F.sum("sum").alias("sum"))
        .filter(F.col("n") != 0)
    )


def partial_hist_signed(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str | Column,
    sign_col: str = "sign",
    scale: int = 100,
) -> DataFrame:
    """Signed histogram state: a delete decrements its value's bin.
    After merging (:func:`merge_hists_signed`), every order statistic
    — min, max, any quantile via :func:`quantile_from_hist` — is
    exactly recoverable, which is how HOLISTIC metrics survive deletes
    without re-reading history. Contract: deletes must not exceed
    prior inserts per (key, bin); a negative merged bin means the
    caller deleted rows that were never inserted."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    s = F.col(sign_col).cast("long")
    return (
        df.withColumn("bin", F.round(v * scale).cast("long"))
        .groupBy(*keys, "bin")
        .agg(F.sum(s).alias("cnt"))
    )


def merge_hists_signed(
    hists: Sequence[DataFrame], keys: Sequence[str]
) -> DataFrame:
    """Fold signed histograms bin-wise and drop emptied bins."""
    unioned = reduce(lambda a, b: a.unionByName(b), hists)
    return (
        unioned.groupBy(*keys, "bin")
        .agg(F.sum("cnt").alias("cnt"))
        .filter(F.col("cnt") != 0)
    )
