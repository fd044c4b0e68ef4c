"""Poisson bootstrap — confidence intervals over data too big to
resample by index. The classical bootstrap draws n rows WITH
replacement per replicate, which requires global indexing and B full
passes; the Poisson bootstrap (the standard large-scale variant:
each row enters replicate r with an independent Poisson(1) weight)
needs neither — every row computes its own B weights locally, so all
B replicates accumulate in ONE pass, and the per-replicate row-count
difference from n is O(√n) noise the method absorbs.

No reference counterpart (the reference has no statistical-inference
surface; north-star extension). Public method: Poisson/online
bootstrap as described in e.g. Chamandy et al., "Estimating
uncertainty for massive data streams" (Google, 2012).

Determinism contract: weights derive from md5, not an RNG. One md5
per (row, 8-replicate block); the digest's two 15-hex-digit halves
parse to two 60-bit integers, each yielding four 15-bit uniforms by
shift-and-mask; each uniform maps to a Poisson(1) draw through the
integer-threshold inverse CDF in :func:`poisson1_cdf15` (CDF values
pre-scaled by 2^15 and floored, so the comparison is integer-exact
and restatable in any SQL engine). Weighted sums stay on integer
inputs (callers pass integer-unit measures, e.g. cents) — partial
sums are exact, hash-exact cross-engine.

Why this exact derivation: the naive "one conv per 4 hex digits"
costs b string-parses per row, and referencing that expression from
an 8-arm CASE duplicates it per arm — measured 60 s at sf0.1.
Two convs + eight integer shift/masks per digest keep the whole hot
path in cheap codegen arithmetic (measured ~6× faster end-to-end).

Scale shape: digests explode first (⌈b/8⌉ rows per input row), the
per-digest slots are PLAIN projected expressions, and the Poisson
CASE evaluates against the MATERIALIZED 15-bit column after the
second explode — so nothing expensive is ever inside a lambda or
duplicated across CASE arms. groupBy(replicate) looks like a B×
blow-up but map-side partial aggregation collapses each partition to
≤B rows before the exchange — the shuffle carries B × partitions
rows, and the final percentile rule runs over B rows on the driver
(the k-means/PQ "model state is driver metadata" contract).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def poisson1_cdf15(max_k: int = 8) -> list[int]:
    """Poisson(1) CDF thresholds scaled to 15-bit integers:
    ``T[k] = floor(P(X <= k) * 2^15)``. A 15-bit uniform ``u`` maps to
    the smallest k with ``u < T[k]`` (``max_k`` if none) — the
    integer-exact inverse-CDF both engines evaluate identically."""
    cum, term = 0.0, math.exp(-1.0)
    out = []
    for k in range(max_k):
        cum += term
        out.append(int(cum * 32768))
        term /= k + 1
    return out


def _poisson_weight(u15: Column, thresholds: list[int]) -> Column:
    """Inverse-CDF CASE over a 15-bit uniform. Call this on a
    MATERIALIZED column only: each WHEN arm re-references the input
    expression, so a compound ``u15`` would be re-evaluated per arm
    (the measured 3× regression this module's derivation avoids)."""
    w: Column = F.lit(len(thresholds))
    for k in reversed(range(len(thresholds))):
        w = F.when(u15 < F.lit(thresholds[k]), F.lit(k)).otherwise(w)
    return w


def _digest_halves(key: Column, j: "Column | int", seed: str) -> tuple[Column, Column]:
    """The two 60-bit integers of block j's md5 digest."""
    jj = j if isinstance(j, Column) else F.lit(j)
    h = F.md5(F.concat(key.cast("string"), F.lit(f"|{seed}|"), jj.cast("string")))
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long"),
        F.conv(F.substring(h, 16, 15), 16, 10).cast("long"),
    )


def _slot_u15(u1: Column, u2: Column, s: int) -> Column:
    """15-bit uniform for slot s (0-7) of a digest's two halves."""
    src = u1 if s < 4 else u2
    return F.shiftright(src, 15 * (s % 4)).bitwiseAND(F.lit(32767))


def poisson_weights(key: Column, b: int, seed: str = "boot") -> Column:
    """Array of ``b`` deterministic Poisson(1) weights for a row key —
    the readable array-form SPEC of the draw scheme (asserted
    draw-identical to the hot-path :func:`poisson_draws` in tests).
    Narrow expression; prefer :func:`poisson_draws` on data-sized
    inputs (lambda-interpreted md5 makes this form slower)."""
    thresholds = poisson1_cdf15()
    blocks = (b + 7) // 8
    cols = []
    for j in range(blocks):
        u1, u2 = _digest_halves(key, j, seed)
        for s in range(8):
            cols.append(_poisson_weight(_slot_u15(u1, u2, s), thresholds))
    return F.slice(F.array(*cols), 1, b)


def poisson_draws(df: DataFrame, key_col: str, b: int, seed: str = "boot") -> DataFrame:
    """Exploded hot-path form of :func:`poisson_weights`: appends
    ``(__r, __w)`` — one row per (input row, replicate). The ⌈b/8⌉
    digests explode first; the two convs and eight shift/mask slots
    are plain projections; the inverse-CDF CASE runs on the
    materialized 15-bit column after the second explode. Everything
    past the digest transform is whole-stage-codegen arithmetic."""
    thresholds = poisson1_cdf15()
    blocks = (b + 7) // 8
    ks = F.col(key_col).cast("string")
    # explode the block index FIRST, then compute the digest as a plain
    # projection on the exploded row: md5 inside the transform lambda
    # was interpreted per element (the repo's measured md5-in-lambda
    # trap); as a projection it runs in whole-stage codegen
    d1 = df.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(blocks - 1))).alias("__j")
    ).withColumn(
        "__h", F.md5(F.concat(ks, F.lit(f"|{seed}|"), F.col("__j").cast("string")))
    )
    u1 = F.conv(F.substring(F.col("__h"), 1, 15), 16, 10).cast("long")
    u2 = F.conv(F.substring(F.col("__h"), 16, 15), 16, 10).cast("long")
    d1 = d1.withColumns({"__u1": u1, "__u2": u2})
    slots = F.array(
        *[_slot_u15(F.col("__u1"), F.col("__u2"), s) for s in range(8)]
    )
    d2 = d1.select("*", F.posexplode(slots).alias("__s", "__u"))
    return (
        d2.withColumn("__w", _poisson_weight(F.col("__u"), thresholds))
        .withColumn("__r", F.col("__j") * 8 + F.col("__s"))
        .filter(F.col("__r") < b)
        .drop("__j", "__h", "__s", "__u", "__u1", "__u2")
    )


def grouped_replicate_partials(
    df: DataFrame,
    group_col: str,
    key_col: str,
    value_col: str,
    b: int = 200,
    seed: str = "boot",
) -> "tuple[list, list]":
    """The SUFFICIENT STATISTICS both CI forms derive from, collected:
    per-(group, replicate) integer weight partials ``(g, r, swx, sw)``
    and per-group exact totals ``(g, n, s)``. The Poisson draws are a
    pure function of (key, seed) — independent of any grouping — so
    ONE grouped pass serves the per-group CIs directly and the global
    CI by exact integer re-aggregation (summing the group partials per
    replicate is bit-identical to a global groupBy(__r)). Collected
    state is groups × B rows — driver metadata for dimension-like
    groups."""
    w = F.col("__w")
    per = [
        (p["__g"], p["__r"], p["__swx"], p["__sw"])
        for p in poisson_draws(
            df.select(
                F.col(key_col),
                F.col(group_col).alias("__g"),
                F.col(value_col).alias("__x"),
            ),
            key_col,
            b,
            seed,
        )
        .groupBy("__g", "__r")
        .agg(F.sum(w * F.col("__x")).alias("__swx"), F.sum(w).alias("__sw"))
        .collect()
    ]
    totals = [
        (t["__g"], int(t["n"]), t["s"])
        for t in df.groupBy(F.col(group_col).alias("__g"))
        .agg(F.count("*").alias("n"), F.sum(value_col).alias("s"))
        .collect()
    ]
    return per, totals


def _rank_rule(b: int, alpha: float, n_means: int) -> "tuple[int, int]":
    lo_rn = max(math.ceil((alpha / 2) * b), 1)
    hi_rn = min(math.ceil((1 - alpha / 2) * b), n_means)
    return lo_rn, hi_rn


def global_ci_from_partials(
    per: list, totals: list, b: int = 200, alpha: float = 0.05
) -> "tuple[int, float, float, float]":
    """:func:`bootstrap_mean_ci`'s result from grouped partials: sum
    the integer partials across groups per replicate (exact — long
    addition commutes with the distributed SUM), then the same
    ordered-means rank rule."""
    agg: dict = {}
    for _g, r, swx, sw in per:
        a = agg.get(r)
        agg[r] = (swx, sw) if a is None else (a[0] + swx, a[1] + sw)
    means = sorted((swx / sw, r) for r, (swx, sw) in agg.items() if sw)
    lo_rn, hi_rn = _rank_rule(b, alpha, len(means))
    n = sum(t[1] for t in totals)
    s = sum(t[2] for t in totals)
    return (n, s / n, means[lo_rn - 1][0], means[hi_rn - 1][0])


def group_cis_from_partials(
    per: list, totals: list, b: int = 200, alpha: float = 0.05
) -> "list[tuple]":
    """:func:`bootstrap_group_mean_ci`'s result from grouped partials."""
    by_group: dict = {}
    for g, r, swx, sw in per:
        if sw:
            by_group.setdefault(g, []).append((swx / sw, r))
    tot = {t[0]: t for t in totals}
    out = []
    for g in sorted(by_group):
        means = sorted(by_group[g])
        lo_rn, hi_rn = _rank_rule(b, alpha, len(means))
        _, n, s = tot[g]
        out.append((g, n, s / n, means[lo_rn - 1][0], means[hi_rn - 1][0]))
    return out


def bootstrap_mean_ci(
    df: DataFrame,
    key_col: str,
    value_col: str,
    b: int = 200,
    alpha: float = 0.05,
    seed: str = "boot",
) -> "tuple[int, float, float, float]":
    """Percentile-bootstrap CI for the mean of an INTEGER-unit value
    column: returns ``(n_rows, mean, ci_lo, ci_hi)`` (unrounded —
    callers round for emission). Replicate means are ordered with the
    replicate id as tiebreak and the bounds picked by the integer
    rank rule rn = ceil(q·b) — deterministic on any engine."""
    per, totals = grouped_replicate_partials(
        df.withColumn("__one", F.lit(1)), "__one", key_col, value_col, b, seed
    )
    return global_ci_from_partials(per, totals, b, alpha)


def poisson_case_sql(u15_sql: str, max_k: int = 8) -> str:
    """The SQL restatement of :func:`_poisson_weight` over a 15-bit
    uniform expression — single source for oracle queries so the
    thresholds cannot drift from the Spark side."""
    parts = [
        f"WHEN {u15_sql} < {t} THEN {k}"
        for k, t in enumerate(poisson1_cdf15(max_k))
    ]
    return "CASE " + " ".join(parts) + f" ELSE {max_k} END"


def bootstrap_group_mean_ci(
    df: DataFrame,
    group_col: str,
    key_col: str,
    value_col: str,
    b: int = 200,
    alpha: float = 0.05,
    seed: str = "boot",
) -> "list[tuple]":
    """Per-group percentile-bootstrap mean CIs in one pass: the
    :func:`bootstrap_mean_ci` algebra with the group key carried
    through the replicate aggregation, so state is groups × B (map-
    side combined the same way). Returns
    ``[(group, n_rows, mean, ci_lo, ci_hi)]`` sorted by group,
    unrounded. The percentile rule runs per group over its B means —
    groups × B driver-side rows (metadata-sized for dimension-like
    group columns; for high-cardinality groups, window the rank rule
    instead of collecting)."""
    per, totals = grouped_replicate_partials(
        df, group_col, key_col, value_col, b, seed
    )
    return group_cis_from_partials(per, totals, b, alpha)
