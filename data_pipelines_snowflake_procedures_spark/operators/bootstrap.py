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
per (row, 8-replicate block) yields eight 16-bit uniforms (4 hex
digits each); each uniform maps to a Poisson(1) draw through the
integer-threshold inverse CDF in :func:`poisson1_cdf16` (CDF values
pre-scaled by 2^16 and floored, so the comparison is integer-exact
and restatable in any SQL engine). Weighted sums stay on integer
inputs (callers pass integer-unit measures, e.g. cents) — partial
sums are exact, hash-exact cross-engine.

Scale shape: the weight array is a narrow expression (no UDF, no
shuffle); ``posexplode`` + ``groupBy(replicate)`` LOOKS like a B×
blow-up but map-side partial aggregation collapses each partition to
≤B rows before the exchange, so the shuffle carries B × partitions
rows — B-sized state, corpus never moves. The final percentile rule
runs over B rows on the driver (the k-means/PQ "model state is
driver metadata" contract).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def poisson1_cdf16(max_k: int = 8) -> list[int]:
    """Poisson(1) CDF thresholds scaled to 16-bit integers:
    ``T[k] = floor(P(X <= k) * 2^16)``. A 16-bit uniform ``u`` maps to
    the smallest k with ``u < T[k]`` (``max_k`` if none) — the
    integer-exact inverse-CDF both engines evaluate identically."""
    cum, term = 0.0, math.exp(-1.0)
    out = []
    for k in range(max_k):
        cum += term
        out.append(int(cum * 65536))
        term /= k + 1
    return out


def _poisson_weight(u16: Column, thresholds: list[int]) -> Column:
    w: Column = F.lit(len(thresholds))
    for k in reversed(range(len(thresholds))):
        w = F.when(u16 < F.lit(thresholds[k]), F.lit(k)).otherwise(w)
    return w


def poisson_weights(key: Column, b: int, seed: str = "boot") -> Column:
    """Array of ``b`` deterministic Poisson(1) weights for a row key:
    block j's md5(key|seed|j) supplies eight 16-bit uniforms (hex
    digits 4j+1..4j+4 of the digest), each inverse-CDF-mapped. Narrow
    expression — stays in codegen, ⌈b/8⌉ md5 calls per row."""
    thresholds = poisson1_cdf16()
    blocks = (b + 7) // 8
    ks = key.cast("string")
    arr = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(blocks - 1)),
            lambda j: F.transform(
                F.sequence(F.lit(0), F.lit(7)),
                lambda s: _poisson_weight(
                    F.conv(
                        F.md5(
                            F.concat(ks, F.lit(f"|{seed}|"), j.cast("string"))
                        ).substr(s * F.lit(4) + 1, F.lit(4)),
                        16,
                        10,
                    ).cast("long"),
                    thresholds,
                ),
            ),
        )
    )
    return F.slice(arr, 1, b)


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
    w = F.col("__w")
    per = (
        df.select(
            F.col(value_col).alias("__x"),
            F.posexplode(poisson_weights(F.col(key_col), b, seed)).alias(
                "__r", "__w"
            ),
        )
        .groupBy("__r")
        .agg(
            F.sum(w * F.col("__x")).alias("__swx"),
            F.sum(w).alias("__sw"),
        )
        .collect()
    )
    means = sorted(
        (p["__swx"] / p["__sw"], p["__r"]) for p in per if p["__sw"]
    )
    lo_rn = max(math.ceil((alpha / 2) * b), 1)
    hi_rn = min(math.ceil((1 - alpha / 2) * b), len(means))
    totals = df.agg(
        F.count("*").alias("n"), F.sum(value_col).alias("s")
    ).first()
    return (
        int(totals["n"]),
        totals["s"] / totals["n"],
        means[lo_rn - 1][0],
        means[hi_rn - 1][0],
    )


def poisson_case_sql(u16_sql: str, max_k: int = 8) -> str:
    """The SQL restatement of :func:`_poisson_weight` over a 16-bit
    uniform expression — single source for oracle queries so the
    thresholds cannot drift from the Spark side."""
    parts = [
        f"WHEN {u16_sql} < {t} THEN {k}"
        for k, t in enumerate(poisson1_cdf16(max_k))
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
    w = F.col("__w")
    per = (
        df.select(
            F.col(group_col).alias("__g"),
            F.col(value_col).alias("__x"),
            F.posexplode(poisson_weights(F.col(key_col), b, seed)).alias(
                "__r", "__w"
            ),
        )
        .groupBy("__g", "__r")
        .agg(F.sum(w * F.col("__x")).alias("__swx"), F.sum(w).alias("__sw"))
        .collect()
    )
    by_group: dict = {}
    for p in per:
        if p["__sw"]:
            by_group.setdefault(p["__g"], []).append(
                (p["__swx"] / p["__sw"], p["__r"])
            )
    totals = {
        t["__g"]: t
        for t in df.groupBy(F.col(group_col).alias("__g"))
        .agg(F.count("*").alias("n"), F.sum(value_col).alias("s"))
        .collect()
    }
    out = []
    for g in sorted(by_group):
        means = sorted(by_group[g])
        lo_rn = max(math.ceil((alpha / 2) * b), 1)
        hi_rn = min(math.ceil((1 - alpha / 2) * b), len(means))
        t = totals[g]
        out.append(
            (g, int(t["n"]), t["s"] / t["n"],
             means[lo_rn - 1][0], means[hi_rn - 1][0])
        )
    return out
