"""2-D Pareto frontier (skyline query) — "best trade-off" row sets:
all rows not dominated by any other row, where dominance means
no-worse on both axes and strictly better on at least one (here:
lower ``x`` is better, higher ``y`` is better; flip signs upstream
for other orientations).

No reference counterpart (the reference's 8 stored procedures have no
preference-query surface — this is a north-star analytics extension);
the skyline operator itself is textbook (Börzsönyi et al., ICDE 2001).

Scale design — the naive formulation is an all-pairs anti-join
(O(n²) — the DuckDB oracle states it that way on purpose); the Spark
plan is the sorted-scan equivalence: a point survives iff its ``y``
strictly exceeds the running max of ``y`` over all strictly-smaller
``x``. Computing a running max with a single global window would
serialize on one task, so the prefix max is a **segmented scan**
(classic parallel-prefix decomposition):

1. ``groupBy(x).max(y)`` — one shuffle that collapses the corpus to
   one candidate per distinct x (equal-x rows can only survive at the
   per-x max y; everything below it is dominated in-place).
2. Candidates are range-bucketed on x (fixed-width over the observed
   [min, max] — a 2-value metadata collect); the strict-prefix max
   WITHIN a bucket is a window partitioned by bucket — B-way
   parallel, never a single-partition sort.
3. Per-bucket maxima (B rows, driver-side metadata) fold into an
   EXCLUSIVE prefix max per bucket that rides back as a literal
   CASE expression — the cross-bucket carry of the scan.
4. Survivors re-join the input on (x, y) to recover full rows; the
   frontier is at most |distinct y| points, so the join back
   broadcasts.

Determinism: comparisons only (no float arithmetic), so Spark and any
SQL engine agree bit-exactly on the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pareto_frontier_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Rows of ``df`` on the (minimize ``x_col``, maximize ``y_col``)
    Pareto frontier. Duplicate (x, y) points are all kept (neither
    strictly dominates the other). Output columns = input columns.

    ``n_buckets`` sizes the segmented scan: candidate running-max
    parallelism is B-way; per-bucket candidate count is
    |distinct x| / B for a roughly uniform x (range-bucketed). At
    100 TB raise B with the cluster — the driver carry stays B
    doubles."""
    x, y = F.col(x_col).cast("double"), F.col(y_col).cast("double")

    # 1. one candidate per distinct x (the only per-x survivor height)
    cand = df.groupBy(x.alias("__x")).agg(F.max(y).alias("__ymax"))

    # 2. range buckets over observed [lo, hi] — 2-value metadata collect
    lo, hi = df.agg(F.min(x), F.max(x)).first()
    if lo is None:  # empty input
        return df
    width = (float(hi) - float(lo)) / n_buckets or 1.0
    bucket = F.least(
        F.floor((F.col("__x") - F.lit(float(lo))) / F.lit(width)),
        F.lit(n_buckets - 1),
    ).cast("int")
    cand = cand.withColumn("__b", bucket)

    # 3a. strict prefix max within bucket (x distinct after groupBy)
    w_local = (
        Window.partitionBy("__b")
        .orderBy("__x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cand = cand.withColumn("__local_prev", F.max("__ymax").over(w_local))

    # 3b. cross-bucket carry: per-bucket max -> exclusive prefix max,
    # driver-side over B rows, shipped back as one literal CASE chain
    bmax = {
        r["__b"]: r["m"]
        for r in cand.groupBy("__b").agg(F.max("__ymax").alias("m")).collect()
    }
    carry: dict[int, float] = {}
    running = None
    for b in range(n_buckets):
        carry[b] = running
        if b in bmax:
            running = bmax[b] if running is None else max(running, bmax[b])
    carry_expr = F.lit(None).cast("double")
    for b, v in carry.items():
        if v is not None:
            carry_expr = F.when(F.col("__b") == b, F.lit(float(v))).otherwise(
                carry_expr
            )

    # 4. survive iff y strictly exceeds every smaller-x height; equal
    # heights lose to the smaller x (strict dominance in x)
    prev_best = F.greatest(
        F.coalesce(F.col("__local_prev"), F.lit(float("-inf"))),
        F.coalesce(carry_expr, F.lit(float("-inf"))),
    )
    frontier = (
        cand.filter(F.col("__ymax") > prev_best)
        .select(F.col("__x"), F.col("__ymax"))
    )
    # frontier height set is <= |distinct y| points -> broadcast back
    return df.join(
        F.broadcast(frontier),
        (x == F.col("__x")) & (y == F.col("__ymax")),
        "leftsemi",
    )
