"""As-of (point-in-time) and range (point-in-interval) joins — the two
time-series operators Spark lacks natively, expressed without range
cross-joins.

Construction: union both sides with a source tag, sort per key by
event time within one window, and carry the right side's latest values
forward with ``last(..., ignorenulls=True)`` over an unbounded-
preceding frame; rows from the left side then hold the most recent
right-side match at or before their timestamp.

Scale: ONE shuffle on the join key and one per-key sort — the same
cost as a window aggregate. This is the merge-join formulation of
as-of; it never materializes candidate pairs, so skew follows the key
distribution, not the time density. Ties (equal timestamps) resolve
with the right side first (match-at-same-instant counts), pinned by a
deterministic secondary sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the most recent right-side
    ``value_cols`` with right.ts <= left.ts for the same key(s).

    Left rows with no preceding right row keep nulls. Output: all left
    columns + one ``<col><suffix>`` per value column + ``<ts_col><suffix>``
    (the matched right timestamp).
    """
    on = list(on)
    lcols = left.columns
    tagged_left = left.select(
        *on,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols if c not in on and c != ts_col],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("__r_ts"),
    )
    tagged_right = right.select(
        *on,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in on and c != ts_col
        ],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(ts_col).alias("__r_ts"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    # right rows sort before left rows at equal __ts (__is_left asc),
    # so a same-instant right row is visible to the left row
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
        F.last(F.col("__r_ts"), ignorenulls=True).over(w).alias(f"{ts_col}{suffix}"),
    )
    keep = (
        on
        + [c for c in lcols if c not in on and c != ts_col]
        + [f"{c}{suffix}" for c in value_cols]
        + [f"{ts_col}{suffix}"]
    )
    return (
        filled.filter(F.col("__is_left") == 1)
        .select(*keep, F.col("__ts").alias(ts_col))
    )


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: Sequence[str] = (),
    bucket_seconds: int = 600,
) -> DataFrame:
    """Inner join of point rows to interval rows with
    ``start <= point < end`` (half-open), optionally key-matched.

    Naive range predicates plan as a broadcast-nested-loop (or worse, a
    cross join) — quadratic at scale. This is the bucketed equi-join
    formulation: time is cut into ``bucket_seconds`` buckets, each
    range explodes into the buckets it covers, points map to exactly
    one bucket, and the range predicate is applied only to the
    bucket-equal pairs. Candidate work is
    O(points + ranges × span/bucket) with one equi-join shuffle — pick
    ``bucket_seconds`` near the typical range span so ranges explode
    into a handful of buckets each.

    Output: all point columns + the matched range's start/end (inner
    join: points in no range drop; points in several ranges emit one
    row per match — each (point, range) pair appears exactly once
    because a point lives in exactly one bucket).
    """
    on = list(on)
    pb = points.withColumn(
        "__b", F.floor(F.col(point_col).cast("long") / bucket_seconds)
    )
    rb = ranges.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("long") / bucket_seconds),
                F.floor(F.col(end_col).cast("long") / bucket_seconds),
            )
        ),
    )
    return (
        pb.join(rb, on=on + ["__b"])
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("__b")
    )
