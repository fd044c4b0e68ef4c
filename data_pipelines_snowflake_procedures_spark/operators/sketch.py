"""Mergeable-sketch distinct counting (Apache DataSketches HLL).

The 100 TB pattern: exact ``countDistinct`` over a high-cardinality
column is a full shuffle of every distinct value; an HLL sketch is a
few KB of mergeable state, so partial sketches build map-side (one
per partition/group) and MERGE associatively — the same two-level
structure as partial aggregation, but the merged state stays O(KB)
no matter how many distincts flow in. That also makes sketches
storable: persist per-day sketches once, answer any date-range
distinct query later by unioning slices (no re-scan of raw data).

HLL register state is order-insensitive (each item max-updates its
register), so estimates are deterministic for a given item set and
lgConfigK regardless of partitioning — merged-from-slices equals
built-in-one-pass, which `tests/test_sketch.py` asserts.

Reference parity: the reference's DQ procedure computes exact
``COUNT(DISTINCT "{col}")`` per column (Data_Quality_Table.sql:73,
delegated to Snowflake's engine); this module is the scale-path
equivalent for columns whose distinct set doesn't fit a shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sliced_distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    slice_col: str | Column,
    value_col: str,
    lgk: int = 14,
) -> DataFrame:
    """Per-(group, slice) HLL sketches of ``value_col`` — the partial
    state you would persist (e.g. one sketch per event_type per day).
    One shuffle on (group, slice); sketch build is map-side partial."""
    slice_c = F.col(slice_col) if isinstance(slice_col, str) else slice_col
    return df.groupBy(*group_cols, slice_c.alias("__slice")).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sketch")
    )


def merged_distinct_estimate(
    sketches: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Union per-slice sketches up to the group level and estimate.
    The merge input is O(groups × slices) KB-sized rows — a trivial
    shuffle even when the underlying column had billions of distincts."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_distinct")
    )


def distinct_with_sketch(
    df: DataFrame,
    group_cols: list[str],
    slice_col: str | Column,
    value_col: str,
    lgk: int = 14,
) -> DataFrame:
    """Exact vs sketched distinct side-by-side per group: exact
    ``countDistinct`` (the small-data truth), the estimate from
    merged per-slice sketches, and the relative error. At 100 TB you
    would drop the exact column and keep only the sketch path."""
    daily = sliced_distinct_sketches(df, group_cols, slice_col, value_col, lgk)
    merged = merged_distinct_estimate(daily, group_cols)
    exact = df.groupBy(*group_cols).agg(
        F.countDistinct(value_col).alias("exact_distinct")
    )
    return (
        exact.join(merged, group_cols)
        .withColumn(
            "rel_err",
            F.round(
                F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ),
        )
        .withColumn("approx_distinct", F.round("approx_distinct", 2))
    )
