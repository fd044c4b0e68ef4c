"""Unit tests for operators/skyline.py — 2-D Pareto frontier edge
cases the oracle entry (part_pareto_frontier) can't isolate: dominance
strictness, duplicate points, degenerate x ranges, bucket-boundary
carries."""

from __future__ import annotations

from data_pipelines_snowflake_procedures_spark.operators.skyline import (
    pareto_frontier_2d,
)


def _frontier(spark, rows, n_buckets=4):
    df = spark.createDataFrame(rows, "id INT, x DOUBLE, y DOUBLE")
    out = pareto_frontier_2d(df, "x", "y", n_buckets=n_buckets)
    return sorted((r["id"]) for r in out.collect())


def test_basic_staircase(spark):
    # (1,5) (2,7) (3,6): (3,6) dominated by (2,7); others survive
    rows = [(1, 1.0, 5.0), (2, 2.0, 7.0), (3, 3.0, 6.0)]
    assert _frontier(spark, rows) == [1, 2]


def test_equal_y_smaller_x_wins(spark):
    # same height, larger x is strictly dominated
    rows = [(1, 1.0, 5.0), (2, 2.0, 5.0)]
    assert _frontier(spark, rows) == [1]


def test_equal_x_larger_y_wins(spark):
    rows = [(1, 1.0, 5.0), (2, 1.0, 7.0)]
    assert _frontier(spark, rows) == [2]


def test_duplicate_points_both_kept(spark):
    # identical (x, y): neither strictly dominates -> both survive
    rows = [(1, 1.0, 5.0), (2, 1.0, 5.0), (3, 2.0, 4.0)]
    assert _frontier(spark, rows) == [1, 2]


def test_single_x_value_degenerate_range(spark):
    # lo == hi -> width clamps to 1.0; only the max-y rows survive
    rows = [(1, 3.0, 1.0), (2, 3.0, 9.0), (3, 3.0, 9.0)]
    assert _frontier(spark, rows) == [2, 3]


def test_cross_bucket_carry(spark):
    # ascending staircase spread over many buckets (pay more x, get
    # more y): no point dominates another, all survive; then a point
    # in the LAST bucket sitting below an earlier bucket's height is
    # dropped by the cross-bucket carry, not the local window.
    rows = [(i, float(i), float(i)) for i in range(1, 9)]
    assert _frontier(spark, rows, n_buckets=8) == list(range(1, 9))
    rows.append((99, 8.5, 4.0))  # dominated by (5, 5.0) via carry
    assert _frontier(spark, rows, n_buckets=8) == list(range(1, 9))


def test_all_dominated_by_one(spark):
    rows = [(1, 0.0, 99.0)] + [(i, float(i), float(i)) for i in range(2, 6)]
    assert _frontier(spark, rows) == [1]


def test_empty_input(spark):
    df = spark.createDataFrame([], "id INT, x DOUBLE, y DOUBLE")
    assert pareto_frontier_2d(df, "x", "y").count() == 0


def test_matches_bruteforce_random(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, float(rng.randint(0, 20)), float(rng.randint(0, 20)))
        for i in range(60)
    ]
    expect = sorted(
        i
        for i, x, y in rows
        if not any(
            (qx <= x and qy >= y and (qx < x or qy > y)) for _, qx, qy in rows
        )
    )
    assert _frontier(spark, rows, n_buckets=5) == expect
