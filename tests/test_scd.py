"""Unit tests for SCD1 merge (SURVEY.md §2.12 G1) with duplicate-key,
out-of-order-CREATED_AT sources — the hard cases called out in §7."""

from __future__ import annotations

from data_pipelines_snowflake_procedures_spark.operators.scd import (
    dedup_latest,
    scd1_merge,
)


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 100.0), (2, "b", 200.0), (3, "c", 300.0)],
        ["k", "name", "amount"],
    )


def _source(spark):
    # key 2: three versions arriving out of order — ts=3 must win.
    # key 9: new key with two versions — ts=2 must win.
    return spark.createDataFrame(
        [
            (2, "b2", 201.0, 2),
            (2, "b3", 202.0, 3),
            (2, "b1", 199.0, 1),
            (9, "new-old", 900.0, 1),
            (9, "new", 901.0, 2),
        ],
        ["k", "name", "amount", "created_at"],
    )


def test_dedup_latest(spark):
    out = dedup_latest(_source(spark), ["k"], "created_at").collect()
    by_key = {r["k"]: r for r in out}
    assert len(out) == 2
    assert by_key[2]["name"] == "b3"
    assert by_key[9]["name"] == "new"


def test_dedup_latest_tiebreaker(spark):
    df = spark.createDataFrame(
        [(1, "x", 1, 10), (1, "y", 1, 20)], ["k", "v", "created_at", "seq"]
    )
    out = dedup_latest(df, ["k"], "created_at", tiebreakers=["seq"]).collect()
    assert len(out) == 1 and out[0]["v"] == "y"


def test_scd1_merge_updates_and_inserts(spark):
    merged = scd1_merge(_target(spark), _source(spark), ["k"], "created_at")
    rows = {r["k"]: r for r in merged.collect()}
    assert set(rows) == {1, 2, 3, 9}
    assert rows[1]["name"] == "a"  # untouched target row
    assert rows[2]["name"] == "b3" and rows[2]["amount"] == 202.0  # latest wins
    assert rows[9]["name"] == "new"  # insert, deduped
    assert merged.columns == ["k", "name", "amount"]  # target schema preserved


def test_delta_merge_gated(spark):
    """scd1_merge_delta is gated behind an import-try: without
    delta-spark installed it must raise ImportError, never crash the
    engine."""
    import importlib.util

    import pytest

    from data_pipelines_snowflake_procedures_spark.operators.scd import (
        scd1_merge_delta,
    )

    if importlib.util.find_spec("delta") is not None:
        pytest.skip("delta-spark installed; gate not exercisable")
    with pytest.raises(ImportError):
        scd1_merge_delta(spark, "any_table", _source(spark), ["k"], "created_at")
