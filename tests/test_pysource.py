"""Custom Python Data Source (PySpark 4 API): partition planning,
determinism, and cross-engine parity of the synthetic-events format."""

from __future__ import annotations

from data_pipelines_snowflake_procedures_spark.sources.pysource import (
    register_synthetic_source,
    synth_row,
)


def _read(spark, n_rows=1000, parts=4):
    register_synthetic_source(spark)
    return (
        spark.read.format("synthetic_events")
        .option("n_rows", n_rows)
        .option("numPartitions", parts)
        .load()
    )


def test_partition_planning_and_row_count(spark):
    df = _read(spark, n_rows=1000, parts=4)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000


def test_rows_match_reference_generator(spark):
    rows = {r["event_id"]: r for r in _read(spark, n_rows=50, parts=3).collect()}
    assert len(rows) == 50
    for i in (0, 1, 17, 49):
        eid, uid, etype, value, ts = synth_row(i)
        r = rows[i]
        assert (r["user_id"], r["event_type"], r["value"]) == (uid, etype, value)
        assert r["ts"] == ts


def test_reads_are_deterministic(spark):
    a = sorted(map(tuple, _read(spark, 200, 2).collect()))
    b = sorted(map(tuple, _read(spark, 200, 5).collect()))  # repartitioned
    assert a == b  # same table regardless of partitioning


def test_filters_compose_with_custom_source(spark):
    from pyspark.sql import functions as F

    df = _read(spark, 1000, 4).filter(F.col("event_type") == "click")
    # click = ids with i % 5 == 1 -> 200 of 1000
    assert df.count() == 200
    assert df.select(F.min("event_id")).collect()[0][0] == 1
