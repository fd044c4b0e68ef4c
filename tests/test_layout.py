"""Storage-layout tests: bucketed co-located joins (no Exchange) and
partition pruning (PartitionFilters reach the scan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipelines_snowflake_procedures_spark.session import load_table
from data_pipelines_snowflake_procedures_spark.sources.layout import (
    colocated_join,
    has_shuffle,
    scan_partition_filters,
    write_bucketed,
    write_partitioned,
)


@pytest.fixture()
def no_broadcast(spark):
    """Force sort-merge joins so the co-location (not broadcast) is
    what eliminates the shuffle."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, no_broadcast):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "o_orderkey")

    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    write_bucketed(orders, "bkt_orders", ["o_orderkey"], 8, sort_keys=["o_orderkey"])
    write_bucketed(lineitem, "bkt_lineitem", ["o_orderkey"], 8, sort_keys=["o_orderkey"])

    joined = colocated_join(spark, "bkt_orders", "bkt_lineitem", on=["o_orderkey"])
    assert not has_shuffle(joined), (
        "bucketed join should be shuffle-free:\n"
        + joined._jdf.queryExecution().executedPlan().toString()[:2000]
    )
    # co-location must not change results
    plain = orders.join(lineitem, on="o_orderkey").count()
    assert joined.count() == plain

    # control: the same join WITHOUT bucketing must shuffle — proving
    # the assertion primitive detects what bucketing removed
    assert has_shuffle(orders.join(lineitem, on="o_orderkey"))


def test_bucketed_aggregation_has_no_shuffle(spark, sf_dir, no_broadcast):
    """groupBy on the bucket key also reuses the bucketed distribution."""
    joined = spark.table("bkt_orders").groupBy("o_orderkey").agg(
        F.sum("o_totalprice").alias("s")
    )
    assert not has_shuffle(joined)


def test_partition_pruning_reaches_scan(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned(events, path, ["event_type"])

    one_type = spark.read.parquet(path).filter(F.col("event_type") == "click")
    pf = scan_partition_filters(one_type)
    assert "event_type" in pf, f"partition filter missing from scan: {pf!r}"

    # pruning must not change results
    expected = events.filter(F.col("event_type") == "click").count()
    assert one_type.count() == expected
