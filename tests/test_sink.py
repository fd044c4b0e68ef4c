"""Tests for partitioned/bucketed sinks and pruning (sources/sink.py)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from data_pipelines_snowflake_procedures_spark.session import load_table
from data_pipelines_snowflake_procedures_spark.sources.sink import (
    scan_is_pruned,
    write_bucketed_table,
    write_partitioned,
)


def test_partitioned_write_and_pruning(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").limit(2000)
    path = str(tmp_path / "events_part")
    write_partitioned(ev, path, ["event_type"])

    back = spark.read.parquet(path)
    assert back.count() == 2000
    filtered = back.filter(F.col("event_type") == "click")
    # the predicate must become a PartitionFilter (directory pruning),
    # not a post-scan row filter
    assert scan_is_pruned(spark, filtered, "event_type")
    expected = ev.filter(F.col("event_type") == "click").count()
    assert filtered.count() == expected


def test_bucketed_table_join_has_no_exchange(spark, sf_dir):
    for t in ("orders_b", "customer_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").limit(5000)
    cust = load_table(spark, sf_dir, "customer").limit(1000)
    write_bucketed_table(orders, "orders_b", ["o_custkey"], 8, sort_by=["o_custkey"])
    write_bucketed_table(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "customer_b",
        ["o_custkey"], 8, sort_by=["o_custkey"],
    )
    joined = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # co-located bucketed join: SMJ reads pre-bucketed data with no
    # shuffle exchange on either side (broadcast also acceptable: one
    # side tiny). The load-bearing assertion: no ShuffleExchange.
    assert "Exchange hashpartitioning" not in plan
    assert joined.count() > 0


def test_bucketed_join_no_shuffle_with_smj_forced(spark, sf_dir):
    """Same join with broadcast disabled: co-location (not a broadcast)
    must be what removes the shuffle — and the identical unbucketed
    join must still shuffle (control for the assertion primitive)."""
    # self-sufficient: (re)create the bucketed tables so this test does
    # not depend on running after test_bucketed_table_join_has_no_exchange
    for t in ("orders_b", "customer_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    write_bucketed_table(
        load_table(spark, sf_dir, "orders").limit(5000),
        "orders_b", ["o_custkey"], 8, sort_by=["o_custkey"],
    )
    write_bucketed_table(
        load_table(spark, sf_dir, "customer").limit(1000)
        .withColumnRenamed("c_custkey", "o_custkey"),
        "customer_b", ["o_custkey"], 8, sort_by=["o_custkey"],
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan

        # groupBy on the bucket key also reuses the bucketed distribution
        agg = spark.table("orders_b").groupBy("o_custkey").agg(F.count("*").alias("n"))
        assert "Exchange" not in agg._jdf.queryExecution().executedPlan().toString()

        # control uses unlimited scans: a limit() collapses both sides
        # to SinglePartition and no hash exchange would be needed
        orders = load_table(spark, sf_dir, "orders")
        cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
            "c_custkey", "o_custkey"
        )
        control = orders.join(cust, "o_custkey")
        assert "Exchange hashpartitioning" in (
            control._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_table_storage_report(sf_dir, tmp_path, spark):
    from data_pipelines_snowflake_procedures_spark.sources.sink import (
        table_storage_report,
    )

    rep = table_storage_report(f"{sf_dir}/lineitem.parquet")
    assert rep["n_files"] == 1
    assert rep["n_rows"] > 0 and rep["total_bytes"] > 0
    # write a deliberately fragmented copy and catch the smell
    from data_pipelines_snowflake_procedures_spark.session import load_table

    frag = str(tmp_path / "frag")
    load_table(spark, sf_dir, "region").repartition(4).write.parquet(frag)
    rep2 = table_storage_report(frag)
    assert rep2["n_files"] >= 4
    assert rep2["small_files"] is True


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    """Joining a partitioned fact to a filtered dim on the partition
    column must plan dynamic partition pruning: the fact scan's
    PartitionFilters gains a dynamicpruningexpression fed by the dim's
    broadcast — at 100 TB this skips every partition the dim filter
    excludes without a static predicate on the fact."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "ev_dpp")
    write_partitioned(ev, path, ["event_type"])
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [
            ("click", "engage"), ("view", "engage"), ("error", "ops"),
            ("purchase", "rev"), ("signup", "rev"),
        ],
        ["event_type", "category"],
    )
    joined = fact.join(dim.filter(F.col("category") == "rev"), "event_type")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan, plan[:2000]
    # pruning must not change results
    expected = ev.filter(F.col("event_type").isin("purchase", "signup")).count()
    assert joined.count() == expected


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Z-order vs single-column sort: sorting by x alone leaves y
    scattered across every file (no pruning on y); the Morton layout
    must prune files for selective ranges on BOTH dimensions."""
    from data_pipelines_snowflake_procedures_spark.sources.sink import (
        files_pruned_by_stats,
        write_zordered,
    )
    from pyspark.sql import functions as F

    n, files = 40000, 16
    df = spark.range(n).select(
        (F.col("id") % 200).alias("x"),
        (F.hash("id") % 200 + 200).alias("y"),  # decorrelated from x
    )
    xsorted = str(tmp_path / "xsorted")
    zordered = str(tmp_path / "zordered")
    df.repartitionByRange(files, "x").sortWithinPartitions("x").write.parquet(xsorted)
    write_zordered(df, zordered, ["x", "y"], n_files=files)

    lo, hi = 90, 99  # 5% range in each dimension
    x_hit_sorted, t1 = files_pruned_by_stats(xsorted, "x", lo, hi)
    y_hit_sorted, _ = files_pruned_by_stats(xsorted, "y", lo + 200, hi + 200)
    x_hit_z, t2 = files_pruned_by_stats(zordered, "x", lo, hi)
    y_hit_z, _ = files_pruned_by_stats(zordered, "y", lo + 200, hi + 200)
    assert t1 == files and t2 == files
    # x-sorted layout: great on x, useless on y
    assert x_hit_sorted <= 3
    assert y_hit_sorted == files
    # z-ordered: prunes meaningfully on BOTH dimensions (5/8 headroom
    # over the ideal quadrant count — range-boundary sampling wobbles)
    assert x_hit_z <= files * 5 // 8, f"zorder x hits {x_hit_z}/{files}"
    assert y_hit_z <= files * 5 // 8, f"zorder y hits {y_hit_z}/{files}"


def test_schema_evolution_merge(spark, tmp_path):
    from data_pipelines_snowflake_procedures_spark.sources.sink import (
        read_with_schema_evolution,
    )

    p1, p2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    spark.createDataFrame([(1, "a")], "id BIGINT, x STRING").write.parquet(p1)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id BIGINT, x STRING, score DOUBLE"
    ).write.parquet(p2)
    df = read_with_schema_evolution(spark, [p1, p2])
    assert set(df.columns) == {"id", "x", "score"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5


def test_compact_parquet_reduces_files(spark, tmp_path):
    import os

    from data_pipelines_snowflake_procedures_spark.sources.sink import (
        compact_parquet,
    )

    p = str(tmp_path / "shattered")
    spark.range(10000).repartition(64).write.parquet(p)
    before = sum(1 for f in os.listdir(p) if f.endswith(".parquet"))
    assert before >= 32
    n = compact_parquet(spark, p, target_mb=128)
    after = sum(1 for f in os.listdir(p) if f.endswith(".parquet"))
    assert after <= n <= 4
    assert spark.read.parquet(p).count() == 10000


def test_commit_swap_crash_before_swap_leaves_target_fully_old(spark, tmp_path):
    """VERDICT r3 next-round #5: a failure between the staging write and
    the swap must leave the target exactly the old version."""
    from data_pipelines_snowflake_procedures_spark.sources import sink as sink_mod

    p = str(tmp_path / "t")
    spark.range(100).write.parquet(p)
    old_rows = {r["id"] for r in spark.read.parquet(p).collect()}

    real_commit = sink_mod.commit_swap

    def boom(staging, target):
        raise RuntimeError("injected crash before swap")

    sink_mod.commit_swap = boom
    try:
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="injected"):
            sink_mod.compact_parquet(spark, p, target_mb=128)
    finally:
        sink_mod.commit_swap = real_commit
    # target untouched: fully old
    assert {r["id"] for r in spark.read.parquet(p).collect()} == old_rows


def test_commit_swap_crash_mid_swap_is_recoverable(spark, tmp_path):
    """A crash BETWEEN the two renames (old moved away, new not yet
    promoted) must be recoverable to the fully-new version — the target
    is never half-written."""
    import os

    from data_pipelines_snowflake_procedures_spark.sources.sink import (
        commit_swap,
        recover_swap,
    )

    p = str(tmp_path / "t")
    staging = p + ".staging"
    spark.range(100).write.parquet(p)
    spark.range(200).write.parquet(staging)

    real_rename = os.rename
    calls = {"n": 0}

    def flaky_rename(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:  # the staging -> target promotion
            raise RuntimeError("injected crash mid-swap")
        real_rename(src, dst)

    os.rename = flaky_rename
    try:
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="mid-swap"):
            commit_swap(staging, p)
    finally:
        os.rename = real_rename

    assert not os.path.exists(p)  # the documented metadata-only window
    assert recover_swap(p, staging) == "new"
    assert spark.read.parquet(p).count() == 200
    # idempotent once consistent
    assert recover_swap(p, staging) == "target"


def test_commit_swap_crash_with_incomplete_staging_restores_old(spark, tmp_path):
    """If the crash happened with an INCOMPLETE staging dir (no _SUCCESS),
    recovery must restore the fully-old version, never promote."""
    import os

    from data_pipelines_snowflake_procedures_spark.sources.sink import (
        commit_swap,
        recover_swap,
    )

    p = str(tmp_path / "t")
    staging = p + ".staging"
    spark.range(100).write.parquet(p)
    os.makedirs(staging)
    with open(os.path.join(staging, "part-00000.parquet"), "wb") as f:
        f.write(b"torn write")  # no _SUCCESS marker

    import pytest as _pytest

    with _pytest.raises(ValueError, match="_SUCCESS"):
        commit_swap(staging, p)
    # simulate the worst pre-crash state: old moved aside, target absent
    os.rename(p, p + ".old")
    assert recover_swap(p, staging) == "old"
    assert spark.read.parquet(p).count() == 100


def test_schema_diff_reports_add_remove_type_change(spark):
    from data_pipelines_snowflake_procedures_spark.sources.sink import schema_diff

    before = spark.createDataFrame(
        [(1, "a", 1.0, (1,))],
        "id BIGINT, name STRING, score DOUBLE, meta STRUCT<k: BIGINT>",
    )
    after = spark.createDataFrame(
        [(1, 2, "x", (1, "s"))],
        "id BIGINT, score BIGINT, extra STRING, meta STRUCT<k: BIGINT, v: STRING>",
    )
    out = {r["column"]: r for r in schema_diff(spark, before, after).collect()}
    assert set(out) == {"name", "score", "extra", "meta"}
    assert out["name"]["status"] == "REMOVED" and out["name"]["type_after"] is None
    assert out["extra"]["status"] == "ADDED" and out["extra"]["type_before"] is None
    assert out["score"]["status"] == "TYPE_CHANGED"
    assert (out["score"]["type_before"], out["score"]["type_after"]) == (
        "double", "bigint",
    )
    # nested struct field addition is a TYPE change, not silent equality
    assert out["meta"]["status"] == "TYPE_CHANGED"
    # identical schemas diff to nothing
    assert schema_diff(spark, before, before).count() == 0
