"""AQE runtime re-planning guards — the two behaviors the 100 TB story
leans on must actually fire in this engine build:

* partition COALESCING: over-provisioned shuffle partitions (the right
  starting point at scale — size for the big day, let AQE shrink the
  quiet one) merge into few post-shuffle partitions at runtime;
* SKEW-JOIN SPLIT: a hot key's oversized shuffle partition splits into
  parallel sub-partitions instead of stalling one task (the safety net
  behind every non-salted large join in this repo).

Both assert on the EXECUTED plan (isFinalPlan=true): the probe frame
itself is collected, because a derived action like ``count()`` builds
its own query execution and the probe's plan would stay unexecuted.
"""

from __future__ import annotations

import pytest

import re

from pyspark.sql import functions as F


def _final_plan(df) -> str:
    df.toPandas()  # execute THIS frame's queryExecution
    spark = df.sparkSession
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "isFinalPlan=true" in plan
    return plan


class _conf_patch:
    def __init__(self, spark, **kv):
        self.spark = spark
        self.kv = {k.replace("__", "."): v for k, v in kv.items()}

    def __enter__(self):
        self.old = {}
        for k, v in self.kv.items():
            try:
                self.old[k] = self.spark.conf.get(k)
            except Exception:
                self.old[k] = None
            self.spark.conf.set(k, v)

    def __exit__(self, *exc):
        for k, v in self.old.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)


@pytest.mark.slowtier
def test_aqe_coalesces_overprovisioned_shuffle(spark):
    with _conf_patch(spark, **{"spark__sql__shuffle__partitions": "64"}):
        df = spark.range(0, 10000).groupBy((F.col("id") % 13).alias("k")).count()
        plan = _final_plan(df)
    assert "AQEShuffleRead coalesced" in plan


def test_aqe_splits_skewed_join_partition(spark):
    overrides = {
        # force a sort-merge join (both static and adaptive broadcast off)
        "spark__sql__autoBroadcastJoinThreshold": "-1",
        "spark__sql__adaptive__autoBroadcastJoinThreshold": "-1",
        # thresholds sized to the tiny probe so the hot key qualifies
        "spark__sql__adaptive__skewJoin__skewedPartitionThresholdInBytes": "64KB",
        "spark__sql__adaptive__advisoryPartitionSizeInBytes": "32KB",
        "spark__sql__adaptive__skewJoin__skewedPartitionFactor": "2",
    }
    with _conf_patch(spark, **overrides):
        # 98% of rows share key 0 — one shuffle partition dwarfs the rest
        big = (
            spark.range(0, 120000)
            .withColumn(
                "k",
                F.when(F.col("id") % 100 < 98, F.lit(0)).otherwise(
                    F.col("id") % 37
                ),
            )
            .withColumn("pad", F.md5(F.col("id").cast("string")))
        )
        small = (
            spark.range(0, 37)
            .withColumnRenamed("id", "k")
            .withColumn("v", F.md5(F.col("k").cast("string")))
        )
        j = big.join(small, "k")
        plan = _final_plan(j)
    assert re.search(r"SortMergeJoin\(skew=true\)", plan)
    assert "skewed" in plan  # the AQEShuffleRead split marker


def test_runtime_bloom_filter_injected_for_selective_join(spark, sf_dir):
    """Runtime semi-join reduction: when a selective dim filter feeds a
    shuffle join, the optimizer must inject a bloom_filter_agg on the
    creation (dim) side and a might_contain probe above the fact scan —
    at 100 TB this prunes fact rows BEFORE the shuffle, the single
    biggest reduction available to a non-broadcast join."""
    from data_pipelines_snowflake_procedures_spark.session import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        part = load_table(spark, sf_dir, "part").filter(
            F.col("p_brand") == "Brand#1"
        )
        j = (
            li.join(part, li.l_partkey == part.p_partkey)
            .groupBy("p_brand")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
        assert j.count() >= 1  # and the filtered join still returns rows
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
