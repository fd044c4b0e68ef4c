"""Storage layout for scale: bucketed tables (co-located joins) and
partitioned layouts (partition pruning).

The reference delegated physical layout to Snowflake's micro-
partitions; on Spark the two explicit tools are:

* **Bucketing** — ``bucketBy(n, keys)`` at write time hash-partitions
  rows into a fixed number of files per key-hash. Two tables bucketed
  the same way join WITHOUT a shuffle (Spark recognizes the child
  distribution and plans a sort-merge join with zero Exchange nodes).
  At 100 TB this turns every repeated fact⋈fact join on the same key
  (orders⋈lineitem, events⋈sessions) from a full-cluster shuffle into
  a map-side merge — the single biggest join cost lever there is.
* **Partitioning** — ``partitionBy(cols)`` writes one directory per
  value; predicates on partition columns prune entire directories at
  plan time (``PartitionFilters`` in the scan node), so a day query
  over a year of data reads 1/365th of the files.

Rules of thumb encoded here: bucket on the highest-traffic equi-join
key, bucket count ~ (table size / 128 MB) rounded to a power of two,
partition only on low-cardinality columns (date, region, event_type —
never user_id: millions of tiny directories kill the file listing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_keys: list[str],
    n_buckets: int,
    sort_keys: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a managed parquet table bucketed (and
    optionally sorted) by the join keys. Sorting within buckets lets
    the sort-merge join skip its sort too (files are merge-ready)."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_keys)
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket keys.

    With matching bucket counts and join keys == bucket keys, the plan
    contains no Exchange on either side (verified by test): each task
    merges bucket i of the left with bucket i of the right. The
    DataFrame comes from ``spark.table`` — bucketing metadata lives in
    the catalog, not the files, so reading the parquet paths directly
    would silently lose co-location.
    """
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write a directory-partitioned layout (one dir per partition
    value). Keep ``partition_cols`` low-cardinality; at 100 TB the
    sweet spot is date + one coarse dimension, yielding files of
    hundreds of MB each."""
    df.write.mode(mode).partitionBy(*partition_cols).format(fmt).save(path)


def has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains any Exchange (shuffle) node —
    the assertion primitive for co-location tests."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan


def scan_partition_filters(df: DataFrame) -> str:
    """The PartitionFilters clause of the first file scan in the plan
    (empty string when absent) — the assertion primitive for pruning
    tests."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            start = line.index("PartitionFilters")
            return line[start:].split("]", 1)[0] + "]"
    return ""
