"""Table sinks for the 100 TB layout: partitioned/bucketed parquet
writes and compaction guidance.

The reference's only sinks were whole-table overwrites and per-row
INSERTs (SURVEY.md §2.1 S9/S11). At scale, layout is the difference
between scanning 100 TB and scanning one partition:

* **Hive-style partitioning** (``partitionBy``) on low-cardinality
  predicates columns (date, event_type, source) → partition pruning
  eliminates directories before any I/O (visible as
  ``PartitionFilters`` in the scan node).
* **Bucketing** (``bucketBy`` on join keys) pre-shuffles data at write
  time: bucketed joins/aggs on the bucket key skip the exchange
  entirely. Requires ``saveAsTable`` (bucket metadata lives in the
  catalog).
* **File sizing**: aim for 128 MB - 1 GB files; ``repartition`` on the
  partition columns before writing prevents the small-files problem
  (one file per task per partition).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    mode: str = "overwrite",
    coalesce_per_partition: bool = True,
) -> None:
    """Write Hive-partitioned parquet. ``coalesce_per_partition``
    repartitions on the partition columns first so each directory gets
    few well-sized files instead of one shard per upstream task."""
    out = df.repartition(*partition_by) if coalesce_per_partition else df
    out.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    n_buckets: int,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (and optionally sorted) managed table: joins
    and aggregations on the bucket key read co-located data with no
    exchange."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def table_storage_report(path: str) -> dict:
    """Storage-layout report from parquet footers (no data read):
    file count, bytes, rows, row groups, and the small-files flag that
    drives compaction decisions. Footer-only, so it is cheap even on a
    100 TB table — this is the report that tells you whether
    ``write_partitioned``'s repartition-first did its job."""
    import os

    import pyarrow.parquet as pq

    files: list[str] = []
    for root, _dirs, names in os.walk(path):
        files += [os.path.join(root, n) for n in names if n.endswith(".parquet")]
    if os.path.isfile(path):
        files = [path]
    total_bytes = sum(os.path.getsize(f) for f in files)
    rows = 0
    row_groups = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        rows += meta.num_rows
        row_groups += meta.num_row_groups
    avg = total_bytes / len(files) if files else 0
    return {
        "n_files": len(files),
        "total_bytes": total_bytes,
        "n_rows": rows,
        "n_row_groups": row_groups,
        "avg_file_bytes": int(avg),
        # < 8 MB average is the classic small-files smell
        "small_files": bool(files) and avg < 8 * 1024 * 1024,
    }


def scan_is_pruned(spark: SparkSession, df: DataFrame, partition_col: str) -> bool:
    """True when the physical plan prunes on ``partition_col`` (the
    predicate reached PartitionFilters instead of a post-scan filter)."""
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    for line in plan.splitlines():
        if "PartitionFilters" in line and partition_col in line:
            return True
    return False
