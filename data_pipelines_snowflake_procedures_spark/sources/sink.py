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

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def commit_swap(staging: str, target: str) -> None:
    """Atomically promote a fully-written staging directory to
    ``target`` (the parquet stand-in for a transactional MERGE/REPLACE,
    used by compaction and the streaming SCD1 upsert).

    Refuses to promote unless the staging write finished (Spark's
    ``_SUCCESS`` marker). The swap is two atomic directory renames —
    target → target.old, staging → target — so the target is NEVER
    half-written: a crash at any point leaves either the full old
    version or the full new version on disk, recoverable by
    :func:`recover_swap`. This replaces the earlier re-write-into-place
    form, which both doubled the write cost and could die mid-delete.
    """
    import shutil

    if not os.path.exists(os.path.join(staging, "_SUCCESS")):
        raise ValueError(
            f"staging dir {staging} has no _SUCCESS marker; refusing to swap"
        )
    old = target + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(target):
        os.rename(target, old)
    os.rename(staging, target)
    shutil.rmtree(old, ignore_errors=True)


def recover_swap(target: str, staging: str | None = None) -> str:
    """Crash recovery for :func:`commit_swap`: restore ``target`` to a
    consistent version after an interrupted swap. Returns which version
    won: 'target' (already consistent), 'new' (staging promoted), or
    'old' (prior version restored). Idempotent."""
    staging = staging or target + ".staging"
    old = target + ".old"
    if os.path.exists(target):
        return "target"
    if os.path.exists(os.path.join(staging, "_SUCCESS")):
        os.rename(staging, target)
        import shutil

        shutil.rmtree(old, ignore_errors=True)
        return "new"
    if os.path.exists(old):
        os.rename(old, target)
        return "old"
    raise FileNotFoundError(
        f"no consistent version of {target} found (no target, no complete "
        f"staging at {staging}, no {old})"
    )


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


def zorder_key(cols_with_bounds: dict, bits: int = 16):
    """Morton (Z-order) key from 2+ numeric columns: each value is
    normalized to a ``bits``-bit rank within its [min, max] bounds,
    then the ranks' bits are interleaved. Rows close on the curve are
    close in EVERY dimension, so sorting by the key clusters
    multi-dimensional locality into files — min/max row-group stats
    then prune point/range queries on ANY of the columns, not just the
    leading sort column (the OPTIMIZE ZORDER technique).

    ``cols_with_bounds`` maps column name → (min, max) (from a prior
    1-row aggregate). Pure integer Column arithmetic — JVM-side,
    whole-stage-codegen'd, no UDF.
    """
    from pyspark.sql import functions as F

    n = len(cols_with_bounds)
    ranks = []
    for col, (lo, hi) in cols_with_bounds.items():
        span = float(hi - lo) if hi > lo else 1.0
        scaled = (F.col(col).cast("double") - float(lo)) / span * ((1 << bits) - 1)
        rank = F.least(
            F.greatest(F.floor(scaled).cast("long"), F.lit(0)),
            F.lit((1 << bits) - 1),
        )
        ranks.append(rank)
    key = F.lit(0).cast("long")
    for bit in range(bits):
        for d, rank in enumerate(ranks):
            key = key + F.shiftleft(
                F.shiftright(rank, bit).bitwiseAND(F.lit(1)), bit * n + d
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 16,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on the Z-order curve of ``cols``:
    compute per-column bounds (one 1-row aggregate), range-partition on
    the Morton key into ``n_files`` tasks, sort within partitions, and
    write — every output file covers a tight hyper-rectangle, so
    row-group min/max stats prune selective queries on any clustered
    column. One extra shuffle vs a plain write; at 100 TB run it as
    the compaction/OPTIMIZE pass, not on the ingest hot path."""
    from pyspark.sql import functions as F

    bounds_row = df.agg(
        *[F.min(c).alias(f"{c}_min") for c in cols],
        *[F.max(c).alias(f"{c}_max") for c in cols],
    ).collect()[0]
    bounds = {c: (bounds_row[f"{c}_min"], bounds_row[f"{c}_max"]) for c in cols}
    (
        df.withColumn("__zkey", zorder_key(bounds, bits))
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )


def files_pruned_by_stats(path: str, col: str, lo, hi) -> tuple[int, int]:
    """Data-skipping measurement: (files whose [min,max] for ``col``
    intersects [lo, hi], total files) from parquet footers only — the
    fraction a stats-aware reader must scan for that predicate."""
    import os

    import pyarrow.parquet as pq

    hit = total = 0
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        total += 1
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        fmin = fmax = None
        for rg in range(md.num_row_groups):
            rgmd = md.row_group(rg)
            for ci in range(rgmd.num_columns):
                c = rgmd.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is None or (fmax >= lo and fmin <= hi):
            hit += 1
    return hit, total


def read_with_schema_evolution(spark, paths: Sequence[str]):
    """Read parquet written under EVOLVING schemas as one frame:
    ``mergeSchema`` unions the footers' schemas (new columns become
    nullable, missing values NULL) — the ingest-side contract for a
    pipeline whose upstream adds columns over time. Schema merging
    reads every footer (driver-side); at 100 TB of files keep
    partition-level schema commonality or a table format (Delta/
    Iceberg) that tracks schema centrally — this reader is the
    raw-parquet fallback."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def compact_parquet(
    spark,
    path: str,
    target_mb: int = 128,
    sort_within_by: Sequence[str] | None = None,
) -> int:
    """Small-file compaction (storage maintenance): rewrite a parquet
    directory into ~``target_mb``-sized files — thousands of tiny
    files cost a task per file at read time and dominate scan
    scheduling at scale. File count derives from current on-disk
    bytes; optional ``sort_within_by`` restores clustering (min/max
    stats) while rewriting. Stage-and-swap like the streaming upsert:
    never leaves the directory half-written. Returns the new file
    count."""
    total = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    n_files = max(1, total // (target_mb * 1024 * 1024) + 1)
    df = spark.read.parquet(path)
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    staging = path + ".compacting"
    out.write.mode("overwrite").parquet(staging)
    commit_swap(staging, path)
    return n_files


def schema_diff(spark, before, after):
    """Schema-level drift report between two frames (the DDL-side
    companion of the CDC row diff): one row per column that was
    ADDED, REMOVED, or TYPE_CHANGED, with both type renderings.
    Nested types compare by their full simpleString (a struct field
    change IS a type change — positional element identity is exactly
    what parquet readers care about). Pure metadata — no data is
    read, so the check is free to run before every ingest and gate
    mergeSchema reads (read_with_schema_evolution) on an explicit
    allow-list of expected changes."""
    a = {f.name: f.dataType.simpleString() for f in before.schema.fields}
    b = {f.name: f.dataType.simpleString() for f in after.schema.fields}
    rows = []
    for name in sorted(set(a) | set(b)):
        if name not in b:
            rows.append((name, "REMOVED", a[name], None))
        elif name not in a:
            rows.append((name, "ADDED", None, b[name]))
        elif a[name] != b[name]:
            rows.append((name, "TYPE_CHANGED", a[name], b[name]))
    return spark.createDataFrame(
        rows, "column STRING, status STRING, type_before STRING, type_after STRING"
    )
