"""Unit tests for operators/layout.py (Morton keys, quantization) and
the Z-order skipping entries."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_snowflake_procedures_spark.operators.layout import (
    quantize_long,
    zorder_key,
    zorder_key_sql,
)
from data_pipelines_snowflake_procedures_spark.queries import REGISTRY


def _morton_py(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i + 1)
        z |= ((y >> i) & 1) << (2 * i)
    return z


def test_zorder_key_matches_python_reference(spark):
    pts = [(x, y) for x in (0, 1, 77, 128, 255) for y in (0, 3, 64, 200, 255)]
    df = spark.createDataFrame(pts, "qx LONG, qy LONG")
    got = {
        (r.qx, r.qy): r.z
        for r in df.select(
            "qx", "qy", zorder_key(F.col("qx"), F.col("qy")).alias("z")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _morton_py(x, y), (x, y)


def test_zorder_key_sql_matches_python_reference():
    import duckdb

    con = duckdb.connect()
    expr = zorder_key_sql("qx", "qy")
    rows = con.execute(
        f"SELECT qx, qy, {expr} AS z FROM "
        "(SELECT unnest(range(0, 256)) AS qx, 255 - unnest(range(0, 256)) AS qy)"
    ).fetchall()
    for qx, qy, z in rows:
        assert z == _morton_py(qx, qy)
    con.close()


def test_zorder_prefix_blocks_are_locality_preserving(spark):
    # consecutive morton keys with a shared high-byte prefix must map to
    # the same block; the block's bbox in each dimension is at most 16
    # wide (the 4-low-bit subgrid) — the locality property pruning needs
    pts = [(x, y) for x in range(0, 256, 7) for y in range(0, 256, 11)]
    df = spark.createDataFrame(pts, "qx LONG, qy LONG").select(
        "qx", "qy", zorder_key(F.col("qx"), F.col("qy")).alias("z")
    )
    boxes = (
        df.groupBy(F.shiftright("z", 8).alias("blk"))
        .agg(
            (F.max("qx") - F.min("qx")).alias("wx"),
            (F.max("qy") - F.min("qy")).alias("wy"),
        )
        .collect()
    )
    assert boxes, "no blocks produced"
    for r in boxes:
        assert r.wx <= 15 and r.wy <= 15, (r.blk, r.wx, r.wy)


def test_quantize_long_is_exact_and_bounded(spark):
    lo, hi = 1013, 49997859
    vals = [lo, lo + 1, (lo + hi) // 2, hi - 1, hi]
    df = spark.createDataFrame([(v,) for v in vals], "v LONG")
    got = [
        r.q
        for r in df.select(
            quantize_long(F.col("v"), F.lit(lo), F.lit(hi)).alias("q")
        ).collect()
    ]
    expected = [(v - lo) * 256 // (hi - lo + 1) for v in vals]
    assert got == expected
    assert all(0 <= q <= 255 for q in got)
    assert got[0] == 0 and got[-1] == 255


def test_skipping_report_invariants(spark, sf_dir):
    rows = {
        r.layout: r
        for r in REGISTRY["orders_zorder_skipping"].spark_fn(spark, sf_dir).collect()
    }
    assert set(rows) == {"natural", "date_sorted", "zorder"}
    matching = {r.rows_matching for r in rows.values()}
    assert len(matching) == 1, "predicate selectivity must not depend on layout"
    # pruning strictly improves: zorder <= date_sorted <= natural
    assert rows["zorder"].blocks_read <= rows["date_sorted"].blocks_read
    assert rows["date_sorted"].blocks_read <= rows["natural"].blocks_read
    for r in rows.values():
        assert r.rows_read >= r.rows_matching
        assert r.blocks_read <= r.n_blocks


def test_parquet_file_pruning_zorder_vs_natural(spark, sf_dir, tmp_path):
    """The skipping report's claim on REAL parquet stats: write orders
    into 16 blocks under natural vs Morton order (prefix-aligned
    `partitionBy` blocks — the file layout an `OPTIMIZE ZORDER BY`
    rewrite materializes), read back every file's min-max footer
    stats with pyarrow, and count files a 2-D predicate must read.
    Z-order must beat natural order on the physical footers, not
    just in the simulated manifest."""
    import glob as _glob

    import pyarrow.parquet as pq

    from data_pipelines_snowflake_procedures_spark.session import load_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.to_date("o_orderdate").alias("o_orderdate"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("pc"),
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lit("1990-01-01"))
        ).cast("long").alias("dd"),
    )
    mm = o.agg(
        F.min("pc").alias("min_pc"), F.max("pc").alias("max_pc"),
        F.min("dd").alias("min_dd"), F.max("dd").alias("max_dd"),
    )
    q = o.crossJoin(F.broadcast(mm)).withColumn(
        "zkey",
        zorder_key(
            quantize_long(F.col("pc"), F.col("min_pc"), F.col("max_pc")),
            quantize_long(F.col("dd"), F.col("min_dd"), F.col("max_dd")),
        ),
    ).select("o_orderkey", "o_totalprice", "o_orderdate", "zkey")

    nat_dir, z_dir = str(tmp_path / "nat"), str(tmp_path / "z")
    # 16 blocks by KEY PREFIX on each sort key (zkey >> 12 = the top
    # 2 bits of each interleaved dimension) — the entry's block model,
    # written as one directory per block
    kmm = q.agg(F.min("o_orderkey").alias("klo"), F.max("o_orderkey").alias("khi"))
    q.crossJoin(F.broadcast(kmm)).withColumn(
        "blk",
        quantize_long(F.col("o_orderkey"), F.col("klo"), F.col("khi"), bits=4),
    ).drop("klo", "khi").write.partitionBy("blk").parquet(nat_dir)
    q.withColumn(
        "blk", F.shiftright("zkey", 12).cast("long")
    ).write.partitionBy("blk").parquet(z_dir)

    # predicate box: middle half of the price range x middle half of
    # the date range (computed from the data so the test is SF-stable)
    row = mm.first()
    p_lo = (row.min_pc * 3 + row.max_pc) / 4 / 100.0
    p_hi = (row.min_pc + row.max_pc * 3) / 4 / 100.0
    import datetime as dt

    epoch = dt.date(1990, 1, 1)
    d_lo = epoch + dt.timedelta(days=(row.min_dd * 3 + row.max_dd) // 4)
    d_hi = epoch + dt.timedelta(days=(row.min_dd + row.max_dd * 3) // 4)

    def files_read(path: str) -> tuple[int, int]:
        hit, total = 0, 0
        for f in sorted(_glob.glob(path + "/**/*.parquet", recursive=True)):
            md = pq.ParquetFile(f).metadata
            if md.num_rows == 0:
                continue
            total += 1
            names = {
                md.schema.column(i).name: i for i in range(len(md.schema))
            }
            stats_p = md.row_group(0).column(names["o_totalprice"]).statistics
            stats_d = md.row_group(0).column(names["o_orderdate"]).statistics
            lo_p = min(
                md.row_group(g).column(names["o_totalprice"]).statistics.min
                for g in range(md.num_row_groups)
            )
            hi_p = max(
                md.row_group(g).column(names["o_totalprice"]).statistics.max
                for g in range(md.num_row_groups)
            )
            lo_d = min(
                md.row_group(g).column(names["o_orderdate"]).statistics.min
                for g in range(md.num_row_groups)
            )
            hi_d = max(
                md.row_group(g).column(names["o_orderdate"]).statistics.max
                for g in range(md.num_row_groups)
            )
            assert stats_p is not None and stats_d is not None
            if lo_p <= p_hi and hi_p >= p_lo and lo_d <= d_hi and hi_d >= d_lo:
                hit += 1
        return hit, total

    nat_hit, nat_total = files_read(nat_dir)
    z_hit, z_total = files_read(z_dir)
    assert nat_total >= 8 and z_total >= 8
    # natural order: every file spans the full price/date space
    assert nat_hit == nat_total
    # Morton order with prefix-aligned blocks: the middle-half box
    # covers exactly the two middle quadrants per dimension = 4 of the
    # 16 blocks (plus nothing — alignment is exact)
    assert z_hit * 2 <= z_total, (z_hit, z_total)
