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
