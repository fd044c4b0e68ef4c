"""Edge-input behavior: operators must degrade cleanly on empty or
degenerate frames (the states a 100 TB pipeline hits daily — an empty
partition, a single-row group, an all-null column)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id BIGINT, text STRING, source STRING")


def test_exact_dedup_empty(spark):
    from data_pipelines_snowflake_procedures_spark.operators.dedup import exact_dedup

    assert exact_dedup(_empty_docs(spark)).count() == 0


def test_heavy_hitters_empty(spark):
    from data_pipelines_snowflake_procedures_spark.operators.skew import heavy_hitters

    df = spark.createDataFrame([], "user_id BIGINT, value DOUBLE")
    assert heavy_hitters(df, "user_id", k=5).count() == 0


def test_cms_empty_and_unseen_key(spark):
    from data_pipelines_snowflake_procedures_spark.operators.sketch import (
        cms_build,
        cms_merge,
        cms_point_estimate,
    )

    df = spark.createDataFrame([("a",), ("a",), ("b",)], "k STRING")
    merged = cms_merge(cms_build(df, [], F.lit("s"), "k"), [])
    keys = spark.createDataFrame([("a",), ("zzz",)], "k STRING")
    est = {
        r["k"]: r["est_count"]
        for r in cms_point_estimate(merged, keys, "k").collect()
    }
    assert est["a"] == 2
    assert est["zzz"] == 0  # unseen key estimates zero, not null/error


def test_groupwise_zscore_window_single_row_group(spark):
    """stddev of a 1-row group is NULL -> z-score must be 0.0, not null."""
    from data_pipelines_snowflake_procedures_spark.operators.multimodal import (
        groupwise_zscore_window,
    )

    df = spark.createDataFrame(
        [(1, "solo", 5.0), (2, "pair", 1.0), (3, "pair", 3.0)],
        "event_id BIGINT, event_type STRING, value DOUBLE",
    )
    out = {r["event_id"]: r["zscore"] for r in groupwise_zscore_window(df).collect()}
    assert out[1] == 0.0
    assert out[2] == -out[3] != 0.0


def test_winsorize_constant_group(spark):
    """A constant column's p05 == p95: clipping is a no-op, std is 0."""
    from data_pipelines_snowflake_procedures_spark.queries import REGISTRY  # noqa: F401

    df = spark.createDataFrame(
        [("A", 7.0)] * 5, "l_returnflag STRING, l_extendedprice DOUBLE"
    )
    bounds = df.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.05)).alias("lo"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("hi"),
    )
    row = bounds.collect()[0]
    assert row["lo"] == row["hi"] == 7.0


def test_split_oversized_cells_identical_points_terminates(spark):
    """A cell of IDENTICAL vectors cannot split (every sub-assignment
    lands in one sub-cell) — the guard must terminate at max_depth with
    rows intact, not loop or lose data."""
    from data_pipelines_snowflake_procedures_spark.operators.dedup import (
        norm,
        split_oversized_cells,
    )

    rows = [(i, [1.0, 2.0, 3.0]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    assigned = df.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("emb"),
        norm(F.col("embedding")).alias("nrm"),
        F.lit(0).cast("long").alias("cluster"),
    )
    out = split_oversized_cells(assigned, max_cell_size=5, k=2, max_depth=2)
    assert out.count() == 30  # nothing lost or duplicated


def test_pack_sequences_empty(spark):
    from data_pipelines_snowflake_procedures_spark.operators.corpus import (
        pack_sequences,
    )

    df = spark.createDataFrame([], "doc_id BIGINT, source STRING, n_tokens BIGINT")
    assert pack_sequences(df).count() == 0


def test_read_any_empty_csv(spark, tmp_path):
    from data_pipelines_snowflake_procedures_spark.sources.discovery import read_any

    p = tmp_path / "empty.csv"
    p.write_text("a,b,c\n")
    df = read_any(spark, str(p))
    assert df.count() == 0
    assert df.columns == ["a", "b", "c"]
