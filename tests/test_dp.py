"""Tests for the DP count release (events_dp_type_counts): the
integer geometric-mechanism noise is deterministic, matches a Python
reference bit-for-bit, and has the two-sided-geometric shape."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from data_pipelines_snowflake_procedures_spark.queries import REGISTRY

SF_SMOKE = "/root/testdata/sf0.001"


def _u30(seed: str, cell: str) -> int:
    h = int(hashlib.md5(f"{seed}|{cell}".encode()).hexdigest()[:15], 16)
    return (h % (1 << 30)) | (1 << 30)


def _tz(r: int) -> int:
    return ((r & -r) - 1).bit_count()


def _noise_py(cell: str) -> int:
    return _tz(_u30("dplap1", cell)) - _tz(_u30("dplap2", cell))


def test_dp_noise_matches_python_reference(spark):
    rows = (
        REGISTRY["events_dp_type_counts"]
        .spark_fn(spark, SF_SMOKE)
        .collect()
    )
    assert rows
    for r in rows:
        assert r.noise == _noise_py(r.event_type), r.event_type
        assert r.dp_n == r.exact_n + r.noise


def test_dp_release_is_deterministic(spark):
    fn = REGISTRY["events_dp_type_counts"].spark_fn
    a = sorted((r.event_type, r.dp_n) for r in fn(spark, SF_SMOKE).collect())
    b = sorted((r.event_type, r.dp_n) for r in fn(spark, SF_SMOKE).collect())
    assert a == b


def test_geometric_mechanism_distribution_shape(spark):
    # 20k synthetic cells: noise must center on 0 and have the
    # two-sided-geometric alpha=1/2 mass profile (P(0) = 1/3,
    # P(|z|=k) = (1/3)*2^-k... loosely checked via coarse bounds)
    cells = spark.range(20000).select(
        F.concat(F.lit("cell"), F.col("id")).alias("event_type")
    )
    u = lambda seed: (  # noqa: E731
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}|"), F.col("event_type"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % F.lit(1 << 30)
    ).bitwiseOR(F.lit(1 << 30))
    tz = lambda r: F.bit_count(r.bitwiseAND(-r) - F.lit(1))  # noqa: E731
    noise = (tz(u("dplap1")) - tz(u("dplap2"))).cast("long")
    stats = cells.select(noise.alias("z")).agg(
        F.avg("z").alias("mean"),
        F.avg(F.abs(F.col("z"))).alias("mean_abs"),
        F.sum((F.col("z") == 0).cast("long")).alias("zeros"),
        F.max(F.abs(F.col("z"))).alias("max_abs"),
    ).first()
    assert abs(stats.mean) < 0.05                 # E[Z] = 0
    assert 0.9 < stats.mean_abs < 1.45            # E|Z| = 4/3
    assert 0.30 < stats.zeros / 20000 < 0.37      # P(Z=0) = 1/3
    assert stats.max_abs <= 30                    # sentinel cap
