"""operators/bootstrap.py: deterministic Poisson bootstrap — draw
distribution, determinism, CI sanity."""

from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F

from data_pipelines_snowflake_procedures_spark.operators.bootstrap import (
    bootstrap_mean_ci,
    poisson1_cdf15,
    poisson_weights,
)


def test_cdf15_thresholds_match_poisson1():
    t = poisson1_cdf15()
    cum, term = 0.0, math.exp(-1.0)
    for k, got in enumerate(t):
        cum += term
        assert got == int(cum * 32768)
        term /= k + 1
    assert t[0] == int(math.exp(-1) * 32768)  # ~12055
    assert t[-1] == 32767


@pytest.mark.slowtier
def test_weights_distribution_is_poisson1(spark):
    df = spark.range(2000).select(F.col("id"))
    w = df.select(
        F.explode(poisson_weights(F.col("id"), 40)).alias("w")
    )
    stats = w.agg(
        F.avg("w").alias("m"), F.var_pop("w").alias("v"), F.max("w").alias("mx")
    ).first()
    # Poisson(1): mean 1, variance 1
    assert abs(stats["m"] - 1.0) < 0.02
    assert abs(stats["v"] - 1.0) < 0.05
    assert stats["mx"] <= 8
    share0 = w.filter("w = 0").count() / w.count()
    assert abs(share0 - math.exp(-1)) < 0.01


def test_bootstrap_deterministic_and_sane(spark):
    rows = [(i, 100 + (i * 37) % 50) for i in range(3000)]
    df = spark.createDataFrame(rows, "k LONG, x LONG")
    a = bootstrap_mean_ci(df, "k", "x", b=80)
    bb = bootstrap_mean_ci(df, "k", "x", b=80)
    assert a == bb  # md5 draws: bit-identical across runs
    n, mean, lo, hi = a
    assert n == 3000
    assert lo < mean < hi
    true_mean = sum(x for _, x in rows) / len(rows)
    assert lo < true_mean < hi
    # interval is tight for n=3000 of bounded values
    assert (hi - lo) < 3.0


def test_ci_narrows_with_n(spark):
    small = spark.createDataFrame(
        [(i, (i * 13) % 100) for i in range(300)], "k LONG, x LONG"
    )
    big = spark.createDataFrame(
        [(i, (i * 13) % 100) for i in range(6000)], "k LONG, x LONG"
    )
    _, _, lo_s, hi_s = bootstrap_mean_ci(small, "k", "x", b=80)
    _, _, lo_b, hi_b = bootstrap_mean_ci(big, "k", "x", b=80)
    assert (hi_b - lo_b) < (hi_s - lo_s)


def test_group_bootstrap_matches_global_on_single_group(spark):
    from data_pipelines_snowflake_procedures_spark.operators.bootstrap import (
        bootstrap_group_mean_ci,
    )

    df = spark.createDataFrame(
        [("a", i, 100 + (i * 37) % 50) for i in range(1500)],
        "g STRING, k LONG, x LONG",
    )
    [(g, n, mean, lo, hi)] = bootstrap_group_mean_ci(df, "g", "k", "x", b=80)
    gn, gmean, glo, ghi = bootstrap_mean_ci(df, "k", "x", b=80)
    assert (g, n) == ("a", 1500)
    # same keys, same seed -> identical draws -> identical interval
    assert (mean, lo, hi) == (gmean, glo, ghi)


def test_group_bootstrap_separates_shifted_groups(spark):
    from data_pipelines_snowflake_procedures_spark.operators.bootstrap import (
        bootstrap_group_mean_ci,
    )

    rows = [("lo", i, (i * 13) % 100) for i in range(2000)] + [
        ("hi", 10_000 + i, 500 + (i * 13) % 100) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "g STRING, k LONG, x LONG")
    out = {g: (lo, hi) for g, _, _, lo, hi in
           bootstrap_group_mean_ci(df, "g", "k", "x", b=80)}
    assert out["lo"][1] < out["hi"][0]  # disjoint intervals


def test_poisson_draws_identical_to_array_form(spark):
    from data_pipelines_snowflake_procedures_spark.operators.bootstrap import (
        poisson_draws,
    )

    df = spark.createDataFrame([(i,) for i in range(50)], "k LONG")
    arr = df.select(
        "k", F.posexplode(poisson_weights(F.col("k"), 20)).alias("r", "w")
    )
    ex = poisson_draws(df, "k", 20).select("k", F.col("__r").alias("r"), F.col("__w").alias("w"))
    a = {(x["k"], x["r"]): x["w"] for x in arr.collect()}
    b = {(x["k"], x["r"]): x["w"] for x in ex.collect()}
    assert a == b


def test_grouped_partials_match_exploded_draws(spark):
    """Direct parity (ADVICE r10): the numpy mapInPandas partials equal
    the exploded poisson_draws → groupBy(__g, __r) aggregation — the
    pre-r10 form — including a NON-long key dtype (string keys hash via
    Python str(k), which must agree with Spark's cast('string'))."""
    from data_pipelines_snowflake_procedures_spark.operators.bootstrap import (
        grouped_replicate_partials,
        poisson_draws,
    )

    cases = [
        (
            [(i, f"g{i % 3}", 100 + (i * 37) % 50) for i in range(400)],
            "k LONG, g STRING, x LONG",
        ),
        (
            # string key: exercises the str(k) vs cast('string') path
            [(f"id-{i:04d}", f"g{i % 3}", 100 + (i * 37) % 50) for i in range(400)],
            "k STRING, g STRING, x LONG",
        ),
    ]
    for rows, schema in cases:
        df = spark.createDataFrame(rows, schema)
        per, totals = grouped_replicate_partials(df, "g", "k", "x", b=24)
        got = {(g, r): (swx, sw) for g, r, swx, sw in per}
        exploded = (
            poisson_draws(df, "k", 24)
            .groupBy("g", "__r")
            .agg(
                F.sum(F.col("__w") * F.col("x")).alias("swx"),
                F.sum("__w").alias("sw"),
            )
            .collect()
        )
        want = {(x["g"], x["__r"]): (x["swx"], x["sw"]) for x in exploded}
        assert got == want
        assert {t[0]: (t[1], t[2]) for t in totals} == {
            "g0": (134, sum(x for _, g, x in rows if g == "g0")),
            "g1": (133, sum(x for _, g, x in rows if g == "g1")),
            "g2": (133, sum(x for _, g, x in rows if g == "g2")),
        }
