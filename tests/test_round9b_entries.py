"""Round-9 wave E261-E274: odds ratio, Poisson rate test, Croston,
n-gram novelty, dedup mix shift, price EMD, Mann-Kendall, Markov
entropy rate, Ljung-Box, LOF, forecast reconciliation, Little's law,
tokenizer fertility, TwoNN intrinsic dimension.

Hash-exactness is covered by the parametrized oracle mirror
(test_queries_oracle.py); these pin SEMANTICS with invariants and
hand-recomputations the oracle can't express."""

from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F

from data_pipelines_snowflake_procedures_spark.queries import REGISTRY


def test_odds_ratio_ci_and_consistency(spark, sf_dir):
    rows = REGISTRY["part_brand_return_odds_ratio"].spark_fn(
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert r.n_lines >= r.n_return >= 0
        assert r.odds_ratio > 0
        assert r.se_log > 0
        assert r.lo95_log <= r.log_or <= r.hi95_log
        # log_or is the log of the (Haldane-corrected) odds ratio
        assert abs(math.exp(r.log_or) - r.odds_ratio) < 1e-4


def test_poisson_rate_counts_partition_events(spark, sf_dir):
    rows = REGISTRY["events_type_rate_poisson_test"].spark_fn(
        spark, sf_dir
    ).collect()
    assert rows
    from data_pipelines_snowflake_procedures_spark.session import load_table

    totals = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        assert r.n_first + r.n_second == totals[r.event_type]
        assert r.days_first > 0 and r.days_second > 0
        assert r.sig_95 == (abs(r.z_score) > 1.96)


def test_croston_matches_recursive_ses(spark, sf_dir):
    rows = REGISTRY["part_croston_demand_forecast"].spark_fn(
        spark, sf_dir
    ).collect()
    assert rows
    by_key = {r.p_partkey: r for r in rows}
    for r in rows:
        assert r.n_demands >= 3
        assert r.p_hat >= 1 - 1e-9  # intervals are whole days >= 1
        assert r.z_hat > 0
        assert abs(r.croston_forecast - r.z_hat / r.p_hat) < 2e-6
    # recompute one part's recursion directly (s_i = 0.2 x_i + 0.8 s_{i-1})
    from data_pipelines_snowflake_procedures_spark.session import load_table

    target = max(rows, key=lambda r: r.n_demands).p_partkey
    series = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") == target)
        .groupBy(F.to_date("l_shipdate").alias("day"))
        .agg(F.sum("l_quantity").alias("z"))
        .orderBy("day")
        .collect()
    )
    zs = [r.z for r in series]
    days = [r.day for r in series]
    gaps = [(days[i] - days[i - 1]).days for i in range(1, len(days))]
    sz = zs[0]
    for z in zs[1:]:
        sz = 0.2 * z + 0.8 * sz
    sp = gaps[0]
    for g in gaps[1:]:
        sp = 0.2 * g + 0.8 * sp
    got = by_key[target]
    assert abs(got.z_hat - sz) < 1e-4
    assert abs(got.p_hat - sp) < 1e-4


@pytest.mark.slowtier
def test_ngram_novelty_bounds_and_total(spark, sf_dir):
    rows = REGISTRY["documents_ngram_novelty"].spark_fn(
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.mean_novelty <= 1.0
        assert 0 <= r.n_novel <= r.n_grams
        assert r.n_docs > 0
    # every distinct gram is novel in exactly one document
    from data_pipelines_snowflake_procedures_spark.operators.text import tokens
    from data_pipelines_snowflake_procedures_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(tokens("text"), lambda t: t != "")
    grams = docs.select(
        F.explode(
            F.when(
                F.size(toks) >= 5,
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - 4),
                        lambda i: F.array_join(F.slice(toks, i, 5), " "),
                    )
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g")
    )
    n_distinct = grams.select("g").distinct().count()
    assert sum(r.n_novel for r in rows) == n_distinct


def test_mix_shift_conservation_and_nonneg_js(spark, sf_dir):
    rows = REGISTRY["dedup_source_mix_shift"].spark_fn(
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_after <= r.n_before
        assert 0 < r.kept_rate <= 1.0 + 1e-9
        # pointwise JS terms are non-negative (log-sum inequality)
        assert r.js_contribution >= -1e-9
    assert abs(sum(r.share_before for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.share_after for r in rows) - 1.0) < 1e-4


def test_emd_nonneg_and_bounded(spark, sf_dir):
    rows = REGISTRY["orders_price_emd_yearly"].spark_fn(
        spark, sf_dir
    ).collect()
    assert rows
    from data_pipelines_snowflake_procedures_spark.session import load_table

    mm = (
        load_table(spark, sf_dir, "orders")
        .agg(F.min("o_totalprice"), F.max("o_totalprice"))
        .collect()[0]
    )
    span = mm[1] - mm[0]
    for r in rows:
        assert r.year_b == r.year_a + 1
        assert 0.0 <= r.emd <= span + 1e-6


def test_mann_kendall_bounds(spark, sf_dir):
    rows = REGISTRY["orders_monthly_mann_kendall"].spark_fn(
        spark, sf_dir
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    n = r.n_months
    assert abs(r.s_stat) <= n * (n - 1) // 2
    assert r.var_s > 0
    assert r.trend in {"increasing", "decreasing", "no trend"}
    if r.trend == "no trend":
        assert abs(r.z_score) <= 1.96 or r.s_stat == 0
    else:
        assert abs(r.z_score) > 1.96


def test_entropy_rate_bounds_and_weights(spark, sf_dir):
    rows = REGISTRY["events_markov_entropy_rate"].spark_fn(
        spark, sf_dir
    ).collect()
    assert rows
    n_types = len(rows)
    for r in rows:
        assert -1e-9 <= r.row_entropy_bits <= math.log2(max(n_types, 2)) + 1e-6
        assert 0 < r.weight <= 1
        assert abs(r.contribution_bits - r.weight * r.row_entropy_bits) < 2e-6
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4


def test_ljung_box_monotone_and_rejection_rule(spark, sf_dir):
    rows = sorted(
        REGISTRY["events_hourly_ljung_box"].spark_fn(spark, sf_dir).collect(),
        key=lambda r: r.lag,
    )
    assert [r.lag for r in rows] == list(range(1, 25))
    for prev, cur in zip(rows, rows[1:]):
        # Q is a cumulative sum of non-negative terms
        assert cur.q_stat >= prev.q_stat - 1e-9
        assert cur.crit_95 > prev.crit_95
    for r in rows:
        assert -1.0 - 1e-9 <= r.r <= 1.0 + 1e-9
        assert r.reject_95 == (r.q_stat > r.crit_95)


def test_lof_report_shape_and_positivity(spark, sf_dir):
    rows = sorted(
        REGISTRY["embeddings_lof_outliers"].spark_fn(spark, sf_dir).collect(),
        key=lambda r: r.rank,
    )
    assert len(rows) == 20
    assert [r.rank for r in rows] == list(range(1, 21))
    for prev, cur in zip(rows, rows[1:]):
        assert prev.lof >= cur.lof - 1e-9  # ranked by LOF desc
    for r in rows:
        assert r.lof > 0 and r.lrd > 0 and r.k_dist > 0


def test_forecast_reconciliation_coherence(spark, sf_dir):
    rows = REGISTRY["nation_forecast_reconciliation"].spark_fn(
        spark, sf_dir
    ).collect()
    assert rows
    horizons = {}
    for r in rows:
        horizons.setdefault(r.horizon, []).append(r)
    assert set(horizons) == {1, 2, 3}
    for h, rs in horizons.items():
        # top-down reconciliation is coherent: nation forecasts sum to
        # the total forecast (within per-row rounding)
        total = rs[0].total_forecast
        assert all(abs(r.total_forecast - total) < 1e-6 for r in rs)
        assert abs(sum(r.nation_forecast for r in rs) - total) < 1e-2
        assert abs(sum(r.share for r in rs) - 1.0) < 1e-4


def test_little_law_ratio_definition(spark, sf_dir):
    rows = REGISTRY["orders_little_law_wip"].spark_fn(
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert r.arrivals > 0
        assert r.mean_days >= 0
        assert r.wip_littles >= 0
        if r.wip_direct == 0:
            assert r.littles_ratio is None
        else:
            assert (
                abs(r.littles_ratio - r.wip_littles / r.wip_direct) < 2e-6
            )


def test_tokenizer_fertility_bounds(spark, sf_dir):
    rows = REGISTRY["documents_tokenizer_fertility"].spark_fn(
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert r.n_docs > 0 and r.n_words > 0
        # BPE-ish pre-tokens can only split whitespace words further
        assert r.n_bpe_tokens >= 0
        assert abs(r.fertility - r.n_bpe_tokens / r.n_words) < 2e-6


def test_intrinsic_dimension_positive_and_consistent(spark, sf_dir):
    rows = REGISTRY["embeddings_intrinsic_dimension"].spark_fn(
        spark, sf_dir
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_used > 0
    assert r.sum_ln_mu > 0  # r2 >= r1 always, strict for non-ties
    assert r.intrinsic_dim > 0
    assert abs(r.intrinsic_dim - r.n_used / r.sum_ln_mu) < 1e-3
    # 64-dim ambient space bounds the manifold dimension estimate only
    # loosely (estimator variance), but it should land in a sane band
    assert r.intrinsic_dim < 200


def test_theil_u_definition_consistency(spark, sf_dir):
    rows = REGISTRY["orders_theil_u_forecast"].spark_fn(
        spark, sf_dir
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_holdout == 12
    assert r.rmse_ols > 0 and r.rmse_naive > 0
    assert abs(r.theil_u2 - r.rmse_ols / r.rmse_naive) < 1e-4


def test_lorenz_curve_monotone_and_below_diagonal(spark, sf_dir):
    rows = sorted(
        REGISTRY["supplier_revenue_lorenz"].spark_fn(spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    prev_pop = prev_rev = 0.0
    for r in rows:
        assert r.pop_share_cum >= prev_pop and r.rev_share_cum >= prev_rev
        # ascending-rank Lorenz curve sits on/below the diagonal
        assert r.lorenz_gap >= -1e-9
        prev_pop, prev_rev = r.pop_share_cum, r.rev_share_cum
    assert abs(rows[-1].pop_share_cum - 1.0) < 1e-6
    assert abs(rows[-1].rev_share_cum - 1.0) < 1e-6


def test_adaptive_cell_contract_keeps_oracle_gate_native():
    """Guard for the BLAS fast-path parity argument: at every scale the
    DuckDB oracles run (sf0.01: 500 vectors; local mirror max: sf0.1,
    2000), the adaptive cell count max(8, n/256) must stay below
    NUMPY_ASSIGN_MIN_K so hash-checked assignments use the bit-exact
    native fold. If either constant changes, this fails before any
    oracle silently drifts."""
    import math

    from data_pipelines_snowflake_procedures_spark.operators.similarity import (
        NUMPY_ASSIGN_MIN_K,
    )

    for n in (500, 2000):
        k = max(8, math.ceil(n / 256))
        assert k == 8
        assert k < NUMPY_ASSIGN_MIN_K
