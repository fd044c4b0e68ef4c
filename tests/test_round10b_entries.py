"""Property/invariant tests for the round-10 continuation entries
(E298-E313) — the unit-level complement to the DuckDB oracle mirror,
checking the semantics the hash comparison can't see (monotonicity,
conservation, known-answer identities)."""

from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F

from data_pipelines_snowflake_procedures_spark.queries import REGISTRY


def test_dsir_weights_rank_raw_docs_only(spark, sf_dir):
    rows = REGISTRY["documents_dsir_importance"].spark_fn(
        spark, sf_dir
    ).collect()
    assert 0 < len(rows) <= 20
    # raw pool only: the target domain (English) never scores itself
    assert all(r.lang != "en" for r in rows)
    # ordered by weight desc with doc_id tiebreak
    keys = [(-r.weight_micro, r.doc_id) for r in rows]
    assert keys == sorted(keys)
    # avg log-likelihood-ratio is the weight per bigram
    for r in rows:
        assert abs(
            r.avg_loglr - round(r.weight_micro / 1e6 / r.n_bigrams, 6)
        ) < 1e-9


def test_irls_classifier_beats_majority_class(spark, sf_dir):
    row = REGISTRY["documents_quality_logreg_irls"].spark_fn(
        spark, sf_dir
    ).collect()[0]
    assert row.n_docs > 0 and 0 < row.n_pos < row.n_docs
    majority = max(row.n_pos, row.n_docs - row.n_pos) / row.n_docs
    # two Newton steps on separable-ish stopword features should at
    # least match always-predict-majority
    assert row.train_accuracy >= majority - 1e-9
    # coefficients are finite and the model is not degenerate
    for b in (row.beta0, row.beta1, row.beta2):
        assert math.isfinite(b)
    assert (row.beta1, row.beta2) != (0.0, 0.0)


def test_kcenter_coreset_is_greedy_decreasing(spark, sf_dir):
    rows = REGISTRY["embeddings_kcenter_coreset"].spark_fn(
        spark, sf_dir
    ).collect()
    assert [r.step for r in rows] == list(range(1, 9))
    assert len({r.vec_id for r in rows}) == 8
    # farthest-point distances are non-increasing after the seed
    ds = [r.d2_to_chosen for r in rows[1:]]
    assert all(a >= b - 1e-9 for a, b in zip(ds, ds[1:]))
    assert rows[0].d2_to_chosen == 0.0


def test_pacf_lag1_equals_acf_lag1(spark, sf_dir):
    rows = REGISTRY["events_hourly_pacf"].spark_fn(spark, sf_dir).collect()
    assert [r.lag for r in rows] == [1, 2, 3, 4]
    # Durbin-Levinson base case: phi_11 = rho_1
    assert rows[0].pacf == rows[0].acf
    for r in rows:
        assert -1.000001 <= r.pacf <= 1.000001


def test_motifs_respect_exclusion_zone_and_ordering(spark, sf_dir):
    rows = REGISTRY["events_hourly_motifs"].spark_fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 5
    for r in rows:
        assert r.xb - r.xa >= 4  # exclusion zone
        # d = sqrt(2w(1-r)) identity at w=4
        assert abs(
            r.znorm_dist - round(math.sqrt(max(0.0, 8 * (1 - round(r.znorm_corr, 9)))), 6)
        ) <= 2e-6
    dists = [r.znorm_dist for r in rows]
    assert dists == sorted(dists)


def test_bayes_ab_probability_consistent_with_z(spark, sf_dir):
    row = REGISTRY["events_bayes_ab_beta"].spark_fn(spark, sf_dir).collect()[0]
    assert 0 < row.post_mean_a < 1 and 0 < row.post_mean_b < 1
    assert 0 < row.p_b_beats_a < 1
    # sigmoid(1.702 z) midpoint behavior
    if row.z_score > 0:
        assert row.p_b_beats_a > 0.5
    elif row.z_score < 0:
        assert row.p_b_beats_a < 0.5


def test_its_levels_reconstruct_from_slopes(spark, sf_dir):
    row = REGISTRY["orders_its_segmented_regression"].spark_fn(
        spark, sf_dir
    ).collect()[0]
    assert row.n_days_pre > 0 and row.n_days_post > 0
    assert abs(
        row.slope_change - round(row.slope_post - row.slope_pre, 4)
    ) <= 2e-4
    assert abs(
        row.level_jump - round(row.level_post_t0 - row.level_pre_t0, 2)
    ) <= 0.02


def test_blocking_quality_bounds(spark, sf_dir):
    row = REGISTRY["customer_blocking_quality"].spark_fn(
        spark, sf_dir
    ).collect()[0]
    # SNM candidates are a subset of the exact truth pairs
    assert row.n_candidates <= row.n_truth_pairs
    assert row.n_truth_pairs <= row.n_total_pairs
    assert 0 <= row.pairs_completeness <= 1
    assert 0 <= row.reduction_ratio <= 1


def test_kleinberg_burst_metrics_consistent(spark, sf_dir):
    row = REGISTRY["events_kleinberg_bursts"].spark_fn(
        spark, sf_dir
    ).collect()[0]
    assert row.burst_rate == round(2 * row.base_rate, 6) or abs(
        row.burst_rate - 2 * row.base_rate
    ) < 2e-6
    assert 0 <= row.n_burst_days <= row.n_days
    assert row.max_burst_len <= row.n_burst_days or row.n_bursts == 0
    if row.n_burst_days > 0:
        assert row.n_bursts >= 1
    else:
        assert row.n_bursts == 0 and row.max_burst_len == 0


@pytest.mark.slowtier
def test_jaccard_linkpred_scores_are_valid(spark, sf_dir):
    df = REGISTRY["supplier_graph_jaccard_linkpred"].spark_fn(spark, sf_dir)
    rows = df.limit(500).collect()
    assert rows
    for r in rows:
        union = r.deg_u + r.deg_v - r.common_neighbors
        assert r.common_neighbors >= 1
        assert union >= r.common_neighbors
        assert abs(r.jaccard - round(r.common_neighbors / union, 6)) < 1e-9


@pytest.mark.slowtier
def test_maxsim_top5_per_query_and_bounds(spark, sf_dir):
    rows = REGISTRY["knn_maxsim_colbert_embeddings"].spark_fn(
        spark, sf_dir
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_doc, []).append(r)
    assert set(by_q) == {0, 1}
    for q, rs in by_q.items():
        assert [r.rank for r in sorted(rs, key=lambda r: r.rank)] == [
            1, 2, 3, 4, 5,
        ]
        scores = [r.maxsim for r in sorted(rs, key=lambda r: r.rank)]
        assert scores == sorted(scores, reverse=True)
        # maxsim of n_query_vecs chunk maxima is bounded by +/- n
        for r in rs:
            assert abs(r.maxsim) <= r.n_query_vecs + 1e-6


def test_sprt_walk_extremes_bracket_final(spark, sf_dir):
    row = REGISTRY["events_sprt_conversion"].spark_fn(
        spark, sf_dir
    ).collect()[0]
    assert row.min_llr <= row.final_llr <= row.max_llr
    a = math.log(19.0)
    if row.decision == "continue":
        assert row.first_cross_t is None
        assert -a < row.max_llr and row.min_llr > -a or (
            row.max_llr < a and row.min_llr > -a
        )
    else:
        assert row.first_cross_t is not None
        assert row.max_llr >= a or row.min_llr <= -a


def test_gravity_model_fits_positively(spark, sf_dir):
    row = REGISTRY["nation_trade_gravity_ols"].spark_fn(
        spark, sf_dir
    ).collect()[0]
    assert row.n_pairs > 0
    # bigger exporters/importers trade more: both elasticities positive
    assert row.beta_out > 0 and row.beta_in > 0
    assert row.r2 <= 1.0


def test_newsvendor_stock_dominates_median(spark, sf_dir):
    rows = REGISTRY["part_newsvendor_stock"].spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_days > 0
        assert r.stock_level_cf75 >= r.median_daily_demand


def test_repeat_epoch_value_decays(spark, sf_dir):
    rows = REGISTRY["documents_repeat_epoch_value"].spark_fn(
        spark, sf_dir
    ).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, {})[r.epochs] = r
    for src, es in by_src.items():
        assert set(es) == {1, 4, 16}
        # epoch 1 is pure fresh data: effective == unique, ratio == 1
        assert es[1].token_value_ratio == 1.0
        assert abs(es[1].effective_tokens - es[1].unique_tokens) < 0.01
        # effective tokens grow with epochs, per-token value decays
        assert es[1].effective_tokens <= es[4].effective_tokens
        assert es[4].effective_tokens <= es[16].effective_tokens
        assert es[4].token_value_ratio < es[1].token_value_ratio
        assert es[16].token_value_ratio < es[4].token_value_ratio
        # bounded by the paper's asymptote U(1 + R*)
        assert es[16].effective_tokens <= es[16].unique_tokens * 16.0
        assert es[16].effective_tokens <= es[16].unique_tokens * (1 + 15.0)


def test_webdataset_entry_member_count_is_two_per_doc(spark, sf_dir):
    from data_pipelines_snowflake_procedures_spark.session import load_table

    rows = REGISTRY["webdataset_tar_documents"].spark_fn(
        spark, sf_dir
    ).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_members for r in rows) == 2 * n_docs
    assert {r.shard for r in rows} <= set(range(8))


def test_mmd_same_distribution_is_small(spark, sf_dir):
    row = REGISTRY["embeddings_mmd_two_sample"].spark_fn(
        spark, sf_dir
    ).collect()[0]
    assert row.n_pairs > 0
    # labels partition one synthetic cloud: linear MMD^2 should hover
    # near zero (|MMD^2| bounded by 4 for any RBF kernel regardless)
    assert abs(row.mmd2_linear) <= 4.0


def test_fe_regression_reports_both_slopes(spark, sf_dir):
    row = REGISTRY["orders_panel_fe_regression"].spark_fn(
        spark, sf_dir
    ).collect()[0]
    assert row.n_customers > 0
    assert row.n_orders >= 2 * row.n_customers
    assert math.isfinite(row.fe_slope_per_order)
    assert math.isfinite(row.pooled_slope_per_order)


def test_eoq_scales_with_sqrt_demand(spark, sf_dir):
    rows = REGISTRY["part_eoq_policy"].spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.eoq_units > 0 and r.avg_unit_price > 0
        # EOQ identity: orders_per_period * eoq ~ demand
        assert abs(r.orders_per_period * r.eoq_units - r.demand_qty) < max(
            0.02 * r.demand_qty, 2.0
        )
        # recompute from the published rounded columns
        recomputed = math.sqrt(
            2 * r.demand_qty * 100.0 / (0.2 * r.avg_unit_price)
        )
        assert abs(r.eoq_units - recomputed) < 0.02 * recomputed + 1.0


def test_sprt_streaming_equals_batch(spark, sf_dir):
    batch = REGISTRY["events_sprt_conversion"].spark_fn(
        spark, sf_dir
    ).collect()[0]
    stream = REGISTRY["events_sprt_streaming"].spark_fn(
        spark, sf_dir
    ).collect()[0]
    assert stream.asDict() == batch.asDict()


def test_chinchilla_monotone_in_budget(spark, sf_dir):
    rows = sorted(
        REGISTRY["corpus_chinchilla_planner"].spark_fn(
            spark, sf_dir
        ).collect(),
        key=lambda r: r.log10_flops,
    )
    assert [r.log10_flops for r in rows] == [19, 21, 23]
    for a, b in zip(rows, rows[1:]):
        # bigger budgets want more params, more tokens, lower loss
        assert b.n_opt_log10 > a.n_opt_log10
        assert b.d_opt_log10 > a.d_opt_log10
        assert b.est_loss < a.est_loss
        assert b.epochs_needed > a.epochs_needed
    for r in rows:
        # Hoffmann scaling: N and D split the ln(C/6) budget exactly
        assert abs(
            (r.n_opt_log10 + r.d_opt_log10)
            - (r.log10_flops - math.log10(6.0))
        ) < 2e-3
        assert r.data_limited == (r.epochs_needed > 4.0)


def test_shapley_efficiency_axiom(spark, sf_dir):
    from data_pipelines_snowflake_procedures_spark.session import load_table

    rows = REGISTRY["events_shapley_attribution"].spark_fn(
        spark, sf_dir
    ).collect()
    assert {r.channel for r in rows} == {"view", "click", "signup"}
    # efficiency: the values sum to v(grand coalition) - v(empty set)
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    u = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("a"),
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("b"),
        F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0)).alias("c"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("y"),
    ).collect()
    full = [r for r in u if r.a and r.b and r.c]
    none = [r for r in u if not (r.a or r.b or r.c)]
    v_full = sum(r.y for r in full) / len(full) if full else 0.0
    v_none = sum(r.y for r in none) / len(none) if none else 0.0
    total = sum(r.shapley_value for r in rows)
    assert abs(total - (v_full - v_none)) < 1e-4
