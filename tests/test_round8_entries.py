"""Round-8 waves (E187-E206): t-closeness, sequence matching, skew
audit, reconciliation, systematic sampling, JL projection, shrinkage,
funnel latency, MAD anomalies, forecast backtest, SNM blocking.

Each entry's hash-exactness is covered by the parametrized oracle
mirror (test_queries_oracle.py); these tests pin the SEMANTICS with
hand-computed cases and invariants the oracle can't express."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_pipelines_snowflake_procedures_spark.queries import REGISTRY


def test_sequence_match_invariants(spark, sf_dir):
    rows = {r.pattern: r for r in
            REGISTRY["events_sequence_match"].spark_fn(spark, sf_dir).collect()}
    assert set(rows) == {"vc", "cp", "vcp", "v.*c.*p"}
    for r in rows.values():
        assert 0 <= r.users_matched <= r.total_matches or r.total_matches == 0
    # a strict adjacent triple is rarer than either of its halves
    assert rows["vcp"].total_matches <= rows["vc"].total_matches
    assert rows["vcp"].total_matches <= rows["cp"].total_matches
    # the gapped funnel is a per-user flag: matches == users
    g = rows["v.*c.*p"]
    assert g.total_matches == g.users_matched
    # and reaches at least as many users as the strict triple
    assert g.users_matched >= rows["vcp"].users_matched


def test_skew_report_invariants(spark, sf_dir):
    rows = {r.key_col: r for r in
            REGISTRY["lineitem_skew_report"].spark_fn(spark, sf_dir).collect()}
    assert set(rows) == {"l_partkey", "l_suppkey"}
    for r in rows.values():
        assert r.n_keys > 0 and r.n_rows >= r.n_keys
        assert r.p50_n <= r.p99_n <= r.max_n
        assert 0 <= r.gini < 1
        assert r.top1_share_bp >= 10000 // r.n_keys  # max >= mean share
    # both key columns count the same lineitem rows
    assert rows["l_partkey"].n_rows == rows["l_suppkey"].n_rows


def test_skew_report_gini_hand_computed(spark):
    assert "lineitem_skew_report" in REGISTRY
    # uniform frequencies -> gini 0, via a tiny synthetic frame run
    # through the same rank formula
    df = spark.createDataFrame([(k,) for k in range(4) for _ in range(5)],
                               ["key"])
    kdf = df.groupBy("key").agg(F.count("*").alias("n"))
    from pyspark.sql.window import Window
    rk = kdf.withColumn("i", F.row_number().over(Window.orderBy("n", "key")))
    gini = rk.agg(
        F.expr(
            "(2.0 * CAST(sum(CAST(i AS DECIMAL(38,0)) * n) AS DOUBLE)"
            " - (count(*) + 1.0) * sum(n)) / (1.0 * count(*) * sum(n))"
        )
    ).first()[0]
    assert abs(gini) < 1e-12


def test_reconcile_buckets_cover_all_orders(spark, sf_dir, duck):
    rows = REGISTRY["orders_lineitem_reconcile"].spark_fn(spark, sf_dir).collect()
    n_orders = duck.execute("SELECT count(*) FROM orders").fetchone()[0]
    assert sum(r.n_orders for r in rows) == n_orders
    for r in rows:
        assert 0 <= r.share_bp <= 10000
        assert r.total_abs_delta_cents >= 0
    by = {r.bucket: r for r in rows}
    if "b_exact" in by:
        assert by["b_exact"].total_abs_delta_cents == 0


def test_systematic_sample_telescopes(spark, sf_dir, duck):
    rows = REGISTRY["orders_systematic_sample"].spark_fn(spark, sf_dir).collect()
    t, = duck.execute(
        "SELECT sum(CAST(round(o_totalprice*100) AS BIGINT)) FROM orders"
    ).fetchone()
    step = max(t // 1000, 1)
    # the per-row copy counts telescope to the total position count
    assert sum(r.n_copies for r in rows) == t // step
    assert all(r.n_copies >= 1 for r in rows)
    # ~1000 samples, give or take integer-step rounding
    assert 900 <= len(rows) <= t // step


def test_jl_projection_matches_numpy(spark):
    import numpy as np

    from data_pipelines_snowflake_procedures_spark.operators.linalg import (
        jl_project_cols,
        jl_signs,
    )

    rng = [float(i % 7) - 3.0 for i in range(64)]
    df = spark.createDataFrame([(1, rng)], ["vec_id", "embedding"])
    row = df.select(*jl_project_cols("embedding", 64, 16)).first()
    S = np.array(jl_signs(64, 16), dtype=np.float64)
    want = S @ np.array(rng) / 4.0
    got = np.array([row[f"y{j}"] for j in range(16)])
    assert np.allclose(got, np.round(want, 6), atol=1e-9)


def test_jl_distortion_sane(spark, sf_dir):
    r = REGISTRY["embeddings_jl_distortion"].spark_fn(spark, sf_dir).first()
    assert r.n_pairs > 100
    # the JL lemma at k=16: the median ratio hugs 1, the spread is wide
    assert 0.5 < r.p50_ratio < 1.5
    assert r.p10_ratio < r.p50_ratio < r.p90_ratio
    assert r.n_within_30pct > 0.4 * r.n_pairs


def test_shrinkage_pulls_toward_global_mean(spark, sf_dir, duck):
    rows = REGISTRY["part_return_rate_shrinkage"].spark_fn(spark, sf_dir).collect()
    m, = duck.execute(
        "SELECT sum(CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END) * 1.0"
        " / count(*) FROM lineitem"
    ).fetchone()
    for r in rows:
        raw = r.n_returns / r.n_lines
        lo, hi = sorted((raw, m))
        # posterior mean lies between the raw rate and the prior mean
        assert lo - 1e-6 <= r.shrunk_rate <= hi + 1e-6
    # smaller samples shrink harder (relative distance to m)
    small = [r for r in rows if r.n_lines <= 10 and r.n_returns > 0]
    big = [r for r in rows if r.n_lines >= 50 and r.n_returns > 0]
    if small and big:
        def pull(r):
            raw = r.n_returns / r.n_lines
            return abs(raw - r.shrunk_rate) / (abs(raw - m) + 1e-12)
        assert (sum(map(pull, small)) / len(small)
                >= sum(map(pull, big)) / len(big))


def test_funnel_timing_invariants(spark, sf_dir):
    r = REGISTRY["events_funnel_timing"].spark_fn(spark, sf_dir).first()
    assert 0 < r.converters <= r.signup_users
    assert r.conversion_bp == r.converters * 10000 // r.signup_users
    assert 0 < r.p50_s <= r.p90_s


def test_daily_anomaly_mad_flags_consistent(spark, sf_dir):
    rows = REGISTRY["events_daily_anomaly_mad"].spark_fn(spark, sf_dir).collect()
    assert len(rows) > 20  # a month of days at sf0.01
    for r in rows:
        assert r.is_anomaly == (1 if abs(r.robust_z) > 3.5 else 0)
    # median day must not be anomalous
    zs = sorted(abs(r.robust_z) for r in rows)
    assert zs[len(zs) // 2] < 3.5


def test_forecast_backtest_invariants(spark, sf_dir):
    r = REGISTRY["events_forecast_backtest"].spark_fn(spark, sf_dir).first()
    assert 0 < r.n_holdout_hours <= 24
    assert r.mae_naive >= 0 and r.mae_snaive >= 0
    assert r.mase_vs_naive > 0
    # the ratio is consistent with the two MAEs (rounding slack)
    assert abs(r.mase_vs_naive - r.mae_snaive / r.mae_naive) < 1e-3


def test_snm_pairs_window_semantics(spark, sf_dir):
    rows = REGISTRY["customer_snm_pairs"].spark_fn(spark, sf_dir).collect()
    assert rows, "expected at least one near-balance pair"
    for r in rows:
        assert 0 <= r.delta_cents <= 100
        assert 1 <= r.neighbor_dist <= 3
        assert r.cust_a != r.cust_b
    # candidate volume is bounded by n*w (the SNM guarantee)
    from data_pipelines_snowflake_procedures_spark.session import load_table
    n = load_table(spark, sf_dir, "customer").count()
    assert len(rows) <= 3 * n


def test_price_index_base_year_is_unity(spark, sf_dir):
    rows = REGISTRY["parts_price_index_yearly"].spark_fn(spark, sf_dir).collect()
    assert len(rows) >= 2
    base = rows[0]  # ordered by year; first is the base year
    assert base.laspeyres == 1.0 and base.paasche == 1.0 and base.fisher == 1.0
    for r in rows:
        lo, hi = sorted((r.laspeyres, r.paasche))
        # Fisher is the geometric mean: always between L and P
        assert lo - 1e-6 <= r.fisher <= hi + 1e-6
        assert r.n_parts_matched > 0


def test_runs_test_moments(spark, sf_dir):
    r = REGISTRY["orders_runs_test"].spark_fn(spark, sf_dir).first()
    n = r.n1 + r.n2
    assert 1 <= r.runs <= n
    assert abs(r.expected_runs - (1 + 2 * r.n1 * r.n2 / n)) < 1e-3
    # median split: the two sides are balanced to within one
    assert abs(r.n1 - r.n2) <= 1


def test_hhi_bounds(spark, sf_dir):
    rows = REGISTRY["nation_supplier_hhi"].spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # HHI of k equal shares = 10^8 / k; monopoly = 10^8
        assert 10**8 // max(r.n_suppliers, 1) - 10000 <= r.hhi <= 10**8
        assert r.top_share_bp * r.top_share_bp <= r.hhi + 10000
        assert r.top_share_bp >= 10000 // r.n_suppliers


def test_gorilla_report_consistency(spark, sf_dir):
    r = REGISTRY["events_hourly_gorilla_report"].spark_fn(spark, sf_dir).first()
    assert r.n_values > 0
    assert r.raw_bits == r.n_values * 64
    assert r.n_values <= r.packed_bits <= r.n_values * 36
    assert r.compression_ratio > 1.0  # smooth hourly counts must compress
    assert r.n_zero + r.n_wide <= r.n_values


def test_abc_migration_matrix(spark, sf_dir, duck):
    rows = REGISTRY["part_abc_migration"].spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.from_class in "ABC" and r.to_class in "ABC"
        assert r.n_parts > 0
    # per year-pair, migrated part totals equal the parts present in
    # BOTH years (inner-join semantics)
    import collections
    per_year = collections.Counter()
    for r in rows:
        per_year[r.year_from] += r.n_parts
    both, = duck.execute("""
        WITH rev AS (SELECT l_partkey pk, year(l_shipdate) y FROM lineitem
                     GROUP BY 1, 2)
        SELECT count(*) FROM rev a JOIN rev b
          ON b.pk = a.pk AND b.y = a.y + 1""").fetchone()
    assert sum(per_year.values()) == both


def test_did_estimate_consistent(spark, sf_dir):
    r = REGISTRY["lineitem_discount_did"].spark_fn(spark, sf_dir).first()
    assert r.n_t_pre > 0 and r.n_t_post > 0
    want = round((r.t_post - r.t_pre) - (r.c_post - r.c_pre), 4)
    assert abs(r.did_estimate - want) < 1e-9


def test_bounce_rate_bounds(spark, sf_dir):
    r = REGISTRY["events_session_bounce_rate"].spark_fn(spark, sf_dir).first()
    assert 0 < r.n_sessions
    assert 0 <= r.n_bounces <= r.n_sessions
    assert r.bounce_bp == r.n_bounces * 10000 // r.n_sessions
    assert r.avg_events_per_session >= 1.0


def test_ks_test_against_scipy_formula(spark, sf_dir, duck):
    r = REGISTRY["lineitem_price_ks_test"].spark_fn(spark, sf_dir).first()
    assert r.n1 > 0 and r.n2 > 0
    assert 0 <= r.d_stat <= 1
    # recompute the binned D in duckdb-python as an independent check
    rows = duck.execute("""
        WITH src AS (
          SELECT CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END g,
                 CAST(round(l.l_extendedprice * 100) AS BIGINT) // 10000 b
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey)
        SELECT b, sum(g), sum(1 - g) FROM src GROUP BY b ORDER BY b
    """).fetchall()
    c1 = c2 = 0
    n1 = sum(x[1] for x in rows)
    n2 = sum(x[2] for x in rows)
    dmax = 0
    for _, a, b in rows:
        c1 += a
        c2 += b
        dmax = max(dmax, abs(c1 * n2 - c2 * n1))
    assert r.n1 == n1 and r.n2 == n2
    assert abs(r.d_stat - dmax / (n1 * n2)) < 1e-6
    assert r.reject_at_05 == (1 if r.ks_stat > 1.358 else 0)


def test_spearman_matches_scipy_style_reference(spark, sf_dir, duck):
    # recompute rho from the same binned data with a dense in-memory
    # rank implementation (pandas average ranks) and compare
    import pandas as pd

    rho = (
        REGISTRY["lineitem_spearman_qty_price"]
        .spark_fn(spark, sf_dir)
        .first()["spearman_rho"]
    )
    pdf = duck.execute(
        f"""SELECT CAST(round(l_quantity) AS BIGINT) AS qb,
                   CAST(round(l_extendedprice * 100) AS BIGINT) // 10000 AS pb
            FROM '{sf_dir}/lineitem.parquet'"""
    ).df()
    ref = pdf["qb"].rank(method="average").corr(pdf["pb"].rank(method="average"))
    assert abs(rho - ref) < 1e-6
    assert -1.0 <= rho <= 1.0


def test_kruskal_wallis_invariants(spark, sf_dir):
    r = REGISTRY["events_value_kruskal_wallis"].spark_fn(spark, sf_dir).first()
    assert r.k_groups == 5 and r.df == 4
    assert r.h_stat >= 0
    # tie correction divides by (1 - x) with x in (0, 1): can only grow H
    assert r.h_corrected >= r.h_stat
    assert r.reject_at_05 in (0, 1)


def test_kruskal_wallis_hand_computed(spark, sf_dir):
    # scipy-formula recompute on the driver from the raw values
    import pandas as pd

    from data_pipelines_snowflake_procedures_spark.session import load_table

    pdf = load_table(spark, sf_dir, "events").select(
        "value", "event_type"
    ).toPandas()
    pdf["rank"] = pdf["value"].rank(method="average")
    n = len(pdf)
    sr = sum(
        g["rank"].sum() ** 2 / len(g) for _, g in pdf.groupby("event_type")
    )
    h = 12.0 / (n * (n + 1)) * sr - 3 * (n + 1)
    t = pdf.groupby("value").size()
    hc = h / (1 - (t**3 - t).sum() / (n**3 - n))
    r = REGISTRY["events_value_kruskal_wallis"].spark_fn(spark, sf_dir).first()
    assert abs(r.h_stat - h) < 1e-3
    assert abs(r.h_corrected - hc) < 1e-3


def test_xyz_matrix_partitions_all_sold_parts(spark, sf_dir, duck):
    rows = REGISTRY["part_xyz_classification"].spark_fn(spark, sf_dir).collect()
    assert all(r.abc_class in "ABC" and r.xyz_class in "XYZ" for r in rows)
    total = sum(r.parts for r in rows)
    sold = duck.execute(
        f"SELECT count(DISTINCT l_partkey) FROM '{sf_dir}/lineitem.parquet'"
    ).fetchone()[0]
    assert total == sold
    assert all(r.avg_cv >= 0 for r in rows)


def test_revenue_bridge_effects_reconcile(spark, sf_dir):
    # for every (nation, year): rev_curr - rev_prev == volume + price
    # + new + churned, up to the documented 1e-4-cent floor-scaling
    # granularity (one floor per part per effect)
    rows = REGISTRY["nation_revenue_bridge"].spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        delta = r.rev_curr - r.rev_prev
        decomp = (
            r.volume_effect
            + r.price_effect
            + r.new_parts_effect
            + r.churned_parts_effect
        )
        # floors lose < 1e-4 cents per part-term; bound generously
        assert abs(delta - decomp) < 1.0, (r.nation, r.yr, delta, decomp)


def test_clustering_coeff_bounds_and_triangle_consistency(spark, sf_dir):
    rows = REGISTRY["supplier_graph_clustering"].spark_fn(spark, sf_dir).collect()
    assert rows
    tri = {
        r.node: r.triangles
        for r in REGISTRY["supplier_graph_triangles"].spark_fn(spark, sf_dir).collect()
    }
    for r in rows:
        assert r.deg >= 2
        assert 0.0 <= r.clustering_coeff <= 1.0
        assert r.triangles == tri.get(r.node, 0)


def test_item_item_cf_invariants(spark, sf_dir):
    rows = REGISTRY["part_item_item_cf"].spark_fn(spark, sf_dir).collect()
    assert rows
    by_part = {}
    for r in rows:
        assert 1 <= r.rank <= 5
        assert 0.0 < r.cosine <= 1.0
        assert r.customers_both >= 2
        assert r.part_i != r.part_j
        by_part.setdefault(r.part_i, []).append(r)
    for _, rs in by_part.items():
        rs.sort(key=lambda r: r.rank)
        ranks = [r.rank for r in rs]
        assert ranks == list(range(1, len(rs) + 1))


def test_target_encoding_loo_ordering(spark, sf_dir):
    rows = REGISTRY["part_brand_target_encoding"].spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.returns <= r.n
        if r.n > 1 and 0 < r.returns < r.n:
            # removing a positive lowers the mean; removing a negative raises it
            assert r.enc_if_returned <= r.return_rate <= r.enc_if_not
        # LOO dictionary reconstructs from (n, returns) exactly
        if r.n > 1:
            assert abs(r.enc_if_returned - round((r.returns - 1) / (r.n - 1), 6)) < 1e-9
            assert abs(r.enc_if_not - round(r.returns / (r.n - 1), 6)) < 1e-9


def test_interpurchase_gap_counts(spark, sf_dir, duck):
    rows = REGISTRY["customer_interpurchase_gaps"].spark_fn(spark, sf_dir).collect()
    assert {r.seg for r in rows} == {
        s[0] for s in duck.execute(
            f"SELECT DISTINCT c_mktsegment FROM '{sf_dir}/customer.parquet'"
        ).fetchall()
    }
    # gaps per segment = orders - customers_with_orders in that segment
    expected = dict(duck.execute(
        f"""SELECT c_mktsegment, count(*) - count(DISTINCT o_custkey)
            FROM '{sf_dir}/orders.parquet' o
            JOIN '{sf_dir}/customer.parquet' c ON c.c_custkey = o.o_custkey
            GROUP BY 1"""
    ).fetchall())
    for r in rows:
        assert r.n_gaps == expected[r.seg]
        assert 0 <= r.median_days <= r.p90_days
        assert r.mean_days > 0


def test_compaction_plan_conserves_and_is_contiguous(spark, sf_dir, duck):
    rows = sorted(
        REGISTRY["documents_compaction_plan"].spark_fn(spark, sf_dir).collect(),
        key=lambda r: r.group_id,
    )
    total = duck.execute(
        f"SELECT sum(n_chars) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    assert sum(r.bytes for r in rows) == total
    assert [r.group_id for r in rows] == list(range(len(rows)))
    for r in rows:
        assert r.fill_bp == r.bytes * 10000 // 8192
        assert r.n_files >= 1


def test_user_entropy_bands(spark, sf_dir, duck):
    import math

    rows = REGISTRY["events_user_entropy"].spark_fn(spark, sf_dir).collect()
    n_users = duck.execute(
        f"SELECT count(DISTINCT user_id) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert sum(r.users for r in rows) == n_users
    max_band = int(10 * math.log(5))  # 5 event types -> H <= ln 5
    for r in rows:
        assert 0 <= r.entropy_band <= max_band
        assert r.avg_types >= 1


def test_sax_words_well_formed(spark, sf_dir):
    rows = REGISTRY["events_hourly_sax"].spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert len(r.word) == 6 and set(r.word) <= set("abcd")
        assert r.days >= 1
    # words cover every complete day exactly once
    total_days = sum(r.days for r in rows)
    assert total_days >= 1


def test_cramers_v_vs_pandas(spark, sf_dir, duck):
    rows = REGISTRY["events_type_hour_cramers_v"].spark_fn(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 20
    v = rows[0].cramers_v
    assert all(r.cramers_v == v for r in rows)
    assert 0.0 <= v <= 1.0
    pdf = duck.execute(
        f"""SELECT event_type, hour(CAST(ts AS TIMESTAMP)) AS hod, count(*) AS o
            FROM '{sf_dir}/events.parquet' GROUP BY 1, 2"""
    ).df()
    piv = pdf.pivot_table(index="event_type", columns="hod", values="o",
                          fill_value=0)
    import numpy as np

    obs = piv.to_numpy(dtype=float)
    n = obs.sum()
    e = obs.sum(1, keepdims=True) @ obs.sum(0, keepdims=True) / n
    chi2 = ((obs - e) ** 2 / e)[obs + e > 0].sum()
    ref_v = float(np.sqrt(chi2 / (n * (min(obs.shape) - 1))))
    assert abs(v - ref_v) < 1e-4
    # residuals ranked by absolute value
    resids = [abs(r.std_residual) for r in rows]
    assert resids == sorted(resids, reverse=True)


def test_burstiness_conserves_users(spark, sf_dir, duck):
    rows = REGISTRY["events_user_burstiness"].spark_fn(spark, sf_dir).collect()
    n_users = duck.execute(
        f"SELECT count(DISTINCT user_id) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert sum(r.users for r in rows) == n_users
    for r in rows:
        assert 0 <= r.fano_band <= 20


def test_mutual_info_vs_pandas(spark, sf_dir, duck):
    import numpy as np

    r = REGISTRY["events_type_hour_mutual_info"].spark_fn(spark, sf_dir).first()
    assert r.mi_nats >= 0
    assert r.mi_nats <= min(r.h_type, r.h_hour) + 1e-6
    assert 0.0 <= r.nmi <= 1.0
    pdf = duck.execute(
        f"""SELECT event_type, hour(CAST(ts AS TIMESTAMP)) AS hod, count(*) AS o
            FROM '{sf_dir}/events.parquet' GROUP BY 1, 2"""
    ).df()
    o = pdf["o"].to_numpy(dtype=float)
    n = o.sum()
    rm = pdf.groupby("event_type")["o"].sum().to_numpy(dtype=float)
    cm = pdf.groupby("hod")["o"].sum().to_numpy(dtype=float)
    ref = (
        (o * np.log(o)).sum() - (rm * np.log(rm)).sum()
        - (cm * np.log(cm)).sum() + n * np.log(n)
    ) / n
    assert abs(r.mi_nats - ref) < 1e-5


def test_pps_ht_estimate_calibration(spark, sf_dir, duck):
    rows = REGISTRY["orders_pps_ht_estimate"].spark_fn(spark, sf_dir).collect()
    n_orders = duck.execute(
        f"SELECT count(*) FROM '{sf_dir}/orders.parquet'"
    ).fetchone()[0]
    assert sum(r.true_orders for r in rows) == n_orders
    total_sampled = sum(r.sampled_orders for r in rows)
    # step = W div 1000 yields ~1000 boundary hits (certainty units can
    # absorb several steps each)
    assert 900 <= total_sampled <= 1100
    for r in rows:
        assert r.ht_estimate > 0
        # HT is unbiased; with ~200 samples/stratum the realized error
        # stays well inside 30%
        assert r.abs_err_bp < 3000


def test_neyman_allocation_shares(spark, sf_dir, duck):
    rows = REGISTRY["orders_neyman_allocation"].spark_fn(spark, sf_dir).collect()
    n_orders = duck.execute(
        f"SELECT count(*) FROM '{sf_dir}/orders.parquet'"
    ).fetchone()[0]
    assert sum(r.nh for r in rows) == n_orders
    # floored shares: sum within one floor-loss per stratum of 10000
    s_bp = sum(r.neyman_share_bp for r in rows)
    assert 10000 - len(rows) <= s_bp <= 10000
    p_bp = sum(r.proportional_share_bp for r in rows)
    assert 10000 - len(rows) <= p_bp <= 10000
    n_alloc = sum(r.neyman_n_of_1000 for r in rows)
    assert 1000 - len(rows) <= n_alloc <= 1000
    for r in rows:
        assert r.sd_price >= 0 and r.mean_price > 0


def test_simpson_audit_partition(spark, sf_dir, duck):
    r = REGISTRY["lineitem_simpson_audit"].spark_fn(spark, sf_dir).first()
    n_brands = duck.execute(
        f"SELECT count(DISTINCT p_brand) FROM '{sf_dir}/part.parquet'"
    ).fetchone()[0]
    assert r.strata == n_brands
    assert r.strata_agree + r.strata_reverse + r.strata_tied == r.strata
    assert 0 <= r.rate_discounted <= 1 and 0 <= r.rate_full_price <= 1
    assert r.overall_sign in (-1, 0, 1)
    if r.overall_sign == 1:
        assert r.rate_discounted >= r.rate_full_price
    if r.simpson_flag:
        assert r.strata_reverse > r.strata_agree


def test_theil_decomposition_identity(spark, sf_dir):
    rows = REGISTRY["nation_theil_decomposition"].spark_fn(spark, sf_dir).collect()
    assert rows
    total = rows[0].theil_total
    between = rows[0].theil_between
    assert all(r.theil_total == total and r.theil_between == between
               for r in rows)
    assert total >= 0 and between >= 0
    # additive decomposability: total = between + sum(share * within)
    recomposed = between + sum(
        (r.revenue_share_bp / 10000.0) * r.theil_within for r in rows
    )
    # shares are floored to bp -> small slack
    assert abs(total - recomposed) < 5e-3
    assert all(r.theil_within >= -1e-9 for r in rows)


def test_dow_seasonality_index_structure(spark, sf_dir):
    rows = REGISTRY["orders_dow_seasonality"].spark_fn(spark, sf_dir).collect()
    by_pri = {}
    for r in rows:
        assert 1 <= r.dow <= 7
        assert r.volume_idx_bp > 0 and r.value_idx_bp > 0
        by_pri.setdefault(r.o_orderpriority, []).append(r)
    for pri, rs in by_pri.items():
        assert len(rs) == 7
        # volume indices average to ~10000 (floor loss < 7 bp each)
        s = sum(x.volume_idx_bp for x in rs)
        assert 7 * 10000 - 7 * 7 <= s <= 7 * 10000


def test_rca_matrix_structure(spark, sf_dir, duck):
    rows = REGISTRY["nation_brand_rca"].spark_fn(spark, sf_dir).collect()
    total = duck.execute(
        f"""SELECT round(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                   / 100.0, 2)
            FROM '{sf_dir}/lineitem.parquet'"""
    ).fetchone()[0]
    assert abs(sum(r.revenue for r in rows) - total) < 0.01 * len(rows)
    for r in rows:
        assert r.rca_bp >= 0
        assert r.specialized == (1 if r.rca_bp > 10000 else 0)
    # every nation over-indexes on at least one brand
    spec_nations = {r.nation for r in rows if r.specialized}
    all_nations = {r.nation for r in rows}
    assert spec_nations == all_nations


def test_slow_mover_report_conserves_parts(spark, sf_dir, duck):
    rows = REGISTRY["part_slow_mover_report"].spark_fn(spark, sf_dir).collect()
    sold = duck.execute(
        f"SELECT count(DISTINCT l_partkey) FROM '{sf_dir}/lineitem.parquet'"
    ).fetchone()[0]
    assert sum(r.parts for r in rows) == sold
    for r in rows:
        assert 0 <= r.age_quarters <= 4
        assert r.lifetime_units >= r.parts  # every part shipped >= 1 unit
        assert r.locked_retail_value > 0


def test_pchart_limits_and_flags(spark, sf_dir):
    rows = REGISTRY["events_error_pchart"].spark_fn(spark, sf_dir).collect()
    assert rows
    pbar = rows[0].p_bar
    for r in rows:
        assert r.p_bar == pbar
        assert 0 <= r.lcl <= pbar <= r.ucl <= 1
        assert abs(r.p_day - round(r.errors / r.events, 6)) < 1e-9
        if r.out_of_control == 1:
            assert r.p_day > r.ucl
        elif r.out_of_control == -1:
            assert r.p_day < r.lcl
        else:
            assert r.lcl <= r.p_day <= r.ucl


def test_elasticity_vs_numpy(spark, sf_dir, duck):
    import numpy as np

    r = REGISTRY["lineitem_price_qty_elasticity"].spark_fn(spark, sf_dir).first()
    pdf = duck.execute(
        f"""SELECT CAST(round(l_quantity) AS BIGINT) AS qb,
                   CAST(round(l_extendedprice * 100) AS BIGINT) // 10000 AS pb
            FROM '{sf_dir}/lineitem.parquet' WHERE round(l_quantity) >= 1"""
    ).df()
    x = np.log(pdf["pb"].to_numpy() * 10000 + 5000)
    y = np.log(pdf["qb"].to_numpy(dtype=float))
    slope, _ = np.polyfit(x, y, 1)
    assert abs(r.elasticity - slope) < 1e-3
    assert 0 <= r.r_squared <= 1


def test_lognormal_fit_vs_numpy(spark, sf_dir):
    r = REGISTRY["events_session_lognormal_fit"].spark_fn(spark, sf_dir).first()
    assert r.sessions > 0 and r.sigma >= 0
    # fitted median = exp(mu) by construction
    import math

    assert abs(r.fitted_median_s - round(math.exp(r.mu), 2)) < 0.05
    # the lognormal p90 must exceed its median; empirical quantiles ordered
    assert r.fitted_p90_s > r.fitted_median_s
    assert r.emp_median_s <= r.emp_p90_s


def test_cohort_halflife_sanity(spark, sf_dir):
    rows = REGISTRY["events_cohort_halflife"].spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.weeks_observed >= 3
        assert r.cohort_size > 0
        if r.half_life_weeks is not None:
            assert r.decay_slope < 0
            assert r.half_life_weeks > 0


@pytest.mark.slowtier
def test_assortativity_vs_numpy(spark, sf_dir):
    import numpy as np

    r = REGISTRY["supplier_graph_assortativity"].spark_fn(spark, sf_dir).first()
    assert -1.0 <= r.assortativity <= 1.0
    from data_pipelines_snowflake_procedures_spark.queries import _cosupplier_edges

    e = _cosupplier_edges(spark, sf_dir, k=10).toPandas()
    deg = {}
    for _, row in e.iterrows():
        deg[row.a] = deg.get(row.a, 0) + 1
        deg[row.b] = deg.get(row.b, 0) + 1
    xs, ys = [], []
    for _, row in e.iterrows():
        xs += [deg[row.a], deg[row.b]]
        ys += [deg[row.b], deg[row.a]]
    ref = np.corrcoef(np.array(xs, dtype=float), np.array(ys, dtype=float))[0, 1]
    assert abs(r.assortativity - ref) < 1e-4
    assert r.edges == len(e) and r.nodes == len(deg)


def test_gtest_top_pairs_significant_and_ranked(spark, sf_dir):
    rows = REGISTRY["part_basket_rules_gtest"].spark_fn(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 20
    gs = [r.g_stat for r in rows]
    assert gs == sorted(gs, reverse=True)
    for r in rows:
        assert r.support >= 2
        assert r.support_a >= r.support and r.support_b >= r.support
        assert r.significant_at_05 == (1 if r.g_stat > 3.841 else 0)
        assert r.lift > 0


def test_markov_stationary_sums_and_matches_numpy(spark, sf_dir, duck):
    import numpy as np

    rows = REGISTRY["events_markov_stationary"].spark_fn(spark, sf_dir).collect()
    assert len(rows) == 5
    s_bp = sum(r.stationary_bp for r in rows)
    assert 10000 - 10 <= s_bp <= 10000
    # numpy power iteration on the same transition counts
    pdf = duck.execute(
        f"""WITH seq AS (
              SELECT event_type AS cur,
                     lead(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS nxt
              FROM '{sf_dir}/events.parquet')
            SELECT cur, nxt, count(*) AS c FROM seq
            WHERE nxt IS NOT NULL GROUP BY 1, 2"""
    ).df()
    types = sorted({r.event_type for r in rows})
    idx = {t: i for i, t in enumerate(types)}
    m = np.zeros((5, 5))
    for _, r in pdf.iterrows():
        m[idx[r.cur], idx[r.nxt]] = r.c
    p = m / m.sum(axis=1, keepdims=True)
    v = np.full(5, 0.2)
    for _ in range(4):
        v = v @ p
    for r in rows:
        ref_bp = v[idx[r.event_type]] / v.sum() * 10000
        assert abs(r.stationary_bp - ref_bp) <= 2  # integer-scale floors
        assert r.delta_bp == r.stationary_bp - r.empirical_bp


def test_price_ladder_gap_bounds(spark, sf_dir):
    rows = REGISTRY["part_price_ladder_gaps"].spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.price_points >= 2
        assert r.min_price < r.max_price
        assert 0 < r.max_gap_cents <= round((r.max_price - r.min_price) * 100)
        assert 0 < r.max_gap_share_bp <= 10000
        assert r.avg_gap_cents <= r.max_gap_cents


def test_periodogram_daily_dominates(spark, sf_dir):
    rows = {r.period_hours: r for r in
            REGISTRY["events_hourly_periodogram"].spark_fn(spark, sf_dir).collect()}
    assert set(rows) == {12, 24, 84, 168}
    for r in rows.values():
        assert r.amplitude >= 0
        assert 0 <= r.var_share_bp <= 10000


def test_timeout_sweep_monotone(spark, sf_dir):
    rows = {r.timeout_min: r for r in
            REGISTRY["events_session_timeout_sweep"].spark_fn(spark, sf_dir).collect()}
    assert set(rows) == {15, 30, 60}
    # longer timeout merges sessions: counts weakly decrease
    assert rows[15].sessions >= rows[30].sessions >= rows[60].sessions
    assert rows[30].vs_30min_bp == 10000
    assert rows[15].vs_30min_bp >= 10000 >= rows[60].vs_30min_bp
    for r in rows.values():
        assert r.avg_events_per_session >= 1


def test_anova_vs_numpy(spark, sf_dir, duck):
    import numpy as np

    r = REGISTRY["part_size_price_anova"].spark_fn(spark, sf_dir).first()
    pdf = duck.execute(
        f"""SELECT p_size, CAST(round(p_retailprice * 100) AS BIGINT) AS w
            FROM '{sf_dir}/part.parquet'"""
    ).df()
    groups = [g["w"].to_numpy(dtype=float) for _, g in pdf.groupby("p_size")]
    n = sum(len(g) for g in groups)
    k = len(groups)
    mu = pdf["w"].mean()
    ssb = sum(len(g) * (g.mean() - mu) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r.k == k and r.n == n
    assert abs(r.f_stat - f) < 1e-2
    assert abs(r.eta_squared - ssb / (ssb + ssw)) < 1e-4


def test_wilson_ci_vs_formula(spark, sf_dir):
    import math

    rows = REGISTRY["orders_wilson_ci_by_priority"].spark_fn(spark, sf_dir).collect()
    assert len(rows) == 5
    z = 1.96
    for r in rows:
        assert 0 <= r.wilson_lo <= r.p_hat <= r.wilson_hi <= 1
        p, n = r.late_orders / r.n, r.n
        lo = (p + z * z / (2 * n)
              - z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))) \
             / (1 + z * z / n)
        hi = (p + z * z / (2 * n)
              + z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))) \
             / (1 + z * z / n)
        assert abs(r.wilson_lo - lo) < 1e-4 and abs(r.wilson_hi - hi) < 1e-4


def test_status_aging_shares(spark, sf_dir, duck):
    rows = REGISTRY["orders_status_aging"].spark_fn(spark, sf_dir).collect()
    n_orders = duck.execute(
        f"SELECT count(*) FROM '{sf_dir}/orders.parquet'"
    ).fetchone()[0]
    assert sum(r.orders for r in rows) == n_orders
    by_age = {}
    for r in rows:
        assert 0 <= r.age_halfyears <= 4
        assert r.order_value > 0
        by_age.setdefault(r.age_halfyears, 0)
        by_age[r.age_halfyears] += r.age_share_bp
    for age, s in by_age.items():
        assert 10000 - 3 <= s <= 10000  # floor loss < 1bp per status


def test_bot_score_partitions_users(spark, sf_dir, duck):
    rows = REGISTRY["events_bot_score_histogram"].spark_fn(spark, sf_dir).collect()
    n_users = duck.execute(
        f"SELECT count(DISTINCT user_id) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert sum(r.users for r in rows) == n_users
    s_bp = sum(r.share_bp for r in rows)
    assert 10000 - len(rows) <= s_bp <= 10000
    for r in rows:
        assert 0 <= r.bot_score <= 4


def test_activation_funnel_partitions_users(spark, sf_dir, duck):
    rows = REGISTRY["events_activation_funnel"].spark_fn(spark, sf_dir).collect()
    n_users = duck.execute(
        f"SELECT count(DISTINCT user_id) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert sum(r.users for r in rows) == n_users
    for r in rows:
        assert 1 <= r.day0_events_bucket <= 5
        assert 0 <= r.activated <= r.users
        assert r.activation_bp == r.activated * 10000 // r.users


def test_power_analysis_scaling_law(spark, sf_dir):
    rows = {r.mde_bp: r for r in
            REGISTRY["events_ab_power_analysis"].spark_fn(spark, sf_dir).collect()}
    assert set(rows) == {100, 500, 1000}
    # n scales inversely with mde^2: 1% needs ~25x the 5% sample
    assert rows[100].n_per_arm > rows[500].n_per_arm > rows[1000].n_per_arm
    ratio = rows[100].n_per_arm / rows[1000].n_per_arm
    assert 90 <= ratio <= 110  # (10/1)^2 = 100 up to ceil slack
    for r in rows.values():
        assert r.sd_value > 0 and r.mean_value > 0


def test_hill_alpha_vs_numpy(spark, sf_dir, duck):
    import numpy as np

    r = REGISTRY["documents_length_tail_hill"].spark_fn(spark, sf_dir).first()
    lens = duck.execute(
        f"""SELECT n_chars FROM '{sf_dir}/documents.parquet'
            ORDER BY n_chars DESC, doc_id LIMIT 101"""
    ).df()["n_chars"].to_numpy(dtype=float)
    ref = 100 / np.log(lens[:100] / lens[100]).sum()
    assert r.k == 100
    assert abs(r.hill_alpha - ref) < 1e-2
    assert r.hill_alpha > 0 and r.threshold_chars > 0


def test_heaps_fit_in_plausible_range(spark, sf_dir):
    r = REGISTRY["documents_vocab_heaps_law"].spark_fn(spark, sf_dir).first()
    assert r.growth_points == 10
    # natural text gives beta in (0, 1); the SYNTHETIC corpus has a
    # tiny closed vocabulary (~31 types, all seen in bucket 0), so
    # beta legitimately collapses to 0 and K equals the vocab size
    assert 0 <= r.heaps_beta < 1
    assert r.heaps_k > 0
    if r.heaps_beta == 0:
        assert 10 <= r.heaps_k <= 100  # K = the closed vocabulary size
