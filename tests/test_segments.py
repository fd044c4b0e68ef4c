"""Tests for RFM segmentation, Markov transitions, seasonal LOO
anomalies, and exact stratified splits — hand-data halves; oracle
parity runs in test_queries_oracle.py."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from data_pipelines_snowflake_procedures_spark.operators.corpus import (
    assign_split,
    stratified_split,
)
from data_pipelines_snowflake_procedures_spark.queries import REGISTRY


def test_stratified_split_exact_proportions_per_stratum(spark):
    """Every stratum lands within 1 row of its target fraction — even
    a 10-row stratum gets exactly 8/1/1, where assign_split's
    independent hash buckets only hit that in expectation."""
    rows = [(i, "en") for i in range(100)] + [(1000 + i, "fr") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = stratified_split(df).groupBy("lang", "split").count().collect()
    got = {(r["lang"], r["split"]): r["count"] for r in out}
    assert got == {
        ("en", "train"): 80, ("en", "val"): 10, ("en", "test"): 10,
        ("fr", "train"): 8, ("fr", "val"): 1, ("fr", "test"): 1,
    }
    # determinism: same seed → identical assignment; new seed resamples
    a = {r["doc_id"]: r["split"] for r in stratified_split(df).collect()}
    b = {r["doc_id"]: r["split"] for r in stratified_split(df).collect()}
    assert a == b
    c = {r["doc_id"]: r["split"] for r in stratified_split(df, seed="other").collect()}
    assert a != c
    # the exactness assign_split lacks: same 10-row stratum under
    # hash-bucketing is NOT guaranteed 8/1/1 (property shown at least
    # not to hold universally — proportions come from counting, not luck)
    hash_out = (
        assign_split(df.filter(F.col("lang") == "fr"),
                     weights={"train": 0.8, "val": 0.1, "test": 0.1})
        .groupBy("split").count().collect()
    )
    hash_counts = sorted(r["count"] for r in hash_out)
    assert sum(hash_counts) == 10  # sanity; exactness not guaranteed here


def test_transition_probabilities_row_stochastic(spark, sf_dir):
    out = REGISTRY["events_type_transitions"].spark_fn(spark, sf_dir)
    rows = out.collect()
    assert rows, "expected transitions"
    by_cur: dict[str, float] = {}
    for r in rows:
        assert r["cnt"] >= 1
        by_cur[r["cur"]] = by_cur.get(r["cur"], 0.0) + r["p"]
    for cur, total in by_cur.items():
        assert abs(total - 1.0) < 1e-4, (cur, total)


def test_seasonal_anomaly_loo_hand_values(spark):
    """Stratum of five Mondays-at-9 with counts 3,3,3,3,30: the spike's
    LOO mean is 3, LOO var 0 → excluded (var>0 gate); make one baseline
    differ (3,3,3,4,30) and the spike must flag with the hand-computed
    LOO z, while baseline rows stay under threshold."""
    base = dt.datetime(2024, 1, 1, 9)  # a Monday
    rows = []
    counts = [3, 3, 3, 4, 30]
    for week, cnt in enumerate(counts):
        t0 = base + dt.timedelta(weeks=week)
        for i in range(cnt):
            rows.append((len(rows), t0 + dt.timedelta(seconds=i), 1, "click", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    hourly = df.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("cnt"))
    # replicate the entry's internals on an in-memory frame
    keyed = hourly.select(
        "event_type", "h", "cnt",
        F.dayofweek("h").cast("long").alias("dow"),
        F.hour("h").cast("long").alias("hod"),
    )
    seas = keyed.groupBy("event_type", "dow", "hod").agg(
        F.count("*").alias("n"), F.sum("cnt").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("ss"),
    )
    j = keyed.join(seas, ["event_type", "dow", "hod"]).filter(F.col("n") >= 4)
    s_d = F.col("s").cast("double")
    loo_mean = (s_d - F.col("cnt")) / (F.col("n") - 1)
    loo_var = (
        F.col("ss").cast("double")
        - F.col("cnt").cast("double") * F.col("cnt")
        - (F.col("n") - 1) * loo_mean * loo_mean
    ) / (F.col("n") - 2)
    z = (F.col("cnt") - loo_mean) / F.sqrt(loo_var)
    flagged = j.filter((loo_var > 0) & (F.abs(z) >= 3)).select(
        "cnt", F.round(z, 4).alias("z")
    ).collect()
    assert len(flagged) == 1
    spike = flagged[0]
    assert spike["cnt"] == 30
    # hand computation: others = [3,3,3,4] → mean 3.25, var (ddof=1) 0.25
    want = (30 - 3.25) / math.sqrt(0.25)
    assert spike["z"] == round(want, 4)


def test_rfm_quartiles_balanced_within_nation(spark, sf_dir):
    out = REGISTRY["customer_rfm_segments"].spark_fn(spark, sf_dir)
    rows = out.collect()
    assert rows
    for col in ("r_q", "f_q", "m_q"):
        per = {}
        for r in rows:
            per.setdefault(r["c_nationkey"], {}).setdefault(r[col], 0)
            per[r["c_nationkey"]][r[col]] += 1
        for nation, buckets in per.items():
            assert set(buckets) == {1, 2, 3, 4}, (col, nation)
            sizes = sorted(buckets.values())
            assert sizes[-1] - sizes[0] <= 1, (col, nation, buckets)
    # recency is non-negative and someone ordered on the anchor day
    assert min(r["recency_days"] for r in rows) == 0


def _pq(sf_dir, table):
    import pandas as pd

    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def test_welch_ab_test_matches_numpy(spark, sf_dir):
    import numpy as np

    ev = _pq(sf_dir, "events")
    a = np.round(ev.loc[ev.event_type == "click", "value"].to_numpy() * 100)
    b = np.round(ev.loc[ev.event_type == "view", "value"].to_numpy() * 100)
    ma, mb = a.sum() / len(a) / 100, b.sum() / len(b) / 100
    va = (np.sum(a * a) - a.sum() ** 2 / len(a)) / (len(a) - 1) / 10000
    vb = (np.sum(b * b) - b.sum() ** 2 / len(b)) / (len(b) - 1) / 10000
    sea, seb = va / len(a), vb / len(b)
    t = (ma - mb) / math.sqrt(sea + seb)
    df = (sea + seb) ** 2 / (sea**2 / (len(a) - 1) + seb**2 / (len(b) - 1))
    row = REGISTRY["events_value_ab_test"].spark_fn(spark, sf_dir).collect()[0]
    assert (row["n_a"], row["n_b"]) == (len(a), len(b))
    assert abs(row["t_stat"] - t) < 1e-3
    assert abs(row["welch_df"] - df) < 0.5
    assert row["mean_a"] == round(ma, 4) and row["mean_b"] == round(mb, 4)


def test_chisq_matches_numpy(spark, sf_dir):
    import numpy as np

    ev = _pq(sf_dir, "events")
    hod = ev["ts"].dt.hour
    table = ev.groupby(["event_type", hod]).size()
    obs = table.unstack(fill_value=0).to_numpy().astype(float)
    # drop all-zero columns (cells absent from both engines' cell list)
    obs = obs[:, obs.sum(axis=0) > 0]
    r, c = obs.sum(axis=1, keepdims=True), obs.sum(axis=0, keepdims=True)
    e = r @ c / obs.sum()
    chi2 = float(((obs - e) ** 2 / e)[obs > 0].sum())
    row = REGISTRY["events_type_hour_chisq"].spark_fn(spark, sf_dir).collect()[0]
    assert row["dof"] == (obs.shape[0] - 1) * (obs.shape[1] - 1)
    assert row["n_cells"] == int((obs > 0).sum())
    # entry sums only OBSERVED cells (zero cells don't exist in the
    # grouped frame); numpy recomputation above matches that convention
    assert abs(row["chi2"] - chi2) < 0.01


def test_gini_matches_numpy_and_bounds(spark, sf_dir):
    import numpy as np

    orders = _pq(sf_dir, "orders")
    cust = _pq(sf_dir, "customer")[["c_custkey", "c_nationkey"]]
    rev = (
        orders.assign(cents=np.round(orders.o_totalprice * 100).astype("int64"))
        .groupby("o_custkey")["cents"].sum().reset_index()
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
    )
    rows = REGISTRY["nation_revenue_gini"].spark_fn(spark, sf_dir).collect()
    got = {r["c_nationkey"]: r for r in rows}
    for nk, grp in rev.groupby("c_nationkey"):
        x = np.sort(grp["cents"].to_numpy())
        n = len(x)
        gini = (2 * np.sum((np.arange(1, n + 1)) * x) - (n + 1) * x.sum()) / (
            n * x.sum()
        )
        r = got[nk]
        assert r["n_customers"] == n
        assert abs(r["gini"] - gini) < 1e-6, nk
        assert 0.0 <= r["gini"] < 1.0


def test_ols_trend_matches_numpy_polyfit(spark, sf_dir):
    import numpy as np

    ev = _pq(sf_dir, "events")
    hourly = (
        ev.assign(
            x=(
                ev.ts.dt.floor("h").astype("datetime64[s]").astype("int64")
                // 3600
            ),
            cents=np.round(ev.value * 100).astype("int64"),
        )
        .groupby("x")["cents"].sum()
    )
    x = hourly.index.to_numpy().astype(float)
    y = hourly.to_numpy().astype(float)
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    row = REGISTRY["events_value_trend_ols"].spark_fn(spark, sf_dir).collect()[0]
    assert row["n_hours"] == len(x)
    assert abs(row["slope_cents_per_hour"] - slope) < 1e-3
    assert abs(row["intercept_cents"] - intercept) < 1.0
    assert abs(row["r2"] - r * r) < 1e-6


def test_user_accounting_invariants(spark, sf_dir):
    rows = REGISTRY["events_user_accounting"].spark_fn(spark, sf_dir).collect()
    rows.sort(key=lambda r: r["day"])
    ev = _pq(sf_dir, "events")
    assert rows[-1]["cumulative_users"] == ev.user_id.nunique()
    assert rows[0]["new_users"] == rows[0]["active_users"]  # day 1: all new
    assert rows[0]["returning_users"] == 0
    running = 0
    for r in rows:
        assert r["active_users"] == r["new_users"] + r["returning_users"]
        running += r["new_users"]
        assert r["cumulative_users"] == running


def test_stl_reconstruction_and_seasonal_centering(spark, sf_dir):
    rows = REGISTRY["events_hourly_stl"].spark_fn(spark, sf_dir).collect()
    assert rows
    by_stratum: dict = {}
    for r in rows:
        # decomposition reconstructs the observation (up to rounding)
        assert abs((r["trend"] + r["seasonal"] + r["residual"]) - r["n_events"]) < 3e-4
        key = (r["event_type"], r["hour"].weekday(), r["hour"].hour)
        by_stratum.setdefault(key, []).append(r["residual"])
    # residuals average ~0 within every stratum (seasonal absorbed it)
    for key, res in by_stratum.items():
        assert abs(sum(res) / len(res)) < 2e-3, key


def test_benford_digits_complete_and_consistent(spark, sf_dir):
    import numpy as np

    rows = REGISTRY["orders_benford_test"].spark_fn(spark, sf_dir).collect()
    got = {r["digit"]: r for r in rows}
    assert set(got) == set(range(1, 10))
    orders = _pq(sf_dir, "orders")
    n = len(orders)
    assert sum(r["observed"] for r in rows) == n
    # expected proportions are the Benford law and sum to n
    assert abs(sum(r["expected_n"] for r in rows) - n) < 0.01
    for d, r in got.items():
        assert abs(r["expected_n"] - n * math.log10(1 + 1 / d)) < 0.01
        assert r["chi2_term"] >= 0
    # cross-check observed counts against pandas
    cents = np.round(orders.o_totalprice * 100).astype("int64").astype(str)
    want = cents.str[0].astype(int).value_counts().to_dict()
    assert {d: r["observed"] for d, r in got.items()} == want


def test_weekly_churn_conservation(spark, sf_dir):
    rows = REGISTRY["events_weekly_churn"].spark_fn(spark, sf_dir).collect()
    rows.sort(key=lambda r: r["week_start"])
    assert rows
    first = rows[0]
    assert first["new_users"] == first["active_users"]
    assert first["retained_users"] == 0 and first["churned_from_prev"] == 0
    for prev, cur in zip(rows, rows[1:]):
        assert (
            cur["active_users"]
            == cur["new_users"] + cur["retained_users"] + cur["resurrected_users"]
        )
        assert cur["churned_from_prev"] == prev["active_users"] - cur["retained_users"]
        assert cur["resurrected_users"] >= 0


def test_conversion_latency_matches_pandas(spark, sf_dir):
    import numpy as np

    ev = _pq(sf_dir, "events")
    fv = ev[ev.event_type == "view"].groupby("user_id")["ts"].min()
    p = ev[ev.event_type == "purchase"].merge(
        fv.rename("v_ts"), left_on="user_id", right_index=True
    )
    fp = p[p.ts >= p.v_ts].groupby("user_id")["ts"].min()
    lat = (
        fp.dt.floor("s").astype("datetime64[s]").astype("int64")
        - fv.loc[fp.index].dt.floor("s").astype("datetime64[s]").astype("int64")
    ).to_numpy()
    lat.sort()
    n = len(lat)
    med = lat[math.ceil(n / 2) - 1]
    p90 = lat[math.ceil(0.9 * n) - 1]
    row = REGISTRY["events_conversion_latency"].spark_fn(spark, sf_dir).collect()[0]
    assert row["n_view_users"] == len(fv)
    assert row["n_converted"] == n
    assert row["conversion_rate"] == round(n / len(fv), 6)
    assert row["median_latency_s"] == med
    assert row["p90_latency_s"] == p90


def test_similarity_calibration_pair_budget_and_bins(spark, sf_dir):
    import hashlib

    import pandas as pd

    rows = REGISTRY["embedding_similarity_calibration"].spark_fn(spark, sf_dir).collect()
    assert rows
    assert all(0 <= r["bin"] <= 19 for r in rows)
    assert all(r["bin_lo"] == round(r["bin"] / 10 - 1.0, 1) for r in rows)
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")["vec_id"]
    sizes: dict[int, int] = {}
    for vid in emb:
        h = hashlib.md5(f"pair|{vid}".encode()).hexdigest()
        b = int(h[:4], 16) % 64
        sizes[b] = sizes.get(b, 0) + 1
    want_pairs = sum(s // 2 for s in sizes.values())
    assert sum(r["n_pairs"] for r in rows) == want_pairs


def test_lead_lag_correlation_matches_numpy(spark, sf_dir):
    import numpy as np
    import pandas as pd

    ev = _pq(sf_dir, "events")
    ev = ev[ev.event_type.isin(["click", "purchase"])]
    hours = (
        ev.ts.dt.floor("h").astype("datetime64[s]").astype("int64") // 3600
    )
    tab = pd.crosstab(hours, ev.event_type)
    rows = REGISTRY["events_lead_lag_correlation"].spark_fn(spark, sf_dir).collect()
    got = {r["lag"]: r for r in rows}
    assert set(got) == set(range(-3, 4))
    for lag, r in got.items():
        a, b = [], []
        for x, arow in tab.iterrows():
            if x + lag in tab.index:
                a.append(arow["click"])
                b.append(tab.loc[x + lag, "purchase"])
        want = np.corrcoef(np.array(a, float), np.array(b, float))[0, 1]
        assert r["n"] == len(a)
        assert abs(r["r"] - want) < 1e-6, lag


def test_abc_classification_pareto_invariants(spark, sf_dir):
    rows = REGISTRY["part_abc_classification"].spark_fn(spark, sf_dir).collect()
    assert rows
    by_brand: dict = {}
    for r in rows:
        by_brand.setdefault(r["p_brand"], []).append(r)
    for brand, parts in by_brand.items():
        parts.sort(key=lambda r: (-r["revenue"], r["partkey"]))
        total = sum(r["revenue"] for r in parts)
        cum = 0.0
        seen_b = seen_c = False
        for r in parts:
            cum += r["revenue"]
            share = cum / total
            if r["abc_class"] == "A":
                assert not seen_b and not seen_c
                assert share <= 0.7 + 1e-9, (brand, share)
            elif r["abc_class"] == "B":
                seen_b = True
                assert not seen_c
                assert share <= 0.9 + 1e-9
            else:
                seen_c = True
        # classes are contiguous prefixes of the revenue ranking and the
        # top part of every brand is class A
        assert parts[0]["abc_class"] == "A", brand


def test_changepoint_finds_planted_level_shift(spark):
    """40 hours at ~3 events/hour then 40 hours at ~12: the argmax
    split must land exactly at the shift boundary and the before/after
    means must match the construction."""
    import data_pipelines_snowflake_procedures_spark.queries_events as qe

    base = dt.datetime(2024, 3, 1)
    rows = []
    for hour in range(80):
        level = 3 if hour < 40 else 12
        t0 = base + dt.timedelta(hours=hour)
        for i in range(level):
            rows.append(
                (len(rows), t0 + dt.timedelta(seconds=i), 1, "click", 1.0, "{}")
            )
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        res = qe.events_changepoint_detection(spark, d).collect()
    assert len(res) == 1
    r = res[0]
    assert r["change_hour"] == base + dt.timedelta(hours=39)
    assert r["before_mean"] == 3.0
    assert r["after_mean"] == 12.0


def test_fulfillment_latency_quantiles_match_pandas(spark, sf_dir):
    import numpy as np

    orders = _pq(sf_dir, "orders")[["o_orderkey", "o_orderdate", "o_orderpriority"]]
    li = _pq(sf_dir, "lineitem")[["l_orderkey", "l_shipdate"]]
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    d = (
        j.l_shipdate.dt.floor("D").astype("datetime64[s]").astype("int64")
        - j.o_orderdate.dt.floor("D").astype("datetime64[s]").astype("int64")
    ) // 86400
    rows = REGISTRY["order_fulfillment_latency"].spark_fn(spark, sf_dir).collect()
    got = {r["o_orderpriority"]: r for r in rows}
    for prio, grp in d.groupby(j.o_orderpriority):
        lat = np.sort(grp.to_numpy())
        n = len(lat)
        r = got[prio]
        assert r["n_lineitems"] == n
        assert r["median_days"] == lat[math.ceil(n / 2) - 1]
        assert r["p90_days"] == lat[math.ceil(0.9 * n) - 1]


def test_ltv_cohorts_reconcile_to_total_revenue(spark, sf_dir):
    import numpy as np

    rows = REGISTRY["customer_ltv_cohorts"].spark_fn(spark, sf_dir).collect()
    orders = _pq(sf_dir, "orders")
    total_cents = int(np.round(orders.o_totalprice * 100).astype("int64").sum())
    assert round(sum(r["revenue"] for r in rows), 2) == round(total_cents / 100, 2)
    assert sum(r["n_orders"] for r in rows) == len(orders)
    assert all(r["age_months"] >= 0 for r in rows)
    # age 0 cell of every cohort contains that cohort's first orders:
    # every cohort present at age 0
    cohorts = {r["cohort_m"] for r in rows}
    at_zero = {r["cohort_m"] for r in rows if r["age_months"] == 0}
    assert cohorts == at_zero


def test_split_drift_matches_numpy(spark, sf_dir):
    import hashlib

    import numpy as np
    import pandas as pd

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    def split_of(vid):
        h = hashlib.md5(f"split|{vid}".encode()).hexdigest()
        return "train" if int(h[:15], 16) % 1000000 < 800000 else "holdout"

    emb["split"] = emb.vec_id.map(split_of)
    mat = np.stack(emb.embedding.to_numpy())
    micro = np.floor(mat.astype("float64") * 1e6).astype("int64")
    rows = REGISTRY["embeddings_split_drift"].spark_fn(spark, sf_dir).collect()
    assert len(rows) == mat.shape[1]
    tr = micro[(emb.split == "train").to_numpy()]
    ho = micro[(emb.split == "holdout").to_numpy()]
    for r in rows:
        i = r["axis"] - 1
        mt = tr[:, i].sum() / len(tr) / 1e6
        mh = ho[:, i].sum() / len(ho) / 1e6
        assert r["mean_train"] == round(mt, 6)
        assert r["mean_holdout"] == round(mh, 6)
        assert r["drift"] == round(mt - mh, 6)


def test_completeness_report_boundary_days_null(spark, sf_dir):
    rows = REGISTRY["events_completeness_report"].spark_fn(spark, sf_dir).collect()
    assert rows
    days = sorted({r["day"] for r in rows})
    for r in rows:
        if r["day"] in (days[0], days[-1]):
            assert r["completeness"] is None and r["gap_flag"] == 0
        else:
            assert r["completeness"] == round(r["hours_observed"] / 24, 4)
            assert r["gap_flag"] == int(r["hours_observed"] < 24)
        assert 1 <= r["hours_observed"] <= 24


def test_mix_drift_flag_consistent(spark, sf_dir):
    rows = REGISTRY["events_mix_drift_days"].spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["chi2"] >= 0
        assert r["drift_flag"] == int(r["chi2"] >= 9.488)


def test_gains_table_invariants(spark, sf_dir):
    rows = REGISTRY["documents_lm_gains_table"].spark_fn(spark, sf_dir).collect()
    rows.sort(key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, 11))
    # exact deciles: sizes differ by at most 1
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # capture rates sum to 1 and cum_capture is their running total
    assert abs(sum(r["capture_rate"] for r in rows) - 1.0) < 1e-4
    run = 0.0
    for r in rows:
        run += r["n_pos"]
    assert rows[-1]["cum_capture"] == 1.0
    # lift averages to ~1 weighted by decile size
    total = sum(sizes)
    wavg = sum(r["lift"] * r["n_docs"] for r in rows) / total
    assert abs(wavg - 1.0) < 0.01


def test_forecast_intervals_and_support(spark, sf_dir):
    rows = REGISTRY["events_hourly_forecast"].spark_fn(spark, sf_dir).collect()
    assert rows
    days = {r["forecast_hour"][:10] for r in rows}
    assert len(days) == 1  # one target day
    ev = _pq(sf_dir, "events")
    last = ev.ts.max().date()
    assert days == {str(last + dt.timedelta(days=1))}
    for r in rows:
        assert r["lo_95"] <= r["forecast"] <= r["hi_95"]
        assert r["n_support"] >= 2


def test_backlog_curve_monotonic_bookkeeping(spark, sf_dir):
    rows = REGISTRY["orders_backlog_curve"].spark_fn(spark, sf_dir).collect()
    rows.sort(key=lambda r: r["month"])
    assert rows
    orders = _pq(sf_dir, "orders")
    li = _pq(sf_dir, "lineitem")
    # final backlog == orders that never fully ship by the last date
    done = li.groupby("l_orderkey")["l_shipdate"].max()
    placed = set(orders.o_orderkey)
    shipped = set(done.index) & placed
    # last month-end backlog equals orders placed minus orders whose
    # last shipdate <= that date
    last_end = rows[-1]["month_end"]
    import pandas as pd

    cutoff = pd.Timestamp(last_end)
    n_open = len(placed) - sum(
        1 for ok in shipped if done[ok].floor("D") <= cutoff
    )
    # also orders placed after cutoff shouldn't count; none exist by
    # construction (cutoff is the global max activity date)
    assert rows[-1]["open_orders"] == n_open
    assert all(r["open_orders"] >= 0 for r in rows)


def test_top_journeys_shares_and_rank_order(spark, sf_dir):
    rows = REGISTRY["events_top_journeys"].spark_fn(spark, sf_dir).collect()
    rows.sort(key=lambda r: r["rank"])
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) <= 20
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    assert all(0 < r["share"] < 1 for r in rows)
    assert all(r["journey"].count(">") == 2 for r in rows)


def test_brand_return_rate_z_matches_numpy(spark, sf_dir):
    import numpy as np

    li = _pq(sf_dir, "lineitem")[["l_partkey", "l_returnflag"]]
    part = _pq(sf_dir, "part")[["p_partkey", "p_brand"]]
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    j["is_r"] = (j.l_returnflag == "R").astype(int)
    g = j.groupby("p_brand")["is_r"].agg(["count", "sum"])
    p0 = g["sum"].sum() / g["count"].sum()
    rows = REGISTRY["brand_return_rate_outliers"].spark_fn(spark, sf_dir).collect()
    got = {r["p_brand"]: r for r in rows}
    assert set(got) == set(g.index)
    for brand, (n, r) in g.iterrows():
        want_z = (r / n - p0) / np.sqrt(p0 * (1 - p0) / n)
        row = got[brand]
        assert row["n_lineitems"] == n
        assert abs(row["z"] - want_z) < 1e-3, brand
        assert row["outlier_flag"] == int(abs(row["z"]) >= 2)


def test_mannwhitney_matches_reference_formula(spark, sf_dir):
    import math

    rows = REGISTRY["events_value_mannwhitney"].spark_fn(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    # reference computation straight from the definition, pandas-side
    import pandas as pd

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_type", "value"]]
    a = sorted(ev[ev.event_type == "purchase"].value.tolist())
    b = sorted(ev[ev.event_type == "view"].value.tolist())
    na, nb = len(a), len(b)
    assert (r["na"], r["nb"]) == (na, nb)
    # U_A by direct pair counting on the smaller structure: for each a
    # value, #b strictly below + half of equals
    import bisect

    u2 = 0
    for x in a:
        lo = bisect.bisect_left(b, x)
        hi = bisect.bisect_right(b, x)
        u2 += 2 * lo + (hi - lo)
    assert r["u2"] == u2
    n = na + nb
    from collections import Counter

    t = Counter(a + b)
    ties = sum(c * c * c - c for c in t.values())
    var = na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    z = (u2 / 2.0 - na * nb / 2.0) / math.sqrt(var)
    assert abs(r["z"] - round(z, 4)) < 1e-9


def test_holt_winters_learns_a_periodic_series(spark):
    """A noiseless period-24 series: after a full pass the seasonal
    state reproduces the pattern, so forecasts equal the next cycle
    almost exactly; a trending series forecasts its slope."""
    from data_pipelines_snowflake_procedures_spark.operators.holtwinters import (
        holt_winters_forecast,
    )

    pattern = [10, 12, 15, 20, 30, 45, 60, 70, 75, 70, 60, 50,
               45, 40, 38, 36, 40, 50, 65, 80, 70, 40, 20, 12]
    rows = [("p", t, pattern[t % 24]) for t in range(24 * 10)]
    rows += [("trend", t, 100 + 3 * t) for t in range(24 * 10)]
    df = spark.createDataFrame(rows, "s STRING, t LONG, y LONG")
    got = {
        (r["s"], r["h"]): r["forecast"]
        for r in holt_winters_forecast(df, "s", "t", "y").collect()
    }
    for h in range(1, 25):
        want = pattern[(240 + h - 1) % 24]
        assert abs(got[("p", h)] - want) < 1.5, (h, got[("p", h)], want)
        wt = 100 + 3 * (240 + h - 1)
        assert abs(got[("trend", h)] - wt) / wt < 0.05
    # too-short series are skipped, not garbage
    short = spark.createDataFrame(
        [("x", t, 5) for t in range(30)], "s STRING, t LONG, y LONG"
    )
    assert holt_winters_forecast(short, "s", "t", "y").count() == 0
