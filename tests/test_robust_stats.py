"""Hand-computed tests for the Theil-Sen trend and peak-concurrency
sweep-line entries (round-7 robust-stats/capacity wave)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_theilsen_median_of_slopes_hand_computed(spark):
    # y = 10x with one gross outlier at x=3 (y=1000). Pairwise slopes
    # are 10 everywhere except the 4 pairs through the outlier; the
    # median stays 10 — the robustness OLS lacks.
    pts = [(0, 0), (1, 10), (2, 20), (3, 1000), (4, 40)]
    h = spark.createDataFrame(pts, "x LONG, y LONG")
    h1 = h.select(F.col("x").alias("x1"), F.col("y").alias("y1"))
    h2 = h.select(F.col("x").alias("x2"), F.col("y").alias("y2"))
    med = (
        h1.join(h2, F.col("x2") > F.col("x1"))
        .select(
            F.expr("((y2 - y1) * 1000000) div (x2 - x1)").alias("sm")
        )
        .agg(F.expr("percentile(CAST(sm AS DOUBLE), 0.5)").alias("m"))
        .first()
        .m
    )
    assert med == 10_000_000.0  # 10 cents/hour in micro-units


def test_theilsen_entry_shape(spark, sf_dir):
    from data_pipelines_snowflake_procedures_spark.queries import REGISTRY

    r = REGISTRY["events_theilsen_trend"].spark_fn(spark, sf_dir).first()
    assert r.n_pairs == r.n_hours * (r.n_hours - 1) // 2
    assert r.slope_cents_per_hour is not None


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1, 0, m, s)) for u, m, s in rows],
        "user_id LONG, ts TIMESTAMP",
    )


def test_peak_concurrency_sweep_hand_computed(spark, monkeypatch):
    # three users: u1 active 0:00-0:10, u2 0:05-0:12, u3 0:11-0:20.
    # concurrency: 2 during 0:05-0:10 (u1,u2), 2 during 0:11-0:12
    # (u2,u3) — peak 2, first attained at u2's start 0:05:00.
    ev = _mk_events(
        spark,
        [(1, 0, 0), (1, 10, 0), (2, 5, 0), (2, 12, 0), (3, 11, 0), (3, 20, 0)],
    )
    import data_pipelines_snowflake_procedures_spark.queries_events as qe

    monkeypatch.setattr(qe, "load_table", lambda s, d, t: ev)
    from data_pipelines_snowflake_procedures_spark.queries import REGISTRY

    r = REGISTRY["events_peak_concurrency"].spark_fn(spark, "ignored").first()
    assert r.n_sessions == 3
    assert r.peak_concurrent == 2
    assert r.peak_at == "2024-01-01 00:05:00"


def test_peak_concurrency_touching_sessions_count_as_concurrent(
    spark, monkeypatch
):
    # u2 starts exactly when u1's last event fires: starts sort before
    # ends, so the instant 0:10:00 sees both sessions live (peak 2)
    ev = _mk_events(spark, [(1, 0, 0), (1, 10, 0), (2, 10, 0), (2, 15, 0)])
    import data_pipelines_snowflake_procedures_spark.queries_events as qe

    monkeypatch.setattr(qe, "load_table", lambda s, d, t: ev)
    from data_pipelines_snowflake_procedures_spark.queries import REGISTRY

    r = REGISTRY["events_peak_concurrency"].spark_fn(spark, "ignored").first()
    assert r.n_sessions == 2
    assert r.peak_concurrent == 2
    assert r.peak_at == "2024-01-01 00:10:00"


def test_acf_detects_exact_periodicity(spark, monkeypatch):
    # a strictly period-3 hourly series: acf at lag 3 must be exactly 1
    import data_pipelines_snowflake_procedures_spark.queries_events as qe

    rows = []
    for h in range(90):
        # volume pattern 1, 2, 6 repeating; distinct user ids so
        # count(*) per hour reproduces the pattern exactly
        n = [1, 2, 6][h % 3]
        for u in range(n):
            rows.append((u, dt.datetime(2024, 1, 1, 0, 0, 0)
                         + dt.timedelta(hours=h)))
    ev = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP")
    monkeypatch.setattr(qe, "load_table", lambda s, d, t: ev)
    from data_pipelines_snowflake_procedures_spark.queries import REGISTRY

    acf = {
        r.lag: r.acf
        for r in REGISTRY["events_hourly_acf"].spark_fn(spark, "x").collect()
    }
    assert acf[3] == 1.0 and acf[6] == 1.0
    assert acf[1] < 0  # within-period lags anti-correlate for this pattern
