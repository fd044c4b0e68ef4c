"""Focused tests for the r10 vectorized capped-balance scan
(operators/seqscan.py): the segmented clamp-map doubling scan must
reproduce the sequential per-row fold exactly (it is the same monoid,
so exact int64 equality, not approximation), including keys split
across Arrow batches."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from data_pipelines_snowflake_procedures_spark.operators.seqscan import (
    _clamp_scan_block,
    capped_running_balance,
)


def _ref_scan(ds, cap):
    """The pre-r10 per-row loop, verbatim semantics."""
    bal = peak = floored = capped = 0
    for d in ds:
        raw = bal + int(d)
        if raw < 0:
            floored += 1
            bal = 0
        elif raw > cap:
            capped += 1
            bal = cap
        else:
            bal = raw
        if bal > peak:
            peak = bal
    return len(ds), bal, peak, floored, capped


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_clamp_scan_block_matches_loop(seed):
    rng = np.random.RandomState(seed)
    n = 257  # crosses several doubling rounds, odd length
    ds = rng.randint(-30000, 30001, size=n).astype(np.int64)
    seg_start = np.zeros(n, dtype=bool)
    seg_start[0] = True
    seg_start[rng.choice(np.arange(1, n), size=9, replace=False)] = True
    bal, prev = _clamp_scan_block(ds, seg_start, 50000)
    cap = 50000
    b = 0
    for i in range(n):
        if seg_start[i]:
            b = 0
        assert prev[i] == b
        b = min(cap, max(0, b + int(ds[i])))
        assert bal[i] == b


def test_capped_running_balance_spark_matches_loop(spark):
    rng = np.random.RandomState(7)
    rows = []
    for uid in range(40):
        for t in range(int(rng.randint(1, 120))):
            rows.append((uid, t, int(rng.randint(-30000, 60001))))
    df = spark.createDataFrame(rows, "user_id long, ts long, d long")
    got = {
        r["user_id"]: (
            r["n_events"], r["final_balance"], r["peak_balance"],
            r["n_floored"], r["n_capped"],
        )
        for r in capped_running_balance(
            df, "user_id", ["ts"], "d"
        ).collect()
    }
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "d"])
    for uid, g in pdf.sort_values(["user_id", "ts"]).groupby("user_id"):
        n, bal, peak, fl, cp = _ref_scan(g["d"].tolist(), 50000)
        assert got[uid] == (n, bal, peak, fl, cp), uid


def test_capped_running_balance_batch_split_carry(spark):
    """A single hot key spanning multiple Arrow batches must fold
    exactly once (the carry path): force tiny batches."""
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        rng = np.random.RandomState(3)
        rows = [(1, t, int(rng.randint(-40000, 70001))) for t in range(500)]
        rows += [(2, t, int(rng.randint(-40000, 70001))) for t in range(90)]
        df = spark.createDataFrame(rows, "user_id long, ts long, d long")
        got = {
            r["user_id"]: (
                r["n_events"], r["final_balance"], r["peak_balance"],
                r["n_floored"], r["n_capped"],
            )
            for r in capped_running_balance(
                df, "user_id", ["ts"], "d"
            ).collect()
        }
        pdf = pd.DataFrame(rows, columns=["user_id", "ts", "d"])
        for uid, g in pdf.sort_values(["user_id", "ts"]).groupby("user_id"):
            assert got[uid] == _ref_scan(g["d"].tolist(), 50000), uid
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


def test_capped_running_balance_null_key_spanning_batches(spark):
    """ADVICE r10: a NULL key surfaces as NaN/None in pandas; NaN !=
    NaN broke the cross-batch carry (two rows for the null key), and
    the old `carry_key = None` no-carry sentinel could DROP a null-key
    run ending a partition. Null-key runs must fold exactly once, like
    the batch groupBy they replaced."""
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        rng = np.random.RandomState(11)
        rows = [(None, t, int(rng.randint(-40000, 70001))) for t in range(300)]
        rows += [("u5", t, int(rng.randint(-40000, 70001))) for t in range(90)]
        df = spark.createDataFrame(rows, "user_id string, ts long, d long")
        out = capped_running_balance(df, "user_id", ["ts"], "d").collect()
        got = {
            r["user_id"]: (
                r["n_events"], r["final_balance"], r["peak_balance"],
                r["n_floored"], r["n_capped"],
            )
            for r in out
        }
        assert len(out) == 2  # one row per key, null folded once
        pdf = pd.DataFrame(rows, columns=["user_id", "ts", "d"])
        for uid, g in pdf.sort_values(["user_id", "ts"], na_position="first").groupby(
            "user_id", dropna=False
        ):
            key = None if pd.isna(uid) else str(uid)
            assert got[key] == _ref_scan(g["d"].tolist(), 50000), uid
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
