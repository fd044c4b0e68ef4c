"""Unit tests for the as-of join operator (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

from data_pipelines_snowflake_procedures_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(10)),  # after quotes at 5 → matches 5
            (2, "u1", _ts(30)),  # after quotes at 5, 20 → matches 20
            (3, "u1", _ts(20)),  # same instant as quote at 20 → matches 20
            (4, "u2", _ts(10)),  # u2 has no quotes → null
            (5, "u3", _ts(1)),   # before u3's only quote → null
        ],
        ["trade_id", "user", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u1", 100.0, _ts(5)),
            ("u1", 200.0, _ts(20)),
            ("u3", 900.0, _ts(50)),
        ],
        ["user", "px", "ts"],
    )
    out = {
        r["trade_id"]: r
        for r in asof_join(left, right, on=["user"], ts_col="ts", value_cols=["px"]).collect()
    }
    assert out[1]["px_asof"] == 100.0 and out[1]["ts_asof"] == _ts(5)
    assert out[2]["px_asof"] == 200.0
    assert out[3]["px_asof"] == 200.0  # match at the same instant counts
    assert out[4]["px_asof"] is None and out[4]["ts_asof"] is None
    assert out[5]["px_asof"] is None
    # left row count preserved, left columns intact
    assert len(out) == 5
    assert out[1]["ts"] == _ts(10)
