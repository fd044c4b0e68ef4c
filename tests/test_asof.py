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


def test_range_join_half_open_and_multimatch(spark):
    import datetime as dt

    from data_pipelines_snowflake_procedures_spark.operators.asof import (
        range_join,
    )

    t = dt.datetime
    points = spark.createDataFrame(
        [
            (1, t(2024, 1, 1, 10, 0)),   # == range start: included
            (2, t(2024, 1, 1, 10, 30)),  # in ranges A and B
            (3, t(2024, 1, 1, 11, 0)),   # == range A end: excluded (half-open)
            (4, t(2024, 1, 1, 23, 0)),   # no range
        ],
        "pid BIGINT, ts TIMESTAMP",
    )
    ranges = spark.createDataFrame(
        [
            ("A", t(2024, 1, 1, 10, 0), t(2024, 1, 1, 11, 0)),
            ("B", t(2024, 1, 1, 10, 15), t(2024, 1, 1, 12, 0)),
        ],
        "rid STRING, start_ts TIMESTAMP, end_ts TIMESTAMP",
    )
    out = range_join(points, ranges, "ts", "start_ts", "end_ts", bucket_seconds=600)
    pairs = {(r["pid"], r["rid"]) for r in out.collect()}
    assert pairs == {(1, "A"), (2, "A"), (2, "B"), (3, "B")}
