"""Custom stateful streaming operator via ``applyInPandasWithState``.

Beyond the built-in windowed aggregations (streaming/windows.py), some
pipeline state machines need arbitrary per-key state — running
counters, anomaly baselines, dedup-seen sets. This module implements
the canonical example: per-user running totals that persist across
micro-batches, with processing-time timeout to expire idle keys.

Scale design: state lives in the state store partitioned by key (one
shuffle on user_id per micro-batch); each Arrow batch crosses to
Python once per key-group. State size is O(active keys) — the timeout
bounds it for churning key spaces.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into persisted
    (count, total) state and emit the updated running totals."""
    if state.hasTimedOut:
        state.remove()
        return
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Attach the stateful running-total operator to a (streaming or
    batch-test) events DataFrame grouped by user."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def user_totals_stream(spark, sf_dir: str) -> DataFrame:
    """Streaming per-user running totals over the harness events."""
    from .stream import read_events_stream

    return running_user_totals(read_events_stream(spark, sf_dir))
