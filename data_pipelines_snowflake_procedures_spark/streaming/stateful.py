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


#: Idle keys expire after this much processing time without new events
#: (overridable via running_user_totals); bounds state to O(active keys).
DEFAULT_IDLE_TIMEOUT_MS = 10 * 60 * 1000


def _make_update_user_totals(idle_timeout_ms: int):
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
        # Without registering a duration, ProcessingTimeTimeout never
        # fires and idle-key state grows unboundedly; re-arm on every
        # update so the clock measures idleness, not key age.
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return _update_user_totals


def running_user_totals(
    events: DataFrame, idle_timeout_ms: int = DEFAULT_IDLE_TIMEOUT_MS
) -> DataFrame:
    """Attach the stateful running-total operator to a (streaming or
    batch-test) events DataFrame grouped by user. ``idle_timeout_ms``
    controls when an idle user's state is dropped."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_user_totals(idle_timeout_ms),
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
