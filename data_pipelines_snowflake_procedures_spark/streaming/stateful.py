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
    ArrayType,
    DoubleType,
    LongType,
    StringType,
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


# ---------------------------------------------------------------------------
# Streaming bottom-k quantile sketch: the stateful-streaming leg of the
# batch entry events_quantile_sketch_bottomk (operators/sketch.py::
# bottomk_quantile_sketch). The state per key is the k rows with the
# smallest md5 hash seen so far — merge-invariant, so the FINAL state
# after an availableNow drain equals the batch bottom-k no matter how
# micro-batches sliced the input, and the emitted quantiles hash-check
# against the same SQL restatement.
# ---------------------------------------------------------------------------

SKETCH_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_seen", LongType()),
        StructField("p25", DoubleType()),
        StructField("p50", DoubleType()),
        StructField("p75", DoubleType()),
        StructField("p90", DoubleType()),
    ]
)

SKETCH_STATE_SCHEMA = StructType(
    [
        StructField("n_seen", LongType()),
        StructField("hs", ArrayType(LongType())),
        StructField("ks", ArrayType(LongType())),
        StructField("vs", ArrayType(DoubleType())),
    ]
)


def _make_update_sketch(k: int):
    def _update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Fold this micro-batch's (hash, key, value) rows into the
        persisted bottom-k sample and emit the current quantiles.
        NoTimeout: the sample must survive to the end of the drain —
        an idle-expiry here would silently truncate the sketch.

        The per-batch fold is vectorized (optimization r10): each
        Arrow batch is reduced to ITS bottom-k by (h, event_id) with
        numpy argpartition (tie-safe: every row at the threshold hash
        is kept for the exact (h, event_id) lexsort) before merging
        with the persisted sample — the bottom-k of a union equals the
        bottom-k of per-part bottom-k's (merge invariance), so the
        state and emitted quantiles are unchanged; the old form pushed
        every batch row through per-row Python generators and a full
        Python sort (~10 s per million rows per key at sf1)."""
        import numpy as np

        if state.exists:
            n_seen, hs, ks, vs = state.get
            sample = list(zip(hs, ks, vs))
        else:
            n_seen, sample = 0, []
        for pdf in pdfs:
            n = len(pdf)
            if n == 0:
                continue
            n_seen += n
            h = pdf["h"].to_numpy(dtype=np.int64)
            e = pdf["event_id"].to_numpy(dtype=np.int64)
            v = pdf["value"].to_numpy(dtype=np.float64)
            if n > k:
                part = np.argpartition(h, k - 1)[:k]
                thresh = h[part].max()
                cand = np.flatnonzero(h <= thresh)
            else:
                cand = np.arange(n)
            order = cand[np.lexsort((e[cand], h[cand]))][:k]
            sample.extend(
                zip(
                    (int(x) for x in h[order]),
                    (int(x) for x in e[order]),
                    (float(x) for x in v[order]),
                )
            )
        sample.sort(key=lambda t: (t[0], t[1]))
        sample = sample[:k]
        state.update(
            (
                n_seen,
                [t[0] for t in sample],
                [t[1] for t in sample],
                [t[2] for t in sample],
            )
        )
        # quantiles by the batch entry's integer discrete-rank rule,
        # value-ordered with the same (value, key) tie-break
        byval = sorted(sample, key=lambda t: (t[2], t[1]))
        kk = len(byval)
        qs = {}
        for pct in (25, 50, 75, 90):
            qs[pct] = byval[(pct * kk + 99) // 100 - 1][2]
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_seen": [n_seen],
                "p25": [qs[25]],
                "p50": [qs[50]],
                "p75": [qs[75]],
                "p90": [qs[90]],
            }
        )

    return _update


def quantile_sketch_stream(spark, sf_dir: str, k: int = 256) -> DataFrame:
    """Streaming per-type bottom-k quantile sketch over the harness
    events. The md5 hash is computed JVM-side before the state
    operator (the exact expression the batch sketch and its oracle
    use), so Python only merges pre-hashed rows."""
    from pyspark.sql import functions as F

    from .stream import read_events_stream

    ev = read_events_stream(spark, sf_dir).select(
        "event_type",
        "event_id",
        "value",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("bkq|"), F.col("event_id").cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long").alias("h"),
    )
    return ev.groupBy("event_type").applyInPandasWithState(
        _make_update_sketch(k),
        outputStructType=SKETCH_OUTPUT_SCHEMA,
        stateStructType=SKETCH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SPRT_OUTPUT_SCHEMA = StructType(
    [
        StructField("n_days", LongType()),
        StructField("first_cross_t", LongType()),
        StructField("decision", StringType()),
        StructField("final_llr", DoubleType()),
        StructField("max_llr", DoubleType()),
        StructField("min_llr", DoubleType()),
        StructField("n_events_seen", LongType()),
    ]
)

SPRT_STATE_SCHEMA = StructType(
    [
        StructField("days", ArrayType(LongType())),
        StructField("ns", ArrayType(LongType())),
        StructField("ss", ArrayType(LongType())),
    ]
)


def sprt_walk_report(
    per_day: list[tuple[int, int, int]], l1: float, l2: float, a_micro: int
) -> tuple:
    """Replay the SPRT integer walk from (day, n, s) rows — the SAME
    arithmetic as the batch entry's windowed cumulative sum: per-day
    LLR increments frozen to micro-units with the JVM-evaluated log
    constants, exact integer accumulation, strict boundary test.
    Returns (n_days, first_cross_t, decision, final, max, min) with
    the llr fields already /1e6-rounded to 6."""
    cum = 0
    mx: int | None = None
    mn: int | None = None
    first_t = None
    decision = "continue"
    for t, (_, n, s) in enumerate(sorted(per_day), start=1):
        cum += round((s * l1 + (n - s) * l2) * 1000000)
        mx = cum if mx is None or cum > mx else mx
        mn = cum if mn is None or cum < mn else mn
        if first_t is None and (cum >= a_micro or cum <= -a_micro):
            first_t = t
            decision = "accept_h1" if cum >= a_micro else "accept_h0"
    return (
        len(per_day),
        first_t,
        decision,
        round(cum / 1000000.0, 6),
        round((mx if mx is not None else 0) / 1000000.0, 6),
        round((mn if mn is not None else 0) / 1000000.0, 6),
    )


def _make_update_sprt(l1: float, l2: float, a_micro: int):
    def _update_sprt(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Merge this micro-batch's (day, n, s) aggregates into the
        persisted per-day map and emit the SPRT report over all data
        seen so far — the always-valid sequential-test readout."""
        acc: dict[int, list[int]] = {}
        if state.exists:
            days, ns, ss = state.get
            for d, n, s in zip(days, ns, ss):
                acc[int(d)] = [int(n), int(s)]
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            g = pdf.groupby("day_key")["c"].agg(["count", "sum"])
            for d, (n, s) in g.iterrows():
                cur = acc.setdefault(int(d), [0, 0])
                cur[0] += int(n)
                cur[1] += int(s)
        days_sorted = sorted(acc)
        state.update(
            (
                days_sorted,
                [acc[d][0] for d in days_sorted],
                [acc[d][1] for d in days_sorted],
            )
        )
        per_day = [(d, acc[d][0], acc[d][1]) for d in days_sorted]
        n_days, first_t, decision, fin, mx, mn = sprt_walk_report(
            per_day, l1, l2, a_micro
        )
        n_seen = sum(acc[d][0] for d in days_sorted)
        yield pd.DataFrame(
            [
                (
                    n_days,
                    first_t,
                    decision,
                    fin,
                    mx,
                    mn,
                    n_seen,
                )
            ],
            columns=[
                "n_days", "first_cross_t", "decision",
                "final_llr", "max_llr", "min_llr", "n_events_seen",
            ],
        )

    return _update_sprt


def sprt_stream(
    spark, sf_dir: str, l1: float, l2: float, a_micro: int
) -> DataFrame:
    """Streaming Wald SPRT over the harness events: rows fold
    into a per-day state map under one constant key (the walk is a
    single global test; day count is time-dimension-sized, so state
    stays KB-sized at any volume), report re-emitted per batch."""
    from pyspark.sql import functions as F

    from .stream import read_events_stream

    ev = read_events_stream(spark, sf_dir).select(
        F.lit("all").alias("k"),
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("day_key"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("c"),
    )
    # no streaming pre-aggregation: chaining a streaming agg into
    # applyInPandasWithState would be two stateful operators (update
    # mode forbids it) — the day-grain rollup happens in pandas inside
    # the state function; at 100 TB the production layout shards the
    # feed by (experiment, day) partial sums upstream and keeps this
    # operator's state day-grain either way
    return ev.groupBy("k").applyInPandasWithState(
        _make_update_sprt(l1, l2, a_micro),
        outputStructType=SPRT_OUTPUT_SCHEMA,
        stateStructType=SPRT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
