"""Event-time window aggregations over the ``events`` stream table —
tumbling, sliding, and session windows, plus JSON-property extraction.

The reference has no streaming surface (SURVEY.md §2.13); these are
the batch-expressible event-window operators the harness ``events``
table calls for, built so the SAME functions run under Structured
Streaming (streaming/stream.py wires them behind ``readStream`` with a
watermark — ``F.window``/``F.session_window`` aggregations are
streaming-legal as written).

Scale notes: event-time windowing shuffles on (window, keys); skewed
event types can be salted. Session windows are the expensive one —
state per (user, open session) in streaming, a full sort-per-user in
batch; the 30-minute gap bounds state lifetime under a watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_GAP = "30 minutes"


def tumbling_agg(
    events: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling event-time windows: count + sum(value) per (window, keys).
    Works identically in batch and streaming (append mode after
    watermark)."""
    return (
        events.groupBy(F.window(ts_col, duration).alias("w"), *keys)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Sliding event-time windows (each event lands in
    duration/slide windows)."""
    return (
        events.groupBy(F.window(ts_col, duration, slide).alias("w"), *keys)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def session_agg(
    events: DataFrame,
    gap: str = DEFAULT_GAP,
    ts_col: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Session windows: events for one key belong to the same session
    while consecutive gaps stay under ``gap``. Output
    (key, session_start, n_events, sum_value).

    Batch: Catalyst's native session_window (a sort within key
    partitions). Streaming: identical expression with bounded state
    under a watermark."""
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("w"), key)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            key,
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def props_agg(
    events: DataFrame, json_col: str = "props", key: str = "event_type"
) -> DataFrame:
    """Semi-structured property extraction (VARIANT-style access): pull
    ``$.k`` from the JSON props column, aggregate per key — JSON parse
    stays JVM-side (get_json_object), no UDF."""
    k = F.get_json_object(F.col(json_col), "$.k").cast("long")
    return (
        events.select(key, k.alias("k"))
        .groupBy(key)
        .agg(
            F.count("k").alias("n_with_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )
