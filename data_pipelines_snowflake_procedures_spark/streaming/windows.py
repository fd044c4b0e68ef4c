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


def funnel(
    df: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: how many users performed the step
    sequence in strictly increasing event-time order (step i+1 only
    counts AFTER that user's first step-i event). Output one row:
    ``n_step1..n_stepK`` user counts plus conversion rates vs step 1.

    One shuffle on user_id, then K window passes over the SAME
    partitioning (Catalyst reuses the single exchange — no per-step
    re-shuffle): pass i computes ``t_i = min(ts where type = step_i
    and ts > t_{i-1})`` per user. At 100 TB this is the one-exchange
    formulation; the join-per-step alternative shuffles K times.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col)
    out = df.select(user_col, type_col, ts_col)
    prev: str | None = None
    for i, step in enumerate(steps, start=1):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        out = out.withColumn(f"t{i}", F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = f"t{i}"
    aggs = [
        F.count_distinct(
            F.when(F.col(f"t{i}").isNotNull(), F.col(user_col))
        ).alias(f"n_step{i}")
        for i in range(1, len(steps) + 1)
    ]
    row = out.agg(*aggs)
    rates = [
        F.round(
            F.col(f"n_step{i}").cast("double")
            / F.when(F.col("n_step1") > 0, F.col("n_step1")),
            4,
        ).alias(f"rate_step{i}")
        for i in range(2, len(steps) + 1)
    ]
    return row.select("*", *rates)


def gapfill_hourly(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Dense hourly time series per key: every (key, hour) bucket in
    the data's [min, max] hour range, zero-filled where no events
    landed — the gap-filling step before rolling averages or
    visualization (sparse groupBy output silently skips empty hours).

    Plan: a 1-row min/max aggregate generates the hour spine with
    ``sequence`` + ``explode``; the spine cross-joins the distinct key
    set (both driver-tiny, broadcast) and LEFT joins the hourly
    counts. The fact table is scanned once; spine size = hours × keys,
    independent of row count — at 100 TB the spine is still KBs.
    """
    hours = (
        df.agg(
            F.date_trunc("hour", F.min(ts_col)).alias("h0"),
            F.date_trunc("hour", F.max(ts_col)).alias("h1"),
        )
        .select(
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour")
        )
    )
    keys = df.select(F.col(key_col).alias("key")).distinct()
    counts = (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.date_trunc("hour", F.col(ts_col)).alias("hour"),
        )
        .agg(F.count("*").alias("n_events"))
    )
    return (
        hours.crossJoin(F.broadcast(keys))
        .join(counts, ["key", "hour"], "left")
        .select(
            F.col("key").alias(key_col),
            "hour",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        )
    )


def gapfill_interpolate_hourly(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Dense hourly series per key with LINEAR interpolation across
    gaps — the metric-series repair step zero-fill cannot provide
    (a sensor mean of 0 is a lie; the line between neighbors is the
    standard estimate). Observed hours keep their (rounded) mean;
    interior gaps interpolate between the nearest observed neighbors
    via ignore-nulls frame functions; leading/trailing gaps stay NULL
    (no neighbor to anchor the line — fabricating one is worse).

    Plan: the same broadcast spine as :func:`gapfill_hourly`, then two
    frame windows per key (backward last / forward first, both
    ignore-nulls) over the spine-sized frame — hours × keys rows, so
    window state is calendar-bounded regardless of fact rows.
    Interpolation arithmetic runs on integer epoch-hours with exact
    integer-cent means and FLOOR-scaled 4-decimal outputs (floor of an
    identical IEEE double is identical everywhere; round() boundary
    behavior is engine-specific), restated hash-exactly by the DuckDB
    oracle."""
    from pyspark.sql import Window

    hours = (
        df.agg(
            F.date_trunc("hour", F.min(ts_col)).alias("h0"),
            F.date_trunc("hour", F.max(ts_col)).alias("h1"),
        )
        .select(
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour")
        )
    )
    keys = df.select(F.col(key_col).alias("key")).distinct()
    # exact mean: integer-cent sums (the 2-decimal column's native
    # grid) — a float avg's summation order can flip a 4th-decimal
    # rounding boundary between engines
    means = (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.date_trunc("hour", F.col(ts_col)).alias("hour"),
        )
        .agg(
            (
                F.floor(
                    F.sum(F.round(F.col(value_col) * 100).cast("long"))
                    / F.count("*")
                    / 100
                    * 10000
                )
                / 10000
            ).alias("v_obs")
        )
    )
    dense = hours.crossJoin(F.broadcast(keys)).join(
        means, ["key", "hour"], "left"
    ).withColumn("hn", (F.unix_timestamp("hour") / 3600).cast("long"))
    w_back = (
        Window.partitionBy("key")
        .orderBy("hn")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("key")
        .orderBy("hn")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("v_obs").isNotNull(), F.col("hn"))
    pv = F.last("v_obs", ignorenulls=True).over(w_back)
    ph = F.last(obs_h, ignorenulls=True).over(w_back)
    nv = F.first("v_obs", ignorenulls=True).over(w_fwd)
    nh = F.first(obs_h, ignorenulls=True).over(w_fwd)
    frac = (F.col("hn") - ph).cast("double") / (nh - ph)
    filled = (
        F.when(F.col("v_obs").isNotNull(), F.col("v_obs"))
        .when(
            pv.isNotNull() & nv.isNotNull(),
            F.floor((pv + (nv - pv) * frac) * 10000) / 10000,
        )
    )
    return dense.select(
        F.col("key").alias(key_col),
        "hour",
        "v_obs",
        filled.alias("v_filled"),
    )
