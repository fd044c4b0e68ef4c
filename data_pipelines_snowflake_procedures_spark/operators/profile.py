"""Single-pass table profiling (reference Q7/A1-A4/P7, SURVEY.md §2.10).

Parity target: the profiling loop of ``DISCOVER_AND_RUN_DQ_AUTO_RULES``
(Data_Quality_Table.sql:62-104), which issues one 3-aggregate query per
column, another 4-aggregate query per numeric column, and another per
DATE column (N+1 full scans). Here every aggregate for every column is
computed in ONE ``df.agg(...)`` job: Catalyst fuses them into a single
scan with partial (map-side) aggregation, so cost is one pass over the
table regardless of column count.

Scale note: exact ``countDistinct`` over k columns plans an Expand (k×
row multiplication before the shuffle). At 100 TB pass
``approx=True`` to use HyperLogLog sketches (``approx_count_distinct``)
— no Expand, mergeable state, ~2% error — the right trade for
profiling, where ratios feed 3-decimal-rounded scores anyway.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)
DATELIKE_TYPES = (T.DateType, T.TimestampType, T.TimestampNTZType)


def is_numeric(dtype: T.DataType) -> bool:
    return isinstance(dtype, NUMERIC_TYPES)


def is_datelike(dtype: T.DataType) -> bool:
    """Reference applies the future-date accuracy rule to DATE-typed
    columns (Data_Quality_Table.sql:147); we extend it to timestamps —
    the harness stores all dates as timestamps."""
    return isinstance(dtype, DATELIKE_TYPES)


def profile_aggregates(
    df: DataFrame,
    cols: list[str] | None = None,
    now: _dt.datetime | str | None = None,
    approx: bool = False,
) -> list[Column]:
    """Build the flat aggregate list for one profiling pass.

    Per column: distinct count, null count; numeric columns add
    avg/min/max/stddev; date-like columns add a future-value count
    against ``now`` (pinned, not CURRENT_TIMESTAMP, so results are
    reproducible and oracle-comparable).
    """
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    schema = {f.name: f.dataType for f in df.schema.fields}
    aggs: list[Column] = [F.count(F.lit(1)).alias("count_all")]
    for c in cols:
        col = F.col(c)
        distinct = (
            F.approx_count_distinct(c, rsd=0.02) if approx else F.countDistinct(col)
        )
        aggs.append(distinct.alias(f"{c}__count_distinct"))
        aggs.append(
            F.coalesce(F.sum(F.when(col.isNull(), 1).otherwise(0)), F.lit(0)).alias(
                f"{c}__count_nulls"
            )
        )
        if is_numeric(schema[c]):
            aggs.append(F.avg(col).alias(f"{c}__avg"))
            aggs.append(F.min(col).alias(f"{c}__min"))
            aggs.append(F.max(col).alias(f"{c}__max"))
            aggs.append(F.stddev(col).alias(f"{c}__stddev"))
        if is_datelike(schema[c]) and now is not None:
            now_lit = F.lit(now).cast("timestamp")
            aggs.append(
                F.coalesce(
                    F.sum(F.when(col.cast("timestamp") > now_lit, 1).otherwise(0)),
                    F.lit(0),
                ).alias(f"{c}__count_future")
            )
    return aggs


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    now: _dt.datetime | str | None = None,
    approx: bool = False,
) -> dict[str, Any]:
    """Profile a table in one job; reference-shaped result.

    Returns ``{column: {count_all, count_distinct, count_nulls,
    null_ratio, distinct_ratio, data_type, numeric_stats,
    count_future?}}`` mirroring Data_Quality_Table.sql:79-104 (ratio
    denominators clamp at 1; ``numeric_stats`` is None for non-numeric
    columns; AVG stringified as the reference does).
    """
    cols = cols or df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}
    row = df.agg(*profile_aggregates(df, cols, now=now, approx=approx)).collect()[0]
    total = row["count_all"]
    out: dict[str, Any] = {}
    for c in cols:
        distinct = int(row[f"{c}__count_distinct"])
        nulls = int(row[f"{c}__count_nulls"])
        prof: dict[str, Any] = {
            "count_all": int(total),
            "count_distinct": distinct,
            "count_nulls": nulls,
            "null_ratio": float(nulls) / max(int(total), 1),
            "distinct_ratio": float(distinct) / max(int(total), 1),
            "data_type": schema[c].simpleString(),
        }
        if is_numeric(schema[c]):
            prof["numeric_stats"] = {
                "AVG_VAL": str(row[f"{c}__avg"]),
                "MIN_VAL": row[f"{c}__min"],
                "MAX_VAL": row[f"{c}__max"],
                "STDDEV": row[f"{c}__stddev"],
            }
        else:
            prof["numeric_stats"] = None
        if f"{c}__count_future" in row.asDict():
            prof["count_future"] = int(row[f"{c}__count_future"])
        out[c] = prof
    return out


def profile_long(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Long-format profile as a pure DataFrame plan (no driver math):
    one row per column with counts + ratios. Built as the single-pass
    wide aggregate exploded over an array of per-column structs, so the
    whole thing stays one Spark job and is oracle-comparable.
    """
    cols = cols or df.columns
    wide = df.agg(*profile_aggregates(df, cols))
    total = F.col("count_all")
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            total.cast("long").alias("count_all"),
            F.col(f"{c}__count_distinct").cast("long").alias("count_distinct"),
            F.col(f"{c}__count_nulls").cast("long").alias("count_nulls"),
            F.round(
                F.col(f"{c}__count_nulls") / F.greatest(total, F.lit(1)), 6
            ).alias("null_ratio"),
            F.round(
                F.col(f"{c}__count_distinct") / F.greatest(total, F.lit(1)), 6
            ).alias("distinct_ratio"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
