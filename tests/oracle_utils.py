"""Local re-implementation of the driver's oracle check: run the Spark
query and the DuckDB oracle on the same parquet, then compare row count,
column names, and order-insensitive values."""

from __future__ import annotations

import math
from typing import Any

import pandas as pd


def _canon_cell(v: Any) -> Any:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        # Queries round explicitly; this only normalizes float32→float64
        # artifacts. repr() preserves the sign of zero: Python's
        # `-0.0 == 0.0` made the r6 `events_hourly_stl` driver failure
        # invisible locally (the driver's value hash is sign-sensitive),
        # so float cells compare by a representation that keeps the sign.
        # Intentionally strict: a DOUBLE 1.0 on one engine vs BIGINT 1 on
        # the other does NOT compare equal here — the driver's value hash
        # is type-sensitive the same way, and entries are required to cast
        # both engines to the same type anyway.
        return repr(round(v, 9))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    return v


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def assert_oracle_match(spark, duck, spec, sf_dir: str) -> None:
    sdf = spec.spark_fn(spark, sf_dir).toPandas()
    odf = duck.execute(spec.oracle).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{spec.name}: column mismatch {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{spec.name}: row count {len(sdf)} vs {len(odf)}"
    srows, orows = _canon(sdf), _canon(odf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
    ]
    assert not mismatches, f"{spec.name}: {len(mismatches)} row mismatches; first: {mismatches[0]}"
