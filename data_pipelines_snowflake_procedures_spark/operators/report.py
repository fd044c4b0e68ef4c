"""One-call table health report: profile + DQ scores + key skew +
storage layout in a single envelope — the operational dashboard
payload a warehouse DQ service exposes per table.

Composition only: each section delegates to the single-pass engines
(operators/profile.py, operators/dq.py, operators/skew.py,
sources/sink.py), so the total cost is one profile pass + one
heavy-hitter group-by per requested column + footer reads.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import DataFrame


def table_report(
    df: DataFrame,
    table_name: str = "",
    path: str | None = None,
    skew_columns: list[str] | None = None,
    now: _dt.datetime | str | None = None,
    approx: bool = False,
    related: dict[str, tuple[DataFrame, str]] | None = None,
) -> dict[str, Any]:
    """Full health envelope: ``{dq, skew, storage}``.

    ``path`` adds the parquet storage-layout section; ``skew_columns``
    adds top-5 heavy hitters per listed column; ``related`` upgrades
    the consistency pillar (see operators/dq.py). ``approx=True`` uses
    sketches throughout — the 100 TB mode.
    """
    from .dq import run_table_dq
    from .skew import heavy_hitters

    report: dict[str, Any] = {
        "dq": run_table_dq(
            df, table_name=table_name, now=now, approx=approx, related=related
        )
    }
    if skew_columns:
        report["skew"] = {
            c: [r.asDict() for r in heavy_hitters(df, c, k=5).collect()]
            for c in skew_columns
        }
    if path is not None:
        from ..sources.sink import table_storage_report

        report["storage"] = table_storage_report(path)
    return report
