"""Non-associative sequential scans (capped/clamped running state).

A running sum is a prefix scan and parallelizes through window
functions. A FLOOR-only clamp still has a window form (Skorokhod
reflection: ``bal_t = S_t - min(0, min prefix S)``) — but the
TWO-SIDED clamp ``bal' = min(cap, max(0, bal + delta))`` does not:
the update composes as a monotone clamp map, not as a sum, so no SQL
window aggregate over the deltas expresses it; it needs a sequential
fold (or a custom associative-function-composition combinator no SQL
engine ships).
This module carries that operator class with the repo's established
contract for inherently sequential recursions (Holt-Winters): the
scan is sequential IN TIME but embarrassingly parallel ACROSS keys
(one ``applyInPandas`` group per key), state is O(1) per key, and the
arithmetic is EXACT INTEGERS so a DuckDB recursive-CTE oracle replays
the recursion hash-identically with zero float risk.

The canonical instance here is the capped no-overdraft wallet:
credits top up (to a hard limit), debits consume (never below zero),
and the scan reports the final balance, the peak, and how often each
clamp fired — the semantics of prepaid credit with a top-up ceiling,
warehouse bins with finite capacity, and token buckets alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def capped_running_balance(
    deltas: DataFrame,
    key_col: str,
    order_cols: "list[str]",
    delta_col: str,
    cap: int = 50000,
) -> DataFrame:
    """Per key, scan rows in ``order_cols`` order applying
    ``bal' = min(cap, max(0, bal + delta))`` from 0. ``delta_col``
    must be an integer column (exact arithmetic is the determinism
    contract). Returns (key, n_events, final_balance, peak_balance,
    n_floored, n_capped) — how often the unclamped balance went
    negative / exceeded the cap."""
    import pandas as pd

    ktype = dict(deltas.dtypes)[key_col]

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols)
        bal = peak = floored = capped = 0
        for d in pdf[delta_col]:
            raw = bal + int(d)
            if raw < 0:
                floored += 1
                bal = 0
            elif raw > cap:
                capped += 1
                bal = cap
            else:
                bal = raw
            if bal > peak:
                peak = bal
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n_events": [len(pdf)],
                "final_balance": [bal],
                "peak_balance": [peak],
                "n_floored": [floored],
                "n_capped": [capped],
            }
        )

    return deltas.groupBy(key_col).applyInPandas(
        scan,
        schema=f"{key_col} {ktype}, n_events long, final_balance long, "
        "peak_balance long, n_floored long, n_capped long",
    )
