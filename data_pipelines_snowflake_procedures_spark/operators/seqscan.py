"""Non-associative sequential scans (capped/clamped running state).

A running sum is a prefix scan and parallelizes through window
functions — but the moment the update is NON-associative (a floor at
zero, a cap, a reset-on-condition), no window frame can express it:
``bal' = max(0, bal + delta)`` depends on the full ordered history.
This module carries that operator class with the repo's established
contract for inherently sequential recursions (Holt-Winters): the
scan is sequential IN TIME but embarrassingly parallel ACROSS keys
(one ``applyInPandas`` group per key), state is O(1) per key, and the
arithmetic is EXACT INTEGERS so a DuckDB recursive-CTE oracle replays
the recursion hash-identically with zero float risk.

The canonical instance here is the no-overdraft wallet: credits top
up, debits consume, the balance floors at zero (a clamp event), and
the scan reports the final balance, the peak, and how often the clamp
fired — the semantics of prepaid credit, inventory that can't go
negative, and rate-limit token buckets alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def capped_running_balance(
    deltas: DataFrame,
    key_col: str,
    order_cols: "list[str]",
    delta_col: str,
) -> DataFrame:
    """Per key, scan rows in ``order_cols`` order applying
    ``bal' = max(0, bal + delta)`` from 0. ``delta_col`` must be an
    integer column (exact arithmetic is the determinism contract).
    Returns (key, n_events, final_balance, peak_balance, n_clamped),
    where a clamp is any step whose unfloored balance went negative."""
    import pandas as pd

    ktype = dict(deltas.dtypes)[key_col]

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols)
        bal = peak = clamped = 0
        for d in pdf[delta_col]:
            raw = bal + int(d)
            if raw < 0:
                clamped += 1
                bal = 0
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
                "n_clamped": [clamped],
            }
        )

    return deltas.groupBy(key_col).applyInPandas(
        scan,
        schema=f"{key_col} {ktype}, n_events long, final_balance long, "
        "peak_balance long, n_clamped long",
    )
