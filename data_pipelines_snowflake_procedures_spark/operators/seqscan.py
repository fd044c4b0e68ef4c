"""Non-associative sequential scans (capped/clamped running state).

A running sum is a prefix scan and parallelizes through window
functions. A FLOOR-only clamp still has a window form (Skorokhod
reflection: ``bal_t = S_t - min(0, min prefix S)``) — but the
TWO-SIDED clamp ``bal' = min(cap, max(0, bal + delta))`` has no SQL
window-aggregate form over the deltas. It is, however, an ASSOCIATIVE
scan over clamp MAPS: every update is ``f(x) = min(hi, max(lo,
x + s))`` with ``(s, lo, hi) = (delta, 0, cap)``, and the composition
of two such maps is again one —

    (g ∘ f)(x)  =  min(hi', max(lo', x + s'))   with
    s'  = s_f + s_g
    lo' = min(hi_g, max(lo_g, lo_f + s_g))
    hi' = min(hi_g, max(lo_g, hi_f + s_g))

so the per-key prefix maps — and from them every intermediate balance
``bal_t = clamp_t(0)`` — come out of a log-depth segmented doubling
scan of exact int64 triples (optimization r10; the previous
implementation looped rows in Python per key, ~7 s/million rows, and
paid one pandas group-apply call per key). Associativity over the
integers makes the doubling order bit-identical to the sequential
fold; there are no floats anywhere.

Plan shape: one ``repartition(key) + sortWithinPartitions`` pass into
``mapInPandas`` — each Arrow batch is ONE segmented scan (segment =
key run) with ``reduceat`` summaries, so Python work per batch is
~log2(batch) vector ops, not per-row or per-key; the tail key of each
batch is carried into the next so a key split across Arrow batches
folds exactly once.

The arithmetic contract stays the repo's standard for inherently
sequential recursions (Holt-Winters): EXACT INTEGERS end to end, so
the DuckDB recursive-CTE oracle replays the recursion hash-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _clamp_scan_block(deltas, seg_start, cap: int):
    """Segmented inclusive scan of clamp maps over one int64 block.

    ``deltas``: int64[n]; ``seg_start``: bool[n], True where a new key
    begins (row 0 must be True). Returns (bal, prev_bal) int64 arrays:
    ``bal[t]`` is the clamped running balance AFTER row t within its
    segment, ``prev_bal[t]`` the balance BEFORE row t (0 at segment
    starts). Exact: min/max/add on int64 only."""
    import numpy as np

    n = len(deltas)
    s = deltas.astype(np.int64, copy=True)
    lo = np.zeros(n, dtype=np.int64)
    hi = np.full(n, cap, dtype=np.int64)
    seg = np.cumsum(seg_start.astype(np.int64))  # segment id per row
    shift = 1
    while shift < n:
        same = np.zeros(n, dtype=bool)
        same[shift:] = seg[shift:] == seg[:-shift]
        # compose earlier prefix f = [i-shift] into current g = [i]
        s_f = s[:-shift]
        lo_f = lo[:-shift]
        hi_f = hi[:-shift]
        st, lt, ht = s[shift:], lo[shift:], hi[shift:]
        m = same[shift:]
        new_s = np.where(m, s_f + st, st)
        new_lo = np.where(m, np.minimum(ht, np.maximum(lt, lo_f + st)), lt)
        new_hi = np.where(m, np.minimum(ht, np.maximum(lt, hi_f + st)), ht)
        s = np.concatenate([s[:shift], new_s])
        lo = np.concatenate([lo[:shift], new_lo])
        hi = np.concatenate([hi[:shift], new_hi])
        shift *= 2
    bal = np.minimum(hi, np.maximum(lo, s))  # prefix map applied to 0
    prev_bal = np.empty(n, dtype=np.int64)
    if n:
        prev_bal[0] = 0
        prev_bal[1:] = bal[:-1]
        prev_bal[seg_start] = 0
    return bal, prev_bal


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
    import numpy as np
    import pandas as pd

    ktype = dict(deltas.dtypes)[key_col]
    out_cols = [
        key_col, "n_events", "final_balance", "peak_balance",
        "n_floored", "n_capped",
    ]

    # Sentinel distinct from every real key value: a NULL key surfaces
    # as None/NaN in pandas, so `None` cannot double as "no carry"
    # without dropping a null-key run at the partition tail (ADVICE r10).
    _NO_CARRY = object()

    def scan_partition(batches):
        carry_key = _NO_CARRY     # key value of the run spanning batches
        carry: list = []          # its delta arrays so far, in order

        def flush_carry():
            d = np.concatenate(carry)
            seg0 = np.zeros(len(d), dtype=bool)
            seg0[0] = True
            bal, prev = _clamp_scan_block(d, seg0, cap)
            raw = prev + d
            return pd.DataFrame(
                [
                    (
                        carry_key,
                        len(d),
                        int(bal[-1]),
                        int(bal.max()),
                        int((raw < 0).sum()),
                        int((raw > cap).sum()),
                    )
                ],
                columns=out_cols,
            )

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            keys = pdf[key_col]
            d = pdf[delta_col].to_numpy(dtype=np.int64)
            # key-run boundaries (order-preserving integer codes work
            # for any key dtype)
            codes = pd.factorize(keys)[0]
            seg_start = np.empty(n, dtype=bool)
            seg_start[0] = True
            seg_start[1:] = codes[1:] != codes[:-1]
            starts = np.flatnonzero(seg_start)
            first_key = keys.iloc[0]
            has_carry = carry_key is not _NO_CARRY
            # na-aware run continuation: a NULL key surfaces as NaN/None
            # in pandas and NaN != NaN, so a null-key run spanning Arrow
            # batches would otherwise fold as two runs (ADVICE r10).
            same_key = has_carry and (
                first_key == carry_key
                or (bool(pd.isna(first_key)) and bool(pd.isna(carry_key)))
            )
            if same_key:
                if len(starts) == 1:
                    carry.append(d)  # whole batch continues the run
                    continue
                split = starts[1]
                carry.append(d[:split])
                # fold the completed carried run, then the rest below
                out = [flush_carry()]
                carry_key, carry = _NO_CARRY, []
                d = d[split:]
                seg_start = seg_start[split:]
                starts = starts[1:] - split
                keys = keys.iloc[split:]
            elif has_carry:
                out = [flush_carry()]
                carry_key, carry = _NO_CARRY, []
            else:
                out = []
            # last run may continue into the next batch: carry it
            last_start = starts[-1]
            carry_key = keys.iloc[len(keys) - 1]
            carry = [d[last_start:]]
            d = d[:last_start]
            seg_start = seg_start[:last_start]
            starts = starts[:-1]
            if len(d):
                bal, prev = _clamp_scan_block(d, seg_start, cap)
                raw = prev + d
                ends = np.empty(len(starts), dtype=np.int64)
                ends[:-1] = starts[1:]
                ends[-1] = len(d)
                out.append(
                    pd.DataFrame(
                        {
                            key_col: keys.iloc[starts].to_numpy(),
                            "n_events": ends - starts,
                            "final_balance": bal[ends - 1],
                            "peak_balance": np.maximum.reduceat(bal, starts),
                            "n_floored": np.add.reduceat(raw < 0, starts),
                            "n_capped": np.add.reduceat(raw > cap, starts),
                        }
                    )
                )
            for frame in out:
                yield frame
        if carry_key is not None:
            yield flush_carry()

    prepared = (
        deltas.select(key_col, delta_col, *order_cols)
        .repartition(F.col(key_col))
        .sortWithinPartitions(key_col, *order_cols)
        .select(key_col, delta_col)
    )
    return prepared.mapInPandas(
        scan_partition,
        schema=f"{key_col} {ktype}, n_events long, final_balance long, "
        "peak_balance long, n_floored long, n_capped long",
    )
