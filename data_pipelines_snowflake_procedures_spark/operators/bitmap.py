"""Chunked bitmap indexes for integer-keyed set membership.

The Druid / ClickHouse ``groupBitmap`` pattern re-expressed for Spark:
a segment's member set (e.g. the user ids that fired an event type) is
materialized as fixed-width bitmap chunks — ``chunk = id >> chunk_bits``
selects the chunk row, ``id & mask`` the bit — so set algebra between
segments becomes a CHUNK-ALIGNED equi-join plus bytewise AND/OR/ANDNOT
and a popcount, never a row-level join on the raw membership table.

Scale shape: state is O(universe/8) bytes per segment worst case and
far less for sparse chunks (trailing zeros are trimmed, empty chunks
never materialize); chunks co-partition on the chunk id, so segment
algebra shuffles bitmap rows (pairs × chunks, each ≤ 2^chunk_bits/8
bytes), not member rows. Bitmaps are canonical (trimmed little-endian
bit order), so fold-merge equals recompute byte-for-byte and a DuckDB
oracle can restate every derived count exactly.

Reference parity: the reference has no bitmap surface (its engine
delegates set ops to Snowflake joins); this is a north-star analytics
extension, with the exact-join oracle as the cross-check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bitmap_build(
    df: DataFrame,
    key_cols,
    value_col: str,
    chunk_bits: int = 13,
) -> DataFrame:
    """Materialize (keys…, chunk, bm, card) bitmap rows: ``bm`` holds
    one bit per distinct ``value_col`` in the chunk (bit ``v & mask``
    of byte ``(v & mask) >> 3``), trailing zero bytes trimmed so the
    encoding is canonical; ``card`` is the chunk's exact distinct
    count (a popcount, carried so rollups need no re-scan). Values
    must be non-negative integers."""
    import numpy as np
    import pandas as pd

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    mask = (1 << chunk_bits) - 1
    prepped = df.select(
        *keys,
        F.shiftright(F.col(value_col).cast("long"), chunk_bits).alias(
            "chunk"
        ),
        F.col(value_col)
        .cast("long")
        .bitwiseAND(F.lit(mask).cast("long"))
        .alias("off"),
    )

    out_schema = ", ".join(
        [f"{k} {t}" for k, t in prepped.dtypes if k in keys]
        + ["chunk long", "bm binary", "card long"]
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        offs = np.unique(pdf["off"].to_numpy(dtype=np.int64))
        arr = np.zeros((int(offs.max()) >> 3) + 1, dtype=np.uint8)
        np.bitwise_or.at(
            arr, offs >> 3, np.uint8(1) << (offs & 7).astype(np.uint8)
        )
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row["chunk"] = [pdf["chunk"].iloc[0]]
        row["bm"] = [arr.tobytes()]
        row["card"] = [len(offs)]
        return pd.DataFrame(row)

    return prepped.groupBy(*keys, "chunk").applyInPandas(
        build, schema=out_schema
    )


def bitmap_merge(bitmaps: DataFrame, key_cols) -> DataFrame:
    """OR-fold bitmap rows that share (keys…, chunk) — the rollup of
    per-slice indexes into one. Because the encoding is canonical,
    merge-then-compare is a byte-level fold-equals-recompute check."""
    import numpy as np
    import pandas as pd

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    schema = ", ".join(
        [f"{k} {t}" for k, t in bitmaps.dtypes if k in keys]
        + ["chunk long", "bm binary", "card long"]
    )

    def orfold(pdf: pd.DataFrame) -> pd.DataFrame:
        bufs = [np.frombuffer(b, dtype=np.uint8) for b in pdf["bm"]]
        n = max(len(b) for b in bufs)
        acc = np.zeros(n, dtype=np.uint8)
        for b in bufs:
            acc[: len(b)] |= b
        nz = np.nonzero(acc)[0]
        acc = acc[: int(nz[-1]) + 1] if len(nz) else acc[:1]
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row["chunk"] = [pdf["chunk"].iloc[0]]
        row["bm"] = [acc.tobytes()]
        row["card"] = [int(np.unpackbits(acc).sum())]
        return pd.DataFrame(row)

    return bitmaps.groupBy(*keys, "chunk").applyInPandas(
        orfold, schema=schema
    )


def bitmap_pair_counts(bitmaps: DataFrame, key_col: str) -> DataFrame:
    """All segment pairs (a < b): exact |A∩B|, |A∪B|, |A\\B| from
    bitmap state alone. One chunk-aligned full-outer join between the
    two segments' chunk rows, three bytewise ops + popcounts per
    joined row (Arrow-batched), then a per-pair sum — member rows are
    never touched."""
    import numpy as np
    import pandas as pd

    a = bitmaps.select(
        F.col(key_col).alias("type_a"), "chunk", F.col("bm").alias("bma")
    )
    b = bitmaps.select(
        F.col(key_col).alias("type_b"), "chunk", F.col("bm").alias("bmb")
    )
    joined = a.join(b, "chunk").filter(F.col("type_a") < F.col("type_b"))
    # chunks present on only one side contribute popcount(bm) to union
    # and A-only; cover them via the cards already carried per segment.

    ktype = dict(bitmaps.dtypes)[key_col]

    def pop_and(batches):
        for pdf in batches:
            pis = []
            for xa, yb in zip(pdf["bma"], pdf["bmb"]):
                va = np.frombuffer(xa, dtype=np.uint8)
                vb = np.frombuffer(yb, dtype=np.uint8)
                n = min(len(va), len(vb))
                pis.append(int(np.unpackbits(va[:n] & vb[:n]).sum()))
            yield pd.DataFrame(
                {
                    "type_a": pdf["type_a"],
                    "type_b": pdf["type_b"],
                    "pi": pis,
                }
            )

    inter_by_pair = (
        joined.mapInPandas(
            pop_and, schema=f"type_a {ktype}, type_b {ktype}, pi long"
        )
        .groupBy("type_a", "type_b")
        .agg(F.sum("pi").alias("inter"))
    )

    cards = bitmaps.groupBy(key_col).agg(F.sum("card").alias("card"))
    names = cards.select(F.col(key_col).alias("s"), "card")
    pairs = (
        names.select(F.col("s").alias("type_a"), F.col("card").alias("ca"))
        .crossJoin(
            names.select(
                F.col("s").alias("type_b"), F.col("card").alias("cb")
            )
        )
        .filter(F.col("type_a") < F.col("type_b"))
    )
    return (
        pairs.join(inter_by_pair, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            F.coalesce(F.col("inter"), F.lit(0))
            .cast("long")
            .alias("inter_users"),
            (
                F.col("ca") + F.col("cb") - F.coalesce(F.col("inter"), F.lit(0))
            )
            .cast("long")
            .alias("union_users"),
            (F.col("ca") - F.coalesce(F.col("inter"), F.lit(0)))
            .cast("long")
            .alias("only_a_users"),
        )
        .orderBy("type_a", "type_b")
    )


def bitmap_erase(
    bitmaps: DataFrame,
    erase: DataFrame,
    value_col: str,
    key_cols,
    chunk_bits: int = 13,
) -> DataFrame:
    """Right-to-be-forgotten propagation through bitmap state: clear
    the bits of every id in ``erase`` (one column, ``value_col``)
    from ALL segments' bitmaps, touching only the chunks the erased
    ids fall in. The erase set converts to per-chunk clear masks
    (broadcast — erasure requests are small), bitmap rows AND-NOT
    the mask for their chunk, re-trim to canonical form, recount, and
    rows that empty out disappear — so the erased state is
    byte-identical to a rebuild from the filtered raw table (the
    property a deletion audit checks), without re-scanning raw data.
    Sketches (KMV/HLL) cannot do this — bottom-k state is not
    deletion-tolerant, which is exactly why the bitmap index is the
    erasable representation."""
    import numpy as np
    import pandas as pd

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    mask_rows = bitmap_build(
        erase.select(F.lit(1).alias("_all"), F.col(value_col)),
        "_all",
        value_col,
        chunk_bits=chunk_bits,
    ).select("chunk", F.col("bm").alias("clear"))

    joined = bitmaps.join(F.broadcast(mask_rows), "chunk", "left")
    schema = ", ".join(
        [f"{k} {t}" for k, t in bitmaps.dtypes if k in keys]
        + ["chunk long", "bm binary", "card long"]
    )

    def apply_clear(batches):
        for pdf in batches:
            out = {k: [] for k in keys}
            chunks, bms, cards = [], [], []
            for _, row in pdf.iterrows():
                arr = np.frombuffer(row["bm"], dtype=np.uint8).copy()
                cl = row["clear"]
                if cl is not None:
                    c = np.frombuffer(cl, dtype=np.uint8)
                    n = min(len(arr), len(c))
                    arr[:n] &= ~c[:n]
                nz = np.nonzero(arr)[0]
                if len(nz) == 0:
                    continue  # chunk emptied out — row disappears
                arr = arr[: int(nz[-1]) + 1]
                for k in keys:
                    out[k].append(row[k])
                chunks.append(row["chunk"])
                bms.append(arr.tobytes())
                cards.append(int(np.unpackbits(arr).sum()))
            out["chunk"] = chunks
            out["bm"] = bms
            out["card"] = cards
            yield pd.DataFrame(out)

    return joined.mapInPandas(apply_clear, schema=schema)
