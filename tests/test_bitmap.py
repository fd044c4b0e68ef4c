"""Chunked bitmap index: canonical encoding, OR-fold merge equals
recompute byte-for-byte, and exact pair algebra vs python sets."""

from pyspark.sql import functions as F

from data_pipelines_snowflake_procedures_spark.operators.bitmap import (
    bitmap_build,
    bitmap_merge,
    bitmap_pair_counts,
)

ROWS = (
    [("a", v) for v in [0, 1, 7, 8, 9000, 9001, 70000]]
    + [("b", v) for v in [1, 8, 9001, 9002, 131071]]
    + [("c", v) for v in [70000]]
    + [("a", 1), ("b", 8)]  # duplicates must not change the bitmap
)


def _sets():
    out: dict = {}
    for k, v in ROWS:
        out.setdefault(k, set()).add(v)
    return out


def test_build_canonical_and_cards(spark):
    df = spark.createDataFrame(ROWS, "k STRING, v LONG")
    bm = bitmap_build(df, "k", "v", chunk_bits=13).collect()
    sets = _sets()
    # per-key cardinality sums to exact distinct count
    card = {}
    for r in bm:
        card[r["k"]] = card.get(r["k"], 0) + r["card"]
        assert r["bm"][-1] != 0  # trailing zeros trimmed → canonical
        assert len(r["bm"]) <= 1024  # 2^13 bits
    assert card == {k: len(s) for k, s in sets.items()}
    # empty chunks never materialize
    assert all(r["card"] > 0 for r in bm)


def test_merge_fold_equals_recompute(spark):
    df = spark.createDataFrame(
        [(k, v, v % 3) for k, v in ROWS], "k STRING, v LONG, slice LONG"
    )
    direct = bitmap_build(df, "k", "v", chunk_bits=13)
    parts = [
        bitmap_build(
            df.filter(F.col("slice") == s), "k", "v", chunk_bits=13
        )
        for s in range(3)
    ]
    folded = bitmap_merge(
        parts[0].unionByName(parts[1]).unionByName(parts[2]), "k"
    )
    key = lambda r: (r["k"], r["chunk"])  # noqa: E731
    want = {key(r): (bytes(r["bm"]), r["card"]) for r in direct.collect()}
    got = {key(r): (bytes(r["bm"]), r["card"]) for r in folded.collect()}
    assert got == want  # byte-for-byte, not just count-equal


def test_pair_counts_exact(spark):
    df = spark.createDataFrame(ROWS, "k STRING, v LONG")
    bm = bitmap_build(df, "k", "v", chunk_bits=13)
    got = {
        (r["type_a"], r["type_b"]): (
            r["inter_users"],
            r["union_users"],
            r["only_a_users"],
        )
        for r in bitmap_pair_counts(bm, "k").collect()
    }
    sets = _sets()
    names = sorted(sets)
    want = {
        (a, b): (
            len(sets[a] & sets[b]),
            len(sets[a] | sets[b]),
            len(sets[a] - sets[b]),
        )
        for i, a in enumerate(names)
        for b in names[i + 1 :]
    }
    assert got == want
    # the zero-intersection pair (c shares nothing with b) is present
    assert got[("b", "c")][0] == 0


def test_erase_equals_rebuild_from_filtered(spark):
    """The deletion audit: erased bitmap state is byte-identical to a
    rebuild from the filtered rows; erasing non-members is a no-op;
    fully-erased chunks disappear."""
    from data_pipelines_snowflake_procedures_spark.operators.bitmap import (
        bitmap_erase,
    )

    df = spark.createDataFrame(ROWS, "k STRING, v LONG")
    bm = bitmap_build(df, "k", "v", chunk_bits=13)
    erase = spark.createDataFrame([(70000,), (1,), (9001,)], "v LONG")
    erased = bitmap_erase(bm, erase, "v", "k", chunk_bits=13)

    rebuilt = bitmap_build(
        df.filter(~F.col("v").isin(70000, 1, 9001)), "k", "v", chunk_bits=13
    )
    key = lambda r: (r["k"], r["chunk"])  # noqa: E731
    got = {key(r): (bytes(r["bm"]), r["card"]) for r in erased.collect()}
    want = {key(r): (bytes(r["bm"]), r["card"]) for r in rebuilt.collect()}
    assert got == want
    # c held only 70000 -> its whole chunk row vanished
    assert not any(k == "c" for k, _ in got)

    # erasing ids nobody holds changes nothing
    noop = bitmap_erase(
        bm, spark.createDataFrame([(999999,)], "v LONG"), "v", "k"
    )
    base = {key(r): (bytes(r["bm"]), r["card"]) for r in bm.collect()}
    got2 = {key(r): (bytes(r["bm"]), r["card"]) for r in noop.collect()}
    assert got2 == base
