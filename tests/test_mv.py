"""Materialized-rollup rewrite (plans/mv.py): subsumption matching,
refusal paths, and rewrite-equals-recompute parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipelines_snowflake_procedures_spark.operators.incremental import (
    partial_agg,
)
from data_pipelines_snowflake_procedures_spark.plans.mv import (
    AggQuery,
    RollupView,
    answer,
    try_rewrite,
)


@pytest.fixture(scope="module")
def fact(spark):
    rows = [
        ("a", "x", 10.0), ("a", "x", 20.0), ("a", "y", 5.0),
        ("b", "x", 100.0), ("b", "y", 1.0), ("b", "y", 2.0),
        ("c", "x", 7.0),
    ]
    return spark.createDataFrame(rows, "k1 STRING, k2 STRING, v DOUBLE")


@pytest.fixture(scope="module")
def view(fact):
    return RollupView(
        name="t_by_k1_k2",
        table="t",
        keys=("k1", "k2"),
        value_col="v",
        state=partial_agg(fact, ["k1", "k2"], "v"),
    )


def _q(**over):
    base = dict(
        table="t",
        group_by=("k1",),
        value_col="v",
        measures=(
            ("count", "n"), ("sum", "s"), ("avg", "a"),
            ("min", "lo"), ("max", "hi"),
        ),
    )
    base.update(over)
    return AggQuery(**base)


@pytest.mark.slowtier
def test_rewrite_matches_recompute(fact, view):
    """The rewrite over the rollup equals the from-scratch aggregate,
    for the plain case, a key-subset grouping, and a key filter."""
    for q in (
        _q(),
        _q(group_by=("k1", "k2")),
        _q(eq_filters=(("k2", "x"),)),
        _q(group_by=(), eq_filters=(("k1", "b"),)),  # global aggregate
    ):
        rewritten = try_rewrite(q, [view])
        assert rewritten is not None, q
        direct, used = answer(q, [], fact)
        assert not used
        key = [r for r in q.group_by]
        got = sorted(rewritten.collect(), key=lambda r: tuple(r[k] for k in key))
        exp = sorted(direct.collect(), key=lambda r: tuple(r[k] for k in key))
        assert [r.asDict() for r in got] == [r.asDict() for r in exp], q


def test_refusal_paths(fact, view):
    """No rewrite when: unknown table, grouping key not materialized,
    filter on a non-key column, different measure column, or a
    non-derivable measure — and answer() falls back to the fact."""
    cases = [
        _q(table="other"),
        _q(group_by=("k3",)),
        _q(eq_filters=(("v", 10.0),)),
        _q(value_col="w"),
        _q(measures=(("count_distinct", "d"),)),
    ]
    for q in cases:
        assert try_rewrite(q, [view]) is None, q
    # fallback still answers the valid-but-unmatched query
    q = _q(eq_filters=(("v", 10.0),))
    out, used = answer(q, [view], fact)
    assert not used
    rows = {r["k1"]: r["n"] for r in out.collect()}
    assert rows == {"a": 1}


def test_rewrite_never_scans_fact(fact, view):
    """The rewritten plan reads only the rollup state: collapsing the
    state to a single marker row changes the answer, proving the fact
    table is not consulted."""
    fake_state = view.state.withColumn("sum", F.lit(0.0))
    poisoned = RollupView(
        name=view.name, table=view.table, keys=view.keys,
        value_col=view.value_col, state=fake_state,
    )
    out = try_rewrite(_q(measures=(("sum", "s"),)), [poisoned])
    assert all(r["s"] == 0.0 for r in out.collect())


def test_rewrite_over_incrementally_maintained_state(spark, fact):
    """The full materialized-view lifecycle: the rollup is MAINTAINED
    incrementally (two batches reduced to partials, merged) rather
    than rebuilt, and the rewrite over the merged state still equals
    the from-scratch aggregate — the composition that makes MV rewrite
    worthwhile at 100 TB (never re-read history, never re-scan facts)."""
    from data_pipelines_snowflake_procedures_spark.operators.incremental import (
        merge_partials,
    )

    b1 = fact.filter(F.col("k1") != "c")
    b2 = fact.filter(F.col("k1") == "c")
    state = merge_partials(
        [partial_agg(b1, ["k1", "k2"], "v"), partial_agg(b2, ["k1", "k2"], "v")],
        ["k1", "k2"],
    )
    view = RollupView(
        name="ivm", table="t", keys=("k1", "k2"), value_col="v", state=state
    )
    q = _q()
    got, used = answer(q, [view], fact.limit(0))  # empty fact: rewrite or bust
    assert used
    exp, _ = answer(q, [], fact)
    assert sorted(
        (r.asDict() for r in got.collect()), key=lambda d: d["k1"]
    ) == sorted((r.asDict() for r in exp.collect()), key=lambda d: d["k1"])


def test_distinct_rewrite_paths(spark, fact):
    """Sketch-backed distinct rewrite: sub-k groups are exact; the
    estimator engages above k; containment refusals mirror the
    rollup matcher; non-distinct measures are declined."""
    from data_pipelines_snowflake_procedures_spark.operators.sketch import (
        kmv_sketch,
    )
    from data_pipelines_snowflake_procedures_spark.plans.mv import (
        KmvDistinctView,
        try_rewrite_distinct,
    )

    rows = [("a", "x", i) for i in range(300)] + [
        ("a", "y", i) for i in range(250, 550)
    ] + [("b", "x", i) for i in range(5)]
    df = spark.createDataFrame(rows, "k1 STRING, k2 STRING, v LONG")
    view = KmvDistinctView(
        name="d", table="t", keys=("k1", "k2"), value_col="v", k=128,
        state=kmv_sketch(df, ["k1", "k2"], "v", k=128),
    )
    q = AggQuery(
        table="t", group_by=("k1",), value_col="v",
        measures=(("distinct_approx", "d"),),
    )
    out = {r["k1"]: r["d"] for r in try_rewrite_distinct(q, [view]).collect()}
    assert out["b"] == 5  # sub-k: exact
    assert abs(out["a"] - 550) / 550 < 0.30  # estimator within band

    # refusals: measure mix, unknown key, non-key filter, wrong column
    for bad in (
        AggQuery("t", ("k1",), "v", (("count", "c"),)),
        AggQuery("t", ("k3",), "v", (("distinct_approx", "d"),)),
        AggQuery("t", ("k1",), "v", (("distinct_approx", "d"),),
                 eq_filters=(("v", 1),)),
        AggQuery("t", ("k1",), "w", (("distinct_approx", "d"),)),
    ):
        assert try_rewrite_distinct(bad, [view]) is None, bad


def test_bitmap_distinct_rewrite_refusals(spark):
    """Exact-bitmap rewrite mirrors the containment matcher and
    declines measure-mix / unknown-key / non-key-filter queries."""
    from data_pipelines_snowflake_procedures_spark.operators.bitmap import (
        bitmap_build,
    )
    from data_pipelines_snowflake_procedures_spark.plans.mv import (
        BitmapDistinctView,
        try_rewrite_distinct_exact,
    )

    df = spark.createDataFrame(
        [("a", "x", i % 40) for i in range(200)]
        + [("b", "y", i % 7) for i in range(50)],
        "k1 STRING, k2 STRING, v LONG",
    )
    view = BitmapDistinctView(
        name="d", table="t", keys=("k1", "k2"), value_col="v",
        chunk_bits=13, state=bitmap_build(df, ["k1", "k2"], "v"),
    )
    q = AggQuery("t", ("k1",), "v", (("distinct_exact", "d"),))
    got = {r["k1"]: r["d"] for r in
           try_rewrite_distinct_exact(q, [view]).collect()}
    assert got == {"a": 40, "b": 7}  # exact, no estimator band
    for bad in (
        AggQuery("t", ("k1",), "v", (("count", "c"),)),
        AggQuery("t", ("k3",), "v", (("distinct_exact", "d"),)),
        AggQuery("t", ("k1",), "v", (("distinct_exact", "d"),),
                 eq_filters=(("v", 1),)),
        AggQuery("t", ("k1",), "w", (("distinct_exact", "d"),)),
    ):
        assert try_rewrite_distinct_exact(bad, [view]) is None, bad


def test_distinct_rewrites_never_touch_the_fact_table(spark):
    """Poisoned-state proof for BOTH distinct rewrites: hand the
    rewriter a state that disagrees with the fact table and observe
    the poisoned answer — if the fact table were consulted the
    numbers would be correct, which would FAIL this test."""
    from data_pipelines_snowflake_procedures_spark.operators.bitmap import (
        bitmap_build,
    )
    from data_pipelines_snowflake_procedures_spark.operators.sketch import (
        kmv_sketch,
    )
    from data_pipelines_snowflake_procedures_spark.plans.mv import (
        BitmapDistinctView,
        KmvDistinctView,
        try_rewrite_distinct,
        try_rewrite_distinct_exact,
    )

    # the "fact table" the views pretend to summarize has 40 distincts
    # per key; the poisoned state was built from only 3 of them
    poisoned_src = spark.createDataFrame(
        [("a", "x", v) for v in (1, 2, 3)], "k1 STRING, k2 STRING, v LONG"
    )
    bview = BitmapDistinctView(
        name="b", table="t", keys=("k1", "k2"), value_col="v",
        chunk_bits=13, state=bitmap_build(poisoned_src, ["k1", "k2"], "v"),
    )
    kview = KmvDistinctView(
        name="k", table="t", keys=("k1", "k2"), value_col="v", k=128,
        state=kmv_sketch(poisoned_src, ["k1", "k2"], "v", k=128),
    )
    qb = AggQuery("t", ("k1",), "v", (("distinct_exact", "d"),))
    qk = AggQuery("t", ("k1",), "v", (("distinct_approx", "d"),))
    got_b = try_rewrite_distinct_exact(qb, [bview]).collect()
    got_k = try_rewrite_distinct(qk, [kview]).collect()
    assert [(r["k1"], r["d"]) for r in got_b] == [("a", 3)]
    assert [(r["k1"], r["d"]) for r in got_k] == [("a", 3)]  # sub-k exact


def test_distinct_rewrites_support_global_grouping(spark):
    """group_by=() — the ungrouped/global distinct — must work in both
    rewrites (review: the bitmap schema string was malformed for an
    empty key list)."""
    from data_pipelines_snowflake_procedures_spark.operators.bitmap import (
        bitmap_build,
    )
    from data_pipelines_snowflake_procedures_spark.operators.sketch import (
        kmv_sketch,
    )
    from data_pipelines_snowflake_procedures_spark.plans.mv import (
        BitmapDistinctView,
        KmvDistinctView,
        try_rewrite_distinct,
        try_rewrite_distinct_exact,
    )

    df = spark.createDataFrame(
        [("a", "x", v % 33) for v in range(100)]
        + [("b", "y", 100 + v % 12) for v in range(30)],
        "k1 STRING, k2 STRING, v LONG",
    )
    bview = BitmapDistinctView(
        name="b", table="t", keys=("k1", "k2"), value_col="v",
        chunk_bits=13, state=bitmap_build(df, ["k1", "k2"], "v"),
    )
    kview = KmvDistinctView(
        name="k", table="t", keys=("k1", "k2"), value_col="v", k=128,
        state=kmv_sketch(df, ["k1", "k2"], "v", k=128),
    )
    qb = AggQuery("t", (), "v", (("distinct_exact", "d"),))
    qk = AggQuery("t", (), "v", (("distinct_approx", "d"),))
    assert try_rewrite_distinct_exact(qb, [bview]).collect()[0]["d"] == 45
    assert try_rewrite_distinct(qk, [kview]).collect()[0]["d"] == 45
