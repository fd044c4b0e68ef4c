"""Invariants of the sf-scale generator (scripts/make_scale.py): the
structure-preserving claims BENCH_sf1.json rests on, pinned at tiny
scale so generator regressions surface in CI, not in a 10-minute
stress run."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.fixture(scope="module")
def scaled(spark, sf_dir, tmp_path_factory):
    from make_scale import MULTIPLIERS, scale_table

    out = {}
    for name in ("customer", "orders", "events", "documents", "embeddings"):
        out[name] = scale_table(spark, sf_dir, name).drop("__copy")
    out["_mult"] = MULTIPLIERS
    return out


def test_row_counts_multiply(spark, sf_dir, scaled):
    from data_pipelines_snowflake_procedures_spark.session import load_table

    for name in ("customer", "orders", "events", "documents", "embeddings"):
        base = load_table(spark, sf_dir, name).count()
        assert scaled[name].count() == base * scaled["_mult"][name], name


def test_referential_integrity_per_copy(scaled):
    orphans = (
        scaled["orders"]
        .join(
            scaled["customer"],
            scaled["orders"].o_custkey == scaled["customer"].c_custkey,
            "left_anti",
        )
        .count()
    )
    assert orphans == 0


def test_events_keep_time_range_and_type(spark, sf_dir, scaled):
    from data_pipelines_snowflake_procedures_spark.session import load_table

    assert dict(scaled["events"].dtypes)["ts"] == "timestamp"
    base = load_table(spark, sf_dir, "events").agg(
        F.min("ts"), F.max("ts")
    ).collect()[0]
    got = scaled["events"].agg(F.min("ts"), F.max("ts")).collect()[0]
    assert (got[0], got[1]) == (base[0], base[1])  # denser, not longer


def test_embedding_copies_are_isometric(scaled):
    """Within-copy cosine geometry must be EXACTLY the original's
    (dimension rotation is an isometry); cross-copy cosines differ."""
    emb = scaled["embeddings"]
    ids = [3, 4]
    off = 2000  # vec_id offset per copy
    v = {
        r["vec_id"]: r["embedding"]
        for r in emb.filter(
            F.col("vec_id").isin(ids + [i + off for i in ids] + [3 + 2 * off])
        ).collect()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dot / (na * nb)

    base = cos(v[3], v[4])
    copy1 = cos(v[3 + off], v[4 + off])
    assert abs(base - copy1) < 1e-6
    # the copy really is rotated, not duplicated
    assert abs(cos(v[3], v[3 + off])) < 0.9
    assert abs(cos(v[3], v[3 + 2 * off])) < 0.9


def test_document_copies_vocab_bijection(scaled):
    """Cross-copy text of the same base doc diverges on long tokens
    (so near-dup detectors don't pair copies) while short tokens —
    the stopword/lang-id carriers — survive; n_chars is recomputed."""
    docs = scaled["documents"]
    off = 5000
    rows = {
        r["doc_id"]: r
        for r in docs.filter(F.col("doc_id").isin([7, 7 + off, 7 + 2 * off])).collect()
    }
    base, c1, c2 = rows[7], rows[7 + off], rows[7 + 2 * off]
    assert c1["text"] != base["text"] != c2["text"]
    bt, t1 = set(base["text"].split()), set(c1["text"].split())
    short = {t for t in bt if len(t) < 5}
    long_ = {t for t in bt if len(t) >= 5}
    assert short <= t1                      # short tokens untouched
    assert not (long_ & t1) or long_ == set()  # long tokens all remapped
    for r in (base, c1, c2):
        assert r["n_chars"] == len(r["text"])


def test_customer_name_suffixes_are_distance_2(scaled):
    names = {
        r["c_custkey"]: r["c_name"]
        for r in scaled["customer"]
        .filter(F.col("c_custkey").isin([7, 15007, 30007]))
        .collect()
    }
    a, b = names[15007], names[30007]
    # same base, two-letter suffix differs in both characters
    assert a[:-4] == b[:-4] and a[-4:] != b[-4:]
    diff = sum(1 for x, y in zip(a, b) if x != y)
    assert diff >= 2
