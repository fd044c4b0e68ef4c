"""Focused tests for the r10 per-cell kNN kernel behind the LOF and
TwoNN entries (queries_llm._cell_knn_blocks / _lof_cell_scores): the
vectorized kernel must reproduce the old pair-join algebra bit-for-bit
— same fold order for distances, Spark's HALF_UP integer rounding,
(dm, vec_id) neighbor ordering, and the left-to-right lrd fold."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from data_pipelines_snowflake_procedures_spark.queries_llm import (
    _cell_knn_blocks,
)


def _ref_dm(xa, xb):
    """The old expression, literally: left-to-right fold of squared
    dim differences from 0.0, sqrt, *1e6, HALF_UP to integer."""
    acc = 0.0
    for x, y in zip(xa, xb):
        acc = acc + (float(x) - float(y)) * (float(x) - float(y))
    v = math.sqrt(acc) * 1e6
    ip = math.floor(v)
    return int(ip) + (1 if v - ip >= 0.5 else 0)


def _pdf(ids, vecs):
    return pd.DataFrame(
        {
            "vec_id": pd.Series(ids, dtype="int64"),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            "cell": pd.Series([0] * len(ids), dtype="int64"),
        }
    )


def test_cell_knn_matches_reference_fold():
    rng = np.random.RandomState(7)
    n, dim, k = 40, 16, 5
    vecs = rng.randn(n, dim).astype(np.float32)
    ids = np.arange(100, 100 + n, dtype=np.int64)
    got_ids, dm_rows, nb_rows = _cell_knn_blocks(_pdf(ids, vecs), k)
    assert list(got_ids) == list(ids)
    x64 = vecs.astype(np.float64)
    for i in range(n):
        ref = sorted(
            (
                (_ref_dm(x64[i], x64[j]), int(ids[j]), j)
                for j in range(n)
                if j != i
            )
        )[:k]
        assert list(dm_rows[i]) == [r[0] for r in ref]
        assert [int(ids[j]) for j in nb_rows[i]] == [r[1] for r in ref]


def test_cell_knn_tie_break_on_vec_id():
    # three identical points: dm = 0 ties everywhere, neighbor order
    # must fall back to ascending vec_id (the old (dm, ib) struct sort)
    vecs = [[1.0, 2.0]] * 3
    ids = [30, 10, 20]
    got_ids, dm_rows, nb_rows = _cell_knn_blocks(_pdf(ids, vecs), 5)
    by_id = {int(got_ids[i]): [int(got_ids[j]) for j in nb_rows[i]]
             for i in range(3)}
    assert by_id[10] == [20, 30]
    assert by_id[20] == [10, 30]
    assert by_id[30] == [10, 20]


def test_cell_knn_half_up_rounding_boundary():
    # engineered .5 boundary: distance 0.0000015 -> dm float 1.5
    # exactly representable; HALF_UP must round to 2, never banker's 1
    a = [0.0]
    b = [1.5e-6]
    _ids, dm_rows, _nb = _cell_knn_blocks(_pdf([1, 2], [a, b]), 1)
    assert dm_rows[0][0] == 2


def test_cell_knn_singleton_cell_empty():
    ids, dm_rows, nb_rows = _cell_knn_blocks(_pdf([5], [[1.0, 1.0]]), 5)
    assert dm_rows == [] and nb_rows == []


def test_cell_knn_row_blocking_path():
    """A cell big enough that the 4M-entry budget splits it into
    row blocks (the skewed-cell memory guard) must still match the
    reference fold on sampled rows."""
    rng = np.random.RandomState(3)
    n, dim, k = 2100, 4, 3  # block = 4_000_000 // 2100 = 1904 < n
    vecs = rng.randn(n, dim).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    got_ids, dm_rows, nb_rows = _cell_knn_blocks(_pdf(ids, vecs), k)
    assert len(dm_rows) == n
    x64 = vecs.astype(np.float64)
    for i in (0, 1903, 1904, 2099, 1050):  # spans both blocks + edges
        ref = sorted(
            (
                (_ref_dm(x64[i], x64[j]), int(ids[j]))
                for j in range(n)
                if j != i
            )
        )[:k]
        assert list(dm_rows[i]) == [r[0] for r in ref]
        assert [int(ids[j]) for j in nb_rows[i]] == [r[1] for r in ref]
