"""Distributed PCA / whitening over embedding columns — the linear-
algebra pass an embedding pipeline runs before ANN, SemDeDup, or
cluster balancing: center the corpus, rotate onto the principal axes,
optionally rescale to unit variance (whitening). Decorrelated inputs
make cosine/L2 geometry honest when raw dimensions are correlated or
wildly unequal in scale.

Spark-first split of the work, mirroring MLlib's own PCA shape without
importing it:

* **Moment accumulation is distributed**: each partition reduces its
  Arrow batches to one (n, Σx, ΣxᵀX) triple via numpy
  (``mapInPandas`` — a dim×dim matmul per batch is exactly the case
  the built-in expression language cannot express efficiently; 4096
  ``F.sum`` products would bloat codegen, a posexplode pair-join
  would shuffle dim²·rows). The triples are dim²-sized, so the final
  fold is metadata work.
* **Eigendecomposition is driver-side**: the covariance matrix is
  dim×dim (64×64 here = 32 KB) — the same "model state lives on the
  driver as literals" contract as k-means centroids and PQ codebooks.
* **Projection is a broadcast expression**: components ride back in as
  a 1-row broadcast matrix; the projection is zip_with dot products —
  zero shuffle, corpus never moves.

Determinism: covariance entries and eigenvalues are deterministic;
eigenVECTOR sign is not (v and −v span the same axis), so
:func:`pca_fit` canonicalizes each component to make its
largest-|coefficient| entry positive (lowest index on ties). Results
round to 6 decimals at fit time.

Oracle status: eigendecomposition is not expressible in DuckDB SQL, so
the registry entry is rows-only by nature; value-level verification is
the numpy cross-check in tests/test_llm_ops.py (distributed moments ==
exact single-machine PCA on the collected corpus).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _moment_frame(df: DataFrame, emb_col: str) -> DataFrame:
    """Partition-level (n, Σx, X^T X) partials: one output row per
    non-empty Arrow batch, each dim²-sized regardless of row count."""
    import pandas as pd  # noqa: F401 — mapInPandas contract

    def partials(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            x = np.asarray(pdf[emb_col].tolist(), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "n": [int(x.shape[0])],
                    "s": [x.sum(axis=0).tolist()],
                    "ss": [(x.T @ x).ravel().tolist()],
                }
            )

    return df.select(emb_col).mapInPandas(
        partials, schema="n BIGINT, s ARRAY<DOUBLE>, ss ARRAY<DOUBLE>"
    )


def covariance_from_moments(parts: list) -> tuple[int, "object", "object"]:
    """Fold collected moment partials into ``(n, mean, cov)`` — the
    ONE place the '(Σxxᵀ − Σx·Σxᵀ/n) / max(n−1, 1)' algebra lives, so
    :func:`pca_fit` and the covariance registry entry cannot drift.
    Raises ValueError on empty input; a single-row corpus yields a
    zero covariance (the max(n−1, 1) floor) rather than dividing by
    zero."""
    import numpy as np

    if not parts:
        raise ValueError("covariance_from_moments: empty input")
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    dim = s.shape[0]
    ss = np.sum([np.asarray(p["ss"]).reshape(dim, dim) for p in parts], axis=0)
    cov = (ss - np.outer(s, s) / n) / max(n - 1, 1)
    return n, s / n, cov


def pca_fit(
    df: DataFrame,
    k: int = 8,
    emb_col: str = "embedding",
    decimals: int = 6,
) -> dict:
    """Fit PCA on an embedding column. Returns driver-held model state
    (the k-means/PQ contract): ``{"mean": [dim], "components":
    [k][dim] (rows = components, unit norm, sign-canonical),
    "explained_variance": [k], "explained_variance_ratio": [k]}``.

    One distributed pass accumulates (n, Σx, XᵀX); covariance,
    eigendecomposition, and canonicalization are driver-side numpy
    over the dim×dim matrix."""
    import numpy as np

    parts = _moment_frame(df, emb_col).collect()
    n, mean, cov = covariance_from_moments(parts)
    evals, evecs = np.linalg.eigh(cov)  # ascending; symmetric-exact
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k × dim
    # sign canon: largest-|coeff| entry positive (lowest index on ties)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    ev = np.maximum(evals[order], 0.0)
    total = float(np.sum(np.maximum(evals, 0.0))) or 1.0
    r = decimals
    return {
        "n": int(n),
        "mean": [round(float(v), r) for v in mean],
        "components": [[round(float(v), r) for v in row] for row in comps],
        "explained_variance": [round(float(v), r) for v in ev],
        "explained_variance_ratio": [round(float(v) / total, r) for v in ev],
    }


def pca_project(
    df: DataFrame,
    model: dict,
    emb_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    decimals: int = 6,
    eps: float = 1e-9,
) -> DataFrame:
    """Append ``out_col``: the centered embedding projected onto the
    model's components (length k), optionally whitened (each component
    divided by √variance, flooring tiny variances at ``eps`` so a
    degenerate axis cannot explode). The mean and component matrix
    ride in as a broadcast 1-row table — zero shuffle, and the plan
    stays small at any (k, dim), same rationale as kmeans_assign_df."""
    spark = df.sparkSession
    scale = [
        max(float(v), eps) ** 0.5 for v in model["explained_variance"]
    ]
    comps = [
        [c / s for c in row] if whiten else list(row)
        for row, s in zip(model["components"], scale)
    ]
    mat = spark.createDataFrame(
        [([float(v) for v in model["mean"]], [[float(c) for c in row] for row in comps],)],
        "__pca_mean: array<double>, __pca_comps: array<array<double>>",
    )
    centered = F.zip_with(
        F.col(emb_col), F.col("__pca_mean"), lambda x, m: x.cast("double") - m
    )
    proj = F.transform(
        F.col("__pca_comps"),
        lambda row: F.round(
            F.aggregate(
                F.zip_with(centered, row, lambda x, c: x * c),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            decimals,
        ),
    )
    return (
        df.crossJoin(F.broadcast(mat))
        .withColumn(out_col, proj)
        .drop("__pca_mean", "__pca_comps")
    )


# -------------------------------------------------------------------------
# Johnson-Lindenstrauss sparse sign projection (round 8, E192/E193)
# -------------------------------------------------------------------------

def jl_signs(in_dim: int, out_dim: int) -> "list[list[int]]":
    """Deterministic ±1 sign matrix for the JL projection (Achlioptas
    2003 database-friendly variant, all-±1 form), derived from md5 of
    the (out, in) index pair — the SINGLE SOURCE both the Spark
    operator and the SQL oracle generator read (the
    ``minhash_perm_consts`` contract). ``signs[j][i]`` is the sign of
    input dim i in output dim j."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"jl-{j}-{i}".encode()).hexdigest()[0], 16) % 2
            == 0
            else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def jl_project_cols(
    emb_col: str, in_dim: int, out_dim: int, decimals: int = 6
) -> "list":
    """The ``out_dim`` projected coordinates as Spark Columns:
    ``y_j = round((±x_0 ±x_1 ... ±x_{d-1}) / sqrt(out_dim), decimals)``.

    Bit-exactness contract: every element is cast to DOUBLE first and
    the signed terms are added in one fixed left-associative chain —
    the SQL oracle (:func:`jl_project_sql`) emits the terms in the
    SAME textual order, so both engines execute the identical IEEE
    double operation sequence and agree to the last bit BEFORE the
    final rounding. ``out_dim`` should be a perfect square so the
    1/sqrt(k) scale is an exact double (16 → /4.0).

    No fitting, no shuffle, no driver state: unlike PCA the JL map is
    data-independent, so the projection is a pure narrow projection
    that fuses into the scan — the cheapest dimensionality reduction
    that still carries a distance-preservation guarantee.

    Each output dim is built as ONE ``F.expr`` string (Spark SQL
    array indexing is 0-based), not term-by-term Column arithmetic:
    the per-term form cost ~3 py4j round-trips × in_dim × out_dim
    (~5 s of driver-side build time per call at 64×16, vs 0.2 s of
    actual execution)."""
    import math

    scale = math.sqrt(out_dim)
    cols = []
    for j, row in enumerate(jl_signs(in_dim, out_dim)):
        terms = "".join(
            ("+" if s > 0 else "-") + f" CAST({emb_col}[{i}] AS DOUBLE) "
            for i, s in enumerate(row)
        )
        chain = terms.lstrip("+ ").strip() if row[0] > 0 else terms.strip()
        cols.append(
            F.expr(
                f"round(({chain}) / {scale!r}D, {decimals}) AS y{j}"
            )
        )
    return cols


def jl_project_sql(
    emb_col: str, in_dim: int, out_dim: int, decimals: int = 6
) -> "list[str]":
    """The SQL restatement of :func:`jl_project_cols` (DuckDB arrays
    are 1-based). Returns one expression string per output dim,
    aliased ``y{j}`` — term order identical to the Spark chain."""
    import math

    scale = math.sqrt(out_dim)
    out = []
    for j, row in enumerate(jl_signs(in_dim, out_dim)):
        terms = "".join(
            ("+" if s > 0 else "-")
            + f" CAST({emb_col}[{i + 1}] AS DOUBLE) "
            for i, s in enumerate(row)
        )
        # leading "+ x" == the Spark chain's unary first term
        out.append(
            f"round(({terms.lstrip('+ ').strip() if row[0] > 0 else terms.strip()})"
            f" / {scale!r}, {decimals}) AS y{j}"
        )
    return out
