"""Similarity search over embedding columns: brute-force cosine top-k
(the exact baseline) and signed-random-projection LSH bucketing (the
scale path). North-star extension per SURVEY.md §7 step 8, over the
``embeddings`` harness table (``array<float>`` of dim 64).

Scale design: brute-force is one broadcast of the (small) query set
against the corpus — a narrow map over corpus partitions followed by a
per-query top-k (TakeOrdered-style: per-partition heads then a tiny
final reduce; never a global sort). SRP-LSH replaces the full scan
with a bucket equi-join: only vectors sharing a signature bucket are
compared, trading recall for a ~(corpus/buckets) scan reduction;
multi-probe (xor-ing single bits) recovers recall at the margin.

Hyperplanes are derived deterministically from md5 (seeded), so the
same buckets come out on any engine / cluster / run — which also makes
the bucketing oracle-testable in SQL.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import dot_product, norm


def srp_hyperplanes(n_planes: int, dim: int, seed: str = "srp") -> list[list[int]]:
    """Deterministic ±1 hyperplanes: component (p, d) is +1 when the
    first hex digit of md5(f"{seed}|{p}|{d}") is even. Pure function of
    (seed, p, d) — reproducible anywhere, including inside SQL."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}|{p}|{d}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) % 2 == 0 else -1)
        planes.append(row)
    return planes


def srp_bucket(
    emb: Column, planes: list[list[int]]
) -> Column:
    """SRP signature as a bucket id: bit p is 1 iff emb · plane_p ≥ 0.
    One narrow expression per plane — stays in codegen, no UDF."""
    value = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                emb,
                F.array(*[F.lit(float(w)) for w in plane]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        value = value + F.when(dot >= 0, F.lit(2**p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return value


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the corpus,
    rank per query. Output (query_id, neighbor_id, cosine, rank).

    The join is a broadcast nested loop over corpus partitions (query
    sets are small by definition); ranking is a per-query window over
    k·|queries| candidate rows after AQE's partial top-k pushdown."""
    # norms are computed once per row BEFORE the join — recomputing
    # them per (query, corpus) pair would redo |queries|× the work
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        norm(F.col(emb_col)).alias("q_nrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("c_emb"),
        norm(F.col(emb_col)).alias("c_nrm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_product(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_nrm") * F.col("c_nrm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its
    highest-cosine centroid (ties broken by centroid id). Centroids
    broadcast (there are k of them); assignment is a narrow
    broadcast-join + per-vector top-1 — no shuffle of the corpus.

    Centroid choice is the caller's: k-means, or any deterministic
    seed set (tests use the first k vectors). Output: all input
    columns + ``centroid_id``."""
    cents = centroids.select(
        F.col(centroid_id), F.col(emb_col).alias("__c_emb"),
        norm(F.col(emb_col)).alias("__c_nrm"),
    )
    scored = (
        df.withColumn("__v_nrm", norm(F.col(emb_col)))
        .join(F.broadcast(cents))
        .withColumn(
            "__sim",
            dot_product(F.col(emb_col), F.col("__c_emb"))
            / (F.col("__v_nrm") * F.col("__c_nrm")),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__sim"), F.asc(centroid_id))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__c_emb", "__c_nrm", "__v_nrm", "__sim", "__rn")
    )


def ivf_assign_multi(
    df: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """Assign every vector to its ``nprobe`` highest-cosine centroids
    (one output row per (vector, probed cell)). The recall lever for
    IVF search: querying the 2nd/3rd-closest cells recovers neighbors
    that sit just across a cell boundary, at nprobe× the scan cost.
    Same broadcast + window shape as :func:`ivf_assign`."""
    cents = centroids.select(
        F.col(centroid_id), F.col(emb_col).alias("__c_emb"),
        norm(F.col(emb_col)).alias("__c_nrm"),
    )
    scored = (
        df.withColumn("__v_nrm", norm(F.col(emb_col)))
        .join(F.broadcast(cents))
        .withColumn(
            "__sim",
            dot_product(F.col(emb_col), F.col("__c_emb"))
            / (F.col("__v_nrm") * F.col("__c_nrm")),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__sim"), F.asc(centroid_id))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= nprobe)
        .drop("__c_emb", "__c_nrm", "__v_nrm", "__sim", "__rn")
    )


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 1,
) -> DataFrame:
    """IVF approximate top-k: quantize corpus vectors to their nearest
    centroid, then search the query's ``nprobe`` closest cells.
    Same output shape as :func:`knn_bruteforce`; recall < 1 when a true
    neighbor lives outside the probed cells — raise ``nprobe`` to trade
    scan cost for recall. At scale the corpus is pre-partitioned (and
    pre-written bucketed) by centroid_id, so a query touches
    ~nprobe/k_cells of the data."""
    c_assigned = ivf_assign(corpus, centroids, emb_col, id_col)
    q_assigned = ivf_assign_multi(queries, centroids, nprobe, emb_col, id_col)
    q = q_assigned.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        norm(F.col(emb_col)).alias("q_nrm"),
        "centroid_id",
    )
    c = c_assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("c_emb"),
        norm(F.col(emb_col)).alias("c_nrm"),
        "centroid_id",
    )
    scored = (
        c.join(F.broadcast(q), on="centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_product(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_nrm") * F.col("c_nrm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = "srp",
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate top-k: compare only within SRP buckets. Same output
    shape as :func:`knn_bruteforce`; recall < 1 by construction (a
    query's true neighbor may land in another bucket). At 2^n_planes
    buckets the candidate set shrinks ~2^n_planes-fold.

    ``multiprobe=True`` additionally probes every bucket at Hamming
    distance 1 from the query's bucket (each single plane flipped):
    near-dup pairs are missed exactly when they straddle ONE
    hyperplane, so probing the n_planes 1-flip buckets recovers most
    lost recall for (1+n_planes)× the candidate cost. Corpus vectors
    keep one bucket, so each (query, neighbor) candidate appears at
    most once."""
    planes = srp_hyperplanes(n_planes, dim, seed)
    q_bucket = srp_bucket(F.col(emb_col), planes)
    if multiprobe:
        probe = F.explode(
            F.array(
                q_bucket,
                *[
                    q_bucket.bitwiseXOR(F.lit(1 << p).cast("long"))
                    for p in range(n_planes)
                ],
            )
        )
    else:
        probe = q_bucket
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        norm(F.col(emb_col)).alias("q_nrm"),
        probe.alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("c_emb"),
        norm(F.col(emb_col)).alias("c_nrm"),
        srp_bucket(F.col(emb_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_product(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_nrm") * F.col("c_nrm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
