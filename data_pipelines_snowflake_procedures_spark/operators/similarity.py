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

from pyspark import StorageLevel
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
    import numpy as np

    # r10: the full scan runs as one Arrow numpy kernel emitting each
    # batch's margin superset of the per-query top-k on RAW cosines
    # (see _approx_scan_candidates); the exact 6-decimal rounding and
    # the (cosine desc, neighbor_id) window stay in Spark, so the
    # ranked output is identical to the old per-pair JVM fold scan.
    # The query side was broadcast before — collecting it keeps the
    # JVM-computed q_nrm so nothing is re-derived.
    q_rows = [
        (int(r["query_id"]), np.asarray(r["q_emb"], dtype=np.float64),
         float(r["q_nrm"]))
        for r in queries.select(
            F.col(id_col).alias("query_id"),
            F.col(emb_col).alias("q_emb"),
            norm(F.col(emb_col)).alias("q_nrm"),
        ).collect()
    ]

    def score(pdf, qr):
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        X = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
        # norm fold: sequential sum of squares, then sqrt — the exact
        # op sequence of norm()
        acc = np.zeros(len(ids), dtype=np.float64)
        for d in range(X.shape[1]):
            acc += X[:, d] * X[:, d]
        c_nrm = np.sqrt(acc)
        for qid, qe, qn in qr:
            dots = _np_seq_dot(qe[None, :], X)[0]
            with np.errstate(divide="ignore", invalid="ignore"):
                c = dots / (qn * c_nrm)  # plain division, like the old /
            mask = ids != qid
            yield qid, ids[mask], c[mask]

    cand_raw = _approx_scan_candidates(
        score, corpus.select(id_col, emb_col), q_rows, k
    )
    scored = cand_raw.select(
        "query_id",
        "neighbor_id",
        # NaN (zero-norm vector: 0/0 in the kernel) maps back to NULL so
        # it sorts LAST under desc, like the pre-kernel Spark `/` did —
        # raw NaN would sort ABOVE every real double (the knn_pq guard).
        F.when(~F.isnan("c_raw"), F.round("c_raw", 6)).alias("cosine"),
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
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: quantize corpus vectors to their nearest
    centroid, then search the query's ``nprobe`` closest cells.
    Same output shape as :func:`knn_bruteforce`; recall < 1 when a true
    neighbor lives outside the probed cells — raise ``nprobe`` to trade
    scan cost for recall. At scale the corpus is pre-partitioned (and
    pre-written bucketed) by centroid_id, so a query touches
    ~nprobe/k_cells of the data. Pass ``assigned`` (an
    :func:`ivf_assign` frame, ideally persisted) to share the
    query-independent corpus assignment across searches with different
    nprobe — values identical by construction."""
    c_assigned = (
        assigned
        if assigned is not None
        else ivf_assign(corpus, centroids, emb_col, id_col)
    )
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
    corpus_hashed: DataFrame | None = None,
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
    # corpus side is query-independent and identical for the plain and
    # multiprobe variants (multiprobe only widens the QUERY probes):
    # share it via corpus_hashed across searches
    c = (
        corpus_hashed
        if corpus_hashed is not None
        else corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(emb_col).alias("c_emb"),
            norm(F.col(emb_col)).alias("c_nrm"),
            srp_bucket(F.col(emb_col), planes).alias("bucket"),
        )
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


# ---------------------------------------------------------------------------
# K-means clustering (Lloyd) and scalar-quantized ANN
# ---------------------------------------------------------------------------


def _l2sq_to_lit(emb_col: Column, centroid: list[float]) -> Column:
    """Squared L2 distance from an embedding column to a LITERAL
    centroid — a pure narrow expression (stays in codegen, no join, no
    UDF). (x-y)*(x-y) instead of pow() keeps the arithmetic identical
    across engines."""
    arr = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(
            emb_col,
            arr,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans_assign_expr(
    emb_col: Column, centroids: list[list[float]]
) -> tuple[Column, Column]:
    """(cluster, distance) columns for assignment to literal centroids:
    an array of k squared-L2 distances, argmin via
    array_position(array_min) — first index wins ties, i.e. the lowest
    cluster id, matching a (dist, cid)-ordered row_number. Zero
    shuffle: the corpus never moves for an assignment pass.

    The centroids enter the plan as ONE k×dim literal matrix looped by
    ``transform`` — k separately-unrolled fold chains would bloat the
    generated code ~k× and dominate runtime with JIT compilation."""
    matrix = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    dists = F.transform(
        matrix,
        lambda c: F.aggregate(
            F.zip_with(
                emb_col,
                c,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    cluster = (F.array_position(dists, F.array_min(dists)) - 1).cast("long")
    return cluster, F.array_min(dists)


def _matrix_df(spark, matrix: list[list[float]], col: str) -> DataFrame:
    """A k×dim float matrix as a 1-ROW broadcastable table — the plan
    stays tiny where a literal expression tree costs ~1 s of
    driver-side analysis per 512 literals (measured; see
    kmeans_assign_df)."""
    return spark.createDataFrame(
        [([[float(x) for x in c] for c in matrix],)],
        f"{col}: array<array<double>>",
    )


def _sq_dists_to_matrix(emb: Column, matrix_col: str) -> Column:
    """Array of squared-L2 distances from ``emb`` to every row of the
    broadcast matrix column — THE shared assignment kernel (k-means,
    IVF residuals, the IVF-PQ probe): (x−y)·(x−y) folds, identical
    arithmetic everywhere so the tie-break/oracle contract cannot
    diverge between operators."""
    return F.transform(
        F.col(matrix_col),
        lambda c: F.aggregate(
            F.zip_with(
                emb,
                c,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )


#: Centroid count at or above which a RETURNED assignment plan
#: switches to the Arrow-batched numpy kernel. The native zip_with
#: fold costs ~40× more per flop (measured at sf1, k=391: 33 s native
#: vs ~2 s numpy for 100k×391×64) because it allocates a zipped
#: 64-element array per (point, centroid). Since r10 the numpy kernel
#: accumulates distances per dimension in index order and is therefore
#: BIT-IDENTICAL to the native fold (same values, same tie-breaks), so
#: this constant is purely a plan-shape choice: below it, entry plans
#: keep their JVM-native expression form (stable plan budgets, no
#: Python node); at or above it, the Arrow kernel wins on throughput.
#: Model FITS (kmeans_fit / pq_fit iterations) always use the numpy
#: kernel — their assignment never appears in a returned plan, and the
#: collected means are identical because the codes are.
NUMPY_ASSIGN_MIN_K = 32


def _kmeans_assign_numpy(
    df: DataFrame,
    centroids: list[list[float]],
    emb_col: str,
    cluster_col: str,
    dist_col: str,
) -> DataFrame:
    """Arrow-batched vectorized assignment, argmin ties to the lowest
    centroid id (numpy argmin takes the first minimum — the same
    tie-break as the native kernel). Since r10 the distances accumulate
    per dimension in index order, making the kernel bit-identical to
    the native fold (see the inline comment)."""
    import numpy as np
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    mat = [[float(x) for x in c] for c in centroids]
    schema = StructType(
        list(df.schema.fields)
        + [
            StructField(cluster_col, LongType()),
            StructField(dist_col, DoubleType()),
        ]
    )

    def assign(batches):
        C = np.asarray(mat, dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                pdf[cluster_col] = np.array([], dtype="int64")
                pdf[dist_col] = np.array([], dtype="float64")
                yield pdf
                continue
            X = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
            # Per-dimension index-order accumulation from 0.0 — the
            # exact IEEE op sequence of the native zip_with fold, so
            # since r10 this kernel is BIT-IDENTICAL to the JVM
            # assignment (not merely ulp-close as the earlier
            # |x|²−2xCᵀ+|C|² matmul form was): same distances, same
            # first-minimum tie-break, same __dist values.
            d2 = np.zeros((len(X), C.shape[0]), dtype=np.float64)
            for d in range(X.shape[1]):
                diff = X[:, d][:, None] - C[None, :, d]
                d2 += diff * diff
            cl = d2.argmin(axis=1)
            out = pdf.copy()
            out[cluster_col] = cl.astype("int64")
            out[dist_col] = d2[np.arange(len(cl)), cl]
            yield out

    return df.mapInPandas(assign, schema)


def kmeans_assign_df(
    df: DataFrame,
    centroids: list[list[float]],
    emb_col: str = "embedding",
    cluster_col: str = "__cl",
    dist_col: str = "__dist",
) -> DataFrame:
    """All of ``df`` plus (cluster, dist) columns, with the centroid
    matrix riding in as a 1-ROW broadcast table instead of a literal
    expression tree: same zero-shuffle assignment (a broadcast of k×dim
    doubles is metadata), but the PLAN stays tiny — a 512-literal
    expression costs ~1 s of driver-side analysis per job, which
    dominates every Lloyd iteration at benchmark scale.

    Above :data:`NUMPY_ASSIGN_MIN_K` centroids the assignment runs as
    an Arrow-batched numpy matmul instead (the FAISS/BLAS route) — see
    the constant's docstring for the oracle-parity argument."""
    if len(centroids) >= NUMPY_ASSIGN_MIN_K:
        return _kmeans_assign_numpy(
            df, centroids, emb_col, cluster_col, dist_col
        )
    mat = _matrix_df(df.sparkSession, centroids, "__km_matrix")
    dists = _sq_dists_to_matrix(F.col(emb_col), "__km_matrix")
    return (
        df.crossJoin(F.broadcast(mat))
        .withColumn(
            cluster_col,
            (F.array_position(dists, F.array_min(dists)) - 1).cast("long"),
        )
        .withColumn(dist_col, F.array_min(dists))
        .drop("__km_matrix")
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 6,
) -> list[list[float]]:
    """Fit Lloyd's k-means and return the final centroids as plain
    Python lists (k×dim — driver-metadata-sized). See
    :func:`kmeans_lloyd` for the plan-shape and determinism contract;
    use the centroids with :func:`kmeans_assign_expr` for shuffle-free
    downstream assignment (clustering, SemDeDup blocking, IVF cells).
    """
    # Iterative algorithm: every Lloyd pass re-reads the corpus, so pin
    # the (id, embedding) projection across iterations — the same
    # handlePersistence MLlib's KMeans applies. MEMORY_AND_DISK: spills
    # instead of recomputing from source at 100 TB.
    base = df.select(id_col, emb_col).persist(StorageLevel.MEMORY_AND_DISK)
    # k lowest-id vectors seed the centroids (NOT "id < k": ids need not
    # be contiguous — e.g. corpora with planted/offset id spaces).
    seed_rows = base.orderBy(id_col).limit(k).select(emb_col).collect()
    cents = [[float(x) for x in r[emb_col]] for r in seed_rows]
    for _ in range(iters):
        # fit iterations always assign via the Arrow numpy kernel
        # (r10): it is bit-identical to the native fold since the
        # per-dimension rewrite, never appears in a returned plan
        # (the fit ends in a driver collect), and removes the
        # dominant per-(point,centroid) JVM lambda cost at scale
        means = (
            _kmeans_assign_numpy(base, cents, emb_col, "__cl", "__dist")
            .select("__cl", F.posexplode(F.col(emb_col)))
            .groupBy("__cl", "pos")
            .agg(F.round(F.avg(F.col("col").cast("double")), round_decimals).alias("m"))
            .collect()
        )
        new_cents = [list(c) for c in cents]  # empty clusters keep previous
        by_cl: dict[int, dict[int, float]] = {}
        for r in means:
            by_cl.setdefault(r["__cl"], {})[r["pos"]] = r["m"]
        for cl, dims in by_cl.items():
            new_cents[cl] = [dims[i] for i in range(len(cents[cl]))]
        cents = new_cents
    base.unpersist()
    return cents


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 6,
) -> DataFrame:
    """Lloyd's k-means over an embedding column, Spark-first: centroids
    live on the DRIVER as k×dim literals (metadata-sized, like a
    broadcast hash table), so every assignment pass is a narrow
    codegen'd expression over the corpus — no shuffle, no UDF. Each of
    the ``iters`` update steps costs ONE shuffle: posexplode to
    (cluster, dim, value) and groupBy-avg, collecting k×dim rounded
    means back to the driver. Total: iters shuffles + iters tiny
    collects, independent of corpus size — the same job structure
    MLlib's KMeans uses (treeAggregate of partial sums), expressed in
    DataFrame ops.

    Determinism (oracle-matchable): seeds are the k lowest-id vectors;
    per-dimension means round to ``round_decimals`` so accumulation
    order can't leak into the next iteration; ties in argmin break to
    the lowest cluster id. Empty clusters keep their previous centroid.

    Returns (id, cluster, dist) under the FINAL centroids; ``dist`` is
    squared L2, rounded.
    """
    cents = kmeans_fit(df, k, iters, emb_col, id_col, round_decimals)
    return kmeans_assign_df(df, cents, emb_col).select(
        F.col(id_col),
        F.col("__cl").alias("cluster"),
        F.round(F.col("__dist"), 6).alias("dist"),
    )


def sq_bounds(
    df: DataFrame, emb_col: str = "embedding"
) -> list[tuple[float, float]]:
    """Per-dimension (min, max) over the corpus — the scalar-quantizer
    codebook. One posexplode + groupBy(pos) min/max (exact,
    order-independent), collected to the driver (dim rows)."""
    rows = (
        df.select(F.posexplode(F.col(emb_col)))
        .groupBy("pos")
        .agg(
            F.min(F.col("col").cast("double")).alias("lo"),
            F.max(F.col("col").cast("double")).alias("hi"),
        )
        .orderBy("pos")
        .collect()
    )
    return [(r["lo"], r["hi"]) for r in rows]


def sq_dequantized_expr(
    emb_col: Column, bounds: list[tuple[float, float]], levels: int = 256
) -> Column:
    """Quantize-then-dequantize an embedding against literal per-dim
    bounds: code = round((x-lo)/(hi-lo)*(levels-1)) clamped to
    [0, levels-1], reconstructed as lo + code*(hi-lo)/(levels-1).
    int8-per-dimension storage (levels=256) is the point at 100 TB:
    a 64-dim float32 corpus shrinks 4× and the ANN scan becomes
    memory-bandwidth-bound on codes, not floats. Narrow expression —
    quantization never shuffles."""
    los = F.array(*[F.lit(float(lo)) for lo, _ in bounds])
    his = F.array(*[F.lit(float(hi)) for _, hi in bounds])
    n = F.lit(float(levels - 1))
    scaled = F.zip_with(
        emb_col,
        F.zip_with(los, his, lambda lo, hi: F.struct(lo.alias("lo"), hi.alias("hi"))),
        lambda x, b: F.round(
            (x.cast("double") - b["lo"])
            / F.when(b["hi"] > b["lo"], b["hi"] - b["lo"]).otherwise(F.lit(1.0))
            * n,
            0,
        ),
    )
    code = F.transform(
        scaled, lambda s: F.least(F.greatest(s, F.lit(0.0)), n)
    )
    return F.zip_with(
        code,
        F.zip_with(los, his, lambda lo, hi: F.struct(lo.alias("lo"), hi.alias("hi"))),
        lambda c, b: b["lo"]
        + c
        * (
            F.when(b["hi"] > b["lo"], b["hi"] - b["lo"]).otherwise(F.lit(1.0))
        )
        / n,
    )


def _candidates_exact_rerank(
    cand: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    emb_col: str,
    id_col: str,
) -> DataFrame:
    """Exact-cosine re-rank of an approximate candidate set — the
    candidates-only fetch half of every quantized ANN rung (VERDICT r5
    wrong-list #2): ``cand`` carries ONLY (query_id, neighbor_id), and
    the true embeddings enter here, after candidate selection, via a
    join back to the corpus on neighbor_id. ``cand`` is bounded by
    |queries|·rerank·k rows, so it broadcasts and the corpus side of
    the join never shuffles; the queries (already broadcast-small in
    every caller) ride in the same way. The approximate scan therefore
    reads codes only — m bytes (PQ) or dequantized int8 (SQ) per
    vector — and exact floats are read once per CANDIDATE, not per
    scanned vector."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("qx_emb"),
        norm(F.col(emb_col)).alias("qx_nrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("cx_emb"),
        norm(F.col(emb_col)).alias("cx_nrm"),
    )
    exact = (
        c.join(F.broadcast(cand.select("query_id", "neighbor_id")), "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            # zero-norm guard (r11, with the scan-stage guards): IEEE
            # 0/0 is NaN and Spark sorts NaN above every real double
            # under desc; NULL sorts last — the consistent "worst
            # match" placement across all four scans.
            F.when(
                (F.col("qx_nrm") * F.col("cx_nrm")) > 0,
                F.round(
                    dot_product(F.col("qx_emb"), F.col("cx_emb"))
                    / (F.col("qx_nrm") * F.col("cx_nrm")),
                    6,
                ),
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return exact.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def knn_sq(
    corpus: DataFrame,
    queries: DataFrame,
    bounds: list[tuple[float, float]],
    k: int = 5,
    rerank: int = 3,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Scalar-quantized ANN with exact re-ranking (the SQ analogue of a
    FAISS SQ8 index): score every (query, corpus) pair on DEQUANTIZED
    corpus vectors (asymmetric distance — queries stay exact), keep the
    top ``rerank``·k candidates per query, then re-rank only those on
    the exact float cosine. Recall loss happens only when quantization
    error reorders a true top-k neighbor past position rerank·k.

    Same broadcast-query / narrow-scan shape as knn_bruteforce. The
    approximate stage projects (query_id, neighbor_id, approx_cosine)
    ONLY — no exact embedding rides through the scan or the candidate
    window — and :func:`_candidates_exact_rerank` joins the top
    rerank·k ids back to the corpus for the float pass, so the first
    pass really is codes-bound I/O and exact embeddings are fetched
    only for candidates."""
    import numpy as np

    # r10: the dequantize+scan runs as one Arrow numpy kernel (margin
    # superset of the per-query top rerank*k on raw cosines; exact
    # round+window stay in Spark — see _approx_scan_candidates). The
    # dequantization replicates sq_dequantized_expr op for op:
    # scaled = round((x-lo)/span*(levels-1)) with Spark's HALF_UP
    # (x >= lo always, so the positive-value floor+frac rule is exact),
    # clamped, then deq = lo + (code*span)/(levels-1); norm and dot
    # accumulate per dimension in index order.
    q_rows = [
        (int(r["query_id"]), np.asarray(r["q_emb"], dtype=np.float64),
         float(r["q_nrm"]))
        for r in queries.select(
            F.col(id_col).alias("query_id"),
            F.col(emb_col).alias("q_emb"),
            norm(F.col(emb_col)).alias("q_nrm"),
        ).collect()
    ]
    lo = np.asarray([b[0] for b in bounds], dtype=np.float64)
    hi = np.asarray([b[1] for b in bounds], dtype=np.float64)
    span = np.where(hi > lo, hi - lo, 1.0)
    n_levels = float(256 - 1)

    def score(pdf, qr):
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        X = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
        v = (X - lo[None, :]) / span[None, :] * n_levels
        ip = np.floor(v)
        code = ip + (v - ip >= 0.5)  # Spark round(double, 0) HALF_UP
        code = np.minimum(np.maximum(code, 0.0), n_levels)
        C = lo[None, :] + (code * span[None, :]) / n_levels
        acc = np.zeros(len(ids), dtype=np.float64)
        for d in range(C.shape[1]):
            acc += C[:, d] * C[:, d]
        c_nrm = np.sqrt(acc)
        for qid, qe, qn in qr:
            dots = _np_seq_dot(qe[None, :], C)[0]
            with np.errstate(divide="ignore", invalid="ignore"):
                c = dots / (qn * c_nrm)
            mask = ids != qid
            yield qid, ids[mask], c[mask]

    cand_raw = _approx_scan_candidates(
        score, corpus.select(id_col, emb_col), q_rows, rerank * k
    )
    approx = cand_raw.select(
        "query_id",
        "neighbor_id",
        # NaN→NULL so zero-norm vectors sort last under desc (knn_pq's
        # guard; plain NaN sorts above every real double in Spark).
        F.when(~F.isnan("c_raw"), F.round("c_raw", 6)).alias("approx_cosine"),
    )
    w_a = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cosine"), F.asc("neighbor_id")
    )
    cand = approx.withColumn("__arn", F.row_number().over(w_a)).filter(
        F.col("__arn") <= rerank * k
    )
    return _candidates_exact_rerank(cand, corpus, queries, k, emb_col, id_col)


# ---------------------------------------------------------------------------
# Product quantization (PQ): the FAISS-style ANN memory ladder's last
# rung — where SQ8 stores one byte per DIMENSION, PQ stores one code
# per SUBSPACE (dim/m dims each), compressing 64 floats to m bytes.
# Each subspace gets its own k-means codebook; distance is asymmetric
# (exact query vs codebook-reconstructed corpus).
# ---------------------------------------------------------------------------


def _books_matrix_df(spark, books: list[list[list[float]]], col: str) -> DataFrame:
    """All m codebooks as ONE 1-row broadcastable table (m × k × sub
    doubles) — the pq analogue of :func:`_matrix_df`."""
    return spark.createDataFrame(
        [([[[float(x) for x in c] for c in b] for b in books],)],
        f"{col}: array<array<array<double>>>",
    )


def _pq_assign_all(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    sub_exprs: "list[Column]",
    code_prefix: str = "code_",
) -> DataFrame:
    """Every subspace's argmin code in ONE projection over ONE
    broadcast books matrix — the JVM-NATIVE REFERENCE SPEC of the PQ
    encode (the ``poisson_weights`` spec-vs-hot-path convention): the
    hot paths (:func:`pq_encode`, the :func:`pq_fit` iterations) run
    :func:`_pq_assign_all_numpy`, asserted code-identical to this
    form in tests/test_llm_ops.py. ``sub_exprs[j]`` is the j-th
    subvector column (a pre-sliced column or a slice expression).
    Distances are the ordered ``aggregate(zip_with(sub, c))`` fold
    per book entry, argmin ties to the lowest code via
    array_position(array_min)."""
    mat = _books_matrix_df(df.sparkSession, codebooks, "__pq_books")
    out = df.crossJoin(F.broadcast(mat))

    def _dist_fn(s):
        # closure, not a default arg: F.transform treats a 2-arg
        # lambda as (element, index)
        return lambda c: F.aggregate(
            F.zip_with(
                s,
                c,
                lambda x, y: (x.cast("double") - y)
                * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    code_cols = []
    for j in range(len(codebooks)):
        dists = F.transform(
            F.element_at(F.col("__pq_books"), j + 1),
            _dist_fn(sub_exprs[j]),
        )
        code_cols.append(
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("long")
            .alias(f"{code_prefix}{j}")
        )
    return out.select(*df.columns, *code_cols)


def _pq_assign_all_numpy(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    sub_cols: list[str],
    code_prefix: str = "code_",
) -> DataFrame:
    """Every subspace's argmin code in one Arrow pass — the numpy twin
    of :func:`_pq_assign_all` for fit-internal use: per-dimension
    index-order distance accumulation (the native fold's exact IEEE op
    sequence) and numpy's first-minimum argmin (the lowest-code
    tie-break), so codes are bit-identical to the JVM projection."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    books = [
        np.asarray([[float(x) for x in c] for c in b], dtype=np.float64)
        for b in codebooks
    ]
    schema = StructType(
        list(df.schema.fields)
        + [StructField(f"{code_prefix}{j}", LongType()) for j in range(len(books))]
    )

    def assign(batches):
        for pdf in batches:
            out = pdf.copy()
            for j, B in enumerate(books):
                if len(pdf) == 0:
                    out[f"{code_prefix}{j}"] = np.array([], dtype="int64")
                    continue
                X = np.stack(pdf[sub_cols[j]].to_numpy()).astype(np.float64)
                d2 = np.zeros((len(X), B.shape[0]), dtype=np.float64)
                for d in range(X.shape[1]):
                    diff = X[:, d][:, None] - B[None, :, d]
                    d2 += diff * diff
                out[f"{code_prefix}{j}"] = d2.argmin(axis=1).astype("int64")
            yield out

    return df.mapInPandas(assign, schema)


def pq_fit(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    dim: int = 64,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Train one k-means codebook per subspace, ALL subspaces per job:
    the ``m`` Lloyd fits share each pass — every subvector is assigned
    against its own current book (m chained zero-shuffle broadcast
    assignments), then ONE stacked (subspace, cluster, dim) groupBy-avg
    computes every subspace's new centroids together. Same math as m
    independent :func:`kmeans_fit` runs — identical lowest-id seeds
    (the k lowest-id rows seed all m books at once), identical
    per-group 6-decimal mean rounding, identical lowest-cluster
    tie-break — but 1 seed collect + ``iters`` jobs total instead of
    m×(1+iters): at production PQ sizes (m=16) the sequential form
    spends its wall-clock on 48 job launches, not on data. Returns
    ``m × k × (dim/m)`` floats — driver-metadata-sized."""
    sub = dim // m
    slices = [
        F.slice(F.col(emb_col), j * sub + 1, sub).alias(f"__s{j}")
        for j in range(m)
    ]
    base = df.select(id_col, *slices).persist(StorageLevel.MEMORY_AND_DISK)
    # k lowest-id rows carry every subspace's seed slice — one collect.
    seed_rows = base.orderBy(id_col).limit(k).collect()
    books = [
        [[float(x) for x in r[f"__s{j}"]] for r in seed_rows]
        for j in range(m)
    ]
    for _ in range(iters):
        # fit iterations assign every subspace in ONE Arrow numpy pass
        # (r10): bit-identical to the native fold (per-dimension
        # index-order accumulation, first-min ties), plan-invisible
        # (the fit ends in a driver collect)
        assigned = _pq_assign_all_numpy(
            base, books, [f"__s{j}" for j in range(m)], code_prefix="__cl"
        )
        stacked = assigned.select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.col(f"__cl{j}").alias("cl"),
                        F.col(f"__s{j}").alias("e"),
                    )
                    for j in range(m)
                ])
            ).alias("s")
        ).select(F.col("s.j").alias("j"), F.col("s.cl").alias("cl"),
                 F.posexplode(F.col("s.e")))
        means = (
            stacked.groupBy("j", "cl", "pos")
            .agg(F.round(F.avg(F.col("col").cast("double")), 6).alias("m"))
            .collect()
        )
        new_books = [[list(c) for c in b] for b in books]  # empty keep previous
        by_key: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            by_key.setdefault((r["j"], r["cl"]), {})[r["pos"]] = r["m"]
        for (j, cl), dims in by_key.items():
            new_books[j][cl] = [dims[i] for i in range(sub)]
        books = new_books
    base.unpersist()
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    emb_col: str = "embedding",
) -> DataFrame:
    """Append ``code_0..code_{m-1}``: per subspace, the argmin-distance
    codebook entry — ONE zero-shuffle projection over ONE broadcast
    books matrix (r10; previously m chained assignment passes, each
    with its own 1-row matrix crossJoin — m× the plan-analysis cost).
    The broadcast form keeps the plan tiny at any (m, k) (VERDICT r4
    wrong-list #3). Codes are bit-identical to both earlier forms —
    same fold, same argmin, same lowest-cluster tie-break."""
    sub = len(codebooks[0][0])
    m = len(codebooks)
    # ONE Arrow numpy pass for all m subspaces (optimization r10 —
    # was m chained kmeans_assign_df crossJoins, then one JVM
    # projection; the numpy kernel is bit-identical to both — same
    # per-dimension fold order, same first-min tie-break — and removes
    # the per-(point,codeword) JVM lambda cost at scale: the encode of
    # a 100k-vector corpus was ~8 s of fold time at sf1)
    slices = [
        F.slice(F.col(emb_col), j * sub + 1, sub).alias(f"__pqs{j}")
        for j in range(m)
    ]
    tmp = df.select("*", *slices)
    out = _pq_assign_all_numpy(
        tmp, codebooks, [f"__pqs{j}" for j in range(m)]
    )
    return out.drop(*[f"__pqs{j}" for j in range(m)])


def pq_reconstruct_expr(codebooks: list[list[list[float]]]) -> Column:
    """Decoded vector from the ``code_j`` columns: concat of each
    subspace's selected centroid — codebooks ride as literal matrices,
    so decode is a pure expression over m small ints."""
    parts = []
    for j, book in enumerate(codebooks):
        matrix = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in book])
        parts.append(F.element_at(matrix, (F.col(f"code_{j}") + 1).cast("int")))
    return F.concat(*parts)


#: Margin used by the vectorized approximate-scan kernels when
#: pre-pruning candidates on RAW cosine before Spark applies the exact
#: 6-decimal rounding: two reals more than 1e-6 apart cannot round to
#: the same 6-decimal value, so rows more than 2e-6 below a batch's
#: rerank_k-th best raw score are strictly below it after rounding and
#: can never enter the top-rerank_k set under any tie-break.
_SCAN_PRUNE_MARGIN = 2e-6


def _approx_scan_candidates(
    scored_batches_fn,
    corpus_side: DataFrame,
    q_rows: list,
    rerank_k: int,
):
    """Shared mapInPandas wrapper for the PQ/IVF-PQ approximate scans
    (optimization r10): ``scored_batches_fn(pdf, q_rows)`` returns,
    per batch, an iterable of (query_id, ids_array, c_raw_array) with
    RAW cosines whose arithmetic is bit-identical to the old JVM fold
    (per-dimension index-order accumulation, multiply-then-divide).
    Each batch emits only the margin superset of its per-query top
    ``rerank_k`` (see :data:`_SCAN_PRUNE_MARGIN`) plus every
    NaN-scored row (zero denominator — the old ``try_divide`` NULLs,
    which sort after all real scores and matter only when a query has
    fewer than rerank_k real candidates); the caller applies the exact
    ``round(c,6)`` ordering in Spark, so the selected candidate SET is
    identical to the old full-scan window.

    Id contract (ADVICE r10): the emitted schema is ``query_id LONG,
    neighbor_id LONG`` and callers coerce ids via int()/np.int64 — the
    public knn_* scans therefore require an integer-typed ``id_col``
    (the harness embeddings' vec_id is int64). A string-id corpus must
    map ids to longs before the scan (or use knn_lsh/knn_ivf, which
    keep the join form)."""
    import numpy as np
    import pandas as pd

    def scan(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_q: list = []
            out_i: list = []
            out_c: list = []
            for qid, ids, c in scored_batches_fn(pdf, q_rows):
                n = len(ids)
                if n == 0:
                    continue
                real = ~np.isnan(c)
                nr = int(real.sum())
                if nr > rerank_k:
                    creal = c[real]
                    kth = np.partition(creal, nr - rerank_k)[nr - rerank_k]
                    keep = (c >= kth - _SCAN_PRUNE_MARGIN) | ~real
                else:
                    keep = np.ones(n, dtype=bool)
                out_q.append(np.full(int(keep.sum()), qid, dtype=np.int64))
                out_i.append(ids[keep])
                out_c.append(c[keep])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_i),
                        "c_raw": np.concatenate(out_c),
                    }
                )

    return corpus_side.mapInPandas(
        scan, schema="query_id LONG, neighbor_id LONG, c_raw DOUBLE"
    )


def _np_seq_sq_dists(Xsub, book):
    """Squared distances of every row of ``Xsub`` (n×sub float64) to
    every book entry, accumulated per dimension in index order from
    0.0 — the exact IEEE op sequence of the JVM
    ``aggregate(zip_with(...))`` fold."""
    import numpy as np

    B = np.asarray(book, dtype=np.float64)
    acc = np.zeros((Xsub.shape[0], B.shape[0]), dtype=np.float64)
    for d in range(Xsub.shape[1]):
        diff = Xsub[:, d][:, None] - B[None, :, d]
        acc += diff * diff
    return acc


def _np_seq_dot(Q, C):
    """Q (q×dim) · C (n×dim) accumulated per dimension in index order
    from 0.0 (the JVM dot_product fold's op sequence); returns q×n."""
    import numpy as np

    acc = np.zeros((Q.shape[0], C.shape[0]), dtype=np.float64)
    for d in range(Q.shape[1]):
        acc += Q[:, d][:, None] * C[None, :, d]
    return acc


def knn_pq(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    rerank: int = 3,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ ANN with exact re-ranking — the same two-phase shape as
    :func:`knn_sq`, with the approximate phase scoring the exact query
    against the PQ-RECONSTRUCTED corpus vector (asymmetric distance).
    Recall loss occurs only when quantization error pushes a true
    top-k neighbor past position rerank·k. The approximate stage
    projects (query_id, neighbor_id, approx_cosine) only, so at 100 TB
    the first pass reads m bytes per vector (vs 4·dim for floats);
    exact embeddings enter via :func:`_candidates_exact_rerank`'s
    join-back, touched once per candidate."""
    import numpy as np

    # The query side is broadcast-small by this operator's existing
    # contract (the old plan broadcast it); collecting it keeps the
    # JVM-computed q_nrm values so nothing is re-derived.
    q_rows = [
        (int(r["query_id"]), np.asarray(r["q_emb"], dtype=np.float64),
         float(r["q_nrm"]))
        for r in queries.select(
            F.col(id_col).alias("query_id"),
            F.col(emb_col).alias("q_emb"),
            norm(F.col(emb_col)).alias("q_nrm"),
        ).collect()
    ]
    books = [
        np.asarray([[float(x) for x in c] for c in b], dtype=np.float64)
        for b in codebooks
    ]
    sub = books[0].shape[1]

    def score(pdf, qr):
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        X = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
        # encode + reconstruct (bit-identical to _pq_assign_all +
        # pq_reconstruct_expr: same ordered fold, argmin first-min)
        C = np.empty_like(X)
        for j, B in enumerate(books):
            d2 = _np_seq_sq_dists(X[:, j * sub:(j + 1) * sub], B)
            C[:, j * sub:(j + 1) * sub] = B[d2.argmin(axis=1)]
        # norm fold: sequential sum of squares, then sqrt
        acc = np.zeros(len(ids), dtype=np.float64)
        for d in range(C.shape[1]):
            acc += C[:, d] * C[:, d]
        c_nrm = np.sqrt(acc)
        for qid, qe, qn in qr:
            dots = _np_seq_dot(qe[None, :], C)[0]
            denom = qn * c_nrm
            with np.errstate(divide="ignore", invalid="ignore"):
                c = np.where(denom == 0.0, np.nan, dots / denom)
            mask = ids != qid
            yield qid, ids[mask], c[mask]

    cand_raw = _approx_scan_candidates(
        score, corpus.select(id_col, emb_col), q_rows, rerank * k
    )
    approx = cand_raw.select(
        "query_id",
        "neighbor_id",
        # NaN (zero denominator) maps back to the old try_divide NULL
        # so desc ordering still puts it after every real score
        F.when(~F.isnan("c_raw"), F.round("c_raw", 6)).alias("approx_cosine"),
    )
    w_a = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cosine"), F.asc("neighbor_id")
    )
    cand = approx.withColumn("__arn", F.row_number().over(w_a)).filter(
        F.col("__arn") <= rerank * k
    )
    return _candidates_exact_rerank(cand, corpus, queries, k, emb_col, id_col)


# ---------------------------------------------------------------------------
# IVF-PQ: the composed production ANN shape (FAISS IndexIVFPQ) — a
# coarse k-means quantizer restricts each query to nprobe cells, and
# within cells the corpus is PQ-coded on RESIDUALS (x − cell centroid),
# which quantize tighter than raw vectors because each cell's residual
# cloud is centered. Scan cost per query: nprobe/k_coarse of the corpus
# at m bytes per vector, + exact fetches for rerank candidates only.
# ---------------------------------------------------------------------------


def ivf_residuals(
    df: DataFrame,
    centroids: list[list[float]],
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "cell",
    res_col: str = "remb",
) -> DataFrame:
    """Append (cell, residual) to every vector: nearest-coarse-centroid
    assignment (broadcast 1-row matrix, zero shuffle, lowest-cell
    tie-break) and ``remb = emb − centroid[cell]`` as a double array —
    the input both to residual-codebook training (:func:`pq_fit` with
    ``emb_col=res_col``) and to :func:`knn_ivfpq`'s encode pass.

    r10: one Arrow numpy pass — the cell argmin is bit-identical to
    the old broadcast-matrix JVM fold (per-dimension index-order
    accumulation, first-minimum tie-break), and the residual is a
    per-element subtraction (no accumulation, exact either way). The
    JVM form cost ~4 s of fold time per 100k vectors at sf1."""
    import numpy as np
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType,
    )

    C = [[float(x) for x in c] for c in centroids]
    schema = StructType(
        list(df.schema.fields)
        + [
            StructField(cell_col, LongType()),
            StructField(res_col, ArrayType(DoubleType())),
        ]
    )

    def assign(batches):
        Cm = np.asarray(C, dtype=np.float64)
        for pdf in batches:
            out = pdf.copy()
            if len(pdf) == 0:
                out[cell_col] = np.array([], dtype="int64")
                out[res_col] = []
                yield out
                continue
            X = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
            d2 = np.zeros((len(X), Cm.shape[0]), dtype=np.float64)
            for d in range(X.shape[1]):
                diff = X[:, d][:, None] - Cm[None, :, d]
                d2 += diff * diff
            cl = d2.argmin(axis=1)
            R = X - Cm[cl]
            out[cell_col] = cl.astype("int64")
            out[res_col] = list(R)
            yield out

    return df.mapInPandas(assign, schema)


def ivfpq_index(
    corpus: DataFrame,
    coarse: list[list[float]],
    codebooks: list[list[list[float]]],
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    residuals: DataFrame | None = None,
) -> DataFrame:
    """The searchable IVF-PQ corpus index: one row per vector with its
    coarse cell, the reconstructed (centroid + dequantized residual)
    vector, and its norm — everything the approximate-scan phase needs
    and nothing query-dependent. Build once (and persist) per
    (corpus, coarse, codebooks); every :func:`knn_ivfpq` call with a
    different nprobe/k/rerank then reuses it, exactly how a FAISS-style
    index amortizes encode cost across queries. The coarse matrix
    rides in as a 1-row broadcast — a literal k_coarse x dim tree
    would re-create the plan-analysis cost kmeans_assign_df
    documents."""
    spark = corpus.sparkSession
    res = (
        residuals
        if residuals is not None
        else ivf_residuals(corpus, coarse, emb_col, id_col)
    )
    enc = pq_encode(res, codebooks, emb_col="remb")
    deq_res = pq_reconstruct_expr(codebooks)
    rmat = _matrix_df(spark, coarse, "__ivf_rmat")
    recon = F.zip_with(
        F.element_at(F.col("__ivf_rmat"), (F.col("cell") + 1).cast("int")),
        deq_res,
        lambda a, b: a + b,
    )
    return (
        enc.crossJoin(F.broadcast(rmat))
        .select(
            F.col(id_col).alias("neighbor_id"),
            "cell",
            recon.alias("c_recon"),
        )
        .withColumn(
            "c_recon_nrm",
            F.sqrt(
                F.aggregate(
                    F.col("c_recon"), F.lit(0.0), lambda acc, v: acc + v * v
                )
            ),
        )
    )


def knn_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    coarse: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 5,
    nprobe: int = 2,
    rerank: int = 3,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    residuals: DataFrame | None = None,
    index: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ ANN with exact re-ranking. Three phases, all
    hash-deterministic (6-decimal rounding, lowest-id tie-breaks):

    1. **Probe**: each query ranks the coarse centroids by L2 and keeps
       its ``nprobe`` nearest cells (k_coarse-row broadcast work).
    2. **Approximate scan**: corpus vectors in probed cells only —
       the join key IS the cell id, so the scan reads nprobe/k_coarse
       of the corpus — scored as cosine(query, centroid[cell] +
       PQ-reconstructed residual): asymmetric distance against the
       16×-compressed representation.
    3. **Exact re-rank**: top rerank·k candidates per query re-scored
       on true embeddings; output (query_id, neighbor_id, cosine,
       rank ≤ k).

    Recall loss has exactly two sources, both bounded and measurable
    (:func:`knn_recall_report` pattern): a true neighbor living in an
    unprobed cell, or residual quantization error pushing it past
    position rerank·k. At 100 TB the inverted-file layout makes phase
    2 a partition-pruned scan (cells are the partition key) of m bytes
    per vector; phase 3 fetches exact embeddings for candidates only.

    Pass ``residuals`` (an :func:`ivf_residuals` frame over the same
    corpus/centroids) to reuse the assignment pass that codebook
    training already ran — otherwise it is recomputed here. Pass
    ``index`` (an :func:`ivfpq_index` frame, ideally persisted) to
    skip the corpus encode+reconstruct entirely — the
    build-once/search-many layout every production IVF-PQ deployment
    uses; values are identical by construction.
    """
    spark = corpus.sparkSession
    # query-side probe: rank cells per query over the broadcast coarse
    # matrix (the shared assignment kernel — never a literal tree)
    qmat = _matrix_df(spark, coarse, "__ivf_matrix")
    qd = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(emb_col).alias("q_emb"),
            norm(F.col(emb_col)).alias("q_nrm"),
        )
        .crossJoin(F.broadcast(qmat))
        .select(
            "query_id",
            "q_emb",
            "q_nrm",
            F.posexplode(
                _sq_dists_to_matrix(F.col("q_emb"), "__ivf_matrix")
            ).alias("cell", "cdist"),
        )
    )
    w_p = Window.partitionBy("query_id").orderBy(F.asc("cdist"), F.asc("cell"))
    probes = (
        qd.withColumn("__prn", F.row_number().over(w_p))
        .filter(F.col("__prn") <= nprobe)
        .select("query_id", "q_emb", "q_nrm", F.col("cell").cast("long").alias("cell"))
    )
    # corpus side: residual-encode, reconstruct cell centroid + residual
    # — shared across searches via a prebuilt ``index`` when provided
    c = (
        index
        if index is not None
        else ivfpq_index(
            corpus, coarse, codebooks, emb_col, id_col, residuals=residuals
        )
    )
    import numpy as np

    # Probe rows are |queries| x nprobe — broadcast-small by the
    # operator's contract (the old plan broadcast them); collecting
    # keeps the JVM-computed q_nrm, so nothing is re-derived.
    probe_rows = probes.collect()
    by_q: dict = {}
    for r in probe_rows:
        qid = int(r["query_id"])
        if qid not in by_q:
            by_q[qid] = (
                np.asarray(r["q_emb"], dtype=np.float64),
                float(r["q_nrm"]),
                set(),
            )
        by_q[qid][2].add(int(r["cell"]))
    q_list = [(qid, qe, qn, cells) for qid, (qe, qn, cells) in by_q.items()]

    def score(pdf, qr):
        ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
        cells = pdf["cell"].to_numpy(dtype=np.int64)
        C = np.stack(pdf["c_recon"].to_numpy()).astype(np.float64)
        c_nrm = pdf["c_recon_nrm"].to_numpy(dtype=np.float64)
        for qid, qe, qn, qcells in qr:
            mask = np.isin(cells, list(qcells)) & (ids != qid)
            if not mask.any():
                continue
            Cm = C[mask]
            dots = _np_seq_dot(qe[None, :], Cm)[0]
            denom = qn * c_nrm[mask]
            with np.errstate(divide="ignore", invalid="ignore"):
                cs = np.where(denom == 0.0, np.nan, dots / denom)
            yield qid, ids[mask], cs

    cand_raw = _approx_scan_candidates(
        score,
        c.select("neighbor_id", "cell", "c_recon", "c_recon_nrm"),
        q_list,
        rerank * k,
    )
    approx = cand_raw.select(
        "query_id",
        "neighbor_id",
        F.when(~F.isnan("c_raw"), F.round("c_raw", 6)).alias("approx_cosine"),
    )
    w_a = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cosine"), F.asc("neighbor_id")
    )
    cand = approx.withColumn("__arn", F.row_number().over(w_a)).filter(
        F.col("__arn") <= rerank * k
    )
    return _candidates_exact_rerank(cand, corpus, queries, k, emb_col, id_col)


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_candidates: int = 20,
    lam: float = 0.7,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) of each query's top-``n_candidates`` exact-cosine results:
    greedily pick ``k`` items maximizing

        ``lam * rel(q, c)  -  (1 - lam) * max_{s in selected} sim(c, s)``

    — the standard redundancy-penalized selection for diverse exemplar
    / few-shot retrieval (a plain top-k returns near-duplicates of one
    mode; MMR spends the budget across modes).

    Distributed shape: candidate generation is :func:`knn_bruteforce`
    (broadcast queries, corpus never shuffled); the greedy stage runs
    on CANDIDATE-sized state only — pairwise sims are
    |queries|·n_candidates² rows computed once and persisted, each of
    the k-1 steps is a penalty groupBy + top-1 window over that
    bounded state (never the corpus). Final result is k·|queries|
    rows, localCheckpoint-ed so the loop caches release before return.

    Determinism: relevance and pair sims round to 6 decimals; the
    mixed score floor-scales at 1e-6 (floor of identical IEEE doubles
    is engine-independent where round()'s half-up boundary is not) and
    ties break on neighbor_id — the DuckDB oracle unrolls the same k
    greedy steps hash-exactly.

    Reference: no counterpart — north-star similarity-search mandate.
    """
    cands = (
        knn_bruteforce(corpus, queries, k=n_candidates, emb_col=emb_col, id_col=id_col)
        .select("query_id", "neighbor_id", F.col("cosine").alias("rel"), "rank")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ce = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("__e"),
        norm(F.col(emb_col)).alias("__n"),
    )
    with_emb = cands.join(ce, "neighbor_id").select(
        "query_id", "neighbor_id", "__e", "__n"
    )
    a, b = with_emb.alias("a"), with_emb.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.neighbor_id") != F.col("b.neighbor_id")),
        )
        .select(
            F.col("a.query_id").alias("query_id"),
            F.col("a.neighbor_id").alias("ca"),
            F.col("b.neighbor_id").alias("cb"),
            F.round(
                dot_product(F.col("a.__e"), F.col("b.__e"))
                / (F.col("a.__n") * F.col("b.__n")),
                6,
            ).alias("psim"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    lam_l, pen_l = F.lit(float(lam)), F.lit(float(1.0 - lam))
    selected = (
        cands.filter(F.col("rank") == 1)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rel").alias("relevance"),
            F.lit(1).alias("mmr_rank"),
            (F.floor(lam_l * F.col("rel") * 1e6) / 1e6).alias("mmr_score"),
        )
    )
    w_pick = Window.partitionBy("query_id").orderBy(
        F.desc("__score"), F.asc("neighbor_id")
    )
    for t in range(2, k + 1):
        pen = (
            pairs.join(
                selected.select(
                    "query_id", F.col("neighbor_id").alias("cb")
                ),
                ["query_id", "cb"],
            )
            .groupBy("query_id", F.col("ca").alias("neighbor_id"))
            .agg(F.max("psim").alias("__pen"))
        )
        remaining = cands.join(
            selected.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_anti",
        )
        pick = (
            remaining.join(pen, ["query_id", "neighbor_id"])
            .withColumn(
                "__score",
                F.floor(
                    (lam_l * F.col("rel") - pen_l * F.col("__pen")) * 1e6
                )
                / 1e6,
            )
            .withColumn("__rn", F.row_number().over(w_pick))
            .filter(F.col("__rn") == 1)
            .select(
                "query_id",
                "neighbor_id",
                F.col("rel").alias("relevance"),
                F.lit(t).alias("mmr_rank"),
                F.col("__score").alias("mmr_score"),
            )
        )
        # selected is <= |queries|*t rows; checkpointing it each step
        # keeps every iteration's plan flat (without this, step t
        # re-derives steps 1..t-1 inside BOTH the penalty join and the
        # anti join — measured ~4x wall on the registered entry)
        selected = selected.unionByName(pick).localCheckpoint(eager=True)
    out = selected.localCheckpoint(eager=True)
    cands.unpersist()
    pairs.unpersist()
    return out
