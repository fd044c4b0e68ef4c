"""Iterative link analysis over DataFrame edge lists — PageRank-style
centrality, the third member of this repo's iterative-algorithm family
(k-means: `similarity.py::kmeans_lloyd`; connected components:
`dedup.py::connected_components`).

Why a training-data engine carries this: link/similarity-graph
centrality is a standard corpus-curation signal (rank pages by link
graph before sampling; rank documents by similarity-graph centrality
to find representative vs orphan content). The same operator serves
relational graphs (who-trades-with-whom) unchanged.

Scale shape: the graph lives as a distributed EDGE LIST — no adjacency
matrix, no driver-side graph object. One iteration is one sparse
matrix-vector product expressed relationally: join ranks onto edges by
source (shuffle keyed on node id), groupBy destination (second
shuffle), then a left join back onto the node set for dangling nodes.
Per-iteration cost is O(|E|) shuffled bytes, independent of iteration
count; ranks are node-sized. `localCheckpoint` truncates the growing
lineage every few rounds exactly as connected components does.

Determinism (oracle-matchable, the k-means contract): edge weights are
exact counts, out-weight normalization and the damping update are
plain double arithmetic, and each iteration's ranks round to
``iter_decimals`` (9) — three orders of magnitude above float
accumulation-order noise, three below the final 6-decimal surface —
so Spark and a SQL engine unrolling the same iterations agree
hash-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    decimals: int = 6,
    iter_decimals: int = 9,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Weighted PageRank over an edge list; returns ``(node, pr)``.

    Nodes are everything appearing as a source or destination. A node
    with no OUT-edges (dangling) simply stops propagating — its mass
    re-enters through the teleport term only, the simplest
    well-defined convention and the one a SQL oracle can restate
    without a global dangling-mass redistribution pass. Ranks start
    uniform at 1/N and update as ``(1-d)/N + d·Σ_in pr(u)·w(u,v)/
    out_w(u)``, rounded to ``iter_decimals`` per iteration."""
    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
    )
    # nodes and fracs are read every iteration inside ONE final action:
    # without the persists the whole edge-derivation lineage (often a
    # join+groupBy upstream) re-executes ~2x per iteration. Released
    # below once the final ranks materialize (localCheckpoint), so no
    # session-lifetime blocks outlive the call.
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        nodes.unpersist()
        # empty graph: empty result, same (node, pr) contract
        return nodes.withColumn("pr", F.lit(0.0)).select("node", "pr")
    out_w = e.groupBy("src").agg(F.sum("w").alias("ow"))
    frac = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("ow")).alias("frac"))
        .persist()
    )
    base = (1.0 - damping) / n
    pr = nodes.withColumn("pr", F.lit(round(1.0 / n, iter_decimals)))
    for i in range(iters):
        inflow = (
            frac.join(pr, frac["src"] == pr["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("frac") * F.col("pr")).alias("inflow"))
        )
        pr = (
            nodes.join(inflow, nodes["node"] == inflow["dst"], "left")
            .select(
                "node",
                F.round(
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0)),
                    iter_decimals,
                ).alias("pr"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            pr = pr.localCheckpoint(eager=True)
    # materialize the node-sized ranks (truncating lineage through the
    # caches), then release the loop state
    out = pr.select(
        "node", F.round("pr", decimals).alias("pr")
    ).localCheckpoint(eager=True)
    nodes.unpersist()
    frac.unpersist()
    return out
