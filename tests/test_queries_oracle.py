"""DuckDB-oracle equivalence for every registry entry with an oracle —
the local mirror of the driver's CORRECTNESS gate (sf0.01)."""

import pytest

from data_pipelines_snowflake_procedures_spark.queries import REGISTRY

from .oracle_utils import assert_oracle_match

ORACLE_SPECS = [s for s in REGISTRY.values() if s.oracle is not None]

#: The most expensive oracle mirrors (>~3 s apiece measured on the r11
#: harness box — multi-fit ANN pipelines, FD discovery, iterative graph
#: oracles whose unrolled CTEs are heavy on the DuckDB side too).
#: Marked @slowtier so the DEFAULT suite finishes inside the driver's
#: verify window (VERDICT r10 #1); they still run per round via
#: `pytest tests/test_queries_oracle.py -m slowtier` and the driver's
#: own 50-entry CORRECTNESS sample covers this set independently.
SLOW_ORACLE = {
    "knn_ivfpq_embeddings",
    "dq_fd_consistency_part",
    "customer_er_clusters",
    "knn_recall_report_quantized",
    "knn_lsh_embeddings",
    "knn_recall_report",
    "knn_lsh_multiprobe_embeddings",
    "profile_customer",
    "documents_centrality_pagerank",
    "trade_graph_pagerank",
    "embedding_near_dup_blocked",
    "dq_table_scores_orders",
    "dq_file_completeness_uniqueness_customer",
    "corpus_neardup_dedup_apply",
    "scd2_as_of_orders",
    "corpus_decontaminate_bloom",
    "events_hourly_holt_winters",
    "dedup_clusters_documents",
    "pii_detect_customer",
    "supplier_graph_bfs_hops",
    "knn_mmr_rerank_embeddings",
    "part_item_item_cf",
    "trade_graph_labelprop",
    "synthetic_events_agg",
    "documents_textrank_chunks",
    "scd2_merge_orders",
    "documents_bpe_merges",
    "dedup_lsh_pr_report",
    "dq_table_scores_documents",
    "events_heavy_hitters_streaming",
    "events_stream_stream_join",
    "supplier_graph_triangles",
    "dq_zscore_accuracy_supplier",
    "knn_pq_embeddings",
    "dedup_minhash_lsh_shingles_documents",
    "documents_bpe_token_budget",
}


@pytest.mark.parametrize(
    "spec",
    [
        pytest.param(
            s,
            id=s.name,
            marks=(pytest.mark.slowtier,) if s.name in SLOW_ORACLE else (),
        )
        for s in ORACLE_SPECS
    ],
)
def test_oracle_match(spark, duck, spec, sf_dir):
    assert_oracle_match(spark, duck, spec, sf_dir)


def test_rows_only_specs_return_rows(spark, sf_dir):
    for spec in REGISTRY.values():
        if spec.oracle is None:
            df = spec.spark_fn(spark, sf_dir)
            assert df.columns, f"{spec.name}: empty schema"
            assert df.count() >= 0
