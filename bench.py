"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line with per-query and total wall time.

Usage: python bench.py
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from data_pipelines_snowflake_procedures_spark.queries import REGISTRY
from data_pipelines_snowflake_procedures_spark.session import get_spark

#: Queries timed by the benchmark. Kept explicit so adding an expensive
#: experimental registry entry doesn't silently regress the bench.
HEADLINE = [
    # relational core
    "pricing_summary",
    "region_revenue",
    "top_customers_by_revenue",
    "latest_order_per_customer",
    "order_priority_counts",
    "customers_without_big_orders",
    "customer_order_analytics",
    "supplier_balance_distribution",
    "orders_priority_pivot",
    "lineitem_cube_flag_status",
    "orders_grouping_sets",
    "nation_trade_flows",
    "customer_fuzzy_match_pairs",
    "promo_revenue_by_brand",
    "orders_price_histogram",
    "lineitem_corr_profile",
    "customer_order_distribution",
    "small_quantity_order_revenue",
    "large_volume_customers",
    # DQ / profiling / PII / SCD
    "profile_customer",
    "dq_table_scores_orders",
    "referential_integrity_orders",
    "pii_mask_customer",
    "scd1_merge_orders",
    "scd2_merge_orders",
    # LLM training-data operators (full-table, scale with SF)
    "text_profile_documents",
    "text_repetition_documents",
    "corpus_clean_documents",
    "corpus_decontaminate_documents",
    "corpus_pack_documents",
    "vocab_top_tokens",
    "dedup_exact_documents",
    "dedup_incremental_documents",
    "dedup_minhash_lsh_documents",
    "dedup_clusters_documents",
    "dedup_simhash_documents",
    "corpus_passage_dedup_documents",
    "corpus_lm_score_documents",
    "documents_quality_quantile",
    "knn_bruteforce_embeddings",
    "embedding_near_dup_blocked",
    "embedding_near_dup_kmeans",
    "kmeans_clusters_embeddings",
    "knn_sq_embeddings",
    "embedding_label_cohesion",
    # event-time windows + pandas surface
    "events_hourly_by_type",
    "events_props_variant",
    "events_sessions_user",
    "events_funnel_view_click_purchase",
    "events_hourly_gapfill",
    "events_retention_cohorts",
    "events_rolling_anomaly",
    "events_asof_click_before_error",
    "events_groupwise_zscore",
    "events_distinct_users_sketch",
]


def _shuffle_partitions_for(sf_dir: str, cpus: int) -> int:
    """Size shuffle partitions to data volume (~64 MB post-shuffle per
    partition), clamped to [8, cpus]. The standard sizing rule — at
    bench scale (tens of MB) this avoids paying 32-task scheduling
    overhead per tiny stage; at cluster scale the same rule yields
    thousands of partitions."""
    total = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    )
    return max(8, min(cpus, total // (64 * 1024 * 1024) + 1))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="bench",
        shuffle_partitions=_shuffle_partitions_for(sf_dir, cpus),
    )
    timings: dict[str, float] = {}

    names = [n for n in HEADLINE if n in REGISTRY]
    # Warm the JVM + parquet footers once so timings measure query
    # execution, not session bring-up.
    REGISTRY[names[0]].spark_fn(spark, sf_dir).count()

    total0 = time.perf_counter()
    for name in names:
        spec = REGISTRY[name]
        t0 = time.perf_counter()
        df = spec.spark_fn(spark, sf_dir)
        n = df.count() if len(df.columns) > 0 else 0
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)
    total = round(time.perf_counter() - total0, 4)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
