"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop sink (full plan execution,
no driver-side collect bottleneck in the timing). One warm-up query runs
first so JVM/codegen startup isn't charged to the first measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.session import get_spark

HEADLINE = [
    "kpi_view_count_by_period",
    "kpi_item_view_rank_by_period",
    "kpi_most_viewed_item_latest_period",
    "kpi_top_event_type_by_period",
    "fact_events",
    "merge_update_orders",
    "pricing_summary",
    "revenue_by_nation",
    "top_customers_per_segment",
    "user_sessions",
    "running_daily_revenue",
    "events_last_order",
    "purchases_in_browse_sessions",
    "part_name_features",
    "text_profile",
    "doc_winnow_fingerprints",
    "dedup_exact_docs",
    "ngram_jaccard_dups",
    "minhash_lsh_dups",
    "simhash_near_dups",
    "embedding_topk_lsh",
    "embedding_cosine_dups_lsh",
    "media_features",
    "doc_pack_sequences",
    "decontaminate_eval_docs",
    "repetition_profile",
    "stratified_mix_sample",
    "kpi_view_trend_by_period",
    "kpi_top_items_view_share",
    "nation_trade_volume",
    "redact_pii_docs",
    "vocab_top_terms",
    "conversion_funnel",
    "curate_top_docs_per_source",
    "hll_distinct_users_by_type",
    "rolling_weekly_revenue",
    "chunk_documents",
    "embedding_source_profile",
    "salted_event_counts",
    "embedding_kmeans_clusters",
    # round 4: corpus-boilerplate + storage-layout + SCD-2 families
    "merge_scd2_orders",
    "line_dedup_docs",
    "dup_span_hotspots",
    "tfidf_top_terms",
    "partitioned_events_by_type",
    "bucketed_segment_revenue",
    "fuzzy_part_name_matches",
    "corpus_shuffle_order",
    # round 4, continued: runtime filter, hot-key join, sketch serving,
    # corpus rarity
    "bloom_semi_revenue",
    "salted_join_rates",
    "cms_user_counts",
    "rare_token_ratio",
    "hll_user_overlap_by_type",
    "embedding_topk_pq",
    "embedding_topk_ivf_pq",
    "order_quality_checks",
    "daily_order_anomalies",
    "supplier_hierarchy_rollup",
    "nation_revenue_analytics",
    "doc_sentences_udtf",
    "user_order_cogroup_profile",
    "doc_hashed_features",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    qs = entrymod.queries()

    # Warm-up: JVM + parquet footer caches, not charged to any query.
    force(qs["pricing_summary"](spark, sf_dir))
    # Also spin up the Python/Arrow worker pool once: the first
    # applyInPandas in a session pays ~10 s of worker-spawn + Arrow
    # init on this host, which is session overhead (like JVM startup),
    # not a per-query cost — without this, whichever pandas-path query
    # runs first absorbs it and its number stops meaning anything.
    import pandas as _pd  # noqa: PLC0415

    force(
        spark.range(64)
        .groupBy((F.col("id") % 8).alias("g"))
        .applyInPandas(
            lambda pdf: _pd.DataFrame({"n": [len(pdf)]}), "n long"
        )
    )

    # Min over SPARK_GRAFT_BENCH_REPEAT passes (default 2): this host
    # shows random per-query noise bursts up to 5x (a query measuring
    # 0.8 s, 1.2 s, 5.3 s across back-to-back runs while its plan is
    # unchanged); the min of two passes measures the query, not the
    # hiccup. Passes alternate whole sweeps so a single bad window
    # can't poison both samples of one query.
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2"))
    timings: dict[str, float] = {}
    for _ in range(max(1, repeat)):
        for name in HEADLINE:
            t0 = time.time()
            force(qs[name](spark, sf_dir))
            dt = round(time.time() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
