"""Scale probe: replicate the sf0.1 documents N× (with shifted ids —
which also multiplies duplicate density, the adversarial case for
dedup) and time the text/dedup operators at 1× vs N×; likewise
replicate events N× and probe the star-schema path (fact build + the
four KPI views) — the fact join/agg curve must stay flat-ish and the
bucketed two-pass surrogate key must hold.

The point is the growth CURVE, not the absolute numbers: an operator
whose cost scales superlinearly in input here will not survive a
1000-executor 100 TB run. Run ad hoc; results land in one JSON line.

Usage: python tools/scale_probe.py [replicas=10]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import (
    text as text_fn,
)
from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import dedup
from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.session import get_spark

BASE = "/root/testdata/sf0.1/documents.parquet"


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale_probe")
    big_path = os.path.join(tempfile.gettempdir(), f"docs{replicas}x.parquet")

    docs = spark.read.parquet(BASE)
    parts = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        for i in range(replicas)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.write.mode("overwrite").parquet(big_path)

    def ops(df):
        from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
            sampling,
            sketches,
        )

        return {
            # .count() would let Catalyst prune the computed columns;
            # the noop sink forces the full plan.
            "text_profile": lambda: text_fn.profile_documents(df),
            "repetition_profile": lambda: text_fn.repetition_profile(df),
            "winnow": lambda: text_fn.winnow_fingerprints(df),
            "simhash_near_dups": lambda: dedup.simhash_near_dups(df),
            "minhash_dedup_pairs": lambda: dedup.minhash_dedup_pairs(
                df, threshold=0.5
            ),
            "ngram_jaccard_pairs": lambda: dedup.ngram_jaccard_pairs(
                df, threshold=0.5
            ),
            "redact_pii": lambda: df.select(
                "doc_id", text_fn.redact_pii(F.col("text")).alias("t")
            ),
            "vocab_top_terms": lambda: text_fn.top_terms(df),
            "curate_top_per_source": lambda: sampling.curate_top_per_group(
                df, text_fn.quality_score(F.col("text")), "source"
            ),
            # HLL over the replicated corpus must ALSO return the same
            # estimate at Nx: replicas duplicate text fingerprints, and
            # a distinct sketch that grows with duplication is broken.
            "hll_distinct_fingerprints": lambda: sketches.hll_distinct(
                df.select(text_fn.fingerprint(F.col("text")).alias("fp")),
                "fp",
                [],
            ),
        }

    results: dict[str, dict[str, float]] = {}
    for tag, path in [("1x", BASE), (f"{replicas}x", big_path)]:
        df = spark.read.parquet(path)
        for name, fn in ops(df).items():
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            results.setdefault(name, {})[tag] = round(time.time() - t0, 2)

    # --- star-schema path: replicate EVENTS Nx into an sf_dir-shaped
    # probe dir (other tables symlinked), then time the fact build and
    # the four KPI views through the exact registered query code.
    sf_dir = os.path.dirname(BASE)
    star_dir = os.path.join(tempfile.gettempdir(), f"star{replicas}x")
    os.makedirs(star_dir, exist_ok=True)
    replicated = {
        "events": "event_id",
        "orders": "o_orderkey",
        "embeddings": "vec_id",
    }
    for t in os.listdir(sf_dir):
        link = os.path.join(star_dir, t)
        if t.removesuffix(".parquet") not in replicated and not os.path.exists(
            link
        ):
            os.symlink(os.path.join(sf_dir, t), link)
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.tables import (
        load_table,
    )

    for tname, key in replicated.items():
        src = load_table(spark, sf_dir, tname)
        parts_t = [
            src.withColumn(key, F.col(key) + F.lit(i * 100_000_000))
            for i in range(replicas)
        ]
        big_t = parts_t[0]
        for p in parts_t[1:]:
            big_t = big_t.unionByName(p)
        big_t.write.mode("overwrite").parquet(
            os.path.join(star_dir, f"{tname}.parquet")
        )

    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.plans import (
        marketing,
    )

    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        similarity,
        sketches,
    )
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.plans import (
        relational,
    )

    star_ops = {
        "fact_events": marketing.build_f_events,
        "kpi_view_count_by_period": marketing.view_count_by_period,
        "kpi_item_view_rank_by_period": marketing.item_view_rank_by_period,
        "kpi_most_viewed_item_latest_period": (
            marketing.most_viewed_item_latest_period
        ),
        "kpi_top_event_type_by_period": marketing.top_event_type_by_period,
        # gap-fill's grid is domain-bounded: events replication must not
        # grow it (growth should track the daily-agg scan, not the grid)
        "order_priority_daily_gapfill": relational.order_priority_daily_gapfill,
        "order_price_quantile_sketch": lambda s, d: (
            sketches.binned_quantile_sketch(
                load_table(s, d, "orders"), "o_totalprice"
            )
        ),
        "embedding_kmeans_clusters": lambda s, d: similarity.kmeans_clusters(
            load_table(s, d, "embeddings")
        ),
    }
    for tag, d in [("1x", sf_dir), (f"{replicas}x", star_dir)]:
        for name, fn in star_ops.items():
            t0 = time.time()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            results.setdefault(name, {})[tag] = round(time.time() - t0, 2)

    for name, r in results.items():
        r["growth"] = round(r[f"{replicas}x"] / max(r["1x"], 0.01), 1)
    print(json.dumps({"replicas": replicas, "seconds": results}))
    spark.stop()


if __name__ == "__main__":
    main()
