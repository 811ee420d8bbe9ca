"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value" (total sec), "unit", "queries", "sf"}.

Queries execute to completion via the noop sink (no driver collection,
no column-pruning shortcuts a count() would allow)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline set: one per operator family, weighted toward the plans that
# stress shuffle/window/join at scale
HEADLINE = [
    "index_latest",
    "index_search",
    "where_filter",
    "transform_fields",
    "rate_per_hour",
    "window_folds",
    "percentiles_day",
    "moving_event_window",
    "ddt",
    "counter_running",
    "ewma",
    "changed_state",
    "stable_2h",
    "top10",
    "predict_linear",
    "fill_in",
    "tpch_q1",
    "revenue_top10",
    "regional_revenue",
    "text_features",
    "dedup_exact",
    "dedup_jaccard",
    "dedup_minhash_lsh",
    "simhash",
    "knn_bruteforce",
    "knn_lsh",
    "filter_agg",
    "top_suppliers_per_part",
    "customers_without_orders",
    "multimodal_features",
    "sorted_sample",
    "fold_difference",
    "moving_time_window",
    "fixed_time_window",
    "ddt_real",
    "rollup",
    "graphite_roundtrip",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from riemann_spark import get_spark
    from riemann_spark.plans import QUERIES

    spark = get_spark("riemann-spark-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen paths outside the timed region
    QUERIES["where_filter"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
