"""x20 scale probes for the round-11 catalog additions.

Builds the standard probe corpus (20 disjoint-id copies of sf0.1;
documents get PER-TOKEN salted text, embeddings get per-copy
epsilon-perturbation) under /tmp and times each new query
min-of-2 noop-sink runs, cold state build excluded (first run builds
the stored state; timed runs serve from it — the serve-path number,
with the cold build time reported separately).

Usage: python tools/probe_r11.py [query ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from riemann_spark import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/rs_x20_probe_r11"


def build_corpus(spark):
    if os.path.exists(f"{DST}/embeddings.parquet/_SUCCESS") and os.path.exists(
        f"{DST}/documents.parquet/_SUCCESS"
    ):
        return
    d = spark.read.parquet(f"{SRC}/documents.parquet")
    cols = [c for c in d.columns if c not in ("doc_id", "text")]
    x20 = d.selectExpr("explode(sequence(0, 19)) AS c", "*").select(
        (F.col("doc_id") + F.col("c") * 10_000_000).alias("doc_id"),
        F.expr(r"regexp_replace(text, '(\\S+)', concat('$1~', c))").alias(
            "text"
        ),
        *cols,
    )
    x20.write.mode("overwrite").parquet(f"{DST}/documents.parquet")
    e = spark.read.parquet(f"{SRC}/embeddings.parquet")
    ecols = [c for c in e.columns if c not in ("vec_id", "embedding")]
    e20 = e.selectExpr("explode(sequence(0, 19)) AS c", "*").select(
        (F.col("vec_id") + F.col("c") * 10_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            + (F.col("c").cast("float") * (i.cast("float") + 1.0)) * 1e-5,
        ).alias("embedding"),
        *ecols,
    )
    e20.write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")


def main():
    names = sys.argv[1:] or [
        "knn_ivfpq_rerank",
        "band_index_compaction",
        "contamination_from_table",
        "streaming_index_drift_drained",
    ]
    spark = get_spark("probe-r11")
    build_corpus(spark)
    from riemann_spark.plans import QUERIES

    for name in names:
        runs = []
        for i in range(3):  # run 0 = cold state build, excluded
            t0 = time.time()
            QUERIES[name](spark, DST).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 2))
        print(f"{name}: cold={runs[0]}s warm_min={min(runs[1:])}s runs={runs}")
    spark.stop()


if __name__ == "__main__":
    main()
