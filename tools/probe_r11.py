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


DENSE = "/tmp/rs_x20_dense_r14"


def build_dense_corpus(spark):
    """DENSE-ID x20 embeddings (r14): the ANN-lane probe corpus. The
    +c*10M disjoint-id layout above is right for the dedup lane
    (disjoint doc ids across copies) but breaks the IVF-PQ geometry
    rule, which picks centroids/seeds from vec_id < cells + 32 — at
    4096 cells the sparse corpus has ids 0..1999 then 10M+, so the
    seed block is EMPTY and the codebook degenerates (every r13 x20
    IVF-PQ serve number under-measured for this reason — SCALING.md
    round-14 note). Here the same epsilon-perturbed vectors are
    re-identified 0..N-1 by a deterministic (vec_id) row_number, so
    every probe measures a real index."""
    from pyspark.sql import Window

    if os.path.exists(f"{DENSE}/embeddings.parquet/_SUCCESS"):
        return
    e = spark.read.parquet(f"{DST}/embeddings.parquet")
    d = e.withColumn(
        "vec_id", F.row_number().over(Window.orderBy("vec_id")) - F.lit(1)
    )
    d.repartition(8).write.mode("overwrite").parquet(
        f"{DENSE}/embeddings.parquet"
    )


def main():
    names = sys.argv[1:] or [
        "knn_ivfpq_rerank",
        "band_index_compaction",
        "contamination_from_table",
        "streaming_index_drift_drained",
    ]
    spark = get_spark("probe-r11")
    build_corpus(spark)
    build_dense_corpus(spark)
    from riemann_spark.plans import QUERIES

    #: the ANN serving lane reads the dense-id corpus (see
    #: build_dense_corpus); everything else probes the standard
    #: disjoint-id corpus
    _DENSE_LANE = {
        "knn_ivfpq", "knn_ivfpq_rerank", "knn_ivfpq_trained",
        "ann_recall_ivfpq", "ann_nprobe_sweep", "ivfpq_geometry_report",
    }
    for name in names:
        src = DENSE if name in _DENSE_LANE else DST
        runs = []
        for i in range(3):  # run 0 = cold state build, excluded
            t0 = time.time()
            QUERIES[name](spark, src).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 2))
        print(f"{name}: cold={runs[0]}s warm_min={min(runs[1:])}s runs={runs}")
    spark.stop()


if __name__ == "__main__":
    main()
