"""CC-round attribution probe (VERDICT r10 #7): record rounds and
per-round wall of connected_components over the MinHash-LSH pair set
at sf0.1 and at the x20 salted-copy corpus, so cluster-family wall
variance becomes attributable to CC iteration count instead of
reading as a plan regression.

x20 corpus per the probe discipline: 20 disjoint-id copies of sf0.1
documents with PER-TOKEN salted text (end-of-doc-only salting leaves
interior shingles shared and fabricates cross-copy cliques).

Usage: python tools/probe_cc_rounds.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from riemann_spark import get_spark  # noqa: E402
from riemann_spark.functions import dedup  # noqa: E402


def probe(spark, docs, label):
    pairs = dedup.lsh_candidate_pairs(docs, 8, 2).localCheckpoint()
    n_pairs = pairs.count()
    t0 = time.time()
    labels = dedup.connected_components(pairs)
    n_nodes = labels.count()
    total = time.time() - t0
    print(
        f"{label}: pairs={n_pairs} nodes={n_nodes} "
        f"rounds={dedup.last_cc_rounds} total={total:.2f}s "
        f"per_round={dedup.last_cc_round_secs}"
    )


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("cc-probe")
    d = spark.read.parquet(f"{sf}/documents.parquet")
    probe(spark, d, f"sf0.1({sf})")

    # per-token salt: append ~<copy> to every token
    x20 = d.selectExpr("explode(sequence(0, 19)) AS c", "doc_id", "text").select(
        (F.col("doc_id") + F.col("c") * 10_000_000).alias("doc_id"),
        F.expr(r"regexp_replace(text, '(\\S+)', concat('$1~', c))").alias(
            "text"
        ),
    ).localCheckpoint()
    x20.count()
    probe(spark, x20, "x20(salted copies)")
    spark.stop()


if __name__ == "__main__":
    main()
