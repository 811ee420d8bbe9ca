"""reinject — the reference's feedback loop (config.clj:280-288),
realized across Spark's acyclic-DAG boundary.

The reference lets any stream call ``reinject`` to push a derived
event back into the root of the topology. A Structured Streaming
query plan cannot contain a cycle, so the feedback edge must leave
the DAG and come back as a SOURCE: a durable queue directory that the
running query appends to (sink half, inside foreachBatch) and reads
(file-source half, unioned with the primary ingest before the
topology). The same pattern at deploy scale is a Kafka topic
(streaming/index_stream.py routes expirations that way); the file
queue here is the in-container, dependency-free equivalent — and the
demo that SURVEY §4's documented workaround actually closes the loop.

Loop discipline: reference reinject can recurse unboundedly (a stream
that reinjects what it receives spins forever). Here every fed-back
event is tagged ``reinjected`` and the sink half refuses to re-queue
an already-tagged event, so feedback is at-most-once BY CONSTRUCTION.
Callers wanting deeper recursion add a numbered tag per hop and raise
the cutoff explicitly.

At 100 TB: the queue is an append-only parquet dir partitioned like
any other source; the union adds one more file-source scan, and the
fed-back volume is alert-sized (filtered), never the raw stream.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from riemann_spark.streaming.sinks import SinkFn, register_sink

REINJECT_TAG = "reinjected"


def _already_reinjected() -> Column:
    return F.coalesce(
        F.array_contains(F.col("tags"), REINJECT_TAG), F.lit(False)
    )


@register_sink("reinject")
def reinject_sink(queue_dir: str, predicate: Column | None = None) -> SinkFn:
    """foreachBatch half of the loop: append the (filtered) batch to
    the queue, tagging each row ``reinjected`` and dropping rows that
    already carry the tag (the at-most-once guard). Empty batches
    write nothing — an unconditional append would seed a self-
    sustaining cycle of empty micro-batches."""

    def write(df: DataFrame, batch_id: int) -> None:
        out = df.filter(predicate) if predicate is not None else df
        out = out.filter(~_already_reinjected()).withColumn(
            "tags",
            F.array_union(
                F.coalesce(F.col("tags"), F.array().cast("array<string>")),
                F.array(F.lit(REINJECT_TAG)),
            ),
        )
        out = out.persist()
        try:
            if out.take(1):
                out.write.mode("append").parquet(queue_dir)
        finally:
            out.unpersist()

    return write


def reinject_source(
    spark: SparkSession, queue_dir: str, schema
) -> DataFrame:
    """Streaming read of the queue directory (created if absent, so
    the union can start before the first feedback write)."""
    os.makedirs(queue_dir, exist_ok=True)
    return spark.readStream.schema(schema).parquet(queue_dir)


def with_reinjection(primary: DataFrame, queue_dir: str) -> DataFrame:
    """Union the primary ingest with the feedback queue — the topology
    built on the result sees fed-back events exactly like fresh ones,
    which is the reference's reinject contract."""
    spark = primary.sparkSession
    return primary.unionByName(
        reinject_source(spark, queue_dir, primary.schema)
    )
