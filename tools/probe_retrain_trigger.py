"""Scale probe for streaming_retrain_trigger (VERDICT r9 #6).

Builds the ×N replicated events corpus (rows ×N, key space ×N — the
SCALING.md method: user_id offset per copy, event_id kept unique),
runs the drained trigger pipeline against it, and prints the
STATE-OPERATOR time breakdown from StreamingQuery progress — the
direct evidence for where the ×100 wall ratio goes:

- ``allUpdatesTimeMs``: inside applyInPandasWithState — Arrow
  round-trips to the Python worker + the per-key update function.
- ``commitTimeMs``: state-store commit (HDFSBackedStateStore churn).
- ``allRemovalsTimeMs``: timeout/eviction sweep.

Usage: python tools/probe_retrain_trigger.py [N] [--identity]
  N           replication factor (default 20; SCALING.md's row is 100)
  --identity  run a pass-through stateful update instead of the
              trigger logic — isolates harness (Arrow + state store)
              cost from the trigger's own per-row Python loop.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_corpus(spark, n: int) -> str:
    out = os.path.join(
        tempfile.gettempdir(), f"rs_probe_events_x{n}_{os.path.basename(SF)}"
    )
    marker = os.path.join(out, "events.parquet", "_SUCCESS")
    if not os.path.exists(marker):
        from pyspark.sql import functions as F

        base = spark.read.parquet(f"{SF}/events.parquet")
        hi = base.agg(F.max("user_id"), F.max("event_id")).collect()[0]
        uoff, eoff = int(hi[0]) + 1, int(hi[1]) + 1
        copies = base.crossJoin(
            spark.range(n).select(F.col("id").alias("__copy"))
        ).select(
            (F.col("event_id") + F.col("__copy") * eoff).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("__copy") * uoff).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        copies.write.mode("overwrite").parquet(f"{out}/events.parquet")
    return out


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 20
    identity = "--identity" in sys.argv
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = build_corpus(spark, n)

    from riemann_spark.schema import load_events, normalize_events, normalize_ts
    from riemann_spark.streaming import stateful_ops as so

    ev = load_events(spark, sf).filter(F.col("metric").isNotNull())
    q6 = F.lit(1e6)

    def qmean(col):
        return (
            F.sum(F.round(col * q6).cast("long").cast("decimal(38,0)"))
            .cast("double")
            / q6
            / F.count(F.lit(1))
        )

    st = ev.groupBy("host", "service").agg(
        qmean(F.col("metric")).alias("mu"),
        qmean(F.col("metric") * F.col("metric")).alias("m2"),
    )
    p = st.select(
        "host",
        "service",
        "mu",
        F.sqrt(
            F.greatest(F.col("m2") - F.col("mu") * F.col("mu"), F.lit(0.0))
        ).alias("sd"),
    )
    raw_schema = spark.read.parquet(f"{sf}/events.parquet").schema
    raw = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(f"{sf}/events.parquet")
    )
    sev = (
        normalize_events(normalize_ts(raw, "ts"))
        .filter(F.col("metric").isNotNull())
        .join(F.broadcast(p), ["host", "service"])
    )
    if identity:
        import pandas as pd
        from pyspark.sql.streaming.state import GroupStateTimeout
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        out_schema = StructType(
            [
                StructField("host", StringType()),
                StructField("service", StringType()),
                StructField("n", LongType()),
            ]
        )
        state_schema = StructType([StructField("n", LongType())])

        def update(key, pdfs, state):
            n_rows = sum(len(x) for x in pdfs)
            prev = state.get[0] if state.exists else 0
            state.update((prev + n_rows,))
            yield pd.DataFrame(
                [(key[0], key[1], n_rows)], columns=["host", "service", "n"]
            )

        out = so.apply_with_state(
            sev,
            ("host", "service"),
            update,
            out_schema,
            state_schema,
            timeout=GroupStateTimeout.NoTimeout,
        )
    else:
        out = so.streaming_retrain_trigger(
            sev, m_windows=2, frac_num=1, frac_den=4
        )
    name = f"probe_srt_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="probe_srt_ck_")
    t0 = time.time()
    q_ = (
        out.writeStream.format("noop")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q_.processAllAvailable()
    wall = time.time() - t0
    prog = q_.recentProgress
    q_.stop()
    mode = "identity" if identity else "trigger"
    print(f"mode={mode} x{n}: wall {wall:.1f}s, {len(prog)} micro-batches")
    tot = {}
    for pr in prog:
        for op in pr.get("stateOperators", []):
            for k in (
                "allUpdatesTimeMs",
                "commitTimeMs",
                "allRemovalsTimeMs",
                "numRowsUpdated",
                "numRowsTotal",
            ):
                tot[k] = tot.get(k, 0) + int(op.get(k, 0) or 0)
        dd = pr.get("durationMs", {})
        for k in ("addBatch", "triggerExecution"):
            tot[f"durationMs.{k}"] = tot.get(f"durationMs.{k}", 0) + int(
                dd.get(k, 0) or 0
            )
    for k, v in sorted(tot.items()):
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
