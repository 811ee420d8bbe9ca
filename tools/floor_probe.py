"""Round-15 floor probe: where does the per-query overhead go at 32
cores that it doesn't at 8?

Runs a fixed light-query subset N passes in one session, reporting
per-pass wall, Spark job/stage/task counts (statusTracker deltas), and
builder/sink split. Compare SPARK_GRAFT_CPUS=32 vs 8 runs.

Usage: SPARK_GRAFT_CPUS=32 python tools/floor_probe.py [--passes 3] [q ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LIGHT = [
    "where_filter", "fold_difference", "moving_time_window",
    "percentiles_day", "ewma", "index_latest", "index_search",
    "events_heatmap", "retention_rollup", "tpch_q6", "tpch_q12",
    "tpch_q14", "tpch_q19", "top10", "filter_agg", "rate_per_hour",
    "zipf_slope", "vocab_growth", "token_stats", "hash_split",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    names = args.queries or LIGHT

    from riemann_spark import get_spark
    from riemann_spark.plans import QUERIES

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("floor-probe", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # warm
    QUERIES["where_filter"](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()

    jsc = sc._jsc.sc()
    def counters():
        st = jsc.statusTracker()
        # jobs/stages since start via dagScheduler counters
        return (
            jsc.dagScheduler().nextJobId(),
            jsc.dagScheduler().nextStageId(),
        )

    print(f"cpus={cpus} passes={args.passes} queries={len(names)}")
    tot_build = tot_sink = 0.0
    per_pass = []
    j0, s0 = counters()
    for p in range(args.passes):
        t_pass = time.time()
        for name in names:
            fn = QUERIES[name]
            t0 = time.time()
            df = fn(spark, args.sf)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            tot_build += t1 - t0
            tot_sink += t2 - t1
            spark.catalog.clearCache()
        per_pass.append(round(time.time() - t_pass, 3))
    j1, s1 = counters()
    print(
        f"pass walls: {per_pass}  build_total={tot_build:.2f}s "
        f"sink_total={tot_sink:.2f}s jobs={j1-j0} stages={s1-s0}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
