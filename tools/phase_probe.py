"""Round-15 floor decomposition: where do the ~0.3-0.7s sub-second
query floors go — py4j plan construction (builder), Catalyst
analysis/optimization/physical planning, or execution?

For each query: builder wall, then a fresh noop save timed end-to-end,
with the save's QueryPlanningTracker phase times (analysis /
optimization / planning, driver-side Catalyst work) read back from the
last execution. Passes are warm (min-of-N), clearCache between
queries, matching bench methodology.

Usage: python tools/phase_probe.py [--sf DIR] [--passes N] q1 q2 ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from riemann_spark import get_spark
    from riemann_spark.plans import QUERIES

    spark = get_spark("phase-probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["where_filter"](spark, args.sf).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    jvm = spark._sc._jvm
    print(f"{'query':34s} {'build':>6s} {'sink':>6s} {'anal':>6s} {'optim':>6s} {'plan':>6s} {'exec':>6s}")
    for name in args.queries:
        fn = QUERIES[name]
        best = None
        for _ in range(args.passes):
            t0 = time.time()
            df = fn(spark, args.sf)
            t1 = time.time()
            # fresh save == fresh QueryExecution: analysis+optimization
            # re-run per action, which is what the bench pays
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            phases = {}
            try:
                qel = jvm.org.apache.spark.sql.execution.QueryExecution
                # the last execution's tracker via the active SQL
                # execution is gone; instead re-plan the same frame and
                # time the phases directly on a fresh QueryExecution
            except Exception:
                pass
            # direct phase timing: fresh QueryExecution over the same
            # logical plan (exactly what the save just built), phases
            # from its tracker after forcing executedPlan
            t3 = time.time()
            qe = df._jdf.queryExecution()
            fresh = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
                spark._jsparkSession, qe.logical()
            ).queryExecution()
            fresh.executedPlan()
            t4 = time.time()
            ph = fresh.tracker().phases()
            it = ph.iterator()
            while it.hasNext():
                kv = it.next()
                s = kv._2()
                phases[kv._1()] = (s.endTimeMs() - s.startTimeMs()) / 1000.0
            row = (
                t1 - t0,
                t2 - t1,
                phases.get("analysis", 0.0),
                phases.get("optimization", 0.0),
                phases.get("planning", 0.0),
                (t2 - t1) - (t4 - t3),  # save minus driver replan time
            )
            if best is None or row[0] + row[1] < best[0] + best[1]:
                best = row
            spark.catalog.clearCache()
        print(
            f"{name:34s} {best[0]:6.3f} {best[1]:6.3f} {best[2]:6.3f}"
            f" {best[3]:6.3f} {best[4]:6.3f} {best[5]:6.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
