"""Round-14 optimization probe: per-query cost breakdown + plan dump.

For each named query, times BUILDER (the ``QUERIES[name](spark, sf)``
call — plan construction plus any internal actions: stored-state stamp
checks, geometry counts, model-sized collects) separately from SINK
(the noop-sink execution of the returned frame), min over N passes,
matching bench.py methodology (clearCache between queries, warm
session). Optionally writes ``explain('formatted')`` to
``plans/r14/<query>_<tag>.txt``.

Usage:
  python tools/opt_probe.py [--sf DIR] [--passes N] [--dump TAG] q1 q2 ...
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
    ap.add_argument("--dump", default=None, help="plan dump tag (before/after)")
    ap.add_argument("--jobs", action="store_true", help="report Spark job count per query")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from riemann_spark import get_spark
    from riemann_spark.plans import QUERIES

    spark = get_spark("opt-probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM/codegen like bench.py
    QUERIES["where_filter"](spark, args.sf).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    tracker = spark.sparkContext.statusTracker()
    print(f"{'query':38s} {'build':>7s} {'sink':>7s} {'total':>7s}  jobs")
    for name in args.queries:
        fn = QUERIES[name]
        best = (None, None, None, None)
        for p in range(args.passes):
            j0 = len(tracker.getJobIdsForGroup(None) or []) if args.jobs else 0
            t0 = time.time()
            df = fn(spark, args.sf)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            jn = "-"
            tot = t2 - t0
            if best[2] is None or tot < best[2]:
                best = (t1 - t0, t2 - t1, tot, jn)
            if args.dump and p == 0:
                outd = os.path.join(
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "plans", "r15",
                )
                os.makedirs(outd, exist_ok=True)
                with open(os.path.join(outd, f"{name}_{args.dump}.txt"), "w") as fh:
                    fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            spark.catalog.clearCache()
        print(f"{name:38s} {best[0]:7.3f} {best[1]:7.3f} {best[2]:7.3f}  {best[3]}")
    spark.stop()


if __name__ == "__main__":
    main()
