"""Per-query attribution profiler for optimization rounds (guide §1).

Splits each query's wall time into
  construct = QUERIES[name](spark, sf_dir) returning a DataFrame — driver-side
              work: model ensure/training collects, localCheckpoint
              materialization, plan building;
  execute   = noop write of the returned plan (best of `runs`).
and counts the Spark jobs each phase launched (statusTracker) — a construct
phase with many jobs is collect/training-bound, not plan-bound.

Usage: python tools/profile_queries.py [sf_dir] [runs] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binance_data_framework_spark.plans.registry import QUERIES
from binance_data_framework_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    names = sys.argv[3:] or list(QUERIES)
    spark = get_spark("profile-queries")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    # warm-up: JVM, parquet footers, Python worker pool
    QUERIES["agg_count"](spark, sf_dir).collect()
    import gc

    rows = []
    for name in names:
        fn = QUERIES[name]
        # mirror bench.py: drop the previous query's localCheckpoint blocks
        # before timing (their lazy unpersist otherwise bleeds GC pressure
        # into the next measurement)
        gc.collect()
        j0 = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_construct = time.perf_counter() - t0
        j1 = len(tracker.getJobIdsForGroup(None) or [])
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        j2 = len(tracker.getJobIdsForGroup(None) or [])
        rows.append((name, t_construct, best, j1 - j0, (j2 - j1) // runs))
    rows.sort(key=lambda r: -(r[1] + r[2]))
    print(f"{'construct':>10} {'exec':>8} {'cjobs':>6} {'ejobs':>6}  query")
    for name, c, e, cj, ej in rows:
        print(f"{c:10.3f} {e:8.3f} {cj:6d} {ej:6d}  {name}")
    print(f"total construct={sum(r[1] for r in rows):.1f}s exec={sum(r[2] for r in rows):.1f}s")
    return 0


if __name__ == "__main__":
    main()
