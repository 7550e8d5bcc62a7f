"""Time EVERY registered query (not just the bench's headline set) and flag
outliers — the sweep that catches a broken plan hiding outside bench.py.

Usage: python tools/time_queries.py [sf_dir] [runs]
Prints per-query steady-state seconds (best of `runs`, default 2) sorted
slowest-first, and exits 1 if any query exceeds OUTLIER_SEC.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binance_data_framework_spark.plans.registry import QUERIES
from binance_data_framework_spark.session import get_spark

OUTLIER_SEC = 15.0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("time-queries")
    times: dict[str, float] = {}
    for name, fn in QUERIES.items():
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).collect()
            best = min(best, time.time() - t0)
        times[name] = best
    bad = False
    for name, t in sorted(times.items(), key=lambda kv: -kv[1]):
        flag = "  <-- OUTLIER" if t > OUTLIER_SEC else ""
        if flag:
            bad = True
        print(f"{t:8.2f}s  {name}{flag}")
    print(f"\ntotal (best-of-{runs}): {sum(times.values()):.1f}s over {len(times)} queries")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
