"""Dump `.explain("formatted")` output for registered queries to files —
the before/after plan evidence for optimization rounds (plans/r13/...).

Usage: python tools/dump_plans.py <out_dir> <suffix> [query ...]
Writes <out_dir>/<query>_<suffix>.txt for each query (all queries when
none given). Plan construction may run bounded setup jobs for the
store-backed queries (see tools/lint_plans.py docstring); the dump itself
is analysis-only.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binance_data_framework_spark.plans.registry import QUERIES
from binance_data_framework_spark.session import get_spark


def main() -> int:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or list(QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
