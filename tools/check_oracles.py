"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle on DuckDB at a given sf, compare row-count + schema
(column names) + order-insensitive value multiset.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from binance_data_framework_spark.plans.registry import ORACLES, QUERIES
from binance_data_framework_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)].copy()
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append(None)
                else:
                    vals.append(round(v, 9))
            elif v is pd.NaT:
                vals.append(None)
            elif isinstance(v, pd.Timestamp):
                vals.append(v.isoformat())
            else:
                vals.append(None if v is None else str(v))
        rows.append(tuple(vals))
    return sorted(rows, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in ORACLES:
            print(f"rows  {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            odf = con.sql(ORACLES[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append((name, f"schema: {sorted(sdf.columns)} vs {sorted(odf.columns)}"))
            print(f"FAIL  {name}: schema {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        if len(sdf) != len(odf):
            failures.append((name, f"rows: {len(sdf)} vs {len(odf)}"))
            print(f"FAIL  {name}: rowcount {len(sdf)} vs {len(odf)}")
            continue
        a, b = canon(sdf), canon(odf)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            print(f"FAIL  {name}: values differ, e.g. {diff}")
            continue
        print(f"OK    {name}: {len(sdf)} rows")
    print(f"\n{len(QUERIES) - len(failures)}/{len(QUERIES)} passing")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
