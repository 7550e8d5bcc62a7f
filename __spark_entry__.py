"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All plans live in binance_data_framework_spark.plans.registry; this module is
a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from binance_data_framework_spark.plans.registry import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: events -> 1h OHLCV bars per
    event_type series -> trailing 20-bar SMA (the reference's entire
    analytical core in one plan: scan -> filter -> time-bucket agg -> window
    function; SURVEY.md §7 Phase 1)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return QUERIES["flagship_ohlcv_sma"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible ops:
    LSH/SimHash candidate generation — driver records rows-only checks)."""
    return dict(ORACLES)
