"""Scalar-function parity: timeframe durations (30m bug fixed), ms casts."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from binance_data_framework_spark.functions.casts import ms_to_ts, ts_to_ms
from binance_data_framework_spark.functions.timeframes import (
    TIMEFRAME_MS,
    timeframe_duration_col,
)


def test_30m_bug_fixed():
    # reference maps '30m' to 30*1000 ms (30 seconds, database_handler.py:175)
    assert TIMEFRAME_MS["30m"] == 30 * 60 * 1000


def test_all_15_timeframes_present():
    assert len(TIMEFRAME_MS) == 15
    assert TIMEFRAME_MS["1w"] == 7 * 24 * 3600 * 1000


def test_duration_col(spark):
    df = spark.createDataFrame([(tf,) for tf in TIMEFRAME_MS], "timeframe string")
    out = {
        r["timeframe"]: r["ms"]
        for r in df.select(
            "timeframe", timeframe_duration_col(F.col("timeframe")).alias("ms")
        ).collect()
    }
    assert out == TIMEFRAME_MS


def test_ms_roundtrip(spark):
    t = datetime(2024, 3, 1, 12, 34, 56, 789000)
    df = spark.createDataFrame([(t,)], "ts timestamp")
    row = df.select(
        ts_to_ms("ts").alias("ms"), ms_to_ts(ts_to_ms("ts")).alias("back")
    ).first()
    assert row["ms"] == 1709296496789
    assert row["back"] == t
