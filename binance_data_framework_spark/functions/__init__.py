from binance_data_framework_spark.functions.timeframes import (
    TIMEFRAME_MS,
    timeframe_duration_col,
    timeframe_dim,
)
from binance_data_framework_spark.functions.casts import ms_to_ts, ts_to_ms

__all__ = [
    "TIMEFRAME_MS",
    "timeframe_duration_col",
    "timeframe_dim",
    "ms_to_ts",
    "ts_to_ms",
]
