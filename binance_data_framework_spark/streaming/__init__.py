from binance_data_framework_spark.streaming.incremental import (
    streaming_ohlcv,
    streaming_dedup,
)

__all__ = ["streaming_ohlcv", "streaming_dedup"]
