"""Canonical schemas.

The reference hard-codes one shape everywhere: OHLCV keyed by
(symbol, timeframe, timestamp) — SQLite DDL at reference
database_handler.py:110-122. Here it is a StructType; fixture schemas match
/root/testdata (FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Storage/result schema of the engine's core table. The reference stores
# epoch-ms INTEGER timestamps (database_handler.py:112); Spark-native form is
# TimestampType (UTC session) with ms<->ts casts at the API boundary.
OHLCV = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("symbol", T.StringType(), False),
        T.StructField("timeframe", T.StringType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("volume", T.DoubleType(), True),
    ]
)

# Row shape of the reference's SQLite ohlcv_data table minus the series key
# (epoch-ms INTEGER timestamp, REAL prices — database_handler.py:110-122), as
# read by the sqlite migration source before the ms->timestamp cast.
OHLCV_MS = T.StructType(
    [
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("volume", T.DoubleType(), True),
    ]
)

# Raw 12-column kline page as returned by the REST source (strings; reference
# api_connector.py:289-291). Casts to OHLCV happen in sources/rest_klines.py.
RAW_KLINES = T.StructType(
    [
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("open", T.StringType(), True),
        T.StructField("high", T.StringType(), True),
        T.StructField("low", T.StringType(), True),
        T.StructField("close", T.StringType(), True),
        T.StructField("volume", T.StringType(), True),
        T.StructField("close_time", T.LongType(), True),
        T.StructField("quote_asset_volume", T.StringType(), True),
        T.StructField("number_of_trades", T.LongType(), True),
        T.StructField("taker_buy_base_asset_volume", T.StringType(), True),
        T.StructField("taker_buy_quote_asset_volume", T.StringType(), True),
        T.StructField("ignore", T.StringType(), True),
    ]
)

# Coverage metadata (reference ohlcv_metadata, database_handler.py:126-134) —
# computed as an aggregate in this engine, never stored separately.
COVERAGE = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("timeframe", T.StringType(), False),
        T.StructField("start_ts", T.TimestampType(), True),
        T.StructField("end_ts", T.TimestampType(), True),
    ]
)

# Multimodal blob column convention: opaque binary + typed metadata.
MULTIMODAL_BLOB = T.StructType(
    [
        T.StructField("blob_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("media_type", T.StringType(), True),  # MIME
        T.StructField("data", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)
