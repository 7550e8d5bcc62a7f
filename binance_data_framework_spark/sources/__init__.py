from binance_data_framework_spark.sources.fixtures import load_table, ohlcv_view

__all__ = ["load_table", "ohlcv_view"]
