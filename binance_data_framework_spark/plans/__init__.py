from binance_data_framework_spark.plans.registry import QUERIES, ORACLES

__all__ = ["QUERIES", "ORACLES"]
