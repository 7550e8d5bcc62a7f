"""Cache-or-fetch orchestration: the reference's core kernel as a facade.

Reproduces `_get_data` / `_get_resampled_data` (reference
colab_interface.py:343-434) over the Spark-native store + source:

  check_data_exists -> (hit) pushed-down range scan
                    -> (miss) paginated fetch -> upsert -> range scan

plus the resample mode that forces a 1m base series and derives the target
timeframe from bars (colab_interface.py:374-434). Orchestration is
driver-side control flow (it decides *which* plans to run); all data work is
lazy DataFrame plans.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame

from binance_data_framework_spark.operators.ohlcv import resample_bars
from binance_data_framework_spark.sources.rest_klines import PagedKlineSource
from binance_data_framework_spark.store import OhlcvStore


def _validate_request(symbol: str, start: datetime, end: datetime) -> None:
    """API-layer input validation, raised before any plan is built
    (reference validate_nonempty, database_handler.py:204-207;
    validate_daterange, colab_interface.py:222-225)."""
    if not symbol or not symbol.strip():
        raise ValueError("symbol must be a non-empty string")
    if end < start:
        raise ValueError(f"end date {end} precedes start date {start}")


class CacheOrFetchLoader:
    def __init__(self, store: OhlcvStore, source: PagedKlineSource):
        self.store = store
        self.source = source

    def load(
        self,
        symbol: str,
        timeframe: str,
        start: datetime,
        end: datetime,
        now: datetime | None = None,
    ) -> DataFrame:
        """The cache-or-fetch kernel (colab_interface.py:343-372). A miss
        refetches the whole requested range (reference behavior); the
        gap-antijoin incremental fill is available via operators.coverage."""
        _validate_request(symbol, start, end)
        covered, _ = self.store.check_data_exists(symbol, timeframe, start, end, now=now)
        if not covered:
            fetched = self.source.to_ohlcv(
                self.store.spark,
                symbol,
                timeframe,
                int(start.timestamp() * 1000),
                int(end.timestamp() * 1000),
            )
            if fetched.limit(1).count() > 0:
                self.store.save_data(fetched, symbol, timeframe)
        return self.store.get_data(symbol, timeframe, start, end)

    def load_resampled(
        self,
        symbol: str,
        target_timeframe: str,
        start: datetime,
        end: datetime,
        base_timeframe: str = "1m",
        now: datetime | None = None,
    ) -> DataFrame:
        """Resample mode (colab_interface.py:374-434): load the base series
        through the cache kernel, then derive target bars from base bars."""
        from pyspark.sql import functions as F

        base = self.load(symbol, base_timeframe, start, end, now=now)
        bars = base.select(
            "symbol",
            base["ts"].alias("bucket"),
            "open",
            "high",
            "low",
            "close",
            "volume",
            F.lit(1).cast("long").alias("n_ticks"),
        )
        out = resample_bars(bars, target_timeframe)
        return out.drop("n_ticks").na.drop(subset=["open", "close"])
