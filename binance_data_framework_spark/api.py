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

from datetime import datetime, timezone

from pyspark.sql import DataFrame

from binance_data_framework_spark.operators.ohlcv import resample_bars
from binance_data_framework_spark.sources.rest_klines import PagedKlineSource
from binance_data_framework_spark.store import OhlcvStore


def _utc_ms(d: datetime) -> int:
    """Epoch ms with naive datetimes pinned to UTC (engine convention —
    naive .timestamp() would shift with the process-local timezone)."""
    if d.tzinfo is None:
        d = d.replace(tzinfo=timezone.utc)
    return int(d.timestamp() * 1000)


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
                self.store.spark, symbol, timeframe, _utc_ms(start), _utc_ms(end)
            )
            if fetched.limit(1).count() > 0:
                self.store.save_data(fetched, symbol, timeframe)
        return self.store.get_data(symbol, timeframe, start, end)

    def load_incremental(
        self,
        symbol: str,
        timeframe: str,
        start: datetime,
        end: datetime,
    ) -> DataFrame:
        """Gap-driven incremental fill — the design the reference planned but
        never implemented (plan.md:79-80; its actual behavior refetches the
        WHOLE range on any partial miss, colab_interface.py:362-372).

        Expected bar timeline = sequence(start, end, bar) exploded (bars, not
        ticks — bounded rows); anti-join against stored timestamps; collapse
        missing bars into contiguous ranges (lag + running-sum sessionize on
        the gap timeline). Only the RANGES reach the driver — that is fetch
        orchestration (one REST call per hole), not data."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from binance_data_framework_spark.functions.timeframes import TIMEFRAME_MS

        _validate_request(symbol, start, end)
        bar_ms = TIMEFRAME_MS[timeframe]
        spark = self.store.spark
        stored = self.store.get_data(symbol, timeframe, start, end).select("ts")
        expected = spark.sql(
            f"SELECT explode(sequence(timestamp_millis({_utc_ms(start)}), "
            f"timestamp_millis({_utc_ms(end)}), "
            f"INTERVAL {bar_ms // 1000} SECONDS)) AS ts"
        )
        missing = expected.join(stored, on="ts", how="left_anti")
        w = Window.orderBy("ts")  # gap timeline: bounded by missing BARS
        gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
        ranges = (
            missing.withColumn(
                "_new", F.when(gap.isNull() | (gap > bar_ms // 1000), 1).otherwise(0)
            )
            .withColumn(
                "_rid", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
            )
            .groupBy("_rid")
            .agg(F.min("ts").alias("r_start"), F.max("ts").alias("r_end"))
            .collect()
        )
        for r in ranges:
            fetched = self.source.to_ohlcv(
                spark, symbol, timeframe, _utc_ms(r["r_start"]), _utc_ms(r["r_end"])
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
