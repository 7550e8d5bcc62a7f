"""Spark Python Data Source for paginated klines: executor-parallel ingest.

``spark.read.format("binance_klines")`` — the idiomatic Spark-4 form of the
reference's REST scan (BinanceUSClient.get_historical_klines,
api_connector.py:208-321). Where the reference (and the driver-side
PagedKlineSource loop) fetches one page at a time in one process, this
source splits the requested time range into fixed-bar-count chunks, one
``InputPartition`` each, and every EXECUTOR task pages its own slice — the
actual 100 TB ingest shape: a 10-year 1m backfill becomes ~105 independent
50k-bar partitions fetched in parallel, bounded by
``spark.sql.shuffle.partitions``-style task concurrency rather than one
serial cursor.

Rate limiting: per-partition pacing (0.1 s/page) is preserved inside each
task; the aggregate request rate = pacing x concurrent tasks, so the
cluster-level rate-limit knob is task concurrency (``chunk_bars`` and
executor slots), not code. The 60 s backoff still applies per task.

Options (lowercase, per the DataSource options contract):
  symbol (required), interval (default 1h), start_ms / end_ms (required,
  epoch ms), chunk_bars (default 50_000), mode: http | fixture (default
  http; fixture generates deterministic synthetic bars for tests — no
  network, same partition/grid logic), base_url.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = (
    "ts timestamp, open double, high double, low double, close double, "
    "volume double, symbol string, timeframe string"
)


class KlineSlice(InputPartition):
    def __init__(self, start_ms: int, end_ms: int):
        self.start_ms = start_ms
        self.end_ms = end_ms


class BinanceKlinesDataSource(DataSource):
    """format("binance_klines") — register with
    ``spark.dataSource.register(BinanceKlinesDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "binance_klines"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "KlineReader":
        return KlineReader(self.options)

    def simpleStreamReader(self, schema) -> "KlineStreamReader":
        return KlineStreamReader(self.options)


class KlineReader(DataSourceReader):
    def __init__(self, options: dict):
        from binance_data_framework_spark.functions.timeframes import TIMEFRAME_MS

        self.symbol = options["symbol"]
        self.interval = options.get("interval", "1h")
        if self.interval not in TIMEFRAME_MS:
            raise ValueError(f"unknown interval {self.interval!r}")
        self.bar_ms = TIMEFRAME_MS[self.interval]
        self.start_ms = int(options["start_ms"])
        self.end_ms = int(options["end_ms"])
        self.chunk_bars = int(options.get("chunk_bars", 50_000))
        self.mode = options.get("mode", "http")
        self.base_url = options.get("base_url")

    def partitions(self):
        from binance_data_framework_spark.functions.timeframes import (
            snap_down_ms,
            snap_up_ms,
        )

        # snap to the bucket grid (cf. api.load_incremental), then slice into
        # chunk_bars-sized, non-overlapping [start, end] ms windows
        lo = snap_up_ms(self.start_ms, self.bar_ms)
        hi = snap_down_ms(self.end_ms, self.bar_ms)
        if hi < lo:
            return [KlineSlice(self.start_ms, self.start_ms - 1)]  # empty slice
        chunk_ms = self.bar_ms * self.chunk_bars
        return [
            KlineSlice(s, min(s + chunk_ms - 1, hi))
            for s in range(lo, hi + 1, chunk_ms)
        ]

    def read(self, partition: KlineSlice):
        # runs on an EXECUTOR: this task pages only its own time slice
        if partition.end_ms < partition.start_ms:
            return
        if self.mode == "fixture":
            yield from self._read_fixture(partition)
        else:
            yield from self._read_http(partition)

    def _read_fixture(self, p: KlineSlice):
        """Deterministic synthetic bars — pure f(timestamp): the bar index
        is the ABSOLUTE bucket index (ms // bar_ms), so any partitioning,
        any reader start offset, and any batch/stream split of a range
        yields identical bars for identical timestamps. (Pre-fix, i was
        relative to the reader's start_ms: each streaming micro-batch — a
        fresh reader whose start is the batch offset — restarted the value
        pattern, so stream-ingested fixture bars disagreed with a batch
        read of the same range.)"""
        for ms in range(p.start_ms, p.end_ms + 1, self.bar_ms):
            i = ms // self.bar_ms
            base = 100.0 + (i % 50)
            yield (
                datetime.fromtimestamp(ms / 1000, tz=timezone.utc),
                base,
                base + 1.0,
                base - 1.0,
                base + 0.5,
                10.0 + i % 7,
                self.symbol,
                self.interval,
            )

    def _read_http(self, p: KlineSlice):
        from binance_data_framework_spark.sources.rest_klines import (
            PagedKlineSource,
            http_fetch_page,
        )

        kwargs = {"base_url": self.base_url} if self.base_url else {}
        src = PagedKlineSource(
            http_fetch_page(**kwargs), page_size=1000, pacing_s=0.1, backoff_s=60.0
        )
        for row in src.fetch_range(self.symbol, self.interval, p.start_ms, p.end_ms):
            yield (
                datetime.fromtimestamp(int(row[0]) / 1000, tz=timezone.utc),
                float(row[1]),
                float(row[2]),
                float(row[3]),
                float(row[4]),
                float(row[5]),
                self.symbol,
                self.interval,
            )


class KlineStreamReader(SimpleDataSourceStreamReader):
    """Live-tail polling: ``spark.readStream.format("binance_klines")``.

    The offset is the next unread bucket timestamp (the same resume cursor
    as the reference's paginated scan: last row ts + 1 bar,
    api_connector.py:266). Each micro-batch reads at most
    ``bars_per_batch`` finalized bars in [offset, min(now, end_ms)] — the
    completed-tail contract: a bucket is emitted only once its close time
    has passed, so re-reads are impossible and the downstream upsert sink
    (streaming/incremental.stream_to_store) stays idempotent.

    Extra options: bars_per_batch (default 1000); fixture mode uses end_ms
    as "now" so tests are deterministic and network-free.
    """

    def __init__(self, options: dict):
        from binance_data_framework_spark.functions.timeframes import TIMEFRAME_MS

        self.symbol = options["symbol"]
        self.interval = options.get("interval", "1h")
        if self.interval not in TIMEFRAME_MS:  # same contract as KlineReader
            raise ValueError(f"unknown interval {self.interval!r}")
        self.bar_ms = TIMEFRAME_MS[self.interval]
        self.start_ms = int(options["start_ms"])
        self.end_ms = int(options["end_ms"]) if "end_ms" in options else None
        self.bars_per_batch = int(options.get("bars_per_batch", 1000))
        self.mode = options.get("mode", "http")
        self.base_url = options.get("base_url")

    def initialOffset(self) -> dict:
        from binance_data_framework_spark.functions.timeframes import snap_up_ms

        return {"next_ms": snap_up_ms(self.start_ms, self.bar_ms)}

    def _wall_now_ms(self) -> int:
        """Wall-clock 'now' driving bucket FINALIZATION (fixture mode uses
        end_ms as the deterministic stand-in). Deliberately NOT clamped to
        end_ms: finalization asks whether a bucket has closed in real time,
        while end_ms bounds WHICH buckets are in range — clamping conflated
        the two, so a bounded stream's final bucket (closed long ago by
        real now) could never satisfy 'now >= close + one bar' and was
        never emitted, permanently reading one bar fewer than a batch load
        of identical options."""
        if self.mode == "fixture":
            assert self.end_ms is not None, "fixture mode needs end_ms"
            return self.end_ms
        return int(datetime.now(timezone.utc).timestamp() * 1000)

    def read(self, start: dict):
        from binance_data_framework_spark.functions.timeframes import snap_down_ms

        lo = int(start["next_ms"])
        # only FINALIZED bars: bucket + bar must have fully elapsed...
        hi_closed = snap_down_ms(self._wall_now_ms(), self.bar_ms) - self.bar_ms
        if self.end_ms is not None:
            # ...and the range cap is batch parity: the last grid point
            # <= end_ms IS emitted once it closes
            hi_closed = min(hi_closed, snap_down_ms(self.end_ms, self.bar_ms))
        hi = min(hi_closed, lo + (self.bars_per_batch - 1) * self.bar_ms)
        if hi < lo:
            return iter([]), start
        # materialized, not a generator: the prefetch cache copy.copy()s
        # the iterator; a micro-batch is bounded by bars_per_batch anyway
        batch = KlineSlice(lo, hi + self.bar_ms - 1)
        reader = KlineReader(
            {
                "symbol": self.symbol,
                "interval": self.interval,
                "start_ms": str(lo),
                "end_ms": str(hi),
                "mode": self.mode,
                **({"base_url": self.base_url} if self.base_url else {}),
            }
        )
        return iter(list(reader.read(batch))), {"next_ms": hi + self.bar_ms}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay for recovery: deterministic by construction (grid + fetch)
        lo, nxt = int(start["next_ms"]), int(end["next_ms"])
        if nxt <= lo:
            return iter([])
        reader = KlineReader(
            {
                "symbol": self.symbol,
                "interval": self.interval,
                "start_ms": str(lo),
                "end_ms": str(nxt - self.bar_ms),
                "mode": self.mode,
                **({"base_url": self.base_url} if self.base_url else {}),
            }
        )
        return iter(list(reader.read(KlineSlice(lo, nxt - 1))))


def read_klines_many(
    spark,
    symbols: list[str],
    interval: str,
    start_ms: int,
    end_ms: int,
    chunk_bars: int = 50_000,
    mode: str = "http",
    base_url: str | None = None,
):
    """Multi-symbol backfill as ONE Spark job: a union of per-symbol
    `binance_klines` reads, so the input partitions of EVERY symbol's time
    chunks schedule together on the executors — a 50-symbol x multi-year
    backfill is (symbols x chunks) parallel fetch tasks in a single job,
    bounded only by task slots, vs the reference's strictly sequential
    per-symbol loop (colab_interface.py:228-243). Complements
    api.load_many, which parallelizes driver-side cache-or-fetch kernels
    (coverage probe + upsert per symbol): this is the raw-ingest path when
    you KNOW you want the whole range fetched.

    Call ``spark.dataSource.register(BinanceKlinesDataSource)`` once per
    session first. Returns the union DataFrame (ts, open, high, low,
    close, volume, symbol, timeframe).
    """
    from functools import reduce

    if not symbols:
        raise ValueError("symbols must be a non-empty list")
    reads = []
    for sym in symbols:
        r = (
            spark.read.format("binance_klines")
            .option("symbol", sym)
            .option("interval", interval)
            .option("start_ms", str(start_ms))
            .option("end_ms", str(end_ms))
            .option("chunk_bars", str(chunk_bars))
            .option("mode", mode)
        )
        if base_url:
            r = r.option("base_url", base_url)
        reads.append(r.load())
    return reduce(lambda a, b: a.unionByName(b), reads)
