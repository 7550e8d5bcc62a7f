"""Structured Streaming formulation of the reference's incremental contract.

The reference encodes three incremental semantics (SURVEY.md §2a streaming
table): a resumable cursor scan (api_connector.py:244-268), a 2-bar
processing-time staleness bound (database_handler.py:291-295 — a poor man's
watermark), and idempotent re-ingestion via PK replace
(database_handler.py:215-218). Their honest Spark-native forms:

- `streaming_ohlcv`: readStream -> event-time tumbling window aggregation
  with a watermark of 2 bar durations (the reference's freshness constant);
  append mode emits only finalized bars — exactly the "bar is current"
  semantics the staleness check approximated.
- `streaming_dedup`: dropDuplicatesWithinWatermark on the series key — the
  streaming equivalent of INSERT OR REPLACE idempotency for at-least-once
  sources.

Aggregations use the struct-ordering min/max trick (min(struct(ts, price)))
rather than min_by/max_by so the plan stays inside streaming-supported
aggregates across Spark versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from binance_data_framework_spark.functions.timeframes import (
    TIMEFRAME_MS,
    WINDOW_DURATION,
)


def streaming_ohlcv(
    stream: DataFrame,
    timeframe: str = "1h",
    price_col: str = "price",
    ts_col: str = "ts",
    key_col: str = "symbol",
    watermark_bars: int = 2,
    volume_col: str | None = None,
) -> DataFrame:
    """Tick stream -> finalized OHLCV bars (append mode).

    Watermark = `watermark_bars` bar durations (reference freshness bound).
    State per key is one window's partial aggregate; windows close and emit
    once the watermark passes their end — bounded state at any scale.

    ``volume_col``: pass the real trade-size column when the stream carries
    one; the default sums the price column — a fixture-only proxy, the same
    knob and caveat as the batch `resample_ohlcv` (operators/ohlcv.py).
    """
    if timeframe not in WINDOW_DURATION:
        raise ValueError(f"streaming resample supports fixed timeframes, got {timeframe!r}")
    wm_ms = watermark_bars * TIMEFRAME_MS[timeframe]
    ts, px = F.col(ts_col), F.col(price_col)
    vol = F.col(volume_col) if volume_col is not None else px
    agg = (
        stream.withWatermark(ts_col, f"{wm_ms // 1000} seconds")
        .groupBy(F.col(key_col).alias("symbol"), F.window(ts, WINDOW_DURATION[timeframe]))
        .agg(
            F.min(F.struct(ts, px)).alias("_first"),
            F.max(px).alias("high"),
            F.min(px).alias("low"),
            F.max(F.struct(ts, px)).alias("_last"),
            F.sum(vol).alias("volume"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )
    return agg.select(
        "symbol",
        F.col("window.start").alias("bucket"),
        F.col(f"_first.{price_col}").alias("open"),
        "high",
        "low",
        F.col(f"_last.{price_col}").alias("close"),
        "volume",
        "n_ticks",
    )


def streaming_sma(
    bars: DataFrame,
    window: int = 20,
    key_col: str = "symbol",
    ts_col: str = "bucket",
    close_col: str = "close",
) -> DataFrame:
    """Custom stateful operator via `applyInPandasWithState`: trailing
    `window`-bar SMA over a bar stream (the incremental form of the engine's
    flagship `window_sma`, README.md:106 of the reference).

    State per key is ONE fixed-size tail of the last `window` closes — O(1)
    memory per symbol at any stream length; emits one row per input bar with
    the SMA once `window` bars have arrived (matching the batch operator's
    `count >= window` null semantics). The whole micro-batch is concatenated
    and sorted ONCE before the kernel runs — a group larger than the Arrow
    batch size arrives as several chunks, and sorting chunks independently
    would feed the trailing window out of order. The kernel itself is a
    vectorized pandas rolling mean over carried-state + batch (no Python
    per-row loop). Cross-batch order is the source's responsibility
    (file/kafka sources deliver per-key append order here).
    """
    import pandas as pd

    out_schema = f"{key_col} string, {ts_col} timestamp, {close_col} double, sma double"
    state_schema = "closes array<double>"

    def fn(key, pdfs, state):
        carried: list[float] = list(state.get[0]) if state.exists else []
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            state.update((carried,))
            yield pd.DataFrame(columns=[key_col, ts_col, close_col, "sma"])
            return
        pdf = (
            pd.concat(chunks, ignore_index=True)
            .sort_values(ts_col)
            .reset_index(drop=True)
        )
        closes = pdf[close_col].astype("float64")
        allc = pd.concat(
            [pd.Series(carried, dtype="float64"), closes], ignore_index=True
        )
        sma = (
            allc.rolling(window, min_periods=window)
            .mean()
            .iloc[len(carried):]
            .reset_index(drop=True)
        )
        state.update((allc.iloc[-window:].tolist(),))
        yield pd.DataFrame(
            {
                key_col: key[0],
                ts_col: pdf[ts_col],
                close_col: closes,
                "sma": sma,
            }
        )

    return bars.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", "NoTimeout"
    )


def stream_to_store(
    bars: DataFrame,
    store,
    symbol: str,
    timeframe: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    ts_col: str = "ts",
):
    """Streaming upsert sink: each micro-batch runs the store's
    precedence-aware dedup-merge (`OhlcvStore.save_data` — the same kernel as
    batch INSERT OR REPLACE), so re-delivered bars are idempotent end to end.
    foreachBatch is the canonical Spark shape for upsert sinks (no built-in
    streaming MERGE target); the checkpoint gives exactly-once batch
    boundaries on top of save_data's idempotency.

    ``ts_col``: the bar-time column name — pass "bucket" to compose directly
    with `streaming_ohlcv`'s output (which labels bars by window start)."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.save_data(
            batch_df.select(
                F.col(ts_col).alias("ts"), "open", "high", "low", "close", "volume"
            ),
            symbol,
            timeframe,
        )

    writer = bars.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_sessionize(
    stream: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Event streams -> finalized sessions via a native session window (the
    streaming form of the batch `sessionize` query: 30-min inactivity gap,
    registry.py q_sessionize). `session_window` merges events whose gaps
    stay under `gap` into one growing window per key; a session closes and
    emits exactly once when the watermark passes its end — which is the
    fixpoint the batch lag+running-sum formulation computes after the fact.
    State per key is one open session (start, end, partial agg), bounded by
    key cardinality, and expires with the watermark at any scale."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_asof(
    ticks: DataFrame,
    quotes: DataFrame,
    tolerance: str = "1 hour",
    watermark: str = "2 hours",
    key_col: str = "symbol",
    ts_col: str = "ts",
    quote_ts_col: str = "qts",
    quote_val_col: str = "qval",
    how: str = "left_outer",
) -> DataFrame:
    """Watermarked streaming as-of join: each tick gets the latest quote at
    or before its timestamp, within `tolerance` (the streaming form of the
    batch `asof_align` operator, operators/asof.py).

    Two chained stateful operators (Spark >= 3.5 watermark propagation):
    (1) a stream-stream INTERVAL join — state on both sides is bounded by
    watermark + tolerance, the equi-key is the symbol so the join is
    hash-partitioned, never cross; (2) a (key, tick-ts) aggregation picking
    max_by(quote, quote_ts), finalized exactly once when the watermark
    passes the tick. A tick whose window is still open is withheld (append
    mode) — the streaming analogue of the batch operator's completeness.

    ``how='left_outer'`` (default) mirrors the batch asof_join: a tick with
    NO quote in tolerance still emits, with null quote/quote_ts, once the
    watermark proves no match can arrive — an inner join would silently
    drop such ticks (e.g. a quote feed outage makes ticks vanish
    downstream). Pass 'inner' for matched-only output."""
    t = ticks.withWatermark(ts_col, watermark).alias("t")
    q = quotes.withWatermark(quote_ts_col, watermark).alias("q")
    j = t.join(
        q,
        (F.col(f"t.{key_col}") == F.col(f"q.{key_col}"))
        & (F.col(f"q.{quote_ts_col}") <= F.col(f"t.{ts_col}"))
        & (
            F.col(f"q.{quote_ts_col}")
            >= F.col(f"t.{ts_col}") - F.expr(f"INTERVAL {tolerance}")
        ),
        how,
    ).select(
        F.col(f"t.{key_col}").alias(key_col), ts_col, quote_ts_col, quote_val_col
    )
    return j.groupBy(key_col, ts_col).agg(
        F.max_by(quote_val_col, quote_ts_col).alias("quote"),
        F.max(quote_ts_col).alias("quote_ts"),
    )


def streaming_dedup(
    stream: DataFrame,
    keys: tuple[str, ...] = ("ts", "symbol", "timeframe"),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """At-least-once stream -> effectively-once rows on the series key
    (streaming INSERT OR REPLACE; state expires with the watermark)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
