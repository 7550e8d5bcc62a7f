"""Time-series operators: OHLCV resample (the flagship) and rolling analytics.

Reference semantics: pandas ``resample(rule).agg(open='first', high='max',
low='min', close='last', volume='sum')`` then ``dropna`` — the flagship
operator at colab_interface.py:374-434 (agg 417-426, rule map 436-465), and
the documented 20-bar SMA analysis pattern (README.md:106).

Spark-first translation:
- one ``groupBy(key, bucket).agg(...)`` = a single hash-aggregate pass with
  map-side partial aggregation (the reference runs 5 separate resample passes);
- time-order-correct first/last via ``min_by``/``max_by`` — plain
  ``first()/last()`` are shuffle-order-nondeterministic in Spark and would be
  silently wrong;
- fixed-duration frames use ``window(ts, dur)`` (tumbling); calendar frames
  ('1w','1M') use ``date_trunc`` so bucket labels match pandas' calendar
  alignment;
- empty buckets simply don't exist in groupBy output (pandas materializes then
  drops them) — same result, no wasted rows.

At 100 TB: the aggregation shuffles once on (key, bucket); partial aggregation
collapses each map partition to ~(n_symbols x n_buckets_per_partition) rows
before the exchange, so shuffle volume is bounded by output cardinality, not
input rows. No collect, no UDF, whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from binance_data_framework_spark.functions.timeframes import (
    CALENDAR_TFS,
    WINDOW_DURATION,
)


def bucket_col(ts_col: Column, timeframe: str) -> Column:
    """Left-edge bucket label for a timeframe (matches pandas resample labels).

    Fixed frames: ``window(ts, dur).start``. Calendar frames: ``date_trunc``.
    Both are builtin expressions — pruned/pushed/codegen'd by Catalyst.
    """
    if timeframe in CALENDAR_TFS:
        unit = "week" if timeframe == "1w" else "month"
        return F.date_trunc(unit, ts_col)
    if timeframe not in WINDOW_DURATION:
        raise ValueError(f"unsupported timeframe: {timeframe!r}")
    return F.window(ts_col, WINDOW_DURATION[timeframe])["start"]


def resample_ohlcv(
    df: DataFrame,
    timeframe: str,
    price_col: str = "price",
    ts_col: str = "ts",
    key_col: str = "symbol",
    volume_col: str | None = None,
) -> DataFrame:
    """Tick/bar stream -> OHLCV bars at `timeframe`.

    ``volume_col=None`` sums the price column as volume proxy (fixture
    convention, FIXTURES.md); pass a real volume column when present.
    """
    vol = volume_col or price_col
    ts, px = F.col(ts_col), F.col(price_col)
    return (
        df.groupBy(
            F.col(key_col).alias("symbol"),
            bucket_col(ts, timeframe).alias("bucket"),
        )
        .agg(
            F.min_by(px, ts).alias("open"),
            F.max(px).alias("high"),
            F.min(px).alias("low"),
            F.max_by(px, ts).alias("close"),
            F.sum(F.col(vol)).alias("volume"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )


def resample_bars(
    bars: DataFrame,
    timeframe: str,
    ts_col: str = "bucket",
    key_col: str = "symbol",
) -> DataFrame:
    """OHLCV bars -> coarser OHLCV bars (e.g. 1m -> 1h), preserving
    open=first/close=last by bar time. This is the reference's
    resample-from-minimum-timeframe mode (plan.md:86-97)."""
    ts = F.col(ts_col)
    return (
        bars.groupBy(
            F.col(key_col).alias("symbol"),
            bucket_col(ts, timeframe).alias("bucket"),
        )
        .agg(
            F.min_by("open", ts).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", ts).alias("close"),
            F.sum("volume").alias("volume"),
            F.sum("n_ticks").alias("n_ticks"),
        )
    )


def downsample_m4(
    bars: DataFrame,
    n_buckets: int = 64,
    value_col: str = "close",
    ts_col: str = "bucket",
    key_col: str = "symbol",
) -> DataFrame:
    """M4 chart downsampling (Jugel et al., VLDB 2014): per series, split
    [min ts, max ts] into n_buckets equal-width pixel columns and keep the
    first, last, min, and max value of each — the aggregate set that makes
    an n_buckets-pixel-wide line chart of ANY series length pixel-identical
    to plotting every row. This is the engine-side reduction behind the
    reference's notebook plotting surface (colab_interface.py:467-499):
    rendering stays client-side, but billions of rows become 4*n_buckets
    points in one distributed pass.

    Plan shape: per-series bounds aggregate (ONE ROW per series) broadcast
    back, then one groupBy(key, pixel) — a narrow scan plus one shuffle
    whose output is n_series * n_buckets rows. Pixel assignment is pure
    int64 arithmetic (epoch-micros delta * n_buckets integer-div span):
    deterministic, engine-portable, no double rounding at the bucket edge.
    """
    ts = F.col(ts_col)
    bounds = bars.groupBy(key_col).agg(
        F.min(F.unix_micros(ts)).alias("_lo"),
        F.max(F.unix_micros(ts)).alias("_hi"),
    )
    pixel = (
        F.when(
            F.col("_hi") > F.col("_lo"),
            F.least(
                F.lit(n_buckets - 1).cast("long"),
                F.expr(f"(_us - _lo) * {n_buckets} div (_hi - _lo)"),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int")
    )
    v = F.col(value_col)
    return (
        bars.join(F.broadcast(bounds), key_col)
        .withColumn("_us", F.unix_micros(ts))
        .groupBy(F.col(key_col).alias("symbol"), pixel.alias("pixel"))
        .agg(
            F.min_by(v, ts).alias("v_first"),
            F.min(v).alias("v_min"),
            F.max(v).alias("v_max"),
            F.max_by(v, ts).alias("v_last"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def trend_slope(
    bars: DataFrame,
    value_col: str = "close",
    ts_col: str = "bucket",
    key_col: str = "symbol",
) -> DataFrame:
    """Per-series OLS trend: slope/intercept of value over time (seconds),
    entirely as builtin aggregates — slope = covar_samp(x,y)/var_samp(x) —
    one hash-agg pass with map-side partials, no UDF, no collect. The
    multi-series generalization of the reference's pandas analysis tier."""
    x = F.unix_timestamp(F.col(ts_col)).cast("double")
    y = F.col(value_col)
    return (
        bars.groupBy(F.col(key_col).alias("symbol"))
        .agg(
            (F.covar_samp(x, y) / F.var_samp(x)).alias("_slope"),
            F.avg(y).alias("_my"),
            F.avg(x).alias("_mx"),
            F.count(F.lit(1)).alias("n_bars"),
        )
        .select(
            "symbol",
            F.round("_slope", 6).alias("slope"),
            F.round(F.col("_my") - F.col("_slope") * F.col("_mx"), 6).alias("intercept"),
            "n_bars",
        )
    )


def pair_correlation(
    bars: DataFrame,
    value_col: str = "close",
    ts_col: str = "bucket",
    key_col: str = "symbol",
) -> DataFrame:
    """Pairwise Pearson correlation of per-bucket values between all symbol
    pairs (a < b): equi-join the series on the time bucket (shuffle keyed by
    bucket — co-partitioned, no cross product over rows), then one corr()
    aggregate per pair. At 100 TB the join key is the bar bucket, so volume
    is bars not ticks; n_symbols² output stays tiny."""
    a = bars.select(
        F.col(key_col).alias("sym_a"), F.col(ts_col).alias("_b"), F.col(value_col).alias("_va")
    )
    b = bars.select(
        F.col(key_col).alias("sym_b"), F.col(ts_col).alias("_b"), F.col(value_col).alias("_vb")
    )
    return (
        a.join(b, on="_b")
        .where(F.col("sym_a") < F.col("sym_b"))
        .groupBy("sym_a", "sym_b")
        .agg(
            F.round(F.corr("_va", "_vb"), 6).alias("corr"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
    )


def vwap(
    df: DataFrame,
    timeframe: str,
    price_col: str = "price",
    volume_col: str = "volume",
    ts_col: str = "ts",
    key_col: str = "symbol",
) -> DataFrame:
    """Volume-weighted average price per bucket: sum(p*v)/sum(v) in the same
    single-pass hash aggregation as the OHLCV resample."""
    ts = F.col(ts_col)
    pv = F.col(price_col) * F.col(volume_col)
    return (
        df.groupBy(
            F.col(key_col).alias("symbol"),
            bucket_col(ts, timeframe).alias("bucket"),
        )
        .agg(
            (F.sum(pv) / F.sum(volume_col)).alias("_vwap"),
            F.sum(volume_col).alias("volume"),
        )
        .select(
            "symbol",
            "bucket",
            F.round("_vwap", 4).alias("vwap"),
            F.round("volume", 6).alias("volume"),
        )
    )


def with_ewma(
    bars: DataFrame,
    alpha: float = 0.2,
    value_col: str = "close",
    ts_col: str = "bucket",
    key_col: str = "symbol",
) -> DataFrame:
    """Exponentially-weighted moving average per series via grouped
    `applyInPandas` — EWMA is ORDER-RECURSIVE (each value depends on the
    full prior prefix), which no builtin window frame expresses; this is the
    legitimate per-group Pandas case (vs per-row pandas_udf / mapInPandas).
    One shuffle keyed by the series; each group sorts and runs the vectorized
    pandas ewm kernel locally. Matches pandas `ewm(alpha, adjust=False)`."""
    import pandas as pd

    schema = f"{key_col} string, {ts_col} timestamp, {value_col} double, ewma double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        pdf["ewma"] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean().round(6)
        return pdf[[key_col, ts_col, value_col, "ewma"]]

    return bars.select(key_col, ts_col, value_col).groupBy(key_col).applyInPandas(
        fn, schema
    )


def with_macd(
    bars: DataFrame,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    value_col: str = "close",
    ts_col: str = "bucket",
    key_col: str = "symbol",
) -> DataFrame:
    """MACD per series: EMA(fast) − EMA(slow), a signal EMA over the MACD
    line, and the histogram — three chained ORDER-RECURSIVE EWMAs, the same
    legitimate grouped-applyInPandas case as with_ewma/with_rsi (one
    series-keyed shuffle, vectorized pandas ewm kernels per group; pandas
    ``adjust=False`` semantics, each EMA seeded at its series' first
    input). Rounding happens once at the end; the signal line chains off
    the UNROUNDED MACD so the recurrence matches the oracle's double
    arithmetic exactly."""
    import pandas as pd

    schema = (
        f"{key_col} string, {ts_col} timestamp, {value_col} double, "
        "macd double, signal double, histogram double"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        ef = pdf[value_col].ewm(span=fast, adjust=False).mean()
        es = pdf[value_col].ewm(span=slow, adjust=False).mean()
        macd = ef - es
        sig = macd.ewm(span=signal, adjust=False).mean()
        out = pdf[[key_col, ts_col, value_col]].copy()
        out["macd"] = macd.round(6)
        out["signal"] = sig.round(6)
        out["histogram"] = (macd - sig).round(6)
        return out

    return bars.select(key_col, ts_col, value_col).groupBy(key_col).applyInPandas(
        fn, schema
    )


def with_heikin_ashi(
    bars: DataFrame,
    ts_col: str = "bucket",
    key_col: str = "symbol",
) -> DataFrame:
    """Heikin-Ashi candles per series. ha_close is a per-row projection
    ((o+h+l+c)/4), but ha_open is ORDER-RECURSIVE:
    ha_open_t = (ha_open_{t-1} + ha_close_{t-1})/2 — which is exactly an
    alpha=1/2 adjust=False EWMA over the ha_close series SHIFTED one bar
    (seeded with (open_1+close_1)/2), so the grouped-applyInPandas kernel
    stays a vectorized pandas ewm, no Python loop. ha_high/ha_low are
    per-row max/min over {high, ha_open, ha_close}."""
    import pandas as pd

    schema = (
        f"{key_col} string, {ts_col} timestamp, "
        "ha_open double, ha_high double, ha_low double, ha_close double"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        hc = (pdf["open"] + pdf["high"] + pdf["low"] + pdf["close"]) / 4.0
        seed = (pdf["open"].iloc[0] + pdf["close"].iloc[0]) / 2.0
        shifted = hc.shift(1)
        shifted.iloc[0] = seed
        ho = shifted.ewm(alpha=0.5, adjust=False).mean()
        out = pdf[[key_col, ts_col]].copy()
        out["ha_open"] = ho
        out["ha_high"] = pd.concat([pdf["high"], ho, hc], axis=1).max(axis=1)
        out["ha_low"] = pd.concat([pdf["low"], ho, hc], axis=1).min(axis=1)
        out["ha_close"] = hc
        return out

    # Round JVM-side, NOT in the pandas kernel: the dyadic alpha makes
    # ha values exact binary fractions, so round-half TIES at 6 dp are
    # common — pandas rounds half-to-even, Spark's F.round and DuckDB's
    # round() both round half away from zero. (The other applyInPandas
    # kernels round in pandas safely only because their values are
    # non-dyadic and ties are measure-zero.)
    raw = (
        bars.select(key_col, ts_col, "open", "high", "low", "close")
        .groupBy(key_col)
        .applyInPandas(fn, schema)
    )
    return raw.select(
        key_col,
        ts_col,
        *[F.round(c, 6).alias(c) for c in ("ha_open", "ha_high", "ha_low", "ha_close")],
    )


def with_atr(
    bars: DataFrame,
    n: int = 14,
    ts_col: str = "bucket",
    key_col: str = "symbol",
) -> DataFrame:
    """Average True Range per series: TR_t = max(h−l, |h−c_{t-1}|,
    |l−c_{t-1}|) (TR_1 = h_1−l_1), smoothed by Wilder's alpha=1/n EWMA —
    order-recursive like RSI, same grouped-applyInPandas shape (ewm-from-
    first-TR convention, matching with_rsi's smoothing; the classic
    SMA-of-first-n seed variant differs only in warm-up). Rounding is
    JVM-side for engine-identical half-tie behavior."""
    import pandas as pd

    schema = (
        f"{key_col} string, {ts_col} timestamp, close double, "
        "tr double, atr double"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        pc = pdf["close"].shift(1)
        tr = pd.concat(
            [pdf["high"] - pdf["low"], (pdf["high"] - pc).abs(), (pdf["low"] - pc).abs()],
            axis=1,
        ).max(axis=1)
        out = pdf[[key_col, ts_col, "close"]].copy()
        out["tr"] = tr
        out["atr"] = tr.ewm(alpha=1.0 / n, adjust=False).mean()
        return out

    raw = (
        bars.select(key_col, ts_col, "high", "low", "close")
        .groupBy(key_col)
        .applyInPandas(fn, schema)
    )
    return raw.select(
        key_col, ts_col, "close",
        F.round("tr", 6).alias("tr"), F.round("atr", 6).alias("atr"),
    )


def with_rsi(
    bars: DataFrame,
    n: int = 14,
    value_col: str = "close",
    ts_col: str = "bucket",
    key_col: str = "symbol",
) -> DataFrame:
    """Relative Strength Index per series via grouped `applyInPandas` —
    Wilder's smoothing is ORDER-RECURSIVE (ewm with alpha=1/n over
    gains/losses), the same legitimate per-group Pandas case as with_ewma.
    One shuffle keyed by the series; vectorized pandas kernel per group.
    RSI is null until n+1 observations exist (standard warm-up)."""
    import pandas as pd

    schema = f"{key_col} string, {ts_col} timestamp, {value_col} double, rsi double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        delta = pdf[value_col].diff()
        gain = delta.clip(lower=0.0)
        loss = (-delta).clip(lower=0.0)
        avg_gain = gain.ewm(alpha=1.0 / n, adjust=False, min_periods=n + 1).mean()
        avg_loss = loss.ewm(alpha=1.0 / n, adjust=False, min_periods=n + 1).mean()
        rs = avg_gain / avg_loss
        rsi = 100.0 - 100.0 / (1.0 + rs)
        rsi = rsi.where(avg_loss != 0.0, 100.0)  # all-gain window pegs at 100
        pdf["rsi"] = rsi.where(avg_gain.notna() & avg_loss.notna()).round(6)
        return pdf[[key_col, ts_col, value_col, "rsi"]]

    return bars.select(key_col, ts_col, value_col).groupBy(key_col).applyInPandas(
        fn, schema
    )


def with_bollinger(
    bars: DataFrame,
    n: int = 20,
    k: float = 2.0,
    value_col: str = "close",
    ts_col: str = "bucket",
    key_col: str = "symbol",
) -> DataFrame:
    """Bollinger bands: trailing n-bar SMA ± k sample standard deviations —
    the canonical companion to the reference's documented SMA analysis
    (README.md:106). Same keyed ROWS frame as with_sma: one hash
    partitioning per series, windows computed locally, null warm-up until
    n bars exist."""
    w = Window.partitionBy(key_col).orderBy(ts_col).rowsBetween(-(n - 1), 0)
    cnt = F.count(value_col).over(w)
    mid = F.when(cnt >= n, F.avg(value_col).over(w))
    sd = F.when(cnt >= n, F.stddev_samp(value_col).over(w))
    return (
        bars.withColumn("bb_mid", mid)
        .withColumn("bb_upper", mid + k * sd)
        .withColumn("bb_lower", mid - k * sd)
    )


def with_sma(
    bars: DataFrame,
    n: int = 20,
    value_col: str = "close",
    ts_col: str = "bucket",
    key_col: str = "symbol",
    out_col: str | None = None,
) -> DataFrame:
    """Trailing n-bar simple moving average per series (README.md:106 pattern).

    ROWS frame [-(n-1), 0] partitioned by the series key — each partition's
    window is computed locally after a single hash partitioning; matches pandas
    ``rolling(n).mean()`` semantics including the null warm-up (rolling emits
    NaN until n observations exist).
    """
    out = out_col or f"sma{n}"
    w = Window.partitionBy(key_col).orderBy(ts_col).rowsBetween(-(n - 1), 0)
    cnt = F.count(value_col).over(w)
    return bars.withColumn(
        out, F.when(cnt >= n, F.avg(value_col).over(w)).otherwise(F.lit(None))
    )
