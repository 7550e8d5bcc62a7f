"""CSV import into the store — the reverse of ``OhlcvStore.export(fmt='csv')``.

The reference's workflow round-trips series through one-file-per-series CSVs
(colab_interface.py:565-594 export; users re-load them with pandas). This
module closes that loop for the new engine: read a CSV (or a directory of
Spark-written part files), restate the OHLCV types explicitly — CSV carries
none — and feed each (symbol, timeframe) series through the store's ranged
dedup-upsert, so importing is idempotent and concurrent-reader-safe like any
other write.

Scale shape: the read is an ordinary distributed CSV scan (splittable,
executor-parallel); only the tiny distinct series list is collected to drive
the per-series upserts. Files exported WITHOUT symbol/timeframe columns
(bare OHLCV) are supported by passing the series key explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from binance_data_framework_spark.store import OhlcvStore

_VALUE_COLS = ("open", "high", "low", "close", "volume")


def read_ohlcv_csv(store: OhlcvStore, path: str) -> DataFrame:
    """Read an exported OHLCV CSV with explicit types (header required;
    ts parsed as timestamp, value columns as double). Extra columns are
    ignored; symbol/timeframe columns are kept when present."""
    raw = store.spark.read.option("header", True).csv(path)
    missing = {"ts", *_VALUE_COLS} - set(raw.columns)
    if missing:
        raise ValueError(f"CSV at {path} lacks required columns: {sorted(missing)}")
    cols = [F.to_timestamp("ts").alias("ts")]
    for c in ("symbol", "timeframe"):
        if c in raw.columns:
            cols.append(F.col(c))
    cols += [F.col(c).cast("double").alias(c) for c in _VALUE_COLS]
    return raw.select(*cols)


def import_csv(
    store: OhlcvStore,
    path: str,
    symbol: str | None = None,
    timeframe: str | None = None,
) -> list[tuple[str, str]]:
    """Import a CSV export into the store; returns the upserted series.

    With ``symbol``/``timeframe`` given, the whole file is one series
    (bare-OHLCV exports). Otherwise the file must carry symbol/timeframe
    columns and every contained series is upserted (the distinct series
    list — tiny by construction — is the only driver-side collect)."""
    df = read_ohlcv_csv(store, path)
    if symbol is not None and timeframe is not None:
        store.save_data(df.select("ts", *_VALUE_COLS), symbol, timeframe)
        return [(symbol, timeframe)]
    if "symbol" not in df.columns or "timeframe" not in df.columns:
        raise ValueError(
            "CSV has no symbol/timeframe columns — pass symbol= and timeframe="
        )
    series = [
        (r["symbol"], r["timeframe"])
        for r in df.select("symbol", "timeframe").distinct().orderBy("symbol", "timeframe").collect()
    ]
    for sym, tf in series:
        store.save_data(
            df.where((F.col("symbol") == sym) & (F.col("timeframe") == tf)).select(
                "ts", *_VALUE_COLS
            ),
            sym,
            tf,
        )
    return series
