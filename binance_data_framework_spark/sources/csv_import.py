"""CSV import into the store — the reverse of ``OhlcvStore.export(fmt='csv')``.

The reference's workflow round-trips series through one-file-per-series CSVs
(colab_interface.py:565-594 export; users re-load them with pandas). This
module closes that loop for the new engine: read a CSV (or a directory of
Spark-written part files), restate the OHLCV types explicitly — CSV carries
none — and feed each (symbol, timeframe) series through the store's ranged
dedup-upsert, so importing is idempotent and concurrent-reader-safe like any
other write.

Scale shape: the read is an ordinary distributed CSV scan (splittable,
executor-parallel); multi-series files land through ``store.save_many`` —
ONE Spark job and ONE manifest commit for the whole file, with only the
per-series day-bounds row collected driver-side. Files exported WITHOUT
symbol/timeframe columns (bare OHLCV) are supported by passing the series
key explicitly (which must AGREE with any embedded key columns).
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

    With ``symbol``/``timeframe`` given, the file is treated as ONE series
    (bare-OHLCV exports). If the file ALSO carries symbol/timeframe
    columns, they must agree: a multi-series file imported under one
    explicit key would silently relabel and merge foreign series (ADVICE
    r4), so any row whose embedded key differs from the explicit one is an
    error, not a relabel. Without explicit args the file must carry the
    key columns, and every contained series lands through ONE
    ``store.save_many`` call — one Spark job and one manifest commit for
    the whole file, regardless of series count (the per-series
    ``save_data`` loop this replaces cost O(series) jobs + commits)."""
    df = read_ohlcv_csv(store, path)
    has_key_cols = "symbol" in df.columns and "timeframe" in df.columns
    if symbol is not None and timeframe is not None:
        if has_key_cols:
            embedded = (
                df.select("symbol", "timeframe")
                .distinct()
                .orderBy("symbol", "timeframe")
                .collect()
            )
            mismatched = [
                (r["symbol"], r["timeframe"])
                for r in embedded
                if (r["symbol"], r["timeframe"]) != (symbol, timeframe)
            ]
            if mismatched:
                raise ValueError(
                    f"CSV at {path} contains series {mismatched[:3]} that "
                    f"differ from the explicit ({symbol!r}, {timeframe!r}) "
                    f"— omit symbol=/timeframe= to import every embedded "
                    f"series, or import a single-series file"
                )
        store.save_data(df.select("ts", *_VALUE_COLS), symbol, timeframe)
        return [(symbol, timeframe)]
    if not has_key_cols:
        raise ValueError(
            "CSV has no symbol/timeframe columns — pass symbol= and timeframe="
        )
    return store.save_many(df.select("ts", "symbol", "timeframe", *_VALUE_COLS))
