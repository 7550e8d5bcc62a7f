"""One-shot migration of a reference SQLite cache into the Parquet store.

A user of the reference framework has an ``ohlcv_data`` SQLite table
(schema: timestamp INTEGER epoch-ms, symbol TEXT, timeframe TEXT,
open/high/low/close/volume REAL, PK (timestamp, symbol, timeframe) —
reference database_handler.py:110-122). This module moves that cache into
:class:`~binance_data_framework_spark.store.OhlcvStore` so every query they
run today runs against the new engine afterwards. The ``ohlcv_metadata``
coverage table needs no migration — the new engine computes coverage from
data (SURVEY.md §1.4).

Scale honesty: a SQLite file is single-node by construction (the reference's
storage ceiling, BASELINE.md), so the read side is a driver-side cursor —
batched so memory stays bounded — and the write side reuses the store's
ranged dedup-upsert per (symbol, timeframe) series. Each series is an
independent unit of migration; parallelize across series/files when moving
many databases.
"""

from __future__ import annotations

import sqlite3
from collections.abc import Iterator
from contextlib import closing

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from binance_data_framework_spark.functions.casts import ms_to_ts
from binance_data_framework_spark.schemas import OHLCV_MS

_SELECT = (
    "SELECT timestamp, open, high, low, close, volume FROM ohlcv_data "
    "WHERE symbol = ? AND timeframe = ? ORDER BY timestamp"
)


def list_series(db_path: str) -> list[tuple[str, str]]:
    """Distinct (symbol, timeframe) series in the source database."""
    # closing(): the sqlite3 context manager only commits/rolls back on
    # exit — it does NOT close, which leaks a read-locking handle per call
    with closing(sqlite3.connect(db_path)) as conn:
        rows = conn.execute(
            "SELECT DISTINCT symbol, timeframe FROM ohlcv_data ORDER BY 1, 2"
        ).fetchall()
    return [(s, tf) for s, tf in rows]


def _batches(db_path: str, symbol: str, timeframe: str, batch_rows: int) -> Iterator[list]:
    with closing(sqlite3.connect(db_path)) as conn:
        cur = conn.execute(_SELECT, (symbol, timeframe))
        while True:
            rows = cur.fetchmany(batch_rows)
            if not rows:
                return
            yield rows


def migrate_sqlite(
    spark: SparkSession,
    store,
    db_path: str,
    batch_rows: int = 500_000,
) -> dict[tuple[str, str], int]:
    """Copy every series from the reference SQLite file into the store.

    Returns {(symbol, timeframe): rows_migrated}. Idempotent: the store's
    upsert makes re-running a no-op data-wise (INSERT OR REPLACE parity with
    the source's own PK semantics)."""
    migrated: dict[tuple[str, str], int] = {}
    for symbol, timeframe in list_series(db_path):
        n = 0
        for rows in _batches(db_path, symbol, timeframe, batch_rows):
            raw = spark.createDataFrame(rows, OHLCV_MS)
            df = raw.select(
                ms_to_ts("ts_ms").alias("ts"),  # functions/casts: the one conversion convention
                "open",
                "high",
                "low",
                "close",
                "volume",
            )
            store.save_data(df, symbol, timeframe)
            n += len(rows)
        migrated[(symbol, timeframe)] = n
    return migrated
