"""OhlcvStore — the storage/query layer (reference GoogleDriveDataManager,
database_handler.py, re-expressed as a partitioned-Parquet lakehouse).

Physical layout: ``root/symbol=<s>/timeframe=<tf>/*.parquet`` with rows sorted
by ts inside each file — partition pruning replaces the reference's
idx_symbol/idx_timeframe and row-group min/max stats replace idx_timestamp
(database_handler.py:120-125). Upsert = union + precedence-aware dedup +
dynamic partition overwrite, replacing SQLite ``INSERT OR REPLACE``
(database_handler.py:215-218). The API surface mirrors the reference's five
public methods (README.md:82-114).
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from binance_data_framework_spark.operators.coverage import coverage_check, meta_coverage

KEY = ["ts", "symbol", "timeframe"]
OHLCV_COLS = ["ts", "symbol", "timeframe", "open", "high", "low", "close", "volume"]


class OhlcvStore:
    """Partitioned-Parquet OHLCV store with reference-parity semantics."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # -- helpers ---------------------------------------------------------
    def _exists(self) -> bool:
        return os.path.isdir(self.root) and any(
            e.startswith("symbol=") for e in os.listdir(self.root)
        )

    def _read_all(self) -> DataFrame:
        return self.spark.read.option("basePath", self.root).parquet(self.root)

    # -- reference API surface ------------------------------------------
    def save_data(self, df: DataFrame, symbol: str, timeframe: str) -> bool:
        """Dedup-upsert write (reference save_data, database_handler.py:193-241).

        New rows win over stored rows on the (ts,symbol,timeframe) key —
        SQLite ``INSERT OR REPLACE`` parity — via an explicit source-rank +
        row_number (deterministic under shuffle; Spark has no PK). Dynamic
        partition overwrite touches only the partitions present in `df`.
        """
        incoming = (
            df.withColumn("symbol", F.lit(symbol))
            .withColumn("timeframe", F.lit(timeframe))
            .select(*OHLCV_COLS)
            .withColumn("_rank", F.lit(0))
        )
        if self._exists():
            stored = (
                self._read_all()
                .where((F.col("symbol") == symbol) & (F.col("timeframe") == timeframe))
                .select(*OHLCV_COLS)
                .withColumn("_rank", F.lit(1))
            )
            incoming = incoming.unionByName(stored)
        w = Window.partitionBy(*KEY).orderBy("_rank")
        merged = (
            incoming.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rank", "_rn")
        )
        (
            merged.sortWithinPartitions("ts")  # maximize row-group skipping on ts
            .write.partitionBy("symbol", "timeframe")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .save(self.root)
        )
        return True

    def get_data(
        self,
        symbol: str,
        timeframe: str,
        start: datetime | None = None,
        end: datetime | None = None,
    ) -> DataFrame:
        """Pushed-down range scan, both endpoints inclusive (reference
        get_data, database_handler.py:309-346). Partition pruning on
        symbol/timeframe; ts predicate reaches the parquet row groups."""
        df = self._read_all().where(
            (F.col("symbol") == symbol) & (F.col("timeframe") == timeframe)
        )
        if start is not None:
            df = df.where(F.col("ts") >= F.lit(start))
        if end is not None:
            df = df.where(F.col("ts") <= F.lit(end))
        return df.orderBy("ts")

    def check_data_exists(
        self,
        symbol: str,
        timeframe: str,
        start: datetime,
        end: datetime,
        now: datetime | None = None,
    ) -> tuple[bool, tuple[datetime, datetime] | None]:
        """Containment + freshness probe (database_handler.py:257-307).
        One broadcast semi-join over the coverage aggregate; the only
        driver-side materialization is the single result row."""
        if not self._exists():
            return False, None
        # Naive datetimes are engine-convention UTC; pin them before
        # createDataFrame (naive values convert via the PROCESS-local tz).
        utc = lambda d: d.replace(tzinfo=timezone.utc) if d.tzinfo is None else d
        req = self.spark.createDataFrame(
            [(symbol, timeframe, utc(start), utc(end))],
            "symbol string, timeframe string, req_start timestamp, req_end timestamp",
        )
        cov = meta_coverage(self._read_all())
        row = coverage_check(cov, req, utc(now or datetime.now(timezone.utc))).first()
        if row is None or row["start_ts"] is None:
            return False, None
        return bool(row["covered"]), (row["start_ts"], row["end_ts"])

    def delete_data(self, symbol: str, timeframe: str) -> bool:
        """Partition drop (reference delete_data, database_handler.py:243-255).
        The partition IS the delete granule — remove the directory; no
        rewrite of unrelated data."""
        import shutil

        path = os.path.join(self.root, f"symbol={symbol}", f"timeframe={timeframe}")
        if os.path.isdir(path):
            shutil.rmtree(path)
            parent = os.path.dirname(path)
            if os.path.isdir(parent) and not os.listdir(parent):
                os.rmdir(parent)
            return True
        return False

    def get_stored_info(self) -> DataFrame:
        """Catalog scan: per-series coverage + row counts
        (reference get_stored_info, database_handler.py:348-377)."""
        if not self._exists():
            return self.spark.createDataFrame(
                [],
                "symbol string, timeframe string, start_ts timestamp, "
                "end_ts timestamp, n_rows long",
            )
        return meta_coverage(self._read_all()).orderBy("symbol", "timeframe")

    # -- exports (reference colab_interface.py:565-594) ------------------
    def export(
        self,
        df: DataFrame,
        path: str,
        fmt: str = "parquet",
        single_file: bool = False,
    ) -> None:
        out = df.coalesce(1) if single_file else df
        if fmt.lower() == "csv":
            out.write.option("header", True).mode("overwrite").csv(path)
        elif fmt.lower() == "parquet":
            out.write.mode("overwrite").parquet(path)
        else:
            raise ValueError(f"unsupported export format: {fmt}")
