"""OhlcvStore — the storage/query layer (reference GoogleDriveDataManager,
database_handler.py, re-expressed as a partitioned-Parquet lakehouse).

Physical layout: ``root/symbol=<s>/timeframe=<tf>/dt=<date>/*.parquet`` with
rows sorted by ts inside each file — partition pruning replaces the
reference's idx_symbol/idx_timeframe, the ``dt`` date partition bounds every
rewrite to the touched days, and row-group min/max stats replace
idx_timestamp (database_handler.py:120-125). Upsert = union-with-overlapping-
days + precedence-aware dedup + dynamic partition overwrite, replacing SQLite
``INSERT OR REPLACE`` (database_handler.py:215-218) WITHOUT the
whole-partition write amplification: appending one day to a multi-year series
reads and rewrites only that day's files. The API surface mirrors the
reference's five public methods (README.md:82-114).

All filesystem metadata ops (existence probe, partition drop) go through the
Hadoop FileSystem API resolved from the store root, so the same code runs on
local disk, HDFS, or an object store (s3a/abfs/gs) — the layouts a 100 TB
deployment actually lives on.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from binance_data_framework_spark.operators.coverage import coverage_check, meta_coverage

KEY = ["ts", "symbol", "timeframe"]
OHLCV_COLS = ["ts", "symbol", "timeframe", "open", "high", "low", "close", "volume"]


def _utc(d: datetime) -> datetime:
    """Pin naive datetimes to UTC (engine convention). PySpark converts naive
    datetime literals through the PROCESS-local timezone — in a non-UTC
    driver an unpinned bound would shift by the UTC offset."""
    return d.replace(tzinfo=timezone.utc) if d.tzinfo is None else d


class OhlcvStore:
    """Partitioned-Parquet OHLCV store with reference-parity semantics."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # -- helpers ---------------------------------------------------------
    def _fs_path(self, *segments: str):
        """(FileSystem, Path) for root/segments via the Hadoop FS API —
        works identically for file://, hdfs://, s3a:// roots."""
        jvm = self.spark._jvm
        uri = "/".join([self.root.rstrip("/"), *segments])
        path = jvm.org.apache.hadoop.fs.Path(uri)
        fs = path.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return fs, path

    def _exists(self) -> bool:
        fs, root = self._fs_path()
        if not fs.exists(root):
            return False
        return any(
            st.getPath().getName().startswith("symbol=")
            for st in fs.listStatus(root)
        )

    def _read_all(self, with_dt: bool = False) -> DataFrame:
        df = self.spark.read.option("basePath", self.root).parquet(self.root)
        return df if with_dt else df.select(*OHLCV_COLS)

    # -- reference API surface ------------------------------------------
    def save_data(self, df: DataFrame, symbol: str, timeframe: str) -> bool:
        """Dedup-upsert write (reference save_data, database_handler.py:193-241).

        New rows win over stored rows on the (ts,symbol,timeframe) key —
        SQLite ``INSERT OR REPLACE`` parity — via an explicit source-rank +
        row_number (deterministic under shuffle; Spark has no PK).

        Ranged merge: one tiny agg action bounds the incoming batch's
        [min(ts), max(ts)]; only stored rows in the overlapping ``dt`` date
        partitions are read into the merge, and dynamic partition overwrite
        rewrites only the (symbol, timeframe, dt) partitions present in the
        merged frame — i.e. exactly the incoming days. Days outside the
        incoming range are never read and never rewritten (the reference's
        SQLite rewrites nothing but holds everything in one B-tree; a naive
        Spark translation rewrote the whole series per batch).

        Concurrency caveat: dynamic partition overwrite replaces files
        non-atomically, so a READER scanning a day mid-rewrite can hit a
        transient FILE_NOT_EXIST (retry resolves it). Single-writer-per-
        series is assumed (reference parity: one SQLite connection); a
        transactional table format (Delta/Iceberg) is the upgrade path for
        concurrent reader snapshots.
        """
        incoming = (
            df.withColumn("symbol", F.lit(symbol))
            .withColumn("timeframe", F.lit(timeframe))
            .select(*OHLCV_COLS)
            .withColumn("_rank", F.lit(0))
        )
        if self._exists():
            # Bound the merge: the incoming batch is the small side (a fetch
            # page / micro-batch); computing its ts bounds is one cheap job.
            # Bounds must be computed as DateType IN Spark: collecting a
            # TimestampType goes through datetime.fromtimestamp (PROCESS-local
            # tz) while the dt partition column is to_date(ts) under the UTC
            # session tz — on a non-UTC driver a .date() on the collected
            # value can shift the merge window by a day and silently drop
            # stored rows near midnight. DateType round-trips tz-free.
            bounds = incoming.agg(
                F.min(F.to_date("ts")).alias("lo_d"),
                F.max(F.to_date("ts")).alias("hi_d"),
            ).first()
            if bounds["lo_d"] is None:
                return True  # empty batch: nothing to merge or rewrite
            lo_d, hi_d = bounds["lo_d"], bounds["hi_d"]
            stored = (
                self._read_all(with_dt=True)
                .where(
                    (F.col("symbol") == symbol)
                    & (F.col("timeframe") == timeframe)
                    & F.col("dt").between(F.lit(lo_d), F.lit(hi_d))
                )
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
            merged.withColumn("dt", F.to_date("ts"))
            # cluster by the physical partition key before writing: the merge
            # window leaves rows hash-scattered by (ts,symbol,timeframe), and
            # writing that directly sprays up to shuffle.partitions small
            # files into every dt directory — a small-files generator at
            # scale. One repartition of the (small) batch = one file per day.
            .repartition("symbol", "timeframe", "dt")
            .sortWithinPartitions("ts")  # maximize row-group skipping on ts
            .write.partitionBy("symbol", "timeframe", "dt")
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
        symbol/timeframe AND the derived dt date bounds; the ts predicate
        reaches the parquet row groups. Naive bounds are pinned UTC before
        becoming literals (see _utc)."""
        df = self._read_all(with_dt=True).where(
            (F.col("symbol") == symbol) & (F.col("timeframe") == timeframe)
        )
        if start is not None:
            s = _utc(start)
            df = df.where((F.col("dt") >= F.lit(s.date())) & (F.col("ts") >= F.lit(s)))
        if end is not None:
            e = _utc(end)
            df = df.where((F.col("dt") <= F.lit(e.date())) & (F.col("ts") <= F.lit(e)))
        return df.select(*OHLCV_COLS).orderBy("ts")

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
        req = self.spark.createDataFrame(
            [(symbol, timeframe, _utc(start), _utc(end))],
            "symbol string, timeframe string, req_start timestamp, req_end timestamp",
        )
        cov = meta_coverage(self._read_all())
        row = coverage_check(cov, req, _utc(now or datetime.now(timezone.utc))).first()
        if row is None or row["start_ts"] is None:
            return False, None
        return bool(row["covered"]), (row["start_ts"], row["end_ts"])

    def delete_data(self, symbol: str, timeframe: str) -> bool:
        """Partition drop (reference delete_data, database_handler.py:243-255).
        The partition IS the delete granule — recursive delete of the
        directory through the Hadoop FS API (object-store safe); no rewrite
        of unrelated data."""
        fs, path = self._fs_path(f"symbol={symbol}", f"timeframe={timeframe}")
        if not fs.exists(path):
            return False
        fs.delete(path, True)
        parent = path.getParent()
        if fs.exists(parent) and len(fs.listStatus(parent)) == 0:
            fs.delete(parent, False)
        return True

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
