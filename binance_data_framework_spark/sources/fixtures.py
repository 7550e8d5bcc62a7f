"""Fixture loaders: parquet scans over /root/testdata/sf*/.

Everything goes through ``load_table`` so predicate pushdown / column pruning
reach a single `spark.read.parquet` scan — the Spark-native replacement for
the reference's indexed SQLite range scan (database_handler.py:329-332).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Parquet → footer min/max stats give the
    row-group skipping the reference needed 3 SQLite indexes for.

    The `events` fixture's ts column has varied across driver testdata
    generations: TIMESTAMP(NANOS) (read as a long via nanosAsLong and
    floor-divided to micros — the ns→us truncation DuckDB applies) or
    TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ by
    Spark 4's inferTimestampNTZ). Both are naive-UTC instants by fixture
    convention; normalize to session-tz TimestampType — the engine's
    canonical type — so downstream epoch-ms functions (unix_millis in
    coverage_check) and timestamp-literal comparisons type-check
    identically for every generation.
    """
    # Defensive: the harness may hand us a session it built itself — pin the
    # engine's UTC discipline and the nanos read mode at runtime (both are
    # per-session SQL confs, safe to set repeatedly).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            # naive-UTC wall-clock → UTC instant (session tz is UTC)
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def scan_events_range(
    spark: SparkSession,
    sf_dir: str,
    start: str | None = None,
    end: str | None = None,
) -> DataFrame:
    """Events scan with a time-range predicate that actually reaches the
    parquet row groups.

    The ts column arrives as a nanos long (see load_table), so a filter on
    the *converted* timestamp is opaque to parquet pushdown. We apply the
    equivalent closed-interval predicate in raw nanos space first (pushable:
    floor(ns/1000) >= a*1e6  <=>  ns >= a*1e9 for whole-second bounds), then
    convert. `.explain` shows GreaterThanOrEqual/LessThanOrEqual in
    PushedFilters — row-group min/max skipping works at 100 TB.
    """
    from datetime import datetime, timezone

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw_is_long = dict(df.dtypes).get("ts") == "bigint"

    def _ns(s: str) -> int:
        dt = datetime.fromisoformat(s).replace(tzinfo=timezone.utc)
        return int(dt.timestamp()) * 1_000_000_000 + dt.microsecond * 1000

    if raw_is_long:
        if start is not None:
            df = df.where(F.col("ts") >= _ns(start))
        if end is not None:
            # floor(ns/1000) <= end_us  <=>  ns <= end_us*1000 + 999
            df = df.where(F.col("ts") <= _ns(end) // 1000 * 1000 + 999)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    else:
        # TIMESTAMP_NTZ (or plain TIMESTAMP) storage: filter on the RAW
        # column so the predicate pushes to parquet row groups (a filter on
        # a cast column would not), then normalize the type after.
        if start is not None:
            df = df.where(F.col("ts") >= F.lit(start))
        if end is not None:
            df = df.where(F.col("ts") <= F.lit(end))
        if dict(df.dtypes).get("ts") == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def ohlcv_view(spark: SparkSession, sf_dir: str, timeframe: str = "1h") -> DataFrame:
    """Derived OHLCV series from the `events` fixture (FIXTURES.md mapping):
    event_type is the series key ("symbol"), value the price proxy.

    This is the engine's core table shape (reference ohlcv_data,
    database_handler.py:110-122) produced by `resample_ohlcv` semantics.
    """
    from binance_data_framework_spark.operators.ohlcv import resample_ohlcv

    events = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("symbol"),
        F.col("ts"),
        F.col("value").alias("price"),
    )
    return resample_ohlcv(events, timeframe, price_col="price", ts_col="ts", key_col="symbol")
