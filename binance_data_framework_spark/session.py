"""SparkSession factory with scale-aware defaults.

The engine pins UTC (the reference mixes naive datetimes and epoch-ms;
api_connector.py:206,233-234 — we standardize on UTC so epoch-ms round-trips
are lossless) and enables AQE so partition counts self-tune between the
local[32] test harness and a real multi-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "binance_data_framework_spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``shuffle_partitions`` defaults to the local core count: at fixture scale
    AQE coalesces tiny partitions anyway; on a real cluster this would be set
    to ~2-3x total cores (or left to AQE with a high initial value).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        # default: one shuffle partition per core. At larger SFs set
        # SPARK_GRAFT_SHUFFLE_PARTITIONS so each partition still fits in
        # executor memory (AQE coalesces small ones back; it does NOT
        # split an oversized hash-aggregate partition mid-stage) — the
        # factor-1000 local fixture runs with 128.
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for the few pandas_udf paths (multimodal / LSH helpers).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Broadcast threshold: dims (region/nation/supplier, lexicons,
        # request specs) must broadcast, never shuffle.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # RocksDB state store: streaming state (session windows, stream-
        # stream join buffers, dedup keys) spills to disk instead of living
        # in executor heap — the difference between "works on the demo" and
        # "runs a month against a real tick stream". Changelog checkpointing
        # keeps commits incremental.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
        .config("spark.ui.enabled", "false")
    )
    if "SPARK_GRAFT_MASTER" in os.environ:
        builder = builder.master(os.environ["SPARK_GRAFT_MASTER"])
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()
