"""Coverage metadata operators: the cache-orchestration layer of the engine.

The reference maintains a hand-rolled zone-map table ``ohlcv_metadata``
(database_handler.py:126-134) refreshed after every write
(database_handler.py:219-228) and probes it in ``check_data_exists``
(database_handler.py:257-307). Spark-first: coverage is a *computed*
aggregate (parquet footers already hold min/max; this aggregate exists only
because containment/freshness is application semantics), and the probe is a
broadcast semi-join of a tiny request spec against it — never a collect.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from binance_data_framework_spark.functions.timeframes import timeframe_duration_col


def meta_coverage(
    df: DataFrame, key_cols: tuple[str, ...] = ("symbol", "timeframe"), ts_col: str = "ts"
) -> DataFrame:
    """Per-series (min ts, max ts, rows) — reference get_stored_info
    (database_handler.py:348-377), computed not stored. One shuffle keyed by
    the series key; map-side partials make it cheap at any scale."""
    return df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def coverage_check(
    coverage: DataFrame,
    requests: DataFrame,
    now: datetime,
    key_cols: tuple[str, ...] = ("symbol", "timeframe"),
) -> DataFrame:
    """Request-vs-coverage containment probe (reference check_data_exists,
    database_handler.py:279-298 incl. the freshness escape at 291-295).

    `requests(symbol, timeframe, req_start, req_end)` is tiny -> broadcast
    left join onto the coverage aggregate; containment/freshness are plain
    boolean exprs after the equi-join:
      covered :=  start_ts <= req_start
              AND (end_ts + bar - 1ms >= req_end
                   OR abs(now - end_ts) < 2 * bar)       -- freshness escape
    Returns requests + `covered` boolean + coverage bounds.
    """
    # Naive datetimes are engine-convention UTC; .timestamp() on a naive
    # value would shift with the PROCESS-local timezone (time.mktime), so pin
    # it — the driver may run this in any TZ.
    if now.tzinfo is None:
        now = now.replace(tzinfo=timezone.utc)
    bar_ms = timeframe_duration_col(F.col("timeframe"))
    end_ms = F.unix_millis(F.col("end_ts"))
    containment = (F.col("start_ts") <= F.col("req_start")) & (
        end_ms + bar_ms - F.lit(1) >= F.unix_millis(F.col("req_end"))
    )
    fresh = (F.col("start_ts") <= F.col("req_start")) & (
        F.abs(F.lit(int(now.timestamp() * 1000)) - end_ms) < 2 * bar_ms
    )
    return (
        broadcast(requests)
        .join(coverage, on=list(key_cols), how="left")
        .withColumn(
            "covered",
            F.coalesce(containment | fresh, F.lit(False)),
        )
    )


def gap_antijoin(
    df: DataFrame,
    timeframe: str,
    spark: SparkSession | None = None,
    key_col: str = "symbol",
    ts_col: str = "bucket",
) -> DataFrame:
    """Missing-bar detection — the gap-fill design the reference planned but
    never implemented (plan.md:79-80).

    Per series: expected bucket timeline = sequence(min, max, bar) exploded,
    anti-joined against present buckets. The expected side is generated from
    the (tiny) coverage aggregate, so the explode fans out to at most
    n_series x n_buckets rows — no driver loop, no collect; the anti-join
    shuffles on (key, bucket) like any equi-join and broadcasts if small.
    """
    from binance_data_framework_spark.functions.timeframes import TIMEFRAME_MS

    bar_ms = TIMEFRAME_MS[timeframe]
    bounds = df.groupBy(key_col).agg(
        F.min(ts_col).alias("min_b"), F.max(ts_col).alias("max_b")
    )
    expected = bounds.select(
        F.col(key_col),
        F.explode(
            F.sequence(
                "min_b",
                "max_b",
                F.expr(f"INTERVAL {bar_ms // 1000} SECONDS"),
            )
        ).alias(ts_col),
    )
    return expected.join(
        df.select(key_col, ts_col), on=[key_col, ts_col], how="left_anti"
    ).select(F.col(key_col).alias("symbol"), F.col(ts_col).alias("missing_bucket"))
