"""Timeframe dimension: the 15 supported bar sizes and their durations.

Mirrors the reference's literal dict (database_handler.py:162-191) — with the
reference's '30m' bug fixed: it maps 30m to 30*1000 ms (30 *seconds*,
database_handler.py:175); the correct value 1_800_000 ms is used here.

Calendar-sized frames ('1w', '1M') carry a *nominal* duration for coverage
arithmetic but are resampled with `date_trunc`, not fixed windows (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_MIN = 60_000
_HOUR = 60 * _MIN
_DAY = 24 * _HOUR

TIMEFRAME_MS: dict[str, int] = {
    "1m": _MIN,
    "3m": 3 * _MIN,
    "5m": 5 * _MIN,
    "15m": 15 * _MIN,
    "30m": 30 * _MIN,  # reference bug fixed (30s -> 30m)
    "1h": _HOUR,
    "2h": 2 * _HOUR,
    "4h": 4 * _HOUR,
    "6h": 6 * _HOUR,
    "8h": 8 * _HOUR,
    "12h": 12 * _HOUR,
    "1d": _DAY,
    "3d": 3 * _DAY,
    "1w": 7 * _DAY,
    "1M": 30 * _DAY,  # nominal; resample uses calendar months
}

# Timeframes bucketed by fixed-duration tumbling windows vs calendar truncation.
FIXED_WINDOW_TFS = frozenset(t for t in TIMEFRAME_MS if t not in ("1w", "1M"))
CALENDAR_TFS = frozenset(("1w", "1M"))

# window()-compatible duration strings for the fixed timeframes.
WINDOW_DURATION: dict[str, str] = {
    "1m": "1 minute",
    "3m": "3 minutes",
    "5m": "5 minutes",
    "15m": "15 minutes",
    "30m": "30 minutes",
    "1h": "1 hour",
    "2h": "2 hours",
    "4h": "4 hours",
    "6h": "6 hours",
    "8h": "8 hours",
    "12h": "12 hours",
    "1d": "1 day",
    "3d": "3 days",
}


def snap_down_ms(ms: int, bar_ms: int) -> int:
    """Largest bucket-grid point <= ms (floor to the bar grid)."""
    return (ms // bar_ms) * bar_ms


def snap_up_ms(ms: int, bar_ms: int) -> int:
    """Smallest bucket-grid point >= ms (ceil to the bar grid)."""
    return -(-ms // bar_ms) * bar_ms


def timeframe_duration_col(tf_col: Column) -> Column:
    """Column expression mapping a timeframe string column -> duration ms.

    Built as a literal CASE/map so it stays JVM-side (no UDF, no join) —
    constant-folded by Catalyst when tf is a literal.
    """
    mapping = F.create_map(*[F.lit(x) for kv in TIMEFRAME_MS.items() for x in kv])
    return F.element_at(mapping, tf_col)


def timeframe_dim(spark: SparkSession) -> DataFrame:
    """The timeframe dimension as a (broadcastable) 15-row DataFrame.

    SQL VALUES, not createDataFrame: a Python-object local relation plans
    a Scan ExistingRDD that spins up Python workers for 15 rows (~1.2 s
    fixed overhead per query); VALUES folds to a JVM LocalRelation."""
    rows = ", ".join(f"('{tf}', {ms})" for tf, ms in TIMEFRAME_MS.items())
    return spark.sql(
        f"SELECT timeframe, CAST(duration_ms AS BIGINT) AS duration_ms "
        f"FROM VALUES {rows} AS t(timeframe, duration_ms)"
    )
