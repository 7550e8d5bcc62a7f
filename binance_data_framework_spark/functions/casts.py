"""Scalar conversions: epoch-ms <-> timestamp, string -> double.

Reference: `_timestamp_to_ms` / `_ms_to_datetime` (database_handler.py:142-160)
and the API-string numeric casts (api_connector.py:296-300). All are built-in
column expressions — JVM-side, codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ms_to_ts(col: Column | str) -> Column:
    """epoch-ms long -> TimestampType (UTC session). Lossless at ms precision."""
    return F.timestamp_millis(F.col(col) if isinstance(col, str) else col)


def ts_to_ms(col: Column | str) -> Column:
    """TimestampType -> epoch-ms long."""
    return F.unix_millis(F.col(col) if isinstance(col, str) else col)


def str_to_double(col: Column | str) -> Column:
    """API string -> double (reference pd.to_numeric, api_connector.py:296-300)."""
    return (F.col(col) if isinstance(col, str) else col).cast(T.DoubleType())
