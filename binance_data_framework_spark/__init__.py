"""binance_data_framework_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference framework (St0rmMaster/binance_data_framework,
a pandas+sqlite3 OHLCV cache — see /root/reference), re-expressed Spark-first:

- storage: partitioned Parquet (symbol/timeframe dirs) instead of SQLite rows
- queries: lazy DataFrame plans optimized by Catalyst instead of eager pandas
- resampling: groupBy(window/date_trunc) + min_by/max_by instead of pandas
  ``resample().first()/.last()``
- coverage metadata: computed aggregate + broadcast semi-join instead of a
  hand-maintained ``ohlcv_metadata`` table
- plus large-scale training-data-pipeline extensions: dedup (exact / MinHash-LSH /
  SimHash), similarity search, text analysis, multimodal column plumbing.

Public API mirrors the reference's programmatic surface
(reference README.md:82-114): ``check_data_exists``, ``get_data``,
``save_data``, ``delete_data``, ``get_stored_info`` on :class:`OhlcvStore`.
"""

from binance_data_framework_spark.session import get_spark
from binance_data_framework_spark.store import OhlcvStore

__all__ = ["get_spark", "OhlcvStore"]
__version__ = "0.1.0"
