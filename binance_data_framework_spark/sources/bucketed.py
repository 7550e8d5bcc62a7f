"""Bucketed tables: shuffle-free co-located joins for repeated big-big joins.

At 100 TB the dominant cost of a big-big equi-join is shuffling both sides.
When the same join key is used repeatedly (fact-to-fact joins on the series
key, pair tables re-joined to signatures), pre-bucketing both tables by that
key amortizes the shuffle into the write: `bucketBy(n, key)` hash-partitions
rows into a fixed number of buckets per table and `sortBy` orders within each
bucket, so a later join of two tables bucketed the same way needs NO exchange
(and with sortBy, no sort) — the physical plan goes straight to
SortMergeJoin over co-located buckets. The bucket count is the join
parallelism: pick ~2-4x cluster cores at the target scale.

Spark requires the metastore path (`saveAsTable`) for bucketed writes —
plain `.parquet(path)` writes lose bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed (and optionally sort-within-bucket) managed
    table. Joins/aggregations on `bucket_cols` between tables bucketed with
    the same count read co-located buckets with no exchange."""
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact."""
    return spark.table(table)
