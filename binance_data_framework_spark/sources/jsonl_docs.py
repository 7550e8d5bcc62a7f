"""JSONL document ingest — the interchange format of training-corpus
pipelines (one JSON object per line; .jsonl / .jsonl.gz shards).

The reference ingests only its REST kline source (binance_client.py); this
module covers the corpus-side ingest the north-star extensions need: bulk
document shards land as JSONL, get schema-enforced on read, and malformed
lines are quarantined instead of failing the job.

Scale notes:
- ALWAYS pass the explicit schema: ``spark.read.json`` without one runs a
  full inference pass over every byte before the real read — at 100 TB
  that doubles the scan. With a schema it is one streaming pass, splittable
  per file (gzip shards parallelize per-file, uncompressed/zstd per-split).
- PERMISSIVE + columnNameOfCorruptRecord keeps a multi-day ingest alive
  when one shard has a truncated line; the quarantine stream is a separate
  read so the happy path never pays for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write a document shard set as JSONL (one object per line, one file
    per partition — shard count = partition count, so callers control it
    with repartition/coalesce)."""
    df.write.mode("overwrite").json(path)


def read_jsonl_documents(
    spark: SparkSession, path: str, schema: str = DOC_SCHEMA
) -> DataFrame:
    """Schema-enforced JSONL read; malformed lines are dropped here and
    surfaced by `corrupt_lines` (separate quarantine pass)."""
    df = (
        spark.read.schema(schema + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")


def corrupt_lines(spark: SparkSession, path: str, schema: str = DOC_SCHEMA) -> DataFrame:
    """The quarantine stream: raw text of every line that failed the schema.
    Spark disallows queries referencing ONLY the internal corrupt-record
    column on the raw read (SPARK-21610), so this pass caches the parsed
    frame first — it is an audit path over (hopefully) few rows, run on
    demand, never part of the ingest plan."""
    df = (
        spark.read.schema(schema + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()
    )
    return df.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
