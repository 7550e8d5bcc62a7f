"""Streaming corpus ingest: a JSONL shard-directory tail feeding the
transactional DocumentStore (VERDICT r5 #6 — the document tier's analogue
of the kline tail's source → finalize → idempotent-upsert story).

Shape: ``readStream.text`` over the landing directory (new shards are
discovered per micro-batch; availableNow processes the backlog and stops —
the cron-driven ingest shape), the SAME schema-enforced PERMISSIVE parse as
the batch reader (sources/jsonl_docs.parse_lines — a line is clean iff the
entire declared schema parses, projection-independent), optional
watermarked key-dedup, then a ``foreachBatch`` keyed upsert into
DocumentStore. Exactly-once end to end comes from two layers: the stream
checkpoint replays only unprocessed shards after a crash, and
``save_docs``'s keyed upsert makes any replayed batch idempotent (incoming
wins on the key — re-delivering a shard converges to the same snapshot).
Malformed lines are quarantined to a side directory per batch (raw text,
append-only) instead of failing the stream or silently vanishing.

Scale notes: the parse is narrow per shard file; per micro-batch the store
rewrites only the shards the batch's keys hash to. State is zero unless
``dedup_ts_col`` is set (then one watermark-bounded dedup buffer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_data_framework_spark.sources.jsonl_docs import (
    DOC_SCHEMA,
    _field_names,
    parse_lines,
)


def stream_jsonl_documents(
    spark: SparkSession,
    path: str,
    schema: str = DOC_SCHEMA,
    dedup_ts_col: str | None = None,
    watermark: str = "1 hour",
) -> tuple[DataFrame, DataFrame]:
    """(clean_stream, quarantine_stream) over a JSONL landing directory.

    ``dedup_ts_col``: when the schema carries an event-time column (crawl/
    fetch timestamp), redelivered keys within the watermark are dropped
    in-stream (dropDuplicatesWithinWatermark) — bounded state. Without
    one, duplicates are left to the store upsert's idempotency (same
    final state, more shard rewrites under heavy redelivery)."""
    fields = _field_names(schema)
    lines = spark.readStream.text(path)
    parsed, bad = parse_lines(lines, schema)
    clean = parsed.where(~bad).select(*[F.col(f"j.{f}").alias(f) for f in fields])
    if dedup_ts_col is not None:
        key = fields[0]  # leading schema field is the document key
        clean = clean.withWatermark(
            dedup_ts_col, watermark
        ).dropDuplicatesWithinWatermark([key])
    quarantine = parsed.where(bad).select(F.col("value").alias("raw_line"))
    return clean, quarantine


def stream_jsonl_to_docstore(
    clean: DataFrame,
    store,
    checkpoint_dir: str,
    quarantine: DataFrame | None = None,
    quarantine_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """Start the ingest sink(s): a foreachBatch keyed upsert into the
    DocumentStore (one manifest commit per non-empty micro-batch), plus an
    optional append-only raw-text quarantine sink. Returns the list of
    started StreamingQuery handles (await/stop is the caller's job).

    foreachBatch is the canonical upsert-sink shape (no built-in streaming
    MERGE target); the checkpoint bounds replay to unprocessed shards and
    save_docs makes replays idempotent."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.save_docs(batch_df)

    writer = clean.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    queries = [writer.start()]
    if quarantine is not None:
        if quarantine_dir is None:
            raise ValueError("quarantine stream needs a quarantine_dir")
        qw = (
            quarantine.writeStream.format("text")
            .option("path", f"{quarantine_dir}/data")
            .option("checkpointLocation", f"{quarantine_dir}/_checkpoint")
            .outputMode("append")
        )
        if trigger_available_now:
            qw = qw.trigger(availableNow=True)
        queries.append(qw.start())
    return queries
