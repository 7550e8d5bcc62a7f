"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...},
   "sweep": {...}, "sweep_total_sec": N, "sf": ...}

`queries` is the stable 19-query headline set, best-of-3 (round-over-round
comparable). `sweep` times EVERY registered query once — the off-headline
heavies (portable-hash oracle variants, curation pipelines) become a
per-round artifact diffable against SWEEP_BASELINE.json instead of being
invisible to bench comparison (VERDICT r3 item 7). Single-run: coverage
and trend, not steady-state precision — compare against the committed
baseline with a noise band, and set SPARK_GRAFT_SKIP_SWEEP=1 for quick
headline-only iteration.

BUILD-TIER queries (VERDICT r6 #5) report under `sweep_build`, NOT
`sweep`: their ensure-semantics make the first contact per corpus/root a
TRAINING run (IVF/PQ/OPQ fit + commit, tens of seconds) and later
contacts a fingerprint check — a cold `_scratch/` would otherwise poison
round-over-round sweep totals with one-off training cost (r6: one query
was 15% of the sweep). `sweep_total_sec` therefore stays comparable
across rounds regardless of `_scratch` state; `sweep_build_total_sec`
carries the index/model tier separately.

Each query is forced to full materialization with a noop write (count() would
let Catalyst skip computing projected values).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from binance_data_framework_spark.plans.registry import QUERIES
from binance_data_framework_spark.session import get_spark

HEADLINE = [
    "flagship_ohlcv_sma",
    "resample_ohlcv",
    "window_sma",
    "scan_table_range",
    "agg_minmax_series",
    "gap_antijoin",
    "upsert_precedence",
    "asof_align",
    "dedup_exact",
    "dedup_near_minhash",
    "text_sentiment",
    "text_stats",
    "topk_similarity",
    "topk_similarity_lsh",
    "json_extract",
    "corpus_curation",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
]

# Queries whose ensure-semantics TRAIN and COMMIT persisted index/model
# artifacts on first contact per corpus/root (and only fingerprint-check
# afterwards) — timed under `sweep_build`, keeping `sweep_total_sec`
# comparable across rounds whatever the `_scratch/` state.
BUILD_TIER = {
    "ann_index_build",
    "ann_index_append",
    "ann_index_delete",
    "curated_index_pipeline",
    "knn_lsh_build",
}


def summary_line(payload: dict) -> str:
    """Compact machine-first summary printed LAST by main(): the driver
    records only a ~2 KB stdout tail, and the full payload line outgrew it
    at r4 (every BENCH_r4..r10 has `parsed: null`). This line is <1 KB by
    contract (pytest-pinned, tests/test_bench_contract.py — VERDICT r11
    #8) and is the final line of output, so any tail window contains a
    complete, parseable JSON object with the headline number."""
    summary = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": payload["unit"],
        "sf": payload["sf"],
        "n_queries": len(QUERIES),
    }
    for k in ("sweep_total_sec", "sweep_build_total_sec"):
        if k in payload:
            summary[k] = payload[k]
    line = json.dumps(summary)
    if len(line.encode()) >= 1024:
        raise ValueError(f"bench summary line grew to {len(line)} bytes")
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up so timings measure the plans, not process bring-up: JVM +
    # parquet footers (a real scan), the Arrow/pandas-UDF worker pool (first
    # Python UDF pays ~1s of daemon + worker fork), and window/codegen paths.
    # Uses throwaway synthetic data — no measured query result is precomputed.
    QUERIES["agg_count"](spark, sf_dir).collect()
    # touch every headline input table's footer (metadata-only count)
    for t in ("events", "documents", "embeddings", "lineitem", "orders"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F
    from pyspark.sql.functions import pandas_udf as _pudf

    @_pudf("double")
    def _warm(x):
        return x * 1.0

    warm = spark.range(1000).select(
        _F.col("id"), _warm(_F.col("id").cast("double")).alias("w")
    )
    warm.withColumn(
        "r", _F.row_number().over(_W.partitionBy(_F.col("id") % 7).orderBy("id"))
    ).write.format("noop").mode("overwrite").save()

    # best of 3 runs per query: steady-state plan cost, robust to one-off
    # GC/compaction spikes (r2 showed +72% "regressions" on untouched
    # queries under best-of-2 — the noise band, not the code)
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if not os.environ.get("SPARK_GRAFT_SKIP_SWEEP"):
        import gc

        sweep: dict[str, float] = {}
        sweep_build: dict[str, float] = {}
        for name, fn in QUERIES.items():
            # drop the previous query's localCheckpoint blocks before timing
            # (their lazy unpersist otherwise bleeds GC pressure into the
            # next measurement — observed 0.6s -> 7s spikes in-sweep)
            gc.collect()
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            tier = sweep_build if name in BUILD_TIER else sweep
            tier[name] = round(time.perf_counter() - start, 3)
        payload["sweep"] = sweep
        payload["sweep_total_sec"] = round(sum(sweep.values()), 3)
        payload["sweep_build"] = sweep_build
        payload["sweep_build_total_sec"] = round(sum(sweep_build.values()), 3)
    print(json.dumps(payload))
    # the compact summary is the LAST stdout line — see summary_line()
    print(summary_line(payload))


if __name__ == "__main__":
    main()
