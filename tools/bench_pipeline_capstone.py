"""The full LLM-pretraining data pipeline, composed END-TO-END at the
largest local fixtures (VERDICT r10 #2): every tier was measured alone
across decades (BENCH_SCALING factor sweeps / neardup_gate / ann_ops);
this runs them as one pipeline — JSONL ingest -> gate (lang/quality +
exact dedup + MinHash near-dup + decontaminate) -> curation (quality
quantile + mixture + pack) -> shard export -> ANN index build -> filtered
search — with wall-time and per-stage attribution recorded in
BENCH_SCALING.json under ``pipeline_capstone``.

Adjudication rule: no stage may be super-linear against its own tier's
measured curve (e.g. the near-dup stage at 5M docs vs the factor sweeps'
dedup_near_minhash points; the build stage vs ann_ops.build_sec). Each
stage MATERIALIZES its output (parquet intermediate or committed store
artifact) before the clock stops — a real pipeline's stages are jobs with
durable handoffs, and stopping at a lazy plan would attribute a stage's
cost to its consumer.

Setup (excluded from stage timings): a one-time JSONL export of the
fixture documents — the pipeline's INPUT format is JSONL by design (what
crawls deliver), but manufacturing the fixture is not pipeline work.

Usage: python tools/bench_pipeline_capstone.py [docs_dir] [emb_dir]
(defaults: _scratch/sf100 for both — 5M docs / 2M vectors)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binance_data_framework_spark.ann_index import AnnIndexStore
from binance_data_framework_spark.operators import curation as CU
from binance_data_framework_spark.operators import dedup as D
from binance_data_framework_spark.operators import similarity as S
from binance_data_framework_spark.operators import text as TX
from binance_data_framework_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = os.path.join(REPO, "_scratch", "pipeline_capstone")


def main() -> int:
    docs_dir = sys.argv[1] if len(sys.argv) > 1 else "_scratch/sf100"
    emb_dir = sys.argv[2] if len(sys.argv) > 2 else "_scratch/sf100"
    spark = get_spark("pipeline-capstone")
    spark.sparkContext.setLogLevel("ERROR")

    stages: dict[str, dict] = {}

    def stage(name: str, t0: float, **info) -> None:
        stages[name] = {"sec": round(time.perf_counter() - t0, 3), **info}
        print(f"{name}: {json.dumps(stages[name])}", flush=True)

    # ---- setup (excluded): fixture docs as JSONL, cached across runs
    # PER SOURCE DIR (an unkeyed cache served the sf0.1 smoke run's 5000
    # docs to the sf100 measurement) ----
    jsonl = os.path.join(
        WORK, "input_jsonl_" + os.path.basename(os.path.normpath(docs_dir))
    )
    if not os.path.exists(jsonl):
        (
            spark.read.parquet(f"{docs_dir}/documents.parquet")
            .repartition(32)
            .write.mode("overwrite")
            .json(jsonl)
        )
    for d in (
        "docs_raw",
        "docs_scored",
        "docs_exact",
        "docs_clean",
        "curated",
        "packed_manifest",
        "shards",
        "ann_index",
    ):
        shutil.rmtree(os.path.join(WORK, d), ignore_errors=True)

    t_all = time.perf_counter()

    # ---- 1. ingest: schema-enforced JSONL -> columnar parquet ----------
    t0 = time.perf_counter()
    raw = spark.read.schema(
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).json(jsonl)
    raw.write.mode("overwrite").option("compression", "zstd").parquet(
        os.path.join(WORK, "docs_raw")
    )
    raw = spark.read.parquet(os.path.join(WORK, "docs_raw"))
    n_raw = raw.count()
    stage("ingest", t0, rows=n_raw)

    # ---- 2. gate: lang/quality filter + exact dedup + near-dup +
    #              decontaminate (the corpus_curation chain + the two
    #              heavy drops, in drop-cheapest-first order). Each
    #              SUB-stage materializes its handoff and reports its own
    #              seconds (VERDICT r11 #4 — the r11 gate was one 96.9 s
    #              number; attribution now itemizes it the way
    #              neardup_gate.points itemizes the streaming gate), so
    #              each sub-stage adjudicates against ITS tier's factor
    #              curve (quality exprs / dedup_exact / dedup_near_minhash
    #              / decontaminate). ------------------------------------
    t0 = time.perf_counter()
    gate_sub: dict[str, dict] = {}

    def sub(name: str, t: float, **info) -> None:
        gate_sub[name] = {"sec": round(time.perf_counter() - t, 3), **info}
        print(f"gate.{name}: {json.dumps(gate_sub[name])}", flush=True)

    q = TX.quality_exprs("text")
    # lang-ID is computed and CARRIED but not filtered on: the scale
    # fixture's word~k replica tags (shingle-disjointness by design)
    # defeat the stopword-marker heuristic, so a pred_lang != 'und' gate
    # would drop every replica but 0 and starve the downstream stages of
    # the very volume this capstone exists to measure. The scoring cost
    # is identical either way; production corpora keep the filter.
    ts = time.perf_counter()
    scored = raw.select(
        "doc_id",
        "text",
        "lang",
        "source",
        "n_chars",
        TX.lang_pred_col("text").alias("pred_lang"),
        q["quality"].alias("quality"),
    ).where(F.col("quality") >= 0.5)
    scored.write.mode("overwrite").option("compression", "zstd").parquet(
        os.path.join(WORK, "docs_scored")
    )
    scored = spark.read.parquet(os.path.join(WORK, "docs_scored"))
    sub("score_filter", ts, rows_out=scored.count())

    ts = time.perf_counter()
    exact = D.dedup_exact(scored, text_col="text", id_col="doc_id")
    exact.write.mode("overwrite").option("compression", "zstd").parquet(
        os.path.join(WORK, "docs_exact")
    )
    exact = spark.read.parquet(os.path.join(WORK, "docs_exact"))
    sub("exact_dedup", ts, rows_out=exact.count())

    ts = time.perf_counter()
    near_pairs = D.minhash_candidates(
        D.minhash_signature(exact), threshold=0.9
    ).select(F.col("id_b").alias("doc_id"))  # drop the higher id of a pair
    near_ids = near_pairs.distinct().localCheckpoint(eager=True)
    sub("near_dup", ts, drop_ids=near_ids.count())

    ts = time.perf_counter()
    bench = raw.where(F.col("doc_id") % 97 == 0).select("text")
    # n=5: large enough that shared grams mean real leakage on the
    # synthetic corpus (n=3 flags 92% of docs — common-trigram noise),
    # small enough to still produce hits; production runs 8-13
    contaminated = (
        CU.decontaminate(exact, bench, n=5, keep_cols=())
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    sub("decontaminate", ts, drop_ids=contaminated.count())

    ts = time.perf_counter()
    clean = exact.join(near_ids, "doc_id", "left_anti").join(
        contaminated, "doc_id", "left_anti"
    )
    clean.write.mode("overwrite").option("compression", "zstd").parquet(
        os.path.join(WORK, "docs_clean")
    )
    clean = spark.read.parquet(os.path.join(WORK, "docs_clean"))
    n_clean = clean.count()
    sub("assemble", ts, rows_out=n_clean)
    stage("gate", t0, rows_in=n_raw, rows_out=n_clean, sub=gate_sub)

    # ---- 3. curate: per-lang quality quantile + mixture + pack --------
    t0 = time.perf_counter()
    top = CU.quality_quantile_filter(clean, keep_fraction=0.7)
    srcs = [r["source"] for r in top.select("source").distinct().collect()]
    mixed = CU.sample_mixture(
        top, {s: 1 for s in sorted(srcs)}, key_col="source"
    )
    mixed.write.mode("overwrite").option("compression", "zstd").parquet(
        os.path.join(WORK, "curated")
    )
    curated = spark.read.parquet(os.path.join(WORK, "curated"))
    packed = CU.pack_sequences(curated, budget=2048, n_shards=8)
    packed.write.mode("overwrite").option("compression", "zstd").parquet(
        os.path.join(WORK, "packed_manifest")
    )
    n_curated = curated.count()
    n_seqs = spark.read.parquet(os.path.join(WORK, "packed_manifest")).count()
    stage("curate", t0, rows_in=n_clean, rows_out=n_curated, sequences=n_seqs)

    # ---- 4. shard export: deterministic shard layout ------------------
    t0 = time.perf_counter()
    (
        CU.shard_assign(curated, n_shards=16)
        .write.mode("overwrite")
        .partitionBy("shard")
        .option("compression", "zstd")
        .parquet(os.path.join(WORK, "shards"))
    )
    stage("shard_export", t0, rows=n_curated, n_shards=16)

    # ---- 5. ANN build: sampled-training IVF/PQ/OPQ over the corpus ----
    t0 = time.perf_counter()
    emb = spark.read.parquet(f"{emb_dir}/embeddings.parquet").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        "label",
    )
    st = AnnIndexStore(spark, os.path.join(WORK, "ann_index"))
    idx = st.build(emb)
    n_vec = idx.n_vectors
    stage("ann_build", t0, vectors=n_vec, cells=idx.n_centroids)

    # ---- 6. filtered search over the committed index ------------------
    t0 = time.perf_counter()
    import numpy as np

    probe_ids = [100, 101, 102, 103, 104]
    pv = np.array(
        [
            r["embedding"]
            for r in emb.where(F.col("vec_id").isin(probe_ids)).collect()
        ]
    )
    cent = np.array(idx.centroids)
    d2 = ((pv[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    cells = sorted({int(c) for row in d2 for c in np.argsort(row)[:4]})
    hits = S.topk_cosine_filtered_ivfpq(
        emb,
        F.col("vec_id").isin(probe_ids),
        (F.col("label") % 2) == 1,
        k=10,
        centroids=idx.centroids,
        books=idx.pq_books,
        coded=st.codes("pq", cells=cells),
        selectivity=0.5,
    )
    n_hits = hits.count()
    stage("filtered_search", t0, probes=len(probe_ids), hits=n_hits)

    total = round(time.perf_counter() - t_all, 3)
    print(f"total: {total}s", flush=True)

    path = os.path.join(REPO, "BENCH_SCALING.json")
    doc = json.load(open(path)) if os.path.exists(path) else {}
    # a CURVE, not a point (VERDICT r11 #4): capstone runs are keyed by
    # the docs fixture tag and MERGED, so the half-decade point and the
    # headline point coexist and per-stage ratios between them are the
    # composed pipeline's own scaling evidence
    prior = doc.get("pipeline_capstone", {}).get("points", {})
    tag = os.path.basename(os.path.normpath(docs_dir))
    points = {
        **prior,
        tag: {
            "docs_dir": docs_dir,
            "emb_dir": emb_dir,
            "total_sec": total,
            "stages": stages,
        },
    }
    doc["pipeline_capstone"] = {
        "method": (
            "full pipeline composed end-to-end, one run per fixture "
            "point, each stage (and each gate SUB-stage) materialized "
            "(parquet intermediate, eager checkpoint, or committed "
            "store) before its clock stops; JSONL fixture export "
            "excluded as setup. Adjudicate each stage against its own "
            "tier's measured curve AND against the smaller capstone "
            "point — no stage may be super-linear vs either."
        ),
        "points": points,
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
        f.write("\n")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
