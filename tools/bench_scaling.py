"""Empirical scaling run for the heavy dedup/ANN/range-join tier
(VERDICT r4 #1): run each heavy query at sf0.1 and at the 10×
replicated-disjoint fixture (tools/make_scale_fixture.py), and record
per-query (t_big / t_small) ratios plus output row counts into
BENCH_SCALING.json at the repo root.

Methodology: one shared session (JVM + python-worker warm for both
scales); per (query, scale) the STEADY-STATE time is best-of-RUNS — the
first run additionally pays plan compile + session warmup, which is
fixed overhead, not scaling signal (it is still recorded as `cold`).
Row counts are recorded because a ratio is only meaningful when the big
run really did ~factor× the work.

Usage: python tools/bench_scaling.py [small_dir] [big_dir] [factor] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binance_data_framework_spark.plans.registry import QUERIES
from binance_data_framework_spark.session import get_spark

HEAVY = [
    "dedup_simhash",
    "dedup_clusters",
    "dedup_near_minhash",
    "embed_near_dup",
    "topk_similarity_pq",
    "range_join_events",
    "pretraining_pipeline",
    # r5 text/retrieval tier: one (doc,term) shuffle apiece (tfidf/bm25/
    # logprob) or fully narrow (repetition) — expected ~linear
    "text_repetition",
    "tfidf_top_terms",
    "bm25_search",
    "text_unigram_logprob",
    # late-r5 additions over the replicated tables: substring-span dedup
    # (one gram shuffle — expected ~linear), PageRank (fixed probe set →
    # candidate scan dominates, graph ~constant), MAD anomaly scoring
    # (two grouped percentiles — expected ~linear)
    "dedup_substring",
    "graph_pagerank",
    "anomaly_mad",
    # all-pairs k-NN with size-derived plane count (3 planes at 2k
    # vectors, 7 at 20k): candidate volume should stay ~linear
    "knn_join_lsh",
    # r8 additions: cross-corpus decontamination (one broadcast-banded
    # pass over the train side — expected ~linear in the train corpus),
    # filtered index search (committed-index read + shortlist
    # post-filter — expected ~flat, probe-bounded), and snapshot drift
    # (two Arrow term-count passes + vocab-grain join — expected ~linear)
    "decontaminate_neardup",
    "topk_filtered_ivf",
    "corpus_drift_terms",
    # r11 addition: MMR re-rank (fixed probe set, shortlist-bounded
    # greedy — expected ~flat beyond the top-k scan). dedup_semantic is
    # deliberately NOT here: the registry form pins 4 planes for its
    # embedded-plane oracle, which is quadratic-by-design beyond fixture
    # scale — the scale-correct auto_planes form is measured separately
    # (PLANS.md r11).
    "mmr_diversify",
]


TPCH = [
    "tpch_q1", "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
    "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q10", "tpch_q11", "tpch_q12",
    "tpch_q13", "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q18",
    "tpch_q19", "tpch_q20", "tpch_q21", "tpch_q22",
]

TIERS = {"heavy": HEAVY, "tpch": TPCH, "all": HEAVY + TPCH}


def main() -> int:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "_scratch/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    tier = sys.argv[5] if len(sys.argv) > 5 else "heavy"
    # a tier name, or an explicit comma-separated query list
    names = TIERS.get(tier) or tier.split(",")
    spark = get_spark("bench-scaling")

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SCALING.json",
    )
    doc: dict = {}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    # factor 10 lives at the top level (original layout); other factors in
    # a "factor{N}" section — existing per-query records for OTHER queries
    # are preserved, re-run queries are overwritten with fresh numbers
    if factor == 10:
        section = doc
    else:
        section = doc.setdefault(f"factor{factor}", {})
    section.update(
        {
            "factor": factor,
            "small_dir": small,
            "big_dir": big,
            "runs_per_point": runs,
        }
    )
    doc["methodology"] = (
        "Big fixture = replicate-with-disjoint-shifts (tools/"
        "make_scale_fixture.py): per-replica word tagging / vector "
        "perturbation / id+key+time shifts keep pair density and join "
        "structure LINEAR in the factor, so ratio measures the engine, "
        "not planted duplicate cliques. One shared warm session; sec_* is "
        "best-of-N noop-format WRITE time (forces every output value to "
        "materialize — count() would let Catalyst prune a pure "
        "projection's computed columns; r6 audit); cold_* includes "
        "first-run plan compile. "
        "Ratios well under the factor mean the query is still "
        "fixed-overhead-bound at this absolute scale."
    )
    qsec = section.setdefault("queries", {})
    for name in names:
        fn = QUERIES[name]
        rec: dict = {}
        for tag, sf_dir in (("small", small), ("big", big)):
            best, cold, rows = float("inf"), None, None
            for i in range(runs):
                t0 = time.time()
                # noop WRITE, not count(): count() lets Catalyst prune the
                # computed columns of pure-projection queries, so their
                # "ratio" would measure parquet row counting (r6 audit);
                # the write forces every output value to materialize —
                # same convention as bench.py
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                if i == 0:
                    cold = dt
                best = min(best, dt)
            rows = df.count()
            rec[f"sec_{tag}"] = round(best, 3)
            rec[f"cold_{tag}"] = round(cold, 3)
            rec[f"rows_{tag}"] = rows
        rec["ratio"] = round(rec["sec_big"] / rec["sec_small"], 2)
        rec["rows_ratio"] = round(rec["rows_big"] / max(rec["rows_small"], 1), 2)
        qsec[name] = rec
        print(
            f"{name}: small={rec['sec_small']}s big={rec['sec_big']}s "
            f"ratio={rec['ratio']}x rows {rec['rows_small']}->{rec['rows_big']}",
            flush=True,
        )
        with open(path, "w") as f:  # checkpoint after every query
            json.dump(doc, f, indent=2)
            f.write("\n")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
