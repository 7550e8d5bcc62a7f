"""Repo-wide physical-plan lint: build every registered query's plan and
flag scale anti-patterns in the Catalyst output. tests/test_plans.py pins
specific shapes for specific queries; this sweep catches a regression in
ANY query the moment it appears — the whole-registry version of
".explain and iterate until it's the plan you'd want".

Checked per query. Building a plan is cheap but NOT always free of jobs:
the export/ingest/store round-trip queries (sink_export_csv/parquet,
ingest_jsonl, docstore_snapshot — their write step runs before the
read-back plan exists), the persisted-ANN-index queries (ann_index_build,
ann_index_append, ann_index_delete, curated_index_pipeline,
topk_similarity_ivf/pq, topk_recall_ivf/pq/opq — first contact per corpus
trains and commits the index (append: half-build + delta-encode; delete:
build + tombstone + purge; pipeline: the two-batch gate + train), later
contacts pay one fingerprint agg), knn_lsh_build/knn_join_lsh/
knn_recall_self (first contact per corpus writes the bucketed LSH
assignment table; later contacts pay one count+idsum agg plus a
catalog check), topk_filtered_ivf/topk_recall_filtered (the
selectivity-gated search measures predicate counts and runs its
per-probe rescue completeness check — an eager checkpoint of the
ranked result plus two model-sized collects — during construction,
r9), dedup_substring (its span stream
eager-checkpoints at build — two consumers; the hidden-by-checkpoint
gram lineage is linted separately via registry._substring_spans in
tests/test_plans.py), tfidf_top_terms and text_unigram_logprob (eager Arrow tf + dictionary
checkpoints — two consumers; one dictionary count() sizes each one's
join gate), and every minhash_candidates consumer (dedup_near_minhash,
dedup_clusters, dedup_keep_representative — eager bucket checkpoint,
ADVICE r6) execute bounded work during construction; everything else is
pure analysis. Flags:
- CartesianProduct              -> never acceptable
- BatchEvalPython               -> row-at-a-time Python UDF in the plan
- BroadcastNestedLoopJoin       -> only on the allowlist (intentional
  broadcast probe x candidate generation, where the non-equi predicate IS
  the operator and one side is model/probe-sized)
- windowspecdefinition()        -> unkeyed (empty partitionBy) windows only
  on the allowlist (provably tiny inputs)

Exit code = number of violating queries. Usage:
    python tools/lint_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binance_data_framework_spark.plans.registry import QUERIES
from binance_data_framework_spark.session import get_spark

# Broadcast nested-loop is the DOCUMENTED plan for the exact similarity /
# near-dup probe generation (a broadcast probe set against the corpus with
# the cosine/ inequality predicate evaluated in codegen — the equi-join
# alternative IS the LSH/IVF tier) and for tiny literal-dim cross joins.
# Every entry cites the row bound that makes the nested loop safe
# (VERDICT r11 "what's wrong" #3): the broadcast side's size is pinned by
# the operator's contract, so the loop is O(bound x other side), never
# O(n^2).
BNLJ_OK = {
    # broadcast side = the probe set (_ann_probe: vec_id < 5 -> 5 rows);
    # the corpus side streams past it once
    "topk_similarity",
    # the filtered EXACT baseline: same 5-row broadcast-probe x corpus
    # shape as topk_similarity, with the metadata predicate narrowing the
    # corpus side BEFORE the nested loop (the index tier for the same
    # semantics is topk_filtered_ivf — equi-join, not allowlisted)
    "topk_filtered",
    # runs the exact filtered baseline above at 3 fixtures (probe side
    # still 5 rows per fixture)
    "topk_recall_filtered",
    # MMR re-ranks the exact top-k shortlist: its relevance stage IS
    # topk_similarity's 5-row broadcast-probe x corpus nested loop; the
    # greedy selection itself is k-rows-per-probe applyInPandas (r11)
    "mmr_diversify",
    # embed_near_dup / graph_pagerank moved OFF the nested-loop form in r6
    # (BLAS-screen + certify kernel) — deliberately not allowlisted so a
    # regression back to BNLJ is caught.
    # recall certificates: the exact-baseline side is the 5-row probe set
    # broadcast against the corpus (same bound as topk_similarity); the
    # final certificate join is k x probes rows vs k x probes rows
    "topk_recall_lsh",
    "topk_recall_ivf",
    "topk_recall_pq",
    "topk_recall_opq",
    # self-kNN certificate: broadcast side = the vec_id < 30 probe slice
    # (30 rows) for the exact baseline; certificate join is 30 x k rows
    "knn_recall_self",
    "sketch_error_bounds",  # 5-row certificate joins (one row per sketch)
    # 1-row scalar-subquery mean broadcast into the filter
    "tpch_q22",
    # 1-row fraction-of-total threshold broadcast into the HAVING filter
    # (inequality — unlike tpch_q15's max-equality, Catalyst cannot
    # rewrite it into an equi-join):
    "tpch_q11",
    # 2-series spine: cross side is the bar-count-per-series aggregate
    # (hundreds of rows at any SF), not the raw events
    "pair_correlation",
    # 1-row corpus-stats scalar cross (N docs / avg doclen broadcast into
    # the per-(doc,term) scoring expression):
    "bm25_search",
    "tfidf_top_terms",
    "text_unigram_logprob",
    "corpus_drift_terms",  # 1-row (tot_a, tot_b, V) totals cross
    # 1-row params x 1-row code-count aggregates (index audit)
    "ann_index_build",
    "ann_index_append",
    "ann_index_delete",
    "knn_lsh_build",  # 1-row params x 1-row assignment-count (same audit shape)
    "curated_index_pipeline",  # 1-row certificate aggregates x each other
}

# Unkeyed windows allowed only over provably tiny/aggregated frames; each
# entry cites the bound (VERDICT r11 "what's wrong" #3).
UNKEYED_WINDOW_OK = {
    # bucket timeline: the window input is the per-pixel m4 aggregate
    # (fixed pixel count, hundreds of rows), not the raw series
    "chart_downsample_m4",
    # explicit global-rank demo over the 5-series aggregate (5 rows)
    "window_rank",
    # asof bucket-timeline fill: the window runs over the DISTINCT quote
    # buckets (time-grid-sized, not row-sized) — the documented exception
    # in test_plans.test_windows_are_keyed; the keyed variant is
    # asof_align_by
    "asof_align",
}


def lint(sf_dir: str) -> dict[str, list[str]]:
    spark = get_spark("plan-lint")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    bad: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001 - report, don't abort the sweep
            bad.setdefault(name, []).append(f"plan build failed: {e}")
            continue
        probs = []
        if "CartesianProduct" in plan:
            probs.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            probs.append("BatchEvalPython (row-at-a-time Python UDF)")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
            probs.append("BroadcastNestedLoopJoin (not allowlisted)")
        if name not in UNKEYED_WINDOW_OK:
            for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
                # spec = partitionExprs..., orderExprs..., frame. Partition
                # expressions are bare columns; order expressions carry
                # ASC/DESC — so a spec whose FIRST element is an ordering
                # has an empty partition list (a global single-task window).
                head = spec.split(",", 1)[0]
                # unkeyed forms: the spec opens with an ORDERING (empty
                # partition list) or directly with the frame itself (no
                # partition AND no order — e.g. a global running total,
                # which Spark funnels into a single task)
                if (
                    " ASC" in head
                    or " DESC" in head
                    or head.lstrip().startswith("specifiedwindowframe(")
                ):
                    probs.append(f"unkeyed window: {spec[:60]}")
                    break
        if probs:
            bad[name] = probs
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    bad = lint(sf_dir)
    for name, probs in sorted(bad.items()):
        print(f"FAIL  {name}: {'; '.join(probs)}")
    print(f"{len(QUERIES) - len(bad)}/{len(QUERIES)} plans clean")
    return len(bad)


if __name__ == "__main__":
    sys.exit(main())
