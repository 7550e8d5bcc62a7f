"""Streaming near-duplicate-gated corpus ingest: continuous curation.

The batch dedup tier answers "which docs in THIS corpus near-duplicate
each other"; a 100 TB pipeline also needs the INCREMENTAL form — every
arriving batch must be checked against everything already accepted,
without rescanning the corpus. This module composes three existing
pieces into that gate:

- MinHash signatures + LSH bands (operators/dedup.minhash_signature /
  minhash_bands — the same arithmetic as the batch candidate
  generator, so batch and streaming agree on what "near-duplicate"
  means);
- a persisted, bucket-partitioned band index
  (docstore.BandIndexStore): per batch, candidate lookup reads ONLY
  the buckets the batch's band keys hash to, and accepted docs'
  bands append in one add-only commit — the index grows with the
  corpus, the lookup cost with the batch;
- the transactional DocumentStore: accepted docs (carrying their
  signature column) upsert idempotently, so checkpoint-replayed
  batches converge instead of duplicating.

Gate semantics per micro-batch, in order:
1. in-batch self-dedup (lowest id of each near-pair survives —
   dedup_near_minhash's deterministic rule);
2. (optional) eval decontamination: batch bands against a READ-ONLY
   benchmark index built by build_eval_index() — a doc near-duplicating
   an eval doc is dropped before it can reach any store ("never train
   on benchmark data", enforced at ingest);
3. corpus check: batch bands -> BandIndexStore.candidates ->
   same-id pairs are checkpoint REDELIVERIES, not duplicates (the
   doc is already stored; the keyed upsert makes re-saving it a
   no-op) -> remaining candidates verify est_jaccard against the
   stored signatures (point-read via DocumentStore.read_keys — shard
   -pruned, no corpus scan) and drop at >= threshold;
4. survivors: doc store write (one commit — save_mode="append_new"
   writes only the provably-new docs as an ADD-ONLY commit, the
   O(batch) path; "upsert" keeps the pre-r9 last-write-wins merge)
   then band append (one add-only commit). A crash between the two
   commits leaves docs stored but unindexed for one batch; the
   checkpoint replays the batch, append_docs(on_existing="skip") /
   the keyed upsert absorbs the doc rows, and the band append
   completes — convergent, at the cost of possibly-duplicate band
   rows (candidates are distinct-ed, so duplicates cost bytes, not
   correctness).

Scale shape: per batch the work is O(batch) signatures (narrow),
O(batch x num_bands) band rows, O(touched buckets) candidate IO, a
row-group-pruned point read for verification, and a batch-sized
ADD-ONLY store write — nothing scans or rewrites the corpus (the r9
finding: the upsert save was touched_shards x shard_size, a
whole-store rewrite per batch once keys hash everywhere; measured as
the gate's only super-flat term across corpus decades). The est
verification is exact on the stored signatures, so the gate's
false-drop rate equals the batch dedup tier's (banding recall x
signature estimate), not a new approximation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from binance_data_framework_spark.operators.dedup import (
    minhash_bands,
    minhash_candidates,
    minhash_signature,
)


def _banded_drops(
    sigs: DataFrame,
    docstore,
    band_store,
    id_col: str,
    num_bands: int,
    num_hashes: int,
    threshold: float,
    same_id_is_redelivery: bool,
    return_redeliveries: bool = False,
):
    """Batch ids to DROP against one persisted (band index, doc store)
    pair: band the batch signatures, look up candidate collisions in only
    the touched buckets, verify est_jaccard exactly against the stored
    signatures (shard-pruned point read), keep ids at >= threshold. The
    ONE corpus-check implementation shared by the in-corpus stage (where
    a same-id collision is a checkpoint redelivery, not a duplicate) and
    the eval-decontamination stage (where ids are from a DIFFERENT corpus
    — an id collision is coincidence and must still verify by content).

    ``return_redeliveries=True`` additionally returns the same-id
    collision ids (the batch docs provably already stored — an identical
    redelivery's bands equal its stored bands, so it always collides
    with itself): the append-new save path uses them to know which
    survivors need no store write."""
    bands = minhash_bands(sigs, id_col, num_bands, num_hashes)
    # the candidate set feeds up to three consumers (the emptiness probe,
    # the drop verification, and the redelivery split) — one eager
    # checkpoint replaces three bucket-pruned index scans + their
    # driver-side touched-bucket collects (review r9 #5); it is bounded
    # at batch x num_bands x collisions
    cand_all = band_store.candidates(bands).localCheckpoint(eager=True)
    cand = cand_all
    redelivered = None
    if same_id_is_redelivery:
        cand = cand_all.where(F.col("id_new") != F.col("id_stored"))
        if return_redeliveries:
            redelivered = (
                cand_all.where(F.col("id_new") == F.col("id_stored"))
                .select("id_new")
                .distinct()
            )
    if not cand.limit(1).count():
        empty = cand.limit(0).select("id_new")
        return (empty, redelivered) if return_redeliveries else empty
    stored_sigs = docstore.read_keys(
        cand.select(F.col("id_stored").alias(docstore.key_col)).distinct()
    ).select(
        F.col(docstore.key_col).alias("id_stored"),
        F.col("sig").alias("_sig_stored"),
    )
    # exact est on the stored signatures — same eq/num_hashes arithmetic
    # as minhash_candidates
    est = (
        F.aggregate(
            F.zip_with(
                F.col("sig"),
                F.col("_sig_stored"),
                lambda p, q: (p == q).cast("int"),
            ),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        / F.lit(float(num_hashes))
    )
    drops = (
        cand.join(sigs.withColumnRenamed(id_col, "id_new"), "id_new")
        .join(stored_sigs, "id_stored")
        .where(est >= threshold)
        .select("id_new")
        .distinct()
    )
    return (drops, redelivered) if return_redeliveries else drops


def build_eval_index(
    eval_docs: DataFrame,
    eval_docstore,
    eval_band_store,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    num_bands: int = 4,
    shingle_n: int = 3,
) -> int:
    """One-time (re-runnable) indexing of a BENCHMARK/eval corpus so the
    streaming gate can refuse contaminated training docs at ingest: store
    each eval doc with its MinHash signature (the gate's est verification
    point-reads it) and append its LSH bands to a dedicated band index.
    Uses the same signature/banding arithmetic — and the same param
    pinning — as the gate itself, so "contaminated" means exactly what
    the batch-tier decontaminate_neardup query means. Returns the number
    of eval docs indexed."""
    eval_band_store.pin_params(
        {"num_hashes": num_hashes, "num_bands": num_bands, "shingle_n": shingle_n}
    )
    sigs = minhash_signature(eval_docs, text_col, id_col, num_hashes, shingle_n)
    keyed = eval_docs.join(sigs, id_col).localCheckpoint(eager=True)
    n = keyed.count()
    if n:
        # band-leg idempotency (ADVICE r8 #4): save_docs is a keyed
        # upsert, but band append is add-only — a re-run would append the
        # same band rows again, growing the index with every invocation
        # and re-verifying duplicate collisions per lookup. Membership is
        # keyed off the BAND INDEX itself (a self-collision of the doc's
        # own bands — bucket-pruned lookup), NOT the doc store: the doc
        # commit lands first below, so a crash between the two commits
        # followed by a re-run must still see those docs as band-fresh
        # and complete their band rows (review r9 #2 — the doc-store
        # membership check left them unindexed forever, silently passing
        # contaminated docs that duplicated them). Already-banded ids
        # keep their committed bands — eval corpora are static by
        # contract; to change an indexed doc's text, rebuild both stores.
        bands = minhash_bands(
            keyed.select(id_col, "sig"), id_col, num_bands, num_hashes
        ).localCheckpoint(eager=True)
        already = (
            eval_band_store.candidates(bands)
            .where(F.col("id_new") == F.col("id_stored"))
            .select(F.col("id_new").alias(id_col))
            .distinct()
        )
        fresh = bands.join(already, id_col, "left_anti").localCheckpoint(
            eager=True
        )
        eval_docstore.save_docs(keyed)
        if fresh.limit(1).count():
            eval_band_store.append(fresh)
    return n


def corpus_drift_report(
    docstore,
    k: int = 20,
    text_col: str = "text",
    update_baseline: bool = True,
) -> list[dict] | None:
    """The gate's MONITORING leg (VERDICT r8 #6): top-k term-distribution
    drift of the CURRENT stored corpus vs the last monitored point. The
    baseline is a persisted vocab-grain (term, cnt) table under
    ``<root>/_drift_baseline`` (Heaps'-law sublinear — the persistable
    summary), NOT a time-travel read: snapshot retention is a trailing
    two-commit window by design, so a monitoring cadence of every N
    batches cannot rely on reading an N-commit-old snapshot. The drift
    arithmetic is text.drift_from_counts — the SAME scoring the oracled
    corpus_drift_terms query runs, factored so the two paths cannot
    diverge.

    Cost shape: one shuffle-free Arrow term-count pass over the corpus
    plus a vocab-grain join — a maintenance-cadence op (the same class
    as maybe_rebuild's retrain), not a per-batch one; the gate runs it
    every ``drift_every`` batches. Returns the report rows (model-sized:
    k of them) or None on the first call (baseline seeded); with
    ``update_baseline=False`` the report is computed without advancing
    the monitored point (a dry-run probe)."""
    from binance_data_framework_spark.operators.text import (
        corpus_term_counts,
        drift_from_counts,
    )

    import json as _json
    import uuid as _uuid

    man = docstore._snapshot()
    if not man or not man["files"]:
        return None  # nothing stored yet — no baseline to seed either
    spark = docstore.spark
    cur = corpus_term_counts(
        docstore.read(), text_col, docstore.key_col, "cnt_now"
    ).localCheckpoint(eager=True)  # survives the baseline swap below
    report = None
    # the baseline lives in a versioned directory resolved through a tiny
    # pointer sidecar — a plain mode("overwrite") would delete-then-write
    # in place, and a crash mid-rewrite would leave the NEXT monitored
    # batch computing drift against partial counts (a phantom shift from
    # the very leg meant to detect real ones; review r9 #8). The pointer
    # write is a single small-file replace; the previous directory is
    # removed only after the swap.
    fs, ptr_path = docstore._fs_path("_drift_baseline.json")
    old_dir = None
    if fs.exists(ptr_path):
        old_dir = _json.loads(docstore._read_bytes("_drift_baseline.json"))[
            "dir"
        ]
        base = spark.read.parquet(f"{docstore.root}/{old_dir}")
        report = [
            {
                "term": r["term"],
                "drift": r["drift"],
                "cnt_now": r["cnt_a"],
                "cnt_baseline": r["cnt_b"],
            }
            # collected BEFORE the swap: the baseline read feeds it
            for r in drift_from_counts(cur, base, k).collect()
        ]
    if update_baseline:
        new_dir = f"_drift_baseline-{_uuid.uuid4().hex}"
        cur.write.parquet(f"{docstore.root}/{new_dir}")
        docstore._write_bytes(
            "_drift_baseline.json", _json.dumps({"dir": new_dir}).encode()
        )
        if old_dir:
            fs_o, p_o = docstore._fs_path(old_dir)
            fs_o.delete(p_o, True)
    return report


def neardup_gate_batch(
    batch_df: DataFrame,
    docstore,
    band_store,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    num_bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    ann_store=None,
    ann_build_kwargs: dict | None = None,
    ann_rebuild_factor: float | None = 2.0,
    ann_compact_min_files: int | None = 64,
    band_rebucket_factor: float | None = 2.0,
    band_compact_min_files: int | None = 64,
    save_mode: str = "append_new",
    doc_compact_min_files: int | None = 64,
    doc_reshard_factor: float | None = 2.0,
    eval_docstore=None,
    eval_band_store=None,
    eval_threshold: float | None = None,
    drift_report: bool = False,
    drift_top_k: int = 20,
) -> dict:
    """Run one batch through the near-dup gate (module docstring).
    Returns {"arrived", "kept", "dropped_in_batch", "dropped_vs_corpus"}
    counts for observability; mutates the two stores.

    ``ann_store`` (VERDICT r6 #3 — the composed continuous pipeline):
    an AnnIndexStore whose (id_col, vec_col) name columns of the batch
    frame. When given, each accepted batch's vectors flow into the
    committed ANN index in the SAME cadence as the doc/band commits —
    first accepted batch trains the index (``ann_build_kwargs`` →
    build()), later batches append with the committed quantizer,
    ``skip_existing`` making checkpoint-replayed batches converge to a
    no-op. The corpus is then continuously curated AND continuously
    searchable: DocumentStore rows, band index, and ANN codes advance
    together, and the rolled fingerprint keeps certifying exactly the
    stored corpus.

    ``eval_docstore``/``eval_band_store`` (ingest-time benchmark
    DECONTAMINATION): a persisted eval-corpus index prepared by
    build_eval_index(). When given, every batch doc that near-duplicates
    an eval doc (est_jaccard >= ``eval_threshold``, default =
    ``threshold``) is dropped BEFORE it can reach any store — "never
    train on benchmark data" enforced at the gate, per batch, at the same
    bucket-pruned O(batch + touched buckets/shards) cost as the corpus
    check; the eval index is only ever READ here. Unlike the corpus
    check, a same-id collision is NOT a redelivery (the ids come from a
    different corpus) — it verifies by content like any candidate.

    ``ann_compact_min_files``: each append fragments its touched cells
    by one more file; once any (variant, cell) partition holds that many
    committed files the gate folds the layout back to one file per cell
    (compact_codes — layout-only, search-invariant). The check is a
    driver-side manifest count per batch; None disables (explicit
    maintenance instead). Together with the rebuild trigger below, the
    composed pipeline is self-maintaining: ingest, dedup, decontaminate,
    index, rebuild on growth, compact on fragmentation.

    ``save_mode`` (r9 — the gate scaling finding): how survivors reach
    the DocumentStore.

    - ``"append_new"`` (default): only survivors NOT already stored are
      written, via an ADD-ONLY commit (DocumentStore.append_docs) — the
      O(batch) write path. The already-stored set comes from the band
      check itself (an identical redelivery's bands equal its stored
      bands, so it always collides with itself — no extra store read),
      and append_docs(on_existing="skip") closes the
      crash-between-commits replay window with a pushed-filter point
      read. Semantics: FIRST-write-wins per doc id (a same-id re-send
      with drifted text does not replace the stored doc). Why this is
      the default: save_docs' upsert rewrite is touched_shards x
      shard_size — a batch whose keys hash to every shard rewrites the
      WHOLE store per micro-batch (measured: the gate grew 8 -> 36 s
      across corpus decades on exactly this term; with append_new the
      write is batch-sized forever).
    - ``"upsert"``: the pre-r9 behavior — last-write-wins keyed merge,
      for pipelines whose ids can legitimately re-arrive with updated
      content and that want the replacement.

    ``doc_compact_min_files``: append_new fragments each touched shard
    by one file per batch; once any shard holds this many committed
    files the gate folds the store back to one file per shard
    (DocumentStore.optimize — the shard analogue of the two index
    compaction legs). None disables.

    ``doc_reshard_factor``: for an AUTO-sharded DocumentStore
    (n_shards=None), re-derive the shard count at the grown corpus after
    each accepted batch (DocumentStore.maybe_reshard — O(1) sidecar
    check; the reshard itself is a narrow key-hash remap). Completes the
    growth-leg symmetry: IVF cells (r8), band buckets and doc shards
    (r9) all track the data they index. Pinned stores no-op; None
    disables.

    ``band_rebucket_factor`` / ``band_compact_min_files`` (VERDICT r8
    #1/#5 — band-index lifecycle parity with the ANN legs): when the
    band store is AUTO-bucketed (created with n_buckets=None), the gate
    re-derives its bucket count at the grown corpus after each append
    (BandIndexStore.maybe_rebucket — O(1) sidecar check; the rebucket
    itself is a narrow remap of committed band rows) so per-batch
    candidate reads stay flat as the corpus grows; pinned stores no-op.
    Independently, once any band bucket accumulates that many committed
    files from streaming appends, the gate folds the layout
    (BandIndexStore.compact() — also folds redelivery duplicates).
    None disables either leg (explicit maintenance instead).

    ``ann_rebuild_factor`` (ADVICE r7 #4): the batch-1 build pins BOTH
    the cell count (auto_centroids of the first batch's size) and the
    quantizer's training distribution; a corpus grown 1000x through
    appends would otherwise keep them forever, re-growing per-cell
    candidates linearly. After each append the gate runs
    ``ann_store.maybe_rebuild(stored corpus, grow_factor)`` — an O(1)
    sidecar check that force-retrains over the FULL DocumentStore corpus
    (current distribution, re-derived cell count) once appends have
    outgrown the committed cells by the factor. None disables (explicit
    maintenance-cadence rebuilds instead); pinned-n_centroids builds
    never auto-rebuild regardless."""
    # band hashes are a pure function of these — pin them in the band
    # store's layout sidecar so a gate reopened with different values
    # raises instead of silently admitting near-duplicates (ADVICE r6)
    if (eval_docstore is None) != (eval_band_store is None):
        # the decontamination stage needs BOTH: it is keyed off
        # eval_band_store, so a lone eval_docstore silently disables it,
        # and a lone eval_band_store fails only when a band collision
        # occurs — a misconfigured gate could run clean batches without
        # error (ADVICE r8 #2)
        raise ValueError(
            "neardup_gate_batch: pass eval_docstore AND eval_band_store "
            "together (decontamination needs the band index for candidate "
            "lookup and the doc store for signature verification), or "
            "neither"
        )
    band_store.pin_params(
        {"num_hashes": num_hashes, "num_bands": num_bands, "shingle_n": shingle_n}
    )
    if eval_band_store is not None:
        eval_band_store.pin_params(
            {
                "num_hashes": num_hashes,
                "num_bands": num_bands,
                "shingle_n": shingle_n,
            }
        )
    import time as _time

    # per-stage wall-clock (r10 observability, VERDICT r9 #2's "term"
    # accounting): each boundary below sits after an eager checkpoint /
    # count, so the deltas attribute real work, not plan laziness
    stage_sec: dict[str, float] = {}
    _mark = [_time.time()]

    def _tick(name: str) -> None:
        now = _time.time()
        stage_sec[name] = round(now - _mark[0], 3)
        _mark[0] = now

    batch_df = batch_df.localCheckpoint(eager=True)  # micro-batch sized
    n_arrived = batch_df.count()
    if not n_arrived:
        return {
            "arrived": 0,
            "kept": 0,
            "saved": 0,
            "dropped_in_batch": 0,
            "dropped_vs_corpus": 0,
            "dropped_contaminated": 0,
            "drift": None,
            # same shape as the non-empty return (review r10 #3: a
            # consumer indexing stats["stage_sec"] must not KeyError on
            # the first idle micro-batch)
            "stage_sec": stage_sec,
        }
    # signatures computed ONCE and shared by both stages — the earlier
    # form ran the shingle+hash pipeline (the dedup tier's dominant cost)
    # inside dedup_near_minhash and then AGAIN for the corpus check
    # (review r6b #8)
    sigs_all = minhash_signature(
        batch_df, text_col, id_col, num_hashes, shingle_n
    ).localCheckpoint(eager=True)
    # 1. in-batch self-dedup (deterministic: lowest id of each near-pair
    #    survives — dedup_near_minhash's rule, over the shared signatures)
    losers = (
        minhash_candidates(
            sigs_all, id_col, num_bands, threshold, num_hashes=num_hashes
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    sigs = sigs_all.join(losers, id_col, "left_anti").localCheckpoint(
        eager=True
    )
    n_self = sigs.count()
    _tick("sig_selfdedup")
    # 2. eval-decontamination check FIRST (when configured): contaminated
    #    docs must never reach any store, and dropping them before the
    #    corpus check keeps the two drop counters disjoint
    n_eval = n_self
    if eval_band_store is not None:
        contaminated = _banded_drops(
            sigs,
            eval_docstore,
            eval_band_store,
            id_col,
            num_bands,
            num_hashes,
            threshold if eval_threshold is None else eval_threshold,
            same_id_is_redelivery=False,
        )
        sigs = sigs.join(
            contaminated.withColumnRenamed("id_new", id_col), id_col, "left_anti"
        ).localCheckpoint(eager=True)
        n_eval = sigs.count()
        _tick("eval_check")
    # 3. corpus check via the persisted band index
    if save_mode not in ("append_new", "upsert"):
        raise ValueError(f"neardup_gate_batch: unknown save_mode {save_mode!r}")
    dropped, redelivered = _banded_drops(
        sigs,
        docstore,
        band_store,
        id_col,
        num_bands,
        num_hashes,
        threshold,
        same_id_is_redelivery=True,
        return_redeliveries=True,
    )
    survivors = (
        sigs.join(
            dropped.withColumnRenamed("id_new", id_col), id_col, "left_anti"
        )
        .select(id_col, "sig")
        .join(batch_df, id_col)
        .localCheckpoint(eager=True)
    )
    n_kept = survivors.count()
    _tick("corpus_check")
    # 4. commit: docs first, then bands (replay-convergent either way —
    # see module docstring crash note), then the ANN leg (also convergent:
    # skip_existing makes a replayed append a no-op)
    n_saved = 0
    if n_kept:
        if save_mode == "append_new":
            # band-detected redeliveries are provably stored WITH their
            # bands — excluded from the doc and band writes. The rest
            # splits by one pushed point-read of the batch's keys
            # (row-group-pruned, batch-bounded — review r9 #4):
            # - not stored            -> NEW: doc + bands
            # - stored, SAME sig      -> crash-window replay (doc landed,
            #   bands did not): bands only
            # - stored, DIFFERENT sig -> same-id re-send with drifted
            #   text: nothing — first-write-wins, and committing the
            #   drifted text's bands would leave phantom band rows whose
            #   content is not in the store
            maybe_new = survivors.join(
                redelivered.withColumnRenamed("id_new", id_col),
                id_col,
                "left_anti",
            ).localCheckpoint(eager=True)
            dman = docstore._snapshot()
            if dman and dman["files"]:
                stored_sig = docstore.read_keys(
                    maybe_new.select(docstore.key_col)
                ).select(
                    docstore.key_col, F.col("sig").alias("_stored_sig")
                )
                flagged = maybe_new.join(
                    stored_sig, docstore.key_col, "left"
                ).localCheckpoint(eager=True)
                to_store = flagged.where(F.col("_stored_sig").isNull()).drop(
                    "_stored_sig"
                )
                backfill = flagged.where(
                    F.col("_stored_sig") == F.col("sig")
                ).drop("_stored_sig")
                to_band = to_store.unionByName(backfill)
            else:
                to_store, to_band = maybe_new, maybe_new
            n_saved = docstore.append_docs(to_store, on_existing="trust")
        else:
            to_store, to_band = survivors, survivors
            docstore.save_docs(survivors)
            n_saved = n_kept
        _tick("save_docs")
        band_store.append(
            minhash_bands(
                to_band.select(id_col, "sig"), id_col, num_bands, num_hashes
            )
        )
        _tick("band_append")
        # band-index lifecycle, mirroring the ANN legs below (VERDICT r8
        # #1/#5): an AUTO-bucketed band store re-derives its bucket count
        # at the grown corpus (O(1) sidecar check per batch; pinned
        # stores no-op), and append-fragmented buckets fold back to one
        # file each once any bucket passes the file threshold (a
        # rebucket just rewrote the whole layout — nothing to fold).
        # doc-store growth leg (r9): an auto-sharded store re-derives its
        # shard count at the grown corpus; a reshard just rewrote the
        # whole layout, so the compaction check below is skipped that
        # batch (nothing left to fold)
        resharded = False
        if doc_reshard_factor is not None:
            resharded = docstore.maybe_reshard(doc_reshard_factor)
        # shard-compaction leg (r9, pairs with save_mode="append_new"):
        # each append fragments its touched shards by one file; fold once
        # any shard passes the threshold — the store stays scan-clean so
        # point reads and corpus scans never precedence-merge
        if doc_compact_min_files is not None and not resharded:
            from collections import Counter as _C

            dman = docstore._snapshot() or {}
            sfrag = _C(
                s
                for f in dman.get("files", [])
                if (s := docstore._shard_of(f)) is not None
            )
            if sfrag and max(sfrag.values()) >= doc_compact_min_files:
                docstore.optimize()
        band_rebucketed = False
        if band_rebucket_factor is not None:
            band_rebucketed = band_store.maybe_rebucket(band_rebucket_factor)
        # LSM fold leg (r10): batch appends land as delta runs (O(batch
        # files) instead of one file per bucket per batch — measured 7.6 s
        # of a 14.6 s gate at 360 buckets, linear in n_buckets); fold them
        # into the bucket layout once they reach a fraction of the base
        # (O(1) driver-side check; the fold amortizes to O(batch)). A
        # rebucket just rewrote the whole layout — nothing to fold.
        if not band_rebucketed:
            band_rebucketed = band_store.maybe_fold_deltas()
        if band_compact_min_files is not None and not band_rebucketed:
            man = band_store._snapshot() or {}
            from collections import Counter as _Counter

            frag = _Counter(
                b
                for f in man.get("files", [])
                if (b := band_store._bucket_of(f)) is not None
            )
            if frag and max(frag.values()) >= band_compact_min_files:
                band_store.compact()
        if ann_store is not None:
            # ALL survivors, not just the newly-stored slice (review r9
            # #1): a crash between the band append and this leg leaves a
            # doc stored+banded but unindexed; on replay it band-collides
            # with itself and is excluded from to_store — feeding
            # to_store here would lose its vector forever. skip_existing
            # makes the already-appended ids a no-op, so this converges.
            vecs = survivors.select(ann_store.id_col, ann_store.vec_col)
            if ann_store.load() is None:
                ann_store.build(vecs, **(ann_build_kwargs or {}))
            else:
                ann_store.append(vecs, skip_existing=True)
                rebuilt = False
                if ann_rebuild_factor is not None:
                    # rebuild source = the full STORED corpus (deleted docs
                    # excluded by construction), so the retrained quantizer
                    # sees the current distribution, not batch 1's
                    rebuilt = ann_store.maybe_rebuild(
                        docstore.read().select(
                            ann_store.id_col, ann_store.vec_col
                        ),
                        grow_factor=ann_rebuild_factor,
                    )
                # LSM fold leg (r10, mirrors the band index): micro-batch
                # appends land as code delta runs (O(1) files per batch,
                # not one per touched cell); fold them into the bucketed
                # layout at the rows-fraction trigger. A rebuild just
                # rewrote the whole layout — nothing to fold.
                if not rebuilt:
                    rebuilt = ann_store.maybe_fold_code_deltas()
                if ann_compact_min_files is not None and not rebuilt:
                    # each append fragments its touched cells by one file;
                    # fold once any cell passes the threshold (a rebuild
                    # just rewrote the whole layout — nothing to fold).
                    # The check is a driver-side manifest count, O(files).
                    man = ann_store._snapshot() or {}
                    from collections import Counter

                    frag = Counter(
                        tuple(f.split("/")[1:3])
                        for f in man.get("files", [])
                        if f.startswith("codes/")
                    )
                    if frag and max(frag.values()) >= ann_compact_min_files:
                        ann_store.compact_codes()
    # monitoring leg (VERDICT r8 #6): at the caller's cadence, diff the
    # stored corpus's term distribution against the last monitored
    # baseline and surface the top movers in the batch stats — a crawler
    # change or boilerplate wave shows up here batches before aggregate
    # stats move. Runs even for an all-dropped batch (the corpus may
    # still have drifted since the last monitored point).
    if n_kept:
        _tick("maintenance")
    drift = None
    if drift_report:
        drift = corpus_drift_report(docstore, k=drift_top_k, text_col=text_col)
        _tick("drift")
    return {
        "arrived": n_arrived,
        "kept": n_kept,
        "saved": n_saved,
        "dropped_in_batch": n_arrived - n_self,
        "dropped_contaminated": n_self - n_eval,
        "dropped_vs_corpus": n_eval - n_kept,
        "drift": drift,
        "stage_sec": stage_sec,
    }


def delete_documents(
    keys: DataFrame,
    docstore,
    band_store,
    ann_store=None,
    num_hashes: int = 16,
    num_bands: int = 4,
    shingle_n: int = 3,
) -> dict:
    """First-class removal across EVERY tier of the curated corpus
    (takedown / opt-out / decontamination): drop the doomed docs' LSH
    bands bucket-pruned (recomputed from their STORED signatures — a
    shard-pruned point read, no corpus scan), tombstone their vectors in
    the committed ANN index (searches exclude them immediately; physical
    purge rides the next append/rebuild), then delete the doc rows.

    Order is crash-consistent and every step idempotent: the doc row —
    the source of truth holding the signature the band drop needs — goes
    LAST, so a crash anywhere leaves the deletion re-runnable (bands
    re-drop to a no-op, the ANN tombstone set already has the ids, the
    doc delete completes). Ids never stored are no-ops throughout. The
    minhash params are validated against the band store's pinned layout
    (a delete with drifted params would recompute band keys that miss
    the stored rows — silently leaving them behind)."""
    band_store.pin_params(
        {"num_hashes": num_hashes, "num_bands": num_bands, "shingle_n": shingle_n}
    )
    keyed = (
        keys.select(docstore.key_col).distinct().localCheckpoint(eager=True)
    )
    doomed = docstore.read_keys(keyed).localCheckpoint(eager=True)
    n = doomed.count()
    if n:
        band_store.compact(
            drop_bands=minhash_bands(
                doomed.select(docstore.key_col, "sig"),
                docstore.key_col,
                num_bands,
                num_hashes,
            )
        )
    if ann_store is not None and ann_store.load() is not None:
        ann_store.delete(
            keyed.withColumnRenamed(docstore.key_col, ann_store.id_col)
            if docstore.key_col != ann_store.id_col
            else keyed
        )
    if n:
        docstore.delete_docs(keyed)
    return {"requested": keyed.count(), "deleted": n}


def stream_neardup_ingest(
    clean: DataFrame,
    docstore,
    band_store,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    drift_every: int | None = None,
    **gate_kwargs,
):
    """Attach the near-dup gate as a foreachBatch sink on a clean document
    stream (e.g. stream_jsonl_documents' clean side). Returns the started
    StreamingQuery. Exactly-once end to end: the checkpoint bounds replay
    to unprocessed source shards, the keyed upsert absorbs redelivered
    survivors, and redelivered already-stored docs are recognized via the
    same-id rule instead of being dropped as duplicates of themselves.

    ``drift_every``: run the corpus-drift monitoring leg every that many
    micro-batches (VERDICT r8 #6 — the shift detector promoted from
    pytest composition to gate feature); the report rides the gate stats
    ("drift" key) and the baseline advances at each monitored point.
    Cadence keys off batch_id, so a checkpoint-replayed batch re-monitors
    deterministically. None (default) disables."""

    if "drift_report" in gate_kwargs:
        raise ValueError(
            "stream_neardup_ingest: pass drift_every=<N> instead of "
            "drift_report — the stream owns the per-batch cadence"
        )

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        monitor = (
            drift_every is not None and batch_id % drift_every == drift_every - 1
        )
        neardup_gate_batch(
            batch_df, docstore, band_store, drift_report=monitor, **gate_kwargs
        )

    writer = clean.writeStream.foreachBatch(gate).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
