"""Streaming ANN serving: top-k search over the committed index for a
STREAM of probe vectors — the query-side counterpart of the ingest gate
(neardup_ingest feeds the index; this serves it).

Why foreachBatch and not a stream-static join: the search is a ranked
window (row_number per probe over ADC scores), and ranking windows are
not allowed on streaming DataFrames — but each micro-batch's probe set
is a perfectly ordinary BATCH probe side, so the committed-index search
(similarity.topk_cosine_ivfpq with the persisted codes) runs unchanged
per batch and its results append to the sink. The probe side of that
search is batch-sized by construction; the corpus side reads only the
probed cells of the committed code layout plus the shortlist's exact
vectors (semi-join-gated, O(k*refine*probes) rows).

Hot index reload: the serving loop re-loads the LATEST committed
snapshot at a configurable batch cadence, so an index rebuild/append/
delete landing mid-stream is served from the next reload on — each
batch reads one consistent snapshot (the store's manifest protocol
guarantees no torn index), and delete()'s tombstone masking applies the
moment the reloaded snapshot carries it.

Exactly-once: results are keyed (batch_id, probe_id, rank) and stamped
with the served index version; the checkpoint bounds replay, and a
replayed batch recomputes deterministic rows, making an idempotent
downstream merge trivial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from binance_data_framework_spark.operators import similarity as S


def serve_batch(
    probes: DataFrame,
    store,
    idx,
    corpus: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame | None:
    """One micro-batch's searches against a loaded index handle. The
    probe CELLS are resolved driver-side from the model (probe-sized
    math), the code read is physically pruned to those cells, and the
    exact re-rank pulls shortlist vectors from ``corpus`` — the static
    vector table the index was built over (the index stores CODES, not
    raw vectors; every real ANN serving tier keeps the vector table as
    the re-rank source). Probe ids must be disjoint from corpus ids
    (external queries) or identical rows (self-search). Returns
    (probe_id, vec_id, cosine, rank), or None for an empty batch."""
    import numpy as np

    rows = probes.select(id_col, vec_col).collect()  # micro-batch-sized
    if not rows:
        return None
    pv = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    cent = np.array(idx.centroids)
    d2 = ((pv[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    cells = sorted({int(c) for row in d2 for c in np.argsort(row)[:nprobe]})
    probe_ids = [r[id_col] for r in rows]
    base = corpus.select(id_col, F.col(vec_col).cast("array<double>").alias(vec_col))
    probe_df = corpus.sparkSession.createDataFrame(
        [(r[id_col], [float(x) for x in r[vec_col]]) for r in rows],
        f"{id_col} bigint, {vec_col} array<double>",
    )
    # probe rows ride along so probe_filter resolves them in df; they can
    # never enter the candidate shortlist (the shortlist comes from the
    # committed codes, which hold only corpus ids)
    df = base.join(probe_df, id_col, "left_anti").unionByName(probe_df)
    return S.topk_cosine_ivfpq(
        df,
        F.col(id_col).isin(probe_ids),
        k=k,
        nprobe=nprobe,
        dim=idx.dim,
        m_sub=idx.m_sub,
        ksub=idx.ksub,
        id_col=id_col,
        vec_col=vec_col,
        centroids=idx.centroids,
        books=idx.pq_books,
        coded=store.codes("pq", cells=cells),
    )


def stream_ann_serve(
    probes: DataFrame,
    store,
    corpus: DataFrame,
    results_path: str,
    checkpoint_dir: str,
    k: int = 10,
    nprobe: int = 4,
    reload_every: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trigger_available_now: bool = True,
):
    """Attach committed-index top-k serving as a foreachBatch sink on a
    probe-vector stream. Results (batch_id, index_version, probe_id,
    vec_id, cosine, rank) append to ``results_path`` as parquet.

    ``reload_every``: re-load the committed index every that many
    micro-batches (1 = every batch — each load is model-sized: one
    manifest resolve + the JSON sidecar; code files are read lazily per
    search). Larger cadences amortize the sidecar read when the index
    is known to change rarely; 0 pins the first loaded version for the
    stream's lifetime."""
    state: dict = {"idx": None}

    def serve(batch_df: DataFrame, batch_id: int) -> None:
        if state["idx"] is None or (
            reload_every > 0 and batch_id % reload_every == 0
        ):
            idx = store.load()
            if idx is None:
                raise ValueError(
                    f"stream_ann_serve: no committed index at {store.root}"
                )
            state["idx"] = idx
        out = serve_batch(
            batch_df, store, state["idx"], corpus, k=k, nprobe=nprobe,
            id_col=id_col, vec_col=vec_col,
        )
        if out is None:
            return
        (
            out.withColumn("batch_id", F.lit(batch_id).cast("long"))
            .withColumn(
                "index_version", F.lit(state["idx"].version).cast("long")
            )
            .write.mode("append")
            .parquet(results_path)
        )

    writer = probes.writeStream.foreachBatch(serve).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
