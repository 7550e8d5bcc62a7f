"""Training-data curation operators: sequence packing, deterministic
sampling, and quantile-based quality filtering.

North-star extensions (SURVEY.md §2b): the operations a pretraining data
pipeline runs between dedup and the trainer. All are pure DataFrame plans
with 100 TB-honest shapes:

- `pack_sequences` — concat-then-chunk packing of tokenized docs into
  fixed-token-budget training sequences. Packing is embarrassingly
  shardable: docs are assigned to `n_shards` deterministic shards and packed
  within each, so every window partition is bounded by corpus_size/n_shards
  (tune n_shards to executor memory; there is NO global window).
- `sample_stratified` — per-stratum rate sampling via a multiplicative hash
  of the id: a pure narrow FILTER, zero shuffles, deterministic across runs
  and engines (no RNG state, no seed files). The standard trick for
  reproducible corpus subsampling.
- `sample_reservoir` — exact-k-per-stratum deterministic "reservoir": rank
  by a mixed hash inside each stratum, keep the first k. One shuffle keyed
  by the stratum; the shuffled rows carry only (stratum, hash, id). For
  hot strata at extreme scale, the two-phase salted top-k in operators/skew
  is the drop-in replacement.
- `quality_quantile_filter` — keep each stratum's top fraction by a quality
  score, rank-based rather than threshold-on-interpolated-percentile, so
  results are exact, deterministic, and tie-stable (no float-equality
  knife-edges at the quantile boundary).
- `chunk_documents` — overlapping fixed-token-window chunking (the
  context-window split upstream of embedding/packing): a pure narrow
  projection, no shuffle, no UDF.
- `sample_mixture` — recipe-weighted data mixing: per-source downsampling
  to hit target output proportions at the largest feasible corpus size,
  via one model-sized count collect + the same portable id-hash filter as
  `sample_stratified`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Knuth multiplicative-hash constants: deterministic, engine-portable
# (plain int64 arithmetic — reproducible in any SQL engine, unlike
# engine-specific hash functions or RNG samplers). Ids are reduced mod 2^31
# BEFORE the multiply so the product stays within int64 for ANY int64 id
# ((2^31-1)*_MULT ~ 5.7e18 < 2^63-1): under Spark 4 ANSI mode / DuckDB an
# unreduced doc_id above ~3.5e9 would raise at runtime. For ids < 2^31 the
# reduction is the identity, so sample membership is unchanged.
_MULT = 2654435761
_LCG_A, _LCG_C, _LCG_M = 1103515245, 12345, 2147483648
_ID_MOD = 2147483648  # 2^31


def _mixed_id(id_col: str) -> Column:
    """id mod 2^31 — the overflow-safe multiplicand for the hash mixes."""
    return F.pmod(F.col(id_col), F.lit(_ID_MOD))


def whitespace_tokens(text_col: str = "text") -> Column:
    """Whitespace token count (the corpus fixture's tokenization unit)."""
    return F.size(F.split(F.col(text_col), " "))


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pack docs into fixed-token-budget training sequences
    (concat-then-chunk: a doc's sequence is the bin its START offset falls
    into within its shard's concatenated token stream).

    Returns (shard, seq_id, n_docs, total_tokens, first_doc, last_doc).
    Every window is partitioned by shard — bounded state, no global sort."""
    w = Window.partitionBy("shard").orderBy(id_col)
    t = df.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).alias("shard"),
        whitespace_tokens(text_col).alias("n_tok"),
    )
    c = t.withColumn(
        "cum", F.sum("n_tok").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    packed = c.withColumn(
        "seq_id",
        F.floor((F.col("cum") - F.col("n_tok")) / F.lit(float(budget))).cast("long"),
    )
    return packed.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )


def sample_stratified(
    df: DataFrame,
    rates: dict[str, int],
    default_rate: int = 20,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep ~rate% of each stratum via multiplicative hashing of the id —
    a narrow filter (NO shuffle, no RNG). `rates` maps stratum value ->
    integer percent.

    The threshold compares the FULL 31-bit mixed value against
    rate% of the range (h·100 < rate·2³¹ — pure int64-safe integer
    arithmetic), i.e. Knuth multiplicative hashing read through its high
    bits. The earlier form reduced the product mod 100, and
    (id·M) mod 100 is a bijection of id mod 100 — membership depended
    only on the id's last two decimal digits, so block-allocated id
    schemes (shard·10⁶+k) got 0% or 100% instead of rate%."""
    rate = F.lit(default_rate)
    for k, v in rates.items():
        rate = F.when(F.col(stratum_col) == k, F.lit(v)).otherwise(rate)
    h = F.pmod(_mixed_id(id_col) * F.lit(_MULT), F.lit(_ID_MOD))
    keep = h * F.lit(100) < rate * F.lit(_ID_MOD)
    return df.where(keep)


def sample_reservoir(
    df: DataFrame,
    k: int = 25,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact k docs per stratum, deterministically pseudo-random: rank by an
    LCG mix of the id within each stratum, keep rank <= k. One shuffle on
    the stratum key carrying (stratum, hash, id) only; swap in
    operators/skew's two-phase top-k when a stratum is pathologically hot."""
    h = F.pmod(_mixed_id(id_col) * F.lit(_LCG_A) + F.lit(_LCG_C), F.lit(_LCG_M))
    w = Window.partitionBy(stratum_col).orderBy(h.alias("h"), F.col(id_col))
    return (
        df.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
    )


def _word_ngrams(text_col: str, n: int) -> Column:
    """Word n-gram strings; docs with fewer than n tokens yield NO grams
    (strict — unlike dedup.shingles, which falls back to the whole text:
    decontamination must not match a short doc against everything)."""
    toks = F.split(F.col(text_col), " ")
    sz = F.size(toks)
    grams = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, sz)
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    full = F.slice(grams, 1, F.greatest(sz - (n - 1), F.lit(0)))
    return F.when(sz >= n, full).otherwise(F.array().cast("array<string>"))


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """Test-set decontamination report: training docs sharing at least one
    word n-gram with the benchmark corpus, with the count of distinct shared
    grams — the standard eval-leakage sweep run before LLM pretraining.

    100 TB shape: the benchmark side (an eval set — tiny vs the corpus) is
    reduced to a DISTINCT gram set and broadcast, so the corpus side is one
    narrow explode + broadcast semi-join + one doc-keyed aggregation. No
    corpus-sized shuffle of gram strings; the only shuffle carries
    (doc_id, matched gram) hit rows, proportional to contamination, not
    corpus size. Filter form: train.join(report, id, 'left_anti')."""
    bench_grams = (
        benchmark.select(F.explode(_word_ngrams(text_col, n)).alias("gram"))
        .distinct()
    )
    train_grams = train.select(
        F.col(id_col), *keep_cols, F.explode(_word_ngrams(text_col, n)).alias("gram")
    )
    return (
        train_grams.join(F.broadcast(bench_grams), on="gram")
        .groupBy(id_col, *keep_cols)
        .agg(F.count_distinct("gram").cast("long").alias("n_shared"))
    )


def quality_quantile_filter(
    df: DataFrame,
    keep_fraction: float = 0.5,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    chars_col: str = "n_chars",
) -> DataFrame:
    """Keep each stratum's top `keep_fraction` by quality score
    (mean token length = n_chars / n_tokens — short-token soup scores low).

    Rank-based, not percentile-threshold-based: rn <= ceil(count * f) is
    exact and tie-stable (ties broken by id), where filtering on
    score >= interpolated_percentile flips rows on float knife-edges.
    One stratum-keyed window pass; score is a narrow projection."""
    score = F.col(chars_col) / whitespace_tokens(text_col)
    ws = Window.partitionBy(stratum_col)
    w = Window.partitionBy(stratum_col).orderBy(F.desc("score"), F.col(id_col))
    return (
        df.withColumn("score", score)
        .withColumn("_cnt", F.count(F.lit(1)).over(ws))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.ceil(F.col("_cnt") * F.lit(keep_fraction)))
        .drop("_cnt", "_rn")
    )


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 2048,
    overlap: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping fixed-token-window chunks —
    the context-window chunking step a pretraining/RAG pipeline runs
    before embedding or packing (the operation upstream of
    pack_sequences, which bins whole docs).

    Returns (id, chunk_id, start_tok, n_tokens, chunk_text): chunk k
    covers tokens [k·stride, k·stride + max_tokens) with
    stride = max_tokens − overlap; the final chunk may be shorter, a doc
    with ≤ max_tokens tokens yields exactly one chunk, and a null-text
    doc yields none.

    Scale shape: a pure NARROW projection — tokenize once, compute the
    chunk count per row, posexplode the start offsets, slice. No shuffle,
    no UDF; at 100 TB this is map-side work that pipelines into whatever
    shuffle follows (embedding, dedup, packing)."""
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"need 0 <= overlap ({overlap}) < max_tokens ({max_tokens}): "
            f"stride = max_tokens - overlap must be positive"
        )
    stride = max_tokens - overlap
    # null-text docs yield NO chunks (documented): without the filter,
    # null-skipping greatest/least would fabricate one chunk claiming
    # n_tokens = max_tokens of a document that has none (code-review r5)
    base = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.split(F.col(text_col), " ").alias("_toks"),
        )
        .withColumn("_n", F.size("_toks"))
    )
    # chunks needed so the last window reaches the end:
    # max(ceil((n - overlap) / stride), 1)
    n_chunks = F.greatest(
        F.ceil((F.col("_n") - F.lit(overlap)) / F.lit(float(stride))),
        F.lit(1),
    ).cast("int")
    exploded = base.select(
        F.col(id_col),
        "_toks",
        "_n",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1), lambda k: k * F.lit(stride)
            )
        ).alias("chunk_id", "_start"),
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("_start").cast("long").alias("start_tok"),
        F.least(F.lit(max_tokens), F.col("_n") - F.col("_start"))
        .cast("long")
        .alias("n_tokens"),
        F.array_join(F.slice("_toks", F.col("_start") + 1, max_tokens), " ").alias(
            "chunk_text"
        ),
    )


def sample_mixture(
    df: DataFrame,
    target: dict[str, int],
    key_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic mixture sampling: downsample each source so the
    OUTPUT composition matches the target recipe — the data-mixing step
    that turns a heterogeneous crawl into a recipe-weighted pretraining
    corpus. ``target`` maps source -> INTEGER parts (e.g. {a: 5, b: 3,
    c: 2} for a 50/30/20 mix); sources absent from ``target`` are dropped.

    The output is the LARGEST corpus achieving the exact target mixture
    without oversampling any source: with binding source
    b = argmin(n_s/w_s), source s keeps rate_s = (w_s·n_b)/(w_b·n_s) of
    its rows, and the binding source keeps EVERYTHING — guaranteed, not
    approximate: integer parts make the per-source keep thresholds exact
    arbitrary-precision integers, floor(w_s·n_b·2³¹ / (w_b·n_s)), so the
    binding source's threshold is exactly 2³¹ (no float ppm rounding that
    could shave its top hash values). Per-source counts are one aggregate
    collect (model-sized: one row per source); membership is then the
    same engine-portable multiplicative id-hash as sample_stratified — a
    pure narrow FILTER, no shuffle, no RNG, reproducible across runs and
    engines (the DuckDB oracle recomputes the thresholds with the same
    integer arithmetic in HUGEINT)."""
    if not target or any(not isinstance(w, int) or w <= 0 for w in target.values()):
        raise ValueError(
            "target must be a non-empty {source: integer weight > 0} recipe "
            "(integer parts keep the keep-thresholds exact)"
        )
    counts = {
        r["k"]: r["n"]
        for r in df.groupBy(F.col(key_col).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r["k"] in target
    }
    missing = sorted(set(target) - set(counts))
    if missing:
        raise ValueError(f"target sources absent from the corpus: {missing}")
    # binding source: smallest n/w (ties broken by name for determinism —
    # the oracle selects with the same (n/w, name) ordering); thresholds
    # in exact Python big-int arithmetic, clamped to the full hash range
    b = min(sorted(target), key=lambda s: counts[s] / target[s])
    thr = {
        s: min(_ID_MOD, (w * counts[b] * _ID_MOD) // (target[b] * counts[s]))
        for s, w in target.items()
    }
    rate = F.lit(None).cast("long")
    for s, p in sorted(thr.items()):
        rate = F.when(F.col(key_col) == s, F.lit(p)).otherwise(rate)
    h = F.pmod(_mixed_id(id_col) * F.lit(_MULT), F.lit(_ID_MOD))
    return df.where(rate.isNotNull() & (h < rate))


def shard_assign(
    df: DataFrame, n_shards: int, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic shard assignment for training-data export: shard =
    (portable multiplicative id-hash) mod n_shards. Pure narrow
    projection — no shuffle, no RNG; the same doc lands in the same shard
    across runs and engines (the DuckDB oracle replays the identical
    int64 arithmetic). Hash-then-mod (rather than id mod n) decorrelates
    shard membership from id locality, so range-loaded corpora still
    spread uniformly."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    h = F.pmod(_mixed_id(id_col) * F.lit(_MULT), F.lit(_ID_MOD))
    return df.withColumn("shard", F.pmod(h, F.lit(n_shards)).cast("int"))


def shard_manifest(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-shard manifest (doc count, token/char totals, id range) — the
    sidecar a trainer consumes to plan epochs without opening shard files.
    One aggregate keyed by shard id (n_shards groups — model-sized)."""
    return (
        shard_assign(df, n_shards, id_col)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(whitespace_tokens(text_col)).alias("n_tokens"),
            F.sum(F.length(text_col)).alias("n_chars"),
            F.min(id_col).alias("min_doc_id"),
            F.max(id_col).alias("max_doc_id"),
        )
    )


def export_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
) -> None:
    """Write the corpus as n_shards deterministic training shards:
    ``path/shard=K/`` each holding ONE parquet file with rows sorted by
    id (file CONTENTS are reproducible given the same input; part-file
    names embed task UUIDs). RANGE-partitioned on the dense 0..n-1 shard
    ids so each shard is one write task — plain ``repartition(n, col)``
    hash-partitions the shard VALUE, and hash collisions pile several
    shards onto one straggler task while others sit empty (measured: 3 of
    4 shards in one task at n=4). Choose n_shards so
    corpus_size/n_shards fits a task (the same knob as pack_sequences);
    the sort is per-shard, never global."""
    out = shard_assign(df, n_shards, id_col)
    (
        out.repartitionByRange(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", id_col)
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
