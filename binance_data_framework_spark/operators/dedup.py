"""Deduplication operators for large-scale corpus curation.

Extension mandated by the north star (SURVEY.md §2b): exact hash dedup,
MinHash-LSH near-dedup, and SimHash fingerprints — each expressed as pure
DataFrame plans (no driver-side loops, no O(n^2) self-joins):

- exact: group/window on a content hash — one shuffle keyed by the 256-bit
  hash, so skew is impossible and the reducer state per key is one row.
- MinHash: k independent hash functions realized as xxhash64(seed, shingle);
  per-doc signature = k per-seed mins computed in ONE aggregation pass over
  exploded shingles (k agg exprs, map-side partial min).
- LSH banding: signature split into bands; candidate pairs = docs sharing a
  (band_idx, band_hash) bucket — an equi-join on the band key, linear-ish in
  output size instead of the n^2 cross product. Verification re-checks
  estimated Jaccard from full signatures.
- SimHash: 64-bit fingerprint; near-dup candidates share one of 4 16-bit
  chunks (Hamming<=3 within 64 bits guarantees >=1 identical chunk by
  pigeonhole) — again an equi-join, then exact Hamming verification with
  bit_count(xor).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def content_hash(col: Column | str) -> Column:
    """256-bit content hash (collision-safe at 100 TB row counts)."""
    return F.sha2(F.col(col) if isinstance(col, str) else col, 256)


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id row per distinct content hash (deterministic winner
    — plain dropDuplicates keeps an arbitrary shuffle-order row)."""
    w = Window.partitionBy(content_hash(text_col)).orderBy(id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def shingles(text_col: str, n: int = 3) -> Column:
    """Word n-gram shingles of a whitespace-tokenized text column.

    Built from n-1 zip_with passes over shifted copies of the token array —
    O(n_tokens) total. (A transform-over-indices + slice formulation is
    O(n_tokens^2) in Spark's interpreted higher-order functions and showed up
    as the single hottest expression in the dedup bench.) Docs with fewer
    than n tokens yield their whole text as one shingle.
    """
    toks = F.split(F.col(text_col), " ")
    sz = F.size(toks)
    grams = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, sz)
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    full = F.slice(grams, 1, F.greatest(sz - (n - 1), F.lit(0)))
    return F.when(sz >= n, full).otherwise(F.array(F.array_join(toks, " ")))


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig: array<long>[num_hashes]) computed per-row with array
    higher-order functions — NO explode, NO shuffle.

    Each hash_i(s) = xxhash64(i, s); signature_i = array_min over the doc's
    shingle array. An earlier formulation exploded shingles and grouped by
    doc (one shuffle of n_shingles rows per doc); the per-row form does the
    same work embarrassingly parallel in a single narrow stage — the right
    shape for a 100 TB corpus.
    """
    sh = shingles(text_col, shingle_n)
    base = F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(2147483648)))
    return _sig_from_h31(df, base, id_col, num_hashes)


def _sig_from_h31(
    df: DataFrame, h31_expr: Column, id_col: str, num_hashes: int
) -> DataFrame:
    """Signature slots from a 31-bit base-hash array: slot_i = min over
    shingles of (a_i*h + b_i) mod (2^31-1), with a DISTINCT multiplier per
    slot (universal-hash family; 31-bit operands keep every product
    int64-safe under ANSI mode). Hash the shingles ONCE into a checkpointed
    array, then run num_hashes cheap arithmetic passes — the
    one-pass-per-slot formulation re-evaluated the shingle construction and
    string hashing num_hashes times (no cross-expression CSE in Catalyst's
    interpreted HOFs) and measured ~4x slower at sf0.1.

    Two traps this code dodges, regression-tested by
    test_minhash_slots_are_independent: (1) a `lambda s, i=i:` HOF lambda
    has two parameters, which PySpark interprets as (element, index) — the
    "seed" silently becomes the shingle's ARRAY POSITION, identical for
    every slot, collapsing all slots to one hash function (est_jaccard
    degenerates to {0,1}); constants are bound OUTSIDE single-parameter
    lambdas instead. (2) a shared multiplier with per-slot offsets would
    make every slot pick the same argmin shingle — same degeneracy."""
    h31 = df.select(F.col(id_col), h31_expr.alias("_h31")).localCheckpoint(
        eager=False
    )

    def _slot(i: int) -> Column:
        a, b = F.lit(2654435761 + 2 * i), F.lit(40503 * i + 1)
        return F.array_min(
            F.transform(F.col("_h31"), lambda x: F.pmod(x * a + b, F.lit(2147483647)))
        )

    sig = F.array(*[_slot(i) for i in range(num_hashes)])
    return h31.select(F.col(id_col), sig.alias("sig"))


def minhash_signature_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Engine-portable MinHash signatures: identical slot mixes to
    minhash_signature (_sig_from_h31) over an engine-portable 31-bit
    shingle hash instead of xxhash64 — DuckDB reproduces it with list
    lambdas, which is what lets the driver hash-match the full MinHash+LSH
    pipeline. Production uses minhash_signature (same structure, JVM-native
    base hash).

    The shingle hash is TOKEN-level: each token is polynomial-hashed once
    (portable_shingle_hash31) and a shingle's hash is the Horner fold of
    its n consecutive token hashes mod 2^31-1. Hashing the materialized
    "tok tok tok" shingle strings instead re-ran the per-character
    polynomial over every token n times AND paid substr's O(position)
    scan per character of the longer string — the token-level form
    measured ~3x faster at sf0.1 with identical cross-engine semantics.
    Docs with fewer than shingle_n tokens fold ALL their token hashes
    into one shingle (init 7, same Horner step).

    The token-hash array is checkpointed BEFORE the shingle fold: the
    zip_with chain + short-doc branch reference it ~shingle_n times, and
    Catalyst's interpreted HOFs do no common-subexpression elimination —
    folding over the raw transform expression re-ran the per-character
    polynomial per reference and gave the 3x back (measured)."""
    toks = F.split(F.col(text_col), " ")
    thdf = df.select(
        F.col(id_col),
        F.transform(toks, lambda t: portable_shingle_hash31(t)).alias("_th"),
    ).localCheckpoint(eager=False)
    th = F.col("_th")
    sz = F.size(th)
    m, p = F.lit(2147483647), F.lit(1000003)

    def _horner(a: Column, b: Column) -> Column:
        return F.pmod(a * p + b, m)

    grams = th
    for k in range(1, shingle_n):
        grams = F.zip_with(grams, F.slice(th, k + 1, sz), _horner)
    full = F.slice(grams, 1, F.greatest(sz - (shingle_n - 1), F.lit(0)))
    short = F.array(F.aggregate(th, F.lit(7).cast("long"), _horner))
    base = F.when(sz >= shingle_n, full).otherwise(short)
    return _sig_from_h31(thdf, base, id_col, num_hashes)


def minhash_candidates(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 4,
    threshold: float = 0.5,
    band_on_slice: bool = False,
    num_hashes: int = 16,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, est_jaccard >= threshold) via LSH
    banding over MinHash signatures. ``band_on_slice`` keys the band join
    on the raw slot slice (array equality — collision-free and
    engine-portable for the oracle-checked variant) instead of its xxhash64
    (bare-long band keys, the slimmest shuffle — production default).

    ``num_hashes`` must match the signature generator's slot count and be
    divisible by ``num_bands``: unequal bands would silently drop trailing
    slots (recall loss), and num_bands > num_hashes would give EVERY doc a
    zero-length band slice — one constant band key, turning the band
    self-join into the full O(n²) cross product banding exists to avoid."""
    if num_bands <= 0 or num_hashes % num_bands != 0:
        raise ValueError(
            f"num_bands={num_bands} must be a positive divisor of "
            f"num_hashes={num_hashes} (equal bands, no empty slices)"
        )
    # Materialize signatures once: the banded self-join references `sigs` on
    # both sides and the pair filter reads them again — without a
    # materialization point Spark recomputes the signature expressions three
    # times.
    sigs = sigs.localCheckpoint(eager=False)
    # Band on BARE (id, band) keys: the self-join + pair dedup shuffle then
    # moves 2 longs per banded row instead of 2 full signatures per candidate
    # pair (each side is exploded num_bands ways — carrying `sig` through
    # multiplies shuffle bytes by ~num_bands * sig_len). Signatures join back
    # once per side afterwards, from the checkpointed sigs.
    rows_per_band = num_hashes // num_bands  # validated: exact, never empty
    slice_of = lambda b: F.slice("sig", b * rows_per_band + 1, rows_per_band)  # noqa: E731
    band_key = (
        (lambda b: slice_of(b)) if band_on_slice else (lambda b: F.xxhash64(slice_of(b)))
    )
    # Runtime guard: the plan-time divisibility check above cannot see the
    # actual signature width, and a sigs frame generated with a different
    # num_hashes would either drop trailing slots (recall loss) or band on
    # empty slices (one constant key => O(n²) self-join). assert_true runs
    # inside the band-key expression, so Catalyst cannot prune it away.
    sig_len_ok = F.assert_true(
        F.size("sig") == num_hashes,
        F.concat(
            F.lit(f"minhash_candidates: signature width != num_hashes={num_hashes}: "),
            F.size("sig").cast("string"),
        ),
    )
    banded = sigs.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bands - 1)),
                lambda b: F.when(sig_len_ok.isNull(), band_key(b)),
            )
        ).alias("band_idx", "band_hash"),
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band_idx", "band_hash")
    b = banded.select(F.col(id_col).alias("id_b"), "band_idx", "band_hash")
    pairs = (
        a.join(b, on=["band_idx", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
        .join(sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a")), on="id_a")
        .join(sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b")), on="id_b")
    )
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.size("sig_a")
    return (
        pairs.withColumn("est_jaccard", est)
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def dedup_near_minhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    num_bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Drop near-duplicates: a doc is removed if a lower-id doc is a
    near-duplicate (single-link via direct pairs; full connected components
    would iterate min-label propagation — see cluster_min_label)."""
    sigs = minhash_signature(df, text_col, id_col, num_hashes, shingle_n)
    pairs = minhash_candidates(sigs, id_col, num_bands, threshold, num_hashes=num_hashes)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def _poly_hashes(t: Column) -> tuple[Column, Column]:
    """Two 31-bit polynomial rolling hashes over the string's code points
    (mod the Mersenne prime 2^31-1 and its neighbor) — the engine-portable
    hash primitive: pure int64 arithmetic + HOFs, so ANY SQL engine with
    list lambdas (DuckDB list_transform/list_reduce) computes bit-identical
    values. Exists for cross-engine verifiability, not speed (production
    paths use xxhash64, JVM-native)."""
    chars = F.when(F.length(t) > 0, F.transform(
        F.sequence(F.lit(1), F.length(t)),
        lambda i: F.ascii(F.substr(t, i, F.lit(1))).cast("long"),
    )).otherwise(F.array().cast("array<long>"))
    h1 = F.aggregate(
        chars, F.lit(7).cast("long"),
        lambda a, c: F.pmod(a * F.lit(31) + c, F.lit(2147483647)),
    )
    h2 = F.aggregate(
        chars, F.lit(7).cast("long"),
        lambda a, c: F.pmod(a * F.lit(37) + c, F.lit(2147483629)),
    )
    return h1, h2


def portable_token_hash(t: Column) -> Column:
    """Engine-portable 62-bit token hash (see _poly_hashes), packed as
    hi*2^31 + lo — what lets the driver hash-match the whole simhash fold
    against an independent engine (production simhash stays xxhash64)."""
    h1, h2 = _poly_hashes(t)
    return h1 * F.lit(2147483648).cast("long") + h2


def portable_shingle_hash31(s: Column) -> Column:
    """Engine-portable 31-bit shingle hash mixing both polynomial hashes
    ((h1*2654435761 + h2) mod 2^31; the product stays within int64). The
    31-bit range keeps the per-slot minhash mixes (a_i*h + b_i) int64-safe
    for every slot multiplier."""
    h1, h2 = _poly_hashes(s)
    return F.pmod(h1 * F.lit(2654435761) + h2, F.lit(2147483648))


def simhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    token_hash=None,
) -> DataFrame:
    """64-bit SimHash per doc — per-row array HOFs, no explode, no UDF.

    Token hashes are computed once into an array; a SINGLE aggregate pass
    folds them into a 64-slot per-bit popcount accumulator (zip_with over
    the bit-index vector), and one more zip_with turns majority bits into
    the packed signature. An earlier form ran 64 separate filter passes
    over the hashed array — identical output, measured 8x slower at sf0.1
    (interpreted HOF passes dominate; one traversal beats sixty-four).
    shiftright/shiftleft go through call_function: the SQL functions accept
    a column shift amount, only the Python wrappers restrict it to int.

    ``token_hash`` swaps the per-token hash primitive: default xxhash64
    (fast, JVM-only); pass ``portable_token_hash`` (with bits=62) for the
    cross-engine-verifiable variant the driver oracle-checks."""
    toks = F.split(F.col(text_col), " ")
    hashed = F.transform(toks, token_hash or (lambda t: F.xxhash64(t)))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.lit(bits - 1))
    counts = F.aggregate(
        hashed,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            idx,
            lambda c, b: c + F.call_function("shiftright", h, b).bitwiseAND(F.lit(1)),
        ),
    )
    sim = F.aggregate(
        F.zip_with(
            counts,
            idx,
            lambda c, b: F.when(
                c * 2 > n, F.call_function("shiftleft", F.lit(1).cast("long"), b)
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )
    return df.select(F.col(id_col), sim.alias("simhash"))


def simhash_near_pairs(
    sigs: DataFrame, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Pairs with Hamming(simhash) <= max_hamming via 16-bit chunk banding
    (pigeonhole: <=3 differing bits over 4 chunks leaves >=1 chunk equal)."""
    # materialize once: the banded self-join references sigs on both sides
    # (same reason minhash_candidates checkpoints — without it the signature
    # expressions evaluate twice)
    sigs = sigs.localCheckpoint(eager=False)
    chunks = F.array(
        *[
            F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias(f"c{i}")
            for i in range(4)
        ]
    )
    banded = sigs.select(
        id_col, "simhash", F.posexplode(chunks).alias("chunk_idx", "chunk_val")
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "chunk_idx", "chunk_val"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "chunk_idx", "chunk_val"
    )
    return (
        a.join(b, on=["chunk_idx", "chunk_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def cluster_min_label(
    pairs: DataFrame, ids: DataFrame, id_col: str, max_iter: int = 50
) -> DataFrame:
    """Connected components by min-label propagation over the candidate-pair
    edge list, iterated UNTIL CONVERGENCE (max_iter is a safety bound, not
    the stopping rule). Returns (id, cluster_id).

    Each iteration does (a) neighbor-min propagation and (b) a pointer-jump
    (label <- label's label), so a chain of diameter D converges in
    O(log D) rounds rather than O(D) — a 1M-hop duplicate chain is ~20
    rounds, not 1M. Labels are monotonically non-increasing, so convergence
    is detected by a scalar sum(label) fixpoint (one tiny agg action per
    round; decimal(38) so the sum cannot overflow at any corpus size) —
    no extra join against the previous labels needed. Per-round
    localCheckpoint truncates the lineage that iterative plans otherwise
    accumulate."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    ).localCheckpoint(eager=False)
    # Only nodes touching an edge can ever change label: iterate over THEM
    # (|candidate-pair endpoints| — tiny vs the corpus), and union the
    # untouched ids back as singleton clusters at the end. The loop's
    # frames shrink from corpus-sized to duplicate-graph-sized.
    nodes = edges.select("src").distinct()
    labels = nodes.select("src", F.col("src").alias("label"))
    prev_sum = None
    for _ in range(max_iter):
        neigh = (
            edges.join(labels.withColumnRenamed("src", "dst"), on="dst")
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        lbl = (
            labels.join(neigh, on="src", how="left")
            .select("src", F.least("label", F.coalesce("nlabel", "label")).alias("label"))
        )
        # pointer jump: follow the current label one more step (path halving)
        parent = lbl.select(F.col("src").alias("_pnode"), F.col("label").alias("_plabel"))
        lbl = (
            lbl.join(parent, lbl["label"] == parent["_pnode"], how="left")
            .select("src", F.least("label", F.coalesce("_plabel", "label")).alias("label"))
        )
        labels = lbl.localCheckpoint(eager=True)  # truncate lineage per iter
        cur_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).first()["s"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    singletons = ids.join(
        nodes.withColumnRenamed("src", id_col), on=id_col, how="left_anti"
    ).select(F.col(id_col), F.col(id_col).alias("cluster_id"))
    return (
        labels.select(F.col("src").alias(id_col), F.col("label").alias("cluster_id"))
        .unionByName(singletons)
    )


def fuzzy_edit_pairs(
    df: DataFrame,
    name_col: str,
    block_expr: Column,
    max_dist: int = 2,
) -> DataFrame:
    """Blocked edit-distance near-duplicate pairs over a DICTIONARY of
    distinct strings (record-linkage style, complementing the token-set
    methods above: minhash/simhash miss single-character typos, levenshtein
    catches them).

    Scale shape: dedupe the dictionary, not the rows — `distinct` first
    bounds the self-join input by the vocabulary size (entity names / brands
    / hosts are heavy-tailed: billions of rows, thousands of distinct
    strings), then the block key (caller-chosen, e.g. last token or
    length+prefix band) bounds candidate pairs to O(sum block^2) over
    vocabulary-sized blocks. levenshtein() is JVM codegen, evaluated only
    on blocked candidates. Blocking recall is a documented property of the
    chosen block key (a typo in the block token moves the string to another
    block), exactly as in standard record linkage.
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    # block_expr is evaluated against the CALLER'S columns (before any
    # rename), so it is written in terms of name_col, e.g.
    # F.element_at(F.split(F.col("p_name"), " "), -1)
    names = (
        df.select(F.col(name_col).alias("name"), block_expr.alias("blk"))
        .where(F.col("name").isNotNull())
        .distinct()
    )
    a = names.select(F.col("name").alias("name_a"), F.col("blk"))
    b = names.select(F.col("name").alias("name_b"), F.col("blk"))
    return (
        a.join(b, on="blk")
        .where(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist")
    )
