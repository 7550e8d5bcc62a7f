"""Training-data curation operators: packing conservation, sampling
determinism + plan shape, quantile-filter exactness."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from binance_data_framework_spark.operators import curation as CU
from binance_data_framework_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.001"


def test_pack_sequences_conserves_docs_and_tokens(spark):
    docs = load_table(spark, SF, "documents")
    n_docs = docs.count()
    n_tokens = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).first()["t"]
    packed = CU.pack_sequences(docs, budget=2048, n_shards=8)
    agg = packed.agg(
        F.sum("n_docs").alias("d"),
        F.sum("total_tokens").alias("t"),
        F.max("total_tokens").alias("mx"),
    ).first()
    assert agg["d"] == n_docs  # every doc lands in exactly one sequence
    assert agg["t"] == n_tokens  # no tokens created or lost
    # a sequence holds at most budget + one straddling doc's tokens
    max_doc = docs.select(F.max(F.size(F.split("text", " ")))).first()[0]
    assert agg["mx"] <= 2048 + max_doc


def test_sample_stratified_is_deterministic_narrow_filter(spark):
    docs = load_table(spark, SF, "documents")
    s1 = CU.sample_stratified(docs, rates={"en": 50}, default_rate=20)
    ids1 = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
    assert ids1 == ids2 and ids1  # reproducible, non-empty
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert set(ids1) <= all_ids
    # the whole sample is one narrow stage: NO shuffle in the plan
    plan = s1._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"stratified sample shuffled:\n{plan[:400]}"


def test_sample_reservoir_exact_k_per_stratum(spark):
    docs = load_table(spark, SF, "documents")
    k = 10
    sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    got = {
        r["lang"]: r["n"]
        for r in CU.sample_reservoir(docs, k=k)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == {lang: min(k, n) for lang, n in sizes.items()}


def test_quality_quantile_filter_keeps_exact_top_half(spark):
    docs = load_table(spark, SF, "documents")
    sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    out = CU.quality_quantile_filter(docs, keep_fraction=0.5)
    got = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got == {lang: math.ceil(n * 0.5) for lang, n in sizes.items()}
    # kept min score >= dropped max score per lang (rank cut is order-true)
    kept_min = out.groupBy("lang").agg(F.min("score").alias("kmin"))
    dropped = docs.join(out.select("doc_id"), "doc_id", "left_anti").withColumn(
        "score", F.col("n_chars") / F.size(F.split("text", " "))
    )
    dropped_max = dropped.groupBy("lang").agg(F.max("score").alias("dmax"))
    j = kept_min.join(dropped_max, "lang").collect()
    assert all(r["kmin"] >= r["dmax"] for r in j)


def test_decontaminate_short_docs_match_nothing(spark):
    """Docs shorter than n tokens yield NO grams (strict — a whole-text
    fallback would contaminate-match short docs against everything)."""
    train = spark.createDataFrame(
        [(1, "alpha beta", "en"), (2, "alpha beta gamma delta", "en")],
        "doc_id long, text string, lang string",
    )
    bench = spark.createDataFrame(
        [(99, "alpha beta gamma epsilon", "en")], "doc_id long, text string, lang string"
    )
    hits = {r["doc_id"]: r["n_shared"] for r in CU.decontaminate(train, bench, n=3).collect()}
    assert hits == {2: 1}  # only 'alpha beta gamma'; 2-token doc 1 is gram-free


def test_sample_hashes_survive_large_ids(spark):
    """Ids above 2^31 must not overflow the int64 hash arithmetic (Spark 4
    ANSI mode raises on overflow): the id is reduced mod 2^31 before the
    multiply. For ids < 2^31 the reduction is the identity, so existing
    sample membership (and the SQL oracles) are unchanged."""
    big = spark.range(2**33, 2**33 + 1000).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.lit("wiki").alias("source"),
        F.lit("alpha beta gamma").alias("text"),
        F.lit(15).alias("n_chars"),
    )
    strat = CU.sample_stratified(big, rates={"en": 50})
    n = strat.count()
    assert 0 < n < 1000  # no ArithmeticException, and actually selective
    res = CU.sample_reservoir(big, k=25)
    assert res.count() == 25


def test_sample_stratified_mixes_beyond_low_digits(spark):
    """Sample membership must depend on the full id, not id % 100: ids
    block-allocated on a stride of 100 (shard*10^6+k schemes) previously
    all shared one hash residue and got 0% or 100% regardless of the
    requested rate (code-review r4 finding)."""
    ids = spark.range(1000).select(
        (F.col("id") * 100).alias("doc_id"),
        F.lit("en").alias("lang"),
        F.lit("wiki").alias("source"),
    )
    n = CU.sample_stratified(ids, rates={"en": 50}).count()
    assert 300 < n < 700  # ~50%, not all-or-nothing
