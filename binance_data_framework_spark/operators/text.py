"""Text-analysis operators over the documents corpus.

North-star extensions (SURVEY.md §2b): token/term statistics, lexicon
sentiment, quality scoring, language-ID heuristic, token counting,
fingerprinting. All built-in column expressions / broadcast joins — the hot
path never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny lexicons: driver-side constants, broadcast or folded into the plan.
SENTIMENT_LEXICON: dict[str, int] = {
    "fast": 2,
    "big": 1,
    "spark": 1,
    "vector": 1,
    "slow": -2,
    "small": -1,
    "dup": -1,
    "error": -2,
}

STOPWORDS = ("the", "a", "of", "and")

# BPE-ish token pattern: runs of letters, runs of digits, or single
# non-alphanumeric non-space symbols.
TOKEN_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def tokens_col(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), " ")


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc token statistics: counts, distinct counts, avg token length."""
    toks = tokens_col(text_col)
    n = F.size(toks).cast("long")
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.round(
            F.length(F.replace(F.col(text_col), F.lit(" "), F.lit(""))).cast("double")
            / n,
            6,
        ).alias("avg_token_len"),
    )


def term_frequency(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level term frequencies: explode + count — one shuffle keyed by
    term; map-side partial counts bound shuffle volume by vocab size."""
    return (
        df.select(F.explode(tokens_col(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def sentiment(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lexicon: dict[str, int] | None = None,
) -> DataFrame:
    """Lexicon sentiment: tokenize → broadcast-join lexicon → per-doc sum
    (per the Spark sentiment-at-scale pattern, PAPERS.md). Docs with no
    lexicon hits score 0."""
    lex = lexicon or SENTIMENT_LEXICON
    # Tiny lexicon -> literal map folded into the plan: per-row aggregate over
    # the token array, no explode/join/shuffle at all. (For a large lexicon
    # the broadcast-join formulation applies; see git history.)
    lex_map = F.create_map(*[F.lit(x) for kv in lex.items() for x in kv])
    score = F.aggregate(
        tokens_col(text_col),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.coalesce(F.element_at(lex_map, t), F.lit(0)),
    )
    return df.select(F.col(id_col), score.alias("sentiment"))


def quality_exprs(text_col: str = "text") -> dict[str, Column]:
    """The quality-signal column expressions (length, stopword ratio,
    repetition ratio — the standard pretraining-corpus filters) as reusable
    pure column math, composable into larger pipelines without a join."""
    toks = tokens_col(text_col)
    n = F.size(toks).cast("double")
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double")
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n
    return {
        "n_tokens": F.size(toks).cast("long"),
        "stopword_ratio": F.round(stop_hits / n, 6),
        "distinct_ratio": F.round(distinct_ratio, 6),
        "quality": F.round(
            F.when(distinct_ratio < 0.3, F.lit(0.0))
            .when(n < 5, F.lit(0.0))
            .otherwise(F.least(F.lit(1.0), distinct_ratio + stop_hits / n)),
            6,
        ),
    }


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic quality signals per doc — see quality_exprs."""
    exprs = quality_exprs(text_col)
    return df.select(F.col(id_col), *[c.alias(name) for name, c in exprs.items()])


# marker-token sets per language for the n-gram-free language-ID heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "fr": ("le", "la", "et", "un"),
    "de": ("der", "die", "und", "ein"),
    "es": ("el", "la", "y", "un"),
}


def lang_pred_col(text_col: str = "text") -> Column:
    """Marker-token language-ID expression: argmax of per-language marker hit
    counts with alphabetical tie-break, 'und' when no markers hit."""
    toks = tokens_col(text_col)
    hits = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    best = F.greatest(*hits.values())
    pred = F.lit("und")
    for lang in sorted(hits, reverse=True):
        pred = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(
            pred
        )
    return pred


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc language ID — see lang_pred_col."""
    return df.select(F.col(id_col), lang_pred_col(text_col).alias("pred_lang"))


def token_count_bpe(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Regex (BPE-ish) token count — whitespace count plus sub-token splits."""
    return df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("ws_tokens"),
        F.size(F.expr(f"regexp_extract_all({text_col}, '{TOKEN_PATTERN}', 0)"))
        .cast("long")
        .alias("bpe_tokens"),
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic 64-bit-ish document fingerprint (sha2 prefix) for
    dedup bookkeeping and stable sampling."""
    return df.select(
        F.col(id_col),
        F.substring(F.sha2(F.col(text_col), 256), 1, 16).alias("fingerprint"),
    )
