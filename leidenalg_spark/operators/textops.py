"""Text analysis for training-data pipelines (prescribed first-class ops):
language-ID, quality scoring, token counting, document fingerprinting.

All pure ``pyspark.sql.functions`` expressions (JVM, whole-stage codegen;
zero Python in the row path) and deliberately *portable*: every formula
has an exact ANSI-SQL twin runnable by DuckDB for the oracle harness —
tokenisation by ``\\s+``, hashing by md5, ratios in double arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "est"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def tokens_col(col="text"):
    """Whitespace tokenisation of lower-cased text (portable: DuckDB
    ``string_split_regex(lower(text), '\\s+')``)."""
    return F.split(F.lower(F.trim(F.col(col))), r"\s+")


def token_count(docs: DataFrame, col="text") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword estimate
    (ceil(chars/4) — the common ~4-chars-per-token heuristic)."""
    return docs.select(
        "doc_id",
        F.size(tokens_col(col)).cast("long").alias("n_tokens"),
        F.ceil(F.length(F.col(col)) / F.lit(4.0)).cast("long").alias("n_tokens_bpe"),
    )


def quality_score(docs: DataFrame, col="text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features and a
    composite score in [0,1] (C4/Gopher-style heuristics)."""
    toks = tokens_col(col)
    n_chars = F.length(F.col(col)).cast("double")
    n_tokens = F.size(toks).cast("double")
    punct = (n_chars - F.length(F.regexp_replace(F.col(col), r"[.,;:!?]", ""))).cast("double")
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast("double")
    avg_tok = n_chars / F.greatest(n_tokens, F.lit(1.0))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1.0))
    stop_ratio = stop_hits / F.greatest(n_tokens, F.lit(1.0))
    score = (
        F.least(n_tokens / F.lit(50.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * 0.2
    )
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(avg_tok, 6).alias("avg_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def language_id(docs: DataFrame, col="text") -> DataFrame:
    """Stopword-marker language ID: argmax over per-language hit counts,
    ties broken alphabetically, 'und' when no marker hits."""
    toks = tokens_col(col)

    # NB: the lambda must take exactly one parameter — pyspark's
    # higher-order filter() passes (element, index) to 2-arg lambdas
    def _hits(words):
        return F.size(F.filter(toks, lambda t: t.isin(words))).cast("long")

    hits = {lang: _hits(words) for lang, words in LANG_MARKERS.items()}
    # argmax with ties broken alphabetically: max over
    # (hits, -alphabetical_rank, lang) structs
    pairs = F.array(
        *[
            F.struct(hits[lang].alias("hits"), F.lit(-i).alias("nrank"), F.lit(lang).alias("lang"))
            for i, lang in enumerate(sorted(LANG_MARKERS))
        ]
    )
    best = F.array_max(F.filter(pairs, lambda p: p["hits"] > 0))
    return docs.select(
        "doc_id",
        *[hits[lang].alias(f"hits_{lang}") for lang in sorted(LANG_MARKERS)],
        F.coalesce(best["lang"], F.lit("und")).alias("lang_pred"),
    )


def fingerprint(docs: DataFrame, col="text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the whitespace-
    normalised lower-cased text (portable to DuckDB md5()).  NULL text
    fingerprints as the empty string — never as a NULL that would drop
    out of downstream equi-joins."""
    norm = F.regexp_replace(F.lower(F.trim(F.coalesce(F.col(col), F.lit("")))), r"\s+", " ")
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))
