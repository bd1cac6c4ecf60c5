"""End-to-end training-corpus filter — the composition a web-scale data
pipeline actually materialises before tokenisation.

The reference stops at community detection; the surrounding pipeline
(SURVEY.md §2.7) provides each filter as an independent operator.  This
module composes them into the one answer users ask for: *which documents
survive*.  Every component is individually oracle-checked, and the
composed query's DuckDB twin is literally the composition of the
component twins, so the pipeline is verified end-to-end, not just
piecewise.

Scale shape: four independent per-doc feature tables (exact-dup keeper
flag, language, quality features, benchmark contamination), each a scan
+ hash-aggregate over the corpus, then equi-joins on ``doc_id`` — all
map-side combinable, no cross joins, no Python.  At 10^12 docs the four
feature passes pipeline independently and the join co-partitions on the
id; a pre-bucketed corpus table makes the joins exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def training_set(
    docs: DataFrame,
    benchmark: DataFrame,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    n_contam: int = 5,
    col: str = "text",
) -> DataFrame:
    """Documents that survive the full filter chain: exact-dedup keeper
    AND predicted language in ``langs`` AND composite quality ≥
    ``min_quality`` AND not contaminated by ``benchmark`` (5-gram
    overlap).  Returns (doc_id, lang_pred, n_tokens, quality_score).
    """
    from .dedup import decontaminate, dedup_exact
    from .textops import language_id, quality_score

    keep = dedup_exact(docs, col=col).select("doc_id", "is_kept")
    lang = language_id(docs, col=col).select("doc_id", "lang_pred")
    qual = quality_score(docs, col=col).select("doc_id", "n_tokens", "quality_score")
    cont = decontaminate(docs, benchmark, n=n_contam, col=col).select(
        "doc_id", "contaminated"
    )
    # every feature table already carries each doc_id exactly once, so
    # the join chain starts from keep — joining docs again would add a
    # fifth full-corpus scan for zero semantic effect
    return (
        keep
        .join(lang, "doc_id")
        .join(qual, "doc_id")
        .join(cont, "doc_id")
        .where(
            F.col("is_kept")
            & ~F.col("contaminated")
            & F.col("lang_pred").isin(list(langs))
            & (F.col("quality_score") >= min_quality)
        )
        .select("doc_id", "lang_pred", "n_tokens", "quality_score")
    )
