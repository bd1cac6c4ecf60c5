"""Text analysis for training-data pipelines (prescribed first-class ops):
language-ID, quality scoring, token counting, document fingerprinting.

All pure ``pyspark.sql.functions`` expressions (JVM, whole-stage codegen;
zero Python in the row path) and deliberately *portable*: every formula
has an exact ANSI-SQL twin runnable by DuckDB for the oracle harness —
tokenisation by ``\\s+``, hashing by md5, ratios in double arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def quality_score_col(col="text"):
    """The composite C4/Gopher-style quality score in [0,1] as a bare
    Column — shared by :func:`quality_score` (per-doc report) and
    :func:`filter_funnel` (survival counts)."""
    toks = tokens_col(col)
    n_chars = F.length(F.col(col)).cast("double")
    n_tokens = F.size(toks).cast("double")
    punct = (n_chars - F.length(F.regexp_replace(F.col(col), r"[.,;:!?]", ""))).cast("double")
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast("double")
    punct_ratio = punct / F.greatest(n_chars, F.lit(1.0))
    stop_ratio = stop_hits / F.greatest(n_tokens, F.lit(1.0))
    return (
        F.least(n_tokens / F.lit(50.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * 0.2
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
    score = quality_score_col(col)
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(avg_tok, 6).alias("avg_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def repetition_stats(docs: DataFrame, col="text") -> DataFrame:
    """Gopher-style repetition signals (public heuristics, Rae et al. 2021
    appendix A1): per doc, the fraction of tokens taken by the single most
    frequent token, and the fraction of token 3-grams that are duplicates
    (1 − distinct/total).  Degenerate docs (no tokens) score 0.
    Returns (doc_id, n_tokens, top_token_frac, dup_trigram_frac).

    Scale: two explode → hash-aggregate pipelines (word-count shape, map-
    side partial agg, no Python); docs shorter than 3 tokens contribute
    one whole-doc "trigram" (the shingling convention of dedup.shingles).
    """
    toks = tokens_col(col)
    t = docs.select("doc_id", F.explode(toks).alias("tok")).where(F.col("tok") != "")
    tok_stats = (
        t.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c") / F.sum("c")).alias("top_token_frac"),
             F.sum("c").alias("n_tokens"))
    )
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 3, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)))
    g = docs.select("doc_id", F.explode(grams).alias("g")).where(F.length("g") > 0)
    gram_stats = g.groupBy("doc_id").agg(
        (1.0 - F.count_distinct(F.col("g")) / F.count(F.lit(1))).alias("dup_trigram_frac")
    )
    return (
        docs.select("doc_id")
        .join(tok_stats, "doc_id", "left")
        .join(gram_stats, "doc_id", "left")
        .na.fill({"n_tokens": 0, "top_token_frac": 0.0, "dup_trigram_frac": 0.0})
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round("top_token_frac", 6).alias("top_token_frac"),
            F.round("dup_trigram_frac", 6).alias("dup_trigram_frac"),
        )
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


# Web-corpus cleaning patterns.  Deliberately simple character classes so
# the Java-regex (Spark) and RE2 (DuckDB) engines agree byte-for-byte.
URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
CTRL_RE = r"[\x00-\x1F\x7F]"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
PHONE_RE = r"\+?[0-9][0-9\-]{6,12}[0-9]"


def clean_text(docs: DataFrame, col="text") -> DataFrame:
    """Web-corpus text normalisation (C4-style pre-filtering): count and
    strip URLs and e-mail addresses, drop control characters, collapse
    whitespace runs, trim.  NULL text cleans to the empty string.
    Returns (doc_id, clean_text, n_urls, n_emails, n_chars_removed).

    Scale: a single projection of chained ``regexp_replace`` — pure JVM,
    whole-stage codegen, no shuffle; Catalyst prunes the scan to
    (doc_id, text).  Counts are taken on the RAW text (before stripping)
    so they are independent of the replacement order.
    """
    raw = F.coalesce(F.col(col), F.lit(""))
    n_urls = F.size(F.regexp_extract_all(raw, F.lit(URL_RE), F.lit(0)))
    n_emails = F.size(F.regexp_extract_all(raw, F.lit(EMAIL_RE), F.lit(0)))
    stripped = F.regexp_replace(F.regexp_replace(raw, URL_RE, " "), EMAIL_RE, " ")
    cleaned = F.trim(
        F.regexp_replace(F.regexp_replace(stripped, CTRL_RE, " "), r"\s+", " ")
    )
    return docs.select(
        "doc_id",
        cleaned.alias("clean_text"),
        n_urls.cast("long").alias("n_urls"),
        n_emails.cast("long").alias("n_emails"),
        (F.length(raw) - F.length(cleaned)).cast("long").alias("n_chars_removed"),
    )


def pii_mask(docs: DataFrame, col="text") -> DataFrame:
    """PII scrubbing for training corpora: mask e-mail addresses, IPv4
    addresses and phone-number-like digit runs with ``[EMAIL]`` /
    ``[IP]`` / ``[PHONE]`` placeholder tokens (the convention of public
    pipelines like BigScience ROOTS / CCNet-style scrubbing).  NULL text
    masks to the empty string.  Returns
    (doc_id, masked_text, n_emails, n_ips, n_phones).

    Counts are taken on the RAW text so they are independent of the
    replacement order; masking replaces e-mails first (their local parts
    contain digit runs), then IPs, then phones.  The patterns are simple
    character-class regexes, identical under Java regex and RE2, so the
    operator has an exact DuckDB twin.

    Scale: one chained ``regexp_replace`` projection — pure JVM,
    whole-stage codegen, no shuffle, scan pruned to (doc_id, text).
    """
    raw = F.coalesce(F.col(col), F.lit(""))
    n_emails = F.size(F.regexp_extract_all(raw, F.lit(EMAIL_RE), F.lit(0)))
    n_ips = F.size(F.regexp_extract_all(raw, F.lit(IPV4_RE), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(raw, F.lit(PHONE_RE), F.lit(0)))
    masked = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(raw, EMAIL_RE, "[EMAIL]"), IPV4_RE, "[IP]"
        ),
        PHONE_RE,
        "[PHONE]",
    )
    return docs.select(
        "doc_id",
        masked.alias("masked_text"),
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_phones.cast("long").alias("n_phones"),
    )


def top_ngrams(docs: DataFrame, n: int = 2, k: int = 20, col="text") -> DataFrame:
    """Corpus-level vocabulary statistics: the ``k`` most frequent token
    ``n``-grams (whitespace tokens, strict n-grams — documents shorter
    than ``n`` tokens contribute nothing).  Deterministic order: count
    descending, then n-gram ascending.  Returns (ngram, n_docs, count).

    Scale: word-count shape — explode → two-level hash aggregate with
    map-side partial aggregation; the final ``ORDER BY … LIMIT k``
    compiles to TakeOrderedAndProject (per-partition top-k merged on the
    driver), never a global sort of the distinct-ngram table.
    """
    if n < 1 or k < 1:
        raise ValueError("n and k must be positive")
    toks = tokens_col(col)
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    g = docs.select("doc_id", F.explode(grams).alias("ngram")).where(F.length("ngram") > 0)
    return (
        g.groupBy("ngram")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("count"),
        )
        .orderBy(F.desc("count"), F.asc("ngram"))
        .limit(k)
    )


def fingerprint(docs: DataFrame, col="text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the whitespace-
    normalised lower-cased text (portable to DuckDB md5()).  NULL text
    fingerprints as the empty string — never as a NULL that would drop
    out of downstream equi-joins."""
    norm = F.regexp_replace(F.lower(F.trim(F.coalesce(F.col(col), F.lit("")))), r"\s+", " ")
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))


def bm25_score(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    col="text",
) -> DataFrame:
    """Per-document BM25 relevance against a fixed query-term list
    (Robertson/Sparck-Jones, the Okapi formula with the +1 idf floor so
    scores stay positive even for terms in >half the corpus).  Returns
    (doc_id, n_hits, bm25) for documents matching ≥1 query term; scores
    rounded to 1e-6 for cross-engine reproducibility.

    Scale shape: the query-term ``isin`` filter is applied *before* the
    (doc, term) aggregation, so the tf table is |matches|, not |tokens|;
    corpus stats (N, avgdl) and per-term document frequencies are
    one-row / |query|-row aggregates broadcast into the scoring join.
    No Python in the row path; word-count-shaped shuffles only.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    toks = F.split(F.lower(F.trim(F.coalesce(F.col(col), F.lit("")))), r"\s+")
    dl = docs.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: t != "")).cast("double").alias("dl"),
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    t = docs.select("doc_id", F.explode(toks).alias("tok")).where(
        F.col("tok").isin(terms)
    )
    tf = t.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).cast("double").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "tok",
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0).alias("idf"),
    )
    scored = (
        tf.join(F.broadcast(idf), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .select(
            "doc_id",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
            ).alias("part"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.round(F.sum("part"), 6).alias("bm25"),
    )


def tfidf_top_terms(docs: DataFrame, k: int = 5, col="text") -> DataFrame:
    """Per-document top-``k`` terms by tf-idf (tf = in-doc count, idf =
    ln(N/df), df = docs containing the term).  Deterministic tie-break:
    tfidf descending, then term ascending.  Returns
    (doc_id, term, tf, tfidf, pos) with pos in 1..k; terms present in
    every document (idf = 0) still rank, just at score 0.

    Scale shape: explode → (doc, term) hash aggregate; df is a second
    hash aggregate over that (never re-reads the corpus); the per-doc
    top-k is a bounded window over the (doc, term) table — partitioned
    by doc_id, so no global sort and no skew beyond per-doc vocabulary.
    """
    if k < 1:
        raise ValueError("k must be positive")
    from pyspark.sql import Window

    toks = F.split(F.lower(F.trim(F.coalesce(F.col(col), F.lit("")))), r"\s+")
    t = docs.select("doc_id", F.explode(toks).alias("term")).where(F.col("term") != "")
    tf = t.groupBy("doc_id", "term").agg(F.count(F.lit(1)).cast("double").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf_l"),
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("pos", F.row_number().over(w).cast("long"))
        .where(F.col("pos") <= k)
        .select("doc_id", "term", F.col("tf_l").alias("tf"), "tfidf", "pos")
    )


def pmi_cooccurrence(
    docs: DataFrame,
    col="text",
    window: int = 5,
    min_pairs: int = 2,
    max_token_freq: int | None = None,
) -> DataFrame:
    """Token co-occurrence graph with PMI weights — the word-association
    edge builder (word2vec/PPMI-style windows).  Pairs are token
    occurrences at most ``window`` positions apart within a document,
    canonicalised (a < b); PMI = ln(p(a,b) / (p(a)·p(b))) with p(a,b) =
    n_ab/N_pairs and p(a) = n_a/N_tokens.  Returns (a, b, n_ab, pmi) —
    feed the positive-PMI edges straight into :func:`..leiden.leiden`
    for distributed topic discovery.

    Scale shape: co-occurrence is generated by OFFSET-EXPLODE — every
    position emits ``window`` (doc, pos+k) anchor keys that equi-join
    the position table — so the join produces exactly O(len·window)
    rows per document, never the O(len²) of a whole-doc self-join or a
    positional range join.  The aggregates are plain hash aggs (a hot
    stopword pair is one cell, map-side combined); ``max_token_freq``
    is a quality knob that drops stopword-grade tokens (by total
    occurrence count), not a safety requirement.  The two corpus
    scalars ride 1-row broadcast cross joins.
    """
    toks = tokens_col(col)
    pos = (
        docs.select("doc_id", F.posexplode(toks).alias("pos", "token"))
        .where(F.col("token") != "")
    )
    if max_token_freq is not None:
        occ_f = pos.groupBy("token").agg(F.count(F.lit(1)).alias("f"))
        pos = (
            pos.join(occ_f.where(F.col("f") <= max_token_freq), "token")
            .select("doc_id", "pos", "token")
        )
    anchors = pos.select(
        "doc_id", F.col("pos").alias("pi"), F.col("token").alias("ta"),
        F.explode(F.array(*[F.lit(k) for k in range(1, window + 1)])).alias("k"),
    ).select("doc_id", (F.col("pi") + F.col("k")).alias("pos"), "ta")
    right = pos.select("doc_id", "pos", F.col("token").alias("tb"))
    pairs = (
        anchors.join(right, ["doc_id", "pos"])
        .where(F.col("ta") != F.col("tb"))
        .select(F.least("ta", "tb").alias("a"), F.greatest("ta", "tb").alias("b"))
    )
    nab = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    occ = pos.groupBy("token").agg(F.count(F.lit(1)).cast("double").alias("n"))
    n_tok = pos.agg(F.count(F.lit(1)).cast("double").alias("n_tok"))
    n_pair = pairs.agg(F.count(F.lit(1)).cast("double").alias("n_pair"))
    return (
        nab.where(F.col("n_ab") >= min_pairs)
        .join(occ.select(F.col("token").alias("a"), F.col("n").alias("na")), "a")
        .join(occ.select(F.col("token").alias("b"), F.col("n").alias("nb")), "b")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_pair))
        .select(
            "a", "b", F.col("n_ab").cast("long").alias("n_ab"),
            F.round(
                F.log(
                    (F.col("n_ab") / F.col("n_pair"))
                    / ((F.col("na") / F.col("n_tok")) * (F.col("nb") / F.col("n_tok")))
                ),
                6,
            ).alias("pmi"),
        )
    )


def lm_score(docs: DataFrame, col="text", alpha: float = 1.0) -> DataFrame:
    """Unigram language-model quality score per document: train an
    add-``alpha``-smoothed unigram model on the WHOLE corpus, then score
    every document by its mean token log-probability — the classic cheap
    LM-based quality filter (CCNet-style: low mean log-prob ≈ gibberish /
    boilerplate outliers, high ≈ stereotypical text).

    Returns ``(doc_id, n_tokens, mean_logp)``; ``n_tokens`` counts
    non-empty whitespace tokens, ``mean_logp`` is 0.0 for empty documents.

    Scale shape: one explode feeds TWO map-side-combinable hash
    aggregates (the |V|-row model and the per-doc rescore); the
    token→model equi-join streams the exploded side against the model
    side — a stop-word hub key is harmless because the probe side is
    never re-grouped on the token.  The two model scalars (corpus size,
    vocab size) attach as a broadcast literal row, not a driver collect.
    """
    tok = (
        docs.select("doc_id", F.explode(tokens_col(col)).alias("tok"))
        .where(F.col("tok") != "")
    )
    model = tok.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    tot = model.agg(
        F.sum("cnt").alias("T"), F.count(F.lit(1)).cast("double").alias("V")
    )
    lp = F.log(
        (F.col("cnt") + F.lit(float(alpha)))
        / (F.col("T") + F.lit(float(alpha)) * F.col("V"))
    )
    scored = (
        tok.join(model, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.avg(lp).alias("mlp"))
    )
    return docs.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_tokens"),
        F.round(F.coalesce("mlp", F.lit(0.0)), 6).alias("mean_logp"),
    )


def corpus_profile(docs: DataFrame, by=("source", "lang")) -> DataFrame:
    """Per-``by``-group corpus report over the documents table: doc and
    token counts, exact token-length percentiles (p50/p90/p99), mean
    chars — the first dashboard a dataset curator reads before choosing
    mixture weights.

    ONE hash aggregate on the grouping key; exact ``percentile``
    (bounded group cardinality by construction — |sources|×|langs|
    groups; swap in ``approx_percentile`` for unbounded keys, the
    value_profile convention).
    """
    toks = F.size(
        F.filter(
            F.split(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), r"\s+"),
            lambda t: t != "",
        )
    ).cast("double")
    d = docs.withColumn("_nt", toks)
    return d.groupBy(*by).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_nt").cast("long").alias("n_tokens"),
        F.round(F.avg(F.length(F.coalesce("text", F.lit("")))), 6).alias("mean_chars"),
        F.round(F.expr("percentile(_nt, 0.5)"), 6).alias("p50_tokens"),
        F.round(F.expr("percentile(_nt, 0.9)"), 6).alias("p90_tokens"),
        F.round(F.expr("percentile(_nt, 0.99)"), 6).alias("p99_tokens"),
    )


def bpe_pair_counts(docs: DataFrame, k: int = 20, col="text") -> DataFrame:
    """First BPE merge-round statistics: corpus frequencies of adjacent
    character pairs inside whitespace words — the pair-selection step of
    byte-pair-encoding tokenizer training (Sennrich et al. 2016).  The
    top pair is the next BPE merge; re-running after applying each merge
    reproduces full vocabulary training (a driver loop, one job per
    merge).  Deterministic order: count desc, then pair asc.  Returns
    top-k (pair, n_words, count).

    Scale: one word hash-aggregate collapses the corpus to its
    vocabulary; the pair explode runs over DISTINCT words weighted by
    their counts (vocabulary-sized, not corpus-sized); the final top-k
    compiles to TakeOrderedAndProject, never a global sort.
    """
    if k < 1:
        raise ValueError("k must be positive")
    words = docs.select(F.explode(tokens_col(col)).alias("w")).where(F.col("w") != "")
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    idx = F.when(
        F.length("w") >= 2, F.sequence(F.lit(1), F.length("w") - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = wc.select(
        F.explode(F.transform(idx, lambda i: F.col("w").substr(i, F.lit(2)))).alias(
            "pair"
        ),
        "c",
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("c").cast("long").alias("count"),
        )
        .orderBy(F.desc("count"), F.asc("pair"))
        .limit(k)
    )


def text_entropy(docs: DataFrame, col="text") -> DataFrame:
    """Per-document token-unigram Shannon entropy — the classic
    diversity/degeneracy quality signal (low entropy = repetitive or
    template text; pairs with repetition_stats for corpus filtering).

    Returns (doc_id, n_tokens, n_types, ttr, entropy_bits,
    norm_entropy): ttr = type/token ratio, entropy_bits =
    -Σ p·log2 p over the doc's own token frequencies, norm_entropy =
    entropy_bits / log2(n_types) (0 when the doc has ≤1 distinct
    token).  Every doc is kept — empty docs carry zeros.

    Scale: explode is linear in corpus tokens; the (doc_id, tok) hash
    aggregate combines map-side; the per-doc reduce uses the identity
    H = log2(n) − Σ c·log2(c) / n so entropy needs NO second pass or
    window — two aggregates and one left join back to doc ids, all JVM
    expressions.
    """
    toks = docs.select(
        "doc_id", F.explode(tokens_col(col)).alias("tok")
    ).where(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    ln2 = 0.6931471805599453
    per = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.col("c") * F.log("c")).alias("s_clogc"),
    )
    h = (F.log("n") - F.col("s_clogc") / F.col("n")) / ln2
    scored = per.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        F.col("n_types").cast("long").alias("n_types"),
        F.round(F.col("n_types") / F.col("n"), 6).alias("ttr"),
        F.round(h, 6).alias("entropy_bits"),
        F.round(
            F.when(F.col("n_types") > 1, h / (F.log("n_types") / ln2)).otherwise(0.0), 6
        ).alias("norm_entropy"),
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_types", F.lit(0)).alias("n_types"),
            F.coalesce("ttr", F.lit(0.0)).alias("ttr"),
            F.coalesce("entropy_bits", F.lit(0.0)).alias("entropy_bits"),
            F.coalesce("norm_entropy", F.lit(0.0)).alias("norm_entropy"),
        )
    )


def hashed_features(docs: DataFrame, n_buckets: int = 64, col="text") -> DataFrame:
    """Hashing-trick sparse feature vectors (Weinberger et al. 2009 /
    sklearn HashingVectorizer): each token is hashed to one of
    ``n_buckets`` columns; the doc's feature value is the bucket's term
    frequency.  The standard fixed-width featurisation for downstream
    classifiers/dedup at corpus scale — no vocabulary build, no fit
    pass, stable across shards and reruns.

    Bucket = first 8 hex chars of md5(token) mod n_buckets — the
    engine-portable hash convention (identical integer in DuckDB via
    ``('0x'||substr(md5(tok),1,8))::BIGINT``), so oracles can replay it.

    Returns sparse rows (doc_id, bucket, count, tf) with tf normalised
    by the doc's token total.  Scale: one explode, a (doc_id, bucket)
    hash aggregate (map-side combinable, key space |docs|·n_buckets),
    then a groupBy(doc_id) total joined back — the second aggregate and
    the join both reuse the doc_id hash partitioning of the first
    shuffle, so there is exactly one exchange end to end.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be positive")
    toks = docs.select(
        "doc_id", F.explode(tokens_col(col)).alias("tok")
    ).where(F.col("tok") != "")
    bucket = F.pmod(
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"), F.lit(n_buckets)
    ).cast("int")
    bc = toks.select("doc_id", bucket.alias("bucket")).groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("count")
    )
    totals = bc.groupBy("doc_id").agg(F.sum("count").alias("n"))
    return bc.join(totals, "doc_id").select(
        "doc_id",
        "bucket",
        F.col("count").cast("long").alias("count"),
        F.round(F.col("count") / F.col("n"), 6).alias("tf"),
    )


def chunk_documents(
    docs: DataFrame, chunk_tokens: int = 64, overlap: int = 16, col="text"
) -> DataFrame:
    """Sliding-window token chunking — the RAG-indexing / context-packing
    primitive: split each document into chunks of ``chunk_tokens``
    whitespace tokens with ``overlap`` tokens shared between
    consecutive chunks (stride = chunk_tokens − overlap), the last
    chunk shorter if needed.  Every token of every doc is covered;
    empty docs produce no rows.

    Returns (doc_id, chunk_idx, start_tok, n_tokens, chunk_text);
    chunk_text re-joins tokens with single spaces (whitespace is
    normalised by construction).

    Scale: a pure projection + bounded explode — no shuffle at all;
    chunk rows inherit the scan's partitioning, so a downstream
    embed/index stage starts co-located with its source doc.  The
    chunk count per doc is ceil((n−C)/S)+1, an expression, not a loop.
    """
    stride = chunk_tokens - overlap
    if chunk_tokens < 1 or overlap < 0 or stride < 1:
        raise ValueError("need chunk_tokens ≥ 1 and 0 ≤ overlap < chunk_tokens")
    toks = F.filter(tokens_col(col), lambda t: t != "")
    d = docs.select("doc_id", toks.alias("tk")).withColumn("n", F.size("tk"))
    n_chunks = (
        F.when(F.col("n") <= 0, F.lit(0))
        .when(F.col("n") <= chunk_tokens, F.lit(1))
        .otherwise(
            F.ceil((F.col("n") - chunk_tokens) / F.lit(float(stride))).cast("int")
            + 1
        )
    )
    # ANSI guard: sequence(0, -1) would generate DESCENDING — gate on >0
    idx = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    d = d.withColumn("ci", F.explode(idx))
    start = F.col("ci") * stride
    return d.select(
        "doc_id",
        F.col("ci").cast("int").alias("chunk_idx"),
        start.cast("int").alias("start_tok"),
        F.least(F.lit(chunk_tokens), F.col("n") - start).cast("int").alias("n_tokens"),
        F.array_join(F.slice("tk", start + 1, F.lit(chunk_tokens)), " ").alias(
            "chunk_text"
        ),
    )


def vocab_coverage(docs: DataFrame, k: int = 500, col: str = "text") -> DataFrame:
    """Cumulative corpus-coverage curve of the top-``k`` vocabulary — the
    first chart a tokenizer designer draws (what share of all token
    occurrences do the k most frequent types cover?).  Rank is
    (count desc, token asc) — fully deterministic under ties.  Returns
    (rank, token, cnt, coverage) with coverage = cumulative share of
    total token occurrences, rounded to 6dp.

    Scale: token counts are one explode + hash aggregate; top-k is
    TakeOrderedAndProject (per-partition heaps, k rows to the driver
    side of the plan); the cumulative window runs over the k-row prefix
    only, and the corpus total rides a 1-row broadcast cross join.
    """
    from pyspark.sql import Window

    tok = docs.select(F.explode(tokens_col(col)).alias("token")).where(
        F.length("token") > 0
    )
    cnt = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = tok.agg(F.count(F.lit(1)).alias("n_total"))
    top = cnt.orderBy(F.col("cnt").desc(), "token").limit(k)
    w = Window.orderBy(F.col("cnt").desc(), "token")
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).cast("long").alias("rank"),
            "token",
            F.col("cnt").cast("long").alias("cnt"),
            F.round(
                F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0))
                / F.col("n_total"),
                6,
            ).alias("coverage"),
        )
    )


def filter_funnel(
    docs: DataFrame,
    min_chars: int = 50,
    max_chars: int = 100_000,
    min_quality: float = 0.5,
    col: str = "text",
) -> DataFrame:
    """C4-style filter survival report: how many documents remain after
    each successive curation gate — length window, quality threshold
    (the :func:`quality_score_col` composite), exact dedup (distinct
    text hash among survivors).  Returns one row per stage:
    (stage_idx, stage, n_docs, frac_of_total), fractions 1e-6 rounded.
    The stage list is cumulative — each count is AND of all gates so
    far, the shape a curation dashboard plots directly.

    Scale: ONE aggregate over the corpus (conditional counts +
    conditional distinct-hash count, all map-side combinable), then a
    4-row stack — no joins, no windows, no second scan.
    """
    n_chars = F.length(F.col(col))
    len_ok = (n_chars >= min_chars) & (n_chars <= max_chars)
    q_ok = len_ok & (quality_score_col(col) >= F.lit(float(min_quality)))
    agg = docs.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(len_ok.cast("long")).alias("len_ok"),
        F.sum(q_ok.cast("long")).alias("q_ok"),
        F.count_distinct(F.when(q_ok, F.md5(F.col(col)))).alias("dedup_ok"),
    )
    return agg.selectExpr(
        "stack(4, 0L, 'total', total, 1L, 'length', len_ok, "
        "2L, 'quality', q_ok, 3L, 'dedup', dedup_ok) AS (stage_idx, stage, n_docs)",
        "total",
    ).select(
        "stage_idx",
        "stage",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(F.col("n_docs") / F.col("total"), 6).alias("frac_of_total"),
    )


def zipf_fit(docs: DataFrame, xmin: int = 2, col: str = "text") -> DataFrame:
    """Zipf fit of the corpus token-frequency distribution — the same
    Clauset–Shalizi–Newman discrete MLE as
    :func:`~leidenalg_spark.operators.kernels.power_law_fit` but over
    token occurrence counts (the canonical Zipf/Heaps corpus
    diagnostic): ``alpha = 1 + n/Σ ln(cnt/(xmin−0.5))`` over types with
    ``cnt ≥ xmin``, plus the KS distance to the fitted tail CCDF.
    Returns one row (xmin, n_types, n_tail, alpha, ks).

    Scale: type counts are one explode + hash aggregate; the CCDF window
    runs over DISTINCT count values (≤ max frequency, small), everything
    else 1-row scalars on broadcast cross joins.
    """
    from pyspark.sql import Window

    if xmin < 1:
        raise ValueError("xmin must be >= 1")
    cnts = (
        docs.select(F.explode(tokens_col(col)).alias("token"))
        .where(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n_types = cnts.agg(F.count(F.lit(1)).alias("n_types"))
    tail = cnts.where(F.col("cnt") >= xmin)
    stats = tail.agg(
        F.count(F.lit(1)).alias("n_tail"),
        F.sum(F.log(F.col("cnt") / F.lit(xmin - 0.5))).alias("s"),
    ).select("n_tail", (F.lit(1.0) + F.col("n_tail") / F.col("s")).alias("alpha"))
    dd = tail.groupBy("cnt").agg(F.count(F.lit(1)).alias("m"))
    w = Window.orderBy(F.col("cnt").desc()).rowsBetween(Window.unboundedPreceding, 0)
    ks = (
        dd.withColumn("cum", F.sum("m").over(w))
        .crossJoin(F.broadcast(stats))
        .select(
            F.abs(
                F.col("cum") / F.col("n_tail")
                - F.pow(
                    (F.col("cnt") - 0.5) / F.lit(xmin - 0.5),
                    F.lit(1.0) - F.col("alpha"),
                )
            ).alias("d")
        )
        .agg(F.max("d").alias("ks"))
    )
    return (
        stats.crossJoin(F.broadcast(n_types))
        .crossJoin(F.broadcast(ks))
        .select(
            F.lit(xmin).cast("long").alias("xmin"),
            F.col("n_types").cast("long").alias("n_types"),
            F.col("n_tail").cast("long").alias("n_tail"),
            F.round("alpha", 6).alias("alpha"),
            F.round("ks", 6).alias("ks"),
        )
    )


def vocab_growth(docs: DataFrame, n_points: int = 8, col: str = "text") -> DataFrame:
    """Heaps-law vocabulary growth curve: at ``n_points`` doc-id-quantile
    checkpoints, the corpus-prefix token total and distinct-type count —
    the curve whose log-log slope is Heaps' β (fit it offline; the curve
    is the deliverable).  Prefixes are by doc_id order (deterministic,
    retry-stable).  Returns one row per checkpoint:
    (point, frac, n_docs, n_tokens, n_types).

    Scale: thresholds are exact doc_id quantiles (one 1-row aggregate on
    a broadcast cross join); the curve is ONE aggregate over the
    exploded token table with ``n_points`` conditional sums/distincts
    (an n_points-way expand — keep n_points small), then a stack.  No
    per-prefix rescans, no ordered window over the corpus.
    """
    if n_points < 1:
        raise ValueError("n_points must be >= 1")
    tok = docs.select(
        "doc_id", F.explode(tokens_col(col)).alias("token")
    ).where(F.length("token") > 0)
    fracs = [i / n_points for i in range(1, n_points + 1)]
    ths = docs.agg(
        *[
            F.expr(f"percentile_disc({f}) WITHIN GROUP (ORDER BY doc_id)").alias(f"th{i}")
            for i, f in enumerate(fracs, 1)
        ]
    )
    t = tok.crossJoin(F.broadcast(ths))
    aggs = []
    for i in range(1, n_points + 1):
        cond = F.col("doc_id") <= F.col(f"th{i}")
        aggs += [
            F.count_distinct(F.when(cond, F.col("doc_id"))).alias(f"d{i}"),
            F.sum(cond.cast("long")).alias(f"n{i}"),
            F.count_distinct(F.when(cond, F.col("token"))).alias(f"v{i}"),
        ]
    one = t.agg(*aggs)
    stack_args = ", ".join(
        f"{i}L, {f}D, d{i}, n{i}, v{i}" for i, f in enumerate(fracs, 1)
    )
    return one.selectExpr(
        f"stack({n_points}, {stack_args}) AS (point, frac, n_docs, n_tokens, n_types)"
    ).select(
        "point",
        F.round("frac", 6).alias("frac"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_types").cast("long").alias("n_types"),
    )


def textrank_keywords(
    spark,
    docs: DataFrame,
    col: str = "text",
    top_k: int = 15,
    max_iter: int = 6,
    damping: float = 0.85,
    max_token_freq: int | None = None,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    over the ADJACENT-token co-occurrence graph — tokens are vertices,
    consecutive-position pairs are undirected weighted edges, and the
    stationary rank is the keyword salience.  The graph-over-text
    composition: the same :func:`..kernels.pagerank` superstep that
    ranks the link graph ranks the vocabulary.  Returns the corpus
    top-``top_k`` as ``(token, score, rank)`` with scores rounded
    BEFORE ranking and token tie-breaks, so the cut is deterministic.

    Scale shape: positional explode + ONE (doc, pos+1) equality
    self-join (linear in corpus tokens — never a windowed cross join),
    a map-side-combinable pair count, then the audited pagerank
    superstep (tol=0, undirected → no dangling action, fixed
    ``max_iter`` rounds); the final top-k compiles to
    TakeOrderedAndProject, and the rank window runs over those k rows
    only.  ``max_token_freq`` optionally drops stopword-grade hubs.
    """
    from .kernels import pagerank

    toks = tokens_col(col)
    pos = docs.select("doc_id", F.posexplode(toks).alias("pos", "token")).where(
        F.col("token") != ""
    )
    if max_token_freq is not None:
        occ_f = pos.groupBy("token").agg(F.count(F.lit(1)).alias("f"))
        pos = pos.join(occ_f.where(F.col("f") <= max_token_freq), "token").select(
            "doc_id", "pos", "token"
        )
    nxt = pos.select("doc_id", (F.col("pos") + 1).alias("pos"), F.col("token").alias("ta"))
    pairs = (
        nxt.join(pos.select("doc_id", "pos", F.col("token").alias("tb")), ["doc_id", "pos"])
        .where(F.col("ta") != F.col("tb"))
        .select(F.least("ta", "tb").alias("src"), F.greatest("ta", "tb").alias("dst"))
    )
    e = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).cast("double").alias("weight"))
    pr = pagerank(
        spark, e, damping=damping, max_iter=max_iter, tol=0.0, directed=False
    )
    from pyspark.sql import Window

    top = (
        pr.select(F.col("id").alias("token"), F.round("rank", 6).alias("score"))
        .orderBy(F.col("score").desc(), "token")
        .limit(top_k)
    )
    return top.select(
        "token",
        "score",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), "token"))
        .cast("long")
        .alias("rank"),
    )


def source_divergence(docs: DataFrame, col: str = "text", group_col: str = "source") -> DataFrame:
    """Pairwise Jensen–Shannon divergence between the unigram
    distributions of every pair of corpus sources — the standard
    training-mixture diagnostic (how different is web text from chat
    transcripts? is one dump a near-copy of another?).  JS(p,q) =
    ½KL(p‖m) + ½KL(q‖m), m = ½(p+q), in bits: 0 = identical mixtures,
    1 = disjoint vocabularies.  Returns (source_a, source_b,
    shared_tokens, js_divergence, js_distance = √JS — the metric).

    Sparse closed form: tokens present in only one source contribute
    exactly ½·p(t)·log₂2 = ½p(t), so the missing side never needs
    materialising — JS = Σ_shared ½(p·log₂(2p/(p+q)) + q·log₂(2q/(p+q)))
    + ½(1−P_shared) + ½(1−Q_shared).

    Scale shape: one (source, token) count aggregate, per-source
    totals ON a broadcast (|sources| rows), one token-keyed self-join
    whose fan-out per token is bounded by |sources|², then a
    (source_a, source_b) 1-row-per-pair combine — linear in corpus
    tokens, never quadratic in vocabulary.
    """
    toks = tokens_col(col)
    tc = (
        docs.select(F.col(group_col).alias("s"), F.explode(toks).alias("token"))
        .where(F.col("token") != "")
        .groupBy("s", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = tc.groupBy("s").agg(F.sum("c").alias("n"))
    dist = tc.join(F.broadcast(tot), "s").select(
        "s", "token", (F.col("c") / F.col("n")).alias("p")
    )
    shared = (
        dist.alias("l")
        .join(dist.alias("r"), "token")
        .where(F.col("l.s") < F.col("r.s"))
        .select(
            F.col("l.s").alias("source_a"),
            F.col("r.s").alias("source_b"),
            F.col("l.p").alias("p"),
            F.col("r.p").alias("q"),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("shared_tokens"),
            F.sum(
                0.5
                * (
                    F.col("p") * F.log2(2.0 * F.col("p") / (F.col("p") + F.col("q")))
                    + F.col("q") * F.log2(2.0 * F.col("q") / (F.col("p") + F.col("q")))
                )
            ).alias("js_inner"),
            F.sum("p").alias("p_shared"),
            F.sum("q").alias("q_shared"),
        )
    )
    # disjoint-vocabulary pairs produce no self-join rows at all, yet
    # they're the most important output (JS exactly 1) — generate every
    # source pair from the |sources|-row totals and left-join
    all_pairs = (
        tot.select(F.col("s").alias("source_a"))
        .crossJoin(tot.select(F.col("s").alias("source_b")))
        .where(F.col("source_a") < F.col("source_b"))
    )
    full = all_pairs.join(shared, ["source_a", "source_b"], "left").select(
        "source_a",
        "source_b",
        F.coalesce("shared_tokens", F.lit(0)).cast("long").alias("shared_tokens"),
        F.coalesce("js_inner", F.lit(0.0)).alias("js_inner"),
        F.coalesce("p_shared", F.lit(0.0)).alias("p_shared"),
        F.coalesce("q_shared", F.lit(0.0)).alias("q_shared"),
    )
    js = (
        F.col("js_inner")
        + 0.5 * (1.0 - F.col("p_shared"))
        + 0.5 * (1.0 - F.col("q_shared"))
    )
    return full.select(
        "source_a",
        "source_b",
        "shared_tokens",
        F.round(js, 6).alias("js_divergence"),
        F.round(F.sqrt(F.greatest(js, F.lit(0.0))), 6).alias("js_distance"),
    )


def bigram_lm_score(
    docs: DataFrame, col: str = "text", lam: float = 0.7, alpha: float = 1.0
) -> DataFrame:
    """Interpolated bigram language-model quality score (Jelinek–Mercer
    smoothing): train corpus bigram + add-``alpha`` unigram models,
    then score every document by its mean token log-probability under
    p(w|v) = λ·c(vw)/c(v·) + (1−λ)·p_uni(w); document-initial tokens
    score by the unigram alone.  The sequence-aware upgrade of
    :func:`lm_score` — word-salad documents keep plausible unigrams
    but crater on bigrams, which is exactly what LM-perplexity
    filters (CCNet, Gopher) exploit.  Returns ``(doc_id, n_tokens,
    mean_logp, perplexity)`` with perplexity = exp(−mean_logp), 0 / 1
    for empty documents.

    Scale shape: one positional explode feeds the unigram model, the
    bigram model (via a (doc, pos+1) equality self-join — linear, the
    pmi/textrank pattern), and the per-token rescore probe; all model
    attaches are token- or pair-keyed equi-joins against grouped
    aggregates, the two corpus scalars ride a 1-row broadcast cross
    join, and every aggregate is map-side combinable.
    """
    pos = docs.select("doc_id", F.posexplode(tokens_col(col)).alias("pos", "b")).where(
        F.col("b") != ""
    )
    uni = pos.groupBy("b").agg(F.count(F.lit(1)).cast("double").alias("cb"))
    tot = uni.agg(F.sum("cb").alias("T"), F.count(F.lit(1)).cast("double").alias("V"))
    prev = pos.select("doc_id", (F.col("pos") + 1).alias("pos"), F.col("b").alias("a"))
    occ = pos.join(prev, ["doc_id", "pos"], "left")
    bi = (
        occ.where(F.col("a").isNotNull())
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("double").alias("cab"))
    )
    ctx = bi.groupBy("a").agg(F.sum("cab").alias("ca"))
    p_uni = (F.col("cb") + F.lit(float(alpha))) / (
        F.col("T") + F.lit(float(alpha)) * F.col("V")
    )
    p_tok = F.when(
        F.col("a").isNotNull(),
        F.lit(float(lam)) * F.col("cab") / F.col("ca")
        + F.lit(1.0 - float(lam)) * p_uni,
    ).otherwise(p_uni)
    scored = (
        occ.join(uni, "b")
        .join(bi, ["a", "b"], "left")
        .join(ctx, "a", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.avg(F.log(p_tok)).alias("mlp"))
    )
    return docs.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_tokens"),
        F.round(F.coalesce("mlp", F.lit(0.0)), 6).alias("mean_logp"),
        F.round(F.exp(-F.coalesce("mlp", F.lit(0.0))), 6).alias("perplexity"),
    )


def script_profile(docs: DataFrame, col: str = "text") -> DataFrame:
    """Character-class profile per document — the cheap mojibake /
    code-vs-prose / wrong-corpus detector that runs before any
    language model sees a byte: fractions of ASCII letters, digits,
    whitespace, punctuation/symbols, and everything else (non-ASCII —
    CJK, Cyrillic, emoji, encoding damage).  Returns ``(doc_id,
    n_chars, letter_frac, digit_frac, space_frac, punct_frac,
    other_frac)``; empty docs report zeros.

    Scale: one projection of regexp_replace length-differences — pure
    JVM whole-stage codegen, no shuffle, scan pruned to (doc_id, text);
    the character classes are plain ASCII ranges so the Java and RE2
    regex engines agree byte-for-byte.
    """
    raw = F.coalesce(F.col(col), F.lit(""))
    n = F.length(raw).cast("double")

    def frac(pattern):
        kept = n - F.length(F.regexp_replace(raw, pattern, ""))
        return F.round(
            F.when(n > 0, kept / n).otherwise(F.lit(0.0)), 6
        )

    letter = frac(r"[A-Za-z]")
    digit = frac(r"[0-9]")
    space = frac(r"[ \t\r\n]")
    punct = frac(r"[!-/:-@\[-`{-~]")
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_chars"),
        letter.alias("letter_frac"),
        digit.alias("digit_frac"),
        space.alias("space_frac"),
        punct.alias("punct_frac"),
        F.round(
            F.when(
                n > 0,
                1.0
                - (
                    (n - F.length(F.regexp_replace(raw, r"[A-Za-z0-9 \t\r\n!-/:-@\[-`{-~]", "")))
                    / n
                ),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("other_frac"),
    )


def langid_confusion(docs: DataFrame, truth_col="lang", col="text") -> DataFrame:
    """Confusion matrix of the n-gram language detector against a
    ground-truth label column — the eval loop that keeps a heuristic
    lang-id honest as the corpus mix shifts.  Returns one row per
    (truth, predicted) pair: (lang, lang_pred, n, frac_of_truth), where
    frac_of_truth is the row-normalised rate (recall on the diagonal).

    Scale shape: the detector is a pure JVM expression (no shuffle),
    then ONE hash aggregate on (truth, pred) — |langs|² output rows —
    and a broadcast-sized per-truth total join.
    """
    pred = language_id(docs, col).select("doc_id", "lang_pred")
    lab = docs.select("doc_id", F.coalesce(F.col(truth_col), F.lit("und")).alias("lang"))
    cell = (
        lab.join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = cell.groupBy("lang").agg(F.sum("n").alias("n_truth"))
    return cell.join(F.broadcast(tot), "lang").select(
        "lang", "lang_pred", "n",
        F.round(F.col("n") / F.col("n_truth"), 6).alias("frac_of_truth"),
    )


def source_length_emd(docs: DataFrame, group_col="source", nbins=24) -> DataFrame:
    """Pairwise earth-mover distance between per-source document-LENGTH
    distributions over shared log₂ bins — the cheap scalar that flags a
    source whose scrape truncated or whose boilerplate doubled, before
    any content model runs.  1-D EMD with unit bin spacing is the L1
    distance between the binned CDFs.  Returns (src_a, src_b, emd) for
    every ordered pair src_a < src_b; emd is in "bins" (log₂ length
    units).

    Scale shape: one (source, bin) hash aggregate over the corpus — the
    only data-proportional stage — then CDFs and the |sources|² pair
    join live on a |sources|·nbins table.
    """
    ln = F.length(F.coalesce(F.col("text"), F.lit("")))
    b = F.least(
        F.lit(nbins - 1), F.floor(F.log2(F.greatest(ln.cast("double"), F.lit(1.0))))
    ).cast("int")
    cell = docs.groupBy(F.col(group_col).alias("g"), b.alias("bin")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = cell.groupBy("g").agg(F.sum("c").alias("n"))
    # dense bin axis per source so CDFs align across sources
    bins = cell.sparkSession.range(nbins).select(F.col("id").cast("int").alias("bin"))
    dense = (
        tot.crossJoin(F.broadcast(bins))
        .join(cell, ["g", "bin"], "left")
        .na.fill({"c": 0})
    )
    w = Window.partitionBy("g").orderBy("bin")
    cdf = dense.select(
        "g", "bin",
        (F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)) / F.col("n")).alias("F"),
    )
    a = cdf.select(F.col("g").alias("src_a"), "bin", F.col("F").alias("fa"))
    bb = cdf.select(F.col("g").alias("src_b"), "bin", F.col("F").alias("fb"))
    return (
        a.join(bb, "bin")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.round(F.sum(F.abs(F.col("fa") - F.col("fb"))), 6).alias("emd"))
    )


def doc_source_kl(docs: DataFrame, group_col: str = "source", col: str = "text") -> DataFrame:
    """Per-document KL divergence from the doc's own unigram token
    distribution to its SOURCE's distribution — the content-outlier
    score that flags a page that doesn't belong to its scrape (spam
    injected into a forum dump, a navigation page inside an article
    corpus).  KL(p_doc ‖ p_source) is exact and finite because every doc
    token is, by construction, in its source's support.  Returns
    (doc_id, source, n_tokens, kl).

    Scale shape: token explode feeds TWO associative hash aggregates
    (doc-level and source-level counts); the score join is keyed on
    (source, token) — a hub token costs one aggregate cell and a
    broadcast-sized source-distribution row, never a quadratic bucket.
    """
    tok = docs.select(
        "doc_id", F.col(group_col).alias("g"), F.explode(tokens_col(col)).alias("t")
    ).where(F.length("t") > 0)
    dtc = tok.groupBy("doc_id", "g", "t").agg(F.count(F.lit(1)).alias("c"))
    dn = dtc.groupBy("doc_id").agg(F.sum("c").alias("dn"))
    stc = tok.groupBy("g", "t").agg(F.count(F.lit(1)).alias("sc"))
    sn = stc.groupBy("g").agg(F.sum("sc").alias("sn"))
    j = dtc.join(dn, "doc_id").join(stc, ["g", "t"]).join(F.broadcast(sn), "g")
    p = F.col("c") / F.col("dn")
    q = F.col("sc") / F.col("sn")
    return (
        j.groupBy("doc_id", F.col("g").alias(group_col))
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.round(F.sum(p * F.log(p / q)), 6).alias("kl"),
        )
    )


def readability(docs: DataFrame, col: str = "text") -> DataFrame:
    """Flesch–Kincaid grade-level proxy per document — the classic
    cheap fluency gate (too-low grade = listicles/boilerplate, absurdly
    high = OCR garbage or run-on extraction errors):

        FK = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59

    with syllables approximated by vowel GROUPS ([aeiouy]+ runs, the
    standard heuristic) and sentences by terminal-punctuation runs
    (min 1).  Returns (doc_id, n_words, n_sentences, n_syllables,
    fk_grade); empty docs are NULL-graded.

    Scale shape: three regexp counts in one scan projection —
    whole-stage codegen, no shuffle, no Python.
    """
    low = F.lower(F.coalesce(F.col(col), F.lit("")))
    n_words = F.size(F.regexp_extract_all(low, F.lit(r"[a-z0-9']+"), F.lit(0)))
    n_syll = F.size(F.regexp_extract_all(low, F.lit(r"[aeiouy]+"), F.lit(0)))
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(low, F.lit(r"[.!?]+"), F.lit(0))), F.lit(1)
    )
    fk = (
        0.39 * (n_words / n_sent) + 11.8 * (n_syll / n_words) - 15.59
    )
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        n_sent.cast("long").alias("n_sentences"),
        n_syll.cast("long").alias("n_syllables"),
        F.round(F.when(n_words > 0, fk), 6).alias("fk_grade"),
    )


def ttr_stats(docs: DataFrame, col: str = "text") -> DataFrame:
    """Per-document lexical-diversity profile: type-token ratio and
    hapax fraction — the two standard "is this text degenerate" lexical
    signals (near-0 TTR = loops/boilerplate, near-1 hapax on long docs
    = OCR noise or ciphertext).  Returns (doc_id, n_tokens, n_types,
    ttr, hapax_frac); empty docs carry NULL ratios.

    Scale shape: one explode → (doc, token) hash aggregate (map-side
    combinable) → one per-doc aggregate; no windows, no joins.
    """
    tok = docs.select("doc_id", F.explode(tokens_col(col)).alias("t")).where(
        F.length("t") > 0
    )
    tc = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    per = tc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum((F.col("c") == 1).cast("long")).alias("n_hapax"),
    )
    out = docs.select("doc_id").join(per, "doc_id", "left").na.fill(
        {"n_tokens": 0, "n_types": 0, "n_hapax": 0}
    )
    return out.select(
        "doc_id", "n_tokens", "n_types",
        F.round(
            F.when(F.col("n_tokens") > 0, F.col("n_types") / F.col("n_tokens")), 6
        ).alias("ttr"),
        F.round(
            F.when(F.col("n_types") > 0, F.col("n_hapax") / F.col("n_types")), 6
        ).alias("hapax_frac"),
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    docs: DataFrame,
    col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, appendix A1 —
    public heuristics; the per-rule companion to the composite
    :func:`quality_score` and the A1 repetition half in
    :func:`repetition_stats`): word-count window, mean-word-length
    window, symbol-to-word ratio (``#`` and ellipses), bullet-start /
    ellipsis-end line fractions, alphabetic-word fraction, and the
    required-stopword count.  Returns per doc the measured signals plus
    the overall ``passes_gopher`` admission flag (AND of all rules).

    Scale: ONE projection — every signal is a JVM higher-order-function
    expression over the split word/line arrays (no explode, no shuffle,
    no Python); the whole operator pipelines inside the parquet scan's
    codegen stage.  Degenerate docs (zero words) fail the word-count
    rule and report zeroed ratios rather than dividing by zero (ANSI
    mode throws on x/0).
    """
    words = F.filter(F.split(F.col(col), r"\s+"), lambda w: w != "")
    nw = F.size(words)
    nw_d = nw.cast("double")
    total_len = F.aggregate(
        words, F.lit(0.0), lambda acc, w: acc + F.length(w).cast("double")
    )
    mean_len = F.when(nw > 0, F.round(total_len / nw_d, 6)).otherwise(F.lit(0.0))
    t = F.col(col)
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ell = F.floor(
        (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
    ) + F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit("")))
    symbol_ratio = F.when(
        nw > 0, F.round((n_hash + n_ell).cast("double") / nw_d, 6)
    ).otherwise(F.lit(0.0))
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda l: F.trim(l)), lambda l: l != ""
    )
    nl = F.size(lines)
    bullet_frac = F.when(
        nl > 0,
        F.round(
            F.size(
                F.filter(lines, lambda l: F.substring(l, 1, 1).isin("-", "*", "•"))
            ).cast("double") / nl.cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    ell_end_frac = F.when(
        nl > 0,
        F.round(
            F.size(
                F.filter(
                    lines,
                    lambda l: l.endswith(F.lit("...")) | l.endswith(F.lit("…")),
                )
            ).cast("double") / nl.cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        nw > 0,
        F.round(
            F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("double")
            / nw_d,
            6,
        ),
    ).otherwise(F.lit(0.0))
    n_stop = F.size(
        F.filter(words, lambda w: F.lower(w).isin(*GOPHER_STOPWORDS))
    )
    out = docs.select(
        "doc_id",
        nw.cast("long").alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        n_stop.cast("long").alias("n_stopwords"),
        bullet_frac.alias("bullet_line_frac"),
        ell_end_frac.alias("ellipsis_line_frac"),
    )
    passes = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_len)
        & (F.col("mean_word_len") <= max_mean_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_frac)
        & (F.col("alpha_word_frac") >= min_alpha_frac)
        & (F.col("n_stopwords") >= min_stopwords)
    )
    return out.withColumn("passes_gopher", passes)
