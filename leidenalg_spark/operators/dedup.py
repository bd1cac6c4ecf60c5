"""Deduplication operators for training-data pipelines (prescribed
first-class ops): exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design:
- exact dedup is one hash-groupBy (map-side partial agg);
- n-gram Jaccard materialises (doc, shingle) pairs and self-joins on the
  shingle — quadratic only within a shingle bucket; frequent-shingle
  capping (``max_shingle_freq``) bounds the worst bucket, the standard
  guard against the `the-quick-brown-fox` hub shingle;
- MinHash+LSH reduces candidate generation to equality joins on band
  signatures — linear shuffle, no quadratic blow-up; verification of
  candidates re-computes exact Jaccard only on the survivors;
- SimHash is a 64-bit signature computed fully JVM-side (explode →
  md5-derived per-token hash → per-bit majority-vote aggregates),
  banded for Hamming-distance candidates.

Portability: shingles are plain strings and hashes are md5, so every
SQL-expressible operator here has an exact DuckDB twin for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import tokens_col


# ------------------------------------------------------------------ exact
def fingerprint_expr(col="text"):
    """Normalised-text md5 fingerprint — the ONE definition shared by the
    batch dedup and the streaming dedup so the two paths cannot diverge.

    NULL text coalesces to '' BEFORE hashing: md5(NULL) is NULL and a
    fingerprint equi-join never matches null keys, so NULL-text docs
    would silently vanish from a dedup output."""
    norm = F.regexp_replace(F.lower(F.trim(F.coalesce(F.col(col), F.lit("")))), r"\s+", " ")
    return F.md5(norm)


def dedup_exact(docs: DataFrame, col="text") -> DataFrame:
    """Exact dedup on normalised text: keep the smallest doc_id per
    fingerprint.  Returns (doc_id, fingerprint, group_size, is_kept)."""
    with_fp = docs.select("doc_id", fingerprint_expr(col).alias("fingerprint"))
    grp = with_fp.groupBy("fingerprint").agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("group_size")
    )
    return (
        with_fp.join(grp, "fingerprint")
        .select(
            "doc_id",
            "fingerprint",
            "group_size",
            (F.col("doc_id") == F.col("keep_id")).alias("is_kept"),
        )
    )


# ------------------------------------------------------------- shingling
def shingles(docs: DataFrame, n=3, col="text") -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle)."""
    toks = tokens_col(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    # (doc_id, shingle) pairs are unique by construction — array_distinct
    # dedupes within the doc and doc_id is the row key — so no .distinct()
    # (a full exchange + two hash aggregates) is needed
    return (
        docs.select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
        .where(F.length("shingle") > 0)
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n=3, threshold=0.8, col="text", max_shingle_freq: int | None = 1000
) -> DataFrame:
    """All doc pairs (a < b) with word-n-gram Jaccard >= threshold.

    No hashing/banding — with ``max_shingle_freq=None`` this is the fully
    exact Jaccard baseline the approximate methods are validated against.
    The default cap (1000) computes exact Jaccard over the shingle sets
    *that survive the frequency filter*: a hub shingle in ``f`` documents
    costs ``f²`` joined rows, so an uncapped run on web-scale data is
    quadratic in the worst bucket.  Dropping a shingle that common barely
    moves Jaccard for near-dup thresholds; pass ``None`` when an exact
    small-scale baseline is required.
    """
    # the (post-cap) shingle table feeds three consumers (both sides of
    # the self-join, per-doc sizes); cache exactly ONE table — without it
    # each consumer replays the scan + explode, and caching both the
    # pre- and post-cap tables would leak the pre-cap cache for the
    # session lifetime (nothing can unpersist it once this returns)
    sh = shingles(docs, n, col)
    if max_shingle_freq:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("f"))
        sh = sh.join(freq.where(F.col("f") <= max_shingle_freq), "shingle").select("doc_id", "shingle")
    sh = sh.persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .select("a", "b", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def neardup_dedup(
    spark,
    docs: DataFrame,
    n=3,
    threshold=0.5,
    col="text",
    max_shingle_freq: int | None = 1000,
    max_rounds: int = 50,
) -> DataFrame:
    """End-to-end near-duplicate dedup: n-gram Jaccard pairs at/above
    ``threshold`` → connected components over the duplicate-pair graph →
    canonical keep (minimum ``doc_id`` per duplicate cluster).

    Returns one row per document: (doc_id, canonical_id, is_kept) —
    unique documents are their own canonical.  This is the materialised
    "which rows survive dedup" answer a training pipeline actually
    consumes, where :func:`ngram_jaccard_pairs` only reports the pairs
    (transitively, A≈B and B≈C must collapse to ONE kept doc even when
    A and C are below threshold).

    Scale shape: pairs come from the shingle-bucket join (never
    all-pairs; hub shingles capped), the component step runs alternating
    large-star/small-star in O(log² n) rounds on the duplicate pairs
    ONLY — at realistic dup rates a graph orders of magnitude smaller
    than the corpus — and the final decoration is one left join.
    """
    from .kernels import connected_components

    pairs = ngram_jaccard_pairs(docs, n=n, threshold=threshold, col=col,
                                max_shingle_freq=max_shingle_freq)
    e = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    comp = connected_components(spark, e, max_rounds=max_rounds)
    return (
        docs.select("doc_id")
        .join(comp.select(F.col("id").alias("doc_id"), "component"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("canonical_id"),
        )
        .withColumn("is_kept", F.col("canonical_id") == F.col("doc_id"))
    )


# -------------------------------------------------------- decontamination
def decontaminate(docs: DataFrame, benchmark: DataFrame, n=5, col="text") -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word n-gram with a benchmark/eval corpus — the standard LLM
    training-data hygiene step (n-gram overlap rule, as published in the
    GPT-3 and Gopher appendices).  Returns (doc_id, n_hits, contaminated)
    where ``n_hits`` counts the doc's DISTINCT shingles that occur
    anywhere in the benchmark.

    Scale: candidate generation is a pure equality join of the exploded
    training shingles against the (small, distinct) benchmark shingle
    set — eval suites are tiny next to a 100 TB corpus, so AQE turns the
    join into a broadcast; there is no quadratic stage and no per-row
    Python.  Docs shorter than ``n`` tokens contribute one whole-doc
    shingle (same convention as :func:`shingles`).
    """
    d_sh = shingles(docs, n, col)
    b_sh = shingles(benchmark, n, col).select("shingle").distinct()
    hits = d_sh.join(b_sh, "shingle").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .na.fill({"n_hits": 0})
        .select(
            "doc_id",
            F.col("n_hits").cast("long").alias("n_hits"),
            (F.col("n_hits") > 0).alias("contaminated"),
        )
    )


# --------------------------------------------------------------- MinHash
def minhash_signatures(docs: DataFrame, n=3, num_hashes=32, col="text", _sh: DataFrame | None = None) -> DataFrame:
    """MinHash signature per doc: for hash function i, the lexicographic
    minimum of ``md5(i || ':' || shingle)`` over the doc's shingles —
    a valid min-wise hash family, portable to plain SQL.

    Returns (doc_id, sig: array<string> of length num_hashes).
    """
    sh = _sh if _sh is not None else shingles(docs, n, col)
    hashed = sh.select(
        "doc_id",
        F.explode(
            F.array(*[F.struct(F.lit(i).alias("i"), F.md5(F.format_string("%d:%s", F.lit(i), F.col("shingle"))).alias("h")) for i in range(num_hashes)])
        ).alias("ih"),
    ).select("doc_id", F.col("ih.i").alias("i"), F.col("ih.h").alias("h"))
    mins = hashed.groupBy("doc_id", "i").agg(F.min("h").alias("mh"))
    return mins.groupBy("doc_id").agg(F.array_sort(F.collect_list(F.struct("i", "mh"))).alias("s")).select(
        "doc_id", F.transform("s", lambda x: x["mh"]).alias("sig")
    )


def minhash_lsh_candidates(signatures: DataFrame, bands=8) -> DataFrame:
    """Band the signatures and equality-join: docs sharing any band
    signature become candidate pairs (a < b).  rows = num_hashes/bands
    per band; collision probability follows the classic S-curve."""
    sig_len_row = signatures.select(F.size("sig").alias("l")).first()
    if sig_len_row is None:
        return signatures.sparkSession.createDataFrame([], "a long, b long")
    sig_len = int(sig_len_row["l"])
    if bands > sig_len:
        # out-of-range F.slice returns [], every doc would share the
        # md5('') band key, and the join degenerates to all-pairs
        raise ValueError(f"bands={bands} > signature length {sig_len}")
    rows = max(1, sig_len // bands)
    banded = signatures.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bd).alias("band"),
                    F.md5(F.concat_ws("|", F.slice("sig", bd * rows + 1, rows))).alias("key"),
                )
                for bd in range(bands)
            ])
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.select(F.col("doc_id").alias("a"), "band", "key")
    b = banded.select(F.col("doc_id").alias("b"), "band", "key")
    return a.join(b, ["band", "key"]).where(F.col("a") < F.col("b")).select("a", "b").distinct()


def minhash_dedup_pairs(docs: DataFrame, n=3, num_hashes=32, bands=8, threshold=0.8, col="text") -> DataFrame:
    """MinHash-LSH near-dup pipeline: shingle → minhash → band →
    bucket-join → verify survivors with exact Jaccard."""
    # one shared shingle table: signatures + both verify-join sides +
    # per-doc sizes all read the same cache instead of replaying the
    # tokenise/explode subtree four times
    sh = shingles(docs, n, col).persist()
    sigs = minhash_signatures(docs, n, num_hashes, col, _sh=sh)
    cand = minhash_lsh_candidates(sigs, bands)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        cand.join(a, "a").join(b, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(sa, "a").join(sb, "b")
        .select("a", "b", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------- SimHash
def simhash(docs: DataFrame, col="text", bits=64) -> DataFrame:
    """64-bit SimHash per doc, fully JVM-side (no Python in the plan):
    explode whitespace tokens → per-token 64-bit hash = first 16 hex chars
    of ``md5(token)`` split into two 32-bit halves (``conv(hex, 16, 10)``)
    → per-bit majority vote as 64 map-side-combinable ``sum`` aggregates →
    sign bits reassembled into one signed long.  Hash family is md5, so
    the signature has an exact DuckDB twin (``('0x' || substr)::BIGINT``)
    for the correctness oracle.  Returns (doc_id, simhash:long); empty
    docs get signature 0.

    The whole pipeline is two hash aggregations over the exploded token
    table — linear shuffle, whole-stage codegen, scales like word count.
    """
    if bits != 64:
        raise ValueError("only 64-bit simhash is supported")
    tok = F.explode(F.split(F.lower(F.coalesce(F.col(col), F.lit(""))), r"\s+")).alias("tok")
    t = docs.select("doc_id", tok).where(F.col("tok") != "")
    h = F.md5(F.col("tok"))
    halves = t.select(
        "doc_id",
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring(h, 9, 8), 16, 10).cast("long").alias("lo"),
    )
    votes = []
    for b in range(64):
        half = F.col("hi") if b >= 32 else F.col("lo")
        bit = F.shiftrightunsigned(half, b % 32).bitwiseAND(F.lit(1))
        votes.append(F.sum(bit * 2 - 1).alias(f"v{b}"))
    agg = halves.groupBy("doc_id").agg(*votes)
    sig = F.lit(0).cast("long")
    for b in range(64):
        # bit 63 is the sign bit of the two's-complement long
        val = F.lit(-9223372036854775807 - 1) if b == 63 else F.lit(1 << b)
        sig = sig + F.when(F.col(f"v{b}") > 0, val).otherwise(F.lit(0).cast("long"))
    out = agg.select("doc_id", sig.alias("simhash"))
    return (
        docs.select("doc_id")
        .join(out, "doc_id", "left")
        .na.fill({"simhash": 0})
    )


def simhash_candidates(sim: DataFrame, band_bits=16) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any of the 64/band_bits
    bands of their SimHash (standard Hamming-LSH)."""
    nbands = 64 // band_bits
    mask = (1 << band_bits) - 1
    banded = sim.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright("simhash", i * band_bits).bitwiseAND(F.lit(mask)).alias("key"),
                )
                for i in range(nbands)
            ])
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    a = banded.select(F.col("doc_id").alias("a"), "band", "key")
    b = banded.select(F.col("doc_id").alias("b"), "band", "key")
    return a.join(b, ["band", "key"]).where(F.col("a") < F.col("b")).select("a", "b").distinct()


def duplicate_spans(
    docs: DataFrame,
    k: int = 5,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicated-substring coverage at token-k-gram
    granularity — the distributed form of the exact-substring dedup
    signal of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better"), which found verbatim cross-document
    spans to be the highest-value thing to remove from LM corpora.
    A token position is "duplicated" when it is covered by any k-gram
    that also occurs in >= ``min_docs`` distinct documents.

    Returns ``(doc_id, n_tokens, n_dup_grams, dup_tokens, dup_frac)``;
    filter ``dup_frac`` high to drop boilerplate-heavy docs, or use
    ``dup_tokens`` for span-clipping downstream.

    Scale shape: one word-count-shaped k-gram explode (len rows per
    doc), one hash aggregate on gram (map-side combinable; boilerplate
    hub grams are just heavy groups, never a join blow-up), one semi
    join back, and a k-bounded position explode ONLY over duplicated
    grams.  State is linear in corpus tokens — the suffix array the
    paper builds single-node is replaced by the fixed-k hash shuffle.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    toks = F.split(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("tk"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    grams = base.where(F.col("n_tokens") >= k).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), (F.col("n_tokens") - k).cast("int")),
                lambda i: F.array_join(F.slice(F.col("tk"), i + 1, k), " "),
            )
        ).alias("pos", "gram"),
    )
    dupg = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("gram")
    )
    dup_pos = grams.join(dupg, "gram", "semi")
    dgrams = dup_pos.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_grams")
    )
    covered = (
        dup_pos.select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + k - 1)).alias("p"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("dup_tokens"))
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(dgrams, "doc_id", "left")
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_frac"),
        )
    )


def cross_source_dupes(docs: DataFrame, col: str = "text") -> DataFrame:
    """Cross-source exact-duplication matrix: for every unordered source
    pair, how many distinct texts appear in BOTH — the "who copies from
    whom" curation signal that decides which source to keep when
    near-identical feeds overlap.  Returns (source_a, source_b,
    n_shared_texts) with source_a < source_b.

    Scale: one distinct over (md5(text), source) — combinable — then a
    self-join keyed on the hash, fan-out bounded per hash by the number
    of DISTINCT SOURCES carrying it (≤ |sources|, a catalog-sized
    constant), never by duplicate count.
    """
    h = docs.select(F.md5(F.col(col)).alias("h"), "source").distinct()
    return (
        h.alias("l")
        .join(h.alias("r"), "h")
        .where(F.col("l.source") < F.col("r.source"))
        .groupBy(
            F.col("l.source").alias("source_a"), F.col("r.source").alias("source_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_texts"))
    )


def ngram_novelty(docs: DataFrame, n: int = 3, col: str = "text") -> DataFrame:
    """Per-document n-gram novelty — the incremental-contribution dual
    of duplicate detection: what fraction of a doc's distinct word
    n-grams appear here FIRST (no lower doc_id contains them)?  Low
    novelty ⇒ the doc is largely recombined boilerplate even when no
    single source passes a pairwise near-dup threshold — the curation
    signal pairwise Jaccard misses.

    Returns (doc_id, n_shingles, n_novel, novelty); docs whose text
    yields no shingles are absent (novelty undefined).

    Scale shape: one groupBy(shingle) for first-occurrence (map-side
    partial min — a hub shingle costs one combiner cell, never a
    quadratic bucket), one shingle-keyed join back, one groupBy(doc).
    At 10^12 docs "first" stays well-defined because doc_id is a total
    order — no tie-break ambiguity for the oracle to diverge on.
    """
    sh = shingles(docs, n, col).persist()
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    out = (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum((F.col("doc_id") == F.col("first_doc")).cast("long")).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_shingles"), 6).alias("novelty"),
        )
    )
    out = out.localCheckpoint(eager=True)
    sh.unpersist()
    return out


def containment_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.8, col: str = "text",
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """Broder CONTAINMENT near-dup pairs: c(a→b) = |Sₐ∩S_b| / |Sₐ| —
    the asymmetric measure that catches quotation/subset duplication
    (a short doc fully embedded in a long one scores ~1.0 where Jaccard
    stays low).  Returns every ordered pair with c(a→b) ≥ threshold,
    a ≠ b: (a, b, containment, jaccard) — Jaccard rides along free for
    triage.

    Scale shape: identical to :func:`ngram_jaccard_pairs` — one shared
    shingle table, a shingle-bucket self-join with the hub-frequency
    cap, per-doc sizes; only the final normalisation differs (divide by
    |Sₐ| instead of the union).
    """
    sh = shingles(docs, n, col)
    if max_shingle_freq:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("f"))
        sh = sh.join(
            freq.where(F.col("f") <= max_shingle_freq).select("shingle"), "shingle"
        )
    sh = sh.persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb")), "b")
        .select(
            "a", "b",
            F.round(F.col("i") / F.col("na"), 6).alias("containment"),
            F.round(F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 6).alias("jaccard"),
        )
        .where(F.col("containment") >= threshold)
    )
    out = out.localCheckpoint(eager=True)
    sh.unpersist()
    return out


def jaccard_prefix_pairs(
    docs: DataFrame, n=3, threshold=0.8, col="text"
) -> DataFrame:
    """EXACT word-n-gram Jaccard join via prefix filtering — the
    PPJoin-family technique (Chaudhuri et al., "A Primitive Operator for
    Similarity Joins"; Xiao et al., "Efficient Similarity Joins for Near
    Duplicate Detection"): order every doc's shingles by ascending global
    frequency (rarest first) and keep only the first
    ``|x| - ceil(t*|x|) + 1`` as its *prefix*.  ``J(x,y) >= t`` forces
    ``|x n y| >= ceil(t*|x|)``, and x's suffix holds only
    ``ceil(t*|x|) - 1`` shingles — so at least one COMMON shingle sits in
    x's prefix (pigeonhole), and probing the prefixes against the full
    inverted list finds every qualifying pair.  The hub shingles that
    make :func:`ngram_jaccard_pairs` quadratic are exactly the ones
    frequency ordering pushes OUT of the prefixes, so a hub bucket costs
    ``prefix_freq x full_freq`` with a near-zero prefix side instead of
    ``full_freq**2``.  Unlike the ``max_shingle_freq`` cap this is
    LOSSLESS: output equals the uncapped exact join.

    Returns (a, b, jaccard), a < b, jaccard rounded to 6.

    Scale shape: one frequency aggregate, one per-doc window to rank
    shingles (hash-partitioned by doc), the prefix-vs-list equality join,
    then intersection counting restricted to candidate pairs —
    candidates x doc-size rows, never |bucket|² of a hub shingle.
    """
    from pyspark.sql import Window

    sh = shingles(docs, n, col).persist()
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("f"))
    ranked = (
        sh.join(freq, "shingle")
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.asc("f"), F.asc("shingle"))
            ),
        )
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    t = float(threshold)
    prefix = (
        ranked.join(sizes, "doc_id")
        .where(F.col("r") <= F.col("n_sh") - F.ceil(F.lit(t) * F.col("n_sh")) + 1)
        .select("doc_id", "shingle")
    )
    pa = prefix.select(F.col("doc_id").alias("p"), "shingle")
    full_b = sh.select(F.col("doc_id").alias("q"), "shingle")
    cand = (
        pa.join(full_b, "shingle")
        .where(F.col("p") != F.col("q"))
        .select(
            F.least("p", "q").alias("a"), F.greatest("p", "q").alias("b")
        )
        .distinct()
    )
    # intersection sizes for CANDIDATES only: expand each candidate pair by
    # a's full shingle set, probe b's — sum(|a|) over candidates, linear
    sh_a = sh.select(F.col("doc_id").alias("a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        cand.join(sh_a, "a")
        .join(sh_b, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    out = (
        inter.join(sa, "a")
        .join(sb, "b")
        .select("a", "b", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
    out = out.localCheckpoint(eager=True)
    sh.unpersist()
    return out


def tfidf_cosine_pairs(
    docs: DataFrame, threshold: float = 0.3, col: str = "text",
    max_token_df: int | None = 1000,
) -> DataFrame:
    """tf-idf-weighted cosine similarity join over the word-token
    inverted index — the sparse-vector twin of the embedding cosine
    join and the classic IR "more-like-this" operator (Salton's vector
    space model).  Weight = tf · ln(N/df); returns every unordered pair
    with cosine ≥ threshold as (a, b, cosine), a < b, rounded to 6.

    Unlike n-gram Jaccard (set overlap) this scores REPEATED shared
    vocabulary and down-weights corpus-common words, so it catches
    topically-duplicated docs whose shingle sets barely intersect.

    Scale shape: candidate generation is an inverted-index equality
    self-join on the token — quadratic only within one token's posting
    list, and ``max_token_df`` caps the worst list (the stopword hub
    guard; a token in >cap docs carries near-zero idf, so dropping it
    from the dot product loses a bounded, near-zero term).  Norms are
    exact over ALL tokens.  The per-doc weight table is built once and
    persisted across the norm and dot consumers; corpus size N rides a
    1-row broadcast cross join, never a driver action.
    """
    toks = docs.select(
        "doc_id", F.explode(tokens_col(col)).alias("token")
    ).where(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).cast("double").alias("tf"))
    ndocs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(ndocs))
        .select(
            "doc_id", "token", "df",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("w"),
        )
        .persist()
    )
    norms = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm"))
    wcap = w if max_token_df is None else w.where(F.col("df") <= max_token_df)
    a = wcap.select(F.col("doc_id").alias("a"), "token", F.col("w").alias("wa"))
    b = wcap.select(F.col("doc_id").alias("b"), "token", F.col("w").alias("wb"))
    dots = (
        a.join(b, "token")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    out = (
        dots.join(norms.select(F.col("doc_id").alias("a"), F.col("norm").alias("na")), "a")
        .join(norms.select(F.col("doc_id").alias("b"), F.col("norm").alias("nb")), "b")
        .select(
            "a", "b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
    out = out.localCheckpoint(eager=True)
    w.unpersist()
    return out


def source_minhash_overlap(
    docs: DataFrame, n: int = 3, k: int = 128, col: str = "text"
) -> DataFrame:
    """Estimated shingle-set Jaccard between every SOURCE pair from
    bottom-k (KMV) sketches — "how much do two feeds overlap textually"
    at catalog granularity, without ever joining the two corpora.  Each
    source's shingle UNION is sketched by its k smallest md5-derived
    hash values; for a pair, the estimate is the classic KMV
    intersection rate within the k smallest of the merged sketch:
    Ĵ = |sketch_a ∩ sketch_b ∩ bottomk(a ∪ b)| / k_used.  When a pair's
    union fits inside k the estimate is EXACT — which is also what makes
    the operator SQL-twinnable: the sketch is a deterministic function
    of the data, not a random sample.

    Complements :func:`cross_source_dupes` (exact WHOLE-doc duplication
    counts): this one sees partial textual overlap, at sketch cost.

    Returns (source_a, source_b, k_used, n_inter, est_jaccard) with
    source_a < source_b.

    Scale shape: one shingle pass → distinct (source, h) — both
    map-side combinable — one per-source bottom-k window over ≤
    |sources|·|distinct h| rows, then all remaining stages run on the
    k·|sources|-row sketch table (driver-free, broadcast-sized).  The
    32-bit md5 prefix is the repo-wide cross-engine hash convention;
    collisions merge sketch elements identically in both engines.
    """
    sh = shingles(docs, n=n, col=col)
    src = docs.select("doc_id", "source")
    h = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long")
    sset = (
        sh.join(src, "doc_id")
        .select("source", h.alias("h"))
        .distinct()
    )
    w = Window.partitionBy("source").orderBy("h")
    sk = (
        sset.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("source", "h")
    )
    srcs = sk.select("source").distinct()
    # catalog-sized pair frame: broadcast one side so the planner emits a
    # broadcast nested-loop, never a shuffled cartesian
    ps = (
        srcs.select(F.col("source").alias("source_a"))
        .crossJoin(F.broadcast(srcs.select(F.col("source").alias("source_b"))))
        .where(F.col("source_a") < F.col("source_b"))
    )
    m = (
        ps.join(sk.select(F.col("source").alias("source_a"), "h"), "source_a")
        .select("source_a", "source_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            ps.join(sk.select(F.col("source").alias("source_b"), "h"), "source_b")
            .select("source_a", "source_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
        )
        .groupBy("source_a", "source_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wu = Window.partitionBy("source_a", "source_b").orderBy("h")
    both = (
        m.withColumn("rk", F.row_number().over(wu))
        .where(F.col("rk") <= k)
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("k_used"),
            F.sum(F.col("in_a") * F.col("in_b")).alias("n_inter"),
        )
    )
    return both.select(
        "source_a", "source_b", "k_used", "n_inter",
        F.round(F.col("n_inter") / F.col("k_used"), 6).alias("est_jaccard"),
    )


def winnowing_fingerprints(
    docs: DataFrame, k: int = 5, w: int = 4, col: str = "text"
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer–Wilkerson–Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every positional token
    k-gram, slide a window of ``w`` consecutive hashes, and keep each
    window's MINIMUM — the guarantee is that any shared substring of
    length ≥ k + w − 1 tokens yields at least one shared fingerprint,
    while only ~2/(w+1) of all k-grams are kept.  The fingerprint SET is
    independent of the rightmost-tie position rule (ties pick the same
    hash value), which keeps the operator engine-reproducible.  Short
    documents (< w k-grams) keep their single window's minimum.  Returns
    distinct (doc_id, fp).

    Contrast :func:`shingles`+minhash (set-similarity estimates) and
    :func:`duplicate_spans` (exact k-gram census): winnowing gives
    position-robust partial-copy DETECTION with a coverage guarantee at
    a fraction of the k-gram volume.

    Scale shape: one positional explode, one per-doc ordered window of
    fixed width w (partition-bounded by doc length), one distinct —
    all linear in corpus token count, no joins.
    """
    toks = tokens_col(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
    kg = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    pos = (
        docs.select("doc_id", F.posexplode(kg).alias("pos", "kgram"))
        .where(F.length("kgram") > 0)
    )
    h = F.conv(F.substring(F.md5("kgram"), 1, 8), 16, 10).cast("long")
    wf = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    wn = Window.partitionBy("doc_id")
    sel = (
        pos.select("doc_id", "pos", h.alias("h"))
        .withColumn("wmin", F.min("h").over(wf))
        .withColumn("n_kg", F.count(F.lit(1)).over(wn))
        .where(F.col("pos") <= F.greatest(F.col("n_kg") - w, F.lit(0)))
    )
    return sel.select("doc_id", F.col("wmin").alias("fp")).distinct()


def winnowing_pairs(
    docs: DataFrame, k: int = 5, w: int = 4, min_shared: int = 2,
    max_fp_freq: int | None = 1000, col: str = "text",
) -> DataFrame:
    """Partial-copy candidate pairs from shared winnowing fingerprints:
    (doc_a, doc_b, n_shared) with doc_a < doc_b and n_shared ≥
    ``min_shared`` shared fingerprints — each shared fingerprint
    certifies a shared token run of length ≥ k (and any shared run of
    ≥ k + w − 1 tokens is guaranteed to surface).  ``max_fp_freq`` drops
    boilerplate fingerprints carried by more docs than the cap (the
    ngram_jaccard hub-shingle convention): a fingerprint in thousands of
    docs is template text and costs deg² pair rows for no signal.

    Scale shape: the fingerprint table is ~2/(w+1) of the k-gram volume;
    the pair stage is one fp-keyed self-join, quadratic only within one
    fingerprint's (capped) posting list.  The fingerprint table feeds
    FOUR consumers (the freq cap, its semi-join probe, and both pair
    sides), so it is persisted once — the minhash_dedup_pairs shared-
    shingle convention — instead of replaying the tokenise/k-gram/
    window-min subtree per consumer (measured 7.2s → ~3s at sf0.1).
    """
    fp = winnowing_fingerprints(docs, k=k, w=w, col=col).persist()
    if max_fp_freq is not None:
        freq = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("nf"))
        fp = fp.join(freq.where(F.col("nf") <= max_fp_freq).select("fp"), "fp", "semi")
    l = fp.select("fp", F.col("doc_id").alias("doc_a"))
    r = fp.select("fp", F.col("doc_id").alias("doc_b"))
    return (
        l.join(r, "fp").where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= int(min_shared))
    )


def minhash_band_keys(docs: DataFrame, n=3, num_hashes=32, bands=8, col="text") -> DataFrame:
    """(doc_id, band, key) LSH band-key table — the shared candidate
    currency of :func:`minhash_lsh_candidates`, the online greedy filter
    and the streaming near-dup state (same md5 hash family, portable to
    plain SQL)."""
    if bands > num_hashes:
        # out-of-range F.slice returns [], every doc would share the
        # md5('') band key, and the downstream greedy/streaming gates
        # would silently reject everything but the minimum id
        # (mirror of the minhash_lsh_candidates check)
        raise ValueError(f"bands={bands} > num_hashes={num_hashes}")
    signatures = minhash_signatures(docs, n, num_hashes, col)
    rows = max(1, num_hashes // bands)
    return signatures.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bd).alias("band"),
                    F.md5(F.concat_ws("|", F.slice("sig", bd * rows + 1, rows))).alias("key"),
                )
                for bd in range(bands)
            ])
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def online_neardup_filter(
    docs: DataFrame, n=3, num_hashes=32, bands=8, col="text",
    seen: DataFrame | None = None, max_rounds: int = 64,
) -> DataFrame:
    """Greedy first-wins-by-id near-dup ADMISSION — the online semantics
    of a streaming dedup gate, distinct from the transitive collapse of
    :func:`neardup_dedup`: scanning docs in ``doc_id`` order, admit a
    doc iff it shares no LSH band key with any ALREADY-ADMITTED doc (or
    with the optional ``seen`` (band, key) history).  In a chain A–B–C
    where only adjacent pairs collide, greedy admits {A, C} (no admitted
    pair is a near-dup) while the transitive collapse keeps only A.
    Returns (doc_id, admitted).

    The sequential scan is simulated in rounds (greedy-MIS style): a doc
    whose every band key it is the minimum remaining holder of is safe
    to admit; docs colliding with this round's admissions drop; repeat.
    Each round admits at least the smallest remaining id, and chains
    longer than a few hops are vanishingly rare at real thresholds —
    rounds, each one aggregate + two joins, not passes over the corpus.
    """
    bk = minhash_band_keys(docs, n, num_hashes, bands, col).persist()
    if seen is not None:
        hist = bk.join(seen.select("band", "key"), ["band", "key"], "semi")
        hit = hist.select("doc_id").distinct()
        remaining = bk.join(hit, "doc_id", "left_anti").localCheckpoint(eager=True)
    else:
        remaining = bk
    admitted_chunks = []
    for _ in range(max_rounds):
        if remaining.isEmpty():
            break
        wmin = remaining.groupBy("band", "key").agg(F.min("doc_id").alias("w"))
        safe = (
            remaining.join(wmin, ["band", "key"])
            .groupBy("doc_id")
            .agg(F.min((F.col("w") == F.col("doc_id")).cast("int")).alias("ok"))
            .where(F.col("ok") == 1)
            .select("doc_id")
            .localCheckpoint(eager=True)
        )
        admitted_chunks.append(safe)
        taken = remaining.join(safe, "doc_id", "semi").select("band", "key").distinct()
        conflicted = (
            remaining.join(taken, ["band", "key"], "semi")
            .select("doc_id").distinct()
            .join(safe, "doc_id", "left_anti")
            .localCheckpoint(eager=True)
        )
        remaining = (
            remaining.join(safe, "doc_id", "left_anti")
            .join(conflicted, "doc_id", "left_anti")
            .localCheckpoint(eager=True)
        )
    else:
        if not remaining.isEmpty():
            raise RuntimeError(
                f"online_neardup_filter: greedy did not converge in {max_rounds} rounds"
            )
    ids = docs.select("doc_id")
    adm = admitted_chunks[0] if admitted_chunks else ids.limit(0)
    for c in admitted_chunks[1:]:
        adm = adm.unionByName(c)
    # shingle-less docs (empty / sub-n-gram text) carry no band keys, so
    # they can collide with nothing: vacuously admitted (exact dedup is
    # the gate for byte-identical empties, not the near-dup filter)
    no_shingles = ids.join(bk.select("doc_id"), "doc_id", "left_anti")
    adm = adm.unionByName(no_shingles)
    out = ids.join(
        adm.select("doc_id", F.lit(True).alias("admitted")), "doc_id", "left"
    ).na.fill({"admitted": False}).localCheckpoint(eager=True)
    bk.unpersist()
    return out
