"""Physical-plan regression guards for the driver queries.

The scale contract (SURVEY.md §2.6-2.7, BENCH/PLANS.md) is that no
declarative query plans a cartesian product and that the text operators
prune the documents scan to the columns they read.  These asserts freeze
those properties so a refactor that silently reintroduces an all-pairs
join or a full-width scan fails CI instead of failing at 100 TB.

Iterative queries (leiden, pagerank, profiles) run driver loops with
their own audited per-superstep plans and are exercised elsewhere.
"""

import io
from contextlib import redirect_stdout

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

# one-shot declarative queries: building the DataFrame must not launch
# jobs, and the final plan must not contain a cartesian product.
DECLARATIVE = [
    "edge_derivation",
    "bipartite_edges",
    "degrees",
    "triangle_count",
    "quality_modularity",
    "quality_cpm",
    "quality_rber",
    "quality_rbconfiguration",
    "quality_significance",
    "quality_surprise",
    "token_count",
    "doc_quality",
    "lang_id",
    "doc_fingerprint",
    "dedup_exact",
    "neardup_jaccard",
    "minhash_signature",
    "simhash",
    "lsh_topk",
    "embedding_neardup",
    "sessionize",
    "media_features",
    # clustering_coefficient materialises (eager localCheckpoint, like the
    # other kernels) so its visible plan is an ExistingRDD scan — its
    # wedge join is equality-keyed by construction, audited in kernels.py
    "decontaminate",
    "hash_split",
    "stratified_sample",
    "pack_sequences",
    "repetition_stats",
    "clean_text",
    "top_bigrams",
    "mixture_sample",
    "bm25",
    "tfidf_terms",
    "pii_mask",
    "community_stats",
    "pmi_cooccurrence",
    "reciprocity",
    "training_set",
    "event_windows_sliding",
    "partition_compare",
    "lm_score",
    "conversation_profile",
    "anomaly_windows",
    "duplicate_spans",
    "mixing_matrix",
    "assortativity_nominal",
    "transitivity",
    "bpe_pairs",
    "graph_summary",
    "importance_sample",
    "quantize_embeddings",
    "tool_chains",
    "role_transitions",
    "turn_latency",
    "text_entropy",
    "hashed_features",
    "chunk_documents",
    "triad_census",
    "knn_graph",
    "tool_retries",
    "conversation_endings",
    "turn_boilerplate",
    "bib_coupling",
    "kmeans_outliers",
    "avg_neighbor_degree",
    "vertex_diversity",
    "burt_constraint",
    "dyad_census",
    "power_law_fit",
    "vocab_coverage",
    "filter_funnel",
    "cross_source_dupes",
    "edge_drift",
    "knnk",
    "degree_gini",
    "molloy_reed",
    "dice_similarity",
    "zipf_fit",
    "vocab_growth",
    "burstiness",
    "line_graph",
    "rfm_scores",
    "script_profile",
    "json_field_stats",
    "community_conductance",
    "edge_lift",
    "knn_label_noise",
    "semantic_dedup",
    "source_minhash_overlap",
    "interarrival_ks",
    "l_diversity",
    "triangle_significance",
    "leadlag_correlation",
    "session_concurrency",
    "attribution",
    "dim_truncation",
    "simrank",
    "bipartite_newman",
    "winnowing",
    "label_separation_auc",
    "nestedness",
    "rrf_fuse",
    "decayed_edges",
    "disparate_impact",
    "population_stability",
    "retrieval_ndcg",
    "table_expectations",
    "referential_integrity",
    "mixing_parameter",
    "session_entries_exits",
    "heavy_user_share",
    "kmeans_elbow",
    "embedding_curation",
    "adoption_curve",
]

# the quality evaluators attach global scalars (total edge weight m,
# vertex count n) by cross-joining 1-row grouping-free aggregates — a
# BroadcastNestedLoopJoin whose build side is provably one row.  Allowed.
SCALAR_CROSS = {
    "quality_modularity", "quality_cpm", "quality_rber",
    "quality_rbconfiguration", "quality_significance", "quality_surprise",
    # corpus scalars (N, avgdl) ride 1-row broadcast cross joins
    "bm25", "tfidf_terms",
    # total-volume scalar rides a 1-row broadcast cross join
    "community_stats",
    # corpus scalars (N_tokens, N_pairs) ride 1-row broadcast cross joins
    "pmi_cooccurrence",
    # the three 1-row marginal summaries assemble via broadcast cross joins
    "partition_compare",
    # model scalars (corpus size T, vocab V) ride a 1-row broadcast cross join
    "lm_score",
    # W / Σa_i² global scalars ride 1-row broadcast cross joins
    "assortativity_nominal",
    # the 1-row wedge total rides a broadcast cross join
    "transitivity",
    # four 1-row summary scalars ride broadcast cross joins
    "graph_summary",
    # dyad-census scalars (M, A, n, ΣT2) ride 1-row broadcast cross joins
    "triad_census",
    # the 1-row conversation total rides a broadcast cross join
    "conversation_endings",
    # the kmeans fit attaches the k-row centroid table via a broadcast
    # nested-loop (same as the kmeans/silhouette queries)
    "kmeans_outliers",
    # the 1-row vertex-count scalar rides a broadcast cross join
    "dyad_census",
    # alpha and KS scalars ride 1-row broadcast cross joins
    "power_law_fit",
    # the corpus-total scalar rides a 1-row broadcast cross join
    "vocab_coverage",
    # alpha/KS/type-count scalars ride 1-row broadcast cross joins
    "zipf_fit",
    # the quantile-threshold row rides a 1-row broadcast cross join
    "vocab_growth",
    # the corpus-horizon row (max_day, n) rides a 1-row broadcast cross join
    "rfm_scores",
    # volume/vertex-count 1-row scalars ride broadcast cross joins
    "community_conductance",
    # the 1-row total-weight scalar rides a broadcast cross join
    "edge_lift",
    # exact-kNN baseline broadcasts the bounded id block (the cosine_topk
    # pattern: build side is the broadcast exchange, never a shuffle)
    "knn_label_noise",
    # the k-row centroid table attaches via broadcast nested-loop (kmeans)
    "semantic_dedup",
    # the catalog-sized source-pair frame assembles via broadcast joins
    "source_minhash_overlap",
    # the dense grid assembles via a broadcast label-list cross join
    "leadlag_correlation",
    # the 1-row degree-moment scalars ride a broadcast cross join
    "triangle_significance",
    # 1-row side sums / counts assemble via broadcast cross joins
    "nestedness",
    # both fused rankings broadcast their 8-query block (cosine_topk pattern)
    "rrf_fuse",
    # the 1-row corpus horizon rides a broadcast cross join
    "decayed_edges",
    # the 1-row max-rate scalar rides a broadcast cross join
    "disparate_impact",
    # the 1-row midpoint / totals ride broadcast cross joins
    "population_stability",
    # broadcast query block (cosine_topk) + broadcast k-row IDCG helper
    "retrieval_ndcg",
    # 1-row session-total / pct-frame scalars ride broadcast cross joins
    "session_entries_exits",
    "heavy_user_share",
    # the k-row centroid tables attach via broadcast nested-loop (kmeans)
    "kmeans_elbow",
    # kmeans centroid broadcasts + the full-table kNN query-side broadcast
    "embedding_curation",
}


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", DECLARATIVE)
def test_no_cartesian_product(spark, name):
    df = entry.queries()[name](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    if name not in SCALAR_CROSS:
        assert "BroadcastNestedLoopJoin" not in plan, plan


def test_cosine_topk_broadcasts_query_block_only(spark):
    df = entry.queries()["cosine_topk"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    # the nested-loop join must exist AND its build side must be the
    # broadcast exchange (the filtered query block), never a shuffle
    assert "BroadcastNestedLoopJoin" in plan
    assert "BroadcastExchange" in plan


def test_hash_split_is_scan_plus_project_only(spark):
    # hash_split is a pure projection: no exchange, no join, no aggregate
    df = entry.queries()["hash_split"](spark, SF)
    plan = _plan(df)
    for op in ("Exchange", "Join", "HashAggregate", "Sort"):
        assert op not in plan, plan
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and "doc_id" in scan[0] and "text" not in scan[0], plan


def test_stratified_sample_filter_reaches_scan(spark):
    # the bucket filter is a deterministic expression over (doc_id, lang):
    # the plan must stay scan+filter+project — no shuffle
    df = entry.queries()["stratified_sample"](spark, SF)
    plan = _plan(df)
    for op in ("Exchange", "Join", "HashAggregate"):
        assert op not in plan, plan


def test_clean_text_is_scan_plus_project_only(spark):
    # chained regexp_replace projection: no exchange, no join, no agg;
    # scan pruned to (doc_id, text)
    df = entry.queries()["clean_text"](spark, SF)
    plan = _plan(df)
    for op in ("Exchange", "Join", "HashAggregate", "Sort"):
        assert op not in plan, plan
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and "doc_id" in scan[0] and "text" in scan[0], plan
    assert "lang" not in scan[0] and "source" not in scan[0], scan[0]


def test_top_bigrams_uses_take_ordered_not_global_sort(spark):
    # the top-k must compile to TakeOrderedAndProject (per-partition
    # top-k merged on the driver) — a global Sort of the distinct-ngram
    # table would serialise the vocabulary at 100 TB
    df = entry.queries()["top_bigrams"](spark, SF)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "GlobalLimit" not in plan, plan  # limit folded into take-ordered


def test_mixture_sample_filter_only(spark):
    # deterministic per-source threshold filter: scan+filter+project,
    # thresholds are plan-time literals — no shuffle, no join
    df = entry.queries()["mixture_sample"](spark, SF)
    plan = _plan(df)
    for op in ("Exchange", "Join", "HashAggregate"):
        assert op not in plan, plan


def test_textops_prune_documents_scan(spark):
    # 2 of the documents table's columns are read; the scan must show it
    df = entry.queries()["token_count"](spark, SF)
    plan = _plan(df)
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan, plan
    line = scan[0]
    assert "text" in line and "doc_id" in line
    for unused in ("lang", "source", "n_chars"):
        assert unused not in line, line


def test_bm25_tfidf_prune_documents_scan(spark):
    # both read exactly (doc_id, text); corpus stats are 1-row broadcasts
    for name in ("bm25", "tfidf_terms"):
        df = entry.queries()[name](spark, SF)
        plan = _plan(df)
        scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert scans, plan
        for line in scans:
            assert "lang" not in line and "source" not in line, line


def test_conversation_profile_single_exchange(spark):
    # window (partitionBy conv_id) and groupBy(conv_id) must share one
    # exchange: the profile costs a single shuffle of the turn rows
    from leidenalg_spark.operators.sessions import conversation_profile
    from leidenalg_spark.sources.transcripts import synthetic_transcripts

    df = conversation_profile(synthetic_transcripts(spark, 50))
    plan = _plan(df)
    assert plan.count("Exchange") <= 2, plan  # 1 exchange + its reuse line
    assert "CartesianProduct" not in plan, plan
