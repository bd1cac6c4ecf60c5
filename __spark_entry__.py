"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline on /root/testdata/sf0.001: events →
bipartite interaction graph → distributed Leiden (modularity) →
memberships.

``queries()`` / ``oracle_sql()`` — one entry per SQL-expressible operator
from SURVEY.md §2 plus the training-data-pipeline ops; the driver runs
both sides at sf=0.01 and value-hash-compares.  Column names and rounding
are kept identical on both sides by construction.  Iterative kernels
(Leiden/PageRank/CC/LPA) and hash-signature ops that DuckDB cannot
reproduce get rows-only checks (no oracle entry).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_DEFAULT = "/root/testdata/sf0.001"

# synthetic per-source mixture weights for the mixture_sample query: the
# testdata sources are uniform src0..src19, so give them distinct weights
_MIXTURE_WEIGHTS = {f"src{i}": float(i + 1) for i in range(20)}


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _documents(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _media_docs(spark, sf_dir):
    """Document bytes standing in for opaque media payloads — the shared
    input of the media_* catalog entries, so the payload convention
    (utf-8 of coalesce(text, '')) lives in exactly one place on the
    Spark side and its DuckDB twins md5/hex the same blobs."""
    return _documents(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.lit("doc").alias("media_type"),
        F.encode(F.coalesce("text", F.lit("")), "utf-8").alias("payload"),
    )


def _bipartite_named(spark, sf_dir):
    from leidenalg_spark.operators.edges import events_to_bipartite_edges

    return events_to_bipartite_edges(_events(spark, sf_dir))


# deterministic bridge fixture: binary tree on 0..14 (every edge a
# bridge) + 3 chords that each kill the two tree edges of their cycle —
# shared between q_bridges and its brute-force reachability oracle
_BRIDGE_FIXTURE = [((i - 1) // 2, i) for i in range(1, 15)] + [(1, 2), (7, 8), (13, 14)]


def _couser_edges(spark, sf_dir, min_weight=3):
    """User–user co-activity graph: an edge when two users act in the
    same (event_type, hour) bucket in ≥ min_weight distinct buckets.
    Unlike the bipartite/type-transition graphs this one is triangle-
    rich with real community structure — the fixture for the
    triangle-based kernels (embeddedness, clique percolation).  Ids are
    raw user_ids, so any SQL engine rebuilds it exactly."""
    from leidenalg_spark.operators.edges import events_to_coactivity_edges

    return events_to_coactivity_edges(_events(spark, sf_dir), min_weight=min_weight)


def _bipartite_ids(spark, sf_dir):
    named = _bipartite_named(spark, sf_dir)
    return named.select(
        F.xxhash64("src_name").alias("src"), F.xxhash64("dst_name").alias("dst"), "weight"
    )


def _bipartite_ids_det(spark, sf_dir):
    """Bipartite edges with a DuckDB-reproducible id space: users get
    ``2*user_id`` (even), event types get odd lexicographic ranks —
    so the iterative-kernel oracles (pagerank / cc / lpa) can rebuild
    the identical graph, labels included, in plain SQL."""
    from pyspark.sql import Window

    named = _bipartite_named(spark, sf_dir)
    tids = (
        named.select("dst_name").distinct()
        .withColumn("tid", 2 * F.row_number().over(Window.orderBy("dst_name")) + 1)
    )
    return (
        named.join(tids, "dst_name")
        .select(
            (2 * F.expr("CAST(substr(src_name, 3) AS BIGINT)")).alias("src"),
            F.col("tid").cast("long").alias("dst"),
            "weight",
        )
    )


def _bipartite_membership(spark, sf_dir):
    """Deterministic membership over the bipartite graph, reproducible in
    SQL: users → user_id % 8, event types → length(name) % 8."""
    from leidenalg_spark.operators.edges import vertex_table

    verts = vertex_table(_bipartite_named(spark, sf_dir))
    comm = F.when(
        F.col("name").startswith("u:"), F.expr("CAST(substr(name, 3) AS BIGINT) % 8")
    ).otherwise(F.length("name") % 8)
    return verts.select("id", comm.cast("long").alias("comm"))


# ---------------------------------------------------------------- entry
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sf0.001 events → interaction graph → Leiden communities."""
    from leidenalg_spark.operators.leiden import leiden

    from leidenalg_spark.operators.edges import vertex_table

    edges = _bipartite_ids(spark, SF_DEFAULT)
    res = leiden(spark, edges, method="modularity", n_iterations=2, seed=42)
    verts = vertex_table(_bipartite_named(spark, SF_DEFAULT))
    return res.membership.join(verts, "id").select("name", "comm")


# -------------------------------------------------------------- queries
def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from leidenalg_spark.functions.quality import quality_onerow
    from leidenalg_spark.operators import dedup as D
    from leidenalg_spark.operators import edges as E
    from leidenalg_spark.operators import kernels as K
    from leidenalg_spark.operators import similarity as S
    from leidenalg_spark.operators import textops as T

    def q_edge_derivation(spark, sf):
        return E.events_to_type_transition_edges(_events(spark, sf))

    def q_bipartite_edges(spark, sf):
        return _bipartite_named(spark, sf)

    def q_degrees(spark, sf):
        # degrees over vertex *names* so the oracle can reproduce ids
        named = _bipartite_named(spark, sf)
        ends = named.select(F.col("src_name").alias("name"), "weight").unionByName(
            named.select(F.col("dst_name").alias("name"), "weight")
        )
        return ends.groupBy("name").agg(
            F.count(F.lit(1)).alias("degree"), F.round(F.sum("weight"), 6).alias("strength")
        )

    def q_triangles(spark, sf):
        e = E.events_to_type_transition_edges(_events(spark, sf)).select(
            F.xxhash64("src_name").alias("src"), F.xxhash64("dst_name").alias("dst"), "weight"
        )
        return K.triangle_count(spark, e)

    def q_transitivity(spark, sf):
        # global transitivity on the same type-transition graph as
        # triangle_count (orientation-invariant, so hashed ids are fine)
        e = E.events_to_type_transition_edges(_events(spark, sf)).select(
            F.xxhash64("src_name").alias("src"), F.xxhash64("dst_name").alias("dst"), "weight"
        )
        return K.transitivity_global(spark, e)

    def q_avg_distance(spark, sf):
        # truncated mean distance over the <=2-hop balls (harmonic's graph)
        return K.avg_distance(spark, _bipartite_ids_det(spark, sf), max_dist=2)

    def q_bpe_pairs(spark, sf):
        return T.bpe_pair_counts(_documents(spark, sf), k=20)

    def q_clustering(spark, sf):
        # per-vertex local clustering coefficient on the type-transition
        # graph, keyed by NAME (string ids) so the oracle joins exactly
        e = E.events_to_type_transition_edges(_events(spark, sf)).select(
            F.col("src_name").alias("src"), F.col("dst_name").alias("dst"), "weight"
        )
        cc = K.clustering_coefficient(spark, e)
        return cc.select(
            F.col("id").alias("name"), "n_triangles", "degree",
            F.round("lcc", 6).alias("lcc"),
        )

    def q_avg_local_cc(spark, sf):
        # igraph transitivity_avglocal_undirected: Watts–Strogatz mean
        # local clustering (every vertex weighs equally — a DIFFERENT
        # statistic from the global wedge-ratio `transitivity` query)
        e = E.events_to_type_transition_edges(_events(spark, sf)).select(
            F.col("src_name").alias("src"), F.col("dst_name").alias("dst"), "weight"
        )
        cc = K.clustering_coefficient(spark, e)
        return cc.agg(
            F.count(F.lit(1)).cast("long").alias("n_vertices"),
            F.round(F.avg(F.round("lcc", 6)), 6).alias("avg_local_cc"),
            F.sum((F.col("degree") >= 2).cast("long")).alias("n_eligible"),
        )

    def q_assortativity(spark, sf):
        out = K.degree_assortativity(spark, _bipartite_ids_det(spark, sf))
        return out.select(F.round("assortativity", 6).alias("assortativity"))

    def q_k_core(spark, sf):
        # fixed 8 synchronous peel rounds (oracle comparability, like the
        # unrolled pagerank/lpa twins)
        return K.k_core(spark, _bipartite_ids_det(spark, sf), k=3, rounds=8)

    def quality_query(method, gamma=1.0):
        def q(spark, sf):
            return quality_onerow(
                _bipartite_ids(spark, sf), _bipartite_membership(spark, sf), method, gamma=gamma
            )

        return q

    def q_community_conductance(spark, sf):
        # per-community cut audit of the deterministic 8-way membership
        # over the bipartite interaction graph (NCP-style statistics)
        from leidenalg_spark.operators.community import community_conductance

        return community_conductance(
            _bipartite_ids(spark, sf), _bipartite_membership(spark, sf)
        ).orderBy("comm")

    def q_edge_lift(spark, sf):
        # configuration-model edge lift (graph PMI) on the det-id graph
        from leidenalg_spark.operators.kernels import edge_lift

        return edge_lift(_bipartite_ids_det(spark, sf))

    def q_token_count(spark, sf):
        return T.token_count(_documents(spark, sf))

    def q_clean_text(spark, sf):
        # md5 of the cleaned text keeps the compared payload compact
        return T.clean_text(_documents(spark, sf)).select(
            "doc_id", F.md5("clean_text").alias("clean_fp"),
            "n_urls", "n_emails", "n_chars_removed",
        )

    def q_top_bigrams(spark, sf):
        return T.top_ngrams(_documents(spark, sf), n=2, k=30)

    def q_pii_mask(spark, sf):
        # md5 of the masked text keeps the compared payload compact
        return T.pii_mask(_documents(spark, sf)).select(
            "doc_id", F.md5("masked_text").alias("masked_fp"),
            "n_emails", "n_ips", "n_phones",
        )

    def q_bm25(spark, sf):
        return T.bm25_score(_documents(spark, sf), ["spark", "join", "window"])

    def q_tfidf_terms(spark, sf):
        return T.tfidf_top_terms(_documents(spark, sf), k=3)

    def q_mixture_sample(spark, sf):
        from leidenalg_spark.operators.sampling import mixture_sample

        return mixture_sample(
            _documents(spark, sf), _MIXTURE_WEIGHTS, temperature=2.0, seed=11
        ).select("doc_id", "source")

    def q_khop_counts(spark, sf):
        return K.khop_counts(spark, _bipartite_ids_det(spark, sf), k=2)

    def q_adamic_adar(spark, sf):
        # link prediction on the bipartite graph: pairs sharing ≥2
        # neighbours (users sharing event types, and vice versa)
        return K.adamic_adar(spark, _bipartite_ids_det(spark, sf), min_common=2)

    def q_harmonic(spark, sf):
        return K.harmonic_centrality(spark, _bipartite_ids_det(spark, sf), max_dist=2)

    def q_neighborhood_hll(spark, sf):
        # HyperBall ball-size estimates; at driver scale the HLL stays in
        # sparse exact mode, so the exact-closure SQL is a valid twin
        return K.neighborhood_hll(spark, _bipartite_ids_det(spark, sf), max_dist=2)

    def q_doc_quality(spark, sf):
        return T.quality_score(_documents(spark, sf))

    def q_lang_id(spark, sf):
        return T.language_id(_documents(spark, sf))

    def q_repetition(spark, sf):
        return T.repetition_stats(_documents(spark, sf))

    def q_duplicate_spans(spark, sf):
        # Lee et al. exact-substring dedup signal at 5-gram granularity
        from leidenalg_spark.operators.dedup import duplicate_spans

        return duplicate_spans(_documents(spark, sf), k=5, min_docs=2)

    def q_fingerprint(spark, sf):
        return T.fingerprint(_documents(spark, sf))

    def q_dedup_exact(spark, sf):
        return D.dedup_exact(_documents(spark, sf))

    def q_neardup_jaccard(spark, sf):
        return D.ngram_jaccard_pairs(_documents(spark, sf), n=3, threshold=0.1)

    def q_jaccard_prefix(spark, sf):
        # lossless prefix-filtered exact Jaccard join (PPJoin-family);
        # oracle = the uncapped exact join at the same threshold
        return D.jaccard_prefix_pairs(_documents(spark, sf), n=3, threshold=0.1)

    def q_hard_negatives(spark, sf):
        emb = _embeddings(spark, sf)
        anchors = emb.where(F.col("vec_id") < 8)
        return S.hard_negatives(emb, anchors, k=5)

    def q_k_anonymity(spark, sf):
        from leidenalg_spark.operators.sampling import k_anonymity

        return k_anonymity(_documents(spark, sf), ["source", "lang"], k=5)

    def q_wl_kernel_drift(spark, sf):
        # day-over-day structural drift of the user x event-type
        # interaction graph, scored with the WL subtree kernel
        from leidenalg_spark.operators.kernels import wl_kernel_drift

        ev = _events(spark, sf)
        tid = -F.conv(F.substring(F.md5(F.col("event_type")), 1, 8), 16, 10).cast("long")
        slices = ev.select(
            F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86400000000.0)).cast("long").alias("slice"),
            F.col("user_id").alias("src"),
            tid.alias("dst"),
        ).distinct()
        return wl_kernel_drift(slices, rounds=2).orderBy("slice_a")

    def q_temporal_motifs(spark, sf):
        from leidenalg_spark.operators.events import temporal_motifs

        return temporal_motifs(_events(spark, sf), delta_s=3600).orderBy("a", "b", "c")

    def q_calibration(spark, sf):
        # calibrate a pseudo-scorer: min-max-normalised event value as the
        # predicted probability that the event is a purchase
        from leidenalg_spark.operators.events import calibration_curve

        ev = _events(spark, sf)
        mm = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        scored = ev.crossJoin(F.broadcast(mm)).select(
            ((F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo"))).alias("score"),
            (F.col("event_type") == "purchase").cast("int").alias("label"),
        )
        return calibration_curve(scored, bins=10).orderBy("bin")

    def q_training_set(spark, sf):
        # the composed corpus filter: dedup keeper AND lang=en AND
        # quality>=0.5 AND not contaminated by the every-17th benchmark
        from leidenalg_spark.operators.pipeline import training_set

        docs = _documents(spark, sf)
        bench = docs.where(F.col("doc_id") % 17 == 3)
        return training_set(docs, bench, min_quality=0.5, langs=("en",))

    def q_bigram_lm_score(spark, sf):
        # Jelinek–Mercer interpolated bigram LM perplexity filter —
        # the sequence-aware upgrade of the add-α unigram lm_score
        return T.bigram_lm_score(_documents(spark, sf)).orderBy("doc_id")

    def q_script_profile(spark, sf):
        # character-class mojibake/code-vs-prose detector
        return T.script_profile(_documents(spark, sf)).orderBy("doc_id")

    def q_source_divergence(spark, sf):
        # pairwise Jensen–Shannon divergence between per-source unigram
        # mixtures — the training-mixture overlap diagnostic
        return T.source_divergence(_documents(spark, sf)).orderBy(
            "source_a", "source_b"
        )

    def q_textrank(spark, sf):
        # TextRank keyword extraction: pagerank over the adjacent-token
        # co-occurrence graph, corpus top-15
        return T.textrank_keywords(spark, _documents(spark, sf))

    def q_pmi_cooccurrence(spark, sf):
        # word-association edges: window-5 co-occurrence, PMI weights;
        # cap 950 exercises the stopword-drop path at sf0.01
        return T.pmi_cooccurrence(
            _documents(spark, sf), window=5, min_pairs=50, max_token_freq=950
        )

    def q_neardup_dedup(spark, sf):
        # transitive near-dup collapse: pairs -> components -> min-id keep
        return D.neardup_dedup(spark, _documents(spark, sf), n=3, threshold=0.1)

    def q_decontaminate(spark, sf):
        # deterministic stand-in eval set: every 17th doc is "benchmark"
        docs = _documents(spark, sf)
        bench = docs.where(F.col("doc_id") % 17 == 3)
        return D.decontaminate(docs, bench, n=5)

    def q_hash_split(spark, sf):
        from leidenalg_spark.operators.sampling import hash_split

        return hash_split(_documents(spark, sf), seed=42).select("doc_id", "bucket", "split")

    def q_pack_sequences(spark, sf):
        from leidenalg_spark.operators.sampling import pack_sequences

        # block=64 exercises the two-pass prefix sum even at sf0.01
        return pack_sequences(_documents(spark, sf), capacity=512, block=64)

    def q_stratified_sample(spark, sf):
        from leidenalg_spark.operators.sampling import stratified_sample

        return stratified_sample(
            _documents(spark, sf), {"en": 0.5, "de": 0.25}, strata_col="lang", seed=7
        ).select("doc_id", "lang")

    def q_minhash_signature(spark, sf):
        sig = D.minhash_signatures(_documents(spark, sf), n=3, num_hashes=16)
        return sig.select("doc_id", F.concat_ws("|", "sig").alias("sig_str"))

    def q_cosine_topk(spark, sf):
        emb = _embeddings(spark, sf)
        return S.cosine_topk(emb, emb.where(F.col("vec_id") < 8), k=5).select(
            "query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank")
        )

    # ---- iterative / non-SQL ops: rows-only checks (no oracle entry)
    def q_leiden_communities(spark, sf):
        from leidenalg_spark.operators.leiden import leiden

        res = leiden(spark, _bipartite_ids(spark, sf), method="modularity", n_iterations=2, seed=42)
        return res.membership.groupBy("comm").agg(F.count(F.lit(1)).alias("size"))

    def q_consensus_communities(spark, sf):
        # Lancichinetti-Fortunato consensus over 3 seeded Leiden runs
        # (rows-only: iterative); report community sizes + mean edge
        # agreement so instability would surface as row/value drift
        from leidenalg_spark.operators.community import consensus_communities

        membership, agreement = consensus_communities(
            spark, _couser_edges(spark, sf), n_runs=3, threshold=0.5, seed=7
        )
        sizes = membership.groupBy("comm").agg(F.count(F.lit(1)).alias("size"))
        return sizes.groupBy("size").agg(F.count(F.lit(1)).alias("n_comms")).orderBy("size")

    def q_temporal_pagerank(spark, sf):
        # PageRank over the recency-decayed transition graph — the
        # continuous-time "current structure" composition (decayed_edges
        # and the unrolled-PR oracle are each independently checked; this
        # chains them end to end).  Names ranked lexicographically to a
        # DuckDB-reproducible id space.
        from pyspark.sql import Window

        de = E.events_to_decayed_edges(_events(spark, sf))
        names = (
            de.select(F.col("src_name").alias("name"))
            .unionByName(de.select(F.col("dst_name").alias("name")))
            .distinct()
            .withColumn("nid", F.row_number().over(Window.orderBy("name")))
        )
        e = (
            de.join(names.select(F.col("name").alias("src_name"), F.col("nid").alias("src")), "src_name")
            .join(names.select(F.col("name").alias("dst_name"), F.col("nid").alias("dst")), "dst_name")
            .select("src", "dst", "weight")
        )
        pr = K.pagerank(spark, e, directed=False, max_iter=8, tol=0.0)
        return (
            pr.join(names.select(F.col("nid").alias("id"), "name"), "id")
            .select("name", F.round("rank", 6).alias("rank"))
            .orderBy("name")
        )

    def q_assortativity_directed(spark, sf):
        # out-deg(src) vs in-deg(dst) Pearson over directed det edges
        from leidenalg_spark.operators.kernels import degree_assortativity_directed

        return degree_assortativity_directed(spark, _bipartite_ids_det(spark, sf))


    def q_pagerank(spark, sf):
        # fixed 8 iterations (tol=0) on the deterministic-id graph so the
        # unrolled-CTE DuckDB oracle reproduces ranks bit-for-round
        pr = K.pagerank(spark, _bipartite_ids_det(spark, sf), directed=False, max_iter=8, tol=0.0)
        pr = pr.select("id", F.round("rank", 6).alias("rank"))
        return pr.orderBy(F.desc("rank"), F.asc("id")).limit(20)

    def q_personalized_pagerank(spark, sf):
        # seeded-relevance ranks from the two smallest vertex ids; fixed 8
        # iterations so the unrolled-CTE DuckDB twin reproduces the ranks
        edges = _bipartite_ids_det(spark, sf)
        verts = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        seeds = verts.orderBy("id").limit(2)
        pr = K.personalized_pagerank(spark, edges, seeds, directed=False, max_iter=8, tol=0.0)
        pr = pr.select("id", F.round("rank", 6).alias("rank"))
        return pr.orderBy(F.desc("rank"), F.asc("id")).limit(20)

    def q_shortest_path(spark, sf):
        # user 0 -> user 1 (ids 0 -> 2): distance 2 through the min-id
        # shared event type; 4 fixed rings match the unrolled oracle
        return K.shortest_path(spark, _bipartite_ids_det(spark, sf), 0, 2, max_depth=4)

    def q_spanning_forest(spark, sf):
        # Borůvka minimum spanning forest; the (w,a,b) total order makes
        # the MSF unique, so the DuckDB twin (Kruskal via the
        # cycle-property reachability fixpoint) matches edge-for-edge
        return K.spanning_forest(spark, _bipartite_ids_det(spark, sf))

    def q_katz(spark, sf):
        # 6 fixed Katz iterations, alpha well under 1/lambda_max
        return K.katz_centrality(
            spark, _bipartite_ids_det(spark, sf), alpha=0.01, beta=1.0, max_iter=6
        )

    def q_ppr_sweep(spark, sf):
        # ACL local-community sweep from the same two seeds as the ppr
        # query (8 fixed iterations), 25-vertex sweep prefix
        edges = _bipartite_ids_det(spark, sf)
        verts = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        seeds = verts.orderBy("id").limit(2)
        return K.ppr_sweep(spark, edges, seeds, m=25, max_iter=8)

    def q_connected_components(spark, sf):
        cc = K.connected_components(spark, _bipartite_ids_det(spark, sf))
        return cc.groupBy("component").agg(F.count(F.lit(1)).alias("size"))

    def q_label_propagation(spark, sf):
        lp = K.label_propagation(
            spark, _bipartite_ids_det(spark, sf), max_iter=8,
            gate="id_parity", early_stop=False,
        )
        return lp.groupBy("label").agg(F.count(F.lit(1)).alias("size"))

    def q_label_spreading(spark, sf):
        # semi-supervised: the odd-id (event-type) vertices seed their
        # own label; users adopt the weight-dominant type
        e = _bipartite_ids_det(spark, sf)
        verts = (
            e.select(F.col("src").alias("id"))
            .union(e.select(F.col("dst").alias("id"))).distinct()
        )
        seeds = verts.where(F.col("id") % 2 == 1).select(
            "id", F.col("id").alias("label")
        )
        return K.label_spreading(
            spark, e, seeds, max_iter=4, gate="id_parity", early_stop=False
        )

    def q_random_walks(spark, sf):
        # 3-step md5-seeded weighted walks on the symmetrised graph;
        # unrolled-CTE twin reproduces every hop (seed 42)
        return K.random_walks(
            spark, _bipartite_ids_det(spark, sf), walk_length=3, seed=42, directed=False
        )

    def _transition_ids(spark, sf):
        # DIRECTED event-type transition graph with SQL-reproducible ids
        # (lexicographic rank) — shared by node2vec / eigenvector /
        # reciprocity / closed-triples queries
        from pyspark.sql import Window

        der = E.events_to_type_transition_edges(_events(spark, sf))
        names = (
            der.select(F.col("src_name").alias("nm"))
            .union(der.select(F.col("dst_name").alias("nm"))).distinct()
        )
        tids = names.withColumn(
            "tid", F.row_number().over(Window.orderBy("nm")).cast("long")
        )
        return (
            der.join(tids.select(F.col("nm").alias("src_name"), F.col("tid").alias("src")), "src_name")
            .join(tids.select(F.col("nm").alias("dst_name"), F.col("tid").alias("dst")), "dst_name")
            .select("src", "dst", "weight")
        )

    def q_line_graph(spark, sf):
        # igraph linegraph on the directed type-transition graph:
        # arcs become vertices, (a→b)→(b→c) becomes the edge set
        return K.line_graph(spark, _transition_ids(spark, sf))

    def q_markov_chain_stats(spark, sf):
        # entropy rate / perplexity of the event-type transition chain
        # — how predictable the behaviour sequences are
        return K.markov_chain_stats(spark, _transition_ids(spark, sf))

    def q_assortativity_numeric(spark, sf):
        # numeric-attribute assortativity: do high-value event types
        # transition to high-value event types?
        from pyspark.sql import Window

        der = E.events_to_type_transition_edges(_events(spark, sf))
        names = (
            der.select(F.col("src_name").alias("nm"))
            .union(der.select("dst_name")).distinct()
        )
        tids = names.withColumn(
            "tid", F.row_number().over(Window.orderBy("nm")).cast("long")
        )
        edges = (
            der.join(tids.select(F.col("nm").alias("src_name"), F.col("tid").alias("src")), "src_name")
            .join(tids.select(F.col("nm").alias("dst_name"), F.col("tid").alias("dst")), "dst_name")
            .select("src", "dst", "weight")
        )
        vals = (
            _events(spark, sf)
            .groupBy(F.col("event_type").alias("nm"))
            .agg(F.round(F.avg("value"), 6).alias("x"))
            .join(tids, "nm")
            .select(F.col("tid").alias("id"), "x")
        )
        return K.assortativity_numeric(spark, edges, vals)

    def q_salsa(spark, sf):
        # Lempel–Moran SALSA hubs/authorities on the directed
        # type-transition graph — degree-normalised HITS sibling
        return K.salsa(spark, _transition_ids(spark, sf)).orderBy("id")

    def q_reciprocity(spark, sf):
        return K.reciprocity(spark, _transition_ids(spark, sf))

    def q_bipartiteness(spark, sf):
        # igraph is_bipartite via the double-cover reduction: one CC run
        # on the (2|V|, 2|E|) cover decides every component at once
        return K.bipartiteness(spark, _transition_ids(spark, sf)).orderBy("component")

    def q_dyad_census(spark, sf):
        # igraph dyad_census: (mutual, asym, null) — null dyads are
        # arithmetic over C(|V|,2), never materialised
        return K.dyad_census(spark, _transition_ids(spark, sf))

    def q_power_law_fit(spark, sf):
        # igraph power_law_fit (Clauset MLE, fixed xmin=2) on the
        # bipartite degree sequence
        return K.power_law_fit(spark, _bipartite_ids_det(spark, sf), xmin=2)

    def q_ncol_roundtrip(spark, sf):
        # igraph NCOL interchange: write the bipartite edge table as an
        # edge-list text file, parse it back — the oracle recomputes the
        # same edges straight from parquet, so any loss in the text
        # round-trip (quoting, precision, dropped rows) hash-mismatches
        from leidenalg_spark.sources.edgelist import read_ncol, write_ncol

        named = _bipartite_named(spark, sf).select(
            F.col("src_name").alias("src"), F.col("dst_name").alias("dst"), "weight"
        )
        path = f"/tmp/spark_graft_ncol_{sf.replace('/', '_')}"
        write_ncol(named, path)
        return read_ncol(spark, path)

    def q_graphml_roundtrip(spark, sf):
        # igraph GraphML interchange: write → parse back; oracle recomputes
        # the same edges from parquet, so the hash certifies losslessness
        from leidenalg_spark.sources.graphml import read_graphml, write_graphml

        named = _bipartite_named(spark, sf).select(
            F.col("src_name").alias("src"), F.col("dst_name").alias("dst"), "weight"
        )
        path = f"/tmp/spark_graft_graphml_{sf.replace('/', '_')}"
        write_graphml(named, path)
        return read_graphml(spark, path)

    def q_pajek_roundtrip(spark, sf):
        # igraph Pajek .net interchange: integer-id assignment + label
        # resolution must both be lossless for the hash to match
        from leidenalg_spark.sources.pajek import read_pajek, write_pajek

        named = _bipartite_named(spark, sf).select(
            F.col("src_name").alias("src"), F.col("dst_name").alias("dst"), "weight"
        )
        path = f"/tmp/spark_graft_pajek_{sf.replace('/', '_')}"
        write_pajek(named, path)
        return read_pajek(spark, path)

    def q_gml_roundtrip(spark, sf):
        # igraph GML interchange: integer-id blocks written one per line,
        # parsed back and resolved to labels; oracle recomputes from
        # parquet so the hash certifies losslessness
        from leidenalg_spark.sources.gml import read_gml, write_gml

        named = _bipartite_named(spark, sf).select(
            F.col("src_name").alias("src"), F.col("dst_name").alias("dst"), "weight"
        )
        path = f"/tmp/spark_graft_gml_{sf.replace('/', '_')}"
        write_gml(named, path)
        return read_gml(spark, path)

    def q_lgl_roundtrip(spark, sf):
        # igraph LGL interchange: self-contained '#' adjacency blocks —
        # write is one groupBy, read splits records on lineSep='#'
        from leidenalg_spark.sources.lgl import read_lgl, write_lgl

        named = _bipartite_named(spark, sf).select(
            F.col("src_name").alias("src"), F.col("dst_name").alias("dst"), "weight"
        )
        path = f"/tmp/spark_graft_lgl_{sf.replace('/', '_')}"
        write_lgl(named, path)
        return read_lgl(spark, path)

    def q_dot_roundtrip(spark, sf):
        # Graphviz DOT interchange: quoted edge statements, one per
        # line; write is a pure projection, read a regex extraction
        from leidenalg_spark.sources.dot import read_dot, write_dot

        named = _bipartite_named(spark, sf).select(
            F.col("src_name").alias("src"), F.col("dst_name").alias("dst"), "weight"
        )
        path = f"/tmp/spark_graft_dot_{sf.replace('/', '_')}"
        write_dot(named, path)
        return read_dot(spark, path)

    def q_graph_setops(spark, sf):
        # igraph union/intersection/difference/symmetric_difference over
        # two overlapping md5-bucket halves of the bipartite graph; one
        # row per op with edge count + total weight
        from leidenalg_spark.operators import setops as SO

        named = _bipartite_named(spark, sf).select(
            F.col("src_name").alias("src"), F.col("dst_name").alias("dst"), "weight"
        )
        bkt = (
            F.conv(F.substring(F.md5(F.concat_ws("|", "src", "dst")), 1, 8), 16, 10)
            .cast("bigint") % 4
        )
        keyed = named.withColumn("bkt", bkt)
        a = keyed.where(F.col("bkt").isin(0, 1, 2)).drop("bkt")
        b = keyed.where(F.col("bkt").isin(2, 3)).drop("bkt")

        def summ(op, df):
            return df.agg(
                F.lit(op).alias("op"),
                F.count(F.lit(1)).cast("long").alias("n_edges"),
                F.round(F.sum("weight"), 6).alias("total_weight"),
            )

        return (
            summ("difference", SO.graph_difference(a, b))
            .unionByName(summ("intersection", SO.graph_intersection(a, b)))
            .unionByName(summ("symdiff", SO.graph_symmetric_difference(a, b)))
            .unionByName(summ("union", SO.graph_union(a, b)))
            .orderBy("op")
        )

    def q_tree_graph(spark, sf):
        # igraph Graph.Tree: parent = (i-1)//children, zero shuffles
        from leidenalg_spark.sources.generators import tree

        return tree(spark, n=64, children=3).orderBy("dst")

    def q_modularity_null(spark, sf):
        # modularity significance vs 3 degree-preserving md5 rewires of
        # the G(64,200) graph, md5-bucket membership (4 communities)
        from leidenalg_spark.operators.community import modularity_null_test
        from leidenalg_spark.sources import generators as G

        base = G.erdos_renyi_gnm(spark, 64, 200, seed=7).select("src", "dst")
        verts = (
            base.select(F.col("src").alias("id"))
            .unionByName(base.select(F.col("dst").alias("id")))
            .distinct()
        )
        comm = (
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
            .cast("bigint") % 4
        )
        memb = verts.select("id", comm.alias("comm"))
        return modularity_null_test(spark, base, memb, seeds=(1, 2, 3))

    def q_watts_strogatz(spark, sf):
        # igraph Watts_Strogatz small-world generator: index-derived ring
        # lattice + md5-coin rewiring, zero shuffles (rmat convention)
        from leidenalg_spark.sources.generators import watts_strogatz

        return watts_strogatz(spark, n=100, k=3, p=0.2, seed=11).orderBy("src", "o")

    def q_rmat_graph(spark, sf):
        # Graph500 R-MAT generator: every edge derived from its index via
        # md5 quadrant draws — zero-shuffle, index-deterministic, so the
        # DuckDB twin replays the identical recursion
        from leidenalg_spark.sources.generators import rmat

        return rmat(spark, scale=7, m=1000, seed=42).orderBy("i")

    def q_graph_generators(spark, sf):
        # igraph constructor surface: ring/star/lattice/G(n,m), tagged
        from leidenalg_spark.sources import generators as G

        tag = lambda kind, df: df.select(
            F.lit(kind).alias("kind"),
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        return (
            tag("ring", G.ring(spark, 50))
            .unionByName(tag("star", G.star(spark, 33)))
            .unionByName(tag("lattice", G.lattice(spark, 6, 9)))
            .unionByName(tag("gnm", G.erdos_renyi_gnm(spark, 64, 200, seed=7)))
        )

    def q_configuration_model(spark, sf):
        # igraph Degree_Sequence(..., 'configuration') / rewire(): the
        # degree-preserving null model; md5-keyed stub ranking makes the
        # uniform re-pairing replayable in SQL
        from leidenalg_spark.sources import generators as G

        base = G.erdos_renyi_gnm(spark, 64, 200, seed=7).select("src", "dst")
        return G.configuration_model(base, seed=11).orderBy("pair_id")

    def q_avg_neighbor_degree(spark, sf):
        # igraph knn: degree-correlation diagnostic per vertex
        return K.avg_neighbor_degree(spark, _bipartite_ids_det(spark, sf))

    def q_knnk(spark, sf):
        # igraph knn()'s knnk curve: mean neighbour degree per degree value
        return K.knnk(spark, _bipartite_ids_det(spark, sf)).orderBy("degree")

    def q_degree_gini(spark, sf):
        # attention inequality: exact Gini from the grouped degree histogram
        return K.degree_gini(spark, _bipartite_ids_det(spark, sf))

    def q_vertex_diversity(spark, sf):
        # igraph diversity: normalised entropy of incident tie weights
        return K.vertex_diversity(spark, _bipartite_ids_det(spark, sf))

    def q_burt_constraint(spark, sf):
        # Burt's structural-hole constraint (brokerage metric)
        return K.burt_constraint(spark, _bipartite_ids_det(spark, sf))

    def q_bib_coupling(spark, sf):
        # bibliographic coupling of users on the directed user→type
        # graph: n_common = shared event types per user pair
        return K.cocitation(spark, _bipartite_ids_det(spark, sf), mode="coupling")

    def q_butterfly_census(spark, sf):
        # bipartite rectangle (2x2-biclique) census on the user→type
        # graph — left-centered wedge join, the ParButterfly side-choice
        return K.butterfly_census(spark, _bipartite_ids_det(spark, sf))

    def q_kmeans_outliers(spark, sf):
        # per-cell z-scored centroid distances over the deterministic
        # Lloyd run — embedding-space data-cleaning signal
        return S.kmeans_outliers(spark, _embeddings(spark, sf), k=4, iters=2)

    def q_triad_census(spark, sf):
        # Holland–Leinhardt 16-class census on the MIXED directed graph
        # (user→type interaction arcs ∪ type→type transition arcs — the
        # transition layer contributes mutual dyads, so the
        # direction-sensitive classes are all exercised)
        from pyspark.sql import Window

        bip = _bipartite_named(spark, sf).select("src_name", "dst_name")
        der = E.events_to_type_transition_edges(_events(spark, sf)).select(
            F.concat(F.lit("t:"), "src_name").alias("src_name"),
            F.concat(F.lit("t:"), "dst_name").alias("dst_name"),
        )
        un = bip.unionByName(der)
        names = (
            un.select(F.col("src_name").alias("nm"))
            .union(un.select("dst_name"))
            .distinct()
        )
        ids = names.withColumn(
            "nid", F.row_number().over(Window.orderBy("nm")).cast("long")
        )
        g = (
            un.join(ids.select(F.col("nm").alias("src_name"), F.col("nid").alias("src")), "src_name")
            .join(ids.select(F.col("nm").alias("dst_name"), F.col("nid").alias("dst")), "dst_name")
            .select("src", "dst")
        )
        return K.triad_census(spark, g)

    def q_negative_samples(spark, sf):
        # link-prediction training negatives on the SPARSE directed
        # user->type graph (the complete transition graph would reject
        # every draw)
        return K.negative_samples(spark, _bipartite_ids_det(spark, sf), k=3, seed=7)

    def q_closed_triples(spark, sf):
        return K.closed_triples(spark, _transition_ids(spark, sf))

    def q_k_truss(spark, sf):
        # fixed 4 peel rounds (oracle comparability, like k_core)
        return K.k_truss(spark, _transition_ids(spark, sf), k=5, rounds=4)

    def q_mis(spark, sf):
        # Luby MIS, 3 fixed rounds, md5 priorities (seed 42)
        return K.maximal_independent_set(
            spark, _bipartite_ids_det(spark, sf), seed=42, rounds=3
        )

    def q_densest_subgraph(spark, sf):
        # Bahmani batched peel, 4 fixed rounds, on the bipartite graph
        return K.densest_subgraph(spark, _bipartite_ids_det(spark, sf), rounds=4)

    def q_closeness(spark, sf):
        # truncated Wasserman–Faust closeness (exact ≤2-ball, like harmonic)
        return K.closeness_centrality(spark, _bipartite_ids_det(spark, sf), max_dist=2)

    def q_betweenness(spark, sf):
        # bounded-distance Brandes, exact over all sources at this scale
        return K.betweenness_centrality(spark, _bipartite_ids_det(spark, sf), max_dist=2)

    def q_edge_betweenness(spark, sf):
        # Girvan–Newman edge centrality, bounded-distance Brandes, exact
        # over all sources at this scale (same protocol as q_betweenness)
        return K.edge_betweenness(spark, _bipartite_ids_det(spark, sf), max_dist=2)

    def q_maximal_matching(spark, sf):
        # Israeli–Itai local-min matching on the G(n,m) generator graph
        # (sf-independent, like rmat_graph); converges in 4 rounds — the
        # oracle unrolls 5, the extra round provably matches nothing
        from leidenalg_spark.sources import generators as G

        base = G.erdos_renyi_gnm(spark, 64, 200, seed=7).select("src", "dst")
        return K.maximal_matching(spark, base, seed=42)

    def q_balance_census(spark, sf):
        # Heider structural-balance triangle census over the transition
        # graph with deterministic md5 edge signs (the signed-layer
        # diagnostic; signed Leiden splits these layers)
        e = _transition_ids(spark, sf)
        sgn = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "-", F.lit("sg"),
                            F.col("src").cast("string"), F.col("dst").cast("string"),
                        )
                    ),
                    1, 8,
                ),
                16, 10,
            ).cast("bigint") % 2
        ) * 2 - 1
        return K.balance_census(
            spark, e.select("src", "dst", sgn.cast("double").alias("weight"))
        )

    def q_edge_clustering(spark, sf):
        # Radicchi edge clustering coefficient on the transition graph —
        # low values flag inter-community bridges
        return K.edge_clustering(spark, _transition_ids(spark, sf)).orderBy("a", "b")

    def q_molloy_reed(spark, sf):
        # Molloy–Reed giant-component criterion + percolation threshold
        return K.molloy_reed(spark, _bipartite_ids_det(spark, sf))

    def q_core_periphery(spark, sf):
        # Borgatti–Everett discrete core–periphery fit, core = top
        # quarter by degree (ties → smaller id): the phi correlation
        # collapses to four scalars, nothing pairwise materialises
        e = _bipartite_ids_det(spark, sf)
        sym = e.select("src", "dst").unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        deg = sym.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
        n = deg.count()
        core = deg.orderBy(F.col("deg").desc(), "id").limit(n // 4).select("id")
        return K.core_periphery_fit(spark, e, core)

    def q_voronoi(spark, sf):
        # igraph voronoi(): nearest-seed multi-source BFS, 4 md5-elected
        # seeds (same deterministic pivot idiom as sampled betweenness)
        e = _bipartite_ids_det(spark, sf)
        verts = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        pr = F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit("42"), F.col("id").cast("string"))), 1, 8),
            16, 10,
        ).cast("long")
        seeds = verts.withColumn("_p", pr).orderBy("_p", "id").limit(4).select("id")
        return K.voronoi_cells(spark, e, seeds, max_dist=3)

    def q_clique_census(spark, sf):
        # bounded igraph cliques()/motifs slice on the scale-free R-MAT
        # graph: edges / triangles / K4, each counted once (a<b<c<d)
        from leidenalg_spark.sources.generators import rmat

        base = rmat(spark, scale=7, m=1000, seed=42).select("src", "dst")
        return K.clique_census(spark, base)

    def q_lifecycle(spark, sf):
        # growth accounting: new/retained/resurrected/churned per week
        from leidenalg_spark.operators.events import lifecycle_accounting

        return lifecycle_accounting(_events(spark, sf)).orderBy("bucket", "state")

    def q_json_field_stats(spark, sf):
        # JSON payload schema discovery: per-type stats of props.$.k
        from leidenalg_spark.operators.events import json_field_stats

        return json_field_stats(_events(spark, sf)).orderBy("event_type")

    def q_ltv_cohorts(spark, sf):
        # cohort LTV triangle: running cumulative value per first-seen
        # week cohort — the revenue sibling of retention_cohorts
        from leidenalg_spark.operators.events import ltv_cohorts

        return ltv_cohorts(_events(spark, sf)).orderBy("cohort_start", "offset")

    def q_rfm_scores(spark, sf):
        # recency/frequency/monetary actor segmentation — histogram
        # quantile scores, no global per-row window
        from leidenalg_spark.operators.events import rfm_scores

        return rfm_scores(_events(spark, sf)).orderBy("user_id")

    def q_periodicity(spark, sf):
        # daily-rhythm detection: lag-24 autocorrelation of the
        # zero-densified hourly count series, per event type
        from leidenalg_spark.operators.events import periodicity

        return periodicity(_events(spark, sf), lag=24).orderBy("event_type")

    def q_burstiness(spark, sf):
        # Goh–Barabási per-user burstiness of inter-event gaps
        from leidenalg_spark.operators.events import burstiness

        return burstiness(_events(spark, sf)).orderBy("user_id")

    def q_edge_drift(spark, sf):
        # slice-to-slice edge-set churn of the daily (user, event_type)
        # link graph — the structural companion of community_drift
        ev = _events(spark, sf)
        sliced = ev.select(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            .cast("long").alias("slice"),
            F.col("user_id").alias("src"),
            F.col("event_type").alias("dst"),
        )
        return E.edge_set_drift(sliced).orderBy("slice")

    def q_attack_curve(spark, sf):
        # Albert–Jeong–Barabási targeted-attack robustness on the
        # scale-free R-MAT graph (the classic demonstration input — the
        # bipartite graph collapses after its handful of type hubs):
        # hub removal at 0/5/10% with LCC + fragmentation per step
        from leidenalg_spark.sources.generators import rmat

        base = rmat(spark, scale=7, m=1000, seed=42).select("src", "dst")
        return K.attack_curve(spark, base, fractions=(0.0, 0.05, 0.1))

    def q_failure_curve(spark, sf):
        # the AJB contrast case: md5-random removal barely fragments the
        # same scale-free graph that targeted attack shatters
        from leidenalg_spark.sources.generators import rmat

        base = rmat(spark, scale=7, m=1000, seed=42).select("src", "dst")
        return K.attack_curve(
            spark, base, fractions=(0.0, 0.05, 0.1), strategy="random", seed=42
        )

    def q_sssp_weighted(spark, sf):
        # igraph distances(weights=...): Bellman–Ford relaxation from
        # vertex 0; converges in 4 rounds here, oracle unrolls 8 (extra
        # rounds provably change nothing at a fixpoint)
        return K.sssp_weighted(spark, _bipartite_ids_det(spark, sf), 0)

    def q_eccentricity(spark, sf):
        # igraph eccentricity/radius: truncated at 2 rings (same bounded
        # protocol as harmonic/closeness); radius/diameter bounds are
        # 1-row aggregates over this output
        return K.eccentricity(spark, _bipartite_ids_det(spark, sf), max_dist=2)

    def q_truss_layers(spark, sf):
        # truss decomposition peel waves on the type-transition graph
        return K.truss_layers(spark, _transition_ids(spark, sf), rounds=5).orderBy(
            "a", "b"
        )

    def q_s_core(spark, sf):
        # weighted s-core peel waves (strength thresholds) — heavy-tie
        # cores survive where raw degree would not
        return K.s_core(spark, _bipartite_ids_det(spark, sf), rounds=6).orderBy("id")

    def q_onion_layers(spark, sf):
        # onion decomposition: peel-wave refinement of the k-cores
        # (6 waves — same truncation protocol as coreness/k_core)
        return K.onion_layers(spark, _bipartite_ids_det(spark, sf), rounds=6).orderBy("id")

    def q_graph_sparsify(spark, sf):
        # unbiased degree-proportional edge sparsifier with the
        # md5 coin — hub-hub bulk thins, bridges survive at p=1
        return K.graph_sparsify(spark, _bipartite_ids_det(spark, sf), c=2.0).orderBy(
            "src", "dst"
        )

    def q_graph_center(spark, sf):
        # igraph radius()/center: argmin-eccentricity vertices under the
        # same 2-ring truncation as the eccentricity query
        return K.graph_center(spark, _bipartite_ids_det(spark, sf), max_dist=2).orderBy("id")

    def q_vocab_coverage(spark, sf):
        # tokenizer-design curve: share of all token occurrences covered
        # by the top-200 vocabulary types
        return T.vocab_coverage(_documents(spark, sf), k=200)

    def q_vocab_growth(spark, sf):
        # Heaps-law curve: token total + distinct types at 8 doc-quantile
        # prefixes, one aggregate over the exploded token table
        return T.vocab_growth(_documents(spark, sf), n_points=8).orderBy("point")

    def q_zipf_fit(spark, sf):
        # Zipf exponent of the token-frequency distribution (CSN MLE,
        # same estimator as power_law_fit, text side)
        return T.zipf_fit(_documents(spark, sf), xmin=2)

    def q_filter_funnel(spark, sf):
        # C4-style curation funnel: survivors after length, quality, and
        # exact-dedup gates — one combinable aggregate, no second scan
        return T.filter_funnel(
            _documents(spark, sf), min_chars=50, max_chars=100_000, min_quality=0.5
        ).orderBy("stage_idx")

    def q_cross_source_dupes(spark, sf):
        # who-copies-from-whom: distinct texts shared by source pairs
        from leidenalg_spark.operators.dedup import cross_source_dupes

        return cross_source_dupes(_documents(spark, sf)).orderBy("source_a", "source_b")

    def q_leading_eigenvector(spark, sf):
        # Newman leading-eigenvector bisection (igraph
        # community_leading_eigenvector, one level): shifted power
        # iteration on the modularity matrix, rank-1 term never
        # materialised; 9dp barrier rounding pins both engines
        from leidenalg_spark.operators.community import leading_eigenvector_split

        return leading_eigenvector_split(
            spark, _bipartite_ids_det(spark, sf), max_iter=24, norm_every=8
        ).orderBy("id")

    def q_topological_levels(spark, sf):
        # igraph topological_sorting/is_dag: the small→large orientation
        # of the bipartite graph is a DAG by construction; level = Kahn
        # peel round = longest-path depth (oracle: recursive CTE)
        e = _bipartite_ids_det(spark, sf).select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        return K.topological_levels(spark, e)

    def q_graph_coloring(spark, sf):
        # Jones–Plassmann, 3 fixed rounds, md5 priorities (seed 42)
        return K.greedy_coloring(spark, _bipartite_ids_det(spark, sf), seed=42, rounds=3)

    def q_eigenvector(spark, sf):
        # eigenvector centrality on the SYMMETRISED event-type transition
        # graph — self-loops make it aperiodic, so the power iteration
        # genuinely converges (a bipartite graph would oscillate)
        return K.eigenvector_centrality(
            spark, _transition_ids(spark, sf), max_iter=8, directed=False
        )

    def q_hits(spark, sf):
        # hubs & authorities on the DIRECTED user->event-type graph
        # (users are pure hubs, types pure authorities); 6 fixed
        # iterations, unrolled-CTE twin reproduces the power iteration
        return K.hits(spark, _bipartite_ids_det(spark, sf), max_iter=6)

    def q_node2vec(spark, sf):
        # second-order (p,q)-biased walks on the DIRECTED event-type
        # transition graph — dense with triangles and self-loops, so the
        # return / triangle / exploration branches all fire; tids are
        # lexicographic ranks, reproducible in SQL (seed 42, p=4, q=1/4)
        return K.node2vec_walks(
            spark, _transition_ids(spark, sf), walk_length=3, p=4.0, q=0.25,
            seed=42, directed=True,
        )

    def _cyclic_ids(spark, sf):
        # deterministic DIRECTED graph with real cycles: user→tool edges
        # from even event_ids; tool→user return edges from odd event_ids
        # for every 5th user — the rest stay source-singleton SCCs
        from pyspark.sql import Window

        ev = _events(spark, sf)
        tids = (
            ev.select("event_type").distinct()
            .withColumn("tid", 2 * F.row_number().over(Window.orderBy("event_type")) + 1)
        )
        ev = ev.join(tids, "event_type")
        uid = (2 * F.col("user_id")).cast("long")
        fwd = ev.where(F.col("event_id") % 2 == 0).select(
            uid.alias("src"), F.col("tid").cast("long").alias("dst")
        )
        bwd = ev.where((F.col("event_id") % 2 == 1) & (F.col("user_id") % 5 == 0)).select(
            F.col("tid").cast("long").alias("src"), uid.alias("dst")
        )
        return fwd.unionByName(bwd).distinct().withColumn("weight", F.lit(1.0))

    def q_scc(spark, sf):
        scc = K.strongly_connected_components(spark, _cyclic_ids(spark, sf))
        return scc.groupBy("component").agg(F.count(F.lit(1)).alias("size"))

    def q_bowtie(spark, sf):
        # Broder web-graph bow-tie: giant SCC core + IN/OUT periphery
        # on the same deterministic cyclic graph as the SCC query
        return K.bowtie_decomposition(spark, _cyclic_ids(spark, sf)).orderBy("id")

    def q_simhash(spark, sf):
        return D.simhash(_documents(spark, sf))

    def q_knn_graph(spark, sf):
        # embeddings → undirected weighted k-NN edge table (LSH-bucketed
        # candidates; feeds leiden/LPA for semantic clustering)
        return S.knn_graph(spark, _embeddings(spark, sf), k=3, n_planes=5, dim=64)

    def q_lsh_topk(spark, sf):
        emb = _embeddings(spark, sf)
        return S.lsh_cosine_topk(emb, emb.where(F.col("vec_id") < 8), k=5, n_planes=8).select(
            "query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank")
        )

    def q_ivf_topk(spark, sf):
        # IVF ANN: coarse codebook from the SHARED deterministic Lloyd
        # fit (md5-priority init, 6dp-rounded syncs) instead of the
        # xxhash64-sampled numpy trainer, so the DuckDB twin replays
        # training, probe ranking and rescoring exactly
        from leidenalg_spark.operators.similarity import _kmeans_fit

        emb = _embeddings(spark, sf)
        base, _s, _a, cents = _kmeans_fit(spark, emb, 8, 2, 42, "vec_id", "embedding")
        base.unpersist()
        return S.ivf_topk(
            emb, emb.where(F.col("vec_id") < 8), k=5, n_cells=8, n_probe=2,
            seed=42, centroids=cents,
        ).select(
            "query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank")
        )

    def q_media_features(spark, sf):
        # Arrow-batched mapInPandas feature extraction; document bytes
        # stand in for opaque payloads so the DuckDB twin can recompute
        # n_bytes/checksum from the same utf-8 blobs (the deterministic
        # moment features stay pytest-held — SQL has no float32 numpy)
        from leidenalg_spark.operators.multimodal import extract_features

        return extract_features(_media_docs(spark, sf)).select(
            "media_id", "media_type", "n_bytes", "checksum"
        )

    def q_media_neardup(spark, sf):
        # codec-free binary NEAR-dup (byte-shingle MinHash) on document
        # bytes standing in for opaque payloads — DuckDB rebuilds the
        # identical hex windows, md5 minhash family and band keys
        from leidenalg_spark.operators.multimodal import media_neardup_pairs

        return media_neardup_pairs(_media_docs(spark, sf), threshold=0.5).orderBy("a", "b")

    def q_media_dedup(spark, sf):
        # codec-free binary dedup on the opaque payload column; document
        # bytes stand in for opaque payloads (the q_media_neardup
        # convention) so the DuckDB twin can md5 the same utf-8 blobs
        from leidenalg_spark.operators.multimodal import media_dedup

        return media_dedup(_media_docs(spark, sf))

    def q_embedding_neardup(spark, sf):
        # LSH-routed candidates + exact-cosine verify (the 100-TB path);
        # the oracle twins the exact same hyperplane buckets in SQL
        return S.embedding_neardup_pairs(
            _embeddings(spark, sf), threshold=0.35, n_planes=8, n_bands=4, seed=42, dim=64
        )

    def q_temporal_communities(spark, sf):
        # O15 façade: events split into 3 time slices → per-slice bipartite
        # graphs coupled on shared vertices → one aligned membership;
        # iterative (rows-only check).  Deterministic integer vertex ids.
        from leidenalg_spark.operators.multiplex import find_partition_temporal_df

        ev = _events(spark, sf)
        lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
        span = hi - lo
        b1, b2 = lo + span / 3, lo + 2 * span / 3
        tertile = (
            F.when(F.col("ts") < F.lit(b1), 0)
            .when(F.col("ts") < F.lit(b2), 1)
            .otherwise(2)
            .cast("int")
        )
        from pyspark.sql import Window

        named = ev.withColumn("slice", tertile).groupBy(
            "slice", "user_id", "event_type"
        ).agg(F.count(F.lit(1)).cast("double").alias("weight"))
        tids = (
            named.select("event_type").distinct()
            .withColumn("tid", 2 * F.row_number().over(Window.orderBy("event_type")) + 1)
        )
        slices = named.join(tids, "event_type").select(
            "slice",
            (2 * F.col("user_id")).alias("src"),
            F.col("tid").cast("long").alias("dst"),
            "weight",
        )
        memb, _ = find_partition_temporal_df(
            spark, slices, method="modularity", interslice_weight=2.0, seed=7,
            n_iterations=1,
        )
        return memb.groupBy("slice", "comm").agg(F.count(F.lit(1)).alias("size")) \
                   .groupBy("slice").agg(
                       F.count(F.lit(1)).alias("n_comms"), F.sum("size").alias("n_vertices")
                   )

    def q_resolution_profile(spark, sf):
        # O12: CPM resolution bisection over the interaction graph —
        # iterative multi-probe scan (rows-only check).  Each probe is a
        # full leiden() run; bisect value is one join-aggregate.
        from leidenalg_spark.plans.profile import resolution_profile_df

        e = _bipartite_ids(spark, sf)
        w_tot = e.agg(F.sum("weight")).first()[0]
        pts = resolution_profile_df(
            spark, e, method="cpm", resolution_range=(0.05, 1.0),
            min_diff_bisect_value=max(1.0, 0.05 * w_tot),
            min_diff_resolution=0.05, seed=42, number_iterations=1,
        )
        return spark.createDataFrame(
            [(round(p.gamma, 6), p.n_comms, round(p.bisect_value, 6), round(p.quality, 6))
             for p in pts],
            "gamma double, n_comms long, bisect_value double, quality double",
        )

    def q_sessionize(spark, sf):
        from leidenalg_spark.operators.sessions import sessionize

        return sessionize(
            _events(spark, sf), key="user_id", ts_col="ts", gap_s=7200.0,
            tiebreak="event_id",
        )

    def q_asof_attribution(spark, sf):
        # temporal attribution: every purchase joined to the user's
        # latest click at-or-before it (Spark has no ASOF JOIN; this is
        # the union-and-carry-forward single-shuffle plan)
        from leidenalg_spark.operators.events import asof_join

        ev = _events(spark, sf)
        clicks = (
            ev.where(F.col("event_type") == "click")
            .groupBy("user_id", "ts")
            .agg(F.max("event_id").alias("click_event_id"))
        )
        purchases = ev.where(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id", F.round("value", 6).alias("value")
        )
        joined = asof_join(
            purchases, clicks, key="user_id", left_ts="ts", right_ts="ts",
            right_cols=("click_event_id",),
        )
        # no-match rows carry NULLs; emit the right ts as epoch seconds
        # with a -1 sentinel so the compare is NULL- and tz-free
        return joined.select(
            "user_id", "ts", "event_id", "value",
            F.coalesce(
                F.round(F.unix_micros(F.col("ts_r").cast("timestamp")) / 1e6, 6),
                F.lit(-1.0),
            ).alias("ts_r_s"),
            F.coalesce("click_event_id_r", F.lit(-1).cast("long")).alias("click_event_id_r"),
        )

    def q_value_profile(spark, sf):
        from leidenalg_spark.operators.events import value_profile

        return value_profile(_events(spark, sf), group="event_type", value="value")

    def q_event_windows(spark, sf):
        from leidenalg_spark.operators.events import event_windows

        return event_windows(_events(spark, sf), width="1 hour")

    def q_event_windows_sliding(spark, sf):
        # hopping windows: width 2h, slide 1h — each event lands in
        # exactly two overlapping buckets
        from leidenalg_spark.operators.events import event_windows

        return event_windows(
            _events(spark, sf), width="2 hours", slide="1 hour"
        )

    def q_association_rules(spark, sf):
        # market-basket rules over 2h-gap sessions of the events stream
        from leidenalg_spark.operators.sessions import association_rules

        return association_rules(
            _events(spark, sf), gap_s=7200.0, tiebreak="event_id"
        )

    def q_retention(spark, sf):
        # weekly retention cohorts keyed by first-seen week
        from leidenalg_spark.operators.events import retention_cohorts

        return retention_cohorts(_events(spark, sf))

    def q_trending(spark, sf):
        # top-2 event types per hour (batch twin of streaming.trending)
        from leidenalg_spark.operators.events import trending_topk

        return trending_topk(_events(spark, sf), width="1 hour", k=2)

    def q_funnel(spark, sf):
        # ordered view -> click -> purchase completion, strictly-after,
        # first-match-wins per user, whole funnel bounded to 1 day from
        # the first view (discriminating counts at sf0.01: 150/60/14)
        from leidenalg_spark.operators.events import funnel

        return funnel(
            _events(spark, sf), ["view", "click", "purchase"], horizon_s=86400
        )

    def q_jaccard_linkpred(spark, sf):
        return K.jaccard_coefficient(spark, _bipartite_ids_det(spark, sf), min_common=2)

    def q_dice_similarity(spark, sf):
        # igraph similarity_dice over the same wedge enumeration
        return K.dice_coefficient(spark, _bipartite_ids_det(spark, sf), min_common=2)

    def q_community_stats(spark, sf):
        # per-community conductance/density/cut over the bipartite graph
        # with the same deterministic membership the quality oracles use
        from leidenalg_spark.operators.community import community_stats

        named = _bipartite_named(spark, sf)
        e = named.select(
            F.col("src_name").alias("src"), F.col("dst_name").alias("dst"), "weight"
        )
        verts = e.select(F.col("src").alias("name")).union(
            e.select(F.col("dst").alias("name"))
        ).distinct()
        comm = F.when(
            F.col("name").startswith("u:"), F.expr("CAST(substr(name, 3) AS BIGINT) % 8")
        ).otherwise(F.length("name") % 8)
        m = verts.select(F.col("name").alias("id"), comm.cast("long").alias("comm"))
        return community_stats(e, m)

    def q_kmeans(spark, sf):
        # full-table Lloyd k-means, 2 rounds, md5-priority init (seed 42)
        return S.kmeans_embeddings(spark, _embeddings(spark, sf), k=4, iters=2)

    def q_adoption_curve(spark, sf):
        # contagion exposure curve for 'purchase' over the co-user graph
        from leidenalg_spark.operators.events import adoption_curve

        return adoption_curve(_events(spark, sf), "purchase", min_weight=3)

    def q_markov_absorption(spark, sf):
        # conversion probability from each state; the DuckDB twin
        # replaces the driver-side numpy solve with a recursive-CTE
        # fixpoint b <- R + Q*b on the same catalog-sized chain
        from leidenalg_spark.operators.events import markov_absorption

        return markov_absorption(_events(spark, sf), ["purchase"])

    def q_embedding_curation(spark, sf):
        # composed vector-curation funnel (dedup ∧ label-noise ∧ outlier)
        return S.embedding_curation(
            spark, _embeddings(spark, sf), k=4, iters=2,
            dedup_threshold=0.8, knn_k=10,
        )

    def q_sbm_graph(spark, sf):
        # deterministic planted-partition generator: per-block-pair edge
        # census (the md5 draw is SQL-reproducible, so the oracle
        # regenerates the identical graph)
        from leidenalg_spark.sources.generators import sbm_graph

        return (
            sbm_graph(spark, 200, n_blocks=4, p_in=0.3, p_out=0.02, seed=7)
            .groupBy("block_src", "block_dst")
            .agg(F.count(F.lit(1)).alias("n_edges"))
        )

    def q_mixing_parameter(spark, sf):
        # per-vertex LFR mixing parameter over the det membership
        from leidenalg_spark.operators.community import mixing_parameter

        return mixing_parameter(
            _bipartite_ids(spark, sf), _bipartite_membership(spark, sf)
        ).select("comm", "strength", "w_external", "mu")

    def q_session_entries_exits(spark, sf):
        # landing/exit/bounce census over 2h-gap sessions
        from leidenalg_spark.operators.sessions import session_entries_exits

        return session_entries_exits(
            _events(spark, sf), gap_s=7200.0, tiebreak="event_id"
        )

    def q_kmeans_elbow(spark, sf):
        # inertia sweep over the deterministic Lloyd fits
        return S.kmeans_elbow(spark, _embeddings(spark, sf), ks=(2, 4, 8)).orderBy("k")

    def q_product_quantize(spark, sf):
        # PQ codes + reconstruction error; codes concat-joined to a
        # string so the driver's pandas canonicalizer can sort/hash them
        # (array<int> is unhashable there) — oracle: _pq_oracle
        return S.product_quantize(spark, _embeddings(spark, sf), m=2, k=16).select(
            "vec_id",
            F.concat_ws("-", F.col("codes")).alias("codes"),
            "recon_err",
        )

    def q_heavy_user_share(spark, sf):
        # whale concentration: share of events from the top-p% actors
        from leidenalg_spark.operators.events import heavy_user_share

        return heavy_user_share(_events(spark, sf), pcts=(0.01, 0.05, 0.10))

    def q_table_expectations(spark, sf):
        # single-pass expectation suite over the events ingest
        from leidenalg_spark.operators.validate import table_expectations

        return table_expectations(_events(spark, sf), {
            "event_id_not_null": F.col("event_id").isNotNull(),
            "ts_not_null": F.col("ts").isNotNull(),
            "value_nonneg": F.col("value") >= 0,
            "type_nonempty": F.length("event_type") > 0,
        }).orderBy("rule")

    def q_referential_integrity(spark, sf):
        # FK audit: lineitem.l_orderkey -> orders.o_orderkey
        from leidenalg_spark.operators.validate import referential_integrity

        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        od = spark.read.parquet(f"{sf}/orders.parquet")
        return referential_integrity(li, od, "l_orderkey", "o_orderkey")

    def q_population_stability(spark, sf):
        # PSI drift between the corpus' first and second time halves
        from leidenalg_spark.operators.events import population_stability

        return population_stability(_events(spark, sf))

    def q_retrieval_ndcg(spark, sf):
        # position-weighted label-retrieval quality on the bounded block
        return S.retrieval_ndcg(spark, _embeddings(spark, sf), k=10, max_id=200)

    def q_two_edge_components(spark, sf):
        # link-failure-robust partition (oracle: brute-force bridges
        # via per-probe excluded-edge reachability + CC on the rest)
        from leidenalg_spark.operators.kernels import two_edge_components

        return two_edge_components(spark, _bipartite_ids_det(spark, sf)).orderBy("id")

    def q_decayed_edges(spark, sf):
        # recency-weighted transition edges (1-week half-life)
        return E.events_to_decayed_edges(_events(spark, sf), half_life_s=604800.0)

    def q_disparate_impact(spark, sf):
        # four-fifths-rule audit: long-doc rate per source
        from leidenalg_spark.operators.sampling import disparate_impact

        return disparate_impact(
            _documents(spark, sf), "source", F.col("n_chars") >= 300
        )

    def q_rrf_fuse(spark, sf):
        # fuse the exact full-dim ranking with the truncated-8-dim
        # shortlist (the cheap-index + exact-reranker fusion scenario)
        emb = _embeddings(spark, sf)
        qs_ = emb.where(F.col("vec_id") < 8)
        full = S.cosine_topk(emb, qs_, k=10)
        tr = lambda df: df.select("vec_id", F.slice("embedding", 1, 8).alias("embedding"))  # noqa: E731
        short = S.cosine_topk(tr(emb), tr(qs_), k=10)
        return S.rrf_fuse([full, short], topk=10)

    def q_label_separation_auc(spark, sf):
        # Mann-Whitney AUC of same- vs different-label pair cosine
        return S.label_separation_auc(spark, _embeddings(spark, sf))

    def q_nestedness(spark, sf):
        # NODF nestedness of the user x event-type interaction matrix
        from leidenalg_spark.operators.kernels import nestedness_nodf

        return nestedness_nodf(spark, _bipartite_ids_det(spark, sf))

    def q_winnowing(spark, sf):
        # MOSS winnowing partial-copy candidates (k=5, w=4)
        from leidenalg_spark.operators.dedup import winnowing_pairs

        return winnowing_pairs(_documents(spark, sf), min_shared=2)

    def q_simrank(spark, sf):
        # two-iteration structural-context similarity on the det graph
        from leidenalg_spark.operators.kernels import simrank

        return simrank(spark, _bipartite_ids_det(spark, sf))

    def q_bipartite_newman(spark, sf):
        # Newman collaboration-weighted one-mode projection (user side)
        return E.bipartite_project(
            _bipartite_ids_det(spark, sf), side="src", weighting="newman"
        )

    def q_attribution(spark, sf):
        # linear multi-touch credit for 'purchase' within a 24h window
        from leidenalg_spark.operators.events import attribution

        return attribution(_events(spark, sf), "purchase", window_s=86400.0, model="linear")

    def q_dim_truncation(spark, sf):
        # Matryoshka truncation fidelity over the det. offset-pair sample
        return S.dim_truncation_fidelity(
            spark, _embeddings(spark, sf), dims=(8, 16, 32)
        ).orderBy("dim")

    def q_session_concurrency(spark, sf):
        # interval-sweep concurrency over the same session table as
        # q_sessionize (gap 7200, event_id tiebreak)
        from leidenalg_spark.operators.sessions import session_concurrency

        return session_concurrency(
            _events(spark, sf), gap_s=7200.0, tiebreak="event_id"
        )

    def q_leadlag_correlation(spark, sf):
        # ordered type-pair lead-lag Pearson over the dense day grid
        from leidenalg_spark.operators.events import leadlag_correlation

        return leadlag_correlation(_events(spark, sf), max_lag=3)

    def q_landmark_distances(spark, sf):
        # multi-source BFS from 4 md5-priority landmarks, 3 hops
        from leidenalg_spark.operators.kernels import landmark_distances

        return landmark_distances(
            spark, _bipartite_ids_det(spark, sf), n_landmarks=4, max_dist=3
        )

    def q_interarrival_ks(spark, sf):
        # per-actor KS distance vs the matched-mean exponential
        from leidenalg_spark.operators.events import interarrival_ks

        return interarrival_ks(_events(spark, sf), min_gaps=5)

    def q_l_diversity(spark, sf):
        # attribute-disclosure audit: (event_type, day) classes vs user_id
        from leidenalg_spark.operators.sampling import l_diversity

        ev = _events(spark, sf).withColumn("day", F.date_trunc("day", "ts"))
        return l_diversity(ev, ["event_type", "day"], "user_id", l=5)

    def q_t_closeness(spark, sf):
        # distribution-disclosure audit: per-day event_type mix vs global
        from leidenalg_spark.operators.sampling import t_closeness

        ev = _events(spark, sf).withColumn("day", F.date_trunc("day", "ts"))
        return t_closeness(ev, ["day"], "event_type", t=0.2).orderBy("day")

    def q_sbm_fit(spark, sf):
        # block-model rate matrix + likelihoods for a deterministic
        # 4-block membership of the co-activity user graph
        from leidenalg_spark.operators.community import sbm_fit

        e = _couser_edges(spark, sf)
        verts = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        memb = verts.select("id", F.pmod(F.col("id"), F.lit(4)).alias("comm"))
        return sbm_fit(e, memb).orderBy("comm_a", "comm_b")

    def q_triangle_significance(spark, sf):
        # observed triangles vs exact configuration-model expectation
        from leidenalg_spark.operators.kernels import triangle_significance

        return triangle_significance(spark, _couser_edges(spark, sf))

    def q_source_minhash_overlap(spark, sf):
        # per-source KMV bottom-k sketch overlap (k=128, trigram shingles)
        from leidenalg_spark.operators.dedup import source_minhash_overlap

        return source_minhash_overlap(_documents(spark, sf), n=3, k=128)

    def q_effective_diameter(spark, sf):
        # ANF neighbourhood function + interpolated 90% effective diameter
        from leidenalg_spark.operators.kernels import effective_diameter

        return effective_diameter(spark, _bipartite_ids_det(spark, sf), q=0.9, max_dist=3)

    def q_semantic_dedup(spark, sf):
        # SemDeDup: Lloyd cells (same det. kmeans as q_kmeans) bound the
        # quadratic pair search; greedy min-id keep above cos 0.8
        return S.semantic_dedup(spark, _embeddings(spark, sf), k=4, iters=2, threshold=0.8)

    def q_knn_label_noise(spark, sf):
        # exact-kNN label-agreement noise audit on a bounded id block
        return S.knn_label_noise(_embeddings(spark, sf), k=10, max_id=200)

    def q_quantize(spark, sf):
        # symmetric int8 vector quantization, exploded code table
        return S.quantize_embeddings(_embeddings(spark, sf))

    def q_kcenter_coreset(spark, sf):
        # Gonzalez greedy k-center: maximally-spread exemplar selection
        # (diversity sampling for training-data curation)
        return S.kcenter_coreset(spark, _embeddings(spark, sf), k=6).orderBy("rnd")

    def q_centroid_classify(spark, sf):
        # Rocchio nearest-centroid confusion matrix — the label
        # separability probe over the embedding space
        return S.centroid_classify(spark, _embeddings(spark, sf)).orderBy(
            "label", "pred_label"
        )

    def q_distance_histogram(spark, sf):
        # cosine-similarity histogram over deterministic offset pairs —
        # the near-dup threshold calibration chart
        return S.distance_histogram(spark, _embeddings(spark, sf)).orderBy("bin")

    def q_random_projection(spark, sf):
        # Achlioptas JL sign projection 64→16 dims, md5-derived signs
        return S.random_projection(spark, _embeddings(spark, sf)).orderBy("id", "j")

    def _named_comm_graph(spark, sf):
        # the community_stats deterministic (edges, membership) pair on
        # string vertex names — shared by the attribute-mixing queries
        named = _bipartite_named(spark, sf)
        e = named.select(
            F.col("src_name").alias("src"), F.col("dst_name").alias("dst"), "weight"
        )
        verts = e.select(F.col("src").alias("name")).union(
            e.select(F.col("dst").alias("name"))
        ).distinct()
        comm = F.when(
            F.col("name").startswith("u:"), F.expr("CAST(substr(name, 3) AS BIGINT) % 8")
        ).otherwise(F.length("name") % 8)
        m = verts.select(F.col("name").alias("id"), comm.cast("long").alias("comm"))
        return e, m

    def q_mixing_matrix(spark, sf):
        from leidenalg_spark.operators.community import mixing_matrix

        e, m = _named_comm_graph(spark, sf)
        return mixing_matrix(e, m)

    def q_assortativity_nominal(spark, sf):
        from leidenalg_spark.operators.community import assortativity_nominal

        e, m = _named_comm_graph(spark, sf)
        return assortativity_nominal(e, m)

    def q_degree_histogram(spark, sf):
        from leidenalg_spark.operators.edges import degree_histogram

        return degree_histogram(_bipartite_ids_det(spark, sf))

    def q_graph_summary(spark, sf):
        from leidenalg_spark.operators.edges import graph_summary

        named = _bipartite_named(spark, sf)
        return graph_summary(
            named.select(
                F.col("src_name").alias("src"), F.col("dst_name").alias("dst"), "weight"
            )
        )

    def q_importance_sample(spark, sf):
        # A-Res weighted resampling: weight = chars+1, top-50 (seed 42)
        from leidenalg_spark.operators.sampling import importance_sample

        return importance_sample(
            _documents(spark, sf), n=50, weight=F.length("text") + 1, seed=42
        )

    def q_partition_quality(spark, sf):
        # igraph coverage/performance pair on the named bipartite graph
        # with the community_stats deterministic membership
        from leidenalg_spark.operators.community import partition_quality_report

        named = _bipartite_named(spark, sf)
        e = named.select(
            F.col("src_name").alias("src"), F.col("dst_name").alias("dst"), "weight"
        )
        verts = e.select(F.col("src").alias("name")).union(
            e.select(F.col("dst").alias("name"))
        ).distinct()
        comm = F.when(
            F.col("name").startswith("u:"), F.expr("CAST(substr(name, 3) AS BIGINT) % 8")
        ).otherwise(F.length("name") % 8)
        m = verts.select(F.col("name").alias("id"), comm.cast("long").alias("comm"))
        return partition_quality_report(e, m)

    def q_community_cartography(spark, sf):
        # Guimerà–Amaral roles: within-module z-score + participation
        # coefficient on the deterministic membership
        from leidenalg_spark.operators.community import community_cartography

        named = _bipartite_named(spark, sf)
        e = named.select(
            F.col("src_name").alias("src"), F.col("dst_name").alias("dst"), "weight"
        )
        verts = e.select(F.col("src").alias("name")).union(
            e.select(F.col("dst").alias("name"))
        ).distinct()
        comm = F.when(
            F.col("name").startswith("u:"), F.expr("CAST(substr(name, 3) AS BIGINT) % 8")
        ).otherwise(F.length("name") % 8)
        m = verts.select(F.col("name").alias("id"), comm.cast("long").alias("comm"))
        return community_cartography(e, m).orderBy("id")

    def q_neighbor_sample(spark, sf):
        # GraphSAGE fanout sampling from every 50th user, fanouts (3, 2)
        from leidenalg_spark.operators.sampling import neighbor_sample

        e = _bipartite_ids_det(spark, sf)
        seeds = (
            e.select("src").distinct()
            .where((F.col("src") / 2 % 50) == 0)
            .select(F.col("src").alias("id"))
        )
        return neighbor_sample(spark, e, seeds, fanouts=(3, 2), seed=42)

    def q_diameter(spark, sf):
        # double-sweep diameter lower bound, truncated at 6 rings to
        # match the unrolled oracle depth
        return K.diameter_approx(spark, _bipartite_ids_det(spark, sf), max_depth=6)

    def q_coreness(spark, sf):
        # H-index core decomposition, 3 fixed rounds (oracle comparability)
        return K.coreness(spark, _bipartite_ids_det(spark, sf), rounds=3)

    def q_wl_refinement(spark, sf):
        # 2-round Weisfeiler-Lehman color refinement on the bipartite graph
        return K.wl_refinement(spark, _bipartite_ids_det(spark, sf), rounds=2)

    def q_anomaly_windows(spark, sf):
        # hourly per-event-type counts vs their trailing-6-window z-score
        from leidenalg_spark.operators.events import anomaly_windows

        return anomaly_windows(
            _events(spark, sf), width="1 hour", baseline=6, threshold=2.0
        )

    def q_vertex_features(spark, sf):
        # joined per-vertex structural feature table on the transition
        # graph (string ids so the oracle joins exactly)
        e = E.events_to_type_transition_edges(_events(spark, sf)).select(
            F.col("src_name").alias("src"), F.col("dst_name").alias("dst"), "weight"
        )
        return K.vertex_features(spark, e).withColumnRenamed("id", "name")

    def q_corpus_profile(spark, sf):
        return T.corpus_profile(_documents(spark, sf))

    def q_community_drift(spark, sf):
        # slice-to-slice stability metrics over deterministic per-slice
        # memberships (day-mod-3 slices, comm = (id + slice) % 6) — the
        # metric machinery is what's under test; iterative memberships
        # plug into the same call (see find_partition_temporal_df)
        from pyspark.sql import Window
        from leidenalg_spark.operators.community import community_drift

        ev = _events(spark, sf)
        slc = (
            (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000))
            .cast("long") % 3
        )
        ev = ev.withColumn("slice", slc)
        tids = (
            ev.select("event_type").distinct()
            .withColumn("tid", 2 * F.row_number().over(Window.orderBy("event_type")) + 1)
        )
        sv = (
            ev.select("slice", (2 * F.col("user_id")).alias("id"))
            .unionByName(
                ev.join(tids, "event_type").select("slice", F.col("tid").cast("long").alias("id"))
            )
            .distinct()
        )
        # (id + slice) % 6 would be a pure label PERMUTATION across
        # slices (NMI trivially 1); the slice-dependent multiplier makes
        # adjacent partitions genuinely disagree
        m = sv.select(
            "slice", "id", ((F.col("id") * (F.col("slice") + 2)) % 6).alias("comm")
        )
        return community_drift(m)

    def q_bipartite_project(spark, sf):
        # user–user co-interaction graph (B·Bᵀ product weights) from the
        # named bipartite table; anchors are the event-type hub vertices
        from leidenalg_spark.operators.edges import bipartite_project

        named = _bipartite_named(spark, sf).select(
            F.col("src_name").alias("src"), F.col("dst_name").alias("dst"), "weight"
        )
        return bipartite_project(named, side="src", weighting="product")

    def q_conversation_profile(spark, sf):
        # input_hint-shaped transcripts derived deterministically from
        # events (SQL-twinnable), then the per-conversation profile
        from leidenalg_spark.operators.sessions import conversation_profile
        from leidenalg_spark.sources.transcripts import transcripts_from_events

        return conversation_profile(transcripts_from_events(_events(spark, sf)))

    def q_tool_chains(spark, sf):
        # tool-call bigram mining over the same deterministic transcripts
        from leidenalg_spark.operators.sessions import tool_chains
        from leidenalg_spark.sources.transcripts import transcripts_from_events

        return tool_chains(transcripts_from_events(_events(spark, sf)), n=2, k=20)

    def q_role_transitions(spark, sf):
        # role→role Markov matrix over the same deterministic transcripts
        from leidenalg_spark.operators.sessions import role_transitions
        from leidenalg_spark.sources.transcripts import transcripts_from_events

        return role_transitions(transcripts_from_events(_events(spark, sf)))

    def q_turn_latency(spark, sf):
        # per-role response-latency distribution (exact percentiles)
        from leidenalg_spark.operators.sessions import turn_latency
        from leidenalg_spark.sources.transcripts import transcripts_from_events

        return turn_latency(transcripts_from_events(_events(spark, sf)))

    def q_kmeans_silhouette(spark, sf):
        # per-cell simplified silhouette of the same deterministic run
        return S.kmeans_silhouette(spark, _embeddings(spark, sf), k=4, iters=2)

    def q_rich_club(spark, sf):
        return K.rich_club(spark, _bipartite_ids_det(spark, sf))

    def q_tool_retries(spark, sf):
        # consecutive same-tool run-length encoding (agent retry signal)
        from leidenalg_spark.operators.sessions import tool_retries
        from leidenalg_spark.sources.transcripts import transcripts_from_events

        return tool_retries(transcripts_from_events(_events(spark, sf)))

    def q_conversation_endings(spark, sf):
        # terminal-role breakdown (abandonment/completion shapes)
        from leidenalg_spark.operators.sessions import conversation_endings
        from leidenalg_spark.sources.transcripts import transcripts_from_events

        return conversation_endings(transcripts_from_events(_events(spark, sf)))

    def q_turn_boilerplate(spark, sf):
        # cross-conversation repeated-turn (template) detection
        from leidenalg_spark.operators.sessions import turn_boilerplate
        from leidenalg_spark.sources.transcripts import transcripts_from_events

        return turn_boilerplate(transcripts_from_events(_events(spark, sf)))

    def q_text_entropy(spark, sf):
        # per-doc token-unigram entropy / type-token diversity signals
        return T.text_entropy(_documents(spark, sf))

    def q_hashed_features(spark, sf):
        # hashing-trick sparse features, md5-bucketed (engine-portable)
        return T.hashed_features(_documents(spark, sf), n_buckets=64)

    def q_chunk_documents(spark, sf):
        # RAG-style overlapping token chunking (C=32, overlap=8)
        return T.chunk_documents(_documents(spark, sf), chunk_tokens=32, overlap=8)

    def q_lm_score(spark, sf):
        # corpus-trained add-1 unigram LM, per-doc mean token log-prob
        return T.lm_score(_documents(spark, sf))

    def q_partition_compare(spark, sf):
        # NMI/ARI/VI/split-join between two deterministic partitions of
        # the bipartite vertex set (mod-8 vs mod-5 labelings)
        from leidenalg_spark.operators.community import partition_compare

        named = _bipartite_named(spark, sf)
        verts = named.select(F.col("src_name").alias("name")).union(
            named.select(F.col("dst_name"))
        ).distinct()

        def _mod(k):
            return F.when(
                F.col("name").startswith("u:"),
                F.expr(f"CAST(substr(name, 3) AS BIGINT) % {k}"),
            ).otherwise(F.length("name") % k)

        m1 = verts.select(F.col("name").alias("id"), _mod(8).cast("long").alias("comm"))
        m2 = verts.select(F.col("name").alias("id"), _mod(5).cast("long").alias("comm"))
        return partition_compare(m1, m2)

    def q_embedding_covariance(spark, sf):
        return S.embedding_covariance(_embeddings(spark, sf))

    def q_embedding_pca(spark, sf):
        # rows-only by necessity, not omission: the test embeddings'
        # covariance spectrum is nearly flat (λ2/λ1 ≈ 0.987 at sf0.01),
        # so the top eigenvectors are ill-conditioned — ANY two engines'
        # eigensolvers return arbitrary rotations of the near-degenerate
        # subspace, and a rounded-power-iteration determinism contract
        # (the kmeans/PQ trick) would pin a deterministic but
        # non-converged rotation, making the hash check vacuous.
        # Correctness is pytest-held on well-gapped data instead
        # (test_embedding_covariance_and_pca_match_numpy, atol 5e-6 vs
        # np.linalg.eigh); the distributed stats pass underneath is the
        # hash-green embedding_covariance row.
        return S.embedding_pca(spark, _embeddings(spark, sf), k=4)

    def q_doc_clusters(spark, sf):
        # semantic clustering pipeline: LSH near-dup graph over the
        # embeddings table -> Leiden -> per-vector cluster (rows-only:
        # iterative, not SQL-expressible)
        return S.embedding_clusters(
            spark, _embeddings(spark, sf), threshold=0.85, seed=42,
        ).orderBy("vec_id").limit(200)

    def q_topic_clusters(spark, sf):
        # topic discovery pipeline: positive-PMI word-association graph
        # -> distributed Leiden -> (token, topic) with min-member-token
        # labels (rows-only: iterative, not SQL-expressible)
        from leidenalg_spark.operators.leiden import leiden

        # the pmi plan feeds leiden's input AND both halves of the name
        # table — materialise once (kernels convention) instead of
        # re-running the corpus scan + co-occurrence join ~4x
        pmi = T.pmi_cooccurrence(
            _documents(spark, sf), window=5, min_pairs=5
        ).where(F.col("pmi") > 0).localCheckpoint(eager=True)
        e = pmi.select(
            F.xxhash64("a").alias("src"), F.xxhash64("b").alias("dst"),
            F.col("pmi").alias("weight"),
        )
        res = leiden(spark, e, method="modularity", n_iterations=2, seed=42)
        names = (
            pmi.select(F.col("a").alias("token"))
            .unionByName(pmi.select(F.col("b").alias("token"))).distinct()
            .select("token", F.xxhash64("token").alias("id"))
        )
        memb = names.join(res.membership, "id").select("token", "comm")
        lbl = memb.groupBy("comm").agg(F.min("token").alias("topic"))
        return memb.join(lbl, "comm").select("token", "topic").orderBy("token")

    def q_edge_embeddedness(spark, sf):
        # histogram of per-edge common-neighbour counts on the co-activity
        # user graph; embeddedness-0 rows are the local bridges
        emb = K.edge_embeddedness(spark, _couser_edges(spark, sf))
        return (
            emb.groupBy("embeddedness")
            .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
            .orderBy("embeddedness")
        )

    def q_clique_percolation(spark, sf):
        # overlapping k=3 clique-percolation communities, 8 fixed
        # label-propagation rounds (oracle comparability, like k_core)
        return K.clique_percolation(spark, _couser_edges(spark, sf), rounds=8).orderBy(
            "id", "community"
        )

    def q_ngram_novelty(spark, sf):
        from leidenalg_spark.operators.dedup import ngram_novelty

        return ngram_novelty(_documents(spark, sf), n=3).orderBy("doc_id")

    def q_activity_heatmap(spark, sf):
        # weekday x hour load shape with corpus share per cell
        from leidenalg_spark.operators.events import activity_heatmap

        return activity_heatmap(_events(spark, sf)).orderBy("dow", "hour")

    def q_fisher_ratio(spark, sf):
        # per-dimension Fisher discriminant of the labelled embeddings
        from leidenalg_spark.operators.similarity import fisher_ratio

        return fisher_ratio(_embeddings(spark, sf)).orderBy("dim")

    def q_hhi_concentration(spark, sf):
        # Herfindahl concentration of per-label activity across actors
        from leidenalg_spark.operators.events import hhi_concentration

        return hhi_concentration(_events(spark, sf)).orderBy("event_type")

    def q_ttr_stats(spark, sf):
        # per-doc type-token ratio + hapax fraction
        return T.ttr_stats(_documents(spark, sf)).orderBy("doc_id")

    def q_wilson_error_rates(spark, sf):
        # per-actor error rate with Wilson CI; flag actors whose lower
        # bound clears the population rate
        from leidenalg_spark.operators.events import wilson_error_rates

        return wilson_error_rates(_events(spark, sf)).orderBy("user_id")

    def q_activity_correlation(spark, sf):
        # day-over-day Pearson r of per-actor activity (rank stability)
        from leidenalg_spark.operators.events import activity_correlation

        return activity_correlation(_events(spark, sf)).orderBy("day")

    def q_peak_days(spark, sf):
        # peaks vs a trailing-7-day median baseline per event type
        from leidenalg_spark.operators.events import peak_days

        return peak_days(_events(spark, sf)).orderBy("event_type", "day")

    def q_linkpred_eval(spark, sf):
        # precision@k of Adamic-Adar on the co-activity graph against a
        # deterministic md5 20% edge holdout (k = |holdout|) — the
        # standard link-prediction eval loop, fully reproducible
        e = _couser_edges(spark, sf)
        coin = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.lit("h42"),
                            F.col("src").cast("string"), F.col("dst").cast("string"),
                        )
                    ),
                    1, 8,
                ),
                16, 10,
            ).cast("double")
            / F.lit(4294967296.0)
        )
        test = e.where(coin < 0.2).select("src", "dst")
        train = e.where(coin >= 0.2)
        scores = K.adamic_adar(spark, train, min_common=1)
        k = test.count()
        top = scores.orderBy(F.desc("aa"), "src", "dst").limit(k)
        hits = top.join(test, ["src", "dst"]).count()
        return spark.createDataFrame(
            [(k, hits, round(hits / k, 6) if k else None)],
            "n_test long, n_hits long, precision double",
        )

    def q_benford_test(spark, sf):
        # Benford first-digit audit of the event value column
        from leidenalg_spark.operators.events import benford_test

        return benford_test(_events(spark, sf)).orderBy("digit")

    def q_balance_labels(spark, sf):
        # exact-count class rebalance of the embeddings by md5 rank
        from leidenalg_spark.operators.sampling import balance_labels

        return balance_labels(_embeddings(spark, sf)).orderBy("label", "rk")

    def q_hurst_variance(spark, sf):
        # variance-time self-similarity (Hurst) per event type
        from leidenalg_spark.operators.events import hurst_variance

        return hurst_variance(_events(spark, sf)).orderBy("event_type")

    def q_neardup_online(spark, sf):
        # greedy first-wins-by-id near-dup admission (batch twin of the
        # streaming gate); the DuckDB twin replays the greedy-MIS rounds
        # in a recursive CTE over the same md5 band keys
        from leidenalg_spark.operators.dedup import online_neardup_filter

        return online_neardup_filter(_documents(spark, sf)).orderBy("doc_id")

    def q_gopher_rules(spark, sf):
        # Gopher A1 per-rule quality signals + admission flag
        return T.gopher_rules(_documents(spark, sf)).orderBy("doc_id")

    def q_readability(spark, sf):
        # Flesch-Kincaid grade proxy per document
        return T.readability(_documents(spark, sf)).orderBy("doc_id")

    def q_disparity_backbone(spark, sf):
        # Serrano multiscale backbone of the weighted co-activity graph
        return K.disparity_backbone(spark, _couser_edges(spark, sf), alpha=0.3).orderBy(
            "a", "b"
        )

    def q_actor_behavior_kl(spark, sf):
        # per-actor KL(type dist || corpus dist) — bot/outlier score
        from leidenalg_spark.operators.events import actor_behavior_kl

        return actor_behavior_kl(_events(spark, sf)).orderBy("user_id")

    def q_knn_label_assortativity(spark, sf):
        # embedding-quality signal: how label-assortative is the LSH
        # k-NN graph? (composes two oracle-checked components)
        from leidenalg_spark.operators.community import assortativity_nominal

        emb = _embeddings(spark, sf)
        g = S.knn_graph(spark, emb, k=3, n_planes=5, dim=64).select("src", "dst", "weight")
        memb = emb.select(F.col("vec_id").alias("id"), F.col("label").alias("comm"))
        return assortativity_nominal(g, memb)

    def q_barrat_clustering(spark, sf):
        # weighted (Barrat) local clustering on the co-activity graph
        return K.barrat_clustering(spark, _couser_edges(spark, sf)).orderBy("id")

    def q_slo_burn(spark, sf):
        # daily error-budget burn vs a 0.2 SLO target
        from leidenalg_spark.operators.events import slo_burn

        return slo_burn(_events(spark, sf), slo=0.2).orderBy("day")

    def q_slice_layers(spark, sf):
        # T1/T2 structural check: 3 temporal slices (10-day buckets) of
        # the user×type graph → slices_to_layers_df → per-layer summary
        # (interslice layer keyed -1); vertices counted on the hashed
        # composite (slice, id) keys — cardinality-equal to the pairs
        from pyspark.sql import Window

        from leidenalg_spark.operators.multiplex import slices_to_layers_df

        ev = _events(spark, sf)
        sl = (F.datediff(F.col("ts"), F.lit("2024-01-01")) / 10).cast("int")
        names = ev.select(F.col("event_type").alias("nm")).distinct()
        tids = names.withColumn(
            "dst", -F.row_number().over(Window.orderBy("nm")).cast("long")
        )
        slices = (
            ev.select(sl.alias("slice"), F.col("user_id").alias("src"), "event_type")
            .join(tids.select(F.col("nm").alias("event_type"), "dst"), "event_type")
            .groupBy("slice", "src", "dst")
            .agg(F.count(F.lit(1)).cast("double").alias("weight"))
        )
        lay = slices_to_layers_df(slices, interslice_weight=2.0)
        key = F.coalesce(F.col("layer").cast("long"), F.lit(-1)).alias("layer_key")
        eagg = lay.groupBy(key).agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.round(F.sum("weight"), 6).alias("total_weight"),
        )
        ends = lay.select(key, F.col("src").alias("v")).unionByName(
            lay.select(key, F.col("dst").alias("v"))
        )
        vagg = ends.groupBy("layer_key").agg(
            F.countDistinct("v").cast("long").alias("n_vertices")
        )
        return eagg.join(vagg, "layer_key").orderBy("layer_key")

    def q_quality_multiplex(spark, sf):
        # Σ λ_k Q_k over two REAL layers sharing one vertex space:
        # layer 0 = user×type bipartite (modularity, λ=1), layer 1 =
        # user–user co-activity mapped onto the same even ids
        # (CPM γ=0.5, λ=0.5); deterministic id%4 membership
        from leidenalg_spark.localcore import QualitySpec
        from leidenalg_spark.operators.multiplex import quality_multiplex

        e0 = _bipartite_ids_det(spark, sf).withColumn("layer", F.lit(0))
        e1 = (
            _couser_edges(spark, sf)
            .select(
                (F.col("src") * 2).alias("src"), (F.col("dst") * 2).alias("dst"), "weight"
            )
            .withColumn("layer", F.lit(1))
        )
        edges = e0.unionByName(e1).select("layer", "src", "dst", "weight")
        verts = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        memb = verts.select("id", (F.col("id") % 4).alias("comm"))
        val = quality_multiplex(
            edges,
            memb,
            [QualitySpec("modularity"), QualitySpec("cpm", gamma=0.5)],
            layer_weights=[1.0, 0.5],
        )
        return spark.createDataFrame([(round(float(val), 6),)], "value double")

    def q_quality_moddensity(spark, sf):
        # modularity density D of the deterministic bipartite membership
        from leidenalg_spark.functions.quality import quality_modularity_density

        e = _bipartite_ids_det(spark, sf)
        verts = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        memb = verts.select("id", (F.col("id") % 4).alias("comm"))
        return quality_modularity_density(e, memb)

    def q_collective_influence(spark, sf):
        # Morone-Makse CI at radius 1 on the co-activity graph
        return K.collective_influence(spark, _couser_edges(spark, sf), radius=1).orderBy(
            "id"
        )

    def q_markov_accuracy(spark, sf):
        # top-1 Markov next-event baseline accuracy per current type
        from leidenalg_spark.operators.events import markov_accuracy

        return markov_accuracy(_events(spark, sf)).orderBy("event_type")

    def q_containment_pairs(spark, sf):
        # Broder containment (asymmetric near-dup: quotes/subsets)
        return D.containment_pairs(_documents(spark, sf), n=3, threshold=0.8).orderBy(
            "a", "b"
        )

    def q_tfidf_cosine(spark, sf):
        # sparse tf-idf cosine similarity join (vector-space IR twin of
        # the embedding cosine join)
        return D.tfidf_cosine_pairs(_documents(spark, sf), threshold=0.85).orderBy(
            "a", "b"
        )

    def q_intrinsic_dim(spark, sf):
        # two-NN intrinsic dimension of the embedding table (exact pass)
        from leidenalg_spark.operators.similarity import intrinsic_dim

        return intrinsic_dim(_embeddings(spark, sf))

    def q_bridges(spark, sf):
        # XOR cycle-space bridge detection on the deterministic fixture
        # (oracle = per-edge brute-force reachability, unrolled BFS)
        e = spark.createDataFrame(
            [(a, b, 1.0) for a, b in _BRIDGE_FIXTURE], "src long, dst long, weight double"
        )
        return K.bridges(spark, e).orderBy("a", "b")

    def q_articulation_points(spark, sf):
        # block-cut structure on the same fixture (oracle = per-vertex
        # removal + min-label flooding of G−v)
        e = spark.createDataFrame(
            [(a, b, 1.0) for a, b in _BRIDGE_FIXTURE], "src long, dst long, weight double"
        )
        return K.articulation_points(spark, e).orderBy("id")

    def q_shortest_cycles(spark, sf):
        # per-edge shortest cycle length on the fixture (min = girth 3;
        # oracle = per-probe BFS with the probe edge removed)
        e = spark.createDataFrame(
            [(a, b, 1.0) for a, b in _BRIDGE_FIXTURE], "src long, dst long, weight double"
        )
        return K.shortest_cycles(spark, e).orderBy("a", "b")

    def q_seasonal_naive_error(spark, sf):
        # lag-7 seasonal-naive forecast baseline error per event type
        from leidenalg_spark.operators.events import seasonal_naive_error

        return seasonal_naive_error(_events(spark, sf)).orderBy("event_type")

    def q_type_affinity(spark, sf):
        # actor x event-type specialization lift
        from leidenalg_spark.operators.events import type_affinity

        return type_affinity(_events(spark, sf)).orderBy("user_id", "event_type")

    def q_square_count(spark, sf):
        # global C4 census of the co-activity graph via codegree pairs
        return K.square_count(spark, _couser_edges(spark, sf))

    def q_lsh_recall(spark, sf):
        # recall@5 of the LSH ANN against the exact top-k — the eval
        # query that certifies the approximate index (both components
        # are themselves oracle-checked; this composes them)
        emb = _embeddings(spark, sf)
        qset = emb.where(F.col("vec_id") < 8)
        exact = S.cosine_topk(emb, qset, k=5).select("query_id", "neighbor_id")
        approx = S.lsh_cosine_topk(emb, qset, k=5, n_planes=8).select(
            "query_id", "neighbor_id"
        )
        hit = approx.join(exact, ["query_id", "neighbor_id"]).groupBy("query_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_hit")
        )
        per = exact.groupBy("query_id").agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
        return (
            per.join(hit, "query_id", "left")
            .na.fill({"n_hit": 0})
            .select(
                "query_id", "n_exact", "n_hit",
                F.round(F.col("n_hit") / F.col("n_exact"), 6).alias("recall"),
            )
            .orderBy("query_id")
        )

    def q_doc_source_kl(spark, sf):
        # per-doc token-distribution KL vs its source (content outliers)
        return T.doc_source_kl(_documents(spark, sf)).orderBy("doc_id")

    def q_label_centroid_sim(spark, sf):
        # pairwise cosine between per-label embedding centroids
        return S.label_centroid_sim(_embeddings(spark, sf)).orderBy("label_a", "label_b")

    def q_influence_cascade(spark, sf):
        # deterministic IC diffusion from the two smallest co-activity
        # vertices; md5 edge coins, 4 rounds (oracle comparability)
        e = _couser_edges(spark, sf)
        verts = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
            .orderBy("id")
            .limit(2)
        )
        return K.influence_cascade(spark, e, verts, p=0.3, rounds=4, seed=42).orderBy("id")

    def q_stickiness(spark, sf):
        # DAU / trailing-7-day WAU engagement ratio per day
        from leidenalg_spark.operators.events import stickiness

        return stickiness(_events(spark, sf)).orderBy("day")

    def q_merge_gain(spark, sf):
        # CNM merge matrix: modularity gain of merging each adjacent
        # community pair of the deterministic 4-community membership
        from leidenalg_spark.operators.community import community_merge_gain

        e = _bipartite_ids_det(spark, sf)
        verts = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        memb = verts.select("id", (F.col("id") % 4).alias("comm"))
        return community_merge_gain(e, memb).orderBy("comm_a", "comm_b")

    def q_centralization(spark, sf):
        # Freeman degree centralization of the co-activity graph
        return K.degree_centralization(spark, _couser_edges(spark, sf))

    def q_quality_decomposition(spark, sf):
        # per-community P4–P7 administration + additive Modularity/CPM
        # terms over the deterministic 4-community bipartite membership
        from leidenalg_spark.functions.quality import quality_decomposition

        e = _bipartite_ids_det(spark, sf)
        verts = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        memb = verts.select("id", (F.col("id") % 4).alias("comm"))
        return quality_decomposition(e, memb, gamma=0.5).orderBy("comm")

    def q_funnel_latency(spark, sf):
        # latency profile of the same view->click->purchase funnel
        from leidenalg_spark.operators.events import funnel_latency

        return funnel_latency(
            _events(spark, sf), ["view", "click", "purchase"], horizon_s=86400
        ).orderBy("step_idx")

    def q_source_length_emd(spark, sf):
        # pairwise EMD between per-source doc-length CDFs on log2 bins
        return T.source_length_emd(_documents(spark, sf)).orderBy("src_a", "src_b")

    def q_langid_confusion(spark, sf):
        # lang-id eval: confusion matrix vs the ground-truth lang column
        return T.langid_confusion(_documents(spark, sf)).orderBy("lang", "lang_pred")

    def q_embedding_drift(spark, sf):
        # per-dimension SMD drift between the vec_id-parity cohorts
        from leidenalg_spark.operators.similarity import embedding_drift

        return embedding_drift(
            _embeddings(spark, sf), split_col=(F.col("vec_id") % 2 == 1)
        ).orderBy("dim")

    def q_graphlet_orbits(spark, sf):
        # size-3 graphlet degree vector per vertex on the co-activity graph
        return K.graphlet_orbits3(spark, _couser_edges(spark, sf)).orderBy("id")

    def q_changepoint(spark, sf):
        # AMOC single changepoint per event-type daily-count series
        from leidenalg_spark.operators.events import changepoint

        return changepoint(_events(spark, sf)).orderBy("event_type")

    def q_quality_bipartite(spark, sf):
        # Barber bipartite modularity of a deterministic 4-community
        # membership over the user x event-type two-mode graph
        from leidenalg_spark.functions.quality import quality_bipartite

        e = _bipartite_ids_det(spark, sf)
        verts = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        memb = verts.select("id", (F.col("id") % 4).alias("comm"))
        typs = verts.select("id", (F.col("id") % 2).alias("type"))
        return quality_bipartite(e, memb, typs)

    def q_kaplan_meier(spark, sf):
        # Kaplan–Meier survival over per-actor activity lifetimes with
        # right-censoring at the corpus horizon
        from leidenalg_spark.operators.events import kaplan_meier

        # gap=1 day: users whose last event predates the horizon by a full
        # day count as churned — exercises both death and censor branches
        return kaplan_meier(_events(spark, sf), churn_gap_days=1).orderBy("t_days")

    def q_ab_test(spark, sf):
        # deterministic md5-parity A/B split + two-proportion z-test
        from leidenalg_spark.operators.events import ab_test

        # threshold 14 ≈ the per-actor median purchase count, so both
        # variants land mid-range and the z denominator is well-defined
        return ab_test(_events(spark, sf), min_conversions=14)

    q = {
        "edge_derivation": q_edge_derivation,
        "kaplan_meier": q_kaplan_meier,
        "ab_test": q_ab_test,
        "edge_embeddedness": q_edge_embeddedness,
        "clique_percolation": q_clique_percolation,
        "ngram_novelty": q_ngram_novelty,
        "graphlet_orbits": q_graphlet_orbits,
        "changepoint": q_changepoint,
        "quality_bipartite": q_quality_bipartite,
        "langid_confusion": q_langid_confusion,
        "embedding_drift": q_embedding_drift,
        "quality_decomposition": q_quality_decomposition,
        "funnel_latency": q_funnel_latency,
        "source_length_emd": q_source_length_emd,
        "merge_gain": q_merge_gain,
        "centralization": q_centralization,
        "influence_cascade": q_influence_cascade,
        "stickiness": q_stickiness,
        "lsh_recall": q_lsh_recall,
        "doc_source_kl": q_doc_source_kl,
        "label_centroid_sim": q_label_centroid_sim,
        "seasonal_naive_error": q_seasonal_naive_error,
        "type_affinity": q_type_affinity,
        "square_count": q_square_count,
        "bridges": q_bridges,
        "articulation_points": q_articulation_points,
        "shortest_cycles": q_shortest_cycles,
        "containment_pairs": q_containment_pairs,
        "tfidf_cosine": q_tfidf_cosine,
        "intrinsic_dim": q_intrinsic_dim,
        "quality_multiplex": q_quality_multiplex,
        "slice_layers": q_slice_layers,
        "barrat_clustering": q_barrat_clustering,
        "slo_burn": q_slo_burn,
        "knn_label_assortativity": q_knn_label_assortativity,
        "disparity_backbone": q_disparity_backbone,
        "actor_behavior_kl": q_actor_behavior_kl,
        "hurst_variance": q_hurst_variance,
        "readability": q_readability,
        "gopher_rules": q_gopher_rules,
        "neardup_online": q_neardup_online,
        "benford_test": q_benford_test,
        "balance_labels": q_balance_labels,
        "linkpred_eval": q_linkpred_eval,
        "activity_correlation": q_activity_correlation,
        "peak_days": q_peak_days,
        "ttr_stats": q_ttr_stats,
        "wilson_error_rates": q_wilson_error_rates,
        "fisher_ratio": q_fisher_ratio,
        "hhi_concentration": q_hhi_concentration,
        "activity_heatmap": q_activity_heatmap,
        "quality_moddensity": q_quality_moddensity,
        "collective_influence": q_collective_influence,
        "markov_accuracy": q_markov_accuracy,
        "topic_clusters": q_topic_clusters,
        "sessionize": q_sessionize,
        "doc_clusters": q_doc_clusters,
        "bipartite_edges": q_bipartite_edges,
        "degrees": q_degrees,
        "triangle_count": q_triangles,
        "clustering_coefficient": q_clustering,
        "avg_local_cc": q_avg_local_cc,
        "assortativity": q_assortativity,
        "k_core": q_k_core,
        "community_conductance": q_community_conductance,
        "edge_lift": q_edge_lift,
        "quality_modularity": quality_query("modularity"),
        "quality_cpm": quality_query("cpm", gamma=0.5),
        "quality_rber": quality_query("rber", gamma=0.5),
        "quality_rbconfiguration": quality_query("rbconfiguration", gamma=0.5),
        "quality_significance": quality_query("significance"),
        "quality_surprise": quality_query("surprise"),
        "token_count": q_token_count,
        "clean_text": q_clean_text,
        "top_bigrams": q_top_bigrams,
        "bm25": q_bm25,
        "pii_mask": q_pii_mask,
        "tfidf_terms": q_tfidf_terms,
        "mixture_sample": q_mixture_sample,
        "khop_counts": q_khop_counts,
        "harmonic_centrality": q_harmonic,
        "closeness_centrality": q_closeness,
        "betweenness_centrality": q_betweenness,
        "topological_levels": q_topological_levels,
        "leading_eigenvector": q_leading_eigenvector,
        "voronoi_cells": q_voronoi,
        "core_periphery": q_core_periphery,
        "edge_clustering": q_edge_clustering,
        "balance_census": q_balance_census,
        "molloy_reed": q_molloy_reed,
        "knnk": q_knnk,
        "degree_gini": q_degree_gini,
        "maximal_matching": q_maximal_matching,
        "edge_betweenness": q_edge_betweenness,
        "eccentricity": q_eccentricity,
        "graph_center": q_graph_center,
        "graph_sparsify": q_graph_sparsify,
        "onion_layers": q_onion_layers,
        "s_core": q_s_core,
        "truss_layers": q_truss_layers,
        "sssp_weighted": q_sssp_weighted,
        "attack_curve": q_attack_curve,
        "failure_curve": q_failure_curve,
        "edge_drift": q_edge_drift,
        "clique_census": q_clique_census,
        "burstiness": q_burstiness,
        "periodicity": q_periodicity,
        "lifecycle_accounting": q_lifecycle,
        "rfm_scores": q_rfm_scores,
        "json_field_stats": q_json_field_stats,
        "ltv_cohorts": q_ltv_cohorts,
        "random_projection": q_random_projection,
        "distance_histogram": q_distance_histogram,
        "centroid_classify": q_centroid_classify,
        "kcenter_coreset": q_kcenter_coreset,
        "vocab_coverage": q_vocab_coverage,
        "filter_funnel": q_filter_funnel,
        "zipf_fit": q_zipf_fit,
        "vocab_growth": q_vocab_growth,
        "cross_source_dupes": q_cross_source_dupes,
        "graph_coloring": q_graph_coloring,
        "adamic_adar": q_adamic_adar,
        "neighborhood_hll": q_neighborhood_hll,
        "doc_quality": q_doc_quality,
        "lang_id": q_lang_id,
        "repetition_stats": q_repetition,
        "doc_fingerprint": q_fingerprint,
        "dedup_exact": q_dedup_exact,
        "neardup_jaccard": q_neardup_jaccard,
        "jaccard_prefix": q_jaccard_prefix,
        "hard_negatives": q_hard_negatives,
        "k_anonymity": q_k_anonymity,
        "calibration_curve": q_calibration,
        "wl_kernel_drift": q_wl_kernel_drift,
        "temporal_motifs": q_temporal_motifs,
        "neardup_dedup": q_neardup_dedup,
        "pmi_cooccurrence": q_pmi_cooccurrence,
        "textrank": q_textrank,
        "source_divergence": q_source_divergence,
        "bigram_lm_score": q_bigram_lm_score,
        "script_profile": q_script_profile,
        "training_set": q_training_set,
        "kmeans": q_kmeans,
        "semantic_dedup": q_semantic_dedup,
        "knn_label_noise": q_knn_label_noise,
        "source_minhash_overlap": q_source_minhash_overlap,
        "effective_diameter": q_effective_diameter,
        "interarrival_ks": q_interarrival_ks,
        "l_diversity": q_l_diversity,
        "t_closeness": q_t_closeness,
        "sbm_fit": q_sbm_fit,
        "triangle_significance": q_triangle_significance,
        "attribution": q_attribution,
        "dim_truncation": q_dim_truncation,
        "simrank": q_simrank,
        "bipartite_newman": q_bipartite_newman,
        "winnowing": q_winnowing,
        "label_separation_auc": q_label_separation_auc,
        "nestedness": q_nestedness,
        "rrf_fuse": q_rrf_fuse,
        "decayed_edges": q_decayed_edges,
        "disparate_impact": q_disparate_impact,
        "population_stability": q_population_stability,
        "table_expectations": q_table_expectations,
        "referential_integrity": q_referential_integrity,
        "kmeans_elbow": q_kmeans_elbow,
        "mixing_parameter": q_mixing_parameter,
        "sbm_graph": q_sbm_graph,
        "embedding_curation": q_embedding_curation,
        "markov_absorption": q_markov_absorption,
        "adoption_curve": q_adoption_curve,
        "session_entries_exits": q_session_entries_exits,
        "product_quantize": q_product_quantize,
        "heavy_user_share": q_heavy_user_share,
        "retrieval_ndcg": q_retrieval_ndcg,
        "two_edge_components": q_two_edge_components,
        "session_concurrency": q_session_concurrency,
        "leadlag_correlation": q_leadlag_correlation,
        "landmark_distances": q_landmark_distances,
        "partition_compare": q_partition_compare,
        "lm_score": q_lm_score,
        "rich_club": q_rich_club,
        "kmeans_silhouette": q_kmeans_silhouette,
        "conversation_profile": q_conversation_profile,
        "bipartite_project": q_bipartite_project,
        "community_drift": q_community_drift,
        "corpus_profile": q_corpus_profile,
        "vertex_features": q_vertex_features,
        "diameter": q_diameter,
        "neighbor_sample": q_neighbor_sample,
        "partition_quality": q_partition_quality,
        "community_cartography": q_community_cartography,
        "degree_histogram": q_degree_histogram,
        "embedding_covariance": q_embedding_covariance,
        "embedding_pca": q_embedding_pca,
        "decontaminate": q_decontaminate,
        "hash_split": q_hash_split,
        "stratified_sample": q_stratified_sample,
        "pack_sequences": q_pack_sequences,
        "minhash_signature": q_minhash_signature,
        "cosine_topk": q_cosine_topk,
        "leiden_communities": q_leiden_communities,
        "consensus_communities": q_consensus_communities,
        "pagerank": q_pagerank,
        "temporal_pagerank": q_temporal_pagerank,
        "assortativity_directed": q_assortativity_directed,
        "personalized_pagerank": q_personalized_pagerank,
        "connected_components": q_connected_components,
        "strongly_connected_components": q_scc,
        "bowtie": q_bowtie,
        "random_walks": q_random_walks,
        "node2vec_walks": q_node2vec,
        "hits": q_hits,
        "eigenvector_centrality": q_eigenvector,
        "reciprocity": q_reciprocity,
        "line_graph": q_line_graph,
        "salsa": q_salsa,
        "markov_chain_stats": q_markov_chain_stats,
        "assortativity_numeric": q_assortativity_numeric,
        "dyad_census": q_dyad_census,
        "bipartiteness": q_bipartiteness,
        "power_law_fit": q_power_law_fit,
        "closed_triples": q_closed_triples,
        "k_truss": q_k_truss,
        "densest_subgraph": q_densest_subgraph,
        "maximal_independent_set": q_mis,
        "negative_samples": q_negative_samples,
        "label_propagation": q_label_propagation,
        "label_spreading": q_label_spreading,
        "simhash": q_simhash,
        "lsh_topk": q_lsh_topk,
        "ivf_topk": q_ivf_topk,
        "media_features": q_media_features,
        "media_dedup": q_media_dedup,
        "media_neardup": q_media_neardup,
        "embedding_neardup": q_embedding_neardup,
        "temporal_communities": q_temporal_communities,
        "resolution_profile": q_resolution_profile,
        "asof_attribution": q_asof_attribution,
        "value_profile": q_value_profile,
        "event_windows": q_event_windows,
        "event_windows_sliding": q_event_windows_sliding,
        "trending_topk": q_trending,
        "retention_cohorts": q_retention,
        "association_rules": q_association_rules,
        "funnel": q_funnel,
        "jaccard_linkpred": q_jaccard_linkpred,
        "dice_similarity": q_dice_similarity,
        "community_stats": q_community_stats,
        "wl_refinement": q_wl_refinement,
        "anomaly_windows": q_anomaly_windows,
        "duplicate_spans": q_duplicate_spans,
        "mixing_matrix": q_mixing_matrix,
        "assortativity_nominal": q_assortativity_nominal,
        "transitivity": q_transitivity,
        "avg_distance": q_avg_distance,
        "bpe_pairs": q_bpe_pairs,
        "graph_summary": q_graph_summary,
        "importance_sample": q_importance_sample,
        "coreness": q_coreness,
        "ppr_sweep": q_ppr_sweep,
        "katz_centrality": q_katz,
        "spanning_forest": q_spanning_forest,
        "quantize_embeddings": q_quantize,
        "shortest_path": q_shortest_path,
        "tool_chains": q_tool_chains,
        "role_transitions": q_role_transitions,
        "turn_latency": q_turn_latency,
        "text_entropy": q_text_entropy,
        "hashed_features": q_hashed_features,
        "chunk_documents": q_chunk_documents,
        "triad_census": q_triad_census,
        "knn_graph": q_knn_graph,
        "tool_retries": q_tool_retries,
        "conversation_endings": q_conversation_endings,
        "turn_boilerplate": q_turn_boilerplate,
        "bib_coupling": q_bib_coupling,
        "butterfly_census": q_butterfly_census,
        "kmeans_outliers": q_kmeans_outliers,
        "avg_neighbor_degree": q_avg_neighbor_degree,
        "vertex_diversity": q_vertex_diversity,
        "burt_constraint": q_burt_constraint,
        "ncol_roundtrip": q_ncol_roundtrip,
        "graphml_roundtrip": q_graphml_roundtrip,
        "pajek_roundtrip": q_pajek_roundtrip,
        "gml_roundtrip": q_gml_roundtrip,
        "dot_roundtrip": q_dot_roundtrip,
        "lgl_roundtrip": q_lgl_roundtrip,
        "graph_setops": q_graph_setops,
        "rmat_graph": q_rmat_graph,
        "graph_generators": q_graph_generators,
        "configuration_model": q_configuration_model,
        "watts_strogatz": q_watts_strogatz,
        "modularity_null_test": q_modularity_null,
        "tree_graph": q_tree_graph,
    }
    return _rotate_driver_window(q)


# The per-round driver harness verifies the FIRST ~50 ``queries()``
# entries; front-loading the least-recently-driver-checked entries sweeps
# the external coverage window across the whole catalog round over round.
# These names are the union of every committed driver-style check through
# round 3 (CORRECTNESS_r01/r02/r03.json + the two BENCH/ window files,
# 174 of 295) and rotate to the back; the 121 never-driver-checked
# entries lead, so round 4's 50-entry driver window plus the two
# committed r4 window files close the sweep at 295/295.
_DRIVER_CHECKED_R1_TO_R3 = frozenset({
    "ab_test", "activity_correlation", "activity_heatmap", "actor_behavior_kl",
    "adamic_adar", "articulation_points", "assortativity", "assortativity_directed",
    "attack_curve", "attribution", "avg_local_cc", "balance_census",
    "balance_labels", "barrat_clustering", "benford_test", "betweenness_centrality",
    "bigram_lm_score", "bipartite_edges", "bipartite_newman", "bm25", "bridges",
    "burstiness", "calibration_curve", "centralization", "centroid_classify",
    "changepoint", "clean_text", "clique_census", "clique_percolation",
    "closeness_centrality", "clustering_coefficient", "collective_influence",
    "community_conductance", "connected_components", "containment_pairs",
    "core_periphery", "cosine_topk", "cross_source_dupes", "decayed_edges",
    "dedup_exact", "degree_gini", "degrees", "dim_truncation", "disparity_backbone",
    "distance_histogram", "doc_clusters", "doc_fingerprint", "doc_quality",
    "doc_source_kl", "eccentricity", "edge_betweenness", "edge_clustering",
    "edge_derivation", "edge_drift", "edge_embeddedness", "edge_lift",
    "effective_diameter", "embedding_drift", "failure_curve", "filter_funnel",
    "fisher_ratio", "funnel_latency", "gopher_rules", "graph_center",
    "graph_coloring", "graph_sparsify", "graphlet_orbits", "hard_negatives",
    "harmonic_centrality", "hhi_concentration", "hurst_variance",
    "influence_cascade", "interarrival_ks", "intrinsic_dim", "jaccard_prefix",
    "json_field_stats", "k_anonymity", "k_core", "kaplan_meier", "kcenter_coreset",
    "khop_counts", "kmeans", "knn_label_assortativity", "knn_label_noise", "knnk",
    "l_diversity", "label_centroid_sim", "label_propagation", "label_separation_auc",
    "lang_id", "langid_confusion", "leading_eigenvector", "leiden_communities",
    "lifecycle_accounting", "linkpred_eval", "lsh_recall", "lsh_topk", "ltv_cohorts",
    "markov_accuracy", "maximal_matching", "media_features", "media_neardup",
    "merge_gain", "minhash_signature", "mixture_sample", "molloy_reed",
    "neardup_dedup", "neardup_jaccard", "neardup_online", "neighborhood_hll",
    "nestedness", "ngram_novelty", "onion_layers", "pagerank", "peak_days",
    "periodicity", "pii_mask", "pmi_cooccurrence", "quality_bipartite",
    "quality_cpm", "quality_decomposition", "quality_moddensity",
    "quality_modularity", "quality_multiplex", "quality_rbconfiguration",
    "quality_rber", "quality_significance", "quality_surprise", "random_projection",
    "readability", "repetition_stats", "rfm_scores", "rrf_fuse", "s_core", "sbm_fit",
    "script_profile", "seasonal_naive_error", "semantic_dedup", "sessionize",
    "shortest_cycles", "simhash", "simrank", "slice_layers", "slo_burn",
    "source_divergence", "source_length_emd", "source_minhash_overlap",
    "square_count", "sssp_weighted", "stickiness", "t_closeness", "temporal_motifs",
    "temporal_pagerank", "textrank", "tfidf_cosine", "tfidf_terms", "token_count",
    "top_bigrams", "topic_clusters", "topological_levels", "training_set",
    "triangle_count", "triangle_significance", "truss_layers", "ttr_stats",
    "two_edge_components", "type_affinity", "vocab_coverage", "vocab_growth",
    "voronoi_cells", "wilson_error_rates", "winnowing", "wl_kernel_drift",
    "zipf_fit",
})


def _rotate_driver_window(q: dict) -> dict:
    fresh = {k: v for k, v in q.items() if k not in _DRIVER_CHECKED_R1_TO_R3}
    seen = {k: v for k, v in q.items() if k in _DRIVER_CHECKED_R1_TO_R3}
    return {**fresh, **seen}


# ------------------------------------------------------------ oracle SQL
_BIP_EDGES = """
    SELECT 'u:' || CAST(user_id AS VARCHAR) AS src, 't:' || event_type AS dst,
           CAST(COUNT(*) AS DOUBLE) AS weight
    FROM events GROUP BY 1, 2
"""

_QUALITY_PRELUDE = f"""
WITH edges AS ({_BIP_EDGES}),
verts AS (
  SELECT name,
         CASE WHEN name LIKE 'u:%' THEN CAST(substr(name, 3) AS BIGINT) % 8
              ELSE length(name) % 8 END AS comm
  FROM (SELECT src AS name FROM edges UNION SELECT dst FROM edges)
),
k AS (
  SELECT name, SUM(w) AS k FROM (
    SELECT src AS name, weight AS w FROM edges
    UNION ALL SELECT dst AS name, weight AS w FROM edges
  ) GROUP BY name
),
tot AS (
  SELECT (SELECT SUM(weight) FROM edges) AS W,
         (SELECT CAST(COUNT(*) AS DOUBLE) FROM verts) AS n
),
win AS (
  SELECT v1.comm AS comm, SUM(e.weight) AS w_in
  FROM edges e JOIN verts v1 ON e.src = v1.name JOIN verts v2 ON e.dst = v2.name
  WHERE v1.comm = v2.comm GROUP BY v1.comm
),
cs AS (
  SELECT v.comm, SUM(k.k) AS K, CAST(COUNT(*) AS DOUBLE) AS n_size
  FROM verts v JOIN k ON v.name = k.name GROUP BY v.comm
),
stats AS (
  SELECT cs.comm, cs.K, cs.n_size, COALESCE(win.w_in, 0.0) AS w_in,
         tot.W AS W, tot.n AS n
  FROM cs LEFT JOIN win ON cs.comm = win.comm CROSS JOIN tot
)
"""


def _doc_tokens(col="text"):
    return f"string_split_regex(lower(trim({col})), '\\s+')"


def _hash_split_oracle() -> str:
    """DuckDB twin of operators.sampling.hash_split (default 98/1/1,
    seed 42) — thresholds come from the SAME split_thresholds() helper the
    engine uses, so the compared integers are byte-identical."""
    from leidenalg_spark.operators.sampling import split_thresholds

    t1, t2 = split_thresholds({"train": 0.98, "val": 0.01, "test": 0.01})
    return f"""
WITH b AS (
  SELECT doc_id,
         ('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < {t1} THEN 'train'
            WHEN bucket < {t2} THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


def _simhash_oracle() -> str:
    """DuckDB twin of operators.dedup.simhash — same md5 hash family,
    same per-bit majority vote, same two's-complement reassembly."""
    vs = ", ".join(
        f"SUM(((({'hi' if b >= 32 else 'lo'}) >> {b % 32}) & 1)*2 - 1) AS v{b}"
        for b in range(64)
    )
    terms = " + ".join(
        f"CASE WHEN v{b} > 0 THEN "
        f"{'(-9223372036854775807 - 1)' if b == 63 else str(1 << b)} ELSE 0 END"
        for b in range(64)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, tok
  FROM (SELECT doc_id, string_split_regex(lower(coalesce(text,'')), '\\s+') AS tk FROM documents),
       LATERAL (SELECT unnest(tk) AS tok)
  WHERE tok <> ''
), h AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok),1,8))::BIGINT AS hi,
         ('0x' || substr(md5(tok),9,8))::BIGINT AS lo
  FROM tok
), v AS (
  SELECT doc_id, {vs} FROM h GROUP BY doc_id
), sig AS (
  SELECT doc_id, CAST({terms} AS BIGINT) AS simhash FROM v
)
SELECT d.doc_id, coalesce(s.simhash, 0) AS simhash
FROM documents d LEFT JOIN sig s USING (doc_id)
"""


def _lsh_topk_oracle(k=5, n_planes=8, seed=42, dim=64) -> str:
    """DuckDB twin of operators.similarity.lsh_cosine_topk: the SAME
    hyperplane constants (repr round-trips float64 exactly), the same
    sign-bit single-band bucket, candidates = bucket-mates, exact cosine
    rank within each query's bucket."""
    from leidenalg_spark.operators.similarity import random_hyperplanes

    def dot(vec, consts):
        lst = "[" + ",".join(repr(float(x)) for x in consts) + "]"
        return f"list_sum(list_transform(list_zip({vec}, {lst}), p -> CAST(p[1] AS DOUBLE) * p[2]))"

    planes = random_hyperplanes(dim, n_planes, seed)
    key = " + ".join(
        f"(CASE WHEN {dot('embedding', p)} > 0 THEN {1 << (n_planes - 1 - i)} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
WITH b AS (SELECT vec_id, embedding, {key} AS bucket FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM b WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROUND(list_sum(list_transform(list_zip(q.qv, e.embedding),
                                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cos_sim
  FROM b e JOIN q ON e.bucket = q.bucket AND e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def _knn_graph_oracle(k=3, n_planes=5, seed=42, dim=64) -> str:
    """DuckDB twin of operators.similarity.knn_graph: SAME hyperplane
    constants (repr round-trips float64), same single-band sign bucket,
    exact cosine within bucket, per-vertex top-k, symmetrised."""
    from leidenalg_spark.operators.similarity import random_hyperplanes

    def dot(vec, consts):
        lst = "[" + ",".join(repr(float(x)) for x in consts) + "]"
        return f"list_sum(list_transform(list_zip({vec}, {lst}), p -> CAST(p[1] AS DOUBLE) * p[2]))"

    planes = random_hyperplanes(dim, n_planes, seed)
    key = " + ".join(
        f"(CASE WHEN {dot('embedding', p)} > 0 THEN {1 << (n_planes - 1 - i)} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
WITH b AS (SELECT vec_id AS id, embedding, {key} AS bucket FROM embeddings),
cand AS (
  SELECT x.id AS src0, y.id AS dst0,
         ROUND(list_sum(list_transform(list_zip(x.embedding, y.embedding),
                                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(x.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
            * sqrt(list_sum(list_transform(y.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))), 6)
           AS cos_sim
  FROM b x JOIN b y ON y.bucket = x.bucket AND x.id <> y.id
),
knn AS (
  SELECT src0, dst0, cos_sim FROM (
    SELECT *, row_number() OVER (PARTITION BY src0
                                 ORDER BY cos_sim DESC, dst0 ASC) AS rn
    FROM cand) WHERE rn <= {k}
)
SELECT least(src0, dst0) AS src, greatest(src0, dst0) AS dst,
       MAX(cos_sim) AS weight, COUNT(*) = 2 AS mutual
FROM knn GROUP BY 1, 2
"""


def _embedding_neardup_oracle(threshold=0.35, n_planes=8, n_bands=4, seed=42, dim=64) -> str:
    """DuckDB twin of the LSH-routed embedding near-dup: the SAME
    hyperplane constants (repr round-trips float64 exactly), the same
    sign-bit bucket keys, the same candidate join and cosine verify."""
    from leidenalg_spark.operators.similarity import random_hyperplanes

    def dot(vec, consts):
        lst = "[" + ",".join(repr(float(x)) for x in consts) + "]"
        return f"list_sum(list_transform(list_zip({vec}, {lst}), p -> CAST(p[1] AS DOUBLE) * p[2]))"

    band_selects = []
    for band in range(n_bands):
        planes = random_hyperplanes(dim, n_planes, seed + 1000 * band)
        key = " + ".join(
            f"(CASE WHEN {dot('embedding', p)} > 0 THEN {1 << (n_planes - 1 - i)} ELSE 0 END)"
            for i, p in enumerate(planes)
        )
        band_selects.append(
            f"SELECT vec_id AS doc, {band} AS band, {key} AS key FROM embeddings"
        )
    banded = " UNION ALL ".join(band_selects)
    norm = "sqrt(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    cs = (
        "list_sum(list_transform(list_zip(ea.embedding, eb.embedding), "
        "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / ("
        + norm.format(v="ea.embedding") + " * " + norm.format(v="eb.embedding") + ")"
    )
    return f"""
WITH banded AS ({banded}),
cand AS (
  SELECT DISTINCT x.doc AS a, y.doc AS b
  FROM banded x JOIN banded y ON x.band = y.band AND x.key = y.key AND x.doc < y.doc
)
SELECT a, b, ROUND({cs}, 6) AS cos_sim
FROM cand JOIN embeddings ea ON ea.vec_id = a JOIN embeddings eb ON eb.vec_id = b
WHERE ROUND({cs}, 6) >= {threshold}
"""


def _clean_text_oracle() -> str:
    """DuckDB twin of operators.textops.clean_text — the SAME regex
    patterns (simple character classes, identical under Java regex and
    RE2), counts on the raw text, md5 of the cleaned text."""
    from leidenalg_spark.operators.textops import CTRL_RE, EMAIL_RE, URL_RE

    clean = (
        "trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        f"coalesce(text, ''), '{URL_RE}', ' ', 'g'), '{EMAIL_RE}', ' ', 'g'), "
        f"'{CTRL_RE}', ' ', 'g'), '\\s+', ' ', 'g'))"
    )
    return f"""
SELECT doc_id, md5({clean}) AS clean_fp,
       CAST(len(regexp_extract_all(coalesce(text, ''), '{URL_RE}')) AS BIGINT) AS n_urls,
       CAST(len(regexp_extract_all(coalesce(text, ''), '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(length(coalesce(text, '')) - length({clean}) AS BIGINT) AS n_chars_removed
FROM documents
"""


def _pii_mask_oracle() -> str:
    """DuckDB twin of operators.textops.pii_mask — same patterns, same
    replacement order (email → ip → phone), counts on the raw text."""
    from leidenalg_spark.operators.textops import EMAIL_RE, IPV4_RE, PHONE_RE

    masked = (
        "regexp_replace(regexp_replace(regexp_replace("
        f"coalesce(text, ''), '{EMAIL_RE}', '[EMAIL]', 'g'), "
        f"'{IPV4_RE}', '[IP]', 'g'), '{PHONE_RE}', '[PHONE]', 'g')"
    )
    return f"""
SELECT doc_id, md5({masked}) AS masked_fp,
       CAST(len(regexp_extract_all(coalesce(text, ''), '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(coalesce(text, ''), '{IPV4_RE}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(coalesce(text, ''), '{PHONE_RE}')) AS BIGINT) AS n_phones
FROM documents
"""


def _mixture_sample_oracle(seed=11, temperature=2.0) -> str:
    """DuckDB twin of operators.sampling.mixture_sample — per-source
    thresholds from the SAME mixture_weights() helper, so the compared
    integers are byte-identical."""
    from leidenalg_spark.operators.sampling import _BUCKETS, mixture_weights

    fracs = mixture_weights(_MIXTURE_WEIGHTS, temperature)
    cases = " ".join(
        f"WHEN '{s}' THEN {int(float(f) * _BUCKETS)}" for s, f in fracs.items()
    )
    return f"""
WITH b AS (
  SELECT doc_id, source,
         ('0x' || substr(md5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS bucket
  FROM documents
)
SELECT doc_id, source FROM b
WHERE bucket < CASE source {cases} ELSE 0 END
"""


def oracle_sql() -> dict[str, str]:
    toks = _doc_tokens()
    stop = "('and','das','de','der','des','die','el','est','et','in','is','ist','la','le','les','los','nicht','of','que','the','to','und','y')"
    langs = {
        "en": "('the','and','of','to','is','in')",
        "es": "('el','la','de','que','y','los')",
        "de": "('der','die','und','das','ist','nicht')",
        "fr": "('le','la','et','les','des','est')",
    }
    hits = {l: f"len(list_filter({toks}, t -> t IN {w}))" for l, w in langs.items()}

    shingle_cte = f"""
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           array_to_string((tk)[i+1:i+3], ' ') AS shingle
    FROM (SELECT doc_id, {toks} AS tk FROM documents),
         LATERAL (SELECT unnest(range(0, greatest(len(tk) - 3, 0) + 1)) AS i)
  ) WHERE length(shingle) > 0
)"""

    quality_tail = {
        "quality_modularity": "SELECT ROUND(SUM(w_in / W - (K * K) / (4.0 * W * W)), 6) AS value FROM stats",
        "quality_cpm": "SELECT ROUND(SUM(w_in - 0.5 * n_size * (n_size - 1) / 2.0), 6) AS value FROM stats",
        "quality_rber": "SELECT ROUND(SUM(w_in - 0.5 * (W / (n * (n - 1) / 2.0)) * n_size * (n_size - 1) / 2.0), 6) AS value FROM stats",
        "quality_rbconfiguration": "SELECT ROUND(SUM(w_in - 0.5 * (K * K) / (4.0 * W)), 6) AS value FROM stats",
        "quality_significance": """
SELECT ROUND(SUM(CASE WHEN pairs > 0 THEN pairs * (
    CASE WHEN dens > 0 AND p > 0 THEN dens * ln(dens / p) ELSE 0 END +
    CASE WHEN dens < 1 AND p < 1 THEN (1 - dens) * ln((1 - dens) / (1 - p)) ELSE 0 END
  ) ELSE 0 END), 6) AS value
FROM (SELECT n_size * (n_size - 1) / 2.0 AS pairs,
             least(w_in / nullif(n_size * (n_size - 1) / 2.0, 0), 1.0) AS dens,
             W / (n * (n - 1) / 2.0) AS p
      FROM stats)""",
        "quality_surprise": """
SELECT ROUND(W * (
    CASE WHEN q > 0 AND qe > 0 THEN q * ln(q / qe) ELSE 0 END +
    CASE WHEN q < 1 AND qe < 1 THEN (1 - q) * ln((1 - q) / (1 - qe)) ELSE 0 END
  ), 6) AS value
FROM (SELECT least(SUM(w_in) / MAX(W), 1.0) AS q,
             SUM(n_size * (n_size - 1) / 2.0) / MAX(n * (n - 1) / 2.0) AS qe,
             MAX(W) AS W
      FROM stats)""",
    }

    sqls = {
        "edge_derivation": """
SELECT prev_type AS src_name, event_type AS dst_name, CAST(COUNT(*) AS DOUBLE) AS weight
FROM (SELECT event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events)
WHERE prev_type IS NOT NULL
GROUP BY 1, 2
""",
        "bipartite_edges": f"SELECT src AS src_name, dst AS dst_name, weight FROM ({_BIP_EDGES})",
        "community_stats": f"""
WITH edges AS ({_BIP_EDGES}),
verts AS (
  SELECT name,
         CASE WHEN name LIKE 'u:%' THEN CAST(substr(name, 3) AS BIGINT) % 8
              ELSE length(name) % 8 END AS comm
  FROM (SELECT src AS name FROM edges UNION SELECT dst FROM edges)
),
lab AS (
  SELECT e.weight, v1.comm AS c_src, v2.comm AS c_dst
  FROM edges e JOIN verts v1 ON e.src = v1.name JOIN verts v2 ON e.dst = v2.name
),
per_end AS (
  SELECT c_src AS comm, weight AS iw, 0.0 AS cw, 1 AS ie FROM lab WHERE c_src = c_dst
  UNION ALL SELECT c_src, 0.0, weight, 0 FROM lab WHERE c_src <> c_dst
  UNION ALL SELECT c_dst, 0.0, weight, 0 FROM lab WHERE c_src <> c_dst
),
agg AS (SELECT comm, SUM(iw) AS iw, SUM(cw) AS cw, SUM(ie) AS ne
        FROM per_end GROUP BY comm),
j AS (
  SELECT v.comm, v.n_vertices,
         COALESCE(a.ne, 0) AS ne, COALESCE(a.iw, 0.0) AS iw,
         COALESCE(a.cw, 0.0) AS cw,
         2 * COALESCE(a.iw, 0.0) + COALESCE(a.cw, 0.0) AS volume
  FROM (SELECT comm, COUNT(*) AS n_vertices FROM verts GROUP BY comm) v
  LEFT JOIN agg a ON v.comm = a.comm
)
SELECT j.comm, j.n_vertices, CAST(j.ne AS BIGINT) AS n_internal_edges,
       ROUND(j.iw, 6) AS internal_weight, ROUND(j.cw, 6) AS cut_weight,
       ROUND(j.volume, 6) AS volume,
       ROUND(CASE WHEN LEAST(j.volume, t.total_vol - j.volume) > 0
                  THEN j.cw / LEAST(j.volume, t.total_vol - j.volume)
                  ELSE 0.0 END, 6) AS conductance,
       ROUND(CASE WHEN j.n_vertices > 1
                  THEN 2.0 * j.ne / (j.n_vertices * (j.n_vertices - 1.0))
                  ELSE 0.0 END, 6) AS density
FROM j CROSS JOIN (SELECT SUM(volume) AS total_vol FROM j) t
""",
        "asof_attribution": """
WITH clicks AS (
  SELECT user_id, ts, MAX(event_id) AS click_event_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
purchases AS (
  SELECT user_id, ts, event_id, ROUND(value, 6) AS value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.user_id, p.ts, p.event_id, p.value,
       COALESCE(ROUND(epoch(c.ts), 6), -1.0) AS ts_r_s,
       COALESCE(c.click_event_id, -1) AS click_event_id_r
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
        "value_profile": """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(value), 6) AS mean,
       ROUND(MIN(value), 6) AS vmin,
       ROUND(MAX(value), 6) AS vmax,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.9), 6) AS p90,
       ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
""",
        "event_windows": """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 6) AS total
FROM events GROUP BY 1, 2
""",
        "event_windows_sliding": """
SELECT ws AS window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 6) AS total
FROM (
  SELECT e.event_type, e.value,
         time_bucket(INTERVAL '1 hour', e.ts) - (INTERVAL '1 hour' * j.j) AS ws,
         e.ts
  FROM events e CROSS JOIN (SELECT unnest(range(0, 2)) AS j) j
)
WHERE ts >= ws AND ts < ws + INTERVAL '2 hours'
GROUP BY 1, 2
""",
        "association_rules": """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(epoch(ts)) OVER w IS NULL
                   OR epoch(ts) - lag(epoch(ts)) OVER w > 7200.0
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) - 1 AS session_ord,
         event_type AS item
  FROM marked
),
items AS (SELECT DISTINCT user_id, session_ord, item FROM sess),
nb AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nb
       FROM (SELECT DISTINCT user_id, session_ord FROM items)),
ni AS (SELECT item, COUNT(*) AS ni FROM items GROUP BY item),
pr AS (
  SELECT a.item AS antecedent, b.item AS consequent, COUNT(*) AS n_ab
  FROM items a JOIN items b
    ON a.user_id = b.user_id AND a.session_ord = b.session_ord
  WHERE a.item <> b.item GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT pr.antecedent, pr.consequent, CAST(pr.n_ab AS BIGINT) AS n_ab,
       ROUND(pr.n_ab / t.nb, 6) AS support,
       ROUND(CAST(pr.n_ab AS DOUBLE) / na.ni, 6) AS confidence,
       ROUND((CAST(pr.n_ab AS DOUBLE) / na.ni) / (nc.ni / t.nb), 6) AS lift
FROM pr JOIN ni na ON na.item = pr.antecedent
JOIN ni nc ON nc.item = pr.consequent
CROSS JOIN nb t
""",
        "retention_cohorts": """
WITH first AS (
  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_start
  FROM events GROUP BY user_id
),
active AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS b FROM events)
SELECT CAST(f.cohort_start AS TIMESTAMP) AS cohort_start,
       CAST((epoch(a.b) - epoch(f.cohort_start)) / 604800 AS BIGINT) AS offset,
       CAST(COUNT(*) AS BIGINT) AS n_active
FROM active a JOIN first f ON f.user_id = a.user_id
GROUP BY 1, 2
""",
        "trending_topk": """
WITH counts AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
rk AS (
  SELECT window_start, event_type, n,
         CAST(ROW_NUMBER() OVER (PARTITION BY window_start
                                 ORDER BY n DESC, event_type ASC) AS BIGINT) AS rank
  FROM counts
)
SELECT window_start, event_type, n, rank FROM rk WHERE rank <= 2
""",
        "funnel": """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t, MIN(ts) AS t0
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t, MIN(s1.t0) AS t0
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t
    AND epoch(e.ts) <= epoch(s1.t0) + 86400.0
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t
    AND epoch(e.ts) <= epoch(s2.t0) + 86400.0
  GROUP BY e.user_id
)
SELECT 1 AS step_idx, 'view' AS step, (SELECT COUNT(*) FROM s1) AS n_keys
UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
""",
        "sessionize": """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(epoch(ts)) OVER w IS NULL
                   OR epoch(ts) - lag(epoch(ts)) OVER w > 7200.0
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) - 1 AS session_ord
  FROM marked
)
SELECT user_id, CAST(session_ord AS INT) AS session_ord,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(COUNT(*) AS INT) AS n_events
FROM sess GROUP BY user_id, session_ord
""",
        "degrees": f"""
WITH edges AS ({_BIP_EDGES})
SELECT name, COUNT(*) AS degree, ROUND(SUM(w), 6) AS strength
FROM (SELECT src AS name, weight AS w FROM edges
      UNION ALL SELECT dst AS name, weight AS w FROM edges)
GROUP BY name
""",
        "triangle_count": """
WITH te AS (
  SELECT prev_type AS s, event_type AS d
  FROM (SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events)
  WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
und AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM te WHERE s <> d)
SELECT COUNT(*) AS n_triangles
FROM und e1 JOIN und e2 ON e1.b = e2.a JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
""",
        "clustering_coefficient": """
WITH te AS (
  SELECT prev_type AS s, event_type AS d
  FROM (SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events)
  WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
verts AS (SELECT DISTINCT v AS name
          FROM (SELECT s AS v FROM te UNION ALL SELECT d AS v FROM te)),
und AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM te WHERE s <> d),
deg AS (SELECT name, COUNT(*) AS degree
        FROM (SELECT a AS name FROM und UNION ALL SELECT b AS name FROM und)
        GROUP BY name),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1 JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
cnt AS (SELECT name, COUNT(*) AS nt
        FROM (SELECT x AS name FROM tri UNION ALL SELECT y AS name FROM tri
              UNION ALL SELECT z AS name FROM tri)
        GROUP BY name)
SELECT v.name,
       CAST(COALESCE(c.nt, 0) AS BIGINT) AS n_triangles,
       CAST(COALESCE(d.degree, 0) AS BIGINT) AS degree,
       ROUND(CASE WHEN COALESCE(d.degree, 0) >= 2
                  THEN 2.0 * COALESCE(c.nt, 0) / (d.degree * (d.degree - 1.0))
                  ELSE 0.0 END, 6) AS lcc
FROM verts v LEFT JOIN deg d ON d.name = v.name LEFT JOIN cnt c ON c.name = v.name
""",
        "token_count": f"""
SELECT doc_id, len({toks}) AS n_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tokens_bpe
FROM documents
""",
        "vocab_coverage": f"""
WITH tok AS (
  SELECT t.tok AS token
  FROM (SELECT {toks} AS tk FROM documents),
       LATERAL (SELECT unnest(tk) AS tok) t
  WHERE length(t.tok) > 0
),
cnt AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
tot AS (SELECT COUNT(*) AS n FROM tok),
top AS (
  SELECT token, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rnk
  FROM cnt QUALIFY rnk <= 200
)
SELECT CAST(rnk AS BIGINT) AS rank, token, CAST(cnt AS BIGINT) AS cnt,
       ROUND(SUM(cnt) OVER (ORDER BY rnk ROWS UNBOUNDED PRECEDING)
             * 1.0 / tot.n, 6) AS coverage
FROM top, tot
""",
        "vocab_growth": f"""
WITH tok AS (
  SELECT doc_id, t.tok AS token
  FROM (SELECT doc_id, {toks} AS tk FROM documents),
       LATERAL (SELECT unnest(tk) AS tok) t
  WHERE length(t.tok) > 0
),
th AS (
  SELECT {", ".join(f"quantile_disc(doc_id, {i}/8.0) AS th{i}" for i in range(1, 9))}
  FROM documents
),
agg AS (
  SELECT
    {", ".join(
        f"COUNT(DISTINCT CASE WHEN doc_id <= th.th{i} THEN doc_id END) AS d{i}, "
        f"SUM(CASE WHEN doc_id <= th.th{i} THEN 1 ELSE 0 END) AS n{i}, "
        f"COUNT(DISTINCT CASE WHEN doc_id <= th.th{i} THEN token END) AS v{i}"
        for i in range(1, 9)
    )}
  FROM tok, th
)
{" UNION ALL ".join(
    f"SELECT CAST({i} AS BIGINT) AS point, ROUND({i}/8.0, 6) AS frac, "
    f"CAST(d{i} AS BIGINT) AS n_docs, CAST(n{i} AS BIGINT) AS n_tokens, "
    f"CAST(v{i} AS BIGINT) AS n_types FROM agg"
    for i in range(1, 9)
)}
ORDER BY point
""",
        "zipf_fit": f"""
WITH tok AS (
  SELECT t.tok AS token
  FROM (SELECT {toks} AS tk FROM documents),
       LATERAL (SELECT unnest(tk) AS tok) t
  WHERE length(t.tok) > 0
),
cnts AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
nt AS (SELECT COUNT(*) AS n_types FROM cnts),
tail AS (SELECT cnt FROM cnts WHERE cnt >= 2),
st AS (
  SELECT COUNT(*) AS n_tail,
         1.0 + COUNT(*) / SUM(ln(cnt / 1.5)) AS alpha
  FROM tail
),
dd AS (SELECT cnt, COUNT(*) AS m FROM tail GROUP BY cnt),
ccdf AS (
  SELECT cnt, SUM(m) OVER (ORDER BY cnt DESC ROWS UNBOUNDED PRECEDING) AS cum
  FROM dd
),
ks AS (
  SELECT MAX(ABS(CAST(cum AS DOUBLE) / st.n_tail
                 - POWER((cnt - 0.5) / 1.5, 1.0 - st.alpha))) AS ks
  FROM ccdf, st
)
SELECT CAST(2 AS BIGINT) AS xmin, CAST(nt.n_types AS BIGINT) AS n_types,
       CAST(st.n_tail AS BIGINT) AS n_tail,
       ROUND(st.alpha, 6) AS alpha, ROUND(ks.ks, 6) AS ks
FROM st, nt, ks
""",
        "filter_funnel": f"""
WITH q AS (
  SELECT doc_id, text, length(text) AS n_chars,
         (least(n_tokens / 50.0, 1.0) * 0.4
          + least(stop_hits / greatest(n_tokens, 1.0) * 5.0, 1.0) * 0.4
          + (1.0 - least(punct / greatest(n_chars_d, 1.0) * 10.0, 1.0)) * 0.2) AS score
  FROM (
    SELECT doc_id, text,
           CAST(length(text) AS DOUBLE) AS n_chars_d,
           CAST(len({toks}) AS DOUBLE) AS n_tokens,
           CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE) AS punct,
           CAST(len(list_filter({toks}, t -> t IN {stop})) AS DOUBLE) AS stop_hits
    FROM documents)
),
f AS (
  SELECT COUNT(*) AS total,
         SUM(CASE WHEN n_chars BETWEEN 50 AND 100000 THEN 1 ELSE 0 END) AS len_ok,
         SUM(CASE WHEN n_chars BETWEEN 50 AND 100000 AND score >= 0.5
                  THEN 1 ELSE 0 END) AS q_ok,
         COUNT(DISTINCT CASE WHEN n_chars BETWEEN 50 AND 100000 AND score >= 0.5
                             THEN md5(text) END) AS dedup_ok
  FROM q
)
SELECT * FROM (
  SELECT CAST(0 AS BIGINT) AS stage_idx, 'total' AS stage,
         CAST(total AS BIGINT) AS n_docs, ROUND(total * 1.0 / total, 6) AS frac_of_total FROM f
  UNION ALL SELECT 1, 'length', CAST(len_ok AS BIGINT), ROUND(len_ok * 1.0 / total, 6) FROM f
  UNION ALL SELECT 2, 'quality', CAST(q_ok AS BIGINT), ROUND(q_ok * 1.0 / total, 6) FROM f
  UNION ALL SELECT 3, 'dedup', CAST(dedup_ok AS BIGINT), ROUND(dedup_ok * 1.0 / total, 6) FROM f
) ORDER BY stage_idx
""",
        "cross_source_dupes": """
WITH h AS (SELECT DISTINCT md5(text) AS h, source FROM documents)
SELECT l.source AS source_a, r.source AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_texts
FROM h l JOIN h r ON r.h = l.h AND l.source < r.source
GROUP BY 1, 2
""",
        "doc_quality": f"""
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(n_chars / greatest(n_tokens, 1.0), 6) AS avg_token_len,
       ROUND(punct / greatest(n_chars, 1.0), 6) AS punct_ratio,
       ROUND(stop_hits / greatest(n_tokens, 1.0), 6) AS stopword_ratio,
       ROUND(least(n_tokens / 50.0, 1.0) * 0.4
             + least(stop_hits / greatest(n_tokens, 1.0) * 5.0, 1.0) * 0.4
             + (1.0 - least(punct / greatest(n_chars, 1.0) * 10.0, 1.0)) * 0.2, 6) AS quality_score
FROM (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len({toks}) AS DOUBLE) AS n_tokens,
         CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE) AS punct,
         CAST(len(list_filter({toks}, t -> t IN {stop})) AS DOUBLE) AS stop_hits
  FROM documents)
""",
        "lang_id": f"""
SELECT doc_id,
       {hits['de']} AS hits_de, {hits['en']} AS hits_en,
       {hits['es']} AS hits_es, {hits['fr']} AS hits_fr,
       CASE
         WHEN text IS NULL THEN 'und'
         WHEN greatest({hits['de']}, {hits['en']}, {hits['es']}, {hits['fr']}) = 0 THEN 'und'
         WHEN {hits['de']} >= greatest({hits['en']}, {hits['es']}, {hits['fr']}) THEN 'de'
         WHEN {hits['en']} >= greatest({hits['es']}, {hits['fr']}) THEN 'en'
         WHEN {hits['es']} >= {hits['fr']} THEN 'es'
         ELSE 'fr'
       END AS lang_pred
FROM documents
""",
        "doc_fingerprint": """
SELECT doc_id, md5(regexp_replace(lower(trim(coalesce(text, ''))), '\\s+', ' ', 'g')) AS fingerprint
FROM documents
""",
        "media_features": """
WITH b AS (
  SELECT doc_id AS media_id, 'doc' AS media_type,
         octet_length(encode(coalesce(text, ''))) AS n_bytes,
         hex(encode(coalesce(text, ''))) AS hx
  FROM documents
)
SELECT media_id, media_type, CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(COALESCE(list_sum(list_transform(range(0, CAST(n_bytes AS INT)),
            i -> ('0x' || substr(hx, 2 * i + 1, 2))::INT)), 0) AS BIGINT) AS checksum
FROM b
""",
        "media_dedup": """
WITH fp AS (SELECT doc_id AS media_id, 'doc' AS media_type,
                   md5(coalesce(text, '')) AS content_hash
            FROM documents),
grp AS (SELECT content_hash, MIN(media_id) AS keep_id, COUNT(*) AS group_size
        FROM fp GROUP BY content_hash)
SELECT fp.media_id, fp.media_type, fp.content_hash, grp.group_size,
       fp.media_id = grp.keep_id AS is_kept
FROM fp JOIN grp USING (content_hash)
""",
        "dedup_exact": """
WITH fp AS (SELECT doc_id, md5(regexp_replace(lower(trim(coalesce(text, ''))), '\\s+', ' ', 'g')) AS fingerprint FROM documents),
grp AS (SELECT fingerprint, MIN(doc_id) AS keep_id, COUNT(*) AS group_size FROM fp GROUP BY fingerprint)
SELECT fp.doc_id, fp.fingerprint, grp.group_size, fp.doc_id = grp.keep_id AS is_kept
FROM fp JOIN grp USING (fingerprint)
""",
        "neardup_jaccard": f"""
WITH {shingle_cte},
shc AS (
  SELECT sh.doc_id, sh.shingle FROM sh
  JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000) ok
  USING (shingle)
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shc GROUP BY doc_id),
inter AS (
  SELECT s1.doc_id AS a, s2.doc_id AS b, COUNT(*) AS i
  FROM shc s1 JOIN shc s2 ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
  GROUP BY 1, 2
)
SELECT a, b, ROUND(CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
FROM inter JOIN sizes sa ON inter.a = sa.doc_id JOIN sizes sb ON inter.b = sb.doc_id
WHERE ROUND(CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i), 6) >= 0.1
""",
        "embedding_covariance": """
WITH pos AS (
  SELECT vec_id, i - 1 AS i, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i)
),
n1 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM embeddings),
mu AS (SELECT i, SUM(x) / (SELECT n FROM n1) AS mu FROM pos GROUP BY i),
cen AS (
  SELECT pos.vec_id, pos.i, pos.x - mu.mu AS cx FROM pos JOIN mu USING (i)
),
xx AS (
  SELECT p1.i AS i, p2.i AS j, SUM(p1.cx * p2.cx) AS sxy
  FROM cen p1 JOIN cen p2 ON p1.vec_id = p2.vec_id AND p1.i <= p2.i
  GROUP BY 1, 2
)
SELECT i, j, ROUND(sxy / (SELECT n FROM n1), 6) AS cov FROM xx
""",
        "pmi_cooccurrence": f"""
WITH pos0 AS (
  SELECT doc_id, i - 1 AS pos, tk[i] AS token
  FROM (SELECT doc_id, {_doc_tokens("coalesce(text,'')")} AS tk FROM documents),
       LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i)
  WHERE tk[i] <> ''
),
capf AS (SELECT token FROM pos0 GROUP BY token HAVING COUNT(*) <= 950),
pos AS (SELECT pos0.* FROM pos0 JOIN capf USING (token)),
pairs AS (
  SELECT least(p1.token, p2.token) AS a, greatest(p1.token, p2.token) AS b
  FROM pos p1 JOIN pos p2
    ON p1.doc_id = p2.doc_id AND p2.pos BETWEEN p1.pos + 1 AND p1.pos + 5
  WHERE p1.token <> p2.token
),
nab AS (SELECT a, b, COUNT(*) AS n_ab FROM pairs GROUP BY a, b),
occ AS (SELECT token, CAST(COUNT(*) AS DOUBLE) AS n FROM pos GROUP BY token),
tot AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM pos) AS n_tok,
               (SELECT CAST(COUNT(*) AS DOUBLE) FROM pairs) AS n_pair)
SELECT nab.a, nab.b, CAST(nab.n_ab AS BIGINT) AS n_ab,
       ROUND(ln((nab.n_ab / t.n_pair) / ((oa.n / t.n_tok) * (ob.n / t.n_tok))), 6) AS pmi
FROM nab JOIN occ oa ON oa.token = nab.a JOIN occ ob ON ob.token = nab.b
CROSS JOIN tot t
WHERE nab.n_ab >= 50
""",
        "neardup_dedup": f"""
WITH RECURSIVE {shingle_cte},
shc AS (
  SELECT sh.doc_id, sh.shingle FROM sh
  JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000) ok
  USING (shingle)
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shc GROUP BY doc_id),
inter AS (
  SELECT s1.doc_id AS a, s2.doc_id AS b, COUNT(*) AS i
  FROM shc s1 JOIN shc s2 ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
  GROUP BY 1, 2
),
dup AS (
  SELECT a, b FROM inter
  JOIN sizes sa ON inter.a = sa.doc_id JOIN sizes sb ON inter.b = sb.doc_id
  WHERE ROUND(CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i), 6) >= 0.1
),
sym AS (SELECT a, b FROM dup UNION SELECT b AS a, a AS b FROM dup),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
),
comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS canonical FROM reach GROUP BY a)
SELECT d.doc_id, COALESCE(c.canonical, d.doc_id) AS canonical_id,
       COALESCE(c.canonical, d.doc_id) = d.doc_id AS is_kept
FROM documents d LEFT JOIN comp c USING (doc_id)
""",
        "markov_absorption": """
WITH RECURSIVE nxt AS MATERIALIZED (
  SELECT event_type AS s,
         COALESCE(LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id), 'END') AS t
  FROM events
),
cnt AS MATERIALIZED (SELECT s, t, CAST(COUNT(*) AS DOUBLE) AS n FROM nxt GROUP BY s, t),
states AS MATERIALIZED (SELECT DISTINCT s FROM cnt WHERE s NOT IN ('purchase')),
tot AS (SELECT s, SUM(n) AS tot FROM cnt GROUP BY s),
trans AS MATERIALIZED (
  SELECT c.s, c.t, c.n / tot.tot AS p
  FROM cnt c JOIN tot USING (s) JOIN states st ON st.s = c.s
),
q AS (SELECT tr.s AS i, tr.t AS j, SUM(p) AS p
      FROM trans tr JOIN states st2 ON st2.s = tr.t GROUP BY 1, 2),
-- identity-zero rows keep every (state, target) cell alive through the
-- aggregation even when a state has no transient out-transition
qz AS MATERIALIZED (SELECT i, j, p FROM q UNION ALL SELECT s, s, 0.0 FROM states),
r AS MATERIALIZED (
  SELECT tr.s AS i,
         CASE WHEN tr.t = 'purchase' THEN 'purchase' ELSE 'END' END AS tg,
         SUM(p) AS p
  FROM trans tr ANTI JOIN states st2 ON st2.s = tr.t
  GROUP BY 1, 2
),
-- fundamental-matrix answer by fixpoint: b <- R + Q*b from b=0 converges
-- geometrically to (I-Q)^-1 R; 400 rounds puts the iterate far below the
-- 6-decimal contract for any substochastic Q this chain produces
b AS (
  SELECT 0 AS it, st.s AS i, tg.t AS tg, CAST(0 AS DOUBLE) AS p
  FROM states st CROSS JOIN (SELECT 'END' AS t UNION ALL SELECT 'purchase') tg
  UNION ALL
  SELECT s.it, s.i, s.tg, s.qp + COALESCE(r.p, 0) AS p
  FROM (
    SELECT bb.it + 1 AS it, qz.i AS i, bb.tg AS tg, SUM(qz.p * bb.p) AS qp
    FROM b bb JOIN qz ON qz.j = bb.i
    WHERE bb.it < 400
    GROUP BY 1, 2, 3
  ) s LEFT JOIN r ON r.i = s.i AND r.tg = s.tg
)
SELECT i AS state, tg AS absorbing_state, ROUND(p, 6) AS probability
FROM b WHERE it = 400
""",
        "neardup_online": f"""
WITH RECURSIVE {shingle_cte},
mh AS (
  SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS m
  FROM sh CROSS JOIN (SELECT unnest(range(32)) AS i)
  GROUP BY doc_id, i
),
bk AS (
  SELECT doc_id, i // 4 AS band, md5(string_agg(m, '|' ORDER BY i)) AS key
  FROM mh GROUP BY doc_id, i // 4
),
-- greedy-MIS rounds (the Spark op's sequential-scan simulation): a doc
-- is SAFE when it is the min remaining holder of every one of its band
-- keys; safe docs admit, docs sharing a key with them drop, repeat.
rem AS (
  SELECT 0 AS round, doc_id, band, key FROM bk
  UNION ALL
  SELECT round + 1, doc_id, band, key FROM (
    SELECT round, doc_id, band, key, safe,
           BOOL_OR(key_taken) OVER (PARTITION BY doc_id) AS conflicted
    FROM (
      SELECT round, doc_id, band, key, safe,
             BOOL_OR(safe) OVER (PARTITION BY band, key) AS key_taken
      FROM (
        SELECT round, doc_id, band, key,
               BOOL_AND(wmin = doc_id) OVER (PARTITION BY doc_id) AS safe
        FROM (
          SELECT round, doc_id, band, key,
                 MIN(doc_id) OVER (PARTITION BY band, key) AS wmin
          FROM rem
        )
      )
    )
  ) WHERE NOT safe AND NOT conflicted
),
-- a doc was admitted iff it was safe in the LAST round it survived to
-- (conflicted docs leave unsafe; rem accumulates every round's state)
perdoc AS (
  SELECT round, doc_id, BOOL_AND(wmin = doc_id) AS ok FROM (
    SELECT round, doc_id,
           MIN(doc_id) OVER (PARTITION BY round, band, key) AS wmin
    FROM rem
  ) GROUP BY round, doc_id
),
adm AS (
  SELECT p.doc_id FROM perdoc p
  JOIN (SELECT doc_id, MAX(round) AS r FROM perdoc GROUP BY doc_id) l
    ON l.doc_id = p.doc_id AND l.r = p.round
  WHERE p.ok
)
SELECT d.doc_id,
       (a.doc_id IS NOT NULL OR s.doc_id IS NULL) AS admitted
FROM documents d
LEFT JOIN adm a ON a.doc_id = d.doc_id
LEFT JOIN (SELECT DISTINCT doc_id FROM sh) s ON s.doc_id = d.doc_id
""",
        "decontaminate": f"""
WITH sh5 AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           array_to_string((tk)[i+1:i+5], ' ') AS shingle
    FROM (SELECT doc_id, {toks} AS tk FROM documents),
         LATERAL (SELECT unnest(range(0, greatest(len(tk) - 5, 0) + 1)) AS i)
  ) WHERE length(shingle) > 0
),
bsh AS (SELECT DISTINCT shingle FROM sh5 WHERE doc_id % 17 = 3),
hits AS (SELECT s.doc_id, COUNT(*) AS n_hits FROM sh5 s JOIN bsh USING (shingle) GROUP BY s.doc_id)
SELECT d.doc_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
""",
        "hash_split": _hash_split_oracle(),
        "clean_text": _clean_text_oracle(),
        "pii_mask": _pii_mask_oracle(),
        "mixture_sample": _mixture_sample_oracle(),
        "top_bigrams": f"""
WITH g AS (
  SELECT doc_id, ngram FROM (
    SELECT doc_id, array_to_string((tk)[i+1:i+2], ' ') AS ngram
    FROM (SELECT doc_id, {toks} AS tk FROM documents),
         LATERAL (SELECT unnest(range(0, greatest(len(tk) - 1, 0))) AS i)
  ) WHERE length(ngram) > 0
)
SELECT ngram, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS count
FROM g GROUP BY ngram
ORDER BY count DESC, ngram LIMIT 30
""",
        "bm25": f"""
WITH dl AS (
  SELECT doc_id,
         CAST(len(list_filter({_doc_tokens("coalesce(text,'')")}, x -> x <> '')) AS DOUBLE) AS dl
  FROM documents
),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
tok AS (
  SELECT doc_id, tok FROM (SELECT doc_id, {toks} AS tk FROM documents),
       LATERAL (SELECT unnest(tk) AS tok)
  WHERE tok IN ('join', 'spark', 'window')
),
tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
idf AS (
  SELECT tok, ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf FROM dfreq, stats
),
parts AS (
  SELECT t.doc_id,
         i.idf * (t.tf * (1.2 + 1.0))
           / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / s.avgdl)) AS part
  FROM tf t JOIN idf i USING (tok) JOIN dl d USING (doc_id), stats s
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits, ROUND(SUM(part), 6) AS bm25
FROM parts GROUP BY doc_id
""",
        "tfidf_terms": f"""
WITH t AS (
  SELECT doc_id, tok AS term FROM (SELECT doc_id, {toks} AS tk FROM documents),
       LATERAL (SELECT unnest(tk) AS tok)
  WHERE tok <> ''
),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM t GROUP BY 1, 2),
dfreq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, CAST(tf AS BIGINT) AS tf_l,
         ROUND(tf * ln(n_docs / df), 6) AS tfidf
  FROM tf JOIN dfreq USING (term), n
)
SELECT doc_id, term, tf_l AS tf, tfidf, pos FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS pos
  FROM scored
) WHERE pos <= 3
""",
        "repetition_stats": f"""
WITH tok AS (
  SELECT doc_id, tok FROM (SELECT doc_id, {toks} AS tk FROM documents),
       LATERAL (SELECT unnest(tk) AS tok)
  WHERE tok <> ''
),
tstats AS (
  SELECT doc_id, MAX(c) * 1.0 / SUM(c) AS top_token_frac, SUM(c) AS n_tokens
  FROM (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2) GROUP BY doc_id
),
g3 AS (
  SELECT doc_id, g FROM (
    SELECT doc_id, array_to_string((tk)[i+1:i+3], ' ') AS g
    FROM (SELECT doc_id, {toks} AS tk FROM documents),
         LATERAL (SELECT unnest(range(0, greatest(len(tk) - 3, 0) + 1)) AS i)
  ) WHERE length(g) > 0
),
gstats AS (
  SELECT doc_id, 1.0 - COUNT(DISTINCT g) * 1.0 / COUNT(*) AS dup_trigram_frac
  FROM g3 GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(t.n_tokens, 0) AS BIGINT) AS n_tokens,
       ROUND(COALESCE(t.top_token_frac, 0), 6) AS top_token_frac,
       ROUND(COALESCE(g.dup_trigram_frac, 0), 6) AS dup_trigram_frac
FROM documents d LEFT JOIN tstats t ON t.doc_id = d.doc_id
LEFT JOIN gstats g ON g.doc_id = d.doc_id
""",
        "duplicate_spans": f"""
WITH base AS (SELECT doc_id, {toks} AS tk, len({toks}) AS n_tokens FROM documents),
g AS (
  SELECT doc_id, i AS pos, array_to_string(tk[i+1:i+5], ' ') AS gram
  FROM (SELECT * FROM base WHERE n_tokens >= 5),
       LATERAL (SELECT unnest(range(0, n_tokens - 5 + 1)) AS i)
),
dupg AS (
  SELECT gram FROM (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY gram)
  WHERE nd >= 2
),
dp AS (SELECT g.doc_id, g.pos FROM g JOIN dupg USING (gram)),
dg AS (SELECT doc_id, COUNT(*) AS n_dup_grams FROM dp GROUP BY doc_id),
cov AS (
  SELECT doc_id, COUNT(*) AS dup_tokens FROM (
    SELECT DISTINCT doc_id, pos + j AS p
    FROM dp, LATERAL (SELECT unnest(range(0, 5)) AS j)
  ) GROUP BY doc_id
)
SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
       CAST(COALESCE(dg.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       CAST(COALESCE(cov.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       ROUND(CASE WHEN b.n_tokens > 0
                  THEN COALESCE(cov.dup_tokens, 0) * 1.0 / b.n_tokens
                  ELSE 0.0 END, 6) AS dup_frac
FROM base b LEFT JOIN dg USING (doc_id) LEFT JOIN cov USING (doc_id)
""",
        "pack_sequences": f"""
WITH t AS (SELECT doc_id, CAST(len({toks}) AS BIGINT) AS n_tokens FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
  FROM t
)
SELECT doc_id, n_tokens, CAST(start_offset AS BIGINT) AS start_offset,
       CAST(floor(start_offset / 512.0) AS BIGINT) AS bin
FROM c
""",
        "stratified_sample": """
WITH b AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS bucket
  FROM documents
)
SELECT doc_id, lang FROM b
WHERE bucket < CASE lang WHEN 'en' THEN 2147483648 WHEN 'de' THEN 1073741824 ELSE 0 END
""",
        "simhash": _simhash_oracle(),
        "embedding_neardup": _embedding_neardup_oracle(),
        "lsh_topk": _lsh_topk_oracle(),
        "knn_graph": _knn_graph_oracle(),
        "minhash_signature": f"""
WITH {shingle_cte},
mh AS (
  SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS m
  FROM sh CROSS JOIN (SELECT unnest(range(16)) AS i)
  GROUP BY doc_id, i
)
SELECT doc_id, string_agg(m, '|' ORDER BY i) AS sig_str FROM mh GROUP BY doc_id
""",
        "cosine_topk": """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_sum(list_transform(list_zip(q.qv, e.embedding),
                                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cs
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT query_id, neighbor_id, ROUND(cs, 6) AS cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY ROUND(cs, 6) DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
""",
    }
    for name, tail in quality_tail.items():
        sqls[name] = _QUALITY_PRELUDE + tail
    # composed corpus filter: the twin is literally the composition of the
    # four component twins, so the pipeline is oracle-verified end-to-end
    sqls["avg_local_cc"] = (
        "WITH base AS (" + sqls["clustering_coefficient"] + """)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
       ROUND(AVG(lcc), 6) AS avg_local_cc,
       CAST(SUM(CASE WHEN degree >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_eligible
FROM base
"""
    )
    sqls["training_set"] = f"""
WITH keep AS ({sqls["dedup_exact"]}),
lang AS ({sqls["lang_id"]}),
qual AS ({sqls["doc_quality"]}),
cont AS ({sqls["decontaminate"]})
SELECT d.doc_id, lang.lang_pred, qual.n_tokens, qual.quality_score
FROM documents d
JOIN keep ON keep.doc_id = d.doc_id
JOIN lang ON lang.doc_id = d.doc_id
JOIN qual ON qual.doc_id = d.doc_id
JOIN cont ON cont.doc_id = d.doc_id
WHERE keep.is_kept AND NOT cont.contaminated
  AND lang.lang_pred IN ('en') AND qual.quality_score >= 0.5
"""
    sqls["kmeans"] = _kmeans_oracle(k=4, iters=2)
    sqls["product_quantize"] = _pq_oracle(m=2, k=16, iters=2)
    # IVF top-k on the shared deterministic Lloyd codebook (k=8, iters=2):
    # base assignment IS the chain's final a3, probes rank c2 by (d2, cell),
    # rescoring is the cosine_topk arithmetic on probe-cell candidates only
    sqls["ivf_topk"] = _kmeans_ctes(k=8, iters=2) + """,
ivfbase AS (SELECT vec_id AS neighbor_id, cell FROM a3 WHERE rn = 1),
qd AS (
  SELECT q.vec_id AS query_id, c.cell,
         list_sum(list_transform(range(1, length(q.v) + 1),
                  i -> (q.v[i] - c.cv[i]) * (q.v[i] - c.cv[i]))) AS d2
  FROM emb q CROSS JOIN c2 c WHERE q.vec_id < 8
),
probes AS (
  SELECT query_id, cell FROM (
    SELECT query_id, cell,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, cell) AS pr
    FROM qd
  ) WHERE pr <= 2
),
cand AS (
  SELECT DISTINCT p.query_id, b.neighbor_id
  FROM probes p JOIN ivfbase b ON b.cell = p.cell
  WHERE b.neighbor_id <> p.query_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         ROUND(list_sum(list_transform(list_zip(q.v, n.v),
                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(q.v, x -> x * x)))
                  * sqrt(list_sum(list_transform(n.v, x -> x * x)))), 6) AS cos_sim
  FROM cand c JOIN emb q ON q.vec_id = c.query_id
              JOIN emb n ON n.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
"""
    # SemDeDup: composed on the SAME Lloyd CTE chain; cell-bounded pair
    # search, cos rounded to 6 BEFORE the threshold (the Spark contract)
    sqls["semantic_dedup"] = _kmeans_ctes(k=4, iters=2) + """,
asg AS (SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM a3 WHERE rn = 1),
pr AS (
  SELECT b.vec_id AS vid, a.vec_id AS dup_of,
         ROUND(
           list_sum(list_transform(list_zip(ea.embedding, eb.embedding),
                                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(ea.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
           6) AS cs
  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
       JOIN embeddings ea ON ea.vec_id = a.vec_id
       JOIN embeddings eb ON eb.vec_id = b.vec_id
),
best AS (
  SELECT vid, dup_of, cs,
         row_number() OVER (PARTITION BY vid ORDER BY cs DESC, dup_of ASC) AS rn
  FROM pr WHERE cs >= 0.8
)
SELECT asg.vec_id, asg.cell, best.dup_of, best.cs AS cos_sim,
       best.dup_of IS NOT NULL AS is_dup
FROM asg LEFT JOIN (SELECT * FROM best WHERE rn = 1) best ON asg.vec_id = best.vid
"""
    dt_cos = lambda x, y: (  # noqa: E731
        f"list_sum(list_transform(list_zip({x}, {y}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
        f" / (sqrt(list_sum(list_transform({x}, q -> CAST(q AS DOUBLE) * CAST(q AS DOUBLE))))"
        f" * sqrt(list_sum(list_transform({y}, q -> CAST(q AS DOUBLE) * CAST(q AS DOUBLE)))))"
    )
    lsa_pairs = "\n  UNION ALL ".join(
        f"SELECT a.embedding AS av, b.embedding AS bv,"
        f" CASE WHEN a.label = b.label THEN 1 ELSE 0 END AS pos"
        f" FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + {o}"
        for o in (1, 7, 41, 173)
    )
    sqls["label_separation_auc"] = f"""
WITH p AS (
  {lsa_pairs}
),
sc AS (
  SELECT pos, ROUND({dt_cos('av', 'bv')}, 6) AS cs FROM p
),
rk AS (
  SELECT pos,
         RANK() OVER (ORDER BY cs)
           + (CAST(COUNT(*) OVER (PARTITION BY cs) AS DOUBLE) - 1) / 2 AS r
  FROM sc
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(pos) AS DOUBLE) AS n_same,
         SUM(CASE WHEN pos = 1 THEN r END) AS rsum
  FROM rk
)
SELECT n_pairs, CAST(n_same AS BIGINT) AS n_same,
       CAST(n_pairs - n_same AS BIGINT) AS n_diff,
       ROUND(CASE WHEN n_same > 0 AND n_pairs - n_same > 0
             THEN (rsum - n_same * (n_same + 1) / 2) / (n_same * (n_pairs - n_same))
             END, 6) AS auc
FROM agg
"""
    def _ctopk_cte(vecexpr, name):
        return f"""
{name}_sc AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROUND({dt_cos(f'({vecexpr.format(t="q.qv")})', f'({vecexpr.format(t="e.embedding")})')}, 6) AS cs
  FROM embeddings e CROSS JOIN
       (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8) q
  WHERE e.vec_id <> q.query_id
),
{name} AS (
  SELECT query_id, neighbor_id, rnk FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rnk
    FROM {name}_sc
  ) WHERE rnk <= 10
)"""

    # composed funnel: the SAME Lloyd chain feeds the dedup cells and the
    # outlier z-scores, the full-table kNN feeds the noise flag — the
    # whole pipeline oracle-verified end-to-end (pipeline.py convention)
    sqls["embedding_curation"] = _kmeans_ctes(k=4, iters=2) + f""",
asg AS (SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM a3 WHERE rn = 1),
dpr AS (
  SELECT b.vec_id AS vid, a.vec_id AS dup_of,
         ROUND({dt_cos('ea.embedding', 'eb.embedding')}, 6) AS cs
  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
       JOIN embeddings ea ON ea.vec_id = a.vec_id
       JOIN embeddings eb ON eb.vec_id = b.vec_id
),
dupf AS (SELECT DISTINCT vid FROM dpr WHERE cs >= 0.8),
nsc AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         ROUND({dt_cos('a.embedding', 'b.embedding')}, 6) AS cs
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
ntop AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rk
    FROM nsc
  ) WHERE rk <= 10
),
nagg AS (
  SELECT t.query_id AS vec_id,
         COUNT(*) AS n_nb,
         SUM(CASE WHEN qb.label = qa.label THEN 1 ELSE 0 END) AS n_agree
  FROM ntop t JOIN embeddings qa ON qa.vec_id = t.query_id
       JOIN embeddings qb ON qb.vec_id = t.neighbor_id
  GROUP BY 1
),
odist AS (SELECT vec_id, CAST(cell AS BIGINT) AS cell, ROUND(sqrt(d2), 6) AS dist
          FROM a3 WHERE rn = 1),
ost AS (SELECT cell, AVG(dist) AS mu, STDDEV_SAMP(dist) AS sd FROM odist GROUP BY cell),
ofl AS (
  SELECT o.vec_id,
         COALESCE(CASE WHEN sd > 0 THEN (dist - mu) / sd END >= 2.0, FALSE) AS outlier
  FROM odist o JOIN ost USING (cell)
)
SELECT asg.vec_id, asg.cell,
       dupf.vid IS NOT NULL AS is_dup,
       ROUND(1 - CAST(n_agree AS DOUBLE) / n_nb, 6) >= 0.5 AS noisy,
       ofl.outlier,
       (dupf.vid IS NULL)
         AND NOT (ROUND(1 - CAST(n_agree AS DOUBLE) / n_nb, 6) >= 0.5)
         AND NOT ofl.outlier AS keep
FROM asg
LEFT JOIN dupf ON dupf.vid = asg.vec_id
JOIN nagg ON nagg.vec_id = asg.vec_id
JOIN ofl ON ofl.vec_id = asg.vec_id
"""
    sqls["sbm_graph"] = """
WITH pairs AS (
  SELECT a.i AS src, b.i AS dst
  FROM (SELECT unnest(range(0, 200)) AS i) a
  JOIN (SELECT unnest(range(0, 200)) AS i) b ON b.i > a.i
),
d AS (
  SELECT src, dst,
         ('0x' || substr(md5('7:' || src || ':' || dst), 1, 8))::BIGINT / 4294967296.0 AS u
  FROM pairs
)
SELECT CAST(src % 4 AS BIGINT) AS block_src, CAST(dst % 4 AS BIGINT) AS block_dst,
       CAST(COUNT(*) AS BIGINT) AS n_edges
FROM d
WHERE u < CASE WHEN src % 4 = dst % 4 THEN 0.3 ELSE 0.02 END
GROUP BY 1, 2
"""
    sqls["mixing_parameter"] = _QUALITY_PRELUDE + """,
sym AS (SELECT src AS a, dst AS b, weight FROM edges
        UNION ALL SELECT dst, src, weight FROM edges),
dec AS (
  SELECT s.a AS name, s.weight AS w,
         CASE WHEN v1.comm <> v2.comm THEN s.weight ELSE 0 END AS w_ext
  FROM sym s JOIN verts v1 ON s.a = v1.name JOIN verts v2 ON s.b = v2.name
),
vagg AS (SELECT name, SUM(w) AS strength, SUM(w_ext) AS w_external FROM dec GROUP BY name)
SELECT v.comm, ROUND(strength, 6) AS strength, ROUND(w_external, 6) AS w_external,
       ROUND(CASE WHEN strength > 0 THEN w_external / strength END, 6) AS mu
FROM vagg a JOIN verts v ON a.name = v.name
"""
    sqls["session_entries_exits"] = """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(epoch(ts)) OVER w IS NULL
                   OR epoch(ts) - lag(epoch(ts)) OVER w > 7200.0
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
),
fl AS (
  SELECT event_type AS label,
         CASE WHEN row_number() OVER (PARTITION BY user_id, sid ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS is_entry,
         CASE WHEN row_number() OVER (PARTITION BY user_id, sid ORDER BY ts DESC, event_id DESC) = 1
              THEN 1 ELSE 0 END AS is_exit,
         CASE WHEN COUNT(*) OVER (PARTITION BY user_id, sid) = 1 THEN 1 ELSE 0 END AS is_single
  FROM sess
),
agg AS (
  SELECT label, CAST(SUM(is_entry) AS BIGINT) AS n_entries,
         CAST(SUM(is_exit) AS BIGINT) AS n_exits,
         CAST(SUM(is_entry * is_single) AS BIGINT) AS n_bounces
  FROM fl GROUP BY label
),
tot AS (SELECT SUM(n_entries) AS n_sessions FROM agg)
SELECT label, n_entries, n_exits, n_bounces,
       ROUND(CAST(n_entries AS DOUBLE) / n_sessions, 6) AS entry_share,
       ROUND(CAST(n_exits AS DOUBLE) / n_sessions, 6) AS exit_share
FROM agg CROSS JOIN tot
"""
    elbow_parts = "\nUNION ALL\n".join(
        f"""SELECT * FROM (
{_kmeans_ctes(k, 2)}
SELECT {k} AS k, CAST(COUNT(*) AS BIGINT) AS n_vectors,
       ROUND(SUM(POWER(ROUND(sqrt(d2), 6), 2)), 6) AS inertia,
       ROUND(AVG(ROUND(sqrt(d2), 6)), 6) AS mean_dist
FROM a3 WHERE rn = 1
)"""
        for k in (2, 4, 8)
    )
    sqls["kmeans_elbow"] = elbow_parts + "\nORDER BY k"
    sqls["heavy_user_share"] = """
WITH cnt AS (SELECT user_id AS k2, COUNT(*) AS n FROM events GROUP BY user_id),
rkd AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, k2) AS rk,
         SUM(n) OVER (ORDER BY n DESC, k2 ROWS UNBOUNDED PRECEDING) AS cum
  FROM cnt
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users, SUM(n) AS n_events FROM rkd),
ps AS (SELECT CAST(unnest([0.01, 0.05, 0.10]) AS DOUBLE) AS pct),
px AS (
  SELECT pct, CAST(CEIL(pct * n_users) AS BIGINT) AS n_top_users, n_users, n_events
  FROM ps CROSS JOIN tot
)
SELECT pct, n_top_users, n_users,
       ROUND(CAST(cum AS DOUBLE) / n_events, 6) AS share
FROM px JOIN rkd ON rkd.rk = px.n_top_users ORDER BY pct
"""
    sqls["table_expectations"] = """
WITH base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN event_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_eid,
         CAST(SUM(CASE WHEN ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_ts,
         CAST(SUM(CASE WHEN COALESCE(value >= 0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS c_val,
         CAST(SUM(CASE WHEN COALESCE(length(event_type) > 0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS c_typ
  FROM events
),
st AS (
  SELECT 'event_id_not_null' AS rule, n_rows, c_eid AS n_pass FROM base
  UNION ALL SELECT 'ts_not_null', n_rows, c_ts FROM base
  UNION ALL SELECT 'value_nonneg', n_rows, c_val FROM base
  UNION ALL SELECT 'type_nonempty', n_rows, c_typ FROM base
)
SELECT rule, n_rows, n_pass,
       ROUND(CASE WHEN n_rows > 0 THEN CAST(n_pass AS DOUBLE) / n_rows END, 6) AS pass_rate,
       n_pass = n_rows AS ok
FROM st ORDER BY rule
"""
    sqls["referential_integrity"] = """
WITH pk AS (SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderkey IS NOT NULL),
j AS (SELECT l.l_orderkey AS ck, pk.k AS pkk FROM lineitem l LEFT JOIN pk ON l.l_orderkey = pk.k)
SELECT CAST(COUNT(*) AS BIGINT) AS n_child,
       CAST(SUM(CASE WHEN ck IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_key,
       CAST(SUM(CASE WHEN ck IS NOT NULL AND pkk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan,
       ROUND(CASE WHEN COUNT(*) > 0
             THEN CAST(SUM(CASE WHEN ck IS NOT NULL AND pkk IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             END, 6) AS orphan_rate,
       SUM(CASE WHEN ck IS NOT NULL AND pkk IS NULL THEN 1 ELSE 0 END) = 0 AS ok
FROM j
"""
    sqls["population_stability"] = """
WITH span AS (
  SELECT (epoch_us(MIN(ts)) / 1e6 + epoch_us(MAX(ts)) / 1e6) / 2.0 AS mid FROM events
),
h AS (
  SELECT event_type AS lbl,
         CASE WHEN epoch_us(ts) / 1e6 >= mid THEN 1 ELSE 0 END AS half
  FROM events CROSS JOIN span
),
cnt AS (SELECT lbl, SUM(1 - half) AS n1, SUM(half) AS n2 FROM h GROUP BY lbl),
tot AS (SELECT SUM(n1) AS t1, SUM(n2) AS t2 FROM cnt),
per AS (
  SELECT lbl,
         ROUND(CAST(n1 AS DOUBLE) / t1, 6) AS p_first,
         ROUND(CAST(n2 AS DOUBLE) / t2, 6) AS p_second,
         ROUND((GREATEST(CAST(n2 AS DOUBLE) / t2, 1e-6) - GREATEST(CAST(n1 AS DOUBLE) / t1, 1e-6))
               * ln(GREATEST(CAST(n2 AS DOUBLE) / t2, 1e-6)
                    / GREATEST(CAST(n1 AS DOUBLE) / t1, 1e-6)), 6) AS psi
  FROM cnt CROSS JOIN tot
)
SELECT lbl AS event_type, p_first, p_second, psi FROM per
UNION ALL
SELECT NULL, ROUND(SUM(p_first), 6), ROUND(SUM(p_second), 6), ROUND(SUM(psi), 6) FROM per
"""
    sqls["retrieval_ndcg"] = f"""
WITH q AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 200),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         ROUND({dt_cos('a.embedding', 'b.embedding')}, 6) AS cs
  FROM q a JOIN q b ON a.vec_id <> b.vec_id
),
top AS (
  SELECT query_id, neighbor_id, rk FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rk
    FROM scored
  ) WHERE rk <= 10
),
dcg AS (
  SELECT t.query_id,
         SUM(CASE WHEN qb.label = qa.label THEN 1.0 / log2(t.rk + 1.0) ELSE 0 END) AS dcg
  FROM top t JOIN q qa ON qa.vec_id = t.query_id JOIN q qb ON qb.vec_id = t.neighbor_id
  GROUP BY 1
),
ln_ AS (SELECT label, COUNT(*) AS n_l FROM q GROUP BY label),
sz AS (SELECT q.vec_id AS query_id, n_l - 1 AS n_rel FROM q JOIN ln_ USING (label)),
cum AS (
  SELECT i, SUM(1.0 / log2(i + 1.0)) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS idcg
  FROM (SELECT unnest(range(1, 11)) AS i)
),
per AS (
  SELECT d.query_id, d.dcg / c.idcg AS ndcg
  FROM dcg d JOIN sz USING (query_id) JOIN cum c ON LEAST(sz.n_rel, 10) = c.i
  WHERE sz.n_rel >= 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, CAST(10 AS INTEGER) AS k,
       ROUND(AVG(ndcg), 6) AS mean_ndcg
FROM per
"""
    sqls["decayed_edges"] = """
WITH t AS (
  SELECT event_type, ts,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
h AS (SELECT MAX(ts) AS horizon FROM events)
SELECT prev_type AS src_name, event_type AS dst_name,
       ROUND(SUM(POWER(2.0, -((epoch_us(horizon) - epoch_us(ts)) / 1e6) / 604800.0)), 6) AS weight,
       CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM t CROSS JOIN h WHERE prev_type IS NOT NULL GROUP BY 1, 2
"""
    sqls["disparate_impact"] = """
WITH g AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT) AS n_positive
  FROM documents GROUP BY source
),
r AS (SELECT *, ROUND(CAST(n_positive AS DOUBLE) / n, 6) AS rate FROM g),
mx AS (SELECT MAX(rate) AS max_rate FROM r)
SELECT source, n, n_positive, rate,
       ROUND(CASE WHEN max_rate > 0 THEN rate / max_rate END, 6) AS impact_ratio,
       COALESCE(CASE WHEN max_rate > 0 THEN rate / max_rate END < 0.8, FALSE) AS adverse
FROM r CROSS JOIN mx
"""
    sqls["rrf_fuse"] = f"""
WITH {_ctopk_cte('{t}', 'full_rank').strip().rstrip()},
{_ctopk_cte('({t})[1:8]', 'short_rank').strip()},
u AS (
  SELECT query_id, neighbor_id, 1.0 / (60 + rnk) AS sc FROM full_rank
  UNION ALL
  SELECT query_id, neighbor_id, 1.0 / (60 + rnk) AS sc FROM short_rank
),
fused AS (
  SELECT query_id, neighbor_id, ROUND(SUM(sc), 6) AS rrf_score
  FROM u GROUP BY 1, 2
)
SELECT query_id, neighbor_id, rrf_score, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_score DESC, neighbor_id) AS rank
  FROM fused
) WHERE rank <= 10
"""
    sqls["nestedness"] = f"""
WITH {_DET_PRELUDE.strip()},
su AS (SELECT DISTINCT src AS node, dst AS anchor FROM edges),
sv AS (SELECT DISTINCT dst AS node, src AS anchor FROM edges),
du AS (SELECT node, CAST(COUNT(*) AS DOUBLE) AS d FROM su GROUP BY node),
dv AS (SELECT node, CAST(COUNT(*) AS DOUBLE) AS d FROM sv GROUP BY node),
ovu AS (
  SELECT l.node AS u, r.node AS v, CAST(COUNT(*) AS DOUBLE) AS ov
  FROM su l JOIN su r ON l.anchor = r.anchor AND l.node <> r.node GROUP BY 1, 2
),
ovv AS (
  SELECT l.node AS u, r.node AS v, CAST(COUNT(*) AS DOUBLE) AS ov
  FROM sv l JOIN sv r ON l.anchor = r.anchor AND l.node <> r.node GROUP BY 1, 2
),
ssrc AS (
  SELECT COALESCE(SUM(ov / b.d), 0) AS s FROM ovu
  JOIN du a ON a.node = ovu.u JOIN du b ON b.node = ovu.v WHERE a.d > b.d
),
sdst AS (
  SELECT COALESCE(SUM(ov / b.d), 0) AS s FROM ovv
  JOIN dv a ON a.node = ovv.u JOIN dv b ON b.node = ovv.v WHERE a.d > b.d
),
ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM du),
nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM dv)
SELECT ROUND(100 * (ssrc.s + sdst.s)
             / (ns.n * (ns.n - 1) / 2 + nd.n * (nd.n - 1) / 2), 6) AS nodf,
       ROUND(CASE WHEN ns.n > 1 THEN 100 * ssrc.s / (ns.n * (ns.n - 1) / 2) END, 6) AS nodf_src,
       ROUND(CASE WHEN nd.n > 1 THEN 100 * sdst.s / (nd.n * (nd.n - 1) / 2) END, 6) AS nodf_dst,
       CAST(ns.n AS BIGINT) AS n_src, CAST(nd.n AS BIGINT) AS n_dst
FROM ssrc CROSS JOIN sdst CROSS JOIN ns CROSS JOIN nd
"""
    sqls["winnowing"] = f"""
WITH pos AS (
  SELECT doc_id, i AS pos,
         ('0x' || substr(md5(array_to_string((tk)[i+1:i+5], ' ')), 1, 8))::BIGINT AS h
  FROM (SELECT doc_id, {toks} AS tk FROM documents),
       LATERAL (SELECT unnest(range(0, greatest(len(tk) - 5, 0) + 1)) AS i)
  WHERE length(array_to_string((tk)[i+1:i+5], ' ')) > 0
),
sel AS (
  SELECT doc_id, pos,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_kg
  FROM pos
),
fp AS (SELECT DISTINCT doc_id, wmin AS fp FROM sel WHERE pos <= greatest(n_kg - 4, 0)),
keepfp AS (SELECT fp FROM (SELECT fp, COUNT(*) AS nf FROM fp GROUP BY fp) WHERE nf <= 1000),
f2 AS (SELECT doc_id, fp FROM fp WHERE fp IN (SELECT fp FROM keepfp))
SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM f2 l JOIN f2 r ON l.fp = r.fp AND l.doc_id < r.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= 2
"""
    sqls["simrank"] = f"""
WITH {_DET_PRELUDE.strip()},
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
s AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
deg AS (SELECT a AS id, CAST(COUNT(*) AS DOUBLE) AS d FROM s GROUP BY a),
common AS (
  SELECT l.a AS x, r.a AS y, CAST(COUNT(*) AS DOUBLE) AS cnt
  FROM s l JOIN s r ON l.b = r.b AND l.a <> r.a GROUP BY 1, 2
),
p1 AS (
  SELECT x, y, 0.8 * cnt / (dx.d * dy.d) AS sv
  FROM common JOIN deg dx ON dx.id = x JOIN deg dy ON dy.id = y
),
off AS (
  SELECT ex.b AS x, ey.b AS y, SUM(sv) AS s_off
  FROM p1 JOIN s ex ON ex.a = p1.x JOIN s ey ON ey.a = p1.y
  WHERE ex.b <> ey.b GROUP BY 1, 2
),
s2 AS (
  SELECT x, y,
         0.8 * (COALESCE(o.s_off, 0) + COALESCE(c.cnt, 0)) / (dx.d * dy.d) AS sv
  FROM common c FULL JOIN off o USING (x, y)
  JOIN deg dx ON dx.id = x JOIN deg dy ON dy.id = y
)
SELECT x AS src, y AS dst, ROUND(sv, 6) AS simrank
FROM s2 WHERE x < y AND ROUND(sv, 6) > 0
"""
    sqls["bipartite_newman"] = f"""
WITH {_DET_PRELUDE.strip()},
e AS (SELECT dst AS anchor, src AS node FROM edges),
nd AS (SELECT anchor, CAST(COUNT(*) AS DOUBLE) AS d FROM e GROUP BY anchor),
p AS (
  SELECT l.node AS a, r.node AS b, nd.d
  FROM e l JOIN e r ON l.anchor = r.anchor AND l.node < r.node
  JOIN nd ON nd.anchor = l.anchor
  WHERE nd.d > 1
)
SELECT a AS src, b AS dst, ROUND(SUM(1.0 / (d - 1)), 6) AS weight
FROM p GROUP BY 1, 2
"""
    sqls["attribution"] = """
WITH conv AS (
  SELECT DISTINCT user_id AS k, epoch_us(ts) / 1e6 AS ct
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id AS k, epoch_us(ts) / 1e6 AS tt, event_type AS lbl
  FROM events WHERE event_type <> 'purchase'
),
paired AS (
  SELECT c.k, c.ct, t.lbl
  FROM conv c JOIN touch t ON t.k = c.k AND t.tt < c.ct AND t.tt >= c.ct - 86400.0
),
scored AS (
  SELECT k, ct, lbl, 1.0 / COUNT(*) OVER (PARTITION BY k, ct) AS credit FROM paired
),
unat AS (
  SELECT c.k, c.ct, NULL AS lbl, 1.0 AS credit
  FROM conv c ANTI JOIN (SELECT DISTINCT k, ct FROM paired) p
       ON p.k = c.k AND p.ct = c.ct
)
SELECT lbl AS label,
       CAST(COUNT(DISTINCT (k, ct)) AS BIGINT) AS n_conversions_touched,
       ROUND(SUM(credit), 6) AS credit
FROM (SELECT * FROM scored UNION ALL SELECT * FROM unat) GROUP BY lbl
"""
    dt_rows = "\n  UNION ALL ".join(
        f"SELECT {d} AS dim, ROUND({dt_cos('av', 'bv')}, 6) AS cf,"
        f" ROUND({dt_cos(f'av[1:{d}]', f'bv[1:{d}]')}, 6) AS ct FROM p"
        for d in (8, 16, 32)
    )
    dt_pairs = "\n  UNION ALL ".join(
        f"SELECT a.embedding AS av, b.embedding AS bv FROM embeddings a"
        f" JOIN embeddings b ON b.vec_id = a.vec_id + {o}"
        for o in (1, 7, 41, 173)
    )
    sqls["dim_truncation"] = f"""
WITH p AS (
  {dt_pairs}
),
sc AS (
  {dt_rows}
),
agg AS (
  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         AVG(cf) AS mf, AVG(ct) AS mt, AVG(cf * ct) AS mft,
         AVG(cf * cf) AS mff, AVG(ct * ct) AS mtt,
         AVG(ABS(cf - ct)) AS mae
  FROM sc GROUP BY dim
)
SELECT CAST(dim AS BIGINT) AS dim, n_pairs,
       ROUND(CASE WHEN (mff - mf * mf) > 0 AND (mtt - mt * mt) > 0
             THEN (mft - mf * mt) / SQRT((mff - mf * mf) * (mtt - mt * mt))
             END, 6) AS pearson_r,
       ROUND(mae, 6) AS mae
FROM agg ORDER BY dim
"""
    sqls["session_concurrency"] = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(epoch(ts)) OVER w IS NULL
                   OR epoch(ts) - lag(epoch(ts)) OVER w > 7200.0
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) - 1 AS session_ord
  FROM marked
),
stbl AS (
  SELECT user_id, session_ord, MIN(ts) AS s, MAX(ts) AS e
  FROM sess GROUP BY user_id, session_ord
),
b AS (
  SELECT t, CAST(SUM(d) AS BIGINT) AS n_delta FROM (
    SELECT s AS t, 1 AS d FROM stbl UNION ALL SELECT e, -1 FROM stbl
  ) GROUP BY t
)
SELECT t, n_delta,
       CAST(SUM(n_delta) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS concurrent
FROM b
"""
    sqls["leadlag_correlation"] = """
WITH cnt AS (
  SELECT event_type AS lbl, date_trunc('day', ts) AS b, CAST(COUNT(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
),
span AS (SELECT MIN(b) AS lo, MAX(b) AS hi FROM cnt),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS b FROM span
),
lbls AS (SELECT DISTINCT lbl FROM cnt),
dense AS (
  SELECT l.lbl, g.b, COALESCE(c.x, 0.0) AS x
  FROM grid g CROSS JOIN lbls l LEFT JOIN cnt c ON c.lbl = l.lbl AND c.b = g.b
),
lags AS (SELECT unnest([0, 1, 2, 3]) AS lag),
j AS (
  SELECT a.lbl AS label_a, bb.lbl AS label_b, lags.lag, a.x AS xa, bb.x AS xb
  FROM dense a CROSS JOIN lags
  JOIN dense bb ON bb.b = a.b + lags.lag * INTERVAL 1 DAY
),
agg AS (
  SELECT label_a, label_b, lag, CAST(COUNT(*) AS BIGINT) AS n_buckets,
         AVG(xa) AS ma, AVG(xb) AS mb, AVG(xa * xb) AS mab,
         AVG(xa * xa) AS maa, AVG(xb * xb) AS mbb
  FROM j GROUP BY 1, 2, 3
)
SELECT label_a, label_b, CAST(lag AS BIGINT) AS lag, n_buckets,
       ROUND(CASE WHEN (maa - ma * ma) > 0 AND (mbb - mb * mb) > 0
             THEN (mab - ma * mb) / SQRT((maa - ma * ma) * (mbb - mb * mb))
             END, 6) AS r
FROM agg
"""
    sqls["landmark_distances"] = f"""
WITH {_DET_PRELUDE.strip()},
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
s AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
lms AS (
  SELECT id AS lm FROM (
    SELECT id, ('0x' || substr(md5('lm:' || CAST(id AS VARCHAR)), 1, 8))::BIGINT AS pri
    FROM verts
  ) ORDER BY pri, id LIMIT 4
),
c0 AS (SELECT lm, lm AS id, 0 AS dist FROM lms),
n1 AS (SELECT DISTINCT c0.lm, s.b AS id FROM c0 JOIN s ON s.a = c0.id),
d1 AS (SELECT n1.lm, n1.id, 1 AS dist FROM n1 ANTI JOIN c0 ON c0.lm = n1.lm AND c0.id = n1.id),
c1 AS (SELECT * FROM c0 UNION ALL SELECT * FROM d1),
n2 AS (SELECT DISTINCT d1.lm, s.b AS id FROM d1 JOIN s ON s.a = d1.id),
d2 AS (SELECT n2.lm, n2.id, 2 AS dist FROM n2 ANTI JOIN c1 ON c1.lm = n2.lm AND c1.id = n2.id),
c2 AS (SELECT * FROM c1 UNION ALL SELECT * FROM d2),
n3 AS (SELECT DISTINCT d2.lm, s.b AS id FROM d2 JOIN s ON s.a = d2.id),
d3 AS (SELECT n3.lm, n3.id, 3 AS dist FROM n3 ANTI JOIN c2 ON c2.lm = n3.lm AND c2.id = n3.id),
c3 AS (SELECT * FROM c2 UNION ALL SELECT * FROM d3)
SELECT id, lm AS landmark, CAST(dist AS BIGINT) AS dist FROM c3
"""
    sqls["interarrival_ks"] = """
WITH g AS (
  SELECT user_id,
         (epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts))) / 1e6 AS gap
  FROM events
),
g2 AS (SELECT * FROM g WHERE gap IS NOT NULL),
st AS (
  SELECT user_id, COUNT(*) AS n_gaps, AVG(gap) AS mean_gap
  FROM g2 GROUP BY user_id HAVING COUNT(*) >= 5
),
r AS (
  SELECT g2.user_id, gap, n_gaps, mean_gap,
         row_number() OVER (PARTITION BY g2.user_id ORDER BY gap) AS i
  FROM g2 JOIN st USING (user_id)
),
d AS (
  SELECT user_id, n_gaps, mean_gap,
         GREATEST(CAST(i AS DOUBLE) / n_gaps - f, f - (CAST(i AS DOUBLE) - 1) / n_gaps) AS dev
  FROM (SELECT *, CASE WHEN mean_gap > 0 THEN 1 - exp(-gap / mean_gap) ELSE 1.0 END AS f FROM r)
)
SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
       ROUND(mean_gap, 6) AS mean_gap_s, ROUND(MAX(dev), 6) AS ks_stat
FROM d GROUP BY user_id, n_gaps, mean_gap
"""
    sqls["t_closeness"] = """
WITH tcg AS (
  SELECT event_type, COUNT(*) * 1.0 / (SELECT COUNT(*) FROM events) AS p_g
  FROM events GROUP BY event_type
),
tcc AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
         CAST(COUNT(*) AS DOUBLE) AS n_vs
  FROM events GROUP BY 1, 2
),
tcs AS (SELECT day, SUM(n_vs) AS class_size FROM tcc GROUP BY day),
tcd AS (
  SELECT c.day, s.class_size,
         SUM(ABS(c.n_vs / s.class_size - g.p_g)) AS dev_in,
         SUM(g.p_g) AS mass_in
  FROM tcc c JOIN tcs s USING (day) JOIN tcg g USING (event_type)
  GROUP BY c.day, s.class_size
)
SELECT day, CAST(class_size AS BIGINT) AS class_size,
       ROUND(0.5 * (dev_in + 1.0 - mass_in), 6) AS tvd,
       (ROUND(0.5 * (dev_in + 1.0 - mass_in), 6) <= 0.2) AS meets_t
FROM tcd ORDER BY day
"""
    sqls["temporal_pagerank"] = """
WITH tpt AS (
  SELECT event_type, ts,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
tph AS (SELECT MAX(ts) AS horizon FROM events),
tpde AS (
  -- ROUND(...,6) mirrors events_to_decayed_edges (edges.py) exactly: the
  -- Spark side feeds 6-decimal weights into pagerank, and unrounded decay
  -- sums differ at ~1e-6 relative — enough to flip 6-decimal rank hashes
  SELECT prev_type AS src_name, event_type AS dst_name,
         ROUND(SUM(POWER(2.0, -((epoch_us(horizon) - epoch_us(ts)) / 1e6) / 604800.0)), 6) AS weight
  FROM tpt CROSS JOIN tph WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
tpnames AS (
  SELECT name, ROW_NUMBER() OVER (ORDER BY name) AS nid
  FROM (SELECT DISTINCT src_name AS name FROM tpde UNION SELECT DISTINCT dst_name FROM tpde)
),
tpe AS (
  SELECT a.nid AS src, b.nid AS dst, e.weight
  FROM tpde e JOIN tpnames a ON a.name = e.src_name JOIN tpnames b ON b.name = e.dst_name
),
tpsym AS (SELECT src, dst, weight FROM tpe UNION ALL SELECT dst, src, weight FROM tpe),
tpverts AS (SELECT DISTINCT src AS id FROM tpsym),
tpoutw AS (SELECT src, SUM(weight) AS w FROM tpsym GROUP BY src),
tplinks AS (SELECT s.src, s.dst, s.weight / o.w AS share FROM tpsym s JOIN tpoutw o ON s.src = o.src),
tpnn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tpverts),
tpr0 AS (SELECT id, 1.0 / (SELECT n FROM tpnn) AS rank FROM tpverts),
tpr1 AS (
  SELECT v.id, 0.15 / (SELECT n FROM tpnn) + 0.85 * COALESCE(t.c, 0) AS rank
  FROM tpverts v LEFT JOIN (
    SELECT l.dst AS id, SUM(l.share * r.rank) AS c
    FROM tplinks l JOIN tpr0 r ON r.id = l.src GROUP BY l.dst
  ) t ON t.id = v.id
),
tpr2 AS (
  SELECT v.id, 0.15 / (SELECT n FROM tpnn) + 0.85 * COALESCE(t.c, 0) AS rank
  FROM tpverts v LEFT JOIN (
    SELECT l.dst AS id, SUM(l.share * r.rank) AS c
    FROM tplinks l JOIN tpr1 r ON r.id = l.src GROUP BY l.dst
  ) t ON t.id = v.id
),
tpr3 AS (
  SELECT v.id, 0.15 / (SELECT n FROM tpnn) + 0.85 * COALESCE(t.c, 0) AS rank
  FROM tpverts v LEFT JOIN (
    SELECT l.dst AS id, SUM(l.share * r.rank) AS c
    FROM tplinks l JOIN tpr2 r ON r.id = l.src GROUP BY l.dst
  ) t ON t.id = v.id
),
tpr4 AS (
  SELECT v.id, 0.15 / (SELECT n FROM tpnn) + 0.85 * COALESCE(t.c, 0) AS rank
  FROM tpverts v LEFT JOIN (
    SELECT l.dst AS id, SUM(l.share * r.rank) AS c
    FROM tplinks l JOIN tpr3 r ON r.id = l.src GROUP BY l.dst
  ) t ON t.id = v.id
),
tpr5 AS (
  SELECT v.id, 0.15 / (SELECT n FROM tpnn) + 0.85 * COALESCE(t.c, 0) AS rank
  FROM tpverts v LEFT JOIN (
    SELECT l.dst AS id, SUM(l.share * r.rank) AS c
    FROM tplinks l JOIN tpr4 r ON r.id = l.src GROUP BY l.dst
  ) t ON t.id = v.id
),
tpr6 AS (
  SELECT v.id, 0.15 / (SELECT n FROM tpnn) + 0.85 * COALESCE(t.c, 0) AS rank
  FROM tpverts v LEFT JOIN (
    SELECT l.dst AS id, SUM(l.share * r.rank) AS c
    FROM tplinks l JOIN tpr5 r ON r.id = l.src GROUP BY l.dst
  ) t ON t.id = v.id
),
tpr7 AS (
  SELECT v.id, 0.15 / (SELECT n FROM tpnn) + 0.85 * COALESCE(t.c, 0) AS rank
  FROM tpverts v LEFT JOIN (
    SELECT l.dst AS id, SUM(l.share * r.rank) AS c
    FROM tplinks l JOIN tpr6 r ON r.id = l.src GROUP BY l.dst
  ) t ON t.id = v.id
),
tpr8 AS (
  SELECT v.id, 0.15 / (SELECT n FROM tpnn) + 0.85 * COALESCE(t.c, 0) AS rank
  FROM tpverts v LEFT JOIN (
    SELECT l.dst AS id, SUM(l.share * r.rank) AS c
    FROM tplinks l JOIN tpr7 r ON r.id = l.src GROUP BY l.dst
  ) t ON t.id = v.id
)
SELECT n.name, ROUND(r.rank, 6) AS rank
FROM tpr8 r JOIN tpnames n ON n.nid = r.id ORDER BY name
"""
    sqls["media_neardup"] = """
WITH mbh AS (
  SELECT doc_id, lower(hex(CAST(COALESCE(text, '') AS BLOB))) AS hx FROM documents
),
mbsh AS (
  SELECT DISTINCT doc_id, substr(hx, i * 2 + 1, 16) AS shingle
  FROM mbh, LATERAL (SELECT unnest(range(0, greatest((length(hx) - 16) // 2, 0) + 1)) AS i)
  WHERE length(substr(hx, i * 2 + 1, 16)) > 0
),
mbmh AS (
  SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS m
  FROM mbsh CROSS JOIN (SELECT unnest(range(16)) AS i) GROUP BY doc_id, i
),
mbband AS (
  SELECT doc_id, i // 4 AS bd, md5(string_agg(m, '|' ORDER BY i)) AS key
  FROM mbmh GROUP BY doc_id, i // 4
),
mbcand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM mbband x JOIN mbband y ON x.bd = y.bd AND x.key = y.key AND x.doc_id < y.doc_id
),
mbsz AS (SELECT doc_id, COUNT(*) AS n FROM mbsh GROUP BY doc_id),
mbint AS (
  SELECT c.a, c.b, CAST(COUNT(*) AS DOUBLE) AS ni
  FROM mbcand c
  JOIN mbsh sa ON sa.doc_id = c.a
  JOIN mbsh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
  GROUP BY c.a, c.b
)
SELECT a, b, ROUND(ni / (za.n + zb.n - ni), 6) AS jaccard
FROM mbint JOIN mbsz za ON za.doc_id = a JOIN mbsz zb ON zb.doc_id = b
WHERE ROUND(ni / (za.n + zb.n - ni), 6) >= 0.5
ORDER BY a, b
"""
    sqls["assortativity_directed"] = f"""
WITH {_DET_PRELUDE.strip()},
ade AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
adout AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS dout FROM ade GROUP BY src),
adin AS (SELECT dst, CAST(COUNT(*) AS DOUBLE) AS din FROM ade GROUP BY dst),
adp AS (
  SELECT o.dout, i.din FROM ade e JOIN adout o ON o.src = e.src JOIN adin i ON i.dst = e.dst
)
SELECT ROUND(CASE WHEN stddev_pop(dout) > 0 AND stddev_pop(din) > 0
       THEN covar_pop(dout, din) / (stddev_pop(dout) * stddev_pop(din)) END, 6) AS assortativity
FROM adp
"""
    sqls["l_diversity"] = """
SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(COUNT(*) AS BIGINT) AS class_size,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_sensitive,
       COUNT(DISTINCT user_id) >= 5 AS meets_l
FROM events GROUP BY 1, 2
"""
    sqls["source_minhash_overlap"] = f"""
WITH {shingle_cte.strip().lstrip(",").strip()},
ss AS (
  SELECT DISTINCT d.source,
         ('0x' || substr(md5(sh.shingle), 1, 8))::BIGINT AS h
  FROM sh JOIN documents d USING (doc_id)
),
sk AS (
  SELECT source, h FROM (
    SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rk FROM ss
  ) WHERE rk <= 128
),
ps AS (
  SELECT a.source AS source_a, b.source AS source_b
  FROM (SELECT DISTINCT source FROM sk) a, (SELECT DISTINCT source FROM sk) b
  WHERE a.source < b.source
),
m AS (
  SELECT source_a, source_b, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b FROM (
    SELECT ps.source_a, ps.source_b, sk.h, 1 AS in_a, 0 AS in_b
    FROM ps JOIN sk ON sk.source = ps.source_a
    UNION ALL
    SELECT ps.source_a, ps.source_b, sk.h, 0, 1
    FROM ps JOIN sk ON sk.source = ps.source_b
  ) GROUP BY 1, 2, 3
),
u AS (
  SELECT *, row_number() OVER (PARTITION BY source_a, source_b ORDER BY h) AS rk FROM m
)
SELECT source_a, source_b,
       CAST(COUNT(*) AS BIGINT) AS k_used,
       CAST(SUM(in_a * in_b) AS BIGINT) AS n_inter,
       ROUND(CAST(SUM(in_a * in_b) AS DOUBLE) / COUNT(*), 6) AS est_jaccard
FROM u WHERE rk <= 128 GROUP BY 1, 2
"""
    sqls["effective_diameter"] = f"""
WITH {_DET_PRELUDE.strip()},
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
s AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
r1 AS (SELECT a AS id, b AS v FROM s),
r2 AS (SELECT DISTINCT id, v FROM (
  SELECT * FROM r1
  UNION ALL SELECT r1.id, s.b FROM r1 JOIN s ON s.a = r1.v WHERE s.b <> r1.id)),
r3 AS (SELECT DISTINCT id, v FROM (
  SELECT * FROM r2
  UNION ALL SELECT r2.id, s.b FROM r2 JOIN s ON s.a = r2.v WHERE s.b <> r2.id)),
nf AS (
  SELECT 1 AS dist, (SELECT CAST(COUNT(*) AS DOUBLE) FROM r1) AS np
  UNION ALL SELECT 2, (SELECT CAST(COUNT(*) AS DOUBLE) FROM r2)
  UNION ALL SELECT 3, (SELECT CAST(COUNT(*) AS DOUBLE) FROM r3)
),
tot AS (SELECT MAX(np) AS mx FROM nf),
pick AS (SELECT MIN(dist) AS d FROM nf CROSS JOIN tot WHERE np >= 0.9 * mx),
eff AS (
  SELECT ROUND(CASE WHEN cur > prev
               THEN (d - 1) + (0.9 * mx - prev) / (cur - prev)
               ELSE CAST(d AS DOUBLE) END, 6) AS ed
  FROM pick CROSS JOIN tot
  CROSS JOIN LATERAL (
    SELECT (SELECT np FROM nf WHERE dist = d) AS cur,
           COALESCE((SELECT np FROM nf WHERE dist = d - 1), 0) AS prev
  )
)
SELECT CAST(nf.dist AS BIGINT) AS dist, CAST(np AS BIGINT) AS n_pairs,
       ROUND(np / mx, 6) AS frac, ed AS effective_diameter
FROM nf CROSS JOIN tot CROSS JOIN eff ORDER BY dist
"""
    sqls["knn_label_noise"] = """
WITH q AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 200),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         ROUND(
           list_sum(list_transform(list_zip(a.embedding, b.embedding),
                                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
           6) AS cs
  FROM q a JOIN q b ON a.vec_id <> b.vec_id
),
top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rk
    FROM scored
  ) WHERE rk <= 10
),
agg AS (
  SELECT t.query_id AS vec_id, qa.label,
         CAST(COUNT(*) AS BIGINT) AS n_neighbors,
         CAST(SUM(CASE WHEN qb.label = qa.label THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
  FROM top t JOIN q qa ON qa.vec_id = t.query_id JOIN q qb ON qb.vec_id = t.neighbor_id
  GROUP BY 1, 2
)
SELECT vec_id, label, n_neighbors, n_agree,
       ROUND(1 - CAST(n_agree AS DOUBLE) / n_neighbors, 6) AS noise_score,
       ROUND(1 - CAST(n_agree AS DOUBLE) / n_neighbors, 6) >= 0.5 AS flagged
FROM agg
"""
    sqls["kmeans_silhouette"] = _silhouette_oracle(k=4, iters=2)
    sqls["kmeans_outliers"] = _kmeans_outliers_oracle(k=4, iters=2)
    sqls["diameter"] = _diameter_oracle(depth=6)
    sqls["degree_histogram"] = (
        "WITH " + _DET_PRELUDE + """,
deg AS (
  SELECT name, COUNT(*) AS degree
  FROM (SELECT src AS name FROM edges UNION ALL SELECT dst FROM edges)
  GROUP BY name
)
SELECT bin,
       CAST(2 ** bin AS BIGINT) AS lo,
       CAST(2 ** (bin + 1) - 1 AS BIGINT) AS hi,
       CAST(COUNT(*) AS BIGINT) AS n_vertices
FROM (SELECT CAST(FLOOR(log2(CAST(degree AS DOUBLE))) AS INT) AS bin FROM deg)
GROUP BY bin
"""
    )
    # ---- coreness: 3 unrolled H-index rounds (est0 = degree; per round
    # est' = min(est, H(neighbour ests)) with H = max over ranked
    # neighbours of least(rank, est)) — same graph, same math as Spark
    cor = ["e0 AS (SELECT src AS id, CAST(COUNT(*) AS INT) AS est FROM sym GROUP BY src)"]
    for r in (1, 2, 3):
        cor.append(f"""g{r} AS (
  SELECT s.src AS id, e.est AS nb FROM sym s JOIN e{r - 1} e ON s.dst = e.id
),
h{r} AS (
  SELECT id, MAX(LEAST(rk, nb)) AS h
  FROM (SELECT id, nb, ROW_NUMBER() OVER (PARTITION BY id ORDER BY nb DESC) AS rk
        FROM g{r})
  GROUP BY id
),
e{r} AS (SELECT e{r - 1}.id, LEAST(e{r - 1}.est, h{r}.h) AS est
         FROM e{r - 1} JOIN h{r} USING (id))""")
    sqls["coreness"] = (
        "WITH "
        + _DET_PRELUDE
        + ",\n"
        + ",\n".join(cor)
        + "\nSELECT id, CAST(est AS BIGINT) AS coreness FROM e3"
    )
    sqls["wl_refinement"] = (
        "WITH " + _DET_PRELUDE + """,
c0 AS (SELECT id, '0' AS color FROM verts),
g1 AS (
  SELECT s.src AS id, string_agg(c.color, ',' ORDER BY c.color) AS sig
  FROM sym s JOIN c0 c ON s.dst = c.id GROUP BY s.src
),
c1 AS (
  SELECT c0.id, md5(c0.color || '|' || COALESCE(g1.sig, '')) AS color
  FROM c0 LEFT JOIN g1 USING (id)
),
g2 AS (
  SELECT s.src AS id, string_agg(c.color, ',' ORDER BY c.color) AS sig
  FROM sym s JOIN c1 c ON s.dst = c.id GROUP BY s.src
),
c2 AS (
  SELECT c1.id, md5(c1.color || '|' || COALESCE(g2.sig, '')) AS color
  FROM c1 LEFT JOIN g2 USING (id)
)
SELECT id, color FROM c2
"""
    )
    sqls["anomaly_windows"] = """
WITH counts AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT window_start, event_type, n,
         AVG(n) OVER tw AS mu,
         STDDEV_SAMP(n) OVER tw AS sd
  FROM counts
  WINDOW tw AS (PARTITION BY event_type ORDER BY window_start
                ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
)
SELECT window_start, event_type, n,
       ROUND(mu, 6) AS baseline_mean,
       ROUND(CASE WHEN sd > 0 THEN (n - mu) / sd END, 6) AS zscore,
       COALESCE(ABS(CASE WHEN sd > 0 THEN (n - mu) / sd END) >= 2.0, FALSE)
         AS is_anomaly
FROM scored
"""
    sqls["tool_chains"] = """
WITH tr AS (
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         rn - 1 AS turn_idx,
         CASE WHEN event_type = 'click' THEN 'browser'
              WHEN event_type = 'purchase' THEN 'checkout' END AS tool
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events)
),
seqs AS (
  SELECT conv_id, list(tool ORDER BY turn_idx) AS tools
  FROM tr WHERE tool IS NOT NULL GROUP BY conv_id
),
grams AS (
  SELECT conv_id, array_to_string(tools[i:i+1], '>') AS chain
  FROM (SELECT * FROM seqs WHERE len(tools) >= 2),
       LATERAL (SELECT unnest(range(1, len(tools))) AS i)
)
SELECT chain, CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(COUNT(*) AS BIGINT) AS count
FROM grams GROUP BY chain ORDER BY count DESC, chain ASC LIMIT 20
"""
    sqls["ncol_roundtrip"] = f"""
SELECT src, dst, weight FROM ({_BIP_EDGES})
"""
    sqls["graphml_roundtrip"] = f"""
SELECT src, dst, weight FROM ({_BIP_EDGES})
"""
    sqls["pajek_roundtrip"] = f"""
SELECT src, dst, weight FROM ({_BIP_EDGES})
"""
    sqls["gml_roundtrip"] = f"""
SELECT src, dst, weight FROM ({_BIP_EDGES})
"""
    sqls["dot_roundtrip"] = f"""
SELECT src, dst, weight FROM ({_BIP_EDGES})
"""
    sqls["lgl_roundtrip"] = f"""
SELECT src, dst, weight FROM ({_BIP_EDGES})
"""
    sqls["graph_setops"] = f"""
WITH edges AS ({_BIP_EDGES}),
keyed AS (
  SELECT src, dst, weight,
         ('0x' || substr(md5(src || '|' || dst), 1, 8))::BIGINT % 4 AS bkt
  FROM edges
),
a AS (SELECT src, dst, SUM(weight) AS w FROM keyed WHERE bkt IN (0,1,2) GROUP BY 1,2),
b AS (SELECT src, dst, SUM(weight) AS w FROM keyed WHERE bkt IN (2,3) GROUP BY 1,2),
un AS (SELECT src, dst, SUM(w) AS w
       FROM (SELECT * FROM a UNION ALL SELECT * FROM b) GROUP BY 1,2),
ins AS (SELECT a.src, a.dst, a.w + b.w AS w FROM a JOIN b USING (src, dst)),
dab AS (SELECT * FROM a ANTI JOIN b USING (src, dst)),
dba AS (SELECT * FROM b ANTI JOIN a USING (src, dst)),
sd AS (SELECT * FROM dab UNION ALL SELECT * FROM dba)
SELECT 'difference' AS op, CAST(COUNT(*) AS BIGINT) AS n_edges, ROUND(SUM(w), 6) AS total_weight FROM dab
UNION ALL SELECT 'intersection', CAST(COUNT(*) AS BIGINT), ROUND(SUM(w), 6) FROM ins
UNION ALL SELECT 'symdiff', CAST(COUNT(*) AS BIGINT), ROUND(SUM(w), 6) FROM sd
UNION ALL SELECT 'union', CAST(COUNT(*) AS BIGINT), ROUND(SUM(w), 6) FROM un
ORDER BY op
"""
    sqls["rmat_graph"] = """
WITH e AS (SELECT unnest(range(1000)) AS i),
lev AS (
  SELECT e.i, l.l,
         ('0x' || substr(md5('rmat-42-' || e.i || '-' || l.l), 1, 8))::BIGINT
           / 4294967296.0 AS r
  FROM e, (SELECT unnest(range(7)) AS l) l
),
bits AS (
  SELECT i, l,
         CASE WHEN r >= CAST(0.57 AS DOUBLE) + CAST(0.19 AS DOUBLE) THEN 1 ELSE 0 END AS rb,
         CASE WHEN (r >= CAST(0.57 AS DOUBLE) AND r < CAST(0.57 AS DOUBLE) + CAST(0.19 AS DOUBLE))
                OR r >= CAST(0.57 AS DOUBLE) + CAST(0.19 AS DOUBLE) + CAST(0.19 AS DOUBLE)
              THEN 1 ELSE 0 END AS cb
  FROM lev
)
SELECT i, CAST(SUM(rb * (1 << l)) AS BIGINT) AS src,
          CAST(SUM(cb * (1 << l)) AS BIGINT) AS dst
FROM bits GROUP BY i ORDER BY i
"""
    sqls["graph_generators"] = """
WITH ring AS (
  SELECT 'ring' AS kind,
         LEAST(i, (i + 1) % 50) AS src, GREATEST(i, (i + 1) % 50) AS dst
  FROM (SELECT unnest(range(50)) AS i)
),
star AS (
  SELECT 'star' AS kind, 0 AS src, i AS dst
  FROM (SELECT unnest(range(33)) AS i) WHERE i <> 0
),
cells AS (SELECT i // 9 AS r, i % 9 AS c FROM (SELECT unnest(range(54)) AS i)),
lat AS (
  SELECT 'lattice' AS kind, r * 9 + c AS src, r * 9 + c + 1 AS dst FROM cells WHERE c < 8
  UNION ALL
  SELECT 'lattice', r * 9 + c, (r + 1) * 9 + c FROM cells WHERE r < 5
),
gnm AS (
  SELECT 'gnm' AS kind,
         ('0x' || substr(md5('gnm-s-7-' || i), 1, 12))::BIGINT % 64 AS src,
         ('0x' || substr(md5('gnm-d-7-' || i), 1, 12))::BIGINT % 64 AS dst
  FROM (SELECT unnest(range(200)) AS i)
)
SELECT kind, CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst FROM (
  SELECT * FROM ring UNION ALL SELECT * FROM star
  UNION ALL SELECT * FROM lat UNION ALL SELECT * FROM gnm
)
"""
    sqls["configuration_model"] = """
WITH gnm AS (
  SELECT ('0x' || substr(md5('gnm-s-7-' || i), 1, 12))::BIGINT % 64 AS src,
         ('0x' || substr(md5('gnm-d-7-' || i), 1, 12))::BIGINT % 64 AS dst
  FROM (SELECT unnest(range(200)) AS i)
),
und AS (
  SELECT DISTINCT LEAST(CAST(src AS VARCHAR), CAST(dst AS VARCHAR)) AS a,
                  GREATEST(CAST(src AS VARCHAR), CAST(dst AS VARCHAR)) AS b
  FROM gnm WHERE CAST(src AS VARCHAR) <> CAST(dst AS VARCHAR)
),
deg AS (
  SELECT v, COUNT(*) AS deg
  FROM (SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und)
  GROUP BY v
),
stubs AS (
  SELECT v, md5('cfg-11-' || v || '-' || CAST(j AS VARCHAR)) AS key
  FROM deg, LATERAL (SELECT unnest(range(1, deg + 1)) AS j)
),
ranked AS (SELECT v, ROW_NUMBER() OVER (ORDER BY key) - 1 AS rnk FROM stubs),
paired AS (SELECT rnk // 2 AS pair_id, rnk % 2 AS side, v FROM ranked)
SELECT CAST(pair_id AS BIGINT) AS pair_id,
       MIN(CASE WHEN side = 0 THEN v END) AS src,
       MIN(CASE WHEN side = 1 THEN v END) AS dst
FROM paired GROUP BY pair_id
HAVING MIN(CASE WHEN side = 1 THEN v END) IS NOT NULL
ORDER BY pair_id
"""
    sqls["ltv_cohorts"] = """
WITH lfirst AS (
  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_start
  FROM events GROUP BY user_id
),
lact AS (
  SELECT e.user_id, date_trunc('week', e.ts) AS b, e.value AS v, f.cohort_start
  FROM events e JOIN lfirst f USING (user_id)
),
lcell AS (
  SELECT cohort_start,
         CAST((epoch(b) - epoch(cohort_start)) / 604800 AS BIGINT) AS "offset",
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active,
         ROUND(SUM(v), 6) AS bucket_value
  FROM lact GROUP BY 1, 2
),
lsize AS (SELECT cohort_start, n_active AS cohort_size FROM lcell WHERE "offset" = 0)
SELECT CAST(c.cohort_start AS TIMESTAMP) AS cohort_start, c."offset" AS "offset", c.n_active, c.bucket_value,
       ROUND(SUM(c.bucket_value) OVER (PARTITION BY c.cohort_start ORDER BY c."offset"), 6) AS cum_value,
       ROUND(SUM(c.bucket_value) OVER (PARTITION BY c.cohort_start ORDER BY c."offset")
             / s.cohort_size, 6) AS cum_value_per_user
FROM lcell c JOIN lsize s USING (cohort_start)
ORDER BY cohort_start, "offset"
"""
    sqls["json_field_stats"] = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
       ROUND(MIN(v), 6) AS vmin, ROUND(MAX(v), 6) AS vmax,
       ROUND(AVG(v), 6) AS mean,
       ROUND(quantile_cont(v, 0.5), 6) AS median
FROM (SELECT event_type,
             CAST(json_extract(props, '$.k') AS DOUBLE) AS v
      FROM events)
GROUP BY event_type ORDER BY event_type
"""
    sqls["rfm_scores"] = """
WITH per0 AS (
  SELECT user_id AS u, MAX(CAST(ts AS DATE)) AS last_day,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         ROUND(SUM(value), 2) AS monetary
  FROM events GROUP BY user_id
),
hz AS (SELECT MAX(CAST(ts AS DATE)) AS max_day,
              CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM events),
per AS (
  SELECT u, CAST(date_diff('day', last_day, max_day) AS BIGINT) AS recency_days,
         frequency, monetary, n
  FROM per0 CROSS JOIN hz
),
rh AS (SELECT recency_days, n, COUNT(*) AS c FROM per GROUP BY 1, 2),
rt AS (SELECT recency_days,
              CAST(ceil(5 * SUM(c) OVER (ORDER BY recency_days DESC) / n) AS BIGINT) AS r_score
       FROM rh),
fh AS (SELECT frequency, n, COUNT(*) AS c FROM per GROUP BY 1, 2),
ft AS (SELECT frequency,
              CAST(ceil(5 * SUM(c) OVER (ORDER BY frequency ASC) / n) AS BIGINT) AS f_score
       FROM fh),
mh AS (SELECT monetary, n, COUNT(*) AS c FROM per GROUP BY 1, 2),
mt AS (SELECT monetary,
              CAST(ceil(5 * SUM(c) OVER (ORDER BY monetary ASC) / n) AS BIGINT) AS m_score
       FROM mh)
SELECT per.u AS user_id, recency_days, frequency, ROUND(monetary, 6) AS monetary,
       r_score, f_score, m_score,
       CAST(100 * r_score + 10 * f_score + m_score AS BIGINT) AS rfm
FROM per JOIN rt USING (recency_days) JOIN ft USING (frequency) JOIN mt USING (monetary)
ORDER BY user_id
"""
    sqls["lifecycle_accounting"] = """
WITH act AS (
  SELECT DISTINCT user_id AS u,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk
  FROM events
),
first AS (SELECT u, MIN(wk) AS first_wk FROM act GROUP BY u),
prev AS (SELECT u, wk + 1 AS wk FROM act),
cur AS (
  SELECT a.wk,
         CASE WHEN a.wk = f.first_wk THEN 'new'
              WHEN p.u IS NOT NULL THEN 'retained'
              ELSE 'resurrected' END AS state
  FROM act a JOIN first f ON f.u = a.u
  LEFT JOIN prev p ON p.u = a.u AND p.wk = a.wk
),
horizon AS (SELECT MAX(wk) AS max_wk FROM act),
churn AS (
  SELECT p.wk, 'churned' AS state
  FROM prev p, horizon h
  WHERE p.wk <= h.max_wk
    AND NOT EXISTS (SELECT 1 FROM act a WHERE a.u = p.u AND a.wk = p.wk)
)
SELECT CAST(wk AS BIGINT) AS bucket, state, CAST(COUNT(*) AS BIGINT) AS n_users
FROM (SELECT * FROM cur UNION ALL SELECT * FROM churn)
GROUP BY wk, state
ORDER BY bucket, state
"""
    sqls["periodicity"] = """
WITH counts AS (
  SELECT event_type AS etype, time_bucket(INTERVAL '1 hour', ts) AS bucket,
         CAST(COUNT(*) AS DOUBLE) AS c
  FROM events GROUP BY 1, 2
),
span AS (SELECT MIN(bucket) AS lo, MAX(bucket) AS hi FROM counts),
hours AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket FROM span
),
types AS (SELECT DISTINCT etype FROM counts),
dense AS (
  SELECT t.etype, h.bucket, COALESCE(c.c, 0.0) AS c
  FROM types t CROSS JOIN hours h
  LEFT JOIN counts c ON c.etype = t.etype AND c.bucket = h.bucket
),
lagged AS (
  SELECT etype, bucket + INTERVAL '24 hours' AS bucket, c AS c_prev FROM dense
)
SELECT d.etype AS event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(corr(l.c_prev, d.c), 6) AS acf
FROM dense d JOIN lagged l ON l.etype = d.etype AND l.bucket = d.bucket
GROUP BY d.etype
ORDER BY event_type
"""
    sqls["tree_graph"] = """
SELECT CAST((i - 1) // 3 AS BIGINT) AS src, CAST(i AS BIGINT) AS dst
FROM (SELECT unnest(range(1, 64)) AS i) ORDER BY dst
"""
    sqls["burstiness"] = """
WITH g AS (
  SELECT user_id,
         epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)) AS gap
  FROM events
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
       ROUND(AVG(gap), 6) AS mean_gap_s,
       ROUND(CASE WHEN AVG(gap) > 0 THEN STDDEV_POP(gap) / AVG(gap) END, 6) AS cv,
       ROUND(CASE WHEN STDDEV_POP(gap) + AVG(gap) > 0
                  THEN (STDDEV_POP(gap) - AVG(gap))
                       / (STDDEV_POP(gap) + AVG(gap)) END, 6) AS burstiness
FROM g WHERE gap IS NOT NULL
GROUP BY user_id HAVING COUNT(*) >= 2
ORDER BY user_id
"""
    sqls["edge_drift"] = """
WITH cur AS (
  SELECT DISTINCT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS slice,
         user_id AS src, event_type AS dst
  FROM events
),
prv AS (SELECT slice + 1 AS slice, src, dst FROM cur),
nc AS (SELECT slice, COUNT(*) AS n_curr FROM cur GROUP BY slice),
np AS (SELECT slice, COUNT(*) AS n_prev FROM prv GROUP BY slice),
cm AS (
  SELECT c.slice, COUNT(*) AS n_common
  FROM cur c JOIN prv p ON p.slice = c.slice AND p.src = c.src AND p.dst = c.dst
  GROUP BY c.slice
)
SELECT CAST(np.slice AS BIGINT) AS slice,
       CAST(n_prev AS BIGINT) AS n_prev,
       CAST(n_curr AS BIGINT) AS n_curr,
       CAST(COALESCE(n_common, 0) AS BIGINT) AS n_common,
       CAST(n_curr - COALESCE(n_common, 0) AS BIGINT) AS n_new,
       CAST(n_prev - COALESCE(n_common, 0) AS BIGINT) AS n_gone,
       ROUND(COALESCE(n_common, 0) * 1.0
             / (n_prev + n_curr - COALESCE(n_common, 0)), 6) AS jaccard
FROM np JOIN nc USING (slice) LEFT JOIN cm USING (slice)
ORDER BY slice
"""
    sqls["watts_strogatz"] = """
WITH base AS (
  SELECT i // 3 AS src, (i % 3) + 1 AS o
  FROM (SELECT unnest(range(300)) AS i)
),
draws AS (
  SELECT src, o,
         ('0x' || substr(md5('ws-11-' || src || '-' || o), 1, 8))::BIGINT
           / 4294967296.0 AS r,
         ('0x' || substr(md5('wsd-11-' || src || '-' || o), 1, 12))::BIGINT AS h
  FROM base
)
SELECT CAST(src AS BIGINT) AS src, CAST(o AS BIGINT) AS o,
       CAST(CASE WHEN r < CAST(0.2 AS DOUBLE)
                 THEN (src + 1 + (h % 99)) % 100
                 ELSE (src + o) % 100 END AS BIGINT) AS dst,
       r < CAST(0.2 AS DOUBLE) AS rewired
FROM draws
ORDER BY src, o
"""

    # modularity-vs-configuration-null z-score: 3 md5 rewires of the
    # G(64,200) graph, unweighted multigraph modularity per null, all
    # CTEs MATERIALIZED (chained rewires would inline exponentially)
    def _mnq(tag, etab):
        return f"""
{tag}_m AS MATERIALIZED (SELECT COUNT(*) * 1.0 AS m FROM {etab}),
{tag}_i AS MATERIALIZED (
  SELECT SUM(CASE WHEN ms.comm = md.comm THEN 1.0 ELSE 0.0 END) AS i
  FROM {etab} e JOIN memb ms ON ms.v = e.src JOIN memb md ON md.v = e.dst
),
{tag}_deg AS MATERIALIZED (
  SELECT v, COUNT(*) * 1.0 AS deg
  FROM (SELECT src AS v FROM {etab} UNION ALL SELECT dst FROM {etab}) GROUP BY v
),
{tag}_v2 AS MATERIALIZED (
  SELECT SUM(vol * vol) AS v2 FROM (
    SELECT mb.comm, SUM(d.deg) AS vol
    FROM {tag}_deg d JOIN memb mb ON mb.v = d.v GROUP BY mb.comm)
),
{tag}_q AS MATERIALIZED (
  SELECT ROUND(i / m - v2 / (4.0 * m * m), 6) AS q FROM {tag}_i, {tag}_m, {tag}_v2
)"""

    mn_cte = ["""gnm AS MATERIALIZED (
  SELECT ('0x' || substr(md5('gnm-s-7-' || i), 1, 12))::BIGINT % 64 AS src,
         ('0x' || substr(md5('gnm-d-7-' || i), 1, 12))::BIGINT % 64 AS dst
  FROM (SELECT unnest(range(200)) AS i)
)""", """und AS MATERIALIZED (
  SELECT DISTINCT LEAST(CAST(src AS VARCHAR), CAST(dst AS VARCHAR)) AS src,
                  GREATEST(CAST(src AS VARCHAR), CAST(dst AS VARCHAR)) AS dst
  FROM gnm WHERE CAST(src AS VARCHAR) <> CAST(dst AS VARCHAR)
)""", """memb AS MATERIALIZED (
  SELECT v, ('0x' || substr(md5(v), 1, 8))::BIGINT % 4 AS comm
  FROM (SELECT src AS v FROM und UNION SELECT dst FROM und)
)""", """deg0 AS MATERIALIZED (
  SELECT v, COUNT(*) AS deg
  FROM (SELECT src AS v FROM und UNION ALL SELECT dst AS v FROM und) GROUP BY v
)"""]
    mn_cte.append(_mnq("obs", "und").strip())
    for _s in (1, 2, 3):
        mn_cte.append(f"""cfg{_s}_st AS MATERIALIZED (
  SELECT v, md5('cfg-{_s}-' || v || '-' || CAST(j AS VARCHAR)) AS key
  FROM deg0, LATERAL (SELECT unnest(range(1, deg + 1)) AS j)
)""")
        mn_cte.append(
            f"cfg{_s}_rk AS MATERIALIZED (SELECT v, ROW_NUMBER() OVER (ORDER BY key) - 1"
            f" AS rnk FROM cfg{_s}_st)"
        )
        mn_cte.append(f"""cfg{_s}_e AS MATERIALIZED (
  SELECT MIN(CASE WHEN rnk % 2 = 0 THEN v END) AS src,
         MIN(CASE WHEN rnk % 2 = 1 THEN v END) AS dst
  FROM cfg{_s}_rk GROUP BY rnk // 2
  HAVING MIN(CASE WHEN rnk % 2 = 1 THEN v END) IS NOT NULL
)""")
        mn_cte.append(_mnq(f"cfg{_s}", f"cfg{_s}_e").strip())
    sqls["modularity_null_test"] = (
        "WITH " + ",\n".join(mn_cte) + """
SELECT o.q AS q_obs,
       ROUND(AVG(n.q), 6) AS null_mean,
       ROUND(STDDEV_POP(n.q), 6) AS null_std,
       ROUND(CASE WHEN STDDEV_POP(n.q) > 0
                  THEN (o.q - AVG(n.q)) / STDDEV_POP(n.q) END, 6) AS z
FROM obs_q o, (SELECT q FROM cfg1_q UNION ALL SELECT q FROM cfg2_q
               UNION ALL SELECT q FROM cfg3_q) n
GROUP BY o.q
"""
    )

    # Israeli–Itai maximal matching: 5 unrolled local-min election
    # rounds over the G(64,200) generator graph; round r's winners are
    # the edges that are min-(p,a,b) at BOTH endpoints of e{r}
    mm_rounds = 5
    # every CTE is MATERIALIZED — DuckDB inlines CTEs by default, and the
    # round-to-round references would otherwise expand exponentially
    # (same lesson as the coloring oracle)
    mm_cte = ["""gnm AS MATERIALIZED (
  SELECT ('0x' || substr(md5('gnm-s-7-' || i), 1, 12))::BIGINT % 64 AS src,
         ('0x' || substr(md5('gnm-d-7-' || i), 1, 12))::BIGINT % 64 AS dst
  FROM (SELECT unnest(range(200)) AS i)
)""", """e1 AS MATERIALIZED (
  SELECT a, b, md5('mm-42-' || CAST(a AS VARCHAR) || '-' || CAST(b AS VARCHAR)) AS p
  FROM (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM gnm WHERE src <> dst)
)"""]
    for _r in range(1, mm_rounds + 1):
        mm_cte.append(f"""c{_r} AS MATERIALIZED (
  SELECT a, b FROM (
    SELECT v, a, b, ROW_NUMBER() OVER (PARTITION BY v ORDER BY p, a, b) AS rn
    FROM (SELECT a AS v, a, b, p FROM e{_r}
          UNION ALL SELECT b AS v, a, b, p FROM e{_r})
  ) WHERE rn = 1
)""")
        mm_cte.append(
            f"m{_r} AS MATERIALIZED (SELECT a, b, {_r} AS rd FROM c{_r} "
            "GROUP BY a, b HAVING COUNT(*) = 2)"
        )
        mm_cte.append(
            f"v{_r} AS MATERIALIZED (SELECT a AS v FROM m{_r} UNION SELECT b FROM m{_r})"
        )
        mm_cte.append(f"""e{_r + 1} AS MATERIALIZED (
  SELECT * FROM e{_r}
  WHERE a NOT IN (SELECT v FROM v{_r}) AND b NOT IN (SELECT v FROM v{_r})
)""")
    sqls["maximal_matching"] = (
        "WITH " + ",\n".join(mm_cte)
        + "\nSELECT a, b, CAST(rd AS BIGINT) AS \"round\" FROM ("
        + " UNION ALL ".join(f"SELECT * FROM m{_r}" for _r in range(1, mm_rounds + 1))
        + ")"
    )
    sqls["role_transitions"] = """
WITH tr AS (
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         rn - 1 AS turn_idx,
         CASE WHEN rn % 2 = 1 THEN 'user' ELSE 'assistant' END AS role
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events)
),
pairs AS (
  SELECT lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS from_role,
         role AS to_role
  FROM tr
),
counts AS (
  SELECT from_role, to_role, CAST(COUNT(*) AS BIGINT) AS n
  FROM pairs WHERE from_role IS NOT NULL GROUP BY from_role, to_role
)
SELECT from_role, to_role, n,
       ROUND(n / SUM(n) OVER (PARTITION BY from_role), 6) AS prob
FROM counts
"""
    sqls["turn_latency"] = """
WITH tr AS (
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         rn - 1 AS turn_idx,
         CASE WHEN rn % 2 = 1 THEN 'user' ELSE 'assistant' END AS role,
         ts
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events)
),
lat AS (
  SELECT role,
         epoch(ts) - epoch(lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx))
           AS latency_s
  FROM tr
)
SELECT role, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(latency_s), 6) AS mean_s,
       ROUND(quantile_cont(latency_s, 0.5), 6) AS p50_s,
       ROUND(quantile_cont(latency_s, 0.95), 6) AS p95_s,
       ROUND(MAX(latency_s), 6) AS max_s
FROM lat WHERE latency_s IS NOT NULL
GROUP BY role
"""
    sqls["quantize_embeddings"] = """
WITH s AS (
  SELECT vec_id AS id, embedding,
         -- abs/max/divide in DOUBLE: the engine widens the fp32 elements
         -- before any arithmetic, and a float32 pipeline lands a hair's
         -- breadth on the other side of the 9-decimal rounding edge
         ROUND(list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) / 127.0, 9) AS scale
  FROM embeddings
)
SELECT id, CAST(i - 1 AS INT) AS i,
       CAST(CASE WHEN scale > 0 THEN round(CAST(embedding[i] AS DOUBLE) / scale, 0) ELSE 0 END AS INT)
         AS code,
       scale
FROM s, LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i)
"""
    sqls["script_profile"] = r"""
WITH sp AS (SELECT doc_id, coalesce(text, '') AS t,
                   CAST(length(coalesce(text, '')) AS DOUBLE) AS n
            FROM documents)
SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
  ROUND(CASE WHEN n > 0 THEN (n - length(regexp_replace(t, '[A-Za-z]', '', 'g'))) / n ELSE 0.0 END, 6) AS letter_frac,
  ROUND(CASE WHEN n > 0 THEN (n - length(regexp_replace(t, '[0-9]', '', 'g'))) / n ELSE 0.0 END, 6) AS digit_frac,
  ROUND(CASE WHEN n > 0 THEN (n - length(regexp_replace(t, '[ \t\r\n]', '', 'g'))) / n ELSE 0.0 END, 6) AS space_frac,
  ROUND(CASE WHEN n > 0 THEN (n - length(regexp_replace(t, '[!-/:-@\[-`{-~]', '', 'g'))) / n ELSE 0.0 END, 6) AS punct_frac,
  ROUND(CASE WHEN n > 0 THEN 1.0 - (n - length(regexp_replace(t, '[A-Za-z0-9 \t\r\n!-/:-@\[-`{-~]', '', 'g'))) / n ELSE 0.0 END, 6) AS other_frac
FROM sp ORDER BY doc_id
"""
    sqls["bigram_lm_score"] = f"""
WITH bpos AS (
  SELECT doc_id, i - 1 AS pos, tk[i] AS b
  FROM (SELECT doc_id, {_doc_tokens("coalesce(text,'')")} AS tk FROM documents),
       LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i)
  WHERE tk[i] <> ''
),
buni AS (SELECT b, CAST(COUNT(*) AS DOUBLE) AS cb FROM bpos GROUP BY b),
btot AS (SELECT SUM(cb) AS T, CAST(COUNT(*) AS DOUBLE) AS V FROM buni),
bocc AS (
  SELECT cur.doc_id, cur.b, prv.b AS a
  FROM bpos cur LEFT JOIN bpos prv
    ON prv.doc_id = cur.doc_id AND prv.pos = cur.pos - 1
),
bbi AS (SELECT a, b, CAST(COUNT(*) AS DOUBLE) AS cab
        FROM bocc WHERE a IS NOT NULL GROUP BY a, b),
bctx AS (SELECT a, SUM(cab) AS ca FROM bbi GROUP BY a),
bsc AS (
  SELECT o.doc_id, CAST(COUNT(*) AS BIGINT) AS n,
         AVG(ln(CASE WHEN o.a IS NOT NULL
                     THEN 0.7 * bbi.cab / bctx.ca
                          + 0.3 * (buni.cb + 1.0) / (btot.T + btot.V)
                     ELSE (buni.cb + 1.0) / (btot.T + btot.V) END)) AS mlp
  FROM bocc o JOIN buni ON buni.b = o.b
  LEFT JOIN bbi ON bbi.a = o.a AND bbi.b = o.b
  LEFT JOIN bctx ON bctx.a = o.a
  CROSS JOIN btot GROUP BY o.doc_id
)
SELECT d.doc_id, COALESCE(n, 0) AS n_tokens,
       ROUND(COALESCE(mlp, 0.0), 6) AS mean_logp,
       ROUND(exp(-COALESCE(mlp, 0.0)), 6) AS perplexity
FROM documents d LEFT JOIN bsc ON bsc.doc_id = d.doc_id
ORDER BY d.doc_id
"""
    sqls["source_divergence"] = f"""
WITH stc AS (
  SELECT source AS s, token, COUNT(*) AS c
  FROM (SELECT source, unnest({_doc_tokens("coalesce(text,'')")}) AS token FROM documents)
  WHERE token <> '' GROUP BY 1, 2
),
stot AS (SELECT s, SUM(c) AS n FROM stc GROUP BY s),
sdist AS (SELECT stc.s, token, c / CAST(n AS DOUBLE) AS p FROM stc JOIN stot USING (s)),
spair AS (
  SELECT l.s AS source_a, r.s AS source_b,
         CAST(COUNT(*) AS BIGINT) AS shared_tokens,
         SUM(0.5 * (l.p * log2(2.0 * l.p / (l.p + r.p))
                    + r.p * log2(2.0 * r.p / (l.p + r.p)))) AS js_inner,
         SUM(l.p) AS p_shared, SUM(r.p) AS q_shared
  FROM sdist l JOIN sdist r ON r.token = l.token AND l.s < r.s
  GROUP BY 1, 2
),
sall AS (
  SELECT a.s AS source_a, b.s AS source_b
  FROM stot a JOIN stot b ON a.s < b.s
),
sfull AS (
  SELECT sall.source_a, sall.source_b,
         COALESCE(shared_tokens, 0) AS shared_tokens,
         COALESCE(js_inner, 0.0) AS js_inner,
         COALESCE(p_shared, 0.0) AS p_shared,
         COALESCE(q_shared, 0.0) AS q_shared
  FROM sall LEFT JOIN spair USING (source_a, source_b)
)
SELECT source_a, source_b, shared_tokens,
       ROUND(js_inner + 0.5 * (1.0 - p_shared) + 0.5 * (1.0 - q_shared), 6) AS js_divergence,
       ROUND(sqrt(greatest(js_inner + 0.5 * (1.0 - p_shared) + 0.5 * (1.0 - q_shared), 0.0)), 6) AS js_distance
FROM sfull ORDER BY source_a, source_b
"""
    _tr = [
        f"""tpos AS (
  SELECT doc_id, i - 1 AS pos, tk[i] AS token
  FROM (SELECT doc_id, {_doc_tokens("coalesce(text,'')")} AS tk FROM documents),
       LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i)
  WHERE tk[i] <> ''
)""",
        """tw AS (
  SELECT least(p1.token, p2.token) AS a, greatest(p1.token, p2.token) AS b,
         CAST(COUNT(*) AS DOUBLE) AS w
  FROM tpos p1 JOIN tpos p2
    ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
  WHERE p1.token <> p2.token GROUP BY 1, 2
)""",
        "tsym AS (SELECT a AS src, b AS dst, w FROM tw UNION ALL SELECT b, a, w FROM tw)",
        "touts AS (SELECT src, SUM(w) AS ow FROM tsym GROUP BY src)",
        "tlinks AS MATERIALIZED (SELECT tsym.src, tsym.dst, w / ow AS share FROM tsym JOIN touts USING (src))",
        "tverts AS (SELECT DISTINCT src AS id FROM tsym)",
        "tn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tverts)",
        "tr0 AS (SELECT id, 1.0 / (SELECT n FROM tn) AS rank FROM tverts)",
    ]
    for t in range(1, 7):
        _tr.append(f"""tr{t} AS MATERIALIZED (
  SELECT l.dst AS id,
         0.15 / (SELECT n FROM tn) + 0.85 * SUM(l.share * r.rank) AS rank
  FROM tlinks l JOIN tr{t - 1} r ON r.id = l.src GROUP BY l.dst
)""")
    sqls["textrank"] = (
        "WITH " + ",\n".join(_tr) + """
SELECT token, score, CAST(rank AS BIGINT) AS rank FROM (
  SELECT id AS token, ROUND(rank, 6) AS score,
         ROW_NUMBER() OVER (ORDER BY ROUND(rank, 6) DESC, id) AS rank
  FROM tr6
) WHERE rank <= 15
"""
    )
    def _kl2(a, b):
        return (
            f"ROUND(sqrt(list_sum(list_transform(list_zip({a}, {b}), "
            "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) "
            "* (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))), 9)"
        )

    _kc = [
        "kb AS (SELECT vec_id AS id, embedding AS v FROM embeddings)",
        "kc0 AS (SELECT id, v FROM kb WHERE id = (SELECT MIN(id) FROM kb))",
        f"""ks1 AS MATERIALIZED (
  SELECT kb.id, kb.v, {_kl2('kb.v', 'kc0.v')} AS md
  FROM kb CROSS JOIN kc0
)""",
        "kc1 AS (SELECT id, v, md FROM ks1 ORDER BY md DESC, id LIMIT 1)",
    ]
    for r in range(2, 6):
        _kc.append(f"""ks{r} AS MATERIALIZED (
  SELECT s.id, s.v, LEAST(s.md, {_kl2('s.v', 'c.v')}) AS md
  FROM ks{r - 1} s CROSS JOIN kc{r - 1} c
)""")
        _kc.append(f"kc{r} AS (SELECT id, v, md FROM ks{r} ORDER BY md DESC, id LIMIT 1)")
    sqls["kcenter_coreset"] = (
        "WITH " + ",\n".join(_kc) + """
SELECT CAST(0 AS BIGINT) AS rnd, id AS center_id, 0.0 AS radius FROM kc0
UNION ALL SELECT 1, id, ROUND(md, 6) FROM kc1
UNION ALL SELECT 2, id, ROUND(md, 6) FROM kc2
UNION ALL SELECT 3, id, ROUND(md, 6) FROM kc3
UNION ALL SELECT 4, id, ROUND(md, 6) FROM kc4
UNION ALL SELECT 5, id, ROUND(md, 6) FROM kc5
ORDER BY rnd
"""
    )
    sqls["centroid_classify"] = """
WITH cx AS (
  SELECT vec_id AS id, label AS lbl, ii - 1 AS i, CAST(embedding[ii] AS DOUBLE) AS v
  FROM embeddings, LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS ii)
),
ccent AS (SELECT lbl AS cand, i, ROUND(AVG(v), 9) AS c FROM cx GROUP BY 1, 2),
cdists AS (
  SELECT cx.id, cx.lbl, ccent.cand, ROUND(SUM((v - c) * (v - c)), 9) AS dist
  FROM cx JOIN ccent USING (i)
  GROUP BY 1, 2, 3
),
cdmin AS (SELECT id, MIN(dist) AS md FROM cdists GROUP BY id),
cpred AS (
  SELECT d.id, d.lbl, MIN(d.cand) AS pred
  FROM cdists d JOIN cdmin ON cdmin.id = d.id AND d.dist = cdmin.md
  GROUP BY d.id, d.lbl
)
SELECT lbl AS label, pred AS pred_label, CAST(COUNT(*) AS BIGINT) AS n
FROM cpred GROUP BY 1, 2 ORDER BY 1, 2
"""
    sqls["distance_histogram"] = """
WITH dpairs AS (
  SELECT l.embedding AS v, r.embedding AS w
  FROM embeddings l
  JOIN (SELECT unnest([1, 7, 41, 173]) AS off) o ON TRUE
  JOIN embeddings r ON r.vec_id = l.vec_id + o.off
),
dcos AS (
  SELECT list_sum(list_transform(list_zip(v, w),
                                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(w, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS c
  FROM dpairs
),
dbin AS (
  SELECT greatest(-20, least(19, CAST(floor(c * 20) AS BIGINT))) AS bin, c FROM dcos
)
SELECT bin, ROUND(bin / 20.0, 6) AS lo,
       CAST(COUNT(*) AS BIGINT) AS n_pairs, ROUND(AVG(c), 6) AS avg_cos
FROM dbin GROUP BY bin ORDER BY bin
"""
    sqls["random_projection"] = """
WITH signs AS (
  SELECT i, j,
         1 - 2 * ((('0x' || substr(md5('42:' || CAST(i AS VARCHAR) || ':' ||
                                    CAST(j AS VARCHAR)), 1, 8))::BIGINT) % 2) AS sign
  FROM (SELECT unnest(range(0, 64)) AS i), (SELECT unnest(range(0, 16)) AS j)
),
expl AS (
  SELECT vec_id AS id, ii - 1 AS i, CAST(embedding[ii] AS DOUBLE) AS x
  FROM embeddings, LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS ii)
)
SELECT id, j, ROUND(SUM(x * sign) / sqrt(16.0), 6) AS y
FROM expl JOIN signs USING (i)
GROUP BY id, j ORDER BY id, j
"""
    sqls["graph_summary"] = f"""
WITH edges AS ({_BIP_EDGES}),
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
allv AS (SELECT DISTINCT v FROM (SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges)),
deg AS (
  SELECT name, COUNT(*) AS d
  FROM (SELECT a AS name FROM und UNION ALL SELECT b AS name FROM und)
  GROUP BY name
),
b AS (
  SELECT COALESCE(SUM(weight), 0) AS total_weight,
         CAST(COALESCE(SUM(CASE WHEN src = dst THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_self_loops
  FROM edges
),
nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices FROM allv),
ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM und),
md AS (SELECT CAST(COALESCE(MAX(d), 0) AS BIGINT) AS max_degree FROM deg)
SELECT nv.n_vertices, ne.n_edges, b.n_self_loops,
       ROUND(b.total_weight, 6) AS total_weight,
       ROUND(CASE WHEN nv.n_vertices > 1
                  THEN 2.0 * ne.n_edges / (nv.n_vertices * (nv.n_vertices - 1.0))
             END, 6) AS density,
       ROUND(CASE WHEN nv.n_vertices > 0 THEN 2.0 * ne.n_edges / nv.n_vertices END, 6)
         AS avg_degree,
       md.max_degree
FROM nv, ne, b, md
"""
    sqls["importance_sample"] = """
WITH w AS (
  SELECT doc_id, CAST(length(text) + 1 AS DOUBLE) AS weight FROM documents
),
k AS (
  SELECT doc_id, weight,
         pow((('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              + 1.0) / 4294967296.0, 1.0 / weight) AS key
  FROM w WHERE weight > 0
)
SELECT doc_id, weight, ROUND(key, 6) AS sample_key
FROM k ORDER BY key DESC, doc_id ASC LIMIT 50
"""
    sqls["transitivity"] = """
WITH te AS (
  SELECT prev_type AS s, event_type AS d
  FROM (SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events)
  WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
und AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM te WHERE s <> d),
deg AS (
  SELECT name, CAST(COUNT(*) AS DOUBLE) AS degree
  FROM (SELECT a AS name FROM und UNION ALL SELECT b AS name FROM und)
  GROUP BY name
),
w AS (SELECT COALESCE(SUM(degree * (degree - 1) / 2.0), 0) AS n_wedges FROM deg),
t AS (
  SELECT COUNT(*) AS n_triangles
  FROM und e1 JOIN und e2 ON e1.b = e2.a JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT CAST(t.n_triangles AS BIGINT) AS n_triangles,
       CAST(w.n_wedges AS BIGINT) AS n_wedges,
       ROUND(CASE WHEN w.n_wedges > 0 THEN 3.0 * t.n_triangles / w.n_wedges END, 6)
         AS transitivity
FROM t, w
"""
    sqls["avg_distance"] = (
        "WITH " + _DET_PRELUDE + """,
und2 AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         FROM edges WHERE src <> dst),
s2 AS (SELECT a, b FROM und2 UNION ALL SELECT b AS a, a AS b FROM und2),
r1 AS (SELECT DISTINCT a AS id, b AS v FROM s2),
r2 AS (
  SELECT id, v FROM (
    SELECT DISTINCT r1.id, s2.b AS v FROM r1 JOIN s2 ON s2.a = r1.v WHERE s2.b <> r1.id
  ) EXCEPT SELECT id, v FROM r1
),
ball AS (
  SELECT id, v, 1 AS d FROM r1
  UNION ALL
  SELECT id, v, 2 AS d FROM r2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(AVG(CAST(d AS DOUBLE)), 6) AS avg_distance
FROM ball
"""
    )
    sqls["bpe_pairs"] = f"""
WITH words AS (
  SELECT tok AS w
  FROM (SELECT {_doc_tokens()} AS tk FROM documents),
       LATERAL (SELECT unnest(tk) AS tok)
  WHERE tok <> ''
),
wc AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w),
pairs AS (
  SELECT substr(w, i, 2) AS pair, c
  FROM (SELECT * FROM wc WHERE length(w) >= 2),
       LATERAL (SELECT unnest(range(1, length(w))) AS i)
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_words, CAST(SUM(c) AS BIGINT) AS count
FROM pairs GROUP BY pair ORDER BY count DESC, pair ASC LIMIT 20
"""
    sqls["mixing_matrix"] = f"""
WITH edges AS ({_BIP_EDGES}),
verts AS (
  SELECT name,
         CASE WHEN name LIKE 'u:%' THEN CAST(substr(name, 3) AS BIGINT) % 8
              ELSE length(name) % 8 END AS comm
  FROM (SELECT src AS name FROM edges UNION SELECT dst FROM edges)
),
und AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst GROUP BY 1, 2
),
lab AS (
  SELECT va.comm AS ca, vb.comm AS cb
  FROM und u JOIN verts va ON u.a = va.name JOIN verts vb ON u.b = vb.name
)
SELECT least(ca, cb) AS comm_a, greatest(ca, cb) AS comm_b,
       CAST(COUNT(*) AS BIGINT) AS n_edges
FROM lab GROUP BY 1, 2
"""
    sqls["assortativity_nominal"] = f"""
WITH edges AS ({_BIP_EDGES}),
verts AS (
  SELECT name,
         CASE WHEN name LIKE 'u:%' THEN CAST(substr(name, 3) AS BIGINT) % 8
              ELSE length(name) % 8 END AS comm
  FROM (SELECT src AS name FROM edges UNION SELECT dst FROM edges)
),
und AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst GROUP BY 1, 2
),
sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
lab AS (
  SELECT va.comm AS ca, vb.comm AS cb
  FROM sym s JOIN verts va ON s.a = va.name JOIN verts vb ON s.b = vb.name
),
e AS (SELECT ca, cb, CAST(COUNT(*) AS DOUBLE) AS w FROM lab GROUP BY 1, 2),
tot AS (SELECT SUM(w) AS W FROM e),
eii AS (SELECT COALESCE(SUM(CASE WHEN ca = cb THEN w END), 0) AS diag FROM e),
sq AS (
  SELECT SUM((ai / W) * (ai / W)) AS s
  FROM (SELECT ca, SUM(w) AS ai FROM e GROUP BY ca), tot
)
SELECT ROUND(CASE WHEN s < 1.0 THEN (diag / W - s) / (1.0 - s) END, 6)
         AS assortativity
FROM eii, tot, sq
"""
    sqls["community_cartography"] = f"""
WITH edges AS ({_BIP_EDGES}),
cverts AS (
  SELECT name,
         CASE WHEN name LIKE 'u:%' THEN CAST(substr(name, 3) AS BIGINT) % 8
              ELSE length(name) % 8 END AS comm
  FROM (SELECT src AS name FROM edges UNION SELECT dst FROM edges)
),
cund AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         FROM edges WHERE src <> dst),
csym AS (SELECT a, b FROM cund UNION ALL SELECT b AS a, a AS b FROM cund),
clab AS (
  SELECT s.a, va.comm AS ca, vb.comm AS cb
  FROM csym s JOIN cverts va ON s.a = va.name JOIN cverts vb ON s.b = vb.name
),
ckc AS (SELECT a AS id, ca AS comm, cb AS to_comm, CAST(COUNT(*) AS DOUBLE) AS k_c
        FROM clab GROUP BY 1, 2, 3),
cper AS (
  SELECT id, comm, CAST(SUM(k_c) AS BIGINT) AS k,
         ROUND(1.0 - SUM(k_c * k_c) / (SUM(k_c) * SUM(k_c)), 6) AS participation,
         CAST(SUM(CASE WHEN to_comm = comm THEN k_c ELSE 0 END) AS BIGINT) AS k_in
  FROM ckc GROUP BY id, comm
),
cst AS (SELECT comm, AVG(k_in) AS mu, stddev_pop(k_in) AS sd FROM cper GROUP BY comm)
SELECT id, comm, k, k_in,
       ROUND(CASE WHEN sd > 0 THEN (k_in - mu) / sd ELSE 0.0 END, 6) AS z,
       participation
FROM cper JOIN cst USING (comm) ORDER BY id
"""
    sqls["partition_quality"] = f"""
WITH edges AS ({_BIP_EDGES}),
verts AS (
  SELECT name,
         CASE WHEN name LIKE 'u:%' THEN CAST(substr(name, 3) AS BIGINT) % 8
              ELSE length(name) % 8 END AS comm
  FROM (SELECT src AS name FROM edges UNION SELECT dst FROM edges)
),
und AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b, SUM(weight) AS w
  FROM edges WHERE src <> dst GROUP BY 1, 2
),
lab AS (
  SELECT u.w, va.comm AS ca, vb.comm AS cb
  FROM und u JOIN verts va ON u.a = va.name JOIN verts vb ON u.b = vb.name
),
eagg AS (
  SELECT COUNT(*) AS m_edges, COALESCE(SUM(w), 0) AS w_tot,
         COALESCE(SUM(CASE WHEN ca = cb THEN w END), 0) AS w_in,
         COALESCE(SUM(CASE WHEN ca = cb THEN 1 ELSE 0 END), 0) AS m_in
  FROM lab
),
sagg AS (
  SELECT SUM(nc) AS n, COALESCE(SUM(nc * (nc - 1) / 2.0), 0) AS p_in
  FROM (SELECT CAST(COUNT(*) AS DOUBLE) AS nc FROM verts GROUP BY comm)
)
SELECT CAST(n AS BIGINT) AS n_vertices, CAST(m_edges AS BIGINT) AS n_edges,
  ROUND(CASE WHEN w_tot > 0 THEN w_in / w_tot ELSE 1.0 END, 6) AS coverage,
  ROUND(CASE WHEN n > 1
             THEN (m_in + ((n*(n-1)/2.0 - p_in) - (m_edges - m_in)))
                  / (n*(n-1)/2.0)
             ELSE 1.0 END, 6) AS performance
FROM eagg CROSS JOIN sagg
"""
    sqls["neighbor_sample"] = (
        "WITH " + _DET_PRELUDE + """,
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
s AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
seeds AS (SELECT DISTINCT src AS id FROM edges WHERE (src / 2) % 50 = 0),
f1 AS (
  SELECT root, 1 AS hop, v AS src, b AS dst FROM (
    SELECT fr.root, fr.v, s.b,
           ROW_NUMBER() OVER (
             PARTITION BY fr.root, fr.v
             ORDER BY md5(concat_ws(':', '42', '1', fr.root, fr.v, s.b)), s.b
           ) AS rn
    FROM (SELECT id AS root, id AS v FROM seeds) fr JOIN s ON s.a = fr.v
  ) WHERE rn <= 3
),
fr2 AS (SELECT DISTINCT root, dst AS v FROM f1),
f2 AS (
  SELECT root, 2 AS hop, v AS src, b AS dst FROM (
    SELECT fr.root, fr.v, s.b,
           ROW_NUMBER() OVER (
             PARTITION BY fr.root, fr.v
             ORDER BY md5(concat_ws(':', '42', '2', fr.root, fr.v, s.b)), s.b
           ) AS rn
    FROM fr2 fr JOIN s ON s.a = fr.v
  ) WHERE rn <= 2
)
SELECT root, hop, src, dst FROM f1
UNION ALL SELECT root, hop, src, dst FROM f2
"""
    )
    sqls["vertex_features"] = """
WITH te AS (
  SELECT prev_type AS s, event_type AS d, CAST(COUNT(*) AS DOUBLE) AS w
  FROM (SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events)
  WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
deg AS (SELECT name, COUNT(*) AS degree, SUM(w) AS strength
        FROM (SELECT s AS name, w FROM te UNION ALL SELECT d AS name, w FROM te)
        GROUP BY name),
und AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM te WHERE s <> d),
sdeg AS (SELECT name, COUNT(*) AS degree
         FROM (SELECT a AS name FROM und UNION ALL SELECT b AS name FROM und)
         GROUP BY name),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1 JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
cnt AS (SELECT name, COUNT(*) AS nt
        FROM (SELECT x AS name FROM tri UNION ALL SELECT y AS name FROM tri
              UNION ALL SELECT z AS name FROM tri)
        GROUP BY name)
SELECT d.name, CAST(d.degree AS BIGINT) AS degree, ROUND(d.strength, 6) AS strength,
       CAST(COALESCE(c.nt, 0) AS BIGINT) AS n_triangles,
       ROUND(CASE WHEN COALESCE(s.degree, 0) >= 2
                  THEN 2.0 * COALESCE(c.nt, 0) / (s.degree * (s.degree - 1.0))
                  ELSE 0.0 END, 6) AS lcc
FROM deg d LEFT JOIN sdeg s ON s.name = d.name LEFT JOIN cnt c ON c.name = d.name
"""
    sqls["corpus_profile"] = r"""
WITH d AS (
  SELECT source, lang,
         CAST(len(list_filter(
           string_split_regex(lower(trim(coalesce(text, ''))), '\s+'),
           x -> x <> '')) AS DOUBLE) AS nt,
         length(coalesce(text, '')) AS nc
  FROM documents
)
SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS n_tokens,
       ROUND(AVG(nc), 6) AS mean_chars,
       ROUND(quantile_cont(nt, 0.5), 6) AS p50_tokens,
       ROUND(quantile_cont(nt, 0.9), 6) AS p90_tokens,
       ROUND(quantile_cont(nt, 0.99), 6) AS p99_tokens
FROM d GROUP BY 1, 2
"""
    sqls["community_drift"] = """
WITH ev AS (
  SELECT *, (CAST(epoch(ts) AS BIGINT) // 86400) % 3 AS slice FROM events
),
tids AS (
  SELECT event_type, 2 * ROW_NUMBER() OVER (ORDER BY event_type) + 1 AS tid
  FROM (SELECT DISTINCT event_type FROM events)
),
sv AS (
  SELECT DISTINCT slice, 2 * user_id AS id FROM ev
  UNION
  SELECT DISTINCT slice, tid AS id FROM ev JOIN tids USING (event_type)
),
m AS (SELECT slice, id, (id * (slice + 2)) % 6 AS comm FROM sv),
ct AS (
  SELECT a.slice AS slice_from, a.comm AS c1, b.comm AS c2,
         CAST(COUNT(*) AS DOUBLE) AS nij
  FROM m a JOIN m b ON a.id = b.id AND b.slice = a.slice + 1
  GROUP BY 1, 2, 3
),
a AS (SELECT slice_from, c1, SUM(nij) AS ai, MAX(nij) AS mi FROM ct GROUP BY 1, 2),
b AS (SELECT slice_from, c2, SUM(nij) AS bj, MAX(nij) AS mj FROM ct GROUP BY 1, 2),
at AS (SELECT slice_from, SUM(ai) AS N, SUM(ai*(ai-1)/2.0) AS sa,
              SUM(mi) AS ma, SUM(ai*ln(ai)) AS la FROM a GROUP BY 1),
bt AS (SELECT slice_from, SUM(bj*(bj-1)/2.0) AS sb, SUM(mj) AS mb,
              SUM(bj*ln(bj)) AS lb FROM b GROUP BY 1),
cc AS (SELECT slice_from, SUM(nij*ln(nij)) AS lc,
              SUM(nij*(nij-1)/2.0) AS sab FROM ct GROUP BY 1)
SELECT slice_from, slice_from + 1 AS slice_to,
  CAST(N AS BIGINT) AS n_vertices,
  ROUND(CASE WHEN 2*ln(N) - la/N - lb/N > 0
             THEN 2*(lc/N - la/N - lb/N + ln(N)) / (2*ln(N) - la/N - lb/N)
             ELSE 1.0 END, 6) AS nmi,
  ROUND(2*ln(N) - la/N - lb/N - 2*(lc/N - la/N - lb/N + ln(N)), 6) AS vi,
  ROUND(CASE WHEN N > 1
             THEN (N*(N-1)/2.0 + 2*sab - sa - sb) / (N*(N-1)/2.0)
             ELSE 1.0 END, 6) AS rand,
  ROUND(CASE WHEN N > 1 AND (sa+sb)/2.0 - sa*sb/(N*(N-1)/2.0) > 0
             THEN (sab - sa*sb/(N*(N-1)/2.0))
                  / ((sa+sb)/2.0 - sa*sb/(N*(N-1)/2.0))
             ELSE 1.0 END, 6) AS adjusted_rand,
  CAST(2*N - ma - mb AS BIGINT) AS split_join
FROM cc JOIN at USING (slice_from) JOIN bt USING (slice_from)
"""
    sqls["bipartite_project"] = f"""
WITH edges AS ({_BIP_EDGES}),
e AS (SELECT dst AS anchor, src AS node, weight FROM edges),
deg AS (SELECT anchor, COUNT(*) AS d FROM e GROUP BY anchor),
k AS (SELECT e.* FROM e JOIN deg USING (anchor) WHERE d <= 10000)
SELECT l.node AS src, r.node AS dst,
       ROUND(SUM(l.weight * r.weight), 6) AS weight
FROM k l JOIN k r ON l.anchor = r.anchor AND l.node < r.node
GROUP BY 1, 2
"""
    sqls["conversation_profile"] = """
WITH tr AS (
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         rn - 1 AS turn_idx,
         CASE WHEN rn % 2 = 1 THEN 'user' ELSE 'assistant' END AS role,
         event_type AS text,
         CASE WHEN event_type = 'click' THEN 'browser'
              WHEN event_type = 'purchase' THEN 'checkout' END AS tool,
         ts
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events)
),
lagged AS (
  SELECT *, CASE WHEN lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                      IS NOT NULL
                  AND role <> lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                 THEN 1 ELSE 0 END AS alt
  FROM tr
)
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user_turns,
       CAST(SUM(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_tool_calls,
       CAST(COUNT(DISTINCT tool) AS BIGINT) AS n_tools,
       CAST(SUM(length(COALESCE(text, ''))) AS BIGINT) AS total_chars,
       ROUND(AVG(length(COALESCE(text, ''))), 6) AS avg_turn_chars,
       ROUND(epoch(MAX(ts)) - epoch(MIN(ts)), 6) AS duration_s,
       ROUND(CASE WHEN COUNT(*) > 1
                  THEN CAST(SUM(alt) AS DOUBLE) / (COUNT(*) - 1)
                  ELSE 0.0 END, 6) AS alternation_rate
FROM lagged GROUP BY conv_id
"""
    sqls["rich_club"] = (
        "WITH " + _DET_PRELUDE + """,
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
deg AS (
  SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT a AS id FROM und UNION ALL SELECT b FROM und
  ) GROUP BY id
),
ks AS (SELECT unnest([1, 2, 4, 8, 16, 32]) AS k),
nodes_k AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_nodes
  FROM deg JOIN ks ON deg > k GROUP BY k
),
edges_k AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_edges
  FROM (SELECT least(da.deg, db.deg) AS lim
        FROM und JOIN deg da ON und.a = da.id JOIN deg db ON und.b = db.id)
  JOIN ks ON lim > k GROUP BY k
)
SELECT ks.k, COALESCE(n_nodes, 0) AS n_nodes, COALESCE(n_edges, 0) AS n_edges,
       ROUND(CASE WHEN COALESCE(n_nodes, 0) > 1
                  THEN 2.0 * COALESCE(n_edges, 0)
                       / (n_nodes * (n_nodes - 1.0))
                  ELSE 0.0 END, 6) AS phi
FROM ks LEFT JOIN nodes_k USING (k) LEFT JOIN edges_k USING (k)
"""
    )
    sqls["lm_score"] = f"""
WITH tok AS (
  SELECT doc_id, tok
  FROM (SELECT doc_id, {_doc_tokens()} AS tk FROM documents),
       LATERAL (SELECT unnest(tk) AS tok)
  WHERE tok <> ''
),
model AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS cnt FROM tok GROUP BY tok),
tot AS (SELECT SUM(cnt) AS T, CAST(COUNT(*) AS DOUBLE) AS V FROM model),
scored AS (
  SELECT t.doc_id, COUNT(*) AS n,
         AVG(ln((m.cnt + 1.0) / (tot.T + 1.0 * tot.V))) AS mlp
  FROM tok t JOIN model m USING (tok) CROSS JOIN tot
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(s.n, 0) AS BIGINT) AS n_tokens,
       ROUND(COALESCE(s.mlp, 0.0), 6) AS mean_logp
FROM documents d LEFT JOIN scored s USING (doc_id)
"""
    _TR_CTE = """
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         rn - 1 AS turn_idx,
         CASE WHEN rn % 2 = 1 THEN 'user' ELSE 'assistant' END AS role,
         event_type AS text,
         CASE WHEN event_type = 'click' THEN 'browser'
              WHEN event_type = 'purchase' THEN 'checkout' END AS tool,
         ts
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events)
"""
    sqls["tool_retries"] = f"""
WITH tr AS ({_TR_CTE}),
calls AS (SELECT conv_id, turn_idx, tool FROM tr WHERE tool IS NOT NULL),
marked AS (
  SELECT conv_id, turn_idx, tool,
         CASE WHEN lag(tool) OVER w IS NULL OR tool <> lag(tool) OVER w
              THEN 1 ELSE 0 END AS newr
  FROM calls WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
runs0 AS (
  SELECT conv_id, tool,
         SUM(newr) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS run_id
  FROM marked
),
runs AS (SELECT conv_id, run_id, tool, COUNT(*) AS run_len
         FROM runs0 GROUP BY 1, 2, 3)
SELECT tool, CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(SUM(run_len) AS BIGINT) AS n_calls,
       CAST(SUM(CASE WHEN run_len >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_retry_runs,
       CAST(MAX(run_len) AS BIGINT) AS max_run,
       ROUND(SUM(CASE WHEN run_len >= 2 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
         AS retry_rate
FROM runs GROUP BY tool
"""
    sqls["conversation_endings"] = f"""
WITH tr AS ({_TR_CTE}),
per AS (
  SELECT conv_id, arg_max(role, turn_idx) AS last_role,
         COUNT(*) AS n_turns,
         epoch(MAX(ts)) - epoch(MIN(ts)) AS dur_s
  FROM tr GROUP BY conv_id
),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_total FROM per)
SELECT last_role, CAST(COUNT(*) AS BIGINT) AS n_convs,
       ROUND(COUNT(*) / n_total, 6) AS frac,
       ROUND(AVG(n_turns), 6) AS avg_turns,
       ROUND(AVG(dur_s), 6) AS avg_duration_s
FROM per CROSS JOIN tot GROUP BY last_role, n_total
"""
    sqls["turn_boilerplate"] = f"""
WITH tr AS ({_TR_CTE}),
r AS (
  SELECT conv_id, role, text,
         md5(regexp_replace(lower(trim(coalesce(text, ''))), '\\s+', ' ', 'g'))
           AS fp
  FROM tr
)
SELECT fp, role, CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(COUNT(*) AS BIGINT) AS n_turns, MIN(text) AS sample_text
FROM r GROUP BY fp, role
HAVING COUNT(DISTINCT conv_id) >= 2
"""
    sqls["text_entropy"] = f"""
WITH tok AS (
  SELECT doc_id, tok
  FROM (SELECT doc_id, {_doc_tokens()} AS tk FROM documents),
       LATERAL (SELECT unnest(tk) AS tok)
  WHERE tok <> ''
),
tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS c
  FROM tok GROUP BY doc_id, tok
),
per AS (
  SELECT doc_id, SUM(c) AS n, CAST(COUNT(*) AS DOUBLE) AS n_types,
         SUM(c * ln(c)) AS s
  FROM tf GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(per.n, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(per.n_types, 0) AS BIGINT) AS n_types,
       ROUND(COALESCE(per.n_types / per.n, 0.0), 6) AS ttr,
       ROUND(COALESCE((ln(per.n) - per.s / per.n) / ln(2), 0.0), 6)
         AS entropy_bits,
       ROUND(COALESCE(CASE WHEN per.n_types > 1
                 THEN (ln(per.n) - per.s / per.n) / ln(per.n_types)
                 ELSE 0.0 END, 0.0), 6) AS norm_entropy
FROM documents d LEFT JOIN per USING (doc_id)
"""
    sqls["hashed_features"] = f"""
WITH tok AS (
  SELECT doc_id, tok
  FROM (SELECT doc_id, {_doc_tokens()} AS tk FROM documents),
       LATERAL (SELECT unnest(tk) AS tok)
  WHERE tok <> ''
),
bc AS (
  SELECT doc_id,
         CAST(CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 64 AS INT)
           AS bucket,
         CAST(COUNT(*) AS BIGINT) AS count
  FROM tok GROUP BY 1, 2
),
tot AS (SELECT doc_id, SUM(count) AS n FROM bc GROUP BY doc_id)
SELECT bc.doc_id, bc.bucket, bc.count, ROUND(bc.count / tot.n, 6) AS tf
FROM bc JOIN tot USING (doc_id)
"""
    sqls["chunk_documents"] = f"""
WITH d AS (
  SELECT doc_id,
         list_filter({_doc_tokens()}, t -> t <> '') AS tk
  FROM documents
),
c AS (
  SELECT doc_id, tk, len(tk) AS n,
         CASE WHEN len(tk) <= 0 THEN 0
              WHEN len(tk) <= 32 THEN 1
              ELSE CAST(ceil((len(tk) - 32) / 24.0) AS INT) + 1 END AS n_chunks
  FROM d
),
x AS (
  SELECT doc_id, tk, n,
         CAST(ci AS INT) AS chunk_idx, CAST(ci * 24 AS INT) AS start_tok
  FROM c, LATERAL (SELECT unnest(range(n_chunks)) AS ci)
)
SELECT doc_id, chunk_idx, start_tok,
       CAST(least(32, n - start_tok) AS INT) AS n_tokens,
       array_to_string(list_slice(tk, start_tok + 1, start_tok + 32), ' ')
         AS chunk_text
FROM x
"""
    sqls["partition_compare"] = f"""
WITH edges AS ({_BIP_EDGES}),
verts AS (
  SELECT name,
    CASE WHEN name LIKE 'u:%' THEN CAST(substr(name, 3) AS BIGINT) % 8
         ELSE length(name) % 8 END AS c1,
    CASE WHEN name LIKE 'u:%' THEN CAST(substr(name, 3) AS BIGINT) % 5
         ELSE length(name) % 5 END AS c2
  FROM (SELECT src AS name FROM edges UNION SELECT dst FROM edges)
),
ct AS (SELECT c1, c2, CAST(COUNT(*) AS DOUBLE) AS nij FROM verts GROUP BY c1, c2),
a AS (SELECT c1, SUM(nij) AS ai, MAX(nij) AS mi FROM ct GROUP BY c1),
b AS (SELECT c2, SUM(nij) AS bj, MAX(nij) AS mj FROM ct GROUP BY c2),
at AS (SELECT SUM(ai) AS N, SUM(ai*(ai-1)/2.0) AS sa, SUM(mi) AS ma,
              SUM(ai*ln(ai)) AS la FROM a),
bt AS (SELECT SUM(bj*(bj-1)/2.0) AS sb, SUM(mj) AS mb, SUM(bj*ln(bj)) AS lb FROM b),
cc AS (SELECT SUM(nij*ln(nij)) AS lc, SUM(nij*(nij-1)/2.0) AS sab FROM ct)
SELECT CAST(N AS BIGINT) AS n_vertices,
  ROUND(CASE WHEN 2*ln(N) - la/N - lb/N > 0
             THEN 2*(lc/N - la/N - lb/N + ln(N)) / (2*ln(N) - la/N - lb/N)
             ELSE 1.0 END, 6) AS nmi,
  ROUND(2*ln(N) - la/N - lb/N - 2*(lc/N - la/N - lb/N + ln(N)), 6) AS vi,
  ROUND(CASE WHEN N > 1
             THEN (N*(N-1)/2.0 + 2*sab - sa - sb) / (N*(N-1)/2.0)
             ELSE 1.0 END, 6) AS rand,
  ROUND(CASE WHEN N > 1 AND (sa+sb)/2.0 - sa*sb/(N*(N-1)/2.0) > 0
             THEN (sab - sa*sb/(N*(N-1)/2.0))
                  / ((sa+sb)/2.0 - sa*sb/(N*(N-1)/2.0))
             ELSE 1.0 END, 6) AS adjusted_rand,
  CAST(2*N - ma - mb AS BIGINT) AS split_join
FROM cc CROSS JOIN at CROSS JOIN bt
"""
    sqls["kaplan_meier"] = """
WITH horizon AS (SELECT MAX(ts) AS h FROM events),
per AS (
  SELECT CAST(date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE)) AS BIGINT) AS t_days,
         (date_diff('day', CAST(MAX(ts) AS DATE), CAST(h AS DATE)) >= 1) AS is_death
  FROM events CROSS JOIN horizon GROUP BY user_id, h
),
cell AS (
  SELECT t_days,
         CAST(SUM(CASE WHEN is_death THEN 1 ELSE 0 END) AS BIGINT) AS n_death,
         CAST(SUM(CASE WHEN is_death THEN 0 ELSE 1 END) AS BIGINT) AS n_censor
  FROM per GROUP BY t_days
),
risk AS (
  SELECT t_days, n_death, n_censor,
         CAST(SUM(n_death + n_censor) OVER ()
              - COALESCE(SUM(n_death + n_censor) OVER (
                  ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n_risk
  FROM cell
)
SELECT t_days, n_risk, n_death, n_censor,
       ROUND(CASE WHEN MAX(CASE WHEN n_death >= n_risk THEN 1 ELSE 0 END)
                       OVER (ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
             THEN 0.0
             ELSE EXP(SUM(LN(1.0 - CAST(n_death AS DOUBLE) / n_risk))
                      OVER (ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             END, 6) AS survival
FROM risk ORDER BY t_days
"""
    sqls["ab_test"] = """
WITH per AS (
  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 32, 1)
              IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE 0 END AS variant,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
              THEN 1 ELSE 0 END AS converted,
         SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END) AS conv_value
  FROM events GROUP BY user_id
),
g AS (
  SELECT
    CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
    CAST(SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_b,
    ROUND(SUM(CASE WHEN variant = 0 AND converted = 1 THEN conv_value END), 6) AS v_a,
    ROUND(SUM(CASE WHEN variant = 1 AND converted = 1 THEN conv_value END), 6) AS v_b
  FROM per
)
SELECT n_a, n_b, conv_a, conv_b,
  ROUND(CAST(conv_a AS DOUBLE)/n_a, 6) AS rate_a,
  ROUND(CAST(conv_b AS DOUBLE)/n_b, 6) AS rate_b,
  ROUND(v_a/conv_a, 6) AS value_per_conv_a,
  ROUND(v_b/conv_b, 6) AS value_per_conv_b,
  ROUND(CAST(conv_b AS DOUBLE)/n_b - CAST(conv_a AS DOUBLE)/n_a, 6) AS lift_abs,
  ROUND((CAST(conv_b AS DOUBLE)/n_b - CAST(conv_a AS DOUBLE)/n_a)
        / SQRT((CAST(conv_a+conv_b AS DOUBLE)/(n_a+n_b))
               * (1.0 - CAST(conv_a+conv_b AS DOUBLE)/(n_a+n_b))
               * (1.0/n_a + 1.0/n_b)), 6) AS z_score
FROM g
"""
    couser_cte = """
cob AS MATERIALIZED (SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS h FROM events),
cow AS MATERIALIZED (
  SELECT x.user_id AS a, y.user_id AS b
  FROM cob x JOIN cob y
    ON x.event_type = y.event_type AND x.h = y.h AND x.user_id < y.user_id
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
),
tri AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM cow e1 JOIN cow e2 ON e2.a = e1.b
  JOIN cow e3 ON e3.a = e1.a AND e3.b = e2.b
)"""
    sqls["triangle_significance"] = f"""
WITH {couser_cte.strip()},
deg AS (
  SELECT id, CAST(COUNT(*) AS DOUBLE) AS k
  FROM (SELECT a AS id FROM cow UNION ALL SELECT b FROM cow) GROUP BY id
),
mom AS (
  SELECT SUM(POWER(k, 2)) AS p1, SUM(POWER(k, 4)) AS p2, SUM(POWER(k, 6)) AS p3,
         SUM(k) / 2.0 AS m
  FROM deg
),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM tri),
x AS (
  SELECT n_triangles,
         (POWER(p1, 3) - 3 * p1 * p2 + 2 * p3) / 6 / POWER(2 * m, 3) AS et
  FROM t CROSS JOIN mom
)
SELECT n_triangles, ROUND(et, 6) AS expected_config,
       ROUND(CASE WHEN et > 0 THEN n_triangles / et END, 6) AS ratio,
       ROUND(CASE WHEN et > 0 THEN (n_triangles - et) / sqrt(et) END, 6) AS z_poisson
FROM x
"""
    sqls["adoption_curve"] = f"""
WITH {couser_cte.strip()},
csym AS (SELECT a AS u, b AS v FROM cow UNION ALL SELECT b, a FROM cow),
ad AS (SELECT user_id AS id, MIN(ts) AS at FROM events
       WHERE event_type = 'purchase' GROUP BY user_id),
cverts AS (SELECT DISTINCT u AS id FROM csym),
adec AS (
  SELECT s.u,
         CASE WHEN av.at IS NOT NULL AND (au.at IS NULL OR av.at < au.at)
              THEN 1 ELSE 0 END AS ex,
         au.at AS at_u
  FROM csym s LEFT JOIN ad au ON au.id = s.u LEFT JOIN ad av ON av.id = s.v
),
pu AS (SELECT u AS id, SUM(ex) AS exposure, MAX(at_u) AS at_u FROM adec GROUP BY u),
fl AS (SELECT v.id, COALESCE(pu.exposure, 0) AS exposure, pu.at_u
       FROM cverts v LEFT JOIN pu USING (id))
SELECT CAST(exposure AS BIGINT) AS exposure,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN at_u IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_adopters,
       ROUND(CAST(SUM(CASE WHEN at_u IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
         AS adoption_rate
FROM fl GROUP BY exposure ORDER BY exposure
"""
    sqls["edge_embeddedness"] = f"""
WITH {couser_cte},
sides AS (
  SELECT x AS a, y AS b FROM tri
  UNION ALL SELECT x, z FROM tri
  UNION ALL SELECT y, z FROM tri
),
emb AS (
  SELECT c.a, c.b, COALESCE(s.c, 0) AS e
  FROM cow c LEFT JOIN (SELECT a, b, COUNT(*) AS c FROM sides GROUP BY a, b) s
  USING (a, b)
)
SELECT CAST(e AS BIGINT) AS embeddedness, CAST(COUNT(*) AS BIGINT) AS n_edges
FROM emb GROUP BY e ORDER BY e
"""
    # each round references the previous one exactly ONCE (self-loops in
    # mep carry the own label) — DuckDB inlines CTEs, so a two-reference
    # round would expand 2^8 copies of the base scan
    cp_rounds = []
    for r in range(1, 9):
        cp_rounds.append(f"""l{r} AS (
  SELECT p.d AS e, MIN(x.l) AS l FROM mep p JOIN l{r - 1} x ON x.e = p.s GROUP BY p.d
)""")
    sqls["clique_percolation"] = f"""
WITH {couser_cte},
mn AS MATERIALIZED (
  SELECT DISTINCT CAST(x AS VARCHAR) || '|' || CAST(y AS VARCHAR) AS e, x AS a, y AS b FROM tri
  UNION SELECT CAST(x AS VARCHAR) || '|' || CAST(z AS VARCHAR), x, z FROM tri
  UNION SELECT CAST(y AS VARCHAR) || '|' || CAST(z AS VARCHAR), y, z FROM tri
),
mpd AS (
  SELECT CAST(x AS VARCHAR) || '|' || CAST(y AS VARCHAR) AS s,
         CAST(y AS VARCHAR) || '|' || CAST(z AS VARCHAR) AS d FROM tri
  UNION ALL SELECT CAST(x AS VARCHAR) || '|' || CAST(y AS VARCHAR),
                   CAST(x AS VARCHAR) || '|' || CAST(z AS VARCHAR) FROM tri
  UNION ALL SELECT CAST(y AS VARCHAR) || '|' || CAST(z AS VARCHAR),
                   CAST(x AS VARCHAR) || '|' || CAST(z AS VARCHAR) FROM tri
),
mep AS MATERIALIZED (
  SELECT DISTINCT s, d FROM (
    SELECT s, d FROM mpd UNION ALL SELECT d, s FROM mpd
    UNION ALL SELECT e, e FROM mn
  )
),
l0 AS (SELECT e, e AS l FROM (SELECT DISTINCT e FROM mn)),
{",".join(cp_rounds)},
me AS (SELECT mn.a, mn.b, l8.l FROM mn JOIN l8 USING (e)),
mem AS (SELECT l, a AS v FROM me UNION ALL SELECT l, b FROM me),
cm AS (SELECT l, MIN(v) AS community FROM mem GROUP BY l)
SELECT DISTINCT CAST(v AS BIGINT) AS id, CAST(community AS BIGINT) AS community
FROM mem JOIN cm USING (l) ORDER BY id, community
"""
    sqls["activity_heatmap"] = """
WITH ahc AS (
  SELECT CAST(date_part('dow', ts) AS INT) AS dow,
         CAST(date_part('hour', ts) AS INT) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
aht AS (SELECT SUM(n) AS nt FROM ahc)
SELECT dow, hour, n, ROUND(n * 1.0 / nt, 6) AS share
FROM ahc CROSS JOIN aht ORDER BY dow, hour
"""
    sqls["fisher_ratio"] = """
WITH fex AS (
  SELECT label AS l, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
fcell AS (SELECT l, dim, AVG(v) AS mu, VAR_SAMP(v) AS s2 FROM fex GROUP BY l, dim),
fagg AS (SELECT dim, VAR_SAMP(mu) AS between_var, AVG(s2) AS within_var FROM fcell GROUP BY dim)
SELECT CAST(dim AS BIGINT) AS dim,
       ROUND(between_var, 6) AS between_var,
       ROUND(within_var, 6) AS within_var,
       ROUND(CASE WHEN within_var > 0 THEN between_var / within_var END, 6) AS fisher
FROM fagg ORDER BY dim
"""
    sqls["hhi_concentration"] = """
WITH hcell AS (SELECT event_type AS g, user_id, COUNT(*) AS c FROM events GROUP BY 1, 2),
htot AS (SELECT g, SUM(c) AS n FROM hcell GROUP BY g)
SELECT c.g AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_actors,
       CAST(MAX(t.n) AS BIGINT) AS n_events,
       ROUND(SUM((c.c * 1.0 / t.n) * (c.c * 1.0 / t.n)), 6) AS hhi,
       ROUND(1.0 / SUM((c.c * 1.0 / t.n) * (c.c * 1.0 / t.n)), 6) AS effective_actors
FROM hcell c JOIN htot t USING (g)
GROUP BY c.g ORDER BY event_type
"""
    sqls["ttr_stats"] = f"""
WITH ttok AS (
  SELECT doc_id, t FROM (SELECT doc_id, unnest({toks}) AS t FROM documents)
  WHERE length(t) > 0
),
ttc AS (SELECT doc_id, t, COUNT(*) AS c FROM ttok GROUP BY 1, 2),
tper AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
  FROM ttc GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(p.n_tokens, 0) AS n_tokens,
       COALESCE(p.n_types, 0) AS n_types,
       ROUND(CASE WHEN p.n_tokens > 0 THEN p.n_types * 1.0 / p.n_tokens END, 6) AS ttr,
       ROUND(CASE WHEN p.n_types > 0 THEN p.n_hapax * 1.0 / p.n_types END, 6) AS hapax_frac
FROM documents d LEFT JOIN tper p USING (doc_id) ORDER BY doc_id
"""
    sqls["wilson_error_rates"] = """
WITH wper AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
  FROM events GROUP BY user_id
),
wg AS (
  SELECT SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS g
  FROM events
)
SELECT user_id, n, n_errors,
       ROUND(n_errors * 1.0 / n, 6) AS rate,
       ROUND(((n_errors * 1.0 / n) + 3.8416 / (2 * n)) / (1.0 + 3.8416 / n)
             - 1.96 * SQRT((n_errors * 1.0 / n) * (1.0 - n_errors * 1.0 / n) / n
                           + 3.8416 / (4.0 * n * n)) / (1.0 + 3.8416 / n), 6) AS wilson_low,
       ROUND(((n_errors * 1.0 / n) + 3.8416 / (2 * n)) / (1.0 + 3.8416 / n)
             + 1.96 * SQRT((n_errors * 1.0 / n) * (1.0 - n_errors * 1.0 / n) / n
                           + 3.8416 / (4.0 * n * n)) / (1.0 + 3.8416 / n), 6) AS wilson_high,
       ROUND(((n_errors * 1.0 / n) + 3.8416 / (2 * n)) / (1.0 + 3.8416 / n)
             - 1.96 * SQRT((n_errors * 1.0 / n) * (1.0 - n_errors * 1.0 / n) / n
                           + 3.8416 / (4.0 * n * n)) / (1.0 + 3.8416 / n), 6) > g AS is_elevated
FROM wper CROSS JOIN wg ORDER BY user_id
"""
    sqls["activity_correlation"] = """
WITH accnt AS (
  SELECT user_id, date_trunc('day', ts) AS day, CAST(COUNT(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
),
acj AS (
  SELECT a.day, a.x, b.x AS y
  FROM accnt a JOIN accnt b
    ON b.user_id = a.user_id AND b.day = a.day + INTERVAL 1 DAY
),
acagg AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_both,
         AVG(x) AS mx, AVG(y) AS my, AVG(x * y) AS mxy,
         AVG(x * x) AS mxx, AVG(y * y) AS myy
  FROM acj GROUP BY day
)
SELECT CAST(day AS TIMESTAMP) AS day, CAST(day + INTERVAL 1 DAY AS TIMESTAMP) AS next_day, n_both,
       ROUND(CASE WHEN (mxx - mx * mx) > 0 AND (myy - my * my) > 0
             THEN (mxy - mx * my) / SQRT((mxx - mx * mx) * (myy - my * my))
             END, 6) AS r
FROM acagg ORDER BY day
"""
    sqls["peak_days"] = """
WITH pkc AS (
  SELECT event_type AS g, date_trunc('day', ts) AS day, CAST(COUNT(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2
),
pkb AS (
  SELECT g, day, n,
         CASE WHEN COUNT(*) OVER w >= 7 THEN MEDIAN(n) OVER w END AS baseline
  FROM pkc
  WINDOW w AS (PARTITION BY g ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT g AS event_type, CAST(day AS TIMESTAMP) AS day, CAST(n AS BIGINT) AS n,
       ROUND(baseline, 6) AS baseline,
       COALESCE(n > 1.5 * baseline, FALSE) AS is_peak
FROM pkb ORDER BY event_type, day
"""
    sqls["linkpred_eval"] = f"""
WITH {couser_cte},
lpcoin AS (
  SELECT a, b,
         ('0x' || substr(md5('h42:' || CAST(a AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS c
  FROM cow
),
lptest AS MATERIALIZED (SELECT a, b FROM lpcoin WHERE c < 0.2),
lptrain AS MATERIALIZED (SELECT a, b FROM lpcoin WHERE c >= 0.2),
lpadj AS (SELECT a AS w, b AS x FROM lptrain UNION ALL SELECT b, a FROM lptrain),
lpdeg AS (SELECT w, COUNT(*) AS deg FROM lpadj GROUP BY w),
lpc AS (
  SELECT a.w, a.x, 1.0 / LN(d.deg) AS cw
  FROM lpadj a JOIN lpdeg d USING (w) WHERE d.deg > 1 AND d.deg <= 100000
),
lpw AS (SELECT l.x AS src, r.x AS dst, l.cw FROM lpc l JOIN lpc r ON l.w = r.w AND l.x < r.x),
lps AS (SELECT src, dst, COUNT(*) AS n_common, ROUND(SUM(cw), 6) AS aa FROM lpw GROUP BY 1, 2),
lpnon AS (
  SELECT s.* FROM lps s LEFT JOIN lptrain t ON t.a = s.src AND t.b = s.dst
  WHERE t.a IS NULL
),
lptop AS (
  SELECT src, dst FROM (
    SELECT src, dst, ROW_NUMBER() OVER (ORDER BY aa DESC, src, dst) AS rn FROM lpnon
  ) WHERE rn <= (SELECT COUNT(*) FROM lptest)
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lptest) AS n_test,
       CAST(COUNT(*) AS BIGINT) AS n_hits,
       ROUND(COUNT(*) * 1.0 / (SELECT COUNT(*) FROM lptest), 6) AS precision
FROM lptop JOIN lptest t ON t.a = lptop.src AND t.b = lptop.dst
"""
    sqls["benford_test"] = """
WITH bpos AS (
  SELECT CAST(FLOOR(value / POWER(10.0, FLOOR(LOG10(value)))) AS INT) AS digit
  FROM events WHERE value > 0
),
bcell AS (SELECT digit, COUNT(*) AS n FROM bpos GROUP BY digit),
btot AS (SELECT SUM(n) AS nt FROM bcell)
SELECT CAST(digit AS BIGINT) AS digit, CAST(n AS BIGINT) AS n,
       ROUND(n * 1.0 / nt, 6) AS observed,
       ROUND(LOG10(1.0 + 1.0 / digit), 6) AS expected,
       ROUND(nt * (n * 1.0 / nt - LOG10(1.0 + 1.0 / digit))
                * (n * 1.0 / nt - LOG10(1.0 + 1.0 / digit))
                / LOG10(1.0 + 1.0 / digit), 6) AS chi2_term
FROM bcell CROSS JOIN btot ORDER BY digit
"""
    sqls["balance_labels"] = """
WITH bl AS (
  SELECT vec_id, label,
         ROW_NUMBER() OVER (
           PARTITION BY label
           ORDER BY md5('42:' || CAST(vec_id AS VARCHAR)), vec_id
         ) AS rk
  FROM embeddings
),
blmin AS (SELECT MIN(n) AS n_min FROM (SELECT COUNT(*) AS n FROM embeddings GROUP BY label))
SELECT vec_id, label, CAST(rk AS BIGINT) AS rk
FROM bl CROSS JOIN blmin WHERE rk <= n_min ORDER BY label, rk
"""
    hv_blocks = "\n    UNION ALL ".join(
        f"""SELECT event_type AS g, {h}.0 AS scale, CAST(COUNT(*) AS DOUBLE) AS x
    FROM events GROUP BY event_type, FLOOR(epoch_us(ts) / (3600000000.0 * {h}))"""
        for h in (1, 2, 4, 8)
    )
    sqls["hurst_variance"] = f"""
WITH hvx AS (
    {hv_blocks}
),
hv AS (SELECT g, scale, VAR_SAMP(x / scale) AS v FROM hvx GROUP BY g, scale),
hpts AS (SELECT g, LN(scale) AS lx, LN(v) AS ly FROM hv WHERE v > 0),
hreg AS (
  SELECT g, COUNT(*) AS n, AVG(lx) AS mx, AVG(ly) AS my,
         SUM(lx * ly) AS sxy, SUM(lx * lx) AS sxx
  FROM hpts GROUP BY g
)
SELECT g AS event_type,
       ROUND((sxy - n * mx * my) / (sxx - n * mx * mx), 6) AS slope,
       ROUND(1.0 + ((sxy - n * mx * my) / (sxx - n * mx * mx)) / 2.0, 6) AS hurst,
       CAST(n AS BIGINT) AS n_scales
FROM hreg ORDER BY event_type
"""
    sqls["gopher_rules"] = """
WITH gw AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words,
         list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), x -> x <> '') AS lines
  FROM documents
),
gs AS (
  SELECT doc_id,
         len(words) AS n_words,
         CASE WHEN len(words) > 0 THEN ROUND(list_aggregate(list_transform(words, x -> CAST(length(x) AS DOUBLE)), 'sum') / len(words), 6) ELSE 0.0 END AS mean_word_len,
         CASE WHEN len(words) > 0 THEN ROUND((length(text) - length(replace(text, '#', ''))
              + (length(text) - length(replace(text, '...', ''))) // 3
              + length(text) - length(replace(text, '…', ''))) * 1.0 / len(words), 6) ELSE 0.0 END AS symbol_ratio,
         CASE WHEN len(words) > 0 THEN ROUND(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) * 1.0 / len(words), 6) ELSE 0.0 END AS alpha_word_frac,
         len(list_filter(words, x -> list_contains(['the','be','to','of','and','that','have','with'], lower(x)))) AS n_stopwords,
         CASE WHEN len(lines) > 0 THEN ROUND(len(list_filter(lines, x -> substr(x, 1, 1) IN ('-','*','•'))) * 1.0 / len(lines), 6) ELSE 0.0 END AS bullet_line_frac,
         CASE WHEN len(lines) > 0 THEN ROUND(len(list_filter(lines, x -> right(x, 3) = '...' OR right(x, 1) = '…')) * 1.0 / len(lines), 6) ELSE 0.0 END AS ellipsis_line_frac
  FROM gw
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, mean_word_len, symbol_ratio,
       alpha_word_frac, CAST(n_stopwords AS BIGINT) AS n_stopwords,
       bullet_line_frac, ellipsis_line_frac,
       (n_words >= 50 AND n_words <= 100000 AND mean_word_len >= 3 AND mean_word_len <= 10
        AND symbol_ratio <= 0.1 AND bullet_line_frac <= 0.9 AND ellipsis_line_frac <= 0.3
        AND alpha_word_frac >= 0.8 AND n_stopwords >= 2) AS passes_gopher
FROM gs ORDER BY doc_id
"""
    sqls["readability"] = """
SELECT doc_id,
  CAST(len(regexp_extract_all(lower(COALESCE(text, '')), '[a-z0-9'']+')) AS BIGINT) AS n_words,
  CAST(GREATEST(len(regexp_extract_all(lower(COALESCE(text, '')), '[.!?]+')), 1) AS BIGINT) AS n_sentences,
  CAST(len(regexp_extract_all(lower(COALESCE(text, '')), '[aeiouy]+')) AS BIGINT) AS n_syllables,
  ROUND(CASE WHEN n_words > 0
        THEN 0.39 * (n_words * 1.0 / n_sentences) + 11.8 * (n_syllables * 1.0 / n_words) - 15.59
        END, 6) AS fk_grade
FROM documents ORDER BY doc_id
"""
    sqls["sbm_fit"] = """
WITH sbcob AS (SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS h FROM events),
sbe AS (
  SELECT x.user_id AS a, y.user_id AS b
  FROM sbcob x JOIN sbcob y
    ON x.event_type = y.event_type AND x.h = y.h AND x.user_id < y.user_id
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
),
sbv AS (SELECT DISTINCT id FROM (SELECT a AS id FROM sbe UNION ALL SELECT b FROM sbe)),
sbm AS (SELECT id, id % 4 AS comm FROM sbv),
sbp AS (
  SELECT LEAST(ma.comm, mb.comm) AS comm_a, GREATEST(ma.comm, mb.comm) AS comm_b,
         CAST(COUNT(*) AS DOUBLE) AS m
  FROM sbe e JOIN sbm ma ON ma.id = e.a JOIN sbm mb ON mb.id = e.b
  GROUP BY 1, 2
),
sbd AS (
  SELECT id, CAST(COUNT(*) AS DOUBLE) AS k FROM (
    SELECT a AS id FROM sbe UNION ALL SELECT b FROM sbe
  ) GROUP BY id
),
sbb AS (
  SELECT m.comm, CAST(COUNT(*) AS DOUBLE) AS n, SUM(COALESCE(d.k, 0)) AS kappa
  FROM sbm m LEFT JOIN sbd d ON d.id = m.id GROUP BY m.comm
),
sbj AS (
  SELECT p.comm_a, p.comm_b, p.m,
         CASE WHEN p.comm_a = p.comm_b THEN ba.n * (ba.n - 1) / 2
              ELSE ba.n * bb.n END AS n_pairs,
         ba.kappa AS kap_a, bb.kappa AS kap_b,
         CASE WHEN p.comm_a = p.comm_b THEN 2.0 * p.m ELSE p.m END AS m_dc
  FROM sbp p JOIN sbb ba ON ba.comm = p.comm_a JOIN sbb bb ON bb.comm = p.comm_b
)
SELECT CAST(comm_a AS BIGINT) AS comm_a, CAST(comm_b AS BIGINT) AS comm_b,
       CAST(m AS BIGINT) AS m_ab, CAST(n_pairs AS BIGINT) AS n_pairs,
       ROUND(m / n_pairs, 6) AS p_ab,
       ROUND(CASE WHEN m > 0 THEN m * LN(m / n_pairs) ELSE 0 END
             + CASE WHEN n_pairs - m > 0 THEN (n_pairs - m) * LN(1.0 - m / n_pairs) ELSE 0 END,
             6) AS ll_bern,
       ROUND(CASE WHEN kap_a > 0 AND kap_b > 0 AND m > 0
             THEN m_dc * LN(m_dc / (kap_a * kap_b)) ELSE 0 END, 6) AS ll_dc
FROM sbj ORDER BY comm_a, comm_b
"""
    sqls["disparity_backbone"] = """
WITH dcob AS (SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS h FROM events),
dcw AS (
  SELECT x.user_id AS a, y.user_id AS b, CAST(COUNT(*) AS DOUBLE) AS w
  FROM dcob x JOIN dcob y
    ON x.event_type = y.event_type AND x.h = y.h AND x.user_id < y.user_id
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
),
ddeg AS (
  SELECT id, COUNT(*) AS k, SUM(w) AS s FROM (
    SELECT a AS id, w FROM dcw UNION ALL SELECT b, w FROM dcw
  ) GROUP BY id
)
SELECT c.a, c.b, ROUND(c.w, 6) AS weight,
       ROUND(LEAST(
         CASE WHEN da.k > 1 THEN POWER(1.0 - c.w / da.s, da.k - 1) ELSE 0.0 END,
         CASE WHEN db.k > 1 THEN POWER(1.0 - c.w / db.s, db.k - 1) ELSE 0.0 END
       ), 6) AS alpha_min,
       ROUND(LEAST(
         CASE WHEN da.k > 1 THEN POWER(1.0 - c.w / da.s, da.k - 1) ELSE 0.0 END,
         CASE WHEN db.k > 1 THEN POWER(1.0 - c.w / db.s, db.k - 1) ELSE 0.0 END
       ), 6) < 0.3 AS keep
FROM dcw c JOIN ddeg da ON da.id = c.a JOIN ddeg db ON db.id = c.b
ORDER BY a, b
"""
    sqls["actor_behavior_kl"] = """
WITH apair AS (SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2),
ak AS (SELECT user_id, SUM(c) AS nk FROM apair GROUP BY 1),
al AS (SELECT event_type, SUM(c) AS nl FROM apair GROUP BY 1),
at2 AS (SELECT SUM(c) AS nt FROM apair)
SELECT p.user_id, CAST(SUM(p.c) AS BIGINT) AS n_events,
       ROUND(SUM((p.c * 1.0 / k.nk) * LN((p.c * 1.0 / k.nk) / (l.nl * 1.0 / t.nt))), 6) AS kl
FROM apair p JOIN ak k USING (user_id) JOIN al l USING (event_type) CROSS JOIN at2 t
GROUP BY p.user_id ORDER BY user_id
"""
    sqls["knn_label_assortativity"] = f"""
WITH kg AS ({_knn_graph_oracle(k=3, n_planes=5)}),
kund AS (SELECT DISTINCT src AS a, dst AS b FROM kg WHERE src <> dst),
ksym AS (SELECT a, b FROM kund UNION ALL SELECT b, a FROM kund),
klab AS (
  SELECT va.label AS ca, vb.label AS cb
  FROM ksym s JOIN embeddings va ON s.a = va.vec_id JOIN embeddings vb ON s.b = vb.vec_id
),
ke AS (SELECT ca, cb, CAST(COUNT(*) AS DOUBLE) AS w FROM klab GROUP BY 1, 2),
ktot AS (SELECT SUM(w) AS W FROM ke),
keii AS (SELECT COALESCE(SUM(CASE WHEN ca = cb THEN w END), 0) AS diag FROM ke),
ksq AS (
  SELECT SUM((ai / W) * (ai / W)) AS s
  FROM (SELECT ca, SUM(w) AS ai FROM ke GROUP BY ca), ktot
)
SELECT ROUND(CASE WHEN s < 1.0 THEN (diag / W - s) / (1.0 - s) END, 6) AS assortativity
FROM keii, ktot, ksq
"""
    sqls["barrat_clustering"] = """
WITH bcob AS (SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS h FROM events),
bcw AS (
  SELECT x.user_id AS a, y.user_id AS b, CAST(COUNT(*) AS DOUBLE) AS w
  FROM bcob x JOIN bcob y
    ON x.event_type = y.event_type AND x.h = y.h AND x.user_id < y.user_id
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
),
bdeg AS (
  SELECT id, COUNT(*) AS k, SUM(w) AS s FROM (
    SELECT a AS id, w FROM bcw UNION ALL SELECT b, w FROM bcw
  ) GROUP BY id
),
btri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM bcw e1 JOIN bcw e2 ON e2.a = e1.b
  JOIN bcw e3 ON e3.a = e1.a AND e3.b = e2.b
),
binc AS (
  SELECT x AS v, y AS p1, z AS p2 FROM btri
  UNION ALL SELECT y, x, z FROM btri
  UNION ALL SELECT z, x, y FROM btri
),
bw1 AS (
  SELECT i.v, i.p2, w.w AS w1 FROM binc i
  JOIN bcw w ON w.a = LEAST(i.v, i.p1) AND w.b = GREATEST(i.v, i.p1)
),
bsum AS (
  SELECT v, SUM(w1 + w2) AS tw FROM (
    SELECT b1.v, b1.w1, w.w AS w2 FROM bw1 b1
    JOIN bcw w ON w.a = LEAST(b1.v, b1.p2) AND w.b = GREATEST(b1.v, b1.p2)
  ) GROUP BY v
)
SELECT d.id, CAST(d.k AS BIGINT) AS degree, ROUND(d.s, 6) AS strength,
       ROUND(CASE WHEN d.k > 1 AND d.s > 0
             THEN COALESCE(t.tw, 0) / (d.s * (d.k - 1)) ELSE 0.0 END, 6) AS cw
FROM bdeg d LEFT JOIN bsum t ON t.v = d.id ORDER BY id
"""
    sqls["slo_burn"] = """
WITH bucnt AS (
  SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
  FROM events GROUP BY 1
)
SELECT CAST(day AS TIMESTAMP) AS day, n, n_errors, ROUND(n_errors * 1.0 / n, 6) AS error_rate,
       ROUND(SUM(n_errors * 1.0 / n - 0.2)
             OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cum_burn
FROM bucnt ORDER BY day
"""
    sqls["slice_layers"] = """
WITH slbase AS (
  SELECT CAST(FLOOR(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 10.0) AS INT) AS slice,
         user_id AS src, event_type
  FROM events
),
sltid AS (
  SELECT event_type, -CAST(ROW_NUMBER() OVER (ORDER BY event_type) AS BIGINT) AS dst
  FROM (SELECT DISTINCT event_type FROM events)
),
sle AS (
  SELECT slice, src, dst, CAST(COUNT(*) AS DOUBLE) AS weight
  FROM slbase JOIN sltid USING (event_type) GROUP BY 1, 2, 3
),
slv AS (
  SELECT DISTINCT slice, id FROM (
    SELECT slice, src AS id FROM sle UNION ALL SELECT slice, dst FROM sle
  )
),
slpair AS (
  SELECT slice AS s_a, LEAD(slice) OVER (ORDER BY slice) AS s_b
  FROM (SELECT DISTINCT slice FROM slv)
  QUALIFY s_b IS NOT NULL
),
slcommon AS (
  SELECT p.s_a, p.s_b, a.id
  FROM slpair p JOIN slv a ON a.slice = p.s_a JOIN slv b ON b.slice = p.s_b AND b.id = a.id
),
intra AS (
  SELECT CAST(slice AS BIGINT) AS layer_key, CAST(COUNT(*) AS BIGINT) AS n_edges,
         ROUND(SUM(weight), 6) AS total_weight
  FROM sle GROUP BY 1
),
intrav AS (
  SELECT CAST(slice AS BIGINT) AS layer_key, CAST(COUNT(DISTINCT id) AS BIGINT) AS n_vertices
  FROM slv GROUP BY 1
),
interv AS (
  SELECT CAST(COUNT(DISTINCT (s, id)) AS BIGINT) AS n_vertices FROM (
    SELECT s_a AS s, id FROM slcommon UNION ALL SELECT s_b, id FROM slcommon
  )
),
inter AS (
  SELECT CAST(-1 AS BIGINT) AS layer_key, CAST(COUNT(*) AS BIGINT) AS n_edges,
         ROUND(SUM(2.0), 6) AS total_weight
  FROM slcommon
)
SELECT i.layer_key, i.n_edges, i.total_weight, v.n_vertices
FROM intra i JOIN intrav v USING (layer_key)
UNION ALL
SELECT e.layer_key, e.n_edges, e.total_weight, ev2.n_vertices
FROM inter e CROSS JOIN interv ev2
ORDER BY layer_key
"""
    sqls["quality_multiplex"] = f"""
WITH {_DET_PRELUDE.strip()},
qmcob AS (SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS h FROM events),
qml1 AS (
  SELECT x.user_id * 2 AS src, y.user_id * 2 AS dst, CAST(COUNT(*) AS DOUBLE) AS w
  FROM qmcob x JOIN qmcob y
    ON x.event_type = y.event_type AND x.h = y.h AND x.user_id < y.user_id
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
),
qm0i AS (SELECT src % 4 AS comm, SUM(weight) AS w_in FROM edges WHERE src % 4 = dst % 4 GROUP BY 1),
qm0k AS (
  SELECT comm, SUM(w) AS k FROM (
    SELECT src % 4 AS comm, weight AS w FROM edges
    UNION ALL SELECT dst % 4, weight FROM edges
  ) GROUP BY 1
),
qm0w AS (SELECT SUM(weight) AS W FROM edges),
qmq0 AS (
  SELECT SUM(COALESCE(i.w_in, 0) / W - k.k * k.k / (4.0 * W * W)) AS q0
  FROM qm0k k LEFT JOIN qm0i i USING (comm) CROSS JOIN qm0w
),
qmsz AS (SELECT id % 4 AS comm, CAST(COUNT(*) AS DOUBLE) AS n_c FROM verts GROUP BY 1),
qm1i AS (SELECT src % 4 AS comm, SUM(w) AS w_in FROM qml1 WHERE src % 4 = dst % 4 GROUP BY 1),
qmq1 AS (
  SELECT SUM(COALESCE(i.w_in, 0) - 0.5 * s.n_c * (s.n_c - 1) / 2.0) AS q1
  FROM qmsz s LEFT JOIN qm1i i USING (comm)
)
SELECT ROUND(q0 + 0.5 * q1, 6) AS value FROM qmq0 CROSS JOIN qmq1
"""
    sqls["quality_moddensity"] = f"""
WITH {_DET_PRELUDE.strip()},
mdt AS (SELECT src % 4 AS ca, dst % 4 AS cb, weight FROM edges),
mdi AS (SELECT ca AS comm, SUM(weight) AS w_in FROM mdt WHERE ca = cb GROUP BY 1),
mdc AS (
  SELECT comm, SUM(weight) AS w_out FROM (
    SELECT ca AS comm, weight FROM mdt WHERE ca <> cb
    UNION ALL SELECT cb, weight FROM mdt WHERE ca <> cb
  ) GROUP BY comm
),
mds AS (SELECT id % 4 AS comm, COUNT(*) AS n_c FROM verts GROUP BY 1)
SELECT ROUND(SUM((2.0 * COALESCE(i.w_in, 0) - COALESCE(c.w_out, 0)) / s.n_c), 6) AS value
FROM mds s LEFT JOIN mdi i USING (comm) LEFT JOIN mdc c USING (comm)
"""
    sqls["collective_influence"] = f"""
WITH {couser_cte},
cisym AS (SELECT a, b FROM cow UNION ALL SELECT b, a FROM cow),
cideg AS (SELECT a AS id, COUNT(*) AS k FROM cisym GROUP BY a),
cis AS (
  SELECT s.a AS v, SUM(d.k - 1) AS shell_sum
  FROM cisym s JOIN cideg d ON d.id = s.b GROUP BY s.a
)
SELECT d.id, CAST(d.k AS BIGINT) AS degree,
       CAST((d.k - 1) * COALESCE(c.shell_sum, 0) AS BIGINT) AS ci
FROM cideg d LEFT JOIN cis c ON c.v = d.id ORDER BY id
"""
    sqls["markov_accuracy"] = """
WITH mtr AS (
  SELECT event_type AS cur,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS nxt
  FROM events
),
mtrf AS (SELECT cur, nxt FROM mtr WHERE nxt IS NOT NULL),
mmat AS (SELECT cur, nxt, COUNT(*) AS c FROM mtrf GROUP BY 1, 2),
mtop AS (
  SELECT cur, nxt AS top_next FROM (
    SELECT cur, nxt, ROW_NUMBER() OVER (PARTITION BY cur ORDER BY c DESC, nxt ASC) AS rk
    FROM mmat
  ) WHERE rk = 1
)
SELECT t.cur AS event_type, CAST(COUNT(*) AS BIGINT) AS n_transitions,
       MIN(p.top_next) AS top_next,
       ROUND(AVG(CASE WHEN t.nxt = p.top_next THEN 1.0 ELSE 0.0 END), 6) AS accuracy
FROM mtrf t JOIN mtop p USING (cur)
GROUP BY t.cur ORDER BY event_type
"""
    sqls["containment_pairs"] = f"""
WITH {shingle_cte},
cshc AS (
  SELECT sh.doc_id, sh.shingle FROM sh
  JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000) ok
  USING (shingle)
),
csizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM cshc GROUP BY doc_id),
cinter AS (
  SELECT s1.doc_id AS a, s2.doc_id AS b, COUNT(*) AS i
  FROM cshc s1 JOIN cshc s2 ON s1.shingle = s2.shingle AND s1.doc_id <> s2.doc_id
  GROUP BY 1, 2
)
SELECT a, b, ROUND(i * 1.0 / sa.n_sh, 6) AS containment,
       ROUND(i * 1.0 / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
FROM cinter JOIN csizes sa ON cinter.a = sa.doc_id JOIN csizes sb ON cinter.b = sb.doc_id
WHERE ROUND(i * 1.0 / sa.n_sh, 6) >= 0.8 ORDER BY a, b
"""
    sqls["tfidf_cosine"] = """
WITH tctok AS (
  SELECT doc_id, tok
  FROM (SELECT doc_id, string_split_regex(lower(trim(coalesce(text,''))), '\\s+') AS tk FROM documents),
       LATERAL (SELECT unnest(tk) AS tok)
  WHERE tok <> ''
),
tctf AS (SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf FROM tctok GROUP BY 1, 2),
tcdf AS (SELECT tok, COUNT(*) AS df FROM tctf GROUP BY tok),
tcn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
tcw AS (
  SELECT t.doc_id, t.tok, d.df, t.tf * LN(n.n_docs / d.df) AS w
  FROM tctf t JOIN tcdf d USING (tok) CROSS JOIN tcn n
),
tcnorm AS (SELECT doc_id, SQRT(SUM(w * w)) AS nrm FROM tcw GROUP BY doc_id),
tcdot AS (
  SELECT x.doc_id AS a, y.doc_id AS b, SUM(x.w * y.w) AS dot
  FROM tcw x JOIN tcw y ON x.tok = y.tok AND x.doc_id < y.doc_id
  WHERE x.df <= 1000 AND y.df <= 1000
  GROUP BY 1, 2
)
SELECT a, b, ROUND(dot / (na.nrm * nb.nrm), 6) AS cosine
FROM tcdot JOIN tcnorm na ON tcdot.a = na.doc_id JOIN tcnorm nb ON tcdot.b = nb.doc_id
WHERE ROUND(dot / (na.nrm * nb.nrm), 6) >= 0.85 ORDER BY a, b
"""
    sqls["intrinsic_dim"] = """
WITH ipairs AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         SQRT(list_sum(list_transform(list_zip(a.embedding, b.embedding),
              p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                 * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))) AS dist
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
),
itwo AS (
  SELECT src, dist, ROW_NUMBER() OVER (PARTITION BY src ORDER BY dist ASC, dst ASC) AS rk
  FROM ipairs
),
irt AS (
  SELECT src, MAX(CASE WHEN rk = 1 THEN dist END) AS r1,
         MAX(CASE WHEN rk = 2 THEN dist END) AS r2
  FROM itwo WHERE rk <= 2 GROUP BY src
),
ilr AS (SELECT LN(r2 / r1) AS lr FROM irt WHERE r1 > 0 AND r2 IS NOT NULL)
SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
       ROUND(AVG(lr), 6) AS mean_log_ratio,
       ROUND(COUNT(*) * 1.0 / SUM(lr), 6) AS intrinsic_dim
FROM ilr
"""
    bedge_rows = ", ".join(f"({a}, {b})" for a, b in _BRIDGE_FIXTURE)
    bprobe_rows = ", ".join(f"({k}, {a}, {b})" for k, (a, b) in enumerate(_BRIDGE_FIXTURE))
    br_rounds = []
    for t in range(1, 15):
        br_rounds.append(f"""br{t} AS MATERIALIZED (
  SELECT DISTINCT k, v FROM (
    SELECT k, v FROM br{t - 1}
    UNION ALL
    SELECT j.k, e.dst AS v FROM br{t - 1} j JOIN bexsym e ON e.k = j.k AND e.src = j.v
  )
)""")
    sqls["bridges"] = f"""
WITH bedges(a, b) AS (VALUES {bedge_rows}),
bprobes(k, u, w) AS (VALUES {bprobe_rows}),
bsym AS (SELECT a AS src, b AS dst FROM bedges UNION ALL SELECT b, a FROM bedges),
bexsym AS MATERIALIZED (
  SELECT p.k, s.src, s.dst FROM bprobes p JOIN bsym s
  ON NOT ((s.src = p.u AND s.dst = p.w) OR (s.src = p.w AND s.dst = p.u))
),
br0 AS (SELECT k, u AS v FROM bprobes),
{",".join(br_rounds)}
SELECT CAST(p.u AS BIGINT) AS a, CAST(p.w AS BIGINT) AS b,
       (r.v IS NULL) AS is_bridge
FROM bprobes p LEFT JOIN br14 r ON r.k = p.k AND r.v = p.w
ORDER BY a, b
"""
    # articulation_points: brute-force per-vertex removal on the same
    # fixture — min-label propagation over G−v (14 rounds ≥ any G−v
    # diameter on 15 vertices); a vertex's block count = the number of
    # distinct G−v component labels among its neighbours
    ap_vrows = ", ".join(
        f"({v})" for v in sorted({x for e in _BRIDGE_FIXTURE for x in e})
    )
    ap_rounds = []
    for t in range(1, 15):
        ap_rounds.append(f"""ap{t} AS MATERIALIZED (
  SELECT u.v, u.node, MIN(u.lbl) AS lbl FROM (
    SELECT v, node, lbl FROM ap{t - 1}
    UNION ALL
    SELECT e.v, e.dst AS node, l.lbl FROM apexsym e
    JOIN ap{t - 1} l ON l.v = e.v AND l.node = e.src
  ) u GROUP BY u.v, u.node
)""")
    sqls["articulation_points"] = f"""
WITH apedges(a, b) AS (VALUES {bedge_rows}),
apverts(v) AS (VALUES {ap_vrows}),
apsym AS (SELECT a AS src, b AS dst FROM apedges UNION ALL SELECT b, a FROM apedges),
apexsym AS MATERIALIZED (
  SELECT p.v, s.src, s.dst FROM apverts p JOIN apsym s
  ON s.src <> p.v AND s.dst <> p.v
),
ap0 AS (SELECT p.v, n.v AS node, n.v AS lbl FROM apverts p JOIN apverts n ON n.v <> p.v),
{",".join(ap_rounds)}
SELECT CAST(p.v AS BIGINT) AS id,
       CAST(COUNT(DISTINCT l.lbl) AS BIGINT) AS n_blocks,
       (COUNT(DISTINCT l.lbl) >= 2) AS is_articulation
FROM apverts p
JOIN apsym s ON s.src = p.v
JOIN ap14 l ON l.v = p.v AND l.node = s.dst
GROUP BY p.v
ORDER BY id
"""
    sqls["shortest_cycles"] = f"""
WITH gcedges(a, b) AS (VALUES {bedge_rows}),
gcprobes(k, u, w) AS (VALUES {bprobe_rows}),
gcsym AS (SELECT a AS src, b AS dst FROM gcedges UNION ALL SELECT b, a FROM gcedges),
gcexsym AS MATERIALIZED (
  SELECT p.k, s.src, s.dst FROM gcprobes p JOIN gcsym s
  ON NOT ((s.src = p.u AND s.dst = p.w) OR (s.src = p.w AND s.dst = p.u))
),
gc0 AS (SELECT k, u AS v, 0 AS d FROM gcprobes),
gc1 AS MATERIALIZED (
  SELECT u.k, u.v, MIN(u.d) AS d FROM (
    SELECT k, v, d FROM gc0
    UNION ALL
    SELECT j.k, e.dst AS v, j.d + 1 AS d FROM gc0 j
    JOIN gcexsym e ON e.k = j.k AND e.src = j.v
  ) u GROUP BY u.k, u.v
),gc2 AS MATERIALIZED (
  SELECT u.k, u.v, MIN(u.d) AS d FROM (
    SELECT k, v, d FROM gc1
    UNION ALL
    SELECT j.k, e.dst AS v, j.d + 1 AS d FROM gc1 j
    JOIN gcexsym e ON e.k = j.k AND e.src = j.v
  ) u GROUP BY u.k, u.v
),gc3 AS MATERIALIZED (
  SELECT u.k, u.v, MIN(u.d) AS d FROM (
    SELECT k, v, d FROM gc2
    UNION ALL
    SELECT j.k, e.dst AS v, j.d + 1 AS d FROM gc2 j
    JOIN gcexsym e ON e.k = j.k AND e.src = j.v
  ) u GROUP BY u.k, u.v
),gc4 AS MATERIALIZED (
  SELECT u.k, u.v, MIN(u.d) AS d FROM (
    SELECT k, v, d FROM gc3
    UNION ALL
    SELECT j.k, e.dst AS v, j.d + 1 AS d FROM gc3 j
    JOIN gcexsym e ON e.k = j.k AND e.src = j.v
  ) u GROUP BY u.k, u.v
),gc5 AS MATERIALIZED (
  SELECT u.k, u.v, MIN(u.d) AS d FROM (
    SELECT k, v, d FROM gc4
    UNION ALL
    SELECT j.k, e.dst AS v, j.d + 1 AS d FROM gc4 j
    JOIN gcexsym e ON e.k = j.k AND e.src = j.v
  ) u GROUP BY u.k, u.v
),gc6 AS MATERIALIZED (
  SELECT u.k, u.v, MIN(u.d) AS d FROM (
    SELECT k, v, d FROM gc5
    UNION ALL
    SELECT j.k, e.dst AS v, j.d + 1 AS d FROM gc5 j
    JOIN gcexsym e ON e.k = j.k AND e.src = j.v
  ) u GROUP BY u.k, u.v
),gc7 AS MATERIALIZED (
  SELECT u.k, u.v, MIN(u.d) AS d FROM (
    SELECT k, v, d FROM gc6
    UNION ALL
    SELECT j.k, e.dst AS v, j.d + 1 AS d FROM gc6 j
    JOIN gcexsym e ON e.k = j.k AND e.src = j.v
  ) u GROUP BY u.k, u.v
),gc8 AS MATERIALIZED (
  SELECT u.k, u.v, MIN(u.d) AS d FROM (
    SELECT k, v, d FROM gc7
    UNION ALL
    SELECT j.k, e.dst AS v, j.d + 1 AS d FROM gc7 j
    JOIN gcexsym e ON e.k = j.k AND e.src = j.v
  ) u GROUP BY u.k, u.v
),gc9 AS MATERIALIZED (
  SELECT u.k, u.v, MIN(u.d) AS d FROM (
    SELECT k, v, d FROM gc8
    UNION ALL
    SELECT j.k, e.dst AS v, j.d + 1 AS d FROM gc8 j
    JOIN gcexsym e ON e.k = j.k AND e.src = j.v
  ) u GROUP BY u.k, u.v
),gc10 AS MATERIALIZED (
  SELECT u.k, u.v, MIN(u.d) AS d FROM (
    SELECT k, v, d FROM gc9
    UNION ALL
    SELECT j.k, e.dst AS v, j.d + 1 AS d FROM gc9 j
    JOIN gcexsym e ON e.k = j.k AND e.src = j.v
  ) u GROUP BY u.k, u.v
),gc11 AS MATERIALIZED (
  SELECT u.k, u.v, MIN(u.d) AS d FROM (
    SELECT k, v, d FROM gc10
    UNION ALL
    SELECT j.k, e.dst AS v, j.d + 1 AS d FROM gc10 j
    JOIN gcexsym e ON e.k = j.k AND e.src = j.v
  ) u GROUP BY u.k, u.v
),gc12 AS MATERIALIZED (
  SELECT u.k, u.v, MIN(u.d) AS d FROM (
    SELECT k, v, d FROM gc11
    UNION ALL
    SELECT j.k, e.dst AS v, j.d + 1 AS d FROM gc11 j
    JOIN gcexsym e ON e.k = j.k AND e.src = j.v
  ) u GROUP BY u.k, u.v
),gc13 AS MATERIALIZED (
  SELECT u.k, u.v, MIN(u.d) AS d FROM (
    SELECT k, v, d FROM gc12
    UNION ALL
    SELECT j.k, e.dst AS v, j.d + 1 AS d FROM gc12 j
    JOIN gcexsym e ON e.k = j.k AND e.src = j.v
  ) u GROUP BY u.k, u.v
),gc14 AS MATERIALIZED (
  SELECT u.k, u.v, MIN(u.d) AS d FROM (
    SELECT k, v, d FROM gc13
    UNION ALL
    SELECT j.k, e.dst AS v, j.d + 1 AS d FROM gc13 j
    JOIN gcexsym e ON e.k = j.k AND e.src = j.v
  ) u GROUP BY u.k, u.v
)
SELECT CAST(p.u AS BIGINT) AS a, CAST(p.w AS BIGINT) AS b,
       CAST(r.d + 1 AS BIGINT) AS cycle_len
FROM gcprobes p LEFT JOIN gc14 r ON r.k = p.k AND r.v = p.w
ORDER BY a, b
"""
    sqls["seasonal_naive_error"] = """
WITH scnt AS (
  SELECT event_type AS g, date_trunc('day', ts) AS d, CAST(COUNT(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
),
slag AS (
  SELECT g, d, x, LAG(x, 7) OVER (PARTITION BY g ORDER BY d) AS pred FROM scnt
)
SELECT g AS event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(AVG(ABS(x - pred)), 6) AS mae,
       ROUND(SQRT(AVG((x - pred) * (x - pred))), 6) AS rmse,
       ROUND(AVG(ABS(x - pred) / x), 6) AS mape
FROM slag WHERE pred IS NOT NULL GROUP BY 1 ORDER BY event_type
"""
    sqls["type_affinity"] = """
WITH tpair AS (SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2),
tk AS (SELECT user_id, SUM(n) AS nk FROM tpair GROUP BY 1),
tl AS (SELECT event_type, SUM(n) AS nl FROM tpair GROUP BY 1),
tt AS (SELECT SUM(n) AS nt FROM tpair)
SELECT p.user_id, p.event_type, CAST(p.n AS BIGINT) AS n,
       ROUND((p.n * 1.0 / k.nk) / (l.nl * 1.0 / t.nt), 6) AS lift
FROM tpair p JOIN tk k USING (user_id) JOIN tl l USING (event_type) CROSS JOIN tt t
ORDER BY user_id, event_type
"""
    sqls["square_count"] = f"""
WITH {couser_cte},
sqsym AS (SELECT a, b FROM cow UNION ALL SELECT b, a FROM cow),
sqcd AS (
  SELECT w1.b AS u, w2.b AS v, COUNT(*) AS cd
  FROM sqsym w1 JOIN sqsym w2 ON w1.a = w2.a AND w1.b < w2.b
  GROUP BY 1, 2
)
SELECT CAST(SUM(cd * (cd - 1) / 2) / 2 AS BIGINT) AS n_squares,
       CAST(COUNT(*) AS BIGINT) AS n_codegree_pairs
FROM sqcd
"""
    sqls["lsh_recall"] = f"""
WITH lrx AS ({sqls["cosine_topk"]}),
lra AS ({_lsh_topk_oracle()}),
lrh AS (
  SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM lra a JOIN lrx x ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
  GROUP BY a.query_id
),
lrp AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM lrx GROUP BY query_id)
SELECT p.query_id, p.n_exact, COALESCE(h.n_hit, CAST(0 AS BIGINT)) AS n_hit,
       ROUND(COALESCE(h.n_hit, 0) * 1.0 / p.n_exact, 6) AS recall
FROM lrp p LEFT JOIN lrh h USING (query_id) ORDER BY query_id
"""
    sqls["doc_source_kl"] = f"""
WITH ktf AS (
  SELECT doc_id, g, t FROM (
    SELECT doc_id, source AS g, unnest({toks}) AS t FROM documents
  ) WHERE length(t) > 0
),
kdtc AS (SELECT doc_id, g, t, COUNT(*) AS c FROM ktf GROUP BY 1, 2, 3),
kdn AS (SELECT doc_id, SUM(c) AS dn FROM kdtc GROUP BY 1),
kstc AS (SELECT g, t, COUNT(*) AS sc FROM ktf GROUP BY 1, 2),
ksn AS (SELECT g, SUM(sc) AS sn FROM kstc GROUP BY 1)
SELECT d.doc_id, d.g AS source, CAST(SUM(d.c) AS BIGINT) AS n_tokens,
       ROUND(SUM((d.c * 1.0 / n.dn) * LN((d.c * 1.0 / n.dn) / (s.sc * 1.0 / m.sn))), 6) AS kl
FROM kdtc d JOIN kdn n USING (doc_id)
JOIN kstc s ON s.g = d.g AND s.t = d.t
JOIN ksn m ON m.g = d.g
GROUP BY 1, 2 ORDER BY doc_id
"""
    sqls["label_centroid_sim"] = """
WITH lcx AS (
  SELECT label AS l, generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
lcc AS (SELECT l, dim, AVG(v) AS m FROM lcx GROUP BY 1, 2)
SELECT a.l AS label_a, b.l AS label_b,
       ROUND(SUM(a.m * b.m) / (SQRT(SUM(a.m * a.m)) * SQRT(SUM(b.m * b.m))), 6) AS cos_sim
FROM lcc a JOIN lcc b ON a.dim = b.dim AND a.l < b.l
GROUP BY 1, 2 ORDER BY 1, 2
"""
    ic_rounds = []
    for t in range(1, 5):
        ic_rounds.append(f"""icn{t} AS MATERIALIZED (
  SELECT DISTINCT l.dst AS id FROM ica{t - 1} f JOIN iclive l ON l.src = f.id
  WHERE l.dst NOT IN (SELECT id FROM ica{t - 1})
),
ica{t} AS MATERIALIZED (
  SELECT id, round FROM ica{t - 1}
  UNION ALL SELECT id, CAST({t} AS BIGINT) FROM icn{t}
)""")
    sqls["influence_cascade"] = f"""
WITH {couser_cte},
icsym AS (SELECT a AS src, b AS dst FROM cow UNION ALL SELECT b, a FROM cow),
iclive AS MATERIALIZED (
  SELECT src, dst FROM icsym
  WHERE ('0x' || substr(md5('42:' || CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)), 1, 8))::BIGINT
        / 4294967296.0 < 0.3
),
icseeds AS (
  SELECT id FROM (SELECT a AS id FROM cow UNION SELECT b FROM cow)
  ORDER BY id LIMIT 2
),
ica0 AS MATERIALIZED (SELECT id, CAST(0 AS BIGINT) AS round FROM icseeds),
{",".join(ic_rounds)}
SELECT id, round FROM ica4 ORDER BY id
"""
    sqls["stickiness"] = """
WITH sad AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
sdays AS (SELECT DISTINCT day FROM sad),
sdau AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau FROM sad GROUP BY day),
sfan AS (
  SELECT user_id, day + to_days(CAST(k.k AS INT)) AS day
  FROM sad, (SELECT unnest(range(7)) AS k) k
),
swau AS (
  SELECT f.day, CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS wau
  FROM sfan f JOIN sdays d ON d.day = f.day GROUP BY f.day
)
SELECT CAST(d.day AS TIMESTAMP) AS day, d.dau, w.wau, ROUND(d.dau * 1.0 / w.wau, 6) AS stickiness
FROM sdau d JOIN swau w USING (day) ORDER BY day
"""
    sqls["merge_gain"] = f"""
WITH {_DET_PRELUDE.strip()},
mgk AS (
  SELECT (id % 4) AS comm, SUM(w) AS K FROM (
    SELECT src AS id, weight AS w FROM edges UNION ALL SELECT dst, weight FROM edges
  ) GROUP BY 1
),
mgb AS (
  SELECT LEAST(src % 4, dst % 4) AS comm_a, GREATEST(src % 4, dst % 4) AS comm_b,
         SUM(weight) AS w_between
  FROM edges WHERE src % 4 <> dst % 4 GROUP BY 1, 2
),
mgw AS (SELECT SUM(weight) AS W FROM edges)
SELECT b.comm_a, b.comm_b, ROUND(b.w_between, 6) AS w_between,
       ROUND(b.w_between / W - ka.K * kb.K / (2.0 * W * W), 6) AS dq_modularity
FROM mgb b JOIN mgk ka ON ka.comm = b.comm_a JOIN mgk kb ON kb.comm = b.comm_b
CROSS JOIN mgw ORDER BY comm_a, comm_b
"""
    sqls["centralization"] = """
WITH cob2 AS (SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS h FROM events),
cow2 AS (
  SELECT x.user_id AS a, y.user_id AS b
  FROM cob2 x JOIN cob2 y
    ON x.event_type = y.event_type AND x.h = y.h AND x.user_id < y.user_id
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
),
cdeg AS (
  SELECT id, COUNT(*) AS d FROM (
    SELECT a AS id FROM cow2 UNION ALL SELECT b FROM cow2
  ) GROUP BY id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
       CAST(MAX(d) AS BIGINT) AS max_degree,
       ROUND(CASE WHEN COUNT(*) > 2
             THEN (COUNT(*) * MAX(d) - SUM(d)) * 1.0 / ((COUNT(*) - 1) * (COUNT(*) - 2))
             END, 6) AS centralization
FROM cdeg
"""
    sqls["quality_decomposition"] = f"""
WITH {_DET_PRELUDE.strip()},
mv AS (SELECT id, id % 4 AS comm FROM verts),
qk AS (
  SELECT id, SUM(w) AS k FROM (
    SELECT src AS id, weight AS w FROM edges UNION ALL SELECT dst, weight FROM edges
  ) GROUP BY id
),
qintra AS (
  SELECT src % 4 AS comm, SUM(weight) AS w_in FROM edges
  WHERE src % 4 = dst % 4 GROUP BY 1
),
qpc AS (
  SELECT mv.comm, CAST(COUNT(*) AS BIGINT) AS n_vertices,
         CAST(COUNT(*) AS DOUBLE) AS n_size, SUM(COALESCE(qk.k, 0)) AS kk
  FROM mv LEFT JOIN qk ON qk.id = mv.id GROUP BY 1
),
qW AS (SELECT SUM(weight) AS W FROM edges)
SELECT comm, n_vertices, ROUND(n_size, 6) AS n_size,
       ROUND(COALESCE(i.w_in, 0), 6) AS w_in,
       ROUND(kk, 6) AS k_c,
       ROUND(COALESCE(i.w_in, 0) / W - (kk * kk) / (4.0 * W * W), 6) AS term_modularity,
       ROUND(COALESCE(i.w_in, 0) - 0.5 * n_size * (n_size - 1) / 2.0, 6) AS term_cpm
FROM qpc LEFT JOIN qintra i USING (comm) CROSS JOIN qW ORDER BY comm
"""
    sqls["funnel_latency"] = """
WITH f1 AS (
  SELECT user_id, MIN(ts) AS t, MIN(ts) AS t0
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
f2 AS (
  SELECT e.user_id, MIN(e.ts) AS t, MIN(f1.t) AS tprev, MIN(f1.t0) AS t0
  FROM events e JOIN f1 ON e.user_id = f1.user_id
  WHERE e.event_type = 'click' AND e.ts > f1.t
    AND epoch_us(e.ts) / 1000000.0 <= epoch_us(f1.t0) / 1000000.0 + 86400.0
  GROUP BY e.user_id
),
f3 AS (
  SELECT e.user_id, MIN(e.ts) AS t, MIN(f2.t) AS tprev
  FROM events e JOIN f2 ON e.user_id = f2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > f2.t
    AND epoch_us(e.ts) / 1000000.0 <= epoch_us(f2.t0) / 1000000.0 + 86400.0
  GROUP BY e.user_id
)
SELECT 1 AS step_idx, 'view' AS step,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM f1) AS n_keys,
       CAST(NULL AS DOUBLE) AS mean_s, CAST(NULL AS DOUBLE) AS p50_s,
       CAST(NULL AS DOUBLE) AS p90_s
UNION ALL SELECT 2, 'click', (SELECT CAST(COUNT(*) AS BIGINT) FROM f2),
       (SELECT ROUND(AVG((epoch_us(t) - epoch_us(tprev)) / 1000000.0), 6) FROM f2),
       (SELECT ROUND(quantile_cont((epoch_us(t) - epoch_us(tprev)) / 1000000.0, 0.5), 6) FROM f2),
       (SELECT ROUND(quantile_cont((epoch_us(t) - epoch_us(tprev)) / 1000000.0, 0.9), 6) FROM f2)
UNION ALL SELECT 3, 'purchase', (SELECT CAST(COUNT(*) AS BIGINT) FROM f3),
       (SELECT ROUND(AVG((epoch_us(t) - epoch_us(tprev)) / 1000000.0), 6) FROM f3),
       (SELECT ROUND(quantile_cont((epoch_us(t) - epoch_us(tprev)) / 1000000.0, 0.5), 6) FROM f3),
       (SELECT ROUND(quantile_cont((epoch_us(t) - epoch_us(tprev)) / 1000000.0, 0.9), 6) FROM f3)
ORDER BY step_idx
"""
    sqls["source_length_emd"] = """
WITH lc AS (
  SELECT source AS g,
         LEAST(23, CAST(FLOOR(LOG2(GREATEST(CAST(LENGTH(COALESCE(text, '')) AS DOUBLE), 1.0))) AS INT)) AS bin
  FROM documents
),
ecell AS (SELECT g, bin, COUNT(*) AS c FROM lc GROUP BY 1, 2),
etot AS (SELECT g, SUM(c) AS n FROM ecell GROUP BY g),
ebins AS (SELECT CAST(unnest(range(0, 24)) AS INT) AS bin),
edense AS (
  SELECT t.g, b.bin, COALESCE(c.c, 0) AS c, t.n
  FROM etot t CROSS JOIN ebins b
  LEFT JOIN ecell c ON c.g = t.g AND c.bin = b.bin
),
ecdf AS (SELECT g, bin, SUM(c) OVER (PARTITION BY g ORDER BY bin) * 1.0 / n AS fv FROM edense)
SELECT a.g AS src_a, b2.g AS src_b, ROUND(SUM(ABS(a.fv - b2.fv)), 6) AS emd
FROM ecdf a JOIN ecdf b2 ON a.bin = b2.bin AND a.g < b2.g
GROUP BY 1, 2 ORDER BY 1, 2
"""
    sqls["langid_confusion"] = f"""
WITH lpred AS ({sqls["lang_id"]}),
lcell AS (
  SELECT COALESCE(d.lang, 'und') AS lang, p.lang_pred, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents d JOIN lpred p USING (doc_id) GROUP BY 1, 2
)
SELECT lang, lang_pred, n,
       ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY lang), 6) AS frac_of_truth
FROM lcell ORDER BY lang, lang_pred
"""
    sqls["embedding_drift"] = """
WITH ex AS (
  SELECT CAST(vec_id % 2 AS INT) AS g,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
ecell AS (
  SELECT dim, g, AVG(v) AS mu, VAR_SAMP(v) AS s2, COUNT(*) AS n
  FROM ex GROUP BY dim, g
),
epiv AS (
  SELECT dim,
         MAX(CASE WHEN g = 0 THEN mu END) AS mu0,
         MAX(CASE WHEN g = 1 THEN mu END) AS mu1,
         MAX(CASE WHEN g = 0 THEN s2 END) AS s20,
         MAX(CASE WHEN g = 1 THEN s2 END) AS s21,
         MAX(CASE WHEN g = 0 THEN n END) AS n0,
         MAX(CASE WHEN g = 1 THEN n END) AS n1
  FROM ecell GROUP BY dim
)
SELECT CAST(dim AS BIGINT) AS dim,
       ROUND(mu0, 6) AS mean_a,
       ROUND(mu1, 6) AS mean_b,
       ROUND(SQRT(((n0 - 1) * s20 + (n1 - 1) * s21) / (n0 + n1 - 2)), 6) AS std_pooled,
       ROUND(CASE WHEN ((n0 - 1) * s20 + (n1 - 1) * s21) > 0
             THEN (mu1 - mu0) / SQRT(((n0 - 1) * s20 + (n1 - 1) * s21) / (n0 + n1 - 2))
             END, 6) AS smd
FROM epiv ORDER BY dim
"""
    sqls["graphlet_orbits"] = f"""
WITH {couser_cte},
tv AS (
  SELECT v, COUNT(*) AS t FROM (
    SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
  ) GROUP BY v
),
gsym AS (SELECT a AS u, b AS v FROM cow UNION ALL SELECT b, a FROM cow),
gdeg AS (SELECT u AS id, COUNT(*) AS d FROM gsym GROUP BY u),
gnd AS (SELECT s.u AS id, SUM(d2.d) AS nds FROM gsym s JOIN gdeg d2 ON d2.id = s.v GROUP BY s.u)
SELECT CAST(g.id AS BIGINT) AS id,
       CAST(g.d AS BIGINT) AS o0_degree,
       CAST(COALESCE(n.nds, 0) - g.d - 2 * COALESCE(tv.t, 0) AS BIGINT) AS o1_path_end,
       CAST(g.d * (g.d - 1) / 2 - COALESCE(tv.t, 0) AS BIGINT) AS o2_wedge_center,
       CAST(COALESCE(tv.t, 0) AS BIGINT) AS o3_triangle
FROM gdeg g LEFT JOIN gnd n ON n.id = g.id LEFT JOIN tv ON tv.v = g.id
ORDER BY id
"""
    sqls["changepoint"] = """
WITH cnt AS (
  SELECT event_type AS g, date_trunc('day', ts) AS b, CAST(COUNT(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
),
run AS (
  SELECT g, b, x,
         SUM(x) OVER (PARTITION BY g ORDER BY b) AS s,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY b) AS t,
         SUM(x) OVER (PARTITION BY g) AS tot,
         COUNT(*) OVER (PARTITION BY g) AS n
  FROM cnt
),
sc AS (
  SELECT g, b, n,
         ROUND(ABS(s / t - (tot - s) / (n - t)) * SQRT(t * (n - t) * 1.0 / n), 6) AS stat,
         ROUND(s / t, 6) AS mean_before,
         ROUND((tot - s) / (n - t), 6) AS mean_after
  FROM run WHERE t < n
)
SELECT g AS event_type, CAST(b AS TIMESTAMP) AS t_star, stat, mean_before, mean_after,
       CAST(n AS BIGINT) AS n_buckets
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY g ORDER BY stat DESC, b ASC) AS rk FROM sc)
WHERE rk = 1 ORDER BY event_type
"""
    sqls["quality_bipartite"] = f"""
WITH {_DET_PRELUDE.strip()},
bk AS (
  SELECT id, SUM(w) AS k FROM (
    SELECT src AS id, weight AS w FROM edges
    UNION ALL SELECT dst, weight FROM edges
  ) GROUP BY id
),
bmm AS (SELECT id, id % 4 AS comm, id % 2 AS typ, k FROM bk),
bintra AS (
  SELECT src % 4 AS comm, SUM(weight) AS m_c FROM edges
  WHERE src % 4 = dst % 4 GROUP BY 1
),
bkc AS (
  SELECT comm,
         SUM(CASE WHEN typ = 0 THEN k ELSE 0 END) AS k0,
         SUM(CASE WHEN typ = 1 THEN k ELSE 0 END) AS k1
  FROM bmm GROUP BY comm
),
bm AS (SELECT SUM(weight) AS m FROM edges)
SELECT ROUND(SUM((COALESCE(i.m_c, 0) - c.k0 * c.k1 / bm.m) / bm.m), 6) AS value
FROM bkc c LEFT JOIN bintra i USING (comm) CROSS JOIN bm
"""
    sqls["ngram_novelty"] = f"""
WITH {shingle_cte},
firsts AS (SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle)
SELECT sh.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN sh.doc_id = f.first_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       ROUND(SUM(CASE WHEN sh.doc_id = f.first_doc THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS novelty
FROM sh JOIN firsts f USING (shingle)
GROUP BY sh.doc_id ORDER BY sh.doc_id
"""
    sqls["jaccard_prefix"] = f"""
WITH {shingle_cte},
psizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
pinter AS (
  SELECT s1.doc_id AS a, s2.doc_id AS b, COUNT(*) AS i
  FROM sh s1 JOIN sh s2 ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
  GROUP BY 1, 2
)
SELECT a, b, ROUND(CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
FROM pinter JOIN psizes sa ON pinter.a = sa.doc_id JOIN psizes sb ON pinter.b = sb.doc_id
WHERE ROUND(CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i), 6) >= 0.1
"""
    sqls["hard_negatives"] = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS qlab
           FROM embeddings WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.label AS neighbor_label,
         list_sum(list_transform(list_zip(q.qv, e.embedding),
                                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cs
  FROM embeddings e CROSS JOIN q WHERE e.label <> q.qlab
)
SELECT query_id, neighbor_id, neighbor_label, cos_sim, rank FROM (
  SELECT query_id, neighbor_id, neighbor_label, ROUND(cs, 6) AS cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY ROUND(cs, 6) DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
"""
    sqls["k_anonymity"] = """
SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS class_size,
       COUNT(*) >= 5 AS meets_k
FROM documents GROUP BY source, lang
"""
    sqls["wl_kernel_drift"] = """
WITH wsl AS (
  SELECT DISTINCT CAST(FLOOR(epoch_us(ts) / 86400000000.0) AS BIGINT) AS slice,
         user_id AS src,
         -CAST(('0x' || substr(md5(event_type), 1, 8)) AS BIGINT) AS dst
  FROM events
),
wsym AS (
  SELECT DISTINCT slice, a, b FROM (
    SELECT slice, src AS a, dst AS b FROM wsl
    UNION ALL SELECT slice, dst AS a, src AS b FROM wsl
  ) WHERE a <> b
),
wc0 AS (SELECT DISTINCT slice, a AS id, '0' AS color FROM wsym),
ws1 AS (SELECT wsym.slice, wsym.a AS id, string_agg(c.color, ',' ORDER BY c.color) AS sig
        FROM wsym JOIN wc0 c ON c.slice = wsym.slice AND c.id = wsym.b
        GROUP BY wsym.slice, wsym.a),
wc1 AS (SELECT wc0.slice, wc0.id, md5(wc0.color || '|' || coalesce(ws1.sig, '')) AS color
        FROM wc0 LEFT JOIN ws1 ON ws1.slice = wc0.slice AND ws1.id = wc0.id),
ws2 AS (SELECT wsym.slice, wsym.a AS id, string_agg(c.color, ',' ORDER BY c.color) AS sig
        FROM wsym JOIN wc1 c ON c.slice = wsym.slice AND c.id = wsym.b
        GROUP BY wsym.slice, wsym.a),
wc2 AS (SELECT wc1.slice, wc1.id, md5(wc1.color || '|' || coalesce(ws2.sig, '')) AS color
        FROM wc1 LEFT JOIN ws2 ON ws2.slice = wc1.slice AND ws2.id = wc1.id),
whist AS (
  SELECT slice, 0 AS round, color, CAST(COUNT(*) AS BIGINT) AS n FROM wc0 GROUP BY 1, 3
  UNION ALL
  SELECT slice, 1, color, CAST(COUNT(*) AS BIGINT) FROM wc1 GROUP BY 1, color
  UNION ALL
  SELECT slice, 2, color, CAST(COUNT(*) AS BIGINT) FROM wc2 GROUP BY 1, color
),
wsizes AS (SELECT slice, CAST(COUNT(*) AS BIGINT) AS nv FROM wc0 GROUP BY slice),
wpairs AS (
  SELECT slice AS sa, lead(slice) OVER (ORDER BY slice) AS sb FROM wsizes
),
wshared AS (
  SELECT p.sa, p.sb, SUM(LEAST(ha.n, hb.n)) AS m
  FROM wpairs p
  JOIN whist ha ON ha.slice = p.sa
  JOIN whist hb ON hb.slice = p.sb AND hb.round = ha.round AND hb.color = ha.color
  WHERE p.sb IS NOT NULL
  GROUP BY p.sa, p.sb
)
SELECT p.sa AS slice_a, p.sb AS slice_b, za.nv AS n_vertices_a, zb.nv AS n_vertices_b,
       ROUND(COALESCE(w.m, 0) / 3.0 / GREATEST(za.nv, zb.nv), 6) AS wl_similarity
FROM wpairs p
LEFT JOIN wshared w ON w.sa = p.sa AND w.sb = p.sb
JOIN wsizes za ON za.slice = p.sa
JOIN wsizes zb ON zb.slice = p.sb
WHERE p.sb IS NOT NULL
ORDER BY slice_a
"""
    sqls["temporal_motifs"] = """
WITH tmseq AS (
  SELECT event_type AS a,
         lead(event_type, 1) OVER w AS b,
         lead(event_type, 2) OVER w AS c,
         ts AS t0,
         lead(ts, 2) OVER w AS t2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS n
FROM tmseq
WHERE c IS NOT NULL AND epoch_us(t2) - epoch_us(t0) <= CAST(3600 AS BIGINT) * 1000000
GROUP BY a, b, c ORDER BY a, b, c
"""
    sqls["calibration_curve"] = """
WITH mm AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
cs AS (SELECT (value - lo) / (hi - lo) AS score,
              CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
       FROM events CROSS JOIN mm),
cb AS (SELECT GREATEST(LEAST(CAST(FLOOR(score * 10) AS INT), 9), 0) AS bin, score, y FROM cs)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(score), 6) AS mean_score,
       ROUND(AVG(y), 6) AS pos_rate,
       ROUND(ABS(AVG(score) - AVG(y)), 6) AS abs_gap
FROM cb GROUP BY bin ORDER BY bin
"""
    sqls["community_conductance"] = _QUALITY_PRELUDE + """,
dec AS (
  SELECT e.weight AS w, v1.comm AS ca, v2.comm AS cb
  FROM edges e JOIN verts v1 ON e.src = v1.name JOIN verts v2 ON e.dst = v2.name
),
contrib AS (
  SELECT ca AS comm,
         CASE WHEN ca = cb THEN w ELSE 0 END AS wi,
         CASE WHEN ca <> cb THEN w ELSE 0 END AS wc
  FROM dec
  UNION ALL
  SELECT cb, 0, w FROM dec WHERE ca <> cb
),
agg AS (SELECT comm, SUM(wi) AS w_in, SUM(wc) AS w_cut FROM contrib GROUP BY comm),
nv AS (SELECT comm, CAST(COUNT(*) AS DOUBLE) AS n FROM verts GROUP BY comm),
ctot AS (SELECT 2.0 * SUM(w) AS vol_tot FROM dec),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS N FROM verts)
SELECT nv.comm,
       CAST(nv.n AS BIGINT) AS n_vertices,
       ROUND(COALESCE(agg.w_in, 0), 6) AS w_in,
       ROUND(COALESCE(agg.w_cut, 0), 6) AS w_cut,
       ROUND(2 * COALESCE(agg.w_in, 0) + COALESCE(agg.w_cut, 0), 6) AS volume,
       ROUND(CASE WHEN LEAST(2 * COALESCE(agg.w_in, 0) + COALESCE(agg.w_cut, 0),
                             vol_tot - 2 * COALESCE(agg.w_in, 0) - COALESCE(agg.w_cut, 0)) > 0
             THEN COALESCE(agg.w_cut, 0)
                  / LEAST(2 * COALESCE(agg.w_in, 0) + COALESCE(agg.w_cut, 0),
                          vol_tot - 2 * COALESCE(agg.w_in, 0) - COALESCE(agg.w_cut, 0))
             END, 6) AS conductance,
       ROUND(CASE WHEN nv.n > 1 THEN 2 * COALESCE(agg.w_in, 0) / (nv.n * (nv.n - 1)) END, 6)
         AS internal_density,
       ROUND(COALESCE(agg.w_cut, 0) / nv.n, 6) AS expansion,
       ROUND(CASE WHEN nn.N > nv.n THEN COALESCE(agg.w_cut, 0) / (nv.n * (nn.N - nv.n)) END, 6)
         AS cut_ratio
FROM nv LEFT JOIN agg ON nv.comm = agg.comm CROSS JOIN ctot CROSS JOIN nn
ORDER BY nv.comm
"""
    sqls["edge_lift"] = f"""
WITH {_DET_PRELUDE.strip()},
k AS (
  SELECT id, SUM(weight) AS k FROM (
    SELECT src AS id, weight FROM edges
    UNION ALL SELECT dst, weight FROM edges
  ) GROUP BY id
),
tot AS (SELECT 2.0 * SUM(weight) AS W FROM edges)
SELECT e.src, e.dst, e.weight,
       ROUND(ks.k * kd.k / W, 6) AS expected,
       ROUND(e.weight * W / (ks.k * kd.k), 6) AS lift,
       ROUND(log2(e.weight * W / (ks.k * kd.k)), 6) AS log2_lift
FROM edges e JOIN k ks ON e.src = ks.id JOIN k kd ON e.dst = kd.id CROSS JOIN tot
"""
    sqls.update(_kernel_oracles())
    return sqls


def _bfs_sweep_ctes(tag: str, start_sql: str, depth: int) -> str:
    """Unrolled deterministic BFS CTEs over the symmetric pair table
    ``s(a, b)``: levels ``{tag}0..{tag}{depth}``, union ``{tag}_all``,
    and ``{tag}_far`` = the (max d, min v) farthest vertex."""
    ctes = [f"{tag}0 AS MATERIALIZED (SELECT {start_sql} AS v, 0 AS d)"]
    seen = f"SELECT v FROM {tag}0"
    for k in range(1, depth + 1):
        ctes.append(
            f"""{tag}{k} AS MATERIALIZED (
  SELECT DISTINCT s.b AS v, {k} AS d FROM {tag}{k - 1} p JOIN s ON s.a = p.v
  WHERE s.b NOT IN ({seen}))"""
        )
        seen += f" UNION ALL SELECT v FROM {tag}{k}"
    union = " UNION ALL ".join(f"SELECT * FROM {tag}{k}" for k in range(depth + 1))
    ctes.append(f"{tag}_all AS ({union})")
    ctes.append(
        f"{tag}_far AS (SELECT v, d FROM {tag}_all ORDER BY d DESC, v LIMIT 1)"
    )
    return ",\n".join(ctes)


def _diameter_oracle(depth: int = 6) -> str:
    """DuckDB twin of diameter_approx on the deterministic bipartite
    graph: same max-degree start, same (d, v) tie-breaks, same ring
    truncation."""
    return (
        "WITH " + _DET_PRELUDE + """,
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
s AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
degq AS (SELECT a AS id, COUNT(*) AS deg FROM s GROUP BY a),
st AS (SELECT id FROM degq ORDER BY deg DESC, id LIMIT 1),
"""
        + _bfs_sweep_ctes("w1", "(SELECT id FROM st)", depth)
        + ",\n"
        + _bfs_sweep_ctes("w2", "(SELECT v FROM w1_far)", depth)
        + """
SELECT CAST((SELECT id FROM st) AS BIGINT) AS start_id,
       CAST((SELECT v FROM w1_far) AS BIGINT) AS sweep1_end,
       CAST((SELECT d FROM w1_far) AS INT) AS sweep1_dist,
       CAST((SELECT v FROM w2_far) AS BIGINT) AS sweep2_end,
       CAST((SELECT d FROM w2_far) AS INT) AS diameter_lb
"""
    )


def _kmeans_cte_list(
    k: int = 4,
    iters: int = 2,
    seed: int = 42,
    prefix: str = "",
    vexpr: str = "list_transform(embedding, x -> CAST(x AS DOUBLE))",
) -> list:
    """CTE fragments of the deterministic Lloyd loop (see
    :func:`_kmeans_ctes`).  ``prefix`` namespaces every CTE so several
    independent fits (e.g. the per-subspace chains of the PQ oracle) can
    share one WITH clause; ``vexpr`` is the vector expression fed to the
    fit (defaults to the full cast embedding — the PQ oracle passes a
    ``list_slice``)."""
    p = prefix
    pri = f"('0x' || substr(md5('{seed}:' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT"
    ctes = [
        f"""{p}emb AS (
  SELECT vec_id, {vexpr} AS v
  FROM embeddings
)""",
        f"""{p}c0 AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY {pri}, vec_id) - 1 AS cell,
         list_transform(v, x -> ROUND(x, 6)) AS cv
  FROM {p}emb ORDER BY {pri}, vec_id LIMIT {k}
)""",
    ]
    for t in range(1, iters + 2):
        rn_keep = 2 if t == iters + 1 else 1
        ctes.append(f"""{p}a{t} AS MATERIALIZED (
  SELECT vec_id, cell, d2, rn FROM (
    SELECT vec_id, cell, d2,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
    FROM (
      SELECT e.vec_id, c.cell,
             list_sum(list_transform(range(1, length(e.v) + 1),
                      i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS d2
      FROM {p}emb e CROSS JOIN {p}c{t - 1} c
    )
  ) WHERE rn <= {rn_keep}
)""")
        if t <= iters:
            ctes.append(f"""{p}c{t} AS MATERIALIZED (
  SELECT cell, list(m ORDER BY i) AS cv FROM (
    SELECT a.cell, u.i, ROUND(AVG(u.x), 6) AS m
    FROM {p}a{t} a JOIN {p}emb e USING (vec_id),
         LATERAL (SELECT unnest(e.v) AS x,
                         unnest(range(1, length(e.v) + 1)) AS i) u
    GROUP BY a.cell, u.i
  ) GROUP BY cell
)""")
    return ctes


def _kmeans_ctes(k: int = 4, iters: int = 2, seed: int = 42) -> str:
    """Shared DuckDB twin of the deterministic Lloyd loop: same
    md5-priority init as the Spark op, rounds unrolled as CTEs,
    centroids ROUNDED to 6 decimals at every sync (the cross-engine
    determinism barrier the Spark op implements for exactly this
    purpose).  The final assignment CTE ``a{iters+1}`` keeps rn ≤ 2
    (nearest + second-nearest) so both the assignment and the
    silhouette oracles read from it."""
    return "WITH " + ",\n".join(_kmeans_cte_list(k, iters, seed))


def _pq_oracle(m: int = 2, k: int = 16, iters: int = 2, seed: int = 42) -> str:
    """DuckDB twin of :func:`leidenalg_spark.operators.similarity.product_quantize`:
    ``m`` independent deterministic-Lloyd chains over ``list_slice``d
    subvectors (seed + 101·j per subspace — the Spark op's convention),
    codes concat-joined into the driver-comparable string the catalog
    entry emits, recon_err = √(Σ_j dist_j²) over the per-subspace
    rounded-6 assignment distances."""
    ctes, finals = [], []
    for j in range(m):
        sub = f"(length(embedding) // {m})"
        vexpr = (
            f"list_slice(list_transform(embedding, x -> CAST(x AS DOUBLE)), "
            f"1 + {j} * {sub}, {j + 1} * {sub})"
        )
        ctes += _kmeans_cte_list(k, iters, seed + 101 * j, prefix=f"s{j}", vexpr=vexpr)
        finals.append(f"""f{j} AS (
  SELECT vec_id, CAST(cell AS BIGINT) AS cell, ROUND(sqrt(d2), 6) AS dist
  FROM s{j}a{iters + 1} WHERE rn = 1
)""")
    joins = " ".join(f"JOIN f{j} USING (vec_id)" for j in range(1, m))
    codes = " || '-' || ".join(f"CAST(f{j}.cell AS VARCHAR)" for j in range(m))
    err = " + ".join(f"f{j}.dist * f{j}.dist" for j in range(m))
    return (
        "WITH " + ",\n".join(ctes + finals)
        + f"""
SELECT f0.vec_id, {codes} AS codes, ROUND(sqrt({err}), 6) AS recon_err
FROM f0 {joins}
"""
    )


def _kmeans_oracle(k: int = 4, iters: int = 2, seed: int = 42) -> str:
    return (
        _kmeans_ctes(k, iters, seed)
        + f"\nSELECT vec_id, CAST(cell AS BIGINT) AS cell,"
          f" ROUND(sqrt(d2), 6) AS dist FROM a{iters + 1} WHERE rn = 1\n"
    )


def _silhouette_oracle(k: int = 4, iters: int = 2, seed: int = 42) -> str:
    """Per-cell simplified silhouette over the final Lloyd assignment:
    a = nearest-centroid distance, b = second-nearest (or a when k=1)."""
    return (
        _kmeans_ctes(k, iters, seed)
        + f""",
sil AS (
  SELECT vec_id,
         MAX(CASE WHEN rn = 1 THEN cell END) AS cell,
         MAX(CASE WHEN rn = 1 THEN sqrt(d2) END) AS a,
         COALESCE(MAX(CASE WHEN rn = 2 THEN sqrt(d2) END),
                  MAX(CASE WHEN rn = 1 THEN sqrt(d2) END)) AS b
  FROM a{iters + 1} GROUP BY vec_id
)
SELECT CAST(cell AS BIGINT) AS cell, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(CASE WHEN greatest(a, b) > 0
                      THEN (b - a) / greatest(a, b) ELSE 0.0 END), 6)
         AS mean_silhouette
FROM sil GROUP BY cell
"""
    )


def _kmeans_outliers_oracle(k: int = 4, iters: int = 2, seed: int = 42, z: float = 2.0) -> str:
    """Per-cell z-scored centroid distance over the final assignment —
    composed on the SAME Lloyd CTE chain as the kmeans oracle."""
    return (
        _kmeans_ctes(k, iters, seed)
        + f""",
asg AS (SELECT vec_id, CAST(cell AS BIGINT) AS cell,
               ROUND(sqrt(d2), 6) AS dist
        FROM a{iters + 1} WHERE rn = 1),
st AS (SELECT cell, AVG(dist) AS mu, STDDEV_SAMP(dist) AS sd
       FROM asg GROUP BY cell)
SELECT a.vec_id, a.cell, a.dist,
       ROUND(CASE WHEN sd > 0 THEN (dist - mu) / sd END, 6) AS z,
       COALESCE(CASE WHEN sd > 0 THEN (dist - mu) / sd END >= {z}, FALSE)
         AS is_outlier
FROM asg a JOIN st USING (cell)
"""
    )


# deterministic-id bipartite graph (mirrors _bipartite_ids_det exactly):
# users = 2*user_id (even), event types = odd lexicographic ranks
_DET_PRELUDE = """
named AS (
  SELECT 'u:' || CAST(user_id AS VARCHAR) AS src_name, 't:' || event_type AS dst_name,
         CAST(COUNT(*) AS DOUBLE) AS weight
  FROM events GROUP BY 1, 2
),
tids AS (
  SELECT dst_name, 2 * ROW_NUMBER() OVER (ORDER BY dst_name) + 1 AS tid
  FROM (SELECT DISTINCT dst_name FROM named)
),
edges AS (
  SELECT 2 * CAST(substr(src_name, 3) AS BIGINT) AS src, tid AS dst, weight
  FROM named JOIN tids USING (dst_name)
),
sym AS (SELECT src, dst, weight FROM edges
        UNION ALL SELECT dst, src, weight FROM edges),
verts AS (SELECT DISTINCT src AS id FROM sym)
"""


def _kernel_oracles() -> dict[str, str]:
    """DuckDB twins of the iterative kernels, iterations unrolled as CTE
    chains — same graph, same ids, same tie-breaks as the Spark queries."""
    # ---- pagerank: 8 damped iterations, no dangling mass (symmetrised)
    pr = ["r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM verts)"]
    for k in range(1, 9):
        pr.append(f"""r{k} AS (
  SELECT v.id, 0.15 / (SELECT n FROM nn) + 0.85 * COALESCE(t.c, 0) AS rank
  FROM verts v LEFT JOIN (
    SELECT l.dst AS id, SUM(l.share * r.rank) AS c
    FROM links l JOIN r{k - 1} r ON r.id = l.src GROUP BY l.dst
  ) t ON t.id = v.id
)""")
    pagerank_sql = (
        "WITH " + _DET_PRELUDE + """,
outw AS (SELECT src, SUM(weight) AS w FROM sym GROUP BY src),
links AS (SELECT s.src, s.dst, s.weight / o.w AS share FROM sym s JOIN outw o ON s.src = o.src),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),
""" + ",\n".join(pr) + """
SELECT id, ROUND(rank, 6) AS rank FROM r8
ORDER BY ROUND(rank, 6) DESC, id LIMIT 20
"""
    )

    # ---- personalized pagerank: restart at the two smallest vertex ids,
    # 8 damped iterations, no dangling mass (symmetrised graph); the rank
    # vector iterates sparse and is densified over verts at the end
    ppr = ["p0 AS (SELECT id, rw AS rank FROM srcs)"]
    for k in range(1, 9):
        ppr.append(f"""p{k} AS (
  SELECT id, SUM(part) AS rank FROM (
    SELECT l.dst AS id, 0.85 * SUM(l.share * r.rank) AS part
    FROM links l JOIN p{k - 1} r ON r.id = l.src GROUP BY l.dst
    UNION ALL
    SELECT id, 0.15 * rw AS part FROM srcs
  ) GROUP BY id
)""")
    ppr_sql = (
        "WITH " + _DET_PRELUDE + """,
outw AS (SELECT src, SUM(weight) AS w FROM sym GROUP BY src),
links AS (SELECT s.src, s.dst, s.weight / o.w AS share FROM sym s JOIN outw o ON s.src = o.src),
srcs AS (SELECT id, 0.5 AS rw FROM (SELECT id FROM verts ORDER BY id LIMIT 2)),
""" + ",\n".join(ppr) + """
SELECT id, ROUND(rank, 6) AS rank FROM (
  SELECT v.id, COALESCE(p.rank, 0) AS rank FROM verts v LEFT JOIN p8 p ON p.id = v.id
)
ORDER BY ROUND(rank, 6) DESC, id LIMIT 20
"""
    )

    # ---- shortest path 0 -> 2: 4 unrolled BFS rings with MIN(src)
    # parent tie-breaks, then 4 unrolled parent walk-back steps
    sp = [
        "r0 AS (SELECT CAST(0 AS BIGINT) AS id, CAST(NULL AS BIGINT) AS parent, 0 AS d)",
        "s0 AS (SELECT * FROM r0)",
    ]
    for d in (1, 2, 3, 4):
        sp.append(f"""r{d} AS (
  SELECT s.dst AS id, MIN(s.src) AS parent, {d} AS d
  FROM sym s JOIN r{d - 1} f ON s.src = f.id
  WHERE s.dst NOT IN (SELECT id FROM s{d - 1})
  GROUP BY s.dst
)""")
        sp.append(f"s{d} AS (SELECT * FROM s{d - 1} UNION ALL SELECT * FROM r{d})")
    sp.append("b0 AS (SELECT id, parent, d FROM s4 WHERE id = 2)")
    for k in (1, 2, 3, 4):
        sp.append(
            f"b{k} AS (SELECT s.id, s.parent, s.d FROM b{k - 1} JOIN s4 s ON s.id = b{k - 1}.parent)"
        )
    shortest_sql = (
        "WITH " + _DET_PRELUDE + ",\n" + ",\n".join(sp) + """
SELECT DISTINCT CAST(d AS INT) AS step, id FROM (
  SELECT d, id FROM b0 UNION ALL SELECT d, id FROM b1
  UNION ALL SELECT d, id FROM b2 UNION ALL SELECT d, id FROM b3
  UNION ALL SELECT d, id FROM b4
)
"""
    )

    # ---- katz centrality: 6 unrolled x <- 1 + 0.01 * A^T x iterations
    # on the symmetrised weighted graph (x0 = 1 everywhere)
    kz = ["k0 AS (SELECT id, 1.0 AS c FROM verts)"]
    for t in range(1, 7):
        kz.append(f"""k{t} AS (
  SELECT v.id, 1.0 + 0.01 * COALESCE(g.g, 0) AS c
  FROM verts v LEFT JOIN (
    SELECT s.dst AS id, SUM(s.weight * k.c) AS g
    FROM sym s JOIN k{t - 1} k ON k.id = s.src GROUP BY s.dst
  ) g ON g.id = v.id
)""")
    katz_sql = (
        "WITH " + _DET_PRELUDE + ",\n" + ",\n".join(kz)
        + "\nSELECT id, ROUND(c, 6) AS centrality FROM k6\n"
    )

    # ---- ppr sweep: the same unrolled p8 ranks, ACL conductance sweep
    # over the top-25 by round(rank/vol, 6) desc, id asc
    sweep_sql = (
        "WITH " + _DET_PRELUDE + """,
outw AS (SELECT src, SUM(weight) AS w FROM sym GROUP BY src),
links AS (SELECT s.src, s.dst, s.weight / o.w AS share FROM sym s JOIN outw o ON s.src = o.src),
srcs AS (SELECT id, 0.5 AS rw FROM (SELECT id FROM verts ORDER BY id LIMIT 2)),
""" + ",\n".join(ppr) + """,
und2 AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b, SUM(weight) AS w
         FROM edges WHERE src <> dst GROUP BY 1, 2),
sym2 AS (SELECT a, b, w FROM und2 UNION ALL SELECT b AS a, a AS b, w FROM und2),
vol AS (SELECT a AS id, SUM(w) AS vol FROM sym2 GROUP BY a),
tot AS (SELECT SUM(vol) AS tot FROM vol),
scored AS (
  SELECT p.id, v.vol, ROUND(p.rank / v.vol, 6) AS score
  FROM p8 p JOIN vol v ON v.id = p.id WHERE p.rank > 0
),
top AS (
  SELECT id, vol, score, ROW_NUMBER() OVER (ORDER BY score DESC, id ASC) AS pos
  FROM scored QUALIFY pos <= 25
),
bb AS (
  SELECT t.id, SUM(s.w) AS b
  FROM top t JOIN sym2 s ON s.a = t.id JOIN top u ON u.id = s.b AND u.pos < t.pos
  GROUP BY t.id
),
run AS (
  SELECT top.pos, top.id, top.score,
         SUM(top.vol) OVER (ORDER BY pos) AS vol_w,
         SUM(top.vol) OVER (ORDER BY pos)
           - 2 * SUM(COALESCE(bb.b, 0)) OVER (ORDER BY pos) AS cut_w
  FROM top LEFT JOIN bb USING (id)
)
SELECT pos, id, score, ROUND(vol_w, 6) AS vol_w, ROUND(cut_w, 6) AS cut_w,
       ROUND(CASE WHEN LEAST(vol_w, tot - vol_w) > 0
                  THEN cut_w / LEAST(vol_w, tot - vol_w) END, 6) AS conductance
FROM run, tot
"""
    )

    # ---- label propagation: 8 synchronous rounds, (id+step)%2 gate,
    # argmax by (weight desc, label asc) — counts are integral so the
    # weight comparison is exact in floating point
    lp = ["l0 AS (SELECT id, id AS label FROM verts)"]
    for k in range(1, 9):
        lp.append(f"""b{k} AS (
  SELECT id, nbr AS new_label FROM (
    SELECT s.src AS id, l.label AS nbr,
           ROW_NUMBER() OVER (PARTITION BY s.src ORDER BY SUM(s.weight) DESC, l.label ASC) AS rn
    FROM sym s JOIN l{k - 1} l ON l.id = s.dst
    GROUP BY s.src, l.label
  ) WHERE rn = 1
),
l{k} AS (
  SELECT l.id,
         CASE WHEN b.new_label IS NOT NULL AND (l.id + {k}) % 2 = 0
              THEN b.new_label ELSE l.label END AS label
  FROM l{k - 1} l LEFT JOIN b{k} b ON b.id = l.id
)""")
    lpa_sql = (
        "WITH " + _DET_PRELUDE + ",\n" + ",\n".join(lp)
        + "\nSELECT label, CAST(COUNT(*) AS BIGINT) AS size FROM l8 GROUP BY label\n"
    )

    # ---- label spreading: same unroll, odd-id seeds, NULL = unlabeled,
    # seeds never move, gather only over labeled neighbours
    ls = ["s0 AS (SELECT id, CASE WHEN id % 2 = 1 THEN id END AS label FROM verts)"]
    for k in range(1, 5):
        ls.append(f"""sb{k} AS (
  SELECT id, nbr AS new_label FROM (
    SELECT s.src AS id, l.label AS nbr,
           ROW_NUMBER() OVER (PARTITION BY s.src ORDER BY SUM(s.weight) DESC, l.label ASC) AS rn
    FROM sym s JOIN s{k - 1} l ON l.id = s.dst AND l.label IS NOT NULL
    GROUP BY s.src, l.label
  ) WHERE rn = 1
),
s{k} AS (
  SELECT l.id,
         CASE WHEN l.id % 2 = 1 THEN l.label
              WHEN b.new_label IS NOT NULL AND (l.id + {k}) % 2 = 0 THEN b.new_label
              ELSE l.label END AS label
  FROM s{k - 1} l LEFT JOIN sb{k} b ON b.id = l.id
)""")
    lspread_sql = (
        "WITH " + _DET_PRELUDE + ",\n" + ",\n".join(ls)
        + "\nSELECT id, label FROM s4\n"
    )

    # ---- targeted-attack robustness: per fraction, drop the top
    # floor(f·|V|) degree-ranked vertices (ties → smaller id), then the
    # same recursive reachability closure as cc_sql on the survivors
    atk_cte = ["""ae AS (SELECT unnest(range(1000)) AS i)""", """alev AS (
  SELECT ae.i, l.l,
         ('0x' || substr(md5('rmat-42-' || ae.i || '-' || l.l), 1, 8))::BIGINT
           / 4294967296.0 AS r
  FROM ae, (SELECT unnest(range(7)) AS l) l
)""", """abits AS (
  SELECT i, l,
         CASE WHEN r >= CAST(0.57 AS DOUBLE) + CAST(0.19 AS DOUBLE) THEN 1 ELSE 0 END AS rb,
         CASE WHEN (r >= CAST(0.57 AS DOUBLE) AND r < CAST(0.57 AS DOUBLE) + CAST(0.19 AS DOUBLE))
                OR r >= CAST(0.57 AS DOUBLE) + CAST(0.19 AS DOUBLE) + CAST(0.19 AS DOUBLE)
              THEN 1 ELSE 0 END AS cb
  FROM alev
)""", """armg AS MATERIALIZED (
  SELECT i, CAST(SUM(rb * (1 << l)) AS BIGINT) AS src,
            CAST(SUM(cb * (1 << l)) AS BIGINT) AS dst
  FROM abits GROUP BY i
)""", """aund AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM armg WHERE src <> dst
)""", """asym AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM aund UNION ALL SELECT b, a FROM aund
)""", """adeg AS MATERIALIZED (
  SELECT src AS id, COUNT(*) AS deg FROM asym GROUP BY src
)""", "anv AS (SELECT COUNT(*) AS n FROM adeg)"]
    def _robustness_sql(rank_order):
        # rank_order: the ORDER BY inside the removal election — degree
        # attack vs md5 random failure share everything else
        ctes = list(atk_cte)
        rows_sel = []
        for _t, _f in enumerate((0.0, 0.05, 0.1)):
            ctes.append(f"""rm{_t} AS MATERIALIZED (
  SELECT id FROM (
    SELECT id, ROW_NUMBER() OVER (ORDER BY {rank_order}) AS rn FROM adeg), anv
  WHERE rn <= FLOOR({_f} * anv.n)
)""")
            ctes.append(f"""sym{_t} AS MATERIALIZED (
  SELECT s.src, s.dst FROM asym s
  WHERE s.src NOT IN (SELECT id FROM rm{_t})
    AND s.dst NOT IN (SELECT id FROM rm{_t})
)""")
            ctes.append(f"av{_t} AS MATERIALIZED (SELECT DISTINCT src AS id FROM sym{_t})")
            ctes.append(f"""reach{_t}(id, lbl) AS (
  SELECT id, id FROM av{_t}
  UNION
  SELECT s.dst, r.lbl FROM reach{_t} r JOIN sym{_t} s ON s.src = r.id
)""")
            ctes.append(
                f"comp{_t} AS MATERIALIZED (SELECT id, MIN(lbl) AS component "
                f"FROM reach{_t} GROUP BY id)"
            )
            rows_sel.append(f"""SELECT CAST({_f} AS DOUBLE) AS frac,
       CAST((SELECT COUNT(*) FROM rm{_t}) AS BIGINT) AS n_removed,
       CAST((SELECT COUNT(*) FROM av{_t}) AS BIGINT) AS n_vertices,
       CAST((SELECT COUNT(*) / 2 FROM sym{_t}) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(DISTINCT component) FROM comp{_t}) AS BIGINT) AS n_components,
       CAST((SELECT COALESCE(MAX(sz), 0) FROM (
             SELECT COUNT(*) AS sz FROM comp{_t} GROUP BY component)) AS BIGINT) AS lcc_size""")
        return (
            "WITH RECURSIVE " + ",\n".join(ctes)
            + "\n" + " UNION ALL ".join(rows_sel) + "\nORDER BY frac\n"
        )

    attack_sql = _robustness_sql("deg DESC, id")
    failure_sql = _robustness_sql(
        "('0x' || substr(md5('42:' || CAST(id AS VARCHAR)), 1, 8))::BIGINT, id"
    )

    # ---- clique census 2..4 on the R-MAT graph: canonical-order join
    # chain (a<b<c<d), every clique counted once
    clique_sql = """
WITH e AS (SELECT unnest(range(1000)) AS i),
lev AS (
  SELECT e.i, l.l,
         ('0x' || substr(md5('rmat-42-' || e.i || '-' || l.l), 1, 8))::BIGINT
           / 4294967296.0 AS r
  FROM e, (SELECT unnest(range(7)) AS l) l
),
bits AS (
  SELECT i, l,
         CASE WHEN r >= CAST(0.57 AS DOUBLE) + CAST(0.19 AS DOUBLE) THEN 1 ELSE 0 END AS rb,
         CASE WHEN (r >= CAST(0.57 AS DOUBLE) AND r < CAST(0.57 AS DOUBLE) + CAST(0.19 AS DOUBLE))
                OR r >= CAST(0.57 AS DOUBLE) + CAST(0.19 AS DOUBLE) + CAST(0.19 AS DOUBLE)
              THEN 1 ELSE 0 END AS cb
  FROM lev
),
rmg AS MATERIALIZED (
  SELECT i, CAST(SUM(rb * (1 << l)) AS BIGINT) AS src,
            CAST(SUM(cb * (1 << l)) AS BIGINT) AS dst
  FROM bits GROUP BY i
),
und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM rmg WHERE src <> dst
),
tri AS MATERIALIZED (
  SELECT e1.a, e1.b, e2.b AS c
  FROM und e1 JOIN und e2 ON e2.a = e1.b
  WHERE EXISTS (SELECT 1 FROM und e3 WHERE e3.a = e1.a AND e3.b = e2.b)
),
k4 AS MATERIALIZED (
  SELECT t.a, t.b, t.c, e4.b AS d
  FROM tri t JOIN und e4 ON e4.a = t.c
  WHERE EXISTS (SELECT 1 FROM und x WHERE x.a = t.a AND x.b = e4.b)
    AND EXISTS (SELECT 1 FROM und y WHERE y.a = t.b AND y.b = e4.b)
)
SELECT CAST((SELECT COUNT(*) FROM und) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(*) FROM tri) AS BIGINT) AS n_triangles,
       CAST((SELECT COUNT(*) FROM k4) AS BIGINT) AS n_k4
"""

    # ---- connected components: reachability closure, component = min id
    cc_sql = (
        "WITH RECURSIVE " + _DET_PRELUDE + """,
reach(id, lbl) AS (
  SELECT id, id FROM verts
  UNION
  SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.id
)
SELECT component, CAST(COUNT(*) AS BIGINT) AS size
FROM (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id)
GROUP BY component
"""
    )
    # ---- two-edge components: per-probe excluded-edge reachability
    # (brute-force bridges), then reachability CC over the bridge-free
    # edge set — same det-id graph, component = min vertex id
    tec_sql = (
        "WITH RECURSIVE " + _DET_PRELUDE + """,
tund AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges),
tprobes AS (SELECT ROW_NUMBER() OVER (ORDER BY a, b) AS k, a AS u, b AS w FROM tund),
tsym AS (SELECT a AS src, b AS dst FROM tund UNION ALL SELECT b, a FROM tund),
tex AS (
  SELECT p.k, s.src, s.dst FROM tprobes p JOIN tsym s
  ON NOT ((s.src = p.u AND s.dst = p.w) OR (s.src = p.w AND s.dst = p.u))
),
treach(k, v) AS (
  SELECT k, u FROM tprobes
  UNION
  SELECT e.k, e.dst FROM treach r JOIN tex e ON e.k = r.k AND e.src = r.v
),
tbr AS (
  SELECT p.u AS a, p.w AS b, (r.v IS NULL) AS is_bridge
  FROM tprobes p LEFT JOIN treach r ON r.k = p.k AND r.v = p.w
),
tkeep AS (SELECT a, b FROM tbr WHERE NOT is_bridge),
tksym AS (SELECT a AS src, b AS dst FROM tkeep UNION ALL SELECT b, a FROM tkeep),
tallv AS (SELECT DISTINCT src AS id FROM tsym),
treach2(id, lbl) AS (
  SELECT id, id FROM tallv
  UNION
  SELECT s.dst, r.lbl FROM treach2 r JOIN tksym s ON s.src = r.id
)
SELECT id, MIN(lbl) AS component FROM treach2 GROUP BY id ORDER BY id
"""
    )
    # ---- random walks: 3 unrolled hops, A-Res weighted choice keyed by
    # md5(seed:walk_id:step:dst) — byte-identical selection on both sides
    def _walk_key(step):
        return (
            "pow((('0x' || substr(md5('42:' || CAST(walk_id AS VARCHAR) || "
            f"':{step}:' || CAST(e.dst AS VARCHAR)), 1, 8))::BIGINT + 1.0) "
            "/ 4294967296.0, 1.0 / e.weight)"
        )

    wk = ["s0 AS (SELECT id AS walk_id, id AS v FROM verts)"]
    for t in range(1, 4):
        wk.append(f"""c{t} AS (
  SELECT s{t - 1}.walk_id, e.dst, {_walk_key(t)} AS key
  FROM s{t - 1} JOIN sym e ON e.src = s{t - 1}.v
),
s{t} AS (
  SELECT walk_id, dst AS v FROM (
    SELECT walk_id, dst,
           ROW_NUMBER() OVER (PARTITION BY walk_id ORDER BY key DESC, dst ASC) AS rn
    FROM c{t}
  ) WHERE rn = 1
)""")
    walk_sql = (
        "WITH " + _DET_PRELUDE + ",\n" + ",\n".join(wk) + """
SELECT walk_id, CAST(0 AS BIGINT) AS step, walk_id AS vertex FROM s0
UNION ALL SELECT walk_id, CAST(1 AS BIGINT) AS step, v AS vertex FROM s1
UNION ALL SELECT walk_id, CAST(2 AS BIGINT) AS step, v AS vertex FROM s2
UNION ALL SELECT walk_id, CAST(3 AS BIGINT) AS step, v AS vertex FROM s3
"""
    )

    # ---- HITS: 6 unrolled power iterations on the DIRECTED bipartite
    # graph, UNNORMALISED (scale-invariant) with one final L2 division —
    # the same direction the engine's barrier-normalised run converges to
    hh = ["h0 AS (SELECT id, 1.0 AS hub FROM verts)"]
    for t in range(1, 7):
        hh.append(f"""a{t} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(e.weight * h.hub) AS authority
  FROM edges e JOIN h{t - 1} h ON h.id = e.src GROUP BY e.dst
),
h{t} AS MATERIALIZED (
  SELECT e.src AS id, SUM(e.weight * a.authority) AS hub
  FROM edges e JOIN a{t} a ON a.id = e.dst GROUP BY e.src
)""")
    hits_sql = (
        "WITH " + _DET_PRELUDE + ",\n" + ",\n".join(hh) + """
SELECT v.id,
       ROUND(COALESCE(h.hub / (SELECT sqrt(SUM(hub * hub)) FROM h6), 0.0), 6) AS hub,
       ROUND(COALESCE(a.authority / (SELECT sqrt(SUM(authority * authority)) FROM a6), 0.0), 6) AS authority
FROM verts v LEFT JOIN h6 h ON h.id = v.id LEFT JOIN a6 a ON a.id = v.id
"""
    )

    # ---- node2vec: 3 unrolled biased hops on the directed event-type
    # transition graph; same md5 A-Res key, exponent scaled by the
    # (p=4, q=1/4) bias over the previous vertex (exact binary floats)
    def _n2v_key(step):
        return (
            "pow((('0x' || substr(md5('42:' || CAST(s.walk_id AS VARCHAR) || "
            f"':{step}:' || CAST(e.dst AS VARCHAR)), 1, 8))::BIGINT + 1.0) "
            "/ 4294967296.0, 1.0 / (e.weight * CASE "
            "WHEN s.prev IS NULL THEN 1.0 "
            "WHEN e.dst = s.prev THEN 0.25 "
            "WHEN nb.src IS NOT NULL THEN 1.0 "
            "ELSE 4.0 END))"
        )

    trans_prelude = [
        """tr AS (
  SELECT prev_type AS a, event_type AS b, CAST(COUNT(*) AS DOUBLE) AS weight
  FROM (SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events)
  WHERE prev_type IS NOT NULL GROUP BY 1, 2
)""",
        "tnames AS (SELECT a AS nm FROM tr UNION SELECT b FROM tr)",
        "ntids AS (SELECT nm, ROW_NUMBER() OVER (ORDER BY nm) AS tid FROM tnames)",
        """nedges AS (
  SELECT ta.tid AS src, tb.tid AS dst, tr.weight
  FROM tr JOIN ntids ta ON ta.nm = tr.a JOIN ntids tb ON tb.nm = tr.b
)""",
        "nverts AS (SELECT DISTINCT src AS id FROM nedges UNION SELECT DISTINCT dst FROM nedges)",
    ]
    n2 = trans_prelude + [
        "nnbr AS (SELECT DISTINCT src, dst FROM nedges)",
        "n0 AS (SELECT id AS walk_id, id AS v, CAST(NULL AS BIGINT) AS prev FROM nverts)",
    ]
    for t in range(1, 4):
        n2.append(f"""nc{t} AS (
  SELECT s.walk_id, s.v, e.dst, {_n2v_key(t)} AS key
  FROM n{t - 1} s JOIN nedges e ON e.src = s.v
  LEFT JOIN nnbr nb ON nb.src = s.prev AND nb.dst = e.dst
),
n{t} AS (
  SELECT walk_id, dst AS v, v AS prev FROM (
    SELECT walk_id, v, dst,
           ROW_NUMBER() OVER (PARTITION BY walk_id ORDER BY key DESC, dst ASC) AS rn
    FROM nc{t}
  ) WHERE rn = 1
)""")
    n2v_sql = (
        "WITH " + ",\n".join(n2) + """
SELECT walk_id, CAST(0 AS BIGINT) AS step, walk_id AS vertex FROM n0
UNION ALL SELECT walk_id, CAST(1 AS BIGINT) AS step, v AS vertex FROM n1
UNION ALL SELECT walk_id, CAST(2 AS BIGINT) AS step, v AS vertex FROM n2
UNION ALL SELECT walk_id, CAST(3 AS BIGINT) AS step, v AS vertex FROM n3
"""
    )

    # ---- eigenvector centrality: 8 unrolled power iterations on the
    # SYMMETRISED transition graph (self-loops => aperiodic), same
    # unnormalised-with-final-L2 trick as hits
    ev_ctes = trans_prelude + [
        """nsym AS (SELECT src, dst, weight FROM nedges
        UNION ALL SELECT dst, src, weight FROM nedges)""",
        "x0 AS (SELECT id, 1.0 AS centrality FROM nverts)",
    ]
    for t in range(1, 9):
        ev_ctes.append(f"""x{t} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(e.weight * x.centrality) AS centrality
  FROM nsym e JOIN x{t - 1} x ON x.id = e.src GROUP BY e.dst
)""")
    eig_sql = (
        "WITH " + ",\n".join(ev_ctes) + """
SELECT v.id,
       ROUND(COALESCE(x.centrality /
             (SELECT sqrt(SUM(centrality * centrality)) FROM x8), 0.0), 6) AS centrality
FROM nverts v LEFT JOIN x8 x ON x.id = v.id
"""
    )

    # ---- dyad + closed-triple census on the directed transition graph
    recip_sql = (
        "WITH " + ",\n".join(trans_prelude) + """,
de AS (SELECT DISTINCT src, dst FROM nedges WHERE src <> dst),
mk AS (
  SELECT d.src, d.dst, CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END AS m
  FROM de d LEFT JOIN de r ON r.src = d.dst AND r.dst = d.src
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(m) / 2 AS BIGINT) AS n_mutual,
       CAST(COUNT(*) - SUM(m) AS BIGINT) AS n_asym,
       ROUND(CAST(SUM(m) AS DOUBLE) / COUNT(*), 6) AS reciprocity
FROM mk
"""
    )
    ss = [
        "sde AS (SELECT DISTINCT src, dst FROM nedges WHERE src <> dst)",
        "soutd AS (SELECT src, COUNT(*) AS dout FROM sde GROUP BY src)",
        "sind AS (SELECT dst, COUNT(*) AS din FROM sde GROUP BY dst)",
        """sarcs AS (SELECT sde.src, sde.dst, dout, din
  FROM sde JOIN soutd USING (src) JOIN sind USING (dst))""",
        "sh0 AS (SELECT src AS id, 1.0 / (SELECT COUNT(*) FROM soutd) AS hub FROM soutd)",
    ]
    for t in range(1, 5):
        ss.append(f"""sa{t} AS MATERIALIZED (
  SELECT sarcs.dst AS id, SUM(h.hub / sarcs.dout) AS authority
  FROM sarcs JOIN sh{t - 1} h ON h.id = sarcs.src GROUP BY sarcs.dst
),
sh{t} AS MATERIALIZED (
  SELECT sarcs.src AS id, SUM(a.authority / sarcs.din) AS hub
  FROM sarcs JOIN sa{t} a ON a.id = sarcs.dst GROUP BY sarcs.src
)""")
    salsa_sql = (
        "WITH " + ",\n".join(trans_prelude) + ",\n" + ",\n".join(ss) + """
SELECT v.id, ROUND(COALESCE(h.hub, 0.0), 6) AS hub,
       ROUND(COALESCE(a.authority, 0.0), 6) AS authority
FROM nverts v LEFT JOIN sh4 h ON h.id = v.id LEFT JOIN sa4 a ON a.id = v.id
ORDER BY v.id
"""
    )
    assnum_sql = (
        "WITH " + ",\n".join(trans_prelude) + """,
avals AS (SELECT event_type AS nm, ROUND(AVG(value), 6) AS x FROM events GROUP BY event_type),
att AS (SELECT tid AS id, x FROM ntids JOIN avals USING (nm)),
pe AS (
  SELECT nedges.weight AS w, a.x AS xa, b.x AS xb
  FROM nedges JOIN att a ON a.id = nedges.src JOIN att b ON b.id = nedges.dst
),
mm AS (
  SELECT SUM(w) AS sw, SUM(w * xa) AS sx, SUM(w * xb) AS sy,
         SUM(w * xa * xa) AS sxx, SUM(w * xb * xb) AS syy,
         SUM(w * xa * xb) AS sxy
  FROM pe
)
SELECT CASE WHEN (sxx / sw - (sx / sw) * (sx / sw)) > 0
             AND (syy / sw - (sy / sw) * (sy / sw)) > 0
       THEN ROUND((sxy / sw - (sx / sw) * (sy / sw))
                  / sqrt((sxx / sw - (sx / sw) * (sx / sw))
                         * (syy / sw - (sy / sw) * (sy / sw))), 6)
       END AS assortativity
FROM mm
"""
    )
    _tl = [
        """te0 AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM nedges WHERE src <> dst)""",
        "tk0 AS (SELECT 2 AS t)",
    ]
    for r in range(1, 6):
        _tl.append(f"""tsym{r} AS (SELECT a AS u, b AS v FROM te{r - 1}
          UNION ALL SELECT b, a FROM te{r - 1}),
tsp{r} AS MATERIALIZED (
  SELECT e.a, e.b, COALESCE(c.sup, 0) AS sup
  FROM te{r - 1} e LEFT JOIN (
    SELECT e2.a, e2.b, CAST(COUNT(*) AS BIGINT) AS sup
    FROM te{r - 1} e2
    JOIN tsym{r} s1 ON s1.u = e2.a
    JOIN tsym{r} s2 ON s2.u = e2.b AND s2.v = s1.v
    GROUP BY e2.a, e2.b
  ) c ON c.a = e.a AND c.b = e.b
),
tk{r} AS (SELECT GREATEST((SELECT t FROM tk{r - 1}),
                          COALESCE((SELECT MIN(sup) + 2 FROM tsp{r}),
                                   (SELECT t FROM tk{r - 1}))) AS t),
tp{r} AS MATERIALIZED (
  SELECT a, b, {r} AS layer, (SELECT t FROM tk{r}) AS tn
  FROM tsp{r} WHERE sup <= (SELECT t FROM tk{r}) - 2
),
te{r} AS MATERIALIZED (SELECT a, b FROM tsp{r} WHERE sup > (SELECT t FROM tk{r}) - 2)""")
    trusslayers_sql = (
        "WITH " + ",\n".join(trans_prelude) + ",\n" + ",\n".join(_tl) + """
SELECT a, b, CAST(layer AS BIGINT) AS layer, CAST(tn AS BIGINT) AS trussness FROM (
  """ + "\n  UNION ALL ".join(f"SELECT * FROM tp{r}" for r in range(1, 6)) + """
  UNION ALL SELECT a, b, 6 AS layer, NULL AS tn FROM te5
) ORDER BY a, b
"""
    )
    markov_sql = (
        "WITH " + ",\n".join(trans_prelude) + """,
me AS (SELECT src, dst, SUM(weight) AS w FROM nedges GROUP BY src, dst),
mout AS (SELECT src, SUM(w) AS ow FROM me GROUP BY src),
mtot AS (SELECT SUM(w) AS tw FROM me),
mstates AS (
  SELECT CAST(COUNT(DISTINCT id) AS BIGINT) AS n_states
  FROM (SELECT src AS id FROM me UNION ALL SELECT dst FROM me)
),
mrate AS (
  SELECT CAST(SUM(w) AS BIGINT) AS n_transitions,
         -SUM((w / tw) * log2(w / ow)) AS h_rate
  FROM me JOIN mout USING (src) CROSS JOIN mtot
),
mstat AS (
  SELECT -SUM((ow / tw) * log2(ow / tw)) AS h_stat
  FROM mout CROSS JOIN mtot
)
SELECT n_states, n_transitions,
       ROUND(h_rate, 6) AS entropy_rate_bits,
       ROUND(pow(2.0, h_rate), 6) AS perplexity,
       ROUND(h_stat, 6) AS stationary_entropy_bits
FROM mrate CROSS JOIN mstates CROSS JOIN mstat
"""
    )
    linegraph_sql = (
        "WITH " + ",\n".join(trans_prelude) + """,
de AS (SELECT DISTINCT src, dst FROM nedges WHERE src <> dst),
ind AS (SELECT dst AS via, COUNT(*) AS din FROM de GROUP BY dst),
outd AS (SELECT src AS via, COUNT(*) AS dout FROM de GROUP BY src),
ok AS (SELECT ind.via FROM ind JOIN outd USING (via)
       WHERE din <= 100000 AND dout <= 100000)
SELECT l.src AS a, l.dst AS b, r.dst AS c
FROM de l JOIN ok ON ok.via = l.dst JOIN de r ON r.src = l.dst
"""
    )
    dyad_sql = (
        "WITH " + ",\n".join(trans_prelude) + """,
de AS (SELECT DISTINCT src, dst FROM nedges WHERE src <> dst),
mk AS (
  SELECT d.src, d.dst, CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END AS m
  FROM de d LEFT JOIN de r ON r.src = d.dst AND r.dst = d.src
),
ma AS (
  SELECT CAST(SUM(m) / 2 AS BIGINT) AS n_mutual,
         CAST(COUNT(*) - SUM(m) AS BIGINT) AS n_asym
  FROM mk
),
nv AS (
  SELECT COUNT(*) AS n FROM (
    SELECT src AS id FROM de UNION SELECT dst FROM de)
)
SELECT n_mutual, n_asym,
       CAST(n * (n - 1) / 2 - n_mutual - n_asym AS BIGINT) AS n_null
FROM ma, nv
"""
    )
    # ---- Radicchi edge clustering on the transition graph: per-edge
    # triangle counts from the canonical wedge join, (t+1)/(min(deg)-1)
    radicchi_sql = (
        "WITH " + ",\n".join(trans_prelude) + """,
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM nedges WHERE src <> dst),
deg AS (
  SELECT id, COUNT(*) AS deg
  FROM (SELECT a AS id FROM und UNION ALL SELECT b FROM und) GROUP BY id
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1 JOIN und e2 ON e2.a = e1.b
  WHERE EXISTS (SELECT 1 FROM und e3 WHERE e3.a = e1.a AND e3.b = e2.b)
),
per_edge AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
    SELECT x AS a, y AS b FROM tri
    UNION ALL SELECT x, z FROM tri
    UNION ALL SELECT y, z FROM tri
  ) GROUP BY a, b
)
SELECT u.a, u.b,
       CAST(COALESCE(p.n_triangles, 0) AS BIGINT) AS n_triangles,
       ROUND(CASE WHEN LEAST(da.deg, db.deg) > 1
                  THEN (COALESCE(p.n_triangles, 0) + 1.0)
                       / (LEAST(da.deg, db.deg) - 1.0) END, 6) AS ecc
FROM und u
LEFT JOIN per_edge p ON p.a = u.a AND p.b = u.b
JOIN deg da ON da.id = u.a
JOIN deg db ON db.id = u.b
ORDER BY u.a, u.b
"""
    )

    # ---- Heider balance census: md5 edge signs, canonical signed wedge
    # join, balanced = even negative count
    balance_sql = (
        "WITH " + ",\n".join(trans_prelude) + """,
sg AS (
  SELECT src, dst,
         (('0x' || substr(md5('sg-' || src || '-' || dst), 1, 8))::BIGINT % 2) * 2 - 1 AS w
  FROM nedges
),
su AS (
  SELECT a, b, CASE WHEN w > 0 THEN 1 ELSE -1 END AS s FROM (
    SELECT least(src, dst) AS a, greatest(src, dst) AS b, SUM(w) AS w
    FROM sg WHERE src <> dst GROUP BY 1, 2
  ) WHERE w <> 0
),
tri AS (
  SELECT e1.s AS s1, e2.s AS s2, e3.s AS s3
  FROM su e1 JOIN su e2 ON e2.a = e1.b
  JOIN su e3 ON e3.a = e1.a AND e3.b = e2.b
),
cn AS (
  SELECT (CASE WHEN s1 < 0 THEN 1 ELSE 0 END
          + CASE WHEN s2 < 0 THEN 1 ELSE 0 END
          + CASE WHEN s3 < 0 THEN 1 ELSE 0 END) AS n_neg
  FROM tri
)
SELECT CAST(SUM(CASE WHEN n_neg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ppp,
       CAST(SUM(CASE WHEN n_neg = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ppm,
       CAST(SUM(CASE WHEN n_neg = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_pmm,
       CAST(SUM(CASE WHEN n_neg = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_mmm,
       CAST(COUNT(*) AS BIGINT) AS n_triangles,
       ROUND(SUM(CASE WHEN n_neg % 2 = 0 THEN 1.0 ELSE 0.0 END) / COUNT(*), 6)
         AS balance_ratio
FROM cn
"""
    )

    # ---- bipartiteness via the double cover: component = min cover
    # label // 2, two one-per-side copies ⇔ no odd cycle.
    # NB: under WITH RECURSIVE DuckDB parses any `name AS (X UNION Y)`
    # CTE as recursive even without self-reference, silently changing
    # its dedup semantics — so the prelude's bare-UNION CTEs (tnames,
    # nverts) are replaced with subquery-wrapped equivalents here.
    bip_prelude = [
        trans_prelude[0],
        "tnames AS (SELECT DISTINCT nm FROM (SELECT a AS nm FROM tr"
        " UNION ALL SELECT b AS nm FROM tr))",
        trans_prelude[2],
        trans_prelude[3],
        "nverts AS (SELECT DISTINCT id FROM (SELECT src AS id FROM nedges"
        " UNION ALL SELECT dst AS id FROM nedges))",
    ]
    bip_sql = (
        "WITH RECURSIVE " + ",\n".join(bip_prelude) + """,
bde AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM nedges WHERE src <> dst),
cov AS (SELECT 2 * a AS src, 2 * b + 1 AS dst FROM bde
        UNION ALL SELECT 2 * a + 1, 2 * b FROM bde),
csym AS (SELECT src, dst FROM cov UNION ALL SELECT dst, src FROM cov),
cverts AS (SELECT DISTINCT src AS id FROM csym),
reach(id, lbl) AS (
  SELECT id, id FROM cverts
  UNION
  SELECT s.dst, r.lbl FROM reach r JOIN csym s ON s.src = r.id
),
comp AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id),
pv AS (
  SELECT id // 2 AS v, MIN(component) AS c0, MAX(component) AS c1
  FROM comp GROUP BY id // 2
)
SELECT CAST(c0 // 2 AS BIGINT) AS component,
       CAST(COUNT(*) AS BIGINT) AS n_vertices,
       BOOL_AND(c0 <> c1) AS is_bipartite
FROM pv GROUP BY c0 // 2
ORDER BY component
"""
    )
    triples_sql = (
        "WITH " + ",\n".join(trans_prelude) + """,
de AS (SELECT DISTINCT src, dst FROM nedges WHERE src <> dst),
p2 AS (
  SELECT x.src AS a, x.dst AS b, y.dst AS c
  FROM de x JOIN de y ON y.src = x.dst
  WHERE y.dst <> x.src
),
sc AS (
  SELECT p2.a, p2.c,
         CASE WHEN bk.src IS NOT NULL THEN 1 ELSE 0 END AS cyc,
         CASE WHEN fw.src IS NOT NULL THEN 1 ELSE 0 END AS tra
  FROM p2
  LEFT JOIN de bk ON bk.src = p2.c AND bk.dst = p2.a
  LEFT JOIN de fw ON fw.src = p2.a AND fw.dst = p2.c
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_paths2,
       CAST(COALESCE(SUM(cyc) / 3, 0) AS BIGINT) AS n_cyclic,
       CAST(COALESCE(SUM(tra), 0) AS BIGINT) AS n_transitive
FROM sc
"""
    )

    # ---- k-truss: 4 unrolled synchronous peel rounds (k=5 -> support
    # >= 3) on the simple transition graph; every CTE MATERIALIZED (each
    # round references the previous edge set 4 times — inlining would
    # blow the base scan up 4^4x, cf. the k_core twin)
    def _kt_sup(src_cte):
        return f"""
    SELECT e.a, e.b, COUNT(*) AS support
    FROM {src_cte} e
    JOIN (SELECT a AS u, b AS v FROM {src_cte}
          UNION ALL SELECT b AS u, a AS v FROM {src_cte}) s1 ON s1.u = e.a
    JOIN (SELECT a AS u, b AS v FROM {src_cte}
          UNION ALL SELECT b AS u, a AS v FROM {src_cte}) s2
      ON s2.u = e.b AND s2.v = s1.v
    GROUP BY e.a, e.b"""

    kt = ["WITH " + ",\n".join(trans_prelude),
          """te0 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM nedges WHERE src <> dst
)"""]
    for r in range(1, 5):
        kt.append(f"ts{r} AS MATERIALIZED ({_kt_sup(f'te{r - 1}')}\n)")
        kt.append(f"""te{r} AS MATERIALIZED (
  SELECT e.a, e.b FROM te{r - 1} e
  JOIN ts{r} s ON s.a = e.a AND s.b = e.b AND s.support >= 3
)""")
    kt.append(f"tsf AS MATERIALIZED ({_kt_sup('te4')}\n)")
    ktruss_sql = (
        kt[0] + ",\n" + ",\n".join(kt[1:]) + """
SELECT e.a, e.b, CAST(COALESCE(s.support, 0) AS BIGINT) AS support
FROM te4 e LEFT JOIN tsf s ON s.a = e.a AND s.b = e.b
"""
    )

    # ---- Luby MIS: 3 unrolled rounds, md5-priority total order — a
    # vertex wins when its (p, id) pair beats every active neighbour's
    mis = ["""ge0 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst
)""",
           """av0 AS MATERIALIZED (
  SELECT id, ('0x' || substr(md5('42:' || CAST(id AS VARCHAR)), 1, 8))::BIGINT AS p
  FROM (SELECT a AS id FROM ge0 UNION SELECT b FROM ge0)
)"""]
    for r in range(1, 4):
        mis.append(f"""sy{r} AS (SELECT a AS u, b AS v FROM ge{r - 1}
          UNION ALL SELECT b AS u, a AS v FROM ge{r - 1})""")
        mis.append(f"""nb{r} AS MATERIALIZED (
  SELECT s.u AS id, MIN(ROW(av.p, av.id)) AS nb
  FROM sy{r} s JOIN av{r - 1} av ON av.id = s.v GROUP BY s.u
)""")
        mis.append(f"""w{r} AS MATERIALIZED (
  SELECT av.id FROM av{r - 1} av LEFT JOIN nb{r} n ON n.id = av.id
  WHERE n.id IS NULL OR ROW(av.p, av.id) < n.nb
)""")
        mis.append(f"""av{r} AS MATERIALIZED (
  SELECT av.id, av.p FROM av{r - 1} av
  WHERE av.id NOT IN (SELECT id FROM w{r})
    AND av.id NOT IN (SELECT s.v FROM sy{r} s JOIN w{r} w ON w.id = s.u)
)""")
        mis.append(f"""ge{r} AS MATERIALIZED (
  SELECT g.a, g.b FROM ge{r - 1} g
  JOIN av{r} x ON x.id = g.a JOIN av{r} y ON y.id = g.b
)""")
    mis_sql = (
        "WITH " + _DET_PRELUDE + ",\n" + ",\n".join(mis) + """
SELECT id, CAST(1 AS BIGINT) AS mis_round FROM w1
UNION ALL SELECT id, CAST(2 AS BIGINT) FROM w2
UNION ALL SELECT id, CAST(3 AS BIGINT) FROM w3
"""
    )

    # ---- densest subgraph: 4 unrolled Bahmani peel rounds (eps=0) on
    # the simple bipartite graph; best (earliest on ties) round wins
    dsg = ["""g0 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst
)"""]
    for r in range(0, 5):
        dsg.append(f"""d{r} AS MATERIALIZED (
  SELECT id, COUNT(*) AS deg
  FROM (SELECT a AS id FROM g{r} UNION ALL SELECT b FROM g{r}) GROUP BY id
)""")
        dsg.append(
            f"r{r} AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
            f"COALESCE(SUM(deg), 0) / 2.0 AS m FROM d{r})"
        )
        if r < 4:
            dsg.append(f"""g{r + 1} AS MATERIALIZED (
  SELECT g.a, g.b FROM g{r} g
  JOIN d{r} da ON da.id = g.a JOIN d{r} db ON db.id = g.b
  WHERE da.deg > 2.0 * (SELECT m / n FROM r{r})
    AND db.deg > 2.0 * (SELECT m / n FROM r{r})
)""")
    dsg.append(
        "dens AS (" + " UNION ALL ".join(
            f"SELECT {r} AS r, m / n AS density FROM r{r} WHERE n > 0"
            for r in range(0, 5)
        ) + ")"
    )
    dsg.append("best AS (SELECT r, density FROM dens ORDER BY density DESC, r ASC LIMIT 1)")
    dsg_sql = (
        "WITH " + _DET_PRELUDE + ",\n" + ",\n".join(dsg) + """
SELECT u.id, ROUND((SELECT density FROM best), 6) AS density
FROM (
""" + " UNION ALL ".join(f"SELECT id, {r} AS r FROM d{r}" for r in range(0, 5)) + """
) u WHERE u.r = (SELECT r FROM best)
"""
    )

    # ---- negative sampling: md5 draws over the rank-ordered vertex table
    negs_sql = (
        "WITH " + _DET_PRELUDE + """,
de AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
vt AS (SELECT id, ROW_NUMBER() OVER (ORDER BY id) AS idx FROM verts),
n1 AS (SELECT COUNT(*) AS n FROM vt),
dr AS (SELECT src, dst, CAST(i AS BIGINT) AS draw
       FROM de CROSS JOIN (SELECT unnest(range(1, 4)) AS i)),
c AS (
  SELECT dr.src, dr.dst, dr.draw,
         (('0x' || substr(md5('7:' || CAST(dr.src AS VARCHAR) || ':' ||
             CAST(dr.dst AS VARCHAR) || ':' || CAST(dr.draw AS VARCHAR)),
             1, 8))::BIGINT % n1.n) + 1 AS idx
  FROM dr CROSS JOIN n1
),
cd AS (
  SELECT c.src, c.dst AS pos_dst, vt.id AS neg_dst, c.draw
  FROM c JOIN vt USING (idx) WHERE vt.id <> c.src
)
SELECT cd.src, cd.pos_dst, cd.neg_dst, cd.draw
FROM cd LEFT JOIN de x ON x.src = cd.src AND x.dst = cd.neg_dst
WHERE x.src IS NULL
"""
    )

    # ---- strongly connected components: directed events graph (even
    # event_ids forward, odd event_ids return for every 5th user);
    # SCC(v) via the mutual-reachability closure, label = min member id
    _scc_ctes = """
tids AS (
  SELECT event_type, 2 * ROW_NUMBER() OVER (ORDER BY event_type) + 1 AS tid
  FROM (SELECT DISTINCT event_type FROM events)
),
de AS (
  SELECT DISTINCT 2 * user_id AS src, tid AS dst
  FROM events JOIN tids USING (event_type) WHERE event_id % 2 = 0
  UNION
  SELECT DISTINCT tid AS src, 2 * user_id AS dst
  FROM events JOIN tids USING (event_type)
  WHERE event_id % 2 = 1 AND user_id % 5 = 0
),
verts AS (SELECT DISTINCT id FROM
          (SELECT src AS id FROM de UNION ALL SELECT dst FROM de)),
reach(a, b) AS (
  SELECT src, dst FROM de
  UNION
  SELECT r.a, e.dst FROM reach r JOIN de e ON e.src = r.b
),
mutual AS (
  SELECT r1.a AS v, r1.b AS u FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
),
comp AS (
  SELECT v.id, LEAST(v.id, COALESCE(MIN(m.u), v.id)) AS component
  FROM verts v LEFT JOIN mutual m ON m.v = v.id
  GROUP BY v.id
)"""
    scc_sql = (
        "WITH RECURSIVE" + _scc_ctes + """
SELECT component, CAST(COUNT(*) AS BIGINT) AS size FROM comp GROUP BY component
"""
    )
    bowtie_sql = (
        "WITH RECURSIVE" + _scc_ctes + """,
giant AS (
  SELECT component FROM (
    SELECT component, COUNT(*) AS n FROM comp GROUP BY component
    ORDER BY n DESC, component ASC LIMIT 1
  )
),
incore AS (SELECT id FROM comp JOIN giant USING (component)),
fwd AS (SELECT DISTINCT r.b AS id FROM reach r JOIN incore c ON r.a = c.id),
bwd AS (SELECT DISTINCT r.a AS id FROM reach r JOIN incore c ON r.b = c.id)
SELECT v.id,
       CASE WHEN c.id IS NOT NULL THEN 'core'
            WHEN b.id IS NOT NULL THEN 'in'
            WHEN f.id IS NOT NULL THEN 'out'
            ELSE 'other' END AS cls
FROM verts v
LEFT JOIN incore c ON c.id = v.id
LEFT JOIN bwd b ON b.id = v.id
LEFT JOIN fwd f ON f.id = v.id
ORDER BY v.id
"""
    )

    # ---- degree assortativity: Pearson corr of end degrees on the
    # symmetrised simple edge list
    assort_sql = (
        "WITH " + _DET_PRELUDE + """,
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
s AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
deg AS (SELECT a AS id, COUNT(*) AS deg FROM s GROUP BY a)
SELECT ROUND(corr(CAST(da.deg AS DOUBLE), CAST(db.deg AS DOUBLE)), 6) AS assortativity
FROM s JOIN deg da ON da.id = s.a JOIN deg db ON db.id = s.b
"""
    )

    # ---- k-core (k=3): 8 synchronous peel rounds, unrolled.  Every CTE
    # is MATERIALIZED: e{r} references e{r-1} three times (degree count +
    # two membership tests), so inlining would blow the base scan up 3^8×
    kc = ["e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges WHERE src <> dst)"]
    for r in range(1, 9):
        kc.append(f"""k{r} AS MATERIALIZED (
  SELECT id FROM (
    SELECT id, COUNT(*) AS deg FROM (
      SELECT a AS id FROM e{r - 1} UNION ALL SELECT b AS id FROM e{r - 1}
    ) GROUP BY id
  ) WHERE deg >= 3
),
e{r} AS MATERIALIZED (
  SELECT a, b FROM e{r - 1}
  WHERE a IN (SELECT id FROM k{r}) AND b IN (SELECT id FROM k{r})
)""")
    kcore_sql = (
        "WITH " + _DET_PRELUDE + ",\n" + ",\n".join(kc) + """
SELECT id, CAST(COUNT(*) AS BIGINT) AS core_deg
FROM (SELECT a AS id FROM e8 UNION ALL SELECT b AS id FROM e8)
GROUP BY id
"""
    )
    # ---- Adamic–Adar link prediction: wedge enumeration around common
    # neighbours on the simple symmetrised graph, existing edges excluded
    aa_sql = (
        "WITH " + _DET_PRELUDE + """,
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
adj AS (SELECT a AS w, b AS x FROM und UNION ALL SELECT b AS w, a AS x FROM und),
deg AS (SELECT w, COUNT(*) AS deg FROM adj GROUP BY w),
centers AS (
  SELECT adj.w, adj.x, 1.0 / ln(deg) AS cw
  FROM adj JOIN deg USING (w) WHERE deg <= 100000
),
wedges AS (
  SELECT l.x AS src, r.x AS dst, l.cw
  FROM centers l JOIN centers r ON l.w = r.w AND l.x < r.x
),
scores AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n_common, ROUND(SUM(cw), 6) AS aa
  FROM wedges GROUP BY src, dst
)
SELECT s.src, s.dst, s.n_common, s.aa
FROM scores s LEFT JOIN und ON und.a = s.src AND und.b = s.dst
WHERE und.a IS NULL AND s.n_common >= 2
"""
    )

    # ---- Jaccard link prediction: same wedge enumeration, scored as
    # |N(u)∩N(v)| / |N(u)∪N(v)| with true (uncapped) endpoint degrees
    jc_sql = (
        "WITH " + _DET_PRELUDE + """,
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
adj AS (SELECT a AS w, b AS x FROM und UNION ALL SELECT b AS w, a AS x FROM und),
deg AS (SELECT w, COUNT(*) AS deg FROM adj GROUP BY w),
centers AS (
  SELECT adj.w, adj.x FROM adj JOIN deg USING (w) WHERE deg <= 100000
),
wedges AS (
  SELECT l.x AS src, r.x AS dst
  FROM centers l JOIN centers r ON l.w = r.w AND l.x < r.x
),
common AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM wedges GROUP BY src, dst
)
SELECT c.src, c.dst, c.n_common,
       ROUND(CAST(c.n_common AS DOUBLE) / (ds.deg + dd.deg - c.n_common), 6) AS jc
FROM common c
JOIN deg ds ON ds.w = c.src
JOIN deg dd ON dd.w = c.dst
LEFT JOIN und ON und.a = c.src AND und.b = c.dst
WHERE und.a IS NULL AND c.n_common >= 2
"""
    )

    # ---- Dice vertex similarity: the same wedge enumeration with the
    # 2·common/(deg+deg) weighting (igraph similarity_dice)
    dice_sql = (
        "WITH " + _DET_PRELUDE + """,
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
adj AS (SELECT a AS w, b AS x FROM und UNION ALL SELECT b AS w, a AS x FROM und),
deg AS (SELECT w, COUNT(*) AS deg FROM adj GROUP BY w),
centers AS (
  SELECT adj.w, adj.x FROM adj JOIN deg USING (w) WHERE deg <= 100000
),
wedges AS (
  SELECT l.x AS src, r.x AS dst
  FROM centers l JOIN centers r ON l.w = r.w AND l.x < r.x
),
common AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM wedges GROUP BY src, dst
)
SELECT c.src, c.dst, c.n_common,
       ROUND(2.0 * c.n_common / (ds.deg + dd.deg), 6) AS dice
FROM common c
JOIN deg ds ON ds.w = c.src
JOIN deg dd ON dd.w = c.dst
LEFT JOIN und ON und.a = c.src AND und.b = c.dst
WHERE und.a IS NULL AND c.n_common >= 2
"""
    )

    # ---- truncated harmonic centrality (max_dist=2) on the simple
    # symmetrised graph: ring-1 neighbours at weight 1, fresh ring-2
    # vertices at weight 1/2
    # ---- Molloy–Reed criterion: degree moments in one aggregate
    mr_sql = (
        "WITH " + _DET_PRELUDE + """,
deg AS (SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS k FROM sym GROUP BY src)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
       ROUND(AVG(k), 6) AS mean_k,
       ROUND(AVG(k * k), 6) AS mean_k2,
       ROUND(AVG(k * k) / AVG(k), 6) AS kappa,
       ROUND(CASE WHEN AVG(k * k) / AVG(k) > 2
                  THEN 1.0 - 1.0 / (AVG(k * k) / AVG(k) - 1.0) END, 6) AS f_c
FROM deg
"""
    )

    # ---- Clauset–Shalizi–Newman power-law MLE at fixed xmin=2 over the
    # bipartite degree sequence; KS vs the continuous-approx tail CCDF
    plaw_sql = (
        "WITH " + _DET_PRELUDE + """,
deg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY src),
tail AS (SELECT deg FROM deg WHERE deg >= 2),
st AS (
  SELECT COUNT(*) AS n_tail,
         1.0 + COUNT(*) / SUM(ln(deg / 1.5)) AS alpha
  FROM tail
),
dd AS (SELECT deg, COUNT(*) AS cnt FROM tail GROUP BY deg),
ccdf AS (
  SELECT deg,
         SUM(cnt) OVER (ORDER BY deg DESC ROWS UNBOUNDED PRECEDING) AS cum
  FROM dd
),
ks AS (
  SELECT MAX(ABS(CAST(cum AS DOUBLE) / st.n_tail
                 - POWER((deg - 0.5) / 1.5, 1.0 - st.alpha))) AS ks
  FROM ccdf, st
)
SELECT CAST(2 AS BIGINT) AS xmin, CAST(st.n_tail AS BIGINT) AS n_tail,
       ROUND(st.alpha, 6) AS alpha, ROUND(ks.ks, 6) AS ks
FROM st, ks
"""
    )

    # ---- Borgatti–Everett core–periphery phi from four scalars; core =
    # top ⌊n/4⌋ by (degree desc, id)
    cp_sql = (
        "WITH " + _DET_PRELUDE + """,
deg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY src),
nv AS (SELECT COUNT(*) AS n FROM deg),
core AS (
  SELECT id FROM (
    SELECT id, ROW_NUMBER() OVER (ORDER BY deg DESC, id) AS rn FROM deg), nv
  WHERE rn <= nv.n // 4
),
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
em AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS m,
         CAST(SUM(CASE WHEN a NOT IN (SELECT id FROM core)
                        AND b NOT IN (SELECT id FROM core)
                       THEN 1 ELSE 0 END) AS DOUBLE) AS e_pp
  FROM und
),
sc AS (
  SELECT CAST(nv.n AS DOUBLE) AS n,
         CAST((SELECT COUNT(*) FROM core) AS DOUBLE) AS n_core,
         em.m, em.e_pp
  FROM nv, em
),
ct AS (
  SELECT *, n - n_core AS n_per, n * (n - 1) / 2 AS t,
         (n - n_core) * (n - n_core - 1) / 2 AS t_pp
  FROM sc
),
cells AS (
  SELECT *, m - e_pp AS n11, e_pp AS n10,
         t - t_pp - (m - e_pp) AS n01, t_pp - e_pp AS n00
  FROM ct
)
SELECT CAST(n_core AS BIGINT) AS n_core, CAST(n_per AS BIGINT) AS n_periphery,
       CAST(m AS BIGINT) AS n_edges, CAST(e_pp AS BIGINT) AS edges_pp,
       ROUND(CASE WHEN (n11 + n10) * (n01 + n00) * (n11 + n01) * (n10 + n00) > 0
                  THEN (n11 * n00 - n10 * n01)
                       / sqrt((n11 + n10) * (n01 + n00) * (n11 + n01) * (n10 + n00))
             END, 6) AS phi
FROM cells
"""
    )

    # ---- graph Voronoi: 3 unrolled multi-source BFS rings from the 4
    # md5-elected seeds; a vertex is assigned by the FIRST ring that
    # reaches it, same-ring ties to the smallest seed id
    voronoi_sql = (
        "WITH " + _DET_PRELUDE + """,
sd AS (
  SELECT id FROM (
    SELECT id, ('0x' || substr(md5('42:' || CAST(id AS VARCHAR)), 1, 8))::BIGINT AS p
    FROM verts) ORDER BY p, id LIMIT 4
),
r0 AS (SELECT id, id AS seed, 0 AS dist FROM sd),
r1 AS (
  SELECT s.dst AS id, MIN(r0.seed) AS seed, 1 AS dist
  FROM r0 JOIN sym s ON s.src = r0.id
  WHERE s.dst NOT IN (SELECT id FROM r0)
  GROUP BY s.dst
),
r2 AS (
  SELECT s.dst AS id, MIN(r1.seed) AS seed, 2 AS dist
  FROM r1 JOIN sym s ON s.src = r1.id
  WHERE s.dst NOT IN (SELECT id FROM r0 UNION ALL SELECT id FROM r1)
  GROUP BY s.dst
),
r3 AS (
  SELECT s.dst AS id, MIN(r2.seed) AS seed, 3 AS dist
  FROM r2 JOIN sym s ON s.src = r2.id
  WHERE s.dst NOT IN (SELECT id FROM r0 UNION ALL SELECT id FROM r1
                      UNION ALL SELECT id FROM r2)
  GROUP BY s.dst
)
SELECT CAST(id AS BIGINT) AS id, CAST(seed AS BIGINT) AS seed,
       CAST(dist AS BIGINT) AS dist
FROM (SELECT * FROM r0 UNION ALL SELECT * FROM r1
      UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3)
"""
    )

    # ---- Kahn topological levels on the small→large orientation (a DAG
    # by construction): level = longest path from any zero-in-degree
    # source — the recursive CTE dedups (vertex, depth) pairs so the
    # recursion length is the DAG depth, not the path count
    topo_sql = (
        "WITH RECURSIVE " + _DET_PRELUDE + """,
de AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       FROM edges WHERE src <> dst),
s0 AS (
  SELECT id FROM (SELECT a AS id FROM de UNION SELECT b FROM de) v
  WHERE id NOT IN (SELECT b FROM de)
),
lev(v, d) AS (
  SELECT id, 0 FROM s0
  UNION
  SELECT e.b, lev.d + 1 FROM lev JOIN de e ON e.a = lev.v
)
SELECT v AS id, CAST(MAX(d) AS BIGINT) AS level FROM lev GROUP BY v
"""
    )

    harm_sql = (
        "WITH " + _DET_PRELUDE + """,
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
s AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
r1 AS (SELECT DISTINCT a AS id, b AS v FROM s),
r2 AS (
  SELECT id, v FROM (
    SELECT DISTINCT r1.id, s.b AS v FROM r1 JOIN s ON s.a = r1.v WHERE s.b <> r1.id
  ) EXCEPT SELECT id, v FROM r1
),
ball AS (
  SELECT id, v, 1 AS d FROM r1
  UNION ALL
  SELECT id, v, 2 AS d FROM r2
)
SELECT id, CAST(COUNT(*) AS BIGINT) AS n_reachable,
       ROUND(SUM(1.0 / d), 6) AS harmonic
FROM ball GROUP BY id
"""
    )

    # ---- Newman leading-eigenvector bisection: 24 unrolled shifted
    # power iterations on B = A − kkᵀ/2m (rank-1 term as a 1-row kx
    # scalar), L2 + 9dp rounding at barriers 8/16/24 — the rounding is
    # what pins cross-engine float drift
    lev_cte = ["""levk AS MATERIALIZED (
  SELECT src AS id, SUM(weight) AS k FROM sym GROUP BY src
)""", """levc AS MATERIALIZED (
  SELECT SUM(k) AS two_m, 1.0 + MAX(k) AS c FROM levk
)""", """lx0 AS MATERIALIZED (
  SELECT id, k,
         ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 - 0.5 AS x
  FROM levk
)"""]
    for _t in range(1, 25):
        lev_cte.append(f"lkx{_t} AS MATERIALIZED (SELECT SUM(k * x) AS kx FROM lx{_t - 1})")
        lev_cte.append(f"""lg{_t} AS MATERIALIZED (
  SELECT s.dst AS id, SUM(s.weight * x.x) AS ax
  FROM sym s JOIN lx{_t - 1} x ON x.id = s.src GROUP BY s.dst
)""")
        _body = (
            f"SELECT p.id, p.k, COALESCE(g.ax, 0) + cc.c * p.x"
            f" - p.k * kx.kx / cc.two_m AS x\n"
            f"  FROM lx{_t - 1} p LEFT JOIN lg{_t} g ON g.id = p.id, levc cc, lkx{_t} kx"
        )
        if _t % 8 == 0:
            lev_cte.append(f"lraw{_t} AS MATERIALIZED (\n  {_body}\n)")
            lev_cte.append(f"""lx{_t} AS MATERIALIZED (
  SELECT id, k,
         ROUND(x / (SELECT sqrt(SUM(x * x)) FROM lraw{_t}), 9) AS x
  FROM lraw{_t}
)""")
        else:
            lev_cte.append(f"lx{_t} AS MATERIALIZED (\n  {_body}\n)")
    lev_sql = (
        "WITH " + _DET_PRELUDE + ",\n" + ",\n".join(lev_cte)
        + """
SELECT id, ROUND(x, 6) AS score,
       CAST(CASE WHEN x >= 0 THEN 1 ELSE -1 END AS BIGINT) AS side
FROM lx24 ORDER BY id
"""
    )

    # ---- weighted SSSP from vertex 0: 8 unrolled Bellman–Ford rounds
    # (fixpoint at 4 on this graph; extra rounds are provable no-ops),
    # min-collapsed symmetric weights, every round MATERIALIZED
    bf_cte = ["wsym AS MATERIALIZED (SELECT src, dst, MIN(weight) AS w FROM sym GROUP BY src, dst)",
              "d0 AS (SELECT CAST(0 AS BIGINT) AS id, 0.0 AS dist)"]
    for _r in range(1, 9):
        bf_cte.append(f"""c{_r} AS MATERIALIZED (
  SELECT s.dst AS id, MIN(d.dist + s.w) AS nd
  FROM d{_r - 1} d JOIN wsym s ON s.src = d.id GROUP BY s.dst
)""")
        bf_cte.append(f"""d{_r} AS MATERIALIZED (
  SELECT COALESCE(d.id, c.id) AS id,
         CASE WHEN d.dist IS NULL THEN c.nd
              WHEN c.nd IS NULL THEN d.dist
              WHEN c.nd < d.dist THEN c.nd ELSE d.dist END AS dist
  FROM d{_r - 1} d FULL JOIN c{_r} c ON c.id = d.id
)""")
    sssp_sql = (
        "WITH " + _DET_PRELUDE + ",\n" + ",\n".join(bf_cte)
        + "\nSELECT id, ROUND(dist, 6) AS dist FROM d8\n"
    )

    # ---- truncated eccentricity (max_dist=2): max ring index + reached
    # count over the same unrolled 2-ring ball as harmonic/closeness
    ecc_sql = (
        "WITH " + _DET_PRELUDE + """,
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
s AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
r1 AS (SELECT DISTINCT a AS id, b AS v FROM s),
r2 AS (
  SELECT id, v FROM (
    SELECT DISTINCT r1.id, s.b AS v FROM r1 JOIN s ON s.a = r1.v WHERE s.b <> r1.id
  ) EXCEPT SELECT id, v FROM r1
),
ball AS (
  SELECT id, v, 1 AS d FROM r1
  UNION ALL
  SELECT id, v, 2 AS d FROM r2
)
SELECT id, CAST(MAX(d) AS BIGINT) AS ecc,
       CAST(COUNT(*) AS BIGINT) AS n_reachable
FROM ball GROUP BY id
"""
    )

    # ---- truncated closeness (max_dist=2): same unrolled 2-ring ball as
    # harmonic, Wasserman–Faust composite (r/(n-1))*(r/S)
    closeness_sql = (
        "WITH " + _DET_PRELUDE + """,
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
s AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
nv AS (SELECT CAST(COUNT(DISTINCT a) AS DOUBLE) AS n FROM s),
r1 AS (SELECT DISTINCT a AS id, b AS v FROM s),
r2 AS (
  SELECT id, v FROM (
    SELECT DISTINCT r1.id, s.b AS v FROM r1 JOIN s ON s.a = r1.v WHERE s.b <> r1.id
  ) EXCEPT SELECT id, v FROM r1
),
ball AS (
  SELECT id, v, 1 AS d FROM r1
  UNION ALL
  SELECT id, v, 2 AS d FROM r2
)
SELECT id, CAST(COUNT(*) AS BIGINT) AS n_reachable,
       CAST(SUM(d) AS DOUBLE) AS sum_dist,
       ROUND((COUNT(*) / ((SELECT n FROM nv) - 1)) * (COUNT(*) * 1.0 / SUM(d)), 6)
         AS closeness
FROM ball GROUP BY id
"""
    )

    # ---- truncated betweenness (max_dist=2): Brandes unrolled — dist-1
    # ring has sigma 1, dist-2 sigma = #midpoints, the only dependency
    # ring is dist-1 (delta = sum 1/sigma_w over dist-2 successors)
    betweenness_sql = (
        "WITH " + _DET_PRELUDE + """,
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
s AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
vv AS (SELECT DISTINCT a AS id FROM s),
d1 AS (SELECT a AS s, b AS v FROM s),
d2 AS (
  SELECT d1.s, e.b AS v, CAST(COUNT(*) AS DOUBLE) AS sigma
  FROM d1 JOIN s e ON e.a = d1.v
  WHERE e.b <> d1.s
    AND NOT EXISTS (SELECT 1 FROM s x WHERE x.a = d1.s AND x.b = e.b)
  GROUP BY d1.s, e.b
),
del1 AS (
  SELECT d1.s, d1.v, SUM(1.0 / d2.sigma) AS delta
  FROM d1 JOIN s e ON e.a = d1.v
  JOIN d2 ON d2.s = d1.s AND d2.v = e.b
  GROUP BY d1.s, d1.v
)
SELECT vv.id, ROUND(COALESCE(SUM(del1.delta), 0) / 2.0, 6) AS betweenness
FROM vv LEFT JOIN del1 ON del1.v = vv.id GROUP BY vv.id
"""
    )

    # ---- truncated EDGE betweenness (max_dist=2): same unrolled Brandes
    # rings, dependencies land on the edge between consecutive rings —
    # ring1→ring2 carries 1/sigma_w, the source's own ring-0→1 edge
    # carries 1+delta_v
    edge_betweenness_sql = (
        "WITH " + _DET_PRELUDE + """,
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
s AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
d1 AS (SELECT a AS s, b AS v FROM s),
d2 AS (
  SELECT d1.s, e.b AS v, CAST(COUNT(*) AS DOUBLE) AS sigma
  FROM d1 JOIN s e ON e.a = d1.v
  WHERE e.b <> d1.s
    AND NOT EXISTS (SELECT 1 FROM s x WHERE x.a = d1.s AND x.b = e.b)
  GROUP BY d1.s, e.b
),
del1 AS (
  SELECT d1.s, d1.v, SUM(1.0 / d2.sigma) AS delta
  FROM d1 JOIN s e ON e.a = d1.v
  JOIN d2 ON d2.s = d1.s AND d2.v = e.b
  GROUP BY d1.s, d1.v
),
eb12 AS (
  SELECT least(d1.v, d2.v) AS a, greatest(d1.v, d2.v) AS b,
         SUM(1.0 / d2.sigma) AS c
  FROM d1 JOIN s e ON e.a = d1.v
  JOIN d2 ON d2.s = d1.s AND d2.v = e.b
  GROUP BY 1, 2
),
eb01 AS (
  SELECT least(d1.s, d1.v) AS a, greatest(d1.s, d1.v) AS b,
         SUM(1.0 + COALESCE(del1.delta, 0)) AS c
  FROM d1 LEFT JOIN del1 ON del1.s = d1.s AND del1.v = d1.v
  GROUP BY 1, 2
),
allc AS (SELECT * FROM eb12 UNION ALL SELECT * FROM eb01)
SELECT u.a, u.b, ROUND(COALESCE(SUM(allc.c), 0) / 2.0, 6) AS betweenness
FROM und u LEFT JOIN allc ON allc.a = u.a AND allc.b = u.b
GROUP BY u.a, u.b
"""
    )

    # ---- Jones–Plassmann colouring: 3 unrolled rounds; winner election
    # is the MIS rule, but only winners deactivate, and each winner takes
    # the mex of its already-coloured FULL neighbourhood
    col = ["""ce0 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst
)""",
           """fsym AS (SELECT a AS u, b AS v FROM ce0
          UNION ALL SELECT b AS u, a AS v FROM ce0)""",
           """ca0 AS MATERIALIZED (
  SELECT id, ('0x' || substr(md5('42:' || CAST(id AS VARCHAR)), 1, 8))::BIGINT AS p
  FROM (SELECT a AS id FROM ce0 UNION SELECT b FROM ce0)
)"""]
    for r in range(1, 4):
        col.append(f"""cs{r} AS (SELECT a AS u, b AS v FROM ce{r - 1}
          UNION ALL SELECT b AS u, a AS v FROM ce{r - 1})""")
        col.append(f"""cn{r} AS MATERIALIZED (
  SELECT s.u AS id, MIN(ROW(av.p, av.id)) AS nb
  FROM cs{r} s JOIN ca{r - 1} av ON av.id = s.v GROUP BY s.u
)""")
        col.append(f"""cw{r} AS MATERIALIZED (
  SELECT av.id FROM ca{r - 1} av LEFT JOIN cn{r} n ON n.id = av.id
  WHERE n.id IS NULL OR ROW(av.p, av.id) < n.nb
)""")
        if r == 1:
            col.append("""cc1 AS MATERIALIZED (
  SELECT id, CAST(0 AS INTEGER) AS color, CAST(1 AS BIGINT) AS round_assigned
  FROM cw1
)""")
            col.append("call1 AS (SELECT * FROM cc1)")
        else:
            col.append(f"""used{r} AS (
  SELECT w.id, list_distinct(list(c.color)) AS cl
  FROM cw{r} w JOIN fsym f ON f.u = w.id
  JOIN call{r - 1} c ON c.id = f.v
  GROUP BY w.id
)""")
            col.append(f"""cc{r} AS MATERIALIZED (
  SELECT w.id,
         CAST(COALESCE(
           list_min(list_filter(range(0, length(u.cl) + 1),
                                x -> NOT list_contains(u.cl, x))),
           0) AS INTEGER) AS color,
         CAST({r} AS BIGINT) AS round_assigned
  FROM cw{r} w LEFT JOIN used{r} u ON u.id = w.id
)""")
            col.append(
                f"call{r} AS (SELECT * FROM call{r - 1} UNION ALL SELECT * FROM cc{r})"
            )
        col.append(f"""ca{r} AS MATERIALIZED (
  SELECT av.id, av.p FROM ca{r - 1} av
  WHERE av.id NOT IN (SELECT id FROM cw{r})
)""")
        col.append(f"""ce{r} AS MATERIALIZED (
  SELECT g.a, g.b FROM ce{r - 1} g
  JOIN ca{r} x ON x.id = g.a JOIN ca{r} y ON y.id = g.b
)""")
    coloring_sql = (
        "WITH " + _DET_PRELUDE + ",\n" + ",\n".join(col)
        + "\nSELECT id, color, round_assigned FROM call3\n"
    )

    # ---- exact 2-hop neighbourhood counts on the simple symmetrised graph
    khop_sql = (
        "WITH " + _DET_PRELUDE + """,
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
s AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
r1 AS (SELECT a AS id, b AS v FROM s),
r2 AS (SELECT r1.id, s.b AS v FROM r1 JOIN s ON s.a = r1.v WHERE s.b <> r1.id),
reach AS (SELECT DISTINCT id, v FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2))
SELECT id, CAST(COUNT(*) AS BIGINT) AS n_reachable FROM reach GROUP BY id
"""
    )
    # ---- HyperBall ball sizes: at driver scale every ball is far below
    # the datasketches HLL sparse-mode promotion point, so the estimates
    # are EXACT and the twin is the exact 1/2-hop closure (the same
    # exactness contract the khop_counts pytest pins); self excluded
    hyperball_sql = (
        "WITH " + _DET_PRELUDE + """,
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
s AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
r1d AS (SELECT DISTINCT a AS id, b AS v FROM s),
b1 AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM r1d GROUP BY id),
r2d AS (
  SELECT DISTINCT id, v FROM (
    SELECT id, v FROM r1d
    UNION ALL
    SELECT r1d.id, s.b AS v FROM r1d JOIN s ON s.a = r1d.v
  ) WHERE v <> id
),
b2 AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM r2d GROUP BY id)
SELECT id, CAST(1 AS INT) AS dist, n AS n_reachable_est FROM b1
UNION ALL
SELECT id, CAST(2 AS INT) AS dist, n AS n_reachable_est FROM b2
"""
    )
    # ---- bibliographic coupling on the DIRECTED bipartite graph:
    # pairs of users sharing cited event types
    coupling_sql = (
        "WITH " + _DET_PRELUDE + """,
de AS (SELECT DISTINCT src, dst FROM edges),
adj AS (SELECT dst AS w, src AS x FROM de)
SELECT l.x AS src, r.x AS dst, CAST(COUNT(*) AS BIGINT) AS n_common
FROM adj l JOIN adj r ON r.w = l.w AND l.x < r.x
GROUP BY 1, 2 HAVING COUNT(*) >= 1
"""
    )

    _on = [
        "ov0 AS (SELECT DISTINCT src AS id FROM sym)",
        "oe0 AS (SELECT src, dst FROM sym)",
        "ok0 AS (SELECT 0 AS k)",
    ]
    for r in range(1, 7):
        _on.append(f"""od{r} AS MATERIALIZED (
  SELECT v.id, COALESCE(d.d, 0) AS d
  FROM ov{r - 1} v LEFT JOIN (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS d
                              FROM oe{r - 1} GROUP BY src) d USING (id)
),
ok{r} AS (SELECT GREATEST((SELECT k FROM ok{r - 1}),
                          COALESCE((SELECT MIN(d) FROM od{r}),
                                   (SELECT k FROM ok{r - 1}))) AS k),
op{r} AS MATERIALIZED (
  SELECT id, {r} AS layer, (SELECT k FROM ok{r}) AS kk
  FROM od{r} WHERE d <= (SELECT k FROM ok{r})
),
ov{r} AS MATERIALIZED (SELECT id FROM od{r} WHERE d > (SELECT k FROM ok{r})),
oe{r} AS MATERIALIZED (
  SELECT e.src, e.dst FROM oe{r - 1} e
  JOIN ov{r} a ON a.id = e.src JOIN ov{r} b ON b.id = e.dst
)""")
    onion_sql = (
        "WITH " + _DET_PRELUDE + ",\n" + ",\n".join(_on) + """
SELECT id, CAST(layer AS BIGINT) AS layer, CAST(kk AS BIGINT) AS k_at_peel FROM (
  """ + "\n  UNION ALL ".join(f"SELECT * FROM op{r}" for r in range(1, 7)) + """
  UNION ALL SELECT id, 7 AS layer, NULL AS kk FROM ov6
)
"""
    )
    _sc = [
        """sund AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b, SUM(weight) AS w
         FROM edges WHERE src <> dst GROUP BY 1, 2)""",
        "ssym AS (SELECT a, b, w FROM sund UNION ALL SELECT b, a, w FROM sund)",
        "sv0 AS (SELECT DISTINCT a AS id FROM ssym)",
        "se0 AS (SELECT a, b, w FROM ssym)",
        "sk0 AS (SELECT 0.0 AS s)",
    ]
    for r in range(1, 7):
        _sc.append(f"""sd{r} AS MATERIALIZED (
  SELECT v.id, COALESCE(d.s, 0.0) AS s
  FROM sv{r - 1} v LEFT JOIN (SELECT a AS id, ROUND(SUM(w), 6) AS s
                              FROM se{r - 1} GROUP BY a) d USING (id)
),
sk{r} AS (SELECT GREATEST((SELECT s FROM sk{r - 1}),
                          COALESCE((SELECT MIN(s) FROM sd{r}),
                                   (SELECT s FROM sk{r - 1}))) AS s),
sp{r} AS MATERIALIZED (
  SELECT id, {r} AS layer, ROUND((SELECT s FROM sk{r}), 6) AS ss
  FROM sd{r} WHERE s <= (SELECT s FROM sk{r})
),
sv{r} AS MATERIALIZED (SELECT id FROM sd{r} WHERE s > (SELECT s FROM sk{r})),
se{r} AS MATERIALIZED (
  SELECT e.a, e.b, e.w FROM se{r - 1} e
  JOIN sv{r} x ON x.id = e.a JOIN sv{r} y ON y.id = e.b
)""")
    score_sql = (
        "WITH " + _DET_PRELUDE + ",\n" + ",\n".join(_sc) + """
SELECT id, CAST(layer AS BIGINT) AS layer, ss AS s_at_peel FROM (
  """ + "\n  UNION ALL ".join(f"SELECT * FROM sp{r}" for r in range(1, 7)) + """
  UNION ALL SELECT id, 7 AS layer, NULL AS ss FROM sv6
)
"""
    )
    sparsify_sql = (
        "WITH " + _DET_PRELUDE + """,
gund AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b, SUM(weight) AS w
         FROM edges WHERE src <> dst GROUP BY 1, 2),
gdeg AS (SELECT id, CAST(COUNT(*) AS DOUBLE) AS d
         FROM (SELECT a AS id FROM gund UNION ALL SELECT b FROM gund) GROUP BY id),
gp AS (
  SELECT a, b, w,
         ROUND(least(1.0, 2.0 * (1.0 / da.d + 1.0 / db.d)), 9) AS p_keep,
         (('0x' || substr(md5('42:' || CAST(a AS VARCHAR) || ':' ||
                              CAST(b AS VARCHAR)), 1, 8))::BIGINT + 1.0)
           / 4294967296.0 AS u
  FROM gund JOIN gdeg da ON da.id = gund.a JOIN gdeg db ON db.id = gund.b
)
SELECT a AS src, b AS dst, ROUND(w / p_keep, 6) AS weight, ROUND(p_keep, 6) AS p_keep
FROM gp WHERE u <= p_keep ORDER BY src, dst
"""
    )
    butterfly_sql = (
        "WITH " + _DET_PRELUDE + """,
de AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
ldeg AS (SELECT src, COUNT(*) AS ld FROM de GROUP BY src),
rdeg AS (SELECT dst, COUNT(*) AS rd FROM de GROUP BY dst),
badj AS (SELECT de.src, de.dst FROM de JOIN ldeg USING (src) WHERE ld <= 100000),
pairs AS (
  SELECT l.dst AS t1, r.dst AS t2, COUNT(*) AS c
  FROM badj l JOIN badj r ON r.src = l.src AND l.dst < r.dst
  GROUP BY 1, 2
),
bfly AS (SELECT CAST(COALESCE(SUM(c * (c - 1) / 2), 0) AS BIGINT) AS butterflies FROM pairs),
base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
         CAST(COUNT(DISTINCT de.src) AS BIGINT) AS n_left,
         CAST(COUNT(DISTINCT de.dst) AS BIGINT) AS n_right,
         CAST(SUM((ld - 1) * (rd - 1)) AS BIGINT) AS caterpillars
  FROM de JOIN ldeg USING (src) JOIN rdeg USING (dst)
),
wdg AS (SELECT CAST(COALESCE(SUM(ld * (ld - 1) / 2), 0) AS BIGINT) AS wedges FROM ldeg)
SELECT n_left, n_right, n_edges, wedges, butterflies, caterpillars,
       ROUND(CASE WHEN caterpillars > 0 THEN 4.0 * butterflies / caterpillars
                  ELSE 0.0 END, 6) AS bcc
FROM base CROSS JOIN wdg CROSS JOIN bfly
"""
    )

    # ---- igraph knn / diversity / Burt constraint on the undirected
    # weighted bipartite graph
    _UND_ADJ = """
und AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b, SUM(weight) AS w
        FROM edges WHERE src <> dst GROUP BY 1, 2),
adj AS (SELECT a AS i, b AS j, w FROM und UNION ALL SELECT b, a, w FROM und)
"""
    knn_sql = (
        "WITH " + _DET_PRELUDE + "," + _UND_ADJ + """,
deg AS (SELECT i AS id, COUNT(*) AS degree FROM adj GROUP BY i)
SELECT d.id, CAST(d.degree AS BIGINT) AS degree,
       ROUND(AVG(nd.degree), 6) AS knn
FROM adj a JOIN deg nd ON nd.id = a.j JOIN deg d ON d.id = a.i
GROUP BY d.id, d.degree
"""
    )
    knnk_sql = (
        "WITH " + _DET_PRELUDE + "," + _UND_ADJ + """,
deg AS (SELECT i AS id, COUNT(*) AS degree FROM adj GROUP BY i),
per_v AS (
  SELECT d.id, d.degree, AVG(nd.degree) AS knn_v
  FROM adj a JOIN deg nd ON nd.id = a.j JOIN deg d ON d.id = a.i
  GROUP BY d.id, d.degree
)
SELECT CAST(degree AS BIGINT) AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_vertices,
       ROUND(AVG(knn_v), 6) AS knnk
FROM per_v GROUP BY degree ORDER BY degree
"""
    )
    gini_sql = (
        "WITH " + _DET_PRELUDE + """,
deg AS (SELECT src AS id, COUNT(*) AS k FROM sym GROUP BY src),
hist AS (SELECT k, COUNT(*) AS m FROM deg GROUP BY k),
ranked AS (
  SELECT k, m,
         COALESCE(SUM(m) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS cum_before
  FROM hist
)
SELECT CAST(SUM(m) AS BIGINT) AS n_vertices,
       ROUND(SUM(k * m) * 1.0 / SUM(m), 6) AS mean_k,
       ROUND(2.0 * SUM(m * k * (cum_before + (m + 1.0) / 2.0))
             / (SUM(m) * SUM(k * m)) - (SUM(m) + 1.0) / SUM(m), 6) AS gini
FROM ranked
"""
    )
    diversity_sql = (
        "WITH " + _DET_PRELUDE + "," + _UND_ADJ + """,
per AS (
  SELECT i AS id, COUNT(*) AS degree, SUM(w) AS strength,
         SUM(w * ln(w)) AS s_wlogw
  FROM adj GROUP BY i
)
SELECT id, CAST(degree AS BIGINT) AS degree,
       ROUND(strength, 6) AS strength,
       ROUND(CASE WHEN degree > 1
                  THEN (ln(strength) - s_wlogw / strength) / ln(degree)
                  ELSE 0.0 END, 6) AS diversity
FROM per
"""
    )
    burt_sql = (
        "WITH " + _DET_PRELUDE + "," + _UND_ADJ + """,
st AS (SELECT i, SUM(w) AS s, COUNT(*) AS degree FROM adj GROUP BY i),
p AS (SELECT adj.i, adj.j, adj.w / st.s AS p FROM adj JOIN st USING (i)),
ind AS (
  SELECT l.i, r.j, SUM(l.p * r.p) AS pind
  FROM p l JOIN p r ON r.i = l.j AND r.j <> l.i
  GROUP BY l.i, r.j
),
cij AS (
  SELECT p.i, (p.p + COALESCE(ind.pind, 0.0)) AS c
  FROM p LEFT JOIN ind ON ind.i = p.i AND ind.j = p.j
)
SELECT st.i AS id, CAST(st.degree AS BIGINT) AS degree,
       ROUND(SUM(c * c) + 1.25e-9, 6) AS "constraint"
FROM cij JOIN st ON st.i = cij.i
GROUP BY st.i, st.degree
"""
    )

    # ---- 16-class triad census on the MIXED graph (bipartite arcs ∪
    # type-transition arcs); the 64-code → class lookup comes from the
    # SAME helper the engine uses, so classification is shared
    from leidenalg_spark.operators.kernels import TRIAD_CLASSES, triad_code_table

    _lut_vals = ", ".join(
        f"({c}, '{lab}', {m}, {a})" for c, lab, m, a in triad_code_table()
    )
    _cls_vals = ", ".join(f"('{lab}')" for lab in TRIAD_CLASSES)
    triad_sql = (
        "WITH " + trans_prelude[0] + f""",
mixed AS (
  SELECT 'u:' || CAST(user_id AS VARCHAR) AS sn, 't:' || event_type AS dn
  FROM events GROUP BY 1, 2
  UNION ALL
  SELECT 't:' || a, 't:' || b FROM tr
),
mnames AS (SELECT sn AS nm FROM mixed UNION SELECT dn FROM mixed),
mids AS (SELECT nm, CAST(ROW_NUMBER() OVER (ORDER BY nm) AS BIGINT) AS nid FROM mnames),
me AS (
  SELECT DISTINCT sa.nid AS src, sb.nid AS dst
  FROM mixed m JOIN mids sa ON sa.nm = m.sn JOIN mids sb ON sb.nm = m.dn
  WHERE sa.nid <> sb.nid
),
dy AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
         MAX(CASE WHEN src < dst THEN 1 ELSE 0 END)
         + 2 * MAX(CASE WHEN src > dst THEN 1 ELSE 0 END) AS s
  FROM me GROUP BY 1, 2
),
inc AS (SELECT a AS v, b AS w, s FROM dy UNION ALL SELECT b, a, s FROM dy),
wed AS (
  SELECT p.v, p.w AS w1, q.w AS w2, p.s AS sa, q.s AS sb
  FROM inc p JOIN inc q ON q.v = p.v AND p.w < q.w
),
wed3 AS (
  SELECT wed.*, COALESCE(d.s, 0) AS sc
  FROM wed LEFT JOIN dy d ON d.a = least(w1, w2) AND d.b = greatest(w1, w2)
),
pos AS (
  SELECT v, w1, w2, sa, sb, sc,
         least(v, w1, w2) AS i, greatest(v, w1, w2) AS k,
         v + w1 + w2 - least(v, w1, w2) - greatest(v, w1, w2) AS j
  FROM wed3
),
coded AS (
  SELECT DISTINCT i, j, k,
      (CASE WHEN least(v, w1) = i AND greatest(v, w1) = j THEN sa
            WHEN least(v, w2) = i AND greatest(v, w2) = j THEN sb ELSE sc END)
  + 4 * (CASE WHEN least(v, w1) = j AND greatest(v, w1) = k THEN sa
            WHEN least(v, w2) = j AND greatest(v, w2) = k THEN sb ELSE sc END)
  + 16 * (CASE WHEN least(v, w1) = i AND greatest(v, w1) = k THEN sa
            WHEN least(v, w2) = i AND greatest(v, w2) = k THEN sb ELSE sc END)
    AS code
  FROM pos
),
lut(code, triad, m, a) AS (VALUES {_lut_vals}),
conn AS (SELECT l.triad, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM coded c JOIN lut l USING (code) GROUP BY 1),
scal AS (
  SELECT (SELECT COUNT(*) FROM (SELECT src AS x FROM me UNION SELECT dst FROM me)) AS n,
         (SELECT COALESCE(SUM(CASE WHEN s = 3 THEN 1 ELSE 0 END), 0) FROM dy) AS mm,
         (SELECT COALESCE(SUM(CASE WHEN s IN (1, 2) THEN 1 ELSE 0 END), 0) FROM dy) AS aa,
         (SELECT COUNT(*) FROM coded) AS t2n,
         (SELECT COALESCE(SUM(l.m), 0) FROM coded c JOIN lut l USING (code)) AS sum_m,
         (SELECT COALESCE(SUM(l.a), 0) FROM coded c JOIN lut l USING (code)) AS sum_a
),
classes(triad) AS (VALUES {_cls_vals})
SELECT cl.triad,
  CAST(CASE cl.triad
    WHEN '012' THEN aa * (n - 2) - sum_a
    WHEN '102' THEN mm * (n - 2) - sum_m
    WHEN '003' THEN (n * (n - 1) // 2) * (n - 2) // 3 - t2n
                    - (aa * (n - 2) - sum_a) - (mm * (n - 2) - sum_m)
    ELSE COALESCE(conn.cnt, 0) END AS BIGINT) AS count
FROM classes cl LEFT JOIN conn USING (triad) CROSS JOIN scal
"""
    )

    # ---- minimum spanning forest: Kruskal by the cycle property — edge
    # (rank r under the (w,a,b) total order) is REJECTED iff its endpoints
    # are already connected using only strictly-smaller-ranked edges, so a
    # per-edge reachability fixpoint replaces sequential union-find state.
    # Under the total order the MSF is unique, so this matches the Spark
    # Borůvka run edge-for-edge.
    msf_sql = (
        "WITH RECURSIVE " + _DET_PRELUDE + """,
und AS (
  SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, MIN(weight) AS w
  FROM edges WHERE src <> dst GROUP BY 1, 2
),
e AS (SELECT a, b, w, ROW_NUMBER() OVER (ORDER BY w, a, b) AS rnk FROM und),
reach AS (
  SELECT rnk, a AS node FROM e
  UNION
  SELECT r.rnk, CASE WHEN s.a = r.node THEN s.b ELSE s.a END AS node
  FROM reach r JOIN e s ON s.rnk < r.rnk AND (s.a = r.node OR s.b = r.node)
)
SELECT e.a AS src, e.b AS dst, e.w AS weight
FROM e LEFT JOIN reach rb ON rb.rnk = e.rnk AND rb.node = e.b
WHERE rb.node IS NULL
"""
    )

    return {"pagerank": pagerank_sql, "personalized_pagerank": ppr_sql,
            "spanning_forest": msf_sql,
            "ppr_sweep": sweep_sql, "katz_centrality": katz_sql,
            "shortest_path": shortest_sql,
            "strongly_connected_components": scc_sql,
            "bowtie": bowtie_sql,
            "random_walks": walk_sql,
            "node2vec_walks": n2v_sql,
            "hits": hits_sql,
            "eigenvector_centrality": eig_sql,
            "reciprocity": recip_sql,
            "line_graph": linegraph_sql,
            "salsa": salsa_sql,
            "markov_chain_stats": markov_sql,
            "assortativity_numeric": assnum_sql,
            "dyad_census": dyad_sql,
            "bipartiteness": bip_sql,
            "edge_clustering": radicchi_sql,
            "molloy_reed": mr_sql,
            "balance_census": balance_sql,
            "triad_census": triad_sql,
            "bib_coupling": coupling_sql,
            "butterfly_census": butterfly_sql,
            "graph_sparsify": sparsify_sql,
            "onion_layers": onion_sql,
            "s_core": score_sql,
            "truss_layers": trusslayers_sql,
            "avg_neighbor_degree": knn_sql,
            "knnk": knnk_sql,
            "degree_gini": gini_sql,
            "vertex_diversity": diversity_sql,
            "burt_constraint": burt_sql,
            "closed_triples": triples_sql,
            "k_truss": ktruss_sql,
            "densest_subgraph": dsg_sql,
            "maximal_independent_set": mis_sql,
            "negative_samples": negs_sql,
            "harmonic_centrality": harm_sql,
            "closeness_centrality": closeness_sql,
            "betweenness_centrality": betweenness_sql,
            "edge_betweenness": edge_betweenness_sql,
            "graph_coloring": coloring_sql,
            "adamic_adar": aa_sql,
            "jaccard_linkpred": jc_sql,
            "dice_similarity": dice_sql,
            "label_propagation": lpa_sql,
            "label_spreading": lspread_sql,
            "connected_components": cc_sql, "two_edge_components": tec_sql,
            "assortativity": assort_sql,
            "k_core": kcore_sql, "khop_counts": khop_sql,
            "neighborhood_hll": hyperball_sql,
            "topological_levels": topo_sql,
            "voronoi_cells": voronoi_sql,
            "core_periphery": cp_sql,
            "power_law_fit": plaw_sql,
            "eccentricity": ecc_sql,
            "graph_center": f"""
WITH eccq AS (SELECT * FROM ({ecc_sql})),
cscal AS (SELECT CAST(MIN(ecc) AS BIGINT) AS radius,
                 CAST(MAX(ecc) AS BIGINT) AS diameter_lb FROM eccq)
SELECT id, radius, diameter_lb
FROM eccq CROSS JOIN cscal WHERE ecc = radius ORDER BY id
""",
            "sssp_weighted": sssp_sql,
            "leading_eigenvector": lev_sql,
            "attack_curve": attack_sql,
            "failure_curve": failure_sql,
            "clique_census": clique_sql}
