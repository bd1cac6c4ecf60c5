"""Goldens for the round-2 third-wave operators (fresh file so a long
background pytest run never collides with appends)."""

from datetime import datetime, timedelta


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def test_clique_percolation_two_overlapping_cliques(spark):
    # K4 on {0,1,2,3} and K3 on {3,4,5} share vertex 3; a dangling edge
    # (5,6) is in no triangle.  k=3 percolation: two communities, vertex 3
    # in BOTH (overlap), 6 in none.
    from leidenalg_spark.operators.kernels import clique_percolation

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k3 = [(3, 4), (3, 5), (4, 5)]
    got = clique_percolation(spark, _edges(spark, k4 + k3 + [(5, 6)]), rounds=6).collect()
    memb = {}
    for r in got:
        memb.setdefault(r.id, set()).add(r.community)
    assert memb[0] == memb[1] == memb[2] == {0}
    assert memb[4] == memb[5] == {3}
    assert memb[3] == {0, 3}  # the overlap vertex
    assert 6 not in memb


def test_clique_percolation_triangle_chain_merges(spark):
    # triangles (0,1,2) and (1,2,3) share edge (1,2) -> ONE community
    from leidenalg_spark.operators.kernels import clique_percolation

    got = clique_percolation(
        spark, _edges(spark, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]), rounds=6
    ).collect()
    assert {(r.id, r.community) for r in got} == {(v, 0) for v in (0, 1, 2, 3)}


def test_edge_embeddedness_and_local_bridges(spark):
    from leidenalg_spark.operators.kernels import edge_embeddedness

    # triangle {0,1,2} plus a pendant bridge (2,3)
    got = {
        (r.a, r.b): r
        for r in edge_embeddedness(
            spark, _edges(spark, [(0, 1), (0, 2), (1, 2), (2, 3)])
        ).collect()
    }
    assert got[(0, 1)].embeddedness == 1 and not got[(0, 1)].is_local_bridge
    assert got[(2, 3)].embeddedness == 0 and got[(2, 3)].is_local_bridge


def test_ngram_novelty_first_doc_wins(spark):
    from leidenalg_spark.operators.dedup import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),        # 2 trigrams, both first -> novelty 1
            (2, "a b c x"),        # "a b c" seen in doc 1, "b c x" new -> 0.5
            (3, "a b c d"),        # exact dup of doc 1 -> 0
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in ngram_novelty(docs, n=3).collect()}
    assert (got[1].n_shingles, got[1].novelty) == (2, 1.0)
    assert (got[2].n_novel, got[2].novelty) == (1, 0.5)
    assert got[3].novelty == 0.0


def test_kaplan_meier_textbook_curve(spark):
    # 4 actors: lifetimes 1d (death), 1d (censored), 2d (death),
    # 3d (censored at horizon).  S(1)=1-1/4=0.75, S(2)=0.75*(1-1/2)=0.375
    from leidenalg_spark.operators.events import kaplan_meier

    t0 = datetime(2024, 1, 1)
    rows = []
    for uid, (span, last_gap) in enumerate(
        [(1, 10), (1, 0), (2, 5), (3, 0)]
    ):
        rows.append((uid, t0))
        rows.append((uid, t0 + timedelta(days=span)))
    # horizon = max ts = uid3's last event at day 3... shift actors so the
    # horizon lands at day 12: censoring gap measured from global max
    ev = spark.createDataFrame(
        [
            (0, t0), (0, t0 + timedelta(days=1)),            # dies (gap 11)
            (1, t0 + timedelta(days=10)), (1, t0 + timedelta(days=11)),  # censored (gap 1)
            (2, t0), (2, t0 + timedelta(days=2)),            # dies (gap 10)
            (3, t0 + timedelta(days=9)), (3, t0 + timedelta(days=12)),   # censored (gap 0)
        ],
        "user_id long, ts timestamp",
    )
    got = {r.t_days: r for r in kaplan_meier(ev, churn_gap_days=2).collect()}
    assert (got[1].n_risk, got[1].n_death, got[1].n_censor) == (4, 1, 1)
    assert abs(got[1].survival - 0.75) < 1e-9
    assert (got[2].n_risk, got[2].n_death) == (2, 1)
    assert abs(got[2].survival - 0.375) < 1e-9
    assert got[3].n_censor == 1 and abs(got[3].survival - 0.375) < 1e-9


def test_ab_test_split_and_z(spark):
    from leidenalg_spark.operators.events import ab_test

    t0 = datetime(2024, 1, 1)
    rows = []
    # 40 users; md5-parity split; users converting = those with uid % 4 == 0
    for uid in range(40):
        rows.append((uid, t0, "view", 1.0))
        if uid % 4 == 0:
            rows.append((uid, t0, "purchase", 10.0))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string, value double")
    r = ab_test(ev, min_conversions=1).collect()[0]
    assert r.n_a + r.n_b == 40
    assert r.conv_a + r.conv_b == 10
    assert abs(r.rate_a - r.conv_a / r.n_a) < 1e-6  # rate is rounded to 6dp
    assert r.value_per_conv_a == 10.0 and r.value_per_conv_b == 10.0
    # z sign agrees with the lift
    if r.lift_abs != 0:
        assert (r.z_score > 0) == (r.lift_abs > 0)


def test_graphlet_orbits_path_and_triangle(spark):
    from leidenalg_spark.operators.kernels import graphlet_orbits3

    # path 0-1-2 plus triangle {3,4,5}
    got = {
        r.id: r
        for r in graphlet_orbits3(
            spark, _edges(spark, [(0, 1), (1, 2), (3, 4), (3, 5), (4, 5)])
        ).collect()
    }
    # path center: degree 2, one wedge centered, no path-end role, no tri
    assert (got[1].o0_degree, got[1].o1_path_end, got[1].o2_wedge_center, got[1].o3_triangle) == (2, 0, 1, 0)
    # path end: one induced P3 as end
    assert (got[0].o0_degree, got[0].o1_path_end, got[0].o2_wedge_center) == (1, 1, 0)
    # triangle vertex: degree 2, no induced P3 (closed), one triangle
    assert (got[3].o0_degree, got[3].o1_path_end, got[3].o2_wedge_center, got[3].o3_triangle) == (2, 0, 0, 1)


def test_changepoint_step_series(spark):
    from leidenalg_spark.operators.events import changepoint

    t0 = datetime(2024, 1, 1)
    rows = []
    # 10 days: 2 events/day for days 0-4, then 8 events/day for days 5-9
    for d in range(10):
        for i in range(2 if d < 5 else 8):
            rows.append((len(rows), t0 + timedelta(days=d, hours=i), 1, "click", 0.0, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    r = changepoint(ev).collect()[0]
    assert r.t_star == t0 + timedelta(days=4)  # last bucket of the left segment
    assert r.mean_before == 2.0 and r.mean_after == 8.0
    assert r.n_buckets == 10


def test_quality_bipartite_perfect_vs_mixed(spark):
    from leidenalg_spark.functions.quality import quality_bipartite

    # two disjoint complete bipartite K_{2,2} blocks: users 0,1 + items 10,11
    # and users 2,3 + items 12,13
    e = _edges(
        spark,
        [(u, i) for u in (0, 1) for i in (10, 11)] + [(u, i) for u in (2, 3) for i in (12, 13)],
    )
    verts = [(v, 0 if v < 10 else 1) for v in (0, 1, 2, 3, 10, 11, 12, 13)]
    typs = spark.createDataFrame(verts, "id long, type int")
    perfect = spark.createDataFrame(
        [(v, 0 if v in (0, 1, 10, 11) else 1) for v, _ in verts], "id long, comm long"
    )
    allone = spark.createDataFrame([(v, 0) for v, _ in verts], "id long, comm long")
    q_perfect = quality_bipartite(e, perfect, typs).collect()[0].value
    q_allone = quality_bipartite(e, allone, typs).collect()[0].value
    # perfect split: m_c = 4 each, K0=K1=4, m=8 -> Q = 2*(4 - 16/8)/8 = 0.5
    assert abs(q_perfect - 0.5) < 1e-9
    assert abs(q_allone - 0.0) < 1e-9
    assert q_perfect > q_allone


def test_langid_confusion_diagonal(spark):
    from leidenalg_spark.operators.textops import langid_confusion

    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house", "en"),
            (2, "the one and only of it", "en"),
            (3, "el perro y la casa de los gatos", "es"),
            (4, None, None),
        ],
        "doc_id long, text string, lang string",
    )
    got = {(r.lang, r.lang_pred): r for r in langid_confusion(docs).collect()}
    assert got[("en", "en")].n == 2 and got[("en", "en")].frac_of_truth == 1.0
    assert got[("es", "es")].n == 1
    assert got[("und", "und")].n == 1  # null text + null truth both map to und


def test_embedding_drift_planted_shift(spark):
    from leidenalg_spark.operators.similarity import embedding_drift
    from pyspark.sql import functions as F

    # cohort A ~ 0.0, cohort B shifted +1.0 in dim 0 only
    rows = []
    for i in range(40):
        base = [0.0, 5.0]
        if i % 2 == 1:
            base = [1.0, 5.0]
        # deterministic jitter so variance is nonzero
        rows.append((i, [base[0] + (i % 5) * 0.01, base[1] + (i % 7) * 0.01]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.dim: r for r in embedding_drift(vecs, split_col=(F.col("vec_id") % 2 == 1)).collect()}
    assert abs(got[0].mean_b - got[0].mean_a - 1.0) < 0.05
    assert got[0].smd > 10  # planted shift dwarfs the jitter
    assert abs(got[1].smd) < 1.5  # no planted shift in dim 1


def test_quality_decomposition_sums_to_quality(spark):
    from leidenalg_spark.functions.quality import quality_decomposition, quality_onerow

    # two triangles joined by one edge, split at the bridge
    e = _edges(spark, [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)])
    memb = spark.createDataFrame(
        [(v, 0 if v < 3 else 1) for v in range(6)], "id long, comm long"
    )
    dec = quality_decomposition(e, memb, gamma=0.5).collect()
    q_mod = quality_onerow(e, memb, "modularity").collect()[0].value
    q_cpm = quality_onerow(e, memb, "cpm", gamma=0.5).collect()[0].value
    assert abs(sum(r.term_modularity for r in dec) - q_mod) < 5e-6
    assert abs(sum(r.term_cpm for r in dec) - q_cpm) < 5e-6


def test_funnel_latency_matches_funnel_counts(spark):
    from leidenalg_spark.operators.events import funnel, funnel_latency

    t0 = datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (0, t0, "view"), (0, t0 + timedelta(seconds=10), "click"),
            (0, t0 + timedelta(seconds=40), "purchase"),
            (1, t0, "view"), (1, t0 + timedelta(seconds=20), "click"),
            (2, t0, "view"),
        ],
        "user_id long, ts timestamp, event_type string",
    ).withColumn("value", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(0.0))
    steps = ["view", "click", "purchase"]
    base = {r.step_idx: r.n_keys for r in funnel(ev, steps).collect()}
    lat = {r.step_idx: r for r in funnel_latency(ev, steps).collect()}
    assert {k: lat[k].n_keys for k in lat} == base
    assert lat[1].p50_s is None
    assert lat[2].p50_s == 15.0  # lags 10 and 20 -> median 15
    assert lat[3].p50_s == 30.0  # single converter, lag 30


def test_source_length_emd_identical_vs_shifted(spark):
    from leidenalg_spark.operators.textops import source_length_emd

    docs = spark.createDataFrame(
        [(i, "x" * 16, "a") for i in range(10)]
        + [(100 + i, "x" * 16, "b") for i in range(10)]
        + [(200 + i, "x" * 256, "c") for i in range(10)],
        "doc_id long, text string, source string",
    )
    got = {(r.src_a, r.src_b): r.emd for r in source_length_emd(docs).collect()}
    assert got[("a", "b")] == 0.0          # identical distributions
    assert abs(got[("a", "c")] - 4.0) < 1e-9  # bins 4 vs 8: CDF gap of 1 over 4 bins


def test_community_merge_gain_positive_when_split_too_fine(spark):
    from leidenalg_spark.operators.community import community_merge_gain

    # one triangle split into comms {0}, {1,2}: merging is clearly good
    e = _edges(spark, [(0, 1), (0, 2), (1, 2)])
    memb = spark.createDataFrame([(0, 0), (1, 1), (2, 1)], "id long, comm long")
    r = community_merge_gain(e, memb).collect()
    assert len(r) == 1 and r[0].comm_a == 0 and r[0].comm_b == 1
    # w_ab=2, W=3, Ka=2, Kb=4 -> dq = 2/3 - 8/18 = 0.222222
    assert abs(r[0].dq_modularity - (2 / 3 - 8 / 18)) < 1e-6
    assert r[0].dq_modularity > 0


def test_degree_centralization_star_vs_ring(spark):
    from leidenalg_spark.operators.kernels import degree_centralization

    star = _edges(spark, [(0, i) for i in range(1, 6)])
    ring = _edges(spark, [(i, (i + 1) % 6) for i in range(6)])
    s = degree_centralization(spark, star).collect()[0]
    r = degree_centralization(spark, ring).collect()[0]
    assert s.centralization == 1.0   # perfect star
    assert r.centralization == 0.0   # regular graph


def test_influence_cascade_seed_and_reach(spark):
    from leidenalg_spark.operators.kernels import influence_cascade

    # path 0-1-2-3: with p=1.0 every edge fires, so activation round =
    # BFS distance from the seed
    e = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {r.id: r.round for r in influence_cascade(spark, e, seeds, p=1.0, rounds=4).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
    # p=0.0: nothing ever fires
    got0 = {r.id: r.round for r in influence_cascade(spark, e, seeds, p=0.0, rounds=4).collect()}
    assert got0 == {0: 0}


def test_stickiness_bounds_and_exact_case(spark):
    from leidenalg_spark.operators.events import stickiness

    t0 = datetime(2024, 1, 1)
    # user 0 active on days 0 and 3; user 1 active on day 3 only
    ev = spark.createDataFrame(
        [(0, t0), (0, t0 + timedelta(days=3)), (1, t0 + timedelta(days=3))],
        "user_id long, ts timestamp",
    )
    got = {r.day: r for r in stickiness(ev, window_days=7).collect()}
    d0, d3 = t0, t0 + timedelta(days=3)  # midnight timestamps (engine convention)
    assert (got[d0].dau, got[d0].wau) == (1, 1)          # only day-0 activity in window
    assert (got[d3].dau, got[d3].wau) == (2, 2)          # both users inside the window
    assert all(0 < r.stickiness <= 1 for r in got.values())


def test_doc_source_kl_outlier_scores_highest(spark):
    from leidenalg_spark.operators.textops import doc_source_kl

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple banana", "s"),
            (2, "apple banana banana apple", "s"),
            (3, "zebra quux zebra quux", "s"),   # content outlier
        ],
        "doc_id long, text string, source string",
    )
    got = {r.doc_id: r.kl for r in doc_source_kl(docs).collect()}
    assert got[3] > got[1] and got[3] > got[2]
    assert got[1] >= 0 and got[2] >= 0


def test_label_centroid_sim_identical_labels(spark):
    from leidenalg_spark.operators.similarity import label_centroid_sim

    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0), (1, [1.0, 0.0], 0),
            (2, [1.0, 0.0], 1),                     # same direction as label 0
            (3, [0.0, 1.0], 2),                     # orthogonal
        ],
        "vec_id long, embedding array<double>, label int",
    )
    got = {(r.label_a, r.label_b): r.cos_sim for r in label_centroid_sim(vecs).collect()}
    assert got[(0, 1)] == 1.0
    assert got[(0, 2)] == 0.0 and got[(1, 2)] == 0.0


def test_lsh_recall_bounds(spark):
    from leidenalg_spark.operators.similarity import cosine_topk, lsh_cosine_topk
    from pyspark.sql import functions as F

    # deterministic embeddings; recall must be in [0, 1] and exact
    # matches of the joined sets
    rows = [(i, [((i * 7 + d * 3) % 11) / 11.0 + 0.1 for d in range(8)]) for i in range(30)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = vecs.where(F.col("vec_id") < 3)
    ex = cosine_topk(vecs, q, k=3).select("query_id", "neighbor_id")
    ap = lsh_cosine_topk(vecs, q, k=3, n_planes=4).select("query_id", "neighbor_id")
    inter = ap.join(ex, ["query_id", "neighbor_id"]).count()
    assert 0 <= inter <= ex.count()


def test_square_count_c4_and_k4(spark):
    from leidenalg_spark.operators.kernels import square_count

    # plain 4-cycle: exactly one square
    c4 = _edges(spark, [(0, 1), (1, 2), (2, 3), (0, 3)])
    assert square_count(spark, c4).collect()[0].n_squares == 1
    # K4 contains 3 distinct 4-cycles
    k4 = _edges(spark, [(a, b) for a in range(4) for b in range(a + 1, 4)])
    assert square_count(spark, k4).collect()[0].n_squares == 3
    # triangle has none
    tri = _edges(spark, [(0, 1), (1, 2), (0, 2)])
    assert square_count(spark, tri).collect()[0].n_squares == 0


def test_seasonal_naive_error_perfect_seasonality(spark):
    from leidenalg_spark.operators.events import seasonal_naive_error

    t0 = datetime(2024, 1, 1)
    rows = []
    # perfectly 7-periodic: count(day d) = (d % 7) + 1  -> zero error
    eid = 0
    for d in range(14):
        for _ in range((d % 7) + 1):
            rows.append((eid, t0 + timedelta(days=d), 1, "click", 0.0, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    r = seasonal_naive_error(ev).collect()[0]
    assert r.n_days == 7 and r.mae == 0.0 and r.rmse == 0.0 and r.mape == 0.0


def test_type_affinity_lift_math(spark):
    from leidenalg_spark.operators.events import type_affinity

    t0 = datetime(2024, 1, 1)
    # user 0: 3 clicks 1 view; user 1: 1 click 3 views
    rows = [(0, t0, "click")] * 3 + [(0, t0, "view")] + [(1, t0, "click")] + [(1, t0, "view")] * 3
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {(r.user_id, r.event_type): r.lift for r in type_affinity(ev).collect()}
    # P(click|0)=0.75, P(click)=0.5 -> lift 1.5
    assert got[(0, "click")] == 1.5 and got[(1, "view")] == 1.5
    assert got[(0, "view")] == 0.5 and got[(1, "click")] == 0.5


def test_bridges_planted(spark):
    from leidenalg_spark.operators.kernels import bridges

    # binary tree on 0..14 (all 14 edges bridges) + 3 chords that kill
    # the 6 tree edges they cover
    tree = [((i - 1) // 2, i) for i in range(1, 15)]
    chords = [(1, 2), (7, 8), (13, 14)]
    got = {(r.a, r.b): r.is_bridge for r in bridges(spark, _edges(spark, tree + chords)).collect()}
    assert len(got) == 17
    killed = {(0, 1), (0, 2), (3, 7), (3, 8), (6, 13), (6, 14)}
    for (a, b), isb in got.items():
        if (a, b) in killed or (a, b) in {tuple(sorted(c)) for c in chords}:
            assert not isb, (a, b)
        else:
            assert isb, (a, b)


def test_bridges_cycle_and_pendant(spark):
    from leidenalg_spark.operators.kernels import bridges

    # triangle (no bridges) + pendant edge (bridge); separate component
    # path 10-11 (bridge)
    e = _edges(spark, [(0, 1), (1, 2), (0, 2), (2, 3), (10, 11)])
    got = {(r.a, r.b): r.is_bridge for r in bridges(spark, e).collect()}
    assert got == {
        (0, 1): False, (1, 2): False, (0, 2): False,
        (2, 3): True, (10, 11): True,
    }


def test_containment_catches_subset_jaccard_misses(spark):
    from leidenalg_spark.operators.dedup import containment_pairs

    short = "a b c d e"                      # 3 trigrams, all inside long
    long = "a b c d e f g h i j k l m n o"   # 13 trigrams
    docs = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string"
    )
    got = {(r.a, r.b): r for r in containment_pairs(docs, n=3, threshold=0.8).collect()}
    r = got[(1, 2)]
    assert r.containment == 1.0          # short fully contained in long
    assert r.jaccard < 0.8               # Jaccard alone would miss it
    assert (2, 1) not in got             # reverse direction below threshold


def test_intrinsic_dim_recovers_line_dimension(spark):
    from leidenalg_spark.operators.similarity import intrinsic_dim

    # pseudo-random points on a 1-D line embedded in 4-D (the estimator
    # assumes locally Poisson spacing — a regular grid would break it by
    # making r1 = r2 everywhere)
    rows = [
        (i, [(i * 2654435761 % 9973) / 100.0, 0.0, 0.0, 0.0]) for i in range(40)
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = intrinsic_dim(vecs).collect()[0]
    assert r.n_points > 0
    assert 0.5 < r.intrinsic_dim < 2.2


def test_modularity_density_prefers_true_split(spark):
    from leidenalg_spark.functions.quality import quality_modularity_density

    # two triangles + bridge: true split beats all-in-one
    e = _edges(spark, [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)])
    split = spark.createDataFrame([(v, 0 if v < 3 else 1) for v in range(6)], "id long, comm long")
    lump = spark.createDataFrame([(v, 0) for v in range(6)], "id long, comm long")
    q_split = quality_modularity_density(e, split).collect()[0].value
    q_lump = quality_modularity_density(e, lump).collect()[0].value
    # split: per comm (2*3 - 1)/3 = 5/3 each -> 10/3; lump: 2*7/6
    assert abs(q_split - 10 / 3) < 1e-6
    assert abs(q_lump - 14 / 6) < 1e-6
    assert q_split > q_lump


def test_collective_influence_star_center(spark):
    from leidenalg_spark.operators.kernels import collective_influence

    # star 0-{1..4} plus edge (1,2): center has k=4, CI=(4-1)*sum(k_u-1)
    e = _edges(spark, [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2)])
    got = {r.id: r for r in collective_influence(spark, e, radius=1).collect()}
    # neighbors of 0: k = 2,2,1,1 -> sum(k-1) = 2 -> ci = 3*2 = 6
    assert (got[0].degree, got[0].ci) == (4, 6)
    # leaf 3: k=1 -> ci = 0
    assert got[3].ci == 0


def test_markov_accuracy_deterministic_chain(spark):
    from leidenalg_spark.operators.events import markov_accuracy

    t0 = datetime(2024, 1, 1)
    rows = []
    # user sequences a->b->a->b: P(b|a)=1, P(a|b)=1 -> accuracy 1.0
    for u in range(3):
        for i, lab in enumerate(["a", "b", "a", "b"]):
            rows.append((u * 10 + i, t0 + timedelta(minutes=i), u, lab))
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {r.event_type: r for r in markov_accuracy(ev).collect()}
    assert got["a"].top_next == "b" and got["a"].accuracy == 1.0
    assert got["b"].top_next == "a" and got["b"].accuracy == 1.0


def test_barrat_equals_unweighted_on_uniform_weights(spark):
    from leidenalg_spark.operators.kernels import barrat_clustering, clustering_coefficient

    # triangle + pendant: with unit weights Barrat == plain lcc
    e = _edges(spark, [(0, 1), (0, 2), (1, 2), (2, 3)])
    bw = {r.id: r.cw for r in barrat_clustering(spark, e).collect()}
    cc = {r.id: round(r.lcc, 6) for r in clustering_coefficient(spark, e).collect()}
    assert bw == cc
    # weighted: strengthen one triangle edge at vertex 2 and cw(2) moves
    e2 = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 10.0), (1, 2, 1.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    bw2 = {r.id: r.cw for r in barrat_clustering(spark, e2).collect()}
    # v=2: s=12, k=3, tri incident weights (10+1) -> 11/24
    assert abs(bw2[2] - 11 / 24) < 1e-6


def test_slo_burn_accumulates(spark):
    from leidenalg_spark.operators.events import slo_burn

    t0 = datetime(2024, 1, 1)
    rows = []
    # day 0: 1/10 errors (under budget), day 1: 5/10 (over)
    for d, errs in [(0, 1), (1, 5)]:
        for i in range(10):
            rows.append((d * 10 + i, t0 + timedelta(days=d), 1,
                         "error" if i < errs else "view", 0.0, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r.day: r for r in slo_burn(ev, slo=0.2).collect()}
    d0, d1 = t0, t0 + timedelta(days=1)  # midnight timestamps (engine convention)
    assert got[d0].error_rate == 0.1 and abs(got[d0].cum_burn - (-0.1)) < 1e-9
    assert got[d1].error_rate == 0.5 and abs(got[d1].cum_burn - 0.2) < 1e-9


def test_knn_label_assortativity_perfect_clusters(spark):
    from pyspark.sql import functions as F

    from leidenalg_spark.operators.community import assortativity_nominal
    from leidenalg_spark.operators.similarity import knn_graph

    # two tight, well-separated label clusters -> kNN edges stay within
    # label -> assortativity ~ 1
    rows = []
    for i in range(10):
        rows.append((i, [1.0 + (i % 5) * 0.01, 0.0, 0.0, 0.0], 0))
        rows.append((100 + i, [0.0, 1.0 + (i % 5) * 0.01, 0.0, 0.0], 1))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    g = knn_graph(spark, emb, k=2, n_planes=3, dim=4).select("src", "dst", "weight")
    memb = emb.select(F.col("vec_id").alias("id"), F.col("label").alias("comm"))
    r = assortativity_nominal(g, memb).collect()[0]
    assert r.assortativity == 1.0


def test_disparity_backbone_keeps_significant_edges(spark):
    from leidenalg_spark.operators.kernels import disparity_backbone

    # hub 0 with one dominant edge (0,1,w=10) and 4 trivial edges (w=1):
    # the dominant edge is significant, the uniform ones are not
    e = spark.createDataFrame(
        [(0, 1, 10.0)] + [(0, i, 1.0) for i in range(2, 6)],
        "src long, dst long, weight double",
    )
    got = {(r.a, r.b): r for r in disparity_backbone(spark, e, alpha=0.05).collect()}
    # alpha for (0,1) at hub: (1 - 10/14)^4 = 0.00666... < 0.05; the
    # pendant side has k=1 -> alpha 0 -> keep regardless
    assert got[(0, 1)].keep
    # trivial edges: hub alpha (1-1/14)^4 = 0.743 but pendant k=1 -> 0
    # -> kept via the pendant rule; so test the hub-side alpha directly
    assert abs(got[(0, 2)].alpha_min - 0.0) < 1e-9  # pendant side wins


def test_actor_behavior_kl_flags_specialist(spark):
    from leidenalg_spark.operators.events import actor_behavior_kl

    t0 = datetime(2024, 1, 1)
    rows = []
    # 4 balanced actors + 1 specialist doing only errors
    for u in range(4):
        for i, lab in enumerate(["click", "view", "purchase", "error"]):
            rows.append((u * 10 + i, t0, u, lab))
    for i in range(4):
        rows.append((100 + i, t0, 9, "error"))
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {r.user_id: r.kl for r in actor_behavior_kl(ev).collect()}
    assert got[9] > max(got[u] for u in range(4))


def test_readability_simple_vs_polysyllabic(spark):
    from leidenalg_spark.operators.textops import readability

    docs = spark.createDataFrame(
        [
            (1, "the cat sat. the dog ran."),
            (2, "extraordinarily complicated terminology necessitates understanding."),
            (3, None),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in readability(docs).collect()}
    assert got[1].n_sentences == 2 and got[1].n_words == 6
    assert got[2].fk_grade > got[1].fk_grade  # polysyllabic scores harder
    assert got[3].fk_grade is None and got[3].n_words == 0


def test_hurst_poisson_like_near_half(spark):
    from leidenalg_spark.operators.events import hurst_variance

    t0 = datetime(2024, 1, 1)
    rows = []
    # deterministic pseudo-uniform arrivals over 64 hours: Poisson-like,
    # variance roughly scale-invariant after rate normalisation -> H ~ 0.5
    for i in range(4096):
        off = (i * 2654435761 % (64 * 3600))
        rows.append((i, t0 + timedelta(seconds=off), 1, "click", 0.0, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    r = hurst_variance(ev).collect()[0]
    assert r.n_scales == 4
    assert 0.0 < r.hurst < 0.9  # far from the LRD regime H -> 1


def test_benford_exact_benford_sample(spark):
    from leidenalg_spark.operators.events import benford_test

    t0 = datetime(2024, 1, 1)
    rows = []
    # values 1..9 each appearing per Benford counts out of 1000 -> chi2 ~ 0
    import math
    eid = 0
    for d in range(1, 10):
        n = round(1000 * math.log10(1 + 1 / d))
        for _ in range(n):
            rows.append((eid, t0, 1, "view", float(d), "{}")); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = benford_test(ev).collect()
    assert len(got) == 9
    assert sum(r.chi2_term for r in got) < 0.1
    assert abs(sum(r.observed for r in got) - 1.0) < 1e-5


def test_balance_labels_exact_counts(spark):
    from leidenalg_spark.operators.sampling import balance_labels

    rows = [(i, [0.0], 0) for i in range(10)] + [(100 + i, [0.0], 1) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = balance_labels(df).collect()
    by = {}
    for r in got:
        by.setdefault(r.label, []).append(r.vec_id)
    assert len(by[0]) == 4 and len(by[1]) == 4  # both classes at the floor
    # determinism: same election on rerun
    again = {r.vec_id for r in balance_labels(df).collect()}
    assert again == {r.vec_id for r in got}


def test_peak_days_planted_spike(spark):
    from leidenalg_spark.operators.events import peak_days

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 10 steady days of 4 events, then a spike day of 20
    for d in range(10):
        for _ in range(4):
            rows.append((eid, t0 + timedelta(days=d), 1, "click", 0.0, "{}")); eid += 1
    for _ in range(20):
        rows.append((eid, t0 + timedelta(days=10), 1, "click", 0.0, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r.day: r for r in peak_days(ev).collect()}
    spike = got[t0 + timedelta(days=10)]
    assert spike.baseline == 4.0 and spike.is_peak
    assert not got[t0 + timedelta(days=9)].is_peak
    assert got[t0 + timedelta(days=3)].baseline is None  # window not full yet


def test_activity_correlation_identical_days(spark):
    from leidenalg_spark.operators.events import activity_correlation

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    # identical per-user activity two days running (perfect correlation);
    # jitter in counts so variance is nonzero
    for d in range(2):
        for u in range(6):
            for _ in range(u + 1):
                rows.append((eid, t0 + timedelta(days=d), u)); eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    got = activity_correlation(ev).collect()
    assert len(got) == 1
    assert got[0].n_both == 6 and got[0].r == 1.0


def test_ttr_stats_degenerate_vs_diverse(spark):
    from leidenalg_spark.operators.textops import ttr_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "one two three four"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in ttr_stats(docs).collect()}
    assert (got[1].n_tokens, got[1].n_types, got[1].ttr, got[1].hapax_frac) == (4, 1, 0.25, 0.0)
    assert got[2].ttr == 1.0 and got[2].hapax_frac == 1.0
    assert got[3].n_tokens == 0 and got[3].ttr is None


def test_wilson_small_sample_honesty(spark):
    from leidenalg_spark.operators.events import wilson_error_rates

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    # population baseline: 20 users, 1 error in 10 events each (10%)
    for u in range(20):
        for i in range(10):
            rows.append((eid, t0, u, "error" if i == 0 else "view", 0.0, "{}")); eid += 1
    # small-sample 100% user: 1-for-1 — must NOT flag
    rows.append((eid, t0, 100, "error", 0.0, "{}")); eid += 1
    # large-sample high-rate user: 40 errors in 50 — must flag
    for i in range(50):
        rows.append((eid, t0, 200, "error" if i < 40 else "view", 0.0, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r.user_id: r for r in wilson_error_rates(ev).collect()}
    assert got[100].rate == 1.0 and not got[100].is_elevated
    assert got[200].is_elevated
    assert not got[0].is_elevated
    assert got[200].wilson_low < got[200].rate < got[200].wilson_high


def test_fisher_ratio_discriminative_dimension(spark):
    from leidenalg_spark.operators.similarity import fisher_ratio

    rows = []
    # dim 0 separates labels (0 vs 10), dim 1 is pure jitter
    for i in range(20):
        lab = i % 2
        rows.append((i, [lab * 10.0 + (i % 5) * 0.1, (i % 7) * 0.1], lab))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = {r.dim: r for r in fisher_ratio(vecs).collect()}
    assert got[0].fisher > 100        # planted separation dominates jitter
    assert got[1].fisher < 5          # no label signal


def test_hhi_single_actor_dominance(spark):
    from leidenalg_spark.operators.events import hhi_concentration

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 'spread': 10 actors x 1 event; 'bot': one actor with 9 events + 1 other
    for u in range(10):
        rows.append((eid, t0, u, "spread", 0.0, "{}")); eid += 1
    for _ in range(9):
        rows.append((eid, t0, 99, "bot", 0.0, "{}")); eid += 1
    rows.append((eid, t0, 1, "bot", 0.0, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r.event_type: r for r in hhi_concentration(ev).collect()}
    assert got["spread"].hhi == 0.1 and got["spread"].effective_actors == 10.0
    assert got["bot"].hhi == 0.82  # 0.9^2 + 0.1^2


def test_tfidf_cosine_planted_geometry(spark):
    """Hand-computed golden: docs sharing only the corpus-wide token get
    cosine 0 (idf ln(N/N)=0 zeroes the shared coordinate); identical
    docs score 1; topical overlap scores between.  Hub cap: a token in
    > max_token_df docs is excluded from the dot product."""
    from math import isclose, log, sqrt

    from leidenalg_spark.operators.dedup import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [
            (1, "common alpha beta"),
            (2, "common alpha beta"),       # identical to 1
            (3, "common alpha gamma"),      # shares alpha with 1/2
            (4, "common delta epsilon"),    # shares only the hub token
        ],
        "doc_id long, text string",
    )
    got = {(r.a, r.b): r.cosine for r in tfidf_cosine_pairs(docs, threshold=0.0).collect()}
    # 'common' has df=N=4 -> idf=0 -> contributes nothing anywhere
    assert isclose(got[(1, 2)], 1.0, abs_tol=1e-6)
    # alpha df=3 (docs 1,2,3), beta df=2 (identical docs 1,2), gamma df=1
    wa, wbeta, wgamma = log(4 / 3), log(4 / 2), log(4.0)
    expect = wa * wa / (sqrt(wa**2 + wbeta**2) * sqrt(wa**2 + wgamma**2))
    assert isclose(got[(1, 3)], expect, abs_tol=1e-6)
    assert (1, 4) not in got or got[(1, 4)] == 0.0

    # hub cap: with max_token_df=2, alpha (df=3) leaves the dot product
    # but stays in the (exact) norms — capped cosine is a lower bound
    capped = {
        (r.a, r.b): r.cosine
        for r in tfidf_cosine_pairs(docs, threshold=0.0, max_token_df=2).collect()
    }
    assert (1, 3) not in capped or capped[(1, 3)] == 0.0
    expect_capped = wbeta**2 / (wa**2 + wbeta**2)
    assert isclose(capped[(1, 2)], expect_capped, abs_tol=1e-6)
    assert capped[(1, 2)] < got[(1, 2)]


def test_t_closeness_planted_skew(spark):
    """A class matching the global mix scores tvd≈0; a single-value
    class scores 1 − p_global(v); absent values enter analytically."""
    from leidenalg_spark.operators.sampling import t_closeness

    rows = []
    # class A: 8 x, 2 y  — matches global-ish mix; class B: 10 x only
    rows += [("A", "x")] * 8 + [("A", "y")] * 2
    rows += [("B", "x")] * 10
    df = spark.createDataFrame(rows, "cls string, v string")
    got = {r["cls"]: r.asDict() for r in t_closeness(df, ["cls"], "v", t=0.2).collect()}
    # global: x 18/20, y 2/20
    assert got["A"]["class_size"] == 10 and got["B"]["class_size"] == 10
    # A: 0.5*(|0.8-0.9| + |0.2-0.1|) = 0.1
    assert got["A"]["tvd"] == 0.1 and got["A"]["meets_t"]
    # B: 0.5*(|1-0.9| + 0.1 absent-y mass) = 0.1 — wait, same by symmetry
    assert got["B"]["tvd"] == 0.1
    # sharper skew: class C all-y against a y-rare global
    rows2 = [("A", "x")] * 90 + [("A", "y")] * 10 + [("C", "y")] * 10
    df2 = spark.createDataFrame(rows2, "cls string, v string")
    got2 = {r["cls"]: r.asDict() for r in t_closeness(df2, ["cls"], "v", t=0.2).collect()}
    # global: x 90/110, y 20/110; C: all y → tvd = 0.5*(|1-20/110| + 90/110)
    import pytest as _pt
    assert got2["C"]["tvd"] == _pt.approx(round(0.5 * ((1 - 20 / 110) + 90 / 110), 6))
    assert not got2["C"]["meets_t"]


def test_sbm_fit_planted_two_blocks(spark):
    """Two planted blocks: dense within (triangles), one cross edge —
    hand-computed rate matrix and likelihood contributions."""
    import math

    from leidenalg_spark.operators.community import sbm_fit

    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )
    memb = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "id long, comm long"
    )
    got = {(r["comm_a"], r["comm_b"]): r.asDict() for r in sbm_fit(e, memb).collect()}
    assert set(got) == {(0, 0), (0, 1), (1, 1)}
    # within blocks: 3 of 3 pairs -> p = 1, ll_bern = 3 ln 1 + 0 = 0
    assert got[(0, 0)]["m_ab"] == 3 and got[(0, 0)]["n_pairs"] == 3
    assert got[(0, 0)]["p_ab"] == 1.0 and got[(0, 0)]["ll_bern"] == 0.0
    # across: 1 of 9 pairs
    x = got[(0, 1)]
    assert x["m_ab"] == 1 and x["n_pairs"] == 9
    assert x["ll_bern"] == round(math.log(1 / 9) + 8 * math.log(8 / 9), 6)
    # degree-corrected: kappa = 7 per block (deg 2,2,3 / 3,2,2);
    # within contribution 2m ln(2m/49) with m=3
    assert got[(0, 0)]["ll_dc"] == round(6 * math.log(6 / 49), 6)
    assert x["ll_dc"] == round(math.log(1 / 49), 6)
    # likelihoods identical under block-label permutation
    memb2 = spark.createDataFrame(
        [(i, 7 if i < 3 else 2) for i in range(6)], "id long, comm long"
    )
    got2 = {(r["comm_a"], r["comm_b"]): r.asDict() for r in sbm_fit(e, memb2).collect()}
    assert sorted(r["ll_bern"] for r in got.values()) == sorted(
        r["ll_bern"] for r in got2.values()
    )
