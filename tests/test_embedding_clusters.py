"""embedding_clusters: planted well-separated direction bundles must come
back as exactly those clusters, unrelated vectors as singletons."""

import numpy as np
import pandas as pd

from leidenalg_spark.operators.similarity import embedding_clusters


def test_planted_bundles_recovered(spark):
    rng = np.random.default_rng(7)
    dim, per = 16, 6
    # three nearly-orthogonal base directions; members = base + tiny noise
    bases = np.linalg.qr(rng.standard_normal((dim, 3)))[0].T  # (3, dim)
    rows = []
    for c, base in enumerate(bases):
        for j in range(per):
            v = base + 0.02 * rng.standard_normal(dim)
            rows.append((c * 100 + j, (v / np.linalg.norm(v)).astype("float32")))
    # two isolated vectors, orthogonal-ish to everything
    iso = np.linalg.qr(rng.standard_normal((dim, 5)))[0].T[3:]
    for k, v in enumerate(iso):
        rows.append((900 + k, (v / np.linalg.norm(v)).astype("float32")))
    pdf = pd.DataFrame({"vec_id": [r[0] for r in rows],
                        "embedding": [r[1].tolist() for r in rows]})
    emb = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")

    got = embedding_clusters(spark, emb, threshold=0.9, seed=3).toPandas()
    assert len(got) == len(rows)
    lab = dict(zip(got.vec_id, got.cluster))
    # each planted bundle is one cluster...
    for c in range(3):
        ids = [c * 100 + j for j in range(per)]
        assert len({lab[i] for i in ids}) == 1
    # ...the three bundles are distinct clusters...
    assert len({lab[c * 100] for c in range(3)}) == 3
    # ...and the isolated vectors are singletons labelled by their own id
    assert lab[900] == 900 and lab[901] == 901


def test_singleton_labels_cannot_collide_with_cluster_labels(spark):
    """Regression: Leiden's dense 0..k-1 labels must not leak into the
    output label space — singleton vec_id 0 used to collide with the
    first cluster's label 0, merging unrelated vectors."""
    rng = np.random.default_rng(11)
    dim = 16
    base = np.linalg.qr(rng.standard_normal((dim, 2)))[0].T
    rows = [(0, base[0])]  # isolated vector with the collision-prone id 0
    for j, v in enumerate(
        [base[1] + 0.01 * rng.standard_normal(dim) for _ in range(3)]
    ):
        rows.append((2 + j, v / np.linalg.norm(v)))
    pdf = pd.DataFrame({"vec_id": [r[0] for r in rows],
                        "embedding": [np.asarray(r[1], dtype="float32").tolist() for r in rows]})
    emb = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")
    got = embedding_clusters(spark, emb, threshold=0.9, seed=5).toPandas()
    lab = dict(zip(got.vec_id, got.cluster))
    assert lab[0] == 0  # singleton keeps its own id
    bundle = {lab[i] for i in (2, 3, 4)}
    assert len(bundle) == 1
    assert bundle != {0}  # and the bundle's label is NOT the singleton's
    assert bundle == {2}  # min-member-id labelling


def test_quantize_embeddings_roundtrip_error_bounded(spark):
    from leidenalg_spark.operators.similarity import quantize_embeddings

    rows = [
        (0, [1.0, -0.5, 0.25, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),       # zero vector -> scale 0, codes 0
        (2, [127.0, -127.0, 63.5, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = quantize_embeddings(emb).collect()
    by = {}
    for r in out:
        by.setdefault(r["id"], {})[r["i"]] = (r["code"], r["scale"])
    # zero vector
    assert all(c == 0 for c, _ in by[1].values())
    # reconstruction error <= scale/2 per coordinate on the others
    for vid, vec in ((0, rows[0][1]), (2, rows[2][1])):
        for i, x in enumerate(vec):
            code, scale = by[vid][i]
            assert abs(code * scale - x) <= scale / 2 + 1e-9
            assert abs(code) <= 127


def test_knn_graph_planted_bundles(spark):
    """knn_graph on planted direction bundles: every top-k edge must stay
    inside its bundle (bundles are near-orthogonal), mutual flags hold,
    and piping the edges into connected components recovers the planted
    clustering end to end."""
    from leidenalg_spark.operators.similarity import knn_graph

    rng = np.random.default_rng(5)
    dim, per = 16, 6
    bases = np.linalg.qr(rng.standard_normal((dim, 3)))[0].T
    rows = []
    for c, base in enumerate(bases):
        for j in range(per):
            v = base + 0.02 * rng.standard_normal(dim)
            rows.append((c * 100 + j, (v / np.linalg.norm(v)).astype("float32")))
    pdf = pd.DataFrame({"vec_id": [r[0] for r in rows],
                        "embedding": [r[1].tolist() for r in rows]})
    emb = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")

    edges = knn_graph(spark, emb, k=3, n_planes=4, seed=42).toPandas()
    assert len(edges) > 0
    # no cross-bundle edge: bundle id = vec_id // 100
    assert (edges.src // 100 == edges.dst // 100).all()
    # weights are valid cosines, high within a tight bundle
    assert (edges.weight > 0.9).all() and (edges.weight <= 1.0).all()
    # with k=3 and 6-member bundles every kept edge SHOULD be mutual
    # for at least the closest pairs — sanity: some mutual edges exist
    assert edges.mutual.any()
    # determinism
    again = knn_graph(spark, emb, k=3, n_planes=4, seed=42).toPandas()
    a = edges.sort_values(["src", "dst"]).reset_index(drop=True)
    b = again.sort_values(["src", "dst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_random_projection_properties(spark):
    import numpy as np

    from leidenalg_spark.operators.similarity import random_projection

    rows = [
        (0, [1.0] + [0.0] * 7),       # basis vector e_0
        (1, [2.0] + [0.0] * 7),       # 2*e_0 — linearity probe
        (2, [0.5] * 8),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = random_projection(spark, emb, k=4, dim=8).collect()
    y = {}
    for r in out:
        y.setdefault(r.id, {})[r.j] = r.y
    assert len(y[0]) == 4
    # e_0 projects to sign(0, j)/sqrt(k): each |y_j| == 0.5 exactly
    assert all(abs(v) == 0.5 for v in y[0].values())
    # linearity: proj(2x) == 2*proj(x), componentwise
    assert all(abs(y[1][j] - 2 * y[0][j]) < 1e-9 for j in y[0])
    # norm preserved in expectation: ||x||=sqrt(2) for the constant
    # vector; the JL estimate must be within 2x (loose, deterministic)
    n2 = sum(v * v for v in y[2].values())
    assert 0.5 * 2.0 < n2 < 2.0 * 2.0


def test_distance_histogram_goldens(spark):
    from leidenalg_spark.operators.similarity import distance_histogram

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.0]),   # cos(0,1) = 1 → clamped into the top bin
            (2, [0.0, 1.0]),   # cos(1,2) = 0
            (3, [-1.0, 0.0]),  # cos(2,3) = 0
        ],
        "vec_id long, embedding array<float>",
    )
    got = {r.bin: r for r in distance_histogram(spark, emb).collect()}
    # only offset 1 produces pairs on 4 vectors
    assert got[19].n_pairs == 1 and got[19].avg_cos == 1.0
    assert got[19].lo == 0.95
    assert got[0].n_pairs == 2 and got[0].avg_cos == 0.0
    assert set(got) == {0, 19}


def test_centroid_classify_goldens(spark):
    from leidenalg_spark.operators.similarity import centroid_classify

    # two tight clusters + one vector mislabelled into the far cluster
    emb = spark.createDataFrame(
        [
            (0, [0.0, 0.0], 0),
            (1, [0.1, 0.0], 0),
            (2, [10.0, 10.0], 1),
            (3, [10.1, 10.0], 1),
            (4, [10.0, 10.1], 0),  # labelled 0, sits in cluster 1
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = {(r.label, r.pred_label): r.n for r in centroid_classify(spark, emb).collect()}
    # the two clean label-1 vectors predict 1; clean label-0 predict 0
    assert got[(1, 1)] == 2 and got[(0, 0)] == 2
    # the planted mislabel is confused into class 1
    assert got[(0, 1)] == 1
    assert sum(got.values()) == 5


def test_kcenter_coreset_goldens(spark):
    from leidenalg_spark.operators.similarity import kcenter_coreset

    # 1-D line: seed = id 0 at x=0; farthest is x=100 (id 3); next is
    # the midpoint x=50 (id 2); then x=10 (id 1)
    emb = spark.createDataFrame(
        [(0, [0.0]), (1, [10.0]), (2, [50.0]), (3, [100.0])],
        "vec_id long, embedding array<float>",
    )
    out = kcenter_coreset(spark, emb, k=4).orderBy("rnd").collect()
    assert [r.center_id for r in out] == [0, 3, 2, 1]
    assert [r.radius for r in out] == [0.0, 100.0, 50.0, 10.0]
    # the objective curve is non-increasing after the seed
    radii = [r.radius for r in out[1:]]
    assert radii == sorted(radii, reverse=True)


def test_semantic_dedup_planted_pair(spark):
    """One near-identical pair + one far vector, single cluster: the
    higher id of the pair is dropped, greedy first-wins in id order."""
    from leidenalg_spark.operators.similarity import semantic_dedup

    e = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.999, 0.02]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in semantic_dedup(spark, e, k=1, iters=1, threshold=0.95).collect()}
    assert out[1].is_dup and out[1].dup_of == 0 and out[1].cos_sim > 0.95
    assert not out[0].is_dup and out[0].dup_of is None
    assert not out[2].is_dup


def test_knn_label_noise_flags_flipped_label(spark):
    """Two tight label clusters; one point's label flipped: only it is
    flagged at k=1 (its nearest neighbour disagrees)."""
    from leidenalg_spark.operators.similarity import knn_label_noise

    e = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0),
         (2, [0.0, 1.0], 1), (3, [0.1, 0.9], 0)],  # 3's true cluster is 1
        "vec_id long, embedding array<float>, label int",
    )
    out = {r.vec_id: r for r in knn_label_noise(e, k=1).collect()}
    assert out[0].noise_score == 0.0 and not out[0].flagged
    assert out[1].noise_score == 0.0
    assert out[3].noise_score == 1.0 and out[3].flagged
    # 2's nearest neighbour is 3 which CLAIMS label 0 → 2 is also noisy
    assert out[2].flagged


def test_dim_truncation_fidelity_exact_when_tail_zero(spark):
    """Vectors with all mass in the first 2 dims: the 2-dim truncated
    cosine equals the full cosine → MAE 0, Pearson 1."""
    from leidenalg_spark.operators.similarity import dim_truncation_fidelity

    e = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.6, 0.8, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    r = dim_truncation_fidelity(spark, e, dims=(2,), offsets=(1,)).collect()[0]
    assert r.dim == 2 and r.n_pairs == 2
    assert r.mae == 0.0 and abs(r.pearson_r - 1.0) < 1e-6


def test_label_separation_auc_perfect(spark):
    """Same-label pair outranks both different-label pairs → AUC 1."""
    from leidenalg_spark.operators.similarity import label_separation_auc

    e = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0),
         (2, [0.0, 1.0], 1), (3, [-1.0, 0.1], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    r = label_separation_auc(spark, e, offsets=(1,)).collect()[0]
    assert r.n_pairs == 3 and r.n_same == 1 and r.n_diff == 2
    assert abs(r.auc - 1.0) < 1e-6


def test_rrf_fuse_hand_computed(spark):
    """Two 2-deep lists: doc ranked 1st+2nd beats docs seen once; scores
    are Σ 1/(60+rank)."""
    from leidenalg_spark.operators.similarity import rrf_fuse

    r1 = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, neighbor_id long, rank long"
    )
    r2 = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2)], "query_id long, neighbor_id long, rank long"
    )
    out = {r.neighbor_id: r for r in rrf_fuse([r1, r2]).collect()}
    assert abs(out[11].rrf_score - round(1 / 61 + 1 / 62, 6)) < 1e-9
    assert abs(out[10].rrf_score - round(1 / 61, 6)) < 1e-9
    assert out[11].rank == 1 and out[10].rank == 2 and out[12].rank == 3


def test_retrieval_ndcg_perfect_and_degraded(spark):
    """Two tight label clusters: every query's same-label vectors
    outrank the rest → mean nDCG 1.0 at k=3."""
    from leidenalg_spark.operators.similarity import retrieval_ndcg

    e = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.99, 0.05], 0), (2, [0.98, 0.08], 0),
         (3, [0.0, 1.0], 1), (4, [0.05, 0.99], 1), (5, [0.08, 0.98], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    r = retrieval_ndcg(spark, e, k=3, max_id=None).collect()[0]
    assert r.n_queries == 6
    assert abs(r.mean_ndcg - 1.0) < 1e-6


def test_kmeans_elbow_inertia_decreases(spark):
    from leidenalg_spark.operators.similarity import kmeans_elbow

    import numpy as np
    rng = np.random.default_rng(7)
    rows = []
    for c in range(4):
        base = np.zeros(4); base[c] = 4.0
        for i in range(12):
            rows.append((c * 12 + i, (base + rng.normal(0, 0.05, 4)).tolist()))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.k: r.inertia for r in kmeans_elbow(spark, e, ks=(1, 2, 4)).collect()}
    assert out[1] > out[2] > out[4]
    assert out[4] < 0.1 * out[1]  # true k collapses inertia


def test_product_quantize_identical_vectors_share_codes(spark):
    from leidenalg_spark.operators.similarity import product_quantize

    e = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 2.0]), (1, [1.0, 0.0, 0.0, 2.0]),
         (2, [0.0, 3.0, 4.0, 0.0]), (3, [0.01, 2.9, 4.1, 0.05])],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in product_quantize(spark, e, m=2, k=2).collect()}
    assert out[0].codes == out[1].codes and out[0].recon_err == out[1].recon_err
    assert len(out[0].codes) == 2
    assert out[2].codes == out[3].codes  # near-identical land in same cells


def test_embedding_curation_composes_screens(spark):
    """The composed funnel agrees with its three component screens
    row-for-row, and keep = ¬dup ∧ ¬noisy ∧ ¬outlier."""
    from leidenalg_spark.operators.similarity import (
        embedding_curation, kmeans_outliers, knn_label_noise, semantic_dedup,
    )

    import numpy as np
    rng = np.random.default_rng(3)
    rows = []
    for c in range(2):
        base = np.zeros(4); base[c] = 3.0
        for i in range(10):
            rows.append((c * 10 + i, (base + rng.normal(0, 0.05, 4)).tolist(), c))
    rows.append((20, rows[0][1], 0))          # planted duplicate of vec 0
    rows.append((21, [2.0, 2.0, 2.0, 2.0], 1))  # off-manifold outlier
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    cur = {r.vec_id: r for r in
           embedding_curation(spark, e, k=2, knn_k=3, dedup_threshold=0.95).collect()}
    assert cur[20].is_dup and not cur[20].keep
    dup = {r.vec_id: r.is_dup for r in semantic_dedup(spark, e, k=2, threshold=0.95).collect()}
    noi = {r.vec_id: r.flagged for r in knn_label_noise(e, k=3).collect()}
    outl = {r.vec_id: r.is_outlier for r in kmeans_outliers(spark, e, k=2).collect()}
    for v, r in cur.items():
        assert r.is_dup == dup[v] and r.noisy == noi[v] and r.outlier == outl[v]
        assert r.keep == (not r.is_dup and not r.noisy and not r.outlier)


def test_media_byte_neardup_planted(spark):
    """Planted binary near-dups: a payload, the same with a short
    appended tail (high window overlap), and unrelated bytes."""
    from leidenalg_spark.operators.multimodal import (
        media_byte_shingles, media_neardup_pairs,
    )

    base = bytes(range(200)) * 3
    rows = [
        (1, base),
        (2, base + b"tail-metadata"),  # near-dup of 1
        (3, bytes(reversed(base)) + b"\x00" * 37),  # different content
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in media_neardup_pairs(media, threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.9
    assert all({a, b} == {1, 2} for a, b in pairs)
    # shingles are byte-aligned 16-hex-char windows
    sh = media_byte_shingles(media.where("media_id = 1"))
    one = sh.limit(1).first()["shingle"]
    assert len(one) == 16
    # NULL payload fingerprints as empty and produces no shingles
    empty = spark.createDataFrame([(9, None)], "media_id long, payload binary")
    assert media_byte_shingles(empty).count() == 0
