"""Edge derivation (transcripts + events) and graph-kernel tests, with
pandas/NumPy re-derivations as independent oracles (SURVEY.md §5.3)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from leidenalg_spark.operators import edges as E
from leidenalg_spark.operators import kernels as K
from leidenalg_spark.sources import fixtures as fx
from leidenalg_spark.sources.transcripts import synthetic_transcripts


@pytest.fixture(scope="module")
def transcripts(spark):
    return synthetic_transcripts(spark, n_convs=50, max_turns=12, seed=42).persist()


def test_transcripts_schema_and_determinism(spark, transcripts):
    assert [f.name for f in transcripts.schema.fields] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    t2 = synthetic_transcripts(spark, n_convs=50, max_turns=12, seed=42)
    a = transcripts.orderBy("conv_id", "turn_idx").toPandas()
    b = t2.orderBy("conv_id", "turn_idx").toPandas()
    pd.testing.assert_frame_equal(a, b)
    # per-turn text equality under stable (conv_id, turn_idx) ordering —
    # the BASELINE.json input-hint invariant (round-trip through parquet)
    assert a.duplicated(subset=["conv_id", "turn_idx"]).sum() == 0


def test_derive_edges_matches_pandas(spark, transcripts):
    got = E.derive_named_edges(transcripts).orderBy("src_name", "dst_name").toPandas()
    t = transcripts.orderBy("conv_id", "turn_idx").toPandas()
    actor = np.where(
        t["role"] == "tool", "tool:" + t["tool"].fillna("unknown"), t["conv_id"] + ":" + t["role"]
    )
    t = t.assign(actor=actor)
    rows = []
    for _, grp in t.groupby("conv_id", sort=False):
        acts = grp.sort_values("turn_idx")["actor"].tolist()
        tools = grp.sort_values("turn_idx")
        rows += [(a, b) for a, b in zip(acts, acts[1:]) if a != b]
        for _, r in tools.iterrows():
            if r["role"] == "assistant" and pd.notna(r["tool"]):
                rows.append((r["actor"], "tool:" + r["tool"]))
    exp = (
        pd.DataFrame(rows, columns=["src_name", "dst_name"])
        .groupby(["src_name", "dst_name"], as_index=False)
        .size()
        .rename(columns={"size": "weight"})
    )
    exp["weight"] = exp["weight"].astype(float)
    merged = got.merge(exp, on=["src_name", "dst_name"], suffixes=("_got", "_exp"), how="outer")
    assert merged["weight_got"].isna().sum() == 0
    assert merged["weight_exp"].isna().sum() == 0
    assert (merged["weight_got"] == merged["weight_exp"]).all()


def test_canonicalize_and_ids(spark, transcripts):
    named = E.derive_named_edges(transcripts)
    verts = E.vertex_table(named)
    E.assert_no_id_collisions(verts)
    e = E.transcripts_to_edges(transcripts)
    pdf = e.toPandas()
    assert (pdf["src"] <= pdf["dst"]).all()
    # canonical fold preserves total weight
    assert pdf["weight"].sum() == named.agg(F.sum("weight")).first()[0]


def _fixture_edges(spark, fix):
    n, s, d, w = fix[:4]
    if w is None:
        w = np.ones(len(s))
    return n, spark.createDataFrame(
        pd.DataFrame({"src": s.astype("int64"), "dst": d.astype("int64"), "weight": w.astype("float64")})
    )


def test_connected_components_forest(spark):
    n, e = _fixture_edges(spark, fx.forest(10, 10, 3))
    comp = K.connected_components(spark, e).toPandas().sort_values("id")
    expected = (np.arange(100) // 10) * 10  # min vertex of each tree
    assert (comp["component"].to_numpy() == expected).all()


def test_connected_components_path_and_isolated(spark):
    # long path exercises the O(log n) star-contraction rounds
    src = np.arange(0, 199, dtype="int64")
    e = spark.createDataFrame(pd.DataFrame({"src": src, "dst": src + 1, "weight": 1.0}))
    comp = K.connected_components(spark, e).toPandas()
    assert (comp["component"] == 0).all()


def test_pagerank_star(spark):
    # undirected star: centre rank highest; ranks sum to 1
    leaves = np.arange(1, 21, dtype="int64")
    e = spark.createDataFrame(pd.DataFrame({"src": np.zeros(20, dtype="int64"), "dst": leaves, "weight": 1.0}))
    pr = K.pagerank(spark, e, directed=False, max_iter=30, tol=1e-10).toPandas().sort_values("id")
    assert np.isclose(pr["rank"].sum(), 1.0, atol=1e-6)
    centre = pr.loc[pr["id"] == 0, "rank"].iloc[0]
    assert centre > pr.loc[pr["id"] != 0, "rank"].max() * 3


def test_pagerank_directed_chain_no_in_and_dangling(spark):
    # 0→1→2: vertex 0 has no in-links (constant teleport+dangling rank via
    # the precomputed no-in union), vertex 2 is dangling; fixed point
    # computed by dense iteration
    e = spark.createDataFrame(
        pd.DataFrame({"src": [0, 1], "dst": [1, 2], "weight": [1.0, 1.0]})
    )
    pr = K.pagerank(spark, e, directed=True, max_iter=60, tol=1e-12).toPandas().sort_values("id")
    r = np.ones(3) / 3
    for _ in range(120):
        dang = r[2]
        new = np.full(3, 0.15 / 3 + 0.85 * dang / 3)
        new[1] += 0.85 * r[0]
        new[2] += 0.85 * r[1]
        r = new
    assert np.allclose(pr["rank"].to_numpy(), r, atol=1e-9)
    assert np.isclose(pr["rank"].sum(), 1.0, atol=1e-9)


def test_pagerank_matches_numpy_power_iteration(spark):
    fix = fx.erdos_renyi(60, 0.08, directed=True, seed=3)
    n, e = _fixture_edges(spark, fix)
    pr = K.pagerank(spark, e, directed=True, max_iter=60, tol=1e-12).toPandas().sort_values("id")
    # dense NumPy power iteration with identical dangling handling
    n_all, s, d, w = fix[0], fix[1], fix[2], np.ones(len(fix[1]))
    ids = np.unique(np.concatenate([s, d]))
    A = np.zeros((n_all, n_all))
    for a, b, ww in zip(s, d, w):
        A[a, b] += ww
    out = A.sum(axis=1)
    r = np.full(n_all, 1.0 / n_all)
    present = np.zeros(n_all, dtype=bool)
    present[ids] = True
    r[~present] = 0.0
    r[present] = 1.0 / present.sum()
    for _ in range(60):
        dangling = r[present & (out == 0)].sum()
        contrib = np.zeros(n_all)
        nz = out > 0
        contrib[present] = (A[nz].T @ (r[nz] / out[nz]))[present]
        r_new = np.where(present, 0.15 / present.sum() + 0.85 * (contrib + dangling / present.sum()), 0.0)
        if np.abs(r_new - r).sum() < 1e-13:
            r = r_new
            break
        r = r_new
    got = np.zeros(n_all)
    got[pr["id"].to_numpy()] = pr["rank"].to_numpy()
    assert np.allclose(got[present], r[present], atol=1e-6)


def test_triangle_count_known_graphs(spark):
    # K4 has 4 triangles
    _, e = _fixture_edges(spark, fx.full(4))
    assert K.triangle_count(spark, e).first()["n_triangles"] == 4
    # K5 has 10
    _, e5 = _fixture_edges(spark, fx.full(5))
    assert K.triangle_count(spark, e5).first()["n_triangles"] == 10
    # trees have none
    _, et = _fixture_edges(spark, fx.tree(40, 3))
    assert K.triangle_count(spark, et).first()["n_triangles"] == 0


def test_triangles_per_vertex_k4(spark):
    _, e = _fixture_edges(spark, fx.full(4))
    pv = K.triangles_per_vertex(spark, e).toPandas()
    assert (pv["n_triangles"] == 3).all()  # each vertex of K4 is in 3 triangles


def test_clustering_coefficient_triangle_with_pendant(spark):
    # triangle 1-2-3 plus pendant 3-4: lcc(1)=lcc(2)=1, lcc(3)=1/3, lcc(4)=0
    e = spark.createDataFrame(
        pd.DataFrame({"src": [1, 2, 1, 3], "dst": [2, 3, 3, 4], "weight": 1.0})
    )
    out = K.clustering_coefficient(spark, e).toPandas().set_index("id").sort_index()
    assert out.loc[1, "lcc"] == pytest.approx(1.0)
    assert out.loc[2, "lcc"] == pytest.approx(1.0)
    assert out.loc[3, "lcc"] == pytest.approx(1.0 / 3.0)
    assert out.loc[4, "lcc"] == 0.0
    assert out["n_triangles"].tolist() == [1, 1, 1, 0]
    assert out["degree"].tolist() == [2, 2, 3, 1]


def test_clustering_coefficient_complete_and_string_ids(spark):
    # K5: every vertex has lcc 1; duplicate/reversed edges and self-loops
    # must not change the simple-graph statistics
    _, e = _fixture_edges(spark, fx.full(5))
    extra = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    loops = e.limit(2).select("src", F.col("src").alias("dst"), "weight")
    out = K.clustering_coefficient(spark, e.unionByName(extra).unionByName(loops)).toPandas()
    assert (out["lcc"] == 1.0).all()
    assert (out["degree"] == 4).all()
    assert (out["n_triangles"] == 6).all()
    # string vertex ids (the driver query keys by name)
    es = spark.createDataFrame(
        pd.DataFrame({"src": ["a", "b", "a"], "dst": ["b", "c", "c"], "weight": 1.0})
    )
    outs = K.clustering_coefficient(spark, es).toPandas().set_index("id")
    assert (outs["lcc"] == 1.0).all()


def test_degree_assortativity_star_and_path(spark):
    # star K1,5: ends always pair degree 5 with degree 1 -> r = -1
    e = spark.createDataFrame(
        pd.DataFrame({"src": [0] * 5, "dst": [1, 2, 3, 4, 5], "weight": 1.0})
    )
    r = K.degree_assortativity(spark, e).first()["assortativity"]
    assert r == pytest.approx(-1.0, abs=1e-9)
    # numpy cross-check on a path graph P4 (degrees 1,2,2,1)
    ep = spark.createDataFrame(
        pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 3], "weight": 1.0})
    )
    rp = K.degree_assortativity(spark, ep).first()["assortativity"]
    # both orientations of edges (0,1),(1,2),(2,3); degrees 1,2,2,1
    da = np.array([1, 2, 2, 2, 2, 1])
    db = np.array([2, 1, 2, 2, 1, 2])
    exp = np.corrcoef(da, db)[0, 1]  # the textbook P4 value, -1/2
    assert rp == pytest.approx(exp, abs=1e-9)
    # degree-regular graph: correlation undefined -> NULL
    _, ek = _fixture_edges(spark, fx.full(4))
    assert K.degree_assortativity(spark, ek).first()["assortativity"] is None


def test_k_core_peels_to_fixpoint(spark):
    # K4 core plus a path tail 3-4-5: 2-core = the K4, 3-core = the K4,
    # 4-core = empty
    _, k4 = _fixture_edges(spark, fx.full(4))
    tail = spark.createDataFrame(
        pd.DataFrame({"src": [3, 4], "dst": [4, 5], "weight": 1.0})
    )
    e = k4.unionByName(tail)
    two = K.k_core(spark, e, k=2).toPandas().sort_values("id")
    assert two["id"].tolist() == [0, 1, 2, 3]
    assert two["core_deg"].tolist() == [3, 3, 3, 3]
    three = K.k_core(spark, e, k=3).toPandas()
    assert sorted(three["id"].tolist()) == [0, 1, 2, 3]
    assert K.k_core(spark, e, k=4).count() == 0
    # fixed-round mode after convergence equals the fixpoint
    two_r = K.k_core(spark, e, k=2, rounds=6).toPandas().sort_values("id")
    assert two_r["id"].tolist() == [0, 1, 2, 3]


def test_label_propagation_two_cliques(spark):
    # two K10 cliques joined by one edge → two labels
    n1, f1 = 10, fx.full(10)
    s2 = f1[1] + 10
    d2 = f1[2] + 10
    s = np.concatenate([f1[1], s2, [0]])
    d = np.concatenate([f1[2], d2, [10]])
    e = spark.createDataFrame(pd.DataFrame({"src": s.astype("int64"), "dst": d.astype("int64"), "weight": 1.0}))
    labels = K.label_propagation(spark, e, max_iter=15).toPandas().sort_values("id")
    l = labels["label"].to_numpy()
    assert len(set(l[:10])) == 1
    assert len(set(l[10:])) == 1
    assert l[0] != l[10]


def test_khop_counts_path_and_triangle(spark):
    # path 0-1-2-3-4 plus disjoint triangle 5-6-7
    e = spark.createDataFrame(
        pd.DataFrame({"src": [0, 1, 2, 3, 5, 6, 5], "dst": [1, 2, 3, 4, 6, 7, 7], "weight": 1.0})
    )
    got = K.khop_counts(spark, e, k=2).toPandas().set_index("id")["n_reachable"]
    assert got.to_dict() == {0: 2, 1: 3, 2: 4, 3: 3, 4: 2, 5: 2, 6: 2, 7: 2}
    g3 = K.khop_counts(spark, e, k=3).toPandas().set_index("id")["n_reachable"]
    assert g3.to_dict() == {0: 3, 1: 4, 2: 4, 3: 4, 4: 3, 5: 2, 6: 2, 7: 2}
    with pytest.raises(ValueError):
        K.khop_counts(spark, e, k=0)


def test_neighborhood_hll_matches_exact_small(spark):
    """HyperBall sketches are exact in the HLL early modes, so on a small
    graph every (id, dist) estimate must EQUAL the exact k-hop count."""
    e = spark.createDataFrame(
        pd.DataFrame({"src": [0, 1, 2, 3, 5, 6, 5], "dst": [1, 2, 3, 4, 6, 7, 7], "weight": 1.0})
    )
    est = K.neighborhood_hll(spark, e, max_dist=3).toPandas()
    for d in (1, 2, 3):
        exact = K.khop_counts(spark, e, k=d).toPandas().set_index("id")["n_reachable"]
        sub = est[est["dist"] == d].set_index("id")["n_reachable_est"]
        assert sub.to_dict() == exact.to_dict(), f"dist {d}"
    # ball sizes are monotone non-decreasing in dist per vertex
    p = est.pivot(index="id", columns="dist", values="n_reachable_est")
    assert ((p[2] >= p[1]) & (p[3] >= p[2])).all()


def test_personalized_pagerank_matches_numpy(spark):
    # directed graph with a dangling vertex (3) and a vertex unreachable
    # from the seeds (4→0 only): dangling mass restarts at the seed
    # vector, unreached vertices are exactly 0
    e = spark.createDataFrame(
        pd.DataFrame({
            "src": [0, 1, 2, 4, 0],
            "dst": [1, 2, 3, 0, 2],
            "weight": [1.0, 2.0, 1.0, 1.0, 1.0],
        })
    )
    pr = (
        K.personalized_pagerank(spark, e, [0], directed=True, max_iter=80, tol=0.0)
        .toPandas().sort_values("id")
    )
    n, d = 5, 0.85
    A = np.zeros((n, n))
    for a, b, w in [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0), (4, 0, 1.0), (0, 2, 1.0)]:
        A[a, b] += w
    out = A.sum(axis=1)
    reset = np.zeros(n); reset[0] = 1.0
    r = reset.copy()
    for _ in range(80):
        dang = r[out == 0].sum()
        contrib = np.zeros(n)
        nz = out > 0
        contrib = (r[nz, None] * A[nz] / out[nz, None]).sum(axis=0)
        r = d * contrib + (1.0 - d + d * dang) * reset
    assert np.allclose(pr["rank"].to_numpy(), r, atol=1e-9)
    assert np.isclose(pr["rank"].sum(), 1.0, atol=1e-9)
    assert pr.loc[pr["id"] == 4, "rank"].iloc[0] == 0.0  # never reached


def test_personalized_pagerank_weighted_seeds_and_validation(spark):
    e = spark.createDataFrame(
        pd.DataFrame({"src": [0, 1], "dst": [1, 0], "weight": [1.0, 1.0]})
    )
    seeds = spark.createDataFrame(pd.DataFrame({"id": [0, 1], "weight": [3.0, 1.0]}))
    pr = (
        K.personalized_pagerank(spark, e, seeds, directed=True, max_iter=30, tol=0.0)
        .toPandas().set_index("id")["rank"]
    )
    # swap dynamics under q = (0.75, 0.25), iterated exactly 30 steps
    # (tol=0 → fixed iteration count, bit-reproducible)
    r = np.array([0.75, 0.25])
    for _ in range(30):
        r = 0.85 * r[::-1] + 0.15 * np.array([0.75, 0.25])
    assert np.isclose(pr[0], r[0], atol=1e-12) and np.isclose(pr[1], r[1], atol=1e-12)
    with pytest.raises(ValueError):
        K.personalized_pagerank(spark, e, [])


def _tarjan_scc(n, edge_list):
    """Reference SCCs (iterative Tarjan); returns {vertex: min-id-of-scc}."""
    adj = {}
    for a, b in edge_list:
        adj.setdefault(a, []).append(b)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    comp = {}
    counter = [0]

    def strongconnect(v0):
        work = [(v0, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            succs = adj.get(v, [])
            for i in range(pi, len(succs)):
                w = succs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                scc = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    scc.append(w)
                    if w == v:
                        break
                m = min(scc)
                for w in scc:
                    comp[w] = m
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])

    for v in range(n):
        if v not in index and (v in adj or any(v == b for bs in adj.values() for b in bs)):
            strongconnect(v)
    return comp


def test_scc_crafted_graph(spark):
    # two 3-cycles bridged one-way, a 2-cycle island, a DAG tail
    el = [
        (0, 1), (1, 2), (2, 0),          # SCC {0,1,2}
        (2, 3),                          # bridge (one-way)
        (3, 4), (4, 5), (5, 3),          # SCC {3,4,5}
        (6, 7), (7, 6),                  # SCC {6,7}
        (5, 8), (8, 9),                  # DAG tail: 8, 9 singletons
    ]
    e = spark.createDataFrame(pd.DataFrame(el, columns=["src", "dst"]).assign(weight=1.0))
    got = {
        int(r.id): int(r.component)
        for r in K.strongly_connected_components(spark, e).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3, 6: 6, 7: 6, 8: 8, 9: 9}


def test_scc_matches_tarjan_random(spark):
    rng = np.random.default_rng(7)
    n = 40
    mask = rng.random((n, n)) < 0.06
    np.fill_diagonal(mask, False)
    el = [(int(a), int(b)) for a, b in zip(*np.nonzero(mask))]
    e = spark.createDataFrame(pd.DataFrame(el, columns=["src", "dst"]).assign(weight=1.0))
    got = {
        int(r.id): int(r.component)
        for r in K.strongly_connected_components(spark, e).collect()
    }
    exp = _tarjan_scc(n, el)
    assert got == exp


def test_random_walks_deterministic_and_stops_at_sink(spark):
    import hashlib

    e = spark.createDataFrame(
        pd.DataFrame({
            "src": [0, 0, 1, 2],
            "dst": [1, 2, 3, 3],
            "weight": [1.0, 3.0, 1.0, 1.0],
        })
    )
    out = K.random_walks(spark, e, walk_length=3, seed=42).toPandas()
    out2 = K.random_walks(spark, e, walk_length=3, seed=42).toPandas()
    key = ["walk_id", "step"]
    pd.testing.assert_frame_equal(
        out.sort_values(key).reset_index(drop=True),
        out2.sort_values(key).reset_index(drop=True),
    )
    # every vertex starts a walk; vertex 3 is a sink → its walk stops at 0
    assert set(out[out.step == 0].vertex) == {0, 1, 2, 3}
    w3 = out[out.walk_id == 3]
    assert len(w3) == 1 and int(w3.step.iloc[0]) == 0
    # walk from 0, step 1: recompute the A-Res choice with hashlib
    def u(walk_id, t, dst):
        h = hashlib.md5(f"42:{walk_id}:{t}:{dst}".encode()).hexdigest()
        return (int(h[:8], 16) + 1.0) / 4294967296.0
    keys = {d: u(0, 1, d) ** (1.0 / w) for d, w in [(1, 1.0), (2, 3.0)]}
    expect = max(sorted(keys), key=lambda d: (keys[d], -d))
    got = int(out[(out.walk_id == 0) & (out.step == 1)].vertex.iloc[0])
    assert got == expect


def test_random_walks_weight_proportional(spark):
    # 400 start vertices each choosing between weight-1 and weight-3 sinks:
    # the A-Res rule must pick the heavy sink ~75% of the time
    n = 400
    starts = np.arange(n, dtype="int64")
    e = spark.createDataFrame(
        pd.DataFrame({
            "src": np.concatenate([starts, starts]),
            "dst": np.concatenate([np.full(n, 100000), np.full(n, 100001)]),
            "weight": np.concatenate([np.full(n, 1.0), np.full(n, 3.0)]),
        })
    )
    out = K.random_walks(spark, e, walk_length=1, seed=7).toPandas()
    picks = out[(out.step == 1) & (out.walk_id < n)]
    frac_heavy = (picks.vertex == 100001).mean()
    assert 0.68 < frac_heavy < 0.82, frac_heavy


def test_harmonic_centrality_path_graph(spark):
    # path 0-1-2-3-4, max_dist=2
    e = spark.createDataFrame(
        pd.DataFrame({"src": [0, 1, 2, 3], "dst": [1, 2, 3, 4], "weight": 1.0})
    )
    h = K.harmonic_centrality(spark, e, max_dist=2).toPandas().set_index("id").sort_index()
    assert h.loc[0, "harmonic"] == pytest.approx(1.5)   # 1 + 1/2
    assert h.loc[1, "harmonic"] == pytest.approx(2.5)   # 0,2 at 1; 3 at 2
    assert h.loc[2, "harmonic"] == pytest.approx(3.0)   # 1,3 at 1; 0,4 at 2
    assert list(h["n_reachable"]) == [2, 3, 4, 3, 2]
    # n_reachable must agree with khop_counts at the same k
    kh = K.khop_counts(spark, e, k=2).toPandas().set_index("id").sort_index()
    assert (h["n_reachable"].to_numpy() == kh["n_reachable"].to_numpy()).all()
    with pytest.raises(ValueError):
        K.harmonic_centrality(spark, e, max_dist=0)


def test_adamic_adar_cycle_and_filters(spark):
    import math

    # 4-cycle 1-2-3-4-1: only the two diagonals are predicted, each with
    # two degree-2 common neighbours → AA = 2/ln(2)
    e = spark.createDataFrame(
        pd.DataFrame({"src": [1, 2, 3, 4], "dst": [2, 3, 4, 1], "weight": 1.0})
    )
    out = K.adamic_adar(spark, e).toPandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert list(zip(out.src, out.dst)) == [(1, 3), (2, 4)]
    assert (out.n_common == 2).all()
    assert np.allclose(out.aa, round(2 / math.log(2), 6))
    # min_common filters; adjacent pairs never appear
    assert K.adamic_adar(spark, e, min_common=3).count() == 0
    # center-degree cap: capping at 1 drops every wedge
    assert K.adamic_adar(spark, e, max_center_degree=1).count() == 0
    with pytest.raises(ValueError):
        K.adamic_adar(spark, e, min_common=0)


def _n2v_u(seed, wid, t, dst):
    import hashlib

    h = hashlib.md5(f"{seed}:{wid}:{t}:{dst}".encode()).hexdigest()[:8]
    return (int(h, 16) + 1.0) / 2**32


def _n2v_simulate(edges, walk_length, p, q, seed):
    """Pure-python node2vec twin: md5 A-Res keys, bias over prev."""
    adj, nbr = {}, set()
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
        nbr.add((s, d))
    verts = sorted({x for e in edges for x in e[:2]})
    rows = []
    for wid in verts:
        v, prev = wid, None
        rows.append((wid, 0, v))
        for t in range(1, walk_length + 1):
            cands = adj.get(v)
            if not cands:
                break
            scored = []
            for d, w in cands:
                if prev is None:
                    a = 1.0
                elif d == prev:
                    a = 1.0 / p
                elif (prev, d) in nbr:
                    a = 1.0
                else:
                    a = 1.0 / q
                scored.append((_n2v_u(seed, wid, t, d) ** (1.0 / (w * a)), -d))
            best_d = -max(scored)[1]
            rows.append((wid, t, best_d))
            prev, v = v, best_d
    return sorted(rows)


def test_node2vec_p1_q1_equals_random_walks(spark):
    import pandas as pd
    from leidenalg_spark.operators.kernels import node2vec_walks, random_walks

    edges = [(0, 1, 2.0), (1, 0, 1.0), (1, 2, 1.0), (0, 2, 0.5),
             (2, 0, 1.0), (2, 3, 3.0), (3, 1, 1.0)]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst", "weight"]))
    rw = random_walks(spark, e, walk_length=3, seed=42, directed=True).toPandas()
    n2 = node2vec_walks(spark, e, walk_length=3, p=1.0, q=1.0, seed=42, directed=True).toPandas()
    key = ["walk_id", "step"]
    assert rw.sort_values(key).reset_index(drop=True).equals(
        n2.sort_values(key).reset_index(drop=True)
    )


def test_node2vec_matches_bruteforce_extreme_bias(spark):
    import pandas as pd
    from leidenalg_spark.operators.kernels import node2vec_walks

    # triangle 0-1-2 (dist-1 branch), tail 1->3 with no 0->3 edge
    # (exploration branch), and returns everywhere (return branch)
    edges = [(0, 1, 1.0), (1, 0, 1.0), (1, 2, 1.0), (2, 1, 1.0),
             (0, 2, 1.0), (2, 0, 1.0), (1, 3, 1.0), (3, 1, 1.0)]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst", "weight"]))
    for p, q in [(8.0, 0.125), (0.125, 8.0), (4.0, 0.25)]:
        got = sorted(
            tuple(int(x) for x in r)
            for r in node2vec_walks(spark, e, walk_length=4, p=p, q=q,
                                    seed=7, directed=True).collect()
        )
        exp = _n2v_simulate(edges, 4, p, q, 7)
        assert got == exp, (p, q, got[:8], exp[:8])


def test_hits_star_hand_computed(spark):
    import math
    import pandas as pd
    from leidenalg_spark.operators.kernels import hits

    # three hubs all pointing at one authority
    e = spark.createDataFrame(
        pd.DataFrame([(1, 9, 1.0), (2, 9, 1.0), (3, 9, 1.0)],
                     columns=["src", "dst", "weight"])
    )
    out = {r["id"]: r for r in hits(spark, e, max_iter=5).collect()}
    assert out[9]["authority"] == 1.0 and out[9]["hub"] == 0.0
    for u in (1, 2, 3):
        assert abs(out[u]["hub"] - round(1 / math.sqrt(3), 6)) < 2e-6
        assert out[u]["authority"] == 0.0


def test_hits_matches_numpy_power_iteration(spark):
    import numpy as np
    import pandas as pd
    from leidenalg_spark.operators.kernels import hits

    rng = np.random.default_rng(3)
    n, m = 20, 60
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.uniform(0.5, 2.0, m)
    # collapse parallel edges like the operator's weighted sum does
    pdf = (pd.DataFrame({"src": src, "dst": dst, "weight": w})
           .groupby(["src", "dst"], as_index=False).sum())
    A = np.zeros((n, n))
    for r in pdf.itertuples():
        A[int(r.src), int(r.dst)] += r.weight
    h = np.ones(n)
    for _ in range(10):
        a = A.T @ h
        a = a / np.linalg.norm(a)
        h = A @ a
        h = h / np.linalg.norm(h)
    e = spark.createDataFrame(pdf)
    out = hits(spark, e, max_iter=10).toPandas().set_index("id").sort_index()
    got_h = out["hub"].to_numpy()
    got_a = out["authority"].to_numpy()
    assert np.allclose(got_h, np.round(h, 6), atol=2e-6)
    assert np.allclose(got_a, np.round(a, 6), atol=2e-6)


def test_eigenvector_centrality_matches_numpy(spark):
    import numpy as np
    import pandas as pd
    from leidenalg_spark.operators.kernels import eigenvector_centrality

    rng = np.random.default_rng(11)
    n, m = 15, 40
    pdf = (pd.DataFrame({
        "src": rng.integers(0, n, m), "dst": rng.integers(0, n, m),
        "weight": rng.uniform(0.5, 2.0, m),
    }).groupby(["src", "dst"], as_index=False).sum())
    A = np.zeros((n, n))
    for r in pdf.itertuples():
        A[int(r.src), int(r.dst)] += r.weight
        A[int(r.dst), int(r.src)] += r.weight  # blind symmetrisation
    x = np.ones(n)
    for _ in range(10):
        x = A @ x
        nrm = np.linalg.norm(x)
        if nrm:
            x = x / nrm
    got = (eigenvector_centrality(spark, spark.createDataFrame(pdf), max_iter=10)
           .toPandas().set_index("id").sort_index()["centrality"].to_numpy())
    assert np.allclose(got, np.round(x, 6), atol=2e-6)


def test_eigenvector_centrality_star_center_dominates(spark):
    import pandas as pd
    from leidenalg_spark.operators.kernels import eigenvector_centrality

    # star PLUS one leaf-leaf edge: a pure star is bipartite, where
    # power iteration oscillates with period 2 (±lambda eigenpair) and
    # even iteration counts land on the all-equal phase — the classic
    # caveat; the extra edge makes the graph aperiodic so it converges
    e = spark.createDataFrame(pd.DataFrame(
        [(0, i, 1.0) for i in range(1, 6)] + [(1, 2, 1.0)],
        columns=["src", "dst", "weight"],
    ))
    out = {r["id"]: r["centrality"] for r in
           eigenvector_centrality(spark, e, max_iter=20).collect()}
    assert out[0] > max(out[i] for i in range(1, 6))
    # leaves 3,4,5 are symmetric; 1,2 gain from their extra edge
    assert abs(out[3] - out[4]) < 1e-9 and abs(out[4] - out[5]) < 1e-9
    assert out[1] > out[3] and abs(out[1] - out[2]) < 1e-9


def test_reciprocity_hand_computed(spark):
    import pandas as pd
    from leidenalg_spark.operators.kernels import reciprocity

    # 1<->2 mutual, 1->3 asym, self-loop ignored, parallel edge collapsed
    e = spark.createDataFrame(pd.DataFrame(
        [(1, 2), (2, 1), (1, 3), (1, 3), (2, 2)], columns=["src", "dst"]
    ))
    r = reciprocity(spark, e).collect()[0]
    assert r["n_edges"] == 3 and r["n_mutual"] == 1 and r["n_asym"] == 1
    assert abs(r["reciprocity"] - round(2 / 3, 6)) < 1e-9


def test_closed_triples_cycle_vs_transitive(spark):
    import pandas as pd
    from leidenalg_spark.operators.kernels import closed_triples

    cyc = spark.createDataFrame(pd.DataFrame(
        [(1, 2), (2, 3), (3, 1)], columns=["src", "dst"]
    ))
    r = closed_triples(spark, cyc).collect()[0]
    assert (r["n_paths2"], r["n_cyclic"], r["n_transitive"]) == (3, 1, 0)

    tra = spark.createDataFrame(pd.DataFrame(
        [(1, 2), (2, 3), (1, 3)], columns=["src", "dst"]
    ))
    r = closed_triples(spark, tra).collect()[0]
    assert (r["n_paths2"], r["n_cyclic"], r["n_transitive"]) == (1, 0, 1)

    # 2-cycles are NOT 2-paths (distinct-vertex rule)
    two = spark.createDataFrame(pd.DataFrame(
        [(1, 2), (2, 1)], columns=["src", "dst"]
    ))
    r = closed_triples(spark, two).collect()[0]
    assert (r["n_paths2"], r["n_cyclic"], r["n_transitive"]) == (0, 0, 0)


def test_negative_samples_deterministic_and_clean(spark):
    import hashlib
    import pandas as pd
    from leidenalg_spark.operators.kernels import negative_samples

    edges = [(1, 2), (2, 3), (3, 1), (1, 4)]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"])
                              .assign(weight=1.0))
    out = negative_samples(spark, e, k=3, seed=7).toPandas()
    pos = set(edges)
    # no survivor is a self-pair or an existing edge
    for r in out.itertuples():
        assert r.neg_dst != r.src
        assert (r.src, r.neg_dst) not in pos
    # exact python twin: same md5 draw over the rank-ordered vertex table
    verts = sorted({x for ed in edges for x in ed})
    idx_of = {i + 1: v for i, v in enumerate(verts)}
    exp = []
    for s, d in edges:
        for i in (1, 2, 3):
            h = int(hashlib.md5(f"7:{s}:{d}:{i}".encode()).hexdigest()[:8], 16)
            cand = idx_of[h % len(verts) + 1]
            if cand != s and (s, cand) not in pos:
                exp.append((s, d, cand, i))
    got = sorted(map(tuple, out[["src", "pos_dst", "neg_dst", "draw"]].to_numpy().tolist()))
    assert got == sorted(exp)
    # rerun is bit-identical (retry-stable)
    out2 = negative_samples(spark, e, k=3, seed=7).toPandas()
    got2 = sorted(map(tuple, out2[["src", "pos_dst", "neg_dst", "draw"]].to_numpy().tolist()))
    assert got2 == got


def test_k_truss_planted(spark):
    import pandas as pd
    from leidenalg_spark.operators.kernels import k_truss

    # two triangles sharing edge (2,3), pendant edge (4,5)
    e = spark.createDataFrame(pd.DataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4), (4, 5)],
        columns=["src", "dst"],
    ).assign(weight=1.0))
    t3 = k_truss(spark, e, k=3).toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    # 3-truss keeps every triangle edge, drops only the pendant
    assert list(map(tuple, t3[["a", "b"]].to_numpy())) == [
        (1, 2), (1, 3), (2, 3), (2, 4), (3, 4)
    ]
    assert t3.set_index(["a", "b"])["support"].to_dict() == {
        (1, 2): 1, (1, 3): 1, (2, 3): 2, (2, 4): 1, (3, 4): 1
    }
    # 4-truss: after (2,3) alone survives round 1, its support drops to
    # 0 and the truss empties — the cascade the fixpoint must follow
    assert k_truss(spark, e, k=4).count() == 0

    # K4 is exactly a 4-truss: 6 edges, every support 2
    k4 = spark.createDataFrame(pd.DataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
        columns=["src", "dst"],
    ).assign(weight=1.0))
    got = k_truss(spark, k4, k=4).toPandas()
    assert len(got) == 6 and (got["support"] == 2).all()


def test_densest_subgraph_finds_planted_clique(spark):
    import pandas as pd
    from leidenalg_spark.operators.kernels import densest_subgraph

    # K5 (density 2.0) with a pendant path hanging off vertex 4
    rows = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    rows += [(4, 5), (5, 6), (6, 7), (7, 8), (8, 9), (9, 10)]
    e = spark.createDataFrame(
        pd.DataFrame(rows, columns=["src", "dst"]).assign(weight=1.0)
    )
    out = densest_subgraph(spark, e).toPandas().sort_values("id")
    assert list(out["id"]) == [0, 1, 2, 3, 4]
    assert (out["density"] == 2.0).all()

    # fixed-rounds mode reproduces the same winner (oracle comparability)
    out_r = densest_subgraph(spark, e, rounds=4).toPandas().sort_values("id")
    assert list(out_r["id"]) == [0, 1, 2, 3, 4]


def test_mis_is_independent_and_maximal(spark):
    import hashlib
    import pandas as pd
    from leidenalg_spark.operators.kernels import maximal_independent_set

    fix = fx.erdos_renyi(40, 0.12, seed=5)
    pairs = {(int(a), int(b)) for a, b in zip(fix[1], fix[2]) if a != b}
    e = spark.createDataFrame(pd.DataFrame(
        sorted(pairs), columns=["src", "dst"]
    ).assign(weight=1.0))
    out = maximal_independent_set(spark, e, seed=3).toPandas()
    mis = set(out["id"])

    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # independent: no two MIS members adjacent
    for v in mis:
        assert not (adj.get(v, set()) & mis), v
    # maximal: every non-member has an MIS neighbour
    for v in adj:
        if v not in mis:
            assert adj[v] & mis, v

    # python twin of the md5-priority rounds — exact member set + rounds
    def p(v):
        return (int(hashlib.md5(f"3:{v}".encode()).hexdigest()[:8], 16), v)

    active = set(adj)
    exp = {}
    r = 0
    while active:
        r += 1
        winners = {
            v for v in active
            if all(p(v) < p(u) for u in (adj[v] & active))
        }
        for w in winners:
            exp[w] = r
        active -= winners | {u for w in winners for u in adj[w]}
    got = dict(zip(out["id"], out["mis_round"]))
    assert got == exp


def test_label_spreading_two_seeds(spark):
    import pandas as pd
    from leidenalg_spark.operators.kernels import label_spreading

    # barbell: clique {0,1,2} - bridge - clique {5,6,7}; one seed each
    rows = [(0, 1), (1, 2), (0, 2), (5, 6), (6, 7), (5, 7), (2, 5), (8, 9)]
    e = spark.createDataFrame(
        pd.DataFrame(rows, columns=["src", "dst"]).assign(weight=1.0)
    )
    seeds = spark.createDataFrame(
        pd.DataFrame({"id": [0, 7], "label": [100, 200]})
    )
    out = {r["id"]: r["label"] for r in
           label_spreading(spark, e, seeds, max_iter=20).collect()}
    assert out[0] == 100 and out[7] == 200   # seeds never move
    assert out[1] == 100 and out[2] == 100   # left clique adopts left seed
    assert out[5] == 200 and out[6] == 200   # right clique adopts right
    # the disconnected pair 8-9 is unreachable from any seed -> NULL
    assert out[8] is None and out[9] is None


def test_diameter_double_sweep_exact_on_path(spark):
    from leidenalg_spark.operators.kernels import diameter_approx

    # path 0-1-2-3-4 plus a hub fan at 2: max-degree start = 2,
    # sweep1 reaches an end (dist 2), sweep2 spans the path (dist 4)
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (2, 5), (2, 6)]
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )
    row = diameter_approx(spark, e, max_depth=8).first()
    assert row["start_id"] == 2
    assert row["sweep1_dist"] == 2 and row["sweep1_end"] == 0
    assert row["diameter_lb"] == 4 and row["sweep2_end"] == 4


def test_wl_refinement_degree_classes_then_stable(spark):
    from leidenalg_spark.operators.kernels import wl_refinement

    # triangle 0-1-2 with a pendant 3 on 0: stable WL classes are
    # {0} (deg 3), {1,2} (deg-2 twins), {3} (deg 1)
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0), (0, 3, 1.0)],
        "src long, dst long, weight double",
    )
    for rounds in (1, 2, 3):
        c = {r["id"]: r["color"] for r in wl_refinement(spark, e, rounds=rounds).collect()}
        assert c[1] == c[2]
        assert len({c[0], c[1], c[3]}) == 3


def test_wl_refinement_rounds_only_split_classes(spark):
    from leidenalg_spark.operators.kernels import wl_refinement

    # deterministic 30-vertex graph: ring + chords
    pairs = {(i, (i + 1) % 30) for i in range(30)}
    pairs |= {(i, (i * i + 1) % 30) for i in range(30)}
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs if a != b], "src long, dst long, weight double"
    )
    c1 = {r["id"]: r["color"] for r in wl_refinement(spark, e, rounds=1).collect()}
    c2 = {r["id"]: r["color"] for r in wl_refinement(spark, e, rounds=2).collect()}
    assert set(c1) == set(c2)
    # refinement: same round-2 color implies same round-1 color, and the
    # class count never decreases
    m = {}
    for v, col2 in c2.items():
        assert m.setdefault(col2, c1[v]) == c1[v]
    assert len(set(c2.values())) >= len(set(c1.values()))


def test_transitivity_global_triangle_with_pendant(spark):
    from leidenalg_spark.operators.kernels import transitivity_global

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0), (0, 3, 1.0)],
        "src long, dst long, weight double",
    )
    row = transitivity_global(spark, e).first()
    # degrees 3,2,2,1 -> wedges 3+1+1 = 5; one triangle -> C = 3/5
    assert row["n_triangles"] == 1 and row["n_wedges"] == 5
    assert abs(row["transitivity"] - 0.6) < 1e-6


def test_avg_distance_path_graph(spark):
    from leidenalg_spark.operators.kernels import avg_distance

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)], "src long, dst long, weight double"
    )
    row = avg_distance(spark, e, max_dist=2).first()
    # ordered pairs: 6 at d=1, 4 at d=2 -> avg = 14/10
    assert row["n_pairs"] == 10
    assert abs(row["avg_distance"] - 1.4) < 1e-6


def test_graph_summary_golden(spark):
    from leidenalg_spark.operators.edges import graph_summary

    # triangle + pendant + one self-loop + one duplicate edge row
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 0, 2.0), (1, 2, 1.0), (0, 2, 1.0), (0, 3, 1.0), (2, 2, 4.0)],
        "src long, dst long, weight double",
    )
    r = graph_summary(e).first()
    assert r["n_vertices"] == 4 and r["n_edges"] == 4 and r["n_self_loops"] == 1
    assert abs(r["total_weight"] - 10.0) < 1e-6
    assert abs(r["density"] - 4 / 6) < 1e-6
    assert abs(r["avg_degree"] - 2.0) < 1e-6 and r["max_degree"] == 3


def test_coreness_k4_with_tail(spark):
    from leidenalg_spark.operators.kernels import coreness, k_core

    # K4 on {0..3} with a tail 3-4-5: core numbers 3,3,3,3,1,1
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )
    out = {r["id"]: r["coreness"] for r in coreness(spark, e, rounds=8).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3, 4: 1, 5: 1}
    # consistency: the 3-core subgraph is exactly {coreness >= 3}
    k3 = {r["id"] for r in k_core(spark, e, k=3, rounds=8).collect()}
    assert k3 == {v for v, c in out.items() if c >= 3}


def test_coreness_triangle_chain(spark):
    from leidenalg_spark.operators.kernels import coreness

    # two triangles joined by a PENDANT path (3-7, 7-4 chain has degree-1
    # cascade only at the dangling end): triangles are 2-core, the
    # chain 3-7 peels to 1 (vertex 3 hangs off triangle {0,1,2})
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 7), (4, 5), (5, 6), (4, 6)]
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )
    out = {r["id"]: r["coreness"] for r in coreness(spark, e, rounds=8).collect()}
    assert out == {0: 2, 1: 2, 2: 2, 3: 1, 7: 1, 4: 2, 5: 2, 6: 2}


def test_ppr_sweep_recovers_planted_clique(spark):
    from leidenalg_spark.operators.kernels import ppr_sweep

    # two K5s joined by one bridge edge; seed vertex 0 in clique A
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(i, j) for i in range(5, 10) for j in range(i + 1, 10)]
    edges += [(4, 5)]
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )
    curve = ppr_sweep(spark, e, [0], m=10).collect()
    by_pos = {r["pos"]: r for r in curve}
    # the first 5 sweep positions are exactly clique A
    assert {by_pos[p]["id"] for p in range(1, 6)} == {0, 1, 2, 3, 4}
    # conductance bottoms out at the clique boundary: cut 1, vol 21
    # the all-vertices prefix has min(vol, tot-vol) = 0 -> NULL by design
    best = min(
        (r for r in curve if r["conductance"] is not None),
        key=lambda r: (r["conductance"], r["pos"]),
    )
    assert best["pos"] == 5
    assert abs(best["conductance"] - 1 / 21) < 1e-6
    assert best["cut_w"] == 1.0 and best["vol_w"] == 21.0


def test_katz_centrality_star_and_pendant_mass(spark):
    from leidenalg_spark.operators.kernels import katz_centrality

    # star: centre 0 with 4 leaves; alpha=0.1
    e = spark.createDataFrame(
        [(0, i, 1.0) for i in range(1, 5)], "src long, dst long, weight double"
    )
    out = {r["id"]: r["centrality"] for r in
           katz_centrality(spark, e, alpha=0.1, max_iter=20).collect()}
    # fixed point: c0 = 1 + 0.4*cl, cl = 1 + 0.1*c0 -> c0 = 1.4/0.96
    assert out[0] == pytest.approx(1.4 / 0.96, abs=1e-4)
    assert out[1] == pytest.approx(1 + 0.1 * 1.4 / 0.96, abs=1e-4)
    assert out[1] == out[2] == out[3] == out[4]
    # unlike eigenvector centrality, an isolated-ish pendant still has
    # beta mass: all values >= 1
    assert all(v >= 1.0 for v in out.values())


def test_spanning_forest_cycle_drops_heaviest(spark):
    from leidenalg_spark.operators.kernels import spanning_forest

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 3.0), (3, 0, 9.0)],
        "src long, dst long, weight double",
    )
    got = {(r["src"], r["dst"]): r["weight"] for r in spanning_forest(spark, e).collect()}
    assert got == {(0, 1): 1.0, (1, 2): 2.0, (2, 3): 3.0}


def test_spanning_forest_two_components(spark):
    from leidenalg_spark.operators.kernels import spanning_forest

    # two disjoint triangles: MSF = 2 edges per triangle (drop heaviest)
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 5.0), (10, 11, 1.0), (11, 12, 1.5), (10, 12, 4.0)],
        "src long, dst long, weight double",
    )
    got = {(r["src"], r["dst"]) for r in spanning_forest(spark, e).collect()}
    assert got == {(0, 1), (1, 2), (10, 11), (11, 12)}


def test_spanning_forest_matches_kruskal_twin(spark):
    import hashlib

    from leidenalg_spark.operators.kernels import spanning_forest

    # deterministic 60-vertex graph with DISTINCT md5 weights -> the MST
    # is unique, so the edge SETS must match exactly
    pairs = sorted({(i, (i + 1) % 60) for i in range(60)}
                   | {(min(i, (i * 7 + 3) % 60), max(i, (i * 7 + 3) % 60))
                      for i in range(60) if i != (i * 7 + 3) % 60})
    rows = [
        (a, b, 1 + int(hashlib.md5(f"{a}:{b}".encode()).hexdigest()[:8], 16) % 997)
        for a, b in pairs
    ]
    # ensure distinct weights by nudging duplicates deterministically
    seen, uniq = set(), []
    for a, b, w in rows:
        while w in seen:
            w += 1009
        seen.add(w)
        uniq.append((a, b, float(w)))
    e = spark.createDataFrame(uniq, "src long, dst long, weight double")
    got = {(r["src"], r["dst"]) for r in spanning_forest(spark, e).collect()}

    # Kruskal twin with union-find
    parent = list(range(60))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    exp = set()
    for a, b, w in sorted(uniq, key=lambda t: t[2]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            exp.add((min(a, b), max(a, b)))
    assert got == exp and len(got) == 59


def test_shortest_path_grid_min_id_ties(spark):
    from leidenalg_spark.operators.kernels import shortest_path

    # diamond 0-{1,2}-3 plus tail 3-4: two length-2 paths to 3, the
    # min-id parent rule must pick the one through 1
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )
    p = {r["step"]: r["id"] for r in shortest_path(spark, e, 0, 4).collect()}
    assert p == {0: 0, 1: 1, 2: 3, 3: 4}


def test_shortest_path_unreachable_is_empty(spark):
    from leidenalg_spark.operators.kernels import shortest_path

    e = spark.createDataFrame(
        [(0, 1, 1.0), (5, 6, 1.0)], "src long, dst long, weight double"
    )
    assert shortest_path(spark, e, 0, 6, max_depth=4).count() == 0


def test_topological_levels_dag_golden(spark):
    from leidenalg_spark.operators.kernels import topological_levels

    # diamond 0→{1,2}→3→4 plus shortcut 0→3: level = LONGEST path depth,
    # so 3 sits at level 2 (via 1 or 2), not 1 (via the shortcut)
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (0, 3)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.level for r in topological_levels(spark, e).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}


def test_topological_levels_cycle_marks_minus_one(spark):
    from leidenalg_spark.operators.kernels import topological_levels

    # 0→1→2→1 cycle with 2→3 downstream: only 0 peels; the cycle
    # members AND their descendant 3 must come back as -1 (not a DAG)
    edges = [(0, 1), (1, 2), (2, 1), (2, 3)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.level for r in topological_levels(spark, e).collect()}
    assert got == {0: 0, 1: -1, 2: -1, 3: -1}


def test_voronoi_cells_path_tiebreak(spark):
    from leidenalg_spark.operators.kernels import voronoi_cells

    # path 0-1-2-3-4, seeds {0, 4}: vertex 2 is dist-2 from both seeds —
    # the tie must break to the smaller seed id 0
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,), (4,)], "id long")
    got = {r.id: (r.seed, r.dist) for r in voronoi_cells(spark, e, seeds).collect()}
    assert got == {0: (0, 0), 4: (4, 0), 1: (0, 1), 3: (4, 1), 2: (0, 2)}


def test_voronoi_cells_max_dist_excludes_far(spark):
    from leidenalg_spark.operators.kernels import voronoi_cells

    # chain 0-1-2-3, seed {0}, max_dist=2: vertex 3 is unassigned
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    seeds = spark.createDataFrame([(0,), ], "id long")
    got = {r.id: r.dist for r in voronoi_cells(spark, e, seeds, max_dist=2).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_maximal_matching_valid_and_maximal(spark):
    from leidenalg_spark.operators.kernels import maximal_matching
    from leidenalg_spark.sources.generators import erdos_renyi_gnm

    e = erdos_renyi_gnm(spark, 32, 100, seed=3).select("src", "dst")
    rows = maximal_matching(spark, e, seed=7).collect()
    verts = [v for r in rows for v in (r.a, r.b)]
    # valid: no vertex matched twice
    assert len(verts) == len(set(verts))
    # maximal: every canonical edge touches a matched endpoint
    und = (
        e.selectExpr("least(src,dst) a", "greatest(src,dst) b")
        .where("a<>b").distinct().collect()
    )
    mset = set(verts)
    assert all((r.a in mset) or (r.b in mset) for r in und)
    # deterministic
    again = maximal_matching(spark, e, seed=7).collect()
    assert sorted((r.a, r.b, r.round) for r in rows) == sorted(
        (r.a, r.b, r.round) for r in again
    )


def test_maximal_matching_triangle_single_edge(spark):
    from leidenalg_spark.operators.kernels import maximal_matching

    # a triangle admits exactly one matched edge, in round 1
    e = spark.createDataFrame([(0, 1), (1, 2), (0, 2)], "src long, dst long")
    rows = maximal_matching(spark, e).collect()
    assert len(rows) == 1 and rows[0].round == 1


def test_dyad_census_golden(spark):
    from leidenalg_spark.operators.kernels import dyad_census

    # 0<->1 mutual, 0->2 asym, vertex 3 via 3->0: n=4, C(4,2)=6 dyads
    e = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 2), (3, 0)], "src long, dst long"
    )
    r = dyad_census(spark, e).collect()[0]
    assert (r.n_mutual, r.n_asym, r.n_null) == (1, 2, 3)


def test_power_law_fit_star_golden(spark):
    import math
    from leidenalg_spark.operators.kernels import power_law_fit

    # star: hub degree 6, leaves degree 1; xmin=1 keeps all 7 vertices —
    # alpha = 1 + 7 / (6*ln(1/0.5) + ln(6/0.5))
    e = spark.createDataFrame([(0, i) for i in range(1, 7)], "src long, dst long")
    r = power_law_fit(spark, e, xmin=1).collect()[0]
    exp = 1.0 + 7.0 / (6 * math.log(1 / 0.5) + math.log(6 / 0.5))
    assert r.n_tail == 7 and abs(r.alpha - exp) < 1e-6 and 0.0 <= r.ks <= 1.0


def test_eccentricity_path_golden(spark):
    from leidenalg_spark.operators.kernels import eccentricity

    # path 0-1-2-3-4 truncated at 3: middle vertex 2 has exact ecc 2,
    # ends report the truncation bound 3 with partial reach
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long")
    got = {r.id: (r.ecc, r.n_reachable) for r in eccentricity(spark, e, max_dist=3).collect()}
    assert got == {0: (3, 3), 1: (3, 4), 2: (2, 4), 3: (3, 4), 4: (3, 3)}


def test_dice_coefficient_square_golden(spark):
    from leidenalg_spark.operators.kernels import dice_coefficient

    # square 0-1-2-3-0: non-adjacent diagonals (0,2) and (1,3) share 2
    # neighbours, all degrees 2 -> dice = 2*2/(2+2) = 1.0
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (0, 3)], "src long, dst long")
    got = {(r.src, r.dst): (r.n_common, r.dice) for r in dice_coefficient(spark, e).collect()}
    assert got == {(0, 2): (2, 1.0), (1, 3): (2, 1.0)}


def test_attack_curve_star_collapse(spark):
    from leidenalg_spark.operators.kernels import attack_curve

    # star with 9 leaves: at f=0.2 (2 removed: hub first) nothing survives
    e = spark.createDataFrame([(0, i) for i in range(1, 10)], "src long, dst long")
    rows = {r.frac: (r.n_removed, r.n_vertices, r.n_edges, r.n_components, r.lcc_size)
            for r in attack_curve(spark, e, fractions=(0.0, 0.2)).collect()}
    assert rows[0.0] == (0, 10, 9, 1, 10)
    assert rows[0.2] == (2, 0, 0, 0, 0)


def test_clique_census_goldens(spark):
    from leidenalg_spark.operators.kernels import clique_census

    # K4: 6 edges, 4 triangles, 1 four-clique
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    r = clique_census(spark, spark.createDataFrame(k4, "src long, dst long")).collect()[0]
    assert (r.n_edges, r.n_triangles, r.n_k4) == (6, 4, 1)
    # K5: 10 edges, C(5,3)=10 triangles, C(5,4)=5 four-cliques
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    r = clique_census(spark, spark.createDataFrame(k5, "src long, dst long")).collect()[0]
    assert (r.n_edges, r.n_triangles, r.n_k4) == (10, 10, 5)
    # square (no diagonals): no triangles, no K4
    sq = [(0, 1), (1, 2), (2, 3), (0, 3)]
    r = clique_census(spark, spark.createDataFrame(sq, "src long, dst long")).collect()[0]
    assert (r.n_edges, r.n_triangles, r.n_k4) == (4, 0, 0)


def test_sssp_weighted_prefers_cheap_detour(spark):
    from leidenalg_spark.operators.kernels import sssp_weighted

    # direct 0-2 costs 10; detour 0-1-2 costs 3 — weighted SSSP must
    # take the longer-hop cheaper path
    e = spark.createDataFrame(
        [(0, 2, 10.0), (0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    got = {r.id: r.dist for r in sssp_weighted(spark, e, 0).collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 3.0, 3: 4.0}


def test_sssp_weighted_rejects_nonpositive(spark):
    import pytest as _pytest
    from leidenalg_spark.operators.kernels import sssp_weighted

    e = spark.createDataFrame([(0, 1, -1.0)], "src long, dst long, weight double")
    with _pytest.raises(ValueError):
        sssp_weighted(spark, e, 0)


def test_bipartiteness_even_vs_odd_cycle(spark):
    from leidenalg_spark.operators.kernels import bipartiteness

    # square (even cycle, bipartite) + disjoint triangle (odd, not)
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 3), (10, 11), (11, 12), (10, 12)],
        "src long, dst long",
    )
    got = {r.component: (r.n_vertices, r.is_bipartite)
           for r in bipartiteness(spark, e).collect()}
    assert got == {0: (4, True), 10: (3, False)}


def test_failure_vs_attack_contrast(spark):
    from leidenalg_spark.operators.kernels import attack_curve

    # star with 19 leaves: targeted attack at f=0.05 (1 vertex) kills
    # the hub and everything; random failure with this seed removes a
    # leaf and the star survives
    e = spark.createDataFrame([(0, i) for i in range(1, 20)], "src long, dst long")
    atk = {r.frac: r for r in attack_curve(spark, e, fractions=(0.05,)).collect()}
    rnd = {r.frac: r for r in attack_curve(
        spark, e, fractions=(0.05,), strategy="random", seed=42).collect()}
    assert atk[0.05].n_edges == 0 and atk[0.05].lcc_size == 0
    assert rnd[0.05].n_removed == 1
    if 0 not in {rnd[0.05].n_edges}:  # hub survived this seed
        assert rnd[0.05].n_edges == 18 and rnd[0.05].lcc_size == 19


def test_core_periphery_fit_goldens(spark):
    from leidenalg_spark.operators.kernels import core_periphery_fit

    # ideal structure: core {0,1} complete + tied everywhere, periphery
    # {2,3,4} independent -> phi = 1; swapping roles fits negatively
    edges = [(0, 1)] + [(c, p) for c in (0, 1) for p in (2, 3, 4)]
    e = spark.createDataFrame(edges, "src long, dst long")
    good = core_periphery_fit(spark, e, spark.createDataFrame([(0,), (1,)], "id long")).collect()[0]
    assert good.phi == 1.0 and good.edges_pp == 0
    bad = core_periphery_fit(spark, e, spark.createDataFrame([(2,), (3,), (4,)], "id long")).collect()[0]
    assert bad.phi < 0
    # degenerate: everyone core -> contingency collapses -> NULL phi
    allc = core_periphery_fit(spark, e, spark.createDataFrame([(i,) for i in range(5)], "id long")).collect()[0]
    assert allc.phi is None


def test_edge_clustering_triangle_plus_pendant(spark):
    from leidenalg_spark.operators.kernels import edge_clustering

    # triangle 0-1-2 with pendant 2-3: triangle edges have t=1; edge
    # (0,1): min(deg)=2 -> ecc = 2/1 = 2; (1,2)/(0,2): min(deg 2, 3)-1=1
    # -> 2; pendant (2,3): min(deg)-1 = 0 -> NULL
    e = spark.createDataFrame([(0, 1), (1, 2), (0, 2), (2, 3)], "src long, dst long")
    got = {(r.a, r.b): (r.n_triangles, r.ecc) for r in edge_clustering(spark, e).collect()}
    assert got == {(0, 1): (1, 2.0), (1, 2): (1, 2.0), (0, 2): (1, 2.0), (2, 3): (0, None)}


def test_molloy_reed_star_golden(spark):
    from leidenalg_spark.operators.kernels import molloy_reed

    # star, 6 leaves: degrees [6,1×6]; <k>=12/7, <k2>=42/7=6, kappa=3.5
    e = spark.createDataFrame([(0, i) for i in range(1, 7)], "src long, dst long")
    r = molloy_reed(spark, e).collect()[0]
    assert r.n_vertices == 7 and r.kappa == 3.5
    assert r.f_c == 0.6  # 1 - 1/(3.5-1)


def test_knnk_star_golden(spark):
    from leidenalg_spark.operators.kernels import knnk

    # star, 5 leaves: leaves (deg 1) have knn 5; hub (deg 5) has knn 1
    e = spark.createDataFrame(
        [(0, i, 1.0) for i in range(1, 6)], "src long, dst long, weight double"
    )
    got = {r.degree: (r.n_vertices, r.knnk) for r in knnk(spark, e).collect()}
    assert got == {1: (5, 5.0), 5: (1, 1.0)}


def test_degree_gini_goldens(spark):
    from leidenalg_spark.operators.kernels import degree_gini

    # ring: all degrees equal -> gini 0
    ring = spark.createDataFrame([(i, (i + 1) % 6) for i in range(6)], "src long, dst long")
    assert degree_gini(spark, ring).collect()[0].gini == 0.0
    # star, 6 leaves: degrees [1x6, 6] -> G = 2*63/(7*12) - 8/7 = 0.357143
    star = spark.createDataFrame([(0, i) for i in range(1, 7)], "src long, dst long")
    r = degree_gini(spark, star).collect()[0]
    assert r.n_vertices == 7 and abs(r.gini - 0.357143) < 1e-6


def test_balance_census_goldens(spark):
    from leidenalg_spark.operators.kernels import balance_census

    # triangle with one negative edge: unbalanced (++-)
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, -1.0)], "src long, dst long, weight double"
    )
    r = balance_census(spark, e).collect()[0]
    assert (r.n_ppp, r.n_ppm, r.n_pmm, r.n_mmm) == (0, 1, 0, 0)
    assert r.balance_ratio == 0.0
    # two-negative triangle is balanced (enemy of my enemy)
    e2 = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, -1.0), (0, 2, -1.0)], "src long, dst long, weight double"
    )
    r2 = balance_census(spark, e2).collect()[0]
    assert r2.n_pmm == 1 and r2.balance_ratio == 1.0
    # opposite-direction signs cancel: the (0,1) pair drops, no triangle
    e3 = spark.createDataFrame(
        [(0, 1, 1.0), (1, 0, -1.0), (1, 2, 1.0), (0, 2, 1.0)],
        "src long, dst long, weight double",
    )
    assert balance_census(spark, e3).collect()[0].n_triangles == 0


def test_butterfly_census_goldens(spark):
    from leidenalg_spark.operators.kernels import butterfly_census

    # complete 2x3 biclique: butterflies = C(3,2)=3 (pairs of right
    # endpoints shared by the two left vertices); wedges = 2*C(3,2)=6;
    # caterpillars = sum over 6 edges of (2-1)*(3-1)... ld=3, rd=2 →
    # (3-1)*(2-1)=2 each → 12; bcc = 4*3/12 = 1.0 (fully clustered)
    e = spark.createDataFrame(
        [(0, 101), (0, 103), (0, 105), (2, 101), (2, 103), (2, 105)],
        "src long, dst long",
    )
    r = butterfly_census(spark, e).collect()[0]
    assert (r.n_left, r.n_right, r.n_edges) == (2, 3, 6)
    assert r.butterflies == 3 and r.wedges == 6 and r.caterpillars == 12
    assert r.bcc == 1.0

    # star (one left hub, 4 right leaves): wedges exist, no butterfly
    star = spark.createDataFrame(
        [(0, 101), (0, 103), (0, 105), (0, 107)], "src long, dst long"
    )
    r2 = butterfly_census(spark, star).collect()[0]
    assert r2.butterflies == 0 and r2.wedges == 6
    assert r2.caterpillars == 0 and r2.bcc == 0.0

    # duplicate arcs collapse before counting
    dup = spark.createDataFrame(
        [(0, 101), (0, 101), (0, 103), (2, 101), (2, 103), (2, 103)],
        "src long, dst long",
    )
    r3 = butterfly_census(spark, dup).collect()[0]
    assert r3.n_edges == 4 and r3.butterflies == 1 and r3.bcc == 1.0


def test_line_graph_goldens(spark):
    from leidenalg_spark.operators.kernels import line_graph

    # path 1→2→3: exactly one line edge (1,2)→(2,3)
    p = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    assert [tuple(r) for r in line_graph(spark, p).collect()] == [(1, 2, 3)]

    # 2-cycle: (1,2)→(2,1) and (2,1)→(1,2) — the reverse hop included
    c = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    got = sorted(tuple(r) for r in line_graph(spark, c).collect())
    assert got == [(1, 2, 1), (2, 1, 2)]

    # hub guard: via vertex with indeg or outdeg above the cap drops
    # from the VIA slot (star through center 9: 2 in, 2 out → 4 line
    # edges uncapped, 0 with cap=1)
    star = spark.createDataFrame(
        [(1, 9), (2, 9), (9, 3), (9, 4)], "src long, dst long"
    )
    assert line_graph(spark, star).count() == 4
    assert line_graph(spark, star, max_via_degree=1).count() == 0


def test_salsa_goldens(spark):
    from leidenalg_spark.operators.kernels import salsa

    # 2-cycle is already stationary: every score 0.5
    c = spark.createDataFrame([(1, 2, 1.0), (2, 1, 1.0)], "src long, dst long, weight double")
    got = {r.id: (r.hub, r.authority) for r in salsa(spark, c).collect()}
    assert got == {1: (0.5, 0.5), 2: (0.5, 0.5)}

    # in-star: the sink soaks ALL authority, hubs split it by the walk
    s = spark.createDataFrame([(1, 9, 1.0), (2, 9, 1.0)], "src long, dst long, weight double")
    got = {r.id: (r.hub, r.authority) for r in salsa(spark, s).collect()}
    assert got[9] == (0.0, 1.0)
    assert got[1] == (0.5, 0.0) and got[2] == (0.5, 0.0)

    # scores are probability distributions: each side sums to 1
    g = spark.createDataFrame(
        [(1, 3, 1.0), (2, 3, 1.0), (1, 4, 1.0)], "src long, dst long, weight double"
    )
    rows = salsa(spark, g).collect()
    assert abs(sum(r.hub for r in rows) - 1.0) < 1e-6
    assert abs(sum(r.authority for r in rows) - 1.0) < 1e-6
    byid = {r.id: r for r in rows}
    assert byid[3].authority > byid[4].authority  # indegree order preserved


def test_markov_chain_stats_goldens(spark):
    from leidenalg_spark.operators.kernels import markov_chain_stats

    # deterministic 2-cycle: next state is always known → 0 bits,
    # perplexity 1; stationary is uniform over 2 states → 1 bit
    c = spark.createDataFrame(
        [(1, 2, 5.0), (2, 1, 5.0)], "src long, dst long, weight double"
    )
    r = markov_chain_stats(spark, c).collect()[0]
    assert (r.n_states, r.n_transitions) == (2, 10)
    assert r.entropy_rate_bits == 0.0 and r.perplexity == 1.0
    assert r.stationary_entropy_bits == 1.0

    # fair coin from one state: 1 bit/step, perplexity 2
    coin = spark.createDataFrame(
        [(1, 2, 3.0), (1, 3, 3.0)], "src long, dst long, weight double"
    )
    r2 = markov_chain_stats(spark, coin).collect()[0]
    assert r2.entropy_rate_bits == 1.0 and r2.perplexity == 2.0
    assert r2.n_states == 3


def test_assortativity_numeric_goldens(spark):
    from leidenalg_spark.operators.kernels import assortativity_numeric

    def run(edges, vals):
        e = spark.createDataFrame(edges, "src long, dst long, weight double")
        v = spark.createDataFrame(vals, "id long, x double")
        return assortativity_numeric(spark, e, v).collect()[0].assortativity

    # perfectly assortative: like links to like
    r = run([(1, 2, 1.0), (3, 4, 1.0)], [(1, 0.0), (2, 0.0), (3, 5.0), (4, 5.0)])
    assert r == 1.0
    # perfectly disassortative: high always links low
    r = run([(1, 2, 1.0), (2, 1, 1.0)], [(1, 0.0), (2, 5.0)])
    assert r == -1.0
    # constant attribute: zero variance → NULL
    r = run([(1, 2, 1.0), (2, 3, 1.0)], [(1, 7.0), (2, 7.0), (3, 7.0)])
    assert r is None


def test_graph_center_goldens(spark):
    from leidenalg_spark.operators.kernels import graph_center

    # path 1-2-3-4-5: center {3} with radius 2, diameter 4
    p = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(1, 5)], "src long, dst long, weight double"
    )
    rows = graph_center(spark, p, max_dist=8).collect()
    assert [(r.id, r.radius, r.diameter_lb) for r in rows] == [(3, 2, 4)]

    # star: the hub is the unique center with radius 1
    s = spark.createDataFrame(
        [(0, i, 1.0) for i in range(1, 5)], "src long, dst long, weight double"
    )
    rows = graph_center(spark, s, max_dist=8).collect()
    assert [(r.id, r.radius, r.diameter_lb) for r in rows] == [(0, 1, 2)]


def test_graph_sparsify_goldens(spark):
    from leidenalg_spark.operators.kernels import graph_sparsify

    # path graph: every edge touches a degree<=2 endpoint, so with c=4
    # p_keep = 1 everywhere — nothing drops, weights unchanged
    p = spark.createDataFrame(
        [(i, i + 1, 2.0) for i in range(1, 6)], "src long, dst long, weight double"
    )
    out = graph_sparsify(spark, p, c=4.0).collect()
    assert len(out) == 5
    assert all(r.p_keep == 1.0 and r.weight == 2.0 for r in out)

    # dense hub-hub core with a tiny c: some edges drop, survivors are
    # upweighted by exactly 1/p (unbiasedness), run is deterministic
    k = [(i, j, 1.0) for i in range(20) for j in range(i + 1, 20)]
    dense = spark.createDataFrame(k, "src long, dst long, weight double")
    s1 = graph_sparsify(spark, dense, c=0.5).collect()
    s2 = graph_sparsify(spark, dense, c=0.5).collect()
    assert 0 < len(s1) < len(k)
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    for r in s1:
        assert abs(r.weight * r.p_keep - 1.0) < 1e-5


def test_wl_kernel_drift_isomorphism_and_churn(spark):
    """WL-kernel slice similarity: identical structure scores exactly 1.0,
    an id-relabelled ISOMORPHIC copy still scores 1.0 (the kernel sees
    structure, not ids), and a rewired slice scores < 1."""
    from pyspark.sql import functions as F

    from leidenalg_spark.operators.kernels import wl_kernel_drift

    tri = [(0, 1), (1, 2), (2, 0)]            # triangle
    path = [(0, 1), (1, 2)]                   # path (same vertex count lives in slice)
    rows = []
    rows += [(0, a, b) for a, b in tri]                      # slice 0: triangle
    rows += [(1, a + 100, b + 100) for a, b in tri]          # slice 1: relabelled triangle
    rows += [(2, a, b) for a, b in path] + [(2, 3, 4)]       # slice 2: path + extra edge
    sl = spark.createDataFrame(rows, "slice long, src long, dst long")
    got = {(r.slice_a, r.slice_b): r for r in wl_kernel_drift(sl, rounds=2).collect()}
    assert got[(0, 1)].wl_similarity == 1.0                  # isomorphic, relabelled
    assert got[(1, 2)].wl_similarity < 1.0                   # structure changed
    assert got[(0, 1)].n_vertices_a == 3 and got[(0, 1)].n_vertices_b == 3
    assert got[(1, 2)].n_vertices_b == 5


def test_wl_kernel_drift_degree_preserving_rewire_detected(spark):
    """Same degree sequence, different deeper structure: P6 vs
    (triangle + P3) share the degree histogram (four 2s, two 1s) so
    round 1 agrees fully; round 2 must separate them.  Also pin the
    classic 1-WL blind spot: two triangles vs a 6-cycle are 2-regular
    and WL-INDISTINGUISHABLE — similarity exactly 1.0 by design."""
    from leidenalg_spark.operators.kernels import wl_kernel_drift

    p6 = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]
    tri_p3 = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5)]
    rows = [(0, a, b) for a, b in p6] + [(1, a, b) for a, b in tri_p3]
    sl = spark.createDataFrame(rows, "slice long, src long, dst long")
    r = wl_kernel_drift(sl, rounds=2).collect()[0]
    # rounds 0 and 1 fully agree (6 + 6), round 2 shares 4 of 6 colors
    assert abs(r.wl_similarity - (6 + 6 + 4) / 3.0 / 6.0) < 1e-6  # output rounds to 6dp

    tri2 = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]
    cyc6 = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0)]
    rows = [(0, a, b) for a, b in tri2] + [(1, a, b) for a, b in cyc6]
    sl = spark.createDataFrame(rows, "slice long, src long, dst long")
    r = wl_kernel_drift(sl, rounds=2).collect()[0]
    assert r.wl_similarity == 1.0  # 2-regular pair: 1-WL cannot separate


def test_edge_lift_triangle_golden(spark):
    """Weighted triangle, hand-computed configuration-model lifts."""
    from leidenalg_spark.operators.kernels import edge_lift

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 2.0)], "src long, dst long, weight double"
    )
    out = {(r.src, r.dst): r for r in edge_lift(e).collect()}
    # strengths k0=3, k1=2, k2=3, 2W=8
    assert abs(out[(0, 1)].expected - 0.75) < 1e-6
    assert abs(out[(0, 1)].lift - 1.0 / 0.75) < 1e-6
    assert abs(out[(0, 2)].expected - 1.125) < 1e-6
    assert abs(out[(0, 2)].lift - 2.0 / 1.125) < 1e-6
    import math
    assert abs(out[(1, 2)].log2_lift - math.log2(1.0 / 0.75)) < 1e-5
    assert len(edge_lift(e, min_lift=1.5).collect()) == 1


def test_edge_lift_directed(spark):
    """Directed null uses k_out(u)·k_in(v)/W and ignores self-loops."""
    from leidenalg_spark.operators.kernels import edge_lift

    e = spark.createDataFrame(
        [(0, 1, 2.0), (0, 2, 1.0), (1, 2, 1.0), (2, 2, 5.0)],
        "src long, dst long, weight double",
    )
    out = {(r.src, r.dst): r for r in edge_lift(e, directed=True).collect()}
    assert (2, 2) not in out
    # W=4 (loop dropped); k_out(0)=3, k_in(1)=2 → E=1.5, lift=2/1.5
    assert abs(out[(0, 1)].expected - 1.5) < 1e-6
    assert abs(out[(0, 1)].lift - 2.0 / 1.5) < 1e-6


def test_effective_diameter_path_graph(spark):
    """Path 0-1-2-3: NF = [6, 10, 12] ordered pairs; 90% target 10.8 →
    interpolated effective diameter 2 + 0.8/2 = 2.4."""
    from leidenalg_spark.operators.kernels import effective_diameter

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)], "src long, dst long, weight double"
    )
    rows = {r.dist: r for r in effective_diameter(spark, e, q=0.9, max_dist=3).collect()}
    assert [rows[d].n_pairs for d in (1, 2, 3)] == [6, 10, 12]
    assert abs(rows[1].effective_diameter - 2.4) < 1e-6
    assert abs(rows[3].frac - 1.0) < 1e-6
    # HLL path: counts are exact at this size (datasketches early modes)
    rows_h = {r.dist: r for r in
              effective_diameter(spark, e, q=0.9, max_dist=3, method="hll").collect()}
    assert [rows_h[d].n_pairs for d in (1, 2, 3)] == [6, 10, 12]
    assert abs(rows_h[1].effective_diameter - 2.4) < 1e-6


def test_triangle_significance_k4_golden(spark):
    """K4: T=4, all degrees 3, m=6 → e3 = C(4,3)·9³ = 2916,
    E[T] = 2916/12³ = 1.6875, ratio = 2.370370."""
    from leidenalg_spark.operators.kernels import triangle_significance

    e = spark.createDataFrame(
        [(a, b, 1.0) for a in range(4) for b in range(a + 1, 4)],
        "src long, dst long, weight double",
    )
    r = triangle_significance(spark, e).collect()[0]
    assert r.n_triangles == 4
    assert abs(r.expected_config - 1.6875) < 1e-6
    assert abs(r.ratio - round(4 / 1.6875, 6)) < 1e-6
    import math
    assert abs(r.z_poisson - round((4 - 1.6875) / math.sqrt(1.6875), 6)) < 1e-6


def test_landmark_distances_path_all_landmarks(spark):
    """Path 0-1-2-3-4 with every vertex a landmark, max_dist 2: exact
    hop distances, 19 reached pairs."""
    from leidenalg_spark.operators.kernels import landmark_distances

    e = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(4)], "src long, dst long, weight double"
    )
    rows = landmark_distances(spark, e, n_landmarks=5, max_dist=2).collect()
    d = {(r.id, r.landmark): r.dist for r in rows}
    assert len(rows) == 19
    assert d[(0, 0)] == 0 and d[(2, 0)] == 2 and (3, 0) not in d
    assert d[(1, 3)] == 2 and d[(4, 2)] == 2


def test_simrank_square_golden(spark):
    """4-cycle: opposite corners share both neighbours → s1 = 0.4,
    s2 = 0.8·(0.4+0.4+2)/4 = 0.56; adjacent pairs stay 0 (dropped)."""
    from leidenalg_spark.operators.kernels import simrank

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 0, 1.0)],
        "src long, dst long, weight double",
    )
    out = {(r.src, r.dst): r.simrank for r in simrank(spark, e).collect()}
    assert set(out) == {(0, 2), (1, 3)}
    assert abs(out[(0, 2)] - 0.56) < 1e-6 and abs(out[(1, 3)] - 0.56) < 1e-6


def test_bipartite_project_newman_weighting(spark):
    """Anchors X{1,2,3}, Y{1,2}, Z{1}: w(1,2) = 1/2 + 1/1 = 1.5,
    w(1,3) = w(2,3) = 0.5; the degree-1 anchor contributes nothing."""
    from leidenalg_spark.operators.edges import bipartite_project

    e = spark.createDataFrame(
        [(1, 100, 1.0), (2, 100, 1.0), (3, 100, 1.0),
         (1, 200, 1.0), (2, 200, 1.0), (1, 300, 1.0)],
        "src long, dst long, weight double",
    )
    out = {(r.src, r.dst): r.weight for r in
           bipartite_project(e, side="src", weighting="newman").collect()}
    assert out == {(1, 2): 1.5, (1, 3): 0.5, (2, 3): 0.5}


def test_nestedness_nodf_perfectly_nested(spark):
    """Fully nested bipartite ({A,B,C} ⊃ {A,B} ⊃ {A}): NODF = 100 on
    both sides."""
    from leidenalg_spark.operators.kernels import nestedness_nodf

    e = spark.createDataFrame(
        [(1, 10, 1.0), (1, 20, 1.0), (1, 30, 1.0),
         (2, 10, 1.0), (2, 20, 1.0), (3, 10, 1.0)],
        "src long, dst long, weight double",
    )
    r = nestedness_nodf(spark, e).collect()[0]
    assert r.nodf == 100.0 and r.nodf_src == 100.0 and r.nodf_dst == 100.0
    assert r.n_src == 3 and r.n_dst == 3


def test_two_edge_components_bridge_split(spark):
    """Two triangles joined by a bridge: the bridge separates them into
    two 2-edge-connected components."""
    from leidenalg_spark.operators.kernels import two_edge_components

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0),
         (3, 4, 1.0), (4, 5, 1.0), (3, 5, 1.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    comp = {r.id: r.component for r in two_edge_components(spark, e).collect()}
    assert comp[0] == comp[1] == comp[2]
    assert comp[3] == comp[4] == comp[5]
    assert comp[0] != comp[3]
