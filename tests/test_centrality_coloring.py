"""Round-2 centrality + colouring kernels vs exact Python twins.

- closeness_centrality: truncated Wasserman–Faust closeness vs a BFS twin.
- betweenness_centrality: bounded-distance Brandes vs a per-source
  BFS + dependency-accumulation twin; analytic goldens on star/path.
- greedy_coloring: Jones–Plassmann rounds vs a round-for-round twin;
  properness (no adjacent equal colours) on a random graph.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict, deque

import pytest

from leidenalg_spark.operators import kernels as K


def _md5_priority(seed, vid):
    return int(hashlib.md5(f"{seed}:{vid}".encode()).hexdigest()[:8], 16)


def _adj(pairs):
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    return adj


def _rand_graph(n=40, m=120, seed=7):
    """Deterministic hash-generated edge list (no random module state)."""
    pairs = set()
    i = 0
    while len(pairs) < m:
        h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        a, b = int(h[:8], 16) % n, int(h[8:16], 16) % n
        i += 1
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    return sorted(pairs)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b), 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _bfs(adj, s, max_dist):
    dist = {s: 0}
    sigma = {s: 1.0}
    order = [s]
    q = deque([s])
    while q:
        v = q.popleft()
        if dist[v] == max_dist:
            continue
        for w in sorted(adj[v]):
            if w not in dist:
                dist[w] = dist[v] + 1
                sigma[w] = 0.0
                q.append(w)
                order.append(w)
            if dist[w] == dist[v] + 1:
                sigma[w] += sigma[v]
    return dist, sigma, order


def _betweenness_twin(pairs, max_dist, sources=None):
    adj = _adj(pairs)
    verts = sorted(adj)
    bt = dict.fromkeys(verts, 0.0)
    for s in sources if sources is not None else verts:
        dist, sigma, order = _bfs(adj, s, max_dist)
        delta = dict.fromkeys(dist, 0.0)
        for v in reversed(order):
            for w in adj[v]:
                if dist.get(w) == dist[v] + 1:
                    delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if v != s:
                bt[v] += delta[v]
    return {v: bt[v] / 2.0 for v in verts}


def test_closeness_matches_bfs_twin(spark):
    pairs = _rand_graph()
    adj = _adj(pairs)
    verts = sorted(adj)
    n = len(verts)
    got = {
        r["id"]: (r["n_reachable"], r["sum_dist"], r["closeness"])
        for r in K.closeness_centrality(spark, _edges_df(spark, pairs), max_dist=3).collect()
    }
    for v in verts:
        dist, _, _ = _bfs(adj, v, 3)
        ball = {u: d for u, d in dist.items() if d > 0}
        r, sd = len(ball), float(sum(ball.values()))
        want = (r / (n - 1)) * (r / sd) if sd > 0 else 0.0
        assert got[v][0] == r
        assert got[v][1] == pytest.approx(sd)
        assert got[v][2] == pytest.approx(want, abs=1e-6)


def test_betweenness_star_golden(spark):
    # star K1,6: centre lies on every pair of leaves -> C(0) = 6*5/2 = 15
    pairs = [(0, i) for i in range(1, 7)]
    got = {
        r["id"]: r["betweenness"]
        for r in K.betweenness_centrality(spark, _edges_df(spark, pairs), max_dist=2).collect()
    }
    assert got[0] == pytest.approx(15.0)
    for leaf in range(1, 7):
        assert got[leaf] == pytest.approx(0.0)


def test_betweenness_path_golden(spark):
    # path 0-1-2-3-4, max_dist=4 (the diameter) == exact betweenness
    pairs = [(i, i + 1) for i in range(4)]
    got = {
        r["id"]: r["betweenness"]
        for r in K.betweenness_centrality(spark, _edges_df(spark, pairs), max_dist=4).collect()
    }
    assert got == pytest.approx({0: 0.0, 1: 3.0, 2: 4.0, 3: 3.0, 4: 0.0})


def test_betweenness_matches_brandes_twin(spark):
    pairs = _rand_graph()
    want = _betweenness_twin(pairs, max_dist=3)
    got = {
        r["id"]: r["betweenness"]
        for r in K.betweenness_centrality(spark, _edges_df(spark, pairs), max_dist=3).collect()
    }
    assert set(got) == set(want)
    for v, w in want.items():
        assert got[v] == pytest.approx(w, abs=1e-5), v


def test_betweenness_sampled_sources_deterministic_scaling(spark):
    pairs = _rand_graph()
    adj = _adj(pairs)
    verts = sorted(adj)
    k = 10
    srcs = sorted(verts, key=lambda v: (_md5_priority(42, v), v))[:k]
    want = _betweenness_twin(pairs, max_dist=3, sources=srcs)
    scale = len(verts) / k
    got = {
        r["id"]: r["betweenness"]
        for r in K.betweenness_centrality(
            spark, _edges_df(spark, pairs), max_dist=3, n_sources=k, seed=42
        ).collect()
    }
    for v in verts:
        assert got[v] == pytest.approx(want[v] * scale, abs=1e-5), v


def _coloring_twin(pairs, seed, rounds):
    adj = _adj(pairs)
    pri = {v: (_md5_priority(seed, v), v) for v in adj}
    active = set(adj)
    color = {}
    assigned_round = {}
    for r in range(1, rounds + 1):
        winners = [
            v for v in active
            if all(pri[v] < pri[u] for u in adj[v] if u in active)
        ]
        for v in winners:
            used = {color[u] for u in adj[v] if u in color}
            c = 0
            while c in used:
                c += 1
            color[v] = c
            assigned_round[v] = r
        active -= set(winners)
        if not active:
            break
    return color, assigned_round


def test_coloring_matches_twin_and_is_proper(spark):
    pairs = _rand_graph()
    adj = _adj(pairs)
    want_color, want_round = _coloring_twin(pairs, seed=42, rounds=100)
    rows = K.greedy_coloring(spark, _edges_df(spark, pairs), seed=42).collect()
    got = {r["id"]: (r["color"], r["round_assigned"]) for r in rows}
    assert set(got) == set(adj)
    for v in adj:
        assert got[v] == (want_color[v], want_round[v]), v
    # properness
    for a, b in pairs:
        assert got[a][0] != got[b][0], (a, b)
    # Δ+1 bound
    max_deg = max(len(adj[v]) for v in adj)
    assert max(c for c, _ in got.values()) <= max_deg


def test_coloring_round_prefix_mode(spark):
    pairs = _rand_graph()
    want_color, want_round = _coloring_twin(pairs, seed=42, rounds=2)
    rows = K.greedy_coloring(spark, _edges_df(spark, pairs), seed=42, rounds=2).collect()
    got = {r["id"]: (r["color"], r["round_assigned"]) for r in rows}
    assert got == {v: (want_color[v], want_round[v]) for v in want_color}


def test_edge_betweenness_goldens(spark):
    from leidenalg_spark.operators.kernels import edge_betweenness

    # path 0-1-2: both edges carry 2 paths; triangle: 1 each; square:
    # own pair + two half-weight diagonal paths = 2 each (igraph values)
    path = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {(r.a, r.b): r.betweenness for r in edge_betweenness(spark, path, max_dist=2).collect()}
    assert got == {(0, 1): 2.0, (1, 2): 2.0}
    tri = spark.createDataFrame([(0, 1), (1, 2), (0, 2)], "src long, dst long")
    got = {(r.a, r.b): r.betweenness for r in edge_betweenness(spark, tri, max_dist=2).collect()}
    assert got == {(0, 1): 1.0, (1, 2): 1.0, (0, 2): 1.0}
    sq = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (0, 3)], "src long, dst long")
    got = {(r.a, r.b): r.betweenness for r in edge_betweenness(spark, sq, max_dist=2).collect()}
    assert got == {(0, 1): 2.0, (1, 2): 2.0, (2, 3): 2.0, (0, 3): 2.0}


def test_edge_betweenness_star_and_sampling(spark):
    from leidenalg_spark.operators.kernels import edge_betweenness

    # star center 0, leaves 1..4: each edge carries the path to its leaf
    # (1) plus 3 leaf-leaf paths through it (3) = 4
    star = spark.createDataFrame([(0, i) for i in range(1, 5)], "src long, dst long")
    got = {(r.a, r.b): r.betweenness for r in edge_betweenness(spark, star, max_dist=2).collect()}
    assert got == {(0, i): 4.0 for i in range(1, 5)}
    # sampled-source mode returns all edges and non-negative values
    samp = edge_betweenness(spark, star, max_dist=2, n_sources=3, seed=1).collect()
    assert len(samp) == 4 and all(r.betweenness >= 0 for r in samp)
