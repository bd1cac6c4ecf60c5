"""Vertex biconnectivity: biconnected_components / articulation_points
vs brute-force references (per-vertex-removal union-find for cut
vertices; recursive Hopcroft–Tarjan for the block partition)."""
import random
import sys

import pytest

from leidenalg_spark.operators.kernels import articulation_points, biconnected_components


def _uf_components(vertices, edge_list):
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    return {v: find(v) for v in vertices}


def _brute_blocks_at_vertex(vertices, edge_list):
    """n_blocks(v) = #components of G−v among v's neighbours (block-cut
    tree: blocks containing v ↔ neighbour classes connected avoiding v)."""
    adj = {v: set() for v in vertices}
    for a, b in edge_list:
        adj[a].add(b)
        adj[b].add(a)
    out = {}
    for v in vertices:
        rest = [u for u in vertices if u != v]
        rest_edges = [(a, b) for a, b in edge_list if a != v and b != v]
        comp = _uf_components(rest, rest_edges)
        out[v] = len({comp[u] for u in adj[v]})
    return out


def _tarjan_blocks(vertices, edge_list):
    """Hopcroft–Tarjan biconnected components → set of frozensets of
    canonical edges (recursive; test graphs are small)."""
    sys.setrecursionlimit(100_000)
    adj = {v: [] for v in vertices}
    for a, b in edge_list:
        adj[a].append(b)
        adj[b].append(a)
    disc, low = {}, {}
    stack, blocks = [], []
    timer = [0]

    def dfs(u, parent):
        disc[u] = low[u] = timer[0]
        timer[0] += 1
        for w in adj[u]:
            if w == parent:
                parent = None  # skip the tree edge back exactly once
                continue
            e = (min(u, w), max(u, w))
            if w not in disc:
                stack.append(e)
                dfs(w, u)
                low[u] = min(low[u], low[w])
                if low[w] >= disc[u]:
                    blk = set()
                    while True:
                        top = stack.pop()
                        blk.add(top)
                        if top == e:
                            break
                    blocks.append(frozenset(blk))
            elif disc[w] < disc[u]:
                stack.append(e)
                low[u] = min(low[u], disc[w])

    for v in vertices:
        if v not in disc:
            dfs(v, None)
    return set(blocks)


def _run(spark, edge_list):
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edge_list], "src long, dst long, weight double"
    )
    blocks = biconnected_components(spark, df).collect()
    art = articulation_points(spark, df).collect()
    return blocks, art


def _check(spark, edge_list):
    blocks, art = _run(spark, edge_list)
    # references work on the simple graph, exactly like the operator
    edge_list = sorted({(min(a, b), max(a, b)) for a, b in edge_list})
    vertices = sorted({v for e in edge_list for v in e})
    # block partition matches Hopcroft–Tarjan up to label permutation
    by_label = {}
    for r in blocks:
        by_label.setdefault(r["block"], set()).add((r["a"], r["b"]))
    assert set(map(frozenset, by_label.values())) == _tarjan_blocks(vertices, edge_list)
    # articulation flags + block counts match the per-removal brute force
    want = _brute_blocks_at_vertex(vertices, edge_list)
    got = {r["id"]: (r["n_blocks"], r["is_articulation"]) for r in art}
    assert set(got) == set(want)
    for v, nb in want.items():
        assert got[v] == (nb, nb >= 2), f"vertex {v}"


FIXTURE = [((i - 1) // 2, i) for i in range(1, 15)] + [(1, 2), (7, 8), (13, 14)]


def test_bridge_fixture(spark):
    _check(spark, FIXTURE)


def test_cycle_has_no_articulation(spark):
    n = 9
    _check(spark, [(i, (i + 1) % n) for i in range(n)])


def test_path_inner_vertices_all_cut(spark):
    edges = [(i, i + 1) for i in range(6)]
    _, art = _run(spark, edges)
    got = {r["id"]: r["is_articulation"] for r in art}
    assert got == {i: 0 < i < 6 for i in range(7)}
    _check(spark, edges)


def test_barbell_two_triangles_bridge(spark):
    # triangle 0-1-2, triangle 3-4-5, bridge 2-3: cut vertices = {2, 3}
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    _, art = _run(spark, edges)
    got = {r["id"]: r["is_articulation"] for r in art}
    assert got == {0: False, 1: False, 2: True, 3: True, 4: False, 5: False}
    _check(spark, edges)


def test_two_components_and_multiedges(spark):
    # disjoint: square with a chord + separate star; duplicate/reversed
    # input rows must collapse to the simple graph
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (1, 0),
             (10, 11), (10, 12), (10, 13)]
    _check(spark, edges)


@pytest.mark.parametrize("seed", [7, 19])
def test_random_graphs_match_brute_force(spark, seed):
    rng = random.Random(seed)
    n = 28
    edges = sorted({
        (min(a, b), max(a, b))
        for a, b in (
            (rng.randrange(n), rng.randrange(n)) for _ in range(45)
        )
        if a != b
    })
    _check(spark, edges)


# ---------------------------------------------------------------- girth
def _cycles(spark, edge_list, probes=None):
    from leidenalg_spark.operators.kernels import girth, shortest_cycles

    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edge_list], "src long, dst long, weight double"
    )
    p = (
        spark.createDataFrame([(a, b, 1.0) for a, b in probes],
                              "src long, dst long, weight double")
        if probes is not None else None
    )
    sc = {(r["a"], r["b"]): r["cycle_len"]
          for r in shortest_cycles(spark, df, probe_edges=p).collect()}
    g = girth(spark, df, probe_edges=p).first()["girth"]
    return sc, g


def test_girth_petersen_is_5(spark):
    outer = [(i, (i + 1) % 5) for i in range(5)]
    inner = [(5 + i, 5 + (i + 2) % 5) for i in range(5)]
    spokes = [(i, i + 5) for i in range(5)]
    sc, g = _cycles(spark, outer + inner + spokes)
    assert g == 5
    assert all(v == 5 for v in sc.values()) and len(sc) == 15


def test_girth_cycle_and_chord(spark):
    n = 8
    ring = [(i, (i + 1) % n) for i in range(n)]
    sc, g = _cycles(spark, ring)
    assert g == 8 and all(v == 8 for v in sc.values())
    # a chord 0-4 splits the 8-ring into two 5-cycles
    sc2, g2 = _cycles(spark, ring + [(0, 4)])
    assert g2 == 5 and sc2[(0, 4)] == 5 and sc2[(0, 1)] == 5 and sc2[(1, 2)] == 5


def test_girth_tree_is_null(spark):
    sc, g = _cycles(spark, [(0, 1), (1, 2), (1, 3), (3, 4)])
    assert g is None and all(v is None for v in sc.values())


def test_girth_bridge_fixture(spark):
    sc, g = _cycles(spark, FIXTURE)
    assert g == 3
    # tree edges into the three chorded triangles ride 3-cycles;
    # bridges (e.g. 0-1's sibling edges outside any cycle) are NULL
    assert sc[(1, 2)] == 3 and sc[(7, 8)] == 3 and sc[(13, 14)] == 3
    assert sc[(0, 1)] == 3 and sc[(3, 7)] == 3
    assert sc[(1, 3)] is None and sc[(2, 5)] is None


def test_girth_sampled_probe_upper_bound(spark):
    ring = [(i, (i + 1) % 6) for i in range(6)]
    sc, g = _cycles(spark, ring + [(0, 2)], probes=[(3, 4)])
    # probing only a far edge sees the 6-ring... through (3,4) the
    # shortest cycle is the ring shortcut via chord: 3-4-5-0-2-3 = 5
    assert list(sc) == [(3, 4)] and g == sc[(3, 4)] == 5


def test_girth_truncation_strict_vs_lenient(spark):
    """max_depth truncation contract (ADVICE r3): strict refuses when any
    probe is still ambiguous; strict=False returns results with NULL
    meaning 'bridge OR cycle > max_depth+1' — resolved probes still exact."""
    from leidenalg_spark.operators.kernels import shortest_cycles

    def df(edge_list):
        return spark.createDataFrame(
            [(a, b, 1.0) for a, b in edge_list], "src long, dst long, weight double"
        )

    # triangle + a 10-edge tail: the tail probes are true bridges whose
    # component radius exceeds max_depth=3 — previously a hard failure
    mixed = [(0, 1), (1, 2), (2, 0)] + [(2 + i, 3 + i) for i in range(10)]
    with pytest.raises(ValueError, match="strict=False"):
        shortest_cycles(spark, df(mixed), max_depth=3).collect()
    sc = {(r["a"], r["b"]): r["cycle_len"]
          for r in shortest_cycles(spark, df(mixed), max_depth=3, strict=False).collect()}
    assert sc[(0, 1)] == 3 and sc[(1, 2)] == 3 and sc[(0, 2)] == 3
    assert all(sc[k] is None for k in sc if k not in [(0, 1), (1, 2), (0, 2)])
    # 12-ring at max_depth=3: every probe unresolved -> all NULL lenient
    ring = [(i, (i + 1) % 12) for i in range(12)]
    sc2 = {(r["a"], r["b"]): r["cycle_len"]
           for r in shortest_cycles(spark, df(ring), max_depth=3, strict=False).collect()}
    assert len(sc2) == 12 and all(v is None for v in sc2.values())
    # ...and with enough depth the same call is exact again
    sc3 = {(r["a"], r["b"]): r["cycle_len"]
           for r in shortest_cycles(spark, df(ring), max_depth=12, strict=False).collect()}
    assert all(v == 12 for v in sc3.values())


def test_directed_assortativity_star_vs_chain(spark):
    from leidenalg_spark.operators.kernels import degree_assortativity_directed

    # star out of a hub: every edge pairs (dout=3, din=1) — zero variance
    star = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 1.0), (0, 3, 1.0)], "src long, dst long, weight double"
    )
    assert degree_assortativity_directed(spark, star).first()["assortativity"] is None
    # hand-computed mixed graph: edges (0→1),(0→2),(1→2),(3→2)
    g = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0), (3, 2, 1.0)],
        "src long, dst long, weight double",
    )
    import numpy as np

    x = np.array([2.0, 2.0, 1.0, 1.0])  # out-deg of src per edge
    y = np.array([1.0, 3.0, 3.0, 3.0])  # in-deg of dst per edge
    want = round(float(np.corrcoef(x, y)[0, 1]), 6)
    got = degree_assortativity_directed(spark, g).first()["assortativity"]
    assert got == want
