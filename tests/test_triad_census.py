"""Triad census: the 64-code lookup's orbit structure and the
direction-sensitive classes on hand-built 3-vertex goldens, plus the
analytic 003/012/102 identities on a graph with isolated-ish vertices."""

import pytest
from pyspark.sql import functions as F

from leidenalg_spark.operators.kernels import (
    TRIAD_CLASSES,
    triad_census,
    triad_code_table,
)

# published labeled-graph orbit sizes per MAN class (Holland & Leinhardt)
ORBIT_SIZES = {
    "003": 1, "012": 6, "102": 3, "021D": 3, "021U": 3, "021C": 6,
    "111D": 6, "111U": 6, "030T": 6, "030C": 2, "201": 3,
    "120D": 3, "120U": 3, "120C": 6, "210": 6, "300": 1,
}


def test_lookup_orbit_sizes():
    tab = triad_code_table()
    assert len(tab) == 64
    got = {}
    for _, lab, _, _ in tab:
        got[lab] = got.get(lab, 0) + 1
    assert got == ORBIT_SIZES


def test_lookup_man_counts_consistent():
    # the class name encodes (M, A, N) — the lookup's per-code dyad
    # counts must agree with its own label
    for code, lab, m, a in triad_code_table():
        assert lab[0] == str(m) and lab[1] == str(a), (code, lab, m, a)


def _census(spark, arcs):
    df = spark.createDataFrame(arcs, "src long, dst long")
    rows = triad_census(spark, df).collect()
    assert sorted(r["triad"] for r in rows) == sorted(TRIAD_CLASSES)
    return {r["triad"]: r["count"] for r in rows if r["count"]}


GOLDENS = [
    ([(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)], {"300": 1}),
    ([(1, 2), (2, 3), (3, 1)], {"030C": 1}),
    ([(1, 2), (2, 3), (1, 3)], {"030T": 1}),
    ([(2, 1), (2, 3)], {"021D": 1}),
    ([(1, 2), (3, 2)], {"021U": 1}),
    ([(1, 2), (2, 3)], {"021C": 1}),
    ([(1, 2), (2, 1), (3, 1)], {"111D": 1}),
    ([(1, 2), (2, 1), (1, 3)], {"111U": 1}),
    ([(1, 3), (3, 1), (2, 1), (2, 3)], {"120D": 1}),
    ([(1, 3), (3, 1), (1, 2), (3, 2)], {"120U": 1}),
    ([(1, 3), (3, 1), (1, 2), (2, 3)], {"120C": 1}),
    ([(1, 2), (2, 1), (2, 3), (3, 2), (1, 3)], {"210": 1}),
    ([(1, 2), (2, 1), (1, 3), (3, 1)], {"201": 1}),
]


@pytest.mark.parametrize("arcs,expect", GOLDENS)
def test_three_vertex_goldens(spark, arcs, expect):
    assert _census(spark, arcs) == expect


def test_analytic_classes_and_total(spark):
    # 5 vertices: mutual dyad (1,2), lone arc 3->4, vertex 5 attached
    # by a single arc 5->1 — exercises the closed-form 003/012/102 path
    arcs = [(1, 2), (2, 1), (3, 4), (5, 1)]
    got = _census(spark, arcs)
    # dyads: M=1 (1-2), A=2 (3->4, 5->1); n=5, C(5,3)=10
    # T2 triples: {1,2,5} = mutual + arc INTO the pair = 111D
    # full enumeration: {1,2,3},{1,2,4}=102; {1,2,5}=111D;
    # {1,3,4},{2,3,4},{3,4,5},{1,3,5},{1,4,5}=012; {2,3,5},{2,4,5}=003
    assert got == {"111D": 1, "102": 2, "012": 5, "003": 2}
    assert sum(got.values()) == 10


def test_self_loops_and_parallel_arcs_collapse(spark):
    arcs = [(1, 2), (1, 2), (1, 1), (2, 3)]
    assert _census(spark, arcs) == {"021C": 1}


def test_cocitation_vs_coupling_directed_semantics(spark):
    """Hand graph arcs: 10→1, 10→2, 1→20, 2→20, 1→10.
    cocitation: (1,2) co-cited by 10; (10,20) co-cited by 1.
    coupling: only (1,2) share an out-neighbour (20)."""
    from leidenalg_spark.operators.kernels import cocitation

    arcs = [(10, 1), (10, 2), (1, 20), (2, 20), (1, 10)]
    df = spark.createDataFrame(arcs, "src long, dst long")
    co = {(r.src, r.dst): r.n_common for r in cocitation(spark, df, "cocitation").collect()}
    cp = {(r.src, r.dst): r.n_common for r in cocitation(spark, df, "coupling").collect()}
    assert co == {(1, 2): 1, (10, 20): 1}
    assert cp == {(1, 2): 1}


def test_vertex_metrics_theory_goldens(spark):
    """Known closed-form values: star K1,3 and triangle K3 (igraph
    reference values for knn / diversity / Burt constraint)."""
    from leidenalg_spark.operators.kernels import (
        avg_neighbor_degree,
        burt_constraint,
        vertex_diversity,
    )

    star = spark.createDataFrame(
        [(0, i, 1.0) for i in (1, 2, 3)], "src long, dst long, weight double"
    )
    knn = {r.id: r.knn for r in avg_neighbor_degree(spark, star).collect()}
    assert knn == {0: 1.0, 1: 3.0, 2: 3.0, 3: 3.0}
    con = {r.id: r["constraint"] for r in burt_constraint(spark, star).collect()}
    assert con == {0: 0.333333, 1: 1.0, 2: 1.0, 3: 1.0}

    k3 = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 1.0)], "src long, dst long, weight double"
    )
    # K3: every c_ij = (1/2 + 1/4)^2 = 0.5625, constraint = 1.125 (igraph)
    con3 = {r.id: r["constraint"] for r in burt_constraint(spark, k3).collect()}
    assert con3 == {1: 1.125, 2: 1.125, 3: 1.125}
    # path P3: constraints [1, 0.5, 1]
    p3 = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0)], "src long, dst long, weight double"
    )
    conp = {r.id: r["constraint"] for r in burt_constraint(spark, p3).collect()}
    assert conp == {1: 1.0, 2: 0.5, 3: 1.0}
    # weighted 2-star diversity: weights (1, 3) → H = entropy(0.25, 0.75)
    ws = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 3.0)], "src long, dst long, weight double"
    )
    div = {r.id: r.diversity for r in vertex_diversity(spark, ws).collect()}
    import math
    expected = -(0.25 * math.log2(0.25) + 0.75 * math.log2(0.75))  # /log2(2)=1
    assert abs(div[0] - round(expected, 6)) < 2e-6
    assert div[1] == 0.0 and div[2] == 0.0
