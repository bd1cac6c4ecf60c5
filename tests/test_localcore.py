"""Local-core parity tests, mirroring the reference suite:

- golden optimisation outcomes: tests/test_Optimiser.py:12-185
- property tests (diff==delta, aggregate invariance, sum-consistency):
  tests/test_VertexPartition.py:91-148
- known-value anchors for the quality formulas.
"""

import numpy as np
import pytest

from leidenalg_spark.localcore import (
    ALL_COMMS,
    ALL_NEIGH_COMMS,
    LocalGraph,
    LocalPartition,
    OptimiserOpts,
    QualitySpec,
    aggregate,
    find_partition_local,
    merge_nodes,
    move_nodes,
    optimise_partition,
)
from leidenalg_spark.sources import fixtures as fx

METHODS = ["modularity", "rbconfiguration", "rber", "cpm", "significance", "surprise"]


def P_of(fix, method="cpm", gamma=1.0, membership=None, directed=False, weighted=False):
    if weighted:
        fix = fx.with_random_weights(fix)
    g = fx.to_local_graph(fix, directed=directed)
    return LocalPartition([(g, QualitySpec(method, gamma=gamma))], membership=membership), g


# ---------------------------------------------------------------- goldens
def test_move_nodes_full_graph():
    P, _ = P_of(fx.full(100), "cpm", 0.5)
    move_nodes(P, consider_comms=ALL_NEIGH_COMMS)
    assert P.community_sizes() == [100]


def test_move_nodes_min_comm_size():
    P, _ = P_of(fx.full(100), "cpm", 1.0)
    opts = OptimiserOpts(min_comm_size=5, community_constraint_enforcement=10)
    move_nodes(P, consider_comms=ALL_NEIGH_COMMS, opts=opts)
    assert P.community_sizes() == 20 * [5]


def test_move_nodes_max_comm_size():
    P, _ = P_of(fx.full(100), "cpm", 0.5)
    opts = OptimiserOpts(max_comm_size=17, community_constraint_enforcement=100)
    move_nodes(P, consider_comms=ALL_NEIGH_COMMS, opts=opts)
    assert P.community_sizes() == [17, 17, 17, 17, 17, 15]


def test_move_nodes_with_fixed():
    P, _ = P_of(fx.edge_plus_singleton(), "cpm", 0.1)
    move_nodes(P, is_membership_fixed=[True, False, True], consider_comms=ALL_NEIGH_COMMS)
    assert P.community_sizes() == [1, 1, 1]


def test_merge_nodes_full_graph():
    P, g = P_of(fx.full(100), "cpm", 0.5)
    merge_nodes(P, consider_comms=ALL_NEIGH_COMMS)
    assert P.community_sizes() == [100]
    live = P.count_c > 0
    assert np.isclose(P.w_in[0][live].sum(), g.ecount)


def test_merge_nodes_min_comm_size():
    P, _ = P_of(fx.full(100), "cpm", 1.0)
    opts = OptimiserOpts(min_comm_size=5, community_constraint_enforcement=10)
    merge_nodes(P, consider_comms=ALL_NEIGH_COMMS, opts=opts)
    assert P.community_sizes() == 20 * [5]


def test_merge_nodes_max_comm_size():
    P, _ = P_of(fx.full(100), "cpm", 0.5)
    opts = OptimiserOpts(max_comm_size=17, community_constraint_enforcement=100)
    merge_nodes(P, consider_comms=ALL_NEIGH_COMMS, opts=opts)
    assert P.community_sizes() == [17, 17, 17, 17, 17, 15]


def test_node_optimality_after_convergence():
    P, g = P_of(fx.erdos_renyi(100, 0.05), "cpm", 0.1)
    while move_nodes(P, consider_comms=ALL_NEIGH_COMMS) > 0:
        pass
    for v in range(g.n):
        nbr, _, _ = g.neighbours(v)
        for c in set(P.membership[nbr]):
            comms, wo, wi = P.gather(v)
            idx = np.searchsorted(comms, c)
            dq = P.diff_move_many(v, np.array([c]), [w[idx : idx + 1] for w in [wo[0]]], [w[idx : idx + 1] for w in [wi[0]]])
            assert dq[0] <= 1e-10


def test_optimise_components():
    P, _ = P_of(fx.forest(10, 10, 3), "cpm", 0.0)
    optimise_partition(P)
    assert P.community_sizes() == 10 * [10]


def test_optimise_min_comm_size():
    P, _ = P_of(fx.full(100), "cpm", 1.0)
    opts = OptimiserOpts(min_comm_size=5, community_constraint_enforcement=10)
    optimise_partition(P, opts=opts)
    assert P.community_sizes() == 20 * [5]


def test_optimise_max_comm_size():
    P, _ = P_of(fx.full(100), "cpm", 0.0)
    opts = OptimiserOpts(max_comm_size=10, community_constraint_enforcement=100)
    optimise_partition(P, opts=opts)
    assert P.community_sizes() == 10 * [10]


def test_optimise_with_fixed_membership():
    fix = (3, np.array([0, 0, 1]), np.array([1, 2, 2]), None)  # K3
    P, _ = P_of(fix, "cpm", 0.01, membership=[2, 1, 0])
    q0 = P.quality()
    diff = optimise_partition(P, is_membership_fixed=[True, False, False])
    assert abs((P.quality() - q0) - diff) < 1e-10
    assert list(P.membership) == [2, 2, 2]


def test_optimise_fixed_large_labels():
    fix = fx.erdos_renyi(100, 0.05, directed=True, loops=True)
    g = fx.to_local_graph(fix, directed=True)
    P = LocalPartition([(g, QualitySpec("rbconfiguration"))], membership=np.arange(100))
    q0 = P.quality()
    fixed = [False] * 100
    fixed[90] = True
    diff = optimise_partition(P, is_membership_fixed=fixed)
    assert len(set(P.membership.tolist())) < 100
    assert abs((P.quality() - q0) - diff) < 1e-10
    assert P.membership[90] == 90


def test_neg_weight_bipartite():
    P, _ = P_of(fx.full_bipartite(50, 50, weight=-0.1), "cpm", -0.1)
    opts = OptimiserOpts(consider_comms=ALL_COMMS)
    optimise_partition(P, opts=opts)
    assert P.community_sizes() == [50, 50]


# ------------------------------------------------------------- anchors
def test_cpm_quality_anchor():
    # K100, single community, gamma=.5: Q = 4950 - .5*4950 = 2475
    P, _ = P_of(fx.full(100), "cpm", 0.5, membership=np.zeros(100, dtype=int))
    assert np.isclose(P.quality(), 2475.0)


def test_modularity_anchor_karate():
    # classic 2-faction split of the karate club: Q ~= 0.3715 (published)
    faction1 = {0, 1, 2, 3, 4, 5, 6, 7, 10, 11, 12, 13, 16, 17, 19, 21}
    memb = np.array([0 if v in faction1 else 1 for v in range(34)])
    P, _ = P_of(fx.zachary(), "modularity", membership=memb)
    assert abs(P.quality() - 0.3715) < 1e-3


def test_modularity_optimum_karate():
    g = fx.to_local_graph(fx.zachary())
    P = find_partition_local(g, "modularity", n_iterations=-1, seed=1)
    # known optimum modularity of Zachary karate club is 0.41979
    assert P.quality() > 0.41
    assert P.quality() <= 0.4198


# ------------------------------------------------------- property tests
GRAPH_FIXTURES = [
    ("zachary", fx.zachary(), False),
    ("er_100_5", fx.erdos_renyi(100, 0.05), False),
    ("er_100_5_dir", fx.erdos_renyi(100, 0.05, directed=True), True),
    ("er_100_5_loops", fx.erdos_renyi(100, 0.05, loops=True), False),
    ("er_dir_loops", fx.erdos_renyi(100, 0.05, directed=True, loops=True), True),
    ("tree", fx.tree(100, 3), False),
    ("lattice", fx.lattice(100, 3), False),
]


@pytest.mark.parametrize("method", METHODS)
@pytest.mark.parametrize("name,fix,directed", GRAPH_FIXTURES, ids=[f[0] for f in GRAPH_FIXTURES])
@pytest.mark.parametrize("weighted", [False, True])
def test_diff_move_equals_quality_delta(method, name, fix, directed, weighted):
    # the central contract: diff_move == quality(after) - quality(before)
    # (tests/test_VertexPartition.py:91-111, doctest VertexPartition.py:134-141)
    if method == "significance" and weighted:
        pytest.skip("Significance is not defined for weighted graphs (:92-93)")
    if weighted:
        fix = fx.with_random_weights(fix)
    g = fx.to_local_graph(fix, directed=directed)
    rng = np.random.default_rng(5)
    memb = rng.integers(0, 10, size=g.n)
    P = LocalPartition([(g, QualitySpec(method, gamma=0.7))], membership=memb)
    for v in [0, 3, g.n // 2, g.n - 1]:
        for target in [0, 5, int(P.empty_slot())]:
            q0 = P.quality()
            comms, wo, wi = P.gather(v)
            cands = np.array([target])
            if len(comms):
                pos = np.clip(np.searchsorted(comms, cands), 0, len(comms) - 1)
                hit = comms[pos] == cands
                wo_c = [np.where(hit, w[pos], 0.0) for w in wo]
                wi_c = [np.where(hit, w[pos], 0.0) for w in wi]
            else:
                wo_c = [np.zeros(1)]
                wi_c = [np.zeros(1)]
            dq = P.diff_move_many(v, cands, wo_c, wi_c)[0]
            old = P.membership[v]
            P.move(v, target)
            assert abs((P.quality() - q0) - dq) < 1e-8, (v, target)
            P.move(v, old)  # restore


@pytest.mark.parametrize("method", METHODS)
def test_aggregate_quality_invariance(method):
    # aggregate_partition.quality() == partition.quality()
    # (tests/test_VertexPartition.py:113-132)
    g = fx.to_local_graph(fx.erdos_renyi(100, 0.05))
    memb = np.random.default_rng(3).integers(0, 7, size=100)
    P = LocalPartition([(g, QualitySpec(method, gamma=0.4))], membership=memb)
    coarse_graphs, relabel, csize = aggregate(P, memb)
    coarse_init = np.zeros(coarse_graphs[0].n, dtype=np.int64)
    coarse_init[relabel] = memb
    CP = LocalPartition(
        [(coarse_graphs[0], QualitySpec(method, gamma=0.4))],
        membership=coarse_init,
        constraint_size=csize,
    )
    assert abs(CP.quality() - P.quality()) < 1e-8


def test_sum_weight_consistency():
    # sum_c total_weight_in_comm(c) == total_weight_in_all_comms
    # (tests/test_VertexPartition.py:134-148)
    g = fx.to_local_graph(fx.erdos_renyi(100, 0.05))
    memb = np.random.default_rng(4).integers(0, 5, size=100)
    P = LocalPartition([(g, QualitySpec("cpm"))], membership=memb)
    live = P.count_c > 0
    assert np.isclose(P.w_in[0][live].sum(), P.sum_w_in[0])
    internal = memb[g.src] == memb[g.dst]
    assert np.isclose(P.sum_w_in[0], g.weight[internal].sum())


def test_quality_improves_and_is_deterministic():
    for method in METHODS:
        g = fx.to_local_graph(fx.erdos_renyi(100, 0.05))
        P1 = find_partition_local(g, method, seed=9, n_iterations=2)
        P2 = find_partition_local(g, method, seed=9, n_iterations=2)
        assert list(P1.membership) == list(P2.membership), method
        singleton = LocalPartition([(g, QualitySpec(method))])
        assert P1.quality() >= singleton.quality() - 1e-12, method


# ------------------------------------------------------------- KL edge cases
def test_kl_div_deterministic_out_of_domain():
    """Regression: kl_div used np.divide(..., where=) without out=, so
    y<=0 / y>=1 entries were uninitialized memory (nondeterministic
    NaN/inf).  Reference C++ KL semantics: each term only on its valid
    domain, 0 otherwise."""
    from leidenalg_spark.localcore.quality import kl_div

    # q in (0,1), p == 0: first term dropped, second term defined
    for _ in range(3):  # repeated calls used to return different garbage
        got = kl_div(np.full(4, 0.5), np.zeros(4))
        expect = 0.5 * np.log(0.5 / 1.0)
        assert np.allclose(got, expect), got
    # q in (0,1), p == 1: second term dropped (first still in-domain)
    got = kl_div(np.array([0.25]), np.ones(1))
    assert np.allclose(got, 0.25 * np.log(0.25)), got
    # fully out of domain -> 0
    assert kl_div(np.array([0.0]), np.array([0.0]))[0] == 0.0
    assert kl_div(np.array([1.0]), np.array([1.0]))[0] == 0.0
    assert np.isfinite(kl_div(np.linspace(0, 1, 11), np.zeros(11))).all()


def test_surprise_selfloop_singletons_finite():
    """Surprise of a partition where q>0 but q_exp==0 (all singletons,
    self-loops only) must be finite and deterministic."""
    g = LocalGraph(3, np.array([0, 1]), np.array([0, 1]), np.array([1.0, 1.0]))
    P = LocalPartition([(g, QualitySpec("surprise"))], membership=np.arange(3))
    q1 = P.quality()
    q2 = P.quality()
    assert np.isfinite(q1) and q1 == q2
