"""Hand-computed community_stats on tiny graphs.

Reference exposes per-community totals only via the partition object
(``src/VertexPartition.py`` total_weight_in_comm / total_weight_from_comm);
this table is the bulk equivalent, so we verify its arithmetic by hand.
"""

import pytest

from leidenalg_spark.operators.community import community_stats


def _run(spark, edges, membership):
    e = spark.createDataFrame(edges, "src long, dst long, weight double")
    m = spark.createDataFrame(membership, "id long, comm long")
    rows = community_stats(e, m).collect()
    return {r["comm"]: r.asDict() for r in rows}


def test_two_triangles_with_bridge(spark):
    # triangle {0,1,2} (w=1 each), triangle {3,4,5} (w=2 each), bridge 2-3 w=0.5
    edges = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0),
             (3, 4, 2.0), (4, 5, 2.0), (3, 5, 2.0),
             (2, 3, 0.5)]
    m = [(i, 0) for i in (0, 1, 2)] + [(i, 1) for i in (3, 4, 5)]
    out = _run(spark, edges, m)

    a, b = out[0], out[1]
    assert a["n_vertices"] == 3 and b["n_vertices"] == 3
    assert a["n_internal_edges"] == 3 and b["n_internal_edges"] == 3
    assert a["internal_weight"] == pytest.approx(3.0)
    assert b["internal_weight"] == pytest.approx(6.0)
    # the bridge contributes its weight to BOTH communities' cut
    assert a["cut_weight"] == pytest.approx(0.5)
    assert b["cut_weight"] == pytest.approx(0.5)
    assert a["volume"] == pytest.approx(6.5)   # 2*3 + 0.5
    assert b["volume"] == pytest.approx(12.5)  # 2*6 + 0.5
    # conductance = cut / min(vol, total - vol); total = 19
    assert a["conductance"] == pytest.approx(0.5 / 6.5, abs=1e-6)
    assert b["conductance"] == pytest.approx(0.5 / 6.5, abs=1e-6)
    assert a["density"] == pytest.approx(1.0)  # complete triangle


def test_self_loop_isolated_vertex_and_singleton(spark):
    # comm 0: self-loop on 0 (internal, volume counts it twice) + vertex 9
    # that appears only in membership; comm 1: singleton 5 with one cut edge
    edges = [(0, 0, 2.0), (0, 5, 1.0)]
    m = [(0, 0), (9, 0), (5, 1)]
    out = _run(spark, edges, m)

    a, b = out[0], out[1]
    assert a["n_vertices"] == 2  # vertex 9 has no edges but still counts
    assert a["n_internal_edges"] == 1 and a["internal_weight"] == pytest.approx(2.0)
    assert a["volume"] == pytest.approx(5.0)  # 2*2 (self-loop twice) + 1 cut
    assert b["n_vertices"] == 1 and b["n_internal_edges"] == 0
    assert b["volume"] == pytest.approx(1.0)
    # total volume 6: denom for b = min(1, 5) = 1 -> conductance 1.0
    assert b["conductance"] == pytest.approx(1.0)
    # singleton density is defined as 0
    assert b["density"] == pytest.approx(0.0)


def test_whole_graph_community_conductance_zero(spark):
    edges = [(0, 1, 1.0), (1, 2, 1.0)]
    m = [(0, 0), (1, 0), (2, 0)]
    out = _run(spark, edges, m)
    assert out[0]["cut_weight"] == pytest.approx(0.0)
    # denom = min(vol, total - vol) = 0 -> defined as 0, not NaN
    assert out[0]["conductance"] == pytest.approx(0.0)
    assert out[0]["density"] == pytest.approx(2 * 2 / (3 * 2), abs=1e-6)


def test_partition_compare_identical_and_refinement(spark):
    from leidenalg_spark.operators.community import partition_compare

    m = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "id long, comm long"
    )
    row = partition_compare(m, m).first()
    assert row["n_vertices"] == 30
    assert row["nmi"] == pytest.approx(1.0)
    assert row["vi"] == pytest.approx(0.0, abs=1e-6)
    assert row["rand"] == pytest.approx(1.0)
    assert row["adjusted_rand"] == pytest.approx(1.0)
    assert row["split_join"] == 0

    # a strict refinement: VI = H(refined) - H(coarse), split-join is
    # one-sided (the coarse side's maxima already cover every block)
    fine = spark.createDataFrame(
        [(i, i % 6) for i in range(30)], "id long, comm long"
    )
    r2 = partition_compare(m, fine).first()
    import math
    assert r2["vi"] == pytest.approx(math.log(6) - math.log(3), abs=1e-6)
    # Σ_i max_j n_ij = 3·5 = 15 (each coarse block best-covered by one
    # fine block of 5), Σ_j max_i n_ij = 6·5 = 30 → 2·30 − 15 − 30 = 15
    assert r2["split_join"] == 15
    assert 0 < r2["nmi"] < 1


def test_partition_compare_independent_labels(spark):
    from leidenalg_spark.operators.community import partition_compare

    # c1 = i // 10, c2 = i % 10 over a 10x10 grid: statistically
    # independent → MI = 0, NMI = 0; ARI = (0 − exp)/(max − exp) with
    # sab = 0, sa = sb = 450, t = 4950 → exactly −0.1 (below the
    # permutation-null expectation, as a balanced grid must be)
    m1 = spark.createDataFrame([(i, i // 10) for i in range(100)], "id long, comm long")
    m2 = spark.createDataFrame([(i, i % 10) for i in range(100)], "id long, comm long")
    row = partition_compare(m1, m2).first()
    assert row["nmi"] == pytest.approx(0.0, abs=1e-6)
    assert row["adjusted_rand"] == pytest.approx(-0.1, abs=1e-6)


def test_community_drift_composes_with_temporal_facade(spark):
    from leidenalg_spark.operators.community import community_drift
    from leidenalg_spark.operators.multiplex import find_partition_temporal_df
    from leidenalg_spark.sources.fixtures import ZACHARY_EDGES

    z = [(int(a), int(b), 1.0) for a, b in ZACHARY_EDGES]
    sl = spark.createDataFrame(
        [(s, a, b, w) for s in (0, 1, 2) for a, b, w in z],
        "slice int, src long, dst long, weight double",
    )
    membership, _ = find_partition_temporal_df(
        spark, sl, method="modularity", interslice_weight=5.0, seed=1
    )
    drift = {r["slice_from"]: r for r in community_drift(membership).collect()}
    # identical slices + strong coupling → perfectly stable communities
    assert set(drift) == {0, 1}
    for r in drift.values():
        assert r["n_vertices"] == 34
        assert r["nmi"] == 1.0 and r["split_join"] == 0


def test_partition_quality_report_hand_computed(spark):
    from leidenalg_spark.operators.community import partition_quality_report

    # two triangles + one bridge; perfect 2-community split
    edges = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0),
             (3, 4, 2.0), (4, 5, 2.0), (3, 5, 2.0),
             (2, 3, 0.5)]
    e = spark.createDataFrame(edges, "src long, dst long, weight double")
    m = spark.createDataFrame(
        [(i, 0) for i in (0, 1, 2)] + [(i, 1) for i in (3, 4, 5)],
        "id long, comm long",
    )
    r = partition_quality_report(e, m).first()
    assert r["n_vertices"] == 6 and r["n_edges"] == 7
    # coverage = intra weight / total = (3 + 6) / 9.5
    assert r["coverage"] == pytest.approx(9.0 / 9.5, abs=1e-6)
    # pairs: 15 total, 6 intra (all linked), 9 inter (1 linked) →
    # correct = 6 + 8 = 14
    assert r["performance"] == pytest.approx(14 / 15, abs=1e-6)


def test_mixing_matrix_and_nominal_assortativity_golden(spark):
    from leidenalg_spark.operators.community import (
        assortativity_nominal,
        mixing_matrix,
    )

    # two triangles joined by one bridge: classes = the two triangles
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )
    m = spark.createDataFrame(
        [(i, i // 3) for i in range(6)], "id long, comm long"
    )
    mm = {(r["comm_a"], r["comm_b"]): r["n_edges"] for r in mixing_matrix(e, m).collect()}
    assert mm == {(0, 0): 3, (1, 1): 3, (0, 1): 1}
    r = assortativity_nominal(e, m).first()["assortativity"]
    # e_ii = 12/14, a_i = 1/2 each -> r = (6/7 - 1/2) / (1/2) = 5/7
    assert abs(r - 5 / 7) < 1e-6


def test_nominal_assortativity_single_class_is_null(spark):
    from leidenalg_spark.operators.community import assortativity_nominal

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0)], "src long, dst long, weight double"
    )
    m = spark.createDataFrame([(i, 7) for i in range(3)], "id long, comm long")
    assert assortativity_nominal(e, m).first()["assortativity"] is None


def test_modularity_null_test_detects_planted_structure(spark):
    from leidenalg_spark.operators.community import modularity_null_test

    # two 6-cliques joined by one edge, membership = the cliques: the
    # observed modularity must sit far above every degree-preserving null
    edges = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    edges += [(a, b) for a in range(6, 12) for b in range(a + 1, 12)]
    edges += [(0, 6)]
    e = spark.createDataFrame(edges, "src long, dst long")
    memb = spark.createDataFrame(
        [(i, i // 6) for i in range(12)], "id long, comm long"
    )
    r = modularity_null_test(spark, e, memb, seeds=(1, 2, 3)).collect()[0]
    assert r.q_obs > r.null_mean + 3 * r.null_std
    assert r.z is None or r.z > 3


def test_leading_eigenvector_splits_two_cliques(spark):
    from leidenalg_spark.operators.community import leading_eigenvector_split

    edges = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    edges += [(a, b) for a in range(6, 12) for b in range(a + 1, 12)]
    edges += [(0, 6)]
    e = spark.createDataFrame(edges, "src long, dst long")
    sides = {r.id: r.side for r in leading_eigenvector_split(spark, e).collect()}
    a = {v for v in sides if sides[v] == sides[0]}
    assert a == set(range(6)) or a == set(range(6, 12)) == set(sides) - a
    assert len(sides) == 12


def test_consensus_communities_two_cliques(spark):
    """Two K5s joined by one bridge: every seed recovers the cliques, so
    intra-clique agreement is 1.0, the bridge washes out to 0.0, and the
    consensus membership is exactly the two cliques."""
    from leidenalg_spark.operators.community import consensus_communities

    k5a = [(a, b, 1.0) for a in range(5) for b in range(a + 1, 5)]
    k5b = [(a + 5, b + 5, 1.0) for a in range(5) for b in range(a + 1, 5)]
    e = spark.createDataFrame(k5a + k5b + [(4, 5, 1.0)], "src long, dst long, weight double")
    membership, agreement = consensus_communities(
        spark, e, n_runs=3, threshold=0.5, local_threshold=10**6
    )
    comms = {r.id: r.comm for r in membership.collect()}
    assert len({comms[i] for i in range(5)}) == 1
    assert len({comms[i] for i in range(5, 10)}) == 1
    assert comms[0] != comms[5]
    ag = {(r.src, r.dst): r.agree for r in agreement.collect()}
    assert ag[(4, 5)] == 0.0
    assert all(v == 1.0 for (s, d), v in ag.items() if (s, d) != (4, 5))


def test_community_conductance_two_triangles(spark):
    """Two triangles joined by one bridge, hand-computed: per side
    w_in=3, w_cut=1, vol=7, conductance=1/7, density=1, expansion=1/3,
    cut_ratio=1/9."""
    from leidenalg_spark.operators.community import community_conductance

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0),
         (3, 4, 1.0), (4, 5, 1.0), (3, 5, 1.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    m = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "id long, comm long"
    )
    rows = {r.comm: r for r in community_conductance(e, m).collect()}
    for c in (0, 1):
        r = rows[c]
        assert r.n_vertices == 3 and r.w_in == 3.0 and r.w_cut == 1.0
        assert r.volume == 7.0
        assert abs(r.conductance - 1.0 / 7.0) < 1e-6
        assert r.internal_density == 1.0
        assert abs(r.expansion - 1.0 / 3.0) < 1e-6
        assert abs(r.cut_ratio - 1.0 / 9.0) < 1e-6


def test_community_conductance_degenerates_null(spark):
    """Single community holding the whole graph: min(vol, 2W-vol)=0 →
    conductance NULL; singleton community → density NULL, cut_ratio keyed
    on N-n>0 still defined."""
    from leidenalg_spark.operators.community import community_conductance

    e = spark.createDataFrame([(0, 1, 2.0)], "src long, dst long, weight double")
    one = spark.createDataFrame([(0, 0), (1, 0)], "id long, comm long")
    r = community_conductance(e, one).collect()[0]
    assert r.conductance is None and r.w_cut == 0.0 and r.w_in == 2.0
    split = spark.createDataFrame([(0, 0), (1, 1)], "id long, comm long")
    rows = {x.comm: x for x in community_conductance(e, split).collect()}
    assert rows[0].internal_density is None
    assert rows[0].conductance == 1.0  # w_cut=2 / min(2, 2)
    assert rows[0].cut_ratio == 2.0  # 2 / (1*(2-1))


def test_mixing_parameter_two_triangles_bridge(spark):
    """Two triangles + bridge: bridge endpoints have μ = 1/3, interior
    vertices μ = 0."""
    from leidenalg_spark.operators.community import mixing_parameter

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0),
         (3, 4, 1.0), (4, 5, 1.0), (3, 5, 1.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    m = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "id long, comm long"
    )
    out = {r.id: r for r in mixing_parameter(e, m).collect()}
    assert abs(out[2].mu - 1 / 3) < 1e-6 and abs(out[3].mu - 1 / 3) < 1e-6
    for v in (0, 1, 4, 5):
        assert out[v].mu == 0.0
    assert out[2].strength == 3.0 and out[2].w_external == 1.0
