"""Round-2 distributed Leiden contracts:

- recursive multi-level aggregation (no coarse bail-out): a graph whose
  level-1 coarse size exceeds the local-finish threshold must traverse a
  *distributed* second level and still converge to the local core's
  quality (reference Optimiser.py:294-355 semantics at scale);
- monotone-commit guard (SURVEY §4.3): per-committed-superstep realised
  quality is non-decreasing for every method;
- is_membership_fixed through the distributed supersteps (O11,
  tests/test_Optimiser.py:127-164 goldens);
- min/max community size in the distributed supersteps (O10,
  tests/test_Optimiser.py:20-38, 64-82 goldens);
- consider_empty_community in the distributed superstep (O9): CPM can
  split a merged community without refinement;
- node_sizes in single-layer distributed leiden (pre-aggregated CPM).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from leidenalg_spark.functions.quality import quality as df_quality
from leidenalg_spark.localcore import OptimiserOpts, find_partition_local
from leidenalg_spark.localcore.graph import LocalGraph
from leidenalg_spark.operators.checkpoint import CheckpointManager
from leidenalg_spark.operators.leiden import leiden
from leidenalg_spark.sources import fixtures as fx


def _df(spark, s, d, w=None):
    if w is None:
        w = np.ones(len(s))
    return spark.createDataFrame(
        pd.DataFrame({
            "src": np.asarray(s, dtype=np.int64),
            "dst": np.asarray(d, dtype=np.int64),
            "weight": np.asarray(w, dtype=np.float64),
        })
    )


def _ring_of_cliques(n_cliques=24, k=6, ring_w=1.0):
    """n_cliques k-cliques joined in a ring by single (weighted) edges."""
    s, d, w = [], [], []
    for c in range(n_cliques):
        base = c * k
        for i in range(k):
            for j in range(i + 1, k):
                s.append(base + i)
                d.append(base + j)
                w.append(1.0)
        s.append(base)
        d.append(((c + 1) % n_cliques) * k)
        w.append(ring_w)
    return np.array(s), np.array(d), np.array(w), n_cliques * k


# ---------------------------------------------------------------- multilevel
def test_multilevel_distributed_aggregation(spark):
    # ring weight 4.5 at gamma=0.1: level 0 settles on the 24 cliques (a
    # single vertex never pays to cross the ring), level 1 merges adjacent
    # cliques (4.5 > 0.1*36), level 2 is small enough for the exact local
    # finish — so the run MUST traverse a distributed second level: the
    # level-1 coarse graph (48 rows) exceeds local_finish_threshold=30
    s, d, w, n = _ring_of_cliques(24, 6, ring_w=4.5)
    e = _df(spark, s, d, w)
    ckpt = CheckpointManager(spark)
    res = leiden(
        spark, e, method="cpm", gamma=0.1, n_iterations=1, seed=5,
        local_threshold=0, max_supersteps=12, ckpt=ckpt,
        local_finish_threshold=30,
    )
    aggs = [m for m in res.metrics if m.get("name") == "leiden_aggregate"]
    assert any(m["finish"] == "distributed" for m in aggs), aggs
    assert any(m["finish"] == "local" for m in aggs), aggs
    # the distributed second level must have done real merge work
    lvl1 = [m for m in res.metrics if m.get("name") == "leiden_superstep" and m.get("level") == 1]
    assert lvl1 and sum(m["moves"] for m in lvl1) > 0, lvl1
    # optimum family: adjacent cliques pair up (a maximal matching on the
    # ring — greedy Leiden may leave non-adjacent cliques unpaired, which
    # the exact local core does too, so compare quality not the matching)
    g = LocalGraph(n, s, d, w)
    P = find_partition_local(g, "cpm", gamma=0.1, n_iterations=-1, seed=5)
    assert res.quality >= P.quality() - 1e-6
    memb = res.membership.toPandas().sort_values("id")["comm"].to_numpy()
    sizes = sorted(pd.Series(memb).value_counts().tolist(), reverse=True)
    assert set(sizes) <= {12, 6} and sizes[0] == 12 and sum(sizes) == n


def test_multilevel_stable_level_guard(spark):
    # gamma=0.5 makes the clique ring unmergeable: the coarse graph stops
    # shrinking while still above the finish threshold — the descent must
    # terminate via the stable-level guard, not recurse forever, and the
    # superstep-built cliques are already the exact optimum
    s, d, w, n = _ring_of_cliques(24, 6, ring_w=1.0)
    e = _df(spark, s, d, w)
    ckpt = CheckpointManager(spark)
    res = leiden(
        spark, e, method="cpm", gamma=0.5, n_iterations=1, seed=5,
        local_threshold=0, max_supersteps=12, ckpt=ckpt,
        local_finish_threshold=10,
    )
    assert any(m.get("name") == "leiden_level_stable" for m in res.metrics)
    g = LocalGraph(n, s, d, w)
    P = find_partition_local(g, "cpm", gamma=0.5, n_iterations=-1, seed=5)
    assert res.quality >= P.quality() - 1e-6
    memb = res.membership.toPandas().sort_values("id")["comm"].to_numpy()
    sizes = sorted(pd.Series(memb).value_counts().tolist(), reverse=True)
    assert sizes == 24 * [6]


# ------------------------------------------------------------ monotone guard
@pytest.mark.parametrize("method,gamma", [
    ("modularity", 1.0), ("cpm", 0.2), ("rber", 0.5),
    ("rbconfiguration", 0.7), ("significance", 1.0), ("surprise", 1.0),
])
def test_monotone_commit_guard(spark, tmp_path, method, gamma):
    # adversarial shape: two complete bipartite blocks sharing hubs — the
    # classic batched-move oscillator (groups of vertices trading places)
    rng = np.random.default_rng(3)
    fix = fx.erdos_renyi(60, 0.12, seed=3)
    n, s, d = fix[0], fix[1], fix[2]
    # overlay a dense bipartite core to invite mass simultaneous moves
    bs, bd = [], []
    for i in range(10):
        for j in range(10, 20):
            bs.append(i)
            bd.append(j)
    s = np.concatenate([s, bs])
    d = np.concatenate([d, bd])
    e = _df(spark, s, d)
    path = str(tmp_path / f"mono_{method}")
    ckpt = CheckpointManager(spark, path)
    res = leiden(
        spark, e, method=method, gamma=gamma, n_iterations=1, seed=7,
        local_threshold=0, max_supersteps=14, ckpt=ckpt, finish=False,
    )
    # the distributed move phase optimises every method EXACTLY (surprise
    # included since round 4: its global-KL ΔQ is evaluated per row against
    # the frozen per-superstep scalars), so the guard's objective is the
    # method itself
    me, ge = method, gamma
    steps = sorted(
        int(p.split("=")[1])
        for p in __import__("os").listdir(f"{path}/membership")
    )
    qs = {k: df_quality(e, ckpt.load("membership", k), me, ge) for k in steps}
    # a commit the guard detected as regressing is reverted at the next
    # superstep (leiden_rollback metric) — identify those bad indices from
    # the metrics stream and assert the SURVIVING commit sequence is
    # non-decreasing (the §4.3 contract)
    bad = set()
    last_saved = None
    for m in res.metrics:
        if m.get("name") == "membership":
            last_saved = m["step"]
        elif m.get("name") == "leiden_rollback":
            if "bad_steps" in m:
                # round-4 single-action flow: the rollback names every
                # non-surviving save (the regressed commit AND the
                # checkpoint derived from it before detection)
                bad.update(m["bad_steps"])
            elif last_saved is not None:
                bad.add(last_saved)
    good = [k for k in steps if k not in bad]
    seq = [qs[k] for k in good]
    for a, b in zip(seq, seq[1:]):
        assert b >= a - 1e-9, (method, seq, bad, qs)
    # regressions must actually have been caught when they occurred
    raw = [qs[k] for k in steps]
    regressed = any(b < a - 1e-9 for a, b in zip(raw, raw[1:]))
    if regressed:
        assert bad, (method, raw)


# ------------------------------------------------------------------- fixed
def test_fixed_membership_distributed_k3(spark):
    # reference golden (tests/test_Optimiser.py:127-143): K3, initial
    # [2,1,0], node 0 fixed -> everyone joins node 0's community, label 2
    e = _df(spark, [0, 0, 1], [1, 2, 2])
    init = spark.createDataFrame(pd.DataFrame({"id": [0, 1, 2], "comm": [2, 1, 0]}))
    fixed = spark.createDataFrame(pd.DataFrame({"id": [0]}))
    res = leiden(
        spark, e, method="cpm", gamma=0.1, n_iterations=2, seed=2,
        local_threshold=0, max_supersteps=8,
        initial_membership=init, fixed=fixed,
    )
    memb = res.membership.toPandas().sort_values("id")["comm"].to_numpy()
    assert list(memb) == [2, 2, 2]


def test_fixed_label_preserved_nonconsecutive_distributed(spark):
    # reference golden (tests/test_Optimiser.py:145-164): ER(100, 5%)
    # directed+loops, node 90 fixed at label 90 — label survives, and the
    # graph still aggregates into fewer communities than vertices
    fix = fx.erdos_renyi(100, 0.05, directed=True, loops=True, seed=4)
    n, s, d = fix[0], fix[1], fix[2]
    e = _df(spark, s, d)
    init = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(100, dtype=np.int64), "comm": np.arange(100, dtype=np.int64)})
    )
    fixed = spark.createDataFrame(pd.DataFrame({"id": [90]}))
    res = leiden(
        spark, e, method="modularity", n_iterations=2, seed=4, directed=True,
        local_threshold=0, max_supersteps=10,
        initial_membership=init, fixed=fixed,
    )
    pdf = res.membership.toPandas().set_index("id")["comm"]
    assert int(pdf.loc[90]) == 90
    assert pdf.nunique() < 100


# -------------------------------------------------------------- constraints
def test_max_comm_size_distributed_golden(spark):
    # reference golden (tests/test_Optimiser.py:30-38): K100, CPM gamma=0.5,
    # max 17, enforcement 100 -> sizes [17,17,17,17,17,15]
    f = fx.full(100)
    e = _df(spark, f[1], f[2])
    opts = OptimiserOpts(max_comm_size=17, community_constraint_enforcement=100, seed=6)
    res = leiden(
        spark, e, method="cpm", gamma=0.5, n_iterations=3, seed=6,
        local_threshold=0, max_supersteps=10, opts=opts,
    )
    memb = res.membership.toPandas().sort_values("id")["comm"].to_numpy()
    sizes = sorted(pd.Series(memb).value_counts().tolist(), reverse=True)
    assert sizes == [17, 17, 17, 17, 17, 15]


def test_min_comm_size_distributed_golden(spark):
    # reference golden (tests/test_Optimiser.py:20-28): K100, CPM gamma=1,
    # min 5, enforcement 10.  The reference's sequential trajectory ends
    # at exactly 20*[5]; on K100 at gamma=1 EVERY all->=5 partition scores
    # the same optimum (CPM contribution of a clique community is 0, and
    # zero size violations), so the distributed batch dynamics may land on
    # a different equally-optimal multiset (e.g. a 6 from two concurrent
    # fills racing) that is then refinement-atomic.  The semantic golden —
    # the constraint holds and the quality equals the reference optimum —
    # is asserted through the distributed path; the exact 20*[5] multiset
    # is asserted through the local core (test_localcore goldens), which
    # IS the reference's sequential dynamics.
    f = fx.full(100)
    e = _df(spark, f[1], f[2])
    opts = OptimiserOpts(min_comm_size=5, community_constraint_enforcement=10, seed=6)
    res = leiden(
        spark, e, method="cpm", gamma=1.0, n_iterations=1, seed=6,
        local_threshold=0, max_supersteps=10, opts=opts,
    )
    memb = res.membership.toPandas().sort_values("id")["comm"].to_numpy()
    sizes = sorted(pd.Series(memb).value_counts().tolist(), reverse=True)
    assert min(sizes) >= 5 and sum(sizes) == 100, sizes
    g = LocalGraph(100, f[1], f[2], np.ones(len(f[1])))
    P = find_partition_local(
        g, "cpm", gamma=1.0, n_iterations=-1, seed=6,
        min_comm_size=5, community_constraint_enforcement=10,
    )
    assert res.quality >= P.quality() - 1e-6


def test_max_comm_size_hard_gate_supersteps_only(spark):
    # enforcement 0 => hard candidate gate in the superstep itself: even
    # with no finish (no exact local repair), no community may exceed max
    f = fx.full(60)
    e = _df(spark, f[1], f[2])
    opts = OptimiserOpts(max_comm_size=10, seed=1)
    res = leiden(
        spark, e, method="cpm", gamma=0.2, n_iterations=1, seed=1,
        local_threshold=0, max_supersteps=8, opts=opts, finish=False,
    )
    memb = res.membership.toPandas()["comm"]
    assert memb.value_counts().max() <= 10


# ---------------------------------------------------------- empty community
def test_empty_candidate_splits_without_refinement(spark):
    # two 8-cliques + one bridge, everyone seeded into ONE community; with
    # finish=False there is no refinement and no neighbouring community to
    # move to — only the O9 empty candidate can split (CPM at high gamma
    # strictly prefers the split)
    f1 = fx.full(8)
    s = np.concatenate([f1[1], f1[1] + 8, [0]])
    d = np.concatenate([f1[2], f1[2] + 8, [8]])
    e = _df(spark, s, d)
    init = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(16, dtype=np.int64), "comm": np.zeros(16, dtype=np.int64)})
    )
    q0 = df_quality(e, init, "cpm", 0.9)
    res = leiden(
        spark, e, method="cpm", gamma=0.9, n_iterations=1, seed=9,
        local_threshold=0, max_supersteps=10, finish=False,
        initial_membership=init,
    )
    memb = res.membership.toPandas()["comm"]
    assert memb.nunique() > 1
    assert res.quality > q0


# ------------------------------------------------------------ temporal (O15)
def _slice_rows(T=3):
    """T identical two-clique slices as a (slice, src, dst, weight) table."""
    f = fx.full(6)
    s = np.concatenate([f[1], f[1] + 6])
    d = np.concatenate([f[2], f[2] + 6])
    rows = []
    for t in range(T):
        for a, b in zip(s, d):
            rows.append((t, int(a), int(b), 1.0))
    return pd.DataFrame(rows, columns=["slice", "src", "dst", "weight"])


def _assert_aligned_two_cliques(pdf, T=3):
    assert len(pdf) == 12 * T
    m0 = pdf[pdf["slice"] == 0].sort_values("id")["comm"].to_numpy()
    for t in range(T):
        mt = pdf[pdf["slice"] == t].sort_values("id")["comm"].to_numpy()
        assert len(set(mt[:6])) == 1 and len(set(mt[6:])) == 1
        assert mt[0] != mt[6]
        assert (mt == m0).all()  # coupling aligned the slices


def test_temporal_distributed_alignment(spark):
    # the local-core golden (test_temporal_slices_alignment) through the
    # DataFrame path with local_threshold=0: distributed multiplex
    # supersteps + per-slice remap must produce aligned two-clique comms
    from leidenalg_spark.operators.multiplex import find_partition_temporal_df

    slices = spark.createDataFrame(_slice_rows())
    memb, res = find_partition_temporal_df(
        spark, slices, method="cpm", gamma=0.4, interslice_weight=5.0,
        seed=2, local_threshold=0, n_iterations=1,
    )
    _assert_aligned_two_cliques(memb.toPandas())
    assert res.quality > 0


def test_temporal_general_coupling_star(spark):
    # T1 general coupling graph: a star around slice 0 (not the default
    # consecutive path) still aligns every slice through the hub slice
    from leidenalg_spark.operators.multiplex import find_partition_temporal_df

    slices = spark.createDataFrame(_slice_rows())
    coupling = spark.createDataFrame(
        pd.DataFrame({"slice_src": [0, 0], "slice_dst": [1, 2], "weight": [5.0, 5.0]})
    )
    memb, _ = find_partition_temporal_df(
        spark, slices, method="cpm", gamma=0.4, seed=2,
        local_threshold=0, n_iterations=1, coupling=coupling,
    )
    _assert_aligned_two_cliques(memb.toPandas())


# ----------------------------------------------------------------- node_size
def test_node_sizes_distributed_cpm(spark):
    # pre-aggregated ring of cliques: each 6-clique becomes one vertex with
    # node_size 6 and a self-loop of weight 15; distributed CPM over the
    # aggregate must equal the fine-graph quality of the clique partition
    # (T3 invariance through the distributed path, node_size != 1)
    n_cliques, k = 20, 6
    s_f, d_f, _w_f, n_fine = _ring_of_cliques(n_cliques, k)
    # coarse: ring edges + self loops
    cs = list(range(n_cliques)) + list(range(n_cliques))
    cd = [(c + 1) % n_cliques for c in range(n_cliques)] + list(range(n_cliques))
    cw = [1.0] * n_cliques + [15.0] * n_cliques
    ce = _df(spark, cs, cd, cw)
    ns = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n_cliques, dtype=np.int64),
                      "node_size": np.full(n_cliques, float(k))})
    )
    init = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n_cliques, dtype=np.int64),
                      "comm": np.arange(n_cliques, dtype=np.int64)})
    )
    res = leiden(
        spark, ce, method="cpm", gamma=0.5, n_iterations=1, seed=3,
        local_threshold=0, max_supersteps=6, finish=False,
        node_sizes=ns, initial_membership=init,
    )
    # fine-graph quality of "one community per clique"
    fine_e = _df(spark, s_f, d_f)
    fine_m = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n_fine, dtype=np.int64),
                      "comm": (np.arange(n_fine) // k).astype(np.int64)})
    )
    q_fine = df_quality(fine_e, fine_m, "cpm", 0.5)
    # the aggregate's singleton partition IS the clique partition; gamma=0.5
    # keeps cliques separate, so supersteps should not merge anything and
    # the (node_size-aware) quality must match the fine graph exactly
    assert np.isclose(res.quality, q_fine, atol=1e-9)
    memb = res.membership.toPandas()["comm"]
    assert memb.nunique() == n_cliques


def test_partial_seed_keeps_unseeded_vertices_distributed(spark):
    """Regression: a seed covering only part of the graph must not drop
    the unseeded vertices from the distributed path — they complete as
    singletons (label = own id), exactly like the local path."""
    # two triangles {0,1,2} and {10,11,12}; seed only the first one
    e = _df(spark, [0, 0, 1, 10, 10, 11], [1, 2, 2, 11, 12, 12])
    init = spark.createDataFrame(
        pd.DataFrame({"id": [0, 1, 2], "comm": [7, 7, 7]})
    )
    res = leiden(
        spark, e, method="modularity", n_iterations=2, seed=1,
        local_threshold=0, max_supersteps=8, initial_membership=init,
    )
    pdf = res.membership.toPandas().set_index("id")["comm"]
    assert set(pdf.index) == {0, 1, 2, 10, 11, 12}  # nobody dropped
    assert pdf.loc[[0, 1, 2]].nunique() == 1
    assert pdf.loc[[10, 11, 12]].nunique() == 1
    assert pdf.loc[0] != pdf.loc[10]


def test_fixed_without_seed_label_survives_local_path(spark):
    """Regression (O11): fixed labels must survive the dense<->label unmap
    of the driver-local solve even when no initial_membership is given."""
    # sparse ids 10/20/30 in one triangle — local path (small graph)
    e = _df(spark, [10, 10, 20], [20, 30, 30])
    fixed = spark.createDataFrame(pd.DataFrame({"id": [20]}))
    res = leiden(
        spark, e, method="cpm", gamma=0.1, n_iterations=2, seed=3,
        local_threshold=1000, fixed=fixed,
    )
    pdf = res.membership.toPandas().set_index("id")["comm"]
    # CPM gamma=0.1 merges the triangle; the fixed vertex anchors label 20
    assert int(pdf.loc[20]) == 20
    assert pdf.nunique() == 1
