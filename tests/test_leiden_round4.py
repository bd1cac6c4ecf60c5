"""Round-4 distributed upgrades: EXACT Surprise ΔQ in the distributed move
phase (no RBER surrogate), the |C|-gated cross-mode stats attach
(ALL_COMMS/RAND_COMM broadcast only below _BCAST_COMMS), RAND_COMM sampling
by member-vertex COUNT, and the salted RAND_NEIGH_COMM gather.

Reference parity targets cited per test (vtraag/leidenalg):
- Surprise ΔQ / quality: src/leidenalg/VertexPartition.py:470-492
- RAND_COMM sampling weight: src/leidenalg/Optimiser.py:104-106
- ALL_COMMS negative-weight golden: tests/test_Optimiser.py:167-175
"""

from __future__ import annotations

import itertools
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from leidenalg_spark.localcore import (
    LocalPartition,
    OptimiserOpts,
    QualitySpec,
    optimise_partition,
)
from leidenalg_spark.localcore.optimiser import (
    ALL_COMMS,
    ALL_NEIGH_COMMS,
    RAND_COMM,
    RAND_NEIGH_COMM,
)
from leidenalg_spark.localcore.quality import possible_pairs
from leidenalg_spark.operators import leiden as leiden_mod
from leidenalg_spark.operators.leiden import (
    _level_setup,
    _pairs_col,
    _superstep_moves,
    leiden,
)
from leidenalg_spark.sources import fixtures as fx


def _planted_two(spark, seed=7):
    random.seed(seed)
    rows = []
    for c in range(2):
        ids = list(range(c * 20, c * 20 + 20))
        for a, b in itertools.combinations(ids, 2):
            if random.random() < 0.6:
                rows.append((a, b, 1.0))
    for _ in range(8):
        rows.append((random.randrange(0, 20), random.randrange(20, 40), 1.0))
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def _hub_graph(spark, seed=13):
    """Hub 0 touching every other vertex plus two planted random groups —
    the shared fixture of the salted-vs-unsalted parity tests (one copy,
    so the three tests provably run the same graph)."""
    random.seed(seed)
    rows = [(0, v, 0.5) for v in range(1, 40)]
    for c in range(2):
        ids = list(range(1 + c * 19, 1 + c * 19 + 19))
        for a, b in itertools.combinations(ids, 2):
            if random.random() < 0.5:
                rows.append((a, b, 1.0))
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def _edges_df(spark, fix):
    n, s, d, w = fix[:4]
    if w is None:
        w = np.ones(len(s))
    return spark.createDataFrame(
        [(int(a), int(b), float(x)) for a, b, x in zip(s, d, w)],
        "src long, dst long, weight double",
    )


def _superstep_inputs(spark, fix, membership, method, mode=ALL_NEIGH_COMMS,
                      node_sizes=None, gamma=1.0):
    """Build `_superstep_moves` inputs exactly as `_move_phase` does
    (operators/leiden.py — mstats ⋈ cstats attach, kl scalars for
    surprise), for unit-level candidate-table assertions."""
    from leidenalg_spark.operators.leiden import _stat_needs

    spec = QualitySpec(method, gamma=gamma)
    edges = _edges_df(spark, fix)
    ns_df = None
    if node_sizes is not None:
        ns_df = spark.createDataFrame(
            [(int(i), float(s)) for i, s in node_sizes.items()],
            "id long, node_size double",
        )
    edges_sym, vstats, W, n_tot, loop_tot, n_verts = _level_setup(
        spark, edges, False, ns_df, 0, 8
    )
    pairs_tot = float(possible_pairs(n_tot, False, spec.correct_self_loops))
    p_global = W / pairs_tot if pairs_tot > 0 else 0.0
    memb_df = spark.createDataFrame(
        [(int(i), int(c)) for i, c in membership.items()], "id long, comm long"
    )
    mstats = memb_df.join(vstats, "id")
    needs = _stat_needs(method, False, False, mode=mode)
    agg_cols = []
    if "K_out" in needs:
        agg_cols.append(F.sum("k_out").alias("Ka_out"))
    if "n" in needs:
        agg_cols.append(F.sum("node_size").alias("na"))
    if "cnt" in needs:
        agg_cols.append(F.count(F.lit(1)).cast("double").alias("cnta"))
    cstats = mstats.groupBy("comm").agg(*agg_cols)
    kl = None
    if method in ("significance", "surprise"):
        m_src = memb_df.select(F.col("id").alias("src"), F.col("comm").alias("cs"))
        m_dst = memb_df.select(F.col("id").alias("dst"), F.col("comm").alias("cd"))
        w_in = (
            edges.join(m_src, "src").join(m_dst, "dst")
            .where(F.col("cs") == F.col("cd"))
            .groupBy(F.col("cs").alias("comm"))
            .agg(F.sum("weight").alias("wa"))
        )
        cstats = cstats.join(w_in, "comm", "left").na.fill({"wa": 0.0})
        row = cstats.agg(
            F.coalesce(F.sum("wa"), F.lit(0.0)).alias("sw"),
            F.coalesce(F.sum(_pairs_col(F.col("na"), False, False)), F.lit(0.0)).alias("sp"),
        ).first()
        kl = (float(row["sw"]), float(row["sp"]))
    aug = mstats.join(cstats, "comm")
    return dict(
        edges_sym=edges_sym, aug=aug, cstats=cstats, spec=spec, W=W,
        p_global=p_global, n_tot=n_tot, kl=kl,
    )


# ------------------------------------------------- exact distributed Surprise
def test_surprise_distributed_dq_parity(spark):
    """The distributed superstep's per-vertex best (new_comm, dq) under
    method='surprise' equals localcore diff_move_many's arg-max over the
    neighbour communities ∪ the O9 empty slot — the exact global-KL ΔQ
    (reference VertexPartition.py:470-492), not a surrogate."""
    # seed 13 has no isolated vertices — the distributed world's vertex
    # universe (edge-touching ids) must equal the localcore graph's
    fix = fx.with_random_weights(fx.erdos_renyi(40, 0.1, seed=13), seed=12)
    g = fx.to_local_graph(fix)
    rng = np.random.default_rng(5)
    memb = rng.integers(0, 6, size=g.n)
    inp = _superstep_inputs(
        spark, fix, {i: int(c) for i, c in enumerate(memb)}, "surprise"
    )
    cand = _superstep_moves(
        inp["edges_sym"], inp["aug"], inp["spec"], False, inp["W"],
        inp["p_global"], inp["n_tot"], step=1, seed=0, n_shuffle=8,
        opts=OptimiserOpts(), kl_scalars=inp["kl"],
    )
    got = {int(r["id"]): (int(r["new_comm"]), float(r["dq"])) for r in cand.collect()}

    P = LocalPartition([(g, QualitySpec("surprise"))], membership=list(memb))
    for v in range(g.n):
        comms, wo, wi = P.gather(v)
        cands = np.append(comms, P.empty_slot()).astype(np.int64)
        wo_v = [np.append(wo[0], 0.0)]
        wi_v = [np.append(wi[0], 0.0)]
        dqs = P.diff_move_many(v, cands, wo_v, wi_v)
        sel = cands != memb[v]
        best = float(dqs[sel].max())
        nc, dq = got[v]
        assert dq == pytest.approx(best, rel=1e-9, abs=1e-9), (v, nc, dq, best)
        # unique real-community arg-max must agree on the target too
        real = sel & (cands != cands[-1])
        if real.any() and dqs[real].max() > best - 1e-12 and \
                (dqs[real] > dqs[real].max() - 1e-9).sum() == 1:
            assert nc == int(cands[real][np.argmax(dqs[real])])


def test_surprise_distributed_beats_rber_surrogate(spark):
    """End-to-end golden for VERDICT r3 item 2: on a graph where the exact
    Surprise optimum differs from the RBER(γ=1) surrogate's, a PURELY
    distributed run (local_finish_threshold=0 — the exact local finish
    never executes) must reach a higher exact Surprise quality than the
    same pipeline steered by the old surrogate objective."""
    from leidenalg_spark.functions.quality import quality as df_quality

    fix = fx.with_random_weights(fx.erdos_renyi(30, 0.1, seed=2), seed=3)
    e = _edges_df(spark, fix)
    kw = dict(n_iterations=2, seed=3, local_threshold=0,
              local_finish_threshold=0, max_supersteps=40)
    res_s = leiden(spark, e, method="surprise", **kw)
    res_r = leiden(spark, e, method="rber", gamma=1.0, **kw)
    q_s = df_quality(e, res_s.membership, "surprise", 1.0, False)
    q_r = df_quality(e, res_r.membership, "surprise", 1.0, False)
    assert q_s > q_r + 1e-6, (q_s, q_r)
    # sanity vs the sequential exact optimiser: same ballpark
    g = fx.to_local_graph(fix)
    P = LocalPartition([(g, QualitySpec("surprise"))])
    optimise_partition(P)
    assert q_s >= 0.85 * P.quality(), (q_s, P.quality())


def test_surprise_guard_monitors_exact_objective(spark):
    """The monotone-commit guard now scores TRUE Surprise: surviving
    committed supersteps are non-decreasing in the exact evaluator."""
    from leidenalg_spark.functions.quality import quality as df_quality
    from leidenalg_spark.operators.checkpoint import CheckpointManager

    import os
    import tempfile

    e = _planted_two(spark)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "sup")
        ckpt = CheckpointManager(spark, path)
        res = leiden(
            spark, e, method="surprise", n_iterations=1, seed=7,
            local_threshold=0, max_supersteps=12, ckpt=ckpt, finish=False,
        )
        steps = sorted(
            int(p.split("=")[1]) for p in os.listdir(os.path.join(path, "membership"))
        )
        qs = {k: df_quality(e, ckpt.load("membership", k), "surprise", 1.0, False)
              for k in steps}
        bad = set()
        last_saved = None
        for m in res.metrics:
            if m.get("name") == "membership":
                last_saved = m["step"]
            elif m.get("name") == "leiden_rollback":
                if "bad_steps" in m:
                    bad.update(m["bad_steps"])
                elif last_saved is not None:
                    bad.add(last_saved)
        seq = [qs[k] for k in steps if k not in bad]
        for a, b in zip(seq, seq[1:]):
            assert b >= a - 1e-9, (seq, bad)


@pytest.mark.parametrize("mode", [ALL_COMMS, RAND_NEIGH_COMM])
def test_surprise_with_o8_modes_converges_monotone(spark, mode):
    """Exact Surprise composes with the non-default O8 candidate modes:
    the cross path (ALL_COMMS) computes w_va by window over the
    crossJoined candidate table, the RAND path carries the full exact dq
    through the ES pick — both must converge with non-decreasing guard
    quality and find the planted split."""
    from leidenalg_spark.functions.quality import quality as df_quality

    e = _planted_two(spark)
    res = leiden(
        spark, e, method="surprise", n_iterations=4, seed=5,
        local_threshold=0, max_supersteps=40,
        opts=OptimiserOpts(seed=5, consider_comms=mode),
    )
    assert res.membership.select("comm").distinct().count() == 2
    q = df_quality(e, res.membership, "surprise", 1.0, False)
    assert q > 0 and abs(q - res.quality) < 1e-6


def test_salted_surprise_rand_neigh_matches_unsalted(spark):
    """Salted Surprise composed with RAND_NEIGH_COMM (O8): the ES pick key
    is unchanged, the exact surprise gb rides the pick struct — must stay
    bit-identical to the unsalted run."""
    e = _hub_graph(spark)
    kw = dict(method="surprise", n_iterations=2, seed=11, local_threshold=0,
              max_supersteps=25,
              opts=OptimiserOpts(seed=11, consider_comms=RAND_NEIGH_COMM))
    m0 = {r["id"]: r["comm"] for r in leiden(spark, e, **kw).membership.collect()}
    m4 = {r["id"]: r["comm"]
          for r in leiden(spark, e, hub_salt=4, **kw).membership.collect()}
    assert m0 == m4


def test_salted_surprise_max_comm_size_matches_unsalted(spark):
    """Salted Surprise composed with O10 (max_comm_size): the candidate-
    side constraint gate on the partial arg-max and the a-side penalty on
    the winners table must both apply to the exact-surprise gb — value-
    equal to the unsalted constrained run, and the cap must hold."""
    e = _planted_two(spark)
    kw = dict(method="surprise", n_iterations=2, seed=9, local_threshold=0,
              max_supersteps=30,
              opts=OptimiserOpts(seed=9, max_comm_size=15,
                                 community_constraint_enforcement=0))
    r0 = leiden(spark, e, **kw)
    r4 = leiden(spark, e, hub_salt=3, **kw)
    m0 = {r["id"]: r["comm"] for r in r0.membership.collect()}
    m4 = {r["id"]: r["comm"] for r in r4.membership.collect()}
    assert m0 == m4
    from collections import Counter

    assert max(Counter(m4.values()).values()) <= 15


def test_salted_surprise_matches_unsalted_on_hub_graph(spark):
    """VERDICT r4 #6: salted Surprise via the two-phase w_va recovery
    (persisted gather → n-row w_va collapse → k×-replicated merge join)
    must equal the unsalted exact path on a hub-heavy graph — the r4
    refusal is retired."""
    e = _hub_graph(spark)
    kw = dict(method="surprise", n_iterations=2, seed=11, local_threshold=0,
              max_supersteps=25)
    r0 = leiden(spark, e, **kw)
    r4 = leiden(spark, e, hub_salt=4, **kw)
    m0 = {r["id"]: r["comm"] for r in r0.membership.collect()}
    m4 = {r["id"]: r["comm"] for r in r4.membership.collect()}
    assert m0 == m4
    assert abs(r0.quality - r4.quality) < 1e-9


# ------------------------------------------- |C|-gated cross-mode stats attach
def test_all_comms_stats_attach_gated_on_n_comm(spark):
    """VERDICT r3 finding #1: the ALL_COMMS/RAND_COMM candidate attach must
    broadcast the community-stats side only when n_comm ≤ _BCAST_COMMS; at
    vertex-scale |C| it has to fall back to a non-broadcast cartesian
    (shuffle-streamed) plan.  Values must be identical either way."""
    fix = fx.with_random_weights(fx.erdos_renyi(25, 0.15, seed=4), seed=5)
    memb = {i: i % 5 for i in range(25)}
    inp = _superstep_inputs(spark, fix, memb, "cpm", mode=ALL_COMMS, gamma=0.05)
    opts = OptimiserOpts(consider_comms=ALL_COMMS)

    def run(n_comm):
        return _superstep_moves(
            inp["edges_sym"], inp["aug"], inp["spec"], False, inp["W"],
            inp["p_global"], inp["n_tot"], step=1, seed=0, n_shuffle=8,
            opts=opts, comm_stats=inp["cstats"], n_comm=n_comm,
        )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        small = run(n_comm=5)            # ≤ gate → broadcast hint
        big = run(n_comm=10**9)          # > gate → no hint, cartesian
        plan_small = small._jdf.queryExecution().executedPlan().toString()
        plan_big = big._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan_small
        assert "BroadcastNestedLoopJoin" not in plan_big
        assert "CartesianProduct" in plan_big
        rows_s = {int(r["id"]): (int(r["new_comm"]), round(float(r["dq"]), 9))
                  for r in small.collect()}
        rows_b = {int(r["id"]): (int(r["new_comm"]), round(float(r["dq"]), 9))
                  for r in big.collect()}
        assert rows_s == rows_b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_all_comms_requires_n_comm(spark):
    """VERDICT r4 hardening #4: a cross-mode call that omits n_comm must
    raise instead of silently defaulting to broadcast (the default-path
    OOM the |C| gate exists to prevent)."""
    fix = fx.with_random_weights(fx.erdos_renyi(25, 0.15, seed=4), seed=5)
    memb = {i: i % 5 for i in range(25)}
    inp = _superstep_inputs(spark, fix, memb, "cpm", mode=ALL_COMMS, gamma=0.05)
    opts = OptimiserOpts(consider_comms=ALL_COMMS)
    with pytest.raises(ValueError, match="n_comm"):
        _superstep_moves(
            inp["edges_sym"], inp["aug"], inp["spec"], False, inp["W"],
            inp["p_global"], inp["n_tot"], step=1, seed=0, n_shuffle=8,
            opts=opts, comm_stats=inp["cstats"], n_comm=None,
        )


def test_all_comms_k5050_golden_with_tiny_gate(spark, monkeypatch):
    """The reference ALL_COMMS golden (tests/test_Optimiser.py:167-175)
    still lands with _BCAST_COMMS forced to 0 — i.e. the whole run takes
    the shuffle fallback and completes correctly."""
    monkeypatch.setattr(leiden_mod, "_BCAST_COMMS", 0)
    rows = [(a, 50 + b, -0.1) for a in range(50) for b in range(50)]
    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    res = leiden(
        spark, e, method="cpm", gamma=-0.1, n_iterations=3, seed=3,
        local_threshold=0, opts=OptimiserOpts(seed=3, consider_comms=ALL_COMMS),
    )
    sizes = sorted(
        r["n"] for r in res.membership.groupBy("comm").agg(F.count("*").alias("n")).collect()
    )
    assert sizes == [50, 50]


def test_multiplex_all_comms_gate_fallback(spark, monkeypatch):
    """multiplex.py's twin cross-mode attach honours the same gate."""
    from leidenalg_spark.operators.multiplex import leiden_multiplex

    monkeypatch.setattr(leiden_mod, "_BCAST_COMMS", 0)
    rows = [(a, 50 + b, -0.1, 0) for a in range(50) for b in range(50)]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double, layer int")
    res = leiden_multiplex(
        spark, edges, [QualitySpec("cpm", gamma=-0.1)], n_iterations=3, seed=3,
        local_threshold=0, opts=OptimiserOpts(seed=3, consider_comms=ALL_COMMS),
    )
    sizes = sorted(
        r["n"] for r in res.membership.groupBy("comm").agg(F.count("*").alias("n")).collect()
    )
    assert sizes == [50, 50]


# --------------------------------------------- RAND_COMM samples by COUNT
def test_rand_comm_samples_by_count_not_mass(spark):
    """Reference Optimiser.py:104-106: RAND_COMM picks a community with
    probability ∝ its member-vertex COUNT.  With node_sizes making one
    1-vertex community carry enormous mass, mass-weighting would send
    ~90% of probe picks there; count-weighting keeps it at ~1/|C|."""
    # 60 probe vertices in singleton comms, two target comms: X = vertices
    # 100..119 (20 members, unit size), Y = vertex 200 (1 member, size 500)
    src, dst, wt = [], [], []
    for v in range(60):  # probes ring (keeps them in the graph)
        src.append(v)
        dst.append((v + 1) % 60)
        wt.append(0.01)
    for i in range(19):  # X: a path through 100..119
        src.append(100 + i)
        dst.append(101 + i)
        wt.append(1.0)
    src.append(200)  # Y: massive single vertex, weakly attached
    dst.append(0)
    wt.append(0.01)
    fix = (201, np.array(src, dtype=np.int64), np.array(dst, dtype=np.int64),
           np.array(wt, dtype=np.float64))
    memb = {v: v for v in range(60)}
    for i in range(20):
        memb[100 + i] = 1000
    memb[200] = 2000
    sizes = {v: 1.0 for v in memb}
    sizes[200] = 500.0
    inp = _superstep_inputs(
        spark, fix, memb, "cpm", mode=RAND_COMM, node_sizes=sizes, gamma=0.0,
    )
    cand = _superstep_moves(
        inp["edges_sym"], inp["aug"], inp["spec"], False, inp["W"],
        inp["p_global"], inp["n_tot"], step=1, seed=9, n_shuffle=8,
        opts=OptimiserOpts(consider_comms=RAND_COMM, consider_empty_community=False),
        comm_stats=inp["cstats"], n_comm=62,
    )
    picks = [int(r["new_comm"]) for r in cand.collect() if r["id"] < 60]
    n_x = sum(1 for p in picks if p == 1000)
    n_y = sum(1 for p in picks if p == 2000)
    # count weights: P(X)=20/82, P(Y)=1/82 over 60 probes → E[X]≈15, E[Y]<1.
    # mass weights would give P(Y)≈500/601 → E[Y]≈50.  Huge margin.
    assert n_x > n_y, (n_x, n_y)
    assert n_y <= 6, (n_x, n_y)


# --------------------------------------------- salted RAND_NEIGH_COMM gather
def test_salted_rand_neigh_matches_unsalted(spark):
    """The salted RAND_NEIGH_COMM two-level Efraimidis–Spirakis arg-max is
    bit-identical to the unsalted path (same hash-keyed picks), even on a
    hub graph — VERDICT r3 item 6."""
    e = _hub_graph(spark)
    kw = dict(method="modularity", n_iterations=2, seed=11, local_threshold=0,
              max_supersteps=25,
              opts=OptimiserOpts(seed=11, consider_comms=RAND_NEIGH_COMM))
    m0 = {r["id"]: r["comm"] for r in leiden(spark, e, **kw).membership.collect()}
    m4 = {r["id"]: r["comm"]
          for r in leiden(spark, e, hub_salt=4, **kw).membership.collect()}
    assert m0 == m4
