"""Round-3 distributed upgrades: T5 renumber, O8 candidate modes at scale,
fast ephemeral checkpointing, and the Surprise stalled-refinement guard.

Reference parity targets cited per test (vtraag/leidenalg):
- renumber: src/leidenalg/VertexPartition.py:259-267
- fixed-label preservation: tests/test_Optimiser.py:145-164
- ALL_COMMS negative-weight bipartite golden: tests/test_Optimiser.py:167-175
"""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from leidenalg_spark.localcore import OptimiserOpts, QualitySpec
from leidenalg_spark.localcore.optimiser import (
    ALL_COMMS,
    RAND_COMM,
    RAND_NEIGH_COMM,
)
from leidenalg_spark.operators.leiden import leiden, renumber_membership
from leidenalg_spark.operators.multiplex import leiden_multiplex


def _k5050(spark):
    """Complete bipartite K50,50, weight -0.1 (the reference ALL_COMMS
    golden, tests/test_Optimiser.py:167-175)."""
    rows = [(a, 50 + b, -0.1) for a in range(50) for b in range(50)]
    return spark.createDataFrame(rows, "src long, dst long, weight double")


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


# --------------------------------------------------------------- T5 renumber
def test_renumber_membership_dense_size_ordered(spark):
    memb = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 7), (5, 7), (6, 999), (7, 42), (8, 42)],
        "id long, comm long",
    )
    out = {r["id"]: r["comm"] for r in renumber_membership(memb).collect()}
    # sizes: comm 100 -> 3, comm 7 -> 2 (min id 4), comm 42 -> 2 (min id 7),
    # comm 999 -> 1; ties by smallest member id
    assert out == {1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 7: 2, 8: 2, 6: 3}


def test_distributed_leiden_returns_renumbered_labels(spark):
    e = _planted_two(spark)
    res = leiden(spark, e, method="modularity", n_iterations=2, seed=5,
                 local_threshold=0, max_supersteps=30)
    rows = res.membership.groupBy("comm").agg(
        F.count(F.lit(1)).alias("sz"), F.min("id").alias("mn")
    ).orderBy("comm").collect()
    labels = [int(r["comm"]) for r in rows]
    assert labels == list(range(len(labels))), "labels must be dense 0..C-1"
    sizes = [int(r["sz"]) for r in rows]
    assert sizes == sorted(sizes, reverse=True), "labels must be size-ordered"
    # local path (same graph under the threshold) produces the same dense
    # relabelling convention
    res_local = leiden(spark, e, method="modularity", n_iterations=2, seed=5)
    local_labels = sorted(
        int(r["comm"]) for r in res_local.membership.select("comm").distinct().collect()
    )
    assert local_labels == list(range(len(local_labels)))


def test_distributed_fixed_labels_not_renumbered(spark):
    # reference test_Optimiser.py:145-164: fixed vertices keep their labels
    e = _planted_two(spark)
    fixed = spark.createDataFrame([(0,)], "id long")
    init = spark.createDataFrame([(0, 12345)], "id long, comm long")
    res = leiden(spark, e, method="modularity", n_iterations=2, seed=5,
                 local_threshold=0, max_supersteps=30,
                 initial_membership=init, fixed=fixed)
    lbl = res.membership.where("id = 0").first()["comm"]
    assert int(lbl) == 12345


# ------------------------------------------------------ O8 distributed modes
def test_all_comms_distributed_k5050_golden(spark):
    res = leiden(
        spark, _k5050(spark), method="cpm", gamma=-0.1, n_iterations=3, seed=3,
        local_threshold=0, opts=OptimiserOpts(seed=3, consider_comms=ALL_COMMS),
    )
    sizes = sorted(
        r["n"] for r in res.membership.groupBy("comm").agg(F.count("*").alias("n")).collect()
    )
    assert sizes == [50, 50]


def test_all_comms_multiplex_k5050_golden(spark):
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
    labels = sorted(r["comm"] for r in res.membership.select("comm").distinct().collect())
    assert labels == [0, 1]  # T5 renumber flows through the multiplex path


@pytest.mark.parametrize("mode", [RAND_NEIGH_COMM, RAND_COMM])
def test_rand_modes_distributed_converge(spark, mode):
    e = _planted_two(spark)
    res = leiden(spark, e, method="modularity", n_iterations=8, seed=5,
                 local_threshold=0, max_supersteps=60,
                 opts=OptimiserOpts(seed=5, consider_comms=mode))
    assert res.membership.select("comm").distinct().count() == 2
    assert res.quality > 0.4


def test_salted_superstep_rejects_nondefault_mode(spark):
    e = _planted_two(spark)
    with pytest.raises(ValueError, match="ALL_NEIGH_COMMS"):
        leiden(spark, e, method="modularity", n_iterations=1, seed=1,
               local_threshold=0, hub_salt=4, max_supersteps=2,
               opts=OptimiserOpts(seed=1, consider_comms=ALL_COMMS))


# --------------------------------------------------- fast ephemeral checkpoints
def test_ephemeral_checkpoint_blocks_released(spark):
    """Retention 3: after many saves only the last 3 steps' blocks remain;
    close() releases everything."""
    from leidenalg_spark.operators.checkpoint import CheckpointManager

    jsc = spark.sparkContext._jsc

    def _ids():
        return {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}

    before = _ids()
    cm = CheckpointManager(spark)
    df = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    out = None
    for step in range(8):
        out = cm.save(df.withColumn("step", F.lit(step)), "state", step)
    new_ids = _ids() - before
    assert len(new_ids) <= 3, f"retention should bound live checkpoints, got {len(new_ids)}"
    assert out.count() == 100  # newest step still readable
    out = out.localCheckpoint(eager=True)  # caller barrier, as the kernels do
    cm.close()
    after_close = _ids() - before
    # only the caller's own barrier RDD may remain
    assert len(after_close) <= 1
    out.unpersist()


def test_ephemeral_checkpoint_observation_fires(spark):
    from pyspark.sql import Observation

    from leidenalg_spark.operators.checkpoint import CheckpointManager

    cm = CheckpointManager(spark)
    obs = Observation()
    df = spark.range(50).observe(obs, F.count(F.lit(1)).alias("cnt"))
    out = cm.save(df, "obs_state", 0)
    assert obs.get["cnt"] == 50
    out.localCheckpoint(eager=True)
    cm.close()


def test_ephemeral_large_state_spills_to_parquet(spark, monkeypatch):
    from leidenalg_spark.operators.checkpoint import CheckpointManager

    cm = CheckpointManager(spark)
    cm._lc_max_bytes = 1  # force the spill decision on the first save
    df = spark.range(1000).select("id")
    cm.save(df, "big", 0)
    assert "big" in cm._parquet_names
    out2 = cm.save(df, "big", 1)  # parquet path now
    assert out2.count() == 1000
    cm.close()


# ------------------------------------------------- surprise stall guard (Q6)
def test_surprise_stall_path_is_silent_and_exact(spark):
    """Since round 4 the distributed move phase optimises the TRUE
    Surprise ΔQ (no RBER surrogate), so a level that stalls above
    local_finish_threshold needs no warning and emits no
    leiden_surprise_stall metric — the membership it keeps was already
    optimised under the exact objective."""
    import warnings

    e = _planted_two(spark)
    ids = e.select(F.col("src").alias("id")).unionByName(
        e.select(F.col("dst").alias("id"))
    ).distinct()
    # all vertices fixed -> no moves, refinement collapses nothing, the
    # coarse graph equals the input and exceeds threshold 0 -> stall path
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        res = leiden(
            spark, e, method="surprise", n_iterations=1, seed=1,
            local_threshold=0, local_finish_threshold=0, max_supersteps=3,
            fixed=ids,
        )
    assert not [w for w in caught if "refinement stalled" in str(w.message)]
    stall = [m for m in res.metrics if m.get("name") == "leiden_surprise_stall"]
    assert stall == []


# ------------------------------------------------- betweenness + warm-start PR
def _brandes_exact(adj, nodes):
    """Pure-Python exact Brandes (undirected, unweighted) for the golden."""
    from collections import deque

    bc = {v: 0.0 for v in nodes}
    for s in nodes:
        dist = {s: 0}
        sigma = {v: 0.0 for v in nodes}
        sigma[s] = 1.0
        order = []
        preds = {v: [] for v in nodes}
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist.get(w) == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in nodes}
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return {v: x / 2.0 for v, x in bc.items()}


def test_betweenness_exact_matches_brandes(spark):
    """Full-graph exactness of the (pre-existing) bounded-distance Brandes
    kernel: max_dist ≥ diameter + all sources == textbook betweenness,
    checked against an independent pure-Python Brandes."""
    import collections

    from leidenalg_spark.operators.kernels import betweenness_centrality

    # two triangles joined by a path through a cut vertex — asymmetric bc
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (5, 6), (4, 6)]
    e = spark.createDataFrame([(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double")
    nodes = sorted({x for p in pairs for x in p})
    adj = collections.defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    exp = _brandes_exact(adj, nodes)
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(spark, e, max_dist=8).collect()
    }
    for v in nodes:
        assert abs(got[v] - exp[v]) < 1e-9, (v, got[v], exp[v])


def test_pagerank_warm_start_same_fixed_point(spark):
    from leidenalg_spark.operators.kernels import pagerank

    e = _planted_two(spark)
    cold = pagerank(spark, e, directed=False, max_iter=60, tol=1e-10)
    warm = pagerank(spark, e, directed=False, max_iter=5, tol=1e-10, init_ranks=cold)
    j = cold.withColumnRenamed("rank", "rc").join(warm, "id")
    diff = j.agg(F.max(F.abs(F.col("rank") - F.col("rc")))).first()[0]
    assert diff < 1e-9  # warm start converges to the identical fixed point


def test_local_finish_ceiling_warns(spark):
    """A user-supplied threshold that implies a multi-GB driver collect
    must warn up front (VERDICT r2 'What's wrong' #4)."""
    e = _planted_two(spark)
    with pytest.warns(UserWarning, match="collected to the driver"):
        leiden(spark, e, method="modularity", n_iterations=1, seed=1,
               local_finish_threshold=100_000_000)


@pytest.mark.parametrize("mode", [RAND_NEIGH_COMM, RAND_COMM])
def test_rand_modes_multiplex_distributed_converge(spark, mode):
    rows = []
    random.seed(11)
    for c in range(2):
        ids = list(range(c * 15, c * 15 + 15))
        for a, b in itertools.combinations(ids, 2):
            if random.random() < 0.7:
                rows.append((a, b, 1.0, 0))
    for _ in range(5):
        rows.append((random.randrange(0, 15), random.randrange(15, 30), 1.0, 0))
    edges = spark.createDataFrame(rows, "src long, dst long, weight double, layer int")
    res = leiden_multiplex(
        spark, edges, [QualitySpec("modularity")], n_iterations=6, seed=5,
        local_threshold=0, max_supersteps=60,
        opts=OptimiserOpts(seed=5, consider_comms=mode),
    )
    assert res.membership.select("comm").distinct().count() == 2


def test_ephemeral_checkpoint_stats_stay_bounded(spark):
    """localCheckpoint carries origin sizeInBytes; joining the state k
    times per step raises it to the k-th power — without the cap the
    digit count grows geometrically until BigInt stats estimation melts
    the driver (the round-3 multiplex hang).  Assert the carried
    estimate stays bounded across a triple-self-join save chain."""
    from leidenalg_spark.operators.checkpoint import CheckpointManager

    cm = CheckpointManager(spark)
    m = spark.range(200).select(F.col("id"), (F.col("id") * 2).alias("v"))
    for step in range(8):
        big = (
            m.join(m.withColumnRenamed("v", "w"), "id")
            .join(m.withColumnRenamed("v", "u"), "id")
            .select("id", "v")
        )
        m = cm.save(big, "stats_chain", step)
    try:
        sz = int(m._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        digits = len(str(sz))
    except ValueError:
        digits = 10_000  # >4300-digit conversion guard tripped: exploded
    assert digits <= 25, f"carried sizeInBytes exploded to {digits} digits"
    assert m.count() == 200
    m.localCheckpoint(eager=True)
    cm.close()
