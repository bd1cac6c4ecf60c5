"""Distributed Leiden operator tests: local-path parity (exact reference
semantics) and forced-distributed-path structural correctness."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from leidenalg_spark.functions.quality import quality as df_quality
from leidenalg_spark.localcore import LocalPartition, QualitySpec, find_partition_local
from leidenalg_spark.operators.leiden import leiden
from leidenalg_spark.sources import fixtures as fx


def _fixture_edges(spark, fix):
    n, s, d, w = fix[:4]
    if w is None:
        w = np.ones(len(s))
    return n, spark.createDataFrame(
        pd.DataFrame({"src": s.astype("int64"), "dst": d.astype("int64"), "weight": w.astype("float64")})
    )


def test_leiden_local_path_components(spark):
    n, e = _fixture_edges(spark, fx.forest(10, 10, 3))
    res = leiden(spark, e, method="cpm", gamma=0.0)
    memb = res.membership.toPandas().sort_values("id")["comm"].to_numpy()
    # CPM gamma=0 ==> connected components (tests/test_Optimiser.py:96-103)
    sizes = sorted(np.bincount(memb[memb >= 0]).tolist(), reverse=True)
    sizes = [s for s in sizes if s > 0]
    assert sizes == 10 * [10]


def test_leiden_local_path_matches_localcore(spark):
    fix = fx.zachary()
    n, e = _fixture_edges(spark, fix)
    res = leiden(spark, e, method="modularity", n_iterations=-1, seed=1)
    g = fx.to_local_graph(fix)
    P = find_partition_local(g, "modularity", n_iterations=-1, seed=1)
    got = res.membership.toPandas().sort_values("id")["comm"].to_numpy()
    # identical membership (same seed, same code path)
    assert (got == P.membership).all()
    assert np.isclose(res.quality, P.quality(), rtol=1e-6)
    assert res.quality > 0.41  # karate optimum ~ 0.4198


def test_leiden_distributed_path_two_cliques(spark):
    # force the distributed superstep path with local_threshold=0
    f1 = fx.full(12)
    s = np.concatenate([f1[1], f1[1] + 12, [0]])
    d = np.concatenate([f1[2], f1[2] + 12, [12]])
    e = spark.createDataFrame(
        pd.DataFrame({"src": s.astype("int64"), "dst": d.astype("int64"), "weight": 1.0})
    )
    res = leiden(spark, e, method="modularity", local_threshold=0, n_iterations=1, seed=3, max_supersteps=10)
    memb = res.membership.toPandas().sort_values("id")["comm"].to_numpy()
    assert len(set(memb[:12])) == 1
    assert len(set(memb[12:])) == 1
    assert memb[0] != memb[12]
    assert res.supersteps > 0


def test_leiden_distributed_path_quality_not_worse_than_singletons(spark):
    fix = fx.erdos_renyi(150, 0.06, seed=9)
    n, e = _fixture_edges(spark, fix)
    res = leiden(spark, e, method="modularity", local_threshold=0, n_iterations=1, seed=5, max_supersteps=12)
    # vs singleton partition quality (0 for modularity)
    assert res.quality > 0.0
    # and close to the pure-local result on the same graph
    g = fx.to_local_graph(fix)
    P = find_partition_local(g, "modularity", n_iterations=-1, seed=5)
    assert res.quality >= 0.9 * P.quality()


def test_leiden_checkpoint_resume_artifacts(spark, tmp_path):
    from leidenalg_spark.operators.checkpoint import CheckpointManager

    fix = fx.erdos_renyi(80, 0.08, seed=2)
    n, e = _fixture_edges(spark, fix)
    ckpt = CheckpointManager(spark, str(tmp_path))
    res = leiden(spark, e, method="cpm", gamma=0.1, local_threshold=0, n_iterations=1, seed=7, ckpt=ckpt, max_supersteps=6)
    latest = ckpt.latest_step("membership")
    assert latest is not None and latest > 0
    reloaded = ckpt.load("membership", latest).toPandas().sort_values("id")
    final = res.membership.toPandas().sort_values("id")
    # the returned membership is the T5-renumbered view of the latest
    # checkpoint: identical partition, labels remapped to dense 0..C-1
    # by decreasing size — assert the label bijection, then the dense
    # size-ordered canonical form
    import pandas as pd

    m = pd.DataFrame({
        "ck": reloaded["comm"].to_numpy(), "fin": final["comm"].to_numpy()
    })
    assert m.groupby("ck")["fin"].nunique().eq(1).all()
    assert m.groupby("fin")["ck"].nunique().eq(1).all()
    sizes = final.groupby("comm")["id"].count().sort_index()
    assert list(sizes.index) == list(range(len(sizes)))
    assert list(sizes.to_numpy()) == sorted(sizes.to_numpy(), reverse=True)
    assert (tmp_path / "metrics.jsonl").exists()


def test_leiden_salted_matches_unsalted(spark):
    """hub_salt path: identical winners semantics as the fast path —
    converged quality equal on a hubby graph (star + cliques)."""
    f1 = fx.full(10)
    # two 10-cliques plus a hub vertex 20 connected to everything
    s = np.concatenate([f1[1], f1[1] + 10, np.full(20, 20)])
    d = np.concatenate([f1[2], f1[2] + 10, np.arange(20)])
    e = spark.createDataFrame(
        pd.DataFrame({"src": s.astype("int64"), "dst": d.astype("int64"), "weight": 1.0})
    )
    plain = leiden(spark, e, method="modularity", local_threshold=0,
                   n_iterations=1, seed=3, max_supersteps=8)
    salted = leiden(spark, e, method="modularity", local_threshold=0,
                    n_iterations=1, seed=3, max_supersteps=8, hub_salt=4)
    assert np.isclose(plain.quality, salted.quality, atol=1e-9), (plain.quality, salted.quality)
    mp = plain.membership.toPandas().sort_values("id")["comm"].to_numpy()
    ms = salted.membership.toPandas().sort_values("id")["comm"].to_numpy()
    # same partition up to label permutation
    import pandas as _pd

    assert _pd.Series(mp).groupby(ms).nunique().max() == 1
    assert _pd.Series(ms).groupby(mp).nunique().max() == 1


def test_leiden_salted_cpm(spark):
    fix = fx.erdos_renyi(120, 0.07, seed=4)
    n, e = _fixture_edges(spark, fix)
    plain = leiden(spark, e, method="cpm", gamma=0.1, local_threshold=0,
                   n_iterations=1, seed=5, max_supersteps=10)
    salted = leiden(spark, e, method="cpm", gamma=0.1, local_threshold=0,
                    n_iterations=1, seed=5, max_supersteps=10, hub_salt=3)
    assert np.isclose(plain.quality, salted.quality, rtol=1e-6), (plain.quality, salted.quality)


def test_leiden_distributed_directed_matches_localcore_quality(spark):
    """Regression: the directed distributed gather only traversed
    out-edges, omitting the w(C→v) term of the reference ΔQ (localcore
    diff_move_many: rm = wo + wi for directed) — a vertex with only
    in-edges gathered no candidates at all.  The distributed path must
    now land on a partition whose directed modularity matches the exact
    local core's."""
    # two dense directed "fan-in" clusters: most edges point INTO a hub,
    # so the buggy out-only gather starves the hubs of candidates
    rng = np.random.default_rng(9)
    src, dst = [], []
    for base, hub in ((0, 0), (15, 15)):
        for v in range(base + 1, base + 15):
            src.append(v); dst.append(hub)            # fan-in to the hub
            if rng.random() < 0.4:
                src.append(v); dst.append(base + 1 + (v - base) % 14)
    src.append(0); dst.append(15)                     # weak bridge
    e = spark.createDataFrame(
        pd.DataFrame({"src": np.array(src, dtype="int64"),
                      "dst": np.array(dst, dtype="int64"), "weight": 1.0})
    )
    res = leiden(
        spark, e, method="modularity", directed=True,
        local_threshold=0, n_iterations=1, seed=4, max_supersteps=12,
    )
    from leidenalg_spark.localcore import LocalGraph
    g = LocalGraph(
        30, np.array(src, dtype=np.int64), np.array(dst, dtype=np.int64),
        np.ones(len(src)), directed=True,
    )
    P = find_partition_local(g, "modularity", n_iterations=-1, seed=4)
    # the two fan-in clusters must be found, matching the exact core
    memb = res.membership.toPandas().sort_values("id")["comm"].to_numpy()
    assert len(set(memb[:15])) == 1 and len(set(memb[15:])) == 1
    assert memb[0] != memb[15]
    assert np.isclose(res.quality, P.quality(), rtol=1e-6, atol=1e-9)


def test_leiden_salted_directed_matches_unsalted(spark):
    """Directed + hub_salt: the salted gather rides per-src statics over
    the symmetrised (forward + reversed) edge cache — its winners must
    match the unsalted directed path's converged quality."""
    rng = np.random.default_rng(11)
    src, dst = [], []
    for base, hub in ((0, 0), (15, 15)):
        for v in range(base + 1, base + 15):
            src.append(v); dst.append(hub)
            if rng.random() < 0.4:
                src.append(v); dst.append(base + 1 + (v - base) % 14)
    src.append(0); dst.append(15)
    e = spark.createDataFrame(
        pd.DataFrame({"src": np.array(src, dtype="int64"),
                      "dst": np.array(dst, dtype="int64"), "weight": 1.0})
    )
    plain = leiden(spark, e, method="modularity", directed=True,
                   local_threshold=0, n_iterations=1, seed=6, max_supersteps=12)
    salted = leiden(spark, e, method="modularity", directed=True,
                    local_threshold=0, n_iterations=1, seed=6, max_supersteps=12,
                    hub_salt=4)
    assert np.isclose(plain.quality, salted.quality, rtol=1e-6), (plain.quality, salted.quality)


def test_leiden_distributed_directed_gather_includes_in_edges(spark):
    """Regression (verified failing pre-fix): the directed gather only
    traversed out-edges, so v's candidate weight missed w(C→v) and the
    superstep picked the wrong community.  v=0 chooses between c1={1,2}
    (w(0→c1)=2) and c2={3,4} (w(0→c2)=1 but w(c2→0)=3): the reference
    rm = wo + wi makes c2 the right move; the out-only gather picked c1."""
    rows = [(0, 1, 2.0), (0, 3, 1.0), (3, 0, 3.0), (1, 2, 1.0), (3, 4, 1.0)]
    e = spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst", "weight"]))
    init = spark.createDataFrame(
        pd.DataFrame({"id": [0, 1, 2, 3, 4], "comm": [0, 101, 101, 202, 202]})
    )
    fixed = spark.createDataFrame(pd.DataFrame({"id": [1, 2, 3, 4]}))
    res = leiden(
        spark, e, method="modularity", directed=True, local_threshold=0,
        n_iterations=1, seed=2, max_supersteps=4, finish=False,
        initial_membership=init, fixed=fixed,
    )
    assert int(res.membership.toPandas().set_index("id")["comm"].loc[0]) == 202
