"""Multiplex/temporal/bipartite + resolution-profile parity tests
(reference: tests/test_VertexPartition.py:200-209,
tests/test_Optimiser.py:177-185, doc/source/multiplex.rst)."""

import numpy as np

from leidenalg_spark.localcore import OptimiserOpts, QualitySpec, LocalPartition, optimise_partition
from leidenalg_spark.operators.multiplex import (
    cpm_bipartite_layers,
    find_partition_multiplex_local,
    find_partition_temporal_local,
    time_slices_to_layers_local,
)
from leidenalg_spark.plans.profile import resolution_profile
from leidenalg_spark.sources import fixtures as fx


def test_cpm_bipartite_collapses_to_one_community():
    # reference test_Bipartite: gamma01=0.2 on the 8-vertex example -> 1 comm
    n, s, d, w, types = fx.bipartite_8()
    g = fx.to_local_graph((n, s, d, w))
    layers, lw = cpm_bipartite_layers(g, types, resolution_parameter_01=0.2)
    P, _ = find_partition_multiplex_local(layers, layer_weights=lw, seed=4)
    assert len(P.nonempty_comms()) == 1


def test_bipartite_quality_formula():
    # Q = sum_c [e_c - g01*2*n0*n1 - g0*n0^2 - g1*n1^2] (binom variant for
    # undirected): single-community check against hand computation
    n, s, d, w, types = fx.bipartite_8()
    g = fx.to_local_graph((n, s, d, w))
    layers, lw = cpm_bipartite_layers(g, types, resolution_parameter_01=0.25)
    P = LocalPartition(layers, layer_weights=lw, membership=np.zeros(8, dtype=int))
    # binom variant of the docstring formula with g0=g1=0:
    # Q = e_c - g01*(binom(8,2) - binom(4,2) - binom(4,2)) = 10 - .25*16 = 6
    expected = 10 - 0.25 * (28 - 6 - 6)
    assert np.isclose(P.quality(), expected)


def test_temporal_slices_alignment():
    # three identical two-clique graphs; strong interslice coupling aligns
    # the slice partitions
    def two_cliques():
        f = fx.full(6)
        s = np.concatenate([f[1], f[1] + 6])
        d = np.concatenate([f[2], f[2] + 6])
        return fx.to_local_graph((12, s, d, None))

    slices = [two_cliques() for _ in range(3)]
    memb, diff, P = find_partition_temporal_local(
        slices, method="cpm", gamma=0.4, interslice_weight=5.0, seed=2
    )
    assert len(memb) == 3 and all(len(m) == 12 for m in memb)
    for t in range(3):
        assert len(set(memb[t][:6])) == 1
        assert len(set(memb[t][6:])) == 1
        assert memb[t][0] != memb[t][6]
    # alignment across slices (the whole point of the coupling layer)
    assert memb[0].tolist() == memb[1].tolist() == memb[2].tolist()


def test_slices_to_layers_node_size_masks():
    slices = [fx.to_local_graph(fx.lattice(10, 2)) for _ in range(3)]
    layers, slice_of, local_id = time_slices_to_layers_local(slices, 0.5)
    assert len(layers) == 4  # 3 slices + interslice
    for t in range(3):
        assert layers[t].node_size.sum() == 10
    assert layers[-1].node_size.sum() == 0  # interslice layer all zero
    assert layers[-1].ecount == 20  # 10 couplings x 2 transitions


def test_resolution_profile_zachary():
    # reference test_resolution_profile: CPM on Zachary over (0, 1):
    # gamma->0 one community, gamma->1 all singletons
    g = fx.to_local_graph(fx.zachary())
    profile = resolution_profile(g, "cpm", (0.0, 1.0), seed=1)
    assert profile[0].sizes() == [34]
    assert profile[-1].sizes() == [1] * 34
    assert len(profile) > 3  # bisection actually probed interior points
    # bisect values non-increasing in gamma
    bv = [p.bisect_value for p in profile]
    assert all(bv[i] >= bv[i + 1] - 1e-9 for i in range(len(bv) - 1))


def test_leiden_multiplex_distributed_single_layer(spark):
    """L=1 multiplex modularity ≡ plain distributed Leiden on two cliques."""
    import numpy as np
    import pandas as pd
    from leidenalg_spark.localcore import QualitySpec
    from leidenalg_spark.operators.multiplex import leiden_multiplex
    from leidenalg_spark.sources import fixtures as fx

    f1 = fx.full(10)
    s = np.concatenate([f1[1], f1[1] + 10, [0]])
    d = np.concatenate([f1[2], f1[2] + 10, [10]])
    e = spark.createDataFrame(pd.DataFrame({
        "src": s.astype("int64"), "dst": d.astype("int64"),
        "weight": 1.0, "layer": 0,
    }))
    res = leiden_multiplex(
        spark, e, [QualitySpec("modularity")], local_threshold=0,
        max_supersteps=8, seed=3,
    )
    memb = res.membership.toPandas().sort_values("id")["comm"].to_numpy()
    assert len(set(memb[:10])) == 1 and len(set(memb[10:])) == 1
    assert memb[0] != memb[10]
    assert res.quality > 0.4


def test_leiden_multiplex_distributed_matches_local(spark):
    """Two CPM layers with different structure: distributed quality matches
    the exact local multiplex core (same objective, same optimum)."""
    import numpy as np
    import pandas as pd
    from leidenalg_spark.localcore import LocalGraph, QualitySpec
    from leidenalg_spark.operators.multiplex import (
        find_partition_multiplex_local, leiden_multiplex, quality_multiplex,
    )
    from leidenalg_spark.sources import fixtures as fx

    rng = np.random.default_rng(5)
    fixA = fx.erdos_renyi(60, 0.12, seed=11)
    fixB = fx.erdos_renyi(60, 0.12, seed=12)
    rows = []
    for layer, fix in ((0, fixA), (1, fixB)):
        for s, d in zip(fix[1], fix[2]):
            rows.append((int(s), int(d), 1.0, layer))
    e = spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst", "weight", "layer"]))
    specs = [QualitySpec("cpm", gamma=0.05), QualitySpec("cpm", gamma=0.05)]
    res = leiden_multiplex(spark, e, specs, layer_weights=[1.0, 1.0],
                           local_threshold=0, max_supersteps=10, seed=7)
    gA = LocalGraph(60, fixA[1], fixA[2], None)
    gB = LocalGraph(60, fixB[1], fixB[2], None)
    P, _ = find_partition_multiplex_local(
        [(gA, specs[0]), (gB, specs[1])], layer_weights=[1.0, 1.0],
        n_iterations=-1, seed=7,
    )
    assert res.quality >= 0.95 * P.quality(), (res.quality, P.quality())


def test_leiden_multiplex_signed_layers(spark):
    """Negative layer weight (T9): two cliques joined by negative links
    stay separate under [1, -1] weighting."""
    import numpy as np
    import pandas as pd
    from leidenalg_spark.localcore import QualitySpec
    from leidenalg_spark.operators.multiplex import leiden_multiplex
    from leidenalg_spark.sources import fixtures as fx

    f1 = fx.full(8)
    pos_s = np.concatenate([f1[1], f1[1] + 8])
    pos_d = np.concatenate([f1[2], f1[2] + 8])
    neg_s = np.arange(8)
    rows = [(int(s), int(d), 1.0, 0) for s, d in zip(pos_s, pos_d)]
    rows += [(int(s), int(s) + 8, 1.0, 1) for s in neg_s]
    e = spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst", "weight", "layer"]))
    specs = [QualitySpec("cpm", gamma=0.1), QualitySpec("cpm", gamma=-0.1)]
    res = leiden_multiplex(spark, e, specs, layer_weights=[1.0, -1.0],
                           local_threshold=0, max_supersteps=8, seed=1)
    memb = res.membership.toPandas().sort_values("id")["comm"].to_numpy()
    assert len(set(memb[:8])) == 1 and len(set(memb[8:])) == 1
    assert memb[0] != memb[8]


def test_leiden_multiplex_fixed_distributed(spark):
    """O14 is_membership_fixed through the distributed multiplex path:
    K3 single CPM layer, vertex 0 fixed -> all vertices end in 0's
    community and the fixed label survives the coarse finish."""
    import pandas as pd
    from leidenalg_spark.localcore import QualitySpec
    from leidenalg_spark.operators.multiplex import leiden_multiplex
    from pyspark.sql import functions as F

    e = spark.createDataFrame(
        pd.DataFrame({
            "src": [0, 0, 1], "dst": [1, 2, 2],
            "weight": [1.0, 1.0, 1.0], "layer": [0, 0, 0],
        })
    )
    fixed = spark.createDataFrame(pd.DataFrame({"id": [0]}))
    res = leiden_multiplex(
        spark, e, [QualitySpec("cpm", gamma=0.1)], n_iterations=2, seed=2,
        local_threshold=0, max_supersteps=8, fixed=fixed,
    )
    memb = res.membership.toPandas().sort_values("id")["comm"].tolist()
    assert memb == [0, 0, 0]


# ------------------------------------------------- distributed O12 profile
def _zachary_df(spark):
    import pandas as pd

    n, s, d, w = fx.zachary()
    if w is None:
        w = np.ones(len(s))
    return spark.createDataFrame(
        pd.DataFrame({
            "src": np.asarray(s, dtype=np.int64),
            "dst": np.asarray(d, dtype=np.int64),
            "weight": np.asarray(w, dtype=np.float64),
        })
    )


def test_resolution_profile_df_local_parity(spark):
    """Below local_threshold the DF probes delegate to the exact local
    core, so the profile is bit-identical to :func:`resolution_profile`."""
    from leidenalg_spark.plans.profile import resolution_profile_df

    g = fx.to_local_graph(fx.zachary())
    local = resolution_profile(g, "cpm", (0.0, 1.0), seed=1)
    dfp = resolution_profile_df(
        spark, _zachary_df(spark), method="cpm", resolution_range=(0.0, 1.0),
        seed=1, local_threshold=500_000,
    )
    assert [round(p.gamma, 9) for p in dfp] == [round(p.gamma, 9) for p in local]
    for a, b in zip(dfp, local):
        assert abs(a.bisect_value - b.bisect_value) < 1e-9
        assert abs(a.quality - b.quality) < 1e-9
    assert dfp[0].sizes() == [34]
    assert dfp[-1].sizes() == [1] * 34


def test_resolution_profile_df_distributed_probes(spark):
    """local_threshold=0 forces every probe through the distributed
    superstep + multi-level path; the scan must stay monotone and find
    the same endpoint structure."""
    from leidenalg_spark.plans.profile import resolution_profile_df

    dfp = resolution_profile_df(
        spark, _zachary_df(spark), method="cpm", resolution_range=(0.05, 1.0),
        seed=1, local_threshold=0, min_diff_resolution=0.3,
        min_diff_bisect_value=10.0, max_supersteps=10,
    )
    assert len(dfp) >= 2
    bv = [p.bisect_value for p in dfp]
    assert all(bv[i] >= bv[i + 1] - 1e-9 for i in range(len(bv) - 1))
    # gamma=1 CPM on unweighted Zachary: all singletons, zero internal weight
    assert dfp[-1].n_comms == 34
    assert abs(dfp[-1].bisect_value) < 1e-9
    # low gamma keeps most weight internal
    assert dfp[0].bisect_value > 50.0


def test_mx_monotone_guard_rolls_back_oscillation(spark):
    """Regression: batched gated moves in the multiplex superstep loop can
    enter a 2-cycle across the direction gate (quality oscillating between
    two phases); without the monotone-commit guard the loop burned all
    supersteps and could return the WORSE phase.  The guard must detect
    the regression, revert to the last good membership and stop."""
    import pandas as pd
    from pyspark.sql import functions as F

    from leidenalg_spark.operators.multiplex import leiden_multiplex

    rng = np.random.default_rng(7)
    n = 60
    src, dst = [], []
    for _ in range(240):
        a, b = rng.integers(0, n, 2)
        if a != b:
            src.append(min(a, b)); dst.append(max(a, b))
    for a in range(0, 15):          # dense bipartite core
        for b in range(30, 45):
            if rng.random() < 0.5:
                src.append(a); dst.append(b)
    pdf = pd.DataFrame({"src": src, "dst": dst, "weight": 1.0}).drop_duplicates()
    e0 = spark.createDataFrame(pdf).withColumn("layer", F.lit(0))
    edges = e0.unionByName(e0.select("src", "dst", "weight").withColumn("layer", F.lit(1)))
    specs = [QualitySpec("modularity"), QualitySpec("cpm", gamma=0.2)]
    res = leiden_multiplex(
        spark, edges, specs, n_iterations=1, seed=7,
        local_threshold=0, max_supersteps=12, finish=False,
    )
    rollbacks = [m for m in res.metrics if m.get("name") == "leiden_mx_rollback"]
    assert rollbacks, "oscillation not detected"
    assert rollbacks[0]["q_regressed"] < 0
    assert res.quality >= 70.9  # the better phase, not the regressed one


def test_slices_nonconsecutive_values_still_couple(spark):
    """Regression: the default path coupling paired slice s with s+1 by
    arithmetic, so non-consecutive slice values (years, sparse buckets)
    silently produced ZERO interslice edges."""
    import pandas as pd

    from leidenalg_spark.operators.multiplex import slices_to_layers_df

    rows = []
    for year in (2010, 2012, 2015):
        rows += [(year, 0, 1, 1.0), (year, 1, 2, 1.0)]
    slices = spark.createDataFrame(
        pd.DataFrame(rows, columns=["slice", "src", "dst", "weight"])
    )
    layered = slices_to_layers_df(slices, interslice_weight=0.5)
    inter = layered.where(layered.layer.isNull())
    # 3 shared vertices x 2 sorted-consecutive transitions
    assert inter.count() == 6
    assert set(r["weight"] for r in inter.collect()) == {0.5}


def test_quality_multiplex_single_pass_matches_localcore(spark):
    """The single-pass quality_multiplex (one groupBy(layer, comm)) must
    equal the exact local multiplex quality for every method mix,
    including per-layer node sizes, self-loops and negative weights."""
    import pandas as pd
    from pyspark.sql import functions as F

    from leidenalg_spark.localcore import LocalGraph, LocalPartition
    from leidenalg_spark.operators.multiplex import quality_multiplex

    rng = np.random.default_rng(5)
    n = 25
    specs = [
        QualitySpec("modularity"), QualitySpec("cpm", gamma=0.4),
        QualitySpec("rber", gamma=0.7), QualitySpec("surprise"),
        QualitySpec("significance"), QualitySpec("rbconfiguration", gamma=1.3),
    ]
    lw = [1.0, -0.5, 0.8, 0.3, 0.6, 1.1]
    memb = rng.integers(0, 6, n)
    rows, ns_rows, layers_local = [], [], []
    for k, spec in enumerate(specs):
        m = int(rng.integers(25, 45))
        s = rng.integers(0, n, m)
        d = rng.integers(0, n, m)   # collisions give self-loops — wanted
        w = np.ones(m)
        ns = rng.uniform(0.5, 2.0, n) if spec.method in ("cpm", "rber") else np.ones(n)
        layers_local.append(
            (LocalGraph(n, s.astype(np.int64), d.astype(np.int64), w, node_size=ns), spec)
        )
        rows += [(int(a), int(b), 1.0, k) for a, b in zip(s, d)]
        ns_rows += [(int(v), k, float(ns[v])) for v in range(n)]
    P = LocalPartition(layers_local, layer_weights=lw, membership=memb)
    expected = P.quality()

    edges = spark.createDataFrame(
        pd.DataFrame(rows, columns=["src", "dst", "weight", "layer"])
    )
    memb_df = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n, dtype="int64"), "comm": memb.astype("int64")})
    )
    ns_df = spark.createDataFrame(
        pd.DataFrame(ns_rows, columns=["id", "layer", "node_size"])
    )
    got = quality_multiplex(edges, memb_df, specs, lw, node_sizes=ns_df)
    assert np.isclose(got, expected, rtol=1e-6, atol=1e-6), (got, expected)


def test_bipartite_df_collapses_and_matches_local(spark):
    """T8 through the DataFrame engine (local_threshold=0 forces the
    distributed supersteps): same collapse as the reference test_Bipartite
    at gamma01=0.2, and quality parity with the exact local construction."""
    import pandas as pd
    from leidenalg_spark.operators.multiplex import find_partition_bipartite_df

    n, s, d, w, types = fx.bipartite_8()
    _, e = fx.to_spark_df(spark, (n, s, d, w))
    tdf = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n, dtype="int64"), "type": types.astype("int64")})
    )
    res = find_partition_bipartite_df(
        spark, e, tdf, resolution_parameter_01=0.2,
        local_threshold=0, max_supersteps=8, seed=4,
    )
    memb = res.membership.toPandas()
    assert memb["comm"].nunique() == 1

    # local twin on the identical objective
    g = fx.to_local_graph((n, s, d, w))
    layers, lw = cpm_bipartite_layers(g, types, resolution_parameter_01=0.2)
    P, _ = find_partition_multiplex_local(layers, layer_weights=lw, seed=4)
    assert np.isclose(res.quality, P.quality(), rtol=1e-6, atol=1e-6)


def test_bipartite_df_degree_node_size(spark):
    """degree_as_node_size: penalty masses follow unweighted degrees;
    distributed quality matches the local construction on the optimum."""
    import pandas as pd
    from leidenalg_spark.operators.multiplex import find_partition_bipartite_df

    n, s, d, w, types = fx.bipartite_8()
    _, e = fx.to_spark_df(spark, (n, s, d, w))
    tdf = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n, dtype="int64"), "type": types.astype("int64")})
    )
    res = find_partition_bipartite_df(
        spark, e, tdf, resolution_parameter_01=0.1, degree_as_node_size=True,
        local_threshold=0, max_supersteps=8, seed=9,
    )
    g = fx.to_local_graph((n, s, d, w))
    layers, lw = cpm_bipartite_layers(
        g, types, resolution_parameter_01=0.1, degree_as_node_size=True
    )
    P, _ = find_partition_multiplex_local(layers, layer_weights=lw, seed=9)
    assert res.quality >= P.quality() - 1e-9 or np.isclose(res.quality, P.quality(), rtol=1e-6)


def test_bipartite_df_null_type_class(spark):
    """A NULL type value is a real class: quality must match the local
    twin with the same partition structure under a relabeled (non-NULL)
    type vector — not silently lose the NULL class's penalty mass."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType
    from leidenalg_spark.operators.multiplex import find_partition_bipartite_df

    n, s, d, w, types = fx.bipartite_8()
    _, e = fx.to_spark_df(spark, (n, s, d, w))
    # types 0..3 -> NULL, 4..7 -> 0  (same bipartition as the fixture)
    tdf = spark.createDataFrame(
        [(int(i), None if types[i] == 0 else 0) for i in range(n)],
        StructType([StructField("id", LongType()), StructField("type", LongType())]),
    )
    res = find_partition_bipartite_df(
        spark, e, tdf, resolution_parameter_01=0.2,
        local_threshold=0, max_supersteps=8, seed=4,
    )
    g = fx.to_local_graph((n, s, d, w))
    layers, lw = cpm_bipartite_layers(g, types, resolution_parameter_01=0.2)
    P, _ = find_partition_multiplex_local(layers, layer_weights=lw, seed=4)
    assert np.isclose(res.quality, P.quality(), rtol=1e-6, atol=1e-6)
    assert res.membership.toPandas()["comm"].nunique() == 1


def test_leiden_multiplex_initial_membership(spark):
    """Seeding the distributed multiplex run with the known optimum must
    keep that quality, and a PARTIAL seed must not drop unseeded
    vertices (single-layer leiden's contract, now shared)."""
    import pandas as pd
    from leidenalg_spark.localcore import QualitySpec
    from leidenalg_spark.operators.multiplex import leiden_multiplex

    f1 = fx.full(8)
    s = np.concatenate([f1[1], f1[1] + 8, [0]])
    d = np.concatenate([f1[2], f1[2] + 8, [8]])
    e = spark.createDataFrame(pd.DataFrame({
        "src": s.astype("int64"), "dst": d.astype("int64"),
        "weight": 1.0, "layer": 0,
    }))
    specs = [QualitySpec("modularity")]

    # optimal two-clique seed, labels chosen OUTSIDE the vertex-id space
    seed_df = spark.createDataFrame(pd.DataFrame({
        "id": np.arange(16, dtype="int64"),
        "comm": np.where(np.arange(16) < 8, 100, 200).astype("int64"),
    }))
    res = leiden_multiplex(spark, e, specs, local_threshold=0,
                           max_supersteps=6, seed=3,
                           initial_membership=seed_df)
    memb = res.membership.toPandas().sort_values("id")["comm"].to_numpy()
    assert len(set(memb[:8])) == 1 and len(set(memb[8:])) == 1
    assert memb[0] != memb[8]

    base = leiden_multiplex(spark, e, specs, local_threshold=0,
                            max_supersteps=6, seed=3)
    assert res.quality >= base.quality - 1e-9

    # partial seed: only vertices 0..3 seeded; all 16 must still appear
    part = spark.createDataFrame(pd.DataFrame({
        "id": np.arange(4, dtype="int64"),
        "comm": np.full(4, 300, dtype="int64"),
    }))
    res_p = leiden_multiplex(spark, e, specs, local_threshold=0,
                             max_supersteps=6, seed=3,
                             initial_membership=part)
    assert res_p.membership.count() == 16

    # local path accepts the same seed (small threshold routes local)
    res_l = leiden_multiplex(spark, e, specs, local_threshold=10_000,
                             seed=3, initial_membership=seed_df)
    memb_l = res_l.membership.toPandas().sort_values("id")["comm"].to_numpy()
    assert len(set(memb_l[:8])) == 1 and memb_l[0] != memb_l[8]
