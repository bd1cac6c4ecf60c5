"""Deterministic graph generators (sources/generators.py) — igraph
Ring/Star/Full/Lattice/Erdos_Renyi constructors + Graph500 R-MAT."""

import pytest
from pyspark.sql import functions as F

from leidenalg_spark.sources.generators import (
    erdos_renyi_gnm,
    full,
    lattice,
    ring,
    rmat,
    star,
)


def test_ring_undirected(spark):
    e = ring(spark, 5).collect()
    assert sorted((r.src, r.dst) for r in e) == [(0, 1), (0, 4), (1, 2), (2, 3), (3, 4)]


def test_star(spark):
    e = star(spark, 4).collect()
    assert sorted((r.src, r.dst) for r in e) == [(0, 1), (0, 2), (0, 3)]


def test_full_counts_and_guard(spark):
    assert full(spark, 6).count() == 15
    assert full(spark, 4, loops=True).count() == 10
    with pytest.raises(ValueError):
        full(spark, 100, max_vertices=10)


def test_lattice_grid(spark):
    e = lattice(spark, 2, 3)  # 2x3 grid: 2*(3-1) right + 3*(2-1) down = 7
    assert e.count() == 7
    assert sorted((r.src, r.dst) for r in e.collect()) == [
        (0, 1), (0, 3), (1, 2), (1, 4), (2, 5), (3, 4), (4, 5),
    ]


def test_rmat_bounds_determinism_and_skew(spark):
    g1 = rmat(spark, scale=6, m=2000, seed=9)
    g2 = rmat(spark, scale=6, m=2000, seed=9)
    assert g1.exceptAll(g2).count() == 0 and g2.exceptAll(g1).count() == 0
    mn, mx = g1.agg(F.min(F.least("src", "dst")), F.max(F.greatest("src", "dst"))).first()
    assert mn >= 0 and mx < 64
    # Graph500 parameters are heavily skewed: the hottest vertex should
    # see far more than the uniform m/n share of edge endpoints
    top = (
        g1.select(F.col("src").alias("v")).union(g1.select(F.col("dst")))
        .groupBy("v").count().agg(F.max("count")).first()[0]
    )
    assert top > 4 * (2 * 2000 / 64)


def test_rmat_different_seeds_differ(spark):
    g1 = rmat(spark, scale=6, m=500, seed=1)
    g2 = rmat(spark, scale=6, m=500, seed=2)
    assert g1.exceptAll(g2).count() > 0


def test_gnm_bounds_and_determinism(spark):
    g = erdos_renyi_gnm(spark, n=32, m=300, seed=5)
    assert g.count() == 300
    mn, mx = g.agg(F.min(F.least("src", "dst")), F.max(F.greatest("src", "dst"))).first()
    assert mn >= 0 and mx < 32
    again = erdos_renyi_gnm(spark, n=32, m=300, seed=5)
    assert g.exceptAll(again).count() == 0


def test_configuration_model_preserves_degree_sequence(spark):
    from leidenalg_spark.sources.generators import configuration_model

    edges = rmat(spark, scale=5, m=300, seed=3).select("src", "dst")
    und = edges.selectExpr("least(src,dst) a", "greatest(src,dst) b").where("a<>b").distinct()
    orig = und.selectExpr("a v").union(und.selectExpr("b v")).groupBy("v").count()
    rw = configuration_model(edges, seed=11)
    got = rw.selectExpr("src v").union(rw.selectExpr("dst v")).groupBy("v").count()
    assert orig.exceptAll(got).count() == 0 and got.exceptAll(orig).count() == 0
    # deterministic
    rw2 = configuration_model(edges, seed=11)
    assert rw.exceptAll(rw2).count() == 0
    # different seed gives a different pairing
    rw3 = configuration_model(edges, seed=12)
    assert rw.exceptAll(rw3).count() > 0


def test_watts_strogatz_shape_and_determinism(spark):
    from leidenalg_spark.sources.generators import watts_strogatz

    g = watts_strogatz(spark, n=100, k=3, p=0.2, seed=11)
    rows = g.collect()
    assert len(rows) == 300  # n*k edges, one per (src, offset)
    assert all(0 <= r.dst < 100 and r.dst != r.src for r in rows)
    # unrewired edges are exactly the ring lattice
    assert all((r.src + r.o) % 100 == r.dst for r in rows if not r.rewired)
    frac = sum(r.rewired for r in rows) / len(rows)
    assert 0.1 < frac < 0.35  # md5 coin ~ Bernoulli(0.2)
    again = watts_strogatz(spark, n=100, k=3, p=0.2, seed=11)
    assert g.exceptAll(again).count() == 0


def test_watts_strogatz_p_zero_is_lattice(spark):
    from leidenalg_spark.sources.generators import watts_strogatz

    g = watts_strogatz(spark, n=20, k=2, p=0.0, seed=1)
    assert all((r.src + r.o) % 20 == r.dst and not r.rewired for r in g.collect())


def test_sbm_planted_recovery_and_determinism(spark):
    """Strong-signal SBM: edge counts concentrate (in-block density >>
    out-block), regeneration is bit-identical, and Leiden recovers the
    planted blocks exactly."""
    from pyspark.sql import functions as F

    from leidenalg_spark.sources.generators import sbm_graph

    g = sbm_graph(spark, 60, n_blocks=3, p_in=0.8, p_out=0.02, seed=7)
    e = g.collect()
    assert e == sbm_graph(spark, 60, n_blocks=3, p_in=0.8, p_out=0.02, seed=7).collect()
    n_in = sum(1 for r in e if r.block_src == r.block_dst)
    n_out = len(e) - n_in
    # 3 blocks x C(20,2) = 570 in-pairs at 0.8; 1200 out-pairs at 0.02
    assert 400 < n_in < 570 and n_out < 80

    from leidenalg_spark.operators.leiden import leiden

    res = leiden(spark, g.select("src", "dst", "weight"), seed=1)
    memb = {r.id: r.comm for r in res.membership.collect()}
    blocks = {}
    for v, c in memb.items():
        blocks.setdefault(v % 3, set()).add(c)
    assert all(len(cs) == 1 for cs in blocks.values())
    assert len({next(iter(cs)) for cs in blocks.values()}) == 3
