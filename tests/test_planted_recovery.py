"""Planted-partition recovery — the community-detection validation the
reference's literature runs on LFR/SBM benchmarks: a deterministic SBM
graph with strong intra-block signal must be recovered by leiden()
(both the local core and the distributed superstep path) with high NMI
against the planted truth, scored by partition_compare."""

import pytest


@pytest.fixture(scope="module")
def sbm(spark):
    from leidenalg_spark.sources.fixtures import sbm_edges_df

    edges, truth = sbm_edges_df(
        spark, n_blocks=6, block_size=60, m_in=400, m_out=120, seed=7
    )
    return edges.persist(), truth.persist()


def _nmi(spark, membership, truth):
    from leidenalg_spark.operators.community import partition_compare

    return partition_compare(membership, truth).first()["nmi"]


def test_local_core_recovers_planted_blocks(spark, sbm):
    from leidenalg_spark.operators.leiden import leiden

    edges, truth = sbm
    res = leiden(spark, edges, method="modularity", n_iterations=2, seed=3)
    assert _nmi(spark, res.membership, truth) >= 0.95


def test_distributed_path_recovers_planted_blocks(spark, sbm):
    from leidenalg_spark.operators.leiden import leiden

    edges, truth = sbm
    # local_threshold=0 forces the superstep pipeline end-to-end
    res = leiden(
        spark, edges, method="modularity", n_iterations=2, seed=3,
        local_threshold=0, local_finish_threshold=500,
    )
    assert _nmi(spark, res.membership, truth) >= 0.95
