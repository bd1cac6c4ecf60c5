"""DataFrame quality evaluators vs the NumPy oracle — the allclose 1e-6
contract of BASELINE.md applied to every method on every fixture."""

import numpy as np
import pytest

from leidenalg_spark.functions.quality import quality as df_quality
from leidenalg_spark.localcore import LocalPartition, QualitySpec
from leidenalg_spark.sources import fixtures as fx

CASES = [
    ("zachary", fx.zachary(), False, False),
    ("er_100", fx.erdos_renyi(100, 0.05), False, False),
    ("er_100_w", fx.erdos_renyi(100, 0.05), False, True),
    ("er_dir", fx.erdos_renyi(100, 0.05, directed=True), True, False),
    ("er_loops", fx.erdos_renyi(100, 0.05, loops=True), False, False),
]


def _spark_edges(spark, fix):
    import pandas as pd

    n, s, d, w = fix[:4]
    if w is None:
        w = np.ones(len(s))
    return n, spark.createDataFrame(
        pd.DataFrame({"src": s.astype("int64"), "dst": d.astype("int64"), "weight": w.astype("float64")})
    )


@pytest.mark.parametrize("method", ["modularity", "rbconfiguration", "rber", "cpm", "significance", "surprise"])
@pytest.mark.parametrize("name,fix,directed,weighted", CASES, ids=[c[0] for c in CASES])
def test_quality_df_matches_numpy(spark, method, name, fix, directed, weighted):
    if method == "significance" and weighted:
        pytest.skip("Significance undefined for weighted graphs")
    if weighted:
        fix = fx.with_random_weights(fix)
    n, edges = _spark_edges(spark, fix)
    g = fx.to_local_graph(fix, directed=directed)
    memb = np.random.default_rng(11).integers(0, 8, size=n)
    P = LocalPartition([(g, QualitySpec(method, gamma=0.6))], membership=memb)
    expected = P.quality()

    import pandas as pd

    mdf = spark.createDataFrame(pd.DataFrame({"id": np.arange(n, dtype="int64"), "comm": memb.astype("int64")}))
    got = df_quality(edges, mdf, method, gamma=0.6, directed=directed)
    assert np.isclose(got, expected, rtol=1e-6, atol=1e-6), (method, name, got, expected)


def test_significance_dense_graph_p_equals_one(spark):
    """Regression: the SQL KL helper produced NULL (silently dropped by
    SUM) for communities with density < 1 whenever the global density p
    reached 1 — e.g. a complete graph.  Must match the NumPy core."""
    fix = fx.complete_graph(5) if hasattr(fx, "complete_graph") else None
    if fix is None:
        import itertools
        s, d = zip(*itertools.combinations(range(5), 2))
        fix = (5, np.array(s), np.array(d), None)
    n, edges = _spark_edges(spark, fix)
    memb = np.array([0, 0, 1, 1, 1])
    g = fx.to_local_graph(fix, directed=False)
    P = LocalPartition([(g, QualitySpec("significance"))], membership=memb)
    expected = P.quality()

    import pandas as pd
    mdf = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n, dtype="int64"), "comm": memb.astype("int64")})
    )
    got = df_quality(edges, mdf, "significance", directed=False)
    assert np.isfinite(expected)
    assert np.isclose(got, expected, rtol=1e-6, atol=1e-6), (got, expected)
