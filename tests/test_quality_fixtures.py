"""Reference-parity quality fixtures: both engine evaluators (localcore
NumPy + DataFrame) must reproduce the checked-in table of closed-form
quality values at 1e-6 (BASELINE.json metric).  The table is generated
by scripts/gen_quality_fixtures.py — a deliberately naive, audit-by-eye
implementation of the reference's docstring formulas with zero shared
code — so this test triangulates three independent implementations.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from leidenalg_spark.functions.quality import quality as df_quality
from leidenalg_spark.localcore import LocalGraph, LocalPartition, QualitySpec
from leidenalg_spark.sources import fixtures as fx

DATA = os.path.join(os.path.dirname(__file__), "data", "quality_fixtures.json")
with open(DATA) as f:
    _FIX = json.load(f)

MEMBERSHIPS = {
    "singletons": lambda n: np.arange(n),
    "one": lambda n: np.zeros(n, dtype=np.int64),
    "mod3": lambda n: np.arange(n) % 3,
    "blocks5": lambda n: np.arange(n) // 5,
}


def _graph(gname):
    fix = eval(_FIX["graphs"][gname])  # noqa: S307 — fixed exprs from the table
    n, s, d, w = fix[0], np.asarray(fix[1]), np.asarray(fix[2]), fix[3]
    w = np.ones(len(s)) if w is None else np.asarray(w, dtype=np.float64)
    return n, s, d, w


def _node_sizes(tag, n):
    assert tag == "mod3plus1"
    return (np.arange(n) % 3 + 1).astype(np.float64)


def test_localcore_matches_reference_fixtures():
    for row in _FIX["rows"]:
        n, s, d, w = _graph(row["graph"])
        memb = MEMBERSHIPS[row["membership"]](n)
        ns = _node_sizes(row["node_sizes"], n) if "node_sizes" in row else None
        g = LocalGraph(n, s, d, w, node_size=ns, directed=row["directed"])
        spec = QualitySpec(row["method"], gamma=row["gamma"])
        uniq, dense = np.unique(memb, return_inverse=True)
        P = LocalPartition([(g, spec)], membership=dense.astype(np.int64))
        q = P.quality()
        assert q == pytest.approx(row["expected"], abs=1e-6, rel=1e-6), row


def test_dataframe_matches_reference_fixtures(spark):
    # one Spark job per (graph, membership) would be slow; group rows
    for (gname, mname), rows in _group().items():
        n, s, d, w = _graph(gname)
        edges = spark.createDataFrame(
            pd.DataFrame({"src": s.astype(np.int64), "dst": d.astype(np.int64), "weight": w})
        )
        memb = MEMBERSHIPS[mname](n)
        mdf = spark.createDataFrame(
            pd.DataFrame({"id": np.arange(n, dtype=np.int64), "comm": memb.astype(np.int64)})
        )
        for row in rows:
            ns_df = None
            if "node_sizes" in row:
                ns = _node_sizes(row["node_sizes"], n)
                ns_df = spark.createDataFrame(
                    pd.DataFrame({"id": np.arange(n, dtype=np.int64), "node_size": ns})
                )
            q = df_quality(
                edges, mdf, row["method"], row["gamma"], row["directed"], node_sizes=ns_df
            )
            assert q == pytest.approx(row["expected"], abs=1e-6, rel=1e-6), row


def _group():
    grouped = {}
    for row in _FIX["rows"]:
        grouped.setdefault((row["graph"], row["membership"]), []).append(row)
    return grouped
