"""Graph set operations (operators/setops.py) — igraph union /
intersection / difference / symmetric_difference / complementer."""

import pytest

from leidenalg_spark.operators.setops import (
    graph_complement,
    graph_difference,
    graph_intersection,
    graph_symmetric_difference,
    graph_union,
)

A = [("a", "b", 1.0), ("b", "c", 2.0), ("a", "b", 3.0)]  # multi-edge a->b
B = [("a", "b", 5.0), ("c", "d", 7.0)]


@pytest.fixture()
def ab(spark):
    mk = lambda rows: spark.createDataFrame(rows, "src string, dst string, weight double")
    return mk(A), mk(B)


def _rows(df):
    return sorted((r.src, r.dst, r.weight) for r in df.collect())


def test_union_sums_and_collapses_multiedges(ab):
    a, b = ab
    assert _rows(graph_union(a, b)) == [("a", "b", 9.0), ("b", "c", 2.0), ("c", "d", 7.0)]


def test_union_max(ab):
    a, b = ab
    assert _rows(graph_union(a, b, "max")) == [("a", "b", 5.0), ("b", "c", 2.0), ("c", "d", 7.0)]


def test_intersection(ab):
    a, b = ab
    assert _rows(graph_intersection(a, b)) == [("a", "b", 9.0)]
    # min collapses a's multi-edge to 1.0 first, then min(1.0, 5.0)
    assert _rows(graph_intersection(a, b, "min")) == [("a", "b", 1.0)]


def test_difference_keeps_a_weights(ab):
    a, b = ab
    assert _rows(graph_difference(a, b)) == [("b", "c", 2.0)]
    assert _rows(graph_difference(b, a)) == [("c", "d", 7.0)]


def test_symmetric_difference(ab):
    a, b = ab
    assert _rows(graph_symmetric_difference(a, b)) == [("b", "c", 2.0), ("c", "d", 7.0)]


def test_complement_triangle(spark):
    tri = spark.createDataFrame(
        [("x", "y", 1.0), ("y", "z", 1.0)], "src string, dst string, weight double"
    )
    got = _rows(graph_complement(tri))
    # 3 vertices, 6 ordered non-loop pairs, 2 present -> 4 complement edges
    assert got == [("x", "z", 1.0), ("y", "x", 1.0), ("z", "x", 1.0), ("z", "y", 1.0)]


def test_complement_guard(spark):
    e = spark.createDataFrame([("x", "y", 1.0)], "src string, dst string, weight double")
    with pytest.raises(ValueError):
        graph_complement(e, max_vertices=1)
