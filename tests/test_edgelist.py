"""NCOL edge-list interchange (sources/edgelist.py) — reference
`io.rst` Read_Ncol/write_ncol semantics: whitespace-split lines,
optional third weight column, comments/blank lines skipped."""

import pytest
from pyspark.sql import functions as F

from leidenalg_spark.sources.edgelist import read_ncol, write_ncol


def test_read_ncol_parses_comments_blanks_and_default_weight(spark, tmp_path):
    p = tmp_path / "g.ncol"
    p.write_text(
        "# comment line\n"
        "a b 2.5\n"
        "\n"
        "   \n"
        "b c\n"          # missing weight -> default
        "lonely\n"       # one token -> dropped
        "c\ta\t0.5\n"    # tab separated
    )
    rows = {(r.src, r.dst): r.weight for r in read_ncol(spark, str(p)).collect()}
    assert rows == {("a", "b"): 2.5, ("b", "c"): 1.0, ("c", "a"): 0.5}


def test_read_ncol_unweighted_ignores_third_column(spark, tmp_path):
    p = tmp_path / "g.ncol"
    p.write_text("a b 9.0\n")
    (row,) = read_ncol(spark, str(p), weighted=False, default_weight=3.0).collect()
    assert (row.src, row.dst, row.weight) == ("a", "b", 3.0)


def test_read_ncol_non_numeric_weight_falls_back(spark, tmp_path):
    p = tmp_path / "g.ncol"
    p.write_text("a b heavy\n")
    (row,) = read_ncol(spark, str(p)).collect()
    assert row.weight == 1.0


@pytest.mark.parametrize("weighted", [True, False])
def test_write_read_roundtrip(spark, tmp_path, weighted):
    edges = spark.createDataFrame(
        [("n1", "n2", 1.0), ("n2", "n3", 2.25), ("n3", "n1", 4.0)],
        "src string, dst string, weight double",
    )
    path = str(tmp_path / "out")
    write_ncol(edges, path, weighted=weighted)
    back = read_ncol(spark, path).orderBy("src")
    got = [(r.src, r.dst, r.weight) for r in back.collect()]
    if weighted:
        assert got == [("n1", "n2", 1.0), ("n2", "n3", 2.25), ("n3", "n1", 4.0)]
    else:
        assert got == [("n1", "n2", 1.0), ("n2", "n3", 1.0), ("n3", "n1", 1.0)]


def test_write_ncol_without_weight_column(spark, tmp_path):
    edges = spark.createDataFrame([("x", "y")], "src string, dst string")
    path = str(tmp_path / "out")
    write_ncol(edges, path)
    (row,) = read_ncol(spark, path).collect()
    assert (row.src, row.dst, row.weight) == ("x", "y", 1.0)
