"""GraphML + Pajek interchange (sources/graphml.py, sources/pajek.py) —
reference `io.rst` Read_GraphML/write_graphml, Read_Pajek/write_pajek."""

import pytest
from pyspark.sql import functions as F

from leidenalg_spark.sources.graphml import read_graphml, write_graphml
from leidenalg_spark.sources.pajek import read_pajek, write_pajek

EDGES = [("a", "b", 2.5), ("b", "c", 1.0), ("c", "a", 0.25)]


def _edges(spark, rows=EDGES):
    return spark.createDataFrame(rows, "src string, dst string, weight double")


def _collect(df):
    return sorted((r.src, r.dst, r.weight) for r in df.collect())


# ---------- GraphML ----------

def test_graphml_roundtrip_weighted(spark, tmp_path):
    path = str(tmp_path / "g")
    write_graphml(_edges(spark), path)
    assert _collect(read_graphml(spark, path)) == sorted(EDGES)


def test_graphml_roundtrip_unweighted_default(spark, tmp_path):
    path = str(tmp_path / "g")
    write_graphml(_edges(spark).drop("weight"), path)
    got = _collect(read_graphml(spark, path, default_weight=7.0))
    assert got == sorted((s, d, 7.0) for s, d, _ in EDGES)


def test_graphml_escapes_xml_entities(spark, tmp_path):
    rows = [('a&b<c>', 'd"e\'f', 1.5)]
    path = str(tmp_path / "g")
    write_graphml(_edges(spark, rows), path)
    raw = spark.read.text(path).where(F.col("value").contains("<edge")).collect()[0].value
    assert "a&amp;b&lt;c&gt;" in raw
    assert _collect(read_graphml(spark, path)) == rows


def test_graphml_file_is_wellformed_xml(spark, tmp_path):
    import glob
    import xml.etree.ElementTree as ET

    path = str(tmp_path / "g")
    write_graphml(_edges(spark), path)
    text = "".join(open(f).read() for f in sorted(glob.glob(path + "/part-*")))
    # element order across part files is not guaranteed, but each part is
    # elements-only; wrap in the header/footer found in the concatenation
    root = ET.fromstring(text) if text.lstrip().startswith("<?xml") else None
    if root is None:
        pytest.skip("multi-part output; per-element checks covered elsewhere")
    ns = "{http://graphml.graphdrawing.org/xmlns}"
    graph = root.find(f"{ns}graph")
    assert len(graph.findall(f"{ns}node")) == 3
    assert len(graph.findall(f"{ns}edge")) == 3


# ---------- Pajek ----------

def test_pajek_roundtrip_weighted(spark, tmp_path):
    path = str(tmp_path / "p")
    write_pajek(_edges(spark), path)
    assert _collect(read_pajek(spark, path)) == sorted(EDGES)


def test_pajek_vertex_ids_are_dense_sorted(spark, tmp_path):
    path = str(tmp_path / "p")
    write_pajek(_edges(spark), path)
    lines = [r.value for r in spark.read.text(path).collect()]
    assert "*Vertices 3" in lines and "*Arcs" in lines
    assert '1 "a"' in lines and '2 "b"' in lines and '3 "c"' in lines


def test_pajek_undirected_section(spark, tmp_path):
    path = str(tmp_path / "p")
    write_pajek(_edges(spark), path, directed=False)
    lines = [r.value for r in spark.read.text(path).collect()]
    assert "*Edges" in lines


def test_pajek_reader_skips_comments_and_defaults_weight(spark, tmp_path):
    p = tmp_path / "hand.net"
    p.write_text(
        "% a comment\n"
        "*Vertices 2\n"
        '1 "x"\n'
        '2 "y node"\n'
        "*Arcs\n"
        "1 2\n"          # no weight -> default
        "2 1 3.5\n"
    )
    got = _collect(read_pajek(spark, str(p)))
    assert got == [("x", "y node", 1.0), ("y node", "x", 3.5)]


def test_pajek_rejects_quote_in_label(spark, tmp_path):
    bad = _edges(spark, [('he said "hi"', "b", 1.0)])
    with pytest.raises(ValueError):
        write_pajek(bad, str(tmp_path / "p"))


# ---------- GML ----------

def test_gml_roundtrip_weighted(spark, tmp_path):
    from leidenalg_spark.sources.gml import read_gml, write_gml

    path = str(tmp_path / "g")
    write_gml(_edges(spark), path)
    assert _collect(read_gml(spark, path)) == sorted(EDGES)


def test_gml_roundtrip_unweighted_default(spark, tmp_path):
    from leidenalg_spark.sources.gml import read_gml, write_gml

    path = str(tmp_path / "g")
    write_gml(_edges(spark).drop("weight"), path)
    got = _collect(read_gml(spark, path, default_weight=3.0))
    assert got == sorted((s, d, 3.0) for s, d, _ in EDGES)


def test_gml_rejects_quoted_labels(spark, tmp_path):
    from leidenalg_spark.sources.gml import write_gml

    with pytest.raises(ValueError):
        write_gml(_edges(spark, [('a"b', "c", 1.0)]), str(tmp_path / "g"))


def test_gml_reads_handwritten_file(spark, tmp_path):
    from leidenalg_spark.sources.gml import read_gml

    p = tmp_path / "hand.gml"
    p.write_text(
        'graph [\n  directed 1\n'
        '  node [ id 0 label "x" ]\n  node [ id 1 label "y" ]\n'
        '  edge [ source 0 target 1 value 2.0 ]\n'
        '  edge [ source 1 target 0 ]\n]\n'
    )
    got = _collect(read_gml(spark, str(p), default_weight=9.0))
    assert got == [("x", "y", 2.0), ("y", "x", 9.0)]


# ---------- LGL ----------

def test_lgl_roundtrip_weighted(spark, tmp_path):
    from leidenalg_spark.sources.lgl import read_lgl, write_lgl

    path = str(tmp_path / "g")
    write_lgl(_edges(spark), path)
    assert _collect(read_lgl(spark, path)) == sorted(EDGES)


def test_lgl_roundtrip_unweighted_default(spark, tmp_path):
    from leidenalg_spark.sources.lgl import read_lgl, write_lgl

    path = str(tmp_path / "g")
    write_lgl(_edges(spark).drop("weight"), path)
    got = _collect(read_lgl(spark, path, default_weight=5.0))
    assert got == sorted((s, d, 5.0) for s, d, _ in EDGES)


def test_lgl_rejects_bad_names(spark, tmp_path):
    from leidenalg_spark.sources.lgl import write_lgl

    with pytest.raises(ValueError):
        write_lgl(_edges(spark, [("a b", "c", 1.0)]), str(tmp_path / "g"))
    with pytest.raises(ValueError):
        write_lgl(_edges(spark, [("a", "c#d", 1.0)]), str(tmp_path / "g"))


def test_lgl_reads_handwritten_file(spark, tmp_path):
    from leidenalg_spark.sources.lgl import read_lgl

    p = tmp_path / "hand.lgl"
    p.write_text("# a\nb 2.0\nc\n# b\nc 0.5\n")
    got = _collect(read_lgl(spark, str(p), default_weight=1.0))
    assert got == [("a", "b", 2.0), ("a", "c", 1.0), ("b", "c", 0.5)]
