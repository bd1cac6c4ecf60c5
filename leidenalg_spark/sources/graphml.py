"""GraphML interchange — the XML graph format igraph reads/writes
(``igraph.Graph.Read_GraphML`` / ``write_graphml``; reference `io.rst`
interchange docs).  The richest of the formats igraph users routinely
move graphs around in.

Writer emits the canonical one-element-per-line layout (header, one
``<node>`` per line, one ``<edge>`` per line with an inline weight
``<data>`` element, footer) — which is also the layout igraph itself
writes — via a pure ``concat`` projection into ``df.write.text``.  The
reader is the inverse: a line-delimited text scan + ``regexp_extract``
projection, so both directions parallelise over input splits with no
driver iteration and no Python row path.  It parses exactly that
one-element-per-line convention (ours and igraph's); it is not a
general XML parser — multi-line or exotic attribute layouts should go
through NCOL instead.

XML-escaping of the five entities (& < > " ') is applied on write and
inverted on read, so arbitrary vertex names survive the round trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n'
    '  <key id="weight" for="edge" attr.name="weight" attr.type="double"/>\n'
    '  <graph id="G" edgedefault="directed">'
)
_FOOTER = "  </graph>\n</graphml>"

# (entity, char) pairs; on escape, & must go FIRST (else it re-escapes
# the entities just written); on unescape, &amp; must go LAST.
_ENTITIES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'")]


def _xml_escape(col: Column) -> Column:
    out = col
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ch), F.lit(ent))
    return out


def _xml_unescape(col: Column) -> Column:
    out = col
    for ent, ch in reversed(_ENTITIES):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def write_graphml(edges: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write (src, dst[, weight]) as GraphML text.  Nodes are the
    distinct endpoint set; edges carry the weight as a ``<data>``
    element when present.  Layout: one element per line, so the file is
    re-readable by :func:`read_graphml` (and by igraph)."""
    src = _xml_escape(F.col("src").cast("string"))
    dst = _xml_escape(F.col("dst").cast("string"))
    nodes = (
        edges.select(F.col("src").cast("string").alias("n"))
        .union(edges.select(F.col("dst").cast("string")))
        .distinct()
        .select(F.concat(F.lit('    <node id="'), _xml_escape(F.col("n")), F.lit('"/>')).alias("value"))
    )
    if "weight" in edges.columns:
        edge_lines = edges.select(
            F.concat(
                F.lit('    <edge source="'), src, F.lit('" target="'), dst,
                F.lit('"><data key="weight">'),
                F.col("weight").cast("double").cast("string"),
                F.lit("</data></edge>"),
            ).alias("value")
        )
    else:
        edge_lines = edges.select(
            F.concat(
                F.lit('    <edge source="'), src, F.lit('" target="'), dst, F.lit('"/>')
            ).alias("value")
        )
    header = edges.sparkSession.createDataFrame([(_HEADER,)], "value string")
    footer = edges.sparkSession.createDataFrame([(_FOOTER,)], "value string")
    # text source writes one file per partition; header/footer rows sort
    # first/last only within their own partition, so keep the XML frame
    # as single-row DataFrames unioned around the body — readers below
    # (and igraph's SAX parser) do not care about element order anyway.
    header.union(nodes).union(edge_lines).union(footer).write.mode(mode).text(path)


def read_graphml(spark: SparkSession, path: str, default_weight: float = 1.0) -> DataFrame:
    """Parse one-element-per-line GraphML into (src:string, dst:string,
    weight:double).  Node elements are ignored (the edge list implies
    the vertex set; isolated vertices do not survive an edge-list round
    trip — same caveat as NCOL).  A missing weight ``<data>`` element
    takes ``default_weight``."""
    lines = spark.read.text(path).select(F.trim("value").alias("ln"))
    e = lines.where(F.col("ln").startswith("<edge "))
    src = _xml_unescape(F.regexp_extract("ln", r'source="([^"]*)"', 1))
    dst = _xml_unescape(F.regexp_extract("ln", r'target="([^"]*)"', 1))
    w = F.regexp_extract("ln", r'<data key="weight">([^<]*)</data>', 1).try_cast("double")
    return e.select(
        src.alias("src"),
        dst.alias("dst"),
        F.coalesce(w, F.lit(float(default_weight))).alias("weight"),
    ).where((F.length("src") > 0) & (F.length("dst") > 0))
