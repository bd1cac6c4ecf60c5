"""Pajek ``.net`` interchange — the ``*Vertices`` / ``*Arcs`` /
``*Edges`` format igraph reads/writes (``igraph.Graph.Read_Pajek`` /
``write_pajek``; reference `io.rst` interchange docs).

Pajek is index-based: vertices get 1-based integer ids and a quoted
label, and the edge section references the ids.  The writer assigns ids
by label sort order (``row_number`` over one global sort — Pajek is an
interchange format for single-machine tools, so the vertex table is by
construction small enough to sort; the EDGE section, which is the big
side at scale, is an AQE-planned equi-join projection with no global
sort — broadcast when the id table is small, shuffle join otherwise).

The reader is section-free by pattern: a line is a vertex declaration
iff it is ``<int> "label"…`` and an edge iff it is 2–3 unquoted numeric
tokens — exactly the canonical layout both this writer and igraph's
produce.  Files mixing *Arcs and *Edges sections are read as the union
of both (the distinction is directedness, which an edge table does not
encode); ``%`` comment lines and section headers are skipped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_pajek(edges: DataFrame, path: str, directed: bool = True, mode: str = "overwrite") -> None:
    """Write (src, dst[, weight]) as a Pajek .net file: a ``*Vertices n``
    header, one ``id "label"`` line per vertex, then ``*Arcs`` (or
    ``*Edges`` when ``directed=False``) with ``src_id dst_id weight``."""
    spark = edges.sparkSession
    names = (
        edges.select(F.col("src").cast("string").alias("name"))
        .union(edges.select(F.col("dst").cast("string")))
        .distinct()
    )
    # Pajek labels are quoted; embedded quotes have no escape in the
    # format, so reject them rather than write an unreadable file.
    ids = names.select(
        "name", F.row_number().over(Window.orderBy("name")).alias("vid")
    ).cache()
    n = ids.count()
    bad = ids.where(F.col("name").contains('"')).limit(1).collect()
    if bad:
        raise ValueError(f"Pajek labels cannot contain double quotes: {bad[0].name!r}")
    vert_lines = ids.select(
        F.concat(F.col("vid").cast("string"), F.lit(' "'), F.col("name"), F.lit('"')).alias("value")
    )
    w = (
        F.col("weight").cast("double").cast("string")
        if "weight" in edges.columns
        else F.lit("1.0")
    )
    e = (
        edges.select(F.col("src").cast("string").alias("s"), F.col("dst").cast("string").alias("d"), w.alias("w"))
        .join(ids.withColumnRenamed("name", "s").withColumnRenamed("vid", "sid"), "s")
        .join(ids.withColumnRenamed("name", "d").withColumnRenamed("vid", "did"), "d")
        .select(F.concat_ws(" ", F.col("sid").cast("string"), F.col("did").cast("string"), "w").alias("value"))
    )
    header = spark.createDataFrame([(f"*Vertices {n}",)], "value string")
    section = spark.createDataFrame([("*Arcs" if directed else "*Edges",)], "value string")
    header.union(vert_lines).union(section).union(e).write.mode(mode).text(path)
    ids.unpersist()


def read_pajek(spark: SparkSession, path: str, default_weight: float = 1.0) -> DataFrame:
    """Parse a Pajek .net file into (src:string, dst:string,
    weight:double), resolving integer vertex ids back to labels.
    Vertices never referenced by an edge do not survive (edge-list
    round-trip caveat, as with NCOL/GraphML)."""
    lines = spark.read.text(path).select(F.trim("value").alias("ln"))
    body = lines.where(
        (F.length("ln") > 0) & (~F.col("ln").startswith("*")) & (~F.col("ln").startswith("%"))
    )
    verts = body.where(F.col("ln").rlike(r'^\d+\s+"')).select(
        F.regexp_extract("ln", r"^(\d+)\s", 1).cast("bigint").alias("vid"),
        F.regexp_extract("ln", r'^\d+\s+"([^"]*)"', 1).alias("name"),
    )
    e = body.where(F.col("ln").rlike(r"^\d+\s+\d+(\s+[-+0-9.eE]+)?$")).select(
        F.split("ln", r"\s+").alias("t")
    )
    e = e.select(
        F.element_at("t", 1).cast("bigint").alias("sid"),
        F.element_at("t", 2).cast("bigint").alias("did"),
        F.coalesce(
            F.when(F.size("t") >= 3, F.element_at("t", 3).try_cast("double")),
            F.lit(float(default_weight)),
        ).alias("weight"),
    )
    sv = verts  # AQE broadcasts when small; no forced hint
    return (
        e.join(sv.select(F.col("vid").alias("sid"), F.col("name").alias("src")), "sid")
        .join(sv.select(F.col("vid").alias("did"), F.col("name").alias("dst")), "did")
        .select("src", "dst", "weight")
    )
