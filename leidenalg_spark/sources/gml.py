"""GML interchange — the key-value graph format igraph reads/writes
(``igraph.Graph.Read_GML`` / ``write_gml``; reference `io.rst`
interchange docs).

GML is integer-id based like Pajek: the writer assigns ids by label
sort order (one ``row_number`` over the vertex table — small by
interchange contract; the EDGE section, the big side at scale, is an
AQE equi-join projection with no global sort).  Edge weight is written
as the classic GML ``value`` key.

Layout contract: the writer emits one block per line (``node [ id 0
label "a" ]`` / ``edge [ source 0 target 1 value 1.0 ]``) — GML is
whitespace-insensitive, so igraph reads this fine; our reader parses
exactly this one-block-per-line convention (multi-line GML written by
other tools should route through NCOL).  GML has no quote escape, so
labels containing ``"`` are rejected at write time (same contract as
the Pajek writer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_gml(edges: DataFrame, path: str, directed: bool = True, mode: str = "overwrite") -> None:
    """Write (src, dst[, weight]) as GML text: ``graph [`` header with a
    ``directed`` flag, one ``node`` block per vertex (id + quoted
    label), one ``edge`` block per edge (source/target ids + ``value``
    weight)."""
    spark = edges.sparkSession
    names = (
        edges.select(F.col("src").cast("string").alias("name"))
        .union(edges.select(F.col("dst").cast("string")))
        .distinct()
    )
    ids = names.select(
        "name", (F.row_number().over(Window.orderBy("name")) - 1).alias("vid")
    ).cache()
    bad = ids.where(F.col("name").contains('"')).limit(1).collect()
    if bad:
        raise ValueError(f"GML labels cannot contain double quotes: {bad[0].name!r}")
    node_lines = ids.select(
        F.concat(
            F.lit("  node [ id "), F.col("vid").cast("string"),
            F.lit(' label "'), F.col("name"), F.lit('" ]'),
        ).alias("value")
    )
    # omit the value key entirely when the input has no weight column —
    # the reader's default_weight applies (same contract as GraphML)
    w = (
        F.concat(F.lit(" value "), F.col("weight").cast("double").cast("string"))
        if "weight" in edges.columns
        else F.lit("")
    )
    edge_lines = (
        edges.select(
            F.col("src").cast("string").alias("s"),
            F.col("dst").cast("string").alias("d"),
            w.alias("w"),
        )
        .join(ids.withColumnRenamed("name", "s").withColumnRenamed("vid", "sid"), "s")
        .join(ids.withColumnRenamed("name", "d").withColumnRenamed("vid", "did"), "d")
        .select(
            F.concat(
                F.lit("  edge [ source "), F.col("sid").cast("string"),
                F.lit(" target "), F.col("did").cast("string"),
                F.col("w"), F.lit(" ]"),
            ).alias("value")
        )
    )
    header = spark.createDataFrame(
        [("graph [",), (f"  directed {1 if directed else 0}",)], "value string"
    )
    footer = spark.createDataFrame([("]",)], "value string")
    header.union(node_lines).union(edge_lines).union(footer).write.mode(mode).text(path)
    ids.unpersist()


def read_gml(spark: SparkSession, path: str, default_weight: float = 1.0) -> DataFrame:
    """Parse one-block-per-line GML into (src:string, dst:string,
    weight:double), resolving integer node ids back to labels.  A
    missing ``value`` key takes ``default_weight``; vertices never
    referenced by an edge do not survive (edge-list round-trip caveat,
    as with NCOL/GraphML/Pajek)."""
    lines = spark.read.text(path).select(F.trim("value").alias("ln"))
    verts = lines.where(F.col("ln").rlike(r"^node\s*\[")).select(
        F.regexp_extract("ln", r"\bid\s+(\d+)", 1).cast("bigint").alias("vid"),
        F.regexp_extract("ln", r'\blabel\s+"([^"]*)"', 1).alias("name"),
    )
    e = lines.where(F.col("ln").rlike(r"^edge\s*\[")).select(
        F.regexp_extract("ln", r"\bsource\s+(\d+)", 1).cast("bigint").alias("sid"),
        F.regexp_extract("ln", r"\btarget\s+(\d+)", 1).cast("bigint").alias("did"),
        F.coalesce(
            F.regexp_extract("ln", r"\bvalue\s+([-+0-9.eE]+)", 1).try_cast("double"),
            F.lit(float(default_weight)),
        ).alias("weight"),
    )
    return (
        e.join(verts.select(F.col("vid").alias("sid"), F.col("name").alias("src")), "sid")
        .join(verts.select(F.col("vid").alias("did"), F.col("name").alias("dst")), "did")
        .select("src", "dst", "weight")
    )
