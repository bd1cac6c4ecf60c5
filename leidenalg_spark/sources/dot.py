"""Graphviz DOT interchange — igraph ``write_dot`` / ``Read_DOT``
(reference `io.rst` interchange family, next to GML/LGL/Pajek/NCOL/
GraphML here): one quoted edge statement per line inside a
``digraph`` block.

Layout contract (same pragmatics as :mod:`.graphml`): the text source
writes one file per partition, with the ``digraph G {`` / ``}`` frame
as single-row DataFrames unioned around the body — our reader (and any
line-oriented parser) extracts edge statements by pattern and ignores
the frame, while a strictly single-document consumer (Graphviz itself)
wants a ``coalesce(1)`` export, as with every single-file format.

Name contract (enforced at write): vertex names must not contain
double quotes or newlines — DOT quoting is not escaped here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BAD_NAME = r'["\n]'
_EDGE_RE = r'^\s*"([^"]*)"\s*->\s*"([^"]*)"(?:\s*\[weight=([-+0-9.eE]+)\])?\s*;\s*$'


def write_dot(edges: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write (src, dst[, weight]) as DOT edge statements:
    ``"src" -> "dst" [weight=w];`` — one line per edge, embarrassingly
    parallel (no id table, no global sort)."""
    s = F.col("src").cast("string")
    d = F.col("dst").cast("string")
    bad = edges.where(s.rlike(_BAD_NAME) | d.rlike(_BAD_NAME)).limit(1).collect()
    if bad:
        raise ValueError(f"DOT names cannot contain quotes or newlines: {bad[0]}")
    w = (
        F.concat(F.lit(" [weight="), F.col("weight").cast("double").cast("string"), F.lit("]"))
        if "weight" in edges.columns
        else F.lit("")
    )
    body = edges.select(
        F.concat(F.lit('  "'), s, F.lit('" -> "'), d, F.lit('"'), w, F.lit(";")).alias("value")
    )
    spark = edges.sparkSession
    header = spark.createDataFrame([("digraph G {",)], "value string")
    footer = spark.createDataFrame([("}",)], "value string")
    header.union(body).union(footer).write.mode(mode).text(path)


def read_dot(spark: SparkSession, path: str, default_weight: float = 1.0) -> DataFrame:
    """Parse DOT edge statements into (src:string, dst:string,
    weight:double); frame lines and anything that is not a quoted edge
    statement are ignored."""
    lines = spark.read.text(path)
    return (
        lines.where(F.col("value").rlike(_EDGE_RE))
        .select(
            F.regexp_extract("value", _EDGE_RE, 1).alias("src"),
            F.regexp_extract("value", _EDGE_RE, 2).alias("dst"),
            F.coalesce(
                F.regexp_extract("value", _EDGE_RE, 3).try_cast("double"),
                F.lit(float(default_weight)),
            ).alias("weight"),
        )
    )
