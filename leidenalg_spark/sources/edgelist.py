"""NCOL edge-list interchange — the whitespace ``src dst [weight]`` text
format igraph reads/writes (``igraph.Graph.Read_Ncol`` /
``write_ncol``; reference `io.rst` interchange docs).  The lowest-common-
denominator way a leidenalg user ships a graph in or out of this engine.

Both directions are pure DataFrame text I/O — ``spark.read.text`` splits
per line in parallel (a 100 TB edge list is just a big text scan;
Catalyst prunes nothing here but the format is line-delimited so input
splits are free), and the writer is ``df.write.text`` over a formatted
projection.  No driver-side iteration, no Python row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_ncol(
    spark: SparkSession,
    path: str,
    weighted: bool = True,
    default_weight: float = 1.0,
) -> DataFrame:
    """Parse an NCOL edge list into (src:string, dst:string,
    weight:double).  Lines are ``src dst [weight]`` separated by runs of
    whitespace; blank lines and ``#`` comments are skipped; a missing
    third column takes ``default_weight``.  Malformed lines (one token)
    raise at action time under ANSI only if they would — they are
    dropped explicitly instead, keeping the reader total.
    """
    lines = spark.read.text(path).select(F.trim("value").alias("ln"))
    rows = lines.where((F.length("ln") > 0) & (~F.col("ln").startswith("#")))
    toks = rows.select(F.split("ln", r"\s+").alias("t"))
    toks = toks.where(F.size("t") >= 2)
    w = (
        F.when(F.size("t") >= 3, F.element_at("t", 3).try_cast("double"))
        .otherwise(F.lit(float(default_weight)))
        if weighted
        else F.lit(float(default_weight))
    )
    return toks.select(
        F.element_at("t", 1).alias("src"),
        F.element_at("t", 2).alias("dst"),
        F.coalesce(w, F.lit(float(default_weight))).alias("weight"),
    )


def write_ncol(edges: DataFrame, path: str, weighted: bool = True, mode: str = "overwrite") -> None:
    """Write (src, dst[, weight]) as NCOL text.  Weights are rendered
    with ``format_number``-free repr (plain cast) so integral weights
    stay exact; igraph parses either form."""
    if weighted and "weight" in edges.columns:
        line = F.concat_ws(
            " ",
            F.col("src").cast("string"),
            F.col("dst").cast("string"),
            F.col("weight").cast("double").cast("string"),
        )
    else:
        line = F.concat_ws(" ", F.col("src").cast("string"), F.col("dst").cast("string"))
    edges.select(line.alias("value")).write.mode(mode).text(path)
