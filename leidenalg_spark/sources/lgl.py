"""LGL (Large Graph Layout) interchange — igraph ``Read_Lgl`` /
``write_lgl`` (reference `io.rst` interchange docs): adjacency blocks
of the form ``# vertexname`` followed by one ``neighbor [weight]`` line
per incident edge.

Unlike Pajek/GML there is no global id table at all: every block is
self-contained, so BOTH directions are embarrassingly parallel — the
writer is one groupBy(src) emitting one multi-line block row per source
vertex (no global sort anywhere), and the reader sets the text
datasource's ``lineSep`` to ``#`` so each adjacency block arrives as
one record regardless of input-split boundaries.

Name contract (inherent to the format, enforced at write): vertex names
must not contain whitespace, ``#``, or newlines — LGL tokenises on
whitespace and delimits blocks on ``#``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BAD_NAME = r"[\s#]"


def write_lgl(edges: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write (src, dst[, weight]) as LGL adjacency blocks.  Neighbor
    lines within a block are sorted (deterministic output); block order
    is partition order — every block is self-contained, so readers
    (ours and igraph's) do not care."""
    w = (
        F.concat(F.lit(" "), F.col("weight").cast("double").cast("string"))
        if "weight" in edges.columns
        else F.lit("")
    )
    e = edges.select(
        F.col("src").cast("string").alias("s"),
        F.concat(F.col("dst").cast("string"), w).alias("line"),
        F.col("dst").cast("string").alias("d"),
    )
    bad = e.where(
        F.col("s").rlike(_BAD_NAME) | F.col("d").rlike(_BAD_NAME)
    ).limit(1).collect()
    if bad:
        raise ValueError(
            f"LGL names cannot contain whitespace or '#': {bad[0].s!r} / {bad[0].d!r}"
        )
    blocks = (
        e.groupBy("s")
        .agg(F.array_join(F.sort_array(F.collect_list("line")), "\n").alias("lines"))
        .select(F.concat(F.lit("# "), F.col("s"), F.lit("\n"), F.col("lines")).alias("value"))
    )
    blocks.write.mode(mode).text(path)


def read_lgl(spark: SparkSession, path: str, default_weight: float = 1.0) -> DataFrame:
    """Parse LGL into (src:string, dst:string, weight:double).  Each
    ``#``-delimited record is one adjacency block: first line the source
    name, remaining lines ``neighbor [weight]``.  Sources with no
    neighbor lines contribute no rows (edge-list caveat, as with
    NCOL)."""
    recs = (
        spark.read.option("lineSep", "#").text(path)
        .select(F.col("value").alias("blk"))
        .where(F.length(F.trim("blk")) > 0)
    )
    parts = F.split(F.col("blk"), "\n")
    rows = recs.select(
        F.trim(F.element_at(parts, 1)).alias("src"),
        F.explode(F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))).alias("ln"),
    ).where(F.length(F.trim("ln")) > 0)
    tok = F.split(F.trim(F.col("ln")), r"\s+")
    return rows.select(
        "src",
        F.element_at(tok, 1).alias("dst"),
        F.coalesce(
            F.when(F.size(tok) >= 2, F.element_at(tok, 2).try_cast("double")),
            F.lit(float(default_weight)),
        ).alias("weight"),
    ).where(F.length("src") > 0)
