"""Per-community structural metrics over an (edges, membership) pair.

The reference exposes per-community aggregates only through the partition
object (``total_weight_in_comm`` / ``total_weight_from_comm`` etc.,
``src/VertexPartition.py`` + ``include/GraphHelper.h``); once a partition
is found there is no bulk "describe every community" call.  At 10^12-edge
scale that per-community inspection is exactly what an analyst runs right
after Leiden, so we provide it as one declarative plan.

Scale shape: two hash joins decorate each edge with the community of both
endpoints (identical to the PageRank gather join — membership is a
|V|-row table, broadcast when small, hash-partitioned on id otherwise),
then ONE explode + hash aggregate on ``comm`` produces every metric
map-side-combined.  No per-row Python, no driver collect; the community
table that comes out is |C| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def community_stats(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """Describe every community of ``membership`` (columns ``id, comm``)
    over the undirected weighted graph ``edges`` (``src, dst, weight``).

    Returns one row per community::

        comm, n_vertices, n_internal_edges, internal_weight, cut_weight,
        volume, conductance, density

    * ``internal_weight`` — Σw over edges with both endpoints in ``comm``
      (each undirected edge counted once; self-loops are internal).
    * ``cut_weight``      — Σw over edges with exactly one endpoint in
      ``comm`` (each cut edge contributes to both communities).
    * ``volume``          — Σ of incident weight, ``2·internal + cut``
      (the CUT/VOL convention of conductance; self-loops count twice).
    * ``conductance``     — ``cut / min(volume, total_volume − volume)``;
      0 for an isolated or whole-graph community.
    * ``density``         — ``2·n_internal_edges / (n·(n−1))`` assuming a
      simple graph; 0 for singletons.

    Vertices present in ``membership`` but absent from ``edges`` still
    count toward ``n_vertices`` (zero contribution elsewhere).
    """
    m = membership.select("id", "comm")
    lab = (
        edges.select("src", "dst", "weight")
        .join(m.select(F.col("id").alias("src"), F.col("comm").alias("c_src")), "src")
        .join(m.select(F.col("id").alias("dst"), F.col("comm").alias("c_dst")), "dst")
    )

    w = F.col("weight").cast("double")
    zero = F.lit(0.0)
    internal = F.array(
        F.struct(
            F.col("c_src").alias("comm"),
            w.alias("iw"),
            zero.alias("cw"),
            F.lit(1).cast("long").alias("ie"),
        )
    )
    cut_both = F.array(
        F.struct(F.col("c_src").alias("comm"), zero.alias("iw"), w.alias("cw"),
                 F.lit(0).cast("long").alias("ie")),
        F.struct(F.col("c_dst").alias("comm"), zero.alias("iw"), w.alias("cw"),
                 F.lit(0).cast("long").alias("ie")),
    )
    per_end = (
        lab.select(
            F.explode(
                F.when(F.col("c_src") == F.col("c_dst"), internal).otherwise(cut_both)
            ).alias("x")
        ).select("x.*")
    )
    agg = per_end.groupBy("comm").agg(
        F.sum("iw").alias("iw"), F.sum("cw").alias("cw"), F.sum("ie").alias("ne")
    )
    nv = m.groupBy("comm").agg(F.count(F.lit(1)).alias("n_vertices"))

    # |C|-row table from here on: the one-row total broadcasts for free
    vol = 2.0 * F.coalesce(F.col("iw"), F.lit(0.0)) + F.coalesce(F.col("cw"), F.lit(0.0))
    base = nv.join(agg, "comm", "left").withColumn("volume", vol)
    joined = base.crossJoin(
        F.broadcast(base.agg(F.sum("volume").alias("total_vol")))
    )
    denom_c = F.least(F.col("volume"), F.col("total_vol") - F.col("volume"))
    pairs = F.col("n_vertices").cast("double") * (F.col("n_vertices") - 1).cast("double")
    return joined.select(
        "comm",
        "n_vertices",
        F.coalesce(F.col("ne"), F.lit(0)).cast("long").alias("n_internal_edges"),
        F.round(F.coalesce(F.col("iw"), F.lit(0.0)), 6).alias("internal_weight"),
        F.round(F.coalesce(F.col("cw"), F.lit(0.0)), 6).alias("cut_weight"),
        F.round(F.col("volume"), 6).alias("volume"),
        F.round(
            F.when(denom_c > 0, F.coalesce(F.col("cw"), F.lit(0.0)) / denom_c).otherwise(0.0), 6
        ).alias("conductance"),
        F.round(
            F.when(pairs > 0, 2.0 * F.coalesce(F.col("ne"), F.lit(0)) / pairs).otherwise(0.0), 6
        ).alias("density"),
    )
