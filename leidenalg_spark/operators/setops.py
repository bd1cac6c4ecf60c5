"""Graph set operations over edge tables — the igraph binary graph
operators (`igraph.union` / `intersection` / `difference` /
`symmetric_difference` / `complementer`; reference users compose
leidenalg inputs with these constantly, e.g. "communities of the graph
minus last month's edges").

Graphs here are weighted edge tables keyed by (src, dst); vertex
identity is by name, matching igraph's ``union(..., byname=True)``
semantics.  All binary ops are ONE shuffle on the canonical edge key —
a groupBy or a join, both map-side-combinable / AQE-broadcastable —
so they scale exactly like the dedup hash-groupBy.  ``complementer``
is inherently O(|V|²) output and is guarded by ``max_vertices``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEY = ["src", "dst"]


def _norm(edges: DataFrame) -> DataFrame:
    w = F.col("weight").cast("double") if "weight" in edges.columns else F.lit(1.0)
    return edges.select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
        w.alias("weight"),
    )


def graph_union(a: DataFrame, b: DataFrame, weight_agg: str = "sum") -> DataFrame:
    """Edge-wise union; weights of edges present in both combine by
    ``weight_agg`` (sum | max | min — igraph's combine_edges options).
    Multi-edges within one input also collapse under the same rule,
    mirroring ``igraph.union(..., byname=True)`` + simplify."""
    agg = {"sum": F.sum, "max": F.max, "min": F.min}[weight_agg]
    return (
        _norm(a).unionByName(_norm(b))
        .groupBy(*_KEY)
        .agg(agg("weight").alias("weight"))
    )


def graph_intersection(a: DataFrame, b: DataFrame, weight_agg: str = "sum") -> DataFrame:
    """Edges present in BOTH inputs; each side's multi-edges collapse
    first, then the two weights combine by ``weight_agg``."""
    agg = {"sum": F.sum, "max": F.max, "min": F.min}[weight_agg]
    ca = _norm(a).groupBy(*_KEY).agg(agg("weight").alias("wa"))
    cb = _norm(b).groupBy(*_KEY).agg(agg("weight").alias("wb"))
    comb = {
        "sum": F.col("wa") + F.col("wb"),
        "max": F.greatest("wa", "wb"),
        "min": F.least("wa", "wb"),
    }[weight_agg]
    return ca.join(cb, _KEY).select(*_KEY, comb.alias("weight"))


def graph_difference(a: DataFrame, b: DataFrame) -> DataFrame:
    """Edges of ``a`` not present in ``b`` (a's weights kept, collapsed
    by sum) — ``igraph.difference`` / ``g1 - g2``."""
    ca = _norm(a).groupBy(*_KEY).agg(F.sum("weight").alias("weight"))
    return ca.join(_norm(b).select(*_KEY).distinct(), _KEY, "left_anti")


def graph_symmetric_difference(a: DataFrame, b: DataFrame) -> DataFrame:
    """Edges in exactly one of the two inputs (weights from the side
    that has them) — igraph ``g1 ^ g2``."""
    return graph_difference(a, b).unionByName(graph_difference(b, a))


def graph_complement(edges: DataFrame, loops: bool = False, max_vertices: int = 100_000) -> DataFrame:
    """``igraph.complementer``: all vertex pairs NOT connected, weight 1.
    Output is O(|V|²) by definition, so the vertex set is counted first
    and the op refuses beyond ``max_vertices`` — at link-graph scale the
    complement of a sparse graph is a dense graph and should never be
    materialised; push the negation into the consumer instead."""
    verts = (
        _norm(edges).select(F.col("src").alias("name"))
        .union(_norm(edges).select(F.col("dst")))
        .distinct()
    )
    n = verts.count()
    if n > max_vertices:
        raise ValueError(
            f"complement of {n} vertices is {n * n:,} pairs; raise max_vertices "
            "explicitly if you really want this materialised"
        )
    pairs = verts.select(F.col("name").alias("src")).crossJoin(
        verts.select(F.col("name").alias("dst"))
    )
    if not loops:
        pairs = pairs.where(F.col("src") != F.col("dst"))
    return pairs.join(_norm(edges).select(*_KEY).distinct(), _KEY, "left_anti").select(
        *_KEY, F.lit(1.0).alias("weight")
    )
