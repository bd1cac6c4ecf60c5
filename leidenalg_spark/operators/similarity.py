"""Similarity search over embedding columns (prescribed first-class op).

- brute-force cosine top-k: exact baseline.  The dot product runs as
  ``F.aggregate``/``F.zip_with`` over ``array<float>`` — JVM-side, no
  Python.  Elements are cast to double *before* multiplying and summed in
  index order, which makes the arithmetic bit-identical to the DuckDB
  oracle's ``list_``-lambda equivalent.
- LSH-bucketed variant (scale path): random-hyperplane signatures
  restrict candidate generation to equality joins on bucket keys —
  the 100 TB answer, since brute force is O(n·q) per query block.
- IVF-style variant: k-means-lite coarse centroids via deterministic
  seeding, probe the nearest ``nprobe`` cells.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda acc, v: acc + v))


def cosine_topk(
    embeddings: DataFrame, queries: DataFrame, k=10, id_col="vec_id", vec_col="embedding"
) -> DataFrame:
    """Exact top-k cosine neighbours for each query vector.

    ``queries`` is broadcast (the small side); the cross join + window
    rank keeps everything JVM-side.  Returns
    (query_id, neighbor_id, cos_sim, rank).
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    base = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    cos = _dot(F.col("qv"), F.col("nv")) / (_norm(F.col("qv")) * _norm(F.col("nv")))
    scored = (
        base.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def random_hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def lsh_bucket_ids(embeddings: DataFrame, planes: np.ndarray, vec_col="embedding") -> DataFrame:
    """Sign-of-projection LSH signature per vector (JVM arithmetic:
    the projection is an F.aggregate dot product per plane)."""
    sig = None
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bit = (_dot(F.col(vec_col), arr) > 0).cast("int")
        sig = bit if sig is None else sig * 2 + bit
    return embeddings.withColumn("bucket", sig)


def lsh_cosine_topk(
    embeddings: DataFrame, queries: DataFrame, k=10, n_planes=12, seed=42,
    id_col="vec_id", vec_col="embedding", dim=None,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket
    (single equality join instead of a cross join), then exact cosine."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = random_hyperplanes(dim, n_planes, seed)
    e_b = lsh_bucket_ids(embeddings, planes, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"), "bucket"
    )
    q_b = lsh_bucket_ids(queries, planes, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    cos = _dot(F.col("qv"), F.col("nv")) / (_norm(F.col("qv")) * _norm(F.col("nv")))
    scored = (
        e_b.join(F.broadcast(q_b), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_neardup_pairs(embeddings: DataFrame, threshold=0.95, id_col="vec_id", vec_col="embedding", max_id=None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cos >= threshold).
    ``max_id`` optionally restricts to a prefix for bounded cost."""
    e = embeddings
    if max_id is not None:
        e = e.where(F.col(id_col) < max_id)
    a = e.select(F.col(id_col).alias("a"), F.col(vec_col).alias("av"))
    b = e.select(F.col(id_col).alias("b"), F.col(vec_col).alias("bv"))
    cos = _dot(F.col("av"), F.col("bv")) / (_norm(F.col("av")) * _norm(F.col("bv")))
    return (
        a.crossJoin(b)
        .where(F.col("a") < F.col("b"))
        .select("a", "b", F.round(cos, 6).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def ivf_assign(embeddings: DataFrame, n_cells=16, seed=42, id_col="vec_id", vec_col="embedding", dim=None) -> DataFrame:
    """IVF coarse assignment: nearest of n_cells deterministic random
    centroids (stand-in for a trained k-means codebook; the Spark-side
    plumbing — argmin over cell distances, cell-partitioned storage — is
    the real scale mechanism)."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    cents = np.random.default_rng(seed).standard_normal((n_cells, dim))
    dists = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c]), lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("d"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(cents)
        ]
    )
    return embeddings.withColumn("cell", F.array_min(dists)["cell"])
