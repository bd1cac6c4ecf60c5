"""Deterministic fixture graphs mirroring the reference test matrix
(tests/test_VertexPartition.py:15-81, tests/test_Optimiser.py), per
FIXTURES.md §2.  Everything is closed-form or hash-seeded — no igraph, no
external data.  Returned as (n, src, dst, weight|None) NumPy edge lists,
plus helpers to lift them into Spark DataFrames.
"""

from __future__ import annotations

import numpy as np

# Zachary karate club — canonical public 78-edge list (same graph as
# igraph Famous('Zachary'), used at tests/test_VertexPartition.py:18).
ZACHARY_EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 10),
    (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21), (0, 31), (1, 2),
    (1, 3), (1, 7), (1, 13), (1, 17), (1, 19), (1, 21), (1, 30), (2, 3),
    (2, 7), (2, 8), (2, 9), (2, 13), (2, 27), (2, 28), (2, 32), (3, 7),
    (3, 12), (3, 13), (4, 6), (4, 10), (5, 6), (5, 10), (5, 16), (6, 16),
    (8, 30), (8, 32), (8, 33), (9, 33), (13, 33), (14, 32), (14, 33),
    (15, 32), (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
    (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32), (23, 33),
    (24, 25), (24, 27), (24, 31), (25, 31), (26, 29), (26, 33), (27, 33),
    (28, 31), (28, 33), (29, 32), (29, 33), (30, 32), (30, 33), (31, 32),
    (31, 33), (32, 33),
]


def zachary():
    e = np.array(ZACHARY_EDGES, dtype=np.int64)
    return 34, e[:, 0], e[:, 1], None


def full(n):
    """Complete graph K_n (tests/test_Optimiser.py:13)."""
    i, j = np.triu_indices(n, k=1)
    return n, i.astype(np.int64), j.astype(np.int64), None


def full_bipartite(n1, n2, weight=None):
    """Complete bipartite K_{n1,n2} (tests/test_Optimiser.py:167-175)."""
    a = np.repeat(np.arange(n1), n2)
    b = np.tile(np.arange(n1, n1 + n2), n1)
    w = None if weight is None else np.full(len(a), float(weight))
    return n1 + n2, a.astype(np.int64), b.astype(np.int64), w


def edge_plus_singleton():
    """Single edge (0,2) plus isolated vertex 1 (tests/test_Optimiser.py:42)."""
    return 3, np.array([0]), np.array([2]), None


def tree(n, branching=3):
    """Balanced tree on n vertices (tests/test_VertexPartition.py:46-51):
    vertex v>0 links to parent (v-1)//branching."""
    v = np.arange(1, n, dtype=np.int64)
    parent = (v - 1) // branching
    return n, parent, v, None


def forest(n_trees=10, tree_n=10, branching=3):
    """Disjoint union of trees (tests/test_Optimiser.py:96-103)."""
    srcs, dsts = [], []
    for t in range(n_trees):
        _, s, d, _ = tree(tree_n, branching)
        srcs.append(s + t * tree_n)
        dsts.append(d + t * tree_n)
    return n_trees * tree_n, np.concatenate(srcs), np.concatenate(dsts), None


def lattice(n=100, nei=3):
    """Circular ring lattice, each vertex joined to its nei nearest
    neighbours on either side (tests/test_VertexPartition.py:55-58)."""
    v = np.arange(n, dtype=np.int64)
    srcs, dsts = [], []
    for k in range(1, nei + 1):
        srcs.append(v)
        dsts.append((v + k) % n)
    return n, np.concatenate(srcs), np.concatenate(dsts), None


def _pair_hash(i, j, seed):
    """Deterministic 64-bit mix (splitmix64 finaliser) of an (i,j,seed)
    triple — a portable stand-in for the reference's igraph RNG graphs.
    uint64 wraparound is intended."""
    with np.errstate(over="ignore"):
        x = (np.uint64(i) * np.uint64(0x9E3779B97F4A7C15)
             + np.uint64(j) * np.uint64(0xBF58476D1CE4E5B9)
             + np.uint64(seed) * np.uint64(0x94D049BB133111EB))
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def erdos_renyi(n=100, p=0.05, directed=False, loops=False, seed=42):
    """Deterministic pseudo-ER graph: pair (i,j) is an edge iff
    hash(i,j,seed) mod 10^6 < p*10^6 (FIXTURES.md §2)."""
    if directed:
        i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        i, j = i.ravel(), j.ravel()
        keep = i != j
        i, j = i[keep], j[keep]
    else:
        i, j = np.triu_indices(n, k=1)
    h = np.array([_pair_hash(a, b, seed) for a, b in zip(i, j)], dtype=np.uint64)
    mask = (h % np.uint64(1_000_000)) < np.uint64(int(p * 1_000_000))
    src, dst = i[mask].astype(np.int64), j[mask].astype(np.int64)
    if loops:
        lv = np.array([v for v in range(n) if _pair_hash(v, v, seed + 1) % np.uint64(10) < np.uint64(2)], dtype=np.int64)
        src = np.concatenate([src, lv])
        dst = np.concatenate([dst, lv])
    return n, src, dst, None


def with_random_weights(fix, seed=7):
    """Weighted duplicate of a fixture (tests/test_VertexPartition.py:75-81):
    weight = 0.1 + (hash(src,dst,seed) mod 1000)/1000."""
    n, s, d, _ = fix
    h = np.array([_pair_hash(a, b, seed) for a, b in zip(s, d)], dtype=np.uint64)
    w = 0.1 + (h % np.uint64(1000)).astype(np.float64) / 1000.0
    return n, s, d, w


def bipartite_8():
    """8-vertex bipartite example (tests/test_VertexPartition.py:61-73)."""
    edges = [(0, 4), (0, 5), (0, 6), (1, 4), (1, 5), (2, 6), (2, 7), (3, 6), (3, 7), (3, 5)]
    e = np.array(edges, dtype=np.int64)
    types = np.array([0, 0, 0, 0, 1, 1, 1, 1], dtype=np.int64)
    return 8, e[:, 0], e[:, 1], None, types


def to_local_graph(fix, directed=False, node_size=None):
    from ..localcore.graph import LocalGraph

    n, s, d, w = fix[:4]
    return LocalGraph(n, s, d, w, node_size=node_size, directed=directed)


def to_spark_df(spark, fix, directed=False):
    """Lift a fixture into an edges DataFrame (src, dst, weight)."""
    import pandas as pd

    n, s, d, w = fix[:4]
    if w is None:
        w = np.ones(len(s))
    pdf = pd.DataFrame({"src": s, "dst": d, "weight": w.astype(np.float64)})
    df = spark.createDataFrame(pdf)
    return n, df


def sbm_edges_df(
    spark,
    n_blocks: int = 8,
    block_size: int = 200,
    m_in: int = 1200,
    m_out: int = 400,
    seed: int = 7,
):
    """Deterministic planted-partition (SBM, G(n,m)-flavoured) generator:
    ``m_in`` candidate intra-block edges per block plus ``m_out``
    candidate inter-block edges, endpoints picked by ``xxhash64`` — no
    Python RNG, no rand(): the identical graph is reproduced at any
    parallelism (the synthetic_transcripts convention).  Collisions and
    self-loops are dropped and duplicates collapse (weight = 1.0), so
    realised counts are slightly below the targets — irrelevant for the
    planted-recovery use.

    Returns ``(edges_df, truth_df)``: the edge table and the planted
    (id, comm) membership.  Built from ``spark.range`` — generation
    parallelises and scales linearly with the edge count.

    The classic community-detection validation harness (leidenalg's own
    papers benchmark on LFR/SBM graphs): run leiden on ``edges`` and
    score recovery against ``truth`` with
    :func:`leidenalg_spark.operators.community.partition_compare`.
    """
    from pyspark.sql import functions as F

    n = n_blocks * block_size

    def h(tag, *cols):
        return F.xxhash64(F.lit(tag), *cols, F.lit(seed))

    intra = (
        spark.range(n_blocks * m_in)
        .withColumn("b", (F.col("id") / m_in).cast("long"))
        .select(
            (F.col("b") * block_size + F.pmod(h("i1", "id"), F.lit(block_size))).alias("src"),
            (F.col("b") * block_size + F.pmod(h("i2", "id"), F.lit(block_size))).alias("dst"),
        )
    )
    inter = spark.range(m_out).select(
        F.pmod(h("o1", "id"), F.lit(n)).alias("src"),
        F.pmod(h("o2", "id"), F.lit(n)).alias("dst"),
    )
    edges = (
        intra.unionByName(inter)
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    truth = spark.range(n).select(
        F.col("id"), (F.col("id") / block_size).cast("long").alias("comm")
    )
    return edges, truth
