"""Multiplex / temporal / bipartite constructions (SURVEY.md §2.2 T1-T2,
T8-T9 and §2.5 O3/O14/O15).

Local-core versions carry the exact reference semantics (used for parity
tests and coarse solves); the DataFrame helpers express the same
transforms at scale: layers are an extra ``layer`` column on one edge
table — never k physical graphs — so per-layer aggregates are a single
``groupBy(layer, comm)``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..localcore import LocalGraph, LocalPartition, OptimiserOpts, QualitySpec, optimise_partition


# ------------------------------------------------------------- local core
def find_partition_multiplex_local(
    layers, layer_weights=None, n_iterations=2, seed=0, is_membership_fixed=None, opts=None
):
    """Reference ``find_partition_multiplex`` (functions.py:95-176):
    layers = [(LocalGraph, QualitySpec)] over an identical vertex set, one
    shared membership.  Returns (membership, improvement)."""
    P = LocalPartition(layers, layer_weights=layer_weights)
    o = opts or OptimiserOpts(seed=seed)
    diff = optimise_partition(P, n_iterations=n_iterations, is_membership_fixed=is_membership_fixed, opts=o)
    return P, diff


def cpm_bipartite_layers(
    graph: LocalGraph,
    types,
    resolution_parameter_01,
    resolution_parameter_0=0.0,
    resolution_parameter_1=0.0,
    degree_as_node_size=False,
):
    """Reference ``CPMVertexPartition.Bipartite`` (VertexPartition.py:950-1105):
    three CPM layers to be optimised with layer_weights [1, -1, -1]."""
    types = np.asarray(types)
    uniq = np.unique(types)
    if len(uniq) != 2:
        raise ValueError("exactly two types required")
    t01 = (types == uniq[1]).astype(np.float64)
    if degree_as_node_size:
        if graph.directed:
            raise ValueError("degree_as_node_size unsuitable for directed graphs")
        node_sizes = graph.degree_counts().astype(np.float64)
    else:
        node_sizes = np.ones(graph.n)
    g01 = LocalGraph(graph.n, graph.src, graph.dst, graph.weight, node_size=node_sizes, directed=graph.directed)
    empty = np.empty(0, dtype=np.int64)
    g0 = LocalGraph(graph.n, empty, empty, None, node_size=np.where(t01 == 0, node_sizes, 0.0), directed=graph.directed)
    g1 = LocalGraph(graph.n, empty, empty, None, node_size=np.where(t01 == 1, node_sizes, 0.0), directed=graph.directed)
    layers = [
        (g01, QualitySpec("cpm", gamma=resolution_parameter_01)),
        (g0, QualitySpec("cpm", gamma=resolution_parameter_01 - resolution_parameter_0)),
        (g1, QualitySpec("cpm", gamma=resolution_parameter_01 - resolution_parameter_1)),
    ]
    return layers, [1.0, -1.0, -1.0]


def time_slices_to_layers_local(slice_graphs, interslice_weight=1.0):
    """Reference ``time_slices_to_layers``/``slices_to_layers``
    (functions.py:337-528) in local form: T slice graphs over vertex sets
    identified by local index; the joint vertex set is the disjoint union,
    vertex (t, i) coupled to (t+1, i) with ``interslice_weight``.

    Returns (layers, layer_weights, slice_of, local_id): layers = per-slice
    graphs (node_size 1 on members, 0 elsewhere) + one interslice layer
    with all node_size 0 (CPM gamma=0 semantics applied by the caller).
    """
    offsets = np.cumsum([0] + [g.n for g in slice_graphs])
    N = int(offsets[-1])
    slice_of = np.concatenate([np.full(g.n, t) for t, g in enumerate(slice_graphs)])
    local_id = np.concatenate([np.arange(g.n) for g in slice_graphs])
    layers = []
    for t, g in enumerate(slice_graphs):
        mask = np.zeros(N)
        mask[offsets[t] : offsets[t + 1]] = g.node_size
        layers.append(
            LocalGraph(N, g.src + offsets[t], g.dst + offsets[t], g.weight, node_size=mask, directed=g.directed)
        )
    isrc, idst = [], []
    for t in range(len(slice_graphs) - 1):
        shared = min(slice_graphs[t].n, slice_graphs[t + 1].n)
        ids = np.arange(shared, dtype=np.int64)
        isrc.append(ids + offsets[t])
        idst.append(ids + offsets[t + 1])
    if isrc:
        isrc = np.concatenate(isrc)
        idst = np.concatenate(idst)
    else:
        isrc = np.empty(0, dtype=np.int64)
        idst = np.empty(0, dtype=np.int64)
    inter = LocalGraph(
        N, isrc, idst, np.full(len(isrc), float(interslice_weight)), node_size=np.zeros(N), directed=False
    )
    layers.append(inter)
    return layers, slice_of, local_id


def find_partition_temporal_local(
    slice_graphs, method="cpm", interslice_weight=1.0, gamma=1.0, n_iterations=2, seed=0, opts=None
):
    """Reference ``find_partition_temporal`` (functions.py:178-306):
    per-slice quality layers + CPM(gamma=0) interslice coupling layer,
    jointly optimised with one shared membership; memberships returned per
    slice."""
    graph_layers, slice_of, local_id = time_slices_to_layers_local(slice_graphs, interslice_weight)
    layers = [(g, QualitySpec(method, gamma=gamma)) for g in graph_layers[:-1]]
    layers.append((graph_layers[-1], QualitySpec("cpm", gamma=0.0)))
    P, diff = find_partition_multiplex_local(layers, n_iterations=n_iterations, seed=seed, opts=opts)
    memberships = []
    for t in range(len(slice_graphs)):
        sel = slice_of == t
        memberships.append(P.membership[sel][np.argsort(local_id[sel])])
    return memberships, diff, P


# ------------------------------------------------------------- DataFrame
def split_signed_layers(edges: DataFrame) -> DataFrame:
    """T9 (doc/source/multiplex.rst:96-127): split a signed edge table
    into a positive layer (0) and a negated-negative layer (1); optimise
    with layer_weights [1, -1]."""
    pos = edges.where(F.col("weight") > 0).withColumn("layer", F.lit(0))
    neg = (
        edges.where(F.col("weight") < 0)
        .withColumn("weight", -F.col("weight"))
        .withColumn("layer", F.lit(1))
    )
    return pos.unionByName(neg)


def slices_to_layers_df(slices: DataFrame) -> DataFrame:
    """T1/T2 on DataFrames: ``slices`` has (slice:int, src, dst, weight)
    with vertex ids shared across slices; output one edge table with
    composite vertex keys ``(slice, id)`` hashed to longs, a ``layer``
    column per slice, and an interslice layer (layer = -1) coupling
    consecutive slices on the shared id (equi-join, SURVEY.md T1)."""
    vid = lambda s, v: F.xxhash64(F.col(s).cast("long"), F.col(v).cast("long"))
    intra = slices.select(
        F.col("slice").alias("layer"),
        vid("slice", "src").alias("src"),
        vid("slice", "dst").alias("dst"),
        "weight",
    )
    verts = (
        slices.select("slice", F.col("src").alias("id"))
        .unionByName(slices.select("slice", F.col("dst").alias("id")))
        .distinct()
    )
    nxt = verts.select((F.col("slice") - 1).alias("slice"), F.col("id"))
    inter = verts.join(nxt, ["slice", "id"]).select(
        F.lit(-1).alias("layer"),
        F.xxhash64(F.col("slice").cast("long"), F.col("id").cast("long")).alias("src"),
        F.xxhash64((F.col("slice") + 1).cast("long"), F.col("id").cast("long")).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    return intra.unionByName(inter)
