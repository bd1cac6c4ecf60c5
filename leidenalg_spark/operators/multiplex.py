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

    Returns (layers, slice_of, local_id): layers = per-slice graphs
    (node_size 1 on members, 0 elsewhere) + one interslice layer with all
    node_size 0; the caller assigns QualitySpecs — CPM gamma=0 for the
    interslice layer, all layer weights 1 (see
    :func:`find_partition_temporal_local`).
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


def _slice_vid(s, v):
    """Composite vertex key (slice, id) → long (deterministic hash)."""
    return F.xxhash64(F.col(s).cast("long"), F.col(v).cast("long"))


def slice_vertex_map(slices: DataFrame) -> DataFrame:
    """(slice, id, vid) for every vertex of every slice — the map that
    projects a layered membership back to per-slice memberships."""
    verts = (
        slices.select("slice", F.col("src").alias("id"))
        .unionByName(slices.select("slice", F.col("dst").alias("id")))
        .distinct()
    )
    return verts.select("slice", "id", _slice_vid("slice", "id").alias("vid"))


def slices_to_layers_df(
    slices: DataFrame,
    interslice_weight: float = 1.0,
    coupling: DataFrame | None = None,
    verts: DataFrame | None = None,
) -> DataFrame:
    """T1/T2 on DataFrames (reference ``slices_to_layers``,
    functions.py:366-528): ``slices`` has (slice:int, src, dst, weight)
    with vertex ids shared across slices; output one edge table with
    composite vertex keys ``(slice, id)`` hashed to longs, a ``layer``
    column per slice, and an interslice layer (``layer`` NULL — a slice
    value can legitimately be any int, including -1, so no in-band
    sentinel).

    ``coupling`` is an arbitrary slice-coupling graph
    (slice_src:int, slice_dst:int, weight:double) — the reference's
    general form, where the coupling graph's vertices are the slices
    themselves (a path for temporal analysis, a star for a reference
    slice, anything else for custom designs).  When None, consecutive
    slices *in sorted order* are path-coupled with ``interslice_weight``
    (the reference ``time_slices_to_layers`` convenience) — sorted-order
    pairing, not ``slice+1`` arithmetic, so non-consecutive slice values
    (years, sparse buckets) still couple.  Each coupling row links
    vertex (slice_src, id) to (slice_dst, id) for every id present in
    BOTH slices — one equi-join on (slice, id), no driver loops.

    ``verts`` (slice, id) may be passed in when the caller already built
    the distinct vertex set (e.g. via :func:`slice_vertex_map`) to avoid
    repeating that shuffle."""
    intra = slices.select(
        F.col("slice").alias("layer"),
        _slice_vid("slice", "src").alias("src"),
        _slice_vid("slice", "dst").alias("dst"),
        "weight",
    )
    if verts is None:
        verts = (
            slices.select("slice", F.col("src").alias("id"))
            .unionByName(slices.select("slice", F.col("dst").alias("id")))
            .distinct()
        )
    else:
        verts = verts.select("slice", "id")
    if coupling is None:
        from pyspark.sql import Window

        # the slice list is tiny — the unpartitioned window is one task
        # over #slices rows, not a data-sized sort
        sl = verts.select("slice").distinct()
        w = Window.orderBy("slice")
        coupling = (
            sl.select("slice", F.lead("slice").over(w).alias("slice_dst"))
            .where(F.col("slice_dst").isNotNull())
            .select(
                F.col("slice").alias("slice_src"),
                "slice_dst",
                F.lit(float(interslice_weight)).alias("weight"),
            )
        )
    va = verts.select(F.col("slice").alias("slice_src"), "id")
    vb = verts.select(F.col("slice").alias("slice_dst"), "id")
    layer_t = intra.schema["layer"].dataType
    inter = (
        va.join(coupling, "slice_src")
        .join(vb, ["slice_dst", "id"])
        .select(
            F.lit(None).cast(layer_t).alias("layer"),
            _slice_vid("slice_src", "id").alias("src"),
            _slice_vid("slice_dst", "id").alias("dst"),
            "weight",
        )
    )
    return intra.unionByName(inter)


def find_partition_temporal_df(
    spark,
    slices: DataFrame,
    method: str = "cpm",
    interslice_weight: float = 1.0,
    gamma: float = 1.0,
    n_iterations: int = 1,
    seed: int = 0,
    local_threshold: int = 500_000,
    max_supersteps: int = 30,
    ckpt=None,
    coupling: DataFrame | None = None,
    finish: bool = True,
):
    """Distributed ``find_partition_temporal`` (O15; reference
    functions.py:178-306): slices → layered edge table
    (:func:`slices_to_layers_df`) → per-slice quality layers
    (node_size 1 on the slice's own members, 0 elsewhere) + a CPM(γ=0)
    interslice coupling layer → one shared membership via
    :func:`leiden_multiplex` → membership projected back per slice.

    Returns ``(membership, result)`` where membership is a DataFrame
    (slice, id, comm) — vertex ``id`` of slice ``slice`` belongs to
    community ``comm`` — and ``result`` is the underlying
    :class:`~leidenalg_spark.operators.leiden.LeidenResult` over the
    layered graph (quality = Σ_k Q_k including the coupling layer).
    """
    # one distinct-vertex shuffle serves the whole façade: the layered
    # edge build, the slice list, the node sizes and the final remap
    vmap = slice_vertex_map(slices).persist()
    counts = vmap.agg(
        F.count(F.lit(1)).alias("n"), F.count_distinct("vid").alias("nd")
    ).first()
    if int(counts["n"]) != int(counts["nd"]):
        # composite keys are xxhash64-truncated to 64 bits; a collision
        # would silently fuse two (slice, id) vertices — fail loudly
        # instead (expected collisions ~ n²/2^65; re-key on collision)
        raise ValueError(
            "xxhash64 composite-key collision among (slice, id) pairs: "
            f"{int(counts['n'])} pairs -> {int(counts['nd'])} distinct vids"
        )
    slice_vals = sorted(
        int(r["slice"]) for r in vmap.select("slice").distinct().collect()
    )
    idx = {s: i for i, s in enumerate(slice_vals)}
    T = len(slice_vals)
    layered = slices_to_layers_df(
        slices, interslice_weight, coupling, verts=vmap.select("slice", "id")
    )
    lmap = F.create_map(*[F.lit(int(x)) for kv in idx.items() for x in kv])
    edges = layered.withColumn(
        "layer",
        F.when(F.col("layer").isNull(), F.lit(T)).otherwise(lmap[F.col("layer")]).cast("int"),
    )
    node_sizes = vmap.select(
        F.col("vid").alias("id"),
        lmap[F.col("slice")].cast("int").alias("layer"),
        F.lit(1.0).alias("node_size"),
    )
    specs = [QualitySpec(method, gamma=gamma) for _ in range(T)] + [QualitySpec("cpm", gamma=0.0)]
    res = leiden_multiplex(
        spark, edges, specs, node_sizes=node_sizes, n_iterations=n_iterations,
        seed=seed, local_threshold=local_threshold, max_supersteps=max_supersteps,
        ckpt=ckpt, finish=finish,
    )
    membership = (
        vmap.join(res.membership.select(F.col("id").alias("vid"), "comm"), "vid")
        .select("slice", "id", "comm")
    )
    # barrier the remap so the vmap cache can be released now
    membership = membership.localCheckpoint(eager=True)
    vmap.unpersist()
    return membership, res


def find_partition_bipartite_df(
    spark,
    edges: DataFrame,
    types: DataFrame,
    resolution_parameter_01: float,
    resolution_parameter_0: float = 0.0,
    resolution_parameter_1: float = 0.0,
    degree_as_node_size: bool = False,
    n_iterations: int = 1,
    seed: int = 0,
    local_threshold: int = 500_000,
    max_supersteps: int = 30,
    ckpt=None,
    finish: bool = True,
):
    """Distributed ``CPMVertexPartition.Bipartite`` (T8 at scale; reference
    ``VertexPartition.py:950-1105``): the bipartite CPM objective

        Q = Σ_c [e_c − γ01·2·n0_c·n1_c − γ0·n0_c² − γ1·n1_c²]

    decomposes into three CPM layers over one shared membership with layer
    weights ``[1, −1, −1]`` — the real graph at γ01, plus two edgeless
    node-size-mask layers (type-0 resp. type-1 vertices) at
    ``γ01 − γ0`` / ``γ01 − γ1`` — exactly the construction of
    :func:`cpm_bipartite_layers`, here as DataFrames so the whole thing
    runs through :func:`leiden_multiplex`'s superstep engine.  The two
    penalty layers contribute no edges and no gather traffic; their
    node-size masks ride the per-vertex layer arrays for free.

    ``edges`` = (src, dst, weight) undirected; ``types`` = (id, type) with
    exactly two distinct type values (any orderable type).  Vertices absent
    from ``types`` get a zero mask in both penalty layers.
    """
    tv = [r["type"] for r in types.select("type").distinct().orderBy("type").collect()]
    if len(tv) != 2:
        raise ValueError(f"exactly two types required, got {len(tv)}")

    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .unionByName(types.select("id"))
        .distinct()
    )
    if degree_as_node_size:
        # unweighted endpoint count (self-loops twice), as in
        # LocalGraph.degree_counts / the reference's degree node sizes
        ends = edges.select(F.col("src").alias("id")).unionByName(
            edges.select(F.col("dst").alias("id"))
        )
        deg = ends.groupBy("id").agg(F.count(F.lit(1)).cast("double").alias("ns"))
        vsz = verts.join(deg, "id", "left").na.fill({"ns": 0.0})
    else:
        vsz = verts.withColumn("ns", F.lit(1.0))

    typed = vsz.join(types, "id", "left")
    # eqNullSafe: a NULL type value is a REAL class (the local twin's
    # numpy comparison treats None the same way) — plain == would never
    # match it and silently zero that class's penalty mass
    node_sizes = (
        vsz.select("id", F.lit(0).alias("layer"), F.col("ns").alias("node_size"))
        .unionByName(
            typed.where(F.col("type").eqNullSafe(F.lit(tv[0]))).select(
                "id", F.lit(1).alias("layer"), F.col("ns").alias("node_size")
            )
        )
        .unionByName(
            typed.where(F.col("type").eqNullSafe(F.lit(tv[1]))).select(
                "id", F.lit(2).alias("layer"), F.col("ns").alias("node_size")
            )
        )
    )
    g01 = float(resolution_parameter_01)
    specs = [
        QualitySpec("cpm", gamma=g01),
        QualitySpec("cpm", gamma=g01 - float(resolution_parameter_0)),
        QualitySpec("cpm", gamma=g01 - float(resolution_parameter_1)),
    ]
    edges3 = edges.select("src", "dst", "weight", F.lit(0).alias("layer"))
    return leiden_multiplex(
        spark, edges3, specs, layer_weights=[1.0, -1.0, -1.0],
        node_sizes=node_sizes, n_iterations=n_iterations, seed=seed,
        local_threshold=local_threshold, max_supersteps=max_supersteps,
        ckpt=ckpt, finish=finish,
    )


# ------------------------------------------- distributed multiplex Leiden
def _to_layer_array(map_col, L, fill):
    """map<int,double> → dense array[0..L-1] with ``fill`` for absent layers."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(L - 1)),
        lambda i: F.coalesce(F.element_at(map_col, i.cast("int")), F.lit(float(fill))),
    )


def _entries(key_col, val_col):
    return F.map_from_entries(F.collect_list(F.struct(F.col(key_col).cast("int"), F.col(val_col))))


def quality_multiplex(edges, membership, specs, layer_weights=None, node_sizes=None, directed=False):
    """Σ_k λ_k Q_k over one shared membership (reference Optimiser.py:389-399).

    Single stats pass (the module contract): ALL per-(layer, comm)
    aggregates come from one ``groupBy(layer, comm)`` over the layered
    edge table, the per-layer scalars (W_k, n_k) from one tiny
    ``groupBy(layer)``, and every layer's quality formula is evaluated in
    ONE combined Spark aggregation — O(1) jobs total instead of O(L)
    per-layer evaluations.  A vertex absent from a layer's ``node_sizes``
    has size 0 there (multiplex convention, same as the local solve).
    """
    from ..functions.quality import _kl, _pairs

    L = len(specs)
    lw = [float(x) for x in (layer_weights or [1.0] * L)]
    spark = edges.sparkSession

    m_src = membership.select(F.col("id").alias("src"), F.col("comm").alias("c_src"))
    m_dst = membership.select(F.col("id").alias("dst"), F.col("comm").alias("c_dst"))
    e = edges.join(m_src, "src").join(m_dst, "dst")
    internal = (
        e.where(F.col("c_src") == F.col("c_dst"))
        .groupBy("layer", F.col("c_src").alias("comm"))
        .agg(F.sum("weight").alias("w_in"))
    )
    if directed:
        ko = e.groupBy("layer", F.col("c_src").alias("comm")).agg(F.sum("weight").alias("k_out"))
        ki = e.groupBy("layer", F.col("c_dst").alias("comm")).agg(F.sum("weight").alias("k_in"))
        K = ko.join(ki, ["layer", "comm"], "outer")
    else:
        # both endpoints (self-loops therefore count twice — the
        # vertex_strengths convention)
        ends = e.select("layer", F.col("c_src").alias("comm"), "weight").unionByName(
            e.select("layer", F.col("c_dst").alias("comm"), "weight")
        )
        K = ends.groupBy("layer", "comm").agg(F.sum("weight").alias("k_out")).withColumn(
            "k_in", F.col("k_out")
        )
    if node_sizes is not None:
        nsz = (
            membership.join(node_sizes, "id")
            .groupBy("layer", "comm")
            .agg(F.sum("node_size").alias("n_size"))
        )
        n_tots = {
            int(r["layer"]): float(r["n"] or 0.0)
            for r in node_sizes.groupBy("layer").agg(F.sum("node_size").alias("n")).collect()
        }
    else:
        csize = membership.groupBy("comm").agg(F.count(F.lit(1)).cast("double").alias("n_size"))
        layers_df = spark.range(L).select(F.col("id").cast("int").alias("layer"))
        nsz = csize.crossJoin(layers_df).select("layer", "comm", "n_size")
        n_v = float(membership.count())
        n_tots = {k: n_v for k in range(L)}
    stats = (
        nsz.join(K, ["layer", "comm"], "outer")
        .join(internal, ["layer", "comm"], "outer")
        .na.fill({"w_in": 0.0, "k_out": 0.0, "k_in": 0.0, "n_size": 0.0})
    )
    Wk = {
        int(r["layer"]): float(r["W"] or 0.0)
        for r in edges.groupBy("layer").agg(F.sum("weight").alias("W")).collect()
    }

    w, ko_c, ki_c, n = F.col("w_in"), F.col("k_out"), F.col("k_in"), F.col("n_size")
    lcol = F.col("layer")
    contrib = F.lit(0.0)
    aggs = []
    surprise = []  # (k, lam, W, pairs_tot, sw_alias, sp_alias)
    for k, spec in enumerate(specs):
        W = Wk.get(k, 0.0)
        nt = n_tots.get(k, 0.0)
        g, lam, m, csl = spec.gamma, lw[k], spec.method, spec.correct_self_loops
        pairs_c = _pairs(n, directed, csl)
        pairs_tot = (nt * nt / 2.0 if csl else nt * (nt - 1.0) / 2.0) * (2.0 if directed else 1.0)
        if m == "modularity":
            c = (
                (w / W - (ko_c * ki_c) / (W * W) if directed else w / W - (ko_c * ko_c) / (4.0 * W * W))
                if W > 0 else F.lit(0.0)
            )
        elif m == "rbconfiguration":
            c = (
                (w - g * (ko_c * ki_c) / W if directed else w - g * (ko_c * ko_c) / (4.0 * W))
                if W > 0 else w
            )
        elif m == "rber":
            p = W / pairs_tot if pairs_tot > 0 else 0.0
            c = w - g * p * pairs_c
        elif m == "cpm":
            c = w - g * pairs_c
        elif m == "significance":
            p = W / pairs_tot if pairs_tot > 0 else 0.0
            dens = F.when(pairs_c > 0, F.least(w / pairs_c, F.lit(1.0))).otherwise(F.lit(0.0))
            c = F.when(pairs_c > 0, pairs_c * _kl(dens, F.lit(p))).otherwise(F.lit(0.0))
        elif m == "surprise":
            sw, sp = f"sw_{k}", f"sp_{k}"
            aggs.append(F.coalesce(F.sum(F.when(lcol == k, w)), F.lit(0.0)).alias(sw))
            aggs.append(F.coalesce(F.sum(F.when(lcol == k, pairs_c)), F.lit(0.0)).alias(sp))
            surprise.append((k, lam, W, pairs_tot, sw, sp))
            continue
        else:
            raise ValueError(m)
        contrib = contrib + F.when(lcol == k, lam * c).otherwise(F.lit(0.0))

    row = stats.agg(F.coalesce(F.sum(contrib), F.lit(0.0)).alias("q_lin"), *aggs).first()
    total = float(row["q_lin"])
    if surprise:
        from ..localcore.quality import kl_div

        for k, lam, W, pairs_tot, sw, sp in surprise:
            if W <= 0:
                continue
            q = min(max(float(row[sw]) / W, 0.0), 1.0)
            qe = (float(row[sp]) / pairs_tot) if pairs_tot > 0 else 0.0
            total += lam * float(W * kl_div(np.float64(q), np.float64(qe)))
    return total


def leiden_multiplex(
    spark,
    edges: DataFrame,
    specs,
    layer_weights=None,
    node_sizes: DataFrame | None = None,
    n_iterations: int = 1,
    seed: int = 0,
    local_threshold: int = 500_000,
    max_supersteps: int = 30,
    ckpt=None,
    finish: bool = True,
    fixed: DataFrame | None = None,
    initial_membership: DataFrame | None = None,
    opts=None,
):
    """Distributed multiplex Leiden (O3/O14 at scale): one shared membership
    over L layers, ``edges`` = (src, dst, weight, layer:int 0..L-1),
    undirected, linear quality family per layer (modularity /
    rbconfiguration / rber / cpm — Significance/Surprise multiplex runs on
    the exact local core).

    Executes the same single-exchange superstep as
    :func:`..leiden._superstep_moves` with per-layer statistics packed into
    dense arrays that ride the joins: the λ-weighted edge-weight term
    collapses to one scalar per edge row *before* aggregation
    (``wpart = weight·λ_k·coef_k``), and the structural ΔQ penalty
    evaluates as a JVM-side ``aggregate`` over the layer arrays —

        dq(v: a→b) = (w_add − w_own)
                     − Σ_k [ kcoef_k·2·kv_k·(kv_k + Kb_k − Ka_k)
                           + ncoef_k·s_k·(s_k + nb_k − na_k) ]

    (the K² and binomial deltas in closed form; self-loop terms cancel in
    the difference).  Refinement = connected components within communities
    on the positive-λ union graph; the coarse level finishes on the exact
    local multiplex core seeded with the parent communities.
    """
    import numpy as np
    import pandas as pd

    from ..localcore import LocalGraph, LocalPartition, OptimiserOpts, QualitySpec, optimise_partition
    from .checkpoint import CheckpointManager
    from .leiden import EPSQ, _refine_by_components

    L = len(specs)
    lw = [float(x) for x in (layer_weights or [1.0] * L)]
    linear = {"modularity", "rbconfiguration", "rber", "cpm"}

    def _local_solve(edges_df, ns_df, initial=None, fixed_ids=None):
        epdf = edges_df.toPandas()
        # single evaluation of the node-size table (its lineage may contain
        # non-reevaluable steps), and explicit int64 so large hashed ids
        # never round-trip through float64 (precision loss above 2^53)
        nspdf = ns_df.toPandas() if ns_df is not None else None
        ids = np.unique(np.concatenate([
            epdf["src"].to_numpy(dtype=np.int64), epdf["dst"].to_numpy(dtype=np.int64),
        ]))
        if nspdf is not None:
            ids = np.unique(np.concatenate([ids, nspdf["id"].to_numpy(dtype=np.int64)]))
        idx = {int(v): i for i, v in enumerate(ids)}
        ns_mat = np.ones((L, len(ids)))
        if nspdf is not None:
            # column-wise extraction: iterrows would upcast the row to
            # float64 and corrupt 62-bit hashed ids
            ns_mat = np.zeros((L, len(ids)))
            lay = nspdf["layer"].to_numpy(dtype=np.int64)
            nid = nspdf["id"].to_numpy(dtype=np.int64)
            nsv = nspdf["node_size"].to_numpy(dtype=np.float64)
            for j in range(len(nid)):
                ns_mat[lay[j], idx[int(nid[j])]] = nsv[j]
        layers = []
        for k in range(L):
            sel = epdf[epdf["layer"] == k]
            g = LocalGraph(
                len(ids),
                sel["src"].map(idx).to_numpy(dtype=np.int64),
                sel["dst"].map(idx).to_numpy(dtype=np.int64),
                sel["weight"].to_numpy(dtype=np.float64),
                node_size=ns_mat[k], directed=False,
            )
            layers.append((g, specs[k]))
        if fixed_ids is not None and initial is None:
            # fixed vertices must keep their (singleton) labels — give the
            # solver an explicit initial so labels can be unmapped after
            initial = {int(v): int(v) for v in ids}
        init, uniq = None, None
        if initial is not None:
            # vertices absent from a partial seed keep their own label
            labels = np.array([initial.get(int(v), int(v)) for v in ids], dtype=np.int64)
            uniq, init = np.unique(labels, return_inverse=True)
            init = init.astype(np.int64)
        P = LocalPartition(layers, layer_weights=lw, membership=init)
        mask = None
        if fixed_ids is not None:
            fs = set(int(x) for x in fixed_ids)
            mask = np.array([int(v) in fs for v in ids], dtype=bool)
        optimise_partition(
            P, n_iterations=n_iterations, is_membership_fixed=mask,
            opts=opts if opts is not None else OptimiserOpts(seed=seed),
        )
        memb = P.membership
        if mask is not None and uniq is not None:
            # preserved slots map back to their original labels; fresh
            # slots get labels distinct from every original (O11 contract)
            hi = int(uniq.max(initial=0)) + 1
            memb = np.where(memb < len(uniq), uniq[np.clip(memb, 0, len(uniq) - 1)], hi + memb)
        out = pd.DataFrame({"id": ids.astype(np.int64), "comm": memb.astype(np.int64)})
        return spark.createDataFrame(out)

    ckpt = ckpt or CheckpointManager(spark)
    edges = edges.persist()
    ecount = edges.count()
    if ecount <= local_threshold or any(s.method not in linear for s in specs):
        fixed_id_list = (
            [int(r["id"]) for r in fixed.select("id").collect()] if fixed is not None else None
        )
        init = (
            {int(r["id"]): int(r["comm"])
             for r in initial_membership.select("id", "comm").collect()}
            if initial_membership is not None else None
        )
        membership = _local_solve(edges, node_sizes, initial=init, fixed_ids=fixed_id_list)
        q = quality_multiplex(edges, membership, specs, lw, node_sizes)
        edges.unpersist()
        from .leiden import LeidenResult

        return LeidenResult(membership, q, "multiplex", 0.0, supersteps=0, levels=1, metrics=ckpt.metrics)

    # ------------------------------------------------------- level setup
    # data-sized partition count (see leiden.py): tiny graphs skip the
    # per-stage overhead of near-empty tasks
    n_shuffle = min(
        int(spark.conf.get("spark.sql.shuffle.partitions")),
        max(8, ecount // 200_000),
    )
    # per-layer totals
    Wk = {int(r["layer"]): float(r["W"]) for r in edges.groupBy("layer").agg(F.sum("weight").alias("W")).collect()}
    sym = edges.where(F.col("src") != F.col("dst"))
    sym = sym.unionByName(sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight", "layer"))
    # per-layer strengths (long form; static per level)
    vlong = sym.groupBy(F.col("src").alias("id"), "layer").agg(F.sum("weight").alias("k"))
    loops = (
        edges.where(F.col("src") == F.col("dst"))
        .groupBy(F.col("src").alias("id"), "layer")
        .agg((2.0 * F.sum("weight")).alias("lk"))
    )
    vlong = (
        vlong.join(loops, ["id", "layer"], "outer")
        .na.fill({"k": 0.0, "lk": 0.0})
        .select("id", "layer", (F.col("k") + F.col("lk")).alias("k"))
        .persist()
    )
    verts = vlong.select("id").distinct()
    if node_sizes is not None:
        verts = verts.unionByName(node_sizes.select("id")).distinct()
        n_k = {
            int(r["layer"]): float(r["n"])
            for r in node_sizes.groupBy("layer").agg(F.sum("node_size").alias("n")).collect()
        }
        n_count = None
    else:
        n_count = verts.count()
        n_k = {k: float(n_count) for k in range(L)}

    # λ-weighted coefficient arrays (driver-side scalars)
    wcoef, kcoef, ncoef = [], [], []
    for k, spec in enumerate(specs):
        W = Wk.get(k, 0.0)
        m = spec.method
        pairs = n_k.get(k, 0.0) * (n_k.get(k, 0.0) - 1.0) / 2.0
        p_k = (W / pairs) if pairs > 0 else 0.0
        wcoef.append(lw[k] * ((1.0 / W) if (m == "modularity" and W > 0) else (0.0 if m == "modularity" else 1.0)))
        kcoef.append(
            lw[k] * ((1.0 / (4.0 * W * W)) if (m == "modularity" and W > 0)
                     else (spec.gamma / (4.0 * W) if (m == "rbconfiguration" and W > 0) else 0.0))
        )
        ncoef.append(lw[k] * (spec.gamma if m == "cpm" else (spec.gamma * p_k if m == "rber" else 0.0)))
    wc_arr = F.array(*[F.lit(float(x)) for x in wcoef])
    kc_arr = [float(x) for x in kcoef]
    nc_arr = [float(x) for x in ncoef]

    # edge cache: only (src, dst, wpart) — the λ-weighted weight term
    edges_w = (
        sym.withColumn("wpart", F.col("weight") * F.element_at(wc_arr, F.col("layer").cast("int") + 1))
        .groupBy("src", "dst").agg(F.sum("wpart").alias("wpart"))
        .repartition(n_shuffle, "dst").sortWithinPartitions("dst").persist()
    )
    edges_w.count()

    # static per-vertex arrays
    karr = vlong.groupBy("id").agg(_entries("layer", "k").alias("km")).select(
        "id", _to_layer_array(F.col("km"), L, 0.0).alias("kv")
    )
    if node_sizes is not None:
        nsarr = node_sizes.groupBy("id").agg(_entries("layer", "node_size").alias("nm")).select(
            "id", _to_layer_array(F.col("nm"), L, 0.0).alias("ns")
        )
        varr = verts.join(karr, "id", "left").join(nsarr, "id", "left")
        varr = varr.withColumn("kv", F.coalesce("kv", F.array_repeat(F.lit(0.0), L)))
        varr = varr.withColumn("ns", F.coalesce("ns", F.array_repeat(F.lit(0.0), L)))
    else:
        varr = verts.join(karr, "id", "left").select(
            "id",
            F.coalesce("kv", F.array_repeat(F.lit(0.0), L)).alias("kv"),
            F.array_repeat(F.lit(1.0), L).alias("ns"),
        )
    varr = varr.repartition(n_shuffle, "id").sortWithinPartitions("id").persist()

    kc_lit = F.array(*[F.lit(x) for x in kc_arr])
    nc_lit = F.array(*[F.lit(x) for x in nc_arr])

    def _comm_arrays(memb):
        """Per-community λ-weighted stats arrays (comm, Ka[], na[]) plus,
        for RAND_COMM only, the member-vertex count ``cnt`` (its sampling
        weight — reference Optimiser.py:104-106)."""
        need_cnt = _mode == RAND_COMM
        ca = memb.join(vlong, "id").groupBy("comm", "layer").agg(F.sum("k").alias("Ka"))
        if node_sizes is not None:
            nlong = memb.join(node_sizes, "id")
            na = nlong.groupBy("comm", "layer").agg(F.sum("node_size").alias("na"))
            cl = ca.join(na, ["comm", "layer"], "outer").na.fill({"Ka": 0.0, "na": 0.0})
            out = cl.groupBy("comm").agg(
                _entries("layer", "Ka").alias("kam"), _entries("layer", "na").alias("nam")
            ).select(
                "comm",
                _to_layer_array(F.col("kam"), L, 0.0).alias("Ka"),
                _to_layer_array(F.col("nam"), L, 0.0).alias("na"),
            )
            if need_cnt:
                ccnt = memb.groupBy("comm").agg(
                    F.count(F.lit(1)).cast("double").alias("cnt")
                )
                out = out.join(ccnt, "comm")
            return out
        csize = memb.groupBy("comm").agg(F.count(F.lit(1)).cast("double").alias("sz"))
        out = ca.groupBy("comm").agg(_entries("layer", "Ka").alias("kam")).select(
            "comm", _to_layer_array(F.col("kam"), L, 0.0).alias("Ka")
        ).join(csize, "comm").withColumn("na", F.array_repeat(F.col("sz"), L))
        if need_cnt:
            out = out.withColumn("cnt", F.col("sz"))
        return out.drop("sz")

    def _guard_q(memb, carr_df):
        """Realised λ-weighted quality of ``memb`` in the effective
        objective the supersteps optimise, up to membership-independent
        constants (self-loop mass), which cancel in comparisons:
        ``Σ_intra wpart − Σ_c Σ_k (kcoef·Ka² + ncoef·binom(na))`` — the
        same closed forms whose differences drive the per-move ΔQ."""
        pen_expr = F.aggregate(
            F.sequence(F.lit(1), F.lit(L)), F.lit(0.0),
            lambda acc, i: acc
            + F.element_at(kc_lit, i) * F.element_at(F.col("Ka"), i) * F.element_at(F.col("Ka"), i)
            + F.element_at(nc_lit, i) * F.element_at(F.col("na"), i)
            * (F.element_at(F.col("na"), i) - 1.0) / 2.0,
        )
        q_pen = carr_df.agg(F.coalesce(F.sum(pen_expr), F.lit(0.0))).first()[0]
        mm_s = memb.select(F.col("id").alias("src"), F.col("comm").alias("cs"))
        mm_d = memb.select(F.col("id").alias("dst"), F.col("comm").alias("cd"))
        own = (
            edges_w.join(mm_d, "dst").join(mm_s, "src")
            .where(F.col("cs") == F.col("cd"))
            .agg(F.coalesce(F.sum("wpart"), F.lit(0.0)))
            .first()[0]
        )
        # edges_w is symmetrised, so each intra edge is counted twice
        return float(own) / 2.0 - float(q_pen)

    if initial_membership is not None:
        # seed partition; vertices absent from a partial seed stay
        # singletons (same contract as single-layer leiden)
        membership = (
            varr.select("id")
            .join(initial_membership.select("id", "comm"), "id", "left")
            .select("id", F.coalesce("comm", F.col("id")).alias("comm"))
        )
    else:
        membership = varr.select("id", F.col("id").alias("comm"))
    from ..localcore.optimiser import ALL_COMMS, ALL_NEIGH_COMMS, RAND_COMM, RAND_NEIGH_COMM

    _mode = getattr(opts, "consider_comms", None) or ALL_NEIGH_COMMS
    _cross = _mode in (ALL_COMMS, RAND_COMM)
    step_idx = 0
    membership = ckpt.save(membership, "mx_membership", step_idx)
    import time as _time

    q_prev = None
    good_membership = membership
    rolled_back = False
    last_moves = 0
    for step in range(1, max_supersteps + 1):
        t0 = _time.time()
        # adaptive stats attach (see leiden.py): merge join while there are
        # many (small) communities, broadcast once the comm table collapses
        # — which is exactly when hub-community join skew would appear
        from .leiden import _BCAST_COMMS

        carr = _comm_arrays(membership).persist()
        n_comm = carr.count()

        # ---- monotone-commit guard (same contract as leiden.py §4.3):
        # batched gated moves can oscillate in a 2-cycle across the
        # direction gate; validate the PREVIOUS commit's realised quality
        # and revert to the last good membership when it regressed
        q_now = _guard_q(membership, carr)
        if q_prev is not None and q_now < q_prev - 1e-9:
            ckpt.log(
                name="leiden_mx_rollback", step=step,
                q_regressed=float(q_now - q_prev),
            )
            step_idx += 1
            membership = ckpt.save(good_membership, "mx_membership", step_idx)
            carr.unpersist()
            rolled_back = True
            break
        q_prev = q_now
        good_membership = membership
        mv = membership.join(varr.hint("merge"), "id")
        if n_comm <= _BCAST_COMMS:
            aug = mv.join(F.broadcast(carr), "comm").persist()
        else:
            aug = (
                mv.join(carr.hint("merge"), "comm")
                .repartition(n_shuffle, "id").sortWithinPartitions("id").persist()
            )
        # O8 candidate modes (same contract as leiden._superstep_moves):
        # cross modes take the whole community table as candidates, with
        # gathered intra weight attached by left join (0 for communities
        # the vertex has no edge into — the negative-weight-layer case
        # ALL_COMMS exists for, reference Optimiser.py:94-97)
        m_dst = aug.select(
            F.col("id").alias("dst"), F.col("comm").alias("cand"),
            *([] if _cross else [F.col("Ka").alias("Kb"), F.col("na").alias("nb")]),
        ).hint("merge")
        gather = (
            edges_w.join(m_dst, "dst")
            .repartition(n_shuffle, "src")
            .groupBy(F.col("src").alias("id"), "cand")
            .agg(
                F.sum("wpart").alias("wadd"),
                *([F.count(F.lit(1)).cast("double").alias("n_nb")]
                  if _mode == RAND_NEIGH_COMM else []),
                *([] if _cross
                  else [F.first("Kb").alias("Kb"), F.first("nb").alias("nb")]),
            )
        )
        from pyspark.sql import Window

        if _cross:
            comms_b = carr.select(
                F.col("comm").alias("cand"), F.col("Ka").alias("Kb"),
                F.col("na").alias("nb"),
                *([F.col("cnt").alias("cntb")] if _mode == RAND_COMM else []),
            )
            if n_comm <= _BCAST_COMMS:
                # broadcast only while |C| is small — at level 0 of a
                # singleton init |C| ≈ |V| and a forced vertex-scale
                # broadcast OOMs; above the gate the cartesian tasks
                # stream the stats side from shuffle blocks instead
                comms_b = F.broadcast(comms_b)
            g = (
                aug.crossJoin(comms_b)
                .join(gather.select("id", "cand", "wadd"), ["id", "cand"], "left")
                .na.fill({"wadd": 0.0})
            )
        else:
            g = gather.join(aug.hint("merge"), "id")
        w_id = Window.partitionBy("id")
        g = g.withColumn(
            "w_va",
            F.coalesce(F.max(F.when(F.col("cand") == F.col("comm"), F.col("wadd"))).over(w_id), F.lit(0.0)),
        )
        kc_lit = F.array(*[F.lit(x) for x in kc_arr])
        nc_lit = F.array(*[F.lit(x) for x in nc_arr])
        idxs = F.sequence(F.lit(1), F.lit(L))

        def _pen(i):
            kv_i = F.element_at(F.col("kv"), i)
            s_i = F.element_at(F.col("ns"), i)
            return (
                F.element_at(kc_lit, i) * 2.0 * kv_i
                * (kv_i + F.element_at(F.col("Kb"), i) - F.element_at(F.col("Ka"), i))
                + F.element_at(nc_lit, i) * s_i
                * (s_i + F.element_at(F.col("nb"), i) - F.element_at(F.col("na"), i))
            )

        pen = F.aggregate(idxs, F.lit(0.0), lambda acc, i: acc + _pen(i))
        cands = g.where(F.col("cand") != F.col("comm")).withColumn(
            "dq", (F.col("wadd") - F.col("w_va")) - pen
        )
        if _mode in (RAND_COMM, RAND_NEIGH_COMM):
            # Efraimidis–Spirakis one-sample weighted pick (see
            # leiden._superstep_moves): the RANDOM candidate is chosen
            # first, the ΔQ > 0 gate applies after — reference semantics
            # RAND_COMM weight: the community's member-vertex COUNT
            # (reference Optimiser.py:104-106, localcore count_c) — not
            # node mass, which diverges whenever node_sizes != 1
            _w = F.col("cntb") if _mode == RAND_COMM else F.col("n_nb")
            _mmod = 2147483647
            _u = (
                F.pmod(
                    F.xxhash64(F.col("id"), F.col("cand"), F.lit(int(step)), F.lit(int(seed))),
                    F.lit(_mmod),
                ).cast("double")
                + 0.5
            ) / float(_mmod)
            _order = F.struct(
                (F.log(_u) / F.greatest(_w, F.lit(1e-300))).alias("dq"),
                (-F.col("cand")).alias("tie"),
            )
        else:
            _order = F.struct(F.col("dq"), (-F.col("cand")).alias("tie"))
        winners = (
            cands.groupBy("id")
            .agg(
                F.max_by(F.struct(F.col("cand"), F.col("dq")), _order).alias("best"),
                F.first("comm").alias("comm"),
            )
            .where(F.col("best.dq") > EPSQ)
            .select("id", "comm", F.col("best.cand").alias("new_comm"))
            .withColumn(
                "gated",
                F.when(F.lit(step % 2 == 0), F.col("new_comm") > F.col("comm")).otherwise(
                    F.col("new_comm") < F.col("comm")
                ),
            )
        )
        if fixed is not None:
            # O11/O14: fixed vertices never move in the distributed phase
            winners = winners.join(F.broadcast(fixed.select("id")), "id", "left_anti")
        winners = winners.persist()
        new_membership = membership.join(
            winners.where("gated").select("id", "new_comm"), "id", "left"
        ).select("id", F.coalesce("new_comm", "comm").alias("comm"))
        step_idx += 1
        membership = ckpt.save(new_membership, "mx_membership", step_idx)
        counts = winners.agg(
            F.count(F.lit(1)).alias("improving"),
            F.count(F.when(F.col("gated"), 1)).alias("moves"),
        ).first()
        winners.unpersist()
        aug.unpersist()
        carr.unpersist()
        ckpt.log(
            name="leiden_mx_superstep", step=step, moves=int(counts["moves"]),
            improving=int(counts["improving"]), secs=round(_time.time() - t0, 4),
            edges_per_sec=round(ecount / max(_time.time() - t0, 1e-9), 1),
        )
        last_moves = int(counts["moves"])
        if counts["improving"] == 0:
            break

    if not rolled_back and last_moves > 0:
        # the loop's final commit was never guard-validated (the in-loop
        # check always scores the PREVIOUS commit) — validate it now so the
        # returned membership is monotone even when max_supersteps ran out
        carr = _comm_arrays(membership).persist()
        q_last = _guard_q(membership, carr)
        carr.unpersist()
        if q_prev is not None and q_last < q_prev - 1e-9:
            ckpt.log(name="leiden_mx_rollback", step=step_idx, q_regressed=float(q_last - q_prev))
            step_idx += 1
            membership = ckpt.save(good_membership, "mx_membership", step_idx)

    if finish:
        pos_layers = [k for k in range(L) if lw[k] > 0]
        intra_src = edges.where(F.col("layer").isin(pos_layers)).select("src", "dst", "weight")
        refined, intra_cache = _refine_by_components(spark, intra_src, membership, ckpt)
        refined = refined.persist()
        r_src = refined.select(F.col("id").alias("src"), F.col("refined").alias("r_src"))
        r_dst = refined.select(F.col("id").alias("dst"), F.col("refined").alias("r_dst"))
        coarse_edges = (
            edges.join(r_src, "src").join(r_dst, "dst")
            .groupBy("layer", "r_src", "r_dst").agg(F.sum("weight").alias("weight"))
            .select(F.col("r_src").alias("src"), F.col("r_dst").alias("dst"), "weight", "layer")
        )
        if node_sizes is not None:
            coarse_ns = (
                refined.join(node_sizes, "id")
                .groupBy(F.col("refined").alias("id"), "layer")
                .agg(F.sum("node_size").alias("node_size"))
            )
        else:
            coarse_ns = (
                refined.groupBy(F.col("refined").alias("id"))
                .agg(F.count(F.lit(1)).cast("double").alias("node_size"))
                .crossJoin(spark.range(L).select(F.col("id").cast("int").alias("layer")).withColumnRenamed("layer", "_l"))
                .select("id", F.col("_l").alias("layer"), "node_size")
            )
        parents = refined.groupBy(F.col("refined")).agg(F.first("comm").alias("parent"))
        n_coarse = coarse_edges.count()
        intra_cache.unpersist()
        if n_coarse <= max(local_threshold, 5_000_000):
            ppdf = parents.toPandas()
            # raw parent labels — _local_solve densifies internally and
            # restores original labels for fixed slots (O11)
            init = dict(zip(
                ppdf["refined"].to_numpy(dtype=np.int64).tolist(),
                ppdf["parent"].to_numpy(dtype=np.int64).tolist(),
            ))
            coarse_fixed = None
            if fixed is not None:
                coarse_fixed = [
                    int(r["refined"])
                    for r in refined.join(fixed.select("id"), "id")
                    .select("refined").distinct().collect()
                ]
            coarse_memb = _local_solve(
                coarse_edges, coarse_ns, initial=init, fixed_ids=coarse_fixed
            )
            membership = (
                refined.join(
                    coarse_memb.select(F.col("id").alias("refined"), F.col("comm").alias("new_comm")),
                    "refined",
                )
                .select("id", F.col("new_comm").alias("comm"))
            )
            step_idx += 1
            membership = ckpt.save(membership, "mx_membership", step_idx)
        refined.unpersist()

    q = quality_multiplex(edges, membership, specs, lw, node_sizes)
    vlong.unpersist()
    varr.unpersist()
    edges_w.unpersist()
    edges.unpersist()
    from .leiden import LeidenResult, renumber_membership

    if finish and fixed is None:
        # T5 dense size-ordered relabel, same contract as leiden()
        membership = renumber_membership(membership)
    return LeidenResult(membership, q, "multiplex", 0.0, supersteps=step_idx, levels=2, metrics=ckpt.metrics)
