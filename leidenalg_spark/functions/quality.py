"""DataFrame quality evaluators for the six methods (SURVEY.md §2.4).

Pure declarative pipeline — two joins + two aggregations, all JVM-side:

    edges ⋈ membership(src) ⋈ membership(dst)  → per-community internal
    weight; strengths ⋈ membership → per-community K/n; one final scalar
    aggregation evaluates the closed-form quality.

Formulas and conventions are identical to
:mod:`leidenalg_spark.localcore.quality` (tested to agree to 1e-9); see
that module's docstring for the reference file:line citations.

At 100 TB: membership and edges are both partitioned by vertex id, so the
two membership joins co-shuffle once each; the per-community aggregate is
associative (partial aggregation server-side); the final reduce is a
scalar.  No Python touches row data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METHODS = ("modularity", "rbconfiguration", "rber", "cpm", "significance", "surprise")


def _pairs(n, directed, correct_self_loops):
    p = n * n / 2.0 if correct_self_loops else n * (n - F.lit(1.0)) / 2.0
    return p * 2.0 if directed else p


def _xlogy(x, y):
    return F.when(x == 0, F.lit(0.0)).otherwise(x * F.log(y))


def _kl(x, y):
    # reference C++ KL semantics: each term only on its valid domain,
    # 0 otherwise.  Guarding both factors matters in SQL: log of a
    # non-positive value is NULL, and F.sum silently drops NULL rows —
    # an unguarded y>=1 (weighted graphs with p>=1) would silently
    # exclude whole communities from the quality sum.
    t1 = F.when((x > 0) & (y > 0), x * F.log(x / y)).otherwise(F.lit(0.0))
    t2 = F.when(
        (x < 1) & (y < 1), (1.0 - x) * F.log((1.0 - x) / (1.0 - y))
    ).otherwise(F.lit(0.0))
    return t1 + t2


def vertex_strengths(edges: DataFrame, directed: bool = False) -> DataFrame:
    """Per-vertex strength table (undirected loops count twice)."""
    if directed:
        out = edges.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("k_out"))
        inn = edges.groupBy(F.col("dst").alias("id")).agg(F.sum("weight").alias("k_in"))
        return out.join(inn, "id", "full").na.fill(0.0)
    ends = edges.select(F.col("src").alias("id"), "weight").unionByName(
        edges.select(F.col("dst").alias("id"), "weight")
    )
    k = ends.groupBy("id").agg(F.sum("weight").alias("k_out"))
    return k.withColumn("k_in", F.col("k_out"))


def community_stats(
    edges: DataFrame,
    membership: DataFrame,
    directed: bool = False,
    node_sizes: DataFrame | None = None,
) -> DataFrame:
    """Per-community aggregates: (comm, w_in, k_out, k_in, n_size).

    ``membership`` must cover every vertex (id, comm); ``node_sizes``
    optional (id, node_size), default 1.0 per vertex.
    """
    m_src = membership.select(F.col("id").alias("src"), F.col("comm").alias("comm_src"))
    m_dst = membership.select(F.col("id").alias("dst"), F.col("comm").alias("comm_dst"))
    internal = (
        edges.join(m_src, "src")
        .join(m_dst, "dst")
        .where(F.col("comm_src") == F.col("comm_dst"))
        .groupBy(F.col("comm_src").alias("comm"))
        .agg(F.sum("weight").alias("w_in"))
    )
    verts = membership
    if node_sizes is not None:
        verts = verts.join(node_sizes, "id", "left").na.fill({"node_size": 1.0})
    else:
        verts = verts.withColumn("node_size", F.lit(1.0))
    verts = verts.join(vertex_strengths(edges, directed), "id", "left").na.fill(
        {"k_out": 0.0, "k_in": 0.0}
    )
    per_comm = verts.groupBy("comm").agg(
        F.sum("k_out").alias("k_out"),
        F.sum("k_in").alias("k_in"),
        F.sum("node_size").alias("n_size"),
        F.count(F.lit(1)).alias("n_vertices"),
    )
    return per_comm.join(internal, "comm", "left").na.fill({"w_in": 0.0})


def quality_onerow(
    edges: DataFrame,
    membership: DataFrame,
    method: str = "modularity",
    gamma: float = 1.0,
    directed: bool = False,
    node_sizes: DataFrame | None = None,
    correct_self_loops: bool = False,
    decimals: int = 6,
) -> DataFrame:
    """Quality as a fully-declarative 1-row DataFrame (column ``value``) —
    one Spark plan, no driver-side scalar collection; used by the oracle
    harness where the DuckDB twin computes the identical SQL."""
    method = method.lower()
    stats = community_stats(edges, membership, directed, node_sizes)
    totals = edges.agg(F.sum("weight").alias("W")).crossJoin(
        (membership if node_sizes is None else membership.join(node_sizes, "id", "left").na.fill({"node_size": 1.0}))
        .agg(
            (F.count(F.lit(1)) if node_sizes is None else F.sum("node_size")).cast("double").alias("n_tot")
        )
    )
    x = stats.crossJoin(F.broadcast(totals))
    w, ko, ki, n = F.col("w_in"), F.col("k_out"), F.col("k_in"), F.col("n_size")
    W, n_tot = F.col("W"), F.col("n_tot")
    pairs_c = _pairs(n, directed, correct_self_loops)
    pairs_tot = _pairs(n_tot, directed, correct_self_loops)
    p = W / pairs_tot
    if method == "modularity":
        contrib = w / W - (ko * ki) / (W * W) if directed else w / W - (ko * ko) / (4.0 * W * W)
    elif method == "rbconfiguration":
        contrib = w - gamma * (ko * ki) / W if directed else w - gamma * (ko * ko) / (4.0 * W)
    elif method == "rber":
        contrib = w - gamma * p * pairs_c
    elif method == "cpm":
        contrib = w - gamma * pairs_c
    elif method == "significance":
        dens = F.least(w / pairs_c, F.lit(1.0))
        contrib = F.when(
            pairs_c > 0, pairs_c * (_kl(dens, p))
        ).otherwise(F.lit(0.0))
    elif method == "surprise":
        q = F.least(F.sum(w) / F.max(W), F.lit(1.0))
        qe = F.sum(pairs_c) / F.max(pairs_tot)
        return x.agg(F.round(F.max(W) * _kl(q, qe), decimals).alias("value"))
    else:
        raise ValueError(method)
    return x.agg(F.round(F.sum(contrib), decimals).alias("value"))


def quality(
    edges: DataFrame,
    membership: DataFrame,
    method: str = "modularity",
    gamma: float = 1.0,
    directed: bool = False,
    node_sizes: DataFrame | None = None,
    correct_self_loops: bool = False,
) -> float:
    """Partition quality as one Spark job (SURVEY.md P3)."""
    method = method.lower()
    if method not in METHODS:
        raise ValueError(f"unknown method {method!r}")
    stats = community_stats(edges, membership, directed, node_sizes)
    tot = edges.agg(F.sum("weight").alias("W")).first()
    W = float(tot["W"] or 0.0)
    nt = membership if node_sizes is None else membership.join(node_sizes, "id", "left").na.fill({"node_size": 1.0})
    if node_sizes is None:
        n_tot = float(membership.count())
    else:
        n_tot = float(nt.agg(F.sum("node_size")).first()[0])

    w, ko, ki, n = F.col("w_in"), F.col("k_out"), F.col("k_in"), F.col("n_size")
    pairs_c = _pairs(n, directed, correct_self_loops)
    pairs_tot = (
        (n_tot * n_tot / 2.0 if correct_self_loops else n_tot * (n_tot - 1.0) / 2.0)
        * (2.0 if directed else 1.0)
    )
    if method == "modularity":
        if W <= 0:
            return 0.0
        contrib = w / W - (ko * ki) / (W * W) if directed else w / W - (ko * ko) / (4.0 * W * W)
        return float(stats.agg(F.sum(contrib)).first()[0] or 0.0)
    if method == "rbconfiguration":
        contrib = w - gamma * (ko * ki) / W if directed else w - gamma * (ko * ko) / (4.0 * W)
        return float(stats.agg(F.sum(contrib)).first()[0] or 0.0)
    if method == "rber":
        p = W / pairs_tot if pairs_tot > 0 else 0.0
        return float(stats.agg(F.sum(w - gamma * p * pairs_c)).first()[0] or 0.0)
    if method == "cpm":
        return float(stats.agg(F.sum(w - gamma * pairs_c)).first()[0] or 0.0)
    if method == "significance":
        p = W / pairs_tot if pairs_tot > 0 else 0.0
        dens = F.when(pairs_c > 0, F.least(w / pairs_c, F.lit(1.0))).otherwise(F.lit(0.0))
        contrib = F.when(pairs_c > 0, pairs_c * _kl(dens, F.lit(p))).otherwise(F.lit(0.0))
        return float(stats.agg(F.sum(contrib)).first()[0] or 0.0)
    if method == "surprise":
        if W <= 0:
            return 0.0
        row = stats.agg(F.sum(w).alias("sw"), F.sum(pairs_c).alias("sp")).first()
        import numpy as np

        from ..localcore.quality import kl_div

        q = min(max(float(row["sw"] or 0.0) / W, 0.0), 1.0)
        q_exp = float(row["sp"] or 0.0) / pairs_tot
        return float(W * kl_div(np.float64(q), np.float64(q_exp)))
    raise AssertionError(method)


def quality_bipartite(
    edges: DataFrame, membership: DataFrame, types: DataFrame
) -> DataFrame:
    """Barber bipartite modularity (Barber 2007, Phys. Rev. E 76) — the
    bipartite-correct sibling of the reference's Modularity (Q1): the
    null model only allows edges BETWEEN the two vertex classes, so

        Q_B = (1/m) Σ_c ( m_c − K_c^0 · K_c^1 / m )

    with m_c = intra-community edge weight, K_c^0 / K_c^1 the summed
    strengths of the community's class-0 / class-1 vertices.  The
    reference approaches bipartite graphs via the CPM 3-layer trick
    (``CPMVertexPartition.Bipartite``, VertexPartition.py:950-1105);
    Q_B is the direct evaluator for a membership over a two-mode graph.

    ``types``: (id, type) with type ∈ {0, 1}.  Returns one row (value).

    Scale shape: identical to the other evaluators — two membership
    equi-joins on vertex id + associative per-community aggregates +
    a 1-row scalar combine; nothing new moves at 10^12 edges.
    """
    m_src = membership.select(F.col("id").alias("src"), F.col("comm").alias("c_src"))
    m_dst = membership.select(F.col("id").alias("dst"), F.col("comm").alias("c_dst"))
    intra = (
        edges.join(m_src, "src").join(m_dst, "dst")
        .where(F.col("c_src") == F.col("c_dst"))
        .groupBy(F.col("c_src").alias("comm"))
        .agg(F.sum("weight").alias("m_c"))
    )
    k = vertex_strengths(edges).select("id", F.col("k_out").alias("k"))
    kc = (
        k.join(membership, "id").join(types, "id")
        .groupBy("comm")
        .agg(
            F.sum(F.when(F.col("type") == 0, F.col("k")).otherwise(0.0)).alias("k0"),
            F.sum(F.when(F.col("type") == 1, F.col("k")).otherwise(0.0)).alias("k1"),
        )
    )
    m_tot = edges.agg(F.sum("weight").alias("m"))
    per = kc.join(intra, "comm", "left").na.fill({"m_c": 0.0}).crossJoin(F.broadcast(m_tot))
    return per.agg(
        F.round(F.sum((F.col("m_c") - F.col("k0") * F.col("k1") / F.col("m")) / F.col("m")), 6).alias("value")
    )


def quality_decomposition(
    edges: DataFrame,
    membership: DataFrame,
    gamma: float = 1.0,
    directed: bool = False,
) -> DataFrame:
    """Per-community quality breakdown — the reference's P4–P7
    administration (`total_weight_in_comm` / `total_weight_from_comm` /
    `total_weight_to_comm`, VertexPartition.py:273-335) surfaced as ONE
    table, plus each community's additive contribution to Modularity and
    CPM(γ).  Summing the term columns reproduces `quality()` exactly —
    the drill-down every "why did Q drop" investigation starts from.

    Returns (comm, n_vertices, n_size, w_in, k_c, term_modularity,
    term_cpm); k_c = community strength K_c (undirected) — directed mode
    uses the Leicht–Newman k_out·k_in null and reports k_c = k_out+k_in.

    Scale shape: exactly :func:`community_stats` (two membership
    equi-joins + associative per-community aggregates) + a broadcast
    1-row total-weight join; the term arithmetic is column math.
    """
    stats = community_stats(edges, membership, directed=directed)
    m_tot = edges.agg(F.sum("weight").alias("W"))
    out = stats.crossJoin(F.broadcast(m_tot))
    pairs = F.col("n_size") * (F.col("n_size") - 1) / 2.0
    if directed:
        # Leicht–Newman: w_in/W − K_out·K_in/W²  (VertexPartition.py:410-417)
        null = F.col("k_out") * F.col("k_in") / (F.col("W") * F.col("W"))
        k_c = F.col("k_out") + F.col("k_in")
    else:
        # K_c²/4W² with K_c = Σ strengths — matches quality_onerow's Q1
        null = (F.col("k_out") * F.col("k_out")) / (4.0 * F.col("W") * F.col("W"))
        k_c = F.col("k_out")
    return out.select(
        "comm",
        F.col("n_vertices").cast("long").alias("n_vertices"),
        F.round("n_size", 6).alias("n_size"),
        F.round("w_in", 6).alias("w_in"),
        F.round(k_c, 6).alias("k_c"),
        F.round(F.col("w_in") / F.col("W") - null, 6).alias("term_modularity"),
        F.round(F.col("w_in") - F.lit(gamma) * pairs, 6).alias("term_cpm"),
    )


def quality_modularity_density(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """Modularity density D (Li et al. 2008) — the resolution-limit-free
    sibling of Q1 the reference family doesn't include:

        D = Σ_c (2·w_in_c − w_out_c) / n_c

    with w_in_c the internal weight, w_out_c the cut weight leaving c,
    and n_c the community size.  Dividing by n_c removes the preference
    for merging small communities that gives plain modularity its
    resolution limit.  Returns one row (value).

    Scale shape: the standard evaluator plan — two membership
    equi-joins + per-community associative aggregates + a scalar sum.
    """
    m_src = membership.select(F.col("id").alias("src"), F.col("comm").alias("ca"))
    m_dst = membership.select(F.col("id").alias("dst"), F.col("comm").alias("cb"))
    tagged = edges.join(m_src, "src").join(m_dst, "dst")
    intra = tagged.where(F.col("ca") == F.col("cb")).groupBy(
        F.col("ca").alias("comm")
    ).agg(F.sum("weight").alias("w_in"))
    cut = (
        tagged.where(F.col("ca") != F.col("cb"))
        .select(F.col("ca").alias("comm"), "weight")
        .unionByName(
            tagged.where(F.col("ca") != F.col("cb")).select(
                F.col("cb").alias("comm"), "weight"
            )
        )
        .groupBy("comm")
        .agg(F.sum("weight").alias("w_out"))
    )
    size = membership.groupBy("comm").agg(F.count(F.lit(1)).alias("n_c"))
    per = (
        size.join(intra, "comm", "left")
        .join(cut, "comm", "left")
        .na.fill({"w_in": 0.0, "w_out": 0.0})
    )
    return per.agg(
        F.round(
            F.sum((2.0 * F.col("w_in") - F.col("w_out")) / F.col("n_c")), 6
        ).alias("value")
    )
