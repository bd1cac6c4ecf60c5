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


def partition_compare(m1: DataFrame, m2: DataFrame) -> DataFrame:
    """Compare two partitions of the same vertex set — the
    ``igraph.compare_communities`` surface the reference's docs lean on
    when users sweep resolutions / methods (leidenalg itself returns bare
    memberships and delegates comparison; see the reference README's
    igraph interop).  Metrics, all in natural log:

    * ``nmi``        — normalised mutual information (Danon et al 2005,
      igraph ``method="nmi"``): ``2·I(X;Y)/(H(X)+H(Y))``; defined as 1.0
      when both partitions carry zero entropy (both trivial).
    * ``vi``         — variation of information (Meilă 2003,
      ``method="vi"``): ``H(X)+H(Y)-2I``.
    * ``rand`` / ``adjusted_rand`` — pair-counting indices (igraph
      ``method="rand"/"adjusted_rand"``); ARI is 1.0 when the expected
      index equals the maximum (e.g. two identical trivial partitions).
    * ``split_join`` — van Dongen 2000 split-join distance
      (``method="split-join"``): ``2N - Σ_i max_j n_ij - Σ_j max_i n_ij``.

    Inputs are ``(id, comm)`` DataFrames over the same ids (inner-joined:
    ids missing from either side are ignored, matching igraph's
    equal-length-vector contract which has no missing slots).

    Scale shape: ONE |V|-row equi-join on id feeds a map-side-combinable
    ``groupBy(c1, c2)`` contingency table; everything downstream runs on
    that table (≤ nnz(C1×C2) rows — communities that co-occur), whose
    marginals are two more tiny aggregates.  One row out; no driver-side
    loops, no per-row Python.
    """
    ct = (
        m1.select("id", F.col("comm").alias("c1"))
        .join(m2.select("id", F.col("comm").alias("c2")), "id")
        .groupBy("c1", "c2")
        .agg(F.count(F.lit(1)).cast("double").alias("nij"))
    )
    return _compare_from_contingency(ct, [])


def _compare_from_contingency(ct: DataFrame, keys: list[str]) -> DataFrame:
    """Agreement metrics from a contingency table ``(keys…, c1, c2,
    nij)`` — one output row per key group (one total row when ``keys``
    is empty).  Shared by :func:`partition_compare` (global) and
    :func:`community_drift` (per consecutive-slice pair)."""
    a = ct.groupBy(*keys, "c1").agg(F.sum("nij").alias("ai"), F.max("nij").alias("mi"))
    b = ct.groupBy(*keys, "c2").agg(F.sum("nij").alias("bj"), F.max("nij").alias("mj"))

    # per-group side aggregates (tiny, broadcastable tables)
    at = a.groupBy(*keys).agg(
        F.sum("ai").alias("N"),
        F.sum(F.col("ai") * (F.col("ai") - 1) / 2.0).alias("sa"),
        F.sum("mi").alias("ma"),
        F.sum(F.col("ai") * F.log("ai")).alias("la"),
    )
    bt = b.groupBy(*keys).agg(
        F.sum(F.col("bj") * (F.col("bj") - 1) / 2.0).alias("sb"),
        F.sum("mj").alias("mb"),
        F.sum(F.col("bj") * F.log("bj")).alias("lb"),
    )
    # Σ n_ij·ln n_ij and Σ C(n_ij, 2) over the contingency table
    cc = ct.groupBy(*keys).agg(
        F.sum(F.col("nij") * F.log("nij")).alias("lc"),
        F.sum(F.col("nij") * (F.col("nij") - 1) / 2.0).alias("sab"),
    )

    if keys:
        row = cc.join(F.broadcast(at), keys).join(F.broadcast(bt), keys)
    else:
        row = cc.crossJoin(F.broadcast(at)).crossJoin(F.broadcast(bt))
    N = F.col("N")
    # H terms via the Σ n·ln n decomposition: H(X) = ln N − (Σ aᵢ ln aᵢ)/N
    h1 = F.log(N) - F.col("la") / N
    h2 = F.log(N) - F.col("lb") / N
    mi = F.col("lc") / N - F.col("la") / N - F.col("lb") / N + F.log(N)
    nmi = F.when(h1 + h2 > 0, 2.0 * mi / (h1 + h2)).otherwise(F.lit(1.0))
    vi = h1 + h2 - 2.0 * mi
    t = N * (N - 1) / 2.0
    rand = F.when(t > 0, (t + 2.0 * F.col("sab") - F.col("sa") - F.col("sb")) / t) \
        .otherwise(F.lit(1.0))
    exp_i = F.col("sa") * F.col("sb") / t
    max_i = (F.col("sa") + F.col("sb")) / 2.0
    ari = F.when(
        t > 0,
        F.when(
            max_i - exp_i > 0, (F.col("sab") - exp_i) / (max_i - exp_i)
        ).otherwise(F.lit(1.0)),
    ).otherwise(F.lit(1.0))
    return row.select(
        *keys,
        N.cast("long").alias("n_vertices"),
        F.round(nmi, 6).alias("nmi"),
        F.round(vi, 6).alias("vi"),
        F.round(rand, 6).alias("rand"),
        F.round(ari, 6).alias("adjusted_rand"),
        (2 * N - F.col("ma") - F.col("mb")).cast("long").alias("split_join"),
    )


def community_drift(memberships: DataFrame, slice_col: str = "slice") -> DataFrame:
    """Community stability across CONSECUTIVE time slices: for every
    pair (s, s+1) in a per-slice membership table ``(slice, id, comm)``
    (the output shape of ``find_partition_temporal_df``), the full
    :func:`partition_compare` metric set computed over the vertices the
    two slices SHARE.  Low NMI / high VI between adjacent slices =
    community churn; ``n_vertices`` is the shared-vertex count the
    comparison is based on (tiny overlaps make the metrics noisy —
    report it, don't hide it).

    Scale shape: ONE id-equi-join of the membership table against
    itself shifted by one slice, one contingency groupBy keyed by the
    pair, then the shared grouped-marginal arithmetic — per-pair cost
    is |shared vertices|, all pairs in one plan (no per-pair driver
    loop).
    """
    m = memberships.select(
        F.col(slice_col).cast("long").alias("s"), "id", "comm"
    )
    a = m.select(F.col("s").alias("slice_from"), "id", F.col("comm").alias("c1"))
    b = m.select((F.col("s") - 1).alias("slice_from"), "id", F.col("comm").alias("c2"))
    ct = (
        a.join(b, ["slice_from", "id"])
        .groupBy("slice_from", "c1", "c2")
        .agg(F.count(F.lit(1)).cast("double").alias("nij"))
    )
    out = _compare_from_contingency(ct, ["slice_from"])
    return out.select(
        "slice_from",
        (F.col("slice_from") + 1).alias("slice_to"),
        "n_vertices", "nmi", "vi", "rand", "adjusted_rand", "split_join",
    )


def partition_quality_report(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """The igraph partition-quality pair the reference's ecosystem
    reports alongside modularity: ``coverage`` = intra-community edge
    fraction (weighted), ``performance`` = fraction of vertex pairs
    correctly classified (intra pairs linked + inter pairs unlinked;
    unweighted simple undirected graph, self-loops ignored).

    One row out: ``(n_vertices, n_edges, coverage, performance)``.

    Scale shape: two |V|-row membership joins decorate each edge, then
    one aggregate; the pair-count terms are pure arithmetic over the
    |C|-row community-size table (Σ C(n_c,2) intra pairs — never an
    all-pairs join).
    """
    m = membership.select("id", "comm")
    simple = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"), "weight")
        .where(F.col("a") != F.col("b"))
    )
    und = simple.groupBy("a", "b").agg(F.sum("weight").alias("w"))
    lab = (
        und.join(m.select(F.col("id").alias("a"), F.col("comm").alias("ca")), "a")
        .join(m.select(F.col("id").alias("b"), F.col("comm").alias("cb")), "b")
    )
    eagg = lab.agg(
        F.count(F.lit(1)).alias("m_edges"),
        F.coalesce(F.sum("w"), F.lit(0.0)).alias("w_tot"),
        F.coalesce(F.sum(F.when(F.col("ca") == F.col("cb"), F.col("w"))), F.lit(0.0)).alias("w_in"),
        F.coalesce(
            F.sum(F.when(F.col("ca") == F.col("cb"), 1).otherwise(0)), F.lit(0)
        ).alias("m_in"),
    )
    sizes = m.groupBy("comm").agg(F.count(F.lit(1)).cast("double").alias("nc"))
    sagg = sizes.agg(
        F.sum("nc").alias("n"),
        F.coalesce(F.sum(F.col("nc") * (F.col("nc") - 1) / 2.0), F.lit(0.0)).alias("p_in"),
    )
    row = eagg.crossJoin(F.broadcast(sagg))
    t = F.col("n") * (F.col("n") - 1) / 2.0
    # correct pairs = linked intra pairs + unlinked inter pairs
    correct = F.col("m_in") + ((t - F.col("p_in")) - (F.col("m_edges") - F.col("m_in")))
    return row.select(
        F.col("n").cast("long").alias("n_vertices"),
        F.col("m_edges").cast("long").alias("n_edges"),
        F.round(
            F.when(F.col("w_tot") > 0, F.col("w_in") / F.col("w_tot")).otherwise(1.0), 6
        ).alias("coverage"),
        F.round(F.when(t > 0, correct / t).otherwise(1.0), 6).alias("performance"),
    )


def mixing_matrix(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """Class-to-class mixing table over the simple undirected graph
    (igraph habit: the contingency table behind
    ``assortativity_nominal``).  Each distinct undirected non-loop edge
    is counted once under its unordered class pair ``(comm_a <=
    comm_b)``.  Returns (comm_a, comm_b, n_edges) — a |C|²-bounded
    (usually tiny) table from two membership joins + one hash agg.
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    lab = und.join(
        membership.select(F.col("id").alias("a"), F.col("comm").alias("ca")), "a"
    ).join(membership.select(F.col("id").alias("b"), F.col("comm").alias("cb")), "b")
    return (
        lab.groupBy(
            F.least("ca", "cb").alias("comm_a"), F.greatest("ca", "cb").alias("comm_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    )


def assortativity_nominal(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """Nominal (categorical) assortativity coefficient (Newman 2003,
    igraph ``assortativity_nominal``): r = (Σ_i e_ii − Σ_i a_i²) /
    (1 − Σ_i a_i²) over the symmetrised simple graph, where e_ij is the
    fraction of directed edge endpoints from class i to class j and
    a_i the marginal.  1 = perfectly assortative, 0 = random mixing,
    negative = disassortative (bipartite-like).  Returns one row
    (assortativity — NULL when Σ a_i² = 1, i.e. a single class).

    Scale: two membership joins + two tiny aggregates over the |C|-row
    mixing table; nothing quadratic.
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    lab = sym.join(
        membership.select(F.col("id").alias("a"), F.col("comm").alias("ca")), "a"
    ).join(membership.select(F.col("id").alias("b"), F.col("comm").alias("cb")), "b")
    # e_ij over directed orientations: marginals a_i = b_i by symmetry
    e = lab.groupBy("ca", "cb").agg(F.count(F.lit(1)).cast("double").alias("w"))
    tot = e.agg(F.sum("w").alias("W"))
    eii = (
        e.where(F.col("ca") == F.col("cb"))
        .agg(F.sum("w").alias("diag"))
        .na.fill({"diag": 0.0})
    )
    marg = e.groupBy("ca").agg(F.sum("w").alias("ai"))
    sum_ai2 = marg.crossJoin(F.broadcast(tot)).agg(
        F.sum((F.col("ai") / F.col("W")) * (F.col("ai") / F.col("W"))).alias("s")
    )
    row = eii.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(sum_ai2))
    return row.select(
        F.round(
            F.when(
                F.col("s") < 1.0,
                (F.col("diag") / F.col("W") - F.col("s")) / (1.0 - F.col("s")),
            ),
            6,
        ).alias("assortativity")
    )


def _modularity_1row(edges_sd: DataFrame, memb: DataFrame):
    """One-row unweighted multigraph modularity: Q = internal/m −
    Σ_c (vol_c/2m)², degrees counted per edge-endpoint (self-loops add
    2), each edge row counted once.  All 1-row scalars ride broadcast
    cross joins."""
    m1 = edges_sd.agg(F.count(F.lit(1)).cast("double").alias("m"))
    lab = (
        edges_sd.join(memb.select(F.col("v").alias("src"), F.col("comm").alias("cs")), "src")
        .join(memb.select(F.col("v").alias("dst"), F.col("comm").alias("cd")), "dst")
    )
    internal = lab.agg(
        F.sum(F.when(F.col("cs") == F.col("cd"), 1.0).otherwise(0.0)).alias("i")
    )
    deg = (
        edges_sd.select(F.col("src").alias("v"))
        .unionByName(edges_sd.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("double").alias("deg"))
    )
    vol2 = (
        deg.join(memb, "v")
        .groupBy("comm")
        .agg(F.sum("deg").alias("vol"))
        .agg(F.sum(F.col("vol") * F.col("vol")).alias("v2"))
    )
    return (
        internal.crossJoin(F.broadcast(m1))
        .crossJoin(F.broadcast(vol2))
        .select(
            F.round(
                F.col("i") / F.col("m") - F.col("v2") / (4.0 * F.col("m") * F.col("m")), 6
            ).alias("q")
        )
    )


def modularity_null_test(
    spark,
    edges: DataFrame,
    membership: DataFrame,
    seeds=(1, 2, 3),
) -> DataFrame:
    """Modularity significance against the configuration-model null —
    the test Newman–Girvan modularity is implicitly calibrated to (its
    null term IS the configuration model's expectation), and the
    empirical cousin of the reference's analytic Significance quality
    (`src/SignificanceVertexPartition.py`): rewire the graph
    degree-preservingly (md5-deterministic, one
    :func:`~leidenalg_spark.sources.generators.configuration_model` per
    seed), score the SAME membership on each null, and report
    ``z = (Q_obs − mean(Q_null)) / std_pop(Q_null)``.  Returns one row
    (q_obs, null_mean, null_std, z); z is NULL when the null spread is
    0.  ``membership`` has columns (id, comm); ids are compared as
    strings (the rewire operator's vertex key space).

    Scale: each null is one rewire (bucketed rank, no global sort) plus
    the modularity plan (two membership joins + hash aggregates);
    ``len(seeds)`` passes total, embarrassingly parallel across seeds
    on a real cluster.
    """
    from leidenalg_spark.sources.generators import configuration_model

    memb = membership.select(F.col("id").cast("string").alias("v"), "comm")
    und = (
        edges.select(
            F.least(F.col("src").cast("string"), F.col("dst").cast("string")).alias("src"),
            F.greatest(F.col("src").cast("string"), F.col("dst").cast("string")).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    q_obs = _modularity_1row(und, memb).select(F.col("q").alias("q_obs"))
    nulls = None
    for s in seeds:
        rew = configuration_model(edges, seed=s).select("src", "dst")
        qn = _modularity_1row(rew, memb)
        nulls = qn if nulls is None else nulls.unionByName(qn)
    summary = nulls.agg(
        F.round(F.avg("q"), 6).alias("null_mean"),
        F.round(F.stddev_pop("q"), 6).alias("null_std"),
        F.avg("q").alias("_mu"),
        F.stddev_pop("q").alias("_sd"),
    )
    return (
        q_obs.crossJoin(F.broadcast(summary))
        .select(
            "q_obs",
            "null_mean",
            "null_std",
            F.round(
                F.when(F.col("_sd") > 0, (F.col("q_obs") - F.col("_mu")) / F.col("_sd")),
                6,
            ).alias("z"),
        )
    )


def leading_eigenvector_split(
    spark,
    edges: DataFrame,
    max_iter: int = 24,
    norm_every: int = 8,
    ckpt=None,
) -> DataFrame:
    """Newman (2006) leading-eigenvector community bisection — the first
    level of igraph ``community_leading_eigenvector()``: power iteration
    on the SHIFTED modularity matrix ``M = B + cI`` with
    ``B = A − k·kᵀ/2m`` and ``c = 1 + max strength`` (the Gershgorin
    shift makes B's algebraically-largest eigenvalue M's dominant one,
    so plain synchronous power iteration converges without ARPACK —
    the distributed-friendly substitute).  Deterministic ±1 start by
    md5(id) parity.  Returns (id, score, side): score the L2-normalised
    eigenvector estimate (1e-6), side = its sign (+1/−1) — the split.

    Scale: per iteration ONE PageRank-shaped gather join + aggregate
    plus a 1-row (k·x) scalar riding a broadcast cross join; the rank-1
    correction never materialises k·kᵀ.  Unnormalised between barriers
    (scale invariance), L2 at every ``norm_every``-th checkpoint —
    identical to the eigenvector_centrality idiom.
    """
    from leidenalg_spark.operators.checkpoint import CheckpointManager

    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    w = F.col("weight").cast("double") if "weight" in edges.columns else F.lit(1.0)
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"), w.alias("w"))
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )
    sym = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")).persist()
    k = sym.groupBy(F.col("a").alias("id")).agg(F.sum("w").alias("k")).persist()
    consts = k.agg(
        F.sum("k").alias("two_m"), (F.lit(1.0) + F.max("k")).alias("c")
    )
    # continuous md5-uniform start in (−0.5, 0.5): a ±1 start is exactly
    # orthogonal to the leading eigenvector with non-negligible
    # probability on symmetric graphs (equal eigenvector entries cancel
    # in pairs — observed on the two-clique fixture); distinct
    # irrational-looking fractions make that a measure-zero event
    u = (
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
        .cast("double") / F.lit(4294967296.0)
    )
    x = k.select("id", "k", (u - 0.5).alias("x"))
    x = ckpt.save(x, "lev_x", 0)
    for t in range(1, max_iter + 1):
        kx = x.agg(F.sum(F.col("k") * F.col("x")).alias("kx"))
        gathered = (
            sym.join(x.select(F.col("id").alias("a"), F.col("x").alias("xa")), "a")
            .groupBy(F.col("b").alias("id"))
            .agg(F.sum(F.col("w") * F.col("xa")).alias("ax"))
        )
        x = (
            x.join(gathered, "id", "left")
            .na.fill({"ax": 0.0})
            .crossJoin(F.broadcast(consts))
            .crossJoin(F.broadcast(kx))
            .select(
                "id",
                "k",
                (
                    F.col("ax")
                    + F.col("c") * F.col("x")
                    - F.col("k") * F.col("kx") / F.col("two_m")
                ).alias("x"),
            )
        )
        # materialise EVERY iteration: the rank-1 term cross-joins two
        # 1-row aggregates per step, and letting even a handful of steps
        # chain un-materialised makes the Catalyst plan (and the kx
        # recomputation) compound superlinearly
        x = ckpt.save(x, "lev_x", t)
        if t % norm_every == 0 or t == max_iter:
            # 9dp rounding at the barrier pins both engines to the same
            # doubles — aggregation-order float drift resets every
            # norm_every steps instead of compounding over max_iter
            nrm = x.agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("n"))
            x = x.crossJoin(F.broadcast(nrm)).select(
                "id", "k", F.round(F.col("x") / F.col("n"), 9).alias("x")
            )
            x = ckpt.save(x, "lev_xn", t)
    out = x.select(
        "id",
        F.round("x", 6).alias("score"),
        F.when(F.col("x") >= 0, 1).otherwise(-1).cast("long").alias("side"),
    )
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    sym.unpersist()
    k.unpersist()
    return out


def community_cartography(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """Guimerà–Amaral functional cartography (Nature 2005): per-vertex
    community roles from two coordinates — the WITHIN-module degree
    z-score ``z = (k_in − μ_comm) / σ_comm`` (how hub-like inside its
    own community) and the PARTICIPATION COEFFICIENT
    ``P = 1 − Σ_c (k_c / k)²`` (how spread its links are across
    communities).  The standard hub/connector taxonomy on top of any
    partition (Leiden output or a fixed labelling).  Returns ``(id,
    comm, k, k_in, z, participation)``; z is 0 where a community has
    zero variance (singleton or degree-regular).

    Scale shape: one symmetrised edge list decorated with both
    endpoint memberships (two id-keyed joins), ONE (vertex, comm)
    hash aggregate for k_c, two grouped rollups (per-vertex k/P and
    per-community μ/σ) and a final broadcast-sized comm-stats join —
    all map-side combinable, no windows, no Python.
    """
    m = membership.select("id", "comm")
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    lab = (
        sym.join(m.select(F.col("id").alias("a"), F.col("comm").alias("ca")), "a")
        .join(m.select(F.col("id").alias("b"), F.col("comm").alias("cb")), "b")
    )
    kc = lab.groupBy(F.col("a").alias("id"), F.col("ca").alias("comm"),
                     F.col("cb").alias("to_comm")).agg(
        F.count(F.lit(1)).cast("double").alias("k_c")
    )
    per_v = kc.groupBy("id", "comm").agg(
        F.sum("k_c").cast("long").alias("k"),
        F.round(1.0 - F.sum(F.col("k_c") * F.col("k_c")) / (F.sum("k_c") * F.sum("k_c")), 6)
        .alias("participation"),
        F.sum(F.when(F.col("to_comm") == F.col("comm"), F.col("k_c")).otherwise(0.0))
        .cast("long")
        .alias("k_in"),
    )
    cstats = per_v.groupBy("comm").agg(
        F.avg("k_in").alias("mu"), F.stddev_pop("k_in").alias("sd")
    )
    return (
        per_v.join(F.broadcast(cstats), "comm")
        .select(
            "id",
            "comm",
            "k",
            "k_in",
            F.round(
                F.when(F.col("sd") > 0, (F.col("k_in") - F.col("mu")) / F.col("sd"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("z"),
            "participation",
        )
    )


def community_merge_gain(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """Modularity gain of merging each ADJACENT community pair — the
    agglomerative post-processing matrix: after any partitioner runs,
    a positive row here means the partition is not merge-optimal (the
    classic CNM move), and the biggest negative rows are the strongest
    separations.  For undirected modularity,

        ΔQ(a,b) = w_ab / W − K_a·K_b / (2·W²)

    (w_ab = inter-community weight, K_c = community strength, W = total
    weight).  Returns (comm_a, comm_b, w_between, dq_modularity) for
    every adjacent pair comm_a < comm_b.

    Scale shape: the T3 coarsening aggregate (edges ⋈ membership ×2 →
    groupBy pair) — rows bounded by adjacent community PAIRS, not
    vertices; strengths ride a broadcast-sized per-community table.
    """
    m_src = membership.select(F.col("id").alias("src"), F.col("comm").alias("ca"))
    m_dst = membership.select(F.col("id").alias("dst"), F.col("comm").alias("cb"))
    tagged = edges.join(m_src, "src").join(m_dst, "dst")
    between = (
        tagged.where(F.col("ca") != F.col("cb"))
        .groupBy(
            F.least("ca", "cb").alias("comm_a"), F.greatest("ca", "cb").alias("comm_b")
        )
        .agg(F.sum("weight").alias("w_between"))
    )
    ends = edges.select(F.col("src").alias("id"), "weight").unionByName(
        edges.select(F.col("dst").alias("id"), "weight")
    )
    k = (
        ends.join(membership, "id")
        .groupBy("comm")
        .agg(F.sum("weight").alias("K"))
    )
    w_tot = edges.agg(F.sum("weight").alias("W"))
    out = (
        between.join(
            F.broadcast(k.select(F.col("comm").alias("comm_a"), F.col("K").alias("ka"))),
            "comm_a",
        )
        .join(
            F.broadcast(k.select(F.col("comm").alias("comm_b"), F.col("K").alias("kb"))),
            "comm_b",
        )
        .crossJoin(F.broadcast(w_tot))
    )
    return out.select(
        "comm_a",
        "comm_b",
        F.round("w_between", 6).alias("w_between"),
        F.round(
            F.col("w_between") / F.col("W")
            - F.col("ka") * F.col("kb") / (2.0 * F.col("W") * F.col("W")),
            6,
        ).alias("dq_modularity"),
    )


def consensus_communities(
    spark,
    edges: DataFrame,
    n_runs: int = 5,
    threshold: float = 0.5,
    method: str = "modularity",
    gamma: float = 1.0,
    seed: int = 0,
    **leiden_kwargs,
):
    """Consensus clustering (Lancichinetti & Fortunato, "Consensus
    clustering in complex networks", Sci. Rep. 2012): run Leiden
    ``n_runs`` times with seeds ``seed..seed+n_runs-1``, score every
    ORIGINAL edge by the fraction of runs that co-assign its endpoints,
    and return the connected components of the edges whose agreement
    ≥ ``threshold`` as the consensus membership.  Stabilises the
    stochastic move order: communities that survive every seed are
    real structure, seed-dependent splits wash out.

    The reference exposes the building blocks (``find_partition`` with
    ``seed=``) and its users hand-roll exactly this loop; here it is
    one call.

    Returns (membership, agreement) where membership = (id, comm) and
    agreement = the per-edge (src, dst, weight, agree) table.

    Scale shape: the full n² co-assignment matrix of the paper is never
    materialised — agreement is scored on the EXISTING edge list only
    (k membership-equality joins, each one broadcast-or-merge id join),
    the standard sparse restriction; the consensus graph is a filter of
    the input, and the final grouping is the log²-round CC kernel, not
    another Leiden sweep over a dense graph.
    """
    from .kernels import connected_components
    from .leiden import leiden

    agree = None
    for r in range(int(n_runs)):
        res = leiden(
            spark, edges, method=method, gamma=gamma, seed=seed + r, **leiden_kwargs
        )
        m = res.membership
        hit = (
            edges.join(m.select(F.col("id").alias("src"), F.col("comm").alias("ca")), "src")
            .join(m.select(F.col("id").alias("dst"), F.col("comm").alias("cb")), "dst")
            .select(
                "src", "dst", "weight",
                (F.col("ca") == F.col("cb")).cast("double").alias(f"h{r}"),
            )
        )
        agree = hit if agree is None else agree.join(
            hit.select("src", "dst", f"h{r}"), ["src", "dst"]
        )
        # truncate the lineage per run: each leiden() already checkpoints,
        # but the accumulating agreement join chain must not nest k plans
        agree = agree.localCheckpoint(eager=True)
    hcols = [F.col(f"h{r}") for r in range(int(n_runs))]
    total = hcols[0]
    for c in hcols[1:]:
        total = total + c
    agreement = agree.select(
        "src", "dst", "weight", F.round(total / F.lit(float(n_runs)), 6).alias("agree")
    )
    kept = agreement.where(F.col("agree") >= float(threshold)).select("src", "dst")
    cc = connected_components(spark, kept)
    # vertices isolated by the threshold keep singleton communities (their
    # own id), matching the CC kernel's min-id labelling convention
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    membership = (
        verts.join(cc.withColumnRenamed("component", "comm"), "id", "left")
        .select("id", F.coalesce("comm", "id").alias("comm"))
    )
    return membership, agreement


def community_conductance(
    edges: DataFrame, membership: DataFrame, weight_col: str = "weight"
) -> DataFrame:
    """Per-community cut-quality audit (the Leskovec–Lang–Dasgupta–Mahoney
    "network community profile" statistics, WWW 2008): for every community
    of an undirected weighted graph report

    - ``n_vertices``, ``w_in`` (intra-community edge weight, each edge
      once), ``w_cut`` (weight crossing the boundary), ``volume``
      (= 2·w_in + w_cut, the summed member strength),
    - ``conductance``  φ = w_cut / min(vol, 2W − vol)  — the standard
      cut score every community-detection evaluation reports alongside
      the objective value,
    - ``internal_density``  2·w_in / (n·(n−1)),
    - ``expansion``  w_cut / n,  and  ``cut_ratio``  w_cut / (n·(N−n)).

    Scores ANY membership (Leiden output or a fixed labelling) — the
    structural complement of the scalar quality functions: those say how
    good the partition is, this says WHICH communities are well-separated.
    Extends :func:`community_stats` (which reports edge-count density and
    0-filled degenerate cells) with the NCP trio the sweep literature
    plots — expansion, cut ratio, WEIGHTED internal density — and NULL
    (not 0) for denominator-degenerate cells, so a singleton is
    distinguishable from a perfectly sparse community.
    Denominator-degenerate cells (singleton density, whole-graph
    conductance) are NULL, never ±inf.  Self-loops are ignored: they can
    never be cut, and keeping them out makes volume = 2·w_in + w_cut an
    exact identity.

    Scale shape: two id-keyed membership joins decorate the edge list,
    ONE comm-keyed hash aggregate (map-side combinable) folds both the
    intra and the two boundary contributions per edge — no per-community
    subgraphs, no windows; the 1-row totals attach via broadcast cross
    join.  Output is |communities| rows.
    """
    m = membership.select("id", "comm")
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst", F.col(weight_col).alias("w"))
        .join(m.select(F.col("id").alias("src"), F.col("comm").alias("ca")), "src")
        .join(m.select(F.col("id").alias("dst"), F.col("comm").alias("cb")), "dst")
    )
    intra = F.col("ca") == F.col("cb")
    contrib = e.select(
        F.col("ca").alias("comm"),
        F.when(intra, F.col("w")).otherwise(F.lit(0.0)).alias("wi"),
        F.when(~intra, F.col("w")).otherwise(F.lit(0.0)).alias("wc"),
    ).unionByName(
        e.where(~intra).select(
            F.col("cb").alias("comm"), F.lit(0.0).alias("wi"), F.col("w").alias("wc")
        )
    )
    agg = contrib.groupBy("comm").agg(
        F.sum("wi").alias("w_in"), F.sum("wc").alias("w_cut")
    )
    nv = m.groupBy("comm").agg(F.count(F.lit(1)).cast("double").alias("n"))
    # total volume = Σ_v strength(v) = 2·(total edge weight): every edge
    # contributes to both endpoints' strengths, cut or not
    tot = e.agg(
        (F.lit(2.0) * F.coalesce(F.sum("w"), F.lit(0.0))).alias("vol_tot")
    )
    n_tot = m.agg(F.count(F.lit(1)).cast("double").alias("nv_total"))
    base = (
        nv.join(agg, "comm", "left").na.fill({"w_in": 0.0, "w_cut": 0.0})
        .crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(n_tot))
    )
    vol = 2.0 * F.col("w_in") + F.col("w_cut")
    n = F.col("n")
    den_cond = F.least(vol, F.col("vol_tot") - vol)
    r6 = lambda c: F.round(c, 6)  # noqa: E731
    return base.select(
        "comm",
        n.cast("long").alias("n_vertices"),
        r6(F.col("w_in")).alias("w_in"),
        r6(F.col("w_cut")).alias("w_cut"),
        r6(vol).alias("volume"),
        r6(F.when(den_cond > 0, F.col("w_cut") / den_cond)).alias("conductance"),
        r6(F.when(n > 1, 2.0 * F.col("w_in") / (n * (n - 1.0)))).alias("internal_density"),
        r6(F.col("w_cut") / n).alias("expansion"),
        r6(
            F.when(F.col("nv_total") > n, F.col("w_cut") / (n * (F.col("nv_total") - n)))
        ).alias("cut_ratio"),
    )


def mixing_parameter(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """Per-vertex mixing parameter μ (the LFR benchmark's knob, made
    empirical): the weighted fraction of a vertex's incident edges that
    leave its community — μ̄ is THE community-strength scalar every
    benchmark sweep is parameterised by (detectable structure needs
    μ < (N−n_c)/N, in practice ≲ 0.5), and the per-vertex values rank
    boundary vertices.  Self-loops are internal by definition.  Returns
    (id, comm, strength, w_external, mu) — one row per vertex with at
    least one edge; μ is NULL only for zero-strength vertices.

    Scale shape: symmetrise, decorate each edge end with both
    memberships (two id-keyed joins), ONE per-vertex hash aggregate —
    the evaluator plan community_stats already runs, reporting at vertex
    rather than community granularity.
    """
    m = membership.select("id", "comm")
    sym = edges.where(F.col("src") != F.col("dst"))
    sym = sym.unionByName(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    loops = edges.where(F.col("src") == F.col("dst")).select(
        F.col("src").alias("id"), (2.0 * F.col("weight")).alias("w"), F.lit(0.0).alias("w_ext")
    )
    dec = (
        sym.join(m.select(F.col("id").alias("src"), F.col("comm").alias("ca")), "src")
        .join(m.select(F.col("id").alias("dst"), F.col("comm").alias("cb")), "dst")
        .select(
            F.col("src").alias("id"),
            F.col("weight").alias("w"),
            F.when(F.col("ca") != F.col("cb"), F.col("weight")).otherwise(F.lit(0.0)).alias("w_ext"),
        )
        .unionByName(loops)
    )
    agg = dec.groupBy("id").agg(
        F.sum("w").alias("strength"), F.sum("w_ext").alias("w_external")
    )
    return (
        agg.join(m, "id")
        .select(
            "id", "comm",
            F.round("strength", 6).alias("strength"),
            F.round("w_external", 6).alias("w_external"),
            F.round(
                F.when(F.col("strength") > 0, F.col("w_external") / F.col("strength")), 6
            ).alias("mu"),
        )
    )


def sbm_fit(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """Fit the stochastic block model implied by a membership — the
    generative-model companion to :func:`community_stats` and the
    standard "was this partition worth it" readout after Leiden
    (Karrer & Newman 2011; the reference's quality functions score a
    partition, the SBM fit additionally yields the block-to-block rate
    matrix a practitioner inspects).

    Per unordered block pair (a ≤ b) of the simple undirected graph:

    - ``m_ab``     — observed edges between the blocks (within when a=b);
    - ``n_pairs``  — possible pairs (n_a·n_b, or n_a(n_a−1)/2 within);
    - ``p_ab``     — Bernoulli MLE m_ab/n_pairs;
    - ``ll_bern``  — profile log-likelihood contribution
      ``m ln p + (n_pairs−m) ln(1−p)`` (0·ln0 := 0);
    - ``ll_dc``    — degree-corrected contribution ``M ln(M/(κ_a κ_b))``
      with the doubled-diagonal convention (M = 2m within, m between;
      κ = block degree volume).

    Zero-edge block pairs contribute exactly 0 to both likelihoods and
    are not materialised — the output is |observed pairs| rows, not
    |blocks|², which is what makes the fit viable at 10^5+ blocks.
    Self-loops are excluded (the Bernoulli SBM is over distinct pairs).

    Scale shape: two membership joins decorate each edge with both
    endpoint blocks (the community_stats plan), one block-pair hash
    aggregate, plus a |blocks|-row broadcast of sizes/volumes.
    """
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    m_src = membership.select(F.col("id").alias("a"), F.col("comm").alias("ca"))
    m_dst = membership.select(F.col("id").alias("b"), F.col("comm").alias("cb"))
    pairs = (
        e.join(m_src, "a").join(m_dst, "b")
        .select(
            F.least("ca", "cb").alias("comm_a"),
            F.greatest("ca", "cb").alias("comm_b"),
        )
        .groupBy("comm_a", "comm_b")
        .agg(F.count(F.lit(1)).alias("m_ab"))
    )
    # block sizes and degree volumes (κ): one |V|-row aggregate each
    deg = (
        e.select(F.col("a").alias("id"))
        .unionByName(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    blk = (
        membership.join(deg, "id", "left").na.fill({"k": 0})
        .groupBy("comm")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("kappa"))
    )
    ba = blk.select(F.col("comm").alias("comm_a"), F.col("n").alias("n_a"),
                    F.col("kappa").alias("kap_a"))
    bb = blk.select(F.col("comm").alias("comm_b"), F.col("n").alias("n_b"),
                    F.col("kappa").alias("kap_b"))
    j = pairs.join(F.broadcast(ba), "comm_a").join(F.broadcast(bb), "comm_b")
    within = F.col("comm_a") == F.col("comm_b")
    n_pairs = F.when(
        within, (F.col("n_a") * (F.col("n_a") - 1) / 2).cast("double")
    ).otherwise((F.col("n_a") * F.col("n_b")).cast("double"))
    m = F.col("m_ab").cast("double")
    p = m / n_pairs
    term = lambda x, q: F.when(x > 0, x * F.log(q)).otherwise(F.lit(0.0))  # noqa: E731
    ll_bern = term(m, p) + term(n_pairs - m, 1.0 - p)
    m_dc = F.when(within, 2.0 * m).otherwise(m)
    ll_dc = F.when(
        (F.col("kap_a") > 0) & (F.col("kap_b") > 0) & (m > 0),
        m_dc * F.log(m_dc / (F.col("kap_a") * F.col("kap_b"))),
    ).otherwise(F.lit(0.0))
    return j.select(
        "comm_a", "comm_b",
        F.col("m_ab").cast("long").alias("m_ab"),
        n_pairs.cast("long").alias("n_pairs"),
        F.round(p, 6).alias("p_ab"),
        F.round(ll_bern, 6).alias("ll_bern"),
        F.round(ll_dc, 6).alias("ll_dc"),
    )
