"""Distributed Leiden community detection (SURVEY.md §2.5, §3.1, §4.3).

Architecture — gather-scatter supersteps + hybrid coarse solve:

1. **Distributed local-move supersteps** on the full edge table: one
   join-aggregate gathers, for every vertex, its edge weight towards every
   neighbouring community (reference ``weight_to_comm``, the hot P8
   gather); the closed-form ΔQ of every candidate move is evaluated as
   pure column arithmetic against frozen per-community aggregates; a
   deterministic half (``xxhash64(v, step, seed)`` parity) of the winning
   moves commits per superstep — the standard guard against move/counter-
   move oscillation in batched Louvain/Leiden (SURVEY.md §4.3).
2. **Distributed refinement**: connected components *within* each
   community (γ-connectivity — Leiden's core guarantee: communities are
   internally connected).  The aggregate graph is built over the refined
   partition, seeded with the parent communities (advanced.rst:100-123
   step 5).
3. **Coarse solve**: after one aggregation the graph shrinks
   geometrically; once below ``local_threshold`` edges it is pulled to the
   driver and finished by :mod:`leidenalg_spark.localcore` — the exact
   reference semantics (refinement, empty communities, constraints,
   n_iterations<0) at zero distributed cost.  Small inputs skip straight
   to the local core, reproducing leidenalg behaviour end-to-end.

Every superstep checkpoints membership + metrics (north rule) through
:class:`CheckpointManager`, which also truncates the iterative lineage.

Scale notes: the gather shuffles edges once per superstep on ``dst`` then
``(src, comm)`` — both partial-aggregated; comm_stats is tiny after the
first supersteps (broadcast side of the candidate join); AQE splits the
tool-hub skew.  No per-row Python anywhere: the only Python is the
driver loop and the coarse NumPy solve.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..localcore import LocalGraph, LocalPartition, OptimiserOpts, QualitySpec, optimise_partition
from ..functions.quality import quality as df_quality
from .checkpoint import CheckpointManager

EPSQ = 1e-10
# community-stats tables at or below this row count broadcast (~tens of MB);
# above it they merge-join — see the adaptive attach in the superstep loop
_BCAST_COMMS = 5_000_000


@dataclass
class LeidenResult:
    membership: DataFrame  # (id, comm)
    quality: float
    method: str
    gamma: float
    supersteps: int = 0
    levels: int = 0
    metrics: list = field(default_factory=list)


# ------------------------------------------------------------------ ΔQ SQL
def _pairs_col(n, directed, csl):
    p = n * n / 2.0 if csl else n * (n - F.lit(1.0)) / 2.0
    return p * 2.0 if directed else p


def _contrib(method, gamma, directed, W, p_global, csl, w, ko, ki, n):
    """Per-community contribution — the Spark twin of
    localcore.quality.QualitySpec.comm_contrib (kept in lock-step)."""
    if method == "modularity":
        base = (ko * ki) if directed else (ko * ko) / 4.0
        return w / W - base / (W * W)
    if method == "rbconfiguration":
        base = (ko * ki) if directed else (ko * ko) / 4.0
        return w - gamma * base / W
    if method == "rber":
        return w - gamma * p_global * _pairs_col(n, directed, csl)
    if method == "cpm":
        return w - gamma * _pairs_col(n, directed, csl)
    if method == "significance":
        pairs_c = _pairs_col(n, directed, csl)
        dens = F.least(w / pairs_c, F.lit(1.0))
        term = lambda x, y: F.when(x == 0, 0.0).otherwise(x * F.log(x / y))
        kl = term(dens, F.lit(p_global)) + term(1.0 - dens, F.lit(1.0 - p_global))
        return F.when(pairs_c > 0, pairs_c * kl).otherwise(F.lit(0.0))
    raise ValueError(method)


def _method_eff(spec):
    """Effective (method, gamma) of the distributed move phase.

    Surprise's global-KL objective is not separable per-row against frozen
    totals; the distributed phase uses the RBER(gamma=1) gradient — "join
    groups denser than the global density", the same local argmax direction
    as Surprise — and the coarse finish is exact.
    """
    if spec.method == "surprise":
        return "rber", 1.0
    return spec.method, spec.gamma


def _stat_needs(method_eff, directed):
    """Which per-community aggregates the method's ΔQ actually reads.

    The ``w`` (internal weight) terms cancel in the ΔQ difference for every
    linear method, so only Significance carries them; pruning keeps the
    per-superstep edge shuffle rows narrow.
    """
    if method_eff in ("modularity", "rbconfiguration"):
        return {"K_out", "K_in"} if directed else {"K_out"}
    if method_eff in ("rber", "cpm"):
        return {"n"}
    if method_eff == "significance":
        return {"n", "w"}
    raise ValueError(method_eff)


def _superstep_moves(edges_sym, aug, spec, directed, W, p_global, n_tot, step, seed, n_shuffle):
    """One distributed local-move superstep → winning moves (id, new_comm).

    ΔQ is computed against frozen stats: exact for a single move, a
    (provably convergent in practice) approximation for a committed batch;
    the alternating parity keeps batches conflict-sparse.

    ``aug`` = membership ⋈ vertex stats ⋈ own-community aggregates
    (id, comm, k_out, k_in, loop, node_size, Ka_*/na/wa as the method
    needs) — one hash(id)-partitioned, sorted, cached table, so the whole
    superstep is a single edge-proportional exchange: candidate-community
    stats ride through the gather join (constant per candidate, recovered
    with ``first()``), the vertex side merge-joins co-partitioned, v's
    weight to its *own* community comes from a window over the same
    id-partitioning the arg-max reuses, and no per-superstep broadcast is
    built (a driver-serial cost that caps cluster-size scaling).
    """
    from pyspark.sql import Window

    method_eff, gamma_eff = _method_eff(spec)
    needs = _stat_needs(method_eff, directed)
    zero = F.lit(0.0)
    b_cols = []  # (gather output name, aug source column)
    if "K_out" in needs:
        b_cols.append(("Kb_out", "Ka_out"))
    if "K_in" in needs:
        b_cols.append(("Kb_in", "Ka_in"))
    if "n" in needs:
        b_cols.append(("nb", "na"))
    if "w" in needs:
        b_cols.append(("wb", "wa"))

    # gather join: edges_sym is cached hash(dst)-partitioned and sorted, and
    # m_dst inherits hash(id→dst) partitioning + ordering from the aug
    # cache, so the merge join below is a zero-exchange zipper on both sides
    m_dst = aug.select(
        F.col("id").alias("dst"), F.col("comm").alias("cand"),
        *[F.col(src).alias(dst_name) for dst_name, src in b_cols],
    ).hint("merge")
    joined = edges_sym.join(m_dst, "dst")
    # ONE edge-proportional exchange per superstep: repartition the gathered
    # rows by vertex; hash(src) satisfies the groupBy(src, cand) clustering,
    # and every downstream op (aug join, own-community window, per-vertex
    # arg-max, winner→membership update) reuses the same hash(id) layout
    gather = (
        joined.repartition(n_shuffle, "src")
        .groupBy(F.col("src").alias("id"), "cand")
        .agg(
            F.sum("weight").alias("w_vc"),
            *[F.first(name).alias(name) for name, _ in b_cols],
        )
    )
    g = gather.join(aug.hint("merge"), "id")
    w_id = Window.partitionBy("id")
    g = g.withColumn(
        "w_va", F.coalesce(F.max(F.when(F.col("cand") == F.col("comm"), F.col("w_vc"))).over(w_id), F.lit(0.0))
    )
    x = g.where(F.col("cand") != F.col("comm"))

    present = {"Ka_out": "K_out", "Kb_out": "K_out", "Ka_in": "K_in", "Kb_in": "K_in",
               "na": "n", "nb": "n", "wa": "w", "wb": "w"}

    def col_of(name):
        return F.col(name) if present[name] in needs else zero

    csl = spec.correct_self_loops
    rm = F.col("w_va") + F.col("loop")
    add = F.col("w_vc") + F.col("loop")
    args = dict(directed=directed, W=W, p_global=p_global, csl=csl)
    ka_out, ka_in, na, wa = col_of("Ka_out"), col_of("Ka_in"), col_of("na"), col_of("wa")
    kb_out, kb_in, nb, wb = col_of("Kb_out"), col_of("Kb_in"), col_of("nb"), col_of("wb")
    if not directed:
        # undirected strengths are symmetric; K_in mirrors K_out so the
        # directed formulas stay valid without shipping a second column
        ka_in, kb_in = ka_out, kb_out
    ga_old = _contrib(method_eff, gamma_eff, w=wa, ko=ka_out, ki=ka_in, n=na, **args)
    ga_new = _contrib(
        method_eff, gamma_eff,
        w=wa - rm, ko=ka_out - F.col("k_out"),
        ki=ka_in - F.col("k_in"), n=na - F.col("node_size"), **args,
    )
    gb_old = _contrib(method_eff, gamma_eff, w=wb, ko=kb_out, ki=kb_in, n=nb, **args)
    gb_new = _contrib(
        method_eff, gamma_eff,
        w=wb + add, ko=kb_out + F.col("k_out"),
        ki=kb_in + F.col("k_in"), n=nb + F.col("node_size"), **args,
    )
    dq = (ga_new - ga_old) + (gb_new - gb_old)

    winners = (
        x.withColumn("dq", dq)
        .where(F.col("dq") > EPSQ)
        .groupBy("id")
        .agg(
            F.max_by(F.struct(F.col("cand"), F.col("dq")), F.struct(F.col("dq"), -F.col("cand"))).alias("best"),
            F.first("comm").alias("comm"),
        )
        .select("id", "comm", F.col("best.cand").alias("new_comm"), F.col("best.dq").alias("dq"))
        # direction gate: even steps move only towards larger community
        # ids, odd steps towards smaller — makes simultaneous swap /
        # counter-moves between two communities impossible (a pair of
        # vertices can never trade places in one superstep), unlike a
        # random half-gate which lets same-parity pairs oscillate
        .withColumn(
            "gated",
            F.when(F.lit(step % 2 == 0), F.col("new_comm") > F.col("comm")).otherwise(
                F.col("new_comm") < F.col("comm")
            ),
        )
    )
    return winners


def _superstep_moves_salted(edges_sym, aug, spec, directed, W, p_global, n_tot, step, seed, n_shuffle, k):
    """Skew-proof variant of :func:`_superstep_moves` (hub-vertex salting).

    A tool vertex can have degree ~|conversations| (10^9 at north-rule
    scale); any layout that colocates one vertex's gather rows in one task
    serialises on it.  This path never does:

    - the edge cache is partitioned by ``(dst, salt1=h(src)%k)`` and the
      membership side is replicated k× — the gather zipper spreads a hub's
      in-edges over k tasks;
    - the gathered rows exchange ONCE by ``(src, salt3=h(cand)%k)``;
      grouping by ``(src, salt3, cand)`` equals grouping by ``(src, cand)``
      exactly (salt3 is a function of cand) while a hub's candidate groups
      land on k partitions;
    - the per-vertex arg-max runs two-level: partial per ``(id, salt3)``
      (no exchange), final over ≤k rows per vertex (tiny exchange).

    The arg-max key is the candidate-side ΔQ term only: the source-side
    term — including v's weight to its own community — is constant across
    a vertex's candidates, so it cannot change the arg-max and is applied
    afterwards on the n-row winners table, where the exact dq > 0
    threshold and the direction gate run as in the fast path.  v's static
    stats ride the edge cache; candidate-community aggregates ride the
    gather; v's own-community row is recovered from the same gathered
    table (``cand == comm``) at no extra scan.
    """
    method_eff, gamma_eff = _method_eff(spec)
    needs = _stat_needs(method_eff, directed)
    zero = F.lit(0.0)
    b_cols = []
    if "K_out" in needs:
        b_cols.append(("Kb_out", "Ka_out"))
    if "K_in" in needs:
        b_cols.append(("Kb_in", "Ka_in"))
    if "n" in needs:
        b_cols.append(("nb", "na"))
    if "w" in needs:
        b_cols.append(("wb", "wa"))
    salts = F.array(*[F.lit(i) for i in range(k)])

    # membership side replicated k× to meet the salted edge layout
    m_dst_k = (
        aug.select(
            F.col("id").alias("dst"), F.col("comm").alias("cand"),
            *[F.col(src).alias(name) for name, src in b_cols],
        )
        .withColumn("salt1", F.explode(salts))
        .repartition(n_shuffle, "dst", "salt1")
        .sortWithinPartitions("dst", "salt1")
        .hint("merge")
    )
    joined = edges_sym.join(m_dst_k, ["dst", "salt1"])
    # rider pruning: node_size is constant 1.0 in the distributed level and
    # undirected strengths are symmetric — ship only what ΔQ reads
    statics = ["vk_out", "vloop"] if not directed else ["vk_out", "vk_in", "vloop"]
    gather = (
        joined.withColumn("salt3", F.pmod(F.xxhash64("cand"), F.lit(k)))
        .repartition(n_shuffle, "src", "salt3")
        .groupBy(F.col("src").alias("id"), "salt3", "cand")
        .agg(
            F.sum("weight").alias("w_vc"),
            *[F.first(c).alias(c) for c in statics],
            *[F.first(name).alias(name) for name, _ in b_cols],
        )
    )
    # comm(v) via the k×-replicated membership (co-partitioned on salt3)
    m_src_k = (
        aug.select("id", "comm").withColumn("salt3", F.explode(salts))
        .repartition(n_shuffle, "id", "salt3")
        .sortWithinPartitions("id", "salt3")
        .hint("merge")
    )
    # persisted: the winners branch and the own-community (w_va) branch
    # both read it — without the cache the whole gather would run twice
    g = gather.join(m_src_k, ["id", "salt3"]).persist()
    w_va_tbl = g.where(F.col("cand") == F.col("comm")).select("id", F.col("w_vc").alias("w_va"))
    cands = g.where(F.col("cand") != F.col("comm"))

    present = {"Kb_out": "K_out", "Kb_in": "K_in", "nb": "n", "wb": "w"}

    def bcol(name):
        return F.col(name) if present[name] in needs else zero

    csl = spec.correct_self_loops
    args = dict(directed=directed, W=W, p_global=p_global, csl=csl)
    kb_out, kb_in, nb, wb = bcol("Kb_out"), bcol("Kb_in"), bcol("nb"), bcol("wb")
    if not directed:
        kb_in = kb_out
    add = F.col("w_vc") + F.col("vloop")
    vk_in = F.col("vk_in") if directed else F.col("vk_out")
    gb_old = _contrib(method_eff, gamma_eff, w=wb, ko=kb_out, ki=kb_in, n=nb, **args)
    gb_new = _contrib(
        method_eff, gamma_eff,
        w=wb + add, ko=kb_out + F.col("vk_out"),
        ki=kb_in + vk_in, n=nb + F.lit(1.0), **args,
    )
    scored = cands.withColumn("gb", gb_new - gb_old)

    pick = F.max_by(F.struct(F.col("cand"), F.col("gb")), F.struct(F.col("gb"), -F.col("cand")))
    partial = scored.groupBy("id", "salt3").agg(pick.alias("best"))
    best = (
        partial.select("id", F.col("best.cand").alias("cand"), F.col("best.gb").alias("gb"))
        .groupBy("id")
        .agg(pick.alias("best"))
        .select("id", F.col("best.cand").alias("new_comm"), F.col("best.gb").alias("gb"))
    )

    # n-row winners stage: exact source-side term, threshold, gate
    apresent = {"Ka_out": "K_out", "Ka_in": "K_in", "na": "n", "wa": "w"}

    def acol(name):
        return F.col(name) if apresent[name] in needs else zero

    w = (
        best.join(aug.hint("merge"), "id")
        .join(w_va_tbl, "id", "left")
        .na.fill({"w_va": 0.0})
    )
    ka_out, ka_in, na, wa = acol("Ka_out"), acol("Ka_in"), acol("na"), acol("wa")
    if not directed:
        ka_in = ka_out
    rm = F.col("w_va") + F.col("loop")
    ga_old = _contrib(method_eff, gamma_eff, w=wa, ko=ka_out, ki=ka_in, n=na, **args)
    ga_new = _contrib(
        method_eff, gamma_eff,
        w=wa - rm, ko=ka_out - F.col("k_out"),
        ki=ka_in - F.col("k_in"), n=na - F.col("node_size"), **args,
    )
    winners = (
        w.withColumn("dq", F.col("gb") + (ga_new - ga_old))
        .where(F.col("dq") > EPSQ)
        .select("id", "comm", "new_comm", "dq")
        .withColumn(
            "gated",
            F.when(F.lit(step % 2 == 0), F.col("new_comm") > F.col("comm")).otherwise(
                F.col("new_comm") < F.col("comm")
            ),
        )
    )
    return winners, g


def _refine_by_components(spark, edges, membership, ckpt):
    """Distributed refinement: split every community into its connected
    components (γ-connectivity).  Returns refined membership
    (id, refined_comm:string-free long pair hash) and the parent mapping."""
    from .kernels import connected_components

    m_src = membership.select(F.col("id").alias("src"), F.col("comm").alias("comm_src"))
    m_dst = membership.select(F.col("id").alias("dst"), F.col("comm").alias("comm_dst"))
    intra = (
        edges.join(m_src, "src").join(m_dst, "dst")
        .where(F.col("comm_src") == F.col("comm_dst"))
        .select("src", "dst")
    )
    comp = connected_components(spark, intra.withColumn("weight", F.lit(1.0)), ckpt=ckpt)
    refined = membership.join(comp, "id", "left").select(
        "id", "comm", F.coalesce("component", F.col("id")).alias("component")
    )
    # refined community id: hash of (comm, component) — deterministic
    return refined.select(
        "id",
        "comm",
        F.xxhash64(F.col("comm"), F.col("component")).alias("refined"),
    )


def leiden(
    spark,
    edges: DataFrame,
    method: str = "modularity",
    gamma: float = 1.0,
    n_iterations: int = 2,
    seed: int = 0,
    directed: bool = False,
    local_threshold: int = 500_000,
    max_supersteps: int = 30,
    ckpt: CheckpointManager | None = None,
    correct_self_loops: bool = False,
    opts: OptimiserOpts | None = None,
    resume: bool = False,
    finish: bool = True,
    hub_salt: int = 0,
) -> LeidenResult:
    """Flagship API (reference ``find_partition``, functions.py:21-93) on a
    Spark edge table (src:long, dst:long, weight:double).

    ``hub_salt=k`` (k > 1) switches the move phase to the salted superstep
    (:func:`_superstep_moves_salted`): no single task ever holds one
    vertex's full gather — required when hub degrees (tool vertices) are
    large enough that a per-vertex partition skews a stage.
    """
    ckpt = ckpt or CheckpointManager(spark)
    spec = QualitySpec(method, gamma=gamma, correct_self_loops=correct_self_loops)
    edges = edges.persist()
    ecount = edges.count()

    if ecount <= local_threshold:
        membership = _local_solve_df(spark, edges, spec, n_iterations, seed, directed, opts)
        q = df_quality(edges, membership, method, gamma, directed, correct_self_loops=correct_self_loops)
        edges.unpersist()
        return LeidenResult(membership, q, method, gamma, supersteps=0, levels=1, metrics=ckpt.metrics)

    # ----------------------------------------------------- distributed path
    sym = edges.where(F.col("src") != F.col("dst"))
    edges_sym = sym if directed else sym.unionByName(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    # pre-partition the big side of the per-superstep gather join by its
    # join key: the cached HashPartitioning(dst) is recognised by
    # EnsureRequirements, so each superstep shuffles only the (small)
    # membership side — the edge table moves over the network once per
    # *level*, not once per superstep
    # partition count sized to the data (~200k edges per partition floor):
    # a tiny graph on a big session would otherwise pay per-stage scheduling
    # for near-empty tasks in every superstep; never exceeds the session's
    # configured parallelism
    n_shuffle = min(
        int(spark.conf.get("spark.sql.shuffle.partitions")),
        max(8, ecount // 200_000),
    )

    # static vertex stats: strengths, loops, sizes
    from ..functions.quality import vertex_strengths

    loops = (
        edges.where(F.col("src") == F.col("dst"))
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("weight").alias("loop"))
    )
    vstats = (
        vertex_strengths(edges, directed)
        .join(loops, "id", "left")
        .na.fill({"loop": 0.0})
        .withColumn("node_size", F.lit(1.0))
        .repartition(n_shuffle, "id")  # co-partitioned with membership
        .persist()
    )
    if hub_salt > 1:
        # salted layout: hub in-edges spread over k sub-partitions, and
        # v's static stats ride the cache so the salted gather never
        # joins the vertex table on an unsalted key
        static_cols = [F.col("k_out").alias("vk_out"), F.col("loop").alias("vloop")]
        if directed:
            static_cols.insert(1, F.col("k_in").alias("vk_in"))
        vsrc = vstats.select(F.col("id").alias("src"), *static_cols)
        edges_sym = (
            edges_sym.join(vsrc, "src")
            .withColumn("salt1", F.pmod(F.xxhash64("src"), F.lit(hub_salt)))
            .repartition(n_shuffle, "dst", "salt1")
            .sortWithinPartitions("dst", "salt1")
            .persist()
        )
    else:
        edges_sym = edges_sym.repartition(n_shuffle, "dst").sortWithinPartitions("dst").persist()
    edges_sym.count()  # materialise outside the measured superstep loop
    W = float(edges.agg(F.sum("weight")).first()[0] or 0.0)
    n_tot = float(vstats.count())
    from ..localcore.quality import possible_pairs

    pairs_tot = float(possible_pairs(n_tot, directed, correct_self_loops))
    p_global = W / pairs_tot if pairs_tot > 0 else 0.0

    # ---- resume support (north rule): the driver loop position is
    # persisted alongside every membership checkpoint; a restarted run
    # reloads the latest membership and re-enters the loop at the exact
    # (iteration, step), reproducing the uninterrupted run bit-for-bit
    # (the parity gate is keyed on the absolute checkpoint index).
    state = ckpt.load_state() if resume else None
    if state is not None and ckpt.latest_step("membership") is not None:
        ckpt_idx = min(state["ckpt_idx"], ckpt.latest_step("membership"))
        membership = ckpt.load("membership", ckpt_idx)
        it0, step0, total_steps = state["iteration"], state["step"], state["total_steps"]
    else:
        membership = vstats.select("id", F.col("id").alias("comm"))
        ckpt_idx = 0
        membership = ckpt.save(membership, "membership", ckpt_idx)
        it0, step0, total_steps = 0, 0, 0
        ckpt.save_state({"iteration": 0, "step": 0, "ckpt_idx": 0, "total_steps": 0})

    for it in range(it0, max(n_iterations, 1)):
        step = step0 if it == it0 else 0
        while step < max_supersteps:
            step += 1
            t0 = time.time()
            # augmented vertex table: membership ⋈ static vertex stats, plus
            # the own-community aggregates the method needs.  cstats is a
            # pruned (comm, 1-3 doubles) table built with map-side partial
            # aggregation, attached by merge join and restored to the
            # hash(id)-sorted layout every downstream superstep op reuses.
            method_eff, _geff = _method_eff(spec)
            needs = _stat_needs(method_eff, directed)
            mstats = membership.join(vstats.hint("merge"), "id")
            agg_cols = []
            if "K_out" in needs:
                agg_cols.append(F.sum("k_out").alias("Ka_out"))
            if "K_in" in needs:
                agg_cols.append(F.sum("k_in").alias("Ka_in"))
            if "n" in needs:
                agg_cols.append(F.sum("node_size").alias("na"))
            cstats = mstats.groupBy("comm").agg(*agg_cols) if agg_cols else None
            if "w" in needs:
                # only the KL objective needs per-community internal weight
                # in its dQ; for the linear family the w terms cancel
                m_src = membership.select(F.col("id").alias("src"), F.col("comm").alias("cs"))
                m_dst = membership.select(F.col("id").alias("dst"), F.col("comm").alias("cd"))
                w_in = (
                    edges.join(m_src, "src").join(m_dst, "dst")
                    .where(F.col("cs") == F.col("cd"))
                    .groupBy(F.col("cs").alias("comm"))
                    .agg(F.sum("weight").alias("wa"))
                )
                cstats = cstats.join(w_in, "comm", "left").na.fill({"wa": 0.0})
            # adaptive stats attach.  Early supersteps: many communities,
            # none big → the comm-keyed merge join has no skew.  Late
            # supersteps: one community can hold a large fraction of all
            # vertices (the tool hub), and a comm-keyed sort would put its
            # members in ONE task — but by then n_comm has collapsed, so
            # the stats table broadcasts: a map-side probe with zero
            # shuffle and zero skew that also keeps mstats' hash(id)
            # layout (no repartition/sort).  The crossover tracks the
            # community count, which only shrinks as merges proceed.
            cstats = cstats.persist()
            n_comm = cstats.count()
            if n_comm <= _BCAST_COMMS:
                aug = mstats.join(F.broadcast(cstats), "comm").persist()
            else:
                aug = (
                    mstats.join(cstats.hint("merge"), "comm")
                    .repartition(n_shuffle, "id").sortWithinPartitions("id").persist()
                )
            scratch = None
            if hub_salt > 1:
                winners, scratch = _superstep_moves_salted(
                    edges_sym, aug, spec, directed, W, p_global,
                    n_tot, ckpt_idx + 1, seed, n_shuffle, hub_salt,
                )
                winners = winners.persist()
            else:
                winners = _superstep_moves(
                    edges_sym, aug, spec, directed, W, p_global,
                    n_tot, ckpt_idx + 1, seed, n_shuffle,
                ).persist()
            new_membership = (
                membership.join(
                    winners.where("gated").select("id", "new_comm"), "id", "left"
                ).select("id", F.coalesce("new_comm", "comm").alias("comm"))
            )
            # one heavy action per superstep: the checkpoint materialises the
            # whole move pipeline (winners persists as a side effect); the
            # convergence counts then read the cached winners only
            ckpt_idx += 1
            membership = ckpt.save(new_membership, "membership", ckpt_idx)
            counts = winners.agg(
                F.count(F.lit(1)).alias("improving"),
                F.count(F.when(F.col("gated"), 1)).alias("moves"),
            ).first()
            n_improving, n_moves = int(counts["improving"]), int(counts["moves"])
            ckpt.save_state(
                {"iteration": it, "step": step, "ckpt_idx": ckpt_idx, "total_steps": total_steps}
            )
            winners.unpersist()
            aug.unpersist()
            cstats.unpersist()
            if scratch is not None:
                scratch.unpersist()
            dt = time.time() - t0
            ckpt.log(
                name="leiden_superstep", iteration=it, step=total_steps + step,
                moves=int(n_moves), improving=int(n_improving),
                secs=round(dt, 4), edges_per_sec=round(ecount / max(dt, 1e-9), 1),
            )
            if n_improving == 0:
                break
        total_steps += step
        if not finish:
            # throughput-measurement mode: stop after the move phase
            break
        # refinement + aggregate + local coarse finish
        refined = _refine_by_components(spark, sym, membership, ckpt).persist()
        membership = _coarse_finish(
            spark, edges, refined, spec, directed, seed, opts, local_threshold, ckpt, total_steps
        )
        ckpt_idx += 1
        membership = ckpt.save(membership, "membership", ckpt_idx)
        ckpt.save_state(
            {"iteration": it + 1, "step": 0, "ckpt_idx": ckpt_idx, "total_steps": total_steps}
        )
        refined.unpersist()

    q = df_quality(edges, membership, method, gamma, directed, correct_self_loops=correct_self_loops)
    edges_sym.unpersist()
    vstats.unpersist()
    edges.unpersist()
    return LeidenResult(membership, q, method, gamma, supersteps=total_steps, levels=2, metrics=ckpt.metrics)


# ----------------------------------------------------------------- helpers
def _local_solve_df(spark, edges, spec, n_iterations, seed, directed, opts, initial=None):
    """Pull a (small) edge table to the driver, run the exact local core,
    return a membership DataFrame (id, comm)."""
    pdf = edges.toPandas()
    ids = np.unique(np.concatenate([pdf["src"].to_numpy(), pdf["dst"].to_numpy()]))
    idx = {int(v): i for i, v in enumerate(ids)}
    src = pdf["src"].map(idx).to_numpy(dtype=np.int64)
    dst = pdf["dst"].map(idx).to_numpy(dtype=np.int64)
    g = LocalGraph(len(ids), src, dst, pdf["weight"].to_numpy(dtype=np.float64), directed=directed)
    init = None
    if initial is not None:
        init = np.array([initial[int(v)] for v in ids], dtype=np.int64)
    P = LocalPartition([(g, spec)], membership=init)
    o = opts or OptimiserOpts(seed=seed)
    o.seed = seed
    optimise_partition(P, n_iterations=n_iterations, opts=o)
    import pandas as pd

    out = pd.DataFrame({"id": ids.astype(np.int64), "comm": P.membership.astype(np.int64)})
    return spark.createDataFrame(out)


def _coarse_finish(spark, edges, refined, spec, directed, seed, opts, local_threshold, ckpt, step):
    """Aggregate by the refined partition and finish on the driver.

    Coarse vertices = refined communities, node_size = vertex counts,
    initial coarse membership = parent community labels — then exact
    local-core Leiden, projected back down (T3 + T4, SURVEY.md §2.2).
    """
    r_src = refined.select(F.col("id").alias("src"), F.col("refined").alias("r_src"))
    r_dst = refined.select(F.col("id").alias("dst"), F.col("refined").alias("r_dst"))
    coarse_edges = (
        edges.join(r_src, "src").join(r_dst, "dst")
        .groupBy("r_src", "r_dst")
        .agg(F.sum("weight").alias("weight"))
        .select(F.col("r_src").alias("src"), F.col("r_dst").alias("dst"), "weight")
    )
    coarse_nodes = refined.groupBy("refined").agg(
        F.count(F.lit(1)).alias("node_size"), F.first("comm").alias("parent")
    )
    n_coarse_edges = coarse_edges.count()
    if n_coarse_edges > max(local_threshold, 5_000_000):
        # geometric shrink hasn't gone far enough for a driver collect;
        # log and keep the move-phase membership (a further distributed
        # level is the scale path — tracked for the next round)
        ckpt.log(name="leiden_aggregate_skipped", step=step, coarse_edges=int(n_coarse_edges))
        return refined.select("id", "comm")
    ce = coarse_edges.toPandas()
    cn = coarse_nodes.toPandas()
    ckpt.log(name="leiden_aggregate", step=step, coarse_vertices=len(cn), coarse_edges=len(ce))
    ids = cn["refined"].to_numpy(dtype=np.int64)
    idx = {int(v): i for i, v in enumerate(ids)}
    src = ce["src"].map(idx).to_numpy(dtype=np.int64)
    dst = ce["dst"].map(idx).to_numpy(dtype=np.int64)
    if not directed:
        lo, hi = np.minimum(src, dst), np.maximum(src, dst)
        src, dst = lo, hi
    g = LocalGraph(
        len(ids), src, dst, ce["weight"].to_numpy(dtype=np.float64),
        node_size=cn["node_size"].to_numpy(dtype=np.float64), directed=directed,
    )
    parents = cn["parent"].to_numpy()
    _, parent_dense = np.unique(parents, return_inverse=True)
    P = LocalPartition([(g, spec)], membership=parent_dense.astype(np.int64))
    o = opts or OptimiserOpts(seed=seed)
    optimise_partition(P, n_iterations=2, opts=o)
    import pandas as pd

    coarse_memb = spark.createDataFrame(
        pd.DataFrame({"refined": ids.astype(np.int64), "new_comm": P.membership.astype(np.int64)})
    )
    return (
        refined.join(coarse_memb, "refined")
        .select("id", F.col("new_comm").alias("comm"))
    )
