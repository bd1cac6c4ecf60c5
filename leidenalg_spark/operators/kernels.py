"""Link-graph kernels: PageRank, connected components, label propagation,
triangle count (north-rule operators; SURVEY.md §7.1 item 4).

All four are pure DataFrame programs — iterative join+aggregate supersteps
with per-superstep lineage truncation via :class:`CheckpointManager`.
Design notes for 100 TB:

- PageRank: edges are re-used every superstep → persist once, partitioned
  by ``src`` so the rank join co-locates; the per-superstep shuffle is the
  ``groupBy(dst)`` contribution sum (partial-aggregated map-side).
- Connected components: alternating large-star/small-star (Kiveris et
  al., "Connected Components in MapReduce and Beyond", cf. PAPERS.md) —
  O(log^2 n) rounds independent of component diameter, unlike naive
  min-label flooding which needs O(diameter) rounds.
- LPA: synchronous halves — only vertices with ``hash(v, step)`` parity
  move per round, the standard guard against bipartite label oscillation.
- Triangles: degree-orientation turns the graph into a DAG so every
  triangle is counted exactly once; the wedge self-join is the only heavy
  shuffle, bounded by sum(deg^2) on the *oriented* graph (max out-degree
  ~sqrt(m), the classic bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checkpoint import CheckpointManager


def _vertices(edges: DataFrame) -> DataFrame:
    return edges.select(F.col("src").alias("id")).unionByName(edges.select(F.col("dst").alias("id"))).distinct()


# --------------------------------------------------------------------- PR
def pagerank(
    spark,
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1.0e-6,
    directed: bool = True,
    ckpt: CheckpointManager | None = None,
    ckpt_every: int = 5,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """Weighted PageRank; returns (id, rank) with sum(rank) == 1.

    Dangling-vertex mass is redistributed uniformly each superstep, so the
    rank vector stays a probability distribution.

    ``init_ranks``: optional (id, rank) WARM START — seed from a previous
    run's vector instead of uniform (the incremental-recompute pattern:
    after a streaming edge-table update, yesterday's ranks are an
    excellent initial guess and a ``tol``-gated run converges in a few
    supersteps instead of tens).  Vertices absent from the seed enter at
    the uniform rank; the seeded vector is renormalised to sum 1, so the
    fixed point — unique for damping < 1 — is IDENTICAL to a cold start,
    only reached sooner.

    ``ckpt_every``: materialise the rank vector every k supersteps instead
    of every superstep — on a fixed-iteration run (tol=0, no dangling
    mass) nothing reads the intermediate vectors, so eager per-step
    checkpoints only pay materialisation cost; the lineage between
    checkpoints is k join+agg layers, well inside Catalyst's comfort
    zone.  Runs that DO read the vector every step (tol>0 delta, dangling
    mass) checkpoint every step as before, since a lazy chain would be
    recomputed per action.
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    if not directed:
        edges = edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"))
    verts = _vertices(edges).persist()
    n = verts.count()
    if n == 0:
        out = verts.withColumn("rank", F.lit(0.0)).localCheckpoint(eager=True)
        verts.unpersist()
        return out
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    links = edges.join(out_w, "src").select("src", "dst", (F.col("weight") / F.col("out_w")).alias("share")).persist()
    links.count()
    if init_ranks is not None:
        seeded = verts.join(init_ranks.select("id", F.col("rank").alias("r0")), "id", "left")
        seeded = seeded.select("id", F.coalesce("r0", F.lit(1.0 / n)).alias("rank"))
        total = seeded.agg(F.sum("rank")).first()[0] or 1.0
        ranks = seeded.select("id", (F.col("rank") / F.lit(float(total))).alias("rank"))
        ranks = ckpt.save(ranks, "pagerank_ranks_init", 0)
    else:
        ranks = verts.withColumn("rank", F.lit(1.0 / n))
    has_out = out_w.select(F.col("src").alias("id"))
    dangling_verts = verts.join(has_out, "id", "left_anti").persist()
    any_dangling = dangling_verts.limit(1).count() > 0
    # vertices with no in-links get the constant teleport(+dangling) rank;
    # the set is static, so precomputing it replaces the per-iteration
    # verts left-join (a vertex-proportional shuffle) with a union — and
    # for undirected graphs the set is empty and the union disappears too
    receivers = edges.select(F.col("dst").alias("id")).distinct()
    no_in = verts.join(receivers, "id", "left_anti").persist()
    any_no_in = no_in.limit(1).count() > 0
    for step in range(max_iter):
        # the dangling-mass action only runs when dangling vertices exist
        # at all (never, for symmetrised/undirected graphs) — one less
        # serial driver round-trip per superstep
        dangling = (
            dangling_verts.join(ranks, "id").agg(F.sum("rank")).first()[0] or 0.0
        ) if any_dangling else 0.0
        contribs = (
            links.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("share") * F.col("rank")).alias("contrib"))
        )
        rank_expr = (
            F.lit((1.0 - damping) / n)
            + F.lit(damping) * (F.col("contrib") + F.lit(dangling / n))
        ).alias("rank")
        new_ranks = contribs.select("id", rank_expr)
        if any_no_in:
            new_ranks = new_ranks.unionByName(
                no_in.select("id", F.lit(0.0).alias("contrib")).select("id", rank_expr)
            )
        every_step = any_dangling or tol > 0.0
        if every_step or step % ckpt_every == ckpt_every - 1 or step == max_iter - 1:
            new_ranks = ckpt.save(new_ranks, "pagerank_ranks", step)
        if tol > 0.0:
            delta = (
                new_ranks.withColumnRenamed("rank", "nr")
                .join(ranks, "id")
                .agg(F.sum(F.abs(F.col("nr") - F.col("rank"))))
                .first()[0]
            )
        else:
            delta = None  # tol=0 → fixed iteration count, skip the action
        ranks = new_ranks
        ckpt.log(name="pagerank", step=step, l1_delta=float(delta or 0.0))
        if delta is not None and delta < tol:
            break
    verts.unpersist()
    links.unpersist()
    dangling_verts.unpersist()
    no_in.unpersist()
    if own_ckpt and ckpt.path is None:
        # barrier off the ephemeral tmpdir, then free it now (see
        # CheckpointManager.close) — repeated kernel calls must not
        # accumulate tmpdirs until process exit
        ranks = ranks.localCheckpoint(eager=True)
        ckpt.close()
    return ranks


# -------------------------------------------------------------------- PPR
def personalized_pagerank(
    spark,
    edges: DataFrame,
    sources,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 0.0,
    directed: bool = True,
    ckpt: CheckpointManager | None = None,
    ckpt_every: int = 5,
) -> DataFrame:
    """Personalized PageRank: random walks restart at ``sources`` instead
    of uniformly, so rank measures proximity to the seed set (the standard
    seeded-relevance kernel for "what is near this user/tool" queries on
    the reply/tool-interaction graph).  Returns (id, rank) over ALL graph
    vertices (unreached vertices at exactly 0.0) with sum(rank) == 1.

    ``sources``: a list of vertex ids (uniform restart) or a
    DataFrame(id[, weight]); weights are normalised declaratively (one
    broadcast one-row aggregate), never on the driver.  Dangling-vertex
    mass is redistributed by the restart vector, the convention that keeps
    the rank vector a probability distribution.

    Scale shape: identical to :func:`pagerank` — the edge/share table is
    persisted once, each superstep is one join + one hash aggregate — but
    the rank vector stays SPARSE (only vertices reachable from the seed
    set appear), so on a 10^12-edge graph a local seed query touches only
    its reachable neighbourhood's ranks; the union with the restart
    vector replaces pagerank's dense per-vertex teleport join.
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    if isinstance(sources, (list, tuple, set)):
        if not sources:
            raise ValueError("sources must be non-empty")
        sources = spark.createDataFrame(
            [(int(s),) for s in sorted(sources)], "id long"
        ).withColumn("weight", F.lit(1.0))
    if "weight" not in sources.columns:
        sources = sources.withColumn("weight", F.lit(1.0))
    if not directed:
        edges = edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"))
    verts = _vertices(edges).unionByName(sources.select("id")).distinct().persist()
    tot = sources.agg(F.sum("weight").alias("tot"))
    reset = (
        sources.crossJoin(F.broadcast(tot))
        .select("id", (F.col("weight") / F.col("tot")).alias("rw"))
        .persist()
    )
    if reset.count() == 0:
        raise ValueError("sources must be non-empty")
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    links = edges.join(out_w, "src").select("src", "dst", (F.col("weight") / F.col("out_w")).alias("share")).persist()
    links.count()
    has_out = out_w.select(F.col("src").alias("id"))
    dangling_verts = verts.join(has_out, "id", "left_anti").persist()
    any_dangling = dangling_verts.limit(1).count() > 0
    ranks = reset.select("id", F.col("rw").alias("rank"))
    for step in range(max_iter):
        dangling = (
            dangling_verts.join(ranks, "id").agg(F.sum("rank")).first()[0] or 0.0
        ) if any_dangling else 0.0
        teleport = 1.0 - damping + damping * dangling
        contribs = (
            links.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("share") * F.col("rank")).alias("part"))
            .select("id", (F.lit(damping) * F.col("part")).alias("part"))
        )
        new_ranks = (
            contribs.unionByName(reset.select("id", (F.lit(teleport) * F.col("rw")).alias("part")))
            .groupBy("id")
            .agg(F.sum("part").alias("rank"))
        )
        every_step = any_dangling or tol > 0.0
        if every_step or step % ckpt_every == ckpt_every - 1 or step == max_iter - 1:
            new_ranks = ckpt.save(new_ranks, "ppr_ranks", step)
        if tol > 0.0:
            # support can grow between steps → full-outer delta with 0 fill
            delta = (
                new_ranks.withColumnRenamed("rank", "nr")
                .join(ranks, "id", "full_outer")
                .agg(F.sum(F.abs(F.coalesce(F.col("nr"), F.lit(0.0)) - F.coalesce(F.col("rank"), F.lit(0.0)))))
                .first()[0]
            )
        else:
            delta = None
        ranks = new_ranks
        ckpt.log(name="ppr", step=step, l1_delta=float(delta or 0.0))
        if delta is not None and delta < tol:
            break
    dense = verts.join(ranks, "id", "left").select("id", F.coalesce("rank", F.lit(0.0)).alias("rank"))
    if own_ckpt and ckpt.path is None:
        # barrier off the ephemeral tmpdir, then free it (kernel-call
        # hygiene, cf. pagerank above)
        dense = dense.localCheckpoint(eager=True)
        ckpt.close()
    verts.unpersist()
    links.unpersist()
    dangling_verts.unpersist()
    reset.unpersist()
    return dense


# --------------------------------------------------------------------- CC
def connected_components(
    spark,
    edges: DataFrame,
    max_rounds: int = 50,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Connected components via alternating large-star/small-star.

    Returns (id, component) where component is the minimum vertex id of
    the component.  Converges in O(log^2 n) rounds regardless of
    diameter — the scale-correct choice for 10^12-edge graphs.
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    verts = _vertices(edges).persist()
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    e = ckpt.save(e, "cc_edges", 0)
    prev_sig = None
    for r in range(1, max_rounds + 1):
        # large-star: for every u, link strictly-larger neighbours to
        # m(u) = min(N(u) ∪ {u})
        sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        mins = sym.groupBy("src").agg(F.least(F.min("dst"), F.first("src")).alias("m"))
        ls = (
            sym.join(mins, "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .distinct()
        )
        # small-star: canonicalise u = max endpoint, link all smaller
        # neighbours (and u) to the minimum
        c = ls.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        mins2 = c.groupBy("src").agg(F.min("dst").alias("m"))
        ss = (
            c.join(mins2, "src")
            .where(F.col("dst") != F.col("m"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .unionByName(mins2.select("src", F.col("m").alias("dst")))
            .distinct()
        )
        # convergence signature rides the checkpoint write via observe() —
        # one action per round, not two.  Checksum in double space: BIGINT
        # arithmetic on xxhash64-sized ids overflows under ANSI mode
        from pyspark.sql import Observation

        obs = Observation()
        ss = ss.observe(
            obs,
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.xxhash64("src", "dst").cast("double")).alias("chk"),
        )
        e = ckpt.save(ss, "cc_edges", r)
        vals = obs.get
        sig = (vals["cnt"], vals["chk"])
        ckpt.log(name="cc", step=r, edges=int(sig[0]))
        if sig == prev_sig:
            break
        prev_sig = sig
    comp = e.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    out = (
        verts.join(comp, "id", "left")
        .select("id", F.coalesce("component", "id").alias("component"))
    )
    verts.unpersist()
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    return out


# -------------------------------------------------------------------- SCC
def strongly_connected_components(
    spark,
    edges: DataFrame,
    max_rounds: int = 30,
    max_prop: int = 60,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Strongly connected components of the DIRECTED graph (reply / tool-
    call edges keep their direction).  Returns (id, component) where
    component is the minimum vertex id of the SCC — the same canonical
    label convention as :func:`connected_components`.

    Algorithm: distributed coloring (Orzan 2004; the standard
    MapReduce/Pregel SCC scheme) with trimming.  Per round over the
    active subgraph: (a) TRIM — vertices with no in-edges or no
    out-edges cannot sit on a cycle, assign them as singletons; (b)
    COLOR — propagate min-reaching-id forward to a fixpoint, so
    color(v) = min id that reaches v; (c) the root r of each color class
    (color(r) == r) is the minimum id OF its SCC, and the backward
    closure of r restricted to its own color class is exactly SCC(r);
    assign and remove those, repeat.  Each round extracts every SCC
    containing a basin-minimal vertex, so rounds ≈ the depth of the SCC
    condensation DAG, and trimming collapses the long chains that
    dominate real reply graphs.

    Scale shape: every step is an equi-join + min-aggregate on the
    (src-partitioned) active edge table; convergence checks ride the
    per-step checkpoint write via ``observe()`` (one action per step,
    cf. connected_components); the active graph shrinks monotonically
    and is re-checkpointed per round so lineage stays flat.
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    verts = _vertices(edges).persist()
    active_v = verts
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    e = ckpt.save(e, "scc_edges", 0)
    assigned = None  # accumulated (id, component)

    def _fixpoint(state, step_fn, tag, rnd):
        """Iterate ``state = step_fn(state)`` to a checksum fixpoint."""
        prev = None
        for it in range(max_prop):
            nxt = step_fn(state)
            from pyspark.sql import Observation

            obs = Observation()
            cols = nxt.columns
            nxt = nxt.observe(
                obs,
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.xxhash64(*cols).cast("double")).alias("chk"),
            )
            state = ckpt.save(nxt, f"scc_{tag}", rnd * 1000 + it)
            vals = obs.get
            sig = (vals["cnt"], vals["chk"])
            if sig == prev:
                break
            prev = sig
        return state

    for rnd in range(1, max_rounds + 1):
        if active_v.limit(1).count() == 0:
            break
        # ---- trim: no in-edges or no out-edges in the active subgraph
        has_in = e.select(F.col("dst").alias("id")).distinct()
        has_out = e.select(F.col("src").alias("id")).distinct()
        trivial = active_v.join(has_in, "id", "left_anti").unionByName(
            active_v.join(has_in, "id", "left_semi").join(has_out, "id", "left_anti")
        )
        new_assigned = trivial.select("id", F.col("id").alias("component"))
        # ---- color on the TRIMMED subgraph: removing acyclic vertices
        # (and their edges) preserves every SCC — no cycle passes through
        # a vertex with no in- or no out-edge — and keeps trimmed sinks
        # out of the color table, where the backward closure could
        # otherwise harvest them a second time
        live = active_v.join(trivial, "id", "left_anti")
        live = ckpt.save(live, "scc_live", rnd)
        e_live = (
            e.join(live.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(live.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
        )
        e_live = ckpt.save(e_live, "scc_elive", rnd)

        def _color_step(c):
            fwd = (
                e_live.join(c.withColumnRenamed("id", "src"), "src")
                .select(F.col("dst").alias("id"), "color")
            )
            return c.unionByName(fwd).groupBy("id").agg(F.min("color").alias("color"))

        colors = live.select("id", F.col("id").alias("color"))
        colors = _fixpoint(colors, _color_step, "colors", rnd)
        # ---- harvest: backward closure of each root within its color
        roots = colors.where(F.col("id") == F.col("color")).select("id", "color")

        def _reach_step(rch):
            back = (
                e_live.join(rch.withColumnRenamed("id", "dst"), "dst")
                .select(F.col("src").alias("id"), "color")
            )
            back = back.join(colors, ["id", "color"], "left_semi")
            return rch.unionByName(back).distinct()

        reach = _fixpoint(roots, _reach_step, "reach", rnd)
        new_assigned = new_assigned.unionByName(
            reach.select("id", F.col("color").alias("component"))
        )
        assigned = (
            new_assigned if assigned is None else assigned.unionByName(new_assigned)
        )
        assigned = ckpt.save(assigned, "scc_assigned", rnd)
        # ---- shrink the active graph
        active_v = live.join(reach, "id", "left_anti")
        active_v = ckpt.save(active_v, "scc_active", rnd)
        e = (
            e_live.join(active_v.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(active_v.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
        )
        e = ckpt.save(e, "scc_edges", rnd)
        ckpt.log(name="scc", step=rnd)
    out = (
        verts.join(assigned, "id", "left")
        .select("id", F.coalesce("component", "id").alias("component"))
        if assigned is not None
        else verts.select("id", F.col("id").alias("component"))
    )
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    verts.unpersist()
    return out


def k_truss(
    spark,
    edges: DataFrame,
    k: int,
    rounds: int | None = None,
    max_rounds: int = 50,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """k-truss decomposition: iteratively drop edges of the simple
    undirected graph whose support (triangles containing the edge in
    the CURRENT graph) is < k−2, to a fixpoint.  Returns the surviving
    edges (a, b, support) with the support inside the truss — the
    edge-level analogue of :func:`k_core` (k-core bounds vertex
    degrees, k-truss bounds edge embeddedness; every k-truss is inside
    the (k−1)-core).

    ``rounds``: run EXACTLY that many synchronous peel rounds — the
    oracle-comparability mode (cf. ``k_core``/``label_propagation``).

    Scale: per round one wedge join (common-neighbour count per edge,
    bounded by Σ deg(a)·deg(b) over surviving edges) + one semi-join;
    per-round lineage truncation via the checkpoint; rounds needed =
    peel depth, independent of diameter.
    """
    if k < 3:
        raise ValueError("k-truss requires k >= 3")
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    e = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    e = ckpt.save(e, "ktruss_edges", 0)
    n_rounds = rounds if rounds is not None else max_rounds
    prev_cnt = None

    def _support(cur):
        sym = cur.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            cur.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        s1 = sym.select(F.col("u").alias("a"), F.col("v").alias("x"))
        s2 = sym.select(F.col("u").alias("b"), F.col("v").alias("x"))
        return (
            cur.join(s1, "a")
            .join(s2, ["b", "x"])
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("support"))
        )

    for r in range(1, n_rounds + 1):
        keep = _support(e).where(F.col("support") >= k - 2).select("a", "b")
        nxt = ckpt.save(e.join(keep, ["a", "b"], "left_semi"), "ktruss_edges", r)
        cnt = nxt.count()
        e = nxt
        if rounds is None:
            if cnt == 0 or cnt == prev_cnt:
                break
            prev_cnt = cnt
    out = (
        e.join(_support(e), ["a", "b"], "left")
        .select("a", "b", F.coalesce("support", F.lit(0)).cast("long").alias("support"))
    )
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    return out


def maximal_independent_set(
    spark,
    edges: DataFrame,
    seed: int = 42,
    rounds: int | None = None,
    max_rounds: int = 50,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Luby-style maximal independent set with DETERMINISTIC md5
    priorities: each round, an active vertex joins the MIS when its
    (priority, id) pair beats every active neighbour's — a total order,
    so no coin flips and no ties; winners and their neighbours
    deactivate.  O(log n) rounds in expectation for random priorities;
    md5 priorities behave the same and make the run reproducible in
    plain SQL.  Returns MIS members as (id, mis_round).

    ``rounds``: run exactly that many rounds (oracle-comparability
    mode — the result is the members selected so far, a deterministic
    prefix of the full MIS).

    Scale: per round one neighbour-min aggregate over the active edge
    set + two semi/anti joins; the active graph shrinks geometrically.
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    e = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    pr = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), F.col("id").cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    av = (
        e.select(F.col("a").alias("id"))
        .unionByName(e.select(F.col("b").alias("id")))
        .distinct()
        .withColumn("p", pr)
    )
    av = ckpt.save(av, "mis_active", 0)
    ae = ckpt.save(e, "mis_edges", 0)
    mis_parts = []
    n_rounds = rounds if rounds is not None else max_rounds
    for r in range(1, n_rounds + 1):
        sym = ae.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            ae.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        nbp = (
            sym.join(av.select(F.col("id").alias("v"), F.col("p").alias("pv")), "v")
            .groupBy(F.col("u").alias("id"))
            .agg(F.min(F.struct(F.col("pv"), F.col("v"))).alias("nb"))
        )
        win = (
            av.join(nbp, "id", "left")
            .where(
                F.col("nb").isNull()
                | (F.struct(F.col("p"), F.col("id")) < F.col("nb"))
            )
            .select("id")
        )
        win = ckpt.save(win, "mis_win", r)
        mis_parts.append(win.select("id", F.lit(r).cast("long").alias("mis_round")))
        dead = win.unionByName(
            sym.join(win.withColumnRenamed("id", "u"), "u", "left_semi")
            .select(F.col("v").alias("id"))
        ).distinct()
        av = ckpt.save(av.join(dead, "id", "left_anti"), "mis_active", r)
        keep = av.select("id")
        ae = ckpt.save(
            ae.join(keep.withColumnRenamed("id", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("id", "b"), "b", "left_semi"),
            "mis_edges", r,
        )
        if rounds is None and av.count() == 0:
            break
    out = mis_parts[0]
    for m in mis_parts[1:]:
        out = out.unionByName(m)
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    return out


def densest_subgraph(
    spark,
    edges: DataFrame,
    epsilon: float = 0.0,
    rounds: int | None = None,
    max_rounds: int = 30,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Greedy densest subgraph by batched peeling (Bahmani, Kumar,
    Vassilvitskii, "Densest subgraph in streaming and MapReduce",
    PVLDB 2012): each round removes EVERY vertex whose degree is
    ≤ 2(1+ε)·ρ (ρ = |E|/|V|, the current density), which terminates in
    O(log n) rounds and returns a subgraph of density ≥ OPT/(2(1+ε)) —
    the distributable form of Charikar's one-vertex-at-a-time greedy
    (which needs Θ(n) sequential rounds).  Returns the best round's
    vertex set: (id, density) with the achieved density on every row;
    ties between equally dense rounds resolve to the EARLIEST round.

    ``rounds``: run exactly that many peel rounds (oracle mode).

    Scale: per round one degree aggregate + two semi-joins + two
    scalar counts; vertex sets checkpoint per round so the winner is
    reloaded, not recomputed.
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    e = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    e = ckpt.save(e, "dsg_edges", 0)
    n_rounds = rounds if rounds is not None else max_rounds
    best_density, best_round = -1.0, 0
    thresh = 2.0 * (1.0 + float(epsilon))
    deg_by_round = {}
    for r in range(0, n_rounds + 1):
        ends = e.select(F.col("a").alias("id")).unionByName(e.select(F.col("b").alias("id")))
        deg = ends.groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
        deg = ckpt.save(deg, "dsg_deg", r)
        deg_by_round[r] = deg
        row = deg.agg(
            F.count(F.lit(1)).alias("n"), (F.sum("deg") / 2).alias("m")
        ).first()
        n_v, m_e = int(row["n"] or 0), float(row["m"] or 0.0)
        if n_v == 0:
            break
        density = m_e / n_v
        if density > best_density + 1e-12:
            best_density, best_round = density, r
        if r == n_rounds:
            break
        keep = deg.where(F.col("deg") > thresh * density).select("id")
        e = ckpt.save(
            e.join(keep.withColumnRenamed("id", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("id", "b"), "b", "left_semi")
            .select("a", "b"),
            "dsg_edges", r + 1,
        )
    out = (
        deg_by_round[best_round].select("id")
        .withColumn("density", F.round(F.lit(best_density), 6))
    )
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    return out


# ------------------------------------------------------ negative sampling
def negative_samples(spark, edges: DataFrame, k: int = 3, seed: int = 42) -> DataFrame:
    """Deterministic negative sampling for link-prediction / embedding
    training: for every distinct directed edge (loops excluded), ``k``
    md5-keyed uniform vertex draws; a draw that hits the source itself
    or one of its existing out-neighbours is DROPPED, not re-drawn
    (expected survivors ≈ k·(1 − density); re-draw loops would break
    the retry/append stability the md5 samplers guarantee).  Returns
    (src, pos_dst, neg_dst, draw).

    Scale shape: positives explode ×k (a bounded constant), one
    broadcast of the 1-row vertex count, one equi-join against the
    dense-ranked vertex table, one anti-join against the edge set.
    The dense rank is a row_number over the vertex ids — the same
    global-sort primitive as T5 renumbering; at extreme |V| swap in a
    precomputed id↔index table.
    """
    from pyspark.sql import Window

    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    vt = _vertices(e).withColumn(
        "idx", F.row_number().over(Window.orderBy("id")).cast("long")
    )
    n1 = vt.agg(F.count(F.lit(1)).alias("n"))
    draws = e.withColumn(
        "draw", F.explode(F.array(*[F.lit(i).cast("long") for i in range(1, k + 1)]))
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(str(seed)),
                    F.col("src").cast("string"),
                    F.col("dst").cast("string"),
                    F.col("draw").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    cand = (
        draws.crossJoin(F.broadcast(n1))
        .withColumn("idx", (h % F.col("n")) + 1)
        .join(vt.select("idx", F.col("id").alias("neg_dst")), "idx")
        .where(F.col("neg_dst") != F.col("src"))
    )
    out = cand.join(
        e.select("src", F.col("dst").alias("neg_dst")), ["src", "neg_dst"], "left_anti"
    )
    res = out.select("src", F.col("dst").alias("pos_dst"), "neg_dst", "draw")
    res = res.localCheckpoint(eager=True)
    e.unpersist()
    return res


# ---------------------------------------------------------- dyads / triads
def reciprocity(spark, edges: DataFrame) -> DataFrame:
    """Dyad census of the directed simple graph (self-loops excluded,
    parallel edges collapsed): ``n_edges`` distinct ordered pairs,
    ``n_mutual`` unordered pairs connected in BOTH directions,
    ``n_asym`` connected in exactly one, and ``reciprocity`` =
    fraction of ordered edges that are reciprocated (igraph's default
    ratio, 2·mutual/(2·mutual + asym)).

    One distinct + one self-equi-join on the reversed key + one
    aggregate — every step map-side combinable.
    """
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), F.lit(1).alias("m"))
    marked = e.join(rev, ["src", "dst"], "left")
    return marked.agg(
        F.count(F.lit(1)).alias("n_edges"),
        (F.sum(F.coalesce("m", F.lit(0))) / 2).cast("long").alias("n_mutual"),
        (F.count(F.lit(1)) - F.sum(F.coalesce("m", F.lit(0)))).cast("long").alias("n_asym"),
        F.round(F.sum(F.coalesce("m", F.lit(0))) / F.count(F.lit(1)), 6).alias("reciprocity"),
    )


def closed_triples(spark, edges: DataFrame) -> DataFrame:
    """Directed closed-triple census on the simple graph (loops
    excluded): ``n_paths2`` = directed 2-paths a→b→c over DISTINCT
    vertices, ``n_cyclic`` = cyclic triangles a→b→c→a (each counted
    once — the 3 rotations are deduplicated), ``n_transitive`` =
    2-paths closed by the shortcut a→c.  The cyclic/transitive balance
    is the classic feed-forward-vs-feedback motif signal.

    One distinct edge table, one self-join for the 2-paths, two
    LEFT-semi-style closures — all equi-joins bounded by Σdeg_in·deg_out.
    """
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    p2 = (
        e.alias("x")
        .join(e.alias("y"), F.col("x.dst") == F.col("y.src"))
        .where(F.col("y.dst") != F.col("x.src"))
        .select(
            F.col("x.src").alias("a"), F.col("x.dst").alias("b"), F.col("y.dst").alias("c")
        )
    )
    back = e.select(F.col("src").alias("c"), F.col("dst").alias("a"), F.lit(1).alias("cyc"))
    fwd = e.select(F.col("src").alias("a"), F.col("dst").alias("c"), F.lit(1).alias("tra"))
    scored = p2.join(back, ["a", "c"], "left").join(fwd, ["a", "c"], "left")
    out = scored.agg(
        F.count(F.lit(1)).alias("n_paths2"),
        F.coalesce(F.sum(F.coalesce("cyc", F.lit(0))) / 3, F.lit(0.0))
        .cast("long").alias("n_cyclic"),
        F.coalesce(F.sum(F.coalesce("tra", F.lit(0))), F.lit(0))
        .cast("long").alias("n_transitive"),
    )
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    return out


# ------------------------------------------------------------------- HITS
def _l2_normalise(df: DataFrame, col: str, out: str) -> DataFrame:
    """Divide ``col`` by its L2 norm — the norm rides a 1-row broadcast
    cross join, never a driver action."""
    nrm = df.agg(F.sqrt(F.sum(F.col(col) * F.col(col))).alias("nrm"))
    return df.crossJoin(F.broadcast(nrm)).select(
        "id", (F.col(col) / F.col("nrm")).alias(out)
    )


def hits(
    spark,
    edges: DataFrame,
    max_iter: int = 10,
    ckpt: CheckpointManager | None = None,
    ckpt_every: int = 5,
) -> DataFrame:
    """Kleinberg's HITS (hubs & authorities) by synchronous power
    iteration on the DIRECTED weighted graph: a ← L2-normalised Aᵀh,
    h ← L2-normalised A·a.  Returns (id, hub, authority) for every
    vertex (no out-edges → hub 0; no in-edges → authority 0).

    Scale shape: per iteration two PageRank-shaped join+aggregate
    exchanges (gather over src for authorities, over dst for hubs),
    partial-aggregated map-side.  Iterations run UNNORMALISED — power
    iteration is scale-invariant, and a per-iteration L2 cross join
    would embed the previous iteration's plan twice (value + norm),
    blowing the lineage up exponentially.  Normalisation happens only
    at checkpoint barriers (every ``ckpt_every`` iterations, on the
    already-materialised table — one cheap cross join, no subtree
    duplication), which simultaneously bounds the unnormalised growth
    between barriers and truncates lineage.
    """
    if max_iter < 1:
        raise ValueError("max_iter must be positive")
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    e = edges.select("src", "dst", "weight").persist()
    verts = _vertices(e).persist()
    h = verts.select("id", F.lit(1.0).alias("hub"))
    a = None
    for t in range(1, max_iter + 1):
        a = (
            e.join(h.select(F.col("id").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("weight") * F.col("hub")).alias("authority"))
        )
        barrier = t % ckpt_every == 0 or t == max_iter
        if barrier:
            # materialise a BEFORE h is built on it: h's save then runs
            # one gather over the saved table instead of replaying the
            # whole inter-barrier chain a second time; normalising on
            # the saved table keeps the norm's cross join off the
            # iteration subtree (no exponential plan growth)
            a = _l2_normalise(ckpt.save(a, "hits_auth", t), "authority", "authority")
        h = (
            e.join(a.select(F.col("id").alias("dst"), "authority"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum(F.col("weight") * F.col("authority")).alias("hub"))
        )
        if barrier:
            h = _l2_normalise(ckpt.save(h, "hits_hub", t), "hub", "hub")
    out = (
        verts.join(h, "id", "left")
        .join(a, "id", "left")
        .select(
            "id",
            F.round(F.coalesce("hub", F.lit(0.0)), 6).alias("hub"),
            F.round(F.coalesce("authority", F.lit(0.0)), 6).alias("authority"),
        )
    )
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    e.unpersist()
    verts.unpersist()
    return out


def eigenvector_centrality(
    spark,
    edges: DataFrame,
    max_iter: int = 10,
    directed: bool = False,
    ckpt: CheckpointManager | None = None,
    ckpt_every: int = 5,
) -> DataFrame:
    """Principal-eigenvector centrality by power iteration:
    x ← A·x (w-weighted neighbour sum; undirected graphs are blindly
    symmetrised, so a self-loop contributes twice — the standard
    undirected-adjacency convention; directed graphs gather over
    IN-edges, x ← Aᵀx).  Returns (id, centrality), L2-normalised.

    Scale shape: one PageRank-shaped join+aggregate exchange per
    iteration; like :func:`hits`, iterations run unnormalised (scale
    invariance) and the L2 division happens at checkpoint barriers on
    the materialised table, keeping the plan linear in ``max_iter``.
    """
    if max_iter < 1:
        raise ValueError("max_iter must be positive")
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    e = edges.select("src", "dst", "weight")
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
    e = e.persist()
    verts = _vertices(e).persist()
    x = verts.select("id", F.lit(1.0).alias("centrality"))
    for t in range(1, max_iter + 1):
        x = (
            e.join(x.select(F.col("id").alias("src"), "centrality"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("weight") * F.col("centrality")).alias("centrality"))
        )
        if t % ckpt_every == 0 or t == max_iter:
            x = _l2_normalise(
                ckpt.save(x, "eig_x", t), "centrality", "centrality"
            )
    out = verts.join(x, "id", "left").select(
        "id", F.round(F.coalesce("centrality", F.lit(0.0)), 6).alias("centrality")
    )
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    e.unpersist()
    verts.unpersist()
    return out


# ------------------------------------------------------------------ walks
def _ares_key_u(seed, t):
    """md5-uniform in (0,1] keyed by (seed, walk_id, step, dst) — the
    SHARED A-Res randomness of :func:`random_walks` and
    :func:`node2vec_walks`.  One definition on purpose: the p=q=1
    hop-for-hop parity guarantee and both SQL oracle twins depend on
    this exact construction (md5 → first 8 hex chars → base-10 → +1 →
    /2^32), so any tweak must change every consumer at once."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(str(seed)),
                        F.col("walk_id").cast("string"),
                        F.lit(str(t)),
                        F.col("dst").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + 1.0
    ) / F.lit(4294967296.0)


def random_walks(
    spark,
    edges: DataFrame,
    walk_length: int = 3,
    seed: int = 42,
    directed: bool = True,
    ckpt: CheckpointManager | None = None,
    ckpt_every: int = 4,
) -> DataFrame:
    """Deterministic weight-proportional random walks, one per start
    vertex — the sampling primitive of DeepWalk/node2vec-style graph-
    embedding pipelines.  Returns (walk_id, step, vertex) with step 0 the
    start vertex; a walk stops early at a vertex with no out-edges.

    Randomness is a pure function of (seed, walk_id, step, candidate):
    u = md5-uniform in (0,1], and the next hop is the out-neighbour
    maximising u^(1/weight) (Efraimidis–Spirakis A-Res, so each neighbour
    is chosen with probability proportional to its edge weight).  Like
    the md5 samplers in operators/sampling.py this is retry-stable,
    append-stable, and reproducible in plain SQL — no ``rand()``.

    Scale shape: per step one equi-join of the frontier against the
    (src-partitioned) edge table plus one per-walk argmax window — the
    frontier has exactly one row per live walk, so each step's shuffle is
    O(walks + touched edges), never O(|E|); lineage is truncated every
    ``ckpt_every`` steps.
    """
    if walk_length < 1:
        raise ValueError("walk_length must be positive")
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    from pyspark.sql import Window

    if not directed:
        edges = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
    e = edges.select("src", "dst", "weight").persist()
    cur = _vertices(e).select(F.col("id").alias("walk_id"), F.col("id").alias("v"))
    out = cur.select("walk_id", F.lit(0).cast("long").alias("step"), F.col("v").alias("vertex"))
    w_pick = Window.partitionBy("walk_id").orderBy(F.desc("key"), F.asc("dst"))
    for t in range(1, walk_length + 1):
        cand = cur.join(e, cur.v == e.src).select("walk_id", "dst", "weight")
        u = _ares_key_u(seed, t)
        cand = cand.select("walk_id", "dst", F.pow(u, 1.0 / F.col("weight")).alias("key"))
        chosen = (
            cand.withColumn("rn", F.row_number().over(w_pick))
            .where(F.col("rn") == 1)
            .select("walk_id", F.col("dst").alias("v"))
        )
        if t % ckpt_every == 0 or t == walk_length:
            chosen = ckpt.save(chosen, "walk_frontier", t)
        out = out.unionByName(
            chosen.select("walk_id", F.lit(t).cast("long").alias("step"), F.col("v").alias("vertex"))
        )
        cur = chosen
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    e.unpersist()
    return out


def node2vec_walks(
    spark,
    edges: DataFrame,
    walk_length: int = 3,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
    directed: bool = True,
    ckpt: CheckpointManager | None = None,
    ckpt_every: int = 4,
) -> DataFrame:
    """Second-order biased walks (node2vec, Grover & Leskovec 2016), one
    per start vertex — returns (walk_id, step, vertex) like
    :func:`random_walks`, which this reproduces hop-for-hop at p=q=1.

    Each hop reweights the A-Res key by the node2vec bias α over the
    previous vertex ``t``: α=1/p when the candidate returns to ``t``,
    α=1 when the candidate is a neighbour of ``t`` (triangle step),
    α=1/q otherwise (exploration).  The first hop is unbiased (no
    previous vertex).  Randomness is the same md5 function of
    (seed, walk_id, step, candidate) as :func:`random_walks` —
    retry/append-stable and SQL-reproducible.

    Scale shape: per step the frontier (one row per live walk, now
    carrying ``prev``) joins the src-partitioned edge table, then the
    candidate set LEFT-joins the distinct neighbour set on
    (prev, candidate) to mark triangle steps — both equi-joins, so each
    step shuffles O(walks + touched edges); no per-vertex adjacency set
    is ever collected.
    """
    if walk_length < 1:
        raise ValueError("walk_length must be positive")
    if p <= 0 or q <= 0:
        raise ValueError("p and q must be positive")
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    from pyspark.sql import Window

    if not directed:
        edges = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
    e = edges.select("src", "dst", "weight").persist()
    # distinct neighbour pairs for the distance-1 test (prev -> candidate)
    nbr = e.select(F.col("src").alias("p_src"), F.col("dst").alias("p_dst")).distinct().persist()

    cur = _vertices(e).select(
        F.col("id").alias("walk_id"), F.col("id").alias("v"),
        F.lit(None).cast("long").alias("prev"),
    )
    out = cur.select("walk_id", F.lit(0).cast("long").alias("step"), F.col("v").alias("vertex"))
    w_pick = Window.partitionBy("walk_id").orderBy(F.desc("key"), F.asc("dst"))
    for t in range(1, walk_length + 1):
        cand = cur.join(e, cur.v == e.src).select("walk_id", "prev", "v", "dst", "weight")
        # plain equi-join: nbr is |E|-sized, never broadcast it
        cand = cand.join(
            nbr,
            (cand.prev == nbr.p_src) & (cand.dst == nbr.p_dst),
            "left",
        ).select("walk_id", "prev", "v", "dst", "weight",
                 F.col("p_src").isNotNull().alias("is_nbr"))
        alpha = (
            F.when(F.col("prev").isNull(), F.lit(1.0))
            .when(F.col("dst") == F.col("prev"), F.lit(1.0 / p))
            .when(F.col("is_nbr"), F.lit(1.0))
            .otherwise(F.lit(1.0 / q))
        )
        u = _ares_key_u(seed, t)
        cand = cand.select(
            "walk_id", "v", "dst",
            F.pow(u, 1.0 / (F.col("weight") * alpha)).alias("key"),
        )
        chosen = (
            cand.withColumn("rn", F.row_number().over(w_pick))
            .where(F.col("rn") == 1)
            .select("walk_id", F.col("dst").alias("v"), F.col("v").alias("prev"))
        )
        if t % ckpt_every == 0 or t == walk_length:
            chosen = ckpt.save(chosen, "n2v_frontier", t)
        out = out.unionByName(
            chosen.select("walk_id", F.lit(t).cast("long").alias("step"), F.col("v").alias("vertex"))
        )
        cur = chosen
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    e.unpersist()
    nbr.unpersist()
    return out


# -------------------------------------------------------------------- LPA
def label_propagation(
    spark,
    edges: DataFrame,
    max_iter: int = 10,
    ckpt: CheckpointManager | None = None,
    seed: int = 0,
    gate: str = "hash",
    early_stop: bool = True,
) -> DataFrame:
    """Weighted synchronous label propagation; returns (id, label).

    Each superstep: gather neighbour labels (weight-summed), adopt the
    arg-max (ties → smallest label).  Only half the vertices update per
    superstep — the standard guard against bipartite label oscillation:
    ``gate='hash'`` uses ``xxhash64(id, step, seed)`` parity (uncorrelated
    with structure); ``gate='id_parity'`` uses ``(id + step) % 2`` —
    fully reproducible in plain SQL, which the DuckDB oracle harness
    needs.  ``early_stop=False`` runs exactly ``max_iter`` supersteps
    (oracle comparability: a zero-change half-round is not a fixpoint
    proof, since the other parity class may still move).
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    sym = edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")).persist()
    labels = _vertices(edges).withColumn("label", F.col("id"))
    labels = ckpt.save(labels, "lpa_labels", 0)
    for step in range(1, max_iter + 1):
        # the parity gate is a pure function of (vertex id, step): filter
        # the gather INPUT to the open class — the ungated half keeps its
        # label anyway, so skipping its gather halves the dominant
        # join+aggregate shuffle with identical results
        def _gate(col):
            if gate == "id_parity":
                return F.pmod(col + F.lit(step), F.lit(2)) == 0
            return F.pmod(F.xxhash64(col, F.lit(step), F.lit(seed)), F.lit(2)) == 0

        nbr_labels = sym.where(_gate(F.col("src"))).join(
            labels.select(F.col("id").alias("dst"), F.col("label").alias("nbr_label")), "dst"
        )
        best = (
            nbr_labels.groupBy(F.col("src").alias("id"), F.col("nbr_label"))
            .agg(F.sum("weight").alias("w"))
            .groupBy("id")
            .agg(F.max_by("nbr_label", F.struct(F.col("w"), -F.col("nbr_label"))).alias("new_label"))
        )
        open_gate = _gate(F.col("id"))
        upd = labels.join(best, "id", "left").select(
            "id",
            F.when(F.col("new_label").isNotNull() & open_gate, F.col("new_label"))
            .otherwise(F.col("label"))
            .alias("label"),
        )
        new_labels = ckpt.save(upd, "lpa_labels", step)
        if early_stop:
            changed = (
                new_labels.withColumnRenamed("label", "nl")
                .join(labels, "id")
                .where(F.col("nl") != F.col("label"))
                .count()
            )
        else:
            changed = -1
        labels = new_labels
        ckpt.log(name="lpa", step=step, changed=int(changed))
        if changed == 0:
            break
    sym.unpersist()
    if own_ckpt and ckpt.path is None:
        labels = labels.localCheckpoint(eager=True)
        ckpt.close()
    return labels


def label_spreading(
    spark,
    edges: DataFrame,
    seeds: DataFrame,
    max_iter: int = 10,
    ckpt: CheckpointManager | None = None,
    seed: int = 0,
    gate: str = "hash",
    early_stop: bool = True,
) -> DataFrame:
    """Semi-supervised label spreading: ``seeds`` (id, label) are FIXED;
    every other vertex starts unlabeled (NULL) and adopts the
    weight-argmax label among its LABELED neighbours (ties → smallest
    label).  The same half-gated synchronous supersteps as
    :func:`label_propagation`; returns (id, label) — vertices that no
    label ever reaches stay NULL.

    This is the distributed form of seeded community assignment /
    node classification by propagation: |seeds| classes, O(diameter)
    rounds to cover a connected graph, per round one gather
    join+aggregate over the half-gated edge set.
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    ).persist()
    labels = (
        _vertices(edges)
        .join(seeds.select("id", F.col("label").cast("long")), "id", "left")
        .withColumn("is_seed", F.col("label").isNotNull())
    )
    labels = ckpt.save(labels, "lsp_labels", 0)
    for step in range(1, max_iter + 1):
        def _gate(col):
            if gate == "id_parity":
                return F.pmod(col + F.lit(step), F.lit(2)) == 0
            return F.pmod(F.xxhash64(col, F.lit(step), F.lit(seed)), F.lit(2)) == 0

        nbr_labels = sym.where(_gate(F.col("src"))).join(
            labels.where(F.col("label").isNotNull())
            .select(F.col("id").alias("dst"), F.col("label").alias("nbr_label")),
            "dst",
        )
        best = (
            nbr_labels.groupBy(F.col("src").alias("id"), F.col("nbr_label"))
            .agg(F.sum("weight").alias("w"))
            .groupBy("id")
            .agg(F.max_by("nbr_label", F.struct(F.col("w"), -F.col("nbr_label"))).alias("new_label"))
        )
        open_gate = _gate(F.col("id"))
        upd = labels.join(best, "id", "left").select(
            "id",
            F.when(F.col("is_seed"), F.col("label"))
            .when(F.col("new_label").isNotNull() & open_gate, F.col("new_label"))
            .otherwise(F.col("label"))
            .alias("label"),
            "is_seed",
        )
        new_labels = ckpt.save(upd, "lsp_labels", step)
        if early_stop:
            changed = (
                new_labels.withColumnRenamed("label", "nl")
                .join(labels.select("id", "label"), "id")
                .where(~F.col("nl").eqNullSafe(F.col("label")))
                .count()
            )
        else:
            changed = -1
        labels = new_labels
        ckpt.log(name="label_spreading", step=step, changed=int(changed))
        if changed == 0:
            # a zero-change HALF-round is not a fixpoint proof (the
            # closed parity class may still have pending moves) — verify
            # with one UNGATED pending check before stopping
            full_best = (
                sym.join(
                    labels.where(F.col("label").isNotNull())
                    .select(F.col("id").alias("dst"), F.col("label").alias("nbr_label")),
                    "dst",
                )
                .groupBy(F.col("src").alias("id"), F.col("nbr_label"))
                .agg(F.sum("weight").alias("w"))
                .groupBy("id")
                .agg(F.max_by("nbr_label", F.struct(F.col("w"), -F.col("nbr_label"))).alias("nl"))
            )
            pending = (
                labels.where(~F.col("is_seed"))
                .join(full_best, "id")
                .where(~F.col("nl").eqNullSafe(F.col("label")))
                .count()
            )
            if pending == 0:
                break
    sym.unpersist()
    out = labels.select("id", "label")
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    return out


# -------------------------------------------------------------- triangles
def oriented_edges(edges: DataFrame) -> DataFrame:
    """Orient each undirected edge from lower to higher (degree, id) —
    every triangle becomes exactly one directed wedge + closing edge."""
    und = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).where(F.col("a") != F.col("b")).distinct()
    deg = (
        und.select(F.col("a").alias("id")).unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    e = und.join(da, "a").join(db, "b")
    fwd = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return e.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
    )


def triangle_count(spark, edges: DataFrame) -> DataFrame:
    """Global triangle count: 1-row DataFrame (n_triangles)."""
    o = oriented_edges(edges).persist()
    wedges = o.alias("e1").join(
        o.alias("e2"), F.col("e1.v") == F.col("e2.u")
    ).select(F.col("e1.u").alias("u"), F.col("e1.v").alias("w_mid"), F.col("e2.v").alias("v"))
    tri = wedges.join(o.withColumnRenamed("u", "tu").withColumnRenamed("v", "tv"),
                      (F.col("u") == F.col("tu")) & (F.col("v") == F.col("tv")))
    out = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    # 1-row result: materialise it so the oriented-edge cache can be
    # released now instead of leaking for the session lifetime
    out = out.localCheckpoint(eager=True)
    o.unpersist()
    return out


def clustering_coefficient(spark, edges: DataFrame) -> DataFrame:
    """Per-vertex local clustering coefficient over the simple undirected
    graph: ``lcc(v) = 2·T(v) / (deg(v)·(deg(v)−1))``, T(v) = triangles
    through v; vertices of simple-degree < 2 score 0.  Works for numeric
    or string vertex ids (only equality/order comparisons are used).
    Returns (id, n_triangles, degree, lcc).

    Scale: one cached pass builds the deduplicated simple edge table that
    feeds degrees AND the degree-orientation, so the scan+distinct runs
    once; the only heavy shuffle is the oriented wedge self-join, bounded
    by Σ deg_out² on the DAG (max out-degree ≈ √m) exactly as in
    :func:`triangle_count`.
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("a").alias("id")).unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("degree").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("degree").alias("deg_b"))
    fwd = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    o = (
        und.join(da, "a").join(db, "b")
        .select(
            F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
        .persist()
    )
    wedges = o.alias("e1").join(o.alias("e2"), F.col("e1.v") == F.col("e2.u")).select(
        F.col("e1.u").alias("x"), F.col("e1.v").alias("y"), F.col("e2.v").alias("z")
    )
    tri = wedges.join(
        o.select(F.col("u").alias("x2"), F.col("v").alias("z2")),
        (F.col("x") == F.col("x2")) & (F.col("z") == F.col("z2")),
    ).select("x", "y", "z")
    counts = (
        tri.select(F.col("x").alias("id"))
        .unionByName(tri.select(F.col("y").alias("id")))
        .unionByName(tri.select(F.col("z").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    out = (
        _vertices(edges)
        .join(deg, "id", "left")
        .join(counts, "id", "left")
        .na.fill({"degree": 0, "n_triangles": 0})
        .select(
            "id",
            "n_triangles",
            "degree",
            F.when(
                F.col("degree") >= 2,
                2.0 * F.col("n_triangles") / (F.col("degree") * (F.col("degree") - F.lit(1.0))),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )
    # vertex-sized result: barrier it so the two caches can be released
    # now instead of leaking for the session lifetime (same convention as
    # the other kernels)
    out = out.localCheckpoint(eager=True)
    und.unpersist()
    o.unpersist()
    return out


def degree_assortativity(spark, edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of the simple-graph degrees at either end of each edge,
    over the symmetrised edge list (each undirected edge contributes both
    orientations, the standard convention).  Returns a 1-row DataFrame
    (assortativity — NULL for degree-regular graphs, where the
    correlation is undefined).

    Scale: one distinct + one degree aggregate + two co-keyed joins into a
    single global ``corr`` reduction — no quadratic stage, no Python.
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b"))).persist()
    deg = (
        sym.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    )
    paired = (
        sym.join(deg.select(F.col("id").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("deg").alias("db")), "b")
    )
    # explicit Pearson ratio instead of F.corr: under ANSI mode (Spark 4
    # default) corr THROWS on zero variance (degree-regular graphs); the
    # guard returns NULL there, matching DuckDB/NumPy corr conventions
    stats = paired.agg(
        F.covar_pop(F.col("da").cast("double"), F.col("db").cast("double")).alias("cov"),
        F.stddev_pop(F.col("da").cast("double")).alias("sa"),
        F.stddev_pop(F.col("db").cast("double")).alias("sb"),
    )
    out = stats.select(
        F.when(
            (F.col("sa") > 0) & (F.col("sb") > 0),
            F.col("cov") / (F.col("sa") * F.col("sb")),
        ).alias("assortativity")
    ).localCheckpoint(eager=True)
    sym.unpersist()
    return out


def k_core(
    spark,
    edges: DataFrame,
    k: int,
    rounds: int | None = None,
    max_rounds: int = 50,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """k-core decomposition membership: iteratively peel vertices whose
    simple-graph degree is < k until a fixpoint.  Returns (id, core_deg)
    for the vertices of the k-core, with their degree inside the core.

    ``rounds``: run EXACTLY that many synchronous peel rounds instead of
    detecting the fixpoint — the oracle-comparability mode (a fixed-round
    unrolled SQL twin must see identical intermediate states; cf. the
    ``early_stop=False`` convention of :func:`label_propagation`).

    Scale: each round is one degree aggregate + two semi-joins over the
    surviving edge set, with per-round lineage truncation; rounds needed
    = peel depth (≤ degeneracy ordering depth), independent of diameter.
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    e = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    e = ckpt.save(e, "kcore_edges", 0)
    n_rounds = rounds if rounds is not None else max_rounds
    prev_cnt = None
    for r in range(1, n_rounds + 1):
        ends = e.select(F.col("a").alias("id")).unionByName(e.select(F.col("b").alias("id")))
        keep = (
            ends.groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") >= k)
            .select("id")
        )
        nxt = (
            e.join(keep.withColumnRenamed("id", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("id", "b"), "b", "left_semi")
            .select("a", "b")
        )
        from pyspark.sql import Observation

        obs = Observation()
        nxt = nxt.observe(obs, F.count(F.lit(1)).alias("cnt"))
        e = ckpt.save(nxt, "kcore_edges", r)
        cnt = int(obs.get["cnt"])
        ckpt.log(name="kcore", step=r, edges=cnt)
        if rounds is None and cnt == prev_cnt:
            break
        prev_cnt = cnt
    ends = e.select(F.col("a").alias("id")).unionByName(e.select(F.col("b").alias("id")))
    out = ends.groupBy("id").agg(F.count(F.lit(1)).alias("core_deg"))
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    return out


def _sym_simple(edges: DataFrame) -> DataFrame:
    """Symmetrised simple edge list (both orientations of each distinct
    undirected non-loop edge)."""
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    return und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))


def khop_counts(
    spark,
    edges: DataFrame,
    k: int = 2,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """EXACT distinct-neighbourhood size within ≤ ``k`` hops of every
    vertex (excluding the vertex itself), over the symmetrised simple
    graph.  Returns (id, n_reachable).

    Scale warning — by design: the materialised reach set is
    Σ_v |ball_k(v)|, which explodes on low-diameter graphs (a social
    graph's 3-ball is most of the graph).  This operator is the exact
    small-k / truth-set path; at 100 TB use :func:`neighborhood_hll`,
    whose state is one fixed-size sketch per vertex instead.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    sym = _sym_simple(edges).persist()
    reach = sym.select(F.col("a").alias("id"), F.col("b").alias("v"))
    reach = ckpt.save(reach, "khop_reach", 1)
    for d in range(2, k + 1):
        # frontier-free closure step: (ball ⋈ adjacency) ∪ ball, dedup —
        # simple and exact; per-round lineage truncation via the ckpt
        nxt = (
            reach.join(sym.select(F.col("a").alias("v"), F.col("b").alias("w")), "v")
            .select("id", F.col("w").alias("v"))
            .where(F.col("v") != F.col("id"))
            .unionByName(reach)
            .distinct()
        )
        reach = ckpt.save(nxt, "khop_reach", d)
    out = reach.groupBy("id").agg(F.count(F.lit(1)).alias("n_reachable"))
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    sym.unpersist()
    return out


def _truncated_balls(sym, verts, max_dist, ckpt, tag):
    """All-sources frontier BFS to depth ``max_dist`` over a symmetrised
    simple edge list: returns the (id, v, d) ball table, d=0 rows
    included.  Per ring one frontier⋈adjacency join + one anti-join vs
    the seen set; per-ring lineage truncation through the checkpoint."""
    seen = verts.select("id", F.col("id").alias("v"), F.lit(0).cast("int").alias("d"))
    frontier = seen
    for d in range(1, max_dist + 1):
        nxt = (
            frontier.join(sym.select(F.col("a").alias("v"), F.col("b").alias("w")), "v")
            .select("id", F.col("w").alias("v"))
            .distinct()
            .join(seen.select("id", "v"), ["id", "v"], "left_anti")
            .withColumn("d", F.lit(d).cast("int"))
        )
        nxt = ckpt.save(nxt, f"{tag}_frontier", d)
        seen = ckpt.save(seen.unionByName(nxt), f"{tag}_seen", d)
        frontier = nxt
    return seen


def harmonic_centrality(
    spark,
    edges: DataFrame,
    max_dist: int = 2,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """EXACT truncated harmonic centrality over the symmetrised simple
    graph: H(v) = Σ_{u ≠ v, d(v,u) ≤ max_dist} 1/d(v,u).  Returns
    (id, n_reachable, harmonic) for every vertex (0s when nothing is
    within range).  The truncated form is the standard big-graph variant
    (Boldi & Vigna, "Axioms for centrality"): it needs only the ≤k-ball,
    not full shortest paths.

    Scale shape: frontier BFS — per ring one frontier⋈adjacency join and
    one anti-join against the seen set, so each edge is traversed once
    per ring it borders, and the state is Σ_v |ball_k(v)| (id, v, d)
    triples.  Like :func:`khop_counts` this is the exact small-k path;
    at 100 TB estimate with :func:`neighborhood_hll` ball sizes instead
    (one fixed-size sketch per vertex, harmonic ≈ Σ_d (|B_d|-|B_{d-1}|)/d).
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    sym = _sym_simple(edges).persist()
    verts = sym.select(F.col("a").alias("id")).distinct()
    seen = _truncated_balls(sym, verts, max_dist, ckpt, "harmonic")
    ball = seen.where(F.col("d") > 0)
    agg = ball.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_reachable"),
        F.round(F.sum(1.0 / F.col("d")), 6).alias("harmonic"),
    )
    out = verts.join(agg, "id", "left").select(
        "id",
        F.coalesce("n_reachable", F.lit(0)).cast("long").alias("n_reachable"),
        F.coalesce("harmonic", F.lit(0.0)).alias("harmonic"),
    )
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    sym.unpersist()
    return out


def neighborhood_hll(
    spark,
    edges: DataFrame,
    max_dist: int = 3,
    lg_config_k: int = 12,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013, public): per-vertex APPROXIMATE
    ball sizes at every distance 1..``max_dist`` via mergeable
    HyperLogLog sketches — the neighbourhood function N(v, d).  Returns
    (id, dist, n_reachable_est) with the vertex itself excluded, matching
    :func:`khop_counts` semantics.

    This is the 100-TB shape the exact closure can't reach: per-vertex
    state is ONE fixed-size HLL sketch (2^lg_config_k registers), and a
    superstep is one gather join + ``hll_union_agg`` — identical shuffle
    pattern to PageRank, state size independent of ball size.  Sketches
    are exact for small counts (datasketches HLL early modes), ±~1.6%
    at lg_config_k=12 beyond.  All JVM-side (`hll_sketch_agg` /
    `hll_union_agg` / `hll_union`), no Python in the loop.
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    sym = _sym_simple(edges).persist()
    verts = sym.select(F.col("a").alias("id")).distinct()
    lgk = F.lit(lg_config_k)
    cur = verts.groupBy("id").agg(F.hll_sketch_agg("id", lgk).alias("sk"))
    cur = ckpt.save(cur, "hyperball_sk", 0)
    outs = []
    for d in range(1, max_dist + 1):
        gathered = (
            sym.join(cur.select(F.col("id").alias("a"), "sk"), "a")
            .groupBy(F.col("b").alias("id"))
            .agg(F.hll_union_agg("sk").alias("nsk"))
        )
        cur = (
            cur.join(gathered, "id", "left")
            .select(
                "id",
                F.when(
                    F.col("nsk").isNotNull(), F.hll_union("sk", "nsk")
                ).otherwise(F.col("sk")).alias("sk"),
            )
        )
        cur = ckpt.save(cur, "hyperball_sk", d)
        # ball estimate minus 1: the seed sketch counts the vertex itself
        outs.append(
            cur.select(
                "id",
                F.lit(d).alias("dist"),
                (F.hll_sketch_estimate("sk") - F.lit(1)).cast("long").alias("n_reachable_est"),
            )
        )
        ckpt.log(name="hyperball", step=d)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    sym.unpersist()
    return out


def adamic_adar(
    spark,
    edges: DataFrame,
    max_center_degree: int | None = 100_000,
    min_common: int = 1,
) -> DataFrame:
    """Adamic–Adar link prediction over the simple undirected graph:
    for each NON-adjacent pair (src < dst) with ≥ ``min_common`` common
    neighbours, AA = Σ_{w ∈ N(src)∩N(dst)} 1/ln(deg(w)) — the classic
    who-should-be-linked score (Adamic & Adar 2003).  Returns
    (src, dst, n_common, aa), aa rounded to 1e-6.

    Scale shape: wedge enumeration around each common neighbour — one
    self-join of the (center, spoke) adjacency on center, bounded by
    Σ_w deg(w)², then a hash aggregate per candidate pair and an
    anti-join against the existing edge set.  ``max_center_degree``
    drops super-hub centers (a tool vertex adjacent to every
    conversation would alone contribute |N|² wedge rows for a
    per-pair score of only 1/ln(huge)); ``None`` disables the cap.
    """
    if min_common < 1:
        raise ValueError("min_common must be >= 1")
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    adj = und.select(F.col("a").alias("w"), F.col("b").alias("x")).unionByName(
        und.select(F.col("b").alias("w"), F.col("a").alias("x"))
    )
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).alias("deg"))
    centers = adj.join(deg, "w")
    if max_center_degree is not None:
        centers = centers.where(F.col("deg") <= max_center_degree)
    centers = centers.select("w", "x", (1.0 / F.log("deg")).alias("cw"))
    wedges = (
        centers.alias("l")
        .join(centers.alias("r"), "w")
        .where(F.col("l.x") < F.col("r.x"))
        .select(F.col("l.x").alias("src"), F.col("r.x").alias("dst"), F.col("l.cw").alias("cw"))
    )
    scores = wedges.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n_common"), F.round(F.sum("cw"), 6).alias("aa")
    )
    out = (
        scores.join(
            und.select(F.col("a").alias("src"), F.col("b").alias("dst")),
            ["src", "dst"],
            "left_anti",
        )
        .where(F.col("n_common") >= min_common)
    )
    und.unpersist()
    return out


def jaccard_coefficient(
    spark,
    edges: DataFrame,
    max_center_degree: int | None = 100_000,
    min_common: int = 1,
) -> DataFrame:
    """Jaccard link prediction over the simple undirected graph: for
    each NON-adjacent pair (src < dst) with ≥ ``min_common`` common
    neighbours, JC = |N(src)∩N(dst)| / |N(src)∪N(dst)| (Liben-Nowell &
    Kleinberg 2007).  Returns (src, dst, n_common, jc), jc rounded to
    1e-6.

    Same wedge-enumeration shape as :func:`adamic_adar` — one self-join
    of the (center, spoke) adjacency bounded by Σ_w deg(w)², a hash
    aggregate per candidate pair, then a broadcast-friendly degree
    attach for the union size |N(u)|+|N(v)|-common and an anti-join
    against existing edges.  ``max_center_degree`` drops super-hub
    centers (same skew guard, same rationale).
    """
    if min_common < 1:
        raise ValueError("min_common must be >= 1")
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    adj = und.select(F.col("a").alias("w"), F.col("b").alias("x")).unionByName(
        und.select(F.col("b").alias("w"), F.col("a").alias("x"))
    )
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).alias("deg")).persist()
    centers = adj.join(deg, "w")
    if max_center_degree is not None:
        centers = centers.where(F.col("deg") <= max_center_degree)
    centers = centers.select("w", "x")
    wedges = (
        centers.alias("l")
        .join(centers.alias("r"), "w")
        .where(F.col("l.x") < F.col("r.x"))
        .select(F.col("l.x").alias("src"), F.col("r.x").alias("dst"))
    )
    common = wedges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n_common"))
    dsrc = deg.select(F.col("w").alias("src"), F.col("deg").alias("_ds"))
    ddst = deg.select(F.col("w").alias("dst"), F.col("deg").alias("_dd"))
    scored = (
        common.join(dsrc, "src")
        .join(ddst, "dst")
        .select(
            "src", "dst", "n_common",
            F.round(
                F.col("n_common") / (F.col("_ds") + F.col("_dd") - F.col("n_common")), 6
            ).alias("jc"),
        )
    )
    out = (
        scored.join(
            und.select(F.col("a").alias("src"), F.col("b").alias("dst")),
            ["src", "dst"],
            "left_anti",
        )
        .where(F.col("n_common") >= min_common)
    )
    und.unpersist()
    deg.unpersist()
    return out


def triangles_per_vertex(spark, edges: DataFrame) -> DataFrame:
    """Per-vertex triangle participation counts (id, n_triangles)."""
    o = oriented_edges(edges)
    wedges = o.alias("e1").join(o.alias("e2"), F.col("e1.v") == F.col("e2.u")).select(
        F.col("e1.u").alias("x"), F.col("e1.v").alias("y"), F.col("e2.v").alias("z")
    )
    tri = wedges.join(
        o.select(F.col("u").alias("x2"), F.col("v").alias("z2")),
        (F.col("x") == F.col("x2")) & (F.col("z") == F.col("z2")),
    ).select("x", "y", "z")
    counts = (
        tri.select(F.col("x").alias("id"))
        .unionByName(tri.select(F.col("y").alias("id")))
        .unionByName(tri.select(F.col("z").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    verts = _vertices(edges)
    return verts.join(counts, "id", "left").na.fill({"n_triangles": 0})


# ------------------------------------------------------- centrality (r2)
def closeness_centrality(
    spark,
    edges: DataFrame,
    max_dist: int = 2,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """EXACT truncated closeness centrality over the symmetrised simple
    graph: for the ≤``max_dist`` ball of each vertex, the
    Wasserman–Faust composite ``C(v) = (r_v/(n-1)) · (r_v/S_v)`` where
    ``r_v`` is the number of vertices reached and ``S_v`` the sum of
    their distances — the form that stays comparable across disconnected
    or truncated neighbourhoods (plain ``1/S_v`` closeness rewards
    reaching *fewer* vertices).  Returns
    (id, n_reachable, sum_dist, closeness) for every vertex.

    Same frontier-BFS scale shape as :func:`harmonic_centrality`: per
    ring one frontier⋈adjacency join + one anti-join vs the seen set;
    the exact small-``max_dist`` path (reference has no centrality
    beyond the partition object — this is a north-rule link-graph op).
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    sym = _sym_simple(edges).persist()
    verts = sym.select(F.col("a").alias("id")).distinct()
    n = verts.count()
    seen = verts.select("id", F.col("id").alias("v"), F.lit(0).cast("int").alias("d"))
    frontier = seen
    for d in range(1, max_dist + 1):
        nxt = (
            frontier.join(sym.select(F.col("a").alias("v"), F.col("b").alias("w")), "v")
            .select("id", F.col("w").alias("v"))
            .distinct()
            .join(seen.select("id", "v"), ["id", "v"], "left_anti")
            .withColumn("d", F.lit(d).cast("int"))
        )
        nxt = ckpt.save(nxt, "closeness_frontier", d)
        seen = ckpt.save(seen.unionByName(nxt), "closeness_seen", d)
        frontier = nxt
    ball = seen.where(F.col("d") > 0)
    agg = ball.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_reachable"),
        F.sum(F.col("d").cast("double")).alias("sum_dist"),
    )
    out = verts.join(agg, "id", "left").select(
        "id",
        F.coalesce("n_reachable", F.lit(0)).cast("long").alias("n_reachable"),
        F.coalesce("sum_dist", F.lit(0.0)).alias("sum_dist"),
        F.round(
            F.when(
                F.col("sum_dist") > 0,
                (F.col("n_reachable") / F.lit(float(max(n - 1, 1))))
                * (F.col("n_reachable") / F.col("sum_dist")),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("closeness"),
    )
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    sym.unpersist()
    return out


def betweenness_centrality(
    spark,
    edges: DataFrame,
    max_dist: int = 3,
    n_sources: int | None = None,
    seed: int = 42,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Truncated (bounded-distance) betweenness centrality via a
    distributed Brandes accumulation (Brandes 2001; bounded-distance
    variant per Borgatti–Everett; the sampled-source pivot estimator is
    Brandes & Pich 2007).  Only shortest paths of length ≤ ``max_dist``
    contribute — the standard big-graph truncation (exact betweenness
    needs all-pairs paths, quadratic state at 100 TB).

    Exact over ALL sources by default.  ``n_sources=k`` keeps the k
    sources with the smallest md5(seed, id) — deterministic and
    SQL-reproducible, never ``rand()`` — and scales every accumulated
    dependency by n/k, the unbiased estimator.

    Scale shape — forward: one multi-source BFS ring at a time, state
    keyed (source, vertex) with shortest-path counts ``sigma``; per ring
    one frontier⋈adjacency join, one (s, v) sum-aggregate (map-side
    combinable) and one anti-join vs the seen set.  Backward: Brandes
    dependencies ``delta`` accumulate ring-by-ring inward; per ring one
    join between consecutive rings through the adjacency.  Total state
    is Σ_s |ball_max_dist(s)| — bounded by the source sample, never
    all-pairs.  Per-ring lineage truncation via ``ckpt.save``.
    Returns (id, betweenness) for every vertex (undirected halving).
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    sym = _sym_simple(edges).persist()
    verts = sym.select(F.col("a").alias("id")).distinct()
    if n_sources is None:
        sources = verts.select(F.col("id").alias("s"))
        scale = 1.0
    else:
        n_total = verts.count()
        k = min(int(n_sources), n_total)
        pr = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(str(seed)), F.col("id").cast("string"))), 1, 8
            ),
            16, 10,
        ).cast("long")
        sources = (
            verts.withColumn("_p", pr).orderBy("_p", "id").limit(k)
            .select(F.col("id").alias("s"))
        )
        scale = float(n_total) / float(k)
    lvl = sources.select(
        "s", F.col("s").alias("v"), F.lit(1.0).alias("sigma")
    )
    seen = ckpt.save(lvl, "btw_seen", 0)
    # every ring is re-read by the backward pass, so each gets its own
    # checkpoint tag — the manager's step-pruning (keeps the last 3 steps
    # of a tag) must never collect an outer ring while deltas accumulate
    levels = [ckpt.save(lvl, "btw_lvl_0", 0)]
    frontier = levels[0]
    for d in range(1, max_dist + 1):
        cand = (
            frontier.join(sym.select(F.col("a").alias("v"), F.col("b").alias("w")), "v")
            .groupBy("s", F.col("w").alias("v"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(seen.select("s", "v"), ["s", "v"], "left_anti")
        )
        cand = ckpt.save(cand, f"btw_lvl_{d}", d)
        levels.append(cand)
        seen = ckpt.save(seen.unionByName(cand.select("s", "v", "sigma")), "btw_seen", d)
        frontier = cand
    # backward: deepest ring has delta 0; accumulate inward one ring at a time
    delta = levels[max_dist].select("s", "v", F.lit(0.0).alias("delta"))
    per_level_deltas = []
    for d in range(max_dist - 1, 0, -1):
        down = (
            levels[d + 1].select("s", F.col("v").alias("w"), F.col("sigma").alias("sigma_w"))
            .join(
                delta.select("s", F.col("v").alias("w"), "delta"),
                ["s", "w"], "left",
            )
            .na.fill({"delta": 0.0})
        )
        contrib = (
            levels[d].select("s", "v", "sigma")
            .join(sym.select(F.col("a").alias("v"), F.col("b").alias("w")), "v")
            .join(down, ["s", "w"])
            .groupBy("s", "v")
            .agg(
                F.sum(F.col("sigma") / F.col("sigma_w") * (F.lit(1.0) + F.col("delta"))).alias(
                    "delta"
                )
            )
        )
        delta = ckpt.save(contrib, "btw_delta", d)
        per_level_deltas.append(delta)
    acc = None
    for dfl in per_level_deltas:
        acc = dfl if acc is None else acc.unionByName(dfl)
    if acc is None:
        bt = verts.select("id", F.lit(0.0).alias("betweenness"))
    else:
        sums = acc.groupBy(F.col("v").alias("id")).agg(F.sum("delta").alias("bt"))
        bt = verts.join(sums, "id", "left").select(
            "id",
            F.round(
                F.coalesce(F.col("bt"), F.lit(0.0)) * F.lit(scale / 2.0), 6
            ).alias("betweenness"),
        )
    if own_ckpt and ckpt.path is None:
        bt = bt.localCheckpoint(eager=True)
        ckpt.close()
    sym.unpersist()
    return bt


def greedy_coloring(
    spark,
    edges: DataFrame,
    seed: int = 42,
    rounds: int | None = None,
    max_rounds: int = 100,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Jones–Plassmann greedy graph colouring with DETERMINISTIC md5
    priorities (the same total order as
    :func:`maximal_independent_set`): each round, every uncoloured
    vertex whose (priority, id) beats all uncoloured neighbours takes
    the smallest colour absent from its already-coloured neighbourhood
    (the mex).  Round winners form an independent set, so their mex
    choices never conflict — the colouring is proper by construction,
    and uses at most Δ+1 colours.  Returns (id, color, round_assigned).

    ``rounds=k`` runs exactly k rounds and returns the coloured prefix
    (oracle-comparability mode, as in MIS / k-truss / densest-subgraph).

    Scale shape: per round one neighbour-min aggregate over the ACTIVE
    edge set (winner election), one colour gather over winners' FULL
    adjacency (collect_set of neighbour colours, bounded by degree; the
    mex is pure array arithmetic, no Python), and two semi/anti joins;
    the active graph shrinks every round exactly as MIS does —
    O(log n / p) rounds in expectation.
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    e = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    full_sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    ).persist()
    pr = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), F.col("id").cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    av = (
        e.select(F.col("a").alias("id"))
        .unionByName(e.select(F.col("b").alias("id")))
        .distinct()
        .withColumn("p", pr)
    )
    av = ckpt.save(av, "color_active", 0)
    ae = ckpt.save(e, "color_edges", 0)
    colored = None  # (id, color, round_assigned)
    n_rounds = rounds if rounds is not None else max_rounds
    for r in range(1, n_rounds + 1):
        asym = ae.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            ae.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        nbp = (
            asym.join(av.select(F.col("id").alias("v"), F.col("p").alias("pv")), "v")
            .groupBy(F.col("u").alias("id"))
            .agg(F.min(F.struct(F.col("pv"), F.col("v"))).alias("nb"))
        )
        win = (
            av.join(nbp, "id", "left")
            .where(F.col("nb").isNull() | (F.struct(F.col("p"), F.col("id")) < F.col("nb")))
            .select("id")
        )
        if colored is None:
            newc = win.select("id", F.lit(0).cast("int").alias("color"))
        else:
            csets = (
                full_sym.join(win.withColumnRenamed("id", "u"), "u", "left_semi")
                .join(
                    colored.select(F.col("id").alias("v"), "color"), "v"
                )
                .groupBy(F.col("u").alias("id"))
                .agg(F.collect_set("color").alias("cset"))
            )
            mex = F.array_min(
                F.array_except(
                    F.sequence(F.lit(0), F.size("cset")), F.col("cset")
                )
            )
            newc = (
                win.join(csets, "id", "left")
                .select(
                    "id",
                    F.coalesce(mex, F.lit(0)).cast("int").alias("color"),
                )
            )
        newc = ckpt.save(
            newc.withColumn("round_assigned", F.lit(r).cast("long")), "color_new", r
        )
        colored = newc if colored is None else colored.unionByName(newc)
        colored = ckpt.save(colored, "color_all", r)
        av = ckpt.save(av.join(win, "id", "left_anti"), "color_active", r)
        keep = av.select("id")
        ae = ckpt.save(
            ae.join(keep.withColumnRenamed("id", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("id", "b"), "b", "left_semi"),
            "color_edges", r,
        )
        if rounds is None and av.count() == 0:
            break
    out = colored if colored is not None else spark.createDataFrame(
        [], "id long, color int, round_assigned long"
    )
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    full_sym.unpersist()
    return out


def rich_club(spark, edges: DataFrame, ks: list[int] | None = None) -> DataFrame:
    """Rich-club coefficient φ(k) of the undirected simple graph for each
    degree threshold in ``ks`` (Zhou & Mondragón 2004): among the N_k
    vertices of degree > k, φ(k) = 2·E_k / (N_k·(N_k−1)) where E_k counts
    edges with BOTH endpoints in the club.  φ rising with k = hubs wire
    preferentially to each other (the classic link-graph core signal).

    One distinct-edge pass builds degrees; the threshold sweep is an
    array-explode over the |ks|-literal list (≤ a few dozen rows of fan-
    out per edge/vertex), each side one map-side-combinable aggregate —
    no per-k job, no driver loop.  Output: (k, n_nodes, n_edges, phi).
    """
    ks = sorted(ks or [1, 2, 4, 8, 16, 32])
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("a").alias("id")).unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
    )
    karr = F.array(*[F.lit(int(k)) for k in ks])
    nodes_k = (
        deg.select(F.explode(F.filter(karr, lambda k: F.col("deg") > k)).alias("k"))
        .groupBy("k").agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    lim = F.least("deg_a", "deg_b")
    edges_k = (
        und.join(da, "a").join(db, "b")
        .select(F.explode(F.filter(karr, lambda k: lim > k)).alias("k"))
        .groupBy("k").agg(F.count(F.lit(1)).alias("n_edges"))
    )
    base = spark.createDataFrame([(int(k),) for k in ks], "k int")
    out = (
        base.join(nodes_k, "k", "left").join(edges_k, "k", "left")
        .na.fill({"n_nodes": 0, "n_edges": 0})
        .select(
            "k",
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.round(
                F.when(
                    F.col("n_nodes") > 1,
                    2.0 * F.col("n_edges")
                    / (F.col("n_nodes").cast("double") * (F.col("n_nodes") - 1)),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("phi"),
        )
    )
    out = out.localCheckpoint(eager=True)
    und.unpersist()
    return out


def vertex_features(
    spark,
    edges: DataFrame,
    two_hop: bool = False,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Per-vertex structural feature table for link-prediction / GNN
    training sets: ``(id, degree, strength, n_triangles, lcc
    [, n_2hop])`` — the features every tabular graph baseline starts
    from, assembled in ONE plan instead of three ad-hoc scripts.

    Composition of audited pieces: :func:`~.edges.degrees` (weighted
    strength, self-loops counted twice), :func:`clustering_coefficient`
    (which already materialises per-vertex triangle counts and the
    simple degree its lcc uses), optionally :func:`khop_counts` at k=2.
    Joins are id-equi-joins of |V|-row tables — cheap against any edge
    pass.  Note ``degree`` here is the MULTI-edge degree (parallel
    edges and loops counted, the `degrees` contract); ``lcc`` is over
    the simple graph (its own ``degree`` column is dropped to avoid the
    collision).
    """
    from .edges import degrees as _degrees

    deg = _degrees(edges, directed=False)
    cc = clustering_coefficient(spark, edges).select("id", "n_triangles", "lcc")
    out = deg.join(cc, "id", "left").na.fill({"n_triangles": 0, "lcc": 0.0})
    if two_hop:
        kh = khop_counts(spark, edges, k=2, ckpt=ckpt).select(
            "id", F.col("n_reachable").alias("n_2hop")
        )
        out = out.join(kh, "id", "left").na.fill({"n_2hop": 0})
    return out


def _bfs_far(spark, sym, start_id, max_depth, ckpt, tag):
    """Single-source BFS over the cached symmetric simple edge table:
    returns (farthest vertex, its distance) with deterministic (max d,
    min id) tie-break.  Per ring ONE frontier⋈adjacency join + one
    anti-join vs the seen set (the harmonic_centrality shape, single
    source so state is |component| rows)."""
    seen = spark.range(1).select(
        F.lit(start_id).cast("long").alias("v"), F.lit(0).cast("int").alias("d")
    )
    frontier = seen
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(sym.select(F.col("a").alias("v"), F.col("b").alias("w")), "v")
            .select(F.col("w").alias("v"))
            .distinct()
            .join(seen.select("v"), "v", "left_anti")
            .withColumn("d", F.lit(d).cast("int"))
        )
        nxt = ckpt.save(nxt, f"bfs_{tag}_frontier", d)
        if nxt.limit(1).count() == 0:
            break
        seen = ckpt.save(seen.unionByName(nxt), f"bfs_{tag}_seen", d)
        frontier = nxt
    far = seen.agg(
        F.max_by(F.struct(F.col("v"), F.col("d")), F.struct(F.col("d"), -F.col("v"))).alias("f")
    ).first()["f"]
    return int(far["v"]), int(far["d"])


def diameter_approx(
    spark,
    edges: DataFrame,
    max_depth: int = 16,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Double-sweep diameter lower bound (Magnien, Latapy & Habib 2009 —
    the standard cheap diameter estimate, usually tight on real graphs):
    BFS from the max-degree vertex to its farthest reachable vertex u,
    then BFS from u; the second eccentricity is the bound.  All
    tie-breaks deterministic (max degree then min id; max distance then
    min id), so the run — and its DuckDB twin — is reproducible.

    Returns one row: ``(start_id, sweep1_end, sweep1_dist, sweep2_end,
    diameter_lb)``.  Truncated at ``max_depth`` rings (each ring is one
    frontier join; state is one component's vertex set, never all-pairs).
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    sym = _sym_simple(edges).persist()
    deg = sym.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    start = deg.agg(
        F.max_by(F.col("id"), F.struct(F.col("deg"), -F.col("id"))).alias("s")
    ).first()["s"]
    u, d1 = _bfs_far(spark, sym, int(start), max_depth, ckpt, "sweep1")
    w, d2 = _bfs_far(spark, sym, u, max_depth, ckpt, "sweep2")
    import pandas as pd

    out = spark.createDataFrame(
        pd.DataFrame(
            {
                "start_id": [int(start)], "sweep1_end": [u], "sweep1_dist": [d1],
                "sweep2_end": [w], "diameter_lb": [d2],
            }
        )
    )
    sym.unpersist()
    if own_ckpt and ckpt.path is None:
        ckpt.close()
    return out


def wl_refinement(
    spark,
    edges: DataFrame,
    rounds: int = 2,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Weisfeiler–Lehman color refinement over the symmetrised simple
    graph: every vertex starts with the uniform color and each round
    re-colors it with ``md5(own_color || '|' || sorted neighbour
    colors)``.  The stable coloring is the classic graph-isomorphism
    invariant and the vertex featurizer behind WL graph kernels
    (Shervashidze et al. 2011) and GNN expressiveness tests; round 1
    reproduces degree classes, round k distinguishes k-hop structure.

    Returns ``(id, color)`` — color a 32-hex md5 string, identical
    across engines (the signature is built from lexicographically
    sorted neighbour colors, so it is visit-order free and
    parallelism-independent).

    Scale shape: per round one gather join + one hash aggregate —
    PageRank-shaped shuffle, |V|-row state, per-round lineage
    truncation via the checkpoint.  The sorted-concat signature is
    O(deg) per vertex; on hub-heavy graphs cap it the hub_salt way:
    md5 per (vertex, salt) sorted block, then md5 of the sorted block
    digests — associative, same fixpoint classes.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    sym = _sym_simple(edges).persist()
    color = sym.select(F.col("a").alias("id")).distinct().select(
        "id", F.lit("0").alias("color")
    )
    color = ckpt.save(color, "wl_color", 0)
    for r in range(1, rounds + 1):
        # gather: every vertex collects its neighbours' colors (one
        # join on the |V|-row state), sorts them lexicographically and
        # hashes together with its own color — ties to the reference
        # invariant, free of visit order
        sig = (
            sym.join(
                color.select(F.col("id").alias("b"), F.col("color").alias("nc")),
                "b",
            )
            .groupBy(F.col("a").alias("id"))
            .agg(F.array_join(F.sort_array(F.collect_list("nc")), ",").alias("sig"))
        )
        color = (
            color.join(sig, "id", "left")
            .select(
                "id",
                F.md5(
                    F.concat(F.col("color"), F.lit("|"), F.coalesce("sig", F.lit("")))
                ).alias("color"),
            )
        )
        color = ckpt.save(color, "wl_color", r)
    sym.unpersist()
    if own_ckpt and ckpt.path is None:
        color = color.localCheckpoint(eager=True)
        ckpt.close()
    return color


def avg_distance(
    spark,
    edges: DataFrame,
    max_dist: int = 2,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Truncated mean shortest-path distance (igraph
    ``average_path_length``, big-graph form): the average of d(u, v)
    over all ordered reachable pairs with d ≤ ``max_dist``, plus the
    pair count — 1-row output ``(n_pairs, avg_distance)``.

    Shares the all-sources frontier-BFS ball builder with
    :func:`harmonic_centrality` (per ring one frontier⋈adjacency join
    + one anti-join; state Σ_v |ball_k(v)|) — the exact small-k path.
    At 100 TB estimate from :func:`neighborhood_hll` ball deltas
    instead.
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    sym = _sym_simple(edges).persist()
    verts = sym.select(F.col("a").alias("id")).distinct()
    seen = _truncated_balls(sym, verts, max_dist, ckpt, "avgdist")
    out = (
        seen.where(F.col("d") > 0)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.avg(F.col("d").cast("double")), 6).alias("avg_distance"),
        )
        .localCheckpoint(eager=True)
    )
    sym.unpersist()
    if own_ckpt and ckpt.path is None:
        ckpt.close()
    return out


def transitivity_global(spark, edges: DataFrame) -> DataFrame:
    """Global transitivity (igraph ``transitivity_undirected``):
    C = 3·triangles / wedges over the simple undirected graph — the
    corpus-level clustering scalar next to the per-vertex
    :func:`clustering_coefficient`.  1-row output
    ``(n_triangles, n_wedges, transitivity)``; NULL when wedge-free.

    Scale: the wedge count is one degree aggregate (Σ deg(deg−1)/2, no
    wedge materialisation); triangles reuse the degree-oriented
    wedge-join counter.  One broadcast cross join of two 1-row tables.
    """
    sym = _sym_simple(edges)
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    wedges = deg.agg(
        F.coalesce(F.sum(F.col("deg") * (F.col("deg") - 1) / 2.0), F.lit(0.0)).alias(
            "n_wedges"
        )
    )
    tri = triangle_count(spark, edges)
    return tri.crossJoin(F.broadcast(wedges)).select(
        "n_triangles",
        F.col("n_wedges").cast("long").alias("n_wedges"),
        F.round(
            F.when(F.col("n_wedges") > 0, 3.0 * F.col("n_triangles") / F.col("n_wedges")),
            6,
        ).alias("transitivity"),
    )


def coreness(
    spark,
    edges: DataFrame,
    rounds: int = 8,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Per-vertex core number (igraph ``coreness``) via distributed
    H-index iteration (Montresor, De Pellegrini & Miorandi 2013): start
    every estimate at the simple degree, then repeatedly set
    ``est(v) = H(est(u) : u ∈ N(v))`` — the largest h such that at
    least h neighbours hold estimate ≥ h.  Estimates are monotone
    non-increasing and lower-bounded by the true core number, so the
    fixpoint IS the core decomposition; a fixed ``rounds`` keeps the
    run (and its unrolled DuckDB twin) deterministic, and real runs can
    stop early when a round changes nothing.

    Returns (id, coreness).  Unlike :func:`k_core` (one k, the
    subgraph), this yields every vertex's number in one pass over ks.

    Scale shape: per round one gather join on the |V|-row estimate
    table + one per-vertex ranked window + one aggregate — the
    PageRank shuffle plus a per-vertex sort whose run length is the
    degree (a hub's sorted run is one big partition-local sort, not a
    blow-up); per-round lineage truncation via the checkpoint.
    """
    from pyspark.sql import Window

    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    sym = _sym_simple(edges).persist()
    est = sym.groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).cast("int").alias("est")
    )
    est = ckpt.save(est, "coreness_est", 0)
    w = Window.partitionBy("a").orderBy(F.desc("nb_est"))
    for r in range(1, rounds + 1):
        gathered = sym.join(
            est.select(F.col("id").alias("b"), F.col("est").alias("nb_est")), "b"
        ).select("a", "nb_est")
        h = (
            gathered.withColumn("rk", F.row_number().over(w))
            .groupBy(F.col("a").alias("id"))
            .agg(F.max(F.least(F.col("rk"), F.col("nb_est"))).cast("int").alias("h"))
        )
        est = est.join(h, "id").select("id", F.least("est", "h").alias("est"))
        est = ckpt.save(est, "coreness_est", r)
    out = est.select("id", F.col("est").cast("long").alias("coreness"))
    sym.unpersist()
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    return out


def ppr_sweep(
    spark,
    edges: DataFrame,
    sources,
    m: int = 50,
    max_iter: int = 8,
    damping: float = 0.85,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Local community detection by the PPR sweep cut (Andersen, Chung
    & Lang 2006 — the seed-set-expansion standard): rank vertices by
    personalized-PageRank-over-volume, then score every prefix of that
    ordering by conductance; the argmin prefix is the seed's local
    community.  Returns the sweep curve ``(pos, id, score, vol_w,
    cut_w, conductance)`` for the top-``m`` vertices — callers take
    ``pos <= argmin`` as the community.

    Determinism contract: the sweep order is (round(score, 6) desc,
    id asc) — a total order both engines reproduce; conductance is
    exact integer-weight arithmetic over that order.

    Scale shape: the PPR stays sparse (seed neighbourhood only); the
    top-m cut is TakeOrderedAndProject; every window after that runs
    over the m-row prefix table, and the earlier-neighbour mass b(v)
    is one equi-join of the m-row table against the adjacency —
    bounded by Σ_{v∈top-m} deg(v), never |E|.
    """
    from pyspark.sql import Window

    if m < 1:
        raise ValueError("m must be positive")
    pr = personalized_pagerank(
        spark, edges, sources, damping=damping, max_iter=max_iter,
        tol=0.0, directed=False, ckpt=ckpt,
    )
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            "weight",
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("weight").alias("w"))
    )
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
    )
    vol = sym.groupBy(F.col("a").alias("id")).agg(F.sum("w").alias("vol"))
    tot = vol.agg(F.sum("vol").alias("tot"))
    scored = (
        pr.where(F.col("rank") > 0)
        .join(vol, "id")
        .select("id", "vol", F.round(F.col("rank") / F.col("vol"), 6).alias("score"))
    )
    top = (
        scored.orderBy(F.desc("score"), F.asc("id"))
        .limit(m)
        .withColumn(
            "pos",
            F.row_number().over(Window.orderBy(F.desc("score"), F.asc("id"))),
        )
        .localCheckpoint(eager=True)
    )
    # b(v): weight from v to strictly-earlier prefix vertices — exactly
    # one direction of each internal undirected edge survives the filter
    b = (
        top.select(F.col("id").alias("v"), F.col("pos").alias("vpos"))
        .join(sym.select(F.col("a").alias("v"), F.col("b").alias("u"), "w"), "v")
        .join(top.select(F.col("id").alias("u"), F.col("pos").alias("upos")), "u")
        .where(F.col("upos") < F.col("vpos"))
        .groupBy(F.col("v").alias("id"))
        .agg(F.sum("w").alias("b"))
    )
    run = Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        top.join(b, "id", "left")
        .na.fill({"b": 0.0})
        .crossJoin(F.broadcast(tot))
        .select(
            "pos",
            "id",
            "score",
            F.sum("vol").over(run).alias("vol_w"),
            (F.sum("vol").over(run) - 2.0 * F.sum("b").over(run)).alias("cut_w"),
            "tot",
        )
    )
    mn = F.least(F.col("vol_w"), F.col("tot") - F.col("vol_w"))
    return curve.select(
        "pos",
        "id",
        "score",
        F.round("vol_w", 6).alias("vol_w"),
        F.round("cut_w", 6).alias("cut_w"),
        F.round(F.when(mn > 0, F.col("cut_w") / mn), 6).alias("conductance"),
    )


def katz_centrality(
    spark,
    edges: DataFrame,
    alpha: float = 0.01,
    beta: float = 1.0,
    max_iter: int = 8,
    directed: bool = False,
    ckpt: CheckpointManager | None = None,
    ckpt_every: int = 4,
) -> DataFrame:
    """Katz centrality by fixed-point iteration x ← β + α·Aᵀx (igraph /
    Katz 1953): every vertex gets β for free plus α per unit of its
    neighbours' centrality, so unlike eigenvector centrality pendant
    and zero-in-degree vertices still score.  Converges for
    α < 1/λ_max; run with small α on hub-heavy graphs.  Returns
    (id, centrality), raw (unnormalised) values rounded to 6.

    Scale shape: identical to :func:`eigenvector_centrality` — one
    join+aggregate exchange per iteration, β re-attached as a column
    (no extra join), checkpoint barriers every ``ckpt_every`` rounds.
    """
    if max_iter < 1:
        raise ValueError("max_iter must be positive")
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    e = edges.select("src", "dst", "weight")
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
    e = e.persist()
    verts = _vertices(e).persist()
    x = verts.select("id", F.lit(float(beta)).alias("centrality"))
    for t in range(1, max_iter + 1):
        gathered = (
            e.join(x.select(F.col("id").alias("src"), "centrality"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("weight") * F.col("centrality")).alias("g"))
        )
        x = verts.join(gathered, "id", "left").select(
            "id",
            (
                F.lit(float(beta)) + F.lit(float(alpha)) * F.coalesce("g", F.lit(0.0))
            ).alias("centrality"),
        )
        if t % ckpt_every == 0 or t == max_iter:
            x = ckpt.save(x, "katz_x", t)
    out = x.select("id", F.round("centrality", 6).alias("centrality"))
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    e.unpersist()
    verts.unpersist()
    return out


def spanning_forest(
    spark,
    edges: DataFrame,
    max_rounds: int = 16,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Minimum spanning forest by distributed Borůvka — the classic
    O(log n)-round MST algorithm and the standard distributed choice
    (each round every component claims its lightest outgoing edge, the
    claimed edges merge components, the graph contracts geometrically).
    Spark has no MST; sequential Kruskal/Prim need a global union-find.

    Edges are totally ordered by ``(weight, min_end, max_end)``, so the
    claimed set is cycle-free (the classic distinct-weight argument)
    and the run is deterministic; under genuinely distinct weights the
    result is THE unique MST (asserted vs a Kruskal twin in tests).

    Returns the forest's edges ``(src, dst, weight)`` (canonical
    ``src < dst``, |V| − #components rows).

    Scale shape: per round one component-label join + one per-component
    min-struct aggregate (map-side combinable) to claim edges, then a
    connected-components pass over the CLAIMED edge set only (≤ one
    edge per component — geometrically shrinking) to merge labels;
    per-round lineage truncation via the checkpoint.
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            "weight",
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("weight").alias("w"))
        .persist()
    )
    comp = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .distinct()
        .select("id", F.col("id").alias("comp"))
    )
    comp = ckpt.save(comp, "msf_comp", 0)
    forest = None
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
    )
    for r in range(1, max_rounds + 1):
        lab = (
            sym.join(comp.select(F.col("id").alias("a"), F.col("comp").alias("ca")), "a")
            .join(comp.select(F.col("id").alias("b"), F.col("comp").alias("cb")), "b")
            .where(F.col("ca") != F.col("cb"))
        )
        # lightest outgoing edge per component under the (w, a, b) total
        # order — min_by on the packed struct is one map-side-combinable agg
        claimed = (
            lab.groupBy("ca")
            .agg(
                F.min(
                    F.struct(
                        "w",
                        F.least("a", "b").alias("ea"),
                        F.greatest("a", "b").alias("eb"),
                    )
                ).alias("pick")
            )
            .select(
                F.col("pick.ea").alias("a"),
                F.col("pick.eb").alias("b"),
                F.col("pick.w").alias("w"),
            )
            .distinct()
        )
        claimed = ckpt.save(claimed, "msf_claimed", r)
        if claimed.isEmpty():
            break
        forest = claimed if forest is None else forest.unionByName(claimed).distinct()
        forest = ckpt.save(forest, "msf_forest", r)
        # merge: CC over the claimed COMPONENT-level edges (tiny set)
        cedges = (
            claimed.join(comp.select(F.col("id").alias("a"), F.col("comp").alias("ca")), "a")
            .join(comp.select(F.col("id").alias("b"), F.col("comp").alias("cb")), "b")
            .select(F.col("ca").alias("src"), F.col("cb").alias("dst"), F.lit(1.0).alias("weight"))
        )
        merged = connected_components(spark, cedges, ckpt=ckpt)
        comp = (
            comp.join(
                merged.select(F.col("id").alias("comp"), "component"), "comp", "left"
            )
            .select("id", F.coalesce("component", F.col("comp")).alias("comp"))
        )
        comp = ckpt.save(comp, "msf_comp", r)
    out = (
        forest.select(F.col("a").alias("src"), F.col("b").alias("dst"), F.col("w").alias("weight"))
        if forest is not None
        else und.select("a", "b", "w").limit(0).select(
            F.col("a").alias("src"), F.col("b").alias("dst"), F.col("w").alias("weight")
        )
    )
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    und.unpersist()
    return out


def shortest_path(
    spark,
    edges: DataFrame,
    src_id: int,
    dst_id: int,
    max_depth: int = 6,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Single-pair unweighted shortest path (igraph
    ``get_shortest_paths``) over the symmetrised simple graph, with
    deterministic min-id parent tie-breaks so THE returned path is
    unique and SQL-reproducible.  Returns ``(step, id)`` rows — step 0
    is ``src_id``, the last step is ``dst_id``; empty when unreachable
    within ``max_depth``.

    Scale shape: forward frontier BFS from the single source (per ring
    one frontier⋈adjacency join + anti-join vs seen — state is the
    source's ball, not all-pairs), then ``max_depth`` one-row parent
    walk-back joins against the materialised ring table.
    """
    if max_depth < 1:
        raise ValueError("max_depth must be >= 1")
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    sym = _sym_simple(edges).persist()
    seen = spark.createDataFrame(
        [(int(src_id), None, 0)], "id long, parent long, d int"
    )
    frontier = seen.select("id")
    seen = ckpt.save(seen, "sp_seen", 0)
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.select(F.col("id").alias("f"))
            .join(sym.select(F.col("a").alias("f"), F.col("b").alias("id")), "f")
            .groupBy("id")
            .agg(F.min("f").alias("parent"))
            .join(seen.select("id"), "id", "left_anti")
            .withColumn("d", F.lit(d).cast("int"))
        )
        nxt = ckpt.save(nxt, "sp_ring", d)
        seen = ckpt.save(seen.unionByName(nxt), "sp_seen", d)
        frontier = nxt.select("id")
    # walk back from dst through the parent pointers (<= max_depth
    # one-row joins against the ring table)
    step = seen.where(F.col("id") == int(dst_id))
    path = step.select("d", "id")
    for _ in range(max_depth):
        step = step.select(F.col("parent").alias("id")).join(seen, "id")
        path = path.unionByName(step.select("d", "id"))
    out = path.distinct().select(F.col("d").cast("int").alias("step"), "id")
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    sym.unpersist()
    return out


# Holland–Leinhardt MAN triad classes in igraph's triad_census order.
TRIAD_CLASSES = [
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
]


def triad_code_table() -> list[tuple[int, str, int, int]]:
    """The 64-entry lookup (code, triad, n_mutual, n_asym) from packed
    dyad states to MAN triad classes.

    For the sorted triple i<j<k, each dyad carries a state relative to
    its (lower, higher) orientation — 0 null, 1 lower→higher,
    2 higher→lower, 3 mutual — and ``code = s_ij + 4·s_jk + 16·s_ik``.
    Classification follows the standard rules (Holland & Leinhardt
    1970; igraph ``triad_census`` docs): the (M, A, N) dyad counts pin
    the class except for the direction-sensitive families, which split
    on the shared/odd vertex's orientation (021D out-star / 021U
    in-star / 021C chain; 111D points into the mutual pair / 111U out
    of it; 030T transitive / 030C cyclic; 120D/U/C by the non-mutual
    vertex's out-degree).  Shared with the DuckDB oracle so both
    engines classify identically.
    """
    out = []
    for code in range(64):
        states = {
            (0, 1): code & 3,
            (1, 2): (code >> 2) & 3,
            (0, 2): (code >> 4) & 3,
        }
        arcs = set()
        for (lo, hi), s in states.items():
            if s in (1, 3):
                arcs.add((lo, hi))
            if s in (2, 3):
                arcs.add((hi, lo))
        m = sum(1 for s in states.values() if s == 3)
        a = sum(1 for s in states.values() if s in (1, 2))
        asym = [p for p, s in states.items() if s in (1, 2)]
        mut = [p for p, s in states.items() if s == 3]
        if (m, a) == (0, 0):
            lab = "003"
        elif (m, a) == (0, 1):
            lab = "012"
        elif (m, a) == (1, 0):
            lab = "102"
        elif (m, a) == (0, 2):
            (p1, p2) = asym
            shared = (set(p1) & set(p2)).pop()
            outd = sum(1 for (x, y) in arcs if x == shared)
            lab = {2: "021D", 0: "021U", 1: "021C"}[outd]
        elif (m, a) == (1, 1):
            pair = set(mut[0])
            # the asym arc: D if it points INTO the mutual pair
            arc = next((x, y) for (x, y) in arcs if not ({x, y} <= pair))
            lab = "111D" if arc[1] in pair else "111U"
        elif (m, a) == (0, 3):
            outdeg = {v: sum(1 for (x, _) in arcs if x == v) for v in (0, 1, 2)}
            lab = "030T" if max(outdeg.values()) == 2 else "030C"
        elif (m, a) == (2, 0):
            lab = "201"
        elif (m, a) == (1, 2):
            odd = ({0, 1, 2} - set(mut[0])).pop()
            mutarcs = {mut[0], (mut[0][1], mut[0][0])}
            outd = sum(1 for (x, y) in arcs if x == odd and (x, y) not in mutarcs)
            lab = {2: "120D", 0: "120U", 1: "120C"}[outd]
        elif (m, a) == (2, 1):
            lab = "210"
        else:
            lab = "300"
        out.append((code, lab, m, a))
    return out


def triad_census(spark, edges: DataFrame) -> DataFrame:
    """Directed triad census (Holland–Leinhardt / igraph
    ``triad_census``): counts of all 16 MAN isomorphism classes of
    3-vertex subgraphs of the simple directed graph (self-loops
    dropped, parallel arcs collapsed; the vertex set is the edge
    endpoints).  Returns 16 rows (triad, count), Σcount = C(n,3).

    Scale shape (Batagelj & Mrvar 2001, "A subquadratic triad census
    algorithm"): only triads with ≥2 linked dyads are ENUMERATED — a
    wedge self-join on the shared vertex bounded by Σdeg² like the
    triangle count, followed by one equi-join for the third dyad's
    state and a 64-entry literal-array classification.  The empty and
    single-dyad classes (003/012/102) — the O(n³) bulk — come from
    closed-form identities over the dyad census: n_012 = A·(n−2) −
    Σ_{T2} a_t, n_102 = M·(n−2) − Σ_{T2} m_t, n_003 = C(n,3) − rest.
    The handful of global scalars ride 1-row broadcast cross joins.
    C(n,3) is exact BIGINT arithmetic (valid to n ≈ 3·10⁹ vertices).
    """
    lut = triad_code_table()
    lab_arr = F.array(*[F.lit(lab) for _, lab, _, _ in lut])
    m_arr = F.array(*[F.lit(m) for _, _, m, _ in lut])
    a_arr = F.array(*[F.lit(a) for _, _, _, a in lut])

    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    dy = (
        e.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.when(F.col("src") < F.col("dst"), 1).otherwise(0).alias("f"),
            F.when(F.col("src") > F.col("dst"), 1).otherwise(0).alias("r"),
        )
        .groupBy("a", "b")
        .agg((F.max("f") + 2 * F.max("r")).alias("s"))
    )
    inc = dy.select(F.col("a").alias("v"), F.col("b").alias("w"), "s").unionByName(
        dy.select(F.col("b").alias("v"), F.col("a").alias("w"), "s")
    )
    wed = (
        inc.alias("p")
        .join(inc.alias("q"), "v")
        .where(F.col("p.w") < F.col("q.w"))
        .select(
            "v",
            F.col("p.w").alias("w1"),
            F.col("q.w").alias("w2"),
            F.col("p.s").alias("sa"),
            F.col("q.s").alias("sb"),
        )
    )
    third = dy.select(
        F.col("a").alias("ta"), F.col("b").alias("tb"), F.col("s").alias("sc")
    )
    wed = (
        wed.withColumn("ta", F.least("w1", "w2"))
        .withColumn("tb", F.greatest("w1", "w2"))
        .join(third, ["ta", "tb"], "left")
        .withColumn("sc", F.coalesce("sc", F.lit(0)))
        .withColumn("i", F.least("v", "w1", "w2"))
        .withColumn("k", F.greatest("v", "w1", "w2"))
        .withColumn("j", F.col("v") + F.col("w1") + F.col("w2") - F.col("i") - F.col("k"))
    )

    def _state(x, y):
        return (
            F.when(
                (F.least("v", "w1") == F.col(x)) & (F.greatest("v", "w1") == F.col(y)),
                F.col("sa"),
            )
            .when(
                (F.least("v", "w2") == F.col(x)) & (F.greatest("v", "w2") == F.col(y)),
                F.col("sb"),
            )
            .otherwise(F.col("sc"))
        )

    code = _state("i", "j") + 4 * _state("j", "k") + 16 * _state("i", "k")
    # a triangle (3 linked dyads) surfaces once per shared vertex → distinct
    t2 = wed.select("i", "j", "k", code.cast("int").alias("code")).distinct()

    conn = (
        t2.groupBy("code")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.element_at(lab_arr, F.col("code") + 1).alias("triad"),
            "cnt",
        )
        .groupBy("triad")
        .agg(F.sum("cnt").alias("cnt"))
    )
    dstats = dy.agg(
        F.sum((F.col("s") == 3).cast("long")).alias("M"),
        F.sum(F.col("s").isin(1, 2).cast("long")).alias("A"),
    )
    nv = _vertices(e).agg(F.count(F.lit(1)).alias("n"))
    t2stats = t2.agg(
        F.count(F.lit(1)).alias("t2n"),
        F.coalesce(F.sum(F.element_at(m_arr, F.col("code") + 1)), F.lit(0)).alias("sum_m"),
        F.coalesce(F.sum(F.element_at(a_arr, F.col("code") + 1)), F.lit(0)).alias("sum_a"),
    )
    scalars = dstats.crossJoin(nv).crossJoin(t2stats)
    base = spark.createDataFrame([(lab,) for lab in TRIAD_CLASSES], "triad string")
    n012 = F.col("A") * (F.col("n") - 2) - F.col("sum_a")
    n102 = F.col("M") * (F.col("n") - 2) - F.col("sum_m")
    cn3 = F.expr("(n * (n - 1)) div 2 * (n - 2) div 3")
    return (
        base.join(conn, "triad", "left")
        .crossJoin(F.broadcast(scalars))
        .select(
            "triad",
            F.when(F.col("triad") == "012", n012)
            .when(F.col("triad") == "102", n102)
            .when(F.col("triad") == "003", cn3 - F.col("t2n") - n012 - n102)
            .otherwise(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("count"),
        )
    )


def cocitation(
    spark,
    edges: DataFrame,
    mode: str = "cocitation",
    max_center_degree: int | None = 100_000,
    min_common: int = 1,
) -> DataFrame:
    """Cocitation / bibliographic-coupling counts (igraph ``cocitation``
    / ``bibcoupling``, Small 1973 / Kessler 1963): cocitation(u,v) =
    |{w : w→u ∧ w→v}| — how often two vertices are cited TOGETHER;
    coupling(u,v) = |{w : u→w ∧ v→w}| — how many references two
    vertices SHARE.  The classic second-order similarity indices on a
    directed graph (citations, user→item interactions, tool calls).

    Returns sparse unordered pairs (src, dst, n_common) with src < dst
    and n_common ≥ ``min_common`` (zero pairs are never materialised —
    the full matrix is O(n²)).

    Scale shape: the adamic_adar wedge enumeration — one self-join of
    the (center, spoke) adjacency on the center vertex, bounded by
    Σ_w deg(w)² with the same ``max_center_degree`` hub guard, then one
    map-side-combinable pair aggregate.
    """
    if mode not in ("cocitation", "coupling"):
        raise ValueError("mode must be 'cocitation' or 'coupling'")
    if min_common < 1:
        raise ValueError("min_common must be >= 1")
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    if mode == "cocitation":
        adj = e.select(F.col("src").alias("w"), F.col("dst").alias("x"))
    else:
        adj = e.select(F.col("dst").alias("w"), F.col("src").alias("x"))
    if max_center_degree is not None:
        deg = adj.groupBy("w").agg(F.count(F.lit(1)).alias("deg"))
        adj = adj.join(deg, "w").where(F.col("deg") <= max_center_degree).select("w", "x")
    wedges = (
        adj.alias("l")
        .join(adj.alias("r"), "w")
        .where(F.col("l.x") < F.col("r.x"))
        .select(F.col("l.x").alias("src"), F.col("r.x").alias("dst"))
    )
    return (
        wedges.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )


def _und_weighted(edges: DataFrame) -> DataFrame:
    """Simple undirected weighted edge list (a < b, parallel arcs and
    both directions collapsed by weight sum, self-loops dropped)."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            "weight",
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("weight").alias("w"))
    )


def avg_neighbor_degree(spark, edges: DataFrame) -> DataFrame:
    """Average nearest-neighbour degree (igraph ``knn``, Barrat et al.
    2004): for each vertex, the mean degree of its neighbours on the
    simple undirected graph — THE degree-correlation diagnostic
    (rising knn(k) = assortative, falling = hubs attach to leaves;
    complements the scalar assortativity coefficient).

    Returns (id, degree, knn) per vertex with degree ≥ 1.

    Scale: one degree aggregate + one equi-join of the adjacency
    against the degree table + one per-vertex mean — the PageRank
    gather shape, nothing quadratic.
    """
    und = _und_weighted(edges)
    adj = und.select(F.col("a").alias("id"), F.col("b").alias("nb")).unionByName(
        und.select(F.col("b").alias("id"), F.col("a").alias("nb"))
    )
    deg = adj.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))
    nb_deg = adj.join(
        deg.select(F.col("id").alias("nb"), F.col("degree").alias("nd")), "nb"
    )
    return (
        nb_deg.groupBy("id")
        .agg(F.round(F.avg("nd"), 6).alias("knn"))
        .join(deg, "id")
        .select("id", F.col("degree").cast("long").alias("degree"), "knn")
    )


def vertex_diversity(spark, edges: DataFrame) -> DataFrame:
    """Vertex strength diversity (igraph ``diversity``, Eagle, Macy &
    Claxton 2010): the normalised Shannon entropy of a vertex's
    incident edge weights on the simple undirected graph —
    H_v / log2(deg_v), 1.0 when attention is spread evenly across
    neighbours, →0 when one tie dominates.  Degree-1 vertices score
    0 by convention.

    Returns (id, degree, strength, diversity).

    Scale: ONE per-vertex aggregate using the c·ln c identity (no
    second pass): H = (ln s − Σ w·ln w / s) / ln 2 over incident
    weights w with strength s = Σ w.
    """
    und = _und_weighted(edges)
    inc = und.select(F.col("a").alias("id"), "w").unionByName(
        und.select(F.col("b").alias("id"), "w")
    )
    ln2 = 0.6931471805599453
    per = inc.groupBy("id").agg(
        F.count(F.lit(1)).alias("degree"),
        F.sum("w").alias("strength"),
        F.sum(F.col("w") * F.log("w")).alias("s_wlogw"),
    )
    h = (F.log("strength") - F.col("s_wlogw") / F.col("strength")) / ln2
    return per.select(
        "id",
        F.col("degree").cast("long").alias("degree"),
        F.round("strength", 6).alias("strength"),
        F.round(
            F.when(F.col("degree") > 1, h / (F.log("degree") / ln2)).otherwise(0.0), 6
        ).alias("diversity"),
    )


def burt_constraint(spark, edges: DataFrame) -> DataFrame:
    """Burt's network constraint (igraph ``constraint``, Burt 1995/2004):
    constraint(i) = Σ_{j∈N(i)} (p_ij + Σ_q p_iq·p_qj)² where p_ij is
    vertex i's share of relational investment in j (symmetrised
    weights, normalised per vertex).  LOW constraint = structural-hole
    broker; the classic brokerage metric on collaboration /
    interaction graphs.

    Returns (id, degree, constraint).

    Scale shape: the proportion table P is the normalised undirected
    adjacency; the indirect term is ONE self-join of P on the shared
    middle vertex (Σdeg²-bounded, the triangle-count wedge shape)
    aggregated per (i,j), then an inner join back to P restricts j to
    i's NEIGHBOURS only (Burt sums over direct contacts) — no
    all-pairs anything.
    """
    und = _und_weighted(edges)
    adj = und.select(F.col("a").alias("i"), F.col("b").alias("j"), "w").unionByName(
        und.select(F.col("b").alias("i"), F.col("a").alias("j"), "w")
    )
    stren = adj.groupBy("i").agg(F.sum("w").alias("s"), F.count(F.lit(1)).alias("degree"))
    p = adj.join(stren, "i").select("i", "j", (F.col("w") / F.col("s")).alias("p"))
    # indirect: Σ_q p_iq · p_qj over middle vertices q (q≠i, q≠j by
    # simple-graph construction: p has no self-rows)
    ind = (
        p.alias("l")
        .join(
            p.alias("r").select(
                F.col("i").alias("q"), F.col("j").alias("jj"), F.col("p").alias("pr")
            ),
            F.col("l.j") == F.col("q"),
        )
        .where(F.col("l.i") != F.col("jj"))
        .groupBy(F.col("l.i").alias("i"), F.col("jj").alias("j"))
        .agg(F.sum(F.col("l.p") * F.col("pr")).alias("pind"))
    )
    cij = p.join(ind, ["i", "j"], "left").select(
        "i", (F.col("p") + F.coalesce("pind", F.lit(0.0))).alias("c")
    )
    # ε-nudge before the display rounding: constraint sums of rational
    # p-shares frequently land EXACTLY on a 6th-decimal half (e.g. the
    # dyadic 0.2046875), where two engines' summation orders round to
    # different sides; +1.25e-9 moves the boundary off every nice decimal
    # while perturbing no non-boundary value at 6 decimals
    return (
        cij.groupBy("i")
        .agg(F.round(F.sum(F.col("c") * F.col("c")) + F.lit(1.25e-9), 6).alias("constraint"))
        .join(stren.select("i", "degree"), "i")
        .select(
            F.col("i").alias("id"),
            F.col("degree").cast("long").alias("degree"),
            "constraint",
        )
    )


def topological_levels(
    spark,
    edges: DataFrame,
    max_rounds: int = 100,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Kahn topological peel over the DIRECTED simple graph — igraph
    ``topological_sorting()`` / ``is_dag()`` (ref ecosystem: igraph
    ``src/connectivity/basic.c`` topological sort).  Round ``r`` peels
    the current zero-in-degree vertices, so a vertex's ``level`` equals
    the length of the longest directed path ending at it — a valid
    topological key (order by ``(level, id)``) plus the DAG depth in one
    pass.  Vertices never peeled within ``max_rounds`` (members of
    directed cycles and everything downstream of them) return
    ``level = -1``, so ``is_dag == (min(level) >= 0)``.

    Scale: each round is one distinct-dst anti-join + two anti-joins
    over the surviving edge set, all equality-keyed (AQE-broadcastable
    once the frontier shrinks), with per-round lineage truncation;
    rounds needed = DAG depth, independent of |V|.  There is no global
    sort anywhere — the level IS the sort key; materialising a total
    order is the caller's per-level (cheap) choice.
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    e = ckpt.save(e, "topo_edges", 0)
    remaining = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    remaining = ckpt.save(remaining, "topo_verts", 0)
    from pyspark.sql import Observation

    levels = None
    for r in range(max_rounds):
        srcs = remaining.join(
            e.select(F.col("dst").alias("id")), "id", "left_anti"
        ).select("id", F.lit(r).cast("long").alias("level"))
        obs = Observation()
        srcs = srcs.observe(obs, F.count(F.lit(1)).alias("cnt"))
        srcs = ckpt.save(srcs, "topo_srcs", r)
        n = int(obs.get["cnt"])
        ckpt.log(name="topo", step=r, peeled=n)
        if n == 0:
            break
        # the manager prunes old steps per tag, so the running union must
        # re-checkpoint every round (cf. the btw_lvl_{d} note above) —
        # never reference a topo_srcs step older than the keep window
        levels = ckpt.save(
            srcs.select("id", "level")
            if levels is None
            else levels.unionByName(srcs.select("id", "level")),
            "topo_levels",
            r,
        )
        remaining = ckpt.save(
            remaining.join(srcs.select("id"), "id", "left_anti"), "topo_verts", r + 1
        )
        e = ckpt.save(
            e.join(srcs.select(F.col("id").alias("src")), "src", "left_anti"),
            "topo_edges",
            r + 1,
        )
    leftover = remaining.select("id", F.lit(-1).cast("long").alias("level"))
    out = leftover if levels is None else levels.unionByName(leftover)
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    return out


def voronoi_cells(
    spark,
    edges: DataFrame,
    seeds: DataFrame,
    max_dist: int = 3,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Graph Voronoi partition — igraph ``voronoi()`` (igraph
    ``src/misc/graph_voronoi.c``): assign every vertex within
    ``max_dist`` hops of a seed to its NEAREST seed over the symmetrised
    simple graph; same-ring ties break to the smallest seed id
    (deterministic, the SQL-reproducible analogue of igraph's
    tiebreaker modes).  ``seeds`` is a one-column (id) DataFrame.
    Returns (id, seed, dist); vertices farther than ``max_dist`` from
    every seed are absent — at 100 TB an unbounded BFS is a full
    connected-components pass, which :func:`connected_components`
    already provides.

    Scale: multi-source BFS with O(|V|) total state — a vertex is
    assigned exactly once (first ring that reaches it), so each ring is
    one frontier⋈adjacency join + one min-agg + one anti-join vs the
    assigned set, all equality-keyed; rings needed = max_dist, not
    diameter.
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    sym = _sym_simple(edges).persist()
    best = seeds.select(
        F.col("id"), F.col("id").alias("seed"), F.lit(0).cast("long").alias("dist")
    )
    best = ckpt.save(best, "vor_best", 0)
    frontier = best
    for d in range(1, max_dist + 1):
        cand = (
            frontier.select(F.col("id").alias("a"), "seed")
            .join(sym, "a")
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("seed").alias("seed"))
            .join(best.select("id"), "id", "left_anti")
            .select("id", "seed", F.lit(d).cast("long").alias("dist"))
        )
        best = ckpt.save(best.unionByName(cand), "vor_best", d)
        frontier = best.where(F.col("dist") == d)
    if own_ckpt and ckpt.path is None:
        best = best.localCheckpoint(eager=True)
        ckpt.close()
    sym.unpersist()
    return best


def maximal_matching(
    spark,
    edges: DataFrame,
    seed: int = 42,
    rounds: int | None = None,
    max_rounds: int = 30,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Maximal matching by deterministic local-min edge election
    (Israeli–Itai 1986, the distributed analogue of igraph's greedy
    matching utilities; igraph ships ``maximum_bipartite_matching`` —
    exact augmenting paths are inherently sequential, so the scale path
    is the 1/2-approximate maximal matching, the standard big-graph
    substitute).  Edge priority = md5(seed, a, b) — an edge joins the
    matching when it is the minimum-priority edge at BOTH endpoints;
    matched endpoints retire with all incident edges.  With random
    priorities the surviving edge set shrinks geometrically, so rounds
    ≈ O(log |E|).

    ``rounds``: run EXACTLY that many synchronous rounds (the
    oracle-comparability mode, cf. :func:`k_core`); default detects the
    empty-edge fixpoint.  Returns (a, b, round) — one row per matched
    edge, ``round`` = the election round that claimed it.

    Scale: per round one per-vertex min-struct aggregate over edge
    endpoints (map-side combinable), one 2-vote filter, two anti-joins;
    no windows, no sorts, no driver data.
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    e = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .withColumn(
            "p",
            F.md5(
                F.concat_ws(
                    "-",
                    F.lit("mm"),
                    F.lit(str(seed)),
                    F.col("a").cast("string"),
                    F.col("b").cast("string"),
                )
            ),
        )
    )
    e = ckpt.save(e, "mm_edges", 0)
    from pyspark.sql import Observation

    matched = None
    n_rounds = rounds if rounds is not None else max_rounds
    for r in range(1, n_rounds + 1):
        s = F.struct("p", "a", "b").alias("s")
        ends = e.select(F.col("a").alias("v"), s).unionByName(
            e.select(F.col("b").alias("v"), s)
        )
        claims = ends.groupBy("v").agg(F.min("s").alias("s"))
        win = (
            claims.groupBy(F.col("s.a").alias("a"), F.col("s.b").alias("b"))
            .agg(F.count(F.lit(1)).alias("votes"))
            .where(F.col("votes") == 2)
            .select("a", "b", F.lit(r).cast("long").alias("round"))
        )
        matched = ckpt.save(
            win if matched is None else matched.unionByName(win), "mm_matched", r
        )
        mv = matched.select(F.col("a").alias("v")).unionByName(
            matched.select(F.col("b").alias("v"))
        )
        nxt = (
            e.join(mv.withColumnRenamed("v", "a"), "a", "left_anti")
            .join(mv.withColumnRenamed("v", "b"), "b", "left_anti")
            .select("a", "b", "p")
        )
        obs = Observation()
        nxt = nxt.observe(obs, F.count(F.lit(1)).alias("cnt"))
        e = ckpt.save(nxt, "mm_edges", r)
        cnt = int(obs.get["cnt"])
        ckpt.log(name="maximal_matching", step=r, edges=cnt)
        if rounds is None and cnt == 0:
            break
    out = matched if matched is not None else spark.createDataFrame(
        [], "a long, b long, round long"
    )
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    return out


def edge_betweenness(
    spark,
    edges: DataFrame,
    max_dist: int = 3,
    n_sources: int | None = None,
    seed: int = 42,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Truncated EDGE betweenness — the Girvan–Newman centrality
    (igraph ``edge_betweenness()`` / ``community_edge_betweenness()``),
    same bounded-distance Brandes machinery as
    :func:`betweenness_centrality` but the backward pass accumulates the
    dependency σ_v/σ_w·(1+δ_w) onto the EDGE (v,w) between consecutive
    rings instead of onto the vertex — including the source's own ring-0
    edges, which vertex betweenness skips by definition.  Sampled-source
    mode (``n_sources``) uses the identical md5 pivot election and n/k
    rescaling.  Returns (a, b, betweenness) for every undirected simple
    edge (0.0 if no ≤max_dist shortest path crosses it).

    Scale: identical to the vertex pass — state Σ_s |ball(s)|, per ring
    one frontier⋈adjacency join + one (s,v) aggregate; the extra edge
    accumulator is one (a,b) hash-aggregate per ring, map-side
    combinable.
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    sym = _sym_simple(edges).persist()
    und = sym.where(F.col("a") < F.col("b"))
    verts = sym.select(F.col("a").alias("id")).distinct()
    if n_sources is None:
        sources = verts.select(F.col("id").alias("s"))
        scale = 1.0
    else:
        n_total = verts.count()
        k = min(int(n_sources), n_total)
        pr = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(str(seed)), F.col("id").cast("string"))), 1, 8
            ),
            16, 10,
        ).cast("long")
        sources = (
            verts.withColumn("_p", pr).orderBy("_p", "id").limit(k)
            .select(F.col("id").alias("s"))
        )
        scale = float(n_total) / float(k)
    lvl = sources.select("s", F.col("s").alias("v"), F.lit(1.0).alias("sigma"))
    seen = ckpt.save(lvl, "ebw_seen", 0)
    levels = [ckpt.save(lvl, "ebw_lvl_0", 0)]
    frontier = levels[0]
    for d in range(1, max_dist + 1):
        cand = (
            frontier.join(sym.select(F.col("a").alias("v"), F.col("b").alias("w")), "v")
            .groupBy("s", F.col("w").alias("v"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(seen.select("s", "v"), ["s", "v"], "left_anti")
        )
        cand = ckpt.save(cand, f"ebw_lvl_{d}", d)
        levels.append(cand)
        seen = ckpt.save(seen.unionByName(cand.select("s", "v", "sigma")), "ebw_seen", d)
        frontier = cand
    delta = levels[max_dist].select("s", "v", F.lit(0.0).alias("delta"))
    edge_acc = None
    for d in range(max_dist - 1, -1, -1):
        down = (
            levels[d + 1].select("s", F.col("v").alias("w"), F.col("sigma").alias("sigma_w"))
            .join(delta.select("s", F.col("v").alias("w"), "delta"), ["s", "w"], "left")
            .na.fill({"delta": 0.0})
        )
        pairs = (
            levels[d].select("s", "v", "sigma")
            .join(sym.select(F.col("a").alias("v"), F.col("b").alias("w")), "v")
            .join(down, ["s", "w"])
            .select(
                "s", "v", "w",
                (F.col("sigma") / F.col("sigma_w") * (F.lit(1.0) + F.col("delta"))).alias("c"),
            )
        )
        econ = pairs.groupBy(
            F.least("v", "w").alias("a"), F.greatest("v", "w").alias("b")
        ).agg(F.sum("c").alias("c"))
        edge_acc = ckpt.save(
            econ if edge_acc is None else edge_acc.unionByName(econ), "ebw_acc", d
        )
        if d > 0:
            delta = ckpt.save(
                pairs.groupBy("s", "v").agg(F.sum("c").alias("delta")), "ebw_delta", d
            )
    sums = edge_acc.groupBy("a", "b").agg(F.sum("c").alias("c"))
    out = und.select("a", "b").join(sums, ["a", "b"], "left").select(
        "a", "b",
        F.round(F.coalesce(F.col("c"), F.lit(0.0)) * F.lit(scale / 2.0), 6).alias(
            "betweenness"
        ),
    )
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    sym.unpersist()
    return out


def dyad_census(spark, edges: DataFrame) -> DataFrame:
    """Full dyad census — igraph ``dyad_census()`` (Holland–Leinhardt
    1970): one row (n_mutual, n_asym, n_null) over the directed simple
    graph; ``n_null`` = C(|V|,2) − mutual − asym.  The triad analogue is
    :func:`triad_census`; :func:`reciprocity` reports the edge-ratio
    view of the same mutual/asym split.

    One distinct + one reversed-key self-join + two 1-row aggregates
    assembled by a broadcast cross join — no per-pair state for null
    dyads, they are arithmetic.
    """
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), F.lit(1).alias("m"))
    marked = e.join(rev, ["src", "dst"], "left")
    ma = marked.agg(
        (F.sum(F.coalesce("m", F.lit(0))) / 2).cast("long").alias("n_mutual"),
        (F.count(F.lit(1)) - F.sum(F.coalesce("m", F.lit(0)))).cast("long").alias("n_asym"),
    )
    nv = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return ma.crossJoin(F.broadcast(nv)).select(
        "n_mutual",
        "n_asym",
        (
            (F.col("n") * (F.col("n") - 1) / 2).cast("long")
            - F.col("n_mutual")
            - F.col("n_asym")
        ).alias("n_null"),
    )


def power_law_fit(spark, edges: DataFrame, xmin: int = 2) -> DataFrame:
    """Power-law tail fit of the degree distribution — igraph
    ``power_law_fit()`` per Clauset–Shalizi–Newman 2009: discrete MLE
    ``alpha = 1 + n/Σ ln(deg/(xmin−0.5))`` (CSN eq. 3.7) at a
    CALLER-FIXED ``xmin``, plus the KS distance between the empirical
    tail CCDF and the fitted continuous-approximation CCDF
    ``((x−0.5)/(xmin−0.5))^{1−alpha}``.  Scanning xmin to minimise KS is
    a driver loop over this operator — each candidate is one pass.
    Returns one row (xmin, n_tail, alpha, ks).

    Scale: degrees are one hash-aggregate; alpha is a 1-row aggregate
    riding a broadcast cross join; the CCDF window runs over DISTINCT
    degree values — cardinality ≤ max degree, thousands at worst, small
    by construction (the same bounded-side contract as pajek ids).
    """
    from pyspark.sql import Window

    if xmin < 1:
        raise ValueError("xmin must be >= 1")
    deg = _sym_simple(edges).groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    tail = deg.where(F.col("deg") >= xmin)
    stats = tail.agg(
        F.count(F.lit(1)).alias("n_tail"),
        F.sum(F.log(F.col("deg") / F.lit(xmin - 0.5))).alias("s"),
    ).select("n_tail", (F.lit(1.0) + F.col("n_tail") / F.col("s")).alias("alpha"))
    dd = tail.groupBy("deg").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.col("deg").desc()).rowsBetween(Window.unboundedPreceding, 0)
    ks = (
        dd.withColumn("cum", F.sum("cnt").over(w))
        .crossJoin(F.broadcast(stats))
        .select(
            F.abs(
                F.col("cum") / F.col("n_tail")
                - F.pow(
                    (F.col("deg") - 0.5) / F.lit(xmin - 0.5),
                    F.lit(1.0) - F.col("alpha"),
                )
            ).alias("d")
        )
        .agg(F.max("d").alias("ks"))
    )
    return (
        stats.crossJoin(F.broadcast(ks))
        .select(
            F.lit(xmin).cast("long").alias("xmin"),
            F.col("n_tail").cast("long").alias("n_tail"),
            F.round("alpha", 6).alias("alpha"),
            F.round("ks", 6).alias("ks"),
        )
    )


def eccentricity(
    spark,
    edges: DataFrame,
    max_dist: int = 3,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Truncated per-vertex eccentricity — igraph ``eccentricity()`` /
    ``radius()``: the max BFS ring index reached within ``max_dist``
    over the symmetrised simple graph, plus the reached-set size.
    Values below ``max_dist`` are exact; a value equal to ``max_dist``
    is a lower bound (the ball may still be growing) — the standard
    big-graph truncation, cf. :func:`harmonic_centrality` /
    :func:`diameter_approx` (which bounds the global max instead).
    ``radius >= min(ecc)`` and ``diameter >= max(ecc)`` follow as 1-row
    aggregates at the caller.  Returns (id, ecc, n_reachable).

    Scale: one all-sources frontier BFS (shared `_truncated_balls`
    machinery) — state Σ_v |ball(v)|, bounded by max_dist, then a single
    hash aggregate.
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    sym = _sym_simple(edges).persist()
    verts = sym.select(F.col("a").alias("id")).distinct()
    ball = _truncated_balls(sym, verts, max_dist, ckpt, "ecc")
    out = ball.groupBy("id").agg(
        F.max("d").cast("long").alias("ecc"),
        (F.count(F.lit(1)) - 1).cast("long").alias("n_reachable"),
    )
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    sym.unpersist()
    return out


def dice_coefficient(
    spark,
    edges: DataFrame,
    max_center_degree: int | None = 100_000,
    min_common: int = 1,
) -> DataFrame:
    """Dice vertex similarity — igraph ``similarity_dice()``: for each
    non-adjacent pair (src < dst) with ≥ ``min_common`` common
    neighbours, Dice = 2·|N(src)∩N(dst)| / (deg(src) + deg(dst)) — the
    Jaccard variant that weights agreement twice.  Returns
    (src, dst, n_common, dice), 1e-6 rounded.

    Same wedge-enumeration shape and super-hub guard as
    :func:`jaccard_coefficient` / :func:`adamic_adar`.
    """
    if min_common < 1:
        raise ValueError("min_common must be >= 1")
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    adj = und.select(F.col("a").alias("w"), F.col("b").alias("x")).unionByName(
        und.select(F.col("b").alias("w"), F.col("a").alias("x"))
    )
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).alias("deg")).persist()
    centers = adj.join(deg, "w")
    if max_center_degree is not None:
        centers = centers.where(F.col("deg") <= max_center_degree)
    centers = centers.select("w", "x")
    wedges = (
        centers.alias("l")
        .join(centers.alias("r"), "w")
        .where(F.col("l.x") < F.col("r.x"))
        .select(F.col("l.x").alias("src"), F.col("r.x").alias("dst"))
    )
    common = wedges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n_common"))
    dsrc = deg.select(F.col("w").alias("src"), F.col("deg").alias("_ds"))
    ddst = deg.select(F.col("w").alias("dst"), F.col("deg").alias("_dd"))
    scored = (
        common.join(dsrc, "src")
        .join(ddst, "dst")
        .select(
            "src", "dst", "n_common",
            F.round(
                2.0 * F.col("n_common") / (F.col("_ds") + F.col("_dd")), 6
            ).alias("dice"),
        )
    )
    out = (
        scored.join(
            und.select(F.col("a").alias("src"), F.col("b").alias("dst")),
            ["src", "dst"],
            "left_anti",
        )
        .where(F.col("n_common") >= min_common)
    )
    und.unpersist()
    deg.unpersist()
    return out


def attack_curve(
    spark,
    edges: DataFrame,
    fractions=(0.0, 0.05, 0.1),
    strategy: str = "degree",
    seed: int = 42,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Robustness curve (Albert–Jeong–Barabási 2000): for each fraction
    ``f``, remove ``floor(f·|V|)`` vertices and report the surviving
    graph's size and fragmentation — the first resilience chart a
    link-graph analyst draws.  ``strategy='degree'`` is the targeted
    attack (top degree, ties → smaller id); ``strategy='random'`` is the
    AJB random-failure contrast, electing victims by md5(seed, id) —
    deterministic and SQL-reproducible, the betweenness pivot idiom.
    Returns one row per fraction: (frac, n_removed, n_vertices, n_edges,
    n_components, lcc_size).  Vertices left with no surviving edge are
    not counted (edge-list convention); components come from
    :func:`connected_components` (min-id labels, O(log² n) rounds).

    Scale: per fraction, the removal set is TakeOrderedAndProject top-k
    (never a global sort), the surviving edges are two anti-joins, and
    the component pass is the alternating-star CC; fractions are
    independent — parallel jobs on a real cluster.
    """
    import math

    if strategy not in ("degree", "random"):
        raise ValueError(f"unknown strategy {strategy!r}")
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    sym = _sym_simple(edges).persist()
    deg = sym.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("deg")).persist()
    n = deg.count()
    if strategy == "random":
        pr = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(str(seed)), F.col("id").cast("string"))), 1, 8
            ),
            16, 10,
        ).cast("long")
        ranked = deg.select("id", pr.alias("_p"))
    rows = []
    for f in fractions:
        k = int(math.floor(float(f) * n))
        if strategy == "random":
            rm = ranked.orderBy("_p", "id").limit(k).select("id")
        else:
            rm = deg.orderBy(F.col("deg").desc(), "id").limit(k).select("id")
        surv = (
            sym.join(rm.withColumnRenamed("id", "a"), "a", "left_anti")
            .join(rm.withColumnRenamed("id", "b"), "b", "left_anti")
        )
        e_und = surv.where(F.col("a") < F.col("b")).select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        )
        n_edges = e_und.count()
        if n_edges == 0:
            rows.append((float(f), k, 0, 0, 0, 0))
            continue
        # fresh manager per fraction: CC tag/step names restart at 0 on
        # every call, so sharing one manager across fractions would let
        # its per-tag step pruning collide between runs
        cc = connected_components(spark, e_und)
        st = (
            cc.groupBy("component")
            .agg(F.count(F.lit(1)).alias("sz"))
            .agg(
                F.count(F.lit(1)).alias("n_components"),
                F.sum("sz").alias("n_vertices"),
                F.max("sz").alias("lcc_size"),
            )
            .collect()[0]
        )
        rows.append(
            (float(f), k, int(st.n_vertices), int(n_edges), int(st.n_components), int(st.lcc_size))
        )
    sym.unpersist()
    deg.unpersist()
    if own_ckpt and ckpt.path is None:
        ckpt.close()
    return spark.createDataFrame(
        rows,
        "frac double, n_removed long, n_vertices long, n_edges long, "
        "n_components long, lcc_size long",
    ).orderBy("frac")


def clique_census(spark, edges: DataFrame) -> DataFrame:
    """Global clique census for sizes 2–4 — the bounded slice of igraph
    ``cliques()`` / ``motifs_randesu`` that survives web scale: one row
    (n_edges, n_triangles, n_k4) over the simple undirected graph.
    Every clique is counted exactly once via the canonical ordering
    a < b < c < d (Schank–Wagner orientation: each join extends the
    clique by its highest-id vertex, so candidate lists are bounded by
    ORIENTED degree, which hub-splitting keeps small even on power-law
    graphs — the same argument as :func:`triangle_count`).

    Scale: triangles = two equality joins on the oriented edge list;
    K4 = one more join fan-out from each triangle's top vertex plus two
    existence semi-joins — total cost Σ_tri deg⁺(c), never an all-pairs
    product; three 1-row aggregates assemble on broadcast cross joins.
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    tri = (
        und.alias("e1")
        .join(und.alias("e2"), F.col("e2.a") == F.col("e1.b"))
        .join(
            und.alias("e3"),
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
            "left_semi",
        )
        .select(F.col("e1.a").alias("a"), F.col("e1.b").alias("b"), F.col("e2.b").alias("c"))
        .persist()
    )
    k4 = (
        tri.alias("t")
        .join(und.alias("e4"), F.col("e4.a") == F.col("t.c"))
        .select("t.a", "t.b", "t.c", F.col("e4.b").alias("d"))
        .join(
            und.select(F.col("a").alias("a"), F.col("b").alias("d")),
            ["a", "d"],
            "left_semi",
        )
        .join(
            und.select(F.col("a").alias("b"), F.col("b").alias("d")),
            ["b", "d"],
            "left_semi",
        )
    )
    ne = und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    nt = tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    nk = k4.agg(F.count(F.lit(1)).cast("long").alias("n_k4"))
    out = ne.crossJoin(F.broadcast(nt)).crossJoin(F.broadcast(nk))
    out = out.localCheckpoint(eager=True)
    und.unpersist()
    tri.unpersist()
    return out


def sssp_weighted(
    spark,
    edges: DataFrame,
    src_id: int,
    rounds: int | None = None,
    max_rounds: int = 30,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Single-source WEIGHTED shortest-path distances via synchronous
    Bellman–Ford relaxation — igraph ``distances(v, weights=...)``.
    Positive weights required (the undirected symmetrisation makes any
    negative edge a negative cycle); parallel edges collapse to their
    min weight per direction, symmetrised by min.  Returns (id, dist)
    for vertices reachable within the executed rounds, 1e-6 rounded.

    ``rounds``: run EXACTLY that many relaxation rounds (the
    oracle-comparability mode, cf. :func:`k_core`); default detects the
    fixpoint (a round that improves no distance).  Rounds needed = max
    HOP count of any weighted shortest path — bounded by the longest
    cheap detour, not the unweighted diameter.

    Scale: per round one dist⋈adjacency join + per-destination min
    aggregate (map-side combinable) + one full-outer merge keyed on id;
    state is one |reached|-row table — the standard distributed SSSP
    shape (Pregel/GraphX), expressed as DataFrame algebra.
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    w = F.col("weight").cast("double") if "weight" in edges.columns else F.lit(1.0)
    e = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"), w.alias("w")).where(
        F.col("a") != F.col("b")
    )
    sym = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"), "w"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .persist()
    )
    bad = sym.where(F.col("w") <= 0).limit(1).collect()
    if bad:
        raise ValueError(f"sssp_weighted requires positive weights, got {bad[0].w!r}")
    from pyspark.sql import Observation

    dist = spark.createDataFrame([(int(src_id), 0.0)], "id long, dist double")
    dist = ckpt.save(dist, "bf_dist", 0)
    n_rounds = rounds if rounds is not None else max_rounds
    for r in range(1, n_rounds + 1):
        cand = (
            dist.join(sym.select(F.col("a").alias("id"), "b", "w"), "id")
            .select(F.col("b").alias("id"), (F.col("dist") + F.col("w")).alias("nd"))
            .groupBy("id")
            .agg(F.min("nd").alias("nd"))
        )
        merged = dist.join(cand, "id", "full_outer").select(
            "id",
            "dist",
            "nd",
            F.when(
                F.col("dist").isNull() | (F.col("nd") < F.col("dist")), F.col("nd")
            )
            .otherwise(F.col("dist"))
            .alias("new_dist"),
        )
        obs = Observation()
        merged = merged.observe(
            obs,
            F.sum(
                (
                    F.col("nd").isNotNull()
                    & (F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
                ).cast("long")
            ).alias("improved"),
        )
        dist = ckpt.save(merged.select("id", F.col("new_dist").alias("dist")), "bf_dist", r)
        improved = int(obs.get["improved"] or 0)
        ckpt.log(name="sssp", step=r, improved=improved)
        if rounds is None and improved == 0:
            break
    out = dist.select("id", F.round("dist", 6).alias("dist"))
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    sym.unpersist()
    return out


def bipartiteness(spark, edges: DataFrame, ckpt: CheckpointManager | None = None) -> DataFrame:
    """Per-component bipartiteness — igraph ``is_bipartite()`` /
    ``is_bipartite`` + component structure, via the BIPARTITE DOUBLE
    COVER reduction: vertex v splits into 2v and 2v+1, every undirected
    edge (u,v) becomes (2u, 2v+1) and (2u+1, 2v); v's two copies land in
    the same cover-component iff v's component contains an odd cycle.
    One :func:`connected_components` run on the (2|V|, 2|E|) cover does
    all the work — no new iteration logic, O(log² n) rounds.  The
    original component label recovers as
    ``min(cc(2v), cc(2v+1)) // 2``.  Returns one row per component:
    (component, n_vertices, is_bipartite).
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    cover = und.select(
        (2 * F.col("a")).alias("src"), (2 * F.col("b") + 1).alias("dst")
    ).unionByName(
        und.select((2 * F.col("a") + 1).alias("src"), (2 * F.col("b")).alias("dst"))
    )
    cc = connected_components(spark, cover, ckpt=ckpt)
    per_v = (
        cc.select((F.col("id") / 2).cast("long").alias("v"),
                  (F.col("id") % 2).alias("side"), "component")
        .groupBy("v")
        .agg(
            F.min("component").alias("c0"),
            F.max("component").alias("c1"),
        )
    )
    return (
        per_v.select(
            (F.col("c0") / 2).cast("long").alias("component"),
            "v",
            (F.col("c0") != F.col("c1")).alias("two_sided"),
        )
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vertices"),
            F.min(F.col("two_sided").cast("int")).cast("boolean").alias("is_bipartite"),
        )
    )


def core_periphery_fit(spark, edges: DataFrame, core: DataFrame) -> DataFrame:
    """Borgatti–Everett (2000) discrete core–periphery fit: the phi
    (Pearson) correlation between the observed adjacency and the ideal
    pattern "every pair except periphery–periphery is tied", for a given
    ``core`` vertex set (one column ``id``).  The correlation over all
    C(|V|,2) dyads reduces to a closed form over FOUR scalars — |V|,
    |core∩V|, |E|, and the periphery–periphery edge count — so nothing
    pairwise is ever enumerated.  Returns one row
    (n_core, n_periphery, n_edges, edges_pp, phi); phi is NULL when the
    2×2 contingency degenerates (all-core or all-periphery).

    Scale: one degree-table distinct, one semi-join to mark core
    membership, one edge aggregate, 1-row scalars on broadcast cross
    joins.
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    verts = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .distinct()
    )
    cset = verts.join(core.select("id").distinct(), "id", "left_semi")
    nv = verts.agg(F.count(F.lit(1)).cast("double").alias("n"))
    nc = cset.agg(F.count(F.lit(1)).cast("double").alias("n_core"))
    marked = (
        und.join(cset.select(F.col("id").alias("a"), F.lit(1).alias("ca")), "a", "left")
        .join(cset.select(F.col("id").alias("b"), F.lit(1).alias("cb")), "b", "left")
    )
    em = marked.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum(
            (F.col("ca").isNull() & F.col("cb").isNull()).cast("double")
        ).alias("e_pp"),
    )
    out = nv.crossJoin(F.broadcast(nc)).crossJoin(F.broadcast(em)).select(
        "n", "n_core", "m", "e_pp",
        (F.col("n") - F.col("n_core")).alias("n_per"),
    )
    # 2x2 dyad contingency from the four scalars: pattern-1 dyads are
    # all pairs minus periphery-periphery pairs
    out = out.select(
        "*",
        (F.col("n") * (F.col("n") - 1) / 2).alias("t"),
        (F.col("n_per") * (F.col("n_per") - 1) / 2).alias("t_pp"),
    ).select(
        "*",
        (F.col("m") - F.col("e_pp")).alias("n11"),
        F.col("e_pp").alias("n10"),
        (F.col("t") - F.col("t_pp") - (F.col("m") - F.col("e_pp"))).alias("n01"),
        (F.col("t_pp") - F.col("e_pp")).alias("n00"),
    )
    den = F.sqrt(
        (F.col("n11") + F.col("n10"))
        * (F.col("n01") + F.col("n00"))
        * (F.col("n11") + F.col("n01"))
        * (F.col("n10") + F.col("n00"))
    )
    return out.select(
        F.col("n_core").cast("long").alias("n_core"),
        F.col("n_per").cast("long").alias("n_periphery"),
        F.col("m").cast("long").alias("n_edges"),
        F.col("e_pp").cast("long").alias("edges_pp"),
        F.round(
            F.when(
                den > 0,
                (F.col("n11") * F.col("n00") - F.col("n10") * F.col("n01")) / den,
            ),
            6,
        ).alias("phi"),
    )


def edge_clustering(spark, edges: DataFrame) -> DataFrame:
    """Radicchi et al. (2004) edge clustering coefficient — the
    weak-tie/bridge detector their divisive community method peels:
    per undirected edge, ``(triangles_through_edge + 1) /
    min(deg_a − 1, deg_b − 1)`` (the +1 is Radicchi's convention so
    never-in-a-triangle edges still rank; degenerate min(...)=0 pairs —
    pendant edges — return NULL, they cannot close a triangle).  Low
    values mark inter-community bridges.  Returns (a, b, n_triangles,
    ecc), 1e-6 rounded.

    Scale: per-edge triangle counts come from the same oriented wedge
    join as :func:`triangle_count` (bounded by oriented degree), then
    one broadcast-friendly degree attach — no per-vertex windows.
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # triangles (x<y<z): each contributes to its three edges
    tri = (
        und.alias("e1")
        .join(und.alias("e2"), F.col("e2.a") == F.col("e1.b"))
        .join(
            und.alias("e3"),
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
            "left_semi",
        )
        .select(F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z"))
    )
    per_edge = (
        tri.select(F.col("x").alias("a"), F.col("y").alias("b"))
        .unionByName(tri.select(F.col("x").alias("a"), F.col("z").alias("b")))
        .unionByName(tri.select(F.col("y").alias("a"), F.col("z").alias("b")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    out = (
        und.join(per_edge, ["a", "b"], "left")
        .na.fill({"n_triangles": 0})
        .join(deg.select(F.col("id").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            "a", "b",
            F.col("n_triangles").cast("long").alias("n_triangles"),
            F.round(
                F.when(
                    F.least(F.col("da"), F.col("db")) > 1,
                    (F.col("n_triangles") + 1.0)
                    / (F.least(F.col("da"), F.col("db")) - 1.0),
                ),
                6,
            ).alias("ecc"),
        )
    )
    out = out.localCheckpoint(eager=True)
    und.unpersist()
    return out


def molloy_reed(spark, edges: DataFrame) -> DataFrame:
    """Molloy–Reed giant-component criterion: one row with the degree
    moments ``<k>``, ``<k²>``, ``kappa = <k²>/<k>``, and the criterion
    value ``kappa − 2`` (a giant component exists in the configuration
    model iff it is positive; its inverse also governs the random-
    failure percolation threshold f_c = 1 − 1/(kappa − 1), reported when
    defined).  The network-science one-liner every robustness analysis
    starts with.  Returns (n_vertices, mean_k, mean_k2, kappa, f_c).

    Scale: one degree hash-aggregate + one 1-row moment aggregate.
    """
    deg = _sym_simple(edges).groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).cast("double").alias("k")
    )
    return deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices"),
        F.round(F.avg("k"), 6).alias("mean_k"),
        F.round(F.avg(F.col("k") * F.col("k")), 6).alias("mean_k2"),
        F.round(F.avg(F.col("k") * F.col("k")) / F.avg("k"), 6).alias("kappa"),
        F.round(
            F.when(
                F.avg(F.col("k") * F.col("k")) / F.avg("k") > 2,
                1.0 - 1.0 / (F.avg(F.col("k") * F.col("k")) / F.avg("k") - 1.0),
            ),
            6,
        ).alias("f_c"),
    )


def knnk(spark, edges: DataFrame) -> DataFrame:
    """Degree-correlation function k_nn(k) — the SECOND output of igraph
    ``knn()`` (Barrat et al. 2004): for each degree value k, the mean
    over degree-k vertices of their average-neighbour degree.  A rising
    curve = assortative mixing, falling = hubs feed leaves; this is the
    curve behind the scalar assortativity coefficient.  Returns
    (degree, n_vertices, knnk), 1e-6 rounded.

    Scale: the avg_neighbor_degree gather (degree agg + one adjacency⋈
    degree join + per-vertex mean, all combinable) plus ONE more hash
    aggregate keyed by degree — output ≤ max-degree rows.
    """
    und = _und_weighted(edges)
    adj = und.select(F.col("a").alias("id"), F.col("b").alias("nb")).unionByName(
        und.select(F.col("b").alias("id"), F.col("a").alias("nb"))
    )
    deg = adj.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))
    nb_deg = adj.join(
        deg.select(F.col("id").alias("nb"), F.col("degree").alias("nd")), "nb"
    )
    per_v = nb_deg.groupBy("id").agg(F.avg("nd").alias("knn_v")).join(deg, "id")
    return (
        per_v.groupBy("degree")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vertices"),
            F.round(F.avg("knn_v"), 6).alias("knnk"),
        )
        .select(F.col("degree").cast("long").alias("degree"), "n_vertices", "knnk")
    )


def degree_gini(spark, edges: DataFrame) -> DataFrame:
    """Gini coefficient of the degree distribution — the attention-
    inequality scalar of a link graph (0 = egalitarian, →1 = a few hubs
    hold every edge).  Computed exactly from the GROUPED degree
    histogram: each degree value's individuals take consecutive ranks,
    so Σ rank·k over individuals = m·k·(cum_before + (m+1)/2) and
    ``G = 2·S/(n·T) − (n+1)/n``.  Returns one row (n_vertices, mean_k,
    gini), 1e-6 rounded.

    Scale: one degree hash-agg, one histogram hash-agg, then a window
    over DISTINCT degree values (≤ max degree, bounded-side contract)
    and a 1-row combine.
    """
    from pyspark.sql import Window

    deg = _sym_simple(edges).groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).alias("k")
    )
    hist = deg.groupBy("k").agg(F.count(F.lit(1)).alias("m"))
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    ranked = hist.withColumn("cum_before", F.coalesce(F.sum("m").over(w), F.lit(0)))
    return ranked.agg(
        F.sum("m").cast("long").alias("n_vertices"),
        F.round(F.sum(F.col("k") * F.col("m")) / F.sum("m"), 6).alias("mean_k"),
        F.round(
            2.0
            * F.sum(
                F.col("m") * F.col("k") * (F.col("cum_before") + (F.col("m") + 1.0) / 2.0)
            )
            / (F.sum("m") * F.sum(F.col("k") * F.col("m")))
            - (F.sum("m") + 1.0) / F.sum("m"),
            6,
        ).alias("gini"),
    )


def balance_census(spark, edges: DataFrame) -> DataFrame:
    """Heider/Cartwright–Harary structural-balance census over a SIGNED
    simple graph (the signed layers the reference splits for
    positive/negative-layer Leiden, `functions.py` layer split): count
    triangles by sign pattern (+++ / ++− / +−− / −−−); balanced
    triangles have an EVEN number of negative edges, and the balance
    ratio is their share.  Edge sign = sign of the summed weight per
    canonical pair (ties/zeros dropped as unsigned).  Returns one row
    (n_ppp, n_ppm, n_pmm, n_mmm, n_triangles, balance_ratio).

    Scale: the canonical a<b<c wedge join of :func:`triangle_count`
    carrying one extra sign column per side — same oriented-degree
    bound, plus a 4-way conditional 1-row aggregate.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col("weight").cast("double").alias("w"),
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
        .where(F.col("w") != 0)
        .select("a", "b", F.signum("w").alias("s"))
        .persist()
    )
    tri = (
        und.alias("e1")
        .join(und.alias("e2"), F.col("e2.a") == F.col("e1.b"))
        .join(
            und.alias("e3"),
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.s").alias("s1"), F.col("e2.s").alias("s2"), F.col("e3.s").alias("s3")
        )
    )
    neg = (
        (F.col("s1") < 0).cast("int")
        + (F.col("s2") < 0).cast("int")
        + (F.col("s3") < 0).cast("int")
    )
    out = tri.select(neg.alias("n_neg")).agg(
        F.sum((F.col("n_neg") == 0).cast("long")).alias("n_ppp"),
        F.sum((F.col("n_neg") == 1).cast("long")).alias("n_ppm"),
        F.sum((F.col("n_neg") == 2).cast("long")).alias("n_pmm"),
        F.sum((F.col("n_neg") == 3).cast("long")).alias("n_mmm"),
        F.count(F.lit(1)).cast("long").alias("n_triangles"),
        F.round(
            F.sum((F.col("n_neg") % 2 == 0).cast("double")) / F.count(F.lit(1)), 6
        ).alias("balance_ratio"),
    )
    out = out.localCheckpoint(eager=True)
    und.unpersist()
    return out


def butterfly_census(
    spark,
    edges: DataFrame,
    max_center_degree: int | None = 100_000,
) -> DataFrame:
    """Butterfly (2x2-biclique / rectangle) census of a DIRECTED
    bipartite graph ``left -> right`` — the bipartite analogue of the
    triangle census (Wang et al. "Butterfly Counting in Bipartite
    Networks", ParButterfly; no reference counterpart — leidenalg's
    bipartite CPM 3-layer construction `VertexPartition.py:950-1105`
    consumes exactly such graphs, and the butterfly count is the
    standard cohesion diagnostic for them).

    A butterfly is a vertex pair (u1,u2) on the left sharing TWO right
    endpoints (t1,t2) — all four edges present.  Returns one row:
    ``n_left, n_right, n_edges, wedges, butterflies, caterpillars,
    bcc`` where ``wedges`` = Σ_u C(deg u, 2) (left-centered paths of
    length 2), ``caterpillars`` = Σ_{(u,t)∈E} (deg u −1)(deg t −1)
    (paths of length 3) and ``bcc = 4·butterflies / caterpillars`` is
    the bipartite clustering coefficient (Lind et al. 2005).

    Scale shape: the wedge self-join is CENTERED ON THE LEFT side —
    cost Σ_u deg(u)², the side with bounded degree in the user→type
    graph (a type hub of degree |users| never becomes a join center;
    centering right would cost Σ_t deg(t)², quadratic in the hub).
    ``max_center_degree`` guards pathological left hubs, the pair
    aggregate is map-side combinable, and every other term is a plain
    grouped aggregate.  One shuffle join + three 1-row aggregates.
    """
    de = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    ldeg = de.groupBy("src").agg(F.count(F.lit(1)).alias("ld"))
    rdeg = de.groupBy("dst").agg(F.count(F.lit(1)).alias("rd"))
    adj = de
    if max_center_degree is not None:
        adj = (
            de.join(ldeg, "src")
            .where(F.col("ld") <= max_center_degree)
            .select("src", "dst")
        )
    pairs = (
        adj.alias("l")
        .join(adj.alias("r"), "src")
        .where(F.col("l.dst") < F.col("r.dst"))
        .groupBy(F.col("l.dst").alias("t1"), F.col("r.dst").alias("t2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bfly = pairs.agg(
        F.coalesce(F.sum(F.col("c") * (F.col("c") - 1) / 2), F.lit(0.0))
        .cast("long")
        .alias("butterflies")
    )
    base = de.join(ldeg, "src").join(rdeg, "dst").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.countDistinct("src").cast("long").alias("n_left"),
        F.countDistinct("dst").cast("long").alias("n_right"),
        F.sum((F.col("ld") - 1) * (F.col("rd") - 1)).cast("long").alias("caterpillars"),
    )
    wdg = ldeg.agg(
        F.coalesce(F.sum(F.col("ld") * (F.col("ld") - 1) / 2), F.lit(0.0))
        .cast("long")
        .alias("wedges")
    )
    out = (
        base.crossJoin(F.broadcast(wdg))
        .crossJoin(F.broadcast(bfly))
        .select(
            "n_left",
            "n_right",
            "n_edges",
            "wedges",
            "butterflies",
            "caterpillars",
            F.round(
                F.when(
                    F.col("caterpillars") > 0,
                    4.0 * F.col("butterflies") / F.col("caterpillars"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("bcc"),
        )
    )
    out = out.localCheckpoint(eager=True)
    de.unpersist()
    return out


def line_graph(
    spark,
    edges: DataFrame,
    max_via_degree: int | None = 100_000,
) -> DataFrame:
    """Directed line graph (igraph ``linegraph``): each arc of G becomes
    a vertex of L(G), and L(G) has an edge from arc (a→b) to arc (b→c)
    — head-of-one meets tail-of-the-next.  Arcs are identified by their
    endpoint pair rather than an opaque id, so the output schema is the
    triple ``(a, b, c)`` = line-edge from (a,b) to (b,c); the reverse
    hop c == a is included, exactly as igraph does.  Self-loops and
    parallel arcs are dropped first (simple directed graph).

    Scale shape: ONE equality self-join on the via vertex ``b`` — the
    fan-out at b is indeg(b)·outdeg(b), so a tool-hub vertex with both
    high in- and out-degree is quadratic; ``max_via_degree`` drops
    those hubs from the VIA position only (they still appear as a/c
    endpoints), mirroring the ``max_center_degree`` guard of the
    linkpred kernels.  Everything else is a projection.
    """
    de = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    if max_via_degree is not None:
        ind = de.groupBy("dst").agg(F.count(F.lit(1)).alias("din"))
        outd = de.groupBy("src").agg(F.count(F.lit(1)).alias("dout"))
        ok = (
            ind.join(outd, ind["dst"] == outd["src"])
            .where((F.col("din") <= max_via_degree) & (F.col("dout") <= max_via_degree))
            .select(F.col("dst").alias("via"))
        )
        left = de.join(ok, de["dst"] == ok["via"]).select("src", "dst")
    else:
        left = de
    return (
        left.alias("l")
        .join(de.alias("r"), F.col("l.dst") == F.col("r.src"))
        .select(
            F.col("l.src").alias("a"),
            F.col("l.dst").alias("b"),
            F.col("r.dst").alias("c"),
        )
    )


def salsa(
    spark,
    edges: DataFrame,
    max_iter: int = 4,
    ckpt: CheckpointManager | None = None,
    ckpt_every: int = 2,
) -> DataFrame:
    """SALSA (Lempel & Moran 2001, "Stochastic Approach for Link-
    Structure Analysis") — the stochastic sibling of HITS: authority
    scores are propagated through the alternating bipartite random
    walk hub→authority→hub with DEGREE-NORMALISED transitions
    (a ← Aᵀ D_out⁻¹ h, h ← A D_in⁻¹ a) instead of HITS's raw adjacency
    products, so hubs split their vote instead of multiplying it —
    the TKC-effect fix.  Unweighted simple arcs, uniform start over
    hub-side vertices, ``max_iter`` synchronous rounds.  Returns
    (id, hub, authority) for every vertex, absent side = 0.0.

    Scale shape: identical to :func:`hits` — two PageRank-shaped
    join+aggregate exchanges per round, map-side combinable; the
    column-stochastic transitions keep scores summing to 1, so no
    normalisation cross join is ever needed; lineage truncates at
    checkpoint barriers every ``ckpt_every`` rounds.
    """
    if max_iter < 1:
        raise ValueError("max_iter must be positive")
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    de = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    outd = de.groupBy("src").agg(F.count(F.lit(1)).alias("dout"))
    ind = de.groupBy("dst").agg(F.count(F.lit(1)).alias("din"))
    # arcs decorated with both transition denominators, reused each round
    arcs = de.join(outd, "src").join(ind, "dst").persist()
    n_hubs = outd.count()
    verts = _vertices(de).persist()
    h = outd.select(F.col("src").alias("id"), F.lit(1.0 / n_hubs).alias("hub"))
    a = None
    for t in range(1, max_iter + 1):
        a = (
            arcs.join(h.select(F.col("id").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("hub") / F.col("dout")).alias("authority"))
        )
        barrier = t % ckpt_every == 0 or t == max_iter
        if barrier:
            a = ckpt.save(a, "salsa_auth", t)
        h = (
            arcs.join(a.select(F.col("id").alias("dst"), "authority"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum(F.col("authority") / F.col("din")).alias("hub"))
        )
        if barrier:
            h = ckpt.save(h, "salsa_hub", t)
    out = (
        verts.join(h, "id", "left")
        .join(a, "id", "left")
        .select(
            "id",
            F.round(F.coalesce("hub", F.lit(0.0)), 6).alias("hub"),
            F.round(F.coalesce("authority", F.lit(0.0)), 6).alias("authority"),
        )
    )
    if own_ckpt and ckpt.path is None:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    de.unpersist()
    arcs.unpersist()
    verts.unpersist()
    return out


def markov_chain_stats(spark, edges: DataFrame) -> DataFrame:
    """Plug-in Markov-chain information measures over a weighted
    directed transition graph (weight = observed transition count):
    the entropy RATE H = −Σ_ij p̂_i P̂_ij log₂ P̂_ij with p̂ the
    empirical source distribution and P̂ the row-normalised counts —
    i.e. bits per step needed to predict the next state (Cover &
    Thomas ch. 4, the standard plug-in estimator), its perplexity
    2^H (effective branching factor of the behaviour), and the
    entropy of p̂ itself for contrast.  On transcript-derived
    event-type chains this measures how predictable agent/tool
    sequences are.  Returns one row: ``n_states, n_transitions,
    entropy_rate_bits, perplexity, stationary_entropy_bits``.

    Scale shape: one (src,dst) count aggregate, one src-keyed
    normaliser join, three 1-row combines on broadcast cross joins —
    no iteration, no windows, fully map-side combinable.
    """
    e = (
        edges.select("src", "dst", F.col("weight").cast("double").alias("w"))
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .persist()
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("ow"))
    tot = e.agg(F.sum("w").alias("tw"))
    states = (
        e.select(F.col("src").alias("id"))
        .union(e.select("dst"))
        .agg(F.countDistinct("id").cast("long").alias("n_states"))
    )
    rate = (
        e.join(outw, "src")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum("w").cast("long").alias("n_transitions"),
            (-F.sum((F.col("w") / F.col("tw")) * F.log2(F.col("w") / F.col("ow"))))
            .alias("h_rate"),
        )
    )
    stat = (
        outw.crossJoin(F.broadcast(tot))
        .agg(
            (-F.sum((F.col("ow") / F.col("tw")) * F.log2(F.col("ow") / F.col("tw"))))
            .alias("h_stat")
        )
    )
    out = (
        rate.crossJoin(F.broadcast(states))
        .crossJoin(F.broadcast(stat))
        .select(
            "n_states",
            "n_transitions",
            F.round("h_rate", 6).alias("entropy_rate_bits"),
            F.round(F.pow(F.lit(2.0), F.col("h_rate")), 6).alias("perplexity"),
            F.round("h_stat", 6).alias("stationary_entropy_bits"),
        )
    )
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    return out


def assortativity_numeric(
    spark, edges: DataFrame, values: DataFrame
) -> DataFrame:
    """Numeric-attribute assortativity (igraph ``assortativity`` with a
    ``values`` vector, Newman 2003 eq. 21): the WEIGHTED Pearson
    correlation of a numeric vertex attribute across the two endpoints
    of every directed edge — do high-value vertices link to high-value
    vertices?  Completes the assortativity family next to the degree
    (Newman 2002) and nominal (mixing-matrix) variants.  ``values``
    carries (id, x); edges missing an attribute on either end drop.
    Returns one row (assortativity — NULL when either marginal has
    zero variance).

    Scale: two id-keyed attribute joins into a single weighted 1-row
    moment reduction (Σw, Σwx, Σwy, Σwx², Σwy², Σwxy — all map-side
    combinable); no quadratic stage, no Python.
    """
    e = edges.select("src", "dst", F.col("weight").cast("double").alias("w"))
    paired = (
        e.join(values.select(F.col("id").alias("src"), F.col("x").alias("xa")), "src")
        .join(values.select(F.col("id").alias("dst"), F.col("x").alias("xb")), "dst")
    )
    m = paired.agg(
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("xa")).alias("sx"),
        F.sum(F.col("w") * F.col("xb")).alias("sy"),
        F.sum(F.col("w") * F.col("xa") * F.col("xa")).alias("sxx"),
        F.sum(F.col("w") * F.col("xb") * F.col("xb")).alias("syy"),
        F.sum(F.col("w") * F.col("xa") * F.col("xb")).alias("sxy"),
    )
    cov = F.col("sxy") / F.col("sw") - (F.col("sx") / F.col("sw")) * (F.col("sy") / F.col("sw"))
    vx = F.col("sxx") / F.col("sw") - (F.col("sx") / F.col("sw")) * (F.col("sx") / F.col("sw"))
    vy = F.col("syy") / F.col("sw") - (F.col("sy") / F.col("sw")) * (F.col("sy") / F.col("sw"))
    return m.select(
        F.when(
            (vx > 0) & (vy > 0), F.round(cov / F.sqrt(vx * vy), 6)
        ).alias("assortativity")
    )


def graph_center(
    spark,
    edges: DataFrame,
    max_dist: int = 3,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Graph radius and center (igraph ``radius()`` / center = argmin
    eccentricity): the vertices from which the whole graph is nearest,
    under the same ``max_dist`` truncation protocol as
    :func:`eccentricity` (values below the cap exact, at the cap a
    lower bound).  Returns one row per center vertex ``(id, radius,
    diameter_lb)`` — radius = min ecc, diameter_lb = max ecc.

    Scale: the eccentricity BFS plus one 1-row min/max combine riding
    a broadcast cross join back onto the (id, ecc) table; the filter
    keeps |center| rows.
    """
    ecc = eccentricity(spark, edges, max_dist=max_dist, ckpt=ckpt)
    scal = ecc.agg(
        F.min("ecc").cast("long").alias("radius"),
        F.max("ecc").cast("long").alias("diameter_lb"),
    )
    return (
        ecc.crossJoin(F.broadcast(scal))
        .where(F.col("ecc") == F.col("radius"))
        .select("id", "radius", "diameter_lb")
    )


def graph_sparsify(
    spark,
    edges: DataFrame,
    c: float = 4.0,
    seed: int = 42,
) -> DataFrame:
    """Degree-proportional spectral-style edge sparsification: keep
    edge (u,v) with probability p_uv = min(1, c·(1/d_u + 1/d_v)) and
    reweight kept edges by w/p — the standard unbiased sparsifier
    heuristic (1/d_u + 1/d_v upper-bounds effective resistance on
    expanders, cf. Spielman–Srivastava; every cut's expected weight is
    preserved).  Low-degree edges (bridges, leaves) survive with p=1;
    only hub-hub bulk thins out.  The coin is the md5 of
    (seed, u, v) — deterministic, replayable, append-stable.
    Returns the sparsified ``(src, dst, weight, p_keep)``.

    Scale shape: one degree aggregate + two id-keyed joins + a
    filter — linear, no shuffle beyond the degree attach; the md5
    coin keeps reruns and engine twins bit-identical.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col("weight").cast("double").alias("w"),
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("double").alias("d"))
    )
    key = F.md5(
        F.concat(
            F.lit(f"{seed}:"),
            F.col("a").cast("string"),
            F.lit(":"),
            F.col("b").cast("string"),
        )
    )
    u01 = (F.conv(F.substring(key, 1, 8), 16, 10).cast("double") + 1.0) / 4294967296.0
    p = F.least(F.lit(1.0), F.lit(float(c)) * (1.0 / F.col("da") + 1.0 / F.col("db")))
    return (
        und.join(deg.select(F.col("id").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("d").alias("db")), "b")
        .select("a", "b", "w", F.round(p, 9).alias("p_keep"), u01.alias("u"))
        .where(F.col("u") <= F.col("p_keep"))
        .select(
            F.col("a").alias("src"),
            F.col("b").alias("dst"),
            F.round(F.col("w") / F.col("p_keep"), 6).alias("weight"),
            F.round("p_keep", 6).alias("p_keep"),
        )
    )


def onion_layers(
    spark,
    edges: DataFrame,
    rounds: int = 10,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Onion decomposition (Hébert-Dufresne, Grochow & Allard 2016):
    the peel-wave refinement of the k-core numbers — wave r removes
    every vertex whose remaining degree is ≤ the running core
    threshold k (k = max(k, current min degree)), so two vertices with
    the same coreness can sit in very different layers (early = true
    periphery, late = near the core's surface).  Returns ``(id,
    layer, k_at_peel)``; vertices still unpeeled after ``rounds``
    waves report layer = rounds+1 with NULL k (the same truncation
    protocol as coreness/k_core — the DuckDB twin unrolls identical
    waves).

    Scale shape: per wave one degree aggregate over the remaining
    graph, one 1-row min (the only driver action), one threshold
    filter and two id-keyed semi-joins to contract the graph — the
    k_core peel loop with a layer counter; per-wave lineage truncation
    via the checkpoint.
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    sym = _sym_simple(edges).persist()
    rem_e = sym
    rem_v = sym.select(F.col("a").alias("id")).distinct()
    k = 0
    picks = []
    for r in range(1, rounds + 1):
        d = rem_e.groupBy(F.col("a").alias("id")).agg(
            F.count(F.lit(1)).cast("long").alias("d")
        )
        deg = rem_v.join(d, "id", "left").select(
            "id", F.coalesce("d", F.lit(0)).cast("long").alias("d")
        )
        deg = ckpt.save(deg, "onion_deg", r)
        mn = deg.agg(F.min("d")).first()[0]
        if mn is None:
            break
        k = max(k, int(mn))
        # each pick materialises under its own per-round tag — the
        # shared-tag keep window prunes steps older than 2, and the
        # final union must still read every wave
        picks.append(
            ckpt.save(
                deg.where(F.col("d") <= k).select(
                    "id",
                    F.lit(r).cast("long").alias("layer"),
                    F.lit(k).cast("long").alias("k_at_peel"),
                ),
                f"onion_pick_{r}",
                0,
            )
        )
        rem_v = ckpt.save(deg.where(F.col("d") > k).select("id"), "onion_verts", r)
        rem_e = (
            rem_e.join(rem_v.select(F.col("id").alias("a")), "a")
            .join(rem_v.select(F.col("id").alias("b")), "b")
        )
        rem_e = ckpt.save(rem_e, "onion_edges", r)
    leftovers = rem_v.select(
        "id",
        F.lit(rounds + 1).cast("long").alias("layer"),
        F.lit(None).cast("long").alias("k_at_peel"),
    )
    out = leftovers
    for p in picks:
        out = out.unionByName(p)
    out = out.localCheckpoint(eager=True)
    sym.unpersist()
    if own_ckpt and ckpt.path is None:
        ckpt.close()
    return out


def bowtie_decomposition(
    spark,
    edges: DataFrame,
    max_rounds: int = 20,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Bow-tie decomposition of a directed graph (Broder et al. 2000,
    "Graph structure in the Web" — THE web-graph macro-structure
    statistic): the giant SCC is the CORE, vertices that reach it form
    IN, vertices it reaches form OUT, everything else (tendrils,
    tubes, disconnected) is OTHER.  Returns per-vertex ``(id, cls)``
    with cls ∈ {core, in, out, other}; giant = largest SCC, ties by
    smallest component label.

    Scale shape: one SCC run (the Orzan coloring kernel), then two
    frontier BFS sweeps seeded at the core (forward on arcs, backward
    on reversed arcs) — each round one equality join + anti-join
    dedup, geometrically shrinking frontier, per-round checkpoint
    truncation; classification is three id-keyed left joins.
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    de = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct().persist()
    scc = strongly_connected_components(spark, de.withColumn("weight", F.lit(1.0)), ckpt=ckpt)
    giant = (
        scc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("component"))
        .limit(1)
        .select("component")
    )
    core = scc.join(F.broadcast(giant), "component").select("id")
    core = ckpt.save(core, "bowtie_core", 0)

    def _reach(arcs, tag):
        visited = core
        frontier = core
        for r in range(1, max_rounds + 1):
            nxt = (
                arcs.join(frontier.select(F.col("id").alias("src")), "src")
                .select(F.col("dst").alias("id"))
                .distinct()
                .join(visited, "id", "left_anti")
            )
            nxt = ckpt.save(nxt, f"bowtie_{tag}_frontier", r)
            if nxt.limit(1).count() == 0:
                break
            visited = ckpt.save(visited.unionByName(nxt), f"bowtie_{tag}_visited", r)
            frontier = nxt
        return visited

    fwd = _reach(de, "fwd")
    bwd = _reach(de.select(F.col("dst").alias("src"), F.col("src").alias("dst")), "bwd")
    verts = _vertices(de.withColumn("weight", F.lit(1.0)))
    out = (
        verts.join(core.withColumn("c", F.lit(1)), "id", "left")
        .join(bwd.withColumn("b", F.lit(1)).select("id", "b"), "id", "left")
        .join(fwd.withColumn("f", F.lit(1)).select("id", "f"), "id", "left")
        .select(
            "id",
            F.when(F.col("c").isNotNull(), F.lit("core"))
            .when(F.col("b").isNotNull(), F.lit("in"))
            .when(F.col("f").isNotNull(), F.lit("out"))
            .otherwise(F.lit("other"))
            .alias("cls"),
        )
    )
    out = out.localCheckpoint(eager=True)
    de.unpersist()
    if own_ckpt and ckpt.path is None:
        ckpt.close()
    return out


def s_core(
    spark,
    edges: DataFrame,
    rounds: int = 6,
    scale: float = 1.0,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """s-core decomposition (Eidsaa & Almaas 2013, "s-core network
    decomposition") — the weighted generalisation of the k-core peel:
    wave r removes every vertex whose remaining STRENGTH (incident
    weight sum) is ≤ the running threshold s (s = max(s, current min
    strength)), so heavy-tie cores survive where sheer degree would
    not.  ``scale`` multiplies weights before thresholding (use 1 for
    raw weights).  Returns ``(id, layer, s_at_peel)`` with the same
    truncation protocol as :func:`onion_layers` (layer rounds+1, NULL
    threshold for the unpeeled rest).  Thresholds round to 6dp so the
    peel trajectory is engine-portable.

    Scale shape: identical to the onion loop — per wave one strength
    aggregate, one 1-row min (the only driver action), a threshold
    filter + two id-keyed semi-joins; per-wave checkpoint truncation.
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            (F.col("weight").cast("double") * float(scale)).alias("w"),
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
    ).persist()
    rem_e = sym
    rem_v = sym.select(F.col("a").alias("id")).distinct()
    s = 0.0
    picks = []
    for r in range(1, rounds + 1):
        st = rem_e.groupBy(F.col("a").alias("id")).agg(
            F.round(F.sum("w"), 6).alias("s")
        )
        deg = rem_v.join(st, "id", "left").select(
            "id", F.coalesce("s", F.lit(0.0)).alias("s")
        )
        deg = ckpt.save(deg, "score_deg", r)
        mn = deg.agg(F.min("s")).first()[0]
        if mn is None:
            break
        s = max(s, float(mn))
        # per-round pick tags — see onion_layers: the shared-tag keep
        # window would prune the early waves out from under the union
        picks.append(
            ckpt.save(
                deg.where(F.col("s") <= s).select(
                    "id",
                    F.lit(r).cast("long").alias("layer"),
                    F.round(F.lit(s), 6).alias("s_at_peel"),
                ),
                f"score_pick_{r}",
                0,
            )
        )
        rem_v = ckpt.save(deg.where(F.col("s") > s).select("id"), "score_verts", r)
        rem_e = (
            rem_e.join(rem_v.select(F.col("id").alias("a")), "a")
            .join(rem_v.select(F.col("id").alias("b")), "b")
        )
        rem_e = ckpt.save(rem_e, "score_edges", r)
    leftovers = rem_v.select(
        "id",
        F.lit(rounds + 1).cast("long").alias("layer"),
        F.lit(None).cast("double").alias("s_at_peel"),
    )
    out = leftovers
    for p in picks:
        out = out.unionByName(p)
    out = out.localCheckpoint(eager=True)
    sym.unpersist()
    if own_ckpt and ckpt.path is None:
        ckpt.close()
    return out


def truss_layers(
    spark,
    edges: DataFrame,
    rounds: int = 6,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Truss decomposition by synchronized peel waves — the edge
    analogue of :func:`onion_layers` and the decomposition view of
    :func:`k_truss` (PATRIC-style distributed peeling): wave r removes
    every edge whose support (triangles through it in the CURRENT
    graph) is ≤ t−2 with t = max(t, min support + 2), so an edge's
    ``trussness`` is exactly the largest k whose k-truss contains it
    (synchronized waves at a fixed t realise the cascade).  Returns
    ``(a, b, layer, trussness)``; edges surviving ``rounds`` waves
    report layer rounds+1 with NULL trussness (truncation protocol as
    onion/coreness — the DuckDB twin unrolls identical waves).

    Scale shape: per wave ONE wedge join for supports (bounded by
    Σ deg·deg over surviving edges — the k_truss shape), a 1-row min
    (the only driver action), a threshold filter; per-wave pick tags
    sidestep the checkpoint keep window.
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    e = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    e = ckpt.save(e, "truss_edges", 0)

    def _sup(cur):
        sym = cur.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            cur.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        s1 = sym.select(F.col("u").alias("a"), F.col("v").alias("x"))
        s2 = sym.select(F.col("u").alias("b"), F.col("v").alias("x"))
        c = (
            cur.join(s1, "a")
            .join(s2, ["b", "x"])
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("sup"))
        )
        return cur.join(c, ["a", "b"], "left").select(
            "a", "b", F.coalesce("sup", F.lit(0)).cast("long").alias("sup")
        )

    t = 2
    picks = []
    for r in range(1, rounds + 1):
        sup = ckpt.save(_sup(e), "truss_sup", r)
        mn = sup.agg(F.min("sup")).first()[0]
        if mn is None:
            break
        t = max(t, int(mn) + 2)
        picks.append(
            ckpt.save(
                sup.where(F.col("sup") <= t - 2).select(
                    "a",
                    "b",
                    F.lit(r).cast("long").alias("layer"),
                    F.lit(t).cast("long").alias("trussness"),
                ),
                f"truss_pick_{r}",
                0,
            )
        )
        e = ckpt.save(sup.where(F.col("sup") > t - 2).select("a", "b"), "truss_edges", r)
    leftovers = e.select(
        "a",
        "b",
        F.lit(rounds + 1).cast("long").alias("layer"),
        F.lit(None).cast("long").alias("trussness"),
    )
    out = leftovers
    for p in picks:
        out = out.unionByName(p)
    out = out.localCheckpoint(eager=True)
    if own_ckpt and ckpt.path is None:
        ckpt.close()
    return out


def triangles_sorted(spark, edges: DataFrame) -> DataFrame:
    """Enumerate every triangle once as a sorted triple (x < y < z).

    Runs the degree-oriented wedge join of :func:`triangle_count` (work
    bounded by Σ deg_out² on the orientation DAG, max out-degree ≈ √m)
    and canonicalises each hit with ``array_sort`` — so the OUTPUT is
    orientation-independent and reproducible by any engine that joins
    the id-ordered edge table three ways.
    """
    o = oriented_edges(edges).persist()
    wedges = o.alias("e1").join(
        o.alias("e2"), F.col("e1.v") == F.col("e2.u")
    ).select(F.col("e1.u").alias("u"), F.col("e1.v").alias("m"), F.col("e2.v").alias("v"))
    tri = wedges.join(
        o.select(F.col("u").alias("tu"), F.col("v").alias("tv")),
        (F.col("u") == F.col("tu")) & (F.col("v") == F.col("tv")),
    )
    t = tri.select(F.array_sort(F.array("u", "m", "v")).alias("t")).select(
        F.col("t")[0].alias("x"), F.col("t")[1].alias("y"), F.col("t")[2].alias("z")
    )
    t = t.localCheckpoint(eager=True)
    o.unpersist()
    return t


def edge_embeddedness(spark, edges: DataFrame) -> DataFrame:
    """Per-edge embeddedness + Granovetter local-bridge flag.

    Embeddedness of an edge = number of common neighbours of its
    endpoints = triangles through the edge (Easley–Kleinberg ch. 3); an
    edge with embeddedness 0 is a LOCAL BRIDGE — its endpoints' circles
    don't overlap, the classic weak-tie signal.  Returns one row per
    simple undirected edge (a, b, embeddedness, is_local_bridge).

    Scale shape: one triangle enumeration (wedge-join bounded, see
    :func:`triangles_sorted`) + one groupBy over its 3-edge explosion —
    strictly cheaper than the naive per-edge adjacency double-join,
    which re-gathers both endpoint neighbourhoods per edge.
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    t = triangles_sorted(
        spark, und.select(F.col("a").alias("src"), F.col("b").alias("dst"), F.lit(1.0).alias("weight"))
    )
    sides = (
        t.select(F.col("x").alias("a"), F.col("y").alias("b"))
        .unionByName(t.select(F.col("x").alias("a"), F.col("z").alias("b")))
        .unionByName(t.select(F.col("y").alias("a"), F.col("z").alias("b")))
    )
    emb = sides.groupBy("a", "b").agg(F.count(F.lit(1)).alias("embeddedness"))
    return (
        und.join(emb, ["a", "b"], "left")
        .select(
            "a",
            "b",
            F.coalesce("embeddedness", F.lit(0)).cast("long").alias("embeddedness"),
            (F.coalesce("embeddedness", F.lit(0)) == 0).alias("is_local_bridge"),
        )
    )


def clique_percolation(spark, edges: DataFrame, rounds: int = 8) -> DataFrame:
    """k=3 clique-percolation communities (Palla et al., CFinder) —
    OVERLAPPING community detection, the structure Leiden's partitions
    cannot express: a vertex may belong to several communities.

    Communities = connected components of the triangle-adjacency graph
    (triangles joined when they share an edge), equivalently components
    of the edge graph where two edges link iff they co-occur in a
    triangle.  A vertex belongs to every community one of its triangle
    edges lands in.  Returns distinct (id, community) pairs, community
    labelled by its minimum member vertex id.

    Distributed shape: triangle enumeration (wedge-bounded) → 3 meta
    edges per triangle between string edge-keys → ``rounds`` synchronous
    min-label-propagation supersteps (one groupBy + one join each, the
    same gather-scatter as every other kernel here).  Fixed ``rounds``
    keeps the result reproducible by an unrolled SQL twin; components
    of real percolation graphs collapse in far fewer rounds than their
    vertex diameter because every triangle is a 3-clique of shortcuts.
    """
    t = triangles_sorted(spark, edges)
    ek = lambda u, v: F.concat_ws("|", F.col(u), F.col(v))  # noqa: E731
    nodes = (
        t.select(ek("x", "y").alias("e"), F.col("x").alias("a"), F.col("y").alias("b"))
        .unionByName(t.select(ek("x", "z").alias("e"), F.col("x").alias("a"), F.col("z").alias("b")))
        .unionByName(t.select(ek("y", "z").alias("e"), F.col("y").alias("a"), F.col("z").alias("b")))
        .distinct()
        .persist()
    )
    pairs = (
        t.select(ek("x", "y").alias("s"), ek("y", "z").alias("d"))
        .unionByName(t.select(ek("x", "y").alias("s"), ek("x", "z").alias("d")))
        .unionByName(t.select(ek("y", "z").alias("s"), ek("x", "z").alias("d")))
    )
    meta = (
        pairs.unionByName(pairs.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .persist()
    )
    lbl = nodes.select("e", F.col("e").alias("l"))
    for r in range(rounds):
        nb = (
            meta.join(lbl.select(F.col("e").alias("s"), F.col("l").alias("ln")), "s")
            .groupBy("d")
            .agg(F.min("ln").alias("nl"))
        )
        lbl = lbl.join(nb.withColumnRenamed("d", "e"), "e", "left").select(
            "e", F.least(F.col("l"), F.coalesce("nl", F.col("l"))).alias("l")
        )
        if (r + 1) % 4 == 0:
            # truncate the lazy join chain before it nests too deep
            lbl = lbl.localCheckpoint(eager=True)
    me = nodes.join(lbl, "e")
    members = me.select("l", F.col("a").alias("v")).unionByName(
        me.select("l", F.col("b").alias("v"))
    )
    cmin = members.groupBy("l").agg(F.min("v").alias("community"))
    out = members.join(cmin, "l").select(F.col("v").alias("id"), "community").distinct()
    out = out.localCheckpoint(eager=True)
    nodes.unpersist()
    meta.unpersist()
    return out


def graphlet_orbits3(spark, edges: DataFrame) -> DataFrame:
    """Size-3 graphlet degree vector per vertex (orbits 0–3 of the
    Pržulj GDV): o0 = degree, o1 = induced-P3 ends, o2 = induced-P3
    centers, o3 = triangles — the cheapest structural feature vector
    for node-level ML (GDV similarity, role discovery).

    Closed forms from three associative aggregates — no graphlet is
    ever enumerated beyond the triangle join:

        o1(v) = Σ_{u∈N(v)} (deg(u) − 1) − 2·T(v)   (open walks minus
                 the two per-triangle closures)
        o2(v) = C(deg(v), 2) − T(v)
        o3(v) = T(v)

    Scale shape: the triangle pass of :func:`clustering_coefficient`
    (oriented wedge join, Σ deg_out² bound) + ONE extra neighbour-
    degree-sum gather (edges ⋈ degrees → groupBy vertex).
    """
    cc = clustering_coefficient(spark, edges).select("id", "n_triangles", "degree")
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    degs = cc.select(F.col("id").alias("b"), F.col("degree").alias("deg_b"))
    nds = sym.join(degs, "b").groupBy("a").agg(F.sum("deg_b").alias("nd_sum"))
    return (
        cc.join(nds.withColumnRenamed("a", "id"), "id", "left")
        .select(
            "id",
            F.col("degree").cast("long").alias("o0_degree"),
            (
                F.coalesce("nd_sum", F.lit(0)) - F.col("degree") - 2 * F.col("n_triangles")
            ).cast("long").alias("o1_path_end"),
            (
                F.col("degree") * (F.col("degree") - 1) / 2 - F.col("n_triangles")
            ).cast("long").alias("o2_wedge_center"),
            F.col("n_triangles").cast("long").alias("o3_triangle"),
        )
    )


def degree_centralization(spark, edges: DataFrame) -> DataFrame:
    """Freeman (1978) degree centralization — the graph-level scalar
    igraph exposes as ``centralization_degree``: how star-like is the
    graph?

        C_D = Σ_v (d_max − d_v) / ((n−1)(n−2))

    (1.0 for a star, 0.0 for any regular graph).  Returns one row
    (n_vertices, max_degree, centralization); NULL centralization for
    n < 3 where the normaliser vanishes.

    Scale shape: one degree hash aggregate + one 1-row reduce.
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("id")).unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    agg = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices"),
        F.max("d").cast("long").alias("max_degree"),
        F.sum("d").alias("sum_d"),
    )
    denom = (F.col("n_vertices") - 1) * (F.col("n_vertices") - 2)
    return agg.select(
        "n_vertices",
        "max_degree",
        F.round(
            F.when(
                denom > 0,
                (F.col("n_vertices") * F.col("max_degree") - F.col("sum_d")) / denom,
            ),
            6,
        ).alias("centralization"),
    )


def influence_cascade(
    spark,
    edges: DataFrame,
    seeds: DataFrame,
    p: float = 0.3,
    rounds: int = 4,
    seed: int = 42,
    directed: bool = False,
) -> DataFrame:
    """Deterministic independent-cascade diffusion (Kempe–Kleinberg–
    Tardos IC model) from a seed set — the evaluation primitive of
    influence maximisation: each edge (u, v) carries ONE pre-committed
    coin; when u first activates, v activates next round iff the coin
    lands under ``p``.  Keying the coin by (seed, u, v) — never by
    round — encodes the IC contract that an edge is attempted at most
    once, and makes the whole cascade a pure function of (graph, seeds,
    seed): retry-stable, append-stable, SQL-reproducible, like every
    md5 sampler in this repo.  Returns (id, round) with seeds at
    round 0.

    Scale shape: per round one frontier⋈edges equi-join (frontier =
    newly-activated only, so total touched edges ≤ |E| across ALL
    rounds) + one anti-join against the activated set — the BFS shape,
    O(rounds) jobs.
    """
    e = edges.select("src", "dst")
    if not directed:
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.where(F.col("src") != F.col("dst")).distinct()
    coin = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(str(seed)),
                        F.col("src").cast("string"), F.col("dst").cast("string"),
                    )
                ),
                1, 8,
            ),
            16, 10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    live = e.where(coin < F.lit(float(p))).persist()
    act = seeds.select(F.col("id"), F.lit(0).cast("long").alias("round")).localCheckpoint(
        eager=True
    )
    frontier = act.select("id")
    for t in range(1, rounds + 1):
        new = (
            frontier.join(live, frontier.id == live.src)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(act.select("id"), "id", "left_anti")
            .select("id", F.lit(t).cast("long").alias("round"))
        )
        act = act.unionByName(new).localCheckpoint(eager=True)
        frontier = new.select("id")
    live.unpersist()
    return act


def square_count(spark, edges: DataFrame) -> DataFrame:
    """Global 4-cycle (C4) census of the simple undirected graph — the
    quadrangle sibling of triangle_count (igraph ``motifs``/C4 slice):

        #C4 = ½ · Σ_{u<v} C(codeg(u, v), 2)

    every 4-cycle is counted once per diagonal pair, hence the ½.
    Returns one row (n_squares, n_codegree_pairs).

    Scale shape: codegrees come from ONE wedge self-join on the
    id-ordered adjacency grouped by endpoint pair (the butterfly-census
    bound: Σ_w deg(w)² over wedge centers — cap hub centers at web
    scale) + a 1-row reduce; no 4-vertex enumeration ever happens.
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # wedges centered at w: pair (u, v) with u < v both adjacent to w
    w1 = sym.select(F.col("a").alias("w"), F.col("b").alias("u"))
    w2 = sym.select(F.col("a").alias("w"), F.col("b").alias("v"))
    codeg = (
        w1.join(w2, "w")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cd"))
    )
    return codeg.agg(
        (F.sum(F.col("cd") * (F.col("cd") - 1) / 2) / 2).cast("long").alias("n_squares"),
        F.count(F.lit(1)).cast("long").alias("n_codegree_pairs"),
    )


def _bfs_spanning_forest(spark, und: DataFrame, max_depth: int, caller: str):
    """BFS spanning forest over a canonical simple edge table (a, b)
    (a < b, deduped), rooted at each component's min id.  Returns
    ``(visited, depth)`` where visited is (id, parent, depth) covering
    every vertex and depth is the deepest level reached.  Shared by the
    connectivity kernels (:func:`bridges`,
    :func:`biconnected_components`): rounds = forest depth, each round
    one frontier join + anti-join + min-parent aggregate.

    Raises when ``max_depth`` leaves vertices uncovered — an uncovered
    vertex would silently dump its tree edges into the non-tree set and
    corrupt downstream cycle labels, so refusing beats misclassifying.
    """
    sym = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    comp = connected_components(spark, und.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    # BFS forest rooted at each component's min id
    visited = comp.select("id", F.col("component").alias("root")).where(
        F.col("id") == F.col("root")
    ).select("id", F.lit(None).cast("long").alias("parent"), F.lit(0).alias("depth"))
    visited = visited.localCheckpoint(eager=True)
    frontier = visited.select("id")
    depth = 0
    while depth < max_depth:
        depth += 1
        nxt = (
            frontier.join(sym, frontier.id == sym.a)
            .select(F.col("b").alias("id"), F.col("a").alias("parent"))
            .join(visited.select("id"), "id", "left_anti")
            .groupBy("id")
            .agg(F.min("parent").alias("parent"))
            .withColumn("depth", F.lit(depth))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            depth -= 1
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("id")
    n_unvisited = comp.count() - visited.count()
    if n_unvisited > 0:
        raise ValueError(
            f"{caller}: BFS forest left {n_unvisited} vertices uncovered "
            f"within max_depth={max_depth}; raise max_depth"
        )
    return visited, depth


def bridges(spark, edges: DataFrame, max_depth: int = 32) -> DataFrame:
    """Bridge (cut-edge) detection via the XOR cycle-space trick — the
    distributed answer to igraph ``bridges()``:

    1. grow a BFS spanning forest (parent + depth per vertex; roots =
       per-component min id from :func:`connected_components`);
    2. give every NON-tree edge a 60-bit md5 value and XOR it into both
       endpoints' marks — a non-tree edge's fundamental cycle covers
       exactly the tree edges with ONE endpoint inside the subtree, so
       after an upward subtree-XOR sweep a tree edge's label is the XOR
       of all cycle values covering it;
    3. a tree edge is a bridge iff its subtree XOR is exactly 0 (a true
       bridge is covered by nothing, so 0 is EXACT — the only failure
       mode is a 2^-60 collision declaring a covered edge a bridge);
       non-tree edges are never bridges.

    Returns (a, b, is_bridge) for every simple undirected edge.

    Scale shape: one CC run (O(log² n) rounds), one BFS (rounds =
    forest depth — small on real graphs; pointer-double the sweep if a
    pathological diameter shows up), marks = one hash aggregate, and
    the upward sweep does one groupBy(parent)+join per depth level.
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    visited, depth = _bfs_spanning_forest(spark, und, max_depth, caller="bridges")
    tree_pairs = (
        visited.where(F.col("parent").isNotNull())
        .select(F.least("id", "parent").alias("a"), F.greatest("id", "parent").alias("b"))
    )
    nontree = und.join(tree_pairs, ["a", "b"], "left_anti")
    val = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("a").cast("string"), F.col("b").cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    marks = (
        nontree.select(val.alias("v"), F.col("a").alias("id"))
        .unionByName(nontree.select(val.alias("v"), F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.expr("bit_xor(v)").alias("m"))
    )
    # acc(x) starts at mark(x); sweep depths bottom-up so each vertex has
    # its full subtree XOR before pushing into its parent
    acc = (
        visited.join(marks, "id", "left")
        .na.fill({"m": 0})
        .select("id", "parent", "depth", F.col("m").alias("acc"))
        .localCheckpoint(eager=True)
    )
    for d in range(depth, 0, -1):
        kids = acc.where(F.col("depth") == d)
        up = kids.groupBy(F.col("parent").alias("id")).agg(
            F.expr("bit_xor(acc)").alias("push")
        )
        acc = (
            acc.join(up, "id", "left")
            .select(
                "id", "parent", "depth",
                F.when(
                    F.col("push").isNotNull(),
                    F.col("acc").bitwiseXOR(F.col("push")),
                ).otherwise(F.col("acc")).alias("acc"),
            )
            .localCheckpoint(eager=True)
        )
    tree_lbl = acc.where(F.col("parent").isNotNull()).select(
        F.least("id", "parent").alias("a"),
        F.greatest("id", "parent").alias("b"),
        (F.col("acc") == 0).alias("is_bridge"),
    )
    out = tree_lbl.unionByName(
        nontree.select("a", "b", F.lit(False).alias("is_bridge"))
    ).localCheckpoint(eager=True)
    und.unpersist()
    return out


def collective_influence(spark, edges: DataFrame, radius: int = 1) -> DataFrame:
    """Morone–Makse collective influence (Nature 2015) — the optimal-
    percolation influencer score:

        CI_ℓ(v) = (k_v − 1) · Σ_{u ∈ ∂Ball(v, ℓ)} (k_u − 1)

    summing reduced degrees over the frontier at EXACT distance ℓ.
    High-CI vertices are the ones whose removal fragments the giant
    component fastest — a sharper target list than raw degree or
    k-core.  Returns (id, degree, ci).

    Scale shape: one degree aggregate, then ℓ frontier joins to reach
    the exact-distance shell (ℓ is 1 or 2 in practice — the paper's
    own recommendation), one final gather of reduced degrees.
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    sym = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = (
        sym.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("k"))
    )
    # shells: ball[r] = vertices at distance <= r from the center v
    ball = deg.select(F.col("id").alias("v"), F.col("id").alias("u"))  # distance 0
    shell = ball
    for _ in range(radius):
        nxt = (
            shell.join(sym, shell.u == sym.a)
            .select("v", F.col("b").alias("u"))
            .distinct()
            .join(ball, ["v", "u"], "left_anti")
        )
        ball = ball.unionByName(nxt).localCheckpoint(eager=True)
        shell = nxt
    ci = (
        shell.join(deg.select(F.col("id").alias("u"), F.col("k").alias("ku")), "u")
        .groupBy("v")
        .agg(F.sum(F.col("ku") - 1).alias("s"))
    )
    out = (
        deg.join(ci.withColumnRenamed("v", "id"), "id", "left")
        .na.fill({"s": 0})
        .select(
            "id",
            F.col("k").cast("long").alias("degree"),
            ((F.col("k") - 1) * F.col("s")).cast("long").alias("ci"),
        )
        .localCheckpoint(eager=True)
    )
    und.unpersist()
    return out


def barrat_clustering(spark, edges: DataFrame) -> DataFrame:
    """Barrat weighted local clustering coefficient (PNAS 2004) — the
    igraph ``transitivity_barrat`` parity op:

        C_w(v) = 1 / (s_v · (k_v − 1)) · Σ_{Δ(v,u,w)} (w_vu + w_vw)

    summing over triangles through v the two edge weights INCIDENT to v
    (the paper sums (w_ij+w_ih)/2 over ORDERED neighbour pairs — each
    triangle appears twice, cancelling the half).  Coincides with the unweighted coefficient on
    uniform weights; vertices of degree < 2 score 0.  Returns
    (id, degree, strength, cw).

    Scale shape: one triangle enumeration (degree-oriented wedge join)
    exploded into its 3 per-vertex incidences, each joined to the two
    incident edge weights — one weight-lookup join keyed on the
    canonical pair, then a per-vertex hash aggregate.
    """
    und = (
        edges.groupBy(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .agg(F.sum("weight").alias("w"))
        .where(F.col("a") != F.col("b"))
        .persist()
    )
    deg = (
        und.select(F.col("a").alias("id"), "w").unionByName(
            und.select(F.col("b").alias("id"), "w")
        )
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("k"), F.sum("w").alias("s"))
    )
    t = triangles_sorted(spark, und.select(F.col("a").alias("src"), F.col("b").alias("dst"), F.lit(1.0).alias("weight")))
    # per-triangle incidences: center v with its two incident pairs
    inc = (
        t.select(F.col("x").alias("v"), F.col("y").alias("p1"), F.col("z").alias("p2"))
        .unionByName(t.select(F.col("y").alias("v"), F.col("x").alias("p1"), F.col("z").alias("p2")))
        .unionByName(t.select(F.col("z").alias("v"), F.col("x").alias("p1"), F.col("y").alias("p2")))
    )
    wtab = und.select("a", "b", "w")
    e1 = inc.join(
        wtab.select(
            F.col("a").alias("e1a"), F.col("b").alias("e1b"), F.col("w").alias("w1")
        ),
        (F.least("v", "p1") == F.col("e1a")) & (F.greatest("v", "p1") == F.col("e1b")),
    )
    e2 = e1.join(
        wtab.select(
            F.col("a").alias("e2a"), F.col("b").alias("e2b"), F.col("w").alias("w2")
        ),
        (F.least("v", "p2") == F.col("e2a")) & (F.greatest("v", "p2") == F.col("e2b")),
    )
    tri_sum = e2.groupBy(F.col("v").alias("id")).agg(
        F.sum(F.col("w1") + F.col("w2")).alias("tw")
    )
    out = (
        deg.join(tri_sum, "id", "left")
        .na.fill({"tw": 0.0})
        .select(
            "id",
            F.col("k").cast("long").alias("degree"),
            F.round("s", 6).alias("strength"),
            F.round(
                F.when(
                    (F.col("k") > 1) & (F.col("s") > 0),
                    F.col("tw") / (F.col("s") * (F.col("k") - 1)),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("cw"),
        )
        .localCheckpoint(eager=True)
    )
    und.unpersist()
    return out


def disparity_backbone(spark, edges: DataFrame, alpha: float = 0.05) -> DataFrame:
    """Serrano–Boguñá–Vespignani multiscale backbone (PNAS 2009) — the
    principled weighted-graph sparsifier: edge (i, j) survives iff its
    weight is statistically significant against i's (or j's) null of
    uniformly split strength,

        α_ij = (1 − w_ij / s_i)^(k_i − 1)  <  α

    (k_i = degree, s_i = strength; k = 1 pendant edges are kept — the
    null is undefined).  Unlike a global weight threshold this keeps
    locally-important weak edges and prunes locally-trivial strong
    ones.  Returns (a, b, weight, alpha_min, keep).

    Scale shape: one degree/strength aggregate + two broadcast-sized
    joins + pure column math — a projection-shaped filter, no wedge
    join, no iteration; THE cheap pre-pass before any triangle-family
    kernel on a dense weighted graph.
    """
    # materialise the canonical weighted edge table ONCE: it feeds the
    # degree/strength aggregate and both endpoint joins — without this
    # the upstream build (here: the co-activity pair join) replays 3x
    und = (
        edges.groupBy(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .agg(F.sum("weight").alias("w"))
        .where(F.col("a") != F.col("b"))
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("id"), "w")
        .unionByName(und.select(F.col("b").alias("id"), "w"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("k"), F.sum("w").alias("s"))
    )
    j = und.join(
        deg.select(F.col("id").alias("a"), F.col("k").alias("ka"), F.col("s").alias("sa")),
        "a",
    ).join(
        deg.select(F.col("id").alias("b"), F.col("k").alias("kb"), F.col("s").alias("sb")),
        "b",
    )

    def _alpha(k, s):
        return F.when(k > 1, F.pow(1.0 - F.col("w") / s, k - 1)).otherwise(F.lit(0.0))

    amin = F.least(_alpha(F.col("ka"), F.col("sa")), _alpha(F.col("kb"), F.col("sb")))
    return j.select(
        "a", "b",
        F.round("w", 6).alias("weight"),
        F.round(amin, 6).alias("alpha_min"),
        (F.round(amin, 6) < F.lit(float(alpha))).alias("keep"),
    )


def wl_kernel_drift(slices: DataFrame, rounds: int = 2) -> DataFrame:
    """Structural drift between consecutive graph slices via the
    Weisfeiler-Lehman subtree kernel (Shervashidze et al. 2011): color
    every slice's vertices with :func:`wl_refinement`'s exact scheme
    (start color '0'; round r = ``md5(own || '|' || sorted neighbour
    colors)``), build per-(slice, round) color histograms, and score each
    consecutive slice pair with the normalised histogram intersection

        sim = sum_{r,c} min(n_a(r,c), n_b(r,c)) / (rounds+1) / max(|V_a|, |V_b|)

    — 1.0 iff the slices are WL-indistinguishable (same vertex count,
    same k-hop structure multiset: isomorphic graphs ALWAYS score 1.0,
    relabelling included), dropping toward 0 as structure churns.  The
    structural companion of edge-churn drift: an id-preserving rewiring
    that keeps every degree fixed moves edge-set Jaccard but not the WL
    round-1 histogram, and vice versa.

    ``slices``: (slice:long, src:long, dst:long); undirected simple view
    per slice.  Returns (slice_a, slice_b, n_vertices_a, n_vertices_b,
    wl_similarity) for consecutive slices in sorted order.

    Scale shape: ALL slices refine in ONE plan (slice rides every key —
    no per-slice driver loop); per round one gather join + one hash
    aggregate, PageRank-shaped; histograms and the pair scoring are
    color-count-sized, never vertex-sized.  The sorted-concat signature
    is O(deg) per vertex — cap hubs the hub_salt way if needed (see
    wl_refinement).
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    e = (
        slices.select("slice", "src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    sym = (
        e.select("slice", F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(e.select("slice", F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .persist()
    )
    color = (
        sym.select("slice", F.col("a").alias("id")).distinct()
        .withColumn("color", F.lit("0"))
        .persist()
    )
    cached = [color]  # per-round |V|-row states, released after the barrier
    hists = [
        color.groupBy("slice", "color").agg(F.count(F.lit(1)).alias("n"))
        .withColumn("round", F.lit(0))
    ]
    for r in range(1, rounds + 1):
        sig = (
            sym.join(
                color.select("slice", F.col("id").alias("b"), F.col("color").alias("nc")),
                ["slice", "b"],
            )
            .groupBy("slice", F.col("a").alias("id"))
            .agg(F.array_join(F.sort_array(F.collect_list("nc")), ",").alias("sig"))
        )
        color = (
            color.join(sig, ["slice", "id"], "left")
            .select(
                "slice", "id",
                F.md5(
                    F.concat(F.col("color"), F.lit("|"), F.coalesce("sig", F.lit("")))
                ).alias("color"),
            )
            .persist()
        )
        cached.append(color)
        hists.append(
            color.groupBy("slice", "color").agg(F.count(F.lit(1)).alias("n"))
            .withColumn("round", F.lit(r))
        )
    hist = hists[0]
    for h in hists[1:]:
        hist = hist.unionByName(h)
    sizes = sym.select("slice", F.col("a").alias("id")).distinct().groupBy("slice").agg(
        F.count(F.lit(1)).alias("nv")
    )
    from pyspark.sql import Window

    sl = sizes.select("slice")
    w = Window.orderBy("slice")
    pairs = (
        sl.select(F.col("slice").alias("sa"), F.lead("slice").over(w).alias("sb"))
        .where(F.col("sb").isNotNull())
    )
    ha = hist.select(F.col("slice").alias("sa"), "round", "color", F.col("n").alias("na"))
    hb = hist.select(F.col("slice").alias("sb"), "round", "color", F.col("n").alias("nb"))
    shared = (
        pairs.join(ha, "sa")
        .join(hb, ["sb", "round", "color"])
        .groupBy("sa", "sb")
        .agg(F.sum(F.least("na", "nb")).alias("m"))
    )
    za = sizes.select(F.col("slice").alias("sa"), F.col("nv").alias("n_vertices_a"))
    zb = sizes.select(F.col("slice").alias("sb"), F.col("nv").alias("n_vertices_b"))
    out = (
        pairs.join(shared, ["sa", "sb"], "left").na.fill({"m": 0})
        .join(za, "sa").join(zb, "sb")
        .select(
            F.col("sa").alias("slice_a"),
            F.col("sb").alias("slice_b"),
            F.col("n_vertices_a").cast("long").alias("n_vertices_a"),
            F.col("n_vertices_b").cast("long").alias("n_vertices_b"),
            F.round(
                F.col("m") / F.lit(float(rounds + 1))
                / F.greatest("n_vertices_a", "n_vertices_b"),
                6,
            ).alias("wl_similarity"),
        )
    )
    out = out.localCheckpoint(eager=True)
    sym.unpersist()
    for c in cached:
        c.unpersist()
    return out


def edge_lift(
    edges: DataFrame, directed: bool = False, min_lift: float | None = None,
) -> DataFrame:
    """Configuration-model edge lift — the graph twin of token PMI: each
    edge's observed weight against its expectation under the weighted
    configuration null,

        undirected:  E[w_uv] = k_u · k_v / (2W)      (k = strength)
        directed:    E[w_uv] = k_out(u) · k_in(v) / W

    Returns (src, dst, weight, expected, lift, log2_lift) with
    lift = w/E — edges whose weight far exceeds the degree-product null
    are the "surprising" links (association mining on interaction
    graphs; the GLOBAL-null complement of the per-vertex
    :func:`disparity_backbone`).  ``min_lift`` filters in-plan so the
    output can be pruned before it is ever materialised.  Self-loops
    are excluded: the null model's self-expectation convention differs
    per formulation, and loops carry no association signal.

    Scale shape: one strength aggregate (map-side combinable), two
    id-keyed joins to decorate each edge, the 1-row total via broadcast
    cross join — output ≤ |E| rows, no shuffle beyond the decoration
    joins.
    """
    e = edges.where(F.col("src") != F.col("dst"))
    if directed:
        ks = e.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("k_src"))
        kd = e.groupBy(F.col("dst").alias("id")).agg(F.sum("weight").alias("k_dst"))
        wtot = e.agg(F.sum("weight").alias("W"))
        denom = F.col("W")
    else:
        ends = e.select(F.col("src").alias("id"), "weight").unionByName(
            e.select(F.col("dst").alias("id"), "weight")
        )
        k = ends.groupBy("id").agg(F.sum("weight").alias("k"))
        ks = k.select("id", F.col("k").alias("k_src"))
        kd = k.select("id", F.col("k").alias("k_dst"))
        wtot = e.agg((F.lit(2.0) * F.sum("weight")).alias("W"))
        denom = F.col("W")
    dec = (
        e.join(ks.withColumnRenamed("id", "src"), "src")
        .join(kd.withColumnRenamed("id", "dst"), "dst")
        .crossJoin(F.broadcast(wtot))
    )
    expected = F.col("k_src") * F.col("k_dst") / denom
    lift = F.col("weight") / expected
    out = dec.select(
        "src", "dst", "weight",
        F.round(expected, 6).alias("expected"),
        F.round(lift, 6).alias("lift"),
        F.round(F.log2(lift), 6).alias("log2_lift"),
    )
    if min_lift is not None:
        out = out.where(F.col("lift") >= float(min_lift))
    return out


def effective_diameter(
    spark,
    edges: DataFrame,
    q: float = 0.9,
    max_dist: int = 4,
    method: str = "exact",
    lg_config_k: int = 12,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Effective diameter via the neighbourhood function (the ANF /
    HyperANF statistic, Palmer 2002 / Boldi–Vigna 2011): NF(d) = number
    of ordered vertex pairs within distance ≤ d; the ``q``-effective
    diameter is the (linearly interpolated) distance at which NF reaches
    ``q`` · NF(max_dist) — the "90% of pairs are this close" number
    every graph census reports instead of the outlier-driven true
    diameter.  Interpolation uses NF(0) = 0 (self-pairs excluded,
    matching :func:`khop_counts`).

    Returns one row per distance 1..max_dist: (dist, n_pairs, frac,
    effective_diameter) — frac = NF(d)/NF(max_dist), the effective
    diameter repeated per row.

    ``method='exact'`` materialises the distinct reach sets (validation
    scale / oracle truth — same scale warning as :func:`khop_counts`);
    ``method='hll'`` sums the :func:`neighborhood_hll` sketch estimates
    instead — fixed per-vertex state, the 100-TB path.
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    if method == "hll":
        nf_rows = (
            neighborhood_hll(spark, edges, max_dist=max_dist,
                             lg_config_k=lg_config_k, ckpt=ckpt)
            .groupBy("dist").agg(F.sum("n_reachable_est").alias("np"))
            .orderBy("dist").collect()
        )
        nf = [float(r["np"]) for r in nf_rows]
    else:
        sym = _sym_simple(edges).persist()
        reach = sym.select(F.col("a").alias("id"), F.col("b").alias("v")).persist()
        nf = [float(reach.count())]
        frontier = reach
        for _ in range(1, max_dist):
            nxt = (
                frontier.join(
                    sym.select(F.col("a").alias("v"), F.col("b").alias("w")), "v"
                )
                .where(F.col("w") != F.col("id"))
                .select("id", F.col("w").alias("v"))
            )
            new_reach = reach.unionByName(nxt).distinct().localCheckpoint(eager=True)
            reach.unpersist()
            reach = new_reach
            frontier = reach
            nf.append(float(reach.count()))
        reach.unpersist()
        sym.unpersist()
    total = nf[-1]
    target = float(q) * total
    eff = None
    prev = 0.0
    for d, cur in enumerate(nf, start=1):
        if cur >= target:
            eff = (d - 1) + (target - prev) / (cur - prev) if cur > prev else float(d)
            break
        prev = cur
    eff = round(eff if eff is not None else float(max_dist), 6)
    import pandas as pd

    out = pd.DataFrame({
        "dist": list(range(1, max_dist + 1)),
        "n_pairs": [int(x) for x in nf],
        "frac": [round(x / total, 6) if total > 0 else None for x in nf],
        "effective_diameter": [eff] * max_dist,
    })
    return spark.createDataFrame(out)


def triangle_significance(spark, edges: DataFrame) -> DataFrame:
    """Global triangle count against its EXACT configuration-model
    expectation, from degree moments alone: with p_uv = k_u·k_v/(2m),

        E[T] = e₃(k₁², …, kₙ²) / (2m)³,
        e₃ = (p₁³ − 3·p₁·p₂ + 2·p₃) / 6,   p_r = Σ_i k_i^(2r)

    (the elementary symmetric polynomial over squared degrees — the
    Σ_{i<j<l} p_ij·p_jl·p_il sum in closed form, no triple enumeration).
    Returns one row: (n_triangles, expected_config, ratio,
    z_poisson = (T − E[T]) / √E[T]) — "does this graph have more
    triangles than its degree sequence alone explains", the significance
    wrapper :func:`triangle_count` and :func:`transitivity_global` leave
    to the caller.  z uses the Poisson variance approximation
    (documented; exact config-model variance needs higher joint moments).

    Scale shape: the triangle count is the oriented wedge join it always
    was; the null needs ONE degree aggregate reduced to three moments —
    1-row arithmetic, no sampling, no rewiring nulls.
    """
    deg = (
        _sym_simple(edges)
        .groupBy(F.col("a").alias("id"))
        .agg(F.count(F.lit(1)).cast("double").alias("k"))
    )
    mom = deg.agg(
        F.sum(F.pow("k", 2)).alias("p1"),
        F.sum(F.pow("k", 4)).alias("p2"),
        F.sum(F.pow("k", 6)).alias("p3"),
        (F.sum("k") / 2.0).alias("m"),
    )
    t = triangle_count(spark, edges)
    e3 = (F.pow("p1", 3) - 3.0 * F.col("p1") * F.col("p2") + 2.0 * F.col("p3")) / 6.0
    exp_t = e3 / F.pow(2.0 * F.col("m"), 3)
    return (
        t.crossJoin(F.broadcast(mom))
        .select(
            "n_triangles",
            F.round(exp_t, 6).alias("expected_config"),
            F.round(F.when(exp_t > 0, F.col("n_triangles") / exp_t), 6).alias("ratio"),
            F.round(
                F.when(exp_t > 0, (F.col("n_triangles") - exp_t) / F.sqrt(exp_t)), 6
            ).alias("z_poisson"),
        )
    )


def landmark_distances(
    spark,
    edges: DataFrame,
    n_landmarks: int = 4,
    max_dist: int = 3,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Landmark (pivot) BFS distance table — the standard shortest-path
    ORACLE structure at web scale (Potamias 2009 landmark embedding):
    exact hop distances from ``n_landmarks`` deterministically chosen
    vertices to every vertex within ``max_dist`` hops.  Any pair query
    then answers d(u,v) ≤ min_l d(u,l) + d(l,v) from two index lookups —
    the triangle-inequality upper bound — without touching the graph.
    Landmarks are the ``n_landmarks`` smallest md5-priority vertices
    (the repo-wide deterministic-selection convention, engine- and
    SQL-reproducible; degree-weighted selection is a caller-side swap).

    Returns (id, landmark, dist), dist 0..max_dist, one row per reached
    (vertex, landmark) pair.

    Scale shape: ONE multi-source BFS — the frontier carries (landmark,
    vertex) composite state, so all landmarks advance in the same
    gather join per round (max_dist rounds total, the PageRank shuffle
    pattern); per-round state is bounded by n_landmarks · |V|, and the
    anti-join against the settled set keeps frontiers shrinking.
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    sym = _sym_simple(edges).persist()
    verts = sym.select(F.col("a").alias("id")).distinct()
    pri = F.conv(
        F.substring(F.md5(F.concat(F.lit("lm:"), F.col("id").cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    lms = (
        verts.select("id", pri.alias("pri"))
        .orderBy("pri", "id")
        .limit(int(n_landmarks))
        .select(F.col("id").alias("landmark"))
    )
    settled = lms.select(
        F.col("landmark").alias("lm"), F.col("landmark").alias("id"), F.lit(0).alias("dist")
    )
    settled = ckpt.save(settled, "landmark_bfs", 0)
    frontier = settled
    for d in range(1, max_dist + 1):
        nxt = (
            frontier.join(sym.withColumnRenamed("a", "id"), "id")
            .select("lm", F.col("b").alias("id"), F.lit(d).alias("dist"))
            .distinct()
            .join(settled.select("lm", "id"), ["lm", "id"], "left_anti")
        )
        settled = ckpt.save(settled.unionByName(nxt), "landmark_bfs", d)
        frontier = settled.where(F.col("dist") == d)
    sym.unpersist()
    out = settled.select(
        "id", F.col("lm").alias("landmark"), F.col("dist").cast("long").alias("dist")
    )
    if own_ckpt:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    return out


def simrank(
    spark, edges: DataFrame, c: float = 0.8, min_sim: float | None = None,
) -> DataFrame:
    """Two-iteration SimRank (Jeh & Widom 2002): "two vertices are
    similar when their neighbourhoods are similar", the structural-
    context score that sees what direct-overlap measures (cocitation,
    Jaccard) cannot — similarity THROUGH similar, not shared,
    neighbours.  With s₀ = identity the closed forms are

        s₁(a,b) = C·|N(a)∩N(b)| / (|N(a)|·|N(b)|)
        s₂(a,b) = C·(Σ_{na∈N(a),nb∈N(b), na≠nb} s₁(na,nb) + |N(a)∩N(b)|)
                  / (|N(a)|·|N(b)|)

    over the symmetrised simple graph.  Returns (src, dst, simrank)
    with src < dst for every pair with a non-zero score (pairs whose
    2-hop neighbourhoods touch); on a bipartite graph only same-side
    pairs score, as the theory requires.  Two fixed iterations is the
    standard truncation — scores at deeper k shrink by C per level.

    Scale shape: s₁ is the cocitation join (pair rows bounded by
    Σ_anchor deg², the bipartite_project bound); the s₂ propagation is
    two id-keyed joins fanning each s₁ pair to its adjacent pairs —
    Σ_pairs deg·deg rows, the documented cost of exact SimRank; at web
    scale prune with ``min_sim`` (s₁ entries below it cannot lift s₂
    above min_sim/C) before propagating.
    """
    sym = _sym_simple(edges)
    deg = sym.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("d"))
    # |N(a) ∩ N(b)| via the shared-anchor join (both orders kept: the
    # propagation below needs symmetric lookup)
    l = sym.select(F.col("b").alias("anchor"), F.col("a").alias("x"))
    r = sym.select(F.col("b").alias("anchor"), F.col("a").alias("y"))
    common = (
        l.join(r, "anchor").where(F.col("x") != F.col("y"))
        .groupBy("x", "y").agg(F.count(F.lit(1)).alias("cnt"))
    )
    dx = deg.select(F.col("id").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("id").alias("y"), F.col("d").alias("dy"))
    p1 = (
        common.join(dx, "x").join(dy, "y")
        .select("x", "y", (F.lit(float(c)) * F.col("cnt") / (F.col("dx") * F.col("dy"))).alias("s"))
    )
    if min_sim is not None:
        p1 = p1.where(F.col("s") >= float(min_sim) / float(c))
    p1 = p1.persist()
    # propagate each s1 pair to every adjacent pair: (x,y,s) → (a,b,s)
    # for a ∈ N(x), b ∈ N(y)
    ex = sym.select(F.col("a").alias("x"), F.col("b").alias("pa"))
    ey = sym.select(F.col("a").alias("y"), F.col("b").alias("pb"))
    off = (
        p1.join(ex, "x").join(ey, "y")
        .where(F.col("pa") != F.col("pb"))
        .groupBy(F.col("pa").alias("x"), F.col("pb").alias("y"))
        .agg(F.sum("s").alias("s_off"))
    )
    s2 = (
        common.join(off, ["x", "y"], "full")
        .na.fill({"cnt": 0, "s_off": 0.0})
        .join(dx, "x").join(dy, "y")
        .select(
            "x", "y",
            (F.lit(float(c)) * (F.col("s_off") + F.col("cnt"))
             / (F.col("dx") * F.col("dy"))).alias("s2"),
        )
    )
    out = (
        s2.where(F.col("x") < F.col("y"))
        .select(
            F.col("x").alias("src"), F.col("y").alias("dst"),
            F.round("s2", 6).alias("simrank"),
        )
        .where(F.col("simrank") > 0)
    )
    if min_sim is not None:
        out = out.where(F.col("simrank") >= float(min_sim))
    out = out.localCheckpoint(eager=True)
    p1.unpersist()
    return out


def nestedness_nodf(spark, edges: DataFrame) -> DataFrame:
    """Bipartite nestedness by overlap and decreasing fill (NODF,
    Almeida-Neto 2008): for every ordered vertex pair (u, v) on the SAME
    side with deg(u) > deg(v), the paired-overlap score
    |N(u)∩N(v)| / deg(v); NODF = 100 · Σ scores / (C(n_src,2) +
    C(n_dst,2)).  High NODF = specialists interact with subsets of what
    generalists interact with — the interaction-matrix "triangle" shape
    ecology and trade networks test for; equal-degree pairs score 0 by
    definition.  Returns one row: (nodf, nodf_src, nodf_dst,
    n_src, n_dst).

    Scale shape: only pairs with NON-ZERO overlap carry score, so the
    sum rides the shared-anchor (cocitation) join — Σ_anchor deg²
    bounded, never the full C(n,2) pair space, which enters only as the
    closed-form denominator.
    """
    src_side = edges.select(F.col("src").alias("node"), F.col("dst").alias("anchor"))
    dst_side = edges.select(F.col("dst").alias("node"), F.col("src").alias("anchor"))

    def side_sum(tbl):
        e = tbl.distinct()
        deg = e.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
        l = e.select("anchor", F.col("node").alias("u"))
        r = e.select("anchor", F.col("node").alias("v"))
        ov = (
            l.join(r, "anchor").where(F.col("u") != F.col("v"))
            .groupBy("u", "v").agg(F.count(F.lit(1)).alias("ov"))
        )
        du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
        dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
        s = (
            ov.join(du, "u").join(dv, "v")
            .where(F.col("du") > F.col("dv"))
            .agg(F.coalesce(F.sum(F.col("ov") / F.col("dv")), F.lit(0.0)).alias("s"))
        )
        n = deg.agg(F.count(F.lit(1)).alias("n"))
        return s.crossJoin(F.broadcast(n))

    a = side_sum(src_side).select(F.col("s").alias("s_src"), F.col("n").alias("n_src"))
    b = side_sum(dst_side).select(F.col("s").alias("s_dst"), F.col("n").alias("n_dst"))
    pairs = lambda n: n * (n - 1.0) / 2.0  # noqa: E731
    return (
        a.crossJoin(F.broadcast(b))
        .select(
            F.round(
                100.0 * (F.col("s_src") + F.col("s_dst"))
                / (pairs(F.col("n_src")) + pairs(F.col("n_dst"))), 6
            ).alias("nodf"),
            F.round(
                F.when(F.col("n_src") > 1,
                       100.0 * F.col("s_src") / pairs(F.col("n_src"))), 6
            ).alias("nodf_src"),
            F.round(
                F.when(F.col("n_dst") > 1,
                       100.0 * F.col("s_dst") / pairs(F.col("n_dst"))), 6
            ).alias("nodf_dst"),
            F.col("n_src").cast("long").alias("n_src"),
            F.col("n_dst").cast("long").alias("n_dst"),
        )
    )


def two_edge_components(spark, edges: DataFrame, ckpt: CheckpointManager | None = None) -> DataFrame:
    """2-edge-connected components: remove every bridge (the XOR
    cycle-space sweep of :func:`bridges`) and take connected components
    of what remains — vertices in the same component survive ANY single
    link failure together, the link-layer robustness partition
    (igraph's biconnected-flavoured decomposition for edges).  Isolated
    endpoints keep singleton components (their own id, the CC labelling
    convention).  Returns (id, component).

    Scale shape: the bridge sweep's documented plan (CC + BFS forest +
    per-depth XOR rollup) plus ONE more log²-round CC on the
    bridge-free edge set — both reuse the shared checkpoint manager.
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    br = bridges(spark, edges)
    keep = (
        br.where(~F.col("is_bridge"))
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .withColumn("weight", F.lit(1.0))
    )
    comp = connected_components(spark, keep, ckpt=ckpt)
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    out = (
        verts.join(comp, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )
    if own_ckpt:
        out = out.localCheckpoint(eager=True)
        ckpt.close()
    return out


def biconnected_components(spark, edges: DataFrame, max_depth: int = 32) -> DataFrame:
    """Biconnected components (blocks) of the undirected simple graph —
    the distributed answer to igraph ``biconnected_components()``
    (reference scope: the connectivity family around ``bridges()``;
    vertex-cut structure is the one member round 1 lacked).

    Tarjan–Vishkin equivalence over a BFS spanning forest: two edges are
    in the same block iff they lie on a common fundamental cycle,
    transitively.  Pipeline:

    1. BFS spanning forest (shared :func:`_bfs_spanning_forest`);
    2. every vertex's root-path edge list via parent-pointer climbing —
       ``depth`` rounds, O(n·depth) rows total;
    3. a non-tree edge's fundamental cycle = the symmetric difference of
       its endpoints' root paths (shared ancestor edges appear twice and
       cancel under ``HAVING count = 1``) — star-link each cycle tree
       edge to the chord's key;
    4. connected components over that edge-key auxiliary graph; blocks =
       aux components, uncovered tree edges (bridges) stay singletons.

    Returns (a, b, block) for every simple undirected edge, ``block`` =
    a deterministic 64-bit key shared by all edges of one block.

    Scale shape: one CC run (log² rounds), one BFS (depth rounds), depth
    climb rounds each a merge join against the n-row forest, ONE
    m·depth-row shuffle for the symmetric difference, and a second CC on
    the aux graph whose size is Σ cycle lengths ≤ m·2·depth.  Depth is
    small on small-world transcript graphs; a pathological diameter
    fails fast via the forest coverage guard rather than degrading.
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    visited, depth = _bfs_spanning_forest(spark, und, max_depth, caller="biconnected_components")

    # ---- root-path edge lists: climb(owner, cur) emits the tree edge
    # (cur, parent(cur)) each round, then steps cur := parent(cur)
    ekey = lambda a, b: F.xxhash64(F.least(a, b), F.greatest(a, b))  # noqa: E731
    climb = visited.select(F.col("id").alias("owner"), F.col("id").alias("cur"))
    path_chunks = []
    for _ in range(depth):
        step = (
            climb.join(
                visited.select(F.col("id").alias("cur"), "parent"), "cur"
            )
            .where(F.col("parent").isNotNull())
            .select(
                "owner",
                F.least("cur", "parent").alias("pa"),
                F.greatest("cur", "parent").alias("pb"),
                F.col("parent").alias("nxt"),
            )
            .localCheckpoint(eager=True)
        )
        if step.isEmpty():
            break
        path_chunks.append(step.select("owner", "pa", "pb"))
        climb = step.select("owner", F.col("nxt").alias("cur"))
    if path_chunks:
        paths = path_chunks[0]
        for c in path_chunks[1:]:
            paths = paths.unionByName(c)
    else:
        paths = und.limit(0).select(
            F.col("a").alias("owner"), F.col("a").alias("pa"), F.col("b").alias("pb")
        )

    # ---- fundamental-cycle star links: chord key ↔ each cycle tree edge
    tree_pairs = visited.where(F.col("parent").isNotNull()).select(
        F.least("id", "parent").alias("a"), F.greatest("id", "parent").alias("b")
    )
    nontree = und.join(tree_pairs, ["a", "b"], "left_anti")
    chord = nontree.select(ekey(F.col("a"), F.col("b")).alias("ck"), "a", "b")
    side_a = chord.join(paths, chord.a == paths.owner).select("ck", "pa", "pb")
    side_b = chord.join(paths, chord.b == paths.owner).select("ck", "pa", "pb")
    cyc = (
        side_a.unionByName(side_b)
        .groupBy("ck", "pa", "pb")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") == 1)  # shared root-path prefix cancels
        .select(F.col("ck").alias("src"), ekey(F.col("pa"), F.col("pb")).alias("dst"))
    )
    aux = cyc.withColumn("weight", F.lit(1.0)).localCheckpoint(eager=True)
    comp = (
        connected_components(spark, aux)
        .select(F.col("id").alias("k"), F.col("component").alias("block"))
        if not aux.isEmpty()
        else None
    )
    keyed = und.select("a", "b", ekey(F.col("a"), F.col("b")).alias("k"))
    if comp is None:
        out = keyed.select("a", "b", F.col("k").alias("block"))
    else:
        out = (
            keyed.join(comp, "k", "left")
            .select("a", "b", F.coalesce("block", F.col("k")).alias("block"))
        )
    out = out.localCheckpoint(eager=True)
    und.unpersist()
    return out


def articulation_points(spark, edges: DataFrame, max_depth: int = 32) -> DataFrame:
    """Articulation (cut) vertices — igraph ``articulation_points()`` at
    scale: a vertex is a cut vertex iff it belongs to ≥ 2 blocks of the
    block-cut tree (:func:`biconnected_components`; bridge edges count
    as their own blocks).  Returns (id, n_blocks, is_articulation) for
    every vertex of the simple graph.

    Scale shape: the block pipeline plus one explode + distinct + count
    aggregate — all map-side-combinable.
    """
    blocks = biconnected_components(spark, edges, max_depth=max_depth)
    memb = (
        blocks.select(F.col("a").alias("id"), "block")
        .unionByName(blocks.select(F.col("b").alias("id"), "block"))
        .distinct()
    )
    return memb.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        (F.count(F.lit(1)) >= 2).alias("is_articulation"),
    )


def shortest_cycles(
    spark, edges: DataFrame, probe_edges: DataFrame | None = None, max_depth: int = 32,
    strict: bool = True,
) -> DataFrame:
    """Shortest cycle THROUGH each probe edge — and thereby the graph's
    girth (igraph ``girth()``): for probe (a, b), remove that edge and
    BFS from ``a``; the shortest surviving a→b path plus the edge is the
    shortest cycle containing it.  ``min(cycle_len)`` over all edges is
    the exact girth; over a sampled probe subset it is an upper bound
    (the scale mode — girth probes are independent, so sample size buys
    confidence linearly).  Returns (a, b, cycle_len) per probe,
    ``cycle_len`` NULL when the probe is a bridge (no cycle through it).

    ``max_depth`` truncation: a probe whose BFS is still expanding at
    ``max_depth`` is ambiguous — it may be a true bridge inside a
    component whose radius exceeds ``max_depth``, or may sit on a cycle
    longer than ``max_depth + 1``.  With ``strict=True`` (default) the
    call refuses rather than misclassify; with ``strict=False`` it
    returns results with ``cycle_len`` NULL for the unresolved probes,
    i.e. NULL then means "bridge OR cycle longer than max_depth+1" —
    the cost-bounded mode for callers that tuned ``max_depth`` as a
    work cap on large-diameter graphs.

    Scale shape: one labelled multi-source BFS — frontier rows keyed by
    probe, one join + min-dist aggregate per round, probes retire from
    the frontier the round their target is reached; rounds ≤ half the
    longest chordless cycle, total rows O(|probes|·n) worst case but
    probe-local in practice (the BFS floods only until the target).
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    probes = (
        probe_edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        ).distinct()
        if probe_edges is not None
        else und
    ).select(F.xxhash64("a", "b").alias("pk"), "a", "b").persist()
    sym = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b"))).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).persist()

    # visited(pk, id, d): multi-source BFS from each probe's a-endpoint
    visited = probes.select("pk", F.col("a").alias("id"), F.lit(0).alias("d"))
    visited = visited.localCheckpoint(eager=True)
    frontier = visited
    found = []
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(sym, frontier.id == sym.src)
            .join(probes.select("pk", "a", "b"), "pk")
            # the probe edge itself is removed from its own BFS
            .where(
                ~(
                    ((F.col("id") == F.col("a")) & (F.col("dst") == F.col("b")))
                    | ((F.col("id") == F.col("b")) & (F.col("dst") == F.col("a")))
                )
            )
            .select("pk", F.col("dst").alias("id"), F.lit(depth).alias("d"))
            .join(visited.select("pk", "id"), ["pk", "id"], "left_anti")
            .groupBy("pk", "id")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        hit = nxt.join(
            probes.select("pk", F.col("b").alias("id")), ["pk", "id"]
        ).select("pk", "d")
        found.append(hit)
        # retire found probes: their frontier rows stop flooding
        done = hit.select("pk")
        visited = visited.unionByName(nxt).join(done, "pk", "left_anti")
        visited = visited.localCheckpoint(eager=True)
        frontier = nxt.join(done, "pk", "left_anti")
    else:
        # loop exhausted with live frontiers: those probes are ambiguous
        # (true bridge in a >max_depth-radius component, or cycle longer
        # than max_depth+1).  strict refuses rather than misclassify (the
        # _bfs_spanning_forest coverage convention); non-strict reports
        # them as NULL under the documented widened meaning.
        if strict and not frontier.isEmpty():
            probes.unpersist()
            sym.unpersist()
            raise ValueError(
                f"shortest_cycles: BFS truncated at max_depth={max_depth} with "
                "unresolved probes still expanding — their shortest cycle "
                "exceeds max_depth+1 (or they are bridges in a component of "
                "radius > max_depth) and NULL would misreport them as plain "
                "bridges.  Raise max_depth (rounds needed ≈ the longest "
                "shortest-cycle length minus one), or pass strict=False to "
                "accept NULL = 'bridge or cycle > max_depth+1'."
            )
    if found:
        hits = found[0]
        for h in found[1:]:
            hits = hits.unionByName(h)
        hits = hits.groupBy("pk").agg(F.min("d").alias("d"))
    else:
        hits = probes.limit(0).select("pk", F.lit(0).alias("d"))
    out = (
        probes.join(hits, "pk", "left")
        .select("a", "b", (F.col("d") + 1).cast("long").alias("cycle_len"))
        .localCheckpoint(eager=True)
    )
    probes.unpersist()
    sym.unpersist()
    return out


def girth(spark, edges: DataFrame, probe_edges: DataFrame | None = None,
          max_depth: int = 32, strict: bool = True) -> DataFrame:
    """Graph girth (length of the shortest cycle) — exact with full
    probes, an upper bound on a sample; NULL for forests.  One row
    (girth).  See :func:`shortest_cycles` for the plan and the
    ``strict``/``max_depth`` truncation contract."""
    sc = shortest_cycles(spark, edges, probe_edges=probe_edges, max_depth=max_depth,
                         strict=strict)
    return sc.agg(F.min("cycle_len").alias("girth"))


def degree_assortativity_directed(spark, edges: DataFrame) -> DataFrame:
    """Directed degree assortativity (Newman 2002; igraph
    ``assortativity_degree(directed=True)``): the Pearson correlation of
    (out-degree of source, in-degree of target) over the distinct
    directed edges.  Pearson is shift-invariant, so the excess-degree
    (k−1) convention yields the identical value.  Returns a 1-row
    DataFrame (assortativity — NULL when either endpoint degree is
    constant, where the correlation is undefined).

    Scale: two degree aggregates + two co-keyed joins into one global
    covariance reduction — the directed twin of
    :func:`degree_assortativity`.
    """
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct().persist()
    outd = e.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("dout"))
    ind = e.groupBy(F.col("dst").alias("id")).agg(F.count(F.lit(1)).alias("din"))
    paired = (
        e.join(outd.select(F.col("id").alias("src"), "dout"), "src")
        .join(ind.select(F.col("id").alias("dst"), "din"), "dst")
    )
    stats = paired.agg(
        F.covar_pop(F.col("dout").cast("double"), F.col("din").cast("double")).alias("cov"),
        F.stddev_pop(F.col("dout").cast("double")).alias("sa"),
        F.stddev_pop(F.col("din").cast("double")).alias("sb"),
    )
    out = stats.select(
        F.round(
            F.when(
                (F.col("sa") > 0) & (F.col("sb") > 0),
                F.col("cov") / (F.col("sa") * F.col("sb")),
            ),
            6,
        ).alias("assortativity")
    ).localCheckpoint(eager=True)
    e.unpersist()
    return out
