"""Distributed Leiden community detection (SURVEY.md §2.5, §3.1, §4.3).

Architecture — gather-scatter supersteps + recursive multi-level descent:

1. **Distributed local-move supersteps** on the level's edge table: one
   join-aggregate gathers, for every vertex, its edge weight towards every
   neighbouring community (reference ``weight_to_comm``, the hot P8
   gather); the closed-form ΔQ of every candidate move is evaluated as
   pure column arithmetic against frozen per-community aggregates; a
   deterministic direction-gated subset of the winning moves commits per
   superstep, and a **monotone-commit guard** (SURVEY.md §4.3) re-scores
   the realised quality each superstep and rolls back / halves a batch
   whose frozen-stats ΔQ turned out negative — per-superstep quality is
   non-decreasing by construction.
2. **Distributed refinement**: connected components *within* each
   community (γ-connectivity — Leiden's core guarantee: communities are
   internally connected).  The aggregate graph is built over the refined
   partition, seeded with the parent communities (advanced.rst:100-123
   step 5).
3. **Recursive multi-level aggregation** (reference Optimiser.py:294-355):
   the coarse graph (edges between refined communities, ``node_size`` =
   community vertex mass) re-enters the *distributed* superstep loop when
   it is still too large for one machine, descending level by level; only
   once it fits under ``local_finish_threshold`` edges is it pulled to the
   driver and finished by :mod:`leidenalg_spark.localcore` — the exact
   reference semantics (refinement, empty communities, constraints,
   n_iterations<0) at zero distributed cost.  At 10^12 edges this is the
   difference between Leiden and a single Louvain sweep: the first coarse
   graph can still hold billions of edges, so it must be optimised
   distributed, not skipped.

Reference-contract features carried through the *distributed* supersteps
(not only the local core):

- ``is_membership_fixed`` (O11, python_optimiser_interface.cpp:76-97):
  fixed vertices never appear in the winners table, coarse nodes
  containing a fixed vertex are fixed in the recursive/local solve, and
  fixed labels survive end-to-end (labels ride the membership rows).
- ``consider_empty_community`` (O9, Optimiser.py:211-220): every vertex
  also scores a move into a fresh empty community — a vertex-proportional
  side branch off the gather (w_to_comm = 0 by definition), so the
  distributed phase can *split* communities without waiting for
  refinement.
- min/max community size (O10, Optimiser.py:223-280): hard gate on
  ``max_comm_size`` (enforcement 0) and the soft
  ``enforcement·Δviolation`` penalty, evaluated per candidate from the
  same community aggregates the ΔQ already reads.

Every superstep checkpoints membership + metrics (north rule) through
:class:`CheckpointManager`, which also truncates the iterative lineage.

Scale notes: the gather shuffles the gathered rows once per superstep on
the vertex id — both sides of the gather join are co-partitioned sorted
caches; comm_stats attaches adaptively (merge join while communities are
many, broadcast once they collapse); AQE splits the tool-hub skew, and
``hub_salt`` bounds any single task's share of a hub vertex's gather.
No per-row Python anywhere: the only Python is the driver loop and the
final coarse NumPy solve.
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
# community-stats tables at or below this row count broadcast; the row is
# (comm:long + ≤4 doubles) ≈ 40 B raw, so 1M rows ≈ 40 MB payload — safely
# inside a 2 GB-per-core executor even with broadcast-relation overhead.
# Above it they merge-join — see the adaptive attach in the superstep loop.
_BCAST_COMMS = 1_000_000
# coarse graphs at or below this edge count finish on the driver-local
# exact core; larger coarse graphs recurse into another distributed level
LOCAL_FINISH_EDGES = 5_000_000


@dataclass
class LeidenResult:
    membership: DataFrame  # (id, comm)
    quality: float
    method: str
    gamma: float
    supersteps: int = 0
    levels: int = 0
    metrics: list = field(default_factory=list)


# ------------------------------------------------------------ T5 renumber
def renumber_membership(membership: DataFrame) -> DataFrame:
    """Distributed ``renumber_communities`` (T5; reference
    ``VertexPartition.py:259-267``): relabel communities to dense
    ``0..C-1`` by decreasing size, ties broken by smallest member id —
    the same fixed tie-break the local core uses
    (``localcore/optimiser.py:renumber_communities``; the reference sort
    is documented unstable, SURVEY §7.3.5), so local and distributed
    paths produce identical labels on identical partitions.

    Scale shape: one |V|-row hash aggregate to (comm, size, min_id),
    one |C|-row single-partition ``row_number`` window (|C| ≪ |V| after
    optimisation — the same rows a driver-side relabel would hold, kept
    JVM-side; at pathological |C| swap in a two-phase partial-count +
    prefix-sum rank, the kernels' dense-rank note), and one remap join
    back onto |V| that AQE converts to broadcast when the remap table is
    small (the normal case).
    """
    from pyspark.sql import Window

    stats = membership.groupBy("comm").agg(
        F.count(F.lit(1)).alias("sz"), F.min("id").alias("mn")
    )
    w = Window.orderBy(F.desc("sz"), F.asc("mn"))
    remap = stats.select(
        "comm", (F.row_number().over(w) - 1).cast("long").alias("new_comm")
    )
    cols = [c for c in membership.columns if c != "comm"]
    return membership.join(remap, "comm").select(
        *cols, F.col("new_comm").alias("comm")
    )


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


def _obs_dict(obs):
    """Observation row as a dict, or None when it cannot be used: AQE
    empty-relation pruning can drop a CollectMetrics node whose subtree
    became runtime-empty, in which case the observation completes with a
    schemaless Row.empty (pyspark's toPyRow then raises).  Callers fall
    back to a direct aggregate."""
    try:
        row = obs.get
    except Exception:  # noqa: BLE001 — the Py4J assert above
        return None
    d = dict(row) if len(row) else None
    return d


def _kl_col(x, y):
    """Binary KL divergence D(x||y) as a Column — the Spark twin of
    localcore.quality.kl_div (reference VertexPartition.py:484,:572):
    each term counts only on its valid domain and contributes 0 outside."""
    one = F.lit(1.0)
    t1 = F.when((x > 0) & (y > 0), x * F.log(x / y)).otherwise(F.lit(0.0))
    t2 = F.when(
        (x < 1) & (y < 1), (one - x) * F.log((one - x) / (one - y))
    ).otherwise(F.lit(0.0))
    return t1 + t2


def _stat_needs(method, directed, constrained=False, mode=None):
    """Which per-community aggregates the method's ΔQ actually reads.

    The ``w`` (internal weight) terms cancel in the ΔQ difference for every
    linear method, so only the KL objectives carry them — Significance
    per-row (its ΔQ reads the candidate community's internal weight),
    Surprise only on the cstats/guard side (its ΔQ reads the two GLOBAL
    scalars Σw_in and Σpairs, shipped as per-superstep literals, never
    per-row); pruning keeps the per-superstep edge shuffle rows narrow.
    Size constraints (O10) need the community node mass ``n`` regardless
    of method; RAND_COMM (O8) needs the community node COUNT ``cnt`` —
    its sampling weight is the number of member vertices, not their mass
    (reference Optimiser.py:104-106, localcore ``count_c``).
    """
    from ..localcore.optimiser import RAND_COMM

    if method in ("modularity", "rbconfiguration"):
        needs = {"K_out", "K_in"} if directed else {"K_out"}
    elif method in ("rber", "cpm"):
        needs = {"n"}
    elif method == "significance":
        needs = {"n", "w"}
    elif method == "surprise":
        # per-ROW needs only: Surprise's ΔQ reads the candidate size nb
        # plus the two global KL scalars — the per-community internal
        # weight stays on the cstats/guard side (``_move_phase`` computes
        # it there) and never rides the edge-proportional gather shuffle
        needs = {"n"}
    else:
        raise ValueError(method)
    if constrained:
        needs = needs | {"n"}
    if mode == RAND_COMM:
        needs = needs | {"cnt"}
    return needs


def _viol(size, mn, mx):
    """Community-size violation (localcore._constraint_adjust twin):
    ``max(0, min-|c|)·[|c|>0] + max(0, |c|-max)`` as a column."""
    out = F.lit(0.0)
    if mn:
        out = out + F.when((size > 0) & (size < mn), mn - size).otherwise(F.lit(0.0))
    if mx:
        out = out + F.greatest(size - F.lit(float(mx)), F.lit(0.0))
    return out


def _constraint_dq(dq, na, nb, sv, opts, empty=False):
    """Apply O10 size constraints to a candidate-gain column.

    Soft penalty ``enforcement · Δviolation`` when enforcement > 0, hard
    gate on max_comm_size when enforcement == 0 (the historic
    ``find_partition(max_comm_size=...)`` behaviour) — identical to
    localcore.optimiser._constraint_adjust.
    """
    mn, mx, enf = opts.min_comm_size, opts.max_comm_size, opts.community_constraint_enforcement
    if not mn and not mx:
        return dq
    nb_eff = F.lit(0.0) if empty else nb
    if enf > 0:
        before = _viol(na, mn, mx) + _viol(nb_eff, mn, mx)
        after = _viol(na - sv, mn, mx) + _viol(nb_eff + sv, mn, mx)
        return dq - F.lit(float(enf)) * (after - before)
    if mx:
        return F.when(nb_eff + sv > mx, F.lit(float("-inf"))).otherwise(dq)
    return dq


def _empty_comm_id(step):
    """Fresh community id per (vertex, superstep) for the O9 empty
    candidate.  xxhash64 of a tagged key: the collision probability with
    any live label is ~2^-64 per pair — negligible, and a collision would
    only alias two split-off singletons, never corrupt the invariants."""
    return F.xxhash64(F.lit("empty_comm"), F.col("id"), F.lit(int(step)))


def _superstep_moves(edges_sym, aug, spec, directed, W, p_global, n_tot, step, seed,
                     n_shuffle, opts, comm_stats=None, n_comm=None, kl_scalars=None):
    """One distributed local-move superstep → the unfiltered per-vertex
    candidate table (winners).

    ``opts.consider_comms`` selects the O8 candidate mode (reference
    Optimiser.py:77-112), all four distributed:

    - ``ALL_NEIGH_COMMS`` (default): neighbour communities via the gather.
    - ``ALL_COMMS``: every community — ``comm_stats`` (the per-community
      stats table, required) joins in as the candidate set, broadcast
      when ``n_comm`` ≤ ``_BCAST_COMMS`` rows and shuffled (cartesian
      tasks stream the stats side from shuffle blocks, nothing is
      collected to one JVM) above that — at level 0 of a singleton init
      |C| ≈ |V|, and a forced vertex-scale broadcast is an OOM, not a
      slow plan; gathered edge weight attaches by left join (0 for
      non-neighbour communities).  |V|·|C| candidate rows — the mode the
      reference needs for negative-weight layers, viable at scale once
      coarsening has collapsed |C|.
    - ``RAND_NEIGH_COMM``: ONE random neighbour community per vertex,
      P(c) ∝ #neighbours in c — an Efraimidis–Spirakis weighted argmax
      (``log(u)/w`` with a per-(vertex, cand, step) hash uniform) over
      the gathered rows, so no driver-side RNG and bit-reproducible.
    - ``RAND_COMM``: ONE random community, P(c) ∝ community node COUNT
      (reference Optimiser.py:104-106 — member vertices, not node mass) —
      the same ES argmax over the ALL_COMMS candidate rows.

    In every mode the O9 empty candidate still joins the comparison set
    and the move commits only when ΔQ > 0 (localcore ``_candidates``
    parity).

    ΔQ is computed against frozen stats: exact for a single move, an
    approximation for a committed batch — the monotone-commit guard in the
    driver loop verifies the realised quality and rolls back otherwise.
    For the linear family and Significance it splits into a candidate-side
    half (the arg-max key) plus a per-vertex constant; for Surprise
    (reference VertexPartition.py:470-492, localcore ``_surprise_diff``)
    the EXACT global-KL ΔQ is evaluated per row against the frozen
    per-superstep scalars ``kl_scalars = (Σ_c w_in_c, Σ_c pairs(n_c))``
    (shipped as literals — they are two driver floats, not a table), with
    v's own-community weight recovered by a ``Window.partitionBy(id)`` max
    over the already-id-clustered gather (no exchange, one sort).

    ``aug`` = membership ⋈ vertex stats ⋈ own-community aggregates
    (id, comm, k_out, k_in, loop, node_size, Ka_*/na/wa as the method
    needs).  The cached EDGE side never moves between supersteps (the
    expensive exchange at 10^12 edges); the vertex-side tables (aug,
    membership — n rows, not m) are re-exchanged/sorted each superstep
    because a parquet checkpoint reload carries no recognised
    partitioning — candidate-community stats ride through the gather join
    (constant per candidate, recovered with ``first()``), and no
    per-superstep broadcast is built for the big side.  The whole tail
    after the gather is ONE hash aggregation per vertex: the arg-max runs
    on the candidate-side ΔQ half (the vertex-side half is constant per
    vertex), v's own-community weight is a ``max(when(cand == comm))``
    inside the same aggregate, and the O9 empty candidate is an inline
    expression on the aggregate row — no own-community join, no
    empty-candidate join, no final fuse join.
    """
    from ..localcore.optimiser import ALL_COMMS, ALL_NEIGH_COMMS, RAND_COMM, RAND_NEIGH_COMM

    method_eff, gamma_eff = spec.method, spec.gamma
    surprise = method_eff == "surprise"
    if surprise and kl_scalars is None:
        raise ValueError("method='surprise' needs the (Σw_in, Σpairs) kl_scalars")
    constrained = bool(opts.min_comm_size or opts.max_comm_size)
    mode = getattr(opts, "consider_comms", ALL_NEIGH_COMMS)
    cross = mode in (ALL_COMMS, RAND_COMM)
    if cross and comm_stats is None:
        raise ValueError(f"consider_comms={mode!r} needs the community stats table")
    needs = _stat_needs(method_eff, directed, constrained, mode=mode)
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
    if "cnt" in needs:
        b_cols.append(("cntb", "cnta"))

    # gather join: edges_sym is cached hash(dst)-partitioned and sorted —
    # the edge side (the heavy one) never re-exchanges; the n-row m_dst
    # side exchanges/sorts to meet it each superstep.  Cross modes pull
    # candidate stats from the comm_stats side instead, so m_dst ships
    # only (dst, cand).
    m_dst = aug.select(
        F.col("id").alias("dst"), F.col("comm").alias("cand"),
        *([] if cross else [F.col(src).alias(dst_name) for dst_name, src in b_cols]),
    ).hint("merge")
    joined = edges_sym.join(m_dst, "dst")
    # ONE edge-proportional exchange per superstep: repartition the gathered
    # rows by vertex; hash(src) satisfies the groupBy(src, cand) clustering,
    # and every downstream op (aug join, per-vertex arg-max,
    # winner→membership update) reuses the same hash(id) layout
    gather = (
        joined.repartition(n_shuffle, "src")
        .groupBy(F.col("src").alias("id"), "cand")
        .agg(
            F.sum("weight").alias("w_vc"),
            # RAND_NEIGH_COMM sampling weight: #neighbours in the community
            *([F.count(F.lit(1)).cast("double").alias("n_nb")]
              if mode == RAND_NEIGH_COMM else []),
            *([] if cross else [F.first(name).alias(name) for name, _ in b_cols]),
        )
    )
    if cross:
        # ALL_COMMS / RAND_COMM: the candidate set is EVERY community —
        # |V|·|C| rows.  Broadcast the (comm, stats) side only when small
        # (the normal regime: post-coarsening |C| is tiny); at level 0 of
        # a singleton init |C| ≈ |V| and a forced broadcast is a
        # driver/executor OOM — above the gate the cartesian tasks stream
        # the stats side from shuffle blocks instead.  The |V|·|C| row
        # count itself is the user's explicit mode choice; the broadcast
        # must not be.  Gathered edge weight attaches by left join, 0 for
        # non-neighbour communities.
        comms_b = comm_stats.select(
            F.col("comm").alias("cand"),
            *[F.col(src).alias(dst_name) for dst_name, src in b_cols],
        )
        if n_comm is None:
            # refuse to guess: defaulting to broadcast here silently
            # re-introduces the level-0 singleton-init OOM (|C| ≈ |V|)
            # the gate exists to prevent — a cross-mode caller must pass
            # the community count it already tracks
            raise ValueError(
                f"consider_comms={mode!r} needs n_comm (the community count) "
                "to decide broadcast vs shuffled cartesian"
            )
        if n_comm <= _BCAST_COMMS:
            comms_b = F.broadcast(comms_b)
        g = (
            aug.crossJoin(comms_b)
            .join(gather.select("id", "cand", "w_vc"), ["id", "cand"], "left")
            .withColumn("w_vc", F.coalesce("w_vc", zero))
        )
    else:
        # RIGHT join: vertices with no gathered neighbour rows (pure
        # self-loop coarse nodes, fully internal vertices) still ride
        # through with a null cand, so the O9 empty candidate below covers
        # every vertex.  NOT persisted: its single consumer is the
        # per-vertex aggregate below — caching an edge-proportional table
        # for one read costs a full memory-bandwidth pass per superstep
        # (and at large inputs evicts the edge cache, a core-count-
        # independent tax that wrecks scaling).
        g = gather.join(aug.hint("merge"), "id", "right")

    present = {"Ka_out": "K_out", "Kb_out": "K_out", "Ka_in": "K_in", "Kb_in": "K_in",
               "na": "n", "nb": "n", "wa": "w", "wb": "w", "cnta": "cnt", "cntb": "cnt"}

    def col_of(name):
        return F.col(name) if present[name] in needs else zero

    csl = spec.correct_self_loops
    args = dict(directed=directed, W=W, p_global=p_global, csl=csl)
    mn, mx, enf = opts.min_comm_size, opts.max_comm_size, opts.community_constraint_enforcement
    sv = F.col("node_size")
    vk_in = F.col("k_in") if directed else F.col("k_out")

    # ---- candidate-side ΔQ term per gathered row.  Linear family /
    # Significance: no w_va dependence — the vertex-side term is constant
    # across one vertex's candidates, so the arg-max needs only this half
    # + the b-side constraint penalty, and the whole superstep tail is ONE
    # hash aggregation over the cached gather (no own-community join, no
    # empty-candidate union/join, no final fuse join).  Surprise: the
    # EXACT global-KL ΔQ (localcore._surprise_diff twin) — q_old/e_old are
    # per-superstep literals, the per-row part reads (w_vc, nb) plus the
    # per-vertex (w_va, na, node_size), with w_va recovered by a window
    # max over the id-clustered gather output.
    kb_out, kb_in, nb, wb = col_of("Kb_out"), col_of("Kb_in"), col_of("nb"), col_of("wb")
    if not directed:
        # undirected strengths are symmetric; K_in mirrors K_out so the
        # directed formulas stay valid without shipping a second column
        kb_in = kb_out
    if surprise:
        from pyspark.sql import Window as _Wnd

        from ..localcore.quality import kl_div as _kl_np, possible_pairs

        sw0, sp0 = float(kl_scalars[0]), float(kl_scalars[1])
        pairs_tot = float(possible_pairs(n_tot, directed, csl))
        g = g.withColumn(
            "w_va_r",
            F.coalesce(
                F.max(F.when(F.col("cand") == F.col("comm"), F.col("w_vc")))
                .over(_Wnd.partitionBy("id")),
                zero,
            ),
        )
        if W > 0 and pairs_tot > 0:
            q_old = min(max(sw0 / W, 0.0), 1.0)
            const_q = float(W) * float(_kl_np(q_old, sp0 / pairs_tot))
            na_c = col_of("na")
            d_sw = F.col("w_vc") - F.col("w_va_r")
            d_sp = (
                _pairs_col(na_c - sv, directed, csl) - _pairs_col(na_c, directed, csl)
                + _pairs_col(nb + sv, directed, csl) - _pairs_col(nb, directed, csl)
            )
            q_new = F.least(
                F.greatest((F.lit(sw0) + d_sw) / F.lit(float(W)), zero), F.lit(1.0)
            )
            e_new = (F.lit(sp0) + d_sp) / F.lit(pairs_tot)
            gb = F.lit(float(W)) * _kl_col(q_new, e_new) - F.lit(const_q)
        else:
            gb = zero
    else:
        gb_old = _contrib(method_eff, gamma_eff, w=wb, ko=kb_out, ki=kb_in, n=nb, **args)
        gb_new = _contrib(
            method_eff, gamma_eff,
            w=wb + F.col("w_vc") + F.col("loop"), ko=kb_out + F.col("k_out"),
            ki=kb_in + vk_in, n=nb + sv, **args,
        )
        gb = gb_new - gb_old
    if (mn or mx) and enf > 0:
        gb = gb - F.lit(float(enf)) * (_viol(nb + sv, mn, mx) - _viol(nb, mn, mx))
    elif mx:
        gb = F.when(nb + sv > mx, F.lit(float("-inf"))).otherwise(gb)

    # tie-break among equal-ΔQ candidates: deterministic smallest-id by
    # default; under size constraints a per-(vertex, step) hash instead —
    # the reference breaks ties RANDOMLY, and a global "everyone picks the
    # same smallest community" tie-break makes admission-capped batches
    # fill one community per superstep (K100 min-size golden would need
    # ~n/min supersteps); the hash spreads tied joiners across targets
    if constrained:
        tie = F.xxhash64(F.col("id"), F.col("cand"), F.lit(int(step)))
    else:
        tie = -F.col("cand")
    is_x = F.col("cand").isNotNull() & (F.col("cand") != F.col("comm"))
    if mode in (RAND_COMM, RAND_NEIGH_COMM):
        # Efraimidis–Spirakis one-sample weighted pick: argmax log(u)/w
        # over candidates ⇔ P(pick c) ∝ w_c, with u a per-(vertex, cand,
        # step, seed) hash uniform — driver-RNG-free and reproducible.
        # The chosen candidate still carries its true gb; the ΔQ > 0 gate
        # and the O9 empty comparison below are unchanged (localcore
        # _candidates semantics: best-of {random pick, empty}).
        # RAND_COMM: community node COUNT (reference Optimiser.py:104-106,
        # localcore count_c), not node mass — the two differ whenever
        # node_sizes != 1 (every coarse level)
        wsamp = F.col("cntb") if mode == RAND_COMM else F.col("n_nb")
        _m = 2147483647
        u = (
            F.pmod(
                F.xxhash64(F.col("id"), F.col("cand"), F.lit(int(step)), F.lit(int(seed))),
                F.lit(_m),
            ).cast("double")
            + 0.5
        ) / float(_m)
        pick = F.log(u) / F.greatest(wsamp, F.lit(1e-300))
        order = F.struct(pick.alias("gb"), tie.alias("tie"))
    else:
        order = F.struct(gb.alias("gb"), tie.alias("tie"))
    a_names = ["comm", "k_out"] + (["k_in"] if directed else []) \
        + ["loop", "node_size"] + [src for _, src in b_cols]
    per_v = g.groupBy("id").agg(
        *[F.first(c).alias(c) for c in a_names],
        # v's weight into its own community: the cand == comm gathered row
        F.coalesce(
            F.max(F.when(F.col("cand") == F.col("comm"), F.col("w_vc"))), zero
        ).alias("w_va"),
        F.max_by(
            F.when(is_x, F.struct(F.col("cand").alias("cand"), gb.alias("gb"))),
            F.when(is_x, order),
        ).alias("best"),
    )

    # ---- vertex-side term, exact, on the n-row aggregate.  Surprise's
    # per-row gb is already the FULL ΔQ (own-community pairs change
    # included in the KL), so its a_term carries only the a-side
    # constraint-penalty half.
    ka_out, ka_in, na, wa = col_of("Ka_out"), col_of("Ka_in"), col_of("na"), col_of("wa")
    if not directed:
        ka_in = ka_out
    rm = F.col("w_va") + F.col("loop")
    if surprise:
        a_term = zero
    else:
        ga_old = _contrib(method_eff, gamma_eff, w=wa, ko=ka_out, ki=ka_in, n=na, **args)
        ga_new = _contrib(
            method_eff, gamma_eff,
            w=wa - rm, ko=ka_out - F.col("k_out"),
            ki=ka_in - vk_in, n=na - sv, **args,
        )
        a_term = ga_new - ga_old
    if (mn or mx) and enf > 0:
        a_term = a_term - F.lit(float(enf)) * (_viol(na - sv, mn, mx) - _viol(na, mn, mx))
    dq_x = F.col("best.gb") + a_term
    nc_x = F.col("best.cand")
    if opts.consider_empty_community:
        # O9: the synthetic empty-community candidate (w_to_comm = 0, empty
        # target stats) evaluated inline on the aggregate row — same
        # (dq, smaller-new_comm) preference a union into the arg-max would
        # give
        if surprise:
            if W > 0 and pairs_tot > 0:
                d_sw_e = -F.col("w_va")
                d_sp_e = (
                    _pairs_col(na - sv, directed, csl) - _pairs_col(na, directed, csl)
                    + _pairs_col(sv, directed, csl)
                )
                q_new_e = F.least(
                    F.greatest((F.lit(sw0) + d_sw_e) / F.lit(float(W)), zero),
                    F.lit(1.0),
                )
                e_new_e = (F.lit(sp0) + d_sp_e) / F.lit(pairs_tot)
                gb_e = F.lit(float(W)) * _kl_col(q_new_e, e_new_e) - F.lit(const_q)
            else:
                gb_e = zero
        else:
            gb_e = _contrib(
                method_eff, gamma_eff,
                w=F.col("loop"), ko=F.col("k_out"), ki=vk_in, n=sv, **args,
            )
        dq_e = a_term + gb_e
        if (mn or mx) and enf > 0:
            dq_e = dq_e - F.lit(float(enf)) * _viol(sv, mn, mx)
        elif mx:
            dq_e = F.when(sv > mx, F.lit(float("-inf"))).otherwise(dq_e)
        nc_e = _empty_comm_id(step)
        x_wins = dq_x.isNotNull() & (
            (dq_x > dq_e) | ((dq_x == dq_e) & (nc_x < nc_e))
        )
        cand_tbl = per_v.select(
            "id", "comm", "w_va",
            F.when(x_wins, nc_x).otherwise(nc_e).alias("new_comm"),
            F.when(x_wins, dq_x).otherwise(dq_e).alias("dq"),
        )
    else:
        cand_tbl = per_v.select(
            "id", "comm", "w_va", nc_x.alias("new_comm"), dq_x.alias("dq")
        )
    # direction gate: even steps move only towards larger community
    # ids, odd steps towards smaller — makes simultaneous swap /
    # counter-moves between two communities impossible (a pair of
    # vertices can never trade places in one superstep), unlike a
    # random half-gate which lets same-parity pairs oscillate.
    # The dq > EPSQ improving filter is applied by the caller — the
    # UNFILTERED n-row table (one row per vertex, ``w_va`` riding along)
    # lets the caller fold the convergence counts and the guard's
    # own-community weight into one aggregate over it.
    cand_tbl = cand_tbl.withColumn(
        "gated",
        F.when(F.lit(step % 2 == 0), F.col("new_comm") > F.col("comm")).otherwise(
            F.col("new_comm") < F.col("comm")
        ),
    )
    return cand_tbl


def _superstep_moves_salted(edges_sym, aug, spec, directed, W, p_global, n_tot, step, seed,
                            n_shuffle, k, opts, kl_scalars=None, aux_persists=None):
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

    The partial arg-max key is the candidate-side ΔQ term (plus the
    candidate-side constraint penalty): the source-side term — including
    v's weight to its own community — is constant across a vertex's
    candidates, so it cannot change the arg-max and is applied afterwards
    on the n-row winners table, where the exact dq > 0 threshold, the O9
    empty candidate, and the direction gate run as in the fast path.
    v's static stats ride the edge cache; candidate-community aggregates
    ride the gather; v's own-community row is recovered from the same
    gathered table (``cand == comm``) at no extra scan.

    O8 modes: ``ALL_NEIGH_COMMS`` and ``RAND_NEIGH_COMM`` both work
    salted — the RAND Efraimidis–Spirakis key (``log(u)/n_nb``) is fully
    computable per ``(id, salt3, cand)`` group, because salt3 is a
    function of cand so no candidate group is split across salts, and a
    two-level max over the SAME key equals the unsalted one-level max
    (same seed ⇒ bit-identical picks).  The cross modes
    (ALL_COMMS/RAND_COMM) are refused by the caller: the cross candidate
    set does not ride the gather.

    Surprise (exact, salted): its per-candidate ΔQ reads the per-vertex
    own-community weight w_va, which no single salted task can see — so
    the gathered (id, salt3, cand) table is persisted, the ``cand ==
    comm`` rows (each lives in exactly ONE salt3 group) collapse to an
    n-row w_va table, and w_va rides back onto every gathered row via a
    k×-replicated merge join co-partitioned on (id, salt3) — the same
    layout the comm(v) attach already uses, so the recovery adds one
    n-row aggregate + one n·k-row exchange, never an edge-proportional
    pass.  The vertex's own-community size ``na`` ships as one more
    column on the existing m_src_k join.  ``aux_persists`` (a caller
    list) collects the internal persist for post-superstep cleanup.
    """
    from ..localcore.optimiser import RAND_NEIGH_COMM

    method_eff, gamma_eff = spec.method, spec.gamma
    surprise = method_eff == "surprise"
    if surprise and kl_scalars is None:
        raise ValueError("method='surprise' needs the (Σw_in, Σpairs) kl_scalars")
    if surprise and aux_persists is None:
        # the surprise path persists its gather internally; refusing to
        # run without a cleanup list makes a silent persist leak
        # impossible for any future call site
        raise ValueError(
            "method='surprise' persists the salted gather — pass "
            "aux_persists=[] and unpersist its entries after the superstep"
        )
    rand_mode = getattr(opts, "consider_comms", None) == RAND_NEIGH_COMM
    constrained = bool(opts.min_comm_size or opts.max_comm_size)
    needs = _stat_needs(method_eff, directed, constrained)
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
    # rider pruning: undirected strengths are symmetric — ship only what
    # ΔQ reads (vnsize rides because coarse levels carry real node sizes)
    statics = ["vk_out", "vloop", "vnsize"] if not directed else ["vk_out", "vk_in", "vloop", "vnsize"]
    gather = (
        joined.withColumn("salt3", F.pmod(F.xxhash64("cand"), F.lit(k)))
        .repartition(n_shuffle, "src", "salt3")
        .groupBy(F.col("src").alias("id"), "salt3", "cand")
        .agg(
            F.sum("weight").alias("w_vc"),
            # RAND_NEIGH_COMM sampling weight: #neighbours in the
            # community — complete within one salt3 group (salt3 is a
            # function of cand), so the ES key below is exact
            *([F.count(F.lit(1)).cast("double").alias("n_nb")] if rand_mode else []),
            *[F.first(c).alias(c) for c in statics],
            *[F.first(name).alias(name) for name, _ in b_cols],
        )
    )
    # comm(v) via the k×-replicated membership (co-partitioned on salt3);
    # Surprise additionally ships the vertex's own-community size na —
    # one more column on the existing join
    m_src_k = (
        aug.select("id", "comm", *(["na"] if surprise else []))
        .withColumn("salt3", F.explode(salts))
        .repartition(n_shuffle, "id", "salt3")
        .sortWithinPartitions("id", "salt3")
        .hint("merge")
    )
    # single consumer (the two-level arg-max below, which also carries the
    # own-community w_va row) — not persisted; see the unsalted path.
    # EXCEPT Surprise: its per-candidate ΔQ needs w_va at the partial
    # stage, so g persists (candidate-proportional, ≤ edge rows) and is
    # read twice — once to collapse the cand == comm rows to the n-row
    # w_va table, once for the arg-max with w_va merged back on the
    # (id, salt3) layout it already has
    g = gather.join(m_src_k, ["id", "salt3"])
    if surprise:
        g = g.persist()
        aux_persists.append(g)
        w_va_tbl = (
            g.where(F.col("cand") == F.col("comm"))
            .groupBy("id").agg(F.sum("w_vc").alias("w_va_g"))
        )
        w_va_k = (
            w_va_tbl.withColumn("salt3", F.explode(salts))
            .repartition(n_shuffle, "id", "salt3")
            .sortWithinPartitions("id", "salt3")
            .hint("merge")
        )
        g = g.join(w_va_k, ["id", "salt3"], "left").withColumn(
            "w_va_g", F.coalesce("w_va_g", zero)
        )

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
    if surprise:
        # EXACT global-KL ΔQ (the unsalted path's formula verbatim, with
        # the salted column sources: sv/na from the edge cache + m_src_k
        # riders, w_va from the two-phase recovery above)
        from ..localcore.quality import kl_div as _kl_np, possible_pairs

        sw0, sp0 = float(kl_scalars[0]), float(kl_scalars[1])
        pairs_tot = float(possible_pairs(n_tot, directed, csl))
        svp = F.col("vnsize")
        if W > 0 and pairs_tot > 0:
            q_old = min(max(sw0 / W, 0.0), 1.0)
            const_q = float(W) * float(_kl_np(q_old, sp0 / pairs_tot))
            d_sw = F.col("w_vc") - F.col("w_va_g")
            d_sp = (
                _pairs_col(F.col("na") - svp, directed, csl)
                - _pairs_col(F.col("na"), directed, csl)
                + _pairs_col(nb + svp, directed, csl)
                - _pairs_col(nb, directed, csl)
            )
            q_new = F.least(
                F.greatest((F.lit(sw0) + d_sw) / F.lit(float(W)), zero), F.lit(1.0)
            )
            e_new = (F.lit(sp0) + d_sp) / F.lit(pairs_tot)
            gb = F.lit(float(W)) * _kl_col(q_new, e_new) - F.lit(const_q)
        else:
            gb = zero
    else:
        gb_old = _contrib(method_eff, gamma_eff, w=wb, ko=kb_out, ki=kb_in, n=nb, **args)
        gb_new = _contrib(
            method_eff, gamma_eff,
            w=wb + add, ko=kb_out + F.col("vk_out"),
            ki=kb_in + vk_in, n=nb + F.col("vnsize"), **args,
        )
        gb = gb_new - gb_old
    # candidate-side size constraints must steer the partial arg-max too:
    # hard max gate, and the b-side half of the soft penalty (the a-side
    # half is constant per vertex → applied on the winners table below)
    mn, mx, enf = opts.min_comm_size, opts.max_comm_size, opts.community_constraint_enforcement
    if (mn or mx) and enf > 0:
        gb = gb - F.lit(float(enf)) * (_viol(nb + F.col("vnsize"), mn, mx) - _viol(nb, mn, mx))
    elif mx:
        gb = F.when(nb + F.col("vnsize") > mx, F.lit(float("-inf"))).otherwise(gb)

    # constrained runs spread equal-gain ties by hash (see the unsalted
    # path) so admission-capped targets fill concurrently
    tie = (
        F.xxhash64(F.col("id"), F.col("cand"), F.lit(int(step)))
        if constrained else -F.col("cand")
    )
    is_x = F.col("cand") != F.col("comm")
    if rand_mode:
        # Efraimidis–Spirakis one-sample pick (see the unsalted path):
        # the key log(u)/n_nb is a per-(id, cand) value — u hashes
        # (id, cand, step, seed), identical salted or not — and a
        # two-level max over the same key equals the one-level max, so a
        # salted RAND_NEIGH run is bit-identical to the unsalted one.
        # The key rides the partial's best struct (``ok``) into level 2.
        _m = 2147483647
        u = (
            F.pmod(
                F.xxhash64(F.col("id"), F.col("cand"), F.lit(int(step)), F.lit(int(seed))),
                F.lit(_m),
            ).cast("double")
            + 0.5
        ) / float(_m)
        ok = F.log(u) / F.greatest(F.col("n_nb"), F.lit(1e-300))
        pick = F.max_by(
            F.when(
                is_x,
                F.struct(F.col("cand").alias("cand"), gb.alias("gb"), ok.alias("ok")),
            ),
            F.when(is_x, F.struct(ok.alias("ok"), tie.alias("tie"))),
        )
        tie2 = (
            F.xxhash64(F.col("id"), F.col("best.cand"), F.lit(int(step)))
            if constrained else -F.col("best.cand")
        )
        pick2 = F.max_by(
            F.col("best"), F.struct(F.col("best.ok").alias("ok"), tie2.alias("tie")),
        )
    else:
        pick = F.max_by(
            F.when(is_x, F.struct(F.col("cand").alias("cand"), gb.alias("gb"))),
            F.when(is_x, F.struct(gb.alias("gb"), tie.alias("tie"))),
        )
        tie2 = (
            F.xxhash64(F.col("id"), F.col("best.cand"), F.lit(int(step)))
            if constrained else -F.col("best.cand")
        )
        pick2 = F.max_by(
            F.col("best"), F.struct(F.col("best.gb").alias("gb"), tie2.alias("tie")),
        )
    # two-level arg-max; v's own-community weight (the cand == comm row —
    # it lives in exactly one salt3 group) rides the same aggregations
    partial = g.groupBy("id", "salt3").agg(
        pick.alias("best"),
        F.max(F.when(~is_x, F.col("w_vc"))).alias("w_va_p"),
    )
    best = partial.groupBy("id").agg(
        pick2.alias("best"),
        F.coalesce(F.max("w_va_p"), zero).alias("w_va"),
    )

    # n-row winners stage (ONE merge join with aug — right so every vertex
    # gets the O9 empty candidate): exact source-side term, threshold, gate
    apresent = {"Ka_out": "K_out", "Ka_in": "K_in", "na": "n", "wa": "w"}

    def acol(name):
        return F.col(name) if apresent[name] in needs else zero

    w = best.join(aug.hint("merge"), "id", "right").na.fill({"w_va": 0.0})
    ka_out, ka_in, na, wa = acol("Ka_out"), acol("Ka_in"), acol("na"), acol("wa")
    if not directed:
        ka_in = ka_out
    rm = F.col("w_va") + F.col("loop")
    if surprise:
        # the per-row gb above is already the FULL ΔQ (own-community
        # pairs change included in the KL) — the a-side carries only the
        # constraint-penalty half, exactly like the unsalted path
        a_term = zero
    else:
        ga_old = _contrib(method_eff, gamma_eff, w=wa, ko=ka_out, ki=ka_in, n=na, **args)
        ga_new = _contrib(
            method_eff, gamma_eff,
            w=wa - rm, ko=ka_out - F.col("k_out"),
            ki=ka_in - F.col("k_in"), n=na - F.col("node_size"), **args,
        )
        a_term = ga_new - ga_old
    if (mn or mx) and enf > 0:
        a_term = a_term - F.lit(float(enf)) * (
            _viol(na - F.col("node_size"), mn, mx) - _viol(na, mn, mx)
        )
    dq_x = F.col("best.gb") + a_term
    nc_x = F.col("best.cand")
    if opts.consider_empty_community:
        # O9 evaluated inline on the joined row (see the unsalted path)
        if surprise:
            if W > 0 and pairs_tot > 0:
                d_sw_e = -F.col("w_va")
                d_sp_e = (
                    _pairs_col(na - F.col("node_size"), directed, csl)
                    - _pairs_col(na, directed, csl)
                    + _pairs_col(F.col("node_size"), directed, csl)
                )
                q_new_e = F.least(
                    F.greatest((F.lit(sw0) + d_sw_e) / F.lit(float(W)), zero),
                    F.lit(1.0),
                )
                e_new_e = (F.lit(sp0) + d_sp_e) / F.lit(pairs_tot)
                gb_e_new = (
                    F.lit(float(W)) * _kl_col(q_new_e, e_new_e) - F.lit(const_q)
                )
            else:
                gb_e_new = zero
        else:
            gb_e_new = _contrib(
                method_eff, gamma_eff,
                w=F.col("loop"), ko=F.col("k_out"),
                ki=F.col("k_in") if directed else F.col("k_out"),
                n=F.col("node_size"), **args,
            )
        dq_e = a_term + gb_e_new
        if (mn or mx) and enf > 0:
            dq_e = dq_e - F.lit(float(enf)) * _viol(F.col("node_size"), mn, mx)
        elif mx:
            dq_e = F.when(
                F.col("node_size") > mx, F.lit(float("-inf"))
            ).otherwise(dq_e)
        nc_e = _empty_comm_id(step)
        x_wins = dq_x.isNotNull() & (
            (dq_x > dq_e) | ((dq_x == dq_e) & (nc_x < nc_e))
        )
        cand_tbl = w.select(
            "id", "comm", "w_va",
            F.when(x_wins, nc_x).otherwise(nc_e).alias("new_comm"),
            F.when(x_wins, dq_x).otherwise(dq_e).alias("dq"),
        )
    else:
        cand_tbl = w.select(
            "id", "comm", "w_va", nc_x.alias("new_comm"), dq_x.alias("dq")
        )
    # unfiltered n-row table; the caller applies the dq > EPSQ improving
    # filter (see the unsalted path)
    cand_tbl = cand_tbl.withColumn(
        "gated",
        F.when(F.lit(step % 2 == 0), F.col("new_comm") > F.col("comm")).otherwise(
            F.col("new_comm") < F.col("comm")
        ),
    )
    return cand_tbl


def _cc_batch_iter(batches):
    """Connected components of MANY communities' intra-edge lists at once
    (mapInPandas over a hash(comm)-partitioned edge stream): min-hooking +
    pointer-jumping union-find over composite (comm, vertex) keys —
    O(m log n) flat array ops, no per-edge and no per-community Python.
    Component label = minimum vertex id within the component, identical to
    the distributed large-star/small-star labelling, so the two refinement
    paths are bit-compatible.  One vectorised union-find per PARTITION
    (each holding every intra edge of its hash bucket of communities)
    replaces a per-community applyInPandas, whose per-group Arrow/pandas
    overhead dominates when supersteps leave 10^4-10^6 small communities.
    """
    import pandas as pd

    chunks = [c for c in batches if len(c)]
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
    comm = pdf["comm"].to_numpy(dtype=np.int64)
    s = pdf["src"].to_numpy(dtype=np.int64)
    d = pdf["dst"].to_numpy(dtype=np.int64)
    # dense (comm, vertex) keys; lexicographic order makes the min dense
    # index of a component also its min vertex id (components never span
    # communities)
    keys = np.empty((2 * len(s), 2), dtype=np.int64)
    keys[: len(s), 0], keys[: len(s), 1] = comm, s
    keys[len(s):, 0], keys[len(s):, 1] = comm, d
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    si, di = inv[: len(s)], inv[len(s):]
    parent = np.arange(len(uniq), dtype=np.int64)
    while True:
        ps, pdd = parent[si], parent[di]
        mn = np.minimum(ps, pdd)
        mx = np.maximum(ps, pdd)
        before = parent.copy()
        np.minimum.at(parent, mx, mn)
        while True:
            pp = parent[parent]
            if np.array_equal(pp, parent):
                break
            parent = pp
        if np.array_equal(parent, before):
            break
    yield pd.DataFrame({"id": uniq[:, 1], "component": uniq[parent, 1]})


def _refine_by_components(spark, edges, membership, ckpt, big_comm_edges=5_000_000,
                          m_edges=None):
    """Distributed refinement: split every community into its connected
    components (γ-connectivity).  Returns (refined, intra) where refined is
    (id, comm, refined) with refined = hash(comm, component) and intra is
    the persisted intra-community edge cache (caller unpersists after
    materialising downstream state).

    Size-partitioned execution: communities are grouped by their
    intra-edge count.  The normal case — every community under
    ``big_comm_edges`` — runs as ONE shuffle (groupBy comm) plus an
    Arrow-batched per-group union-find; only oversized communities (a hub
    community at web scale) fall back to the global log-round
    large-star/small-star kernel, whose rounds cost several shuffles plus
    a checkpoint each.  Cross-community merges are impossible in either
    path: intra edges never span communities."""
    from .kernels import connected_components

    m_src = membership.select(F.col("id").alias("src"), F.col("comm").alias("comm_src"))
    m_dst = membership.select(F.col("id").alias("dst"), F.col("comm").alias("comm_dst"))
    intra = (
        edges.join(m_src, "src").join(m_dst, "dst")
        .where(F.col("comm_src") == F.col("comm_dst"))
        .select(F.col("comm_src").alias("comm"), "src", "dst")
        .persist()
    )
    # a community's intra-edge count is bounded by the level's total edge
    # count — when that bound is under the threshold (every non-root level
    # of a converging run, and any sub-5M-edge graph) the oversized-probe
    # job is provably a no-op and is skipped outright
    if m_edges is not None and m_edges <= big_comm_edges:
        n_big = 0
        big = None
    else:
        big = (
            intra.groupBy("comm").agg(F.count(F.lit(1)).alias("m"))
            .where(F.col("m") > big_comm_edges).select("comm")
        )
        n_big = big.count()
    small = intra
    comp = None
    if n_big:
        big_edges = intra.join(F.broadcast(big), "comm", "semi").select("src", "dst")
        comp = connected_components(
            spark, big_edges.withColumn("weight", F.lit(1.0)), ckpt=ckpt
        )
        small = intra.join(F.broadcast(big), "comm", "left_anti")
    # partition count sized so one partition's intra edges fit one task's
    # memory (~200k edges) — the mapInPandas below materialises a partition
    n_cc = max(8, spark.sparkContext.defaultParallelism,
               (m_edges or 0) // 200_000)
    small_comp = (
        small.repartition(n_cc, "comm")
        .mapInPandas(_cc_batch_iter, "id long, component long")
    )
    comp = small_comp if comp is None else comp.unionByName(small_comp)
    refined = membership.join(comp, "id", "left").select(
        "id", "comm", F.coalesce("component", F.col("id")).alias("component")
    )
    # refined community id: hash of (comm, component) — deterministic
    refined = refined.select(
        "id",
        "comm",
        F.xxhash64(F.col("comm"), F.col("component")).alias("refined"),
    )
    return refined, intra


# ----------------------------------------------------- move-phase machinery
def _level_setup(spark, edges, directed, node_sizes, hub_salt, n_shuffle):
    """Static per-level tables: symmetrised partitioned edge cache, vertex
    stats (strengths, loops, node sizes), and level scalars."""
    from ..functions.quality import vertex_strengths

    sym = edges.where(F.col("src") != F.col("dst"))
    # the gather must see BOTH directions in every mode: the reference ΔQ
    # weight term is w(v→C) + w(C→v) for directed graphs (localcore
    # diff_move_many: rm = wo + wi) and the once-counted incident weight
    # for undirected ones — either way each stored edge contributes from
    # both endpoints, so the cached gather table is always the union of
    # forward and reversed rows
    edges_sym = sym.unionByName(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    loops = (
        edges.where(F.col("src") == F.col("dst"))
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("weight").alias("loop"))
    )
    vstats = vertex_strengths(edges, directed).join(loops, "id", "left").na.fill({"loop": 0.0})
    if node_sizes is not None:
        vstats = vstats.join(node_sizes, "id", "full").na.fill(
            {"node_size": 1.0, "k_out": 0.0, "k_in": 0.0, "loop": 0.0}
        )
    else:
        vstats = vstats.withColumn("node_size", F.lit(1.0))
    vstats = vstats.repartition(n_shuffle, "id").persist()  # co-partitioned with membership
    if hub_salt > 1:
        # salted layout: hub in-edges spread over k sub-partitions, and
        # v's static stats ride the cache so the salted gather never
        # joins the vertex table on an unsalted key
        static_cols = [
            F.col("k_out").alias("vk_out"), F.col("loop").alias("vloop"),
            F.col("node_size").alias("vnsize"),
        ]
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
    totals = vstats.agg(
        F.sum("node_size").alias("n"), F.sum("loop").alias("lt"),
        F.count(F.lit(1)).alias("nv"),
    ).first()
    n_tot, loop_tot = float(totals["n"] or 0.0), float(totals["lt"] or 0.0)
    return edges_sym, vstats, W, n_tot, loop_tot, int(totals["nv"])


def _guard_exprs(spec, directed, W, p_global, opts):
    """Aggregate expressions over the community-stats table that the
    monotone-commit guard needs — folded into the SAME job as the
    ``n_comm`` count so the guard adds no cstats-side action:

    - ``q_pen``: for the linear family, Σ_c penalty(K_c / n_c); for
      significance the FULL per-community contribution (its quality reads
      cstats only).
    - ``q_viol``: Σ_c size-constraint violation (O10 soft penalty) when
      constraints are active — without it the guard would roll back the
      corrective moves that pull an overshooting community back under
      ``max_comm_size``, because those moves lower the *unconstrained*
      quality on purpose.
    """
    method_eff, gamma_eff = spec.method, spec.gamma
    csl = spec.correct_self_loops
    if method_eff == "surprise":
        # the guard reads the same (Σw_in, Σpairs) scalars the superstep's
        # exact ΔQ freezes — _move_phase aggregates them as q_sw/q_sp in
        # the same dedicated cstats job, so no extra exprs here
        exprs = []
        if opts is not None and (opts.min_comm_size or opts.max_comm_size) \
                and opts.community_constraint_enforcement > 0:
            exprs.append(
                F.coalesce(
                    F.sum(_viol(F.col("na"), opts.min_comm_size, opts.max_comm_size)),
                    F.lit(0.0),
                ).alias("q_viol")
            )
        return exprs
    if method_eff == "significance":
        pen = -_contrib(
            method_eff, gamma_eff, directed=directed, W=W, p_global=p_global, csl=csl,
            w=F.col("wa"), ko=F.lit(0.0), ki=F.lit(0.0), n=F.col("na"),
        )
    elif method_eff == "modularity":
        pen = (F.col("Ka_out") * F.col("Ka_in")) / (W * W) if directed else (
            F.col("Ka_out") * F.col("Ka_out")
        ) / (4.0 * W * W)
    elif method_eff == "rbconfiguration":
        pen = gamma_eff * ((F.col("Ka_out") * F.col("Ka_in")) / W if directed else (
            F.col("Ka_out") * F.col("Ka_out")
        ) / (4.0 * W))
    elif method_eff == "rber":
        pen = gamma_eff * p_global * _pairs_col(F.col("na"), directed, csl)
    elif method_eff == "cpm":
        pen = gamma_eff * _pairs_col(F.col("na"), directed, csl)
    else:
        raise ValueError(method_eff)
    exprs = [F.coalesce(F.sum(pen), F.lit(0.0)).alias("q_pen")]
    if opts is not None and (opts.min_comm_size or opts.max_comm_size) \
            and opts.community_constraint_enforcement > 0:
        exprs.append(
            F.coalesce(
                F.sum(_viol(F.col("na"), opts.min_comm_size, opts.max_comm_size)),
                F.lit(0.0),
            ).alias("q_viol")
        )
    return exprs


def _quality_from_guard_row(row, own, spec, directed, W, loop_tot, opts,
                            pairs_tot=None):
    """Realised quality of the current membership (monotone-commit guard)
    from the combined cstats aggregate values + (linear family only) the
    own-community weight sum gathered by the caller — no extra edge scan.

    Measured in the objective the supersteps optimise (exact for every
    method, Surprise included), minus the soft O10 penalty when active.
    ``row`` is a plain dict (from a collected Row or an Observation).
    """
    method_eff = spec.method
    constraint_pen = 0.0
    if "q_viol" in row:
        constraint_pen = float(opts.community_constraint_enforcement) * float(row["q_viol"])
    if method_eff == "surprise":
        from ..localcore.quality import kl_div

        sw, sp = float(row["q_sw"]), float(row["q_sp"])
        if W <= 0 or not pairs_tot:
            return 0.0 - constraint_pen
        q = min(max(sw / W, 0.0), 1.0)
        return float(W) * float(kl_div(q, sp / pairs_tot)) - constraint_pen
    if method_eff == "significance":
        return -float(row["q_pen"]) - constraint_pen
    # the gather table is symmetrised in both modes, so Σ_v w_va counts
    # every intra-community edge twice (directed: once per direction pair
    # member w(v→C) + w(C→v) summed over both endpoints)
    w_in_tot = float(own) * 0.5 + loop_tot
    coef_w = (1.0 / W if W > 0 else 0.0) if method_eff == "modularity" else 1.0
    return coef_w * w_in_tot - float(row["q_pen"]) - constraint_pen


def _move_phase(
    spark, edges, spec, directed, seed, n_shuffle, max_supersteps, ckpt, opts,
    membership, node_sizes=None, fixed=None, hub_salt=0, level=0,
    monotone=True, resume_state=None, name="membership", ckpt_idx0=0,
    iteration=0, total_steps0=0,
):
    """Run the distributed local-move superstep loop on one level until no
    vertex has an improving move.  Returns (membership, steps, ckpt_idx).

    Monotone-commit guard (SURVEY §4.3): the quality of the incoming
    membership is evaluated each superstep from the gather's own cached
    tables; if the previous batch commit *decreased* it, the membership
    reverts to the last good checkpoint and the superstep is retried with
    a deterministically-halved commit fraction (always keeping the single
    best move, whose frozen-stats ΔQ is exact, so the retry strictly
    improves) — per-committed-superstep quality is non-decreasing.  All
    guard state (q_prev, fraction, good checkpoint index) rides the
    durable resume state, so a resumed run replays identically.
    """
    method_eff = spec.method
    surprise = method_eff == "surprise"
    constrained = bool(opts.min_comm_size or opts.max_comm_size)
    needs = _stat_needs(
        method_eff, directed, constrained, mode=getattr(opts, "consider_comms", None)
    )
    edges_sym, vstats, W, n_tot, loop_tot, n_verts = _level_setup(
        spark, edges, directed, node_sizes, hub_salt, n_shuffle
    )
    # lagged community-count estimate for the broadcast-vs-merge attach
    # decision (a perf heuristic, not a correctness input): seeded with the
    # vertex count (= the singleton community count, an upper bound for any
    # seed membership), refreshed each superstep from the fused cstats
    # observation — no dedicated count job
    n_comm_est = n_verts
    from ..localcore.quality import possible_pairs

    pairs_tot = float(possible_pairs(n_tot, directed, spec.correct_self_loops))
    p_global = W / pairs_tot if pairs_tot > 0 else 0.0
    ecount = edges.count()  # metric basis: input edges, not the symmetrised cache

    ckpt_idx = ckpt_idx0
    step = 0
    q_prev, frac_bits, frac_used, good_idx = None, 0, False, ckpt_idx0
    good_membership = membership  # last commit whose realised quality held
    if resume_state is not None:
        step = resume_state.get("step", 0)
        ckpt_idx = resume_state.get("ckpt_idx", ckpt_idx0)
        q_prev = resume_state.get("q_prev")
        frac_bits = resume_state.get("frac_bits", 0)
        frac_used = resume_state.get("frac_used", False)
        good_idx = resume_state.get("good_idx", ckpt_idx)
        if ckpt.path and good_idx != ckpt_idx:
            good_membership = ckpt.load(name, good_idx)
        else:
            good_membership = membership
    if fixed is not None:
        fixed = fixed.select("id").persist()

    # None ⇒ the loop never ran this invocation (a resume can enter with
    # step already == max_supersteps); the post-loop guard then cannot
    # know whether the final batch moved anything and must validate it
    n_moves = None

    while step < max_supersteps:
        step += 1
        t0 = time.time()
        # augmented vertex table: membership ⋈ static vertex stats, plus
        # the own-community aggregates the method needs.  cstats is a
        # pruned (comm, 1-4 doubles) table built with map-side partial
        # aggregation, attached adaptively (see below).
        # persisted: both the cstats aggregate and the aug attach read it,
        # and the checkpoint-reloaded membership carries no recognised
        # partitioning — without the cache the n-row exchange+sort against
        # the vstats layout would run twice per superstep
        mstats = membership.join(vstats.hint("merge"), "id").persist()
        agg_cols = []
        if "K_out" in needs:
            agg_cols.append(F.sum("k_out").alias("Ka_out"))
        if "K_in" in needs:
            agg_cols.append(F.sum("k_in").alias("Ka_in"))
        if "n" in needs:
            agg_cols.append(F.sum("node_size").alias("na"))
        if "cnt" in needs:
            # RAND_COMM sampling weight: member-vertex count, not mass
            agg_cols.append(F.count(F.lit(1)).cast("double").alias("cnta"))
        cstats = mstats.groupBy("comm").agg(*agg_cols)
        if "w" in needs or surprise:
            # only the KL objectives need per-community internal weight —
            # Significance in its per-row dQ, Surprise on the guard side
            # (the Σw_in scalar); for the linear family the w terms cancel
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
        # (lagged) community count, which shrinks as merges proceed.
        #
        # Linear family: the community count AND the guard's cstats-side
        # quality terms ride the gather pipeline as an Observation — the
        # guard costs no dedicated cstats job, only the own-community sum
        # over the cached gather (which is also what materialises it).
        # The KL objectives keep the dedicated aggregate: Significance's
        # guard reads cstats alone and must be known BEFORE the commit,
        # and Surprise's frozen scalars (Σw_in, Σpairs) are literals in
        # the superstep expressions themselves.
        cstats = cstats.persist()
        guard_aggs = _guard_exprs(spec, directed, W, p_global, opts) if monotone else []
        fuse_guard = "w" not in needs and not surprise
        kl_scalars = None
        if fuse_guard:
            from pyspark.sql import Observation

            obs_c = Observation()
            cstats_o = cstats.observe(
                obs_c, F.count(F.lit(1)).alias("n_comm"), *guard_aggs
            )
            guard_row, n_comm = None, n_comm_est
        else:
            extra = []
            if surprise:
                extra = [
                    F.coalesce(F.sum("wa"), F.lit(0.0)).alias("q_sw"),
                    F.coalesce(
                        F.sum(_pairs_col(F.col("na"), directed, spec.correct_self_loops)),
                        F.lit(0.0),
                    ).alias("q_sp"),
                ]
            guard_row = cstats.agg(
                F.count(F.lit(1)).alias("n_comm"), *guard_aggs, *extra
            ).first().asDict()
            n_comm = n_comm_est = int(guard_row["n_comm"])
            cstats_o = cstats
            if surprise:
                kl_scalars = (float(guard_row["q_sw"]), float(guard_row["q_sp"]))
        if n_comm <= _BCAST_COMMS:
            aug = mstats.join(F.broadcast(cstats_o), "comm").persist()
        else:
            aug = (
                mstats.join(cstats_o.hint("merge"), "comm")
                .repartition(n_shuffle, "id").sortWithinPartitions("id").persist()
            )
        aux_persists = []
        if hub_salt > 1:
            from ..localcore.optimiser import ALL_NEIGH_COMMS as _DEFAULT_MODE
            from ..localcore.optimiser import RAND_NEIGH_COMM as _RAND_NEIGH

            if getattr(opts, "consider_comms", _DEFAULT_MODE) not in (
                _DEFAULT_MODE, _RAND_NEIGH,
            ):
                raise ValueError(
                    "hub_salt > 1 supports consider_comms=ALL_NEIGH_COMMS or "
                    "RAND_NEIGH_COMM only (the cross modes' candidate set does "
                    "not ride the salted gather; run them unsalted)"
                )
            winners = _superstep_moves_salted(
                edges_sym, aug, spec, directed, W, p_global,
                n_tot, ckpt_idx + 1, seed, n_shuffle, hub_salt, opts,
                kl_scalars=kl_scalars, aux_persists=aux_persists,
            )
        else:
            # cross modes (ALL_COMMS / RAND_COMM) read the plain persisted
            # cstats — not cstats_o: the Observation must fire exactly once,
            # through the aug attach
            winners = _superstep_moves(
                edges_sym, aug, spec, directed, W, p_global,
                n_tot, ckpt_idx + 1, seed, n_shuffle, opts, comm_stats=cstats,
                n_comm=n_comm, kl_scalars=kl_scalars,
            )
        if fixed is not None:
            winners = winners.join(
                F.broadcast(fixed.select("id", F.lit(True).alias("is_fixed"))),
                "id", "left",
            )
        else:
            winners = winners.withColumn("is_fixed", F.lit(False))
        imp = (F.col("dq") > EPSQ) & ~F.coalesce(F.col("is_fixed"), F.lit(False))

        # ---- ONE action per superstep: the checkpoint write below
        # materialises the whole gather pipeline, and everything the
        # driver needs rides it as Observations — the convergence counts
        # and the guard's own-community weight (Σ_v w_va — fixed vertices
        # included: it is a property of the CURRENT membership, not of
        # the movable set) off the n-row candidate table, plus, through
        # the fused cstats Observation, the community count + the guard's
        # cstats-side terms.  The monotone guard therefore evaluates
        # AFTER the commit is saved: on a detected regression the
        # just-written (bad-derived) checkpoint is abandoned along with
        # the regressed one — one wasted write on the rare rollback path
        # buys one fewer driver round-trip on every superstep.
        from pyspark.sql import Observation as _Obs

        obs_w = _Obs()
        winners = winners.observe(
            obs_w,
            F.coalesce(F.sum("w_va"), F.lit(0.0)).alias("own"),
            F.count(F.when(imp, 1)).alias("improving"),
            F.count(F.when(imp & F.col("gated"), 1)).alias("moves"),
        ).persist()
        in_membership, in_idx = membership, ckpt_idx  # pre-commit snapshot
        # was the INCOMING commit (the one this superstep's guard will
        # validate) fractional?  Captured before this superstep's own
        # commit-build overwrites frac_used — escalation must step from
        # the level the VALIDATED commit was built at.
        in_frac_used = frac_used

        commit = winners.where(imp & F.col("gated")).select("id", "comm", "new_comm", "dq")
        if frac_bits > 0:
            frac_used = True
            # retry of a reverted batch: keep a deterministic 1/2^bits
            # subset plus the single best move (exact ΔQ > 0 → progress)
            top = commit.agg(F.max_by("id", "dq").alias("tid")).first()["tid"]
            commit = commit.where(
                (F.pmod(F.xxhash64("id", F.lit(seed + 77)), F.lit(2 ** frac_bits)) == 0)
                | (F.col("id") == F.lit(top if top is not None else -1))
            )
        if constrained:
            # O10 admission capacity: a batch of simultaneous joins is
            # admitted per target community in (dq desc, id) order only up
            # to the constraint headroom — under-min targets fill to
            # exactly min_comm_size, max-capped targets to max_comm_size —
            # because the frozen-stats ΔQ (and, for min-only constraints,
            # even the realised penalty) cannot see the batch overshoot:
            # 99 vertices piling into one K100 community in a single
            # superstep registers NO min-violation, yet locks the graph
            # into an unsplittable coarse node.  The per-target window is
            # winners-proportional and only runs on constrained jobs.
            from pyspark.sql import Window as _W
            mnv = float(opts.min_comm_size or 0)
            mxv = float(opts.max_comm_size or 0)
            tgt = cstats.select(F.col("comm").alias("new_comm"), F.col("na").alias("tgt_n"))
            commit = (
                commit.join(vstats.select("id", "node_size").hint("merge"), "id")
                .join(tgt, "new_comm", "left").na.fill({"tgt_n": 0.0})
            )
            inf = F.lit(float("inf"))
            if opts.min_comm_size and not opts.max_comm_size:
                cap = F.when(F.col("tgt_n") < mnv, mnv - F.col("tgt_n")).otherwise(inf)
            elif opts.max_comm_size and not opts.min_comm_size:
                cap = F.lit(mxv) - F.col("tgt_n")
            else:
                cap = F.when(F.col("tgt_n") < mnv, mnv - F.col("tgt_n")).otherwise(
                    F.lit(mxv) - F.col("tgt_n")
                )
            w_c = (
                _W.partitionBy("new_comm")
                .orderBy(F.desc("dq"), F.asc("id"))
                .rowsBetween(_W.unboundedPreceding, 0)
            )
            commit = (
                commit.withColumn("cum", F.sum("node_size").over(w_c))
                .where(F.col("cum") <= cap)
                .select("id", "comm", "new_comm", "dq")
            )
        new_membership = (
            membership.join(commit.select("id", "new_comm"), "id", "left")
            .select("id", F.coalesce("new_comm", "comm").alias("comm"))
        )
        # THE superstep action: the checkpoint write materialises the
        # gather pipeline once and fires both Observations
        ckpt_idx += 1
        membership = ckpt.save(new_membership, name, ckpt_idx)
        # Row.empty hazard: when the commit set is runtime-empty (the
        # CONVERGED superstep), AQE empty-relation pruning removes the
        # join's commit side — including the CollectMetrics nodes — so
        # the observations complete with a schemaless empty row.  Fall
        # back to direct aggregates over the (persisted) tables; this
        # costs one extra job only on that final superstep, exactly the
        # old two-action shape.
        srow = _obs_dict(obs_w)
        if srow is None:
            srow = winners.agg(
                F.coalesce(F.sum("w_va"), F.lit(0.0)).alias("own"),
                F.count(F.when(imp, 1)).alias("improving"),
                F.count(F.when(imp & F.col("gated"), 1)).alias("moves"),
            ).first().asDict()
        n_improving, n_moves = int(srow["improving"]), int(srow["moves"])
        if fuse_guard:
            guard_row = _obs_dict(obs_c)
            if guard_row is None:
                guard_row = cstats.agg(
                    F.count(F.lit(1)).alias("n_comm"), *guard_aggs
                ).first().asDict()
            n_comm_est = int(guard_row["n_comm"])

        # ---- monotone-commit guard: realised quality of the INCOMING
        # membership (the previous superstep's commit), from the
        # observation values — no extra action
        if monotone:
            q_now = _quality_from_guard_row(
                guard_row, float(srow["own"]), spec, directed, W, loop_tot, opts,
                pairs_tot=pairs_tot,
            )
            if q_prev is not None and q_now < q_prev - 1e-9:
                # the previous batch degraded realised quality: abandon
                # BOTH the regressed commit (in_idx) and the checkpoint
                # just derived from it (ckpt_idx), revert to the last
                # good membership, and retry with a halved commit
                # fraction (the retry recomputes winners from the good
                # membership deterministically).  bad_steps lets ledger
                # consumers drop every non-surviving save.
                frac_bits += 1
                frac_used = False
                ckpt.log(
                    name="leiden_rollback", level=level, step=step,
                    frac=1.0 / (2 ** frac_bits), q_regressed=float(q_now - q_prev),
                    bad_steps=[in_idx, ckpt_idx],
                )
                ckpt_idx += 1
                membership = ckpt.save(good_membership, name, ckpt_idx)
                if level == 0:
                    ckpt.save_state({
                        "iteration": iteration, "step": step, "ckpt_idx": ckpt_idx,
                        "total_steps": total_steps0, "q_prev": q_prev,
                        "frac_bits": frac_bits, "frac_used": False, "good_idx": ckpt_idx,
                    })
                good_membership = membership
                winners.unpersist()
                for h in aux_persists:
                    h.unpersist()
                aug.unpersist()
                mstats.unpersist()
                cstats.unpersist()
                continue
            q_prev = q_now
            good_membership = in_membership  # validated incoming snapshot
            good_idx = in_idx
            if in_frac_used:
                # the fractional retry was validated — back to full
                # batches.  This superstep's own commit was already built
                # at the old level (one extra conservative fractional
                # batch after a rollback — smaller, never wrong);
                # frac_used still describes it, so the next guard pass
                # simply no-ops this reset again.
                frac_bits = 0

        if level == 0:
            ckpt.save_state({
                "iteration": iteration, "step": step, "ckpt_idx": ckpt_idx,
                "total_steps": total_steps0, "q_prev": q_prev,
                "frac_bits": frac_bits, "frac_used": frac_used, "good_idx": good_idx,
            })
        winners.unpersist()
        for h in aux_persists:
            h.unpersist()
        aug.unpersist()
        mstats.unpersist()
        cstats.unpersist()
        dt = time.time() - t0
        ckpt.log(
            name="leiden_superstep", level=level, step=step,
            moves=int(n_moves), improving=int(n_improving),
            secs=round(dt, 4), edges_per_sec=round(ecount / max(dt, 1e-9), 1),
        )
        if n_improving == 0:
            break
    else:
        # ---- post-loop guard: the in-loop check always scores the
        # PREVIOUS commit, so when the loop exhausts max_supersteps the
        # final batch is unvalidated — score it now and revert to the
        # last good membership if it regressed.  (A convergence exit is
        # covered: its last commit was empty.)  Computed via df_quality,
        # whose summation grouping differs from the guard row's by float
        # rounding only — hence the looser epsilon.
        if monotone and q_prev is not None and (n_moves is None or int(n_moves) > 0):
            q_last = df_quality(
                edges, membership, spec.method, spec.gamma, directed,
                node_sizes=node_sizes, correct_self_loops=spec.correct_self_loops,
            )
            if constrained and opts.community_constraint_enforcement > 0:
                sizes = (
                    membership.join(vstats.select("id", "node_size"), "id")
                    .groupBy("comm").agg(F.sum("node_size").alias("na"))
                )
                viol = float(
                    sizes.agg(
                        F.coalesce(
                            F.sum(_viol(F.col("na"), opts.min_comm_size, opts.max_comm_size)),
                            F.lit(0.0),
                        )
                    ).first()[0]
                )
                q_last -= float(opts.community_constraint_enforcement) * viol
            if q_last < q_prev - 1e-6 * max(1.0, abs(q_prev)):
                ckpt.log(
                    name="leiden_rollback", level=level, step=step,
                    frac=0.0, q_regressed=float(q_last - q_prev),
                )
                ckpt_idx += 1
                membership = ckpt.save(good_membership, name, ckpt_idx)
    if fixed is not None:
        fixed.unpersist()
    edges_sym.unpersist()
    vstats.unpersist()
    return membership, step, ckpt_idx


# --------------------------------------------------- multi-level descent
def _descend(
    spark, edges, spec, directed, seed, max_supersteps, ckpt, opts,
    membership, node_sizes, fixed, level, local_finish_threshold, max_levels, hub_salt,
    m_edges=None, monotone=True,
):
    """Refine → aggregate → recurse (reference Optimiser.py:294-355 +
    advanced.rst:100-123 steps 2-5).

    The coarse graph either (a) fits under ``local_finish_threshold``
    edges → exact driver-local finish, or (b) re-enters the *distributed*
    superstep loop as the next level (node_size = community vertex mass,
    initial membership = parent communities, fixedness lifted per coarse
    node) and recurses.  Projection back down is one join per level
    (coarse side is the small side).
    """
    t_refine0 = time.time()
    sym = edges.where(F.col("src") != F.col("dst"))
    refined, intra = _refine_by_components(spark, sym, membership, ckpt, m_edges=m_edges)
    refined = refined.persist()
    r_src = refined.select(F.col("id").alias("src"), F.col("refined").alias("r_src"))
    r_dst = refined.select(F.col("id").alias("dst"), F.col("refined").alias("r_dst"))
    coarse_edges = (
        edges.join(r_src, "src").join(r_dst, "dst")
        .groupBy("r_src", "r_dst")
        .agg(F.sum("weight").alias("weight"))
        .select(F.col("r_src").alias("src"), F.col("r_dst").alias("dst"), "weight")
    )
    verts = refined
    if node_sizes is not None:
        verts = verts.join(node_sizes, "id", "left").na.fill({"node_size": 1.0})
    else:
        verts = verts.withColumn("node_size", F.lit(1.0))
    if fixed is not None:
        verts = verts.join(
            F.broadcast(fixed.select("id", F.lit(True).alias("f"))), "id", "left"
        ).na.fill({"f": False})
    else:
        verts = verts.withColumn("f", F.lit(False))
    coarse_nodes = verts.groupBy("refined").agg(
        F.sum("node_size").alias("node_size"),
        F.first("comm").alias("parent"),
        F.max("f").alias("has_fixed"),
        F.count(F.lit(1)).alias("n_members"),
    ).persist()
    # persist BEFORE counting: the local finish / distributed recursion
    # re-reads coarse_edges, and without the cache that re-read replays the
    # whole refine pipeline (including the per-community CC stage)
    coarse_edges = coarse_edges.persist()
    n_coarse_edges = coarse_edges.count()
    crow = coarse_nodes.agg(
        F.count(F.lit(1)).alias("cv"), F.sum("n_members").alias("fv")
    ).first()
    n_coarse_v, n_fine_v = int(crow["cv"]), int(crow["fv"])
    ckpt.log(
        name="leiden_coarsen", level=level, coarse_edges=int(n_coarse_edges),
        coarse_vertices=int(n_coarse_v), secs=round(time.time() - t_refine0, 4),
    )
    intra.unpersist()

    if n_coarse_edges > local_finish_threshold and n_coarse_v >= n_fine_v:
        # refinement collapsed nothing (reference Optimiser break condition:
        # coarse.n == cur.n) and the graph is too big for an exact finish —
        # this level is stable; keep its membership
        ckpt.log(name="leiden_level_stable", level=level, coarse_vertices=int(n_coarse_v))
        refined.unpersist()
        coarse_nodes.unpersist()
        coarse_edges.unpersist()
        return membership

    sub_ckpt_open = None
    if n_coarse_edges <= local_finish_threshold:
        t_fin0 = time.time()
        coarse_memb = _local_finish(
            spark, coarse_edges, coarse_nodes, spec, directed, seed, opts,
            fixed_any=fixed is not None,
        )
        ckpt.log(
            name="leiden_aggregate", level=level, coarse_edges=int(n_coarse_edges),
            finish="local", secs=round(time.time() - t_fin0, 4),
        )
    elif level >= max_levels:
        # runaway guard — should not happen (levels shrink geometrically);
        # keep the parent membership rather than looping forever
        ckpt.log(name="leiden_max_levels", level=level, coarse_edges=int(n_coarse_edges))
        coarse_memb = coarse_nodes.select(F.col("refined"), F.col("parent").alias("new_comm"))
    else:
        # the scale path: another distributed level.  Ephemeral
        # checkpointing — the descent is deterministic given the durable
        # level-0 membership checkpoint, so resume replays it exactly.
        ckpt.log(
            name="leiden_aggregate", level=level, coarse_edges=int(n_coarse_edges),
            finish="distributed",
        )
        c_edges = coarse_edges.persist()
        c_ns = coarse_nodes.select(F.col("refined").alias("id"), "node_size")
        c_init = coarse_nodes.select(F.col("refined").alias("id"), F.col("parent").alias("comm"))
        c_fixed = (
            coarse_nodes.where("has_fixed").select(F.col("refined").alias("id"))
            if fixed is not None else None
        )
        sub_ckpt = CheckpointManager(spark)
        sub_ckpt.metrics = ckpt.metrics  # share the metrics stream
        n_shuffle = min(
            int(spark.conf.get("spark.sql.shuffle.partitions")),
            max(8, spark.sparkContext.defaultParallelism, n_coarse_edges // 200_000),
        )
        init = sub_ckpt.save(c_init, f"membership_l{level + 1}", 0)
        cm, _, _ = _move_phase(
            spark, c_edges, spec, directed, seed, n_shuffle, max_supersteps,
            sub_ckpt, opts, init, node_sizes=c_ns, fixed=c_fixed,
            hub_salt=hub_salt, level=level + 1, name=f"membership_l{level + 1}",
            monotone=monotone,
        )
        cm = _descend(
            spark, c_edges, spec, directed, seed, max_supersteps, sub_ckpt, opts,
            cm, c_ns, c_fixed, level + 1, local_finish_threshold, max_levels, hub_salt,
            m_edges=n_coarse_edges, monotone=monotone,
        )
        coarse_memb = cm.select(F.col("id").alias("refined"), F.col("comm").alias("new_comm"))
        c_edges.unpersist()
        sub_ckpt_open = sub_ckpt

    t_proj0 = time.time()
    out = (
        refined.join(coarse_memb, "refined")
        .select("id", F.col("new_comm").alias("comm"))
    )
    out = out.localCheckpoint(eager=True)  # lineage barrier before unpersists
    refined.unpersist()
    coarse_nodes.unpersist()
    coarse_edges.unpersist()
    if sub_ckpt_open is not None:
        # the barrier above copied everything still needed out of the
        # sub-level's ephemeral tmpdir — release it now, not at exit
        sub_ckpt_open.close()
    ckpt.log(name="leiden_project", level=level, secs=round(time.time() - t_proj0, 4))
    return out


def _local_finish(spark, coarse_edges, coarse_nodes, spec, directed, seed, opts, fixed_any):
    """Exact driver-local solve of the (small) coarse graph, seeded with
    the parent communities (T3 + T4, SURVEY.md §2.2).  Fixed coarse nodes
    keep their labels: localcore skips renumbering when a fixed mask is
    given, and the dense→label unmap below restores the original parent
    labels for preserved slots."""
    ce = coarse_edges.toPandas()
    cn = coarse_nodes.toPandas()
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
    parents = cn["parent"].to_numpy(dtype=np.int64)
    uniq, parent_dense = np.unique(parents, return_inverse=True)
    P = LocalPartition([(g, spec)], membership=parent_dense.astype(np.int64))
    o = opts or OptimiserOpts(seed=seed)
    fixed_mask = cn["has_fixed"].to_numpy(dtype=bool) if fixed_any else None
    optimise_partition(P, n_iterations=2, is_membership_fixed=fixed_mask, opts=o)
    memb = P.membership
    if fixed_any:
        # slots of fixed communities are preserved indices into ``uniq`` —
        # map them back to the original parent labels; fresh slots get
        # labels guaranteed distinct from every original label
        hi_label = int(uniq.max(initial=0)) + 1
        out_label = np.where(memb < len(uniq), uniq[np.clip(memb, 0, len(uniq) - 1)], hi_label + memb)
    else:
        out_label = memb
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame({"refined": ids, "new_comm": out_label.astype(np.int64)})
    )


# ------------------------------------------------------------------ façade
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
    node_sizes: DataFrame | None = None,
    initial_membership: DataFrame | None = None,
    fixed: DataFrame | None = None,
    local_finish_threshold: int | None = None,
    max_levels: int = 8,
    monotone: bool = True,
) -> LeidenResult:
    """Flagship API (reference ``find_partition``, functions.py:21-93) on a
    Spark edge table (src:long, dst:long, weight:double).

    - ``node_sizes``: optional (id, node_size) — CPM/RBER over
      pre-aggregated vertices (reference ``node_sizes=`` kwarg).
    - ``initial_membership``: optional (id, comm) seed partition.
    - ``fixed``: optional (id) — vertices that never move
      (``is_membership_fixed``, O11); their labels survive end-to-end.
    - ``hub_salt=k`` (k > 1) switches the move phase to the salted
      superstep (:func:`_superstep_moves_salted`): no single task ever
      holds one vertex's full gather — required when hub degrees (tool
      vertices) skew a stage.
    - ``local_finish_threshold``: coarse graphs above this edge count
      recurse into further *distributed* levels instead of a driver
      collect (default max(local_threshold, 5M)).
    - ``monotone``: per-superstep realised-quality guard with rollback
      (SURVEY §4.3); disable only for raw throughput measurement.
    """
    own_ckpt = ckpt is None
    ckpt = ckpt or CheckpointManager(spark)
    spec = QualitySpec(method, gamma=gamma, correct_self_loops=correct_self_loops)
    o = opts or OptimiserOpts(seed=seed)
    if local_finish_threshold is None:
        local_finish_threshold = max(local_threshold, LOCAL_FINISH_EDGES)
    # toPandas ceiling guard: the local/finish paths pull up to
    # max(local_threshold, local_finish_threshold) EDGES to the driver
    # (~100 B/edge after pandas conversion) — a user-supplied 500M-edge
    # "local finish" OOMs the driver long before the solve starts.  Warn
    # at 10× the default (≈5 GB driver resident) rather than hard-fail:
    # big-driver deployments are legitimate, silent ones are not.
    _ceiling = max(int(local_threshold), int(local_finish_threshold))
    if _ceiling > 10 * LOCAL_FINISH_EDGES:
        import warnings

        warnings.warn(
            f"local_threshold/local_finish_threshold={_ceiling:,} edges will "
            f"be collected to the driver for the exact finish (~"
            f"{_ceiling * 100 / 1e9:.1f} GB resident as pandas) — make sure "
            "spark.driver.memory covers it, or lower the threshold to let "
            "another distributed level run instead.",
            stacklevel=2,
        )
    edges = edges.persist()
    ecount = edges.count()

    if ecount <= local_threshold:
        membership = _local_solve_df(
            spark, edges, spec, n_iterations, seed, directed, o,
            node_sizes=node_sizes, initial=initial_membership, fixed=fixed,
        )
        q = df_quality(edges, membership, method, gamma, directed,
                       node_sizes=node_sizes, correct_self_loops=correct_self_loops)
        edges.unpersist()
        if own_ckpt:
            ckpt.close()  # local path never wrote to it
        return LeidenResult(membership, q, method, gamma, supersteps=0, levels=1, metrics=ckpt.metrics)

    # ----------------------------------------------------- distributed path
    # partition count sized to the data (~200k edges per partition) but
    # floored at the session's core count — a small graph on a big session
    # must still use every core in the superstep stages, and the configured
    # shuffle-partition ceiling still bounds huge inputs
    n_shuffle = min(
        int(spark.conf.get("spark.sql.shuffle.partitions")),
        max(8, spark.sparkContext.defaultParallelism, ecount // 200_000),
    )

    # ---- resume support (north rule): the driver loop position is
    # persisted alongside every membership checkpoint; a restarted run
    # reloads the latest membership and re-enters the loop at the exact
    # (iteration, step), reproducing the uninterrupted run bit-for-bit
    # (the parity gate is keyed on the absolute checkpoint index).  The
    # durable state tracks the level-0 move phase — the dominant cost at
    # scale; the descent below it is deterministic given the level-0
    # membership checkpoint, so a crash mid-descent replays it.
    state = ckpt.load_state() if resume else None
    if state is not None and ckpt.latest_step("membership") is not None:
        ckpt_idx = min(state["ckpt_idx"], ckpt.latest_step("membership"))
        membership = ckpt.load("membership", ckpt_idx)
        it0, step0, total_steps = state["iteration"], state["step"], state["total_steps"]
        resume_state = {**state, "ckpt_idx": ckpt_idx}
        # a state without q_prev is either an iteration-boundary resume
        # (where the uninterrupted run also starts its move phase with
        # q_prev=None) or a pre-guard-format checkpoint; in both cases the
        # guard simply re-establishes its baseline on the first superstep.
        # Rebuilding via df_quality here would be WRONG for constrained
        # runs (it omits the soft O10 penalty the in-loop guard subtracts)
        # and can differ from the guard-row value by float summation order.
    else:
        from ..functions.quality import vertex_strengths

        verts = vertex_strengths(edges, directed).select("id")
        if node_sizes is not None:
            verts = verts.unionByName(node_sizes.select("id")).distinct()
        if initial_membership is not None:
            # complete a partial seed with singletons (label = own id) so
            # vertices absent from the seed still gather and move — the
            # same semantics as the local path's uncovered-vertex fill
            verts = verts.unionByName(initial_membership.select("id")).distinct()
            membership = (
                verts.join(initial_membership.select("id", "comm"), "id", "left")
                .select("id", F.coalesce("comm", F.col("id")).alias("comm"))
            )
        else:
            membership = verts.select("id", F.col("id").alias("comm"))
        ckpt_idx = 0
        membership = ckpt.save(membership, "membership", ckpt_idx)
        it0, step0, total_steps = 0, 0, 0
        resume_state = None
        ckpt.save_state({"iteration": 0, "step": 0, "ckpt_idx": 0, "total_steps": 0})

    n_iters = max(n_iterations, 1) if n_iterations >= 0 else 1_000
    q_iter_prev = None
    levels_seen = 1
    for it in range(it0, n_iters):
        rs = resume_state if it == it0 and resume_state is not None else None
        if rs is not None:
            rs = {**rs, "iteration": it, "total_steps": total_steps}
        membership, steps, ckpt_idx = _move_phase(
            spark, edges, spec, directed, seed, n_shuffle, max_supersteps, ckpt, o,
            membership, node_sizes=node_sizes, fixed=fixed, hub_salt=hub_salt,
            level=0, monotone=monotone, resume_state=rs, ckpt_idx0=ckpt_idx,
            iteration=it, total_steps0=total_steps,
        )
        total_steps += steps
        if not finish:
            # throughput-measurement mode: stop after the move phase
            break
        n_metrics_before = len(ckpt.metrics)
        membership = _descend(
            spark, edges, spec, directed, seed, max_supersteps, ckpt, o,
            membership, node_sizes, fixed, 0, local_finish_threshold, max_levels, hub_salt,
            m_edges=ecount, monotone=monotone,
        )
        # per-iteration descent depth (counting the whole metrics stream
        # would accumulate across iterations and caller-shared managers)
        levels_seen = max(
            levels_seen,
            1 + sum(
                1 for m in ckpt.metrics[n_metrics_before:]
                if m.get("name") == "leiden_aggregate"
            ),
        )
        ckpt_idx += 1
        membership = ckpt.save(membership, "membership", ckpt_idx)
        ckpt.save_state(
            {"iteration": it + 1, "step": 0, "ckpt_idx": ckpt_idx, "total_steps": total_steps}
        )
        if n_iterations < 0:
            q_it = df_quality(edges, membership, method, gamma, directed,
                              node_sizes=node_sizes, correct_self_loops=correct_self_loops)
            if q_iter_prev is not None and q_it - q_iter_prev <= EPSQ:
                break
            q_iter_prev = q_it

    q = df_quality(edges, membership, method, gamma, directed,
                   node_sizes=node_sizes, correct_self_loops=correct_self_loops)
    edges.unpersist()
    if finish and fixed is None:
        # T5: dense size-ordered labels, matching the local path's
        # renumber (reference renumbers after every optimise; fixed runs
        # keep their labels — test_Optimiser.py:145-164 semantics).
        # finish=False is the throughput-measurement mode and returns the
        # raw move-phase labels unchanged.
        membership = renumber_membership(membership)
    if own_ckpt and ckpt.path is None:
        # a caller-invisible ephemeral manager: barrier the result off the
        # tmpdir parquet, then free the tmpdir immediately (repeated calls
        # — e.g. resolution-profile probes — must not accumulate tmpdirs
        # until process exit)
        membership = membership.localCheckpoint(eager=True)
        ckpt.close()
    return LeidenResult(
        membership, q, method, gamma, supersteps=total_steps,
        levels=levels_seen, metrics=ckpt.metrics,
    )


# ----------------------------------------------------------------- helpers
def _local_solve_df(spark, edges, spec, n_iterations, seed, directed, opts,
                    initial=None, node_sizes=None, fixed=None):
    """Pull a (small) edge table to the driver, run the exact local core,
    return a membership DataFrame (id, comm).  ``initial``/``node_sizes``/
    ``fixed`` are optional DataFrames ((id, comm) / (id, node_size) /
    (id)); fixed labels are preserved through the dense↔label unmap."""
    pdf = edges.toPandas()
    id_arrays = [pdf["src"].to_numpy(), pdf["dst"].to_numpy()]
    init_pdf = initial.select("id", "comm").toPandas() if initial is not None else None
    ns_pdf = node_sizes.select("id", "node_size").toPandas() if node_sizes is not None else None
    fixed_ids = set(
        int(x) for x in fixed.select("id").toPandas()["id"].to_numpy()
    ) if fixed is not None else None
    if init_pdf is not None:
        id_arrays.append(init_pdf["id"].to_numpy())
    if ns_pdf is not None:
        id_arrays.append(ns_pdf["id"].to_numpy())
    ids = np.unique(np.concatenate(id_arrays))
    idx = {int(v): i for i, v in enumerate(ids)}
    src = pdf["src"].map(idx).to_numpy(dtype=np.int64)
    dst = pdf["dst"].map(idx).to_numpy(dtype=np.int64)
    ns = None
    if ns_pdf is not None:
        ns = np.ones(len(ids))
        ns[ns_pdf["id"].map(idx).to_numpy(dtype=np.int64)] = ns_pdf["node_size"].to_numpy(dtype=np.float64)
    g = LocalGraph(len(ids), src, dst, pdf["weight"].to_numpy(dtype=np.float64),
                   node_size=ns, directed=directed)
    uniq = None
    init = None
    if init_pdf is not None:
        labels = np.full(len(ids), -1, dtype=np.int64)
        labels[init_pdf["id"].map(idx).to_numpy(dtype=np.int64)] = init_pdf["comm"].to_numpy(dtype=np.int64)
        missing = labels < 0
        labels[missing] = ids[missing]  # singletons for uncovered vertices
        uniq, init = np.unique(labels, return_inverse=True)
    elif fixed_ids is not None:
        # no seed, but fixed labels must survive the dense↔label unmap
        # (O11 contract): seed identity singletons so comm == vertex id,
        # exactly as the distributed path does
        uniq, init = np.unique(ids.astype(np.int64), return_inverse=True)
    P = LocalPartition([(g, spec)], membership=init)
    # honour a caller-supplied opts.seed (the distributed path's
    # _local_finish does); never mutate the caller's object
    o = opts if opts is not None else OptimiserOpts(seed=seed)
    fixed_mask = None
    if fixed_ids is not None:
        fixed_mask = np.array([int(v) in fixed_ids for v in ids], dtype=bool)
    optimise_partition(P, n_iterations=n_iterations, is_membership_fixed=fixed_mask, opts=o)
    memb = P.membership
    if fixed_mask is not None and uniq is not None:
        hi_label = int(uniq.max(initial=0)) + 1
        memb = np.where(memb < len(uniq), uniq[np.clip(memb, 0, len(uniq) - 1)], hi_label + memb)
    import pandas as pd

    out = pd.DataFrame({"id": ids.astype(np.int64), "comm": memb.astype(np.int64)})
    return spark.createDataFrame(out)
