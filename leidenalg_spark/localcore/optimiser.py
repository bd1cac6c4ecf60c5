"""Leiden optimiser kernels over :class:`LocalPartition`.

Re-implements, from the published algorithm and the reference's Python-layer
semantics (NOT its C++ code), the routines of ``leidenalg.Optimiser``
(src/leidenalg/Optimiser.py):

- move_nodes / merge_nodes (+_constrained)   Optimiser.py:463-659
- optimise_partition (multi-level loop)      Optimiser.py:294-355 and the
  documented manual loop doc/source/advanced.rst:100-123
- candidate-selection modes                  Optimiser.py:77-112
- consider_empty_community                   Optimiser.py:211-220
- min/max community size + enforcement       Optimiser.py:223-280; penalty
  semantics reconstructed from the golden outcomes in
  tests/test_Optimiser.py:20-38, 64-82, 110-137 (the C++ kernel is outside
  the reference repo)

Determinism: visit order comes from ``numpy.random.default_rng(seed)``;
ties in the arg-max break towards the lowest community id, which
reproduces every golden structural outcome of the reference test-suite.
"""

from __future__ import annotations

from collections import deque

import numpy as np

from .graph import LocalGraph
from .partition import EPSQ, LocalPartition
from .quality import QualitySpec

# candidate-selection modes (include/pynterface.h:124-127)
ALL_NEIGH_COMMS = "all_neigh_comms"
ALL_COMMS = "all_comms"
RAND_COMM = "rand_comm"
RAND_NEIGH_COMM = "rand_neigh_comm"

MOVE_NODES = "move_nodes"
MERGE_NODES = "merge_nodes"


class OptimiserOpts:
    """Configuration knobs of the reference Optimiser (Optimiser.py:6-292)."""

    def __init__(
        self,
        consider_comms=ALL_NEIGH_COMMS,
        refine_consider_comms=ALL_NEIGH_COMMS,
        optimise_routine=MOVE_NODES,
        refine_routine=MERGE_NODES,
        refine_partition=True,
        consider_empty_community=True,
        min_comm_size=0,
        max_comm_size=0,
        community_constraint_enforcement=0.0,
        seed=0,
    ):
        if min_comm_size < 0 or max_comm_size < 0 or community_constraint_enforcement < 0:
            raise ValueError("negative community constraint")
        if min_comm_size and max_comm_size and min_comm_size > max_comm_size:
            raise ValueError("min_comm_size > max_comm_size")
        self.consider_comms = consider_comms
        self.refine_consider_comms = refine_consider_comms
        self.optimise_routine = optimise_routine
        self.refine_routine = refine_routine
        self.refine_partition = refine_partition
        self.consider_empty_community = consider_empty_community
        self.min_comm_size = min_comm_size
        self.max_comm_size = max_comm_size
        self.community_constraint_enforcement = community_constraint_enforcement
        self.seed = seed


def _constraint_adjust(opts, P, v, cands, dq):
    """Apply the community-size constraints to candidate gains.

    Soft penalty ``enforcement * d(violation)`` with
    ``violation(c) = max(0, min-|c|) [|c|>0] + max(0, |c|-max)``; hard gate
    on ``max_comm_size`` when enforcement is 0 (historic reference
    behaviour of the ``find_partition(max_comm_size=...)`` kwarg).
    """
    mn, mx, enf = opts.min_comm_size, opts.max_comm_size, opts.community_constraint_enforcement
    if not mn and not mx:
        return dq
    sv = P.constraint_size[v]
    a = P.membership[v]

    def viol(sz):
        sz = np.asarray(sz, dtype=np.float64)
        out = np.zeros_like(sz)
        if mn:
            out = out + np.where((sz > 0) & (sz < mn), mn - sz, 0.0)
        if mx:
            out = out + np.maximum(sz - mx, 0.0)
        return out

    if enf > 0:
        before = viol(P.csize_c[a]) + viol(P.csize_c[cands])
        after = viol(P.csize_c[a] - sv) + viol(P.csize_c[cands] + sv)
        dq = dq - enf * np.where(cands == a, 0.0, after - before)
    elif mx:
        dq = np.where((cands != a) & (P.csize_c[cands] + sv > mx), -np.inf, dq)
    return dq


def _candidates(P, v, comms_neigh, mode, rng, allow_empty):
    """Candidate communities per consider_comms mode (Optimiser.py:77-112)."""
    a = P.membership[v]
    if mode == ALL_NEIGH_COMMS:
        cands = comms_neigh
    elif mode == ALL_COMMS:
        cands = P.nonempty_comms()
    elif mode == RAND_NEIGH_COMM:
        # probability proportional to #neighbours in that community:
        # pick a uniform random neighbour, take its community
        nbr, _, _ = P.graphs[0].neighbours(v)
        if len(nbr) == 0:
            cands = np.empty(0, dtype=np.int64)
        else:
            cands = np.array([P.membership[nbr[rng.integers(len(nbr))]]], dtype=np.int64)
    elif mode == RAND_COMM:
        live = P.nonempty_comms()
        w = P.count_c[live].astype(np.float64)
        cands = np.array([rng.choice(live, p=w / w.sum())], dtype=np.int64)
    else:
        raise ValueError(f"unknown consider_comms mode {mode!r}")
    if allow_empty and P.count_c[a] > 1:
        return np.unique(np.concatenate([cands, [P.empty_slot()]]))
    if mode == ALL_NEIGH_COMMS:
        return cands  # gather output: already sorted unique
    return np.unique(cands)


# methods whose ΔQ is pure +-*/ arithmetic: the scalar fast path below is
# bit-identical to the vectorised one for these (no libm calls, whose NumPy
# SIMD kernels may differ from math.* in the last ulp)
_FAST_METHODS = frozenset({"modularity", "rbconfiguration", "rber", "cpm"})


def _pp_s(n, directed, csl):
    """Scalar twin of quality.possible_pairs (same op order)."""
    p = n * n / 2.0 if csl else n * (n - 1.0) / 2.0
    return p * 2.0 if directed else p


def _best_move_fast(P, v, opts, constrained, allow_empty):
    """Scalar fast path of :func:`_best_move` for the dominant case:
    single layer, ALL_NEIGH_COMMS, linear-family method, no size
    constraints.  Bit-identical to the vectorised path — the gather
    accumulates per community in neighbour order (np.bincount's
    accumulation order), every ΔQ expression mirrors
    ``QualitySpec.comm_contrib`` term for term (IEEE doubles, same op
    order), and the arg-max keeps the first (lowest-id) strict maximum,
    the lexsort tie-break.  At degree ~10 each vertex visit costs ~30
    small-array NumPy calls in the vectorised path, all dominated by
    dispatch overhead; plain dict/float arithmetic is ~5x faster end to
    end, which matters because this loop IS the single-node engine (every
    coarse finish of the distributed Leiden, every sub-threshold graph).
    """
    g = P.graphs[0]
    spec = P.specs[0]
    lw = float(P.layer_weights[0])
    mvec = P.membership
    a = int(mvec[v])
    lo, hi = int(g.adj_ptr[v]), int(g.adj_ptr[v + 1])
    nbr = g.adj_nbr[lo:hi]
    directed = g.directed
    cl = mvec[nbr].tolist()
    wo_l = g.adj_wout[lo:hi].tolist()
    acc_o = {}
    acc_i = {} if directed else None
    if constrained is None:
        for j, c in enumerate(cl):
            acc_o[c] = acc_o.get(c, 0.0) + wo_l[j]
        if directed:
            wi_l = g.adj_win[lo:hi].tolist()
            for j, c in enumerate(cl):
                acc_i[c] = acc_i.get(c, 0.0) + wi_l[j]
    else:
        keep = (constrained[nbr] == constrained[v]).tolist()
        for j, c in enumerate(cl):
            if keep[j]:
                acc_o[c] = acc_o.get(c, 0.0) + wo_l[j]
        if directed:
            wi_l = g.adj_win[lo:hi].tolist()
            for j, c in enumerate(cl):
                if keep[j]:
                    acc_i[c] = acc_i.get(c, 0.0) + wi_l[j]
    cands = sorted(acc_o)
    if allow_empty and P.count_c[a] > 1:
        import bisect

        bisect.insort(cands, P.empty_slot())
    if not cands:
        return None, 0.0

    # v's weight to its own community — same sources as the vectorised
    # path: the gathered row when present, the full-neighbour scan when a
    # constrained gather excluded it, literal 0.0 when v simply has no
    # neighbours in a (what _weight_to would return, at no cost)
    if a in acc_o:
        w_va = acc_o[a] + acc_i[a] if directed else acc_o[a]
    elif constrained is not None:
        w_va = float(P._weight_to(v, a, 0))
    else:
        w_va = 0.0

    w_in, ko_c, ki_c, ns_c = P.w_in[0], P.kout_c[0], P.kin_c[0], P.nsize_c[0]
    loop = float(g.self_loop[v])
    kvo, kvi = float(g.k_out[v]), float(g.k_in[v])
    sv = float(g.node_size[v])
    W = g.total_weight
    method, gamma, csl = spec.method, spec.gamma, spec.correct_self_loops

    # the gathered per-community weights double as the move administration's
    # inputs (partition.move reuses them through this hint instead of
    # re-scanning v's adjacency) — only valid unfiltered, i.e. unconstrained
    P._gather_hint = (v, acc_o, acc_i) if constrained is None else None

    # per-method inlined candidate loops — scalar twins of
    # QualitySpec.comm_contrib with identical op order (bit-identical to
    # the vectorised path); inlining skips a closure call and the unused
    # stat fetches per candidate, the hot ~30% of this function
    best_c, best_dq = None, 0.0
    if method == "modularity" or method == "rbconfiguration":
        if W <= 0:
            return None, 0.0
        wa, koa = float(w_in[a]), float(ko_c[a])
        if method == "modularity":
            if directed:
                kia = float(ki_c[a])
                a_term = ((wa - w_va - loop) / W - ((koa - kvo) * (kia - kvi)) / (W * W)) \
                    - (wa / W - (koa * kia) / (W * W))
            else:
                a_term = ((wa - w_va - loop) / W - ((koa - kvo) * (koa - kvo)) / (4.0 * W * W)) \
                    - (wa / W - (koa * koa) / (4.0 * W * W))
        else:
            if directed:
                kia = float(ki_c[a])
                a_term = ((wa - w_va - loop) - gamma * ((koa - kvo) * (kia - kvi)) / W) \
                    - (wa - gamma * (koa * kia) / W)
            else:
                a_term = ((wa - w_va - loop) - gamma * ((koa - kvo) * (koa - kvo)) / (4.0 * W)) \
                    - (wa - gamma * (koa * koa) / (4.0 * W))
        W2 = W * W
        for c in cands:
            if c == a:
                continue
            rm = acc_o.get(c, 0.0) + acc_i.get(c, 0.0) if directed else acc_o.get(c, 0.0)
            wb, kob = float(w_in[c]), float(ko_c[c])
            if method == "modularity":
                if directed:
                    kib = float(ki_c[c])
                    gb = ((wb + rm + loop) / W - ((kob + kvo) * (kib + kvi)) / W2) \
                        - (wb / W - (kob * kib) / W2)
                else:
                    gb = ((wb + rm + loop) / W - ((kob + kvo) * (kob + kvo)) / (4.0 * W2)) \
                        - (wb / W - (kob * kob) / (4.0 * W2))
            else:
                if directed:
                    kib = float(ki_c[c])
                    gb = ((wb + rm + loop) - gamma * ((kob + kvo) * (kib + kvi)) / W) \
                        - (wb - gamma * (kob * kib) / W)
                else:
                    gb = ((wb + rm + loop) - gamma * ((kob + kvo) * (kob + kvo)) / (4.0 * W)) \
                        - (wb - gamma * (kob * kob) / (4.0 * W))
            dq = lw * (a_term + gb)
            if best_c is None or dq > best_dq:
                best_c, best_dq = c, dq
    else:  # rber / cpm: only (w, n) enter the contribution
        if method == "rber":
            pt = _pp_s(g.total_size, directed, csl)
            coef = gamma * (W / pt if pt > 0 else 0.0)
        else:
            coef = gamma
        nsa = float(ns_c[a])
        wa = float(w_in[a])
        a_term = ((wa - w_va - loop) - coef * _pp_s(nsa - sv, directed, csl)) \
            - (wa - coef * _pp_s(nsa, directed, csl))
        for c in cands:
            if c == a:
                continue
            rm = acc_o.get(c, 0.0) + acc_i.get(c, 0.0) if directed else acc_o.get(c, 0.0)
            wb, nsb = float(w_in[c]), float(ns_c[c])
            gb = ((wb + rm + loop) - coef * _pp_s(nsb + sv, directed, csl)) \
                - (wb - coef * _pp_s(nsb, directed, csl))
            dq = lw * (a_term + gb)
            if best_c is None or dq > best_dq:
                best_c, best_dq = c, dq
    if best_c is not None and best_dq > EPSQ:
        return int(best_c), float(best_dq)
    return None, 0.0


def _best_move(P, v, mode, rng, opts, constrained, allow_empty):
    """Evaluate candidates for v; return (best_comm, gain) or (None, 0)."""
    if (
        mode == ALL_NEIGH_COMMS
        and len(P.graphs) == 1
        and P.specs[0].method in _FAST_METHODS
        and not opts.min_comm_size
        and not opts.max_comm_size
    ):
        return _best_move_fast(P, v, opts, constrained, allow_empty)
    comms, wouts, wins = P.gather(v, constrained)
    cands = _candidates(P, v, comms, mode, rng, allow_empty)
    if constrained is not None and mode != ALL_NEIGH_COMMS:
        # refinement must stay within the constraining community (O6/O7)
        keep = np.isin(cands, comms) | (P.count_c[cands] == 0)
        cands = cands[keep]
    if len(cands) == 0:
        return None, 0.0
    # map gathered weights onto the candidate list
    if len(comms):
        pos = np.clip(np.searchsorted(comms, cands), 0, len(comms) - 1)
        hit = comms[pos] == cands
        wo_c = [np.where(hit, w[pos], 0.0) for w in wouts]
        wi_c = [np.where(hit, w[pos], 0.0) for w in wins]
    else:
        wo_c = [np.zeros(len(cands)) for _ in wouts]
        wi_c = [np.zeros(len(cands)) for _ in wins]
    dq = P.diff_move_many(v, cands, wo_c, wi_c)
    dq = _constraint_adjust(opts, P, v, cands, dq)
    best = int(np.lexsort((cands, -dq))[0])  # max gain, ties -> lowest comm id
    if dq[best] > EPSQ and cands[best] != P.membership[v]:
        return int(cands[best]), float(dq[best])
    return None, 0.0


def move_nodes(P, is_membership_fixed=None, consider_comms=ALL_NEIGH_COMMS, opts=None, rng=None, constrained=None):
    """Queue-based fast local move (Optimiser.py:463-511; the fast-local-move
    queue is the technique referenced at Optimiser.py:17-19). Terminates when
    no node has an improving move — the node-optimality property asserted at
    tests/test_Optimiser.py:84-94."""
    opts = opts or OptimiserOpts()
    rng = rng or np.random.default_rng(opts.seed)
    fixed = np.zeros(P.n, dtype=bool) if is_membership_fixed is None else np.asarray(is_membership_fixed, dtype=bool)
    order = rng.permutation(P.n)
    queue = deque(int(v) for v in order if not fixed[v])
    in_queue = np.zeros(P.n, dtype=bool)
    in_queue[~fixed] = True
    total = 0.0
    while queue:
        v = queue.popleft()
        in_queue[v] = False
        b, gain = _best_move(P, v, consider_comms, rng, opts, constrained, opts.consider_empty_community)
        if b is None:
            continue
        P.move(v, b)
        total += gain
        # fast local move: re-examine neighbours now outside v's community
        for g in P.graphs:
            nbr, _, _ = g.neighbours(v)
            for u in nbr[(P.membership[nbr] != b) & ~in_queue[nbr] & ~fixed[nbr]]:
                queue.append(int(u))
                in_queue[u] = True
    P._gather_hint = None  # nothing may linger past the optimisation pass
    return total


def merge_nodes(P, is_membership_fixed=None, consider_comms=ALL_NEIGH_COMMS, opts=None, rng=None, constrained=None):
    """Single pass; a node only ever *merges into* another community —
    it moves only while it is alone in its own (Optimiser.py:562-610)."""
    opts = opts or OptimiserOpts()
    rng = rng or np.random.default_rng(opts.seed)
    fixed = np.zeros(P.n, dtype=bool) if is_membership_fixed is None else np.asarray(is_membership_fixed, dtype=bool)
    total = 0.0
    for v in rng.permutation(P.n):
        v = int(v)
        if fixed[v] or P.count_c[P.membership[v]] != 1:
            continue
        b, gain = _best_move(P, v, consider_comms, rng, opts, constrained, allow_empty=False)
        if b is not None:
            P.move(v, b)
            total += gain
    P._gather_hint = None  # nothing may linger past the optimisation pass
    return total


def move_nodes_constrained(P, constrained_membership, consider_comms=ALL_NEIGH_COMMS, opts=None, rng=None):
    """Refinement move restricted to the constraining partition (O6)."""
    return move_nodes(P, None, consider_comms, opts, rng, constrained=np.asarray(constrained_membership))


def merge_nodes_constrained(P, constrained_membership, consider_comms=ALL_NEIGH_COMMS, opts=None, rng=None):
    """Leiden's default refinement routine (O7, Optimiser.py:612-659)."""
    return merge_nodes(P, None, consider_comms, opts, rng, constrained=np.asarray(constrained_membership))


# ---------------------------------------------------------------------------
def aggregate(P, by_membership):
    """Collapse each community of ``by_membership`` into one vertex
    (reference ``aggregate_partition``/``collapse_graph``,
    VertexPartition.py:149-182).  Quality is invariant under this collapse.

    Returns (coarse layer graphs, relabel array orig->coarse id,
    coarse constraint sizes)."""
    by = np.asarray(by_membership, dtype=np.int64)
    uniq, relabel = np.unique(by, return_inverse=True)
    nc = len(uniq)
    coarse_graphs = []
    for g in P.graphs:
        cs, cd = relabel[g.src], relabel[g.dst]
        if not g.directed:
            lo, hi = np.minimum(cs, cd), np.maximum(cs, cd)
            cs, cd = lo, hi
        key = cs * nc + cd
        order = np.argsort(key, kind="stable")
        key, w = key[order], g.weight[order]
        if len(key):
            new = np.empty(len(key), dtype=bool)
            new[0] = True
            new[1:] = key[1:] != key[:-1]
            idx = np.cumsum(new) - 1
            kk = key[new]
            ww = np.zeros(new.sum())
            np.add.at(ww, idx, w)
        else:
            kk = key
            ww = w
        nsz = np.zeros(nc)
        np.add.at(nsz, relabel, g.node_size)
        coarse_graphs.append(
            LocalGraph(nc, kk // nc, kk % nc, ww, node_size=nsz, directed=g.directed)
        )
    csize = np.zeros(nc)
    np.add.at(csize, relabel, P.constraint_size)
    return coarse_graphs, relabel, csize


def optimise_partition(
    P,
    n_iterations=2,
    is_membership_fixed=None,
    opts=None,
):
    """The full Leiden loop (Optimiser.py:294-355 + advanced.rst:100-123):

    per iteration, repeatedly: (1) local move on the current level,
    (2) refine with constrained merges, (3) aggregate by the refinement,
    seeding the aggregate with the parent communities, until the aggregate
    stops shrinking.  ``n_iterations < 0`` runs until an iteration yields
    no improvement (Optimiser.py:341-352).  Returns total improvement.
    """
    opts = opts or OptimiserOpts()
    rng = np.random.default_rng(opts.seed)
    fixed0 = (
        np.zeros(P.n, dtype=bool)
        if is_membership_fixed is None
        else np.asarray(is_membership_fixed, dtype=bool)
    )

    total = 0.0
    itr = 0
    while True:
        diff_inc = _one_iteration(P, fixed0, opts, rng)
        total += diff_inc
        itr += 1
        if n_iterations < 0:
            if diff_inc <= EPSQ:
                break
        elif itr >= n_iterations:
            break
    if is_membership_fixed is None:
        renumber_communities(P)
    return total


def _one_iteration(P, fixed0, opts, rng):
    """One Leiden iteration over all aggregation levels, mutating P."""
    n0 = P.n
    # mapping from original vertex -> current-level vertex
    level_of = np.arange(n0, dtype=np.int64)
    cur = P  # current-level partition (level 0 IS P)
    fixed = fixed0
    improv = 0.0
    move = move_nodes if opts.optimise_routine == MOVE_NODES else merge_nodes
    while True:
        improv += move(cur, fixed, opts.consider_comms, opts, rng)
        if cur is not P:
            P.set_membership_from_level(level_of, cur.membership)
        if opts.refine_partition:
            refine = merge_nodes_constrained if opts.refine_routine == MERGE_NODES else move_nodes_constrained
            refined = LocalPartition(
                list(zip(cur.graphs, cur.specs)),
                layer_weights=cur.layer_weights,
                constraint_size=cur.constraint_size,
            )
            refine(refined, cur.membership, opts.refine_consider_comms, opts, rng)
            by = refined.membership
        else:
            by = cur.membership
        coarse_graphs, relabel, csize = aggregate(cur, by)
        if coarse_graphs[0].n == cur.n:
            break  # refinement collapsed nothing: this level is stable
        # coarse initial membership: the parent community of each refined
        # community (advanced.rst:100-123 step 5) — well-defined because
        # refinement is constrained within parent communities
        coarse_init = np.zeros(coarse_graphs[0].n, dtype=np.int64)
        coarse_init[relabel] = cur.membership
        coarse_fixed = np.zeros(coarse_graphs[0].n, dtype=bool)
        np.logical_or.at(coarse_fixed, relabel, fixed)
        cur = LocalPartition(
            list(zip(coarse_graphs, cur.specs)),
            layer_weights=cur.layer_weights,
            membership=coarse_init,
            constraint_size=csize,
        )
        fixed = coarse_fixed
        level_of = relabel[level_of]
    return improv


def renumber_communities(P):
    """Relabel communities by decreasing size, ties by smallest member id
    (reference renumber_communities, VertexPartition.py:259-267; the
    reference sort is documented unstable — we fix ties for
    reproducibility, SURVEY.md §7.3)."""
    m = P.membership
    live = P.nonempty_comms()
    counts = P.count_c[live]
    first_member = np.full(P.cap, np.iinfo(np.int64).max)
    np.minimum.at(first_member, m, np.arange(P.n))
    order = np.lexsort((first_member[live], -counts))
    remap = np.zeros(P.cap, dtype=np.int64)
    remap[live[order]] = np.arange(len(live))
    P.membership = remap[m]
    P._init_stats()
    return P
