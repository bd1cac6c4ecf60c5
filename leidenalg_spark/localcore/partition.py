"""Mutable partition state over one or more layers sharing a membership.

Semantics mirror the reference's ``MutableVertexPartition``
(src/leidenalg/VertexPartition.py:5-107): membership vector + incrementally
maintained per-community aggregates (internal weight, strengths, sizes),
with every mutation flowing through ``move`` so the administration stays
consistent.  Multi-layer support mirrors ``optimise_partition_multiplex``
(src/leidenalg/Optimiser.py:357-461): k graphs over an identical vertex
set, one shared membership, joint quality ``sum_k lambda_k Q_k``.

Community labels are *slot indices* and are never renumbered here, so
fixed-membership labels survive optimisation
(tests/test_Optimiser.py:145-164 semantics).
"""

from __future__ import annotations

import numpy as np

from .graph import LocalGraph
from .quality import QualitySpec, possible_pairs

EPSQ = 1e-10  # move acceptance threshold, cf. reference 1e-10 tolerances


class LocalPartition:
    """Partition of k layers with shared membership.

    Parameters
    ----------
    layers : list of (LocalGraph, QualitySpec)
    layer_weights : list of float (may be negative, Optimiser.py:440-441)
    membership : initial membership (defaults to singleton partition,
        VertexPartition.py:48-49)
    constraint_size : per-vertex size used for min/max community-size
        constraints (defaults to layer-0 node_size)
    """

    def __init__(self, layers, layer_weights=None, membership=None, constraint_size=None):
        self.graphs = [g for g, _ in layers]
        self.specs = [s for _, s in layers]
        self.n = self.graphs[0].n
        for g in self.graphs:
            if g.n != self.n:
                raise ValueError("layers must share the vertex set")
        if layer_weights is None:
            layer_weights = [1.0] * len(layers)
        self.layer_weights = np.asarray(layer_weights, dtype=np.float64)
        if membership is None:
            membership = np.arange(self.n, dtype=np.int64)
        self.membership = np.asarray(membership, dtype=np.int64).copy()
        if self.membership.min(initial=0) < 0:
            raise ValueError("negative community label")
        if constraint_size is None:
            constraint_size = self.graphs[0].node_size
        self.constraint_size = np.asarray(constraint_size, dtype=np.float64)
        self._init_stats()

    # ------------------------------------------------------------------
    def _init_stats(self):
        self.cap = int(max(self.membership.max(initial=0) + 1, self.n)) + 8
        k = len(self.graphs)
        self.w_in = np.zeros((k, self.cap))
        self.kout_c = np.zeros((k, self.cap))
        self.kin_c = np.zeros((k, self.cap))
        self.nsize_c = np.zeros((k, self.cap))
        self.count_c = np.zeros(self.cap, dtype=np.int64)
        self.csize_c = np.zeros(self.cap)  # constraint sizes
        m = self.membership
        np.add.at(self.count_c, m, 1)
        np.add.at(self.csize_c, m, self.constraint_size)
        for i, g in enumerate(self.graphs):
            np.add.at(self.kout_c[i], m, g.k_out)
            np.add.at(self.kin_c[i], m, g.k_in)
            np.add.at(self.nsize_c[i], m, g.node_size)
            internal = m[g.src] == m[g.dst]
            np.add.at(self.w_in[i], m[g.src[internal]], g.weight[internal])
        self.free_slots = [c for c in range(self.cap) if self.count_c[c] == 0]
        # per-layer global sums for Surprise (O(1) diffs); only Surprise
        # reads them, so moves skip the 4-possible_pairs update otherwise
        self._track_pairs = any(s.method == "surprise" for s in self.specs)
        self._refresh_global_sums()

    def _refresh_global_sums(self):
        self.sum_w_in = self.w_in.sum(axis=1)
        self.sum_pairs = np.array(
            [
                float(
                    np.sum(
                        possible_pairs(
                            self.nsize_c[i][self.count_c > 0],
                            g.directed,
                            self.specs[i].correct_self_loops,
                        )
                    )
                )
                for i, g in enumerate(self.graphs)
            ]
        )

    def _grow(self, newcap):
        extra = newcap - self.cap
        k = len(self.graphs)
        self.w_in = np.concatenate([self.w_in, np.zeros((k, extra))], axis=1)
        self.kout_c = np.concatenate([self.kout_c, np.zeros((k, extra))], axis=1)
        self.kin_c = np.concatenate([self.kin_c, np.zeros((k, extra))], axis=1)
        self.nsize_c = np.concatenate([self.nsize_c, np.zeros((k, extra))], axis=1)
        self.count_c = np.concatenate([self.count_c, np.zeros(extra, dtype=np.int64)])
        self.csize_c = np.concatenate([self.csize_c, np.zeros(extra)])
        self.free_slots.extend(range(self.cap, newcap))
        self.cap = newcap

    def empty_slot(self):
        """A community slot with no members (consider_empty_community, O9)."""
        while self.free_slots:
            c = self.free_slots[-1]
            if self.count_c[c] == 0:
                return c
            self.free_slots.pop()
        self._grow(self.cap + max(8, self.cap // 4))
        return self.free_slots[-1]

    # ------------------------------------------------------------------
    def gather(self, v, constrained=None):
        """weight between v and each neighbouring community, per layer.

        Returns (comms, w_out per layer, w_in per layer): the hot gather of
        the local move (reference ``weight_to_comm``,
        VertexPartition.py:367-385).  ``constrained`` restricts neighbours
        to vertices in the same constrained community (O6/O7).
        """
        comm_list = []
        per_layer = []
        for i, g in enumerate(self.graphs):
            nbr, wo, wi = g.neighbours(v)
            if constrained is not None:
                keep = constrained[nbr] == constrained[v]
                nbr, wo, wi = nbr[keep], wo[keep], wi[keep]
            c = self.membership[nbr]
            per_layer.append((c, wo, wi))
            comm_list.append(c)
        if len(comm_list) == 1:
            comms = np.unique(comm_list[0])
        elif comm_list:
            comms = np.unique(np.concatenate(comm_list))
        else:
            comms = np.empty(0, np.int64)
        # per-community sums via searchsorted + bincount: on the tiny
        # per-node neighbour arrays this is several times cheaper than a
        # scatter-add into (and reset of) a |comms|-sized scratch buffer
        ncs = len(comms)
        wouts = []
        wins = []
        for c, wo, wi in per_layer:
            if len(c):
                idx = np.searchsorted(comms, c)
                wouts.append(np.bincount(idx, weights=wo, minlength=ncs))
                wins.append(np.bincount(idx, weights=wi, minlength=ncs))
            else:
                wouts.append(np.zeros(ncs))
                wins.append(np.zeros(ncs))
        return comms, wouts, wins

    # ------------------------------------------------------------------
    def diff_move_many(self, v, cands, wout_v, win_v):
        """Vectorised ``diff_move`` (VertexPartition.py:110-147):
        quality change of moving v to each candidate community, summed over
        layers with layer weights.  ``wout_v[i]``/``win_v[i]`` give v's
        edge weight towards each candidate community in layer i.
        """
        a = self.membership[v]
        total = np.zeros(len(cands))
        for i, (g, spec) in enumerate(zip(self.graphs, self.specs)):
            lw = self.layer_weights[i]
            if lw == 0.0:
                continue
            loop = g.self_loop[v]
            kvo, kvi = g.k_out[v], g.k_in[v]
            sv = g.node_size[v]
            wo, wi = wout_v[i], win_v[i]
            # mask: moving to own community is a no-op
            if g.directed:
                rm = wo + wi
            else:
                rm = wo  # undirected: wo == wi == once-counted weight
            # find v's weight to its own community a among candidates
            at_a = cands == a
            w_va = float(rm[at_a][0]) if at_a.any() else self._weight_to(v, a, i)
            w_a_new = self.w_in[i, a] - w_va - loop
            w_b_new = self.w_in[i][cands] + rm + loop
            if spec.method == "surprise":
                dq = self._surprise_diff(i, g, spec, v, a, cands, w_va, rm, loop, sv)
            else:
                ga_old = spec.comm_contrib(
                    g, self.w_in[i, a], self.kout_c[i, a], self.kin_c[i, a], self.nsize_c[i, a]
                )
                ga_new = spec.comm_contrib(
                    g, w_a_new, self.kout_c[i, a] - kvo, self.kin_c[i, a] - kvi, self.nsize_c[i, a] - sv
                )
                gb_old = spec.comm_contrib(
                    g, self.w_in[i][cands], self.kout_c[i][cands], self.kin_c[i][cands], self.nsize_c[i][cands]
                )
                gb_new = spec.comm_contrib(
                    g, w_b_new, self.kout_c[i][cands] + kvo, self.kin_c[i][cands] + kvi, self.nsize_c[i][cands] + sv
                )
                dq = (ga_new - ga_old) + (gb_new - gb_old)
            total += lw * np.where(cands == a, 0.0, dq)
        return total

    def _weight_to(self, v, c, layer):
        g = self.graphs[layer]
        nbr, wo, wi = g.neighbours(v)
        sel = self.membership[nbr] == c
        if g.directed:
            return float(wo[sel].sum() + wi[sel].sum())
        return float(wo[sel].sum())

    def _surprise_diff(self, i, g, spec, v, a, cands, w_va, rm, loop, sv):
        from .quality import kl_div

        W = g.total_weight
        if W <= 0:
            return np.zeros(len(cands))
        pairs_tot = possible_pairs(g.total_size, g.directed, spec.correct_self_loops)
        pp = lambda x: possible_pairs(x, g.directed, spec.correct_self_loops)
        sw, sp = self.sum_w_in[i], self.sum_pairs[i]
        na, nb = self.nsize_c[i, a], self.nsize_c[i][cands]
        d_sw = (-w_va - loop) + (rm + loop)
        d_sp = (pp(na - sv) - pp(na)) + (pp(nb + sv) - pp(nb))
        q_old = np.clip(sw / W, 0.0, 1.0)
        q_new = np.clip((sw + d_sw) / W, 0.0, 1.0)
        e_old = sp / pairs_tot
        e_new = (sp + d_sp) / pairs_tot
        return W * (kl_div(q_new, e_new) - kl_div(q_old, e_old))

    # ------------------------------------------------------------------
    def move(self, v, b):
        """Apply one move (reference ``move_node``,
        VertexPartition.py:184-204), updating all administration."""
        a = int(self.membership[v])
        b = int(b)
        if a == b:
            return
        # gather reuse: the optimiser's scalar fast path stashes v's
        # per-community weights (unconstrained gathers only) so the
        # administration update skips a second adjacency scan
        hint = getattr(self, "_gather_hint", None)
        if hint is not None and hint[0] == v and len(self.graphs) == 1:
            self._gather_hint = None  # one-shot: stale hints must never apply
            acc_o, acc_i = hint[1], hint[2]
            g = self.graphs[0]
            w_va_o = acc_o.get(a, 0.0)
            w_vb_o = acc_o.get(b, 0.0)
            if g.directed:
                w_va_i, w_vb_i = acc_i.get(a, 0.0), acc_i.get(b, 0.0)
                rm_a, add_b = w_va_o + w_va_i, w_vb_o + w_vb_i
            else:
                rm_a, add_b = w_va_o, w_vb_o
            self._apply_layer_move(0, g, v, a, b, rm_a, add_b)
            self._finish_move(v, a, b)
            return
        for i, g in enumerate(self.graphs):
            nbr, wo, wi = g.neighbours(v)
            c = self.membership[nbr]
            sa, sb = c == a, c == b
            w_va_o, w_va_i = float(wo[sa].sum()), float(wi[sa].sum())
            w_vb_o, w_vb_i = float(wo[sb].sum()), float(wi[sb].sum())
            loop = g.self_loop[v]
            if g.directed:
                rm_a, add_b = w_va_o + w_va_i, w_vb_o + w_vb_i
            else:
                rm_a, add_b = w_va_o, w_vb_o
            self._apply_layer_move(i, g, v, a, b, rm_a, add_b)
        self._finish_move(v, a, b)

    def _apply_layer_move(self, i, g, v, a, b, rm_a, add_b):
        loop = g.self_loop[v]
        if self._track_pairs:
            pp = lambda x: possible_pairs(x, g.directed, self.specs[i].correct_self_loops)
            self.sum_pairs[i] += (
                pp(self.nsize_c[i, a] - g.node_size[v])
                - pp(self.nsize_c[i, a])
                + pp(self.nsize_c[i, b] + g.node_size[v])
                - pp(self.nsize_c[i, b])
            )
        self.w_in[i, a] -= rm_a + loop
        self.w_in[i, b] += add_b + loop
        self.sum_w_in[i] += add_b - rm_a
        self.kout_c[i, a] -= g.k_out[v]
        self.kout_c[i, b] += g.k_out[v]
        self.kin_c[i, a] -= g.k_in[v]
        self.kin_c[i, b] += g.k_in[v]
        self.nsize_c[i, a] -= g.node_size[v]
        self.nsize_c[i, b] += g.node_size[v]

    def _finish_move(self, v, a, b):
        self.count_c[a] -= 1
        self.count_c[b] += 1
        self.csize_c[a] -= self.constraint_size[v]
        self.csize_c[b] += self.constraint_size[v]
        if self.count_c[a] == 0:
            self.free_slots.append(a)
        self.membership[v] = b

    # ------------------------------------------------------------------
    def set_membership(self, membership):
        """Overwrite membership and refresh the administration (reference
        ``set_membership``, VertexPartition.py:104-107)."""
        self._gather_hint = None
        self.membership = np.asarray(membership, dtype=np.int64).copy()
        self._init_stats()

    def set_membership_from_level(self, level_of, level_membership):
        """Project a coarse-level membership down to the original vertices
        (reference ``from_coarse_partition``, VertexPartition.py:206-257)."""
        self.set_membership(np.asarray(level_membership, dtype=np.int64)[level_of])

    # ------------------------------------------------------------------
    def quality(self):
        """Joint quality sum_k lambda_k Q_k (Optimiser.py:389-399)."""
        live = self.count_c > 0
        total = 0.0
        for i, (g, spec) in enumerate(zip(self.graphs, self.specs)):
            total += self.layer_weights[i] * spec.quality(
                g, self.w_in[i][live], self.kout_c[i][live], self.kin_c[i][live], self.nsize_c[i][live]
            )
        return float(total)

    def community_sizes(self):
        """Vertex counts of non-empty communities, sorted desc (cf. igraph
        ``partition.sizes()`` after renumbering)."""
        live = self.count_c > 0
        return sorted((int(x) for x in self.count_c[live]), reverse=True)

    def nonempty_comms(self):
        return np.flatnonzero(self.count_c > 0)
