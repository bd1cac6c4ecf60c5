"""In-memory (NumPy) graph used for coarse levels of the distributed Leiden
loop and as the independent oracle in tests.

Mirrors the *semantics* of the reference's graph model (leidenalg:
``src/leidenalg/python_partition_interface.cpp:13-118`` — edge list +
per-edge ``weight`` + per-vertex ``node_size`` + a graph-level ``directed``
flag), not its implementation.  Vertex ids are dense ``0..n-1`` integers.

Conventions (documented here once, used everywhere):

- ``weight[e]`` is the weight of edge ``e`` counted ONCE (also for
  undirected edges and self-loops).
- undirected strength ``k_i`` counts self-loops twice (igraph convention);
  directed ``k_out/k_in`` each count a self-loop once.
- ``total_weight`` is the sum of edge weights, each edge once.
"""

from __future__ import annotations

import numpy as np


class LocalGraph:
    """Dense-id edge-list graph with CSR adjacency for fast gathers."""

    def __init__(self, n, src, dst, weight=None, node_size=None, directed=False):
        self.n = int(n)
        self.src = np.asarray(src, dtype=np.int64)
        self.dst = np.asarray(dst, dtype=np.int64)
        m = len(self.src)
        if weight is None:
            weight = np.ones(m, dtype=np.float64)
        self.weight = np.asarray(weight, dtype=np.float64)
        if node_size is None:
            node_size = np.ones(self.n, dtype=np.float64)
        self.node_size = np.asarray(node_size, dtype=np.float64)
        self.directed = bool(directed)

        if len(self.dst) != m or len(self.weight) != m:
            raise ValueError("src/dst/weight length mismatch")
        if len(self.node_size) != self.n:
            raise ValueError("node_size length != n")
        if m and (
            self.src.max() >= n or self.dst.max() >= n
            or self.src.min() < 0 or self.dst.min() < 0
        ):
            # negative ids would silently wrap via fancy indexing
            raise ValueError("vertex id out of range")
        if m and (np.isnan(self.weight).any() or np.isinf(self.weight).any()):
            # same validation as the reference
            # (python_partition_interface.cpp:83-92)
            raise ValueError("NaN/inf edge weight")

        loop_mask = self.src == self.dst
        self.self_loop = np.zeros(self.n, dtype=np.float64)
        np.add.at(self.self_loop, self.src[loop_mask], self.weight[loop_mask])
        self.has_loops = bool(loop_mask.any())

        self.total_weight = float(self.weight.sum())
        self.total_size = float(self.node_size.sum())

        # strengths
        if self.directed:
            self.k_out = np.zeros(self.n, dtype=np.float64)
            self.k_in = np.zeros(self.n, dtype=np.float64)
            np.add.at(self.k_out, self.src, self.weight)
            np.add.at(self.k_in, self.dst, self.weight)
            self.k = self.k_out + self.k_in
        else:
            self.k = np.zeros(self.n, dtype=np.float64)
            np.add.at(self.k, self.src, self.weight)
            np.add.at(self.k, self.dst, self.weight)  # loops counted twice
            self.k_out = self.k
            self.k_in = self.k

        self._build_csr(loop_mask)

    # ------------------------------------------------------------------
    def _build_csr(self, loop_mask):
        """CSR over non-loop adjacency.

        For every ordered pair (v,u), v != u, that shares at least one
        edge we store the neighbour u plus two weights:
        ``w_out`` (edges v->u) and ``w_in`` (edges u->v).  For undirected
        graphs w_out == w_in == total weight between v and u.
        """
        nl = ~loop_mask
        s, d, w = self.src[nl], self.dst[nl], self.weight[nl]
        # both orientations: (v=s,u=d,out=w) and (v=d,u=s,in=w)
        v = np.concatenate([s, d])
        u = np.concatenate([d, s])
        wo = np.concatenate([w, np.zeros_like(w)])
        wi = np.concatenate([np.zeros_like(w), w])
        if not self.directed:
            wo = np.concatenate([w, w])
            wi = wo
        # merge duplicates (multi-edges / both orientations present)
        order = np.lexsort((u, v))
        v, u, wo, wi = v[order], u[order], wo[order], wi[order]
        if len(v):
            new = np.empty(len(v), dtype=bool)
            new[0] = True
            new[1:] = (v[1:] != v[:-1]) | (u[1:] != u[:-1])
            idx = np.cumsum(new) - 1
            nv = v[new]
            nu = u[new]
            nwo = np.zeros(new.sum())
            nwi = np.zeros(new.sum())
            np.add.at(nwo, idx, wo)
            np.add.at(nwi, idx, wi)
        else:
            nv = v
            nu = u
            nwo = wo
            nwi = wi
        counts = np.bincount(nv, minlength=self.n)
        self.adj_ptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        self.adj_nbr = nu
        self.adj_wout = nwo
        self.adj_win = nwi

    def neighbours(self, v):
        a, b = self.adj_ptr[v], self.adj_ptr[v + 1]
        return self.adj_nbr[a:b], self.adj_wout[a:b], self.adj_win[a:b]

    @property
    def ecount(self):
        return len(self.src)

    def degree_counts(self):
        """Unweighted degree (number of incident edge endpoints)."""
        deg = np.zeros(self.n, dtype=np.int64)
        np.add.at(deg, self.src, 1)
        np.add.at(deg, self.dst, 1)
        return deg
