"""Quality functions (the reference's six partition "methods").

Formulas follow the reference docstrings:

- Modularity:        src/leidenalg/VertexPartition.py:394-417
- RBConfiguration:   src/leidenalg/VertexPartition.py:767-796
- RBER:              src/leidenalg/VertexPartition.py:680-698
- CPM:               src/leidenalg/VertexPartition.py:856-885
- Significance:      src/leidenalg/VertexPartition.py:558-578
- Surprise:          src/leidenalg/VertexPartition.py:470-492

Conventions (fixed once for the whole engine; the reference docstrings are
ambiguous between ordered/unordered pair sums by a constant factor, which
never affects memberships because argmax is invariant under positive
scaling):

- ``w_c``  = total internal edge weight of community c, every edge counted
  ONCE (self-loops once).
- Modularity uses the standard Newman-Girvan normalisation
  (``Q(karate, 2-faction split) ~= 0.3715``).
- CPM / RBER / Significance / Surprise use the community-sum forms exactly
  as written (e.g. ``Q_cpm(K100, one community, gamma=.5) = 4950 - .5*4950``).
- RBConfiguration: ``sum_c (w_c - gamma*K_c^2/(4W))`` undirected,
  ``sum_c (w_c - gamma*Kout_c*Kin_c/W)`` directed, so that
  ``Q_rbconf(gamma=1) == W * Q_modularity``.

Every method exposes a vectorised ``diff`` used by the local-move kernels;
``diff(v, a, b) == quality(after) - quality(before)`` exactly (the contract
tested by the reference at tests/test_VertexPartition.py:91-111).
"""

from __future__ import annotations

import numpy as np

EPS = 1e-12


def xlogy(x, y):
    """x*log(y) with the 0*log(0)=0 convention, vectorised."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    out = np.zeros(np.broadcast(x, y).shape)
    mask = x != 0
    with np.errstate(divide="ignore", invalid="ignore"):
        np.copyto(out, x * np.log(np.where(mask, y, 1.0)), where=mask)
    return out


def kl_div(x, y):
    """Binary KL divergence D(x||y) (VertexPartition.py:484, :572).

    Reference semantics (the C++ KL helper): each term is included only
    on its valid domain — ``x·ln(x/y)`` when ``x>0 and y>0``,
    ``(1-x)·ln((1-x)/(1-y))`` when ``x<1 and y<1`` — and contributes 0
    otherwise.  The previous ``np.divide(..., where=...)`` form had no
    ``out=`` buffer, leaving masked-off entries as uninitialized memory
    (nondeterministic NaN/inf when y hit 0 or 1).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    shape = np.broadcast(x, y).shape
    m1 = (x > 0) & (y > 0)
    m2 = (x < 1) & (y < 1)
    t1 = np.zeros(shape)
    t2 = np.zeros(shape)
    with np.errstate(divide="ignore", invalid="ignore"):
        np.copyto(t1, x * np.log(np.divide(x, y, out=np.ones(shape), where=m1)), where=m1)
        np.copyto(
            t2,
            (1.0 - x) * np.log(np.divide(1.0 - x, 1.0 - y, out=np.ones(shape), where=m2)),
            where=m2,
        )
    return t1 + t2


def possible_pairs(n, directed, correct_self_loops=False):
    """Number of possible internal edges for a community of (node-size) n."""
    n = np.asarray(n, dtype=np.float64)
    if correct_self_loops:
        p = n * n / 2.0
    else:
        p = n * (n - 1.0) / 2.0
    if directed:
        p = p * 2.0
    return p


class QualitySpec:
    """One of the six quality functions, parameterised like the reference
    partition-class constructors (gamma == resolution_parameter)."""

    LINEAR = {"rbconfiguration", "rber", "cpm"}
    METHODS = {"modularity", "rbconfiguration", "rber", "cpm", "significance", "surprise"}

    def __init__(self, method="modularity", gamma=1.0, correct_self_loops=False):
        method = method.lower()
        if method not in self.METHODS:
            raise ValueError(f"unknown method {method!r}")
        self.method = method
        self.gamma = float(gamma)
        self.correct_self_loops = bool(correct_self_loops)

    # -- per-community contribution g(c); Q = reduce(g) -----------------
    def comm_contrib(self, g, w, kout, kin, nsz):
        """Vectorised contribution of communities with internal weight w,
        strengths kout/kin and node-size n, on graph g."""
        W = g.total_weight
        m = self.method
        if m == "modularity":
            if W <= 0:
                return np.zeros_like(np.asarray(w, dtype=np.float64))
            if g.directed:
                return w / W - (kout * kin) / (W * W)
            return w / W - (kout * kout) / (4.0 * W * W)
        if m == "rbconfiguration":
            if W <= 0:
                return np.asarray(w, dtype=np.float64) * 0.0
            if g.directed:
                return w - self.gamma * (kout * kin) / W
            return w - self.gamma * (kout * kout) / (4.0 * W)
        if m == "rber":
            pairs_tot = possible_pairs(g.total_size, g.directed, self.correct_self_loops)
            p = W / pairs_tot if pairs_tot > 0 else 0.0
            return w - self.gamma * p * possible_pairs(nsz, g.directed, self.correct_self_loops)
        if m == "cpm":
            return w - self.gamma * possible_pairs(nsz, g.directed, self.correct_self_loops)
        if m == "significance":
            pairs_tot = possible_pairs(g.total_size, g.directed, self.correct_self_loops)
            p = W / pairs_tot if pairs_tot > 0 else 0.0
            pairs_c = possible_pairs(nsz, g.directed, self.correct_self_loops)
            dens = np.divide(
                w, pairs_c, out=np.zeros(np.shape(pairs_c)), where=pairs_c > 0
            )
            out = pairs_c * kl_div(np.clip(dens, 0.0, 1.0), p)
            return np.where(pairs_c > 0, out, 0.0)
        raise AssertionError(m)  # surprise handled globally

    def quality(self, g, w_in, kout, kin, nsz):
        """Partition quality from per-community aggregates."""
        if self.method == "surprise":
            W = g.total_weight
            if W <= 0:
                return 0.0
            pairs_tot = possible_pairs(g.total_size, g.directed, self.correct_self_loops)
            q = float(np.sum(w_in)) / W
            q_exp = float(np.sum(possible_pairs(nsz, g.directed, self.correct_self_loops))) / pairs_tot
            return float(W * kl_div(np.clip(q, 0.0, 1.0), q_exp))
        return float(np.sum(self.comm_contrib(g, w_in, kout, kin, nsz)))
