#!/usr/bin/env python
"""Generate the checked-in reference-parity quality fixture table.

Expected values are computed by a DELIBERATELY naive, audit-by-eye
implementation of the reference's closed-form quality formulas
(reference VertexPartition.py docstrings: Modularity ~l.60-95,
RBConfiguration ~l.473-517, RBER ~l.391-441, CPM ~l.525-583,
Significance ~l.617-651, Surprise ~l.587-615) — plain dict loops over
the edge list, no NumPy vectorisation, no shared code with
``leidenalg_spark.localcore`` or the DataFrame evaluators.  The fixture
file therefore triangulates three independent implementations:

    naive (this file, committed output) ≈ localcore ≈ DataFrame

``tests/test_quality_fixtures.py`` asserts both engine evaluators
against the committed table at 1e-6 (the BASELINE.json metric).

Run from the repo root:  python scripts/gen_quality_fixtures.py
"""

from __future__ import annotations

import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from leidenalg_spark.sources import fixtures as fx  # noqa: E402


# ----------------------------------------------------------- naive engine
def naive_quality(n, src, dst, weight, membership, method, gamma=1.0,
                  directed=False, node_sizes=None):
    """Reference formulas, one community dict at a time."""
    w_in = {}
    k_out = {}
    k_in = {}
    n_size = {}
    W = 0.0
    for c in set(membership):
        w_in[c] = 0.0
        k_out[c] = 0.0
        k_in[c] = 0.0
        n_size[c] = 0.0
    for v in range(n):
        sz = 1.0 if node_sizes is None else float(node_sizes[v])
        n_size[membership[v]] += sz
    for s, d, w in zip(src, dst, weight):
        W += w
        cs, cd = membership[s], membership[d]
        if cs == cd:
            w_in[cs] += w
        if directed:
            k_out[cs] += w
            k_in[cd] += w
        else:
            # undirected strengths: every endpoint counts, loops twice
            k_out[cs] += w
            k_out[cd] += w
    n_tot = float(n) if node_sizes is None else float(sum(node_sizes))

    def pairs(x):
        p = x * (x - 1.0) / 2.0
        return 2.0 * p if directed else p

    pairs_tot = pairs(n_tot)
    p_global = W / pairs_tot if pairs_tot > 0 else 0.0

    def kl(q, qe):
        out = 0.0
        if q > 0:
            out += q * math.log(q / qe)
        if q < 1:
            out += (1.0 - q) * math.log((1.0 - q) / (1.0 - qe))
        return out

    total = 0.0
    if method == "surprise":
        sw = sum(w_in.values())
        sp = sum(pairs(x) for x in n_size.values())
        q = min(sw / W, 1.0)
        qe = sp / pairs_tot
        if qe == 0 or qe == 1:
            return None  # degenerate KL — implementation-defined, skip
        return W * kl(q, qe)
    for c in w_in:
        w = w_in[c]
        if method == "modularity":
            pen = (k_out[c] * k_in[c]) / (W * W) if directed else (k_out[c] ** 2) / (4.0 * W * W)
            total += w / W - pen
        elif method == "rbconfiguration":
            pen = (k_out[c] * k_in[c]) / W if directed else (k_out[c] ** 2) / (4.0 * W)
            total += w - gamma * pen
        elif method == "rber":
            total += w - gamma * p_global * pairs(n_size[c])
        elif method == "cpm":
            total += w - gamma * pairs(n_size[c])
        elif method == "significance":
            pc = pairs(n_size[c])
            if pc > 0:
                dens = min(w / pc, 1.0)
                total += pc * kl(dens, p_global)
        else:
            raise ValueError(method)
    return total


# ------------------------------------------------------------- case table
GRAPHS = {
    # name: (builder expr, directed, weighted)
    "zachary": ("fx.zachary()", False, False),
    "zachary_w": ("fx.with_random_weights(fx.zachary(), seed=7)", False, True),
    "full10": ("fx.full(10)", False, False),
    "lattice20": ("fx.lattice(20, 3)", False, False),
    "bip8": ("fx.bipartite_8()[:4]", False, False),
    "er60": ("fx.erdos_renyi(60, 0.08, seed=5)", False, False),
    "er50_dir": ("fx.erdos_renyi(50, 0.06, directed=True, loops=True, seed=3)", True, False),
}

MEMBERSHIPS = {
    "singletons": lambda n: list(range(n)),
    "one": lambda n: [0] * n,
    "mod3": lambda n: [v % 3 for v in range(n)],
    "blocks5": lambda n: [v // 5 for v in range(n)],
}

CONFIGS = [
    ("modularity", 1.0),
    ("rbconfiguration", 0.5),
    ("rbconfiguration", 1.0),
    ("rber", 0.5),
    ("rber", 1.0),
    ("cpm", 0.1),
    ("cpm", 1.0),
    ("significance", 1.0),
    ("surprise", 1.0),
]


def build(expr):
    fix = eval(expr)  # noqa: S307 — fixed expressions from GRAPHS above
    n, s, d, w = fix[0], list(fix[1]), list(fix[2]), fix[3]
    w = [1.0] * len(s) if w is None else [float(x) for x in w]
    return n, [int(x) for x in s], [int(x) for x in d], w


def main():
    rows = []
    for gname, (expr, directed, weighted) in GRAPHS.items():
        n, s, d, w = build(expr)
        for mname, mf in MEMBERSHIPS.items():
            memb = mf(n)
            for method, gamma in CONFIGS:
                if method == "significance" and weighted:
                    continue  # reference skips Significance on weighted graphs
                q = naive_quality(n, s, d, w, memb, method, gamma, directed)
                if q is None:
                    continue
                rows.append({
                    "graph": gname, "membership": mname, "method": method,
                    "gamma": gamma, "directed": directed, "expected": q,
                })
    # node-size variants (CPM/RBER over pre-aggregated vertices)
    n, s, d, w = build(GRAPHS["full10"][0])
    ns = [(v % 3) + 1 for v in range(n)]
    for method, gamma in [("cpm", 0.5), ("rber", 0.5)]:
        for mname, mf in MEMBERSHIPS.items():
            memb = mf(n)
            q = naive_quality(n, s, d, w, memb, method, gamma, False, node_sizes=ns)
            rows.append({
                "graph": "full10", "membership": mname, "method": method,
                "gamma": gamma, "directed": False, "node_sizes": "mod3plus1",
                "expected": q,
            })
    out = os.path.join(REPO, "tests", "data", "quality_fixtures.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump({"graphs": {k: v[0] for k, v in GRAPHS.items()}, "rows": rows}, f, indent=1)
    print(f"wrote {len(rows)} fixture rows to {out}")


if __name__ == "__main__":
    main()
