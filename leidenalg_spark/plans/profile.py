"""Resolution profile (SURVEY.md O12; reference Optimiser.py:661-861).

Bisection scan over the resolution parameter for the linear-resolution
methods (Q = E - γF): between two resolutions whose optimal partitions
have the same bisect value (total internal weight,
LinearResolutionParameterVertexPartition.bisect_value,
VertexPartition.py:662-668) no further structure exists; otherwise probe
the (log-space) midpoint (Optimiser.py:828-831) and recurse.  Probes are
independent full Leiden runs — embarrassingly parallel if desired.
"""

from __future__ import annotations

from dataclasses import dataclass
from math import sqrt

import numpy as np

from ..localcore import LocalGraph, LocalPartition, OptimiserOpts, QualitySpec, optimise_partition


@dataclass
class ProfilePoint:
    gamma: float
    membership: np.ndarray
    quality: float
    bisect_value: float

    def sizes(self):
        c = np.bincount(self.membership)
        return sorted((int(x) for x in c[c > 0]), reverse=True)


def _optimise_at(graph, method, gamma, n_iterations, seed, correct_self_loops):
    spec = QualitySpec(method, gamma=gamma, correct_self_loops=correct_self_loops)
    P = LocalPartition([(graph, spec)])
    optimise_partition(P, n_iterations=n_iterations, opts=OptimiserOpts(seed=seed))
    live = P.count_c > 0
    bisect = float(P.w_in[0][live].sum())  # total_weight_in_all_comms (P6)
    return ProfilePoint(gamma, P.membership.copy(), P.quality(), bisect)


def resolution_profile(
    graph: LocalGraph,
    method: str = "cpm",
    resolution_range=(0.0, 1.0),
    min_diff_bisect_value: float = 1.0,
    min_diff_resolution: float = 1e-3,
    linear_bisection: bool = False,
    number_iterations: int = 1,
    seed: int = 0,
    correct_self_loops: bool = False,
) -> list[ProfilePoint]:
    """Stack-driven bisection (Optimiser.py:811-850); returns profile
    points sorted by resolution."""
    return _bisect_scan(
        lambda g: _optimise_at(graph, method, g, number_iterations, seed, correct_self_loops),
        resolution_range, min_diff_bisect_value, min_diff_resolution, linear_bisection,
    )


def _bisect_scan(probe, resolution_range, min_diff_bisect_value,
                 min_diff_resolution, linear_bisection):
    """Shared stack-driven bisection (Optimiser.py:811-850) over any probe
    returning an object with a ``bisect_value`` attribute."""
    g1, g2 = float(resolution_range[0]), float(resolution_range[1])
    points = {}
    for g in (g1, g2):
        points[g] = probe(g)
    stack = [(g1, g2)]
    while stack:
        a, b = stack.pop()
        if b - a <= min_diff_resolution:
            continue
        if abs(points[a].bisect_value - points[b].bisect_value) <= min_diff_bisect_value:
            continue
        if not linear_bisection and a > 0 and b > 0:
            mid = sqrt(a * b)  # log-space midpoint (Optimiser.py:828-831)
        else:
            mid = (a + b) / 2.0
        if mid in points or mid <= a or mid >= b:
            continue
        points[mid] = probe(mid)
        stack.append((a, mid))
        stack.append((mid, b))
    out = [points[g] for g in sorted(points)]
    # monotonicity repair (Optimiser.py:762-773): bisect values must be
    # non-increasing in gamma for Q = E - γF; drop violators
    cleaned = []
    for pt in out:
        while cleaned and pt.bisect_value > cleaned[-1].bisect_value + 1e-9:
            cleaned.pop()
        cleaned.append(pt)
    return cleaned


# ------------------------------------------------------------ distributed
@dataclass
class DFProfilePoint:
    """One probe of the distributed profile: membership stays a DataFrame
    (never collected); ``bisect_value`` = total internal weight across all
    communities (P6, VertexPartition.py:662-668)."""

    gamma: float
    membership: "DataFrame"  # (id, comm)
    quality: float
    bisect_value: float
    n_comms: int

    def sizes(self):
        rows = (
            self.membership.groupBy("comm").count()
            .select("count").toPandas()["count"]
        )
        return sorted((int(x) for x in rows), reverse=True)


def total_internal_weight(edges, membership) -> float:
    """Distributed bisect value: Σ_c w_in(c) — one join-aggregate, no
    driver-side membership materialisation."""
    from pyspark.sql import functions as F

    m_src = membership.select(F.col("id").alias("src"), F.col("comm").alias("cs"))
    m_dst = membership.select(F.col("id").alias("dst"), F.col("comm").alias("cd"))
    row = (
        edges.join(m_src, "src").join(m_dst, "dst")
        .where(F.col("cs") == F.col("cd"))
        .agg(F.sum("weight").alias("w"))
        .first()
    )
    return float(row["w"] or 0.0)


def resolution_profile_df(
    spark,
    edges,
    method: str = "cpm",
    resolution_range=(0.0, 1.0),
    min_diff_bisect_value: float = 1.0,
    min_diff_resolution: float = 1e-3,
    linear_bisection: bool = False,
    number_iterations: int = 1,
    seed: int = 0,
    directed: bool = False,
    node_sizes=None,
    correct_self_loops: bool = False,
    **leiden_kwargs,
) -> list[DFProfilePoint]:
    """O12 at scale: the same stack bisection, each probe a full
    distributed :func:`~leidenalg_spark.operators.leiden.leiden` run on
    the edge DataFrame (reference Optimiser.py:661-861 semantics; probes
    on graphs under ``local_threshold`` delegate to the exact local core,
    so small-graph profiles are bit-identical to
    :func:`resolution_profile`).  Memberships are returned as DataFrames
    and the bisect value is one join-aggregate per probe — nothing
    vertex-proportional ever reaches the driver."""
    from ..operators.leiden import leiden

    def probe(g):
        res = leiden(
            spark, edges, method=method, gamma=g,
            n_iterations=number_iterations, seed=seed, directed=directed,
            node_sizes=node_sizes, correct_self_loops=correct_self_loops,
            **leiden_kwargs,
        )
        bis = total_internal_weight(edges, res.membership)
        n_comms = res.membership.select("comm").distinct().count()
        return DFProfilePoint(g, res.membership, res.quality, bis, n_comms)

    return _bisect_scan(
        probe, resolution_range, min_diff_bisect_value,
        min_diff_resolution, linear_bisection,
    )
