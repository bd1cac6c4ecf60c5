"""NumPy Leiden core: exact reference semantics on a single machine.

Used (a) as the coarse-level kernel of the distributed Leiden loop — after
one or two distributed aggregation rounds the graph shrinks geometrically
and fits comfortably on the driver (SURVEY.md §4.1) — and (b) as the
independent oracle for the Spark implementations in tests.
"""

from .graph import LocalGraph
from .partition import LocalPartition
from .quality import QualitySpec, kl_div, possible_pairs, xlogy
from .optimiser import (
    ALL_COMMS,
    ALL_NEIGH_COMMS,
    MERGE_NODES,
    MOVE_NODES,
    RAND_COMM,
    RAND_NEIGH_COMM,
    OptimiserOpts,
    aggregate,
    merge_nodes,
    merge_nodes_constrained,
    move_nodes,
    move_nodes_constrained,
    optimise_partition,
    renumber_communities,
)


def find_partition_local(
    graph,
    method="modularity",
    initial_membership=None,
    n_iterations=2,
    gamma=1.0,
    max_comm_size=0,
    seed=0,
    is_membership_fixed=None,
    correct_self_loops=None,
    **opt_kwargs,
):
    """Single-machine ``find_partition`` (reference functions.py:21-93).

    Returns the optimised :class:`LocalPartition`.
    """
    if correct_self_loops is None:
        correct_self_loops = graph.has_loops if method == "cpm" else False
    spec = QualitySpec(method, gamma=gamma, correct_self_loops=correct_self_loops)
    P = LocalPartition([(graph, spec)], membership=initial_membership)
    opts = OptimiserOpts(max_comm_size=max_comm_size, seed=seed, **opt_kwargs)
    diff = optimise_partition(P, n_iterations=n_iterations, is_membership_fixed=is_membership_fixed, opts=opts)
    P.last_improvement = diff
    return P
