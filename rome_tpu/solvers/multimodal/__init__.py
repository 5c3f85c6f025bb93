"""Nonparametric multimodal solver subpackage."""
from rome_tpu.solvers.multimodal.kde import ManifoldKernelDensity, gibbs_product, manifold_mean, silverman_bandwidth
from rome_tpu.solvers.multimodal.convolve import approx_conv, approxConv
from rome_tpu.solvers.multimodal.solve import solve_graph_nonparametric, init_all_beliefs, predict_belief
from rome_tpu.solvers.multimodal.batched import BatchedNonparametricSolver, build_propagator
from rome_tpu.solvers.multimodal.tree import (
    BayesTree,
    Clique,
    build_tree_from_ordering,
    buildTreeFromOrdering,
    calc_cliques_recycled,
    calcCliquesRecycled,
    get_elimination_order,
    getEliminationOrder,
    solve_tree,
    solveTree,
)
