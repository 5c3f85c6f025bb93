"""Nonparametric multimodal solve — the solveTree! capability re-designed.

The reference runs clique-wise belief propagation on a Bayes tree
(SURVEY.md §3.2). Round-1 engine: iterative full-graph belief propagation —
for each variable, the product of all adjacent factors' approxConv messages
(the same fixpoint the clique up/down solve computes), swept a few times.
Messages are vmapped particle solves; products are parallel-Gibbs KDE
products. A Bayes-tree scheduler can later reorder these identical kernels.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rome_tpu.graph.graph import FactorGraph
from rome_tpu.solvers.multimodal.convolve import approx_conv, sample_measurements
from rome_tpu.solvers.multimodal.kde import (
    ManifoldKernelDensity,
    gibbs_product,
    manifold_mean,
)


def init_variable_belief(fg: FactorGraph, label: str, particles, solve_key: str = "default"):
    rec = fg.variables[str(label)]
    rec.beliefs[solve_key] = jnp.asarray(particles)
    rec.initialized[solve_key] = True
    return rec


def init_all_beliefs(
    fg: FactorGraph,
    solve_key: str = "default",
    N: Optional[int] = None,
    key=None,
    force: bool = False,
):
    """initAll! for particle beliefs: priors sample directly; relatives
    propagate via approxConv once their neighbors are initialized (reference
    graphinit ordering); leftovers seed at identity + noise."""
    N = N or fg.params.N
    key = key if key is not None else jax.random.PRNGKey(42)
    if force:
        for rec in fg.variables.values():
            rec.beliefs.pop(solve_key, None)
            rec.initialized[solve_key] = False

    def ready(lbl):
        return solve_key in fg.variables[lbl].beliefs

    for sweep in range(max(4, fg.num_factors)):
        progress = False
        for i, flabel in enumerate(fg._fct_order):
            f = fg.factors[flabel]
            if f.solvable <= 0:
                continue
            for k, v in enumerate(f.variables):
                if ready(v):
                    continue
                others = [u for j, u in enumerate(f.variables) if j != k]
                if others and not all(ready(u) for u in others):
                    continue
                kk = jax.random.fold_in(key, sweep * 10000 + i * 10 + k)
                pts = approx_conv(fg, flabel, v, solve_key, key=kk, N=N, skip_hypo=True)
                init_variable_belief(fg, v, pts, solve_key)
                progress = True
        if not progress:
            break

    for i, (label, rec) in enumerate(fg.variables.items()):
        if solve_key not in rec.beliefs:
            man = rec.manifold
            kk = jax.random.fold_in(key, 999999 + i)
            eps = jax.random.normal(kk, (N, man.dof))
            pts = man.normalize(
                man.boxplus(jnp.broadcast_to(jnp.asarray(man.identity()), (N, rec.vtype.point_dim)), eps)
            )
            init_variable_belief(fg, label, pts, solve_key)
    return fg


def predict_belief(
    fg: FactorGraph,
    label: str,
    factor_labels=None,
    solve_key: str = "default",
    key=None,
    N: Optional[int] = None,
):
    """predictbelief analogue (BearingRangeUtils.jl:67-91): product of the
    approxConv messages from the given (default: all) adjacent factors."""
    label = str(label)
    N = N or fg.params.N
    key = key if key is not None else jax.random.PRNGKey(abs(hash(label)) % (2**31))
    rec = fg.variables[label]
    flabels = [
        fl for fl in (factor_labels or fg._adj[label]) if fg.factors[fl].solvable > 0
    ]
    msgs = []
    for i, fl in enumerate(flabels):
        msgs.append(
            approx_conv(fg, fl, label, solve_key, key=jax.random.fold_in(key, i), N=N)
        )
    if not msgs:
        return rec.beliefs.get(solve_key)
    if len(msgs) == 1:
        return msgs[0]
    densities = [
        ManifoldKernelDensity.from_points(rec.manifold, m) for m in msgs
    ]
    return gibbs_product(jax.random.fold_in(key, 777), densities, n_out=N)


def solve_graph_nonparametric(
    fg: FactorGraph,
    solve_key: str = "default",
    sweeps: int = 3,
    N: Optional[int] = None,
    key=None,
    init: bool = True,
    engine: str = "batched",
):
    """Batch nonparametric solve: graph init + ``sweeps`` rounds of
    variable-wise belief-product updates (solveTree! capability contract:
    multimodal posteriors, statistical-band accuracy).

    engine="batched" (default): the compiled Jacobi sweep of
    multimodal/batched.py — all approxConv messages of a factor type in one
    vmapped program, all per-variable Gibbs products in another.
    engine="loop": the per-factor Gauss-Seidel host loop (reference-shaped;
    used as the slow cross-check).
    """
    if fg.params.treeinit:
        # SolverParams.treeinit: route the solve through the Bayes-tree
        # schedule (build + up/down clique passes) instead of flat sweeps
        from rome_tpu.solvers.multimodal.tree import solve_tree

        solve_tree(fg, solve_key=solve_key, N=N, key=key, init=init)
        return fg

    if engine == "batched":
        from rome_tpu.solvers.multimodal.batched import BatchedNonparametricSolver

        solver = BatchedNonparametricSolver(fg, solve_key, N=N)
        return solver.solve(sweeps=sweeps, key=key, init=init)

    N = N or fg.params.N
    key = key if key is not None else jax.random.PRNGKey(2024)
    if init:
        init_all_beliefs(fg, solve_key, N=N, key=jax.random.fold_in(key, 0))

    order = [l for l in fg._var_order]
    for s in range(sweeps):
        for i, label in enumerate(order):
            rec = fg.variables[label]
            if rec.solvable <= 0 or rec.marginalized:
                continue
            kk = jax.random.fold_in(key, (s + 1) * 100003 + i)
            pts = predict_belief(fg, label, solve_key=solve_key, key=kk, N=N)
            if pts is not None:
                rec.beliefs[solve_key] = pts

    # surface means as point estimates for PPE queries
    for label, rec in fg.variables.items():
        if solve_key in rec.beliefs:
            mu = manifold_mean(rec.manifold, rec.beliefs[solve_key])
            rec.points[solve_key] = np.asarray(mu, dtype=np.float64)
            rec.initialized[solve_key] = True
    return fg


# reference-style aliases
solveTree = solve_graph_nonparametric
solveGraph = solve_graph_nonparametric
predictbelief = predict_belief
initAll = init_all_beliefs
