"""Batched Levenberg-Marquardt / Gauss-Newton over factor batches.

Reference contract: IIF.solveGraphParametric! (SURVEY.md §3.3) — minimize
sum r(x)^T inv(S) r(x) over the product manifold of all variables. Here the
normal equations are solved either densely (blocked Cholesky — small graphs,
covariance recovery) or matrix-free via preconditioned CG with a block-Jacobi
preconditioner (large graphs; all gathers/scatters + small batched matmuls,
the TPU-friendly formulation). One LM iteration is a single jitted XLA
program.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from rome_tpu.graph.lower import GraphArrays
from rome_tpu.solvers.linearize import (
    block_diag_from_lins,
    cost_at,
    dense_normal_eqs,
    flatten_tangent,
    free_vector,
    gradient_from_lins,
    hvp_from_lins,
    linearize_all,
    unflatten_tangent,
)

# ----------------------------- pytree helpers ------------------------------

def _tdot(a, b):
    return sum(jnp.vdot(a[t], b[t]) for t in a)


def _taxpy(alpha, x, y):
    return {t: y[t] + alpha * x[t] for t in x}


def _tscale(alpha, x):
    return {t: alpha * x[t] for t in x}


# ----------------------------- PCG -----------------------------------------

def pcg(hvp, b, precond, tol, maxiter, dtype=jnp.float32):
    """Solve H x = b with preconditioned conjugate gradients (pytree state)."""
    x0 = {t: jnp.zeros_like(b[t]) for t in b}
    r0 = b
    z0 = precond(r0)
    rz0 = _tdot(r0, z0)
    bnorm = jnp.sqrt(_tdot(b, b)) + 1e-30

    def cond(state):
        _x, r, _z, _p, _rz, k = state
        return jnp.logical_and(k < maxiter, jnp.sqrt(_tdot(r, r)) > tol * bnorm)

    def body(state):
        x, r, z, p, rz, k = state
        Hp = hvp(p)
        denom = _tdot(p, Hp)
        alpha = rz / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        x = _taxpy(alpha, p, x)
        r = _taxpy(-alpha, Hp, r)
        z = precond(r)
        rz_new = _tdot(r, z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        p = _taxpy(beta, p, z)
        return (x, r, z, p, rz_new, k + 1)

    state = (x0, r0, z0, r0 if False else z0, rz0, jnp.zeros((), jnp.int32))
    x, r, *_ = jax.lax.while_loop(cond, body, state)
    return x


# ----------------------------- options -------------------------------------

@dataclass
class GNOptions:
    max_iters: int = 100
    lam0: float = 1e-6
    lam_min: float = 1e-12
    lam_max: float = 1e8
    lam_down: float = 0.25
    lam_up: float = 8.0
    gtol: float = 1e-8
    ftol: float = 1e-10
    xtol: float = 1e-10
    linear: str = "auto"          # "dense" | "pcg" | "auto"
    dense_threshold: int = 3000   # total dof below which dense Cholesky wins
    pcg_iters: int = 250
    pcg_tol: float = 1e-8
    verbose: bool = False


class ParametricSolver:
    """LM solver bound to one lowered graph (compiles once per structure)."""

    def __init__(self, ga: GraphArrays, opts: GNOptions = None):
        self.ga = ga
        self.opts = opts or GNOptions()
        linear = self.opts.linear
        if linear == "auto":
            linear = "dense" if ga.total_dof <= self.opts.dense_threshold else "pcg"
        self.linear = linear
        self._step = jax.jit(self._make_step())
        self._cost = jax.jit(lambda values: cost_at(self.ga, values))

    # -- one LM iteration as a pure function --------------------------------
    def _make_step(self):
        ga = self.ga
        opts = self.opts

        def boxplus_all(values, delta):
            out = {}
            for t in ga.type_names:
                man = ga.manifolds[t]
                d = delta[t] * ga.free[t][:, None]
                out[t] = man.normalize(man.boxplus(values[t], d))
            return out

        def solve_dense(lins, lam):
            H, g = dense_normal_eqs(ga, lins)
            diag = jnp.maximum(jnp.diag(H), 1e-8)
            Hd = H + lam * jnp.diag(diag)
            L, lower = jax.scipy.linalg.cho_factor(Hd, lower=True)
            x = jax.scipy.linalg.cho_solve((L, lower), -g)
            x = x * free_vector(ga)
            return unflatten_tangent(ga, x), g

        def solve_pcg(lins, lam):
            gvec = gradient_from_lins(ga, lins)
            D = block_diag_from_lins(ga, lins)

            def hvp(v):
                out = hvp_from_lins(ga, lins, v)
                # Marquardt damping on the diagonal of J^T J
                for t in out:
                    dd = jnp.maximum(
                        jnp.diagonal(D[t], axis1=-2, axis2=-1), 1e-8
                    )
                    out[t] = out[t] + lam * dd * v[t]
                    out[t] = out[t] * ga.free[t][:, None]
                return out

            # block-Jacobi preconditioner: invert damped per-variable blocks
            Pinv = {}
            for t in ga.type_names:
                dof = ga.manifolds[t].dof
                eye = jnp.eye(dof, dtype=ga.dtype)
                dd = jnp.maximum(jnp.diagonal(D[t], axis1=-2, axis2=-1), 1e-8)
                blk = D[t] + lam * dd[..., None] * eye + 1e-8 * eye
                fmask = ga.free[t][:, None, None]
                blk = blk * fmask + eye * (1.0 - fmask)
                Pinv[t] = jnp.linalg.inv(blk)

            def precond(r):
                return {
                    t: jnp.einsum("nij,nj->ni", Pinv[t], r[t]) * ga.free[t][:, None]
                    for t in r
                }

            b = {t: -gvec[t] for t in gvec}
            x = pcg(hvp, b, precond, opts.pcg_tol, opts.pcg_iters, ga.dtype)
            return x, gvec

        linear_solve = solve_dense if self.linear == "dense" else solve_pcg

        def step(values, lam):
            lins = linearize_all(ga, values)
            cost0 = sum(0.5 * jnp.sum(r0 * r0) for _b, r0, _J in lins)
            delta, g = linear_solve(lins, lam)
            if isinstance(g, dict):
                gvec = g
            else:
                gvec = unflatten_tangent(ga, g)
            gnorm = jnp.sqrt(_tdot(gvec, gvec))
            dnorm = jnp.sqrt(_tdot(delta, delta))
            trial = boxplus_all(values, delta)
            cost1 = cost_at(ga, trial)
            # gain ratio: actual vs quadratic-model predicted reduction
            Hd = hvp_from_lins(ga, lins, delta)
            pred = -(_tdot(gvec, delta) + 0.5 * _tdot(delta, Hd))
            rho = (cost0 - cost1) / jnp.where(pred > 1e-30, pred, 1e-30)
            ok = jnp.logical_and(jnp.isfinite(cost1), cost1 < cost0)
            new_values = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), trial, values
            )
            # Marquardt schedule: shrink lam only on good model agreement,
            # grow it when the quadratic model overshoots (rho small) even if
            # the step was accepted — kills the GN zigzag on rotation-heavy
            # graphs (Manhattan) without rejecting progress.
            grow = jnp.minimum(lam * opts.lam_up, opts.lam_max)
            shrink = jnp.maximum(lam * opts.lam_down, opts.lam_min)
            new_lam = jnp.where(
                ~ok,
                grow,
                jnp.where(rho < 0.25, grow, jnp.where(rho > 0.7, shrink, lam)),
            )
            return new_values, new_lam, cost0, cost1, gnorm, dnorm, ok

        return step

    # -- outer loop ----------------------------------------------------------
    def solve(self, values=None):
        ga, opts = self.ga, self.opts
        values = values or ga.values0
        lam = jnp.asarray(opts.lam0, dtype=ga.dtype)
        history = []
        cost_prev = None
        n_reject = 0
        converged = False
        reason = "max_iters"
        # dtype-aware floor: in f32 the cost/gradient plateau well above the
        # f64-style tolerances, so a stalled accepted plateau or repeated
        # rejections with a tiny proposed step also count as converged.
        step_floor = 1e-4 if ga.dtype == jnp.float32 else 1e-9
        for it in range(opts.max_iters):
            values, lam, cost0, cost1, gnorm, dnorm, ok = self._step(values, lam)
            okb = bool(ok)
            history.append(
                dict(iter=it, cost0=float(cost0), cost1=float(cost1),
                     gnorm=float(gnorm), dnorm=float(dnorm), accepted=okb,
                     lam=float(lam))
            )
            if opts.verbose:
                print(
                    f"  LM it={it} cost={float(cost0):.6g}->{float(cost1):.6g} "
                    f"|g|={float(gnorm):.3g} |dx|={float(dnorm):.3g} ok={okb} lam={float(lam):.1e}"
                )
            if okb:
                n_reject = 0
                if float(gnorm) < opts.gtol:
                    converged, reason = True, "gtol"
                    break
                if float(dnorm) < opts.xtol:
                    converged, reason = True, "xtol"
                    break
                if cost_prev is not None and abs(cost_prev - float(cost1)) <= opts.ftol * max(
                    1.0, abs(cost_prev)
                ):
                    converged, reason = True, "ftol"
                    break
                cost_prev = float(cost1)
            else:
                n_reject += 1
                if float(dnorm) < step_floor:
                    converged, reason = True, "step_floor"
                    break
                if n_reject >= 8 or float(lam) >= opts.lam_max:
                    converged, reason = (n_reject >= 8 and it > 2), "stalled"
                    break
        stats = SolveStats(
            iterations=len(history),
            final_cost=float(self._cost(values)),
            gnorm=float(history[-1]["gnorm"]) if history else 0.0,
            converged=bool(converged),
            history=history,
            linear=self.linear,
            reason=reason,
        )
        return values, stats


@dataclass
class SolveStats:
    iterations: int
    final_cost: float
    gnorm: float
    converged: bool
    history: list
    linear: str
    reason: str = ""


# --------------------------- covariance recovery ---------------------------

def marginal_covariances(ga: GraphArrays, values):
    """Per-variable marginal covariance blocks in the local tangent frame.

    Dense information-matrix inverse — the analogue of the reference's
    parametric covariance recovery (testParametricCovariances.jl). Returns
    {type_name: (n, dof, dof)}.
    """
    lins = linearize_all(ga, values)
    H, _g = dense_normal_eqs(ga, lins)
    H = H + 1e-8 * jnp.eye(H.shape[0], dtype=ga.dtype)
    cov = jnp.linalg.inv(H)
    out, off = {}, 0
    for t in ga.type_names:
        n, d = ga.counts[t], ga.manifolds[t].dof
        blocks = []
        for i in range(n):
            s = off + i * d
            blocks.append(cov[s : s + d, s : s + d])
        out[t] = jnp.stack(blocks) if blocks else jnp.zeros((0, d, d))
        off += n * d
    return out
