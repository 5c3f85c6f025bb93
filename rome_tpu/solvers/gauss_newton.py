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
    runtime_state,
    structure_signature,
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
    ir_rounds: int = 2            # f64 iterative-refinement rounds (dense)
    verbose: bool = False


_SOLVER_CACHE: dict = {}


class ParametricSolver:
    """LM solver bound to one lowered graph STRUCTURE.

    Everything value-like (params, index routing, free masks) is a traced
    argument (linearize.runtime_state); only shapes are compiled in. Use
    :meth:`cached` to share one compiled solver across graphs with the same
    (padded) structure — the incremental path's no-recompile contract.
    """

    def __init__(self, ga: GraphArrays, opts: GNOptions = None):
        self.ga = ga
        self.opts = opts or GNOptions()
        linear = self.opts.linear
        if linear == "auto":
            linear = "dense" if ga.total_dof <= self.opts.dense_threshold else "pcg"
        self.linear = linear
        self._rt0 = runtime_state(ga)
        self._step = jax.jit(self._make_step())
        self._cost = jax.jit(lambda values, rt: cost_at(self.ga, values, rt))

    @classmethod
    def cached(cls, ga: GraphArrays, opts: GNOptions = None):
        """Structure-keyed solver reuse: same signature + options -> same
        compiled XLA programs (pass the new graph's runtime_state/values to
        :meth:`solve`)."""
        opts = opts or GNOptions()
        key = (structure_signature(ga), tuple(sorted(vars(opts).items())))
        solver = _SOLVER_CACHE.get(key)
        if solver is None:
            solver = cls(ga, opts)
            _SOLVER_CACHE[key] = solver
        return solver

    # -- one LM iteration as a pure function --------------------------------
    def _make_step(self):
        ga = self.ga
        opts = self.opts
        # f64 refinement needs x64 enabled in this process (bench.py and the
        # CPU test mesh enable it); otherwise the cast is a silent f32 no-op
        _X64_OK = bool(jax.config.jax_enable_x64) and ga.dtype == jnp.float32

        def boxplus_all(values, delta, rt):
            out = {}
            for t in ga.type_names:
                man = ga.manifolds[t]
                d = delta[t] * rt["free"][t][:, None]
                out[t] = man.normalize(man.boxplus(values[t], d))
            return out

        def solve_dense(lins, lam, rt):
            """Damped-normal-equations solve: f64 assembly, Jacobi scaling,
            f32 Cholesky on the MXU, f64 iterative refinement.

            At M3500 scale cond(H) ~ 1e8, so an H *stored* in f32 yields
            steps that are wrong by O(eps32*cond) ~ O(1) — LM then crawls
            (measured: cost stuck ~2.2k vs the f64 optimum 1774). Assembling
            H/g in emulated f64 (cheap: small-block einsums + scatters) and
            refining the f32-factorized solve against the f64 system gives
            f64-quality steps at f32 factorization speed: each round is one
            f64 matvec (O(n^2), ~ms) + one f32 triangular solve."""
            use64 = opts.ir_rounds > 0 and _X64_OK
            hdt = jnp.float64 if use64 else ga.dtype
            H, g = dense_normal_eqs(ga, lins, dtype=hdt, rt=rt)
            diag = jnp.maximum(jnp.diag(H), 1e-8)
            Hd = H + lam.astype(hdt) * jnp.diag(diag)
            # symmetric Jacobi scaling: Hs = D Hd D with D = diag(Hd)^-1/2
            d = 1.0 / jnp.sqrt(jnp.maximum(jnp.diag(Hd), 1e-12))
            Hs = Hd * d[:, None] * d[None, :]
            bs = -g * d
            L, lower = jax.scipy.linalg.cho_factor(
                Hs.astype(ga.dtype), lower=True
            )
            y = jax.scipy.linalg.cho_solve((L, lower), bs.astype(ga.dtype))
            y = y.astype(hdt)
            if use64:
                # safeguarded refinement: the f32-factorization iteration has
                # contraction factor ~ eps32*cond(Hs) which exceeds 1 at tiny
                # damping — keep the iterate with the smallest f64 residual
                # instead of trusting the last one
                y_best, rn_best = y, jnp.asarray(jnp.inf, hdt)
                for _ in range(opts.ir_rounds):
                    r = bs - Hs @ y
                    rn = jnp.linalg.norm(r)
                    better = rn < rn_best
                    y_best = jnp.where(better, y, y_best)
                    rn_best = jnp.where(better, rn, rn_best)
                    dy = jax.scipy.linalg.cho_solve(
                        (L, lower), r.astype(ga.dtype)
                    )
                    y = y + dy.astype(hdt)
                rn = jnp.linalg.norm(bs - Hs @ y)
                y = jnp.where(rn < rn_best, y, y_best)
            x = ((y * d) * free_vector(ga, rt).astype(hdt)).astype(ga.dtype)
            return unflatten_tangent(ga, x), g.astype(ga.dtype)

        def solve_pcg(lins, lam, rt):
            free = rt["free"]
            gvec = gradient_from_lins(ga, lins, rt)
            D = block_diag_from_lins(ga, lins)

            def hvp(v):
                out = hvp_from_lins(ga, lins, v, rt)
                # Marquardt damping on the diagonal of J^T J
                for t in out:
                    dd = jnp.maximum(
                        jnp.diagonal(D[t], axis1=-2, axis2=-1), 1e-8
                    )
                    out[t] = out[t] + lam * dd * v[t]
                    out[t] = out[t] * free[t][:, None]
                return out

            # block-Jacobi preconditioner: invert damped per-variable blocks
            Pinv = {}
            for t in ga.type_names:
                dof = ga.manifolds[t].dof
                eye = jnp.eye(dof, dtype=ga.dtype)
                dd = jnp.maximum(jnp.diagonal(D[t], axis1=-2, axis2=-1), 1e-8)
                blk = D[t] + lam * dd[..., None] * eye + 1e-8 * eye
                fmask = free[t][:, None, None]
                blk = blk * fmask + eye * (1.0 - fmask)
                Pinv[t] = jnp.linalg.inv(blk)

            def precond(r):
                return {
                    t: jnp.einsum("nij,nj->ni", Pinv[t], r[t]) * free[t][:, None]
                    for t in r
                }

            b = {t: -gvec[t] for t in gvec}
            x = pcg(hvp, b, precond, opts.pcg_tol, opts.pcg_iters, ga.dtype)
            return x, gvec

        linear_solve = solve_dense if self.linear == "dense" else solve_pcg

        def step(values, lam, rt):
            lins = linearize_all(ga, values, rt)
            cost0 = sum(0.5 * jnp.sum(r0 * r0) for _b, r0, _J, _v in lins)
            delta, g = linear_solve(lins, lam, rt)
            if isinstance(g, dict):
                gvec = g
            else:
                gvec = unflatten_tangent(ga, g)
            gnorm = jnp.sqrt(_tdot(gvec, gvec))
            dnorm = jnp.sqrt(_tdot(delta, delta))
            trial = boxplus_all(values, delta, rt)
            cost1 = cost_at(ga, trial, rt)
            # gain ratio: actual vs quadratic-model predicted reduction
            Hd = hvp_from_lins(ga, lins, delta, rt)
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

    # -- fused on-device outer loop ------------------------------------------
    # Reason codes for the while_loop convergence logic (0 = still running)
    _REASONS = {
        0: "max_iters",
        1: "gtol",
        2: "xtol",
        3: "ftol",
        4: "step_floor",
        5: "stalled",
    }

    def _make_solve_loop(self):
        """The whole LM solve as ONE jitted XLA program: lax.while_loop over
        LM iterations with the accept/convergence logic in-graph. A Python
        outer loop costs a host<->device round-trip per iteration — over a
        remote-tunnel TPU that dominated solve time (~0.5 s/iter on
        Manhattan-3500)."""
        ga, opts = self.ga, self.opts
        step = self._make_step()
        step_floor = 1e-4 if ga.dtype == jnp.float32 else 1e-9
        max_iters = int(opts.max_iters)

        def loop(values, lam, rt):
            hist0 = jnp.zeros((max_iters, 6), dtype=jnp.float32)

            def cond(state):
                _v, _lam, it, _cp, _nr, code, _g, _h = state
                return jnp.logical_and(it < max_iters, code == 0)

            def body(state):
                values, lam, it, cost_prev, n_rej, code, _g, hist = state
                new_values, new_lam, cost0, cost1, gnorm, dnorm, ok = step(
                    values, lam, rt
                )
                hist = hist.at[it].set(
                    jnp.stack(
                        [cost0, cost1, gnorm, dnorm,
                         ok.astype(cost0.dtype), new_lam]
                    ).astype(jnp.float32)
                )
                # accepted-branch convergence
                ftol_hit = jnp.abs(cost_prev - cost1) <= opts.ftol * jnp.maximum(
                    1.0, jnp.abs(cost_prev)
                )
                acc_code = jnp.where(
                    gnorm < opts.gtol,
                    1,
                    jnp.where(
                        dnorm < opts.xtol,
                        2,
                        jnp.where(
                            jnp.logical_and(jnp.isfinite(cost_prev), ftol_hit), 3, 0
                        ),
                    ),
                )
                # rejected-branch convergence
                n_rej_new = jnp.where(ok, 0, n_rej + 1)
                rej_code = jnp.where(
                    dnorm < step_floor,
                    4,
                    jnp.where(
                        jnp.logical_or(n_rej_new >= 8, new_lam >= opts.lam_max),
                        5,
                        0,
                    ),
                )
                new_code = jnp.where(ok, acc_code, rej_code).astype(jnp.int32)
                new_cost_prev = jnp.where(ok, cost1, cost_prev)
                return (
                    new_values,
                    new_lam,
                    it + 1,
                    new_cost_prev,
                    n_rej_new,
                    new_code,
                    gnorm,
                    hist,
                )

            init = (
                values,
                lam,
                jnp.zeros((), jnp.int32),
                jnp.asarray(jnp.inf, dtype=ga.dtype),
                jnp.zeros((), jnp.int32),
                jnp.zeros((), jnp.int32),
                jnp.zeros((), dtype=ga.dtype),
                hist0,
            )
            values, lam, it, _cp, n_rej, code, gnorm, hist = jax.lax.while_loop(
                cond, body, init
            )
            final_cost = cost_at(ga, values, rt)
            return values, it, code, n_rej, gnorm, final_cost, hist

        return loop

    # -- outer loop ----------------------------------------------------------
    def solve(self, values=None, rt=None):
        """Run the fused LM solve. ``rt`` (linearize.runtime_state) carries
        the graph's traced data — pass the CURRENT graph's state when this
        solver instance came from the structure cache."""
        ga, opts = self.ga, self.opts
        values = values or ga.values0
        rt = rt if rt is not None else self._rt0
        lam = jnp.asarray(opts.lam0, dtype=ga.dtype)
        if not hasattr(self, "_solve_loop"):
            self._solve_loop = jax.jit(self._make_solve_loop())
        values, it, code, n_rej, gnorm, final_cost, hist = self._solve_loop(
            values, lam, rt
        )
        it = int(it)
        code = int(code)
        hist = [
            dict(
                iter=k,
                cost0=float(h[0]),
                cost1=float(h[1]),
                gnorm=float(h[2]),
                dnorm=float(h[3]),
                accepted=bool(h[4] > 0.5),
                lam=float(h[5]),
            )
            for k, h in enumerate(list(jax.device_get(hist))[:it])
        ]
        if opts.verbose:
            for h in hist:
                print(
                    f"  LM it={h['iter']} cost={h['cost0']:.6g}->{h['cost1']:.6g} "
                    f"|g|={h['gnorm']:.3g} |dx|={h['dnorm']:.3g} "
                    f"ok={h['accepted']} lam={h['lam']:.1e}"
                )
        # converged semantics match the old host loop: any tolerance hit
        # counts; "stalled" counts only after enough rejects past warmup
        converged = code in (1, 2, 3, 4) or (
            code == 5 and int(n_rej) >= 8 and it > 3
        )
        stats = SolveStats(
            iterations=it,
            final_cost=float(final_cost),
            gnorm=float(gnorm),
            converged=bool(converged),
            history=hist,
            linear=self.linear,
            reason=self._REASONS.get(code, "max_iters"),
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
