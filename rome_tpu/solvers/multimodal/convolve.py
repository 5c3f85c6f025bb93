"""approxConv — nonparametric factor convolution (the hot loop of MM-iSAM).

Reference semantics (SURVEY.md §3.2): to propagate belief through a factor
toward a target variable, sample a measurement per particle (getSample) and
solve ``residual = 0`` for the target per particle. Here that is ONE vmapped
batch: closed-form initializer when the factor type has one, otherwise a
fixed-iteration damped Gauss-Newton on the target's few tangent dofs —
static shapes, no data-dependent control flow.

Also implements the reference's per-particle hypothesis machinery:
``nullhypo`` (particle keeps its inflated prior sample with probability
eta) and ``multihypo`` (per-particle categorical data association across
candidate variables — testMultimodalRangeBearing.jl behavior).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rome_tpu.factors.base import Factor
from rome_tpu.graph.graph import FactorGraph
from rome_tpu.solvers.multimodal.kde import silverman_bandwidth


def sample_measurements(factor: Factor, key, n: int) -> jnp.ndarray:
    """getSample analogue: (n, zdim) measurement coordinate samples from the
    factor's belief(s) (supports Normal/MvNormal/Uniform/Mixture)."""
    cols = []
    for i, d in enumerate(factor.dists):
        cols.append(d.sample(jax.random.fold_in(key, i), n))
    if not cols:
        z = jnp.asarray(factor.params["z"])
        return jnp.broadcast_to(z, (n, z.shape[0]))
    return jnp.concatenate(cols, axis=-1)


def _gn_solve_target(ftype, slot, mans, z, params_row, other_pts, x0, iters=10, damping=1e-6):
    """Per-particle damped GN on the target variable only. All args are for
    ONE particle; vmapped by the caller.

    other_pts: tuple of points for every slot (target entry ignored).
    """
    man = mans[slot]
    sqrt_info = params_row["sqrt_info"]

    def resid(x):
        pts = tuple(
            x if k == slot else other_pts[k] for k in range(len(mans))
        )
        p = dict(params_row)
        p["z"] = z
        return sqrt_info @ ftype.residual(p, *pts)

    def body(_, x):
        def r_of_delta(d):
            return resid(man.boxplus(x, d))

        r = r_of_delta(jnp.zeros(man.dof, dtype=x.dtype))
        J = jax.jacfwd(r_of_delta)(jnp.zeros(man.dof, dtype=x.dtype))
        H = J.T @ J
        # trace-scaled damping: underdetermined factors (range-only) give a
        # rank-deficient H whose tiny absolute damping cancels in f32 — the
        # relative term keeps the 2x2/3x3 solves well-posed
        mu = 1e-3 * jnp.trace(H) / man.dof + damping
        H = H + mu * jnp.eye(man.dof, dtype=x.dtype)
        g = J.T @ r
        d = -jnp.linalg.solve(H, g)
        return man.normalize(man.boxplus(x, d))

    return jax.lax.fori_loop(0, iters, body, x0)


_CONV_CACHE: dict = {}


def _cached_conv(ftype, slot: int, mans: tuple, N: int):
    """Jitted per-particle convolution kernel, cached per
    (factor type, target slot, N). Params/measurements/points ride as traced
    arguments so every instance of the type shares one compiled program —
    without this, graph init re-traced an eager vmap per factor per call."""
    key = (ftype.name, slot, N)
    fn = _CONV_CACHE.get(key)
    if fn is None:
        init_fn = ftype.initializers.get(slot)

        def one(params_row, z_i, x0_i, other_i):
            p = dict(params_row)
            p["z"] = z_i
            x_init = init_fn(p, list(other_i)) if init_fn is not None else x0_i
            return _gn_solve_target(
                ftype, slot, list(mans), z_i, params_row, list(other_i), x_init
            )

        fn = jax.jit(
            jax.vmap(one, in_axes=(None, 0, 0, 0))
        )
        _CONV_CACHE[key] = fn
    return fn


def approx_conv(
    fg: FactorGraph,
    factor_label: str,
    target_label: str,
    solve_key: str = "default",
    key=None,
    N: Optional[int] = None,
    skip_hypo: bool = False,
) -> jnp.ndarray:
    """approxConv(fg, :factor, :target): (N, point_dim) particle samples of
    the target variable implied by the factor and the other variables'
    current beliefs."""
    f = fg.factors[str(factor_label)]
    target_label = str(target_label)
    arity = f.ftype.arity
    var_idx = list(f.variables).index(target_label)
    # multihypo layout: variables beyond the factor arity are candidates for
    # the LAST residual slot (reference addFactor! multihypo semantics)
    slot = min(var_idx, arity - 1)
    N = N or fg.params.N
    if key is None:
        key = jax.random.PRNGKey(abs(hash((factor_label, target_label))) % (2**31))

    recs = [fg.variables[v] for v in f.variables]
    mans = [fg.variables[v].manifold for v in f.variables[:arity]]
    trec = recs[var_idx]
    tman = trec.manifold

    k_meas, k_null, k_assoc, k_infl, k_pick = jax.random.split(key, 5)

    # other variables' particles (resampled to N if needed)
    def var_particles(r, kk):
        if solve_key in r.beliefs:
            pts = jnp.asarray(r.beliefs[solve_key])
            if pts.shape[0] != N:
                idx = jax.random.randint(kk, (N,), 0, pts.shape[0])
                pts = pts[idx]
            return pts
        if solve_key in r.points or "parametric" in r.points:
            p = jnp.asarray(r.points.get(solve_key, r.points.get("parametric")))
            return jnp.broadcast_to(p, (N, p.shape[0]))
        return jnp.broadcast_to(jnp.asarray(r.manifold.identity()), (N, r.vtype.point_dim))

    pts = [var_particles(r, jax.random.fold_in(k_pick, i)) for i, r in enumerate(recs)]

    # measurement samples
    z = sample_measurements(f, k_meas, N)

    # target init: current belief + inflation noise (SolverParams.inflation;
    # gives underdetermined factors — ranges — their solution-ring spread)
    x0 = var_particles(trec, jax.random.fold_in(k_pick, 999))
    infl = f.inflation if f.inflation is not None else fg.params.inflation
    bw = silverman_bandwidth(tman, x0)
    noise = jax.random.normal(k_infl, (N, tman.dof)) * (jnp.maximum(bw, 1e-2) * infl)
    x0_infl = tman.normalize(tman.boxplus(x0, noise))

    # multihypo data association (testMultimodalRangeBearing.jl semantics):
    # variable indices >= arity-1 are mutually exclusive candidates for the
    # last residual slot, with the fractional multihypo weights.
    multihypo = None if skip_hypo else f.multihypo
    assoc = None
    if multihypo is not None and len(recs) > arity:
        w = np.asarray(multihypo, dtype=np.float64)
        cand_idx = list(range(arity - 1, len(recs)))
        probs = w[cand_idx] / w[cand_idx].sum()
        draw = jax.random.categorical(k_assoc, jnp.log(jnp.asarray(probs)), shape=(N,))
        assoc = (cand_idx, draw)

    params_row = {
        k: jnp.asarray(v) for k, v in f.params.items() if k != "z"
    }
    params_row["z"] = jnp.asarray(f.params["z"])

    if assoc is None:
        # hot path (graph init + per-factor fallback messages): one CACHED
        # jitted vmap per (factor type, slot, N) — params/z/points are traced
        # arguments, so every factor of the type reuses the compiled kernel
        solved = _cached_conv(f.ftype, slot, tuple(mans), N)(
            params_row, z, x0_infl, tuple(pts[:arity])
        )
    elif var_idx < arity - 1:
        # target is a certain slot: per particle substitute the associated
        # candidate variable's particles into the last residual slot
        cand_idx, draw = assoc
        cand = jnp.stack([pts[u] for u in cand_idx])  # (K, N, pdim)
        onesl = jnp.ones((1, N, cand.shape[-1]), dtype=jnp.int32)
        chosen = jnp.take_along_axis(cand, draw[None, :, None] * onesl, axis=0)[0]
        pts_res = tuple(pts[: arity - 1]) + (chosen,)
        solved = _cached_conv(f.ftype, slot, tuple(mans), N)(
            params_row, z, x0_infl, pts_res
        )
    else:
        # target is a candidate: only its associated particles update; the
        # rest keep inflated prior samples
        cand_idx, draw = assoc
        my_idx = cand_idx.index(var_idx)
        pts_res = tuple(pts[: arity - 1]) + (pts[var_idx],)
        solved = _cached_conv(f.ftype, slot, tuple(mans), N)(
            params_row, z, x0_infl, pts_res
        )
        mask = (draw == my_idx)[:, None]
        solved = jnp.where(mask, solved, x0_infl)

    # nullhypo: particle ignores the factor with probability eta
    if f.nullhypo and f.nullhypo > 0.0:
        keep = jax.random.bernoulli(k_null, p=float(f.nullhypo), shape=(N,))
        solved = jnp.where(keep[:, None], x0_infl, solved)

    return tman.normalize(solved)


# reference-style alias
approxConv = approx_conv
