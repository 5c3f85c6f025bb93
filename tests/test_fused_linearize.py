"""Fused analytic linearization kernels must reproduce the generic jacfwd
path exactly (ops/fused_linearize.py vs solvers/linearize.batch_linearize's
fallback) — same contract the reference's hand-written factor gradients obey
vs autodiff (Pose2D.jl:48-67).
"""

import numpy as np
import jax
import jax.numpy as jnp

from rome_tpu.factors.pose2 import POSE2POSE2
from rome_tpu.factors.base import gaussian_params
from rome_tpu.distributions import MvNormal
from rome_tpu.graph.lower import FactorBatch, GraphArrays
from rome_tpu.manifolds.base import SE2
from rome_tpu.ops.fused_linearize import pose2pose2_linearize


def _random_batch(n, dtype, seed=0):
    rng = np.random.default_rng(seed)
    p = np.stack(
        [rng.normal(0, 5, n), rng.normal(0, 5, n), rng.uniform(-np.pi, np.pi, n)],
        axis=-1,
    )
    q = np.stack(
        [rng.normal(0, 5, n), rng.normal(0, 5, n), rng.uniform(-np.pi, np.pi, n)],
        axis=-1,
    )
    z = np.stack(
        [rng.normal(0, 1, n), rng.normal(0, 1, n), rng.uniform(-3, 3, n)],
        axis=-1,
    )
    Ss = []
    for i in range(n):
        A = rng.normal(size=(3, 3)) * 0.3 + np.eye(3)
        Ss.append(np.linalg.cholesky(A @ A.T))
    S = np.stack(Ss)
    return (
        jnp.asarray(p, dtype), jnp.asarray(q, dtype),
        {"z": jnp.asarray(z, dtype), "sqrt_info": jnp.asarray(S, dtype)},
    )


def _jacfwd_reference(params, p, q):
    man = SE2()

    def f(deltas, prow, pts):
        newp = tuple(
            man.boxplus(pp, d) for pp, d in zip(pts, deltas)
        )
        return prow["sqrt_info"] @ POSE2POSE2.residual(prow, *newp)

    zeros = (jnp.zeros((p.shape[0], 3), p.dtype),) * 2

    def fj(deltas, prow, pts):
        return f(deltas, prow, pts), jax.jacfwd(f)(deltas, prow, pts)

    return jax.vmap(fj)(zeros, params, (p, q))


def test_pose2pose2_fused_matches_jacfwd_f64():
    with jax.enable_x64():
        p, q, params = _random_batch(257, jnp.float64)
        r_ref, J_ref = _jacfwd_reference(params, p, q)
        r, (J1, J2) = pose2pose2_linearize(params, p, q)
        np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), atol=1e-12)
        np.testing.assert_allclose(np.asarray(J1), np.asarray(J_ref[0]), atol=1e-12)
        np.testing.assert_allclose(np.asarray(J2), np.asarray(J_ref[1]), atol=1e-12)


def test_pose2pose2_fused_matches_jacfwd_f32():
    p, q, params = _random_batch(64, jnp.float32, seed=3)
    r_ref, J_ref = _jacfwd_reference(params, p, q)
    r, (J1, J2) = pose2pose2_linearize(params, p, q)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(J1), np.asarray(J_ref[0]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(J2), np.asarray(J_ref[1]), atol=2e-5)
