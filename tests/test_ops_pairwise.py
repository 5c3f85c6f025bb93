"""Fused Pallas pairwise-score kernels vs the generic vmapped path.

The kernels fuse manifold ``local`` + Mahalanobis scoring for the Gibbs
belief product (reference hot loop: KDE prodAppxMSGibbsS, BayesTracker.jl
usage). Parity must be tight since the Gibbs label sampler consumes these
log-weights directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rome_tpu.manifolds.base import SE2, SO2, ProductGroup, TranslationGroup
from rome_tpu.ops.pairwise import euclid_pairwise_logw, se2_pairwise_logw
from rome_tpu.solvers.multimodal.kde import (
    ManifoldKernelDensity,
    _fused_pairwise_logw,
    gibbs_product,
)


def _generic_logw(man, ref, mu, pts, var):
    def coords_for(ref_k):
        return man.local(jnp.broadcast_to(ref_k, pts.shape), pts)

    C = jax.vmap(coords_for)(ref)
    return -0.5 * jnp.sum((C - mu[:, None, :]) ** 2 / var, axis=-1)


def test_se2_kernel_matches_generic(rng):
    man = SE2()
    N, Nj = 37, 101  # deliberately off tile boundaries
    ref = np.c_[rng.normal(size=(N, 2)) * 3, rng.uniform(-np.pi, np.pi, N)]
    pts = np.c_[rng.normal(size=(Nj, 2)) * 3, rng.uniform(-np.pi, np.pi, Nj)]
    mu = rng.normal(size=(N, 3)).astype(np.float32) * 0.5
    var = np.array([0.3, 0.7, 0.2], np.float32)

    got = se2_pairwise_logw(ref, mu, pts, 1.0 / var)
    want = _generic_logw(man, jnp.asarray(ref, jnp.float32), jnp.asarray(mu),
                         jnp.asarray(pts, jnp.float32), jnp.asarray(var))
    assert got.shape == (N, Nj)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_euclid_kernel_matches_generic_with_wrap(rng):
    # BearingRange-style manifold: Circle x R
    man = ProductGroup([SO2(), TranslationGroup(1)], name="BearingRange")
    N, Nj = 50, 64
    ref = np.c_[rng.uniform(-np.pi, np.pi, N), rng.normal(size=N) * 5]
    pts = np.c_[rng.uniform(-np.pi, np.pi, Nj), rng.normal(size=Nj) * 5]
    mu = rng.normal(size=(N, 2)).astype(np.float32) * 0.3
    var = np.array([0.1, 0.9], np.float32)

    circ = np.array([1.0, 0.0], np.float32)
    got = euclid_pairwise_logw(ref, mu, pts, 1.0 / var, circ)
    want = _generic_logw(man, jnp.asarray(ref, jnp.float32), jnp.asarray(mu),
                         jnp.asarray(pts, jnp.float32), jnp.asarray(var))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_dispatch():
    assert _fused_pairwise_logw(
        SE2(),
        jnp.zeros((4, 3)), jnp.zeros((4, 3)), jnp.zeros((6, 3)), jnp.ones(3),
    ) is not None
    assert _fused_pairwise_logw(
        TranslationGroup(2),
        jnp.zeros((4, 2)), jnp.zeros((4, 2)), jnp.zeros((6, 2)), jnp.ones(2),
    ) is not None
    # SO(3) has no per-dim local -> falls back
    from rome_tpu.manifolds.base import SO3

    assert _fused_pairwise_logw(
        SO3(),
        jnp.zeros((4, 4)), jnp.zeros((4, 3)), jnp.zeros((6, 4)), jnp.ones(3),
    ) is None


@pytest.mark.parametrize("man_points", ["se2", "point2"])
def test_gibbs_product_fused_statistics(man_points, rng):
    """The fused product must still contract two offset beliefs to the
    precision-weighted mean (the same statistical check as the pure path)."""
    if man_points == "se2":
        man = SE2()
        mk = lambda c: np.c_[rng.normal(c, 0.1, (150, 2)), rng.normal(0, 0.05, 150)]
        a, b = mk(1.0), mk(1.4)
    else:
        man = TranslationGroup(2)
        a = rng.normal(1.0, 0.1, (150, 2))
        b = rng.normal(1.4, 0.1, (150, 2))
    da = ManifoldKernelDensity.from_points(man, a)
    db = ManifoldKernelDensity.from_points(man, b)
    out = gibbs_product(jax.random.PRNGKey(0), [da, db], n_out=150)
    m = np.asarray(out).mean(axis=0)
    assert abs(m[0] - 1.2) < 0.1 and abs(m[1] - 1.2) < 0.1
