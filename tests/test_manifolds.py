"""Manifold algebra unit tests — mirrors the reference's pure-math spot checks
(test/inertial/testIMUDeltaFactor.jl:39-120 style: identity/inverse/compose/
exp/log consistency), adapted to each group.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rome_tpu.manifolds.base import (
    SE2_,
    SE3_,
    SO2_,
    SO3_,
    ProductGroup,
    T2,
    T3,
)
from rome_tpu.manifolds import quat as Q

ALL = [T2, T3, SO2_, SO3_, SE2_, SE3_, ProductGroup([SE2_, T2]), ProductGroup([SO3_, T3, T3])]


def _rand_tangent(man, rng, scale=0.7):
    return jnp.asarray(rng.normal(size=(man.dof,)) * scale, dtype=jnp.float32)


@pytest.mark.parametrize("man", ALL, ids=lambda m: m.name)
def test_group_axioms(man, rng):
    e = man.identity()
    p = man.boxplus(e, _rand_tangent(man, rng))
    q = man.boxplus(e, _rand_tangent(man, rng))

    # identity laws
    np.testing.assert_allclose(man.compose(p, man.identity()), p, atol=1e-5)
    np.testing.assert_allclose(man.compose(man.identity(), p), p, atol=1e-5)
    # inverse law
    np.testing.assert_allclose(
        man.normalize(man.compose(p, man.inverse(p))), e, atol=1e-5
    )
    # associativity
    r = man.boxplus(e, _rand_tangent(man, rng))
    a = man.compose(man.compose(p, q), r)
    b = man.compose(p, man.compose(q, r))
    np.testing.assert_allclose(a, b, atol=1e-4)


@pytest.mark.parametrize("man", ALL, ids=lambda m: m.name)
def test_boxplus_local_roundtrip(man, rng):
    e = man.identity()
    p = man.boxplus(e, _rand_tangent(man, rng))
    xi = _rand_tangent(man, rng, scale=0.5)
    q = man.boxplus(p, xi)
    xi_back = man.local(p, q)
    np.testing.assert_allclose(xi_back, xi, atol=1e-4)
    # local(p, p) == 0
    np.testing.assert_allclose(man.local(p, p), np.zeros(man.dof), atol=1e-5)


@pytest.mark.parametrize("man", ALL, ids=lambda m: m.name)
def test_batched_ops_match_single(man, rng):
    e = man.identity()
    ps = jnp.stack([man.boxplus(e, _rand_tangent(man, rng)) for _ in range(5)])
    qs = jnp.stack([man.boxplus(e, _rand_tangent(man, rng)) for _ in range(5)])
    batched = man.compose(ps, qs)
    single = jnp.stack([man.compose(ps[i], qs[i]) for i in range(5)])
    np.testing.assert_allclose(batched, single, atol=1e-6)
    np.testing.assert_allclose(man.local(ps, qs), jnp.stack([man.local(ps[i], qs[i]) for i in range(5)]), atol=1e-5)


def test_se2_hybrid_semantics():
    """The hybrid tangent convention of the reference (PriorPose2.jl:18-25):
    translation linear at identity, body-frame perturbation."""
    p = jnp.array([1.0, 2.0, np.pi / 2])
    d = jnp.array([1.0, 0.0, 0.0])
    q = SE2_.boxplus(p, d)
    # moving +x in body frame at heading pi/2 moves +y in world
    np.testing.assert_allclose(q, [1.0, 3.0, np.pi / 2], atol=1e-6)
    # local recovers the body-frame delta
    np.testing.assert_allclose(SE2_.local(p, q), d, atol=1e-6)


def test_se2_angle_wrap():
    p = jnp.array([0.0, 0.0, np.pi - 0.05])
    q = SE2_.boxplus(p, jnp.array([0.0, 0.0, 0.1]))
    assert float(q[2]) == pytest.approx(-np.pi + 0.05, abs=1e-6)
    np.testing.assert_allclose(SE2_.local(p, q), [0, 0, 0.1], atol=1e-6)


def test_quaternion_matrix_roundtrip(rng):
    for _ in range(20):
        phi = jnp.asarray(rng.normal(size=3) * 1.5, dtype=jnp.float32)
        q = Q.qexp(phi)
        R = Q.qto_matrix(q)
        # matrix orthonormality
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        q2 = Q.qfrom_matrix(R)
        np.testing.assert_allclose(np.abs(np.dot(q, q2)), 1.0, atol=1e-5)
        # log/exp roundtrip (minimal angle)
        if np.linalg.norm(phi) < np.pi:
            np.testing.assert_allclose(Q.qlog(q), phi, atol=1e-4)


def test_qrotate_matches_matrix(rng):
    phi = jnp.asarray(rng.normal(size=3), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=3), dtype=jnp.float32)
    q = Q.qexp(phi)
    np.testing.assert_allclose(Q.qrotate(q, v), Q.qto_matrix(q) @ v, atol=1e-5)


def test_se3_compose_matches_homogeneous(rng):
    e = SE3_.identity()
    a = SE3_.boxplus(e, jnp.asarray(rng.normal(size=6) * 0.8, dtype=jnp.float32))
    b = SE3_.boxplus(e, jnp.asarray(rng.normal(size=6) * 0.8, dtype=jnp.float32))
    c = SE3_.compose(a, b)

    def homog(p):
        H = np.eye(4)
        H[:3, :3] = np.asarray(Q.qto_matrix(p[3:]))
        H[:3, 3] = np.asarray(p[:3])
        return H

    np.testing.assert_allclose(homog(c), homog(a) @ homog(b), atol=1e-5)


def test_ops_jittable():
    f = jax.jit(lambda p, q: SE2_.local(p, SE2_.compose(p, q)))
    p = jnp.array([1.0, 2.0, 0.3])
    q = jnp.array([0.5, -0.2, 0.1])
    np.testing.assert_allclose(f(p, q), SE2_.log(q), atol=1e-6)
