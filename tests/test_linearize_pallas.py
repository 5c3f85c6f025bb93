"""Packed coordinate-plane Pallas linearize kernel: exactness vs the
(n,3)-layout analytic kernel (ops/fused_linearize.py), which is itself
pinned against the generic jacfwd path in tests/test_fused_linearize.py.
Reference residual contract: Pose2D.jl:48-67."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")


def _random_batch(n, seed=0):
    rng = np.random.default_rng(seed)
    p = jnp.asarray(rng.normal(0, 2, (n, 3)), jnp.float32)
    q = jnp.asarray(rng.normal(0, 2, (n, 3)), jnp.float32)
    z = jnp.asarray(rng.normal(0, 1, (n, 3)), jnp.float32)
    S = jnp.asarray(rng.normal(0, 1, (n, 3, 3)) + 5 * np.eye(3), jnp.float32)
    w = jnp.asarray(rng.uniform(0.5, 1, (n,)), jnp.float32)
    return p, q, z, S, w


@pytest.mark.parametrize("n", [1, 100, 200, 1024])
def test_packed_matches_analytic(n):
    from rome_tpu.ops.fused_linearize import pose2pose2_linearize
    from rome_tpu.ops.linearize_pallas import pose2pose2_linearize_packed

    p, q, z, S, w = _random_batch(n)
    params = {"z": z, "sqrt_info": S}
    r_ref, (J1_ref, J2_ref) = pose2pose2_linearize(params, p, q)
    r_ref = r_ref * w[:, None]
    J1_ref = J1_ref * w[:, None, None]
    J2_ref = J2_ref * w[:, None, None]
    r, (J1, J2) = pose2pose2_linearize_packed(params, p, q, w)
    assert r.shape == (n, 3) and J1.shape == (n, 3, 3)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(J1), np.asarray(J1_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(J2), np.asarray(J2_ref), atol=2e-5)


def test_pack_unpack_roundtrip():
    from rome_tpu.ops.linearize_pallas import (
        ROWS, _SUB, pack_pose2pose2, unpack_planes,
    )

    n = 77
    p, q, z, S, w = _random_batch(n, seed=3)
    X = pack_pose2pose2(p, q, z, S, w)
    assert X.shape[0] == ROWS and X.shape[1] == _SUB
    assert X.shape[2] % 128 == 0
    flat = np.asarray(X).reshape(ROWS, -1)
    # planes hold the inputs exactly under the slab bijection
    np.testing.assert_array_equal(flat[0, :n], np.asarray(p)[:, 0])
    np.testing.assert_array_equal(flat[18, :n], np.asarray(w))
    # unpack is the exact inverse layout map
    r, (J1, J2) = unpack_planes(X, n)
    assert r.shape == (n, 3) and J1.shape == (n, 3, 3)
