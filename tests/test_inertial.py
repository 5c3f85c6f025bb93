"""Inertial stack tests mirroring the reference's algebra + solve checks
(/root/reference/test/inertial/testIMUDeltaFactor.jl).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rome_tpu.manifolds import quat as Q
from rome_tpu.manifolds import sgal3 as G
from rome_tpu.canonical.inertial_sim import (
    generate_field_inertial_measurement,
    generate_field_inertial_measurement_noise,
)
from rome_tpu.factors.inertial import IMUDeltaFactor, PriorRotVelPos, preintegrate_imu


def _np(x):
    return np.asarray(x, dtype=np.float64)


def _isapprox(a, b, rtol=1e-8, atol=0.0):
    """Julia-isapprox semantics: norm-wise, not elementwise."""
    a, b = _np(a), _np(b)
    return np.linalg.norm(a - b) <= max(
        atol, rtol * max(np.linalg.norm(a), np.linalg.norm(b))
    )


# --- SGal(3) algebra spot checks (testIMUDeltaFactor.jl:39-116) ------------


def test_sgal3_identity_inv_compose():
    eps = G.identity()
    assert np.allclose(_np(G.inverse(eps)), _np(eps))
    assert np.allclose(_np(G.compose(eps, eps)), _np(eps))


@pytest.mark.parametrize(
    "coords",
    [
        np.array([0, 0, 0, 0, 0, 0, 0, 0, 1, 1]) * 0.001,
        np.array([0.01, 0.02, 0.03, 0, 0, 0, 0.1, 0.2, 0.3, 1]) * 0.001,
        np.array([0, 0, 0, 0.01, 0.02, 0.03, 0.1, 0.2, 0.3, 1]) * 0.001,
        np.array([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1]) * 0.1,
    ],
)
def test_sgal3_exp_log_roundtrip(coords):
    Xc = jnp.asarray(coords, dtype=jnp.float32)
    p = G.exp(Xc)
    np.testing.assert_allclose(_np(G.log(p)), coords, atol=5e-6)


def test_sgal3_exp_closed_form():
    """testIMUDeltaFactor.jl:96-110 — closed-form small exp values."""
    Xc = jnp.asarray(np.array([0, 0, 0, 0, 0, 1.0, 0, 0, 0.5, 1]) * 0.01)
    p = _np(G.exp(Xc))
    R = _np(Q.qto_matrix(jnp.asarray(p[:4])))
    np.testing.assert_allclose(
        R, [[1, -0.005, 0], [0.005, 1, 0], [0, 0, 1]], atol=1e-4
    )
    np.testing.assert_allclose(p[4:7], [0, 0, 0.01], atol=1e-4)
    np.testing.assert_allclose(p[7:10], [0, 0, 5.0e-5], atol=1e-4)

    Xc = jnp.asarray(np.array([0, 0, 0, 1, 0, 0.0, 0, 0, 0, 1]) * 0.01)
    p = _np(G.exp(Xc))
    np.testing.assert_allclose(p[4:7], [0.01, 0, 0], atol=1e-4)
    np.testing.assert_allclose(p[7:10], [5e-5, 0, 0], atol=1e-4)


def test_sgal3_boxminus_gravity():
    """testIMUDeltaFactor.jl:78-92 — gravity-compensated delta, both signs."""
    p = G.make_point(
        jnp.array([1.0, 0, 0, 0]), jnp.array([1.0, 0, 0]), jnp.zeros(3), 0.0
    )
    q = G.make_point(
        jnp.array([1.0, 0, 0, 0]), jnp.array([1.0, 0, 0]), jnp.array([0.1, 0, 0]), 0.1
    )
    d = _np(G.boxminus(p, q, gravity=(0, 0, 9.81)))
    np.testing.assert_allclose(d[4:7], [0, 0, 9.81 * 0.1], atol=1e-6)
    np.testing.assert_allclose(d[7:10], [0, 0, 0.5 * 9.81 * 0.01], atol=1e-6)
    assert np.isclose(d[10], 0.1)
    d = _np(G.boxminus(p, q, gravity=(0, 0, -9.81)))
    np.testing.assert_allclose(d[4:7], [0, 0, -9.81 * 0.1], atol=1e-6)


def test_sgal3_adjoint_identities():
    """testIMUDeltaFactor.jl:127-157 — Ad/ad/Jr consistency."""
    import scipy.linalg as sla

    Xc = jnp.asarray(
        np.array([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1]) * 0.1,
        dtype=jnp.float32,
    )
    p = G.exp(Xc)
    Ad = _np(G.Adjoint_matrix(p))
    # compose(p, exp(X)) == compose(exp(Ad_p X), p)
    q1 = _np(G.compose(p, G.exp(Xc)))
    q2 = _np(G.compose(G.exp(jnp.asarray(Ad @ _np(Xc), dtype=jnp.float32)), p))
    np.testing.assert_allclose(q1, q2, atol=1e-5)
    # Ad(p^-1) == Ad(p)^-1
    np.testing.assert_allclose(
        _np(G.Adjoint_matrix(G.inverse(p))), np.linalg.inv(Ad), atol=1e-5
    )
    # exp(ad) == Ad
    np.testing.assert_allclose(
        sla.expm(_np(G.adjoint_matrix(Xc))), Ad, atol=1e-5
    )
    # Jl * Jr^-1 == Ad  (Chirikjian p29)
    jr = _np(G.right_jacobian(Xc, order=9))
    jl = _np(G.right_jacobian(-Xc, order=9))
    np.testing.assert_allclose(jl @ np.linalg.inv(jr), Ad, atol=1e-5)


# --- preintegration checks (testIMUDeltaFactor.jl:168-305) ------------------


def _uniform_integrate_check(gyros, accels, dt):
    """Euler-ish closed integration used by the reference as ground truth
    (testIMUDeltaFactor.jl:19-36)."""
    from rome_tpu.canonical.inertial_sim import _rodrigues

    R = np.eye(3)
    v = np.zeros(3)
    r = np.zeros(3)
    for g, a in zip(gyros, accels):
        R = R @ _rodrigues(np.asarray(g) * dt)
        dv = R @ (np.asarray(a) * dt)
        r = r + v * dt + 0.5 * dv * dt
        v = v + dv
    return R, v, r


def test_preintegrate_rotating_hover():
    """testIMUDeltaFactor.jl:265-280 — rotation about z while accelerating up."""
    dt, N = 0.01, 10
    dT = N * dt
    imu = generate_field_inertial_measurement(
        dt=dt, N=N, accel0=(0, 0, 9.81), rate=(0, 0, 0.1)
    )
    Sy = np.eye(6) * 0.1**2
    delta, Sigma, J_b = preintegrate_imu(
        imu.accels, imu.gyros, np.ones(N) * dt, Sy
    )
    R = _np(Q.qto_matrix(jnp.asarray(delta[:4])))
    c, s = np.cos(0.1 * dT), np.sin(0.1 * dT)
    np.testing.assert_allclose(R, [[c, -s, 0], [s, c, 0], [0, 0, 1]], atol=1e-8)
    np.testing.assert_allclose(delta[4:7], [0, 0, 9.81 * dT], atol=1e-8)
    np.testing.assert_allclose(delta[7:10], [0, 0, 0.5 * 9.81 * dT**2], rtol=1e-6)
    assert np.isclose(delta[10], dT)


@pytest.mark.parametrize("rate", [(0.01, 0, 0), (0, 0.01, 0)])
def test_preintegrate_vs_uniform_integration(rate):
    """testIMUDeltaFactor.jl:283-305 — matches step-wise integration."""
    dt, N = 0.01, 10
    gyros = np.tile(np.asarray(rate, dtype=np.float64), (N, 1))
    accels = np.tile(np.array([0, 0, 9.81]), (N, 1))
    Sy = np.eye(6) * 0.1**2
    delta, _, _ = preintegrate_imu(accels, gyros, np.ones(N) * dt, Sy)
    R, v, r = _uniform_integrate_check(gyros, accels, dt)
    np.testing.assert_allclose(_np(Q.qto_matrix(jnp.asarray(delta[:4]))), R, atol=1e-9)
    assert _isapprox(delta[4:7], v, rtol=1e-3)
    assert _isapprox(delta[7:10], r, rtol=1e-3)


def test_imu_factor_preintegrated_delta():
    """testIMUDeltaFactor.jl:168-212 — 1 s of slow z-rotation with net upward
    specific force 9.81-1; delta velocity integrates to ~8.81 up."""
    dt, N = 0.1, 10
    imu = generate_field_inertial_measurement_noise(
        dt=dt, N=N, rate=(0, 0, 0.001), accel0=(0, 0, 9.81 - 1),
        sigma_a=1e-4, sigma_w=np.deg2rad(0.0001),
    )
    fac = IMUDeltaFactor(imu.accels, imu.gyros, np.ones(N) * dt, imu.Sigma_y)
    delta = fac.params["delta"]
    np.testing.assert_allclose(delta[4:7], [0, 0, 8.81], atol=1e-3)
    np.testing.assert_allclose(delta[7:10], [0, 0, 8.81 / 2], atol=1e-3)
    np.testing.assert_allclose(delta[10], 1.0, atol=1e-12)

    R, v, r = _uniform_integrate_check(imu.gyros, imu.accels, dt)
    np.testing.assert_allclose(
        _np(Q.qto_matrix(jnp.asarray(np.asarray(delta[:4], np.float64)))), R, atol=1e-6
    )
    assert _isapprox(delta[4:7], v, rtol=1e-5)
    assert _isapprox(delta[7:10], r, rtol=1e-5)


# --- end-to-end parametric solve (testIMUDeltaFactor.jl:225-262) ------------


def test_imu_factor_parametric_solve():
    from rome_tpu import FactorGraph, GNOptions, MvNormal, RotVelPos, solve_graph_parametric

    dt, N = 0.1, 10
    imu = generate_field_inertial_measurement_noise(
        dt=dt, N=N, rate=(0, 0, 0.001), accel0=(0, 0, 9.81 - 1),
        sigma_a=1e-4, sigma_w=np.deg2rad(0.0001),
    )
    fac = IMUDeltaFactor(imu.accels, imu.gyros, np.ones(N) * dt, imu.Sigma_y)

    fg = FactorGraph()
    fg.params.graphinit = False
    fg.add_variable("x0", RotVelPos)
    fg.add_variable("x1", RotVelPos)
    z0 = np.zeros(9)
    z0[3:6] = [10.0, 0, 0]  # initial velocity 10 m/s along x
    fg.add_factor(["x0"], PriorRotVelPos(MvNormal(z0, np.eye(9) * 1e-3)))
    fg.add_factor(["x0", "x1"], fac)
    fg.init_all()

    res = solve_graph_parametric(fg, options=GNOptions(max_iters=100))
    assert res["stats"].converged

    x1 = fg.variables["x1"].points["parametric"]
    # attitude: slow z-rotation of 0.001 rad/s over 1 s
    R1 = _np(Q.qto_matrix(jnp.asarray(np.asarray(x1[:4], np.float64))))
    th = 0.001
    c, s = np.cos(th), np.sin(th)
    np.testing.assert_allclose(R1, [[c, -s, 0], [s, c, 0], [0, 0, 1]], atol=1e-4)
    # velocity: gravity (9.81 down) vs 8.81 measured up => net -1 m/s in z
    np.testing.assert_allclose(x1[4:7], [10, 0, -1], atol=1e-3)
    # position: 10 m/s * 1 s along x, -0.5 m in z
    np.testing.assert_allclose(x1[7:10], [10, 0, -0.5], atol=1e-3)
