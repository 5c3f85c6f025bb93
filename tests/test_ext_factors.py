"""Extension factor tests: InertialDynamic ODE factor, NN mixture odometry,
legacy InertialPose3 (reference: test/testInertialDynamic.jl,
testFluxModelsPose2.jl, testInertialPose3.jl fixtures).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rome_tpu import (
    FactorGraph,
    GNOptions,
    InertialDynamic,
    InertialPose3,
    InertialPose3V,
    MixtureFluxPose2Pose2,
    MvNormal,
    Pose2,
    Pose2Pose2,
    PriorInertialPose3,
    PriorPose2,
    PriorRotVelPos,
    RotVelPos,
    build_pose2_odo_nn_01,
    calc_velocity_inter_pose2,
    pose2_odo_nn_forward,
    solve_graph_parametric,
)
from rome_tpu.canonical.inertial_sim import generate_field_inertial_measurement_noise
from rome_tpu.factors.inertial import IMUDeltaFactor
from rome_tpu.manifolds import quat as Q


# ----------------------------- InertialDynamic ------------------------------

@pytest.mark.slow
def test_inertial_dynamic_matches_imudelta():
    """testInertialDynamic.jl duplicates the IMUDeltaFactor fixture
    (testIMUDeltaFactor.jl:168-212): both formulations must land x1 at the
    same state."""
    dt, N = 0.1, 10
    imu = generate_field_inertial_measurement_noise(
        dt=dt, N=N, rate=(0, 0, 0.001), accel0=(0, 0, 9.81 - 1),
        sigma_a=1e-4, sigma_w=np.deg2rad(0.0001),
    )

    def solve_with(fac):
        fg = FactorGraph()
        fg.params.graphinit = False
        fg.add_variable("x0", RotVelPos)
        fg.add_variable("x1", RotVelPos)
        z0 = np.zeros(9)
        z0[3:6] = [10, 0, 0]
        fg.add_factor(["x0"], PriorRotVelPos(MvNormal(z0, np.eye(9) * 1e-3)))
        fg.add_factor(["x0", "x1"], fac)
        fg.init_all()
        res = solve_graph_parametric(fg, options=GNOptions(max_iters=150))
        assert res["stats"].converged
        return fg.variables["x1"].points["parametric"]

    x1_ode = solve_with(
        InertialDynamic((0.0, dt * N), dt, imu.gyros, imu.accels)
    )
    x1_pre = solve_with(
        IMUDeltaFactor(imu.accels, imu.gyros, np.ones(N) * dt, imu.Sigma_y)
    )
    np.testing.assert_allclose(x1_ode[4:7], x1_pre[4:7], atol=0.02)   # vel
    np.testing.assert_allclose(x1_ode[7:10], x1_pre[7:10], atol=0.02)  # pos
    np.testing.assert_allclose(x1_ode[:4], x1_pre[:4], atol=1e-3)      # quat
    # absolute values from the reference fixture
    np.testing.assert_allclose(x1_ode[4:7], [10, 0, -1], atol=0.02)
    np.testing.assert_allclose(x1_ode[7:10], [10, 0, -0.5], atol=0.02)


def test_inertial_dynamic_initializer():
    """Closed-form forward/backward inits propagate the ODE flow."""
    dt, N = 0.05, 8
    gyros = np.zeros((N, 3))
    accels = np.tile([0, 0, 9.81], (N, 1))
    fac = InertialDynamic((0.0, dt * N), dt, gyros, accels)
    x0 = np.concatenate([[1, 0, 0, 0], [0, 0, 0], [0, 0, 0.0]])
    x1 = np.asarray(fac.ftype.initializers[1](fac.params, [x0, None]))
    np.testing.assert_allclose(x1[4:7], [0, 0, 0], atol=1e-5)  # hover
    np.testing.assert_allclose(x1[7:10], [0, 0, 0], atol=1e-5)


# --------------------------- MixtureFluxPose2Pose2 --------------------------

def test_nn_forward_and_factor():
    rng = np.random.default_rng(0)
    nn = build_pose2_odo_nn_01(
        rng.normal(size=(4, 8)) * 0.1,
        rng.normal(size=8) * 0.1,
        rng.normal(size=(8, 48)) * 0.1,
        rng.normal(size=8) * 0.1,
        rng.normal(size=(2, 8)) * 0.1,
        np.array([1.0, 0.0]),
    )
    data = rng.normal(size=(25, 4))
    out = np.asarray(
        pose2_odo_nn_forward(
            {k: jnp.asarray(v, jnp.float32) for k, v in nn.items()},
            jnp.asarray(data, jnp.float32),
        )
    )
    assert out.shape == (3,)
    assert out[2] == 0.0  # theta padded to zero
    assert np.all(np.isfinite(out))

    fac = MixtureFluxPose2Pose2(
        nn, data, [MvNormal([1.0, 0, 0], np.eye(3) * 0.01)], (0.5, 0.5), DT=1.0
    )
    assert fac.ftype.name == "Pose2Pose2"  # residual is the Pose2Pose2 kernel
    # mixture sampling draws from both components
    s = np.asarray(fac.dists[0].sample(jax.random.PRNGKey(1), 400))
    assert s.shape == (400, 3)
    # velocity feature construction writes columns 3:4 in the body frame
    calc_velocity_inter_pose2(fac, [0, 0, np.pi / 2], [0, 2, np.pi / 2])
    nn_comp = fac.dists[0].components[0]
    np.testing.assert_allclose(nn_comp.data[0, 2:4], [2.0, 0.0], atol=1e-9)


def test_fluxmix_solves_in_graph():
    nn = build_pose2_odo_nn_01(b3=np.array([1.0, 0.0]))  # predicts (1, 0, 0)
    fac = MixtureFluxPose2Pose2(
        nn, np.zeros((25, 4)), [MvNormal([1.0, 0, 0], np.eye(3) * 0.01)],
        (0.5, 0.5), DT=1.0,
    )
    fg = FactorGraph()
    fg.add_variable("x0", Pose2)
    fg.add_variable("x1", Pose2)
    fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], np.eye(3) * 1e-4)))
    fg.add_factor(["x0", "x1"], fac)
    fg.init_all()
    res = solve_graph_parametric(fg)
    assert res["stats"].converged
    np.testing.assert_allclose(fg.get_coords("x1"), [1, 0, 0], atol=0.05)


# ------------------------------ InertialPose3 -------------------------------

def test_inertialpose3_freefall_zero_residual():
    """Free fall with zero IMU deltas: gravity-compensated prediction equals
    the zero preintegral, residual vanishes (eq 4.21 structure)."""
    import jax.numpy as jnp

    Dt = 0.5
    fac = InertialPose3(
        MvNormal(np.zeros(15), np.eye(15) * 0.01),
        dict(rRp=np.eye(3), rPosp=np.zeros(3), rVelp=np.zeros(3),
             pBw=np.zeros(3), pBa=np.zeros(3), dt=Dt),
    )
    posei = np.zeros(15)
    posej = np.zeros(15)
    posej[6:9] = [0, 0, -9.81 * Dt]            # vel after free fall
    posej[0:3] = [0, 0, -0.5 * 9.81 * Dt**2]   # pos after free fall
    r = np.asarray(
        fac.ftype.residual(
            {k: jnp.asarray(np.asarray(v, np.float32)) for k, v in fac.params.items()},
            jnp.asarray(posei, jnp.float32),
            jnp.asarray(posej, jnp.float32),
        )
    )
    np.testing.assert_allclose(r, np.zeros(15), atol=1e-4)


def test_inertialpose3_graph_solve():
    Dt = 0.5
    fac = InertialPose3(
        MvNormal(np.zeros(15), np.eye(15) * 0.01),
        dict(rRp=np.eye(3), rPosp=np.zeros(3), rVelp=np.zeros(3),
             pBw=np.zeros(3), pBa=np.zeros(3), dt=Dt),
    )
    fg = FactorGraph()
    fg.params.graphinit = False
    fg.add_variable("x0", InertialPose3V)
    fg.add_variable("x1", InertialPose3V)
    fg.add_factor(["x0"], PriorInertialPose3(MvNormal(np.zeros(15), np.eye(15) * 1e-4)))
    fg.add_factor(["x0", "x1"], fac)
    fg.init_all()
    res = solve_graph_parametric(fg, options=GNOptions(max_iters=200))
    assert res["stats"].converged
    x1 = fg.get_coords("x1")
    np.testing.assert_allclose(x1[6:9], [0, 0, -9.81 * Dt], atol=1e-2)
    np.testing.assert_allclose(x1[0:3], [0, 0, -0.5 * 9.81 * Dt**2], atol=1e-2)
