"""Nonparametric engine tests — mirrors the reference's statistical asserts:
single-factor convolutions (TestPoseAndPoint2Constraints.jl:36-42, donut
ring :97-105), small-graph solves with band checks
(testHexagonal2D_CliqByCliq.jl:30-79), multihypo/nullhypo behavior
(testMultimodalRangeBearing.jl, testPose3Pose3NH.jl)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rome_tpu import (
    FactorGraph,
    MvNormal,
    Normal,
    Point2,
    Pose2,
    Pose2Point2BearingRange,
    Pose2Point2Range,
    Pose2Pose2,
    PriorPoint2,
    PriorPose2,
)
from rome_tpu.manifolds.base import SE2_, T2
from rome_tpu.solvers.multimodal import (
    ManifoldKernelDensity,
    approx_conv,
    gibbs_product,
    init_all_beliefs,
    manifold_mean,
    solve_graph_nonparametric,
)
from rome_tpu.utils.math import sym_rem

KEY = jax.random.PRNGKey(0)


def test_kde_logpdf_and_sample():
    pts = jnp.asarray(np.random.default_rng(0).normal(0, 1.0, size=(200, 2)))
    kde = ManifoldKernelDensity.from_points(T2, pts)
    # density at center >> density far away
    assert float(kde.logpdf(jnp.zeros(2))) > float(kde.logpdf(jnp.array([10.0, 0.0])))
    s = kde.sample(KEY, 500)
    assert abs(float(jnp.mean(s))) < 0.3


def test_gibbs_product_gaussian_fusion():
    """Product of two Gaussian clouds = precision-weighted fusion (the
    parametric covariance-fusion identity, statistically)."""
    rng = np.random.default_rng(1)
    a = ManifoldKernelDensity.from_points(
        T2, jnp.asarray(rng.normal([0, 0], 0.5, size=(300, 2)))
    )
    b = ManifoldKernelDensity.from_points(
        T2, jnp.asarray(rng.normal([1, 0], 0.5, size=(300, 2)))
    )
    prod = gibbs_product(KEY, [a, b], n_out=300)
    mu = np.asarray(jnp.mean(prod, axis=0))
    np.testing.assert_allclose(mu, [0.5, 0.0], atol=0.12)
    # fused spread tighter than the components
    assert float(jnp.std(prod[:, 0])) < 0.5


@pytest.mark.slow
def test_approx_conv_odometry_projection():
    """Odometry projection mean on SE(2)
    (TestPoseAndPoint2Constraints.jl:36-42)."""
    fg = FactorGraph()
    fg.add_variable("x0", Pose2)
    fg.add_factor(["x0"], PriorPose2(MvNormal([1.0, 2.0, np.pi / 3], [0.01, 0.01, 0.01])))
    fg.add_variable("x1", Pose2)
    f = fg.add_factor(["x0", "x1"], Pose2Pose2(MvNormal([2.0, 0, 0.5], [0.05, 0.05, 0.05])))
    init_all_beliefs(fg, N=200)
    pts = approx_conv(fg, f.label, "x1", N=200)
    mu = np.asarray(manifold_mean(SE2_, pts))
    expect = np.asarray(SE2_.compose(np.array([1, 2, np.pi / 3]), np.array([2, 0, 0.5])))
    np.testing.assert_allclose(mu[:2], expect[:2], atol=0.15)
    assert abs(sym_rem(mu[2] - expect[2])) < 0.1


def test_approx_conv_range_donut():
    """Range-only convolution produces the solution ring
    (TestPoseAndPoint2Constraints.jl:97-105 'donut' support)."""
    fg = FactorGraph()
    fg.add_variable("x0", Pose2)
    fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.01, 0.01, 0.01])))
    fg.add_variable("l1", Point2)
    # spread the landmark belief wide so the ring can be found everywhere
    rng = np.random.default_rng(3)
    fg.variables["l1"].beliefs["default"] = jnp.asarray(rng.normal(0, 10, (300, 2)))
    fg.variables["l1"].initialized["default"] = True
    f = fg.add_factor(["x0", "l1"], Pose2Point2Range(Normal(10.0, 0.1)))
    init_all_beliefs(fg, N=300)
    pts = np.asarray(approx_conv(fg, f.label, "l1", N=300))
    radii = np.linalg.norm(pts, axis=1)
    # particles concentrate on the r=10 ring with wide angular support
    assert abs(np.median(radii) - 10.0) < 0.3
    assert np.std(radii) < 1.0
    angles = np.arctan2(pts[:, 1], pts[:, 0])
    assert np.std(angles) > 0.8  # ring, not a point


def test_bearing_range_landmark_init():
    fg = FactorGraph()
    fg.add_variable("x0", Pose2)
    fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.01, 0.01, 0.001])))
    fg.add_variable("l1", Point2)
    f = fg.add_factor(
        ["x0", "l1"], Pose2Point2BearingRange(Normal(np.pi / 4, 0.02), Normal(10.0, 0.1))
    )
    init_all_beliefs(fg, N=200)
    pts = np.asarray(fg.variables["l1"].beliefs["default"])
    expect = 10 * np.array([np.cos(np.pi / 4), np.sin(np.pi / 4)])
    np.testing.assert_allclose(pts.mean(0), expect, atol=0.5)


@pytest.mark.slow
def test_hexagonal_nonparametric_bands():
    """Full multimodal solve of the hexagonal fixture; band check per pose
    (testHexagonal2D_CliqByCliq.jl:38-79: >=35/100 particles within +-3 m,
    +-0.3 rad of ground truth)."""
    from rome_tpu.canonical.generators import generate_graph_hexagonal

    fg = generate_graph_hexagonal(N=100)
    solve_graph_nonparametric(fg, sweeps=3, N=100)
    for i in range(7):
        sim = fg.get_ppe(f"x{i}")
        pts = np.asarray(fg.variables[f"x{i}"].beliefs["default"])
        inband_x = np.sum(np.abs(pts[:, 0] - sim[0]) < 3.0)
        inband_y = np.sum(np.abs(pts[:, 1] - sim[1]) < 3.0)
        inband_t = np.sum(np.abs(np.vectorize(sym_rem)(pts[:, 2] - sim[2])) < 0.3)
        assert inband_x >= 35, (i, "x", inband_x)
        assert inband_y >= 35, (i, "y", inband_y)
        assert inband_t >= 35, (i, "theta", inband_t)
    lm = np.asarray(fg.variables["l1"].beliefs["default"])
    assert np.sum(np.linalg.norm(lm - np.array([20.0, 0]), axis=1) < 3.0) >= 35


@pytest.mark.slow
def test_nullhypo_keeps_prior_mass():
    """nullhypo=0.5: about half the particles ignore the factor
    (testPose3Pose3NH.jl:118 outlier-robustness semantics)."""
    fg = FactorGraph()
    fg.add_variable("x0", Pose2)
    fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.01, 0.01, 0.01])))
    fg.add_variable("l1", Point2)
    fg.add_factor(["l1"], PriorPoint2(MvNormal([0.0, 0.0], [3.0, 3.0])), graphinit=False)
    f = fg.add_factor(
        ["x0", "l1"],
        Pose2Point2BearingRange(Normal(0.0, 0.01), Normal(20.0, 0.1)),
        nullhypo=0.5,
        graphinit=False,
    )
    init_all_beliefs(fg, N=400)
    pts = np.asarray(approx_conv(fg, f.label, "l1", N=400))
    d_meas = np.linalg.norm(pts - np.array([20.0, 0.0]), axis=1)
    frac_at_meas = np.mean(d_meas < 2.0)
    assert 0.25 < frac_at_meas < 0.75


def test_multihypo_splits_association():
    """multihypo=[1.0, 0.5, 0.5]: association splits between candidate
    landmarks (testMultimodalRangeBearing.jl:53-135 semantics)."""
    fg = FactorGraph()
    fg.params.graphinit = False
    fg.add_variable("x0", Pose2)
    fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.01, 0.01, 0.001])), graphinit=True)
    fg.add_variable("l1", Point2)
    fg.add_variable("l2", Point2)
    fg.add_factor(["l1"], PriorPoint2(MvNormal([20.0, 2.0], [0.5, 0.5])))
    fg.add_factor(["l2"], PriorPoint2(MvNormal([20.0, -2.0], [0.5, 0.5])))
    f = fg.add_factor(
        ["x0", "l1", "l2"],
        Pose2Point2BearingRange(Normal(0.0, 0.02), Normal(20.0, 0.1)),
        multihypo=[1.0, 0.5, 0.5],
    )
    init_all_beliefs(fg, N=400)
    # conv toward l1: roughly half the particles take the measurement, half
    # keep the prior spread
    pts = np.asarray(approx_conv(fg, f.label, "l1", N=400))
    at_meas = np.mean(np.linalg.norm(pts - np.array([20.0, 0.0]), axis=1) < 1.5)
    assert 0.2 < at_meas < 0.8
    # conv toward the pose: bimodal in heading/position is fine; just check
    # finite and the right shape
    pts_pose = np.asarray(approx_conv(fg, f.label, "x0", N=400))
    assert pts_pose.shape == (400, 3) and np.all(np.isfinite(pts_pose))
