"""Partial Pose3 factor tests (reference: test/testPartialPose3.jl,
testPartialXYH.jl, testpartialpose3.jl fixtures).
"""

import numpy as np
import jax.numpy as jnp

from rome_tpu import (
    FactorGraph,
    GNOptions,
    MvNormal,
    Normal,
    Pose3,
    Pose3Pose3Rotation,
    Pose3Pose3XYYaw,
    PriorPose3,
    PriorPose3ZRP,
    solve_graph_parametric,
)
from rome_tpu.manifolds import quat as Q


def test_prior_pose3zrp_fusion():
    """testPartialPose3.jl:33-67 — full prior (z=9, wx=0.1) fuses with ZRP
    partial (z=11, wx=-0.1) at equal sigmas to z=10, wx=0."""
    fg = FactorGraph()
    fg.params.graphinit = False
    fg.add_variable("x1", Pose3)
    fg.add_factor(
        ["x1"],
        PriorPose3(
            MvNormal(
                [0.0, 5.0, 9.0, 0.1, 0.0, np.pi / 2],
                np.diag([1, 1, 1, 0.1, 0.1, 0.1]) ** 2,
            )
        ),
    )
    fg.add_factor(
        ["x1"],
        PriorPose3ZRP(
            Normal(11.0, 1.0), MvNormal([-0.1, 0.0], np.diag([0.1, 0.1]) ** 2)
        ),
    )
    fg.init_all()
    res = solve_graph_parametric(fg, options=GNOptions(max_iters=200))
    assert res["stats"].converged
    c = fg.get_coords("x1")
    # reference asserts atol 1.5 / 0.3 on the sampled solve
    # (testPartialPose3.jl:63-64); the parametric MAP lands within 0.05
    # (the two priors use different tangent charts, so the fuse is not exact)
    np.testing.assert_allclose(c[:3], [0, 5, 10], atol=0.05)
    np.testing.assert_allclose(c[3:6], [0, 0, np.pi / 2], atol=0.05)


def test_pose3pose3xyyaw():
    """SE(2)-projected partial between Pose3s (PartialPose3.jl:101-136):
    constrain xy+yaw of x1; z/roll/pitch stay at init."""
    fg = FactorGraph()
    fg.params.graphinit = False
    fg.add_variable("x0", Pose3)
    fg.add_variable("x1", Pose3)
    fg.add_factor(
        ["x0"], PriorPose3(MvNormal(np.zeros(6), np.eye(6) * 1e-4))
    )
    fg.add_factor(
        ["x0", "x1"],
        Pose3Pose3XYYaw(
            MvNormal([1.0, 2.0, np.pi / 2], np.diag([0.01, 0.01, 0.001]))
        ),
    )
    fg.init_all()
    res = solve_graph_parametric(fg, options=GNOptions(max_iters=200))
    assert res["stats"].converged
    c1 = fg.get_coords("x1")
    np.testing.assert_allclose(c1[0], 1.0, atol=1e-2)
    np.testing.assert_allclose(c1[1], 2.0, atol=1e-2)
    # yaw of x1
    x1 = fg.variables["x1"].points["parametric"]
    R = np.asarray(Q.qto_matrix(jnp.asarray(np.asarray(x1[3:7], np.float32))))
    yaw = np.arctan2(R[1, 0], R[0, 0])
    np.testing.assert_allclose(yaw, np.pi / 2, atol=1e-2)
    # unconstrained dims remain at initialization (gauge freedom under LM)
    np.testing.assert_allclose(c1[2], 0.0, atol=1e-2)


def test_pose3pose3rotation():
    """Rotation-only partial (PartialPose3.jl:204-227)."""
    fg = FactorGraph()
    fg.params.graphinit = False
    fg.add_variable("x0", Pose3)
    fg.add_variable("x1", Pose3)
    fg.add_factor(["x0"], PriorPose3(MvNormal(np.zeros(6), np.eye(6) * 1e-4)))
    fg.add_factor(
        ["x0", "x1"],
        Pose3Pose3Rotation(MvNormal([0, 0, np.pi / 4], np.eye(3) * 1e-3)),
    )
    fg.init_all()
    res = solve_graph_parametric(fg, options=GNOptions(max_iters=200))
    assert res["stats"].converged
    c1 = fg.get_coords("x1")
    np.testing.assert_allclose(c1[3:6], [0, 0, np.pi / 4], atol=1e-3)
    # translation unconstrained -> stays at init
    np.testing.assert_allclose(c1[:3], [0, 0, 0], atol=1e-2)
