"""Velocity-augmented 2D factor tests mirroring the reference fixtures
(/root/reference/test/testDynPoint2D.jl, testDynPose2D.jl).
"""

import numpy as np

from rome_tpu import (
    DynPoint2,
    DynPoint2DynPoint2,
    DynPoint2VelocityPrior,
    DynPose2,
    DynPose2DynPose2,
    DynPose2Pose2,
    DynPose2VelocityPrior,
    FactorGraph,
    GNOptions,
    MvNormal,
    Point2Point2Velocity,
    Pose2,
    VelPoint2VelPoint2,
    VelPose2VelPose2,
    solve_graph_parametric,
)
from rome_tpu.utils.math import sym_rem

SEC = 1_000_000_000


def test_dynpoint2_chain():
    """testDynPoint2D.jl:11-49 — prior vel (10,10), delta (10,10) over 1 s
    => x1 at (20,20) with vel (10,10)."""
    fg = FactorGraph()
    fg.add_variable("x0", DynPoint2, timestamp_ns=0)
    fg.add_variable("x1", DynPoint2, timestamp_ns=SEC)
    fg.add_factor(
        ["x0"], DynPoint2VelocityPrior(MvNormal([0, 0, 10, 10], np.eye(4) * 0.1))
    )
    fg.add_factor(
        ["x0", "x1"], DynPoint2DynPoint2(MvNormal([10, 10, 0, 0], np.eye(4) * 0.1))
    )
    fg.init_all()
    res = solve_graph_parametric(fg)
    assert res["stats"].converged
    x0 = fg.get_coords("x0")
    x1 = fg.get_coords("x1")
    np.testing.assert_allclose(x0, [0, 0, 10, 10], atol=1e-3)
    np.testing.assert_allclose(x1, [20, 20, 10, 10], atol=1e-3)


def test_velpoint2_chain():
    """VelPoint2VelPoint2 over three 1 s steps of constant +x velocity."""
    fg = FactorGraph()
    for k in range(4):
        fg.add_variable(f"x{k}", DynPoint2, timestamp_ns=k * SEC)
    fg.add_factor(
        ["x0"], DynPoint2VelocityPrior(MvNormal([0, 0, 1, 0], np.eye(4) * 0.01))
    )
    for k in range(3):
        fg.add_factor(
            [f"x{k}", f"x{k+1}"],
            VelPoint2VelPoint2(MvNormal([1, 0, 0, 0], np.eye(4) * 0.01)),
        )
    fg.init_all()
    res = solve_graph_parametric(fg, options=GNOptions(max_iters=200))
    assert res["stats"].converged
    x3 = fg.get_coords("x3")
    np.testing.assert_allclose(x3[:2], [3, 0], atol=0.05)
    np.testing.assert_allclose(x3[2:4], [1, 0], atol=0.05)


def test_point2point2velocity_midpoint():
    """Midpoint integration: measured dp couples to mean velocity."""
    fg = FactorGraph()
    fg.add_variable("x0", DynPoint2, timestamp_ns=0)
    fg.add_variable("x1", DynPoint2, timestamp_ns=2 * SEC)
    fg.add_factor(
        ["x0"], DynPoint2VelocityPrior(MvNormal([0, 0, 1, 0], np.eye(4) * 0.01))
    )
    fg.add_factor(
        ["x0", "x1"],
        Point2Point2Velocity(MvNormal([2, 0, 0, 0], np.eye(4) * 0.01)),
    )
    fg.init_all()
    res = solve_graph_parametric(fg, options=GNOptions(max_iters=200))
    assert res["stats"].converged
    x1 = fg.get_coords("x1")
    # dp = (2,0) over 2 s, so 0.5*(v0+v1) = (1,0) => v1 = (1,0)
    np.testing.assert_allclose(x1[:2], [2, 0], atol=0.05)
    np.testing.assert_allclose(x1[2:4], [1, 0], atol=0.1)


def test_dynpose2_velpose2():
    """testDynPose2D.jl:7-46 — prior vel (10,0), VelPose2VelPose2 odo (10,0,0)
    over 1 s => x1 at (10,0,0) with vel (10,0)."""
    fg = FactorGraph()
    fg.add_variable("x0", DynPose2, timestamp_ns=0)
    fg.add_variable("x1", DynPose2, timestamp_ns=SEC)
    fg.add_factor(
        ["x0"],
        DynPose2VelocityPrior(
            MvNormal(np.zeros(3), np.diag([0.01, 0.01, 0.001]) ** 2),
            MvNormal([10.0, 0], np.diag([0.1, 0.1]) ** 2),
        ),
    )
    fg.add_factor(
        ["x0", "x1"],
        VelPose2VelPose2(
            MvNormal([10.0, 0, 0], np.diag([0.01, 0.01, 0.001]) ** 2),
            MvNormal([0.0, 0], np.diag([0.1, 0.1]) ** 2),
        ),
    )
    fg.init_all()
    res = solve_graph_parametric(fg, options=GNOptions(max_iters=300))
    assert res["stats"].converged
    x1 = fg.get_coords("x1")
    np.testing.assert_allclose(x1[0], 10.0, atol=0.75)
    np.testing.assert_allclose(x1[1], 0.0, atol=0.75)
    assert abs(sym_rem(x1[2])) < 0.25
    np.testing.assert_allclose(x1[3], 10.0, atol=0.5)
    np.testing.assert_allclose(x1[4], 0.0, atol=0.5)


def test_dynpose2pose2_partial():
    """DynPose2 -> Pose2 pose-only link (DynPose2D.jl:60-87)."""
    fg = FactorGraph()
    fg.add_variable("x0", DynPose2, timestamp_ns=0)
    fg.add_variable("p1", Pose2, timestamp_ns=SEC)
    fg.add_factor(
        ["x0"],
        DynPose2VelocityPrior(
            MvNormal([1.0, 2, 0.5], np.eye(3) * 0.001),
            MvNormal([3.0, 4], np.eye(2) * 0.01),
        ),
    )
    fg.add_factor(
        ["x0", "p1"], DynPose2Pose2(MvNormal([1.0, 0, 0], np.eye(3) * 0.001))
    )
    fg.init_all()
    res = solve_graph_parametric(fg)
    assert res["stats"].converged
    p1 = fg.get_coords("p1")
    c, s = np.cos(0.5), np.sin(0.5)
    np.testing.assert_allclose(p1, [1 + c, 2 + s, 0.5], atol=1e-3)
    # velocity stays at the prior (pose-only factor must not disturb it)
    np.testing.assert_allclose(fg.get_coords("x0")[3:5], [3, 4], atol=1e-3)


def test_dynpose2dynpose2_legacy():
    """Legacy SE2-coordinate dynamic odometry (DynPose2D.jl:144-172)."""
    fg = FactorGraph()
    fg.add_variable("x0", DynPose2, timestamp_ns=0)
    fg.add_variable("x1", DynPose2, timestamp_ns=SEC)
    fg.add_factor(
        ["x0"],
        DynPose2VelocityPrior(
            MvNormal(np.zeros(3), np.eye(3) * 0.001),
            MvNormal([2.0, 0], np.eye(2) * 0.01),
        ),
    )
    fg.add_factor(
        ["x0", "x1"],
        DynPose2DynPose2(MvNormal([1.0, 0, 0, 0, 0], np.eye(5) * 0.01)),
    )
    fg.init_all()
    res = solve_graph_parametric(fg, options=GNOptions(max_iters=200))
    assert res["stats"].converged
    x1 = fg.get_coords("x1")
    # wpj = p0 + dt*v0 + z12 = (0,0) + (2,0) + (1,0) = (3,0); vel unchanged
    np.testing.assert_allclose(x1[:2], [3, 0], atol=1e-2)
    np.testing.assert_allclose(x1[3:5], [2, 0], atol=1e-2)
