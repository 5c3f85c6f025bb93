"""Sensor factor tests (reference: test/testDidsonFunctions.jl,
testMultipleFeatures2D-style usage, RangeAzimuthElevation.jl).
"""

import numpy as np

from rome_tpu import (
    FactorGraph,
    GNOptions,
    LinearRangeBearingElevation,
    MultipleFeatures2D,
    MvNormal,
    Point2,
    Point3,
    Pose2,
    Pose3,
    PriorPoint2,
    PriorPose2,
    PriorPose3,
    RangeAzimuthElevation,
    range_azimuth_elevation,
    solve_graph_parametric,
)


def test_lrbe_solve_landmark():
    """Pose at origin, landmark measured at range 5 dead ahead and 30 deg
    bearing: landmark lands at (5cos30, 5sin30, 0)."""
    fg = FactorGraph()
    fg.params.graphinit = False
    fg.add_variable("x0", Pose3)
    fg.add_variable("l1", Point3)
    fg.add_factor(["x0"], PriorPose3(MvNormal(np.zeros(6), np.eye(6) * 1e-6)))
    fg.add_factor(
        ["x0", "l1"],
        LinearRangeBearingElevation((5.0, 0.05), (np.pi / 6, 0.01)),
    )
    fg.init_all()
    fg.set_point("l1", [1.0, 1.0, 0.0])  # rough init
    res = solve_graph_parametric(fg, options=GNOptions(max_iters=200))
    assert res["stats"].converged
    l1 = fg.get_coords("l1")
    np.testing.assert_allclose(
        l1[:2], [5 * np.cos(np.pi / 6), 5 * np.sin(np.pi / 6)], atol=1e-2
    )
    np.testing.assert_allclose(l1[2], 0.0, atol=1e-2)


def test_multiplefeatures2d_pose_recovery():
    """Two poses sight three known landmarks; the second pose's bearing set
    pins its position and yaw."""
    lms = {"l1": [5.0, 5.0], "l2": [10.0, 0.0], "l3": [5.0, -5.0]}
    xj_true = np.array([2.0, 1.0, 0.3])

    def ang(pose, lm):
        d = np.asarray(lm) - pose[:2]
        return np.arctan2(d[1], d[0]) - pose[2]

    xi = np.zeros(3)
    meas = [ang(xi, lms[k]) for k in ("l1", "l2", "l3")] + [
        ang(xj_true, lms[k]) for k in ("l1", "l2", "l3")
    ]

    fg = FactorGraph()
    fg.params.graphinit = False
    fg.add_variable("xi", Pose2)
    fg.add_variable("xj", Pose2)
    for k, v in lms.items():
        fg.add_variable(k, Point2)
        fg.add_factor([k], PriorPoint2(MvNormal(v, np.eye(2) * 1e-6)))
    fg.add_factor(["xi"], PriorPose2(MvNormal(np.zeros(3), np.eye(3) * 1e-6)))
    fg.add_factor(
        ["xi", "xj", "l1", "l2", "l3"],
        MultipleFeatures2D(*[(m, 0.01) for m in meas]),
    )
    fg.init_all()
    fg.set_point("xj", [1.0, 0.0, 0.0])
    res = solve_graph_parametric(fg, options=GNOptions(max_iters=300))
    assert res["stats"].converged
    # bearings leave range along rays ambiguous per landmark, but three rays
    # from known landmarks triangulate the pose
    xj = fg.get_coords("xj")
    np.testing.assert_allclose(xj, xj_true, atol=0.05)


def test_range_azimuth_elevation_conversion():
    p = np.concatenate([[0.0, 0, 0], [1.0, 0, 0, 0]])  # identity Pose3
    rae = range_azimuth_elevation(p, [3.0, 4.0, 0.0])
    np.testing.assert_allclose(rae.range, 5.0, atol=1e-6)
    np.testing.assert_allclose(rae.azimuth, np.arctan2(4, 3), atol=1e-6)
    np.testing.assert_allclose(rae.elevation, 0.0, atol=1e-6)

    r = RangeAzimuthElevation.from_tuple((":rangeazimuth", [2.0, 0.5]))
    assert r.elevation is None and r.range == 2.0
    r = RangeAzimuthElevation.from_tuple((":rangeazimuthelevation", [2.0, 0.5, 0.1]))
    assert r.elevation == 0.1
