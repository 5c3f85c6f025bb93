"""Camera projection tests (reference: test/testGenericProjection.jl,
RoMECameraModelsExt.jl behaviors).
"""

import numpy as np
import pytest

from rome_tpu import FactorGraph, MvNormal, Point3, Pose3, PriorPose3, solve_graph_parametric, GNOptions
from rome_tpu.vision import (
    CameraCalibration,
    CameraExtrinsic,
    CameraIntrinsic,
    CameraModelFull,
    GenericProjection,
    camera_residual,
    project,
    solve_multiview_landmark,
)
from rome_tpu.manifolds import quat as Q


def _pose3(t, q=(1.0, 0, 0, 0)):
    return np.concatenate([np.asarray(t, np.float64), np.asarray(q, np.float64)])


def _project_np(cam, pose, point):
    import jax.numpy as jnp

    R = np.asarray(Q.qto_matrix(jnp.asarray(pose[3:7])))
    c = R.T @ (np.asarray(point) - pose[:3])
    uvw = cam.K @ c
    return uvw[:2] / uvw[2], c[2]


def test_legacy_pinhole_project():
    cm = CameraModelFull()
    px = project(cm, [0, 0, 2.0])
    np.testing.assert_allclose(px, [320, 240])  # principal point
    r = camera_residual([330.0, 240.0], cm.ci, cm.ce, [0, 0, 2.0])
    np.testing.assert_allclose(r, [10.0, 0.0])


def test_generic_projection_factor_solve():
    """Two camera poses triangulate a Point3 through the factor graph."""
    cam = CameraCalibration()
    truth = np.array([1.0, 0.5, 5.0])
    p0 = _pose3([0, 0, 0])
    p1 = _pose3([2.0, 0, 0])
    z0, d0 = _project_np(cam, p0, truth)
    z1, d1 = _project_np(cam, p1, truth)
    assert d0 > 0 and d1 > 0

    fg = FactorGraph()
    fg.params.graphinit = False
    fg.add_variable("x0", Pose3)
    fg.add_variable("x1", Pose3)
    fg.add_variable("l1", Point3)
    fg.add_factor(["x0"], PriorPose3(MvNormal(np.zeros(6), np.eye(6) * 1e-6)))
    fg.add_factor(
        ["x1"], PriorPose3(MvNormal([2, 0, 0, 0, 0, 0], np.eye(6) * 1e-6))
    )
    fg.add_factor(["x0", "l1"], GenericProjection(cam, MvNormal(z0, np.eye(2) * 1.0)))
    fg.add_factor(["x1", "l1"], GenericProjection(cam, MvNormal(z1, np.eye(2) * 1.0)))
    fg.init_all()
    fg.set_point("l1", [0.5, 0.2, 3.0])
    res = solve_graph_parametric(fg, options=GNOptions(max_iters=200))
    assert res["stats"].converged
    np.testing.assert_allclose(fg.get_coords("l1"), truth, atol=1e-2)


def test_solve_multiview_landmark():
    cam = CameraCalibration()
    truth = np.array([1.0, -0.5, 6.0])
    poses = [_pose3([0, 0, 0]), _pose3([2, 0, 0]), _pose3([0, 2, 0])]

    fg = FactorGraph()
    fg.params.graphinit = False
    fg.add_variable("l7", Point3)
    for i, p in enumerate(poses):
        fg.add_variable(f"x{i}", Pose3)
        fg.set_point(f"x{i}", p)
        z, d = _project_np(cam, p, truth)
        assert d > 0
        fg.add_factor(
            [f"x{i}", "l7"], GenericProjection(cam, MvNormal(z, np.eye(2)))
        )
    fg.set_point("l7", [0.0, 0.0, 1.0])
    w_P3 = solve_multiview_landmark(fg, "l7", cam=cam, retry=32, seed=1)
    np.testing.assert_allclose(w_P3, truth, atol=1e-2)
    # result written back into the graph
    np.testing.assert_allclose(fg.get_coords("l7"), truth, atol=1e-2)


def test_solve_multiview_no_factors():
    fg = FactorGraph()
    fg.add_variable("l1", Point3)
    with pytest.raises(ValueError, match="GenericProjection"):
        solve_multiview_landmark(fg, "l1")


def test_calibration_from_dict_and_undistort():
    d = {"height": 480, "width": 640, "K": np.eye(3).ravel().tolist(), "kc": [0] * 5}
    c = CameraCalibration.from_dict(d)
    assert c.fx == 1.0 and c.cx == 0.0
    c2 = CameraCalibration()
    np.testing.assert_allclose(c2.undistort_point([100.0, 200.0]), [100, 200])
