"""Front-end runtime tests: odometry accumulation / dead-reckon tether
(testDeadReckoningTether.jl analogue) and the async solve manager."""

import time

import numpy as np

from rome_tpu import FactorGraph, MvNormal, Pose2, Pose2Pose2, PriorPose2
from rome_tpu.factors.pose2 import MutablePose2Pose2Gaussian
from rome_tpu.frontend.odometry import (
    accumulate_discrete_local_frame,
    add_odo_fg,
    duplicate_to_standard_factor_variable,
    extract_delta_odo,
    reset_factor,
    trigger_pose,
)
from rome_tpu.frontend.robot_utils import (
    fifo_freeze,
    get_2d_pose_means,
    get_last_poses,
    init_factor_graph,
    set_solvable_old_poses,
)
from rome_tpu.frontend.slam import (
    SLAMWrapperLocal,
    check_solve_stride_trigger,
    manage_solve_tree,
    stop_manage_solve_tree,
)
from rome_tpu.manifolds.base import SE2_


def test_accumulate_discrete_local_frame():
    """Accumulated mean equals the SE(2) composition of the increments;
    covariance grows (testDeadReckoningTether.jl:40-80 semantics)."""
    mpp = MutablePose2Pose2Gaussian()
    reset_factor(mpp)
    Qc = np.diag([1e-4, 1e-4, 1e-5])
    DX = np.array([0.1, 0.0, 0.05])
    expect = np.zeros(3)
    for _ in range(10):
        accumulate_discrete_local_frame(mpp, DX, Qc, dt=0.1)
        expect = np.asarray(SE2_.compose(expect, DX))
    np.testing.assert_allclose(mpp.params["z"], expect, atol=1e-5)
    cov = mpp.dists[0].cov()
    assert np.all(np.linalg.eigvalsh(cov) > 0)
    assert cov[0, 0] > 1e-6  # grew beyond the reset value


def test_dead_reckon_tether_duplicate():
    """DRT: high-rate accumulation into a mutable factor hanging off the
    latest pose, snapshot into solvable graph (OdometryUtils.jl:67-86)."""
    fg, _ = init_factor_graph()
    fg.init_all()
    mpp = MutablePose2Pose2Gaussian()
    reset_factor(mpp)
    # drt variable stays solvable=0 like :deadreckon_x0
    fg.add_variable("deadreckon_x0", Pose2, solvable=0)
    fg.add_factor(["x0", "deadreckon_x0"], mpp, solvable=0, graphinit=False)

    Qc = np.diag([1e-4, 1e-4, 1e-5])
    for _ in range(5):
        accumulate_discrete_local_frame(mpp, [0.2, 0.0, 0.1], Qc)
    flabel = duplicate_to_standard_factor_variable(mpp, fg, "x0", "x1")
    assert "x1" in fg.variables
    f = fg.factors[flabel]
    np.testing.assert_allclose(f.params["z"], mpp.params["z"], atol=1e-12)
    # original mutable factor untouched
    assert mpp.label != flabel
    # drt variable still unsolvable
    assert fg.variables["deadreckon_x0"].solvable == 0


def test_extract_delta_odo_roundtrip():
    th = np.cumsum(np.full(20, 0.1))
    xx = np.cumsum(np.cos(th))
    yy = np.cumsum(np.sin(th))
    DX = extract_delta_odo(xx, yy, th)
    # re-integrate
    p = np.array([xx[0], yy[0], th[0]])
    for i in range(1, 20):
        p = np.asarray(SE2_.compose(p, DX[:, i]))
    np.testing.assert_allclose(p, [xx[-1], yy[-1], th[-1]], atol=1e-4)


def test_trigger_pose():
    assert trigger_pose([1.0, 0, 0], [0, 0, 0], 0.5, 0.3)
    assert not trigger_pose([0.1, 0, 0.1], [0, 0, 0], 0.5, 0.3)
    assert trigger_pose([0, 0, 0.5], [0, 0, 0], 0.5, 0.3)


def test_add_odo_fg_and_last_poses():
    fg, _ = init_factor_graph()
    for i in range(4):
        add_odo_fg(fg, Pose2Pose2(MvNormal([1, 0, 0], [0.1, 0.1, 0.1])))
    assert len(fg.ls(r"^x\d+$")) == 5
    last = get_last_poses(fg, number=2)
    assert len(last) == 2


def test_fixed_lag_freeze_and_means():
    fg, _ = init_factor_graph()
    for i in range(9):
        add_odo_fg(fg, Pose2Pose2(MvNormal([1, 0, 0], [0.01, 0.01, 0.01])))
    frozen = set_solvable_old_poses(fg, youngest=3)
    assert len(frozen) == 7  # 10 poses, keep 3 young
    assert fg.variables["x0"].solvable == 0
    assert fg.variables["x9"].solvable == 1
    from rome_tpu import solve_graph_parametric

    fg.init_all()
    before = fg.get_point("x2").copy()
    solve_graph_parametric(fg, init=False)
    np.testing.assert_array_equal(fg.get_point("x2"), before)
    means = get_2d_pose_means(fg)
    assert len(means) == 10


def test_manage_solve_tree_loop():
    """Producer/consumer live loop: stride-triggered async solves
    (Slam.jl:189-297 semantics)."""
    slam = SLAMWrapperLocal()
    slam.solve_settings.solve_stride = 4
    fg = slam.dfg
    fg.params.graphinit = True
    init_factor_graph(fg)
    th = manage_solve_tree(slam, disengage_youngest=100)
    try:
        for i in range(8):
            new = add_odo_fg(
                fg, Pose2Pose2(MvNormal([1, 0, 0], [0.01, 0.01, 0.01])), solvable=0
            )
            slam.pose_count += 1
            slam.solve_settings.solvables.put([new])
            check_solve_stride_trigger(slam)
        t0 = time.time()
        while slam.solve_count < 1 and time.time() - t0 < 60:
            time.sleep(0.05)
    finally:
        stop_manage_solve_tree(slam)
        th.join(timeout=10)
    assert slam.solve_count >= 1
    assert len(slam.timing_log) >= 1
    row = slam.timing_log[0]
    assert {"dt_wait", "dt_init", "dt_disengage", "dt_solve"} <= set(row)
    # solvables were engaged by the manager
    assert fg.variables["x8"].solvable in (0, 1)
    assert "parametric" in fg.variables["x1"].points


def test_fifo_freeze_param():
    fg, _ = init_factor_graph()
    fg.params.qfl = 2
    for i in range(5):
        add_odo_fg(fg, Pose2Pose2(MvNormal([1, 0, 0], [0.01, 0.01, 0.01])))
    frozen = fifo_freeze(fg)
    assert len(frozen) == 4
