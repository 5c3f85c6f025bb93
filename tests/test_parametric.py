"""Parametric solver tests mirroring the reference's tight-tolerance fixtures
(/root/reference/test/testParametric.jl, testParametricCovariances.jl).
"""

import numpy as np
import pytest

from rome_tpu import (
    FactorGraph,
    GNOptions,
    MvNormal,
    Normal,
    Point2,
    Pose2,
    Pose2Pose2,
    Pose2Point2BearingRange,
    PriorPoint2,
    PriorPose2,
    solve_graph_parametric,
)
from rome_tpu.utils.math import sym_rem


def _square_graph():
    """testParametric.jl:18-41 — prior at (10,10,-pi+1e-5) + 4 odo legs of
    (10,0,pi/2) driving a square."""
    fg = FactorGraph()
    fg.add_variable("x0", Pose2)
    fg.add_factor(
        ["x0"], PriorPose2(MvNormal([10, 10, -np.pi + 1e-5], [0.1, 0.1, 0.05]))
    )
    for i in range(4):
        fg.add_variable(f"x{i+1}", Pose2)
        pp = Pose2Pose2(MvNormal([10.0, 0, np.pi / 2], [0.1, 0.1, 0.1]))
        fg.add_factor([f"x{i}", f"x{i+1}"], pp)
    return fg


@pytest.mark.slow
@pytest.mark.parametrize("linear", ["dense", "pcg"])
def test_parametric_square(linear):
    fg = _square_graph()
    res = solve_graph_parametric(fg, options=GNOptions(linear=linear))
    assert res["stats"].converged

    # expected poses from testParametric.jl:49-53
    expected = {
        "x0": [10, 10, -np.pi],
        "x1": [0, 10, -np.pi / 2],
        "x2": [0, 0, 0],
        "x3": [10, 0, np.pi / 2],
        "x4": [10, 10, -np.pi],
    }
    for lbl, exp in expected.items():
        got = fg.get_coords(lbl)
        np.testing.assert_allclose(got[:2], exp[:2], atol=1e-3)
        assert abs(sym_rem(got[2] - exp[2])) < 1e-3, (lbl, got, exp)


def test_parametric_covariance_fusion():
    """testParametricCovariances.jl:33-55 — two PriorPoint2 beliefs fuse to
    the precision-weighted mean. Priors at (1,0) cov .1 and (1.1,0) cov .1
    => fused (1.05, 0)."""
    fg = FactorGraph()
    fg.add_variable("x0", Point2)
    fg.add_factor(["x0"], PriorPoint2(MvNormal([1.0, 0.0], np.diag([0.1, 0.1]))))
    fg.add_factor(["x0"], PriorPoint2(MvNormal([1.1, 0.0], np.diag([0.1, 0.1]))))
    res = solve_graph_parametric(fg, compute_covariances=True)
    np.testing.assert_allclose(fg.get_coords("x0"), [1.05, 0.0], atol=1e-4)
    # fused covariance = (S1^-1 + S2^-1)^-1 = 0.05 I
    np.testing.assert_allclose(
        res["covariances"]["x0"], 0.05 * np.eye(2), atol=1e-4
    )


def test_parametric_bearing_range_triangulation():
    """Landmark triangulated from two poses with bearing-range sightings
    (pattern of testParametric.jl:62-117)."""
    fg = FactorGraph()
    fg.add_variable("x0", Pose2)
    fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.01, 0.01, 0.001])))
    fg.add_variable("x1", Pose2)
    fg.add_factor(["x0", "x1"], Pose2Pose2(MvNormal([1.0, 0, 0], [0.1, 0.1, 0.1])))
    fg.add_variable("l1", Point2, tags=["LANDMARK"])
    # true landmark at (1, 1): from x0 bearing pi/4 range sqrt(2); from x1
    # bearing pi/2 range 1
    fg.add_factor(
        ["x0", "l1"],
        Pose2Point2BearingRange(Normal(np.pi / 4, 0.008), Normal(np.sqrt(2), 0.01)),
    )
    fg.add_factor(
        ["x1", "l1"], Pose2Point2BearingRange(Normal(np.pi / 2, 0.008), Normal(1.0, 0.01))
    )
    res = solve_graph_parametric(fg)
    assert res["stats"].converged
    np.testing.assert_allclose(fg.get_coords("x0"), [0, 0, 0], atol=1e-3)
    np.testing.assert_allclose(fg.get_coords("x1"), [1, 0, 0], atol=1e-3)
    np.testing.assert_allclose(fg.get_coords("l1"), [1, 1], atol=2e-3)


def test_pi_wrap_convergence():
    """+pi wrap handling — the reference flags optimizer trouble at ±pi
    (testParametric.jl:43-44); our tangent updates use sym_rem wrapping so a
    chain straddling the wrap must still converge."""
    fg = FactorGraph()
    fg.add_variable("x0", Pose2)
    fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, np.pi - 0.01], [0.01, 0.01, 0.01])))
    fg.add_variable("x1", Pose2)
    # rotate +0.02 rad across the wrap
    fg.add_factor(["x0", "x1"], Pose2Pose2(MvNormal([1, 0, 0.02], [0.05, 0.05, 0.01])))
    res = solve_graph_parametric(fg)
    assert res["stats"].converged
    got = fg.get_coords("x1")
    assert abs(sym_rem(got[2] - (-np.pi + 0.01))) < 1e-3


def test_gauge_freeze_without_prior():
    """A graph with no prior gets its first variable frozen as gauge."""
    fg = FactorGraph()
    fg.add_variable("x0", Pose2)
    fg.add_variable("x1", Pose2)
    fg.add_factor(["x0", "x1"], Pose2Pose2(MvNormal([1, 0, 0], [0.1, 0.1, 0.1])))
    res = solve_graph_parametric(fg)
    assert res["gauge_frozen"] == "x0"
    np.testing.assert_allclose(fg.get_coords("x1"), [1, 0, 0], atol=1e-4)


def test_solvable_frozen_variable_stays_fixed():
    """Fixed-lag freezing semantics (testFixedLagFG.jl:113-121): a
    solvable=0 variable is bit-stable across a solve."""
    fg = FactorGraph()
    fg.add_variable("x0", Pose2)
    fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.1])))
    fg.add_variable("x1", Pose2)
    fg.add_factor(["x0", "x1"], Pose2Pose2(MvNormal([2, 0, 0], [0.1, 0.1, 0.1])))
    fg.init_all()
    fg.set_point("x0", [0.5, 0.5, 0.1])
    fg.set_solvable("x0", 0)
    before = fg.get_point("x0").copy()
    solve_graph_parametric(fg, init=False)
    np.testing.assert_array_equal(fg.get_point("x0"), before)
    # x1 hangs off the frozen pose
    np.testing.assert_allclose(
        fg.get_coords("x1"),
        np.asarray(
            __import__("rome_tpu").manifolds.base.SE2_.compose(
                np.array([0.5, 0.5, 0.1]), np.array([2.0, 0, 0])
            )
        ),
        atol=1e-3,
    )


@pytest.mark.parametrize("schedule", ["host", "fused"])
def test_solve_host_matches_fused(schedule):
    """The host-scheduled LM loop reaches the same square-fixture optimum
    as the fused on-device loop."""
    fg = _square_graph()
    res = solve_graph_parametric(
        fg, options=GNOptions(linear="dense"), schedule=schedule
    )
    assert res["stats"].converged
    got = fg.get_coords("x4")
    np.testing.assert_allclose(got[:2], [10, 10], atol=1e-3)


def test_padded_lowering_matches_unpadded():
    """lower(pad=True) buckets shapes with weight-0/free-0 rows; the solve
    result must be identical to the unpadded solve."""
    fg1, fg2 = _square_graph(), _square_graph()
    r1 = solve_graph_parametric(fg1, options=GNOptions(linear="dense"))
    r2 = solve_graph_parametric(fg2, options=GNOptions(linear="dense"), pad=True)
    assert r2["stats"].converged
    for lbl in fg1.ls():
        np.testing.assert_allclose(
            fg1.get_coords(lbl), fg2.get_coords(lbl), atol=1e-4
        )


def test_padded_shapes_bucketed():
    from rome_tpu.graph.lower import bucket_size, lower

    fg = _square_graph()
    fg.init_all()
    ga = lower(fg, pad=True)
    assert ga.counts["Pose2"] == bucket_size(5)
    for b in ga.batches:
        n_real = len([l for l in b.labels if l])
        assert b.n == bucket_size(n_real)
        np.testing.assert_array_equal(np.asarray(b.weight[n_real:]), 0.0)
