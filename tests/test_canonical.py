"""Canonical generator + end-to-end fixture tests (reference:
testHexagonal2D_CliqByCliq.jl geometry, GenerateCommon.jl PPE plumbing)."""

import pytest
import numpy as np

from rome_tpu import solve_graph_parametric
from rome_tpu.canonical.generators import (
    build_graph_chain,
    generate_graph_circle,
    generate_graph_hexagonal,
    generate_graph_two_pose_odo,
    generate_graph_zero_pose,
)
from rome_tpu.utils.math import sym_rem


def test_zero_pose():
    fg = generate_graph_zero_pose()
    assert fg.ls() == ["x0"]
    assert fg.num_factors == 1
    np.testing.assert_allclose(fg.get_ppe("x0"), np.zeros(3))


def test_two_pose_odo():
    fg = generate_graph_two_pose_odo()
    assert set(fg.ls()) == {"x0", "x1", "l1"}
    np.testing.assert_allclose(fg.get_ppe("x1"), [10, 0, 0], atol=1e-6)
    res = solve_graph_parametric(fg)
    assert res["stats"].converged
    np.testing.assert_allclose(fg.get_coords("x1"), [10, 0, 0], atol=1e-2)
    np.testing.assert_allclose(fg.get_coords("l1"), [30, 0], atol=0.1)


def test_hexagonal_structure():
    fg = generate_graph_hexagonal()
    # 7 poses, 1 landmark, prior + 6 odo + 2 sightings
    assert len(fg.ls(r"^x\d+$")) == 7
    assert fg.ls(tags=["LANDMARK"]) == ["l1"]
    assert fg.num_factors == 9


def test_hexagonal_simulated_ppe():
    """Simulated ground truth traces the hexagon and returns to start."""
    fg = generate_graph_hexagonal()
    p0 = fg.get_ppe("x0")
    p6 = fg.get_ppe("x6")
    np.testing.assert_allclose(p0[:2], p6[:2], atol=1e-4)
    assert abs(sym_rem(p6[2] - p0[2])) < 1e-4


@pytest.mark.slow
def test_hexagonal_parametric_solve():
    """Parametric solve recovers the simulated hexagon to tight tolerance
    (analogue of the reference's solves; parametric so 1e-3-class accuracy
    per testParametric.jl conventions)."""
    fg = generate_graph_hexagonal()
    res = solve_graph_parametric(fg)
    assert res["stats"].converged
    for lbl in [f"x{i}" for i in range(7)]:
        sim = fg.get_ppe(lbl)
        got = fg.get_coords(lbl)
        np.testing.assert_allclose(got[:2], sim[:2], atol=5e-2)
        assert abs(sym_rem(got[2] - sim[2])) < 1e-2, lbl
    np.testing.assert_allclose(fg.get_coords("l1"), [20, 0], atol=0.15)


def test_circle_offset_grow():
    """Incremental growth: generate 3 poses then extend to 6 reusing fg."""
    fg = generate_graph_circle(3, cycle_poses=6, landmark=False)
    assert len(fg.ls(r"^x\d+$")) == 4
    fg = generate_graph_circle(6, fg=fg, cycle_poses=6, landmark=True)
    assert len(fg.ls(r"^x\d+$")) == 7
    res = solve_graph_parametric(fg)
    assert res["stats"].converged


def test_build_graph_chain():
    fg = build_graph_chain()
    assert len(fg.ls(r"^x\d+$")) == 4
