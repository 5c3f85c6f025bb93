"""Canonical pattern generator tests (reference: test/testGenerateHelix.jl,
testBeehive2D_CliqByCliq.jl / testBeehiveGrow.jl structure checks).
"""

import pytest
import numpy as np

from rome_tpu import FactorGraph, GNOptions, solve_graph_parametric
from rome_tpu.canonical.patterns import (
    generate_graph_beehive,
    generate_graph_boxes2d,
    generate_graph_helix2d,
    generate_graph_helix2d_slew,
    generate_graph_helix2d_spiral,
    generate_graph_honeycomb,
)


def test_boxes2d_ppes():
    """testGenerateHelix.jl:9-30 — exact simulated positions of 2 boxes."""
    fg = generate_graph_boxes2d(8)
    expected = {
        "x0": [0, 0],
        "x1": [15, 0],
        "x2": [15, 15],
        "x3": [5, 15],
        "x4": [5, 0],
        "x5": [20, 0],
        "x6": [20, 15],
        "x7": [10, 15],
        "x8": [10, 0],
    }
    for lbl, exp in expected.items():
        np.testing.assert_allclose(fg.get_ppe(lbl, "simulated"), exp, atol=1e-3)
    # variable tags carry direction labels
    assert "POSITIVE_X" in fg.variables["x1"].tags
    assert "NEGATIVE_Y" in fg.variables["x4"].tags


def test_helix2d_base_ppes():
    """testGenerateHelix.jl:76-95 — exact first five helix poses."""
    fg = generate_graph_helix2d(5, posesperturn=15, radius=10)
    assert not fg.params.graphinit
    expected = [
        [0.0, 0.0, 1.5707963267948966],
        [0.8645454235739924, 4.067366430758004, 1.151917276019672],
        [3.3086939364114176, 7.431448254773942, 0.7330382545911657],
        [6.909830056250526, 9.510565162951536, 0.31415923447063226],
        [11.045284632676536, 9.945218953682733, -0.10471978645923721],
    ]
    for i, exp in enumerate(expected):
        np.testing.assert_allclose(
            fg.get_ppe(f"x{i}", "simulated"), exp, atol=1e-5
        )

    # extend with the same target: no new poses
    generate_graph_helix2d(5, fg=fg, posesperturn=15, radius=10)
    assert len(fg.ls(r"^x\d+$")) == 5
    assert "x5" not in fg.variables

    # extend by one
    generate_graph_helix2d(6, fg=fg, posesperturn=15, radius=10)
    assert "x5" in fg.variables
    np.testing.assert_allclose(
        fg.get_ppe("x5", "simulated"),
        [15.0, 8.660254037844387, -0.5235988055902416],
        atol=1e-5,
    )


def test_helix2d_slew_lastpose():
    """testGenerateHelix.jl:59-63 — slewed helix final pose."""
    fg = generate_graph_helix2d_slew(46, slew_x=2 / 3, posesperturn=15, radius=10)
    np.testing.assert_allclose(
        fg.get_ppe("x45", "simulated"), [20, 0, 1.465088], atol=1e-3
    )


def test_helix2d_spiral_runs():
    fg = generate_graph_helix2d_spiral(60, rate_r=0.6, rate_a=6, radius=100)
    assert len(fg.ls(r"^x\d+$")) == 60


@pytest.mark.slow
def test_honeycomb_structure_and_solve():
    """Honeycomb: landmark merge produces loop closures (more sightings than
    landmarks); parametric solve tracks the simulated truth."""
    fg = generate_graph_honeycomb(14, landmark_solvable=1, graphinit=True)
    lms = fg.ls(r"^l\d+$")
    sightings = [f for f in fg.lsf() if "bearingrange" in f.lower()]
    assert len(fg.ls(r"^x\d+$")) == 15
    assert len(sightings) == 15  # one per pose
    assert len(lms) < len(sightings)  # merges happened => loop closures

    from rome_tpu import MvNormal, PriorPose2

    fg.add_factor(
        ["x0"], PriorPose2(MvNormal(fg.get_ppe("x0", "simulated"), np.eye(3) * 1e-4))
    )
    fg.init_all()
    res = solve_graph_parametric(fg, options=GNOptions(max_iters=150))
    assert res["stats"].converged
    for lbl in fg.ls(r"^x\d+$"):
        sim = fg.get_ppe(lbl, "simulated")
        got = fg.get_coords(lbl)
        np.testing.assert_allclose(got[:2], sim[:2], atol=1.5)


def test_beehive_stochastic_walk():
    fg = generate_graph_beehive(12, seed=3, landmark_solvable=1)
    assert len(fg.ls(r"^x\d+$")) == 13
    lms = fg.ls(r"^l\d+$")
    assert len(lms) >= 1
    # all poses sit on the hex lattice: pairwise distances multiple of edges
    poses = sorted(fg.ls(r"^x\d+$"), key=lambda s: int(s[1:]))
    sims = np.stack([fg.get_ppe(l, "simulated") for l in poses])
    assert np.allclose(np.linalg.norm(sims[1:, :2] - sims[:-1, :2], axis=1), 10.0, atol=1e-6)
    # deterministic for a fixed seed
    fg2 = generate_graph_beehive(12, seed=3, landmark_solvable=1)
    assert fg2.ls() == fg.ls()
    assert fg2.lsf() == fg.lsf()
