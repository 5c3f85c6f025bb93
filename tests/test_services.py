"""Services tests: scalar-field localization (testScalarFields.jl analogue),
bearing-range utilities, simulation helpers, analysis tools.
"""

import numpy as np
import jax
import pytest

from rome_tpu import FactorGraph, MvNormal, Normal, Point3, Pose2, PriorPose2
from rome_tpu.services import (
    LevelSetGridNormal,
    PartialPriorPassThrough,
    build_graph_scalar_field,
    calc_pose_point_bearing_range,
    compare_density,
    coordinates_to_homography,
    dem_interp,
    generate_field_canyon_dem,
    homography_to_coordinates,
    malahanobis_br,
    predict_body_br,
    predict_variable_by_factor,
    range_comp_all_poses,
    sim_odo,
)


def test_dem_interp_matches_grid():
    """testScalarFields.jl:38-41 — interpolation reproduces raw grid values."""
    x, y, img = generate_field_canyon_dem(1, 50)
    h = dem_interp(x, y, img)
    ii = np.array([0, 7, 23, 48])
    jj = np.array([1, 11, 30, 49])
    got = np.asarray(jax.vmap(h)(np.asarray(x[ii], np.float32), np.asarray(y[jj], np.float32)))
    np.testing.assert_allclose(got, img[ii, jj], rtol=2e-5)


def test_build_graph_scalar_field():
    """ScalarFields.jl:12-64 — mesh of marginalized Point3s with row/col/diag
    factors."""
    fg = FactorGraph()
    fg.params.graphinit = False
    x, y, img = generate_field_canyon_dem(1, 5)
    build_graph_scalar_field(fg, img, x, y)
    assert len(fg.ls(r"^pt\d+_\d+$")) == 25
    # 4x5 row edges + 5x4 col edges + 4x4 diagonal edges
    assert fg.num_factors == 20 + 20 + 16
    assert all(fg.variables[l].marginalized for l in fg.ls(r"^pt"))
    assert all(fg.variables[l].solvable == 0 for l in fg.ls(r"^pt"))
    # simulated PPE carries the terrain truth
    np.testing.assert_allclose(
        fg.variables["pt1_1"].ppes["simulated"], [x[0], y[0], img[0, 0]]
    )


@pytest.mark.slow
def test_levelset_localization():
    """testScalarFields.jl:44-56 — a level-set prior concentrates belief near
    the measured elevation contour."""
    x, y, img = generate_field_canyon_dem(1, 80)
    truth = np.array([x[30], y[50]])
    h = dem_interp(x, y, img)
    z = float(h(np.float32(truth[0]), np.float32(truth[1])))
    hmd = LevelSetGridNormal(img, (x, y), z, 5.0, N=2000)
    pts = np.asarray(hmd.sample(jax.random.PRNGKey(0), 4000))
    # all samples lie on the level set (elevation within a few sigma)
    zs = np.asarray(jax.vmap(h)(pts[:, 0].astype(np.float32), pts[:, 1].astype(np.float32)))
    frac = np.mean(np.abs(zs - z) < 4 * 5.0)
    assert frac > 0.9, frac

    # pass-through partial prior attaches to a Pose2 and its samples land on
    # the contour through the sampling engine
    fg = FactorGraph()
    fg.params.graphinit = False
    fg.params.N = 500
    fg.add_variable("x0", Pose2)
    f = fg.add_factor(["x0"], PartialPriorPassThrough(hmd, (1, 2)), nullhypo=0.1)
    from rome_tpu.solvers.multimodal.convolve import approx_conv

    # seed a belief so nullhypo has something to keep
    fg.variables["x0"].beliefs["default"] = np.asarray(
        hmd.sample(jax.random.PRNGKey(9), 500)
    )
    fg.variables["x0"].beliefs["default"] = np.concatenate(
        [fg.variables["x0"].beliefs["default"], np.zeros((500, 1))], axis=1
    )
    pts = np.asarray(approx_conv(fg, f.label, "x0"))
    zs = np.asarray(jax.vmap(h)(pts[:, 0].astype(np.float32), pts[:, 1].astype(np.float32)))
    assert np.mean(np.abs(zs - z) < 4 * 5.0) > 0.8


def test_predict_body_br_and_mala():
    fg = FactorGraph()
    fg.add_variable("x0", Pose2)
    fg.add_variable("l1", Pose2)  # abuse Pose2 for simple coords
    fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, np.pi / 2], np.eye(3) * 1e-6)))
    fg.add_factor(["l1"], PriorPose2(MvNormal([0, 5, 0], np.eye(3) * 1e-6)))
    fg.init_all()
    b, r = predict_body_br(fg, "x0", "l1")
    np.testing.assert_allclose(r, 5.0, atol=1e-3)
    np.testing.assert_allclose(b, 0.0, atol=1e-3)  # dead ahead in body frame

    m = malahanobis_br([0.1, 5.5], [b, r], np.diag([0.01, 0.25]))
    np.testing.assert_allclose(m, np.sqrt(0.1**2 / 0.01 + 0.5**2 / 0.25), atol=1e-6)


def test_calc_pose_point_bearing_range():
    the, rng = calc_pose_point_bearing_range([0, 0, 0], [10, 10])
    np.testing.assert_allclose(the, np.pi / 4, atol=1e-9)
    np.testing.assert_allclose(rng, np.hypot(10, 10), atol=1e-9)


def test_predict_variable_by_factor():
    from rome_tpu import Pose2Point2BearingRange, Point2, PriorPoint2

    fg = FactorGraph()
    fg.params.N = 200
    fg.add_variable("x7", Pose2)
    fg.add_variable("l3", Point2)
    fg.add_factor(["x7"], PriorPose2(MvNormal([0, 0, 0], np.eye(3) * 1e-4)))
    fg.add_factor(["l3"], PriorPoint2(MvNormal([10, 0], np.eye(2) * 0.5)))
    fg.init_all()
    pp = Pose2Point2BearingRange(Normal(0, 0.05), Normal(10.0, 0.5))
    curr, pred = predict_variable_by_factor(fg, "l3", pp, ["x7", "l3"])
    assert pred.shape[1] == 2
    np.testing.assert_allclose(pred.mean(axis=0), [10, 0], atol=1.0)


def test_sim_odo_and_range_comp():
    from rome_tpu.frontend.robot_utils import init_factor_graph

    rng = np.random.default_rng(3)
    fg_gt = FactorGraph()
    fg = FactorGraph()
    init_factor_graph(fg_gt)
    init_factor_graph(fg)
    for _ in range(3):
        lbl = sim_odo(fg_gt, fg, [1.0, 0, 0.1], rng=rng)
    assert lbl == "x3"
    fg_gt.init_all()
    fg.init_all()
    errs = range_comp_all_poses(fg_gt, fg)
    assert errs.shape[0] >= 3
    assert np.all(errs < 1.5)  # noisy twin stays near truth


def test_compare_density_and_homography():
    assert compare_density(Normal(1, 2), Normal(1, 2))
    assert not compare_density(Normal(1, 2), Normal(1.1, 2))
    a = MvNormal([1, 2], np.eye(2))
    assert compare_density(a, MvNormal([1, 2], np.eye(2)))
    assert not compare_density(a, Normal(0, 1))

    c = np.array([1.0, 2, 3, 0.1, -0.2, 0.3])
    H = coordinates_to_homography(c)
    c2 = homography_to_coordinates(H)
    np.testing.assert_allclose(c2, c, atol=1e-6)
    np.testing.assert_allclose(H[3], [0, 0, 0, 1])


def test_landmark_cross_info_roundtrip(tmp_path):
    """LANDMARK g2o line with a nonzero bearing-range cross-information term
    survives import -> export bit-faithfully (g2oParser.jl:123-133)."""
    import numpy as np

    from rome_tpu import FactorGraph
    from rome_tpu.io.g2o import export_g2o, parse_g2o_instruction

    fg = FactorGraph()
    fg.params.graphinit = False
    line = "LANDMARK 0 1 0.3 12.0 25.0 3.0 4.0"
    parse_g2o_instruction(fg, line.split())
    f = [fg.factors[l] for l in fg.lsf()][0]
    S = np.asarray(f.params["sqrt_info"])
    info = S.T @ S
    np.testing.assert_allclose(
        info, [[25.0, 3.0], [3.0, 4.0]], rtol=1e-6
    )
    out = export_g2o(fg, str(tmp_path / "lm.g2o"))
    text = open(out).read()
    row = [l for l in text.splitlines() if l.startswith("LANDMARK")][0]
    vals = [float(v) for v in row.split()[3:]]
    np.testing.assert_allclose(vals, [0.3, 12.0, 25.0, 3.0, 4.0], rtol=1e-5)


def test_save_load_tree_roundtrip(tmp_path):
    """saveTree/loadTree analogue round-trip (MITDatasetBatch.jl:45)."""
    from rome_tpu.canonical.generators import generate_graph_hexagonal
    from rome_tpu.io.serialization import load_tree, save_tree
    from rome_tpu.solvers.multimodal.tree import build_tree_from_ordering

    fg = generate_graph_hexagonal()
    tree = build_tree_from_ordering(fg)
    p = save_tree(tree, str(tmp_path / "tree"))
    tree2 = load_tree(p)
    assert tree2.num_cliques == tree.num_cliques
    assert tree2.order == tree.order
    for a, b in zip(tree.cliques, tree2.cliques):
        assert a.signature == b.signature
        assert a.parent == b.parent


def test_phase_timer_and_trace(tmp_path):
    """Profiling hooks: per-phase timer rows + a device trace capture."""
    import jax.numpy as jnp

    from rome_tpu.utils.profiling import PhaseTimer, annotate, trace

    pt = PhaseTimer()
    with pt.phase("linearize"):
        pass
    with pt.phase("linearize"):
        pass
    with pt.phase("solve"):
        pass
    rows = pt.rows()
    assert {r["phase"] for r in rows} == {"linearize", "solve"}
    assert rows[0]["calls"] == 2
    assert "linearize," in pt.report()

    with trace(str(tmp_path / "tr")):
        with annotate("square"):
            x = jnp.ones((8, 8))
            (x @ x).block_until_ready()
    import os

    assert any(os.scandir(str(tmp_path / "tr")))
