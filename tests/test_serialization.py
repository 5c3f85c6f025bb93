"""Serialization round-trip tests (reference: test/testpackingconverters.jl,
saveDFG/loadDFG usage at examples/MITDatasetBatch.jl:41-44).
"""

import numpy as np
import pytest

import rome_tpu
from rome_tpu import (
    DynPose2,
    DynPose2VelocityPrior,
    FactorGraph,
    MvNormal,
    Normal,
    Point2,
    Pose2,
    Pose2Point2BearingRange,
    Pose2Pose2,
    Pose3,
    PriorPose2,
    PriorPose3,
    PriorPose3ZRP,
    RotVelPos,
    VelPose2VelPose2,
    load_dfg,
    save_dfg,
    solve_graph_parametric,
)
from rome_tpu.factors.inertial import IMUDeltaFactor, PriorRotVelPos
from rome_tpu.io.serialization import (
    pack_distribution,
    pack_factor,
    unpack_distribution,
    unpack_factor,
)
from rome_tpu.canonical.generators import generate_graph_hexagonal
from rome_tpu.canonical.inertial_sim import generate_field_inertial_measurement


def _zoo_graph():
    fg = FactorGraph()
    fg.params.graphinit = False
    fg.add_variable("x0", Pose2, timestamp_ns=0, tags=("POSE",))
    fg.add_variable("x1", Pose2, timestamp_ns=10**9)
    fg.add_variable("l1", Point2, tags=("LANDMARK",))
    fg.add_variable("p3", Pose3)
    fg.add_variable("d0", DynPose2, timestamp_ns=0)
    fg.add_variable("d1", DynPose2, timestamp_ns=10**9)
    fg.add_variable("r0", RotVelPos)
    fg.add_variable("r1", RotVelPos)
    fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])))
    fg.add_factor(
        ["x0", "x1"], Pose2Pose2(MvNormal([1, 0, 0.1], np.eye(3) * 0.01))
    )
    fg.add_factor(
        ["x0", "l1"],
        Pose2Point2BearingRange(Normal(0.2, 0.05), Normal(5.0, 0.5)),
    )
    fg.add_factor(["p3"], PriorPose3(MvNormal(np.zeros(6), np.eye(6) * 0.01)))
    fg.add_factor(["p3"], PriorPose3ZRP(Normal(2.0, 0.1), MvNormal([0, 0], np.eye(2) * 0.01)))
    fg.add_factor(
        ["d0"],
        DynPose2VelocityPrior(
            MvNormal(np.zeros(3), np.eye(3) * 0.01), MvNormal([1.0, 0], np.eye(2) * 0.1)
        ),
    )
    fg.add_factor(
        ["d0", "d1"],
        VelPose2VelPose2(
            MvNormal([1.0, 0, 0], np.eye(3) * 0.01), MvNormal([0.0, 0], np.eye(2) * 0.1)
        ),
    )
    imu = generate_field_inertial_measurement(dt=0.1, N=5, accel0=(0, 0, 9.81), rate=(0, 0, 0.1))
    fg.add_factor(["r0"], PriorRotVelPos(MvNormal(np.zeros(9), np.eye(9) * 1e-3)))
    fg.add_factor(
        ["r0", "r1"],
        IMUDeltaFactor(imu.accels, imu.gyros, np.ones(5) * 0.1, np.eye(6) * 1e-4),
    )
    # seed state in several solve keys + ppes + beliefs
    fg.set_ppe("x1", [1.0, 0.0, 0.1], "simulated")
    fg.variables["x0"].beliefs["default"] = np.random.default_rng(0).normal(
        size=(100, 3)
    )
    fg.init_all()
    return fg


@pytest.mark.parametrize("suffix", ["json", "tar.gz"])
def test_save_load_roundtrip(tmp_path, suffix):
    fg = _zoo_graph()
    path = str(tmp_path / f"graph.{suffix}")
    written = save_dfg(fg, path)
    fg2 = load_dfg(written)

    assert fg2.ls() == fg.ls()
    assert fg2.lsf() == fg.lsf()
    for label in fg.ls():
        a, b = fg.variables[label], fg2.variables[label]
        assert a.vtype.name == b.vtype.name
        assert a.timestamp_ns == b.timestamp_ns
        assert a.tags == b.tags
        assert a.solvable == b.solvable
        assert set(a.points) == set(b.points)
        for k in a.points:
            np.testing.assert_array_equal(a.points[k], b.points[k])  # bit-exact
        for k in a.beliefs:
            np.testing.assert_array_equal(a.beliefs[k], b.beliefs[k])
        for k in a.ppes:
            np.testing.assert_array_equal(a.ppes[k], b.ppes[k])
    for label in fg.lsf():
        a, b = fg.factors[label], fg2.factors[label]
        assert a.ftype.name == b.ftype.name
        assert a.variables == b.variables
        assert set(a.params) == set(b.params)
        for k in a.params:
            np.testing.assert_array_equal(a.params[k], b.params[k])
        assert len(a.dists) == len(b.dists)


@pytest.mark.slow
def test_roundtrip_solves_identically(tmp_path):
    """Reference crash-resume contract: a reloaded graph solves to the same
    solution (saveDFG before/after every solve,
    ManhattanDatasetIncremental.jl:54-56)."""
    fg = generate_graph_hexagonal()
    fg.init_all()
    path = save_dfg(fg, str(tmp_path / "hex.json"))
    fg2 = load_dfg(path)
    r1 = solve_graph_parametric(fg, init=False)
    r2 = solve_graph_parametric(fg2, init=False)
    for label in fg.ls():
        np.testing.assert_allclose(
            fg.get_coords(label), fg2.get_coords(label), atol=1e-5
        )
    assert r1["stats"].converged and r2["stats"].converged


def test_pack_distribution_roundtrip():
    from rome_tpu import Categorical, Mixture, Uniform

    dists = [
        Normal(1.5, 0.3),
        MvNormal([1, 2, 3], np.diag([0.1, 0.2, 0.3])),
        Uniform(-1, 2),
        Categorical([0.2, 0.8]),
        Mixture([Normal(0, 1), Normal(5, 2)], [0.3, 0.7]),
    ]
    for d in dists:
        d2 = unpack_distribution(pack_distribution(d))
        assert type(d2) is type(d)
        np.testing.assert_allclose(np.asarray(d2.mean()), np.asarray(d.mean()))
        np.testing.assert_allclose(np.asarray(d2.cov()), np.asarray(d.cov()))


def test_pack_factor_roundtrip():
    f = Pose2Pose2(MvNormal([1, 0, 0.1], np.eye(3) * 0.01))
    f.variables = ("x0", "x1")
    f.label = "x0x1f1"
    f2 = unpack_factor(pack_factor(f))
    assert f2.ftype.name == "Pose2Pose2"
    assert f2.variables == ("x0", "x1")
    np.testing.assert_array_equal(f2.params["z"], f.params["z"])
    np.testing.assert_array_equal(f2.params["sqrt_info"], f.params["sqrt_info"])


def test_load_unknown_format(tmp_path):
    p = tmp_path / "bogus.json"
    p.write_text('{"format": "something_else"}')
    with pytest.raises(ValueError, match="rome_tpu.dfg"):
        load_dfg(str(p))
