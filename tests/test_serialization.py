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


def test_pack_every_registered_factor_type():
    """Registry-wide packing sweep — the analogue of the reference's
    exhaustive converter test (testpackingconverters.jl sweeps the whole
    factor library). Every registered factor type must round-trip a factor
    record bit-exactly (params arrays, measurement dists, metadata)."""
    import json

    # pull in the lazily-registered extension factor families
    import rome_tpu.factors.fluxmix  # noqa: F401
    import rome_tpu.factors.ode  # noqa: F401
    import rome_tpu.services.scalar_fields  # noqa: F401
    from rome_tpu.factors.base import Factor, get_factor_type, list_factor_types

    names = list_factor_types()
    assert len(names) >= 45
    rng = np.random.default_rng(7)
    for name in names:
        ft = get_factor_type(name)
        zd = max(ft.zdim, 1)
        f = Factor(
            ftype=ft,
            variables=tuple(f"v{i}" for i in range(ft.arity)),
            params={
                "z": rng.normal(size=zd),
                "sqrt_info": np.eye(zd) + 0.01 * rng.normal(size=(zd, zd)),
                "extra_blob": rng.normal(size=(3, 4)),
            },
            dists=(MvNormal(rng.normal(size=zd), np.eye(zd)),),
            label=f"f_{name}",
            multihypo=None,
            nullhypo=0.125,
            solvable=1,
            tags=("TEST",),
            timestamp_ns=123456789,
            inflation=3.5,
        )
        doc = json.loads(json.dumps(pack_factor(f)))  # full JSON round-trip
        f2 = unpack_factor(doc)
        assert f2.ftype is ft, name
        assert f2.variables == f.variables
        assert f2.nullhypo == f.nullhypo
        assert f2.inflation == f.inflation
        assert f2.timestamp_ns == f.timestamp_ns
        for k in f.params:
            np.testing.assert_array_equal(f2.params[k], f.params[k])
        np.testing.assert_array_equal(
            np.asarray(f2.dists[0].mean()), np.asarray(f.dists[0].mean())
        )


def test_pack_extended_distributions():
    """NN odometry predictors, scalar-field level-set beliefs, and particle
    (manifold KDE) beliefs round-trip — closing the round-3 gap where these
    raised TypeError (reference packs even the NN mixture,
    RoMEFluxExt.jl:62-70)."""
    import json

    from rome_tpu.factors.fluxmix import NNOdoPredictor, build_pose2_odo_nn_01
    from rome_tpu.manifolds.base import SE2, TranslationGroup, ProductGroup
    from rome_tpu.services.scalar_fields import LevelSetGridNormal
    from rome_tpu.solvers.multimodal.kde import ManifoldKernelDensity
    from rome_tpu.distributions import Mixture

    rng = np.random.default_rng(3)

    def rt(d):
        return unpack_distribution(json.loads(json.dumps(pack_distribution(d))))

    nn = build_pose2_odo_nn_01(*[rng.normal(size=s) for s in
                                 [(4, 8), (8,), (8, 48), (8,), (2, 8), (2,)]])
    d = NNOdoPredictor(nn, rng.normal(size=(25, 4)), jitter=2e-3)
    d2 = rt(d)
    assert type(d2) is NNOdoPredictor and d2.jitter == d.jitter
    for k in nn:
        np.testing.assert_array_equal(d2.nn[k], d.nn[k])
    np.testing.assert_array_equal(np.asarray(d2.mean()), np.asarray(d.mean()))

    img = rng.random((16, 12))
    ls = LevelSetGridNormal(
        img, (np.linspace(0, 10, 16), np.linspace(0, 8, 12)), 0.4, 0.1,
        sigma_scale=2.0, N=500,
    )
    ls2 = rt(ls)
    assert type(ls2) is LevelSetGridNormal
    np.testing.assert_array_equal(ls2.img, ls.img)
    np.testing.assert_allclose(ls2.mean(), ls.mean())
    np.testing.assert_allclose(ls2.cov(), ls.cov())

    for man in [SE2(), TranslationGroup(3),
                ProductGroup([SE2(), TranslationGroup(2)])]:
        pts = rng.normal(size=(50, man.point_dim))
        pts = np.asarray(man.normalize(pts))
        kde = ManifoldKernelDensity.from_points(man, pts)
        kde2 = rt(kde)
        assert type(kde2) is ManifoldKernelDensity
        # bit-exact vs the KDE's own stored (f32) particle array
        np.testing.assert_array_equal(
            np.asarray(kde2.points), np.asarray(kde.points)
        )
        np.testing.assert_allclose(
            np.asarray(kde2.bandwidth), np.asarray(kde.bandwidth)
        )
        assert kde2.manifold.point_dim == man.point_dim
        assert kde2.manifold.dof == man.dof

    # mixture CONTAINING an NN predictor (the fluxmix measurement shape)
    mix = Mixture([NNOdoPredictor(nn, np.zeros((25, 4))),
                   MvNormal(np.zeros(3), np.eye(3))], [0.4, 0.6])
    mix2 = rt(mix)
    assert type(mix2.components[0]) is NNOdoPredictor


def test_zoo_with_ext_factors_roundtrip(tmp_path):
    """A saved graph carrying flux-mixture odometry and a level-set partial
    prior reloads with its measurement beliefs intact."""
    from rome_tpu.factors.fluxmix import MixtureFluxPose2Pose2, build_pose2_odo_nn_01
    from rome_tpu.services.scalar_fields import (
        LevelSetGridNormal, PartialPriorPassThrough,
    )

    rng = np.random.default_rng(11)
    fg = FactorGraph()
    fg.params.graphinit = False
    for i in range(3):
        fg.add_variable(f"x{i}", Pose2)
    fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])))
    nn = build_pose2_odo_nn_01(*[rng.normal(size=s) * 0.1 for s in
                                 [(4, 8), (8,), (8, 48), (8,), (2, 8), (2,)]])
    fg.add_factor(
        ["x0", "x1"],
        MixtureFluxPose2Pose2(fluxmodels=nn, data=rng.normal(size=(25, 4))),
    )
    fg.add_factor(
        ["x1", "x2"], Pose2Pose2(MvNormal([1, 0, 0], np.eye(3) * 0.01))
    )
    img = rng.random((8, 8))
    ls = LevelSetGridNormal(
        img, (np.linspace(0, 4, 8), np.linspace(0, 4, 8)), 0.5, 0.2
    )
    fg.add_factor(["x2"], PartialPriorPassThrough(ls, (1, 2), "Pose2"))
    fg.init_all()

    path = save_dfg(fg, str(tmp_path / "ext.tar.gz"))
    fg2 = load_dfg(path)
    assert fg2.lsf() == fg.lsf()
    for label in fg.lsf():
        a, b = fg.factors[label], fg2.factors[label]
        for k in a.params:
            np.testing.assert_array_equal(a.params[k], b.params[k])
        for da, db in zip(a.dists, b.dists):
            assert type(da) is type(db)
            np.testing.assert_allclose(
                np.asarray(da.mean()), np.asarray(db.mean())
            )
    # parametric solve identity on the reloaded graph
    r1 = solve_graph_parametric(fg, init=False)
    r2 = solve_graph_parametric(fg2, init=False)
    for label in fg.ls():
        np.testing.assert_allclose(
            fg.get_coords(label), fg2.get_coords(label), atol=1e-5
        )


def test_load_unknown_format(tmp_path):
    p = tmp_path / "bogus.json"
    p.write_text('{"format": "something_else"}')
    with pytest.raises(ValueError, match="rome_tpu.dfg"):
        load_dfg(str(p))
