"""Multimodal (nonparametric) engine perf bench — accuracy-gated (round 4).

Applies the parametric bench's discipline to the nonparametric path: every
timing row carries an acceptance check, mirroring BASELINE.md's multimodal
measurement list (testMultimodalRangeBearing.jl:53-135 multihypo config,
testPose3Pose3NH.jl:118 nullhypo config, beehive growth scale
testBeehiveGrow.jl).

Rows:
- hexagonal_7pose: compiled batched engine vs the per-factor loop engine,
  gated on the mean symmetric KL between the two engines' posteriors.
- beehive_100pose: batched engine with the default approxConv-chain init
  and with the fast point-seeded init, gated on belief means vs the
  parametric optimum.
- multihypo_range_bearing / pose3_nullhypo: TPU-timed approx_conv on the
  BASELINE multihypothesis configs, gated on posterior mode masses.

Usage: python tools/bench_multimodal.py [out.json] [cpu|device]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _hex():
    from rome_tpu.canonical.generators import generate_graph_hexagonal

    return generate_graph_hexagonal(N=100)


def _beehive():
    from rome_tpu.canonical.patterns import generate_graph_beehive

    return generate_graph_beehive(pose_count_target=100, graphinit=False)


def _solve(fg, engine, init=True):
    from rome_tpu.solvers.multimodal import solve_graph_nonparametric

    t0 = time.time()
    solve_graph_nonparametric(fg, sweeps=3, N=100, engine=engine, init=init)
    return time.time() - t0


def _beliefs_of(fg, labels, key="default"):
    return {l: np.asarray(fg.variables[l].beliefs[key]) for l in labels}


def _mean_sym_kl(fg_a, fg_b, labels):
    from rome_tpu.manifolds.base import SE2_
    from rome_tpu.solvers.multimodal.metrics import symmetric_kl_knn

    import jax.numpy as jnp

    vals = []
    for l in labels:
        P = jnp.asarray(fg_a.variables[l].beliefs["default"])
        Q = jnp.asarray(fg_b.variables[l].beliefs["default"])
        vals.append(float(symmetric_kl_knn(SE2_, P, Q)))
    return float(np.mean(vals))


def bench_hexagonal():
    fg_b = _hex()
    t_first = _solve(fg_b, "batched")
    fg_b = _hex()
    t0 = time.time()
    _solve(fg_b, "batched")
    t_steady = time.time() - t0
    fg_l = _hex()
    t_loop = _solve(fg_l, "loop")
    labels = [l for l in fg_b.ls(r"^x\d+$")]
    kl = _mean_sym_kl(fg_b, fg_l, labels)
    n = len(labels)
    return dict(
        batched_first_s=round(t_first, 2),
        batched_steady_s=round(t_steady, 2),
        loop_engine_s=round(t_loop, 2),
        speedup_steady_vs_loop=round(t_loop / max(t_steady, 1e-9), 1),
        poses_per_sec=round(n / max(t_steady, 1e-9), 2),
        mean_sym_kl_vs_loop=round(kl, 3),
        accuracy_ok=bool(kl < 1.0),
    )


def bench_beehive():
    from rome_tpu import solve_graph_parametric

    # parametric optimum as the accuracy anchor (beehive posteriors are
    # unimodal; belief means must sit on the parametric solution)
    fg_p = _beehive()
    fg_p.init_all()
    solve_graph_parametric(fg_p, init=False)
    truth = {
        l: fg_p.get_coords(l, "parametric") for l in fg_p.ls(r"^x\d+$")
    }

    rows = {}
    for tag, init in (("default_init", True), ("points_init", "points")):
        fg = _beehive()
        t_first = _solve(fg, "batched", init=init)
        fg = _beehive()
        t0 = time.time()
        _solve(fg, "batched", init=init)
        t_steady = time.time() - t0
        errs = []
        for l in fg.ls(r"^x\d+$"):
            bel = np.asarray(fg.variables[l].beliefs["default"])
            errs.append(
                np.linalg.norm(np.mean(bel[:, :2], axis=0) - truth[l][:2])
            )
        err = float(np.mean(errs))
        n = len(errs)
        rows[tag] = dict(
            batched_first_s=round(t_first, 2),
            batched_steady_s=round(t_steady, 2),
            poses_per_sec=round(n / max(t_steady, 1e-9), 2),
            mean_pos_err_vs_parametric_m=round(err, 4),
            accuracy_ok=bool(err < 0.5),
        )
    return rows


def bench_multihypo():
    """testMultimodalRangeBearing.jl:53-135 timing + mode-mass gate."""
    import jax
    import jax.numpy as jnp

    from rome_tpu import (
        FactorGraph, MvNormal, Normal, Point2, Pose2,
        Pose2Point2BearingRange, PriorPoint2, PriorPose2,
    )
    from rome_tpu.solvers.multimodal import approx_conv, init_all_beliefs

    def build():
        fg = FactorGraph()
        fg.params.graphinit = False
        fg.add_variable("x0", Pose2)
        fg.add_factor(
            ["x0"], PriorPose2(MvNormal([0, 0, 0], [4.0, 4.0, 4.0])),
            graphinit=True,
        )
        fg.add_variable("l1", Point2)
        fg.add_variable("l2", Point2)
        fg.add_factor(["l1"], PriorPoint2(MvNormal([20.0, 5.0], [0.01, 0.01])))
        fg.add_factor(["l2"], PriorPoint2(MvNormal([20.0, -5.0], [0.01, 0.01])))
        f = fg.add_factor(
            ["x0", "l1", "l2"],
            Pose2Point2BearingRange(Normal(0.0, 0.01), Normal(20.0, 0.05)),
            multihypo=[1.0, 0.5, 0.5],
        )
        return fg, f

    fg, f = build()
    init_all_beliefs(fg, N=400)
    t0 = time.time()
    pts = np.asarray(approx_conv(fg, f.label, "x0", N=400))
    t_first = time.time() - t0
    t0 = time.time()
    pts = np.asarray(
        approx_conv(fg, f.label, "x0", N=400, key=jax.random.PRNGKey(3))
    )
    t_steady = time.time() - t0
    r1 = np.abs(np.linalg.norm(pts[:, :2] - np.array([20.0, 5.0]), axis=1) - 20.0)
    r2 = np.abs(np.linalg.norm(pts[:, :2] - np.array([20.0, -5.0]), axis=1) - 20.0)
    m1 = float(np.mean((r1 < 1.0) & (r2 >= 1.0)))
    m2 = float(np.mean((r2 < 1.0) & (r1 >= 1.0)))
    balanced = m1 > 0.15 and m2 > 0.15 and 0.25 < m1 / (m1 + m2 + 1e-12) < 0.75
    return dict(
        config="MultimodalRangeBearing multihypo=[1,.5,.5], N=400",
        first_s=round(t_first, 3),
        steady_s=round(t_steady, 3),
        mode_mass=[round(m1, 3), round(m2, 3)],
        accuracy_ok=bool(balanced),
    )


def bench_nullhypo():
    """testPose3Pose3NH.jl:118 timing + null-mass gate."""
    import jax
    import jax.numpy as jnp

    from rome_tpu import FactorGraph, MvNormal, Pose3, Pose3Pose3, PriorPose3
    from rome_tpu.solvers.multimodal import approx_conv, init_all_beliefs

    fg = FactorGraph()
    fg.add_variable("x0", Pose3)
    fg.add_factor(["x0"], PriorPose3(MvNormal(np.zeros(6), np.full(6, 1e-4))))
    fg.add_variable("x1", Pose3)
    z = np.array([10.0, 0, 0, 0, 0, 0])
    f = fg.add_factor(
        ["x0", "x1"], Pose3Pose3(MvNormal(z, np.full(6, 1e-3))),
        nullhypo=0.5, graphinit=False,
    )
    rng = np.random.default_rng(5)
    wide = np.concatenate(
        [rng.normal(0, 8.0, size=(400, 3)), np.tile([1.0, 0, 0, 0], (400, 1))],
        axis=1,
    )
    import jax.numpy as jnp

    fg.variables["x1"].beliefs["default"] = jnp.asarray(wide)
    fg.variables["x1"].initialized["default"] = True
    init_all_beliefs(fg, N=400)
    t0 = time.time()
    pts = np.asarray(approx_conv(fg, f.label, "x1", N=400))
    t_first = time.time() - t0
    t0 = time.time()
    pts = np.asarray(
        approx_conv(fg, f.label, "x1", N=400, key=jax.random.PRNGKey(4))
    )
    t_steady = time.time() - t0
    at_meas = float(
        np.mean(np.linalg.norm(pts[:, :3] - np.array([10.0, 0, 0]), axis=1) < 1.0)
    )
    far = float(
        np.mean(np.linalg.norm(pts[:, :3] - np.array([10.0, 0, 0]), axis=1) > 3.0)
    )
    return dict(
        config="Pose3Pose3 nullhypo=0.5, N=400",
        first_s=round(t_first, 3),
        steady_s=round(t_steady, 3),
        mass_at_measurement=round(at_meas, 3),
        mass_spread=round(far, 3),
        accuracy_ok=bool(0.25 < at_meas < 0.75 and far > 0.15),
    )


def main(out="MULTIMODAL_r04.json", platform="cpu"):
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    rows = {}
    rows["hexagonal_7pose"] = bench_hexagonal()
    print(json.dumps(rows["hexagonal_7pose"]), flush=True)
    rows["beehive_100pose"] = bench_beehive()
    print(json.dumps(rows["beehive_100pose"]), flush=True)
    rows["multihypo_range_bearing"] = bench_multihypo()
    print(json.dumps(rows["multihypo_range_bearing"]), flush=True)
    rows["pose3_nullhypo"] = bench_nullhypo()
    print(json.dumps(rows["pose3_nullhypo"]), flush=True)

    doc = dict(
        device=str(jax.devices()[0]),
        N=100,
        sweeps=3,
        rows=rows,
        # beehive gates on the production configuration (points init): from
        # an odometry-chain particle init, 3 JACOBI sweeps mathematically
        # cannot undo global drift on a 100-pose loop (information moves one
        # hop per sweep) — the default_init row reports that honestly; the
        # point-seeded init is both faster and accurate, and is what the
        # incremental frontend uses (beliefs start at the running estimate).
        all_gates_pass=bool(
            rows["hexagonal_7pose"]["accuracy_ok"]
            and rows["beehive_100pose"]["points_init"]["accuracy_ok"]
            and rows["multihypo_range_bearing"]["accuracy_ok"]
            and rows["pose3_nullhypo"]["accuracy_ok"]
        ),
    )
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), out), "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(doc), flush=True)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "MULTIMODAL_r04.json"
    platform = sys.argv[2] if len(sys.argv) > 2 else "cpu"
    main(out, platform)
    os._exit(0)
