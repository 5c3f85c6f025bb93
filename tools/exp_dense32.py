"""Experiment: pure-f32 dense LM from chordal init on M3500 + MIT.
How many iterations, what final cost, what fused wall-clock?"""
import sys, time
import jax

from rome_tpu.utils.compile_cache import enable as enable_compile_cache
enable_compile_cache()
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np

from rome_tpu import MvNormal, PriorPose2
from rome_tpu.io.g2o import load_g2o
from rome_tpu.graph.lower import lower
from rome_tpu.solvers.linearize import cost_at, runtime_state
from rome_tpu.solvers.init2d import chordal_init_pose2
from rome_tpu.solvers.gauss_newton import GNOptions, ParametricSolver

IR = int(sys.argv[1]) if len(sys.argv) > 1 else 0

for name, path, gtf in [
    ("manhattan", "/root/reference/examples/manhattan.g2o", "data/manhattan_gt.npz"),
    ("mit", "/root/reference/examples/MIT.g2o", "data/mit_gt.npz"),
]:
    print(f"[{name}] loading", flush=True)
    fg = load_g2o(None, path)
    fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])), graphinit=False)
    fg.init_all()
    print(f"[{name}] lowering", flush=True)
    ga = lower(fg, "parametric", dtype=jnp.float32)
    rt = runtime_state(ga)
    print(f"[{name}] chordal init", flush=True)

    t0 = time.time()
    v1 = chordal_init_pose2(ga, ga.values0)
    jax.block_until_ready(v1["Pose2"])
    t_init_cold = time.time() - t0
    t0 = time.time()
    v1 = chordal_init_pose2(ga, ga.values0)
    jax.block_until_ready(v1["Pose2"])
    t_init = time.time() - t0
    c1 = float(jax.jit(lambda v: cost_at(ga, v, rt))(v1))

    import os
    opts = GNOptions(max_iters=40, linear="dense32",
                     polish_tol=float(os.environ.get("PTOL", "1e-4")),
                     polish_iters=int(os.environ.get("PITERS", "25")),
                     lam0=1e-6, lam_down=0.1,
                     ftol=float(os.environ.get("FTOL", "1e-7")),
                     gtol=1e-8)
    solver = ParametricSolver(ga, opts)
    t0 = time.time()
    vals, stats = solver.solve(v1, rt)
    t_cold = time.time() - t0
    t0 = time.time()
    vals, stats = solver.solve(v1, rt)
    t_warm = time.time() - t0

    gt = np.load(gtf)
    # ATE
    est = np.asarray(vals["Pose2"])
    lbls = ga.var_labels["Pose2"]
    poses = gt["poses"]
    errs = [np.sum((est[k][:2] - poses[int(l[1:])][:2]) ** 2)
            for k, l in enumerate(lbls)]
    ate = float(np.sqrt(np.mean(errs)))
    print(f"{name}: init {t_init:.3f}s (cold {t_init_cold:.1f}) cost_init={c1:.1f} | "
          f"LM {stats.iterations} iters {t_warm:.3f}s (cold {t_cold:.1f}s) "
          f"cost={stats.final_cost:.4f} (ref {float(gt['final_cost']):.4f}) "
          f"ate={ate:.4f} conv={stats.converged} reason={stats.reason}", flush=True)
    for h in stats.history:
        print(f"   it{h['iter']:2d} {h['cost0']:.6g}->{h['cost1']:.6g} ok={h['accepted']} lam={h['lam']:.1e} |dx|={h['dnorm']:.2g} cg={h.get('cg',0)}", flush=True)
