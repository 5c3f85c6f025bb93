"""Instrument ATE + per-iteration wall time along the dense32 LM path on
M3500: when (in iterations and seconds) does the solve cross the 0.1 m ATE
gate, and what stopping signal (dnorm / cost / gnorm) coincides with it?"""
import os, sys, time
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rome_tpu.utils.compile_cache import enable as enable_compile_cache
enable_compile_cache()
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np

from rome_tpu import MvNormal, PriorPose2
from rome_tpu.io.g2o import load_g2o
from rome_tpu.graph.lower import lower
from rome_tpu.solvers.linearize import runtime_state
from rome_tpu.solvers.init2d import chordal_init_pose2
from rome_tpu.solvers.gauss_newton import GNOptions, ParametricSolver

fg = load_g2o(None, "/root/reference/examples/manhattan.g2o")
fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])), graphinit=False)
fg.init_all()
ga = lower(fg, "parametric", dtype=jnp.float32)
rt = runtime_state(ga)
gt = np.load("data/manhattan_gt.npz")
poses = gt["poses"]
lbl_idx = np.array([int(l[1:]) for l in ga.var_labels["Pose2"]])

def ate(vals):
    est = np.asarray(vals["Pose2"], np.float64)
    return float(np.sqrt(np.mean(np.sum((est[:, :2] - poses[lbl_idx][:, :2]) ** 2, axis=1))))

v1 = chordal_init_pose2(ga, ga.values0)
opts = GNOptions(
    max_iters=30, linear="dense32",
    polish_tol=float(os.environ.get("PTOL", "1e-6")),
    polish_iters=int(os.environ.get("PITERS", "50")),
    lam0=float(os.environ.get("LAM0", "1e-6")),
    lam_down=float(os.environ.get("LAMDOWN", "0.1")),
    lam_min=float(os.environ.get("LAMMIN", "1e-12")),
    chol_jitter=float(os.environ.get("JITTER", "2e-6")),
    ftol=1e-9, gtol=1e-8,
)
solver = ParametricSolver(ga, opts)
values = {t: jnp.asarray(v, jnp.float64) for t, v in v1.items()}
lam = jnp.asarray(opts.lam0, dtype=ga.dtype)
pstate = solver._pstate0()
# compile
solver._step(values, lam, rt, pstate)
print("compiled; starting timed loop", flush=True)
for it in range(int(opts.max_iters)):
    t0 = time.time()
    nv, lam, c0, c1, gn, dn, ok, pstate, exact, cg_k = solver._step(values, lam, rt, pstate)
    jax.block_until_ready(c1)
    dt = time.time() - t0
    okb = bool(ok)
    if okb:
        values = nv
    a = ate(values)
    print(f"it{it:2d} {dt*1000:7.1f}ms cost {float(c0):.4f}->{float(c1):.4f} ok={okb} "
          f"|dx|={float(dn):.3g} |g|={float(gn):.3g} cg={int(cg_k)} ATE={a:.4f}", flush=True)
    if a < 1e-4 and it > 3:
        break
