"""Exact per-LM-iteration cost of the fused M3500 ndchol program: run the
SAME compiled program at different iteration counts via the traced
rt["ndchol_tune"]["dtol"] knob and fit wall = fixed + slope * iters."""
import os, sys, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rome_tpu.utils.compile_cache import enable as enable_compile_cache
enable_compile_cache()
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp

from rome_tpu import GNOptions, MvNormal, PriorPose2
from rome_tpu.io.g2o import load_g2o
from rome_tpu.graph.lower import lower
from rome_tpu.solvers.gauss_newton import ParametricSolver
from rome_tpu.solvers.linearize import runtime_state
from rome_tpu.solvers.init2d import chordal_init_pose2

fg = load_g2o(None, "/root/reference/examples/manhattan.g2o")
fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])), graphinit=False)
fg.init_all()
ga = lower(fg, "parametric", dtype=jnp.float32)
rt0 = runtime_state(ga)

opts = GNOptions(
    max_iters=30, linear="ndchol", polish_tol=5e-2, nd_leaf=32,
    polish_iters=60, lam0=1e-6, lam_down=0.1, lam_min=1e-12,
    chol_jitter=1e-7, dtol=0.25, ftol=1e-9, gtol=1e-8,
)
solver = ParametricSolver(ga, opts)
v1 = chordal_init_pose2(ga, ga.values0)

f64 = jnp.float64


def run(dtol):
    tune = {
        "jitter": jnp.asarray(1e-7, jnp.float32),
        "polish_tol": jnp.asarray(5e-2, f64),
        "dtol": jnp.asarray(dtol, f64),
        "lam_min": jnp.asarray(1e-12, jnp.float32),
    }
    rt = {**rt0, "ndchol_tune": tune}
    vals, stats = solver.solve(v1, rt=rt)
    return stats


st = run(0.25)
print("compiled; iters", st.iterations, flush=True)
rows = []
for dtol in (1e9, 2.0, 0.25, 1e-3, 1e-6):
    best = float("inf")
    its = None
    for _ in range(4):
        t0 = time.time()
        st = run(dtol)
        dt = time.time() - t0
        best = min(best, dt)
        its = st.iterations
    rows.append((its, best))
    print(f"dtol {dtol:8.0e}: iters {its:2d}  wall {best*1e3:7.1f} ms  reason {st.reason}", flush=True)

its = np.array([r[0] for r in rows], float)
ws = np.array([r[1] for r in rows])
A = np.stack([np.ones_like(its), its], 1)
coef, *_ = np.linalg.lstsq(A, ws, rcond=None)
print(f"fixed {coef[0]*1e3:.1f} ms  per-iter {coef[1]*1e3:.2f} ms", flush=True)
os._exit(0)
