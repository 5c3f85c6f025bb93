"""Round-4 TPU experiment: ndchol (ND multifrontal sparse Cholesky) LM on
M3500/MIT — warmup + steady-state wall, vs the round-3 dense32 numbers.

Usage: python tools/exp_ndchol_tpu.py [dataset] [jitter] [dtol]
"""
import os, sys, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

from rome_tpu.utils.compile_cache import enable as enable_compile_cache

enable_compile_cache()
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np

from rome_tpu import MvNormal, PriorPose2, GNOptions, solve_graph_parametric
from rome_tpu.io.g2o import load_g2o

name = sys.argv[1] if len(sys.argv) > 1 else "manhattan"
jitter = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-7
dtol = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
paths = {
    "manhattan": ("/root/reference/examples/manhattan.g2o", "data/manhattan_gt.npz"),
    "mit": ("/root/reference/examples/MIT.g2o", "data/mit_gt.npz"),
}
path, gtf = paths[name]


def build():
    fg = load_g2o(None, path)
    fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])),
                  graphinit=False)
    fg.init_all()
    return fg


print("device:", jax.devices()[0], flush=True)
opts = GNOptions(
    max_iters=30, linear="ndchol", polish_tol=1e-6, polish_iters=60,
    lam0=1e-6, lam_down=0.1, lam_min=1e-12, chol_jitter=jitter,
    dtol=dtol, ftol=1e-9, gtol=1e-8,
)
kw = dict(init=False, options=opts, chordal_init=True, schedule="fused")

t0 = time.time()
res = solve_graph_parametric(build(), **kw)
warm = time.time() - t0
print(f"warmup {warm:.1f}s", flush=True)

walls = []
for rep in range(3):
    fg = build()
    t0 = time.time()
    res = solve_graph_parametric(fg, **kw)
    walls.append(time.time() - t0)
st = res["stats"]

gt = np.load(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), gtf))
poses = gt["poses"]
errs = []
for lbl in fg.ls(r"^x\d+$"):
    est = fg.get_coords(lbl, "parametric")
    errs.append(np.sum((est[:2] - poses[int(lbl[1:])][:2]) ** 2))
ate = float(np.sqrt(np.mean(errs)))

out = dict(
    dataset=name, linear="ndchol", jitter=jitter, dtol=dtol,
    warmup_s=round(warm, 2), walls_s=[round(w, 3) for w in walls],
    best_wall_s=round(min(walls), 3), iters=st.iterations,
    converged=st.converged, reason=st.reason,
    final_cost=st.final_cost, ref_cost=float(gt["final_cost"]),
    ate_rmse_m=round(ate, 6),
    cg=[h["cg"] for h in st.history],
    accepted=[h["accepted"] for h in st.history],
)
print(json.dumps(out), flush=True)
