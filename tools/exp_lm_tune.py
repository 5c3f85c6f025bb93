"""Round-5 LM-loop tuning sweep on the real chip (after the chordal-init
cuts): nd_leaf x polish_tol, plus a fused_chordal validation row — every
config validated end-to-end (warm bench-path solve + ATE)."""
import os, sys, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rome_tpu.utils.compile_cache import enable as enable_compile_cache
enable_compile_cache()
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp

from rome_tpu import GNOptions, MvNormal, PriorPose2, solve_graph_parametric
from rome_tpu.io.g2o import load_g2o

GT = np.load(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "manhattan_gt.npz"))


def build():
    fg = load_g2o(None, "/root/reference/examples/manhattan.g2o")
    fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])),
                  graphinit=False)
    fg.init_all()
    return fg


CONFIGS = [
    # (nd_leaf, polish_tol, fused_chordal) — mixed_jacobians now defaults on
    (32, 5e-2, False),
    (32, 5e-2, True),
    (32, 1e-3, True),
]

for leaf, ptol, fused in CONFIGS:
    opts = GNOptions(
        max_iters=30, linear="ndchol", polish_tol=ptol, nd_leaf=leaf,
        polish_iters=60, lam0=1e-6, lam_down=0.1, lam_min=1e-12,
        chol_jitter=1e-7, dtol=0.25, ftol=1e-9, gtol=1e-8,
        fused_chordal=fused,
    )
    kw = dict(init=False, options=opts, chordal_init=True, schedule="fused")
    fg = build()
    t0 = time.time()
    res = solve_graph_parametric(fg, **kw)
    t_first = time.time() - t0
    best = float("inf")
    for _ in range(3):
        fg = build()
        res = solve_graph_parametric(fg, **kw)
        best = min(best, res["solve_time_s"])
    st = res["stats"]
    errs = []
    for lbl in fg.ls(r"^x\d+$"):
        i = int(lbl[1:])
        est = fg.get_coords(lbl, "parametric")
        errs.append(np.sum((est[:2] - GT["poses"][i][:2]) ** 2))
    ate = float(np.sqrt(np.mean(errs)))
    print(
        f"leaf {leaf:2d} ptol {ptol:.0e} fused {int(fused)}: "
        f"best {best:.3f} s  iters {st.iterations:2d}  reason {st.reason:10s}"
        f" cost {st.final_cost:.4f}  ATE {ate:.4f}  (first {t_first:.1f} s)",
        flush=True,
    )
os._exit(0)
