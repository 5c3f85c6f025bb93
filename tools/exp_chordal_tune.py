"""Round-5 chordal-init tuning sweep on the real chip.

The r5 profile put the warm chordal init at 176 ms of the ~470 ms M3500
solve. Levers swept here: ND leaf size of the 2-dof systems (tree depth),
preconditioner ridge, translation-stage CG tolerance. Every config is
validated END-TO-END (full bench-config ndchol LM solve + ATE vs the f64
ground truth) — tune-harness-only sweeps proved non-transferable in r4.
"""
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
import rome_tpu.solvers.init2d as I2

GT = np.load(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "manhattan_gt.npz"))


def build():
    fg = load_g2o(None, "/root/reference/examples/manhattan.g2o")
    fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])),
                  graphinit=False)
    fg.init_all()
    return fg


CONFIGS = [
    # (leaf, ridge, tol_trans)   — tol_rot stays 1e-7 everywhere
    (16, 1e-6, 1e-7),   # r4 baseline
    (32, 1e-6, 1e-7),
    (64, 1e-6, 1e-7),
    (64, 1e-7, 1e-7),
    (64, 1e-6, 1e-4),
    (64, 1e-7, 1e-4),
]

full = "--full" in sys.argv

for leaf, ridge, ttol in CONFIGS:
    I2._CHORDAL_LEAF = leaf
    I2._CHORDAL_RIDGE = ridge
    I2._CHORDAL_TOL_TRANS = ttol
    I2._CHORDAL_CACHE.clear()
    fg = build()
    ga = lower(fg, "parametric", dtype=jnp.float32)
    t0 = time.time()
    v1 = I2.chordal_init_pose2(ga, ga.values0)
    jax.block_until_ready(v1["Pose2"])
    t_compile = time.time() - t0
    ts = []
    for _ in range(5):
        t0 = time.time()
        out = I2.chordal_init_pose2(ga, ga.values0)
        jax.block_until_ready(out["Pose2"])
        ts.append(time.time() - t0)
    print(
        f"leaf {leaf:3d} ridge {ridge:.0e} ttol {ttol:.0e}: "
        f"warm med {np.median(ts)*1e3:7.1f} ms min {min(ts)*1e3:7.1f} "
        f"(compile {t_compile:.1f} s)", flush=True,
    )
    if full:
        from rome_tpu import solve_graph_parametric

        opts = GNOptions(
            max_iters=30, linear="ndchol", polish_tol=5e-2, nd_leaf=32,
            polish_iters=60, lam0=1e-6, lam_down=0.1, lam_min=1e-12,
            chol_jitter=1e-7, dtol=0.25, ftol=1e-9, gtol=1e-8,
        )
        fg2 = build()
        kw = dict(init=False, options=opts, chordal_init=True,
                  schedule="fused")
        res = solve_graph_parametric(fg2, **kw)
        fg2 = build()
        res = solve_graph_parametric(fg2, **kw)
        st = res["stats"]
        errs = []
        for lbl in fg2.ls(r"^x\d+$"):
            i = int(lbl[1:])
            est = fg2.get_coords(lbl, "parametric")
            errs.append(np.sum((est[:2] - GT["poses"][i][:2]) ** 2))
        ate = float(np.sqrt(np.mean(errs)))
        print(
            f"    full solve: {res['solve_time_s']:.3f} s  iters "
            f"{st.iterations}  cost {st.final_cost:.4f}  ATE {ate:.4f}",
            flush=True,
        )
os._exit(0)
