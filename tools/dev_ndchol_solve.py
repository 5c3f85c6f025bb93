"""Dev check: full LM solve with linear='ndchol' vs 'dense32' on CPU."""
import os, sys, time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, "/root/repo")

import numpy as np
from rome_tpu import MvNormal, PriorPose2, GNOptions, solve_graph_parametric
from rome_tpu.io.g2o import load_g2o

path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/examples/MIT.g2o"
schedule = sys.argv[2] if len(sys.argv) > 2 else "fused"


def build():
    fg = load_g2o(None, path)
    fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])),
                  graphinit=False)
    fg.init_all()
    return fg


for linear, jit_ in [("ndchol", 1e-7), ("dense32", 1e-7)]:
    opts = GNOptions(
        max_iters=30, linear=linear, polish_tol=1e-6, polish_iters=60,
        lam0=1e-6, lam_down=0.1, lam_min=1e-12, chol_jitter=jit_,
        dtol=0.05, ftol=1e-9, gtol=1e-8,
    )
    fg = build()
    t0 = time.time()
    res = solve_graph_parametric(
        fg, init=False, options=opts, chordal_init=True, schedule=schedule
    )
    st = res["stats"]
    print(
        f"{linear}: cost={st.final_cost:.6f} iters={st.iterations} "
        f"conv={st.converged} reason={st.reason} wall={time.time()-t0:.2f}s "
        f"cg={[h['cg'] for h in st.history]}"
    )
