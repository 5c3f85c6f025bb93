import time, numpy as np
import jax
jax.config.update("jax_default_matmul_precision", "highest")
from rome_tpu import MvNormal, PriorPose2, GNOptions, solve_graph_parametric
from rome_tpu.io.g2o import load_g2o

fg = load_g2o(None, "/root/reference/examples/manhattan.g2o")
fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])), graphinit=False)
fg.init_all()

for linear, iters in [("dense", 30)]:
    opts = GNOptions(max_iters=iters, linear=linear, lam0=1e-4, ftol=1e-7)
    t0 = time.time(); res = solve_graph_parametric(fg, init=False, options=opts, chordal_init=True); dt_w = time.time()-t0
    t0 = time.time(); res = solve_graph_parametric(fg, init=False, options=opts, chordal_init=True); dt = time.time()-t0
    st = res["stats"]
    print(f"{linear}: warm={dt_w:.1f}s steady={dt:.2f}s iters={st.iterations} conv={st.converged} cost={st.final_cost:.2f}")
    h = np.asarray(st.history)[:st.iterations]
    for i in range(0, st.iterations):
        print(f"  it{i}: c0={h[i,0]:.1f} c1={h[i,1]:.1f} |g|={h[i,2]:.2g} |d|={h[i,3]:.2g} ok={h[i,4]:.0f} lam={h[i,5]:.2g}")
