"""Decompose the bench timed span on the real device: chordal init /
runtime_state / symbolic lookup / raw fused-loop dispatch."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

from rome_tpu.utils.compile_cache import enable as enable_compile_cache

enable_compile_cache()
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np

import bench as B
from rome_tpu.graph.lower import lower
from rome_tpu.solvers.gauss_newton import ParametricSolver
from rome_tpu.solvers.init2d import chordal_init_pose2
from rome_tpu.solvers.linearize import runtime_state

fg = B._build_graph(B.MANHATTAN)
opts = B._opts()["big"]
ga = lower(fg, "parametric", dtype=jnp.float32)

for rep in range(3):
    t0 = time.time()
    v0 = chordal_init_pose2(ga, ga.values0)
    jax.block_until_ready(v0["Pose2"])
    t1 = time.time()
    rt = runtime_state(ga)
    t2 = time.time()
    solver = ParametricSolver.cached(ga, opts)
    t3 = time.time()
    symr = solver._sym_for_rt(rt)
    rt2 = {**rt, "ndchol": symr._dev}
    t4 = time.time()
    _step, loop_fn = solver._programs_for(symr)
    lam = jnp.asarray(opts.lam0, dtype=ga.dtype)
    vals64 = {t: jnp.asarray(v, jnp.float64) for t, v in v0.items()}
    out = loop_fn(vals64, lam, rt2)
    jax.block_until_ready(out[0]["Pose2"])
    t5 = time.time()
    full0 = time.time()
    values, stats = solver.solve(dict(v0), rt=rt)
    full1 = time.time()
    print(
        f"rep{rep}: chordal {t1-t0:.3f} rt {t2-t1:.3f} cached {t3-t2:.3f} "
        f"sym {t4-t3:.3f} rawloop {t5-t4:.3f} | solver.solve {full1-full0:.3f} "
        f"iters {stats.iterations}",
        flush=True,
    )
