"""Round-5 phase profile of the flagship M3500 ndchol solve (real chip).

Breaks the 0.5 s bench wall into: chordal init (warm), per-LM-step wall
(via solve_host), and isolated per-phase programs (f64 linearize, f32
assemble+factorize, f64 cost eval) at M3500 size — the data for the
fixed-cost cuts of VERDICT r4 #1.
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
from rome_tpu.solvers.gauss_newton import ParametricSolver
from rome_tpu.solvers.linearize import (
    linearize_all, runtime_state, cost_at, normal_eq_entry_values,
    free_vector,
)
from rome_tpu.solvers.init2d import chordal_init_pose2

NDLEAF = int(os.environ.get("NDLEAF", "32"))

fg = load_g2o(None, "/root/reference/examples/manhattan.g2o")
fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])), graphinit=False)
fg.init_all()
ga = lower(fg, "parametric", dtype=jnp.float32)
import copy
ga64 = copy.copy(ga); ga64.dtype = jnp.float64
rt = runtime_state(ga)

def wall(fn, *a, reps=5, label=""):
    out = fn(*a); jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time(); out = fn(*a); jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print(f"{label:34s} med {np.median(ts)*1e3:8.2f} ms  min {min(ts)*1e3:8.2f}", flush=True)
    return out

# ---- chordal init ----------------------------------------------------------
t0 = time.time()
v1 = chordal_init_pose2(ga, ga.values0)
jax.block_until_ready(v1["Pose2"])
print(f"chordal first (compile+run): {time.time()-t0:.2f} s", flush=True)
wall(lambda: chordal_init_pose2(ga, ga.values0)["Pose2"], label="chordal_init warm")

# ---- solver programs -------------------------------------------------------
opts = GNOptions(
    max_iters=30, linear="ndchol", polish_tol=5e-2, nd_leaf=NDLEAF,
    polish_iters=60, lam0=1e-6, lam_down=0.1, lam_min=1e-12,
    chol_jitter=1e-7, dtol=0.25, ftol=1e-9, gtol=1e-8,
)
solver = ParametricSolver(ga, opts)
v64 = {t: jnp.asarray(v, jnp.float64) for t, v in v1.items()}

# per-step wall via the step program
symr = solver._sym_for_rt(rt)
rt_nd = {**rt, "ndchol": symr._dev}
step_fn, loop_fn = solver._programs_for(symr)
lam = jnp.asarray(opts.lam0, jnp.float32)
pstate = solver._pstate0()
vals = v64
print("-- per-step wall (solve_host path) --", flush=True)
t_first = time.time()
out = step_fn(vals, lam, rt_nd, pstate)
jax.block_until_ready(out[0]["Pose2"])
print(f"step first (compile+run): {time.time()-t_first:.2f} s", flush=True)
for it in range(9):
    t0 = time.time()
    vals, lam, c0, c1, gn, dn, ok, pstate, exact, cgk = step_fn(vals, lam, rt_nd, pstate)
    jax.block_until_ready(vals["Pose2"])
    dt = time.time() - t0
    c0f, c1f, cgi, okf, dnf = jax.device_get((c0, c1, cgk, ok, dn))
    print(f"it {it}: {dt*1e3:7.1f} ms  cost0 {c0f:12.4f} cost1 {c1f:12.4f} cg {int(cgi)} ok {bool(okf)} dn {dnf:.3f}", flush=True)

# fused loop wall
t0 = time.time()
res = solver.solve(v1, rt=rt)
print(f"fused loop first: {time.time()-t0:.2f} s  iters {res[1].iterations}", flush=True)
for _ in range(3):
    t0 = time.time()
    res = solver.solve(v1, rt=rt)
    print(f"fused loop warm: {time.time()-t0:.3f} s  iters {res[1].iterations}", flush=True)

# ---- isolated phases -------------------------------------------------------
print("-- isolated phase programs --", flush=True)
lin_f = jax.jit(lambda v: [(r0, Js) for _b, r0, Js, _vs in linearize_all(ga64, v, rt)])
wall(lin_f, v64, label="linearize_all f64 (r+J)")
cost_f = jax.jit(lambda v: cost_at(ga64, v, rt, accum_dtype=jnp.float64))
wall(cost_f, v64, label="cost_at f64")

lins = lin_f(v64)
lins_full = linearize_all(ga64, v64, rt)

def assemble_factorize(v):
    from rome_tpu.solvers.sparse import ndchol_assemble, ndchol_factorize
    lins = linearize_all(ga64, v, rt)
    nd = rt_nd["ndchol"]
    vals_ = normal_eq_entry_values(ga64, lins, dtype=jnp.float32)
    fvec32 = free_vector(ga64, rt).astype(jnp.float32)
    diag_H = (
        jnp.zeros(symr.D, jnp.float32)
        .at[nd["diag_dst"]]
        .add(vals_[nd["diag_src"]] * fvec32[nd["diag_dst"]] ** 2)
    )
    dv = jax.lax.rsqrt(jnp.maximum(diag_H, 1e-12))
    df = dv * fvec32
    diag_add = fvec32 * 1e-7 + (1.0 - fvec32)
    Ws = ndchol_assemble(symr, nd, vals_, df, diag_add)
    Linvs, L21s, _ = ndchol_factorize(symr, nd, Ws)
    return Linvs[0]

wall(jax.jit(assemble_factorize), v64, label="linearize+assemble+factorize")

print("nd_leaf", NDLEAF, "nlev", symr.nlev, "stats", {k: symr.stats[k] for k in ("n_nodes", "max_front", "padded_front_entries")}, flush=True)
os._exit(0)
