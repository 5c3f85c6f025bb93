"""Round-5 FENCED phase isolation of the M3500 ndchol iteration.

Every prior phase profile used jax.block_until_ready, which does NOT block
over the tunneled device — those numbers misattributed time via dispatch
backpressure. Here every timed program returns ONE scalar and the fence is
float() (a device_get). The ~10 ms RTT is reported and subtracted.
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
    linearize_all, linearize_all_mixed_j, runtime_state, cost_at,
    normal_eq_entry_values, free_vector, gradient_from_lins,
    flatten_tangent,
)
from rome_tpu.solvers.init2d import chordal_init_pose2

fg = load_g2o(None, "/root/reference/examples/manhattan.g2o")
fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])), graphinit=False)
fg.init_all()
ga = lower(fg, "parametric", dtype=jnp.float32)
import copy
ga64 = copy.copy(ga); ga64.dtype = jnp.float64
rt = runtime_state(ga)
opts = GNOptions(
    max_iters=30, linear="ndchol", polish_tol=5e-2, nd_leaf=32,
    polish_iters=60, lam0=1e-6, lam_down=0.1, lam_min=1e-12,
    chol_jitter=1e-7, dtol=0.25, ftol=1e-9, gtol=1e-8,
)
solver = ParametricSolver(ga, opts)
sym = solver._sym
nd = {k: v for k, v in sym._dev.items()}
v1 = chordal_init_pose2(ga, ga.values0)
v64 = {t: jnp.asarray(v, jnp.float64) for t, v in v1.items()}

# RTT floor: a no-op scalar program
rtt_f = jax.jit(lambda x: x + 1.0)
float(rtt_f(jnp.zeros(())))
rtts = []
for _ in range(7):
    t0 = time.perf_counter(); float(rtt_f(jnp.zeros(()))); rtts.append(time.perf_counter() - t0)
RTT = float(np.median(rtts))
print(f"RTT floor: {RTT*1e3:.1f} ms", flush=True)


def timeit(label, fn, *a, reps=7):
    float(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(fn(*a)); ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) - RTT
    print(f"{label:36s} {med*1e3:8.2f} ms (raw med {np.median(ts)*1e3:.2f})", flush=True)
    return med


f32 = jnp.float32

def s_of(lins):
    return sum(jnp.sum(r) for _b, r, Js, _v in lins) + sum(
        jnp.sum(J) for _b, _r, Js, _v in lins for J in Js
    )

timeit("linearize f64 (r+J)", jax.jit(lambda v: s_of(linearize_all(ga64, v, rt))), v64)
timeit("linearize mixed (r64+J32)", jax.jit(lambda v: s_of(linearize_all_mixed_j(ga64, ga, v, rt))), v64)
timeit("residuals-only f64 (cost_at)", jax.jit(lambda v: cost_at(ga64, v, rt, accum_dtype=jnp.float64)), v64)

def assemble_only(v):
    lins = linearize_all_mixed_j(ga64, ga, v, rt)
    vals = normal_eq_entry_values(ga64, lins, dtype=f32)
    return jnp.sum(vals)

timeit("mixed-lin + entry values", jax.jit(assemble_only), v64)

def asm_fact(v):
    from rome_tpu.solvers.sparse import ndchol_assemble, ndchol_factorize
    lins = linearize_all_mixed_j(ga64, ga, v, rt)
    vals = normal_eq_entry_values(ga64, lins, dtype=f32)
    fvec32 = free_vector(ga64, rt).astype(f32)
    diag_H = (
        jnp.zeros(sym.D, f32).at[nd["diag_dst"]]
        .add(vals[nd["diag_src"]] * fvec32[nd["diag_dst"]] ** 2)
    )
    dv = jax.lax.rsqrt(jnp.maximum(diag_H, 1e-12))
    df = dv * fvec32
    diag_add = fvec32 * 1e-7 + (1.0 - fvec32)
    Ws = ndchol_assemble(sym, nd, vals, df, diag_add)
    Linvs, L21s, _ = ndchol_factorize(sym, nd, Ws)
    return sum(jnp.sum(L) for L in Linvs if L is not None)

timeit("mixed-lin + asm + factorize", jax.jit(asm_fact), v64)

def fact_plus_k_minv(v, k):
    from rome_tpu.solvers.sparse import (
        ndchol_assemble, ndchol_factorize, ndchol_solve,
    )
    lins = linearize_all_mixed_j(ga64, ga, v, rt)
    vals = normal_eq_entry_values(ga64, lins, dtype=f32)
    fvec32 = free_vector(ga64, rt).astype(f32)
    diag_H = (
        jnp.zeros(sym.D, f32).at[nd["diag_dst"]]
        .add(vals[nd["diag_src"]] * fvec32[nd["diag_dst"]] ** 2)
    )
    dv = jax.lax.rsqrt(jnp.maximum(diag_H, 1e-12))
    df = dv * fvec32
    diag_add = fvec32 * 1e-7 + (1.0 - fvec32)
    Ws = ndchol_assemble(sym, nd, vals, df, diag_add)
    Linvs, L21s, _ = ndchol_factorize(sym, nd, Ws)
    g = gradient_from_lins(ga64, lins, rt)
    b = -flatten_tangent(ga64, g).astype(f32)

    def body(i, x):
        return ndchol_solve(sym, nd, Linvs, L21s, x * df) * df

    x = jax.lax.fori_loop(0, k, body, b)
    return jnp.sum(x)

for k in (1, 5, 10):
    timeit(f"... + {k:2d} chained minv solves",
           jax.jit(lambda v, _k=k: fact_plus_k_minv(v, _k)), v64)
os._exit(0)
