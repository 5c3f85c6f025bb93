"""Phase breakdown of one dense32 LM iteration on M3500 (real chip):
linearize / assemble+factor / trisolve-pair (minv) / matrix-free f64 hvp /
full CG. Each phase timed as its own jitted program, steady-state."""
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
from rome_tpu.solvers.linearize import (
    linearize_all, dense_normal_eqs, runtime_state, gradient_from_lins,
    hvp_from_lins, flatten_tangent, unflatten_tangent, free_vector,
)
from rome_tpu.solvers.init2d import chordal_init_pose2

fg = load_g2o(None, "/root/reference/examples/manhattan.g2o")
fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])), graphinit=False)
fg.init_all()
ga = lower(fg, "parametric", dtype=jnp.float32)
import copy
ga64 = copy.copy(ga); ga64.dtype = jnp.float64
rt = runtime_state(ga)
v1 = chordal_init_pose2(ga, ga.values0)
v64 = {t: jnp.asarray(v, jnp.float64) for t, v in v1.items()}

def timeit(name, fn, *args, reps=5):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps * 1000
    print(f"{name:28s} {dt:8.2f} ms", flush=True)
    return out

lin_f = jax.jit(lambda v: [ (r0, Js) for _b, r0, Js, _vs in linearize_all(ga64, v, rt)])
lins_flat = timeit("linearize_all (f64)", lin_f, v64)

def assemble(v):
    lins = linearize_all(ga64, v, rt)
    H, g = dense_normal_eqs(ga64, lins, dtype=jnp.float32, rt=rt)
    return H, g
H, _ = timeit("linearize+assemble H (f32)", jax.jit(assemble), v64)

lam = jnp.asarray(1e-9, jnp.float32)
def factor(H):
    diag = jnp.maximum(jnp.diag(H), 1e-8)
    Hd = H + lam * jnp.diag(diag)
    d = 1.0 / jnp.sqrt(jnp.maximum(jnp.diag(Hd), 1e-12))
    Hs = Hd * d[:, None] * d[None, :] + 2e-6 * jnp.eye(H.shape[0], dtype=jnp.float32)
    L, _ = jax.scipy.linalg.cho_factor(Hs, lower=True)
    return L, d
(L, d) = timeit("damp+scale+cho_factor", jax.jit(factor), H)

b32 = jnp.ones((H.shape[0],), jnp.float32)
def minv(L, d, r):
    y = jax.scipy.linalg.cho_solve((L, True), r * d)
    return y * d
timeit("minv trisolve pair (f32)", jax.jit(minv), L, d, b32)

# matrix-free f64 hvp through factor batches
x64 = jnp.ones((H.shape[0],), jnp.float64)
fvec = free_vector(ga64, rt).astype(jnp.float64)
def hD(v64_, x):
    lins = linearize_all(ga64, v64_, rt)
    v = unflatten_tangent(ga64, x)
    out = hvp_from_lins(ga64, lins, v, rt)
    return flatten_tangent(ga64, out) * fvec
# NOTE: re-linearizes inside; subtract the 13 ms linearize cost
timeit("f64 hvp (incl re-linearize)", jax.jit(hD), v64, x64)

# dense double-single matvec alternative
H64_fn = jax.jit(lambda v: dense_normal_eqs(ga64, linearize_all(ga64, v, rt), dtype=jnp.float64, rt=rt)[0])
H64 = H64_fn(v64)
H_hi = H64.astype(jnp.float32)
H_lo = (H64 - H_hi.astype(jnp.float64)).astype(jnp.float32)
def ds_matvec(H_hi, H_lo, x):
    xh = x.astype(jnp.float32)
    xl = (x - xh.astype(jnp.float64)).astype(jnp.float32)
    return (H_hi @ xh).astype(jnp.float64) + (H_hi @ xl).astype(jnp.float64) + (H_lo @ xh).astype(jnp.float64)
timeit("dense double-single matvec", jax.jit(ds_matvec), H_hi, H_lo, x64)

def f32_matvec(H_hi, x):
    return H_hi @ x
timeit("dense f32 matvec", jax.jit(f32_matvec), H_hi, b32)

# 50-iteration CG (minv + hvp) as one program
def cg50(v64_, L, d, b):
    lins = linearize_all(ga64, v64_, rt)

    def hD_(x):
        v = unflatten_tangent(ga64, x)
        out = hvp_from_lins(ga64, lins, v, rt)
        return flatten_tangent(ga64, out) * fvec

    def minv_(r):
        y = jax.scipy.linalg.cho_solve((L, True), r.astype(jnp.float32) * d)
        return (y * d).astype(jnp.float64)

    x = minv_(b)
    r = b - hD_(x)
    z = minv_(r)
    p = z
    rz = jnp.vdot(r, z)

    def body(k, s):
        x, r, z, p, rz = s
        Ap = hD_(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = minv_(r)
        rz2 = jnp.vdot(r, z)
        p = z + (rz2 / rz) * p
        return (x, r, z, p, rz2)

    x, r, *_ = jax.lax.fori_loop(0, 50, body, (x, r, z, p, rz))
    return x
timeit("50-iter CG (hvp+minv)", jax.jit(cg50), v64, L, d, x64, reps=3)

# 50-iteration CG with the double-single dense matvec instead
def cg50_ds(H_hi, H_lo, L, d, b):
    def hD_(x):
        xh = x.astype(jnp.float32)
        xl = (x - xh.astype(jnp.float64)).astype(jnp.float32)
        return ((H_hi @ xh).astype(jnp.float64)
                + (H_hi @ xl).astype(jnp.float64)
                + (H_lo @ xh).astype(jnp.float64)) * fvec

    def minv_(r):
        y = jax.scipy.linalg.cho_solve((L, True), r.astype(jnp.float32) * d)
        return (y * d).astype(jnp.float64)

    x = minv_(b)
    r = b - hD_(x)
    z = minv_(r)
    p = z
    rz = jnp.vdot(r, z)

    def body(k, s):
        x, r, z, p, rz = s
        Ap = hD_(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = minv_(r)
        rz2 = jnp.vdot(r, z)
        p = z + (rz2 / rz) * p
        return (x, r, z, p, rz2)

    x, r, *_ = jax.lax.fori_loop(0, 50, body, (x, r, z, p, rz))
    return x
timeit("50-iter CG (ds-matvec+minv)", jax.jit(cg50_ds), H_hi, H_lo, L, d, x64, reps=3)
