"""Round-3 perf triage: microbenchmark every component of the M3500 solve.

Answers: where do the 55 x 0.23s LM iterations go, and what does each dense
linear-algebra primitive cost at n=10,518 on this chip?
"""
from __future__ import annotations

import sys
import time

import jax

from rome_tpu.utils.compile_cache import enable as enable_compile_cache

enable_compile_cache()
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=3, warm=1):
    for _ in range(warm):
        out = fn(*args)
        jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    from rome_tpu import MvNormal, PriorPose2
    from rome_tpu.graph.lower import lower
    from rome_tpu.io.g2o import load_g2o
    from rome_tpu.solvers.linearize import (
        dense_normal_eqs, linearize_all, runtime_state, hvp_from_lins,
        gradient_from_lins, tangent_offsets,
    )

    fg = load_g2o(None, "/root/reference/examples/manhattan.g2o")
    fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])),
                  graphinit=False)
    fg.init_all()
    ga = lower(fg, "parametric", dtype=jnp.float32)
    rt = runtime_state(ga)
    _base, nD = tangent_offsets(ga)
    print(f"nD={nD}", flush=True)

    values = ga.values0
    from rome_tpu.solvers.init2d import chordal_init_pose2
    t0 = time.time()
    values = chordal_init_pose2(ga, values)
    jax.block_until_ready(values["Pose2"])
    print(f"chordal_init first-call: {time.time()-t0:.2f}s", flush=True)

    # cost after chordal init
    from rome_tpu.solvers.linearize import cost_at
    c = jax.jit(lambda v: cost_at(ga, v, rt))(values)
    print(f"cost after chordal init: {float(c):.3f}  (optimum 1774.457)", flush=True)

    # --- per-batch cost breakdown after chordal init ---
    from rome_tpu.solvers.linearize import batch_residual
    for i, b in enumerate(ga.batches):
        r = jax.jit(lambda v, i=i, b=b: batch_residual(
            ga, b, v, rt["params"][i], rt["vslots"][i], rt["weight"][i]))(values)
        r = np.asarray(r)
        print(f"  batch {b.ftype.name} n={b.n} cost={0.5*float((r*r).sum()):.1f} "
              f"max|r|={float(np.abs(r).max()):.2f}", flush=True)

    # --- linearize ---
    lin_j = jax.jit(lambda v: [(r0, Js) for _b, r0, Js, _vs in linearize_all(ga, v, rt)])
    dt, _ = timeit(lin_j, values)
    print(f"linearize_all f32: {dt*1e3:.2f} ms", flush=True)
    lins = linearize_all(ga, values, rt)

    # --- dense assembly f32 / f64 ---
    f32asm = jax.jit(lambda v: dense_normal_eqs(ga, linearize_all(ga, v, rt), dtype=jnp.float32, rt=rt))
    dt, (H32, g32) = timeit(f32asm, values)
    print(f"linearize + dense_normal_eqs f32: {dt*1e3:.2f} ms", flush=True)
    f64asm = jax.jit(lambda v: dense_normal_eqs(ga, linearize_all(ga, v, rt), dtype=jnp.float64, rt=rt))
    dt, (H64, g64) = timeit(f64asm, values)
    print(f"linearize + dense_normal_eqs f64: {dt*1e3:.2f} ms", flush=True)

    # --- cholesky f32 ---
    Hd = H32 + 1e-3 * jnp.eye(nD, dtype=jnp.float32)
    chol = jax.jit(lambda H: jax.scipy.linalg.cho_factor(H, lower=True)[0])
    dt, L = timeit(chol, Hd)
    print(f"cho_factor f32 n={nD}: {dt*1e3:.2f} ms", flush=True)

    # --- single trisolve pair ---
    b = g32
    def solve1(L, b):
        y = jax.lax.linalg.triangular_solve(L, b[None, :], left_side=False,
                                            lower=True, transpose_a=False)
        x = jax.lax.linalg.triangular_solve(L, y, left_side=False,
                                            lower=True, transpose_a=True)
        return x
    dt, _ = timeit(jax.jit(solve1), L, b)
    print(f"trisolve pair (1 rhs): {dt*1e3:.2f} ms", flush=True)

    # --- cho_solve 1 rhs ---
    chos = jax.jit(lambda L, b: jax.scipy.linalg.cho_solve((L, True), b))
    dt, _ = timeit(chos, L, b)
    print(f"cho_solve (1 rhs): {dt*1e3:.2f} ms", flush=True)

    # --- explicit inverse via current blocked lax.map ---
    def blocked_inv(L):
        blk = 1024
        npad = (-nD) % blk
        eyeP = jnp.eye(nD + npad, dtype=jnp.float32)[: nD + npad, :nD]
        cols = eyeP.reshape(-1, blk, nD)
        def solve_block(c):
            return jax.lax.linalg.triangular_solve(
                L, c, left_side=False, lower=True, transpose_a=False)
        return jax.lax.map(solve_block, cols).reshape(nD + npad, nD)[:nD]
    dt, Linv = timeit(jax.jit(blocked_inv), L, n=2)
    print(f"blocked Linv (lax.map): {dt*1e3:.2f} ms", flush=True)

    # --- recursive block triangular inverse (matmul-rich) ---
    def tri_inv(L, leaf=256):
        n = L.shape[0]
        if n <= leaf:
            return jax.lax.linalg.triangular_solve(
                L, jnp.eye(n, dtype=L.dtype), left_side=True, lower=True)
        m = n // 2
        # round m to multiple of 256 for MXU alignment
        m = max(256, (m // 256) * 256)
        A = L[:m, :m]; B = L[m:, :m]; C = L[m:, m:]
        Ai = tri_inv(A, leaf)
        Ci = tri_inv(C, leaf)
        BA = -Ci @ (B @ Ai)
        top = jnp.concatenate([Ai, jnp.zeros((m, n - m), L.dtype)], axis=1)
        bot = jnp.concatenate([BA, Ci], axis=1)
        return jnp.concatenate([top, bot], axis=0)
    dt, Linv2 = timeit(jax.jit(tri_inv), L, n=2)
    err = float(jnp.max(jnp.abs(Linv2 - Linv)))
    print(f"recursive tri_inv: {dt*1e3:.2f} ms (maxdiff vs lax.map {err:.2e})", flush=True)

    # --- dense matvec f32 ---
    mv = jax.jit(lambda A, x: A @ x)
    dt, _ = timeit(mv, Hd, b)
    print(f"dense matvec f32: {dt*1e3:.3f} ms", flush=True)

    # --- f64 sparse hvp ---
    import copy
    ga64 = copy.copy(ga); ga64.dtype = jnp.float64
    lins64_j = jax.jit(lambda l: [
        (None, r0.astype(jnp.float64), tuple(J.astype(jnp.float64) for J in Js), vs)
        for _b, r0, Js, vs in l])
    v64 = {t: jnp.zeros((ga.counts[t], ga.manifolds[t].dof), jnp.float64) + 0.01
           for t in ga.type_names}
    rt64 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float64) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, rt)
    def hvp64(vals, v):
        l = linearize_all(ga, vals, rt)
        l64 = [(ga.batches[i], r0.astype(jnp.float64),
                tuple(J.astype(jnp.float64) for J in Js), vs)
               for i, (_b, r0, Js, vs) in enumerate(l)]
        return hvp_from_lins(ga64, l64, v, rt64)
    dt, _ = timeit(jax.jit(hvp64), values, v64)
    print(f"linearize + f64 sparse hvp: {dt*1e3:.3f} ms", flush=True)

    # --- f32 sparse hvp ---
    v32 = {t: jnp.zeros((ga.counts[t], ga.manifolds[t].dof), jnp.float32) + 0.01
           for t in ga.type_names}
    dt, _ = timeit(jax.jit(lambda vals, v: hvp_from_lins(ga, linearize_all(ga, vals, rt), v, rt)), values, v32)
    print(f"linearize + f32 sparse hvp: {dt*1e3:.3f} ms", flush=True)

    # --- f64 dense matvec ---
    dt, _ = timeit(mv, H64, g64)
    print(f"dense matvec f64: {dt*1e3:.3f} ms", flush=True)

    # --- full current mixed step ---
    from rome_tpu.solvers.gauss_newton import GNOptions, ParametricSolver
    opts = GNOptions(max_iters=60, linear="mixed", lam0=1e-5, lam_down=0.1,
                     ftol=5e-9, mixed_cg_iters=50)
    solver = ParametricSolver(ga, opts)
    lam = jnp.asarray(1e-5, jnp.float32)
    ps = solver._pstate0()
    t0 = time.time()
    out = solver._step(values, lam, rt, ps)
    jax.block_until_ready(out[0]["Pose2"])
    print(f"mixed step first call (compile+run): {time.time()-t0:.2f}s", flush=True)
    ps1 = out[7]
    dt, out2 = timeit(lambda: solver._step(values, lam, rt, ps1), n=3)
    print(f"mixed step steady (stale={bool(ps1['stale'])}): {dt*1e3:.1f} ms", flush=True)
    # force stale
    ps_stale = dict(ps1); ps_stale["stale"] = jnp.asarray(True)
    dt, _ = timeit(lambda: solver._step(values, lam, rt, ps_stale), n=2)
    print(f"mixed step with refresh: {dt*1e3:.1f} ms", flush=True)

    # --- host-loop solve to get the actual iteration trace ---
    t0 = time.time()
    vals, stats = solver.solve_host(values, rt)
    dtH = time.time() - t0
    print(f"solve_host: {dtH:.2f}s iters={stats.iterations} conv={stats.converged} "
          f"cost={stats.final_cost:.3f} reason={stats.reason}", flush=True)
    for h in stats.history[:60]:
        print("  ", {k: (round(v, 4) if isinstance(v, float) else v) for k, v in h.items()}, flush=True)


if __name__ == "__main__":
    main()
