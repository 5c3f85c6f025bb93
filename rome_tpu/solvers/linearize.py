"""Batched residual / Jacobian evaluation — THE hot loop of the framework.

Reference analogue: the per-particle / per-factor residual functors invoked
inside IIF's approxConv and parametric solve (SURVEY.md §3.2-3.3). Here every
factor type linearizes as ONE vmapped jacfwd over its dense batch: gathers
from per-type variable arrays, small-dof forward-mode Jacobians on the VPU,
scatter-adds (segment sums) back into per-type tangent arrays. No indirection
survives into XLA — just gathers, batched small matmuls, and scatters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rome_tpu.graph.lower import FactorBatch, GraphArrays


def _whitened_residual_fn(ga: GraphArrays, batch: FactorBatch):
    mans = [ga.manifolds[t] for t in batch.vtypes]
    resid = batch.ftype.residual

    def f(deltas, params, pts):
        newpts = tuple(m.boxplus(p, d) for m, p, d in zip(mans, pts, deltas))
        raw = resid(params, *newpts)
        return params["sqrt_info"] @ raw

    return f


def _gather_points(values, batch: FactorBatch):
    return tuple(
        values[t][batch.vslots[:, k]] for k, t in enumerate(batch.vtypes)
    )


def batch_residual(ga: GraphArrays, batch: FactorBatch, values):
    """Whitened residuals at the current values: (n, zdim)."""
    f = _whitened_residual_fn(ga, batch)
    pts = _gather_points(values, batch)
    mans = [ga.manifolds[t] for t in batch.vtypes]
    zeros = tuple(
        jnp.zeros((batch.n, m.dof), dtype=ga.dtype) for m in mans
    )
    r = jax.vmap(f)(zeros, batch.params, pts)
    return r * batch.weight[:, None]


def batch_linearize(ga: GraphArrays, batch: FactorBatch, values):
    """Whitened residuals and per-slot Jacobians wrt local tangent deltas.

    Returns (r0 (n, zdim), Js tuple of (n, zdim, dof_k)).
    """
    f = _whitened_residual_fn(ga, batch)
    pts = _gather_points(values, batch)
    mans = [ga.manifolds[t] for t in batch.vtypes]
    zeros = tuple(jnp.zeros((batch.n, m.dof), dtype=ga.dtype) for m in mans)

    def f_and_jac(deltas, params, p):
        r = f(deltas, params, p)
        J = jax.jacfwd(f, argnums=0)(deltas, params, p)
        return r, J

    r0, Js = jax.vmap(f_and_jac)(zeros, batch.params, pts)
    w = batch.weight
    r0 = r0 * w[:, None]
    Js = tuple(J * w[:, None, None] for J in Js)
    return r0, Js


def linearize_all(ga: GraphArrays, values):
    """Linearize every batch. Returns list of (batch, r0, Js)."""
    return [(b,) + batch_linearize(ga, b, values) for b in ga.batches]


def cost_at(ga: GraphArrays, values):
    """0.5 * sum of squared whitened residuals (the LM objective)."""
    c = jnp.zeros((), dtype=ga.dtype)
    for b in ga.batches:
        r = batch_residual(ga, b, values)
        c = c + 0.5 * jnp.sum(r * r)
    return c


def gradient_from_lins(ga: GraphArrays, lins):
    """g = J^T r as a per-type tangent pytree, masked by free."""
    g = ga.tangent_zeros()
    for batch, r0, Js in lins:
        for k, t in enumerate(batch.vtypes):
            contrib = jnp.einsum("nij,ni->nj", Js[k], r0)
            g[t] = g[t].at[batch.vslots[:, k]].add(contrib)
    return {t: g[t] * ga.free[t][:, None] for t in g}


def hvp_from_lins(ga: GraphArrays, lins, v):
    """(J^T J) v as a tangent pytree (Gauss-Newton Hessian-vector product)."""
    out = ga.tangent_zeros()
    for batch, _r0, Js in lins:
        u = jnp.zeros((batch.n, batch.ftype.zdim), dtype=ga.dtype)
        for k, t in enumerate(batch.vtypes):
            vk = v[t][batch.vslots[:, k]] * ga.free[t][batch.vslots[:, k], None]
            u = u + jnp.einsum("nij,nj->ni", Js[k], vk)
        for k, t in enumerate(batch.vtypes):
            out[t] = out[t].at[batch.vslots[:, k]].add(
                jnp.einsum("nij,ni->nj", Js[k], u)
            )
    return {t: out[t] * ga.free[t][:, None] for t in out}


def block_diag_from_lins(ga: GraphArrays, lins):
    """Per-variable dof x dof diagonal blocks of J^T J (block-Jacobi)."""
    D = {
        t: jnp.zeros((ga.counts[t], ga.manifolds[t].dof, ga.manifolds[t].dof), dtype=ga.dtype)
        for t in ga.type_names
    }
    for batch, _r0, Js in lins:
        for k, t in enumerate(batch.vtypes):
            blk = jnp.einsum("nij,nik->njk", Js[k], Js[k])
            D[t] = D[t].at[batch.vslots[:, k]].add(blk)
    return D


# ---------------------------------------------------------------------------
# dense assembly (small graphs + covariance recovery)
# ---------------------------------------------------------------------------

def tangent_offsets(ga: GraphArrays):
    """Global dense offsets: type -> base offset; total dof D."""
    base, off = {}, 0
    for t in ga.type_names:
        base[t] = off
        off += ga.counts[t] * ga.manifolds[t].dof
    return base, off


def flatten_tangent(ga: GraphArrays, v):
    return jnp.concatenate([v[t].reshape(-1) for t in ga.type_names])


def unflatten_tangent(ga: GraphArrays, x):
    out, off = {}, 0
    for t in ga.type_names:
        n, d = ga.counts[t], ga.manifolds[t].dof
        out[t] = x[off : off + n * d].reshape(n, d)
        off += n * d
    return out


def free_vector(ga: GraphArrays):
    return jnp.concatenate(
        [
            jnp.repeat(ga.free[t], ga.manifolds[t].dof)
            for t in ga.type_names
        ]
    )


def dense_normal_eqs(ga: GraphArrays, lins):
    """Assemble dense H = J^T J and g = J^T r over the global tangent.

    Frozen (free=0) dims get an identity row/col so H stays invertible and
    their update is exactly zero — this is how fixed-lag freezing
    (testFixedLagFG.jl bit-stability) is realized in the parametric path.
    """
    base, D = tangent_offsets(ga)
    H = jnp.zeros((D, D), dtype=ga.dtype)
    g = jnp.zeros((D,), dtype=ga.dtype)
    for batch, r0, Js in lins:
        offs = []
        for k, t in enumerate(batch.vtypes):
            d = ga.manifolds[t].dof
            o = base[t] + batch.vslots[:, k] * d  # (n,)
            offs.append(o[:, None] + jnp.arange(d)[None, :])  # (n, d)
        for k in range(len(batch.vtypes)):
            g = g.at[offs[k]].add(jnp.einsum("nij,ni->nj", Js[k], r0))
            for l in range(len(batch.vtypes)):
                blk = jnp.einsum("nij,nik->njk", Js[k], Js[l])
                H = H.at[offs[k][:, :, None], offs[l][:, None, :]].add(blk)
    f = free_vector(ga)
    H = H * (f[:, None] * f[None, :]) + jnp.diag(1.0 - f)
    g = g * f
    return H, g
