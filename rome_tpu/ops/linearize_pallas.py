"""Packed coordinate-plane Pallas linearize kernel for Pose2Pose2.

Round-4 diagnosis (BENCH_r04 roofline note): the production fused linearize
emits r as (n, 3) and each J as (n, 3, 3). On TPU the LAST dim maps to the
128-wide lane axis, so a 3-wide trailing dim fills 3/128 of every tile —
XLA moves up to ~42x the payload for the J tensors and the kernel ran at
1.4-2.4% of its HBM roofline.

This kernel keeps everything plane-major: ONE (24, n) input (rows = p, q, z,
sqrt_info, weight coordinate planes; n along lanes) and ONE (24, n) output
(rows = whitened r (3), whitened J1 (9, row-major), whitened J2 (9)). The
(8, 128) float32 tile is then filled 24/24 sublanes x n/128 lanes — moved
bytes are 192 B/eval vs the 160 B true payload (1.2x, vs ~42x before).

Math is identical to ops/fused_linearize.pose2pose2_linearize (derivation
header there; reference residual contract Pose2D.jl:48-67): exactness is
pinned by tests/test_linearize_pallas.py against the (n,3)-layout kernel.

Layout (input X, f32), shape (24, 8, n/8) — each plane is an (8, n/8)
slab so every elementwise op fills all 8 sublanes x 128 lanes of a VPU
tile (a flat (n,) plane would be laid out as (1, n) and run at 1/8 VPU
throughput — measured 442 M evals/s flat vs the full-sublane layout):
  planes 0-2   p  = (x, y, theta) of the first pose
  planes 3-5   q  = second pose
  planes 6-8   z  = measurement
  planes 9-17  S  = sqrt_info, row-major 3x3
  plane  18    w  = factor weight (solvable/hypo mask)
  planes 19-23 pad
Output Y (f32), same shape: planes 0-2 w*S@r; 3-11 w*S@J1; 12-20 w*S@J2.
Eval i lives at plane position (i // (n/8), i % (n/8)) — row-major over
the (8, n/8) slab; pack/unpack own the bijection.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 2.0 * np.pi
ROWS = 24          # plane count
_SUB = 8           # sublanes per plane slab
_BL = 1024         # lanes per grid block (per slab row)


def _wrap(x):
    return x - _TWO_PI * jnp.floor((x + np.pi) / _TWO_PI)


def _kernel(x_ref, y_ref):
    X = x_ref[:, :, :]
    px, py, pt = X[0], X[1], X[2]
    qx, qy, qt = X[3], X[4], X[5]
    zx, zy, zt = X[6], X[7], X[8]
    w = X[18]

    cp = jnp.cos(pt)
    sp = jnp.sin(pt)
    cq = jnp.cos(qt)
    sq = jnp.sin(qt)
    c1 = cp * cq + sp * sq          # cos(pt - qt)
    s1 = sp * cq - cp * sq          # sin(pt - qt)

    dx = px + cp * zx - sp * zy - qx
    dy = py + sp * zx + cp * zy - qy
    r0x = cq * dx + sq * dy
    r0y = -sq * dx + cq * dy
    r0t = _wrap(pt + zt - qt)

    # J1 = [[c1, -s1, a], [s1, c1, b], [0, 0, 1]], a/b = R(th1) J z_t
    a = -c1 * zy - s1 * zx
    b = -s1 * zy + c1 * zx
    one = jnp.ones_like(c1)
    zero = jnp.zeros_like(c1)
    # J2 = [[-1, 0, r0y], [0, -1, -r0x], [0, 0, -1]]

    # whiten + weight: row i of output block = w * sum_j S[i,j] * row j
    S = [[X[9 + 3 * i + j] for j in range(3)] for i in range(3)]
    r = [r0x, r0y, r0t]
    J1 = [[c1, -s1, a], [s1, c1, b], [zero, zero, one]]
    J2 = [[-one, zero, r0y], [zero, -one, -r0x], [zero, zero, -one]]

    for i in range(3):
        Si0, Si1, Si2 = S[i][0], S[i][1], S[i][2]
        y_ref[i, :, :] = w * (Si0 * r[0] + Si1 * r[1] + Si2 * r[2])
        for c in range(3):
            y_ref[3 + 3 * i + c, :, :] = w * (
                Si0 * J1[0][c] + Si1 * J1[1][c] + Si2 * J1[2][c]
            )
            y_ref[12 + 3 * i + c, :, :] = w * (
                Si0 * J2[0][c] + Si1 * J2[1][c] + Si2 * J2[2][c]
            )
    y_ref[21, :, :] = zero
    y_ref[22, :, :] = zero
    y_ref[23, :, :] = zero


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.jit
def pose2pose2_linearize_planes(X):
    """(24, 8, m) packed plane slabs -> (24, 8, m) packed whitened
    (r, J1, J2). m must be a multiple of 128 (pack_pose2pose2 pads)."""
    m = X.shape[2]
    bl = min(_BL, m)
    grid = (m // bl,)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, _SUB, m), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS, _SUB, bl), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, _SUB, bl), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(X)


def pack_pose2pose2(p, q, z, sqrt_info, weight):
    """(n, .) row-major arrays -> (24, 8, npad/8) packed plane input."""
    n = p.shape[0]
    npad = -(-n // (_SUB * 128)) * (_SUB * 128)
    m = npad // _SUB
    f = jnp.float32

    def plane(v):  # (n,) -> (8, m)
        return jnp.zeros((npad,), f).at[:n].set(
            jnp.asarray(v, f)
        ).reshape(_SUB, m)

    X = jnp.zeros((ROWS, _SUB, m), f)
    pT = jnp.asarray(p, f)
    qT = jnp.asarray(q, f)
    zT = jnp.asarray(z, f)
    ST = jnp.asarray(sqrt_info, f).reshape(n, 9)
    for k in range(3):
        X = X.at[k].set(plane(pT[:, k]))
        X = X.at[3 + k].set(plane(qT[:, k]))
        X = X.at[6 + k].set(plane(zT[:, k]))
    for k in range(9):
        X = X.at[9 + k].set(plane(ST[:, k]))
    X = X.at[18].set(plane(jnp.asarray(weight, f)))
    return X


def unpack_planes(Y, n):
    """(24, 8, m) packed output -> (r0 (n,3), (J1, J2) each (n,3,3))."""
    flat = Y.reshape(ROWS, -1)[:, :n]
    r0 = flat[0:3].T
    J1 = flat[3:12].reshape(3, 3, -1).transpose(2, 0, 1)
    J2 = flat[12:21].reshape(3, 3, -1).transpose(2, 0, 1)
    return r0, (J1, J2)


def pose2pose2_linearize_packed(params, p, q, weight=None):
    """Drop-in variant of ops.fused_linearize.pose2pose2_linearize that
    routes through the packed Pallas kernel (f32; weight baked in — callers
    must NOT re-apply it). Returns (r0 (n,3), (J1, J2) (n,3,3))."""
    n = p.shape[0]
    w = weight if weight is not None else jnp.ones((n,), jnp.float32)
    X = pack_pose2pose2(p, q, params["z"], params["sqrt_info"], w)
    Y = pose2pose2_linearize_planes(X)
    return unpack_planes(Y, n)
