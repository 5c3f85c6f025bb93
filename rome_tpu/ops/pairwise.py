"""Pallas TPU kernels for the multimodal belief-product hot loop.

The Gibbs kernel-label sampler (rome_tpu.solvers.multimodal.kde.gibbs_product,
the ``prodAppxMSGibbsS`` analogue of KernelDensityEstimate.jl used at
reference BayesTracker.jl:260-285) spends its time scoring every kernel of one
density against the Gaussian product-of-others conditional of every output
particle:

    logw[n, i] = -0.5 * sum_d inv_var[d] * (local(ref[n], pts[i])[d] - mu[n, d])**2

materialising an (N, Nj, dof) tangent-coordinate tensor in the naive vmapped
form. These kernels fuse the manifold ``local`` map, the Mahalanobis score and
the reduction into one VMEM-resident pass, so the (N, Nj, dof) intermediate
never touches HBM — an O(dof) traffic saving on the dominant op of the
nonparametric solve path.

Two fused variants cover the manifolds the product runs on in practice:

- ``se2_pairwise_logw``   — SE(2) hybrid-tangent local (Pose2 beliefs);
- ``euclid_pairwise_logw`` — per-dim linear/circular local (TranslationGroup,
  Circle x R products: Point2/Point3/DynPoint2/BearingRange beliefs).

On non-TPU backends the same kernels run under the Pallas interpreter so the
CPU test mesh exercises identical code. All shapes are padded to TPU tile
boundaries (8 sublanes x 128 lanes, float32) and sliced back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 2.0 * np.pi

# dof is padded to this many columns so component slices stay static.
_DPAD = 8


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_rows(x, mult):
    n = x.shape[0]
    p = (-n) % mult
    if p:
        x = jnp.concatenate([x, jnp.zeros((p,) + x.shape[1:], x.dtype)], axis=0)
    return x


def _pad_dof(x):
    d = x.shape[-1]
    if d < _DPAD:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, _DPAD - d)]
        x = jnp.pad(x, pad)
    return x


def _wrap(x):
    """Symmetric remainder onto [-pi, pi), bit-matching utils.math.sym_rem
    (mod(x + pi, 2pi) - pi)."""
    return x - _TWO_PI * jnp.floor((x + np.pi) / _TWO_PI)


# --------------------------------------------------------------------------
# SE(2) fused local + Mahalanobis score
# --------------------------------------------------------------------------


def _se2_kernel(ref_ref, mu_ref, pts_ref, iv_ref, out_ref):
    # ref/mu: (Npad, 8) [x, y, th, 0...]; pts: (8, Njpad) transposed components;
    # iv: (1, 8) inverse variances. out: (Npad, Njpad).
    rx = ref_ref[:, 0:1]
    ry = ref_ref[:, 1:2]
    rth = ref_ref[:, 2:3]
    px = pts_ref[0:1, :]
    py = pts_ref[1:2, :]
    pth = pts_ref[2:3, :]
    cth = jnp.cos(rth)
    sth = jnp.sin(rth)
    dx = px - rx
    dy = py - ry
    # local(ref, p) = [R(-th_r) (t_p - t_r); wrap(th_p - th_r)]
    cx = cth * dx + sth * dy
    cy = cth * dy - sth * dx
    cth_rel = _wrap(pth - rth)
    ex = cx - mu_ref[:, 0:1]
    ey = cy - mu_ref[:, 1:2]
    eth = cth_rel - mu_ref[:, 2:3]
    out_ref[:, :] = -0.5 * (
        iv_ref[0, 0] * ex * ex + iv_ref[0, 1] * ey * ey + iv_ref[0, 2] * eth * eth
    )


@functools.partial(jax.jit, static_argnames=())
def se2_pairwise_logw(ref, mu, pts, inv_var):
    """Fused SE(2) Gibbs conditional log-weights.

    ref (N, 3) reference poses, mu (N, 3) product-conditional means in the
    tangent at ref, pts (Nj, 3) candidate kernel centres, inv_var (3,)
    inverse variances. Returns logw (N, Nj).
    """
    N, Nj = ref.shape[0], pts.shape[0]
    refp = _pad_dof(_pad_rows(jnp.asarray(ref, jnp.float32), 8))
    mup = _pad_dof(_pad_rows(jnp.asarray(mu, jnp.float32), 8))
    ptsp = _pad_dof(_pad_rows(jnp.asarray(pts, jnp.float32), 128)).T  # (8, Njpad)
    iv = _pad_dof(jnp.asarray(inv_var, jnp.float32)[None, :])  # (1, 8)
    out = pl.pallas_call(
        _se2_kernel,
        out_shape=jax.ShapeDtypeStruct((refp.shape[0], ptsp.shape[1]), jnp.float32),
        interpret=_interpret(),
    )(refp, mup, ptsp, iv)
    return out[:N, :Nj]


# --------------------------------------------------------------------------
# Per-dim linear/circular fused score (TranslationGroup, Circle x R, ...)
# --------------------------------------------------------------------------


def _euclid_kernel(ref_ref, mu_ref, pts_ref, iv_ref, circ_ref, out_ref, *, dof):
    acc = jnp.zeros_like(out_ref[:, :])
    for d in range(dof):  # dof is static and small (<= _DPAD)
        diff = pts_ref[d : d + 1, :] - ref_ref[:, d : d + 1]
        c = circ_ref[0, d]
        diff = diff - c * _TWO_PI * jnp.floor((diff + np.pi) / _TWO_PI)
        e = diff - mu_ref[:, d : d + 1]
        acc = acc + iv_ref[0, d] * e * e
    out_ref[:, :] = -0.5 * acc


def pairwise_logw_for(man):
    """Return the fused Gibbs-scoring kernel matching ``man``'s local map,
    or None when no fused variant applies (caller falls back to the naive
    vmapped form). Dispatch is static (trace time): SE(2) gets the
    dedicated hybrid-tangent kernel; any manifold whose local() is per-dim
    linear/circular (TranslationGroup, SO(2), and products thereof) gets
    the euclid kernel with a circular-dim mask."""
    from rome_tpu.manifolds.base import SE2, SO2, ProductGroup, TranslationGroup

    if isinstance(man, SE2):
        return se2_pairwise_logw

    def per_dim(m):
        if isinstance(m, (TranslationGroup, SO2)):
            return True
        if isinstance(m, ProductGroup):
            return all(per_dim(p) for p in m.parts)
        return False

    if per_dim(man) and man.dof <= _DPAD and man.point_dim == man.dof:
        circ = jnp.asarray(
            [1.0 if c == "c" else 0.0 for c in man.coord_types], jnp.float32
        )
        return lambda ref, mu, pts, inv_var: euclid_pairwise_logw(
            ref, mu, pts, inv_var, circ
        )
    return None


def euclid_pairwise_logw(ref, mu, pts, inv_var, circular_mask):
    """Fused per-dim linear/circular Gibbs conditional log-weights.

    Same contract as :func:`se2_pairwise_logw` but local(ref, p) is the
    per-dim difference, wrapped onto [-pi, pi) where ``circular_mask`` is 1.
    """
    N, Nj = ref.shape[0], pts.shape[0]
    dof = ref.shape[-1]
    if dof > _DPAD:
        raise ValueError(f"euclid_pairwise_logw supports dof <= {_DPAD}, got {dof}")
    refp = _pad_dof(_pad_rows(jnp.asarray(ref, jnp.float32), 8))
    mup = _pad_dof(_pad_rows(jnp.asarray(mu, jnp.float32), 8))
    ptsp = _pad_dof(_pad_rows(jnp.asarray(pts, jnp.float32), 128)).T
    iv = _pad_dof(jnp.asarray(inv_var, jnp.float32)[None, :])
    circ = _pad_dof(jnp.asarray(circular_mask, jnp.float32)[None, :])
    out = pl.pallas_call(
        functools.partial(_euclid_kernel, dof=int(dof)),
        out_shape=jax.ShapeDtypeStruct((refp.shape[0], ptsp.shape[1]), jnp.float32),
        interpret=_interpret(),
    )(refp, mup, ptsp, iv, circ)
    return out[:N, :Nj]
