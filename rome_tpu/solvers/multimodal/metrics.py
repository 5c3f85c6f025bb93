"""Belief-comparison metrics: k-NN KL divergence between particle sets.

BASELINE.md gates multimodal correctness on "KL-matched posteriors". This
implements the Wang–Kulkarni–Verdú nearest-neighbor estimator of
KL(P || Q) from samples, with distances measured through the manifold
``local`` map so circular dimensions wrap correctly.

    KL(P||Q) ~= (d/n) * sum_i log( s_k(x_i; Q) / r_k(x_i; P) )
                + log(m / (n - 1))

where r_k / s_k are k-NN distances of x_i within P (excluding itself) and
to Q. Reference analogue: the compareDensity tolerance checks of
FactorGraphAnalysisTools.jl:37-49, strengthened to a proper divergence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rome_tpu.manifolds.base import Manifold


def _pairwise_dist(man: Manifold, X, Y):
    """(n, m) geodesic-coordinate distances via the manifold local map."""

    def row(x):
        d = man.local(jnp.broadcast_to(x, Y.shape), Y)
        return jnp.sqrt(jnp.sum(d * d, axis=-1))

    return jax.vmap(row)(X)


def kl_divergence_knn(man: Manifold, P, Q, k: int = 1) -> float:
    """Estimate KL(P || Q) from particle arrays P (n, pdim), Q (m, pdim)."""
    P = jnp.asarray(P)
    Q = jnp.asarray(Q)
    n, m = P.shape[0], Q.shape[0]
    d = man.dof

    dPP = _pairwise_dist(man, P, P)
    # exclude self-distance
    big = jnp.max(dPP) + 1.0
    dPP = dPP + big * jnp.eye(n, dtype=dPP.dtype)
    r_k = jnp.sort(dPP, axis=1)[:, k - 1]

    dPQ = _pairwise_dist(man, P, Q)
    s_k = jnp.sort(dPQ, axis=1)[:, k - 1]

    eps = 1e-12
    est = (d / n) * jnp.sum(jnp.log((s_k + eps) / (r_k + eps))) + jnp.log(
        m / (n - 1.0)
    )
    return float(est)


def symmetric_kl_knn(man: Manifold, P, Q, k: int = 1) -> float:
    """0.5 (KL(P||Q) + KL(Q||P)) — the band metric used by the acceptance
    tests."""
    return 0.5 * (
        kl_divergence_knn(man, P, Q, k) + kl_divergence_knn(man, Q, P, k)
    )
