"""Distributed nonparametric sweep tests (8-device virtual CPU mesh).

The sharded engine must produce the same posteriors as the single-device
compiled engine in distribution (statistical bands + symmetric KL) — the
analogue of the reference running the sampling solver over Distributed
workers (testBeehiveGrow.jl:7-28, SolverParams.multiproc)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from rome_tpu.canonical.generators import generate_graph_hexagonal
from rome_tpu.parallel.multimodal import ShardedNonparametricSolver
from rome_tpu.solvers.multimodal.batched import BatchedNonparametricSolver
from rome_tpu.utils.math import sym_rem


def _solve(solver_cls, fg, **kw):
    s = solver_cls(fg, **kw)
    s.solve(sweeps=3, key=jax.random.PRNGKey(7))
    return s


@pytest.mark.slow
@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_hexagonal_matches_bands(ndev):
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("f",))
    fg = generate_graph_hexagonal(N=100)
    _solve(
        lambda f, **kw: ShardedNonparametricSolver(f, mesh, **kw), fg, N=100
    )
    for i in range(7):
        sim = fg.get_ppe(f"x{i}")
        pts = np.asarray(fg.variables[f"x{i}"].beliefs["default"])
        assert np.sum(np.abs(pts[:, 0] - sim[0]) < 3.0) >= 35, (i, "x")
        assert np.sum(np.abs(pts[:, 1] - sim[1]) < 3.0) >= 35, (i, "y")
        assert (
            np.sum(np.abs(np.vectorize(sym_rem)(pts[:, 2] - sim[2])) < 0.3)
            >= 35
        ), (i, "theta")
    lm = np.asarray(fg.variables["l1"].beliefs["default"])
    assert np.sum(np.linalg.norm(lm - np.array([20.0, 0]), axis=1) < 3.0) >= 35


@pytest.mark.slow
def test_sharded_kl_matches_single_device():
    """Sharded and single-device posteriors agree in distribution (symmetric
    k-NN KL below the graininess floor of N=100 particle sets)."""
    from rome_tpu.manifolds.base import T2
    from rome_tpu.solvers.multimodal.metrics import symmetric_kl_knn

    fg1 = generate_graph_hexagonal(N=100)
    _solve(BatchedNonparametricSolver, fg1, N=100)
    fg2 = generate_graph_hexagonal(N=100)
    mesh = Mesh(np.array(jax.devices()[:8]), ("f",))
    _solve(
        lambda f, **kw: ShardedNonparametricSolver(f, mesh, **kw), fg2, N=100
    )
    rng = np.random.default_rng(0)
    for lbl in ["x0", "x3", "x6", "l1"]:
        a = np.asarray(fg1.variables[lbl].beliefs["default"], np.float64)
        b = np.asarray(fg2.variables[lbl].beliefs["default"], np.float64)
        a = a + rng.normal(0, 1e-4, a.shape)
        b = b + rng.normal(0, 1e-4, b.shape)
        skl = symmetric_kl_knn(T2, a[:, :2], b[:, :2])
        assert np.isfinite(skl) and skl < 2.0, (lbl, skl)
