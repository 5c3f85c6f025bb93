"""KL-matched multimodal acceptance tests (BASELINE.md target: posteriors
KL-matched vs a reference product) + the Pose3Pose3 nullhypo fixture
(reference: testPose3Pose3NH.jl:118, testMultimodalRangeBearing.jl:53-135).

The reference product here is BRUTE FORCE in float64: evaluate the exact
product of the message kernel densities pointwise and importance-resample —
no Gibbs approximation — then assert the engine's Gibbs product is within a
small symmetric KL of it.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rome_tpu import (
    FactorGraph,
    MvNormal,
    Normal,
    Point2,
    Pose2,
    Pose2Point2BearingRange,
    PriorPoint2,
    PriorPose2,
)
from rome_tpu.manifolds.base import SE2_, T1, T2
from rome_tpu.solvers.multimodal import (
    ManifoldKernelDensity,
    gibbs_product,
)
from rome_tpu.solvers.multimodal.metrics import kl_divergence_knn, symmetric_kl_knn

KEY = jax.random.PRNGKey(7)


def _gauss(rng, mu, std, n, d):
    return jnp.asarray(rng.normal(mu, std, size=(n, d)))


def test_kl_estimator_sanity():
    rng = np.random.default_rng(0)
    P = _gauss(rng, 0.0, 1.0, 1500, 1)
    Q = _gauss(rng, 0.0, 1.0, 1500, 1)
    R = _gauss(rng, 1.0, 1.0, 1500, 1)
    # same distribution -> ~0; shifted unit Gaussians -> KL = 0.5
    assert abs(kl_divergence_knn(T1, P, Q)) < 0.15
    est = kl_divergence_knn(T1, P, R)
    assert abs(est - 0.5) < 0.25, est


def _brute_force_product(rng_key, densities, n_out=600):
    """Float64 exact product of KDE densities by importance resampling:
    propose from an equal mixture, weight by the f64 product density over
    the proposal density, systematic-resample."""
    man = densities[0].manifold
    props = []
    per = n_out  # per-density proposals
    for i, d in enumerate(densities):
        props.append(np.asarray(d.sample(jax.random.fold_in(rng_key, i), per)))
    X = np.concatenate(props, axis=0).astype(np.float64)

    def logpdf64(dens, X):
        pts = np.asarray(dens.points, np.float64)
        bw = np.asarray(dens.bandwidth, np.float64)
        d = np.asarray(man.local(jnp.asarray(X)[:, None, :].repeat(pts.shape[0], 1).reshape(-1, X.shape[1]),
                                 jnp.asarray(np.broadcast_to(pts[None], (X.shape[0],) + pts.shape).reshape(-1, pts.shape[1]))),
                       np.float64).reshape(X.shape[0], pts.shape[0], -1)
        q = -0.5 * np.sum((d / bw) ** 2, axis=-1)
        mx = q.max(axis=1, keepdims=True)
        return (mx[:, 0] + np.log(np.exp(q - mx).mean(axis=1))
                - np.log(bw).sum() - 0.5 * d.shape[-1] * np.log(2 * np.pi))

    log_target = sum(logpdf64(dens, X) for dens in densities)
    log_prop = np.log(
        np.mean(np.stack([np.exp(logpdf64(dens, X)) for dens in densities]), axis=0)
        + 1e-300
    )
    logw = log_target - log_prop
    w = np.exp(logw - logw.max())
    w = w / w.sum()
    rng = np.random.default_rng(3)
    idx = rng.choice(len(X), size=n_out, p=w)
    out = X[idx]
    # smooth bootstrap: resampling-with-replacement duplicates particles,
    # which collapses k-NN distances and blows up the KL estimate — jitter
    # by a fraction of the output spread (standard kernel smoothing)
    h = 0.25 * out.std(axis=0) * (4.0 / (out.shape[1] + 2) / n_out) ** (
        1.0 / (out.shape[1] + 4)
    )
    return jnp.asarray(out + rng.normal(0, 1, out.shape) * h)


def test_gibbs_product_kl_matched_gaussians():
    """Gibbs product of two offset Gaussian clouds vs the f64 brute-force
    product: symmetric KL below threshold."""
    rng = np.random.default_rng(1)
    a = ManifoldKernelDensity.from_points(T2, _gauss(rng, [0, 0], 0.6, 400, 2))
    b = ManifoldKernelDensity.from_points(T2, _gauss(rng, [1, 0], 0.6, 400, 2))
    prod = gibbs_product(KEY, [a, b], n_out=600)
    ref = _brute_force_product(jax.random.PRNGKey(17), [a, b], n_out=600)
    kl = symmetric_kl_knn(T2, prod, ref, k=2)
    assert kl < 0.35, kl


@pytest.mark.slow
def test_gibbs_product_kl_matched_bimodal():
    """Multimodal case: product of a bimodal density with a wide one keeps
    both modes with the right relative mass (KL vs f64 brute force)."""
    rng = np.random.default_rng(2)
    bimodal = np.concatenate(
        [rng.normal([-2, 0], 0.4, size=(200, 2)), rng.normal([2, 0], 0.4, size=(200, 2))]
    )
    a = ManifoldKernelDensity.from_points(T2, jnp.asarray(bimodal))
    b = ManifoldKernelDensity.from_points(T2, _gauss(rng, [0.5, 0.0], 2.5, 400, 2))
    prod = gibbs_product(KEY, [a, b], n_out=600)
    ref = _brute_force_product(jax.random.PRNGKey(23), [a, b], n_out=600)
    kl = symmetric_kl_knn(T2, prod, ref, k=2)
    assert kl < 0.5, kl
    # both modes survive
    frac_left = float(np.mean(np.asarray(prod)[:, 0] < 0))
    assert 0.2 < frac_left < 0.8


@pytest.mark.slow
def test_pose3pose3_nullhypo_mode_mass():
    """Pose3Pose3 with nullhypo=0.5 (testPose3Pose3NH.jl:118): roughly half
    the convolved particles follow the odometry measurement, the rest keep
    the inflated prior spread."""
    from rome_tpu import Pose3, Pose3Pose3, PriorPose3
    from rome_tpu.solvers.multimodal import approx_conv, init_all_beliefs

    fg = FactorGraph()
    fg.add_variable("x0", Pose3)
    fg.add_factor(
        ["x0"], PriorPose3(MvNormal(np.zeros(6), np.full(6, 1e-4)))
    )
    fg.add_variable("x1", Pose3)
    z = np.array([10.0, 0, 0, 0, 0, 0])
    f = fg.add_factor(
        ["x0", "x1"],
        Pose3Pose3(MvNormal(z, np.full(6, 1e-3))),
        nullhypo=0.5,
        graphinit=False,
    )
    # wide prior belief on x1 so null-particles stay spread
    rng = np.random.default_rng(5)
    wide = np.concatenate(
        [rng.normal(0, 8.0, size=(400, 3)), np.tile([1.0, 0, 0, 0], (400, 1))],
        axis=1,
    )
    fg.variables["x1"].beliefs["default"] = jnp.asarray(wide)
    fg.variables["x1"].initialized["default"] = True
    init_all_beliefs(fg, N=400)
    pts = np.asarray(approx_conv(fg, f.label, "x1", N=400))
    at_meas = np.mean(np.linalg.norm(pts[:, :3] - np.array([10.0, 0, 0]), axis=1) < 1.0)
    assert 0.25 < at_meas < 0.75, at_meas
    # spread mass is really spread (not collapsed onto the measurement)
    far = np.mean(np.linalg.norm(pts[:, :3] - np.array([10.0, 0, 0]), axis=1) > 3.0)
    assert far > 0.15, far


@pytest.mark.slow
def test_multihypo_posterior_mode_masses():
    """multihypo=[1.0, 0.5, 0.5] (testMultimodalRangeBearing.jl:53-135):
    the pose posterior implied by an ambiguous sighting splits its mass
    between the two landmark hypotheses."""
    fg = FactorGraph()
    fg.params.graphinit = False
    fg.add_variable("x0", Pose2)
    fg.add_factor(
        ["x0"],
        PriorPose2(MvNormal([0, 0, 0], [4.0, 4.0, 4.0])),
        graphinit=True,
    )
    fg.add_variable("l1", Point2)
    fg.add_variable("l2", Point2)
    fg.add_factor(["l1"], PriorPoint2(MvNormal([20.0, 5.0], [0.01, 0.01])))
    fg.add_factor(["l2"], PriorPoint2(MvNormal([20.0, -5.0], [0.01, 0.01])))
    f = fg.add_factor(
        ["x0", "l1", "l2"],
        Pose2Point2BearingRange(Normal(0.0, 0.01), Normal(20.0, 0.05)),
        multihypo=[1.0, 0.5, 0.5],
    )
    from rome_tpu.solvers.multimodal import approx_conv, init_all_beliefs

    init_all_beliefs(fg, N=400)
    pts = np.asarray(approx_conv(fg, f.label, "x0", N=400))
    # range 20 at bearing 0: each particle's pose must sit on the r=20
    # circle of ITS associated landmark — association mass splits ~50/50
    # (heading is only softly constrained, so test ranges, not positions)
    r1 = np.abs(np.linalg.norm(pts[:, :2] - np.array([20.0, 5.0]), axis=1) - 20.0)
    r2 = np.abs(np.linalg.norm(pts[:, :2] - np.array([20.0, -5.0]), axis=1) - 20.0)
    m1 = np.mean((r1 < 1.0) & (r2 >= 1.0))
    m2 = np.mean((r2 < 1.0) & (r1 >= 1.0))
    assert m1 > 0.15 and m2 > 0.15, (m1, m2)
    assert 0.25 < m1 / (m1 + m2) < 0.75