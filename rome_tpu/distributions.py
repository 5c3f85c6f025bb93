"""Measurement-model distributions ("SamplableBelief" equivalents).

The reference reexports Distributions.jl models (Normal/MvNormal/Uniform/
Categorical) as factor measurement models (/root/reference/src/RoME.jl:7).
Julia convention parity:
  - ``Normal(mu, sigma)``: sigma is a STANDARD DEVIATION.
  - ``MvNormal(mu, v::Vector)``: vector argument is STANDARD DEVIATIONS
    (Distributions.jl deprecated-vector form used throughout reference tests,
    e.g. testParametric.jl:22 ``MvNormal([10;10;-pi+1e-5],[0.1;0.1;0.05])``).
  - ``MvNormal(mu, S::Matrix)``: matrix argument is a COVARIANCE.

Everything lowers to plain numpy arrays at graph-build time; sampling is
jit-safe JAX for the nonparametric engine.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class Distribution:
    """Base: a samplable belief with (mean, cov) parametric summary."""

    dim: int

    def mean(self) -> np.ndarray:
        raise NotImplementedError

    def cov(self) -> np.ndarray:
        raise NotImplementedError

    def sample(self, key, n: int) -> jnp.ndarray:
        """Draw (n, dim) samples (jit-safe)."""
        raise NotImplementedError


class Normal(Distribution):
    """Scalar Gaussian; sigma is a standard deviation (Julia parity)."""

    def __init__(self, mu: float = 0.0, sigma: float = 1.0):
        self.mu = float(mu)
        self.sigma = float(sigma)
        self.dim = 1

    def mean(self):
        return np.array([self.mu])

    def cov(self):
        return np.array([[self.sigma**2]])

    def sample(self, key, n):
        return self.mu + self.sigma * jax.random.normal(key, (n, 1))

    def __repr__(self):
        return f"Normal({self.mu}, {self.sigma})"


class MvNormal(Distribution):
    """Multivariate Gaussian.

    ``MvNormal(mu, v)`` with 1-D ``v`` treats v as standard deviations;
    2-D ``v`` is a covariance matrix — exactly the Distributions.jl
    conventions the reference relies on.
    """

    def __init__(self, mu, cov_or_sigmas=None):
        self.mu = np.asarray(mu, dtype=np.float64).reshape(-1)
        self.dim = self.mu.size
        if cov_or_sigmas is None:
            self._cov = np.eye(self.dim)
        else:
            arr = np.asarray(cov_or_sigmas, dtype=np.float64)
            if arr.ndim == 1:
                self._cov = np.diag(arr**2)
            else:
                self._cov = 0.5 * (arr + arr.T)

    def mean(self):
        return self.mu.copy()

    def cov(self):
        return self._cov.copy()

    def sample(self, key, n):
        L = np.linalg.cholesky(self._cov + 1e-12 * np.eye(self.dim))
        z = jax.random.normal(key, (n, self.dim))
        return jnp.asarray(self.mu) + z @ jnp.asarray(L).T

    def __repr__(self):
        return f"MvNormal(dim={self.dim})"


class Uniform(Distribution):
    def __init__(self, a: float = 0.0, b: float = 1.0):
        self.a, self.b = float(a), float(b)
        self.dim = 1

    def mean(self):
        return np.array([0.5 * (self.a + self.b)])

    def cov(self):
        return np.array([[(self.b - self.a) ** 2 / 12.0]])

    def sample(self, key, n):
        return jax.random.uniform(key, (n, 1), minval=self.a, maxval=self.b)

    def __repr__(self):
        return f"Uniform({self.a}, {self.b})"


class Categorical(Distribution):
    """Discrete distribution over 1..K (hypothesis weights, multihypo)."""

    def __init__(self, p):
        self.p = np.asarray(p, dtype=np.float64)
        self.p = self.p / self.p.sum()
        self.dim = 1

    def mean(self):
        return np.array([float(np.argmax(self.p))])

    def cov(self):
        return np.array([[1.0]])

    def sample(self, key, n):
        return jax.random.categorical(key, jnp.log(jnp.asarray(self.p)), shape=(n, 1)).astype(jnp.float32)

    def __repr__(self):
        return f"Categorical({self.p})"


class Mixture(Distribution):
    """Weighted mixture of component beliefs (cf. IIF ``Mixture`` factors)."""

    def __init__(self, components, weights=None):
        self.components = list(components)
        k = len(self.components)
        self.weights = np.full(k, 1.0 / k) if weights is None else np.asarray(weights, float)
        self.weights = self.weights / self.weights.sum()
        self.dim = self.components[0].dim

    def mean(self):
        return sum(w * c.mean() for w, c in zip(self.weights, self.components))

    def cov(self):
        # moment-matched covariance
        m = self.mean()
        out = np.zeros((self.dim, self.dim))
        for w, c in zip(self.weights, self.components):
            d = (c.mean() - m).reshape(-1, 1)
            out += w * (c.cov() + d @ d.T)
        return out

    def sample(self, key, n):
        k_lab, k_smp = jax.random.split(key)
        labels = jax.random.categorical(k_lab, jnp.log(jnp.asarray(self.weights)), shape=(n,))
        comps = jnp.stack(
            [c.sample(jax.random.fold_in(k_smp, i), n) for i, c in enumerate(self.components)]
        )  # (K, n, dim)
        return jnp.take_along_axis(comps, labels[None, :, None].astype(jnp.int32), axis=0)[0]

    def __repr__(self):
        return f"Mixture({len(self.components)} comps)"


def dist_mean_cov(d: Distribution):
    return d.mean(), d.cov()
