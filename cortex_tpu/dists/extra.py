"""Additional exponential families: NormalGamma, Wishart, Poisson.

Completes the conjugate algebra used by the model zoo (the GMM's
Normal–Gamma posterior as a first-class distribution; Wishart for
full-covariance components; Poisson for count models).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln

from .gaussian import _spd_inv, _spd_logdet

__all__ = ["NormalGamma", "Wishart", "Poisson"]

_LOG_2PI = math.log(2.0 * math.pi)
_LOG_2 = math.log(2.0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NormalGamma:
    """NormalGamma(m, beta, a, b): ``tau ~ Gamma(a, rate b)``,
    ``mu | tau ~ N(m, (beta tau)^-1)`` — the conjugate prior/posterior for a
    Gaussian with unknown mean and precision (used per-dimension by the
    VB-GMM, :mod:`cortex_tpu.models.gmm`)."""

    m: jax.Array
    beta: jax.Array
    a: jax.Array
    b: jax.Array

    @property
    def mean_mu(self) -> jax.Array:
        return self.m

    @property
    def mean_tau(self) -> jax.Array:
        return self.a / self.b

    def mean_log_tau(self) -> jax.Array:
        return digamma(self.a) - jnp.log(self.b)

    def expected_tau_sq_diff(self, x) -> jax.Array:
        """E[tau (x − mu)²] = (a/b)(x − m)² + 1/beta."""
        return self.mean_tau * (x - self.m) ** 2 + 1.0 / self.beta

    def __mul__(self, other: "NormalGamma") -> "NormalGamma":
        """Product of NormalGamma densities (natural-parameter addition)."""
        beta = self.beta + other.beta
        m = (self.beta * self.m + other.beta * other.m) / beta
        a = self.a + other.a + 0.5 - 1.0
        cross = (
            0.5
            * self.beta
            * other.beta
            / beta
            * (self.m - other.m) ** 2
        )
        b = self.b + other.b + cross
        return NormalGamma(m, beta, a, b)

    def entropy(self) -> jax.Array:
        h_tau = (
            self.a
            - jnp.log(self.b)
            + gammaln(self.a)
            + (1.0 - self.a) * digamma(self.a)
        )
        h_mu = 0.5 * (1.0 + _LOG_2PI - self.mean_log_tau() - jnp.log(self.beta))
        return h_tau + h_mu

    def kl(self, other: "NormalGamma") -> jax.Array:
        """KL(self ‖ other) in closed form."""
        elog_tau = self.mean_log_tau()
        etau = self.mean_tau
        # Gamma part.
        kl_tau = (
            (self.a - other.a) * digamma(self.a)
            - gammaln(self.a)
            + gammaln(other.a)
            + other.a * (jnp.log(self.b) - jnp.log(other.b))
            + self.a * (other.b - self.b) / self.b
        )
        # Conditional Gaussian part: E_tau KL(N(m1,(b1 t)^-1) || N(m2,(b2 t)^-1)).
        kl_mu = 0.5 * (
            jnp.log(self.beta / other.beta)
            + other.beta / self.beta
            - 1.0
            + other.beta * etau * (self.m - other.m) ** 2
        )
        return kl_tau + kl_mu

    def sample(self, key: jax.Array, shape: Tuple[int, ...] = ()):
        kt, km = jax.random.split(key)
        tau = jax.random.gamma(kt, self.a, shape + jnp.shape(self.a)) / self.b
        mu = self.m + jax.random.normal(km, tau.shape) / jnp.sqrt(
            self.beta * tau
        )
        return mu, tau


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Wishart:
    """Wishart(n, V): ``n`` degrees of freedom, scale ``V`` (..., d, d).

    Conjugate prior for a multivariate Gaussian precision matrix.
    """

    n: jax.Array
    V: jax.Array

    @property
    def dim(self) -> int:
        return self.V.shape[-1]

    @property
    def mean(self) -> jax.Array:
        return self.n[..., None, None] * self.V

    def mean_logdet(self) -> jax.Array:
        """E[log |X|] = Σ ψ((n+1−i)/2) + d log2 + log|V|."""
        d = self.dim
        i = jnp.arange(1, d + 1)
        logdetV = _spd_logdet(self.V)
        return (
            jnp.sum(digamma((self.n[..., None] + 1.0 - i) / 2.0), axis=-1)
            + d * _LOG_2
            + logdetV
        )

    def __mul__(self, other: "Wishart") -> "Wishart":
        """Density product: add natural params (n' = n1+n2−d−1, V'⁻¹ = V1⁻¹+V2⁻¹)."""
        d = self.dim
        Vinv = _spd_inv(self.V) + _spd_inv(other.V)
        return Wishart(self.n + other.n - d - 1.0, _spd_inv(Vinv))

    def log_normalizer(self) -> jax.Array:
        d = self.dim
        i = jnp.arange(1, d + 1)
        logdetV = _spd_logdet(self.V)
        return (
            0.5 * self.n * d * _LOG_2
            + 0.5 * self.n * logdetV
            + 0.25 * d * (d - 1) * math.log(math.pi)
            + jnp.sum(gammaln((self.n[..., None] + 1.0 - i) / 2.0), axis=-1)
        )

    def sample(self, key: jax.Array) -> jax.Array:
        """Bartlett decomposition sampling (static dof lower bound d)."""
        d = self.dim
        kchol, knorm = jax.random.split(key)
        chol = jnp.linalg.cholesky(self.V)
        # A: lower triangular, diag sqrt(chi2), off-diag normal.
        i = jnp.arange(d)
        df = self.n[..., None] - i
        chi2 = 2.0 * jax.random.gamma(kchol, df / 2.0)
        A = jnp.zeros(jnp.shape(self.n) + (d, d))
        A = A + jnp.tril(
            jax.random.normal(knorm, jnp.shape(self.n) + (d, d)), -1
        )
        A = A + jnp.eye(d) * jnp.sqrt(chi2)[..., None, :] * jnp.eye(d)
        LA = chol @ A
        return LA @ jnp.swapaxes(LA, -1, -2)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Poisson:
    """Poisson in natural form: ``log_rate``."""

    log_rate: jax.Array

    @classmethod
    def from_rate(cls, rate) -> "Poisson":
        return cls(jnp.log(jnp.asarray(rate)))

    @property
    def rate(self) -> jax.Array:
        return jnp.exp(self.log_rate)

    @property
    def mean(self) -> jax.Array:
        return self.rate

    @property
    def variance(self) -> jax.Array:
        return self.rate

    def __mul__(self, other: "Poisson") -> "Poisson":
        return Poisson(self.log_rate + other.log_rate)

    def logpmf(self, k: jax.Array) -> jax.Array:
        return k * self.log_rate - self.rate - gammaln(k + 1.0)

    def kl(self, other: "Poisson") -> jax.Array:
        r, ro = self.rate, other.rate
        return r * (self.log_rate - other.log_rate) - r + ro

    def sample(self, key: jax.Array, shape: Tuple[int, ...] = ()) -> jax.Array:
        return jax.random.poisson(key, self.rate, shape + jnp.shape(self.log_rate))
