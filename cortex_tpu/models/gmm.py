"""Gaussian mixture model — structured VMP with variational free energy.

BASELINE.md config: "Gaussian mixture model — structured VMP with Bethe
free-energy tracking".  The mean-field factorization
``q(Z) q(π) Π q(μ_k, τ_k)`` with conjugate updates (Dirichlet weights,
Normal–Gamma per component/dimension, diagonal covariance) — the classic
variational Bayesian GMM — where every update is a batched message:

- responsibilities = Categorical messages from all data points at once
  (one softmax over ``(..., N, K)``),
- weight/component posteriors = conjugate natural-parameter additions of the
  expected sufficient statistics.

The negative ELBO is the (Bethe/variational) free energy, computed in closed
form each iteration and monotonically decreasing — the convergence functional
the reference lacks (SURVEY.md §5), vectorized over replicas and reducible
with ``psum`` across a mesh.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import digamma, gammaln

__all__ = ["GMM", "GMMPosterior", "GMMResult"]

_LOG_2PI = math.log(2.0 * math.pi)


class GMMPosterior(NamedTuple):
    """Variational posterior of a diagonal-covariance Bayesian GMM."""

    alpha: jax.Array  # (..., K) Dirichlet over weights
    m: jax.Array  # (..., K, D) component mean locations
    beta: jax.Array  # (..., K, D) mean precision scales
    a: jax.Array  # (..., K, D) Gamma shape over precisions
    b: jax.Array  # (..., K, D) Gamma rate over precisions

    @property
    def weights(self) -> jax.Array:
        return self.alpha / jnp.sum(self.alpha, axis=-1, keepdims=True)

    @property
    def means(self) -> jax.Array:
        return self.m

    @property
    def precisions(self) -> jax.Array:
        return self.a / self.b


class GMMResult(NamedTuple):
    posterior: GMMPosterior
    responsibilities: jax.Array  # (..., N, K)
    free_energy: jax.Array  # (..., n_iterations) -ELBO trace, decreasing


@dataclasses.dataclass(frozen=True)
class GMM:
    """Bayesian GMM with K diagonal-covariance components in D dims.

    Priors: ``π ~ Dir(alpha0)``, ``(μ_kd, τ_kd) ~ NormalGamma(m0, beta0, a0,
    b0)``.
    """

    K: int
    alpha0: float = 1.0
    m0: float = 0.0
    beta0: float = 1.0
    a0: float = 1.0
    b0: float = 1.0

    def fit(
        self,
        x: jax.Array,
        n_iterations: int = 50,
        key: Optional[jax.Array] = None,
        init_means: Optional[jax.Array] = None,
    ) -> GMMResult:
        """Run structured VMP to convergence on ``x`` of shape
        ``(..., N, D)``; leading axes are independent replicas."""
        x = jnp.asarray(x)
        K = self.K
        N, D = x.shape[-2], x.shape[-1]
        batch = x.shape[:-2]

        if init_means is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            # Initialize component locations at randomly chosen data points.
            idx = jax.random.choice(key, N, shape=(K,), replace=False)
            init_means = jnp.take(x, idx, axis=-2)  # (..., K, D)

        post0 = GMMPosterior(
            alpha=jnp.broadcast_to(jnp.full((K,), self.alpha0), batch + (K,)),
            m=jnp.broadcast_to(init_means, batch + (K, D)),
            beta=jnp.full(batch + (K, D), self.beta0),
            a=jnp.full(batch + (K, D), self.a0),
            b=jnp.full(batch + (K, D), self.b0),
        )

        def vmp_iter(carry, _):
            post, _r = carry
            # -- E-step: batched Categorical messages (responsibilities) ---
            e_log_pi = digamma(post.alpha) - digamma(
                jnp.sum(post.alpha, axis=-1, keepdims=True)
            )  # (..., K)
            e_log_tau = digamma(post.a) - jnp.log(post.b)  # (..., K, D)
            e_tau = post.a / post.b
            # E[tau (x - mu)^2] = E[tau](x-m)^2 + 1/beta
            diff2 = (x[..., :, None, :] - post.m[..., None, :, :]) ** 2
            quad = (
                e_tau[..., None, :, :] * diff2 + 1.0 / post.beta[..., None, :, :]
            )  # (..., N, K, D)
            log_rho = (
                e_log_pi[..., None, :]
                + 0.5 * jnp.sum(e_log_tau, axis=-1)[..., None, :]
                - 0.5 * D * _LOG_2PI
                - 0.5 * jnp.sum(quad, axis=-1)
            )  # (..., N, K)
            log_r = jax.nn.log_softmax(log_rho, axis=-1)
            r = jnp.exp(log_r)

            # -- M-step: conjugate updates from expected statistics --------
            Nk = jnp.sum(r, axis=-2) + 1e-10  # (..., K)
            xbar = (
                jnp.einsum("...nk,...nd->...kd", r, x) / Nk[..., :, None]
            )  # (..., K, D)
            S = (
                jnp.einsum("...nk,...nkd->...kd", r, diff_sq(x, xbar))
                / Nk[..., :, None]
            )

            alpha = self.alpha0 + Nk
            nk_kd = jnp.broadcast_to(Nk[..., :, None], Nk.shape + (D,))
            beta = self.beta0 + nk_kd
            m = (self.beta0 * self.m0 + nk_kd * xbar) / beta
            a = self.a0 + 0.5 * nk_kd
            b = self.b0 + 0.5 * (
                Nk[..., :, None] * S
                + self.beta0
                * Nk[..., :, None]
                * (xbar - self.m0) ** 2
                / beta
            )
            new_post = GMMPosterior(alpha, m, beta, a, b)
            fe = -self._elbo(x, new_post, r, log_r)
            return (new_post, r), fe

        r0 = jnp.zeros(batch + (N, K))
        (post, r), fes = lax.scan(
            vmp_iter, (post0, r0), None, length=n_iterations
        )
        return GMMResult(post, r, jnp.moveaxis(fes, 0, -1))

    def _elbo(self, x, post, r, log_r):
        """Closed-form ELBO (Bishop §10.2.2, diagonal specialization)."""
        K = self.K
        N, D = x.shape[-2], x.shape[-1]
        alpha, m, beta, a, b = post

        e_log_pi = digamma(alpha) - digamma(jnp.sum(alpha, axis=-1, keepdims=True))
        e_log_tau = digamma(a) - jnp.log(b)  # (..., K, D)
        e_tau = a / b

        diff2 = (x[..., :, None, :] - m[..., None, :, :]) ** 2
        quad = e_tau[..., None, :, :] * diff2 + 1.0 / beta[..., None, :, :]

        # 1. E[log p(X|Z, mu, tau)]
        t1 = 0.5 * jnp.einsum(
            "...nk,...nk->...",
            r,
            jnp.sum(e_log_tau, axis=-1)[..., None, :]
            - D * _LOG_2PI
            - jnp.sum(quad, axis=-1),
        )
        # 2. E[log p(Z|pi)]
        t2 = jnp.einsum("...nk,...k->...", r, e_log_pi)
        # 3. E[log p(pi)] with symmetric prior alpha0
        t3 = (
            gammaln(K * self.alpha0)
            - K * gammaln(self.alpha0)
            + (self.alpha0 - 1.0) * jnp.sum(e_log_pi, axis=-1)
        )
        # 4. E[log p(mu, tau)] — NormalGamma(m0, beta0, a0, b0) per (k,d)
        e_tau_mu_m0_sq = e_tau * (m - self.m0) ** 2 + 1.0 / beta
        t4 = jnp.sum(
            0.5 * (jnp.log(self.beta0) - _LOG_2PI + e_log_tau)
            - 0.5 * self.beta0 * e_tau_mu_m0_sq
            + self.a0 * jnp.log(self.b0)
            - gammaln(self.a0)
            + (self.a0 - 1.0) * e_log_tau
            - self.b0 * e_tau,
            axis=(-2, -1),
        )
        # 5. -E[log q(Z)]
        t5 = -jnp.einsum("...nk,...nk->...", r, log_r)
        # 6. -E[log q(pi)] = H[Dir(alpha)]
        a0sum = jnp.sum(alpha, axis=-1)
        t6 = (
            jnp.sum(gammaln(alpha), axis=-1)
            - gammaln(a0sum)
            - jnp.sum((alpha - 1.0) * (digamma(alpha) - digamma(a0sum)[..., None]), axis=-1)
        )
        # 7. -E[log q(mu, tau)]: H[Normal] + H[Gamma] per (k,d)
        h_mu = 0.5 * (1.0 + _LOG_2PI - e_log_tau - jnp.log(beta))
        h_tau = a - jnp.log(b) + gammaln(a) + (1.0 - a) * digamma(a)
        t7 = jnp.sum(h_mu + h_tau, axis=(-2, -1))

        return t1 + t2 + t3 + t4 + t5 + t6 + t7


def diff_sq(x: jax.Array, xbar: jax.Array) -> jax.Array:
    """(x_n - xbar_k)^2 with broadcasting: (..., N, K, D)."""
    return (x[..., :, None, :] - xbar[..., None, :, :]) ** 2
