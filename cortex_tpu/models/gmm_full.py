"""Full-covariance variational Bayesian GMM (Normal–Wishart components).

The complete Bishop §10.2 treatment: ``q(Z) q(π) Π q(μ_k, Λ_k)`` with
``π ~ Dir(α0)`` and ``(μ_k, Λ_k) ~ N(m0, (β0 Λ_k)^-1) W(W0, ν0)`` — full
precision matrices, so correlated clusters are modeled exactly (the diagonal
:class:`cortex_tpu.models.gmm.GMM` cannot).  Batched over replicas; the
variational free energy (−ELBO, eqs. 10.70–10.77) is tracked in closed form
and decreases monotonically.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import digamma, gammaln, multigammaln

from ..dists.gaussian import _spd_inv, _spd_logdet

__all__ = ["GMMFull", "GMMFullPosterior", "GMMFullResult"]

_LOG_2PI = math.log(2.0 * math.pi)
_LOG_2 = math.log(2.0)


def _mT(x):
    return jnp.swapaxes(x, -1, -2)


def _e_logdet_lambda(nu, W):
    """E[log|Λ|] = Σ_d ψ((ν+1−d)/2) + D log2 + log|W|."""
    D = W.shape[-1]
    i = jnp.arange(1, D + 1)
    logdetW = _spd_logdet(W)
    return (
        jnp.sum(digamma((nu[..., None] + 1.0 - i) / 2.0), axis=-1)
        + D * _LOG_2
        + logdetW
    )


def _log_B(W, nu):
    """log of the Wishart normalizer B(W, ν) (Bishop B.79)."""
    D = W.shape[-1]
    logdetW = _spd_logdet(W)
    return (
        -0.5 * nu * logdetW
        - 0.5 * nu * D * _LOG_2
        - multigammaln(nu / 2.0, D)
    )


class GMMFullPosterior(NamedTuple):
    alpha: jax.Array  # (..., K)
    m: jax.Array  # (..., K, D)
    beta: jax.Array  # (..., K)
    W: jax.Array  # (..., K, D, D) Wishart scale
    nu: jax.Array  # (..., K) Wishart dof

    @property
    def weights(self) -> jax.Array:
        return self.alpha / jnp.sum(self.alpha, axis=-1, keepdims=True)

    @property
    def means(self) -> jax.Array:
        return self.m

    @property
    def expected_precisions(self) -> jax.Array:
        return self.nu[..., None, None] * self.W

    @property
    def expected_covariances(self) -> jax.Array:
        """E[Σ_k] under the Wishart posterior: ``W_k^-1 / (ν_k − D − 1)``
        (defined for ν > D + 1; the divisor is clamped positive, so values for
        barely-populated components are upper bounds)."""
        D = self.W.shape[-1]
        divisor = jnp.maximum(self.nu - D - 1.0, 1e-6)
        return _spd_inv(self.W) / divisor[..., None, None]


class GMMFullResult(NamedTuple):
    posterior: GMMFullPosterior
    responsibilities: jax.Array  # (..., N, K)
    free_energy: jax.Array  # (..., n_iterations)


@dataclasses.dataclass(frozen=True)
class GMMFull:
    """Bayesian GMM with K full-covariance components in D dims."""

    K: int
    alpha0: float = 1.0
    beta0: float = 1.0
    nu0: Optional[float] = None  # default: D
    m0: float = 0.0
    w0_scale: float = 1.0  # W0 = w0_scale * I

    def fit(
        self,
        x: jax.Array,
        n_iterations: int = 50,
        key: Optional[jax.Array] = None,
        init_means: Optional[jax.Array] = None,
    ) -> GMMFullResult:
        x = jnp.asarray(x)
        K = self.K
        N, D = x.shape[-2], x.shape[-1]
        batch = x.shape[:-2]
        nu0 = float(self.nu0) if self.nu0 is not None else float(D)
        W0 = self.w0_scale * jnp.eye(D)
        W0_inv = _spd_inv(W0)
        m0 = jnp.full((D,), self.m0)

        if init_means is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            idx = jax.random.choice(key, N, shape=(K,), replace=False)
            init_means = jnp.take(x, idx, axis=-2)

        post0 = GMMFullPosterior(
            alpha=jnp.broadcast_to(jnp.full((K,), self.alpha0), batch + (K,)),
            m=jnp.broadcast_to(init_means, batch + (K, D)),
            beta=jnp.full(batch + (K,), self.beta0),
            W=jnp.broadcast_to(W0, batch + (K, D, D)),
            nu=jnp.full(batch + (K,), nu0),
        )

        def vmp_iter(carry, _):
            post, _r = carry
            alpha, m, beta, W, nu = post

            # -- E-step --------------------------------------------------
            e_log_pi = digamma(alpha) - digamma(
                jnp.sum(alpha, axis=-1, keepdims=True)
            )
            e_logdet = _e_logdet_lambda(nu, W)  # (..., K)
            diff = x[..., :, None, :] - m[..., None, :, :]  # (..., N, K, D)
            quad = nu[..., None, :] * jnp.einsum(
                "...nkd,...kde,...nke->...nk", diff, W, diff
            ) + D / beta[..., None, :]
            log_rho = (
                e_log_pi[..., None, :]
                + 0.5 * e_logdet[..., None, :]
                - 0.5 * D * _LOG_2PI
                - 0.5 * quad
            )
            log_r = jax.nn.log_softmax(log_rho, axis=-1)
            r = jnp.exp(log_r)

            # -- M-step --------------------------------------------------
            Nk = jnp.sum(r, axis=-2) + 1e-10  # (..., K)
            xbar = (
                jnp.einsum("...nk,...nd->...kd", r, x) / Nk[..., :, None]
            )
            dxb = x[..., :, None, :] - xbar[..., None, :, :]
            S = (
                jnp.einsum("...nk,...nkd,...nke->...kde", r, dxb, dxb)
                / Nk[..., :, None, None]
            )
            alpha_n = self.alpha0 + Nk
            beta_n = self.beta0 + Nk
            m_n = (
                (self.beta0 * m0 + Nk[..., :, None] * xbar)
                / beta_n[..., :, None]
            )
            nu_n = nu0 + Nk
            dm = xbar - m0
            W_inv = (
                W0_inv
                + Nk[..., :, None, None] * S
                + (self.beta0 * Nk / beta_n)[..., :, None, None]
                * dm[..., :, None]
                * dm[..., None, :]
            )
            W_n = _spd_inv(W_inv)
            new_post = GMMFullPosterior(alpha_n, m_n, beta_n, W_n, nu_n)
            fe = -self._elbo(x, new_post, r, log_r, Nk, xbar, S, nu0, W0, W0_inv, m0)
            return (new_post, r), fe

        r0 = jnp.zeros(batch + (N, K))
        (post, r), fes = lax.scan(vmp_iter, (post0, r0), None, length=n_iterations)
        return GMMFullResult(post, r, jnp.moveaxis(fes, 0, -1))

    def _elbo(self, x, post, r, log_r, Nk, xbar, S, nu0, W0, W0_inv, m0):
        """Bishop eqs. 10.70–10.77 (full covariance)."""
        K = self.K
        D = x.shape[-1]
        alpha, m, beta, W, nu = post

        e_log_pi = digamma(alpha) - digamma(jnp.sum(alpha, axis=-1, keepdims=True))
        e_logdet = _e_logdet_lambda(nu, W)

        # 10.71
        dxm = xbar - m
        t1 = 0.5 * jnp.sum(
            Nk
            * (
                e_logdet
                - D / beta
                - nu * jnp.einsum("...kde,...ked->...k", S, W)
                - nu * jnp.einsum("...kd,...kde,...ke->...k", dxm, W, dxm)
                - D * _LOG_2PI
            ),
            axis=-1,
        )
        # 10.72
        t2 = jnp.einsum("...nk,...k->...", r, e_log_pi)
        # 10.73
        t3 = (
            gammaln(K * self.alpha0)
            - K * gammaln(self.alpha0)
            + (self.alpha0 - 1.0) * jnp.sum(e_log_pi, axis=-1)
        )
        # 10.74
        dm0 = m - m0
        t4 = (
            0.5
            * jnp.sum(
                D * jnp.log(self.beta0 / (2.0 * jnp.pi))
                + e_logdet
                - D * self.beta0 / beta
                - self.beta0
                * nu
                * jnp.einsum("...kd,...kde,...ke->...k", dm0, W, dm0),
                axis=-1,
            )
            + K * _log_B(W0, jnp.asarray(nu0))
            + 0.5 * (nu0 - D - 1.0) * jnp.sum(e_logdet, axis=-1)
            - 0.5
            * jnp.sum(
                nu * jnp.einsum("de,...ked->...k", W0_inv, W), axis=-1
            )
        )
        # 10.75
        t5 = jnp.einsum("...nk,...nk->...", r, log_r)
        # 10.76
        a0sum = jnp.sum(alpha, axis=-1)
        t6 = (
            jnp.sum((alpha - 1.0) * e_log_pi, axis=-1)
            + gammaln(a0sum)
            - jnp.sum(gammaln(alpha), axis=-1)
        )
        # 10.77 with H[W] = -log B - ((ν-D-1)/2) E[log|Λ|] + νD/2
        h_w = (
            -_log_B(W, nu)
            - 0.5 * (nu - D - 1.0) * e_logdet
            + 0.5 * nu * D
        )
        t7 = jnp.sum(
            0.5 * e_logdet + 0.5 * D * jnp.log(beta / (2.0 * jnp.pi)) - 0.5 * D - h_w,
            axis=-1,
        )
        return t1 + t2 + t3 + t4 - t5 - t6 - t7
