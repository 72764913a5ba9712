"""Generalized linear model family: conjugate linear regression + Poisson EP.

- :class:`BayesianLinearRegression` — the exact Normal–Inverse-Gamma
  posterior over (weights, noise variance) for arbitrary design matrices:
  one batched d×d solve, closed-form log evidence (multivariate-t marginal)
  and Student-t posterior predictives.  :class:`cortex_tpu.models.BayesianAR`
  is this model on a lag design; the NIG algebra lives here and is shared.
- :class:`PoissonRegression` — counts with a log link, fit by parallel EP
  with Gauss–Hermite moment matching (`cortex_tpu.ops.ep`); the predictive
  rate integrates the log-normal rate over the weight posterior.

The reference's processor interface admits arbitrary rule algebras but ships
none (`/root/reference/src/inference_engine.jl:331-477`); regression is the
workhorse family a production Bayesian toolbox cannot omit.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.ep import EPResult, ep_linear_model, gauss_hermite_tilted

__all__ = [
    "BayesianLinearRegression",
    "NIGPosterior",
    "PoissonRegression",
    "PoissonPosterior",
    "nig_fit",
]


class NIGPosterior(NamedTuple):
    """Exact Normal–Inverse-Gamma posterior: ``w | σ² ~ N(mean, σ² cov_scale)``,
    ``σ² ~ InvGamma(a, b)``; ``log_evidence`` is the marginal likelihood of
    the targets (multivariate-t)."""

    mean: jax.Array  # (..., d)
    cov_scale: jax.Array  # (..., d, d) — V_n (multiply by σ² for the cov)
    a: jax.Array  # (...,)
    b: jax.Array  # (...,)
    log_evidence: jax.Array  # (...,)

    @property
    def noise_mean(self) -> jax.Array:
        """Posterior mean of σ² (requires a > 1)."""
        return self.b / (self.a - 1.0)

    @property
    def coeff_cov(self) -> jax.Array:
        """Marginal coefficient covariance E[σ²]·V_n (a > 1)."""
        return self.noise_mean[..., None, None] * self.cov_scale


def nig_fit(
    X: jax.Array,
    t: jax.Array,
    prior_scale: float = 100.0,
    a0: float = 2.0,
    b0: float = 1.0,
) -> NIGPosterior:
    """Exact NIG update for ``t = X w + N(0, σ²)`` with prior
    ``w|σ² ~ N(0, σ² prior_scale·I)``, ``σ² ~ InvGamma(a0, b0)``.

    ``X``: ``(..., n, d)``; ``t``: ``(..., n)``.  Batched over leading axes
    (one solve per replica problem).
    """
    X = jnp.asarray(X)
    t = jnp.asarray(t)
    d = X.shape[-1]
    n = t.shape[-1]
    Xt = jnp.swapaxes(X, -1, -2)
    V0_inv = jnp.eye(d, dtype=X.dtype) / prior_scale
    prec = V0_inv + Xt @ X
    Vn = jnp.linalg.inv(prec)
    mn = jnp.einsum("...ij,...j->...i", Vn, jnp.einsum("...ij,...j->...i", Xt, t))
    a_n = a0 + 0.5 * n
    quad = jnp.einsum("...i,...i->...", t, t) - jnp.einsum(
        "...i,...ij,...j->...", mn, prec, mn
    )
    b_n = b0 + 0.5 * quad
    _, logdet_prec = jnp.linalg.slogdet(prec)
    logdet_V0_inv = -d * jnp.log(prior_scale)
    log_ev = (
        -0.5 * n * jnp.log(2.0 * jnp.pi)
        + 0.5 * (logdet_V0_inv - logdet_prec)
        + a0 * jnp.log(b0)
        - a_n * jnp.log(b_n)
        + jax.scipy.special.gammaln(a_n)
        - jax.scipy.special.gammaln(a0)
    )
    return NIGPosterior(mn, Vn, jnp.broadcast_to(a_n, b_n.shape), b_n, log_ev)


@dataclasses.dataclass(frozen=True)
class BayesianLinearRegression:
    """``y = X w + N(0, σ²)`` with the conjugate NIG prior."""

    prior_scale: float = 100.0
    a0: float = 2.0
    b0: float = 1.0

    def fit(self, X: jax.Array, y: jax.Array) -> NIGPosterior:
        """Exact posterior from a ``(..., n, d)`` design and ``(..., n)``
        targets."""
        return nig_fit(X, y, self.prior_scale, self.a0, self.b0)

    def predictive(
        self, posterior: NIGPosterior, Xs: jax.Array
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Student-t posterior predictive at ``(m, d)`` test points:
        ``(mean, variance, dof)`` with ``variance = (b/a)(1 + xᵀ V x)
        · dof/(dof-2)`` left to the caller — returns the *scale²* and dof so
        moments stay exact: mean, scale², dof = 2a."""
        Xs = jnp.atleast_2d(jnp.asarray(Xs))
        mean = Xs @ posterior.mean
        scale2 = (posterior.b / posterior.a) * (
            1.0 + jnp.sum((Xs @ posterior.cov_scale) * Xs, axis=-1)
        )
        return mean, scale2, 2.0 * posterior.a


class PoissonPosterior(NamedTuple):
    """Gaussian EP posterior over the log-rate weights."""

    mean: jax.Array
    cov: jax.Array
    ep: EPResult

    def predict_rate(self, Xs: jax.Array) -> jax.Array:
        """Posterior-predictive mean rate E[exp(x·w)] (log-normal mean)."""
        Xs = jnp.atleast_2d(jnp.asarray(Xs))
        mu = Xs @ self.mean
        var = jnp.sum((Xs @ self.cov) * Xs, axis=-1)
        return jnp.exp(mu + 0.5 * var)


@dataclasses.dataclass(frozen=True)
class PoissonRegression:
    """Poisson GLM ``y_i ~ Poisson(exp(x_i·w))`` with a Gaussian weight
    prior, fit by parallel EP with Gauss–Hermite sites."""

    prior_var: float = 1.0
    n_iters: int = 60
    damping: float = 0.6
    n_quad: int = 31

    def fit(self, X: jax.Array, y: jax.Array) -> PoissonPosterior:
        """``X``: ``(n, d)``; ``y``: ``(n,)`` non-negative counts."""
        X = jnp.atleast_2d(jnp.asarray(X))
        y = jnp.asarray(y, X.dtype)

        def log_lik(z):  # z: (n, k); Poisson log-pmf up to the y! constant
            zc = jnp.clip(z, -30.0, 30.0)
            return y[:, None] * zc - jnp.exp(zc)

        tilted = gauss_hermite_tilted(log_lik, n_points=self.n_quad)
        ep = ep_linear_model(
            X,
            tilted,
            prior_var=self.prior_var,
            n_iters=self.n_iters,
            damping=self.damping,
        )
        return PoissonPosterior(ep.mean, ep.cov, ep)
