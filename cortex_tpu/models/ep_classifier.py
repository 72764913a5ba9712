"""Bayesian linear classification via parallel EP — probit and logistic.

User-facing wrapper over :func:`cortex_tpu.ops.ep.ep_linear_model`: fit a
Gaussian posterior over the weights of ``p(y=+1 | x) = link(x·w)`` and emit
calibrated predictive probabilities that integrate over the posterior
(not a point estimate).  Probit sites are moment-matched in closed form
(Rasmussen & Williams eq. 3.58); logistic sites by Gauss–Hermite quadrature
— the generic non-conjugate route the reference's rule interface admits but
never ships (`/root/reference/src/inference_engine.jl:331-477`).

Predictives: with ``z* = x*·w``, ``q(z*) = N(μ*, σ*²)``:
- probit: exact — ``p(+1) = Φ(μ*/√(1+σ*²))``,
- logistic: Gauss–Hermite over ``σ(z*) N(z*; μ*, σ*²)``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.stats import norm

from ..ops.ep import EPResult, ep_linear_model, gauss_hermite_tilted, probit_tilted_moments

__all__ = ["EPClassifier", "EPClassifierPosterior"]


class EPClassifierPosterior(NamedTuple):
    """Fitted weight posterior ``N(mean, cov)`` plus the predictive link."""

    mean: jax.Array
    cov: jax.Array
    ep: EPResult
    likelihood: str

    def latent(self, Xs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Latent predictive ``q(z*) = N(μ*, σ*²)`` at ``(m, d)`` inputs."""
        Xs = jnp.atleast_2d(jnp.asarray(Xs))
        mu = Xs @ self.mean
        var = jnp.sum((Xs @ self.cov) * Xs, axis=-1)
        return mu, var

    def predict_proba(self, Xs: jax.Array) -> jax.Array:
        """``p(y=+1 | x*)`` integrated over the weight posterior."""
        mu, var = self.latent(Xs)
        if self.likelihood == "probit":
            return norm.cdf(mu / jnp.sqrt(1.0 + var))
        nodes, weights = np.polynomial.hermite_e.hermegauss(31)
        z = mu[:, None] + jnp.sqrt(var)[:, None] * jnp.asarray(nodes, mu.dtype)
        w = jnp.asarray(weights / np.sqrt(2.0 * np.pi), mu.dtype)
        return jnp.sum(jax.nn.sigmoid(z) * w[None, :], axis=-1)

    def predict(self, Xs: jax.Array) -> jax.Array:
        """Hard labels in {-1, +1}."""
        return jnp.where(self.predict_proba(Xs) >= 0.5, 1.0, -1.0)


@dataclasses.dataclass(frozen=True)
class EPClassifier:
    """Bayesian linear classifier ``y ∈ {-1,+1}``, ``p(y|x) = link(y·x·w)``.

    ``likelihood``: ``"probit"`` (closed-form EP sites) or ``"logistic"``
    (Gauss–Hermite sites).  ``prior_var`` is the isotropic weight prior.
    """

    likelihood: str = "probit"
    prior_var: float = 1.0
    n_iters: int = 40
    damping: float = 0.8

    def fit(self, X: jax.Array, y: jax.Array) -> EPClassifierPosterior:
        """``X``: ``(n, d)``; ``y``: ``(n,)`` in {-1, +1}."""
        X = jnp.atleast_2d(jnp.asarray(X))
        y = jnp.asarray(y)
        if self.likelihood == "probit":
            tilted = probit_tilted_moments(y)
        elif self.likelihood == "logistic":
            tilted = gauss_hermite_tilted(
                lambda z: jax.nn.log_sigmoid(y[:, None] * z)
            )
        else:
            raise ValueError(
                f"unknown likelihood {self.likelihood!r}; expected 'probit' or 'logistic'"
            )
        ep = ep_linear_model(
            X,
            tilted,
            prior_var=self.prior_var,
            n_iters=self.n_iters,
            damping=self.damping,
        )
        return EPClassifierPosterior(ep.mean, ep.cov, ep, self.likelihood)
