"""Autoregressive model family: conjugate Bayesian AR(p) + latent-AR smoothing.

Two regimes, both exact:

- :class:`BayesianAR` — the observed-series case ``y_t = Σ_k w_k y_{t-k} + ε``.
  Conjugate Normal–Inverse-Gamma posterior over (coefficients, noise
  variance), closed-form log evidence (multivariate-t marginal), and k-step
  predictive means via companion-matrix powers.  One lag-matrix build + one
  (p×p) solve — trivially batched over replica series.
- :func:`latent_ar_smooth` — the noisy-observation case ``x_t`` AR(p) latent,
  ``y_t = x_t + noise``: lowered to a companion-form vector LGSSM and handed
  to the time-parallel associative-scan smoother
  (:func:`cortex_tpu.ops.chains_mv.mv_lgssm_smooth`), so a latent AR chain
  costs the same O(log T) depth as any other chain model here.

The reference treats autoregressions as just another chain factor graph the
user wires by hand (its SSM tests, `/root/reference/test/inference_engine_tests.jl:436-462`);
here the family is first-class with the conjugate algebra built in.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.chains_mv import MvChainMarginals, mv_lgssm_smooth
from .glm import NIGPosterior, nig_fit

__all__ = ["ARPosterior", "BayesianAR", "companion_matrix", "latent_ar_smooth"]

#: The AR posterior *is* the shared Normal–Inverse-Gamma posterior on the
#: lag design (`cortex_tpu.models.glm.nig_fit`).
ARPosterior = NIGPosterior


def companion_matrix(coeffs: jax.Array) -> jax.Array:
    """``(p,) -> (p, p)`` companion form: first row = coefficients, subdiagonal
    identity.  ``x_t = [w·lags, shift]``."""
    coeffs = jnp.asarray(coeffs)
    p = coeffs.shape[-1]
    lower = jnp.eye(p, dtype=coeffs.dtype)[:-1]
    return jnp.concatenate([coeffs[None, :], lower], axis=0)


def _lag_matrix(y: jax.Array, p: int) -> Tuple[jax.Array, jax.Array]:
    """``(..., T) -> ((..., T-p, p), (..., T-p))`` design/targets.  Column k
    holds lag k+1 (most recent lag first), matching companion ordering."""
    T = y.shape[-1]
    cols = [y[..., p - 1 - k : T - 1 - k] for k in range(p)]
    X = jnp.stack(cols, axis=-1)
    return X, y[..., p:]


@dataclasses.dataclass(frozen=True)
class BayesianAR:
    """Conjugate Bayesian AR(p): ``y_t ~ N(Σ_k w_k y_{t-k}, σ²)`` with the
    Normal–Inverse-Gamma prior ``w|σ² ~ N(0, σ² prior_scale·I)``,
    ``σ² ~ InvGamma(a0, b0)``."""

    p: int = 1
    prior_scale: float = 100.0
    a0: float = 2.0
    b0: float = 1.0

    def fit(self, y: jax.Array) -> ARPosterior:
        """Exact posterior from a ``(..., T)`` series (leading axes = replica
        series, each fit independently in one batched solve).  Delegates to
        the shared NIG algebra on the lag design."""
        y = jnp.asarray(y)
        X, t = _lag_matrix(y, self.p)
        return nig_fit(X, t, self.prior_scale, self.a0, self.b0)

    def predict(
        self, y: jax.Array, posterior: Optional[ARPosterior] = None, horizon: int = 1
    ) -> jax.Array:
        """Posterior-mean forecast ``(..., horizon)`` by iterating the
        companion map at the posterior coefficient mean."""
        y = jnp.asarray(y)
        post = posterior if posterior is not None else self.fit(y)
        if post.mean.ndim == 1:
            A = companion_matrix(post.mean)
        else:
            A = jax.vmap(companion_matrix)(
                post.mean.reshape(-1, self.p)
            ).reshape(post.mean.shape[:-1] + (self.p, self.p))
        state = jnp.flip(y[..., -self.p :], axis=-1)  # most recent first

        def step(s, _):
            s2 = jnp.einsum("...ij,...j->...i", A, s)
            return s2, s2[..., 0]

        _, preds = jax.lax.scan(step, state, None, length=horizon)
        return jnp.moveaxis(preds, 0, -1)


def latent_ar_smooth(
    y: jax.Array,
    coeffs: jax.Array,
    process_noise: float,
    obs_noise: float,
    prior_var: float = 10.0,
) -> MvChainMarginals:
    """Exact marginals of a latent AR(p) chain observed in Gaussian noise.

    ``x_t = Σ_k c_k x_{t-k} + N(0, process_noise)``;
    ``y_t = x_t + N(0, obs_noise)``; ``y``: ``(..., T)``.  Lowers to the
    companion-form LGSSM and runs the time-parallel smoother; the returned
    ``mean[..., t, 0]`` / ``cov[..., t, 0, 0]`` are the marginals of ``x_t``.
    """
    coeffs = jnp.asarray(coeffs)
    p = coeffs.shape[-1]
    A = companion_matrix(coeffs)
    e1 = jnp.zeros((p,), coeffs.dtype).at[0].set(1.0)
    Q = process_noise * jnp.outer(e1, e1) + 1e-9 * jnp.eye(p, dtype=coeffs.dtype)
    H = e1[None, :]
    R = jnp.asarray([[obs_noise]], coeffs.dtype)
    m0 = jnp.zeros((p,), coeffs.dtype)
    P0 = prior_var * jnp.eye(p, dtype=coeffs.dtype)
    return mv_lgssm_smooth(jnp.asarray(y)[..., None], A, Q, H, R, (m0, P0))
