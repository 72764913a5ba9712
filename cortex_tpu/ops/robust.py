"""Robust (Student-t observation) LGSSM smoothing — variational outlier
rejection.

Heavy-tailed observation noise ``y_t = H x_t + t_ν(0, R)`` written as a
Gaussian scale mixture ``y_t | w_t ~ N(H x_t, R / w_t)``,
``w_t ~ Gamma(ν/2, ν/2)``, and solved by mean-field VB coordinate ascent:

  E-step (weights):  E[w_t] = (ν + 1) / (ν + E[(y_t − H x_t)²] / R)
  M-step (states):   one Gaussian smoothing sweep with per-step
                     observation precision  w_t · H²/R

Both steps are exactly the framework's primitives: the state update is the
information-form chain sweep (`cortex_tpu.ops.chains._info_form_smooth`)
with reweighted observation messages, so the whole loop is a
``lax.fori_loop`` of O(T) scans under ``jit``.  An outlier's weight
collapses toward ``(ν+1)/(ν + z²)`` ≈ 0, removing its pull on the posterior
— where a Gaussian smoother would be dragged.  ν → ∞ recovers the standard
smoother exactly.

The converged weights double as per-step **outlier scores** (small = outlier).

The reference has no robust rule sets (its processor ships nothing,
`/root/reference/src/inference_engine.jl:331-477`); this is the VMP-style
extension of its chain models to heavy tails.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .chains import _info_form_smooth

__all__ = ["RobustChainResult", "robust_lgssm_smooth"]


class RobustChainResult(NamedTuple):
    """Posterior marginals plus the VB observation weights (outlier scores:
    E[w_t] ≈ 1 for inliers, → 0 for gross outliers)."""

    mean: jax.Array  # (..., T)
    variance: jax.Array  # (..., T)
    weights: jax.Array  # (..., T)


def robust_lgssm_smooth(
    y: jax.Array,
    A: float = 1.0,
    Q: float = 1.0,
    H: float = 1.0,
    R: float = 1.0,
    nu: float = 4.0,
    n_iters: int = 15,
    prior: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> RobustChainResult:
    """VB smoothing of a scalar chain under Student-t_ν observation noise.

    Same contract as :func:`cortex_tpu.ops.chains.lgssm_smooth_scan`
    (``y``: ``(..., T)``, NaN = missing, optional prior on ``x_1``) plus the
    tail parameter ``nu`` (ν → ∞ ⇒ Gaussian) and the VB iteration count.
    """
    y = jnp.asarray(y)
    observed = ~jnp.isnan(y)
    y = jnp.where(observed, y, 0.0)
    yT = jnp.moveaxis(y, -1, 0)  # (T, ...)
    obsT = jnp.moveaxis(observed, -1, 0)
    w_base = jnp.where(obsT, jnp.asarray((H * H) / R, y.dtype), 0.0)
    w_base = jnp.broadcast_to(w_base, yT.shape)

    def sweep(weights):
        xi_obs = jnp.where(obsT, weights * H * yT / R, 0.0)
        w_obs = weights * w_base
        return _info_form_smooth(xi_obs, w_obs, A, Q, prior)

    def body(_, weights):
        marg = sweep(weights)
        mT = jnp.moveaxis(marg.mean, -1, 0)
        vT = jnp.moveaxis(marg.variance, -1, 0)
        # E[(y − Hx)²] under the smoothed marginal; variance at fully
        # unobserved steps can be inf — masked steps keep weight 1.
        resid2 = (yT - H * mT) ** 2 + H * H * jnp.where(obsT, vT, 0.0)
        w_new = (nu + 1.0) / (nu + resid2 / R)
        return jnp.where(obsT, w_new, 1.0)

    weights = lax.fori_loop(0, n_iters, body, jnp.ones_like(yT))
    marg = sweep(weights)
    return RobustChainResult(marg.mean, marg.variance, jnp.moveaxis(weights, 0, -1))
