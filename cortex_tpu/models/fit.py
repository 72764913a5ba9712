"""Differentiable inference: gradient-based parameter learning.

Every inference program in this framework is a pure JAX function, so the
log evidence is differentiable w.r.t. model parameters — a capability with
no counterpart in the reference (its rules are opaque Julia callables).
Maximum-likelihood system identification for the LGSSM becomes a dozen lines
of gradient ascent through the Kalman-filter scan, batched over replicas and
shardable over a mesh like everything else.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["LGSSMParams", "fit_lgssm_ml", "fit_hgf_ml"]


class LGSSMParams(NamedTuple):
    """Unconstrained parameterization: ``A`` free, noise variances via log."""

    A: jax.Array
    log_Q: jax.Array
    log_R: jax.Array

    @property
    def Q(self) -> jax.Array:
        return jnp.exp(self.log_Q)

    @property
    def R(self) -> jax.Array:
        return jnp.exp(self.log_R)


def _neg_log_evidence(params: LGSSMParams, y: jax.Array, prior) -> jax.Array:
    """Average negative log evidence over replicas (prediction-error
    decomposition — the same scan as ``LGSSM.log_evidence`` but traced with
    the parameters as differentiable inputs)."""
    A, Q, R = params.A, params.Q, params.R
    yT = jnp.moveaxis(jnp.asarray(y), -1, 0)
    pm = jnp.broadcast_to(jnp.asarray(prior[0], y.dtype), yT.shape[1:])
    pv = jnp.broadcast_to(jnp.asarray(prior[1], y.dtype), yT.shape[1:])

    def step(carry, obs):
        m, v = carry
        s = v + R
        ll = -0.5 * (jnp.log(2.0 * jnp.pi * s) + (obs - m) ** 2 / s)
        k = v / s
        m_f = m + k * (obs - m)
        v_f = v - k * v
        return (A * m_f, A * A * v_f + Q), ll

    _, lls = jax.lax.scan(step, (pm, pv), yT)
    return -jnp.mean(jnp.sum(lls, axis=0))


def fit_lgssm_ml(
    y: jax.Array,
    n_steps: int = 500,
    learning_rate: float = 0.05,
    init: LGSSMParams = None,
    prior: Tuple[float, float] = (0.0, 10.0),
) -> Tuple[LGSSMParams, jax.Array]:
    """Maximum-likelihood LGSSM parameters by Adam on the exact log evidence.

    ``y``: ``(..., T)`` observations (replicas pooled into the likelihood).
    Returns the fitted params and the loss trace.  The whole optimization is
    one jitted ``lax.scan`` — gradients flow through the Kalman filter.
    """
    y = jnp.asarray(y)
    if init is None:
        init = LGSSMParams(
            jnp.asarray(0.5), jnp.log(jnp.var(y) / 2 + 1e-3), jnp.log(jnp.var(y) / 2 + 1e-3)
        )

    import optax

    opt = optax.adam(learning_rate)
    loss_grad = jax.value_and_grad(_neg_log_evidence)

    def step(carry, _):
        params, opt_state = carry
        loss, grads = loss_grad(params, y, prior)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, _), losses = jax.lax.scan(
        step, (init, opt.init(init)), None, length=n_steps
    )
    return params, losses


def fit_hgf_ml(
    u: jax.Array,
    n_steps: int = 300,
    learning_rate: float = 0.05,
    init_omega: float = -2.0,
    init_log_theta: float = -3.0,
    kappa: float = 1.0,
    pi_u: float = 10.0,
):
    """Fit the continuous HGF's volatility parameters (ω, θ) by maximizing
    the one-step-ahead predictive likelihood — the standard model-fitting
    objective for hierarchical Gaussian filters, here as plain gradient
    ascent through the filtering scan.

    Returns ``((omega, theta), losses)``.
    """
    import optax

    from .hgf import HGF

    u = jnp.asarray(u)

    def nll(params):
        omega, log_theta = params
        model = HGF(
            kappa=kappa, omega=omega, theta=jnp.exp(log_theta), pi_u=pi_u
        )
        return -jnp.mean(model.log_likelihood(u))

    opt = optax.adam(learning_rate)
    loss_grad = jax.value_and_grad(nll)

    def step(carry, _):
        params, opt_state = carry
        loss, grads = loss_grad(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    init = (jnp.asarray(init_omega), jnp.asarray(init_log_theta))
    (params, _), losses = jax.lax.scan(
        step, (init, opt.init(init)), None, length=n_steps
    )
    omega, log_theta = params
    return (omega, jnp.exp(log_theta)), losses
