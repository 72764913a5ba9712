"""Binary hierarchical Gaussian filter (3-level).

The canonical binary-input HGF (Mathys et al. 2011): binary observations
``u ∈ {0,1}`` arise from a probability ``sigmoid(x2)``; ``x2`` is a Gaussian
random walk whose volatility is governed by a third level ``x3``.  Closed-form
precision-weighted updates per trial; same streaming/batching properties as
the continuous :class:`cortex_tpu.models.hgf.HGF` and the same numerical
guards.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["BinaryHGF", "BinaryHGFState", "BinaryHGFTrajectory"]


class BinaryHGFState(NamedTuple):
    mu2: jax.Array
    pi2: jax.Array
    mu3: jax.Array
    pi3: jax.Array


class BinaryHGFTrajectory(NamedTuple):
    p_hat: jax.Array  # predicted outcome probability before each trial
    mu2: jax.Array
    pi2: jax.Array
    mu3: jax.Array
    pi3: jax.Array


@dataclasses.dataclass(frozen=True)
class BinaryHGF:
    """3-level binary HGF with fixed coupling/volatility parameters."""

    kappa: float = 1.0
    omega: float = -2.0
    theta: float = 0.05
    max_log_nu: float = 20.0
    min_pi3: float = 1e-2
    max_mu3_step: float = 5.0

    def init_state(self, batch_shape: Tuple[int, ...] = (), dtype=jnp.float32):
        z = jnp.zeros(batch_shape, dtype)
        return BinaryHGFState(z, jnp.ones_like(z), z, jnp.ones_like(z))

    def step(self, state: BinaryHGFState, u: jax.Array):
        """One trial: binary observation(s) ``u`` → new state, predicted p."""
        mu2, pi2, mu3, pi3 = state

        # Level-1 prediction (before seeing u).
        muhat1 = jax.nn.sigmoid(mu2)
        delta1 = u - muhat1

        # Level-2 update.
        log_nu = jnp.clip(
            self.kappa * mu3 + self.omega, -self.max_log_nu, self.max_log_nu
        )
        nu = jnp.exp(log_nu)
        pihat2 = 1.0 / (1.0 / pi2 + nu)
        pi2_new = pihat2 + muhat1 * (1.0 - muhat1)
        mu2_new = mu2 + delta1 / pi2_new

        # Level-3 (volatility) update.
        w2 = nu * pihat2
        delta2 = (1.0 / pi2_new + (mu2_new - mu2) ** 2) * pihat2 - 1.0
        pihat3 = 1.0 / (1.0 / pi3 + self.theta)
        pi3_new = pihat3 + 0.5 * self.kappa**2 * w2 * (
            w2 + (2.0 * w2 - 1.0) * delta2
        )
        pi3_new = jnp.maximum(pi3_new, self.min_pi3)
        mu3_step = jnp.clip(
            0.5 * self.kappa * (w2 / pi3_new) * delta2,
            -self.max_mu3_step,
            self.max_mu3_step,
        )
        mu3_new = mu3 + mu3_step

        return BinaryHGFState(mu2_new, pi2_new, mu3_new, pi3_new), muhat1

    def filter(self, u: jax.Array, state: BinaryHGFState = None):
        """Filter a trial series ``u`` of shape ``(..., T)``."""
        u = jnp.asarray(u, jnp.float32)
        uT = jnp.moveaxis(u, -1, 0)
        if state is None:
            state = self.init_state(uT.shape[1:], u.dtype)

        def body(st, u_t):
            new_st, p_hat = self.step(st, u_t)
            return new_st, (p_hat, new_st.mu2, new_st.pi2, new_st.mu3, new_st.pi3)

        final, traj = lax.scan(body, state, uT)
        traj = tuple(jnp.moveaxis(a, 0, -1) for a in traj)
        return final, BinaryHGFTrajectory(*traj)
