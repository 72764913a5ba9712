"""Nonlinear Gaussian state-space model with projected-Gaussian sweeps.

Extends the model ladder beyond the reference's linear chains
(``/root/reference/test/inference_engine_tests.jl:379-488``): user-supplied
``f``/``h`` dynamics with EKF (autodiff linearization) or UKF (sigma-point)
message projection.  Same API shape as :class:`cortex_tpu.models.LGSSM`
(``filter``/``smooth``/``log_evidence``/``sample``), replica-batched over
leading axes, fully jittable and differentiable — ``jax.grad`` through
``log_evidence`` gives ML system identification for free (see
:mod:`cortex_tpu.models.fit`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..ops.nonlinear import (
    NLSSMBeliefs,
    ekf_filter,
    ekf_smooth,
    ukf_filter,
    ukf_smooth,
)

__all__ = ["NonlinearSSM", "NLSSMBeliefs"]


@dataclasses.dataclass(frozen=True)
class NonlinearSSM:
    """``x_1 ~ N(m0, P0)``, ``x_t = f(x_{t-1}) + N(0, Q)``,
    ``y_t = h(x_t) + N(0, R)`` with ``x ∈ R^d``, ``y ∈ R^m``.

    ``f: (d,) -> (d,)`` and ``h: (d,) -> (m,)`` are plain JAX functions;
    replicas are handled by the ops layer (vmap), so the same callables serve
    1 or 100k chains.
    """

    f: Callable[[jax.Array], jax.Array]
    h: Callable[[jax.Array], jax.Array]
    Q: jax.Array
    R: jax.Array
    m0: jax.Array
    P0: jax.Array

    def _args(self, y):
        return (
            self.f,
            self.h,
            jnp.asarray(self.Q),
            jnp.asarray(self.R),
            y,
            jnp.asarray(self.m0),
            jnp.asarray(self.P0),
        )

    def filter(self, y: jax.Array, method: str = "ukf", **kw) -> NLSSMBeliefs:
        """Filtered beliefs p(x_t | y_{1:t}); ``y`` shaped ``(..., T, m)``.
        Keyword options (``alpha``/``beta``/``kappa``/``jitter``) apply to
        the UKF only."""
        if method == "ekf":
            if kw:
                raise TypeError(f"ekf takes no options, got {sorted(kw)}")
            return ekf_filter(*self._args(y))
        if method == "ukf":
            return ukf_filter(*self._args(y), **kw)
        raise ValueError(f"Unknown method: {method!r}")

    def smooth(self, y: jax.Array, method: str = "ukf", **kw) -> NLSSMBeliefs:
        """Smoothed beliefs p(x_t | y_{1:T}) via the extended/unscented RTS
        backward sweep — the nonlinear counterpart of chain BP smoothing."""
        if method == "ekf":
            if kw:
                raise TypeError(f"ekf takes no options, got {sorted(kw)}")
            return ekf_smooth(*self._args(y))
        if method == "ukf":
            return ukf_smooth(*self._args(y), **kw)
        raise ValueError(f"Unknown method: {method!r}")

    def log_evidence(self, y: jax.Array, method: str = "ukf", **kw) -> jax.Array:
        """Approximate log p(y_{1:T}) from the one-step prediction errors,
        shape ``y.shape[:-2]`` (one value per replica)."""
        return self.filter(y, method=method, **kw).loglik

    def sample(
        self, key: jax.Array, T: int, batch_shape: Tuple[int, ...] = ()
    ) -> Tuple[jax.Array, jax.Array]:
        """Simulate ``(x, y)``, shapes ``batch_shape + (T, d/m)``."""
        Q = jnp.asarray(self.Q)
        R = jnp.asarray(self.R)
        m0 = jnp.asarray(self.m0)
        P0 = jnp.asarray(self.P0)
        d, m = Q.shape[-1], R.shape[-1]
        LQ, LR, LP0 = map(jnp.linalg.cholesky, (Q, R, P0))
        k0, kx, ky = jax.random.split(key, 3)

        x1 = m0 + jax.random.normal(k0, batch_shape + (d,)) @ LP0.T
        wn = jax.random.normal(kx, (T - 1,) + batch_shape + (d,))
        vn = jax.random.normal(ky, (T,) + batch_shape + (m,))

        fb = self.f
        for _ in batch_shape:
            fb = jax.vmap(fb)
        hb = self.h
        for _ in batch_shape:
            hb = jax.vmap(hb)

        def step(x, noise):
            x_next = fb(x) + noise @ LQ.T
            return x_next, x_next

        _, xs = jax.lax.scan(step, x1, wn)
        xs = jnp.concatenate([x1[None], xs], axis=0)
        ys = jax.vmap(hb)(xs) + vn @ LR.T
        return jnp.moveaxis(xs, 0, -2), jnp.moveaxis(ys, 0, -2)
