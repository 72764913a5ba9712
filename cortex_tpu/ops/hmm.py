"""Discrete-chain message passing: HMM forward-backward as XLA scans.

The discrete analogue of :mod:`cortex_tpu.ops.chains`: sum-product on a chain
of categorical variables compiles to forward/backward scans over time,
batched over replicas in the leading axes.  Messages are kept in log space
(logsumexp recursions) for stability; marginals and pairwise marginals come
out normalized.

Shapes: ``log_lik``: ``(..., T, K)``; ``log_A``: ``(K, K)`` (row = from-state)
or batched ``(..., K, K)``; ``log_pi``: ``(K,)`` or ``(..., K)``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.nn import logsumexp

__all__ = ["HMMPosterior", "hmm_forward_backward", "hmm_viterbi"]


class HMMPosterior(NamedTuple):
    log_gamma: jax.Array  # (..., T, K) state marginals
    log_xi_sum: jax.Array  # (..., K, K) summed pairwise marginals (counts)
    log_evidence: jax.Array  # (...,) log p(y_{1:T})


def hmm_forward_backward(
    log_lik: jax.Array, log_A: jax.Array, log_pi: jax.Array
) -> HMMPosterior:
    """Sum-product forward-backward on the HMM chain.

    The static-schedule equivalent of BP sweeps on a discrete chain factor
    graph: forward messages ``alpha`` and backward messages ``beta`` via
    ``lax.scan``, marginals ``gamma ∝ alpha·beta``, pairwise expected counts
    summed over time (the sufficient statistics for Dirichlet VMP updates).
    """
    log_lik = jnp.asarray(log_lik)
    T, K = log_lik.shape[-2], log_lik.shape[-1]
    llT = jnp.moveaxis(log_lik, -2, 0)  # (T, ..., K)

    log_A = jnp.asarray(log_A)
    log_pi = jnp.asarray(log_pi)

    # Forward: alpha_t(k) = loglik_t(k) + lse_j(alpha_{t-1}(j) + log_A[j,k])
    alpha0 = log_pi + llT[0]

    def fwd(alpha_prev, ll_t):
        a = logsumexp(alpha_prev[..., :, None] + log_A, axis=-2)
        alpha_t = ll_t + a
        return alpha_t, alpha_t

    _, alphas_rest = lax.scan(fwd, alpha0, llT[1:])
    alphas = jnp.concatenate([alpha0[None], alphas_rest], axis=0)  # (T, ..., K)

    # Backward: beta_T = 0; beta_t(j) = lse_k(log_A[j,k] + loglik_{t+1}(k) + beta_{t+1}(k))
    betaT = jnp.zeros_like(alpha0)

    def bwd(beta_next, ll_next):
        b = logsumexp(
            log_A + (ll_next + beta_next)[..., None, :], axis=-1
        )
        return b, b

    _, betas_rev = lax.scan(bwd, betaT, llT[1:][::-1])
    betas = jnp.concatenate([betas_rev[::-1], betaT[None]], axis=0)

    log_Z = logsumexp(alphas[-1], axis=-1)

    log_gamma = alphas + betas - log_Z[None, ..., None]

    # Pairwise: xi_t(j,k) ∝ alpha_t(j) + log_A[j,k] + loglik_{t+1}(k) + beta_{t+1}(k)
    log_xi = (
        alphas[:-1][..., :, None]
        + log_A
        + (llT[1:] + betas[1:])[..., None, :]
        - log_Z[None, ..., None, None]
    )  # (T-1, ..., K, K)
    log_xi_sum = logsumexp(log_xi, axis=0)

    return HMMPosterior(
        jnp.moveaxis(log_gamma, 0, -2), log_xi_sum, log_Z
    )


def hmm_viterbi(log_lik: jax.Array, log_A: jax.Array, log_pi: jax.Array) -> jax.Array:
    """Max-product (MAP path) on the chain — the max-product counterpart of
    the sum-product sweep, shape ``(..., T)`` int32."""
    log_lik = jnp.asarray(log_lik)
    llT = jnp.moveaxis(log_lik, -2, 0)
    delta0 = jnp.asarray(log_pi) + llT[0]
    log_A = jnp.asarray(log_A)

    def fwd(delta_prev, ll_t):
        scores = delta_prev[..., :, None] + log_A  # (..., K, K)
        best = jnp.max(scores, axis=-2)
        arg = jnp.argmax(scores, axis=-2)
        delta_t = ll_t + best
        return delta_t, (delta_t, arg)

    deltaT, (_, args) = lax.scan(fwd, delta0, llT[1:])
    zT = jnp.argmax(deltaT, axis=-1)

    def back(z_next, arg_t):
        z_t = jnp.take_along_axis(arg_t, z_next[..., None], axis=-1)[..., 0]
        return z_t, z_t

    _, zs_rev = lax.scan(back, zT, args[::-1])
    path = jnp.concatenate([zs_rev[::-1], zT[None]], axis=0)
    return jnp.moveaxis(path, 0, -1)
