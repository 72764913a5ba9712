"""Fused Pallas forward-backward for discrete HMM chains.

The log-space scan (:mod:`cortex_tpu.ops.hmm`) is numerically bulletproof but
logsumexp-heavy (VPU transcendentals).  This kernel runs the *scaled*
forward-backward — per-step renormalized probabilities, the classical
Rabiner scaling — entirely in VMEM per replica tile:

- ``alpha_t ∝ (alpha_{t-1} @ A) * lik_t`` and
  ``beta_t ∝ A @ (lik_{t+1} * beta_{t+1})`` are ``(Rt, K) @ (K, K)``
  matmuls → MXU,
- the per-step normalizers accumulate into ``log Z``,
- the forward pass stores its normalized alphas *into the output buffer* and
  the backward pass overwrites them with the marginals in place, so the only
  HBM traffic is the likelihood read and the marginal write.

Equivalent to the log-space path up to float error; falls back to the
interpreter off-TPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "hmm_forward_backward_pallas",
    "hmm_forward_backward_counts_pallas",
    "HMMPallasPosterior",
    "HMMPallasCounts",
]


class HMMPallasPosterior(NamedTuple):
    gamma: jax.Array  # (R, T, K) state marginals
    log_evidence: jax.Array  # (R,)


def _fb_kernel(lik_ref, A_ref, pi_ref, gamma_ref, logz_ref):
    """One replica tile.

    lik_ref: (T, Rt, K) likelihoods; A_ref: (K, K); pi_ref: (1, K);
    gamma_ref: (T, Rt, K) — holds alphas during the forward pass, marginals
    after; logz_ref: (8, Rt) (row-broadcast scalar per replica).
    """
    T = lik_ref.shape[0]

    # -- forward with per-step renormalization -----------------------------
    a0 = pi_ref[0, :][None, :] * lik_ref[0]  # (Rt, K)
    n0 = jnp.sum(a0, axis=-1, keepdims=True)
    a0 = a0 / n0
    gamma_ref[0] = a0
    logz0 = jnp.log(n0[:, 0])  # (Rt,)

    def fwd(t, carry):
        alpha_prev, logz = carry
        pred = jnp.dot(alpha_prev, A_ref[:, :], preferred_element_type=jnp.float32)
        a = pred * lik_ref[t]
        n = jnp.maximum(jnp.sum(a, axis=-1, keepdims=True), 1e-30)
        a = a / n
        gamma_ref[t] = a
        return a, logz + jnp.log(n[:, 0])

    _, logz = lax.fori_loop(1, T, fwd, (a0, logz0))
    logz_ref[:, :] = jnp.broadcast_to(logz[:, None], logz_ref.shape)

    # -- backward, overwriting alphas with marginals in place --------------
    ones = jnp.ones_like(a0)

    def bwd(i, beta_next):
        t = T - 2 - i
        w = lik_ref[t + 1] * beta_next  # (Rt, K)
        b = jnp.dot(w, A_ref[:, :].T, preferred_element_type=jnp.float32)
        b = b / jnp.maximum(jnp.sum(b, axis=-1, keepdims=True), 1e-30)
        g = gamma_ref[t] * b  # gamma_ref[t] still holds alpha_t
        gamma_ref[t] = g / jnp.maximum(jnp.sum(g, axis=-1, keepdims=True), 1e-30)
        return b

    lax.fori_loop(0, T - 1, bwd, ones)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def hmm_forward_backward_pallas(
    lik: jax.Array,
    A: jax.Array,
    pi: jax.Array,
    tile: int = 64,
    interpret: bool | None = None,
) -> HMMPallasPosterior:
    """Scaled forward-backward; ``lik``: ``(R, T, K)`` per-step likelihoods
    (linear space), ``A``: ``(K, K)`` row-stochastic, ``pi``: ``(K,)``.

    VMEM use is ~``4 * T * tile * max(K, 128) * 4`` bytes (the lane dim pads
    to 128) — choose a smaller tile for long chains / many states.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    R, T, K = lik.shape
    pad = (-R) % tile
    if pad:
        lik = jnp.concatenate(
            [lik, jnp.ones((pad, T, K), lik.dtype) / K], axis=0
        )
    Rp = lik.shape[0]
    likT = jnp.moveaxis(lik, 0, 1)  # (T, Rp, K)
    pi2 = pi[None, :].astype(lik.dtype)

    grid = (Rp // tile,)
    lik_spec = pl.BlockSpec((T, tile, K), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    gamma, logz = pl.pallas_call(
        _fb_kernel,
        grid=grid,
        in_specs=[
            lik_spec,
            pl.BlockSpec((K, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            lik_spec,
            pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, Rp, K), lik.dtype),
            jax.ShapeDtypeStruct((Rp, 128), lik.dtype),
        ),
        interpret=interpret,
    )(likT, A.astype(lik.dtype), pi2)
    return HMMPallasPosterior(jnp.moveaxis(gamma, 0, 1)[:R], logz[:R, 0])


class HMMPallasCounts(NamedTuple):
    gamma: jax.Array  # (R, T, K)
    xi_sum: jax.Array  # (R, K, K) summed pairwise marginals
    log_evidence: jax.Array  # (R,)


def _fb_alpha_kernel(lik_ref, A_ref, pi_ref, gamma_ref, alpha_ref, logz_ref):
    """As :func:`_fb_kernel`, additionally writing the scaled forward
    messages (alphas) to their own output so pairwise statistics can be
    assembled outside the kernel (Mosaic lowers 2D ops only; the K x K outer
    products run as one XLA einsum afterwards)."""
    T = lik_ref.shape[0]

    a0 = pi_ref[0, :][None, :] * lik_ref[0]
    n0 = jnp.maximum(jnp.sum(a0, axis=-1, keepdims=True), 1e-30)
    a0 = a0 / n0
    gamma_ref[0] = a0
    alpha_ref[0] = a0
    logz0 = jnp.log(n0[:, 0])

    def fwd(t, carry):
        alpha_prev, logz = carry
        pred = jnp.dot(alpha_prev, A_ref[:, :], preferred_element_type=jnp.float32)
        a = pred * lik_ref[t]
        n = jnp.maximum(jnp.sum(a, axis=-1, keepdims=True), 1e-30)
        a = a / n
        gamma_ref[t] = a
        alpha_ref[t] = a
        return a, logz + jnp.log(n[:, 0])

    _, logz = lax.fori_loop(1, T, fwd, (a0, logz0))
    logz_ref[:, :] = jnp.broadcast_to(logz[:, None], logz_ref.shape)

    ones = jnp.ones_like(a0)

    def bwd(i, beta_next):
        t = T - 2 - i
        w = lik_ref[t + 1] * beta_next
        b = jnp.dot(w, A_ref[:, :].T, preferred_element_type=jnp.float32)
        b = b / jnp.maximum(jnp.sum(b, axis=-1, keepdims=True), 1e-30)
        g = gamma_ref[t] * b
        gamma_ref[t] = g / jnp.maximum(jnp.sum(g, axis=-1, keepdims=True), 1e-30)
        return b

    lax.fori_loop(0, T - 1, bwd, ones)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def hmm_forward_backward_counts_pallas(
    lik: jax.Array,
    A: jax.Array,
    pi: jax.Array,
    tile: int = 32,
    interpret: bool | None = None,
) -> HMMPallasCounts:
    """Scaled forward-backward emitting state marginals AND summed pairwise
    expected counts — the complete E-step of Dirichlet VMP.

    The sweep runs in the fused kernel (gammas + alphas + logZ); the pairwise
    sum ``xi_sum[r] = A \u2299 \u03a3_t (\u03b1\u0302_t/N_t) \u2297 w\u0302_t`` assembles as one batched
    einsum on the MXU.  ``xi_sum``: (R, K, K).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    R, T, K = lik.shape
    pad = (-R) % tile
    if pad:
        lik = jnp.concatenate(
            [lik, jnp.ones((pad, T, K), lik.dtype) / K], axis=0
        )
    Rp = lik.shape[0]
    likT = jnp.moveaxis(lik, 0, 1)
    pi2 = pi[None, :].astype(lik.dtype)

    grid = (Rp // tile,)
    lik_spec = pl.BlockSpec((T, tile, K), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    gamma, alpha, logz = pl.pallas_call(
        _fb_alpha_kernel,
        grid=grid,
        in_specs=[
            lik_spec,
            pl.BlockSpec((K, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            lik_spec,
            lik_spec,
            pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, Rp, K), lik.dtype),
            jax.ShapeDtypeStruct((T, Rp, K), lik.dtype),
            jax.ShapeDtypeStruct((Rp, 128), lik.dtype),
        ),
        interpret=interpret,
    )(likT, A.astype(lik.dtype), pi2)

    # Pairwise stats in XLA: beta ~ gamma/alpha (scale cancels in N_t).
    eps = jnp.asarray(1e-30, lik.dtype)
    beta = gamma / (alpha + eps)  # (T, Rp, K), unnormalized
    w = likT[1:] * beta[1:]  # (T-1, Rp, K)
    a_prev = alpha[:-1]
    A_ = A.astype(lik.dtype)
    # Two bounded contractions (a single 3-operand einsum can materialize a
    # (T, R, K, K) intermediate at scale).
    pred = jnp.einsum("trj,jk->trk", a_prev, A_)
    N = jnp.sum(pred * w, axis=-1) + eps
    S = jnp.einsum("trj,trk->rjk", a_prev / N[..., None], w)
    xi_sum = A_[None, :, :] * S
    return HMMPallasCounts(
        jnp.moveaxis(gamma, 0, 1)[:R], xi_sum[:R], logz[:R, 0]
    )
