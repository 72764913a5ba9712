"""Fused Pallas forward-backward for discrete HMM chains.

The log-space scan (:mod:`cortex_tpu.ops.hmm`) is numerically bulletproof but
logsumexp-heavy (VPU transcendentals).  This kernel runs the *scaled*
forward-backward — per-step renormalized probabilities, the classical
Rabiner scaling — entirely in VMEM per replica tile.

Layout: **replicas ride the 128-wide lane dimension, states the sublanes**.
Blocks are ``(T, K, tile)``, so a timestep slice is a ``(K, tile)`` register
tile and the recursions are ``(K, K) @ (K, tile)`` matmuls — full lanes at
any state count.  (The first version put states on lanes — ``(tile, K)``
slices with K=4 lanes of a 128-lane vector unit — which both wasted 97% of
the VPU and crashed the remote TPU worker at production sizes, a Mosaic
masked-store fault this layout avoids.)

- ``alpha_t ∝ Aᵀ @ alpha_{t-1} * lik_t`` and
  ``beta_t ∝ A @ (lik_{t+1} * beta_{t+1})``,
- the per-step normalizers accumulate into ``log Z``,
- the forward pass stores its normalized alphas *into the output buffer* and
  the backward pass overwrites them with the marginals in place, so the only
  HBM traffic is the likelihood read and the marginal write.

Equivalent to the log-space path up to float error; falls back to the
interpreter off-TPU.  Precision note (measured on v5e): the scaled
recursion leans on the VPU's approximate reciprocal/exp, landing ~3e-3
relative on gammas/counts vs the log-space scan (exact to 1e-6 in
interpret mode) — immaterial for VMP expected counts, but use the
log-space ``method="scan"`` when per-step posteriors must be tight.
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


def _fwd_bwd(lik_ref, At_ref, A_ref, pi_ref, gamma_ref, logz_ref, alpha_ref):
    """Shared sweep body on the (T, K, tile) layout.

    lik_ref: (T, K, Rt); At_ref/A_ref: (K, K) (Aᵀ and A); pi_ref: (K, 1);
    gamma_ref: (T, K, Rt) — alphas during the forward pass, marginals after;
    logz_ref: (8, Rt) (row-broadcast per replica); alpha_ref: (T, K, Rt)
    or None (when pairwise stats are not needed).
    """
    T = lik_ref.shape[0]

    # -- forward with per-step renormalization -----------------------------
    a0 = pi_ref[:, :] * lik_ref[0]  # (K, Rt)
    n0 = jnp.maximum(jnp.sum(a0, axis=0, keepdims=True), 1e-30)  # (1, Rt)
    a0 = a0 / n0
    gamma_ref[0] = a0
    if alpha_ref is not None:
        alpha_ref[0] = a0
    logz0 = jnp.log(n0)  # (1, Rt)

    def fwd(t, carry):
        alpha_prev, logz = carry
        pred = jnp.dot(
            At_ref[:, :], alpha_prev, preferred_element_type=jnp.float32
        )  # (K, Rt)
        a = pred * lik_ref[t]
        n = jnp.maximum(jnp.sum(a, axis=0, keepdims=True), 1e-30)
        a = a / n
        gamma_ref[t] = a
        if alpha_ref is not None:
            alpha_ref[t] = a
        return a, logz + jnp.log(n)

    _, logz = lax.fori_loop(1, T, fwd, (a0, logz0))
    logz_ref[:, :] = jnp.broadcast_to(logz, logz_ref.shape)

    # -- backward, overwriting alphas with marginals in place --------------
    ones = jnp.ones_like(a0)

    def bwd(i, beta_next):
        t = T - 2 - i
        w = lik_ref[t + 1] * beta_next  # (K, Rt)
        b = jnp.dot(A_ref[:, :], w, preferred_element_type=jnp.float32)
        b = b / jnp.maximum(jnp.sum(b, axis=0, keepdims=True), 1e-30)
        g = gamma_ref[t] * b  # gamma_ref[t] still holds alpha_t
        gamma_ref[t] = g / jnp.maximum(
            jnp.sum(g, axis=0, keepdims=True), 1e-30
        )
        return b

    lax.fori_loop(0, T - 1, bwd, ones)


def _fb_kernel(lik_ref, At_ref, A_ref, pi_ref, gamma_ref, logz_ref):
    _fwd_bwd(lik_ref, At_ref, A_ref, pi_ref, gamma_ref, logz_ref, None)


def _fb_alpha_kernel(
    lik_ref, At_ref, A_ref, pi_ref, gamma_ref, alpha_ref, logz_ref
):
    """As :func:`_fb_kernel`, additionally writing the scaled forward
    messages (alphas) to their own output so pairwise statistics can be
    assembled outside the kernel (the K × K outer products run as one XLA
    einsum afterwards)."""
    _fwd_bwd(lik_ref, At_ref, A_ref, pi_ref, gamma_ref, logz_ref, alpha_ref)


def _auto_tile(R, T, K, itemsize, nbuf):
    """Largest 128-multiple replica tile whose ``nbuf`` (T, K, tile) VMEM
    buffers fit a conservative 12 MB budget — fewer grid steps means fewer
    latency-bound kernel launches (measured on v5e at (4096, 64, 4):
    tile 256 → 505 µs/iter, 4096 → 264 µs/iter vs 333 µs for the log-space
    scan)."""
    budget = 12 * 1024 * 1024
    tile = budget // (nbuf * T * K * itemsize)
    tile = max(128, (tile // 128) * 128)
    return min(tile, max(128, (-(-R // 128)) * 128))


def _prep(lik, A, pi, tile):
    """Pad replicas to the tile, relayout to (T, K, Rp), build specs."""
    R, T, K = lik.shape
    pad = (-R) % tile
    if pad:
        lik = jnp.concatenate(
            [lik, jnp.ones((pad, T, K), lik.dtype) / K], axis=0
        )
    Rp = lik.shape[0]
    likT = jnp.transpose(lik, (1, 2, 0))  # (T, K, Rp): replicas on lanes
    A_ = A.astype(lik.dtype)
    pi2 = pi[:, None].astype(lik.dtype)  # (K, 1)

    lik_spec = pl.BlockSpec(
        (T, K, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    kk_spec = pl.BlockSpec((K, K), lambda i: (0, 0), memory_space=pltpu.VMEM)
    pi_spec = pl.BlockSpec((K, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    logz_spec = pl.BlockSpec(
        (8, tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    return likT, A_, pi2, Rp, lik_spec, kk_spec, pi_spec, logz_spec


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def hmm_forward_backward_pallas(
    lik: jax.Array,
    A: jax.Array,
    pi: jax.Array,
    tile: int | None = None,
    interpret: bool | None = None,
) -> HMMPallasPosterior:
    """Scaled forward-backward; ``lik``: ``(R, T, K)`` per-step likelihoods
    (linear space), ``A``: ``(K, K)`` row-stochastic, ``pi``: ``(K,)``.

    VMEM use is ~``2 * T * K * tile * 4`` bytes per grid step — choose a
    smaller tile for long chains / many states.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    R, T, K = lik.shape
    if tile is None:
        tile = _auto_tile(R, T, K, jnp.dtype(lik.dtype).itemsize, nbuf=2)
    likT, A_, pi2, Rp, lik_spec, kk_spec, pi_spec, logz_spec = _prep(
        lik, A, pi, tile
    )
    gamma, logz = pl.pallas_call(
        _fb_kernel,
        grid=(Rp // tile,),
        in_specs=[lik_spec, kk_spec, kk_spec, pi_spec],
        out_specs=(lik_spec, logz_spec),
        out_shape=(
            jax.ShapeDtypeStruct((T, K, Rp), lik.dtype),
            jax.ShapeDtypeStruct((8, Rp), lik.dtype),
        ),
        interpret=interpret,
    )(likT, A_.T, A_, pi2)
    return HMMPallasPosterior(
        jnp.transpose(gamma, (2, 0, 1))[:R], logz[0, :R]
    )


class HMMPallasCounts(NamedTuple):
    gamma: jax.Array  # (R, T, K)
    xi_sum: jax.Array  # (R, K, K) summed pairwise marginals
    log_evidence: jax.Array  # (R,)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def hmm_forward_backward_counts_pallas(
    lik: jax.Array,
    A: jax.Array,
    pi: jax.Array,
    tile: int | None = None,
    interpret: bool | None = None,
) -> HMMPallasCounts:
    """Scaled forward-backward emitting state marginals AND summed pairwise
    expected counts — the complete E-step of Dirichlet VMP.

    The sweep runs in the fused kernel (gammas + alphas + logZ); the pairwise
    sum ``xi_sum[r] = A ⊙ Σ_t (α̂_t/N_t) ⊗ ŵ_t`` assembles as one batched
    einsum on the MXU.  ``xi_sum``: (R, K, K).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    R, T, K = lik.shape
    if tile is None:
        tile = _auto_tile(R, T, K, jnp.dtype(lik.dtype).itemsize, nbuf=3)
    likT, A_, pi2, Rp, lik_spec, kk_spec, pi_spec, logz_spec = _prep(
        lik, A, pi, tile
    )
    gamma, alpha, logz = pl.pallas_call(
        _fb_alpha_kernel,
        grid=(Rp // tile,),
        in_specs=[lik_spec, kk_spec, kk_spec, pi_spec],
        out_specs=(lik_spec, lik_spec, logz_spec),
        out_shape=(
            jax.ShapeDtypeStruct((T, K, Rp), lik.dtype),
            jax.ShapeDtypeStruct((T, K, Rp), lik.dtype),
            jax.ShapeDtypeStruct((8, Rp), lik.dtype),
        ),
        interpret=interpret,
    )(likT, A_.T, A_, pi2)

    # Pairwise stats in XLA: beta ~ gamma/alpha (scale cancels in N_t).
    eps = jnp.asarray(1e-30, lik.dtype)
    beta = gamma / (alpha + eps)  # (T, K, Rp), unnormalized
    w = likT[1:] * beta[1:]  # (T-1, K, Rp)
    a_prev = alpha[:-1]
    # Two bounded contractions (a single 3-operand einsum can materialize a
    # (T, R, K, K) intermediate at scale).
    pred = jnp.einsum("tjr,jk->tkr", a_prev, A_)
    N = jnp.sum(pred * w, axis=1) + eps  # (T-1, Rp)
    S = jnp.einsum("tjr,tkr->rjk", a_prev / N[:, None, :], w)
    xi_sum = A_[None, :, :] * S
    return HMMPallasCounts(
        jnp.transpose(gamma, (2, 0, 1))[:R], xi_sum[:R], logz[0, :R]
    )
