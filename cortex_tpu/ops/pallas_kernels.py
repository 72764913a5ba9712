"""Pallas TPU kernels for the hot message-passing sweeps.

:func:`lgssm_smooth_pallas` fuses the complete scalar-LGSSM BP sweep —
forward messages, backward messages, and marginals — into ONE kernel: each
grid step loads a ``(T, R_tile)`` block of observations into VMEM, runs both
time recursions with the carry and the forward-message buffer resident in
VMEM, and writes only the final marginal means/variances back to HBM.  No
intermediate HBM traffic (the ``lax.scan`` path materializes the stacked
forward messages between the two scans), so the sweep runs at the
input/output bandwidth floor.

Falls back to interpreter mode off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .chains import ChainMarginals

__all__ = ["lgssm_smooth_pallas"]


def _smooth_kernel(y_ref, mean_ref, var_ref, yt_ref, xi_f_ref, w_f_ref,
                   mean_t_ref, var_t_ref, *, A, Q, H, R):
    """One replica tile on the NATURAL layout: y_ref/mean_ref/var_ref are
    (Rt, T) VMEM blocks.  The time recursion wants timesteps on sublanes, so
    the tile is relayouted once in VMEM ((Rt,T)->(T,Rt), and back for the
    outputs) — a register/VMEM shuffle instead of the three HBM round-trip
    transposes the previous (T,R)-convention kernel paid outside the kernel
    (24MB extra HBM traffic per 10k-replica sweep; the reason it lost to the
    two-scan path at 100k replicas in BENCH_r01)."""
    yt_ref[...] = y_ref[...].T
    _smooth_time_major(yt_ref, mean_t_ref, var_t_ref, xi_f_ref, w_f_ref,
                       A=A, Q=Q, H=H, R=R)
    mean_ref[...] = mean_t_ref[...].T
    var_ref[...] = var_t_ref[...].T


def _smooth_time_major(y_ref, mean_ref, var_ref, xi_f_ref, w_f_ref,
                       *, A, Q, H, R):
    """Recursion core: y_ref/(outputs) are (T, Rt) VMEM blocks/scratch."""
    T = y_ref.shape[0]
    w_obs = (H * H) / R

    def xi_obs(t):
        return H * y_ref[pl.ds(t, 1), :] / R  # (1, Rt)

    # -- forward pass: store forward messages, carry the filtered belief ----
    zero_row = jnp.zeros_like(y_ref[pl.ds(0, 1), :])
    xi_f_ref[pl.ds(0, 1), :] = zero_row
    w_f_ref[pl.ds(0, 1), :] = zero_row

    def fwd(t, carry):
        xi_c, w_c = carry  # filtered belief of x_{t-1}
        m = xi_c / w_c
        v = 1.0 / w_c
        v_msg = A * A * v + Q
        w_msg = 1.0 / v_msg
        xi_msg = A * m * w_msg
        xi_f_ref[pl.ds(t, 1), :] = xi_msg
        w_f_ref[pl.ds(t, 1), :] = w_msg
        return (xi_msg + xi_obs(t), w_msg + w_obs)

    carry0 = (xi_obs(0), jnp.full_like(zero_row, w_obs))
    lax.fori_loop(1, T, fwd, carry0)

    # -- backward pass: emit marginals on the fly ---------------------------
    xi_mT = xi_obs(T - 1) + xi_f_ref[pl.ds(T - 1, 1), :]
    w_mT = w_obs + w_f_ref[pl.ds(T - 1, 1), :]
    mean_ref[pl.ds(T - 1, 1), :] = xi_mT / w_mT
    var_ref[pl.ds(T - 1, 1), :] = 1.0 / w_mT

    def bwd(i, carry):
        t = T - 2 - i
        xi_b, w_b = carry  # right-belief at x_{t+1} (obs + bwd message)
        m = xi_b / w_b
        v = 1.0 / w_b
        v_msg = (v + Q) / (A * A)
        w_msg = 1.0 / v_msg
        xi_msg = (m / A) * w_msg
        xi_m = xi_obs(t) + xi_f_ref[pl.ds(t, 1), :] + xi_msg
        w_m = w_obs + w_f_ref[pl.ds(t, 1), :] + w_msg
        mean_ref[pl.ds(t, 1), :] = xi_m / w_m
        var_ref[pl.ds(t, 1), :] = 1.0 / w_m
        return (xi_obs(t) + xi_msg, w_obs + w_msg)

    carryT = (xi_obs(T - 1), jnp.full_like(zero_row, w_obs))
    lax.fori_loop(0, T - 1, bwd, carryT)


@functools.partial(jax.jit, static_argnames=("A", "Q", "H", "R", "tile", "interpret"))
def lgssm_smooth_pallas(
    y: jax.Array,
    A: float = 1.0,
    Q: float = 1.0,
    H: float = 1.0,
    R: float = 1.0,
    tile: int = 2048,
    interpret: bool | None = None,
) -> ChainMarginals:
    """Fused BP smoothing sweep; ``y``: ``(n_replicas, T)`` float32.

    Identical marginals to :func:`~cortex_tpu.ops.chains.lgssm_smooth_scan`
    (no-prior convention).  Replicas are tiled over the grid; ``T`` stays
    resident per tile.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    n, T = y.shape
    # VMEM budget guard: the kernel holds 8 T×tile f32 buffers per grid step
    # (3 in/out blocks + 5 scratch).  Auto-halve the tile until the footprint
    # fits a conservative 12 MB VMEM budget (chip VMEM is 16 MB), so large T
    # can't compile to a VMEM OOM (ADVICE r2 medium item).
    vmem_budget = 12 * 1024 * 1024
    # Lane alignment: replica tiles must be multiples of the 128-wide lane
    # dimension (Mosaic rejects e.g. tile=625); round down before shrinking.
    tile = max(128, (tile // 128) * 128)
    while tile > 128 and 8 * T * tile * jnp.dtype(y.dtype).itemsize > vmem_budget:
        # Halve but stay on the 128-lane grid (384 -> 192 would violate it).
        tile = max(128, (tile // 2) // 128 * 128)
    pad = (-n) % tile
    if pad:
        y = jnp.concatenate([y, jnp.ones((pad, T), y.dtype)], axis=0)
    n_padded = y.shape[0]

    kernel = functools.partial(_smooth_kernel, A=A, Q=Q, H=H, R=R)
    grid = (n_padded // tile,)
    block = pl.BlockSpec((tile, T), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mean, var = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[block],
        out_specs=(block, block),
        out_shape=(
            jax.ShapeDtypeStruct((n_padded, T), y.dtype),
            jax.ShapeDtypeStruct((n_padded, T), y.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((T, tile), y.dtype),  # y relayout (time-major)
            pltpu.VMEM((T, tile), y.dtype),  # forward-message xi
            pltpu.VMEM((T, tile), y.dtype),  # forward-message w
            pltpu.VMEM((T, tile), y.dtype),  # marginal mean (time-major)
            pltpu.VMEM((T, tile), y.dtype),  # marginal var (time-major)
        ],
        interpret=interpret,
    )(y)
    return ChainMarginals(mean[:n], var[:n])
