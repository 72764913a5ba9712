"""Fused Pallas kernel for streaming HGF filtering.

The HGF update (models/hgf.py::HGF.step, Mathys et al. 2011) is purely
elementwise per replica, so ``lax.scan`` over T leaves the chip
launch-latency-bound: T tiny VPU steps each touching (R,) rows in HBM
(measured 6.1 ms per (65536, 256) sweep — 8% of HBM peak).  This kernel
runs the whole trajectory per replica tile inside VMEM: one grid step
loads a ``(tile, T)`` observation block, relayouts it time-major, runs the
T-step recursion with the state resident in registers, and writes the
five trajectory tracks back — HBM traffic is exactly the input read plus
the trajectory write.

Same guard semantics as the model (clipped log-volatility, floored level-2
precision, capped level-2 step).  Falls back to interpreter mode off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["hgf_filter_pallas"]


def _hgf_kernel(
    u_ref,
    mu1_ref,
    pi1_ref,
    mu2_ref,
    pi2_ref,
    pe_ref,
    ut_ref,
    t_mu1,
    t_pi1,
    t_mu2,
    t_pi2,
    t_pe,
    *,
    kappa,
    omega,
    theta,
    pi_u,
    max_log_nu,
    min_pi2,
    max_mu2_step,
):
    """One replica tile: natural (tile, T) in/out, time-major scratch."""
    T = ut_ref.shape[0]
    ut_ref[...] = u_ref[...].T

    # Derive the initial carry from loaded data so Mosaic materializes it:
    # a replicated-constant carry layout cannot be reconciled with the
    # loop body's materialized outputs (observed "Invalid relayout" fault).
    row0 = ut_ref[pl.ds(0, 1), :] * 0.0
    ones = row0 + 1.0

    def step(t, carry):
        mu1, pi1, mu2, pi2 = carry
        u = ut_ref[pl.ds(t, 1), :]
        log_nu = jnp.clip(kappa * mu2 + omega, -max_log_nu, max_log_nu)
        nu = jnp.exp(log_nu)
        pihat1 = 1.0 / (1.0 / pi1 + nu)
        pi1_new = pihat1 + pi_u
        mu1_new = mu1 + (pi_u / pi1_new) * (u - mu1)
        delta1 = (1.0 / pi1_new + (mu1_new - mu1) ** 2) * pihat1 - 1.0
        pihat2 = 1.0 / (1.0 / pi2 + theta)
        w1 = nu * pihat1
        pi2_new = pihat2 + 0.5 * kappa**2 * w1 * (
            w1 + (2.0 * w1 - 1.0) * delta1
        )
        pi2_new = jnp.maximum(pi2_new, min_pi2)
        mu2_step = jnp.clip(
            0.5 * kappa * (w1 / pi2_new) * delta1,
            -max_mu2_step,
            max_mu2_step,
        )
        mu2_new = mu2 + mu2_step
        t_mu1[pl.ds(t, 1), :] = mu1_new
        t_pi1[pl.ds(t, 1), :] = pi1_new
        t_mu2[pl.ds(t, 1), :] = mu2_new
        t_pi2[pl.ds(t, 1), :] = pi2_new
        t_pe[pl.ds(t, 1), :] = delta1
        return mu1_new, pi1_new, mu2_new, pi2_new

    lax.fori_loop(0, T, step, (row0, ones, row0, ones))
    mu1_ref[...] = t_mu1[...].T
    pi1_ref[...] = t_pi1[...].T
    mu2_ref[...] = t_mu2[...].T
    pi2_ref[...] = t_pi2[...].T
    pe_ref[...] = t_pe[...].T


@functools.partial(
    jax.jit,
    static_argnames=(
        "kappa",
        "omega",
        "theta",
        "pi_u",
        "max_log_nu",
        "min_pi2",
        "max_mu2_step",
        "tile",
        "interpret",
    ),
)
def hgf_filter_pallas(
    u: jax.Array,
    kappa: float = 1.0,
    omega: float = -2.0,
    theta: float = 0.05,
    pi_u: float = 10.0,
    max_log_nu: float = 20.0,
    min_pi2: float = 1e-2,
    max_mu2_step: float = 5.0,
    tile: int | None = None,
    interpret: bool | None = None,
):
    """Filter ``u`` of shape ``(R, T)`` (zero-initialized state); returns
    the five trajectory tracks ``(mu1, pi1, mu2, pi2, delta1)``, each
    ``(R, T)`` — identical to ``HGF.filter``'s trajectory.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    n, T = u.shape
    if tile is None:
        # 12 buffers of (T, tile) f32 live per grid step (1 in + 5 out +
        # 6 scratch); budget 12 MB of VMEM.
        budget = 12 * 1024 * 1024
        tile = max(128, (budget // (12 * T * 4) // 128) * 128)
    tile = max(128, (tile // 128) * 128)
    pad = (-n) % tile
    if pad:
        u = jnp.concatenate([u, jnp.zeros((pad, T), u.dtype)], axis=0)
    n_padded = u.shape[0]

    kernel = functools.partial(
        _hgf_kernel,
        kappa=kappa,
        omega=omega,
        theta=theta,
        pi_u=pi_u,
        max_log_nu=max_log_nu,
        min_pi2=min_pi2,
        max_mu2_step=max_mu2_step,
    )
    block = pl.BlockSpec((tile, T), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(n_padded // tile,),
        in_specs=[block],
        out_specs=(block,) * 5,
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_padded, T), u.dtype) for _ in range(5)
        ),
        scratch_shapes=[pltpu.VMEM((T, tile), u.dtype) for _ in range(6)],
        interpret=interpret,
    )(u)
    return tuple(o[:n] for o in outs)
