"""Loopy Gaussian belief propagation on arbitrary pairwise MRFs.

The reference's BP resolver wires message dependencies for *any* bipartite
factor graph, including cyclic ones — its engine just keeps sweeping until
quiescence (`/root/reference/src/dependencies.jl:17-126`,
`src/inference_engine.jl:575-607`; cyclic signal graphs are exercised in
`test/signal_tests.jl:467-507`).  This module is the TPU-native execution of
that loop for the Gaussian case: **synchronous (Jacobi) GaBP** where every
directed edge's message updates at once per iteration —

    gather (reverse messages) → elementwise update → segment-sum scatter

over packed edge arrays, `lax.scan` over iterations, replicas broadcast on
leading axes.  For walk-summable models the fixed-point means are the exact
posterior means (Weiss & Freeman 2001); variances are the standard GaBP
approximation (exact on trees).

Model, information form:  p(x) ∝ exp(−½ xᵀΛx + ηᵀx)  with sparse Λ given as
node diagonals ``lam_diag`` and undirected edges ``(edges, lam_off)``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["GaBPResult", "gabp_solve", "grid_edges"]


class GaBPResult(NamedTuple):
    """Marginal beliefs: ``mean`` shaped like ``eta`` (``(..., n)``);
    ``variance`` shaped ``(n,)`` (precisions depend only on the shared graph,
    not on the per-replica ``eta``); ``delta`` — the max message change at
    the last iteration (convergence diagnostic)."""

    mean: jax.Array
    variance: jax.Array
    delta: jax.Array


def grid_edges(h: int, w: int) -> np.ndarray:
    """Undirected 4-neighbor grid edge list, shape ``(E, 2)`` — the standard
    loopy-BP benchmark topology (image denoising / smoothing)."""
    idx = np.arange(h * w).reshape(h, w)
    right = np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], axis=1)
    down = np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], axis=1)
    return np.concatenate([right, down], axis=0)


def gabp_solve(
    lam_diag: jax.Array,
    eta: jax.Array,
    edges: jax.Array,
    lam_off: jax.Array,
    n_iters: int = 50,
    damping: float = 0.7,
) -> GaBPResult:
    """Run synchronous damped GaBP; returns marginal means/variances.

    ``lam_diag``: ``(n,)`` node precisions (Λ_ii); ``eta``: ``(..., n)``
    information vector (leading axes are independent replicas sharing the
    graph); ``edges``: ``(E, 2)`` undirected vertex pairs; ``lam_off``:
    ``(E,)`` off-diagonal couplings Λ_ij.  Requires Λ_ii > 0; convergence is
    guaranteed for walk-summable (e.g. diagonally dominant) models.
    """
    lam_diag = jnp.asarray(lam_diag)
    eta = jnp.asarray(eta)
    edges = jnp.asarray(edges)
    lam_off = jnp.asarray(lam_off)
    n = lam_diag.shape[-1]
    E = edges.shape[0]

    # Directed edge arrays: edge e < E is u→v, edge e+E is v→u; the reverse
    # of directed edge d is (d + E) mod 2E.
    src = jnp.concatenate([edges[:, 0], edges[:, 1]])
    dst = jnp.concatenate([edges[:, 1], edges[:, 0]])
    lam_e = jnp.concatenate([lam_off, lam_off])
    batch_shape = eta.shape[:-1]

    def reverse(m):
        return jnp.roll(m, E, axis=-1)

    def step(state, _):
        m_lam, m_eta = state  # (2E,), (..., 2E)
        # Node aggregates of inbound messages.
        agg_lam = jnp.zeros((n,), lam_diag.dtype).at[dst].add(m_lam)
        agg_eta = (
            jnp.zeros(batch_shape + (n,), eta.dtype).at[..., dst].add(m_eta)
        )
        # Cavity at the source of each directed edge: all inbound except the
        # reverse message.
        cav_lam = lam_diag[src] + agg_lam[src] - reverse(m_lam)
        cav_eta = eta[..., src] + agg_eta[..., src] - reverse(m_eta)
        new_lam = -(lam_e**2) / cav_lam
        new_eta = -lam_e * cav_eta / cav_lam
        m_lam_next = (1.0 - damping) * m_lam + damping * new_lam
        m_eta_next = (1.0 - damping) * m_eta + damping * new_eta
        delta = jnp.maximum(
            jnp.max(jnp.abs(m_lam_next - m_lam)),
            jnp.max(jnp.abs(m_eta_next - m_eta)),
        )
        return (m_lam_next, m_eta_next), delta

    init = (
        jnp.zeros((2 * E,), lam_diag.dtype),
        jnp.zeros(batch_shape + (2 * E,), eta.dtype),
    )
    (m_lam, m_eta), deltas = lax.scan(step, init, None, length=n_iters)

    post_lam = lam_diag + jnp.zeros((n,), lam_diag.dtype).at[dst].add(m_lam)
    post_eta = eta + jnp.zeros(batch_shape + (n,), eta.dtype).at[..., dst].add(m_eta)
    return GaBPResult(post_eta / post_lam, 1.0 / post_lam, deltas[-1])
