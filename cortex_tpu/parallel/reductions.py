"""Explicit mesh collectives for inference reductions.

Most reductions (free-energy sums, convergence predicates) fall out of plain
``jnp.sum`` under ``jit`` with sharded inputs — XLA inserts the collectives.
These helpers make the collective explicit via ``shard_map`` + ``psum`` for
cases where the surrounding computation is itself shard_mapped, and provide
the convergence all-reduce used by distributed VMP loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["global_sum", "all_converged"]


def global_sum(x: jax.Array, mesh: Mesh, axis: str = "replica") -> jax.Array:
    """Sum a per-replica quantity (leading axis sharded over ``axis``) across
    the whole mesh: local sum + ``psum`` over the axis.  Returns a replicated
    scalar (or ``x.shape[1:]``-shaped array)."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(),
    )
    def _sum(block):
        return lax.psum(jnp.sum(block, axis=0), axis)

    return _sum(x)


def all_converged(
    delta: jax.Array, tol: float, mesh: Mesh, axis: str = "replica"
) -> jax.Array:
    """True iff every replica's convergence measure is below ``tol`` —
    a global AND implemented as a psum of violations over the mesh."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(),
    )
    def _check(block):
        # ~(x <= tol) so NaN counts as a violation (NaN > tol is False).
        violations = jnp.sum(jnp.logical_not(block <= tol).astype(jnp.int32))
        return lax.psum(violations, axis)

    return _check(delta) == 0
