"""Failure detection for iterative inference.

The reference has no failure detection (SURVEY.md §5).  For production
inference loops this module provides:

- :func:`check_finite` — validate a pytree for NaN/Inf, raising
  :class:`DivergenceError` naming the offending leaves,
- :class:`ConvergenceMonitor` — track a free-energy/ELBO series per replica:
  detects divergence (NaN or sustained increase of free energy) and
  convergence (relative change below tolerance), vectorized across replicas
  so a single call covers a whole sharded batch.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DivergenceError", "check_finite", "ConvergenceMonitor", "rhat", "ess"]


class DivergenceError(RuntimeError):
    """Raised when inference state becomes non-finite or diverges."""


def check_finite(tree: Any, where: str = "state") -> None:
    """Raise :class:`DivergenceError` if any leaf contains NaN/Inf."""
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    bad: List[str] = []
    for path, leaf in leaves_with_paths:
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            n_bad = int((~np.isfinite(arr)).sum())
            bad.append(f"{jax.tree_util.keystr(path)} ({n_bad} non-finite)")
    if bad:
        raise DivergenceError(
            f"Non-finite values in {where}: " + ", ".join(bad[:5])
        )


class ConvergenceMonitor:
    """Track per-replica free energy across iterations.

    ``update(fe)`` with ``fe`` of shape ``(...,)`` (one value per replica)
    returns a boolean array: True where converged.  ``diverged`` flags
    replicas whose free energy is NaN or increased for ``patience``
    consecutive updates (VB free energy must be non-increasing; an increase
    signals a broken update or numerical failure).
    """

    def __init__(self, rtol: float = 1e-6, atol: float = 1e-9, patience: int = 3):
        self.rtol = rtol
        self.atol = atol
        self.patience = patience
        self._last: Optional[np.ndarray] = None
        self._rise_count: Optional[np.ndarray] = None
        self.history: List[np.ndarray] = []

    def update(self, fe) -> np.ndarray:
        fe = np.asarray(fe, dtype=np.float64)
        self.history.append(fe)
        if self._last is None:
            self._last = fe
            self._rise_count = np.zeros(fe.shape, dtype=np.int64)
            return np.zeros(fe.shape, dtype=bool)
        delta = fe - self._last
        rising = delta > self.atol
        self._rise_count = np.where(rising, self._rise_count + 1, 0)
        converged = np.abs(delta) <= self.atol + self.rtol * np.abs(self._last)
        self._last = fe
        return converged

    @property
    def diverged(self) -> np.ndarray:
        if self._last is None:
            raise RuntimeError("No updates recorded")
        return ~np.isfinite(self._last) | (self._rise_count >= self.patience)

    def raise_if_diverged(self, where: str = "inference") -> None:
        d = self.diverged
        if d.any():
            raise DivergenceError(
                f"{int(d.sum())} replica(s) diverged during {where} "
                f"(free energy rising {self.patience}+ iterations or non-finite)"
            )


def rhat(chains: "jax.Array") -> "jax.Array":
    """Split-R̂ convergence diagnostic (Gelman–Rubin, rank-free variant).

    ``chains``: ``(M, N, ...)`` — M chains of N draws of arbitrary-shaped
    quantities; returns R̂ per quantity, shape ``(...)``.  Values near 1
    indicate the chains agree; > 1.01 is the conventional warning level.
    Each chain is split in half (catching within-chain drift), then
    R̂² = (W·(n−1)/n + B/n) / W with B/W the between/within variances.
    """
    import jax.numpy as jnp

    x = jnp.asarray(chains)
    m, n = x.shape[0], x.shape[1]
    half = n // 2
    x = jnp.concatenate([x[:, :half], x[:, half : 2 * half]], axis=0)  # (2M, half)
    chain_means = jnp.mean(x, axis=1)
    chain_vars = jnp.var(x, axis=1, ddof=1)
    w = jnp.mean(chain_vars, axis=0)
    b = half * jnp.var(chain_means, axis=0, ddof=1)
    var_plus = w * (half - 1) / half + b / half
    return jnp.sqrt(var_plus / w)


def ess(chains: "jax.Array", max_lag: int = 200) -> "jax.Array":
    """Effective sample size from M×N draws (Geyer initial-positive-sequence
    truncation on the chain-averaged autocorrelation).

    ``chains``: ``(M, N)`` scalar draws (apply per quantity); returns a
    scalar ESS ≤ M·N.  IID draws give ≈ M·N; an AR(1) chain with
    coefficient φ gives ≈ M·N·(1−φ)/(1+φ).
    """
    import jax.numpy as jnp

    x = jnp.asarray(chains)
    m, n = x.shape
    max_lag = min(max_lag, n - 1)
    xc = x - jnp.mean(x, axis=1, keepdims=True)
    # Autocovariance by FFT (static shapes; a lag loop would need dynamic
    # slices, which don't trace).
    f = jnp.fft.rfft(xc, n=2 * n, axis=1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=2 * n, axis=1)[:, : max_lag + 1] / n
    rhos = jnp.mean(acov[:, 1:] / jnp.maximum(acov[:, :1], 1e-30), axis=0)
    # Geyer: sum consecutive pairs; truncate at the first negative pair-sum.
    n_pairs = max_lag // 2
    pair = rhos[: 2 * n_pairs].reshape(n_pairs, 2).sum(axis=1)
    keep = jnp.cumprod(pair > 0)  # 1 until the first negative pair, then 0
    tau = 1.0 + 2.0 * jnp.sum(pair * keep)
    return m * n / jnp.maximum(tau, 1.0)
