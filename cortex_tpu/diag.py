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

__all__ = ["DivergenceError", "check_finite", "ConvergenceMonitor"]


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
