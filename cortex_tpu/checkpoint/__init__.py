"""Posterior-state checkpoint / resume.

The reference has no checkpointing (SURVEY.md §5); here all inference state
is a pytree of arrays (filtering posteriors, VMP states, natural parameters),
so persistence is generic:

- :func:`save` / :func:`restore` — single-file pytree checkpoints (npz with a
  structure descriptor; no extra dependencies, works for any registered
  dataclass pytree such as the dists and model states),
- :class:`CheckpointManager` — step-numbered checkpoints with retention, for
  periodic snapshots of long streaming runs.
"""

from .pytree_io import CheckpointManager, restore, save

__all__ = ["save", "restore", "CheckpointManager"]
