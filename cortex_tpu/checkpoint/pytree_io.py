"""Dependency-free pytree checkpointing (npz + treedef descriptor)."""

from __future__ import annotations

import os
import re
from typing import Any, List, Optional

import jax
import numpy as np

__all__ = ["save", "restore", "CheckpointManager"]


def save(path: str, tree: Any) -> None:
    """Serialize a pytree of arrays to ``path`` (.npz).

    The tree structure is stored via ``jax.tree_util.tree_structure`` repr for
    validation plus leaf ordering; restore requires a matching ``like`` tree
    (the robust, version-stable approach — structure comes from code, data
    from the file)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__treedef_repr__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def restore(path: str, like: Any) -> Any:
    """Load a pytree saved by :func:`save`.  ``like`` provides the structure
    (and device placement is left to the caller)."""
    with np.load(path) as data:
        saved_repr = bytes(data["__treedef_repr__"]).decode()
        leaves_like, treedef = jax.tree_util.tree_flatten(like)
        if str(treedef) != saved_repr:
            raise ValueError(
                "Checkpoint structure mismatch:\n"
                f"  saved:    {saved_repr}\n  expected: {treedef}"
            )
        leaves = [data[f"leaf_{i}"] for i in range(len(leaves_like))]
    return jax.tree_util.tree_unflatten(treedef, leaves)


class CheckpointManager:
    """Step-numbered checkpoints with retention.

    ``manager.save(step, state)`` writes ``ckpt_{step}.npz`` in ``directory``
    and prunes to the newest ``max_to_keep``; ``manager.restore(like)`` loads
    the latest.
    """

    _PATTERN = re.compile(r"ckpt_(\d+)\.npz$")

    def __init__(self, directory: str, max_to_keep: int = 3) -> None:
        self.directory = directory
        self.max_to_keep = max_to_keep
        os.makedirs(directory, exist_ok=True)

    def _steps(self) -> List[int]:
        steps = []
        for name in os.listdir(self.directory):
            m = self._PATTERN.match(name)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self._steps()
        return steps[-1] if steps else None

    def save(self, step: int, tree: Any) -> str:
        path = os.path.join(self.directory, f"ckpt_{step}.npz")
        save(path, tree)
        steps = self._steps()
        for old in steps[: -self.max_to_keep]:
            os.remove(os.path.join(self.directory, f"ckpt_{old}.npz"))
        return path

    def restore(self, like: Any, step: Optional[int] = None) -> Any:
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoints in {self.directory}")
        return restore(os.path.join(self.directory, f"ckpt_{step}.npz"), like)
