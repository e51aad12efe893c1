"""Checkpoint / resume of the homotopy state.

The reference has no checkpointing (SURVEY §5); its nearest analog is the
``collect_path`` trajectory capture.  Here the entire solver state is a
small pytree (iterate, lambda, rho, PI integral, penalty state, counters),
so checkpointing is a flat .npz snapshot written at chunk boundaries and a
restore that resumes the ``lax.while_loop`` exactly where it stopped —
bitwise-identical continuation.
"""

import os
from typing import Optional

import jax
import numpy as np


def save_state(path: str, state) -> None:
    """Serialize a LoopState pytree to ``path`` (.npz), atomically."""
    leaves, _ = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:  # file handle: savez must not append ".npz"
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_state(path: str, example_state):
    """Restore a LoopState saved by :func:`save_state`; ``example_state``
    provides the pytree structure (from ``SolveLoop.init_state``)."""
    leaves, treedef = jax.tree_util.tree_flatten(example_state)
    with np.load(path) as data:
        restored = [data[f"leaf_{i}"] for i in range(len(leaves))]
    import jax.numpy as jnp

    restored = [
        jnp.asarray(r, dtype=leaf.dtype) if hasattr(leaf, "dtype") else r
        for r, leaf in zip(restored, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, restored)


class CheckpointManager:
    """Periodic checkpointing driver used by ``Solver.solve``: writes a
    snapshot every ``every`` chunk boundaries; ``latest`` finds the resume
    point."""

    def __init__(self, path: str, every: int = 1):
        self.path = path
        self.every = max(1, int(every))
        self._count = 0

    def maybe_save(self, state) -> bool:
        self._count += 1
        if self._count % self.every != 0:
            return False
        save_state(self.path, state)
        return True

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def restore(self, example_state):
        return load_state(self.path, example_state)
