"""Checkpoint / resume of the homotopy state.

The reference has no checkpointing (SURVEY §5); its nearest analog is the
``collect_path`` trajectory capture.  Here the entire solver state is a
small pytree (iterate, lambda, rho, PI integral, penalty state, counters),
so checkpointing is a flat .npz snapshot written at chunk boundaries and a
restore that resumes the ``lax.while_loop`` exactly where it stopped —
bitwise-identical continuation.

Format: leaves are keyed by their pytree path (not position), so adding
or removing LoopState fields — e.g. the ``eval_fail`` leaves that only
exist under ``validate_input`` — cannot silently shift leaves between
unrelated fields.  A checkpoint whose key set does not match the current
structure fails with an explicit "incompatible checkpoint" error.
Pre-versioning snapshots (positional ``leaf_{i}`` keys) are still loaded
when the leaf count matches exactly.
"""

import os
from typing import Optional

import jax
import numpy as np

FORMAT_VERSION = 2


def _path_key(path) -> str:
    """Stable string form of a jax key path ('.lamb', '.iterate.x', ...)."""
    return "leaf" + jax.tree_util.keystr(path)


def save_state(path: str, state) -> None:
    """Serialize a LoopState pytree to ``path`` (.npz), atomically."""
    flat = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {_path_key(p): np.asarray(leaf) for p, leaf in flat}
    arrays["__format_version__"] = np.asarray(FORMAT_VERSION)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:  # file handle: savez must not append ".npz"
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_state(path: str, example_state):
    """Restore a LoopState saved by :func:`save_state`; ``example_state``
    provides the pytree structure (from ``SolveLoop.init_state``).

    Raises ``ValueError`` when the checkpoint's leaf keys do not match the
    current structure (different code version, or ``validate_input``
    toggled between save and restore)."""
    import jax.numpy as jnp

    flat, treedef = jax.tree_util.tree_flatten_with_path(example_state)
    keys = [_path_key(p) for p, _ in flat]
    leaves = [leaf for _, leaf in flat]

    with np.load(path) as data:
        saved_keys = set(data.files) - {"__format_version__"}
        if "__format_version__" not in data.files:
            # legacy positional format: only safe when the count matches
            if saved_keys == {f"leaf_{i}" for i in range(len(leaves))}:
                restored = [data[f"leaf_{i}"] for i in range(len(leaves))]
            else:
                raise ValueError(
                    f"incompatible checkpoint '{path}': legacy positional "
                    f"format with {len(saved_keys)} leaves, current state "
                    f"has {len(leaves)}"
                )
        else:
            missing = [k for k in keys if k not in saved_keys]
            extra = sorted(saved_keys - set(keys))
            if missing or extra:
                raise ValueError(
                    f"incompatible checkpoint '{path}': leaf keys do not "
                    f"match the current LoopState structure "
                    f"(missing {missing or 'none'}, unexpected "
                    f"{extra or 'none'}; was validate_input toggled, or "
                    f"the checkpoint written by a different version?)"
                )
            restored = [data[k] for k in keys]

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
