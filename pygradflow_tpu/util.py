"""Small numeric helpers (counterpart of reference ``pygradflow/util.py``)."""

import jax.numpy as jnp


def norm_sq(x):
    return jnp.dot(x, x)


def norm_mult(*args):
    """Joint Euclidean norm of several vectors (reference ``util.py:19-25``)."""
    value = 0.0
    for arg in args:
        value = value + norm_sq(arg)
    return jnp.sqrt(value)


def keep_rows(mat, row_mask):
    """Zero out rows where ``row_mask`` is False, keeping the shape.

    Dense-masked equivalent of the reference sparse row filter
    (``util.py:27-55`` / ``implicit_func.py:80-99``).
    """
    return jnp.where(row_mask[:, None], mat, jnp.zeros_like(mat))


def inf_norm(x):
    """Infinity norm that is 0 for empty arrays (jit-safe)."""
    if x.size == 0 or (hasattr(x, "shape") and x.shape and x.shape[-1] == 0):
        return jnp.zeros((), dtype=x.dtype)
    return jnp.max(jnp.abs(x))
