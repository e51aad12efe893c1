"""Randomized reciprocal-condition-number estimation.

Dixon's power-iteration estimator ("Estimating Extremal Eigenvalues and
Condition Numbers of Matrices"), the counterpart of the reference
``step/cond_estimate.py:58-114``: ``||A||_2`` is estimated by power
iteration with ``A^T A`` products, ``||A^-1||_2`` with pairs of
transpose/plain back-solves; both from fixed-seed random unit vectors.

The iteration count depends only on the matrix size and the confidence
parameters, so it is static under jit; the loop is a ``lax.fori_loop``.
"""

import math

import jax
import jax.numpy as jnp

SEED = 42


def required_its(size: int, min_prob: float = 0.99, factor: float = 10.0) -> int:
    f = (1.0 - min_prob) / 1.6 * math.pow(size, -0.5)
    return -2 * math.ceil(math.log(f, factor))


def estimate_rcond(mat, solve, solve_trans, min_prob: float = 0.99, factor: float = 10.0):
    """Estimate 1/cond_2(mat).  ``solve``/``solve_trans`` are back-solve
    closures over an existing factorization."""
    size = mat.shape[-1]
    num_its = required_its(size, min_prob, factor)
    dtype = mat.dtype

    key = jax.random.PRNGKey(SEED)
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (size,), dtype=dtype)
    x = x / jnp.linalg.norm(x)
    y = jax.random.normal(ky, (size,), dtype=dtype)
    y = y / jnp.linalg.norm(y)

    def body(_, carry):
        xprod, yprod, xfac, yfac = carry

        xprod = mat.T @ (mat @ xprod)
        yprod = solve(solve_trans(yprod))

        xnorm = jnp.linalg.norm(xprod)
        ynorm = jnp.linalg.norm(yprod)

        xfac = xfac * xnorm
        xprod = xprod / jnp.where(xnorm == 0.0, 1.0, xnorm)
        yfac = yfac * ynorm
        yprod = yprod / jnp.where(ynorm == 0.0, 1.0, ynorm)

        return (xprod, yprod, xfac, yfac)

    one = jnp.ones((), dtype)
    (xprod, yprod, xfac, yfac) = jax.lax.fori_loop(
        0, num_its, body, (x, y, one, one)
    )

    pow_fac = 1.0 / (2.0 * num_its)
    xdot = (jnp.dot(x, xprod) * xfac) ** pow_fac
    ydot = (jnp.dot(y, yprod) * yfac) ** pow_fac

    cond = xdot * ydot
    rcond = jnp.where(
        jnp.logical_or(jnp.isinf(cond), jnp.isnan(cond)), 0.0, 1.0 / cond
    )
    return rcond
