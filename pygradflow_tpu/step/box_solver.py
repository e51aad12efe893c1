"""Projected-Newton solver for box-constrained subproblems.

Counterpart of the reference's Bertsekas-style solver
(``pygradflow/step/box_solver.py``, "Projected Newton Methods for
Optimization Problems with Simple Constraints"): epsilon-active set,
reduced Newton direction, Armijo projected line search, unboundedness
detection.  Implemented as nested ``lax.while_loop``s; the reduced Hessian
solve uses the identity-row/column masking trick (static shapes) with the
pure-JAX LU.
"""

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..linalg.plu import plu_factor, plu_solve

BOX_RUNNING = 0
BOX_OPTIMAL = 1
BOX_UNBOUNDED = 2
BOX_ITERATION_LIMIT = 3
BOX_ERROR = 4  # indefinite reduced Hessian or failed line search


class BoxSolverResult(NamedTuple):
    x: jnp.ndarray
    status: jnp.ndarray
    iterations: jnp.ndarray


def solve_box_constrained(
    x0,
    func: Callable,
    grad: Callable,
    hess: Callable,
    lb,
    ub,
    obj_lower: float,
    max_it: int = 1000,
    atol: float = 1e-6,
    rtol: float = 1e-6,
) -> BoxSolverResult:
    n = x0.shape[0]
    x0 = jnp.clip(x0, lb, ub)

    beta = 0.5
    sigma = 1e-3

    def cond(c):
        return jnp.logical_and(c["status"] == BOX_RUNNING, c["it"] < max_it)

    def body(c):
        x = c["x"]
        f = func(x)
        g = grad(x)

        unbounded = f <= obj_lower

        at_lower = jnp.isclose(x, lb)
        at_upper = jnp.isclose(x, ub)
        active_lower = jnp.logical_and(at_lower, g > 0)
        active_upper = jnp.logical_and(at_upper, g < 0)

        residuals = -g
        residuals = jnp.where(at_lower, jnp.maximum(residuals, 0.0), residuals)
        residuals = jnp.where(at_upper, jnp.minimum(residuals, 0.0), residuals)

        residuum = jnp.max(jnp.abs(residuals))
        grad_norm = jnp.max(jnp.abs(g))

        optimal = jnp.logical_or(
            grad_norm < atol,
            jnp.logical_or(
                residuum < atol,
                residuum / jnp.where(grad_norm == 0.0, 1.0, grad_norm) < rtol,
            ),
        )

        active = jnp.logical_or(active_lower, active_upper)
        inactive = jnp.logical_not(active)

        # reduced Newton system via identity rows/cols for active entries
        H = hess(x)
        both_inact = jnp.logical_and(inactive[:, None], inactive[None, :])
        Hm = jnp.where(both_inact, H, 0.0) + jnp.diag(active.astype(H.dtype))
        rhs = jnp.where(inactive, -g, 0.0)
        direction = plu_solve(plu_factor(Hm), rhs)
        direction = jnp.where(inactive, direction, 0.0)

        # reference raises when the reduced Hessian is not positive definite
        not_descent = jnp.dot(direction, g) >= 0.0
        bad_dir = jnp.logical_or(
            not_descent, jnp.logical_not(jnp.all(jnp.isfinite(direction)))
        )

        # Armijo projected line search (reference box_solver.py:100-127)
        def ls_cond(l):
            return jnp.logical_and(l["trial"] < 20, jnp.logical_not(l["done"]))

        def ls_body(l):
            alpha = l["alpha"]
            next_x = jnp.clip(x + alpha * direction, lb, ub)
            next_f = func(next_x)

            rhs_val = alpha * jnp.dot(
                jnp.where(inactive, g, 0.0), direction
            ) + jnp.dot(jnp.where(active, g, 0.0), jnp.where(active, x - next_x, 0.0))

            ok = jnp.logical_and(
                jnp.isfinite(next_f), (f - next_f) >= sigma * rhs_val
            )
            return dict(
                alpha=jnp.where(ok, alpha, alpha * beta),
                x=jnp.where(ok, next_x, l["x"]),
                trial=l["trial"] + 1,
                done=ok,
            )

        ls = jax.lax.while_loop(
            ls_cond,
            ls_body,
            dict(
                alpha=jnp.ones_like(f),
                x=x,
                trial=jnp.zeros((), jnp.int32),
                done=jnp.isnan(f),  # varying False at a finite point
            ),
        )

        ls_failed = jnp.logical_not(ls["done"])

        status = jnp.where(
            unbounded,
            BOX_UNBOUNDED,
            jnp.where(
                optimal,
                BOX_OPTIMAL,
                jnp.where(
                    jnp.logical_or(bad_dir, ls_failed), BOX_ERROR, BOX_RUNNING
                ),
            ),
        ).astype(jnp.int32)

        take_step = status == BOX_RUNNING
        return dict(
            x=jnp.where(take_step, ls["x"], x),
            it=c["it"] + 1,
            status=status,
        )

    out = jax.lax.while_loop(
        cond,
        body,
        dict(
            x=x0,
            it=jnp.zeros((), jnp.int32),
            # derive from x0 to stay device-varying under shard_map
            status=jnp.zeros_like(x0[0]).astype(jnp.int32) + BOX_RUNNING,
        ),
    )

    status = jnp.where(
        out["status"] == BOX_RUNNING, BOX_ITERATION_LIMIT, out["status"]
    )
    return BoxSolverResult(x=out["x"], status=status, iterations=out["it"])
