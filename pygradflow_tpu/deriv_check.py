"""Derivative checking (reference ``pygradflow/deriv_check.py``).

The reference validates hand-coded callback derivatives against forward
finite differences.  Here derivatives default to autodiff, so the checker's
main role is validating *user-overridden* derivative methods (and serving
the same test surface): column-wise forward differences compared against
the provided derivative, reporting the exact invalid indices.
Runs eagerly on the host (numpy), not inside jit.
"""

from typing import Any

import jax.numpy as jnp
import numpy as np

from .params import DerivCheck, Params


class DerivError(Exception):
    def __init__(self, deriv, findiff, atol, invalid_indices):
        self.deriv = deriv
        self.findiff = findiff
        self.atol = atol
        self.invalid_indices = invalid_indices
        super().__init__(
            "Derivative check failed at indices {0}".format(invalid_indices)
        )

    @property
    def invalid_deriv(self) -> Any:
        return self.deriv[tuple(self.invalid_indices.T)]

    @property
    def invalid_findiff(self) -> Any:
        return self.findiff[tuple(self.invalid_indices.T)]


def deriv_check(f, x, deriv, params: Params) -> None:
    """Column-wise forward finite differences of ``f`` at ``x`` vs the
    claimed derivative (reference ``deriv_check.py:49-100``)."""
    x = np.asarray(x, dtype=np.float64)
    deriv = np.atleast_2d(np.asarray(deriv, dtype=np.float64))
    eps = params.deriv_pert
    tol = params.deriv_tol

    (n,) = x.shape
    f0 = np.atleast_1d(np.asarray(f(jnp.asarray(x)), dtype=np.float64))

    findiff = np.zeros_like(deriv)
    for j in range(n):
        xp = np.copy(x)
        xp[j] += eps
        fj = np.atleast_1d(np.asarray(f(jnp.asarray(xp)), dtype=np.float64))
        findiff[:, j] = (fj - f0) / eps

    invalid = ~np.isclose(deriv, findiff, atol=tol, rtol=0.0)
    if invalid.any():
        invalid_indices = np.argwhere(invalid)
        raise DerivError(deriv, findiff, tol, invalid_indices)


def deriv_check_problem(problem, params: Params, x, y) -> None:
    """Check the (transformed) problem derivatives at ``(x, y)``
    (reference ``solver.py:103-131``)."""
    check = params.deriv_check
    if check == DerivCheck.NoCheck:
        return

    from .log import logger

    x = jnp.asarray(x)
    y = jnp.asarray(y)

    if check & DerivCheck.CheckFirst:
        logger.info("Checking objective derivative")
        deriv_check(lambda x_: problem.obj(x_), x, problem.obj_grad(x), params)

        if problem.num_cons > 0:
            logger.info("Checking constraint derivative")
            deriv_check(lambda x_: problem.cons(x_), x, problem.cons_jac(x), params)

    if check & DerivCheck.CheckSecond:
        logger.info("Checking Hessian")

        def lag_grad(x_):
            g = problem.obj_grad(x_)
            if problem.num_cons > 0:
                g = g + problem.cons_jac(x_).T @ y
            return g

        deriv_check(lag_grad, x, problem.lag_hess(x, y), params)

    logger.info("Finished derivative check")
