"""Iterate calculus unit tests (mirror of reference ``test_iterate.py``):
augmented-Lagrangian derivatives vs finite differences, residual pieces."""

import jax.numpy as jnp
import numpy as np

from pygradflow_tpu import Params
from pygradflow_tpu.eval import make_fns
from pygradflow_tpu.iterate import (
    aug_lag,
    aug_lag_deriv_x,
    aug_lag_deriv_xx,
    aug_lag_deriv_y,
    bound_violation,
    cons_violation,
    evaluate_iterate,
    total_res,
)

from tests.problems import hs71_instance

RHO = 0.7


def _setup():
    inst = hs71_instance()
    params = Params()
    fns = make_fns(inst.problem, params)
    x = jnp.asarray([1.5, 4.0, 3.3, 1.9, 0.5])
    y = jnp.asarray([0.2, -0.3])
    it = evaluate_iterate(fns, x, y)
    return fns, it, x, y


def test_aug_lag_deriv_x_fd():
    fns, it, x, y = _setup()
    g = np.asarray(aug_lag_deriv_x(it, RHO))

    eps = 1e-7
    base = float(aug_lag(it, RHO))
    fd = np.zeros_like(g)
    for j in range(x.shape[0]):
        xp = np.asarray(x).copy()
        xp[j] += eps
        itp = evaluate_iterate(fns, jnp.asarray(xp), y)
        fd[j] = (float(aug_lag(itp, RHO)) - base) / eps

    np.testing.assert_allclose(g, fd, atol=1e-5)


def test_aug_lag_deriv_y_is_cons():
    fns, it, x, y = _setup()
    np.testing.assert_allclose(
        np.asarray(aug_lag_deriv_y(it)), np.asarray(it.cons)
    )


def test_aug_lag_deriv_xx_fd():
    fns, it, x, y = _setup()
    H = np.asarray(aug_lag_deriv_xx(fns, it, RHO))

    eps = 1e-5
    fd = np.zeros_like(H)
    for j in range(x.shape[0]):
        xp = np.asarray(x).copy()
        xp[j] += eps
        xm = np.asarray(x).copy()
        xm[j] -= eps
        gp = np.asarray(aug_lag_deriv_x(evaluate_iterate(fns, jnp.asarray(xp), y), RHO))
        gm = np.asarray(aug_lag_deriv_x(evaluate_iterate(fns, jnp.asarray(xm), y), RHO))
        fd[:, j] = (gp - gm) / (2 * eps)

    np.testing.assert_allclose(H, fd, rtol=1e-6, atol=1e-6)


def test_residuals_at_optimum():
    inst = hs71_instance()
    params = Params()
    fns = make_fns(inst.problem, params)
    lb = jnp.asarray(inst.problem.var_lb)
    ub = jnp.asarray(inst.problem.var_ub)

    it = evaluate_iterate(fns, jnp.asarray(inst.x_opt), jnp.asarray(inst.y_opt))
    assert float(cons_violation(it)) < 1e-6
    assert float(bound_violation(it, lb, ub)) < 1e-12
    assert float(total_res(it, lb, ub, params.active_tol)) < 1e-5
