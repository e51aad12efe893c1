"""Implicit-function unit tests (mirror of reference ``test_func.py``):
residual is zero at the step origin for scaled and unscaled variants."""

import jax.numpy as jnp
import numpy as np
import pytest

from pygradflow_tpu import Params
from pygradflow_tpu import implicit_func as impl
from pygradflow_tpu.eval import make_fns
from pygradflow_tpu.iterate import evaluate_iterate
from pygradflow_tpu.transform import Transformation

from tests.problems import hs71_instance


@pytest.mark.parametrize("scaled", [False, True])
def test_residual_zero_at_origin(scaled):
    inst = hs71_instance()
    params = Params()
    transform = Transformation(inst.problem, params)
    fns = transform.fns

    x, y = transform.create_transformed_initial(inst.x_0, inst.y_0)
    it = evaluate_iterate(fns, x, y)

    lamb = 1.0 / 1e-12  # dt -> 0: F(orig) -> 0
    lb = jnp.asarray(transform.trans_problem.var_lb)
    ub = jnp.asarray(transform.trans_problem.var_ub)

    func = impl.make_step_func(it, lamb, lb, ub, scaled=scaled)
    rx, ry = impl.value_at(func, it, rho=1.0)

    scale = lamb if scaled else 1.0
    np.testing.assert_allclose(np.asarray(rx) / scale, 0.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ry) / scale, 0.0, atol=1e-9)


def test_deriv_matches_fd():
    """Jacobian of the unscaled residual vs finite differences (away from
    active-set kinks)."""
    inst = hs71_instance()
    params = Params()
    transform = Transformation(inst.problem, params)
    fns = transform.fns

    x, y = transform.create_transformed_initial(
        np.array([2.0, 3.0, 3.5, 2.0, 1.0]), np.array([0.3, -0.2])
    )
    orig = evaluate_iterate(fns, x, y)

    lamb = 2.0
    rho = 0.5
    lb = jnp.asarray(transform.trans_problem.var_lb)
    ub = jnp.asarray(transform.trans_problem.var_ub)
    func = impl.make_step_func(orig, lamb, lb, ub, scaled=False)

    active = impl.compute_active_set(func, orig, rho)

    from pygradflow_tpu.iterate import aug_lag_deriv_xx

    H = aug_lag_deriv_xx(fns, orig, rho)
    J = orig.cons_jac
    K = np.asarray(impl.deriv(func, J, H, active))

    n = fns.num_vars
    m = fns.num_cons
    eps = 1e-7

    def F(z):
        it = evaluate_iterate(fns, jnp.asarray(z[:n]), jnp.asarray(z[n:]))
        rx, ry = impl.value_at(func, it, rho, active)
        return np.concatenate([np.asarray(rx), np.asarray(ry)])

    z0 = np.concatenate([np.asarray(x), np.asarray(y)])
    F0 = F(z0)
    fd = np.zeros((n + m, n + m))
    for j in range(n + m):
        zp = z0.copy()
        zp[j] += eps
        fd[:, j] = (F(zp) - F0) / eps

    np.testing.assert_allclose(K, fd, atol=1e-5)
