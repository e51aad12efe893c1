"""Status-condition tests (mirror of reference ``test_conds.py``):
unboundedness and local-infeasibility detection on crafted problems."""

import jax.numpy as jnp
import numpy as np
import pytest

from pygradflow_tpu import Params, Solver, SolverStatus
from pygradflow_tpu.problem import Problem


class UnboundedProblem(Problem):
    def __init__(self):
        super().__init__(np.array([-np.inf]), np.array([np.inf]))

    def obj(self, x):
        return x[0]


def test_unbounded():
    result = Solver(UnboundedProblem(), Params()).solve(np.array([0.0]))
    assert result.status == SolverStatus.Unbounded


class InfeasibleBounds(Problem):
    """Equality constraint x0 + x1 = -1 incompatible with bounds x >= 0:
    minimizing the violation stalls at the bound."""

    def __init__(self):
        super().__init__(np.zeros(2), np.full(2, np.inf), num_cons=1)

    def obj(self, x):
        return jnp.dot(x, x)

    def cons(self, x):
        return jnp.array([x[0] + x[1] + 1.0])


def test_locally_infeasible_bounds():
    result = Solver(InfeasibleBounds(), Params()).solve(np.array([1.0, 1.0]))
    assert result.status == SolverStatus.LocallyInfeasible


class InfeasibleNonlinear(Problem):
    """c(x) = x^2 + 1 = 0 has no real solution; violation minimized at
    x = 0 with nonzero residual."""

    def __init__(self):
        super().__init__(np.array([-np.inf]), np.array([np.inf]), num_cons=1)

    def obj(self, x):
        return x[0] ** 2

    def cons(self, x):
        return jnp.array([x[0] ** 2 + 1.0])


def test_locally_infeasible_nonlinear():
    result = Solver(InfeasibleNonlinear(), Params()).solve(np.array([0.5]))
    assert result.status == SolverStatus.LocallyInfeasible


class IllScaledProblem(Problem):
    """Badly scaled quartic: the first Newton systems at lambda_init are
    ill-conditioned/singular-ish, exercising the recovery ladder (rejected
    steps with doubled lambda) before convergence."""

    def __init__(self):
        super().__init__(np.full(2, -np.inf), np.full(2, np.inf))

    def obj(self, x):
        return 1e8 * (x[0] - 1.0) ** 4 + 1e-8 * (x[1] - 1.0) ** 2


def test_recovery_ladder_ill_scaled():
    result = Solver(IllScaledProblem(), Params()).solve(np.array([5.0, 5.0]))
    assert result.success
    # quartic term is flat near 1 at tol 1e-6; the tiny-coefficient
    # direction is the hard one and must still be resolved
    np.testing.assert_allclose(result.x[0], 1.0, atol=2e-2)


class SingularHessianProblem(Problem):
    """Zero-curvature directions: Hessian singular everywhere; the lambda
    shift regularizes every KKT system and the solve must still converge."""

    def __init__(self):
        super().__init__(np.full(3, -np.inf), np.full(3, np.inf))

    def obj(self, x):
        return (x[0] + x[1] + x[2] - 3.0) ** 2  # rank-1 Hessian


def test_singular_hessian():
    result = Solver(SingularHessianProblem(), Params()).solve(np.zeros(3))
    assert result.success
    np.testing.assert_allclose(
        float(result.x.sum()), 3.0, atol=1e-5
    )
