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
