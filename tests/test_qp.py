"""QP tests (mirror of reference ``test_qp.py``): discretized-Laplacian
QPs with bound structure, Newton-type sweep, unbounded negative-curvature
QP, plus the two-optima TargetProblem (reference
``test_target_problem.py``)."""

import numpy as np
import pytest

from pygradflow_tpu import (
    LinearSolverType,
    NewtonType,
    Params,
    Solver,
    SolverStatus,
    StepControlType,
    StepSolverType,
)
from pygradflow_tpu.problem import QuadraticProblem

from tests.problems import TARGET_X0, TARGET_X1, TargetProblem


def _boxed_qp():
    """Reference boxed_qp fixture (test_qp.py:29-42): posdef Laplacian with
    a sloped lower bound pinned to zero at three nodes."""
    n = 49
    h = 1.0 / n
    e = np.ones(n)
    H = (np.diag(2 * e) - np.diag(e[:-1], 1) - np.diag(e[:-1], -1)) / h**2
    g = e

    lb = np.linspace(0, -0.01, n + 2)[1:-1].copy()
    lb[n // 4] = 0.0
    lb[3 * n // 4] = 0.0
    lb[n // 2] = 0.0
    ub = np.full(n, np.inf)
    return QuadraticProblem(H, g, var_lb=lb, var_ub=ub), lb


def _unbounded_qp():
    """Reference unbounded_qp (test_qp.py:12-26): negative-curvature
    Laplacian, objective unbounded below."""
    n = 199
    h = 1.0 / n
    e = np.ones(n)
    H = (np.diag(-2 * e) + np.diag(e[:-1], 1) + np.diag(e[:-1], -1)) / h**2
    g = -e
    lb = np.full(n, -np.inf)
    lb[n // 4] = 0.0
    lb[3 * n // 4] = 0.0
    lb[n // 2] = 0.0
    ub = np.full(n, np.inf)
    return QuadraticProblem(H, g, var_lb=lb, var_ub=ub)


@pytest.mark.parametrize(
    "newton_type",
    [NewtonType.ActiveSet, NewtonType.Full, NewtonType.Simplified],
)
def test_newton_types_qp(newton_type):
    problem, lb = _boxed_qp()
    params = Params(
        lamb_init=1e-12, iteration_limit=1000, newton_type=newton_type
    )
    result = Solver(problem, params).solve(np.maximum(lb, 0.0))
    assert result.success
    assert float(result.final_stat_res) < 1e-6


@pytest.mark.parametrize(
    "step_control_type",
    # DistanceRatio is excluded like in the reference sweep
    # (test_qp.py:49-58, where it is commented out)
    [StepControlType.Exact, StepControlType.ResiduumRatio, StepControlType.BoxReduced],
)
def test_unbounded_qp(step_control_type):
    problem = _unbounded_qp()
    params = Params(step_control_type=step_control_type)
    result = Solver(problem, params).solve(0.0)
    assert result.status == SolverStatus.Unbounded


def test_target_ldlt_inertia():
    """Two-optima nonconvex problem with indefinite regions; the
    inertia-corrected LDL^T (the MA57 counterpart, reference
    test_target_problem.py:44-59) must land on one of the optima."""
    params = Params(
        step_solver_type=StepSolverType.Symmetric,
        linear_solver_type=LinearSolverType.LDLT,
        inertia_correction=True,
    )
    result = Solver(TargetProblem(), params).solve(np.array([2.8, 2.9]))
    assert result.success
    assert any(
        np.allclose(result.x, opt, atol=1e-6) for opt in (TARGET_X0, TARGET_X1)
    )


def test_target_cholesky():
    """Cholesky tier (reference test_target_problem.py:26-41): fails on
    indefinite iterations, recovered by the lambda ladder."""
    params = Params(
        step_solver_type=StepSolverType.Symmetric,
        linear_solver_type=LinearSolverType.Cholesky,
    )
    result = Solver(TargetProblem(), params).solve(np.array([2.8, 2.9]))
    assert result.success
    assert any(
        np.allclose(result.x, opt, atol=1e-6) for opt in (TARGET_X0, TARGET_X1)
    )
