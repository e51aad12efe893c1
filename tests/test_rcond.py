"""rcond estimation surfaced end-to-end (reference displays an rcond
column and computes it per factorization when ``params.report_rcond``,
``step/solver/step_solver.py:100-112``)."""

import numpy as np
import pytest

from pygradflow_tpu import Params, Solver
from pygradflow_tpu.params import LinearSolverType, StepSolverType

from .problems import LaplacianQP, hs71_instance


def test_rcond_reported_in_result():
    inst = hs71_instance()
    params = Params(report_rcond=True, display=False)
    result = Solver(inst.problem, params).solve(inst.x_0, inst.y_0)

    assert result.success
    rcond = result.final_rcond
    assert np.isfinite(rcond)
    assert 0.0 < rcond <= 1.0


def test_rcond_nan_when_disabled():
    inst = hs71_instance()
    params = Params(report_rcond=False, display=False)
    result = Solver(inst.problem, params).solve(inst.x_0, inst.y_0)

    assert result.success
    assert np.isnan(result.final_rcond)


@pytest.mark.parametrize(
    "sstype", [StepSolverType.Symmetric, StepSolverType.Asymmetric]
)
def test_rcond_detects_ill_conditioning(sstype):
    """A stiff Laplacian QP produces visibly worse conditioning than a
    benign problem; the estimate must reflect that (within the Dixon
    estimator's order-of-magnitude accuracy)."""
    params = Params(
        report_rcond=True,
        display=False,
        step_solver_type=sstype,
        linear_solver_type=(
            LinearSolverType.LDLT
            if sstype == StepSolverType.Symmetric
            else LinearSolverType.LU
        ),
    )

    qp = LaplacianQP(n=199)
    result = Solver(qp, params).solve()
    assert np.isfinite(result.final_rcond)
    # the discretized Laplacian at this size has cond >~ 1e4
    assert result.final_rcond < 1e-2


def test_rcond_display_column(caplog):
    """The display layout grows an rcond column when enabled."""
    from pygradflow_tpu.display import solver_display

    params = Params(report_rcond=True)
    disp = solver_display(2, params)
    assert any(c.name == "rcond" for c in disp.columns)

    params_off = Params(report_rcond=False)
    disp_off = solver_display(2, params_off)
    assert not any(c.name == "rcond" for c in disp_off.columns)
