"""QPLIB reader test: parse a crafted instance and solve it."""

import textwrap

import numpy as np

from pygradflow_tpu import Params, Solver
from pygradflow_tpu.problem import QuadraticProblem
from pygradflow_tpu.runners.qplib import parse_qplib

QPLIB_SAMPLE = textwrap.dedent(
    """\
    ! crafted QPLIB instance: min 1/2 (x0^2 + x1^2) + x0  s.t. x0 + x1 >= 1
    MYQP
    QLQ
    minimize
    2            ! n
    1            ! m
    2            ! nnz upper-triangular Q
    1 1 1.0
    2 2 1.0
    0.0          ! default linear coefficient
    1            ! exceptions
    1 1.0
    0.0          ! objective constant
    2            ! nnz A
    1 1 1.0
    1 2 1.0
    1.0          ! default cons lb
    0
    1.0E+20      ! default cons ub
    0
    -1.0E+20     ! default var lb
    0
    1.0E+20      ! default var ub
    0
    0.0          ! default x0
    0
    """
)


def test_parse_and_solve(tmp_path):
    path = tmp_path / "sample.qplib"
    path.write_text(QPLIB_SAMPLE)

    data = parse_qplib(str(path))
    assert data.name == "MYQP"
    np.testing.assert_allclose(data.Q, np.eye(2))
    np.testing.assert_allclose(data.c, [1.0, 0.0])
    assert data.A.shape == (1, 2)
    np.testing.assert_allclose(data.cons_lb, [1.0])
    assert data.cons_ub[0] == np.inf

    problem = QuadraticProblem(
        data.Q,
        data.c,
        A=data.A,
        cons_lb=data.cons_lb,
        cons_ub=data.cons_ub,
        var_lb=data.var_lb,
        var_ub=data.var_ub,
    )
    result = Solver(problem, Params()).solve(data.x0)
    assert result.success
    # KKT: x + c + A^T y = 0 with x0+x1=1 active:
    # x0 = (1-y)... solving: x0 = y - 1, x1 = y; y - 1 + y = 1 -> y = 1
    np.testing.assert_allclose(result.x, [0.0, 1.0], atol=1e-6)
