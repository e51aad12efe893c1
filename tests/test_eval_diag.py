"""Per-evaluation failure diagnostics (reference ValidatingEvaluator,
``eval.py:130-211``): a mid-solve non-finite user evaluation must be
attributed to the component and point that produced it."""

import jax.numpy as jnp
import numpy as np
import pytest

from pygradflow_tpu import Params, Solver
from pygradflow_tpu.eval import Component, EvalError, diagnose_eval_failure, make_fns
from pygradflow_tpu.problem import Problem


class CorruptGradProblem(Problem):
    """Quadratic with a gradient that is only finite at the origin: every
    Newton candidate evaluates to NaN, steps are rejected until the
    lambda limit."""

    def __init__(self):
        super().__init__(np.full(2, -np.inf), np.full(2, np.inf))

    def obj(self, v):
        return jnp.sum((v - 1.0) ** 2)

    def obj_grad(self, v):
        g = 2.0 * (v - 1.0)
        at_origin = jnp.all(v == 0.0)
        return jnp.where(at_origin, g, jnp.full_like(g, jnp.nan))


def test_corrupted_grad_named_at_lambda_limit():
    params = Params(display=False, lamb_max=1e4)
    solver = Solver(CorruptGradProblem(), params)
    with pytest.raises(EvalError, match="Objective Gradient"):
        solver.solve(np.zeros(2), np.zeros(0))


class NanConsAway(Problem):
    def __init__(self):
        super().__init__(np.full(2, -np.inf), np.full(2, np.inf), num_cons=1)

    def obj(self, v):
        return jnp.sum(v**2)

    def cons(self, v):
        bad = jnp.abs(v[0]) > 0.5
        return jnp.where(bad, jnp.nan, v[:1].sum(keepdims=True))


def test_diagnose_names_component():
    params = Params()
    fns = make_fns(NanConsAway(), params)

    assert diagnose_eval_failure(fns, np.array([1.0, 0.0]), np.zeros(1)) == (
        Component.Cons
    )
    assert diagnose_eval_failure(fns, np.array([0.1, 0.0]), np.zeros(1)) is None
    # non-finite candidate = factorization breakdown, not an eval error
    assert (
        diagnose_eval_failure(fns, np.array([np.nan, 0.0]), np.zeros(1)) is None
    )
