"""Newton/projection unit tests (mirror of reference ``test_newton.py``):
active-set masks, projection semantics, row-filter derivative, and
one-step exactness (with tiny dt the Newton matrix is ~identity and one
step zeroes the residual)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pygradflow_tpu import Params
from pygradflow_tpu import implicit_func as impl
from pygradflow_tpu.eval import make_fns
from pygradflow_tpu.iterate import evaluate_iterate
from pygradflow_tpu.newton import NewtonCfg, make_newton
from pygradflow_tpu.params import NewtonType
from pygradflow_tpu.step.solvers import step_solver_def
from pygradflow_tpu.util import keep_rows

from tests.problems import HS71, hs71_instance


def _func(scaled, lamb=2.0):
    inst = hs71_instance()
    params = Params()
    fns = make_fns(inst.problem, params)
    lb = jnp.asarray(inst.problem.var_lb)
    ub = jnp.asarray(inst.problem.var_ub)
    it = evaluate_iterate(fns, jnp.asarray(inst.x_0), jnp.asarray(inst.y_0))
    return impl.make_step_func(it, lamb, lb, ub, scaled=scaled), fns, it


def test_active_set_at_point():
    func, fns, it = _func(scaled=False)
    # HS71 bounds: [1,1,1,1,0] .. [5,5,5,5,inf]
    p = jnp.asarray([0.5, 3.0, 6.0, 1.0 - 1e-10, -1.0])
    active = np.asarray(impl.active_set_at_point(func, p))
    np.testing.assert_array_equal(active, [True, False, True, False, True])


def test_project_box_clips_only_active():
    func, fns, it = _func(scaled=False)
    p = jnp.asarray([0.5, 3.0, 6.0, 2.0, -1.0])
    active = impl.active_set_at_point(func, p)
    proj = np.asarray(impl.project_box(func, p, active))
    np.testing.assert_allclose(proj, [1.0, 3.0, 5.0, 2.0, 0.0])

    # a manually passed empty active set must leave p untouched
    none_active = jnp.zeros_like(active)
    np.testing.assert_allclose(np.asarray(impl.project_box(func, p, none_active)), np.asarray(p))


def test_keep_rows():
    M = jnp.arange(12.0).reshape(4, 3)
    mask = jnp.asarray([True, False, True, False])
    out = np.asarray(keep_rows(M, mask))
    assert (out[1] == 0).all() and (out[3] == 0).all()
    np.testing.assert_allclose(out[0], np.arange(3.0))


@pytest.mark.parametrize("scaled", [False, True])
def test_deriv_zeroes_active_rows(scaled):
    func, fns, it = _func(scaled)
    n, m = fns.num_vars, fns.num_cons
    rho = 0.5

    active = jnp.asarray([True, False, False, True, False])
    from pygradflow_tpu.iterate import aug_lag_deriv_xx

    H = aug_lag_deriv_xx(fns, it, rho)
    K = np.asarray(impl.deriv(func, it.cons_jac, H, active))

    lamb = 2.0
    diag = lamb if scaled else 1.0
    for j in [0, 3]:
        row = K[j]
        expect = np.zeros(n + m)
        expect[j] = diag
        np.testing.assert_allclose(row, expect)


def test_active_set_from_iterate():
    """Pin classification by gradient sign at the bounds (counterpart of
    reference ``FixedActiveSetNewtonMethod.active_set_from_iterate``,
    ``newton.py:131-156`` — unreachable dead code there, working here)."""
    from pygradflow_tpu.newton import active_set_from_iterate
    from tests.problems import BoundedQuad

    # min 1/2 ||x - c||^2 over [0, 1]^3, c = (-1, 0.5, 2): gradient at a
    # bound-sitting point x = (0, 0.5, 1) is x - c = (1, 0, -1) =>
    # x0 pinned at lower (d >= 0), x1 free (interior), x2 pinned at upper
    prob = BoundedQuad(np.array([-1.0, 0.5, 2.0]))
    params = Params()
    fns = make_fns(prob, params)
    lb = jnp.asarray(prob.var_lb)
    ub = jnp.asarray(prob.var_ub)
    it = evaluate_iterate(fns, jnp.asarray([0.0, 0.5, 1.0]), jnp.zeros((0,)))
    active = np.asarray(active_set_from_iterate(fns, it, lb, ub))
    np.testing.assert_array_equal(active, [True, False, True])

    # flip the target: gradients point inward, nothing stays pinned
    prob2 = BoundedQuad(np.array([1.0, 0.5, -1.0]))
    fns2 = make_fns(prob2, params)
    it2 = evaluate_iterate(fns2, jnp.asarray([0.0, 0.5, 1.0]), jnp.zeros((0,)))
    active2 = np.asarray(active_set_from_iterate(fns2, it2, lb, ub))
    np.testing.assert_array_equal(active2, [False, False, False])


def test_fixed_active_set_solves():
    """End-to-end solve with the optimum's active set pinned explicitly
    (HS71: x1 at its lower bound, the slack at 0): Newton on the reduced
    system must reproduce the default solution."""
    from pygradflow_tpu import Solver

    inst = hs71_instance()
    params = Params(
        newton_type=NewtonType.FixedActiveSet,
        fixed_active_set=np.array([True, False, False, False, True]),
    )
    result = Solver(inst.problem, params).solve(inst.x_0, inst.y_0)
    assert result.status.name == "Optimal"
    np.testing.assert_allclose(np.asarray(result.x), inst.x_opt, atol=1e-6)


@pytest.mark.parametrize(
    "bad, match",
    [
        (np.array([True, False]), "shape"),  # wrong length (5 transformed vars)
        (np.array([1, 0, 0, 0, 1]), "bool"),  # wrong dtype
    ],
)
def test_fixed_active_set_validates(bad, match):
    """A wrong-shape/dtype pin mask must raise a clear error instead of
    silently broadcasting into the active-set masking (the reference
    asserts both, newton.py:104-105)."""
    from pygradflow_tpu import Solver

    inst = hs71_instance()
    params = Params(newton_type=NewtonType.FixedActiveSet, fixed_active_set=bad)
    with pytest.raises(ValueError, match=match):
        Solver(inst.problem, params).solve(inst.x_0, inst.y_0)


def test_fixed_active_set_derived_default():
    """fixed_active_set=None derives the pin set from each step origin —
    the sweepable default."""
    from pygradflow_tpu import Solver

    inst = hs71_instance()
    params = Params(newton_type=NewtonType.FixedActiveSet)
    result = Solver(inst.problem, params).solve(inst.x_0, inst.y_0)
    assert result.status.name == "Optimal"
    np.testing.assert_allclose(np.asarray(result.x), inst.x_opt, atol=1e-6)


@pytest.mark.parametrize(
    "newton_type",
    [NewtonType.Simplified, NewtonType.Full, NewtonType.ActiveSet, NewtonType.Globalized],
)
def test_one_step_near_identity(newton_type):
    """With huge lambda (tiny dt) the residual is dominated by the identity
    part; a single Newton step must drive ||F|| to ~0
    (reference test_solver.py:194-215, test_newton.py:145-214)."""
    inst = hs71_instance()
    params = Params(newton_type=newton_type)
    fns = make_fns(inst.problem, params)
    lb = jnp.asarray(inst.problem.var_lb)
    ub = jnp.asarray(inst.problem.var_ub)

    x0 = jnp.asarray([2.0, 3.0, 3.5, 2.0, 1.0])
    y0 = jnp.asarray([0.3, -0.2])
    orig = evaluate_iterate(fns, x0, y0)

    lamb = 1e8
    rho = 1.0

    ssdef = step_solver_def(params)
    cfg = NewtonCfg(fns=fns, params=params, lb=lb, ub=ub, ssdef=ssdef)
    init, step = make_newton(cfg)

    from pygradflow_tpu.eval import Counters

    carry, counters = init(orig, lamb, rho, None, Counters.zero())
    res, carry, counters = step(carry, orig, counters)

    next_it = evaluate_iterate(fns, res.xn, res.yn)
    func = impl.make_step_func(orig, lamb, lb, ub, scaled=False)
    norm = float(impl.value_norm(func, next_it, rho))
    assert norm < 1e-8
