"""Primal-dual iterate with precomputed evaluations.

The reference ``Iterate`` caches evaluations via ``functools.cached_property``
(``pygradflow/iterate.py:19-208``).  Under jit the equivalent is an explicit
immutable pytree: :func:`evaluate_iterate` performs the four first-order
evaluations once and stores the results; all derived quantities
(augmented-Lagrangian values/derivatives, KKT residuals) are pure functions
of the stored fields.  The Hessian is *not* stored — it is evaluated
on demand by the step solvers (it is the most expensive eval and not needed
every inner iteration).
"""

from typing import Any, NamedTuple

import jax.numpy as jnp

from .eval import Fns
from .util import inf_norm, norm_mult


class Iterate(NamedTuple):
    x: Any
    y: Any
    obj: Any
    obj_grad: Any
    cons: Any
    cons_jac: Any


def evaluate_iterate(fns: Fns, x, y) -> Iterate:
    """Evaluate obj / grad / cons / jac once at ``(x, y)``.

    In matrix-free mode (``params.matrix_free``) the dense Jacobian is
    never evaluated: every consumer routes J/J^T products through
    ``fns.cons_jvp``/``cons_vjp`` and the ``cons_jac`` slot holds a
    (0, n) placeholder (derived from ``x`` so it carries the right
    device-varying type under shard_map) — guaranteeing the O(m n)
    ``jacfwd`` cannot survive in the loop carry even if XLA's while-loop
    dead-code elimination misses it.  The (0, n) shape keeps degenerate
    ``jac.T @ w`` algebra shape-correct while any unrouted m > 0 read
    fails loudly at trace time."""
    if fns.matrix_free:
        jac = x[:0, None] * x[None, :]
    else:
        jac = fns.cons_jac(x)
    return Iterate(
        x=x,
        y=y,
        obj=fns.obj(x),
        obj_grad=fns.obj_grad(x),
        cons=fns.cons(x),
        cons_jac=jac,
    )


def iterate_eval_counts(m: int) -> dict:
    """Counter increments of one evaluate_iterate call."""
    if m > 0:
        return dict(obj=1, obj_grad=1, cons=1, cons_jac=1)
    return dict(obj=1, obj_grad=1)


# ----------------------------------------------------------------------
# Augmented Lagrangian L_rho(x, y) = f + rho/2 |c|^2 + y^T c
# (reference iterate.py:78-110)
# ----------------------------------------------------------------------


def aug_lag_violation(it: Iterate, rho):
    return rho / 2.0 * jnp.dot(it.cons, it.cons)


def aug_lag_dual(it: Iterate):
    return jnp.dot(it.cons, it.y)


def aug_lag(it: Iterate, rho):
    return it.obj + aug_lag_violation(it, rho) + aug_lag_dual(it)


def _jac_t(it: Iterate, w, fns=None):
    """``J(x)^T w``: through autodiff cons_vjp in matrix-free mode (the
    materialized ``it.cons_jac`` then stays unread and XLA dead-code
    eliminates its evaluation), dense otherwise."""
    if fns is not None and getattr(fns, "matrix_free", False):
        return fns.cons_vjp(it.x, w)
    return it.cons_jac.T @ w


def aug_lag_deriv_x(it: Iterate, rho, fns=None):
    lhs = rho * it.cons + it.y
    return it.obj_grad + _jac_t(it, lhs, fns)


def aug_lag_deriv_y(it: Iterate):
    return it.cons


def aug_lag_deriv_xx(fns: Fns, it: Iterate, rho):
    """``∇²L(x, y + ρc) + ρ JᵀJ`` (reference ``iterate.py:102-110``).

    With ``rho == 0.0`` (a Python float checked at trace time) the JᵀJ term
    is dropped — the scaled step solvers rely on this
    (``scaled_step_solver.py:76-79``).
    """
    mult = it.y + rho * it.cons
    hess = fns.lag_hess(it.x, mult)
    if isinstance(rho, float) and rho == 0.0:
        return hess
    return hess + rho * (it.cons_jac.T @ it.cons_jac)


# ----------------------------------------------------------------------
# Active set masks at a point (reference active_set.py)
# ----------------------------------------------------------------------


class ActiveSet(NamedTuple):
    at_lower: Any
    at_upper: Any
    at_both: Any
    at_either: Any
    violated: Any

    @property
    def satisfied(self):
        return jnp.logical_not(self.violated)


def compute_active_set(x, lb, ub, active_tol) -> ActiveSet:
    at_lower = jnp.abs(x - lb) <= active_tol
    at_upper = jnp.abs(ub - x) <= active_tol

    violated_lower = lb - x > active_tol
    violated_upper = x - ub > active_tol
    violated = jnp.logical_or(violated_lower, violated_upper)

    at_either = jnp.logical_or(at_lower, at_upper)
    at_both = jnp.logical_and(at_lower, at_upper)
    not_both = jnp.logical_not(at_both)

    return ActiveSet(
        at_lower=jnp.logical_and(at_lower, not_both),
        at_upper=jnp.logical_and(at_upper, not_both),
        at_both=at_both,
        at_either=at_either,
        violated=violated,
    )


# ----------------------------------------------------------------------
# KKT residuals (reference iterate.py:140-181)
# ----------------------------------------------------------------------


def bounds_dual(it: Iterate, lb, ub, active_tol, fns=None):
    """Bound multipliers ``d`` from projected stationarity
    (reference ``iterate.py:140-151``)."""
    r = -(it.obj_grad + _jac_t(it, it.y, fns))
    aset = compute_active_set(it.x, lb, ub, active_tol)

    d = jnp.zeros_like(it.x)
    d = jnp.where(aset.at_upper, jnp.maximum(r, 0.0), d)
    d = jnp.where(aset.at_lower, jnp.minimum(r, 0.0), d)
    d = jnp.where(aset.at_both, r, d)
    return d


def bound_violation(it: Iterate, lb, ub):
    lower = inf_norm(jnp.maximum(lb - it.x, 0.0))
    upper = inf_norm(jnp.maximum(it.x - ub, 0.0))
    return jnp.maximum(lower, upper)


def cons_violation(it: Iterate):
    return inf_norm(it.cons)


def stat_res(it: Iterate, lb, ub, active_tol, fns=None):
    d = bounds_dual(it, lb, ub, active_tol, fns)
    r = it.obj_grad + _jac_t(it, it.y, fns) + d
    return inf_norm(r)


def total_res(it: Iterate, lb, ub, active_tol, fns=None):
    return jnp.maximum(
        jnp.maximum(cons_violation(it), bound_violation(it, lb, ub)),
        stat_res(it, lb, ub, active_tol, fns),
    )


def is_feasible(it: Iterate, lb, ub, tol):
    return jnp.logical_and(
        cons_violation(it) <= tol, bound_violation(it, lb, ub) <= tol
    )


def locally_infeasible(
    it: Iterate, lb, ub, active_tol, feas_tol, local_infeas_tol, fns=None
):
    """Infeasible-stationarity test (reference ``iterate.py:115-134``):
    constraint violation above tolerance while the projected gradient of the
    violation measure vanishes."""
    infeasible = cons_violation(it) > feas_tol

    r = _jac_t(it, it.cons, fns)
    aset = compute_active_set(it.x, lb, ub, active_tol)
    r = jnp.where(aset.at_lower, jnp.minimum(r, 0.0), r)
    r = jnp.where(aset.at_upper, jnp.maximum(r, 0.0), r)

    return jnp.logical_and(infeasible, inf_norm(r) <= local_infeas_tol)


# ----------------------------------------------------------------------
# Nonlinearity measures (reference iterate.py:183-198)
# ----------------------------------------------------------------------


def obj_nonlin(it: Iterate, other: Iterate):
    dx = other.x - it.x
    pred = it.obj + jnp.dot(dx, it.obj_grad)
    dx_dot = jnp.dot(dx, dx)
    val = jnp.abs(other.obj - pred) / jnp.where(dx_dot == 0.0, 1.0, dx_dot)
    return jnp.where(jnp.isclose(dx_dot, 0.0), 0.0, val)


def cons_nonlin(it: Iterate, other: Iterate, fns=None):
    dx = other.x - it.x
    if fns is not None and getattr(fns, "matrix_free", False):
        jdx = fns.cons_jvp(it.x, dx)
    else:
        jdx = it.cons_jac @ dx
    pred = it.cons + jdx
    dx_dot = jnp.dot(dx, dx)
    val = (other.cons - pred) / jnp.where(dx_dot == 0.0, 1.0, dx_dot)
    return jnp.where(jnp.isclose(dx_dot, 0.0), jnp.zeros_like(val), val)


def dist(it: Iterate, other: Iterate):
    return norm_mult(it.x - other.x, it.y - other.y)
