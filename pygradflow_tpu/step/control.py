"""Step-size controllers: accept/reject steps and adapt lambda = 1/dt.

Counterparts of the reference controllers (``pygradflow/step/``):
DistanceRatio (default), ResiduumRatio, Exact, Fixed, BoxReduced and
Optimizing.  Each is a pure function

    step(orig_iterate, lamb, rho, error_sum, counters)
        -> ControlResult

executed inside the jit-compiled outer loop; branch decisions
(first-iteration convergence, zero steps) use ``lax.cond`` so only the
taken branch runs on a single device.

The PI controller on log(theta) reproduces the reference LogController
(``pygradflow/controller.py:29-77``): on acceptance
``lamb <- max(lamb_min, lamb / exp(K_P e + K_I sum_e))`` with
``e = log(theta_ref) - log(theta)``; on rejection ``lamb *= lamb_inc`` and
the integral term resets when positive.

Error recovery (reference ``step_control.py:64-107``): a singular
factorization or non-finite evaluation surfaces as non-finite values in the
candidate iterate; :func:`compute_step` detects this and converts it into a
rejected step with doubled lambda.
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .. import implicit_func as impl
from ..eval import Counters
from ..iterate import (
    Iterate,
    aug_lag_deriv_x,
    evaluate_iterate,
    iterate_eval_counts,
)
from ..newton import NewtonCfg, make_newton
from ..params import ActiveSetType, Params, StepControlType
from .solvers import step_solver_def


class ControlResult(NamedTuple):
    iterate: Iterate  # evaluated candidate iterate
    lamb: Any  # next lambda
    accepted: Any  # bool scalar
    error_sum: Any  # PI integral state
    active_set: Any  # bool (n,) from the last Newton step
    counters: Counters
    rcond: Any  # Dixon estimate from the last factorization (NaN when off)
    # (x, y) of the FIRST evaluated inner candidate: when a bad user eval
    # there poisons later candidates' x with NaN, this point still has
    # finite coordinates, letting the host diagnosis name the component
    first_point: Any


class ControlCfg(NamedTuple):
    fns: Any
    params: Params
    lb: Any
    ub: Any
    newton_init: Any
    newton_step: Any
    m: int


def make_control_cfg(fns, params: Params, lb, ub) -> ControlCfg:
    ssdef = step_solver_def(params, fns)
    ncfg = NewtonCfg(fns=fns, params=params, lb=lb, ub=ub, ssdef=ssdef)
    newton_init, newton_step = make_newton(ncfg)
    return ControlCfg(
        fns=fns,
        params=params,
        lb=lb,
        ub=ub,
        newton_init=newton_init,
        newton_step=newton_step,
        m=fns.num_cons,
    )


# ----------------------------------------------------------------------
# tau heuristics for the active-set projection point
# (reference step/newton_control.py:40-88)
# ----------------------------------------------------------------------


def _tau_vals(cfg: ControlCfg, it: Iterate, rho):
    x = it.x
    g = aug_lag_deriv_x(it, rho, cfg.fns)
    xl, xu = cfg.lb, cfg.ub

    zero_g = jnp.isclose(g, 0.0)
    pos_g = jnp.logical_and(g > 0.0, jnp.logical_not(zero_g))
    neg_g = jnp.logical_and(g < 0.0, jnp.logical_not(zero_g))

    tau = jnp.full_like(x, -1.0)
    safe_g = jnp.where(zero_g, 1.0, g)
    tau = jnp.where(pos_g, (x - xl) / safe_g, tau)
    tau = jnp.where(neg_g, (xu - x) / -safe_g, tau)
    return tau


def compute_tau(cfg: ControlCfg, it: Iterate, lamb, rho):
    params = cfg.params
    ast = params.active_set_type

    if ast == ActiveSetType.Explicit:
        assert params.active_set_tau is not None
        return params.active_set_tau

    if params.active_set_method is not None:
        return params.active_set_method(it, lamb, rho)

    if ast == ActiveSetType.Standard:
        return None

    tau_vals = _tau_vals(cfg, it, rho)

    if ast == ActiveSetType.SmallestActiveSet:
        pos = tau_vals > 0
        any_pos = jnp.any(pos)
        min_tau = jnp.min(jnp.where(pos, tau_vals, jnp.inf))
        return jnp.where(any_pos, 0.5 * min_tau, 1.0)

    assert ast == ActiveSetType.LargestActiveSet
    return jnp.maximum(jnp.max(tau_vals), 1.0)


# ----------------------------------------------------------------------
# PI update helper
# ----------------------------------------------------------------------


def _pi_accept(params: Params, lamb, theta, error_sum):
    error = jnp.log(params.theta_ref) - jnp.log(theta)
    es_n = error_sum + error
    lamb_mod = jnp.exp(params.K_P * error + params.K_I * es_n)
    lamb_n = jnp.maximum(params.lamb_min, lamb / lamb_mod)
    return lamb_n, es_n


def _pi_reject(params: Params, lamb, error_sum):
    lamb_n = lamb * params.lamb_inc
    es_n = jnp.where(error_sum > 0.0, 0.0, error_sum)
    return lamb_n, es_n


def _unscaled_func(cfg: ControlCfg, orig: Iterate, lamb):
    """Controllers measure residuals with the *unscaled* implicit function
    (reference ``distance_ratio_control.py:28``)."""
    return impl.make_step_func(orig, lamb, cfg.lb, cfg.ub, scaled=False)


def _inner_debug(cfg: ControlCfg):
    """Per-inner-Newton-iteration DEBUG rows (reference
    ``step_control.py:109-120`` + ``display.py:307-315``).

    The gate is decided at TRACE time (params.display + log level), so the
    compiled loop carries zero display work when off; when on, each inner
    step posts (iter, residuum, dist, |active set|) to the host via
    ``jax.debug.callback``."""
    import logging

    from ..log import logger

    params = cfg.params
    if not params.display or logger.getEffectiveLevel() > logging.DEBUG:
        return None

    from ..display import inner_display

    disp = inner_display(params)

    def show(i, res, dist, act):
        disp.row(
            {
                "inner": int(i),
                "residuum": float(res),
                "dist": float(dist),
                "active": int(act),
            }
        )

    def emit(i, residuum, dist, active_set):
        jax.debug.callback(
            show, i, residuum, dist, jnp.sum(active_set.astype(jnp.int32))
        )

    return emit


def _evaluate(cfg: ControlCfg, xn, yn, counters):
    it = evaluate_iterate(cfg.fns, xn, yn)
    return it, counters.add(**iterate_eval_counts(cfg.m))


# ----------------------------------------------------------------------
# DistanceRatio controller (default; reference distance_ratio_control.py)
# ----------------------------------------------------------------------


def _distance_ratio(cfg: ControlCfg):
    params = cfg.params
    emit = _inner_debug(cfg)

    def step(orig: Iterate, lamb, rho, error_sum, counters):
        tau = compute_tau(cfg, orig, lamb, rho)
        carry, counters = cfg.newton_init(orig, lamb, rho, tau, counters)
        func = _unscaled_func(cfg, orig, lamb)

        step1, carry, counters = cfg.newton_step(carry, orig, counters)
        mid_it, counters = _evaluate(cfg, step1.xn, step1.yn, counters)
        mid_norm = impl.value_norm(func, mid_it, rho, fns=cfg.fns)
        if emit is not None:
            emit(0, mid_norm, step1.diff, step1.active_set)

        conv1 = mid_norm <= params.newton_tol
        zero1 = step1.diff == 0.0
        early = jnp.logical_or(conv1, zero1)

        def early_branch(counters):
            lamb_n = jnp.where(
                conv1, jnp.maximum(lamb * params.lamb_red, params.lamb_min), lamb
            )
            # `conv1 | ~conv1` instead of a constant True: keeps the value
            # device-varying under shard_map so cond branch types match
            accepted = jnp.logical_or(conv1, jnp.logical_not(conv1))
            return ControlResult(
                mid_it,
                lamb_n,
                accepted,
                error_sum,
                step1.active_set,
                counters,
                step1.rcond,
                (mid_it.x, mid_it.y),
            )

        def full_branch(counters):
            step2, _, counters = cfg.newton_step(carry, mid_it, counters)
            fin_it, counters = _evaluate(cfg, step2.xn, step2.yn, counters)
            if emit is not None:
                emit(
                    1,
                    impl.value_norm(func, fin_it, rho, fns=cfg.fns),
                    step2.diff,
                    step2.active_set,
                )

            zero2 = step2.diff == 0.0
            safe_d1 = jnp.where(zero1, 1.0, step1.diff)
            theta = step2.diff / safe_d1

            accepted = theta <= params.theta_max
            lamb_acc, es_acc = _pi_accept(params, lamb, jnp.maximum(theta, 1e-300), error_sum)
            lamb_rej, es_rej = _pi_reject(params, lamb, error_sum)

            lamb_n = jnp.where(accepted, lamb_acc, lamb_rej)
            es_n = jnp.where(accepted, es_acc, es_rej)

            # zero second step: accept at unchanged lambda
            lamb_n = jnp.where(zero2, lamb, lamb_n)
            es_n = jnp.where(zero2, error_sum, es_n)
            accepted = jnp.logical_or(accepted, zero2)

            return ControlResult(
                fin_it,
                lamb_n,
                accepted,
                es_n,
                step2.active_set,
                counters,
                step2.rcond,
                (mid_it.x, mid_it.y),
            )

        return jax.lax.cond(early, early_branch, full_branch, counters)

    return step


# ----------------------------------------------------------------------
# ResiduumRatio controller (reference residuum_ratio_control.py)
# ----------------------------------------------------------------------


def _residuum_ratio(cfg: ControlCfg):
    params = cfg.params
    emit = _inner_debug(cfg)

    def step(orig: Iterate, lamb, rho, error_sum, counters):
        tau = compute_tau(cfg, orig, lamb, rho)
        carry, counters = cfg.newton_init(orig, lamb, rho, tau, counters)
        func = _unscaled_func(cfg, orig, lamb)

        step1, _, counters = cfg.newton_step(carry, orig, counters)
        mid_it, counters = _evaluate(cfg, step1.xn, step1.yn, counters)
        mid_norm = impl.value_norm(func, mid_it, rho, fns=cfg.fns)
        if emit is not None:
            emit(0, mid_norm, step1.diff, step1.active_set)

        conv1 = mid_norm <= params.newton_tol

        orig_norm = impl.value_norm(func, orig, rho, fns=cfg.fns)
        theta = mid_norm / jnp.where(orig_norm == 0.0, 1.0, orig_norm)

        accepted = theta <= params.theta_max
        lamb_acc, es_acc = _pi_accept(params, lamb, jnp.maximum(theta, 1e-300), error_sum)
        lamb_rej, es_rej = _pi_reject(params, lamb, error_sum)

        lamb_n = jnp.where(accepted, lamb_acc, lamb_rej)
        es_n = jnp.where(accepted, es_acc, es_rej)

        # first-iteration convergence: accept with reduced lambda
        lamb_n = jnp.where(
            conv1, jnp.maximum(lamb * params.lamb_red, params.lamb_min), lamb_n
        )
        es_n = jnp.where(conv1, error_sum, es_n)
        accepted = jnp.logical_or(accepted, conv1)

        return ControlResult(
            mid_it,
            lamb_n,
            accepted,
            es_n,
            step1.active_set,
            counters,
            step1.rcond,
            (mid_it.x, mid_it.y),
        )

    return step


# ----------------------------------------------------------------------
# Exact controller (reference exact_control.py): iterate Newton to
# convergence, halve lambda on success, double on failure
# ----------------------------------------------------------------------


def _exact(cfg: ControlCfg):
    params = cfg.params
    max_num_it = params.newton_max_it
    rate_bound = 0.5
    emit = _inner_debug(cfg)

    def step(orig: Iterate, lamb, rho, error_sum, counters):
        tau = compute_tau(cfg, orig, lamb, rho)
        carry, counters = cfg.newton_init(orig, lamb, rho, tau, counters)
        func = _unscaled_func(cfg, orig, lamb)

        curr_val = impl.value_norm(func, orig, rho, fns=cfg.fns)

        def cond(c):
            return jnp.logical_and(c["i"] < max_num_it, c["state"] == 0)

        def body(c):
            counters = c["counters"]
            step_i, carry2, counters = cfg.newton_step(c["carry"], c["it"], counters)
            next_it, counters = _evaluate(cfg, step_i.xn, step_i.yn, counters)
            next_val = impl.value_norm(func, next_it, rho, fns=cfg.fns)
            if emit is not None:
                emit(c["i"], next_val, step_i.diff, step_i.active_set)

            converged = next_val <= params.newton_tol
            rate_bad = next_val / jnp.where(c["val"] == 0.0, 1.0, c["val"]) > rate_bound
            bad = jnp.logical_and(jnp.logical_not(converged), rate_bad)
            # also treat non-finite residuals as failure
            bad = jnp.logical_or(bad, jnp.logical_not(jnp.isfinite(next_val)))

            state = jnp.where(converged, 1, jnp.where(bad, 2, 0)).astype(jnp.int32)

            is_first = c["i"] == 0
            first_x = jnp.where(is_first, next_it.x, c["first_x"])
            first_y = jnp.where(is_first, next_it.y, c["first_y"])
            return dict(
                it=next_it,
                carry=carry2,
                counters=counters,
                val=next_val,
                i=c["i"] + 1,
                state=state,
                active=step_i.active_set,
                rcond=step_i.rcond,
                first_x=first_x,
                first_y=first_y,
            )

        init = dict(
            it=orig,
            carry=carry,
            counters=counters,
            val=curr_val,
            i=jnp.zeros((), jnp.int32),
            # derive from varying values so while-loop carry types match
            # under shard_map
            state=jnp.zeros_like(curr_val).astype(jnp.int32),
            active=jnp.zeros_like(orig.x, dtype=bool),
            rcond=jnp.full_like(curr_val, jnp.nan),
            first_x=orig.x,
            first_y=orig.y,
        )
        out = jax.lax.while_loop(cond, body, init)

        success = out["state"] == 1
        lamb_n = jnp.where(success, 0.5 * lamb, 2.0 * lamb)

        return ControlResult(
            out["it"],
            lamb_n,
            success,
            error_sum,
            out["active"],
            out["counters"],
            out["rcond"],
            (out["first_x"], out["first_y"]),
        )

    return step


# ----------------------------------------------------------------------
# Fixed step size controller (reference fixed_control.py)
# ----------------------------------------------------------------------


def _fixed(cfg: ControlCfg):
    params = cfg.params
    emit = _inner_debug(cfg)

    def step(orig: Iterate, lamb, rho, error_sum, counters):
        tau = compute_tau(cfg, orig, lamb, rho)
        carry, counters = cfg.newton_init(orig, lamb, rho, tau, counters)
        step1, _, counters = cfg.newton_step(carry, orig, counters)
        mid_it, counters = _evaluate(cfg, step1.xn, step1.yn, counters)
        if emit is not None:
            func = _unscaled_func(cfg, orig, lamb)
            emit(0, impl.value_norm(func, mid_it, rho, fns=cfg.fns), step1.diff, step1.active_set)
        lamb_n = jnp.zeros_like(lamb) + params.lamb_init
        accepted = lamb_n == lamb_n  # varying True (see distance-ratio note)
        return ControlResult(
            mid_it,
            lamb_n,
            accepted,
            error_sum,
            step1.active_set,
            counters,
            step1.rcond,
            (mid_it.x, mid_it.y),
        )

    return step


def make_controller(cfg: ControlCfg):
    """Factory keyed on StepControlType
    (reference ``step/step_control.py:123-150``)."""
    sct = cfg.params.step_control_type
    if sct == StepControlType.DistanceRatio:
        return _distance_ratio(cfg)
    elif sct == StepControlType.ResiduumRatio:
        return _residuum_ratio(cfg)
    elif sct == StepControlType.Exact:
        return _exact(cfg)
    elif sct == StepControlType.Fixed:
        return _fixed(cfg)
    elif sct == StepControlType.BoxReduced:
        from .box_control import make_box_reduced

        return make_box_reduced(cfg)
    elif sct == StepControlType.Optimizing:
        from .opti_control import make_optimizing

        return make_optimizing(cfg)
    raise ValueError(f"Unknown step control type {sct}")


# ----------------------------------------------------------------------
# compute_step wrapper with failure recovery
# (reference step_control.py:64-107)
# ----------------------------------------------------------------------


def _iterate_finite(it: Iterate):
    leaves = [it.x, it.y, it.obj, it.obj_grad, it.cons, it.cons_jac]
    flags = [jnp.all(jnp.isfinite(leaf)) for leaf in leaves]
    ok = flags[0]
    for f in flags[1:]:
        ok = jnp.logical_and(ok, f)
    return ok


class ComputedStep(NamedTuple):
    """``compute_step`` output: the (recovered) control result plus the
    raw failure evidence the driver's eval diagnostics need — whether the
    candidate was finite, the first evaluated inner candidate, and the
    final *pre-recovery* candidate (the recovered ``ctrl.iterate`` is
    reset to the origin on failure)."""

    ctrl: ControlResult
    eval_ok: Any  # scalar bool: candidate iterate + lambda were finite
    first_x: Any  # first evaluated inner candidate (pre-recovery)
    first_y: Any
    cand_x: Any  # final raw candidate primal (pre-recovery)
    cand_y: Any  # final raw candidate dual (pre-recovery)


def compute_step(cfg: ControlCfg, controller, orig: Iterate, lamb, rho, error_sum, counters):
    """Run the controller; convert non-finite candidates (singular KKT
    factorization, failed evaluation) into a rejected step with doubled
    lambda, mirroring StepSolverError/EvalError recovery."""
    res = controller(orig, lamb, rho, error_sum, counters)

    ok = jnp.logical_and(_iterate_finite(res.iterate), jnp.isfinite(res.lamb))

    def select(good, bad):
        return jax.tree_util.tree_map(
            lambda g, b: jnp.where(ok, g, b), good, bad
        )

    fail = ControlResult(
        iterate=orig,
        lamb=2.0 * lamb,
        accepted=jnp.array(False),
        error_sum=error_sum,
        active_set=res.active_set,
        counters=res.counters,
        rcond=res.rcond,
        first_point=res.first_point,
    )
    return ComputedStep(
        ctrl=select(res, fail),
        eval_ok=ok,
        first_x=res.first_point[0],
        first_y=res.first_point[1],
        cand_x=res.iterate.x,
        cand_y=res.iterate.y,
    )
