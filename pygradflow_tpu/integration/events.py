"""Event functions of the restricted flow, vectorized.

The reference builds one Python closure per event for scipy's ``solve_ivp``
(``integration/problem_switches.py``); here all events are a single
fixed-size vector function evaluated at every accepted integrator step —
static shapes under jit, crossings detected by directional sign changes
between steps.

Layout (size 3n + 3):
    [0:n)    lower-bound crossings   x_j - lb_j      (free j, finite lb; dir -1)
    [n:2n)   upper-bound crossings   x_j - ub_j      (free j, finite ub; dir +1)
    [2n:3n)  pinned-gradient flips   (-grad L)_j     (pinned j; dir +1 at lb,
                                                      -1 at ub)
    [3n]     convergence             residuum - opt_tol        (any dir)
    [3n+1]   unboundedness           obj - obj_lower_limit     (any dir)
    [3n+2]   penalty criterion       <rhs, grad L>             (dir +1)

Inactive slots hold the constant 1.0 so they never cross.
"""

from typing import Any, NamedTuple

import jax.numpy as jnp

from . import flow as fl

EV_CONVERGED = "converged"


class EventCfg(NamedTuple):
    ctx: Any  # FlowCtx
    opt_tol: float
    obj_lower_limit: float
    active_tol: float = 1e-8
    """Deadband for pinned-gradient release events: a pinned variable is
    released only once its inward gradient exceeds this tolerance.  Without
    it, near-degenerate bounds (multiplier ~ 0 during dual convergence)
    produce Zeno-like pin/release chatter that stalls the event loop; the
    reference sidesteps this with exact scipy roots plus 4*eps closeness
    guards (``flow.py:20-43``), which the discrete crossing test here does
    not reproduce."""


def num_events(n: int) -> int:
    return 3 * n + 3


def event_values(cfg: EventCfg, z, rho, filter, grad_dirs):
    """Evaluate the event vector.  ``grad_dirs`` (n,) holds the direction
    (+1/-1/0) of each pinned-gradient event, computed at segment start."""
    ctx = cfg.ctx
    n = ctx.n
    x, y = fl.split(ctx, z)

    finite_lb = jnp.isfinite(ctx.lb)
    finite_ub = jnp.isfinite(ctx.ub)

    lb_vals = jnp.where(
        jnp.logical_and(filter, finite_lb), x - jnp.where(finite_lb, ctx.lb, 0.0), 1.0
    )
    ub_vals = jnp.where(
        jnp.logical_and(filter, finite_ub), x - jnp.where(finite_ub, ctx.ub, 0.0), 1.0
    )

    neg_grad = -fl.aug_lag_deriv_x(ctx, z, rho)
    # deadband in the release direction (see EventCfg); grows with rho
    # because gradient noise at a pinned variable scales like
    # rho * (integration error of c)
    deadband = cfg.active_tol * (1.0 + rho)
    grad_vals = jnp.where(
        grad_dirs != 0.0, neg_grad - deadband * grad_dirs, 1.0
    )

    conv = fl.residuum(ctx, z, filter) - cfg.opt_tol
    unb = fl.obj(ctx, z) - cfg.obj_lower_limit

    r = fl.rhs(ctx, z, rho, filter)
    aug_dx = fl.aug_lag_deriv_x(ctx, z, rho)
    c = ctx.fns.cons(x)
    penalty = jnp.dot(r[:n], aug_dx) + jnp.dot(r[n:], c)

    return jnp.concatenate(
        [lb_vals, ub_vals, grad_vals, jnp.stack([conv, unb, penalty])]
    )


def event_directions(cfg: EventCfg, filter, grad_dirs):
    """Per-event crossing direction (+1, -1, or 0 = any)."""
    n = cfg.ctx.n
    lb_dirs = jnp.full((n,), -1.0)
    ub_dirs = jnp.full((n,), 1.0)
    tail = jnp.array([0.0, 0.0, 1.0])
    return jnp.concatenate([lb_dirs, ub_dirs, grad_dirs, tail])


def crossings(prev_vals, cur_vals, directions):
    """Directional sign-change detection between two accepted steps."""
    down = jnp.logical_and(prev_vals > 0.0, cur_vals <= 0.0)
    up = jnp.logical_and(prev_vals < 0.0, cur_vals >= 0.0)
    any_cross = jnp.logical_or(down, up)
    crossed = jnp.where(
        directions < 0.0, down, jnp.where(directions > 0.0, up, any_cross)
    )
    return crossed


def grad_event_dirs(ctx, z, filter, lb, ub):
    """Directions of the pinned-gradient events: a variable pinned at its
    lower bound is released when its negative gradient turns positive
    (dir +1), at the upper bound when it turns negative (dir -1); equal
    bounds never release (reference ``problem_switches.py:150-162``)."""
    x, _ = fl.split(ctx, z)
    at_lb = fl.isclose(x, lb)
    at_ub = fl.isclose(x, ub)
    both = jnp.logical_and(at_lb, at_ub)
    pinned = jnp.logical_not(filter)

    dirs = jnp.where(at_lb, 1.0, jnp.where(at_ub, -1.0, 0.0))
    dirs = jnp.where(jnp.logical_and(pinned, jnp.logical_not(both)), dirs, 0.0)
    return dirs
