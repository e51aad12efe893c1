"""Augmented-Lagrangian gradient flow (reference ``integration/flow.py``).

RHS of the projected flow ``z' = (-P ∇_x L_ρ(x,y), c(x))`` and its dense
Jacobian, as pure JAX functions of ``(z, rho)`` plus a boolean free-variable
``filter`` (the restriction mask of reference ``restricted_flow.py``:
pinned variables have their x-velocity zeroed).
"""

from typing import Any, NamedTuple

import jax.numpy as jnp
import numpy as np

from ..eval import Fns
from ..iterate import evaluate_iterate, aug_lag_deriv_xx

EPS = float(np.finfo(np.float64).eps)
XTOL = 4 * EPS
ATOL = 4 * EPS


def isclose(x, y):
    """Tight closeness test (reference ``flow.py:5-7``)."""
    return jnp.isclose(x, y, rtol=XTOL, atol=ATOL)


class FlowCtx(NamedTuple):
    fns: Fns
    lb: Any
    ub: Any

    @property
    def n(self):
        return self.fns.num_vars

    @property
    def m(self):
        return self.fns.num_cons


def split(ctx: FlowCtx, z):
    return z[: ctx.n], z[ctx.n :]


def aug_lag_deriv_x(ctx: FlowCtx, z, rho):
    x, y = split(ctx, z)
    c = ctx.fns.cons(x)
    g = ctx.fns.obj_grad(x)
    J = ctx.fns.cons_jac(x)
    return g + J.T @ (rho * c + y)


def rhs(ctx: FlowCtx, z, rho, filter=None):
    """Flow right-hand side; ``filter`` (bool (n,)) zeroes pinned primal
    velocities (reference ``restricted_flow.py:78-88``)."""
    x, y = split(ctx, z)
    c = ctx.fns.cons(x)
    dx = -aug_lag_deriv_x(ctx, z, rho)
    if filter is not None:
        dx = dx * filter
    return jnp.concatenate([dx, c])


def rhs_jac(ctx: FlowCtx, z, rho, filter=None):
    """Dense Jacobian ``[[-P'H, -P'J^T], [J, 0]]``
    (reference ``restricted_flow.py:98-113``)."""
    x, y = split(ctx, z)
    it = evaluate_iterate(ctx.fns, x, y)
    H = aug_lag_deriv_xx(ctx.fns, it, rho)
    J = it.cons_jac

    top = jnp.concatenate([-H, -J.T], axis=1)
    if filter is not None:
        top = jnp.where(filter[:, None], top, 0.0)
    bot = jnp.concatenate(
        [J, jnp.zeros((ctx.m, ctx.m), dtype=H.dtype)], axis=1
    )
    return jnp.concatenate([top, bot], axis=0)


def rhs_deriv_x(ctx: FlowCtx, z, rho):
    """Time derivative of the x-velocity along the flow
    (reference ``flow.py:118-137``), used for second-order tie-breaks."""
    x, y = split(ctx, z)
    it = evaluate_iterate(ctx.fns, x, y)
    H = aug_lag_deriv_xx(ctx.fns, it, rho)
    J = it.cons_jac
    d_x = aug_lag_deriv_x(ctx, z, rho)
    return H @ d_x - J.T @ it.cons


def residuum(ctx: FlowCtx, z, filter):
    """Norm of the restricted flow at rho=0
    (reference ``restricted_flow.py:123-124``)."""
    return jnp.linalg.norm(rhs(ctx, z, 0.0, filter))


def obj(ctx: FlowCtx, z):
    x, _ = split(ctx, z)
    return ctx.fns.obj(x)
