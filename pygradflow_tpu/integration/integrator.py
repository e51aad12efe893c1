"""Adaptive implicit integrator for the stiff restricted flow.

The reference integrates with scipy's BDF + analytic Jacobian + scipy event
root-finding (``integration_solver.py:278-285``).  The TPU-native engine is
a self-contained adaptive implicit-Euler integrator with step-doubling
error control, fully jit-compiled: each accepted step performs three Newton
solves (one full step, two half steps) against the dense flow Jacobian
(pure-JAX PLU), the local error estimate adapts ``h``, and the event vector
is evaluated per accepted step so a whole integration *segment* (advance
until any event crossing) runs as one ``lax.while_loop`` on device.  Event
times are then refined by host-driven bisection re-using the jitted
single-step kernel (the reference likewise re-enters Python per event).
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..linalg.plu import plu_factor, plu_solve
from . import events as ev
from . import flow as fl

NEWTON_MAX_IT = 8
NEWTON_TOL_FACTOR = 1e-3  # relative to the step error tolerance


def _scaled_norm(v, ref, rtol, atol):
    """scipy-style rms norm with per-component scale atol + rtol*|ref|."""
    scale = atol + rtol * jnp.abs(ref)
    r = v / scale
    return jnp.sqrt(jnp.mean(r * r))


def implicit_euler_step(ctx, z, h, rho, filter, rtol, atol):
    """One implicit-Euler step: solve w = z + h f(w) by Newton with the
    dense Jacobian; returns (w, converged).  Error control is
    per-component (scipy-style), so small components (duals, constraint
    values) are resolved to atol rather than to rtol*||z||."""

    def newton_body(carry):
        w, i, err = carry
        g = w - z - h * fl.rhs(ctx, w, rho, filter)
        Jf = fl.rhs_jac(ctx, w, rho, filter)
        n_all = g.shape[0]
        A = jnp.eye(n_all, dtype=g.dtype) - h * Jf
        dw = plu_solve(plu_factor(A), g)
        w = w - dw
        return (w, i + 1, _scaled_norm(dw, w, rtol, atol))

    def newton_cond(carry):
        _, i, err = carry
        return jnp.logical_and(i < NEWTON_MAX_IT, err > NEWTON_TOL_FACTOR)

    w0 = z + h * fl.rhs(ctx, z, rho, filter)  # explicit predictor
    (w, _, err) = jax.lax.while_loop(
        newton_cond, newton_body, (w0, jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf, z.dtype))
    )
    ok = jnp.logical_and(err <= 1.0, jnp.all(jnp.isfinite(w)))
    return w, ok


class SegmentResult(NamedTuple):
    t_prev: Any
    z_prev: Any
    t: Any
    z: Any
    h: Any
    crossed: Any  # bool vector over events (crossing within last step)
    status: Any  # 0 = event, 1 = reached t_end, 2 = step failure/underflow
    num_steps: Any
    num_newton: Any


def make_segment_runner(cfg: ev.EventCfg, rtol=1e-6, atol=1e-9, max_steps=300_000):
    """Build the jitted segment integrator for a fixed event configuration."""
    ctx = cfg.ctx

    def step_with_error(z, h, rho, filter):
        w_full, ok1 = implicit_euler_step(ctx, z, h, rho, filter, rtol, atol)
        w_half, ok2 = implicit_euler_step(ctx, z, 0.5 * h, rho, filter, rtol, atol)
        w_two, ok3 = implicit_euler_step(ctx, w_half, 0.5 * h, rho, filter, rtol, atol)

        err_ratio = _scaled_norm(w_two - w_full, w_two, rtol, atol)

        ok = jnp.logical_and(ok1, jnp.logical_and(ok2, ok3))
        accept = jnp.logical_and(ok, err_ratio <= 1.0)

        # Richardson extrapolation of the step-doubled solution: locally
        # second order, with the first-order difference as error estimate
        w_acc = 2.0 * w_two - w_full

        factor = jnp.where(err_ratio > 0.0, 0.9 * err_ratio**-0.5, 5.0)
        factor = jnp.clip(factor, 0.2, 5.0)
        factor = jnp.where(ok, factor, 0.5)

        return w_acc, accept, factor

    def run(t0, z0, h0, rho, filter, grad_dirs, t_end):
        dirs = ev.event_directions(cfg, filter, grad_dirs)
        vals0 = ev.event_values(cfg, z0, rho, filter, grad_dirs)

        init = dict(
            t_prev=t0,
            z_prev=z0,
            t=t0,
            z=z0,
            h=h0,
            vals=vals0,
            crossed=jnp.zeros_like(vals0, dtype=bool),
            status=jnp.zeros_like(t0).astype(jnp.int32) - 1,  # -1 = running
            steps=jnp.zeros((), jnp.int32),
            newtons=jnp.zeros((), jnp.int32),
        )

        def cond(c):
            return c["status"] == -1

        def body(c):
            h = jnp.minimum(c["h"], t_end - c["t"])
            w, accept, factor = step_with_error(c["z"], h, rho, filter)

            new_vals = ev.event_values(cfg, w, rho, filter, grad_dirs)
            crossed = ev.crossings(c["vals"], new_vals, dirs)
            any_crossed = jnp.any(crossed)

            t_new = c["t"] + h
            h_new = jnp.maximum(c["h"] * factor, 1e-14)

            # status transitions
            status = jnp.where(
                jnp.logical_and(accept, any_crossed),
                0,
                jnp.where(
                    jnp.logical_and(accept, t_new >= t_end),
                    1,
                    jnp.where(
                        jnp.logical_or(
                            c["steps"] >= max_steps, h <= 1e-13 * jnp.maximum(1.0, c["t"])
                        ),
                        2,
                        -1,
                    ),
                ),
            ).astype(jnp.int32)

            return dict(
                t_prev=jnp.where(accept, c["t"], c["t_prev"]),
                z_prev=jnp.where(accept, c["z"], c["z_prev"]),
                t=jnp.where(accept, t_new, c["t"]),
                z=jnp.where(accept, w, c["z"]),
                h=h_new,
                vals=jnp.where(accept, new_vals, c["vals"]),
                crossed=jnp.where(accept, crossed, c["crossed"]),
                status=status,
                steps=c["steps"] + 1,
                newtons=c["newtons"] + 3 * NEWTON_MAX_IT,
            )

        out = jax.lax.while_loop(cond, body, init)
        return SegmentResult(
            t_prev=out["t_prev"],
            z_prev=out["z_prev"],
            t=out["t"],
            z=out["z"],
            h=out["h"],
            crossed=out["crossed"],
            status=out["status"],
            num_steps=out["steps"],
            num_newton=out["newtons"],
        )

    step_fn = jax.jit(
        lambda z, h, rho, filter: implicit_euler_step(
            ctx, z, h, rho, filter, rtol, atol
        )
    )
    return jax.jit(run), step_fn


def bisect_event(cfg, step_fn, run_vals, t_prev, z_prev, t_cur, rho, filter, grad_dirs, max_bisect=50):
    """Host-driven bisection: shrink the event bracket [t_prev, t_cur] by
    taking single implicit-Euler steps from ``z_prev``; returns the refined
    (t, z, crossed) at the post-crossing side."""
    import numpy as np

    dirs = ev.event_directions(cfg, filter, grad_dirs)
    vals_prev = run_vals(z_prev)

    t_lo, z_lo = float(t_prev), z_prev
    t_hi = float(t_cur)
    z_hi = None  # state at t_hi computed lazily

    for _ in range(max_bisect):
        if t_hi - t_lo <= 1e-12 * max(1.0, abs(t_hi)):
            break
        t_mid = 0.5 * (t_lo + t_hi)
        h = t_mid - t_lo
        z_mid, ok = step_fn(z_lo, h, rho, filter)
        if not bool(ok):
            break
        vals_mid = run_vals(z_mid)
        crossed = ev.crossings(vals_prev, vals_mid, dirs)
        if bool(jnp.any(crossed)):
            t_hi = t_mid
            z_hi = z_mid
        else:
            t_lo, z_lo = t_mid, z_mid
            vals_prev = vals_mid

    if z_hi is None:
        # take a final step to the end of the bracket
        z_hi, _ = step_fn(z_lo, t_hi - t_lo, rho, filter)

    vals_hi = run_vals(z_hi)
    crossed = ev.crossings(vals_prev, vals_hi, dirs)
    return t_hi, z_hi, crossed
