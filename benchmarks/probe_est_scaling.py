"""What pins the step size in the stiff creep — error estimate or Newton?

This probe drives a perturbed HS71 lane to the rho=1e6 creep segment
(eagerly, mirroring probe_creep.py), then scans h over 6 decades from
one fixed state and prints err_ratio(h) + Newton success for SDIRK4 and
TR-BDF2.

MEASURED ANSWER (round 4): the embedded estimate scales fine and stays
TINY far past the working h (1.4e-4 at h=78 where the controller sat at
h~30) — the limiter is the NEWTON BASIN: stage Newtons fail from h~20
upward at this state, while scipy-BDF's Newton (5th-order polynomial
predictor through real step history) converges at h in the thousands,
which is why the reference crosses the same creep in ~190 steps.

A 4-candidate backtracking (damped) Newton in the escalation path was
tried against this diagnosis and measured WORSE on the B=64
distribution (TR-BDF2 fell to 51/64 optimal, SDIRK4's p90 tripled):
damping lets marginal steps "succeed" into bad states whose next steps
grind, trading a clean fail-retry-halve dynamic for a sloppy-success
one.  The remaining fix consistent with the data is BDF-style
CROSS-STEP stage predictors (carry polynomial history through the
engine state) — left as future work.

Usage: env PYTHONPATH= python benchmarks/probe_est_scaling.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pygradflow_tpu import Params
    from pygradflow_tpu.integration import IntegrationSolver
    from pygradflow_tpu.integration import events as ev
    from pygradflow_tpu.integration import flow as fl
    from pygradflow_tpu.integration.device_loop import _create_filter
    from pygradflow_tpu.integration.integrator import (
        _scaled_norm,
        sdirk4_step,
        trbdf2_step,
    )

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests")
    )
    from problems import hs71_instance

    rng = np.random.default_rng(7)
    lo = np.array([1.0, 1.0, 1.0, 1.0, 0.0])
    hi = np.array([5.0, 5.0, 5.0, 5.0, 2.0])
    x0s = np.clip(
        np.array([1.0, 5.0, 5.0, 1.0, 0.0])[None, :]
        + rng.uniform(-0.1, 0.1, size=(64, 5)),
        lo,
        hi,
    )

    inst = hs71_instance()
    params = Params(iteration_limit=1000, rho=1e-2)
    solver = IntegrationSolver(inst.problem, params)
    ctx = solver.ctx
    rtol, atol = params.integration_rtol, params.integration_atol

    # jit once — eager sdirk4_step calls re-lower thousands of ops each
    # (measured: LLVM OOM after a few hundred eager steps)
    sdirk4_jit = jax.jit(
        lambda z, h, rho, filt: sdirk4_step(ctx, z, h, rho, filt, rtol, atol)
    )
    trbdf2_jit = jax.jit(
        lambda z, h, rho, filt: trbdf2_step(ctx, z, h, rho, filt, rtol, atol)
    )

    # advance eagerly (SDIRK4, coarse events) until rho reaches 1e6, then
    # take ~50 more accepted steps into the creep
    x, y = solver.transform.transform_sol(x0s[36], np.zeros(2))
    z = jnp.concatenate([x, y])
    rho = params.rho
    filt = _create_filter(ctx, solver.lb, solver.ub, z, rho)
    cfg = solver.cfg
    h = 1e-4
    creep_steps = 0
    for _ in range(4000):
        grad_dirs = ev.grad_event_dirs(ctx, z, filt, solver.lb, solver.ub)
        dirs = ev.event_directions(cfg, filt, grad_dirs)
        vals = ev.event_values(cfg, z, rho, filt, grad_dirs)
        w, ok, its, est = sdirk4_jit(z, jnp.asarray(h, z.dtype), rho, filt)
        err = float(_scaled_norm(est, w, rtol, atol))
        accept = bool(ok) and err <= 1.0
        if accept:
            new_vals = ev.event_values(cfg, w, rho, filt, grad_dirs)
            crossed = np.asarray(ev.crossings(vals, new_vals, dirs))
            if crossed.any():
                idx = int(np.argmax(crossed))
                n = ctx.n
                if idx == 3 * n:  # convergence
                    break
                if idx == 3 * n + 2:  # penalty
                    rho *= 10.0
                    filt = _create_filter(ctx, solver.lb, solver.ub, w, rho)
                    h = 1e-4
                elif idx < 2 * n:
                    filt = filt.at[idx % n].set(False)
                    h = 1e-4
                elif idx < 3 * n:
                    filt = filt.at[idx - 2 * n].set(True)
                    h = 1e-4
                z = w
                continue
            z = w
            if rho >= 1e6:
                creep_steps += 1
                if creep_steps >= 50:
                    break
        factor = 0.9 * err ** (-0.25) if err > 0 else 10.0
        if not bool(ok):
            factor = 0.5
        h = max(min(h * factor, h * 10.0), 1e-14)

    res = float(fl.residuum(ctx, z, filt))
    print(f"creep state: rho={rho:g} res={res:.3e} h={h:.3g} "
          f"(50 accepted creep steps taken)")

    print(f"{'h':>12s} {'SDIRK4 err':>12s} {'ok':>3s} {'TRBDF2 err':>12s} {'ok':>3s}")
    for hh in np.logspace(np.log10(max(h / 100, 1e-6)), np.log10(h * 1e4), 11):
        w4, ok4, _, est4 = sdirk4_jit(z, jnp.asarray(hh, z.dtype), rho, filt)
        e4 = float(_scaled_norm(est4, w4, rtol, atol))
        w2, ok2, _, est2 = trbdf2_jit(z, jnp.asarray(hh, z.dtype), rho, filt)
        e2 = float(_scaled_norm(est2, w2, rtol, atol))
        print(f"{hh:12.4g} {e4:12.4g} {str(bool(ok4)):>3s} "
              f"{e2:12.4g} {str(bool(ok2)):>3s}")


if __name__ == "__main__":
    main()
