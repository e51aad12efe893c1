"""Eager per-step trace of the SDIRK4 segment loop on a grinding lane.

probe_straggler.py showed perturbed-HS71 lanes taking ~2700 steps at
rho=1e6 where the reference's scipy-BDF takes ~190 on the SAME instance.
This replica of ``make_segment_runner.body`` + the host driver's event
application runs eagerly (CPU) and prints the h / err_ratio / newton
trajectory per segment, so the step-size limiter can be identified
(truncation error? Newton failures? estimator noise floor?).

Event times are taken at the crossing step without bisection refinement —
close enough to the real driver for step-count diagnosis.

Usage: env PYTHONPATH= python benchmarks/probe_creep.py [lane]
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
    from pygradflow_tpu.integration.integrator import _scaled_norm, sdirk4_step
    from pygradflow_tpu.params import IntegrationMethod

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests")
    )
    from problems import hs71_instance

    lane = int(sys.argv[1]) if len(sys.argv) > 1 else 36
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
    params = Params(
        iteration_limit=1000, rho=1e-2,
        integration_method=IntegrationMethod.SDIRK4,
    )
    solver = IntegrationSolver(inst.problem, params)
    ctx, fns, lb, ub = solver.ctx, solver.fns, solver.lb, solver.ub
    cfg = solver.cfg
    rtol, atol = params.integration_rtol, params.integration_atol

    step = jax.jit(
        lambda z, h, rho, filt, hz, hh: sdirk4_step(
            ctx, z, h, rho, filt, rtol, atol, (hz, hh)
        )
    )
    residuum = jax.jit(fl.residuum, static_argnums=0)

    x, y = solver.transform.transform_sol(x0s[lane], np.zeros(2))
    z = jnp.concatenate([x, y])
    rho = params.rho
    filt = _create_filter(ctx, lb, ub, z, rho)
    t, h = 0.0, 1e-4
    n = ctx.n

    seg = 0
    total = 0
    while seg < 40:
        res = float(fl.residuum(ctx, z, filt))
        if res <= params.opt_tol:
            print(f"CONVERGED res={res:.2e} total steps={total}")
            break
        grad_dirs = ev.grad_event_dirs(ctx, z, filt, lb, ub)
        dirs = ev.event_directions(cfg, filt, grad_dirs)
        vals = ev.event_values(cfg, z, rho, filt, grad_dirs)
        seg += 1
        print(f"--- segment {seg}: rho={rho:g} res={res:.3e} "
              f"free={int(np.sum(np.asarray(filt)))}")
        steps = 0
        h = 1e-4
        h_cap = np.inf
        hist = []
        hist_z, hist_h = z, 0.0
        while steps < 30000:
            w, ok, its, est = step(z, h, rho, filt, hist_z, hist_h)
            err_ratio = float(_scaled_norm(est, w, rtol, atol))
            accept = bool(ok) and err_ratio <= 1.0
            new_vals = ev.event_values(cfg, w, rho, filt, grad_dirs)
            crossed = np.asarray(ev.crossings(vals, new_vals, dirs))
            steps += 1
            total += 1
            hist.append((h, err_ratio, int(its), accept))
            factor = 0.9 * err_ratio ** (-0.25) if err_ratio > 0 else 10.0
            factor = min(max(factor, 0.2), 10.0)
            if not bool(ok):
                factor = 0.5
            h_cap = h_cap * 1.3 if bool(ok) else 0.7 * h
            if accept and crossed.any():
                idx = int(np.argmax(crossed))
                kind = ("pin" if idx < 2 * n else
                        "rel" if idx < 3 * n else
                        "conv" if idx == 3 * n else
                        "unb" if idx == 3 * n + 1 else "pen")
                print(f"    event {kind} after {steps} steps at t={t + h:.4g}")
                z = w
                t += h
                break
            if accept:
                hist_z, hist_h = z, h
                z, t = w, t + h
                vals = new_vals
            h = max(min(h * factor, h_cap), 1e-14)
        # per-segment summary: quartiles of h and err_ratio, newton load
        hs = np.array([x[0] for x in hist])
        ers = np.array([x[1] for x in hist])
        its_ = np.array([x[2] for x in hist])
        acc = np.array([x[3] for x in hist])
        print(f"    steps={steps} accept%={100 * acc.mean():.0f} "
              f"h: med={np.median(hs):.3g} max={hs.max():.3g} "
              f"err_ratio: med={np.median(ers):.3g} p90={np.percentile(ers, 90):.3g} "
              f"newton/step: med={np.median(its_):.0f} max={its_.max()}")
        if kind == "conv":
            print(f"CONVERGED at segment {seg}, total steps={total}")
            break
        if kind == "pen":
            rho *= 10.0
            filt = _create_filter(ctx, lb, ub, z, rho)
        elif kind == "pin":
            filt = filt.at[idx % n].set(False)
        elif kind == "rel":
            filt = filt.at[idx - 2 * n].set(True)


if __name__ == "__main__":
    main()
