"""Probe: run the continuous engine at the reference's TRUE tolerances.

The reference's solve_ivp call (integration_solver.py:278-285) passes no
rtol/atol, so scipy's defaults apply: rtol=1e-3, atol=1e-6.  Our
integrator defaults (1e-6/1e-9) are 1000x tighter.  This probe measures
segment sequences / step counts / solutions at the matched tolerances on
HS71 and Tame (host + device loop, TR-BDF2 + SDIRK4) and the B=64
perturbed flat-engine sweep, to decide whether the defaults should match
the reference.

Usage: env PYTHONPATH= python benchmarks/probe_tol.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from pygradflow_tpu import Params
    from pygradflow_tpu.integration import (
        BatchedIntegrationSolver,
        IntegrationSolver,
    )
    from pygradflow_tpu.params import IntegrationMethod

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests")
    )
    from problems import hs71_instance, tame_instance

    for rtol, atol, tag in [(1e-6, 1e-9, "tight(current)"), (1e-3, 1e-6, "scipy-default")]:
        print(f"=== tolerances {tag}: rtol={rtol:g} atol={atol:g} ===")
        for pname, inst in [("hs71", hs71_instance()), ("tame", tame_instance())]:
            for method in (IntegrationMethod.SDIRK4, IntegrationMethod.TRBDF2):
                for dev in (False, True):
                    p = Params(
                        iteration_limit=1000,
                        rho=1e-2,
                        integration_method=method,
                        integration_rtol=rtol,
                        integration_atol=atol,
                        integration_device_loop=dev,
                    )
                    s = IntegrationSolver(inst.problem, p)
                    r = s.solve(inst.x_0, inst.y_0)
                    xerr = float(np.max(np.abs(np.asarray(r.x) - inst.x_opt)))
                    rho_f = float(r.rho) if r.rho is not None else float("nan")
                    print(
                        f"  {pname:5s} {method.name:8s} {'dev' if dev else 'host'} "
                        f"status={r.status.name:12s} segs={r.iterations:3d} "
                        f"steps={r.num_integration_steps:5d} rho={rho_f:g} "
                        f"xerr={xerr:.2e}"
                    )

    # batched perturbed sweep at the matched tolerances
    inst = hs71_instance()
    rng = np.random.default_rng(7)
    lo = np.array([1.0, 1.0, 1.0, 1.0, 0.0])
    hi = np.array([5.0, 5.0, 5.0, 5.0, 2.0])
    B = 64
    x0s = np.clip(inst.x_0[None, :] + rng.uniform(-0.1, 0.1, size=(B, 5)), lo, hi)
    y0s = np.tile(inst.y_0, (B, 1))
    p = Params(
        iteration_limit=1000,
        rho=1e-2,
        integration_max_steps=50_000,
        integration_method=IntegrationMethod.SDIRK4,
        integration_rtol=1e-3,
        integration_atol=1e-6,
    )
    solver = BatchedIntegrationSolver(inst.problem, p)
    res = solver.solve(x0s, y0s)
    steps = np.asarray(res.num_integration_steps)
    print(
        f"\nB=64 scipy-default tols: optimal={int(res.success.sum())}/64 "
        f"steps median={np.median(steps):.0f} max={steps.max()} "
        f"newtons max={np.asarray(res.num_newton_steps).max()}"
    )


if __name__ == "__main__":
    main()
