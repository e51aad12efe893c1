"""Diagnose the lockstep straggler tail of the batched continuous engine.

Runs the exact B=64 perturbed-HS71 sweep of ``bench_integration_batch.py``
through the flat engine and reports the per-lane work-unit distribution
(steps + bisection units), then replays the worst lane through the host
event loop with per-segment accounting, so the grind can be attributed to
a segment / rho rung / event pattern instead of guessed at.

Usage: env PYTHONPATH= python benchmarks/probe_straggler.py   (CPU)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax

    if os.environ.get("PYGRADFLOW_TPU_FORCE_CPU", "1") == "1":
        jax.config.update("jax_platforms", "cpu")

    from pygradflow_tpu import Params
    from pygradflow_tpu.integration import BatchedIntegrationSolver
    from pygradflow_tpu.params import IntegrationMethod

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests")
    )
    from problems import hs71_instance

    inst = hs71_instance()
    rng = np.random.default_rng(7)
    lo = np.array([1.0, 1.0, 1.0, 1.0, 0.0])
    hi = np.array([5.0, 5.0, 5.0, 5.0, 2.0])
    B = 64
    x0s = np.clip(inst.x_0[None, :] + rng.uniform(-0.1, 0.1, size=(B, 5)), lo, hi)
    y0s = np.tile(inst.y_0, (B, 1))

    params = Params(
        iteration_limit=1000,
        rho=1e-2,
        integration_max_steps=50_000,
        integration_method=IntegrationMethod.SDIRK4,
    )
    solver = BatchedIntegrationSolver(inst.problem, params)
    res = solver.solve(x0s, y0s)

    steps = np.asarray(res.num_integration_steps)
    segs = np.asarray(res.iterations)
    newtons = np.asarray(res.num_newton_steps)
    order = np.argsort(steps)[::-1]
    print(f"steps: median={np.median(steps):.0f} max={steps.max()} "
          f"mean={steps.mean():.0f}")
    print("top-8 lanes by steps:")
    for i in order[:8]:
        print(f"  lane {i}: steps={steps[i]} segments={segs[i]} "
              f"newtons={newtons[i]} status={res.status[i]} rho={res.rho[i]:g}")

    # replay the worst lane on the host event loop with per-segment rows
    # (display rows go through the package logger -> route to stdout)
    import logging

    logging.basicConfig(
        level=logging.INFO, format="%(message)s", stream=sys.stdout
    )
    worst = int(order[0])
    print(f"\n--- replaying lane {worst} via host event loop ---")
    from dataclasses import replace

    from pygradflow_tpu.integration import IntegrationSolver

    single = IntegrationSolver(
        inst.problem, replace(params, display=True, display_interval=0.0)
    )
    r = single.solve(x0s[worst], y0s[worst])
    print(f"host loop: status={r.status.name} segments={r.iterations} "
          f"steps={r.num_integration_steps} newtons={r.num_newton_steps}")


if __name__ == "__main__":
    main()
