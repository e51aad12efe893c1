"""Where does the batched continuous engine's wall-clock go?

Round-4 verdict weak #2 asked which term dominates the flat engine's
batched wall: per-work-unit cost (loop-iteration latency floors through
the TPU tunnel) or the lockstep critical path (max work units over
lanes).  This runs the B=64 perturbed-HS71 sweep (same instances as
``bench_integration_batch.py``), reads the per-lane ``units`` counter the
flat state carries, and reports the split:

    wall  =  max_lane_units x ms_per_unit  +  dispatch overhead

Usage (TPU): python benchmarks/probe_flat_cost.py [batch]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64


def main():
    import jax

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
    x0s = np.clip(
        inst.x_0[None, :] + rng.uniform(-0.1, 0.1, size=(BATCH, 5)), lo, hi
    )
    y0s = np.tile(inst.y_0, (BATCH, 1))

    params = Params(
        iteration_limit=1000,
        rho=1e-2,
        integration_max_steps=50_000,
        integration_method=IntegrationMethod.SDIRK4,
    )
    solver = BatchedIntegrationSolver(inst.problem, params)

    # instrumented replay of BatchedIntegrationSolver.solve: same chunked
    # compaction driver, but track dispatches and per-lane unit counts
    import jax.numpy as jnp

    solver.solve(x0s, y0s)  # warm the compile caches (all tiers)

    states = solver._init(jnp.asarray(x0s), jnp.asarray(y0s))
    t0 = time.perf_counter()
    dispatches = 0
    max_units = 0
    sum_units = 0.0
    lanes_done_units = []
    active = np.arange(BATCH)
    from pygradflow_tpu.status import RUNNING

    _MIN_TIER = 8
    while active.size:
        L = int(active.size)
        tier = max(_MIN_TIER, 1 << (L - 1).bit_length())
        if tier > L:
            pad = tier - L
            states = {
                k: jnp.concatenate([v, jnp.repeat(v[:1], pad, axis=0)], axis=0)
                for k, v in states.items()
            }
            states["status"] = states["status"].at[L:].set(99)
        states = solver._chunk_for(tier)(states)
        dispatches += 1
        status = np.asarray(states["status"][:L])
        units = np.asarray(states["units"][:L])
        done = np.where(status != RUNNING)[0]
        if done.size:
            lanes_done_units.extend(units[done].tolist())
            keep = np.where(status == RUNNING)[0]
            active = active[keep]
            if active.size:
                kd = jnp.asarray(keep)
                states = {k: v[kd] for k, v in states.items()}
        else:
            states = {k: v[:L] for k, v in states.items()}
    wall = time.perf_counter() - t0

    lanes = np.array(lanes_done_units)
    max_units = int(lanes.max())
    payload = {
        "batch": BATCH,
        "wall_s": round(wall, 3),
        "dispatches": dispatches,
        "units_max": max_units,
        "units_median": float(np.median(lanes)),
        "units_p90": float(np.percentile(lanes, 90)),
        "ms_per_critical_unit": round(wall * 1e3 / max_units, 3),
        "note": "ms_per_critical_unit folds in dispatch overhead; "
        "critical path = units_max (lockstep freezes finished lanes)",
    }
    print(json.dumps(payload), flush=True)


if __name__ == "__main__":
    main()
