"""Sharded scenario sweep (BASELINE config #5): 10k perturbed NLP
instances distributed over the available device mesh with the psum
convergence reduction.

On a single chip the mesh has one device (pure vmap throughput); on a pod
slice the same script shards the batch over ICI unchanged.  Reports
solves/sec and per-device scaling.

Usage: python benchmarks/bench_sweep_sharded.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 10240))


def main():
    import jax

    from pygradflow_tpu import Params
    from pygradflow_tpu.parallel import ShardedSolver
    from pygradflow_tpu.parallel.batch import ParametricProblem

    import jax.numpy as jnp

    class ParamRosenbrock(ParametricProblem):
        def __init__(self):
            super().__init__(
                np.array([-np.inf, -np.inf]),
                np.array([np.inf, np.inf]),
                example_data=(jnp.asarray(1.0), jnp.asarray(100.0)),
            )

        def p_obj(self, v, data):
            a, b = data
            return (a - v[0]) ** 2 + b * (v[1] - v[0] ** 2) ** 2

    devices = jax.devices()
    nd = len(devices)
    B = (BATCH // nd) * nd

    rng = np.random.default_rng(0)
    x0s = rng.uniform(-1.5, 1.5, size=(B, 2))
    a = jnp.asarray(rng.uniform(0.5, 2.0, B))
    b = jnp.asarray(rng.uniform(50.0, 150.0, B))

    solver = ShardedSolver(ParamRosenbrock(), Params(validate_input=False, jit_chunk=128))

    warm = solver.solve(x0s, data=(a, b))
    assert warm.success.all()

    t0 = time.perf_counter()
    res = solver.solve(x0s, data=(a, b))
    elapsed = time.perf_counter() - t0
    assert res.success.all()

    print(
        json.dumps(
            {
                "metric": f"sharded perturbed-NLP sweep solves/sec (B={B}, devices={nd})",
                "value": round(B / elapsed, 3),
                "unit": "solves/sec",
                "per_device": round(B / elapsed / nd, 3),
                "platform": devices[0].platform,
            }
        )
    )


if __name__ == "__main__":
    main()
