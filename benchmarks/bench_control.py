"""Large optimal-control NLP benchmark (BASELINE config #4).

Solves the discretized pendulum swing-up (``runners/control.py``) at a
size whose KKT systems exceed 1000 rows, comparing linear-solver tiers on
per-iteration KKT time and total solve wall time.

Usage: python benchmarks/bench_control.py [N]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax

    from pygradflow_tpu import LinearSolverType, Params, Solver
    from pygradflow_tpu.runners.control import PendulumControl

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256

    problem = PendulumControl(N=N)
    n = problem.num_vars
    m = problem.num_cons
    print(
        f"pendulum N={N}: n={n} vars, m={m} cons, KKT size {n + m} "
        f"on {jax.devices()[0].platform}",
        file=sys.stderr,
    )

    results = {}
    for tier in ["LU", "LDLT", "PallasLDLT"]:
        params = Params(
            linear_solver_type=LinearSolverType[tier],
            iteration_limit=3000,
            validate_input=False,
        )
        solver = Solver(problem, params)
        x0 = problem.x0_trajectory()

        r = solver.solve(x0)  # includes compile
        t0 = time.perf_counter()
        r = solver.solve(x0)
        wall = time.perf_counter() - t0

        ok = r.status.name == "Optimal"
        per_iter = wall / max(r.iterations, 1) * 1e3
        results[tier] = dict(
            status=r.status.name,
            iterations=r.iterations,
            wall_s=round(wall, 3),
            ms_per_iter=round(per_iter, 2),
        )
        print(f"  {tier:>10s}: {results[tier]}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": f"pendulum-control N={N} (KKT {n + m}) ms/outer-iteration",
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
