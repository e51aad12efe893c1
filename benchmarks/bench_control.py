"""Large optimal-control NLP benchmark (BASELINE config #4).

Solves the discretized pendulum swing-up (``runners/control.py``) at a
size whose KKT systems exceed 1000 rows, comparing step/linear-solver
tiers on per-iteration KKT time and total solve wall time.

Tiers:
  - ``LU`` / ``LDLT`` / ``PallasLDLT``: dense full-KKT factorizations on
    the flat ``PendulumControl`` formulation.
  - ``Schur``: block-elimination on ``PendulumControlInterleaved`` whose
    per-stage variable ordering makes the Hessian 3x3-block-diagonal
    (SURVEY §7.5c) — batched LDL^T blocks + dense dual Schur complement.

Usage: python benchmarks/bench_control.py [N]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax

    from pygradflow_tpu import LinearSolverType, Params, Solver, StepSolverType
    from pygradflow_tpu.runners.control import (
        PendulumControl,
        PendulumControlInterleaved,
    )

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256

    flat = PendulumControl(N=N)
    inter = PendulumControlInterleaved(N=N)
    n = flat.num_vars
    m = flat.num_cons
    print(
        f"pendulum N={N}: n={n} vars, m={m} cons, KKT size {n + m} "
        f"on {jax.devices()[0].platform}",
        file=sys.stderr,
    )

    common = dict(iteration_limit=3000, validate_input=False)
    tiers = {
        "LU": (flat, Params(linear_solver_type=LinearSolverType.LU, **common)),
        "LDLT": (flat, Params(linear_solver_type=LinearSolverType.LDLT, **common)),
        "PallasLDLT": (
            flat,
            Params(linear_solver_type=LinearSolverType.PallasLDLT, **common),
        ),
        "Schur": (
            inter,
            Params(
                step_solver_type=StepSolverType.Schur, schur_block_size=3, **common
            ),
        ),
        "Schur+Pallas": (
            inter,
            Params(
                step_solver_type=StepSolverType.Schur,
                schur_block_size=3,
                linear_solver_type=LinearSolverType.PallasLDLT,
                **common,
            ),
        ),
    }

    results = {}
    for tier, (problem, params) in tiers.items():
        solver = Solver(problem, params)
        x0 = problem.x0_trajectory()

        r = solver.solve(x0)  # includes compile
        t0 = time.perf_counter()
        r = solver.solve(x0)
        wall = time.perf_counter() - t0

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
