"""Measure the reference (chrhansk/pygradflow, CPU) ONCE on the four
BASELINE configurations and cache the numbers in
``benchmarks/artifacts/baseline_reference.json``.

The headline benches (``bench.py``, ``benchmarks/bench_hs.py``,
``bench_control.py``) read this cache instead of re-measuring (or worse,
extrapolating from a small subsample) on every run.

Configs (BASELINE.md):
  1. Rosenbrock — 128 sequential solves, default Params.
  3. HS71       — 64 sequential solves, perturbed clipped starts.
  4. Optimal control — pendulum swing-up N=256 with hand-coded scipy
     sparse derivatives (the reference needs explicit derivatives; this
     is its best case: one sparse SuperLU factorization per iteration).
  KKT microbench — scipy SuperLU factor+solve on random dense KKT
     matrices (the reference's default linear solver) at the bench_kkt
     sizes.

Usage: env PYTHONPATH= python benchmarks/measure_baseline.py
"""

import json
import os
import platform
import sys
import time

import numpy as np

REF = "/root/reference"
ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
OUT = os.path.join(ART, "baseline_reference.json")

sys.path.insert(0, REF)
sys.path.insert(0, os.path.join(REF, "tests/pygradflow"))


def measure_rosenbrock(instances=128):
    import logging

    logging.getLogger("gradflow").setLevel(logging.ERROR)
    from rosenbrock import Rosenbrock as RefRosenbrock

    from pygradflow.params import Params as RefParams
    from pygradflow.solver import Solver as RefSolver

    rng = np.random.default_rng(0)
    x0s = rng.uniform(-1.5, 1.5, size=(instances, 2))

    problem = RefRosenbrock()
    t0 = time.perf_counter()
    n_opt = 0
    for x0 in x0s:
        r = RefSolver(problem, RefParams()).solve(np.asarray(x0), np.array([]))
        n_opt += r.status.name == "Optimal"
    wall = time.perf_counter() - t0
    return {
        "instances": instances,
        "optimal": n_opt,
        "wall_s": wall,
        "solves_per_sec": instances / wall,
    }


def measure_hs71(instances=64):
    from hs71 import HS71 as RefHS71

    from pygradflow.params import Params as RefParams
    from pygradflow.solver import Solver as RefSolver

    rng = np.random.default_rng(1)
    base = np.array([1.0, 5.0, 5.0, 1.0, 0.0])
    lb = np.array([1.0, 1.0, 1.0, 1.0, 0.0])
    ub = np.array([5.0, 5.0, 5.0, 5.0, 10.0])
    x0s = np.clip(base[None, :] + rng.uniform(-0.5, 0.5, size=(instances, 5)), lb, ub)

    problem = RefHS71()
    t0 = time.perf_counter()
    n_opt = 0
    for x0 in x0s:
        r = RefSolver(problem, RefParams()).solve(np.asarray(x0), np.zeros(2))
        n_opt += r.status.name == "Optimal"
    wall = time.perf_counter() - t0
    return {
        "instances": instances,
        "optimal": n_opt,
        "wall_s": wall,
        "solves_per_sec": instances / wall,
    }


def make_ref_pendulum(N=256, h=0.1, u_max=2.5, alpha=1e-2):
    """Reference-API pendulum swing-up with hand-coded sparse derivatives
    (mirrors pygradflow_tpu/runners/control.py::PendulumControl)."""
    import scipy.sparse as sp

    from pygradflow.problem import Problem as RefProblem

    c = 0.2
    n_states = 2 * (N + 1)
    n = n_states + N
    m = 2 * (N + 1)

    class RefPendulum(RefProblem):
        def __init__(self):
            lb = np.full(n, -np.inf)
            ub = np.full(n, np.inf)
            lb[n_states:] = -u_max
            ub[n_states:] = u_max
            super().__init__(lb, ub, num_cons=m)

        @staticmethod
        def _split(z):
            return z[: N + 1], z[N + 1 : n_states], z[n_states:]

        def obj(self, z):
            theta, omega, u = self._split(z)
            return h * (
                np.sum((theta - np.pi) ** 2)
                + 0.1 * np.sum(omega**2)
                + alpha * np.sum(u**2)
            )

        def obj_grad(self, z):
            theta, omega, u = self._split(z)
            return np.concatenate(
                [2 * h * (theta - np.pi), 0.2 * h * omega, 2 * h * alpha * u]
            )

        def cons(self, z):
            theta, omega, u = self._split(z)
            dtheta = theta[1:] - theta[:-1] - h * omega[:-1]
            domega = (
                omega[1:] - omega[:-1] + h * np.sin(theta[:-1]) + h * c * omega[:-1] - h * u
            )
            return np.concatenate([[theta[0], omega[0]], dtheta, domega])

        def cons_jac(self, z):
            theta, _, _ = self._split(z)
            rows, cols, vals = [], [], []

            def add(r, cl, v):
                rows.append(r)
                cols.append(cl)
                vals.append(v)

            add(0, 0, 1.0)          # theta_0
            add(1, N + 1, 1.0)      # omega_0
            for k in range(N):
                r = 2 + k           # dtheta_k
                add(r, k + 1, 1.0)
                add(r, k, -1.0)
                add(r, N + 1 + k, -h)
                r = 2 + N + k       # domega_k
                add(r, N + 1 + k + 1, 1.0)
                add(r, N + 1 + k, -1.0 + h * c)
                add(r, k, h * np.cos(theta[k]))
                add(r, n_states + k, -h)
            return sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()

        def lag_hess(self, z, y):
            theta, _, _ = self._split(z)
            diag = np.concatenate(
                [
                    np.full(N + 1, 2 * h),
                    np.full(N + 1, 0.2 * h),
                    np.full(N, 2 * h * alpha),
                ]
            )
            # curvature of domega_k: d^2/dtheta_k^2 (h sin theta_k) = -h sin
            y_domega = y[2 + N : 2 + 2 * N]
            diag[:N] += -h * np.sin(theta[:N]) * y_domega
            return sp.diags(diag).tocsr()

    x0 = np.concatenate(
        [np.linspace(0.0, np.pi, N + 1), np.zeros(N + 1), np.zeros(N)]
    )
    return RefPendulum(), x0


def measure_control(N=256, repeats=3):
    from pygradflow.params import Params as RefParams
    from pygradflow.solver import Solver as RefSolver

    problem, x0 = make_ref_pendulum(N)
    best = np.inf
    for _ in range(repeats):
        solver = RefSolver(problem, RefParams())
        t0 = time.perf_counter()
        r = solver.solve(x0, np.zeros(problem.num_cons))
        best = min(best, time.perf_counter() - t0)
    return {
        "N": N,
        "num_vars": problem.num_vars,
        "num_cons": problem.num_cons,
        "status": r.status.name,
        "iterations": r.iterations,
        "wall_s": best,
        "ms_per_iter": best / max(r.iterations, 1) * 1e3,
    }


def measure_kkt(sizes=(128, 256, 512, 1024, 2048, 4096), reps=10):
    """scipy SuperLU factor+solve on the bench_kkt matrices."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    rng = np.random.default_rng(0)
    out = {}
    for size in sizes:
        n = int(size * 0.75)
        mm = size - n
        H = rng.standard_normal((n, n))
        K = H @ H.T + n * np.eye(n)
        J = rng.standard_normal((mm, n))
        A = np.block([[K, J.T], [J, -0.1 * np.eye(mm)]])
        b = rng.standard_normal(size)
        Asp = sp.csc_matrix(A)
        spla.splu(Asp).solve(b)  # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            spla.splu(Asp).solve(b)
        out[str(size)] = (time.perf_counter() - t0) / reps * 1e3
    return {"scipy_splu_ms_per_iter": out, "reps": reps}


def main():
    result = {
        "reference": "chrhansk/pygradflow v0.5.24 (/root/reference)",
        "platform": platform.platform(),
        "cpu_count": os.cpu_count(),
    }
    for name, fn in [
        ("rosenbrock", measure_rosenbrock),
        ("hs71", measure_hs71),
        ("control_pendulum", measure_control),
        ("kkt", measure_kkt),
    ]:
        t0 = time.perf_counter()
        result[name] = fn()
        print(f"{name}: {json.dumps(result[name])} "
              f"(measured in {time.perf_counter()-t0:.1f}s)", flush=True)

    os.makedirs(ART, exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
