"""Benchmark: batched NLP solves/sec vs the reference PyGradFlow on CPU.

Headline configuration (BASELINE.md #1/#3): a batch of perturbed-start 2D
Rosenbrock instances solved to the default opt_tol=1e-6 KKT residual.
Ours runs the vmapped homotopy loop on the available accelerator (TPU when
present); the baseline is the reference chrhansk/pygradflow solver running
the same instances sequentially on CPU (measured on a subsample and
extrapolated, since the reference takes ~100ms+/instance).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 16384))
BASELINE_SAMPLE = int(os.environ.get("BENCH_BASELINE_SAMPLE", 16))
SEED = 0


def make_starts(batch):
    rng = np.random.default_rng(SEED)
    return rng.uniform(-1.5, 1.5, size=(batch, 2))


def run_ours(x0s):
    import jax

    from pygradflow_tpu import LinearSolverType, Params
    from pygradflow_tpu.parallel import BatchedSolver

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from problems import Rosenbrock

    from pygradflow_tpu import Precision

    precision = Precision[os.environ.get("BENCH_PRECISION", "Double")]
    params = Params(
        validate_input=False,
        linear_solver_type=LinearSolverType[os.environ.get("BENCH_LINSOLVER", "LU")],
        jit_chunk=int(os.environ.get("BENCH_CHUNK", 128)),
        precision=precision,
    )
    if precision == Precision.Single:
        # f32 mode: loosened tolerances (reference params.py:210-211 notes
        # lamb_min ~1e-6 for single precision)
        params.opt_tol = 1e-4
        params.lamb_min = 1e-6
    solver = BatchedSolver(Rosenbrock(), params)

    # warmup: populate compile caches with the same shapes
    warm = solver.solve(x0s)
    assert warm.success.all(), "warmup solve failed"

    # min over repeats: single timed runs right after compile can read up
    # to ~2x slow through the TPU tunnel (async compile tail)
    elapsed = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        res = solver.solve(x0s)
        elapsed = min(elapsed, time.perf_counter() - t0)

    assert res.success.all(), "bench solve failed"
    tol = 1e-2 if os.environ.get("BENCH_PRECISION") == "Single" else 1e-4
    assert np.abs(res.x - 1.0).max() < tol

    return x0s.shape[0] / elapsed, res


def run_baseline(x0s):
    """Reference pygradflow sequential-CPU solves/sec: the cached MEASURED
    number (128 instances, benchmarks/measure_baseline.py) when available,
    else measured live on a subsample."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "benchmarks"))
    try:
        from baseline_cache import load_baseline

        cached = load_baseline("rosenbrock")
    except Exception:
        cached = None
    if cached and cached.get("solves_per_sec"):
        return cached["solves_per_sec"]

    ref_path = "/root/reference"
    if not os.path.isdir(ref_path):
        return None

    import logging

    logging.getLogger("gradflow").setLevel(logging.ERROR)
    sys.path.insert(0, ref_path)
    sys.path.insert(0, os.path.join(ref_path, "tests/pygradflow"))
    from rosenbrock import Rosenbrock as RefRosenbrock  # noqa: E501

    from pygradflow.params import Params as RefParams
    from pygradflow.solver import Solver as RefSolver

    sample = x0s[:BASELINE_SAMPLE]
    problem = RefRosenbrock()

    t0 = time.perf_counter()
    for x0 in sample:
        result = RefSolver(problem, RefParams()).solve(np.asarray(x0), np.array([]))
        assert result.status.name == "Optimal"
    elapsed = time.perf_counter() - t0

    return sample.shape[0] / elapsed


def main():
    x0s = make_starts(BATCH)

    solves_per_sec, _ = run_ours(x0s)

    try:
        baseline = run_baseline(x0s)
    except Exception:
        baseline = None

    vs = (solves_per_sec / baseline) if baseline else None

    payload = {
        "metric": (
            f"batched Rosenbrock solves/sec (B={BATCH}, "
            + (
                "f32, opt_tol=1e-4"
                if os.environ.get("BENCH_PRECISION") == "Single"
                else "opt_tol=1e-6"
            )
            + ")"
        ),
        "value": round(solves_per_sec, 3),
        "unit": "solves/sec",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "benchmarks"))
        from baseline_cache import write_artifact

        name = (
            "r2_rosenbrock_f32.json"
            if os.environ.get("BENCH_PRECISION") == "Single"
            else "r2_rosenbrock.json"
        )
        write_artifact(name, {**payload, "baseline_solves_per_sec": baseline})
    except Exception:
        pass
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
