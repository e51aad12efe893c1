"""Batched HS-suite sweep (BASELINE config #3): 1k perturbed HS71
instances per chip via the vmapped solver, vs the reference solving a
subsample sequentially on CPU.

Usage: python benchmarks/bench_hs.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 1024))
BASELINE_SAMPLE = int(os.environ.get("BENCH_BASELINE_SAMPLE", 8))


def make_starts(batch):
    rng = np.random.default_rng(1)
    base = np.array([1.0, 5.0, 5.0, 1.0, 0.0])
    lb = np.array([1.0, 1.0, 1.0, 1.0, 0.0])
    ub = np.array([5.0, 5.0, 5.0, 5.0, 10.0])
    pert = rng.uniform(-0.5, 0.5, size=(batch, 5))
    return np.clip(base[None, :] + pert, lb, ub)


def run_ours(x0s):
    from pygradflow_tpu import Params
    from pygradflow_tpu.parallel import BatchedSolver

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from problems import HS71

    solver = BatchedSolver(
        HS71(), Params(validate_input=False, jit_chunk=128)
    )
    y0s = np.zeros((x0s.shape[0], 2))

    warm = solver.solve(x0s, y0s)
    # min over repeats: single timed runs right after compile can read up
    # to ~2x slow through the TPU tunnel (async compile tail)
    elapsed = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        res = solver.solve(x0s, y0s)
        elapsed = min(elapsed, time.perf_counter() - t0)

    frac = res.success.mean()
    return x0s.shape[0] / elapsed, frac


def run_baseline(x0s):
    from baseline_cache import load_baseline

    cached = load_baseline("hs71")
    if cached and cached.get("solves_per_sec"):
        return cached["solves_per_sec"]

    ref = "/root/reference"
    if not os.path.isdir(ref):
        return None
    import logging

    logging.getLogger("gradflow").setLevel(logging.ERROR)
    sys.path.insert(0, ref)
    sys.path.insert(0, os.path.join(ref, "tests/pygradflow"))
    from hs71 import HS71 as RefHS71

    from pygradflow.params import Params as RefParams
    from pygradflow.solver import Solver as RefSolver

    sample = x0s[:BASELINE_SAMPLE]
    t0 = time.perf_counter()
    ok = 0
    for x0 in sample:
        r = RefSolver(RefHS71(), RefParams()).solve(np.asarray(x0), np.zeros(2))
        ok += r.status.name == "Optimal"
    elapsed = time.perf_counter() - t0
    return sample.shape[0] / elapsed


def main():
    x0s = make_starts(BATCH)
    solves_per_sec, frac = run_ours(x0s)
    try:
        baseline = run_baseline(x0s)
    except Exception:
        baseline = None

    payload = {
        "metric": f"batched HS71 solves/sec (B={BATCH})",
        "value": round(solves_per_sec, 3),
        "unit": "solves/sec",
        "success_fraction": round(float(frac), 4),
        "vs_baseline": round(solves_per_sec / baseline, 3) if baseline else None,
        "baseline_solves_per_sec": baseline,
    }
    from baseline_cache import write_artifact

    write_artifact("r2_hs.json", payload)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
