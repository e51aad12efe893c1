"""Benchmark: batched NLP solves/sec vs the reference PyGradFlow on CPU.

Headline configuration (BASELINE.md #1/#3): a batch of perturbed-start 2D
Rosenbrock instances solved to the default opt_tol=1e-6 KKT residual.
Ours runs the vmapped homotopy loop on the available accelerator (TPU when
present); the baseline is the reference chrhansk/pygradflow solver running
the same instances sequentially on CPU (measured on a subsample and
extrapolated, since the reference takes ~100ms+/instance).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Outage hardening: the TPU tunnel occasionally fails backend init
("Unable to initialize backend 'axon': UNAVAILABLE") or wedges a dispatch;
a failed init can leave the JAX process unusable, so the default entry
point is an *orchestrator* that runs the actual bench in a fresh
subprocess per attempt (BENCH_RETRIES, sleeping BENCH_RETRY_SLEEP seconds
between attempts, each attempt hard-capped at BENCH_ATTEMPT_TIMEOUT).  On
final failure it still prints one structured JSON line naming the outage
and exits 0, so the driver's BENCH_r*.json is never silently empty.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 16384))
BASELINE_SAMPLE = int(os.environ.get("BENCH_BASELINE_SAMPLE", 16))
SEED = 0

# stderr substrings that indicate a transient TPU-tunnel outage (retryable
# with a long sleep) rather than a repo bug
TRANSIENT_PATTERNS = (
    "Unable to initialize backend",
    "UNAVAILABLE",
    "FAILED_PRECONDITION",
    "DEADLINE_EXCEEDED",
    "Socket closed",
    "Connection reset",
)


def _metric_name():
    kind = os.environ.get("BENCH_PRECISION", "Double")
    desc = {
        "Single": "f32, opt_tol=1e-4",
        "Mixed": "mixed f32+f64-polish, opt_tol=1e-6",
    }.get(kind, "opt_tol=1e-6")
    return f"batched Rosenbrock solves/sec (B={BATCH}, {desc})"


def make_starts(batch):
    rng = np.random.default_rng(SEED)
    return rng.uniform(-1.5, 1.5, size=(batch, 2))


def _maybe_inject_failure():
    """Test hook: a file holding an int N makes the next N inner runs fail
    with a synthetic backend-init error (see tests/test_bench_retry.py)."""
    path = os.environ.get("BENCH_FAIL_INJECT_FILE")
    if not path or not os.path.exists(path):
        return
    with open(path) as f:
        remaining = int(f.read().strip() or 0)
    if remaining > 0:
        with open(path, "w") as f:
            f.write(str(remaining - 1))
        raise RuntimeError(
            "Unable to initialize backend 'axon': UNAVAILABLE: injected outage"
        )


def run_ours(x0s):
    import jax

    from pygradflow_tpu import LinearSolverType, Params
    from pygradflow_tpu.parallel import BatchedSolver

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from problems import Rosenbrock

    from pygradflow_tpu import Precision

    kind = os.environ.get("BENCH_PRECISION", "Double")
    # BENCH_COMPACT=0/1 overrides the auto harvest+compaction decision
    compact_env = os.environ.get("BENCH_COMPACT")
    compact = None if compact_env is None else bool(int(compact_env))

    if kind == "Mixed":
        # mixed-precision homotopy (round-5 directive #3): f32 bulk loop
        # to 1e-4 + f64 polish to the real 1e-6 tolerance
        from pygradflow_tpu.parallel import MixedPrecisionSolver

        params = Params(
            validate_input=False,
            linear_solver_type=LinearSolverType[
                os.environ.get("BENCH_LINSOLVER", "LU")
            ],
            jit_chunk=int(os.environ.get("BENCH_CHUNK", 128)),
        )
        solver = MixedPrecisionSolver(Rosenbrock(), params, compact=compact)
    else:
        precision = Precision[kind]
        params = Params(
            validate_input=False,
            linear_solver_type=LinearSolverType[
                os.environ.get("BENCH_LINSOLVER", "LU")
            ],
            jit_chunk=int(os.environ.get("BENCH_CHUNK", 128)),
            precision=precision,
        )
        if precision == Precision.Single:
            # f32 mode: loosened tolerances (reference params.py:210-211
            # notes lamb_min ~1e-6 for single precision)
            params.opt_tol = 1e-4
            params.lamb_min = 1e-6
        solver = BatchedSolver(Rosenbrock(), params, compact=compact)

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


def inner_main():
    """One bench attempt in this process; prints the JSON line on success."""
    _maybe_inject_failure()
    if os.environ.get("BENCH_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    x0s = make_starts(BATCH)

    solves_per_sec, _ = run_ours(x0s)

    try:
        baseline = run_baseline(x0s)
    except Exception:
        baseline = None

    vs = (solves_per_sec / baseline) if baseline else None

    payload = {
        "metric": _metric_name(),
        "value": round(solves_per_sec, 3),
        "unit": "solves/sec",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }
    # BENCH_NO_ARTIFACT: tests drive this script end-to-end at tiny batch
    # sizes (tests/test_bench_retry.py) — they must not clobber the real
    # measured artifact
    if not os.environ.get("BENCH_NO_ARTIFACT"):
        try:
            sys.path.insert(0, os.path.join(os.path.dirname(__file__), "benchmarks"))
            from baseline_cache import write_artifact

            name = {
                "Single": "r5_rosenbrock_f32.json",
                "Mixed": "r5_rosenbrock_mixed.json",
            }.get(os.environ.get("BENCH_PRECISION", "Double"), "r5_rosenbrock.json")
            write_artifact(name, {**payload, "baseline_solves_per_sec": baseline})
        except Exception:
            pass
    print(json.dumps(payload))


def _classify(stderr_tail, timed_out):
    if timed_out:
        return "attempt timed out (wedged dispatch / hung TPU tunnel?)"
    for pat in TRANSIENT_PATTERNS:
        if pat in stderr_tail:
            return f"transient backend outage ({pat})"
    return "bench failure (see detail)"


def orchestrate():
    """Run the bench in fresh subprocesses with retry/backoff; always print
    exactly one JSON line to stdout and exit 0."""
    retries = int(os.environ.get("BENCH_RETRIES", 3))
    sleeps = [
        float(s)
        for s in os.environ.get("BENCH_RETRY_SLEEP", "60,240").split(",")
        if s.strip()
    ] or [60.0]
    attempt_timeout = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT", 1800))

    env = dict(os.environ, BENCH_INNER="1")
    last_tail, timed_out = "", False
    for attempt in range(1, retries + 1):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                timeout=attempt_timeout,
            )
            timed_out = False
            out_lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
            if proc.returncode == 0 and out_lines:
                try:
                    payload = json.loads(out_lines[-1])
                except json.JSONDecodeError:
                    payload = None
                if payload is not None:
                    if attempt > 1:
                        payload["attempts"] = attempt
                    print(json.dumps(payload))
                    return 0
            last_tail = (proc.stderr or "")[-2000:] + (proc.stdout or "")[-500:]
        except subprocess.TimeoutExpired as exc:
            timed_out = True
            last_tail = ((exc.stderr or b"").decode("utf-8", "replace"))[-2000:]

        sys.stderr.write(
            f"[bench] attempt {attempt}/{retries} failed"
            f" ({_classify(last_tail, timed_out)})\n{last_tail}\n"
        )
        if attempt < retries:
            time.sleep(sleeps[min(attempt - 1, len(sleeps) - 1)])

    print(
        json.dumps(
            {
                "metric": _metric_name(),
                "value": None,
                "unit": "solves/sec",
                "vs_baseline": None,
                "error": _classify(last_tail, timed_out),
                "attempts": retries,
                "detail": last_tail[-400:],
            }
        )
    )
    return 0


if __name__ == "__main__":
    if os.environ.get("BENCH_INNER") == "1":
        inner_main()
    else:
        sys.exit(orchestrate())
