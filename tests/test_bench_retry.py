"""bench.py outage hardening: the orchestrator retries transient backend
failures in fresh subprocesses and, on persistent failure, still prints a
structured JSON line (exit 0) so the driver's BENCH_r*.json is never empty.

Uses the BENCH_FAIL_INJECT_FILE hook: a file holding an int N makes the
next N inner attempts raise a synthetic "Unable to initialize backend"
error before touching JAX.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(tmp_path, inject_failures, retries, extra_env=None):
    inject = tmp_path / "inject"
    inject.write_text(str(inject_failures))
    env = dict(
        os.environ,
        PYTHONPATH="",  # strip the axon site hook so CPU selection works
        BENCH_PLATFORM="cpu",
        BENCH_FAIL_INJECT_FILE=str(inject),
        BENCH_RETRIES=str(retries),
        BENCH_RETRY_SLEEP="0",
        BENCH_ATTEMPT_TIMEOUT="560",
        BENCH_BATCH="8",
        BENCH_CHUNK="8",
        BENCH_BASELINE_SAMPLE="1",
        BENCH_NO_ARTIFACT="1",  # don't clobber the measured TPU artifact
    )
    env.pop("BENCH_INNER", None)
    env.update(extra_env or {})
    proc = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert lines, proc.stderr[-2000:]
    return json.loads(lines[-1])


def test_persistent_outage_yields_structured_failure(tmp_path):
    payload = _run_bench(tmp_path, inject_failures=99, retries=2)
    assert payload["value"] is None
    assert payload["attempts"] == 2
    assert "Unable to initialize backend" in payload["error"]
    assert payload["unit"] == "solves/sec"
    assert "metric" in payload


def test_transient_outage_retried_to_success(tmp_path):
    payload = _run_bench(tmp_path, inject_failures=1, retries=3)
    assert payload["value"] is not None and payload["value"] > 0
    assert payload["attempts"] == 2  # failed once, succeeded on retry
