"""Runner robustness: per-instance hard timeouts and the parallel mode
(reference kills hung instances via subprocess watchdog,
``runners/runner.py:50-74,107-153``)."""

import csv
import time
import types

import numpy as np
import pytest

from pygradflow_tpu.runners.instance import Instance
from pygradflow_tpu.runners.runner import Runner
from pygradflow_tpu.status import SolverStatus


def _fake_result():
    return types.SimpleNamespace(
        status=SolverStatus.Optimal,
        total_time=0.01,
        iterations=5,
        num_accepted_steps=4,
        final_scaled_obj=1.0,
        final_stat_res=1e-9,
        final_cons_violation=0.0,
        dist_factor=1.0,
    )


class QuickInstance(Instance):
    def __init__(self, name):
        super().__init__(name, 2, 0)

    def solve(self, params):
        return _fake_result()

    def problem(self):
        raise NotImplementedError()

    def x0(self):
        return np.zeros(2)


class HangingInstance(Instance):
    def __init__(self):
        super().__init__("hang", 2, 0)

    def solve(self, params):
        for _ in range(1000):
            time.sleep(0.25)
        return _fake_result()

    def problem(self):
        raise NotImplementedError()

    def x0(self):
        return np.zeros(2)


class MixedRunner(Runner):
    def __init__(self):
        super().__init__("mixed")

    def get_instances(self, args):
        return [QuickInstance("fast1"), HangingInstance(), QuickInstance("fast2")]


def _read_rows(out_dir):
    with open(f"{out_dir}/output.csv") as f:
        return {row["instance"]: row for row in csv.DictReader(f)}


def test_sequential_watchdog_times_out_and_continues(tmp_path):
    out = str(tmp_path / "run")
    MixedRunner().main(["--output", out, "--time_limit", "1.0"])

    rows = _read_rows(out)
    assert set(rows) == {"fast1", "hang", "fast2"}
    assert rows["hang"]["status"] == "timeout"
    assert float(rows["hang"]["total_time"]) == 1.0
    assert rows["fast1"]["status"] == "optimal"
    assert rows["fast2"]["status"] == "optimal"
    assert rows["fast2"]["iterations"] == "5"


@pytest.mark.slow
def test_parallel_mode_hard_kills(tmp_path):
    out = str(tmp_path / "runp")
    MixedRunner().main(
        ["--output", out, "--time_limit", "2.0", "--parallel", "2"]
    )

    rows = _read_rows(out)
    assert set(rows) == {"fast1", "hang", "fast2"}
    assert rows["hang"]["status"] == "timeout"
    assert rows["fast1"]["status"] == "optimal"
    assert rows["fast2"]["status"] == "optimal"


class StartupHangRunner(Runner):
    """Children wedge BEFORE sending the 'started' marker (the spawned
    worker re-derives instances via get_instances, which here hangs in
    child processes only) — simulating an import/compile hang."""

    STARTUP_TIMEOUT = 1.5

    def __init__(self):
        super().__init__("stuckstart")

    def get_instances(self, args):
        import multiprocessing as mp

        if mp.parent_process() is not None:
            time.sleep(60)
        return [QuickInstance("fast1"), QuickInstance("fast2")]


@pytest.mark.slow
def test_parallel_mode_kills_wedged_startup(tmp_path):
    """A child that never reaches 'started' must not block the sweep."""
    out = str(tmp_path / "runs")
    t0 = time.monotonic()
    StartupHangRunner().main(
        ["--output", out, "--time_limit", "2.0", "--parallel", "2"]
    )
    assert time.monotonic() - t0 < 30.0

    rows = _read_rows(out)
    assert set(rows) == {"fast1", "fast2"}
    assert all(row["status"] == "error" for row in rows.values())


def test_csv_schema_unchanged(tmp_path):
    from pygradflow_tpu.runners.runner import FIELDNAMES

    assert FIELDNAMES == [
        "instance",
        "num_vars",
        "num_cons",
        "size",
        "status",
        "total_time",
        "iterations",
        "num_accepted_steps",
        "final_scaled_obj",
        "final_stat_res",
        "final_cons_violation",
        "dist_factor",
    ]
