"""Checkpoint/resume: interrupted solves continue bitwise-identically."""

import numpy as np

from pygradflow_tpu import Params, Solver, SolverStatus

from tests.problems import rosenbrock_instance


def test_checkpoint_resume(tmp_path):
    inst = rosenbrock_instance()
    path = str(tmp_path / "state.npz")

    # full uninterrupted solve for reference
    full = Solver(inst.problem, Params()).solve(inst.x_0, inst.y_0)
    assert full.success

    # interrupted run: small chunks + iteration limit to stop mid-solve
    params_a = Params(jit_chunk=4, iteration_limit=12)
    ra = Solver(inst.problem, params_a).solve(
        inst.x_0, inst.y_0, checkpoint_path=path
    )
    assert ra.status == SolverStatus.IterationLimit

    # resume to completion
    params_b = Params(jit_chunk=4)
    rb = Solver(inst.problem, params_b).solve(
        inst.x_0, inst.y_0, checkpoint_path=path, resume=True
    )
    assert rb.success
    # identical final point and total iteration count as the single run
    np.testing.assert_array_equal(rb.x, full.x)
    assert rb.iterations == full.iterations


def test_checkpoint_structure_mismatch_raises(tmp_path):
    """Toggling validate_input between save and restore changes the
    LoopState leaves; restore must fail loudly, not shift leaves."""
    import pytest

    inst = rosenbrock_instance()
    path = str(tmp_path / "state.npz")

    params_a = Params(jit_chunk=4, iteration_limit=8, validate_input=True)
    Solver(inst.problem, params_a).solve(inst.x_0, inst.y_0, checkpoint_path=path)

    params_b = Params(jit_chunk=4, validate_input=False)
    with pytest.raises(ValueError, match="incompatible checkpoint"):
        Solver(inst.problem, params_b).solve(
            inst.x_0, inst.y_0, checkpoint_path=path, resume=True
        )


def test_checkpoint_legacy_positional_load(tmp_path):
    """Pre-versioning snapshots (positional leaf_{i} keys) still restore
    when the leaf count matches the current structure."""
    inst = rosenbrock_instance()
    path = str(tmp_path / "state.npz")
    params = Params(jit_chunk=4, iteration_limit=8)
    Solver(inst.problem, params).solve(inst.x_0, inst.y_0, checkpoint_path=path)

    # rewrite the snapshot in the legacy positional format (npz file order
    # is insertion order = pytree flatten order)
    with np.load(path) as data:
        keys = [k for k in data.files if k != "__format_version__"]
        legacy = {f"leaf_{i}": data[k] for i, k in enumerate(keys)}
    np.savez(path, **legacy)

    resumed = Solver(inst.problem, Params(jit_chunk=4)).solve(
        inst.x_0, inst.y_0, checkpoint_path=path, resume=True
    )
    assert resumed.success
