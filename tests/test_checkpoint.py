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
