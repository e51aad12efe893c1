"""BASELINE.md benchmark configurations as correctness tests."""

import jax.numpy as jnp
import numpy as np

from pygradflow_tpu import Params, Solver

from tests.problems import ConstrainedRosenbrock


def test_constrained_rosenbrock():
    """Config #2: box+equality Rosenbrock with active-set changes."""
    problem = ConstrainedRosenbrock()
    result = Solver(problem, Params()).solve(np.array([-1.0, 1.5]), np.array([0.0]))
    assert result.success
    # optimum: on the equality x0 + x1 = 1 with box x0 <= 0.8; the
    # unconstrained constrained-optimum of rosenbrock on the line is
    # cut by the box -> KKT point found by the solver must satisfy both
    x = result.x
    np.testing.assert_allclose(x[0] + x[1], 1.0, atol=1e-6)
    assert x[0] <= 0.8 + 1e-8
    assert float(result.final_stat_res) < 1e-6


def test_pendulum_control():
    """Config #4: discretized optimal-control NLP (block KKT)."""
    from pygradflow_tpu.runners.control import PendulumControl

    problem = PendulumControl(N=16)
    params = Params(iteration_limit=2000)
    result = Solver(problem, params).solve(problem.x0_trajectory())
    assert result.success, result.status
    assert float(result.final_cons_violation) < 1e-6
    assert float(result.final_stat_res) < 1e-6

    # the short horizon (1.6s) cannot fully reach upright; the KKT point
    # swings most of the way
    theta = result.x[: 17]
    assert abs(theta[-1] - np.pi) < 1.2


def test_pendulum_schur_matches_dense():
    """Interleaved ordering: Schur step solver == dense symmetric solver."""
    from pygradflow_tpu import StepSolverType
    from pygradflow_tpu.runners.control import PendulumControlInterleaved

    problem = PendulumControlInterleaved(N=12)
    x0 = problem.x0_trajectory()

    ref = Solver(
        problem, Params(iteration_limit=2000)
    ).solve(x0)
    schur = Solver(
        problem,
        Params(
            iteration_limit=2000,
            step_solver_type=StepSolverType.Schur,
            schur_block_size=3,
        ),
    ).solve(x0)

    assert ref.success and schur.success
    assert schur.iterations == ref.iterations
    np.testing.assert_allclose(schur.x, ref.x, rtol=1e-8, atol=1e-9)
