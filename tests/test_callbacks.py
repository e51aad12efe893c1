"""Callback tests (mirror of reference ``test_callbacks.py``): the
ComputedStep event fires per iteration and sees the accepted point."""

import numpy as np

from pygradflow_tpu import Params, Solver
from pygradflow_tpu.callbacks import CallbackType

from tests.problems import rosenbrock_instance


def test_computed_step_callback():
    inst = rosenbrock_instance()
    solver = Solver(inst.problem, Params())

    events = []

    def on_step(cur, nxt, accepted):
        events.append((np.asarray(nxt[0]).copy(), bool(accepted)))

    handle = solver.callbacks.register(CallbackType.ComputedStep, on_step)
    result = solver.solve(inst.x_0, inst.y_0)

    assert result.success
    assert len(events) == result.iterations
    accepted = [e for e in events if e[1]]
    assert len(accepted) == result.num_accepted_steps
    # the final accepted candidate is the solution
    np.testing.assert_allclose(accepted[-1][0], result.x, atol=1e-10)

    handle.unregister()


def test_controller_pi_convergence():
    """Generic PI controller steers a toy x' = u plant to the reference
    value (mirror of reference ``test_controller.py``)."""
    from pygradflow_tpu.controller import Controller, ControllerSettings

    settings = ControllerSettings(K_P=0.5, K_I=0.2, lamb_init=0.0, lamb_red=0.5)
    controller = Controller(settings, ref=1.0)

    x = 0.0
    for _ in range(200):
        u = controller.update(x)
        x = x + 0.5 * u

    assert abs(x - 1.0) < 1e-2
