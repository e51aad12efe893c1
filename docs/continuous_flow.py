"""Documentation example: the continuous-flow (ODE/event) engine —
counterpart of the reference's ``IntegrationSolver`` demo usage.

Solves HS71 three ways and prints segment/step accounting:

1. host event loop (the reference-shaped driver; scipy-BDF there, our
   jitted adaptive TR-BDF2/SDIRK4 here),
2. device-resident loop (the whole event-driven solve — segments,
   bisection, filter/penalty switches — as ONE dispatch; 20-119x the
   reference's wall-clock on its own test problems, RESULTS.md),
3. a lockstep batch of perturbed starts on one chip (use
   ``ShardedIntegrationSolver`` for a device mesh).

Expected: Optimal, 10 segments with rho escalating 1e-2 -> 1e6 under the
default TR-BDF2 (identical event sequence to the reference); 9 segments
under SDIRK4 (converges before the final penalty rung).
"""

import jax.numpy as jnp
import numpy as np

from pygradflow_tpu import IntegrationMethod, Params, Problem
from pygradflow_tpu.integration import (
    BatchedIntegrationSolver,
    IntegrationSolver,
)


class HS71(Problem):
    def __init__(self):
        super().__init__(
            np.array([1.0, 1.0, 1.0, 1.0, 0.0]),
            np.array([5.0, 5.0, 5.0, 5.0, np.inf]),
            num_cons=2,
        )

    def obj(self, x):
        xx = x[:-1]
        return xx[0] * xx[3] * (xx[0] + xx[1] + xx[2]) + xx[2]

    def cons(self, x):
        # product >= 25 via an explicit slack (book formulation), sum = 40.
        # NOTE: written exactly like the reference fixture (jnp.prod /
        # jnp.dot) — an algebraically equal but differently-ordered
        # product rounds differently, and near an event threshold that
        # flips a borderline crossing into a different (equally optimal,
        # one-segment-longer) trajectory
        xx = x[:-1]
        return jnp.array(
            [jnp.prod(xx) - x[-1] - 25.0, jnp.dot(xx, xx) - 40.0]
        )


def main():
    x0 = np.array([1.0, 5.0, 5.0, 1.0, 0.0])
    y0 = np.zeros(2)
    problem = HS71()

    for label, params in [
        ("host loop / TR-BDF2", Params(rho=1e-2, iteration_limit=1000)),
        (
            "device loop / SDIRK4",
            Params(
                rho=1e-2,
                iteration_limit=1000,
                integration_method=IntegrationMethod.SDIRK4,
                integration_device_loop=True,
            ),
        ),
    ]:
        result = IntegrationSolver(problem, params).solve(x0, y0)
        print(
            f"{label:22s} {result.status.name}: "
            f"{result.iterations} segments, "
            f"{result.num_integration_steps} steps, x = {result.x}"
        )

    # lockstep batch of perturbed starts (SDIRK4: the straggler-robust
    # choice — see PARITY.md's residual-envelope note)
    rng = np.random.default_rng(0)
    x0s = np.clip(
        x0[None, :] + rng.uniform(-0.1, 0.1, size=(8, 5)),
        np.array([1.0, 1.0, 1.0, 1.0, 0.0]),
        np.array([5.0, 5.0, 5.0, 5.0, 2.0]),
    )
    batch = BatchedIntegrationSolver(
        problem,
        Params(
            rho=1e-2,
            iteration_limit=1000,
            integration_method=IntegrationMethod.SDIRK4,
        ),
    ).solve(x0s, np.tile(y0, (8, 1)))
    print(
        f"batched B=8            {int(batch.success.sum())}/8 optimal, "
        f"segments {sorted(set(batch.iterations.tolist()))}"
    )


if __name__ == "__main__":
    main()
