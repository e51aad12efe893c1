"""Example: constrained solve with display, checkpointing and the
continuous-flow engine.

HS71 (Hock-Schittkowski 71): nonlinear objective, one inequality and one
equality constraint, variable bounds.
"""

import logging

import jax.numpy as jnp
import numpy as np

from pygradflow_tpu import Params, Problem, Solver
from pygradflow_tpu.integration import IntegrationSolver

logging.basicConfig(level=logging.INFO, format="%(message)s")


class HS71(Problem):
    def __init__(self):
        super().__init__(
            var_lb=np.ones(4),
            var_ub=np.full(4, 5.0),
            cons_lb=np.array([25.0, 40.0]),
            cons_ub=np.array([np.inf, 40.0]),
        )

    def obj(self, x):
        return x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2]

    def cons(self, x):
        return jnp.array([jnp.prod(x), jnp.dot(x, x)])


def main():
    problem = HS71()
    x0 = np.array([1.0, 5.0, 5.0, 1.0])

    # discrete implicit-Euler homotopy with live display
    params = Params(display=True)
    result = Solver(problem, params).solve(x0, checkpoint_path="/tmp/hs71.npz")
    print(f"\nSolver:            {result.status.name}  x = {result.x}")

    # continuous flow with event detection
    result = IntegrationSolver(problem, Params(rho=1e-2)).solve(x0)
    print(f"IntegrationSolver: {result.status.name}  x = {result.x}")


if __name__ == "__main__":
    main()
