"""Documentation example (counterpart of the reference
``docs/solve_rosenbrock.py``): solve the 2D Rosenbrock problem and print
the solve report.  Expected: Optimal in 30 iterations (25 accepted),
x ~ (1, 1) — identical counts to the reference docs output."""

import logging

import numpy as np

from pygradflow_tpu import Params, Problem, Solver

logging.basicConfig(level=logging.INFO, format="%(message)s")


class Rosenbrock(Problem):
    def __init__(self):
        super().__init__(np.full(2, -np.inf), np.full(2, np.inf))

    def obj(self, v):
        return (1.0 - v[0]) ** 2 + 100.0 * (v[1] - v[0] ** 2) ** 2


def main():
    problem = Rosenbrock()
    params = Params()

    solver = Solver(problem, params)
    result = solver.solve(np.array([0.0, 0.0]))

    print()
    print(f"Status:     {result.status.name}")
    print(f"Iterations: {result.iterations} ({result.num_accepted_steps} accepted)")
    print(f"Solution:   {result.x}")


if __name__ == "__main__":
    main()
