"""Example: batched and sharded instance sweeps.

Solves a batch of perturbed Rosenbrock instances in lockstep with the
vmapped solver (one chip), then the same batch sharded over every
available device with the psum convergence reduction.
"""

import numpy as np

from pygradflow_tpu import Params
from pygradflow_tpu.parallel import BatchedSolver, ShardedSolver
from pygradflow_tpu.parallel.batch import ParametricProblem

import jax.numpy as jnp


class ParamRosenbrock(ParametricProblem):
    """Rosenbrock with per-instance (a, b) coefficients — the optimum of
    each instance is (a, a^2)."""

    def __init__(self):
        super().__init__(
            np.array([-np.inf, -np.inf]),
            np.array([np.inf, np.inf]),
            example_data=(jnp.asarray(1.0), jnp.asarray(100.0)),
        )

    def p_obj(self, v, data):
        a, b = data
        return (a - v[0]) ** 2 + b * (v[1] - v[0] ** 2) ** 2


def main():
    import jax

    rng = np.random.default_rng(0)
    B = 64
    x0s = rng.uniform(-1.0, 1.0, size=(B, 2))
    a = jnp.asarray(rng.uniform(0.5, 2.0, B))
    b = jnp.asarray(rng.uniform(50.0, 150.0, B))

    problem = ParamRosenbrock()

    res = BatchedSolver(problem, Params()).solve(x0s, data=(a, b))
    print(f"batched: {res.success.mean():.0%} optimal, "
          f"max |x - (a, a^2)| = "
          f"{np.abs(res.x[:, 0] - np.asarray(a)).max():.2e}")

    nd = len(jax.devices())
    if nd > 1 and B % nd == 0:
        res = ShardedSolver(problem, Params()).solve(x0s, data=(a, b))
        print(f"sharded over {nd} devices: {res.success.mean():.0%} optimal")


if __name__ == "__main__":
    main()
