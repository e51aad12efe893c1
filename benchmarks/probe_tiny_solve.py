"""Microbench: per-op cost of the tiny-system primitives inside one flat
work unit (B=64, n=7 HS71 scale) — XLA TriangularSolve vs unrolled
substitution, rhs eval, rhs_jac, plu_factor, and one full sdirk4_step.

K data-dependent reps inside ONE jitted fori_loop (CLAUDE.md measurement
rules).  Usage (TPU): python benchmarks/probe_tiny_solve.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

K = int(os.environ.get("PROBE_K", 100))
B, N = 64, 7


def chain_ms(fn, x, reps=5):
    import jax

    @jax.jit
    def chain(x):
        def body(_, v):
            w = fn(v)
            # data dependence: fold the result back in, keep shape
            return v + 0.0 * w

        return jax.lax.fori_loop(0, K, body, x)

    jax.block_until_ready(chain(x))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(x))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / K


def main():
    import jax
    import jax.numpy as jnp

    import pygradflow_tpu  # noqa: F401
    from pygradflow_tpu.linalg.plu import (
        PLUFactorization,
        _back_sub,
        _fwd_sub_unit,
        _unpack,
        plu_factor,
        plu_solve,
    )

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((B, N, N)) + 3 * np.eye(N))
    b = jnp.asarray(rng.standard_normal((B, N)))
    fact = jax.jit(plu_factor)(A)

    def solve_xla(v):
        return plu_solve(PLUFactorization(fact.lu + 0.0 * v[..., None], fact.perm), v)

    def solve_sub(v):
        lower, upper = _unpack(
            PLUFactorization(fact.lu + 0.0 * v[..., None], fact.perm)
        )
        z = jnp.take_along_axis(v, fact.perm, axis=-1)
        z = _fwd_sub_unit(lower, z)
        return _back_sub(upper, z)

    print("plu_solve (XLA TriangularSolve):", round(chain_ms(solve_xla, b), 4), "ms")
    print("plu_solve (substitution fori):  ", round(chain_ms(solve_sub, b), 4), "ms")

    def factor_chain(v):
        f = plu_factor(A + 0.0 * v[..., None])
        return v + 0.0 * f.lu[..., 0]

    print("plu_factor (unrolled):          ", round(chain_ms(factor_chain, b), 4), "ms")

    # one full sdirk4_step on the HS71 flow, vmapped over B lanes
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests")
    )
    from problems import hs71_instance

    from pygradflow_tpu import Params
    from pygradflow_tpu.integration import IntegrationSolver
    from pygradflow_tpu.integration import flow as fl
    from pygradflow_tpu.integration.device_loop import _create_filter
    from pygradflow_tpu.integration.integrator import sdirk4_step

    inst = hs71_instance()
    params = Params(rho=1e-2)
    solver = IntegrationSolver(inst.problem, params)
    ctx = solver.ctx
    rtol, atol = params.integration_rtol, params.integration_atol

    x, y = solver.transform.transform_sol(inst.x_0, inst.y_0)
    z1 = jnp.concatenate([x, y])
    filt1 = _create_filter(ctx, solver.lb, solver.ub, z1, 1e-2)
    zB = jnp.tile(z1[None], (B, 1)) + 1e-3 * jnp.asarray(
        rng.standard_normal((B, z1.shape[0]))
    )
    filtB = jnp.tile(filt1[None], (B, 1))

    def step_batch(zv):
        w, ok, its, est = jax.vmap(
            lambda zz, ff: sdirk4_step(
                ctx, zz, 1e-4, 1e-2, ff, rtol, atol, (zz, jnp.zeros(()))
            )
        )(zv, filtB)
        return zv + 0.0 * w

    print("sdirk4_step vmapped B=64:       ", round(chain_ms(step_batch, zB), 4), "ms")

    def rhs_batch(zv):
        r = jax.vmap(lambda zz, ff: fl.rhs(ctx, zz, 1e-2, ff))(zv, filtB)
        return zv + 0.0 * r

    def jac_batch(zv):
        J = jax.vmap(lambda zz, ff: fl.rhs_jac(ctx, zz, 1e-2, ff))(zv, filtB)
        return zv + 0.0 * J[..., 0]

    print("rhs vmapped B=64:               ", round(chain_ms(rhs_batch, zB), 4), "ms")
    print("rhs_jac vmapped B=64:           ", round(chain_ms(jac_batch, zB), 4), "ms")


if __name__ == "__main__":
    main()
