"""Phase-level profile of one outer iteration on the pendulum control
problem: times the Schur factor, the Schur solve, and a full outer
iteration as K data-dependent repetitions inside ONE jit (the only
reliable methodology through the TPU tunnel: every dispatch pays ~30 ms
of round-trip latency that would swamp the phases being measured).

Usage: python benchmarks/profile_control.py [N] [dual]
  dual: 'pallas' (dense Pallas dual factor, default) or 'bcr'
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

K = 10


def chain_ms(name, step, init, reps=3):
    import jax

    @jax.jit
    def run(x0):
        return jax.lax.fori_loop(0, K, lambda i, x: step(x), x0)

    out = jax.block_until_ready(run(init))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(init))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<44s}{best * 1e3 / K:9.3f} ms/op")
    return out


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from pygradflow_tpu import LinearSolverType, Params, StepSolverType
    from pygradflow_tpu.iterate import evaluate_iterate
    from pygradflow_tpu.runners.control import PendulumControlInterleaved
    from pygradflow_tpu.solver import Solver

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    dual = sys.argv[2] if len(sys.argv) > 2 else "pallas"
    prob = PendulumControlInterleaved(N=N)
    params = Params(
        step_solver_type=StepSolverType.Schur,
        schur_block_size=3,
        schur_dual_block_size=2 if dual == "bcr" else None,
        linear_solver_type=LinearSolverType.PallasLDLT,
        iteration_limit=3000,
        validate_input=False,
    )
    solver = Solver(prob, params)
    loop = solver._loop
    fns = loop.fns
    x0, y0 = solver.transform.create_transformed_initial(
        prob.x0_trajectory(), None
    )
    n, m = loop.n, loop.m
    print(f"N={N} dual={dual}: n={n} m={m} on {jax.devices()[0].platform}",
          file=sys.stderr)

    it = jax.jit(lambda x, y: evaluate_iterate(fns, x, y))(x0, y0)
    H = jax.jit(fns.lag_hess)(x0, y0)
    J = jax.jit(fns.cons_jac)(x0)

    # isolated Schur factor / solve at this size
    from pygradflow_tpu.linalg import linear_solver
    from pygradflow_tpu.step.schur import schur_def
    import pygradflow_tpu.implicit_func as impl

    lin = linear_solver(LinearSolverType.PallasLDLT, symmetric=True)
    sdef = schur_def(lin, False, 3, dual_block=2 if dual == "bcr" else None)
    func = impl.make_step_func(
        it, jnp.asarray(1.0, H.dtype), loop.lb, loop.ub, scaled=True
    )
    active = jnp.zeros((n,), bool)
    rho = jnp.asarray(params.rho, H.dtype)

    fact = chain_ms(
        f"schur factor (incl {m}x{m} dual)",
        lambda f: sdef.factor(func, H + 0.0 * f.fact.jac_masked[0, 0], J, active, rho),
        sdef.factor(func, H, J, active, rho),
    )
    chain_ms(
        "schur solve",
        lambda s: sdef.solve(fact, func, it, rho + 0.0 * s[0])[0],
        jnp.zeros((n,), H.dtype),
    )

    state = jax.block_until_ready(loop._init_state(x0, y0))
    chain_ms("run_iteration (full outer step)", loop.run_iteration, state)
