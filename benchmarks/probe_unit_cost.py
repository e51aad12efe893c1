"""Decompose the flat engine's per-work-unit cost (B=64 HS71).

Times, on the real chip:
- the bare vmapped sdirk4_step (real data dependence, no DCE),
- the flat-loop chunk at budget K vs budget 1 from the same mid-solve
  state -> marginal ms/unit without dispatch overhead,
- event_values / _transition-scale helpers.

Usage (TPU): python benchmarks/probe_unit_cost.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

B = 64


def timed(fn, *args, reps=5):
    import jax

    out = jax.block_until_ready(fn(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, out


def main():
    import jax
    import jax.numpy as jnp

    from pygradflow_tpu import Params
    from pygradflow_tpu.integration.batch import BatchedIntegrationSolver
    from pygradflow_tpu.integration import events as ev, flow as fl
    from pygradflow_tpu.integration.integrator import sdirk4_step
    from pygradflow_tpu.params import IntegrationMethod
    from pygradflow_tpu.status import RUNNING

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests")
    )
    from problems import hs71_instance

    inst = hs71_instance()
    params = Params(
        iteration_limit=1000,
        rho=1e-2,
        integration_max_steps=50_000,
        integration_method=IntegrationMethod.SDIRK4,
        integration_chunk=64,
    )
    rng = np.random.default_rng(7)
    lo = np.array([1.0, 1.0, 1.0, 1.0, 0.0])
    hi = np.array([5.0, 5.0, 5.0, 5.0, 2.0])
    x0s = np.clip(
        inst.x_0[None, :] + rng.uniform(-0.1, 0.1, size=(B, 5)), lo, hi
    )
    y0s = np.tile(inst.y_0, (B, 1))

    solver = BatchedIntegrationSolver(inst.problem, params)
    states = solver._init(jnp.asarray(x0s), jnp.asarray(y0s))

    # advance to a mid-solve state (all lanes running, past the initial
    # transient) with a few chunk dispatches
    chunk1 = jax.jit(lambda s: jax.vmap(lambda q: solver._chunk_fn(q, 64))(s))
    for _ in range(3):
        states = chunk1(states)
    states = jax.block_until_ready(states)
    running = int(np.sum(np.asarray(states["status"]) == RUNNING))
    print("running lanes at probe state:", running, flush=True)

    # marginal per-unit cost: budget K vs 1 from the SAME state
    chunks = {}
    for K in (1, 64):
        chunks[K] = jax.jit(
            lambda s, K=K: jax.vmap(lambda q: solver._chunk_fn(q, K))(s)
        )
        jax.block_until_ready(chunks[K](states))
    tK, _ = timed(chunks[64], states)
    t16 = None
    t1, _ = timed(chunks[1], states)
    print(f"chunk(64): {tK:.2f} ms   chunk(1): {t1:.2f}", flush=True)
    print(f"marginal ms/unit (64 vs 1): {(tK - t1) / 63:.3f}")

    # bare step kernel with real data dependence (carry w back in)
    ctx = solver.inner.ctx
    rtol, atol = params.integration_rtol, params.integration_atol
    filt = states["filter"]
    rho = states["rho"]
    hgrid = states["h"]

    @jax.jit
    def step_chain(z):
        def body(_, zz):
            w, ok, its, est = jax.vmap(
                lambda z1, f1, r1, h1: sdirk4_step(
                    ctx, z1, h1, r1, f1, rtol, atol, (z1, jnp.zeros(()))
                )
            )(zz, filt, rho, hgrid)
            # real dependence: average back in (keeps values bounded-ish)
            return 0.5 * zz + 0.5 * w

        return jax.lax.fori_loop(0, 64, body, z)

    t_step, _ = timed(step_chain, states["z"])
    print(f"bare sdirk4_step ms/unit: {t_step / 64:.3f}")

    grad_dirs = states["grad_dirs"]

    @jax.jit
    def ev_chain(z):
        def body(_, zz):
            vals = jax.vmap(
                lambda z1, r1, f1, g1: ev.event_values(solver.inner.cfg, z1, r1, f1, g1)
            )(zz, rho, filt, grad_dirs)
            return zz + 1e-30 * jnp.sum(vals)

        return jax.lax.fori_loop(0, 64, body, z)

    t_ev, _ = timed(ev_chain, states["z"])
    print(f"event_values ms/eval: {t_ev / 64:.3f}")


if __name__ == "__main__":
    main()
