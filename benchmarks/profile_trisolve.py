"""Micro-profile of dual-Schur factor/solve primitives at a given size,
measured as K data-dependent repetitions INSIDE one jitted fori_loop —
the only reliable methodology through the TPU tunnel, where every
dispatch pays a ~30 ms round trip that otherwise swamps sub-ms ops.

Usage: python benchmarks/profile_trisolve.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

K = 20


def chain_ms(name, step, init, reps=5):
    """Time x -> step(x) iterated K times inside one jit; report per-step
    device ms (the single dispatch RTT is measured separately by a
    zero-work chain and subtracted)."""
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
    ms = best * 1e3 / K
    print(f"{name:<44s}{ms:9.3f} ms/op")
    return ms, out


def unit_lower_inv(L, base=256):
    """Inverse of a unit lower-triangular matrix by recursive 2x2 block
    partition — GEMMs only (no TriangularSolve).  Base case: Newton-Schulz
    X <- X (2I - L X), exact after ceil(log2(base)) steps for unit
    triangular (the residual is the strictly-lower part to the 2^k).
    Only sound when ||tril(L,-1)|| is moderate (true for factors of
    lambda-regularized KKT systems; NOT for random triangular matrices)."""
    import jax.numpy as jnp

    n = L.shape[-1]
    if n <= base:
        eye = jnp.eye(n, dtype=L.dtype)
        X = 2.0 * eye - L
        k = max(1, int(np.ceil(np.log2(max(n, 2)))))
        for _ in range(k - 1):
            X = X @ (2.0 * eye - L @ X)
        return X
    h = n // 2
    Ai = unit_lower_inv(L[..., :h, :h], base)
    Ci = unit_lower_inv(L[..., h:, h:], base)
    B = L[..., h:, :h]
    low = -Ci @ (B @ Ai)
    z = jnp.zeros(L.shape[:-2] + (h, n - h), L.dtype)
    top = jnp.concatenate([Ai, z], axis=-1)
    bot = jnp.concatenate([low, Ci], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2050
    rng = np.random.default_rng(0)
    Ln = np.tril(rng.standard_normal((n, n)) * 0.1, -1) + np.eye(n)
    L = jnp.asarray(Ln, jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    An = rng.standard_normal((n, n))
    An = An @ An.T + n * np.eye(n)
    A = jnp.asarray(An, jnp.float32)

    print(f"n={n} on {jax.devices()[0].platform}, K={K} chained reps",
          file=sys.stderr)

    chain_ms("noop (RTT floor / K)", lambda x: x + 1.0, jnp.zeros(()))

    chain_ms(
        f"XLA TriangularSolve {n} (1 rhs)",
        lambda x: jsl.solve_triangular(L, x, lower=True, unit_diagonal=True),
        b,
    )
    chain_ms(
        f"XLA TriangularSolve {n} ({n} rhs)",
        lambda X: jsl.solve_triangular(L, X, lower=True, unit_diagonal=True),
        A,
    )
    chain_ms(f"GEMV {n}", lambda x: L @ x, b)
    chain_ms(f"GEMM {n}x{n}", lambda X: 0.5 * (L @ X), A)
    chain_ms(
        f"unit_lower_inv {n} (recursive GEMM)",
        lambda X: unit_lower_inv(L + 0.0 * X[0, 0]),
        jnp.zeros_like(L),
    )
    chain_ms(f"XLA Cholesky {n}", lambda X: jnp.linalg.cholesky(A + 0.0 * X[0, 0]), A)

    from pygradflow_tpu.linalg.pallas_ldlt import pallas_ldlt_factor_f32

    if n <= 1280:
        chain_ms(
            f"Pallas VMEM LDLT {n}",
            lambda X: pallas_ldlt_factor_f32(A + 0.0 * X[0, 0]),
            jnp.zeros_like(A),
        )
    from pygradflow_tpu.linalg.two_level_ldlt import ldlt_factor_two_level

    chain_ms(
        f"two-level LDLT {n}",
        lambda X: ldlt_factor_two_level(A + 0.0 * X[0, 0]),
        jnp.zeros_like(A),
    )
