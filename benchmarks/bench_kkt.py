"""KKT factorize+solve microbenchmark (BASELINE.md secondary metric).

Times one Newton-step KKT cycle (assemble + factor + back-solve) for a
range of system sizes and backends, on whatever accelerator JAX selects;
compares against scipy's SuperLU (the reference default backend) on the
same matrices when scipy is available.

Usage: python benchmarks/bench_kkt.py [sizes...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from pygradflow_tpu.linalg import linear_solver  # noqa: E402
from pygradflow_tpu.params import LinearSolverType  # noqa: E402


def make_kkt(n, m, rng):
    H = rng.standard_normal((n, n))
    K = H @ H.T + n * np.eye(n)
    J = rng.standard_normal((m, n))
    return np.block([[K, J.T], [J, -0.1 * np.eye(m)]])


def time_backend(name, lin, A, b, reps=20):
    fact_solve = jax.jit(lambda A, b: lin.solve(lin.factor(A), b))
    x = fact_solve(A, b)
    jax.block_until_ready(x)

    resid = float(jnp.linalg.norm(A @ x - b) / jnp.linalg.norm(b))

    t0 = time.perf_counter()
    for _ in range(reps):
        x = fact_solve(A, b)
    jax.block_until_ready(x)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"  {name:>12s}: {ms:8.2f} ms/iter   resid {resid:.1e}")
    return ms


def time_scipy(A, b, reps=20):
    try:
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla
    except ImportError:
        return None

    An = np.asarray(A)
    bn = np.asarray(b)
    Asp = sp.csc_matrix(An)

    def fact_solve():
        return spla.splu(Asp).solve(bn)

    fact_solve()
    t0 = time.perf_counter()
    for _ in range(reps):
        fact_solve()
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"  {'scipy-splu':>12s}: {ms:8.2f} ms/iter   (reference default backend)")
    return ms


def main():
    from baseline_cache import load_baseline, write_artifact

    sizes = [int(s) for s in sys.argv[1:]] or [128, 256, 512, 1024]
    rng = np.random.default_rng(0)

    backends = [
        ("lu", LinearSolverType.LU),
        ("ldlt", LinearSolverType.LDLT),
        ("pallas_ldlt", LinearSolverType.PallasLDLT),
    ]

    cached_scipy = (load_baseline("kkt") or {}).get("scipy_splu_ms_per_iter", {})
    rows = []
    for size in sizes:
        n = int(size * 0.75)
        m = size - n
        A = jnp.asarray(make_kkt(n, m, rng))
        b = jnp.asarray(rng.standard_normal(size))
        print(f"KKT size {size} (n={n}, m={m}) on {jax.devices()[0].platform}:")
        row = {"size": size, "n": n, "m": m, "platform": jax.devices()[0].platform}
        for name, lst in backends:
            try:
                lin = linear_solver(lst, symmetric=True)
                row[f"{name}_ms"] = time_backend(name, lin, A, b)
            except Exception as e:
                print(f"  {name:>12s}: FAILED ({str(e)[:60]})")
                row[f"{name}_ms"] = None
        if str(size) in cached_scipy:
            row["scipy_splu_ms"] = cached_scipy[str(size)]
            print(
                f"  {'scipy-splu':>12s}: {row['scipy_splu_ms']:8.2f} ms/iter"
                "   (cached measured baseline)"
            )
        else:
            row["scipy_splu_ms"] = time_scipy(A, b)
        best = min(
            (row[f"{nm}_ms"] for nm, _ in backends if row.get(f"{nm}_ms")),
            default=None,
        )
        if best and row["scipy_splu_ms"]:
            row["speedup_vs_scipy"] = row["scipy_splu_ms"] / best
        rows.append(row)

    out = write_artifact("r2_kkt.json", rows)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
