"""On-TPU verification + benchmark of the two-level LDL^T factorization.

Run on the real chip (no PYTHONPATH tricks).  For each size:

- factors a quasi-definite saddle matrix with the two-level path and with
  the XLA-blocked f32 reference, compares lower triangles,
- checks the f64 refine_solve residual,
- reports the guard's residual probe,
- times both paths (min over repeats — single timed runs right after
  compile read ~2x slow through the tunnel, CLAUDE.md).

Emits one JSON line per size to stdout and (with --out) a JSON artifact.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def saddle(n, m, rng):
    H = rng.standard_normal((n - m, n - m))
    K = H @ H.T + (n - m) * np.eye(n - m)
    J = rng.standard_normal((m, n - m))
    return np.block([[K, J.T], [J, -0.1 * np.eye(m)]])


def timeit(fn, repeats=7):
    import jax

    fn()  # compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", type=int, nargs="+", default=[3072, 4096, 6144])
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument(
        "--no-ref",
        action="store_true",
        help="skip the XLA-blocked reference factor (slow to compile/run "
        "at the largest sizes); correctness is then judged by the "
        "residual probe and the refined solve only",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import pygradflow_tpu  # noqa: F401  (enables x64 + compile cache)
    from pygradflow_tpu.linalg.blocked_ldlt import ldlt_factor_blocked
    from pygradflow_tpu.linalg.ldlt import ldlt_num_neg_eigvals
    from pygradflow_tpu.linalg.pallas_ldlt import refine_solve
    from pygradflow_tpu.linalg.two_level_ldlt import (
        guard_factor,
        ldlt_factor_residual,
        ldlt_factor_two_level,
    )

    rng = np.random.default_rng(3)
    records = []

    for n in args.sizes:
        m = n // 4
        A = saddle(n, m, rng)
        A32 = jnp.asarray(A, dtype=jnp.float32)
        A64 = jnp.asarray(A, dtype=jnp.float64)

        two = jax.jit(lambda x: ldlt_factor_two_level(x))
        ref = jax.jit(lambda x: ldlt_factor_blocked(x))

        f_two = jax.block_until_ready(two(A32))

        if args.no_ref:
            max_rel = None
        else:
            f_ref = jax.block_until_ready(ref(A32))
            tril_two = np.tril(np.asarray(f_two))
            tril_ref = np.tril(np.asarray(f_ref))
            scale = np.abs(tril_ref).max()
            max_rel = float(np.abs(tril_two - tril_ref).max() / scale)

        # independent O(n^3) reconstruction cross-check in host f64 —
        # does not rely on the residual probe or any on-chip arithmetic,
        # so a silent Mosaic miscompile cannot vouch for itself
        P = np.asarray(f_two, dtype=np.float64)
        L = np.tril(P, -1) + np.eye(n)
        recon = (L * np.diag(P)[None, :]) @ L.T
        recon_rel = float(
            np.abs(recon - np.asarray(A32, dtype=np.float64)).max()
            / np.abs(A).max()
        )

        inertia_ok = int(ldlt_num_neg_eigvals(f_two)) == m
        probe = float(ldlt_factor_residual(f_two, A32))
        guarded = guard_factor(f_two, A32)
        guard_pass = bool(jnp.all(jnp.isfinite(jnp.tril(guarded))))

        b = jnp.asarray(rng.standard_normal(n))
        x = refine_solve(f_two, A64, b)
        solve_res = float(jnp.linalg.norm(A64 @ x - b) / jnp.linalg.norm(b))

        t_two = timeit(lambda: two(A32))
        t_ref = None if args.no_ref else timeit(lambda: ref(A32))

        rec = {
            "n": n,
            "m": m,
            "max_rel_vs_xla": max_rel,
            "recon_rel_f64": recon_rel,
            "inertia_ok": inertia_ok,
            "guard_probe": probe,
            "guard_pass": guard_pass,
            "refine_solve_relres": solve_res,
            "two_level_ms": t_two * 1e3,
            "xla_blocked_ms": None if t_ref is None else t_ref * 1e3,
            "speedup": None if t_ref is None else t_ref / t_two,
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(records, f, indent=1)


if __name__ == "__main__":
    main()
