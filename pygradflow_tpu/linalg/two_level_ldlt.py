"""Two-level blocked LDL^T: Pallas diagonal blocks + XLA GEMM trailing updates.

Breaks the n=2048 ceiling of the HBM-streaming Pallas kernel (which
miscompiles silently at n>=3072 on this Mosaic toolchain, see
``pallas_ldlt_hbm.py``).  Instead of one monolithic kernel, the matrix is
factored super-block by super-block:

for each SB-wide super-block k (SB = 1024 by default):
    A[k,k]  -> packed LDL^T        via the *verified* VMEM Pallas kernel
    A[k+1:, k] = P                 panel below the diagonal block
    X  = P L_kk^{-T}               one XLA f32 TriangularSolve (MXU-tiled)
    L[k+1:, k] = X D_k^{-1}        column scaling
    A[k+1:, k+1:] -= X D_k^{-1} X^T   one XLA f32 GEMM (MXU)

The super-block loop is Python-static (n=8192 -> 8 iterations), so every
slice has a static shape and XLA sees a handful of specialized GEMMs; the
O(n^3) work is split between the verified Pallas kernel (diagonal blocks)
and XLA's own MXU-tiled GEMM/TriangularSolve — no Mosaic code runs at any
size that has not been bit-verified.

Output uses the same packed convention as ``ldlt.py`` (strict lower = L,
diagonal = D; upper triangle = leftovers), so ``ldlt_solve``,
``ldlt_num_neg_eigvals`` and the f64 ``refine_solve`` work unchanged.

``jax.vmap`` reaches the batched Pallas path through the kernel's
``custom_vmap`` rule; TriangularSolve and GEMM batch natively.

Maps the reference's large sparse indefinite factorizations
(MA57/MUMPS, ``linear_solver/ma57_solver.py:27-49``) for the regime where
dense KKT cost actually explodes.
"""

import functools

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

DEFAULT_SUPER_BLOCK = 1024
# ceiling of the VMEM-resident Pallas kernel — adaptive super-block sizing
# may pick any SB up to this
MAX_SUPER_BLOCK = 1280


@functools.partial(
    jax.jit, static_argnames=("super_block", "block", "interpret")
)
def ldlt_factor_two_level(
    mat,
    super_block: int | None = None,
    block: int = 128,
    interpret: bool = False,
):
    """Packed f32 LDL^T factor of an (n, n) symmetric matrix (batched
    leading dims supported via vmap of the Pallas diagonal factor).

    ``super_block=None`` picks the smallest block count whose SB fits the
    VMEM kernel and sizes SB to minimize identity padding: n=2050 becomes
    2x1025 (pad 0) instead of 3x1024 (pad to 3072, 3.4x the FLOPs) —
    padding costs cubically."""
    from .pallas_ldlt import pallas_ldlt_factor_f32

    mat = mat.astype(jnp.float32)
    n = mat.shape[-1]

    if super_block is None:
        num_min = -(-n // MAX_SUPER_BLOCK)
        super_block = -(-n // num_min) if n > MAX_SUPER_BLOCK else n

    if n <= super_block:
        return pallas_ldlt_factor_f32(mat, block=block, interpret=interpret)

    num = -(-n // super_block)
    n_pad = num * super_block
    if n_pad != n:
        # identity padding: extra unit pivots decouple from the real block
        shape = mat.shape[:-2] + (n_pad, n_pad)
        eye = jnp.broadcast_to(jnp.eye(n_pad, dtype=jnp.float32), shape)
        mat = eye.at[..., :n, :n].set(mat)

    a = mat
    for k in range(num):  # static unroll: a handful of super-blocks
        s, e = k * super_block, (k + 1) * super_block

        diag = a[..., s:e, s:e]
        packed = pallas_ldlt_factor_f32(diag, block=block, interpret=interpret)
        a = a.at[..., s:e, s:e].set(packed)

        if e == n_pad:
            break

        d = jnp.diagonal(packed, axis1=-2, axis2=-1)  # (..., SB)
        lower = jnp.tril(packed, k=-1) + jnp.eye(super_block, dtype=jnp.float32)

        # X = P L_kk^{-T}: solve L_kk Y = P^T, X = Y^T  (one MXU-tiled solve)
        p = a[..., e:, s:e]  # (..., rest, SB)
        y = jsl.solve_triangular(
            lower,
            jnp.swapaxes(p, -1, -2),
            lower=True,
            unit_diagonal=True,
        )
        x = jnp.swapaxes(y, -1, -2)  # (..., rest, SB)

        inv_d = jnp.where(d != 0.0, 1.0 / d, jnp.nan)
        l_panel = x * inv_d[..., None, :]
        a = a.at[..., e:, s:e].set(l_panel)

        # trailing Schur update: A -= L D L^T = (X D^{-1}) X^T, one f32 GEMM
        upd = l_panel @ jnp.swapaxes(x, -1, -2)
        a = a.at[..., e:, e:].add(-upd)

    if n_pad != n:
        a = a[..., :n, :n]
    return a


@functools.partial(jax.jit, static_argnames=("super_block",))
def ldlt_factor_batched_panels(mat, super_block: int = 128):
    """Batched (..., n, n) f32 LDL^T built for MXU utilization
    (round-5 directive: cross-instance panel batching).

    The grid-free batched Pallas kernel (``pallas_ldlt._batched_kernel``)
    serializes instances inside one kernel call — its sequential critical
    path is ``B * n`` rank-1 column steps and the MXU sees only one
    instance's (n, block) panels at a time (~0.5% of f32 peak measured,
    ``artifacts/r3_kkt_batched.json``).  This factorization restructures
    the batch so the hardware sees CROSS-INSTANCE work at every step:

    - diagonal (SB, SB) blocks are factored by the pure-JAX rank-1 loop
      (``ldlt.ldlt_factor``) over ALL instances at once — each of the SB
      sequential steps is a (B, SB, SB) elementwise VPU op, so the
      sequential depth is ``n`` column steps total, B-fold less than the
      serialized kernel;
    - panel solves are XLA *batched* TriangularSolves (B, rest, SB);
    - trailing Schur updates are XLA *batched* GEMMs
      (B, rest, SB) @ (B, SB, rest) — the MXU tiles the whole batch.

    With SB=128 the rank-1 VPU work is ~SB/n of the FLOPs and everything
    else runs on the MXU.  Same packed convention as ``ldlt.py``; same
    unpivoted quasi-definite envelope (breakdown ⇒ NaN poison ⇒ rejected
    step).  Replaces the serialized kernel for batched factorizations at
    n >= ``pallas_ldlt.PANEL_BATCH_MIN_N`` (see ``_dispatch_factor``);
    numerics verified against the single-instance kernel in
    ``tests/test_pallas_ldlt.py``."""
    from .ldlt import ldlt_factor

    mat = mat.astype(jnp.float32)
    n = mat.shape[-1]

    num = -(-n // super_block)
    n_pad = num * super_block
    if n_pad != n:
        shape = mat.shape[:-2] + (n_pad, n_pad)
        eye = jnp.broadcast_to(jnp.eye(n_pad, dtype=jnp.float32), shape)
        mat = eye.at[..., :n, :n].set(mat)

    a = mat
    for k in range(num):  # static unroll
        s, e = k * super_block, (k + 1) * super_block

        packed = ldlt_factor(a[..., s:e, s:e])
        a = a.at[..., s:e, s:e].set(packed)

        if e == n_pad:
            break

        d = jnp.diagonal(packed, axis1=-2, axis2=-1)  # (..., SB)
        lower = jnp.tril(packed, k=-1) + jnp.eye(
            super_block, dtype=jnp.float32
        )

        p = a[..., e:, s:e]  # (..., rest, SB)
        y = jsl.solve_triangular(
            lower,
            jnp.swapaxes(p, -1, -2),
            lower=True,
            unit_diagonal=True,
        )
        x = jnp.swapaxes(y, -1, -2)

        inv_d = jnp.where(d != 0.0, 1.0 / d, jnp.nan)
        l_panel = x * inv_d[..., None, :]
        a = a.at[..., e:, s:e].set(l_panel)

        upd = l_panel @ jnp.swapaxes(x, -1, -2)  # batched MXU GEMM
        a = a.at[..., e:, e:].add(-upd)

    if n_pad != n:
        a = a[..., :n, :n]
    return a


def ldlt_factor_residual(packed, mat):
    """Cheap O(n^2) factorization-quality probe: relative residual of
    ``L D L^T v`` against ``A v`` for a fixed deterministic probe vector.

    Guards the Pallas tiers against *silent* miscompiles (the observed
    failure mode of the HBM kernel past its envelope produced finite ~1e34
    garbage — see CLAUDE.md): a poisoned factor shows a residual many
    orders of magnitude above the ~n*eps_f32 of a genuine factorization.
    """
    n = packed.shape[-1]
    dtype = packed.dtype
    # deterministic, incommensurate-with-structure probe
    v = jnp.cos(jnp.arange(n, dtype=dtype) * dtype.type(0.7) + dtype.type(0.3))

    strict = jnp.tril(packed, k=-1)
    d = jnp.diagonal(packed, axis1=-2, axis2=-1)

    # (..., n, 1) column throughout: plain `@ v` breaks on explicit batch
    # dims (matmul would read (..., n) as a matrix, not a batched vector)
    vc = jnp.broadcast_to(v[:, None], packed.shape[:-2] + (n, 1))
    w = vc + jnp.swapaxes(strict, -1, -2) @ vc  # L^T v
    y = d[..., :, None] * w
    z = (y + strict @ y)[..., 0]  # L D L^T v

    av = (mat.astype(dtype) @ vc)[..., 0]
    num = jnp.linalg.norm(z - av, axis=-1)
    den = jnp.linalg.norm(mat.astype(dtype), axis=(-2, -1)) * jnp.linalg.norm(
        v
    )
    return num / jnp.maximum(den, jnp.finfo(dtype).tiny)


def guard_factor(packed, mat, rel_tol: float = 1e-2):
    """Poison ``packed`` with NaN when its residual probe exceeds
    ``rel_tol`` — the step layer then rejects the step (the same ladder a
    native ``LinearSolverError`` triggers in the reference).  NaN residuals
    (already-poisoned factors) stay poisoned."""
    rel = ldlt_factor_residual(packed, mat)
    ok = rel < rel_tol  # False for NaN: keeps poison
    return jnp.where(ok[..., None, None], packed, jnp.nan)
