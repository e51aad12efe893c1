"""Pallas TPU kernel: blocked LDL^T factorization resident in VMEM.

The blocked algorithm of ``blocked_ldlt.py`` (panel rank-1 sweeps + MXU
trailing updates) with the whole matrix pinned in VMEM for the entire
factorization — no HBM round-trips between panels.  Mosaic constraints
shape the implementation:

- f32 only (TPU Mosaic has no f64): the factor is computed in f32 and
  solves reach f64 accuracy through iterative refinement against the f64
  matrix (classic mixed-precision: the MXU does the O(n^3) work in f32,
  the VPU the O(n^2) refinement in emulated f64).
- no ``lax.dynamic_slice`` on values: the within-panel column extraction
  uses one-hot contractions, panel offsets are static (the panel loop is
  unrolled in Python).

Maps the reference's GPU-capable native factorization (SPRAL SSIDS,
``linear_solver/ssids_solver.py``) to TPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_BLOCK = 128

# batched factorizations at n >= this route to the cross-instance
# panel-batched factorization (two_level_ldlt.ldlt_factor_batched_panels):
# XLA batched GEMM trailing updates put the whole batch on the MXU, vs the
# grid-free kernel's B-fold serialized instances (round-5 directive #2).
# Below it (single-panel matrices) there are no trailing updates to batch
# and the VMEM kernel's fused panel loop wins.
PANEL_BATCH_MIN_N = 512


def _factor_body(a, n, block):
    """Blocked LDL^T on an (n, n) f32 value; returns the packed factor."""
    num_panels = n // block
    # all index math in int32: fori_loop counters are i32 and Mosaic
    # rejects mixed i32/i64 arithmetic (x64 mode makes arange i64)
    row_idx = jnp.arange(n, dtype=jnp.int32)[:, None]  # (n, 1)
    col_idx = jnp.arange(block, dtype=jnp.int32)[None, :]  # (1, NB)

    for p in range(num_panels):  # static unroll
        base = p * block

        panel0 = jax.lax.slice(a, (0, base), (n, base + block))

        # shifted row index: row (base + j) of the matrix is shifted row j
        shifted_rows = row_idx - base  # int32 (n, 1)

        def col_body(j, panel):
            # strictly rank-2 shapes throughout: Mosaic's layout engine
            # rejects 1-D reductions ("Offset change")
            onehot_col = (col_idx == j).astype(panel.dtype)  # (1, NB)
            onehot_row = (shifted_rows == j).astype(panel.dtype)  # (n, 1)

            # one-hot extractions as multiply-reduce (Mosaic rejects 1-D dots)
            colj = jnp.sum(panel * onehot_col, axis=1, keepdims=True)  # (n, 1)
            d = jnp.sum(colj * onehot_row, axis=0, keepdims=True)  # (1, 1)
            inv = jnp.where(
                d != 0.0, 1.0 / d, jnp.asarray(jnp.nan, panel.dtype)
            )  # (1, 1)

            below = (shifted_rows > j).astype(panel.dtype)  # (n, 1)
            l_col = colj * inv * below  # (n, 1) L column

            rowk = jnp.sum(panel * onehot_row, axis=0, keepdims=True)  # (1, NB)
            right = (col_idx > j).astype(panel.dtype)  # (1, NB)
            u_row = rowk * right  # (1, NB) remaining panel columns

            panel = panel - l_col * u_row  # rank-1 update (broadcast outer)
            # write the L column into column j
            keep = 1.0 - onehot_col * below
            panel = panel * keep + l_col * onehot_col
            return panel

        panel = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(block), col_body, panel0
        )  # i32 bounds: x64 would make the counter i64, which Mosaic rejects

        # static reassembly (Mosaic has no dynamic_update_slice); skip
        # empty pieces — Mosaic rejects zero-size vectors
        pieces = []
        if base > 0:
            pieces.append(a[:, :base])
        pieces.append(panel)
        if base + block < n:
            pieces.append(a[:, base + block :])
        a = jnp.concatenate(pieces, axis=1) if len(pieces) > 1 else panel

        # trailing Schur update (MXU): A -= L_panel D L_panel^T on rows and
        # columns >= base + block
        diag_mask = (row_idx == (col_idx + base)).astype(a.dtype)  # (n, NB)
        dvec = jnp.sum(panel * diag_mask, axis=0, keepdims=True)  # (1, NB)

        trailing = (row_idx >= base + block).astype(a.dtype)  # (n, 1)
        lpanel = panel * trailing

        upd = jax.lax.dot_general(
            lpanel * dvec,
            lpanel,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        a = a - upd

    return a


def _kernel(a_ref, out_ref, *, n, block):
    out_ref[:] = _factor_body(a_ref[:], n, block)


def _batched_kernel(a_ref, out_ref, buf, isem, osem, *, n, block, batch):
    """Grid-free batched variant: this Mosaic toolchain fails to legalize
    ANY gridded pallas call ('func.return' error), including the implicit
    grid vmap adds — so batching is a ``fori_loop`` over instances INSIDE
    one kernel call, streaming each (n, n) matrix HBM -> VMEM -> HBM."""
    from jax.experimental.pallas import tpu as pltpu

    def body(i, carry):
        load = pltpu.make_async_copy(a_ref.at[i], buf, isem)
        load.start()
        load.wait()
        buf[:] = _factor_body(buf[:], n, block)
        store = pltpu.make_async_copy(buf, out_ref.at[i], osem)
        store.start()
        store.wait()
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(batch), body, jnp.int32(0))


def _call_batched(mat, n_pad, block, interpret):
    """Explicitly batched (..., n, n) factorization: cross-instance
    panel-batched (MXU batched GEMMs) at n >= PANEL_BATCH_MIN_N, else the
    grid-free serialized kernel (leading dims flattened)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if n_pad >= PANEL_BATCH_MIN_N:
        from .two_level_ldlt import ldlt_factor_batched_panels

        return ldlt_factor_batched_panels(mat, super_block=block)

    lead = mat.shape[:-2]
    flat = mat.reshape((-1, n_pad, n_pad))
    batch = flat.shape[0]

    if interpret:
        kernel = functools.partial(_kernel, n=n_pad, block=block)
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
            interpret=True,
        )
        out = jax.vmap(call)(flat)
    else:
        kernel = functools.partial(
            _batched_kernel, n=n_pad, block=block, batch=batch
        )
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((batch, n_pad, n_pad), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((n_pad, n_pad), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(flat)
    return out.reshape(lead + (n_pad, n_pad))


def _dispatch_factor(mat, n_pad, block, interpret):
    """Route to the single or batched kernel.  The single-instance call is
    wrapped in ``custom_vmap`` so ``jax.vmap`` (e.g. BatchedSolver's
    whole-loop vmap) reaches the grid-free batched kernel instead of the
    grid that vmap would add to a pallas_call — which this Mosaic
    toolchain fails to legalize ('func.return' error).  One vmap level is
    supported (nested vmap of a factorization does not occur here)."""
    from jax.experimental import pallas as pl

    if mat.ndim >= 3:
        return _call_batched(mat, n_pad, block, interpret)

    @jax.custom_batching.custom_vmap
    def single(m):
        from jax.experimental.pallas import tpu as pltpu

        kernel = functools.partial(_kernel, n=n_pad, block=block)
        kwargs = {}
        if not interpret:
            # mat + out + panel scratch exceed the default 16 MB scoped-
            # VMEM limit slightly at n=1024+; raise it like the batched call
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
            interpret=interpret,
            **kwargs,
        )(m)

    @single.def_vmap
    def _rule(axis_size, in_batched, m):
        return _call_batched(m, n_pad, block, interpret), True

    return single(mat)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def pallas_ldlt_factor_f32(mat, block: int = DEFAULT_BLOCK, interpret: bool = False):
    """Factor an (n, n) (or batched (B, n, n)) f32 matrix; n is padded to a
    multiple of ``block`` with identity."""
    from jax.experimental import pallas as pl

    mat = mat.astype(jnp.float32)
    batched = mat.ndim == 3

    n = mat.shape[-1]
    num_panels = -(-n // block)
    n_pad = num_panels * block
    if n_pad != n:
        shape = mat.shape[:-2] + (n_pad, n_pad)
        eye = jnp.broadcast_to(jnp.eye(n_pad, dtype=jnp.float32), shape)
        mat = eye.at[..., :n, :n].set(mat)

    out = _dispatch_factor(mat, n_pad, block, interpret)

    if n_pad != n:
        out = out[..., :n, :n]
    return out


def refine_solve(packed_f32, mat_f64, rhs, iters: int = 3):
    """Mixed-precision solve: f32 LDL^T back-solves + f64 residual
    refinement against the original matrix."""
    from .ldlt import ldlt_solve

    def solve32(r):
        return ldlt_solve(packed_f32, r.astype(jnp.float32)).astype(rhs.dtype)

    x = solve32(rhs)

    def body(_, x):
        r = rhs - mat_f64 @ x
        return x + solve32(r)

    return jax.lax.fori_loop(0, iters, body, x)
