"""HBM-resident blocked LDL^T Pallas kernel (left-looking, panel DMAs).

Measured on v5e (verified solves): 2.8 ms at n=1024, 5.8 ms at n=2048 —
10x the XLA-blocked f32 path and ~120x scipy SuperLU at f64 accuracy via
refinement.  Serves as the PallasLDLT tier for
PALLAS_MAX_N < n <= PALLAS_HBM_MAX_N (see ``linalg.__init__``).

Known Mosaic limits on this chip (reproduced, not yet diagnosed): NB=128
produces silent NaNs when compiled (interpret mode is correct at any NB).
n=3072 at NB=256 needs ``vmem_limit_bytes`` raised past the 16MB default
to compile, and then *miscompiles silently* (finite garbage ~1e34 in the
factor, solve residual 10x worse than the XLA f32 path); n=4096 factors
to NaN.  The production tier therefore pins NB=256 and caps at n=2048,
where the kernel is verified against the XLA factorization.

The VMEM-resident kernel (``pallas_ldlt.py``) caps at ~1280 rows (the whole
matrix must fit in VMEM).  This variant keeps the matrix in HBM and streams
panels through VMEM — the classic out-of-core left-looking factorization:

for each NB-column panel j:
    P   <- DMA  A[:, jNB:(j+1)NB]                 (HBM -> VMEM)
    for k < j:
        Lk  <- DMA  out[:, kNB:(k+1)NB]           (full-height L panel)
        Ljk <- DMA  out[jNB:(j+1)NB, kNB:(k+1)NB] (the NB x NB row block)
        Dk  <- diag of DMA'd out[kNB:+NB, kNB:+NB]
        P  -= Lk @ (Ljk * Dk)^T                   (MXU)
    factor P's diagonal block in place (one-hot rank-1 sweeps)
    DMA  P -> out[:, jNB:(j+1)NB]

VMEM footprint: 2 full-height panels + 2 small blocks ~= 2*n*NB f32; with
NB=256 this covers n up to ~14k.  Rows above each panel's diagonal block
carry algorithm leftovers exactly as in the packed convention; the update
only consumes genuine L rows (see inline notes).  f32 with f64 iterative
refinement, like the VMEM kernel.

All Mosaic constraints of this chip apply (see pallas_ldlt.py): rank-2
values, one-hot extractions, i32 index math, masked dynamic row positions
(the panel base enters only via comparisons and ``pl.ds`` DMA offsets).
"""

import functools

import jax
import jax.numpy as jnp


def _factor_block(block_mat, nb):
    """Unblocked LDL^T of an (nb, nb) value by one-hot rank-1 sweeps
    (same packed convention: strict lower L, diag D)."""
    row_idx = jnp.arange(nb, dtype=jnp.int32)[:, None]
    col_idx = jnp.arange(nb, dtype=jnp.int32)[None, :]

    def col_body(j, a):
        onehot_col = (col_idx == j).astype(a.dtype)
        onehot_row = (row_idx == j).astype(a.dtype)

        colj = jnp.sum(a * onehot_col, axis=1, keepdims=True)
        d = jnp.sum(colj * (row_idx == j).astype(a.dtype), axis=0, keepdims=True)
        inv = jnp.where(d != 0.0, 1.0 / d, jnp.asarray(jnp.nan, a.dtype))

        below = (row_idx > j).astype(a.dtype)
        l_col = colj * inv * below

        rowk = jnp.sum(a * onehot_row, axis=0, keepdims=True)
        right = (col_idx > j).astype(a.dtype)
        u_row = rowk * right

        a = a - l_col * u_row
        keep = 1.0 - onehot_col * below
        return a * keep + l_col * onehot_col

    return jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), col_body, block_mat)


def _inv_upper(U, nb):
    """Invert an upper-triangular (nb, nb) value by row back-substitution
    (one-hot rank-2 sweep; each step is one small MXU matvec-row)."""
    row_idx = jnp.arange(nb, dtype=jnp.int32)[:, None]
    col_idx = jnp.arange(nb, dtype=jnp.int32)[None, :]

    def body(i, X):
        k = jnp.int32(nb - 1) - i
        onehot_row = (row_idx == k).astype(U.dtype)  # (nb, 1)
        u_row = jnp.sum(U * onehot_row, axis=0, keepdims=True)  # (1, nb)
        ukk = jnp.sum(u_row * (col_idx == k).astype(U.dtype), axis=1, keepdims=True)
        inv_ukk = jnp.where(ukk != 0.0, 1.0 / ukk, jnp.asarray(jnp.nan, U.dtype))

        right = (col_idx > k).astype(U.dtype)
        contrib = jax.lax.dot_general(
            u_row * right,
            X,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, nb)

        i_row = (col_idx == k).astype(U.dtype)  # (1, nb)
        x_row = (i_row - contrib) * inv_ukk
        return X + onehot_row * x_row  # scatter row k

    return jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), body, jnp.zeros_like(U))


def _factor_panel(panel, base, n, block):
    """Factor the NB panel columns whose diagonal block starts at row
    ``base`` (traced i32).

    MXU-structured: one-hot-extract the diagonal block, factor it with the
    small sweep (O(NB^3) on NB-sized values), then obtain the sub-diagonal
    rows with a single (n, NB) x (NB, NB) matmul against
    ``(D L_d^T)^{-1}`` — instead of NB full-height rank-1 sweeps."""
    dtype = panel.dtype
    row_idx = jnp.arange(n, dtype=jnp.int32)[:, None]
    col_idx = jnp.arange(block, dtype=jnp.int32)[None, :]
    shifted_rows = row_idx - base  # (n, 1)

    # selector S (n, NB): S[r, c] = 1 iff r == base + c
    sel = (shifted_rows == col_idx).astype(dtype)

    diag_block = jax.lax.dot_general(
        sel, panel, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (NB, NB)

    factored = _factor_block(diag_block, block)

    nb_rows = jnp.arange(block, dtype=jnp.int32)[:, None]
    nb_cols = jnp.arange(block, dtype=jnp.int32)[None, :]
    strictly_lower = (nb_rows > nb_cols).astype(dtype)
    eye_nb = (nb_rows == nb_cols).astype(dtype)

    l_d = factored * strictly_lower + eye_nb
    d_row = jnp.sum(factored * eye_nb, axis=0, keepdims=True)  # (1, NB)

    # U = D L_d^T: upper triangular, U[i, j] = d_i * L_d[j, i]
    u_mat = jnp.transpose(l_d) * jnp.reshape(d_row, (block, 1))
    t_mat = _inv_upper(u_mat, block)  # (NB, NB) = (D L_d^T)^{-1}

    # rows strictly below the diagonal block
    below = (shifted_rows >= jnp.int32(block)).astype(dtype)

    l21 = jax.lax.dot_general(
        panel * below,
        t_mat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (n, NB), nonzero only on the below rows

    in_block = jnp.logical_and(shifted_rows >= 0, shifted_rows < jnp.int32(block)).astype(dtype)
    above = (shifted_rows < 0).astype(dtype)

    scattered_block = jax.lax.dot_general(
        sel, factored, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (n, NB): factored block at its rows, zero elsewhere

    return panel * above + scattered_block * in_block + l21 * below


def _make_kernel(n, block):
    num_panels = n // block

    def kernel(a_ref, out_ref, pbuf, lbuf, sbuf, psem, lsem, ssem, wsem):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def panel_body(j, _):
            base = j * block

            load_p = pltpu.make_async_copy(
                a_ref.at[:, pl.ds(base, block)], pbuf, psem
            )
            load_p.start()
            load_p.wait()

            def start_load(k, slot):
                kbase = k * block
                pltpu.make_async_copy(
                    out_ref.at[:, pl.ds(kbase, block)], lbuf.at[slot], lsem.at[slot]
                ).start()

            # warm-up: prefetch k=0 into slot 0
            @pl.when(j > 0)
            def _():
                start_load(jnp.int32(0), jnp.int32(0))

            def k_body(k, p):
                kbase = k * block
                slot = jax.lax.rem(k, jnp.int32(2))

                # overlap: start the next L panel while using this one
                @pl.when(k + 1 < j)
                def _():
                    start_load(k + 1, jax.lax.rem(k + 1, jnp.int32(2)))

                # small row-block DMA: rows [base, base+NB) of panel k hold
                # genuine L entries (below panel k's diagonal since j > k)
                load_s = pltpu.make_async_copy(
                    out_ref.at[pl.ds(base, block), pl.ds(kbase, block)],
                    sbuf,
                    ssem,
                )
                load_s.start()

                pltpu.make_async_copy(
                    out_ref.at[:, pl.ds(kbase, block)], lbuf.at[slot], lsem.at[slot]
                ).wait()
                load_s.wait()

                lk = lbuf[slot]

                # D_k from the diagonal of panel k's diagonal block, which
                # the full-height panel already contains at rows [kbase,+NB)
                row_idx = jnp.arange(n, dtype=jnp.int32)[:, None]
                col_idx = jnp.arange(block, dtype=jnp.int32)[None, :]
                diag_mask = (row_idx == col_idx + kbase).astype(jnp.float32)
                dk = jnp.sum(lk * diag_mask, axis=0, keepdims=True)  # (1, NB)

                ljk = sbuf[...]  # (NB, NB): L rows of this panel's block row

                m = ljk * dk  # (NB, NB)
                # P -= L_k @ (Ljk * Dk)^T ; rows above kbase of lk hold
                # packed-format leftovers, which only pollute P rows that the
                # panel factorization below never reads (rows < base)
                upd = jax.lax.dot_general(
                    lk,
                    m,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return p - upd

            p = jax.lax.fori_loop(jnp.int32(0), j, k_body, pbuf[...])

            p = _factor_panel(p, base, n, block)
            pbuf[...] = p

            store_p = pltpu.make_async_copy(
                pbuf, out_ref.at[:, pl.ds(base, block)], wsem
            )
            store_p.start()
            store_p.wait()
            return 0

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(num_panels), panel_body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def pallas_ldlt_factor_hbm(mat, block: int = 256, interpret: bool = False):
    """Packed LDL^T factor of an (n, n) matrix streamed through VMEM;
    pads n up to a multiple of ``block`` with identity."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    mat = mat.astype(jnp.float32)
    n = mat.shape[-1]
    num_panels = -(-n // block)
    n_pad = num_panels * block
    if n_pad != n:
        eye = jnp.eye(n_pad, dtype=jnp.float32)
        mat = eye.at[:n, :n].set(mat)

    kernel = _make_kernel(n_pad, block)

    @jax.custom_batching.custom_vmap
    def call(m):
        return _pallas_call_hbm(m, kernel, n_pad, block, interpret)

    @call.def_vmap
    def _rule(axis_size, in_batched, m):
        # this Mosaic toolchain rejects any gridded pallas call (incl.
        # the grid vmap adds); instead of running instances sequentially
        # (lax.map — B-fold serialized critical path), batched HBM-size
        # factorizations take the cross-instance panel-batched path whose
        # trailing updates are XLA *batched* MXU GEMMs (round-5 dir. #2)
        from .two_level_ldlt import ldlt_factor_batched_panels

        return ldlt_factor_batched_panels(m), True

    out = call(mat)

    if n_pad != n:
        out = out[:n, :n]
    return out


def _pallas_call_hbm(mat, kernel, n_pad, block, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_pad, block), jnp.float32),  # current panel
            pltpu.VMEM((2, n_pad, block), jnp.float32),  # double-buffered L
            pltpu.VMEM((block, block), jnp.float32),  # block row of L
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        # the default 16MB scoped-VMEM cap rejects n>2048 (2 full-height
        # panels + the double-buffered L panel exceed it); v5e has 128MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(mat)
