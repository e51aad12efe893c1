"""Schur-complement step solver for block-structured KKT systems.

SURVEY §7.5c: optimal-control and other *separable* problems have a
block-diagonal Lagrangian Hessian (per-stage blocks).  Exploiting that, the
scaled saddle system

    [[H + lambda I   J^T ]  [sx]   [rx']
     [J             -c I ]] [sy] = [ry']

is solved by eliminating the primal block: with ``A = H + lambda I`` block
diagonal, ``A^{-1}`` is a batch of small dense factorizations (vmapped
LDL^T on the MXU), the dual Schur complement

    S = -c I - J A^{-1} J^T       (m x m, dense)

is assembled with two batched matmuls, and the back-substitution costs two
more.  Active-set masking uses the identity-row/column trick *within*
blocks, so shapes stay static.

The distributed variant (``parallel/schur.py``) shards the blocks over a
device mesh and assembles ``S`` with a ``psum`` over the block axis — the
ICI-collective Schur assembly of BASELINE.json.

Enabled by ``Params(step_solver_type=StepSolverType.Schur,
schur_block_size=b)`` where the (transformed) problem's Hessian is block
diagonal with contiguous ``b x b`` blocks (slack variables appended by the
transform form extra diagonal entries, which are blocks of any size — the
requirement is only that ``H[i, j] = 0`` when ``i // b != j // b``).
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .. import implicit_func as impl
from ..iterate import Iterate
from ..linalg.blocked_ldlt import ldlt_factor_blocked
from ..linalg.ldlt import ldlt_factor, ldlt_solve
from .solvers import Factorization, StepSolverDef, _lower_block


class SchurFactors(NamedTuple):
    block_facts: Any  # (nb, b, b) LDL^T factors of masked A blocks
    s_fact: Any  # LDL^T factor of the dual Schur complement
    jac_masked: Any  # J with active columns zeroed
    ainv_jt: Any  # A^{-1} J^T, reused in back-substitution (n, m)


def _block_diag_blocks(H, b):
    """Extract contiguous (b, b) diagonal blocks of an (n, n) matrix."""
    n = H.shape[0]
    nb = n // b
    return H.reshape(nb, b, nb, b)[jnp.arange(nb), :, jnp.arange(nb), :]


def _blocks_to_vec_solve(block_facts, v, b):
    """Solve the block-diagonal system A x = v for a vector or matrix v.

    ``ldlt_solve`` treats the *last* axis as the system dimension, so
    matrix right-hand sides are transposed to (nb, k, b) before the
    batched solve."""
    n = v.shape[0]
    nb = n // b
    if v.ndim == 1:
        vb = v.reshape(nb, b)
        out = jax.vmap(ldlt_solve)(block_facts, vb)
        return out.reshape(n)
    k = v.shape[1]
    vb = v.reshape(nb, b, k).transpose(0, 2, 1)  # (nb, k, b)
    out = jax.vmap(ldlt_solve)(block_facts, vb)  # (nb, k, b)
    return out.transpose(0, 2, 1).reshape(n, k)


def schur_def(lin, report_rcond: bool, block_size: int) -> StepSolverDef:
    """``lin`` is the configured dense LinearSolver for the dual Schur
    complement, or None for the default f64 LDL^T path.  Passing the
    ``PallasLDLT`` tier factors ``S`` in f32 on the MXU with f64
    iterative refinement on the back-solve."""
    b = int(block_size)
    use_lin = lin is not None and lin.name == "pallas_ldlt"

    def factor(func: impl.StepFunc, H, J, active, rho):
        lamb = func.lamb
        n = H.shape[0]
        m = J.shape[0]
        dtype = H.dtype
        assert n % b == 0, f"schur_block_size {b} must divide n={n}"

        Hl = H + lamb * jnp.eye(n, dtype=dtype)

        # symmetric active-set masking: identity rows+cols for active vars
        inact = jnp.logical_not(active)
        both_inact = jnp.logical_and(inact[:, None], inact[None, :])
        M11 = jnp.where(both_inact, Hl, 0.0) + jnp.diag(active.astype(dtype))
        Jm = jnp.where(inact[None, :], J, 0.0)  # active columns zeroed

        blocks = _block_diag_blocks(M11, b)
        block_facts = jax.vmap(ldlt_factor)(blocks)

        ainv_jt = _blocks_to_vec_solve(block_facts, Jm.T, b)  # (n, m)

        S = _lower_block(m, lamb, rho, dtype) - Jm @ ainv_jt
        if use_lin:
            s_fact = lin.factor(S)
        else:
            # dense dual factorization: blocked (MXU) beats the rank-1
            # sweep once m is a few hundred
            s_fact = ldlt_factor_blocked(S) if m > 192 else ldlt_factor(S)

        return Factorization(
            fact=SchurFactors(
                block_facts=block_facts, s_fact=s_fact, jac_masked=Jm, ainv_jt=ainv_jt
            ),
            active=active,
            hess_shifted=Hl,
            jac=J,
            inertia_ok=jnp.array(True),
            rcond=jnp.full((), jnp.nan, dtype=dtype),
        )

    def solve(f: Factorization, func: impl.StepFunc, it: Iterate, rho):
        lamb = func.lamb
        dt = 1.0 / lamb
        pfact = 1.0 / (1.0 + lamb * rho)

        rx, ry = impl.value_at(func, it, rho, f.active)

        # condensed rhs like the symmetric solver: active entries pinned
        b0_full = jnp.where(f.active, dt * rx, 0.0)
        rhs_x = jnp.where(f.active, b0_full, rx - f.hess_shifted @ b0_full)
        rhs_y = pfact * ry - f.jac @ b0_full

        sf: SchurFactors = f.fact
        az = _blocks_to_vec_solve(sf.block_facts, rhs_x, b)  # A^{-1} rx'
        s_rhs = rhs_y - sf.jac_masked @ az
        sy = lin.solve(sf.s_fact, s_rhs) if use_lin else ldlt_solve(sf.s_fact, s_rhs)
        sx = az - sf.ainv_jt @ sy

        dx = sx
        dy = pfact * (sy - rho * ry)
        return dx, dy

    return StepSolverDef(
        scaled=True,
        symmetric=True,
        hess_rho_is_runtime=False,
        factor=factor,
        solve=solve,
    )
