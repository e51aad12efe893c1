"""MINRES for symmetric (indefinite) systems, pure JAX.

Replaces the reference's scipy MINRES binding (``minres_solver.py``), which
is restricted to the symmetric step solver.  Implemented as the classical
Paige-Saunders Lanczos/Givens recurrence inside a ``lax.while_loop`` with
static shapes, so it jits and vmaps; supports warm starts (the reference
exploits these via ``asymmetric_step_solver.py:125-138``).
"""

import jax
import jax.numpy as jnp


def minres(A, b, x0=None, tol=1e-12, maxiter=None):
    matvec = A if callable(A) else (lambda v: A @ v)
    n = b.shape[0]
    if maxiter is None:
        maxiter = 4 * n

    dtype = b.dtype
    eps = jnp.finfo(dtype).eps

    x = jnp.zeros_like(b) if x0 is None else x0
    r1 = b - matvec(x)
    beta1 = jnp.linalg.norm(r1)
    bnorm = jnp.linalg.norm(b)

    # scalars derived from beta1 so they share its device-varying type
    # under shard_map
    zero = jnp.zeros_like(beta1)
    init = dict(
        x=x,
        y=r1,
        r1=r1,
        r2=r1,
        oldb=zero,
        beta=beta1,
        dbar=zero,
        epsln=zero,
        phibar=beta1,
        cs=-jnp.ones_like(beta1),
        sn=zero,
        w=jnp.zeros_like(b),
        w2=jnp.zeros_like(b),
        itn=jnp.zeros((), jnp.int32),
        done=beta1 <= tol * jnp.maximum(bnorm, 1.0),
    )

    def cond(c):
        return jnp.logical_and(c["itn"] < maxiter, jnp.logical_not(c["done"]))

    def body(c):
        itn = c["itn"] + 1
        beta = c["beta"]
        safe_beta = jnp.where(beta == 0.0, 1.0, beta)

        v = c["y"] / safe_beta
        y = matvec(v)
        safe_oldb = jnp.where(c["oldb"] == 0.0, 1.0, c["oldb"])
        y = jnp.where(itn >= 2, y - (beta / safe_oldb) * c["r1"], y)

        alfa = jnp.dot(v, y)
        y = y - (alfa / safe_beta) * c["r2"]
        r1 = c["r2"]
        r2 = y

        oldb = beta
        beta_new = jnp.linalg.norm(y)

        # previous Givens rotation applied to the new tridiagonal column
        oldeps = c["epsln"]
        delta = c["cs"] * c["dbar"] + c["sn"] * alfa
        gbar = c["sn"] * c["dbar"] - c["cs"] * alfa
        epsln = c["sn"] * beta_new
        dbar = -c["cs"] * beta_new

        # current rotation annihilating beta_new
        gamma = jnp.maximum(jnp.sqrt(gbar**2 + beta_new**2), eps)
        cs = gbar / gamma
        sn = beta_new / gamma
        phi = cs * c["phibar"]
        phibar = sn * c["phibar"]

        w1 = c["w2"]
        w2 = c["w"]
        w = (v - oldeps * w1 - delta * w2) / gamma
        x = c["x"] + phi * w

        done = phibar <= tol * jnp.maximum(bnorm, 1.0)
        done = jnp.logical_or(done, jnp.logical_not(jnp.isfinite(phibar)))

        return dict(
            x=x,
            y=y,
            r1=r1,
            r2=r2,
            oldb=oldb,
            beta=beta_new,
            dbar=dbar,
            epsln=epsln,
            phibar=phibar,
            cs=cs,
            sn=sn,
            w=w,
            w2=w2,
            itn=itn,
            done=done,
        )

    out = jax.lax.while_loop(cond, body, init)
    return out["x"]
