"""Batched continuous-flow solves: vmap over the device-resident
integration loop.

The reference's scipy-BDF IntegrationSolver is inherently sequential per
instance; this runs a whole batch of continuous-homotopy solves in
lockstep on one chip (and under ``shard_map`` across a mesh), the same
instance-axis parallelism as ``parallel/batch.py`` for the discrete
engine.  Each lane carries its own filter, penalty and event sequence —
lanes diverge freely; finished lanes are frozen by the while_loop
batching rule until the last lane terminates.
"""

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..iterate import bounds_dual, evaluate_iterate
from ..params import Params
from ..status import SolverStatus
from . import flow as fl
from .device_loop import make_device_loop
from .integration_solver import IntegrationSolver


class BatchedIntegrationResult(NamedTuple):
    """Structure-of-arrays result (leading dim = batch)."""

    x: Any
    y: Any
    d: Any
    status: Any  # int32 (B,) SolverStatus values
    iterations: Any  # segments per lane
    rho: Any
    num_integration_steps: Any
    num_newton_steps: Any

    @property
    def success(self):
        return np.asarray(self.status) == int(SolverStatus.Optimal)


class BatchedIntegrationSolver:
    """Solves a batch of instances of ONE problem with the continuous
    engine, fully on device."""

    def __init__(self, problem, params: Optional[Params] = None):
        self.inner = IntegrationSolver(problem, params or Params())
        self.params = self.inner.params

        inner = self.inner
        loop = make_device_loop(
            inner.cfg,
            inner.fns,
            inner.lb,
            inner.ub,
            inner.params,
            inner._run_segment,
            inner._step_fn,
        )
        transform = inner.transform
        fns = inner.fns
        lb, ub = inner.lb, inner.ub
        active_tol = inner.params.active_tol
        ctx = inner.ctx

        def solve_one(x0, y0):
            xt, yt = transform.transform_sol(x0, y0)
            res = loop(xt, yt)
            x, y = fl.split(ctx, res.z)
            it = evaluate_iterate(fns, x, y)
            d = bounds_dual(it, lb, ub, active_tol)
            xr, yr, dr = transform.restore_sol(it.x, it.y, d)
            return dict(
                x=xr,
                y=yr,
                d=dr,
                status=res.status,
                iterations=res.iterations,
                rho=res.rho,
                steps=res.num_steps,
                newtons=res.num_newtons,
            )

        self._solve_batch = jax.jit(jax.vmap(solve_one))

    def solve(self, x0s, y0s=None) -> BatchedIntegrationResult:
        params = self.params
        x0s = jnp.asarray(x0s, dtype=params.dtype)
        B = x0s.shape[0]
        if y0s is None:
            y0s = jnp.zeros(
                (B, self.inner.orig_problem.num_cons), dtype=params.dtype
            )
        else:
            y0s = jnp.asarray(y0s, dtype=params.dtype)

        out = jax.device_get(self._solve_batch(x0s, y0s))

        return BatchedIntegrationResult(
            x=out["x"],
            y=out["y"],
            d=out["d"],
            status=out["status"],
            iterations=out["iterations"],
            rho=out["rho"],
            num_integration_steps=out["steps"],
            num_newton_steps=out["newtons"],
        )
