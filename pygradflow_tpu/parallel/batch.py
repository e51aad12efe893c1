"""Batched instance sweeps: ``vmap`` over the whole solver loop.

The reference parallelizes instance sweeps with a ProcessPoolExecutor over
OS processes (``runners/runner.py:107-153``).  Here batching is a
*transform*: the entire homotopy loop (one ``SolveLoop.body``) is vmapped
over an instance batch, so one TPU core advances every instance in
lockstep — factorizations become batched dense kernels on the MXU.

Heterogeneous convergence is handled by per-lane status: ``body`` wraps the
iteration in ``lax.cond`` on the lane's status, which under vmap becomes a
``select`` — converged lanes' updates are computed but discarded, and the
chunk loop stops when every lane has a terminal status.

Large f64 batches are COMPUTE-bound (RESULTS.md: the B=16384 HS71 sweep
stops being latency-bound), so discarded lockstep updates are real cost:
with a median of ~20 iterations and stragglers at 2-3x that, full-width
lockstep pays ``B * max_iters`` lane-iterations for ``~B * median`` of
useful work.  ``compact=True`` (auto for large batches) harvests
terminated lanes at chunk boundaries and re-packs the active remainder
into power-of-four width tiers, so straggler iterations run at straggler
width.  Lane trajectories are unchanged — lanes are independent and
compaction only permutes them (equivalence tested in
``tests/test_batch.py``).

Per-instance *problem data* (a "scenario sweep": same structure, different
coefficients) is supported through :class:`ParametricProblem`: the data
pytree is an explicit vmapped argument, bound to the problem object at
trace time.
"""

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..params import Params
from ..problem import Problem
from ..solver import SolveLoop
from ..status import RUNNING, SolverStatus
from ..timer import Timer
from ..transform import Transformation
from ..iterate import bounds_dual, cons_violation, stat_res, total_res


class ParametricProblem(Problem):
    """Problem with per-instance data.

    Subclasses implement ``p_obj(x, data)`` (and optionally
    ``p_cons(x, data)``) instead of ``obj``/``cons``; ``data`` is any
    pytree of arrays.  A batch of instances is then a batch of data
    pytrees, swept by :class:`BatchedSolver`.
    """

    _parametric = True

    def __init__(self, var_lb, var_ub, example_data, **args):
        self.data = example_data
        super().__init__(var_lb, var_ub, **args)

    def p_obj(self, x, data):
        raise NotImplementedError()

    def p_cons(self, x, data):
        raise NotImplementedError()

    def obj(self, x):
        return self.p_obj(x, self.data)

    def cons(self, x):
        return self.p_cons(x, self.data)


class BatchResult(NamedTuple):
    """Structure-of-arrays result of a batched solve (leading dim = batch)."""

    x: Any
    y: Any
    d: Any
    status: Any  # int32 (B,), SolverStatus values
    iterations: Any
    accepted_steps: Any
    total_res: Any
    cons_violation: Any
    stat_res: Any

    @property
    def success(self):
        return np.asarray(self.status) == int(SolverStatus.Optimal)


class BatchedSolver:
    """Solves a batch of instances of one problem structure in lockstep.

    ``problem`` may be a plain :class:`Problem` (batch over initial points
    only) or a :class:`ParametricProblem` (additionally batch over a data
    pytree).
    """

    def __init__(
        self,
        problem: Problem,
        params: Optional[Params] = None,
        compact: Optional[bool] = None,
        harvest_chunk: int = 16,
        min_tier: int = 64,
    ):
        """``compact``: harvest terminated lanes at chunk boundaries and
        shrink the running batch to power-of-four width tiers (None =
        auto: enabled when the batch is at least ``4 * min_tier`` wide).
        ``harvest_chunk`` bounds the iterations between harvest checks in
        compacting mode (``jit_chunk`` still applies when smaller);
        ``min_tier`` is the smallest width tiers shrink to (each tier is
        one extra XLA compilation of the chunk loop)."""
        if params is None:
            params = Params()
        # display/callbacks are host side effects — meaningless per-lane
        assert not params.display, "display is not supported in batched mode"
        assert not params.collect_path, "collect_path is not supported in batched mode"

        self.orig_problem = problem
        self.params = params
        self.transform = Transformation(problem, params)
        self.loop = SolveLoop(self.transform, params, callbacks=None)
        self.parametric = isinstance(problem, ParametricProblem)
        self.compact = compact
        self.harvest_chunk = int(harvest_chunk)
        self.min_tier = int(min_tier)

        self._run = jax.jit(self._run_chunk, static_argnums=(2,))

    # ------------------------------------------------------------------

    def _bind(self, data):
        """Bind a (possibly traced) data pytree to the parametric problem.

        Assignment at trace time routes the vmapped tracer through the
        problem's evaluation closures; the jitted computation that results
        takes ``data`` as an explicit argument.
        """
        if data is not None:
            self.orig_problem.data = data

    def _init_one(self, x0, y0, data):
        self._bind(data)
        return self.loop.init_state(x0, y0)

    def _body_one(self, state, data):
        self._bind(data)
        return self.loop.body(state)

    def _run_chunk(self, states, datas, chunk: int):
        def cond(carry):
            states, i = carry
            return jnp.logical_and(
                i < chunk, jnp.any(states.status == RUNNING)
            )

        def body(carry):
            states, i = carry
            if self.parametric:
                states = jax.vmap(self._body_one)(states, datas)
            else:
                states = jax.vmap(lambda s: self._body_one(s, None))(states)
            return (states, i + 1)

        (states, _) = jax.lax.while_loop(
            cond, body, (states, jnp.zeros((), jnp.int32))
        )
        return states

    # ------------------------------------------------------------------

    def solve(self, x0, y0=None, data=None) -> BatchResult:
        """Solve the batch.  ``x0``: (B, n_orig); ``y0``: (B, m_orig) or
        None; ``data``: batched pytree for parametric problems."""
        params = self.params
        loop = self.loop

        x0 = jnp.asarray(x0, dtype=params.dtype)
        B = x0.shape[0]
        if y0 is None:
            y0 = jnp.zeros((B, self.orig_problem.num_cons), dtype=params.dtype)
        else:
            y0 = jnp.asarray(y0, dtype=params.dtype)

        if self.parametric:
            assert data is not None, "ParametricProblem requires batched data"

            def init_one(x, y, d):
                xt, yt = self._transform_initial(x, y, d)
                return self._init_one(xt, yt, d)

            states = jax.jit(jax.vmap(init_one))(x0, y0, data)
        else:

            def init_one(x, y):
                xt, yt = self._transform_initial(x, y, None)
                return self._init_one(xt, yt, None)

            states = jax.jit(jax.vmap(init_one))(x0, y0)

        timer = Timer(params.time_limit)
        compact = self.compact
        if compact is None:
            compact = B >= 4 * self.min_tier
        if compact:
            return self._solve_compacting(states, data, B, timer)

        chunk = params.jit_chunk
        while True:
            states = self._run(states, data, chunk)
            if not bool(jnp.any(states.status == RUNNING)):
                break
            if timer.reached_time_limit():
                states = states._replace(
                    status=jnp.where(
                        states.status == RUNNING,
                        int(SolverStatus.TimeLimit),
                        states.status,
                    )
                )
                break

        return self._collect(states, data)

    # ------------------------------------------------------------------

    def _solve_compacting(self, states, data, B: int, timer) -> BatchResult:
        """Chunked solve with lane harvesting + width compaction.

        Invariant: ``states`` has width ``W`` whose first ``L`` lanes are
        the still-running instances ``active[orig]``; the rest are frozen
        padding (non-RUNNING status, never advanced by ``body``'s status
        cond).  Terminated lanes are fetched to host exactly once; the
        final result is assembled in original lane order and finalized by
        ONE vmapped dispatch at full width."""
        params = self.params
        chunk = min(params.jit_chunk, self.harvest_chunk)

        final = [None] * B
        active = np.arange(B)  # original indices of lanes [0:L)
        L = B

        def harvest(rows_local, states, timed_out=False):
            # ONE packed transfer per harvest (eager scalar fetches cost
            # ~30 ms each through the TPU tunnel)
            rows_dev = jnp.asarray(rows_local)
            sub = jax.device_get(
                jax.tree_util.tree_map(lambda a: a[rows_dev], states)
            )
            if timed_out:
                sub = sub._replace(
                    status=np.where(
                        sub.status == RUNNING,
                        int(SolverStatus.TimeLimit),
                        sub.status,
                    )
                )
            for j, orig in enumerate(active[rows_local]):
                final[orig] = jax.tree_util.tree_map(lambda a: a[j], sub)

        # cur_data is carried through the same gathers as states so lane
        # j's data always matches lane j's state (padded width included)
        cur_data = (
            jax.tree_util.tree_map(jnp.asarray, data) if self.parametric else None
        )

        while L:
            states = self._run(states, cur_data, chunk)
            status = np.asarray(states.status[:L])
            running = status == RUNNING

            if timer.reached_time_limit():
                harvest(np.arange(L), states, timed_out=True)
                break
            done_local = np.where(~running)[0]
            if not done_local.size:
                continue
            harvest(done_local, states)
            keep = np.where(running)[0]
            active = active[keep]
            L = int(active.size)
            if not L:
                break
            # shrink to the smallest power-of-4 divisor tier still >= L
            W = int(states.status.shape[0])
            new_W = W
            while new_W // 4 >= max(L, self.min_tier):
                new_W //= 4
            pad = np.full(new_W - L, keep[0], dtype=keep.dtype)
            gather = jnp.asarray(np.concatenate([keep, pad]))
            states = jax.tree_util.tree_map(lambda a: a[gather], states)
            if self.parametric:
                cur_data = jax.tree_util.tree_map(lambda a: a[gather], cur_data)
            if new_W > L:
                states = states._replace(
                    status=states.status.at[L:].set(
                        int(SolverStatus.IterationLimit)
                    )
                )

        stacked = jax.tree_util.tree_map(
            lambda *leaves: jnp.asarray(np.stack(leaves, axis=0)), *final
        )
        return self._collect(stacked, data)

    def _transform_initial(self, x, y, data):
        """Traced equivalent of Transformation.create_transformed_initial."""
        self._bind(data)
        transform = self.transform
        if transform.scaling is not None:
            x = transform.scaling.scale_primal(x)
            y = transform.scaling.scale_dual(y)
        return transform.trans_problem.transform_sol(x, y)

    def _collect(self, states, data) -> BatchResult:
        loop = self.loop
        params = self.params

        def finalize(state, d):
            self._bind(d)
            it = state.it
            dual = bounds_dual(it, loop.lb, loop.ub, params.active_tol, loop.fns)
            (x, y, dd) = self.transform.restore_sol(it.x, it.y, dual)
            return (
                x,
                y,
                dd,
                total_res(it, loop.lb, loop.ub, params.active_tol, loop.fns),
                cons_violation(it),
                stat_res(it, loop.lb, loop.ub, params.active_tol, loop.fns),
            )

        if self.parametric:
            outs = jax.jit(jax.vmap(finalize))(states, data)
        else:
            outs = jax.jit(jax.vmap(lambda s: finalize(s, None)))(states)

        (x, y, d, tres, cviol, sres) = outs
        return BatchResult(
            x=np.asarray(x),
            y=np.asarray(y),
            d=np.asarray(d),
            status=np.asarray(states.status),
            iterations=np.asarray(states.iteration),
            accepted_steps=np.asarray(states.accepted_steps),
            total_res=np.asarray(tres),
            cons_violation=np.asarray(cviol),
            stat_res=np.asarray(sres),
        )
