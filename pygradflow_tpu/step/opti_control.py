"""Optimizing step controller: solve the proximal implicit-Euler
subproblem with an independent primal-dual interior-point method.

Counterpart of the reference OptimizingController
(``pygradflow/step/opti_control.py:252-267``), which delegates the
subproblem to Ipopt (cyipopt + L-BFGS) and always accepts with halved
lambda; subproblem failure raises StepSolverError into the recovery
ladder.  Here the subproblem is solved by the jitted primal-dual IP of
``step/ip_solver.py`` (exact autodiff Hessians, dense LDL^T KKT solves);
on success the step is accepted with halved lambda, on non-convergence
the candidate is poisoned so ``compute_step`` rejects and doubles lambda
— the same ladder, without host exceptions.
"""

import jax.numpy as jnp

from .. import implicit_func as impl
from ..eval import Counters
from ..iterate import Iterate, evaluate_iterate, iterate_eval_counts
from ..linalg import LinearSolverType, linear_solver
from .control import ControlCfg, ControlResult
from .ip_solver import IP_MAX_IT, solve_ip


def make_optimizing(cfg: ControlCfg):
    params = cfg.params
    fns = cfg.fns
    lb, ub = cfg.lb, cfg.ub

    lin = linear_solver(LinearSolverType.LDLT, symmetric=True)

    def factor_solve(K, b):
        return lin.solve(lin.factor(K), b)

    def step(orig: Iterate, lamb, rho, error_sum, counters: Counters):
        result = solve_ip(
            fns, factor_solve, orig.x, orig.y, lamb, rho, lb, ub
        )

        # each IP iteration evaluates grad/cons/jac/hess once (upper bound
        # IP_MAX_IT; the loop usually exits earlier, but counters must be
        # trace-static upper bounds or carried per-iteration — charge the
        # actual count via the returned iteration number)
        its = result.iterations
        counters = counters.add(
            obj_grad=its, cons=its, cons_jac=its, lag_hess=its
        )

        x = jnp.where(result.converged, result.x, jnp.full_like(result.x, jnp.nan))
        y = result.nu

        next_it = evaluate_iterate(fns, x, y)
        counters = counters.add(**iterate_eval_counts(cfg.m))

        lamb_n = jnp.where(result.converged, 0.5 * lamb, 2.0 * lamb)
        accepted = result.converged

        func = impl.make_step_func(orig, lamb, lb, ub, scaled=False)
        active = impl.compute_active_set(func, next_it, rho)
        rcond = jnp.full_like(lamb_n, jnp.nan)
        return ControlResult(
            next_it,
            lamb_n,
            accepted,
            error_sum,
            active,
            counters,
            rcond,
            (next_it.x, next_it.y),
        )

    return step
