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

    # Deliberately NOT routed through params.linear_solver_type: in the
    # reference the subproblem goes to Ipopt, whose internal factorization
    # is likewise independent of the step solvers' configured backend
    # (reference opti_control.py:252-267); the IP's KKT matrix is symmetric
    # indefinite, for which the dense LDL^T tier is the right fit.  rcond
    # stays NaN here for the same reason: the reference reports rcond only
    # from step solvers, which this controller does not use (PARITY.md).
    lin = linear_solver(LinearSolverType.LDLT, symmetric=True)

    def factor_solve(K, b):
        return lin.solve(lin.factor(K), b)

    def step(orig: Iterate, lamb, rho, error_sum, counters: Counters):
        result = solve_ip(
            fns, factor_solve, orig.x, orig.y, lamb, rho, lb, ub
        )

        # each IP iteration evaluates ONE set of grad/cons/jac (carried
        # through the loop, see ip_solver.eval_set) plus one lag_hess;
        # the init point costs one extra grad/cons/jac set.  Charged via
        # the actual returned iteration count.
        its = result.iterations
        counters = counters.add(
            obj_grad=its + 1, cons=its + 1, cons_jac=its + 1, lag_hess=its
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
