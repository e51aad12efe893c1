"""Slack transformation.

Rewrites any problem so the core algorithm only ever sees equality
constraints ``c(x) = 0`` plus box bounds (reference
``pygradflow/cons_problem.py:8-173``): one slack variable per non-equality
constraint (bounds moved onto the slack), equality right-hand sides shifted
to zero.

Slack positions are decided at construction time from the *concrete* bound
arrays, so all shapes are static under jit; the slack blocks of
gradient/Jacobian/Hessian are appended with dense concatenation rather than
sparse bmat.
"""

import jax.numpy as jnp
import numpy as np

from .problem import Problem


class ConstrainedProblem(Problem):
    def __init__(self, problem: Problem):
        self.problem = problem

        cons_lb = problem.cons_lb
        cons_ub = problem.cons_ub
        num_cons = problem.num_cons

        is_eq = cons_lb == cons_ub
        self.slack_positions = np.where(~is_eq)[0]
        num_slacks = len(self.slack_positions)
        self.num_slacks = num_slacks

        # rhs offset for equality constraints with nonzero rhs
        cons_offsets = np.where(is_eq, -cons_lb, 0.0)
        self.cons_offsets = cons_offsets if (cons_offsets != 0.0).any() else None

        var_lb = problem.var_lb
        var_ub = problem.var_ub

        if num_slacks > 0:
            var_lb = np.concatenate([var_lb, cons_lb[self.slack_positions]])
            var_ub = np.concatenate([var_ub, cons_ub[self.slack_positions]])

            # dense (num_cons, num_slacks) block with -1 at (pos_i, i)
            slack_jac = np.zeros((num_cons, num_slacks))
            slack_jac[self.slack_positions, np.arange(num_slacks)] = -1.0
            self._slack_jac = jnp.asarray(slack_jac)

        super().__init__(var_lb, var_ub, num_cons=num_cons)

    def orig_vals(self, x):
        return x[: self.problem.num_vars]

    def slack_vals(self, x):
        return x[self.problem.num_vars :]

    def obj(self, x):
        return self.problem.obj(self.orig_vals(x))

    def obj_grad(self, x):
        grad = self.problem.obj_grad(self.orig_vals(x))
        if self.num_slacks == 0:
            return grad
        return jnp.concatenate([grad, jnp.zeros((self.num_slacks,), dtype=grad.dtype)])

    def cons(self, x):
        c = self.problem.cons(self.orig_vals(x))
        if self.cons_offsets is not None:
            c = c + jnp.asarray(self.cons_offsets, dtype=c.dtype)
        if self.num_slacks == 0:
            return c
        s = self.slack_vals(x)
        return c.at[jnp.asarray(self.slack_positions)].add(-s)

    def cons_jac(self, x):
        jac = self.problem.cons_jac(self.orig_vals(x))
        if self.num_slacks == 0:
            return jac
        return jnp.concatenate([jac, self._slack_jac.astype(jac.dtype)], axis=1)

    def lag_hess(self, x, y):
        hess = self.problem.lag_hess(self.orig_vals(x), y)
        if self.num_slacks == 0:
            return hess
        n_orig = self.problem.num_vars
        ns = self.num_slacks
        top = jnp.concatenate(
            [hess, jnp.zeros((n_orig, ns), dtype=hess.dtype)], axis=1
        )
        bot = jnp.zeros((ns, n_orig + ns), dtype=hess.dtype)
        return jnp.concatenate([top, bot], axis=0)

    def transform_sol(self, orig_x, orig_y):
        """Append clipped initial slack values (``cons_problem.py:129-157``)."""
        if self.num_slacks == 0:
            return (orig_x, orig_y)

        cons_vals = self.problem.cons(orig_x)
        pos = jnp.asarray(self.slack_positions)
        slack_vals = jnp.clip(
            cons_vals[pos],
            jnp.asarray(self.problem.cons_lb)[pos],
            jnp.asarray(self.problem.cons_ub)[pos],
        )
        return (jnp.concatenate([orig_x, slack_vals]), orig_y)

    def restore_sol(self, x, y, d):
        if self.num_slacks == 0:
            return (x, y, d)
        return (self.orig_vals(x), y, self.orig_vals(d))
