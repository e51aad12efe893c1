"""Problem transformation pipeline (reference ``pygradflow/transform.py``).

Composes: user problem -> optional power-of-2 ``ScaledProblem`` ->
``ConstrainedProblem`` (slack introduction).  After the pipeline the solver
only ever sees equality constraints ``c(x) = 0`` plus box bounds.
"""

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .cons_problem import ConstrainedProblem
from .eval import make_fns
from .params import Params
from .problem import Problem
from .scale import ScaledProblem, create_scaling


class Transformation:
    def __init__(self, orig_problem: Problem, params: Params):
        self.orig_problem = orig_problem
        self.params = params

        self.scaling = create_scaling(
            orig_problem, params, params.scaling_primal, params.scaling_dual
        )

        if self.scaling is None:
            self.scaled_problem = orig_problem
        else:
            self.scaled_problem = ScaledProblem(orig_problem, self.scaling)

        self.trans_problem = ConstrainedProblem(self.scaled_problem)
        self.fns = make_fns(self.trans_problem, params)

    def create_transformed_initial(self, x0, y0):
        """Initial point: x0 defaults to 0 clipped into bounds, y0 to 0
        (reference ``transform.py:29-54``); then scale + append slacks."""
        orig_problem = self.orig_problem
        dtype = self.params.dtype

        if x0 is None:
            x = np.clip(
                np.zeros((orig_problem.num_vars,)),
                orig_problem.var_lb,
                orig_problem.var_ub,
            )
        else:
            x = np.broadcast_to(np.asarray(x0, dtype=np.float64), (orig_problem.num_vars,))

        if y0 is None:
            y = np.zeros((orig_problem.num_cons,))
        else:
            y = np.broadcast_to(np.asarray(y0, dtype=np.float64), (orig_problem.num_cons,))

        (x, y) = self.transform_sol(jnp.asarray(x), jnp.asarray(y))
        return jnp.asarray(x, dtype=dtype), jnp.asarray(y, dtype=dtype)

    def transform_sol(self, x, y):
        if self.scaling is not None:
            x = self.scaling.scale_primal(x)
            y = self.scaling.scale_dual(y)
        return self.trans_problem.transform_sol(x, y)

    def restore_sol(self, x, y, d):
        (x, y, d) = self.trans_problem.restore_sol(x, y, d)
        if self.scaling is None:
            return (x, y, d)
        return (
            self.scaling.unscale_primal(x),
            self.scaling.unscale_dual(y),
            self.scaling.unscale_bounds_dual(d),
        )
