"""Power-of-2 problem scaling.

Exponent-only scaling (mantissas untouched), mirroring the reference
semantics (``pygradflow/scale.py:47-280``): integer weights per variable /
constraint / objective, applied via ``ldexp``.  Exponent arithmetic is exact
in JAX just as in NumPy, so scaled solves are bit-compatible reorderings of
unscaled ones.
"""

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .params import Params, ScalingType
from .problem import Problem


def scale_symmetric(A: np.ndarray, max_it: int = 100) -> np.ndarray:
    """Iterative symmetric equilibration returning integer exponent weights
    ``D`` such that ``ldexp(A[i, j], D[i] + D[j])`` has row norms in [1, 2).

    Dense counterpart of the reference sparse loop
    (``pygradflow/scale.py:11-44``).
    """
    A = np.abs(np.asarray(A, dtype=np.float64))
    (n, _) = A.shape

    D = np.zeros((n,), dtype=int)

    for _ in range(max_it):
        R = A.sum(axis=0)
        R[R < 1e-10] = 1.0
        R = np.sqrt(R)

        Rsca = 1 - np.frexp(R)[1]
        if (Rsca == 0).all():
            break

        A = np.ldexp(A, Rsca[:, None] + Rsca[None, :])
        D += Rsca
    else:
        raise Exception("Equilibration failed to converge")

    return D


class Scaling:
    """Integer power-of-2 scaling weights (reference ``scale.py:47-150``)."""

    def __init__(self, var_weights, cons_weights, obj_weight: int = 0):
        var_weights = np.asarray(var_weights)
        cons_weights = np.asarray(cons_weights)

        assert var_weights.ndim == 1
        assert np.issubdtype(var_weights.dtype, np.integer)
        assert cons_weights.ndim == 1
        assert np.issubdtype(cons_weights.dtype, np.integer)

        self.var_weights = var_weights
        self.cons_weights = cons_weights
        self.obj_weight = int(obj_weight)

    @staticmethod
    def zero(num_vars, num_cons):
        return Scaling(
            np.zeros((num_vars,), dtype=int), np.zeros((num_cons,), dtype=int)
        )

    @staticmethod
    def weights_from_nominal_values(values):
        return 1 - np.frexp(np.asarray(values))[1]

    @staticmethod
    def from_nominal_values(var_values, cons_values, obj_value=1.0):
        return Scaling(
            Scaling.weights_from_nominal_values(var_values),
            Scaling.weights_from_nominal_values(cons_values),
            int(Scaling.weights_from_nominal_values(obj_value)),
        )

    @staticmethod
    def from_grad_jac(obj_grad, cons_jac):
        """Variable weights from gradient magnitudes; constraint weights from
        row maxima of the prescaled Jacobian (``scale.py:79-104``)."""
        obj_grad = np.asarray(obj_grad)
        grad_weights = Scaling.weights_from_nominal_values(np.abs(obj_grad))
        var_weights = -grad_weights

        if cons_jac is None or np.asarray(cons_jac).shape[0] == 0:
            return Scaling(var_weights, np.zeros((0,), dtype=int))

        jac = np.abs(np.asarray(cons_jac, dtype=np.float64))
        prescaled = np.ldexp(jac, -var_weights[None, :])
        max_values = prescaled.max(axis=1).astype(int)

        cons_weights = Scaling.weights_from_nominal_values(max_values)
        return Scaling(var_weights, cons_weights)

    @staticmethod
    def from_equilibrated_kkt(lag_hess, cons_jac):
        lag_hess = np.asarray(lag_hess)
        cons_jac = np.asarray(cons_jac)
        (m, n) = cons_jac.shape
        assert lag_hess.shape == (n, n)

        kkt = np.zeros((n + m, n + m))
        kkt[:n, :n] = lag_hess
        kkt[:n, n:] = cons_jac.T
        kkt[n:, :n] = cons_jac

        weights = scale_symmetric(kkt)
        return Scaling(-weights[:n], weights[n:].astype(int))

    @property
    def num_vars(self):
        return len(self.var_weights)

    @property
    def num_cons(self):
        return len(self.cons_weights)

    def _dual_weights(self):
        return self.cons_weights - self.obj_weight

    def _bound_weights(self):
        return self.var_weights - self.obj_weight

    def scale_primal(self, x):
        return jnp.ldexp(x, self.var_weights)

    def unscale_primal(self, x):
        return jnp.ldexp(x, -self.var_weights)

    def scale_dual(self, y):
        return jnp.ldexp(y, -self._dual_weights())

    def unscale_dual(self, y):
        return jnp.ldexp(y, self._dual_weights())

    def scale_bounds_dual(self, d):
        return jnp.ldexp(d, -self._bound_weights())

    def unscale_bounds_dual(self, d):
        return jnp.ldexp(d, self._bound_weights())


class ScaledProblem(Problem):
    """Problem wrapper rescaling all evaluations by the power-of-2 weights
    (reference ``scale.py:153-230``)."""

    def __init__(self, problem: Problem, scaling: Scaling):
        self.problem = problem
        self.scaling = scaling

        var_lb = np.ldexp(problem.var_lb, scaling.var_weights)
        var_ub = np.ldexp(problem.var_ub, scaling.var_weights)
        cons_lb = np.ldexp(problem.cons_lb, scaling.cons_weights)
        cons_ub = np.ldexp(problem.cons_ub, scaling.cons_weights)

        super().__init__(var_lb, var_ub, cons_lb=cons_lb, cons_ub=cons_ub)

    def _orig_x(self, x):
        return jnp.ldexp(x, -self.scaling.var_weights)

    def obj(self, x):
        return jnp.ldexp(self.problem.obj(self._orig_x(x)), self.scaling.obj_weight)

    def obj_grad(self, x):
        grad = self.problem.obj_grad(self._orig_x(x))
        grad = jnp.ldexp(grad, -self.scaling.var_weights)
        return jnp.ldexp(grad, self.scaling.obj_weight)

    def cons(self, x):
        c = self.problem.cons(self._orig_x(x))
        return jnp.ldexp(c, self.scaling.cons_weights)

    def cons_jac(self, x):
        jac = self.problem.cons_jac(self._orig_x(x))
        w = (
            self.scaling.cons_weights[:, None]
            - self.scaling.var_weights[None, :]
        )
        return jnp.ldexp(jac, w)

    def lag_hess(self, x, y):
        sc = self.scaling
        y_orig = jnp.ldexp(y, sc.cons_weights - sc.obj_weight)
        hess = self.problem.lag_hess(self._orig_x(x), y_orig)
        w = sc.obj_weight - sc.var_weights[:, None] - sc.var_weights[None, :]
        return jnp.ldexp(hess, w)


def create_scaling(
    problem: Problem,
    params: Params,
    scaling_primal: Optional[np.ndarray],
    scaling_dual: Optional[np.ndarray],
) -> Optional[Scaling]:
    """Factory keyed on ``ScalingType`` (reference ``scale.py:233-280``)."""
    scaling_type = params.scaling_type

    if params.scaling is not None:
        assert scaling_type == ScalingType.Custom
        return params.scaling

    if scaling_type == ScalingType.NoScaling:
        return None
    elif scaling_type == ScalingType.Custom:
        raise ValueError("Custom scaling requires explicit scaling")

    if scaling_primal is None:
        raise ValueError("Primal point required for scaling computation")

    scaling_primal = np.asarray(scaling_primal)
    assert scaling_primal.shape == (problem.num_vars,)
    x0 = jnp.asarray(scaling_primal)

    if scaling_type == ScalingType.Nominal:
        if problem.num_cons > 0:
            cons_val = np.asarray(problem.cons(x0))
        else:
            cons_val = np.array([], dtype=scaling_primal.dtype)
        return Scaling.from_nominal_values(scaling_primal, cons_val)

    if problem.num_cons > 0:
        cons_jac = np.asarray(problem.cons_jac(x0))
    else:
        cons_jac = np.zeros((0, problem.num_vars))

    if scaling_type == ScalingType.GradJac:
        obj_grad = np.asarray(problem.obj_grad(x0))
        return Scaling.from_grad_jac(obj_grad, cons_jac)
    elif scaling_type == ScalingType.KKT:
        if scaling_dual is None:
            raise ValueError("Dual point required for KKT scaling computation")
        scaling_dual = np.asarray(scaling_dual)
        assert scaling_dual.shape == (problem.num_cons,)
        lag_hess = np.asarray(problem.lag_hess(x0, jnp.asarray(scaling_dual)))
        return Scaling.from_equilibrated_kkt(lag_hess, cons_jac)
    else:
        raise ValueError(f"Unknown scaling type {scaling_type}")
