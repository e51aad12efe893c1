"""Analytic test problems with known optima.

The same classical fixtures the reference tests use
(``tests/pygradflow/rosenbrock.py``, ``hs71.py``, ``hs71_cons.py``,
``tame.py``, ``target_problem.py``, ``test_qp.py:12-41``), defined
JAX-natively: only ``obj``/``cons`` are written out, all derivatives come
from autodiff.
"""

import jax.numpy as jnp
import numpy as np

from pygradflow_tpu.problem import Problem


class Rosenbrock(Problem):
    """Classic 2D Rosenbrock, unconstrained; optimum (1, 1)."""

    def __init__(self, a=1.0, b=100.0):
        self.a = a
        self.b = b
        super().__init__(np.array([-np.inf, -np.inf]), np.array([np.inf, np.inf]))

    def obj(self, v):
        x, y = v[0], v[1]
        return (self.a - x) ** 2 + self.b * (y - x**2) ** 2


class BoundedQuad(Problem):
    """``min 1/2 ||x - c||^2`` over the unit box — tiny fixture for
    active-set classification tests (gradient at x is x - c)."""

    def __init__(self, c):
        self.c = np.asarray(c, dtype=float)
        n = self.c.shape[0]
        super().__init__(np.zeros(n), np.ones(n))

    def obj(self, x):
        return 0.5 * jnp.sum((x - self.c) ** 2)


class HS71(Problem):
    """Hock-Schittkowski 71 with an explicit slack variable making both
    nonlinear constraints equalities (mirrors the reference fixture)."""

    def __init__(self):
        lb = np.array([1.0, 1.0, 1.0, 1.0, 0.0])
        ub = np.array([5.0, 5.0, 5.0, 5.0, np.inf])
        super().__init__(lb, ub, num_cons=2)

    def obj(self, x):
        xx = x[:-1]
        return xx[0] * xx[3] * (xx[0] + xx[1] + xx[2]) + xx[2]

    def cons(self, x):
        xx = x[:-1]
        s = x[-1]
        return jnp.array([jnp.prod(xx) - s - 25.0, jnp.dot(xx, xx) - 40.0])


class HS71Constrained(Problem):
    """HS71 with ranged + equality constraints, exercising the slack
    transform."""

    def __init__(self):
        var_lb = np.array([1.0, 1.0, 1.0, 1.0])
        var_ub = np.array([5.0, 5.0, 5.0, 5.0])
        cons_lb = np.array([25.0, 40.0])
        cons_ub = np.array([np.inf, 40.0])
        super().__init__(var_lb, var_ub, cons_lb=cons_lb, cons_ub=cons_ub)

    def obj(self, x):
        return x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2]

    def cons(self, x):
        return jnp.array([jnp.prod(x), jnp.dot(x, x)])


class Tame(Problem):
    """Two variables, one linear constraint; Newton converges in one step."""

    def __init__(self):
        super().__init__(
            np.array([-np.inf, -np.inf]), np.array([np.inf, np.inf]), num_cons=1
        )

    def obj(self, z):
        return (z[0] - z[1]) ** 2

    def cons(self, z):
        return jnp.array([z[0] + z[1] - 1.0])


TARGET_X0 = np.array([-1.0, 1.0])
TARGET_X1 = np.array([1.0, -1.0])


class TargetProblem(Problem):
    """Two global optima at TARGET_X0/TARGET_X1 with indefinite Hessian
    regions in between."""

    def __init__(self):
        super().__init__(np.array([-np.inf, -np.inf]), np.array([np.inf, np.inf]))

    def obj(self, x):
        d0 = x - TARGET_X0
        d1 = x - TARGET_X1
        return jnp.dot(d0, d0) * jnp.dot(d1, d1)


class LaplacianQP(Problem):
    """Box-constrained QP with a discretized 1D Laplacian Hessian
    (reference ``test_qp.py:12-41``): min 1/2 x^T A x - b^T x, 0 <= x."""

    def __init__(self, n=49):
        h = 1.0 / (n + 1)
        main = 2.0 * np.ones(n)
        off = -1.0 * np.ones(n - 1)
        A = (np.diag(main) + np.diag(off, 1) + np.diag(off, -1)) / h**2
        t = np.linspace(h, 1.0 - h, n)
        b = (np.pi**2) * np.sin(np.pi * t)

        self.A = jnp.asarray(A)
        self.b = jnp.asarray(b)

        super().__init__(np.zeros(n), np.full(n, np.inf))

    def obj(self, x):
        return 0.5 * jnp.dot(x, self.A @ x) - jnp.dot(self.b, x)

    def obj_grad(self, x):
        return self.A @ x - self.b

    def lag_hess(self, x, y):
        return self.A


class Instance:
    def __init__(self, problem, x_0, y_0, x_opt, y_opt):
        self.problem = problem
        self.x_0 = x_0
        self.y_0 = y_0
        self.x_opt = x_opt
        self.y_opt = y_opt


def rosenbrock_instance():
    return Instance(
        Rosenbrock(),
        np.array([0.0, 0.0]),
        np.array([]),
        np.array([1.0, 1.0]),
        np.array([]),
    )


def hs71_instance():
    return Instance(
        HS71(),
        np.array([1.0, 5.0, 5.0, 1.0, 0.0]),
        np.array([0.0, 0.0]),
        np.array([1.0, 4.74299964, 3.82114998, 1.37940829, 0.0]),
        np.array([-0.55229366, 0.16146857]),
    )


def hs71_constrained_instance():
    return Instance(
        HS71Constrained(),
        np.array([1.0, 5.0, 5.0, 1.0]),
        np.array([0.0, 0.0]),
        np.array([1.0, 4.74299964, 3.82114998, 1.37940829]),
        np.array([-0.55229366, 0.16146857]),
    )


def tame_instance():
    return Instance(
        Tame(),
        np.array([0.0, 0.0]),
        np.array([0.0]),
        np.array([0.5, 0.5]),
        np.array([0.0]),
    )


class ConstrainedRosenbrock(Problem):
    """Box + equality constrained Rosenbrock (BASELINE config #2): the
    unconstrained optimum (1, 1) is cut off by the box ub and a linear
    equality, forcing active-set changes along the homotopy path."""

    def __init__(self):
        super().__init__(
            np.array([-1.5, -0.5]), np.array([0.8, 2.0]), num_cons=1
        )

    def obj(self, v):
        return (1.0 - v[0]) ** 2 + 100.0 * (v[1] - v[0] ** 2) ** 2

    def cons(self, v):
        return jnp.array([v[0] + v[1] - 1.0])
