"""CUTEst benchmark adapter (reference ``runners/cutest_runner.py``).

Wraps pycutest-decoded problems as :class:`pygradflow_tpu.problem.Problem`
instances.  pycutest evaluates through Fortran callbacks (not
JAX-traceable), so derivatives use the *explicit-derivative escape hatch*
(``Problem.obj_grad``/``cons_jac``/``lag_hess`` overrides) backed by
``jax.pure_callback`` — the homotopy loop still jits, with host callbacks
at the evaluation boundary.  Like the reference, nonlinear-equation
problems (objective = 0, residual constraints) are translated to
``min 1/2 ||c(x)||^2`` with a Gauss-Newton Hessian
(``cutest_runner.py:87-117``); infinite bounds are mapped at 1e20
(``cutest_runner.py:16-21``).

Requires pycutest + a CUTEst installation; the runner degrades to an empty
instance list with a warning otherwise.
"""

import numpy as np

from ..log import logger
from ..problem import Problem
from .instance import Instance
from .runner import Runner

CUTEST_INF = 1e20


def _map_inf(values):
    values = np.asarray(values, dtype=np.float64)
    out = np.where(values >= CUTEST_INF, np.inf, values)
    out = np.where(values <= -CUTEST_INF, -np.inf, out)
    return out


class CUTEstProblem(Problem):
    """General constrained CUTEst problem via host callbacks."""

    def __init__(self, cutest):
        import jax
        import jax.numpy as jnp

        self._cutest = cutest
        self._jax = jax
        self._jnp = jnp

        var_lb = _map_inf(cutest.bl)
        var_ub = _map_inf(cutest.bu)

        if cutest.m > 0:
            cons_lb = _map_inf(cutest.cl)
            cons_ub = _map_inf(cutest.cu)
            super().__init__(var_lb, var_ub, cons_lb=cons_lb, cons_ub=cons_ub)
        else:
            super().__init__(var_lb, var_ub)

    # host-callback evaluation boundary ---------------------------------

    def _cb(self, fn, shape_dtype, x, *args):
        jax = self._jax
        return jax.pure_callback(
            fn, shape_dtype, x, *args, vmap_method="sequential"
        )

    def obj(self, x):
        import jax

        def f(xv):
            return np.asarray(self._cutest.obj(np.asarray(xv, dtype=np.float64)))

        return self._cb(f, jax.ShapeDtypeStruct((), np.float64), x)

    def obj_grad(self, x):
        import jax

        def g(xv):
            _, grad = self._cutest.obj(np.asarray(xv, dtype=np.float64), gradient=True)
            return np.asarray(grad)

        return self._cb(g, jax.ShapeDtypeStruct((self.num_vars,), np.float64), x)

    def cons(self, x):
        import jax

        def c(xv):
            return np.asarray(self._cutest.cons(np.asarray(xv, dtype=np.float64)))

        return self._cb(c, jax.ShapeDtypeStruct((self.num_cons,), np.float64), x)

    def cons_jac(self, x):
        import jax

        def jfun(xv):
            _, jac = self._cutest.cons(np.asarray(xv, dtype=np.float64), gradient=True)
            return np.asarray(jac, dtype=np.float64)

        return self._cb(
            jfun,
            jax.ShapeDtypeStruct((self.num_cons, self.num_vars), np.float64),
            x,
        )

    def lag_hess(self, x, y):
        import jax

        def h(xv, yv):
            if self.num_cons > 0:
                out = self._cutest.hess(
                    np.asarray(xv, dtype=np.float64), v=np.asarray(yv, dtype=np.float64)
                )
            else:
                out = self._cutest.hess(np.asarray(xv, dtype=np.float64))
            return np.asarray(out, dtype=np.float64)

        n = self.num_vars
        return self._cb(h, jax.ShapeDtypeStruct((n, n), np.float64), x, y)


def is_ne_problem(name):
    """Nonlinear-equation SIF convention: the name ends in "NE"
    (reference ``cutest_runner.py:12-13``)."""
    return name.endswith("NE")


class CUTEstNEProblem(Problem):
    """Nonlinear-equation problem translated to bound-constrained least
    squares: ``min 1/2 ||c(x)||^2`` with gradient ``J^T c`` and the
    Gauss-Newton Hessian ``J^T J`` (reference ``cutest_runner.py:87-117``
    NECUTEstProblem) — the "constraints" of the SIF decode are the
    residuals, the translated problem has none."""

    def __init__(self, cutest):
        import jax

        self._cutest = cutest
        self._jax = jax
        self._m = int(cutest.m)

        super().__init__(_map_inf(cutest.bl), _map_inf(cutest.bu))

    def _cb(self, fn, shape_dtype, *args):
        return self._jax.pure_callback(
            fn, shape_dtype, *args, vmap_method="sequential"
        )

    def obj(self, x):
        import jax

        def f(xv):
            r = np.asarray(self._cutest.cons(np.asarray(xv, dtype=np.float64)))
            return np.asarray(0.5 * np.dot(r, r))

        return self._cb(f, jax.ShapeDtypeStruct((), np.float64), x)

    def obj_grad(self, x):
        import jax

        def g(xv):
            r, jac = self._cutest.cons(
                np.asarray(xv, dtype=np.float64), gradient=True
            )
            return np.asarray(jac).T.dot(np.asarray(r))

        return self._cb(g, jax.ShapeDtypeStruct((self.num_vars,), np.float64), x)

    def lag_hess(self, x, y):
        import jax

        def h(xv):
            _, jac = self._cutest.cons(
                np.asarray(xv, dtype=np.float64), gradient=True
            )
            jac = np.asarray(jac, dtype=np.float64)
            return jac.T.dot(jac)

        n = self.num_vars
        return self._cb(h, jax.ShapeDtypeStruct((n, n), np.float64), x)


class CUTEstInstance(Instance):
    """Lazy instance: the SIF decode (``pycutest.import_problem``) runs at
    ``problem()`` time, not at listing time (the reference defers the same
    way, ``cutest_runner.py:134-151``)."""

    def __init__(self, name, num_vars, num_cons):
        super().__init__(name, num_vars, num_cons)
        self._decoded = None

    def _cutest(self):
        if self._decoded is None:
            import pycutest

            self._decoded = pycutest.import_problem(self.name)
        return self._decoded

    def problem(self):
        cutest = self._cutest()
        if is_ne_problem(self.name):
            return CUTEstNEProblem(cutest)
        return CUTEstProblem(cutest)

    def x0(self):
        return np.asarray(self._cutest().x0, dtype=np.float64)

    def y0(self):
        cutest = self._cutest()
        if (
            not is_ne_problem(self.name)
            and cutest.m > 0
            and getattr(cutest, "v0", None) is not None
        ):
            return np.asarray(cutest.v0, dtype=np.float64)
        return 0.0


class CUTEstRunner(Runner):
    def __init__(self):
        super().__init__(name="cutest")

    def parser(self):
        parser = super().parser()
        parser.add_argument(
            "--problems", nargs="*", help="CUTEst problem names (default: all)"
        )
        parser.add_argument(
            "--ignore_ne_probs",
            action="store_true",
            help="skip *NE nonlinear-equation problems "
            "(reference cutest_runner.py:161)",
        )
        return parser

    def get_instances(self, args):
        try:
            import pycutest
        except ImportError:
            logger.warning("pycutest is not installed; no CUTEst instances")
            return []

        names = args.problems or pycutest.find_problems()
        instances = []
        for name in names:
            if args.ignore_ne_probs and is_ne_problem(name):
                continue
            try:
                props = pycutest.problem_properties(name)
            except Exception as exc:
                logger.warning("No properties for CUTEst problem %s: %s", name, exc)
                continue
            n, m = props.get("n"), props.get("m")
            # variable-dimension SIF entries need an explicit size choice;
            # skip them like the reference (cutest_runner.py:171-176)
            if n == "variable" or m == "variable":
                continue
            m = 0 if m is None else m
            # the TRANSLATED NE problem is unconstrained
            instances.append(
                CUTEstInstance(name, n, 0 if is_ne_problem(name) else m)
            )
        return instances


if __name__ == "__main__":
    CUTEstRunner().main()
