"""Native Hock-Schittkowski test suite.

The reference benchmarks against CUTEst via the Fortran pycutest binding
(``runners/cutest_runner.py``); on TPU the equivalent is a pure-JAX
collection of the classical Hock-Schittkowski problems (standard
formulations from the H&S book) with autodiff derivatives — per the
build plan (SURVEY.md §7, stage 8).

Each entry records the book initial point and, where closed-form, the
known optimum and optimal value for verification.
"""

import math
from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..problem import Problem

INF = np.inf


class HSProblem(Problem):
    def __init__(self, spec):
        self._spec = spec
        kwargs = {}
        if spec.cons_lb is not None or spec.cons_ub is not None:
            kwargs = dict(cons_lb=spec.cons_lb, cons_ub=spec.cons_ub)
        elif spec.num_eq_cons:
            kwargs = dict(num_cons=spec.num_eq_cons)
        super().__init__(spec.var_lb, spec.var_ub, **kwargs)

    def obj(self, x):
        return self._spec.obj(x)

    def cons(self, x):
        return self._spec.cons(x)


class HSSpec(NamedTuple):
    name: str
    obj: Callable
    var_lb: np.ndarray
    var_ub: np.ndarray
    x0: np.ndarray
    cons: Optional[Callable] = None
    cons_lb: Optional[np.ndarray] = None
    cons_ub: Optional[np.ndarray] = None
    num_eq_cons: int = 0
    x_opt: Optional[np.ndarray] = None
    f_opt: Optional[float] = None

    def problem(self) -> HSProblem:
        return HSProblem(self)


def _a(*vals):
    return np.array(vals, dtype=np.float64)


def _rosenbrock_obj(x):
    return 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2


HS_SPECS = [
    HSSpec(
        name="hs1",
        obj=_rosenbrock_obj,
        var_lb=_a(-INF, -1.5),
        var_ub=_a(INF, INF),
        x0=_a(-2.0, 1.0),
        x_opt=_a(1.0, 1.0),
        f_opt=0.0,
    ),
    HSSpec(
        name="hs2",
        obj=_rosenbrock_obj,
        var_lb=_a(-INF, 1.5),
        var_ub=_a(INF, INF),
        x0=_a(-2.0, 1.0),
        x_opt=_a(1.2243707487363527, 1.5),
        f_opt=0.05042618789356104,
    ),
    HSSpec(
        name="hs3",
        obj=lambda x: x[1] + 1e-5 * (x[1] - x[0]) ** 2,
        var_lb=_a(-INF, 0.0),
        var_ub=_a(INF, INF),
        x0=_a(10.0, 1.0),
        x_opt=_a(0.0, 0.0),
        f_opt=0.0,
    ),
    HSSpec(
        name="hs4",
        obj=lambda x: (x[0] + 1.0) ** 3 / 3.0 + x[1],
        var_lb=_a(1.0, 0.0),
        var_ub=_a(INF, INF),
        x0=_a(1.125, 0.125),
        x_opt=_a(1.0, 0.0),
        f_opt=8.0 / 3.0,
    ),
    HSSpec(
        name="hs5",
        obj=lambda x: (
            jnp.sin(x[0] + x[1])
            + (x[0] - x[1]) ** 2
            - 1.5 * x[0]
            + 2.5 * x[1]
            + 1.0
        ),
        var_lb=_a(-1.5, -3.0),
        var_ub=_a(4.0, 3.0),
        x0=_a(0.0, 0.0),
        x_opt=_a(0.5 - math.pi / 3.0, 0.5 - math.pi / 3.0 - 1.0),
        f_opt=-math.sqrt(3.0) / 2.0 - math.pi / 3.0,
    ),
    HSSpec(
        name="hs6",
        obj=lambda x: (1.0 - x[0]) ** 2,
        var_lb=_a(-INF, -INF),
        var_ub=_a(INF, INF),
        x0=_a(-1.2, 1.0),
        cons=lambda x: jnp.array([10.0 * (x[1] - x[0] ** 2)]),
        num_eq_cons=1,
        x_opt=_a(1.0, 1.0),
        f_opt=0.0,
    ),
    HSSpec(
        name="hs7",
        obj=lambda x: jnp.log(1.0 + x[0] ** 2) - x[1],
        var_lb=_a(-INF, -INF),
        var_ub=_a(INF, INF),
        x0=_a(2.0, 2.0),
        cons=lambda x: jnp.array([(1.0 + x[0] ** 2) ** 2 + x[1] ** 2 - 4.0]),
        num_eq_cons=1,
        x_opt=_a(0.0, math.sqrt(3.0)),
        f_opt=-math.sqrt(3.0),
    ),
    HSSpec(
        name="hs14",
        obj=lambda x: (x[0] - 2.0) ** 2 + (x[1] - 1.0) ** 2,
        var_lb=_a(-INF, -INF),
        var_ub=_a(INF, INF),
        x0=_a(2.0, 2.0),
        cons=lambda x: jnp.array(
            [x[0] - 2.0 * x[1] + 1.0, -0.25 * x[0] ** 2 - x[1] ** 2 + 1.0]
        ),
        cons_lb=_a(0.0, 0.0),
        cons_ub=_a(0.0, INF),
        x_opt=_a(0.5 * (math.sqrt(7.0) - 1.0), 0.25 * (math.sqrt(7.0) + 1.0)),
        f_opt=9.0 - 2.875 * math.sqrt(7.0),
    ),
    HSSpec(
        name="hs21",
        obj=lambda x: 0.01 * x[0] ** 2 + x[1] ** 2 - 100.0,
        var_lb=_a(2.0, -50.0),
        var_ub=_a(50.0, 50.0),
        x0=_a(-1.0, -1.0),
        cons=lambda x: jnp.array([10.0 * x[0] - x[1]]),
        cons_lb=_a(10.0),
        cons_ub=_a(INF),
        x_opt=_a(2.0, 0.0),
        f_opt=-99.96,
    ),
    HSSpec(
        name="hs28",
        obj=lambda x: (x[0] + x[1]) ** 2 + (x[1] + x[2]) ** 2,
        var_lb=_a(-INF, -INF, -INF),
        var_ub=_a(INF, INF, INF),
        x0=_a(-4.0, 1.0, 1.0),
        cons=lambda x: jnp.array([x[0] + 2.0 * x[1] + 3.0 * x[2] - 1.0]),
        num_eq_cons=1,
        x_opt=_a(0.5, -0.5, 0.5),
        f_opt=0.0,
    ),
    HSSpec(
        name="hs35",
        obj=lambda x: (
            9.0
            - 8.0 * x[0]
            - 6.0 * x[1]
            - 4.0 * x[2]
            + 2.0 * x[0] ** 2
            + 2.0 * x[1] ** 2
            + x[2] ** 2
            + 2.0 * x[0] * x[1]
            + 2.0 * x[0] * x[2]
        ),
        var_lb=_a(0.0, 0.0, 0.0),
        var_ub=_a(INF, INF, INF),
        x0=_a(0.5, 0.5, 0.5),
        cons=lambda x: jnp.array([x[0] + x[1] + 2.0 * x[2]]),
        cons_lb=_a(-INF),
        cons_ub=_a(3.0),
        x_opt=_a(4.0 / 3.0, 7.0 / 9.0, 4.0 / 9.0),
        f_opt=1.0 / 9.0,
    ),
    HSSpec(
        name="hs38",
        obj=lambda x: (
            100.0 * (x[1] - x[0] ** 2) ** 2
            + (1.0 - x[0]) ** 2
            + 90.0 * (x[3] - x[2] ** 2) ** 2
            + (1.0 - x[2]) ** 2
            + 10.1 * ((x[1] - 1.0) ** 2 + (x[3] - 1.0) ** 2)
            + 19.8 * (x[1] - 1.0) * (x[3] - 1.0)
        ),
        var_lb=np.full(4, -10.0),
        var_ub=np.full(4, 10.0),
        x0=_a(-3.0, -1.0, -3.0, -1.0),
        x_opt=np.ones(4),
        f_opt=0.0,
    ),
    HSSpec(
        name="hs45",
        obj=lambda x: 2.0 - x[0] * x[1] * x[2] * x[3] * x[4] / 120.0,
        var_lb=np.zeros(5),
        var_ub=_a(1.0, 2.0, 3.0, 4.0, 5.0),
        x0=np.full(5, 2.0) .clip(np.zeros(5), _a(1.0, 2.0, 3.0, 4.0, 5.0)),
        x_opt=_a(1.0, 2.0, 3.0, 4.0, 5.0),
        f_opt=1.0,
    ),
    HSSpec(
        name="hs48",
        obj=lambda x: (x[0] - 1.0) ** 2 + (x[1] - x[2]) ** 2 + (x[3] - x[4]) ** 2,
        var_lb=np.full(5, -INF),
        var_ub=np.full(5, INF),
        x0=_a(3.0, 5.0, -3.0, 2.0, -2.0),
        cons=lambda x: jnp.array(
            [
                x[0] + x[1] + x[2] + x[3] + x[4] - 5.0,
                x[2] - 2.0 * (x[3] + x[4]) + 3.0,
            ]
        ),
        num_eq_cons=2,
        x_opt=np.ones(5),
        f_opt=0.0,
    ),
    HSSpec(
        name="hs51",
        obj=lambda x: (
            (x[0] - x[1]) ** 2
            + (x[1] + x[2] - 2.0) ** 2
            + (x[3] - 1.0) ** 2
            + (x[4] - 1.0) ** 2
        ),
        var_lb=np.full(5, -INF),
        var_ub=np.full(5, INF),
        x0=_a(2.5, 0.5, 2.0, -1.0, 0.5),
        cons=lambda x: jnp.array(
            [
                x[0] + 3.0 * x[1] - 4.0,
                x[2] + x[3] - 2.0 * x[4],
                x[1] - x[4],
            ]
        ),
        num_eq_cons=3,
        x_opt=np.ones(5),
        f_opt=0.0,
    ),
    HSSpec(
        name="hs71",
        obj=lambda x: x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2],
        var_lb=np.ones(4),
        var_ub=np.full(4, 5.0),
        x0=_a(1.0, 5.0, 5.0, 1.0),
        cons=lambda x: jnp.array([jnp.prod(x), jnp.dot(x, x)]),
        cons_lb=_a(25.0, 40.0),
        cons_ub=_a(INF, 40.0),
        x_opt=_a(1.0, 4.74299964, 3.82114998, 1.37940829),
        f_opt=17.0140173,
    ),
    HSSpec(
        name="hs9",
        obj=lambda x: jnp.sin(jnp.pi * x[0] / 12.0) * jnp.cos(jnp.pi * x[1] / 16.0),
        var_lb=_a(-INF, -INF),
        var_ub=_a(INF, INF),
        x0=_a(0.0, 0.0),
        cons=lambda x: jnp.array([4.0 * x[0] - 3.0 * x[1]]),
        num_eq_cons=1,
        x_opt=_a(-3.0, -4.0),
        f_opt=-0.5,
    ),
    HSSpec(
        name="hs10",
        obj=lambda x: x[0] - x[1],
        var_lb=_a(-INF, -INF),
        var_ub=_a(INF, INF),
        x0=_a(-10.0, 10.0),
        cons=lambda x: jnp.array(
            [-3.0 * x[0] ** 2 + 2.0 * x[0] * x[1] - x[1] ** 2 + 1.0]
        ),
        cons_lb=_a(0.0),
        cons_ub=_a(INF),
        x_opt=_a(0.0, 1.0),
        f_opt=-1.0,
    ),
    HSSpec(
        name="hs26",
        obj=lambda x: (x[0] - x[1]) ** 2 + (x[1] - x[2]) ** 4,
        var_lb=_a(-INF, -INF, -INF),
        var_ub=_a(INF, INF, INF),
        x0=_a(-2.6, 2.0, 2.0),
        cons=lambda x: jnp.array(
            [(1.0 + x[1] ** 2) * x[0] + x[2] ** 4 - 3.0]
        ),
        num_eq_cons=1,
        x_opt=_a(1.0, 1.0, 1.0),
        f_opt=0.0,
    ),
    HSSpec(
        name="hs27",
        obj=lambda x: 0.01 * (x[0] - 1.0) ** 2 + (x[1] - x[0] ** 2) ** 2,
        var_lb=_a(-INF, -INF, -INF),
        var_ub=_a(INF, INF, INF),
        x0=_a(2.0, 2.0, 2.0),
        cons=lambda x: jnp.array([x[0] + x[2] ** 2 + 1.0]),
        num_eq_cons=1,
        x_opt=_a(-1.0, 1.0, 0.0),
        f_opt=0.04,
    ),
    HSSpec(
        name="hs30",
        obj=lambda x: x[0] ** 2 + x[1] ** 2 + x[2] ** 2,
        var_lb=_a(1.0, -10.0, -10.0),
        var_ub=_a(10.0, 10.0, 10.0),
        x0=_a(1.0, 1.0, 1.0),
        cons=lambda x: jnp.array([x[0] ** 2 + x[1] ** 2 - 1.0]),
        cons_lb=_a(0.0),
        cons_ub=_a(INF),
        x_opt=_a(1.0, 0.0, 0.0),
        f_opt=1.0,
    ),
    HSSpec(
        name="hs36",
        obj=lambda x: -x[0] * x[1] * x[2],
        var_lb=_a(0.0, 0.0, 0.0),
        var_ub=_a(20.0, 11.0, 42.0),
        x0=_a(10.0, 10.0, 10.0),
        cons=lambda x: jnp.array([x[0] + 2.0 * x[1] + 2.0 * x[2]]),
        cons_lb=_a(-INF),
        cons_ub=_a(72.0),
        x_opt=_a(20.0, 11.0, 15.0),
        f_opt=-3300.0,
    ),
    HSSpec(
        name="hs42",
        obj=lambda x: (
            (x[0] - 1.0) ** 2
            + (x[1] - 2.0) ** 2
            + (x[2] - 3.0) ** 2
            + (x[3] - 4.0) ** 2
        ),
        var_lb=np.full(4, -INF),
        var_ub=np.full(4, INF),
        x0=np.ones(4),
        cons=lambda x: jnp.array(
            [x[0] - 2.0, x[2] ** 2 + x[3] ** 2 - 2.0]
        ),
        num_eq_cons=2,
        x_opt=_a(2.0, 2.0, 0.6 * math.sqrt(2.0), 0.8 * math.sqrt(2.0)),
        f_opt=28.0 - 10.0 * math.sqrt(2.0),
    ),
    HSSpec(
        name="hs12",
        obj=lambda x: 0.5 * x[0] ** 2 + x[1] ** 2 - x[0] * x[1] - 7.0 * x[0] - 7.0 * x[1],
        var_lb=_a(-INF, -INF),
        var_ub=_a(INF, INF),
        x0=_a(0.0, 0.0),
        cons=lambda x: jnp.array([25.0 - 4.0 * x[0] ** 2 - x[1] ** 2]),
        cons_lb=_a(0.0),
        cons_ub=_a(INF),
        x_opt=_a(2.0, 3.0),
        f_opt=-30.0,
    ),
    HSSpec(
        name="hs22",
        obj=lambda x: (x[0] - 2.0) ** 2 + (x[1] - 1.0) ** 2,
        var_lb=_a(-INF, -INF),
        var_ub=_a(INF, INF),
        x0=_a(2.0, 2.0),
        cons=lambda x: jnp.array([-x[0] - x[1] + 2.0, -x[0] ** 2 + x[1]]),
        cons_lb=_a(0.0, 0.0),
        cons_ub=_a(INF, INF),
        x_opt=_a(1.0, 1.0),
        f_opt=1.0,
    ),
    HSSpec(
        name="hs24",
        obj=lambda x: ((x[0] - 3.0) ** 2 - 9.0) * x[1] ** 3 / (27.0 * math.sqrt(3.0)),
        var_lb=_a(0.0, 0.0),
        var_ub=_a(INF, INF),
        x0=_a(1.0, 0.5),
        cons=lambda x: jnp.array(
            [
                x[0] / math.sqrt(3.0) - x[1],
                x[0] + math.sqrt(3.0) * x[1],
                -x[0] - math.sqrt(3.0) * x[1] + 6.0,
            ]
        ),
        cons_lb=_a(0.0, 0.0, 0.0),
        cons_ub=_a(INF, INF, INF),
        x_opt=_a(3.0, math.sqrt(3.0)),
        f_opt=-1.0,
    ),
    HSSpec(
        name="hs29",
        obj=lambda x: -x[0] * x[1] * x[2],
        var_lb=_a(-INF, -INF, -INF),
        var_ub=_a(INF, INF, INF),
        x0=_a(1.0, 1.0, 1.0),
        cons=lambda x: jnp.array(
            [-(x[0] ** 2) - 2.0 * x[1] ** 2 - 4.0 * x[2] ** 2 + 48.0]
        ),
        cons_lb=_a(0.0),
        cons_ub=_a(INF),
        x_opt=_a(4.0, 2.0 * math.sqrt(2.0), 2.0),
        f_opt=-16.0 * math.sqrt(2.0),
    ),
    HSSpec(
        name="hs43",
        obj=lambda x: (
            x[0] ** 2
            + x[1] ** 2
            + 2.0 * x[2] ** 2
            + x[3] ** 2
            - 5.0 * x[0]
            - 5.0 * x[1]
            - 21.0 * x[2]
            + 7.0 * x[3]
        ),
        var_lb=np.full(4, -INF),
        var_ub=np.full(4, INF),
        x0=np.zeros(4),
        cons=lambda x: jnp.array(
            [
                8.0 - x[0] ** 2 - x[1] ** 2 - x[2] ** 2 - x[3] ** 2
                - x[0] + x[1] - x[2] + x[3],
                10.0 - x[0] ** 2 - 2.0 * x[1] ** 2 - x[2] ** 2 - 2.0 * x[3] ** 2
                + x[0] + x[3],
                5.0 - 2.0 * x[0] ** 2 - x[1] ** 2 - x[2] ** 2 - 2.0 * x[0]
                + x[1] + x[3],
            ]
        ),
        cons_lb=np.zeros(3),
        cons_ub=np.full(3, INF),
        x_opt=_a(0.0, 1.0, 2.0, -1.0),
        f_opt=-44.0,
    ),
    HSSpec(
        name="hs49",
        obj=lambda x: (
            (x[0] - x[1]) ** 2
            + (x[2] - 1.0) ** 2
            + (x[3] - 1.0) ** 4
            + (x[4] - 1.0) ** 6
        ),
        var_lb=np.full(5, -INF),
        var_ub=np.full(5, INF),
        x0=_a(10.0, 7.0, 2.0, -3.0, 0.8),
        cons=lambda x: jnp.array(
            [x[0] + x[1] + x[2] + 4.0 * x[3] - 7.0, x[2] + 5.0 * x[4] - 6.0]
        ),
        num_eq_cons=2,
        x_opt=np.ones(5),
        f_opt=0.0,
    ),
    HSSpec(
        name="hs50",
        obj=lambda x: (
            (x[0] - x[1]) ** 2
            + (x[1] - x[2]) ** 2
            + (x[2] - x[3]) ** 4
            + (x[3] - x[4]) ** 2
        ),
        var_lb=np.full(5, -INF),
        var_ub=np.full(5, INF),
        x0=_a(35.0, -31.0, 11.0, 5.0, -5.0),
        cons=lambda x: jnp.array(
            [
                x[0] + 2.0 * x[1] + 3.0 * x[2] - 6.0,
                x[1] + 2.0 * x[2] + 3.0 * x[3] - 6.0,
                x[2] + 2.0 * x[3] + 3.0 * x[4] - 6.0,
            ]
        ),
        num_eq_cons=3,
        x_opt=np.ones(5),
        f_opt=0.0,
    ),
    HSSpec(
        name="hs8",
        obj=lambda x: jnp.asarray(-1.0),
        var_lb=_a(-INF, -INF),
        var_ub=_a(INF, INF),
        x0=_a(2.0, 1.0),
        cons=lambda x: jnp.array(
            [x[0] ** 2 + x[1] ** 2 - 25.0, x[0] * x[1] - 9.0]
        ),
        num_eq_cons=2,
        # four symmetric feasible points; objective is constant
        f_opt=-1.0,
    ),
    HSSpec(
        name="hs11",
        obj=lambda x: (x[0] - 5.0) ** 2 + x[1] ** 2 - 25.0,
        var_lb=_a(-INF, -INF),
        var_ub=_a(INF, INF),
        x0=_a(4.9, 0.1),
        cons=lambda x: jnp.array([x[1] - x[0] ** 2]),
        cons_lb=_a(0.0),
        cons_ub=_a(INF),
        f_opt=-8.498464223,
    ),
    HSSpec(
        name="hs16",
        obj=_rosenbrock_obj,
        var_lb=_a(-2.0, -INF),
        var_ub=_a(0.5, 1.0),
        x0=_a(-2.0, 1.0),
        cons=lambda x: jnp.array(
            [x[0] + x[1] ** 2, x[0] ** 2 + x[1]]
        ),
        cons_lb=_a(0.0, 0.0),
        cons_ub=_a(INF, INF),
        x_opt=_a(0.5, 0.25),
        f_opt=0.25,
    ),
    HSSpec(
        name="hs18",
        obj=lambda x: x[0] ** 2 / 100.0 + x[1] ** 2,
        var_lb=_a(2.0, 0.0),
        var_ub=_a(50.0, 50.0),
        x0=_a(2.0, 2.0),
        cons=lambda x: jnp.array(
            [x[0] * x[1] - 25.0, x[0] ** 2 + x[1] ** 2 - 25.0]
        ),
        cons_lb=_a(0.0, 0.0),
        cons_ub=_a(INF, INF),
        x_opt=_a(math.sqrt(250.0), math.sqrt(2.5)),
        f_opt=5.0,
    ),
    HSSpec(
        name="hs23",
        obj=lambda x: x[0] ** 2 + x[1] ** 2,
        var_lb=_a(-50.0, -50.0),
        var_ub=_a(50.0, 50.0),
        x0=_a(3.0, 1.0),
        cons=lambda x: jnp.array(
            [
                x[0] + x[1] - 1.0,
                x[0] ** 2 + x[1] ** 2 - 1.0,
                9.0 * x[0] ** 2 + x[1] ** 2 - 9.0,
                x[0] ** 2 - x[1],
                x[1] ** 2 - x[0],
            ]
        ),
        cons_lb=np.zeros(5),
        cons_ub=np.full(5, INF),
        x_opt=_a(1.0, 1.0),
        f_opt=2.0,
    ),
    HSSpec(
        name="hs31",
        obj=lambda x: 9.0 * x[0] ** 2 + x[1] ** 2 + 9.0 * x[2] ** 2,
        var_lb=_a(-10.0, 1.0, -10.0),
        var_ub=_a(10.0, 10.0, 1.0),
        x0=_a(1.0, 1.0, 1.0),
        cons=lambda x: jnp.array([x[0] * x[1] - 1.0]),
        cons_lb=_a(0.0),
        cons_ub=_a(INF),
        x_opt=_a(1.0 / math.sqrt(3.0), math.sqrt(3.0), 0.0),
        f_opt=6.0,
    ),
    HSSpec(
        name="hs33",
        obj=lambda x: (x[0] - 1.0) * (x[0] - 2.0) * (x[0] - 3.0) + x[2],
        var_lb=_a(0.0, 0.0, 0.0),
        var_ub=_a(INF, INF, 5.0),
        x0=_a(0.0, 0.0, 3.0),
        cons=lambda x: jnp.array(
            [
                x[2] ** 2 - x[1] ** 2 - x[0] ** 2,
                x[0] ** 2 + x[1] ** 2 + x[2] ** 2 - 4.0,
            ]
        ),
        cons_lb=_a(0.0, 0.0),
        cons_ub=_a(INF, INF),
        # nonconvex: from the book start the homotopy (like any local
        # method) converges to the KKT point x=(0,0,2), f=-4; the book's
        # global optimum is (0,sqrt2,sqrt2), f=sqrt2-6
        x_opt=None,
        f_opt=None,
    ),
    HSSpec(
        name="hs52",
        obj=lambda x: (
            (4.0 * x[0] - x[1]) ** 2
            + (x[1] + x[2] - 2.0) ** 2
            + (x[3] - 1.0) ** 2
            + (x[4] - 1.0) ** 2
        ),
        var_lb=np.full(5, -INF),
        var_ub=np.full(5, INF),
        x0=np.full(5, 2.0),
        cons=lambda x: jnp.array(
            [
                x[0] + 3.0 * x[1],
                x[2] + x[3] - 2.0 * x[4],
                x[1] - x[4],
            ]
        ),
        num_eq_cons=3,
        f_opt=1859.0 / 349.0,
    ),
    HSSpec(
        name="hs76",
        obj=lambda x: (
            x[0] ** 2
            + 0.5 * x[1] ** 2
            + x[2] ** 2
            + 0.5 * x[3] ** 2
            - x[0] * x[2]
            + x[2] * x[3]
            - x[0]
            - 3.0 * x[1]
            + x[2]
            - x[3]
        ),
        var_lb=np.zeros(4),
        var_ub=np.full(4, INF),
        x0=np.full(4, 0.5),
        cons=lambda x: jnp.array(
            [
                x[0] + 2.0 * x[1] + x[2] + x[3],
                3.0 * x[0] + x[1] + 2.0 * x[2] - x[3],
                x[1] + 4.0 * x[2],
            ]
        ),
        cons_lb=_a(-INF, -INF, 1.5),
        cons_ub=_a(5.0, 4.0, INF),
        f_opt=-4.681818181,
    ),
    # ---- round-3 additions: inequality-heavy problems stressing
    # active-set churn and the penalty filters (book formulations)
    HSSpec(
        name="hs34",
        obj=lambda x: -x[0],
        var_lb=_a(0.0, 0.0, 0.0),
        var_ub=_a(100.0, 100.0, 10.0),
        x0=_a(0.0, 1.05, 2.9),
        cons=lambda x: jnp.array(
            [x[1] - jnp.exp(x[0]), x[2] - jnp.exp(x[1])]
        ),
        cons_lb=_a(0.0, 0.0),
        cons_ub=_a(INF, INF),
        x_opt=_a(math.log(math.log(10.0)), math.log(10.0), 10.0),
        f_opt=-math.log(math.log(10.0)),
    ),
    HSSpec(
        name="hs39",
        obj=lambda x: -x[0],
        var_lb=np.full(4, -INF),
        var_ub=np.full(4, INF),
        x0=np.full(4, 2.0),
        cons=lambda x: jnp.array(
            [x[1] - x[0] ** 3 - x[2] ** 2, x[0] ** 2 - x[1] - x[3] ** 2]
        ),
        num_eq_cons=2,
        x_opt=_a(1.0, 1.0, 0.0, 0.0),
        f_opt=-1.0,
    ),
    HSSpec(
        name="hs40",
        obj=lambda x: -x[0] * x[1] * x[2] * x[3],
        var_lb=np.full(4, -INF),
        var_ub=np.full(4, INF),
        x0=np.full(4, 0.8),
        cons=lambda x: jnp.array(
            [
                x[0] ** 3 + x[1] ** 2 - 1.0,
                x[0] ** 2 * x[3] - x[2],
                x[3] ** 2 - x[1],
            ]
        ),
        num_eq_cons=3,
        f_opt=-0.25,
    ),
    HSSpec(
        name="hs44",
        obj=lambda x: (
            x[0] - x[1] - x[2] - x[0] * x[2] + x[0] * x[3]
            + x[1] * x[2] - x[1] * x[3]
        ),
        var_lb=np.zeros(4),
        var_ub=np.full(4, INF),
        x0=np.zeros(4),
        cons=lambda x: jnp.array(
            [
                8.0 - x[0] - 2.0 * x[1],
                12.0 - 4.0 * x[0] - x[1],
                12.0 - 3.0 * x[0] - 4.0 * x[1],
                8.0 - 2.0 * x[2] - x[3],
                8.0 - x[2] - 2.0 * x[3],
                5.0 - x[2] - x[3],
            ]
        ),
        cons_lb=np.zeros(6),
        cons_ub=np.full(6, INF),
        # nonconvex (bilinear): from the book start the homotopy reaches
        # the local KKT point f=-13 at (3,0,4,0); the book's global
        # optimum is f=-15 at (0,3,0,4)
        x_opt=None,
        f_opt=None,
    ),
    HSSpec(
        name="hs60",
        obj=lambda x: (
            (x[0] - 1.0) ** 2
            + (x[0] - x[1]) ** 2
            + (x[1] - x[2]) ** 4
        ),
        var_lb=np.full(3, -10.0),
        var_ub=np.full(3, 10.0),
        x0=np.full(3, 2.0),
        cons=lambda x: jnp.array(
            [x[0] * (1.0 + x[1] ** 2) + x[2] ** 4 - 4.0 - 3.0 * math.sqrt(2.0)]
        ),
        num_eq_cons=1,
        f_opt=0.03256820025,
    ),
    HSSpec(
        name="hs63",
        obj=lambda x: (
            1000.0 - x[0] ** 2 - 2.0 * x[1] ** 2 - x[2] ** 2
            - x[0] * x[1] - x[0] * x[2]
        ),
        var_lb=np.zeros(3),
        var_ub=np.full(3, INF),
        x0=np.full(3, 2.0),
        cons=lambda x: jnp.array(
            [
                8.0 * x[0] + 14.0 * x[1] + 7.0 * x[2] - 56.0,
                x[0] ** 2 + x[1] ** 2 + x[2] ** 2 - 25.0,
            ]
        ),
        num_eq_cons=2,
        f_opt=961.7151721,
    ),
    HSSpec(
        name="hs64",
        obj=lambda x: (
            5.0 * x[0] + 50000.0 / x[0]
            + 20.0 * x[1] + 72000.0 / x[1]
            + 10.0 * x[2] + 144000.0 / x[2]
        ),
        var_lb=np.full(3, 1e-5),
        var_ub=np.full(3, INF),
        x0=np.ones(3),
        cons=lambda x: jnp.array(
            [1.0 - 4.0 / x[0] - 32.0 / x[1] - 120.0 / x[2]]
        ),
        cons_lb=_a(0.0),
        cons_ub=_a(INF),
        x_opt=_a(108.7347175, 85.12613942, 204.3247078),
        f_opt=6299.842428,
    ),
    HSSpec(
        name="hs65",
        obj=lambda x: (
            (x[0] - x[1]) ** 2
            + (x[0] + x[1] - 10.0) ** 2 / 9.0
            + (x[2] - 5.0) ** 2
        ),
        var_lb=_a(-4.5, -4.5, -5.0),
        var_ub=_a(4.5, 4.5, 5.0),
        x0=_a(-5.0, 5.0, 0.0),  # book start (outside bounds; clipped)
        cons=lambda x: jnp.array(
            [48.0 - x[0] ** 2 - x[1] ** 2 - x[2] ** 2]
        ),
        cons_lb=_a(0.0),
        cons_ub=_a(INF),
        x_opt=_a(3.650461821, 3.65046168, 4.6204170507),
        f_opt=0.9535288567,
    ),
    HSSpec(
        name="hs66",
        obj=lambda x: 0.2 * x[2] - 0.8 * x[0],
        var_lb=_a(0.0, 0.0, 0.0),
        var_ub=_a(100.0, 100.0, 10.0),
        x0=_a(0.0, 1.05, 2.9),
        cons=lambda x: jnp.array(
            [x[1] - jnp.exp(x[0]), x[2] - jnp.exp(x[1])]
        ),
        cons_lb=_a(0.0, 0.0),
        cons_ub=_a(INF, INF),
        x_opt=_a(0.1841264879, 1.202167873, 3.327322322),
        f_opt=0.5181632741,
    ),
    HSSpec(
        name="hs78",
        obj=lambda x: x[0] * x[1] * x[2] * x[3] * x[4],
        var_lb=np.full(5, -INF),
        var_ub=np.full(5, INF),
        x0=_a(-2.0, 1.5, 2.0, -1.0, -1.0),
        cons=lambda x: jnp.array(
            [
                x[0] ** 2 + x[1] ** 2 + x[2] ** 2 + x[3] ** 2 + x[4] ** 2
                - 10.0,
                x[1] * x[2] - 5.0 * x[3] * x[4],
                x[0] ** 3 + x[1] ** 3 + 1.0,
            ]
        ),
        num_eq_cons=3,
        f_opt=-2.91970041,
    ),
    HSSpec(
        name="hs79",
        obj=lambda x: (
            (x[0] - 1.0) ** 2
            + (x[0] - x[1]) ** 2
            + (x[1] - x[2]) ** 2
            + (x[2] - x[3]) ** 4
            + (x[3] - x[4]) ** 4
        ),
        var_lb=np.full(5, -INF),
        var_ub=np.full(5, INF),
        x0=np.full(5, 2.0),
        cons=lambda x: jnp.array(
            [
                x[0] + x[1] ** 2 + x[2] ** 3 - 2.0 - 3.0 * math.sqrt(2.0),
                x[1] - x[2] ** 2 + x[3] + 2.0 - 2.0 * math.sqrt(2.0),
                x[0] * x[4] - 2.0,
            ]
        ),
        num_eq_cons=3,
        f_opt=0.0787768209,
    ),
    HSSpec(
        name="hs93",
        obj=lambda x: (
            0.0204 * x[0] * x[3] * (x[0] + x[1] + x[2])
            + 0.0187 * x[1] * x[2] * (x[0] + 1.57 * x[1] + x[3])
            + 0.0607 * x[0] * x[3] * x[4] ** 2 * (x[0] + x[1] + x[2])
            + 0.0437 * x[1] * x[2] * x[5] ** 2 * (x[0] + 1.57 * x[1] + x[3])
        ),
        var_lb=np.zeros(6),
        var_ub=np.full(6, INF),
        x0=_a(5.54, 4.4, 12.02, 11.82, 0.702, 0.852),
        cons=lambda x: jnp.array(
            [
                0.001 * x[0] * x[1] * x[2] * x[3] * x[4] * x[5] - 2.07,
                1.0
                - 0.00062 * x[0] * x[3] * x[4] ** 2 * (x[0] + x[1] + x[2])
                - 0.00058 * x[1] * x[2] * x[5] ** 2
                * (x[0] + 1.57 * x[1] + x[3]),
            ]
        ),
        cons_lb=_a(0.0, 0.0),
        cons_ub=_a(INF, INF),
        f_opt=135.075961,
    ),
    HSSpec(
        name="hs100",
        obj=lambda x: (
            (x[0] - 10.0) ** 2
            + 5.0 * (x[1] - 12.0) ** 2
            + x[2] ** 4
            + 3.0 * (x[3] - 11.0) ** 2
            + 10.0 * x[4] ** 6
            + 7.0 * x[5] ** 2
            + x[6] ** 4
            - 4.0 * x[5] * x[6]
            - 10.0 * x[5]
            - 8.0 * x[6]
        ),
        var_lb=np.full(7, -INF),
        var_ub=np.full(7, INF),
        x0=_a(1.0, 2.0, 0.0, 4.0, 0.0, 1.0, 1.0),
        cons=lambda x: jnp.array(
            [
                127.0 - 2.0 * x[0] ** 2 - 3.0 * x[1] ** 4 - x[2]
                - 4.0 * x[3] ** 2 - 5.0 * x[4],
                282.0 - 7.0 * x[0] - 3.0 * x[1] - 10.0 * x[2] ** 2
                - x[3] + x[4],
                196.0 - 23.0 * x[0] - x[1] ** 2 - 6.0 * x[5] ** 2
                + 8.0 * x[6],
                -4.0 * x[0] ** 2 - x[1] ** 2 + 3.0 * x[0] * x[1]
                - 2.0 * x[2] ** 2 - 5.0 * x[5] + 11.0 * x[6],
            ]
        ),
        cons_lb=np.zeros(4),
        cons_ub=np.full(4, INF),
        f_opt=680.6300573,
    ),
    HSSpec(
        name="hs113",
        obj=lambda x: (
            x[0] ** 2 + x[1] ** 2 + x[0] * x[1]
            - 14.0 * x[0] - 16.0 * x[1]
            + (x[2] - 10.0) ** 2
            + 4.0 * (x[3] - 5.0) ** 2
            + (x[4] - 3.0) ** 2
            + 2.0 * (x[5] - 1.0) ** 2
            + 5.0 * x[6] ** 2
            + 7.0 * (x[7] - 11.0) ** 2
            + 2.0 * (x[8] - 10.0) ** 2
            + (x[9] - 7.0) ** 2
            + 45.0
        ),
        var_lb=np.full(10, -INF),
        var_ub=np.full(10, INF),
        x0=_a(2.0, 3.0, 5.0, 5.0, 1.0, 2.0, 7.0, 3.0, 6.0, 10.0),
        cons=lambda x: jnp.array(
            [
                105.0 - 4.0 * x[0] - 5.0 * x[1] + 3.0 * x[6] - 9.0 * x[7],
                -10.0 * x[0] + 8.0 * x[1] + 17.0 * x[6] - 2.0 * x[7],
                8.0 * x[0] - 2.0 * x[1] - 5.0 * x[8] + 2.0 * x[9] + 12.0,
                -3.0 * (x[0] - 2.0) ** 2 - 4.0 * (x[1] - 3.0) ** 2
                - 2.0 * x[2] ** 2 + 7.0 * x[3] + 120.0,
                -5.0 * x[0] ** 2 - 8.0 * x[1] - (x[2] - 6.0) ** 2
                + 2.0 * x[3] + 40.0,
                -(x[0] ** 2) - 2.0 * (x[1] - 2.0) ** 2 + 2.0 * x[0] * x[1]
                - 14.0 * x[4] + 6.0 * x[5],
                -0.5 * (x[0] - 8.0) ** 2 - 2.0 * (x[1] - 4.0) ** 2
                - 3.0 * x[4] ** 2 + x[5] + 30.0,
                3.0 * x[0] - 6.0 * x[1] - 12.0 * (x[8] - 8.0) ** 2
                + 7.0 * x[9],
            ]
        ),
        cons_lb=np.zeros(8),
        cons_ub=np.full(8, INF),
        f_opt=24.30620907,
    ),
    # ---- round-3 batch 2: constrained-Rosenbrock family, volume /
    # trigonometric equality problems, and the hs51-53 quadratic family
    # completion (book formulations, Hock & Schittkowski 1981)
    HSSpec(
        name="hs15",
        obj=_rosenbrock_obj,
        var_lb=_a(-INF, -INF),
        var_ub=_a(0.5, INF),
        x0=_a(-2.0, 1.0),
        cons=lambda x: jnp.array([x[0] * x[1] - 1.0, x[0] + x[1] ** 2]),
        cons_lb=np.zeros(2),
        cons_ub=np.full(2, INF),
        x_opt=_a(0.5, 2.0),
        f_opt=306.5,
    ),
    HSSpec(
        name="hs20",
        obj=_rosenbrock_obj,
        var_lb=_a(-0.5, -INF),
        var_ub=_a(0.5, INF),
        x0=_a(-2.0, 1.0),
        cons=lambda x: jnp.array(
            [
                x[0] + x[1] ** 2,
                x[0] ** 2 + x[1],
                x[0] ** 2 + x[1] ** 2 - 1.0,
            ]
        ),
        cons_lb=np.zeros(3),
        cons_ub=np.full(3, INF),
        # book optimum sits at x1 = +0.5; from the clipped start
        # (-0.5, 1) the projected flow (like any local method started
        # there) converges to the symmetric KKT point at x1 = -0.5 with
        # f = f_opt + 2 — status Optimal, objective locally optimal
        x_opt=_a(0.5, np.sqrt(3.0) / 2.0),
        f_opt=81.5 - 25.0 * np.sqrt(3.0),
    ),
    HSSpec(
        name="hs37",
        obj=lambda x: -x[0] * x[1] * x[2],
        var_lb=np.zeros(3),
        var_ub=np.full(3, 42.0),
        x0=np.full(3, 10.0),
        cons=lambda x: jnp.array(
            [
                72.0 - x[0] - 2.0 * x[1] - 2.0 * x[2],
                x[0] + 2.0 * x[1] + 2.0 * x[2],
            ]
        ),
        cons_lb=np.zeros(2),
        cons_ub=np.full(2, INF),
        x_opt=_a(24.0, 12.0, 12.0),
        f_opt=-3456.0,
    ),
    HSSpec(
        name="hs41",
        obj=lambda x: 2.0 - x[0] * x[1] * x[2],
        var_lb=np.zeros(4),
        var_ub=_a(1.0, 1.0, 1.0, 2.0),
        x0=np.full(4, 2.0),
        cons=lambda x: jnp.array([x[0] + 2.0 * x[1] + 2.0 * x[2] - x[3]]),
        num_eq_cons=1,
        x_opt=_a(2.0 / 3.0, 1.0 / 3.0, 1.0 / 3.0, 2.0),
        f_opt=52.0 / 27.0,
    ),
    HSSpec(
        name="hs46",
        obj=lambda x: (
            (x[0] - x[1]) ** 2
            + (x[2] - 1.0) ** 2
            + (x[3] - 1.0) ** 4
            + (x[4] - 1.0) ** 6
        ),
        var_lb=np.full(5, -INF),
        var_ub=np.full(5, INF),
        x0=_a(np.sqrt(2.0) / 2.0, 1.75, 0.5, 2.0, 2.0),
        cons=lambda x: jnp.array(
            [
                x[0] ** 2 * x[3] + jnp.sin(x[3] - x[4]) - 1.0,
                x[1] + x[2] ** 4 * x[3] ** 2 - 2.0,
            ]
        ),
        num_eq_cons=2,
        x_opt=np.ones(5),
        f_opt=0.0,
    ),
    HSSpec(
        name="hs47",
        obj=lambda x: (
            (x[0] - x[1]) ** 2
            + (x[1] - x[2]) ** 3
            + (x[2] - x[3]) ** 4
            + (x[3] - x[4]) ** 4
        ),
        var_lb=np.full(5, -INF),
        var_ub=np.full(5, INF),
        x0=_a(2.0, np.sqrt(2.0), -1.0, 2.0 - np.sqrt(2.0), 0.5),
        cons=lambda x: jnp.array(
            [
                x[0] + x[1] ** 2 + x[2] ** 3 - 3.0,
                x[1] - x[2] ** 2 + x[3] - 1.0,
                x[0] * x[4] - 1.0,
            ]
        ),
        num_eq_cons=3,
        x_opt=np.ones(5),
        f_opt=0.0,
    ),
    HSSpec(
        name="hs53",
        obj=lambda x: (
            (x[0] - x[1]) ** 2
            + (x[1] + x[2] - 2.0) ** 2
            + (x[3] - 1.0) ** 2
            + (x[4] - 1.0) ** 2
        ),
        var_lb=np.full(5, -10.0),
        var_ub=np.full(5, 10.0),
        x0=np.full(5, 2.0),
        cons=lambda x: jnp.array(
            [
                x[0] + 3.0 * x[1],
                x[2] + x[3] - 2.0 * x[4],
                x[1] - x[4],
            ]
        ),
        num_eq_cons=3,
        f_opt=176.0 / 43.0,
    ),
    HSSpec(
        name="hs77",
        obj=lambda x: (
            (x[0] - 1.0) ** 2
            + (x[0] - x[1]) ** 2
            + (x[2] - 1.0) ** 2
            + (x[3] - 1.0) ** 4
            + (x[4] - 1.0) ** 6
        ),
        var_lb=np.full(5, -INF),
        var_ub=np.full(5, INF),
        x0=np.full(5, 2.0),
        cons=lambda x: jnp.array(
            [
                x[0] ** 2 * x[3] + jnp.sin(x[3] - x[4]) - 2.0 * np.sqrt(2.0),
                x[1] + x[2] ** 4 * x[3] ** 2 - 8.0 - np.sqrt(2.0),
            ]
        ),
        num_eq_cons=2,
        f_opt=0.24150513,
    ),
]

HS_BY_NAME = {spec.name: spec for spec in HS_SPECS}
