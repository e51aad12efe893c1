"""Trajectory-parity harness: run the reference PyGradFlow and this
framework on the same problems and configurations and compare statuses,
iteration counts and solutions.

The homotopy trajectory is deterministic given the configuration, so for
matching semantics the iteration counts should agree exactly on most
configurations (small drifts can appear where floating-point ordering
differs near accept/reject thresholds).

Usage: env PYTHONPATH= python benchmarks/parity_check.py
(forces the CPU backend; requires /root/reference.)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

REF = "/root/reference"
sys.path.insert(0, REF)
sys.path.insert(0, os.path.join(REF, "tests/pygradflow"))


def make_ref_hs(spec):
    """Reference-side adapter for an HS spec: same objective/constraint
    formulas, derivatives supplied to the reference (which derives
    nothing itself) by the SAME jax autodiff both sides use — so the
    comparison isolates the solver, not the differentiation."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from pygradflow.problem import Problem as RefProblem

    jgrad = jax.jit(jax.grad(spec.obj))
    has_cons = spec.cons is not None
    if has_cons:
        jjac = jax.jit(jax.jacfwd(spec.cons))

        def lag(x, y):
            return spec.obj(x) + spec.cons(x) @ y

    else:

        def lag(x, y):
            return spec.obj(x)

    jhess = jax.jit(jax.jacfwd(jax.grad(lag, argnums=0), argnums=0))

    class RefHS(RefProblem):
        def __init__(self):
            if spec.cons_lb is not None or spec.cons_ub is not None:
                super().__init__(
                    spec.var_lb, spec.var_ub,
                    cons_lb=spec.cons_lb, cons_ub=spec.cons_ub,
                )
            elif spec.num_eq_cons:
                super().__init__(
                    spec.var_lb, spec.var_ub, num_cons=spec.num_eq_cons
                )
            else:
                super().__init__(spec.var_lb, spec.var_ub)

        def obj(self, x):
            return float(spec.obj(jnp.asarray(x)))

        # np.array (copy) rather than np.asarray: the reference's slack
        # transform mutates these in place, and numpy views of jax
        # buffers are read-only
        def obj_grad(self, x):
            return np.array(jgrad(jnp.asarray(x)))

        def cons(self, x):
            return np.array(spec.cons(jnp.asarray(x)))

        def cons_jac(self, x):
            return sp.csr_matrix(np.asarray(jjac(jnp.asarray(x))))

        def lag_hess(self, x, y):
            return sp.csr_matrix(
                np.asarray(jhess(jnp.asarray(x), jnp.asarray(y)))
            )

    return RefHS


def ref_solve(problem_name, params_kwargs, x0, y0):
    import logging

    logging.getLogger("gradflow").setLevel(logging.ERROR)

    from pygradflow.params import (
        NewtonType as RNT,
        Params as RParams,
        PenaltyUpdate as RPU,
        StepControlType as RSCT,
        StepSolverType as RSST,
    )
    from pygradflow.solver import Solver as RSolver

    from hs71 import HS71 as RefHS71
    from rosenbrock import Rosenbrock as RefRosenbrock
    from tame import Tame as RefTame

    problems = {
        "rosenbrock": RefRosenbrock,
        "hs71": RefHS71,
        "tame": RefTame,
    }
    if problem_name.startswith("hs") and problem_name not in problems:
        from pygradflow_tpu.runners.hs import HS_BY_NAME

        problems[problem_name] = make_ref_hs(HS_BY_NAME[problem_name])
    enums = {
        "newton_type": RNT,
        "step_solver_type": RSST,
        "step_control_type": RSCT,
        "penalty_update": RPU,
    }
    kwargs = {
        k: (enums[k][v] if k in enums else v) for k, v in params_kwargs.items()
    }
    r = RSolver(problems[problem_name](), RParams(**kwargs)).solve(
        np.asarray(x0), np.asarray(y0)
    )
    return r.status.name, r.iterations, np.asarray(r.x)


def our_solve(problem_name, params_kwargs, x0, y0):
    from pygradflow_tpu import (
        NewtonType,
        Params,
        PenaltyUpdate,
        Solver,
        StepControlType,
        StepSolverType,
    )

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
    from problems import HS71, Rosenbrock, Tame

    problems = {"rosenbrock": Rosenbrock, "hs71": HS71, "tame": Tame}
    if problem_name.startswith("hs") and problem_name not in problems:
        from pygradflow_tpu.runners.hs import HS_BY_NAME

        problems[problem_name] = HS_BY_NAME[problem_name].problem
    enums = {
        "newton_type": NewtonType,
        "step_solver_type": StepSolverType,
        "step_control_type": StepControlType,
        "penalty_update": PenaltyUpdate,
    }
    kwargs = {
        k: (enums[k][v] if k in enums else v) for k, v in params_kwargs.items()
    }
    r = Solver(problems[problem_name](), Params(**kwargs)).solve(
        np.asarray(x0), np.asarray(y0)
    )
    return r.status.name, r.iterations, np.asarray(r.x)


CASES = []

_STARTS = {
    "rosenbrock": (np.array([0.0, 0.0]), np.array([])),
    "hs71": (np.array([1.0, 5.0, 5.0, 1.0, 0.0]), np.array([0.0, 0.0])),
    "tame": (np.array([0.0, 0.0]), np.array([0.0])),
}

# new HS problems (default config): solver-level parity with derivatives
# supplied to the reference by the same autodiff
for prob in ["hs8", "hs11", "hs16", "hs23", "hs31", "hs33", "hs52", "hs76"]:
    from pygradflow_tpu.runners.hs import HS_BY_NAME as _HS

    _spec = _HS[prob]
    m = (
        len(_spec.cons_lb)
        if _spec.cons_lb is not None
        else (_spec.num_eq_cons or 0)
    )
    _STARTS[prob] = (_spec.x0, np.zeros(m))
    CASES.append((prob, {}))

for prob in ["rosenbrock", "hs71", "tame"]:
    CASES.append((prob, {}))
    for nt in ["Simplified", "Full", "ActiveSet", "Globalized"]:
        CASES.append((prob, {"newton_type": nt}))
    for sst in ["Standard", "Asymmetric", "Symmetric", "Extended"]:
        CASES.append((prob, {"step_solver_type": sst}))
    for sct in ["ResiduumRatio", "Exact"]:
        CASES.append((prob, {"step_control_type": sct, "rho": 1e-1}))
    for pu in ["Constant", "DualNorm"]:
        CASES.append((prob, {"penalty_update": pu}))


def main():
    exact = 0
    close = 0
    mismatch = []

    for prob, kwargs in CASES:
        x0, y0 = _STARTS[prob]
        try:
            rs, ri, rx = ref_solve(prob, kwargs, x0, y0)
        except Exception as e:
            print(f"{prob} {kwargs}: reference failed ({e})")
            continue
        os_, oi, ox = our_solve(prob, kwargs, x0, y0)

        same_status = rs == os_
        same_iters = ri == oi
        same_x = np.allclose(rx, ox, atol=1e-5)

        tag = "EXACT" if (same_status and same_iters and same_x) else (
            "close" if (same_status and same_x) else "MISMATCH"
        )
        if tag == "EXACT":
            exact += 1
        elif tag == "close":
            close += 1
        else:
            mismatch.append((prob, kwargs, (rs, ri), (os_, oi)))

        print(
            f"{tag:>8s}  {prob:<10s} {str(kwargs):<45s} "
            f"ref: {rs} {ri:4d}   ours: {os_} {oi:4d}"
        )

    print(
        f"\n{exact} exact (status+iterations+solution), {close} close "
        f"(status+solution), {len(mismatch)} mismatches of {len(CASES)}"
    )
    if mismatch:
        sys.exit(1)


if __name__ == "__main__":
    main()
