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
# supplied to the reference by the same autodiff.  The round-3 additions
# (hs34..hs113) include the inequality-heavy problems stressing
# active-set churn; hs64/hs93 end LocallyInfeasible on BOTH sides
# (identical reference behavior, verified) — status parity counts.
for prob in [
    "hs8", "hs11", "hs16", "hs23", "hs31", "hs33", "hs52", "hs76",
    "hs34", "hs39", "hs40", "hs44", "hs60", "hs63", "hs64", "hs65",
    "hs66", "hs78", "hs79", "hs93", "hs100", "hs113",
    # round-3 batch 2 (hs20: both sides land on the same local KKT
    # point from the clipped start — parity is exactly the claim)
    "hs15", "hs20", "hs37", "hs41", "hs46", "hs47", "hs53", "hs77",
    # round-4 batch: degeneracy (hs13: LICQ fails at x*, both sides end
    # LocallyInfeasible), flat plateau (hs25: both Optimal at iteration
    # 0), secondary KKT point (hs81: both converge to f=0.4388512),
    # joint failure (hs106: reference crashes at the lambda limit, ours
    # grinds to IterationLimit — counted as both-fail parity), plus ten
    # clean engineering/equilibrium problems
    "hs13", "hs19", "hs25", "hs32", "hs61", "hs62", "hs72", "hs73",
    "hs80", "hs81", "hs106", "hs110", "hs111", "hs118",
    # round-4 batch 2: the engineering quintet (hs104: both sides stall
    # identically at default scaling and solve with GradJac scaling —
    # counted as both-fail status parity here)
    "hs83", "hs86", "hs104", "hs108", "hs112",
]:
    from pygradflow_tpu.runners.hs import HS_BY_NAME as _HS

    # hs104 never converges at default scaling and never trips the
    # lambda limit; the reference's default iteration_limit=None is
    # UNBOUNDED (solver.py:183), so it must be capped explicitly for
    # both sides (ours defaults to a 10000 cap)
    _HS_KWARGS = {"hs104": {"iteration_limit": 2000}}

    _spec = _HS[prob]
    m = (
        len(_spec.cons_lb)
        if _spec.cons_lb is not None
        else (_spec.num_eq_cons or 0)
    )
    _STARTS[prob] = (_spec.x0, np.zeros(m))
    CASES.append((prob, _HS_KWARGS.get(prob, {})))

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


# ---------------------------------------------------------------------
# Continuous-engine (IntegrationSolver) parity: event/segment sequences
# and rho ladders vs the reference's scipy-BDF engine, through both the
# host event loop and the device-resident loop.


def _integration_problems():
    """Problem factories usable by BOTH sides (reference problems take
    numpy + explicit derivatives; ours take jax autodiff)."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    from pygradflow.problem import Problem as RefProblem

    from pygradflow_tpu.problem import Problem as OurProblem

    class RefSimple(RefProblem):
        def __init__(self):
            super().__init__(np.array([-np.inf]), np.array([np.inf]))

        def obj(self, x):
            return 0.5 * x[0] ** 2

        def obj_grad(self, x):
            return np.array([x[0]])

        def lag_hess(self, x, y):
            return sp.eye(1)

    class OurSimple(OurProblem):
        def __init__(self):
            super().__init__(np.array([-np.inf]), np.array([np.inf]))

        def obj(self, x):
            return 0.5 * x[0] ** 2

    class RefUnbounded(RefProblem):
        def __init__(self):
            super().__init__(
                np.array([-np.inf]), np.array([np.inf]), num_cons=0
            )

        def obj(self, x):
            return x[0]

        def obj_grad(self, x):
            return np.array([1.0])

        def lag_hess(self, x, y):
            return sp.csr_matrix((1, 1))

    class OurUnbounded(OurProblem):
        def __init__(self):
            super().__init__(np.array([-np.inf]), np.array([np.inf]))

        def obj(self, x):
            return x[0]

    from hs71 import HS71 as RefHS71
    from tame import Tame as RefTame

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"),
    )
    from problems import HS71, Tame

    return {
        "simple": (RefSimple, OurSimple, np.array([10.0]), np.array([])),
        "unbounded": (RefUnbounded, OurUnbounded, np.array([0.0]), np.array([])),
        "tame": (RefTame, Tame, np.array([0.0, 0.0]), np.array([0.0])),
        "hs71": (
            RefHS71,
            HS71,
            np.array([1.0, 5.0, 5.0, 1.0, 0.0]),
            np.array([0.0, 0.0]),
        ),
    }


def integration_parity():
    """Returns (exact, close, mismatches) over the integration configs."""
    import logging

    logging.getLogger("gradflow").setLevel(logging.ERROR)

    from pygradflow.params import Params as RParams

    from pygradflow.integration.integration_solver import (
        IntegrationSolver as RefIntegrationSolver,
    )

    from pygradflow_tpu import Params
    from pygradflow_tpu.integration import IntegrationSolver

    exact, close, mismatch = 0, 0, []
    # the documented deviation (PARITY.md): a crossing the reference's
    # scipy-root bisection resolves as a separate 13th segment is handled
    # immediately by the discrete crossing test — identical solution
    known_deviation = {("tame", 13): 12}

    for prob_name, (RefP, OurP, x0, y0) in _integration_problems().items():
        ref_solver = RefIntegrationSolver(
            RefP(), RParams(iteration_limit=1000, rho=1e-2, collect_path=True)
        )
        rr = ref_solver.solve(x0, y0)
        ref_rho = ref_solver.rho

        for mode in ("host", "device"):
            params = Params(
                iteration_limit=1000,
                rho=1e-2,
                integration_device_loop=(mode == "device"),
            )
            orr = IntegrationSolver(OurP(), params).solve(x0, y0)

            same_status = rr.status.name == orr.status.name
            same_segments = rr.iterations == orr.iterations or (
                known_deviation.get((prob_name, rr.iterations)) == orr.iterations
            )
            same_rho = np.isclose(ref_rho, orr.final_rho, rtol=1e-12) or (
                # one fewer trailing penalty rung under the deviation
                known_deviation.get((prob_name, rr.iterations)) == orr.iterations
                and np.isclose(ref_rho, 10.0 * orr.final_rho, rtol=1e-12)
            )
            same_x = (
                rr.status.name != "Optimal"
                or np.allclose(np.asarray(rr.x), np.asarray(orr.x), atol=1e-5)
            )

            tag = (
                "EXACT"
                if (same_status and same_segments and same_rho and same_x)
                else ("close" if (same_status and same_x) else "MISMATCH")
            )
            if tag == "EXACT":
                exact += 1
            elif tag == "close":
                close += 1
            else:
                mismatch.append(
                    (f"integration:{prob_name}:{mode}",
                     (rr.status.name, rr.iterations, ref_rho),
                     (orr.status.name, orr.iterations, orr.final_rho))
                )
            print(
                f"{tag:>8s}  integration:{prob_name:<10s} {mode:<7s} "
                f"ref: {rr.status.name} segs={rr.iterations:3d} "
                f"rho={ref_rho:.0e}   ours: {orr.status.name} "
                f"segs={orr.iterations:3d} rho={orr.final_rho:.0e}"
            )
    return exact, close, mismatch


def main():
    exact = 0
    close = 0
    mismatch = []

    for prob, kwargs in CASES:
        x0, y0 = _STARTS[prob]
        try:
            rs, ri, rx = ref_solve(prob, kwargs, x0, y0)
        except Exception as e:
            # the reference CRASHED (e.g. hs106 lambda-limit abort, the
            # Globalized line-search defect).  This framework never
            # raises from traced code — the same failure surfaces as a
            # non-Optimal status; that is the parity claim to check.
            os_, oi, ox = our_solve(prob, kwargs, x0, y0)
            if os_ != "Optimal":
                close += 1
                print(
                    f"{'close':>8s}  {prob:<10s} {str(kwargs):<45s} "
                    f"ref: CRASH({type(e).__name__})   ours: {os_} {oi:4d}"
                )
            else:
                mismatch.append((prob, kwargs, ("CRASH", -1), (os_, oi)))
                print(
                    f"{'MISMATCH':>8s}  {prob:<10s} {str(kwargs):<45s} "
                    f"ref: CRASH ({e})   ours: {os_} {oi:4d}"
                )
            continue
        os_, oi, ox = our_solve(prob, kwargs, x0, y0)

        same_status = rs == os_
        same_iters = ri == oi
        same_x = np.allclose(rx, ox, atol=1e-5)
        # quartic/sextic-degenerate optima (flat valleys, hs46/hs47),
        # flat-at-scale problems (hs72: f ~ 728, both sides stop ~1e-2
        # apart in x within the same 1e-6 KKT tolerance) and the
        # chemical-equilibrium problem hs111 (near-singular Hessian along
        # composition exchanges of trace species — equal objectives to
        # 4e-9 at different log-compositions), and the maximal-hexagon
        # problem hs108 (a continuum of rotated/reflected optimal
        # hexagons, all at f = -sqrt(3)/2): compare objective values
        # RELATIVELY there (cf. tests/test_runners.py)
        if prob in ("hs46", "hs47", "hs72", "hs108", "hs111") and same_status and not same_x:
            from pygradflow_tpu.runners.hs import HS_BY_NAME as _HSD

            _p = _HSD[prob].problem()
            _fr = float(_p.obj(np.asarray(rx)))
            _fo = float(_p.obj(np.asarray(ox)))
            same_x = abs(_fr - _fo) < 1e-6 * max(1.0, abs(_fr))
        # at a non-Optimal terminal status the final point is an
        # infeasibility/limit certificate, not a solution — two correct
        # solvers need not stop at the same certificate (hs93: both
        # LocallyInfeasible, different collapse points), so status parity
        # is the meaningful comparison there
        if same_status and rs != "Optimal":
            same_x = True

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

    ie, ic, im = integration_parity()
    exact += ie
    close += ic
    mismatch.extend(im)
    total = len(CASES) + ie + ic + len(im)

    print(
        f"\n{exact} exact (status+iterations+solution), {close} close "
        f"(status+solution), {len(mismatch)} mismatches of {total}"
    )
    if mismatch:
        sys.exit(1)


if __name__ == "__main__":
    main()
