"""Mixed-precision batched sweep: the f32 bulk + f64 polish pipeline must
converge to the same optima (to the same final opt_tol) as a pure-f64
batched solve — cheaper trajectories, identical answers.  No reference
counterpart (it is numpy-f64-only); the equivalence claim is ours to pin.
"""

import numpy as np

from pygradflow_tpu import Params, SolverStatus
from pygradflow_tpu.parallel import BatchedSolver, MixedPrecisionSolver

from tests.problems import HS71, Rosenbrock


def test_mixed_rosenbrock_matches_f64_optima():
    rng = np.random.default_rng(3)
    x0s = rng.uniform(-1.5, 1.5, size=(8, 2))

    params = Params()
    mixed = MixedPrecisionSolver(Rosenbrock(), params)
    res = mixed.solve(x0s)

    assert res.success.all()
    np.testing.assert_allclose(res.x, np.ones_like(res.x), atol=1e-5)
    # the final residuals meet the f64 tolerance, not just the f32 one
    assert float(np.max(res.total_res)) <= params.opt_tol
    # stage accounting exists and the polish stage was short: warm starts
    # from ~1e-4 points must not replay the whole trajectory
    bulk_iters = np.asarray(mixed.bulk_result.iterations)
    polish_iters = res.iterations - bulk_iters
    assert (polish_iters >= 1).all()
    assert polish_iters.mean() < bulk_iters.mean()


def test_mixed_hs71_matches_pure_f64():
    inst_x0 = np.array([1.0, 5.0, 5.0, 1.0, 0.0])
    rng = np.random.default_rng(5)
    x0s = np.clip(
        inst_x0[None, :] + rng.uniform(-0.1, 0.1, size=(6, 5)),
        np.array([1.0, 1.0, 1.0, 1.0, 0.0]),
        np.array([5.0, 5.0, 5.0, 5.0, 2.0]),
    )
    y0s = np.zeros((6, 2))

    params = Params()
    pure = BatchedSolver(HS71(), params).solve(x0s, y0s)
    mixed = MixedPrecisionSolver(HS71(), params).solve(x0s, y0s)

    assert pure.success.all() and mixed.success.all()
    np.testing.assert_allclose(mixed.x, pure.x, atol=1e-5)
    np.testing.assert_allclose(mixed.y, pure.y, atol=1e-4)
    assert float(np.max(mixed.total_res)) <= params.opt_tol


def test_mixed_handles_nonfinite_f32_lanes():
    """A lane whose f32 stage produced non-finite values restarts the
    polish from the original start instead of poisoning it."""
    mixed = MixedPrecisionSolver(Rosenbrock(), Params())
    x0s = np.array([[0.0, 0.0], [0.5, -0.5]])
    r32 = mixed.bulk.solve(x0s)
    # simulate an f32 overflow lane by patching the bulk result the
    # promote step consumes
    import types

    orig_solve = mixed.bulk.solve

    def poisoned(x0, y0=None, data=None):
        r = orig_solve(x0, y0, data=data)
        x = np.asarray(r.x).copy()
        x[1] = np.nan
        return r._replace(x=x)

    mixed.bulk.solve = poisoned
    res = mixed.solve(x0s)
    assert res.success.all()
    np.testing.assert_allclose(res.x, np.ones_like(res.x), atol=1e-5)
