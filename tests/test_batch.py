"""Batched and sharded solve tests — coverage the reference lacks:
batched solve must equal a loop of single solves, and the sharded solve
must equal the batched solve (on the virtual 8-device CPU mesh)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pygradflow_tpu import Params, Solver, SolverStatus
from pygradflow_tpu.parallel import BatchedSolver, ShardedSolver
from pygradflow_tpu.parallel.batch import ParametricProblem

from tests.problems import Rosenbrock, HS71, rosenbrock_instance


def test_batched_matches_single():
    problem = Rosenbrock()
    params = Params()

    x0s = np.array([[0.0, 0.0], [0.5, -0.3], [-1.2, 1.0], [2.0, 2.0]])

    batched = BatchedSolver(problem, params)
    res = batched.solve(x0s)

    assert res.success.all()
    np.testing.assert_allclose(res.x, np.ones_like(res.x), atol=1e-5)

    # lane 0 must match the single solve exactly (same trajectory)
    single = Solver(problem, params).solve(x0s[0])
    assert int(res.iterations[0]) == single.iterations
    np.testing.assert_allclose(res.x[0], single.x, rtol=1e-12)


def test_batched_constrained():
    problem = HS71()
    x0s = np.tile(np.array([1.0, 5.0, 5.0, 1.0, 0.0]), (3, 1))
    x0s[1, 1] = 4.0  # perturb a lane
    y0s = np.zeros((3, 2))

    res = BatchedSolver(problem, Params()).solve(x0s, y0s)
    assert res.success.all()
    x_opt = np.array([1.0, 4.74299964, 3.82114998, 1.37940829, 0.0])
    np.testing.assert_allclose(res.x, np.tile(x_opt, (3, 1)), atol=1e-5)


class ParamRosenbrock(ParametricProblem):
    """Rosenbrock with per-instance (a, b) coefficients."""

    def __init__(self):
        super().__init__(
            np.array([-np.inf, -np.inf]),
            np.array([np.inf, np.inf]),
            example_data=(jnp.asarray(1.0), jnp.asarray(100.0)),
        )

    def p_obj(self, v, data):
        a, b = data
        return (a - v[0]) ** 2 + b * (v[1] - v[0] ** 2) ** 2


def test_parametric_batch():
    problem = ParamRosenbrock()
    a = jnp.asarray([1.0, 2.0, 0.5])
    b = jnp.asarray([100.0, 50.0, 10.0])
    x0s = np.zeros((3, 2))

    res = BatchedSolver(problem, Params()).solve(x0s, data=(a, b))
    assert res.success.all()
    # optimum of parametric Rosenbrock is (a, a^2)
    expect = np.stack([np.asarray(a), np.asarray(a) ** 2], axis=1)
    np.testing.assert_allclose(res.x, expect, atol=1e-5)


def test_compacting_matches_plain():
    """Harvest+compaction must only permute lanes, never change their
    trajectories: bitwise-equal results to the non-compacting path, with
    heterogeneous iteration counts forcing several harvest/shrink cycles."""
    problem = Rosenbrock()
    params = Params()
    rng = np.random.default_rng(3)
    x0s = rng.uniform(-2.0, 2.0, size=(12, 2))

    plain = BatchedSolver(problem, params, compact=False).solve(x0s)
    compacted = BatchedSolver(
        problem, params, compact=True, harvest_chunk=4, min_tier=2
    ).solve(x0s)

    np.testing.assert_array_equal(compacted.status, plain.status)
    np.testing.assert_array_equal(compacted.iterations, plain.iterations)
    np.testing.assert_array_equal(
        compacted.accepted_steps, plain.accepted_steps
    )
    np.testing.assert_array_equal(compacted.x, plain.x)
    np.testing.assert_array_equal(compacted.y, plain.y)


def test_compacting_parametric():
    """Compaction keeps per-lane problem data aligned through repacks."""
    problem = ParamRosenbrock()
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.uniform(0.5, 2.0, size=10))
    b = jnp.asarray(rng.uniform(10.0, 100.0, size=10))
    x0s = np.zeros((10, 2))

    res = BatchedSolver(
        problem, Params(), compact=True, harvest_chunk=4, min_tier=2
    ).solve(x0s, data=(a, b))
    assert res.success.all()
    expect = np.stack([np.asarray(a), np.asarray(a) ** 2], axis=1)
    np.testing.assert_allclose(res.x, expect, atol=1e-5)


def test_sharded_matches_batched():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")

    problem = Rosenbrock()
    params = Params()

    rng = np.random.default_rng(0)
    B = 16
    x0s = rng.uniform(-1.5, 1.5, size=(B, 2))

    batched = BatchedSolver(problem, params).solve(x0s)
    sharded = ShardedSolver(problem, params).solve(x0s)

    assert sharded.success.all()
    np.testing.assert_allclose(sharded.x, batched.x, rtol=1e-12)
    np.testing.assert_array_equal(sharded.iterations, batched.iterations)


def test_sharded_parametric():
    """Sharded + per-instance data (scenario sweep over the mesh)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")

    problem = ParamRosenbrock()
    B = 8
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.uniform(0.5, 2.0, B))
    b = jnp.asarray(rng.uniform(10.0, 100.0, B))
    x0s = np.zeros((B, 2))

    res = ShardedSolver(problem, Params()).solve(x0s, data=(a, b))
    assert res.success.all()
    expect = np.stack([np.asarray(a), np.asarray(a) ** 2], axis=1)
    np.testing.assert_allclose(res.x, expect, atol=1e-5)


def test_multistart_finds_global():
    """TargetProblem has two global optima; multistart from a grid finds
    one of them even when single starts land on saddle regions."""
    from pygradflow_tpu.parallel import multistart_solve
    from tests.problems import TARGET_X0, TARGET_X1, TargetProblem

    rng = np.random.default_rng(11)
    x0s = rng.uniform(-3.0, 3.0, size=(16, 2))

    res = multistart_solve(TargetProblem(), x0s, Params())
    assert res.success
    assert res.num_optimal >= 1
    assert any(
        np.allclose(res.x, opt, atol=1e-5) for opt in (TARGET_X0, TARGET_X1)
    )
    assert res.obj < 1e-8


def test_jitted_callables_reused_across_solves():
    """Round-4 regression guard: BatchedSolver/ShardedSolver must NOT
    rebuild jitted closures per solve() — jax's jit cache keys on
    function identity, and per-call closures re-trace everything
    (measured: a third of the f64 headline wall, and 4.9x on the
    shard_map path)."""
    problem = Rosenbrock()
    params = Params()
    x0s = np.array([[0.0, 0.0], [0.5, -0.3]])

    b = BatchedSolver(problem, params, compact=False)
    b.solve(x0s)
    b.solve(x0s)
    assert b._init_jit._cache_size() == 1
    assert b._finalize_jit._cache_size() == 1

    s = ShardedSolver(problem, params)
    s.solve(np.tile(x0s, (4, 1)))
    s.solve(np.tile(x0s, (4, 1)))
    assert len(s._runs) == 1
