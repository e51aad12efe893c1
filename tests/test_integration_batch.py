"""Device-resident integration loop + batched continuous solves.

The whole continuous-homotopy solve (segments, bisection, event
dispatch) runs as one traced function (``integration/device_loop.py``),
vmapped over instances — the reference's scipy-BDF engine has no batched
counterpart, and the host driver re-enters Python per segment."""

import numpy as np

from pygradflow_tpu import Params, SolverStatus
from pygradflow_tpu.integration import BatchedIntegrationSolver, IntegrationSolver

from tests.problems import hs71_instance, tame_instance


def _params():
    return Params(iteration_limit=1000, rho=1e-2)


def test_device_loop_matches_host_driver():
    """Lane 0 from the canonical start must reproduce the host driver's
    event sequence exactly (HS71 anchor: 10 segments, Optimal)."""
    inst = hs71_instance()
    params = _params()

    host = IntegrationSolver(inst.problem, params).solve(inst.x_0, inst.y_0)

    batched = BatchedIntegrationSolver(inst.problem, params)
    res = batched.solve(inst.x_0[None, :], inst.y_0[None, :])

    assert int(res.status[0]) == int(host.status)
    assert int(res.iterations[0]) == host.iterations == 10
    np.testing.assert_allclose(res.x[0], host.x, atol=1e-8)
    np.testing.assert_allclose(res.y[0], host.y, atol=1e-8)


def test_batched_lanes_diverge_independently():
    """Perturbed lanes follow different event sequences (different
    segment counts) yet all converge to the optimum in one lockstep
    solve."""
    inst = hs71_instance()
    b = BatchedIntegrationSolver(inst.problem, _params())

    x0s = np.tile(inst.x_0, (4, 1))
    x0s[1, 1] = 4.5
    x0s[2, 2] = 4.0
    x0s[3, 0] = 2.0
    res = b.solve(x0s, np.tile(inst.y_0, (4, 1)))

    assert res.success.all()
    assert len(set(res.iterations.tolist())) > 1  # genuinely divergent paths
    np.testing.assert_allclose(
        res.x, np.tile(inst.x_opt, (4, 1)), atol=1e-6
    )


def test_batched_tame_matches_reference_segments():
    inst = tame_instance()
    b = BatchedIntegrationSolver(inst.problem, _params())
    res = b.solve(np.tile(inst.x_0, (2, 1)), np.tile(inst.y_0, (2, 1)))
    assert res.success.all()
    # 12 segments vs the reference BDF engine's 13: since the bisection
    # fallback honors the segment's own crossing detection (the fix for
    # the diverged bracket-jump corruption, integrator.bisect_event), one
    # crossing that previously slipped through and re-fired a segment
    # later is handled immediately — identical solution, one fewer
    # segment (PARITY.md)
    assert res.iterations.tolist() == [12, 12]
    np.testing.assert_allclose(res.x, np.tile(inst.x_opt, (2, 1)), atol=1e-8)


def test_batched_iteration_limit():
    inst = hs71_instance()
    b = BatchedIntegrationSolver(inst.problem, Params(iteration_limit=2, rho=1e-2))
    res = b.solve(inst.x_0[None, :], inst.y_0[None, :])
    assert int(res.status[0]) == int(SolverStatus.IterationLimit)
    assert int(res.iterations[0]) == 2


def test_device_loop_param_single_instance():
    """Params.integration_device_loop routes IntegrationSolver.solve
    through the one-dispatch device loop, bitwise-matching the host
    driver (including dist_factor)."""
    inst = hs71_instance()
    host = IntegrationSolver(inst.problem, _params()).solve(inst.x_0, inst.y_0)
    dev = IntegrationSolver(
        inst.problem,
        Params(iteration_limit=1000, rho=1e-2, integration_device_loop=True),
    ).solve(inst.x_0, inst.y_0)

    assert dev.status == host.status
    assert dev.iterations == host.iterations
    np.testing.assert_array_equal(dev.x, host.x)
    np.testing.assert_allclose(dev.dist_factor, host.dist_factor, rtol=1e-12)
    assert dev.num_integration_steps == host.num_integration_steps


def test_device_loop_tame_matches_host():
    """The device loop's bisection fallback must keep matching the host
    driver on Tame (whose 12-segment trajectory exercises the
    segment-endpoint fallback path in both drivers)."""
    inst = tame_instance()
    host = IntegrationSolver(inst.problem, _params()).solve(inst.x_0, inst.y_0)
    dev = IntegrationSolver(
        inst.problem,
        Params(iteration_limit=1000, rho=1e-2, integration_device_loop=True),
    ).solve(inst.x_0, inst.y_0)
    assert host.iterations == 12
    assert dev.status == host.status
    assert dev.iterations == host.iterations
    np.testing.assert_array_equal(dev.x, host.x)


def test_batched_time_limit():
    """A tiny time_limit stops between chunks with TimeLimit statuses."""
    inst = hs71_instance()
    params = Params(
        iteration_limit=1000, rho=1e-2, time_limit=1e-9, integration_chunk=8
    )
    x0s = np.stack([inst.x_0, inst.x_0 + 0.01])
    res = BatchedIntegrationSolver(inst.problem, params).solve(x0s)
    assert (np.asarray(res.status) == int(SolverStatus.TimeLimit)).all()


def test_batched_compaction_many_chunks():
    """Small chunks force many dispatches, harvests and tier repacks;
    results must land in original lane order."""
    inst = hs71_instance()
    rng = np.random.default_rng(3)
    x0s = np.stack(
        [inst.x_0 + rng.uniform(-0.05, 0.05, size=inst.x_0.shape) for _ in range(6)]
    )
    params = Params(iteration_limit=1000, rho=1e-2, integration_chunk=64)
    res = BatchedIntegrationSolver(inst.problem, params).solve(x0s)
    assert res.success.all()
    # every lane converges to the HS71 optimum regardless of harvest order
    np.testing.assert_allclose(res.x, np.tile(inst.x_opt, (6, 1)), atol=1e-6)
    # lanes genuinely finish at different chunk boundaries
    assert len(set(res.num_integration_steps.tolist())) > 1


def test_device_loop_finite_time_limit_chunked():
    """Finite time_limit routes through the flat chunked engine; a
    generous limit reproduces the single-dispatch device-loop result, a
    tiny limit yields TimeLimit."""
    inst = hs71_instance()
    base = dict(iteration_limit=1000, rho=1e-2, integration_device_loop=True)

    ref = IntegrationSolver(inst.problem, Params(**base)).solve(inst.x_0, inst.y_0)
    gen = IntegrationSolver(
        inst.problem, Params(**base, time_limit=9000.0)
    ).solve(inst.x_0, inst.y_0)
    assert gen.status == ref.status
    assert gen.iterations == ref.iterations
    assert gen.num_integration_steps == ref.num_integration_steps
    np.testing.assert_allclose(np.asarray(gen.x), np.asarray(ref.x), rtol=1e-12)

    cut = IntegrationSolver(
        inst.problem, Params(**base, time_limit=1e-9, integration_chunk=8)
    ).solve(inst.x_0, inst.y_0)
    assert cut.status == SolverStatus.TimeLimit


def test_sharded_integration_matches_batched():
    """ShardedIntegrationSolver over the 8-device CPU mesh reproduces the
    single-chip batched engine lane for lane: statuses and solutions
    match; segment counts may differ by one where a borderline event
    crossing rounds differently under the different vectorization width
    (1 lane per device vs an 8-wide vmap)."""
    from pygradflow_tpu.integration import ShardedIntegrationSolver

    inst = hs71_instance()
    params = _params()
    rng = np.random.default_rng(11)
    lo = np.array([1.0, 1.0, 1.0, 1.0, 0.0])
    hi = np.array([5.0, 5.0, 5.0, 5.0, 2.0])
    x0s = np.clip(inst.x_0[None, :] + rng.uniform(-0.1, 0.1, (8, 5)), lo, hi)
    y0s = np.tile(inst.y_0, (8, 1))

    batched = BatchedIntegrationSolver(inst.problem, params).solve(x0s, y0s)
    sharded = ShardedIntegrationSolver(inst.problem, params).solve(x0s, y0s)

    np.testing.assert_array_equal(sharded.status, batched.status)
    assert np.abs(sharded.iterations - batched.iterations).max() <= 1
    np.testing.assert_allclose(sharded.x, batched.x, rtol=0, atol=1e-6)
    np.testing.assert_allclose(sharded.y, batched.y, rtol=0, atol=1e-5)
