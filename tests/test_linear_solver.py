"""Linear-solver backend tests (mirror of reference ``test_linear_solver.py``):
solve posdef/indefinite/negdef systems with every backend and cross-check
inertia against dense eigendecomposition."""

import jax.numpy as jnp
import numpy as np
import pytest

from pygradflow_tpu.linalg import LinearSolverError, linear_solver
from pygradflow_tpu.params import LinearSolverType

rng = np.random.default_rng(42)


def _posdef(n=5):
    A = rng.standard_normal((n, n))
    return A @ A.T + n * np.eye(n)


def _indef(n=5):
    A = _posdef(n)
    w, V = np.linalg.eigh(A)
    w[:2] *= -1.0
    return V @ np.diag(w) @ V.T


def _negdef(n=5):
    return -_posdef(n)


MATRICES = {"posdef": _posdef(), "indef": _indef(), "negdef": _negdef()}

SYMMETRIC_BACKENDS = [
    LinearSolverType.LU,
    LinearSolverType.LDLT,
    LinearSolverType.MINRES,
    LinearSolverType.GMRES,
]


@pytest.mark.parametrize("kind", list(MATRICES))
@pytest.mark.parametrize("backend", SYMMETRIC_BACKENDS)
def test_solve(kind, backend):
    A = MATRICES[kind]
    b = rng.standard_normal(A.shape[0])

    lin = linear_solver(backend, symmetric=True)
    fact = lin.factor(jnp.asarray(A))
    x = np.asarray(lin.solve(fact, jnp.asarray(b)))

    np.testing.assert_allclose(A @ x, b, atol=1e-8)


@pytest.mark.parametrize("kind", list(MATRICES))
@pytest.mark.parametrize("backend", [LinearSolverType.LU, LinearSolverType.GMRES])
def test_solve_trans(kind, backend):
    A = MATRICES[kind] + 0.3 * rng.standard_normal(MATRICES[kind].shape)
    b = rng.standard_normal(A.shape[0])

    lin = linear_solver(backend)
    fact = lin.factor(jnp.asarray(A))
    x = np.asarray(lin.solve_trans(fact, jnp.asarray(b)))

    np.testing.assert_allclose(A.T @ x, b, atol=1e-8)


@pytest.mark.parametrize("kind", list(MATRICES))
def test_inertia(kind):
    A = MATRICES[kind]
    expected = int((np.linalg.eigvalsh(A) < 0).sum())

    lin = linear_solver(LinearSolverType.LDLT, symmetric=True)
    fact = lin.factor(jnp.asarray(A))
    assert int(lin.num_neg_eigvals(fact)) == expected


def test_cholesky_posdef():
    A = MATRICES["posdef"]
    b = rng.standard_normal(A.shape[0])
    lin = linear_solver(LinearSolverType.Cholesky, symmetric=True)
    fact = lin.factor(jnp.asarray(A))
    x = np.asarray(lin.solve(fact, jnp.asarray(b)))
    np.testing.assert_allclose(A @ x, b, atol=1e-8)
    assert int(lin.num_neg_eigvals(fact)) == 0


def test_cholesky_indef_poisons():
    """Non-posdef matrix must yield non-finite values (rejected step),
    mirroring the reference's LinearSolverError on CHOLMOD failure."""
    A = MATRICES["negdef"]
    lin = linear_solver(LinearSolverType.Cholesky, symmetric=True)
    fact = lin.factor(jnp.asarray(A))
    x = np.asarray(lin.solve(fact, jnp.ones(A.shape[0])))
    assert not np.isfinite(x).all()


def test_minres_requires_symmetric():
    with pytest.raises(LinearSolverError):
        linear_solver(LinearSolverType.MINRES, symmetric=False)


def test_singular_poisons():
    A = np.zeros((3, 3))
    A[0, 0] = 1.0
    for backend in [LinearSolverType.LU, LinearSolverType.LDLT]:
        lin = linear_solver(backend, symmetric=True)
        fact = lin.factor(jnp.asarray(A))
        x = np.asarray(lin.solve(fact, jnp.ones(3)))
        assert not np.isfinite(x).all(), backend
