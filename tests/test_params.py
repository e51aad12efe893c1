"""Params YAML round-trip (mirror of reference ``test_params.py``)."""

import numpy as np

from pygradflow_tpu import (
    LinearSolverType,
    NewtonType,
    Params,
    PenaltyUpdate,
    Precision,
)


def test_yaml_roundtrip(tmp_path):
    params = Params(
        newton_type=NewtonType.Full,
        penalty_update=PenaltyUpdate.DualEquilibration,
        linear_solver_type=LinearSolverType.LDLT,
        precision=Precision.Single,
        rho=1e-4,
        opt_tol=1e-7,
    )
    path = tmp_path / "params.yml"
    params.write(str(path))
    restored = Params.read(str(path))

    for key, _ in params.annotations():
        assert getattr(restored, key) == getattr(params, key), key


def test_yaml_write_with_array_fields(tmp_path):
    """numpy arrays in fixed_active_set / scaling_primal have no SafeDumper
    representer by default; write() must round-trip them as plain lists
    instead of raising RepresenterError."""
    params = Params(
        newton_type=NewtonType.FixedActiveSet,
        fixed_active_set=np.array([True, False, True]),
        scaling_primal=np.array([1.0, 2.0]),
        rho=np.float64(0.5),
    )
    path = tmp_path / "params.yml"
    params.write(str(path))
    restored = Params.read(str(path))
    assert restored.fixed_active_set == [True, False, True]
    assert restored.scaling_primal == [1.0, 2.0]
    assert restored.rho == 0.5


def test_string_enum_coercion():
    params = Params(newton_type="Full", penalty_update="Constant")
    assert params.newton_type == NewtonType.Full
    assert params.penalty_update == PenaltyUpdate.Constant


def test_dtype():
    assert Params().dtype == np.float64
    assert Params(precision=Precision.Single).dtype == np.float32
