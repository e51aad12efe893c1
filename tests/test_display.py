"""Display smoke test: live rows are emitted through the jit debug
callback with the expected columns."""

import logging

import numpy as np

from pygradflow_tpu import Params, Solver

from tests.problems import hs71_instance


def test_display_rows(caplog):
    inst = hs71_instance()
    params = Params(display=True, display_interval=0.0)
    with caplog.at_level(logging.INFO, logger="gradflow_tpu"):
        result = Solver(inst.problem, params).solve(inst.x_0, inst.y_0)
    assert result.success

    text = caplog.text
    for col in ["aug_lag", "cons_viol", "stat_res", "lamb", "rho", "accept"]:
        assert col in text
    # at least one data row with a yes/no acceptance marker
    assert (" yes" in text) or (" no" in text)


def test_inner_newton_debug_rows(caplog):
    """DEBUG level adds indented per-inner-Newton-iteration rows
    (reference ``display.py:307-315``): header + one row per inner step
    with residuum/dist/active columns."""
    inst = hs71_instance()
    params = Params(display=True, display_interval=0.0)
    with caplog.at_level(logging.DEBUG, logger="gradflow_tpu"):
        result = Solver(inst.problem, params).solve(inst.x_0, inst.y_0)
    assert result.success

    debug_lines = [
        r.message for r in caplog.records if r.levelno == logging.DEBUG
    ]
    assert any("residuum" in ln and "dist" in ln for ln in debug_lines)
    # data rows: indented, starting with the inner iteration counter
    rows = [ln for ln in debug_lines if ln.startswith("     ") and "e-" in ln or "e+" in ln]
    assert len(rows) >= 2


def test_inner_newton_rows_absent_at_info(caplog):
    """The DEBUG gate is trace-time: at INFO level no inner rows appear."""
    inst = hs71_instance()
    params = Params(display=True, display_interval=0.0)
    with caplog.at_level(logging.INFO, logger="gradflow_tpu"):
        result = Solver(inst.problem, params).solve(inst.x_0, inst.y_0)
    assert result.success
    assert not any("residuum" in r.message for r in caplog.records)
