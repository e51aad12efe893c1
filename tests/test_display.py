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
