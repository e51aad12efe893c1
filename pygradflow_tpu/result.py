"""Solve result container (reference ``pygradflow/result.py``)."""

import numpy as np

from .status import SolverStatus


class SolverResult:
    """Primal/dual solution plus run statistics.  Dynamic attributes
    (``final_stat_res`` etc.) are reachable as attributes like in the
    reference (``result.py:80-95``)."""

    def __init__(
        self,
        problem,
        x,
        y,
        d,
        status: SolverStatus,
        iterations: int,
        num_accepted_steps: int,
        total_time: float,
        dist_factor: float,
        **attrs,
    ):
        self.num_vars = problem.num_vars
        self.num_cons = problem.num_cons
        self._attrs = attrs

        self._x = np.asarray(x)
        self._y = np.asarray(y)
        self._d = np.asarray(d)
        self._status = status
        self.iterations = iterations
        self.num_accepted_steps = num_accepted_steps
        self.total_time = total_time
        self.dist_factor = dist_factor

    def _set_path(self, path, model_times):
        self._attrs["path"] = path
        self._attrs["model_times"] = model_times

        num_vars = self.num_vars

        self._attrs["primal_path"] = lambda: path[:num_vars]
        self._attrs["dual_path"] = lambda: path[num_vars:]

        def speed():
            return np.linalg.norm(np.diff(self.path, axis=1), axis=0) / np.diff(
                model_times
            )

        def primal_speed():
            return np.linalg.norm(
                np.diff(self.primal_path, axis=1), axis=0
            ) / np.diff(model_times)

        def dual_speed():
            return np.linalg.norm(np.diff(self.dual_path, axis=1), axis=0) / np.diff(
                model_times
            )

        self._attrs["model_speed"] = speed
        self._attrs["primal_model_speed"] = primal_speed
        self._attrs["dual_model_speed"] = dual_speed

    @property
    def status(self) -> SolverStatus:
        return self._status

    def __getattr__(self, name):
        attrs = super().__getattribute__("_attrs")
        val = attrs.get(name, None)
        if val is None:
            return val
        if callable(val):
            return val()
        return val

    def __setitem__(self, name, value):
        self._attrs[name] = value

    def __getitem__(self, name):
        return self._attrs[name]

    @property
    def x(self) -> np.ndarray:
        return self._x

    @property
    def y(self) -> np.ndarray:
        return self._y

    @property
    def d(self) -> np.ndarray:
        return self._d

    def __repr__(self) -> str:
        return "SolverResult(status={0})".format(self.status)

    @property
    def success(self):
        return SolverStatus.success(self.status)
