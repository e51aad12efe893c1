"""Hock-Schittkowski benchmark runner (CUTEst-runner counterpart,
reference ``runners/cutest_runner.py`` — pure-JAX HS problems instead of
the Fortran pycutest binding).

Run: ``python -m pygradflow_tpu.runners.hs_runner --no_output``
"""

import numpy as np

from .hs import HS_SPECS
from .instance import Instance
from .runner import Runner


class HSInstance(Instance):
    def __init__(self, spec):
        self.spec = spec
        prob = spec.problem()
        super().__init__(spec.name, prob.num_vars, prob.num_cons)

    def problem(self):
        return self.spec.problem()

    def x0(self):
        return np.asarray(self.spec.x0)

    def y0(self):
        return 0.0


class HSRunner(Runner):
    def __init__(self):
        super().__init__(name="hs")

    def get_instances(self, args):
        return [HSInstance(spec) for spec in HS_SPECS]


if __name__ == "__main__":
    HSRunner().main()
