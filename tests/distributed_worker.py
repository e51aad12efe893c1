"""Worker process for the 2-process distributed test.

Started twice by ``tests/test_distributed.py`` (process_id 0 and 1); each
process simulates one 4-device host of a 2-host/8-device cluster and
solves the SAME global Rosenbrock batch through DistributedSolver.

Usage: python distributed_worker.py <process_id> <port> <out.npz>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from pygradflow_tpu import Params
    from pygradflow_tpu.parallel import DistributedSolver, init_distributed
    from pygradflow_tpu.parallel.distributed import host_batch_slice

    from problems import Rosenbrock

    info = init_distributed(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert info.num_processes == 2, info
    assert info.global_devices == 8, info

    rows = host_batch_slice(8)
    assert rows == slice(pid * 4, pid * 4 + 4), rows

    # every process passes the FULL batch; the solver slices internally
    x0s = np.stack(
        [np.array([0.1 * i - 0.4, 0.05 * i]) for i in range(8)], axis=0
    )
    solver = DistributedSolver(Rosenbrock(), Params())
    result = solver.solve(x0s)

    # part 2: TimeLimit under host clock skew must stop collectively.
    # Process 1 starts its Timer ~3.5s late; with time_limit=2 only
    # process 0 observes the deadline locally, so without the broadcast
    # in DistributedSolver._solve_multiprocess process 1 would re-enter
    # run() alone and wedge on the psum (this worker then never exits).
    import time

    from pygradflow_tpu.status import SolverStatus

    params2 = Params(
        jit_chunk=4, opt_tol=0.0, iteration_limit=100000, time_limit=2.0
    )
    if pid == 1:
        time.sleep(3.5)
    result2 = DistributedSolver(Rosenbrock(), params2).solve(x0s)
    status2 = np.asarray(result2.status)
    assert (status2 == int(SolverStatus.TimeLimit)).all(), status2

    np.savez(
        out_path,
        x=np.asarray(result.x),
        status=np.asarray(result.status),
        iterations=np.asarray(result.iterations),
        status_timelimit=status2,
    )
    print(f"[{pid}] done", flush=True)


if __name__ == "__main__":
    main()
