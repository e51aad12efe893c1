"""Kernel-count analysis of one solver iteration (CPU-compiled proxy).

On the axon rig each XLA kernel launch costs ~1 ms through the tunnel, so
the number of post-fusion instructions in the compiled iteration body
bounds ms/iteration far more tightly than FLOPs (see CLAUDE.md).  This
script compiles ``SolveLoop.body`` for the pendulum-control problem under
a chosen tier and reports post-optimization instruction counts (total and
by opcode, entry + all nested computations reachable from while loops).

CPU fusion differs from TPU Mosaic/XLA-TPU fusion in detail, so treat the
numbers as *relative* guidance between tiers, not absolute ms.

Usage: env PYTHONPATH= python benchmarks/count_iteration_ops.py [N] [tier...]
tiers: dense | mf | mf_base128 | mf_base512 ...
"""

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def count_ops(compiled_text):
    """Post-fusion instruction census at thunk level: only ENTRY and
    while-loop body/condition computations (each instruction there is a
    dispatched kernel or control edge), NOT the insides of fusion
    computations (those run as one kernel)."""
    total = Counter()
    in_thunk_comp = False
    for line in compiled_text.splitlines():
        comp = re.match(r"(ENTRY )?%?([\w.\-]+)[ ]*\([^)]*\) -> ", line)
        if comp:
            name = comp.group(2)
            # thunk level = ENTRY + while/conditional bodies (region_*);
            # fusion insides (fused_computation*) and reduce/scatter
            # applied-function wrappers (wrapped_*) run within one kernel
            in_thunk_comp = bool(comp.group(1)) or name.startswith("region_")
            continue
        if not in_thunk_comp:
            continue
        m = re.match(r"\s+(?:ROOT )?[%\w.\-]+ = \S+ ([a-z\-]+)\(", line)
        if m:
            total[m.group(1)] += 1
    return total


def build(N, tier):
    from pygradflow_tpu import LinearSolverType, Params, StepSolverType
    from pygradflow_tpu.runners.control import PendulumControlInterleaved
    from pygradflow_tpu.solver import SolveLoop
    from pygradflow_tpu.transform import Transformation

    prob = PendulumControlInterleaved(N=N)
    common = dict(
        step_solver_type=StepSolverType.Schur,
        schur_block_size=3,
        schur_dual_block_size=2,
        linear_solver_type=LinearSolverType.PallasLDLT,
        validate_input=False,
        iteration_limit=500,
    )
    if tier == "dense":
        params = Params(**common)
    elif tier == "mf":
        params = Params(matrix_free=True, **common)
    elif tier.startswith("mf_base"):
        import pygradflow_tpu.step.schur_staged as ss
        from pygradflow_tpu.linalg import block_tridiag as bt

        base = int(tier[len("mf_base"):])
        bt.BCR_HYBRID_BASE = base
        ss.BCR_HYBRID_BASE = base
        params = Params(matrix_free=True, **common)
    else:
        raise SystemExit(f"unknown tier {tier}")

    loop = SolveLoop(Transformation(prob, params), params)
    x0 = jnp.asarray(prob.x0_trajectory())
    y0 = jnp.zeros(prob.num_cons)
    state = loop._init_state(x0, y0)
    return loop, state


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    tiers = sys.argv[2:] or ["dense", "mf"]

    for tier in tiers:
        loop, state = build(N, tier)
        lowered = jax.jit(loop.body).lower(state)
        compiled = lowered.compile()
        text = compiled.as_text()
        ops = count_ops(text)
        glue = {"parameter", "constant", "get-tuple-element", "tuple",
                "bitcast", "copy"}
        kernels = sum(v for k, v in ops.items() if k not in glue)
        top = ", ".join(f"{k}:{v}" for k, v in ops.most_common(12))
        print(f"N={N} tier={tier}: ~{kernels} kernel-level ops | {top}",
              flush=True)


if __name__ == "__main__":
    main()
