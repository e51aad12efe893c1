"""Benchmark runner harness (reference ``runners/runner.py``).

Same CLI and CSV surface as the reference: argparse flags auto-generated
from the ``Params`` annotations, instance filtering (``--max_size``,
``--name``, ``--unconstrained``), per-run ``params.yml`` + ``output.csv``
with identical columns (``runner.py:303-316``), per-instance log files.

Execution mode differs by design: the reference fans instances out over OS
processes (``runner.py:107-153``); on TPU a process pool would fight over
one accelerator, so the runner solves sequentially (one jit-compiled solve
per instance) — instance-sweep parallelism lives in
``pygradflow_tpu.parallel.BatchedSolver``/``ShardedSolver``, which vmap a
*family* of same-structure instances in lockstep (the TPU-native analog of
the reference's process pool; see ``benchmarks/bench_hs.py``).
"""

import csv
import datetime
import enum
import logging
import os
from abc import ABC, abstractmethod

import numpy as np

from ..log import logger
from ..params import Params
from ..status import SolverStatus

run_logger = logging.getLogger(__name__)

formatter = logging.Formatter("%(asctime)s:%(name)s:%(levelname)s:%(message)s")

FIELDNAMES = [
    "instance",
    "num_vars",
    "num_cons",
    "size",
    "status",
    "total_time",
    "iterations",
    "num_accepted_steps",
    "final_scaled_obj",
    "final_stat_res",
    "final_cons_violation",
    "dist_factor",
]


def solve_instance(instance, params, log_filename, verbose):
    logger.handlers.clear()

    handler = None
    if log_filename is not None:
        handler = logging.FileHandler(log_filename)
        handler.setFormatter(formatter)
        logger.addHandler(handler)

    if verbose:
        handler = logging.StreamHandler()
        handler.setFormatter(formatter)
        logger.addHandler(handler)

    logger.setLevel(logging.INFO)

    try:
        result = instance.solve(params)
        return (instance, result)
    except Exception as exc:
        logger.error("Error solving %s", instance.name, exc_info=exc)
        return (instance, "error")


class Runner(ABC):
    def __init__(self, name):
        self.name = name

    @abstractmethod
    def get_instances(self, args):
        raise NotImplementedError()

    def create_params(self, args) -> Params:
        params = Params()
        for key, attr in params.annotations():
            if not hasattr(args, key):
                continue
            value = getattr(args, key)
            if isinstance(attr, enum.EnumMeta) and isinstance(value, str):
                value = attr[value]
            setattr(params, key, value)
        return params

    def log_filename(self, args, instance):
        if args.no_output:
            return None
        return self.output_filename(args, f"{instance.name}.log")

    def solve_instances(self, instances, args):
        params = self.create_params(args)
        run_logger.info("Solving %d instances", len(instances))
        for instance in instances:
            log_filename = self.log_filename(args, instance)
            yield solve_instance(instance, params, log_filename, args.verbose)

    def filter_instances(self, args):
        instances = []
        for instance in self.get_instances(args):
            if args.max_size is not None and instance.size > args.max_size:
                continue
            if args.unconstrained and instance.num_cons > 0:
                continue
            if args.name is not None and args.name != instance.name:
                continue
            instances.append(instance)
        return instances

    def parser(self):
        import argparse

        parser = argparse.ArgumentParser()
        group = parser.add_argument_group(title="parameters")

        default_params = Params()

        for key, attr in default_params.annotations():
            name = f"--{key}"
            if isinstance(attr, enum.EnumMeta):
                default_value = getattr(default_params, key).name
                group.add_argument(
                    name, default=default_value, type=str, help="Default: %(default)s"
                )
            else:
                default_value = getattr(default_params, key)
                argtype = attr if isinstance(attr, type) else None
                if argtype in (int, float, bool, str):
                    group.add_argument(
                        name,
                        default=default_value,
                        type=argtype,
                        help="Default: %(default)s",
                    )

        group = parser.add_argument_group(title="runner")
        parser.add_argument("--output", type=str)
        parser.add_argument("--no_output", action="store_true")
        parser.add_argument("--max_size", type=int)
        parser.add_argument("--name", type=str)
        parser.add_argument("--unconstrained", action="store_true")
        parser.add_argument("--verbose", action="store_true")
        return parser

    def output_filename(self, args, filename):
        return os.path.join(args.output, filename)

    def main(self, argv=None):
        run_logger.setLevel(logging.INFO)
        handler = logging.StreamHandler()
        handler.setFormatter(formatter)
        run_logger.addHandler(handler)

        args = self.parser().parse_args(argv)

        if not args.no_output:
            if args.output is None:
                now = datetime.datetime.now().isoformat("T", "seconds")
                args.output = f"output_{self.name}_{now}"
            os.makedirs(args.output, exist_ok=True)

        instances = self.filter_instances(args)
        self.solve(instances, args)

    def create_csv_row(self, args, instance, result):
        info = {
            "instance": instance.name,
            "num_vars": instance.num_vars,
            "num_cons": instance.num_cons,
            "size": instance.size,
        }

        default_props = {
            "iterations": 0,
            "num_accepted_steps": 0,
            "final_scaled_obj": 0.0,
            "final_stat_res": 0.0,
            "final_cons_violation": 0.0,
            "dist_factor": 0.0,
        }

        if result == "timeout":
            return {
                **info,
                "status": "timeout",
                "total_time": args.time_limit,
                **default_props,
            }
        elif result == "error":
            return {**info, "status": "error", "total_time": 0.0, **default_props}
        else:
            return {
                **info,
                "status": SolverStatus.short_name(result.status),
                "total_time": result.total_time,
                "iterations": result.iterations,
                "num_accepted_steps": result.num_accepted_steps,
                "final_scaled_obj": result.final_scaled_obj,
                "final_stat_res": result.final_stat_res,
                "final_cons_violation": result.final_cons_violation,
                "dist_factor": result.dist_factor,
            }

    def solve(self, instances, args):
        with_output = not args.no_output
        params = self.create_params(args)

        writer = None
        output_file = None
        if with_output:
            params.write(self.output_filename(args, "params.yml"))
            filename = self.output_filename(args, "output.csv")
            run_logger.info("Writing results to '%s'", filename)
            output_file = open(filename, "w")
            writer = csv.DictWriter(output_file, fieldnames=FIELDNAMES)
            writer.writeheader()

        try:
            for instance, result in self.solve_instances(instances, args):
                run_logger.info("Finished instance %s", instance.name)
                if writer is not None:
                    writer.writerow(self.create_csv_row(args, instance, result))
                    output_file.flush()
        finally:
            if output_file is not None:
                output_file.close()
