#!/usr/bin/env python
"""Resource-wrapped sub-job dispatch (reference
``scripts/reinforcement_learning/ray/wrap_resources.py``).

Splits `+`-delimited sub-jobs across workers on accelerator nodes of a Ray
cluster; each worker gets a slice of the node's TPU chips/CPUs/RAM (the
reference slices GPUs). Without ray (this offline image) the sub-jobs run
sequentially as local subprocesses so the surface stays exercisable.

Usage:
    python wrap_resources.py --num_workers 2 --sub_jobs \\
        "python .../train.py --task A"+"python .../train.py --task B"
    python wrap_resources.py --test   # print the sorted node table only
"""

import argparse
import sys

import util

parser = argparse.ArgumentParser()
parser.add_argument("--test", action="store_true",
                    help="print sorted node resources and exit")
util.add_resource_arguments(parser)
parser.add_argument(
    "--sub_jobs", nargs=argparse.REMAINDER, default=[],
    help="'+'-delimited shell commands; must be the LAST argument",
)
args = parser.parse_args()


def main():
    nodes = util.get_tpu_node_resources()
    if args.test:
        for n in nodes:
            print(n)
        return
    sub_jobs = "+".join(args.sub_jobs).split("+") if args.sub_jobs else []
    sub_jobs = [j for j in (s.strip() for s in sub_jobs) if j]
    if not sub_jobs:
        print("no --sub_jobs given", file=sys.stderr)
        raise SystemExit(2)
    workers = util.fill_in_missing_resources(args, nodes)
    if util.ray_available():
        import ray

        @ray.remote
        def run(cmd, ident):
            return util.execute_job(cmd, ident, log_all_output=True)

        futures = []
        for i, job in enumerate(sub_jobs):
            w = workers[i % len(workers)]
            futures.append(
                run.options(
                    num_cpus=w["cpus"],
                    resources={"TPU": w["chips"]} if w["chips"] else None,
                ).remote(job, f"job {i}")
            )
        for r in ray.get(futures):
            print(r)
    else:
        print("# ray not installed: executing sub-jobs sequentially")
        for i, job in enumerate(sub_jobs):
            r = util.execute_job(job, f"job {i}", log_all_output=True)
            print(r)


if __name__ == "__main__":
    main()
