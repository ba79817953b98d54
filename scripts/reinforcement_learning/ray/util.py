"""Cluster-job helpers (reference ``scripts/reinforcement_learning/ray/util.py``).

TPU recast: resources are counted in TPU chips per node instead of GPUs; when
the ``ray`` package is unavailable (this offline image) every helper that can
degrade to a local subprocess does so, so the job-dispatch surface stays
testable end-to-end.
"""

from __future__ import annotations

import os
import shlex
import subprocess
import sys


def ray_available() -> bool:
    try:
        import ray  # noqa: F401

        return True
    except ImportError:
        return False


def load_tensorboard_logs(directory: str) -> dict:
    """Latest scalar per tag from every tfevents file under ``directory``
    (reference util.py:load_tensorboard_logs; used by tuner reporting)."""
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    scalars: dict = {}
    for root, _dirs, files in os.walk(directory):
        for f in files:
            if "tfevents" not in f:
                continue
            acc = EventAccumulator(os.path.join(root, f))
            acc.Reload()
            for tag in acc.Tags().get("scalars", []):
                events = acc.Scalars(tag)
                if events:
                    scalars[tag] = events[-1].value
    return scalars


def get_invocation_command_from_cfg(cfg: dict, python_cmd: str = sys.executable) -> str:
    """Build a train.py invocation string from a job cfg dict
    (reference util.py:get_invocation_command_from_cfg): ``runner_args`` are
    CLI flags, ``hydra_args`` are dotted overrides appended last."""
    runner_args = cfg.get("runner_args", {})
    hydra_args = cfg.get("hydra_args", {})
    script = cfg.get(
        "workflow",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "rsl_rl", "train.py"),
    )
    parts = [python_cmd, script]
    for k, v in runner_args.items():
        if isinstance(v, bool):
            if v:
                parts.append(str(k))
        else:
            parts += [str(k), str(v)]
    for k, v in hydra_args.items():
        parts.append(f"{k}={v}")
    return " ".join(shlex.quote(p) for p in parts)


def execute_job(
    job_cmd: str,
    identifier_string: str = "job 0",
    extract_experiment: bool = False,
    log_all_output: bool = False,
) -> dict:
    """Run one job as a subprocess, streaming output with an identifying
    prefix (reference util.py:execute_job). Returns a result dict with the
    experiment log dir when ``extract_experiment`` and the job printed one.
    """
    result: dict = {"id": identifier_string, "cmd": job_cmd}
    proc = subprocess.Popen(
        shlex.split(job_cmd),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    logdir = None
    assert proc.stdout is not None
    for line in proc.stdout:
        if log_all_output:
            print(f"[{identifier_string}] {line}", end="", flush=True)
        if extract_experiment and ("logdir:" in line or "log_dir" in line):
            logdir = line.split(":", 1)[-1].strip()
    proc.wait()
    result["returncode"] = proc.returncode
    if logdir:
        result["experiment_logdir"] = logdir
        result["tensorboard"] = load_tensorboard_logs(logdir)
    return result


def get_tpu_node_resources(one_node_only: bool = False) -> list[dict]:
    """Per-node resource dicts, sorted by descending accelerator count
    (reference util.py:get_gpu_node_resources sorted nodes). With ray: query
    the cluster; without: report this host's devices via jax."""
    if ray_available():
        import ray

        if not ray.is_initialized():
            ray.init(address="auto", log_to_driver=False)
        nodes = []
        for node in ray.nodes():
            if not node.get("Alive", False):
                continue
            res = node.get("Resources", {})
            chips = res.get("TPU", res.get("GPU", 0))
            nodes.append(
                {
                    "id": node["NodeID"],
                    "chips": int(chips),
                    "cpus": int(res.get("CPU", 0)),
                    "ram_gb": res.get("memory", 0) / 1e9,
                }
            )
        nodes.sort(key=lambda n: (-n["chips"], -n["cpus"], -n["ram_gb"], n["id"]))
        return nodes[:1] if one_node_only else nodes
    import jax

    return [
        {
            "id": "local",
            "chips": jax.device_count(),
            "cpus": os.cpu_count() or 1,
            "ram_gb": 0.0,
        }
    ]


def add_resource_arguments(parser):
    """Shared resource CLI flags (reference util.py:add_resource_arguments)."""
    parser.add_argument("--num_workers", type=int, default=None,
                        help="split each node into this many workers")
    parser.add_argument("--num_cpu_per_worker", type=float, default=None)
    parser.add_argument("--chips_per_worker", type=float, default=None,
                        help="TPU chips per worker (reference: gpu_per_worker)")
    parser.add_argument("--ram_gb_per_worker", type=float, default=None)
    return parser


def fill_in_missing_resources(args, resources: list[dict]) -> list[dict]:
    """Derive per-worker resources from node totals when unspecified
    (reference util.py:fill_in_missing_resources)."""
    workers = []
    for node in resources:
        n = args.num_workers or 1
        workers.append(
            {
                "node": node["id"],
                "num_workers": n,
                "cpus": args.num_cpu_per_worker or max(node["cpus"] // n, 1),
                "chips": args.chips_per_worker
                if args.chips_per_worker is not None
                else max(node["chips"] // n, 1),
                "ram_gb": args.ram_gb_per_worker or node["ram_gb"] / max(n, 1),
            }
        )
    return workers
