"""Pretrained-checkpoint path conventions (reference
``isaaclab/utils/pretrained_checkpoint.py:25-122``).

The reference publishes per-task pretrained checkpoints to a Nucleus asset
server and resolves workflow-specific filenames/log layouts. The TPU recast
keeps the exact discovery API over the in-repo formats: every workflow's
runner writes msgpack full-TrainState checkpoints (rl/runner.py), and
"publishing" targets a filesystem/GCS prefix (``ISAACLAB_TPU_CKPT_ROOT``)
instead of Nucleus — zero-egress environments stay functional with a local
directory.
"""

from __future__ import annotations

import glob
import os
import shutil

WORKFLOWS = ["rl_games", "rsl_rl", "sb3", "skrl"]
"""Supported workflows (same set as the reference)."""

WORKFLOW_TRAINER = {
    w: f"scripts/reinforcement_learning/{w}/train.py" for w in WORKFLOWS
}
WORKFLOW_PLAYER = {
    w: f"scripts/reinforcement_learning/{w}/play.py" for w in WORKFLOWS
}

WORKFLOW_PRETRAINED_CHECKPOINT_FILENAMES = {
    "rl_games": "checkpoint.msgpack",
    "rsl_rl": "checkpoint.msgpack",
    "sb3": "checkpoint.zip",
    "skrl": "checkpoint.msgpack",
}
"""Published checkpoint filename per workflow (reference keeps the native
format of each library; the TPU adapters all serialize flax trees as
msgpack except the sb3 zip bundle)."""


def checkpoint_root() -> str:
    """Publish/fetch prefix — reference PRETRAINED_CHECKPOINT_PATH
    (Nucleus); here a filesystem or gcsfuse-mounted directory."""
    return os.environ.get(
        "ISAACLAB_TPU_CKPT_ROOT",
        os.path.join(os.path.expanduser("~"), ".isaaclab_tpu", "pretrained"),
    )


def get_log_root_path(workflow: str, task_name: str) -> str:
    """logs/{workflow}/{task} (reference get_log_root_path)."""
    return os.path.abspath(os.path.join("logs", workflow, task_name))


def _latest(path: str, pattern: str = "*"):
    entries = glob.glob(os.path.join(path, pattern))
    return max(entries, key=os.path.getmtime) if entries else None


def get_latest_job_run_path(workflow: str, task_name: str):
    """Most recent run directory for this workflow+task."""
    return _latest(get_log_root_path(workflow, task_name))


def get_pretrained_checkpoint_path(workflow: str, task_name: str):
    """Newest checkpoint from the newest local run (reference semantics;
    our runners all emit ``*.msgpack`` into the run dir, sb3 a zip)."""
    path = get_latest_job_run_path(workflow, task_name)
    if not path:
        return None
    if workflow == "sb3":
        p = os.path.join(path, "model.zip")
        return p if os.path.exists(p) else None
    return _latest(path, "*.msgpack")


def get_pretrained_checkpoint_publish_path(workflow: str, task_name: str) -> str:
    return os.path.join(
        checkpoint_root(), workflow, task_name,
        WORKFLOW_PRETRAINED_CHECKPOINT_FILENAMES[workflow],
    )


def publish_pretrained_checkpoint(workflow: str, task_name: str) -> str:
    """Copy the newest local checkpoint to the publish prefix."""
    src = get_pretrained_checkpoint_path(workflow, task_name)
    if src is None:
        raise FileNotFoundError(
            f"no local checkpoint for {workflow}/{task_name} under "
            f"{get_log_root_path(workflow, task_name)}"
        )
    dst = get_pretrained_checkpoint_publish_path(workflow, task_name)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    shutil.copy2(src, dst)
    return dst


def get_published_pretrained_checkpoint(workflow: str, task_name: str):
    """Resolve a published checkpoint (reference downloads from Nucleus;
    here the publish prefix IS the store, so resolution is a path check)."""
    p = get_pretrained_checkpoint_publish_path(workflow, task_name)
    return p if os.path.exists(p) else None


def has_pretrained_checkpoint_job_run(workflow: str, task_name: str) -> bool:
    return get_latest_job_run_path(workflow, task_name) is not None


def has_pretrained_checkpoint_job_finished(workflow: str, task_name: str) -> bool:
    """A run is finished when it produced at least one checkpoint."""
    return get_pretrained_checkpoint_path(workflow, task_name) is not None
