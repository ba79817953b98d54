"""Task-registry utilities (reference ``isaaclab_tasks/utils/parse_cfg.py``)."""

from __future__ import annotations

import importlib
import pkgutil

import gymnasium as gym


def import_packages(package_name: str, blacklist: list | None = None):
    """Recursively import submodules so gym.register calls fire
    (reference utils/importer.py)."""
    blacklist = blacklist or []
    package = importlib.import_module(package_name)
    if not hasattr(package, "__path__"):
        return
    for _, name, _ in pkgutil.walk_packages(package.__path__, package.__name__ + "."):
        if any(b in name for b in blacklist):
            continue
        importlib.import_module(name)


def load_cfg_from_registry(task_name: str, entry_point_key: str):
    """Resolve a registered cfg entry point to an instance
    (reference parse_cfg.py:19)."""
    spec = gym.spec(task_name)
    cfg_entry = spec.kwargs.get(entry_point_key)
    if cfg_entry is None:
        raise ValueError(
            f"Task '{task_name}' has no entry point '{entry_point_key}'."
        )
    if isinstance(cfg_entry, str):
        if ":" in cfg_entry:
            mod_name, attr = cfg_entry.split(":")
            mod = importlib.import_module(mod_name)
            cfg_entry = getattr(mod, attr)
        else:
            # yaml path
            import yaml

            with open(cfg_entry) as f:
                return yaml.safe_load(f)
    if isinstance(cfg_entry, type):
        return cfg_entry()
    if callable(cfg_entry):
        return cfg_entry()
    return cfg_entry


def parse_env_cfg(task_name: str, device: str = "tpu", num_envs: int | None = None,
                  use_fabric: bool = True):
    """Load + override an env cfg (reference parse_cfg.py:99)."""
    cfg = load_cfg_from_registry(task_name, "env_cfg_entry_point")
    if num_envs is not None:
        cfg.scene.num_envs = num_envs
    if hasattr(cfg, "sim"):
        cfg.sim.device = device
    return cfg


def get_checkpoint_path(log_path: str, run_dir: str = ".*", checkpoint: str = ".*",
                        other_dirs: list | None = None, sort_alpha: bool = True):
    """Find latest matching run/checkpoint (reference parse_cfg.py:139)."""
    import os
    import re

    runs = [
        os.path.join(log_path, run)
        for run in os.listdir(log_path)
        if re.fullmatch(run_dir, run)
        and os.path.isdir(os.path.join(log_path, run))
    ]
    if not runs:
        raise ValueError(f"No runs in {log_path} matching {run_dir}")
    runs.sort() if sort_alpha else runs.sort(key=os.path.getmtime)
    run_path = runs[-1]
    if other_dirs:
        run_path = os.path.join(run_path, *other_dirs)
    ckpts = [f for f in os.listdir(run_path) if re.fullmatch(checkpoint, f)]
    if not ckpts:
        raise ValueError(f"No checkpoints in {run_path} matching {checkpoint}")
    ckpts.sort()
    return os.path.join(run_path, ckpts[-1])
