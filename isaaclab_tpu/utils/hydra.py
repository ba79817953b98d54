"""Hydra-style dotted-path CLI overrides (reference
``isaaclab_tasks/utils/hydra.py:26-108``).

The reference registers cfgs into Hydra; this implements the same user-facing
surface — ``env.rewards.lin_vel_z_l2.weight=0`` style overrides applied to the
env/agent cfg object graphs — without the hydra dependency.
"""

from __future__ import annotations

import ast
from typing import Any


def set_by_dotted_path(obj: Any, path: str, value: Any) -> None:
    """Set ``a.b.c`` on an object graph (attributes or dict keys)."""
    parts = path.split(".")
    for p in parts[:-1]:
        if isinstance(obj, dict):
            obj = obj[p]
        else:
            obj = getattr(obj, p)
    last = parts[-1]
    if isinstance(obj, dict):
        obj[last] = value
    else:
        if not hasattr(obj, last):
            raise AttributeError(f"No attribute '{last}' on {type(obj).__name__}")
        setattr(obj, last, value)


def _parse_value(raw: str):
    try:
        return ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        if raw.lower() in ("true", "false"):
            return raw.lower() == "true"
        if raw.lower() in ("null", "none"):
            return None
        return raw


def apply_cli_overrides(env_cfg, agent_cfg, overrides: list[str]) -> None:
    """Apply ``env.*=...`` / ``agent.*=...`` overrides (reference
    hydra_task_config semantics)."""
    for ov in overrides:
        if "=" not in ov:
            continue
        path, raw = ov.split("=", 1)
        value = _parse_value(raw)
        if path.startswith("env."):
            set_by_dotted_path(env_cfg, path[4:], value)
        elif path.startswith("agent."):
            set_by_dotted_path(agent_cfg, path[6:], value)
        else:
            raise ValueError(
                f"Override '{ov}' must start with 'env.' or 'agent.'"
            )


def hydra_task_config(task_name: str, agent_cfg_entry_point: str):
    """Decorator mirroring the reference ``@hydra_task_config``: resolves the
    cfgs, applies ``sys.argv`` overrides, then calls the wrapped main."""

    def decorator(fn):
        def wrapper(*args, **kwargs):
            import sys

            from ..tasks.utils import load_cfg_from_registry

            env_cfg = load_cfg_from_registry(task_name, "env_cfg_entry_point")
            agent_cfg = load_cfg_from_registry(task_name, agent_cfg_entry_point)
            overrides = [a for a in sys.argv[1:] if "=" in a and not a.startswith("-")]
            apply_cli_overrides(env_cfg, agent_cfg, overrides)
            return fn(env_cfg, agent_cfg, *args, **kwargs)

        return wrapper

    return decorator
