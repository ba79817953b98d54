"""Sensor base (reference ``sensors/sensor_base.py:30``).

The reference defers sensor compute via staleness timestamps
(sensor_base.py:197-205); under jit we instead evaluate sensors on their
``update_period`` cadence with a step-counter mask (cheap branchless update —
XLA fuses the masked writes). Sensor state is an explicit pytree in
``SceneState.sensors``.
"""

from __future__ import annotations

from dataclasses import MISSING

from ..utils.configclass import configclass


@configclass
class SensorBaseCfg:
    """Reference ``SensorBaseCfg``."""

    class_type: type = MISSING
    prim_path: str = ""  # reference parity; entity binding uses regex on it
    update_period: float = 0.0
    history_length: int = 0
    debug_vis: bool = False


class SensorBase:
    """Host-side sensor bound to the scene at build time.

    Contract: ``init_state(E) -> pytree``; ``update(state, scene_state, dt) ->
    state``; ``reset(state, mask) -> state``; ``data_view(state)`` returns the
    data object term functions consume.
    """

    def __init__(self, cfg: SensorBaseCfg, scene):
        self.cfg = cfg
        self._scene = scene

    def init_state(self, num_envs: int):
        raise NotImplementedError

    def update(self, state, scene_state, dt: float):
        raise NotImplementedError

    def reset(self, state, env_mask, key=None):
        return state

    def data_view(self, state):
        raise NotImplementedError


def parse_entity_from_prim_path(prim_path: str, scene):
    """Resolve ``{ENV_REGEX_NS}/Robot/body_regex`` style paths to
    (entity_name, body_regex). The TPU build addresses entities by name."""
    parts = [p for p in prim_path.split("/") if p and "{" not in p]
    if not parts:
        raise ValueError(f"Cannot parse prim path: {prim_path}")
    entity = parts[0]
    body_regex = "/".join(parts[1:]) if len(parts) > 1 else ".*"
    return entity, body_regex
