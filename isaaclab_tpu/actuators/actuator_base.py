"""Actuator base: per-joint-group torque models.

TPU-native counterpart of the reference ``ActuatorBase``
(``actuators/actuator_base.py``): an actuator instance owns a *static* subset
of an articulation's joints (regex-resolved at build time) and maps command
targets to either an implicit PhysX-style joint drive or an explicit torque.
Stateful actuators (delay lines, LSTM nets) carry state in explicit pytrees.

The compute contract: ``compute(state, control, q, qd) -> (state, drive)``
where ``drive`` holds per-joint (kp, kd, pos_target, vel_target, effort)
contributions that the articulation scatters into the engine's
:class:`~isaaclab_tpu.physics.engine.JointDrive` (reference
articulation.py:_apply_actuator_model:1432).
"""

from __future__ import annotations

from dataclasses import MISSING
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..utils import string as string_utils
from ..utils.configclass import configclass


class ActuatorCommand(NamedTuple):
    """Targets for one actuator group (already sliced to its joints)."""

    pos_target: jnp.ndarray
    vel_target: jnp.ndarray
    effort: jnp.ndarray


class ActuatorDrive(NamedTuple):
    """Resolved drive for the group's joints."""

    kp: jnp.ndarray
    kd: jnp.ndarray
    pos_target: jnp.ndarray
    vel_target: jnp.ndarray
    effort: jnp.ndarray


class ActuatorState(NamedTuple):
    """Generic actuator state container; unused slots are empty arrays."""

    buffers: tuple = ()


@configclass
class ActuatorBaseCfg:
    """Reference ``ActuatorBaseCfg``: joint regex + gain/limit overrides.

    Values may be float (applied to all joints) or dict[regex -> float].
    """

    class_type: type = MISSING
    joint_names_expr: list = MISSING
    effort_limit: object = None
    velocity_limit: object = None
    effort_limit_sim: object = None
    velocity_limit_sim: object = None
    stiffness: object = None
    damping: object = None
    armature: object = None
    friction: object = None


def _resolve_param(value, default, joint_names):
    """Resolve float | dict[regex->float] | None to an (n,) HOST numpy array.

    Host-side on purpose: these are construction-time constants consumed by
    later device code; returning device arrays here forces device-to-host
    copies in consumers (and a single D2H permanently degrades dispatch on
    tunneled-TPU runtimes).
    """
    n = len(joint_names)
    if value is None:
        return np.broadcast_to(
            np.asarray(default, dtype=np.float32), (n,)
        ).copy()
    if isinstance(value, dict):
        out = np.broadcast_to(
            np.asarray(default, dtype=np.float32), (n,)
        ).copy()
        idx, _, vals = string_utils.resolve_matching_names_values(value, joint_names)
        for i, v in zip(idx, vals):
            out[i] = v
        return out
    return np.full((n,), float(value), dtype=np.float32)


class ActuatorBase:
    """Host-side actuator instance bound to a joint subset.

    Parameters are resolved to arrays at construction (trace-time constants /
    initial values for randomizable state).
    """

    is_implicit: bool = False

    def __init__(self, cfg: ActuatorBaseCfg, joint_names: list, joint_ids: list,
                 default_stiffness=0.0, default_damping=0.0):
        self.cfg = cfg
        self.joint_names = list(joint_names)
        self.joint_ids = np.asarray(joint_ids, dtype=np.int32)
        n = len(joint_names)
        self.num_joints = n
        self.stiffness = _resolve_param(cfg.stiffness, default_stiffness, joint_names)
        self.damping = _resolve_param(cfg.damping, default_damping, joint_names)
        self.effort_limit = _resolve_param(cfg.effort_limit, 1e9, joint_names)
        self.velocity_limit = _resolve_param(cfg.velocity_limit, 1e9, joint_names)
        self.armature = (
            _resolve_param(cfg.armature, 0.0, joint_names)
            if cfg.armature is not None
            else None
        )
        self.friction = (
            _resolve_param(cfg.friction, 0.0, joint_names)
            if cfg.friction is not None
            else None
        )

    # ------------------------------------------------------------------
    def init_state(self, num_envs: int) -> ActuatorState:
        return ActuatorState()

    def reset(self, state: ActuatorState, env_mask) -> ActuatorState:
        return state

    def compute(
        self, state: ActuatorState, control: ActuatorCommand, q, qd
    ) -> tuple[ActuatorState, ActuatorDrive]:
        raise NotImplementedError
