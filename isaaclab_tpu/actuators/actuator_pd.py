"""PD-family actuator models (reference ``actuators/actuator_pd.py``)."""

from __future__ import annotations

from dataclasses import MISSING

import jax.numpy as jnp

from ..utils.buffers import DelayBuffer
from ..utils.configclass import configclass
from ..utils.interpolation import LinearInterpolation
from .actuator_base import (
    ActuatorBase,
    ActuatorBaseCfg,
    ActuatorCommand,
    ActuatorDrive,
    ActuatorState,
)


class ImplicitActuator(ActuatorBase):
    """Pass-through: PD handled inside the engine's implicit joint drive
    (reference actuator_pd.py:34 — PhysX drive does the PD)."""

    is_implicit = True

    def compute(self, state, control: ActuatorCommand, q, qd):
        drive = ActuatorDrive(
            kp=self.stiffness,
            kd=self.damping,
            pos_target=control.pos_target,
            vel_target=control.vel_target,
            effort=jnp.clip(control.effort, -self.effort_limit, self.effort_limit),
        )
        return state, drive


class IdealPDActuator(ActuatorBase):
    """Explicit tau = kp (q* - q) + kd (qd* - qd) + tau_ff, clipped
    (reference actuator_pd.py:148-198)."""

    is_implicit = False

    def _raw_torque(self, control: ActuatorCommand, q, qd):
        return (
            self.stiffness * (control.pos_target - q)
            + self.damping * (control.vel_target - qd)
            + control.effort
        )

    def _clip(self, effort, qd):
        return jnp.clip(effort, -self.effort_limit, self.effort_limit)

    def compute(self, state, control: ActuatorCommand, q, qd):
        effort = self._clip(self._raw_torque(control, q, qd), qd)
        zeros = jnp.zeros_like(effort)
        return state, ActuatorDrive(
            kp=zeros, kd=zeros, pos_target=zeros, vel_target=zeros, effort=effort
        )


class DCMotor(IdealPDActuator):
    """Velocity-dependent torque saturation envelope
    (reference actuator_pd.py:201-286, ``_clip_effort:276``)."""

    def __init__(self, cfg, joint_names, joint_ids, **kw):
        super().__init__(cfg, joint_names, joint_ids, **kw)
        self.saturation_effort = float(
            cfg.saturation_effort if cfg.saturation_effort is not None else 1e9
        )

    def _clip(self, effort, qd):
        # torque-speed curve: max torque drops linearly with speed
        max_eff = self.saturation_effort * (1.0 - qd / self.velocity_limit)
        max_eff = jnp.clip(max_eff, 0.0, self.effort_limit)
        min_eff = self.saturation_effort * (-1.0 - qd / self.velocity_limit)
        min_eff = jnp.clip(min_eff, -self.effort_limit, 0.0)
        return jnp.clip(effort, min_eff, max_eff)


class DelayedPDActuator(IdealPDActuator):
    """PD with DelayBuffer-based command latency (reference actuator_pd.py:289)."""

    def __init__(self, cfg, joint_names, joint_ids, **kw):
        super().__init__(cfg, joint_names, joint_ids, **kw)
        self.max_delay = int(cfg.max_delay)

    def init_state(self, num_envs: int):
        n = self.num_joints
        return ActuatorState(
            buffers=(
                DelayBuffer.create(self.max_delay, num_envs, (n,)),
                DelayBuffer.create(self.max_delay, num_envs, (n,)),
            )
        )

    def reset(self, state, env_mask):
        pos_buf, vel_buf = state.buffers
        return ActuatorState(buffers=(pos_buf.reset(env_mask), vel_buf.reset(env_mask)))

    def compute(self, state, control: ActuatorCommand, q, qd):
        pos_buf, vel_buf = state.buffers
        pos_buf, pos_t = pos_buf.compute(control.pos_target)
        vel_buf, vel_t = vel_buf.compute(control.vel_target)
        control = control._replace(pos_target=pos_t, vel_target=vel_t)
        _, drive = super().compute(state, control, q, qd)
        return ActuatorState(buffers=(pos_buf, vel_buf)), drive


class RemotizedPDActuator(DelayedPDActuator):
    """Delayed PD with angle-dependent torque limit lookup (ANYmal knee
    linkage, reference actuator_pd.py:349)."""

    def __init__(self, cfg, joint_names, joint_ids, **kw):
        super().__init__(cfg, joint_names, joint_ids, **kw)
        tbl = jnp.asarray(cfg.joint_parameter_lookup)  # (n, 2): angle, max_torque
        self._interp = LinearInterpolation(tbl[:, 0], tbl[:, 1])

    def compute(self, state, control, q, qd):
        state, drive = super().compute(state, control, q, qd)
        abs_limit = self._interp.compute(q)
        return state, drive._replace(
            effort=jnp.clip(drive.effort, -abs_limit, abs_limit)
        )


# -----------------------------------------------------------------------------
# Cfg classes (reference actuators/actuator_cfg.py)
# -----------------------------------------------------------------------------


@configclass
class ImplicitActuatorCfg(ActuatorBaseCfg):
    class_type: type = ImplicitActuator


@configclass
class IdealPDActuatorCfg(ActuatorBaseCfg):
    class_type: type = IdealPDActuator


@configclass
class DCMotorCfg(IdealPDActuatorCfg):
    class_type: type = DCMotor
    saturation_effort: float = None


@configclass
class DelayedPDActuatorCfg(IdealPDActuatorCfg):
    class_type: type = DelayedPDActuator
    min_delay: int = 0
    max_delay: int = 0


@configclass
class RemotizedPDActuatorCfg(DelayedPDActuatorCfg):
    class_type: type = RemotizedPDActuator
    joint_parameter_lookup: object = MISSING
