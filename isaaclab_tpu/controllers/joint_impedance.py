"""Joint impedance controller (reference ``controllers/joint_impedance.py``)."""

from __future__ import annotations

from dataclasses import MISSING

import jax.numpy as jnp

from ..utils.configclass import configclass


@configclass
class JointImpedanceControllerCfg:
    """Reference ``JointImpedanceControllerCfg``."""

    command_type: str = "p_abs"  # p_abs | p_rel
    impedance_mode: str = "fixed"  # fixed | variable_kp | variable
    stiffness: float = 100.0
    damping_ratio: float = 1.0
    stiffness_limits: tuple = (0.0, 300.0)
    damping_ratio_limits: tuple = (0.0, 100.0)
    inertial_compensation: bool = False
    gravity_compensation: bool = False


class JointImpedanceController:
    def __init__(self, cfg: JointImpedanceControllerCfg, num_joints: int):
        self.cfg = cfg
        self.num_joints = num_joints

    @property
    def action_dim(self) -> int:
        n = self.num_joints
        if self.cfg.impedance_mode == "variable_kp":
            return 2 * n
        if self.cfg.impedance_mode == "variable":
            return 3 * n
        return n

    def compute(self, command, joint_pos, joint_vel, mass_matrix=None,
                gravity=None):
        """Joint torques (reference joint_impedance.py compute)."""
        n = self.num_joints
        target = command[:, :n]
        if self.cfg.command_type == "p_rel":
            target = joint_pos + target
        if self.cfg.impedance_mode == "fixed":
            kp = jnp.full((n,), self.cfg.stiffness)
            ratio = self.cfg.damping_ratio
        elif self.cfg.impedance_mode == "variable_kp":
            kp = jnp.clip(command[:, n : 2 * n], *self.cfg.stiffness_limits)
            ratio = self.cfg.damping_ratio
        else:
            kp = jnp.clip(command[:, n : 2 * n], *self.cfg.stiffness_limits)
            ratio = jnp.clip(
                command[:, 2 * n : 3 * n], *self.cfg.damping_ratio_limits
            )
        kd = 2.0 * jnp.sqrt(kp) * ratio
        acc = kp * (target - joint_pos) - kd * joint_vel
        if self.cfg.inertial_compensation and mass_matrix is not None:
            tau = (mass_matrix @ acc[..., None])[..., 0]
        else:
            tau = acc
        if self.cfg.gravity_compensation and gravity is not None:
            tau = tau + gravity
        return tau
