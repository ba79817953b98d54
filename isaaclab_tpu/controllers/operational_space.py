"""Operational-space controller (reference
``controllers/operational_space.py:23``): task-space impedance + nullspace
posture + optional wrench control. Pure batched jnp over engine-provided
jacobians/mass matrices.
"""

from __future__ import annotations

from dataclasses import MISSING

import jax.numpy as jnp

from ..utils import math as math_utils
from ..utils.configclass import configclass


@configclass
class OperationalSpaceControllerCfg:
    """Reference ``OperationalSpaceControllerCfg``."""

    target_types: list = ["pose_abs"]  # pose_abs | pose_rel | wrench_abs
    impedance_mode: str = "fixed"  # fixed | variable_kp | variable
    motion_stiffness_task: object = 100.0
    motion_damping_ratio_task: object = 1.0
    contact_wrench_stiffness_task: object = None
    gravity_compensation: bool = False
    inertial_dynamics_decoupling: bool = False
    partial_inertial_dynamics_decoupling: bool = False
    nullspace_control: str = "none"  # none | position
    nullspace_stiffness: float = 10.0
    nullspace_damping_ratio: float = 1.0


class OperationalSpaceController:
    def __init__(self, cfg: OperationalSpaceControllerCfg, num_envs: int):
        self.cfg = cfg
        self.num_envs = num_envs
        import numpy as _np

        # host numpy: trace-time constants (device closures force D2H)
        kp = _np.broadcast_to(
            _np.asarray(cfg.motion_stiffness_task, dtype=_np.float32), (6,)
        )
        self._kp = kp
        self._kd = (
            2.0 * _np.sqrt(kp) * _np.asarray(cfg.motion_damping_ratio_task)
        ).astype(_np.float32)

    @property
    def action_dim(self) -> int:
        dim = 0
        for t in self.cfg.target_types:
            dim += {"pose_abs": 7, "pose_rel": 6, "wrench_abs": 6}[t]
        if self.cfg.impedance_mode == "variable_kp":
            dim += 6
        elif self.cfg.impedance_mode == "variable":
            dim += 12
        return dim

    def compute(
        self,
        command,
        ee_pos,
        ee_quat,
        ee_vel,  # (E, 6) [lin, ang] world
        jacobian,  # (E, 6, n) [lin rows, ang rows]
        joint_pos=None,
        joint_vel=None,
        mass_matrix=None,
        gravity=None,
        default_joint_pos=None,
    ):
        """Joint torques realizing the task-space command
        (reference operational_space.py compute)."""
        idx = 0
        tau = jnp.zeros(jacobian.shape[:1] + jacobian.shape[2:])
        kp, kd = self._kp, self._kd
        for t in self.cfg.target_types:
            if t in ("pose_abs", "pose_rel"):
                if t == "pose_abs":
                    des_pos, des_quat = command[:, idx : idx + 3], command[:, idx + 3 : idx + 7]
                    idx += 7
                else:
                    des_pos, des_quat = math_utils.apply_delta_pose(
                        ee_pos, ee_quat, command[:, idx : idx + 6]
                    )
                    idx += 6
                pos_err, rot_err = math_utils.compute_pose_error(
                    ee_pos, ee_quat, des_pos, des_quat, "axis_angle"
                )
                err = jnp.concatenate([pos_err, rot_err], axis=-1)
                acc_des = kp * err - kd * ee_vel  # (E, 6)
                if self.cfg.inertial_dynamics_decoupling and mass_matrix is not None:
                    # task-space inertia: (J M^-1 J^T)^-1
                    m_inv = jnp.linalg.inv(mass_matrix)
                    lam_inv = jacobian @ m_inv @ jnp.swapaxes(jacobian, -1, -2)
                    lam = jnp.linalg.inv(
                        lam_inv + 1e-6 * jnp.eye(6)
                    )
                    force = (lam @ acc_des[..., None])[..., 0]
                else:
                    force = acc_des
                tau = tau + (jnp.swapaxes(jacobian, -1, -2) @ force[..., None])[..., 0]
            elif t == "wrench_abs":
                wrench = command[:, idx : idx + 6]
                idx += 6
                tau = tau + (
                    jnp.swapaxes(jacobian, -1, -2) @ wrench[..., None]
                )[..., 0]
        # nullspace posture control
        if (
            self.cfg.nullspace_control == "position"
            and joint_pos is not None
            and default_joint_pos is not None
        ):
            kn = self.cfg.nullspace_stiffness
            dn = 2.0 * jnp.sqrt(kn) * self.cfg.nullspace_damping_ratio
            tau_null = kn * (default_joint_pos - joint_pos) - dn * joint_vel
            jac_pinv = jnp.linalg.pinv(jacobian)
            N = (
                jnp.eye(jacobian.shape[-1])
                - jnp.swapaxes(jacobian, -1, -2) @ jnp.swapaxes(jac_pinv, -1, -2)
            )
            tau = tau + (N @ tau_null[..., None])[..., 0]
        if self.cfg.gravity_compensation and gravity is not None:
            tau = tau + gravity
        return tau
