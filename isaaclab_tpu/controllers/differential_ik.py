"""Differential inverse kinematics (reference
``controllers/differential_ik.py:17``): pinv / SVD / transpose / damped-least-
squares Jacobian IK. Jacobians come from the in-repo dynamics engine
(SURVEY.md §2.15 TPU note). Pure batched jnp.
"""

from __future__ import annotations

from dataclasses import MISSING

import jax.numpy as jnp

from ..utils import math as math_utils
from ..utils.configclass import configclass


@configclass
class DifferentialIKControllerCfg:
    """Reference ``DifferentialIKControllerCfg``."""

    command_type: str = "pose"  # "position" | "pose"
    use_relative_mode: bool = False
    ik_method: str = "dls"  # "pinv" | "svd" | "trans" | "dls"
    ik_params: dict = None

    def __post_init__(self):
        defaults = {
            "pinv": {"k_val": 1.0},
            "svd": {"k_val": 1.0, "min_singular_value": 1e-5},
            "trans": {"k_val": 1.0},
            "dls": {"lambda_val": 0.01},
        }[self.ik_method]
        self.ik_params = {**defaults, **(self.ik_params or {})}


class DifferentialIKController:
    """Functional: ``set_command`` stores desired pose; ``compute`` maps
    (ee pose, jacobian, joint pos) -> joint position targets."""

    def __init__(self, cfg: DifferentialIKControllerCfg, num_envs: int):
        self.cfg = cfg
        self.num_envs = num_envs

    @property
    def action_dim(self) -> int:
        if self.cfg.command_type == "position":
            return 3
        return 7 if not self.cfg.use_relative_mode else 6

    def init_command(self):
        cmd = jnp.zeros((self.num_envs, self.action_dim))
        if self.cfg.command_type == "pose" and not self.cfg.use_relative_mode:
            cmd = cmd.at[:, 3].set(1.0)
        return cmd

    def desired_pose(self, command, ee_pos, ee_quat):
        """Resolve the stored command to an absolute desired pose."""
        if self.cfg.command_type == "position":
            return command[:, 0:3], ee_quat
        if self.cfg.use_relative_mode:
            return math_utils.apply_delta_pose(ee_pos, ee_quat, command)
        return command[:, 0:3], command[:, 3:7]

    def compute(self, command, ee_pos, ee_quat, jacobian, joint_pos):
        """Joint position targets (reference differential_ik.py compute)."""
        des_pos, des_quat = self.desired_pose(command, ee_pos, ee_quat)
        pos_err, rot_err = math_utils.compute_pose_error(
            ee_pos, ee_quat, des_pos, des_quat, rot_error_type="axis_angle"
        )
        if self.cfg.command_type == "position":
            err = pos_err
            jac = jacobian[:, 0:3]
        else:
            err = jnp.concatenate([pos_err, rot_err], axis=-1)
            jac = jacobian
        dq = self._solve(jac, err)
        return joint_pos + dq

    def _solve(self, jac, err):
        """delta-q from jacobian + 6d error (reference _compute_delta_joint_pos)."""
        p = self.cfg.ik_params
        method = self.cfg.ik_method
        errv = err[..., None]
        if method == "pinv":
            inv = jnp.linalg.pinv(jac)
            return (p["k_val"] * inv @ errv)[..., 0]
        if method == "svd":
            U, S, Vh = jnp.linalg.svd(jac, full_matrices=False)
            S_inv = jnp.where(S > p["min_singular_value"], 1.0 / S, 0.0)
            inv = jnp.swapaxes(Vh, -1, -2) @ (
                S_inv[..., None] * jnp.swapaxes(U, -1, -2)
            )
            return (p["k_val"] * inv @ errv)[..., 0]
        if method == "trans":
            return (p["k_val"] * jnp.swapaxes(jac, -1, -2) @ errv)[..., 0]
        if method == "dls":
            lam2 = p["lambda_val"] ** 2
            JJt = jac @ jnp.swapaxes(jac, -1, -2)
            reg = JJt + lam2 * jnp.eye(jac.shape[-2])
            return (
                jnp.swapaxes(jac, -1, -2) @ jnp.linalg.solve(reg, errv)
            )[..., 0]
        raise ValueError(method)
