"""Multi-frame whole-body IK (reference ``controllers/pink_ik.py`` wrapping
the external `pink` library).

The reference delegates to pink's QP solver over a pinocchio model rebuilt
from the USD. The TPU build solves the same problem — track several frame
targets with a damped least-squares step over a selected joint subset —
directly against the in-repo kinematics: errors of all frames stack into one
(6·n_tasks, n_joints) system solved per env inside jit. No URDF round-trip,
no external solver."""

from __future__ import annotations

from dataclasses import MISSING, field

import jax.numpy as jnp

from ..utils import math as math_utils
from ..utils.configclass import configclass


@configclass
class FrameTaskCfg:
    """One tracked frame (reference pink.tasks.FrameTask)."""

    frame: str = MISSING  # body name of the controlled frame
    position_cost: float = 1.0
    orientation_cost: float = 1.0
    lm_damping: float = 10.0
    gain: float = 0.1


@configclass
class PinkIKControllerCfg:
    """Reference ``PinkIKControllerCfg`` (controllers/pink_ik_cfg.py)."""

    articulation_name: str = "robot"
    base_link_name: str = "base_link"
    num_hand_joints: int = 0
    show_ik_warnings: bool = False
    variable_input_tasks: list = field(default_factory=list)  # [FrameTaskCfg]
    fixed_input_tasks: list = field(default_factory=list)


class PinkIKController:
    """Damped-least-squares tracker over stacked frame tasks.

    ``compute(targets, frame_poses, jacobians, joint_pos)``:
      targets: (E, T, 7) absolute [pos, quat wxyz] per task frame
      frame_poses: (E, T, 7) current frame poses (same frame convention)
      jacobians: (E, T, 6, n) per-frame [lin; ang] jacobians over the
        controlled joint columns
      joint_pos: (E, n) current positions of the controlled joints
    Returns (E, n) joint position targets.
    """

    def __init__(self, cfg: PinkIKControllerCfg, num_envs: int):
        self.cfg = cfg
        self.num_envs = num_envs
        self.num_tasks = len(cfg.variable_input_tasks)

    @property
    def action_dim(self) -> int:
        return 7 * self.num_tasks + self.cfg.num_hand_joints

    def compute(self, targets, frame_poses, jacobians, joint_pos):
        E, T = targets.shape[0], self.num_tasks
        errs, rows = [], []
        for t in range(T):
            task = self.cfg.variable_input_tasks[t]
            pos_err = targets[:, t, 0:3] - frame_poses[:, t, 0:3]
            ang_err = math_utils.axis_angle_from_quat(
                math_utils.quat_mul(
                    targets[:, t, 3:7],
                    math_utils.quat_inv(frame_poses[:, t, 3:7]),
                )
            )
            errs.append(task.gain * jnp.concatenate(
                [task.position_cost * pos_err, task.orientation_cost * ang_err],
                axis=-1,
            ))
            rows.append(jacobians[:, t])
        err = jnp.concatenate(errs, axis=-1)  # (E, 6T)
        J = jnp.concatenate(rows, axis=1)  # (E, 6T, n)
        lam = max(t.lm_damping for t in self.cfg.variable_input_tasks) * 1e-2
        JJt = J @ jnp.swapaxes(J, 1, 2)
        eye = jnp.eye(JJt.shape[-1])
        dq = jnp.einsum(
            "enk,ek->en",
            jnp.swapaxes(J, 1, 2) @ jnp.linalg.inv(JJt + lam * eye), err,
        )
        return joint_pos + dq
