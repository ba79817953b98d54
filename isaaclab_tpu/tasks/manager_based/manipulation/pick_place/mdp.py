"""Pick-place MDP terms (reference
``manager_based/manipulation/pick_place/mdp/``)."""

from __future__ import annotations

import jax.numpy as jnp

from isaaclab_tpu.envs.mdp import *  # noqa: F401,F403
from isaaclab_tpu.managers import SceneEntityCfg

_ROBOT = SceneEntityCfg("robot")
_OBJECT = SceneEntityCfg("object")


def _eef_pos(env, side: str):
    robot = env.scene["robot"]
    idx = robot.body_names.index(f"{side}_hand_roll_link")
    return robot.data.body_pos_w[:, idx] - env.scene.env_origins


def _eef_quat(env, side: str):
    robot = env.scene["robot"]
    idx = robot.body_names.index(f"{side}_hand_roll_link")
    return robot.data.body_quat_w[:, idx]


def object_obs(env):
    """object pos/quat + eef-to-object offsets (reference observations.py:15)."""
    obj = env.scene["object"].data
    pos = obj.root_pos_w - env.scene.env_origins
    return jnp.concatenate(
        [
            pos,
            obj.root_quat_w,
            pos - _eef_pos(env, "left"),
            pos - _eef_pos(env, "right"),
        ],
        axis=1,
    )


def get_left_eef_pos(env):
    return _eef_pos(env, "left")


def get_left_eef_quat(env):
    return _eef_quat(env, "left")


def get_right_eef_pos(env):
    return _eef_pos(env, "right")


def get_right_eef_quat(env):
    return _eef_quat(env, "right")


def get_hand_state(env, robot_cfg: SceneEntityCfg = _ROBOT):
    """All finger joint positions (reference observations.py:get_hand_state)."""
    robot = env.scene[robot_cfg.name]
    ids, _ = robot.find_joints(["L_.*", "R_.*"], preserve_order=True)
    return robot.data.joint_pos[:, jnp.asarray(ids)]


def get_head_state(env, robot_cfg: SceneEntityCfg = _ROBOT):
    robot = env.scene[robot_cfg.name]
    ids, _ = robot.find_joints(["head_.*"], preserve_order=True)
    return robot.data.joint_pos[:, jnp.asarray(ids)]


def get_all_robot_link_state(env, robot_cfg: SceneEntityCfg = _ROBOT):
    """Flattened world positions of every robot link (reference
    observations.py:get_all_robot_link_state)."""
    robot = env.scene[robot_cfg.name]
    pos = robot.data.body_pos_w - env.scene.env_origins[:, None, :]
    return pos.reshape(pos.shape[0], -1)


def task_done(
    env,
    object_cfg: SceneEntityCfg = _OBJECT,
    right_wrist_max_x: float = 0.26,
    min_x: float = 0.30,
    max_x: float = 0.95,
    min_y: float = 0.25,
    max_y: float = 0.66,
    min_height: float = 1.13,
    min_vel: float = 0.20,
):
    """Object placed in the target zone, settled, right arm retracted
    (reference terminations.py:task_done)."""
    obj = env.scene[object_cfg.name].data
    pos = obj.root_pos_w - env.scene.env_origins
    vel = jnp.abs(obj.root_lin_vel_w)
    wrist_x = _eef_pos(env, "right")[:, 0]
    done = (pos[:, 0] > min_x) & (pos[:, 0] < max_x)
    done &= (pos[:, 1] > min_y) & (pos[:, 1] < max_y)
    done &= pos[:, 2] < min_height
    done &= wrist_x < right_wrist_max_x
    done &= jnp.all(vel < min_vel, axis=-1)
    return done
