"""Observation terms (reference ``envs/mdp/observations.py:33-529``).

Same names/semantics as the reference library; all pure functions of the env
context. ``asset_cfg.joint_ids`` are static index arrays resolved at build.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...managers import SceneEntityCfg
from ...utils import math as math_utils

_DEFAULT = SceneEntityCfg("robot")


def _sel(x, ids):
    if isinstance(ids, slice):
        return x[:, ids]
    return x[:, jnp.asarray(ids)]


# -- root state --


def base_pos_z(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return env.scene[asset_cfg.name].data.root_pos_w[:, 2:3]


def base_lin_vel(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return env.scene[asset_cfg.name].data.root_lin_vel_b


def base_ang_vel(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return env.scene[asset_cfg.name].data.root_ang_vel_b


def projected_gravity(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return env.scene[asset_cfg.name].data.projected_gravity_b


def root_pos_w(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return env.scene[asset_cfg.name].data.root_pos_w


def root_quat_w(env, make_quat_unique: bool = False, asset_cfg: SceneEntityCfg = _DEFAULT):
    quat = env.scene[asset_cfg.name].data.root_quat_w
    return math_utils.quat_unique(quat) if make_quat_unique else quat


def root_lin_vel_w(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return env.scene[asset_cfg.name].data.root_lin_vel_w


def root_ang_vel_w(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return env.scene[asset_cfg.name].data.root_ang_vel_w


# -- joint state --


def joint_pos(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return _sel(env.scene[asset_cfg.name].data.joint_pos, asset_cfg.joint_ids)


def joint_pos_rel(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    data = env.scene[asset_cfg.name].data
    return _sel(data.joint_pos - data.default_joint_pos, asset_cfg.joint_ids)


def joint_pos_limit_normalized(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    data = env.scene[asset_cfg.name].data
    lim = data.soft_joint_pos_limits
    scaled = math_utils.scale_transform(data.joint_pos, lim[..., 0], lim[..., 1])
    return _sel(scaled, asset_cfg.joint_ids)


def joint_vel(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return _sel(env.scene[asset_cfg.name].data.joint_vel, asset_cfg.joint_ids)


def joint_vel_rel(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    data = env.scene[asset_cfg.name].data
    return _sel(data.joint_vel - data.default_joint_vel, asset_cfg.joint_ids)


def joint_effort(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return _sel(env.scene[asset_cfg.name].data.applied_torque, asset_cfg.joint_ids)


# -- sensors --


def height_scan(env, sensor_cfg: SceneEntityCfg, offset: float = 0.5):
    """Height-scanner reading: sensor z minus ray hit z minus offset
    (reference observations.py:165)."""
    sensor = env.scene[sensor_cfg.name]
    data = sensor.data
    return data.pos_w[:, 2:3] - data.ray_hits_w[..., 2] - offset


def body_incoming_wrench(env, asset_cfg: SceneEntityCfg):
    """External wrenches on selected bodies (reference observations.py)."""
    est_fext = env.state.scene.phys.f_ext_w
    entity = env.scene[asset_cfg.name]
    ids = jnp.asarray(asset_cfg.body_ids) + entity.slice.body_start
    return est_fext[:, ids].reshape(est_fext.shape[0], -1)


def imu_orientation(env, asset_cfg: SceneEntityCfg):
    return env.scene[asset_cfg.name].data.quat_w


def imu_ang_vel(env, asset_cfg: SceneEntityCfg):
    return env.scene[asset_cfg.name].data.ang_vel_b


def imu_lin_acc(env, asset_cfg: SceneEntityCfg):
    return env.scene[asset_cfg.name].data.lin_acc_b


def lidar_obs(env, sensor_cfg: SceneEntityCfg, max_distance: float = 10.0):
    """Normalized lidar ranges (fork's UAV tasks consume Bpearl ranges)."""
    data = env.scene[sensor_cfg.name].data
    dist = jnp.linalg.norm(data.ray_hits_w - data.pos_w[:, None, :], axis=-1)
    return jnp.clip(dist, 0.0, max_distance) / max_distance


# -- actions & commands --


def last_action(env, action_name: str = None):
    return env.action_manager.action


def generated_commands(env, command_name: str):
    return env.command_manager.get_command(command_name)


def velocity_commands(env, command_name: str = "base_velocity"):
    return env.command_manager.get_command(command_name)


# -- classic-locomotion observations (reference classic/humanoid/mdp/observations.py) --


def base_yaw_roll(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    """(yaw, roll) of the base (reference humanoid mdp)."""
    quat = env.scene[asset_cfg.name].data.root_quat_w
    roll, _, yaw = math_utils.euler_xyz_from_quat(quat)
    return jnp.stack([yaw, roll], axis=-1)


def base_up_proj(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    """Projection of the base up-vector on world z."""
    g = env.scene[asset_cfg.name].data.projected_gravity_b
    return -g[:, 2:3]


def base_heading_proj(env, target_pos: tuple, asset_cfg: SceneEntityCfg = _DEFAULT):
    """Alignment of base forward axis with the to-target direction."""
    data = env.scene[asset_cfg.name].data
    to_target = jnp.asarray(target_pos)[None, :2] - data.root_pos_w[:, :2]
    to_target = to_target / jnp.maximum(
        jnp.linalg.norm(to_target, axis=-1, keepdims=True), 1e-9
    )
    fwd = math_utils.quat_apply(data.root_quat_w, jnp.array([1.0, 0.0, 0.0]))
    return jnp.sum(fwd[:, :2] * to_target, axis=-1, keepdims=True)


def base_angle_to_target(env, target_pos: tuple, asset_cfg: SceneEntityCfg = _DEFAULT):
    """Yaw error toward a world target."""
    data = env.scene[asset_cfg.name].data
    to_target = jnp.asarray(target_pos)[None, :2] - data.root_pos_w[:, :2]
    target_yaw = jnp.arctan2(to_target[:, 1], to_target[:, 0])
    _, _, yaw = math_utils.euler_xyz_from_quat(data.root_quat_w)
    return math_utils.wrap_to_pi(target_yaw - yaw)[:, None]


def object_position_in_robot_root_frame(
    env,
    robot_cfg: SceneEntityCfg = _DEFAULT,
    object_cfg: SceneEntityCfg = SceneEntityCfg("object"),
):
    """Object position in the robot base frame (reference lift mdp)."""
    robot = env.scene[robot_cfg.name].data
    obj = env.scene[object_cfg.name].data
    pos_b, _ = math_utils.subtract_frame_transforms(
        robot.root_pos_w, robot.root_quat_w, obj.root_pos_w
    )
    return pos_b
