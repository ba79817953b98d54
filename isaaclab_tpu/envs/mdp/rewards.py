"""Reward terms (reference ``envs/mdp/rewards.py:31-309`` + locomotion
``velocity/mdp/rewards.py``). Same names and formulas; pure over the context.
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


# -- general --


def is_alive(env):
    """1 while not terminated (reference rewards.py:31). Approximated by 1
    minus nothing: termination-aware shaping uses is_terminated instead."""
    return jnp.ones(env.num_envs)


def is_terminated(env):
    """Penalty on the steps where a non-timeout reset fires: recomputed from
    the termination manager inside the same trace (cheap, fused)."""
    terminated, _, _ = env._env.termination_manager.compute(env)
    return terminated.astype(jnp.float32)


# -- base tracking / stability --


def lin_vel_z_l2(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return jnp.square(env.scene[asset_cfg.name].data.root_lin_vel_b[:, 2])


def ang_vel_xy_l2(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return jnp.sum(
        jnp.square(env.scene[asset_cfg.name].data.root_ang_vel_b[:, :2]), axis=1
    )


def flat_orientation_l2(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return jnp.sum(
        jnp.square(env.scene[asset_cfg.name].data.projected_gravity_b[:, :2]), axis=1
    )


def base_height_l2(env, target_height: float, asset_cfg: SceneEntityCfg = _DEFAULT,
                   sensor_cfg: SceneEntityCfg = None):
    data = env.scene[asset_cfg.name].data
    if sensor_cfg is not None:
        hits = env.scene[sensor_cfg.name].data.ray_hits_w[..., 2]
        ground = jnp.mean(hits, axis=1)
        height = data.root_pos_w[:, 2] - ground
    else:
        height = data.root_pos_w[:, 2]
    return jnp.square(height - target_height)


def body_lin_acc_l2(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    data = env.scene[asset_cfg.name].data
    acc = data.joint_acc
    return jnp.sum(jnp.square(acc), axis=1)


# -- joint penalties --


def joint_torques_l2(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return jnp.sum(
        jnp.square(_sel(env.scene[asset_cfg.name].data.applied_torque, asset_cfg.joint_ids)),
        axis=1,
    )


def joint_vel_l1(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return jnp.sum(
        jnp.abs(_sel(env.scene[asset_cfg.name].data.joint_vel, asset_cfg.joint_ids)), axis=1
    )


def joint_vel_l2(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return jnp.sum(
        jnp.square(_sel(env.scene[asset_cfg.name].data.joint_vel, asset_cfg.joint_ids)),
        axis=1,
    )


def joint_acc_l2(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    return jnp.sum(
        jnp.square(_sel(env.scene[asset_cfg.name].data.joint_acc, asset_cfg.joint_ids)),
        axis=1,
    )


def joint_deviation_l1(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    data = env.scene[asset_cfg.name].data
    dev = _sel(data.joint_pos - data.default_joint_pos, asset_cfg.joint_ids)
    return jnp.sum(jnp.abs(dev), axis=1)


def joint_pos_target_l2(env, target: float, asset_cfg: SceneEntityCfg = _DEFAULT):
    """L2 distance of joint positions from a target (reference rewards.py)."""
    pos = _sel(env.scene[asset_cfg.name].data.joint_pos, asset_cfg.joint_ids)
    return jnp.sum(jnp.square(pos - target), axis=1)


def joint_pos_limits(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    data = env.scene[asset_cfg.name].data
    lim = data.soft_joint_pos_limits
    under = -jnp.minimum(data.joint_pos - lim[..., 0], 0.0)
    over = jnp.maximum(data.joint_pos - lim[..., 1], 0.0)
    return jnp.sum(_sel(under + over, asset_cfg.joint_ids), axis=1)


def joint_vel_limits(env, soft_ratio: float, asset_cfg: SceneEntityCfg = _DEFAULT):
    data = env.scene[asset_cfg.name].data
    over = jnp.abs(data.joint_vel) - data.joint_vel_limits * soft_ratio
    return jnp.sum(jnp.clip(_sel(over, asset_cfg.joint_ids), 0.0, 1.0), axis=1)


def applied_torque_limits(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    data = env.scene[asset_cfg.name].data
    return jnp.sum(
        jnp.abs(_sel(data.applied_torque - data.computed_torque, asset_cfg.joint_ids)),
        axis=1,
    )


# -- action penalties --


def action_rate_l2(env):
    am = env.action_manager
    return jnp.sum(jnp.square(am.action - am.prev_action), axis=1)


def action_l2(env):
    return jnp.sum(jnp.square(env.action_manager.action), axis=1)


# -- contacts --


def undesired_contacts(env, threshold: float, sensor_cfg: SceneEntityCfg):
    sensor = env.scene[sensor_cfg.name]
    forces = sensor.data.net_forces_w  # (E, B, 3)
    f = jnp.linalg.norm(_sel_body(forces, sensor_cfg.body_ids), axis=-1)
    return jnp.sum((f > threshold).astype(jnp.float32), axis=1)


def contact_forces(env, threshold: float, sensor_cfg: SceneEntityCfg):
    sensor = env.scene[sensor_cfg.name]
    forces = sensor.data.net_forces_w
    f = jnp.linalg.norm(_sel_body(forces, sensor_cfg.body_ids), axis=-1)
    return jnp.sum(jnp.clip(f - threshold, 0.0, None), axis=1)


def _sel_body(x, ids):
    if isinstance(ids, slice):
        return x[:, ids]
    return x[:, jnp.asarray(ids)]


# -- velocity-command tracking (reference velocity/mdp/rewards.py) --


def track_lin_vel_xy_exp(env, std: float, command_name: str = "base_velocity",
                         asset_cfg: SceneEntityCfg = _DEFAULT):
    data = env.scene[asset_cfg.name].data
    cmd = env.command_manager.get_command(command_name)
    err = jnp.sum(jnp.square(cmd[:, :2] - data.root_lin_vel_b[:, :2]), axis=1)
    return jnp.exp(-err / std**2)


def track_ang_vel_z_exp(env, std: float, command_name: str = "base_velocity",
                        asset_cfg: SceneEntityCfg = _DEFAULT):
    data = env.scene[asset_cfg.name].data
    cmd = env.command_manager.get_command(command_name)
    err = jnp.square(cmd[:, 2] - data.root_ang_vel_b[:, 2])
    return jnp.exp(-err / std**2)


def feet_air_time(env, command_name: str, threshold: float,
                  sensor_cfg: SceneEntityCfg):
    """Reward long swing phases (reference velocity/mdp/rewards.py
    feet_air_time): sum of (last_air_time - threshold) at touchdown, gated on
    nonzero command."""
    sensor = env.scene[sensor_cfg.name]
    state = sensor._state
    first_contact = sensor.compute_first_contact(state, env.step_dt)
    last_air = _sel_body(state.last_air_time, sensor_cfg.body_ids)
    first = _sel_body(first_contact, sensor_cfg.body_ids)
    reward = jnp.sum((last_air - threshold) * first.astype(jnp.float32), axis=1)
    cmd = env.command_manager.get_command(command_name)
    return reward * (jnp.linalg.norm(cmd[:, :2], axis=1) > 0.1)


def feet_slide(env, sensor_cfg: SceneEntityCfg, asset_cfg: SceneEntityCfg = _DEFAULT):
    """Penalize foot sliding while in contact."""
    sensor = env.scene[sensor_cfg.name]
    contacts = (
        jnp.linalg.norm(
            _sel_body(sensor.data.net_forces_w, sensor_cfg.body_ids), axis=-1
        )
        > 1.0
    )
    data = env.scene[asset_cfg.name].data
    vel = _sel_body(data.body_lin_vel_w, asset_cfg.body_ids)
    return jnp.sum(
        jnp.linalg.norm(vel[..., :2], axis=-1) * contacts.astype(jnp.float32), axis=1
    )


# -- classic-locomotion rewards (reference classic/humanoid/mdp/rewards.py) --


def progress_reward(env, target_pos: tuple, asset_cfg: SceneEntityCfg = _DEFAULT):
    """Velocity toward a (distant) world target — potential-based progress."""
    data = env.scene[asset_cfg.name].data
    to_target = jnp.asarray(target_pos)[None, :2] - data.root_pos_w[:, :2]
    dir_xy = to_target / jnp.maximum(
        jnp.linalg.norm(to_target, axis=-1, keepdims=True), 1e-9
    )
    return jnp.sum(data.root_lin_vel_w[:, :2] * dir_xy, axis=-1)


def upright_posture_bonus(env, threshold: float, asset_cfg: SceneEntityCfg = _DEFAULT):
    """1 when the up-projection exceeds the threshold."""
    g = env.scene[asset_cfg.name].data.projected_gravity_b
    return (-g[:, 2] > threshold).astype(jnp.float32)


def move_to_target_bonus(env, threshold: float, target_pos: tuple,
                         asset_cfg: SceneEntityCfg = _DEFAULT):
    """1 when heading-projection toward target exceeds the threshold."""
    data = env.scene[asset_cfg.name].data
    to_target = jnp.asarray(target_pos)[None, :2] - data.root_pos_w[:, :2]
    to_target = to_target / jnp.maximum(
        jnp.linalg.norm(to_target, axis=-1, keepdims=True), 1e-9
    )
    fwd = math_utils.quat_apply(data.root_quat_w, jnp.array([1.0, 0.0, 0.0]))
    proj = jnp.sum(fwd[:, :2] * to_target, axis=-1)
    return jnp.where(proj > threshold, 1.0, proj / threshold)


def power_consumption(env, gear_ratio: dict, asset_cfg: SceneEntityCfg = _DEFAULT):
    """|tau . qd| with per-joint gear scaling (reference humanoid mdp)."""
    from ...utils import string as string_utils

    data = env.scene[asset_cfg.name].data
    entity = env.scene[asset_cfg.name]
    gears = jnp.ones(entity.num_joints)
    idx, _, vals = string_utils.resolve_matching_names_values(
        gear_ratio, entity.joint_names
    )
    gears = gears.at[jnp.asarray(idx)].set(jnp.asarray(vals))
    return jnp.sum(jnp.abs(env.action_manager.action * data.joint_vel * gears), axis=-1)


def joint_pos_limits_penalty_ratio(env, threshold: float, gear_ratio: dict,
                                   asset_cfg: SceneEntityCfg = _DEFAULT):
    """Penalty as joints approach their limits (reference humanoid mdp)."""
    from ...utils import string as string_utils

    data = env.scene[asset_cfg.name].data
    entity = env.scene[asset_cfg.name]
    lim = data.soft_joint_pos_limits
    ratio = jnp.abs(
        math_utils.scale_transform(data.joint_pos, lim[..., 0], lim[..., 1])
    )
    gears = jnp.ones(entity.num_joints)
    idx, _, vals = string_utils.resolve_matching_names_values(
        gear_ratio, entity.joint_names
    )
    gears = gears.at[jnp.asarray(idx)].set(jnp.asarray(vals))
    out_of = (ratio > threshold).astype(jnp.float32)
    return jnp.sum(out_of * (ratio - threshold) * gears, axis=-1)


# -- manipulation: end-effector pose tracking (reference
#    manipulation/reach/mdp/rewards.py) --


def position_command_error(env, command_name: str, asset_cfg: SceneEntityCfg):
    """L2 distance between a commanded base-frame position and a body's
    current position (reference reach mdp)."""
    entity = env.scene[asset_cfg.name]
    data = entity.data
    cmd = env.command_manager.get_command(command_name)
    # command pose is in the robot base frame -> world
    des_pos_w, _ = math_utils.combine_frame_transforms(
        data.root_pos_w, data.root_quat_w, cmd[:, :3]
    )
    body_pos = data.body_pos_w[:, jnp.asarray(asset_cfg.body_ids)][:, 0]
    return jnp.linalg.norm(des_pos_w - body_pos, axis=-1)


def position_command_error_tanh(env, std: float, command_name: str,
                                asset_cfg: SceneEntityCfg):
    err = position_command_error(env, command_name, asset_cfg)
    return 1.0 - jnp.tanh(err / std)


def orientation_command_error(env, command_name: str, asset_cfg: SceneEntityCfg):
    """Rotation-angle error between commanded and current body orientation."""
    entity = env.scene[asset_cfg.name]
    data = entity.data
    cmd = env.command_manager.get_command(command_name)
    _, des_quat_w = math_utils.combine_frame_transforms(
        data.root_pos_w, data.root_quat_w, cmd[:, :3], cmd[:, 3:7]
    )
    body_quat = data.body_quat_w[:, jnp.asarray(asset_cfg.body_ids)][:, 0]
    return math_utils.quat_error_magnitude(des_quat_w, body_quat)


# -- manipulation: object lift (reference manipulation/lift/mdp/rewards.py) --


def object_ee_distance(env, std: float, object_cfg: SceneEntityCfg,
                       ee_cfg: SceneEntityCfg):
    """tanh-shaped reach reward: end-effector body to object distance."""
    obj = env.scene[object_cfg.name].data
    robot = env.scene[ee_cfg.name].data
    ee_pos = robot.body_pos_w[:, jnp.asarray(ee_cfg.body_ids)][:, 0]
    dist = jnp.linalg.norm(obj.root_pos_w - ee_pos, axis=-1)
    return 1.0 - jnp.tanh(dist / std)


def object_is_lifted(env, minimal_height: float, object_cfg: SceneEntityCfg):
    """1 when the object is above the minimal height."""
    obj = env.scene[object_cfg.name].data
    return (obj.root_pos_w[:, 2] > minimal_height).astype(jnp.float32)


def object_goal_distance(env, std: float, minimal_height: float,
                         command_name: str, object_cfg: SceneEntityCfg,
                         robot_cfg: SceneEntityCfg = _DEFAULT):
    """tanh goal-tracking reward, gated on the object being lifted
    (reference lift mdp object_goal_distance)."""
    obj = env.scene[object_cfg.name].data
    robot = env.scene[robot_cfg.name].data
    cmd = env.command_manager.get_command(command_name)
    des_pos_w, _ = math_utils.combine_frame_transforms(
        robot.root_pos_w, robot.root_quat_w, cmd[:, :3]
    )
    dist = jnp.linalg.norm(des_pos_w - obj.root_pos_w, axis=-1)
    lifted = obj.root_pos_w[:, 2] > minimal_height
    return lifted.astype(jnp.float32) * (1.0 - jnp.tanh(dist / std))


# -- navigation (reference manager_based/navigation/mdp) --


def position_command_error_tanh_2d(env, std: float, command_name: str,
                                   asset_cfg: SceneEntityCfg = _DEFAULT):
    """tanh-shaped distance to a pose-2d command (reference
    navigation/mdp/rewards.py:position_command_error_tanh). The command is
    already base-frame (pos_b x, y, z, heading_b) so the distance is just
    its norm."""
    cmd = env.command_manager.get_command(command_name)
    err = jnp.linalg.norm(cmd[:, :3], axis=-1)
    return 1.0 - jnp.tanh(err / std)


def heading_command_error_abs(env, command_name: str,
                              asset_cfg: SceneEntityCfg = _DEFAULT):
    """|base-frame heading error| of a pose-2d command (reference
    navigation/mdp/rewards.py:heading_command_error_abs)."""
    cmd = env.command_manager.get_command(command_name)
    return jnp.abs(cmd[:, 3])
