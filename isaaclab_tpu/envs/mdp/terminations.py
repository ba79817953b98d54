"""Termination terms (reference ``envs/mdp/terminations.py:30-158``)."""

from __future__ import annotations

import jax.numpy as jnp

from ...managers import SceneEntityCfg
from ...utils import math as math_utils

_DEFAULT = SceneEntityCfg("robot")


def _sel(x, ids):
    if isinstance(ids, slice):
        return x[:, ids]
    return x[:, jnp.asarray(ids)]


def time_out(env):
    """Episode length exceeded (truncation; reference terminations.py:30)."""
    return env.episode_length_buf >= env.max_episode_length


def command_resample(env, command_name: str, num_resamples: int = 1):
    """Episode ends after N command resamples (reference terminations.py)."""
    # approximated via time_out against resampling period x N
    term = env.command_manager.get_term(command_name)
    period = term.cfg.resampling_time_range[1] * num_resamples
    return env.episode_length_buf * env.step_dt >= period


def bad_orientation(env, limit_angle: float, asset_cfg: SceneEntityCfg = _DEFAULT):
    g = env.scene[asset_cfg.name].data.projected_gravity_b
    return jnp.arccos(jnp.clip(-g[:, 2], -1.0, 1.0)) > limit_angle


def root_height_below_minimum(env, minimum_height: float,
                              asset_cfg: SceneEntityCfg = _DEFAULT):
    return env.scene[asset_cfg.name].data.root_pos_w[:, 2] < minimum_height


def joint_pos_out_of_limit(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    data = env.scene[asset_cfg.name].data
    lim = data.joint_pos_limits
    out = (data.joint_pos < lim[..., 0]) | (data.joint_pos > lim[..., 1])
    return jnp.any(_sel(out, asset_cfg.joint_ids), axis=1)


def joint_pos_out_of_manual_limit(env, bounds: tuple,
                                  asset_cfg: SceneEntityCfg = _DEFAULT):
    pos = _sel(env.scene[asset_cfg.name].data.joint_pos, asset_cfg.joint_ids)
    return jnp.any((pos < bounds[0]) | (pos > bounds[1]), axis=1)


def joint_vel_out_of_limit(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    data = env.scene[asset_cfg.name].data
    out = jnp.abs(data.joint_vel) > data.joint_vel_limits
    return jnp.any(_sel(out, asset_cfg.joint_ids), axis=1)


def joint_vel_out_of_manual_limit(env, max_velocity: float,
                                  asset_cfg: SceneEntityCfg = _DEFAULT):
    vel = _sel(env.scene[asset_cfg.name].data.joint_vel, asset_cfg.joint_ids)
    return jnp.any(jnp.abs(vel) > max_velocity, axis=1)


def joint_effort_out_of_limit(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    data = env.scene[asset_cfg.name].data
    return jnp.any(
        jnp.abs(_sel(data.applied_torque, asset_cfg.joint_ids))
        >= _sel(
            jnp.broadcast_to(
                jnp.asarray(
                    env.scene[asset_cfg.name].world_model.dof_effort_limit[
                        env.scene[asset_cfg.name].slice.dof_start :
                        env.scene[asset_cfg.name].slice.dof_start
                        + env.scene[asset_cfg.name].slice.dof_count
                    ]
                ),
                data.applied_torque.shape,
            ),
            asset_cfg.joint_ids,
        ),
        axis=1,
    )


def illegal_contact(env, threshold: float, sensor_cfg: SceneEntityCfg):
    """Contact force on forbidden bodies exceeds threshold
    (reference terminations.py:illegal_contact)."""
    sensor = env.scene[sensor_cfg.name]
    forces = sensor.data.net_forces_w
    ids = sensor_cfg.body_ids
    f = forces[:, ids] if isinstance(ids, slice) else forces[:, jnp.asarray(ids)]
    return jnp.any(jnp.linalg.norm(f, axis=-1) > threshold, axis=1)
