"""LidarFly: UAV obstacle-field navigation with Bpearl lidar (fork-specific;
reference ``direct/quadcopter/lidarfly_env.py`` + ``lidarfly_cfg.py``).

Observation = [proximity scan | body state | goal geometry | last action]
with a noise-free critic copy (asymmetric actor-critic, reference
lidarfly_env.py:228-253); rewards are the fork's guidance set
(:256-291); dones use the fork's 5-tuple telemetry (:293+).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ....scene import InteractiveSceneCfg
from ....sensors import RayCasterCfg, patterns
from ....terrains import (
    HfDiscreteObstaclesTerrainCfg,
    TerrainGeneratorCfg,
    TerrainImporterCfg,
)
from ....utils import math as math_utils
from ....utils.configclass import configclass
from ..quadcopter.quadcopter_env import (
    QuadcopterEnv,
    QuadcopterEnvCfg,
    QuadcopterSceneCfg,
)

OBSTACLE_TERRAIN_CFG = TerrainGeneratorCfg(
    size=(20.0, 20.0),
    num_rows=2,
    num_cols=2,
    horizontal_scale=0.25,
    vertical_scale=0.01,
    sub_terrains={
        "obstacles": HfDiscreteObstaclesTerrainCfg(
            num_obstacles=24,
            obstacle_height_range=(3.0, 4.0),
            obstacle_width_range=(0.4, 1.2),
            obstacle_height_mode="fixed",
            platform_width=2.0,
        ),
    },
)


@configclass
class LidarFlySceneCfg(QuadcopterSceneCfg):
    terrain = TerrainImporterCfg(
        terrain_type="generator", terrain_generator=OBSTACLE_TERRAIN_CFG
    )
    lidar = RayCasterCfg(
        prim_path="robot/body",
        pattern_cfg=patterns.BpearlPatternCfg(
            horizontal_res=10.0,
            vertical_ray_angles=(89.5, 45.0, 2.3125),  # reduced Bpearl rings
        ),
        max_distance=10.0,
    )


@configclass
class LidarFlyEnvCfg(QuadcopterEnvCfg):
    """Reference lidarfly_cfg.py:59-130 (UAV_LIDAR parameters)."""

    episode_length_s: float = 20.0
    scene: LidarFlySceneCfg = LidarFlySceneCfg(num_envs=4096, env_spacing=2.5)
    lidar_range: float = 10.0
    # reward scales (reference lidarfly_cfg)
    ang_vel_reward_scale: float = -0.05
    z_reward_scale: float = 2.0
    action_diff_reward_scale: float = -0.5
    live_scale: float = 1.0
    dir_reward_scale: float = 2.0
    yaw_reward_scale: float = 1.0
    distance_reward_scale: float = 2.0
    goal_distance: float = 8.0
    crash_distance: float = 0.35
    max_speed: float = 6.0


class LidarFlyEnv(QuadcopterEnv):
    cfg: LidarFlyEnvCfg

    def __init__(self, cfg: LidarFlyEnvCfg, **kwargs):
        super().__init__(cfg, **kwargs)
        self._lidar = self.scene.sensors["lidar"]
        self.num_rays = self._lidar.num_rays
        self.cfg.observation_space = self.num_rays + 17
        self.num_observations = self.num_rays + 17

    def _scan(self, state):
        """Proximity scan in [0, 1]: 1 = touching, 0 = free
        (reference current_scan convention)."""
        lstate = state.scene.sensors["lidar"]
        dist = jnp.clip(lstate.ray_distances, 0.0, self.cfg.lidar_range)
        return (self.cfg.lidar_range - dist) / self.cfg.lidar_range

    def _goal_geometry(self, state, data):
        goal = state.user["desired_pos_w"]
        delta = goal - data.root_pos_w
        dist_xy = jnp.linalg.norm(delta[:, :2], axis=-1)
        dir_xy = delta[:, :2] / jnp.maximum(dist_xy[:, None], 1e-6)
        target_yaw = jnp.arctan2(delta[:, 1], delta[:, 0])
        roll, pitch, yaw = math_utils.euler_xyz_from_quat(data.root_quat_w)
        yaw_error = math_utils.wrap_to_pi(target_yaw - yaw)
        return delta, dist_xy, dir_xy, roll, pitch, yaw_error

    def _get_observations(self, state):
        """Reference lidarfly_env.py:228-253 (17 + n_rays dims)."""
        data = self._robot_views(state)
        scan = self._scan(state)
        delta, dist_xy, dir_xy, roll, pitch, yaw_error = self._goal_geometry(
            state, data
        )
        z_error = delta[:, 2]
        non_lidar = jnp.concatenate(
            [
                data.root_lin_vel_b / 5.0,
                data.root_ang_vel_b,
                z_error[:, None] / 2.0,
                (roll / jnp.pi)[:, None],
                (pitch / jnp.pi)[:, None],
                (yaw_error / jnp.pi)[:, None],
                dir_xy,
                dist_xy[:, None] / 10.0,
                state.actions,
            ],
            axis=-1,
        )
        obs = jnp.clip(jnp.concatenate([scan, non_lidar], axis=-1), -5.0, 5.0)
        return {"policy": obs, "critic": obs}

    def _get_rewards(self, state):
        """Reference lidarfly_env.py:256-291."""
        data = self._robot_views(state)
        cfg = self.cfg
        delta, dist_xy, dir_xy, roll, pitch, yaw_error = self._goal_geometry(
            state, data
        )
        ang_vel = jnp.sum(jnp.square(data.root_ang_vel_b), axis=1)
        action_diff = jnp.sum(
            jnp.square(state.actions - state.prev_actions), axis=1
        )
        goal = state.user["desired_pos_w"]
        vel_dir = (goal - data.root_pos_w)
        vel_dir = vel_dir / jnp.maximum(
            jnp.linalg.norm(vel_dir, axis=-1, keepdims=True), 1e-6
        )
        reward_dir = jnp.clip(
            jnp.sum(data.root_lin_vel_w * vel_dir, axis=-1), None, 3.0
        )
        reward_z = jnp.exp(-5.0 * jnp.abs(data.root_pos_w[:, 2] - goal[:, 2]))
        reward_yaw = jnp.exp(-2.0 * jnp.abs(yaw_error))
        dist = jnp.linalg.norm(goal - data.root_pos_w, axis=1)
        reward_distance = jnp.exp(-2.0 * dist)
        return (
            ang_vel * cfg.ang_vel_reward_scale
            + reward_z * cfg.z_reward_scale
            + action_diff * cfg.action_diff_reward_scale
            + cfg.live_scale
            + reward_dir * cfg.dir_reward_scale
            + reward_yaw * cfg.yaw_reward_scale
            + reward_distance * cfg.distance_reward_scale
        ) * self.step_dt

    def _get_dones(self, state):
        """Fork 5-tuple (reference lidarfly_env.py:293+)."""
        data = self._robot_views(state)
        goal = state.user["desired_pos_w"]
        time_out = state.episode_length >= self.max_episode_length - 1
        height_died = jnp.abs(data.root_pos_w[:, 2] - goal[:, 2]) > 0.5
        scan = self._scan(state)
        lidar_died = jnp.any(
            scan > (self.cfg.lidar_range - self.cfg.crash_distance)
            / self.cfg.lidar_range,
            axis=1,
        )
        vel_died = jnp.linalg.norm(data.root_lin_vel_w, axis=1) > self.cfg.max_speed
        died = jnp.zeros_like(height_died)
        return died, height_died, lidar_died, vel_died, time_out

    def _reset_idx(self, state, mask):
        state = super()._reset_idx(state, mask)
        # override the hover goal: forward-flight goal at fixed height
        key, k1 = jax.random.split(state.key)
        E = self.num_envs
        theta = jax.random.uniform(k1, (E,), minval=-jnp.pi, maxval=jnp.pi)
        goal = jnp.stack(
            [
                self.cfg.goal_distance * jnp.cos(theta),
                self.cfg.goal_distance * jnp.sin(theta),
                jnp.ones(E),
            ],
            axis=-1,
        )
        user = dict(state.user)
        user["desired_pos_w"] = jnp.where(
            mask[:, None], goal, user["desired_pos_w"]
        )
        return state._replace(user=user, key=key)
