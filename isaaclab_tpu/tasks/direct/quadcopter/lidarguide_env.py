"""LidarGuide / GuideCa: UAV lidar navigation with obs-history frames
(fork-specific; reference ``direct/quadcopter/lidarguide_env.py`` +
``guideca_env.py``).

LidarGuide stacks 3 frames of the 17-d non-lidar observation behind the
current proximity scan (reference lidarguide_env.py:257-330 obs_queue);
GuideCa additionally keeps a 5-frame lidar history and a 6-d guidance-state
group, partitioned exactly as the fork's cascade network expects:
``[lidar(72*5) | state1(6*3) | state2(17*3)]`` (reference agents
rsl_rl_ppo_cfg.py QuadcopterPPOCascadeRunnerCfg dims).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ....sensors import RayCasterCfg, patterns
from ....utils import math as math_utils
from ....utils.configclass import configclass
from .lidarfly_env import LidarFlyEnv, LidarFlyEnvCfg, LidarFlySceneCfg


@configclass
class LidarGuideEnvCfg(LidarFlyEnvCfg):
    """Reference lidarguide_cfg.py: 3-frame non-lidar history."""

    obs_history: int = 3


class LidarGuideEnv(LidarFlyEnv):
    cfg: LidarGuideEnvCfg

    def __init__(self, cfg, **kwargs):
        super().__init__(cfg, **kwargs)
        self._non_lidar_dim = 17
        self.cfg.observation_space = (
            self.num_rays + cfg.obs_history * self._non_lidar_dim
        )
        self.num_observations = self.cfg.observation_space

    def _init_user_state(self):
        user = super()._init_user_state()
        user["obs_queue"] = jnp.zeros(
            (self.num_envs, self.cfg.obs_history, self._non_lidar_dim)
        )
        return user

    def _non_lidar_obs(self, state):
        data = self._robot_views(state)
        delta, dist_xy, dir_xy, roll, pitch, yaw_error = self._goal_geometry(
            state, data
        )
        g = data.projected_gravity_b
        g = g / jnp.maximum(jnp.linalg.norm(g, axis=1, keepdims=True), 1e-9)
        goal_dir = delta / jnp.maximum(
            jnp.linalg.norm(delta, axis=-1, keepdims=True), 1e-6
        )
        return jnp.concatenate(
            [
                data.root_lin_vel_b / 5.0,
                data.root_ang_vel_b,
                (delta[:, 2] / 2.0)[:, None],
                g,
                goal_dir,
                state.actions,
            ],
            axis=-1,
        )  # 3+3+1+3+3+4 = 17 (reference lidarguide_env.py:300-312)

    def step_state(self, state, action):
        # push the current frame into the history queue before stepping
        frame = self._non_lidar_obs(state)
        user = dict(state.user)
        user["obs_queue"] = jnp.concatenate(
            [user["obs_queue"][:, 1:], frame[:, None]], axis=1
        )
        state = state._replace(user=user)
        return super().step_state(state, action)

    def _get_observations(self, state):
        scan = self._scan(state)
        hist = state.user["obs_queue"].reshape(self.num_envs, -1)
        obs = jnp.clip(jnp.concatenate([scan, hist], axis=-1), -2.0, 2.0)
        return {"policy": obs, "critic": obs}

    def _reset_idx(self, state, mask):
        state = super()._reset_idx(state, mask)
        user = dict(state.user)
        user["obs_queue"] = jnp.where(
            mask[:, None, None], 0.0, user["obs_queue"]
        )
        return state._replace(user=user)


@configclass
class GuideCaSceneCfg(LidarFlySceneCfg):
    # 72-ray scan (36 azimuths x 2 rings) matching the cascade net's
    # lidar_input_dim = 72*5
    lidar = RayCasterCfg(
        prim_path="robot/body",
        pattern_cfg=patterns.BpearlPatternCfg(
            horizontal_res=10.0,
            vertical_ray_angles=(89.5, 45.0),
        ),
        max_distance=10.0,
    )


@configclass
class GuideCaEnvCfg(LidarGuideEnvCfg):
    """Reference guideca_env.py GuideCaEnvCfg."""

    scene: GuideCaSceneCfg = GuideCaSceneCfg(num_envs=4096, env_spacing=2.5)
    lidar_history: int = 5
    guide_state_history: int = 3


class GuideCaEnv(LidarGuideEnv):
    """Obs = [lidar 5-frame | guide-state(6) 3-frame | full-state(17) 3-frame]
    — the partition the fork's ActorCriticCascade consumes."""

    cfg: GuideCaEnvCfg

    def __init__(self, cfg, **kwargs):
        super().__init__(cfg, **kwargs)
        self._guide_dim = 6
        self.cfg.observation_space = (
            self.num_rays * cfg.lidar_history
            + self._guide_dim * cfg.guide_state_history
            + self._non_lidar_dim * cfg.obs_history
        )
        self.num_observations = self.cfg.observation_space

    def _init_user_state(self):
        user = super()._init_user_state()
        user["lidar_queue"] = jnp.zeros(
            (self.num_envs, self.cfg.lidar_history, self.num_rays)
        )
        user["guide_queue"] = jnp.zeros(
            (self.num_envs, self.cfg.guide_state_history, self._guide_dim)
        )
        return user

    def _guide_state(self, state):
        data = self._robot_views(state)
        delta, dist_xy, dir_xy, roll, pitch, yaw_error = self._goal_geometry(
            state, data
        )
        return jnp.concatenate(
            [
                dir_xy,
                (dist_xy / 10.0)[:, None],
                (delta[:, 2] / 2.0)[:, None],
                (yaw_error / jnp.pi)[:, None],
                jnp.linalg.norm(data.root_lin_vel_w, axis=-1, keepdims=True)
                / 5.0,
            ],
            axis=-1,
        )  # 6 dims

    def step_state(self, state, action):
        user = dict(state.user)
        user["lidar_queue"] = jnp.concatenate(
            [user["lidar_queue"][:, 1:], self._scan(state)[:, None]], axis=1
        )
        user["guide_queue"] = jnp.concatenate(
            [user["guide_queue"][:, 1:], self._guide_state(state)[:, None]],
            axis=1,
        )
        state = state._replace(user=user)
        return super().step_state(state, action)

    def _get_observations(self, state):
        E = self.num_envs
        lidar = state.user["lidar_queue"].reshape(E, -1)
        guide = state.user["guide_queue"].reshape(E, -1)
        hist = state.user["obs_queue"].reshape(E, -1)
        obs = jnp.clip(
            jnp.concatenate([lidar, guide, hist], axis=-1), -2.0, 2.0
        )
        return {"policy": obs, "critic": obs}

    def _reset_idx(self, state, mask):
        state = super()._reset_idx(state, mask)
        user = dict(state.user)
        for k in ("lidar_queue", "guide_queue"):
            user[k] = jnp.where(mask[:, None, None], 0.0, user[k])
        return state._replace(user=user)
