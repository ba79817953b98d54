"""Direct-workflow ANYmal-C velocity tracking (reference
``direct/anymal_c/anymal_c_env.py``): flat (obs 48) and rough (obs 235 with a
height scan) variants, hand-written hooks over the same physics stack as the
manager-based velocity tasks."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ....assets_presets.anymal import ANYMAL_C_CFG
from ....envs.direct_rl_env import DirectRLEnv, DirectRLEnvCfg
from ....scene import InteractiveSceneCfg
from ....sensors import RayCasterCfg, patterns
from ....terrains import (
    HfPyramidSlopedTerrainCfg,
    HfRandomUniformTerrainCfg,
    TerrainGeneratorCfg,
    TerrainImporterCfg,
)
from ....utils import math as math_utils
from ....utils.configclass import configclass


@configclass
class AnymalCFlatSceneCfg(InteractiveSceneCfg):
    robot = ANYMAL_C_CFG


@configclass
class AnymalCRoughSceneCfg(InteractiveSceneCfg):
    terrain = TerrainImporterCfg(
        terrain_type="generator",
        terrain_generator=TerrainGeneratorCfg(
            size=(8.0, 8.0),
            num_rows=5,
            num_cols=4,
            horizontal_scale=0.1,
            vertical_scale=0.005,
            curriculum=False,
            sub_terrains={
                "rough": HfRandomUniformTerrainCfg(
                    proportion=0.5, noise_range=(0.02, 0.1), noise_step=0.02
                ),
                "slope": HfPyramidSlopedTerrainCfg(
                    proportion=0.5, slope_range=(0.0, 0.3), platform_width=2.0
                ),
            },
        ),
    )
    robot = ANYMAL_C_CFG
    height_scanner = RayCasterCfg(
        prim_path="robot/base",
        offset=RayCasterCfg().offset.replace(pos=(0.0, 0.0, 20.0)),
        attach_yaw_only=True,
        pattern_cfg=patterns.GridPatternCfg(resolution=0.1, size=(1.6, 1.0)),
    )


@configclass
class AnymalCFlatDirectEnvCfg(DirectRLEnvCfg):
    """Reference AnymalCFlatEnvCfg (direct/anymal_c)."""

    decimation: int = 4
    episode_length_s: float = 20.0
    action_scale: float = 0.5
    action_space: int = 12
    observation_space: int = 48
    scene: AnymalCFlatSceneCfg = AnymalCFlatSceneCfg(
        num_envs=4096, env_spacing=4.0
    )
    # reward scales (reference anymal_c_env.py cfg)
    lin_vel_reward_scale: float = 1.0
    yaw_rate_reward_scale: float = 0.5
    z_vel_reward_scale: float = -2.0
    ang_vel_reward_scale: float = -0.05
    joint_torque_reward_scale: float = -2.5e-5
    joint_accel_reward_scale: float = -2.5e-7
    action_rate_reward_scale: float = -0.01
    flat_orientation_reward_scale: float = -5.0

    def __post_init__(self):
        self.sim.dt = 0.005


@configclass
class AnymalCRoughDirectEnvCfg(AnymalCFlatDirectEnvCfg):
    """Reference AnymalCRoughEnvCfg: + height scan, no flat-orientation."""

    observation_space: int = 235
    scene: AnymalCRoughSceneCfg = AnymalCRoughSceneCfg(
        num_envs=4096, env_spacing=4.0
    )
    flat_orientation_reward_scale: float = 0.0


class AnymalCDirectEnv(DirectRLEnv):
    cfg: AnymalCFlatDirectEnvCfg

    def __init__(self, cfg, **kwargs):
        super().__init__(cfg, **kwargs)
        self._robot = self.scene.articulations["robot"]
        self._has_scan = "height_scanner" in self.scene.sensors

    def _init_user_state(self):
        E = self.num_envs
        return {
            "commands": jnp.zeros((E, 3)),
            "prev_joint_vel": jnp.zeros((E, self._robot.num_joints)),
        }

    def _views(self, state):
        views, _ = self.scene.data_views(state.scene, self.physics_dt)
        return views["robot"]

    def _pre_physics_step(self, state, actions):
        est = state.scene.entities["robot"]
        target = (
            est.default_joint_pos + self.cfg.action_scale * actions
        )
        est = self._robot.set_joint_position_target(est, target)
        ents = dict(state.scene.entities)
        ents["robot"] = est
        return state._replace(
            scene=state.scene._replace(entities=ents), actions=actions
        )

    def _height_scan(self, state):
        sensor_state = state.scene.sensors["height_scanner"]
        sensor = self.scene.sensors["height_scanner"]
        data = sensor.data_view(sensor_state)
        # height of terrain under each ray relative to base (ref mdp.height_scan)
        views, _ = self.scene.data_views(state.scene, self.physics_dt)
        base_z = views["robot"].root_pos_w[:, 2:3]
        return jnp.clip(base_z - data.ray_hits_w[..., 2] - 0.5, -1.0, 1.0)

    def _get_observations(self, state):
        data = self._views(state)
        obs = [
            data.root_lin_vel_b,
            data.root_ang_vel_b,
            data.projected_gravity_b,
            state.user["commands"],
            data.joint_pos - state.scene.entities["robot"].default_joint_pos,
            data.joint_vel,
            state.actions,
        ]
        if self._has_scan:
            obs.append(self._height_scan(state))
        return {"policy": jnp.concatenate(obs, axis=-1)}

    def _get_rewards(self, state):
        cfg = self.cfg
        data = self._views(state)
        cmd = state.user["commands"]
        lin_err = jnp.sum(
            jnp.square(cmd[:, :2] - data.root_lin_vel_b[:, :2]), axis=-1
        )
        yaw_err = jnp.square(cmd[:, 2] - data.root_ang_vel_b[:, 2])
        joint_acc = (
            (data.joint_vel - state.user["prev_joint_vel"]) / self.step_dt
        )
        torque = state.scene.entities["robot"].applied_torque
        rew = (
            cfg.lin_vel_reward_scale * jnp.exp(-lin_err / 0.25)
            + cfg.yaw_rate_reward_scale * jnp.exp(-yaw_err / 0.25)
            + cfg.z_vel_reward_scale * jnp.square(data.root_lin_vel_b[:, 2])
            + cfg.ang_vel_reward_scale
            * jnp.sum(jnp.square(data.root_ang_vel_b[:, :2]), axis=-1)
            + cfg.joint_torque_reward_scale
            * jnp.sum(jnp.square(torque), axis=-1)
            + cfg.joint_accel_reward_scale
            * jnp.sum(jnp.square(joint_acc), axis=-1)
            + cfg.action_rate_reward_scale
            * jnp.sum(jnp.square(state.actions - state.prev_actions), axis=-1)
            + cfg.flat_orientation_reward_scale
            * jnp.sum(jnp.square(data.projected_gravity_b[:, :2]), axis=-1)
        )
        return rew * self.step_dt

    def step_state(self, state, action):
        # track joint velocity for the acceleration penalty
        data = self._views(state)
        state = state._replace(
            user={**state.user, "prev_joint_vel": data.joint_vel}
        )
        return super().step_state(state, action)

    def _get_dones(self, state):
        data = self._views(state)
        # died when the base tips over (gravity projection flips)
        died = data.projected_gravity_b[:, 2] > -0.1
        time_out = state.episode_length >= self.max_episode_length - 1
        return died, time_out

    def _reset_idx(self, state, mask):
        state = super()._reset_idx(state, mask)
        key, k_cmd = jax.random.split(state.key)
        E = self.num_envs
        new_cmd = jax.random.uniform(k_cmd, (E, 3), minval=-1.0, maxval=1.0)
        cmd = jnp.where(mask[:, None], new_cmd, state.user["commands"])
        return state._replace(
            user={**state.user, "commands": cmd}, key=key
        )
