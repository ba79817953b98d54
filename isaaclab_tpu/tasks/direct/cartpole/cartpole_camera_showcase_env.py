"""Camera space-showcase cartpole variants (reference
``direct/cartpole_showcase/cartpole_camera/__init__.py``,
``Isaac-Cartpole-Camera-Showcase-{Obs}-{Act}-Direct-v0``): the RGB-camera
cartpole MDP exposed through Box / Dict / Tuple observation spaces x Box /
Discrete / MultiDiscrete action spaces — 9 task IDs."""

from __future__ import annotations

import gymnasium as gym
import jax.numpy as jnp
import numpy as np

from ....utils.configclass import configclass
from .cartpole_camera_env import (
    CartpoleRGBCameraDirectEnv,
    CartpoleRGBCameraDirectEnvCfg,
)

OBS_MODES = ("box", "dict", "tuple")
ACT_MODES = ("box", "discrete", "multidiscrete")


@configclass
class CartpoleCameraShowcaseEnvCfg(CartpoleRGBCameraDirectEnvCfg):
    """obs_mode in {box, dict, tuple}; act_mode in {box, discrete,
    multidiscrete} (reference cartpole_camera_env_cfg.py:36-353)."""

    obs_mode: str = "box"
    act_mode: str = "box"

    def __post_init__(self):
        super().__post_init__()
        cam = self.scene.tiled_camera
        img = gym.spaces.Box(-np.inf, np.inf, (cam.height, cam.width, 3))
        jvel = gym.spaces.Box(-np.inf, np.inf, (2,))
        if self.obs_mode == "dict":
            # reference DictBoxEnvCfg keys
            self.observation_space = gym.spaces.Dict(
                {"joint-velocities": jvel, "camera": img}
            )
        elif self.obs_mode == "tuple":
            self.observation_space = gym.spaces.Tuple((img, jvel))
        else:
            self.observation_space = img
        if self.act_mode == "discrete":
            self.action_space = gym.spaces.Discrete(3)
        elif self.act_mode == "multidiscrete":
            self.action_space = gym.spaces.MultiDiscrete([3, 2])


class CartpoleCameraShowcaseEnv(CartpoleRGBCameraDirectEnv):
    cfg: CartpoleCameraShowcaseEnvCfg

    def _pre_physics_step(self, state, actions):
        mode = self.cfg.act_mode
        if mode == "discrete":
            # {0,1,2} -> {0,-1,+1} (reference showcase semantics)
            a = jnp.round(jnp.clip(actions[:, 0], 0, 2))
            eff = jnp.where(a == 1, -1.0, jnp.where(a == 2, 1.0, 0.0))[:, None]
        elif mode == "multidiscrete":
            value = jnp.round(jnp.clip(actions[:, 0], 0, 2)) * 0.5
            sign = jnp.where(
                jnp.round(jnp.clip(actions[:, 1], 0, 1)) == 0, -1.0, 1.0
            )
            eff = (sign * value)[:, None]
        else:
            eff = actions
        state = super()._pre_physics_step(state, eff)
        return state._replace(actions=actions)

    def _get_observations(self, state):
        rgb = self._camera_obs(state)
        mode = self.cfg.obs_mode
        if mode == "box":
            return {"policy": rgb.reshape(rgb.shape[0], -1)}
        q, qd = self._joint_state(state)
        jv = qd
        if mode == "dict":
            return {"policy": {"joint-velocities": jv, "camera": rgb}}
        return {"policy": (rgb, jv)}
