"""Space-showcase cartpole variants (reference
``direct/cartpole/cartpole_env.py`` showcase tasks,
``Isaac-Cartpole-Showcase-{Obs}-{Act}-Direct-v0``): the same MDP exposed
through Box / Discrete / MultiDiscrete / Dict / Tuple gymnasium spaces to
exercise the space plumbing end-to-end."""

from __future__ import annotations

import gymnasium as gym
import jax.numpy as jnp
import numpy as np

from ....utils.configclass import configclass
from .cartpole_env import CartpoleDirectEnv, CartpoleDirectEnvCfg


@configclass
class CartpoleShowcaseEnvCfg(CartpoleDirectEnvCfg):
    """obs_mode in {box, dict, tuple}; act_mode in {box, discrete,
    multidiscrete}."""

    obs_mode: str = "box"
    act_mode: str = "box"

    def __post_init__(self):
        super().__post_init__()
        if self.obs_mode == "dict":
            self.observation_space = gym.spaces.Dict(
                {
                    "joint_pos": gym.spaces.Box(-np.inf, np.inf, (2,)),
                    "joint_vel": gym.spaces.Box(-np.inf, np.inf, (2,)),
                }
            )
        elif self.obs_mode == "tuple":
            self.observation_space = gym.spaces.Tuple(
                (
                    gym.spaces.Box(-np.inf, np.inf, (2,)),
                    gym.spaces.Box(-np.inf, np.inf, (2,)),
                )
            )
        if self.act_mode == "discrete":
            # 3 choices: push left / nothing / push right
            self.action_space = gym.spaces.Discrete(3)
        elif self.act_mode == "multidiscrete":
            # two ternary sub-actions: direction x magnitude
            self.action_space = gym.spaces.MultiDiscrete([3, 2])


class CartpoleShowcaseEnv(CartpoleDirectEnv):
    cfg: CartpoleShowcaseEnvCfg

    def _pre_physics_step(self, state, actions):
        mode = self.cfg.act_mode
        if mode == "discrete":
            # accept floats (sampled policies) or ints; map {0,1,2}->{-1,0,1}
            a = jnp.round(jnp.clip(actions[:, 0], 0, 2)) - 1.0
            eff = a[:, None]
        elif mode == "multidiscrete":
            direction = jnp.round(jnp.clip(actions[:, 0], 0, 2)) - 1.0
            magnitude = jnp.round(jnp.clip(actions[:, 1], 0, 1)) * 0.5 + 0.5
            eff = (direction * magnitude)[:, None]
        else:
            eff = actions
        return super()._pre_physics_step(state, eff)

    def _get_observations(self, state):
        q, qd = self._joint_state(state)
        jp = jnp.stack([q[:, self._pole_dof], q[:, self._cart_dof]], axis=-1)
        jv = jnp.stack([qd[:, self._pole_dof], qd[:, self._cart_dof]], axis=-1)
        mode = self.cfg.obs_mode
        if mode == "dict":
            return {"policy": {"joint_pos": jp, "joint_vel": jv}}
        if mode == "tuple":
            return {"policy": (jp, jv)}
        return {"policy": jnp.concatenate([jp, jv], axis=-1)}
