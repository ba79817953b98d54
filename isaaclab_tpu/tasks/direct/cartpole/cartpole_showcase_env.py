"""Space-showcase cartpole variants (reference
``direct/cartpole_showcase/cartpole/cartpole_env.py``,
``Isaac-Cartpole-Showcase-{Obs}-{Act}-Direct-v0``): the same MDP exposed
through Box / Discrete / MultiDiscrete / Dict / Tuple gymnasium spaces to
exercise the space plumbing end-to-end.

The full reference grid is {Box, Discrete, MultiDiscrete, Dict, Tuple}
observations x {Box, Discrete, MultiDiscrete} actions = 15 task IDs
(reference ``direct/cartpole_showcase/cartpole/__init__.py:23-187``).
"""

from __future__ import annotations

import gymnasium as gym
import jax.numpy as jnp
import numpy as np

from ....utils.configclass import configclass
from .cartpole_env import CartpoleDirectEnv, CartpoleDirectEnvCfg

OBS_MODES = ("box", "discrete", "multidiscrete", "dict", "tuple")
ACT_MODES = ("box", "discrete", "multidiscrete")


@configclass
class CartpoleShowcaseEnvCfg(CartpoleDirectEnvCfg):
    """obs_mode in {box, discrete, multidiscrete, dict, tuple}; act_mode in
    {box, discrete, multidiscrete}."""

    obs_mode: str = "box"
    act_mode: str = "box"

    def __post_init__(self):
        super().__post_init__()
        if self.obs_mode == "dict":
            # reference BoxBoxEnvCfg-style keys: joint-positions/velocities
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
        elif self.obs_mode == "discrete":
            # sign-quadrant index over (pole q, cart q, pole qd, cart qd)
            self.observation_space = gym.spaces.Discrete(16)
        elif self.obs_mode == "multidiscrete":
            # 4 binary sign observations
            self.observation_space = gym.spaces.MultiDiscrete([2, 2, 2, 2])
        if self.act_mode == "discrete":
            # 0: no push, 1: push left, 2: push right (reference semantics)
            self.action_space = gym.spaces.Discrete(3)
        elif self.act_mode == "multidiscrete":
            # sub-action 0: magnitude {0, half, full}; sub-action 1: direction
            self.action_space = gym.spaces.MultiDiscrete([3, 2])


class CartpoleShowcaseEnv(CartpoleDirectEnv):
    cfg: CartpoleShowcaseEnvCfg

    def _pre_physics_step(self, state, actions):
        mode = self.cfg.act_mode
        if mode == "discrete":
            # accept floats (sampled policies) or ints; {0,1,2} -> {0,-1,+1}
            a = jnp.round(jnp.clip(actions[:, 0], 0, 2))
            eff = jnp.where(a == 1, -1.0, jnp.where(a == 2, 1.0, 0.0))[:, None]
        elif mode == "multidiscrete":
            value = jnp.round(jnp.clip(actions[:, 0], 0, 2)) * 0.5
            sign = jnp.where(jnp.round(jnp.clip(actions[:, 1], 0, 1)) == 0, -1.0, 1.0)
            eff = (sign * value)[:, None]
        else:
            eff = actions
        state = super()._pre_physics_step(state, eff)
        # keep the raw (action-space-shaped) actions in the carry so the
        # scan-state layout matches reset (eff may be narrower, e.g. (E, 1)
        # for the MultiDiscrete([3, 2]) variant)
        return state._replace(actions=actions)

    def _get_observations(self, state):
        q, qd = self._joint_state(state)
        jp = jnp.stack([q[:, self._pole_dof], q[:, self._cart_dof]], axis=-1)
        jv = jnp.stack([qd[:, self._pole_dof], qd[:, self._cart_dof]], axis=-1)
        mode = self.cfg.obs_mode
        if mode == "dict":
            return {"policy": {"joint_pos": jp, "joint_vel": jv}}
        if mode == "tuple":
            return {"policy": (jp, jv)}
        if mode == "discrete":
            # binary-code the 4 state-component signs into one index [0, 16)
            signs = (
                jnp.concatenate([jp, jv], axis=-1) >= 0.0
            ).astype(jnp.int32)
            weights = jnp.asarray([8, 4, 2, 1], dtype=jnp.int32)
            return {"policy": (signs * weights).sum(axis=-1)}
        if mode == "multidiscrete":
            signs = (
                jnp.concatenate([jp, jv], axis=-1) >= 0.0
            ).astype(jnp.int32)
            return {"policy": signs}
        return {"policy": jnp.concatenate([jp, jv], axis=-1)}
