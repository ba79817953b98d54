"""RSL-RL vec-env wrapper (reference ``isaaclab_rl/rsl_rl/vecenv_wrapper.py``).

Flattens the obs dict to the ``policy`` tensor, merges terminated|truncated to
``dones``, exposes ``time_outs`` in extras for bootstrapping
(vecenv_wrapper.py:171-188). The in-repo runner consumes the env functionally,
so this wrapper exists for API parity with external rsl-rl-style consumers.
"""

from __future__ import annotations

import jax.numpy as jnp


class RslRlVecEnvWrapper:
    def __init__(self, env, clip_actions: float | None = None):
        self.env = env
        self.clip_actions = clip_actions
        uenv = env.unwrapped
        self.num_envs = uenv.num_envs
        if hasattr(uenv, "action_manager"):  # manager-based env
            self.num_actions = uenv.action_manager.total_action_dim
            om = uenv.observation_manager
            self.num_obs = om.group_obs_dim("policy")[0]
            self.num_privileged_obs = (
                om.group_obs_dim("critic")[0]
                if "critic" in om.group_names()
                else 0
            )
        else:  # direct env (num_* attributes, direct_rl_env.py)
            self.num_actions = uenv.num_actions
            self.num_obs = uenv.num_observations
            self.num_privileged_obs = getattr(uenv, "num_states", 0)
        self.max_episode_length = uenv.max_episode_length
        self.episode_length_buf = None

    @property
    def unwrapped(self):
        return self.env.unwrapped

    @property
    def cfg(self):
        return self.env.unwrapped.cfg

    @property
    def device(self):
        return "tpu"

    def get_observations(self):
        obs, _ = self.env.reset()
        return obs["policy"], {"observations": obs}

    def reset(self):
        obs, _ = self.env.reset()
        return obs["policy"], {"observations": obs}

    def step(self, actions):
        if self.clip_actions is not None:
            actions = jnp.clip(actions, -self.clip_actions, self.clip_actions)
        obs, rew, terminated, truncated, extras = self.env.step(actions)
        dones = terminated | truncated
        extras = dict(extras)
        extras["time_outs"] = truncated
        extras["observations"] = obs
        return obs["policy"], rew, dones, extras

    def seed(self, seed: int = -1):
        return self.env.unwrapped.seed(seed)

    def close(self):
        self.env.close()
