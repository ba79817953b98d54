"""External-library vec-env adapters (reference ``isaaclab_rl/``:
``rl_games.py``, ``sb3.py``, ``skrl.py`` — SURVEY.md §2.11).

The torch-based libraries expect numpy/torch tensors with gym-vec semantics;
these wrappers bridge the jitted jax env to that interface host-side. The
in-repo PPO runner remains the fast path (on-device rollouts); adapters exist
for users bringing their own trainer.

Spaces are derived from the env's real ``single_observation_space`` /
``single_action_space`` (including Dict observation groups and bounded Box
actions), mirroring the reference's conversion rules: observation boxes are
clipped to ``±clip_obs``; Box action bounds are clipped to ``±clip_actions``
(reference rl_games.py space conversion).
"""

from __future__ import annotations

import numpy as np


def _clip_box_space(space, clip):
    """Return ``space`` with Box bounds clipped to ±clip (reference
    rl_games.py obs/action space conversion); non-Box spaces pass through."""
    import gymnasium as gym

    if isinstance(space, gym.spaces.Dict):
        return gym.spaces.Dict(
            {k: _clip_box_space(v, clip) for k, v in space.spaces.items()}
        )
    if isinstance(space, gym.spaces.Box) and np.isfinite(clip):
        low = np.maximum(space.low, -clip)
        high = np.minimum(space.high, clip)
        return gym.spaces.Box(low=low, high=high, shape=space.shape,
                              dtype=space.dtype)
    return space


class _NumpyVecEnvBase:
    """Common: jax env -> numpy step/reset; real gym spaces."""

    def __init__(self, env, clip_obs: float = np.inf, clip_actions: float = np.inf):
        self.env = env
        self._clip_obs = clip_obs
        self._clip_actions = clip_actions
        uenv = env.unwrapped
        self.num_envs = uenv.num_envs
        om = getattr(uenv, "observation_manager", None)
        if om is not None:
            self.num_obs = om.group_obs_dim("policy")[0]
            self.num_actions = uenv.action_manager.total_action_dim
        else:
            self.num_obs = uenv.num_observations
            self.num_actions = uenv.num_actions
        # real env spaces (Dict obs groups, possibly bounded Box actions)
        self.single_observation_space = uenv.single_observation_space["policy"]
        self.single_action_space = uenv.single_action_space

    @property
    def unwrapped(self):
        return self.env.unwrapped

    def _to_np(self, x):
        if isinstance(x, dict):
            return {k: self._to_np(v) for k, v in x.items()}
        return np.clip(np.asarray(x), -self._clip_obs, self._clip_obs)

    def _policy_obs(self, obs):
        return self._to_np(obs["policy"])

    def close(self):
        self.env.close()


class RlGamesVecEnvWrapper(_NumpyVecEnvBase):
    """Reference ``RlGamesVecEnvWrapper`` (isaaclab_rl/rl_games.py):
    rl_games IVecEnv-style interface with obs dict {"obs": ...}."""

    def __init__(self, env, rl_device: str = "cpu", clip_obs: float = np.inf,
                 clip_actions: float = np.inf):
        super().__init__(env, clip_obs, clip_actions)
        self.rl_device = rl_device

    def reset(self):
        obs, _ = self.env.reset()
        return {"obs": self._policy_obs(obs)}

    def step(self, actions):
        actions = np.clip(np.asarray(actions), -self._clip_actions, self._clip_actions)
        obs, rew, terminated, truncated, extras = self.env.step(actions)
        dones = np.asarray(terminated | truncated)
        info = {"time_outs": np.asarray(truncated)}
        return (
            {"obs": self._policy_obs(obs)},
            np.asarray(rew),
            dones,
            info,
        )

    def get_number_of_agents(self) -> int:
        return 1

    def get_env_info(self) -> dict:
        return {
            "observation_space": _clip_box_space(
                self.single_observation_space, self._clip_obs
            ),
            "action_space": _clip_box_space(
                self.single_action_space, self._clip_actions
            ),
        }


class Sb3VecEnvWrapper(_NumpyVecEnvBase):
    """Reference ``Sb3VecEnvWrapper`` (isaaclab_rl/sb3.py): stable-baselines3
    VecEnv interface (step_async/step_wait); Dict observation groups map to
    gym Dict spaces like the reference's dict-obs support."""

    def __init__(self, env, fast_variant: bool = True):
        super().__init__(env)
        self.observation_space = self.single_observation_space
        self.action_space = self.single_action_space
        self._async_actions = None

    def reset(self):
        obs, _ = self.env.reset()
        return self._policy_obs(obs)

    def step_async(self, actions):
        self._async_actions = actions

    def step_wait(self):
        obs, rew, terminated, truncated, extras = self.env.step(self._async_actions)
        dones = np.asarray(terminated | truncated)
        infos = [
            {"TimeLimit.truncated": bool(t) and not bool(d)}
            for t, d in zip(np.asarray(truncated), np.asarray(terminated))
        ]
        return self._policy_obs(obs), np.asarray(rew), dones, infos

    def step(self, actions):
        self.step_async(actions)
        return self.step_wait()

    def get_attr(self, attr_name, indices=None):
        return [getattr(self.env.unwrapped, attr_name)] * self.num_envs

    def env_is_wrapped(self, wrapper_class, indices=None):
        return [False] * self.num_envs


class SkrlVecEnvWrapper(_NumpyVecEnvBase):
    """Reference ``SkrlVecEnvWrapper`` (isaaclab_rl/skrl.py): gymnasium-style
    5-tuple pass-through (skrl consumes torch/np directly)."""

    @property
    def observation_space(self):
        return self.single_observation_space

    @property
    def action_space(self):
        return self.single_action_space

    def reset(self):
        obs, info = self.env.reset()
        return self._policy_obs(obs), info

    def step(self, actions):
        obs, rew, terminated, truncated, extras = self.env.step(np.asarray(actions))
        return (
            self._policy_obs(obs),
            np.asarray(rew),
            np.asarray(terminated),
            np.asarray(truncated),
            extras,
        )
