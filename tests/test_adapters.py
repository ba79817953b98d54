"""Adapter contract tests (reference ``source/isaaclab_rl/test/
test_sb3_wrapper.py`` / ``test_rl_games_wrapper.py`` / ``test_skrl_wrapper.py``).

The actual rl_games/sb3/skrl libraries are not installable in this offline
image, so these tests pin the adapter CONTRACT each library relies on:
spaces derived from the real env spaces (not hard-coded), dict-observation
pass-through, bounded-action clipping, and the per-library step/reset
signatures.
"""

import gymnasium as gym
import numpy as np
import pytest

from isaaclab_tpu.rl.adapters import (
    RlGamesVecEnvWrapper,
    Sb3VecEnvWrapper,
    SkrlVecEnvWrapper,
    _clip_box_space,
)


@pytest.fixture(scope="module")
def cartpole_env():
    from isaaclab_tpu.envs import ManagerBasedRLEnv
    from isaaclab_tpu.tasks.manager_based.classic.cartpole.cartpole_env_cfg import (
        CartpoleEnvCfg,
    )

    cfg = CartpoleEnvCfg()
    cfg.scene.num_envs = 8
    env = ManagerBasedRLEnv(cfg)
    yield env
    env.close()


class _FakeDictEnv:
    """Minimal env exposing a Dict policy space and bounded Box actions —
    exercises the space-derivation paths without a jit compile."""

    num_envs = 4

    def __init__(self):
        self.single_observation_space = gym.spaces.Dict(
            {
                "policy": gym.spaces.Dict(
                    {
                        "state": gym.spaces.Box(-np.inf, np.inf, (5,)),
                        "image": gym.spaces.Box(0.0, 1.0, (4, 4, 1)),
                    }
                )
            }
        )
        self.single_action_space = gym.spaces.Box(-2.0, 2.0, (3,))
        self.num_observations = 5
        self.num_actions = 3

    @property
    def unwrapped(self):
        return self

    def reset(self):
        obs = {
            "policy": {
                "state": np.zeros((self.num_envs, 5), np.float32),
                "image": np.zeros((self.num_envs, 4, 4, 1), np.float32),
            }
        }
        return obs, {}

    def step(self, actions):
        obs, _ = self.reset()
        zeros = np.zeros(self.num_envs)
        falses = np.zeros(self.num_envs, bool)
        return obs, zeros, falses, falses, {}

    def close(self):
        pass


def test_spaces_derived_from_env(cartpole_env):
    """Adapter spaces must come from the env, not hard-coded Box(-1,1)."""
    w = RlGamesVecEnvWrapper(cartpole_env, clip_obs=5.0, clip_actions=1.0)
    info = w.get_env_info()
    assert info["observation_space"].shape == (w.num_obs,)
    # clip_obs applied to the obs box bounds
    assert np.all(info["observation_space"].high <= 5.0)
    assert info["action_space"].shape == (w.num_actions,)

    sb3 = Sb3VecEnvWrapper(cartpole_env)
    assert sb3.observation_space.shape == (sb3.num_obs,)
    assert sb3.action_space.shape == (sb3.num_actions,)

    sk = SkrlVecEnvWrapper(cartpole_env)
    assert sk.observation_space.shape == (sk.num_obs,)


def test_rl_games_step_contract(cartpole_env):
    w = RlGamesVecEnvWrapper(cartpole_env, clip_actions=1.0)
    obs = w.reset()
    assert set(obs) == {"obs"} and obs["obs"].shape == (8, w.num_obs)
    out = w.step(np.zeros((8, w.num_actions)))
    assert len(out) == 4  # (obs_dict, rew, dones, info) — rl_games 4-tuple
    assert "time_outs" in out[3]
    assert w.get_number_of_agents() == 1


def test_sb3_step_contract(cartpole_env):
    w = Sb3VecEnvWrapper(cartpole_env)
    obs = w.reset()
    assert obs.shape == (8, w.num_obs)
    w.step_async(np.zeros((8, w.num_actions)))
    obs, rew, dones, infos = w.step_wait()
    assert isinstance(infos, list) and len(infos) == 8
    assert all("TimeLimit.truncated" in i for i in infos)
    assert len(w.get_attr("num_envs")) == 8


def test_skrl_step_contract(cartpole_env):
    w = SkrlVecEnvWrapper(cartpole_env)
    obs, info = w.reset()
    out = w.step(np.zeros((8, w.num_actions)))
    assert len(out) == 5  # gymnasium 5-tuple pass-through
    terminated, truncated = out[2], out[3]
    assert terminated.dtype == bool or terminated.dtype == np.bool_
    assert truncated.shape == (8,)


def test_dict_obs_and_bounded_actions():
    """Dict observation groups + bounded Box actions survive adaptation
    (reference sb3.py dict-obs support; rl_games.py bound clipping)."""
    env = _FakeDictEnv()
    sb3 = Sb3VecEnvWrapper(env)
    assert isinstance(sb3.observation_space, gym.spaces.Dict)
    obs = sb3.reset()
    assert set(obs) == {"state", "image"}
    assert obs["image"].shape == (4, 4, 4, 1)

    rg = RlGamesVecEnvWrapper(env, clip_actions=1.0)
    info = rg.get_env_info()
    # env action bounds are (-2, 2); clip_actions=1 tightens them
    assert np.all(info["action_space"].low == -1.0)
    assert np.all(info["action_space"].high == 1.0)
    assert isinstance(info["observation_space"], gym.spaces.Dict)


def test_clip_box_space_passthrough():
    disc = gym.spaces.Discrete(4)
    assert _clip_box_space(disc, 1.0) is disc
    box = gym.spaces.Box(-np.inf, np.inf, (3,))
    assert _clip_box_space(box, np.inf) is box
