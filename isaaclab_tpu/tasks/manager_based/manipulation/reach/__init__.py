"""Franka reach task (reference manipulation/reach registrations)."""

import gymnasium as gym

from . import agents
from .reach_env_cfg import FrankaReachEnvCfg

gym.register(
    id="Isaac-Reach-Franka-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": FrankaReachEnvCfg,
        "rsl_rl_cfg_entry_point": f"{agents.__name__}.rsl_rl_ppo_cfg:ReachPPORunnerCfg",
    },
)
