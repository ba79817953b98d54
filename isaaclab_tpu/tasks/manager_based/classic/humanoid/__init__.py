"""Humanoid task registration (reference classic/humanoid/__init__.py)."""

import gymnasium as gym

from . import agents
from .humanoid_env_cfg import HumanoidEnvCfg

gym.register(
    id="Isaac-Humanoid-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": HumanoidEnvCfg,
        "rsl_rl_cfg_entry_point": f"{agents.__name__}.rsl_rl_ppo_cfg:HumanoidPPORunnerCfg",
    },
)
