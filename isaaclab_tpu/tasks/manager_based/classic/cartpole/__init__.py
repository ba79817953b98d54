"""Cartpole task registration (reference
manager_based/classic/cartpole/__init__.py:18-29)."""

import gymnasium as gym

from . import agents
from .cartpole_env_cfg import CartpoleEnvCfg

gym.register(
    id="Isaac-Cartpole-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": CartpoleEnvCfg,
        "rsl_rl_cfg_entry_point": f"{agents.__name__}.rsl_rl_ppo_cfg:CartpolePPORunnerCfg",
    },
)
