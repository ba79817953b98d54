"""Ant task registration (reference classic/ant/__init__.py)."""

import gymnasium as gym

from . import agents
from .ant_env_cfg import AntEnvCfg

gym.register(
    id="Isaac-Ant-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": AntEnvCfg,
        "rsl_rl_cfg_entry_point": f"{agents.__name__}.rsl_rl_ppo_cfg:AntPPORunnerCfg",
    },
)
