"""Unitree H1 velocity tasks (reference ``velocity/config/h1/__init__.py``)."""

import gymnasium as gym

from . import agents
from .env_cfgs import (
    H1FlatEnvCfg,
    H1FlatEnvCfg_PLAY,
    H1RoughEnvCfg,
    H1RoughEnvCfg_PLAY,
)

gym.register(
    id="Isaac-Velocity-Flat-H1-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": H1FlatEnvCfg,
        "rsl_rl_cfg_entry_point": f"{agents.__name__}.rsl_rl_ppo_cfg:H1FlatPPORunnerCfg",
    },
)

gym.register(
    id="Isaac-Velocity-Flat-H1-Play-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": H1FlatEnvCfg_PLAY,
        "rsl_rl_cfg_entry_point": f"{agents.__name__}.rsl_rl_ppo_cfg:H1FlatPPORunnerCfg",
    },
)

gym.register(
    id="Isaac-Velocity-Rough-H1-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": H1RoughEnvCfg,
        "rsl_rl_cfg_entry_point": f"{agents.__name__}.rsl_rl_ppo_cfg:H1RoughPPORunnerCfg",
    },
)

gym.register(
    id="Isaac-Velocity-Rough-H1-Play-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": H1RoughEnvCfg_PLAY,
        "rsl_rl_cfg_entry_point": f"{agents.__name__}.rsl_rl_ppo_cfg:H1RoughPPORunnerCfg",
    },
)
