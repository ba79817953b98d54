"""Agility Cassie velocity tasks (reference ``velocity/config/cassie/__init__.py``)."""

import gymnasium as gym

from . import agents
from .env_cfgs import (
    CassieFlatEnvCfg,
    CassieFlatEnvCfg_PLAY,
    CassieRoughEnvCfg,
    CassieRoughEnvCfg_PLAY,
)

gym.register(
    id="Isaac-Velocity-Flat-Cassie-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": CassieFlatEnvCfg,
        "rsl_rl_cfg_entry_point": f"{agents.__name__}.rsl_rl_ppo_cfg:CassieFlatPPORunnerCfg",
    },
)

gym.register(
    id="Isaac-Velocity-Flat-Cassie-Play-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": CassieFlatEnvCfg_PLAY,
        "rsl_rl_cfg_entry_point": f"{agents.__name__}.rsl_rl_ppo_cfg:CassieFlatPPORunnerCfg",
    },
)

gym.register(
    id="Isaac-Velocity-Rough-Cassie-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": CassieRoughEnvCfg,
        "rsl_rl_cfg_entry_point": f"{agents.__name__}.rsl_rl_ppo_cfg:CassieRoughPPORunnerCfg",
    },
)

gym.register(
    id="Isaac-Velocity-Rough-Cassie-Play-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": CassieRoughEnvCfg_PLAY,
        "rsl_rl_cfg_entry_point": f"{agents.__name__}.rsl_rl_ppo_cfg:CassieRoughPPORunnerCfg",
    },
)
