"""Franka cabinet (open drawer) task (reference manipulation/cabinet)."""

import gymnasium as gym

from . import agents
from .cabinet_env_cfg import FrankaCabinetEnvCfg

gym.register(
    id="Isaac-Open-Drawer-Franka-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": FrankaCabinetEnvCfg,
        "rsl_rl_cfg_entry_point": f"{agents.__name__}.rsl_rl_ppo_cfg:CabinetPPORunnerCfg",
    },
)
