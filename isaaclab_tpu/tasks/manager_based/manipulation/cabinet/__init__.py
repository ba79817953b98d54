"""Franka cabinet (open drawer) task (reference manipulation/cabinet)."""

import gymnasium as gym

from . import agents
from .cabinet_env_cfg import FrankaCabinetEnvCfg
from .config_variants import (
    FrankaCabinetEnvCfg_PLAY,
    FrankaCabinetIKAbsEnvCfg,
    FrankaCabinetIKRelEnvCfg,
)

gym.register(
    id="Isaac-Open-Drawer-Franka-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": FrankaCabinetEnvCfg,
        "rsl_rl_cfg_entry_point": f"{agents.__name__}.rsl_rl_ppo_cfg:CabinetPPORunnerCfg",
    },
)

gym.register(
    id="Isaac-Open-Drawer-Franka-Play-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": FrankaCabinetEnvCfg_PLAY,
        "rsl_rl_cfg_entry_point": f"{agents.__name__}.rsl_rl_ppo_cfg:CabinetPPORunnerCfg",
    },
)

gym.register(
    id="Isaac-Open-Drawer-Franka-IK-Abs-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": FrankaCabinetIKAbsEnvCfg,
        "rsl_rl_cfg_entry_point": f"{agents.__name__}.rsl_rl_ppo_cfg:CabinetPPORunnerCfg",
    },
)

gym.register(
    id="Isaac-Open-Drawer-Franka-IK-Rel-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": FrankaCabinetIKRelEnvCfg,
        "rsl_rl_cfg_entry_point": f"{agents.__name__}.rsl_rl_ppo_cfg:CabinetPPORunnerCfg",
    },
)
