"""Franka cube-stacking task family (reference
``manager_based/manipulation/stack/config/franka/__init__.py``)."""

import gymnasium as gym

from .config_variants import (
    FrankaCubeStackIKAbsEnvCfg,
    FrankaCubeStackIKRelEnvCfg,
    FrankaCubeStackInstanceRandomizeEnvCfg,
    FrankaCubeStackInstanceRandomizeIKRelEnvCfg,
)
from .stack_env_cfg import FrankaCubeStackEnvCfg, StackEnvCfg

gym.register(
    id="Isaac-Stack-Cube-Franka-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    kwargs={"env_cfg_entry_point": FrankaCubeStackEnvCfg},
    disable_env_checker=True,
)

gym.register(
    id="Isaac-Stack-Cube-Instance-Randomize-Franka-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    kwargs={"env_cfg_entry_point": FrankaCubeStackInstanceRandomizeEnvCfg},
    disable_env_checker=True,
)

gym.register(
    id="Isaac-Stack-Cube-Franka-IK-Rel-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    kwargs={"env_cfg_entry_point": FrankaCubeStackIKRelEnvCfg},
    disable_env_checker=True,
)

gym.register(
    id="Isaac-Stack-Cube-Franka-IK-Abs-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    kwargs={"env_cfg_entry_point": FrankaCubeStackIKAbsEnvCfg},
    disable_env_checker=True,
)

gym.register(
    id="Isaac-Stack-Cube-Instance-Randomize-Franka-IK-Rel-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    kwargs={"env_cfg_entry_point": FrankaCubeStackInstanceRandomizeIKRelEnvCfg},
    disable_env_checker=True,
)

from .config_variants import (  # noqa: E402
    FrankaCubeStackBlueprintEnvCfg,
    FrankaCubeStackVisuomotorEnvCfg,
)

gym.register(
    id="Isaac-Stack-Cube-Franka-IK-Rel-Visuomotor-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    kwargs={"env_cfg_entry_point": FrankaCubeStackVisuomotorEnvCfg},
    disable_env_checker=True,
)

gym.register(
    id="Isaac-Stack-Cube-Franka-IK-Rel-Blueprint-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    kwargs={"env_cfg_entry_point": FrankaCubeStackBlueprintEnvCfg},
    disable_env_checker=True,
)
