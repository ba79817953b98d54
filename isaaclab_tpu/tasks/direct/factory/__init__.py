"""Factory assembly tasks (reference ``direct/factory/__init__.py``)."""

import gymnasium as gym

from .factory_env import FactoryEnv, FactoryEnvCfg, FactoryTaskCfg

gym.register(
    id="Isaac-Factory-PegInsert-Direct-v0",
    entry_point="isaaclab_tpu.tasks.direct.factory.factory_env:FactoryEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": FactoryEnvCfg,
        "rsl_rl_cfg_entry_point": (
            "isaaclab_tpu.tasks.manager_based.manipulation.cabinet.agents."
            "rsl_rl_ppo_cfg:CabinetPPORunnerCfg"
        ),
    },
)

from .factory_tasks import (  # noqa: E402
    FactoryGearMeshEnvCfg,
    FactoryNutThreadEnvCfg,
)

gym.register(
    id="Isaac-Factory-GearMesh-Direct-v0",
    entry_point="isaaclab_tpu.tasks.direct.factory.factory_env:FactoryEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": FactoryGearMeshEnvCfg,
        "rsl_rl_cfg_entry_point": (
            "isaaclab_tpu.tasks.manager_based.manipulation.cabinet.agents."
            "rsl_rl_ppo_cfg:CabinetPPORunnerCfg"
        ),
    },
)

gym.register(
    id="Isaac-Factory-NutThread-Direct-v0",
    entry_point="isaaclab_tpu.tasks.direct.factory.factory_env:FactoryEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": FactoryNutThreadEnvCfg,
        "rsl_rl_cfg_entry_point": (
            "isaaclab_tpu.tasks.manager_based.manipulation.cabinet.agents."
            "rsl_rl_ppo_cfg:CabinetPPORunnerCfg"
        ),
    },
)
