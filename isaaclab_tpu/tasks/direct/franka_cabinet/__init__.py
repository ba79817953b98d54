"""Direct Franka cabinet task (reference ``direct/franka_cabinet``)."""

import gymnasium as gym

from .franka_cabinet_env import FrankaCabinetDirectEnv, FrankaCabinetDirectEnvCfg

gym.register(
    id="Isaac-Franka-Cabinet-Direct-v0",
    entry_point=(
        "isaaclab_tpu.tasks.direct.franka_cabinet.franka_cabinet_env:"
        "FrankaCabinetDirectEnv"
    ),
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": FrankaCabinetDirectEnvCfg,
        "rsl_rl_cfg_entry_point": (
            "isaaclab_tpu.tasks.manager_based.manipulation.cabinet.agents."
            "rsl_rl_ppo_cfg:CabinetPPORunnerCfg"
        ),
    },
)
