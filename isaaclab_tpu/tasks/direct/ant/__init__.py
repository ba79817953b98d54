"""Direct ant task (reference ``direct/ant/__init__.py``)."""

import gymnasium as gym

from .ant_env import AntDirectEnv, AntDirectEnvCfg

gym.register(
    id="Isaac-Ant-Direct-v0",
    entry_point="isaaclab_tpu.tasks.direct.ant.ant_env:AntDirectEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": AntDirectEnvCfg,
        "rsl_rl_cfg_entry_point": (
            "isaaclab_tpu.tasks.manager_based.classic.ant.agents."
            "rsl_rl_ppo_cfg:AntPPORunnerCfg"
        ),
    },
)
