"""Direct humanoid task (reference ``direct/humanoid/__init__.py``)."""

import gymnasium as gym

from .humanoid_env import HumanoidDirectEnv, HumanoidDirectEnvCfg

gym.register(
    id="Isaac-Humanoid-Direct-v0",
    entry_point="isaaclab_tpu.tasks.direct.humanoid.humanoid_env:HumanoidDirectEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": HumanoidDirectEnvCfg,
        "rsl_rl_cfg_entry_point": (
            "isaaclab_tpu.tasks.manager_based.classic.humanoid.agents."
            "rsl_rl_ppo_cfg:HumanoidPPORunnerCfg"
        ),
    },
)
