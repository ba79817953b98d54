"""Direct ANYmal-C tasks (reference ``direct/anymal_c/__init__.py``)."""

import gymnasium as gym

from .anymal_c_env import (
    AnymalCDirectEnv,
    AnymalCFlatDirectEnvCfg,
    AnymalCRoughDirectEnvCfg,
)

_AGENT = (
    "isaaclab_tpu.tasks.manager_based.locomotion.velocity.config.anymal_c."
    "agents.rsl_rl_ppo_cfg:{}"
)

gym.register(
    id="Isaac-Velocity-Flat-Anymal-C-Direct-v0",
    entry_point="isaaclab_tpu.tasks.direct.anymal_c.anymal_c_env:AnymalCDirectEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": AnymalCFlatDirectEnvCfg,
        "rsl_rl_cfg_entry_point": _AGENT.format("AnymalCFlatPPORunnerCfg"),
    },
)

gym.register(
    id="Isaac-Velocity-Rough-Anymal-C-Direct-v0",
    entry_point="isaaclab_tpu.tasks.direct.anymal_c.anymal_c_env:AnymalCDirectEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": AnymalCRoughDirectEnvCfg,
        "rsl_rl_cfg_entry_point": _AGENT.format("AnymalCRoughPPORunnerCfg"),
    },
)
