"""Direct cartpole task (reference ``direct/cartpole/__init__.py``)."""

import gymnasium as gym

from .cartpole_env import CartpoleDirectEnv, CartpoleDirectEnvCfg

gym.register(
    id="Isaac-Cartpole-Direct-v0",
    entry_point="isaaclab_tpu.tasks.direct.cartpole.cartpole_env:CartpoleDirectEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": CartpoleDirectEnvCfg,
        "rsl_rl_cfg_entry_point": (
            f"{__name__}.agents.rsl_rl_ppo_cfg:CartpoleDirectPPORunnerCfg"
        ),
    },
)
