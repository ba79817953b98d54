"""Shadow-hand-over MARL task (reference
``direct/shadow_hand_over/__init__.py``)."""

import gymnasium as gym

from .shadow_hand_over_env import ShadowHandOverEnv, ShadowHandOverEnvCfg

gym.register(
    id="Isaac-Shadow-Hand-Over-Direct-v0",
    entry_point=(
        "isaaclab_tpu.tasks.direct.shadow_hand_over.shadow_hand_over_env:"
        "ShadowHandOverEnv"
    ),
    disable_env_checker=True,
    kwargs={"env_cfg_entry_point": ShadowHandOverEnvCfg},
)
