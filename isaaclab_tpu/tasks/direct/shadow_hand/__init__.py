"""Shadow-hand in-hand repose (reference direct/shadow_hand/__init__.py)."""

import gymnasium as gym

from .shadow_hand_env import ShadowHandEnv, ShadowHandEnvCfg

gym.register(
    id="Isaac-Repose-Cube-Shadow-Direct-v0",
    entry_point="isaaclab_tpu.tasks.direct.shadow_hand.shadow_hand_env:ShadowHandEnv",
    disable_env_checker=True,
    kwargs={"env_cfg_entry_point": ShadowHandEnvCfg},
)
