"""Allegro in-hand repose task (reference ``direct/allegro_hand/__init__.py``)."""

import gymnasium as gym

from .allegro_hand_env import AllegroHandEnv, AllegroHandEnvCfg

gym.register(
    id="Isaac-Repose-Cube-Allegro-Direct-v0",
    entry_point=(
        "isaaclab_tpu.tasks.direct.allegro_hand.allegro_hand_env:AllegroHandEnv"
    ),
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": AllegroHandEnvCfg,
        "rsl_rl_cfg_entry_point": (
            "isaaclab_tpu.tasks.direct.shadow_hand.agents."
            "rsl_rl_ppo_cfg:ShadowHandPPORunnerCfg"
        ),
    },
)
