"""Shadow-hand in-hand repose (reference direct/shadow_hand/__init__.py):
standard, OpenAI-FF (asymmetric) and OpenAI-LSTM variants."""

import gymnasium as gym

from . import agents
from .shadow_hand_env import (
    ShadowHandEnv,
    ShadowHandEnvCfg,
    ShadowHandOpenAIEnvCfg,
)

gym.register(
    id="Isaac-Repose-Cube-Shadow-Direct-v0",
    entry_point="isaaclab_tpu.tasks.direct.shadow_hand.shadow_hand_env:ShadowHandEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": ShadowHandEnvCfg,
        "rsl_rl_cfg_entry_point": (
            f"{agents.__name__}.rsl_rl_ppo_cfg:ShadowHandPPORunnerCfg"
        ),
    },
)

gym.register(
    id="Isaac-Repose-Cube-Shadow-OpenAI-FF-Direct-v0",
    entry_point="isaaclab_tpu.tasks.direct.shadow_hand.shadow_hand_env:ShadowHandEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": ShadowHandOpenAIEnvCfg,
        "rsl_rl_cfg_entry_point": (
            f"{agents.__name__}.rsl_rl_ppo_cfg:ShadowHandPPORunnerCfg"
        ),
    },
)

gym.register(
    id="Isaac-Repose-Cube-Shadow-OpenAI-LSTM-Direct-v0",
    entry_point="isaaclab_tpu.tasks.direct.shadow_hand.shadow_hand_env:ShadowHandEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": ShadowHandOpenAIEnvCfg,
        "rsl_rl_cfg_entry_point": (
            f"{agents.__name__}.rsl_rl_ppo_cfg:ShadowHandOpenAILSTMPPORunnerCfg"
        ),
    },
)

from .shadow_hand_vision_env import (  # noqa: E402
    ShadowHandVisionEnv,
    ShadowHandVisionEnvCfg,
    ShadowHandVisionEnvPlayCfg,
)

gym.register(
    id="Isaac-Repose-Cube-Shadow-Vision-Direct-v0",
    entry_point=(
        "isaaclab_tpu.tasks.direct.shadow_hand.shadow_hand_vision_env:"
        "ShadowHandVisionEnv"
    ),
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": ShadowHandVisionEnvCfg,
        "rsl_rl_cfg_entry_point": (
            f"{agents.__name__}.rsl_rl_ppo_cfg:ShadowHandPPORunnerCfg"
        ),
    },
)

gym.register(
    id="Isaac-Repose-Cube-Shadow-Vision-Direct-Play-v0",
    entry_point=(
        "isaaclab_tpu.tasks.direct.shadow_hand.shadow_hand_vision_env:"
        "ShadowHandVisionEnv"
    ),
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": ShadowHandVisionEnvPlayCfg,
        "rsl_rl_cfg_entry_point": (
            f"{agents.__name__}.rsl_rl_ppo_cfg:ShadowHandPPORunnerCfg"
        ),
    },
)
