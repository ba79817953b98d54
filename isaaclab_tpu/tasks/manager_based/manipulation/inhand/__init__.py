"""Manager-based in-hand reorientation (reference
``manager_based/manipulation/inhand/config/allegro_hand/__init__.py``)."""

import gymnasium as gym

from .inhand_env_cfg import (
    AllegroCubeEnvCfg,
    AllegroCubeEnvCfg_PLAY,
    AllegroCubeNoVelObsEnvCfg,
    AllegroCubeNoVelObsEnvCfg_PLAY,
)

_AGENT = (
    "isaaclab_tpu.tasks.direct.shadow_hand.agents.rsl_rl_ppo_cfg:"
    "ShadowHandPPORunnerCfg"
)

gym.register(
    id="Isaac-Repose-Cube-Allegro-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={"env_cfg_entry_point": AllegroCubeEnvCfg,
            "rsl_rl_cfg_entry_point": _AGENT},
)

gym.register(
    id="Isaac-Repose-Cube-Allegro-Play-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={"env_cfg_entry_point": AllegroCubeEnvCfg_PLAY,
            "rsl_rl_cfg_entry_point": _AGENT},
)

gym.register(
    id="Isaac-Repose-Cube-Allegro-NoVelObs-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={"env_cfg_entry_point": AllegroCubeNoVelObsEnvCfg,
            "rsl_rl_cfg_entry_point": _AGENT},
)

gym.register(
    id="Isaac-Repose-Cube-Allegro-NoVelObs-Play-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={"env_cfg_entry_point": AllegroCubeNoVelObsEnvCfg_PLAY,
            "rsl_rl_cfg_entry_point": _AGENT},
)
