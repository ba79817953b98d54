"""Fork quadcopter tasks (reference direct/quadcopter/__init__.py:19-91):
Hover, Track, LidarFly, LidarGuide, LidarGuideRNN, LidarRNN, GuideCa."""

import gymnasium as gym

from . import agents
from .lidarfly_env import LidarFlyEnv, LidarFlyEnvCfg
from .lidarguide_env import (
    GuideCaEnv,
    GuideCaEnvCfg,
    LidarGuideEnv,
    LidarGuideEnvCfg,
)
from .quadcopter_env import QuadcopterEnv, QuadcopterEnvCfg
from .track import TrackEnv, TrackEnvCfg

_A = agents.__name__

gym.register(
    id="Hover",
    entry_point="isaaclab_tpu.tasks.direct.quadcopter.quadcopter_env:QuadcopterEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": QuadcopterEnvCfg,
        "rsl_rl_cfg_entry_point": f"{_A}.rsl_rl_ppo_cfg:QuadcopterPPORunnerCfg",
    },
)

gym.register(
    id="Track",
    entry_point="isaaclab_tpu.tasks.direct.quadcopter.track:TrackEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": TrackEnvCfg,
        "rsl_rl_cfg_entry_point": f"{_A}.rsl_rl_ppo_cfg:QuadcopterPPORunnerCfg",
    },
)

gym.register(
    id="LidarFly",
    entry_point="isaaclab_tpu.tasks.direct.quadcopter.lidarfly_env:LidarFlyEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": LidarFlyEnvCfg,
        "rsl_rl_cfg_entry_point": f"{_A}.rsl_rl_ppo_cfg:QuadcopterPPORunnerCfg",
    },
)

gym.register(
    id="LidarGuide",
    entry_point="isaaclab_tpu.tasks.direct.quadcopter.lidarguide_env:LidarGuideEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": LidarGuideEnvCfg,
        "rsl_rl_cfg_entry_point": f"{_A}.rsl_rl_ppo_cfg:QuadcopterPPORunnerCfg",
    },
)

gym.register(
    id="LidarGuideRNN",
    entry_point="isaaclab_tpu.tasks.direct.quadcopter.lidarguide_env:LidarGuideEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": LidarGuideEnvCfg,
        "rsl_rl_cfg_entry_point": f"{_A}.rsl_rl_ppo_cfg:QuadcopterPPORNNRunnerCfg",
    },
)

gym.register(
    id="LidarRNN",
    entry_point="isaaclab_tpu.tasks.direct.quadcopter.lidarfly_env:LidarFlyEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": LidarFlyEnvCfg,
        "rsl_rl_cfg_entry_point": f"{_A}.rsl_rl_ppo_cfg:QuadcopterPPORNNRunnerCfg",
    },
)

gym.register(
    id="GuideCa",
    entry_point="isaaclab_tpu.tasks.direct.quadcopter.lidarguide_env:GuideCaEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": GuideCaEnvCfg,
        "rsl_rl_cfg_entry_point": (
            f"{_A}.rsl_rl_ppo_cfg:QuadcopterPPOCascadeRunnerCfg"
        ),
    },
)
