"""Fork quadcopter tasks (reference direct/quadcopter/__init__.py:19-91)."""

import gymnasium as gym

from .lidarfly_env import LidarFlyEnv, LidarFlyEnvCfg
from .quadcopter_env import QuadcopterEnv, QuadcopterEnvCfg

gym.register(
    id="Hover",
    entry_point="isaaclab_tpu.tasks.direct.quadcopter.quadcopter_env:QuadcopterEnv",
    disable_env_checker=True,
    kwargs={"env_cfg_entry_point": QuadcopterEnvCfg},
)

gym.register(
    id="LidarFly",
    entry_point="isaaclab_tpu.tasks.direct.quadcopter.lidarfly_env:LidarFlyEnv",
    disable_env_checker=True,
    kwargs={"env_cfg_entry_point": LidarFlyEnvCfg},
)
