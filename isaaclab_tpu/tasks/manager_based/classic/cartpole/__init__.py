"""Cartpole task registration (reference
manager_based/classic/cartpole/__init__.py:18-29)."""

import gymnasium as gym

from . import agents
from .cartpole_env_cfg import CartpoleEnvCfg

gym.register(
    id="Isaac-Cartpole-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": CartpoleEnvCfg,
        "rsl_rl_cfg_entry_point": f"{agents.__name__}.rsl_rl_ppo_cfg:CartpolePPORunnerCfg",
    },
)

# -- camera variants (reference classic/cartpole/__init__.py:32-69) --
from .cartpole_camera_env_cfg import (  # noqa: E402
    CartpoleDepthCameraEnvCfg,
    CartpoleRGBCameraEnvCfg,
    CartpoleResNet18CameraEnvCfg,
    CartpoleTheiaTinyCameraEnvCfg,
)

for _id, _cfg in (
    ("Isaac-Cartpole-RGB-v0", CartpoleRGBCameraEnvCfg),
    ("Isaac-Cartpole-Depth-v0", CartpoleDepthCameraEnvCfg),
    ("Isaac-Cartpole-RGB-ResNet18-v0", CartpoleResNet18CameraEnvCfg),
    ("Isaac-Cartpole-RGB-TheiaTiny-v0", CartpoleTheiaTinyCameraEnvCfg),
):
    gym.register(
        id=_id,
        entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
        disable_env_checker=True,
        kwargs={
            "env_cfg_entry_point": _cfg,
            "rsl_rl_cfg_entry_point": (
                f"{agents.__name__}.rsl_rl_ppo_cfg:CartpoleCameraPPORunnerCfg"
            ),
        },
    )
