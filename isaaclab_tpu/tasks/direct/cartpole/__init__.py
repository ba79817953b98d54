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

from .cartpole_camera_env import (  # noqa: E402
    CartpoleDepthCameraDirectEnv,
    CartpoleDepthCameraDirectEnvCfg,
)

gym.register(
    id="Isaac-Cartpole-Depth-Camera-Direct-v0",
    entry_point=(
        "isaaclab_tpu.tasks.direct.cartpole.cartpole_camera_env:"
        "CartpoleDepthCameraDirectEnv"
    ),
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": CartpoleDepthCameraDirectEnvCfg,
        "rsl_rl_cfg_entry_point": (
            f"{__name__}.agents.rsl_rl_ppo_cfg:CartpoleDirectPPORunnerCfg"
        ),
    },
)

from .cartpole_showcase_env import (  # noqa: E402
    CartpoleShowcaseEnv,
    CartpoleShowcaseEnvCfg,
)

for _obs, _act in (
    (o, a)
    for o in ("Box", "Discrete", "MultiDiscrete", "Dict", "Tuple")
    for a in ("Box", "Discrete", "MultiDiscrete")
):
    _cfg = CartpoleShowcaseEnvCfg(
        obs_mode=_obs.lower(), act_mode=_act.lower()
    )
    gym.register(
        id=f"Isaac-Cartpole-Showcase-{_obs}-{_act}-Direct-v0",
        entry_point=(
            "isaaclab_tpu.tasks.direct.cartpole.cartpole_showcase_env:"
            "CartpoleShowcaseEnv"
        ),
        disable_env_checker=True,
        kwargs={"env_cfg_entry_point": _cfg},
    )

from .cartpole_camera_env import (  # noqa: E402
    CartpoleRGBCameraDirectEnv,
    CartpoleRGBCameraDirectEnvCfg,
)

gym.register(
    id="Isaac-Cartpole-RGB-Camera-Direct-v0",
    entry_point=(
        "isaaclab_tpu.tasks.direct.cartpole.cartpole_camera_env:"
        "CartpoleRGBCameraDirectEnv"
    ),
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": CartpoleRGBCameraDirectEnvCfg,
        "rsl_rl_cfg_entry_point": (
            f"{__name__}.agents.rsl_rl_ppo_cfg:CartpoleDirectPPORunnerCfg"
        ),
    },
)

from .cartpole_camera_showcase_env import (  # noqa: E402
    CartpoleCameraShowcaseEnv,
    CartpoleCameraShowcaseEnvCfg,
)

for _obs, _act in (
    (o, a)
    for o in ("Box", "Dict", "Tuple")
    for a in ("Box", "Discrete", "MultiDiscrete")
):
    _cfg = CartpoleCameraShowcaseEnvCfg(
        obs_mode=_obs.lower(), act_mode=_act.lower()
    )
    gym.register(
        id=f"Isaac-Cartpole-Camera-Showcase-{_obs}-{_act}-Direct-v0",
        entry_point=(
            "isaaclab_tpu.tasks.direct.cartpole.cartpole_camera_showcase_env:"
            "CartpoleCameraShowcaseEnv"
        ),
        disable_env_checker=True,
        kwargs={"env_cfg_entry_point": _cfg},
    )
