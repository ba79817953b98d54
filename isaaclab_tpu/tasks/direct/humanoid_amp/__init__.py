"""Humanoid AMP tasks (reference ``direct/humanoid_amp/__init__.py``:
Isaac-Humanoid-AMP-{Dance,Run,Walk}-Direct-v0)."""

import gymnasium as gym

from .humanoid_amp_env import HumanoidAmpEnv, HumanoidAmpEnvCfg

for _style in ("Walk", "Run", "Dance"):
    gym.register(
        id=f"Isaac-Humanoid-AMP-{_style}-Direct-v0",
        entry_point=(
            "isaaclab_tpu.tasks.direct.humanoid_amp.humanoid_amp_env:"
            "HumanoidAmpEnv"
        ),
        disable_env_checker=True,
        kwargs={
            "env_cfg_entry_point": HumanoidAmpEnvCfg(
                motion_style=_style.lower()
            ),
        },
    )
