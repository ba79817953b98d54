"""Cart–double-pendulum MARL task (reference
``direct/cart_double_pendulum/__init__.py``)."""

import gymnasium as gym

from .cart_double_pendulum_env import (
    CartDoublePendulumEnv,
    CartDoublePendulumEnvCfg,
)

gym.register(
    id="Isaac-Cart-Double-Pendulum-Direct-v0",
    entry_point=(
        "isaaclab_tpu.tasks.direct.cart_double_pendulum."
        "cart_double_pendulum_env:CartDoublePendulumEnv"
    ),
    disable_env_checker=True,
    kwargs={"env_cfg_entry_point": CartDoublePendulumEnvCfg},
)
