"""Navigation tasks (reference manager_based/navigation)."""

import gymnasium as gym

from . import agents
from .navigation_env_cfg import NavigationEnvCfg

gym.register(
    id="Isaac-Navigation-Flat-Anymal-C-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": NavigationEnvCfg,
        "rsl_rl_cfg_entry_point": (
            f"{agents.__name__}.rsl_rl_ppo_cfg:NavigationEnvPPORunnerCfg"
        ),
    },
)

from .navigation_env_cfg import NavigationEnvCfg_PLAY  # noqa: E402

gym.register(
    id="Isaac-Navigation-Flat-Anymal-C-Play-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={
        "env_cfg_entry_point": NavigationEnvCfg_PLAY,
        "rsl_rl_cfg_entry_point": (
            f"{agents.__name__}.rsl_rl_ppo_cfg:NavigationEnvPPORunnerCfg"
        ),
    },
)
