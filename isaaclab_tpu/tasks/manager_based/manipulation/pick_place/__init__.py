"""GR1T2 pick-place task (reference
``manager_based/manipulation/pick_place/__init__.py``)."""

import gymnasium as gym

from .pickplace_gr1t2_env_cfg import PickPlaceGR1T2EnvCfg

gym.register(
    id="Isaac-PickPlace-GR1T2-Abs-v0",
    entry_point="isaaclab_tpu.envs:ManagerBasedRLEnv",
    disable_env_checker=True,
    kwargs={"env_cfg_entry_point": PickPlaceGR1T2EnvCfg},
)
