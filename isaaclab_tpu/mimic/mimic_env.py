"""Mimic env API (reference ``manager_based_rl_mimic_env.py`` +
``mimic_env_cfg.py``): the abstract surface data generation drives —
end-effector pose getters, pose-to-action conversion, subtask term signals.
"""

from __future__ import annotations

from dataclasses import MISSING, dataclass, field

import jax.numpy as jnp

from ..envs.manager_based_rl_env import ManagerBasedRLEnv
from ..utils.configclass import configclass


@configclass
class SubTaskConfig:
    """Reference ``SubTaskConfig``: one segment of a demonstration."""

    object_ref: str = None
    subtask_term_signal: str = None
    subtask_term_offset_range: tuple = (0, 0)
    selection_strategy: str = "random"
    selection_strategy_kwargs: dict = {}
    action_noise: float = 0.03
    num_interpolation_steps: int = 5
    num_fixed_steps: int = 0
    apply_noise_during_interpolation: bool = False


@configclass
class DataGenConfig:
    """Reference ``DataGenConfig``."""

    name: str = "demo"
    generation_guarantee: bool = True
    generation_keep_failed: bool = False
    generation_num_trials: int = 10
    generation_select_src_per_subtask: bool = False
    generation_relative: bool = False
    max_num_failures: int = 50
    seed: int = 1


@configclass
class MimicEnvCfg:
    """Reference ``MimicEnvCfg``: datagen + per-eef subtask configs."""

    datagen_config: DataGenConfig = DataGenConfig()
    subtask_configs: dict = {}  # eef name -> list[SubTaskConfig]


class ManagerBasedRLMimicEnv(ManagerBasedRLEnv):
    """Reference ``ManagerBasedRLMimicEnv`` abstract API."""

    cfg: MimicEnvCfg

    def get_robot_eef_pose(self, eef_name: str, env_ids=None):
        """(E, 4, 4) end-effector poses; subclasses bind the actual frame."""
        raise NotImplementedError

    def target_eef_pose_to_action(self, target_eef_pose_dict, gripper_action_dict,
                                  noise=None, env_id=0):
        raise NotImplementedError

    def action_to_target_eef_pose(self, action):
        raise NotImplementedError

    def get_subtask_term_signals(self, env_ids=None):
        """dict signal_name -> (E,) bool: subtask completion flags."""
        raise NotImplementedError

    def get_object_poses(self, env_ids=None):
        """dict object_name -> (E, 4, 4) poses."""
        raise NotImplementedError
