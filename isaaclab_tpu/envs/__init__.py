"""Environments (reference ``isaaclab/envs/``, SURVEY.md §2.9)."""

from . import mdp  # noqa: F401
from .common import VecEnvObs, VecEnvStepReturn  # noqa: F401
from .manager_based_env import (  # noqa: F401
    EnvContext,
    EnvState,
    ManagerBasedEnv,
    ManagerBasedEnvCfg,
    ManagerBasedRLEnvCfg,
)
from .manager_based_rl_env import ManagerBasedRLEnv  # noqa: F401
