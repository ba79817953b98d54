"""Manager term configurations (reference ``managers/manager_term_cfg.py``).

Terms are plain functions ``f(env, **params) -> array`` evaluated inside the
jitted step; ``env`` is the per-trace :class:`EnvContext`. All regex/entity
resolution happens at build time (SURVEY.md §7 hard part 4).
"""

from __future__ import annotations

from dataclasses import MISSING
from typing import Callable

from ..utils.configclass import configclass
from .scene_entity_cfg import SceneEntityCfg  # noqa: F401  (re-export)


@configclass
class ManagerTermBaseCfg:
    """Reference ``ManagerTermBaseCfg``."""

    func: Callable = MISSING
    params: dict = {}


@configclass
class ObservationTermCfg(ManagerTermBaseCfg):
    """Reference ``ObservationTermCfg``: func -> modifiers -> noise -> clip ->
    scale pipeline (observation_manager.py:260-335)."""

    modifiers: list = None
    noise: object = None  # NoiseCfg
    clip: tuple = None
    scale: object = None
    history_length: int = 0
    flatten_history_dim: bool = True


@configclass
class ObservationGroupCfg:
    """Reference ``ObservationGroupCfg``: attributes are ObservationTermCfg."""

    concatenate_terms: bool = True
    enable_corruption: bool = True
    history_length: int = None  # group-wide override
    flatten_history_dim: bool = True


@configclass
class ActionTermCfg:
    """Reference ``ActionTermCfg``: class_type instantiated per term."""

    class_type: type = MISSING
    asset_name: str = MISSING
    debug_vis: bool = False
    clip: dict = None


@configclass
class RewardTermCfg(ManagerTermBaseCfg):
    """Reference ``RewardTermCfg``: weighted sum contribution."""

    weight: float = MISSING


@configclass
class TerminationTermCfg(ManagerTermBaseCfg):
    """Reference ``TerminationTermCfg``: ``time_out`` marks truncation terms
    (termination_manager.py:151)."""

    time_out: bool = False


@configclass
class CommandTermCfg:
    """Reference ``CommandTermCfg``: class_type + resampling range."""

    class_type: type = MISSING
    resampling_time_range: tuple = MISSING
    debug_vis: bool = False


@configclass
class CurriculumTermCfg(ManagerTermBaseCfg):
    pass


@configclass
class EventTermCfg(ManagerTermBaseCfg):
    """Reference ``EventTermCfg`` (manager_term_cfg.py:240-290)."""

    mode: str = MISSING  # "startup" | "reset" | "interval" | "prestartup"
    interval_range_s: tuple = None
    is_global_time: bool = False
    min_step_count_between_reset: int = 0
