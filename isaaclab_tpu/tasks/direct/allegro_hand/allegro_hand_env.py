"""Allegro in-hand cube repose (reference
``direct/allegro_hand/allegro_hand_env.py``): same in-hand manipulation MDP as
the shadow-hand task with the 16-dof Allegro hand."""

from __future__ import annotations

from ....assets import RigidObjectCfg, RigidObjectInitStateCfg
from ....assets_presets.allegro import ALLEGRO_HAND_CFG
from ....scene import InteractiveSceneCfg
from ....utils.configclass import configclass
from ..shadow_hand.shadow_hand_env import (
    ShadowHandEnv,
    ShadowHandEnvCfg,
    build_repose_cube,
)


@configclass
class AllegroHandSceneCfg(InteractiveSceneCfg):
    robot = ALLEGRO_HAND_CFG
    object = RigidObjectCfg(
        model=build_repose_cube,
        init_state=RigidObjectInitStateCfg(pos=(0.01, 0.0, 0.58)),
    )


@configclass
class AllegroHandEnvCfg(ShadowHandEnvCfg):
    """Reference AllegroHandEnvCfg (direct/allegro_hand)."""

    action_space: int = 16
    observation_space: int = 3 * 16 + 21
    scene: AllegroHandSceneCfg = AllegroHandSceneCfg(
        num_envs=8192, env_spacing=0.75
    )
    fall_dist: float = 0.24


class AllegroHandEnv(ShadowHandEnv):
    cfg: AllegroHandEnvCfg
