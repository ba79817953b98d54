"""Direct-workflow Humanoid (reference ``direct/humanoid/humanoid_env.py``)."""

from __future__ import annotations

from ....assets_presets.humanoid import HUMANOID_CFG
from ....scene import InteractiveSceneCfg
from ....utils.configclass import configclass
from ..locomotion import LocomotionDirectEnv, LocomotionDirectEnvCfg

# per-joint gearing, model order: abdomen(3), right leg(5), left leg(5),
# right arm(3), left arm(3) — 19 dof (reference humanoid uses the same
# gear-scaled effort actuation, humanoid_env.py joint_gears)
_GEARS = (
    [67.5, 67.5, 67.5]
    + [45.0, 45.0, 135.0, 90.0, 60.0] * 2
    + [67.5, 67.5, 45.0] * 2
)


@configclass
class HumanoidDirectSceneCfg(InteractiveSceneCfg):
    robot = HUMANOID_CFG


@configclass
class HumanoidDirectEnvCfg(LocomotionDirectEnvCfg):
    """Reference HumanoidEnvCfg."""

    decimation: int = 2
    episode_length_s: float = 15.0
    action_space: int = 19
    observation_space: int = 0  # set in __post_init__
    scene: HumanoidDirectSceneCfg = HumanoidDirectSceneCfg(
        num_envs=4096, env_spacing=4.0
    )
    joint_gears: list = _GEARS
    heading_weight: float = 0.5
    up_weight: float = 0.1
    energy_cost_scale: float = 0.05
    actions_cost_scale: float = 0.01
    alive_reward_scale: float = 2.0
    dof_vel_scale: float = 0.1
    death_cost: float = -1.0
    termination_height: float = 0.8
    angular_velocity_scale: float = 0.25

    def __post_init__(self):
        self.sim.dt = 1 / 120.0
        self.observation_space = 1 + 3 + 3 + 3 + 2 + 19 + 19 + 19


class HumanoidDirectEnv(LocomotionDirectEnv):
    cfg: HumanoidDirectEnvCfg
