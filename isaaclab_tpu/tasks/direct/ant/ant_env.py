"""Direct-workflow Ant (reference ``direct/ant/ant_env.py``): run-toward-
target MuJoCo ant on the shared direct locomotion base."""

from __future__ import annotations

from ....assets_presets.ant import ANT_CFG
from ....scene import InteractiveSceneCfg
from ....utils.configclass import configclass
from ..locomotion import LocomotionDirectEnv, LocomotionDirectEnvCfg


@configclass
class AntDirectSceneCfg(InteractiveSceneCfg):
    robot = ANT_CFG


@configclass
class AntDirectEnvCfg(LocomotionDirectEnvCfg):
    """Reference AntEnvCfg (direct/ant/ant_env.py)."""

    decimation: int = 2
    episode_length_s: float = 15.0
    action_space: int = 8
    observation_space: int = 28  # 12 base + 2*8 joints (+8 actions) see below
    scene: AntDirectSceneCfg = AntDirectSceneCfg(num_envs=4096, env_spacing=4.0)
    joint_gears: list = [15.0] * 8
    heading_weight: float = 0.5
    up_weight: float = 0.1
    energy_cost_scale: float = 0.05
    actions_cost_scale: float = 0.005
    alive_reward_scale: float = 0.5
    dof_vel_scale: float = 0.2
    death_cost: float = -2.0
    termination_height: float = 0.31

    def __post_init__(self):
        self.sim.dt = 1 / 120.0
        # obs: z(1) lin_vel(3) ang_vel(3) yaw/roll/angle(3) up/heading(2)
        #      jp(8) jv(8) actions(8)
        self.observation_space = 1 + 3 + 3 + 3 + 2 + 8 + 8 + 8


class AntDirectEnv(LocomotionDirectEnv):
    cfg: AntDirectEnvCfg
