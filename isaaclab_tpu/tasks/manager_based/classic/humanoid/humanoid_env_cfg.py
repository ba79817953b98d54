"""Humanoid locomotion task (reference
``manager_based/classic/humanoid/humanoid_env_cfg.py``): same structure as
Ant with humanoid gear ratios."""

from isaaclab_tpu.assets_presets.humanoid import HUMANOID_CFG
from isaaclab_tpu.envs import ManagerBasedRLEnvCfg, mdp
from isaaclab_tpu.managers import (
    EventTermCfg as EventTerm,
    ObservationGroupCfg as ObsGroup,
    ObservationTermCfg as ObsTerm,
    RewardTermCfg as RewTerm,
    SceneEntityCfg,
    TerminationTermCfg as DoneTerm,
)
from isaaclab_tpu.scene import InteractiveSceneCfg
from isaaclab_tpu.terrains import TerrainImporterCfg
from isaaclab_tpu.utils import configclass

_GEARS = {
    "abdomen.*": 67.5,
    ".*_hip_.*": 45.0,
    ".*_knee": 90.0,
    ".*_ankle": 22.5,
    ".*_shoulder.*": 67.5,
    ".*_elbow": 45.0,
}


@configclass
class MySceneCfg(InteractiveSceneCfg):
    terrain = TerrainImporterCfg(terrain_type="plane")
    robot = HUMANOID_CFG


@configclass
class ActionsCfg:
    joint_effort = mdp.JointEffortActionCfg(
        asset_name="robot", joint_names=[".*"], scale=1.0, offset=0.0
    )


@configclass
class ObservationsCfg:
    @configclass
    class PolicyCfg(ObsGroup):
        base_height = ObsTerm(func=mdp.base_pos_z)
        base_lin_vel = ObsTerm(func=mdp.base_lin_vel)
        base_ang_vel = ObsTerm(func=mdp.base_ang_vel, scale=0.25)
        base_yaw_roll = ObsTerm(func=mdp.base_yaw_roll)
        base_angle_to_target = ObsTerm(
            func=mdp.base_angle_to_target, params={"target_pos": (1000.0, 0.0, 0.0)}
        )
        base_up_proj = ObsTerm(func=mdp.base_up_proj)
        base_heading_proj = ObsTerm(
            func=mdp.base_heading_proj, params={"target_pos": (1000.0, 0.0, 0.0)}
        )
        joint_pos_norm = ObsTerm(func=mdp.joint_pos_limit_normalized)
        joint_vel_rel = ObsTerm(func=mdp.joint_vel_rel, scale=0.1)
        actions = ObsTerm(func=mdp.last_action)

        def __post_init__(self):
            self.enable_corruption = False
            self.concatenate_terms = True

    policy: PolicyCfg = PolicyCfg()


@configclass
class EventCfg:
    reset_base = EventTerm(
        func=mdp.reset_root_state_uniform,
        mode="reset",
        params={"pose_range": {}, "velocity_range": {}},
    )
    reset_robot_joints = EventTerm(
        func=mdp.reset_joints_by_offset,
        mode="reset",
        params={"position_range": (-0.2, 0.2), "velocity_range": (-0.1, 0.1)},
    )


@configclass
class RewardsCfg:
    progress = RewTerm(
        func=mdp.progress_reward, weight=1.0, params={"target_pos": (1000.0, 0.0, 0.0)}
    )
    alive = RewTerm(func=mdp.is_alive, weight=2.0)
    upright = RewTerm(
        func=mdp.upright_posture_bonus, weight=0.1, params={"threshold": 0.93}
    )
    move_to_target = RewTerm(
        func=mdp.move_to_target_bonus,
        weight=0.5,
        params={"threshold": 0.8, "target_pos": (1000.0, 0.0, 0.0)},
    )
    action_l2 = RewTerm(func=mdp.action_l2, weight=-0.01)
    energy = RewTerm(
        func=mdp.power_consumption, weight=-0.005, params={"gear_ratio": _GEARS}
    )
    joint_pos_limits = RewTerm(
        func=mdp.joint_pos_limits_penalty_ratio,
        weight=-0.25,
        params={"threshold": 0.98, "gear_ratio": _GEARS},
    )


@configclass
class TerminationsCfg:
    time_out = DoneTerm(func=mdp.time_out, time_out=True)
    torso_height = DoneTerm(
        func=mdp.root_height_below_minimum, params={"minimum_height": 0.8}
    )


@configclass
class HumanoidEnvCfg(ManagerBasedRLEnvCfg):
    scene: MySceneCfg = MySceneCfg(num_envs=4096, env_spacing=5.0)
    observations: ObservationsCfg = ObservationsCfg()
    actions: ActionsCfg = ActionsCfg()
    events: EventCfg = EventCfg()
    rewards: RewardsCfg = RewardsCfg()
    terminations: TerminationsCfg = TerminationsCfg()

    def __post_init__(self):
        self.decimation = 2
        self.episode_length_s = 16.0
        self.sim.dt = 1 / 120.0
