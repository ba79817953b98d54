"""Reach task variants (reference ``manipulation/reach/config/``): UR10
joint-position reach, Franka IK-relative reach, Franka OSC reach."""

from isaaclab_tpu.assets_presets.universal_robots import UR10_CFG
from isaaclab_tpu.controllers import (
    DifferentialIKControllerCfg,
    OperationalSpaceControllerCfg,
)
from isaaclab_tpu.envs import mdp
from isaaclab_tpu.managers import SceneEntityCfg
from isaaclab_tpu.utils import configclass

from .reach_env_cfg import FrankaReachEnvCfg


@configclass
class UR10ReachEnvCfg(FrankaReachEnvCfg):
    """Reference ``config/ur_10/joint_pos_env_cfg.py``."""

    def __post_init__(self):
        super().__post_init__()
        self.scene.robot = UR10_CFG
        self.actions.arm_action = mdp.JointPositionActionCfg(
            asset_name="robot", joint_names=[".*"], scale=0.5,
            use_default_offset=True,
        )
        self.commands.ee_pose.body_name = "wrist_3_link"
        ee = SceneEntityCfg("robot", body_names=["wrist_3_link"])
        self.rewards.end_effector_position_tracking.params["asset_cfg"] = ee
        self.rewards.end_effector_position_tracking_fine_grained.params[
            "asset_cfg"
        ] = ee
        self.rewards.end_effector_orientation_tracking.params["asset_cfg"] = ee


@configclass
class FrankaReachIKRelEnvCfg(FrankaReachEnvCfg):
    """Reference ``config/franka/ik_rel_env_cfg.py``: 6d delta-pose action
    resolved through damped-least-squares differential IK."""

    def __post_init__(self):
        super().__post_init__()
        self.actions.arm_action = mdp.DifferentialInverseKinematicsActionCfg(
            asset_name="robot",
            joint_names=["panda_joint.*"],
            body_name="panda_hand",
            controller=DifferentialIKControllerCfg(
                command_type="pose", use_relative_mode=True, ik_method="dls"
            ),
            scale=0.5,
        )


@configclass
class FrankaReachOSCEnvCfg(FrankaReachEnvCfg):
    """Reference ``config/franka/osc_env_cfg.py``: task-space impedance."""

    def __post_init__(self):
        super().__post_init__()
        self.actions.arm_action = mdp.OperationalSpaceControllerActionCfg(
            asset_name="robot",
            joint_names=["panda_joint.*"],
            body_name="panda_hand",
            controller=OperationalSpaceControllerCfg(
                target_types=["pose_rel"],
                impedance_mode="fixed",
                motion_stiffness_task=300.0,
                motion_damping_ratio_task=1.0,
                nullspace_control="position",
            ),
        )


@configclass
class FrankaReachIKAbsEnvCfg(FrankaReachEnvCfg):
    """Reference ``config/franka/ik_abs_env_cfg.py``: absolute 7d pose action
    (position + wxyz quaternion) resolved through DLS differential IK."""

    def __post_init__(self):
        super().__post_init__()
        self.actions.arm_action = mdp.DifferentialInverseKinematicsActionCfg(
            asset_name="robot",
            joint_names=["panda_joint.*"],
            body_name="panda_hand",
            controller=DifferentialIKControllerCfg(
                command_type="pose", use_relative_mode=False, ik_method="dls"
            ),
        )


@configclass
class FrankaReachEnvCfg_PLAY(FrankaReachEnvCfg):
    def __post_init__(self):
        super().__post_init__()
        self.scene.num_envs = 50
        self.observations.policy.enable_corruption = False


@configclass
class FrankaReachOSCEnvCfg_PLAY(FrankaReachOSCEnvCfg):
    def __post_init__(self):
        super().__post_init__()
        self.scene.num_envs = 50
        self.observations.policy.enable_corruption = False


@configclass
class UR10ReachEnvCfg_PLAY(UR10ReachEnvCfg):
    def __post_init__(self):
        super().__post_init__()
        self.scene.num_envs = 50
        self.observations.policy.enable_corruption = False
