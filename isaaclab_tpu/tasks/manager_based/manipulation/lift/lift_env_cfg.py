"""Franka cube-lift task (reference ``manipulation/lift/lift_env_cfg.py`` +
``config/franka/joint_pos_env_cfg.py``): grasp a cube and carry it to a
commanded pose. Exercises robot-object contact coupling through the merged
world solver."""

from isaaclab_tpu.assets import RigidObjectCfg, RigidObjectInitStateCfg
from isaaclab_tpu.assets_presets.franka import FRANKA_PANDA_CFG
from isaaclab_tpu.envs import ManagerBasedRLEnvCfg, mdp
from isaaclab_tpu.managers import (
    EventTermCfg as EventTerm,
    ObservationGroupCfg as ObsGroup,
    ObservationTermCfg as ObsTerm,
    RewardTermCfg as RewTerm,
    SceneEntityCfg,
    TerminationTermCfg as DoneTerm,
)
from isaaclab_tpu.physics.model import GEOM_BOX, JOINT_FREE, ModelBuilder
from isaaclab_tpu.scene import InteractiveSceneCfg
from isaaclab_tpu.utils import configclass


def build_cube_model():
    import numpy as np

    b = ModelBuilder("cube")
    body = b.add_body(
        "object", -1, JOINT_FREE, mass=0.2,
        inertia=np.eye(3) * (0.2 * 2 * 0.03**2 / 3),
    )
    b.add_geom(body, GEOM_BOX, (0.03, 0.03, 0.03), friction=1.5)
    return b.build()


@configclass
class LiftSceneCfg(InteractiveSceneCfg):
    robot = FRANKA_PANDA_CFG
    object = RigidObjectCfg(
        model=build_cube_model,
        init_state=RigidObjectInitStateCfg(pos=(0.5, 0.0, 0.03)),
    )


@configclass
class CommandsCfg:
    object_pose = mdp.UniformPoseCommandCfg(
        asset_name="robot",
        body_name="panda_hand",
        resampling_time_range=(5.0, 5.0),
        ranges=mdp.UniformPoseCommandCfg.Ranges(
            pos_x=(0.4, 0.6),
            pos_y=(-0.25, 0.25),
            pos_z=(0.25, 0.5),
        ),
    )


@configclass
class ActionsCfg:
    arm_action = mdp.JointPositionActionCfg(
        asset_name="robot", joint_names=["panda_joint.*"], scale=0.5,
        use_default_offset=True,
    )
    gripper_action = mdp.BinaryJointPositionActionCfg(
        asset_name="robot",
        joint_names=["panda_finger_joint.*"],
        open_command_expr={"panda_finger_joint.*": 0.04},
        close_command_expr={"panda_finger_joint.*": 0.0},
    )


@configclass
class ObservationsCfg:
    @configclass
    class PolicyCfg(ObsGroup):
        joint_pos = ObsTerm(func=mdp.joint_pos_rel)
        joint_vel = ObsTerm(func=mdp.joint_vel_rel)
        object_position = ObsTerm(func=mdp.object_position_in_robot_root_frame)
        target_object_position = ObsTerm(
            func=mdp.generated_commands, params={"command_name": "object_pose"}
        )
        actions = ObsTerm(func=mdp.last_action)

        def __post_init__(self):
            self.enable_corruption = False
            self.concatenate_terms = True

    policy: PolicyCfg = PolicyCfg()


@configclass
class EventCfg:
    reset_all = EventTerm(func=mdp.reset_scene_to_default, mode="reset", params={})
    reset_object_position = EventTerm(
        func=mdp.reset_root_state_uniform,
        mode="reset",
        params={
            "pose_range": {"x": (-0.1, 0.1), "y": (-0.25, 0.25), "z": (0.0, 0.0)},
            "velocity_range": {},
            "asset_cfg": SceneEntityCfg("object"),
        },
    )


@configclass
class RewardsCfg:
    reaching_object = RewTerm(
        func=mdp.object_ee_distance,
        weight=1.0,
        params={
            "std": 0.1,
            "object_cfg": SceneEntityCfg("object"),
            "ee_cfg": SceneEntityCfg("robot", body_names=["panda_hand"]),
        },
    )
    lifting_object = RewTerm(
        func=mdp.object_is_lifted,
        weight=15.0,
        params={"minimal_height": 0.06, "object_cfg": SceneEntityCfg("object")},
    )
    object_goal_tracking = RewTerm(
        func=mdp.object_goal_distance,
        weight=16.0,
        params={
            "std": 0.3,
            "minimal_height": 0.06,
            "command_name": "object_pose",
            "object_cfg": SceneEntityCfg("object"),
        },
    )
    object_goal_tracking_fine_grained = RewTerm(
        func=mdp.object_goal_distance,
        weight=5.0,
        params={
            "std": 0.05,
            "minimal_height": 0.06,
            "command_name": "object_pose",
            "object_cfg": SceneEntityCfg("object"),
        },
    )
    action_rate = RewTerm(func=mdp.action_rate_l2, weight=-1e-4)
    joint_vel = RewTerm(
        func=mdp.joint_vel_l2, weight=-1e-4,
        params={"asset_cfg": SceneEntityCfg("robot")},
    )


@configclass
class TerminationsCfg:
    time_out = DoneTerm(func=mdp.time_out, time_out=True)
    object_dropping = DoneTerm(
        func=mdp.root_height_below_minimum,
        params={"minimum_height": -0.05, "asset_cfg": SceneEntityCfg("object")},
    )


@configclass
class FrankaLiftEnvCfg(ManagerBasedRLEnvCfg):
    scene: LiftSceneCfg = LiftSceneCfg(num_envs=4096, env_spacing=2.5)
    commands: CommandsCfg = CommandsCfg()
    observations: ObservationsCfg = ObservationsCfg()
    actions: ActionsCfg = ActionsCfg()
    events: EventCfg = EventCfg()
    rewards: RewardsCfg = RewardsCfg()
    terminations: TerminationsCfg = TerminationsCfg()

    def __post_init__(self):
        self.decimation = 2
        self.episode_length_s = 5.0
        self.sim.dt = 0.01
