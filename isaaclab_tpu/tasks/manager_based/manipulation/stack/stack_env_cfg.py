"""Franka cube-stacking task (reference
``manager_based/manipulation/stack/stack_env_cfg.py`` +
``config/franka/stack_joint_pos_env_cfg.py``): three cubes on a table, no
reward terms — the task exists for teleop demo recording, mimic data
generation, and scripted policies; subtask-signal observations (grasped /
stacked) drive MimicGen segment detection.

TPU notes: the cubes are three free-joint box entities merged into the world
model; cube-cube and cube-gripper interaction runs through the 16-candidate
box-box corner narrowphase (physics/collision.py:box_box_contacts). The
dict-structured observation groups (``concatenate_terms=False``) exercise the
non-concatenated group path of the observation manager.
"""

import numpy as np

from isaaclab_tpu.assets import RigidObjectCfg, RigidObjectInitStateCfg
from isaaclab_tpu.assets_presets.franka import FRANKA_PANDA_CFG
from isaaclab_tpu.envs import ManagerBasedRLEnvCfg
from isaaclab_tpu.managers import (
    EventTermCfg as EventTerm,
    ObservationGroupCfg as ObsGroup,
    ObservationTermCfg as ObsTerm,
    SceneEntityCfg,
    TerminationTermCfg as DoneTerm,
)
from isaaclab_tpu.physics.model import GEOM_BOX, JOINT_FREE, ModelBuilder
from isaaclab_tpu.scene import InteractiveSceneCfg
from isaaclab_tpu.sensors.frame_transformer import (
    FrameTransformerCfg,
    FrameTransformerFrameCfg,
    OffsetCfg,
)
from isaaclab_tpu.utils import configclass

from . import mdp

# Reference blocks (DexCube, ~4.06 cm side; stacked height step 0.0468 in the
# subtask thresholds) — one free-joint box per cube.
CUBE_HALF = 0.0203
CUBE_MASS = 0.05


def _build_cube_model(name):
    def build():
        b = ModelBuilder(name)
        body = b.add_body(
            name, -1, JOINT_FREE, mass=CUBE_MASS,
            inertia=np.eye(3) * (CUBE_MASS * (2 * CUBE_HALF) ** 2 / 6.0),
        )
        b.add_geom(body, GEOM_BOX, (CUBE_HALF, CUBE_HALF, CUBE_HALF), friction=1.5)
        return b.build()

    return build


@configclass
class StackSceneCfg(InteractiveSceneCfg):
    """Reference ``ObjectTableSceneCfg``: robot + 3 cubes + EE frame sensor.
    The table top is the ground plane (z=0)."""

    robot = FRANKA_PANDA_CFG
    cube_1 = RigidObjectCfg(
        model=_build_cube_model("cube_1"),
        init_state=RigidObjectInitStateCfg(pos=(0.4, 0.0, CUBE_HALF)),
    )
    cube_2 = RigidObjectCfg(
        model=_build_cube_model("cube_2"),
        init_state=RigidObjectInitStateCfg(pos=(0.55, 0.05, CUBE_HALF)),
    )
    cube_3 = RigidObjectCfg(
        model=_build_cube_model("cube_3"),
        init_state=RigidObjectInitStateCfg(pos=(0.60, -0.1, CUBE_HALF)),
    )
    ee_frame = FrameTransformerCfg(
        prim_path="robot/panda_link1",
        target_frames=[
            FrameTransformerFrameCfg(
                prim_path="robot/panda_hand",
                name="end_effector",
                offset=OffsetCfg(pos=(0.0, 0.0, 0.1034)),
            ),
            FrameTransformerFrameCfg(
                prim_path="robot/panda_rightfinger",
                name="tool_rightfinger",
                offset=OffsetCfg(pos=(0.0, 0.0, 0.046)),
            ),
            FrameTransformerFrameCfg(
                prim_path="robot/panda_leftfinger",
                name="tool_leftfinger",
                offset=OffsetCfg(pos=(0.0, 0.0, 0.046)),
            ),
        ],
    )


@configclass
class ActionsCfg:
    """Joint-position arm + binary gripper (reference stack_joint_pos_env_cfg)."""

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
        """Dict-structured state observations (reference PolicyCfg)."""

        actions = ObsTerm(func=mdp.last_action)
        joint_pos = ObsTerm(func=mdp.joint_pos_rel)
        joint_vel = ObsTerm(func=mdp.joint_vel_rel)
        object = ObsTerm(func=mdp.object_obs)
        cube_positions = ObsTerm(func=mdp.cube_positions_in_world_frame)
        cube_orientations = ObsTerm(func=mdp.cube_orientations_in_world_frame)
        eef_pos = ObsTerm(func=mdp.ee_frame_pos)
        eef_quat = ObsTerm(func=mdp.ee_frame_quat)
        gripper_pos = ObsTerm(func=mdp.gripper_pos)

        def __post_init__(self):
            self.enable_corruption = False
            self.concatenate_terms = False

    @configclass
    class SubtaskCfg(ObsGroup):
        """Mimic subtask boundary signals (reference SubtaskCfg)."""

        grasp_1 = ObsTerm(
            func=mdp.object_grasped,
            params={
                "robot_cfg": SceneEntityCfg("robot"),
                "ee_frame_cfg": SceneEntityCfg("ee_frame"),
                "object_cfg": SceneEntityCfg("cube_2"),
            },
        )
        stack_1 = ObsTerm(
            func=mdp.object_stacked,
            params={
                "robot_cfg": SceneEntityCfg("robot"),
                "upper_object_cfg": SceneEntityCfg("cube_2"),
                "lower_object_cfg": SceneEntityCfg("cube_1"),
            },
        )
        grasp_2 = ObsTerm(
            func=mdp.object_grasped,
            params={
                "robot_cfg": SceneEntityCfg("robot"),
                "ee_frame_cfg": SceneEntityCfg("ee_frame"),
                "object_cfg": SceneEntityCfg("cube_3"),
            },
        )

        def __post_init__(self):
            self.enable_corruption = False
            self.concatenate_terms = False

    policy: PolicyCfg = PolicyCfg()
    subtask_terms: SubtaskCfg = SubtaskCfg()


@configclass
class TerminationsCfg:
    time_out = DoneTerm(func=mdp.time_out, time_out=True)
    cube_1_dropping = DoneTerm(
        func=mdp.root_height_below_minimum,
        params={"minimum_height": -0.05, "asset_cfg": SceneEntityCfg("cube_1")},
    )
    cube_2_dropping = DoneTerm(
        func=mdp.root_height_below_minimum,
        params={"minimum_height": -0.05, "asset_cfg": SceneEntityCfg("cube_2")},
    )
    cube_3_dropping = DoneTerm(
        func=mdp.root_height_below_minimum,
        params={"minimum_height": -0.05, "asset_cfg": SceneEntityCfg("cube_3")},
    )
    success = DoneTerm(func=mdp.cubes_stacked, params={})


@configclass
class EventCfg:
    """Reference ``config/franka/stack_joint_pos_env_cfg.py:EventCfg``."""

    init_franka_arm_pose = EventTerm(
        func=mdp.set_default_joint_pose,
        mode="startup",
        params={
            "default_pose": [
                0.0444, -0.1894, -0.1107, -2.5148, 0.0044, 2.3775, 0.6952,
                0.0400, 0.0400,
            ],
        },
    )
    randomize_franka_joint_state = EventTerm(
        func=mdp.randomize_joint_by_gaussian_offset,
        mode="reset",
        params={"mean": 0.0, "std": 0.02, "asset_cfg": SceneEntityCfg("robot")},
    )
    randomize_cube_positions = EventTerm(
        func=mdp.randomize_object_pose,
        mode="reset",
        params={
            "pose_range": {
                "x": (0.4, 0.6), "y": (-0.10, 0.10),
                "z": (CUBE_HALF, CUBE_HALF), "yaw": (-1.0, 1.0),
            },
            "min_separation": 0.1,
            "asset_cfgs": [
                SceneEntityCfg("cube_1"),
                SceneEntityCfg("cube_2"),
                SceneEntityCfg("cube_3"),
            ],
        },
    )


@configclass
class StackEnvCfg(ManagerBasedRLEnvCfg):
    """Reference ``StackEnvCfg`` + the Franka joint-pos config merged (the
    TPU build has exactly one robot preset path, so the base class is
    concrete)."""

    scene: StackSceneCfg = StackSceneCfg(num_envs=64, env_spacing=2.5)
    observations: ObservationsCfg = ObservationsCfg()
    actions: ActionsCfg = ActionsCfg()
    terminations: TerminationsCfg = TerminationsCfg()
    events: EventCfg = EventCfg()
    commands = None
    rewards = None
    curriculum = None

    def __post_init__(self):
        self.decimation = 5
        self.episode_length_s = 30.0
        self.sim.dt = 0.01  # 100 Hz (reference stack_env_cfg.py:192)


FrankaCubeStackEnvCfg = StackEnvCfg
