"""GR1T2 humanoid pick-place (reference
``manager_based/manipulation/pick_place/pickplace_gr1t2_env_cfg.py``,
``Isaac-PickPlace-GR1T2-Abs-v0``): a Fourier GR1T2 with dexterous hands
moves a cylinder across the packing table. Teleop/imitation task (no
rewards); dual-arm absolute-pose IK action (the reference's pink QP IK is
the in-repo multi-frame DLS controller, controllers/pink_ik.py)."""

import numpy as np

from isaaclab_tpu.assets import (
    ArticulationCfg,
    ArticulationInitStateCfg,
    RigidObjectCfg,
    RigidObjectInitStateCfg,
)
from isaaclab_tpu.assets_presets.fourier import GR1T2_CFG
from isaaclab_tpu.controllers import FrameTaskCfg, PinkIKControllerCfg
from isaaclab_tpu.envs import ManagerBasedRLEnvCfg
from isaaclab_tpu.managers import (
    EventTermCfg as EventTerm,
    ObservationGroupCfg as ObsGroup,
    ObservationTermCfg as ObsTerm,
    SceneEntityCfg,
    TerminationTermCfg as DoneTerm,
)
from isaaclab_tpu.physics.model import (
    GEOM_BOX,
    GEOM_CYLINDER,
    JOINT_FIXED,
    JOINT_FREE,
    ModelBuilder,
)
from isaaclab_tpu.scene import InteractiveSceneCfg
from isaaclab_tpu.utils import configclass

from . import mdp

# table top height implied by the reference object spawn
# (z=1.0413 minus cylinder half-height 0.175)
_TABLE_TOP = 0.8663


def _build_object():
    b = ModelBuilder("object")
    body = b.add_body(
        "object", -1, JOINT_FREE, mass=0.3,
        inertia=np.diag([
            0.3 * (3 * 0.018**2 + 0.35**2) / 12.0,
            0.3 * (3 * 0.018**2 + 0.35**2) / 12.0,
            0.3 * 0.018**2 / 2.0,
        ]),
    )
    b.add_geom(body, GEOM_CYLINDER, (0.018, 0.175), friction=0.9,
               rgba=(0.15, 0.15, 0.15, 1.0))
    return b.build()


def _build_packing_table():
    b = ModelBuilder("packing_table")
    base = b.add_body("packing_table", -1, JOINT_FIXED, mass=50.0,
                      inertia=np.eye(3))
    b.add_geom(base, GEOM_BOX, (0.9, 0.4, _TABLE_TOP / 2),
               pos=(0.0, 0.0, _TABLE_TOP / 2), friction=0.9,
               rgba=(0.55, 0.42, 0.30, 1.0))
    return b.build()


@configclass
class ObjectTableSceneCfg(InteractiveSceneCfg):
    """Reference ObjectTableSceneCfg (robot faces +y toward the table)."""

    packing_table = ArticulationCfg(
        model=_build_packing_table,
        init_state=ArticulationInitStateCfg(pos=(0.0, 0.55, 0.0)),
        actuators={},
    )
    object = RigidObjectCfg(
        model=_build_object,
        init_state=RigidObjectInitStateCfg(pos=(-0.35, 0.40, 1.0413)),
    )
    robot = GR1T2_CFG


@configclass
class ActionsCfg:
    """Dual-arm absolute IK + hands (reference PinkInverseKinematicsActionCfg)."""

    pink_ik_cfg = mdp.PinkInverseKinematicsActionCfg(
        asset_name="robot",
        pink_controlled_joint_names=[
            "left_shoulder_pitch_joint", "left_shoulder_roll_joint",
            "left_shoulder_yaw_joint", "left_elbow_pitch_joint",
            "left_wrist_yaw_joint", "left_wrist_roll_joint",
            "left_wrist_pitch_joint",
            "right_shoulder_pitch_joint", "right_shoulder_roll_joint",
            "right_shoulder_yaw_joint", "right_elbow_pitch_joint",
            "right_wrist_yaw_joint", "right_wrist_roll_joint",
            "right_wrist_pitch_joint",
        ],
        hand_joint_names=[
            "L_index_proximal_joint", "L_middle_proximal_joint",
            "L_pinky_proximal_joint", "L_ring_proximal_joint",
            "L_thumb_proximal_yaw_joint",
            "R_index_proximal_joint", "R_middle_proximal_joint",
            "R_pinky_proximal_joint", "R_ring_proximal_joint",
            "R_thumb_proximal_yaw_joint",
            "L_index_intermediate_joint", "L_middle_intermediate_joint",
            "L_pinky_intermediate_joint", "L_ring_intermediate_joint",
            "L_thumb_proximal_pitch_joint",
            "R_index_intermediate_joint", "R_middle_intermediate_joint",
            "R_pinky_intermediate_joint", "R_ring_intermediate_joint",
            "R_thumb_proximal_pitch_joint",
            "L_thumb_distal_joint", "R_thumb_distal_joint",
        ],
        controller=PinkIKControllerCfg(
            articulation_name="robot",
            base_link_name="base_link",
            num_hand_joints=22,
            show_ik_warnings=False,
            variable_input_tasks=[
                FrameTaskCfg(
                    frame="left_hand_pitch_link",
                    position_cost=1.0, orientation_cost=1.0,
                    lm_damping=10.0, gain=0.1,
                ),
                FrameTaskCfg(
                    frame="right_hand_pitch_link",
                    position_cost=1.0, orientation_cost=1.0,
                    lm_damping=10.0, gain=0.1,
                ),
            ],
        ),
    )


@configclass
class ObservationsCfg:
    @configclass
    class PolicyCfg(ObsGroup):
        actions = ObsTerm(func=mdp.last_action)
        robot_joint_pos = ObsTerm(
            func=mdp.joint_pos, params={"asset_cfg": SceneEntityCfg("robot")}
        )
        robot_root_pos = ObsTerm(
            func=mdp.root_pos_w, params={"asset_cfg": SceneEntityCfg("robot")}
        )
        robot_root_rot = ObsTerm(
            func=mdp.root_quat_w, params={"asset_cfg": SceneEntityCfg("robot")}
        )
        object_pos = ObsTerm(
            func=mdp.root_pos_w, params={"asset_cfg": SceneEntityCfg("object")}
        )
        object_rot = ObsTerm(
            func=mdp.root_quat_w, params={"asset_cfg": SceneEntityCfg("object")}
        )
        robot_links_state = ObsTerm(func=mdp.get_all_robot_link_state)
        left_eef_pos = ObsTerm(func=mdp.get_left_eef_pos)
        left_eef_quat = ObsTerm(func=mdp.get_left_eef_quat)
        right_eef_pos = ObsTerm(func=mdp.get_right_eef_pos)
        right_eef_quat = ObsTerm(func=mdp.get_right_eef_quat)
        hand_joint_state = ObsTerm(func=mdp.get_hand_state)
        head_joint_state = ObsTerm(func=mdp.get_head_state)
        object = ObsTerm(func=mdp.object_obs)

        def __post_init__(self):
            self.enable_corruption = False
            self.concatenate_terms = False

    policy: PolicyCfg = PolicyCfg()


@configclass
class TerminationsCfg:
    time_out = DoneTerm(func=mdp.time_out, time_out=True)
    object_dropping = DoneTerm(
        func=mdp.root_height_below_minimum,
        params={"minimum_height": 0.5, "asset_cfg": SceneEntityCfg("object")},
    )
    success = DoneTerm(func=mdp.task_done, params={})


@configclass
class EventCfg:
    reset_all = EventTerm(func=mdp.reset_scene_to_default, mode="reset", params={})
    reset_object = EventTerm(
        func=mdp.reset_root_state_uniform,
        mode="reset",
        params={
            "pose_range": {"x": (-0.05, 0.0), "y": (0.0, 0.05)},
            "velocity_range": {},
            "asset_cfg": SceneEntityCfg("object"),
        },
    )


@configclass
class PickPlaceGR1T2EnvCfg(ManagerBasedRLEnvCfg):
    """Reference ``PickPlaceGR1T2EnvCfg``."""

    scene: ObjectTableSceneCfg = ObjectTableSceneCfg(num_envs=1, env_spacing=2.5)
    observations: ObservationsCfg = ObservationsCfg()
    actions: ActionsCfg = ActionsCfg()
    terminations: TerminationsCfg = TerminationsCfg()
    events: EventCfg = EventCfg()
    commands = None
    rewards = None
    curriculum = None

    def __post_init__(self):
        self.decimation = 5
        self.episode_length_s = 20.0
        self.sim.dt = 0.01
