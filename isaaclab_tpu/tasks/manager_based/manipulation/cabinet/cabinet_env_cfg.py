"""Franka open-drawer task (reference
``manipulation/cabinet/cabinet_env_cfg.py`` + ``config/franka/joint_pos_env_cfg.py``):
approach the drawer handle and pull it open. The sektion cabinet USD becomes a
programmatic fixed-base articulation with one prismatic drawer joint."""

import numpy as np

from isaaclab_tpu.actuators import ImplicitActuatorCfg
from isaaclab_tpu.assets import ArticulationCfg, ArticulationInitStateCfg
from isaaclab_tpu.assets_presets.franka import FRANKA_PANDA_CFG
from isaaclab_tpu.envs import ManagerBasedRLEnvCfg
from isaaclab_tpu.managers import (
    EventTermCfg as EventTerm,
    ObservationGroupCfg as ObsGroup,
    ObservationTermCfg as ObsTerm,
    RewardTermCfg as RewTerm,
    SceneEntityCfg,
    TerminationTermCfg as DoneTerm,
)
from isaaclab_tpu.physics.model import (
    GEOM_BOX,
    JOINT_FIXED,
    JOINT_PRISMATIC,
    ModelBuilder,
)
from isaaclab_tpu.scene import InteractiveSceneCfg
from isaaclab_tpu.utils import configclass
from isaaclab_tpu.utils.noise import UniformNoiseCfg as Unoise

from . import mdp


def build_cabinet_model():
    """Fixed-base cabinet with one prismatic drawer (reference sektion
    cabinet's top drawer joint)."""
    b = ModelBuilder("cabinet")
    frame = b.add_body(
        "sektion", -1, JOINT_FIXED,
        mass=20.0, inertia=np.diag([1.0, 1.0, 1.0]),
    )
    b.add_geom(frame, GEOM_BOX, (0.3, 0.4, 0.4), pos=(0, 0, 0.4))
    drawer = b.add_body(
        "drawer", frame, JOINT_PRISMATIC, jnt_axis=(-1, 0, 0),
        jnt_pos=(0.0, 0.0, 0.6),
        mass=2.0, inertia=np.diag([0.02, 0.02, 0.02]),
        jnt_name="drawer_joint", limits=(0.0, 0.4),
        effort_limit=40.0, velocity_limit=1.0,
    )
    b.add_geom(drawer, GEOM_BOX, (0.28, 0.35, 0.08), friction=0.4)
    # handle bar sticking out of the drawer front
    b.add_geom(drawer, GEOM_BOX, (0.01, 0.08, 0.01), pos=(-0.305, 0.0, 0.01),
               friction=1.0, name="drawer_handle")
    return b.build()


CABINET_CFG = ArticulationCfg(
    model=build_cabinet_model,
    init_state=ArticulationInitStateCfg(
        pos=(0.85, 0.0, 0.0),
        joint_pos={"drawer_joint": 0.0},
    ),
    actuators={
        # friction-like drawer damping; no active drive
        "drawers": ImplicitActuatorCfg(
            joint_names_expr=["drawer_joint"],
            stiffness=0.0,
            damping=6.0,
        )
    },
)


@configclass
class CabinetSceneCfg(InteractiveSceneCfg):
    robot = FRANKA_PANDA_CFG
    cabinet = CABINET_CFG


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
        joint_pos = ObsTerm(
            func=mdp.joint_pos_rel, noise=Unoise(n_min=-0.01, n_max=0.01),
            params={"asset_cfg": SceneEntityCfg("robot")},
        )
        joint_vel = ObsTerm(
            func=mdp.joint_vel_rel, noise=Unoise(n_min=-0.01, n_max=0.01),
            params={"asset_cfg": SceneEntityCfg("robot")},
        )
        cabinet_joint_pos = ObsTerm(func=mdp.cabinet_joint_pos)
        cabinet_joint_vel = ObsTerm(func=mdp.cabinet_joint_vel)
        rel_ee_drawer_distance = ObsTerm(func=mdp.rel_ee_drawer_distance)
        actions = ObsTerm(func=mdp.last_action)

        def __post_init__(self):
            self.enable_corruption = True
            self.concatenate_terms = True

    policy: PolicyCfg = PolicyCfg()


@configclass
class EventCfg:
    reset_robot_joints = EventTerm(
        func=mdp.reset_joints_by_scale,
        mode="reset",
        params={"position_range": (0.9, 1.1), "velocity_range": (0.0, 0.0)},
    )


@configclass
class RewardsCfg:
    """Reference cabinet/mdp/rewards.py reward structure."""

    approach_ee_handle = RewTerm(
        func=mdp.approach_ee_handle, weight=2.0, params={"threshold": 0.2}
    )
    align_ee_handle = RewTerm(func=mdp.align_ee_handle, weight=0.5)
    open_drawer_bonus = RewTerm(func=mdp.open_drawer_bonus, weight=7.5)
    multi_stage_open_drawer = RewTerm(
        func=mdp.multi_stage_open_drawer, weight=1.0
    )
    action_rate = RewTerm(func=mdp.action_rate_l2, weight=-0.01)
    joint_vel = RewTerm(
        func=mdp.joint_vel_l2, weight=-0.0001,
        params={"asset_cfg": SceneEntityCfg("robot")},
    )


@configclass
class TerminationsCfg:
    time_out = DoneTerm(func=mdp.time_out, time_out=True)


@configclass
class FrankaCabinetEnvCfg(ManagerBasedRLEnvCfg):
    scene: CabinetSceneCfg = CabinetSceneCfg(num_envs=4096, env_spacing=2.0)
    observations: ObservationsCfg = ObservationsCfg()
    actions: ActionsCfg = ActionsCfg()
    events: EventCfg = EventCfg()
    rewards: RewardsCfg = RewardsCfg()
    terminations: TerminationsCfg = TerminationsCfg()

    def __post_init__(self):
        self.decimation = 2
        self.episode_length_s = 8.0
        self.sim.dt = 1.0 / 60.0
