"""Anymal-C navigation task (reference
``manager_based/navigation/config/anymal_c/navigation_env_cfg.py``): reach a
commanded 2D pose using a frozen low-level locomotion policy driven by
base-velocity commands (hierarchical control)."""

import math

from isaaclab_tpu.assets_presets.anymal import ANYMAL_C_CFG
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
from isaaclab_tpu.sensors import ContactSensorCfg
from isaaclab_tpu.terrains import TerrainImporterCfg
from isaaclab_tpu.utils import configclass


@configclass
class NavigationSceneCfg(InteractiveSceneCfg):
    terrain = TerrainImporterCfg(terrain_type="plane")
    robot = ANYMAL_C_CFG
    contact_forces = ContactSensorCfg(prim_path="robot/.*")


@configclass
class CommandsCfg:
    pose_command = mdp.UniformPose2dCommandCfg(
        asset_name="robot",
        resampling_time_range=(8.0, 8.0),
        simple_heading=False,
        ranges=mdp.UniformPose2dCommandCfg.Ranges(
            pos_x=(-3.0, 3.0), pos_y=(-3.0, 3.0), heading=(-math.pi, math.pi)
        ),
    )


@configclass
class ActionsCfg:
    pre_trained_policy_action = mdp.PreTrainedPolicyActionCfg(
        asset_name="robot",
        policy_path="",  # set to a trained flat-anymal checkpoint to deploy
        low_level_action_scale=0.5,
    )


@configclass
class ObservationsCfg:
    @configclass
    class PolicyCfg(ObsGroup):
        base_lin_vel = ObsTerm(func=mdp.base_lin_vel)
        projected_gravity = ObsTerm(func=mdp.projected_gravity)
        pose_command = ObsTerm(
            func=mdp.generated_commands, params={"command_name": "pose_command"}
        )

        def __post_init__(self):
            self.enable_corruption = False
            self.concatenate_terms = True

    policy: PolicyCfg = PolicyCfg()


@configclass
class EventCfg:
    reset_base = EventTerm(
        func=mdp.reset_root_state_uniform,
        mode="reset",
        params={
            "pose_range": {"x": (-0.5, 0.5), "y": (-0.5, 0.5), "yaw": (-3.14, 3.14)},
            "velocity_range": {},
        },
    )


@configclass
class RewardsCfg:
    """Reference navigation_env_cfg rewards."""

    termination_penalty = RewTerm(func=mdp.is_terminated, weight=-400.0)
    position_tracking = RewTerm(
        func=mdp.position_command_error_tanh_2d,
        weight=0.5,
        params={"std": 2.0, "command_name": "pose_command"},
    )
    position_tracking_fine_grained = RewTerm(
        func=mdp.position_command_error_tanh_2d,
        weight=0.5,
        params={"std": 0.2, "command_name": "pose_command"},
    )
    orientation_tracking = RewTerm(
        func=mdp.heading_command_error_abs,
        weight=-0.2,
        params={"command_name": "pose_command"},
    )


@configclass
class TerminationsCfg:
    time_out = DoneTerm(func=mdp.time_out, time_out=True)
    base_contact = DoneTerm(
        func=mdp.illegal_contact,
        params={
            "sensor_cfg": SceneEntityCfg("contact_forces", body_names="base"),
            "threshold": 1.0,
        },
    )


@configclass
class NavigationEnvCfg(ManagerBasedRLEnvCfg):
    scene: NavigationSceneCfg = NavigationSceneCfg(num_envs=4096, env_spacing=2.5)
    commands: CommandsCfg = CommandsCfg()
    actions: ActionsCfg = ActionsCfg()
    observations: ObservationsCfg = ObservationsCfg()
    events: EventCfg = EventCfg()
    rewards: RewardsCfg = RewardsCfg()
    terminations: TerminationsCfg = TerminationsCfg()

    def __post_init__(self):
        self.decimation = 4
        self.episode_length_s = 10.0
        self.sim.dt = 0.005


@configclass
class NavigationEnvCfg_PLAY(NavigationEnvCfg):
    def __post_init__(self):
        super().__post_init__()
        self.scene.num_envs = 50
