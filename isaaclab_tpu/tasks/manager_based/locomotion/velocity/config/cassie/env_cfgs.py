"""Agility Cassie velocity cfgs (reference ``velocity/config/cassie`` flat/rough cfgs)."""

from isaaclab_tpu.assets_presets.cassie import CASSIE_CFG
from isaaclab_tpu.managers import SceneEntityCfg
from isaaclab_tpu.terrains import TerrainImporterCfg
from isaaclab_tpu.utils import configclass

from ...velocity_env_cfg import LocomotionVelocityRoughEnvCfg


@configclass
class CassieRoughEnvCfg(LocomotionVelocityRoughEnvCfg):
    def __post_init__(self):
        super().__post_init__()
        self.scene.robot = CASSIE_CFG
        self.scene.height_scanner.prim_path = "robot/pelvis"
        self.rewards.feet_air_time.params["sensor_cfg"] = SceneEntityCfg(
            "contact_forces", body_names=".*_toe"
        )
        self.rewards.undesired_contacts.params["sensor_cfg"] = SceneEntityCfg(
            "contact_forces", body_names=".*_thigh"
        )
        self.events.add_base_mass.params["asset_cfg"] = SceneEntityCfg(
            "robot", body_names="pelvis"
        )
        self.events.base_external_force_torque.params["asset_cfg"] = SceneEntityCfg(
            "robot", body_names="pelvis"
        )
        self.terminations.base_contact.params["sensor_cfg"] = SceneEntityCfg(
            "contact_forces", body_names="pelvis"
        )
        # biped tuning (reference h1/g1 rough_env_cfg): penalize termination,
        # arm/torso deviation; feet air time rewarded higher
        self.rewards.feet_air_time.weight = 0.25
        self.rewards.feet_air_time.params["threshold"] = 0.4
        self.rewards.dof_torques_l2.weight = -1.0e-6
        self.rewards.lin_vel_z_l2.weight = 0.0
        self.events.push_robot = None
        self.commands.base_velocity.ranges.lin_vel_y = (-0.3, 0.3)


@configclass
class CassieFlatEnvCfg(CassieRoughEnvCfg):
    def __post_init__(self):
        super().__post_init__()
        self.sim.max_active_contacts = 0  # K=12 loses on plane terrain (r5 A/B)
        self.scene.terrain = TerrainImporterCfg(terrain_type="plane")
        self.scene.height_scanner = None
        self.observations.policy.height_scan = None
        self.curriculum.terrain_levels = None
        self.rewards.flat_orientation_l2.weight = -5.0


@configclass
class CassieRoughEnvCfg_PLAY(CassieRoughEnvCfg):
    def __post_init__(self):
        super().__post_init__()
        self.scene.num_envs = 50
        self.observations.policy.enable_corruption = False
        self.events.push_robot = None


@configclass
class CassieFlatEnvCfg_PLAY(CassieFlatEnvCfg):
    def __post_init__(self):
        super().__post_init__()
        self.scene.num_envs = 50
        self.observations.policy.enable_corruption = False
        self.events.push_robot = None
