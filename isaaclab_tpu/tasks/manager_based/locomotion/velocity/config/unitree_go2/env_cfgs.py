"""Go2 velocity cfgs (reference velocity/config/go2 flat/rough cfgs)."""

from isaaclab_tpu.assets_presets.unitree import UNITREE_GO2_CFG
from isaaclab_tpu.managers import SceneEntityCfg
from isaaclab_tpu.terrains import TerrainImporterCfg
from isaaclab_tpu.utils import configclass

from ...velocity_env_cfg import LocomotionVelocityRoughEnvCfg


@configclass
class Go2RoughEnvCfg(LocomotionVelocityRoughEnvCfg):
    def __post_init__(self):
        super().__post_init__()
        self.scene.robot = UNITREE_GO2_CFG
        self.scene.height_scanner.prim_path = "robot/trunk"
        # unitree body names differ from anymal
        self.rewards.feet_air_time.params["sensor_cfg"] = SceneEntityCfg(
            "contact_forces", body_names=".*_calf"
        )
        self.rewards.undesired_contacts.params["sensor_cfg"] = SceneEntityCfg(
            "contact_forces", body_names=".*_thigh"
        )
        self.events.add_base_mass.params["asset_cfg"] = SceneEntityCfg(
            "robot", body_names="trunk"
        )
        self.events.base_external_force_torque.params["asset_cfg"] = SceneEntityCfg(
            "robot", body_names="trunk"
        )
        self.terminations.base_contact.params["sensor_cfg"] = SceneEntityCfg(
            "contact_forces", body_names="trunk"
        )


@configclass
class Go2FlatEnvCfg(Go2RoughEnvCfg):
    def __post_init__(self):
        super().__post_init__()
        self.sim.max_active_contacts = 0  # K=12 loses on plane terrain (r5 A/B)
        self.scene.terrain = TerrainImporterCfg(terrain_type="plane")
        self.scene.height_scanner = None
        self.observations.policy.height_scan = None
        self.curriculum.terrain_levels = None
        self.rewards.flat_orientation_l2.weight = -5.0


@configclass
class Go2RoughEnvCfg_PLAY(Go2RoughEnvCfg):
    def __post_init__(self):
        super().__post_init__()
        self.scene.num_envs = 50
        self.observations.policy.enable_corruption = False
        self.events.base_external_force_torque = None
        self.events.push_robot = None


@configclass
class Go2FlatEnvCfg_PLAY(Go2FlatEnvCfg):
    def __post_init__(self):
        super().__post_init__()
        self.scene.num_envs = 50
        self.observations.policy.enable_corruption = False
        self.events.base_external_force_torque = None
        self.events.push_robot = None
