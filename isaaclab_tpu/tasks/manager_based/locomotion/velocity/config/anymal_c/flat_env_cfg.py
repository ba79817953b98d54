"""ANYmal-C flat-terrain velocity cfg (reference
``velocity/config/anymal_c/flat_env_cfg.py``: plane terrain, no height scan,
flat-orientation penalty enabled)."""

from isaaclab_tpu.terrains import TerrainImporterCfg
from isaaclab_tpu.utils import configclass

from .rough_env_cfg import AnymalCRoughEnvCfg


@configclass
class AnymalCFlatEnvCfg(AnymalCRoughEnvCfg):
    def __post_init__(self):
        super().__post_init__()
        self.sim.max_active_contacts = 0  # K=12 loses on plane terrain (r5 A/B)
        self.scene.terrain = TerrainImporterCfg(terrain_type="plane")
        self.scene.height_scanner = None
        self.observations.policy.height_scan = None
        self.curriculum.terrain_levels = None
        self.rewards.flat_orientation_l2.weight = -5.0
        self.rewards.dof_torques_l2.weight = -2.5e-5
        self.rewards.feet_air_time.weight = 0.5


@configclass
class AnymalCFlatEnvCfg_PLAY(AnymalCFlatEnvCfg):
    def __post_init__(self):
        super().__post_init__()
        self.scene.num_envs = 50
        self.observations.policy.enable_corruption = False
        self.events.push_robot = None
