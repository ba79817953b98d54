"""ANYmal-C rough-terrain velocity cfg (reference
``velocity/config/anymal_c/rough_env_cfg.py``)."""

from isaaclab_tpu.assets_presets.anymal import ANYMAL_C_CFG
from isaaclab_tpu.utils import configclass

from ...velocity_env_cfg import LocomotionVelocityRoughEnvCfg


@configclass
class AnymalCRoughEnvCfg(LocomotionVelocityRoughEnvCfg):
    def __post_init__(self):
        super().__post_init__()
        self.scene.robot = ANYMAL_C_CFG


@configclass
class AnymalCRoughEnvCfg_PLAY(AnymalCRoughEnvCfg):
    def __post_init__(self):
        super().__post_init__()
        self.scene.num_envs = 50
        self.observations.policy.enable_corruption = False
        self.events.base_external_force_torque = None
        self.events.push_robot = None
