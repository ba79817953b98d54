"""Cabinet task variants (reference ``manipulation/cabinet/config/franka``):
IK-absolute / IK-relative arm actions and reduced play configs."""

from isaaclab_tpu.controllers import DifferentialIKControllerCfg
from isaaclab_tpu.envs import mdp
from isaaclab_tpu.utils import configclass

from .cabinet_env_cfg import FrankaCabinetEnvCfg


@configclass
class FrankaCabinetIKAbsEnvCfg(FrankaCabinetEnvCfg):
    """Reference ``cabinet/config/franka/ik_abs_env_cfg.py``."""

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
class FrankaCabinetIKRelEnvCfg(FrankaCabinetEnvCfg):
    """Reference ``cabinet/config/franka/ik_rel_env_cfg.py``."""

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
class FrankaCabinetEnvCfg_PLAY(FrankaCabinetEnvCfg):
    def __post_init__(self):
        super().__post_init__()
        self.scene.num_envs = 50
        self.observations.policy.enable_corruption = False
