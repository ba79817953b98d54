"""Lift task action-space variants (reference
``manipulation/lift/config/franka/ik_abs_env_cfg.py`` / ``ik_rel_env_cfg.py``)."""

from isaaclab_tpu.controllers import DifferentialIKControllerCfg
from isaaclab_tpu.envs import mdp
from isaaclab_tpu.utils import configclass

from .lift_env_cfg import FrankaLiftEnvCfg


@configclass
class FrankaLiftIKAbsEnvCfg(FrankaLiftEnvCfg):
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
class FrankaLiftIKRelEnvCfg(FrankaLiftEnvCfg):
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
