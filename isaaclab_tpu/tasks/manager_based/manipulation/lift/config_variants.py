"""Lift task action-space variants (reference
``manipulation/lift/config/franka/ik_abs_env_cfg.py`` / ``ik_rel_env_cfg.py``)."""

from isaaclab_tpu.controllers import DifferentialIKControllerCfg
from isaaclab_tpu.envs import mdp
from isaaclab_tpu.managers import EventTermCfg as EventTerm, SceneEntityCfg
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


@configclass
class FrankaLiftEnvCfg_PLAY(FrankaLiftEnvCfg):
    def __post_init__(self):
        super().__post_init__()
        self.scene.num_envs = 50
        self.observations.policy.enable_corruption = False


@configclass
class FrankaTeddyBearLiftEnvCfg(FrankaLiftIKAbsEnvCfg):
    """Deformable teddy-bear lift (reference
    ``lift/config/franka/ik_abs_env_cfg.py:FrankaTeddyBearLiftEnvCfg``):
    the rigid cube is replaced by an XPBD soft body; object-state rewards/
    observations are stripped exactly like the reference (state-machine demo
    task). The bear is modelled as a soft box blob (no USD mesh import)."""

    def __post_init__(self):
        super().__post_init__()
        from isaaclab_tpu.assets import DeformableObjectCfg
        from isaaclab_tpu.physics.soft_body import make_soft_cube

        self.scene.object = DeformableObjectCfg(
            model=lambda: make_soft_cube(
                size=(0.12, 0.08, 0.1), resolution=3, mass=0.3, youngs_modulus=2e4
            ),
            init_state=DeformableObjectCfg.InitStateCfg(pos=(0.5, 0.0, 0.05)),
            # one-way rigid->soft coupling: the bear collides with (and is
            # carried by) the gripper through collider-relative friction
            collide_with=["robot"],
        )
        # softer gripper to not hurt the poor teddy bear (reference :83-85)
        self.scene.robot.actuators["panda_hand"].effort_limit = 50.0
        self.scene.robot.actuators["panda_hand"].stiffness = 40.0
        self.scene.robot.actuators["panda_hand"].damping = 10.0
        self.events.reset_object_position = EventTerm(
            func=mdp.reset_nodal_state_uniform,
            mode="reset",
            params={
                "position_range": {"x": (-0.1, 0.1), "y": (-0.25, 0.25), "z": (0.0, 0.0)},
                "velocity_range": {},
                "asset_cfg": SceneEntityCfg("object"),
            },
        )
        # strip object-state terms (reference :105-110)
        self.terminations.object_dropping = None
        self.rewards.reaching_object = None
        self.rewards.lifting_object = None
        self.rewards.object_goal_tracking = None
        self.rewards.object_goal_tracking_fine_grained = None
        self.observations.policy.object_position = None
