"""Stack task variants (reference ``stack/config/franka/stack_ik_*``,
``stack_joint_pos_instance_randomize_env_cfg.py``): IK arm-action variants and
instance-randomized cube collections."""

import numpy as np

from isaaclab_tpu.assets import (
    RigidObjectCfg,
    RigidObjectCollectionCfg,
    RigidObjectInitStateCfg,
)
from isaaclab_tpu.controllers import DifferentialIKControllerCfg
from isaaclab_tpu.managers import (
    EventTermCfg as EventTerm,
    ObservationTermCfg as ObsTerm,
    SceneEntityCfg,
)
from isaaclab_tpu.utils import configclass

from . import mdp
from .stack_env_cfg import (
    CUBE_HALF,
    CUBE_MASS,
    ObservationsCfg,
    StackEnvCfg,
    _build_cube_model,
)


def _ik_arm_action(relative: bool):
    return mdp.DifferentialInverseKinematicsActionCfg(
        asset_name="robot",
        joint_names=["panda_joint.*"],
        body_name="panda_hand",
        controller=DifferentialIKControllerCfg(
            command_type="pose", use_relative_mode=relative, ik_method="dls"
        ),
        scale=0.5 if relative else 1.0,
        body_offset=mdp.BodyOffsetCfg(pos=(0.0, 0.0, 0.107)),
    )


@configclass
class FrankaCubeStackIKRelEnvCfg(StackEnvCfg):
    """Reference ``stack_ik_rel_env_cfg.py``."""

    def __post_init__(self):
        super().__post_init__()
        self.actions.arm_action = _ik_arm_action(relative=True)


@configclass
class FrankaCubeStackIKAbsEnvCfg(StackEnvCfg):
    """Reference ``stack_ik_abs_env_cfg.py``."""

    def __post_init__(self):
        super().__post_init__()
        self.actions.arm_action = _ik_arm_action(relative=False)


# ---------------------------------------------------------------------------
# Instance-randomize variants: each cube slot is a 2-variant collection
# (reference uses color-variant USD blocks; here size/mass variants so the
# randomization is physical, not only visual).
# ---------------------------------------------------------------------------


def _cube_slot_collection(slot: int):
    variants = {}
    for i, scale in enumerate((1.0, 0.85)):
        half = CUBE_HALF * scale
        mass = CUBE_MASS * scale**3
        variants[f"cube_{slot}_v{i}"] = RigidObjectCfg(
            model=_build_cube_model(f"cube_{slot}_v{i}"),
            init_state=RigidObjectInitStateCfg(pos=(10.0 + slot * 2.0, 10.0 + i * 2.0, half)),
        )
    return RigidObjectCollectionCfg(rigid_objects=variants)


@configclass
class InstanceRandomizeObservationsCfg(ObservationsCfg):
    def __post_init__(self):
        self.policy.object = ObsTerm(func=mdp.instance_randomize_object_obs)
        self.policy.cube_positions = ObsTerm(
            func=mdp.instance_randomize_cube_positions_in_world_frame
        )
        self.policy.cube_orientations = ObsTerm(
            func=mdp.instance_randomize_cube_orientations_in_world_frame
        )


@configclass
class FrankaCubeStackInstanceRandomizeEnvCfg(StackEnvCfg):
    """Reference ``stack_joint_pos_instance_randomize_env_cfg.py``."""

    observations: InstanceRandomizeObservationsCfg = (
        InstanceRandomizeObservationsCfg()
    )

    def __post_init__(self):
        super().__post_init__()
        self.scene.cube_1 = _cube_slot_collection(1)
        self.scene.cube_2 = _cube_slot_collection(2)
        self.scene.cube_3 = _cube_slot_collection(3)
        # collections don't honor single-object terminations/subtask signals;
        # mirror the reference which keeps only time_out + success off (the
        # instance-randomize reference cfg keeps terminations on the focus
        # object; the TPU build tracks focus in state so we drop the
        # per-cube dropping terms and keep time_out)
        self.terminations.cube_1_dropping = None
        self.terminations.cube_2_dropping = None
        self.terminations.cube_3_dropping = None
        self.terminations.success = None
        # subtask signals index single rigid objects; disabled for the
        # instance-randomized variant (reference keeps them via focus lookup)
        self.observations.subtask_terms = None
        self.events.randomize_cube_positions = EventTerm(
            func=mdp.randomize_rigid_objects_in_focus,
            mode="reset",
            params={
                "pose_range": {
                    "x": (0.4, 0.6), "y": (-0.10, 0.10),
                    "z": (CUBE_HALF, CUBE_HALF), "yaw": (-1.0, 1.0),
                },
                "min_separation": 0.1,
                "out_focus_state": np.array(
                    [10.0, 10.0, CUBE_HALF, 1.0, 0.0, 0.0, 0.0,
                     0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
                ),
                "asset_cfgs": [
                    SceneEntityCfg("cube_1"),
                    SceneEntityCfg("cube_2"),
                    SceneEntityCfg("cube_3"),
                ],
            },
        )


@configclass
class FrankaCubeStackInstanceRandomizeIKRelEnvCfg(
    FrankaCubeStackInstanceRandomizeEnvCfg
):
    """Reference ``stack_ik_rel_instance_randomize_env_cfg.py``."""

    def __post_init__(self):
        super().__post_init__()
        self.actions.arm_action = _ik_arm_action(relative=True)


# ---------------------------------------------------------------------------
# Visuomotor / Blueprint variants (reference stack_ik_rel_visuomotor_env_cfg
# .py, stack_ik_rel_blueprint_env_cfg.py): IK-rel stacking with wrist +
# table RGB-D cameras exposed as an ``rgb_camera`` observation group.
# ---------------------------------------------------------------------------

from isaaclab_tpu.managers import ObservationGroupCfg as ObsGroup  # noqa: E402
from isaaclab_tpu.sensors import TiledCameraCfg, TiledCameraOffsetCfg  # noqa: E402


def _stack_cameras():
    common = dict(
        data_types=["rgb", "distance_to_image_plane"],
        focal_length=24.0,
        horizontal_aperture=20.955,
        clipping_range=(0.1, 2.0),
        width=84,
        height=84,
    )
    wrist = TiledCameraCfg(
        prim_path="robot/panda_hand",
        offset=TiledCameraOffsetCfg(
            pos=(0.13, 0.0, -0.15),
            rot=(-0.70614, 0.03701, 0.03701, -0.70614),
            convention="ros",
        ),
        **common,
    )
    table = TiledCameraCfg(
        offset=TiledCameraOffsetCfg(
            pos=(1.0, 0.0, 0.4),
            rot=(0.35355, -0.61237, -0.61237, 0.35355),
            convention="ros",
        ),
        **common,
    )
    return wrist, table


@configclass
class VisuomotorObservationsCfg(ObservationsCfg):
    """Adds the RGB camera group (reference VisuomotorObservationsCfg)."""

    @configclass
    class RGBCameraPolicyCfg(ObsGroup):
        table_cam = ObsTerm(
            func=mdp.image,
            params={
                "sensor_cfg": SceneEntityCfg("table_cam"),
                "data_type": "rgb", "normalize": False,
            },
        )
        wrist_cam = ObsTerm(
            func=mdp.image,
            params={
                "sensor_cfg": SceneEntityCfg("wrist_cam"),
                "data_type": "rgb", "normalize": False,
            },
        )

        def __post_init__(self):
            self.enable_corruption = False
            self.concatenate_terms = False

    rgb_camera: RGBCameraPolicyCfg = RGBCameraPolicyCfg()


@configclass
class FrankaCubeStackVisuomotorEnvCfg(FrankaCubeStackIKRelEnvCfg):
    """Reference ``FrankaCubeStackVisuomotorEnvCfg``."""

    observations: VisuomotorObservationsCfg = VisuomotorObservationsCfg()

    def __post_init__(self):
        super().__post_init__()
        wrist, table = _stack_cameras()
        self.scene.wrist_cam = wrist
        self.scene.table_cam = table


@configclass
class FrankaCubeStackBlueprintEnvCfg(FrankaCubeStackVisuomotorEnvCfg):
    """Reference ``FrankaCubeStackBlueprintEnvCfg`` — same MDP as the
    visuomotor variant; the reference only adds Cosmos-oriented image dump
    plumbing around the same cameras."""
