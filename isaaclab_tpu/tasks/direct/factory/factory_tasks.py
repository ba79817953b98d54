"""GearMesh and NutThread factory tasks (reference
``direct/factory/factory_tasks_cfg.py:205,364``): same keypoint-reward
machinery as PegInsert (factory_env.py), different held/fixed assets and
reward length-scales.

TPU asset modelling (round 4): gear/nut/bolt are procedural triangle MESHES
collided through the SDF narrowphase (physics/sdf.py — the recast of the
reference's PhysX SDF mesh collision): the held gear/nut carries bore-wall
sample points queried against the fixed shaft/bolt's precomputed SDF voxel
grid; the ridged bolt shaft models the thread interlock at the thread pitch
(ring threads — helical advance is beyond useful SDF resolution, so
threading kinematics reduce to guarded descent + yaw like the primitive
model did, now at 1.2 mm crest clearance). Flanking gears are visual-only.
Success thresholds are absolute keypoint distances (the reference expresses
them as fractions of asset height; converted with the modelled heights).
``ISAACLAB_TPU_FACTORY_PRIMITIVES=1`` restores the legacy 4-box-ring
primitive assets (fast CPU-test path, no SDF precompute)."""

from __future__ import annotations

import numpy as np

from ....assets import ArticulationCfg, ArticulationInitStateCfg
from ....physics.model import (
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_CYLINDER,
    GEOM_MESH,
    JOINT_FIXED,
    JOINT_REVOLUTE,
    ModelBuilder,
)
from ....scene import InteractiveSceneCfg
from ....utils.configclass import configclass
from .factory_env import FactoryEnvCfg, FactorySceneCfg, FactoryTaskCfg

_WELDED_INIT = ArticulationInitStateCfg(
    joint_pos={
        "panda_joint1": 0.0, "panda_joint2": -0.3, "panda_joint3": 0.0,
        "panda_joint4": -2.4, "panda_joint5": 0.0,
        "panda_joint6": 2.3, "panda_joint7": 0.78,
    },
)


def _welded_robot_cfg(model_fn):
    """Arm-only Franka with the held asset welded to the hand (legacy factory
    configuration used by GearMesh/NutThread until they get the free-body
    grasp treatment PegInsert has)."""
    from ....actuators import ImplicitActuatorCfg

    return ArticulationCfg(
        model=model_fn,
        init_state=_WELDED_INIT,
        actuators={
            "arm": ImplicitActuatorCfg(
                joint_names_expr=["panda_joint.*"],
                stiffness=400.0,
                damping=80.0,
                effort_limit=87.0,
                velocity_limit=2.175,
            )
        },
    )

_FRANKA_LIMITS = [
    (-2.8973, 2.8973), (-1.7628, 1.7628), (-2.8973, 2.8973),
    (-3.0718, -0.0698), (-2.8973, 2.8973), (-0.0175, 3.7525),
    (-2.8973, 2.8973),
]
_FRANKA_DH = [
    ((0, 0, 0.333), (0, 0, 1)),
    ((0, 0, 0), (0, 1, 0)),
    ((0, 0, 0.316), (0, 0, 1)),
    ((0.0825, 0, 0), (0, -1, 0)),
    ((-0.0825, 0, 0.384), (0, 0, 1)),
    ((0, 0, 0), (0, -1, 0)),
    ((0.088, 0, 0), (0, 0, -1)),
]
_FRANKA_MASSES = [4.97, 0.65, 3.23, 3.59, 1.22, 1.67, 0.74]


def _franka_arm(b: ModelBuilder):
    parent = -1
    for i in range(7):
        pos, axis = _FRANKA_DH[i]
        parent = b.add_body(
            f"panda_link{i + 1}", parent, JOINT_REVOLUTE, jnt_axis=axis,
            jnt_pos=pos, mass=_FRANKA_MASSES[i], inertia=np.eye(3) * 0.01,
            jnt_name=f"panda_joint{i + 1}", limits=_FRANKA_LIMITS[i],
            effort_limit=87.0 if i < 4 else 12.0, velocity_limit=2.175,
        )
        b.add_geom(parent, GEOM_CAPSULE, (0.06, 0.08))
    hand = b.add_body(
        "panda_hand", parent, JOINT_FIXED, jnt_pos=(0, 0, 0.107),
        mass=0.73, inertia=np.eye(3) * 0.003,
    )
    b.add_geom(hand, GEOM_BOX, (0.03, 0.1, 0.03), pos=(0, 0, 0.03))
    return hand


def _add_ring(b, body, hole_r, width, half_h, z, friction=0.8,
              name_prefix="held_ring"):
    """4-box ring with an inner square hole of half-width ``hole_r`` —
    the primitive stand-in for a gear/nut bore. Geoms are NAMED so
    collision filters can scope them (welded held assets must keep their
    pairs vs the fixed asset while the arm links drop theirs)."""
    for i, (dx, dy, sx, sy) in enumerate((
        (hole_r + width, 0, width, hole_r + 2 * width),
        (-(hole_r + width), 0, width, hole_r + 2 * width),
        (0, hole_r + width, hole_r + 2 * width, width),
        (0, -(hole_r + width), hole_r + 2 * width, width),
    )):
        b.add_geom(body, GEOM_BOX, (sx, sy, half_h), pos=(dx, dy, z),
                   friction=friction, name=f"{name_prefix}{i}")


# ---------------------------------------------------------------------------
# GearMesh (reference factory_tasks_cfg.py:205): slide the held medium gear
# down the center shaft of a 3-shaft gear base.
# ---------------------------------------------------------------------------


def _use_primitive_factory() -> bool:
    import os

    return os.environ.get("ISAACLAB_TPU_FACTORY_PRIMITIVES", "0") == "1"


def build_franka_with_gear():
    b = ModelBuilder("franka_gear")
    hand = _franka_arm(b)
    gear = b.add_body(
        "held_asset", hand, JOINT_FIXED, jnt_pos=(0, 0, 0.09),
        mass=0.019, com=(0, 0, 0.01), inertia=np.eye(3) * 1e-5,
    )
    if _use_primitive_factory():
        # legacy: bore ring (slides over the 8mm shaft) + tooth disc visual
        _add_ring(b, gear, hole_r=0.0105, width=0.006, half_h=0.008, z=0.01)
    else:
        from ....physics.sdf import (
            MeshData,
            bore_surface_points,
            gear_with_bore_mesh,
        )

        V, F = gear_with_bore_mesh(
            bore_radius=0.0105, root_radius=0.028, tip_radius=0.035,
            teeth=16, thickness=0.016,
        )
        # query points concentrated on the bore wall (the mating surface)
        # plus bottom-face ring (rests on the base plate)
        pts = np.concatenate([
            bore_surface_points(0.0105, 0.008, n_ang=12),
            bore_surface_points(0.020, 0.0, n_ang=8, z_levels=(-1.0,),
                                center=(0, 0, -0.008)),
        ])
        md = MeshData(V, F, surface_points=pts)
        # named held_ring* so the scene's collision filters keep its pairs
        b.add_geom(gear, GEOM_MESH, (0.035, 0.035, 0.008), pos=(0, 0, 0.01),
                   friction=0.8, mesh=md, name="held_ring_mesh")
    b.add_geom(gear, GEOM_CYLINDER, (0.035, 0.008), pos=(0, 0, 0.01),
               rgba=(0.75, 0.6, 0.2, 1.0), collidable=False, name="gear_visual")
    return b.build()


def build_gear_base():
    b = ModelBuilder("fixed_asset")
    base = b.add_body("fixed_asset", -1, JOINT_FIXED, mass=1.0,
                      inertia=np.eye(3) * 0.01)
    b.add_geom(base, GEOM_BOX, (0.06, 0.04, 0.01), pos=(0, 0, 0.01))
    # three vertical shafts; the medium (center) one is the mating target
    if _use_primitive_factory():
        for dx, r, name in ((0.0, 0.008, "shaft_medium"),
                            (-0.035, 0.006, "shaft_small"),
                            (0.04, 0.010, "shaft_large")):
            b.add_geom(base, GEOM_CAPSULE, (r, 0.015), pos=(dx, 0, 0.035),
                       friction=0.6, name=name)
    else:
        from ....physics.sdf import (
            MeshData, build_mesh_sdf, cylinder_mesh, merge_meshes,
        )

        V, F = merge_meshes([
            cylinder_mesh(0.008, 0.015) + ((0.0, 0.0, 0.0),),
            cylinder_mesh(0.006, 0.015) + ((-0.035, 0.0, 0.0),),
            cylinder_mesh(0.010, 0.015) + ((0.04, 0.0, 0.0),),
        ])
        md = MeshData(V, F, sdf=build_mesh_sdf(V, F, spacing=0.0008))
        b.add_geom(base, GEOM_MESH, (0.05, 0.01, 0.015), pos=(0, 0, 0.035),
                   friction=0.6, mesh=md, name="shafts_mesh")
    # flanking gears pre-seated on their shafts (visual only, reference
    # add_flanking_gears=True)
    b.add_geom(base, GEOM_CYLINDER, (0.02, 0.008), pos=(-0.035, 0, 0.03),
               rgba=(0.6, 0.6, 0.65, 1.0), collidable=False)
    b.add_geom(base, GEOM_CYLINDER, (0.05, 0.008), pos=(0.04, 0, 0.03),
               rgba=(0.6, 0.6, 0.65, 1.0), collidable=False)
    return b.build()


@configclass
class GearMeshSceneCfg(FactorySceneCfg):
    def __post_init__(self):
        self.robot = _welded_robot_cfg(build_franka_with_gear)
        self.held_asset = None  # welded: no free-body held asset
        self.fixed_asset = ArticulationCfg(
            model=build_gear_base,
            init_state=ArticulationInitStateCfg(pos=(0.55, 0.0, 0.0)),
            actuators={},
        )
        # the inherited PegInsert filter drops EVERY robot-vs-fixed pair
        # (welded gear geoms live on the robot); keep the welded held_ring*
        # geoms' pairs so gear-on-shaft insertion physics exists
        self.collision_filters = [
            ("robot", "^(?!.*(fingertip|held_ring)).*$", "fixed_asset", ".*"),
        ]


@configclass
class GearMeshTaskCfg(FactoryTaskCfg):
    """Reference GearMesh (factory_tasks_cfg.py:205)."""

    name: str = "gear_mesh"
    weld_held_asset: bool = True
    keypoint_coef_baseline: tuple = (5.0, 4.0)
    keypoint_coef_coarse: tuple = (50.0, 2.0)
    keypoint_coef_fine: tuple = (100.0, 0.0)
    # 0.05 x gear-shaft engagement height (reference expresses the fraction)
    success_threshold: float = 0.02
    action_bounds: tuple = (0.05, 0.05, 0.05, 0.1, 0.1, 0.1)


@configclass
class FactoryGearMeshEnvCfg(FactoryEnvCfg):
    episode_length_s: float = 20.0  # reference duration_s
    scene: GearMeshSceneCfg = GearMeshSceneCfg(num_envs=128, env_spacing=2.0)
    task: GearMeshTaskCfg = GearMeshTaskCfg()


# ---------------------------------------------------------------------------
# NutThread (reference factory_tasks_cfg.py:364): thread the held M16 nut
# onto a bolt. Threading torque is the dominant action (unidirectional yaw).
# ---------------------------------------------------------------------------


def build_franka_with_nut():
    b = ModelBuilder("franka_nut")
    hand = _franka_arm(b)
    nut = b.add_body(
        "held_asset", hand, JOINT_FIXED, jnt_pos=(0, 0, 0.09),
        mass=0.03, com=(0, 0, 0.008), inertia=np.eye(3) * 1e-5,
    )
    if _use_primitive_factory():
        # legacy M16 nut: 8.5mm bore ring, 8mm tall
        _add_ring(b, nut, hole_r=0.0085, width=0.006, half_h=0.004, z=0.008)
    else:
        from ....physics.sdf import (
            MeshData, bore_surface_points, hex_nut_mesh,
        )

        # M16 hex nut: round 9.2mm bore (1.2mm clearance over the ridged
        # bolt's 8mm thread crests), 12mm across flats
        V, F = hex_nut_mesh(flat_radius=0.012, hole_radius=0.0092,
                            thickness=0.008)
        pts = np.concatenate([
            bore_surface_points(0.0092, 0.004, n_ang=12),
            bore_surface_points(0.011, 0.0, n_ang=8, z_levels=(-1.0,),
                                center=(0, 0, -0.004)),
        ])
        md = MeshData(V, F, surface_points=pts)
        b.add_geom(nut, GEOM_MESH, (0.012, 0.012, 0.004), pos=(0, 0, 0.008),
                   friction=0.8, mesh=md, name="held_ring_mesh")
    b.add_geom(nut, GEOM_CYLINDER, (0.012, 0.004), pos=(0, 0, 0.008),
               rgba=(0.7, 0.7, 0.75, 1.0), collidable=False, name="nut_visual")
    return b.build()


def build_bolt():
    b = ModelBuilder("fixed_asset")
    base = b.add_body("fixed_asset", -1, JOINT_FIXED, mass=1.0,
                      inertia=np.eye(3) * 0.01)
    b.add_geom(base, GEOM_BOX, (0.03, 0.03, 0.01), pos=(0, 0, 0.01))
    if _use_primitive_factory():
        # legacy: smooth M16 bolt shank, 35mm of thread above the base
        b.add_geom(base, GEOM_CAPSULE, (0.008, 0.0175), pos=(0, 0, 0.0375),
                   friction=0.6, name="bolt")
    else:
        from ....physics.sdf import (
            MeshData, build_mesh_sdf, threaded_shaft_mesh,
        )

        # ridged M16 shaft: 2mm pitch, 1.2mm thread depth, SDF at 0.5mm
        # voxels (resolves the ridge profile the nut bore rides over)
        V, F = threaded_shaft_mesh(
            radius=0.008, half_length=0.0175, thread_depth=0.0012,
            pitch=0.002, n=24,
        )
        md = MeshData(V, F, sdf=build_mesh_sdf(V, F, spacing=0.0005))
        b.add_geom(base, GEOM_MESH, (0.008, 0.008, 0.0175),
                   pos=(0, 0, 0.0375), friction=0.6, mesh=md, name="bolt")
    return b.build()


@configclass
class NutThreadSceneCfg(FactorySceneCfg):
    def __post_init__(self):
        self.robot = _welded_robot_cfg(build_franka_with_nut)
        self.held_asset = None  # welded: no free-body held asset
        self.fixed_asset = ArticulationCfg(
            model=build_bolt,
            init_state=ArticulationInitStateCfg(pos=(0.55, 0.0, 0.0)),
            actuators={},
        )
        # keep the welded nut's held_ring* pairs vs the bolt (see GearMesh)
        self.collision_filters = [
            ("robot", "^(?!.*(fingertip|held_ring)).*$", "fixed_asset", ".*"),
        ]


@configclass
class NutThreadTaskCfg(FactoryTaskCfg):
    """Reference NutThread (factory_tasks_cfg.py:364)."""

    name: str = "nut_thread"
    weld_held_asset: bool = True
    keypoint_scale: float = 0.05
    keypoint_coef_baseline: tuple = (100.0, 2.0)
    keypoint_coef_coarse: tuple = (500.0, 2.0)
    keypoint_coef_fine: tuple = (1500.0, 0.0)
    # 0.375 x thread height (reference fraction), threads modelled 0.035 tall
    success_threshold: float = 0.013
    # unidirectional_rot: larger yaw authority for the threading motion
    action_bounds: tuple = (0.05, 0.05, 0.05, 0.1, 0.1, 0.25)


@configclass
class FactoryNutThreadEnvCfg(FactoryEnvCfg):
    episode_length_s: float = 30.0  # reference duration_s
    scene: NutThreadSceneCfg = NutThreadSceneCfg(num_envs=128, env_spacing=2.0)
    task: NutThreadTaskCfg = NutThreadTaskCfg()
