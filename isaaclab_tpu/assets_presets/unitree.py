"""Unitree quadruped presets (reference ``isaaclab_assets/robots/unitree.py``):
A1 and Go2 — same 12-dof topology as ANYmal with Unitree joint names
({F,R}{L,R}_{hip,thigh,calf}_joint) and massing."""

import numpy as np

from ..actuators import DCMotorCfg
from ..assets import ArticulationCfg, ArticulationInitStateCfg
from ..physics.model import (
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_SPHERE,
    JOINT_FREE,
    JOINT_REVOLUTE,
    ModelBuilder,
)


def build_unitree_model(name, base_mass, hip_xy, thigh_len, calf_len,
                        thigh_mass, calf_mass, effort, velocity):
    b = ModelBuilder(name)
    base = b.add_body(
        "trunk", -1, JOINT_FREE, mass=base_mass,
        inertia=np.diag([0.02, 0.06, 0.07]) * (base_mass / 6.0),
    )
    b.add_geom(base, GEOM_BOX, (0.13, 0.09, 0.05))
    for leg, (sx, sy) in (("FL", (1, 1)), ("FR", (1, -1)), ("RL", (-1, 1)), ("RR", (-1, -1))):
        hip = b.add_body(
            f"{leg}_hip", base, JOINT_REVOLUTE, jnt_axis=(1, 0, 0),
            jnt_pos=(sx * hip_xy[0], sy * hip_xy[1], 0.0),
            mass=0.7, com=(0, sy * 0.03, 0), inertia=np.eye(3) * 0.002,
            jnt_name=f"{leg}_hip_joint", limits=(-0.86, 0.86),
            effort_limit=effort, velocity_limit=velocity,
        )
        thigh = b.add_body(
            f"{leg}_thigh", hip, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
            jnt_pos=(0.0, sy * 0.08, 0.0),
            mass=thigh_mass, com=(0, 0, -thigh_len / 2),
            inertia=np.diag([0.005, 0.005, 0.001]),
            jnt_name=f"{leg}_thigh_joint", limits=(-1.0, 3.5),
            effort_limit=effort, velocity_limit=velocity,
        )
        b.add_geom(thigh, GEOM_CAPSULE, (0.025, thigh_len / 2),
                   pos=(0, 0, -thigh_len / 2))
        calf = b.add_body(
            f"{leg}_calf", thigh, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
            jnt_pos=(0.0, 0.0, -thigh_len),
            mass=calf_mass, com=(0, 0, -calf_len / 2),
            inertia=np.diag([0.003, 0.003, 0.0004]),
            jnt_name=f"{leg}_calf_joint", limits=(-2.8, -0.9),
            effort_limit=effort, velocity_limit=velocity,
        )
        b.add_geom(calf, GEOM_CAPSULE, (0.015, calf_len / 2 - 0.02),
                   pos=(0, 0, -calf_len / 2))
        b.add_geom(calf, GEOM_SPHERE, (0.022,), pos=(0, 0, -calf_len),
                   friction=1.0, name=f"{leg}_foot")
    return b.build()


def build_a1_model():
    return build_unitree_model(
        "unitree_a1", base_mass=6.0, hip_xy=(0.183, 0.047),
        thigh_len=0.2, calf_len=0.2, thigh_mass=1.0, calf_mass=0.2,
        effort=33.5, velocity=21.0,
    )


def build_go2_model():
    return build_unitree_model(
        "unitree_go2", base_mass=6.9, hip_xy=(0.1934, 0.0465),
        thigh_len=0.213, calf_len=0.213, thigh_mass=1.2, calf_mass=0.25,
        effort=23.5, velocity=30.0,
    )


_A1_INIT = ArticulationInitStateCfg(
    pos=(0.0, 0.0, 0.42),
    joint_pos={
        ".*_hip_joint": 0.0,
        "F[LR]_thigh_joint": 0.8,
        "R[LR]_thigh_joint": 1.0,
        ".*_calf_joint": -1.5,
    },
)

UNITREE_A1_CFG = ArticulationCfg(
    model=build_a1_model,
    init_state=_A1_INIT,
    soft_joint_pos_limit_factor=0.9,
    actuators={
        "base_legs": DCMotorCfg(
            joint_names_expr=[".*_hip_joint", ".*_thigh_joint", ".*_calf_joint"],
            effort_limit=33.5,
            saturation_effort=33.5,
            velocity_limit=21.0,
            stiffness=25.0,
            damping=0.5,
        )
    },
)

UNITREE_GO2_CFG = ArticulationCfg(
    model=build_go2_model,
    init_state=_A1_INIT.replace(pos=(0.0, 0.0, 0.4)),
    soft_joint_pos_limit_factor=0.9,
    actuators={
        "base_legs": DCMotorCfg(
            joint_names_expr=[".*_hip_joint", ".*_thigh_joint", ".*_calf_joint"],
            effort_limit=23.5,
            saturation_effort=23.5,
            velocity_limit=30.0,
            stiffness=25.0,
            damping=0.5,
        )
    },
)
