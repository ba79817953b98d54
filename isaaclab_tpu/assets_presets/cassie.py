"""Agility Robotics Cassie preset (reference
``isaaclab_assets/robots/cassie.py``).

Cassie's physical leg is a closed four-bar linkage; like the reference USD
(which exposes the serialized chain with passive shin/heel-spring joints kept
near zero by stiff springs) we model the serial chain: per leg —
hip_abduction, hip_rotation, hip_flexion, thigh→shin (knee_joint),
shin→tarsus (ankle_joint, spring-held), toe_joint. 12 dof total.
"""

import numpy as np

from ..actuators import ImplicitActuatorCfg
from ..assets import ArticulationCfg, ArticulationInitStateCfg
from ..physics.model import (
    GEOM_BOX,
    GEOM_CAPSULE,
    JOINT_FREE,
    JOINT_REVOLUTE,
    ModelBuilder,
)


def build_cassie_model():
    b = ModelBuilder("cassie")
    pelvis = b.add_body(
        "pelvis", -1, JOINT_FREE, mass=10.33,
        inertia=np.diag([0.09, 0.08, 0.11]),
    )
    b.add_geom(pelvis, GEOM_BOX, (0.12, 0.15, 0.1))
    thigh_len, shin_len, tarsus_len = 0.27, 0.33, 0.32
    for side, sy in (("left", 1), ("right", -1)):
        abd = b.add_body(
            f"{side}_hip_abduction_link", pelvis, JOINT_REVOLUTE,
            jnt_axis=(1, 0, 0), jnt_pos=(0.021, sy * 0.135, 0.0),
            mass=1.8, inertia=np.eye(3) * 0.005,
            jnt_name=f"hip_abduction_{side}", limits=(-0.26, 0.39),
            effort_limit=80.0, velocity_limit=12.0,
        )
        rot = b.add_body(
            f"{side}_hip_rotation_link", abd, JOINT_REVOLUTE,
            jnt_axis=(0, 0, 1), mass=1.2, inertia=np.eye(3) * 0.004,
            jnt_name=f"hip_rotation_{side}", limits=(-0.39, 0.39),
            effort_limit=80.0, velocity_limit=12.0,
        )
        thigh = b.add_body(
            f"{side}_thigh", rot, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
            mass=5.5, com=(0, 0, -thigh_len / 2),
            inertia=np.diag([0.04, 0.04, 0.008]),
            jnt_name=f"hip_flexion_{side}", limits=(-0.87, 1.4),
            effort_limit=110.0, velocity_limit=9.0,
        )
        b.add_geom(thigh, GEOM_CAPSULE, (0.05, thigh_len / 2),
                   pos=(0, 0, -thigh_len / 2))
        shin = b.add_body(
            f"{side}_shin", thigh, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
            jnt_pos=(0, 0, -thigh_len), mass=1.2, com=(0, 0, -shin_len / 2),
            inertia=np.diag([0.01, 0.01, 0.001]),
            jnt_name=f"knee_joint_{side}", limits=(-2.86, -0.65),
            effort_limit=110.0, velocity_limit=9.0,
        )
        b.add_geom(shin, GEOM_CAPSULE, (0.03, shin_len / 2),
                   pos=(0, 0, -shin_len / 2))
        tarsus = b.add_body(
            f"{side}_tarsus", shin, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
            jnt_pos=(0, 0, -shin_len), mass=0.9, com=(0, 0, -tarsus_len / 2),
            inertia=np.diag([0.008, 0.008, 0.001]),
            jnt_name=f"ankle_joint_{side}", limits=(0.65, 2.86),
            effort_limit=60.0, velocity_limit=12.0,
        )
        b.add_geom(tarsus, GEOM_CAPSULE, (0.022, tarsus_len / 2),
                   pos=(0, 0, -tarsus_len / 2))
        toe = b.add_body(
            f"{side}_toe", tarsus, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
            jnt_pos=(0, 0, -tarsus_len), mass=0.15, com=(0.03, 0, -0.01),
            inertia=np.eye(3) * 0.0005,
            jnt_name=f"toe_joint_{side}", limits=(-2.44, -0.52),
            effort_limit=30.0, velocity_limit=12.0,
        )
        b.add_geom(toe, GEOM_BOX, (0.08, 0.03, 0.01), pos=(0.02, 0, -0.02),
                   friction=1.0)
    return b.build()


CASSIE_CFG = ArticulationCfg(
    model=build_cassie_model,
    init_state=ArticulationInitStateCfg(
        pos=(0.0, 0.0, 0.9),
        joint_pos={
            "hip_abduction_left": 0.1,
            "hip_rotation_left": 0.0,
            "hip_flexion_left": 1.0,
            "knee_joint_left": -1.8,
            "ankle_joint_left": 1.57,
            "toe_joint_left": -1.57,
            "hip_abduction_right": -0.1,
            "hip_rotation_right": 0.0,
            "hip_flexion_right": 1.0,
            "knee_joint_right": -1.8,
            "ankle_joint_right": 1.57,
            "toe_joint_right": -1.57,
        },
    ),
    soft_joint_pos_limit_factor=0.9,
    actuators={
        "legs": ImplicitActuatorCfg(
            joint_names_expr=["hip_.*", "knee_joint_.*", "toe_joint_.*"],
            stiffness={"hip_.*": 100.0, "knee_joint_.*": 200.0,
                       "toe_joint_.*": 20.0},
            damping={"hip_.*": 3.0, "knee_joint_.*": 6.0, "toe_joint_.*": 1.0},
        ),
        # passive spring joint (the physical leaf-spring of the four-bar)
        "tarsus_spring": ImplicitActuatorCfg(
            joint_names_expr=["ankle_joint_.*"], stiffness=300.0, damping=8.0,
        ),
    },
)
