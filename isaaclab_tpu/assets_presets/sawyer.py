"""Rethink Sawyer preset (reference ``isaaclab_assets/robots/sawyer.py``):
7-dof arm + head pan. Joint names/limits/actuators mirror the reference
cfg; frames from the public sawyer URDF (capsule colliders)."""

import numpy as np

from ..actuators import ImplicitActuatorCfg
from ..assets import ArticulationCfg, ArticulationInitStateCfg
from ..physics.model import GEOM_CAPSULE, JOINT_REVOLUTE, ModelBuilder

_RX90 = (np.cos(np.pi / 4), np.sin(np.pi / 4), 0.0, 0.0)
_RXN90 = (np.cos(np.pi / 4), -np.sin(np.pi / 4), 0.0, 0.0)


def build_sawyer_model():
    b = ModelBuilder("sawyer")
    # head pan on the torso column
    head = b.add_body(
        "head", -1, JOINT_REVOLUTE, jnt_axis=(0, 0, 1),
        jnt_pos=(0, 0, 0.32), mass=1.6, inertia=np.eye(3) * 0.01,
        jnt_name="head_pan", limits=(-5.1, 0.92),
        effort_limit=8.0, velocity_limit=100.0,
    )
    b.add_geom(head, GEOM_CAPSULE, (0.06, 0.05), pos=(0, 0, 0.1))
    # 7-dof arm (sawyer URDF offsets)
    frames = [
        ((0.081, 0.05, 0.237), (1, 0, 0, 0)),   # right_j0
        ((0.081, 0.0, 0.1425), _RXN90),         # right_j1
        ((0.0, -0.14, 0.1425), _RX90),          # right_j2
        ((0.0, -0.042, 0.26), _RXN90),          # right_j3
        ((0.0, -0.125, -0.1265), _RX90),        # right_j4
        ((0.0, 0.031, 0.275), _RXN90),          # right_j5
        ((0.0, -0.11, 0.1053), _RX90),          # right_j6
    ]
    limits = [
        (-3.05, 3.05), (-3.81, 2.27), (-3.04, 3.04), (-3.04, 3.04),
        (-2.98, 2.98), (-2.98, 2.98), (-4.71, 4.71),
    ]
    masses = [5.3, 4.5, 1.7, 2.5, 1.1, 1.6, 0.3]
    efforts = [80, 80, 40, 40, 9, 9, 9]
    parent = -1
    for i in range(7):
        parent = b.add_body(
            f"right_l{i}", parent, JOINT_REVOLUTE, jnt_axis=(0, 0, 1),
            jnt_pos=frames[i][0], jnt_quat=frames[i][1],
            mass=masses[i], com=(0, 0, 0.05),
            inertia=np.eye(3) * 0.01 * masses[i],
            jnt_name=f"right_j{i}", limits=limits[i],
            effort_limit=efforts[i], velocity_limit=100.0,
        )
        b.add_geom(parent, GEOM_CAPSULE, (0.05, 0.07))
    return b.build()


SAWYER_CFG = ArticulationCfg(
    model=build_sawyer_model,
    init_state=ArticulationInitStateCfg(
        joint_pos={
            "head_pan": 0.0,
            "right_j0": 0.0,
            "right_j1": -0.785,
            "right_j2": 0.0,
            "right_j3": 1.05,
            "right_j4": 0.0,
            "right_j5": 1.3,
            "right_j6": 0.0,
        },
    ),
    actuators={
        "head": ImplicitActuatorCfg(
            joint_names_expr=["head_pan"],
            velocity_limit=100.0,
            effort_limit=8.0,
            stiffness=800.0,
            damping=40.0,
        ),
        "arm": ImplicitActuatorCfg(
            joint_names_expr=["right_j[0-6]"],
            velocity_limit=100.0,
            effort_limit={
                "right_j[0-1]": 80.0,
                "right_j[2-3]": 40.0,
                "right_j[4-6]": 9.0,
            },
            stiffness=100.0,
            damping=4.0,
        ),
    },
)
"""Rethink Robotics Sawyer arm."""
