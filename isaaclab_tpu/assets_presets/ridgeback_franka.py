"""Clearpath Ridgeback + Franka Panda preset (reference
``isaaclab_assets/robots/ridgeback_franka.py``): a planar (x, y, yaw)
'dummy'-joint mobile base carrying the Panda arm — the reference models the
holonomic base as two prismatic + one revolute joint, velocity-controlled
(stiffness 0, large damping)."""

import numpy as np

from ..actuators import ImplicitActuatorCfg
from ..assets import ArticulationCfg, ArticulationInitStateCfg
from ..physics.model import (
    GEOM_BOX,
    GEOM_CAPSULE,
    JOINT_FIXED,
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    ModelBuilder,
)

_RX90 = (np.cos(np.pi / 4), np.sin(np.pi / 4), 0.0, 0.0)
_RXN90 = (np.cos(np.pi / 4), -np.sin(np.pi / 4), 0.0, 0.0)


def build_ridgeback_franka_model():
    b = ModelBuilder("ridgeback_franka")
    # planar dummy-joint base: y prismatic -> x prismatic -> z revolute
    by = b.add_body(
        "dummy_base_y", -1, JOINT_PRISMATIC, jnt_axis=(0, 1, 0),
        mass=1.0, inertia=np.eye(3) * 0.01,
        jnt_name="dummy_base_prismatic_y_joint", limits=(-100.0, 100.0),
        effort_limit=1000.0, velocity_limit=100.0,
    )
    bx = b.add_body(
        "dummy_base_x", by, JOINT_PRISMATIC, jnt_axis=(1, 0, 0),
        mass=1.0, inertia=np.eye(3) * 0.01,
        jnt_name="dummy_base_prismatic_x_joint", limits=(-100.0, 100.0),
        effort_limit=1000.0, velocity_limit=100.0,
    )
    base = b.add_body(
        "base_link", bx, JOINT_REVOLUTE, jnt_axis=(0, 0, 1),
        mass=110.0, inertia=np.eye(3) * 2.0,
        jnt_name="dummy_base_revolute_z_joint", limits=(-1e9, 1e9),
        effort_limit=1000.0, velocity_limit=100.0,
    )
    b.add_geom(base, GEOM_BOX, (0.48, 0.4, 0.15), pos=(0, 0, 0.15))
    # panda arm mounted on the chassis top (z ~ 0.3)
    masses = [4.97, 0.65, 3.23, 3.59, 1.23, 1.67, 0.74]
    frames = [
        ((0, 0, 0.633), (1, 0, 0, 0)),  # 0.3 chassis + 0.333 panda link0
        ((0, 0, 0), _RXN90),
        ((0, -0.316, 0), _RX90),
        ((0.0825, 0, 0), _RX90),
        ((-0.0825, 0.384, 0), _RXN90),
        ((0, 0, 0), _RX90),
        ((0.088, 0, 0), _RX90),
    ]
    limits = [
        (-2.8973, 2.8973), (-1.7628, 1.7628), (-2.8973, 2.8973),
        (-3.0718, -0.0698), (-2.8973, 2.8973), (-0.0175, 3.7525),
        (-2.8973, 2.8973),
    ]
    efforts = [87, 87, 87, 87, 12, 12, 12]
    parent = base
    for i in range(7):
        parent = b.add_body(
            f"panda_link{i + 1}", parent, JOINT_REVOLUTE, jnt_axis=(0, 0, 1),
            jnt_pos=frames[i][0], jnt_quat=frames[i][1],
            mass=masses[i], com=(0, 0, -0.05),
            inertia=np.eye(3) * 0.01 * masses[i],
            jnt_name=f"panda_joint{i + 1}", limits=limits[i],
            effort_limit=efforts[i], velocity_limit=2.6,
        )
        b.add_geom(parent, GEOM_CAPSULE, (0.06, 0.08))
    hand = b.add_body(
        "panda_hand", parent, JOINT_FIXED,
        jnt_pos=(0, 0, 0.107),
        jnt_quat=(np.cos(-np.pi / 8), 0, 0, np.sin(-np.pi / 8)),
        mass=0.73, inertia=np.eye(3) * 0.003,
    )
    b.add_geom(hand, GEOM_BOX, (0.03, 0.1, 0.03), pos=(0, 0, 0.03))
    for side, sy in (("left", 1), ("right", -1)):
        finger = b.add_body(
            f"panda_{side}finger", hand, JOINT_PRISMATIC, jnt_axis=(0, sy, 0),
            jnt_pos=(0, 0, 0.0584), mass=0.1, inertia=np.eye(3) * 1e-4,
            jnt_name=f"panda_finger_joint{1 if side == 'left' else 2}",
            limits=(0.0, 0.04), effort_limit=200.0, velocity_limit=0.2,
        )
        b.add_geom(finger, GEOM_CAPSULE, (0.009, 0.02),
                   pos=(0, sy * 0.008, 0.035), friction=2.0,
                   name=f"{side}_fingertip")
    return b.build()


RIDGEBACK_FRANKA_PANDA_CFG = ArticulationCfg(
    model=build_ridgeback_franka_model,
    init_state=ArticulationInitStateCfg(
        joint_pos={
            "dummy_base_prismatic_y_joint": 0.0,
            "dummy_base_prismatic_x_joint": 0.0,
            "dummy_base_revolute_z_joint": 0.0,
            "panda_joint1": 0.0,
            "panda_joint2": -0.569,
            "panda_joint3": 0.0,
            "panda_joint4": -2.810,
            "panda_joint5": 0.0,
            "panda_joint6": 2.0,
            "panda_joint7": 0.741,
            "panda_finger_joint.*": 0.035,
        },
    ),
    actuators={
        "base": ImplicitActuatorCfg(
            joint_names_expr=["dummy_base_.*"],
            velocity_limit=100.0,
            effort_limit=1000.0,
            stiffness=0.0,
            damping=1e5,
        ),
        "panda_shoulder": ImplicitActuatorCfg(
            joint_names_expr=["panda_joint[1-4]"],
            effort_limit=87.0,
            velocity_limit=100.0,
            stiffness=800.0,
            damping=40.0,
        ),
        "panda_forearm": ImplicitActuatorCfg(
            joint_names_expr=["panda_joint[5-7]"],
            effort_limit=12.0,
            velocity_limit=100.0,
            stiffness=800.0,
            damping=40.0,
        ),
        "panda_hand": ImplicitActuatorCfg(
            joint_names_expr=["panda_finger_joint.*"],
            effort_limit=200.0,
            velocity_limit=0.2,
            stiffness=1e5,
            damping=1e3,
        ),
    },
)
"""Franka arm with Franka Hand on a Clearpath Ridgeback holonomic base."""
