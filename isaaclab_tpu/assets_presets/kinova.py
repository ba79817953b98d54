"""Kinova arm presets (reference ``isaaclab_assets/robots/kinova.py``):
JACO2 7-dof / 6-dof with 3-finger grippers and Gen3 7-dof. Joint names,
limits, init states and actuator groups mirror the reference cfgs; link
frames come from the public Kinova URDFs (approximate capsule colliders —
no USD meshes in this build)."""

import numpy as np

from ..actuators import ImplicitActuatorCfg
from ..assets import ArticulationCfg, ArticulationInitStateCfg
from ..physics.model import (
    GEOM_CAPSULE,
    JOINT_REVOLUTE,
    ModelBuilder,
)

_RX90 = (np.cos(np.pi / 4), np.sin(np.pi / 4), 0.0, 0.0)
_RXN90 = (np.cos(np.pi / 4), -np.sin(np.pi / 4), 0.0, 0.0)
_FULL = (-1e9, 1e9)  # continuous joints


def _add_three_finger_gripper(b, parent, prefix):
    """JACO2 KG-3 gripper: 3 proximal + 3 tip revolute joints."""
    for i, ang in enumerate((0.0, 2.0 * np.pi / 3, -2.0 * np.pi / 3)):
        c, s = np.cos(ang / 2), np.sin(ang / 2)
        fin = b.add_body(
            f"{prefix}_link_finger_{i + 1}", parent, JOINT_REVOLUTE,
            jnt_axis=(0, 1, 0),
            jnt_pos=(0.03 * np.cos(ang), 0.03 * np.sin(ang), 0.1),
            jnt_quat=(c, 0, 0, s),
            mass=0.03, inertia=np.eye(3) * 1e-5,
            jnt_name=f"{prefix}_joint_finger_{i + 1}", limits=(0.0, 1.51),
            effort_limit=2.0, velocity_limit=1.0,
        )
        b.add_geom(fin, GEOM_CAPSULE, (0.008, 0.02), pos=(0, 0, 0.02),
                   friction=1.5)
        tip = b.add_body(
            f"{prefix}_link_finger_tip_{i + 1}", fin, JOINT_REVOLUTE,
            jnt_axis=(0, 1, 0), jnt_pos=(0, 0, 0.044),
            mass=0.01, inertia=np.eye(3) * 5e-6,
            jnt_name=f"{prefix}_joint_finger_tip_{i + 1}", limits=(0.0, 2.0),
            effort_limit=2.0, velocity_limit=1.0,
        )
        b.add_geom(tip, GEOM_CAPSULE, (0.007, 0.015), pos=(0, 0, 0.015),
                   friction=1.5)


def build_jaco2_n7s300():
    """JACO2 7-dof spherical-wrist arm (j2n7s300 URDF frames)."""
    b = ModelBuilder("kinova_jaco2_n7s300")
    p = "j2n7s300"
    frames = [
        ((0, 0, 0.1567), (0, 1, 0, 0)),        # joint_1 (base, flipped z)
        ((0, 0.0016, -0.1186), _RX90),
        ((0, -0.2051, 0), _RXN90),
        ((0, 0.0016, -0.2051), _RX90),
        ((0, -0.2073, 0), _RXN90),
        ((0, 0.0016, -0.1038), _RX90),
        ((0, -0.1038, 0), _RXN90),
    ]
    masses = [0.74, 0.74, 0.99, 0.66, 0.66, 0.41, 0.41]
    parent = -1
    for i in range(7):
        parent = b.add_body(
            f"{p}_link_{i + 1}", parent, JOINT_REVOLUTE, jnt_axis=(0, 0, 1),
            jnt_pos=frames[i][0], jnt_quat=frames[i][1],
            mass=masses[i], com=(0, 0, -0.04),
            inertia=np.eye(3) * 0.01 * masses[i],
            jnt_name=f"{p}_joint_{i + 1}",
            limits=_FULL if i in (0, 2, 4, 6) else (0.47, 5.97),
            effort_limit=80.0 if i < 2 else (40.0 if i < 4 else 20.0),
            velocity_limit=100.0,
        )
        b.add_geom(parent, GEOM_CAPSULE, (0.035, 0.06))
    _add_three_finger_gripper(b, parent, p)
    return b.build()


def build_jaco2_n6s300():
    """JACO2 6-dof arm (j2n6s300 URDF frames)."""
    b = ModelBuilder("kinova_jaco2_n6s300")
    p = "j2n6s300"
    frames = [
        ((0, 0, 0.1567), (0, 1, 0, 0)),
        ((0, 0.0016, -0.1186), _RX90),
        ((0, -0.41, 0), (1, 0, 0, 0)),
        ((0, 0.2073, -0.0114), _RXN90),
        ((0, 0.0016, -0.1038), _RX90),
        ((0, -0.1038, 0), _RXN90),
    ]
    masses = [0.74, 0.99, 0.79, 0.41, 0.41, 0.36]
    parent = -1
    for i in range(6):
        parent = b.add_body(
            f"{p}_link_{i + 1}", parent, JOINT_REVOLUTE, jnt_axis=(0, 0, 1),
            jnt_pos=frames[i][0], jnt_quat=frames[i][1],
            mass=masses[i], com=(0, 0, -0.04),
            inertia=np.eye(3) * 0.01 * masses[i],
            jnt_name=f"{p}_joint_{i + 1}",
            limits=_FULL if i in (0, 3, 4, 5) else (0.47, 5.97),
            effort_limit=80.0 if i < 2 else (40.0 if i < 3 else 20.0),
            velocity_limit=100.0,
        )
        b.add_geom(parent, GEOM_CAPSULE, (0.035, 0.06))
    _add_three_finger_gripper(b, parent, p)
    return b.build()


def build_gen3_n7():
    """Kinova Gen3 7-dof (gen3n7 URDF frames), no gripper."""
    b = ModelBuilder("kinova_gen3_n7")
    frames = [
        ((0, 0, 0.1564), (1, 0, 0, 0)),
        ((0, 0.0054, -0.1284), _RX90),
        ((0, -0.2104, -0.0064), _RXN90),
        ((0, 0.0064, -0.2104), _RX90),
        ((0, -0.2084, -0.0064), _RXN90),
        ((0, 0, -0.1059), _RX90),
        ((0, -0.1059, 0), _RXN90),
    ]
    masses = [1.38, 1.16, 1.16, 0.93, 0.68, 0.68, 0.5]
    parent = -1
    for i in range(7):
        parent = b.add_body(
            f"gen3_link_{i + 1}", parent, JOINT_REVOLUTE, jnt_axis=(0, 0, 1),
            jnt_pos=frames[i][0], jnt_quat=frames[i][1],
            mass=masses[i], com=(0, 0, -0.04),
            inertia=np.eye(3) * 0.01 * masses[i],
            jnt_name=f"joint_{i + 1}",
            limits=_FULL if i in (0, 2, 4, 6) else (-2.41, 2.41),
            effort_limit=39.0 if i < 4 else 9.0,
            velocity_limit=100.0,
        )
        b.add_geom(parent, GEOM_CAPSULE, (0.04, 0.06))
    return b.build()


KINOVA_JACO2_N7S300_CFG = ArticulationCfg(
    model=build_jaco2_n7s300,
    init_state=ArticulationInitStateCfg(
        joint_pos={
            "j2n7s300_joint_1": 0.0,
            "j2n7s300_joint_2": 2.76,
            "j2n7s300_joint_3": 0.0,
            "j2n7s300_joint_4": 2.0,
            "j2n7s300_joint_5": 2.0,
            "j2n7s300_joint_6": 0.0,
            "j2n7s300_joint_7": 0.0,
            "j2n7s300_joint_finger_[1-3]": 0.2,
            "j2n7s300_joint_finger_tip_[1-3]": 0.2,
        },
    ),
    actuators={
        "arm": ImplicitActuatorCfg(
            joint_names_expr=[".*_joint_[1-7]"],
            velocity_limit=100.0,
            effort_limit={
                ".*_joint_[1-2]": 80.0,
                ".*_joint_[3-4]": 40.0,
                ".*_joint_[5-7]": 20.0,
            },
            stiffness={".*_joint_[1-4]": 40.0, ".*_joint_[5-7]": 15.0},
            damping={".*_joint_[1-4]": 1.0, ".*_joint_[5-7]": 0.5},
        ),
        "gripper": ImplicitActuatorCfg(
            joint_names_expr=[".*_finger_[1-3]", ".*_finger_tip_[1-3]"],
            velocity_limit=100.0,
            effort_limit=2.0,
            stiffness=1.2,
            damping=0.01,
        ),
    },
)
"""Kinova JACO2 (7-Dof) arm with 3-finger gripper."""

KINOVA_JACO2_N6S300_CFG = ArticulationCfg(
    model=build_jaco2_n6s300,
    init_state=ArticulationInitStateCfg(
        joint_pos={
            "j2n6s300_joint_1": 0.0,
            "j2n6s300_joint_2": 2.76,
            "j2n6s300_joint_3": 2.76,
            "j2n6s300_joint_4": 2.5,
            "j2n6s300_joint_5": 2.0,
            "j2n6s300_joint_6": 0.0,
            "j2n6s300_joint_finger_[1-3]": 0.2,
            "j2n6s300_joint_finger_tip_[1-3]": 0.2,
        },
    ),
    actuators={
        "arm": ImplicitActuatorCfg(
            joint_names_expr=[".*_joint_[1-6]"],
            velocity_limit=100.0,
            effort_limit={
                ".*_joint_[1-2]": 80.0,
                ".*_joint_3": 40.0,
                ".*_joint_[4-6]": 20.0,
            },
            stiffness={".*_joint_[1-3]": 40.0, ".*_joint_[4-6]": 15.0},
            damping={".*_joint_[1-3]": 1.0, ".*_joint_[4-6]": 0.5},
        ),
        "gripper": ImplicitActuatorCfg(
            joint_names_expr=[".*_finger_[1-3]", ".*_finger_tip_[1-3]"],
            velocity_limit=100.0,
            effort_limit=2.0,
            stiffness=1.2,
            damping=0.01,
        ),
    },
)
"""Kinova JACO2 (6-Dof) arm with 3-finger gripper."""

KINOVA_GEN3_N7_CFG = ArticulationCfg(
    model=build_gen3_n7,
    init_state=ArticulationInitStateCfg(
        joint_pos={
            "joint_1": 0.0,
            "joint_2": 0.65,
            "joint_3": 0.0,
            "joint_4": 1.89,
            "joint_5": 0.0,
            "joint_6": 0.6,
            "joint_7": -1.57,
        },
    ),
    actuators={
        "arm": ImplicitActuatorCfg(
            joint_names_expr=["joint_[1-7]"],
            velocity_limit=100.0,
            effort_limit={"joint_[1-4]": 39.0, "joint_[5-7]": 9.0},
            stiffness={"joint_[1-4]": 40.0, "joint_[5-7]": 15.0},
            damping={"joint_[1-4]": 1.0, "joint_[5-7]": 0.5},
        ),
    },
)
"""Kinova Gen3 (7-Dof) arm with no gripper."""
