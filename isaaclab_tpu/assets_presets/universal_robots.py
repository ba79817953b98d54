"""Universal Robots UR10 preset (reference
``isaaclab_assets/robots/universal_robots.py``): 6-dof fixed-base arm with the
standard UR joint names."""

import numpy as np

from ..actuators import ImplicitActuatorCfg
from ..assets import ArticulationCfg, ArticulationInitStateCfg
from ..physics.model import (
    GEOM_CAPSULE,
    GEOM_SPHERE,
    JOINT_REVOLUTE,
    ModelBuilder,
)


def build_ur10_model():
    b = ModelBuilder("ur10")
    # UR10 DH-ish chain: base yaw, shoulder pitch, elbow pitch, 3 wrist axes
    chain = [
        # (name, joint, axis, jnt_pos (in parent frame), mass, geom halflen)
        ("shoulder_link", "shoulder_pan_joint", (0, 0, 1), (0, 0, 0.128), 7.8, 0.08),
        ("upper_arm_link", "shoulder_lift_joint", (0, 1, 0), (0, 0.176, 0.0), 12.9, 0.31),
        ("forearm_link", "elbow_joint", (0, 1, 0), (0, -0.137, 0.613), 3.9, 0.29),
        ("wrist_1_link", "wrist_1_joint", (0, 1, 0), (0, 0, 0.572), 1.96, 0.06),
        ("wrist_2_link", "wrist_2_joint", (0, 0, 1), (0, 0.135, 0), 1.96, 0.06),
        ("wrist_3_link", "wrist_3_joint", (0, 1, 0), (0, 0, 0.12), 0.2, 0.04),
    ]
    parent = -1
    for i, (name, jnt, axis, pos, mass, hl) in enumerate(chain):
        parent = b.add_body(
            name, parent, JOINT_REVOLUTE, jnt_axis=axis, jnt_pos=pos,
            mass=mass, com=(0, 0, hl if i in (1, 2) else 0),
            inertia=np.diag([mass * hl**2 / 3 + 1e-3] * 3),
            jnt_name=jnt, limits=(-6.28, 6.28),
            effort_limit=330.0 if i < 3 else 54.0,
            velocity_limit=2.1 if i < 3 else 3.2,
        )
        if i in (1, 2):
            b.add_geom(parent, GEOM_CAPSULE, (0.05, hl), pos=(0, 0, hl))
        else:
            b.add_geom(parent, GEOM_SPHERE, (0.05,))
    # tool flange body (fixed weld via zero-range revolute is unnecessary —
    # wrist_3_link doubles as the ee; name kept for reference parity)
    b.add_geom(parent, GEOM_SPHERE, (0.03,), pos=(0, 0.08, 0), name="ee_link")
    return b.build()


UR10_CFG = ArticulationCfg(
    model=build_ur10_model,
    init_state=ArticulationInitStateCfg(
        joint_pos={
            "shoulder_pan_joint": 0.0,
            "shoulder_lift_joint": -1.712,
            "elbow_joint": 1.712,
            "wrist_1_joint": 0.0,
            "wrist_2_joint": 0.0,
            "wrist_3_joint": 0.0,
        },
    ),
    actuators={
        "arm": ImplicitActuatorCfg(
            joint_names_expr=[".*"],
            velocity_limit=3.2,
            effort_limit=330.0,
            stiffness=800.0,
            damping=40.0,
        )
    },
)
