"""Allegro-hand preset (reference ``isaaclab_assets/robots/allegro.py``):
16-dof dexterous hand — 3 fingers + thumb, 4 joints each, fixed-base palm
facing up (the in-hand repose variant robot)."""

import numpy as np

from ..actuators import ImplicitActuatorCfg
from ..assets import ArticulationCfg, ArticulationInitStateCfg
from ..physics.model import (
    GEOM_BOX,
    GEOM_CAPSULE,
    JOINT_FIXED,
    JOINT_REVOLUTE,
    ModelBuilder,
)


def build_allegro_hand_model():
    b = ModelBuilder("allegro_hand")
    palm = b.add_body(
        "palm_link", -1, JOINT_FIXED, mass=0.4, inertia=np.eye(3) * 0.002,
    )
    b.add_geom(palm, GEOM_BOX, (0.048, 0.055, 0.012), pos=(0, 0, 0.02))

    seg_len = (0.054, 0.038, 0.026)  # proximal, middle, distal
    finger_y = {"index": 0.045, "middle": 0.0, "ring": -0.045}
    for fn, fy in finger_y.items():
        # joint_0: abduction (yaw), then 3 flexion joints
        parent = b.add_body(
            f"{fn}_link_0", palm, JOINT_REVOLUTE, jnt_axis=(0, 0, 1),
            jnt_pos=(0.01, fy, 0.035), mass=0.015, inertia=np.eye(3) * 2e-5,
            jnt_name=f"{fn}_joint_0", limits=(-0.47, 0.47),
            effort_limit=0.7, velocity_limit=7.0, damping=0.05,
        )
        for pi in range(3):
            L = seg_len[pi]
            parent = b.add_body(
                f"{fn}_link_{pi + 1}", parent, JOINT_REVOLUTE,
                jnt_axis=(0, 1, 0),
                jnt_pos=(0, 0, 0 if pi == 0 else seg_len[pi - 1]),
                mass=0.02, com=(0, 0, L / 2), inertia=np.eye(3) * 2e-5,
                jnt_name=f"{fn}_joint_{pi + 1}",
                limits=(-0.196, 1.61) if pi == 0 else (-0.174, 1.709),
                effort_limit=0.7, velocity_limit=7.0, damping=0.05,
            )
            b.add_geom(parent, GEOM_CAPSULE, (0.011, L / 2), pos=(0, 0, L / 2),
                       friction=1.2,
                       name=f"{fn}_tip" if pi == 2 else "")
    # thumb: rotated base, 4 joints
    th = b.add_body(
        "thumb_link_0", palm, JOINT_REVOLUTE, jnt_axis=(1, 0, 0),
        jnt_pos=(0.02, 0.06, 0.005),
        jnt_quat=(np.cos(np.pi / 4), 0, np.sin(np.pi / 4), 0),
        mass=0.02, inertia=np.eye(3) * 2e-5, jnt_name="thumb_joint_0",
        limits=(0.26, 1.4), effort_limit=0.9, velocity_limit=7.0, damping=0.05,
    )
    for pi, (lim, L) in enumerate(
        [((-0.105, 1.163), 0.052), ((-0.189, 1.644), 0.042),
         ((-0.162, 1.719), 0.03)]
    ):
        th = b.add_body(
            f"thumb_link_{pi + 1}", th, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
            jnt_pos=(0, 0, 0 if pi == 0 else (0.052 if pi == 1 else 0.042)),
            mass=0.02, com=(0, 0, L / 2), inertia=np.eye(3) * 2e-5,
            jnt_name=f"thumb_joint_{pi + 1}", limits=lim,
            effort_limit=0.9, velocity_limit=7.0, damping=0.05,
        )
        b.add_geom(th, GEOM_CAPSULE, (0.013, L / 2), pos=(0, 0, L / 2),
                   friction=1.2, name="thumb_tip" if pi == 2 else "")
    return b.build()


ALLEGRO_HAND_CFG = ArticulationCfg(
    model=build_allegro_hand_model,
    init_state=ArticulationInitStateCfg(
        pos=(0.0, 0.0, 0.5),
        # fingers point up; cube rests above the palm (repose setup)
        joint_pos={
            "(index|middle|ring)_joint_0": 0.0,
            ".*_joint_[1-3]": 0.28,
            "thumb_joint_0": 0.5,
        },
    ),
    soft_joint_pos_limit_factor=1.0,
    actuators={
        "fingers": ImplicitActuatorCfg(
            joint_names_expr=[".*"],
            effort_limit=0.5,
            velocity_limit=100.0,
            stiffness=3.0,
            damping=0.1,
        )
    },
)
