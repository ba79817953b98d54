"""Shadow-hand preset (reference ``isaaclab_assets/robots/shadow_hand.py``).

Programmatic 24-dof dexterous hand: 4 fingers x (knuckle, proximal, middle,
distal) + 5-joint thumb + 2-dof wrist, with fingertip/phalange capsule
colliders — the in-hand repose benchmark robot (BASELINE.md Shadow rows).
"""

import numpy as np

from ..actuators import ImplicitActuatorCfg
from ..assets import ArticulationCfg, ArticulationInitStateCfg
from ..physics.model import (
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_SPHERE,
    JOINT_FIXED,
    JOINT_REVOLUTE,
    ModelBuilder,
)


def build_shadow_hand_model():
    b = ModelBuilder("shadow_hand")
    # forearm fixed to world, palm via 2-dof wrist
    forearm = b.add_body(
        "robot0_forearm", -1, JOINT_FIXED, mass=1.8, inertia=np.eye(3) * 0.01,
    )
    wrj1 = b.add_body(
        "robot0_wrist", forearm, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
        jnt_pos=(0, 0, 0.25), mass=0.3, inertia=np.eye(3) * 0.001,
        jnt_name="robot0_WRJ1", limits=(-0.49, 0.14), effort_limit=4.8,
        velocity_limit=2.0, damping=0.1,
    )
    palm = b.add_body(
        "robot0_palm", wrj1, JOINT_REVOLUTE, jnt_axis=(1, 0, 0),
        mass=0.3, com=(0, 0, 0.035), inertia=np.eye(3) * 0.001,
        jnt_name="robot0_WRJ0", limits=(-0.70, 0.49), effort_limit=2.2,
        velocity_limit=2.0, damping=0.1,
    )
    b.add_geom(palm, GEOM_BOX, (0.032, 0.045, 0.05), pos=(0, 0, 0.035))

    phal_len = (0.045, 0.025, 0.026)  # proximal, middle, distal
    finger_x = {"FF": 0.033, "MF": 0.011, "RF": -0.011, "LF": -0.033}
    for fn, fx in finger_x.items():
        base_z = 0.09 if fn != "LF" else 0.082
        kn = b.add_body(
            f"robot0_{fn}_knuckle", palm, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
            jnt_pos=(fx, 0, base_z), mass=0.01, inertia=np.eye(3) * 1e-5,
            jnt_name=f"robot0_{fn}J3", limits=(-0.349, 0.349),
            effort_limit=0.9, velocity_limit=4.0, damping=0.05,
        )
        parent = kn
        for pi, (jname, lim) in enumerate(
            [("J2", (0.0, 1.571)), ("J1", (0.0, 1.571)), ("J0", (0.0, 1.571))]
        ):
            L = phal_len[pi]
            parent = b.add_body(
                f"robot0_{fn}_{['proximal','middle','distal'][pi]}",
                parent, JOINT_REVOLUTE, jnt_axis=(1, 0, 0),
                jnt_pos=(0, 0, 0 if pi == 0 else phal_len[pi - 1]),
                mass=0.012, com=(0, 0, L / 2), inertia=np.eye(3) * 1e-5,
                jnt_name=f"robot0_{fn}{jname}", limits=lim,
                effort_limit=0.9, velocity_limit=4.0, damping=0.05,
            )
            b.add_geom(parent, GEOM_CAPSULE, (0.009, L / 2), pos=(0, 0, L / 2),
                       friction=1.2,
                       name=f"{fn}_tip" if pi == 2 else "")
        # distal coupling tendon: J0 follows J1 (Shadow's underactuated
        # distal pair; reference shadow_hand.py:46 FixedTendonPropertiesCfg
        # limit_stiffness=30, damping=0.1 — zero-width limit band enforces
        # L = q_J1 - q_J0 = 0)
        b.add_tendon(
            f"robot0_{fn}J1_tendon",
            {f"robot0_{fn}J1": 1.0, f"robot0_{fn}J0": -1.0},
            limit_stiffness=30.0, damping=0.1, limits=(0.0, 0.0),
        )
    # thumb: 5 joints
    th = b.add_body(
        "robot0_TH_base", palm, JOINT_REVOLUTE, jnt_axis=(0, 0, 1),
        jnt_pos=(0.034, -0.009, 0.029),
        jnt_quat=(np.cos(np.pi / 8), 0, np.sin(np.pi / 8), 0),
        mass=0.01, inertia=np.eye(3) * 1e-5, jnt_name="robot0_THJ4",
        limits=(-1.047, 1.047), effort_limit=2.3, velocity_limit=4.0,
        damping=0.05,
    )
    th = b.add_body(
        "robot0_TH_proximal", th, JOINT_REVOLUTE, jnt_axis=(1, 0, 0),
        mass=0.02, com=(0, 0, 0.019), inertia=np.eye(3) * 1e-5,
        jnt_name="robot0_THJ3", limits=(0.0, 1.222), effort_limit=2.3,
        velocity_limit=4.0, damping=0.05,
    )
    b.add_geom(th, GEOM_CAPSULE, (0.011, 0.019), pos=(0, 0, 0.019), friction=1.2)
    th = b.add_body(
        "robot0_TH_hub", th, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
        jnt_pos=(0, 0, 0.038), mass=0.01, inertia=np.eye(3) * 1e-5,
        jnt_name="robot0_THJ2", limits=(-0.209, 0.209), effort_limit=0.9,
        velocity_limit=4.0, damping=0.05,
    )
    th = b.add_body(
        "robot0_TH_middle", th, JOINT_REVOLUTE, jnt_axis=(1, 0, 0),
        mass=0.016, com=(0, 0, 0.016), inertia=np.eye(3) * 1e-5,
        jnt_name="robot0_THJ1", limits=(-0.524, 0.524), effort_limit=0.9,
        velocity_limit=4.0, damping=0.05,
    )
    b.add_geom(th, GEOM_CAPSULE, (0.010, 0.016), pos=(0, 0, 0.016), friction=1.2)
    th = b.add_body(
        "robot0_TH_distal", th, JOINT_REVOLUTE, jnt_axis=(1, 0, 0),
        jnt_pos=(0, 0, 0.032), mass=0.014, com=(0, 0, 0.014),
        inertia=np.eye(3) * 1e-5, jnt_name="robot0_THJ0",
        limits=(-1.571, 0.0), effort_limit=0.9, velocity_limit=4.0,
        damping=0.05,
    )
    b.add_geom(th, GEOM_CAPSULE, (0.010, 0.014), pos=(0, 0, 0.014),
               friction=1.2, name="TH_tip")
    return b.build()


SHADOW_HAND_CFG = ArticulationCfg(
    model=build_shadow_hand_model,
    init_state=ArticulationInitStateCfg(
        pos=(0.0, 0.0, 0.5),
        rot=(0.0, 0.0, -0.7071, 0.7071),  # palm up
        joint_pos={".*": 0.0},
    ),
    actuators={
        "fingers": ImplicitActuatorCfg(
            joint_names_expr=["robot0_WRJ[0-1]", "robot0_(FF|MF|RF|LF|TH)J[0-4]"],
            effort_limit={
                "robot0_WRJ1": 4.785,
                "robot0_WRJ0": 2.175,
                "robot0_(FF|MF|RF|LF)J[0-3]": 0.9,
                "robot0_THJ4": 2.3722,
                "robot0_THJ3": 1.45,
                "robot0_THJ[0-2]": 0.99,
            },
            stiffness={"robot0_WRJ.*": 5.0, "robot0_(FF|MF|RF|LF|TH)J.*": 1.0},
            damping={"robot0_WRJ.*": 0.5, "robot0_(FF|MF|RF|LF|TH)J.*": 0.1},
        ),
    },
    soft_joint_pos_limit_factor=1.0,
)
