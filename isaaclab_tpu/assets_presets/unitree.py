"""Unitree quadruped presets (reference ``isaaclab_assets/robots/unitree.py``):
A1 and Go2 — same 12-dof topology as ANYmal with Unitree joint names
({F,R}{L,R}_{hip,thigh,calf}_joint) and massing."""

import numpy as np

from ..actuators import DCMotorCfg, ImplicitActuatorCfg
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


def build_go1_model():
    return build_unitree_model(
        "unitree_go1", base_mass=5.2, hip_xy=(0.1881, 0.04675),
        thigh_len=0.213, calf_len=0.213, thigh_mass=1.0, calf_mass=0.21,
        effort=23.7, velocity=30.0,
    )


UNITREE_GO1_CFG = ArticulationCfg(
    model=build_go1_model,
    init_state=_A1_INIT.replace(pos=(0.0, 0.0, 0.4)),
    soft_joint_pos_limit_factor=0.9,
    actuators={
        "base_legs": DCMotorCfg(
            joint_names_expr=[".*_hip_joint", ".*_thigh_joint", ".*_calf_joint"],
            effort_limit=23.7,
            saturation_effort=23.7,
            velocity_limit=30.0,
            stiffness=25.0,
            damping=0.5,
        )
    },
)


# ---------------------------------------------------------------------------
# Unitree humanoids (reference isaaclab_assets/robots/unitree.py H1_CFG,
# G1_MINIMAL_CFG): 19-dof H1 and 23-dof G1, programmatic kinematic trees with
# the reference joint names.
# ---------------------------------------------------------------------------


def build_h1_model():
    """Unitree H1: 2x5 leg + 1 torso + 2x4 arm = 19 dof."""
    b = ModelBuilder("unitree_h1")
    pelvis = b.add_body(
        "pelvis", -1, JOINT_FREE, mass=8.0, inertia=np.diag([0.08, 0.06, 0.05])
    )
    b.add_geom(pelvis, GEOM_BOX, (0.08, 0.12, 0.07))
    thigh_len, shin_len = 0.4, 0.4
    for side, sy in (("left", 1), ("right", -1)):
        hip_yaw = b.add_body(
            f"{side}_hip_yaw_link", pelvis, JOINT_REVOLUTE, jnt_axis=(0, 0, 1),
            jnt_pos=(0, sy * 0.0875, -0.17), mass=2.2, inertia=np.eye(3) * 0.01,
            jnt_name=f"{side}_hip_yaw", limits=(-0.43, 0.43),
            effort_limit=200.0, velocity_limit=23.0,
        )
        hip_roll = b.add_body(
            f"{side}_hip_roll_link", hip_yaw, JOINT_REVOLUTE, jnt_axis=(1, 0, 0),
            mass=2.2, inertia=np.eye(3) * 0.01,
            jnt_name=f"{side}_hip_roll", limits=(-0.43, 0.43),
            effort_limit=200.0, velocity_limit=23.0,
        )
        thigh = b.add_body(
            f"{side}_hip_pitch_link", hip_roll, JOINT_REVOLUTE,
            jnt_axis=(0, 1, 0), mass=4.2, com=(0, 0, -thigh_len / 2),
            inertia=np.diag([0.08, 0.08, 0.01]),
            jnt_name=f"{side}_hip_pitch", limits=(-3.14, 2.5),
            effort_limit=200.0, velocity_limit=23.0,
        )
        b.add_geom(thigh, GEOM_CAPSULE, (0.05, thigh_len / 2),
                   pos=(0, 0, -thigh_len / 2))
        shin = b.add_body(
            f"{side}_knee_link", thigh, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
            jnt_pos=(0, 0, -thigh_len), mass=2.0, com=(0, 0, -shin_len / 2),
            inertia=np.diag([0.04, 0.04, 0.003]),
            jnt_name=f"{side}_knee", limits=(-0.26, 2.05),
            effort_limit=300.0, velocity_limit=14.0,
        )
        b.add_geom(shin, GEOM_CAPSULE, (0.04, shin_len / 2),
                   pos=(0, 0, -shin_len / 2))
        foot = b.add_body(
            f"{side}_ankle_link", shin, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
            jnt_pos=(0, 0, -shin_len), mass=0.7, com=(0.05, 0, -0.04),
            inertia=np.eye(3) * 0.003, jnt_name=f"{side}_ankle",
            limits=(-0.87, 0.52), effort_limit=40.0, velocity_limit=9.0,
        )
        b.add_geom(foot, GEOM_BOX, (0.11, 0.04, 0.02), pos=(0.04, 0, -0.05),
                   friction=1.0)
    torso = b.add_body(
        "torso_link", pelvis, JOINT_REVOLUTE, jnt_axis=(0, 0, 1),
        jnt_pos=(0, 0, 0.1), mass=18.0, com=(0, 0, 0.25),
        inertia=np.diag([0.4, 0.35, 0.1]), jnt_name="torso",
        limits=(-2.35, 2.35), effort_limit=200.0, velocity_limit=23.0,
    )
    b.add_geom(torso, GEOM_CAPSULE, (0.12, 0.2), pos=(0, 0, 0.28))
    upper_len, lower_len = 0.28, 0.26
    for side, sy in (("left", 1), ("right", -1)):
        sp = b.add_body(
            f"{side}_shoulder_pitch_link", torso, JOINT_REVOLUTE,
            jnt_axis=(0, 1, 0), jnt_pos=(0, sy * 0.22, 0.45), mass=1.0,
            inertia=np.eye(3) * 0.003, jnt_name=f"{side}_shoulder_pitch",
            limits=(-2.87, 2.87), effort_limit=40.0, velocity_limit=9.0,
        )
        sr = b.add_body(
            f"{side}_shoulder_roll_link", sp, JOINT_REVOLUTE, jnt_axis=(1, 0, 0),
            mass=0.8, inertia=np.eye(3) * 0.002,
            jnt_name=f"{side}_shoulder_roll",
            limits=(-3.11, 0.34) if side == "right" else (-0.34, 3.11),
            effort_limit=40.0, velocity_limit=9.0,
        )
        upper = b.add_body(
            f"{side}_shoulder_yaw_link", sr, JOINT_REVOLUTE, jnt_axis=(0, 0, 1),
            mass=1.1, com=(0, 0, -upper_len / 2),
            inertia=np.diag([0.008, 0.008, 0.001]),
            jnt_name=f"{side}_shoulder_yaw", limits=(-1.3, 4.45),
            effort_limit=18.0, velocity_limit=20.0,
        )
        b.add_geom(upper, GEOM_CAPSULE, (0.035, upper_len / 2),
                   pos=(0, 0, -upper_len / 2))
        lower = b.add_body(
            f"{side}_elbow_link", upper, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
            jnt_pos=(0, 0, -upper_len), mass=0.9, com=(0, 0, -lower_len / 2),
            inertia=np.diag([0.006, 0.006, 0.001]),
            jnt_name=f"{side}_elbow", limits=(-1.25, 2.61),
            effort_limit=18.0, velocity_limit=20.0,
        )
        b.add_geom(lower, GEOM_CAPSULE, (0.03, lower_len / 2),
                   pos=(0, 0, -lower_len / 2))
    return b.build()


H1_CFG = ArticulationCfg(
    model=build_h1_model,
    init_state=ArticulationInitStateCfg(
        pos=(0.0, 0.0, 1.05),
        joint_pos={
            ".*_hip_pitch": -0.28,
            ".*_knee": 0.79,
            ".*_ankle": -0.52,
            "torso": 0.0,
            ".*_shoulder_pitch": 0.28,
            ".*_elbow": 0.52,
        },
    ),
    soft_joint_pos_limit_factor=0.9,
    actuators={
        "legs": ImplicitActuatorCfg(
            joint_names_expr=[".*_hip_yaw", ".*_hip_roll", ".*_hip_pitch",
                              ".*_knee", "torso"],
            stiffness={".*_hip_.*": 150.0, ".*_knee": 200.0, "torso": 200.0},
            damping={".*_hip_.*": 5.0, ".*_knee": 5.0, "torso": 5.0},
        ),
        "feet": ImplicitActuatorCfg(
            joint_names_expr=[".*_ankle"], stiffness=20.0, damping=4.0,
        ),
        "arms": ImplicitActuatorCfg(
            joint_names_expr=[".*_shoulder_.*", ".*_elbow"],
            stiffness=40.0, damping=10.0,
        ),
    },
)


def build_g1_model():
    """Unitree G1 (23-dof minimal): 2x6 leg + 1 waist + 2x5 arm."""
    b = ModelBuilder("unitree_g1")
    pelvis = b.add_body(
        "pelvis", -1, JOINT_FREE, mass=4.5, inertia=np.diag([0.03, 0.025, 0.02])
    )
    b.add_geom(pelvis, GEOM_BOX, (0.06, 0.1, 0.06))
    thigh_len, shin_len = 0.25, 0.25
    for side, sy in (("left", 1), ("right", -1)):
        hp = b.add_body(
            f"{side}_hip_pitch_link", pelvis, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
            jnt_pos=(0, sy * 0.064, -0.1), mass=1.3, inertia=np.eye(3) * 0.004,
            jnt_name=f"{side}_hip_pitch_joint", limits=(-2.5, 2.8),
            effort_limit=88.0, velocity_limit=32.0,
        )
        hr = b.add_body(
            f"{side}_hip_roll_link", hp, JOINT_REVOLUTE, jnt_axis=(1, 0, 0),
            mass=1.0, inertia=np.eye(3) * 0.003,
            jnt_name=f"{side}_hip_roll_joint",
            limits=(-0.5, 2.9) if side == "left" else (-2.9, 0.5),
            effort_limit=88.0, velocity_limit=32.0,
        )
        thigh = b.add_body(
            f"{side}_hip_yaw_link", hr, JOINT_REVOLUTE, jnt_axis=(0, 0, 1),
            mass=1.5, com=(0, 0, -thigh_len / 2),
            inertia=np.diag([0.01, 0.01, 0.002]),
            jnt_name=f"{side}_hip_yaw_joint", limits=(-2.7, 2.7),
            effort_limit=88.0, velocity_limit=32.0,
        )
        b.add_geom(thigh, GEOM_CAPSULE, (0.04, thigh_len / 2),
                   pos=(0, 0, -thigh_len / 2))
        shin = b.add_body(
            f"{side}_knee_link", thigh, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
            jnt_pos=(0, 0, -thigh_len), mass=1.4, com=(0, 0, -shin_len / 2),
            inertia=np.diag([0.008, 0.008, 0.001]),
            jnt_name=f"{side}_knee_joint", limits=(-0.09, 2.54),
            effort_limit=139.0, velocity_limit=20.0,
        )
        b.add_geom(shin, GEOM_CAPSULE, (0.035, shin_len / 2),
                   pos=(0, 0, -shin_len / 2))
        ap = b.add_body(
            f"{side}_ankle_pitch_link", shin, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
            jnt_pos=(0, 0, -shin_len), mass=0.3, inertia=np.eye(3) * 0.001,
            jnt_name=f"{side}_ankle_pitch_joint", limits=(-0.87, 0.52),
            effort_limit=50.0, velocity_limit=37.0,
        )
        foot = b.add_body(
            f"{side}_ankle_roll_link", ap, JOINT_REVOLUTE, jnt_axis=(1, 0, 0),
            mass=0.4, com=(0.04, 0, -0.02), inertia=np.eye(3) * 0.001,
            jnt_name=f"{side}_ankle_roll_joint", limits=(-0.26, 0.26),
            effort_limit=50.0, velocity_limit=37.0,
        )
        b.add_geom(foot, GEOM_BOX, (0.09, 0.03, 0.015), pos=(0.03, 0, -0.03),
                   friction=1.0)
    torso = b.add_body(
        "torso_link", pelvis, JOINT_REVOLUTE, jnt_axis=(0, 0, 1),
        jnt_pos=(0, 0, 0.04), mass=7.5, com=(0, 0, 0.18),
        inertia=np.diag([0.12, 0.1, 0.04]), jnt_name="waist_yaw_joint",
        limits=(-2.62, 2.62), effort_limit=88.0, velocity_limit=32.0,
    )
    b.add_geom(torso, GEOM_CAPSULE, (0.09, 0.12), pos=(0, 0, 0.2))
    upper_len, lower_len = 0.18, 0.18
    for side, sy in (("left", 1), ("right", -1)):
        sp = b.add_body(
            f"{side}_shoulder_pitch_link", torso, JOINT_REVOLUTE,
            jnt_axis=(0, 1, 0), jnt_pos=(0, sy * 0.13, 0.3), mass=0.7,
            inertia=np.eye(3) * 0.002, jnt_name=f"{side}_shoulder_pitch_joint",
            limits=(-3.09, 2.67), effort_limit=25.0, velocity_limit=37.0,
        )
        sr = b.add_body(
            f"{side}_shoulder_roll_link", sp, JOINT_REVOLUTE, jnt_axis=(1, 0, 0),
            mass=0.6, inertia=np.eye(3) * 0.002,
            jnt_name=f"{side}_shoulder_roll_joint",
            limits=(-1.59, 2.25) if side == "left" else (-2.25, 1.59),
            effort_limit=25.0, velocity_limit=37.0,
        )
        upper = b.add_body(
            f"{side}_shoulder_yaw_link", sr, JOINT_REVOLUTE, jnt_axis=(0, 0, 1),
            mass=0.7, com=(0, 0, -upper_len / 2),
            inertia=np.diag([0.004, 0.004, 0.001]),
            jnt_name=f"{side}_shoulder_yaw_joint", limits=(-2.62, 2.62),
            effort_limit=25.0, velocity_limit=37.0,
        )
        b.add_geom(upper, GEOM_CAPSULE, (0.03, upper_len / 2),
                   pos=(0, 0, -upper_len / 2))
        lower = b.add_body(
            f"{side}_elbow_pitch_link", upper, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
            jnt_pos=(0, 0, -upper_len), mass=0.6, com=(0, 0, -lower_len / 2),
            inertia=np.diag([0.003, 0.003, 0.0005]),
            jnt_name=f"{side}_elbow_pitch_joint", limits=(-0.23, 3.42),
            effort_limit=25.0, velocity_limit=37.0,
        )
        b.add_geom(lower, GEOM_CAPSULE, (0.025, lower_len / 2),
                   pos=(0, 0, -lower_len / 2))
        b.add_body(
            f"{side}_elbow_roll_link", lower, JOINT_REVOLUTE, jnt_axis=(1, 0, 0),
            jnt_pos=(0, 0, -lower_len), mass=0.3, inertia=np.eye(3) * 0.0008,
            jnt_name=f"{side}_elbow_roll_joint", limits=(-2.09, 2.09),
            effort_limit=25.0, velocity_limit=37.0,
        )
    return b.build()


G1_CFG = ArticulationCfg(
    model=build_g1_model,
    init_state=ArticulationInitStateCfg(
        pos=(0.0, 0.0, 0.74),
        joint_pos={
            ".*_hip_pitch_joint": -0.2,
            ".*_knee_joint": 0.42,
            ".*_ankle_pitch_joint": -0.23,
            ".*_elbow_pitch_joint": 0.87,
            "left_shoulder_roll_joint": 0.16,
            "left_shoulder_pitch_joint": 0.35,
            "right_shoulder_roll_joint": -0.16,
            "right_shoulder_pitch_joint": 0.35,
        },
    ),
    soft_joint_pos_limit_factor=0.9,
    actuators={
        "legs": ImplicitActuatorCfg(
            joint_names_expr=[".*_hip_.*_joint", ".*_knee_joint",
                              "waist_yaw_joint"],
            stiffness={".*_hip_.*": 150.0, ".*_knee_joint": 200.0,
                       "waist_yaw_joint": 200.0},
            damping={".*_hip_.*": 5.0, ".*_knee_joint": 5.0,
                     "waist_yaw_joint": 5.0},
        ),
        "feet": ImplicitActuatorCfg(
            joint_names_expr=[".*_ankle_.*_joint"], stiffness=20.0, damping=2.0,
        ),
        "arms": ImplicitActuatorCfg(
            joint_names_expr=[".*_shoulder_.*_joint", ".*_elbow_.*_joint"],
            stiffness=40.0, damping=10.0,
        ),
    },
)
