"""Humanoid preset (reference ``isaaclab_assets/robots/humanoid.py``):
21-dof MuJoCo-style humanoid built programmatically."""

import numpy as np

from ..actuators import ImplicitActuatorCfg
from ..assets import ArticulationCfg, ArticulationInitStateCfg
from ..physics.model import (
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_SPHERE,
    JOINT_FREE,
    JOINT_REVOLUTE,
    ModelBuilder,
)


def build_humanoid_model():
    b = ModelBuilder("humanoid")
    torso = b.add_body(
        "torso", -1, JOINT_FREE, mass=8.0, inertia=np.diag([0.1, 0.1, 0.05])
    )
    b.add_geom(torso, GEOM_CAPSULE, (0.11, 0.12), pos=(0, 0, 0.1))
    # abdomen (3 dof)
    abd_axes = {"abdomen_z": (0, 0, 1), "abdomen_y": (0, 1, 0), "abdomen_x": (1, 0, 0)}
    parent = torso
    for jname, axis in abd_axes.items():
        parent = b.add_body(
            f"{jname}_link" if jname != "abdomen_x" else "pelvis",
            parent, JOINT_REVOLUTE, jnt_axis=axis,
            jnt_pos=(0, 0, -0.2) if jname == "abdomen_z" else (0, 0, -0.065),
            mass=2.0 if jname != "abdomen_x" else 6.0,
            com=(0, 0, -0.05), inertia=np.eye(3) * 0.02, jnt_name=jname,
            limits=(-0.7, 0.7), effort_limit=60.0, velocity_limit=15.0,
        )
    pelvis = parent
    b.add_geom(pelvis, GEOM_CAPSULE, (0.09, 0.07), pos=(0, 0, -0.05))

    thigh_len, shin_len, foot_len = 0.34, 0.3, 0.18
    for side, sy in (("right", -1), ("left", 1)):
        # hip: 3 dof chain (x, z, y)
        hipx = b.add_body(
            f"{side}_hip_x_link", pelvis, JOINT_REVOLUTE, jnt_axis=(1, 0, 0),
            jnt_pos=(0, sy * 0.1, -0.12), mass=1.0, inertia=np.eye(3) * 0.005,
            jnt_name=f"{side}_hip_x", limits=(-0.6, 0.6), effort_limit=90.0,
            velocity_limit=15.0,
        )
        hipz = b.add_body(
            f"{side}_hip_z_link", hipx, JOINT_REVOLUTE, jnt_axis=(0, 0, 1),
            mass=1.0, inertia=np.eye(3) * 0.005, jnt_name=f"{side}_hip_z",
            limits=(-1.1, 0.6), effort_limit=90.0, velocity_limit=15.0,
        )
        thigh = b.add_body(
            f"{side}_thigh", hipz, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
            mass=4.5, com=(0, 0, -thigh_len / 2),
            inertia=np.diag([0.06, 0.06, 0.01]), jnt_name=f"{side}_hip_y",
            limits=(-2.0, 0.7), effort_limit=90.0, velocity_limit=15.0,
        )
        b.add_geom(thigh, GEOM_CAPSULE, (0.06, thigh_len / 2),
                   pos=(0, 0, -thigh_len / 2))
        shin = b.add_body(
            f"{side}_shin", thigh, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
            jnt_pos=(0, 0, -thigh_len), mass=2.6, com=(0, 0, -shin_len / 2),
            inertia=np.diag([0.03, 0.03, 0.003]), jnt_name=f"{side}_knee",
            limits=(-0.02, 2.6), effort_limit=60.0, velocity_limit=15.0,
        )
        b.add_geom(shin, GEOM_CAPSULE, (0.05, shin_len / 2),
                   pos=(0, 0, -shin_len / 2))
        foot = b.add_body(
            f"{side}_foot", shin, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
            jnt_pos=(0, 0, -shin_len), mass=1.0, com=(0.04, 0, -0.03),
            inertia=np.eye(3) * 0.005, jnt_name=f"{side}_ankle",
            limits=(-0.9, 0.7), effort_limit=40.0, velocity_limit=15.0,
        )
        b.add_geom(foot, GEOM_BOX, (foot_len / 2, 0.05, 0.02),
                   pos=(0.04, 0, -0.04), friction=1.0)

    upper_len, lower_len = 0.25, 0.25
    for side, sy in (("right", -1), ("left", 1)):
        sh1 = b.add_body(
            f"{side}_shoulder1_link", torso, JOINT_REVOLUTE,
            jnt_axis=(0, 1, 0), jnt_pos=(0, sy * 0.17, 0.2), mass=0.5,
            inertia=np.eye(3) * 0.002, jnt_name=f"{side}_shoulder1",
            limits=(-1.5, 1.5), effort_limit=30.0, velocity_limit=15.0,
        )
        upper = b.add_body(
            f"{side}_upper_arm", sh1, JOINT_REVOLUTE, jnt_axis=(1, 0, 0),
            mass=1.6, com=(0, sy * 0.05, -upper_len / 2),
            inertia=np.diag([0.01, 0.01, 0.002]), jnt_name=f"{side}_shoulder2",
            limits=(-1.5, 1.5), effort_limit=30.0, velocity_limit=15.0,
        )
        b.add_geom(upper, GEOM_CAPSULE, (0.04, upper_len / 2),
                   pos=(0, 0, -upper_len / 2))
        lower = b.add_body(
            f"{side}_lower_arm", upper, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
            jnt_pos=(0, 0, -upper_len), mass=1.2, com=(0, 0, -lower_len / 2),
            inertia=np.diag([0.008, 0.008, 0.001]), jnt_name=f"{side}_elbow",
            limits=(-1.6, 0.5), effort_limit=20.0, velocity_limit=15.0,
        )
        b.add_geom(lower, GEOM_CAPSULE, (0.035, lower_len / 2),
                   pos=(0, 0, -lower_len / 2))
    return b.build()


HUMANOID_CFG = ArticulationCfg(
    model=build_humanoid_model,
    init_state=ArticulationInitStateCfg(pos=(0.0, 0.0, 1.34)),
    actuators={
        "body": ImplicitActuatorCfg(
            joint_names_expr=[".*"],
            stiffness=None,
            damping=None,
        )
    },
)
