"""Ant preset (reference ``isaaclab_assets/robots/ant.py``): classic MuJoCo
ant — torso + 4 legs x (hip z-ish, ankle) = 8 dof."""

import numpy as np

from ..actuators import ImplicitActuatorCfg
from ..assets import ArticulationCfg, ArticulationInitStateCfg
from ..physics.model import (
    GEOM_CAPSULE,
    GEOM_SPHERE,
    JOINT_FREE,
    JOINT_REVOLUTE,
    ModelBuilder,
)


def build_ant_model():
    b = ModelBuilder("ant")
    torso = b.add_body(
        "torso", -1, JOINT_FREE, mass=10.0, inertia=np.eye(3) * 0.1
    )
    b.add_geom(torso, GEOM_SPHERE, (0.25,))
    leg_len, foot_len = 0.28, 0.56
    dirs = {
        "front_left": (1, 1), "front_right": (1, -1),
        "left_back": (-1, 1), "right_back": (-1, -1),
    }
    for name, (sx, sy) in dirs.items():
        d = np.array([sx, sy, 0.0]) / np.sqrt(2)
        # hip rotates about z
        hip = b.add_body(
            f"{name}_leg", torso, JOINT_REVOLUTE, jnt_axis=(0, 0, 1),
            jnt_pos=tuple(d * 0.25), mass=1.0,
            com=tuple(d * leg_len / 2), inertia=np.eye(3) * 0.005,
            jnt_name=f"hip_{name}" if False else f"{name}_hip",
            limits=(-0.7, 0.7), effort_limit=20.0, velocity_limit=20.0,
        )
        b.add_geom(hip, GEOM_CAPSULE, (0.04, leg_len / 2),
                   pos=tuple(d * leg_len / 2),
                   quat=_align_z_to(d))
        # ankle rotates about axis perpendicular to leg in horizontal plane
        perp = np.array([-sy, sx, 0.0]) / np.sqrt(2)
        down = np.array([sx, sy, -1.4]) / np.linalg.norm([sx, sy, -1.4])
        foot = b.add_body(
            f"{name}_foot", hip, JOINT_REVOLUTE, jnt_axis=tuple(perp),
            jnt_pos=tuple(d * leg_len), mass=1.0,
            com=tuple(down * foot_len / 2), inertia=np.eye(3) * 0.01,
            jnt_name=f"{name}_ankle", limits=(0.5, 1.75) if sx > 0 else (-1.75, -0.5),
            effort_limit=20.0, velocity_limit=20.0,
        )
        b.add_geom(foot, GEOM_CAPSULE, (0.04, foot_len / 2),
                   pos=tuple(down * foot_len / 2), quat=_align_z_to(down))
        b.add_geom(foot, GEOM_SPHERE, (0.05,), pos=tuple(down * foot_len),
                   friction=1.0, name=f"{name}_toe")
    return b.build()


def _align_z_to(d):
    """Quaternion rotating +z onto direction d."""
    d = np.asarray(d, dtype=float)
    d = d / np.linalg.norm(d)
    z = np.array([0.0, 0, 1])
    v = np.cross(z, d)
    s = np.linalg.norm(v)
    c = float(np.dot(z, d))
    if s < 1e-9:
        return (1.0, 0, 0, 0) if c > 0 else (0.0, 1, 0, 0)
    axis = v / s
    ang = np.arctan2(s, c)
    return (np.cos(ang / 2), *(axis * np.sin(ang / 2)))


ANT_CFG = ArticulationCfg(
    model=build_ant_model,
    init_state=ArticulationInitStateCfg(
        pos=(0.0, 0.0, 0.5),
        joint_pos={
            ".*_hip": 0.0,
            "front_left_ankle": 1.0, "front_right_ankle": 1.0,
            "left_back_ankle": -1.0, "right_back_ankle": -1.0,
        },
    ),
    actuators={
        "body": ImplicitActuatorCfg(
            joint_names_expr=[".*"],
            stiffness=0.0,
            damping=0.0,
            effort_limit=20.0,
            velocity_limit=20.0,
        )
    },
)
