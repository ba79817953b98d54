"""Boston Dynamics Spot preset (reference ``isaaclab_assets/robots/spot.py``):
12-dof quadruped with Spot joint names ({f,h}{l,r}_{hx,hy,kn})."""

import numpy as np

from ..actuators import DelayedPDActuatorCfg
from ..assets import ArticulationCfg, ArticulationInitStateCfg
from ..physics.model import (
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_SPHERE,
    JOINT_FREE,
    JOINT_REVOLUTE,
    ModelBuilder,
)


def build_spot_model():
    b = ModelBuilder("spot")
    body = b.add_body(
        "body", -1, JOINT_FREE, mass=16.8, inertia=np.diag([0.1, 0.6, 0.65])
    )
    b.add_geom(body, GEOM_BOX, (0.42, 0.11, 0.09))
    upper_len, lower_len = 0.32, 0.33
    for leg, (sx, sy) in (("fl", (1, 1)), ("fr", (1, -1)), ("hl", (-1, 1)), ("hr", (-1, -1))):
        hip = b.add_body(
            f"{leg}_hip", body, JOINT_REVOLUTE, jnt_axis=(1, 0, 0),
            jnt_pos=(sx * 0.29785, sy * 0.055, 0.0),
            mass=1.7, com=(0, sy * 0.05, 0), inertia=np.eye(3) * 0.008,
            jnt_name=f"{leg}_hx", limits=(-0.785, 0.785),
            effort_limit=45.0, velocity_limit=17.0,
        )
        upper = b.add_body(
            f"{leg}_uleg", hip, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
            jnt_pos=(0.0, sy * 0.111, 0.0),
            mass=2.3, com=(0, 0, -upper_len / 2),
            inertia=np.diag([0.02, 0.02, 0.003]),
            jnt_name=f"{leg}_hy", limits=(-0.899, 2.295),
            effort_limit=45.0, velocity_limit=17.0,
        )
        b.add_geom(upper, GEOM_CAPSULE, (0.04, upper_len / 2),
                   pos=(0, 0, -upper_len / 2))
        lower = b.add_body(
            f"{leg}_lleg", upper, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
            jnt_pos=(0.0, 0.0, -upper_len),
            mass=0.85, com=(0, 0, -lower_len / 2),
            inertia=np.diag([0.008, 0.008, 0.001]),
            jnt_name=f"{leg}_kn", limits=(-2.793, -0.255),
            effort_limit=115.0, velocity_limit=12.0,
        )
        b.add_geom(lower, GEOM_CAPSULE, (0.018, lower_len / 2 - 0.02),
                   pos=(0, 0, -lower_len / 2))
        b.add_geom(lower, GEOM_SPHERE, (0.032,), pos=(0, 0, -lower_len),
                   friction=1.0, name=f"{leg}_foot")
    return b.build()


SPOT_CFG = ArticulationCfg(
    model=build_spot_model,
    init_state=ArticulationInitStateCfg(
        pos=(0.0, 0.0, 0.52),
        joint_pos={
            "[fh][lr]_hx": 0.0,
            "[fh][lr]_hy": 0.9,
            "[fh][lr]_kn": -1.7,
        },
    ),
    soft_joint_pos_limit_factor=0.9,
    actuators={
        # reference spot.py uses a DelayedPDActuator with 0-2 physics-step
        # command latency
        "spot_legs": DelayedPDActuatorCfg(
            joint_names_expr=["[fh][lr]_hx", "[fh][lr]_hy", "[fh][lr]_kn"],
            effort_limit=115.0,
            velocity_limit=17.0,
            stiffness=200.0,
            damping=5.0,
            min_delay=0,
            max_delay=2,
        )
    },
)
