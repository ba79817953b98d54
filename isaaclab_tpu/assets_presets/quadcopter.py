"""Quadcopter presets (reference ``isaaclab_assets/robots/quadcopter.py``:
CRAZYFLIE_CFG + the fork's ``UAVLIDAR_CFG`` at quadcopter.py:20).

The UAV body is a single rigid body; rotor dynamics are applied as body
wrenches by the fork's MotorModel/RateController stack
(tasks/direct/quadcopter/modules), not as articulated joints.
"""

import numpy as np

from ..assets import ArticulationCfg, ArticulationInitStateCfg
from ..physics.model import GEOM_BOX, GEOM_SPHERE, JOINT_FREE, ModelBuilder


def build_quadcopter_model(name="quadcopter", mass=0.752, arm_len=0.17,
                           inertia_diag=(0.0025, 0.0021, 0.0043)):
    b = ModelBuilder(name)
    body = b.add_body(
        "body", -1, JOINT_FREE, mass=mass, inertia=np.diag(inertia_diag)
    )
    b.add_geom(body, GEOM_SPHERE, (arm_len,), friction=0.8)
    return b.build()


def build_crazyflie_model():
    return build_quadcopter_model(
        "crazyflie", mass=0.028, arm_len=0.046,
        inertia_diag=(1.4e-5, 1.4e-5, 2.17e-5),
    )


CRAZYFLIE_CFG = ArticulationCfg(
    model=build_crazyflie_model,
    init_state=ArticulationInitStateCfg(pos=(0.0, 0.0, 0.5)),
    actuators={},
)

UAVLIDAR_CFG = ArticulationCfg(
    model=lambda: build_quadcopter_model("uav_lidar", mass=0.752, arm_len=0.17),
    init_state=ArticulationInitStateCfg(pos=(0.0, 0.0, 1.0)),
    actuators={},
)
"""Fork's lidar-carrying UAV (reference quadcopter.py:20 UAVLIDAR_CFG)."""
