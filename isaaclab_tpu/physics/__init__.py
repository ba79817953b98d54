"""Batched JAX rigid-body physics engine (the in-repo PhysX replacement)."""

from .collision import CollisionPlan, Contacts, HeightField  # noqa: F401
from .engine import (  # noqa: F401
    BodyParams,
    EngineCfg,
    JointDrive,
    PhysicsState,
    integrate_q,
    step,
)
from .kinematics import (  # noqa: F401
    Kinematics,
    body_jacobian,
    body_velocities_world,
    forward_kinematics,
    point_jacobian,
)
from .model import (  # noqa: F401
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_CYLINDER,
    GEOM_PLANE,
    GEOM_SPHERE,
    JOINT_FIXED,
    JOINT_FREE,
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    Geom,
    ModelBuilder,
    RobotModel,
)
from .solver import SolverCfg  # noqa: F401
