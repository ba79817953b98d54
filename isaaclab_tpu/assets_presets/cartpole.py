"""Cartpole robot preset (reference ``isaaclab_assets/robots/cartpole.py:18``)."""

import numpy as np

from ..actuators import ImplicitActuatorCfg
from ..assets import ArticulationCfg, ArticulationInitStateCfg
from ..physics.model import JOINT_PRISMATIC, JOINT_REVOLUTE, ModelBuilder


def build_cartpole_model():
    """Cart on a rail (prismatic x) + pole (revolute y); masses/lengths match
    the classic cartpole.usd asset (cart 1kg, pole 1kg, 1m)."""
    b = ModelBuilder("cartpole")
    # rail is the world; cart slides along x at height 2 m (handled by task
    # init pos; model frame keeps the rail at its own origin)
    cart = b.add_body(
        "cart", -1, JOINT_PRISMATIC, jnt_axis=(1, 0, 0), mass=1.0,
        com=(0, 0, 0), inertia=np.eye(3) * 0.1, jnt_name="slider_to_cart",
        limits=(-4.0, 4.0), effort_limit=400.0, velocity_limit=100.0,
    )
    # pole pivots about y, hangs up: com at +0.5 z when upright
    pole = b.add_body(
        "pole", cart, JOINT_REVOLUTE, jnt_axis=(0, 1, 0), mass=1.0,
        com=(0, 0, 0.5), inertia=np.diag([0.0, 1.0 / 12.0, 0.0]),
        jnt_name="cart_to_pole", effort_limit=400.0, velocity_limit=100.0,
    )
    # display-only shapes for the camera tasks (collidable=False keeps the
    # contact pipeline empty — cartpole stays the contact-free fast path)
    from .cartpole_visuals import add_cartpole_visuals

    add_cartpole_visuals(b, cart, pole)
    return b.build()


CARTPOLE_CFG = ArticulationCfg(
    model=build_cartpole_model,
    init_state=ArticulationInitStateCfg(
        pos=(0.0, 0.0, 2.0),
        joint_pos={"slider_to_cart": 0.0, "cart_to_pole": 0.0},
    ),
    actuators={
        "cart_actuator": ImplicitActuatorCfg(
            joint_names_expr=["slider_to_cart"],
            effort_limit=400.0,
            velocity_limit=100.0,
            stiffness=0.0,
            damping=10.0,
        ),
        "pole_actuator": ImplicitActuatorCfg(
            joint_names_expr=["cart_to_pole"],
            effort_limit=400.0,
            velocity_limit=100.0,
            stiffness=0.0,
            damping=0.0,
        ),
    },
)


def build_cart_double_pendulum_model():
    """Cart + pole + second pendulum (reference
    cart_double_pendulum.usd: joints slider_to_cart, cart_to_pole,
    pole_to_pendulum)."""
    b = ModelBuilder("cart_double_pendulum")
    cart = b.add_body(
        "cart", -1, JOINT_PRISMATIC, jnt_axis=(1, 0, 0), mass=1.0,
        inertia=np.eye(3) * 0.1, jnt_name="slider_to_cart",
        limits=(-4.0, 4.0), effort_limit=400.0, velocity_limit=100.0,
    )
    pole = b.add_body(
        "pole", cart, JOINT_REVOLUTE, jnt_axis=(0, 1, 0), mass=1.0,
        com=(0, 0, 0.5), inertia=np.diag([0.0, 1.0 / 12.0, 0.0]),
        jnt_name="cart_to_pole", effort_limit=400.0, velocity_limit=100.0,
    )
    b.add_body(
        "pendulum", pole, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
        jnt_pos=(0, 0, 1.0), mass=0.5,
        com=(0, 0, 0.25), inertia=np.diag([0.0, 0.5 * 0.5**2 / 12.0, 0.0]),
        jnt_name="pole_to_pendulum", effort_limit=400.0, velocity_limit=100.0,
    )
    return b.build()


CART_DOUBLE_PENDULUM_CFG = ArticulationCfg(
    model=build_cart_double_pendulum_model,
    init_state=ArticulationInitStateCfg(
        pos=(0.0, 0.0, 2.0),
        joint_pos={
            "slider_to_cart": 0.0, "cart_to_pole": 0.0, "pole_to_pendulum": 0.0,
        },
    ),
    actuators={
        "cart_actuator": ImplicitActuatorCfg(
            joint_names_expr=["slider_to_cart"],
            effort_limit=400.0, velocity_limit=100.0,
            stiffness=0.0, damping=10.0,
        ),
        "pole_actuator": ImplicitActuatorCfg(
            joint_names_expr=["cart_to_pole"],
            effort_limit=400.0, velocity_limit=100.0,
            stiffness=0.0, damping=0.0,
        ),
        "pendulum_actuator": ImplicitActuatorCfg(
            joint_names_expr=["pole_to_pendulum"],
            effort_limit=400.0, velocity_limit=100.0,
            stiffness=0.0, damping=0.0,
        ),
    },
)
