"""ANYmal quadruped presets (reference ``isaaclab_assets/robots/anymal.py``).

Programmatic 12-dof quadruped model with ANYmal-C/D massing; the reference
loads Nucleus USDs, we build the kinematic tree directly (same joint names:
{LF,RF,LH,RH}_{HAA,HFE,KFE}).
"""

import numpy as np

from ..actuators import DCMotorCfg
from ..assets import ArticulationCfg, ArticulationInitStateCfg
from ..physics.model import (
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_SPHERE,
    JOINT_FREE,
    JOINT_REVOLUTE,
    ModelBuilder,
)


def build_anymal_model(name="anymal_c", base_mass=27.0, leg_scale=1.0,
                       limb_mass_scale=1.0):
    """12-dof ANYmal with foot spheres on the shanks (no extra dofs).

    Parametrized over massing/leg length so the B (lighter, shorter) and D
    (heavier) generations share the topology (reference
    isaaclab_assets/robots/anymal.py defines B/C/D as different USDs with the
    same joint set).
    """
    b = ModelBuilder(name)
    base = b.add_body(
        "base", -1, JOINT_FREE, mass=base_mass,
        inertia=np.diag([0.3, 0.9, 1.0]) * (base_mass / 27.0),
    )
    b.add_geom(base, GEOM_BOX, (0.325, 0.125, 0.075))
    thigh_len, shank_len = 0.3 * leg_scale, 0.36 * leg_scale
    ms = limb_mass_scale
    for leg, (sx, sy) in (("LF", (1, 1)), ("RF", (1, -1)), ("LH", (-1, 1)), ("RH", (-1, -1))):
        hip = b.add_body(
            f"{leg}_HIP", base, JOINT_REVOLUTE, jnt_axis=(1, 0, 0),
            jnt_pos=(sx * 0.3, sy * 0.104, 0.0),
            mass=2.0 * ms, com=(0, sy * 0.05, 0), inertia=np.eye(3) * 0.01 * ms,
            jnt_name=f"{leg}_HAA", limits=(-0.72, 0.72), effort_limit=80.0,
            velocity_limit=7.5,
        )
        thigh = b.add_body(
            f"{leg}_THIGH", hip, JOINT_REVOLUTE, jnt_axis=(0, 1, 0),
            jnt_pos=(0.0, sy * 0.109, 0.0),
            mass=3.1 * ms, com=(0, 0, -thigh_len / 2),
            inertia=np.diag([0.025, 0.025, 0.004]) * ms,
            jnt_name=f"{leg}_HFE", limits=(-3.0, 3.0), effort_limit=80.0,
            velocity_limit=7.5,
        )
        b.add_geom(thigh, GEOM_CAPSULE, (0.045, thigh_len / 2),
                   pos=(0, 0, -thigh_len / 2))
        shank = b.add_body(
            f"{leg}_SHANK", thigh, JOINT_REVOLUTE,
            jnt_axis=(0, 1, 0), jnt_pos=(0.0, 0.0, -thigh_len),
            mass=1.1 * ms, com=(0, 0, -shank_len / 2),
            inertia=np.diag([0.012, 0.012, 0.001]) * ms,
            jnt_name=f"{leg}_KFE", limits=(-3.0, 3.0), effort_limit=80.0,
            velocity_limit=7.5,
        )
        b.add_geom(shank, GEOM_CAPSULE, (0.02, shank_len / 2 - 0.03),
                   pos=(0, 0, -shank_len / 2))
        # foot contact sphere welded at shank tip; name it *_FOOT so contact
        # sensors can regex ".*FOOT" — geoms live on the shank body.
        b.add_geom(shank, GEOM_SPHERE, (0.03,), pos=(0, 0, -shank_len),
                   friction=1.0, name=f"{leg}_FOOT")
    return b.build()


def build_anymal_c_model():
    """ANYmal-C from the committed URDF (anymal_c_simple_description
    parameters) through the production URDF converter — reference pattern:
    cfg dataclasses point at description files (SURVEY.md 2.13), loaded by
    ``sim/converters.load_urdf`` instead of hand-built arrays."""
    import os

    from ..sim.converters import load_urdf

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data", "anymal_c.urdf"
    )
    return load_urdf(path, floating_base=True, name="anymal_c")


def build_anymal_c_model_programmatic():
    """Hand-built fallback (kept for the B/D scaled variants and for
    model-construction tests)."""
    return build_anymal_model("anymal_c")


def build_anymal_b_model():
    """ANYmal-B: previous generation — lighter (~30kg total), shorter legs."""
    return build_anymal_model(
        "anymal_b", base_mass=22.0, leg_scale=0.92, limb_mass_scale=0.85
    )


def build_anymal_d_model():
    """ANYmal-D: latest generation — heavier (~50kg total)."""
    return build_anymal_model(
        "anymal_d", base_mass=33.0, leg_scale=1.05, limb_mass_scale=1.2
    )


_INIT = ArticulationInitStateCfg(
    pos=(0.0, 0.0, 0.6),
    joint_pos={
        ".*HAA": 0.0,
        "LF_HFE": 0.4, "RF_HFE": 0.4, "LH_HFE": -0.4, "RH_HFE": -0.4,
        "LF_KFE": -0.8, "RF_KFE": -0.8, "LH_KFE": 0.8, "RH_KFE": 0.8,
    },
    joint_vel={".*": 0.0},
)

ANYMAL_C_CFG = ArticulationCfg(
    model=build_anymal_c_model,
    init_state=_INIT,
    soft_joint_pos_limit_factor=0.95,
    actuators={
        "legs": DCMotorCfg(
            joint_names_expr=[".*HAA", ".*HFE", ".*KFE"],
            saturation_effort=120.0,
            effort_limit=80.0,
            velocity_limit=7.5,
            stiffness={".*": 40.0},
            damping={".*": 5.0},
        )
    },
)

ANYMAL_B_CFG = ArticulationCfg(
    model=build_anymal_b_model,
    init_state=_INIT.replace(pos=(0.0, 0.0, 0.55)),
    soft_joint_pos_limit_factor=0.95,
    actuators={
        "legs": DCMotorCfg(
            joint_names_expr=[".*HAA", ".*HFE", ".*KFE"],
            saturation_effort=120.0,
            effort_limit=80.0,
            velocity_limit=7.5,
            stiffness={".*": 40.0},
            damping={".*": 5.0},
        )
    },
)

ANYMAL_D_CFG = ANYMAL_C_CFG.replace(model=build_anymal_d_model)
