"""Fourier GR1T2 humanoid preset (reference
``isaaclab_assets/robots/fourier.py:GR1T2_CFG``).

Upper-body-centric build for the pick-place task (reference
``manager_based/manipulation/pick_place``): the legs are locked in that task
(`ik_urdf_fixed_joint_names`), so they are modelled as fixed-joint mass
bodies; waist (3), head (3), two 7-dof arms and two 11-joint hands are
articulated. Body/joint names match the reference URDF so regex-based
configs (``right_shoulder_pitch_joint``, ``L_index_proximal_joint``,
``left_hand_roll_link`` …) resolve unchanged."""

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


def build_gr1t2_model():
    b = ModelBuilder("gr1t2")
    # pelvis/base (legs lumped as fixed masses below)
    base = b.add_body("base_link", -1, JOINT_FIXED, mass=12.0,
                      inertia=np.eye(3) * 0.2)
    b.add_geom(base, GEOM_CAPSULE, (0.10, 0.08), rgba=(0.3, 0.3, 0.35, 1.0),
               collidable=False)
    for side in ("left", "right"):
        leg = b.add_body(f"{side}_leg_link", base, JOINT_FIXED,
                         jnt_pos=(0.09 if side == "left" else -0.09, 0, -0.45),
                         mass=8.0, inertia=np.eye(3) * 0.15)
        b.add_geom(leg, GEOM_CAPSULE, (0.06, 0.35), rgba=(0.3, 0.3, 0.35, 1.0),
                   collidable=False)
    # waist: yaw -> pitch -> roll -> torso
    waist_axes = {"yaw": (0, 0, 1), "pitch": (0, 1, 0), "roll": (1, 0, 0)}
    parent = base
    for i, (name, axis) in enumerate(waist_axes.items()):
        parent = b.add_body(
            f"waist_{name}_link", parent, JOINT_REVOLUTE, jnt_axis=axis,
            jnt_pos=(0, 0, 0.08 if i == 0 else 0.0),
            mass=3.0 if i < 2 else 8.0, inertia=np.eye(3) * 0.05,
            jnt_name=f"waist_{name}_joint", limits=(-0.6, 0.6),
            effort_limit=120.0, velocity_limit=3.0,
        )
    torso = parent
    b.add_geom(torso, GEOM_CAPSULE, (0.11, 0.14), pos=(0, 0, 0.18),
               rgba=(0.75, 0.75, 0.78, 1.0))
    # head: roll -> pitch -> yaw
    parent = torso
    for name, axis in (("roll", (1, 0, 0)), ("pitch", (0, 1, 0)),
                       ("yaw", (0, 0, 1))):
        parent = b.add_body(
            f"head_{name}_link", parent, JOINT_REVOLUTE, jnt_axis=axis,
            jnt_pos=(0, 0, 0.35 if name == "roll" else 0.0),
            mass=0.8, inertia=np.eye(3) * 0.005,
            jnt_name=f"head_{name}_joint", limits=(-1.0, 1.0),
            effort_limit=20.0, velocity_limit=3.0,
        )
    b.add_geom(parent, GEOM_SPHERE, (0.09,), pos=(0, 0, 0.07),
               rgba=(0.85, 0.85, 0.88, 1.0), collidable=False)

    # arms: shoulder pitch/roll/yaw, elbow pitch, wrist yaw/roll/pitch
    arm_chain = [
        ("shoulder_pitch", (0, 1, 0), (0.0, 0.0, 0.0), (-2.5, 2.5)),
        ("shoulder_roll", (1, 0, 0), (0.0, 0.0, 0.0), (-2.5, 0.3)),
        ("shoulder_yaw", (0, 0, 1), (0.0, 0.0, -0.12), (-2.5, 2.5)),
        ("elbow_pitch", (0, 1, 0), (0.0, 0.0, -0.14), (-2.3, 0.3)),
        ("wrist_yaw", (0, 0, 1), (0.0, 0.0, -0.12), (-2.0, 2.0)),
        ("wrist_roll", (1, 0, 0), (0.0, 0.0, -0.10), (-0.8, 0.8)),
        ("wrist_pitch", (0, 1, 0), (0.0, 0.0, 0.0), (-0.8, 0.8)),
    ]
    hands = {}
    for side, sy in (("left", 1.0), ("right", -1.0)):
        parent = torso
        for k, (jname, axis, off, lim) in enumerate(arm_chain):
            jp = (off[0], sy * 0.20 if k == 0 else off[1], 0.30 if k == 0 else off[2])
            # roll limits mirror across sides
            limits = lim if (side == "left" or "roll" not in jname) else (-lim[1], -lim[0])
            if jname == "wrist_roll":
                body_name = f"{side}_hand_roll_link"
            elif jname == "wrist_pitch":
                body_name = f"{side}_hand_pitch_link"
            else:
                body_name = f"{side}_{jname}_link"
            parent = b.add_body(
                body_name, parent, JOINT_REVOLUTE, jnt_axis=axis,
                jnt_pos=jp, mass=1.2 if k < 4 else 0.4,
                inertia=np.eye(3) * 0.01,
                jnt_name=f"{side}_{jname}_joint", limits=limits,
                effort_limit=60.0 if k < 4 else 15.0, velocity_limit=3.0,
            )
            if k in (2, 3):  # upper arm / forearm segments
                b.add_geom(parent, GEOM_CAPSULE, (0.040, 0.06),
                           pos=(0, 0, -0.06))
        hands[side] = parent
        # palm
        b.add_geom(parent, GEOM_BOX, (0.015, 0.04, 0.05), pos=(0, 0, -0.05),
                   friction=1.2)

    # hands: 11 joints each (reference L_/R_ naming)
    fingers = ["index", "middle", "pinky", "ring"]
    for side, P in (("L", "left"), ("R", "right")):
        palm = hands[P]
        for fi, f in enumerate(fingers):
            prox = b.add_body(
                f"{P}_{f}_proximal_link", palm, JOINT_REVOLUTE,
                jnt_axis=(0, 1, 0), jnt_pos=(0.0, -0.03 + fi * 0.02, -0.10),
                mass=0.03, inertia=np.eye(3) * 1e-5,
                jnt_name=f"{side}_{f}_proximal_joint", limits=(0.0, 1.5),
                effort_limit=4.0, velocity_limit=6.0,
            )
            inter = b.add_body(
                f"{P}_{f}_intermediate_link", prox, JOINT_REVOLUTE,
                jnt_axis=(0, 1, 0), jnt_pos=(0.0, 0.0, -0.03),
                mass=0.02, inertia=np.eye(3) * 1e-5,
                jnt_name=f"{side}_{f}_intermediate_joint", limits=(0.0, 1.5),
                effort_limit=3.0, velocity_limit=6.0,
            )
            b.add_geom(inter, GEOM_CAPSULE, (0.008, 0.015), pos=(0, 0, -0.015),
                       friction=1.5)
        ty = b.add_body(
            f"{P}_thumb_proximal_yaw_link", palm, JOINT_REVOLUTE,
            jnt_axis=(0, 0, 1), jnt_pos=(0.0, 0.045, -0.05),
            mass=0.03, inertia=np.eye(3) * 1e-5,
            jnt_name=f"{side}_thumb_proximal_yaw_joint", limits=(-1.0, 1.0),
            effort_limit=4.0, velocity_limit=6.0,
        )
        tp = b.add_body(
            f"{P}_thumb_proximal_pitch_link", ty, JOINT_REVOLUTE,
            jnt_axis=(0, 1, 0), jnt_pos=(0.0, 0.0, -0.02),
            mass=0.02, inertia=np.eye(3) * 1e-5,
            jnt_name=f"{side}_thumb_proximal_pitch_joint", limits=(0.0, 1.2),
            effort_limit=3.0, velocity_limit=6.0,
        )
        td = b.add_body(
            f"{P}_thumb_distal_link", tp, JOINT_REVOLUTE,
            jnt_axis=(0, 1, 0), jnt_pos=(0.0, 0.0, -0.025),
            mass=0.01, inertia=np.eye(3) * 1e-6,
            jnt_name=f"{side}_thumb_distal_joint", limits=(0.0, 1.2),
            effort_limit=2.0, velocity_limit=6.0,
        )
        b.add_geom(td, GEOM_CAPSULE, (0.008, 0.012), pos=(0, 0, -0.012),
                   friction=1.5)
    return b.build()


GR1T2_CFG = ArticulationCfg(
    model=build_gr1t2_model,
    init_state=ArticulationInitStateCfg(
        pos=(0.0, 0.0, 0.93),
        rot=(0.7071, 0.0, 0.0, 0.7071),
        # unlisted joints default to 0 (the resolver rejects overlapping
        # regex keys, so only the non-zero defaults are listed)
        joint_pos={".*_elbow_pitch_joint": -1.5708},
    ),
    actuators={
        "body": ImplicitActuatorCfg(
            joint_names_expr=["waist_.*", "head_.*", ".*_shoulder_.*",
                              ".*_elbow_.*", ".*_wrist_.*"],
            stiffness=150.0,
            damping=15.0,
            effort_limit=120.0,
            velocity_limit=3.0,
        ),
        "hands": ImplicitActuatorCfg(
            joint_names_expr=["L_.*", "R_.*"],
            stiffness=10.0,
            damping=1.0,
            effort_limit=4.0,
            velocity_limit=6.0,
        ),
    },
)
"""Fourier GR1T2 humanoid (reference isaaclab_assets/robots/fourier.py)."""
