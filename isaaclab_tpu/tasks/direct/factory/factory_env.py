"""Factory high-precision assembly (reference
``direct/factory/factory_env.py`` + ``factory_env_cfg.py``: PegInsert,
GearMesh, NutThread variants).

TPU recast (round 3): the held peg is a FREE rigid body grasped by friction
between the Franka fingertip capsules — matching the reference, which keeps
the held asset grasped inside PhysX (factory_env.py:127-156) rather than
welded. The gripper squeezes with the implicit finger drive (closed target);
the peg rides the friction cone through the contact solver. Insertion
progress uses the reference's keypoint metric — uniformly spaced keypoints
along the held and fixed assets' axes whose pairwise distances shrink to
zero at full insertion (factory_env.py:236+). The action is a 6d task-space
delta-pose of the hand tracked through differential IK.

Round 4: the socket is a triangle MESH with a round chamfered through-hole
collided via a precomputed SDF voxel grid (physics/sdf.py) at 1.5 mm radial
clearance — the TPU recast of the reference's PhysX SDF mesh collision
(~0.1 mm; 1.5 mm is what the 0.75 mm voxel grid resolves honestly).
Remaining divergence: the GearMesh/NutThread variants still weld their held
asset to the hand (``FactoryTaskCfg.weld_held_asset``) pending the same
free-body treatment; their gear/nut/bolt geometry is mesh-SDF too
(factory_tasks.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ....assets import (
    ArticulationCfg,
    ArticulationInitStateCfg,
    RigidObjectCfg,
    RigidObjectInitStateCfg,
)
from ....assets_presets.franka import FRANKA_PANDA_CFG
from ....controllers import DifferentialIKController, DifferentialIKControllerCfg
from ....envs.direct_rl_env import DirectRLEnv, DirectRLEnvCfg
from ....physics.model import (
    GEOM_BOX,
    GEOM_CAPSULE,
    JOINT_FIXED,
    JOINT_FREE,
    ModelBuilder,
)
from ....scene import InteractiveSceneCfg
from ....utils import math as math_utils
from ....utils.configclass import configclass

# peg grasped 2 cm from its trailing end; fingertip TCP sits 0.0934 above the
# hand origin (finger joint at +0.0584, fingertip capsule center at +0.035).
# At grasp the peg's +z points OPPOSITE the hand's +z (insertion tip away
# from the palm, trailing end 1.3 cm clear of the hand box) and matches the
# socket frame's +z when inserted, so the shared-offset keypoint metric
# converges to zero.
PEG_RADIUS = 0.008
PEG_HALF_LEN = 0.05
GRASP_FROM_TOP = 0.02  # grasp point below the peg's trailing (+z) end
TCP_OFFSET_Z = 0.0934  # hand local z of the fingertip grasp point
FINGER_CLOSED = 0.0085  # finger q with 0.5 mm squeeze into the peg surface
# grip drive target: ~3.5 mm beyond the contact surface, NOT fully closed —
# at statics the contact normal force equals the finger drive force
# kp*(q - target), so the squeeze offset directly sets the grip:
# 2000 * 3.5mm = 7 N per finger, ~20 N tangential capacity at the 1.4
# combined friction — robust against the 0.6 N peg weight and insertion
# side-loads. A full-close target (0) is NOT used: any transient solver
# under-convergence lets the fingers sink until kp*q collapses, and the
# deep two-sided penetration then ejects the peg.
FINGER_GRIP_TARGET = FINGER_CLOSED - 0.0035


def build_peg_model():
    """Free-body peg (reference held_asset cylinder, 8 mm diameter)."""
    b = ModelBuilder("held_asset")
    m = 0.06
    body = b.add_body(
        "held_asset", -1, JOINT_FREE, mass=m,
        inertia=np.diag([
            m * (3 * PEG_RADIUS**2 + 4 * PEG_HALF_LEN**2) / 12.0,
            m * (3 * PEG_RADIUS**2 + 4 * PEG_HALF_LEN**2) / 12.0,
            m * PEG_RADIUS**2 / 2.0,
        ]),
    )
    b.add_geom(body, GEOM_CAPSULE, (PEG_RADIUS, PEG_HALF_LEN), friction=0.8,
               name="peg")
    return b.build()


# SDF socket: round hole at 1.5 mm radial clearance (reference PhysX SDF
# meshes run ~0.1 mm; 1.5 mm is what the 0.75 mm voxel SDF + velocity-IK
# stack resolves honestly). ISAACLAB_TPU_FACTORY_PRIMITIVES=1 restores the
# legacy 4-box ring (~4.5 mm clearance) for quick CPU tests.
SOCKET_HOLE_RADIUS = 0.0095


def _use_primitive_factory() -> bool:
    import os

    return os.environ.get("ISAACLAB_TPU_FACTORY_PRIMITIVES", "0") == "1"


def build_socket_model():
    """Fixed asset: base plate + receptacle. Default: triangle-mesh annular
    plate with a ROUND through-hole collided via its precomputed SDF grid
    (physics/sdf.py — the TPU recast of the reference's SDF mesh collision,
    direct/factory/factory_env.py + factory_tasks_cfg.py held/fixed USDs)."""
    b = ModelBuilder("fixed_asset")
    base = b.add_body("fixed_asset", -1, JOINT_FIXED, mass=1.0,
                      inertia=np.eye(3) * 0.01)
    b.add_geom(base, GEOM_BOX, (0.04, 0.04, 0.01), pos=(0, 0, 0.01))
    if _use_primitive_factory():
        w, hole = 0.012, 0.0125
        for dx, dy, sx, sy in (
            (hole + w, 0, w, 2 * hole), (-(hole + w), 0, w, 2 * hole),
            (0, hole + w, 2 * hole, w), (0, -hole - w, 2 * hole, w),
        ):
            b.add_geom(base, GEOM_BOX, (sx, sy, 0.015), pos=(dx, dy, 0.035),
                       friction=0.6)
        return b.build()
    from ....physics.model import GEOM_MESH
    from ....physics.sdf import MeshData, annular_plate_mesh, build_mesh_sdf

    V, F = annular_plate_mesh(
        hole_radius=SOCKET_HOLE_RADIUS, outer_half=0.04, thickness=0.03, n=32,
        chamfer=(0.006, 0.005),  # countersunk entry funnels the tight fit
    )
    md = MeshData(V, F, sdf=build_mesh_sdf(V, F, spacing=0.00075))
    # hole spans z 0.02..0.05 above the base plate (same envelope as the
    # legacy ring receptacle)
    b.add_geom(base, GEOM_MESH, (0.04, 0.04, 0.03), pos=(0, 0, 0.02),
               friction=0.6, mesh=md, name="socket_mesh")
    return b.build()


def _high_pd_franka():
    """Reference FRANKA_PANDA_HIGH_PD_CFG (stiffness 400, damping 80): the
    task-space-controlled factory arm. The standard 80/4 gains sag ~0.2 rad
    under gravity, and the relative-mode IK target then chases the sag
    downward every step — the whole gripper drifts and grasps shear apart."""
    cfg = FRANKA_PANDA_CFG.replace(
        init_state=ArticulationInitStateCfg(
            joint_pos={
                "panda_joint1": 0.0, "panda_joint2": -0.3, "panda_joint3": 0.0,
                "panda_joint4": -2.4, "panda_joint5": 0.0,
                "panda_joint6": 2.3, "panda_joint7": 0.78,
                "panda_finger_joint.*": FINGER_CLOSED,
            },
        ),
    )
    acts = dict(cfg.actuators)
    for grp in ("panda_shoulder", "panda_forearm"):
        acts[grp] = acts[grp].replace(stiffness=400.0, damping=80.0)
    return cfg.replace(actuators=acts)


@configclass
class FactorySceneCfg(InteractiveSceneCfg):
    robot = _high_pd_franka()
    held_asset = RigidObjectCfg(
        model=build_peg_model,
        init_state=RigidObjectInitStateCfg(pos=(0.45, 0.0, 0.35)),
    )
    # socket within the comfortable dexterous envelope: the reference mounts
    # robot and socket on a shared table; with a floor-level socket, 0.55 m
    # put the hand-down pose near the Franka's reach boundary and the IK
    # tracked xy with ~80 mm of persistent error
    fixed_asset = ArticulationCfg(
        model=build_socket_model,
        init_state=ArticulationInitStateCfg(pos=(0.45, 0.0, 0.0)),
        actuators={},
    )
    # PhysX-filter equivalent: the held peg collides ONLY with the fingertip
    # pads (reference disables held-asset vs arm collisions); the arm/palm
    # never reaches the socket, so only fingertips+peg interact with it.
    # Also drops ~150 phantom candidate rows from the plan.
    collision_filters = [
        ("robot", "^(?!.*fingertip).*$", "held_asset", ".*"),
        ("robot", "^(?!.*fingertip).*$", "fixed_asset", ".*"),
    ]


@configclass
class FactoryTaskCfg:
    """Reference factory_env_cfg task block (PegInsert values)."""

    name: str = "peg_insert"
    num_keypoints: int = 4
    keypoint_scale: float = 0.15
    keypoint_coef_baseline: tuple = (5.0, 4.0)
    keypoint_coef_coarse: tuple = (50.0, 2.0)
    keypoint_coef_fine: tuple = (100.0, 0.0)
    success_threshold: float = 0.04
    action_bounds: tuple = (0.05, 0.05, 0.05, 0.1, 0.1, 0.1)
    # full insertion: peg bottom tip at the plate top (peg center 0.078
    # above the socket origin: 0.02 plate + 0.05 half-length + 0.008 tip)
    hole_offset: tuple = (0.0, 0.0, 0.078)
    # GearMesh/NutThread still weld the held asset to the hand; PegInsert
    # grasps the free peg by fingertip friction
    weld_held_asset: bool = False


@configclass
class FactoryEnvCfg(DirectRLEnvCfg):
    decimation: int = 8
    episode_length_s: float = 10.0
    action_space: int = 6
    observation_space: int = 20  # rel(3)+quat(4)+lin(3)+ang(3)+rel*10(3)+act4
    scene: FactorySceneCfg = FactorySceneCfg(num_envs=128, env_spacing=2.0)
    task: FactoryTaskCfg = FactoryTaskCfg()

    def __post_init__(self):
        self.sim.dt = 1 / 120.0
        # high-precision contact-rich manipulation: more solver iterations
        # than the locomotion default (reference factory raises PhysX
        # iteration counts too, factory_env_cfg.py sim settings)
        self.sim.physx.solver_iteration_count = 32


class FactoryEnv(DirectRLEnv):
    cfg: FactoryEnvCfg

    def __init__(self, cfg, **kwargs):
        super().__init__(cfg, **kwargs)
        self._robot = self.scene.articulations["robot"]
        self._fixed = self.scene.articulations["fixed_asset"]
        self._welded = bool(cfg.task.weld_held_asset)
        if self._welded:
            ids, _ = self._robot.find_bodies("held_asset")
            self._held_body = int(ids[0])
            self._ee_body = self._held_body
        else:
            self._held = self.scene.rigid_objects["held_asset"]
            ids, _ = self._robot.find_bodies("panda_hand")
            self._ee_body = int(ids[0])
            arm_ids, _ = self._robot.find_joints("panda_joint.*")
            self._arm_joint_ids = np.asarray(arm_ids, dtype=np.int32)
            fin_ids, _ = self._robot.find_joints("panda_finger_joint.*")
            self._finger_joint_ids = np.asarray(fin_ids, dtype=np.int32)
        self._ik = DifferentialIKController(
            DifferentialIKControllerCfg(
                command_type="pose", use_relative_mode=True, ik_method="dls"
            ),
            self.num_envs,
        )
        # keypoints along +z of each asset (reference _get_keypoint_offsets)
        ks = cfg.task.keypoint_scale
        n = cfg.task.num_keypoints
        self._kp_offsets = np.stack(
            [np.zeros(n), np.zeros(n), (np.linspace(0, 1, n) - 0.5) * ks],
            axis=-1,
        ).astype(np.float32)
        self._hole_offset = np.asarray(cfg.task.hole_offset, dtype=np.float32)
        if self._welded:
            # welded variants keep the legacy 2.5 cm ring-center target
            self._hole_offset = np.array([0.0, 0.0, 0.025], dtype=np.float32)

    def _views(self, state):
        views, _ = self.scene.data_views(state.scene, self.physics_dt)
        return views, views["robot"], views["fixed_asset"]

    def _held_pose_vel(self, state):
        """(pos, quat, lin_vel, ang_vel) of the held asset."""
        views, robot, _ = self._views(state)
        if self._welded:
            return (
                robot.body_pos_w[:, self._held_body],
                robot.body_quat_w[:, self._held_body],
                robot.body_lin_vel_w[:, self._held_body],
                robot.body_ang_vel_w[:, self._held_body],
            )
        held = views["held_asset"]
        return (
            held.root_pos_w,
            held.root_quat_w,
            held.root_lin_vel_w,
            held.root_ang_vel_w,
        )

    def _keypoints(self, state):
        _, _, fixed = self._views(state)
        held_pos, held_quat, _, _ = self._held_pose_vel(state)
        fixed_pos = fixed.root_pos_w + self._hole_offset[None]
        fixed_quat = fixed.root_quat_w
        off = jnp.asarray(self._kp_offsets)  # (K, 3)
        kp_held = held_pos[:, None] + math_utils.quat_apply(
            held_quat[:, None], jnp.broadcast_to(
                off[None], (held_pos.shape[0],) + off.shape
            )
        )
        kp_fixed = fixed_pos[:, None] + math_utils.quat_apply(
            fixed_quat[:, None], jnp.broadcast_to(
                off[None], (fixed_pos.shape[0],) + off.shape
            )
        )
        return kp_held, kp_fixed

    def _pre_physics_step(self, state, actions):
        bounds = jnp.asarray(self.cfg.task.action_bounds)
        delta = jnp.clip(actions, -1.0, 1.0) * bounds
        _, robot, _ = self._views(state)
        ee_pos = robot.body_pos_w[:, self._ee_body]
        ee_quat = robot.body_quat_w[:, self._ee_body]
        # jacobian of the end-effector body w.r.t. the arm joints
        from ....physics.kinematics import body_jacobian

        kin = self.scene.kinematics(state.scene)
        world_b = self._robot.slice.body_start + self._ee_body
        J = jax.vmap(
            lambda k: body_jacobian(self.scene.world_model, k, world_b)
        )(kin)
        cols = self._robot.joint_v_indices()
        if not self._welded:
            cols = cols[self._arm_joint_ids]
        J = J[:, :, cols]
        J = jnp.concatenate([J[:, 3:6], J[:, 0:3]], axis=1)  # [lin; ang]
        jp_all = self._robot.joint_pos_from_world(state.scene.phys.q)
        jp = jp_all if self._welded else jp_all[:, self._arm_joint_ids]
        target = self._ik.compute(delta, ee_pos, ee_quat, J, jp)
        if not self._welded:
            # full target vector: IK arm targets + fingers at the grip squeeze
            full = jnp.full_like(jp_all, FINGER_GRIP_TARGET)
            full = full.at[:, self._arm_joint_ids].set(target)
            target = full
        est = state.scene.entities["robot"]
        est = self._robot.set_joint_position_target(est, target)
        ents = dict(state.scene.entities)
        ents["robot"] = est
        return state._replace(
            scene=state.scene._replace(entities=ents), actions=actions
        )

    def _get_observations(self, state):
        _, _, fixed = self._views(state)
        held_pos, held_quat, held_lin, held_ang = self._held_pose_vel(state)
        rel = held_pos - (fixed.root_pos_w + self._hole_offset[None])
        obs = jnp.concatenate(
            [rel, held_quat, held_lin, held_ang, rel * 10.0, state.actions[:, :4]],
            axis=-1,
        )
        return {"policy": obs}

    def _get_rewards(self, state):
        """Reference factory keypoint reward: sum of squashed keypoint
        distances at three length scales (factory_env.py keypoint_coef_*)."""
        t = self.cfg.task
        kp_held, kp_fixed = self._keypoints(state)
        d = jnp.mean(jnp.linalg.norm(kp_held - kp_fixed, axis=-1), axis=-1)

        def squash(a, b):
            return 1.0 / (jnp.exp(a * d) + b + jnp.exp(-a * d))

        rew = (
            squash(*t.keypoint_coef_baseline)
            + squash(*t.keypoint_coef_coarse)
            + squash(*t.keypoint_coef_fine)
        )
        success = d < t.success_threshold
        return rew + 10.0 * success.astype(jnp.float32)

    def _get_dones(self, state):
        t = self.cfg.task
        kp_held, kp_fixed = self._keypoints(state)
        d = jnp.mean(jnp.linalg.norm(kp_held - kp_fixed, axis=-1), axis=-1)
        success = d < t.success_threshold
        time_out = state.episode_length >= self.max_episode_length - 1
        return success, time_out

    def _reset_idx(self, state, mask):
        state = super()._reset_idx(state, mask)
        key, k1 = jax.random.split(state.key)
        E = self.num_envs
        n = self._robot.num_joints
        est = state.scene.entities["robot"]
        noise = jax.random.uniform(k1, (E, n), minval=-0.05, maxval=0.05)
        jp = est.default_joint_pos + noise
        if not self._welded:
            # fingers: exactly at the closed-on-peg position, no noise
            jp = jp.at[:, self._finger_joint_ids].set(FINGER_CLOSED)
        q, qd = self._robot.write_joint_state_to_sim(
            state.scene.phys.q, state.scene.phys.qd, jp, jnp.zeros_like(jp),
            mask,
        )
        target = jp
        if not self._welded:
            target = target.at[:, self._finger_joint_ids].set(
                FINGER_GRIP_TARGET
            )
        est = self._robot.set_joint_position_target(est, target)
        ents = dict(state.scene.entities)
        ents["robot"] = est
        state = state._replace(
            scene=state.scene._replace(
                phys=state.scene.phys._replace(q=q, qd=qd), entities=ents
            ),
            key=key,
        )
        if self._welded:
            return state
        # place the free peg in the grasp: grasp point (2 cm below the peg's
        # trailing end) at the fingertip TCP, peg z OPPOSITE the hand z so
        # the insertion tip points into the workspace (reference factory
        # resets with the held asset in the gripper, factory_env.py:127-156)
        kin = self.scene.kinematics(state.scene)
        hb = self._robot.slice.body_start + self._ee_body
        hand_pos = kin.body_pos_w[:, hb]
        hand_quat = kin.body_quat_w[:, hb]
        local = jnp.array(
            [0.0, 0.0, TCP_OFFSET_Z + PEG_HALF_LEN - GRASP_FROM_TOP]
        )
        peg_pos = hand_pos + math_utils.quat_apply(
            hand_quat, jnp.broadcast_to(local, (E, 3))
        )
        flip_x = jnp.array([0.0, 1.0, 0.0, 0.0])  # 180 deg about x (wxyz)
        peg_quat = math_utils.quat_mul(
            hand_quat, jnp.broadcast_to(flip_x, (E, 4))
        )
        pose = jnp.concatenate([peg_pos, peg_quat], axis=-1)
        q2 = self._held.write_root_pose_to_sim(state.scene.phys.q, pose, mask)
        qd2 = self._held.write_root_velocity_to_sim(
            q2, state.scene.phys.qd, jnp.zeros((E, 6)), mask
        )
        return state._replace(
            scene=state.scene._replace(
                phys=state.scene.phys._replace(q=q2, qd=qd2)
            )
        )
