"""Factory high-precision assembly (reference
``direct/factory/factory_env.py`` + ``factory_env_cfg.py``: PegInsert,
GearMesh, NutThread variants).

TPU recast: the held asset (peg) is welded to the panda hand (the reference
keeps it grasped by friction inside PhysX); insertion progress is measured by
the reference's keypoint metric — uniformly spaced keypoints along the held
and fixed assets' axes whose pairwise distances shrink to zero at full
insertion (factory_env.py:127-156, 236+). The action is a 6d task-space
delta-pose tracked by joint-space PD through differential IK, matching the
reference's task-space impedance at the level the policy sees. The fixed
asset's receptacle is a raised ring of boxes (a height-field-free socket the
convex narrowphase can handle); non-convex hole walls are out of scope.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ....assets import ArticulationCfg, ArticulationInitStateCfg
from ....controllers import DifferentialIKController, DifferentialIKControllerCfg
from ....envs.direct_rl_env import DirectRLEnv, DirectRLEnvCfg
from ....physics.model import (
    GEOM_BOX,
    GEOM_CAPSULE,
    JOINT_FIXED,
    JOINT_REVOLUTE,
    ModelBuilder,
)
from ....scene import InteractiveSceneCfg
from ....utils import math as math_utils
from ....utils.configclass import configclass


def build_franka_with_peg():
    """Franka arm with a 5cm peg welded below the hand (gripper removed —
    the reference's grasped-peg configuration, factory task held_asset)."""
    from ....assets_presets.franka import build_franka_model

    # rebuild franka but append the peg body to the hand
    b = ModelBuilder("franka_peg")
    limits = [
        (-2.8973, 2.8973), (-1.7628, 1.7628), (-2.8973, 2.8973),
        (-3.0718, -0.0698), (-2.8973, 2.8973), (-0.0175, 3.7525),
        (-2.8973, 2.8973),
    ]
    dh = [
        ((0, 0, 0.333), (0, 0, 1)),
        ((0, 0, 0), (0, 1, 0)),
        ((0, 0, 0.316), (0, 0, 1)),
        ((0.0825, 0, 0), (0, -1, 0)),
        ((-0.0825, 0, 0.384), (0, 0, 1)),
        ((0, 0, 0), (0, -1, 0)),
        ((0.088, 0, 0), (0, 0, -1)),
    ]
    masses = [4.97, 0.65, 3.23, 3.59, 1.22, 1.67, 0.74]
    parent = -1
    for i in range(7):
        pos, axis = dh[i]
        parent = b.add_body(
            f"panda_link{i + 1}", parent, JOINT_REVOLUTE, jnt_axis=axis,
            jnt_pos=pos, mass=masses[i], inertia=np.eye(3) * 0.01,
            jnt_name=f"panda_joint{i + 1}", limits=limits[i],
            effort_limit=87.0 if i < 4 else 12.0, velocity_limit=2.175,
        )
        b.add_geom(parent, GEOM_CAPSULE, (0.06, 0.08))
    hand = b.add_body(
        "panda_hand", parent, JOINT_FIXED, jnt_pos=(0, 0, 0.107),
        mass=0.73, inertia=np.eye(3) * 0.003,
    )
    b.add_geom(hand, GEOM_BOX, (0.03, 0.1, 0.03), pos=(0, 0, 0.03))
    peg = b.add_body(
        "held_asset", hand, JOINT_FIXED, jnt_pos=(0, 0, 0.09),
        mass=0.05, com=(0, 0, 0.025), inertia=np.eye(3) * 1e-5,
    )
    b.add_geom(peg, GEOM_CAPSULE, (0.008, 0.025), pos=(0, 0, 0.025),
               friction=0.8, name="peg")
    return b.build()


def build_socket_model():
    """Fixed asset: base plate with a 4-box ring forming the receptacle."""
    b = ModelBuilder("fixed_asset")
    base = b.add_body("fixed_asset", -1, JOINT_FIXED, mass=1.0,
                      inertia=np.eye(3) * 0.01)
    b.add_geom(base, GEOM_BOX, (0.04, 0.04, 0.01), pos=(0, 0, 0.01))
    w, hole = 0.012, 0.011
    for dx, dy, sx, sy in (
        (hole + w, 0, w, 2 * hole), (-(hole + w), 0, w, 2 * hole),
        (0, hole + w, 2 * hole, w), (0, -(hole + w), 2 * hole, w),
    ):
        b.add_geom(base, GEOM_BOX, (sx, sy, 0.015), pos=(dx, dy, 0.035),
                   friction=0.6)
    return b.build()


@configclass
class FactorySceneCfg(InteractiveSceneCfg):
    robot = ArticulationCfg(
        model=build_franka_with_peg,
        init_state=ArticulationInitStateCfg(
            joint_pos={
                "panda_joint1": 0.0, "panda_joint2": -0.3, "panda_joint3": 0.0,
                "panda_joint4": -2.4, "panda_joint5": 0.0,
                "panda_joint6": 2.3, "panda_joint7": 0.78,
            },
        ),
        actuators={},
    )
    fixed_asset = ArticulationCfg(
        model=build_socket_model,
        init_state=ArticulationInitStateCfg(pos=(0.55, 0.0, 0.0)),
        actuators={},
    )

    def __post_init__(self):
        from ....actuators import ImplicitActuatorCfg

        self.robot.actuators = {
            "arm": ImplicitActuatorCfg(
                joint_names_expr=["panda_joint.*"],
                stiffness=400.0,
                damping=80.0,
                effort_limit=87.0,
                velocity_limit=2.175,
            )
        }


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


class FactoryEnv(DirectRLEnv):
    cfg: FactoryEnvCfg

    def __init__(self, cfg, **kwargs):
        super().__init__(cfg, **kwargs)
        self._robot = self.scene.articulations["robot"]
        self._fixed = self.scene.articulations["fixed_asset"]
        ids, _ = self._robot.find_bodies("held_asset")
        self._held_body = int(ids[0])
        self._fixed_body = self._fixed.root_body_index - 0  # local 0
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
        # hole target frame: 2.5cm above the plate center (full insertion
        # puts the peg mid-line here)
        self._hole_offset = np.array([0.0, 0.0, 0.025], dtype=np.float32)

    def _views(self, state):
        views, _ = self.scene.data_views(state.scene, self.physics_dt)
        return views["robot"], views["fixed_asset"]

    def _keypoints(self, state):
        robot, fixed = self._views(state)
        held_pos = robot.body_pos_w[:, self._held_body]
        held_quat = robot.body_quat_w[:, self._held_body]
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
        robot, _ = self._views(state)
        ee_pos = robot.body_pos_w[:, self._held_body]
        ee_quat = robot.body_quat_w[:, self._held_body]
        # jacobian of the held asset w.r.t. the arm joints
        from ....physics.kinematics import body_jacobian

        kin = self.scene.kinematics(state.scene)
        world_b = self._robot.slice.body_start + self._held_body
        J = jax.vmap(
            lambda k: body_jacobian(self.scene.world_model, k, world_b)
        )(kin)
        cols = self._robot.joint_v_indices()
        J = J[:, :, cols]
        J = jnp.concatenate([J[:, 3:6], J[:, 0:3]], axis=1)  # [lin; ang]
        jp = self._robot.joint_pos_from_world(state.scene.phys.q)
        target = self._ik.compute(delta, ee_pos, ee_quat, J, jp)
        est = state.scene.entities["robot"]
        est = self._robot.set_joint_position_target(est, target)
        ents = dict(state.scene.entities)
        ents["robot"] = est
        return state._replace(
            scene=state.scene._replace(entities=ents), actions=actions
        )

    def _get_observations(self, state):
        robot, fixed = self._views(state)
        held_pos = robot.body_pos_w[:, self._held_body]
        held_quat = robot.body_quat_w[:, self._held_body]
        held_lin = robot.body_lin_vel_w[:, self._held_body]
        held_ang = robot.body_ang_vel_w[:, self._held_body]
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
        q, qd = self._robot.write_joint_state_to_sim(
            state.scene.phys.q, state.scene.phys.qd, jp, jnp.zeros_like(jp),
            mask,
        )
        est = self._robot.set_joint_position_target(est, jp)
        ents = dict(state.scene.entities)
        ents["robot"] = est
        return state._replace(
            scene=state.scene._replace(
                phys=state.scene.phys._replace(q=q, qd=qd), entities=ents
            ),
            key=key,
        )
