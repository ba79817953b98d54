"""Action terms (reference ``envs/mdp/actions/`` — joint_actions.py,
binary_joint_actions.py, non_holonomic_actions.py; cfgs at
actions_cfg.py:20-254).
"""

from __future__ import annotations

from dataclasses import MISSING

import jax.numpy as jnp
import numpy as np

from ...managers import ActionTerm, ActionTermCfg, SceneEntityCfg
from ...utils import string as string_utils
from ...utils.configclass import configclass


class JointAction(ActionTerm):
    """Base: regex-selected joints, scale+offset preprocessing
    (reference joint_actions.py:JointAction)."""

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        ids, names = self._asset.find_joints(cfg.joint_names)
        self._joint_ids = np.asarray(ids, dtype=np.int32)
        self._joint_names = names
        n = len(ids)
        scale = cfg.scale
        if isinstance(scale, dict):
            arr = np.ones(n)
            idx, _, vals = string_utils.resolve_matching_names_values(scale, names)
            for i, v in zip(idx, vals):
                arr[i] = v
            self._scale = arr.astype(np.float32)
        else:
            self._scale = np.float32(scale)
        offset = cfg.offset
        if isinstance(offset, dict):
            arr = np.zeros(n)
            idx, _, vals = string_utils.resolve_matching_names_values(offset, names)
            for i, v in zip(idx, vals):
                arr[i] = v
            self._offset = arr.astype(np.float32)
        else:
            self._offset = np.float32(offset)
        self._use_default_offset = getattr(cfg, "use_default_offset", False)

    @property
    def action_dim(self):
        return len(self._joint_ids)

    def _processed(self, env, actions):
        offset = self._offset
        if self._use_default_offset:
            est = env.state.scene.entities[self.cfg.asset_name]
            offset = est.default_joint_pos[:, self._joint_ids]
        out = actions * self._scale + offset
        if self.cfg.clip is not None:
            lo, hi = self.cfg.clip
            out = jnp.clip(out, lo, hi)
        return out


class JointPositionAction(JointAction):
    """Position targets to the PD drive (reference joint_actions.py)."""

    def process_actions(self, env, scene_state, actions):
        target = self._processed(env, actions)
        est = scene_state.entities[self.cfg.asset_name]
        est = self._asset.set_joint_position_target(est, target, self._joint_ids)
        ents = dict(scene_state.entities)
        ents[self.cfg.asset_name] = est
        return scene_state._replace(entities=ents)


class RelativeJointPositionAction(JointAction):
    """Target = current position + scaled action (reference joint_actions.py)."""

    def process_actions(self, env, scene_state, actions):
        cur = self._asset.joint_pos_from_world(scene_state.phys.q)[:, self._joint_ids]
        target = cur + actions * self._scale
        est = scene_state.entities[self.cfg.asset_name]
        est = self._asset.set_joint_position_target(est, target, self._joint_ids)
        ents = dict(scene_state.entities)
        ents[self.cfg.asset_name] = est
        return scene_state._replace(entities=ents)


class JointVelocityAction(JointAction):
    def process_actions(self, env, scene_state, actions):
        target = self._processed(env, actions)
        est = scene_state.entities[self.cfg.asset_name]
        est = self._asset.set_joint_velocity_target(est, target, self._joint_ids)
        ents = dict(scene_state.entities)
        ents[self.cfg.asset_name] = est
        return scene_state._replace(entities=ents)


class JointEffortAction(JointAction):
    def process_actions(self, env, scene_state, actions):
        target = self._processed(env, actions)
        est = scene_state.entities[self.cfg.asset_name]
        est = self._asset.set_joint_effort_target(est, target, self._joint_ids)
        ents = dict(scene_state.entities)
        ents[self.cfg.asset_name] = est
        return scene_state._replace(entities=ents)


class EMAJointPositionToLimitsAction(JointAction):
    """EMA-smoothed position action rescaled into joint limits
    (reference joint_actions_to_limits.py)."""

    def process_actions(self, env, scene_state, actions):
        from ...utils import math as math_utils

        alpha = float(self.cfg.alpha)
        est = scene_state.entities[self.cfg.asset_name]
        prev = est.joint_pos_target[:, self._joint_ids]
        entity = self._asset
        s = entity.slice
        lo = jnp.asarray(
            np.asarray(
                entity.world_model.dof_limit_lower[
                    s.dof_start : s.dof_start + s.dof_count
                ],
                dtype=np.float32,
            )[self._joint_ids]
        )
        hi = jnp.asarray(
            np.asarray(
                entity.world_model.dof_limit_upper[
                    s.dof_start : s.dof_start + s.dof_count
                ],
                dtype=np.float32,
            )[self._joint_ids]
        )
        scaled = math_utils.unscale_transform(
            jnp.clip(actions * self._scale, -1.0, 1.0), lo, hi
        )
        target = alpha * scaled + (1.0 - alpha) * prev
        est = entity.set_joint_position_target(est, target, self._joint_ids)
        ents = dict(scene_state.entities)
        ents[self.cfg.asset_name] = est
        return scene_state._replace(entities=ents)


class BinaryJointPositionAction(ActionTerm):
    """Gripper open/close from one scalar (reference binary_joint_actions.py)."""

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        ids, names = self._asset.find_joints(cfg.joint_names)
        self._joint_ids = np.asarray(ids, dtype=np.int32)
        n = len(ids)

        def resolve(cmd):
            arr = np.zeros(n)
            if isinstance(cmd, dict):
                idx, _, vals = string_utils.resolve_matching_names_values(cmd, names)
                for i, v in zip(idx, vals):
                    arr[i] = v
            else:
                arr[:] = cmd
            return arr.astype(np.float32)

        self._open = resolve(cfg.open_command_expr)
        self._close = resolve(cfg.close_command_expr)

    @property
    def action_dim(self):
        return 1

    def process_actions(self, env, scene_state, actions):
        close = actions[:, 0] > 0.0
        target = jnp.where(close[:, None], self._close[None], self._open[None])
        est = scene_state.entities[self.cfg.asset_name]
        est = self._asset.set_joint_position_target(est, target, self._joint_ids)
        ents = dict(scene_state.entities)
        ents[self.cfg.asset_name] = est
        return scene_state._replace(entities=ents)


class NonHolonomicAction(ActionTerm):
    """(v, w) differential-drive action mapped onto x/y/yaw dummy joints
    (reference non_holonomic_actions.py)."""

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        x_ids, _ = self._asset.find_joints(cfg.x_joint_name)
        y_ids, _ = self._asset.find_joints(cfg.y_joint_name)
        yaw_ids, _ = self._asset.find_joints(cfg.yaw_joint_name)
        self._ids = np.asarray([x_ids[0], y_ids[0], yaw_ids[0]], dtype=np.int32)
        self._scale = np.asarray(cfg.scale, dtype=np.float32)
        self._offset = np.asarray(cfg.offset, dtype=np.float32)

    @property
    def action_dim(self):
        return 2

    def process_actions(self, env, scene_state, actions):
        acts = actions * self._scale + self._offset
        jp = self._asset.joint_pos_from_world(scene_state.phys.q)
        yaw = jp[:, self._ids[2]]
        vx = acts[:, 0] * jnp.cos(yaw)
        vy = acts[:, 0] * jnp.sin(yaw)
        target = jnp.stack([vx, vy, acts[:, 1]], axis=-1)
        est = scene_state.entities[self.cfg.asset_name]
        est = self._asset.set_joint_velocity_target(est, target, self._ids)
        ents = dict(scene_state.entities)
        ents[self.cfg.asset_name] = est
        return scene_state._replace(entities=ents)


# -----------------------------------------------------------------------------
# Cfgs (reference actions_cfg.py:20-254)
# -----------------------------------------------------------------------------


@configclass
class JointActionCfg(ActionTermCfg):
    joint_names: list = MISSING
    scale: object = 1.0
    offset: object = 0.0
    preserve_order: bool = False


@configclass
class JointPositionActionCfg(JointActionCfg):
    class_type: type = JointPositionAction
    use_default_offset: bool = True


@configclass
class RelativeJointPositionActionCfg(JointActionCfg):
    class_type: type = RelativeJointPositionAction
    use_zero_offset: bool = True


@configclass
class JointVelocityActionCfg(JointActionCfg):
    class_type: type = JointVelocityAction
    use_default_offset: bool = True


@configclass
class JointEffortActionCfg(JointActionCfg):
    class_type: type = JointEffortAction


@configclass
class EMAJointPositionToLimitsActionCfg(JointActionCfg):
    class_type: type = EMAJointPositionToLimitsAction
    alpha: float = 1.0
    rescale_to_limits: bool = True


@configclass
class BinaryJointPositionActionCfg(ActionTermCfg):
    class_type: type = BinaryJointPositionAction
    joint_names: list = MISSING
    open_command_expr: dict = MISSING
    close_command_expr: dict = MISSING


@configclass
class NonHolonomicActionCfg(ActionTermCfg):
    class_type: type = NonHolonomicAction
    x_joint_name: str = MISSING
    y_joint_name: str = MISSING
    yaw_joint_name: str = MISSING
    scale: tuple = (1.0, 1.0)
    offset: tuple = (0.0, 0.0)


# ---------------------------------------------------------------------------
# Task-space actions (reference envs/mdp/actions/task_space_actions.py,
# cfgs actions_cfg.py:218 DifferentialInverseKinematicsActionCfg and :254
# OperationalSpaceControllerActionCfg). Jacobians/kinematics come from the
# in-repo engine instead of a PhysX view.
# ---------------------------------------------------------------------------


class _TaskSpaceAction(ActionTerm):
    """Shared machinery: ee body resolution, batched jacobian/pose/velocity
    of the ee frame in the robot root frame."""

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        ids, names = self._asset.find_joints(cfg.joint_names)
        self._joint_ids = np.asarray(ids, dtype=np.int32)
        self._joint_names = names
        bids, bnames = self._asset.find_bodies(cfg.body_name)
        if len(bids) != 1:
            raise ValueError(
                f"body_name '{cfg.body_name}' must match exactly one body, "
                f"got {bnames}"
            )
        self._ee_body_world = self._asset.slice.body_start + int(bids[0])
        # world dof columns of the selected joints
        self._dof_cols = np.asarray(
            self._asset.joint_v_indices()[self._joint_ids], dtype=np.int32
        )
        # the env handed to process_actions is a manager context view; keep
        # the real InteractiveScene for kinematics/jacobians
        self._scene = env.scene
        off = getattr(cfg, "body_offset", None)
        self._offset_pos = (
            np.asarray(off.pos, dtype=np.float32) if off is not None else None
        )
        self._offset_rot = (
            np.asarray(off.rot, dtype=np.float32) if off is not None else None
        )

    def _ee_state(self, env, scene_state):
        """(ee_pos_b, ee_quat_b, ee_vel_w6[lin,ang], jacobian(E,6,n)[lin;ang])
        — poses in the robot root frame (reference computes IK in base frame,
        task_space_actions.py)."""
        import jax as _jax

        from ...physics.kinematics import body_jacobian, body_velocities_world
        from ...utils import math as math_utils

        scene = self._scene
        model = scene.world_model
        kin = scene.kinematics(scene_state)
        b = self._ee_body_world
        ee_pos_w = kin.body_pos_w[:, b]
        ee_quat_w = kin.body_quat_w[:, b]

        J = _jax.vmap(lambda k: body_jacobian(model, k, b))(kin)  # (E,6,nv)
        vel = _jax.vmap(
            lambda k, qd: body_velocities_world(model, k, qd)[b]
        )(kin, scene_state.phys.qd)  # (E,6) [ang, lin]

        if self._offset_pos is not None:
            # shift ee frame by a body-fixed offset; jacobian linear rows and
            # velocity move with the lever arm
            r_w = math_utils.quat_apply(ee_quat_w, self._offset_pos)
            ee_pos_w = ee_pos_w + r_w
            ee_quat_w = math_utils.quat_mul(
                ee_quat_w, jnp.broadcast_to(self._offset_rot, ee_quat_w.shape)
            )
            # lever-arm correction: J_lin_new = J_lin - [r]x J_ang
            rx = math_utils.skew_symmetric_matrix(r_w)
            Jlin = J[:, 3:6] - rx @ J[:, 0:3]
            J = jnp.concatenate([J[:, 0:3], Jlin], axis=1)
            vel = vel.at[:, 3:6].add(jnp.cross(vel[:, 0:3], r_w))

        # root-frame pose (fixed-base robots: root == world up to env origin)
        root_b = self._asset.root_body_index
        root_pos = kin.body_pos_w[:, root_b]
        root_quat = kin.body_quat_w[:, root_b]
        ee_pos_r = math_utils.quat_rotate_inverse(root_quat, ee_pos_w - root_pos)
        ee_quat_r = math_utils.quat_mul(
            math_utils.quat_inv(root_quat), ee_quat_w
        )
        # select joint columns; reorder rows to [lin; ang] (controller layout)
        J = J[:, :, self._dof_cols]
        J = jnp.concatenate([J[:, 3:6], J[:, 0:3]], axis=1)
        vel6 = jnp.concatenate([vel[:, 3:6], vel[:, 0:3]], axis=-1)
        return ee_pos_r, ee_quat_r, vel6, J

    def _write_joint_target(self, scene_state, target, setter):
        est = scene_state.entities[self.cfg.asset_name]
        est = setter(est, target, self._joint_ids)
        ents = dict(scene_state.entities)
        ents[self.cfg.asset_name] = est
        return scene_state._replace(entities=ents)


class DifferentialInverseKinematicsAction(_TaskSpaceAction):
    """Task-space pose action resolved to joint position targets through the
    differential-IK controller (reference task_space_actions.py
    DifferentialInverseKinematicsAction)."""

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        from ...controllers import DifferentialIKController

        self._controller = DifferentialIKController(
            cfg.controller, env.num_envs
        )

    @property
    def action_dim(self):
        return self._controller.action_dim

    def process_actions(self, env, scene_state, actions):
        if self.cfg.scale is not None:
            actions = actions * jnp.asarray(self.cfg.scale)
        ee_pos, ee_quat, _vel, J = self._ee_state(env, scene_state)
        joint_pos = self._asset.joint_pos_from_world(scene_state.phys.q)[
            :, self._joint_ids
        ]
        target = self._controller.compute(actions, ee_pos, ee_quat, J, joint_pos)
        return self._write_joint_target(
            scene_state, target, self._asset.set_joint_position_target
        )


class OperationalSpaceControllerAction(_TaskSpaceAction):
    """Task-space impedance/wrench action resolved to joint efforts through
    the OSC (reference task_space_actions.py OperationalSpaceControllerAction)."""

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        from ...controllers import OperationalSpaceController

        self._controller = OperationalSpaceController(
            cfg.controller, env.num_envs
        )

    @property
    def action_dim(self):
        return self._controller.action_dim

    def process_actions(self, env, scene_state, actions):
        ee_pos, ee_quat, ee_vel, J = self._ee_state(env, scene_state)
        joint_pos = self._asset.joint_pos_from_world(scene_state.phys.q)[
            :, self._joint_ids
        ]
        joint_vel = self._asset.joint_vel_from_world(scene_state.phys.qd)[
            :, self._joint_ids
        ]
        est = scene_state.entities[self.cfg.asset_name]
        default_pos = est.default_joint_pos[:, self._joint_ids]
        tau = self._controller.compute(
            actions, ee_pos, ee_quat, ee_vel, J,
            joint_pos=joint_pos, joint_vel=joint_vel,
            default_joint_pos=default_pos,
        )
        return self._write_joint_target(
            scene_state, tau, self._asset.set_joint_effort_target
        )


@configclass
class BodyOffsetCfg:
    """ee-frame offset from the named body (reference OffsetCfg)."""

    pos: tuple = (0.0, 0.0, 0.0)
    rot: tuple = (1.0, 0.0, 0.0, 0.0)


@configclass
class DifferentialInverseKinematicsActionCfg(ActionTermCfg):
    """Reference actions_cfg.py:218."""

    class_type: type = DifferentialInverseKinematicsAction
    joint_names: list = MISSING
    body_name: str = MISSING
    body_offset: BodyOffsetCfg = None
    scale: object = 1.0
    controller: object = MISSING  # DifferentialIKControllerCfg


@configclass
class OperationalSpaceControllerActionCfg(ActionTermCfg):
    """Reference actions_cfg.py:254."""

    class_type: type = OperationalSpaceControllerAction
    joint_names: list = MISSING
    body_name: str = MISSING
    body_offset: BodyOffsetCfg = None
    controller: object = MISSING  # OperationalSpaceControllerCfg


class PreTrainedPolicyAction(ActionTerm):
    """Hierarchical action (reference navigation mdp
    ``PreTrainedPolicyActionCfg``): the RL action is a base-velocity command
    consumed by a frozen pre-trained low-level locomotion policy that emits
    joint-position targets.

    The low-level observation is assembled inline with the velocity-task
    layout (velocity_env_cfg.py policy group minus the height scan):
    [lin_vel_b, ang_vel_b, gravity_b, command(3), joint_pos_rel,
    joint_vel_rel, last_low_level_action]. The last action is recovered
    statelessly from the previous joint targets.
    """

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        self._scene = env.scene
        n = self._asset.num_joints
        self._n_joints = n
        self._ll_scale = float(cfg.low_level_action_scale)
        obs_dim = 9 + 3 + 3 * n
        from ...rl.networks import ActorCritic

        self._net = ActorCritic(
            num_actions=n,
            actor_dims=tuple(cfg.policy_hidden_dims),
            critic_dims=tuple(cfg.policy_hidden_dims),
        )
        import jax as _jax

        params = self._net.init(
            _jax.random.PRNGKey(0), jnp.zeros((1, obs_dim)),
            jnp.zeros((1, obs_dim)),
        )
        if cfg.policy_path:
            from flax import serialization

            with open(cfg.policy_path, "rb") as f:
                payload = serialization.msgpack_restore(f.read())
            params = payload["params"]
        self._params = params

    @property
    def action_dim(self):
        return 3  # (vx, vy, wz) command

    def process_actions(self, env, scene_state, actions):
        from ...physics.kinematics import forward_kinematics
        from ...utils import math as math_utils

        command = actions * jnp.asarray(self.cfg.scale)
        asset = self._asset
        est = scene_state.entities[self.cfg.asset_name]
        kin = self._scene.kinematics(scene_state)
        rb = asset.root_body_index
        quat = kin.body_quat_w[:, rb]
        qd = scene_state.phys.qd
        vstart = asset.slice.v_start
        ang_w = qd[:, vstart : vstart + 3]
        lin_w = qd[:, vstart + 3 : vstart + 6]
        lin_b = math_utils.quat_rotate_inverse(quat, lin_w)
        ang_b = math_utils.quat_rotate_inverse(quat, ang_w)
        grav = math_utils.quat_rotate_inverse(
            quat, jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), lin_b.shape)
        )
        jp = asset.joint_pos_from_world(scene_state.phys.q)
        jv = asset.joint_vel_from_world(qd)
        last_ll = (est.joint_pos_target - est.default_joint_pos) / self._ll_scale
        obs = jnp.concatenate(
            [lin_b, ang_b, grav, command, jp - est.default_joint_pos, jv,
             last_ll],
            axis=-1,
        )
        mean, _, _ = self._net.apply(self._params, obs, obs)
        target = est.default_joint_pos + self._ll_scale * mean
        est = asset.set_joint_position_target(est, target)
        ents = dict(scene_state.entities)
        ents[self.cfg.asset_name] = est
        return scene_state._replace(entities=ents)


@configclass
class PreTrainedPolicyActionCfg(ActionTermCfg):
    """Reference navigation/mdp/pre_trained_policy_action.py cfg."""

    class_type: type = PreTrainedPolicyAction
    policy_path: str = ""  # msgpack checkpoint from OnPolicyRunner.save
    policy_hidden_dims: list = [128, 128, 128]
    low_level_action_scale: float = 0.5
    scale: tuple = (1.0, 1.0, 1.0)


class PinkInverseKinematicsAction(ActionTerm):
    """Whole-body multi-frame IK action (reference
    ``envs/mdp/actions/pink_actions_cfg.py:PinkInverseKinematicsAction``):
    action = [pose(7) per task frame ...] + hand joint positions. Frame
    targets are absolute poses in the env frame; the controller resolves
    them to position targets on the pink-controlled joints; hand joints are
    position-controlled directly."""

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        from ...controllers import PinkIKController

        self._controller = PinkIKController(cfg.controller, env.num_envs)
        ids, _ = self._asset.find_joints(
            cfg.pink_controlled_joint_names, preserve_order=True
        )
        self._pink_joint_ids = np.asarray(ids, dtype=np.int32)
        ids, _ = self._asset.find_joints(
            cfg.hand_joint_names, preserve_order=True
        )
        self._hand_joint_ids = np.asarray(ids, dtype=np.int32)
        self._frame_bodies = []
        for task in cfg.controller.variable_input_tasks:
            frame = getattr(task, "frame", task)
            # reference frame names carry the URDF asset prefix
            # ("GR1T2_fourier_hand_6dof_<body>"); strip to the body name
            for prefix in ("GR1T2_fourier_hand_6dof_",):
                if isinstance(frame, str) and frame.startswith(prefix):
                    frame = frame[len(prefix):]
            bids, _ = self._asset.find_bodies(frame)
            self._frame_bodies.append(
                self._asset.slice.body_start + int(bids[0])
            )
        self._dof_cols = np.asarray(
            self._asset.joint_v_indices()[self._pink_joint_ids],
            dtype=np.int32,
        )
        self._scene = env.scene

    @property
    def action_dim(self):
        return self._controller.action_dim

    def process_actions(self, env, scene_state, actions):
        import jax as _jax

        from ...physics.kinematics import body_jacobian

        T = self._controller.num_tasks
        targets = actions[:, : 7 * T].reshape(-1, T, 7)
        # normalize target quaternions (teleop streams are not exact)
        q = targets[..., 3:7]
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-6)
        targets = jnp.concatenate([targets[..., 0:3], q], axis=-1)
        hand_targets = actions[:, 7 * T :]

        scene = self._scene
        kin = scene.kinematics(scene_state)
        poses, jacs = [], []
        for b in self._frame_bodies:
            poses.append(
                jnp.concatenate(
                    [kin.body_pos_w[:, b], kin.body_quat_w[:, b]], axis=-1
                )
            )
            J = _jax.vmap(lambda k, b=b: body_jacobian(scene.world_model, k, b))(kin)
            J = J[:, :, self._dof_cols]
            jacs.append(jnp.concatenate([J[:, 3:6], J[:, 0:3]], axis=1))
        frame_poses = jnp.stack(poses, axis=1)
        jacobians = jnp.stack(jacs, axis=1)
        joint_pos = self._asset.joint_pos_from_world(scene_state.phys.q)[
            :, self._pink_joint_ids
        ]
        pink_targets = self._controller.compute(
            targets, frame_poses, jacobians, joint_pos
        )
        est = scene_state.entities[self.cfg.asset_name]
        est = self._asset.set_joint_position_target(
            est, pink_targets, self._pink_joint_ids
        )
        if self._hand_joint_ids.size:
            est = self._asset.set_joint_position_target(
                est, hand_targets, self._hand_joint_ids
            )
        ents = dict(scene_state.entities)
        ents[self.cfg.asset_name] = est
        return scene_state._replace(entities=ents)


@configclass
class PinkInverseKinematicsActionCfg(ActionTermCfg):
    """Reference ``pink_actions_cfg.PinkInverseKinematicsActionCfg``."""

    class_type: type = PinkInverseKinematicsAction
    pink_controlled_joint_names: list = MISSING
    ik_urdf_fixed_joint_names: list = None  # parity only; TPU model is direct
    hand_joint_names: list = None
    controller: object = MISSING  # PinkIKControllerCfg

    def __post_init__(self):
        if self.hand_joint_names is None:
            self.hand_joint_names = []
