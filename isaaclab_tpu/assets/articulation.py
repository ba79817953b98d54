"""Articulation asset: the core robot abstraction.

TPU-native counterpart of the reference ``Articulation``
(``assets/articulation/articulation.py``) and ``ArticulationData``
(``articulation_data.py``): the same read/write API surface, but backed by
slices of the merged world physics state instead of a PhysX
``ArticulationView``. All write_* methods are pure state transforms
``(state, value, env_mask) -> state``; all data properties are lazily computed
from FK products inside the jitted step (XLA CSE dedupes repeated access).

Quaternions are (w, x, y, z); root states are 13-vectors
[pos(3), quat(4), lin_vel(3), ang_vel(3)] in world frame, matching the
reference's ``root_state_w`` layout (articulation_data.py:366-430).
"""

from __future__ import annotations

import functools
from dataclasses import MISSING
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import kinematics as K
from ..physics.engine import JointDrive
from ..physics.model import JOINT_FREE, EntitySlice, RobotModel
from ..utils import math as math_utils
from ..utils import string as string_utils
from ..utils.configclass import configclass
from .asset_base import AssetBase, AssetBaseCfg

# host numpy on purpose: closure-captured DEVICE constants force a
# device-to-host fetch at trace time (degrades tunneled-TPU runtimes)
GRAVITY_DIR = np.array([0.0, 0.0, -1.0], dtype=np.float32)
FORWARD_VEC_B = np.array([1.0, 0.0, 0.0], dtype=np.float32)


@configclass
class ArticulationInitStateCfg:
    """Reference ``ArticulationCfg.InitialStateCfg``."""

    pos: tuple = (0.0, 0.0, 0.0)
    rot: tuple = (1.0, 0.0, 0.0, 0.0)
    lin_vel: tuple = (0.0, 0.0, 0.0)
    ang_vel: tuple = (0.0, 0.0, 0.0)
    joint_pos: dict = {".*": 0.0}
    joint_vel: dict = {".*": 0.0}


@configclass
class ArticulationCfg(AssetBaseCfg):
    """Reference ``ArticulationCfg`` (assets/articulation/articulation_cfg.py),
    with ``spawn`` replaced by a model source (URDF/MJCF path or builder fn)."""

    model: object = MISSING  # RobotModel | callable -> RobotModel | path str
    init_state: ArticulationInitStateCfg = ArticulationInitStateCfg()
    actuators: dict = {}
    soft_joint_pos_limit_factor: float = 1.0


class ArticulationEntityState(NamedTuple):
    """Batched per-env dynamic state owned by one articulation entity."""

    joint_pos_target: jnp.ndarray  # (E, nu)
    joint_vel_target: jnp.ndarray  # (E, nu)
    joint_effort_target: jnp.ndarray  # (E, nu)
    stiffness: jnp.ndarray  # (E, nu) drive gains (randomizable)
    damping: jnp.ndarray  # (E, nu)
    default_joint_pos: jnp.ndarray  # (E, nu)
    default_joint_vel: jnp.ndarray  # (E, nu)
    default_root_state: jnp.ndarray  # (E, 13)
    applied_torque: jnp.ndarray  # (E, nu) last applied actuator torques
    actuator_states: tuple  # per-actuator-group pytrees


class Articulation(AssetBase):
    """Host-side facade; bound to an :class:`EntitySlice` of the world model."""

    def __init__(self, cfg: ArticulationCfg, model: RobotModel):
        self.cfg = cfg
        self.model = model  # entity-local model (pre-merge)
        self.slice: EntitySlice | None = None  # set by the scene after merge
        self.world_model: RobotModel | None = None
        self.is_fixed_base = not model.floating_base
        self.joint_names = list(model.dof_names)
        self.body_names = list(model.body_names)
        self.num_joints = model.nu
        self.num_bodies = model.nbody
        self.num_fixed_tendons = model.ntendon
        self.fixed_tendon_names = list(model.tendon_names)
        self._actuators = {}
        # resolved at bind time
        self._default_joint_pos = None
        self._default_joint_vel = None

    # ------------------------------------------------------------------
    # Static queries (reference articulation.py:209-245)
    # ------------------------------------------------------------------
    def find_joints(self, name_keys, preserve_order: bool = False):
        return string_utils.resolve_matching_names(
            name_keys, self.joint_names, preserve_order
        )

    def find_bodies(self, name_keys, preserve_order: bool = False):
        return string_utils.resolve_matching_names(
            name_keys, self.body_names, preserve_order
        )

    def find_fixed_tendons(self, name_keys, preserve_order: bool = False):
        """Reference articulation.py:247-272."""
        return string_utils.resolve_matching_names(
            name_keys, self.fixed_tendon_names, preserve_order
        )

    @property
    def actuators(self) -> dict:
        return self._actuators

    # ------------------------------------------------------------------
    # Binding (scene calls this after merging models)
    # ------------------------------------------------------------------
    def bind(self, world_model: RobotModel, eslice: EntitySlice):
        self.world_model = world_model
        self.slice = eslice
        # build actuator instances from cfg
        from ..actuators.actuator_base import ActuatorBase

        self._actuators = {}
        claimed = np.zeros(self.num_joints, dtype=bool)
        for name, acfg in (self.cfg.actuators or {}).items():
            ids, names = self.find_joints(acfg.joint_names_expr)
            act: ActuatorBase = acfg.class_type(acfg, names, ids)
            self._actuators[name] = act
            claimed[ids] = True
        self._unclaimed = ~claimed
        # resolve default joint state from init_state cfg
        jp = np.zeros(self.num_joints)
        jv = np.zeros(self.num_joints)
        if self.num_joints:
            idx, _, vals = string_utils.resolve_matching_names_values(
                self.cfg.init_state.joint_pos, self.joint_names
            )
            for i, v in zip(idx, vals):
                jp[i] = v
            idx, _, vals = string_utils.resolve_matching_names_values(
                self.cfg.init_state.joint_vel, self.joint_names
            )
            for i, v in zip(idx, vals):
                jv[i] = v
        self._default_joint_pos = jp.astype(np.float32)
        self._default_joint_vel = jv.astype(np.float32)

    def init_entity_state(self, num_envs: int, env_origins) -> ArticulationEntityState:
        """Initial batched entity state (defaults tiled over envs)."""
        nu = self.num_joints
        E = num_envs
        ist = self.cfg.init_state
        root13 = jnp.concatenate(
            [
                jnp.asarray(ist.pos),
                jnp.asarray(ist.rot),
                jnp.asarray(ist.lin_vel),
                jnp.asarray(ist.ang_vel),
            ]
        )
        root = jnp.tile(root13, (E, 1))
        root = root.at[:, 0:3].add(env_origins)
        stiff = np.zeros(nu, dtype=np.float32)
        damp = np.zeros(nu, dtype=np.float32)
        act_states = []
        for act in self._actuators.values():
            # actuator params are host numpy by design — NO device-to-host
            # copies here (a single D2H degrades tunneled-TPU dispatch)
            stiff[act.joint_ids] = act.stiffness
            damp[act.joint_ids] = act.damping
            act_states.append(act.init_state(E))
        tile = lambda x: jnp.tile(jnp.asarray(x), (E, 1))
        z = jnp.zeros((E, nu))
        return ArticulationEntityState(
            joint_pos_target=tile(self._default_joint_pos),
            joint_vel_target=z,
            joint_effort_target=z,
            stiffness=tile(stiff),
            damping=tile(damp),
            default_joint_pos=tile(self._default_joint_pos),
            default_joint_vel=tile(self._default_joint_vel),
            default_root_state=root,
            applied_torque=z,
            actuator_states=tuple(act_states),
        )

    # ------------------------------------------------------------------
    # Slicing helpers (world-state <-> entity views). All batched (E, ...).
    # ------------------------------------------------------------------
    def joint_q_indices(self) -> np.ndarray:
        """World q indices of this entity's articulated joints (static)."""
        wm, s = self.world_model, self.slice
        idx = []
        for d in range(s.dof_start, s.dof_start + s.dof_count):
            b = int(wm.dof_body[d])
            idx.append(int(wm.q_start[b]))
        return np.asarray(idx, dtype=np.int32)

    def joint_v_indices(self) -> np.ndarray:
        wm, s = self.world_model, self.slice
        return np.asarray(
            wm.dof_v_index[s.dof_start : s.dof_start + s.dof_count], dtype=np.int32
        )

    def joint_pos_from_world(self, q):
        return q[..., self.joint_q_indices()]

    def joint_vel_from_world(self, qd):
        return qd[..., self.joint_v_indices()]

    @property
    def root_body_index(self) -> int:
        return self.slice.body_start

    # ------------------------------------------------------------------
    # Write API (pure transforms on the scene's world arrays)
    # env_mask: (E,) bool or None (all envs)
    # ------------------------------------------------------------------
    @staticmethod
    def _mask(env_mask, like):
        if env_mask is None:
            return jnp.ones(like.shape[0], dtype=bool)
        return env_mask

    def write_root_pose_to_sim(self, q, pose, env_mask=None):
        """Set root [pos(3), quat(4)] for a floating-base entity
        (reference articulation.py:274-346)."""
        if self.is_fixed_base:
            return q
        s = self.slice
        m = self._mask(env_mask, q)[:, None]
        qs = s.q_start
        q = q.at[:, qs : qs + 7].set(jnp.where(m, pose, q[:, qs : qs + 7]))
        return q

    def write_root_velocity_to_sim(self, q, qd, vel_w, env_mask=None):
        """Set root world [lin_vel(3), ang_vel(3)]; converts to the engine's
        body-frame free-joint coordinates (reference articulation.py:348-471)."""
        if self.is_fixed_base:
            return qd
        s = self.slice
        m = self._mask(env_mask, qd)[:, None]
        # engine free-joint coordinates are world-frame (ang, lin)
        v_new = jnp.concatenate([vel_w[:, 3:6], vel_w[:, 0:3]], axis=-1)
        vs = s.v_start
        qd = qd.at[:, vs : vs + 6].set(jnp.where(m, v_new, qd[:, vs : vs + 6]))
        return qd

    def write_joint_state_to_sim(self, q, qd, joint_pos, joint_vel, env_mask=None):
        """Set articulated joint positions/velocities
        (reference articulation.py:473-556)."""
        if self.num_joints == 0:
            return q, qd
        qi = self.joint_q_indices()
        vi = self.joint_v_indices()
        m = self._mask(env_mask, q)[:, None]
        q = q.at[:, qi].set(jnp.where(m, joint_pos, q[:, qi]))
        qd = qd.at[:, vi].set(jnp.where(m, joint_vel, qd[:, vi]))
        return q, qd

    def set_joint_position_target(self, est: ArticulationEntityState, target,
                                  joint_ids=None, env_mask=None):
        """Reference articulation.py:882-907."""
        return self._set_target(est, "joint_pos_target", target, joint_ids, env_mask)

    def set_joint_velocity_target(self, est, target, joint_ids=None, env_mask=None):
        return self._set_target(est, "joint_vel_target", target, joint_ids, env_mask)

    def set_joint_effort_target(self, est, target, joint_ids=None, env_mask=None):
        return self._set_target(est, "joint_effort_target", target, joint_ids, env_mask)

    def _set_target(self, est, field, target, joint_ids, env_mask):
        cur = getattr(est, field)
        if joint_ids is not None:
            ids = jnp.asarray(joint_ids)
            new = cur.at[:, ids].set(target) if env_mask is None else cur.at[
                :, ids
            ].set(jnp.where(env_mask[:, None], target, cur[:, ids]))
        else:
            new = (
                target
                if env_mask is None
                else jnp.where(env_mask[:, None], target, cur)
            )
        return est._replace(**{field: new})

    # ------------------------------------------------------------------
    # Fixed tendons (reference articulation.py:958-1145). The reference
    # buffers set_fixed_tendon_* writes and pushes them on
    # write_fixed_tendon_properties_to_sim; here each setter is a pure
    # transform on the scene's batched ``BodyParams`` pytree (the engine
    # reads tendon properties from there every substep, so the "write to
    # sim" is implicit).
    # ------------------------------------------------------------------
    def _tendon_ids_world(self, fixed_tendon_ids=None) -> np.ndarray:
        base = self.slice.tendon_start
        if fixed_tendon_ids is None:
            return base + np.arange(self.num_fixed_tendons, dtype=np.int32)
        return base + np.asarray(fixed_tendon_ids, dtype=np.int32)

    def _set_tendon_prop(self, params, field, value, fixed_tendon_ids, env_mask):
        ids = self._tendon_ids_world(fixed_tendon_ids)
        cur = getattr(params, field)
        new_sel = (
            value
            if env_mask is None
            else jnp.where(env_mask[:, None], value, cur[:, ids])
        )
        return params._replace(**{field: cur.at[:, ids].set(new_sel)})

    def set_fixed_tendon_stiffness(self, params, stiffness,
                                   fixed_tendon_ids=None, env_mask=None):
        return self._set_tendon_prop(
            params, "tendon_stiffness", stiffness, fixed_tendon_ids, env_mask
        )

    def set_fixed_tendon_damping(self, params, damping,
                                 fixed_tendon_ids=None, env_mask=None):
        return self._set_tendon_prop(
            params, "tendon_damping", damping, fixed_tendon_ids, env_mask
        )

    def set_fixed_tendon_limit_stiffness(self, params, limit_stiffness,
                                         fixed_tendon_ids=None, env_mask=None):
        return self._set_tendon_prop(
            params, "tendon_limit_stiffness", limit_stiffness,
            fixed_tendon_ids, env_mask,
        )

    def set_fixed_tendon_position_limit(self, params, limit,
                                        fixed_tendon_ids=None, env_mask=None):
        """``limit``: (E, n, 2) lower/upper."""
        params = self._set_tendon_prop(
            params, "tendon_limit_lower", limit[..., 0], fixed_tendon_ids,
            env_mask,
        )
        return self._set_tendon_prop(
            params, "tendon_limit_upper", limit[..., 1], fixed_tendon_ids,
            env_mask,
        )

    def set_fixed_tendon_rest_length(self, params, rest_length,
                                     fixed_tendon_ids=None, env_mask=None):
        return self._set_tendon_prop(
            params, "tendon_rest_length", rest_length, fixed_tendon_ids,
            env_mask,
        )

    def set_fixed_tendon_offset(self, params, offset,
                                fixed_tendon_ids=None, env_mask=None):
        return self._set_tendon_prop(
            params, "tendon_offset", offset, fixed_tendon_ids, env_mask
        )

    def write_fixed_tendon_properties_to_sim(self, params, *a, **kw):
        """No-op for API parity: setters already returned the updated
        ``BodyParams`` (pure-state design has no deferred write)."""
        return params

    # ------------------------------------------------------------------
    # Actuator pipeline (reference articulation.py:_apply_actuator_model:1432)
    # ------------------------------------------------------------------
    def compute_drive(self, est: ArticulationEntityState, q, qd):
        """Run all actuator groups -> (new entity state, per-joint drive arrays).

        Returns arrays over this entity's nu joints: (kp, kd, pos_t, vel_t,
        effort) each (E, nu), plus applied_torque bookkeeping.
        """
        nu = self.num_joints
        E = q.shape[0]
        jp = self.joint_pos_from_world(q)
        jv = self.joint_vel_from_world(qd)
        kp = jnp.zeros((E, nu))
        kd = jnp.zeros((E, nu))
        pos_t = jnp.zeros((E, nu))
        vel_t = jnp.zeros((E, nu))
        effort = jnp.zeros((E, nu))
        applied = jnp.zeros((E, nu))
        new_states = []
        from ..actuators.actuator_base import ActuatorCommand

        for act, astate in zip(self._actuators.values(), est.actuator_states):
            ids = jnp.asarray(act.joint_ids)
            cmd = ActuatorCommand(
                pos_target=est.joint_pos_target[:, ids],
                vel_target=est.joint_vel_target[:, ids],
                effort=est.joint_effort_target[:, ids],
            )
            # gains may be randomized per env: override actuator statics
            act_stiff = est.stiffness[:, ids]
            act_damp = est.damping[:, ids]
            if act.is_implicit:
                astate2, drive = act.compute(astate, cmd, jp[:, ids], jv[:, ids])
                drive = drive._replace(kp=act_stiff, kd=act_damp)
            else:
                # explicit: patch gains into the PD formula via a local call
                saved_k, saved_d = act.stiffness, act.damping
                act.stiffness, act.damping = act_stiff, act_damp
                astate2, drive = act.compute(astate, cmd, jp[:, ids], jv[:, ids])
                act.stiffness, act.damping = saved_k, saved_d
            new_states.append(astate2)
            kp = kp.at[:, ids].set(drive.kp * jnp.ones((E, 1)))
            kd = kd.at[:, ids].set(drive.kd * jnp.ones((E, 1)))
            pos_t = pos_t.at[:, ids].set(drive.pos_target * jnp.ones((E, 1)))
            vel_t = vel_t.at[:, ids].set(drive.vel_target * jnp.ones((E, 1)))
            effort = effort.at[:, ids].set(drive.effort * jnp.ones((E, 1)))
            applied = applied.at[:, ids].set(
                drive.effort
                + drive.kp * (drive.pos_target - jp[:, ids])
                + drive.kd * (drive.vel_target - jv[:, ids])
            )
        est = est._replace(actuator_states=tuple(new_states), applied_torque=applied)
        return est, (kp, kd, pos_t, vel_t, effort)

    # ------------------------------------------------------------------
    # Data view (reference ArticulationData)
    # ------------------------------------------------------------------
    def data(self, world_kin_batched, q, qd, qd_prev, est, dt: float):
        return ArticulationData(self, world_kin_batched, q, qd, qd_prev, est, dt)


class ArticulationData:
    """Lazily-computed batched data view (reference articulation_data.py).

    Holds references to the world FK products + state slices; every property
    is computed on access inside the current trace.
    """

    def __init__(self, art: Articulation, kin, q, qd, qd_prev, est, dt):
        self._art = art
        self._kin = kin  # batched Kinematics for the whole world
        self._q = q
        self._qd = qd
        self._qd_prev = qd_prev
        self._est = est
        self._dt = dt
        self._body_vel_cache = None

    # --- root state (world frame) ---
    @property
    def root_pos_w(self):
        return self._kin.body_pos_w[:, self._art.root_body_index]

    @property
    def root_quat_w(self):
        return self._kin.body_quat_w[:, self._art.root_body_index]

    @property
    def root_lin_vel_w(self):
        if self._art.is_fixed_base:
            return jnp.zeros((self._q.shape[0], 3))
        vs = self._art.slice.v_start
        return self._qd[:, vs + 3 : vs + 6]

    @property
    def root_ang_vel_w(self):
        if self._art.is_fixed_base:
            return jnp.zeros((self._q.shape[0], 3))
        vs = self._art.slice.v_start
        return self._qd[:, vs : vs + 3]

    @property
    def root_lin_vel_b(self):
        return math_utils.quat_apply_inverse(self.root_quat_w, self.root_lin_vel_w)

    @property
    def root_ang_vel_b(self):
        return math_utils.quat_apply_inverse(self.root_quat_w, self.root_ang_vel_w)

    @property
    def root_state_w(self):
        return jnp.concatenate(
            [self.root_pos_w, self.root_quat_w, self.root_lin_vel_w, self.root_ang_vel_w],
            axis=-1,
        )

    @property
    def root_link_state_w(self):
        return self.root_state_w

    @property
    def root_com_state_w(self):
        # COM-frame variant (reference articulation_data.py link vs COM):
        # approximated by the link frame state (COM offset rotation-coupled
        # velocity differences are negligible for RL observation use).
        return self.root_state_w

    @property
    def projected_gravity_b(self):
        """Gravity direction in base frame (reference articulation_data.py:513)."""
        return math_utils.quat_apply_inverse(self.root_quat_w, GRAVITY_DIR)

    @property
    def heading_w(self):
        """Yaw heading of the base (reference articulation_data.py:518)."""
        fwd = math_utils.quat_apply(self.root_quat_w, FORWARD_VEC_B)
        return jnp.arctan2(fwd[..., 1], fwd[..., 0])

    # --- joint state ---
    @property
    def joint_pos(self):
        return self._art.joint_pos_from_world(self._q)

    @property
    def joint_vel(self):
        return self._art.joint_vel_from_world(self._qd)

    @property
    def joint_acc(self):
        vi = self._art.joint_v_indices()
        return (self._qd[:, vi] - self._qd_prev[:, vi]) / self._dt

    @property
    def default_joint_pos(self):
        return self._est.default_joint_pos

    @property
    def default_joint_vel(self):
        return self._est.default_joint_vel

    @property
    def default_root_state(self):
        return self._est.default_root_state

    @property
    def joint_pos_target(self):
        return self._est.joint_pos_target

    @property
    def joint_vel_target(self):
        return self._est.joint_vel_target

    @property
    def joint_effort_target(self):
        return self._est.joint_effort_target

    @property
    def applied_torque(self):
        return self._est.applied_torque

    @property
    def computed_torque(self):
        return self._est.applied_torque

    @property
    def joint_stiffness(self):
        return self._est.stiffness

    @property
    def joint_damping(self):
        return self._est.damping

    @property
    def joint_pos_limits(self):
        art = self._art
        s = art.slice
        lo = jnp.asarray(art.world_model.dof_limit_lower[s.dof_start : s.dof_start + s.dof_count])
        hi = jnp.asarray(art.world_model.dof_limit_upper[s.dof_start : s.dof_start + s.dof_count])
        E = self._q.shape[0]
        return jnp.broadcast_to(jnp.stack([lo, hi], -1), (E, art.num_joints, 2))

    @property
    def soft_joint_pos_limits(self):
        """Limits shrunk by the soft factor (reference articulation_data.py:310)."""
        lim = self.joint_pos_limits
        mid = (lim[..., 0] + lim[..., 1]) * 0.5
        half = (lim[..., 1] - lim[..., 0]) * 0.5
        f = self._art.cfg.soft_joint_pos_limit_factor
        return jnp.stack([mid - half * f, mid + half * f], axis=-1)

    @property
    def joint_vel_limits(self):
        art = self._art
        s = art.slice
        vl = jnp.asarray(
            art.world_model.dof_velocity_limit[s.dof_start : s.dof_start + s.dof_count]
        )
        return jnp.broadcast_to(vl, (self._q.shape[0], art.num_joints))

    # --- body states ---
    def _body_slice(self):
        s = self._art.slice
        return slice(s.body_start, s.body_start + s.body_count)

    @property
    def body_pos_w(self):
        return self._kin.body_pos_w[:, self._body_slice()]

    @property
    def body_quat_w(self):
        return self._kin.body_quat_w[:, self._body_slice()]

    def _body_vels(self):
        if self._body_vel_cache is None:
            wm = self._art.world_model
            vels = jax.vmap(lambda k, v: K.body_velocities_world(wm, k, v))(
                self._kin, self._qd
            )
            self._body_vel_cache = vels
        return self._body_vel_cache

    @property
    def body_ang_vel_w(self):
        return self._body_vels()[:, self._body_slice(), 0:3]

    @property
    def body_lin_vel_w(self):
        return self._body_vels()[:, self._body_slice(), 3:6]

    @property
    def body_state_w(self):
        return jnp.concatenate(
            [self.body_pos_w, self.body_quat_w, self.body_lin_vel_w, self.body_ang_vel_w],
            axis=-1,
        )

    @property
    def body_link_pos_w(self):
        return self.body_pos_w

    @property
    def body_link_quat_w(self):
        return self.body_quat_w
