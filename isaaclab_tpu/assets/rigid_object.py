"""Rigid object asset (reference ``assets/rigid_object/``).

A rigid object is a 1-body free-floating entity in the merged world forest —
the same pattern as :class:`Articulation` without articulated joints.
"""

from __future__ import annotations

from dataclasses import MISSING
from typing import NamedTuple

import jax.numpy as jnp

from ..physics.model import EntitySlice, RobotModel
from ..utils import math as math_utils
from ..utils.configclass import configclass
from .asset_base import AssetBase, AssetBaseCfg


@configclass
class RigidObjectInitStateCfg:
    pos: tuple = (0.0, 0.0, 0.0)
    rot: tuple = (1.0, 0.0, 0.0, 0.0)
    lin_vel: tuple = (0.0, 0.0, 0.0)
    ang_vel: tuple = (0.0, 0.0, 0.0)


@configclass
class RigidObjectCfg(AssetBaseCfg):
    """Reference ``RigidObjectCfg``: spawn cfg replaced by a model source."""

    model: object = MISSING
    init_state: RigidObjectInitStateCfg = RigidObjectInitStateCfg()


class RigidObjectEntityState(NamedTuple):
    default_root_state: jnp.ndarray  # (E, 13)


class RigidObject(AssetBase):
    """Reference ``RigidObject`` (assets/rigid_object/rigid_object.py) backed
    by a world-state slice."""

    def __init__(self, cfg: RigidObjectCfg, model: RobotModel):
        self.cfg = cfg
        self.model = model
        self.slice: EntitySlice | None = None
        self.world_model: RobotModel | None = None
        self.body_names = list(model.body_names)
        self.num_bodies = model.nbody

    def bind(self, world_model, eslice):
        self.world_model = world_model
        self.slice = eslice

    def find_bodies(self, name_keys, preserve_order: bool = False):
        """Regex body lookup (reference rigid_object.py:find_bodies)."""
        from ..utils import string as string_utils

        return string_utils.resolve_matching_names(
            name_keys, self.body_names, preserve_order
        )

    def init_entity_state(self, num_envs: int, env_origins):
        ist = self.cfg.init_state
        root13 = jnp.concatenate(
            [
                jnp.asarray(ist.pos),
                jnp.asarray(ist.rot),
                jnp.asarray(ist.lin_vel),
                jnp.asarray(ist.ang_vel),
            ]
        )
        root = jnp.tile(root13, (num_envs, 1))
        root = root.at[:, 0:3].add(env_origins)
        return RigidObjectEntityState(default_root_state=root)

    @property
    def root_body_index(self) -> int:
        return self.slice.body_start

    # -- write API (mirrors Articulation) --
    def write_root_pose_to_sim(self, q, pose, env_mask=None):
        s = self.slice
        m = jnp.ones(q.shape[0], dtype=bool) if env_mask is None else env_mask
        qs = s.q_start
        return q.at[:, qs : qs + 7].set(
            jnp.where(m[:, None], pose, q[:, qs : qs + 7])
        )

    def write_root_velocity_to_sim(self, q, qd, vel_w, env_mask=None):
        s = self.slice
        m = jnp.ones(qd.shape[0], dtype=bool) if env_mask is None else env_mask
        # engine free-joint coordinates are world-frame (ang, lin)
        v_new = jnp.concatenate([vel_w[:, 3:6], vel_w[:, 0:3]], axis=-1)
        vs = s.v_start
        return qd.at[:, vs : vs + 6].set(
            jnp.where(m[:, None], v_new, qd[:, vs : vs + 6])
        )

    def data(self, kin, q, qd, qd_prev, est, dt):
        return RigidObjectData(self, kin, q, qd, est)


class RigidObjectData:
    """Reference ``RigidObjectData`` subset."""

    def __init__(self, obj: RigidObject, kin, q, qd, est):
        self._obj = obj
        self._kin = kin
        self._q = q
        self._qd = qd
        self._est = est

    @property
    def root_pos_w(self):
        return self._kin.body_pos_w[:, self._obj.root_body_index]

    @property
    def root_quat_w(self):
        return self._kin.body_quat_w[:, self._obj.root_body_index]

    @property
    def root_lin_vel_w(self):
        vs = self._obj.slice.v_start
        return self._qd[:, vs + 3 : vs + 6]

    @property
    def root_ang_vel_w(self):
        vs = self._obj.slice.v_start
        return self._qd[:, vs : vs + 3]

    @property
    def root_state_w(self):
        return jnp.concatenate(
            [self.root_pos_w, self.root_quat_w, self.root_lin_vel_w, self.root_ang_vel_w],
            axis=-1,
        )

    @property
    def default_root_state(self):
        return self._est.default_root_state

    @property
    def projected_gravity_b(self):
        return math_utils.quat_apply_inverse(
            self.root_quat_w, jnp.array([0.0, 0.0, -1.0])
        )
