"""Rigid-object collection (reference ``assets/rigid_object_collection/``):
N heterogeneous free rigid bodies per env behind one facade with
``(num_envs, num_objects, ...)`` buffers (reference
rigid_object_collection.py)."""

from __future__ import annotations

from dataclasses import MISSING
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..physics.model import EntitySlice, RobotModel, merge_models
from ..utils import math as math_utils
from ..utils.configclass import configclass
from .asset_base import AssetBaseCfg
from .rigid_object import RigidObjectCfg


@configclass
class RigidObjectCollectionCfg(AssetBaseCfg):
    """Reference ``RigidObjectCollectionCfg``: dict of RigidObjectCfg."""

    rigid_objects: dict = MISSING  # name -> RigidObjectCfg


class RigidObjectCollectionEntityState(NamedTuple):
    default_object_state: jnp.ndarray  # (E, N, 13)
    # per-env index of the variant currently "in focus" (instance
    # randomization, reference franka_stack_events.py:randomize_rigid_
    # objects_in_focus keeps this on the env object; here it is state)
    in_focus: jnp.ndarray = None  # (E,) int32


class RigidObjectCollection:
    """(E, N, ...) view over N free bodies merged as one scene entity."""

    def __init__(self, cfg: RigidObjectCollectionCfg, model: RobotModel,
                 object_names=None, sub_cfgs=None):
        self.cfg = cfg
        self.model = model
        self.object_names = object_names or []
        self._sub_cfgs = sub_cfgs or []
        self.num_objects = len(self.object_names)
        self.slice: EntitySlice | None = None
        self.world_model: RobotModel | None = None
        self.body_names = list(model.body_names)
        self.num_bodies = model.nbody

    @classmethod
    def build(cls, cfg: RigidObjectCollectionCfg):
        """Merge the per-object single-body models into one forest."""
        from ..scene.interactive_scene import _resolve_model

        names, models, subs = [], [], []
        for name, ocfg in cfg.rigid_objects.items():
            names.append(name)
            models.append(_resolve_model(ocfg.model))
            subs.append(ocfg)
        merged, _slices = merge_models(models, names)
        return cls(cfg, merged, object_names=names, sub_cfgs=subs)

    def bind(self, world_model, eslice):
        self.world_model = world_model
        self.slice = eslice

    def find_objects(self, name_keys, preserve_order: bool = False):
        from ..utils import string as string_utils

        return string_utils.resolve_matching_names(
            name_keys, self.object_names, preserve_order
        )

    def init_entity_state(self, num_envs: int, env_origins):
        states = []
        for ocfg in self._sub_cfgs:
            ist = ocfg.init_state
            root13 = np.concatenate(
                [
                    np.asarray(ist.pos), np.asarray(ist.rot),
                    np.asarray(ist.lin_vel), np.asarray(ist.ang_vel),
                ]
            )
            states.append(root13)
        default = jnp.tile(
            jnp.asarray(np.stack(states)), (num_envs, 1, 1)
        )  # (E, N, 13)
        default = default.at[:, :, 0:3].add(env_origins[:, None, :])
        return RigidObjectCollectionEntityState(
            default_object_state=default,
            in_focus=jnp.zeros((num_envs,), dtype=jnp.int32),
        )

    # ------------------------------------------------------------------
    def _q_view(self, q):
        s = self.slice
        return q[:, s.q_start : s.q_start + 7 * self.num_objects].reshape(
            q.shape[0], self.num_objects, 7
        )

    def _qd_view(self, qd):
        s = self.slice
        return qd[:, s.v_start : s.v_start + 6 * self.num_objects].reshape(
            qd.shape[0], self.num_objects, 6
        )  # (ang, lin) world

    def write_object_pose_to_sim(self, q, poses, env_mask=None,
                                 object_ids=None):
        """poses: (E, N, 7) [pos, quat wxyz]."""
        s = self.slice
        E = q.shape[0]
        cur = self._q_view(q)
        if object_ids is not None:
            cur = cur.at[:, jnp.asarray(object_ids)].set(poses)
            poses = cur
        m = jnp.ones(E, dtype=bool) if env_mask is None else env_mask
        new = jnp.where(m[:, None, None], poses, cur)
        return q.at[:, s.q_start : s.q_start + 7 * self.num_objects].set(
            new.reshape(E, -1)
        )

    def write_object_velocity_to_sim(self, q, qd, vels, env_mask=None,
                                     object_ids=None):
        """vels: (E, N, 6) [lin, ang] world (reference layout)."""
        s = self.slice
        E = qd.shape[0]
        # engine layout for free joints is (ang, lin)
        vels_al = jnp.concatenate([vels[..., 3:6], vels[..., 0:3]], axis=-1)
        cur = self._qd_view(qd)
        if object_ids is not None:
            cur = cur.at[:, jnp.asarray(object_ids)].set(vels_al)
            vels_al = cur
        m = jnp.ones(E, dtype=bool) if env_mask is None else env_mask
        new = jnp.where(m[:, None, None], vels_al, cur)
        return qd.at[:, s.v_start : s.v_start + 6 * self.num_objects].set(
            new.reshape(E, -1)
        )

    def reset_to_default(self, q, qd, est, env_mask=None):
        drs = est.default_object_state
        q = self.write_object_pose_to_sim(q, drs[..., 0:7], env_mask)
        qd = self.write_object_velocity_to_sim(q, qd, drs[..., 7:13], env_mask)
        return q, qd

    def data(self, kin, q, qd, qd_prev, est, dt):
        return RigidObjectCollectionData(self, kin, q, qd, est)


class RigidObjectCollectionData:
    """Reference ``RigidObjectCollectionData``: (E, N, ...) buffers."""

    def __init__(self, col: RigidObjectCollection, kin, q, qd, est):
        self._col = col
        self._kin = kin
        self._q = q
        self._qd = qd
        self._est = est

    @property
    def object_pos_w(self):
        s = self._col.slice
        return self._kin.body_pos_w[
            :, s.body_start : s.body_start + self._col.num_objects
        ]

    @property
    def object_quat_w(self):
        s = self._col.slice
        return self._kin.body_quat_w[
            :, s.body_start : s.body_start + self._col.num_objects
        ]

    @property
    def object_lin_vel_w(self):
        return self._col._qd_view(self._qd)[..., 3:6]

    @property
    def object_ang_vel_w(self):
        return self._col._qd_view(self._qd)[..., 0:3]

    @property
    def object_state_w(self):
        return jnp.concatenate(
            [
                self.object_pos_w,
                self.object_quat_w,
                self.object_lin_vel_w,
                self.object_ang_vel_w,
            ],
            axis=-1,
        )

    @property
    def default_object_state(self):
        return self._est.default_object_state

    @property
    def in_focus(self):
        return self._est.in_focus

    @property
    def object_lin_vel_b(self):
        return math_utils.quat_rotate_inverse(
            self.object_quat_w, self.object_lin_vel_w
        )
