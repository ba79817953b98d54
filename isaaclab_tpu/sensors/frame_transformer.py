"""Frame transformer (reference ``sensors/frame_transformer/``).

Relative poses of regex-matched target frames w.r.t. a source frame — pure FK
math, stateless.
"""

from __future__ import annotations

from dataclasses import MISSING
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..utils import math as math_utils
from ..utils.configclass import configclass
from .sensor_base import SensorBase, SensorBaseCfg, parse_entity_from_prim_path


@configclass
class OffsetCfg:
    pos: tuple = (0.0, 0.0, 0.0)
    rot: tuple = (1.0, 0.0, 0.0, 0.0)


@configclass
class FrameTransformerFrameCfg:
    """One target frame: prim path regex + optional offset."""

    prim_path: str = MISSING
    name: str = None
    offset: OffsetCfg = OffsetCfg()


@configclass
class FrameTransformerCfg(SensorBaseCfg):
    class_type: type = None
    source_frame_offset: OffsetCfg = OffsetCfg()
    target_frames: list = MISSING

    def __post_init__(self):
        if self.class_type is None:
            self.class_type = FrameTransformer


class FrameTransformerState(NamedTuple):
    """Computed target poses (refreshed every ``scene.update``; FK is already
    cached scene-wide so this is pure reuse, not extra work)."""

    target_pos_w: jnp.ndarray  # (E, T, 3)
    target_quat_w: jnp.ndarray  # (E, T, 4)
    target_pos_source: jnp.ndarray  # (E, T, 3)
    target_quat_source: jnp.ndarray  # (E, T, 4)
    source_pos_w: jnp.ndarray  # (E, 3)
    source_quat_w: jnp.ndarray  # (E, 4)


class FrameTransformerData:
    """Reference ``FrameTransformerData``: target poses in source frame + world."""

    def __init__(self, target_pos_w, target_quat_w, target_pos_source,
                 target_quat_source, source_pos_w, source_quat_w, names):
        self.target_pos_w = target_pos_w
        self.target_quat_w = target_quat_w
        self.target_pos_source = target_pos_source
        self.target_quat_source = target_quat_source
        self.source_pos_w = source_pos_w
        self.source_quat_w = source_quat_w
        self.target_frame_names = names


class FrameTransformer(SensorBase):
    def __init__(self, cfg: FrameTransformerCfg, scene):
        super().__init__(cfg, scene)
        entity_name, body_regex = parse_entity_from_prim_path(cfg.prim_path, scene)
        self.entity = scene[entity_name]
        ids, _ = self.entity.find_bodies(body_regex)
        self._source_body = int(ids[0]) + self.entity.slice.body_start
        self._targets = []
        self.target_frame_names = []
        for tf in cfg.target_frames:
            e_name, b_regex = parse_entity_from_prim_path(tf.prim_path, scene)
            entity = scene[e_name]
            t_ids, t_names = entity.find_bodies(b_regex)
            for tid, tname in zip(t_ids, t_names):
                self._targets.append(
                    (int(tid) + entity.slice.body_start, tf.offset)
                )
                self.target_frame_names.append(tf.name or tname)

    def init_state(self, num_envs: int) -> FrameTransformerState:
        T = len(self._targets)
        E = num_envs
        ident = jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 0.0]), (E, 1))
        return FrameTransformerState(
            target_pos_w=jnp.zeros((E, T, 3)),
            target_quat_w=jnp.tile(ident[:, None], (1, T, 1)),
            target_pos_source=jnp.zeros((E, T, 3)),
            target_quat_source=jnp.tile(ident[:, None], (1, T, 1)),
            source_pos_w=jnp.zeros((E, 3)),
            source_quat_w=ident,
        )

    def update(self, state, scene_state, dt: float):
        d = self.compute(scene_state)
        return FrameTransformerState(
            target_pos_w=d.target_pos_w,
            target_quat_w=d.target_quat_w,
            target_pos_source=d.target_pos_source,
            target_quat_source=d.target_quat_source,
            source_pos_w=d.source_pos_w,
            source_quat_w=d.source_quat_w,
        )

    def data_view(self, state: FrameTransformerState) -> FrameTransformerData:
        return FrameTransformerData(
            target_pos_w=state.target_pos_w,
            target_quat_w=state.target_quat_w,
            target_pos_source=state.target_pos_source,
            target_quat_source=state.target_quat_source,
            source_pos_w=state.source_pos_w,
            source_quat_w=state.source_quat_w,
            names=self.target_frame_names,
        )

    def compute(self, scene_state) -> FrameTransformerData:
        kin = self._scene.kinematics(scene_state)
        src_off = self.cfg.source_frame_offset
        src_pos, src_quat = math_utils.combine_frame_transforms(
            kin.body_pos_w[:, self._source_body],
            kin.body_quat_w[:, self._source_body],
            jnp.asarray(src_off.pos)[None],
            jnp.asarray(src_off.rot)[None],
        )
        pos_w, quat_w, pos_s, quat_s = [], [], [], []
        for body, off in self._targets:
            p, qt = math_utils.combine_frame_transforms(
                kin.body_pos_w[:, body],
                kin.body_quat_w[:, body],
                jnp.asarray(off.pos)[None],
                jnp.asarray(off.rot)[None],
            )
            rp, rq = math_utils.subtract_frame_transforms(src_pos, src_quat, p, qt)
            pos_w.append(p)
            quat_w.append(qt)
            pos_s.append(rp)
            quat_s.append(rq)
        return FrameTransformerData(
            target_pos_w=jnp.stack(pos_w, axis=1),
            target_quat_w=jnp.stack(quat_w, axis=1),
            target_pos_source=jnp.stack(pos_s, axis=1),
            target_quat_source=jnp.stack(quat_s, axis=1),
            source_pos_w=src_pos,
            source_quat_w=src_quat,
            names=self.target_frame_names,
        )


FrameTransformerCfg.class_type = FrameTransformer
