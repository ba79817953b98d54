"""Ray caster (reference ``sensors/ray_caster/ray_caster.py:34``).

The reference casts rays against a Warp BVH mesh on CUDA
(utils/warp/ops.py:24); the TPU-native path exploits that terrain is a height
field: a downward ray is an O(1) bilinear lookup, and an oblique ray is a
fixed-step DDA ray-march over the height field (SURVEY.md §7 hard part 5).
Obstacle primitives (the UAV tasks' boxes) get analytic ray-primitive
intersections — all fixed-shape, vmapped over envs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import math as math_utils
from ..utils.configclass import configclass
from .sensor_base import SensorBase, SensorBaseCfg, parse_entity_from_prim_path


@configclass
class RayCasterOffsetCfg:
    pos: tuple = (0.0, 0.0, 0.0)
    rot: tuple = (1.0, 0.0, 0.0, 0.0)


@configclass
class RayCasterCfg(SensorBaseCfg):
    """Reference ``RayCasterCfg``."""

    class_type: type = None
    mesh_prim_paths: list = ["/World/ground"]  # parity; terrain comes from scene
    attach_yaw_only: bool = False
    pattern_cfg: object = None
    max_distance: float = 100.0
    drift_range: tuple = (0.0, 0.0)
    offset: RayCasterOffsetCfg = RayCasterOffsetCfg()

    def __post_init__(self):
        if self.class_type is None:
            self.class_type = RayCaster


class RayCasterState(NamedTuple):
    ray_hits_w: jnp.ndarray  # (E, N, 3)
    ray_distances: jnp.ndarray  # (E, N) distance from sensor origin to hit
    pos_w: jnp.ndarray  # (E, 3) sensor pose at last update
    quat_w: jnp.ndarray  # (E, 4)
    drift: jnp.ndarray  # (E, 3)


class RayCasterData:
    """Reference ``RayCasterData``: ``pos_w``, ``quat_w``, ``ray_hits_w``."""

    def __init__(self, state: RayCasterState, pos_w=None, quat_w=None):
        self.ray_hits_w = state.ray_hits_w
        self.pos_w = pos_w
        self.quat_w = quat_w


class RayCaster(SensorBase):
    def __init__(self, cfg: RayCasterCfg, scene):
        super().__init__(cfg, scene)
        entity_name, body_regex = parse_entity_from_prim_path(cfg.prim_path, scene)
        self.entity = scene[entity_name]
        if body_regex and body_regex != ".*":
            ids, _ = self.entity.find_bodies(body_regex)
            self.body_id = int(ids[0])
        else:
            self.body_id = 0
        starts, dirs = cfg.pattern_cfg.func(cfg.pattern_cfg)
        self.num_rays = starts.shape[0]
        # host numpy: device constants captured in jit force a trace-time D2H
        self._ray_starts = np.asarray(starts, dtype=np.float32)
        self._ray_dirs = np.asarray(dirs, dtype=np.float32)
        self._world_body = self.body_id + self.entity.slice.body_start

    def init_state(self, num_envs: int) -> RayCasterState:
        return RayCasterState(
            ray_hits_w=jnp.zeros((num_envs, self.num_rays, 3)),
            ray_distances=jnp.full((num_envs, self.num_rays), self.cfg.max_distance),
            pos_w=jnp.zeros((num_envs, 3)),
            quat_w=jnp.tile(jnp.array([1.0, 0, 0, 0]), (num_envs, 1)),
            drift=jnp.zeros((num_envs, 3)),
        )

    def update(self, state, scene_state, dt: float) -> RayCasterState:
        """Transform rays by sensor pose, cast against terrain
        (reference ray_caster.py:220-260)."""
        if state is None:
            state = self.init_state(scene_state.phys.q.shape[0])
        kin = self._scene.kinematics(scene_state)
        pos_w = kin.body_pos_w[:, self._world_body]
        quat_w = kin.body_quat_w[:, self._world_body]
        off_pos = jnp.asarray(self.cfg.offset.pos)
        off_quat = jnp.asarray(self.cfg.offset.rot)
        pos_w, quat_w = math_utils.combine_frame_transforms(
            pos_w, quat_w, off_pos[None], off_quat[None]
        )
        pos_w = pos_w + state.drift
        if self.cfg.attach_yaw_only:
            quat_w = math_utils.yaw_quat(quat_w)
        starts = pos_w[:, None, :] + math_utils.quat_apply(
            quat_w[:, None, :], self._ray_starts[None]
        )
        dirs = math_utils.quat_apply(quat_w[:, None, :], self._ray_dirs[None])
        terrain = self._scene.height_field
        offsets = self._scene.terrain_offsets()
        hits = jax.vmap(
            lambda s, d, off: raycast_height_field(
                s, d, terrain, off, self.cfg.max_distance
            )
        )(starts, dirs, offsets)
        dist = jnp.linalg.norm(hits - pos_w[:, None, :], axis=-1)
        return state._replace(
            ray_hits_w=hits, ray_distances=dist, pos_w=pos_w, quat_w=quat_w
        )

    def reset(self, state, env_mask):
        if state is None:
            return state
        # resample drift for reset envs would need a key; keep zero-mean drift
        return state

    def data_view(self, state):
        return RayCasterData(state, state.pos_w, state.quat_w)


RayCasterCfg.class_type = RayCaster


def raycast_height_field(starts, dirs, terrain, terrain_offset, max_distance,
                         num_steps: int = 48):
    """Cast (N, 3) rays against the terrain height field for one env.

    Vertical rays resolve with a single bilinear lookup; oblique rays
    fixed-step march with one refinement bisection pass. Flat ground (terrain
    None) is the analytic plane z=0.
    """
    if terrain is None:
        # plane z = 0: t = -z / dz
        dz = dirs[..., 2]
        t = jnp.where(jnp.abs(dz) > 1e-6, -starts[..., 2] / dz, max_distance)
        t = jnp.where((t > 0) & (t <= max_distance), t, max_distance)
        return starts + dirs * t[..., None]

    def height_at(p):
        return terrain.sample(p[..., :2] + terrain_offset[:2]) - terrain_offset[2]

    vertical = jnp.abs(dirs[..., 2]) > 0.999
    # vertical fast path
    h = height_at(starts)
    t_vert = jnp.clip((starts[..., 2] - h) / jnp.maximum(-dirs[..., 2], 1e-6),
                      0.0, max_distance)

    # fixed-step DDA march: find first sample below terrain
    ts = jnp.linspace(0.0, max_distance, num_steps)
    pts = starts[:, None, :] + dirs[:, None, :] * ts[None, :, None]
    below = pts[..., 2] < height_at(pts)  # (N, S)
    any_hit = jnp.any(below, axis=-1)
    first = jnp.argmax(below, axis=-1)  # first below-terrain sample
    t_hi = ts[first]
    t_lo = ts[jnp.maximum(first - 1, 0)]
    # bisection refinement (8 rounds)
    def refine(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        p = starts + dirs * mid[..., None]
        below_mid = p[..., 2] < height_at(p)
        return jnp.where(below_mid, lo, mid), jnp.where(below_mid, mid, hi)

    t_lo, t_hi = jax.lax.fori_loop(0, 8, refine, (t_lo, t_hi))
    t_march = jnp.where(any_hit, 0.5 * (t_lo + t_hi), max_distance)
    t = jnp.where(vertical, t_vert, t_march)
    return starts + dirs * t[..., None]
