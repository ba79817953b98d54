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
    # TPU extension: also intersect the geoms of these scene entities
    # analytically (the reference relies on RTX for dynamic geometry; here
    # sphere/box/capsule primitives are closed-form)
    track_entities: list = []

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
        # static: every pattern ray points straight down AND the sensor only
        # yaws (yaw preserves ray z) -> the heightfield cast can skip the
        # gather-bound oblique march (raycast_height_field assume_vertical)
        self._all_vertical = bool(
            cfg.attach_yaw_only
            and np.all(np.abs(self._ray_dirs[:, 2]) > 0.999)
        )
        self._world_body = self.body_id + self.entity.slice.body_start
        # static geom list for analytic dynamic-geometry intersection
        self._tracked_geoms = []
        for name in cfg.track_entities:
            ent = scene[name]
            s = ent.slice
            wm = ent.world_model
            for g in wm.geoms[s.geom_start : s.geom_start + s.geom_count]:
                self._tracked_geoms.append(
                    (
                        g.gtype,
                        np.asarray(g.size, dtype=np.float32),
                        int(g.body),
                        np.asarray(g.pos, dtype=np.float32),
                        np.asarray(g.quat, dtype=np.float32),
                    )
                )

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
        offsets = (
            scene_state.terrain_offsets
            if getattr(scene_state, "terrain_offsets", None) is not None
            else self._scene.terrain_offsets()
        )
        hits = jax.vmap(
            lambda s, d, off: raycast_height_field(
                s, d, terrain, off, self.cfg.max_distance,
                assume_vertical=self._all_vertical,
            )
        )(starts, dirs, offsets)
        dist = jnp.linalg.norm(hits - pos_w[:, None, :], axis=-1)
        if self._tracked_geoms:
            geoms = self._tracked_geoms
            t_geom = jax.vmap(
                lambda s, d, k: raycast_geoms(
                    s, d, geoms, k, self.cfg.max_distance
                )
            )(starts, dirs, kin)
            closer = t_geom < dist
            dist = jnp.where(closer, t_geom, dist)
            hits = jnp.where(
                closer[..., None], starts + dirs * t_geom[..., None], hits
            )
        return state._replace(
            ray_hits_w=hits, ray_distances=dist, pos_w=pos_w, quat_w=quat_w
        )

    def reset(self, state, env_mask, key=None):
        """Resample per-env xy drift for reset envs (reference
        ray_caster.py:reset samples uniform(drift_range) per reset)."""
        if state is None:
            return state
        lo, hi = self.cfg.drift_range
        if key is None or (lo == 0.0 and hi == 0.0):
            return state
        E = state.drift.shape[0]
        new_drift = jax.random.uniform(
            key, (E, 3), minval=lo, maxval=hi
        )
        mask = (
            jnp.ones(E, dtype=bool) if env_mask is None else env_mask
        )[:, None]
        return state._replace(
            drift=jnp.where(mask, new_drift, state.drift)
        )

    def data_view(self, state):
        return RayCasterData(state, state.pos_w, state.quat_w)


RayCasterCfg.class_type = RayCaster


def raycast_height_field(starts, dirs, terrain, terrain_offset, max_distance,
                         num_steps: int = 48, assume_vertical: bool = False):
    """Cast (N, 3) rays against the terrain height field for one env.

    Vertical rays resolve with a single bilinear lookup; oblique rays
    fixed-step march with one refinement bisection pass. Flat ground (terrain
    None) is the analytic plane z=0.

    ``assume_vertical`` (static): skip the march entirely — the caller has
    proven every ray points straight down (height-scanner grids under
    ``attach_yaw_only``). The march is gather-bound (num_steps bilinear
    fetches per ray) and dominated rough-locomotion stepping ~100x before
    this short-circuit.
    """
    if terrain is None:
        # plane z = 0: t = -z / dz
        dz = dirs[..., 2]
        t = jnp.where(jnp.abs(dz) > 1e-6, -starts[..., 2] / dz, max_distance)
        t = jnp.where((t > 0) & (t <= max_distance), t, max_distance)
        return starts + dirs * t[..., None]

    def height_at(p):
        return terrain.sample(p[..., :2] + terrain_offset[:2]) - terrain_offset[2]

    has_slab = terrain.slab is not None

    def inside_at(p):
        """Solid test: below the base surface OR inside an overhang slab."""
        below = p[..., 2] < height_at(p)
        if not has_slab:
            return below
        z_lo, z_hi = terrain.sample_slab(p[..., :2] + terrain_offset[:2])
        in_slab = (p[..., 2] >= z_lo - terrain_offset[2]) & (
            p[..., 2] <= z_hi - terrain_offset[2]
        )
        return below | in_slab

    vertical = jnp.abs(dirs[..., 2]) > 0.999
    # vertical fast path
    h = height_at(starts)
    t_vert = jnp.clip((starts[..., 2] - h) / jnp.maximum(-dirs[..., 2], 1e-6),
                      0.0, max_distance)
    if has_slab:
        # a downward ray starting above a slab hits its top first
        z_lo, z_hi = terrain.sample_slab(starts[..., :2] + terrain_offset[:2])
        z_hi = z_hi - terrain_offset[2]
        t_slab = (starts[..., 2] - z_hi) / jnp.maximum(-dirs[..., 2], 1e-6)
        slab_hit = (starts[..., 2] > z_hi) & (t_slab > 0) & (
            t_slab <= max_distance
        )
        t_vert = jnp.where(slab_hit, jnp.minimum(t_vert, t_slab), t_vert)
    if assume_vertical:
        return starts + dirs * t_vert[..., None]

    # fixed-step DDA march: find first sample inside solid terrain
    ts = jnp.linspace(0.0, max_distance, num_steps)
    pts = starts[:, None, :] + dirs[:, None, :] * ts[None, :, None]
    below = inside_at(pts)  # (N, S)
    any_hit = jnp.any(below, axis=-1)
    first = jnp.argmax(below, axis=-1)  # first inside-terrain sample
    t_hi = ts[first]
    t_lo = ts[jnp.maximum(first - 1, 0)]
    # bisection refinement (8 rounds)
    def refine(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        p = starts + dirs * mid[..., None]
        below_mid = inside_at(p)
        return jnp.where(below_mid, lo, mid), jnp.where(below_mid, mid, hi)

    t_lo, t_hi = jax.lax.fori_loop(0, 8, refine, (t_lo, t_hi))
    t_march = jnp.where(any_hit, 0.5 * (t_lo + t_hi), max_distance)
    t = jnp.where(vertical, t_vert, t_march)
    return starts + dirs * t[..., None]


# ---------------------------------------------------------------------------
# Analytic ray-primitive intersection (the TPU-native replacement for casting
# against dynamic meshes, which the reference's Warp BVH cannot do either —
# RTX cameras covered dynamic geometry there; sphere/box/capsule suffice for
# our programmatic models).
# ---------------------------------------------------------------------------


def _ray_sphere(o, d, center, radius, max_distance):
    """(N,) first-hit t of rays (o + t d) against one sphere."""
    oc = o - center[None]
    b = jnp.sum(oc * d, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius**2
    disc = b * b - c
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    valid = (disc >= 0.0) & (t > 1e-4)
    return jnp.where(valid, t, max_distance)


def _ray_box(o, d, pos, quat, half, max_distance):
    """Slab test in the box frame."""
    ol = math_utils.quat_apply_inverse(quat[None], o - pos[None])
    dl = math_utils.quat_apply_inverse(quat[None], d)
    inv = 1.0 / jnp.where(jnp.abs(dl) > 1e-9, dl, jnp.sign(dl) * 1e-9 + 1e-12)
    t1 = (-half[None] - ol) * inv
    t2 = (half[None] - ol) * inv
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    valid = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin > 1e-4)
    return jnp.where(valid, tmin, max_distance)


def _ray_capsule(o, d, pos, quat, radius, half_len, max_distance):
    """Ray vs capsule with axis +z in the geom frame: cylinder body + caps."""
    ol = math_utils.quat_apply_inverse(quat[None], o - pos[None])
    dl = math_utils.quat_apply_inverse(quat[None], d)
    # infinite cylinder x^2+y^2=r^2
    a = dl[..., 0] ** 2 + dl[..., 1] ** 2
    b = ol[..., 0] * dl[..., 0] + ol[..., 1] * dl[..., 1]
    c = ol[..., 0] ** 2 + ol[..., 1] ** 2 - radius**2
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_cyl = (-b - sq) / jnp.where(a > 1e-12, a, 1e-12)
    z_hit = ol[..., 2] + t_cyl * dl[..., 2]
    cyl_ok = (disc >= 0) & (t_cyl > 1e-4) & (jnp.abs(z_hit) <= half_len)
    t_cyl = jnp.where(cyl_ok, t_cyl, max_distance)
    # end caps = spheres at +-half_len z
    cap_t = max_distance
    for sz in (-1.0, 1.0):
        cc = jnp.array([0.0, 0.0, sz * half_len])
        oc = ol - cc[None]
        bb = jnp.sum(oc * dl, axis=-1)
        ccv = jnp.sum(oc * oc, axis=-1) - radius**2
        dd = bb * bb - ccv
        tt = -bb - jnp.sqrt(jnp.maximum(dd, 0.0))
        ok = (dd >= 0) & (tt > 1e-4)
        cap_t = jnp.minimum(cap_t, jnp.where(ok, tt, max_distance))
    return jnp.minimum(t_cyl, cap_t)


def raycast_geoms(starts, dirs, geoms, kin, max_distance):
    """Min-hit distance of (N,3) rays against a static list of geoms whose
    bodies move (one env; vmap outside). ``geoms`` is a host-side list of
    (gtype, size, body, pos, quat) tuples; unrolled at trace time like the
    collision pipeline's candidate sets."""
    from ..physics.model import GEOM_BOX, GEOM_CAPSULE, GEOM_CYLINDER, GEOM_SPHERE

    t_best = jnp.full(starts.shape[0], max_distance)
    for gtype, size, body, gpos, gquat in geoms:
        bp = kin.body_pos_w[body]
        bq = kin.body_quat_w[body]
        pos = bp + math_utils.quat_apply(bq, jnp.asarray(gpos))
        quat = math_utils.quat_mul(bq, jnp.asarray(gquat))
        if gtype == GEOM_SPHERE:
            t = _ray_sphere(starts, dirs, pos, float(size[0]), max_distance)
        elif gtype == GEOM_BOX:
            t = _ray_box(
                starts, dirs, pos, quat,
                jnp.asarray(np.asarray(size[:3], dtype=np.float32)),
                max_distance,
            )
        elif gtype in (GEOM_CAPSULE, GEOM_CYLINDER):
            t = _ray_capsule(
                starts, dirs, pos, quat, float(size[0]), float(size[1]),
                max_distance,
            )
        else:
            continue
        t_best = jnp.minimum(t_best, t)
    return t_best
