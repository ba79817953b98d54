"""Batched RGB/depth/normals camera (reference ``sensors/camera/tiled_camera.py``).

The reference tiles every env's camera into ONE RTX render product and
un-tiles it with a CUDA kernel (reference tiled_camera.py:195-212,
utils/warp/kernels.py:78). There is no RTX on TPU: this camera is a batched
analytic ray tracer over the scene's collision primitives — one fused XLA
program producing (E, H, W, C) images directly, no tiling/untiling step at
all. Shading is Lambertian with a single directional light, colors come from
``Geom.rgba`` (palette-by-body fallback), the ground plane gets a checker
pattern so planar motion is visible to vision policies.

Supported data types (reference camera_data.py output keys): ``rgb``,
``depth`` (alias ``distance_to_image_plane``), ``distance_to_camera``,
``normals``, ``semantic_segmentation`` (per-BODY ids: 0 = background,
1 = ground, body_index + 2 otherwise) and
``instance_segmentation_fast`` / ``instance_id_segmentation_fast``
(per-GEOM ids: 0 = background, 1 = ground, geom_index + 2) — the analytic
tracer knows the nearest primitive exactly, so the reference's replicator
annotators reduce to id selection.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import math as math_utils
from ..utils.configclass import configclass
from .sensor_base import SensorBase, SensorBaseCfg, parse_entity_from_prim_path

# Deterministic palette (body-index fallback colors).
_PALETTE = np.array(
    [
        [0.85, 0.30, 0.25],
        [0.25, 0.55, 0.85],
        [0.30, 0.75, 0.35],
        [0.90, 0.75, 0.20],
        [0.65, 0.35, 0.80],
        [0.25, 0.75, 0.75],
        [0.90, 0.50, 0.20],
        [0.55, 0.55, 0.55],
    ],
    dtype=np.float32,
)


@configclass
class TiledCameraOffsetCfg:
    """Reference ``CameraCfg.OffsetCfg``."""

    pos: tuple = (0.0, 0.0, 0.0)
    rot: tuple = (1.0, 0.0, 0.0, 0.0)
    convention: str = "world"  # world | ros | opengl


@configclass
class TiledCameraCfg(SensorBaseCfg):
    """Reference ``TiledCameraCfg`` (+ spawn.PinholeCameraCfg fields inline)."""

    class_type: type = None
    # "" or "/World/..." -> world-fixed camera at offset.pos; "entity/body"
    # -> attached to that body (wrist cams)
    prim_path: str = ""
    offset: TiledCameraOffsetCfg = TiledCameraOffsetCfg()
    data_types: list = ["rgb"]
    width: int = 100
    height: int = 100
    # pinhole intrinsics (reference sim_utils.PinholeCameraCfg)
    focal_length: float = 24.0
    horizontal_aperture: float = 20.955
    clipping_range: tuple = (0.1, 20.0)
    # shading
    light_dir: tuple = (-0.35, 0.25, -1.0)  # world-frame directional light
    ambient: float = 0.35
    background_rgb: tuple = (0.16, 0.22, 0.32)
    ground_albedo: tuple = (0.55, 0.55, 0.55)
    checker_period: float = 0.5  # m, ground checker tile size

    def __post_init__(self):
        if self.class_type is None:
            self.class_type = TiledCamera


class TiledCameraState(NamedTuple):
    output: dict  # data_type -> (E, H, W, C)
    pos_w: jnp.ndarray  # (E, 3)
    quat_w: jnp.ndarray  # (E, 4)


class TiledCameraData:
    """Reference ``CameraData``: ``output`` dict + pose + intrinsics."""

    def __init__(self, output, pos_w, quat_w, intrinsic_matrices, image_shape):
        self.output = output
        self.pos_w = pos_w
        self.quat_w = quat_w
        self.intrinsic_matrices = intrinsic_matrices
        self.image_shape = image_shape


# Camera-frame convention: rays generated with +x forward / +y left / +z up
# ("world" convention, matching the reference cartpole camera cfgs). ros and
# opengl conventions are post-rotations of the offset quaternion.
_CONVENTION_QUATS = {
    "world": np.array([1.0, 0.0, 0.0, 0.0]),
    # ros: +z forward, +x right, +y down. Q maps a ray expressed in our
    # render frame (+x fwd, +y left, +z up) to its ros-frame coordinates:
    # columns of M are [0,0,1], [-1,0,0], [0,-1,0]
    "ros": np.array([0.5, 0.5, -0.5, 0.5]),
    # opengl: -z forward, +x right, +y up
    "opengl": np.array([0.5, -0.5, 0.5, 0.5]),
}


class TiledCamera(SensorBase):
    def __init__(self, cfg: TiledCameraCfg, scene):
        super().__init__(cfg, scene)
        self._scene = scene
        # attachment
        self._body = None
        path = cfg.prim_path or ""
        if path and not path.startswith("/"):
            entity_name, body_regex = parse_entity_from_prim_path(path, scene)
            if entity_name in getattr(scene, "articulations", {}) or \
               entity_name in getattr(scene, "rigid_objects", {}):
                entity = scene[entity_name]
                ids, _ = entity.find_bodies(body_regex)
                self._body = int(ids[0]) + entity.slice.body_start
        # static ray fan in the camera frame (+x forward), pixel-major (v, u)
        W, H = cfg.width, cfg.height
        f = cfg.focal_length
        ap_h = cfg.horizontal_aperture
        ap_v = ap_h * H / W
        u = (np.arange(W) + 0.5) / W - 0.5  # left->right
        v = (np.arange(H) + 0.5) / H - 0.5  # top->bottom
        vv, uu = np.meshgrid(v, u, indexing="ij")
        dirs = np.stack(
            [np.ones_like(uu) * f, -uu * ap_h, -vv * ap_v], axis=-1
        ).reshape(-1, 3)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        self._dirs_cam = jnp.asarray(dirs, dtype=jnp.float32)  # (H*W, 3)
        conv = _CONVENTION_QUATS[cfg.offset.convention]
        self._offset_quat = math_utils.quat_mul(
            jnp.asarray(cfg.offset.rot, dtype=jnp.float32),
            jnp.asarray(conv, dtype=jnp.float32),
        )
        self._offset_pos = jnp.asarray(cfg.offset.pos, dtype=jnp.float32)
        # geom list: every scene geom (static, unrolled at trace time)
        wm = scene.world_model
        self._geoms = []
        for g in wm.geoms:
            rgba = g.rgba if g.rgba is not None else tuple(
                _PALETTE[g.body % len(_PALETTE)]
            ) + (1.0,)
            self._geoms.append(
                (g.gtype, g.size, g.body, np.asarray(g.pos, np.float32),
                 np.asarray(g.quat, np.float32), np.asarray(rgba[:3], np.float32))
            )
        # intrinsics (reference CameraData.intrinsic_matrices)
        fx = f * W / ap_h
        fy = f * H / ap_v
        self._K = np.array(
            [[fx, 0, W / 2.0], [0, fy, H / 2.0], [0, 0, 1.0]], dtype=np.float32
        )

    # ------------------------------------------------------------------
    @property
    def image_shape(self):
        return (self.cfg.height, self.cfg.width)

    def init_state(self, num_envs: int) -> TiledCameraState:
        H, W = self.image_shape
        out = {}
        seg_types = ("semantic_segmentation", "instance_segmentation_fast",
                     "instance_id_segmentation_fast")
        for dt in self.cfg.data_types:
            C = 3 if dt in ("rgb", "normals") else 1  # seg types are 1-ch ids
            # segmentation ids are int32 in update(); allocating float32 here
            # would flip the state pytree dtype after the first step and break
            # lax.scan-carried rollouts (ADVICE r3)
            dtype = jnp.int32 if dt in seg_types else jnp.float32
            out[dt] = jnp.zeros((num_envs, H, W, C), dtype=dtype)
        return TiledCameraState(
            output=out,
            pos_w=jnp.zeros((num_envs, 3)),
            quat_w=jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 0.0]), (num_envs, 1)),
        )

    # ------------------------------------------------------------------
    def _camera_pose(self, scene_state):
        E = scene_state.phys.q.shape[0]
        if self._body is not None:
            kin = self._scene.kinematics(scene_state)
            bp = kin.body_pos_w[:, self._body]
            bq = kin.body_quat_w[:, self._body]
            pos, quat = math_utils.combine_frame_transforms(
                bp, bq, self._offset_pos[None], self._offset_quat[None]
            )
            return pos, quat
        pos = jnp.tile(self._offset_pos[None], (E, 1))
        quat = jnp.tile(self._offset_quat[None], (E, 1))
        return pos, quat

    def update(self, state, scene_state, dt: float) -> TiledCameraState:
        kin = self._scene.kinematics(scene_state)
        pos, quat = self._camera_pose(scene_state)
        far = float(self.cfg.clipping_range[1])

        def render_one(cam_pos, cam_quat, kin_e):
            dirs = math_utils.quat_apply(
                jnp.broadcast_to(cam_quat, (self._dirs_cam.shape[0], 4)),
                self._dirs_cam,
            )
            starts = jnp.broadcast_to(cam_pos, dirs.shape)
            return _trace(starts, dirs, self._geoms, kin_e, far, self.cfg)

        t, normal, albedo, sem_id, inst_id = jax.vmap(
            render_one, in_axes=(0, 0, 0)
        )(pos, quat, kin)

        H, W = self.image_shape
        E = pos.shape[0]
        out = {}
        hit = t < far
        if "rgb" in self.cfg.data_types:
            l = jnp.asarray(self.cfg.light_dir)
            l = l / jnp.linalg.norm(l)
            lambert = jnp.maximum(0.0, -jnp.einsum("enk,k->en", normal, l))
            shade = self.cfg.ambient + (1.0 - self.cfg.ambient) * lambert
            rgb = albedo * shade[..., None]
            rgb = jnp.where(
                hit[..., None], rgb, jnp.asarray(self.cfg.background_rgb)
            )
            out["rgb"] = (rgb * 255.0).reshape(E, H, W, 3)
        if "normals" in self.cfg.data_types:
            out["normals"] = jnp.where(
                hit[..., None], normal, 0.0
            ).reshape(E, H, W, 3)
        if "depth" in self.cfg.data_types or (
            "distance_to_image_plane" in self.cfg.data_types
        ):
            fwd = math_utils.quat_apply(quat, jnp.array([1.0, 0.0, 0.0]))
            along = jnp.einsum(
                "enk,ek->en",
                math_utils.quat_apply(
                    jnp.broadcast_to(quat[:, None], (E, t.shape[1], 4)),
                    jnp.broadcast_to(self._dirs_cam[None], (E, t.shape[1], 3)),
                ),
                fwd,
            )
            depth = (t * along).reshape(E, H, W, 1)
            depth = jnp.where(t.reshape(E, H, W, 1) < far, depth, far)
            if "depth" in self.cfg.data_types:
                out["depth"] = depth
            if "distance_to_image_plane" in self.cfg.data_types:
                out["distance_to_image_plane"] = depth
        if "distance_to_camera" in self.cfg.data_types:
            out["distance_to_camera"] = jnp.where(t < far, t, far).reshape(
                E, H, W, 1
            )
        if "semantic_segmentation" in self.cfg.data_types:
            out["semantic_segmentation"] = jnp.where(hit, sem_id, 0).reshape(
                E, H, W, 1
            )
        for key in ("instance_segmentation_fast",
                    "instance_id_segmentation_fast"):
            if key in self.cfg.data_types:
                out[key] = jnp.where(hit, inst_id, 0).reshape(E, H, W, 1)
        return TiledCameraState(output=out, pos_w=pos, quat_w=quat)

    def reset(self, state, env_mask, key=None):
        return state

    def data_view(self, state: TiledCameraState) -> TiledCameraData:
        return TiledCameraData(
            output=state.output,
            pos_w=state.pos_w,
            quat_w=state.quat_w,
            intrinsic_matrices=jnp.tile(
                jnp.asarray(self._K)[None], (state.pos_w.shape[0], 1, 1)
            ),
            image_shape=self.image_shape,
        )


TiledCameraCfg.class_type = TiledCamera

# The reference's non-tiled ``Camera`` shares the same data contract; on TPU
# both are the same batched tracer (reference camera.py:39 vs
# tiled_camera.py:31 differ only in render-product plumbing).
CameraCfg = TiledCameraCfg
Camera = TiledCamera


# ---------------------------------------------------------------------------
# Core tracer (one env; vmapped by the sensor)
# ---------------------------------------------------------------------------


def _trace(starts, dirs, geoms, kin, far, cfg):
    """Nearest-hit trace returning (t, normal, albedo, semantic_id,
    instance_id), each (N, ...). Ids: 1 = ground, body_index + 2 /
    geom_index + 2 for hits (0 = miss, applied by the caller)."""
    from ..physics.model import GEOM_BOX, GEOM_CAPSULE, GEOM_CYLINDER, GEOM_SPHERE
    from .ray_caster import _ray_box, _ray_capsule, _ray_sphere

    N = starts.shape[0]
    t_best = jnp.full((N,), far)
    n_best = jnp.zeros((N, 3))
    a_best = jnp.zeros((N, 3))
    sem_best = jnp.zeros((N,), jnp.int32)
    inst_best = jnp.zeros((N,), jnp.int32)

    # ground plane z=0 (camera tasks are flat-ground; height-field depth
    # sensing is served by RayCasterCamera)
    dz = dirs[:, 2]
    safe_dz = jnp.where(jnp.abs(dz) > 1e-9, dz, 1.0)
    t_g = jnp.where(jnp.abs(dz) > 1e-9, -starts[:, 2] / safe_dz, far)
    t_g = jnp.where(t_g > 1e-4, t_g, far)
    n_g = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (N, 3))
    p_g = starts + dirs * t_g[:, None]
    checker = (
        jnp.floor(p_g[:, 0] / cfg.checker_period)
        + jnp.floor(p_g[:, 1] / cfg.checker_period)
    ) % 2.0
    ground_alb = jnp.asarray(cfg.ground_albedo) * (0.75 + 0.25 * checker[:, None])
    m = t_g < t_best
    t_best = jnp.where(m, t_g, t_best)
    n_best = jnp.where(m[:, None], n_g, n_best)
    a_best = jnp.where(m[:, None], ground_alb, a_best)
    sem_best = jnp.where(m, 1, sem_best)
    inst_best = jnp.where(m, 1, inst_best)

    for gi, (gtype, size, body, gpos, gquat, color) in enumerate(geoms):
        bp = kin.body_pos_w[body]
        bq = kin.body_quat_w[body]
        pos = bp + math_utils.quat_apply(bq, jnp.asarray(gpos))
        quat = math_utils.quat_mul(bq, jnp.asarray(gquat))
        if gtype == GEOM_SPHERE:
            t = _ray_sphere(starts, dirs, pos, float(size[0]), far)
            p = starts + dirs * t[:, None]
            n = (p - pos[None]) / float(size[0])
        elif gtype == GEOM_BOX:
            half = jnp.asarray(np.asarray(size[:3], dtype=np.float32))
            t = _ray_box(starts, dirs, pos, quat, half, far)
            p = starts + dirs * t[:, None]
            lp = math_utils.quat_apply_inverse(
                jnp.broadcast_to(quat, (N, 4)), p - pos[None]
            )
            rel = jnp.abs(lp) / half[None]
            ax = jnp.argmax(rel, axis=-1)
            n_local = jax.nn.one_hot(ax, 3) * jnp.sign(
                jnp.take_along_axis(lp, ax[:, None], axis=-1)
            )
            n = math_utils.quat_apply(jnp.broadcast_to(quat, (N, 4)), n_local)
        elif gtype in (GEOM_CAPSULE, GEOM_CYLINDER):
            r, hl = float(size[0]), float(size[1])
            t = _ray_capsule(starts, dirs, pos, quat, r, hl, far)
            p = starts + dirs * t[:, None]
            lp = math_utils.quat_apply_inverse(
                jnp.broadcast_to(quat, (N, 4)), p - pos[None]
            )
            zc = jnp.clip(lp[:, 2:3], -hl, hl)
            n_local = lp - jnp.concatenate(
                [jnp.zeros((N, 2)), zc], axis=-1
            )
            n_local = n_local / jnp.maximum(
                jnp.linalg.norm(n_local, axis=-1, keepdims=True), 1e-9
            )
            n = math_utils.quat_apply(jnp.broadcast_to(quat, (N, 4)), n_local)
        else:
            continue
        m = t < t_best
        t_best = jnp.where(m, t, t_best)
        n_best = jnp.where(m[:, None], n, n_best)
        a_best = jnp.where(m[:, None], jnp.asarray(color)[None], a_best)
        sem_best = jnp.where(m, body + 2, sem_best)
        inst_best = jnp.where(m, gi + 2, inst_best)

    # normals face the ray origin
    flip = jnp.sum(n_best * dirs, axis=-1) > 0.0
    n_best = jnp.where(flip[:, None], -n_best, n_best)
    return t_best, n_best, a_best, sem_best, inst_best
