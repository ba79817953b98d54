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
    # previous-frame scene poses for the motion_vectors annotator (None when
    # not requested): (E, nbody, 3) / (E, nbody, 4) and an (E,) validity flag
    # cleared on env reset (first frame after a teleport has no motion)
    prev_body_pos: jnp.ndarray = None
    prev_body_quat: jnp.ndarray = None
    prev_valid: jnp.ndarray = None


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
            if dt in ("rgb", "normals"):
                C = 3
            elif dt == "rgba":
                C = 4
            elif dt == "motion_vectors":
                C = 2  # image-space (x, y), reference tiled_camera.py:367
            else:
                C = 1  # seg types are 1-ch ids
            # segmentation ids are int32 in update(); allocating float32 here
            # would flip the state pytree dtype after the first step and break
            # lax.scan-carried rollouts (ADVICE r3)
            dtype = jnp.int32 if dt in seg_types else jnp.float32
            out[dt] = jnp.zeros((num_envs, H, W, C), dtype=dtype)
        kwargs = {}
        if "motion_vectors" in self.cfg.data_types:
            B = self._scene.world_model.nbody
            kwargs = dict(
                prev_body_pos=jnp.zeros((num_envs, B, 3)),
                prev_body_quat=jnp.tile(
                    jnp.asarray([1.0, 0.0, 0.0, 0.0]), (num_envs, B, 1)
                ),
                prev_valid=jnp.zeros((num_envs,), dtype=bool),
            )
        return TiledCameraState(
            output=out,
            pos_w=jnp.zeros((num_envs, 3)),
            quat_w=jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 0.0]), (num_envs, 1)),
            **kwargs,
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
        """Batch-level component-wise render (no vmap): every intermediate
        is an (E, N) array with the ray dimension on vector lanes. The
        previous vmapped (E, N, 3) formulation put a 3-wide minor dimension
        on lanes, which tile-pads 3 -> 128 (~42x) on EVERY intermediate —
        the Cartpole-RGB workload measured 285 ms/frame almost entirely in
        those padded passes; component lists make each pass a full-tile VPU
        kernel."""
        kin = self._scene.kinematics(scene_state)
        pos, quat = self._camera_pose(scene_state)
        far = float(self.cfg.clipping_range[1])
        E = pos.shape[0]
        N = self._dirs_cam.shape[0]

        q = [quat[:, k : k + 1] for k in range(4)]  # (E, 1) comps
        o = [pos[:, k : k + 1] for k in range(3)]
        dc = [jnp.asarray(self._dirs_cam[:, k])[None, :] for k in range(3)]
        d = _qrot_c(q, dc)  # world ray dirs, 3 x (E, N)

        t, n, alb, sem_id, inst_id = _trace_c(
            o, d, self._geoms, kin, far, self.cfg, E, N
        )

        H, W = self.image_shape
        out = {}
        hit = t < far
        if "rgb" in self.cfg.data_types or "rgba" in self.cfg.data_types:
            l = np.asarray(self.cfg.light_dir, dtype=np.float32)
            l = l / np.linalg.norm(l)
            lambert = jnp.maximum(
                0.0, -(n[0] * l[0] + n[1] * l[1] + n[2] * l[2])
            )
            shade = self.cfg.ambient + (1.0 - self.cfg.ambient) * lambert
            bg = self.cfg.background_rgb
            rgb_c = [
                jnp.where(hit, alb[k] * shade, bg[k]) * 255.0
                for k in range(3)
            ]
            if "rgb" in self.cfg.data_types:
                out["rgb"] = jnp.stack(rgb_c, axis=-1).reshape(E, H, W, 3)
            if "rgba" in self.cfg.data_types:
                # opaque render: alpha saturates (reference RTX rgba)
                out["rgba"] = jnp.stack(
                    rgb_c + [jnp.full_like(rgb_c[0], 255.0)], axis=-1
                ).reshape(E, H, W, 4)
        if "normals" in self.cfg.data_types:
            out["normals"] = jnp.stack(
                [jnp.where(hit, n[k], 0.0) for k in range(3)], axis=-1
            ).reshape(E, H, W, 3)
        if "depth" in self.cfg.data_types or (
            "distance_to_image_plane" in self.cfg.data_types
        ):
            fwd = _qrot_c(q, [jnp.ones((1, 1)), jnp.zeros((1, 1)),
                              jnp.zeros((1, 1))])  # camera +x, 3 x (E, 1)
            along = d[0] * fwd[0] + d[1] * fwd[1] + d[2] * fwd[2]
            depth = jnp.where(hit, t * along, far).reshape(E, H, W, 1)
            if "depth" in self.cfg.data_types:
                out["depth"] = depth
            if "distance_to_image_plane" in self.cfg.data_types:
                out["distance_to_image_plane"] = depth
        if "distance_to_camera" in self.cfg.data_types:
            out["distance_to_camera"] = jnp.where(hit, t, far).reshape(
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

        kwargs = {}
        if "motion_vectors" in self.cfg.data_types:
            # Frame-to-frame reprojection (the RTX motion-vector annotator,
            # reference camera.py:53 / tiled_camera.py:272): for each hit,
            # transform the hit point into its body's frame, re-pose it with
            # the PREVIOUS body pose, project into the PREVIOUS camera, and
            # take the image-space displacement in pixels (x right, y down).
            p = [o[k] + d[k] * t for k in range(3)]  # (E, N) hit points
            bid = jnp.clip(sem_id - 2, 0, kin.body_pos_w.shape[1] - 1)
            moving = sem_id >= 2  # ground/background pixels only see cam motion
            bq_c = [jnp.take_along_axis(kin.body_quat_w[:, :, k], bid, axis=1)
                    for k in range(4)]
            bp_c = [jnp.take_along_axis(kin.body_pos_w[:, :, k], bid, axis=1)
                    for k in range(3)]
            pq_c = [jnp.take_along_axis(state.prev_body_quat[:, :, k], bid,
                                        axis=1) for k in range(4)]
            pp_c = [jnp.take_along_axis(state.prev_body_pos[:, :, k], bid,
                                        axis=1) for k in range(3)]
            local = _qrot_inv_c(bq_c, [p[k] - bp_c[k] for k in range(3)])
            prev_w_body = _qrot_c(pq_c, local)
            prev_p = [
                jnp.where(moving, pp_c[k] + prev_w_body[k], p[k])
                for k in range(3)
            ]
            # current pixel grid (static) and previous-frame projection
            W_, H_ = self.cfg.width, self.cfg.height
            col_cur = jnp.tile(
                (jnp.arange(W_, dtype=jnp.float32))[None, :], (H_, 1)
            ).reshape(1, N)
            row_cur = jnp.tile(
                (jnp.arange(H_, dtype=jnp.float32))[:, None], (1, W_)
            ).reshape(1, N)
            pq = [state.quat_w[:, k : k + 1] for k in range(4)]
            po = [state.pos_w[:, k : k + 1] for k in range(3)]
            col_prev, row_prev, in_front = self._project_c(pq, po, prev_p)
            valid = hit & in_front & state.prev_valid[:, None]
            mx = jnp.where(valid, col_cur - col_prev, 0.0)
            my = jnp.where(valid, row_cur - row_prev, 0.0)
            out["motion_vectors"] = jnp.stack([mx, my], axis=-1).reshape(
                E, H, W, 2
            )
            kwargs = dict(
                prev_body_pos=kin.body_pos_w,
                prev_body_quat=kin.body_quat_w,
                prev_valid=jnp.ones((E,), dtype=bool),
            )
        return TiledCameraState(output=out, pos_w=pos, quat_w=quat, **kwargs)

    def _project_c(self, q, o, p):
        """Project world points ``p`` (3 x (E, N) comps) into the camera at
        pose (q, o): returns (col, row, in_front) pixel coords in the same
        (+x forward / +y left / +z up) render frame the ray fan uses."""
        cam = _qrot_inv_c(q, [p[k] - o[k] for k in range(3)])
        x = jnp.where(cam[0] > 1e-6, cam[0], 1e-6)
        W, H = self.cfg.width, self.cfg.height
        ap_h = self.cfg.horizontal_aperture
        ap_v = ap_h * H / W
        f = self.cfg.focal_length
        u = -(cam[1] / x) * (f / ap_h)  # [-0.5, 0.5] left->right
        v = -(cam[2] / x) * (f / ap_v)
        col = (u + 0.5) * W - 0.5
        row = (v + 0.5) * H - 0.5
        return col, row, cam[0] > 1e-6

    def reset(self, state, env_mask, key=None):
        if state.prev_valid is not None:
            return state._replace(
                prev_valid=jnp.where(env_mask, False, state.prev_valid)
            )
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


def _qrot_c(q, v):
    """Rotate 3-component list ``v`` by quaternion component list ``q``
    (wxyz); all components broadcastable arrays."""
    w, x, y, z = q
    vx, vy, vz = v
    tx = 2.0 * (y * vz - z * vy)
    ty = 2.0 * (z * vx - x * vz)
    tz = 2.0 * (x * vy - y * vx)
    return [
        vx + w * tx + (y * tz - z * ty),
        vy + w * ty + (z * tx - x * tz),
        vz + w * tz + (x * ty - y * tx),
    ]


def _qrot_inv_c(q, v):
    w, x, y, z = q
    return _qrot_c([w, -x, -y, -z], v)


def _qmul_c(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return [
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ]


def _trace_c(o, d, geoms, kin, far, cfg, E, N):
    """Nearest-hit trace, batch-level and component-wise: ``o`` 3 x (E, 1)
    camera origins, ``d`` 3 x (E, N) world ray dirs; every intermediate is
    (E, N) (rays on lanes — no 3-wide minor dims anywhere). Returns
    (t, n 3-list, albedo 3-list, semantic_id, instance_id), ids as in the
    vmapped tracer this replaces (1 = ground, body+2 / geom+2)."""
    from ..physics.model import GEOM_BOX, GEOM_CAPSULE, GEOM_CYLINDER, GEOM_SPHERE

    t_best = jnp.full((E, N), far)
    n_best = [jnp.zeros((E, N)) for _ in range(3)]
    a_best = [jnp.zeros((E, N)) for _ in range(3)]
    sem_best = jnp.zeros((E, N), jnp.int32)
    inst_best = jnp.zeros((E, N), jnp.int32)

    def take(m, t, n, a, sem, inst):
        nonlocal t_best, n_best, a_best, sem_best, inst_best
        t_best = jnp.where(m, t, t_best)
        n_best = [jnp.where(m, n[k], n_best[k]) for k in range(3)]
        a_best = [jnp.where(m, a[k], a_best[k]) for k in range(3)]
        sem_best = jnp.where(m, sem, sem_best)
        inst_best = jnp.where(m, inst, inst_best)

    # ground plane z=0 with checker albedo
    safe_dz = jnp.where(jnp.abs(d[2]) > 1e-9, d[2], 1.0)
    t_g = jnp.where(jnp.abs(d[2]) > 1e-9, -o[2] / safe_dz, far)
    t_g = jnp.where(t_g > 1e-4, t_g, far)
    px = o[0] + d[0] * t_g
    py = o[1] + d[1] * t_g
    checker = 0.75 + 0.25 * (
        (jnp.floor(px / cfg.checker_period)
         + jnp.floor(py / cfg.checker_period)) % 2.0
    )
    g_alb = [cfg.ground_albedo[k] * checker for k in range(3)]
    take(t_g < t_best, t_g, [jnp.zeros((E, N)), jnp.zeros((E, N)),
                             jnp.ones((E, N))], g_alb, 1, 1)

    for gi, (gtype, size, body, gpos, gquat, color) in enumerate(geoms):
        bq = [kin.body_quat_w[:, body, k : k + 1] for k in range(4)]
        bp = [kin.body_pos_w[:, body, k : k + 1] for k in range(3)]
        gp = _qrot_c(bq, [float(gpos[0]), float(gpos[1]), float(gpos[2])])
        pos = [bp[k] + gp[k] for k in range(3)]  # (E, 1)
        quat = _qmul_c(bq, [float(gquat[0]), float(gquat[1]),
                            float(gquat[2]), float(gquat[3])])
        oc = [o[k] - pos[k] for k in range(3)]  # (E, 1)
        if gtype == GEOM_SPHERE:
            r = float(size[0])
            b = oc[0] * d[0] + oc[1] * d[1] + oc[2] * d[2]
            c2 = oc[0] ** 2 + oc[1] ** 2 + oc[2] ** 2 - r * r
            disc = b * b - c2
            t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
            t = jnp.where((disc >= 0.0) & (t > 1e-4), t, far)
            n = [(oc[k] + d[k] * t) / r for k in range(3)]
        elif gtype == GEOM_BOX:
            half = [float(v) for v in size[:3]]
            ol = _qrot_inv_c(quat, oc)  # (E, 1)
            dl = _qrot_inv_c(quat, d)  # (E, N)
            tmin = jnp.full((E, N), -jnp.inf)
            tmax = jnp.full((E, N), jnp.inf)
            t1s, t2s = [], []
            for k in range(3):
                inv = 1.0 / jnp.where(
                    jnp.abs(dl[k]) > 1e-9, dl[k],
                    jnp.sign(dl[k]) * 1e-9 + 1e-12,
                )
                t1 = (-half[k] - ol[k]) * inv
                t2 = (half[k] - ol[k]) * inv
                t1s.append(jnp.minimum(t1, t2))
                t2s.append(jnp.maximum(t1, t2))
                tmin = jnp.maximum(tmin, t1s[-1])
                tmax = jnp.minimum(tmax, t2s[-1])
            valid = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin > 1e-4)
            t = jnp.where(valid, tmin, far)
            # face normal: the axis whose near-slab produced tmin
            n_local = []
            for k in range(3):
                hitk = t1s[k] >= tmin  # tmin == max of mins
                n_local.append(
                    jnp.where(hitk, -jnp.sign(dl[k]), 0.0)
                )
            n = _qrot_c(quat, n_local)
        elif gtype in (GEOM_CAPSULE, GEOM_CYLINDER):
            r, hl = float(size[0]), float(size[1])
            ol = _qrot_inv_c(quat, oc)
            dl = _qrot_inv_c(quat, d)
            a_ = dl[0] ** 2 + dl[1] ** 2
            b_ = ol[0] * dl[0] + ol[1] * dl[1]
            c_ = ol[0] ** 2 + ol[1] ** 2 - r * r
            disc = b_ * b_ - a_ * c_
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t_cyl = (-b_ - sq) / jnp.where(a_ > 1e-12, a_, 1e-12)
            z_hit = ol[2] + t_cyl * dl[2]
            cyl_ok = (disc >= 0) & (t_cyl > 1e-4) & (jnp.abs(z_hit) <= hl)
            t = jnp.where(cyl_ok, t_cyl, far)
            for sz in (-1.0, 1.0):
                ocz = ol[2] - sz * hl
                bb = ol[0] * dl[0] + ol[1] * dl[1] + ocz * dl[2]
                cc = ol[0] ** 2 + ol[1] ** 2 + ocz**2 - r * r
                dd = bb * bb - cc
                tt = -bb - jnp.sqrt(jnp.maximum(dd, 0.0))
                t = jnp.minimum(t, jnp.where((dd >= 0) & (tt > 1e-4), tt, far))
            # normal: radial off the clamped axis point
            pl = [ol[k] + dl[k] * t for k in range(3)]
            zc = jnp.clip(pl[2], -hl, hl)
            n_local = [pl[0], pl[1], pl[2] - zc]
            nn = jnp.sqrt(
                n_local[0] ** 2 + n_local[1] ** 2 + n_local[2] ** 2
            )
            inv_nn = 1.0 / jnp.maximum(nn, 1e-9)
            n = _qrot_c(quat, [c * inv_nn for c in n_local])
        else:
            continue
        take(
            t < t_best, t, n,
            [jnp.full((E, N), float(color[k])) for k in range(3)],
            body + 2, gi + 2,
        )

    # normals face the ray origin
    flip = (n_best[0] * d[0] + n_best[1] * d[1] + n_best[2] * d[2]) > 0.0
    n_best = [jnp.where(flip, -c, c) for c in n_best]
    return t_best, n_best, a_best, sem_best, inst_best
