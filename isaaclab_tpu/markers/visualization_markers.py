"""Batched visualization markers (reference ``markers/visualization_markers.py``).

The reference instantiates marker prototypes through a
``UsdGeom.PointInstancer`` and mutates its instance attributes every frame.
The TPU build is headless — there is no stage — but the SEMANTICS are kept
whole: prototype registry, persistent per-instance buffers with partial
updates (``None`` = unchanged, reference visualize() contract at
visualization_markers.py:217), dynamic instance counts, visibility gating,
``count``/``num_prototypes`` queries — plus real output: marker prototypes
are triangulated host-side and the instanced scene can be exported as a
Wavefront OBJ sequence (any mesh viewer replays the rollout) or a compact
``.npz`` trace for notebook plotting.
"""

from __future__ import annotations

from dataclasses import MISSING

import numpy as np

from ..utils.configclass import configclass

# ---------------------------------------------------------------------------
# Marker prototype shape cfgs (reference uses sim_utils spawner cfgs; the
# headless build defines equivalent mesh generators)
# ---------------------------------------------------------------------------


@configclass
class SphereMarkerCfg:
    radius: float = 0.1
    color: tuple = (0.8, 0.2, 0.2)


@configclass
class CuboidMarkerCfg:
    size: tuple = (0.1, 0.1, 0.1)
    color: tuple = (0.2, 0.6, 0.8)


@configclass
class CylinderMarkerCfg:
    radius: float = 0.05
    height: float = 0.2
    color: tuple = (0.6, 0.6, 0.2)


@configclass
class ArrowMarkerCfg:
    """Arrow along +X (reference arrow usd prototypes): shaft + head."""

    scale: tuple = (1.0, 1.0, 1.0)
    color: tuple = (0.2, 0.8, 0.2)


@configclass
class FrameMarkerCfg:
    """RGB coordinate-frame triad (reference frame_prim.usd)."""

    scale: tuple = (0.1, 0.1, 0.1)


def _uv_sphere(r, n=8):
    verts, tris = [], []
    for i in range(n + 1):
        th = np.pi * i / n
        for j in range(n):
            ph = 2 * np.pi * j / n
            verts.append([r * np.sin(th) * np.cos(ph),
                          r * np.sin(th) * np.sin(ph), r * np.cos(th)])
    for i in range(n):
        for j in range(n):
            a = i * n + j
            b = i * n + (j + 1) % n
            c = (i + 1) * n + j
            d = (i + 1) * n + (j + 1) % n
            tris += [[a, b, c], [b, d, c]]
    return np.asarray(verts, np.float32), np.asarray(tris, np.int32)


def _box(sx, sy, sz):
    hx, hy, hz = sx / 2, sy / 2, sz / 2
    v = np.array([[x, y, z] for x in (-hx, hx) for y in (-hy, hy)
                  for z in (-hz, hz)], np.float32)
    t = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return v, t


def _cylinder(r, h, axis=2, n=10, base=0.0):
    """Closed cylinder along ``axis``; spans [base, base+h] on that axis."""
    verts, tris = [], []
    for k in (0, 1):
        z = base + k * h
        for j in range(n):
            ph = 2 * np.pi * j / n
            p = [r * np.cos(ph), r * np.sin(ph), z]
            verts.append(np.roll(p, axis - 2))
    c0 = len(verts)
    verts.append(np.roll([0.0, 0.0, base], axis - 2))
    verts.append(np.roll([0.0, 0.0, base + h], axis - 2))
    for j in range(n):
        a, b = j, (j + 1) % n
        c, d = n + j, n + (j + 1) % n
        tris += [[a, b, c], [b, d, c], [c0, b, a], [c0 + 1, c, d]]
    return np.asarray(verts, np.float32), np.asarray(tris, np.int32)


def _cone(r, h, axis=2, n=10, base=0.0):
    verts = []
    for j in range(n):
        ph = 2 * np.pi * j / n
        verts.append(np.roll([r * np.cos(ph), r * np.sin(ph), base], axis - 2))
    apex = len(verts)
    verts.append(np.roll([0.0, 0.0, base + h], axis - 2))
    center = len(verts)
    verts.append(np.roll([0.0, 0.0, base], axis - 2))
    tris = []
    for j in range(n):
        a, b = j, (j + 1) % n
        tris += [[a, b, apex], [center, b, a]]
    return np.asarray(verts, np.float32), np.asarray(tris, np.int32)


def _merge(parts):
    """parts: list of (verts, tris, color) -> one colored mesh."""
    vs, ts, cs = [], [], []
    off = 0
    for v, t, c in parts:
        vs.append(v)
        ts.append(t + off)
        cs.append(np.tile(np.asarray(c, np.float32), (len(v), 1)))
        off += len(v)
    return (np.concatenate(vs), np.concatenate(ts).astype(np.int32),
            np.concatenate(cs))


def _prototype_mesh(cfg):
    """Triangulate one marker prototype cfg -> (verts, tris, colors)."""
    if isinstance(cfg, SphereMarkerCfg):
        v, t = _uv_sphere(cfg.radius)
        return _merge([(v, t, cfg.color)])
    if isinstance(cfg, CuboidMarkerCfg):
        v, t = _box(*cfg.size)
        return _merge([(v, t, cfg.color)])
    if isinstance(cfg, CylinderMarkerCfg):
        v, t = _cylinder(cfg.radius, cfg.height)
        return _merge([(v, t, cfg.color)])
    if isinstance(cfg, ArrowMarkerCfg):
        sx, sy, sz = cfg.scale
        shaft_v, shaft_t = _cylinder(0.05 * sy, 0.5 * sx, axis=0)
        head_v, head_t = _cone(0.1 * sy, 0.25 * sx, axis=0, base=0.5 * sx)
        return _merge([(shaft_v, shaft_t, cfg.color),
                       (head_v, head_t, cfg.color)])
    if isinstance(cfg, FrameMarkerCfg):
        s = cfg.scale[0]
        parts = []
        for axis, color in ((0, (0.9, 0.1, 0.1)), (1, (0.1, 0.9, 0.1)),
                            (2, (0.1, 0.1, 0.9))):
            v, t = _cylinder(0.06 * s, s, axis=axis)
            parts.append((v, t, color))
        return _merge(parts)
    raise TypeError(f"unsupported marker prototype cfg: {type(cfg)!r}")


@configclass
class VisualizationMarkersCfg:
    """Reference ``VisualizationMarkersCfg``: prim path + marker prototypes."""

    prim_path: str = MISSING
    markers: dict = {}


def _quat_rot(quat, vec):
    """Rotate (M, 3) vectors by (M, 4) wxyz quats (numpy)."""
    w, x, y, z = quat[:, 0:1], quat[:, 1:2], quat[:, 2:3], quat[:, 3:4]
    q = np.concatenate([x, y, z], axis=1)
    t = 2.0 * np.cross(q, vec)
    return vec + w * t + np.cross(q, t)


class VisualizationMarkers:
    """Headless marker instancer with the reference's update semantics and
    offline export (OBJ / npz) instead of a live viewport."""

    MAX_FRAMES = 64

    def __init__(self, cfg: VisualizationMarkersCfg):
        self.cfg = cfg
        self._names = list(cfg.markers.keys()) or ["marker"]
        self._protos = [
            _prototype_mesh(cfg.markers[n]) for n in cfg.markers
        ] or [_merge([(_uv_sphere(0.05)[0], _uv_sphere(0.05)[1],
                       (0.8, 0.8, 0.2))])]
        self._visible = True
        # persistent instance buffers (reference PointInstancer attributes)
        self._translations = np.zeros((0, 3), np.float32)
        self._orientations = np.zeros((0, 4), np.float32)
        self._scales = np.ones((0, 3), np.float32)
        self._indices = np.zeros((0,), np.int32)
        self._frames: list = []

    def __str__(self) -> str:
        msg = f"VisualizationMarkers(prim_path={self.cfg.prim_path})"
        msg += f"\n\tCount: {self.count}"
        msg += f"\n\tNumber of prototypes: {self.num_prototypes}"
        msg += f"\n\tPrototypes: {self._names}"
        return msg

    # -- queries (reference :180-:190) --
    @property
    def num_prototypes(self) -> int:
        return len(self._protos)

    @property
    def count(self) -> int:
        return len(self._translations)

    def set_visibility(self, visible: bool):
        self._visible = visible

    def is_visible(self) -> bool:
        return self._visible

    # -- update (reference :217 semantics) --
    def visualize(self, translations=None, orientations=None, scales=None,
                  marker_indices=None):
        """Update instance buffers; ``None`` leaves a field unchanged. The
        instance COUNT follows whichever arrays are provided (all provided
        arrays must agree); omitted fields resize with defaults
        (identity quat, unit scale, prototype 0)."""
        if not self._visible:
            return
        args = {
            "translations": translations,
            "orientations": orientations,
            "scales": scales,
            "marker_indices": marker_indices,
        }
        provided = {
            k: np.asarray(v) for k, v in args.items() if v is not None
        }
        if not provided:
            raise ValueError(
                "visualize() called with all None arguments"
            )
        counts = {k: v.shape[0] for k, v in provided.items()}
        if len(set(counts.values())) > 1:
            raise ValueError(
                f"marker array first-dimension mismatch: {counts}"
            )
        m = next(iter(counts.values()))
        if m != self.count:
            # dynamic count change: resize persistent buffers with defaults
            self._translations = np.zeros((m, 3), np.float32)
            self._orientations = np.tile(
                np.asarray([1.0, 0, 0, 0], np.float32), (m, 1)
            )
            self._scales = np.ones((m, 3), np.float32)
            self._indices = np.zeros((m,), np.int32)
        if "translations" in provided:
            self._translations = provided["translations"].reshape(m, 3).astype(
                np.float32)
        if "orientations" in provided:
            self._orientations = provided["orientations"].reshape(m, 4).astype(
                np.float32)
        if "scales" in provided:
            self._scales = provided["scales"].reshape(m, 3).astype(np.float32)
        if "marker_indices" in provided:
            idx = provided["marker_indices"].reshape(m).astype(np.int32)
            if idx.size and (idx.min() < 0 or idx.max() >= self.num_prototypes):
                raise ValueError(
                    f"marker_indices out of range [0, {self.num_prototypes})"
                )
            self._indices = idx
        self._frames.append({
            "translations": self._translations.copy(),
            "orientations": self._orientations.copy(),
            "scales": self._scales.copy(),
            "marker_indices": self._indices.copy(),
        })
        if len(self._frames) > self.MAX_FRAMES:
            self._frames.pop(0)

    @property
    def frames(self) -> list:
        return self._frames

    # -- offline export (the headless answer to the viewport) --
    def instanced_mesh(self, frame: int = -1):
        """Expand prototypes by the instance poses of one recorded frame ->
        (verts (V, 3), tris (T, 3), colors (V, 3))."""
        if not self._frames:
            return (np.zeros((0, 3), np.float32),
                    np.zeros((0, 3), np.int32), np.zeros((0, 3), np.float32))
        f = self._frames[frame]
        parts = []
        for i in range(len(f["translations"])):
            v, t, c = self._protos[int(f["marker_indices"][i])]
            v = v * f["scales"][i][None, :]
            quat = np.tile(f["orientations"][i][None, :], (len(v), 1))
            v = _quat_rot(quat, v) + f["translations"][i][None, :]
            parts.append((v, t, c))
        vs, ts, cs = [], [], []
        off = 0
        for v, t, c in parts:
            vs.append(v)
            ts.append(t + off)
            cs.append(c)
            off += len(v)
        return (np.concatenate(vs) if vs else np.zeros((0, 3), np.float32),
                np.concatenate(ts).astype(np.int32) if ts else
                np.zeros((0, 3), np.int32),
                np.concatenate(cs) if cs else np.zeros((0, 3), np.float32))

    def save_obj(self, path: str, frame: int = -1):
        """Write one recorded frame as a colored Wavefront OBJ."""
        v, t, c = self.instanced_mesh(frame)
        with open(path, "w") as fh:
            fh.write(f"# isaaclab_tpu markers: {self.cfg.prim_path}\n")
            for p, col in zip(v, c):
                fh.write(
                    f"v {p[0]:.5f} {p[1]:.5f} {p[2]:.5f} "
                    f"{col[0]:.3f} {col[1]:.3f} {col[2]:.3f}\n"
                )
            for a, b, cc in t + 1:
                fh.write(f"f {a} {b} {cc}\n")

    def save_npz(self, path: str):
        """Dump the recorded frame history for notebook plotting."""
        if not self._frames:
            np.savez(path)
            return
        np.savez(
            path,
            **{
                f"{k}_{i}": f[k]
                for i, f in enumerate(self._frames)
                for k in f
            },
        )
