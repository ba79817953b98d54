"""Signed-distance-field mesh collision support.

The reference's factory tasks collide non-convex nut/bolt/peg MESHES through
PhysX's SDF contact generation (reference ``direct/factory/factory_env.py``
+ ``factory_tasks_cfg.py`` assets; PhysX "SDF collision" docs). The TPU
recast: each mesh geom precomputes a dense signed-distance voxel grid ONCE
on host (native C++ kernel ``sdf_from_mesh``, numpy fallback), and runtime
narrowphase is point-vs-SDF — surface sample points of the other geom are
transformed into the mesh frame and the SDF + gradient are fetched with one
4-wide trilinear gather per point (same packed-grid trick as
``collision.HeightField.packed``). Fixed candidate counts, no BVH, no
data-dependent shapes: exactly the shape of work XLA/TPU runs well.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..utils import math as math_utils


class MeshSDF(NamedTuple):
    """Dense SDF voxel grid in the geom's local frame.

    ``packed``: (nx, ny, nz, 4) host array of [d, gx, gy, gz] — signed
    distance plus its (unnormalized) central-difference gradient, so one
    trilinear fetch yields depth AND contact normal.
    """

    packed: np.ndarray
    origin: np.ndarray  # (3,) world position of voxel (0,0,0)
    spacing: float

    def sample(self, p):
        """Trilinear SDF + gradient at local points ``p`` (..., 3).

        Returns (dist (...,), grad (..., 3) unit). Queries outside the grid
        clamp to the boundary and add the clamp offset's length to the
        distance (exact for points beyond a padded grid whose boundary
        values are >= padding).
        """
        P = jnp.asarray(self.packed)
        nx, ny, nz = P.shape[0], P.shape[1], P.shape[2]
        rel = (p - jnp.asarray(self.origin)) / self.spacing
        relc = jnp.clip(
            rel,
            jnp.zeros(3),
            jnp.asarray([nx - 1.001, ny - 1.001, nz - 1.001]),
        )
        out_off = (rel - relc) * self.spacing  # (..., 3) zero when inside
        i0 = jnp.floor(relc).astype(jnp.int32)
        f = relc - i0
        x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
        fx = f[..., 0:1]
        fy = f[..., 1:2]
        fz = f[..., 2:3]

        def g(dx, dy, dz):
            return P[x0 + dx, y0 + dy, z0 + dz]  # (..., 4)

        c00 = g(0, 0, 0) * (1 - fz) + g(0, 0, 1) * fz
        c01 = g(0, 1, 0) * (1 - fz) + g(0, 1, 1) * fz
        c10 = g(1, 0, 0) * (1 - fz) + g(1, 0, 1) * fz
        c11 = g(1, 1, 0) * (1 - fz) + g(1, 1, 1) * fz
        c0 = c00 * (1 - fy) + c01 * fy
        c1 = c10 * (1 - fy) + c11 * fy
        v = c0 * (1 - fx) + c1 * fx  # (..., 4)
        dist = v[..., 0] + jnp.linalg.norm(out_off, axis=-1)
        grad = v[..., 1:4] + out_off  # clamp offset dominates far outside
        grad = math_utils.normalize(grad)
        return dist, grad


@dataclass
class MeshData:
    """Host-side mesh attachment for a ``Geom`` with ``gtype == GEOM_MESH``.

    ``surface_points``: (n, 3) local-frame contact sample points — this
    mesh's candidate points when IT is the query side of an SDF pair, and
    its ground-contact probes.
    """

    vertices: np.ndarray
    faces: np.ndarray
    sdf: MeshSDF = None
    surface_points: np.ndarray = None
    bound_radius: float = 0.0

    def __post_init__(self):
        self.vertices = np.asarray(self.vertices, dtype=np.float32)
        self.faces = np.asarray(self.faces, dtype=np.int32)
        if self.bound_radius == 0.0:
            self.bound_radius = float(
                np.linalg.norm(self.vertices, axis=1).max()
            )
        if self.surface_points is None:
            self.surface_points = surface_points_from_mesh(
                self.vertices, self.faces
            )


def build_mesh_sdf(
    vertices, faces, spacing: float, margin: float = None
) -> MeshSDF:
    """Precompute the SDF grid for a watertight triangle mesh.

    ``margin``: grid padding beyond the mesh AABB (default 4 voxels) — must
    cover the deepest expected penetration plus the largest sample-point
    offset so out-of-grid clamping stays exact.
    """
    from .. import native

    vertices = np.asarray(vertices, dtype=np.float32)
    faces = np.asarray(faces, dtype=np.int32)
    if margin is None:
        margin = 4 * spacing
    lo = vertices.min(axis=0) - margin
    hi = vertices.max(axis=0) + margin
    n = np.maximum(np.ceil((hi - lo) / spacing).astype(int) + 1, 2)
    grid = native.sdf_from_mesh(
        vertices, faces, int(n[0]), int(n[1]), int(n[2]), lo, spacing
    )
    gx, gy, gz = np.gradient(grid, spacing)
    packed = np.stack([grid, gx, gy, gz], axis=-1).astype(np.float32)
    return MeshSDF(packed=packed, origin=lo.astype(np.float32), spacing=spacing)


def surface_points_from_mesh(vertices, faces, n: int = 32) -> np.ndarray:
    """Deterministic well-spread surface sample points (local frame).

    Area-weighted candidate pool (fixed seed) + farthest-point downselect —
    the mesh's contact-candidate set when queried against another SDF, and
    its ground probes. Mirrors PhysX's SDF-vs-mesh "feature points".
    """
    vertices = np.asarray(vertices, dtype=np.float64)
    faces = np.asarray(faces, dtype=np.int64)
    a = vertices[faces[:, 0]]
    b = vertices[faces[:, 1]]
    c = vertices[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    p_tri = area / max(area.sum(), 1e-12)
    rng = np.random.default_rng(0)
    m = max(8 * n, 256)
    t = rng.choice(len(faces), size=m, p=p_tri)
    r1 = np.sqrt(rng.random(m))
    r2 = rng.random(m)
    pts = (
        (1 - r1)[:, None] * a[t]
        + (r1 * (1 - r2))[:, None] * b[t]
        + (r1 * r2)[:, None] * c[t]
    )
    # farthest-point downselect (include all mesh vertices as candidates for
    # sharp features — corners carry the contact load)
    cand = np.concatenate([vertices, pts], axis=0)
    sel = [int(np.argmax(np.linalg.norm(cand, axis=1)))]
    d = np.linalg.norm(cand - cand[sel[0]], axis=1)
    for _ in range(n - 1):
        k = int(np.argmax(d))
        sel.append(k)
        d = np.minimum(d, np.linalg.norm(cand - cand[k], axis=1))
    return cand[sel].astype(np.float32)


def primitive_surface_points(geom) -> np.ndarray:
    """Local-frame surface sample points for a primitive geom queried
    against a mesh SDF (sphere/capsule/cylinder/box)."""
    from .model import GEOM_BOX, GEOM_CAPSULE, GEOM_CYLINDER, GEOM_SPHERE

    if geom.gtype == GEOM_SPHERE:
        r = geom.size[0]
        dirs = _sphere_dirs()
        return (r * dirs).astype(np.float32)
    if geom.gtype in (GEOM_CAPSULE, GEOM_CYLINDER):
        r, hl = geom.size[0], geom.size[1]
        ang = np.linspace(0, 2 * np.pi, 6, endpoint=False)
        ring = np.stack([np.cos(ang), np.sin(ang)], axis=1) * r
        pts = []
        for z in (-hl, -0.5 * hl, 0.0, 0.5 * hl, hl):
            pts.append(np.concatenate([ring, np.full((6, 1), z)], axis=1))
        tip = hl + (r if geom.gtype == GEOM_CAPSULE else 0.0)
        pts.append(np.array([[0.0, 0.0, tip], [0.0, 0.0, -tip]]))
        return np.concatenate(pts, axis=0).astype(np.float32)  # (32, 3)
    if geom.gtype == GEOM_BOX:
        h = np.asarray(geom.size)
        corners = np.array(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
        )
        edges = []
        for i in range(8):
            for j in range(i + 1, 8):
                if np.sum(np.abs(corners[i] - corners[j])) == 2:
                    edges.append(0.5 * (corners[i] + corners[j]))
        faces_c = [np.eye(3)[k] * s for k in range(3) for s in (-1, 1)]
        return (
            np.concatenate([corners, np.stack(edges), np.stack(faces_c)]) * h
        ).astype(np.float32)  # (26, 3)
    raise NotImplementedError(f"surface points for geom type {geom.gtype}")


def _sphere_dirs():
    v = np.array(
        [
            [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1],
            [0, 0, -1],
        ]
        + [
            [sx, sy, sz]
            for sx in (-1, 1)
            for sy in (-1, 1)
            for sz in (-1, 1)
        ],
        dtype=np.float64,
    )
    return v / np.linalg.norm(v, axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# Watertight procedural meshes for the factory assets (the reference ships
# nut/bolt/peg USDs; headless TPU builds generate equivalent geometry).
# ---------------------------------------------------------------------------


def _ring_solid(profiles, close_bottom=True, close_top=True):
    """Stack of (k, 2)-profile rings [(z, pts2d (k,2)), ...] -> watertight
    tube. Consecutive rings must share k. Caps fan from ring centroids."""
    verts = []
    faces = []
    k = profiles[0][1].shape[0]
    for z, pts in profiles:
        assert pts.shape[0] == k
        verts.append(np.concatenate([pts, np.full((k, 1), z)], axis=1))
    nring = len(profiles)
    V = np.concatenate(verts, axis=0)
    for r in range(nring - 1):
        b0 = r * k
        b1 = (r + 1) * k
        for i in range(k):
            j = (i + 1) % k
            faces.append((b0 + i, b0 + j, b1 + i))
            faces.append((b1 + i, b0 + j, b1 + j))
    extra = []
    if close_bottom:
        c0 = len(V) + len(extra)
        extra.append(np.concatenate([profiles[0][1].mean(0), [profiles[0][0]]]))
        for i in range(k):
            faces.append((c0, (i + 1) % k, i))
    if close_top:
        c1 = len(V) + len(extra)
        extra.append(
            np.concatenate([profiles[-1][1].mean(0), [profiles[-1][0]]])
        )
        b = (nring - 1) * k
        for i in range(k):
            faces.append((c1, b + i, b + (i + 1) % k))
    if extra:
        V = np.concatenate([V, np.stack(extra)], axis=0)
    return V.astype(np.float32), np.asarray(faces, dtype=np.int32)


def _circle(r, n=24, phase=0.0):
    a = np.linspace(0, 2 * np.pi, n, endpoint=False) + phase
    return np.stack([r * np.cos(a), r * np.sin(a)], axis=1)


def cylinder_mesh(radius, half_length, n=24):
    return _ring_solid(
        [(-half_length, _circle(radius, n)), (half_length, _circle(radius, n))]
    )


def box_mesh(half_extents):
    h = np.asarray(half_extents, dtype=np.float32)
    sq = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]]) * h[:2]
    return _ring_solid([(-h[2], sq), (h[2], sq)])


def merge_meshes(parts):
    """[(V, F, offset), ...] -> one triangle soup. Disjoint watertight
    components stay watertight; the z-ray parity sign in ``sdf_from_mesh``
    is per-component-correct (two crossings per solid)."""
    Vs, Fs, off = [], [], 0
    for V, F, shift in parts:
        Vs.append(np.asarray(V, np.float32) + np.asarray(shift, np.float32))
        Fs.append(np.asarray(F, np.int32) + off)
        off += len(V)
    return np.concatenate(Vs), np.concatenate(Fs)


def bore_surface_points(radius, half_h, n_ang=12, z_levels=(-1.0, 0.0, 1.0),
                        center=(0.0, 0.0, 0.0)) -> np.ndarray:
    """Sample points on a bore's INNER wall (local frame) — the query set
    for a ring/nut/gear bore against a shaft SDF, where generic surface
    sampling would spend its points on the outer silhouette."""
    a = np.linspace(0, 2 * np.pi, n_ang, endpoint=False)
    rings = []
    for zf in z_levels:
        rings.append(
            np.stack(
                [radius * np.cos(a), radius * np.sin(a),
                 np.full(n_ang, zf * half_h)], axis=1
            )
        )
    return (np.concatenate(rings) + np.asarray(center)).astype(np.float32)


def annular_plate_mesh(hole_radius, outer_half, thickness, n=32,
                       chamfer=None):
    """Square plate (half-extent ``outer_half``) with a round through-hole —
    the peg-insert socket (reference factory hole ~0.1 mm clearance class).
    Watertight: hole wall + top/bottom annulus + outer walls.

    ``chamfer``: optional (depth, extra_radius) countersink at the hole's
    top entry (real factory sockets and the reference's peg tips are
    chamfered; the taper funnels the peg at tight clearances)."""
    a = np.linspace(0, 2 * np.pi, n, endpoint=False)

    def ring(r, z):
        return np.concatenate(
            [np.stack([r * np.cos(a), r * np.sin(a)], axis=1),
             np.full((n, 1), z)], axis=1
        )

    # outer square sampled at matching angles (ray from center to square edge)
    t = np.maximum(np.abs(np.cos(a)), np.abs(np.sin(a)))
    outer = np.stack(
        [outer_half * np.cos(a) / t, outer_half * np.sin(a) / t], axis=1
    )
    z0, z1 = 0.0, thickness
    ch_d, ch_w = chamfer if chamfer else (0.0, 0.0)
    # inner wall profile bottom -> top: straight bore, then the countersink
    inner_rings = [ring(hole_radius, z0), ring(hole_radius, z1 - ch_d)]
    if chamfer:
        inner_rings.append(ring(hole_radius + ch_w, z1))
    groups = inner_rings + [
        np.concatenate([outer, np.full((n, 1), z0)], axis=1),
        np.concatenate([outer, np.full((n, 1), z1)], axis=1),
    ]
    V = np.concatenate(groups)
    ni = len(inner_rings)
    top_in = (ni - 1) * n  # inner ring at z1
    bot_out = ni * n
    top_out = (ni + 1) * n
    F = []
    for i in range(n):
        j = (i + 1) % n
        # inner wall segments (bore + chamfer), normals toward the axis
        for rr in range(ni - 1):
            b0, b1 = rr * n, (rr + 1) * n
            F += [(b0 + i, b0 + j, b1 + i), (b1 + i, b0 + j, b1 + j)]
        # top annulus
        F += [(top_in + i, top_out + j, top_out + i),
              (top_in + i, top_in + j, top_out + j)]
        # bottom annulus
        F += [(0 + i, bot_out + i, bot_out + j), (0 + i, bot_out + j, 0 + j)]
        # outer wall
        F += [(bot_out + i, top_out + i, top_out + j),
              (bot_out + i, top_out + j, bot_out + j)]
    return V.astype(np.float32), np.asarray(F, dtype=np.int32)


def _annular_prism(inner_radii, outer_radii, thickness, n):
    """Prism with a through-hole: inner/outer boundary radii sampled at n
    matching angles, extruded z in [-t/2, t/2]. Watertight."""
    a = np.linspace(0, 2 * np.pi, n, endpoint=False)
    inner = np.stack(
        [inner_radii * np.cos(a), inner_radii * np.sin(a)], axis=1
    )
    outer = np.stack(
        [outer_radii * np.cos(a), outer_radii * np.sin(a)], axis=1
    )
    z0, z1 = -0.5 * thickness, 0.5 * thickness
    V = np.concatenate(
        [
            np.concatenate([inner, np.full((n, 1), z0)], axis=1),
            np.concatenate([inner, np.full((n, 1), z1)], axis=1),
            np.concatenate([outer, np.full((n, 1), z0)], axis=1),
            np.concatenate([outer, np.full((n, 1), z1)], axis=1),
        ]
    )
    F = []
    for i in range(n):
        j = (i + 1) % n
        F += [(0 * n + i, 0 * n + j, 1 * n + i), (1 * n + i, 0 * n + j, 1 * n + j)]
        F += [(1 * n + i, 3 * n + j, 3 * n + i), (1 * n + i, 1 * n + j, 3 * n + j)]
        F += [(0 * n + i, 2 * n + i, 2 * n + j), (0 * n + i, 2 * n + j, 0 * n + j)]
        F += [(2 * n + i, 3 * n + i, 3 * n + j), (2 * n + i, 3 * n + j, 2 * n + j)]
    return V.astype(np.float32), np.asarray(F, dtype=np.int32)


def hex_nut_mesh(flat_radius, hole_radius, thickness, n=24):
    """Hex nut: hexagonal outside, round through-hole (reference factory
    NutThread held asset). ``flat_radius``: center to flat distance."""
    a = np.linspace(0, 2 * np.pi, n, endpoint=False)
    sector = (a + np.pi / 6) % (np.pi / 3) - np.pi / 6
    outer = flat_radius / np.cos(sector)
    return _annular_prism(np.full(n, hole_radius), outer, thickness, n)


def gear_with_bore_mesh(bore_radius, root_radius, tip_radius, teeth,
                        thickness, n_per_tooth=4):
    """Spur gear with a center bore (reference factory GearMesh held gear:
    the bore slides over the gear-base shaft)."""
    n = teeth * n_per_tooth * 2
    a = np.linspace(0, 2 * np.pi, n, endpoint=False)
    tooth_phase = (a * teeth) % (2 * np.pi)
    outer = np.where(tooth_phase < np.pi, tip_radius, root_radius)
    return _annular_prism(np.full(n, bore_radius), outer, thickness, n)


def threaded_shaft_mesh(radius, half_length, thread_depth, pitch, n=24):
    """Cylinder with ring "threads" — radial ridges at the thread pitch.
    (True helical threads exceed useful SDF resolution; PhysX's factory SDFs
    resolve threads at 0.1 mm voxels — here ring threads at the same pitch
    give the same axial interlock for the NutThread task's reward/metric.)"""
    profiles = []
    z = -half_length
    profiles.append((z, _circle(radius - thread_depth, n)))
    while z < half_length - 0.25 * pitch:
        profiles.append((z + 0.25 * pitch, _circle(radius, n)))
        profiles.append((z + 0.5 * pitch, _circle(radius - thread_depth, n)))
        z += 0.5 * pitch
    profiles.append((half_length, _circle(radius - thread_depth, n)))
    return _ring_solid(profiles)


def spur_gear_mesh(root_radius, tip_radius, teeth, thickness, n_per_tooth=4):
    """Straight-cut spur gear silhouette extruded to a plate (reference
    factory GearMesh assets)."""
    n = teeth * n_per_tooth * 2
    a = np.linspace(0, 2 * np.pi, n, endpoint=False)
    tooth_phase = (a * teeth) % (2 * np.pi)
    r = np.where(tooth_phase < np.pi, tip_radius, root_radius)
    prof = np.stack([r * np.cos(a), r * np.sin(a)], axis=1)
    return _ring_solid(
        [(-0.5 * thickness, prof), (0.5 * thickness, prof)]
    )
