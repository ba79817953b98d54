"""Batched analytic collision detection.

Replaces the PhysX GPU broadphase/narrowphase (SURVEY.md §2.10 row 1). The
candidate-contact set is *static* (fixed shapes under jit, SURVEY.md §7 hard
part 1): every geom contributes a fixed number of candidate contacts against
the terrain, plus an optional static list of geom-geom pairs. Inactive
candidates carry ``depth <= 0`` and are masked in the solver — no ``nonzero``
style data-dependent shapes anywhere.

Terrain is either an infinite plane at z=0 or a height field sampled with
bilinear interpolation (the TPU-friendly representation — SURVEY.md §2.7).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..utils import math as math_utils
from .kinematics import Kinematics
from .model import (
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_CYLINDER,
    GEOM_MESH,
    GEOM_SPHERE,
    RobotModel,
)

# mesh ground probes: the first K farthest-point-spread surface samples
# (physics/sdf.surface_points_from_mesh orders by coverage)
_MESH_GROUND_PROBES = 12


class HeightField(NamedTuple):
    """Uniform-grid terrain height field.

    ``heights``: (rows, cols) z values; x spans rows, y spans cols, cell size
    ``horizontal_scale``; grid origin (world x,y of heights[0,0]) at ``origin``.
    """

    heights: jnp.ndarray
    horizontal_scale: float
    origin: jnp.ndarray  # (2,)
    # optional (rows, cols, 4) packed [h, nx, ny, nz] grid: one bilinear
    # fetch yields height AND normal as a single 4-wide gather per corner
    # instead of 5 separate scalar-gather sample() calls (1 height + 4
    # finite-difference taps) — the terrain-contact path is gather-bound on
    # TPU, and this cuts its gather count 5x
    packed: jnp.ndarray = None
    # optional OVERHANG layer: (rows, cols, 2) [z_lo, z_hi] solid slab
    # suspended above the base surface (reference trimesh floating_ring —
    # geometry a single height field cannot represent). Cells without an
    # overhang carry [+BIG, -BIG] so nothing ever hits them.
    slab: jnp.ndarray = None
    # optional (rows, cols, 4) per-cell bilinear corner pack
    # [h(r,c), h(r+1,c), h(r,c+1), h(r+1,c+1)]: ONE 16-byte gather per
    # query instead of four scalar gathers. XLA lowers scattered scalar
    # gathers to ~10ns/element DMAs — the 187-ray height scanner's four
    # corner gathers measured 31 ms/env-step at 4096 envs (device trace,
    # r4) and dominate rough locomotion; corner packing cuts the DMA count
    # 4x and is the difference between gather-bound and compute-bound.
    corners: jnp.ndarray = None
    # optional (rows, cols, 16) pack of the FOUR bilinear corners of the
    # [h, nx, ny, nz] grid — sample_hn() in one 64-byte gather per query
    # (the contact narrowphase's height+normal fetch)
    packed_corners: jnp.ndarray = None

    def sample(self, xy):
        """Bilinear height lookup at world (..., 2) positions; O(1) per query,
        the TPU answer to Warp's BVH raycast for terrain (SURVEY.md §2.10).
        With the ``corners`` pack: one 4-wide gather per query."""
        # heights may be host numpy (trace-time constant); convert inside the
        # trace so gathers with traced indices work
        H = jnp.asarray(self.heights)
        rel = (xy - jnp.asarray(self.origin)) / self.horizontal_scale
        r, c = rel[..., 0], rel[..., 1]
        nr, nc = H.shape
        r = jnp.clip(r, 0.0, nr - 1.001)
        c = jnp.clip(c, 0.0, nc - 1.001)
        r0 = jnp.floor(r).astype(jnp.int32)
        c0 = jnp.floor(c).astype(jnp.int32)
        fr, fc = r - r0, c - c0
        if self.corners is not None:
            C = jnp.asarray(self.corners)[r0, c0]  # (..., 4)
            h00, h10, h01, h11 = (
                C[..., 0], C[..., 1], C[..., 2], C[..., 3]
            )
        else:
            h00 = H[r0, c0]
            h10 = H[r0 + 1, c0]
            h01 = H[r0, c0 + 1]
            h11 = H[r0 + 1, c0 + 1]
        return (
            h00 * (1 - fr) * (1 - fc)
            + h10 * fr * (1 - fc)
            + h01 * (1 - fr) * fc
            + h11 * fr * fc
        )

    def _bilinear_packed(self, xy):
        P = jnp.asarray(self.packed)
        rel = (xy - jnp.asarray(self.origin)) / self.horizontal_scale
        r, c = rel[..., 0], rel[..., 1]
        nr, nc = P.shape[0], P.shape[1]
        r = jnp.clip(r, 0.0, nr - 1.001)
        c = jnp.clip(c, 0.0, nc - 1.001)
        r0 = jnp.floor(r).astype(jnp.int32)
        c0 = jnp.floor(c).astype(jnp.int32)
        fr = (r - r0)[..., None]
        fc = (c - c0)[..., None]
        p00 = P[r0, c0]
        p10 = P[r0 + 1, c0]
        p01 = P[r0, c0 + 1]
        p11 = P[r0 + 1, c0 + 1]
        return (
            p00 * (1 - fr) * (1 - fc)
            + p10 * fr * (1 - fc)
            + p01 * (1 - fr) * fc
            + p11 * fr * fc
        )

    def sample_hn(self, xy):
        """(height, unit normal) in one pass via the packed grid when
        available; falls back to sample()+normal(). With ``packed_corners``
        the whole bilinear stencil is ONE 64-byte gather."""
        if self.packed is None:
            return self.sample(xy), self.normal(xy)
        if self.packed_corners is not None:
            P = jnp.asarray(self.packed_corners)
            rel = (xy - jnp.asarray(self.origin)) / self.horizontal_scale
            r, c = rel[..., 0], rel[..., 1]
            nr, nc = P.shape[0], P.shape[1]
            r = jnp.clip(r, 0.0, nr - 1.001)
            c = jnp.clip(c, 0.0, nc - 1.001)
            r0 = jnp.floor(r).astype(jnp.int32)
            c0 = jnp.floor(c).astype(jnp.int32)
            fr = (r - r0)[..., None]
            fc = (c - c0)[..., None]
            C = P[r0, c0]  # (..., 16) = [p00 | p10 | p01 | p11]
            v = (
                C[..., 0:4] * (1 - fr) * (1 - fc)
                + C[..., 4:8] * fr * (1 - fc)
                + C[..., 8:12] * (1 - fr) * fc
                + C[..., 12:16] * fr * fc
            )
            return v[..., 0], math_utils.normalize(v[..., 1:4])
        v = self._bilinear_packed(xy)
        return v[..., 0], math_utils.normalize(v[..., 1:4])

    def sample_slab(self, xy):
        """Nearest-cell overhang interval (z_lo, z_hi) at world (..., 2)
        positions (sharp-edged slabs: bilinear would smear the ring rim)."""
        S = jnp.asarray(self.slab)
        rel = (xy - jnp.asarray(self.origin)) / self.horizontal_scale
        r = jnp.clip(jnp.round(rel[..., 0]).astype(jnp.int32), 0, S.shape[0] - 1)
        c = jnp.clip(jnp.round(rel[..., 1]).astype(jnp.int32), 0, S.shape[1] - 1)
        v = S[r, c]
        return v[..., 0], v[..., 1]

    def normal(self, xy, eps: float = 0.05):
        """Finite-difference surface normal at world (..., 2) positions."""
        dx = jnp.stack([jnp.full_like(xy[..., 0], eps), jnp.zeros_like(xy[..., 0])], -1)
        dy = jnp.stack([jnp.zeros_like(xy[..., 0]), jnp.full_like(xy[..., 0], eps)], -1)
        gx = (self.sample(xy + dx) - self.sample(xy - dx)) / (2 * eps)
        gy = (self.sample(xy + dy) - self.sample(xy - dy)) / (2 * eps)
        n = jnp.stack([-gx, -gy, jnp.ones_like(gx)], axis=-1)
        return math_utils.normalize(n)


def pack_corner_heights(heights) -> np.ndarray:
    """(rows, cols) heights -> (rows, cols, 4) bilinear corner pack
    [h(r,c), h(r+1,c), h(r,c+1), h(r+1,c+1)] (edge-clamped) for
    ``HeightField.corners``."""
    H = np.asarray(heights, dtype=np.float32)
    Hp = np.pad(H, ((0, 1), (0, 1)), mode="edge")
    return np.stack(
        [Hp[:-1, :-1], Hp[1:, :-1], Hp[:-1, 1:], Hp[1:, 1:]], axis=-1
    )


def pack_corner_channels(packed) -> np.ndarray:
    """(rows, cols, k) channel grid -> (rows, cols, 4k) four-corner pack
    [p(r,c) | p(r+1,c) | p(r,c+1) | p(r+1,c+1)] (edge-clamped) for
    ``HeightField.packed_corners``."""
    P = np.asarray(packed, dtype=np.float32)
    Pp = np.pad(P, ((0, 1), (0, 1), (0, 0)), mode="edge")
    return np.concatenate(
        [Pp[:-1, :-1], Pp[1:, :-1], Pp[:-1, 1:], Pp[1:, 1:]], axis=-1
    )


class Contacts(NamedTuple):
    """Fixed-size candidate contact set for one env instance."""

    pos: jnp.ndarray  # (ncon, 3) contact point, world
    normal: jnp.ndarray  # (ncon, 3) contact normal (world, pointing from b->a)
    depth: jnp.ndarray  # (ncon,) penetration depth (>0 = touching)
    body_a: np.ndarray  # (ncon,) static body index (robot side)
    body_b: np.ndarray  # (ncon,) static body index of other side (-1 = world)
    friction: jnp.ndarray  # (ncon,)
    restitution: jnp.ndarray  # (ncon,)


def _geom_world_pose(kin: Kinematics, geom):
    b = geom.body
    pos, quat = math_utils.combine_frame_transforms(
        kin.body_pos_w[b],
        kin.body_quat_w[b],
        jnp.asarray(geom.pos),
        jnp.asarray(geom.quat),
    )
    return pos, quat


def _terrain_height_normal(terrain, xy):
    if terrain is None:
        h = jnp.zeros(xy.shape[:-1])
        n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), xy.shape[:-1] + (3,))
        return h, n
    return terrain.sample_hn(xy)


def _ground_candidates_for_geom(geom, pos, quat, terrain):
    """List of (point_on_geom_surface_lowest, radius_offset) ground probes.

    Returns (points (k,3), offsets (k,)): contact depth at probe p with
    effective radius r is ``(h_terrain - (p_z)) + r`` measured along the
    terrain normal (approximated vertically for shallow slopes).
    """
    if geom.gtype == GEOM_SPHERE:
        return pos[None, :], jnp.array([geom.size[0]])
    if geom.gtype in (GEOM_CAPSULE, GEOM_CYLINDER):
        r, hl = geom.size[0], geom.size[1]
        axis = math_utils.quat_apply(quat, jnp.array([0.0, 0.0, 1.0]))
        ends = jnp.stack([pos + axis * hl, pos - axis * hl])
        return ends, jnp.array([r, r])
    if geom.gtype == GEOM_BOX:
        hx, hy, hz = geom.size
        corners_local = jnp.array(
            [
                [sx * hx, sy * hy, sz * hz]
                for sx in (-1, 1)
                for sy in (-1, 1)
                for sz in (-1, 1)
            ]
        )
        corners = pos[None, :] + math_utils.quat_apply(quat[None, :], corners_local)
        return corners, jnp.zeros(8)
    if geom.gtype == GEOM_MESH:
        k = min(_MESH_GROUND_PROBES, geom.mesh.surface_points.shape[0])
        local = jnp.asarray(geom.mesh.surface_points[:k])
        pts = pos[None, :] + math_utils.quat_apply(
            jnp.broadcast_to(quat, (k, 4)), local
        )
        return pts, jnp.zeros(k)
    raise NotImplementedError(f"ground contact for geom type {geom.gtype}")


def num_ground_candidates(geom) -> int:
    if geom.gtype == GEOM_MESH:
        return min(_MESH_GROUND_PROBES, geom.mesh.surface_points.shape[0])
    return {GEOM_SPHERE: 1, GEOM_CAPSULE: 2, GEOM_CYLINDER: 2, GEOM_BOX: 8}[geom.gtype]


def _box_corners(geom, pos, quat):
    """(8, 3) world-space corners of a box geom."""
    hx, hy, hz = geom.size
    local = jnp.array(
        [
            [sx * hx, sy * hy, sz * hz]
            for sx in (-1, 1)
            for sy in (-1, 1)
            for sz in (-1, 1)
        ]
    )
    return pos[None, :] + math_utils.quat_apply(
        jnp.broadcast_to(quat, (8, 4)), local
    )


def _point_vs_box(p, box, box_pos, box_quat, witness_dir):
    """Contact of point ``p`` against a box: depth > 0 when inside. Normal
    points from the box toward the point (outward).

    ``witness_dir``: world-frame unit direction from this box's center toward
    the other body's center. Penetrating (or face-degenerate) points take the
    box face most aligned with it — for two aligned equal cubes stacked
    face-on-face, every penetrating corner lies EXACTLY on a lateral face, so
    a min-distance face pick would return a sideways normal with ~zero depth
    and the stack falls through; the witness face is the physically loaded
    one.
    """
    half = jnp.asarray(box.size)
    lp = math_utils.quat_apply_inverse(box_quat, p - box_pos)
    clamped = jnp.clip(lp, -half, half)
    delta = lp - clamped
    dist_out = jnp.linalg.norm(delta)
    # witness face: box axis most aligned with the direction to the other body
    w_bf = math_utils.quat_apply_inverse(box_quat, witness_dir)
    ax = jnp.argmax(jnp.abs(w_bf) / half)
    sgn = jnp.where(w_bf[ax] >= 0.0, 1.0, -1.0)
    n_face = jnp.zeros(3).at[ax].set(sgn)
    depth_face = (half[ax] - sgn * lp[ax])  # penetration past the witness face
    n_out = delta / jnp.maximum(dist_out, 1e-9)
    # outside-and-clear points keep the closest-point normal; inside or
    # edge-degenerate points use the witness face
    use_out = dist_out > 1e-6
    normal_box = jnp.where(use_out, n_out, n_face)
    depth = jnp.where(use_out, -dist_out, depth_face)
    normal = math_utils.quat_apply(box_quat, normal_box)
    point = math_utils.quat_apply(box_quat, clamped) + box_pos
    return point, normal, depth


def _box_edge_contact(geom_a, pos_a, quat_a, geom_b, pos_b, quat_b):
    """Single SAT edge-edge contact candidate between two boxes.

    Runs the full 15-axis separating-axis test (6 face + 9 edge-cross axes).
    Emits a real contact (depth > 0) ONLY when the boxes overlap on every
    axis AND the minimal-overlap axis is an edge-cross axis — the exact case
    the corner-sampling candidates miss (corner sampling catches all face-
    minimal configurations). Branch-free: always returns one
    (point, normal_b_to_a, depth) tuple, masked by negative depth otherwise.
    """
    Ra = math_utils.matrix_from_quat(quat_a)  # columns = box axes
    Rb = math_utils.matrix_from_quat(quat_b)
    ha = jnp.asarray(geom_a.size)
    hb = jnp.asarray(geom_b.size)
    t = pos_b - pos_a

    def overlap_on(L):
        proj_a = jnp.sum(ha * jnp.abs(Ra.T @ L))
        proj_b = jnp.sum(hb * jnp.abs(Rb.T @ L))
        return proj_a + proj_b - jnp.abs(jnp.dot(t, L))

    # face axes (6 -> 3 unique directions per box)
    face_overlaps = jnp.stack(
        [overlap_on(Ra[:, k]) for k in range(3)]
        + [overlap_on(Rb[:, k]) for k in range(3)]
    )
    # edge-cross axes (9)
    edge_axes, edge_overlaps, edge_ij = [], [], []
    for i in range(3):
        for j in range(3):
            L = jnp.cross(Ra[:, i], Rb[:, j])
            norm = jnp.linalg.norm(L)
            ok = norm > 1e-6
            Ln = L / jnp.maximum(norm, 1e-9)
            edge_axes.append(Ln)
            # degenerate (parallel) axes can never be the separating axis;
            # mask them out of the argmin with +inf
            edge_overlaps.append(jnp.where(ok, overlap_on(Ln), jnp.inf))
            edge_ij.append((i, j))
    edge_axes = jnp.stack(edge_axes)  # (9, 3)
    edge_overlaps = jnp.stack(edge_overlaps)  # (9,)

    all_overlap = jnp.all(face_overlaps > 0.0) & jnp.all(
        jnp.where(jnp.isinf(edge_overlaps), 1.0, edge_overlaps) > 0.0
    )
    k = jnp.argmin(edge_overlaps)
    min_edge = edge_overlaps[k]
    edge_is_minimal = min_edge < jnp.min(face_overlaps)
    L = edge_axes[k]
    # orient the normal from B toward A
    sgn = jnp.where(jnp.dot(t, L) > 0.0, -1.0, 1.0)
    n = L * sgn  # points from b to a
    # support edges: A's edge along axis i at the corner extremal in -n,
    # B's edge along axis j at the corner extremal in +n
    i_idx = jnp.asarray([ij[0] for ij in edge_ij])[k]
    j_idx = jnp.asarray([ij[1] for ij in edge_ij])[k]
    eye = jnp.eye(3)
    mask_a = 1.0 - eye[i_idx]  # zero out the edge direction component
    mask_b = 1.0 - eye[j_idx]
    sign_a = jnp.sign(Ra.T @ (-n))
    sign_a = jnp.where(sign_a == 0.0, 1.0, sign_a) * mask_a
    sign_b = jnp.sign(Rb.T @ n)
    sign_b = jnp.where(sign_b == 0.0, 1.0, sign_b) * mask_b
    ca = pos_a + Ra @ (sign_a * ha)  # midpoint of A's support edge
    cb = pos_b + Rb @ (sign_b * hb)
    da = Ra @ (eye[i_idx] * ha)  # half-edge vectors
    db = Rb @ (eye[j_idx] * hb)
    p_a, p_b = _closest_segment_points(ca - da, ca + da, cb - db, cb + db)
    point = 0.5 * (p_a + p_b)
    depth = jnp.where(all_overlap & edge_is_minimal, min_edge, -1.0)
    return point, n, depth


def box_box_contacts(geom_a, pos_a, quat_a, geom_b, pos_b, quat_b):
    """Box-box narrowphase: 16 corner-sample candidates + 1 SAT edge-edge
    candidate (17 fixed-size rows). Corner sampling is exact for the
    face-on-face resting/stacking configurations that dominate manipulation
    workloads (cube stacking, factory assembly); the SAT candidate
    (_box_edge_contact) catches edge-minimal penetrations in the same
    substep instead of one substep late. Replaces PhysX's SAT/GJK box pair
    (reference relies on PhysX narrowphase, SURVEY.md §2.10) with a
    branch-free candidate set that vmaps cleanly.

    Returns lists of (point, normal_b_to_a, depth) — corners of A vs B keep
    the outward normal of B (already b->a); corners of B vs A are flipped.
    """
    d = pos_a - pos_b
    w_ab = d / jnp.maximum(jnp.linalg.norm(d), 1e-9)  # from B toward A
    out = []
    for p in _box_corners(geom_a, pos_a, quat_a):
        point, normal, depth = _point_vs_box(p, geom_b, pos_b, quat_b, w_ab)
        out.append((point, normal, depth))
    for p in _box_corners(geom_b, pos_b, quat_b):
        point, normal, depth = _point_vs_box(p, geom_a, pos_a, quat_a, -w_ab)
        out.append((point, -normal, depth))
    out.append(_box_edge_contact(geom_a, pos_a, quat_a, geom_b, pos_b, quat_b))
    return out


def capsule_capsule_contacts(geom_a, pos_a, quat_a, geom_b, pos_b, quat_b):
    """Capsule-capsule narrowphase with a 2-point parallel manifold.

    Non-parallel axes: one closest-point contact (+ one masked slot).
    Near-parallel axes (gripper pads along a grasped peg): TWO contacts at
    the ends of the axis-overlap interval — a single mid-overlap point
    leaves the grasped body free to pivot about the contact line (no
    friction lever arm), so grasps wobble; the two-point couple rigidifies
    rotation exactly like PhysX's patch manifolds.
    """

    def seg(geom, pos, quat):
        axis = math_utils.quat_apply(quat, jnp.array([0.0, 0.0, 1.0]))
        hl = geom.size[1]
        return pos - axis * hl, pos + axis * hl, geom.size[0]

    a0, a1, ra = seg(geom_a, pos_a, quat_a)
    b0, b1, rb = seg(geom_b, pos_b, quat_b)
    d1 = a1 - a0
    d2 = b1 - b0
    r = a0 - b0
    a = jnp.dot(d1, d1)
    e = jnp.dot(d2, d2)
    b = jnp.dot(d1, d2)
    c = jnp.dot(d1, r)
    denom = a * e - b * b
    # ~10-degree parallel band (see _closest_segment_points)
    parallel = denom <= 0.03 * jnp.maximum(a * e, 1e-12)

    def contact_at(s):
        p_a = a0 + d1 * s
        t = jnp.clip(
            (b * s + jnp.dot(d2, r)) / jnp.maximum(e, 1e-12), 0.0, 1.0
        )
        p_b = b0 + d2 * t
        delta = p_a - p_b
        dist = jnp.linalg.norm(delta)
        normal = delta / jnp.maximum(dist, 1e-9)
        depth = (ra + rb) - dist
        point = p_b + normal * (rb - depth * 0.5)
        return point, normal, depth

    # parallel overlap interval in A's param
    p0 = -c / jnp.maximum(a, 1e-12)
    p1 = (b - c) / jnp.maximum(a, 1e-12)
    lo = jnp.clip(jnp.minimum(p0, p1), 0.0, 1.0)
    hi = jnp.clip(jnp.maximum(p0, p1), 0.0, 1.0)
    # generic closest point for the non-parallel case
    p_a_gen, p_b_gen = _closest_segment_points(a0, a1, b0, b1)
    s_gen = jnp.dot(p_a_gen - a0, d1) / jnp.maximum(a, 1e-12)

    s_first = jnp.where(parallel, lo, s_gen)
    pt1, n1, dep1 = contact_at(s_first)
    pt2, n2, dep2 = contact_at(hi)
    # second slot only participates for parallel overlapping axes
    dep2 = jnp.where(parallel & (hi > lo), dep2, -1.0)
    return [(pt1, n1, dep1), (pt2, n2, dep2)]


_CAPSULE_LIKE = (GEOM_CAPSULE, GEOM_CYLINDER)


def _has_sdf(geom) -> bool:
    return geom.gtype == GEOM_MESH and geom.mesh.sdf is not None


def _sample_points_local(geom) -> np.ndarray:
    """Local-frame surface sample points of the QUERY side of an SDF pair."""
    from .sdf import primitive_surface_points

    if geom.gtype == GEOM_MESH:
        return geom.mesh.surface_points
    return primitive_surface_points(geom)


def _sdf_pair_orientation(geom_a, geom_b):
    """(query_geom, sdf_geom, flip) — the SDF side is the one WITH a
    precomputed grid; when both carry one, B is the SDF (by convention the
    fixed asset is listed second in scene pair order)."""
    if _has_sdf(geom_b):
        return geom_a, geom_b, False
    return geom_b, geom_a, True


def num_pair_contacts(geom_a, geom_b) -> int:
    """Static contact-candidate count for a geom pair."""
    if _has_sdf(geom_a) or _has_sdf(geom_b):
        q, _s, _f = _sdf_pair_orientation(geom_a, geom_b)
        return _sample_points_local(q).shape[0]
    if geom_a.gtype == GEOM_MESH or geom_b.gtype == GEOM_MESH:
        # SDF-less mesh vs primitive: mesh surface points vs the primitive
        m = geom_a if geom_a.gtype == GEOM_MESH else geom_b
        return m.mesh.surface_points.shape[0]
    if geom_a.gtype == GEOM_BOX and geom_b.gtype == GEOM_BOX:
        return 17
    if geom_a.gtype in _CAPSULE_LIKE and geom_b.gtype in _CAPSULE_LIKE:
        return 2
    return 1


def mesh_points_vs_primitive_contacts(
    geom_a, pos_a, quat_a, geom_b, pos_b, quat_b
):
    """SDF-less mesh vs primitive narrowphase: the mesh's surface sample
    points tested against the primitive's analytic surface (box closest-
    point / swept-sphere segment). Covers e.g. a held factory nut (mesh,
    query-side only) resting on the fixed asset's base plate."""
    if geom_a.gtype == GEOM_MESH:
        mg, m_pos, m_quat = geom_a, pos_a, quat_a
        pg, p_pos, p_quat = geom_b, pos_b, quat_b
        flip = False  # primitive is B: outward normals are already b->a
    else:
        mg, m_pos, m_quat = geom_b, pos_b, quat_b
        pg, p_pos, p_quat = geom_a, pos_a, quat_a
        flip = True
    local = jnp.asarray(mg.mesh.surface_points)  # (k, 3)
    k = local.shape[0]
    pts = m_pos[None, :] + math_utils.quat_apply(
        jnp.broadcast_to(m_quat, (k, 4)), local
    )
    out = []
    if pg.gtype == GEOM_BOX:
        d = m_pos - p_pos
        w = d / jnp.maximum(jnp.linalg.norm(d), 1e-9)
        for i in range(k):
            point, normal, depth = _point_vs_box(pts[i], pg, p_pos, p_quat, w)
            out.append((point, -normal if flip else normal, depth))
        return out
    # sphere/capsule/cylinder: swept-sphere segment
    if pg.gtype == GEOM_SPHERE:
        s0 = s1 = p_pos
        r = pg.size[0]
    else:
        axis = math_utils.quat_apply(p_quat, jnp.array([0.0, 0.0, 1.0]))
        hl = pg.size[1]
        s0, s1 = p_pos - axis * hl, p_pos + axis * hl
        r = pg.size[0]
    for i in range(k):
        cp = _closest_point_on_segment(s0, s1, pts[i])
        delta = pts[i] - cp
        dist = jnp.linalg.norm(delta)
        normal = delta / jnp.maximum(dist, 1e-9)
        depth = r - dist
        out.append((pts[i], -normal if flip else normal, depth))
    return out


def mesh_sdf_contacts(geom_a, pos_a, quat_a, geom_b, pos_b, quat_b):
    """Point-vs-SDF narrowphase for pairs where one geom carries a mesh SDF
    (reference factory SDF collision, PhysX SDF contact gen). The query
    geom's surface sample points are transformed into the SDF frame; each
    fetch yields depth (-sdf) and normal (SDF gradient, outward from the
    SDF mesh — i.e. b->a when B owns the SDF)."""
    q_geom, s_geom, flip = _sdf_pair_orientation(geom_a, geom_b)
    if flip:
        q_pos, q_quat, s_pos, s_quat = pos_b, quat_b, pos_a, quat_a
    else:
        q_pos, q_quat, s_pos, s_quat = pos_a, quat_a, pos_b, quat_b
    local = jnp.asarray(_sample_points_local(q_geom))  # (k, 3)
    k = local.shape[0]
    pts_w = q_pos[None, :] + math_utils.quat_apply(
        jnp.broadcast_to(q_quat, (k, 4)), local
    )
    pts_s = math_utils.quat_apply_inverse(
        jnp.broadcast_to(s_quat, (k, 4)), pts_w - s_pos[None, :]
    )
    dist, grad = s_geom.mesh.sdf.sample(pts_s)
    normal_w = math_utils.quat_apply(jnp.broadcast_to(s_quat, (k, 4)), grad)
    if flip:  # SDF owner is A: gradient pushes B out -> a->b; flip to b->a
        normal_w = -normal_w
    depth = -dist
    return [(pts_w[i], normal_w[i], depth[i]) for i in range(k)]


def _pair_contact(geom_a, pos_a, quat_a, geom_b, pos_b, quat_b):
    """Single deepest contact between two convex primitives (sphere/capsule
    treated as swept spheres; box approximated by closest-point clamp)."""

    def seg(geom, pos, quat):
        if geom.gtype == GEOM_SPHERE:
            return pos, pos, geom.size[0]
        if geom.gtype in (GEOM_CAPSULE, GEOM_CYLINDER):
            axis = math_utils.quat_apply(quat, jnp.array([0.0, 0.0, 1.0]))
            hl = geom.size[1]
            return pos - axis * hl, pos + axis * hl, geom.size[0]
        return None

    sa, sb = seg(geom_a, pos_a, quat_a), seg(geom_b, pos_b, quat_b)
    if sa is not None and sb is not None:
        p_a, p_b = _closest_segment_points(sa[0], sa[1], sb[0], sb[1])
        ra, rb = sa[2], sb[2]
        delta = p_a - p_b
        dist = jnp.linalg.norm(delta)
        normal = delta / jnp.maximum(dist, 1e-9)  # points from b to a
        depth = (ra + rb) - dist
        point = p_b + normal * (rb - depth * 0.5)
        return point, normal, depth
    # sphere/capsule vs box: clamp segment midpoint-projected closest point
    if geom_b.gtype == GEOM_BOX and sa is not None:
        return _sphere_like_vs_box(sa, geom_b, pos_b, quat_b)
    if geom_a.gtype == GEOM_BOX and sb is not None:
        point, normal, depth = _sphere_like_vs_box(sb, geom_a, pos_a, quat_a)
        return point, -normal, depth
    raise NotImplementedError(
        f"pair contact {geom_a.gtype} vs {geom_b.gtype} not supported"
    )


def _sphere_like_vs_box(seg, box, box_pos, box_quat):
    """Capsule/sphere segment vs box: closest point on box to the segment's
    closest point (two-pass clamp; exact for spheres, good approx for capsules)."""
    half = jnp.asarray(box.size)
    # work in box frame
    a = math_utils.quat_apply_inverse(box_quat, seg[0] - box_pos)
    b = math_utils.quat_apply_inverse(box_quat, seg[1] - box_pos)
    r = seg[2]
    # closest point on segment to box center, then clamp to box
    mid = _closest_point_on_segment(a, b, jnp.zeros(3))
    clamped = jnp.clip(mid, -half, half)
    p_seg = _closest_point_on_segment(a, b, clamped)
    clamped = jnp.clip(p_seg, -half, half)
    delta = p_seg - clamped
    dist = jnp.linalg.norm(delta)
    inside = dist < 1e-9
    # if center inside box, push out along minimal axis
    face_dist = half - jnp.abs(p_seg)
    k = jnp.argmin(face_dist)
    sign = jnp.sign(p_seg)[k]
    n_inside = jnp.zeros(3).at[k].set(jnp.where(sign == 0, 1.0, sign))
    depth_inside = r + face_dist[k]
    n_outside = delta / jnp.maximum(dist, 1e-9)
    depth_outside = r - dist
    normal_box = jnp.where(inside, n_inside, n_outside)
    depth = jnp.where(inside, depth_inside, depth_outside)
    normal = math_utils.quat_apply(box_quat, normal_box)
    point = math_utils.quat_apply(box_quat, clamped) + box_pos
    return point, normal, depth


def _closest_point_on_segment(a, b, p):
    ab = b - a
    t = jnp.dot(p - a, ab) / jnp.maximum(jnp.dot(ab, ab), 1e-12)
    return a + jnp.clip(t, 0.0, 1.0) * ab


def _closest_segment_points(a0, a1, b0, b1):
    """Closest points between two segments (standard clamped solve).

    Near-parallel segments get special handling: the generic solve's
    ``s=0`` fallback pairs an ENDPOINT of A with B's interior, which for two
    parallel capsules (e.g. gripper fingertip pads along a grasped peg)
    yields a diagonal contact normal instead of the true lateral one — the
    pinch then has no closing component and grasps silently fail. Instead,
    project B onto A's axis and take the midpoint of the overlap interval.
    """
    d1 = a1 - a0
    d2 = b1 - b0
    r = a0 - b0
    a = jnp.dot(d1, d1)
    e = jnp.dot(d2, d2)
    f = jnp.dot(d2, r)
    c = jnp.dot(d1, r)
    b = jnp.dot(d1, d2)
    denom = a * e - b * b
    # "parallel" within ~10 deg: denom/(a e) = sin^2(theta); gripper pads on
    # a grasped shaft sit a few degrees off-axis whenever the arm sags
    parallel = denom <= 0.03 * jnp.maximum(a * e, 1e-12)
    s_gen = jnp.where(
        denom > 1e-12,
        jnp.clip((b * f - c * e) / jnp.maximum(denom, 1e-12), 0.0, 1.0),
        0.0,
    )
    # parallel: overlap interval of B's endpoints projected on A (param s)
    p0 = -c / jnp.maximum(a, 1e-12)  # proj of b0
    p1 = (b - c) / jnp.maximum(a, 1e-12)  # proj of b1
    lo = jnp.clip(jnp.minimum(p0, p1), 0.0, 1.0)
    hi = jnp.clip(jnp.maximum(p0, p1), 0.0, 1.0)
    s_par = 0.5 * (lo + hi)
    s = jnp.where(parallel, s_par, s_gen)
    t = (b * s + f) / jnp.maximum(e, 1e-12)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.clip(
        jnp.where(
            (~parallel) & (jnp.abs(t - t_cl) > 0),
            (b * t_cl - c) / jnp.maximum(a, 1e-12),
            s,
        ),
        0.0,
        1.0,
    )
    return a0 + d1 * s, b0 + d2 * t_cl


def _geom_bounding_radius(geom) -> float:
    """Conservative radius of the geom about its own frame origin."""
    s = [float(v) for v in geom.size]
    if geom.gtype == GEOM_SPHERE:
        return s[0]
    if geom.gtype in (GEOM_CAPSULE, GEOM_CYLINDER):
        return s[0] + s[1]
    if geom.gtype == GEOM_BOX:
        return float(np.linalg.norm(s))
    if geom.gtype == GEOM_MESH:
        return float(geom.mesh.bound_radius)
    return float(np.linalg.norm(s))  # conservative default


def geom_min_z_bound(model: RobotModel, geom) -> float:
    """Conservative lower bound on the geom's reachable world z.

    Climbs the kinematic chain from the geom's body to its subtree root,
    treating every rotational joint as free to point its child subtree in any
    direction (so offsets accumulate as radii). A FREE root (floating base)
    or an unlimited prismatic joint makes everything reachable (-inf). Used
    to statically prune terrain-contact candidates for geoms that can NEVER
    reach the ground — e.g. a table-mounted Shadow hand's finger geoms
    (PhysX's broadphase culls these per-step; our static plan culls them
    at build time, which is strictly better on TPU: the rows never exist).
    """
    from .model import JOINT_FIXED, JOINT_FREE, JOINT_PRISMATIC

    # body -> articulated-dof index (prismatic travel bounds)
    dof_of_body = {int(b): i for i, b in enumerate(model.dof_body)}

    slack = float(np.linalg.norm(np.asarray(geom.pos, dtype=np.float64)))
    slack += _geom_bounding_radius(geom)
    b = int(geom.body)
    while True:
        jt = int(model.jnt_type[b])
        parent = int(model.parent[b])
        if jt == JOINT_FREE:
            return -np.inf
        if jt == JOINT_PRISMATIC:
            d = dof_of_body.get(b)
            lo = float(model.dof_limit_lower[d]) if d is not None else -np.inf
            hi = float(model.dof_limit_upper[d]) if d is not None else np.inf
            travel = max(abs(lo), abs(hi))
            if not np.isfinite(travel) or travel > 1e8:
                return -np.inf
            slack += travel
        if parent < 0:
            # root: its joint frame z is exact (fixed-base world pose lands
            # in jnt_pos via _apply_fixed_base_pose); body_pos may rotate
            root_z = float(model.jnt_pos[b][2])
            if jt != JOINT_FIXED:
                # revolute/prismatic root: frame orientation still exact,
                # but the child body offset can swing
                slack += float(np.linalg.norm(model.body_pos[b]))
                return root_z - slack
            slack += float(np.linalg.norm(model.body_pos[b]))
            return root_z - slack
        slack += float(np.linalg.norm(model.jnt_pos[b])) + float(
            np.linalg.norm(model.body_pos[b])
        )
        b = parent


class CollisionPlan:
    """Static collision plan for one model + terrain config.

    Host-built once at env-construction time: enumerates ground candidates per
    geom and the explicit geom-geom pair list; total contact count is static.

    ``ground_z_max``: when given, terrain-contact candidates are statically
    pruned for geoms whose conservative reachability bound
    (:func:`geom_min_z_bound`) stays above it — fixed-base arms/hands
    mounted above the ground lose their phantom ground rows (for the Shadow
    repose scene this cuts the constraint-row count ~40%).
    """

    def __init__(self, model: RobotModel, pairs=None, with_ground: bool = True,
                 ground_z_max: float | None = None,
                 with_overhang: bool = False):
        self.model = model
        self.with_ground = with_ground
        # overhang slab contacts (HeightField.slab — reference floating_ring
        # trimesh terrain): every ground probe doubles as a slab probe
        # (walk ON the ring top, bump INTO its underside)
        self.with_overhang = with_overhang and with_ground
        self.pairs = [
            (ga, gb) for ga, gb in (pairs or []) if ga.collidable and gb.collidable
        ]
        self.ground_geoms = (
            [g for g in model.geoms if g.collidable] if with_ground else []
        )
        if with_ground and ground_z_max is not None:
            margin = 0.02
            self.ground_geoms = [
                g for g in self.ground_geoms
                if geom_min_z_bound(model, g) <= ground_z_max + margin
            ]
        n_ground = sum(num_ground_candidates(g) for g in self.ground_geoms)
        self.ncon = (
            n_ground * (2 if self.with_overhang else 1)
            + sum(num_pair_contacts(ga, gb) for ga, gb in self.pairs)
        )

    def candidate_geoms(self):
        """Per-candidate (geom_a, geom_b | None) in detect()'s emission
        order (ground candidates first, then pairs) — lets callers build
        per-env candidate masks (sim/spawners.py multi-asset selection)."""
        out = []
        for g in self.ground_geoms:
            out += [(g, None)] * num_ground_candidates(g)
        if self.with_overhang:
            for g in self.ground_geoms:
                out += [(g, None)] * num_ground_candidates(g)
        for ga, gb in self.pairs:
            out += [(ga, gb)] * num_pair_contacts(ga, gb)
        return out

    def static_bodies(self):
        """Static (body_a, body_b) index arrays in detect()'s emission order
        (used by the batch-level step to reattach static metadata to the
        vmapped dynamic contact fields)."""
        body_a, body_b = [], []
        for g in self.ground_geoms:
            k = num_ground_candidates(g)
            body_a += [g.body] * k
            body_b += [-1] * k
        if self.with_overhang:
            for g in self.ground_geoms:
                k = num_ground_candidates(g)
                body_a += [g.body] * k
                body_b += [-1] * k
        for ga, gb in self.pairs:
            k = num_pair_contacts(ga, gb)
            body_a += [ga.body] * k
            body_b += [gb.body] * k
        return (
            np.asarray(body_a, dtype=np.int32),
            np.asarray(body_b, dtype=np.int32),
        )

    def detect(self, kin: Kinematics, terrain=None, terrain_offset=None) -> Contacts:
        """Compute all candidate contacts for one env instance.

        ``terrain_offset``: (3,) per-env terrain-cell shift — queries sample
        ``H(xy + off_xy) - off_z`` so envs stay near the origin while living
        on different cells of a shared height field.
        """
        pos_list, nrm_list, depth_list = [], [], []
        body_a, body_b, fric, rest = [], [], [], []

        for g in self.ground_geoms:
            gp, gq = _geom_world_pose(kin, g)
            probes, radii = _ground_candidates_for_geom(g, gp, gq, terrain)
            if terrain is not None and terrain_offset is not None:
                h, n = _terrain_height_normal(
                    terrain, probes[..., :2] + terrain_offset[:2]
                )
                h = h - terrain_offset[2]
            else:
                h, n = _terrain_height_normal(terrain, probes[..., :2])
            # signed distance of probe center above the surface, measured along
            # the surface normal (vertical-gap * n_z approximation, exact for
            # flat ground): depth > 0 means the swept sphere penetrates.
            depth = radii - (probes[..., 2] - h) * n[..., 2]
            point = probes - n * radii[..., None]
            for k in range(probes.shape[0]):
                pos_list.append(point[k])
                nrm_list.append(n[k])
                depth_list.append(depth[k])
                body_a.append(g.body)
                body_b.append(-1)
                fric.append(g.friction)
                rest.append(g.restitution)

        if self.with_overhang:
            # overhang slab contacts: probe sphere vs the [z_lo, z_hi]
            # interval — from below the underside pushes DOWN, from above
            # the slab top is walkable (flat-top/flat-bottom approximation,
            # exact for the floating-ring geometry)
            has_slab = terrain is not None and terrain.slab is not None
            for g in self.ground_geoms:
                gp, gq = _geom_world_pose(kin, g)
                probes, radii = _ground_candidates_for_geom(g, gp, gq, terrain)
                if has_slab:
                    xy = probes[..., :2]
                    off_z = 0.0
                    if terrain_offset is not None:
                        xy = xy + terrain_offset[:2]
                        off_z = terrain_offset[2]
                    z_lo, z_hi = terrain.sample_slab(xy)
                    z_lo = z_lo - off_z
                    z_hi = z_hi - off_z
                    pz = probes[..., 2]
                    below = pz < 0.5 * (z_lo + z_hi)
                    depth = jnp.where(
                        below, pz + radii - z_lo, z_hi - (pz - radii)
                    )
                    nz = jnp.where(below, -1.0, 1.0)
                else:
                    depth = jnp.full(probes.shape[:-1], -1.0)
                    nz = jnp.ones(probes.shape[:-1])
                zero = jnp.zeros(probes.shape[:-1])
                nvec = jnp.stack([zero, zero, nz], axis=-1)
                point = probes - nvec * radii[..., None]
                for k in range(probes.shape[0]):
                    pos_list.append(point[k])
                    nrm_list.append(nvec[k])
                    depth_list.append(depth[k])
                    body_a.append(g.body)
                    body_b.append(-1)
                    fric.append(g.friction)
                    rest.append(g.restitution)

        for ga, gb in self.pairs:
            pa, qa = _geom_world_pose(kin, ga)
            pb, qb = _geom_world_pose(kin, gb)
            if _has_sdf(ga) or _has_sdf(gb):
                hits = mesh_sdf_contacts(ga, pa, qa, gb, pb, qb)
            elif ga.gtype == GEOM_MESH or gb.gtype == GEOM_MESH:
                hits = mesh_points_vs_primitive_contacts(ga, pa, qa, gb, pb, qb)
            elif ga.gtype == GEOM_BOX and gb.gtype == GEOM_BOX:
                hits = box_box_contacts(ga, pa, qa, gb, pb, qb)
            elif ga.gtype in _CAPSULE_LIKE and gb.gtype in _CAPSULE_LIKE:
                hits = capsule_capsule_contacts(ga, pa, qa, gb, pb, qb)
            else:
                hits = [_pair_contact(ga, pa, qa, gb, pb, qb)]
            for point, normal, depth in hits:
                pos_list.append(point)
                nrm_list.append(normal)
                depth_list.append(depth)
                body_a.append(ga.body)
                body_b.append(gb.body)
                fric.append(0.5 * (ga.friction + gb.friction))
                rest.append(max(ga.restitution, gb.restitution))

        if not pos_list:
            return Contacts(
                pos=jnp.zeros((0, 3)),
                normal=jnp.zeros((0, 3)),
                depth=jnp.zeros((0,)),
                body_a=np.zeros(0, dtype=np.int32),
                body_b=np.zeros(0, dtype=np.int32),
                friction=jnp.zeros((0,)),
                restitution=jnp.zeros((0,)),
            )
        return Contacts(
            pos=jnp.stack(pos_list),
            normal=jnp.stack(nrm_list),
            depth=jnp.stack(depth_list),
            body_a=np.asarray(body_a, dtype=np.int32),
            body_b=np.asarray(body_b, dtype=np.int32),
            friction=jnp.asarray(fric),
            restitution=jnp.asarray(rest),
        )
