"""Batched math utilities on jax.numpy.

TPU-native re-implementation of the reference math library
(``/root/reference/source/isaaclab/isaaclab/utils/math.py``): same function
names and conventions (quaternions are (w, x, y, z); all ops broadcast over
leading batch dimensions) but written as pure jnp functions that trace cleanly
under ``jit``/``vmap`` — no in-place mutation, no data-dependent branching.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# -----------------------------------------------------------------------------
# Scaling / clipping (reference math.py:23-93)
# -----------------------------------------------------------------------------


def scale_transform(x, lower, upper):
    """Normalize ``x`` in [lower, upper] to [-1, 1]."""
    offset = (lower + upper) * 0.5
    return 2.0 * (x - offset) / (upper - lower)


def unscale_transform(x, lower, upper):
    """De-normalize ``x`` in [-1, 1] to [lower, upper]."""
    offset = (lower + upper) * 0.5
    return x * (upper - lower) * 0.5 + offset


def saturate(x, lower, upper):
    """Clamp ``x`` to [lower, upper]."""
    return jnp.clip(x, lower, upper)


def normalize(x, eps: float = 1e-9):
    """Normalize along the last axis with epsilon clamping."""
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(norm, eps)


def wrap_to_pi(angles):
    """Wrap angles to (-pi, pi]. Reference math.py:96-118."""
    wrapped = jnp.mod(angles + jnp.pi, 2.0 * jnp.pi)
    wrapped = jnp.where(wrapped < 0.0, wrapped + 2.0 * jnp.pi, wrapped)
    return wrapped - jnp.pi


def copysign(mag: float, other):
    """|mag| with the sign of ``other`` elementwise (reference math.py:121)."""
    return jnp.copysign(jnp.abs(jnp.asarray(mag, dtype=other.dtype)), other)


# -----------------------------------------------------------------------------
# Rotation conversions (reference math.py:144-460)
# -----------------------------------------------------------------------------


def convert_quat(quat, to: str = "xyzw"):
    """Reorder quaternion layout between wxyz and xyzw (reference math.py:177)."""
    if to not in ("xyzw", "wxyz"):
        raise ValueError(f"Invalid quaternion convention: {to}")
    if to == "xyzw":  # input is wxyz
        return jnp.concatenate([quat[..., 1:4], quat[..., 0:1]], axis=-1)
    return jnp.concatenate([quat[..., 3:4], quat[..., 0:3]], axis=-1)


def quat_conjugate(q):
    """Conjugate of quaternion(s) (w, x, y, z)."""
    return jnp.concatenate([q[..., 0:1], -q[..., 1:4]], axis=-1)


def quat_inv(q):
    """Inverse (conjugate / squared norm) of quaternion(s)."""
    return quat_conjugate(q) / jnp.maximum(
        jnp.sum(q * q, axis=-1, keepdims=True), 1e-9
    )


def quat_unique(q):
    """Standardize quaternion sign so w >= 0 (reference math.py:448)."""
    return jnp.where(q[..., 0:1] < 0, -q, q)


def quat_mul(q1, q2):
    """Hamilton product of two (w, x, y, z) quaternions (reference math.py:464)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_apply(quat, vec):
    """Rotate vector(s) by quaternion(s); fast cross-product form
    (reference math.py:546)."""
    xyz = quat[..., 1:4]
    w = quat[..., 0:1]
    t = 2.0 * jnp.cross(xyz, vec)
    return vec + w * t + jnp.cross(xyz, t)


# Aliases kept for reference-API parity (math.py:583,606).
def quat_rotate(q, v):
    """Rotate vector ``v`` by quaternion ``q``."""
    return quat_apply(q, v)


def quat_apply_inverse(quat, vec):
    """Rotate vector(s) by the inverse of unit quaternion(s)."""
    return quat_apply(quat_conjugate(quat), vec)


def quat_rotate_inverse(q, v):
    """Rotate vector ``v`` by the conjugate of quaternion ``q``."""
    return quat_apply_inverse(q, v)


def yaw_quat(quat):
    """Extract the yaw-only component of quaternion(s) (reference math.py:522)."""
    qw, qx, qy, qz = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    yaw = jnp.arctan2(2.0 * (qw * qz + qx * qy), 1.0 - 2.0 * (qy * qy + qz * qz))
    half = yaw * 0.5
    zeros = jnp.zeros_like(half)
    return jnp.stack([jnp.cos(half), zeros, zeros, jnp.sin(half)], axis=-1)


def quat_apply_yaw(quat, vec):
    """Rotate vector(s) by only the yaw of quaternion(s) (reference math.py:568)."""
    return quat_apply(yaw_quat(quat), vec)


def matrix_from_quat(quaternions):
    """Rotation matrices from (w, x, y, z) quaternions (reference math.py:144)."""
    w, x, y, z = (
        quaternions[..., 0],
        quaternions[..., 1],
        quaternions[..., 2],
        quaternions[..., 3],
    )
    two_s = 2.0 / jnp.maximum(jnp.sum(quaternions * quaternions, axis=-1), 1e-12)
    o = jnp.stack(
        [
            1 - two_s * (y * y + z * z),
            two_s * (x * y - z * w),
            two_s * (x * z + y * w),
            two_s * (x * y + z * w),
            1 - two_s * (x * x + z * z),
            two_s * (y * z - x * w),
            two_s * (x * z - y * w),
            two_s * (y * z + x * w),
            1 - two_s * (x * x + y * y),
        ],
        axis=-1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def _sqrt_positive_part(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def quat_from_matrix(matrix):
    """Quaternion (w, x, y, z) from rotation matrices (reference math.py:295).

    Branch-free variant of the Shepperd method: compute all four candidate
    quaternions and select the best-conditioned one with ``where`` masks.
    """
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    q_abs = jnp.stack(
        [
            _sqrt_positive_part(1.0 + m00 + m11 + m22),
            _sqrt_positive_part(1.0 + m00 - m11 - m22),
            _sqrt_positive_part(1.0 - m00 + m11 - m22),
            _sqrt_positive_part(1.0 - m00 - m11 + m22),
        ],
        axis=-1,
    )
    quat_by_w = jnp.stack(
        [q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1
    )
    quat_by_x = jnp.stack(
        [m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1
    )
    quat_by_y = jnp.stack(
        [m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1
    )
    quat_by_z = jnp.stack(
        [m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1
    )
    candidates = jnp.stack([quat_by_w, quat_by_x, quat_by_y, quat_by_z], axis=-2)
    denom = 2.0 * jnp.maximum(q_abs, 0.1)
    candidates = candidates / denom[..., None]
    best = jnp.argmax(q_abs, axis=-1)
    out = jnp.take_along_axis(
        candidates, best[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    return normalize(out)


def quat_from_euler_xyz(roll, pitch, yaw):
    """Quaternion from intrinsic XYZ euler angles (reference math.py:252)."""
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    return jnp.stack(
        [
            cy * cr * cp + sy * sr * sp,
            cy * sr * cp - sy * cr * sp,
            cy * cr * sp + sy * sr * cp,
            sy * cr * cp - cy * sr * sp,
        ],
        axis=-1,
    )


def euler_xyz_from_quat(quat, wrap_to_2pi: bool = False):
    """Roll, pitch, yaw from quaternion(s) (reference math.py:414)."""
    qw, qx, qy, qz = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    sin_roll = 2.0 * (qw * qx + qy * qz)
    cos_roll = 1.0 - 2.0 * (qx * qx + qy * qy)
    roll = jnp.arctan2(sin_roll, cos_roll)

    sin_pitch = 2.0 * (qw * qy - qz * qx)
    pitch = jnp.where(
        jnp.abs(sin_pitch) >= 1.0,
        copysign(jnp.pi / 2.0, sin_pitch),
        jnp.arcsin(jnp.clip(sin_pitch, -1.0, 1.0)),
    )

    sin_yaw = 2.0 * (qw * qz + qx * qy)
    cos_yaw = 1.0 - 2.0 * (qy * qy + qz * qz)
    yaw = jnp.arctan2(sin_yaw, cos_yaw)
    if wrap_to_2pi:
        return (
            jnp.mod(roll, 2 * jnp.pi),
            jnp.mod(pitch, 2 * jnp.pi),
            jnp.mod(yaw, 2 * jnp.pi),
        )
    return roll, pitch, yaw


def _axis_angle_rotation(axis: str, angle):
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
    elif axis == "Y":
        flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
    elif axis == "Z":
        flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
    else:
        raise ValueError("axis must be X, Y or Z")
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def matrix_from_euler(euler_angles, convention: str):
    """Rotation matrices from euler angles in a given convention
    (reference math.py:383)."""
    matrices = [
        _axis_angle_rotation(c, euler_angles[..., i])
        for i, c in enumerate(convention)
    ]
    return matrices[0] @ matrices[1] @ matrices[2]


def quat_from_angle_axis(angle, axis):
    """Quaternion from rotation angle about a (unit) axis (reference math.py:629)."""
    theta = (angle / 2.0)[..., None]
    xyz = normalize(axis) * jnp.sin(theta)
    w = jnp.cos(theta)
    return normalize(jnp.concatenate([w, xyz], axis=-1))


def axis_angle_from_quat(quat, eps: float = 1.0e-6):
    """Axis-angle (3-vector, angle*axis) from quaternion (reference math.py:646).

    Taylor-expanded near zero rotation for numerical stability under autodiff.
    """
    quat = quat_unique(quat)
    xyz = quat[..., 1:4]
    w = quat[..., 0]
    mag = jnp.linalg.norm(xyz, axis=-1)
    half_angle = jnp.arctan2(mag, w)
    # axis_angle = 2 * half_angle * xyz / sin(half_angle); sin(half) == mag for
    # unit quats. Near identity, half_angle/mag -> 1/w (Taylor-safe branch).
    big = mag > eps
    scale = 2.0 * jnp.where(
        big, half_angle / jnp.where(big, mag, 1.0), 1.0 / jnp.maximum(w, eps)
    )
    return xyz * scale[..., None]


def quat_box_minus(q1, q2):
    """Box-minus: axis-angle of q1 * q2^-1 (reference math.py:503)."""
    quat_diff = quat_mul(q1, quat_conjugate(q2))
    return axis_angle_from_quat(quat_diff)


def quat_error_magnitude(q1, q2):
    """Rotation-angle magnitude between two quaternions (reference math.py:678)."""
    return jnp.linalg.norm(quat_box_minus(q1, q2), axis=-1)


def skew_symmetric_matrix(vec):
    """3x3 skew-symmetric (cross-product) matrices (reference math.py:693)."""
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    zero = jnp.zeros_like(x)
    flat = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return flat.reshape(vec.shape[:-1] + (3, 3))


def quat_slerp(q1, q2, tau):
    """Spherical linear interpolation between quaternions (reference math.py:1648)."""
    dot = jnp.sum(q1 * q2, axis=-1, keepdims=True)
    q2 = jnp.where(dot < 0, -q2, q2)
    dot = jnp.abs(dot)
    # Fall back to lerp when nearly parallel.
    safe_dot = jnp.clip(dot, -1.0, 1.0 - 1e-7)
    theta = jnp.arccos(safe_dot)
    sin_theta = jnp.sin(theta)
    w1 = jnp.sin((1.0 - tau) * theta) / sin_theta
    w2 = jnp.sin(tau * theta) / sin_theta
    lerp = normalize(q1 * (1.0 - tau) + q2 * tau)
    slerp = normalize(q1 * w1 + q2 * w2)
    return jnp.where(dot > 1.0 - 1e-6, lerp, slerp)


# -----------------------------------------------------------------------------
# Frame transforms (reference math.py:750-988)
# -----------------------------------------------------------------------------


def combine_frame_transforms(t01, q01, t12=None, q12=None):
    """Compose transforms: frame 2 expressed in frame 0 (reference math.py:750)."""
    if q12 is not None:
        q02 = quat_mul(q01, q12)
    else:
        q02 = q01
    if t12 is not None:
        t02 = t01 + quat_apply(q01, t12)
    else:
        t02 = t01
    return t02, q02


def subtract_frame_transforms(t01, q01, t02=None, q02=None):
    """Relative transform: frame 2 w.r.t. frame 1 (reference math.py:785)."""
    q10 = quat_conjugate(q01)
    if q02 is not None:
        q12 = quat_mul(q10, q02)
    else:
        q12 = q10
    if t02 is not None:
        t12 = quat_apply(q10, t02 - t01)
    else:
        t12 = quat_apply(q10, -t01)
    return t12, q12


def compute_pose_error(t01, q01, t02, q02, rot_error_type: str = "axis_angle"):
    """Position and rotation error between two poses (reference math.py:820)."""
    pos_error = t02 - t01
    if rot_error_type == "quat":
        return pos_error, quat_mul(q02, quat_conjugate(q01))
    if rot_error_type == "axis_angle":
        return pos_error, quat_box_minus(q02, q01)
    raise ValueError(f"Unsupported rot_error_type: {rot_error_type}")


def apply_delta_pose(source_pos, source_rot, delta_pose, eps: float = 1.0e-6):
    """Apply a 6-DoF (dx, dy, dz, drx, dry, drz) delta (reference math.py:873)."""
    target_pos = source_pos + delta_pose[..., 0:3]
    rot_actions = delta_pose[..., 3:6]
    angle = jnp.linalg.norm(rot_actions, axis=-1)
    axis = rot_actions / jnp.maximum(angle[..., None], eps)
    rot_delta_quat = jnp.where(
        angle[..., None] > eps,
        quat_from_angle_axis(angle, axis),
        jnp.broadcast_to(
            jnp.array([1.0, 0.0, 0.0, 0.0], dtype=source_rot.dtype),
            source_rot.shape,
        ),
    )
    target_rot = quat_mul(rot_delta_quat, source_rot)
    return target_pos, target_rot


def transform_points(points, pos=None, quat=None):
    """Transform (..., N, 3) points into a target frame (reference math.py:914)."""
    out = points
    if quat is not None:
        out = quat_apply(quat[..., None, :], out)
    if pos is not None:
        out = out + pos[..., None, :]
    return out


def make_pose(pos, rot):
    """Build 4x4 homogeneous pose(s) from position + rotation matrix
    (reference math.py:1564)."""
    batch = pos.shape[:-1]
    pose = jnp.zeros(batch + (4, 4), dtype=pos.dtype)
    pose = pose.at[..., :3, :3].set(rot)
    pose = pose.at[..., :3, 3].set(pos)
    pose = pose.at[..., 3, 3].set(1.0)
    return pose


def unmake_pose(pose):
    """Split 4x4 pose into (pos, rot) (reference math.py:1585)."""
    return pose[..., :3, 3], pose[..., :3, :3]


def pose_inv(pose):
    """Invert 4x4 homogeneous pose(s) (reference math.py:1600)."""
    rot_t = jnp.swapaxes(pose[..., :3, :3], -1, -2)
    pos = -(rot_t @ pose[..., :3, 3:4])[..., 0]
    return make_pose(pos, rot_t)


def pose_in_A_to_pose_in_B(pose_in_A, pose_A_in_B):
    """Change-of-frame for 4x4 poses (reference math.py:1626)."""
    return pose_A_in_B @ pose_in_A


# -----------------------------------------------------------------------------
# Sampling (reference math.py:1234-1426) — PRNG-key threaded, not global-seeded
# -----------------------------------------------------------------------------


def default_orientation(num: int, dtype=jnp.float32):
    """Identity quaternions of shape (num, 4) (reference math.py:1234)."""
    quat = jnp.zeros((num, 4), dtype=dtype)
    return quat.at[:, 0].set(1.0)


def random_orientation(key, num: int):
    """Uniformly random unit quaternions (reference math.py:1251)."""
    k1, k2, k3 = jax.random.split(key, 3)
    u = jax.random.uniform(k1, (num,))
    v = jax.random.uniform(k2, (num,))
    w = jax.random.uniform(k3, (num,))
    s1, s2 = jnp.sqrt(1.0 - u), jnp.sqrt(u)
    return jnp.stack(
        [
            s2 * jnp.cos(2 * jnp.pi * w),
            s1 * jnp.sin(2 * jnp.pi * v),
            s1 * jnp.cos(2 * jnp.pi * v),
            s2 * jnp.sin(2 * jnp.pi * w),
        ],
        axis=-1,
    )


def random_yaw_orientation(key, num: int):
    """Random yaw-only quaternions (reference math.py:1271)."""
    yaw = jax.random.uniform(key, (num,), minval=-jnp.pi, maxval=jnp.pi)
    zeros = jnp.zeros_like(yaw)
    return quat_from_euler_xyz(zeros, zeros, yaw)


def sample_triangle(key, lower: float, upper: float, size):
    """Symmetric-triangle-distributed samples in [lower, upper]
    (reference math.py:1288)."""
    r = jax.random.uniform(key, size) * 2.0 - 1.0
    r = jnp.where(r < 0.0, -jnp.sqrt(-r), jnp.sqrt(r))
    r = (r + 1.0) / 2.0
    return (upper - lower) * r + lower


def sample_uniform(key, lower, upper, size):
    """Uniform samples in [lower, upper] (reference math.py:1313)."""
    if isinstance(size, int):
        size = (size,)
    return jax.random.uniform(key, size) * (jnp.asarray(upper) - jnp.asarray(lower)) + jnp.asarray(lower)


def sample_log_uniform(key, lower, upper, size):
    """Log-uniform samples (reference math.py:1334)."""
    return jnp.exp(
        sample_uniform(key, jnp.log(jnp.asarray(lower)), jnp.log(jnp.asarray(upper)), size)
    )


def sample_gaussian(key, mean, std, size):
    """Gaussian samples (reference math.py:1365)."""
    if isinstance(size, int):
        size = (size,)
    return jax.random.normal(key, size) * std + mean


def sample_cylinder(key, radius: float, h_range, size):
    """Uniform samples inside a cylinder (reference math.py:1387)."""
    if isinstance(size, int):
        size = (size,)
    kr, kt, kh = jax.random.split(key, 3)
    r = radius * jnp.sqrt(jax.random.uniform(kr, size))
    theta = 2 * jnp.pi * jax.random.uniform(kt, size)
    hmin, hmax = h_range
    z = jax.random.uniform(kh, size, minval=hmin, maxval=hmax)
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta), z], axis=-1)


# -----------------------------------------------------------------------------
# Projection / camera helpers (reference math.py:991-1231)
# -----------------------------------------------------------------------------


def unproject_depth(depth, intrinsics, is_ortho: bool = True):
    """Unproject a depth image to 3-D points in the camera frame
    (reference math.py:1083)."""
    h, w = depth.shape[-2], depth.shape[-1]
    v, u = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    fx, fy = intrinsics[..., 0, 0], intrinsics[..., 1, 1]
    cx, cy = intrinsics[..., 0, 2], intrinsics[..., 1, 2]
    if is_ortho:
        z = depth
    else:
        # distance-to-camera -> distance-to-plane
        x_n = (u - cx[..., None, None]) / fx[..., None, None]
        y_n = (v - cy[..., None, None]) / fy[..., None, None]
        z = depth / jnp.sqrt(1.0 + x_n**2 + y_n**2)
    x = (u - cx[..., None, None]) * z / fx[..., None, None]
    y = (v - cy[..., None, None]) * z / fy[..., None, None]
    return jnp.stack([x, y, z], axis=-1).reshape(depth.shape[:-2] + (h * w, 3))


def orthogonalize_perspective_depth(depth, intrinsics):
    """Convert perspective (distance-to-camera) depth to orthogonal
    (distance-to-plane) depth (reference math.py:991)."""
    h, w = depth.shape[-2], depth.shape[-1]
    v, u = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    fx, fy = intrinsics[..., 0, 0], intrinsics[..., 1, 1]
    cx, cy = intrinsics[..., 0, 2], intrinsics[..., 1, 2]
    x_n = (u - cx[..., None, None]) / fx[..., None, None]
    y_n = (v - cy[..., None, None]) / fy[..., None, None]
    return depth / jnp.sqrt(1.0 + x_n**2 + y_n**2)


def project_points(points, intrinsics):
    """Project 3-D camera-frame points to the image plane
    (reference math.py:1170)."""
    proj = jnp.einsum("...ij,...nj->...ni", intrinsics, points)
    return proj / jnp.maximum(proj[..., 2:3], 1e-9)


def create_rotation_matrix_from_view(eyes, targets, up_axis="Z"):
    """Camera look-at rotation matrices (reference math.py:1512)."""
    up = jnp.array([0.0, 0.0, 1.0]) if up_axis == "Z" else jnp.array([0.0, 1.0, 0.0])
    z_axis = normalize(targets - eyes)
    x_axis = normalize(jnp.cross(up, z_axis))
    # Handle degenerate case where view direction is parallel to up.
    degenerate = jnp.linalg.norm(jnp.cross(up, z_axis), axis=-1, keepdims=True) < 1e-6
    x_axis = jnp.where(degenerate, jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), x_axis.shape), x_axis)
    y_axis = normalize(jnp.cross(z_axis, x_axis))
    return jnp.stack([x_axis, y_axis, z_axis], axis=-2).swapaxes(-1, -2)


def is_identity_pose(pos, rot, tol: float = 1e-6) -> bool:
    """Host-side check whether (pos, quat) is the identity pose
    (reference math.py:728)."""
    import numpy as np

    pos = np.asarray(pos)
    rot = np.asarray(rot)
    ident = np.zeros_like(rot)
    ident[..., 0] = 1.0
    return bool(np.allclose(pos, 0.0, atol=tol) and np.allclose(rot, ident, atol=tol))


# -----------------------------------------------------------------------------
# Interpolation helpers (reference math.py:1684-1798)
# -----------------------------------------------------------------------------


def interpolate_rotations(q1, q2, num_steps: int):
    """Interpolated quaternions from q1 to q2 inclusive of endpoints."""
    taus = jnp.linspace(0.0, 1.0, num_steps)
    return jax.vmap(lambda t: quat_slerp(q1, q2, t))(taus)


def interpolate_poses(pos1, quat1, pos2, quat2, num_steps: int):
    """Linear position + slerp rotation interpolation (reference math.py:1736)."""
    taus = jnp.linspace(0.0, 1.0, num_steps)
    pos = jax.vmap(lambda t: pos1 * (1 - t) + pos2 * t)(taus)
    quat = jax.vmap(lambda t: quat_slerp(quat1, quat2, t))(taus)
    return pos, quat
