"""Spatial (6-D) vector algebra for articulated rigid-body dynamics.

The in-repo replacement for the PhysX articulation core (reference delegates to
the closed PhysX 5 SDK — see SURVEY.md §2.10). Featherstone conventions:
spatial motion vectors are ``(angular[3], linear[3])``, force vectors are
``(moment[3], force[3])``. A coordinate frame is an ``(R, p)`` pair: ``R`` is
the 3x3 rotation taking parent-frame coordinates to local-frame coordinates
and ``p`` is the frame origin expressed in the parent frame. All functions are
pure jnp over single instances; batching comes from ``vmap`` at the engine
level.
"""

from __future__ import annotations

import jax.numpy as jnp


def cross(a, b):
    return jnp.cross(a, b)


def skew(v):
    """3x3 cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], axis=-1
    ).reshape(v.shape[:-1] + (3, 3))


def motion_transform(R, p, v):
    """Transform a motion vector from frame A to frame B, where B has origin
    ``p`` (A coords) and orientation ``R`` (maps A coords -> B coords)."""
    ang, lin = v[..., :3], v[..., 3:]
    ang_b = (R @ ang[..., None])[..., 0]
    # linear part: velocity of the point coincident with B's origin
    lin_b = (R @ (lin + cross(ang, p))[..., None])[..., 0]
    return jnp.concatenate([ang_b, lin_b], axis=-1)


def motion_transform_inv(R, p, v):
    """Inverse of :func:`motion_transform` (B -> A)."""
    ang, lin = v[..., :3], v[..., 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    ang_a = (Rt @ ang[..., None])[..., 0]
    lin_a = (Rt @ lin[..., None])[..., 0] - cross(ang_a, p)
    return jnp.concatenate([ang_a, lin_a], axis=-1)


def force_transform(R, p, f):
    """Transform a force vector from frame A to frame B (same frame spec as
    :func:`motion_transform`)."""
    n, fl = f[..., :3], f[..., 3:]
    n_b = (R @ (n - cross(p, fl))[..., None])[..., 0]
    f_b = (R @ fl[..., None])[..., 0]
    return jnp.concatenate([n_b, f_b], axis=-1)


def force_transform_inv(R, p, f):
    """Inverse of :func:`force_transform` (B -> A)."""
    n, fl = f[..., :3], f[..., 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    f_a = (Rt @ fl[..., None])[..., 0]
    n_a = (Rt @ n[..., None])[..., 0] + cross(p, f_a)
    return jnp.concatenate([n_a, f_a], axis=-1)


def crm(v, u):
    """Spatial motion cross product: v x u (both motion vectors)."""
    w, vl = v[..., :3], v[..., 3:]
    uw, ul = u[..., :3], u[..., 3:]
    return jnp.concatenate(
        [cross(w, uw), cross(w, ul) + cross(vl, uw)], axis=-1
    )


def crf(v, f):
    """Spatial force cross product: v x* f (motion x force)."""
    w, vl = v[..., :3], v[..., 3:]
    n, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [cross(w, n) + cross(vl, fl), cross(w, fl)], axis=-1
    )


def spatial_inertia(mass, com, inertia_com):
    """6x6 spatial inertia about the body frame origin.

    ``inertia_com`` is the 3x3 rotational inertia about the COM in body
    coordinates; ``com`` the COM offset from the body origin.
    """
    C = skew(com)
    I3 = jnp.eye(3)
    top_left = inertia_com + mass * (C @ C.T)
    return jnp.block(
        [
            [top_left, mass * C],
            [mass * C.T, mass * I3],
        ]
    )


def inertia_transform_inv(R, p, I_b):
    """Express spatial inertia given in frame B back in frame A, where B is
    (R, p) relative to A: I_A = X_f^{-1} I_B X_m (the congruence transform)."""
    # X_m maps motion A->B; I_A = X_m^T I_B X_m for our (ang,lin) layout with
    # the force transform being the inverse-transpose of the motion transform.
    Xm = motion_matrix(R, p)
    return Xm.T @ I_b @ Xm


def motion_matrix(R, p):
    """6x6 matrix form of :func:`motion_transform`."""
    Z = jnp.zeros((3, 3))
    # (w, v) -> (Rw, R(v + w x p)) and R(w x p) = -R skew(p) w
    return jnp.block([[R, Z], [-R @ skew(p), R]])


def quat_exp_approx(omega_dt):
    """Unit quaternion (w,x,y,z) for a small rotation vector ``omega*dt``.

    Exact exponential map with Taylor-safe small-angle branch.
    """
    angle = jnp.linalg.norm(omega_dt, axis=-1, keepdims=True)
    half = 0.5 * angle
    small = angle < 1e-8
    sinc_half = jnp.where(
        small, 0.5 - angle * angle / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angle)
    )
    w = jnp.cos(half)
    xyz = omega_dt * sinc_half
    return jnp.concatenate([w, xyz], axis=-1)
