"""Forward kinematics for a single articulation instance.

Replaces the PhysX articulation kinematic update (reference
``SimulationContext.forward`` / Fabric mirroring, SURVEY.md §2.2). Functions
take the static :class:`RobotModel` plus a generalized position vector ``q``
and unroll the (static) kinematic tree at trace time; batching over envs is a
``vmap`` at the engine layer.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils import math as math_utils
from . import spatial
from .model import (
    JOINT_FIXED,
    JOINT_FREE,
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    RobotModel,
)


class Kinematics(NamedTuple):
    """FK products for one articulation instance (single env)."""

    body_pos_w: jnp.ndarray  # (nbody, 3) world positions of body frames
    body_quat_w: jnp.ndarray  # (nbody, 4) world orientations (wxyz)
    # parent->body motion transforms, 6x6, Featherstone body coordinates
    X_up: jnp.ndarray  # (nbody, 6, 6)
    # motion subspaces padded to 6 columns; only first v_dim[i] cols valid
    S: jnp.ndarray  # (nbody, 6, 6)
    # world-frame per-dof Jacobian data
    dof_axis_w: jnp.ndarray  # (nv, 3) rotation/translation axis in world
    dof_anchor_w: jnp.ndarray  # (nv, 3) point on the axis (rotational dofs)
    dof_is_rot: jnp.ndarray  # (nv,) 1.0 for rotational dofs


def _joint_local_pose(model: RobotModel, b: int, q):
    """Pose of body ``b``'s frame in its parent's frame given its joint coords."""
    jt = int(model.jnt_type[b])
    j_pos = jnp.asarray(model.jnt_pos[b])
    j_quat = jnp.asarray(model.jnt_quat[b])
    b_pos = jnp.asarray(model.body_pos[b])
    b_quat = jnp.asarray(model.body_quat[b])
    axis = jnp.asarray(model.jnt_axis[b])
    qs = int(model.q_start[b])

    if jt == JOINT_FREE:
        return q[qs : qs + 3], math_utils.normalize(q[qs + 3 : qs + 7])
    if jt == JOINT_FIXED:
        pos, quat = math_utils.combine_frame_transforms(j_pos, j_quat, b_pos, b_quat)
        return pos, quat
    theta = q[qs]
    if jt == JOINT_REVOLUTE:
        q_j = math_utils.quat_from_angle_axis(theta, axis)
        pos, quat = math_utils.combine_frame_transforms(
            j_pos, math_utils.quat_mul(j_quat, q_j), b_pos, b_quat
        )
        return pos, quat
    if jt == JOINT_PRISMATIC:
        offset = axis * theta
        pos, quat = math_utils.combine_frame_transforms(
            j_pos + math_utils.quat_apply(j_quat, offset), j_quat, b_pos, b_quat
        )
        return pos, quat
    raise NotImplementedError(f"joint type {jt}")


def _motion_subspace(model: RobotModel, b: int, quat_w=None):
    """(6, 6) motion subspace in body coordinates (first v_dim cols valid).

    Free-joint velocity coordinates are **world-frame** ``(ang_w, lin_w)``:
    the body-coordinate subspace is then blockdiag(R_bw, R_bw). This choice
    makes the linear Coriolis term vanish (exact momentum conservation under
    explicit integration) at the cost of a configuration-dependent S.
    """
    jt = int(model.jnt_type[b])
    S = jnp.zeros((6, 6))
    if jt == JOINT_FREE:
        R_bw = math_utils.matrix_from_quat(quat_w).T
        Z = jnp.zeros((3, 3))
        return jnp.block([[R_bw, Z], [Z, R_bw]])
    if jt == JOINT_FIXED:
        return S
    # axis in body coords: body frame = joint-child frame offset by (body_pos,
    # body_quat), so a_b = R(body_quat)^T a_joint.
    b_quat = jnp.asarray(model.body_quat[b])
    a_b = math_utils.quat_apply_inverse(b_quat, jnp.asarray(model.jnt_axis[b]))
    if jt == JOINT_REVOLUTE:
        # vector from joint origin to body origin, in body coords
        o_j2b = math_utils.quat_apply_inverse(
            b_quat, jnp.asarray(model.body_pos[b])
        )
        col = jnp.concatenate([a_b, jnp.cross(a_b, o_j2b)])
    else:  # prismatic
        col = jnp.concatenate([jnp.zeros(3), a_b])
    return S.at[:, 0].set(col)


def forward_kinematics(model: RobotModel, q) -> Kinematics:
    """FK over the whole tree. ``q``: (nq,). Static python loop -> unrolled."""
    body_pos = []
    body_quat = []
    X_up = []
    S = []
    dof_axis = [None] * model.nv
    dof_anchor = [None] * model.nv
    dof_is_rot = [0.0] * model.nv

    for b in range(model.nbody):
        p = int(model.parent[b])
        pos_rel, quat_rel = _joint_local_pose(model, b, q)
        if p < 0:
            pos_w, quat_w = pos_rel, quat_rel
        else:
            pos_w, quat_w = math_utils.combine_frame_transforms(
                body_pos[p], body_quat[p], pos_rel, quat_rel
            )
        body_pos.append(pos_w)
        body_quat.append(quat_w)
        # parent->body motion transform: frame (R, p) with R mapping parent
        # coords to body coords = R(quat_rel)^T
        R_rel = math_utils.matrix_from_quat(quat_rel).T
        X_up.append(spatial.motion_matrix(R_rel, pos_rel))
        S.append(_motion_subspace(model, b, quat_w))

        # world-frame dof Jacobian data
        jt = int(model.jnt_type[b])
        vs = int(model.v_start[b])
        if jt == JOINT_FREE:
            # world-frame free-joint coordinates: axes are the world basis
            eye = jnp.eye(3)
            for k in range(3):
                dof_axis[vs + k] = eye[k]
                dof_anchor[vs + k] = pos_w
                dof_is_rot[vs + k] = 1.0
            for k in range(3):
                dof_axis[vs + 3 + k] = eye[k]
                dof_anchor[vs + 3 + k] = pos_w
                dof_is_rot[vs + 3 + k] = 0.0
        elif jt in (JOINT_REVOLUTE, JOINT_PRISMATIC):
            # joint frame origin/axis in world: joint frame sits at
            # (jnt_pos, jnt_quat) in the parent frame.
            if p < 0:
                jp_w = jnp.asarray(model.jnt_pos[b])
                axis_w = math_utils.quat_apply(
                    jnp.asarray(model.jnt_quat[b]), jnp.asarray(model.jnt_axis[b])
                )
            else:
                jp_w, jq_w = math_utils.combine_frame_transforms(
                    body_pos[p],
                    body_quat[p],
                    jnp.asarray(model.jnt_pos[b]),
                    jnp.asarray(model.jnt_quat[b]),
                )
                axis_w = math_utils.quat_apply(jq_w, jnp.asarray(model.jnt_axis[b]))
            dof_axis[vs] = axis_w
            dof_anchor[vs] = jp_w
            dof_is_rot[vs] = 1.0 if jt == JOINT_REVOLUTE else 0.0

    return Kinematics(
        body_pos_w=jnp.stack(body_pos),
        body_quat_w=jnp.stack(body_quat),
        X_up=jnp.stack(X_up),
        S=jnp.stack(S),
        dof_axis_w=jnp.stack(dof_axis) if model.nv else jnp.zeros((0, 3)),
        dof_anchor_w=jnp.stack(dof_anchor) if model.nv else jnp.zeros((0, 3)),
        dof_is_rot=jnp.asarray(dof_is_rot),
    )


def body_velocities_world(model: RobotModel, kin: Kinematics, qd):
    """World-frame (ang[3], lin[3]) velocity of every body origin.

    Propagates down the tree in world coordinates (lin = velocity of the body
    frame origin). Serves ``ArticulationData.body_vel_w`` (reference
    articulation_data.py:430-500).
    """
    vels = []
    for b in range(model.nbody):
        p = int(model.parent[b])
        base = vels[p] if p >= 0 else jnp.zeros(6)
        ang_p, lin_p = base[:3], base[3:]
        pos_b = kin.body_pos_w[b]
        if p >= 0:
            lin_here = lin_p + jnp.cross(ang_p, pos_b - kin.body_pos_w[p])
        else:
            lin_here = lin_p
        ang, lin = ang_p, lin_here
        jt = int(model.jnt_type[b])
        vs = int(model.v_start[b])
        if jt == JOINT_FREE:
            # free-joint qd is already world-frame (ang, lin)
            ang = ang + qd[vs : vs + 3]
            lin = lin + qd[vs + 3 : vs + 6]
        elif jt in (JOINT_REVOLUTE, JOINT_PRISMATIC):
            axis = kin.dof_axis_w[vs]
            if jt == JOINT_REVOLUTE:
                ang = ang + axis * qd[vs]
                lin = lin + jnp.cross(axis, pos_b - kin.dof_anchor_w[vs]) * qd[vs]
            else:
                lin = lin + axis * qd[vs]
        vels.append(jnp.concatenate([ang, lin]))
    return jnp.stack(vels)


def point_jacobian(model: RobotModel, kin: Kinematics, body_index: int, point_w):
    """(3, nv) world-frame Jacobian of a point attached to ``body_index``.

    Backbone of contact constraint rows and of the reference's
    ``Articulation.root_physx_view.get_jacobians`` equivalent.
    """
    cols = []
    ancestors = ancestor_dofs(model, body_index)
    for d in range(model.nv):
        if d not in ancestors:
            cols.append(jnp.zeros(3))
            continue
        axis = kin.dof_axis_w[d]
        if model_dof_is_rot(model, d):
            cols.append(jnp.cross(axis, point_w - kin.dof_anchor_w[d]))
        else:
            cols.append(axis)
    return jnp.stack(cols, axis=-1)


def body_jacobian(model: RobotModel, kin: Kinematics, body_index: int):
    """(6, nv) world-frame spatial Jacobian (ang rows, lin rows at body origin)."""
    ancestors = ancestor_dofs(model, body_index)
    pos_b = kin.body_pos_w[body_index]
    cols = []
    for d in range(model.nv):
        if d not in ancestors:
            cols.append(jnp.zeros(6))
            continue
        axis = kin.dof_axis_w[d]
        if model_dof_is_rot(model, d):
            cols.append(
                jnp.concatenate([axis, jnp.cross(axis, pos_b - kin.dof_anchor_w[d])])
            )
        else:
            cols.append(jnp.concatenate([jnp.zeros(3), axis]))
    return jnp.stack(cols, axis=-1)


# ---------------------------------------------------------------------------
# Static topology helpers (host-side, trace-time)
# ---------------------------------------------------------------------------

_ANCESTOR_CACHE: dict = {}


def ancestor_dofs(model: RobotModel, body_index: int) -> frozenset:
    """Set of v-indices whose dofs influence ``body_index`` (static)."""
    key = (model.uid, body_index)  # id() unsafe: addresses reused after GC
    if key in _ANCESTOR_CACHE:
        return _ANCESTOR_CACHE[key]
    dofs = set()
    b = body_index
    while b >= 0:
        vs, vd = int(model.v_start[b]), int(model.v_dim[b])
        dofs.update(range(vs, vs + vd))
        b = int(model.parent[b])
    out = frozenset(dofs)
    _ANCESTOR_CACHE[key] = out
    return out


def model_dof_is_rot(model: RobotModel, d: int) -> bool:
    """Static: is v-index ``d`` a rotational dof?"""
    for b in range(model.nbody):
        vs, vd = int(model.v_start[b]), int(model.v_dim[b])
        if vs <= d < vs + vd:
            jt = int(model.jnt_type[b])
            if jt == JOINT_FREE:
                return (d - vs) < 3
            return jt == JOINT_REVOLUTE
    raise IndexError(d)
