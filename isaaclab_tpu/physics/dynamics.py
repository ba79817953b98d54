"""Articulated rigid-body dynamics: CRBA mass matrix + RNEA bias forces.

The compute core replacing PhysX's reduced-coordinate articulation solver
(SURVEY.md §2.10 row 1). Single-instance functions over the static tree
(unrolled at trace time), vmapped over envs by the engine. The contact solver
consumes the mass matrix through batched Cholesky solves — dense (nv, nv)
ops that XLA maps onto the MXU when batched over thousands of envs.

Free-joint velocity coordinates are body-frame ``(ang, lin)`` (constant motion
subspace — Featherstone's convention), matching the Jacobian columns emitted
by :mod:`kinematics`.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import math as math_utils
from . import spatial
from .kinematics import Kinematics
from .model import RobotModel


def _body_spatial_inertias(model: RobotModel, mass=None, inertia=None, com=None):
    """(nbody, 6, 6) spatial inertia of each body about its own frame.

    ``mass``/``inertia``/``com`` optionally override the model defaults with
    per-env randomized values (event-manager domain randomization).
    """
    out = []
    for b in range(model.nbody):
        m = jnp.asarray(model.mass[b]) if mass is None else mass[b]
        I_c = jnp.asarray(model.inertia[b]) if inertia is None else inertia[b]
        c = jnp.asarray(model.com[b]) if com is None else com[b]
        out.append(spatial.spatial_inertia(m, c, I_c))
    return jnp.stack(out)


def body_velocities(model: RobotModel, kin: Kinematics, qd):
    """(nbody, 6) body-frame spatial velocities (Featherstone propagation)."""
    v = []
    for b in range(model.nbody):
        p = int(model.parent[b])
        vd = int(model.v_dim[b])
        vs = int(model.v_start[b])
        v_b = kin.X_up[b] @ v[p] if p >= 0 else jnp.zeros(6)
        if vd:
            v_b = v_b + kin.S[b][:, :vd] @ qd[vs : vs + vd]
        v.append(v_b)
    return jnp.stack(v)


def rnea_bias(
    model: RobotModel,
    kin: Kinematics,
    qd,
    gravity,
    f_ext_w=None,
    mass=None,
    inertia=None,
    com=None,
):
    """Bias force C(q, qd) including gravity: RNEA with qdd = 0.

    ``f_ext_w``: optional (nbody, 6) external (moment, force) wrenches applied
    at each body origin in *world* coordinates (``Articulation.
    set_external_force_and_torque`` equivalent, reference articulation.py:820).
    Returns (nv,) generalized bias forces.
    """
    I_body = _body_spatial_inertias(model, mass, inertia, com)
    n = model.nbody

    # forward pass: velocities and accelerations (qdd = 0, a0 = -g trick)
    a_grav = jnp.concatenate([jnp.zeros(3), jnp.asarray(gravity)])
    v = []
    a = []
    f = [None] * n
    for b in range(n):
        p = int(model.parent[b])
        vd = int(model.v_dim[b])
        vs = int(model.v_start[b])
        if p >= 0:
            v_b = kin.X_up[b] @ v[p]
            a_b = kin.X_up[b] @ a[p]
        else:
            v_b = jnp.zeros(6)
            a_b = kin.X_up[b] @ (-a_grav)
        if vd:
            vj = kin.S[b][:, :vd] @ qd[vs : vs + vd]
            v_b = v_b + vj
            a_b = a_b + spatial.crm(v_b, vj)
            if int(model.jnt_type[b]) == 0:  # JOINT_FREE
                # world-coordinate free joint: S is configuration-dependent,
                # cJ = S_dot qdot = (0, -w_b x v_b) with (w_b, v_b) = vj
                a_b = a_b + jnp.concatenate(
                    [jnp.zeros(3), -jnp.cross(vj[:3], vj[3:])]
                )
        v.append(v_b)
        a.append(a_b)
        f_b = I_body[b] @ a_b + spatial.crf(v_b, I_body[b] @ v_b)
        if f_ext_w is not None:
            # world wrench at body origin -> body coordinates
            R_bw = math_utils.matrix_from_quat(kin.body_quat_w[b]).T
            n_w, fl_w = f_ext_w[b][:3], f_ext_w[b][3:]
            f_b = f_b - jnp.concatenate([R_bw @ n_w, R_bw @ fl_w])
        f[b] = f_b

    # backward pass
    C = jnp.zeros(model.nv)
    for b in range(n - 1, -1, -1):
        vd = int(model.v_dim[b])
        vs = int(model.v_start[b])
        if vd:
            C = C.at[vs : vs + vd].set(kin.S[b][:, :vd].T @ f[b])
        p = int(model.parent[b])
        if p >= 0:
            f[p] = f[p] + kin.X_up[b].T @ f[b]
    return C


def crba(model: RobotModel, kin: Kinematics, mass=None, inertia=None, com=None):
    """(nv, nv) joint-space inertia matrix via composite rigid bodies."""
    I_body = _body_spatial_inertias(model, mass, inertia, com)
    n = model.nbody
    Ic = [I_body[b] for b in range(n)]
    H = jnp.zeros((model.nv, model.nv))

    for b in range(n - 1, -1, -1):
        p = int(model.parent[b])
        if p >= 0:
            Ic[p] = Ic[p] + kin.X_up[b].T @ Ic[b] @ kin.X_up[b]
        vd = int(model.v_dim[b])
        if vd == 0:
            continue
        vs = int(model.v_start[b])
        F = Ic[b] @ kin.S[b][:, :vd]  # (6, vd)
        H = H.at[vs : vs + vd, vs : vs + vd].set(kin.S[b][:, :vd].T @ F)
        # walk up the chain
        j = b
        while int(model.parent[j]) >= 0:
            F = kin.X_up[j].T @ F  # force transform to parent coords
            j = int(model.parent[j])
            jvd = int(model.v_dim[j])
            if jvd == 0:
                continue
            jvs = int(model.v_start[j])
            block = kin.S[j][:, :jvd].T @ F  # (jvd, vd)
            H = H.at[jvs : jvs + jvd, vs : vs + vd].set(block)
            H = H.at[vs : vs + vd, jvs : jvs + jvd].set(block.T)
    return H


def add_armature(model: RobotModel, H, armature=None):
    """Add per-dof armature (rotor inertia) to the mass-matrix diagonal.

    PhysX articulation 'armature' equivalent (reference articulation.py:
    write_joint_armature_to_sim).
    """
    if model.nu == 0:
        return H
    arm = jnp.asarray(model.dof_armature) if armature is None else armature
    idx = jnp.asarray(model.dof_v_index)
    return H.at[idx, idx].add(arm)
