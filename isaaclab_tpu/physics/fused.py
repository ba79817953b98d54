"""Batch-last ("env on lanes") fused articulation free dynamics.

Why this module exists
----------------------
The vmap-of-single-env formulation stores every per-env matrix as the MINOR
dimensions of an (E, n, m) array. For articulation-sized operands (nv = 12..40)
those minor dims pad to the TPU (8, 128) tile — an (4096, 18, 18) mass matrix
occupies ~9x its logical bytes and every matmul on it runs at a few percent
MXU utilization. Measured on a v5e chip at Anymal-C sizes (E=4096):
``crba_world`` 4.7 ms + Cholesky/solve 3.6 ms per substep — 65% of the whole
locomotion step (tools/profile_physics_parts.py).

This module flips the layout: every per-env scalar lives in a dense (E,)
vector (one env per VPU lane), and all small-matrix algebra (FK, CRBA bias,
mass matrix, Cholesky) is unrolled at trace time into elementwise
multiply-adds over those vectors. Static model constants (joint frames, axes)
fold into the formulas. XLA fuses the resulting elementwise graph into a
handful of full-tile VPU kernels — no padded tiny matmuls anywhere.

Formulation: fixed-frame (world-origin Plücker) spatial algebra — the same
trick MuJoCo uses with its com-centered ``cdof``/``cinert`` quantities:

- dof motion vectors Phi_d = (axis, anchor x axis) referenced at the world
  origin (envs are superimposed at the origin, so f32 moment arms stay small);
- body spatial inertias at the origin parametrized as (m, h = m*c, AA);
- no coordinate transforms anywhere: velocities propagate by addition,
  subtree forces by addition, H(v, w) = Phi_v . (I^C_b(w) Phi_w).

Replaces PhysX's reduced-coordinate articulation solve (SURVEY.md §2.10 row
1) on the hot path; the per-env reference implementations in
``dynamics.py``/``kinematics.py`` remain the oracle the equivalence tests
check against (tests/test_fused_dynamics.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .kinematics import Kinematics, ancestor_dofs
from .model import (
    JOINT_FIXED,
    JOINT_FREE,
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    RobotModel,
)

# ---------------------------------------------------------------------------
# Component math: vectors/quaternions as python tuples of (E,) arrays or
# python-float constants (constants fold at trace time).
# ---------------------------------------------------------------------------


def _qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def _qrot(q, v):
    """Rotate 3-vector ``v`` by quaternion ``q`` (wxyz)."""
    w, x, y, z = q
    vx, vy, vz = v
    tx = 2.0 * (y * vz - z * vy)
    ty = 2.0 * (z * vx - x * vz)
    tz = 2.0 * (x * vy - y * vx)
    return (
        vx + w * tx + (y * tz - z * ty),
        vy + w * ty + (z * tx - x * tz),
        vz + w * tz + (x * ty - y * tx),
    )


def _cross(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _add6(a, b):
    return tuple(a[i] + b[i] for i in range(6))


def _sub6(a, b):
    return tuple(a[i] - b[i] for i in range(6))


def _scale6(a, s):
    return tuple(a[i] * s for i in range(6))


def _dot6(a, b):
    return sum(a[i] * b[i] for i in range(6))


_ZERO3 = (0.0, 0.0, 0.0)
_ZERO6 = (0.0,) * 6


def _cross_motion(v, m):
    """Spatial motion cross v x^ m; v = (w, u), m = (mw, mv)."""
    w, u = v[:3], v[3:]
    mw, mv = m[:3], m[3:]
    return _cross(w, mw) + _add3(_cross(w, mv), _cross(u, mw))


def _cross_force(v, f):
    """Spatial force cross v x* f; v = (w, u), f = (n, F)."""
    w, u = v[:3], v[3:]
    n, F = f[:3], f[3:]
    return _add3(_cross(w, n), _cross(u, F)) + _cross(w, F)


def _rotmat(q):
    """3x3 rotation matrix components from quaternion (row-major 9-tuple)."""
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return (
        1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
        2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
        2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
    )


class _Inertia(NamedTuple):
    """Spatial inertia about the world origin: mass, h = m*c_w, and the
    symmetric angular block AA = I_com^w + m(|c|^2 I - c c^T), components
    (xx, yy, zz, xy, xz, yz)."""

    m: object
    h: tuple
    AA: tuple

    def apply(self, v):
        """f = I v for motion vector v = (w, u): (AA w + h x u, m u - h x w)."""
        w, u = v[:3], v[3:]
        xx, yy, zz, xy, xz, yz = self.AA
        n = (
            xx * w[0] + xy * w[1] + xz * w[2],
            xy * w[0] + yy * w[1] + yz * w[2],
            xz * w[0] + yz * w[1] + zz * w[2],
        )
        n = _add3(n, _cross(self.h, u))
        F = _sub3(_scale3(u, self.m), _cross(self.h, w))
        return n + F

    def add(self, o):
        return _Inertia(
            m=self.m + o.m,
            h=_add3(self.h, o.h),
            AA=tuple(self.AA[i] + o.AA[i] for i in range(6)),
        )


def _body_inertia_origin(quat_w, pos_w, m, com, In):
    """Spatial inertia of one body about the world origin.

    ``m``: (E,); ``com``: 3-tuple body-frame com; ``In``: 6-tuple symmetric
    body-frame rotational inertia about the com (xx, yy, zz, xy, xz, yz).
    """
    R = _rotmat(quat_w)
    # c_w = pos_w + R com
    c = _add3(pos_w, (
        R[0] * com[0] + R[1] * com[1] + R[2] * com[2],
        R[3] * com[0] + R[4] * com[1] + R[5] * com[2],
        R[6] * com[0] + R[7] * com[1] + R[8] * com[2],
    ))
    # I_w = R I R^T, symmetric: M = R I (rows), then S = M R^T
    Ixx, Iyy, Izz, Ixy, Ixz, Iyz = In
    # I columns (symmetric)
    I0 = (Ixx, Ixy, Ixz)
    I1 = (Ixy, Iyy, Iyz)
    I2 = (Ixz, Iyz, Izz)
    M = []
    for r in range(3):
        Rr = (R[3 * r], R[3 * r + 1], R[3 * r + 2])
        M.append((
            _dot3(Rr, I0), _dot3(Rr, I1), _dot3(Rr, I2),
        ))
    def _mrow_dot(r, s):
        Rs = (R[3 * s], R[3 * s + 1], R[3 * s + 2])
        return M[r][0] * Rs[0] + M[r][1] * Rs[1] + M[r][2] * Rs[2]
    Sxx, Syy, Szz = _mrow_dot(0, 0), _mrow_dot(1, 1), _mrow_dot(2, 2)
    Sxy, Sxz, Syz = _mrow_dot(0, 1), _mrow_dot(0, 2), _mrow_dot(1, 2)
    c2 = _dot3(c, c)
    AA = (
        Sxx + m * (c2 - c[0] * c[0]),
        Syy + m * (c2 - c[1] * c[1]),
        Szz + m * (c2 - c[2] * c[2]),
        Sxy - m * c[0] * c[1],
        Sxz - m * c[0] * c[2],
        Syz - m * c[1] * c[2],
    )
    return _Inertia(m=m, h=_scale3(c, m), AA=AA)


# ---------------------------------------------------------------------------
# FK in components
# ---------------------------------------------------------------------------


class _FK(NamedTuple):
    pos: list  # per body 3-tuple
    quat: list  # per body 4-tuple
    phi: list  # per dof 6-tuple (world-origin Plücker motion vector)
    axis_w: list  # per dof 3-tuple
    anchor_w: list  # per dof 3-tuple
    is_rot: list  # per dof python float


def _fk_components(model: RobotModel, qc) -> _FK:
    """qc: list of nq (E,) columns. Unrolls the static tree."""
    pos = [None] * model.nbody
    quat = [None] * model.nbody
    phi = [None] * model.nv
    axis_w = [None] * model.nv
    anchor_w = [None] * model.nv
    is_rot = [0.0] * model.nv

    for b in range(model.nbody):
        p = int(model.parent[b])
        jt = int(model.jnt_type[b])
        qs = int(model.q_start[b])
        vs = int(model.v_start[b])
        j_pos = tuple(float(v) for v in np.asarray(model.jnt_pos[b]))
        j_quat = tuple(float(v) for v in np.asarray(model.jnt_quat[b]))
        b_pos = tuple(float(v) for v in np.asarray(model.body_pos[b]))
        b_quat = tuple(float(v) for v in np.asarray(model.body_quat[b]))
        axis = tuple(float(v) for v in np.asarray(model.jnt_axis[b]))

        if jt == JOINT_FREE:
            pw = (qc[qs], qc[qs + 1], qc[qs + 2])
            qw_raw = (qc[qs + 3], qc[qs + 4], qc[qs + 5], qc[qs + 6])
            n2 = sum(c * c for c in qw_raw)
            inv_n = jnp.where(n2 > 1e-12, 1.0 / jnp.sqrt(n2), 1.0)
            qw = tuple(c * inv_n for c in qw_raw)
            if p >= 0:
                raise NotImplementedError("free joint must be a tree root")
            pos[b], quat[b] = pw, qw
            e = ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))
            for k in range(3):
                phi[vs + k] = e[k] + _cross(pw, e[k])
                axis_w[vs + k] = e[k]
                anchor_w[vs + k] = pw
                is_rot[vs + k] = 1.0
            for k in range(3):
                phi[vs + 3 + k] = _ZERO3 + e[k]
                axis_w[vs + 3 + k] = e[k]
                anchor_w[vs + 3 + k] = pw
                is_rot[vs + 3 + k] = 0.0
            continue

        if jt == JOINT_FIXED:
            rel_q = _qmul(j_quat, b_quat)
            rel_p = _add3(j_pos, _qrot(j_quat, b_pos))
        elif jt == JOINT_REVOLUTE:
            theta = qc[qs]
            half = 0.5 * theta
            c, s = jnp.cos(half), jnp.sin(half)
            q_j = (c, axis[0] * s, axis[1] * s, axis[2] * s)
            jq = _qmul(j_quat, q_j)
            rel_q = _qmul(jq, b_quat)
            rel_p = _add3(j_pos, _qrot(jq, b_pos))
        elif jt == JOINT_PRISMATIC:
            theta = qc[qs]
            off = _qrot(j_quat, axis)  # constant direction in parent frame
            rel_q = _qmul(j_quat, b_quat)
            rel_p = _add3(
                _add3(j_pos, _scale3(off, theta)), _qrot(j_quat, b_pos)
            )
        else:  # pragma: no cover
            raise NotImplementedError(f"joint type {jt}")

        if p < 0:
            pw, qw = rel_p, rel_q
            jp_w = j_pos
            if jt == JOINT_REVOLUTE or jt == JOINT_PRISMATIC:
                ax_w = _qrot(j_quat, axis)
        else:
            pw = _add3(pos[p], _qrot(quat[p], rel_p))
            qw = _qmul(quat[p], rel_q)
            if jt == JOINT_REVOLUTE or jt == JOINT_PRISMATIC:
                jp_w = _add3(pos[p], _qrot(quat[p], j_pos))
                jq_w = _qmul(quat[p], j_quat)
                ax_w = _qrot(jq_w, axis)
        pos[b], quat[b] = pw, qw

        if jt in (JOINT_REVOLUTE, JOINT_PRISMATIC):
            axis_w[vs] = ax_w
            anchor_w[vs] = jp_w
            if jt == JOINT_REVOLUTE:
                phi[vs] = ax_w + _cross(jp_w, ax_w)
                is_rot[vs] = 1.0
            else:
                phi[vs] = _ZERO3 + ax_w
                is_rot[vs] = 0.0

    return _FK(pos=pos, quat=quat, phi=phi, axis_w=axis_w,
               anchor_w=anchor_w, is_rot=is_rot)


def _stack3(comps, E):
    return jnp.stack(
        [jnp.broadcast_to(jnp.asarray(c, jnp.float32), (E,)) for c in comps],
        axis=-1,
    )


def _fk_to_kinematics(model: RobotModel, fk: _FK, E: int) -> Kinematics:
    """Batched ``Kinematics`` (leading E axis) for the narrowphase/sensor/
    constraint consumers. ``X_up``/``S`` (Featherstone body-coordinate
    products) are not produced by the fused path — zero-size placeholders."""
    body_pos_w = jnp.stack([_stack3(p, E) for p in fk.pos], axis=1)
    body_quat_w = jnp.stack(
        [_stack3(q, E) for q in fk.quat], axis=1
    ) if model.nbody else jnp.zeros((E, 0, 4))
    if model.nv:
        dof_axis_w = jnp.stack([_stack3(a, E) for a in fk.axis_w], axis=1)
        dof_anchor_w = jnp.stack([_stack3(a, E) for a in fk.anchor_w], axis=1)
        dof_is_rot = jnp.broadcast_to(
            jnp.asarray(fk.is_rot, jnp.float32), (E, model.nv)
        )
    else:
        dof_axis_w = jnp.zeros((E, 0, 3))
        dof_anchor_w = jnp.zeros((E, 0, 3))
        dof_is_rot = jnp.zeros((E, 0))
    return Kinematics(
        body_pos_w=body_pos_w,
        body_quat_w=body_quat_w,
        X_up=jnp.zeros((E, 0, 6, 6)),
        S=jnp.zeros((E, 0, 6, 6)),
        dof_axis_w=dof_axis_w,
        dof_anchor_w=dof_anchor_w,
        dof_is_rot=dof_is_rot,
    )


# ---------------------------------------------------------------------------
# Sparse-aware scalar Cholesky over component matrices
# ---------------------------------------------------------------------------


def _is_zero(x) -> bool:
    return isinstance(x, float) and x == 0.0


def chol_comps(H, n):
    """Unrolled Cholesky of a component matrix (2D list, lower triangle
    used; python-float 0.0 entries are structural zeros skipped at trace
    time). Returns lower-triangular 2D list of components."""
    L = [[0.0] * n for _ in range(n)]
    inv_d = [None] * n
    for j in range(n):
        s = H[j][j]
        for k in range(j):
            if not _is_zero(L[j][k]):
                s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[j][j] = d
        inv_d[j] = 1.0 / d
        for i in range(j + 1, n):
            s = H[i][j] if i >= j else H[j][i]
            if _is_zero(s):
                s = None
            for k in range(j):
                if _is_zero(L[i][k]) or _is_zero(L[j][k]):
                    continue
                t = L[i][k] * L[j][k]
                s = -t if s is None else s - t
            L[i][j] = 0.0 if s is None else s * inv_d[j]
    return L


def chol_solve_comps(L, b):
    """Solve (L L^T) x = b; ``b`` list of n components. Returns list."""
    n = len(b)
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            if not _is_zero(L[i][k]):
                s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            if not _is_zero(L[k][i]):
                s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def chol_solve_slabs(L, B):
    """Solve (L L^T) X = B for B: (E, n, R) — substitution over (E, R)
    slabs (dense tiles; the batch-last answer to ``vmap(chol_solve)``).

    The nonzero components are first PACKED into one (E, n_chol) array and
    re-sliced per use: left as ~100 independent (E,) values, XLA
    materializes each as its own (E, 1) sublane-1 buffer and the latency-
    hiding scheduler stages every one into scratch each substep — the
    shadow-hand device trace showed ~28 such 2.2 ms copies PER SUBSTEP
    dominating the whole step. Column slices of one (8, 128)-tiled buffer
    fuse into the consuming multiplies instead."""
    n = len(L)
    E = B.shape[0]
    comps = []
    index = {}
    for i in range(n):
        for k in range(i + 1):
            c = L[i][k]
            if _is_zero(c):
                continue
            index[(i, k)] = len(comps)
            comps.append(
                c if hasattr(c, "ndim") and c.ndim == 1
                else jnp.broadcast_to(jnp.asarray(c, jnp.float32), (E,))
            )
    Lp = jnp.stack(comps, axis=1)  # (E, n_chol)

    def coef(i, k):
        j = index[(i, k)]
        return Lp[:, j : j + 1]  # (E, 1) slice of the packed buffer

    y = [None] * n
    for i in range(n):
        s = B[:, i, :]
        for k in range(i):
            if (i, k) in index:
                s = s - coef(i, k) * y[k]
        y[i] = s / coef(i, i)
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            if (k, i) in index:
                s = s - coef(k, i) * x[k]
        x[i] = s / coef(i, i)
    return jnp.stack(x, axis=1)  # (E, n, R)


# ---------------------------------------------------------------------------
# Fused free dynamics
# ---------------------------------------------------------------------------


def _barrier_enabled(model: RobotModel) -> bool:
    """Whether to cut the fused graph into fusion-bounded phases with
    ``lax.optimization_barrier``. The unrolled scalar formulation emits one
    enormous elementwise region (~32k HLO ops at shadow size, nv=29) and
    XLA:TPU's fusion/scheduling passes go strongly superlinear on it — the
    shadow step compiled for 19-28 MINUTES. Barriers after FK / inertias+
    bias / H+Cholesky cap each fusion at a few thousand ops; the cost is
    materializing ~400 (E,) intermediates to HBM per substep (~tens of µs
    at E=8192). Default: on for nv >= 24 where the compile blowup bites;
    override with ISAACLAB_TPU_FUSED_BARRIERS=0/1."""
    import os

    flag = os.environ.get("ISAACLAB_TPU_FUSED_BARRIERS")
    if flag is not None:
        return flag != "0"
    return model.nv >= 24


def _barrier(enabled, *trees):
    """Optimization-barrier the ARRAY leaves of component pytrees, leaving
    python-float structural zeros/constants untouched (barriering them would
    turn them into traced arrays and defeat the sparsity skips). No-op when
    ``enabled`` is false."""
    if not enabled:
        return trees if len(trees) > 1 else trees[0]
    import jax

    leaves, treedef = jax.tree.flatten(trees)
    arr_idx = [i for i, l in enumerate(leaves) if hasattr(l, "dtype")]
    if arr_idx:
        barred = jax.lax.optimization_barrier([leaves[i] for i in arr_idx])
        for i, b in zip(arr_idx, barred):
            leaves[i] = b
    out = jax.tree.unflatten(treedef, leaves)
    return out if len(trees) > 1 else out[0]


class FreeDynamics(NamedTuple):
    v_free: jnp.ndarray  # (E, nv)
    kin: Kinematics  # batched (leading E)
    L: tuple  # nested tuple of Cholesky components ((E,) arrays / 0.0)


def free_dynamics_batch(
    model: RobotModel,
    q,  # (E, nq)
    qd,  # (E, nv)
    tau_v,  # (E, nv) total applied generalized force (drive + tendon - damping)
    params,  # batched BodyParams
    dt: float,
    gravity,  # static 3-tuple
    f_ext_w=None,  # (E, nbody, 6) world wrenches (torque, force) at body origin
    H_diag_extra=None,  # (E, nu) added to articulated-dof H diagonal
    H_pairs_extra=None,  # dict {(v_i, v_j): (E,) } extra H couplings (v-index)
) -> FreeDynamics:
    """Unconstrained forward dynamics for the whole env batch, batch-last.

    Returns v_free = qd + dt * H^-1 (tau - C), the batched FK products, and
    the Cholesky factor components for downstream constraint solves.
    """
    E = q.shape[0]
    barriers = _barrier_enabled(model)
    qc = [q[:, i] for i in range(model.nq)]
    qdc = [qd[:, i] for i in range(model.nv)]
    fk = _fk_components(model, qc)
    fk = _barrier(barriers, fk)

    # --- body spatial inertias at the origin ---
    inertias = []
    for b in range(model.nbody):
        m = params.mass[:, b]
        com = tuple(params.com[:, b, i] for i in range(3))
        I = params.inertia
        In = (I[:, b, 0, 0], I[:, b, 1, 1], I[:, b, 2, 2],
              I[:, b, 0, 1], I[:, b, 0, 2], I[:, b, 1, 2])
        inertias.append(
            _body_inertia_origin(fk.quat[b], fk.pos[b], m, com, In)
        )

    # --- velocity propagation + bias accelerations (fixed-frame RNEA) ---
    # gravity components may be static floats or per-env (E,) arrays
    # (events.py:randomize_physics_scene_gravity makes them traced)
    g = tuple(x if hasattr(x, "shape") else float(x) for x in gravity)
    a_root = _ZERO3 + tuple(-x for x in g)  # a0 = -g trick
    V = [None] * model.nbody
    A = [None] * model.nbody
    f = [None] * model.nbody
    for b in range(model.nbody):
        p = int(model.parent[b])
        jt = int(model.jnt_type[b])
        vs = int(model.v_start[b])
        vd = int(model.v_dim[b])
        Vp = V[p] if p >= 0 else _ZERO6
        Ap = A[p] if p >= 0 else a_root
        Vb, Ab = Vp, Ap
        if jt == JOINT_FREE:
            vj = _ZERO6
            for k in range(6):
                vj = _add6(vj, _scale6(fk.phi[vs + k], qdc[vs + k]))
            Vb = _add6(Vp, vj)
            # Phi of the rotational dofs is anchored at the (moving) body
            # origin: Phi_dot = (0, p_dot x e_k) -> bias = (0, p_dot x w_j)
            w_j = vj[:3]
            pw = fk.pos[b]
            p_dot = _add3(Vb[3:], _cross(Vb[:3], pw))
            Ab = _add6(Ap, _ZERO3 + _cross(p_dot, w_j))
        elif vd == 1:
            vj = _scale6(fk.phi[vs], qdc[vs])
            Vb = _add6(Vp, vj)
            # axis line fixed in the parent: Phi_dot = Vp x^ Phi
            Ab = _add6(Ap, _cross_motion(Vp, vj))
        V[b] = Vb
        A[b] = Ab
        fb = _add6(
            inertias[b].apply(Ab), _cross_force(Vb, inertias[b].apply(Vb))
        )
        if f_ext_w is not None:
            n_w = tuple(f_ext_w[:, b, i] for i in range(3))
            F_w = tuple(f_ext_w[:, b, 3 + i] for i in range(3))
            n_O = _add3(n_w, _cross(fk.pos[b], F_w))
            fb = _sub6(fb, n_O + F_w)
        f[b] = fb

    # backward: subtree force sums, then C[d] = Phi_d . f^C
    for b in range(model.nbody - 1, -1, -1):
        p = int(model.parent[b])
        if p >= 0:
            f[p] = _add6(f[p], f[b])
    C = [0.0] * model.nv
    for b in range(model.nbody):
        vs = int(model.v_start[b])
        for k in range(int(model.v_dim[b])):
            C[vs + k] = _dot6(fk.phi[vs + k], f[b])
    C, inertias = _barrier(barriers, C, inertias)

    # --- composite inertias + mass matrix (CRBA at the origin) ---
    Ic = list(inertias)
    for b in range(model.nbody - 1, -1, -1):
        p = int(model.parent[b])
        if p >= 0:
            Ic[p] = Ic[p].add(Ic[b])

    dof_body = [None] * model.nv
    for b in range(model.nbody):
        vs, vd = int(model.v_start[b]), int(model.v_dim[b])
        for k in range(vd):
            dof_body[vs + k] = b

    H = [[0.0] * model.nv for _ in range(model.nv)]
    for w in range(model.nv):
        bw = dof_body[w]
        G = Ic[bw].apply(fk.phi[w])
        for v in sorted(ancestor_dofs(model, bw)):
            if v <= w:
                H[w][v] = _dot6(fk.phi[v], G)

    # armature (+ implicit drive/tendon stiffness terms from the caller)
    if model.nu:
        vi = [int(i) for i in model.dof_v_index]
        for j, v in enumerate(vi):
            extra = params.armature[:, j]
            if H_diag_extra is not None:
                extra = extra + H_diag_extra[:, j]
            H[v][v] = H[v][v] + extra
    if H_pairs_extra:
        for (i, j), val in H_pairs_extra.items():
            lo, hi = (j, i) if i >= j else (i, j)
            H[hi][lo] = H[hi][lo] + val

    L = chol_comps(H, model.nv)
    L = _barrier(barriers, L)

    rhs = [tau_v[:, d] - C[d] for d in range(model.nv)]
    qdd = chol_solve_comps(L, rhs)
    v_free = jnp.stack(
        [qdc[d] + dt * qdd[d] for d in range(model.nv)], axis=-1
    ) if model.nv else jnp.zeros((E, 0))

    kin = _fk_to_kinematics(model, fk, E)
    return FreeDynamics(
        v_free=v_free,
        kin=kin,
        L=tuple(tuple(row) for row in L),
    )
