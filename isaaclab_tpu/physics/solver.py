"""Velocity-level contact + joint-limit impulse solver.

The TGS/PGS-style solver replacing PhysX's iterative constraint solver
(reference ``PhysxCfg`` solver knobs, ``sim/simulation_cfg.py:37-76``;
SURVEY.md §2.10 row 1, §7 hard part 1). Formulation:

    minimize over impulses lambda:  complementarity on contact normals,
    friction-cone projection on tangents, one-sided rows for joint limits,
    over the Delassus operator A = J H^-1 J^T.

TPU-first design choices:
- **Fixed shapes**: the constraint-row count is static (3 rows per candidate
  contact + 2 rows per limited dof); inactive rows are masked, never gathered.
- **Projected block-Jacobi** iterations instead of sequential Gauss-Seidel:
  each sweep is one batched (nrows x nrows) matvec -> MXU work when vmapped
  over envs, instead of a serial row loop on the VPU.
- Baumgarte position stabilization + restitution folded into the bias, like
  PhysX TGS's per-iteration bias (approximated at the velocity level).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .collision import Contacts
from .kinematics import Kinematics, point_jacobian
from .model import RobotModel


class SolverCfg(NamedTuple):
    """Mirrors the load-bearing knobs of the reference ``PhysxCfg``
    (sim/simulation_cfg.py:46-93)."""

    iterations: int = 16
    relaxation: float = 1.0
    baumgarte: float = 0.2
    contact_slop: float = 0.005
    restitution_threshold: float = 0.2  # m/s
    limit_baumgarte: float = 0.2
    # PhysX ``max_depenetration_velocity`` (reference robot cfgs set 1.0,
    # isaaclab_assets/robots/anymal.py:70): caps the Baumgarte bias velocity
    # so deep spawn penetrations depenetrate at a bounded rate instead of
    # launching the body (velocity-level Baumgarte otherwise injects
    # kinetic energy proportional to penetration depth).
    max_depenetration_velocity: float = 1.0
    # Static active-set compaction (the TPU answer to PhysX's broadphase
    # culling): keep only the ``active_contacts`` DEEPEST candidate contacts
    # per env (lax.top_k — shapes stay static) before the Delassus/APGD
    # stage, whose HBM traffic scales with the row count. 0 = keep all.
    # Lossless whenever <= active_contacts candidates actually touch —
    # inactive rows carry zero impulse either way.
    active_contacts: int = 0


_ANCESTOR_MASK_CACHE: dict = {}


def ancestor_mask(model: RobotModel):
    """(nbody, nv) static 0/1 mask: dof d moves body b."""
    key = model.uid  # id(model) is unsafe: CPython reuses addresses after GC
    if key not in _ANCESTOR_MASK_CACHE:
        import numpy as _np

        from .kinematics import ancestor_dofs

        M = _np.zeros((model.nbody, model.nv), dtype=_np.float32)
        for b in range(model.nbody):
            for d in ancestor_dofs(model, b):
                M[b, d] = 1.0
        _ANCESTOR_MASK_CACHE[key] = M
    return _ANCESTOR_MASK_CACHE[key]


def point_jacobians_batch(model: RobotModel, kin: Kinematics, points, body_idx):
    """(ncon, 3, nv) world Jacobians for ``points`` attached to ``body_idx``.

    Fully vectorized: one broadcast cross product over (ncon, nv) instead of
    per-contact/per-dof Python loops — keeps the traced program small and the
    work a single fused VPU kernel.
    """
    mask = jnp.asarray(ancestor_mask(model))[jnp.asarray(body_idx)]  # (ncon, nv)
    axis = kin.dof_axis_w  # (nv, 3)
    anchor = kin.dof_anchor_w
    is_rot = kin.dof_is_rot[:, None]  # (nv, 1)
    rel = points[:, None, :] - anchor[None]  # (ncon, nv, 3)
    rot_cols = jnp.cross(jnp.broadcast_to(axis[None], rel.shape), rel)
    cols = jnp.where(is_rot[None] > 0.5, rot_cols, axis[None])  # (ncon, nv, 3)
    cols = cols * mask[:, :, None]
    return jnp.swapaxes(cols, 1, 2)  # (ncon, 3, nv)


def body_jacobians_batch(model: RobotModel, kin: Kinematics):
    """(nbody, 6, nv) world-frame spatial Jacobians of every body origin,
    rows ordered (ang, lin) — one broadcast op over (nbody, nv)."""
    mask = jnp.asarray(ancestor_mask(model))  # (nb, nv)
    axis = kin.dof_axis_w  # (nv, 3)
    anchor = kin.dof_anchor_w
    is_rot = kin.dof_is_rot[None, :, None]  # (1, nv, 1)
    p = kin.body_pos_w  # (nb, 3)
    rel = p[:, None, :] - anchor[None]  # (nb, nv, 3)
    axis_b = jnp.broadcast_to(axis[None], rel.shape)
    lin = jnp.where(is_rot > 0.5, jnp.cross(axis_b, rel), axis_b)
    ang = jnp.where(is_rot > 0.5, axis_b, 0.0)
    J = jnp.concatenate([ang, lin], axis=-1)  # (nb, nv, 6)
    J = J * mask[:, :, None]
    return jnp.swapaxes(J, 1, 2)  # (nb, 6, nv)


def crba_world(model: RobotModel, kin: Kinematics, mass, inertia, com):
    """Joint-space inertia via world-frame body Jacobians:
    H = sum_b J_b^T I_b^w J_b — one einsum instead of the recursive
    composite-rigid-body chain walks (same matrix; compiles to a single
    MXU contraction batched over envs)."""
    from . import spatial as sp

    J = body_jacobians_batch(model, kin)  # (nb, 6, nv)
    R = jnp.stack(
        [
            _quat_to_mat(kin.body_quat_w[b])
            for b in range(model.nbody)
        ]
    )
    I_rot = R @ inertia @ jnp.swapaxes(R, -1, -2)  # (nb, 3, 3)
    c_w = (R @ com[..., None])[..., 0]  # (nb, 3)
    C = sp.skew(c_w)
    m = mass[:, None, None]
    I3 = jnp.broadcast_to(jnp.eye(3), C.shape)
    top = jnp.concatenate([I_rot + m * (C @ jnp.swapaxes(C, -1, -2)), m * C], axis=-1)
    bot = jnp.concatenate([m * jnp.swapaxes(C, -1, -2), m * I3], axis=-1)
    I_w = jnp.concatenate([top, bot], axis=-2)  # (nb, 6, 6)
    return jnp.einsum("biv,bij,bjw->vw", J, I_w, J)


def _quat_to_mat(q):
    from ..utils import math as mu

    return mu.matrix_from_quat(q)


def contact_jacobians_t(model: RobotModel, kin: Kinematics, contacts: Contacts):
    """(nv, 3*ncon) TRANSPOSED constraint Jacobian, rows grouped
    [normals | tangent1s | tangent2s].

    Layout rationale (TPU): the APGD loop reads the Jacobian every sweep; with
    (rows, nv) layout the nv=12..18 minor dimension pads to the 128-lane tile
    and multiplies HBM traffic ~7x. Storing (nv, rows) puts the large rows
    dimension on lanes. Row GROUPING by type makes the cone projection pure
    lane-wise slicing (no (ncon, 3) reshapes).
    """
    ncon = contacts.depth.shape[0]
    if ncon == 0:
        return jnp.zeros((model.nv, 0))
    J = point_jacobians_batch(model, kin, contacts.pos, contacts.body_a)
    if np.any(contacts.body_b >= 0):
        J_b = point_jacobians_batch(
            model, kin, contacts.pos, np.maximum(contacts.body_b, 0)
        )
        b_valid = jnp.asarray((contacts.body_b >= 0).astype(np.float32))
        J = J - J_b * b_valid[:, None, None]
    n = contacts.normal  # (ncon, 3)
    t1, t2 = tangent_basis(n)
    frames = jnp.stack([n, t1, t2], axis=1)  # (ncon, 3frames, 3)
    # -> (nv, 3frames, ncon) -> (nv, 3*ncon) with [N | T1 | T2] grouping
    rows = jnp.einsum("cfk,ckv->vfc", frames, J)
    return rows.reshape(model.nv, 3 * ncon)


_IS_ROT_CACHE: dict = {}


def _dof_is_rot_static(model: RobotModel):
    """(nv,) python/numpy 0/1: rotational dof flags, resolved from the
    static model (free joints: 3 rot + 3 lin; prismatic 0; revolute 1)."""
    key = model.uid
    if key not in _IS_ROT_CACHE:
        from .model import JOINT_PRISMATIC

        is_rot = np.ones(model.nv, dtype=np.float32)
        for b in range(model.nbody):
            vs, vd = int(model.v_start[b]), int(model.v_dim[b])
            jt = int(model.jnt_type[b])
            if vd == 1 and jt == JOINT_PRISMATIC:
                is_rot[vs] = 0.0
            elif vd == 6:
                is_rot[vs + 3 : vs + 6] = 0.0
        _IS_ROT_CACHE[key] = is_rot
    return _IS_ROT_CACHE[key]


def contact_jacobians_t_batch(model: RobotModel, kin_b, contacts_b):
    """(E, nv, 3*ncon) grouped-row constraint Jacobian for the WHOLE batch.

    Batch-last formulation (fused.py's layout trick applied to contact
    rows): all intermediates are (nv, ncon, E) with the env batch on vector
    lanes — pure elementwise broadcasts, no batched 3x3 matmuls. The naive
    ``vmap(contact_jacobians_t)`` lowers to per-env (ncon,3,3)x(ncon,3,nv)
    einsums whose minor dims tile-pad ~40x and measured 6.0 ms/substep at
    Anymal-rough sizes (44% of the whole physics substep,
    tools/profile_contact_solve.py r4); this form is a handful of full-tile
    VPU passes.
    """
    E, ncon = contacts_b.depth.shape
    nv = model.nv
    if ncon == 0:
        return jnp.zeros((E, nv, 0))
    mask = ancestor_mask(model)  # (nbody, nv) static
    ba = np.asarray(contacts_b.body_a)
    bb = np.asarray(contacts_b.body_b)
    m_net = (
        mask[ba]
        - mask[np.maximum(bb, 0)] * (bb >= 0).astype(np.float32)[:, None]
    ).T  # (nv, ncon) static
    is_rot = _dof_is_rot_static(model)[:, None, None]  # (nv, 1, 1)

    ax = [jnp.transpose(kin_b.dof_axis_w[..., k]) for k in range(3)]  # (nv,E)
    an = [jnp.transpose(kin_b.dof_anchor_w[..., k]) for k in range(3)]
    p = [jnp.transpose(contacts_b.pos[..., k]) for k in range(3)]  # (ncon,E)
    n = [jnp.transpose(contacts_b.normal[..., k]) for k in range(3)]
    # tangent basis inlined on (ncon, E) components (tangent_basis exactly)
    use_x = jnp.abs(n[0]) < 0.9
    ax_ = jnp.where(use_x, 1.0, 0.0)
    ay_ = jnp.where(use_x, 0.0, 1.0)
    t1 = [-n[2] * ay_, n[2] * ax_, n[0] * ay_ - n[1] * ax_]
    inv_t1 = 1.0 / jnp.maximum(
        jnp.sqrt(t1[0] ** 2 + t1[1] ** 2 + t1[2] ** 2), 1e-9
    )
    t1 = [c * inv_t1 for c in t1]
    t2 = [
        n[1] * t1[2] - n[2] * t1[1],
        n[2] * t1[0] - n[0] * t1[2],
        n[0] * t1[1] - n[1] * t1[0],
    ]

    # rel_k (nv, ncon, E); cross(axis, rel) unrolled over k
    rel = [p[k][None] - an[k][:, None] for k in range(3)]
    axn = [ax[k][:, None] for k in range(3)]  # (nv, 1, E)
    cross = [
        axn[(k + 1) % 3] * rel[(k + 2) % 3]
        - axn[(k + 2) % 3] * rel[(k + 1) % 3]
        for k in range(3)
    ]
    mask3 = jnp.asarray(m_net)[:, :, None]  # (nv, ncon, 1)
    col = [
        jnp.where(is_rot > 0.5, cross[k],
                  jnp.broadcast_to(axn[k], cross[k].shape)) * mask3
        for k in range(3)
    ]
    row_n = col[0] * n[0][None] + col[1] * n[1][None] + col[2] * n[2][None]
    row_t1 = col[0] * t1[0][None] + col[1] * t1[1][None] + col[2] * t1[2][None]
    row_t2 = col[0] * t2[0][None] + col[1] * t2[1][None] + col[2] * t2[2][None]
    Jt = jnp.concatenate([row_n, row_t1, row_t2], axis=1)  # (nv, 3ncon, E)
    return jnp.transpose(Jt, (2, 0, 1))


def contact_jacobians(model: RobotModel, kin: Kinematics, contacts: Contacts):
    """(ncon*3, nv) interleaved [n, t1, t2] per contact (legacy layout for
    tests/back-compat; the solver uses :func:`contact_jacobians_t`)."""
    ncon = contacts.depth.shape[0]
    if ncon == 0:
        return jnp.zeros((0, model.nv))
    Jt = contact_jacobians_t(model, kin, contacts)  # (nv, 3*ncon) grouped
    grouped = Jt.T.reshape(3, ncon, model.nv)  # [N, T1, T2]
    return jnp.swapaxes(grouped, 0, 1).reshape(3 * ncon, model.nv)


def tangent_basis(n):
    """Two unit tangents orthogonal to ``n``; batched over leading dims."""
    a = jnp.where(
        jnp.abs(n[..., 0:1]) < 0.9,
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), n.shape),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), n.shape),
    )
    t1 = jnp.cross(n, a)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n, t1)
    return t1, t2


def _tangent_basis(n):
    """Single-normal variant (back-compat)."""
    t1, t2 = tangent_basis(n[None])
    return t1[0], t2[0]


_LIMITED_CACHE: dict = {}


def limited_dofs(model: RobotModel):
    """Static indices of dofs with REAL limits (|limit| < 1e8). Unlimited
    joints (builder default +-1e9) get no constraint rows — for limit-free
    robots like cartpole this empties the solve entirely."""
    key = model.uid  # id(model) is unsafe: CPython reuses addresses after GC
    if key not in _LIMITED_CACHE:
        lo = np.asarray(model.dof_limit_lower)
        hi = np.asarray(model.dof_limit_upper)
        _LIMITED_CACHE[key] = np.where(
            (np.abs(lo) < 1e8) | (np.abs(hi) < 1e8)
        )[0].astype(np.int32)
    return _LIMITED_CACHE[key]


def num_limit_rows(model: RobotModel) -> int:
    return 2 * len(limited_dofs(model))


def limit_rows_t(model: RobotModel):
    """Static (nv, 2*n_limited) transposed limit rows, grouped
    [lowers | uppers] over the LIMITED dofs only."""
    lim = limited_dofs(model)
    nl = len(lim)
    if nl == 0:
        return np.zeros((model.nv, 0))
    J = np.zeros((model.nv, 2 * nl))
    for i, d in enumerate(lim):
        v = model.dof_v_index[d]
        J[v, i] = 1.0  # lower limit: positive impulse pushes q up
        J[v, nl + i] = -1.0  # upper limit
    return J


def limit_rows(model: RobotModel):
    """Legacy (2*nu, nv) interleaved [lo_i, hi_i] layout."""
    if model.nu == 0:
        return np.zeros((0, model.nv))
    J = np.zeros((2 * model.nu, model.nv))
    for i, v in enumerate(model.dof_v_index):
        J[2 * i, v] = 1.0
        J[2 * i + 1, v] = -1.0
    return J


def _row_precond_scale(diag, ncon, n_lim):
    """Per-row preconditioning scales: each contact's [n, t1, t2] rows share
    ``1/sqrt(diag_n)`` (cone-preserving); limit rows use their own diag.
    Works batched (leading dims broadcast)."""
    if ncon:
        s_n = 1.0 / jnp.sqrt(jnp.clip(diag[..., :ncon], 1e-8, None))
        s_con = jnp.concatenate([s_n, s_n, s_n], axis=-1)
    else:
        s_con = diag[..., :0]
    if n_lim:
        s_lim = 1.0 / jnp.sqrt(
            jnp.clip(diag[..., 3 * ncon :], 1e-8, None)
        )
        return jnp.concatenate([s_con, s_lim], axis=-1)
    return s_con


class SolveResult(NamedTuple):
    qd: jnp.ndarray  # corrected generalized velocity (nv,)
    contact_impulse: jnp.ndarray  # (ncon, 3) [n, t1, t2] impulses
    contact_force_w: jnp.ndarray  # (ncon, 3) world-frame contact force on body_a


def solve_constraints(
    model: RobotModel,
    kin: Kinematics,
    H_chol,
    v_free,
    contacts: Contacts,
    q_arts,
    dt: float,
    cfg: SolverCfg,
    limit_lower=None,
    limit_upper=None,
    warm_lambda=None,
):
    """Solve contacts + joint limits; returns corrected qd and contact forces.

    Row layout: [normals(ncon) | tangent1(ncon) | tangent2(ncon) |
    limit_lo(nu) | limit_hi(nu)] — grouped so the cone projection is pure
    slicing. ``warm_lambda`` uses the same grouped layout.

    APGD (Nesterov-accelerated projected gradient) on the cone-constrained
    CCP: min 1/2 lam^T A lam + b^T lam, lam in K, with A = J H^-1 J^T kept
    matrix-free. Unlike projected Jacobi, APGD converges on REDUNDANT contact
    sets (coincident box corners make A rank-deficient; Jacobi's iteration
    matrix then has spectral radius > 1 -> energy injection).
    """
    ncon = contacts.depth.shape[0]
    lim_idx = limited_dofs(model)
    n_lim = 2 * len(lim_idx)
    nrows = 3 * ncon + n_lim

    if nrows == 0:
        return SolveResult(
            qd=v_free,
            contact_impulse=jnp.zeros((0, 3)),
            contact_force_w=jnp.zeros((0, 3)),
        )

    J_t = contact_jacobians_t(model, kin, contacts)  # (nv, 3*ncon)
    if n_lim:
        J_t = jnp.concatenate([J_t, jnp.asarray(limit_rows_t(model))], axis=1)
    # (nv, nrows): both operands of the solve iteration share this layout —
    # nv stays in sublanes, the large rows dimension on lanes.
    from .linalg import chol_solve

    MinvJT = chol_solve(H_chol, J_t)  # (nv, nrows)
    diag = jnp.clip(jnp.einsum("vr,vr->r", J_t, MinvJT), 1e-8, None)

    # bias: b = J v_free + baumgarte + restitution (contacts), limit bias
    b = v_free @ J_t  # (nrows,)
    if ncon:
        active = contacts.depth > 0.0
        v_n_pre = b[:ncon]
        rest = contacts.restitution * jnp.where(
            v_n_pre < -cfg.restitution_threshold, v_n_pre, 0.0
        )
        pen = jnp.maximum(contacts.depth - cfg.contact_slop, 0.0)
        bias_n = -jnp.minimum(
            cfg.baumgarte / dt * pen, cfg.max_depenetration_velocity
        ) + rest
        b = b.at[:ncon].add(bias_n)
    if n_lim:
        li = jnp.asarray(lim_idx)
        lo = (jnp.asarray(model.dof_limit_lower) if limit_lower is None
              else limit_lower)[li]
        hi = (jnp.asarray(model.dof_limit_upper) if limit_upper is None
              else limit_upper)[li]
        q_lim = q_arts[li]
        viol_lo = jnp.maximum(lo - q_lim, 0.0)
        viol_hi = jnp.maximum(q_lim - hi, 0.0)
        gap_lo = jnp.maximum(q_lim - lo, 0.0)
        gap_hi = jnp.maximum(hi - q_lim, 0.0)
        # inside the limit: ALLOW approach at up to gap/dt (the joint may
        # reach — but not pass — the limit this step); a zero bias here
        # would clamp all motion toward the limit the moment the activation
        # window opens (gripper fingers closing near q=0 froze mid-grasp).
        # Violated: Baumgarte push-out as before.
        bias_l = jnp.concatenate(
            [
                gap_lo / dt - cfg.limit_baumgarte / dt * viol_lo,
                gap_hi / dt - cfg.limit_baumgarte / dt * viol_hi,
            ]
        )
        lim_active = jnp.concatenate(
            [(q_lim - lo) < 0.05, (hi - q_lim) < 0.05]
        )
        b = b.at[3 * ncon :].add(bias_l)
    else:
        lim_active = jnp.zeros((0,), dtype=bool)

    if ncon:
        con_active = jnp.tile(contacts.depth > 0.0, 3)
    else:
        con_active = jnp.zeros((0,), dtype=bool)
    row_active = jnp.concatenate([con_active, lim_active])
    b = jnp.where(row_active, b, 0.0)

    mu = contacts.friction if ncon else jnp.zeros((0,))

    lam0 = (
        warm_lambda
        if warm_lambda is not None and warm_lambda.shape == (nrows,)
        else jnp.zeros(nrows)
    )
    lam0 = jnp.where(row_active, lam0, 0.0)

    # Per-contact diagonal preconditioning: without it APGD's single global
    # step size (1/L) is set by the heaviest rows, so contacts on light
    # bodies (gripper finger vs 60 g peg: effective mass ~100x below a
    # trunk-ground contact) build almost no impulse in a fixed iteration
    # budget and grips slip at ~1/10 the commanded force. Scaling each
    # contact's [n, t1, t2] rows by the SAME 1/sqrt(diag_n) preserves the
    # friction cone exactly while equalizing convergence across mass scales.
    scale = _row_precond_scale(diag, ncon, n_lim)
    J_t_s = J_t * scale[None, :]
    MinvJT_s = MinvJT * scale[None, :]
    b_s = b * scale
    diag_s = diag * scale * scale
    lam0_s = lam0 / scale

    # dispatch: pure-XLA APGD when called unbatched; under the engine's env
    # vmap the custom_vmap rule routes the whole batch to the Pallas kernel
    # (pallas_solver.py) with the Jacobian resident in VMEM
    from .pallas_solver import make_apgd_dispatch

    dispatch = make_apgd_dispatch(
        ncon, n_lim, cfg.iterations,
        lambda J_t_, MinvJT_, b_, diag_, active_f_, mu_, lam0_: apgd_solve(
            J_t_, MinvJT_, b_, diag_, active_f_ > 0.5, mu_, lam0_, ncon,
            n_lim, cfg.iterations,
        ),
    )
    mu_arg = mu if ncon else jnp.zeros((0,), J_t.dtype)
    lam = scale * dispatch(
        J_t_s, MinvJT_s, b_s, diag_s, row_active.astype(J_t.dtype), mu_arg,
        lam0_s,
    )

    qd = v_free + MinvJT @ lam
    if ncon:
        imp = jnp.stack(
            [lam[:ncon], lam[ncon : 2 * ncon], lam[2 * ncon : 3 * ncon]], axis=-1
        )
        t1, t2 = tangent_basis(contacts.normal)
        contact_force_w = (
            contacts.normal * imp[:, 0:1] + t1 * imp[:, 1:2] + t2 * imp[:, 2:3]
        ) / dt
    else:
        imp = jnp.zeros((0, 3))
        contact_force_w = jnp.zeros((0, 3))
    return SolveResult(qd=qd, contact_impulse=imp, contact_force_w=contact_force_w)


def solve_constraints_batch(
    model: RobotModel,
    kin_b,  # batched Kinematics (leading E)
    L_comps,  # Cholesky components from fused.free_dynamics_batch
    v_free,  # (E, nv)
    contacts_b,  # Contacts with (E, ncon, ...) dynamic fields, static bodies
    q_arts,  # (E, nu)
    dt: float,
    cfg: SolverCfg,
    limit_lower=None,  # (E, nu)
    limit_upper=None,
    warm_lambda=None,  # (E, nrows)
):
    """Batch-level constraint solve on the batch-last dynamics path.

    Same math as :func:`solve_constraints` (vmapped), but M^-1 J^T comes from
    (E, R)-slab substitution over the fused Cholesky components instead of a
    per-env unrolled solve on tile-padded (E, nv, nv) operands.
    """
    from .collision import Contacts
    from .fused import chol_solve_slabs

    E = v_free.shape[0]
    ncon = contacts_b.depth.shape[1]
    lim_idx = limited_dofs(model)
    n_lim = 2 * len(lim_idx)
    nrows = 3 * ncon + n_lim

    if nrows == 0:
        return SolveResult(
            qd=v_free,
            contact_impulse=jnp.zeros((E, 0, 3)),
            contact_force_w=jnp.zeros((E, 0, 3)),
        )

    # NOTE on the retired Pallas contact kernel (round 4/5 decision): a fused
    # VMEM-resident kernel (Jacobian assembly + triangular solves + APGD in
    # one pallas_call) measured 3.2x SLOWER than this XLA path on rough
    # locomotion — its env-block grid serializes on the single TensorCore and
    # VMEM capped blocks at 56-88 envs, so the batch ran as ~50-150
    # sequential latency-bound blocks while XLA runs full-batch (4096-wide)
    # fused vector ops. The XLA path IS the design; see
    # artifacts/r05/PERF_NOTES.md.
    if ncon:
        J_t = contact_jacobians_t_batch(model, kin_b, contacts_b)
    else:
        J_t = jnp.zeros((E, model.nv, 0))

    # ---- static active-set compaction (cfg.active_contacts = K) ----
    # keep the K deepest candidates per env: the Delassus substitution and
    # APGD sweeps re-read (E, nv, R) every pass, so row count IS the HBM
    # bill; selection/scatter are cheap (E, K) gathers. Exact whenever at
    # most K candidates touch (depth > 0) — the dropped rows are the
    # shallowest-separated ones, which carry zero impulse anyway.
    K = int(getattr(cfg, "active_contacts", 0) or 0)
    compacted = bool(ncon and 0 < K < ncon)
    ncon_full = ncon
    sel_W = None
    if compacted:
        _, sel = jax.lax.top_k(contacts_b.depth, K)  # (E, K)
        # one-hot selection matrix: gathers/scatters become batched MXU
        # matmuls. take_along_axis on (E, nv, 3ncon) lowered to scattered
        # element DMAs and measured 14 ms/substep at shadow sizes (device
        # trace r4); the equivalent (nv, ncon)x(ncon, K) contraction is a
        # single padded MXU pass per env.
        sel_W = (
            sel[..., None] == jnp.arange(ncon)[None, None, :]
        ).astype(J_t.dtype)  # (E, K, ncon)
        Wt = jnp.swapaxes(sel_W, 1, 2)  # (E, ncon, K)
        J_t = jnp.concatenate(
            [
                jnp.einsum("evc,eck->evk", J_t[:, :, g * ncon:(g + 1) * ncon],
                           Wt)
                for g in range(3)
            ],
            axis=2,
        )

        def g2(x):  # (E, ncon) -> (E, K)
            return jnp.einsum("ekc,ec->ek", sel_W, x)

        def g3(x):  # (E, ncon, 3) -> (E, K, 3)
            return jnp.einsum("ekc,ecd->ekd", sel_W, x)

        contacts_b = contacts_b._replace(
            pos=g3(contacts_b.pos), normal=g3(contacts_b.normal),
            depth=g2(contacts_b.depth), friction=g2(contacts_b.friction),
            restitution=g2(contacts_b.restitution),
        )
        if warm_lambda is not None and warm_lambda.shape == (
            E, 3 * ncon + n_lim,
        ):
            warm_lambda = jnp.concatenate(
                [g2(warm_lambda[:, g * ncon:(g + 1) * ncon]) for g in range(3)]
                + [warm_lambda[:, 3 * ncon:]],
                axis=1,
            )
        ncon = K
        nrows = 3 * K + n_lim
    if n_lim:
        lim_block = jnp.broadcast_to(
            jnp.asarray(limit_rows_t(model), J_t.dtype)[None],
            (E, model.nv, n_lim),
        )
        J_t = jnp.concatenate([J_t, lim_block], axis=2)

    MinvJT = chol_solve_slabs(L_comps, J_t)  # (E, nv, nrows)
    diag = jnp.clip(jnp.einsum("evr,evr->er", J_t, MinvJT), 1e-8, None)

    b = jnp.einsum("ev,evr->er", v_free, J_t)
    if ncon:
        v_n_pre = b[:, :ncon]
        rest = contacts_b.restitution * jnp.where(
            v_n_pre < -cfg.restitution_threshold, v_n_pre, 0.0
        )
        pen = jnp.maximum(contacts_b.depth - cfg.contact_slop, 0.0)
        b = b.at[:, :ncon].add(
            -jnp.minimum(cfg.baumgarte / dt * pen,
                         cfg.max_depenetration_velocity)
            + rest
        )
    if n_lim:
        li = jnp.asarray(lim_idx)
        lo = (jnp.broadcast_to(jnp.asarray(model.dof_limit_lower), q_arts.shape)
              if limit_lower is None else limit_lower)[:, li]
        hi = (jnp.broadcast_to(jnp.asarray(model.dof_limit_upper), q_arts.shape)
              if limit_upper is None else limit_upper)[:, li]
        q_lim = q_arts[:, li]
        viol_lo = jnp.maximum(lo - q_lim, 0.0)
        viol_hi = jnp.maximum(q_lim - hi, 0.0)
        gap_lo = jnp.maximum(q_lim - lo, 0.0)
        gap_hi = jnp.maximum(hi - q_lim, 0.0)
        # allow approach at up to gap/dt inside the limit (see
        # solve_constraints); Baumgarte push-out only when violated
        b = b.at[:, 3 * ncon:].add(
            jnp.concatenate([gap_lo, gap_hi], axis=1) / dt
            - cfg.limit_baumgarte / dt
            * jnp.concatenate([viol_lo, viol_hi], axis=1)
        )
        lim_active = jnp.concatenate(
            [(q_lim - lo) < 0.05, (hi - q_lim) < 0.05], axis=1
        )
    else:
        lim_active = jnp.zeros((E, 0), dtype=bool)

    con_active = (
        jnp.tile(contacts_b.depth > 0.0, (1, 3))
        if ncon
        else jnp.zeros((E, 0), dtype=bool)
    )
    row_active = jnp.concatenate([con_active, lim_active], axis=1)
    b = jnp.where(row_active, b, 0.0)

    mu = contacts_b.friction if ncon else jnp.zeros((E, 0))
    lam0 = (
        warm_lambda
        if warm_lambda is not None and warm_lambda.shape == (E, nrows)
        else jnp.zeros((E, nrows))
    )
    lam0 = jnp.where(row_active, lam0, 0.0)

    # per-contact diagonal preconditioning (see solve_constraints): equalizes
    # convergence across light/heavy body pairs while preserving the cone
    scale = _row_precond_scale(diag, ncon, n_lim)  # (E, nrows)
    J_t_s = J_t * scale[:, None, :]
    MinvJT_s = MinvJT * scale[:, None, :]
    b_s = b * scale
    diag_s = diag * scale * scale
    lam0_s = lam0 / scale

    from .pallas_solver import make_apgd_dispatch

    dispatch = make_apgd_dispatch(
        ncon, n_lim, cfg.iterations,
        lambda J_t_, MinvJT_, b_, diag_, active_f_, mu_, lam0_: apgd_solve(
            J_t_, MinvJT_, b_, diag_, active_f_ > 0.5, mu_, lam0_, ncon,
            n_lim, cfg.iterations,
        ),
    )
    lam = scale * jax.vmap(dispatch)(
        J_t_s, MinvJT_s, b_s, diag_s, row_active.astype(J_t.dtype), mu,
        lam0_s,
    )

    qd = v_free + jnp.einsum("evr,er->ev", MinvJT, lam)
    if ncon:
        imp = jnp.stack(
            [lam[:, :ncon], lam[:, ncon:2 * ncon], lam[:, 2 * ncon:3 * ncon]],
            axis=-1,
        )
        t1, t2 = tangent_basis(contacts_b.normal)
        contact_force_w = (
            contacts_b.normal * imp[..., 0:1]
            + t1 * imp[..., 1:2]
            + t2 * imp[..., 2:3]
        ) / dt
        if compacted:
            # scatter the K solved slots back into full candidate layout
            # (contact sensors and warm start live in candidate space) —
            # as the transposed one-hot matmul, like the gather
            def scat(vals):  # (E, K, 3) -> (E, ncon_full, 3)
                return jnp.einsum("ekc,ekd->ecd", sel_W, vals)

            imp = scat(imp)
            contact_force_w = scat(contact_force_w)
    else:
        imp = jnp.zeros((E, 0, 3))
        contact_force_w = jnp.zeros((E, 0, 3))
    return SolveResult(qd=qd, contact_impulse=imp,
                       contact_force_w=contact_force_w)


def apgd_solve(J_t, MinvJT, b, diag, row_active, mu, lam0, ncon, n_lim,
               iterations):
    """Accelerated projected gradient descent over the grouped-row CCP.

    Pure-XLA reference implementation; the Pallas TPU kernel in
    :mod:`pallas_solver` computes the same iteration with the Jacobian
    resident in VMEM.
    """
    active_f = row_active.astype(J_t.dtype)

    def A_mv(x):
        return (J_t * (MinvJT @ (x * active_f))[:, None]).sum(0) * active_f

    def project(lam):
        if ncon:
            lam_n = jnp.maximum(lam[:ncon], 0.0)
            t1 = lam[ncon : 2 * ncon]
            t2 = lam[2 * ncon : 3 * ncon]
            t_norm = jnp.sqrt(t1 * t1 + t2 * t2)
            max_t = mu * lam_n
            scale = jnp.where(
                t_norm > max_t, max_t / jnp.maximum(t_norm, 1e-9), 1.0
            )
            lam = jnp.concatenate(
                [lam_n, t1 * scale, t2 * scale, jnp.maximum(lam[3 * ncon :], 0.0)]
            )
        else:
            lam = jnp.maximum(lam, 0.0)
        return lam * active_f

    if ncon:
        # Lipschitz constant via matrix-free power iteration
        def power_body(_, v):
            av = A_mv(v)
            return av / jnp.maximum(jnp.linalg.norm(av), 1e-12)

        v0 = active_f / jnp.maximum(jnp.linalg.norm(active_f), 1e-12)
        v = jax.lax.fori_loop(0, 6, power_body, v0)
        # step-size floor over ACTIVE rows only: inactive rows can carry
        # arbitrarily skewed diag values (per-contact preconditioning scales
        # tangent rows by the NORMAL row's diag; a masked row's ratio can be
        # ~1e6), and folding them into L once collapsed inv_L to ~1e-6 and
        # silently zeroed every grasp impulse
        # 1e-8 floor: with NO active rows both terms are zero and inv_L
        # would be inf (NaN through the masked updates)
        L = jnp.maximum(
            jnp.maximum(jnp.linalg.norm(A_mv(v)), jnp.max(diag * active_f)),
            1e-8,
        )
    else:
        # limit-only: rows couple weakly (lo/hi pairs share a dof) — 2x the
        # diagonal bounds the spectral norm
        L = 2.0 * jnp.maximum(jnp.max(diag * active_f), 1e-8)
    inv_L = 1.0 / (1.1 * L)

    def apgd_body(_, carry):
        lam, y, theta = carry
        g = A_mv(y) + b
        lam_new = project(y - inv_L * g)
        theta_new = 0.5 * (jnp.sqrt(theta**4 + 4.0 * theta**2) - theta**2)
        beta = theta * (1.0 - theta) / (theta**2 + theta_new)
        y_new = lam_new + beta * (lam_new - lam)
        return lam_new, y_new, theta_new

    lam, _, _ = jax.lax.fori_loop(
        0, iterations, apgd_body, (lam0, lam0, jnp.asarray(1.0, dtype=J_t.dtype))
    )
    return lam
