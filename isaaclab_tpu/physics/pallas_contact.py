"""Fused Pallas TPU kernel for the whole constraint solve.

Why: at shadow-hand scale (E=8192, nv=29, nrows=280 pre-pruning) the XLA
formulation materializes ``J_t`` and ``M^-1 J^T`` as (E, nv, R) HBM tensors
(~384 MiB each after (8,128) tile padding) and the APGD loop re-reads both
on every one of its ~29 matrix-vector products — ~22 GiB of HBM traffic per
substep. This kernel instead consumes only the SMALL per-env inputs
(contact points/normals/depths, per-dof axis/anchor vectors, packed Cholesky
components, v_free — a few KiB per env), assembles the constraint Jacobian
IN VMEM, runs the triangular substitutions, bias/preconditioning and the
complete accelerated-projected-gradient loop on-chip, and writes back only
``lambda`` (E, R) and the corrected ``qd`` (E, nv). HBM traffic drops ~400x
to ~50 MiB per substep at E=8192.

Mosaic-shaped: every tensor in the kernel is 2D — (BE, R), (BE, ncon) or
(BE, 1) — with the constraint-row dimension on vector lanes. The Jacobian
lives as a python list of nv per-dof rows; per-dof branching (rotational vs
prismatic axis columns, ancestor masks) is resolved at TRACE time from the
static model, so the emitted code has no selects over dof type and no 3D
relayouts (ND broadcasts/stacks trip "Invalid vector register cast" in the
Mosaic lowering).

Same math as :func:`solver.solve_constraints_batch` (the pure-XLA reference
path); equivalence is asserted in ``tests/test_pallas_contact.py`` via the
interpreter on CPU and the same tests compile the real kernel on TPU.

Reference context: replaces PhysX's GPU constraint solver block
(SURVEY.md §2.10 row 1; reference ``PhysxCfg`` knobs sim/simulation_cfg.py).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def use_fused_contact_kernel(ncon: int) -> bool:
    """OPT-IN (ISAACLAB_TPU_FUSED_SOLVER=1 forces the kernel, =0 the XLA
    path; interpret mode off-TPU for CPU equivalence tests).

    Benched OFF by default in round 4: the Pallas grid runs its env-blocks
    SEQUENTIALLY on the single TensorCore, and VMEM limits cap the block at
    56-88 envs (adaptive sizing below) — at rough-locomotion scale the
    serialized kernel measured 16.7k env-steps/s vs 52.7k for the XLA path
    (BENCH r3 vs r4 run 1), and the shadow workload timed out outright.
    The XLA path's HBM bill is attacked with static active-set compaction
    instead (solver.SolverCfg.active_contacts)."""
    flag = os.environ.get("ISAACLAB_TPU_FUSED_SOLVER")
    if flag is not None:
        return flag != "0"
    return False


def _interpret_mode() -> bool:
    if os.environ.get("ISAACLAB_TPU_PALLAS_INTERPRET", "0") == "1":
        return True
    try:
        return jax.default_backend() not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True


class SolverStatics(NamedTuple):
    """Trace-time constants baked into the kernel closure (per model+plan)."""

    nv: int
    ncon: int
    n_lim: int
    is_rot: tuple  # (nv,) python 0/1 — resolved at trace time
    has_contact_dof: tuple  # (nv,) python bool: any nonzero mask entry
    chol_nonzero: tuple  # ((i, j), ...) nonzero lower-tri Cholesky slots
    iterations: int
    dt: float
    baumgarte: float
    contact_slop: float
    restitution_threshold: float
    max_depenetration_velocity: float
    limit_baumgarte: float


def _contact_solve_kernel(
    st: SolverStatics,
    # grid-invariant statics as inputs (Pallas forbids captured array
    # constants):
    mask_ref,  # (nv, ncon) net ancestor mask (mask_a - mask_b)
    limrows_ref,  # (nv, max(n_lim, 1)) static limit-row block
    # per-env blocks:
    axis_ref,  # (BE, 3*nv)   column v*3+k
    anchor_ref,  # (BE, 3*nv)
    cpos_ref,  # (BE, 3*ncon) block k*ncon:(k+1)*ncon
    cnrm_ref,  # (BE, 3*ncon)
    depth_ref,  # (BE, ncon)
    mu_ref,  # (BE, ncon)
    rest_ref,  # (BE, ncon)
    Lp_ref,  # (BE, n_chol) packed nonzero Cholesky components
    vfree_ref,  # (BE, nv)
    qlim_ref,  # (BE, max(n_limited, 1))
    lo_ref,  # (BE, max(n_limited, 1))
    hi_ref,  # (BE, max(n_limited, 1))
    warm_ref,  # (BE, R)
    lam_out,  # (BE, R)
    qd_out,  # (BE, nv)
):
    nv, ncon, n_lim = st.nv, st.ncon, st.n_lim
    depth = depth_ref[:]  # (BE, ncon)
    BE = depth.shape[0]

    def ck(ref, k):  # contact-array component k -> (BE, ncon)
        return ref[:, k * ncon:(k + 1) * ncon]

    n = [ck(cnrm_ref, k) for k in range(3)]
    p = [ck(cpos_ref, k) for k in range(3)]

    # ---- tangent basis (solver.tangent_basis exactly) ----
    use_x = jnp.abs(n[0]) < 0.9
    ax_ = jnp.where(use_x, 1.0, 0.0)
    ay_ = jnp.where(use_x, 0.0, 1.0)
    t1 = [-n[2] * ay_, n[2] * ax_, n[0] * ay_ - n[1] * ax_]
    t1nrm = jnp.sqrt(t1[0] ** 2 + t1[1] ** 2 + t1[2] ** 2)
    inv_t1 = 1.0 / jnp.maximum(t1nrm, 1e-9)
    t1 = [c * inv_t1 for c in t1]
    t2 = [
        n[1] * t1[2] - n[2] * t1[1],
        n[2] * t1[0] - n[0] * t1[2],
        n[0] * t1[1] - n[1] * t1[0],
    ]

    # ---- J rows: per dof v, one (BE, R) lane vector ----
    # col_k(v) = (is_rot ? cross(axis_v, p - anchor_v)_k : axis_v_k) * mask_v
    lim_pad = limrows_ref.shape[1]
    J = []
    for v in range(nv):
        mask_v = mask_ref[v:v + 1, :]  # (1, ncon) static per dof
        if st.has_contact_dof[v]:
            a = [axis_ref[:, 3 * v + k:3 * v + k + 1] for k in range(3)]
            if st.is_rot[v]:
                r = [p[k] - anchor_ref[:, 3 * v + k:3 * v + k + 1]
                     for k in range(3)]
                col = [
                    a[1] * r[2] - a[2] * r[1],
                    a[2] * r[0] - a[0] * r[2],
                    a[0] * r[1] - a[1] * r[0],
                ]
            else:
                col = [jnp.broadcast_to(a[k], (BE, ncon)) for k in range(3)]
            col = [c * mask_v for c in col]
            row_n = col[0] * n[0] + col[1] * n[1] + col[2] * n[2]
            row_t1 = col[0] * t1[0] + col[1] * t1[1] + col[2] * t1[2]
            row_t2 = col[0] * t2[0] + col[1] * t2[1] + col[2] * t2[2]
        else:
            row_n = row_t1 = row_t2 = jnp.zeros((BE, ncon))
        parts = [row_n, row_t1, row_t2]
        if n_lim:
            parts.append(jnp.broadcast_to(
                limrows_ref[v:v + 1, :n_lim], (BE, n_lim)))
        J.append(jnp.concatenate(parts, axis=1))  # (BE, R)

    # ---- M^-1 J^T via packed-Cholesky substitution over (BE, R) rows ----
    Lp = Lp_ref[:]
    idx = {ij: k for k, ij in enumerate(st.chol_nonzero)}

    def Lc(i, j):
        k = idx.get((i, j))
        return None if k is None else Lp[:, k:k + 1]  # (BE, 1)

    y = [None] * nv
    for i in range(nv):
        s = J[i]
        for k in range(i):
            c = Lc(i, k)
            if c is not None:
                s = s - c * y[k]
        y[i] = s / Lc(i, i)
    MJ = [None] * nv
    for i in reversed(range(nv)):
        s = y[i]
        for k in range(i + 1, nv):
            c = Lc(k, i)
            if c is not None:
                s = s - c * MJ[k]
        MJ[i] = s / Lc(i, i)

    diag = sum(J[v] * MJ[v] for v in range(nv))
    diag = jnp.clip(diag, 1e-8, None)  # (BE, R)

    # ---- bias + active mask (solver.solve_constraints_batch exactly) ----
    b = sum(vfree_ref[:, v:v + 1] * J[v] for v in range(nv))  # (BE, R)
    dt = st.dt
    v_n_pre = b[:, :ncon]
    restc = rest_ref[:] * jnp.where(
        v_n_pre < -st.restitution_threshold, v_n_pre, 0.0)
    pen = jnp.maximum(depth - st.contact_slop, 0.0)
    bias_n = -jnp.minimum(
        st.baumgarte / dt * pen, st.max_depenetration_velocity) + restc
    segs = [b[:, :ncon] + bias_n, b[:, ncon:3 * ncon]]
    if n_lim:
        q_lim = qlim_ref[:]
        lo = lo_ref[:]
        hi = hi_ref[:]
        viol_lo = jnp.maximum(lo - q_lim, 0.0)
        viol_hi = jnp.maximum(q_lim - hi, 0.0)
        gap_lo = jnp.maximum(q_lim - lo, 0.0)
        gap_hi = jnp.maximum(hi - q_lim, 0.0)
        bias_l = jnp.concatenate([gap_lo, gap_hi], axis=1) / dt - (
            st.limit_baumgarte / dt
        ) * jnp.concatenate([viol_lo, viol_hi], axis=1)
        segs.append(b[:, 3 * ncon:] + bias_l)
        # cast BEFORE concatenating: bool (i1) vector concats are an
        # "Invalid vector register cast" in the Mosaic lowering
        lim_active = jnp.concatenate(
            [((q_lim - lo) < 0.05).astype(jnp.float32),
             ((hi - q_lim) < 0.05).astype(jnp.float32)], axis=1)
    b = jnp.concatenate(segs, axis=1)
    touch = (depth > 0.0).astype(jnp.float32)
    con_active = jnp.concatenate([touch] * 3, axis=1)
    if n_lim:
        act = jnp.concatenate([con_active, lim_active], axis=1)
    else:
        act = con_active
    b = b * act

    # ---- per-contact cone-preserving preconditioning ----
    s_n = 1.0 / jnp.sqrt(jnp.clip(diag[:, :ncon], 1e-8, None))
    s_parts = [s_n, s_n, s_n]
    if n_lim:
        s_parts.append(
            1.0 / jnp.sqrt(jnp.clip(diag[:, 3 * ncon:], 1e-8, None)))
    scale = jnp.concatenate(s_parts, axis=1)
    b_s = b * scale
    diag_s = diag * scale * scale
    lam0 = warm_ref[:] * act / scale

    # ---- scaled matvec (scale folded in; J/MJ stay unscaled) ----
    def A_mv(xv):  # (BE, R) -> (BE, R); A_s = S J M^-1 J^T S, masked
        xs = xv * scale * act
        out = None
        for v in range(nv):
            t_v = jnp.sum(MJ[v] * xs, axis=1, keepdims=True)  # (BE, 1)
            out = J[v] * t_v if out is None else out + J[v] * t_v
        return out * scale * act

    mu = mu_ref[:]

    def project(lam):
        lam_n = jnp.maximum(lam[:, :ncon], 0.0)
        t1v = lam[:, ncon:2 * ncon]
        t2v = lam[:, 2 * ncon:3 * ncon]
        t_norm = jnp.sqrt(t1v * t1v + t2v * t2v)
        max_t = mu * lam_n
        sc = jnp.where(t_norm > max_t,
                       max_t / jnp.maximum(t_norm, 1e-9), 1.0)
        parts_ = [lam_n, t1v * sc, t2v * sc]
        if n_lim:
            parts_.append(jnp.maximum(lam[:, 3 * ncon:], 0.0))
        return jnp.concatenate(parts_, axis=1) * act

    def power_body(_, v):
        av = A_mv(v)
        nrm = jnp.sqrt(jnp.sum(av * av, axis=1, keepdims=True))
        return av / jnp.maximum(nrm, 1e-12)

    nrm0 = jnp.sqrt(jnp.sum(act * act, axis=1, keepdims=True))
    v0 = act / jnp.maximum(nrm0, 1e-12)
    v0 = jax.lax.fori_loop(0, 6, power_body, v0)
    av = A_mv(v0)
    Lip = jnp.maximum(
        jnp.maximum(
            jnp.sqrt(jnp.sum(av * av, axis=1, keepdims=True)),
            jnp.max(diag_s * act, axis=1, keepdims=True),
        ),
        1e-8,
    )
    inv_L = 1.0 / (1.1 * Lip)

    def apgd_body(_, carry):
        lam, yv, theta = carry
        g = A_mv(yv) + b_s
        lam_new = project(yv - inv_L * g)
        theta_new = 0.5 * (jnp.sqrt(theta**4 + 4.0 * theta**2) - theta**2)
        beta = theta * (1.0 - theta) / (theta**2 + theta_new)
        y_new = lam_new + beta * (lam_new - lam)
        return lam_new, y_new, theta_new

    theta0 = jnp.ones_like(Lip)
    lam_s, _, _ = jax.lax.fori_loop(
        0, st.iterations, apgd_body, (lam0, lam0, theta0))
    lam = lam_s * scale  # unscaled impulses

    lam_out[:] = lam
    qd_cols = [
        vfree_ref[:, v:v + 1] + jnp.sum(MJ[v] * lam, axis=1, keepdims=True)
        for v in range(nv)
    ]
    qd_out[:] = jnp.concatenate(qd_cols, axis=1)


def pack_chol(L_comps, E):
    """Fused-path Cholesky components (nested tuple with python-float
    structural zeros) -> ((E, n_nonzero) array, static nonzero index list).
    Constant (env-independent) components broadcast to (E,)."""
    nonzero = []
    cols = []
    nv = len(L_comps)
    for i in range(nv):
        for j in range(i + 1):
            c = L_comps[i][j]
            if isinstance(c, float) and c == 0.0:
                continue
            nonzero.append((i, j))
            if hasattr(c, "shape") and c.ndim == 1:
                cols.append(c)
            else:
                cols.append(jnp.broadcast_to(jnp.asarray(c, jnp.float32), (E,)))
    packed = jnp.stack(cols, axis=1) if cols else jnp.zeros((E, 0))
    return packed, tuple(nonzero)


def contact_solve_fused(
    model,
    kin_b,  # batched Kinematics (E leading)
    L_comps,  # fused.free_dynamics_batch Cholesky components
    v_free,  # (E, nv)
    contacts_b,  # Contacts with (E, ncon, 3) fields and static bodies
    q_arts,  # (E, nu)
    dt,
    cfg,
    limit_lower,  # (E, nu)
    limit_upper,
    warm_lambda,  # (E, nrows)
    block_envs: int = None,
):
    """Whole-batch constraint solve through the fused kernel.

    Returns (qd, lam) matching ``solve_constraints_batch``'s qd and the
    grouped-row impulse vector [N | T1 | T2 | limits].
    """
    from jax.experimental import pallas as pl

    from .model import JOINT_PRISMATIC
    from .solver import ancestor_mask, limit_rows_t, limited_dofs

    E = v_free.shape[0]
    ncon = contacts_b.depth.shape[1]
    lim_idx = limited_dofs(model)
    n_lim = 2 * len(lim_idx)
    R = 3 * ncon + n_lim
    nv = model.nv

    Lp, nonzero = pack_chol(L_comps, E)

    # static per-dof data
    is_rot = [1] * nv
    for bb in range(model.nbody):
        vs, vd = int(model.v_start[bb]), int(model.v_dim[bb])
        jt = int(model.jnt_type[bb])
        if vd == 1 and jt == JOINT_PRISMATIC:
            is_rot[vs] = 0
        elif vd == 6:
            for k in range(3):
                is_rot[vs + 3 + k] = 0
    mask = ancestor_mask(model)  # (nbody, nv)
    ba = np.asarray(contacts_b.body_a)
    bb_ = np.asarray(contacts_b.body_b)
    mask_a = mask[ba].T.astype(np.float32)  # (nv, ncon)
    mask_b = mask[np.maximum(bb_, 0)].T.astype(np.float32)
    mask_b = mask_b * (bb_ >= 0).astype(np.float32)[None, :]
    mask_net = mask_a - mask_b

    statics = SolverStatics(
        nv=nv,
        ncon=ncon,
        n_lim=n_lim,
        is_rot=tuple(is_rot),
        has_contact_dof=tuple(bool(np.any(mask_net[v] != 0.0))
                              for v in range(nv)),
        chol_nonzero=nonzero,
        iterations=cfg.iterations,
        dt=float(dt),
        baumgarte=cfg.baumgarte,
        contact_slop=cfg.contact_slop,
        restitution_threshold=cfg.restitution_threshold,
        max_depenetration_velocity=cfg.max_depenetration_velocity,
        limit_baumgarte=cfg.limit_baumgarte,
    )

    # zero-size blocks are illegal: limit-free models ship a 1-wide dummy
    # (the kernel's n_lim=0 branches never read it)
    if n_lim:
        li = np.asarray(lim_idx)
        q_lim = q_arts[:, li]
        lo = limit_lower[:, li]
        hi = limit_upper[:, li]
    else:
        q_lim = lo = hi = jnp.zeros((E, 1))

    warm = (
        warm_lambda
        if warm_lambda is not None and warm_lambda.shape == (E, R)
        else jnp.zeros((E, R))
    )

    # 2D-flatten the vector inputs (kernel slices columns)
    axis2 = kin_b.dof_axis_w.reshape(E, 3 * nv)  # col v*3+k
    anchor2 = kin_b.dof_anchor_w.reshape(E, 3 * nv)
    # contacts (E, ncon, 3) -> (E, 3*ncon) with k-major blocks
    cpos2 = jnp.swapaxes(contacts_b.pos, 1, 2).reshape(E, 3 * ncon)
    cnrm2 = jnp.swapaxes(contacts_b.normal, 1, 2).reshape(E, 3 * ncon)

    if block_envs is None:
        # VMEM-budgeted block size. Live-buffer model (empirical, calibrated
        # on the Anymal-rough OOM: BE=256, nv=18, R=108, n_chol~120 hit
        # 29.5 MiB of the 16 MiB scoped limit): the J/MJ/y row lists hold
        # ~3*nv (BE, R) f32 buffers plus ~24 temporaries, and every packed-
        # Cholesky (BE, 1) slice pads its lane dim to 128 (512 B/env each).
        n_chol = len(nonzero)
        per_env = 4 * R * (3 * nv + 24) + 512 * n_chol
        budget = 11 * 2**20  # leave headroom under the 16 MiB scoped limit
        block_envs = max(8, min(256, int(budget / (1.3 * per_env)) // 8 * 8))
    BE = min(block_envs, E)
    pad = (-E) % BE
    mask_in = jnp.asarray(mask_net, jnp.float32)
    limrows_in = jnp.asarray(
        limit_rows_t(model) if n_lim else np.zeros((nv, 1)), jnp.float32)
    inputs = [
        axis2, anchor2, cpos2, cnrm2,
        contacts_b.depth, contacts_b.friction, contacts_b.restitution,
        Lp, v_free, q_lim, lo, hi, warm,
    ]
    if pad:
        def padv(x):
            widths = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
            return jnp.pad(x, widths)

        inputs = [padv(x) for x in inputs]
        # padded envs: keep the Cholesky diagonal 1 to avoid 0/0 in the
        # substitution (their outputs are discarded)
        Lp_p = inputs[7]
        diag_slots = [k for k, (i, j) in enumerate(nonzero) if i == j]
        if diag_slots:
            upd = jnp.zeros((pad, Lp_p.shape[1]))
            upd = upd.at[:, jnp.asarray(diag_slots)].set(1.0)
            inputs[7] = Lp_p.at[E:].add(upd)
    Ep = E + pad

    kernel = functools.partial(_contact_solve_kernel, statics)

    def static_spec(x):
        nd = x.ndim
        return pl.BlockSpec(x.shape, lambda i, nd=nd: (0,) * nd)

    def spec(x):
        blk = (BE,) + x.shape[1:]
        nd = x.ndim
        return pl.BlockSpec(blk, lambda i, nd=nd: (i,) + (0,) * (nd - 1))

    static_inputs = [mask_in, limrows_in]
    lam, qd = pl.pallas_call(
        kernel,
        grid=(Ep // BE,),
        in_specs=[static_spec(x) for x in static_inputs]
        + [spec(x) for x in inputs],
        out_specs=[
            pl.BlockSpec((BE, R), lambda i: (i, 0)),
            pl.BlockSpec((BE, nv), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Ep, R), jnp.float32),
            jax.ShapeDtypeStruct((Ep, nv), jnp.float32),
        ],
        interpret=_interpret_mode(),
    )(*static_inputs, *inputs)
    return qd[:E], lam[:E]
