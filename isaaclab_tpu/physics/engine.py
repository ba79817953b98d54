"""The batched physics engine: state pytrees and the jitted step function.

TPU-native replacement for ``SimulationContext.step`` + PhysX solve (reference
``sim/simulation_context.py:530``, SURVEY.md §2.2/§2.10): a pure function
``step(model, state, drive, ...) -> state`` specialized per robot model,
vmapped over the env batch axis, designed to live inside ``lax.scan``.

Pipeline per step (all fixed-shape):
  FK -> CRBA (+armature, +implicit-drive diagonal) -> RNEA bias ->
  joint-drive torque -> unconstrained velocity -> collision detect ->
  projected-Jacobi impulse solve (contacts + limits) -> semi-implicit
  integration (quaternion exp for free joints).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import math as math_utils
from . import spatial
from .collision import CollisionPlan, Contacts
from .dynamics import crba, rnea_bias
from .kinematics import Kinematics, forward_kinematics
from .model import JOINT_FREE, JOINT_PRISMATIC, JOINT_REVOLUTE, RobotModel
from .solver import SolverCfg, SolveResult, solve_constraints


def use_fused_path() -> bool:
    """Whether scene stepping should use the batch-last fused dynamics
    (``step_batch``) instead of ``vmap(step)``.

    The fused path trace-time-unrolls all small-matrix algebra into scalar
    lanes — ~10x faster at runtime on TPU, but its large elementwise graphs
    compile ~10x slower under XLA:CPU with no runtime win there (246s vs
    ~25s for an Anymal env step). Default: fused on accelerators, per-env on
    CPU. Override with ISAACLAB_TPU_FUSED=0/1.
    """
    import os

    flag = os.environ.get("ISAACLAB_TPU_FUSED")
    if flag is not None:
        return flag != "0"
    return jax.default_backend() != "cpu"


class JointDrive(NamedTuple):
    """Per-articulated-dof drive targets — the PhysX implicit joint drive
    equivalent (reference articulation.py:196-200 pushes these as
    set_dof_position_targets / velocity_targets / actuation_forces)."""

    kp: jnp.ndarray  # (nu,) stiffness
    kd: jnp.ndarray  # (nu,) damping
    pos_target: jnp.ndarray  # (nu,)
    vel_target: jnp.ndarray  # (nu,)
    effort: jnp.ndarray  # (nu,) feed-forward torque (explicit actuators)

    @staticmethod
    def zero(nu: int) -> "JointDrive":
        z = jnp.zeros(nu)
        return JointDrive(kp=z, kd=z, pos_target=z, vel_target=z, effort=z)


class BodyParams(NamedTuple):
    """Per-env randomizable physical parameters (event-manager targets:
    reference envs/mdp/events.py mass/material randomization)."""

    mass: jnp.ndarray  # (nbody,)
    inertia: jnp.ndarray  # (nbody, 3, 3)
    com: jnp.ndarray  # (nbody, 3)
    armature: jnp.ndarray  # (nu,)
    damping: jnp.ndarray  # (nu,) passive joint damping
    friction_scale: jnp.ndarray  # () contact friction multiplier
    limit_lower: jnp.ndarray  # (nu,)
    limit_upper: jnp.ndarray  # (nu,)
    # fixed tendon properties, per-env randomizable (reference
    # articulation.py:958-1145 set_fixed_tendon_* +
    # events.py:randomize_fixed_tendon_parameters); all (ntendon,)
    tendon_stiffness: jnp.ndarray
    tendon_damping: jnp.ndarray
    tendon_limit_stiffness: jnp.ndarray
    tendon_limit_lower: jnp.ndarray
    tendon_limit_upper: jnp.ndarray
    tendon_rest_length: jnp.ndarray
    tendon_offset: jnp.ndarray
    # world gravity, per-env randomizable (reference
    # events.py:randomize_physics_scene_gravity); (3,)
    gravity: jnp.ndarray
    # per-env contact-candidate activation: scalar 1.0 (all active) or
    # (ncon,) 0/1 — the TPU answer to per-env asset selection (multi-asset
    # random spawn, reference sim/spawners/wrappers/) and per-env collision
    # filtering: inactive candidates are forced to depth -1
    cand_active: jnp.ndarray = None

    @staticmethod
    def from_model(model: RobotModel, gravity=(0.0, 0.0, -9.81)) -> "BodyParams":
        return BodyParams(
            mass=jnp.asarray(model.mass),
            inertia=jnp.asarray(model.inertia),
            com=jnp.asarray(model.com),
            armature=jnp.asarray(model.dof_armature),
            damping=jnp.asarray(model.dof_damping),
            friction_scale=jnp.asarray(1.0),
            limit_lower=jnp.asarray(model.dof_limit_lower),
            limit_upper=jnp.asarray(model.dof_limit_upper),
            tendon_stiffness=jnp.asarray(model.tendon_stiffness),
            tendon_damping=jnp.asarray(model.tendon_damping),
            tendon_limit_stiffness=jnp.asarray(model.tendon_limit_stiffness),
            tendon_limit_lower=jnp.asarray(model.tendon_limit_lower),
            tendon_limit_upper=jnp.asarray(model.tendon_limit_upper),
            tendon_rest_length=jnp.asarray(model.tendon_rest_length),
            tendon_offset=jnp.asarray(model.tendon_offset),
            gravity=jnp.asarray(gravity, dtype=jnp.float32),
            cand_active=jnp.asarray(1.0),
        )


class PhysicsState(NamedTuple):
    """Dynamic state of one articulation instance (single env; batch via vmap)."""

    q: jnp.ndarray  # (nq,)
    qd: jnp.ndarray  # (nv,)
    qd_prev: jnp.ndarray  # (nv,) velocity before the last step (for accels)
    f_ext_w: jnp.ndarray  # (nbody, 6) external world wrenches at body origins
    warm_lambda: jnp.ndarray  # (nrows,) solver warm start
    contact_force_w: jnp.ndarray  # (ncon, 3) last-step contact forces

    @staticmethod
    def create(model: RobotModel, ncon: int, n_lim_rows: int) -> "PhysicsState":
        q = jnp.asarray(model.default_qpos())
        return PhysicsState(
            q=q,
            qd=jnp.zeros(model.nv),
            qd_prev=jnp.zeros(model.nv),
            f_ext_w=jnp.zeros((model.nbody, 6)),
            warm_lambda=jnp.zeros(3 * ncon + n_lim_rows),
            contact_force_w=jnp.zeros((ncon, 3)),
        )


class EngineCfg(NamedTuple):
    """Physics step configuration (reference ``SimulationCfg``,
    sim/simulation_cfg.py:256)."""

    dt: float = 1.0 / 120.0
    gravity: tuple = (0.0, 0.0, -9.81)
    solver: SolverCfg = SolverCfg()
    max_velocity: float = 1e6


def articulated_q(model: RobotModel, q):
    """(nu,) positions of articulated (1-dof) joints extracted from q."""
    if model.nu == 0:
        return jnp.zeros(0)
    idx = []
    for b in model.dof_body:
        idx.append(int(model.q_start[b]))
    return q[jnp.asarray(idx)]


def articulated_qd(model: RobotModel, qd):
    if model.nu == 0:
        return jnp.zeros(0)
    return qd[jnp.asarray(model.dof_v_index)]


def drive_torque(model: RobotModel, drive: JointDrive, q_arts, qd_arts, effort_limit=None):
    """PD drive + feed-forward, clipped to effort limits
    (reference actuator_pd.py:184-198 semantics)."""
    tau = (
        drive.kp * (drive.pos_target - q_arts)
        + drive.kd * (drive.vel_target - qd_arts)
        + drive.effort
    )
    lim = jnp.asarray(model.dof_effort_limit) if effort_limit is None else effort_limit
    return jnp.clip(tau, -lim, lim)


def step(
    model: RobotModel,
    plan: CollisionPlan,
    state: PhysicsState,
    drive: JointDrive,
    params: BodyParams,
    cfg: EngineCfg,
    terrain=None,
    terrain_offset=None,
) -> tuple[PhysicsState, Kinematics, Contacts]:
    """One physics step for a single env instance (vmap over envs outside).

    Returns the new state plus the FK/contact products so sensors and managers
    reuse them without recompute (XLA will CSE anyway; this keeps it explicit).
    """
    dt = cfg.dt
    kin = forward_kinematics(model, state.q)
    q_arts = articulated_q(model, state.q)
    qd_arts = articulated_qd(model, state.qd)

    # mass matrix with armature + implicit drive damping on the diagonal
    # (world-Jacobian formulation: one einsum, MXU-friendly — see crba_world)
    from .solver import crba_world

    H = crba_world(model, kin, params.mass, params.inertia, params.com)
    if model.nu:
        vi = jnp.asarray(model.dof_v_index)
        # implicit damping: folds kd and passive damping into the inertia so
        # stiff PD gains stay stable at large dt (PhysX implicit drive; MJX
        # implicitfast analogue)
        H = H.at[vi, vi].add(params.armature + dt * (drive.kd + params.damping))

    C = rnea_bias(
        model,
        kin,
        state.qd,
        params.gravity,
        f_ext_w=state.f_ext_w,
        mass=params.mass,
        inertia=params.inertia,
        com=params.com,
    )

    tau = jnp.zeros(model.nv)
    if model.nu:
        tau_d = drive_torque(model, drive, q_arts, qd_arts)
        tau_d = tau_d - params.damping * qd_arts
        tau = tau.at[jnp.asarray(model.dof_v_index)].add(tau_d)

    if model.ntendon:
        # fixed tendons: L = offset + coef @ q; spring to rest length plus
        # one-sided limit springs (reference fixed-tendon semantics,
        # articulation.py:958-1145). Stiffness/damping are folded into the
        # inertia as full coupling blocks (implicit Euler on the spring) so
        # shadow-hand-scale limit_stiffness (~30 on ~1e-5 kg m^2 phalanges)
        # stays stable at dt = 1/120.
        coef = jnp.asarray(np.asarray(model.tendon_coef, dtype=np.float32))
        L = params.tendon_offset + coef @ q_arts
        Ldot = coef @ qd_arts
        out_lo = L < params.tendon_limit_lower
        out_hi = L > params.tendon_limit_upper
        lim_err = jnp.where(
            out_lo, params.tendon_limit_lower - L, 0.0
        ) + jnp.where(out_hi, params.tendon_limit_upper - L, 0.0)
        F = (
            params.tendon_stiffness * (params.tendon_rest_length - L)
            - params.tendon_damping * Ldot
            + params.tendon_limit_stiffness * lim_err
        )
        vi = jnp.asarray(model.dof_v_index)
        tau = tau.at[vi].add(coef.T @ F)
        k_eff = params.tendon_stiffness + params.tendon_limit_stiffness * (
            out_lo | out_hi
        )
        K_t = coef.T @ (k_eff[:, None] * coef)
        D_t = coef.T @ (params.tendon_damping[:, None] * coef)
        H = H.at[jnp.ix_(vi, vi)].add(dt * D_t + dt * dt * K_t)

    from .linalg import chol_factor, chol_solve

    H_chol = chol_factor(H)
    qdd_free = chol_solve(H_chol, tau - C)
    v_free = state.qd + dt * qdd_free

    contacts = plan.detect(kin, terrain, terrain_offset)
    contacts = contacts._replace(friction=contacts.friction * params.friction_scale)
    if params.cand_active is not None:
        # per-env candidate activation (multi-asset selection / filtering):
        # inactive candidates read as separated
        contacts = contacts._replace(
            depth=jnp.where(params.cand_active > 0.5, contacts.depth, -1.0)
        )

    result = solve_constraints(
        model,
        kin,
        H_chol,
        v_free,
        contacts,
        q_arts,
        dt,
        cfg.solver,
        limit_lower=params.limit_lower,
        limit_upper=params.limit_upper,
        warm_lambda=state.warm_lambda,
    )

    qd_new = jnp.clip(result.qd, -cfg.max_velocity, cfg.max_velocity)
    q_new = integrate_q(model, state.q, qd_new, dt)

    # warm start uses the solver's grouped row layout [N | T1 | T2 | limits]
    from .solver import num_limit_rows

    n_lim = num_limit_rows(model)
    lam = (
        jnp.concatenate(
            [
                result.contact_impulse[:, 0],
                result.contact_impulse[:, 1],
                result.contact_impulse[:, 2],
                jnp.zeros(n_lim),
            ]
        )
        if contacts.depth.shape[0] or n_lim
        else state.warm_lambda
    )
    if lam.shape != state.warm_lambda.shape:
        # a layout mismatch means the collision plan and the carried state
        # desynced (state built for a different plan) — fail loudly instead of
        # silently dropping the warm start
        raise ValueError(
            f"warm-start row-layout mismatch: solver produced {lam.shape} but "
            f"state.warm_lambda is {state.warm_lambda.shape}; the PhysicsState "
            "was created for a different CollisionPlan"
        )

    return (
        PhysicsState(
            q=q_new,
            qd=qd_new,
            qd_prev=state.qd,
            f_ext_w=state.f_ext_w,
            warm_lambda=lam,
            contact_force_w=result.contact_force_w,
        ),
        kin,
        contacts,
    )


def step_batch(
    model: RobotModel,
    plan: CollisionPlan,
    state: PhysicsState,  # batched: every leaf has leading (E,)
    drive: JointDrive,  # batched (E, nu)
    params: BodyParams,  # batched
    cfg: EngineCfg,
    terrain=None,
    terrain_offset=None,  # (E, 2) per-env terrain cell offsets
) -> tuple[PhysicsState, "Kinematics", Contacts]:
    """Whole-batch physics step on the batch-last fused dynamics path.

    Semantically equivalent to ``vmap(step)`` (tests/test_fused_dynamics.py)
    but ~10x faster on TPU: the free dynamics run as trace-time-unrolled
    scalar algebra over dense (E,) lanes (physics/fused.py) instead of
    tile-padded (E, nv, nv) matrices.
    """
    from . import fused
    from .solver import limited_dofs, solve_constraints_batch

    dt = cfg.dt
    E = state.q.shape[0]

    if model.nu:
        q_idx = jnp.asarray(
            [int(model.q_start[b]) for b in model.dof_body]
        )
        v_idx = jnp.asarray(model.dof_v_index)
        q_arts = state.q[:, q_idx]  # (E, nu)
        qd_arts = state.qd[:, v_idx]
        tau_arts = drive_torque(model, drive, q_arts, qd_arts)
        tau_arts = tau_arts - params.damping * qd_arts
        H_diag_extra = dt * (drive.kd + params.damping)
    else:
        q_arts = jnp.zeros((E, 0))
        qd_arts = jnp.zeros((E, 0))
        tau_arts = jnp.zeros((E, 0))
        H_diag_extra = None

    H_pairs: dict = {}
    if model.ntendon:
        # fixed tendons (see ``step``): spring + limit-band force, implicit
        # stiffness/damping folded into H as static-sparsity pair updates
        coef = np.asarray(model.tendon_coef, dtype=np.float32)  # (nt, nu)
        coef_j = jnp.asarray(coef)
        L_t = params.tendon_offset + q_arts @ coef_j.T  # (E, nt)
        Ldot = qd_arts @ coef_j.T
        out_lo = L_t < params.tendon_limit_lower
        out_hi = L_t > params.tendon_limit_upper
        lim_err = jnp.where(out_lo, params.tendon_limit_lower - L_t, 0.0) + (
            jnp.where(out_hi, params.tendon_limit_upper - L_t, 0.0)
        )
        F = (
            params.tendon_stiffness * (params.tendon_rest_length - L_t)
            - params.tendon_damping * Ldot
            + params.tendon_limit_stiffness * lim_err
        )
        tau_arts = tau_arts + F @ coef_j
        k_eff = params.tendon_stiffness + params.tendon_limit_stiffness * (
            out_lo | out_hi
        )
        vi_list = [int(v) for v in model.dof_v_index]
        for t in range(coef.shape[0]):
            nz = np.nonzero(coef[t])[0]
            k_t = k_eff[:, t]
            d_t = params.tendon_damping[:, t]
            for ii in nz:
                for jj in nz:
                    if ii < jj:
                        continue
                    cc = float(coef[t, ii] * coef[t, jj])
                    key = (vi_list[ii], vi_list[jj])
                    val = cc * (dt * d_t + dt * dt * k_t)
                    H_pairs[key] = H_pairs.get(key, 0.0) + val

    tau_v = jnp.zeros((E, model.nv))
    if model.nu:
        tau_v = tau_v.at[:, v_idx].set(tau_arts)

    dyn = fused.free_dynamics_batch(
        model, state.q, state.qd, tau_v, params, dt,
        tuple(params.gravity[:, i] for i in range(3)), f_ext_w=state.f_ext_w,
        H_diag_extra=H_diag_extra, H_pairs_extra=H_pairs or None,
    )
    kin = dyn.kin

    # narrowphase per env (static candidate set; cheap — 0.1 ms at E=4096)
    def _detect(kin_e, off):
        c = plan.detect(kin_e, terrain, off)
        return c.pos, c.normal, c.depth, c.friction, c.restitution

    if terrain_offset is None:
        pos, nrm, dep, fr, re = jax.vmap(lambda k: _detect(k, None))(kin)
    else:
        pos, nrm, dep, fr, re = jax.vmap(_detect)(kin, terrain_offset)
    body_a, body_b = plan.static_bodies()
    fscale = jnp.reshape(params.friction_scale, (-1, 1))  # (E, 1) or (1, 1)
    if params.cand_active is not None:
        ca = params.cand_active
        ca = ca[:, None] if ca.ndim == 1 else ca  # (E, 1) or (E, ncon)
        dep = jnp.where(ca > 0.5, dep, -1.0)
    contacts = Contacts(
        pos=pos, normal=nrm, depth=dep, body_a=body_a, body_b=body_b,
        friction=fr * fscale, restitution=re,
    )

    result = solve_constraints_batch(
        model, kin, dyn.L, dyn.v_free, contacts, q_arts, dt, cfg.solver,
        limit_lower=params.limit_lower, limit_upper=params.limit_upper,
        warm_lambda=state.warm_lambda,
    )

    qd_new = jnp.clip(result.qd, -cfg.max_velocity, cfg.max_velocity)
    q_new = jax.vmap(lambda qq, dd: integrate_q(model, qq, dd, dt))(
        state.q, qd_new
    )

    from .solver import num_limit_rows

    n_lim = num_limit_rows(model)
    ncon = contacts.depth.shape[1]
    lam = (
        jnp.concatenate(
            [
                result.contact_impulse[:, :, 0],
                result.contact_impulse[:, :, 1],
                result.contact_impulse[:, :, 2],
                jnp.zeros((E, n_lim)),
            ],
            axis=1,
        )
        if ncon or n_lim
        else state.warm_lambda
    )
    if lam.shape != state.warm_lambda.shape:
        # a layout mismatch means the collision plan and the carried state
        # desynced (state built for a different plan) — fail loudly instead of
        # silently dropping the warm start
        raise ValueError(
            f"warm-start row-layout mismatch: solver produced {lam.shape} but "
            f"state.warm_lambda is {state.warm_lambda.shape}; the PhysicsState "
            "was created for a different CollisionPlan"
        )

    return (
        PhysicsState(
            q=q_new,
            qd=qd_new,
            qd_prev=state.qd,
            f_ext_w=state.f_ext_w,
            warm_lambda=lam,
            contact_force_w=result.contact_force_w,
        ),
        kin,
        contacts,
    )


_INTEGRATE_IDX_CACHE: dict = {}


def _integrate_indices(model: RobotModel):
    """Static gather/scatter index plan: all 1-dof joints integrate in ONE
    vector op; free joints batch their quaternion exponentials together.
    (The previous per-body Python loop emitted ~2 ops per body — on TPU the
    substep is op-count-bound, not FLOP-bound.)"""
    key = model.uid
    if key not in _INTEGRATE_IDX_CACHE:
        import numpy as _np

        one_q, one_v = [], []
        free_q, free_v = [], []
        for b in range(model.nbody):
            jt = int(model.jnt_type[b])
            qs, vs = int(model.q_start[b]), int(model.v_start[b])
            if jt == JOINT_FREE:
                free_q.append(qs)
                free_v.append(vs)
            elif jt in (JOINT_REVOLUTE, JOINT_PRISMATIC):
                one_q.append(qs)
                one_v.append(vs)
        _INTEGRATE_IDX_CACHE[key] = (
            _np.asarray(one_q, dtype=_np.int32),
            _np.asarray(one_v, dtype=_np.int32),
            _np.asarray(free_q, dtype=_np.int32),
            _np.asarray(free_v, dtype=_np.int32),
        )
    return _INTEGRATE_IDX_CACHE[key]


def integrate_q(model: RobotModel, q, qd, dt: float):
    """Semi-implicit Euler position update; quaternion exponential for free
    joints (body-frame angular velocity, right-multiplied). Vectorized over
    joints: one gather/scatter for every 1-dof joint, one batched quat
    update for all free joints."""
    one_q, one_v, free_q, free_v = _integrate_indices(model)
    q_new = q
    if one_q.size:
        q_new = q_new.at[one_q].add(qd[one_v] * dt)
    if free_q.size:
        # gather (F, 7) free states and (F, 6) velocities
        qidx = free_q[:, None] + np.arange(7)[None]
        vidx = free_v[:, None] + np.arange(6)[None]
        fs = q[qidx]  # (F, 7)
        fv = qd[vidx]  # (F, 6) [ang(world), lin]
        quat = math_utils.normalize(fs[:, 3:7])
        pos_new = fs[:, 0:3] + fv[:, 3:6] * dt
        dq = spatial.quat_exp_approx(fv[:, 0:3] * dt)
        quat_new = math_utils.normalize(math_utils.quat_mul(dq, quat))
        q_new = q_new.at[qidx].set(
            jnp.concatenate([pos_new, quat_new], axis=-1)
        )
    return q_new
