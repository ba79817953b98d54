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

    @staticmethod
    def from_model(model: RobotModel) -> "BodyParams":
        return BodyParams(
            mass=jnp.asarray(model.mass),
            inertia=jnp.asarray(model.inertia),
            com=jnp.asarray(model.com),
            armature=jnp.asarray(model.dof_armature),
            damping=jnp.asarray(model.dof_damping),
            friction_scale=jnp.asarray(1.0),
            limit_lower=jnp.asarray(model.dof_limit_lower),
            limit_upper=jnp.asarray(model.dof_limit_upper),
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
        jnp.asarray(cfg.gravity),
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

    from .linalg import chol_factor, chol_solve

    H_chol = chol_factor(H)
    qdd_free = chol_solve(H_chol, tau - C)
    v_free = state.qd + dt * qdd_free

    contacts = plan.detect(kin, terrain, terrain_offset)
    contacts = contacts._replace(friction=contacts.friction * params.friction_scale)

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
        lam = state.warm_lambda

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
