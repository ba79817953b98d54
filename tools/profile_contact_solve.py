#!/usr/bin/env python
"""Per-phase micro-timing of the contact-solve pipeline for a registered task.

Phases timed independently (each as a scanned jitted carry->carry fn):
  step        : full env step_state
  physics     : scene.step_physics (decimation x substeps)
  freedyn     : fused free dynamics only
  detect      : narrowphase only
  jac         : contact Jacobian assembly (vmapped)
  minvjt      : chol_solve_slabs (Delassus half-assembly)
  apgd_xla    : the APGD loop, pure-XLA path
  apgd_pallas : the APGD loop, Pallas VMEM-resident kernel (block sweep)

Usage: python tools/profile_contact_solve.py [task_id] [num_envs]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, carry0, chunk=16, seconds=2.0):
    run = jax.jit(lambda c: jax.lax.scan(
        lambda cc, _: (fn(cc), None), c, None, length=chunk)[0])
    c = run(carry0)
    jax.device_get(jax.tree.leaves(c)[0].ravel()[0])
    n = 0
    t0 = time.perf_counter()
    while True:
        c = run(c)
        n += 1
        if n % 2 == 0:
            jax.device_get(jax.tree.leaves(c)[0].ravel()[0])
            if time.perf_counter() - t0 > seconds:
                break
    jax.device_get(jax.tree.leaves(c)[0].ravel()[0])
    dt = time.perf_counter() - t0
    ms = dt / (n * chunk) * 1e3
    print(f"{name:28s} {ms:9.3f} ms/call", flush=True)
    return ms


def main():
    task = sys.argv[1] if len(sys.argv) > 1 else "Isaac-Repose-Cube-Shadow-Direct-v0"
    E = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

    import gymnasium as gym

    import isaaclab_tpu.tasks  # noqa: F401
    from isaaclab_tpu.physics import engine as eng
    from isaaclab_tpu.physics import fused
    from isaaclab_tpu.physics.collision import Contacts
    from isaaclab_tpu.physics.solver import (
        SolverCfg, contact_jacobians_t, limit_rows_t, limited_dofs,
        num_limit_rows, solve_constraints_batch,
    )
    from isaaclab_tpu.tasks.utils import parse_env_cfg

    cfg = parse_env_cfg(task, num_envs=E)
    env = gym.make(task, cfg=cfg).unwrapped
    sc = env.scene
    model = sc.world_model
    plan = sc.collision_plan
    ba, bb = plan.static_bodies()
    ncon = len(ba)
    n_lim = num_limit_rows(model)
    nrows = 3 * ncon + n_lim
    print(f"task={task} E={E} nv={model.nv} nbody={model.nbody} "
          f"ncon={ncon} n_lim={n_lim} nrows={nrows} "
          f"decimation={env.cfg.decimation}", flush=True)

    state0 = jax.jit(env.init_state)(jax.random.PRNGKey(0))

    act_dim = env.action_manager.total_action_dim if hasattr(
        env, "action_manager") else env.num_actions

    # --- full step ---
    def full_step(s):
        a = 0.1 * jnp.sin(jnp.sum(s.scene.phys.q[:, :1], axis=1, keepdims=True))
        act = jnp.broadcast_to(a, (E, act_dim))
        s2, _ = env.step_state(s, act)
        return s2

    timed("env step_state", full_step, state0)

    # --- physics only ---
    dt_phys = env.physics_dt if hasattr(env, "physics_dt") else env.cfg.sim.dt

    def phys_step(ss):
        return sc.step_physics(ss, dt_phys)

    timed("scene.step_physics (1 sub)", phys_step, state0.scene)

    # --- build a representative mid-flight state for phase isolation ---
    s = state0
    for _ in range(3):
        s = full_step(s)
    phys = s.scene.phys
    params = s.scene.body_params

    engcfg = eng.EngineCfg(dt=dt_phys, solver=sc.sim_cfg.solver_cfg())
    terrain = sc.height_field
    toff = s.scene.terrain_offsets
    if toff is None:
        toff = jnp.asarray(sc.terrain_offsets(), dtype=jnp.float32)

    q_idx = jnp.asarray([int(model.q_start[b]) for b in model.dof_body])
    v_idx = jnp.asarray(model.dof_v_index)

    # free dynamics
    def freedyn(q):
        tau_v = jnp.zeros((E, model.nv))
        dyn = fused.free_dynamics_batch(
            model, q, phys.qd, tau_v, params, dt_phys,
            tuple(params.gravity[:, i] for i in range(3)),
        )
        return q + 1e-12 * dyn.v_free[:, :1] * 0

    timed("free_dynamics_batch", freedyn, phys.q)

    tau_v = jnp.zeros((E, model.nv))
    dyn = jax.jit(lambda q: fused.free_dynamics_batch(
        model, q, phys.qd, tau_v, params, dt_phys,
        tuple(params.gravity[:, i] for i in range(3))))(phys.q)
    kin = dyn.kin

    # detect
    def detect(q):
        dyn2 = fused.free_dynamics_batch(
            model, q, phys.qd, tau_v, params, dt_phys,
            tuple(params.gravity[:, i] for i in range(3)),
        )
        def _d(kin_e, off):
            c = plan.detect(kin_e, terrain, off)
            return c.depth
        if toff is None:
            dep = jax.vmap(lambda k: _d(k, None))(dyn2.kin)
        else:
            dep = jax.vmap(_d)(dyn2.kin, toff)
        return q + 1e-12 * dep[:, :1] * 0

    t_fd = timed("freedyn + detect", detect, phys.q)

    # full solve phase (everything solve_constraints_batch does)
    def _mk_contacts(kin_b):
        def _d(kin_e, off):
            c = plan.detect(kin_e, terrain, off)
            return c.pos, c.normal, c.depth, c.friction, c.restitution
        if toff is None:
            pos, nrm, dep, fr, re = jax.vmap(lambda k: _d(k, None))(kin_b)
        else:
            pos, nrm, dep, fr, re = jax.vmap(_d)(kin_b, toff)
        return Contacts(pos=pos, normal=nrm, depth=dep, body_a=ba, body_b=bb,
                        friction=fr, restitution=re)

    def solve_all(q):
        dyn2 = fused.free_dynamics_batch(
            model, q, phys.qd, tau_v, params, dt_phys,
            tuple(params.gravity[:, i] for i in range(3)),
        )
        contacts = _mk_contacts(dyn2.kin)
        q_arts = q[:, q_idx] if model.nu else jnp.zeros((E, 0))
        res = solve_constraints_batch(
            model, dyn2.kin, dyn2.L, dyn2.v_free, contacts, q_arts,
            dt_phys, engcfg.solver,
            limit_lower=params.limit_lower, limit_upper=params.limit_upper,
            warm_lambda=phys.warm_lambda,
        )
        return q + 1e-12 * res.qd[:, :1] * 0

    timed("freedyn+detect+solve", solve_all, phys.q)

    # --- isolated solver internals on fixed operands ---
    contacts = jax.jit(_mk_contacts)(kin)

    def _jac(kin_e, pos, normal):
        con = Contacts(pos=pos, normal=normal, depth=pos[:, 0],
                       body_a=ba, body_b=bb, friction=None, restitution=None)
        return contact_jacobians_t(model, kin_e, con)

    def jac_only(q):
        dyn2 = fused.free_dynamics_batch(
            model, q, phys.qd, tau_v, params, dt_phys,
            tuple(params.gravity[:, i] for i in range(3)),
        )
        contacts2 = _mk_contacts(dyn2.kin)
        J_t = jax.vmap(_jac)(dyn2.kin, contacts2.pos, contacts2.normal)
        return q + 1e-12 * J_t[:, 0, :1] * 0

    timed("freedyn+detect+jacassembly", jac_only, phys.q)

    J_t = jax.jit(jax.vmap(_jac))(kin, contacts.pos, contacts.normal)
    if n_lim:
        J_t = jnp.concatenate([
            J_t, jnp.broadcast_to(jnp.asarray(limit_rows_t(model), J_t.dtype)[None],
                                  (E, model.nv, n_lim))], axis=2)
    L_comps = dyn.L

    def minvjt_only(Jt):
        M = fused.chol_solve_slabs(L_comps, Jt)
        return Jt + 1e-12 * M[:, :1, :1] * 0

    timed("chol_solve_slabs (MinvJT)", minvjt_only, J_t)

    MinvJT = jax.jit(lambda Jt: fused.chol_solve_slabs(L_comps, Jt))(J_t)
    diag = jnp.clip(jnp.einsum("evr,evr->er", J_t, MinvJT), 1e-8, None)
    b_vec = jnp.einsum("ev,evr->er", dyn.v_free, J_t)
    row_active = jnp.concatenate([
        jnp.tile(contacts.depth > 0, (1, 3)),
        jnp.ones((E, n_lim), bool)], axis=1).astype(J_t.dtype)
    mu = contacts.friction
    lam0 = jnp.zeros((E, nrows))

    from isaaclab_tpu.physics.solver import apgd_solve

    def apgd_xla(b):
        lam = jax.vmap(
            lambda Jt_, MJ_, b_, d_, a_, m_, l0_: apgd_solve(
                Jt_, MJ_, b_, d_, a_ > 0.5, m_, l0_, ncon, n_lim, 16)
        )(J_t, MinvJT, b, diag, row_active, mu, lam0)
        return b + 1e-12 * lam[:, :1] * 0

    timed("apgd 16it (XLA)", apgd_xla, b_vec)

    from isaaclab_tpu.physics.pallas_solver import apgd_solve_batched

    if jax.default_backend() in ("tpu", "axon"):
        for be in (64, 128, 256, 512):
            try:
                def apgd_pl(b, be=be):
                    lam = apgd_solve_batched(
                        J_t, MinvJT, b, diag, row_active, mu, lam0,
                        ncon=ncon, iterations=16, block_envs=be)
                    return b + 1e-12 * lam[:, :1] * 0
                timed(f"apgd 16it (pallas BE={be})", apgd_pl, b_vec)
            except Exception as ex:
                print(f"pallas BE={be} failed: {type(ex).__name__}: {str(ex)[:200]}")


if __name__ == "__main__":
    main()
