#!/usr/bin/env python
"""Per-phase micro-timing of the contact-solve pipeline for a registered task.

Times ONLY small isolated programs (the full env step's compile over the
axon tunnel takes ~15 min at shadow sizes; its end-to-end number comes from
bench.py instead):

  physics_substep : scene.step_physics (the whole physics pipeline, once)
  freedyn         : fused free dynamics only
  +detect         : free dynamics + narrowphase
  +jac            : ... + contact Jacobian assembly
  minvjt          : chol_solve_slabs on fixed operands (Delassus half)
  apgd_xla        : the APGD loop on fixed operands, pure-XLA
  apgd_pallas     : same, Pallas VMEM-resident kernel (block-size sweep)

Usage: python tools/profile_contact_solve.py [task_id] [num_envs] [seconds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

SECONDS = 2.0


def timed(name, fn, carry0, chunk=16):
    t_c0 = time.perf_counter()
    run = jax.jit(lambda c: jax.lax.scan(
        lambda cc, _: (fn(cc), None), c, None, length=chunk)[0])
    c = run(carry0)
    jax.device_get(jax.tree.leaves(c)[0].ravel()[0])
    compile_s = time.perf_counter() - t_c0
    n = 0
    t0 = time.perf_counter()
    while True:
        c = run(c)
        n += 1
        if n % 2 == 0:
            jax.device_get(jax.tree.leaves(c)[0].ravel()[0])
            if time.perf_counter() - t0 > SECONDS:
                break
    jax.device_get(jax.tree.leaves(c)[0].ravel()[0])
    dt = time.perf_counter() - t0
    ms = dt / (n * chunk) * 1e3
    print(f"{name:28s} {ms:9.3f} ms/call   (compile {compile_s:.0f}s)",
          flush=True)
    return ms


def main():
    global SECONDS
    task = sys.argv[1] if len(sys.argv) > 1 else "Isaac-Repose-Cube-Shadow-Direct-v0"
    E = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    if len(sys.argv) > 3:
        SECONDS = float(sys.argv[3])

    import gymnasium as gym

    import isaaclab_tpu.tasks  # noqa: F401
    from isaaclab_tpu.physics import engine as eng
    from isaaclab_tpu.physics import fused
    from isaaclab_tpu.physics.collision import Contacts
    from isaaclab_tpu.physics.solver import (
        apgd_solve, contact_jacobians_t, limit_rows_t, limited_dofs,
        num_limit_rows,
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
    dec = env.cfg.decimation
    print(f"task={task} E={E} nv={model.nv} nbody={model.nbody} "
          f"ncon={ncon} n_lim={n_lim} nrows={nrows} decimation={dec}",
          flush=True)
    # padded operand sizes: minor dims pad to (8, 128) f32 tiles
    pad_v = -(-model.nv // 8) * 8
    pad_r = -(-nrows // 128) * 128
    mb = E * pad_v * pad_r * 4 / 2**20
    print(f"J_t/MinvJT padded: (E,{model.nv}->{pad_v},{nrows}->{pad_r}) "
          f"= {mb:.0f} MiB each; ~29 APGD matvec passes/substep -> "
          f"{29 * 2 * mb / 1024:.1f} GiB HBM traffic/substep if XLA "
          f"re-reads them", flush=True)

    state0 = jax.jit(env.init_state)(jax.random.PRNGKey(0))
    sstate = state0.scene
    dt_phys = env.physics_dt if hasattr(env, "physics_dt") else env.cfg.sim.dt

    # whole physics pipeline, one substep
    def phys_step(ss):
        return sc.step_physics(ss, dt_phys)

    t_sub = timed("physics_substep", phys_step, sstate, chunk=8)
    print(f"  -> implied env-step {dec} substeps = {dec * t_sub:.1f} ms "
          f"({E / (dec * t_sub) * 1e3:,.0f} env-steps/s physics-only)",
          flush=True)

    # settle a few substeps for a representative contact state
    settle = jax.jit(lambda ss: sc.step_physics(ss, dt_phys))
    for _ in range(5):
        sstate = settle(sstate)
    phys = sstate.phys
    params = sstate.body_params
    terrain = sc.height_field
    toff = sstate.terrain_offsets
    if toff is None:
        toff = jnp.asarray(sc.terrain_offsets(), dtype=jnp.float32)

    tau_v = jnp.zeros((E, model.nv))
    grav = tuple(params.gravity[:, i] for i in range(3))

    def freedyn(q):
        dyn = fused.free_dynamics_batch(
            model, q, phys.qd, tau_v, params, dt_phys, grav)
        return q + 1e-12 * dyn.v_free[:, :1] * 0

    timed("freedyn", freedyn, phys.q, chunk=8)

    def _mk_contacts(kin_b):
        def _d(kin_e, off):
            c = plan.detect(kin_e, terrain, off)
            return c.pos, c.normal, c.depth, c.friction, c.restitution
        pos, nrm, dep, fr, re = jax.vmap(_d)(kin_b, toff)
        return Contacts(pos=pos, normal=nrm, depth=dep, body_a=ba, body_b=bb,
                        friction=fr, restitution=re)

    def detect(q):
        dyn = fused.free_dynamics_batch(
            model, q, phys.qd, tau_v, params, dt_phys, grav)
        con = _mk_contacts(dyn.kin)
        return q + 1e-12 * con.depth[:, :1] * 0

    timed("freedyn+detect", detect, phys.q, chunk=8)

    def _jac(kin_e, pos, normal):
        con = Contacts(pos=pos, normal=normal, depth=pos[:, 0],
                       body_a=ba, body_b=bb, friction=None, restitution=None)
        return contact_jacobians_t(model, kin_e, con)

    def jac_only(q):
        dyn = fused.free_dynamics_batch(
            model, q, phys.qd, tau_v, params, dt_phys, grav)
        con = _mk_contacts(dyn.kin)
        J_t = jax.vmap(_jac)(dyn.kin, con.pos, con.normal)
        return q + 1e-12 * J_t[:, 0, :1] * 0

    timed("freedyn+detect+jac", jac_only, phys.q, chunk=8)

    # fixed operands for the solver internals
    dyn = jax.jit(lambda q: fused.free_dynamics_batch(
        model, q, phys.qd, tau_v, params, dt_phys, grav))(phys.q)
    kin = dyn.kin
    L_comps = dyn.L
    contacts = jax.jit(_mk_contacts)(kin)
    J_t = jax.jit(jax.vmap(_jac))(kin, contacts.pos, contacts.normal)
    if n_lim:
        J_t = jnp.concatenate([
            J_t,
            jnp.broadcast_to(
                jnp.asarray(limit_rows_t(model), J_t.dtype)[None],
                (E, model.nv, n_lim)),
        ], axis=2)

    def minvjt_only(Jt):
        M = fused.chol_solve_slabs(L_comps, Jt)
        return Jt + 1e-12 * M[:, :1, :1] * 0

    timed("minvjt (chol slabs)", minvjt_only, J_t, chunk=8)

    MinvJT = jax.jit(lambda Jt: fused.chol_solve_slabs(L_comps, Jt))(J_t)
    diag = jnp.clip(jnp.einsum("evr,evr->er", J_t, MinvJT), 1e-8, None)
    b_vec = jnp.einsum("ev,evr->er", dyn.v_free, J_t)
    row_active = jnp.concatenate([
        jnp.tile(contacts.depth > 0, (1, 3)),
        jnp.ones((E, n_lim), bool)], axis=1).astype(J_t.dtype)
    mu = contacts.friction
    lam0 = jnp.zeros((E, nrows))
    n_touch = int(jnp.sum(contacts.depth > 0)) / E
    print(f"  active contacts/env after settle: {n_touch:.1f}/{ncon}",
          flush=True)

    def apgd_xla(b):
        lam = jax.vmap(
            lambda Jt_, MJ_, b_, d_, a_, m_, l0_: apgd_solve(
                Jt_, MJ_, b_, d_, a_ > 0.5, m_, l0_, ncon, n_lim, 16)
        )(J_t, MinvJT, b, diag, row_active, mu, lam0)
        return b + 1e-12 * lam[:, :1] * 0

    timed("apgd 16it (XLA)", apgd_xla, b_vec, chunk=8)

    from isaaclab_tpu.physics.pallas_solver import apgd_solve_batched

    if jax.default_backend() in ("tpu", "axon"):
        for be in (int(x) for x in os.environ.get(
                "PROFILE_BE", "64,128,256").split(",")):
            try:
                def apgd_pl(b, be=be):
                    lam = apgd_solve_batched(
                        J_t, MinvJT, b, diag, row_active, mu, lam0,
                        ncon=ncon, iterations=16, block_envs=be)
                    return b + 1e-12 * lam[:, :1] * 0
                timed(f"apgd 16it (pallas BE={be})", apgd_pl, b_vec, chunk=8)
            except Exception as ex:
                print(f"pallas BE={be} failed: {type(ex).__name__}: "
                      f"{str(ex)[:300]}", flush=True)


if __name__ == "__main__":
    main()
