#!/usr/bin/env python
"""Component-level timing of the Anymal-C flat env step on the real chip.

Times scan-chunked jitted variants (full step / physics only / FK only /
narrowphase only / solve off) to locate the locomotion hot spot. Not part of
the bench contract — a development tool.
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


def timed(name, fn, state, sync, chunk, seconds=2.0):
    state = fn(state)
    sync(state)
    n = 0
    t0 = time.perf_counter()
    while True:
        state = fn(state)
        n += 1
        if n % 4 == 0:
            sync(state)
            if time.perf_counter() - t0 > seconds:
                break
    sync(state)
    dt = time.perf_counter() - t0
    per_step_us = dt / (n * chunk) * 1e6
    print(f"{name:34s} {per_step_us:10.1f} us/env-step-batch")
    return per_step_us


def main():
    from isaaclab_tpu.envs import ManagerBasedRLEnv
    from isaaclab_tpu.physics import engine as eng
    from isaaclab_tpu.tasks.manager_based.locomotion.velocity.config.anymal_c.flat_env_cfg import (
        AnymalCFlatEnvCfg,
    )

    E = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    chunk = 32
    cfg = AnymalCFlatEnvCfg()
    cfg.scene.num_envs = E
    env = ManagerBasedRLEnv(cfg)
    state0 = jax.jit(env.init_state)(jax.random.PRNGKey(0))
    scene = env.scene
    wm = scene.world_model
    print(f"nv={wm.nv} nu={wm.nu} nbody={wm.nbody} "
          f"ncon={scene.collision_plan.ncon} E={E}")

    def sync_env(s):
        jax.device_get(s.scene.phys.q[0, 0])

    def sync_scene(s):
        jax.device_get(s.phys.q[0, 0])

    def chunked(body):
        def run(s):
            s, _ = jax.lax.scan(lambda c, _: (body(c), None), s, None,
                                length=chunk)
            return s
        return jax.jit(run)

    # 1. full env step
    act = jnp.zeros((E, wm.nu))
    full = chunked(lambda s: env.step_state(s, act)[0])
    t_full = timed("full step_state", full, state0, sync_env, chunk)

    # 2. physics only (decimation x step_physics, no managers)
    dec = int(cfg.decimation)

    def phys_only(ss):
        def sub(c, _):
            return scene.step_physics(c, env.physics_dt), None
        ss, _ = jax.lax.scan(sub, ss, None, length=dec)
        return ss

    t_phys = timed("physics only (x decimation)", chunked(phys_only),
                   state0.scene, sync_scene, chunk)

    # 3. physics with solver iterations = 0 (FK+CRBA+chol+detect, no APGD)
    import isaaclab_tpu.physics.solver as sol
    orig_cfg = scene.sim_cfg.solver_cfg

    class _Z:
        def __call__(self):
            c = orig_cfg()
            return c._replace(iterations=0)

    scene.sim_cfg.solver_cfg = _Z()
    t_noiter = timed("physics, 0 solver iterations",
                     chunked(phys_only), state0.scene, sync_scene, chunk)
    scene.sim_cfg.solver_cfg = orig_cfg

    # 4. unconstrained dynamics (monkeypatch batch solve to passthrough)
    orig_solve_b = sol.solve_constraints_batch

    def _nosolve_b(model, kin, L, v_free, contacts, *a, **kw):
        E_, ncon = contacts.depth.shape
        return sol.SolveResult(
            qd=v_free,
            contact_impulse=jnp.zeros((E_, ncon, 3)),
            contact_force_w=jnp.zeros((E_, ncon, 3)),
        )

    sol.solve_constraints_batch = _nosolve_b
    t_free = timed("free dynamics (no constraint solve)",
                   chunked(phys_only), state0.scene, sync_scene, chunk)
    sol.solve_constraints_batch = orig_solve_b

    # 5. managers only (physics frozen)
    def managers_only(s):
        ns, _ = env.step_state(s, act)
        return ns._replace(scene=ns.scene._replace(phys=s.scene.phys))

    t_mgr = timed("step with phys state pinned",
                  chunked(managers_only), state0, sync_env, chunk)

    fps = 1e6 / t_full * E
    print(f"\nfull: {fps/1e3:.0f}k env-steps/s")
    print(f"physics share: {t_phys/t_full*100:.0f}%  "
          f"solve share of physics: {(t_phys-t_noiter)/max(t_phys,1e-9)*100:.0f}%  "
          f"constraint prep share: {(t_noiter-t_free)/max(t_phys,1e-9)*100:.0f}%")
    print(f"managers-ish (pinned phys): {t_mgr:.1f} us")


if __name__ == "__main__":
    main()
