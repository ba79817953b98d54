#!/usr/bin/env python
"""Micro-timing of physics-step internals for Anymal-C at 4096 envs."""

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


def timed(name, fn, args, chunk=64, seconds=2.0):
    """fn: (carry) -> carry, scanned; carry seeded from args."""
    run = jax.jit(lambda c: jax.lax.scan(
        lambda cc, _: (fn(cc), None), c, None, length=chunk)[0])
    c = run(args)
    jax.device_get(jax.tree.leaves(c)[0].ravel()[0])
    n = 0
    t0 = time.perf_counter()
    while True:
        c = run(c)
        n += 1
        if n % 4 == 0:
            jax.device_get(jax.tree.leaves(c)[0].ravel()[0])
            if time.perf_counter() - t0 > seconds:
                break
    jax.device_get(jax.tree.leaves(c)[0].ravel()[0])
    dt = time.perf_counter() - t0
    us = dt / (n * chunk) * 1e6
    print(f"{name:30s} {us:9.1f} us/call (batch 4096)")
    return us


def main():
    from isaaclab_tpu.physics import engine as eng
    from isaaclab_tpu.physics.collision import CollisionPlan
    from isaaclab_tpu.physics.dynamics import rnea_bias
    from isaaclab_tpu.physics.kinematics import forward_kinematics
    from isaaclab_tpu.physics.linalg import chol_factor, chol_solve
    from isaaclab_tpu.physics.solver import crba_world
    from isaaclab_tpu.assets_presets.anymal import build_anymal_model

    model = build_anymal_model()
    E = 4096
    print(f"nv={model.nv} nbody={model.nbody}")
    key = jax.random.PRNGKey(0)
    q0 = jnp.zeros(model.nq).at[3].set(1.0)
    q = jnp.tile(q0, (E, 1)) + 0.01 * jax.random.normal(key, (E, model.nq))
    qd = 0.1 * jax.random.normal(key, (E, model.nv))
    params = eng.BodyParams.from_model(model)
    g = jnp.array([0.0, 0.0, -9.81])

    # FK only
    def fk_step(q):
        kin = jax.vmap(lambda qq: forward_kinematics(model, qq))(q)
        return q + 1e-12 * kin.body_pos_w[:, -1, 0:1] * 0

    timed("FK", fk_step, q)

    # FK + CRBA
    def crba_step(q):
        def one(qq):
            kin = forward_kinematics(model, qq)
            H = crba_world(model, kin, params.mass, params.inertia, params.com)
            return H[0, 0]
        h = jax.vmap(one)(q)
        return q + 1e-12 * h[:, None] * 0

    timed("FK + crba_world", crba_step, q)

    # FK + RNEA
    def rnea_step(q):
        def one(qq, qqd):
            kin = forward_kinematics(model, qq)
            C = rnea_bias(model, kin, qqd, g,
                          mass=params.mass, inertia=params.inertia,
                          com=params.com)
            return C[0]
        c = jax.vmap(one)(q, qd)
        return q + 1e-12 * c[:, None] * 0

    timed("FK + rnea_bias", rnea_step, q)

    # FK + CRBA + chol + solve
    def chol_step(q):
        def one(qq, qqd):
            kin = forward_kinematics(model, qq)
            H = crba_world(model, kin, params.mass, params.inertia, params.com)
            L = chol_factor(H)
            x = chol_solve(L, qqd)
            return x[0]
        c = jax.vmap(one)(q, qd)
        return q + 1e-12 * c[:, None] * 0

    timed("FK + crba + chol + solve", chol_step, q)

    # narrowphase
    plan = CollisionPlan(model, with_ground=True)
    print(f"ncon={plan.ncon}")

    def detect_step(q):
        def one(qq):
            kin = forward_kinematics(model, qq)
            con = plan.detect(kin, None, None)
            return con.depth[0]
        d = jax.vmap(one)(q)
        return q + 1e-12 * d[:, None] * 0

    timed("FK + narrowphase", detect_step, q)

    # integrate
    def integ_step(q):
        return jax.vmap(lambda qq, dd: eng.integrate_q(model, qq, dd, 1e-3))(
            q, qd)

    timed("integrate_q", integ_step, q)


if __name__ == "__main__":
    main()
