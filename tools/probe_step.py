#!/usr/bin/env python
"""Phase-timed step probe for one bench workload: env build / trace /
compile / steady-state FPS, with device_get syncs (block_until_ready is
unreliable over the axon tunnel).

Usage: python tools/probe_step.py <workload-name> [num_envs]
Env knobs pass through (ISAACLAB_TPU_FUSED, ISAACLAB_TPU_FUSED_BARRIERS...).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t0 = time.time()


def mark(msg):
    print(f"[{time.time() - t0:8.1f}s] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import bench

    name = sys.argv[1]
    make_env, _task, env_var, default_envs, spc, _proxy = bench.WORKLOADS[name]
    num_envs = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get(env_var, default_envs))
    mark(f"jax up, devices={jax.devices()}")
    env = make_env(num_envs)
    mark(f"env built, N={num_envs}")
    state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
    jax.device_get(jax.tree.leaves(state)[0].ravel()[0])
    mark("init_state done")
    act_dim = env.action_manager.total_action_dim if hasattr(
        env, "action_manager") else env.num_actions

    def run_chunk(s, key):
        actions = jax.random.uniform(
            key, (spc, num_envs, act_dim), minval=-1.0, maxval=1.0)

        def body(carry, action):
            s2, _out = env.step_state(carry, action)
            return s2, None

        s, _ = jax.lax.scan(body, s, actions)
        return s

    tc = time.time()
    lowered = jax.jit(run_chunk).lower(state, jax.random.PRNGKey(1))
    mark(f"lowered in {time.time() - tc:.1f}s")
    tc = time.time()
    compiled = lowered.compile()
    mark(f"COMPILED in {time.time() - tc:.1f}s")

    def sync(s):
        jax.device_get(jax.tree.leaves(s)[0].ravel()[0])

    s = compiled(state, jax.random.PRNGKey(1))
    sync(s)
    mark("first chunk done")
    key = jax.random.PRNGKey(2)
    n = 0
    tc = time.time()
    while time.time() - tc < 8.0:
        key, k = jax.random.split(key)
        s = compiled(s, k)
        n += 1
        if n % 4 == 0:
            sync(s)
    sync(s)
    dt = time.time() - tc
    mark(f"STEADY: {n * spc * num_envs / dt:,.0f} env-steps/s "
         f"({n} chunks x {spc} steps, {dt:.2f}s)")


if __name__ == "__main__":
    main()
