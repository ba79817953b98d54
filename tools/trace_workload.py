#!/usr/bin/env python
"""Capture a jax.profiler device trace of one bench workload's step loop and
print the per-op time breakdown (tools/xplane_summary.py).

Usage: python tools/trace_workload.py <workload-name> [num_envs] [out_dir]
  workload-name: a key of bench.WORKLOADS, e.g.
    shadow_repose_env_step_fps_8192envs_1chip

One program compile (slow over the axon tunnel — minutes at shadow sizes),
then a few timed+traced chunks. The compile lands in the persistent cache so
subsequent bench.py runs skip it.
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


def main():
    import bench

    name = sys.argv[1]
    make_env, _task, env_var, default_envs, spc, _proxy = bench.WORKLOADS[name]
    num_envs = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get(env_var, default_envs))
    out_dir = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/trace_{name}"

    env = make_env(num_envs)
    state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
    act_dim = env.action_manager.total_action_dim if hasattr(
        env, "action_manager") else env.num_actions

    @jax.jit
    def run_chunk(s, key):
        # one batched RNG call for the whole chunk (matches bench.py)
        actions = jax.random.uniform(
            key, (spc, num_envs, act_dim), minval=-1.0, maxval=1.0)

        def body(carry, action):
            s2, _out = env.step_state(carry, action)
            return s2, None

        s, _ = jax.lax.scan(body, s, actions)
        return s

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    key, k = jax.random.split(key)
    state = run_chunk(state, k)
    jax.device_get(jax.tree.leaves(state)[0].ravel()[0])
    print(f"compile+first chunk: {time.perf_counter() - t0:.0f}s", flush=True)

    # quick untraced FPS check
    t0 = time.perf_counter()
    for _ in range(2):
        key, k = jax.random.split(key)
        state = run_chunk(state, k)
    jax.device_get(jax.tree.leaves(state)[0].ravel()[0])
    dt = time.perf_counter() - t0
    fps = 2 * spc * num_envs / dt
    print(f"untraced: {fps:,.0f} env-steps/s "
          f"({dt / (2 * spc) * 1e3:.2f} ms/env-step)", flush=True)

    os.makedirs(out_dir, exist_ok=True)
    with jax.profiler.trace(out_dir):
        key, k = jax.random.split(key)
        state = run_chunk(state, k)
        jax.device_get(jax.tree.leaves(state)[0].ravel()[0])
    print(f"trace written to {out_dir}", flush=True)

    import subprocess

    subprocess.run([sys.executable, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "xplane_summary.py"),
        out_dir, "40"])


if __name__ == "__main__":
    main()
