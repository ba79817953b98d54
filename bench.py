#!/usr/bin/env python
"""Benchmark driver entry: prints ONE JSON line with the headline metric.

Mirrors the reference's benchmark_non_rl.py headline (BASELINE.md row 1):
Isaac-Cartpole 4096 envs pure env-stepping FPS on one chip, compared against
the reference's 1x RTX 4090 number (1.10M steps/s).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# persistent compile cache: repeated bench runs skip the (slow) remote compile
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BASELINE_CARTPOLE_STEP_FPS = 1_100_000.0  # performance_benchmarks.rst:57


def main():
    import jax
    import jax.numpy as jnp

    from isaaclab_tpu.envs import ManagerBasedRLEnv
    from isaaclab_tpu.tasks.manager_based.classic.cartpole.cartpole_env_cfg import (
        CartpoleEnvCfg,
    )

    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    cfg = CartpoleEnvCfg()
    cfg.scene.num_envs = num_envs
    env = ManagerBasedRLEnv(cfg)

    # jit the init: eager init is minutes of tiny dispatches over the tunnel
    state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
    act_dim = env.action_manager.total_action_dim

    steps_per_call = 64

    @jax.jit
    def run_chunk(s):
        # NOTE: the action buffer is created INSIDE the trace — closing over
        # an eagerly-created device array forces a trace-time device-to-host
        # copy that permanently degrades dispatch over the axon TPU tunnel.
        action = jnp.zeros((num_envs, act_dim))

        def body(carry, _):
            s2, _out = env.step_state(carry, action)
            return s2, None

        s, _ = jax.lax.scan(body, s, None, length=steps_per_call)
        return s

    # warmup/compile. NOTE: sync via device_get of a scalar — over the axon
    # tunnel, block_until_ready can return before queued work completes
    # (measured: 64 queued chunks "ready" in 10ms), inflating FPS ~1000x.
    def sync(s):
        jax.device_get(s.scene.phys.q[0, 0])

    state = run_chunk(state)
    sync(state)

    # time-based loop: enough chunks to dominate timer/dispatch noise
    n_calls = 0
    t0 = time.perf_counter()
    while True:
        state = run_chunk(state)
        n_calls += 1
        if n_calls % 8 == 0:
            sync(state)
            if time.perf_counter() - t0 > 3.0:
                break
    sync(state)
    dt = time.perf_counter() - t0

    env_steps = n_calls * steps_per_call * num_envs
    fps = env_steps / dt
    print(
        json.dumps(
            {
                "metric": "cartpole_env_step_fps_4096envs_1chip",
                "value": round(fps),
                "unit": "env-steps/s",
                "vs_baseline": round(fps / BASELINE_CARTPOLE_STEP_FPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
