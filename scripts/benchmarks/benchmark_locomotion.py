#!/usr/bin/env python
"""Locomotion env-stepping benchmark (reference benchmark_non_rl.py pattern):
scan-chunked stepping so per-dispatch tunnel latency amortizes."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    import jax
    import jax.numpy as jnp

    from isaaclab_tpu.envs import ManagerBasedRLEnv
    from isaaclab_tpu.tasks.manager_based.locomotion.velocity.config.anymal_c.flat_env_cfg import (
        AnymalCFlatEnvCfg,
    )

    E = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    chunk = int(os.environ.get("BENCH_CHUNK", 32))
    cfg = AnymalCFlatEnvCfg()
    cfg.scene.num_envs = E
    env = ManagerBasedRLEnv(cfg)
    state = jax.jit(env.init_state)(jax.random.PRNGKey(0))

    @jax.jit
    def run_chunk(s):
        # action created inside the trace: closure-captured device arrays
        # force a trace-time D2H that degrades axon-tunnel dispatch
        action = jnp.zeros((E, 12))

        def body(carry, _):
            s2, _ = env.step_state(carry, action)
            return s2, None

        s, _ = jax.lax.scan(body, s, None, length=chunk)
        return s

    # sync via device_get of a scalar — over the axon tunnel,
    # block_until_ready can return before queued work completes (see bench.py)
    def sync(s):
        jax.device_get(s.scene.phys.q[0, 0])

    state = run_chunk(state)
    sync(state)
    n_calls = 0
    t0 = time.perf_counter()
    while True:
        state = run_chunk(state)
        n_calls += 1
        if n_calls % 4 == 0:
            sync(state)
            if time.perf_counter() - t0 > 3.0:
                break
    sync(state)
    dt = time.perf_counter() - t0
    fps = n_calls * chunk * E / dt
    print(json.dumps({
        "metric": f"anymal_flat_env_step_fps_{E}envs_1chip",
        "value": round(fps),
        "unit": "env-steps/s",
        "vs_baseline": round(fps / 94000.0, 4),  # vs Rough-G1 4090 (closest row)
    }))


if __name__ == "__main__":
    main()
