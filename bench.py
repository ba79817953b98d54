#!/usr/bin/env python
"""Benchmark driver entry.

Emits one JSON line per workload (BASELINE.md rows 1, 3, 4), with the
headline cartpole metric LAST so a tail-line parser records it:

  anymal_rough_env_step_fps_4096envs_1chip   vs 94k   (4090, rst:61)
  shadow_repose_env_step_fps_8192envs_1chip  vs 200k  (4090, rst:63)
  cartpole_env_step_fps_4096envs_1chip       vs 1.10M (4090, rst:57)

Each extra workload is individually fault-isolated; set BENCH_HEADLINE_ONLY=1
to skip the locomotion/shadow rows (e.g. on a cold compile cache).
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

# reference 1x RTX 4090 step-FPS (BASELINE.md)
BASELINE_CARTPOLE_STEP_FPS = 1_100_000.0  # performance_benchmarks.rst:57
BASELINE_ROUGH_STEP_FPS = 94_000.0  # Velocity-Rough-G1, rst:61
BASELINE_SHADOW_STEP_FPS = 200_000.0  # Repose-Cube-Shadow, rst:63


def _measure(env, num_envs, steps_per_call=64, seconds=3.0):
    import jax
    import jax.numpy as jnp

    state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
    act_dim = env.action_manager.total_action_dim if hasattr(
        env, "action_manager"
    ) else env.num_actions

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
        if n_calls % 4 == 0:
            sync(state)
            if time.perf_counter() - t0 > seconds:
                break
    sync(state)
    dt = time.perf_counter() - t0
    return n_calls * steps_per_call * num_envs / dt


def _emit(metric, fps, baseline):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(fps),
                "unit": "env-steps/s",
                "vs_baseline": round(fps / baseline, 4),
            }
        ),
        flush=True,
    )


def bench_anymal_rough(num_envs):
    from isaaclab_tpu.envs import ManagerBasedRLEnv
    from isaaclab_tpu.tasks.manager_based.locomotion.velocity.config.anymal_c.rough_env_cfg import (
        AnymalCRoughEnvCfg,
    )

    cfg = AnymalCRoughEnvCfg()
    cfg.scene.num_envs = num_envs
    env = ManagerBasedRLEnv(cfg)
    return _measure(env, num_envs, steps_per_call=32)


def bench_shadow(num_envs):
    import gymnasium as gym

    import isaaclab_tpu.tasks  # noqa: F401
    from isaaclab_tpu.tasks.utils import parse_env_cfg

    cfg = parse_env_cfg("Isaac-Repose-Cube-Shadow-Direct-v0", num_envs=num_envs)
    env = gym.make("Isaac-Repose-Cube-Shadow-Direct-v0", cfg=cfg).unwrapped
    return _measure(env, num_envs, steps_per_call=32)


def bench_cartpole(num_envs):
    from isaaclab_tpu.envs import ManagerBasedRLEnv
    from isaaclab_tpu.tasks.manager_based.classic.cartpole.cartpole_env_cfg import (
        CartpoleEnvCfg,
    )

    cfg = CartpoleEnvCfg()
    cfg.scene.num_envs = num_envs
    env = ManagerBasedRLEnv(cfg)
    return _measure(env, num_envs, steps_per_call=64)


def main():
    results = {}
    if not os.environ.get("BENCH_HEADLINE_ONLY"):
        for name, fn, envs, base in (
            (
                "anymal_rough_env_step_fps_4096envs_1chip",
                bench_anymal_rough,
                int(os.environ.get("BENCH_ROUGH_ENVS", 4096)),
                BASELINE_ROUGH_STEP_FPS,
            ),
            (
                "shadow_repose_env_step_fps_8192envs_1chip",
                bench_shadow,
                int(os.environ.get("BENCH_SHADOW_ENVS", 8192)),
                BASELINE_SHADOW_STEP_FPS,
            ),
        ):
            try:
                fps = fn(envs)
                results[name] = fps
                _emit(name, fps, base)
            except Exception as e:  # fault-isolate: headline must still print
                print(f"# bench {name} failed: {e!r}", file=sys.stderr)

    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    fps = bench_cartpole(num_envs)
    results["cartpole_env_step_fps_4096envs_1chip"] = fps
    _emit(
        "cartpole_env_step_fps_4096envs_1chip", fps, BASELINE_CARTPOLE_STEP_FPS
    )
    return results


if __name__ == "__main__":
    main()
