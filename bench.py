#!/usr/bin/env python
"""Benchmark driver entry.

Emits one JSON line per workload (BASELINE.md rows 1, 3, 4), with the
headline cartpole metric LAST so a tail-line parser records it:

  anymal_rough_env_step_fps_4096envs_1chip   vs 94k   (4090, rst:61)
  shadow_repose_env_step_fps_8192envs_1chip  vs 200k  (4090, rst:63)
  cartpole_env_step_fps_4096envs_1chip       vs 1.10M (4090, rst:57)

Fault isolation is PROCESS-LEVEL: each workload runs in its own Python
subprocess so a TPU-worker crash (the round-2 failure mode: one workload
kernel-faulted the worker and took every subsequent in-process workload
down with it) costs exactly one row. Results come back over stdout JSON.

Actions are random (fixed PRNG), not zeros — zero actions leave contact
-heavy workloads standing still and understate solver cost vs the
reference's random-action benchmark (`scripts/benchmarks/benchmark_non_rl.py`).

Set BENCH_HEADLINE_ONLY=1 to run only the cartpole row.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# persistent compile cache: repeated bench runs skip the (slow) remote compile
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# reference 1x RTX 4090 step-FPS (BASELINE.md)
BASELINES = {
    "cartpole_env_step_fps_4096envs_1chip": 1_100_000.0,  # rst:57
    "anymal_rough_env_step_fps_4096envs_1chip": 94_000.0,  # Rough-G1 proxy, rst:61
    "shadow_repose_env_step_fps_8192envs_1chip": 200_000.0,  # rst:63
}
# Per-workload subprocess wall clamp (compile can take minutes cold).
WORKLOAD_TIMEOUT_S = float(os.environ.get("BENCH_WORKLOAD_TIMEOUT", 1500))


def _measure(env, num_envs, steps_per_call=64, seconds=3.0):
    import jax
    import jax.numpy as jnp

    state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
    act_dim = env.action_manager.total_action_dim if hasattr(
        env, "action_manager"
    ) else env.num_actions

    @jax.jit
    def run_chunk(s, key):
        # NOTE: action buffers are created INSIDE the trace — closing over
        # an eagerly-created device array forces a trace-time device-to-host
        # copy that permanently degrades dispatch over the axon TPU tunnel.
        # Random actions (not zeros): contact-heavy workloads must move so
        # collision/solver cost matches the reference's random-action bench.
        def body(carry, k):
            action = jax.random.uniform(
                k, (num_envs, act_dim), minval=-1.0, maxval=1.0
            )
            s2, _out = env.step_state(carry, action)
            return s2, None

        keys = jax.random.split(key, steps_per_call)
        s, _ = jax.lax.scan(body, s, keys)
        return s

    # warmup/compile. NOTE: sync via device_get of a scalar — over the axon
    # tunnel, block_until_ready can return before queued work completes
    # (measured: 64 queued chunks "ready" in 10ms), inflating FPS ~1000x.
    def sync(s):
        jax.device_get(s.scene.phys.q[0, 0])

    key = jax.random.PRNGKey(1)
    key, k = jax.random.split(key)
    state = run_chunk(state, k)
    sync(state)

    # time-based loop: enough chunks to dominate timer/dispatch noise
    n_calls = 0
    t0 = time.perf_counter()
    while True:
        key, k = jax.random.split(key)
        state = run_chunk(state, k)
        n_calls += 1
        if n_calls % 4 == 0:
            sync(state)
            if time.perf_counter() - t0 > seconds:
                break
    sync(state)
    dt = time.perf_counter() - t0
    return n_calls * steps_per_call * num_envs / dt


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


WORKLOADS = {
    "anymal_rough_env_step_fps_4096envs_1chip": (
        bench_anymal_rough,
        "BENCH_ROUGH_ENVS",
        4096,
    ),
    "shadow_repose_env_step_fps_8192envs_1chip": (
        bench_shadow,
        "BENCH_SHADOW_ENVS",
        8192,
    ),
    "cartpole_env_step_fps_4096envs_1chip": (
        bench_cartpole,
        "BENCH_NUM_ENVS",
        4096,
    ),
}


def _run_one(name):
    """Child-process entry: run one workload, print its JSON row."""
    fn, env_var, default_envs = WORKLOADS[name]
    num_envs = int(os.environ.get(env_var, default_envs))
    fps = fn(num_envs)
    row = {
        "metric": name,
        "value": round(fps),
        "unit": "env-steps/s",
        "vs_baseline": round(fps / BASELINES[name], 4),
    }
    if name.startswith("anymal_rough"):
        # baseline row is Velocity-Rough-G1 (biped, 37 bodies); we bench
        # AnymalCRough as the closest contact+raycast-heavy proxy
        row["proxy_for"] = "Isaac-Velocity-Rough-G1-v0"
    print(json.dumps(row), flush=True)


def main():
    order = list(WORKLOADS)
    if os.environ.get("BENCH_HEADLINE_ONLY"):
        order = ["cartpole_env_step_fps_4096envs_1chip"]
    for name in order:
        # one Python process per workload: a TPU worker crash kills the
        # child, the parent prints the rows that did succeed
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--workload", name],
                capture_output=True,
                text=True,
                timeout=WORKLOAD_TIMEOUT_S,
            )
        except subprocess.TimeoutExpired:
            print(f"# bench {name} timed out", file=sys.stderr)
            continue
        row = next(
            (l for l in proc.stdout.splitlines() if l.startswith("{")), None
        )
        if proc.returncode == 0 and row:
            print(row, flush=True)
        else:
            tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-8:]
            print(
                f"# bench {name} failed rc={proc.returncode}: "
                + " | ".join(tail),
                file=sys.stderr,
            )


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--workload":
        _run_one(sys.argv[2])
    else:
        main()
