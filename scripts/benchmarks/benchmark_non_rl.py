#!/usr/bin/env python
"""Pure env-stepping benchmark for any registered task (reference
``scripts/benchmarks/benchmark_non_rl.py``): prints KPI JSON with
env-steps/s at the requested num_envs."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

parser = argparse.ArgumentParser()
parser.add_argument("--task", type=str, default="Isaac-Cartpole-v0")
parser.add_argument("--num_envs", type=int, default=4096)
parser.add_argument("--steps_per_call", type=int, default=64)
parser.add_argument("--seconds", type=float, default=3.0)
args = parser.parse_args()


def main():
    import gymnasium as gym
    import jax
    import jax.numpy as jnp

    import isaaclab_tpu.tasks  # noqa: F401
    from isaaclab_tpu.tasks.utils import parse_env_cfg

    cfg = parse_env_cfg(args.task, num_envs=args.num_envs)
    env = gym.make(args.task, cfg=cfg).unwrapped
    E = args.num_envs
    A = (
        env.action_manager.total_action_dim
        if hasattr(env, "action_manager")
        else env.num_actions
    )
    state = jax.jit(env.init_state)(jax.random.PRNGKey(0))

    @jax.jit
    def run_chunk(s):
        action = jnp.zeros((E, A))

        def body(carry, _):
            s2, _ = env.step_state(carry, action)
            return s2, None

        s, _ = jax.lax.scan(body, s, None, length=args.steps_per_call)
        return s

    def sync(s):
        jax.device_get(s.scene.phys.q[0, 0])

    t0 = time.perf_counter()
    state = run_chunk(state)
    sync(state)
    compile_s = time.perf_counter() - t0

    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < args.seconds:
        state = run_chunk(state)
        n += 1
        sync(state)
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": f"env_step_fps::{args.task}",
                "num_envs": E,
                "value": round(n * args.steps_per_call * E / dt),
                "unit": "env-steps/s",
                "compile_seconds": round(compile_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
