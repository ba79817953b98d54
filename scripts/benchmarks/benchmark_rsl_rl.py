#!/usr/bin/env python
"""Training-loop benchmark (reference ``scripts/benchmarks/benchmark_rsl_rl.py``):
measures the reference KPI triple — env-stepping FPS, stepping+inference FPS,
and full train-iteration FPS — on one task."""

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
parser.add_argument("--seconds", type=float, default=4.0)
args = parser.parse_args()


def main():
    import gymnasium as gym
    import jax
    import jax.numpy as jnp

    import isaaclab_tpu.tasks  # noqa: F401
    from isaaclab_tpu.rl import OnPolicyRunner
    from isaaclab_tpu.tasks.utils import load_cfg_from_registry, parse_env_cfg

    cfg = parse_env_cfg(args.task, num_envs=args.num_envs)
    agent_cfg = load_cfg_from_registry(args.task, "rsl_rl_cfg_entry_point")
    env = gym.make(args.task, cfg=cfg).unwrapped
    runner = OnPolicyRunner(env, agent_cfg, log_dir=None)
    E = args.num_envs

    def sync(tree):
        jax.device_get(jax.tree.leaves(tree)[0].ravel()[0])

    results = {}

    # --- step only ---
    state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
    A = runner.num_actions

    @jax.jit
    def step_chunk(s):
        def body(c, _):
            c, _o = env.step_state(c, jnp.zeros((E, A)))
            return c, None
        s, _ = jax.lax.scan(body, s, None, length=32)
        return s

    state = step_chunk(state); sync(state.scene.phys.q)
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < args.seconds:
        state = step_chunk(state); n += 1; sync(state.scene.phys.q)
    results["step_fps"] = round(n * 32 * E / (time.perf_counter() - t0))

    # --- step + inference ---
    ts = runner.init_train_state(seed=0)
    params = ts.update.params

    @jax.jit
    def infer_chunk(carry):
        s, obs = carry

        def body(c, _):
            s, obs = c
            mean, _, _ = runner.net.apply(params, obs, obs)
            s, (od, _r, _t, _to, _e) = env.step_state(s, mean)
            return (s, od["policy"]), None

        carry, _ = jax.lax.scan(body, (s, obs), None, length=32)
        return carry

    carry = infer_chunk((ts.env_state, ts.last_obs)); sync(carry[1])
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < args.seconds:
        carry = infer_chunk(carry); n += 1; sync(carry[1])
    results["inference_fps"] = round(n * 32 * E / (time.perf_counter() - t0))

    # --- full train iteration ---
    fn = jax.jit(runner._train_iteration)
    ts, m = fn(ts); sync(m["loss"])
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < args.seconds:
        ts, m = fn(ts); n += 1; sync(m["loss"])
    results["train_fps"] = round(
        n * runner.num_steps * E / (time.perf_counter() - t0)
    )

    print(json.dumps({"task": args.task, "num_envs": E, **results}))


if __name__ == "__main__":
    main()
