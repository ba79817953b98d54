#!/usr/bin/env python
"""Robot load/startup KPI (reference benchmark_load_robot.py +
test_robot_load_performance.py): scene build time + first-step compile time."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

parser = argparse.ArgumentParser()
parser.add_argument("--task", type=str, default="Isaac-Velocity-Flat-Anymal-C-v0")
parser.add_argument("--num_envs", type=int, default=1024)
args = parser.parse_args()


def main():
    import gymnasium as gym
    import jax
    import jax.numpy as jnp

    import isaaclab_tpu.tasks  # noqa: F401
    from isaaclab_tpu.tasks.utils import parse_env_cfg

    t0 = time.perf_counter()
    cfg = parse_env_cfg(args.task, num_envs=args.num_envs)
    env = gym.make(args.task, cfg=cfg).unwrapped
    build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
    jax.device_get(state.scene.phys.q[0, 0])
    init_s = time.perf_counter() - t0

    A = (
        env.action_manager.total_action_dim
        if hasattr(env, "action_manager")
        else env.num_actions
    )
    t0 = time.perf_counter()
    step = jax.jit(env.step_state)
    state, _ = step(state, jnp.zeros((args.num_envs, A)))
    jax.device_get(state.scene.phys.q[0, 0])
    first_step_s = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "task": args.task,
                "num_envs": args.num_envs,
                "scene_build_seconds": round(build_s, 3),
                "init_compile_seconds": round(init_s, 3),
                "step_compile_seconds": round(first_step_s, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
