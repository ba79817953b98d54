#!/usr/bin/env python
"""Random-action env check (reference scripts/environments/random_agent.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from isaaclab_tpu.app import AppLauncher  # noqa: E402

parser = argparse.ArgumentParser()
parser.add_argument("--task", type=str, required=True)
parser.add_argument("--num_envs", type=int, default=16)
parser.add_argument("--num_steps", type=int, default=100)
AppLauncher.add_app_launcher_args(parser)
args_cli, _ = parser.parse_known_args()
AppLauncher(args_cli)


def main():
    import gymnasium as gym
    import jax
    import numpy as np

    import isaaclab_tpu.tasks  # noqa: F401
    from isaaclab_tpu.tasks.utils import parse_env_cfg

    env_cfg = parse_env_cfg(args_cli.task, num_envs=args_cli.num_envs)
    env = gym.make(args_cli.task, cfg=env_cfg).unwrapped
    env.reset()
    A = env.action_manager.total_action_dim if hasattr(env, "action_manager") else env.num_actions
    key = jax.random.PRNGKey(0)
    for i in range(args_cli.num_steps):
        key, k = jax.random.split(key)
        action = jax.random.uniform(k, (env.num_envs, A), minval=-1, maxval=1)
        out = env.step(action)
        rew = out[1]
        if isinstance(rew, dict):  # MARL env: per-agent reward dict
            rew = sum(rew.values())
        assert bool(np.all(np.isfinite(np.asarray(rew)))), f"non-finite reward at {i}"
    print(f"{args_cli.task}: {args_cli.num_steps} random steps OK")
    env.close()


if __name__ == "__main__":
    main()
