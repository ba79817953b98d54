#!/usr/bin/env python
"""Hyperparameter sweep (reference ``scripts/reinforcement_learning/ray/tuner.py``).

The reference submits trials to a Ray cluster; here trials run sequentially on
the local chip (one jitted trainer per config; swap the loop body for a
jax.distributed dispatch when multiple hosts are available)."""

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))))

parser = argparse.ArgumentParser()
parser.add_argument("--task", type=str, default="Isaac-Cartpole-v0")
parser.add_argument("--num_envs", type=int, default=1024)
parser.add_argument("--iterations", type=int, default=50)
parser.add_argument(
    "--grid", type=str,
    default='{"agent.algorithm.learning_rate": [3e-4, 1e-3], "agent.algorithm.entropy_coef": [0.0, 0.005]}',
    help="JSON dict: dotted cfg path -> list of values",
)
args = parser.parse_args()


def main():
    import gymnasium as gym

    import isaaclab_tpu.tasks  # noqa: F401
    from isaaclab_tpu.rl import OnPolicyRunner
    from isaaclab_tpu.tasks.utils import load_cfg_from_registry, parse_env_cfg
    from isaaclab_tpu.utils.hydra import set_by_dotted_path

    grid = json.loads(args.grid)
    keys = list(grid.keys())
    results = []
    for combo in itertools.product(*[grid[k] for k in keys]):
        env_cfg = parse_env_cfg(args.task, num_envs=args.num_envs)
        agent_cfg = load_cfg_from_registry(args.task, "rsl_rl_cfg_entry_point")
        trial = dict(zip(keys, combo))
        for k, v in trial.items():
            root, path = (env_cfg, k[4:]) if k.startswith("env.") else (
                agent_cfg, k[6:]
            )
            set_by_dotted_path(root, path, v)
        env = gym.make(args.task, cfg=env_cfg).unwrapped
        runner = OnPolicyRunner(env, agent_cfg, log_dir=None)
        state = runner.learn(args.iterations)
        import jax

        fn = jax.jit(runner._train_iteration)
        _, metrics = fn(state)
        score = float(metrics["mean_reward_per_step"])
        results.append({"trial": trial, "reward_per_step": score})
        print(json.dumps(results[-1]), flush=True)
    best = max(results, key=lambda r: r["reward_per_step"])
    print("BEST:", json.dumps(best))


if __name__ == "__main__":
    main()
