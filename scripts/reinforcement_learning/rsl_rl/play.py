#!/usr/bin/env python
"""Play a trained policy (reference scripts/reinforcement_learning/rsl_rl/play.py)."""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
)

from isaaclab_tpu.app import AppLauncher  # noqa: E402

parser = argparse.ArgumentParser(description="Play a trained policy (TPU).")
parser.add_argument("--task", type=str, required=True)
parser.add_argument("--num_envs", type=int, default=32)
parser.add_argument("--checkpoint", type=str, default=None)
parser.add_argument("--logdir", type=str, default="logs/rsl_rl")
parser.add_argument("--num_steps", type=int, default=500)
parser.add_argument(
    "--live_plot", action="store_true",
    help="print a terminal sparkline dashboard of manager terms "
    "(headless ManagerLiveVisualizer) every --live_plot_every steps",
)
parser.add_argument("--live_plot_every", type=int, default=50)
AppLauncher.add_app_launcher_args(parser)
args_cli, _ = parser.parse_known_args()
app_launcher = AppLauncher(args_cli)


def main():
    import gymnasium as gym
    import jax
    import numpy as np

    import isaaclab_tpu.tasks  # noqa: F401
    from isaaclab_tpu.rl import OnPolicyRunner, RslRlVecEnvWrapper
    from isaaclab_tpu.tasks.utils import (
        get_checkpoint_path,
        load_cfg_from_registry,
        parse_env_cfg,
    )

    env_cfg = parse_env_cfg(args_cli.task, num_envs=args_cli.num_envs)
    agent_cfg = load_cfg_from_registry(args_cli.task, "rsl_rl_cfg_entry_point")
    env = gym.make(args_cli.task, cfg=env_cfg).unwrapped
    wrapped = RslRlVecEnvWrapper(env)
    runner = OnPolicyRunner(wrapped, agent_cfg, log_dir=None)
    ckpt = args_cli.checkpoint or get_checkpoint_path(
        os.path.join(args_cli.logdir, agent_cfg.experiment_name), ".*", "model_.*.ckpt"
    )
    runner.state = runner.init_train_state()
    runner.load(ckpt)
    policy = runner.get_inference_policy()

    obs, _ = env.reset()
    visualizer = None
    if args_cli.live_plot:
        from isaaclab_tpu.ui import EnvLiveVisualizer

        visualizer = EnvLiveVisualizer(env)
    total_rew = np.zeros(env.num_envs)
    for i in range(args_cli.num_steps):
        action = policy(obs["policy"])
        obs, rew, term, trunc, _ = env.step(action)
        total_rew += np.asarray(rew)
        if visualizer is not None:
            visualizer.update(env._state)
            if (i + 1) % args_cli.live_plot_every == 0:
                print(visualizer.render() + "\n", flush=True)
    print(f"mean return over {args_cli.num_steps} steps: {total_rew.mean():.3f}")
    env.close()


if __name__ == "__main__":
    main()
