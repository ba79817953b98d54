#!/usr/bin/env python
"""Train with skrl (reference scripts/reinforcement_learning/skrl/train.py).
Uses the real library when installed; otherwise the task's agent cfg runs on
the in-repo PPO (same CLI surface)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
)

from isaaclab_tpu.app import AppLauncher  # noqa: E402

parser = argparse.ArgumentParser(description="Train an RL agent with skrl.")
parser.add_argument("--task", type=str, required=True)
parser.add_argument("--num_envs", type=int, default=None)
parser.add_argument("--seed", type=int, default=None)
parser.add_argument("--max_iterations", type=int, default=None)
parser.add_argument("--logdir", type=str, default="logs/skrl")
AppLauncher.add_app_launcher_args(parser)
args_cli, hydra_args = parser.parse_known_args()
app_launcher = AppLauncher(args_cli)


def main():
    import _compat

    import isaaclab_tpu.tasks  # noqa: F401
    from isaaclab_tpu.tasks.utils import parse_env_cfg
    from isaaclab_tpu.utils.hydra import apply_cli_overrides

    env_cfg = parse_env_cfg(args_cli.task, num_envs=args_cli.num_envs)
    agent_cfg = _compat.resolve_agent_cfg(args_cli.task, "skrl_cfg_entry_point")
    apply_cli_overrides(env_cfg, agent_cfg, hydra_args)
    _compat.native_train(
        args_cli.task, env_cfg, agent_cfg, args_cli.logdir, "skrl",
        max_iterations=args_cli.max_iterations, seed=args_cli.seed,
    )


if __name__ == "__main__":
    main()
