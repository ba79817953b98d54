#!/usr/bin/env python
"""Train an RL agent (reference
``scripts/reinforcement_learning/rsl_rl/train.py``): same CLI surface, boots
the TPU launcher, resolves task + agent cfgs from the registry, runs the
in-repo PPO runner.
"""

import argparse
import os
import sys
from datetime import datetime

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
)

from isaaclab_tpu.app import AppLauncher  # noqa: E402

parser = argparse.ArgumentParser(description="Train an RL agent (TPU).")
parser.add_argument("--task", type=str, required=True, help="Task id, e.g. Isaac-Cartpole-v0")
parser.add_argument("--num_envs", type=int, default=None)
parser.add_argument("--seed", type=int, default=None)
parser.add_argument("--max_iterations", type=int, default=None)
parser.add_argument("--resume", action="store_true", default=False)
parser.add_argument("--checkpoint", type=str, default=None)
parser.add_argument("--logdir", type=str, default="logs/rsl_rl")
AppLauncher.add_app_launcher_args(parser)
args_cli, hydra_args = parser.parse_known_args()

app_launcher = AppLauncher(args_cli)  # boots jax.distributed if --distributed


def main():
    import gymnasium as gym

    import isaaclab_tpu.tasks  # noqa: F401  (registers tasks)
    from isaaclab_tpu.rl import OnPolicyRunner, RslRlVecEnvWrapper
    from isaaclab_tpu.tasks.utils import load_cfg_from_registry, parse_env_cfg
    from isaaclab_tpu.utils.hydra import apply_cli_overrides

    env_cfg = parse_env_cfg(args_cli.task, num_envs=args_cli.num_envs)
    agent_cfg = load_cfg_from_registry(args_cli.task, "rsl_rl_cfg_entry_point")
    # hydra-style dotted overrides: env.rewards.x.weight=0 agent.seed=3
    apply_cli_overrides(env_cfg, agent_cfg, hydra_args)

    if args_cli.seed is not None:
        agent_cfg.seed = args_cli.seed
    if args_cli.max_iterations is not None:
        agent_cfg.max_iterations = args_cli.max_iterations

    # per-process seed decorrelation under multi-host DP (reference
    # rsl_rl/train.py:119-126 offsets seeds by the torchrun rank): without
    # this every host collects IDENTICAL rollouts and multi-host training
    # adds no sample diversity
    if app_launcher.distributed:
        import jax

        rank = jax.process_index()
        agent_cfg.seed = (agent_cfg.seed or 0) + rank
        if getattr(env_cfg, "seed", None) is not None:
            env_cfg.seed += rank
        else:
            env_cfg.seed = rank

    env = gym.make(args_cli.task, cfg=env_cfg).unwrapped
    env = RslRlVecEnvWrapper(env)

    run_name = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    if agent_cfg.run_name:
        run_name += f"_{agent_cfg.run_name}"
    log_dir = os.path.join(args_cli.logdir, agent_cfg.experiment_name, run_name)

    runner = OnPolicyRunner(env, agent_cfg, log_dir=log_dir)
    if args_cli.resume or args_cli.checkpoint:
        from isaaclab_tpu.tasks.utils import get_checkpoint_path

        ckpt = args_cli.checkpoint or get_checkpoint_path(
            os.path.join(args_cli.logdir, agent_cfg.experiment_name),
            agent_cfg.load_run,
            "model_.*.ckpt",
        )
        runner.load(ckpt)
        print(f"resumed from {ckpt}")
    runner.learn(agent_cfg.max_iterations)
    env.close()


if __name__ == "__main__":
    main()
