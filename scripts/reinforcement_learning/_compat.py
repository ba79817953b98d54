"""Shared plumbing for the per-RL-library CLI entry points (reference
``scripts/reinforcement_learning/{rl_games,sb3,skrl}/train.py``).

The reference delegates to the external torch trainers. In this build those
libraries are optional: when installed, the scripts hand the adapter-wrapped
env to the real library; otherwise they translate the task's agent cfg onto
the in-repo PPO runner (same hyperparameter semantics) so the CLI surface —
task ids, checkpoints, logs — behaves identically either way."""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)


def resolve_agent_cfg(task: str, entry_point: str):
    """Task's per-library agent cfg, falling back to the rsl_rl entry."""
    import gymnasium as gym

    from isaaclab_tpu.tasks.utils import load_cfg_from_registry

    spec = gym.spec(task)
    if spec.kwargs.get(entry_point) is not None:
        return load_cfg_from_registry(task, entry_point)
    return load_cfg_from_registry(task, "rsl_rl_cfg_entry_point")


def native_train(task, env_cfg, agent_cfg, logdir, library, max_iterations=None,
                 seed=None):
    """Train with the in-repo runner under the given library's log tree."""
    from datetime import datetime

    import gymnasium as gym

    from isaaclab_tpu.rl import OnPolicyRunner, RslRlVecEnvWrapper

    if seed is not None:
        agent_cfg.seed = seed
    if max_iterations is not None:
        agent_cfg.max_iterations = max_iterations
    # per-process seed decorrelation under multi-host DP (reference
    # train.py:119-126 offsets seeds by rank)
    import jax

    if jax.process_count() > 1:
        rank = jax.process_index()
        agent_cfg.seed = (agent_cfg.seed or 0) + rank
        if getattr(env_cfg, "seed", None) is not None:
            env_cfg.seed += rank
        else:
            env_cfg.seed = rank
    env = gym.make(task, cfg=env_cfg).unwrapped
    env = RslRlVecEnvWrapper(env)
    run_name = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    log_dir = os.path.join(logdir, agent_cfg.experiment_name, run_name)
    print(f"[{library}] external library not installed -> native PPO runner")
    runner = OnPolicyRunner(env, agent_cfg, log_dir=log_dir)
    runner.learn(agent_cfg.max_iterations)
    env.close()
    return log_dir
