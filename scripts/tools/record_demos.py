#!/usr/bin/env python
"""Record demonstration episodes to an HDF5 dataset (reference
``scripts/tools/record_demos.py``): runs a policy (random, zero, or a trained
checkpoint) and stores per-episode obs/action/reward streams through the
RecorderManager-compatible HDF5 handler."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

parser = argparse.ArgumentParser()
parser.add_argument("--task", type=str, required=True)
parser.add_argument("--num_envs", type=int, default=8)
parser.add_argument("--num_demos", type=int, default=10)
parser.add_argument("--policy", type=str, default="random",
                    help="random | zero | path to an OnPolicyRunner checkpoint")
parser.add_argument("--dataset_file", type=str, default="datasets/demos.hdf5")
args = parser.parse_args()


def main():
    import gymnasium as gym
    import jax
    import jax.numpy as jnp
    import numpy as np

    import isaaclab_tpu.tasks  # noqa: F401
    from isaaclab_tpu.tasks.utils import parse_env_cfg
    from isaaclab_tpu.utils.datasets import HDF5DatasetFileHandler

    cfg = parse_env_cfg(args.task, num_envs=args.num_envs)
    env = gym.make(args.task, cfg=cfg).unwrapped
    E = args.num_envs
    A = (
        env.action_manager.total_action_dim
        if hasattr(env, "action_manager")
        else env.num_actions
    )

    policy_fn = None
    if args.policy not in ("random", "zero"):
        from flax import serialization

        from isaaclab_tpu.rl.networks import ActorCritic

        with open(args.policy, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        net = ActorCritic(num_actions=A)
        params = payload["params"]

        def policy_fn(obs):
            mean, _, _ = net.apply(params, obs, obs)
            return mean

    os.makedirs(os.path.dirname(args.dataset_file) or ".", exist_ok=True)
    handler = HDF5DatasetFileHandler().create(args.dataset_file)

    state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
    step = jax.jit(env.step_state)
    key = jax.random.PRNGKey(1)

    episodes = [{"obs": [], "actions": [], "rewards": []} for _ in range(E)]
    recorded = 0
    while recorded < args.num_demos:
        key, k = jax.random.split(key)
        if args.policy == "zero":
            action = jnp.zeros((E, A))
        elif args.policy == "random":
            action = jax.random.uniform(k, (E, A), minval=-1, maxval=1)
        else:
            obs_now = env._get_observations(state)["policy"] if hasattr(
                env, "_get_observations"
            ) else None
            action = policy_fn(obs_now)
        state, (obs, rew, term, trunc, extras) = step(state, action)
        obs_np = np.asarray(obs["policy"]) if isinstance(obs, dict) else np.asarray(obs)
        done = np.asarray(term | trunc)
        rew_np = np.asarray(rew)
        act_np = np.asarray(action)
        for e in range(E):
            episodes[e]["obs"].append(obs_np[e])
            episodes[e]["actions"].append(act_np[e])
            episodes[e]["rewards"].append(rew_np[e])
            if done[e] and recorded < args.num_demos:
                handler.write_episode(
                    f"demo_{recorded}",
                    {k2: np.stack(v) for k2, v in episodes[e].items()},
                    success=True,
                )
                recorded += 1
                episodes[e] = {"obs": [], "actions": [], "rewards": []}
    handler.flush()
    handler.close()
    print(f"recorded {recorded} demos -> {args.dataset_file}")


if __name__ == "__main__":
    main()
