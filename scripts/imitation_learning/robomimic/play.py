#!/usr/bin/env python
"""Roll out a BC policy trained by robomimic/train.py (reference
``scripts/imitation_learning/robomimic/play.py``)."""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))))

parser = argparse.ArgumentParser()
parser.add_argument("--task", type=str, required=True)
parser.add_argument("--checkpoint", type=str, required=True)
parser.add_argument("--num_envs", type=int, default=4)
parser.add_argument("--num_steps", type=int, default=200)
args = parser.parse_args()


def main():
    import gymnasium as gym
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    import isaaclab_tpu.tasks  # noqa: F401
    from isaaclab_tpu.tasks.utils import parse_env_cfg

    with open(args.checkpoint, "rb") as f:
        ckpt = pickle.load(f)

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            for h in ckpt["hidden"]:
                x = nn.elu(nn.Dense(h)(x))
            return nn.Dense(ckpt["act_dim"])(x)

    model = MLP()
    apply = jax.jit(lambda x: model.apply(ckpt["params"], x))

    env_cfg = parse_env_cfg(args.task, num_envs=args.num_envs)
    env = gym.make(args.task, cfg=env_cfg).unwrapped
    obs, _ = env.reset(seed=0)

    def flat_obs(o):
        p = o["policy"]
        if isinstance(p, dict):
            parts = [np.asarray(p[k]).reshape(args.num_envs, -1)
                     for k in sorted(p)]
            return np.concatenate(parts, axis=-1)
        return np.asarray(p).reshape(args.num_envs, -1)

    total = np.zeros(args.num_envs)
    for _ in range(args.num_steps):
        x = flat_obs(obs)[:, : ckpt["obs_dim"]]
        act = np.asarray(apply(x))
        obs, rew, term, trunc, _ = env.step(act.astype(np.float32))
        total += np.asarray(rew)
    print(f"mean return: {total.mean():.3f}")
    env.close()


if __name__ == "__main__":
    main()
