#!/usr/bin/env python
"""Replay recorded demonstration actions through the env (reference
``scripts/tools/replay_demos.py``)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

parser = argparse.ArgumentParser()
parser.add_argument("--task", type=str, required=True)
parser.add_argument("--dataset_file", type=str, required=True)
parser.add_argument("--num_demos", type=int, default=None)
args = parser.parse_args()


def main():
    import gymnasium as gym
    import jax
    import jax.numpy as jnp
    import numpy as np

    import isaaclab_tpu.tasks  # noqa: F401
    from isaaclab_tpu.tasks.utils import parse_env_cfg
    from isaaclab_tpu.utils.datasets import HDF5DatasetFileHandler

    handler = HDF5DatasetFileHandler().open(args.dataset_file)
    names = handler.get_episode_names()
    if args.num_demos:
        names = names[: args.num_demos]

    cfg = parse_env_cfg(args.task, num_envs=1)
    env = gym.make(args.task, cfg=cfg).unwrapped
    step = jax.jit(env.step_state)
    for name in names:
        arrays = handler.load_episode(name)
        state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
        total = 0.0
        for action in arrays["actions"]:
            state, (obs, rew, term, trunc, extras) = step(
                state, jnp.asarray(action)[None]
            )
            total += float(np.asarray(rew)[0])
        print(f"{name}: {len(arrays['actions'])} steps, return {total:.3f}")
    handler.close()


if __name__ == "__main__":
    main()
