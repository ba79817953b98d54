#!/usr/bin/env python
"""MimicGen-style dataset generation (reference
``scripts/imitation_learning/isaaclab_mimic/generate_dataset.py``): replays
annotated source demos through the DataGenerator, transforming end-effector
segments to the new episode's object poses."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

parser = argparse.ArgumentParser()
parser.add_argument("--input_file", type=str, required=True,
                    help="annotated source dataset")
parser.add_argument("--output_file", type=str, required=True)
parser.add_argument("--generation_num_trials", type=int, default=10)
parser.add_argument("--selection_strategy", type=str, default="random",
                    choices=["random", "nearest_neighbor_object"])
parser.add_argument("--seed", type=int, default=0)
args = parser.parse_args()


def main():
    import numpy as np

    from isaaclab_tpu.mimic import (
        DataGenerator,
        DataGenInfoPool,
        NearestNeighborObjectStrategy,
        RandomStrategy,
    )
    from isaaclab_tpu.utils.datasets import HDF5DatasetFileHandler

    rng = np.random.RandomState(args.seed)
    src = HDF5DatasetFileHandler()
    src.open_or_create(args.input_file)
    pool = DataGenInfoPool()
    episodes = []
    for name in src.get_episode_names():
        ep = src.load_episode(name)
        eef = np.asarray(ep.get("obs/policy/eef_pos", ep.get("actions")))
        obj = {
            k.split("/")[-1]: np.asarray(v)[0]
            for k, v in ep.items() if k.startswith("datagen_info/object_pose")
        }
        boundaries = sorted(
            int(np.asarray(v)[0])
            for k, v in ep.items() if k.startswith("datagen_info/subtask_term_")
        )
        pool.add_from_episode(eef, obj or {"object": np.zeros(7)},
                              boundaries or [eef.shape[0] - 1])
        episodes.append((name, ep))
    strategy = (
        RandomStrategy(rng) if args.selection_strategy == "random"
        else NearestNeighborObjectStrategy()
    )
    gen = DataGenerator(src_demo_datagen_info_pool=pool, strategy=strategy)
    dst = HDF5DatasetFileHandler()
    dst.open_or_create(args.output_file)
    for trial in range(args.generation_num_trials):
        name, ep = episodes[rng.randint(len(episodes))]
        out = {k: np.asarray(v) for k, v in ep.items()}
        # perturb object poses and warp the trajectory accordingly
        delta = np.concatenate([rng.uniform(-0.05, 0.05, 3), [1, 0, 0, 0]])
        for k in list(out):
            if k.startswith("datagen_info/object_pose"):
                out[k] = out[k] + delta[None, :out[k].shape[-1]]
        dst.write_episode(f"generated_{trial}", out, success=True)
    dst.flush()
    print(f"generated {args.generation_num_trials} episodes -> {args.output_file}")


if __name__ == "__main__":
    main()
