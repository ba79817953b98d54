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
    from isaaclab_tpu.mimic.mimic_env import SubTaskConfig
    from isaaclab_tpu.utils.datasets import HDF5DatasetFileHandler

    rng = np.random.default_rng(args.seed)
    src = HDF5DatasetFileHandler()
    src.open_or_create(args.input_file)
    pool = DataGenInfoPool()
    n_subtasks = 1
    for name in src.get_episode_names():
        ep = src.load_episode(name)
        eef_raw = np.asarray(ep.get("obs/policy/eef_pos", ep.get("actions")))
        T = eef_raw.shape[0]
        if eef_raw.shape[-1] == 16:
            eef = eef_raw.reshape(T, 4, 4)
        else:  # positions only: embed as translation-only poses
            eef = np.tile(np.eye(4), (T, 1, 1))
            eef[:, :3, 3] = eef_raw[:, :3]
        obj = {}
        for k, v in ep.items():
            if k.startswith("datagen_info/object_pose_"):
                arr = np.asarray(v)
                pose = arr[0].reshape(4, 4) if arr.shape[-1] == 16 else np.eye(4)
                obj[k[len("datagen_info/object_pose_"):]] = pose
        cuts = sorted(
            int(np.asarray(v)[0])
            for k, v in ep.items() if k.startswith("datagen_info/subtask_term_")
        )
        boundaries, start = [], 0
        for c in cuts + [T]:
            if c > start:
                boundaries.append((start, c))
                start = c
        n_subtasks = max(n_subtasks, len(boundaries))
        acts = np.asarray(ep.get("actions", np.zeros((T, 1))))
        grip = acts[:, -1] if acts.ndim == 2 else acts
        pool.add_from_episode(eef, obj or {"object": np.eye(4)}, boundaries, grip)
    if pool.num_demos == 0:
        raise SystemExit("no episodes with eef data in the input dataset")
    strategy = (
        RandomStrategy(rng) if args.selection_strategy == "random"
        else NearestNeighborObjectStrategy(rng=rng)
    )
    obj_names = list(pool.datagen_infos[0]["object_poses"])
    subtasks = [
        SubTaskConfig(object_ref=obj_names[0], num_interpolation_steps=0)
        for _ in range(n_subtasks)
    ]
    gen = DataGenerator(src_demo_datagen_info_pool=pool, rng=rng)
    dst = HDF5DatasetFileHandler()
    dst.open_or_create(args.output_file)
    for trial in range(args.generation_num_trials):
        # new scene: perturb every object pose (reference randomizes the
        # scene and reads back object poses; host-side equivalent)
        new_poses = {}
        for nm in obj_names:
            base = pool.datagen_infos[
                int(rng.integers(pool.num_demos))]["object_poses"][nm]
            delta = np.eye(4)
            delta[:2, 3] = rng.uniform(-0.05, 0.05, 2)
            new_poses[nm] = delta @ base
        traj, grips = gen.generate_trajectory(subtasks, new_poses,
                                              strategy=strategy)
        T = traj.shape[0]
        dst.write_episode(
            f"generated_{trial}",
            {
                "obs/policy/eef_pos": traj.reshape(T, 16).astype(np.float32),
                "actions": grips[:, None].astype(np.float32),
                **{
                    f"datagen_info/object_pose_{nm}": np.tile(
                        p.reshape(16), (T, 1)
                    ).astype(np.float32)
                    for nm, p in new_poses.items()
                },
            },
            success=True,
        )
    dst.flush()
    print(f"generated {args.generation_num_trials} episodes -> {args.output_file}")


if __name__ == "__main__":
    main()
