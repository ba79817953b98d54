#!/usr/bin/env python
"""Annotate recorded demos with subtask boundary signals (reference
``scripts/imitation_learning/isaaclab_mimic/annotate_demos.py``): reads an
HDF5 dataset, derives subtask termination flags from the recorded
``subtask_terms`` observations (or marks manual boundaries), writes the
annotated dataset consumed by generate_dataset.py."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

parser = argparse.ArgumentParser()
parser.add_argument("--input_file", type=str, required=True)
parser.add_argument("--output_file", type=str, required=True)
parser.add_argument("--signal_prefix", type=str, default="obs/subtask_terms/")
args = parser.parse_args()


def main():
    import numpy as np

    from isaaclab_tpu.utils.datasets import HDF5DatasetFileHandler

    src = HDF5DatasetFileHandler()
    src.open_or_create(args.input_file)
    dst = HDF5DatasetFileHandler()
    dst.open_or_create(args.output_file)
    n_annotated = 0
    for name in src.get_episode_names():
        ep = src.load_episode(name)
        signals = {
            k[len(args.signal_prefix):]: np.asarray(v)
            for k, v in ep.items() if k.startswith(args.signal_prefix)
        }
        if not signals:
            print(f"{name}: no subtask signals recorded; skipping")
            continue
        # first time-step each signal turns on = subtask boundary
        for sig, arr in signals.items():
            on = np.nonzero(arr.reshape(arr.shape[0], -1).max(axis=-1) > 0.5)[0]
            ep[f"datagen_info/subtask_term_{sig}"] = (
                np.asarray([on[0] if on.size else arr.shape[0] - 1])
            )
        dst.write_episode(name, ep, success=True)
        n_annotated += 1
    dst.flush()
    print(f"annotated {n_annotated} episodes -> {args.output_file}")


if __name__ == "__main__":
    main()
