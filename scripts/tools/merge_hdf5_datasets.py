#!/usr/bin/env python
"""Merge episode datasets (reference ``scripts/tools/merge_hdf5_datasets.py``)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

parser = argparse.ArgumentParser()
parser.add_argument("--input_files", nargs="+", required=True)
parser.add_argument("--output_file", type=str, required=True)
args = parser.parse_args()


def main():
    from isaaclab_tpu.utils.datasets import HDF5DatasetFileHandler

    out = HDF5DatasetFileHandler().create(args.output_file)
    count = 0
    for path in args.input_files:
        src = HDF5DatasetFileHandler().open(path)
        for name in src.get_episode_names():
            out.write_episode(f"demo_{count}", src.load_episode(name))
            count += 1
        src.close()
    out.flush()
    out.close()
    print(f"merged {count} episodes -> {args.output_file}")
