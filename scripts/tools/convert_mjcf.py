#!/usr/bin/env python
"""MJCF -> RobotModel converter CLI (reference scripts/tools/convert_mjcf.py;
output is the serialized kinematic-tree arrays instead of USD)."""

import argparse
import os
import pickle
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

parser = argparse.ArgumentParser(description="Convert MJCF to a RobotModel.")
parser.add_argument("input", type=str, help="path to the .mjcf file")
parser.add_argument("output", type=str, help="output .pkl path")

parser.add_argument("--merge-fixed", action="store_true", default=False,
                    help="merge fixed joints into their parents")
args = parser.parse_args()

from isaaclab_tpu.sim.converters import load_mjcf, merge_fixed_joints  # noqa: E402

model = load_mjcf(args.input)
if args.merge_fixed:
    model = merge_fixed_joints(model)
with open(args.output, "wb") as f:
    pickle.dump(model, f)
print(f"{args.input}: {model.nbody} bodies, {model.nv} dofs, "
      f"{len(model.geoms)} geoms -> {args.output}")
