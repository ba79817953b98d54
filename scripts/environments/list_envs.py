#!/usr/bin/env python
"""List registered tasks (reference scripts/environments/list_envs.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import gymnasium as gym

import isaaclab_tpu.tasks  # noqa: F401

ids = sorted(
    s for s in gym.registry.keys()
    if "isaaclab_tpu" in str(gym.spec(s).entry_point)
)
print(f"{len(ids)} registered isaaclab_tpu tasks:")
for i in ids:
    print(" ", i)
