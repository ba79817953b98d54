#!/usr/bin/env python
"""Convert a torchvision ResNet checkpoint to the .npz format used by
``isaaclab_tpu.envs.mdp.vision_backbones``.

Usage:
  python tools/convert_vision_weights.py resnet18 /path/to/resnet18-f37072fd.pth
  # writes isaaclab_tpu/data/resnet18.npz

The input is a torch ``state_dict`` file (what torchvision's model zoo
downloads, or ``model.state_dict()`` saved by any script). BatchNorm running
stats are folded into per-channel scale/bias (exact at inference), conv
weights transposed OIHW -> HWIO, fc to (in, out).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    model_name, ckpt = sys.argv[1], sys.argv[2]

    import torch

    from isaaclab_tpu.envs.mdp.vision_backbones import convert_torch_state_dict

    sd = torch.load(ckpt, map_location="cpu", weights_only=True)
    if not isinstance(sd, dict) or "conv1.weight" not in sd:
        # full-model checkpoint: unwrap
        sd = sd.get("state_dict", sd)
    params = convert_torch_state_dict(sd, model_name)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "isaaclab_tpu", "data",
    )
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{model_name}.npz")
    np.savez(out, **params)
    print(f"wrote {out}: {len(params)} arrays, "
          f"{sum(v.size for v in params.values())/1e6:.1f}M params")


if __name__ == "__main__":
    main()
