"""Policy exporters (reference ``isaaclab_rl/rsl_rl/exporter.py``).

The reference exports TorchScript/ONNX for deployment; here the canonical
deployment artifact is a flax params msgpack plus (optionally) an ONNX graph
built by converting the MLP weights to torch (torch-cpu is in the image).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def export_policy_as_jax(runner, path: str, filename: str = "policy.msgpack"):
    """Serialize params + normalizer (the jax-native deployment format)."""
    from flax import serialization

    os.makedirs(path, exist_ok=True)
    payload = {
        "params": jax.device_get(runner.state.update.params),
        "normalizer": jax.device_get(runner.state.normalizer._asdict()),
        "obs_dim": runner.obs_dim,
        "num_actions": runner.num_actions,
    }
    out = os.path.join(path, filename)
    with open(out, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    return out


def _mlp_to_torch(params, activation: str = "elu"):
    """Rebuild the actor MLP as a torch module from flax params."""
    import torch
    import torch.nn as nn

    actor = params["params"]["actor"]
    layers = []
    keys = sorted(actor.keys(), key=lambda k: int(k.split("_")[-1]))
    act = {"elu": nn.ELU, "relu": nn.ReLU, "tanh": nn.Tanh}[activation]
    for i, k in enumerate(keys):
        w = np.asarray(actor[k]["kernel"])
        b = np.asarray(actor[k]["bias"])
        lin = nn.Linear(w.shape[0], w.shape[1])
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(w.T))
            lin.bias.copy_(torch.from_numpy(b))
        layers.append(lin)
        if i < len(keys) - 1:
            layers.append(act())
    return nn.Sequential(*layers)


def export_policy_as_onnx(runner, path: str, filename: str = "policy.onnx",
                          verbose: bool = False):
    """Reference ``export_policy_as_onnx``: actor MLP -> ONNX via torch."""
    import torch

    os.makedirs(path, exist_ok=True)
    model = _mlp_to_torch(
        jax.device_get(runner.state.update.params),
        runner.policy_cfg.activation,
    )
    dummy = torch.zeros(1, runner.obs_dim)
    out = os.path.join(path, filename)
    torch.onnx.export(
        model, dummy, out, verbose=verbose,
        input_names=["obs"], output_names=["actions"],
    )
    return out


def export_policy_as_jit(runner, path: str, filename: str = "policy.pt"):
    """Reference ``export_policy_as_jit``: TorchScript trace of the actor."""
    import torch

    os.makedirs(path, exist_ok=True)
    model = _mlp_to_torch(
        jax.device_get(runner.state.update.params),
        runner.policy_cfg.activation,
    )
    traced = torch.jit.trace(model, torch.zeros(1, runner.obs_dim))
    out = os.path.join(path, filename)
    traced.save(out)
    return out
