"""Equivalence test: the JAX ResNet backbone + torch-state_dict converter
reproduce a torch ResNet-18 reference implementation to float32 tolerance.

The torch model below mirrors torchvision's ResNet-18 graph exactly (same
module names, so its state_dict has torchvision keys) — torchvision itself
is not in this image, but any real torchvision checkpoint has the same
layout, so passing here means ``tools/convert_vision_weights.py`` on a real
``resnet18-*.pth`` gives full functional parity with the reference's
frozen-feature term (reference envs/mdp/observations.py:455-505).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


class _BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idt)


class _ResNet18(nn.Module):
    """torchvision.models.resnet18 graph with torchvision state_dict keys."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        chans = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
        for i, (cin, cout, s) in enumerate(chans, start=1):
            setattr(self, f"layer{i}", nn.Sequential(
                _BasicBlock(cin, cout, s), _BasicBlock(cout, cout, 1)))
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512, 1000)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


def _randomized_model(seed=0):
    torch.manual_seed(seed)
    m = _ResNet18().eval()
    # randomize BN running stats so the fold is actually exercised
    gen = np.random.RandomState(seed + 1)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                n = mod.running_mean.numel()
                mod.running_mean.copy_(
                    torch.from_numpy(gen.normal(0, 0.3, n).astype(np.float32)))
                mod.running_var.copy_(torch.from_numpy(
                    gen.uniform(0.5, 2.0, n).astype(np.float32)))
    return m


class TestResNetBackbone:
    def test_matches_torch_reference(self):
        import jax.numpy as jnp

        from isaaclab_tpu.envs.mdp.vision_backbones import (
            convert_torch_state_dict, resnet_apply, _IMAGENET_MEAN,
            _IMAGENET_STD,
        )

        m = _randomized_model()
        params = convert_torch_state_dict(m.state_dict(), "resnet18")

        rng = np.random.RandomState(42)
        x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)

        with torch.no_grad():
            xt = torch.from_numpy(
                (x - _IMAGENET_MEAN) / _IMAGENET_STD
            ).permute(0, 3, 1, 2)
            ref = m(xt).numpy()

        got = np.asarray(resnet_apply(
            {k: jnp.asarray(v) for k, v in params.items()}, jnp.asarray(x)))
        assert got.shape == (2, 1000)
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)

    def test_converter_roundtrip_via_file(self, tmp_path):
        """convert_vision_weights.py CLI writes an npz load_backbone finds."""
        import subprocess
        import sys
        import os

        m = _randomized_model(seed=3)
        ckpt = tmp_path / "resnet18-test.pth"
        torch.save(m.state_dict(), ckpt)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out_npz = os.path.join(repo, "isaaclab_tpu", "data", "resnet18.npz")
        existed = os.path.exists(out_npz)
        try:
            subprocess.run(
                [sys.executable, os.path.join(repo, "tools",
                                              "convert_vision_weights.py"),
                 "resnet18", str(ckpt)],
                check=True, capture_output=True, text=True)
            assert os.path.exists(out_npz)
            with np.load(out_npz) as z:
                assert "conv1.weight" in z.files
                assert z["conv1.weight"].shape == (7, 7, 3, 64)
                assert z["fc.weight"].shape == (512, 1000)
        finally:
            if not existed and os.path.exists(out_npz):
                os.remove(out_npz)  # don't commit test weights

    def test_random_fallback_deterministic(self):
        from isaaclab_tpu.envs.mdp.vision_backbones import random_init_params

        a = random_init_params("resnet18")
        b = random_init_params("resnet18")
        np.testing.assert_array_equal(
            a["layer4.1.conv2.weight"], b["layer4.1.conv2.weight"])
        # same key inventory as a converted checkpoint
        m = _randomized_model()
        from isaaclab_tpu.envs.mdp.vision_backbones import (
            convert_torch_state_dict,
        )

        conv = convert_torch_state_dict(m.state_dict(), "resnet18")
        assert set(a) == set(conv)
        for k in a:
            assert a[k].shape == conv[k].shape, k
